#!/usr/bin/env python3
"""Inject GENUINE skew into a scale10x.py replica corpus.

The token-disjoint replicas of scale10x.py grow volume but not skew —
every straggler guard in the engine (SpanHotCap window diversion,
LshBucketCap hot-bucket tombstoning, hot-group aggregate splits) has
only ever seen data that doesn't need it. This post-pass appends three
deterministic skew components (no RNG; reruns bit-identical):

- documents STORM: 5000 exact copies of one ~100-token base document
  (doc_id 2_000_000_000+i). Hits: exact-dedup keep-first at volume, one
  LSH bucket holding 5000 identical signatures (LshBucketCap is 256 —
  the tombstone path finally fires on real data), a 5000-member dup
  cluster for the components queries, and every span window of the doc
  recurring 5000x (SpanHotCap 256 — the diversion path fires).
- documents BOILERPLATE: 50_000 docs, each 30 unique filler tokens plus
  the SAME 16-token boilerplate block (doc_id 2_100_000_000+i). Hits:
  boilerplate-window keys with 50k occurrences each, span-dedup hot
  keys, quality/repetition scoring over near-template text.
- embeddings HOT CLUSTER: 5000 near-copies of one base vector with a
  deterministic value-dependent perturbation (vec_id 2_000_000_000+i).
  Hits: one IVF cell holding ~71% of the corpus (cell skew), one LSH
  hash bucket at 5000 population, brute/ANN top-k with a dominant
  neighbor clique.
- documents PACK FLOOD (r13): 10_000 tiny unique-token docs, all lang
  'en' (doc_id 2_200_000_000+i). Pushes the dominant language past
  PackHotCap=262_144 so the packing-cumsum hot-language guard fires at
  its PRODUCTION cap on the drive corpus (pre-r13 the census showed
  max_lang 255_900 — 2% under the cap, guard never engaged).

Usage:
  python3 tools/scale10x.py /root/testdata/sf0.1 /tmp/sf100x 100
  python3 tools/skew_inject.py /tmp/sf100x

Perf/robustness corpus only — the oracle gate's baselines stay on
driver data; Verify+check.py still work here because every oracle is
content-agnostic SQL over the same tables.
"""
import sys
import duckdb

STORM_N = 5000
BOILER_N = 50_000
FLOOD_N = 10_000
STORM_BASE_DOC = 553       # a 100-token doc in sf0.1 (longest class)
HOT_VEC = 1999             # base vector for the hot cluster
OFF_STORM = 2_000_000_000
OFF_BOILER = 2_100_000_000
OFF_FLOOD = 2_200_000_000

BOILER_BLOCK = ("subscribe to our newsletter for updates terms of service "
                "apply all rights reserved contact us today")  # 16 tokens


def main():
    dst = sys.argv[1] if len(sys.argv) > 1 else '/tmp/sf100x'
    con = duckdb.connect()

    con.sql(f"""
      COPY (
        SELECT * FROM '{dst}/documents.parquet'
        UNION ALL
        SELECT {OFF_STORM} + i AS doc_id, b.text, b.lang, b.source,
               b.n_chars
        FROM range({STORM_N}) r(i),
             (SELECT text, lang, source, n_chars
              FROM '{dst}/documents.parquet'
              WHERE doc_id = {STORM_BASE_DOC}) b
        UNION ALL
        SELECT {OFF_BOILER} + i AS doc_id,
               txt AS text, 'en' AS lang, 'boiler' AS source,
               CAST(length(txt) AS BIGINT) AS n_chars
        FROM (
          SELECT i, array_to_string(
              [format('bp{{}}x{{}}', i, j) for j in range(30)], ' ')
              || ' ' || '{BOILER_BLOCK}' AS txt
          FROM range({BOILER_N}) r(i))
        UNION ALL
        SELECT {OFF_FLOOD} + i AS doc_id,
               format('flood{{}}a flood{{}}b flood{{}}c', i, i, i) AS text,
               'en' AS lang, 'flood' AS source,
               CAST(length(format('flood{{}}a flood{{}}b flood{{}}c',
                                  i, i, i)) AS BIGINT) AS n_chars
        FROM range({FLOOD_N}) r(i)
      ) TO '{dst}/documents2.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
      COPY (
        SELECT * FROM '{dst}/embeddings.parquet'
        UNION ALL
        SELECT {OFF_STORM} + i AS vec_id,
               list_transform(b.embedding,
                 x -> CAST(x + 0.001*sin(x*131.0 + i*0.37) AS FLOAT))
                 AS embedding,
               b.label
        FROM range({STORM_N}) r(i),
             (SELECT embedding, label FROM '{dst}/embeddings.parquet'
              WHERE vec_id = {HOT_VEC}) b
      ) TO '{dst}/embeddings2.parquet' (FORMAT PARQUET)""")

    import os
    os.replace(f'{dst}/documents2.parquet', f'{dst}/documents.parquet')
    os.replace(f'{dst}/embeddings2.parquet', f'{dst}/embeddings.parquet')
    n_d = con.sql(f"SELECT count(*) FROM '{dst}/documents.parquet'").fetchone()[0]
    n_e = con.sql(f"SELECT count(*) FROM '{dst}/embeddings.parquet'").fetchone()[0]
    print(f"[skew] documents={n_d} (storm {STORM_N}, boiler {BOILER_N}, "
          f"flood {FLOOD_N}), embeddings={n_e} (hot cluster {STORM_N})")


if __name__ == '__main__':
    main()
