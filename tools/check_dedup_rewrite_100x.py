#!/usr/bin/env python3
"""q_dedup_rewrite oracle at replica-drive scale, decomposed.

The registry oracle (SparkEntry.oracleSql) OOMs DuckDB at the 100x drive
corpus no matter the knobs: 130GB RSS on 0.28GB of text, with memory_limit
48->24GB, 8->2 threads, and a file-backed database all ineffective. The
blowup is NOT data volume — phase-splitting shows the per-doc chunking
('c', 3.2M rows) takes 16s/0.6GB; the killer is the keep-first hash
aggregate `MIN({'d':..,'p':..,'g':..}) GROUP BY chunk`: DuckDB's
MIN-over-STRUCT state with a VARCHAR member allocates outside the buffer
manager's accounting (40GB+ observed for 2.9M groups before the kill),
so the limit never triggers a spill and the kernel OOM-killer fires.

This script computes the IDENTICAL result with the same engine-side
discipline the Spark query itself uses:
  - keep-first argmin encoded as ONE BIGINT (doc_id*2^20 + pos; the
    lexicographic (d,p) min equals the numeric min of the encoding, and
    lang is functionally dependent on doc_id so the join recovers it) —
    fixed-width agg state the buffer manager tracks;
  - chunk identity via md5_number (128-bit fixed-width) instead of the
    raw chunk string as the group key;
  - the per-doc text rebuild (string_agg ORDER BY pos + md5) sliced by
    doc_id % 16 with the per-lang partials merged in python — every
    final column is sum/count-decomposable over owner docs.

Usage: python3 tools/check_dedup_rewrite_100x.py [sfdir] [sparkdump_dir]
       (defaults: /tmp/sf100x /tmp/v100x — the drive-ritual paths)
Prints both frames and MATCH/MISMATCH; exit 0 iff MATCH.
"""
import duckdb, os, resource, sys, time


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/sf100x'
    dump = sys.argv[2] if len(sys.argv) > 2 else '/tmp/v100x'
    db = '/tmp/dr_phase.duckdb'
    for f in (db, db + '.wal'):
        if os.path.exists(f):
            os.remove(f)
    os.makedirs('/tmp/duckspill', exist_ok=True)
    con = duckdb.connect(db)
    con.execute("SET memory_limit='16GB'")
    con.execute("SET threads=4")
    con.execute("SET temp_directory='/tmp/duckspill'")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sfdir}/documents.parquet'")

    t0 = time.time()
    con.execute(r"""CREATE TABLE c AS
WITH w AS (
  SELECT doc_id, lang, list_filter(string_split(translate(
    regexp_replace(text, '\\n', ' n', 'g'), '".,/()?;', '        '), ' '),
    w -> w != '') AS ws FROM documents)
SELECT doc_id, lang,
    unnest(range(0, len(chunks))) AS pos,
    unnest(chunks) AS chunk
FROM (
    SELECT doc_id, lang,
      list_transform(range(0, ((len(ws) - 1) // 10) + 1),
        k -> array_to_string(ws[k*10+1 : k*10+10], ' ')) AS chunks
    FROM w WHERE len(ws) >= 1)""")
    mx = con.execute("SELECT max(pos), count(*) FROM c").fetchone()
    assert mx[0] < 1048576, f"pos {mx[0]} overflows the 2^20 encoding"
    print(f"phase c: {time.time()-t0:.1f}s rss={rss_gb():.1f}GB "
          f"rows={mx[1]} maxpos={mx[0]}", flush=True)

    t0 = time.time()
    con.execute("""CREATE TABLE f AS
SELECT md5_number(chunk) AS h, MIN(doc_id * 1048576 + pos) AS dp
FROM c GROUP BY h""")
    print(f"phase f: {time.time()-t0:.1f}s rss={rss_gb():.1f}GB rows="
          f"{con.execute('SELECT count(*) FROM f').fetchone()[0]}", flush=True)

    t0 = time.time()
    con.execute("""CREATE TABLE k AS
SELECT c.doc_id, c.lang, c.pos, c.chunk
FROM c JOIN f ON md5_number(c.chunk) = f.h
  AND c.doc_id = f.dp // 1048576 AND c.pos = f.dp % 1048576""")
    print(f"phase k: {time.time()-t0:.1f}s rss={rss_gb():.1f}GB rows="
          f"{con.execute('SELECT count(*) FROM k').fetchone()[0]}", flush=True)

    tot = {r[0]: r[1] for r in con.execute(
        "SELECT lang, COUNT(*) FROM c GROUP BY lang").fetchall()}

    acc = {}
    t0 = time.time()
    for s in range(16):
        rows = con.execute(f"""
      SELECT lang, COUNT(*), SUM(n_kept), SUM(toks), SUM(checksum) FROM (
        SELECT doc_id, lang, COUNT(*) AS n_kept,
          SUM(len(string_split(chunk, ' '))) AS toks,
          CAST('0x' || substring(md5(string_agg(chunk, ' ' ORDER BY pos)),1,15)
            AS BIGINT) % 1000000007 AS checksum
        FROM k WHERE doc_id % 16 = {s} GROUP BY doc_id, lang)
      GROUP BY lang""").fetchall()
        for lang, nd, nk, tk, cs in rows:
            a = acc.setdefault(lang, [0, 0, 0, 0])
            a[0] += nd
            a[1] += int(nk)
            a[2] += int(tk)
            a[3] += int(cs)
    print(f"phase r (16 slices): {time.time()-t0:.1f}s rss={rss_gb():.1f}GB",
          flush=True)

    final = sorted((lang, a[0], a[1], tot[lang] - a[1], a[3], a[2])
                   for lang, a in acc.items())
    spark = duckdb.connect().execute(
        f"""SELECT lang, n_docs_kept, n_chunks_kept, n_chunks_dropped,
               text_checksum, tokens_kept
        FROM '{dump}/q_dedup_rewrite/*.parquet' ORDER BY lang""").fetchall()
    final = [tuple(int(x) if not isinstance(x, str) else x for x in r)
             for r in final]
    spark = [tuple(int(x) if not isinstance(x, str) else x for x in r)
             for r in spark]
    print("oracle:", final)
    print("spark :", spark)
    ok = final == spark
    print("MATCH" if ok else "MISMATCH", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
