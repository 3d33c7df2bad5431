#!/usr/bin/env python3
"""Build a documents fixture with non-ASCII and newline-bearing payloads.

The q_media_features / q_embed_batch oracles fold the UTF-8 OCTETS of
`text` (walking hex(encode(text)) pairwise), mirroring the Spark side's
fold over `text.cast("binary")`. This script materializes the fixture
that proves the contract beyond the ASCII driver testdata: sf0.001's
documents plus rows containing multi-byte UTF-8 (accents, CJK, emoji)
and embedded newlines.

Usage:
  python3 tools/nonascii_fixture.py [outdir]     # default /tmp/graft_nonascii
then:
  sbt "runMain graft.Verify <outdir> /tmp/verify_nonascii q_media_features q_embed_batch"
  python3 tools/check.py <outdir> /tmp/verify_nonascii q_media_features q_embed_batch
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq

EXTRA = [
    "héllo wörld — Dünya 🌍 café\nnaïve emoji 🚀 line",
    "日本語のテキストと中文混在、改行も\nあり。München Zürich",
    "Ω≈ç√∫˜µ≤≥÷ åß∂ƒ©˙∆˚¬…æ\n\ttab and ünïcödé",
]

def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_nonascii"
    src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    base = max(src.column("doc_id").to_pylist()) + 1
    rows = {
        "doc_id": [base + i for i in range(len(EXTRA))],
        "text": EXTRA,
        "lang": ["xx"] * len(EXTRA),
        "source": ["nonascii_fixture"] * len(EXTRA),
        "n_chars": [len(t) for t in EXTRA],
    }
    extra = pa.table(rows, schema=pa.schema(
        [(f.name, f.type) for f in src.schema]))
    merged = pa.concat_tables([src, extra])
    import os
    os.makedirs(out, exist_ok=True)
    pq.write_table(merged, f"{out}/documents.parquet")
    print(f"wrote {merged.num_rows} rows ({len(EXTRA)} non-ASCII) to {out}/documents.parquet")

if __name__ == "__main__":
    main()
