package graft

import graft.queries.Ingest

/** Cross-format fidelity: the CSV and ORC round-trips reconstruct the
  * SAME rows from the same source table, so their censuses (row count,
  * key count, decimal total, per-row hash checksum) must be identical —
  * any drift in either codec's type handling (decimal scale, date
  * formatting, quoting) breaks the equality. Complements the per-format
  * oracle checks (q_csv_roundtrip / q_orc_roundtrip), which pin each
  * census against DuckDB independently. */
class IngestFormatsSpec extends SparkSpec {

  test("ORC and CSV round-trips agree on the full-fidelity census") {
    val csv = Ingest.csvRoundtrip(spark, sfDir).collect()
    val orc = Ingest.orcRoundtrip(spark, sfDir).collect()
    assert(csv.length == 1 && orc.length == 1)
    val (c, o) = (csv.head, orc.head)
    assert(c.getLong(0) == o.getLong(0), "n_rows")
    assert(c.getLong(1) == o.getLong(1), "n_keys")
    assert(c.getDouble(2) == o.getDouble(2), "total_price")
    assert(c.getLong(3) == o.getLong(3), "row_checksum")
    assert(c.getLong(0) > 0L)
  }
}
