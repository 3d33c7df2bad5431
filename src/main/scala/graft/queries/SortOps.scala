package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GQuery, Tables}
import Qdsl._

/** Sort-benchmark-shaped capabilities: deterministic record generation
  * (gensort analog, `src/gensort/gensort.c:58`), global sort with
  * validation summary (valsort analog, `src/scripts/valsort/validate.py`),
  * data inflation (`RatioMapFunction.cc:8-42`) and key-prefix projection
  * counting (`BytesCountMapFunction.cc:10-19`).
  *
  * The actual sortedness check (per-partition order + cross-partition
  * boundary check, valsort's real algorithm) is engine-side and runs in
  * SortOpsSpec via mapPartitions over the range-partitioned output —
  * here the oracle-checked queries expose the order-independent parts
  * (counts, checksums, extremes) that validate.py aggregates across nodes
  * (`validate.py:269-300`).
  */
object SortOps {

  /** gensort analog: n deterministic records keyed by md5(i), summarized
    * by count/checksum/extremes. The generator is `spark.range` — purely
    * parallel, zero shuffle until the single-row summary; n scales with
    * the sf directory via a count of lineitem. */
  def gensortChecksum(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.lineitem(s, dir).count()
    s.range(n).toDF("i")
      .select(md5(col("i").cast("string")).as("key"),
        hash60(col("i")).as("h"))
      .agg(count(lit(1)).as("n_records"),
        sum(col("h") % P).as("checksum"),
        min(col("key")).as("min_key"),
        max(col("key")).as("max_key"))
  }

  private val gensortChecksumSql =
    """SELECT COUNT(*) AS n_records,
      |  CAST(SUM(CAST('0x' || substring(md5(CAST(i AS VARCHAR)),1,15) AS BIGINT) % 1000000007) AS BIGINT) AS checksum,
      |  MIN(md5(CAST(i AS VARCHAR))) AS min_key,
      |  MAX(md5(CAST(i AS VARCHAR))) AS max_key
      |FROM (SELECT (row_number() OVER ()) - 1 AS i FROM lineitem)""".stripMargin

  /** valsort analog, order-independent half: record count, order-independent
    * checksum of whole records, key extremes over the sort input — what
    * validate.py's merge step checks across nodes. Pure aggregation: one
    * partial-agg shuffle of a single row per partition. */
  def valsortSummary(s: SparkSession, dir: String): DataFrame = {
    val key = concat_ws("|", col("l_orderkey"), col("l_linenumber"))
    val rec = concat_ws("|", col("l_orderkey"), col("l_linenumber"),
      col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    Tables.lineitem(s, dir)
      .select(key.as("key"), hash60(rec).as("h"))
      .agg(count(lit(1)).as("n_records"),
        sum(col("h") % P).as("checksum"),
        min(col("key")).as("min_key"),
        max(col("key")).as("max_key"))
  }

  private val valsortSummarySql =
    """SELECT COUNT(*) AS n_records,
      |  CAST(SUM(CAST('0x' || substring(md5(rec),1,15) AS BIGINT) % 1000000007) AS BIGINT) AS checksum,
      |  MIN(key) AS min_key, MAX(key) AS max_key
      |FROM (SELECT
      |    CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR) AS key,
      |    CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR) || '|' ||
      |    CAST(l_partkey AS VARCHAR) || '|' || CAST(l_suppkey AS VARCHAR) || '|' ||
      |    CAST(l_quantity AS VARCHAR) AS rec
      |  FROM lineitem) t""".stripMargin

  /** Ratio inflation (`RatioMapFunction.cc:8-42`): emit 3 copies of every
    * event with a derived pseudo-random key, summarized per copy index.
    * The explode is a generator inside the scan stage — the inflation
    * never shuffles, only the 3-row summary does. */
  def ratioInflate(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"), explode(sequence(lit(0), lit(2))).as("copy_idx"))
      .select(col("copy_idx"),
        hashMod(concat_ws("_", col("event_id"), col("copy_idx"))).as("k"))
      .groupBy(col("copy_idx"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("key_checksum"))

  private val ratioInflateSql =
    """SELECT copy_idx, COUNT(*) AS n,
      |  CAST(SUM(CAST('0x' || substring(md5(CAST(event_id AS VARCHAR) || '_' || CAST(copy_idx AS VARCHAR)),1,15) AS BIGINT) % 1000000007) AS BIGINT) AS key_checksum
      |FROM events CROSS JOIN (SELECT range AS copy_idx FROM range(3)) t
      |GROUP BY copy_idx""".stripMargin

  /** BytesCount analog: project each record to a fixed-size key prefix and
    * count — `substring(key, 1, N)` + hash aggregation. */
  def prefixCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(substring(col("text"), 1, 10).as("prefix"))
      .groupBy(col("prefix"))
      .agg(count(lit(1)).as("cnt"))

  private val prefixCountSql =
    """SELECT substring(text, 1, 10) AS prefix, COUNT(*) AS cnt
      |FROM documents GROUP BY 1""".stripMargin

  /** Z-order (Morton) layout clustering: interleave the bits of two
    * dimensions (user % 2048, event-target % 500 — 11 bits each) into a
    * 22-bit z-value and census fixed-width z-ranges with their bounding
    * boxes. The point of the curve: consecutive z-ranges cover small
    * rectangles in BOTH dimensions at once, so data written
    * `repartitionByRange($"z").sortWithinPartitions($"z")` gets parquet
    * min/max stats that prune 2-D predicates — the Delta/Iceberg
    * OPTIMIZE ZORDER layout as a plain deterministic expression (the
    * interleave is a 22-term codegen'd bit fold, no UDF). Output proves
    * locality: each 2^16-wide z-bucket is one aligned 256×256 tile, so
    * both dimensions' bounding boxes stay ≤ 256 — asserted in
    * AnalyticsSpec (a single-column sort would leave y unbounded). */
  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.events(s, dir)
      .select((col("user_id") % 2048).as("x"), (col("event_id") % 500).as("y"))
    val z = (0 until 11).map(i =>
      expr(s"shiftleft(shiftright(x, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright(y, $i) & 1, ${2 * i + 1})"): org.apache.spark.sql.Column)
      .reduce(_ + _)
    pts.select(col("x"), col("y"), z.as("z"))
      .groupBy(expr("z DIV 65536").as("z_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
  }

  private val zorderLayoutSql =
    """WITH pts AS (
      |  SELECT user_id % 2048 AS x, event_id % 500 AS y FROM events),
      |zv AS (
      |  SELECT x, y,
      |    list_sum([((x >> i) & 1) << (2*i) for i in range(11)]) +
      |    list_sum([((y >> i) & 1) << (2*i + 1) for i in range(11)]) AS z
      |  FROM pts)
      |SELECT CAST(z // 65536 AS BIGINT) AS z_bucket, COUNT(*) AS n_rows,
      |  MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
      |FROM zv GROUP BY 1""".stripMargin

  /** WHY z-order — the skippability census q_zorder_layout's zone maps
    * make possible: the same points are zoned two ways at the SAME zone
    * count (64 linear x-range zones vs 64 z-order buckets), each zone
    * carries its min/max box, and a fixed 2-D box predicate
    * (x ≤ 255 ∧ y ≤ 124, a 1/8 × 1/4 slab) is tested against every
    * zone box. A linear layout clusters x only, so every zone spans the
    * full y range and the y half of the predicate skips nothing; the
    * z-curve interleaves both axes, so most zone boxes miss the slab
    * entirely. Output: per layout, zones read/skipped and rows read —
    * the numbers a 100 TB table's sort-key choice is made on (this is
    * exactly the parquet row-group pruning model: a zone = a row group,
    * its box = the column min/max stats). */
  def zoneSkip(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.events(s, dir)
      .select((col("user_id") % 2048).as("x"), (col("event_id") % 500).as("y"))
    val z = (0 until 11).map(i =>
      expr(s"shiftleft(shiftright(x, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright(y, $i) & 1, ${2 * i + 1})"): org.apache.spark.sql.Column)
      .reduce(_ + _)
    val zoned = pts
      .select(col("x"), col("y"), expr("x DIV 32").as("lin_zone"), z.as("zraw"))
      .select(col("x"), col("y"), col("lin_zone"),
        expr("zraw DIV 65536").as("z_zone"))
    def census(zoneCol: String, layout: String) = zoned
      .groupBy(col(zoneCol).as("zone"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .select(lit(layout).as("layout"), col("n_rows"),
        (col("x_min") <= 255 && col("x_max") >= 0 &&
          col("y_min") <= 124 && col("y_max") >= 0).as("read"))
      .groupBy(col("layout"))
      .agg(count(lit(1)).as("n_zones"),
        sum(when(col("read"), 1L).otherwise(0L)).as("zones_read"),
        sum(when(col("read"), col("n_rows")).otherwise(0L)).as("rows_read"),
        sum(col("n_rows")).as("rows_total"))
    census("lin_zone", "linear").unionByName(census("z_zone", "zorder"))
  }

  private val zoneSkipSql =
    """WITH pts AS (
      |  SELECT user_id % 2048 AS x, event_id % 500 AS y FROM events),
      |zv AS (
      |  SELECT x, y, x // 32 AS lin_zone,
      |    (list_sum([((x >> i) & 1) << (2*i) for i in range(11)]) +
      |     list_sum([((y >> i) & 1) << (2*i + 1) for i in range(11)])) // 65536 AS z_zone
      |  FROM pts),
      |lz AS (
      |  SELECT lin_zone, COUNT(*) AS n_rows,
      |    MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
      |  FROM zv GROUP BY 1),
      |zz AS (
      |  SELECT z_zone, COUNT(*) AS n_rows,
      |    MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
      |  FROM zv GROUP BY 1),
      |l AS (
      |  SELECT 'linear' AS layout, CAST(COUNT(*) AS BIGINT) AS n_zones,
      |    CAST(SUM(CASE WHEN x_min <= 255 AND x_max >= 0 AND y_min <= 124 AND y_max >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS zones_read,
      |    CAST(SUM(CASE WHEN x_min <= 255 AND x_max >= 0 AND y_min <= 124 AND y_max >= 0 THEN n_rows ELSE 0 END) AS BIGINT) AS rows_read,
      |    CAST(SUM(n_rows) AS BIGINT) AS rows_total
      |  FROM lz),
      |r AS (
      |  SELECT 'zorder' AS layout, CAST(COUNT(*) AS BIGINT) AS n_zones,
      |    CAST(SUM(CASE WHEN x_min <= 255 AND x_max >= 0 AND y_min <= 124 AND y_max >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS zones_read,
      |    CAST(SUM(CASE WHEN x_min <= 255 AND x_max >= 0 AND y_min <= 124 AND y_max >= 0 THEN n_rows ELSE 0 END) AS BIGINT) AS rows_read,
      |    CAST(SUM(n_rows) AS BIGINT) AS rows_total
      |  FROM zz)
      |SELECT * FROM l UNION ALL SELECT * FROM r""".stripMargin

  val defs: Seq[GQuery] = Seq(
    GQuery("q_gensort_checksum", gensortChecksum, Some(gensortChecksumSql)),
    GQuery("q_valsort_summary", valsortSummary, Some(valsortSummarySql)),
    GQuery("q_ratio_inflate", ratioInflate, Some(ratioInflateSql)),
    GQuery("q_prefix_count", prefixCount, Some(prefixCountSql)),
    GQuery("q_zorder_layout", zorderLayout, Some(zorderLayoutSql)),
    GQuery("q_zone_skip", zoneSkip, Some(zoneSkipSql)))
}
