package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

import graft.core.{GQuery, Tables}
import Qdsl._

/** Interchange-format ingest paths: schema-full CSV and JSONL. The
  * reference reads its own binary formats plus text lines
  * (`TextLineFormatReader.cc`, covered by q_text_lines / the themis-kv and
  * fixed-width DSv2 sources); a Spark-native engine additionally ingests
  * the interchange formats training corpora actually arrive in. Both
  * queries prove FULL-FIDELITY round-trips with a row checksum, not just
  * row counts.
  */
object Ingest {

  /** CSV round-trip: orders serialized to a headered 4-file CSV directory
    * (decimal-exact prices, ISO dates), read back through
    * `spark.read.csv` with an explicit schema, and censused with a
    * per-row hash checksum the oracle recomputes from the parquet
    * original — any quoting/typing/precision drift in the CSV codec
    * breaks the hash. Like q_text_lines, the write lands under a
    * run-unique path (concurrent runs never race) and runs INSIDE the
    * deferred sink→source stage ([[graft.plans.DeferredIngest]]), so
    * construction is job-free and the file round-trip executes exactly
    * when the query does. CSV scans split by
    * line at any file size, so a 100 TB landing dir reads at full
    * cluster width; the explicit schema skips the inference pass Spark
    * would otherwise pay (one extra full scan). */
  def csvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = graft.core.Scratch.dir("csv", dir)
    val csvDdl = "o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DECIMAL(12,2), o_date STRING, " +
      "o_orderpriority STRING"
    graft.plans.DeferredIngest(s, csvDdl) {
      // widen BELOW the projection so the CSV encode (date_format +
      // decimal rendering, the CPU of this leg) runs at the derived
      // width instead of 1-wide before a fixed repartition(4); the
      // width tracks input bytes (clamped to session cores), so file
      // count stays sensible at any scale
      graft.core.Widen.forKernel(Tables.orders(s, dir),
          Tables.tableBytes(s, dir, "orders"), bytesPerPartition = 128L << 10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          dec(col("o_totalprice")).as("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("o_orderpriority"))
        .write.mode("overwrite").option("header", "true").csv(out)
      s.read.option("header", "true")
        .schema(StructType.fromDDL(csvDdl))
        .csv(out)
    }
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        sum(col("o_totalprice")).cast("double").as("total_price"),
        sum(hashMod(concat_ws("|", col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_date"),
          col("o_orderpriority")))).as("row_checksum"))
  }

  private val csvRoundtripSql =
    """SELECT COUNT(*) AS n_rows, COUNT(DISTINCT o_orderkey) AS n_keys,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_price,
      |  CAST(SUM(CAST('0x' || substring(md5(
      |    CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR) || '|' ||
      |    o_orderstatus || '|' ||
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) || '|' ||
      |    strftime(o_orderdate, '%Y-%m-%d') || '|' || o_orderpriority
      |  ),1,15) AS BIGINT) % 1000000007) AS BIGINT) AS row_checksum
      |FROM orders""".stripMargin

  /** ORC round-trip: the same full-fidelity census as [[csvRoundtrip]]
    * through Spark's built-in columnar ORC codec — orders written to a
    * 4-file ORC directory (decimal and date stay TYPED, unlike the CSV
    * leg's string encodings), read back, and row-checksummed against the
    * parquet original recomputed by the oracle. Exercises the second
    * columnar interchange format a lake actually mixes with parquet;
    * the read side vectorizes and splits by stripe, so a 100 TB ORC
    * landing dir scans at full cluster width with predicate pushdown
    * intact. Runs inside [[graft.plans.DeferredIngest]] under a
    * run-unique scratch path like every write-then-read query. */
  def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = graft.core.Scratch.dir("orc", dir)
    val ddl = "o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DECIMAL(12,2), o_date DATE, " +
      "o_orderpriority STRING"
    graft.plans.DeferredIngest(s, ddl) {
      // same widen-below-projection stance as the CSV leg
      graft.core.Widen.forKernel(Tables.orders(s, dir),
          Tables.tableBytes(s, dir, "orders"), bytesPerPartition = 128L << 10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          dec(col("o_totalprice")).as("o_totalprice"),
          col("o_orderdate").cast("date").as("o_date"),
          col("o_orderpriority"))
        .write.mode("overwrite").orc(out)
      s.read.schema(StructType.fromDDL(ddl)).orc(out)
    }
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        sum(col("o_totalprice")).cast("double").as("total_price"),
        sum(hashMod(concat_ws("|", col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"),
          date_format(col("o_date"), "yyyy-MM-dd"),
          col("o_orderpriority")))).as("row_checksum"))
  }

  // same census as the CSV leg — the formats must agree byte-for-byte
  // on the reconstructed rows, so they share one oracle definition
  private val orcRoundtripSql = csvRoundtripSql

  /** Schema evolution on read: two GENERATIONS of the documents table —
    * an old layout without the `quality` column (even doc_ids, under
    * `gen=1`) and a new layout that added it (odd doc_ids, `gen=2`,
    * quality = doc_id % 97 as DECIMAL(12,2)) — land under one root and
    * are read back through `mergeSchema`, the way a 100 TB corpus that
    * gained a column mid-crawl actually reads (old files yield NULL for
    * the added column; nothing is rewritten). Censused per generation:
    * doc counts, non-null quality counts, the decimal-exact quality
    * sum, and a char-count checksum — the oracle re-derives all four
    * from the split rule. Schema merge is a footer-only operation
    * (no data scan), and the `gen=` directory layout doubles as a
    * partition-pruning column for generation-targeted rewrites. */
  def schemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val out = graft.core.Scratch.dir("schevo", dir)
    val ddl = "gen INT, doc_id BIGINT, lang STRING, n_chars BIGINT, " +
      "quality DECIMAL(12,2)"
    graft.plans.DeferredIngest(s, ddl) {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      docs.filter(col("doc_id") % 2 === 0)
        .write.mode("overwrite").parquet(s"$out/gen=1")
      docs.filter(col("doc_id") % 2 === 1)
        .withColumn("quality", (col("doc_id") % 97).cast("decimal(12,2)"))
        .write.mode("overwrite").parquet(s"$out/gen=2")
      s.read.option("mergeSchema", "true").parquet(out)
        .select(col("gen").cast("int").as("gen"), col("doc_id"),
          col("lang"), col("n_chars"),
          col("quality").cast("decimal(12,2)").as("quality"))
    }
      .groupBy(col("gen"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("quality")).as("n_quality"),
        coalesce(sum(col("quality")).cast("double"), lit(0.0))
          .as("sum_quality"),
        sum(col("n_chars")).as("sum_chars"))
  }

  /** Manifest-pinned snapshot reads (time travel): an append-only table
    * whose commits are (data files + a MANIFEST listing every file
    * visible at that version) — commit 1 lands the base documents,
    * commit 2 appends a delta as NEW files plus a new manifest; nothing
    * is rewritten, and a reader pinned to v1's manifest is oblivious to
    * the append (snapshot isolation by construction, the Iceberg/Delta
    * core idea at its minimum viable size). The query censuses BOTH
    * versions from their manifests and the oracle re-derives each from
    * the split rule — v1 must NOT see the appended rows. Scale shape:
    * manifests are metadata-sized (one row per file); a snapshot read
    * plans exactly the listed files, so concurrent appends never tear a
    * running 100 TB scan, and version diffs (compaction planning, CDC)
    * are manifest-only joins. */
  def snapshotRead(s: SparkSession, dir: String): DataFrame = {
    val out = graft.core.Scratch.dir("snap", dir)
    val ddl = "version INT, doc_id BIGINT, lang STRING, n_chars BIGINT"
    graft.plans.DeferredIngest(s, ddl) {
      import graft.sources.HadoopIO
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      docs.filter(col("doc_id") % 3 =!= 0)
        .write.mode("overwrite").parquet(s"$out/data/c1")
      docs.filter(col("doc_id") % 3 === 0)
        .write.mode("overwrite").parquet(s"$out/data/c2")
      val conf = HadoopIO.sessionConf(s)
      def files(sub: String): Seq[String] =
        HadoopIO.listFiles(s"$out/data/$sub", conf)
          .map(_.getPath.toString).filter(_.endsWith(".parquet"))
      val v1 = files("c1")
      val v2 = v1 ++ files("c2")
      // manifests persist as ordinary parquet next to the data — the
      // metadata layer is itself a queryable table (one row per file)
      import s.implicits._
      v1.toDF("path").write.mode("overwrite").parquet(s"$out/manifest/v=1")
      v2.toDF("path").write.mode("overwrite").parquet(s"$out/manifest/v=2")
      def snapshot(v: Int): DataFrame = {
        val paths = s.read.parquet(s"$out/manifest/v=$v")
          .as[String].collect().toSeq // metadata-sized: one row per file
        s.read.parquet(paths: _*).select(lit(v).as("version"),
          col("doc_id"), col("lang"), col("n_chars"))
      }
      snapshot(1).unionByName(snapshot(2))
    }
      .groupBy(col("version"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("lang")).as("n_langs"),
        sum(hashMod(col("doc_id"))).as("id_checksum"))
  }

  private val snapshotReadSql =
    """WITH v1 AS (SELECT 1 AS version, doc_id, lang, n_chars
      |            FROM documents WHERE doc_id % 3 <> 0),
      |v2 AS (SELECT 2 AS version, doc_id, lang, n_chars FROM documents),
      |t AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
      |SELECT version, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |  CAST(SUM(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15) AS BIGINT) % 1000000007) AS BIGINT) AS id_checksum
      |FROM t GROUP BY version""".stripMargin

  private val schemaEvolutionSql =
    """WITH t AS (
      |  SELECT CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS gen, n_chars,
      |    CASE WHEN doc_id % 2 = 1 THEN CAST(doc_id % 97 AS DECIMAL(12,2)) END AS quality
      |  FROM documents)
      |SELECT gen, COUNT(*) AS n_docs,
      |  CAST(COUNT(quality) AS BIGINT) AS n_quality,
      |  COALESCE(CAST(CAST(SUM(quality) AS VARCHAR) AS DOUBLE), 0.0) AS sum_quality,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM t GROUP BY gen""".stripMargin

  /** JSONL ingest: documents serialized to JSON lines in-plan
    * (`to_json`), parsed back with a schema-full `from_json`, and
    * censused per language with a text checksum — the round-trip is an
    * identity, which the oracle asserts by computing the same census
    * straight from the table. This is the codec path a JSONL corpus
    * drop (the common LLM-corpus interchange) takes on ingest; both
    * codec directions stay inside whole-stage codegen, no UDFs. */
  def jsonlParse(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType.fromDDL(
      "doc_id BIGINT, lang STRING, n_chars BIGINT, text STRING")
    Tables.documents(s, dir)
      .select(to_json(struct(col("doc_id"), col("lang"), col("n_chars"),
        col("text"))).as("line"))
      .select(from_json(col("line"), schema).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"),
        col("r.n_chars").as("n_chars"), col("r.text").as("text"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(hashMod(col("text"))).as("text_checksum"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
  }

  private val jsonlParseSql =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(SUM(CAST('0x' || substring(md5(text),1,15) AS BIGINT) % 1000000007) AS BIGINT) AS text_checksum,
      |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      |FROM documents GROUP BY lang""".stripMargin

  /** Bad-record quarantine: a JSONL feed where a deterministic 1-in-7
    * slice of lines is corrupted in-plan (truncated to 20 chars — an
    * interrupted upload / split-mid-record, the classic landing-zone
    * failure), parsed with schema-full `from_json`, and triaged into a
    * per-language census of clean vs quarantined rows with a clean-side
    * checksum. `from_json` yields NULL on malformed input (PERMISSIVE),
    * so quarantine detection is `parsed IS NULL` — scan-local, no job
    * failure, the corrupt slice lands in a reviewable bucket instead of
    * killing a 100 TB ingest. The oracle rebuilds the same triage from
    * the corruption rule. Null-lang parse results fold into the
    * quarantine bucket under `lang = '__quarantine__'`. */
  def jsonQuarantine(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType.fromDDL(
      "doc_id BIGINT, lang STRING, n_chars BIGINT, text STRING")
    val lines = Tables.documents(s, dir)
      .select(col("doc_id").as("line_no"),
        to_json(struct(col("doc_id"), col("lang"), col("n_chars"),
          col("text"))).as("line"))
      .select(col("line_no"),
        when(col("line_no") % 7 === 0, substring(col("line"), 1, 20))
          .otherwise(col("line")).as("line"))
    lines
      .select(col("line_no"), from_json(col("line"), schema).as("r"))
      .select(col("line_no"),
        coalesce(col("r.lang"), lit("__quarantine__")).as("lang"),
        col("r.n_chars").as("n_chars"), col("r.text").as("text"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("text").isNull, 1L).otherwise(0L)).as("n_quarantined"),
        coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"),
        coalesce(sum(hashMod(col("text"))), lit(0L)).as("clean_checksum"))
  }

  private val jsonQuarantineSql =
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN '__quarantine__' ELSE lang END AS lang,
      |    CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars END AS n_chars,
      |    CASE WHEN doc_id % 7 = 0 THEN NULL ELSE text END AS text
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
      |  COALESCE(CAST(SUM(n_chars) AS BIGINT), 0) AS sum_chars,
      |  COALESCE(CAST(SUM(CAST('0x' || substring(md5(text),1,15) AS BIGINT) % 1000000007) AS BIGINT), 0) AS clean_checksum
      |FROM t GROUP BY lang""".stripMargin

  /** Hive-partitioned sink + read-back: documents written
    * `partitionBy(lang)` to parquet (the layout a 100 TB corpus lands in
    * so per-language jobs prune whole directories — partition pruning on
    * this layout is plan-asserted in ScaleShapeSpec), read back through
    * partition discovery, and censused with a row checksum against the
    * original. The partition column round-trips through the directory
    * encoding, which is exactly what this query pins: a value that
    * doesn't survive `lang=<value>` path encoding breaks the hash. */
  def partitionedWrite(s: SparkSession, dir: String): DataFrame = {
    val out = graft.core.Scratch.dir("pwrite", dir)
    graft.plans.DeferredIngest(s,
      "doc_id BIGINT, source STRING, n_chars BIGINT, lang STRING") {
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      // partition discovery appends the partition column last; the
      // explicit select pins the declared column order either way
      s.read.parquet(out)
        .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
    }
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        sum(hashMod(concat_ws("|", col("doc_id"), col("source"))))
          .as("row_checksum"))
  }

  private val partitionedWriteSql =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(SUM(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|' || source),1,15) AS BIGINT) % 1000000007) AS BIGINT) AS row_checksum
      |FROM documents GROUP BY lang""".stripMargin

  /** Write both fact sides as BUCKETED catalog tables (same bucket count,
    * same key, one file per bucket) and return their join — the layout
    * step and the co-located read it buys. Factored out of
    * [[bucketedJoin]] so BucketedJoinSpec can plan-assert the join leg
    * directly: SortMergeJoin with ZERO Exchange — both scans come up
    * hash-partitioned on the join key straight from the file layout. The
    * partition-LOCAL sorts remain (Spark only trusts bucket file order
    * under the legacy `bucketedTableScan.outputOrdering` flag), but they
    * are shuffle-free and nearly free over `sortBy`-ordered files; the
    * exchange of the fact table is the 100 TB cost this layout deletes.
    * The layout write itself is [[graft.api.Layout.bucketize]] — the
    * facade and this oracle-checked query share one code path. */
  private[graft] def bucketedJoinFrames(s: SparkSession, dir: String,
      liPath: String, ordPath: String, numBuckets: Int): DataFrame = {
    val tag = Integer.toHexString(dir.hashCode)
    val li = graft.api.Layout.bucketize(
      Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount")),
      "l_orderkey", numBuckets, liPath, s"graft_bkt_lineitem_$tag")
    val ord = graft.api.Layout.bucketize(
      Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority")),
      "o_orderkey", numBuckets, ordPath, s"graft_bkt_orders_$tag")
    // merge hint: pin SortMergeJoin so the co-location is what the plan
    // exercises at every scale (a broadcast of the small side at sf0.01
    // would also be exchange-free, but for the wrong reason)
    li.hint("merge")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"), col("l_orderkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
  }

  /** Bucketed-table co-located join — the layout move that deletes the
    * biggest shuffle a 100 TB warehouse pays: lineitem and orders are
    * written `bucketBy(8, orderkey)` + `sortBy(orderkey)` as external
    * catalog tables (inside the deferred sink→source stage, so the layout
    * job runs when the query does and Bench bills it as `construction`),
    * then joined WITHOUT any exchange — both scans come up
    * hash-partitioned on the join key straight from the file layout,
    * leaving only shuffle-free partition-local sorts.
    * This is the complement of q_partitioned_write's
    * directory-pruning story: partitioning prunes scans, bucketing
    * co-locates joins; a fact table bucketed on its join key at write
    * time pays its join shuffle ONCE at layout instead of on every query.
    * The census per order priority checksums the joined rows so any
    * bucket routing error (a row hashed to the wrong bucket joins
    * nothing) breaks the count, not just the timing. */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val liPath = graft.core.Scratch.dir("bktli", dir)
    val ordPath = graft.core.Scratch.dir("bktord", dir)
    graft.plans.DeferredIngest(s,
      "o_orderpriority STRING, l_orderkey BIGINT, l_quantity DOUBLE, " +
        "l_extendedprice DOUBLE, l_discount DOUBLE") {
      // numBuckets measured, not assumed: 32 (the session width) was
      // A/B'd at sf0.1 and LOST (1.69 s -> 2.08 s) — the wider bucketed
      // write (numBuckets files per write task) costs more than the
      // extra join width returns at this volume; production picks
      // buckets from data volume at layout time, not per query
      bucketedJoinFrames(s, dir, liPath, ordPath, numBuckets = 8)
    }
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        sumDec(col("l_quantity")).as("sum_qty"),
        sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
  }

  private val bucketedJoinSql =
    """SELECT o_orderpriority, COUNT(*) AS n_items,
      |  COUNT(DISTINCT l_orderkey) AS n_orders,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(14,4))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  /** Compaction PLANNER — the OPTIMIZE bin-packing step of table
    * maintenance: segments (here doc_id DIV 20 standing in for data
    * files, weighted by their text bytes) are packed size-descending
    * into bins of target capacity ceil(total/8) via the next-fit
    * cumulative-sum rule: bin = exclusive-prefix-bytes DIV target.
    * Deterministic (ties by segment id), relational (ONE window over
    * the segment CENSUS — thousands of rows for millions of files,
    * never data rows), and the bin spread census it emits is the
    * rebalance check an operator reads before submitting the rewrite.
    * At 100 TB the segment census comes from the file listing /
    * manifest, the same shape. */
  def compactionPlan(s: SparkSession, dir: String): DataFrame = {
    val segs = Tables.documents(s, dir)
      .groupBy(expr("doc_id DIV 20").as("segment"))
      .agg(sum(col("n_chars")).as("bytes"))
    val tot = segs.agg(expr("CAST(ceil(SUM(bytes) / 8.0) AS BIGINT)").as("target"))
    val w = Window.orderBy(col("bytes").desc, col("segment"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    segs.crossJoin(broadcast(tot))
      .withColumn("cum", sum(col("bytes")).over(w))
      .select(col("segment"), col("bytes"),
        expr("(cum - bytes) DIV target").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_segments"), sum(col("bytes")).as("bin_bytes"),
        min(col("segment")).as("seg_min"), max(col("segment")).as("seg_max"))
  }

  private val compactionPlanSql =
    """WITH segs AS (
      |  SELECT doc_id // 20 AS segment, SUM(n_chars) AS bytes
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(ceil(SUM(bytes) / 8.0) AS BIGINT) AS target FROM segs),
      |planned AS (
      |  SELECT segment, bytes,
      |    CAST((SUM(bytes) OVER (ORDER BY bytes DESC, segment
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bytes)
      |      // target AS BIGINT) AS bin
      |  FROM segs CROSS JOIN tot)
      |SELECT bin, COUNT(*) AS n_segments,
      |  CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
      |  MIN(segment) AS seg_min, MAX(segment) AS seg_max
      |FROM planned GROUP BY bin""".stripMargin

  /** Binary training-shard export round-trip: documents serialized as
    * length-prefixed themis-kv records (key = "id|lang" UTF-8 bytes,
    * value = UTF-8 text bytes — the reference's own KVPairFormat,
    * SURVEY §2.1) inside a deferred sink→source stage, read back through
    * the themis-kv source, and censused per language with a text
    * checksum the oracle recomputes straight from the table — any byte
    * drift in either codec direction breaks the hash. This is the
    * record-framed export a binary shard consumer (a training loader)
    * actually reads: splittable by file, schema out of band, and the
    * same bytes on any engine. */
  def binaryExport(s: SparkSession, dir: String): DataFrame = {
    val out = graft.core.Scratch.dir("kvexp", dir)
    graft.plans.DeferredIngest(s, "doc_id BIGINT, lang STRING, text STRING") {
      graft.sources.ThemisKV.write(
        Tables.documents(s, dir).select(
          encode(concat_ws("|", col("doc_id"), col("lang")), "UTF-8").as("key"),
          encode(col("text"), "UTF-8").as("value")), out)
      graft.sources.ThemisKV.read(s, out)
        .select(split(decode(col("key"), "UTF-8"), "\\|").as("kp"),
          decode(col("value"), "UTF-8").as("text"))
        .select(element_at(col("kp"), 1).cast("long").as("doc_id"),
          element_at(col("kp"), 2).as("lang"), col("text"))
    }
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("id_sum"),
        sum(hashMod(col("text"))).as("text_checksum"))
  }

  private val binaryExportSql =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_sum,
      |  CAST(SUM(CAST('0x' || substring(md5(text),1,15) AS BIGINT) % 1000000007) AS BIGINT) AS text_checksum
      |FROM documents GROUP BY lang""".stripMargin

  val defs: Seq[GQuery] = Seq(
    GQuery("q_binary_export", binaryExport, Some(binaryExportSql)),
    GQuery("q_bucketed_join", bucketedJoin, Some(bucketedJoinSql),
      headline = true),
    GQuery("q_compaction_plan", compactionPlan, Some(compactionPlanSql)),
    GQuery("q_csv_roundtrip", csvRoundtrip, Some(csvRoundtripSql), headline = true),
    GQuery("q_jsonl_parse", jsonlParse, Some(jsonlParseSql)),
    GQuery("q_orc_roundtrip", orcRoundtrip, Some(orcRoundtripSql)),
    GQuery("q_schema_evolution", schemaEvolution, Some(schemaEvolutionSql)),
    GQuery("q_snapshot_read", snapshotRead, Some(snapshotReadSql)),
    GQuery("q_json_quarantine", jsonQuarantine, Some(jsonQuarantineSql)),
    GQuery("q_partitioned_write", partitionedWrite, Some(partitionedWriteSql), headline = true))
}
