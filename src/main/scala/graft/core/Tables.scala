package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet testdata tables
  * (see /root/repo/TESTDATA.md). One parquet file per table under
  * `\$dir/<name>.parquet`. Reads are `spark.read.parquet` so Catalyst
  * handles column pruning / predicate pushdown into the scan — with the
  * schema passed EXPLICITLY: schema inference reads parquet footers in a
  * Spark job at DataFrame-construction time, which both bills a job
  * before any action (RegistryPlanSpec pins construction at zero jobs)
  * and, on a 100 TB landing directory, is a full footer sweep per
  * query construction. The declared schemas mirror TESTDATA.md;
  * a mismatch fails loudly at scan time, and the correctness gate
  * re-validates every column through the DuckDB oracle.
  */
object Tables {

  private val schemas: Map[String, String] = Map(
    "region" -> "r_regionkey INT, r_name STRING",
    "nation" -> "n_nationkey INT, n_name STRING, n_regionkey INT",
    "customer" -> ("c_custkey BIGINT, c_name STRING, c_nationkey INT, " +
      "c_acctbal DOUBLE, c_mktsegment STRING"),
    "supplier" -> ("s_suppkey BIGINT, s_name STRING, s_nationkey INT, " +
      "s_acctbal DOUBLE"),
    "part" -> ("p_partkey BIGINT, p_name STRING, p_brand STRING, " +
      "p_type STRING, p_size INT, p_retailprice DOUBLE"),
    "orders" -> ("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
      "o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING"),
    "lineitem" -> ("l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, " +
      "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, " +
      "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, " +
      "l_linestatus STRING, l_shipdate TIMESTAMP_NTZ"),
    // ts schema is resolved per-file: TIMESTAMP(NANOS) testdata surfaces
    // as BIGINT under the nanosAsLong flag, TIMESTAMP(MICROS/MILLIS)
    // testdata reads natively (see events() / eventsTsSchema())
    "events" -> ("event_id BIGINT, ts BIGINT, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"),
    "documents" -> ("doc_id BIGINT, text STRING, lang STRING, " +
      "source STRING, n_chars BIGINT"),
    "embeddings" -> "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table '$name' (know: ${names.mkString(",")})")
    spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(schemas(name)))
      .parquet(s"$dir/$name.parquet")
  }

  private val tableBytesCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** On-disk bytes of `$dir/<name>.parquet` — the size signal the
    * adaptive loop widths ([[LoopWidth.forBytes]]) derive from. Pure
    * driver-side file listing through the Hadoop FS API (works on any
    * scheme, no Spark job — construction stays job-free), cached per
    * path: the testdata tables are immutable for a process lifetime and
    * Bench re-constructs each query 3×. A missing path sizes as 0 (the
    * scan itself will fail loudly later if it matters). */
  def tableBytes(spark: SparkSession, dir: String, name: String): Long = {
    val p = s"$dir/$name.parquet"
    tableBytesCache.computeIfAbsent(p, { path =>
      try {
        val conf = new org.apache.hadoop.conf.Configuration()
        val hp = new org.apache.hadoop.fs.Path(path)
        val fs = hp.getFileSystem(conf)
        val st = fs.getFileStatus(hp)
        if (st.isFile) st.getLen
        else graft.sources.HadoopIO.listFiles(path, conf).map(_.getLen).sum
      } catch { case _: java.io.FileNotFoundException => 0L }
    })
  }

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** How `ts` is physically stored in an events parquet file. The driver
    * has shipped two generations of testdata: TIMESTAMP(NANOS) — which
    * Spark 4 refuses to map to a timestamp type, so it must be read as
    * long under the nanosAsLong flag and rescaled — and native
    * TIMESTAMP(MICROS) (round 8+), which reads directly. Mis-guessing is
    * catastrophic (a micros file read as nanos compresses 30 days of
    * events into 43 minutes and every temporal query silently degrades),
    * so the unit is PROBED from the parquet footer, driver-side, with no
    * Spark job (query construction stays at zero jobs — RegistryPlanSpec). */
  private[graft] sealed trait TsStorage
  private[graft] case object TsNanosAsLong extends TsStorage
  private[graft] case class TsNativeTimestamp(utcAdjusted: Boolean) extends TsStorage

  private val tsStorageCache =
    new java.util.concurrent.ConcurrentHashMap[String, TsStorage]()

  /** Footer-probe the `ts` column's logical type. Accepts a single .parquet
    * file or a directory of part files (first part wins — the driver writes
    * one homogeneous table per path). Falls back to the current driver
    * format (native micros) when no file exists yet, e.g. an empty
    * streaming source directory. Listing goes through the Hadoop FS API
    * ([[graft.sources.HadoopIO.listFiles]]), so the probe works on any
    * configured scheme, not just the local disk — the same posture as the
    * binary sources. */
  private[graft] def probeTsStorage(path: String): TsStorage =
    tsStorageCache.computeIfAbsent(path, { p =>
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import org.apache.parquet.schema.LogicalTypeAnnotation.{TimeUnit, TimestampLogicalTypeAnnotation}
      val conf = new org.apache.hadoop.conf.Configuration()
      // a DIRECT file path is probed regardless of suffix (the caller
      // chose it); a directory expands one level and probes its first
      // .parquet part by sorted name — a directory with no parquet parts
      // falls back to the default, exactly like a missing path (probing
      // an arbitrary non-parquet file would crash the footer read)
      val hp = new org.apache.hadoop.fs.Path(p)
      val direct: Option[org.apache.hadoop.fs.Path] =
        try {
          val st = hp.getFileSystem(conf).getFileStatus(hp)
          if (st.isFile) Some(st.getPath) else None
        } catch { case _: java.io.FileNotFoundException => None }
      val target: Option[org.apache.hadoop.fs.Path] = direct.orElse(
        graft.sources.HadoopIO.listFiles(p, conf)
          .filter(_.getPath.getName.endsWith(".parquet"))
          // FileSystem listing order is unspecified — sort so the probed
          // part is deterministic (any part would do, each path is
          // written homogeneously, but determinism keeps cache behavior
          // reproducible across runs)
          .sortBy(_.getPath.getName)
          .headOption.map(_.getPath))
      target match {
        case None => TsNativeTimestamp(utcAdjusted = false)
        case Some(file) =>
          val in = HadoopInputFile.fromPath(file, conf)
          val reader = ParquetFileReader.open(in)
          try {
            val schema = reader.getFooter.getFileMetaData.getSchema
            if (!schema.containsField("ts")) TsNativeTimestamp(utcAdjusted = false)
            else schema.getFields.get(schema.getFieldIndex("ts"))
              .getLogicalTypeAnnotation match {
              case t: TimestampLogicalTypeAnnotation if t.getUnit == TimeUnit.NANOS =>
                TsNanosAsLong
              case t: TimestampLogicalTypeAnnotation =>
                TsNativeTimestamp(t.isAdjustedToUTC)
              case _ =>
                // bare INT64: the legacy generator's convention was nanos
                TsNanosAsLong
            }
          } finally reader.close()
      }
    })

  private[graft] def eventsTsDdl(storage: TsStorage): String = storage match {
    case TsNanosAsLong => "ts BIGINT"
    case TsNativeTimestamp(true) => "ts TIMESTAMP"
    case TsNativeTimestamp(false) => "ts TIMESTAMP_NTZ"
  }

  /** Load events and surface `ts` as a microsecond-precision timestamp
    * regardless of the file generation. For legacy TIMESTAMP(NANOS) files
    * `DIV` keeps the rescale integral — a double division would lose
    * precision above 2^53 ns. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val storage = probeTsStorage(s"$dir/events.parquet")
    val ddl = schemas("events").replace("ts BIGINT", eventsTsDdl(storage))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(ddl))
      .parquet(s"$dir/events.parquet")
    storage match {
      case TsNanosAsLong =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case TsNativeTimestamp(_) =>
        // normalize to TimestampType (what the legacy path produced) so
        // every downstream epochMs/window/interval expression sees the
        // same type across file generations; session tz is pinned to UTC
        // by every entry point, so the NTZ->TS reinterpretation is exact
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** [[documents]] widened for a CPU-heavy kernel (tokenize / n-gram
    * explode / hashing) sitting directly above the scan: a sub-split-size
    * table scans as ONE task and the kernel inherits that width, so the
    * whole query serializes on one core. [[Widen.forKernel]] adds one
    * round-robin exchange of the (pruned) scan columns ONLY while the
    * scan is narrower than the byte-derived kernel width — at production
    * scale the scan is already wide and the plan is unchanged. Filters
    * applied above still push through the repartition to the scan. */
  def documentsWide(spark: SparkSession, dir: String): DataFrame =
    Widen.forKernel(documents(spark, dir), tableBytes(spark, dir, "documents"))

  /** [[embeddings]] widened for vector kernels (dot / L2 / cell-argmin)
    * — same rationale as [[documentsWide]]. */
  def embeddingsWide(spark: SparkSession, dir: String): DataFrame =
    Widen.forKernel(embeddings(spark, dir), tableBytes(spark, dir, "embeddings"))
}
