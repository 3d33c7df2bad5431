package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.Corpus
import graft.queries.Analytics

/** The automatic hot-group straggler guard on the window family
  * (Analytics.winsorizeGuardedOf): a group 1000× its peers leaves the
  * per-group rank window for the distributed-rank path, value-identical,
  * with every window task bounded by a range slice instead of the hot
  * group's full population. */
class HotGroupGuardSpec extends SparkSpec {
  import spark.implicits._

  /** 3 cold groups × 40 rows + 1 hot group × 40_000 rows (1000×), values
    * deterministic and heavy-tailed enough that clipping engages. */
  private def skewed: DataFrame =
    (Seq.tabulate(3, 40) { (g, i) => (s"cold$g", (g * 1000 + i).toLong,
        BigDecimal((i * 7 % 97) + (if (i % 13 == 0) 500 else 0)).setScale(2)) }.flatten ++
      Seq.tabulate(40000) { i => ("hot", (100000 + i).toLong,
        BigDecimal((i * 31 % 9973) + (if (i % 997 == 0) 100000 else 0)).setScale(2)) })
      .toDF("grp", "rid", "v")
      .withColumn("v", col("v").cast("decimal(12,2)"))

  private def sortedRows(df: DataFrame) =
    df.orderBy("grp").collect().map(_.toSeq).toSeq

  test("guarded winsorize is value-identical to the plain window form") {
    val e = skewed
    val plain = Analytics.winsorizeOf(e)
    val guarded = Analytics.winsorizeGuardedOf(e, cap = 1000L)
    assert(sortedRows(guarded) === sortedRows(plain))
  }

  test("all-cold input takes the window path unchanged") {
    val e = skewed.filter(col("grp") =!= "hot")
    assert(sortedRows(Analytics.winsorizeGuardedOf(e, cap = 1000L)) ===
      sortedRows(Analytics.winsorizeOf(e)))
  }

  test("all-hot input (every group over cap) still matches") {
    val e = skewed
    assert(sortedRows(Analytics.winsorizeGuardedOf(e, cap = 10L)) ===
      sortedRows(Analytics.winsorizeOf(e)))
  }

  test("hot leg plans a range exchange and no full-group sort window") {
    val guarded = Analytics.winsorizeGuardedOf(skewed, cap = 1000L)
    val plan = guarded.queryExecution.executedPlan.toString
    // the distributed-rank path exists: rank windows keyed by
    // (slice, grp), global order restored by range partitioning
    assert(plan.toLowerCase.contains("rangepartitioning"))
    assert(plan.contains("pid"))
  }

  test("hot group's window tasks are bounded by the range slice") {
    // with shuffle.partitions = P, the 40k-row hot group must spread
    // over >1 slice (AQE coalesces 40k test rows into one partition —
    // at production slice sizes it leaves the range split alone, so
    // pin the structural claim with coalescing off)
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val ranked = skewed.filter(col("grp") === "hot")
        .repartitionByRange(col("grp"), col("v"), col("rid"))
        .withColumn("pid", spark_partition_id())
      val slices = ranked.groupBy(col("pid")).count()
        .agg(count(lit(1)).as("n_slices"), max(col("count")).as("max_slice"))
        .collect().head
      assert(slices.getLong(0) > 1, "hot group must span multiple slices")
      assert(slices.getLong(1) < 40000L, "no slice holds the whole hot group")
    } finally spark.conf.set(key, prev)
  }

  test("Corpus.winsorize facade applies the guard automatically") {
    val df = skewed.toDF("g", "id", "val")
    val out = Corpus.winsorize(df, "g", "val", "id", hotCap = 1000L)
    val plain = Analytics.winsorizeOf(
      df.select(col("g").cast("string").as("grp"),
        col("id").cast("long").as("rid"),
        col("val").cast("decimal(12,2)").as("v")))
    assert(out.columns.head === "g")
    assert(sortedRows(out.withColumnRenamed("g", "grp")) === sortedRows(plain))
  }
}
