package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.api.ThemisJob
import graft.api.ThemisJob._

/** The full job contract end to end: map → partition → secondary sort →
  * group-reduce, across every partition-function option, checked against
  * the equivalent DataFrame aggregation. */
class ThemisJobSpec extends SparkSpec {
  import spark.implicits._

  private val mapSchema = StructType(Seq(
    StructField("word", StringType), StructField("n", LongType)))

  /** WordCount as a Themis job: map tokenizes, reduce sums the group. */
  private def wordCountJob(pf: PartitionFn) = {
    val docs = graft.core.Tables.documents(spark, sfDir).select("text")
    ThemisJob.Job[(String, Long)](
      input = docs,
      mapSchema = mapSchema,
      mapFn = Some((r: Row) => r.getString(0).split(" ").iterator
        .filter(_.nonEmpty).map(w => Row(w, 1L)).toSeq),
      keyCols = Seq("word"),
      partitionFn = pf,
      reduceFn = (key, rows) =>
        Iterator.single((key.getString(0), rows.map(_.getLong(1)).sum)))
  }

  private lazy val expected: Map[String, Long] =
    graft.queries.ThemisOps.wordCount(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  for (pf <- Seq[(String, PartitionFn)](
      ("range", RangePartition(4)),
      ("hashed-range (murmur64)", HashedRangePartition(4)),
      ("hash", HashPartition(4)),
      ("single", SinglePartition))) {
    test(s"wordcount job with ${pf._1} partitioning matches DataFrame plan") {
      val got = wordCountJob(pf._2).run().collect().toMap
      assert(got === expected)
    }
  }

  test("secondary sort orders group rows for the reducer (click-log shape)") {
    val events = Seq(
      (1L, 30L, "c"), (1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "z"))
      .toDF("user", "ts", "tag")
    val job = ThemisJob.Job[(Long, String)](
      input = events,
      mapSchema = events.schema,
      mapFn = None,
      keyCols = Seq("user"),
      secondaryCols = Seq("ts"),
      partitionFn = HashPartition(2),
      reduceFn = (key, rows) =>
        Iterator.single((key.getLong(0), rows.map(_.getString(2)).mkString)))
    val got = job.run().collect().toMap
    assert(got === Map(1L -> "abc", 2L -> "z"))
  }
}
