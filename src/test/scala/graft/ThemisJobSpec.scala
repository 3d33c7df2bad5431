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

  test("sequence chains wordcount -> sort through a materialized dir") {
    val root = java.nio.file.Files.createTempDirectory("jobseq")
    val docs = graft.core.Tables.documents(spark, sfDir).select("text")
    // stage 1: wordcount, Row output
    val wc: org.apache.spark.sql.DataFrame => Job[Row] = in =>
      ThemisJob.Job[Row](
        input = in,
        mapSchema = mapSchema,
        mapFn = Some((r: Row) => r.getString(0).split(" ").iterator
          .filter(_.nonEmpty).map(w => Row(w, 1L)).toSeq),
        keyCols = Seq("word"),
        partitionFn = HashPartition(4),
        reduceFn = (key, rows) =>
          Iterator.single(Row(key.getString(0), rows.map(_.getLong(1)).sum)))(
        org.apache.spark.sql.Encoders.row(mapSchema))
    // stage 2: identity-reduce range sort on the counts (IdentityReduce)
    val sort: org.apache.spark.sql.DataFrame => Job[Row] = in =>
      ThemisJob.Job[Row](
        input = in,
        mapSchema = mapSchema,
        mapFn = None,
        keyCols = Seq("word"),
        partitionFn = RangePartition(4),
        reduceFn = (_, rows) => rows.iterator)(
        org.apache.spark.sql.Encoders.row(mapSchema))
    val out = ThemisJob.sequence(docs, Seq(
      (wc, s"$root/wc"), (sort, s"$root/sorted")))
    // the final frame is READ BACK from the last intermediate dir
    assert(out.inputFiles.nonEmpty && out.inputFiles.forall(
      _.contains("sorted")))
    assert(out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === expected)
    // the intermediate dir holds the full stage-1 result on its own
    val mid = spark.read.parquet(s"$root/wc")
    assert(mid.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === expected)
  }

  test("sequence runs a 2-iteration PageRank as a repeated stage") {
    val root = java.nio.file.Files.createTempDirectory("jobpr")
    // 4-node graph: 0->{1,2}, 1->{2}, 2->{0}, 3->{2}
    val adj = Map(0L -> Seq(1L, 2L), 1L -> Seq(2L), 2L -> Seq(0L),
      3L -> Seq(2L))
    val n = adj.size
    val prSchema = StructType(Seq(
      StructField("node", LongType),
      StructField("adj", org.apache.spark.sql.types.ArrayType(LongType)),
      StructField("contrib", org.apache.spark.sql.types.DoubleType),
      StructField("is_node", org.apache.spark.sql.types.BooleanType)))
    val init = adj.toSeq.map { case (v, a) => (v, a, 1.0 / n) }
      .toDF("node", "adj", "rank")
    val iter: org.apache.spark.sql.DataFrame => Job[Row] = in =>
      ThemisJob.Job[Row](
        input = in,
        mapSchema = prSchema,
        // the reference's PageRankMapFunction shape: each node row emits
        // its adjacency marker plus rank/outdeg contributions
        mapFn = Some { (r: Row) =>
          val node = r.getLong(0)
          val a = r.getSeq[Long](1)
          val rank = r.getDouble(2)
          Row(node, a, 0.0, true) +:
            a.map(d => Row(d, null, rank / a.size, false))
        },
        keyCols = Seq("node"),
        partitionFn = HashPartition(2),
        reduceFn = (key, rows) => {
          val a = rows.find(_.getBoolean(3)).get.getSeq[Long](1)
          val sum = rows.filter(!_.getBoolean(3)).map(_.getDouble(2)).sum
          Iterator.single(Row(key.getLong(0), a, 0.15 / n + 0.85 * sum))
        })(org.apache.spark.sql.Encoders.row(StructType(Seq(
          StructField("node", LongType),
          StructField("adj", org.apache.spark.sql.types.ArrayType(LongType)),
          StructField("rank", org.apache.spark.sql.types.DoubleType)))))
    val out = ThemisJob.sequence(init,
      Seq.tabulate(2)(i => (iter, s"$root/iter$i")))
    val got = out.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // the same two damped iterations computed directly
    var ranks = adj.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until 2) {
      val contrib = adj.toSeq.flatMap { case (v, a) =>
        a.map(d => d -> ranks(v) / a.size)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      ranks = adj.keys.map(v => v -> (0.15 / n +
        0.85 * contrib.getOrElse(v, 0.0))).toMap
    }
    got.foreach { case (v, r) =>
      assert(math.abs(r - ranks(v)) < 1e-12, s"node $v: $r vs ${ranks(v)}")
    }
  }
}
