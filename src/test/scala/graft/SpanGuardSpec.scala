package graft

import org.apache.spark.sql.functions._

import graft.queries.TextPipeline

/** The substring-dedup hot-window guard: a planted 1000×-repeated block
  * must leave the count-window path bounded at the cap, be censused
  * loudly, and change NOTHING about the result values.
  */
class SpanGuardSpec extends SparkSpec {
  import spark.implicits._

  private val Cap = 8L

  // 20-token docs → 5 stride-1 16-token windows each
  private val block = (1 to 20).map(i => s"b$i").mkString(" ")
  private val coldDup = (1 to 20).map(i => s"c$i").mkString(" ")
  private val docs: Seq[(Long, String)] =
    (1L to 1000L).map(i => i -> block) ++ // the boilerplate storm
      (1L to 50L).map(i => (1000L + i) -> (1 to 20).map(j => s"u${i}_$j").mkString(" ")) ++
      Seq(2001L -> coldDup, 2002L -> coldDup) // a benign sub-cap duplicate

  private def tokenized = docs.toDF("doc_id", "text")
    .select(col("doc_id"), split(col("text"), " ").as("w"))
    .withColumn("n", size(col("w")).cast("long"))

  test("guarded span stats are value-identical to the unguarded form") {
    val plain = TextPipeline.spanDupStats(tokenized, Nil)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val guarded = TextPipeline.spanDupStatsGuarded(tokenized, Nil, Cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(guarded == plain, "the guard must not change values")
    // the storm docs and the benign pair are all reported
    assert(plain.exists(_._1 == 1L) && plain.exists(_._1 == 1000L))
    val benign = plain.filter(r => r._1 == 2001L || r._1 == 2002L)
    assert(benign.size == 2 && benign.forall(r => r._2 == 5L && r._3 == 20L),
      s"sub-cap duplicate pair must survive the guard untouched: $benign")
    // unique docs contribute nothing
    assert(!plain.exists(r => r._1 > 1000L && r._1 <= 1050L))
  }

  test("diversion census reports the planted storm exactly") {
    val c = TextPipeline.spanHotCensus(tokenized, Nil, Cap).collect().head
    // 5 distinct windows of the block, each in 1000 docs
    assert(c.getLong(0) == 5L, s"n_hot_keys: ${c.getLong(0)}")
    assert(c.getLong(1) == 5000L, s"n_hot_rows: ${c.getLong(1)}")
    assert(c.getLong(2) == 1000L, s"max_key_rows: ${c.getLong(2)}")
  }

  test("after diversion no count-window key exceeds the cap") {
    val wins = TextPipeline.spanWindows(tokenized, Nil)
    val hotKeys = wins.groupBy(col("wkey")).agg(count(lit(1)).as("kcnt"))
      .filter(col("kcnt") > Cap).select(col("wkey"))
    val coldMax = wins.join(hotKeys, Seq("wkey"), "left_anti")
      .groupBy(col("wkey")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).collect().head.getLong(0)
    assert(coldMax <= Cap,
      s"cold path still owns a $coldMax-row key; cap is $Cap")
  }
}
