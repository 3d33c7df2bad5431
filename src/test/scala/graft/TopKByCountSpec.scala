package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKByCount

/** The bounded top-k Aggregator must agree with the exact window form
  * when state never overflows, and stay bounded (keeping the heavy
  * hitters) when it does. */
class TopKByCountSpec extends SparkSpec {
  import spark.implicits._

  test("agrees with the exact groupBy/window computation") {
    val events = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"))
    val viaAgg = events.as[(Long, String)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(TopKByCount.topK(2).name("top2"))
      .collect().toMap

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n").desc, col("event_type"))
    val viaWindow = events.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .orderBy(col("user_id"), col("rn"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) => u -> rows.map(_.getString(1)).toSeq }

    assert(viaAgg === viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("bounded state keeps heavy hitters under overflow") {
    // one heavy value + many singletons; state cap 8 forces flushes
    val data = (Seq.fill(500)("heavy") ++ (1 to 400).map(i => s"rare$i"))
    val ds = data.map(v => (1L, v)).toDF("g", "v").as[(Long, String)]
    val top = ds.groupByKey(_._1).mapValues(_._2)
      .agg(TopKByCount.topK(1, maxState = 8).name("top1"))
      .collect().head._2
    assert(top === Seq("heavy"))
  }
}
