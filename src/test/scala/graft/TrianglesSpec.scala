package graft

import org.apache.spark.sql.functions._

import graft.queries.GraphText

/** Triangle counting: the degree-ordered orientation must count exactly
  * the triangles the brute-force triple join finds (each once).
  */
class TrianglesSpec extends SparkSpec {

  test("oriented wedge count equals the brute-force triple join") {
    val edges = graft.core.Tables.events(spark, sfDir)
      .select((col("user_id") % 1000).as("x"), (col("event_id") % 1000).as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .distinct().persist()
    try {
      // brute force: ordered triples a<b<c with all three edges present —
      // the O(m^(3/2))-without-orientation shape that is fine at sf0.001
      val e1 = edges.select(col("a").as("u"), col("b").as("v"))
      val e2 = edges.select(col("a").as("v"), col("b").as("w"))
      val e3 = edges.select(col("a").as("u"), col("b").as("w"))
      val naive = e1.join(e2, "v").join(e3, Seq("u", "w")).count()
      val out = GraphText.triangles(spark, sfDir).head()
      assert(out.getLong(2) == naive,
        s"oriented count ${out.getLong(2)} vs naive $naive")
      assert(out.getLong(1) == edges.count())
    } finally edges.unpersist()
  }
}
