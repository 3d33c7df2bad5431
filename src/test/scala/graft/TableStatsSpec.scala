package graft

import org.apache.spark.sql.functions._

import graft.api.Corpus
import graft.queries.Analytics

/** ANALYZE-table census: the facade's scale-safe approx-NDV default must
  * track the oracle-checked exact form within HLL tolerance (3σ of the 0.05 rsd), and the
  * non-NDV stats (rows, nulls, min/max renders) must be IDENTICAL —
  * they share one aggregation body. */
class TableStatsSpec extends SparkSpec {

  test("approx census matches exact on everything but NDV; NDV within HLL tolerance") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val exact = Analytics.tableStats(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = Corpus.analyzeTable(li)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet === approx.keySet)
    assert(exact.size === li.schema.size)
    exact.foreach { case (name, e) =>
      val a = approx(name)
      assert(a.getLong(1) == e.getLong(1), s"$name n_rows")
      assert(a.getLong(2) == e.getLong(2), s"$name n_nulls")
      assert(a.getString(4) == e.getString(4), s"$name min_s")
      assert(a.getString(5) == e.getString(5), s"$name max_s")
      val (en, an) = (e.getLong(3), a.getLong(3))
      // approx_count_distinct's default rsd is 0.05 (one sigma) — allow 3σ
      assert(math.abs(an - en) <= math.max(3L, (en * 0.15).toLong),
        s"$name ndv: approx $an vs exact $en")
    }
  }

  test("facade censuses a restricted column list on an arbitrary frame") {
    import spark.implicits._
    val df = Seq((1L, Option("a"), 2.5), (2L, None, 3.75), (3L, Option("b"), 2.5))
      .toDF("id", "tag", "score")
    val rows = Corpus.analyzeTable(df, cols = Seq("tag", "score"), exactNdv = true)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("tag", "score"))
    val tag = rows("tag")
    assert(tag.getLong(1) == 3L && tag.getLong(2) == 1L && tag.getLong(3) == 2L)
    assert(tag.getString(4) == "a" && tag.getString(5) == "b")
    val score = rows("score")
    // fractional types render through DECIMAL(12,2)
    assert(score.getString(4) == "2.50" && score.getString(5) == "3.75")
  }
}
