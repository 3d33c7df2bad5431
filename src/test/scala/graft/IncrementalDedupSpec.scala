package graft

import org.apache.spark.sql.functions.col
import graft.queries.TextPipeline
import graft.core.Tables

/** The incremental-dedup serve path (q_dedup_incremental) must relate
  * lawfully to the from-scratch run: same pairs where both look, index
  * semantics where they differ. sf0.001. */
class IncrementalDedupSpec extends SparkSpec {

  private def splitPoint: Long = {
    val max = Tables.documents(spark, sfDir)
      .agg(org.apache.spark.sql.functions.max(col("doc_id"))).head.getLong(0)
    max * 4 / 5
  }

  test("every incremental pair crosses the history/batch split") {
    val t = splitPoint
    val rows = TextPipeline.dedupIncremental(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.core.Caches.release()
    assert(rows.nonEmpty, "fixture should produce cross-split candidates")
    rows.foreach { case (a, b, m) =>
      assert(a < t, s"doc_a $a should be historical (< $t)")
      assert(b >= t, s"doc_b $b should be in the batch (>= $t)")
      assert(m >= 0 && m <= 8)
    }
  }

  test("incremental dominates from-scratch on cross-split pairs, values equal") {
    val t = splitPoint
    val inc = TextPipeline.dedupIncremental(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = TextPipeline.dedupMinhash(spark, sfDir)
      .filter(col("doc_a") < t && col("doc_b") >= t).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    graft.core.Caches.release()
    // the from-scratch guard censuses buckets over the WHOLE corpus, the
    // index guard over history only, so a bucket can be cold at build
    // time yet hot overall: the incremental pair set is a superset of the
    // restricted from-scratch set, never a subset
    full.foreach { case (pair, m) =>
      assert(inc.contains(pair), s"pair $pair found from scratch but " +
        "missing from the incremental serve")
      // agreement is a signature property, not a bucket property — any
      // shared pair must agree exactly
      assert(inc(pair) === m, s"pair $pair: incremental ${inc(pair)} != full $m")
    }
    assert(full.nonEmpty, "restriction of the from-scratch run is empty — " +
      "the dominance check proved nothing")
  }
}
