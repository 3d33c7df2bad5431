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

  test("merge law holds on a collision-heavy fuzz corpus at a tight cap") {
    import spark.implicits._
    // 240 docs drawn deterministically from a 7-template pool: huge dup
    // clusters, every band bucket near or over a cap of 8, split 200/40
    // — the adversarial regime where a tombstone bug or an off-by-one at
    // the cap boundary actually shows
    def doc(i: Long): String = {
      val t = (i * 2654435761L) % 7
      s"template $t body word${t} alpha beta gamma delta epsilon tail${t % 3}"
    }
    val all = (0L until 240L).map(i => (i, doc(i)))
    val hist = all.filter(_._1 < 200).toDF("doc_id", "text")
    val batch = all.filter(_._1 >= 200).toDF("doc_id", "text")
    val cap = 8
    val (mIdx, mHot) = TextPipeline.minhashIndexMerge(
      TextPipeline.minhashIndex(hist, cap),
      TextPipeline.minhashHotCensus(hist, cap), batch, cap)
    val full = hist.unionByName(batch)
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    val (mi, mh) = (multiset(mIdx), multiset(mHot))
    val (ri, rh) = (multiset(TextPipeline.minhashIndex(full, cap)),
      multiset(TextPipeline.minhashHotCensus(full, cap)))
    graft.core.Caches.release()
    assert(mh == rh, "fuzz: merged census != rebuilt census")
    assert(mi == ri, "fuzz: merged index != rebuilt index")
    // with 7 templates over 240 docs every cluster blows the cap of 8:
    // the tombstone side must carry real mass
    assert(rh.nonEmpty, "fuzz fixture failed to produce hot buckets")
  }

  test("index merge equals full rebuild, including cap-crossing buckets") {
    import spark.implicits._
    // cap=4 on planted exact-dup clusters (identical text -> identical
    // signature -> bucket size == copy count): `same` is cold at build
    // (3) and hot only after merge (6) — the resurrection case the
    // tombstone census exists for; `preHot` is hot already at build (5)
    // so its count survives ONLY in the census; `cold` stays cold (3).
    val same = "alpha beta gamma delta epsilon zeta"
    val cold = "eta theta iota kappa lambda mu"
    val preHot = "nu xi omicron pi rho sigma"
    val hist = ((1L to 3L).map(i => (i, same)) ++
      (4L to 5L).map(i => (i, cold)) ++
      (6L to 10L).map(i => (i, preHot))).toDF("doc_id", "text")
    val batch = ((11L to 13L).map(i => (i, same)) ++
      Seq((14L, cold), (15L, preHot))).toDF("doc_id", "text")
    val cap = 4
    val (mIdx, mHot) = TextPipeline.minhashIndexMerge(
      TextPipeline.minhashIndex(hist, cap),
      TextPipeline.minhashHotCensus(hist, cap), batch, cap)
    val all = hist.unionByName(batch)
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    val (mi, mh) = (multiset(mIdx), multiset(mHot))
    val (ri, rh) = (multiset(TextPipeline.minhashIndex(all, cap)),
      multiset(TextPipeline.minhashHotCensus(all, cap)))
    val buildHot = multiset(TextPipeline.minhashHotCensus(hist, cap))
    graft.core.Caches.release()
    assert(mi == ri, s"merged index != rebuilt index: $mi vs $ri")
    assert(mh == rh, s"merged census != rebuilt census: $mh vs $rh")
    // the fixture really crossed the cap: more hot buckets after merge
    assert(buildHot.size < rh.size,
      "no bucket crossed the cap at merge time — the law was not exercised")
    assert(rh.nonEmpty && ri.nonEmpty)
  }
}
