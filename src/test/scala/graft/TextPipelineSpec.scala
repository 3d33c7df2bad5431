package graft

import org.apache.spark.sql.functions._

import graft.queries.TextPipeline

/** Invariant checks for the dedup/text-analysis operators at sf0.001. */
class TextPipelineSpec extends SparkSpec {

  test("minhash: candidate pairs have valid ids and agreement in [0, 8]") {
    val rows = TextPipeline.dedupMinhash(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be ordered a < b")
      val m = r.getLong(2)
      assert(m >= 0 && m <= 8)
    }
    // every bucket-collision pair shares at least one full band (2 hashes)
    assert(rows.forall(_.getLong(2) >= 2),
      "a shared band implies >= 2 matching minhashes")
  }

  test("simhash: one fingerprint per document, within 32 bits") {
    val df = TextPipeline.dedupSimhash(spark, sfDir)
    val n = df.count()
    val docs = graft.core.Tables.documents(spark, sfDir).count()
    assert(n === docs)
    assert(df.filter(col("simhash") < 0 || col("simhash") >= (1L << 32)).count() === 0)
  }

  test("jaccard near-dups are bounded by 1 and symmetric-free") {
    val rows = TextPipeline.jaccardNeardup(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getDouble(4)
      assert(j >= 0.8 && j <= 1.0)
      assert(r.getLong(2) <= r.getLong(3), "intersection <= union")
    }
  }

  test("substring dedup: interval union and recurrence are hand-exact") {
    import spark.implicits._
    // S = a 20-token run shared by docs 1 and 2 (distinct surroundings, so
    // only the 5 windows fully inside S recur); doc 3 repeats its own
    // 16-token run T with a 4-token gap (intra-doc recurrence, overlap-free
    // union = 32); doc 4 is all-unique; doc 5 is shorter than one window.
    val S = (1 to 20).map(i => f"s$i%02d").mkString(" ")
    val T = (1 to 16).map(i => f"t$i%02d").mkString(" ")
    val docs = Seq(
      (1L, "xx", s"a1 a2 a3 a4 a5 $S b1 b2 b3 b4 b5"),
      (2L, "xx", s"c1 c2 c3 c4 c5 $S d1 d2 d3 d4 d5"),
      (3L, "xx", s"$T e1 e2 e3 e4 $T"),
      (4L, "xx", (1 to 20).map(i => f"u$i%02d").mkString(" ")),
      (5L, "xx", (1 to 10).map(i => f"v$i%02d").mkString(" "))
    ).toDF("doc_id", "lang", "text")
    val row = TextPipeline.substringDedupDocs(docs).head()
    graft.core.Caches.release()
    assert(row.getString(0) === "xx")
    assert(row.getLong(1) === 5L, "n_docs")
    assert(row.getLong(2) === (30 + 30 + 36 + 20 + 10).toLong, "n_tokens")
    assert(row.getLong(3) === 3L, "docs with a recurring span")
    // docs 1/2: window starts 6..10 inside S (5 each); doc 3: starts 1 and 21
    assert(row.getLong(4) === 12L, "recurring windows")
    // union: 20 + 20 (S spans) + 16 + min(16, gap 20) = 32 for doc 3
    assert(row.getLong(5) === (20 + 20 + 32).toLong, "duplicated tokens (interval union)")
    assert(row.getLong(6) === 6L, "dup doc id sum")
  }

  test("fingerprint is deterministic across runs") {
    val a = TextPipeline.fingerprint(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = TextPipeline.fingerprint(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a === b)
    assert(a.values.forall(v => v >= 0 && v < 1000000007L))
  }

  test("text quality ratios are consistent") {
    TextPipeline.textQuality(spark, sfDir).collect().foreach { r =>
      val nTokens = r.getLong(2); val nDistinct = r.getLong(3); val nStop = r.getLong(4)
      assert(nDistinct <= nTokens)
      assert(nStop <= nTokens)
      assert(r.getDouble(5) > 0 && r.getDouble(5) <= 1.0)
    }
  }
}
