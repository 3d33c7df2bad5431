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

  test("source census: distinct texts and keep counts add up") {
    val rows = TextPipeline.sourceCensus(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, (n, distinct, keep)) =>
      assert(distinct >= 1 && distinct <= n, s"$src distinct out of range")
      assert(keep >= 0 && keep <= n, s"$src keep out of range")
    }
    val total = rows.map(_._2._1).sum
    assert(total == graft.core.Tables.documents(spark, sfDir).count())
  }

  test("minhash calibration: exact dups read 8/8 with jaccard 1, laws hold") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base), (2L, base),                       // exact dup: 8/8, J=1
      (3L, base + " extra tail words here"),        // near dup of 1/2
      (4L, "totally different words nothing shared at all whatsoever")
    ).toDF("doc_id", "text").withColumn("lang", lit("xx"))
    val rows = TextPipeline.minhashCalibrationDocs(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toMap
    graft.core.Caches.release()
    // the exact-dup pair must sit at full agreement with exact J = 1
    assert(rows.contains(8L), s"no full-agreement bucket: $rows")
    assert(rows(8L)._4 == 1.0, s"exact dup pair must have jaccard 1: $rows")
    assert(rows(8L)._5 == 1.0)
    rows.foreach { case (m, (n, inter, union, mj, est)) =>
      assert(m >= 2 && m <= 8, "a band collision implies >= 2 matches")
      assert(n > 0 && inter <= union, s"bucket $m inconsistent")
      assert(mj >= 0.0 && mj <= 1.0 && est == m / 8.0)
    }
  }

  test("simhash combinatorial probing is exhaustive for hamming <= 3") {
    // the law the 20-combo candidate scheme must satisfy: identical pair
    // set (with identical hamming) to the brute-force all-pairs scan —
    // pigeonhole over the 6-block split can miss nothing at distance <= 3
    val sig = TextPipeline.dedupSimhash(spark, sfDir)
    val brute = sig.as("l").crossJoin(sig.as("r"))
      .filter(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        expr("bit_count(l.simhash ^ r.simhash)").cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
    val got = TextPipeline.simhashPairs(spark, sfDir)
    assert(brute.count() > 0, "sf0.01 must contain near-dup fingerprints")
    assert(got.unionByName(brute).distinct().count() === brute.count(),
      "combinatorial candidates must equal the brute-force pair set")
    assert(got.count() === brute.count())
    graft.core.Caches.release()
  }

  test("cross-sign fingerprints with shared untouched blocks share a band key") {
    // the r14 regression: signed % on a NEGATIVE fingerprint returned a
    // negative block remainder, so this real pair (caught by
    // q_image_neardup's brute-force oracle: Hamming 3, bits 63/31/15 →
    // blocks 5/2/1 touched, blocks 0/3/4 untouched) keyed apart and the
    // banded join missed it. The AND form must key them together.
    import spark.implicits._
    val a = -4431314945L
    val b = 9223372036718460927L
    assert(java.lang.Long.bitCount(a ^ b) === 3)
    val fps = Seq(a, b).toDF("fp")
    val keys = fps.select(col("fp"), TextPipeline.simBandKeys("fp",
        TextPipeline.simBlockOff64, TextPipeline.simBlockMod64).as("bk"))
    val shared = keys.as("l").join(keys.as("r"),
      col("l.bk") === col("r.bk") && col("l.fp") < col("r.fp")).count()
    assert(shared >= 1, "cross-sign near-dup pair must share a combo key")
  }

  test("64-bit simhash probing is exhaustive for hamming <= 3 " +
      "and the tuned dial rides simBits(n)") {
    // the width axis (Tuning.simBits — 64 past ~105k docs): same
    // pigeonhole law at the production width. ≤3 flipped bits touch ≤3
    // of the 6 blocks, width-independent; this pins the 64-bit BLOCK
    // TABLES (offsets/mods incl. the sign block via logical shift)
    // against the brute-force pair set, which no oracle row covers (the
    // 32-bit rows pin DuckDB md5 parity instead).
    val docs = graft.core.Tables.documents(spark, sfDir)
    val sig = TextPipeline.simhashDocs(docs, 64)
    val brute = sig.as("l").crossJoin(sig.as("r"))
      .filter(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        expr("bit_count(l.simhash ^ r.simhash)").cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
    val got = TextPipeline.simhashPairsDocs(docs, 64)
    // 64-bit fingerprints of unrelated docs almost never land within
    // Hamming 3, so the meat is the EXACT duplicates (hamming 0) the
    // corpus carries — require a non-empty truth set so the assertion
    // can't pass vacuously
    assert(brute.count() > 0, "sf0.01 must contain 64-bit near-dups")
    assert(got.unionByName(brute).distinct().count() === brute.count(),
      "64-bit combinatorial candidates must equal the brute-force pair set")
    assert(got.count() === brute.count())
    // the dial itself: sf0.01 (~5.6k docs) sits under the crossover →
    // 32; past the crossover the width flips to Manku's production 64
    assert(graft.api.Tuning.simBits(docs.count()) === 32)
    assert(graft.api.Tuning.simBits(200000L) === 64)
    assert(graft.api.Tuning.simBits(104857L) === 32)
    val tuned = TextPipeline.simhashTuned(spark, sfDir, docs.count()).head()
    assert(tuned.getLong(0) === 32L)
    assert(tuned.getLong(1) === TextPipeline.simhashPairs(spark, sfDir).count())
    graft.core.Caches.release()
  }

  test("simhash calibration: laws hold, hamming 0 means high overlap") {
    val rows = TextPipeline.simhashCalibration(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    graft.core.Caches.release()
    rows.foreach { case (h, (n, inter, union, mj)) =>
      assert(h >= 0 && h <= 3)
      assert(n > 0 && inter <= union)
      assert(mj >= 0.0 && mj <= 1.0)
    }
    // monotone in expectation on real data: hamming-0 pairs overlap at
    // least as much (ratio-of-sums) as hamming-3 pairs if both exist
    val m = rows.toMap
    for (lo <- m.get(0L); hi <- m.get(3L))
      assert(lo._4 >= hi._4,
        s"hamming-0 pairs less similar than hamming-3: $m")
  }

  test("substring dedup: fuzz parity with a driver-side reference") {
    import spark.implicits._
    val L = 16
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      // tiny vocab + doc lengths straddling L force real collisions,
      // short-doc exclusion, and intra-doc repeats
      val corpus = (1L to 30L).map { id =>
        val n = rnd.nextInt(41)
        val toks = Vector.fill(n)(s"t${rnd.nextInt(8)}")
        (id, if (id % 2 == 0) "aa" else "bb", toks)
      }
      // reference implementation: hash-free, string-keyed, sequential
      val occ = scala.collection.mutable.Map.empty[String, Int]
      for ((_, _, toks) <- corpus; i <- 0 to toks.length - L)
        occ.updateWith(toks.slice(i, i + L).mkString(" "))(c => Some(c.getOrElse(0) + 1))
      case class PerDoc(lang: String, nTok: Long, starts: Seq[Int])
      val perDoc = corpus.map { case (id, lang, toks) =>
        val starts = (0 to toks.length - L)
          .filter(i => occ(toks.slice(i, i + L).mkString(" ")) >= 2)
        id -> PerDoc(lang, toks.length.toLong, starts)
      }.toMap
      val expect = perDoc.values.groupBy(_.lang).map { case (lang, ds) =>
        val dup = perDoc.collect {
          case (id, d) if d.lang == lang && d.starts.nonEmpty => (id, d.starts)
        }
        val unions = dup.map { case (_, ss) =>
          ss.zip(-1 +: ss.init.map(identity)).map {
            case (s, prev) if prev < 0 => L.toLong
            case (s, prev) => math.min(L, s - prev).toLong
          }.sum
        }
        lang -> (ds.size.toLong, ds.map(_.nTok).sum,
          dup.size.toLong, dup.map(_._2.size.toLong).sum, unions.sum,
          dup.map(_._1).sum)
      }
      val docsDf = corpus.map { case (id, lang, toks) =>
        (id, lang, toks.mkString(" "))
      }.toDF("doc_id", "lang", "text")
      val got = TextPipeline.substringDedupDocs(docsDf).collect().map { r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))
      }.toMap
      graft.core.Caches.release()
      assert(got === expect, s"seed $seed diverged")
    }
  }

  test("quality classifier: scan-local logit matches an explode+groupBy plan") {
    import spark.implicits._
    import graft.queries.Qdsl
    val docs = Seq(
      (1L, "xx", "the quick brown fox jumps over the lazy dog"),
      (2L, "xx", "the quick brown fox jumps over the lazy dog"), // byte-dup of 1
      (3L, "yy", "completely different content here with more words"),
      (4L, "yy", ""),                                            // empty: logit 0
      (5L, "yy", "one")
    ).toDF("doc_id", "lang", "text")
    // independent plan for the same model: explode tokens, sum hashed
    // weights per doc, re-aggregate the census
    val perDoc = docs
      .select(col("lang"), col("doc_id"),
        explode_outer(Qdsl.words(col("text"))).as("t"))
      .groupBy(col("lang"), col("doc_id"))
      .agg(coalesce(sum(Qdsl.hash60(col("t")) % 2001L - 1000L), lit(0L))
        .as("logit"))
    val expect = perDoc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("logit") > 0, 1L).otherwise(0L)).as("n_keep"),
        sum(col("logit")).as("logit_sum"),
        coalesce(sum(when(col("logit") > 0, col("doc_id"))), lit(0L))
          .as("keep_id_sum"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val got = TextPipeline.qualityClassifierDocs(docs)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got === expect)
    // the two byte-identical documents must agree on keep/drop: n_keep in
    // lang xx is 0 or 2, never 1
    assert(Set(0L, 2L).contains(got("xx")._2),
      s"identical docs disagreed on keep: ${got("xx")}")
    assert(got("yy")._1 === 3L)
  }

  test("boilerplate top-k finds the planted recurring window") {
    import spark.implicits._
    // B = a 16-token boilerplate block planted in docs 1, 2, 3 (twice in
    // doc 3); doc 4 is all-unique filler long enough to windowize
    val B = (1 to 16).map(i => f"b$i%02d").mkString(" ")
    val docs = Seq(
      (1L, s"$B x1 x2 x3"),
      (2L, s"y1 y2 $B"),
      (3L, s"$B z1 z2 z3 z4 $B"),
      (4L, (1 to 30).map(i => f"u$i%02d").mkString(" "))
    ).toDF("doc_id", "text").withColumn("lang", lit("xx"))
    val rows = TextPipeline.boilerplateTopDocs(docs, 10).collect()
    assert(rows.nonEmpty, "planted boilerplate not found")
    // the top row is the planted block: 4 occurrences across 3 docs,
    // earliest exemplar doc 1 position 1
    val top = rows.head
    assert(top.getLong(1) === 4L, s"n_occ: $top")
    assert(top.getLong(2) === 3L, s"n_docs: $top")
    assert(top.getLong(3) === 1L && top.getLong(4) === 1L,
      s"first exemplar: $top")
    // doc 4's unique windows never appear
    rows.foreach(r => assert(r.getLong(1) >= 2L))
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

  test("fuzzy decontamination flags a planted paraphrase, spares the unrelated") {
    import spark.implicits._
    val evalText = (1 to 30).map(i => s"bench$i").mkString(" ")
    // one word changed out of 30: shingle Jaccard ~ 27/31 >= 0.5, but no
    // exact 8-gram straddling position 15 survives -> the case the exact
    // pass under-flags and this pass exists for
    val paraphrase = (1 to 30).map(i => if (i == 15) "CHANGED" else s"bench$i").mkString(" ")
    val unrelated = (1 to 30).map(i => s"other$i").mkString(" ")
    val docs = Seq(
      (0L, "en", evalText),          // doc_id % 101 == 0 -> eval side
      (1L, "en", paraphrase),
      (2L, "en", unrelated),
      (3L, "de", unrelated + " extra")
    ).toDF("doc_id", "lang", "text")
    val got = TextPipeline.decontaminateFuzzyDocs(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    graft.core.Caches.release()
    assert(got("en") == (2L, 1L), s"en census drifted: $got")   // doc 1 flagged, doc 2 not
    assert(got("de") == (1L, 0L), s"de census drifted: $got")
  }

  test("leak-free splitting: cluster scheme leaks zero pairs, random leaks") {
    val rows = TextPipeline.splitLeakfree(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(6))).toMap
    graft.core.Caches.release()
    val (rTrain, rVal, rTest, rLeak) = rows("random")
    val (cTrain, cVal, cTest, cLeak) = rows("cluster")
    // both schemes partition the same corpus
    assert(rTrain + rVal + rTest == cTrain + cVal + cTest)
    // same component => same split key => same split: structural zero
    assert(cLeak == 0L, s"cluster scheme leaked $cLeak pairs")
    // the shuffle-split scatters dup clusters across splits on this corpus
    assert(rLeak > 0L, "random scheme unexpectedly leak-free (fixture too clean)")
    // ~800/100/100 per-mille proportions, loosely
    assert(rTrain * 10 > (rTrain + rVal + rTest) * 7, s"train share off: $rows")
  }
}
