package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.GraftHash60
import graft.queries.{Curation, Qdsl}

/** Laws for the round-9 curation operators: the dedup-rewrite and DSIR
  * censuses must equal an independent driver-side replay of their
  * contracts; CCNet terciles must equal the single-window global rank
  * and be balanced; the sign projection must be linear and
  * norm-preserving in expectation (the JL property).
  */
class CurationSpec extends SparkSpec {

  private val P = 1000000007L
  private def h60(s: String): Long = GraftHash60.hash(s.getBytes("UTF-8"))

  /** (doc_id, lang, tokens) with the engine's own tokenizer — replays
    * stay byte-identical to the queries without re-implementing it. */
  private def tokenized: Array[(Long, String, Seq[String])] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), Qdsl.words(col("text")).as("w"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))

  test("dedup rewrite census equals a driver-side keep-first replay") {
    val docs = tokenized
    // replay: 10-token chunks, keep globally-first occurrence by
    // (doc_id, pos), rebuild surviving docs in order
    val chunks = docs.flatMap { case (id, lang, ws) =>
      ws.grouped(10).zipWithIndex.map { case (c, pos) =>
        (id, lang, pos.toLong, c.mkString(" "))
      }
    }
    val firstOcc = chunks.groupBy(_._4).map { case (c, occ) =>
      c -> occ.map(o => (o._1, o._3)).min
    }
    val kept = chunks.filter(c => (c._1, c._3) == firstOcc(c._4))
    val rebuilt = kept.groupBy(c => (c._1, c._2)).map { case ((id, lang), cs) =>
      val ordered = cs.sortBy(_._3)
      (id, lang, ordered.length.toLong,
        ordered.map(_._4.split(" ").length.toLong).sum,
        ordered.map(_._4).mkString(" "))
    }
    val expect = rebuilt.groupBy(_._2).map { case (lang, ds) =>
      val totalChunks = chunks.count(_._2 == lang).toLong
      lang -> (ds.size.toLong, ds.map(_._3).sum,
        totalChunks - ds.map(_._3).sum,
        ds.map(d => h60(d._5) % P).sum, ds.map(_._4).sum)
    }
    val got = Curation.dedupRewrite(spark, sfDir).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    }.toMap
    assert(got === expect)
  }

  test("ccnet buckets equal the single-window global rank and are balanced") {
    val got = Curation.ccnetBuckets(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // independent doc-score replay on the driver
    val docs = tokenized
    val tot = docs.map(_._3.size.toLong).sum
    val wc = docs.flatMap(_._3).groupBy(identity).map { case (w, o) =>
      w -> (1000000L * o.length) / tot
    }
    val scored = docs.map { case (id, lang, ws) =>
      (id, lang, ws.map(wc).sum / ws.size)
    }.sortBy(s => (s._3, s._1))
    val n = scored.length.toLong
    val expect = scored.zipWithIndex
      .map { case ((id, lang, sc), i) => (lang, 3L * i / n, id, sc) }
      .groupBy(t => (t._1, t._2)).map { case (k, ts) =>
        k -> (ts.length.toLong, ts.map(_._4).sum, ts.map(_._3).min)
      }
    assert(got === expect)
    // terciles are globally balanced to within one document
    val sizes = got.toSeq.groupBy(_._1._2).view
      .mapValues(_.map(_._2._1).sum).values.toSeq
    assert(sizes.size == 3 && sizes.max - sizes.min <= 1)
  }

  test("dsir weights equal a driver-side feature-ratio replay") {
    val docs = tokenized.filter(_._3.size >= 2)
    val feats = docs.map { case (id, lang, ws) =>
      (id, lang, ws.sliding(2).map(b => h60(b.mkString(" ")) % 1024).toSeq)
    }
    val srcN = feats.flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong)
    val tgtN = feats.filter(_._2 == "en").flatMap(_._3)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ratio = srcN.map { case (f, sn) =>
      f -> (1000000L * (tgtN.getOrElse(f, 0L) + 1)) / (sn + 1)
    }.toMap
    val expect = feats.map { case (id, lang, fs) =>
      (id, lang, fs.map(ratio).sum / fs.size)
    }.groupBy(d => (d._2, d._3 / 20000)).map { case (k, ds) =>
      k -> (ds.length.toLong, ds.map(_._3).sum, ds.map(_._1).min)
    }
    val got = Curation.dsirWeights(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === expect)
  }

  test("sign projection is linear, matrix-reproducible, and JL-concentrated") {
    // reproduce the ±1 matrix independently from the portable hash
    val signs = Array.tabulate(16, 64)((j, i) =>
      if (h60(s"${j}_${i}") % 2 == 0) 1L else -1L)
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2)))
    def proj(v: Seq[Long]): Seq[Long] =
      signs.toSeq.map(row => row.iterator.zip(v.iterator).map { case (a, b) => a * b }.sum)
    // linearity on two concrete vectors
    val Seq(a, b) = vecs.take(2).map(_._3).toSeq
    val sumAb = a.zip(b).map { case (x, y) => x + y }
    assert(proj(sumAb) === proj(a).zip(proj(b)).map { case (x, y) => x + y })
    // census replay: checksums and ratio sums per label
    val expect = vecs.groupBy(_._2).map { case (label, vs) =>
      val per = vs.map { case (id, _, v) =>
        val p = proj(v)
        val psq = p.map(x => x * x).sum
        val e2 = v.map(x => x * x).sum
        (id, p.map(_ % P).sum, if (e2 > 0) Some(1000L * psq / (16L * e2)) else None)
      }
      label -> (vs.length.toLong, per.map(_._2).sum,
        per.flatMap(_._3).sum, per.map(_._1).min)
    }
    val got = Curation.embedProject(spark, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got === expect)
    // JL concentration: mean per-row energy ratio lands near 1000‰
    val (nAll, ratioAll) = (got.values.map(_._1).sum, got.values.map(_._3).sum)
    val mean = ratioAll.toDouble / nAll
    assert(mean > 600 && mean < 1400, s"JL mean ratio $mean off the 1000‰ band")
  }

  test("rebuildDocs keep-first survives a collision-heavy fuzz corpus") {
    import spark.implicits._
    // tiny vocabulary forces massive cross-document chunk collisions —
    // the adversarial regime for keep-first bookkeeping
    val rnd = new scala.util.Random(9)
    val vocab = Vector("a", "b", "c", "d", "e")
    val corpus = (0L until 40L).map { id =>
      id -> (1 to (1 + rnd.nextInt(24))).map(_ => vocab(rnd.nextInt(5)))
    }
    val df = corpus.map { case (id, ws) => (id, ws) }.toDF("doc_id", "ws")
    val got = Curation.rebuildDocs(df, Nil).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // driver replay of the contract
    val chunks = corpus.flatMap { case (id, ws) =>
      ws.grouped(10).zipWithIndex.map { case (c, pos) =>
        (id, pos.toLong, c.mkString(" "))
      }
    }
    val firstOcc = chunks.groupBy(_._3).map { case (c, occ) =>
      c -> occ.map(o => (o._1, o._2)).min
    }
    val expect = chunks.filter(c => (c._1, c._2) == firstOcc(c._3))
      .groupBy(_._1).map { case (id, cs) =>
        val ordered = cs.sortBy(_._2)
        id -> (ordered.size.toLong,
          ordered.map(_._3.split(" ").length.toLong).sum,
          ordered.map(_._3).mkString(" "))
      }
    assert(got === expect, "fuzz keep-first rebuild diverged from replay")
    // heavy collisions must actually drop documents entirely here
    assert(got.size < corpus.size, "fuzz corpus produced no full-doc drops")
  }

  test("tercile matches the single-window rank under adversarial ties") {
    import spark.implicits._
    // many exact score ties ON band boundaries — the regime where a
    // band/rank decomposition bug would surface
    val rows = (0L until 200L).map(i => (i, (i % 7) * 2000L))
    val ds = rows.toDF("doc_id", "doc_score")
    val got = Curation.tercile(ds, "doc_score")
      .select(col("doc_id"), col("bucket")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = rows.length.toLong
    val expect = rows.sortBy { case (id, sc) => (sc, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> 3L * i / n }.toMap
    assert(got === expect, "banded rank diverged from the global window")
  }
}
