package graft

import org.apache.spark.sql.functions._

import graft.queries.Qdsl

/** Gate-maintenance tripwire for the oracles' `range(N)` fan-out caps.
  *
  * Several DuckDB oracles explode per-document positions through a fixed
  * `CROSS JOIN range(N)` (DuckDB has no lateral `sequence` explode), so
  * each cap silently truncates — and hash-diverges from the Spark side —
  * the moment the testdata grows a document longer than the cap covers.
  * This spec computes the ACTUAL max fan-out per sf slice and asserts it
  * under every cap, so testdata growth fails loudly here instead of as an
  * opaque oracle hash mismatch:
  *
  *   - q_chunk_dedup range(1024), 10-token stride → (maxTok-1)/10 ≤ 1023
  *     (q_dedup_rewrite's mirror is exact via list_transform since r12 —
  *     it registers with oracleCap = None; the guard MECHANISM is still
  *     tripwired below through rebuildDocs(oracleCap = Some(1024)))
  *   - q_chunk_overlap range(4096), 24-token stride → (maxTok-1)/24 ≤ 4095
  *   - q_decontaminate / q_pipeline_clean range(4096) over 8-gram starts
  *     (1-based j ≤ len-7) → maxTok-7 ≤ 4095
  *   - q_substring_dedup / q_boilerplate_top range(4096) over 16-token
  *     window starts (j ≤ len-15) → maxTok-15 ≤ 4095
  *   - q_frame_sample  range(512), 64-byte frames   → (maxBytes-1)/64 ≤ 511
  *
  * Runs over every local sf slice (the driver gates correctness at sf0.01
  * and benches at sf0.1 — both must stay inside the caps).
  */
class OracleCapSpec extends SparkSpec {

  private val slices =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(s"$d/documents.parquet").exists())

  import spark.implicits._

  private def chain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")

  private def longDoc(words: Int): String =
    (1 to words).map(i => s"w$i").mkString(" ")

  test("a planted over-cap document trips the IN-PLAN guard with a named error") {
    // the guards live in the query plans themselves (Qdsl.oracleCapped),
    // so a long document fails at RUN time with the cap site named —
    // even if this spec's testdata census were skipped
    // 8-grams: grams = size-7 must stay ≤ 4095 → 4103+ tokens breach
    val over8 = Seq(Tuple1(longDoc(4110))).toDF("text")
      .select(split(col("text"), " ").as("ws"))
    val e8 = intercept[Exception] {
      over8.select(explode(Qdsl.grams8("ws"))).count()
    }
    assert(chain(e8).contains("oracle fan-out cap breached") &&
      chain(e8).contains("8-grams"), s"8-gram guard message: ${chain(e8)}")
    // 10-token chunks: chunks = (size-1)/10+1 must stay ≤ 1024
    val overChunk = Seq((1L, "en", longDoc(10251))).toDF("doc_id", "lang", "text")
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ws"))
    val eC = intercept[Exception] {
      graft.queries.Curation.rebuildDocs(overChunk, Seq("lang"),
        oracleCap = Some(1024)).count()
    }
    assert(chain(eC).contains("oracle fan-out cap breached") &&
      chain(eC).contains("dedup-rewrite chunks"),
      s"chunk guard message: ${chain(eC)}")
    graft.core.Caches.release()
    // the facade route (oracleCap = None, the default) is exact on the
    // SAME over-cap document — the r11 regression pinned from both sides
    assert(graft.queries.Curation.rebuildDocs(overChunk, Seq("lang"))
      .agg(sum(col("n_kept"))).head().getLong(0) === 1026L)
    graft.core.Caches.release()
    // just-under-cap passes through with exact fan-out
    val under = Seq(Tuple1(longDoc(4102))).toDF("text")
      .select(split(col("text"), " ").as("ws"))
    assert(under.select(explode(Qdsl.grams8("ws"))).count() === 4095L)
  }

  test("every oracle range(N) cap covers the real document fan-out") {
    assert(slices.nonEmpty, "no local testdata slices found")
    for (dir <- slices) {
      val row = graft.core.Tables.documents(spark, dir)
        .agg(
          max(size(Qdsl.words(col("text")))).as("max_tok"),
          max(length(col("text").cast("binary"))).as("max_bytes"))
        .head()
      val maxTok = row.getInt(0)
      val maxBytes = row.getInt(1)
      withClue(s"$dir (maxTok=$maxTok, maxBytes=$maxBytes): ") {
        assert((maxTok - 1) / 10 <= 1023,
          "the 10-token chunk oracles' range(1024) no longer covers the longest document")
        assert((maxTok - 1) / 24 <= 4095,
          "q_chunk_overlap's range(4096) no longer covers the longest document")
        assert(maxTok - 7 <= 4095,
          "the 8-gram oracles' range(4096) no longer covers the longest document")
        assert(maxTok - 15 <= 4095,
          "the 16-token window oracles' range(4096) no longer cover the longest document")
        assert((maxBytes - 1) / 64 <= 511,
          "q_frame_sample's range(512) no longer covers the largest payload")
      }
    }
  }
}
