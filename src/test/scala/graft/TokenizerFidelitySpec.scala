package graft

import org.apache.spark.sql.functions._

import graft.queries.Qdsl

/** Direct fidelity pin of the engine tokenizer against an independent
  * reimplementation of the reference semantics (WordTokenizer.cc:27-70):
  * words break on the delimiter class ` ".,/()?;` plus the literal
  * two-byte sequence `\`+`n` (the backslash is the stop character and
  * scanning resumes AT the `n`, so the `n` starts the next word); empty
  * tokens from delimiter runs are dropped. The oracle mirror
  * (wordsSqlDoc) is exercised by every text oracle; this spec removes
  * the remaining gap — both engines could in principle share one BUG,
  * which a third, loop-based implementation catches.
  */
class TokenizerFidelitySpec extends SparkSpec {

  /** Reference semantics, re-implemented imperatively from the C++. */
  private def referenceTokenize(s: String): Seq[String] = {
    val delims = Set(' ', '"', '.', ',', '/', '(', ')', '?', ';')
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (delims.contains(c)) {
        if (cur.nonEmpty) { out += cur.toString; cur.clear() }
        i += 1
      } else if (c == '\\' && i + 1 < s.length && s.charAt(i + 1) == 'n') {
        // stop char; scanning resumes at the 'n' (it joins the NEXT word)
        if (cur.nonEmpty) { out += cur.toString; cur.clear() }
        i += 1
      } else {
        cur += c
        i += 1
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }

  test("pathological edges: kernel == composition == reference, exactly") {
    import spark.implicits._
    val cases = Seq(
      "", " ", "   ", "\\", "\\\\", "\\n", "n\\", "\\n\\n", "\\\\n",
      "a\\nb", "a\\\\nb", "\\na", "a\\n", "x", ".", "\".,/()?;",
      "a" * 10000,                       // one long token, no boundaries
      ("ab " * 5000).trim,               // many small tokens
      "\\n" * 100,                       // stop-char run
      "é\\nß", "中文.日本語", "🙂 🙂", "tail\\")
    val got = cases.toDF("text")
      .select(Qdsl.words(col("text")).as("w"),
        Qdsl.wordsComposition(col("text")).as("wc"))
      .collect().map(r => (r.getSeq[String](0), r.getSeq[String](1)))
    cases.zip(got).foreach { case (s, (k, c)) =>
      val want = referenceTokenize(s)
      assert(k == want, s"kernel mismatch on ${s.take(40)}: $k vs $want")
      assert(c == want, s"composition mismatch on ${s.take(40)}: $c vs $want")
    }
  }

  test("fuzz: Qdsl.words matches the reference tokenizer on random text") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // bias generation toward delimiters and the \n sequence so the edge
    // paths (runs of delimiters, trailing stop chars, lone backslashes)
    // actually occur
    val token = Gen.frequency(
      (4, Gen.stringOfN(3, Gen.alphaNumChar)),
      (2, Gen.oneOf(" ", "\"", ".", ",", "/", "(", ")", "?", ";")),
      (1, Gen.const("\\n")),
      (1, Gen.const("\\")),
      (1, Gen.const("n")),
      // multi-byte UTF-8 inside tokens: the fused kernel walks BYTES, so
      // these pin that no delimiter byte ever appears inside a code point
      (1, Gen.oneOf("é", "ß", "中文", "🙂", "из")))
    val gen = Gen.listOfN(400, Gen.listOfN(12, token).map(_.mkString))
    val strings = gen.apply(Gen.Parameters.default, Seed(20260813L)).get
    // the fused kernel (Qdsl.words) and the composition it replaced, in
    // one pass — both must match the imperative reference exactly
    val got = strings.toDF("text")
      .select(Qdsl.words(col("text")).as("w"),
        Qdsl.wordsComposition(col("text")).as("wc"))
      .collect().map(r => (r.getSeq[String](0), r.getSeq[String](1)))
    strings.zip(got).foreach { case (s, (kernelToks, compToks)) =>
      val want = referenceTokenize(s)
      assert(kernelToks == want,
        s"kernel mismatch on ${s.take(60)}: got $kernelToks want $want")
      assert(compToks == want,
        s"composition mismatch on ${s.take(60)}: got $compToks want $want")
    }
  }
}
