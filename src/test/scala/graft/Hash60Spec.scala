package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftHash60

/** The fused native hash60 must be bit-identical to the
  * conv(substring(md5(x),1,15),16,10) composition it replaced (the DuckDB
  * oracle parses the same 15 hex digits, so any divergence here breaks
  * every hash-bearing oracle at once).
  */
class Hash60Spec extends SparkSpec {

  test("native hash60 equals the md5-composition on corpus text") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("text").as("s"))
      .union(spark.range(1000).select(col("id").cast("string").as("s")))
      .union(Seq("", "a", "é中文 mixed", "trailing ").toDF("s"))
    val compared = docs.select(
      GraftHash60(col("s").cast("string")).as("native"),
      conv(substring(md5(col("s").cast("string")), 1, 15), 16, 10)
        .cast("long").as("composed"))
    assert(compared.filter(col("native") =!= col("composed")).count() == 0)
    // stays inside whole-stage codegen — the project carrying the hash
    // must sit in a codegen span (rendered as the `*(n)` prefix)
    val plan = compared.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_hash60") && l.contains("*(")),
      s"hash60 projection left whole-stage codegen:\n$plan")
  }

  test("fuzz: native hash equals composition on random byte strings") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // deterministic fuzz: 250 printable-ASCII + 250 full-unicode strings
    // (the unicode half exercises the multibyte UTF-8 byte path of the
    // native expression — ASCII alone cannot catch an offset/copy bug)
    val gen = Gen.listOfN(250, Gen.stringOf(Gen.asciiPrintableChar))
      .flatMap(a => Gen.listOfN(250, Gen.stringOf(Gen.choose(0x20.toChar, 0xFFEE.toChar)))
        .map(a ++ _))
    val strings = gen.apply(Gen.Parameters.default, Seed(42L)).get
    strings.foreach { s =>
      val bytes = s.getBytes("UTF-8")
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map(b => f"$b%02x").mkString.take(15)
      val expected = java.lang.Long.parseLong(hex, 16)
      assert(GraftHash60.hash(bytes) == expected, s"mismatch on ${s.take(40)}")
    }
  }

  test("SQL registration: graft_hash60 parses and matches") {
    // mirror the GraftExtensions builder against the shared session's
    // registry (builder path == injectFunction path)
    spark.sessionState.functionRegistry.registerFunction(
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hash60"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.GraftHash60].getName, "graft_hash60"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.GraftHash60(children.head))
    val row = spark.sql(
      "SELECT graft_hash60('foo') AS h, " +
        "CAST(conv(substring(md5('foo'), 1, 15), 16, 10) AS BIGINT) AS c")
      .head()
    assert(row.getLong(0) == row.getLong(1))
  }
}
