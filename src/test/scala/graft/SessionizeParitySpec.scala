package graft

import graft.queries.ThemisOps

/** Bit-parity check for span-based Themis sessionization
  * (`ClickLogSessionSummarizerReduceFunction.cc:10-65`) against a
  * straightforward in-memory reference implementation of the same rule:
  * close the session when the next event's span from session START
  * reaches the threshold (not gap-based). */
class SessionizeParitySpec extends SparkSpec {

  private val threshold = 6L * 3600 * 1000

  /** In-memory reference: same semantics, plain Scala. */
  private def reference(events: Seq[(Long, Long, String)]): Set[(Long, Long, Long, Long, String, String)] = {
    events.groupBy(_._1).flatMap { case (user, es) =>
      val sorted = es.map(e => (e._2, e._3)).sortBy(identity)
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long, String, String)]
      var start = -1L; var last = -1L; var n = 0L
      var firstTy = ""; var lastTy = ""
      for ((ms, ty) <- sorted) {
        if (start < 0) { start = ms; firstTy = ty; n = 0 }
        else if (ms - start >= threshold) {
          out += ((user, start, last, n, firstTy, lastTy))
          start = ms; firstTy = ty; n = 0
        }
        last = ms; lastTy = ty; n += 1
      }
      if (start >= 0) out += ((user, start, last, n, firstTy, lastTy))
      out
    }.toSet
  }

  test("sessionizeThemis matches the in-memory reference on sf0.001") {
    import org.apache.spark.sql.functions._
    import graft.queries.Qdsl.epochMs
    val raw = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), epochMs(col("ts")).as("ms"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val expected = reference(raw)
    val got = ThemisOps.sessionizeThemis(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
