package graft

import org.apache.spark.sql.functions._

import graft.api.MultiJob

/** Multi-job over one input scan: same results as independent runs, and
  * the shared plan reads from the in-memory relation, not the source. */
class MultiJobSpec extends SparkSpec {

  test("batched jobs agree with independent runs") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val Seq(nDocs, nChars, byLang) =
      MultiJob.run(docs)(Seq[org.apache.spark.sql.DataFrame => Any](
        df => df.count(),
        df => df.agg(sum("n_chars")).collect().head.getLong(0),
        df => df.groupBy("lang").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap))

    assert(nDocs === docs.count())
    assert(nChars === docs.agg(sum("n_chars")).collect().head.getLong(0))
    assert(byLang === docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  test("jobs read the cached relation, not the file scan") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    MultiJob.run(docs)(Seq[org.apache.spark.sql.DataFrame => Any] { df =>
      val plan = df.groupBy("lang").count().queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan") || plan.contains("InMemoryRelation"),
        s"expected cached scan in:\n$plan")
    })
  }
}
