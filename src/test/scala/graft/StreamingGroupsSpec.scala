package graft

import graft.api.SortedGroups

/** The single-pass group reducer: groups stream through without
  * materialization, partial consumption is safe, order is preserved. */
class StreamingGroupsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming groups see ordered rows and all groups") {
    val df = Seq(("a", 2L), ("a", 1L), ("b", 5L), ("c", 9L), ("c", 8L))
      .toDF("k", "v")
    val out = SortedGroups.flatMapStreamingGroups[(String, String)](
      df, Seq("k"), Seq("v")) { (key, rows) =>
      Iterator.single((key.getString(0), rows.map(_.getLong(1)).mkString(",")))
    }.collect().toMap
    assert(out === Map("a" -> "1,2", "b" -> "5", "c" -> "8,9"))
  }

  test("partial consumption of a group does not corrupt the next group") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 7L)).toDF("k", "v")
    val out = SortedGroups.flatMapStreamingGroups[(String, Long)](
      df, Seq("k"), Seq("v")) { (key, rows) =>
      // consume only the first row of each group
      val first = rows.next()
      Iterator.single((key.getString(0), first.getLong(1)))
    }.collect().toMap
    assert(out === Map("a" -> 1L, "b" -> 7L))
  }

  test("a group larger than would comfortably buffer streams through") {
    val big = spark.range(200000).selectExpr("'one' AS k", "id AS v")
    val out = SortedGroups.flatMapStreamingGroups[(String, Long, Long)](
      big, Seq("k"), Seq("v")) { (key, rows) =>
      var n = 0L; var sum = 0L
      rows.foreach { r => n += 1; sum += r.getLong(1) }
      Iterator.single((key.getString(0), n, sum))
    }.collect()
    assert(out.toSeq === Seq(("one", 200000L, 199999L * 200000L / 2)))
  }
}
