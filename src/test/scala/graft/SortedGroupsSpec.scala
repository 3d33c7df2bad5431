package graft

import org.apache.spark.sql.Row

import graft.api.SortedGroups

/** The sorted-group reducer contract (reference `Reducer.cc:94-101`,
  * `ReduceKVPairIterator.cc`): groups arrive whole, values ordered by the
  * secondary key, and the reducer may emit 0..n records per group. */
class SortedGroupsSpec extends SparkSpec {
  import spark.implicits._

  test("groups are complete and secondary-sorted") {
    val df = Seq(
      ("a", 3L, "x"), ("a", 1L, "y"), ("a", 2L, "z"),
      ("b", 9L, "w"), ("c", 5L, "v"))
      .toDF("k", "ts", "payload")
    val out = SortedGroups.flatMapSortedGroups[(String, String)](
      df, Seq("k"), Seq("ts")) { (key, rows) =>
      Iterator.single((key.getString(0), rows.map(_.getLong(1)).mkString(",")))
    }.collect().toMap
    assert(out === Map("a" -> "1,2,3", "b" -> "9", "c" -> "5"))
  }

  test("multi-record emission and empty emission per group") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 7L)).toDF("k", "v")
    val out = SortedGroups.flatMapSortedGroups[String](
      df, Seq("k"), Seq("v")) { (key, rows) =>
      if (key.getString(0) == "b") Iterator.empty
      else rows.iterator.map(r => s"${key.getString(0)}:${r.getLong(1)}")
    }.collect().sorted
    assert(out.toSeq === Seq("a:1", "a:2"))
  }

  test("binary keys group by value, not reference (Comparison.h parity)") {
    val df = Seq(
      (Array[Byte](1, 2), 1L), (Array[Byte](1, 2), 2L), (Array[Byte](3), 3L))
      .toDF("k", "v")
    val out = SortedGroups.flatMapSortedGroups[(String, Int)](
      df, Seq("k"), Seq("v")) { (key, rows) =>
      Iterator.single((key.getAs[Array[Byte]](0).mkString("."), rows.size))
    }.collect().toMap
    assert(out === Map("1.2" -> 2, "3" -> 1))
  }
}
