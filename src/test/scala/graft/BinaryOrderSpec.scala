package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.api.SortedGroups

/** Comparator-law parity (SURVEY §1.1): the reference orders records by
  * unsigned byte-wise lexicographic compare with shorter-first tie-break
  * (`core/Comparison.h:15-29`). Spark's BinaryType ordering must induce
  * the identical total order, or every sort/range-partition result
  * differs from the reference. Checked property-style over random byte
  * arrays (including empty, 0x00/0xff edges, shared prefixes). */
class BinaryOrderSpec extends SparkSpec {
  import spark.implicits._

  /** The reference comparator, implemented from its documented semantics. */
  private def refCompare(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x - y
      i += 1
    }
    a.length - b.length // shorter sorts first
  }

  private val byteArrays: Gen[List[Array[Byte]]] = Gen.listOfN(60,
    Gen.oneOf(
      Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray),
      Gen.listOf(Gen.oneOf(0x00.toByte, 0x7f.toByte, 0x80.toByte, 0xff.toByte))
        .map(_.toArray),
      Gen.const(Array.emptyByteArray)))

  test("Spark binary sort order matches the reference comparator") {
    for (seed <- 1 to 25) {
      val keys = byteArrays.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val expected = keys.sortWith((a, b) => refCompare(a, b) < 0)
        .map(_.toSeq)
      val got = keys.map(Tuple1(_)).toDF("key")
        .orderBy("key").collect().map(_.getAs[Array[Byte]](0).toSeq).toList
      assert(got === expected, s"seed $seed")
    }
  }

  test("binary keys group correctly through the sorted-group reducer") {
    val keys = Seq(Array[Byte](0, 1), Array[Byte](0, 1), Array(0xff.toByte),
      Array.emptyByteArray, Array.emptyByteArray, Array.emptyByteArray)
    val df = keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("key", "v")
    val sizes = SortedGroups.flatMapSortedGroups[(String, Int)](
      df, Seq("key"), Seq("v")) { (key, rows) =>
      Iterator.single((key.getAs[Array[Byte]](0).map(b => f"$b%02x").mkString, rows.size))
    }.collect().toMap
    assert(sizes === Map("0001" -> 2, "ff" -> 1, "" -> 3))
  }
}
