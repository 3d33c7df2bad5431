package graft

import java.nio.file.Files
import java.security.MessageDigest
import java.util.{Arrays => JArrays}

import org.apache.spark.sql.functions._

import graft.functions.ThemisMurmur64
import graft.sources.ThemisKV

/** End-to-end GraySort slice on the binary record path: deterministic
  * gensort-style generation → fixed-width write → graft-fixed DSv2 read
  * (record-aligned splits) → range partition + sort → valsort-style
  * validation (global order, count, permutation checksum). This is the
  * reference's phase 0/1/2 pipeline on its native record format. */
class GraySortSpec extends SparkSpec {
  import spark.implicits._

  private val N = 20000

  private def genRecords(n: Int) = {
    spark.range(n).mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { i =>
        val d = md.digest(i.toString.getBytes("UTF-8"))
        val key = JArrays.copyOfRange(d, 0, 10)
        val value = new Array[Byte](90)
        var off = 0
        var round = 0
        while (off < 90) {
          val block = md.digest((i + "_" + round).getBytes("UTF-8"))
          val take = math.min(16, 90 - off)
          System.arraycopy(block, 0, value, off, take)
          off += take; round += 1
        }
        ThemisKV.Rec(key, value)
      }
    }.toDF()
  }

  test("gensort → fixed100 write → DSv2 read → sort → valsort") {
    val dir = Files.createTempDirectory("graysort").toString
    val gen = genRecords(N)
    ThemisKV.writeFixed(gen.repartition(4), dir, 100, 10)

    // read back through the DSv2 source with small splits (forces multiple
    // record-aligned chunks per file — the partial-tuple boundary case)
    val read = spark.read.format("graft-fixed")
      .option("record.length", 100).option("key.length", 10)
      .option("split.size", 64 * 1024)
      .load(dir)
    assert(read.rdd.getNumPartitions > 4, "small splits must produce chunks")
    assert(read.count() === N)

    // permutation check: order-independent checksum of whole records
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.select(sum(pmod(ThemisMurmur64(concat(col("key"), col("value"))),
        lit(1000000007L))).as("c"))
        .collect().head.getLong(0)
    assert(checksum(read) === checksum(gen), "read-back must be a permutation")

    // sort: range partition on the binary key + in-partition sort
    val sorted = read.repartitionByRange(8, col("key"))
      .sortWithinPartitions(col("key"))

    // valsort: per-partition (sorted?, min, max, count), then boundaries
    val summaries = sorted.select(col("key")).mapPartitions { it =>
      var first: Array[Byte] = null; var prev: Array[Byte] = null
      var ok = true; var n = 0L
      while (it.hasNext) {
        val k = it.next().getAs[Array[Byte]](0)
        if (prev != null && JArrays.compareUnsigned(prev, k) > 0) ok = false
        if (first == null) first = k
        prev = k; n += 1
      }
      if (n == 0) Iterator.empty
      else Iterator.single((org.apache.spark.TaskContext.getPartitionId(),
        first, prev, ok, n))
    }.collect().sortBy(_._1)

    assert(summaries.map(_._5).sum === N)
    assert(summaries.forall(_._4), "each partition must be sorted")
    summaries.sliding(2).foreach {
      case Array(a, b) =>
        assert(JArrays.compareUnsigned(a._3, b._2) <= 0,
          "partition max must not exceed next partition min")
      case _ =>
    }
  }

  test("themis-kv round-trips variable-length records including zero-length") {
    val dir = Files.createTempDirectory("themiskv").toString
    val recs = Seq(
      ThemisKV.Rec(Array[Byte](1, 2, 3), Array[Byte](9)),
      ThemisKV.Rec(Array.emptyByteArray, Array[Byte](7, 7)), // zero-length key
      ThemisKV.Rec(Array[Byte](5), Array.emptyByteArray),    // zero-length value
      ThemisKV.Rec(Array.tabulate(300)(_.toByte), Array.tabulate(1000)(_.toByte)))
    ThemisKV.write(recs.toDF().repartition(2), dir)
    val back = ThemisKV.read(spark, dir).as[ThemisKV.Rec].collect()
    def k(r: ThemisKV.Rec) = (r.key.toSeq, r.value.toSeq)
    assert(back.map(k).toSet === recs.map(k).toSet)
    assert(back.length === recs.length)
  }
}
