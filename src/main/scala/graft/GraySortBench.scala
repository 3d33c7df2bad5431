package graft

import java.security.MessageDigest
import java.util.{Arrays => JArrays}

import org.apache.spark.sql.{SparkSession, functions => F}

import graft.sources.ThemisKV

/** GraySort throughput measurement on the reference's native format —
  * the baseline-comparable number: TritonSort's published Indy GraySort
  * run is ~916 GB/min across 52 nodes (~17.6 GB/min/node, 2011 hardware;
  * BASELINE.md). This main generates N 100-byte gensort-style records
  * (10-byte keys), lands them as fixed-width binary, then TIMES the 2-IO
  * pipeline the reference defines: disk read (record-aligned DSv2
  * splits) → sample-based range partition → in-partition sort → disk
  * write, followed by an untimed valsort-style validation (count +
  * global boundary order).
  *
  * SPARK_GRAYSORT_GB sizes the run (default 2). Prints one JSON line:
  * {"metric":"graysort_gb_per_min", ...}.
  */
object GraySortBench {
  def main(args: Array[String]): Unit = {
    val gb = sys.env.getOrElse("SPARK_GRAYSORT_GB", "2").toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = (gb * 1e9 / 100).toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/tmp/graysort_scratch")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graysort_bench").toString
    val inDir = s"$base/in"
    val outDir = s"$base/out"

    // ---- untimed setup: deterministic gensort-style generation + land
    val gen = spark.range(n).mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { i =>
        val d = md.digest(i.toString.getBytes("UTF-8"))
        val key = JArrays.copyOfRange(d, 0, 10)
        // value bytes don't affect sort cost; fill from one more digest
        val value = new Array[Byte](90)
        val block = md.digest((i + "_v").getBytes("UTF-8"))
        var off = 0
        while (off < 90) {
          val take = math.min(16, 90 - off)
          System.arraycopy(block, 0, value, off, take)
          off += take
        }
        ThemisKV.Rec(key, value)
      }
    }.toDF()
    ThemisKV.writeFixed(gen.repartition(cpus.toInt), inDir, 100, 10)

    // ---- timed: read → range partition on key → sort → write (the 2-IO path)
    val t0 = System.nanoTime()
    val sorted = spark.read.format("graft-fixed")
      .option("record.length", 100).option("key.length", 10)
      .load(inDir)
      .repartitionByRange(cpus.toInt, F.col("key"))
      .sortWithinPartitions(F.col("key"))
    ThemisKV.writeFixed(sorted, outDir, 100, 10)
    val secs = (System.nanoTime() - t0) / 1e9

    // ---- untimed valsort-style checks: count + a REAL global-order proof
    // (each output split internally sorted + split key-ranges pairwise
    // disjoint ⇒ a global order exists), unsigned-lexicographic like the
    // reference's valsort
    val back = spark.read.format("graft-fixed")
      .option("record.length", 100).option("key.length", 10)
      .load(outDir)
    val cnt = back.count()
    require(cnt == n, s"record count mismatch: $cnt != $n")
    def cmp(a: Array[Byte], b: Array[Byte]): Int = {
      var i = 0
      while (i < a.length && i < b.length) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
    val parts = back.select("key").as[Array[Byte]](
        org.apache.spark.sql.Encoders.BINARY)
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          var first: Array[Byte] = null
          var prev: Array[Byte] = null
          var sorted = true
          it.foreach { k =>
            if (first == null) first = k
            else if (cmp(prev, k) > 0) sorted = false
            prev = k
          }
          Iterator((first, prev, sorted))
        }
      }(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.BINARY,
        org.apache.spark.sql.Encoders.BINARY,
        org.apache.spark.sql.Encoders.scalaBoolean))
      .collect()
    require(parts.forall(_._3), "a sorted-output split is internally unsorted")
    val ranges = parts.sortWith((x, y) => cmp(x._1, y._1) < 0)
    ranges.sliding(2).foreach {
      case Array(lo, hi) =>
        require(cmp(lo._2, hi._1) <= 0,
          "output split key-ranges overlap: global order violated")
      case _ =>
    }

    val gbSorted = n * 100.0 / 1e9
    val rate = gbSorted / (secs / 60.0)
    println(f"""{"metric":"graysort_gb_per_min","value":$rate%.2f,"gb":$gbSorted%.2f,"sec":$secs%.2f,"records":$n,"cpus":$cpus}""")
    spark.stop()
  }
}
