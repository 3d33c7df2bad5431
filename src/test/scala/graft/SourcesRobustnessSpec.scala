package graft

import java.nio.file.Files

import graft.sources.ThemisKV

/** Failure-mode behavior of the binary sources: clear errors for
  * malformed inputs, sane behavior on empty inputs. */
class SourcesRobustnessSpec extends SparkSpec {
  import spark.implicits._

  test("fixed-width reader rejects files with a partial trailing record") {
    val dir = Files.createTempDirectory("fixedbad")
    Files.write(dir.resolve("bad.bin"), new Array[Byte](150)) // 1.5 records
    val e = intercept[Exception] {
      spark.read.format("graft-fixed")
        .option("record.length", 100).option("key.length", 10)
        .load(dir.toString).count()
    }
    assert(e.getMessage.contains("not a multiple") ||
      e.getCause != null && e.getCause.getMessage.contains("not a multiple"))
  }

  test("fixed-width reader rejects key longer than record") {
    val dir = Files.createTempDirectory("fixedbad2")
    Files.write(dir.resolve("a.bin"), new Array[Byte](100))
    val e = intercept[Exception] {
      spark.read.format("graft-fixed")
        .option("record.length", 100).option("key.length", 200)
        .load(dir.toString).count()
    }
    assert(e.getMessage.contains("key.length") ||
      e.getCause != null && e.getCause.getMessage.contains("key.length"))
  }

  test("themis-kv read of an empty directory yields an empty frame") {
    val dir = Files.createTempDirectory("kvempty")
    assert(ThemisKV.read(spark, dir.toString).count() === 0)
  }

  test("themis-kv write/read of an empty frame round-trips") {
    val dir = Files.createTempDirectory("kvempty2")
    val empty = Seq.empty[ThemisKV.Rec].toDF()
    ThemisKV.write(empty.repartition(1), dir.toString)
    assert(ThemisKV.read(spark, dir.toString).count() === 0)
  }

  test("underscore and dot files are ignored like Spark conventions") {
    val dir = Files.createTempDirectory("fixedskip")
    Files.write(dir.resolve("data.bin"), new Array[Byte](200))
    Files.write(dir.resolve("_SUCCESS"), Array[Byte](1))
    Files.write(dir.resolve(".hidden"), Array[Byte](1, 2, 3))
    val n = spark.read.format("graft-fixed")
      .option("record.length", 100).option("key.length", 10)
      .load(dir.toString).count()
    assert(n === 2)
  }
}
