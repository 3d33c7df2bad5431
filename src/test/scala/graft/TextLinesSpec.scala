package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.sources.TextLines

/** TextLineFormatReader parity (`TextLineFormatReader.cc:26-90`): records
  * are (key = source filename, value = line); a trailing `\r` is stripped
  * and lines empty after stripping are skipped.
  */
class TextLinesSpec extends SparkSpec {

  private def writeFiles(entries: (String, String)*): Path = {
    val dir = Files.createTempDirectory("graft_textlines_spec")
    entries.foreach { case (name, content) =>
      Files.write(dir.resolve(name), content.getBytes(StandardCharsets.UTF_8))
    }
    dir
  }

  test("key is the source filename, value the line") {
    val dir = writeFiles(
      "a.txt" -> "one\ntwo\n",
      "b.txt" -> "three\n")
    val rows = TextLines.read(spark, dir.toString)
      .select(element_at(split(col("key"), "/"), -1).as("f"), col("value"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("a.txt", "one"), ("a.txt", "two"), ("b.txt", "three")))
  }

  test("windows line endings are stripped, empty lines skipped") {
    val dir = writeFiles(
      "c.txt" -> "alpha\r\n\r\n\nbeta\r\ngamma")
    val vals = TextLines.read(spark, dir.toString)
      .select(col("value")).collect().map(_.getString(0)).toSet
    // \r stripped from alpha/beta; the "\r\n" and "\n" blank lines vanish;
    // the unterminated final line still arrives (the reference destructor
    // flushes the remaining buffer — TextLineFormatReader.cc:15-24)
    assert(vals == Set("alpha", "beta", "gamma"))
  }
}
