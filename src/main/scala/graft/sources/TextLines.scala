package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's text-line source
  * (`mapreduce/workers/bytestreamconverter/TextLineFormatReader.cc:26-90`):
  * each line of each file becomes one record with key = source filename and
  * value = the line, where a trailing `\r` (Windows line ending) is
  * stripped and lines that are empty after stripping are skipped.
  * Deliberate deviation: the reference strips `\r` only when it
  * immediately precedes a `\n` (TextLineFormatReader.cc:34), so a final
  * unterminated line keeps its `\r`; Hadoop's line reader (underneath
  * `spark.read.text`) additionally treats a lone `\r` as a terminator.
  * Both differences are unobservable on `\n`-terminated corpora.
  *
  * Spark-first shape: `spark.read.text` is the distributed splittable
  * reader (HDFS-style line splitting across executors — the reference's
  * ByteStreamConverter pipeline is Spark's file-scan machinery), and
  * `input_file_name()` recovers the per-row provenance the reference
  * threads through StreamInfo.
  */
object TextLines {

  /** Read a text directory/glob as (key = filename, value = line). */
  def read(s: SparkSession, path: String): DataFrame =
    s.read.text(path)
      .select(input_file_name().as("key"),
        regexp_replace(col("value"), "\r$", "").as("value"))
      .filter(length(col("value")) > 0)
}
