package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.TaskContext

/** The reference's general record format: `{keyLength: uint32 LE,
  * valueLength: uint32 LE, key bytes, value bytes}`
  * (`mapreduce/common/KeyValuePair.h:12-23`), as reader + writer over
  * (key: binary, value: binary) DataFrames.
  *
  * All IO goes through the Hadoop FileSystem API ([[HadoopIO]]), so paths
  * may carry any configured scheme (`file://`, `hdfs://`, `s3a://`, …) and
  * globs/comma-lists work — the reference's `MultiProtocolReader.cc` scheme
  * dispatch, done by `Path.getFileSystem`.
  *
  * Variable-length records can't be split without scanning, so parallelism
  * is per-file (one partition per file — the reference reads whole files
  * per worker the same way, `WholeFileReader.cc:22-50`); writers emit one
  * file per task. Zero-length keys/values round-trip (the reference's
  * ZeroKeyMapFunction relies on them).
  */
object ThemisKV {

  case class Rec(key: Array[Byte], value: Array[Byte])

  /** Read a directory/glob of themis-kv files: one partition per file. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val conf = new HadoopIO.SerializableConf(HadoopIO.sessionConf(spark))
    val files = HadoopIO.listFiles(path, conf.value).map(_.getPath.toString)
    spark.sparkContext.parallelize(files, math.max(1, files.size))
      .flatMap { f =>
        val in = new DataInputStream(
          new BufferedInputStream(HadoopIO.open(f, conf.value), 1 << 20))
        new Iterator[Rec] {
          private var nextRec: Rec = advance()
          private def advance(): Rec =
            try {
              val kl = readU32LE(in); val vl = readU32LE(in)
              val k = new Array[Byte](kl); in.readFully(k)
              val v = new Array[Byte](vl); in.readFully(v)
              Rec(k, v)
            } catch { case _: EOFException => in.close(); null }
          override def hasNext: Boolean = nextRec != null
          override def next(): Rec = {
            val r = nextRec; nextRec = advance(); r
          }
        }
      }.toDF()
  }

  /** Write (key, value) binary columns as themis-kv, one file per task.
    * Each task writes a hidden temp file and commits it by rename —
    * a task that dies mid-write leaves only a dot-prefixed temp that
    * readers ignore, never a partial data file. */
  def write(df: DataFrame, path: String): Unit = {
    val conf = new HadoopIO.SerializableConf(HadoopIO.sessionConf(df.sparkSession))
    HadoopIO.cleanOutputs(path, ".kv", conf.value)
    df.select(col("key"), col("value")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        val pid = TaskContext.getPartitionId()
        val attempt = TaskContext.get().taskAttemptId()
        val finalName = f"part-$pid%05d.kv"
        val tmpName = s".$finalName.$attempt.tmp"
        val out = new BufferedOutputStream(
          HadoopIO.create(path, tmpName, conf.value), 1 << 20)
        try it.foreach { r =>
          val k = r.getAs[Array[Byte]](0); val v = r.getAs[Array[Byte]](1)
          writeU32LE(out, k.length); writeU32LE(out, v.length)
          out.write(k); out.write(v)
        } finally out.close()
        HadoopIO.commit(path, tmpName, finalName, conf.value)
    }
  }

  /** Write fixed-width header-less records (the GraySort layout) so
    * [[FixedWidthSource]] can read them back. */
  def writeFixed(df: DataFrame, path: String, recordLen: Int, keyLen: Int): Unit = {
    val conf = new HadoopIO.SerializableConf(HadoopIO.sessionConf(df.sparkSession))
    HadoopIO.cleanOutputs(path, ".bin", conf.value)
    df.select(col("key"), col("value")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        val pid = TaskContext.getPartitionId()
        val attempt = TaskContext.get().taskAttemptId()
        val finalName = f"part-$pid%05d.bin"
        val tmpName = s".$finalName.$attempt.tmp"
        val out = new BufferedOutputStream(
          HadoopIO.create(path, tmpName, conf.value), 1 << 20)
        try it.foreach { r =>
          val k = r.getAs[Array[Byte]](0); val v = r.getAs[Array[Byte]](1)
          require(k.length == keyLen && v.length == recordLen - keyLen,
            s"record shape ${k.length}/${v.length} != $keyLen/${recordLen - keyLen}")
          out.write(k); out.write(v)
        } finally out.close()
        HadoopIO.commit(path, tmpName, finalName, conf.value)
    }
  }

  private def readU32LE(in: DataInputStream): Int = {
    val b0 = in.read(); val b1 = in.read(); val b2 = in.read(); val b3 = in.read()
    if ((b0 | b1 | b2 | b3) < 0) throw new EOFException()
    b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
  }
  private def writeU32LE(out: java.io.OutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }
}
