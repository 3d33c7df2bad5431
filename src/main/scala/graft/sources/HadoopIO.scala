package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, LocalFileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-FileSystem IO shared by the binary sources ([[ThemisKV]],
  * [[FixedWidthSource]]).
  *
  * The reference dispatches URL schemes per input file
  * (`mapreduce/workers/reader/MultiProtocolReader.cc`); here the same job
  * is done once by `Path.getFileSystem`, so `file://`, `hdfs://`, `s3a://`
  * and any other configured scheme all work — the binary formats are no
  * longer local-filesystem-bound and a single 100 TB directory on a
  * distributed store scans at full cluster width.
  */
object HadoopIO {

  /** Hadoop `Configuration` isn't `java.io.Serializable`; this wrapper uses
    * its own Writable form so reader factories and task closures can carry
    * the session's FS settings (credentials, endpoints) to executors. */
  class SerializableConf(@transient private var conf: Configuration)
      extends Serializable {
    def value: Configuration = conf
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new Configuration(false)
      conf.readFields(in)
    }
  }

  def sessionConf(spark: SparkSession): Configuration =
    spark.sessionState.newHadoopConf()

  /** FileSystem for a path, with the local-FS checksum layer unwrapped:
    * Hadoop's `file://` filesystem is a ChecksumFileSystem — every read
    * is CRC-verified in 512-byte checksum chunks and every write is
    * doubled with a `.crc` side file, a >10× throughput tax on the
    * GB/s-scale binary sort IO (the round-10 GraySort probe collapsed
    * from the 21–27 GB/min band to ~1–12 under it). Distributed stores
    * don't pay it (HDFS/S3A checksum at the block/transfer layer below
    * this API), so only the local scheme is unwrapped; the raw local FS
    * matches the reference's unchecksummed direct IO — validation is
    * valsort's job (SURVEY §3.3), not the read path's. */
  private def fsFor(p: Path, conf: Configuration): FileSystem =
    p.getFileSystem(conf) match {
      case l: LocalFileSystem => l.getRawFileSystem
      case other => other
    }

  /** Expand a comma-separated list of globs / directories / files into the
    * data files underneath: each entry is `globStatus`'d (so `dir*`,
    * `{a,b}`, `?` all work), matched directories expand one level (like the
    * reference's per-disk input directories), hidden (`.`/`_`-prefixed)
    * names are dropped, and the result is sorted by URI for deterministic
    * partition planning. */
  def listFiles(pathSpec: String, conf: Configuration): Seq[FileStatus] = {
    pathSpec.split(',').map(_.trim).filter(_.nonEmpty).toSeq.flatMap { spec =>
      val p = new Path(spec)
      val fs = fsFor(p, conf)
      val matched = Option(fs.globStatus(p)).getOrElse(Array.empty[FileStatus])
      matched.toSeq.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile).toSeq
        else Seq(st)
      }
    }.filter { st =>
      val n = st.getPath.getName
      !n.startsWith(".") && !n.startsWith("_")
    }.sortBy(_.getPath.toString)
  }

  def open(path: String, conf: Configuration): FSDataInputStream = {
    val p = new Path(path)
    fsFor(p, conf).open(p)
  }

  /** Create (overwriting) `name` under `dir`, making the directory first. */
  def create(dir: String, name: String, conf: Configuration): FSDataOutputStream = {
    val d = new Path(dir)
    val fs = fsFor(d, conf)
    fs.mkdirs(d)
    fs.create(new Path(d, name), true)
  }

  /** Task-commit, FIRST-WINS: promote a hidden temp file to its final
    * name by rename. If the destination already exists, a sibling
    * attempt of the SAME task committed equivalent content — keep it and
    * drop our temp. A committed file is never deleted (delete-then-
    * rename would open a window where a dying attempt leaves NO file for
    * the partition and readers silently see fewer records); a zombie
    * attempt racing a completed job therefore cannot damage the output.
    * Cross-JOB overwrite is the writer's job-level concern —
    * [[cleanOutputs]] runs once on the driver before the tasks start. */
  def commit(dir: String, tmpName: String, finalName: String,
      conf: Configuration): Unit = {
    val d = new Path(dir)
    val fs = fsFor(d, conf)
    val dest = new Path(d, finalName)
    val tmp = new Path(d, tmpName)
    if (fs.exists(dest)) { fs.delete(tmp, false); return }
    if (!fs.rename(tmp, dest)) {
      if (fs.exists(dest)) fs.delete(tmp, false) // lost the race: fine
      else throw new java.io.IOException(
        s"commit rename failed: $dir/$tmpName -> $finalName")
    }
  }

  /** Job-level overwrite: drop the previous run's final outputs and any
    * stale temps carrying `suffix` under `dir`, so the new job's task
    * commits can be first-wins. Driver-side, before the write action. */
  def cleanOutputs(dir: String, suffix: String, conf: Configuration): Unit = {
    val d = new Path(dir)
    val fs = fsFor(d, conf)
    if (!fs.exists(d)) return
    fs.listStatus(d).foreach { st =>
      val n = st.getPath.getName
      if (st.isFile && n.contains(suffix)) fs.delete(st.getPath, false)
    }
  }
}
