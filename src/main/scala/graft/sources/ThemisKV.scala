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

  // ------------------------- sync-marker framing (splittable variant)
  //
  // One giant variable-length KV file is an operational footgun at
  // 100 TB: the base format frames sequentially, so parallelism is
  // per-file. The `.kvs` variant makes a single file split
  // record-aligned the way Hadoop SequenceFile does it (public design):
  // a per-file 16-byte sync marker in the header, re-inserted at record
  // boundaries every ~`syncIntervalBytes`; a reader assigned byte range
  // [start, end) scans forward to the first full marker whose START
  // offset is >= start and owns every record group whose marker starts
  // before `end` — each group lands in exactly one task.
  //
  // False-sync hardening (format v2): SequenceFile accepts a 2^-128
  // per-position risk of payload bytes equalling its RANDOM marker; our
  // marker is DERIVED (md5 of path|partition, for retry-deterministic
  // output), so a payload CAN deliberately contain the exact marker
  // bytes — probability is the wrong argument. Every in-body sync is
  // therefore followed by an 8-byte LE stamp of the marker's own file
  // offset: the seek scan accepts a candidate only when its stamp
  // matches the position it was found at, which payload bytes cannot do
  // (the payload is fixed; its file position isn't). Sequential
  // iteration verifies the stamp too — a mismatch at a record boundary
  // is loud corruption, never a silent mis-parse.

  private val KvsMagic = Array[Byte]('G', 'K', 'V', 'S')
  private val KvsVersion: Byte = 2
  private val KvsHeaderLen = 21L // magic(4) + version(1) + sync(16)
  private val SyncLen = 16
  private val StampLen = 8

  /** Write (key, value) binary columns as sync-framed themis-kv
    * (`.kvs`), one file per task, hidden-temp + rename commit like
    * [[write]]. The sync marker is DERIVED (md5 of path|partition), not
    * random, so a task retry rewrites byte-identical output. */
  def writeSync(df: DataFrame, path: String,
      syncIntervalBytes: Int = 2048): Unit = {
    require(syncIntervalBytes > 0,
      s"syncIntervalBytes must be positive: $syncIntervalBytes")
    val conf = new HadoopIO.SerializableConf(HadoopIO.sessionConf(df.sparkSession))
    HadoopIO.cleanOutputs(path, ".kvs", conf.value)
    df.select(col("key"), col("value")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        val pid = TaskContext.getPartitionId()
        val attempt = TaskContext.get().taskAttemptId()
        val finalName = f"part-$pid%05d.kvs"
        val tmpName = s".$finalName.$attempt.tmp"
        val sync = java.security.MessageDigest.getInstance("MD5")
          .digest(s"graft-kvs|$path|$pid".getBytes("UTF-8"))
        val out = new BufferedOutputStream(
          HadoopIO.create(path, tmpName, conf.value), 1 << 20)
        try {
          out.write(KvsMagic); out.write(KvsVersion); out.write(sync)
          var written = KvsHeaderLen // absolute offset of the next byte
          var sinceSync = 0L
          it.foreach { r =>
            if (sinceSync >= syncIntervalBytes) {
              // marker + offset-of-marker stamp (the v2 false-sync guard)
              out.write(sync); writeU64LE(out, written)
              written += SyncLen + StampLen; sinceSync = 0L
            }
            val k = r.getAs[Array[Byte]](0); val v = r.getAs[Array[Byte]](1)
            writeU32LE(out, k.length); writeU32LE(out, v.length)
            out.write(k); out.write(v)
            written += 8L + k.length + v.length
            sinceSync += 8L + k.length + v.length
          }
        } finally out.close()
        HadoopIO.commit(path, tmpName, finalName, conf.value)
    }
  }

  /** Read a directory/glob of `.kvs` files with RECORD-ALIGNED SPLITS:
    * each file is cut into `splitBytes` ranges planned driver-side from
    * the listing alone (like graft-fixed), and each task seeks + scans
    * to its first sync marker — so ONE large file fans out across the
    * cluster instead of serializing on a single reader. */
  def readSync(spark: SparkSession, path: String,
      splitBytes: Long = 32L << 20): DataFrame = {
    import spark.implicits._
    require(splitBytes > 0, s"splitBytes must be positive: $splitBytes")
    val conf = new HadoopIO.SerializableConf(HadoopIO.sessionConf(spark))
    val splits = HadoopIO.listFiles(path, conf.value)
      .filter(_.getPath.getName.endsWith(".kvs"))
      .flatMap { st =>
        val len = st.getLen
        (0L until math.max(1L, (len + splitBytes - 1) / splitBytes)).map { i =>
          (st.getPath.toString, i * splitBytes, math.min(len, (i + 1) * splitBytes))
        }
      }
    spark.sparkContext.parallelize(splits, math.max(1, splits.size))
      .flatMap { case (f, start, end) => readKvsSplit(f, start, end, conf.value) }
      .toDF()
  }

  /** Records of one byte-range split of a `.kvs` file; see the framing
    * note above for the ownership rule. `private[graft]` so the
    * adversarial split-boundary spec can place cuts at exact byte
    * offsets (readSync only cuts uniformly). */
  private[graft] def readKvsSplit(f: String, start: Long, end: Long,
      conf: org.apache.hadoop.conf.Configuration): Iterator[Rec] = {
    val raw = HadoopIO.open(f, conf)
    // a task abandoning the iterator early (limit / take / a join's
    // short-circuit) never reaches the EOF close below — the completion
    // listener guarantees the handle is released at task end either
    // way, the same contract Spark's own file-format iterators make;
    // double-close is a no-op
    Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
      try raw.close() catch { case _: java.io.IOException => () }
    })
    val header = new Array[Byte](KvsHeaderLen.toInt)
    new DataInputStream(raw).readFully(header)
    require(header.take(4).sameElements(KvsMagic),
      s"$f: not a graft-kvs file (bad magic)")
    // v1 (r11, stampless syncs) was never persisted outside test temp
    // dirs, so there is no v1 read branch — but the error must say
    // "old version" rather than "bad magic" if such a file ever surfaces
    require(header(4) == KvsVersion,
      s"$f: graft-kvs version ${header(4)} is not supported by this " +
        s"reader (expected $KvsVersion; v1 files predate offset-stamped " +
        "syncs and must be rewritten)")
    val sync = header.slice(5, 5 + SyncLen)
    // position at the first sync whose START is >= max(start, 5): the
    // header's own marker (offset 5, unstamped — found by arithmetic,
    // never by scan) seeds group 1 for the first split; later splits
    // seek and roll a 16-byte window forward (over a buffered stream —
    // the scan is byte-at-a-time), accepting a candidate only when its
    // 8-byte offset stamp names the position it was found at
    var pos = 0L // offset of the next unread byte
    var syncStart = -1L
    val in: java.io.PushbackInputStream =
      if (start <= KvsHeaderLen - SyncLen) {
        syncStart = 5L; pos = KvsHeaderLen
        new java.io.PushbackInputStream(
          new BufferedInputStream(raw, 1 << 20), SyncLen)
      } else {
        raw.seek(start); pos = start
        val buf = new java.io.PushbackInputStream(
          new BufferedInputStream(raw, 1 << 20), SyncLen)
        val win = new Array[Byte](SyncLen)
        val n = readUpTo(buf, win)
        pos += n
        if (n < SyncLen) { raw.close(); return Iterator.empty }
        var found = false
        while (!found) {
          if (java.util.Arrays.equals(win, sync)) {
            // candidate at q: true syncs carry their own offset; payload
            // bytes that merely LOOK like the marker cannot (the payload
            // is fixed, its file position isn't) — on mismatch the stamp
            // bytes re-enter the scan so an overlapping true sync is
            // still found
            val q = pos - SyncLen
            val stamp = new Array[Byte](StampLen)
            val m = readUpTo(buf, stamp)
            pos += m
            if (m == StampLen && readU64LE(stamp) == q) {
              found = true; syncStart = q
            } else {
              buf.unread(stamp, 0, m); pos -= m
              val b = buf.read()
              if (b < 0) { raw.close(); return Iterator.empty }
              System.arraycopy(win, 1, win, 0, SyncLen - 1)
              win(SyncLen - 1) = b.toByte
              pos += 1
            }
          } else {
            val b = buf.read()
            if (b < 0) { raw.close(); return Iterator.empty } // EOF: no group here
            System.arraycopy(win, 1, win, 0, SyncLen - 1)
            win(SyncLen - 1) = b.toByte
            pos += 1
          }
        }
        buf
      }
    if (syncStart >= end) { raw.close(); return Iterator.empty }
    new Iterator[Rec] {
      private var nextRec: Rec = advance()
      private def advance(): Rec = {
        // at a record boundary: the next bytes are a sync marker (+ its
        // stamp), a record header, or EOF — peek SyncLen bytes to decide
        while (true) {
          val peek = new Array[Byte](SyncLen)
          val n = readUpTo(in, peek)
          if (n == 0) { in.close(); return null } // clean EOF
          if (n == SyncLen && java.util.Arrays.equals(peek, sync)) {
            if (pos >= end) { in.close(); return null } // next split's group
            // consume + verify the stamp: at an aligned record boundary
            // a marker is the writer's (payload marker bytes live inside
            // record bodies, consumed whole below), so a bad stamp is
            // file corruption, reported loudly
            val stamp = new Array[Byte](StampLen)
            if (readUpTo(in, stamp) != StampLen || readU64LE(stamp) != pos)
              throw new java.io.IOException(
                s"$f: sync marker at offset $pos carries a foreign offset " +
                  "stamp — corrupt or truncated graft-kvs body")
            pos += SyncLen + StampLen
          } else {
            in.unread(peek, 0, n)
            val kl = readU32LE(in); val vl = readU32LE(in)
            val k = new Array[Byte](kl); readFullyStrict(in, k, f)
            val v = new Array[Byte](vl); readFullyStrict(in, v, f)
            pos += 8L + kl + vl
            return Rec(k, v)
          }
        }
        null // unreachable
      }
      override def hasNext: Boolean = nextRec != null
      override def next(): Rec = {
        val r = nextRec; nextRec = advance(); r
      }
    }
  }

  private def readUpTo(in: java.io.InputStream, buf: Array[Byte]): Int = {
    var off = 0
    while (off < buf.length) {
      val r = in.read(buf, off, buf.length - off)
      if (r < 0) return off
      off += r
    }
    off
  }

  private def readFullyStrict(in: java.io.InputStream, buf: Array[Byte],
      f: String): Unit = {
    if (readUpTo(in, buf) != buf.length)
      throw new EOFException(s"$f: truncated record body")
  }

  private def readU32LE(in: java.io.InputStream): Int = {
    val b0 = in.read(); val b1 = in.read(); val b2 = in.read(); val b3 = in.read()
    if ((b0 | b1 | b2 | b3) < 0) throw new EOFException()
    b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
  }
  private def writeU32LE(out: java.io.OutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  private def readU64LE(b: Array[Byte]): Long = {
    var v = 0L; var i = 7
    while (i >= 0) { v = (v << 8) | (b(i) & 0xffL); i -= 1 }
    v
  }
  private def writeU64LE(out: java.io.OutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }
}
