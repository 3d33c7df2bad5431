package graft

import java.nio.file.Files

import graft.sources.{HadoopIO, ThemisKV}

/** The binary sources ([[graft.sources.ThemisKV]], graft-fixed DSv2) read
  * and write through the Hadoop FileSystem API, so explicit `file:` scheme
  * URIs, globs, and comma-separated multi-directory specs all resolve —
  * the reference's `MultiProtocolReader.cc` scheme dispatch. */
class HadoopSchemeSpec extends SparkSpec {
  import spark.implicits._

  private def mkRecs(n: Int, tag: Byte): Seq[ThemisKV.Rec] =
    (0 until n).map { i =>
      ThemisKV.Rec(Array[Byte](tag, i.toByte), Array[Byte](i.toByte, tag))
    }

  test("themis-kv round-trips through an explicit file: scheme URI") {
    val dir = Files.createTempDirectory("kvscheme")
    val uri = dir.toUri.toString // file:///...
    ThemisKV.write(mkRecs(7, 1).toDF().repartition(2), uri)
    val back = ThemisKV.read(spark, uri).as[ThemisKV.Rec].collect()
    assert(back.length === 7)
    assert(back.map(r => (r.key.toSeq, r.value.toSeq)).toSet ===
      mkRecs(7, 1).map(r => (r.key.toSeq, r.value.toSeq)).toSet)
  }

  test("graft-fixed reads an explicit file: scheme URI") {
    val dir = Files.createTempDirectory("fixedscheme")
    Files.write(dir.resolve("a.bin"), Array.tabulate(300)(_.toByte))
    val n = spark.read.format("graft-fixed")
      .option("record.length", 100).option("key.length", 10)
      .load(dir.toUri.toString).count()
    assert(n === 3)
  }

  test("graft-fixed reads a multi-directory glob") {
    val root = Files.createTempDirectory("fixedglob")
    Files.createDirectory(root.resolve("disk0"))
    Files.createDirectory(root.resolve("disk1"))
    Files.createDirectory(root.resolve("other"))
    Files.write(root.resolve("disk0/a.bin"), new Array[Byte](200))
    Files.write(root.resolve("disk1/b.bin"), new Array[Byte](300))
    Files.write(root.resolve("other/c.bin"), new Array[Byte](100))
    val n = spark.read.format("graft-fixed")
      .option("record.length", 100).option("key.length", 10)
      .load(s"$root/disk*").count()
    assert(n === 5) // disk0 + disk1, not other/
  }

  test("themis-kv reads a comma-separated list of directories") {
    val d0 = Files.createTempDirectory("kvmulti0")
    val d1 = Files.createTempDirectory("kvmulti1")
    ThemisKV.write(mkRecs(3, 2).toDF().repartition(1), d0.toString)
    ThemisKV.write(mkRecs(4, 3).toDF().repartition(1), d1.toString)
    val n = ThemisKV.read(spark, s"$d0,$d1").count()
    assert(n === 7)
  }

  test("sync-framed kvs: ONE large file splits record-aligned across >1 task") {
    val dir = Files.createTempDirectory("kvsync").toString
    // variable-length records (0..200-byte values, zero-length edge
    // included) in a SINGLE file, small sync interval so markers land
    // throughout; splits cut mid-record and mid-marker by construction
    val recs = (0 until 3000).map { i =>
      ThemisKV.Rec(
        if (i % 97 == 0) Array.emptyByteArray
        else s"k$i".getBytes("UTF-8"),
        Array.tabulate(i % 201)(j => ((i + j) % 251).toByte))
    }
    ThemisKV.writeSync(recs.toDF().repartition(1), dir,
      syncIntervalBytes = 512)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".kvs"))
    assert(files.length === 1, s"expected ONE kvs file, got ${files.length}")
    val want = recs.map(r => (r.key.toSeq, r.value.toSeq))
      .groupBy(identity).view.mapValues(_.size).toMap
    // several split sizes, each forcing many tasks over the one file —
    // every cut point must yield the identical record multiset
    for (splitBytes <- Seq(4096L, 10000L, 64 << 10)) {
      val df = ThemisKV.readSync(spark, dir, splitBytes = splitBytes)
      assert(df.rdd.getNumPartitions > 1,
        s"splitBytes=$splitBytes: expected >1 task over one file")
      val got = df.as[ThemisKV.Rec].collect()
        .map(r => (r.key.toSeq, r.value.toSeq))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(got === want,
        s"splitBytes=$splitBytes: split read diverged from the written records")
    }
    // whole-file split degenerates to the sequential read
    val one = ThemisKV.readSync(spark, dir, splitBytes = 1L << 30)
      .as[ThemisKV.Rec].collect()
    assert(one.length === recs.length)
  }

  test("sync-framed kvs: payloads CONTAINING the derived marker read record-exact") {
    // the marker is md5(path|partition) — deterministic, so a payload
    // can deliberately embed the exact marker bytes; the v2 offset
    // stamp must reject every such false sync at every possible split
    // boundary, not probabilistically
    val dir = Files.createTempDirectory("kvadv").toString
    val sync = java.security.MessageDigest.getInstance("MD5")
      .digest(s"graft-kvs|$dir|0".getBytes("UTF-8"))
    def fakeStamp(i: Int): Array[Byte] =
      Array.tabulate(8)(j => ((i >> (8 * (j % 4))) & 0xff).toByte)
    val recs = (0 until 400).map { i =>
      val v: Array[Byte] = i % 5 match {
        case 0 => sync.clone // value IS the marker
        case 1 => Array[Byte](1, 2, 3) ++ sync ++ Array[Byte](4, 5) // embedded
        case 2 => sync ++ sync // back-to-back markers
        case 3 => sync ++ fakeStamp(i) // marker + plausible-looking stamp
        case _ => Array.tabulate(i % 40)(j => ((i + j) % 251).toByte)
      }
      val k: Array[Byte] =
        if (i % 7 == 0) sync ++ Array[Byte](i.toByte) // marker in the KEY too
        else s"k$i".getBytes("UTF-8")
      ThemisKV.Rec(k, v)
    }
    ThemisKV.writeSync(recs.toDF().repartition(1), dir, syncIntervalBytes = 128)
    val file = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".kvs")).head
    val bytes = Files.readAllBytes(file.toPath)
    // every occurrence of the 16 marker bytes in the file — true writer
    // syncs AND the planted payload collisions
    val occurrences = (0 to bytes.length - sync.length).filter { q =>
      java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, q, q + sync.length), sync)
    }
    assert(occurrences.length > recs.count(_ => true) / 5,
      s"expected many marker occurrences, found ${occurrences.length}")
    val trueSyncs = occurrences.filter { q =>
      q + 24 <= bytes.length && {
        var v = 0L; var j = 23
        while (j >= 16) { v = (v << 8) | (bytes(q + j) & 0xffL); j -= 1 }
        v == q
      } && q != 5 // header marker is unstamped
    }
    assert(trueSyncs.nonEmpty, "no stamped in-body syncs written")
    assert(occurrences.size > trueSyncs.size + 1,
      "the planted payload collisions did not survive into the file")
    val want = recs.map(r => (r.key.toSeq, r.value.toSeq))
      .groupBy(identity).view.mapValues(_.size).toMap
    // ANY partition of [0, len) must yield the exact record multiset:
    // cuts at every marker occurrence ±1 (true and false), mid-stamp,
    // and a 113-byte comb for mid-record coverage
    val cuts = (occurrences.flatMap(q => Seq(q - 1, q, q + 1, q + 17)) ++
        (0 until bytes.length by 113)).map(_.toLong)
      .filter(c => c > 0 && c < bytes.length).distinct.sorted
    val bounds = (0L +: cuts) :+ bytes.length.toLong
    val conf = HadoopIO.sessionConf(spark)
    val got = bounds.zip(bounds.tail).flatMap { case (s, e) =>
        ThemisKV.readKvsSplit(file.toString, s, e, conf)
      }.map(r => (r.key.toSeq, r.value.toSeq))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(got === want,
      s"adversarial split partition (${bounds.length - 1} splits) diverged")
    // and the public uniform-split reader agrees at several grains
    for (splitBytes <- Seq(256L, 1000L, 4096L)) {
      val g2 = ThemisKV.readSync(spark, dir, splitBytes = splitBytes)
        .as[ThemisKV.Rec].collect()
        .map(r => (r.key.toSeq, r.value.toSeq))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(g2 === want, s"readSync splitBytes=$splitBytes diverged")
    }
  }

  test("writers commit by rename: no temp files remain, stale temps ignored") {
    val dir = Files.createTempDirectory("kvcommit")
    // a stale temp from a dead task attempt must not confuse readers
    Files.write(dir.resolve(".part-00000.kv.999.tmp"), Array[Byte](1, 2, 3))
    ThemisKV.write(mkRecs(5, 4).toDF().repartition(2), dir.toString)
    val names = Files.list(dir).toArray.map(_.toString.split("/").last).sorted
    assert(names.count(_.endsWith(".kv")) === 2, names.mkString(","))
    assert(!names.exists(n => n.endsWith(".tmp") && !n.startsWith(".part-00000.kv.999")),
      s"writer left its own temp files: ${names.mkString(",")}")
    assert(ThemisKV.read(spark, dir.toString).count() === 5)
  }

  test("HadoopIO.listFiles sorts by URI and drops hidden names across dirs") {
    val root = Files.createTempDirectory("hlist")
    Files.createDirectory(root.resolve("d0"))
    Files.createDirectory(root.resolve("d1"))
    Files.write(root.resolve("d0/z.bin"), Array[Byte](1))
    Files.write(root.resolve("d1/a.bin"), Array[Byte](2))
    Files.write(root.resolve("d0/_SUCCESS"), Array[Byte](0))
    Files.write(root.resolve("d1/.crc"), Array[Byte](0))
    val conf = HadoopIO.sessionConf(spark)
    val names = HadoopIO.listFiles(s"$root/d*", conf).map(_.getPath.getName)
    assert(names === Seq("z.bin", "a.bin")) // d0/* sorts before d1/*
  }
}
