package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.HadoopIO

/** A manifest-pinned snapshot table driven by a STREAM — the
  * append-only-commit shape of the oracle-checked q_snapshot_read
  * ([[graft.queries.Ingest.snapshotRead]]) as a `foreachBatch` sink.
  * Each micro-batch commits (data files under `data/b<batchId>` + a new
  * manifest `manifest/v<n>` = previous manifest ∪ this batch's files);
  * committed files are never rewritten in place, so a reader pinned to
  * any version is oblivious to later commits — snapshot isolation under
  * continuous ingest, across appends AND the maintenance verbs
  * ([[deleteWhere]], [[merge]], [[compact]]), which interleave with the
  * stream because every commit chains from the global newest manifest.
  *
  * Replay idempotence: per-batch markers (see [[appendWriter]]).
  * Manifests are metadata-sized parquet (one row per file) and the
  * commit path never collects them — the union is a frame-level append;
  * only [[read]] materializes a path list, to plan the snapshot scan.
  * Concurrency contract: ONE writer at a time (the stream, or one
  * maintenance verb between/alongside its batches) — the
  * optimistic-concurrency commit log a full lake format layers on top
  * is out of scope here. */
object SnapshotStore {

  /** The foreachBatch function: commit each arriving micro-batch as a
    * new snapshot version under `tableDir`.
    * {{{
    * docsStream.writeStream
    *   .foreachBatch(SnapshotStore.appendWriter(dir)).start()
    * }}}
    *
    * Versions are monotone (`max committed + 1`) and the chain base is
    * the GLOBAL newest manifest, so appends interleave correctly with
    * the maintenance verbs: a batch arriving after a [[deleteWhere]] or
    * [[compact]] chains from the post-maintenance file list — deleted
    * files can never resurrect through the streaming lineage.
    *
    * Replay idempotence is two-layered. A per-batch marker
    * (`manifest/b<id>.done`, written AFTER the manifest) makes a retry
    * of a fully committed batch a no-op. A retry after a crash BETWEEN
    * manifest and marker finds its own files already listed in the
    * newest manifest and ADOPTS that commit (writes only the marker) —
    * it must NOT rewrite the data dir, because `overwrite` regenerates
    * part-file names and would orphan the already-committed manifest
    * (readers pinned to it would lose their files, and a manifest-diff
    * consumer would see the batch twice under new names). */
  def appendWriter(tableDir: String): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      val spark = batch.sparkSession
      import spark.implicits._
      val conf = HadoopIO.sessionConf(spark)
      val marker = new Path(s"$tableDir/manifest/b$batchId.done")
      val fs = marker.getFileSystem(conf)
      // structural own-directory prefix, scheme-normalized — a substring
      // test on the raw path would false-match a tableDir that itself
      // contains a /data/b<id>/ segment
      val ownDirKey = fileKey(s"$tableDir/data/b$batchId") + "/"
      def isOwn(p: String): Boolean = fileKey(p).startsWith(ownDirKey)
      if (!fs.exists(marker)) { // marker present = replayed batch: no-op
        val prevOpt = manifest(spark, tableDir)
        val orphaned = prevOpt.exists(
          _.as[String].collect().exists(isOwn))
        if (!orphaned) {
          batch.write.mode("overwrite").parquet(s"$tableDir/data/b$batchId")
          val mine = HadoopIO.listFiles(s"$tableDir/data/b$batchId", conf)
            .map(_.getPath.toString).filter(_.endsWith(".parquet"))
          val prev = prevOpt.getOrElse(Seq.empty[String].toDF("path"))
          val next = newestVersion(fs, tableDir).getOrElse(0L) + 1
          prev.unionByName(mine.toDF("path"))
            .write.mode("overwrite").parquet(s"$tableDir/manifest/v$next")
        } // else: adopt the prior attempt's commit as-is
        fs.create(marker, true).close()
      }
  }

  /** Committed manifest versions under `tableDir`, ascending. ONE
    * definition of the naming scheme (`v<long>`; `b<id>.done` markers
    * and debris are invisible) shared by every reader and verb. */
  private def versionsOf(fs: org.apache.hadoop.fs.FileSystem,
      tableDir: String): Seq[Long] = {
    val dir = new Path(s"$tableDir/manifest")
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq
      .map(_.getPath.getName).filter(_.startsWith("v"))
      .flatMap(n => scala.util.Try(n.drop(1).toLong).toOption)
      .sorted
  }

  private def newestVersion(fs: org.apache.hadoop.fs.FileSystem,
      tableDir: String): Option[Long] = versionsOf(fs, tableDir).lastOption

  /** The manifest of `version` (default: newest committed). None before
    * the first commit. */
  def manifest(spark: SparkSession, tableDir: String,
      version: Option[Long] = None): Option[DataFrame] = {
    val fs = new Path(tableDir).getFileSystem(spark.sessionState.newHadoopConf())
    val versions = versionsOf(fs, tableDir)
      .filter(v => version.forall(v == _))
    versions.lastOption.map(v =>
      spark.read.parquet(s"$tableDir/manifest/v$v"))
  }

  /** Incremental consumption: the rows added strictly AFTER `fromVersion`
    * up to `toVersion` (default: newest), planned from the MANIFEST DIFF
    * — an anti-join of two metadata-sized path lists — so the scan reads
    * only the delta's files, never the base table. This is the
    * downstream-consumer shape (a nightly index merge, a CDC feed):
    * work ∝ appended data regardless of table size. None when the
    * versions coincide or don't exist. */
  def changes(spark: SparkSession, tableDir: String, fromVersion: Long,
      toVersion: Option[Long] = None): Option[DataFrame] = {
    import spark.implicits._
    for {
      to <- manifest(spark, tableDir, toVersion)
      from <- manifest(spark, tableDir, Some(fromVersion))
      added = to.join(from, Seq("path"), "left_anti")
        .as[String].collect().toSeq
      if added.nonEmpty
    } yield spark.read.option("mergeSchema", "true").parquet(added: _*)
  }

  /** Snapshot read pinned to `version` (default: newest). The manifest's
    * path list is metadata-sized (one row per data file) — collecting it
    * to plan the scan is the same driver-side planning every file index
    * does. None before the first commit; an empty-manifest version reads
    * as an empty frame only if the caller committed one. */
  def read(spark: SparkSession, tableDir: String,
      version: Option[Long] = None): Option[DataFrame] = {
    import spark.implicits._
    manifest(spark, tableDir, version).map { m =>
      val paths = m.as[String].collect().toSeq
      // mergeSchema: a column added mid-stream (the q_schema_evolution
      // shape) must surface — a first-file-inferred schema would
      // silently drop it from every snapshot read
      spark.read.option("mergeSchema", "true").parquet(paths: _*)
    }
  }

  /** DESCRIBE HISTORY: one row per committed version — (version,
    * n_files, n_bytes) — from the manifests plus ONE recursive listing
    * of the data tree (sizes keyed by normalized path; a manifest entry
    * whose file was vacuumed away counts 0 bytes). Metadata-sized work
    * at any table size: manifests are file lists and the data tree holds
    * one entry per live file. */
  def history(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(tableDir).getFileSystem(conf)
    val sizes: Map[String, Long] = {
      val root = new Path(s"$tableDir/data")
      if (!fs.exists(root)) Map.empty
      else {
        val it = fs.listFiles(root, true)
        val b = Map.newBuilder[String, Long]
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile) b += fileKey(st.getPath.toString) -> st.getLen
        }
        b.result()
      }
    }
    versionsOf(fs, tableDir).map { v =>
      val paths = spark.read.parquet(s"$tableDir/manifest/v$v")
        .as[String].collect()
      (v, paths.length.toLong,
        paths.map(p => sizes.getOrElse(fileKey(p), 0L)).sum)
    }.toDF("version", "n_files", "n_bytes")
  }

  /** Scheme-safe identity for a file path: `input_file_name()` and the
    * manifest can render the same file as `file:/p` vs `file:///p`. */
  private def fileKey(s: String): String = {
    val u = new Path(s).toUri
    s"${Option(u.getAuthority).getOrElse("")}${u.getPath}"
  }

  /** Copy-on-write DELETE: remove the rows matching `predicate` from the
    * newest snapshot by rewriting ONLY the files that contain matches
    * (found in one scan via `input_file_name()`; a metadata-sized
    * touched-file list), committing `newVersion` = untouched files ∪
    * rewritten files. Untouched files keep their paths — at 100 TB a
    * selective delete rewrites a handful of files, never the table, and
    * every previous version still reads its original bytes (time travel
    * over deletes). Returns the number of files rewritten.
    *
    * Concurrency contract: one writer at a time, monotone versions —
    * `newVersion` must exceed every committed version. Appends arriving
    * AFTER this commit chain from its post-delete file list (the
    * appendWriter global-newest rule), so deleted files never
    * resurrect. */
  def deleteWhere(spark: SparkSession, tableDir: String,
      predicate: org.apache.spark.sql.Column, newVersion: Long): Int = {
    import spark.implicits._
    val m = manifest(spark, tableDir).getOrElse(
      sys.error(s"deleteWhere: no committed manifest under $tableDir"))
    val paths = m.as[String].collect().toSeq
    // mergeSchema everywhere a maintenance verb reads data files: after
    // a mid-stream column addition, schema inference from one arbitrary
    // file could DROP the evolved column from the rewritten files (or
    // fail to resolve a predicate on it)
    val touched = spark.read.option("mergeSchema", "true").parquet(paths: _*)
      .filter(predicate)
      .select(org.apache.spark.sql.functions.input_file_name().as("f"))
      .distinct().as[String].collect().map(fileKey).toSet
    if (touched.isEmpty) {
      m.write.mode("overwrite").parquet(s"$tableDir/manifest/v$newVersion")
      return 0
    }
    val (rewrite, keep) = paths.partition(p => touched(fileKey(p)))
    // SQL DELETE semantics: a NULL-evaluating predicate KEEPS the row —
    // a bare !predicate would be NULL too and silently drop it (and
    // inconsistently: the same row in an untouched file would survive)
    spark.read.option("mergeSchema", "true").parquet(rewrite: _*)
      .filter(!org.apache.spark.sql.functions.coalesce(predicate,
        org.apache.spark.sql.functions.lit(false)))
      .write.mode("overwrite").parquet(s"$tableDir/data/d$newVersion")
    val conf = HadoopIO.sessionConf(spark)
    val fresh = HadoopIO.listFiles(s"$tableDir/data/d$newVersion", conf)
      .map(_.getPath.toString).filter(_.endsWith(".parquet"))
    (keep ++ fresh).toDF("path")
      .write.mode("overwrite").parquet(s"$tableDir/manifest/v$newVersion")
    rewrite.size
  }

  /** MERGE (upsert) as ONE commit: rows of `changes` replace same-`key`
    * rows of the newest snapshot, new keys append. Match-containing
    * files are found in one `input_file_name` scan and rewritten minus
    * the matched keys (broadcast semi-join against the delta-sized key
    * set); the changes land as fresh files; the new manifest lists
    * untouched ∪ rewritten ∪ changes — so there is no intermediate
    * version where the old rows are gone but the new ones not yet
    * visible. Work ∝ touched files + delta, never table size. Same
    * single-maintainer/monotone-version contract as [[deleteWhere]].
    * Returns the number of files rewritten. */
  def merge(spark: SparkSession, tableDir: String, changes: DataFrame,
      key: String, newVersion: Long): Int = {
    import org.apache.spark.sql.functions.{broadcast, col, input_file_name}
    import spark.implicits._
    val m = manifest(spark, tableDir).getOrElse(
      sys.error(s"merge: no committed manifest under $tableDir"))
    val paths = m.as[String].collect().toSeq
    val keys = changes.select(col(key)).distinct()
    // mergeSchema: see deleteWhere — a rewrite must carry every column
    val cur = spark.read.option("mergeSchema", "true").parquet(paths: _*)
    val touched = cur.join(broadcast(keys), Seq(key), "left_semi")
      .select(input_file_name().as("f"))
      .distinct().as[String].collect().map(fileKey).toSet
    val (rewrite, keep) = paths.partition(p => touched(fileKey(p)))
    if (rewrite.nonEmpty)
      spark.read.option("mergeSchema", "true").parquet(rewrite: _*)
        .join(broadcast(keys), Seq(key), "left_anti")
        .write.mode("overwrite").parquet(s"$tableDir/data/m$newVersion")
    changes.write.mode("overwrite").parquet(s"$tableDir/data/u$newVersion")
    val conf = HadoopIO.sessionConf(spark)
    def fresh(sub: String): Seq[String] =
      HadoopIO.listFiles(s"$tableDir/data/$sub", conf)
        .map(_.getPath.toString).filter(_.endsWith(".parquet"))
    val rewritten = if (rewrite.nonEmpty) fresh(s"m$newVersion") else Nil
    (keep ++ rewritten ++ fresh(s"u$newVersion")).toDF("path")
      .write.mode("overwrite").parquet(s"$tableDir/manifest/v$newVersion")
    rewrite.size
  }

  /** VACUUM: physically delete data files referenced ONLY by manifests
    * older than `retainFrom`, then drop those manifests — the bounded
    * price of time travel (versions ≥ retainFrom stay byte-identical;
    * older versions become unreadable). The reachability set is a union
    * of the retained manifests — metadata-sized at any table size.
    * Returns the number of files deleted. Same single-maintainer
    * contract as the other maintenance verbs. */
  def vacuum(spark: SparkSession, tableDir: String, retainFrom: Long): Int = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val mdir = new Path(s"$tableDir/manifest")
    val fs = mdir.getFileSystem(conf)
    val versions = versionsOf(fs, tableDir)
    if (versions.isEmpty) return 0
    val (old, retained) = versions.partition(_ < retainFrom)
    require(retained.nonEmpty || versions.isEmpty,
      s"vacuum(retainFrom=$retainFrom) would delete EVERY version " +
        s"(newest committed is ${versions.max}) — the current snapshot " +
        "is always retained; pass retainFrom <= the newest version")
    if (old.isEmpty) return 0
    def pathsOf(vs: Seq[Long]): Set[String] =
      if (vs.isEmpty) Set.empty
      else spark.read.parquet(vs.map(v => s"$tableDir/manifest/v$v"): _*)
        .as[String].collect().map(fileKey).toSet
    val live = pathsOf(retained)
    val dead = pathsOf(old) -- live
    // resolve dead keys back to concrete paths via the old manifests
    val deadPaths =
      spark.read.parquet(old.map(v => s"$tableDir/manifest/v$v"): _*)
        .as[String].collect().distinct.filter(p => dead(fileKey(p)))
    deadPaths.foreach { p =>
      val hp = new Path(p)
      hp.getFileSystem(conf).delete(hp, false)
    }
    old.foreach { v =>
      fs.delete(new Path(s"$tableDir/manifest/v$v"), true)
    }
    deadPaths.length
  }

  /** OPTIMIZE / compaction: rewrite the newest snapshot's files into
    * `targetFiles` larger ones and commit `newVersion` listing only the
    * compacted set — row content identical (the spec pins it), previous
    * versions untouched and still readable. Run on the
    * q_compaction_plan schedule; same single-maintainer contract as
    * [[deleteWhere]]. */
  def compact(spark: SparkSession, tableDir: String, targetFiles: Int,
      newVersion: Long): Unit = {
    import spark.implicits._
    val cur = read(spark, tableDir).getOrElse(
      sys.error(s"compact: no committed manifest under $tableDir"))
    cur.repartition(targetFiles)
      .write.mode("overwrite").parquet(s"$tableDir/data/d$newVersion")
    val conf = HadoopIO.sessionConf(spark)
    val fresh = HadoopIO.listFiles(s"$tableDir/data/d$newVersion", conf)
      .map(_.getPath.toString).filter(_.endsWith(".parquet"))
    fresh.toDF("path")
      .write.mode("overwrite").parquet(s"$tableDir/manifest/v$newVersion")
  }
}
