package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.HadoopIO

/** A manifest-pinned snapshot table driven by a STREAM — the
  * append-only-commit shape of the oracle-checked q_snapshot_read
  * ([[graft.queries.Ingest.snapshotRead]]) as a `foreachBatch` sink.
  * Each micro-batch commits (data files under `data/b<batchId>` + a new
  * manifest version = previous manifest ∪ this batch's files);
  * committed files are never rewritten in place, so a reader pinned to
  * any version is oblivious to later commits — snapshot isolation under
  * continuous ingest, across appends AND the maintenance verbs
  * ([[deleteWhere]], [[merge]], [[compact]]), which interleave with the
  * stream because every commit chains from the global newest manifest.
  *
  * == Multi-writer commits (optimistic concurrency) ==
  * A version `n` is three files under `manifest/`:
  * `v<n>.claim` (atomic create-fails-if-exists = the CAS that elects
  * n's single writer), `v<n>` (the parquet file list, written only by
  * the claim holder), and `v<n>.commit` (the commit point; its content
  * is the operation label DESCRIBE HISTORY shows). Writers claim
  * `newest committed + 1`; a loser waits for the winner's commit and
  * retries against the new newest, so concurrent writers — a
  * compaction racing the ingest stream — SERIALIZE rather than corrupt:
  * every committed version chains from its predecessor and no file
  * resurrects. Claim atomicity: on HDFS (and any store with atomic
  * exclusive create) `create(overwrite=false)` is the NameNode-level
  * CAS; the raw local filesystem's create is check-then-act, so an
  * intra-JVM lock covers same-process writers there — the same posture
  * Delta Lake's LogStore takes for `file://` paths. A claim whose
  * writer died before committing blocks later writers until the
  * deadline; the timeout names the orphan and [[releaseClaim]] is the
  * operator recovery (only safe once the claimant is known dead).
  *
  * Replay idempotence: per-batch markers (see [[appendWriter]]).
  * Manifests are metadata-sized parquet (one row per file) and the
  * commit path never collects them — the union is a frame-level append;
  * only [[read]] materializes a path list, to plan the snapshot scan. */
object SnapshotStore {

  private def claimFor(tableDir: String, n: Long) =
    new Path(s"$tableDir/manifest/v$n.claim")
  private def markerFor(tableDir: String, n: Long) =
    new Path(s"$tableDir/manifest/v$n.commit")

  /** Intra-JVM claim serialization per table — Hadoop's local-filesystem
    * `create(overwrite=false)` is check-then-act, not atomic (the same
    * reason Delta's LocalLogStore holds a JVM lock for file:// URIs);
    * cross-process exclusion on real stores comes from the claim file's
    * atomic exclusive create. For file:// the claim create itself goes
    * through NIO `CREATE_NEW` (O_CREAT|O_EXCL — see [[tryClaim]]), so
    * cross-PROCESS exclusion holds on local disks too; the r13
    * two-process drive (SnapshotProcessSpec) exercises exactly that. */
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(tableDir: String): Object =
    jvmLocks.computeIfAbsent(fileKey(tableDir), _ => new Object)

  private def readSmall(fs: FileSystem, p: Path): Option[String] =
    try {
      val len = fs.getFileStatus(p).getLen
      val bytes = new Array[Byte](math.min(len, 4096L).toInt)
      val in = fs.open(p)
      try in.readFully(bytes) finally in.close()
      Some(new String(bytes, StandardCharsets.UTF_8))
    } catch { case _: java.io.IOException => None }

  private def tryClaim(fs: FileSystem, tableDir: String, n: Long,
      token: String): Boolean = lockFor(tableDir).synchronized {
    // a committed version can never be re-claimed even if its claim
    // file were cleaned up — the marker check closes that door
    val claim = claimFor(tableDir, n)
    if (fs.exists(claim) || fs.exists(markerFor(tableDir, n)))
      false
    else try {
      if ("file" == fs.getScheme) {
        // Hadoop's local create(overwrite=false) is exists-then-open —
        // two PROCESSES can slip through the window. NIO CREATE_NEW is
        // one O_CREAT|O_EXCL syscall: the create IS the CAS. The token
        // lands in the same call; a racer's readSmall between create
        // and content visibility sees a non-matching token and treats
        // the claim as foreign, which is the safe direction.
        val local = java.nio.file.Paths.get(claim.toUri.getPath)
        java.nio.file.Files.createDirectories(local.getParent)
        java.nio.file.Files.write(local,
          token.getBytes(StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
      } else {
        // object stores / HDFS: exclusive create is atomic server-side
        val out = fs.create(claim, false)
        try out.write(token.getBytes(StandardCharsets.UTF_8))
        finally out.close()
      }
      true
    } catch { case _: java.io.IOException => false } // lost a cross-process race
  }

  /** The one commit path every verb goes through: claim
    * `newest committed + 1`, rebuild the manifest FROM THE POST-CLAIM
    * BASE (re-reading under the claim is what makes a racing append
    * visible to a compaction that started earlier), write it, seal with
    * the `.commit` marker. Returns the committed version.
    *
    * `build(baseManifest, n)` runs while the claim is held — writers
    * serialize through it, which IS the consistency contract: work ∝
    * the verb's own data, and a lost update is structurally impossible
    * because no two writers ever hold the same claim. A claim already
    * held by `token` (this writer's own crashed attempt — e.g. a
    * replayed streaming batch) is resumed, not awaited. */
  private[graft] def commitVersion(spark: SparkSession, tableDir: String,
      op: String, token: String, waitMs: Long = 600000L)(
      build: (Option[DataFrame], Long) => DataFrame): Long = {
    val fs = new Path(tableDir).getFileSystem(spark.sessionState.newHadoopConf())
    val deadline = System.nanoTime() + waitMs * 1000000L
    while (true) {
      val base = newestVersion(fs, tableDir).getOrElse(0L)
      val n = base + 1
      // own the claim either freshly, or by resuming this writer's own
      // crashed attempt (same token — e.g. a replayed streaming batch)
      val owned = tryClaim(fs, tableDir, n, token) ||
        readSmall(fs, claimFor(tableDir, n)).contains(token)
      if (owned) {
        if (fs.exists(markerFor(tableDir, n)))
          return n // our own crashed attempt had already sealed n
        val rows = build(manifest(spark, tableDir, Some(base)), n)
        rows.write.mode("overwrite").parquet(s"$tableDir/manifest/v$n")
        val out = fs.create(markerFor(tableDir, n), true)
        try out.write(op.getBytes(StandardCharsets.UTF_8)) finally out.close()
        return n
      }
      if (!fs.exists(markerFor(tableDir, n))) {
        // foreign claim still uncommitted: wait for its seal (which
        // advances newest) or time out naming the orphan
        if (System.nanoTime() > deadline) {
          val owner = readSmall(fs, claimFor(tableDir, n)).getOrElse("?")
          // a claim held across a full maintenance Spark job is SLOW,
          // not dead — only a claim older than the staleness threshold
          // earns the releaseClaim suggestion (releasing a live writer's
          // claim is exactly the double-commit the CAS prevents)
          val ageMs = try {
            System.currentTimeMillis() -
              fs.getFileStatus(claimFor(tableDir, n)).getModificationTime
          } catch { case _: java.io.IOException => -1L }
          val staleMs = 15 * 60 * 1000L
          val hint =
            if (ageMs >= 0 && ageMs < staleMs)
              f"the claim is only ${ageMs / 1000.0}%.0fs old — likely a live " +
                "writer mid-job; retry with a larger waitMs, do NOT releaseClaim"
            else if (ageMs >= staleMs)
              f"the claim is ${ageMs / 1000.0}%.0fs old (> ${staleMs / 1000}s " +
                s"staleness threshold) — if that writer is confirmed dead, " +
                s"SnapshotStore.releaseClaim($n) recovers"
            else s"claim age unreadable — verify the claimant before " +
              s"SnapshotStore.releaseClaim($n)"
          sys.error(s"SnapshotStore '$op' commit timed out after ${waitMs}ms " +
            s"waiting on $tableDir/manifest/v$n.claim (owner '$owner'); $hint")
        }
        Thread.sleep(25)
      } // marker appeared: loop — newest advanced, re-claim n+1
    }
    throw new IllegalStateException("unreachable")
  }

  /** Operator recovery for a crashed writer's orphaned claim: remove
    * `manifest/v<version>.claim` so the version number can be claimed
    * again. REFUSES committed versions. Only safe once the original
    * claimant is known dead — releasing a live writer's claim lets a
    * second writer corrupt that version. */
  def releaseClaim(spark: SparkSession, tableDir: String, version: Long): Boolean = {
    val fs = new Path(tableDir).getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.exists(markerFor(tableDir, version)),
      s"v$version is committed — a committed version's claim is never released")
    fs.delete(claimFor(tableDir, version), false)
  }

  /** The foreachBatch function: commit each arriving micro-batch as a
    * new snapshot version under `tableDir`.
    * {{{
    * docsStream.writeStream
    *   .foreachBatch(SnapshotStore.appendWriter(dir)).start()
    * }}}
    *
    * Versions are monotone (claimed as `newest committed + 1`) and the
    * chain base is the GLOBAL newest manifest, so appends interleave
    * correctly with the maintenance verbs: a batch arriving after a
    * [[deleteWhere]] or [[compact]] chains from the post-maintenance
    * file list — deleted files can never resurrect through the
    * streaming lineage.
    *
    * Replay idempotence is two-layered. A per-batch marker
    * (`manifest/b<id>.done`, written AFTER the commit) makes a retry of
    * a fully committed batch a no-op. A retry after a crash between the
    * commit and the marker finds its own files listed in SOME committed
    * manifest and ADOPTS that commit (writes only the marker). The
    * adoption scan covers EVERY committed version, not just the newest:
    * a concurrent compact/merge/delete sealing after the crashed append
    * rewrites the batch's files into `data/d*`, so the newest manifest
    * no longer lists `data/b<id>` — a newest-only check would re-commit
    * the batch (duplicate rows) AND `mode("overwrite")` on `data/b<id>`
    * would regenerate part-file names, orphaning the sealed version's
    * manifest for pinned readers. The all-versions scan only runs when
    * `data/b<id>` already exists (a crashed attempt); a fresh batch
    * pays one `exists` probe. Caveat: [[vacuum]]ing the batch's version
    * away during the replay gap destroys the adoption evidence — retain
    * at least the replay horizon, the same retention contract Delta's
    * txn table has. A retry after a crash BEFORE the commit sealed
    * resumes its own claim (token `b<id>`) and rewrites data + manifest
    * from scratch — safe precisely because an unsealed version has no
    * readers (versions exist only once their `.commit` marker does). */
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
        val adopted = fs.exists(new Path(s"$tableDir/data/b$batchId")) && {
          val committed = versionsOf(fs, tableDir)
          committed.nonEmpty &&
            spark.read.parquet(
                committed.map(v => s"$tableDir/manifest/v$v"): _*)
              .as[String].collect().exists(isOwn)
        }
        if (!adopted) {
          commitVersion(spark, tableDir, op = "append", token = s"b$batchId") {
            (prevOpt, _) =>
              batch.write.mode("overwrite").parquet(s"$tableDir/data/b$batchId")
              val mine = HadoopIO.listFiles(s"$tableDir/data/b$batchId", conf)
                .map(_.getPath.toString).filter(_.endsWith(".parquet"))
              prevOpt.getOrElse(Seq.empty[String].toDF("path"))
                .unionByName(mine.toDF("path"))
          }
        } // else: adopt the prior attempt's sealed commit as-is
        fs.create(marker, true).close()
      }
  }

  /** Committed manifest versions under `tableDir`, ascending — a
    * version EXISTS iff its `v<n>.commit` marker does; claims, partial
    * manifests, and `b<id>.done` markers are invisible. ONE definition
    * of the naming scheme shared by every reader and verb. */
  private def versionsOf(fs: FileSystem, tableDir: String): Seq[Long] = {
    val dir = new Path(s"$tableDir/manifest")
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".commit"))
      .flatMap(n => scala.util.Try(
        n.stripPrefix("v").stripSuffix(".commit").toLong).toOption)
      .sorted
  }

  private def newestVersion(fs: FileSystem,
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

  /** Incremental consumption: the rows of files added strictly AFTER
    * `fromVersion` up to `toVersion` (default: newest), planned from the
    * MANIFEST DIFF — an anti-join of two metadata-sized path lists — so
    * the scan reads only the delta's files, never the base table. This
    * is the downstream-consumer shape (a nightly index merge, a CDC
    * feed): work ∝ appended data regardless of table size. None when
    * the versions coincide or don't exist.
    *
    * The default includes MAINTENANCE REWRITES: a file rewritten by
    * [[deleteWhere]]/[[merge]]/[[compact]] is "added" in the diff, so
    * its SURVIVING rows reappear (and after a compact, the whole
    * table does) — correct for consumers that re-derive state per file,
    * wrong for exactly-once append consumers. Those pass
    * `appendsOnly = true`, which keeps only files from append commits
    * (`data/b*` batch directories): each appended row is then seen
    * exactly once across successive changes() calls, and rewrites are
    * invisible (deletes must reach such consumers out of band). */
  def changes(spark: SparkSession, tableDir: String, fromVersion: Long,
      toVersion: Option[Long] = None,
      appendsOnly: Boolean = false): Option[DataFrame] = {
    import spark.implicits._
    val appendPrefix = fileKey(s"$tableDir/data") + "/b"
    for {
      to <- manifest(spark, tableDir, toVersion)
      from <- manifest(spark, tableDir, Some(fromVersion))
      added = to.join(from, Seq("path"), "left_anti")
        .as[String].collect().toSeq
        .filter(p => !appendsOnly || fileKey(p).startsWith(appendPrefix))
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
    * operation, n_files, n_bytes). The operation label is the commit
    * marker's content (append/delete/merge/compact), so the audit table
    * reads like a real lake format's history. Sizes come from the
    * manifests plus ONE recursive listing of the data tree (keyed by
    * normalized path; a manifest entry whose file was vacuumed away
    * counts 0 bytes). Metadata-sized work at any table size: manifests
    * are file lists and the data tree holds one entry per live file. */
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
      val op = readSmall(fs, markerFor(tableDir, v))
        .filter(_.nonEmpty).getOrElse("unknown")
      val paths = spark.read.parquet(s"$tableDir/manifest/v$v")
        .as[String].collect()
      (v, op, paths.length.toLong,
        paths.map(p => sizes.getOrElse(fileKey(p), 0L)).sum)
    }.toDF("version", "operation", "n_files", "n_bytes")
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
    * touched-file list), committing untouched files ∪ rewritten files
    * as the next version. Untouched files keep their paths — at 100 TB
    * a selective delete rewrites a handful of files, never the table,
    * and every previous version still reads its original bytes (time
    * travel over deletes). Returns (committed version, files
    * rewritten); the version is claimed by the commit protocol, so a
    * delete can race the ingest stream. */
  def deleteWhere(spark: SparkSession, tableDir: String,
      predicate: org.apache.spark.sql.Column): (Long, Int) = {
    import spark.implicits._
    var rewritten = 0
    val v = commitVersion(spark, tableDir, op = "delete",
        token = s"delete-${java.util.UUID.randomUUID()}") { (prevOpt, n) =>
      val m = prevOpt.getOrElse(
        sys.error(s"deleteWhere: no committed manifest under $tableDir"))
      val paths = m.as[String].collect().toSeq
      // mergeSchema everywhere a maintenance verb reads data files:
      // after a mid-stream column addition, schema inference from one
      // arbitrary file could DROP the evolved column from the rewritten
      // files (or fail to resolve a predicate on it)
      val touched = spark.read.option("mergeSchema", "true").parquet(paths: _*)
        .filter(predicate)
        .select(org.apache.spark.sql.functions.input_file_name().as("f"))
        .distinct().as[String].collect().map(fileKey).toSet
      if (touched.isEmpty) { rewritten = 0; m }
      else {
        val (rewrite, keep) = paths.partition(p => touched(fileKey(p)))
        // SQL DELETE semantics: a NULL-evaluating predicate KEEPS the
        // row — a bare !predicate would be NULL too and silently drop
        // it (and inconsistently: the same row in an untouched file
        // would survive)
        spark.read.option("mergeSchema", "true").parquet(rewrite: _*)
          .filter(!org.apache.spark.sql.functions.coalesce(predicate,
            org.apache.spark.sql.functions.lit(false)))
          .write.mode("overwrite").parquet(s"$tableDir/data/d$n")
        val conf = HadoopIO.sessionConf(spark)
        val fresh = HadoopIO.listFiles(s"$tableDir/data/d$n", conf)
          .map(_.getPath.toString).filter(_.endsWith(".parquet"))
        rewritten = rewrite.size
        (keep ++ fresh).toDF("path")
      }
    }
    (v, rewritten)
  }

  /** MERGE (upsert) as ONE commit: rows of `changes` replace same-`key`
    * rows of the newest snapshot, new keys append. Match-containing
    * files are found in one `input_file_name` scan and rewritten minus
    * the matched keys (broadcast semi-join against the delta-sized key
    * set); the changes land as fresh files; the new manifest lists
    * untouched ∪ rewritten ∪ changes — so there is no intermediate
    * version where the old rows are gone but the new ones not yet
    * visible. Work ∝ touched files + delta, never table size. Version
    * claimed by the commit protocol (can race the stream). Returns
    * (committed version, files rewritten). */
  def merge(spark: SparkSession, tableDir: String, changes: DataFrame,
      key: String): (Long, Int) = {
    import org.apache.spark.sql.functions.{broadcast, col, input_file_name}
    import spark.implicits._
    var rewritten = 0
    val v = commitVersion(spark, tableDir, op = "merge",
        token = s"merge-${java.util.UUID.randomUUID()}") { (prevOpt, n) =>
      val m = prevOpt.getOrElse(
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
          .write.mode("overwrite").parquet(s"$tableDir/data/m$n")
      changes.write.mode("overwrite").parquet(s"$tableDir/data/u$n")
      val conf = HadoopIO.sessionConf(spark)
      def fresh(sub: String): Seq[String] =
        HadoopIO.listFiles(s"$tableDir/data/$sub", conf)
          .map(_.getPath.toString).filter(_.endsWith(".parquet"))
      val rewrote = if (rewrite.nonEmpty) fresh(s"m$n") else Nil
      rewritten = rewrite.size
      (keep ++ rewrote ++ fresh(s"u$n")).toDF("path")
    }
    (v, rewritten)
  }

  /** VACUUM: physically delete data files referenced ONLY by manifests
    * older than `retainFrom`, then drop those manifests (and their
    * claim/commit markers) — the bounded price of time travel (versions
    * ≥ retainFrom stay byte-identical; older versions become
    * unreadable). The reachability set is a union of the retained
    * manifests — metadata-sized at any table size. Returns the number
    * of files deleted. Vacuum commits no version and deletes only
    * files UNREACHABLE from every retained manifest, so it is safe
    * alongside writers (their commits chain from retained manifests);
    * run ONE vacuum at a time. */
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
      fs.delete(markerFor(tableDir, v), false)
      fs.delete(claimFor(tableDir, v), false)
    }
    deadPaths.length
  }

  /** OPTIMIZE / compaction: rewrite the newest snapshot's files into
    * `targetFiles` larger ones and commit a version listing only the
    * compacted set — row content identical (the spec pins it), previous
    * versions untouched and still readable. Run on the
    * q_compaction_plan schedule. The base snapshot is re-read UNDER the
    * claim, so a compaction racing the ingest stream compacts exactly
    * the predecessor version's rows — an append landing first is
    * included, one landing after chains from the compacted manifest;
    * either way nothing is lost. Returns the committed version. */
  def compact(spark: SparkSession, tableDir: String,
      targetFiles: Int): Long = {
    import spark.implicits._
    commitVersion(spark, tableDir, op = "compact",
        token = s"compact-${java.util.UUID.randomUUID()}") { (prevOpt, n) =>
      val m = prevOpt.getOrElse(
        sys.error(s"compact: no committed manifest under $tableDir"))
      val paths = m.as[String].collect().toSeq
      spark.read.option("mergeSchema", "true").parquet(paths: _*)
        .repartition(targetFiles)
        .write.mode("overwrite").parquet(s"$tableDir/data/d$n")
      val conf = HadoopIO.sessionConf(spark)
      HadoopIO.listFiles(s"$tableDir/data/d$n", conf)
        .map(_.getPath.toString).filter(_.endsWith(".parquet"))
        .toDF("path")
    }
  }
}
