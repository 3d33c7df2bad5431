package graft

/** The real-file drive at spec scale: 600 actual files on disk (every
  * format class, both size-skew plants, the corrupt fraction) read
  * back through `spark.read.format("binaryFile")` and pinned against
  * the law replay — the same `MediaDrive.run` body the 100× ritual
  * drives at 100k files (BENCH_LOCAL records those runs). run() throws
  * on ANY census drift, so the assertions here are the report's
  * invariants plus the properties a drive must demonstrate: quarantine
  * accounting, cross-format twins, and byte balance under planted
  * multi-MB payloads. */
class MediaDriveSpec extends SparkSpec {

  test("media drive: 600 real files round-trip binaryFile with law-exact censuses") {
    val base = java.nio.file.Files.createTempDirectory("graft_mds").toString
    try {
      val r = MediaDrive.run(spark, 600L, base, balParts = 8)
      assert(r.nFiles == 600L && r.checks >= 9,
        s"drive must run every check: $r")
      // quarantine accounting: ids 0, 101, ..., 505 → 6 of 600 = 10‰
      assert(r.quarantined == 6L && r.quarantinePm == 10L,
        s"quarantine accounting drifted: $r")
      // both size-skew plants landed: the giant BMP/AVI dominate
      assert(r.maxFileB > 1000000L, s"no giant payload planted: $r")
      // LPT balance (also require()d inside run): no partition holds
      // more than a fair share plus one giant
      assert(r.balMaxB <= (r.bytes / 8 + r.maxFileB) * 11 / 10,
        s"byte balance violated: $r")
      // cross-format perceptual twins exist and collide
      assert(r.crossFormatTwinFps > 0L, s"no cross-format twins: $r")
      assert(r.mbPerS > 0 && r.bytes > 5000000L, s"throughput degenerate: $r")
    } finally {
      def rm(p: java.io.File): Unit = {
        val k = p.listFiles(); if (k != null) k.foreach(rm); p.delete(); ()
      }
      rm(new java.io.File(base))
    }
  }
}
