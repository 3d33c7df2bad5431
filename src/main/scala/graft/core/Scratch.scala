package graft.core

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Run-unique scratch directories for queries that must materialize files
  * at construction time (text-line / CSV / partitioned-sink round-trips).
  *
  * One shared implementation: the path embeds a tag + the dataset-dir hash
  * (diagnosability) + a random suffix (two concurrent runs over the same
  * dataset can never collide), and every allocated directory is removed by
  * a JVM shutdown hook so repeated gate/spec runs don't accumulate
  * data-sized garbage under java.io.tmpdir.
  */
object Scratch {
  private val allocated = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  sys.addShutdownHook {
    allocated.forEach { p =>
      // per-directory isolation: one undeletable file (permissions, a
      // still-open handle) must not abort cleanup of the REST of the queue
      try {
        if (Files.exists(p)) {
          val walk = Files.walk(p)
          try walk.sorted(Comparator.reverseOrder[Path]())
            .forEach(f => Files.deleteIfExists(f))
          finally walk.close()
        }
      } catch { case _: Exception => () }
    }
  }

  /** A fresh scratch path (not yet created — writers mkdir themselves),
    * registered for deletion at JVM exit. */
  def dir(tag: String, datasetDir: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_${tag}_${Integer.toHexString(datasetDir.hashCode)}_" +
        java.util.UUID.randomUUID.toString.take(8))
    allocated.add(p)
    p.toString
  }
}
