package graft.core

import org.apache.spark.sql.DataFrame

/** Shuffle-width scoping for iterative operators whose per-round state is
  * a small DERIVED structure (a duplicate graph, a BFS frontier, a peeled
  * edge list) rather than the corpus: running their per-round joins at
  * the corpus-tuned `spark.sql.shuffle.partitions` pays task-scheduling
  * overhead per round for partitions that are nearly empty. `scoped`
  * pins a width sized for the derived structure for the duration of the
  * loop BODY (which must materialize its rounds eagerly — checkpoints/
  * actions inside the scope plan at the scoped width) and restores the
  * session width before returning, so lazy plans the caller builds
  * afterwards re-plan at the session width at action time.
  *
  * At 100 TB the same rule holds with a bigger constant: width ∝ the
  * derived structure's size, never the corpus's.
  *
  * CONCURRENCY CONTRACT: the width is set on the session's SQLConf, so
  * it applies to EVERY plan that reaches an action on this SparkSession
  * while the body runs — `scoped` assumes the single-threaded-driver
  * model the queries()/Verify/Bench harness uses (one query at a time
  * per session). A multi-threaded driver sharing one session must
  * instead give the loop its own `spark.newSession()` (isolated SQLConf
  * over the same shared state and cache) and run `scoped` there, so a
  * corpus-sized plan on another thread can never plan its shuffles at
  * the loop's narrow width. Corpus-sized subtrees inside the loop body
  * itself must be materialized (persist + action) BEFORE entering the
  * scope for the same reason. */
object LoopWidth {
  def scoped[T](df: DataFrame, width: Int = 8)(body: => T): T = {
    val conf = df.sparkSession.conf
    val key = "spark.sql.shuffle.partitions"
    val aqeKey = "spark.sql.adaptive.enabled"
    val prev = conf.get(key)
    val prevAqe = conf.get(aqeKey, "true")
    conf.set(key, width.toString)
    // AQE exists to size UNKNOWN shuffles at runtime; inside a scoped
    // loop the width was just derived from a MATERIALIZED count, so
    // there is nothing left for it to decide — but it still charges
    // per-round overhead (stage-by-stage submission barriers and
    // re-optimization on every tiny query stage). Measured on the
    // iterative family at sf0.1: q_pagerank 4.27 -> 1.80 s, q_sssp
    // 2.30 -> 1.03 s with AQE off. The toggle is loop-scoped and
    // restores on exit, so corpus-sized plans outside the loop keep
    // AQE's coalescing/skew handling at every scale.
    conf.set(aqeKey, "false")
    try body finally {
      conf.set(key, prev)
      conf.set(aqeKey, prevAqe)
    }
  }

  /** Session shuffle width — the corpus-tuned ceiling every derived
    * width is clamped to (at production scale the size-driven term
    * exceeds it, so the adaptive rules below reduce to today's
    * session-width behavior and only ever NARROW tiny-structure loops). */
  private def sessionWidth(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt

  /** Loop width from a MATERIALIZED row count (the caller already paid a
    * count() to pin its cached edge list): one partition per
    * `rowsPerPartition` rows of per-round state, clamped to [1, session
    * width]. The target trades the measured ~0.1–0.3 s fixed cost a task
    * pays at any size (task-binary deserialization, codegen wait,
    * shuffle-file creation) against ≥ that much real work per task —
    * 256k narrow rows is ~0.1–0.5 s of join+agg. A 32-wide round over a
    * few-hundred-edge dup graph pays 32 fixed costs per round for
    * microseconds of work; the same rule at a 10^9-edge graph clamps to
    * the session width and changes nothing. */
  def forRows(df: DataFrame, rows: Long, rowsPerPartition: Long = 1L << 18): Int = {
    require(rows >= 0 && rowsPerPartition > 0)
    val need = (rows + rowsPerPartition - 1) / rowsPerPartition
    math.max(1L, math.min(need, sessionWidth(df).toLong)).toInt
  }

  /** Loop width from the ANCHOR TABLE's on-disk bytes (driver-side file
    * listing, no job — the same size-derivation the scan planner itself
    * uses): one partition per `bytesPerPartition` of anchor input,
    * clamped to [1, session width]. Derived loop structures (edge lists,
    * frontiers, label tables) are bounded by a projection of their
    * anchor, so anchor bytes is a safe over-estimate; 4 MB of compressed
    * anchor input is roughly the 256k-row target of [[forRows]]. */
  def forBytes(df: DataFrame, anchorBytes: Long, bytesPerPartition: Long = 4L << 20): Int = {
    require(anchorBytes >= 0 && bytesPerPartition > 0)
    val need = (anchorBytes + bytesPerPartition - 1) / bytesPerPartition
    math.max(1L, math.min(need, sessionWidth(df).toLong)).toInt
  }
}
