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
  * derived structure's size, never the corpus's. */
object LoopWidth {
  def scoped[T](df: DataFrame, width: Int = 8)(body: => T): T = {
    val conf = df.sparkSession.conf
    val key = "spark.sql.shuffle.partitions"
    val prev = conf.get(key)
    conf.set(key, width.toString)
    try body finally conf.set(key, prev)
  }
}
