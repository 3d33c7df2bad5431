package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Bucketed-layout facade: pay a table's join/agg shuffle ONCE at write
  * time, then every downstream query on the bucket key runs exchange-free.
  *
  * This is the same move the reference's two-phase architecture makes —
  * phase one writes each output file already partitioned by key range
  * (`mapreduce/workers/writer/Writer.cc` fed by the phase-zero boundary
  * partition function, SURVEY §3.2), so phase two sorts every partition
  * locally without ever re-shuffling — re-expressed in catalog terms:
  * `bucketBy(n, key)` records the hash layout in table metadata, and
  * Catalyst drops the Exchange on any join or aggregation whose keys the
  * layout already satisfies (q_bucketed_join pins the join form against
  * the DuckDB oracle; BucketedJoinSpec pins the plans).
  *
  * At 100 TB the arithmetic is stark: a fact table joined daily pays its
  * full-width shuffle every run unless the layout carries it — bucketing
  * converts O(queries × table) exchanged bytes into O(table) once.
  */
object Layout {

  /** Write `df` as a bucketed external catalog table and return the
    * bucketed read back. The pre-`repartition` on the bucket key is
    * load-bearing twice: every task then holds exactly one bucket's rows,
    * so the layout lands as ONE file per bucket (tasks×buckets small
    * files otherwise) and the per-file `sortBy` order covers whole
    * buckets, keeping read-side local sorts a near-no-op. Bucket counts
    * must MATCH across tables meant to co-join (Spark only drops the
    * exchange when both sides share the layout), so pick one count per
    * key domain and keep it in config, not call sites. */
  def bucketize(df: DataFrame, key: String, numBuckets: Int,
      path: String, table: String): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")
    val s = df.sparkSession
    df.repartition(numBuckets, col(key))
      .write.mode("overwrite").option("path", path)
      .bucketBy(numBuckets, key).sortBy(key)
      .saveAsTable(table)
    s.table(table)
  }
}
