package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed equi-joins — the engine-level answer to
  * record-level skew, complementing the reference's hashed-range
  * partitioning (`HashedBoundaryListPartitionFunction.cc:9-33`, which
  * spreads skewed *ranges* but still sends every copy of one hot key to
  * one partition) and Spark AQE's runtime skew split (which only engages
  * past size thresholds).
  *
  * The big side gets a deterministic salt in [0, S); the small side is
  * replicated S times; the join key becomes (key, salt), so a hot key's
  * rows spread over S partitions instead of one straggler task. Results
  * are identical to the unsalted join (spec-checked).
  */
object Salting {

  /** Inner equi-join `big ⋈ small` on `key`, salted `salts` ways.
    * `bigUnique` must be any column of `big` that varies within a key
    * group (a row id, event id, line number …) — the salt is derived from
    * it deterministically, so runs are reproducible. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      bigUnique: String, salts: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(bigUnique)), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
