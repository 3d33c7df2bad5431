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

  /** Working columns both joins stage on the inputs — a public facade
    * over arbitrary frames must refuse inputs that already carry them
    * (a silent collision would corrupt the join resolution). */
  private val Reserved = Seq("__salt", "__n", "__factor")

  private def requireNoReserved(df: DataFrame, side: String): Unit = {
    val hit = df.columns.filter(Reserved.contains)
    require(hit.isEmpty,
      s"$side input already carries reserved column(s) ${hit.mkString(", ")}" +
        s" — rename them before salting (reserved: ${Reserved.mkString(", ")})")
  }

  /** Inner equi-join `big ⋈ small` on `key`, salted `salts` ways.
    * `bigUnique` must be any column of `big` that varies within a key
    * group (a row id, event id, line number …) — the salt is derived from
    * it deterministically, so runs are reproducible. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      bigUnique: String, salts: Int): DataFrame = {
    requireNoReserved(big, "big"); requireNoReserved(small, "small")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(bigUnique)), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** CENSUS-DRIVEN salting — measure, then salt ONLY what needs it
    * (the q_key_skew planner folded into the join). A uniform salt
    * multiplies the WHOLE small side by S; here the hot-key list
    * (big-side count > hotThreshold) is derived in-plan, each hot key
    * gets its own factor ceil(count / hotThreshold) capped at
    * `maxSalts`, and cold keys — virtually all of them — join with
    * factor 1, i.e. completely unsalted. The hot list is tiny by
    * construction (≤ bigRows/hotThreshold entries) and broadcasts to
    * both sides; small-side replication cost is Σ hot factors instead
    * of S × |small|. At 100 TB the census agg is one map-side-combined
    * count over big's keys — the measurement IS the plan's first
    * stage; reuse a persisted census if the key distribution is known
    * stable. Results are identical to the plain inner join
    * (SaltingSpec law). */
  def adaptiveSaltedJoin(big: DataFrame, small: DataFrame, key: String,
      bigUnique: String, hotThreshold: Long,
      maxSalts: Int = 64): DataFrame = {
    require(hotThreshold > 0, s"hotThreshold must be positive: $hotThreshold")
    require(maxSalts > 0, s"maxSalts must be positive: $maxSalts")
    requireNoReserved(big, "big"); requireNoReserved(small, "small")
    val hot = big.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold)
      .select(col(key), least(
        expr(s"CAST((__n + $hotThreshold - 1) DIV $hotThreshold AS INT)"),
        lit(maxSalts)).as("__factor"))
    val bigSalted = big.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt", pmod(xxhash64(col(bigUnique)),
        coalesce(col("__factor"), lit(1))).cast("int"))
      .drop("__factor")
    val smallSalted = small.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt",
        explode(sequence(lit(0), coalesce(col("__factor"), lit(1)) - 1)))
      .drop("__factor")
    bigSalted.join(smallSalted, Seq(key, "__salt")).drop("__salt")
  }
}
