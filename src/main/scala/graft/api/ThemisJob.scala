package graft.api

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.{functions => fn}

/** The reference's job contract (SURVEY.md §2.7, §3.1) as a small builder
  * over stock Spark: a job is (input, map, partition-function, secondary
  * sort, reduce) — `job_spec_generators/utils.py:5-31` — and executes as
  *
  *   scan → flatMap(map) → partition → sortWithinPartitions(key[, sec])
  *        → flatMapSortedGroups(reduce)
  *
  * which is exactly phase 0/1/2 of the reference
  * (`mapreduce/main.cc:359-789`): the partition step is Spark's Exchange
  * (phase 1 shuffle), the in-partition sort is Tungsten (phase 2 sorter,
  * radix where applicable), spill-to-disk replaces phase 3. Chained jobs
  * (`utils.py:71-79 run_in_sequence`) are ordinary sequential calls.
  */
object ThemisJob {

  /** `run_in_sequence` parity (`job_spec_generators/utils.py:71-79`,
    * driven by `run_job.py`): run a batch of jobs in order, each stage's
    * output MATERIALIZED to its intermediate directory (parquet — the
    * engine's durable format, where the reference writes themis-kv files
    * between jobs) and the next stage constructed from the READ-BACK
    * frame, never from in-memory lineage. The materialization is the
    * point: each stage's shuffle graph stays job-local, and a failed
    * stage restarts from the last directory instead of recomputing the
    * chain — the reference's per-job recovery boundary. Returns the
    * frame read back from the final directory. Iterative pipelines
    * (PageRank's loop, `pagerank.py:16-39`) are a repeated stage:
    * `Seq.tabulate(n)(i => (mkIteration _, s"$base/iter$i"))` —
    * ThemisJobSpec runs both the wordcount→sort chain and a 2-iteration
    * PageRank through this surface. (The in-engine iterative operators —
    * Iterative.pageRank, KMeans, components — remain the fast path: they
    * checkpoint by lineage, not by parquet round-trips.) */
  def sequence(input: DataFrame,
      stages: Seq[(DataFrame => Job[Row], String)]): DataFrame =
    stages.foldLeft(input) { case (in, (mk, dir)) =>
      mk(in).run().write.mode("overwrite").parquet(dir)
      in.sparkSession.read.parquet(dir)
    }

  /** Partition-function options (`PartitionFunctionFactory.cc`):
    * range (BoundaryList), hashed-range over murmur64
    * (HashedBoundaryList), hash (Uniform), single partition, random. */
  sealed trait PartitionFn
  case class RangePartition(n: Int) extends PartitionFn
  case class HashedRangePartition(n: Int) extends PartitionFn
  case class HashPartition(n: Int) extends PartitionFn
  case object SinglePartition extends PartitionFn
  case class RandomPartition(n: Int) extends PartitionFn

  /** A map function: record → 0..n records (`MapFunction.h:42`). */
  type MapFn = Row => IterableOnce[Row]

  /** A reduce function over one sorted key group
    * (`ReduceFunction.h:36-38`): (key row, group rows) → 0..n outputs.
    * Group rows arrive ordered by the secondary sort and are re-iterable
    * (the reference's resettable two-pass iterator). */
  type ReduceFn[O] = (Row, Seq[Row]) => Iterator[O]

  case class Job[O: Encoder](
      input: DataFrame,
      mapSchema: org.apache.spark.sql.types.StructType,
      mapFn: Option[MapFn],
      keyCols: Seq[String],
      secondaryCols: Seq[String] = Nil,
      partitionFn: PartitionFn,
      reduceFn: ReduceFn[O]) {

    def run(): Dataset[O] = {
      val spark = input.sparkSession
      val mapped: DataFrame = mapFn match {
        case None => input
        case Some(f) =>
          val rowEnc = org.apache.spark.sql.Encoders.row(mapSchema)
          input.flatMap(r => f(r))(rowEnc)
      }
      val keyColumns = keyCols.map(col)
      val partitioned = partitionFn match {
        case RangePartition(n) => mapped.repartitionByRange(n, keyColumns: _*)
        case HashedRangePartition(n) =>
          // range partition over the murmur of the canonical key encoding —
          // the reference's skew-resistant HashedBoundaryListPartitionFunction.
          // Each component is length-prefixed ("len:value", NULL -> "N;") so
          // the encoding is injective: composite keys differing only by a
          // NULL or by separator-looking content cannot collide (concat_ws
          // would both skip NULLs and admit separator collisions).
          val canon = fn.concat(keyColumns.map { c =>
            val s = c.cast("string")
            fn.coalesce(fn.concat(fn.length(s).cast("string"), fn.lit(":"), s),
              fn.lit("N;"))
          }: _*)
          mapped.repartitionByRange(n, graft.functions.ThemisMurmur64(canon))
        case HashPartition(n) => mapped.repartition(n, keyColumns: _*)
        case SinglePartition => mapped.coalesce(1)
        case RandomPartition(n) => mapped.repartition(n)
      }
      SortedGroups.flatMapSortedGroupsPrePartitioned(
        partitioned, keyCols, secondaryCols)(reduceFn)
    }
  }
}
