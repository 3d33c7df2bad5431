package graft.api

import org.apache.spark.sql.DataFrame

/** The reference's batched-job pattern (`MultiJobMapper`,
  * `mapreduce/workers/mapper/MultiJobMapper.h`; SURVEY §1.2): several
  * jobs consume one input scan. Spark-native form: persist the shared
  * scan, run each job as an ordinary action against it, unpersist.
  *
  * At 100 TB this is the difference between reading the corpus once or N
  * times — the storage-level default (MEMORY_AND_DISK) degrades to disk
  * gracefully when the scan exceeds cluster memory.
  */
object MultiJob {

  /** Run every job against a single materialization of `input`. */
  def run[A](input: DataFrame)(jobs: Seq[DataFrame => A]): Seq[A] = {
    val shared = input.persist()
    try jobs.map(job => job(shared))
    finally shared.unpersist()
  }
}
