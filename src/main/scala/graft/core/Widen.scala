package graft.core

import org.apache.spark.sql.DataFrame

/** Scan widening for CPU-heavy per-row kernels over SMALL file scans.
  *
  * A parquet scan's task count is bytes/maxPartitionBytes, and a single
  * row group cannot be split — so a sub-split-size table (documents is
  * 594 KB at sf0.1) scans as ONE task, and every tokenize/hash/explode
  * projection above it runs 1-wide no matter how many cores the session
  * has (`spark.sql.files.minPartitionNum` cannot help: splitting below a
  * row group yields empty partitions, not spread rows). For kernels that
  * cost orders of magnitude more CPU than the scan itself (per-doc
  * tokenization ~5 s/MB, n-gram explosion, codec work), the fix is one
  * cheap round-robin exchange of the raw rows before the kernel.
  *
  * Scale discipline (guide §2.2/§6): the exchange exists ONLY while the
  * scan is narrower than the kernel-derived width. `need` is computed
  * from on-disk bytes (driver-side listing via [[Tables.tableBytes]], no
  * job) at `bytesPerPartition` of input per task — sized so a task
  * carries ≥~100 ms of kernel work — clamped to the session width. The
  * scan's own width is bytes/maxPartitionBytes; once the table is big
  * enough that the scan planner already yields `need` partitions
  * (anything past a few hundred MB), [[forKernel]] returns the input
  * UNCHANGED — no exchange node in the 100 TB plan, where the corpus
  * bytes dwarf any repartition benefit. */
object Widen {
  /** Widen `df` (a projection over a scan totalling `tableBytes` on
    * disk) to a kernel-appropriate width, iff the scan is narrower. */
  def forKernel(df: DataFrame, tableBytes: Long,
      bytesPerPartition: Long = 32L << 10): DataFrame = {
    val conf = df.sparkSession.conf
    val session = conf.get("spark.sql.shuffle.partitions").toInt
    val maxSplit = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val scanParts = math.max(1L, (tableBytes + maxSplit - 1) / maxSplit)
    val need = math.max(1L,
      math.min((tableBytes + bytesPerPartition - 1) / bytesPerPartition,
        session.toLong))
    if (scanParts >= need) df else df.repartition(need.toInt)
  }
}
