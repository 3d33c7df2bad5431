package graft

import org.apache.spark.sql.functions._

/** Engine-side valsort: the order-DEPENDENT half of the reference's
  * validation (`src/scripts/valsort/validate.py`) — per-partition
  * sortedness plus cross-partition boundary ordering over a
  * range-partitioned sort, exactly how valsort validates each output
  * partition then merges per-node summaries. */
class SortOpsSpec extends SparkSpec {
  import spark.implicits._

  test("range-partitioned sort is globally ordered (valsort semantics)") {
    val sorted = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"))
      .repartitionByRange(4, col("l_orderkey"), col("l_linenumber"))
      .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"))

    // per-partition summary: (partitionId, min, max, sorted?, count)
    val summaries = sorted.mapPartitions { it =>
      var pmin: (Long, Int) = null; var pmax: (Long, Int) = null
      var prev: (Long, Int) = null; var ok = true; var n = 0L
      while (it.hasNext) {
        val r = it.next()
        val k = (r.getLong(0), r.getInt(1))
        if (prev != null && Ordering[(Long, Int)].gt(prev, k)) ok = false
        if (pmin == null) pmin = k
        pmax = k; prev = k; n += 1
      }
      if (n == 0) Iterator.empty
      else Iterator.single((org.apache.spark.TaskContext.getPartitionId(),
        pmin, pmax, ok, n))
    }.collect().sortBy(_._1)

    assert(summaries.forall(_._4), "every partition internally sorted")
    // cross-partition boundaries: max(p) <= min(p+1)
    summaries.sliding(2).foreach {
      case Array(a, b) =>
        assert(Ordering[(Long, Int)].lteq(a._3, b._2),
          s"partition boundary violation: ${a._3} > ${b._2}")
      case _ =>
    }
    val total = summaries.map(_._5).sum
    assert(total === graft.core.Tables.lineitem(spark, sfDir).count())
  }

  test("gensort analog generates the requested record count") {
    val row = graft.queries.SortOps.gensortChecksum(spark, sfDir).collect().head
    val n = graft.core.Tables.lineitem(spark, sfDir).count()
    assert(row.getLong(0) === n)
    assert(row.getString(2) < row.getString(3), "min_key < max_key")
  }

  test("zone skip: z-order prunes at least as well as the linear layout") {
    val rows = graft.queries.SortOps.zoneSkip(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val (lnZones, lnRead, lnRows, lnTotal) = rows("linear")
    val (zZones, zRead, zRows, zTotal) = rows("zorder")
    // same points zoned two ways: totals must agree, every zone census
    // is internally consistent, and the interleaved curve can only help
    // a 2-D box predicate — the linear layout's y-blindness is the point
    assert(lnTotal == zTotal)
    assert(lnRead <= lnZones && zRead <= zZones)
    assert(zRows <= lnRows,
      s"z-order read $zRows rows where linear read $lnRows")
    assert(zRows < zTotal, "the box predicate must actually skip something")
  }
}
