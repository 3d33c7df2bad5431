package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seeded-random equivalence fuzz for every segmented window guard:
  * across generated event streams (skewed keys, ties, NULL keys, sparse
  * and dense timestamps), each segmented/guarded form must equal its
  * plain window form row for row. The fixed fixtures in HotGroupGuardSpec
  * pin the constructed edge cases; this spec sweeps the space around
  * them. Seeds are constants, so failures reproduce exactly. */
class SegmentedFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val Kinds = Seq("view", "click", "purchase", "error")

  /** A seeded random stream: ~600 events over a skewed key set (one key
    * takes ~40% of rows, some rows NULL-keyed), timestamps with heavy
    * ties and occasional session-sized jumps. */
  private def stream(seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val rows = Seq.tabulate(600) { i =>
      val u: java.lang.Long = rnd.nextInt(10) match {
        case 0 => null // ~10% NULL keys
        case k if k <= 4 => java.lang.Long.valueOf(1L) // hot key
        case k => java.lang.Long.valueOf(k.toLong)
      }
      val ms = rnd.nextInt(8) match {
        case 0 => (rnd.nextInt(4) * 30000000L) + rnd.nextInt(3) // jump+tie
        case _ => rnd.nextInt(2000).toLong * 1000L
      }
      (i.toLong, u, Kinds(rnd.nextInt(Kinds.length)), ms,
        BigDecimal(rnd.nextInt(10000)).setScale(2) / 100)
    }
    rows.toDF("event_id", "user_id", "event_type", "ms", "value")
      .withColumn("value", col("value").cast("decimal(12,2)"))
  }

  private def rs(df: DataFrame, sort: String*) =
    df.orderBy(sort.map(col): _*).collect().map(_.toSeq).toSeq

  for (seed <- Seq(11, 42, 77)) {
    test(s"asof segmented == window (seed $seed)") {
      val ev = stream(seed).select("event_id", "user_id", "event_type", "ms")
      assert(rs(graft.queries.Temporal.asofSegmentedOf(ev), "event_id") ===
        rs(graft.queries.Temporal.asofWindowOf(ev), "event_id"))
    }

    test(s"scd2 guarded == window (seed $seed)") {
      val ev = stream(seed).select("user_id", "event_type", "ms", "event_id")
      assert(rs(graft.queries.Temporal.scd2GuardedOf(ev, cap = 50L),
        "user_id", "version") ===
        rs(graft.queries.Temporal.scd2WindowOf(ev), "user_id", "version"))
    }

    test(s"sessionize guarded == window (seed $seed)") {
      val ev = stream(seed).select("user_id", "ms", "value")
      assert(rs(graft.queries.ThemisOps.sessionizeGuardedOf(ev, cap = 50L,
        gapMs = 10000000L), "user_id", "start_ms") ===
        rs(graft.queries.ThemisOps.sessionizeWindowOf(ev,
          gapMs = 10000000L), "user_id", "start_ms"))
    }

    test(s"funnel segmented == window (seed $seed)") {
      val ev = stream(seed).select("event_id", "user_id", "event_type", "ms")
      assert(rs(graft.queries.Temporal.funnelSegmentedOf(ev), "user_id") ===
        rs(graft.queries.Temporal.funnelStagesWindowOf(ev), "user_id"))
    }

    test(s"winsorize guarded == plain (seed $seed)") {
      val e = stream(seed).select(
        col("user_id").cast("string").as("grp"), // NULL group stays NULL
        col("event_id").as("rid"), col("value").as("v"))
      assert(rs(graft.queries.Analytics.winsorizeGuardedOf(e, cap = 50L),
        "grp") === rs(graft.queries.Analytics.winsorizeOf(e), "grp"))
    }
  }
}
