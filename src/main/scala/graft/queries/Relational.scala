package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{GQuery, Tables}
import Qdsl._

/** Relational operator suite over the TPC-H-ish testdata: scan + filter +
  * project + hash/broadcast join + semi join + aggregate + window + set ops
  * + global sort + top-k. Each query is declarative DataFrame code so
  * Catalyst gets predicate pushdown / column pruning / join selection for
  * free; `BenchSpec` asserts the interesting plan shapes.
  *
  * Reference capabilities covered (SURVEY.md §2): SumValuesReduceFunction
  * (q1/q16), GrepMapFunction-style selective filters (q6), sort operator
  * (q_sort_global — phase 1/2 range-partition + sort), top-k (absent in the
  * reference, free in Spark), joins (reference fakes them via tagged-union
  * shuffles, see §2.7 — here they are real joins).
  */
object Relational {

  /** TPC-H Q1-style pricing summary: the canonical groupBy-sum over the
    * largest table. Partial (map-side) aggregation makes this one narrow
    * shuffle of ~6 groups regardless of input scale. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumDec(col("l_quantity")).as("sum_qty"),
        sumDec(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("sum_disc_price"),
        sum((discPrice(col("l_extendedprice"), col("l_discount")) *
          onePlus(col("l_tax"))).cast("decimal(27,6)"))
          .cast("double").as("sum_charge"),
        avgDec(col("l_quantity")).as("avg_qty"),
        avgDec(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))

  // Oracle decimal→double discipline: DuckDB's CAST(DECIMAL AS DOUBLE)
  // double-rounds (int128→double, then ÷10^scale), so once a sum's
  // unscaled value crosses 2^53 it can sit 1 ULP off Spark's correctly
  // rounded BigDecimal→double (q1's sum_charge crossed at 10× sf0.1).
  // The VARCHAR hop routes DuckDB through its correctly rounded string
  // parse, making both engines bit-identical at ANY scale. Applies to
  // every decimal-SUM cast below; per-row casts never cross 2^53.
  private val pricingSummarySql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(14,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(14,4)) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2))) AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / CAST(COUNT(l_extendedprice) AS DOUBLE) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6-style forecast revenue: a highly selective scan whose three
    * predicates must all reach the parquet reader as pushed filters. */
  def selectiveRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum((dec("l_extendedprice") * dec("l_discount")).cast("decimal(25,4)"))
        .cast("double").as("revenue"))

  private val selectiveRevenueSql =
    """SELECT CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(25,4))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q3-style shipping priority: broadcast(customer-filter) ⋈ orders
    * ⋈ lineitem, aggregate, top-10. The customer side is small after the
    * segment filter, so Catalyst broadcasts it; the top-k is a
    * TakeOrderedAndProject (no global sort materialization). */
  def topkOrders(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") < to_timestamp(lit("1999-01-01")))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .select(col("l_orderkey"), epochMs(col("o_orderdate")).as("o_date_ms"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val topkOrdersSql =
    """SELECT l_orderkey, epoch_ms(o_orderdate) AS o_date_ms,
      |  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(14,4))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1999-01-01'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q4-style order-priority count: left-semi join (EXISTS) against
    * lineitem with a non-equi residual condition. */
  def orderPriority(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1997-07-01")))
    val l = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  private val orderPrioritySql =
    """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority""".stripMargin

  /** TPC-H Q5-style local-supplier revenue: five-way join where every
    * dimension (supplier/customer/nation/region) broadcasts and only
    * lineitem⋈orders shuffles. */
  def nationRevenue(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
  }

  private val nationRevenueSql =
    """SELECT n_name,
      |  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(14,4))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
      |  AND n_regionkey = r_regionkey AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name""".stripMargin

  /** Per-brand part statistics: multi-aggregate with distinct count. */
  def partStats(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_parts"),
        countDistinct(col("p_type")).as("n_types"),
        min(col("p_retailprice")).as("min_price"),
        max(col("p_retailprice")).as("max_price"),
        avgDec(col("p_retailprice")).as("avg_price"),
        sum(col("p_size").cast("long")).as("sum_size"))

  private val partStatsSql =
    """SELECT p_brand, COUNT(*) AS n_parts, COUNT(DISTINCT p_type) AS n_types,
      |  MIN(p_retailprice) AS min_price, MAX(p_retailprice) AS max_price,
      |  CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / CAST(COUNT(p_retailprice) AS DOUBLE) AS avg_price,
      |  CAST(SUM(CAST(p_size AS BIGINT)) AS BIGINT) AS sum_size
      |FROM part GROUP BY p_brand""".stripMargin

  /** Window top-3 orders per customer by totalprice (row_number with a
    * unique tie-break, so fully deterministic). */
  def windowTop3(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
  }

  private val windowTop3Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t WHERE rn <= 3""".stripMargin

  /** Set operations: customers active in both 1996 and 1997 (INTERSECT)
    * and customers active in 1996 only (EXCEPT), tagged and unioned. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    def active(year: Int) = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit(f"$year-01-01")) &&
        col("o_orderdate") < to_timestamp(lit(f"${year + 1}-01-01")))
      .select(col("o_custkey"))
    val both = active(1996).intersect(active(1997))
      .select(lit("both").as("tag"), col("o_custkey"))
    val only96 = active(1996).except(active(1997))
      .select(lit("only96").as("tag"), col("o_custkey"))
    both.union(only96)
  }

  private val setOpsSql =
    """WITH a96 AS (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
      |     a97 AS (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
      |SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM a96 INTERSECT SELECT o_custkey FROM a97) t1
      |UNION ALL
      |SELECT 'only96' AS tag, o_custkey FROM (SELECT o_custkey FROM a96 EXCEPT SELECT o_custkey FROM a97) t2""".stripMargin

  /** Global sort of lineitem — the GraySort-shaped capability on testdata.
    * `orderBy` = sample-based range partitioning (the reference's phase 0,
    * main.cc:56-357) + per-partition sort (phase 2), picked automatically
    * by Spark's RangePartitioner/Tungsten sort. */
  def sortGlobal(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag"), epochMs(col("l_shipdate")).as("l_ship_ms"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val sortGlobalSql =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
      |  l_extendedprice, l_returnflag, epoch_ms(l_shipdate) AS l_ship_ms
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** JSON property extraction over the events stream table (regexp-based so
    * the oracle needs no DuckDB JSON extension). */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"), col("value"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sumDec(col("value")).as("sum_value"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  private val jsonExtractSql =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_value,
      |  CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
      |FROM (SELECT event_type, value,
      |        CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
      |      FROM events) t
      |GROUP BY event_type""".stripMargin

  /** The `spark.sql` textual surface over registered views — identical
    * semantics to the DataFrame plans (Catalyst parses both into the same
    * logical algebra), demonstrated with a join + agg + top-k. */
  def sqlTopCustomers(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("g_orders")
    Tables.customer(s, dir).createOrReplaceTempView("g_customer")
    s.sql("""
      SELECT c_custkey, c_mktsegment,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
      FROM g_orders JOIN g_customer ON o_custkey = c_custkey
      GROUP BY c_custkey, c_mktsegment
      ORDER BY total_spend DESC, c_custkey
      LIMIT 10""")
  }

  private val sqlTopCustomersSql =
    """SELECT c_custkey, c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_spend
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_mktsegment
      |ORDER BY total_spend DESC, c_custkey LIMIT 10""".stripMargin

  /** Exact quartiles per group. Only binary-exact fractions (.25/.5/.75)
    * so Spark's `(1-g)·a + g·b` and DuckDB's interpolation agree bitwise
    * on the integral quantity data; p90-style fractions would diverge in
    * the last ulp. */
  def quantiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("q25"),
        expr("percentile(l_quantity, 0.5)").as("q50"),
        expr("percentile(l_quantity, 0.75)").as("q75"),
        count(lit(1)).as("n"))

  private val quantilesSql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS q25,
      |  quantile_cont(l_quantity, 0.5) AS q50,
      |  quantile_cont(l_quantity, 0.75) AS q75,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Full-outer reconciliation census: customers vs order activity joined
    * FULL OUTER on custkey, classified into both / customer-only /
    * order-only and summarized. The compaction-side shape every CDC or
    * two-source reconciliation job needs; both inputs arrive
    * pre-aggregated (one row per key), so the outer join shuffles keys,
    * not raw rows, and the census is a constant-size output at any
    * scale. */
  def reconcile(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_acctbal"))
    val ords = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sumDec(col("o_totalprice")).as("spend"))
    cust.join(ords, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, "both")
          .when(col("c_custkey").isNotNull, "customer_only")
          .otherwise("order_only").as("side"),
        coalesce(col("c_custkey"), col("o_custkey")).as("k"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .groupBy(col("side"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("k")).as("key_checksum"),
        sum(col("n_orders")).as("n_orders"))
  }

  private val reconcileSql =
    """WITH o AS (
      |  SELECT o_custkey, COUNT(*) AS n_orders,
      |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS spend
      |  FROM orders GROUP BY o_custkey),
      |j AS (
      |  SELECT CASE WHEN c.c_custkey IS NOT NULL AND o.o_custkey IS NOT NULL THEN 'both'
      |              WHEN c.c_custkey IS NOT NULL THEN 'customer_only'
      |              ELSE 'order_only' END AS side,
      |    COALESCE(c.c_custkey, o.o_custkey) AS k,
      |    COALESCE(o.n_orders, 0) AS n_orders
      |  FROM customer c FULL OUTER JOIN o ON o.o_custkey = c.c_custkey)
      |SELECT side, COUNT(*) AS n_keys,
      |  CAST(SUM(k) AS BIGINT) AS key_checksum,
      |  CAST(SUM(n_orders) AS BIGINT) AS n_orders
      |FROM j GROUP BY side""".stripMargin

  /** Column profiling through unpivot/melt: per-column row count, null
    * count, distinct count, min and max for the lineitem measures, in ONE
    * pass over a melted (column, value) stream — the ANALYZE-style
    * profile a warehouse runs on ingest. `unpivot` is a zero-copy
    * projection (each input row emits k (name, value) pairs map-side), so
    * the only shuffle is the k-row-group aggregation; doubles pass
    * through untouched (min/max involve no arithmetic → bit-exact). */
  def profileUnpivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"))
      .unpivot(Array.empty, "col_name", "v")
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("vmin"), max(col("v")).as("vmax"))

  private val profileUnpivotSql = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val unioned = cols.map(c =>
      s"SELECT '$c' AS col_name, $c AS v FROM lineitem").mkString("\nUNION ALL ")
    s"""WITH m AS (
      |$unioned)
      |SELECT col_name, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
      |  COUNT(DISTINCT v) AS n_distinct,
      |  MIN(v) AS vmin, MAX(v) AS vmax
      |FROM m GROUP BY col_name""".stripMargin
  }

  /** TPC-H Q13 shape — the customer order-count DISTRIBUTION: every
    * customer LEFT-joined to orders (zero-order customers must survive
    * into the c_count = 0 bucket; `count(o_orderkey)` skips the nulls
    * the outer join manufactures), then the distribution of the counts.
    * The zoo's only aggregate-over-outer-join-then-aggregate shape. At
    * scale: one shuffle on custkey for the join+first agg, and the
    * second agg groups on the tiny count domain (≤ max orders per
    * customer), so it collapses map-side. */
  def custDist(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  private val custDistSql =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey) t
      |GROUP BY c_count""".stripMargin

  /** TPC-H Q18 shape — large-volume orders: aggregate lineitem per
    * order, keep the heavy tail (HAVING sum > 300), and join the
    * survivors back to orders — the aggregate-then-semi-join pattern
    * where the HAVING filter shrinks the join input to the tail before
    * any wide row moves. Decimal-exact quantity sums (the q1 contract)
    * cast to double only at the edge. */
  def largeVolumeOrders(s: SparkSession, dir: String): DataFrame = {
    val heavy = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("total_qty"))
      .filter(col("total_qty") > 300)
    Tables.orders(s, dir)
      .join(heavy, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"),
        dec(col("o_totalprice")).cast("double").as("o_totalprice"),
        col("total_qty").cast("double").as("total_qty"))
  }

  private val largeVolumeOrdersSql =
    """WITH heavy AS (
      |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300)
      |SELECT o_orderkey, o_custkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
      |  CAST(total_qty AS DOUBLE) AS total_qty
      |FROM orders JOIN heavy ON o_orderkey = l_orderkey""".stripMargin

  /** TPC-H Q22 shape — customers above the global positive-balance
    * average who never placed a LARGE order (> 300k), censused per
    * nation: the scalar subquery (a 1-row aggregate broadcast back over
    * the scan) composed with an anti-join against a filtered order set.
    * (On this testdata every customer has SOME order, so the classic
    * no-orders-at-all form is degenerate; anti-joining the large-order
    * slice keeps both shapes and a non-empty answer.) Both engines
    * compute the average as ONE double division of decimal-exact sums,
    * so the threshold — and therefore the filtered set — is
    * bit-deterministic. At scale the 1-row threshold broadcasts, the
    * anti-join's build side is the filtered (hence small) order keys,
    * and the output is nations-sized. */
  def noOrderRich(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val avgDf = cust.filter(dec(col("c_acctbal")) > 0)
      .agg((sum(dec(col("c_acctbal"))).cast("double") /
        count(lit(1))).as("avg_bal"))
    val bigOrders = Tables.orders(s, dir)
      .filter(dec(col("o_totalprice")) > 300000)
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(avgDf))
      .filter(dec(col("c_acctbal")).cast("double") > col("avg_bal"))
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
  }

  private val noOrderRichSql =
    """WITH a AS (
      |  SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_bal
      |  FROM customer WHERE CAST(c_acctbal AS DECIMAL(12,2)) > 0),
      |rich AS (
      |  SELECT c_custkey, c_nationkey, c_acctbal
      |  FROM customer CROSS JOIN a
      |  WHERE CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) > avg_bal),
      |big AS (
      |  SELECT o_custkey FROM orders
      |  WHERE CAST(o_totalprice AS DECIMAL(12,2)) > 300000)
      |SELECT c_nationkey, COUNT(*) AS numcust,
      |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS totacctbal
      |FROM rich ANTI JOIN big ON c_custkey = o_custkey
      |GROUP BY c_nationkey""".stripMargin

  val defs: Seq[GQuery] = Seq(
    GQuery("q22_no_order_rich", noOrderRich, Some(noOrderRichSql)),
    GQuery("q13_custdist", custDist, Some(custDistSql), headline = true),
    GQuery("q18_large_volume", largeVolumeOrders, Some(largeVolumeOrdersSql)),
    GQuery("q_profile_unpivot", profileUnpivot, Some(profileUnpivotSql)),
    GQuery("q_reconcile_outer", reconcile, Some(reconcileSql)),
    GQuery("q_quantiles", quantiles, Some(quantilesSql)),
    GQuery("q_sql_top_customers", sqlTopCustomers, Some(sqlTopCustomersSql)),
    GQuery("q1_pricing_summary", pricingSummary, Some(pricingSummarySql), headline = true),
    GQuery("q6_selective_revenue", selectiveRevenue, Some(selectiveRevenueSql)),
    GQuery("q3_topk_orders", topkOrders, Some(topkOrdersSql), headline = true),
    GQuery("q4_order_priority", orderPriority, Some(orderPrioritySql)),
    GQuery("q5_nation_revenue", nationRevenue, Some(nationRevenueSql), headline = true),
    GQuery("q2_part_stats", partStats, Some(partStatsSql)),
    GQuery("q7_window_top3", windowTop3, Some(windowTop3Sql)),
    GQuery("q8_setops", setOps, Some(setOpsSql)),
    GQuery("q_sort_global", sortGlobal, Some(sortGlobalSql), headline = true),
    GQuery("q_json_extract", jsonExtract, Some(jsonExtractSql)))
}
