package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The relational capability surface (SURVEY §2.8): the reference delegates
  * all relational work to user code; here it is expressed directly on the
  * DataFrame API so Catalyst plans it (pushdown, pruning, broadcast, AQE).
  *
  * Numeric discipline for oracle-exactness: every aggregate over a
  * non-integral double column is computed in DECIMAL from the first cast —
  * decimal addition/multiplication is exact and order-independent, so the
  * DuckDB oracle hash-matches regardless of partial-aggregation order. Final
  * output columns are then cast DECIMAL→DOUBLE in BOTH dialects: the driver
  * hashes stringified values after DuckDB's decimal→float64 `.df()`
  * conversion, so a decimal output with trailing zeros ('138014.00') would
  * mismatch the oracle's float ('138014.0'); decimal→double is correctly
  * rounded in both engines, so the doubles are bit-identical.
  */
object RelationalQueries {

  import Tables._

  /** TPC-H Q1-style pricing summary: filter → partial+final hash agg.
    *
    * Final money columns are DECIMAL internally (exact, order-independent
    * sums) but cast to DOUBLE at the very end on BOTH dialects: the driver's
    * hash stringifies values after DuckDB's decimal→float64 `.df()`
    * conversion, so a Spark-side Decimal('138014.00') vs oracle-side float
    * 138014.0 mismatches on the trailing zero. decimal→double is correctly
    * rounded in both engines, giving bit-identical doubles. */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("sum_disc_price"),
        sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")) *
            (lit(1).cast("decimal(4,2)") + col("l_tax").cast("decimal(4,2)")))
          .cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Filter + projection — must reach the parquet scan as PushedFilters +
    * a 3-column ReadSchema (checked in PlanSpec). */
  def q2FilterProject(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("event_type") === "purchase" && col("value") > 100.0)
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("event_id"))

  val q2Oracle: String =
    "SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase' AND value > 100.0 ORDER BY event_id"

  /** Revenue by nation: lineitem ⋈ orders (big-big, shuffle on orderkey)
    * then ⋈ customer ⋈ nation (small sides broadcast explicitly). */
  def q3RevenueByNation(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))

  val q3Oracle: String =
    """SELECT n_name,
      |CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |count(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Window top-k: 3 highest-value orders per nation; deterministic
    * tie-break on orderkey. row_number-then-filter, never a global sort. */
  def q4TopOrdersPerNation(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("c_nationkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
      .orderBy(col("c_nationkey"), col("rk"))
  }

  val q4Oracle: String =
    """SELECT c_nationkey, o_orderkey, o_totalprice, rk FROM (
      |  SELECT c_nationkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY c_nationkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders JOIN customer ON o_custkey = c_custkey) t
      |WHERE rk <= 3 ORDER BY c_nationkey, rk""".stripMargin

  /** Group + having over customer segments. */
  def q5MarketSegments(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(12,2)")).cast("double").as("total_acctbal"),
        min(col("c_acctbal")).as("min_acctbal"),
        max(col("c_acctbal")).as("max_acctbal"))
      .filter(col("n_customers") > 1)
      .orderBy(col("c_mktsegment"))

  val q5Oracle: String =
    """SELECT c_mktsegment, count(*) AS n_customers,
      |CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal,
      |min(c_acctbal) AS min_acctbal, max(c_acctbal) AS max_acctbal
      |FROM customer GROUP BY c_mktsegment HAVING count(*) > 1 ORDER BY c_mktsegment""".stripMargin

  /** Distinct aggregation: exact distinct users per event type. */
  def q6DistinctUsers(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("event_type"))

  val q6Oracle: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events,
      |min(value) AS min_value, max(value) AS max_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Anti join: parts never shipped. left_anti keeps the build side small and
    * never materializes the pair set. */
  def q7PartsNeverShipped(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .join(lineitem(s, d), col("p_partkey") === col("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))

  val q7Oracle: String =
    """SELECT p_partkey, p_name FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      |ORDER BY p_partkey""".stripMargin

  /** Semi join + date-range filter: customers with a high-priority order in
    * 1996. Timestamp filters stay pushdown-able; output has no timestamps
    * (cross-engine timestamp hashing is avoided by design). */
  def q8UrgentCustomers(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(
        orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                  col("o_orderdate") < lit("1997-01-01").cast("timestamp") &&
                  col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  val q8Oracle: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** Set ops: nations that have customers but no suppliers (EXCEPT). */
  def q9CustomerOnlyNations(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_nationkey").as("nationkey")).distinct()
      .except(supplier(s, d).select(col("s_nationkey").as("nationkey")).distinct())
      .orderBy(col("nationkey"))

  val q9Oracle: String =
    """SELECT DISTINCT c_nationkey AS nationkey FROM customer
      |EXCEPT SELECT DISTINCT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  /** Multi-way star join rollup: order counts + revenue per region/priority.
    * region and nation broadcast; the orders⋈customer join shuffles once. */
  def q10RegionPriority(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total_price"))
      .orderBy(col("r_name"), col("o_orderpriority"))

  val q10Oracle: String =
    """SELECT r_name, o_orderpriority, count(*) AS n_orders,
      |CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, o_orderpriority ORDER BY r_name, o_orderpriority""".stripMargin

  /** q31 — FULL OUTER join, the join type the suite's inner/broadcast/
    * anti/semi/outer family didn't yet exercise: high-balance customers vs
    * high-balance suppliers per nation. Both sides are filtered hard enough
    * that some nations appear on only ONE side at every SF, so both null
    * directions of the full-outer are observable (coalesced to 0 — no NULL
    * crosses the oracle hash). The nation dimension joins broadcast onto
    * the coalesced key afterwards.
    *
    * Scale shape: both inputs pre-aggregate to ≤ |nation| rows before the
    * full-outer (partial+final, so the exchanges carry one row per nation
    * per side), and the dimension join is a broadcast. */
  def q31FullOuter(s: SparkSession, d: String): DataFrame = {
    val cust = customer(s, d).filter(col("c_acctbal") > 9000)
      .groupBy(col("c_nationkey").as("ck"))
      .agg(count(lit(1)).as("n_cust"))
    val supp = supplier(s, d).filter(col("s_acctbal") > 9000)
      .groupBy(col("s_nationkey").as("sk"))
      .agg(count(lit(1)).as("n_supp"))
    cust.join(supp, col("ck") === col("sk"), "full_outer")
      .join(broadcast(nation(s, d)),
        coalesce(col("ck"), col("sk")) === col("n_nationkey"))
      .select(col("n_name").as("nation"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nation"))
  }

  val q31Oracle: String =
    """WITH c AS (SELECT c_nationkey AS ck, count(*) AS n_cust
      |  FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
      |s AS (SELECT s_nationkey AS sk, count(*) AS n_supp
      |  FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
      |SELECT n_name AS nation,
      |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
      |FROM c FULL JOIN s ON ck = sk
      |JOIN nation ON coalesce(ck, sk) = n_nationkey
      |ORDER BY nation""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_full_outer" -> (q31FullOuter _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_filter_project" -> (q2FilterProject _),
    "q3_revenue_by_nation" -> (q3RevenueByNation _),
    "q4_top_orders_per_nation" -> (q4TopOrdersPerNation _),
    "q5_market_segments" -> (q5MarketSegments _),
    "q6_distinct_users" -> (q6DistinctUsers _),
    "q7_parts_never_shipped" -> (q7PartsNeverShipped _),
    "q8_urgent_customers" -> (q8UrgentCustomers _),
    "q9_customer_only_nations" -> (q9CustomerOnlyNations _),
    "q10_region_priority" -> (q10RegionPriority _)
  )

  val oracles: Map[String, String] = Map(
    "q31_full_outer" -> q31Oracle,
    "q1_pricing_summary" -> q1Oracle,
    "q2_filter_project" -> q2Oracle,
    "q3_revenue_by_nation" -> q3Oracle,
    "q4_top_orders_per_nation" -> q4Oracle,
    "q5_market_segments" -> q5Oracle,
    "q6_distinct_users" -> q6Oracle,
    "q7_parts_never_shipped" -> q7Oracle,
    "q8_urgent_customers" -> q8Oracle,
    "q9_customer_only_nations" -> q9Oracle,
    "q10_region_priority" -> q10Oracle
  )
}
