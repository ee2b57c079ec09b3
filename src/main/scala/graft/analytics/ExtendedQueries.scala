package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** SURVEY §2.8 built-in surface: grouping sets/rollup, event-time windows,
  * set ops, approximate distinct, and the typed-UDAF extension point —
  * each exposed as an oracle-checked query where the math allows. */
object ExtendedQueries {

  import Tables._

  /** q11 — rollup subtotals. NULL grouping markers are coalesced to 'ALL'
    * so cross-engine NULL ordering/hashing never matters. */
  def q11Rollup(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total_price"))
      .select(coalesce(col("n_name"), lit("ALL")).as("nation"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total_price"))
      .orderBy(col("nation"), col("priority"))

  val q11Oracle: String =
    """SELECT coalesce(n_name, 'ALL') AS nation, coalesce(o_orderpriority, 'ALL') AS priority,
      |count(*) AS n_orders,
      |CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP (n_name, o_orderpriority)
      |ORDER BY nation, priority""".stripMargin

  /** q16 — CUBE: all grouping-set combinations over (region, market
    * segment), completing the grouping-sets family next to q11's ROLLUP.
    * Same NULL-marker coalescing and decimal-sum discipline. */
  def q16Cube(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .cube(col("r_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(12,2)")).cast("double").as("total_balance"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        col("n_customers"), col("total_balance"))
      .orderBy(col("region"), col("segment"))

  val q16Oracle: String =
    """SELECT coalesce(r_name, 'ALL') AS region, coalesce(c_mktsegment, 'ALL') AS segment,
      |count(*) AS n_customers,
      |CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY CUBE (r_name, c_mktsegment)
      |ORDER BY region, segment""".stripMargin

  /** q28 — explicit GROUPING SETS, completing q11 (ROLLUP) / q16 (CUBE)
    * with the general form: an ASYMMETRIC set list —
    * ((nation, priority), (priority), ()) — that neither ROLLUP nor CUBE
    * can express (a priority-only subtotal without the nation-only one).
    * Same NULL-marker coalescing and decimal-sum discipline as q11/q16;
    * grouping-set expansion happens map-side before the partial agg, so
    * the exchange carries one partial row per (set, group), never raw
    * rows per set. */
  def q28GroupingSets(s: SparkSession, d: String): DataFrame = {
    Views.sql(s, orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey")),
      "graft_ord_nat_v",
      """SELECT coalesce(n_name, 'ALL') AS nation,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        |FROM graft_ord_nat_v
        |GROUP BY GROUPING SETS ((n_name, o_orderpriority), (o_orderpriority), ())
        |ORDER BY nation, priority""".stripMargin)
  }

  val q28Oracle: String =
    """SELECT coalesce(n_name, 'ALL') AS nation,
      |coalesce(o_orderpriority, 'ALL') AS priority,
      |count(*) AS n_orders,
      |CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY GROUPING SETS ((n_name, o_orderpriority), (o_orderpriority), ())
      |ORDER BY nation, priority""".stripMargin

  /** q29 — NTILE quartiles: balanced-bucket assignment per region by
    * account balance, the window-family member q4 (row_number), q17 (lag),
    * q25 (sliding counts) and p9 (group-limit) don't cover. Ties are
    * broken by c_custkey so the assignment is total-ordered and therefore
    * engine-portable (both engines fill the first n mod k buckets one
    * extra row). The id-sum pins the exact per-bucket membership. */
  def q29Ntile(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("r_name"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy(col("r_name").as("region"), col("quartile"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_custkey")).as("id_sum"),
        min(col("c_acctbal")).as("min_bal"), max(col("c_acctbal")).as("max_bal"))
      .orderBy(col("region"), col("quartile"))
  }

  val q29Oracle: String =
    """WITH q AS (SELECT r_name, c_custkey, c_acctbal,
      |    ntile(4) OVER (PARTITION BY r_name
      |                   ORDER BY c_acctbal, c_custkey) AS quartile
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey)
      |SELECT r_name AS region, CAST(quartile AS BIGINT) AS quartile,
      |  count(*) AS n_customers, CAST(sum(c_custkey) AS BIGINT) AS id_sum,
      |  min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
      |FROM q GROUP BY 1, 2 ORDER BY region, quartile""".stripMargin

  /** q12 — event-time tumbling window (1 day) over the events stream table.
    * `ts` arrives as epoch-nano BIGINT (no nanos type in Spark); the window
    * start is emitted as a date string so no raw timestamps cross the
    * oracle hash. */
  def q12EventTimeWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("tt", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("tt"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n_events"), col("n_users"))
      .orderBy(col("day"), col("event_type"))

  val q12Oracle: String =
    """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
      |count(*) AS n_events, count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  /** q25 — SLIDING (hopping) event-time window, completing the window
    * family next to q12's tumbling windows: 10-minute windows every
    * 5 minutes, so each event lands in exactly two overlapping windows.
    * Uses the built-in `window()` with an explicit slide — the same operator
    * Structured Streaming plans for windowed stream aggregations, so this is
    * the batch oracle twin of the streaming shape. The oracle replicates
    * Spark's epoch-aligned window assignment arithmetically: each event's
    * two window starts are floor(t/slide)·slide and that minus one slide.
    * Window bounds are emitted as epoch-micro BIGINTs (no raw timestamps
    * cross the hash). */
  def q25SlidingWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("tt", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("tt"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .select(unix_micros(col("window.start")).as("w_start_us"),
        col("event_type"), col("n_events"), col("n_users"))
      .orderBy(col("w_start_us"), col("event_type"))

  val q25Oracle: String =
    """WITH e AS (SELECT epoch_us(ts) AS us, event_type, user_id FROM events),
      |w AS (SELECT unnest([(us // 300000000) * 300000000,
      |                     (us // 300000000) * 300000000 - 300000000]) AS w_start_us,
      |    event_type, user_id FROM e)
      |SELECT w_start_us, event_type, count(*) AS n_events,
      |  count(DISTINCT user_id) AS n_users
      |FROM w GROUP BY 1, 2 ORDER BY w_start_us, event_type""".stripMargin

  /** q17 — lag window: per-user inter-event gaps (count / max / mean in
    * ms), the sequence-analytics shape (lead/lag) the window family was
    * missing. Order within a user is (ts, event_id) so timestamp ties are
    * deterministic on both engines; `ts` stays integer nanos until the
    * single final division (exact ints → one IEEE division → hash-stable,
    * r2 rules). */
  def q17EventGaps(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // gaps in MICROsecond ints: Spark's nanosAsLong keeps full nano
    // precision but DuckDB reads TIMESTAMP(NANOS) at micro precision —
    // floor-dividing nanos vs micros drifts by 1 ms at carry boundaries
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    events(s, d)
      .withColumn("tus", expr("ts div 1000"))
      .withColumn("prev", lag(col("tus"), 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("gap_ms", expr("(tus - prev) div 1000"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        max(col("gap_ms")).as("max_gap_ms"),
        (sum(col("gap_ms")).cast("double") / count(lit(1))).as("avg_gap_ms"))
      .orderBy(col("user_id"))
  }

  val q17Oracle: String =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
      |g AS (
      |  SELECT user_id,
      |    (tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)) // 1000 AS gap_ms
      |  FROM e)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
      |  CAST(max(gap_ms) AS BIGINT) AS max_gap_ms,
      |  CAST(CAST(sum(gap_ms) AS BIGINT) AS DOUBLE) / count(*) AS avg_gap_ms
      |FROM g WHERE gap_ms IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q30 — value-based RANGE window frame: for every event, the number of
    * events the same user produced in the trailing hour (inclusive) — the
    * rate-limit / burst-detection feature, and the one window-frame type
    * (RANGE with interval bounds, vs ROWS / growing / rank frames in
    * q4/q17/q29) the suite didn't yet exercise. RANGE frames include all
    * peers of the current order value, so timestamp ties are deterministic
    * by construction — no tie-break column needed. Micro precision for the
    * q17 reason (DuckDB reads TIMESTAMP(NANOS) at micros).
    *
    * Scale shape: one exchange by user_id; the frame is evaluated by a
    * sliding two-pointer pass over each user's sorted events, O(events per
    * user) — the p1/q17 partition-bound discipline. */
  def q30RangeFrame(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
      .rangeBetween(-3600000000L, 0L)
    events(s, d)
      .withColumn("tus", expr("ts div 1000"))
      .withColumn("n_trail_1h", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"), col("tus"), col("n_trail_1h"))
      .orderBy(col("event_id"))
  }

  val q30Oracle: String =
    """SELECT event_id, user_id, epoch_us(ts) AS tus,
      |  count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |    AS n_trail_1h
      |FROM events ORDER BY event_id""".stripMargin

  /** q32 — UNPIVOT (melt), the inverse reshaping of q19's pivot: per-nation
    * customer metrics go wide → long (one row per (nation, metric)). The
    * value columns are cast to a common double up front — exact integers
    * and decimal-summed totals pass through bit-identically (r2 rules).
    *
    * Scale shape: unpivot is a narrow per-row expansion (an Expand node —
    * no shuffle of its own); the only exchange is the upstream per-nation
    * aggregation. */
  def q32Unpivot(s: SparkSession, d: String): DataFrame = {
    val metrics = customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).cast("double").as("n_cust"),
        sum(col("c_acctbal").cast("decimal(12,2)")).cast("double").as("total_bal"),
        max(col("c_acctbal")).as("max_bal"))
    metrics.unpivot(
        Array(col("nation")),
        Array(col("n_cust"), col("total_bal"), col("max_bal")),
        "metric", "value")
      .orderBy(col("nation"), col("metric"))
  }

  val q32Oracle: String =
    """WITH m AS (SELECT n_name AS nation,
      |    CAST(count(*) AS DOUBLE) AS n_cust,
      |    CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal,
      |    max(c_acctbal) AS max_bal
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1)
      |SELECT nation, metric, value FROM (
      |  SELECT nation, 'n_cust' AS metric, n_cust AS value FROM m
      |  UNION ALL SELECT nation, 'total_bal', total_bal FROM m
      |  UNION ALL SELECT nation, 'max_bal', max_bal FROM m)
      |ORDER BY nation, metric""".stripMargin

  /** q35 — calendar/date function family (§2.8 "date" scalars): orders per
    * (year, weekday) with decimal totals and the earliest month boundary.
    * The weekday is derived ARITHMETICALLY — (days since 1970-01-01 + 4)
    * mod 7, Thursday = 4 — because engine weekday numberings disagree
    * (Spark dayofweek is 1=Sunday, DuckDB's is 0=Sunday) while day
    * arithmetic is exact on both; `year`/`date_trunc` round-trip as
    * integers/strings so no raw timestamp crosses the hash. */
  def q35Calendar(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(
        year(col("o_orderdate")).cast("long").as("yr"),
        ((datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
          + lit(4)) % 7).cast("long").as("weekday"),
        date_format(date_trunc("MONTH", col("o_orderdate")), "yyyy-MM-dd")
          .as("month_start"),
        col("o_totalprice"))
      .groupBy(col("yr"), col("weekday"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total_price"),
        min(col("month_start")).as("first_month_start"))
      .orderBy(col("yr"), col("weekday"))

  val q35Oracle: String =
    """SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr,
      |  CAST((date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |        + 4) % 7 AS BIGINT) AS weekday,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
      |  min(strftime(date_trunc('month', o_orderdate), '%Y-%m-%d'))
      |    AS first_month_start
      |FROM orders GROUP BY 1, 2 ORDER BY yr, weekday""".stripMargin

  /** q13 — UNION ALL across entity kinds + re-aggregation. */
  def q13UnionBalances(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(lit("customer").as("kind"), col("c_acctbal").as("bal"))
      .unionByName(supplier(s, d).select(lit("supplier").as("kind"), col("s_acctbal").as("bal")))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("bal").cast("decimal(12,2)")).cast("double").as("total_bal"))
      .orderBy(col("kind"))

  val q13Oracle: String =
    """SELECT kind, count(*) AS n,
      |CAST(sum(CAST(bal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
      |FROM (SELECT 'customer' AS kind, c_acctbal AS bal FROM customer
      |      UNION ALL SELECT 'supplier', s_acctbal FROM supplier)
      |GROUP BY kind ORDER BY kind""".stripMargin

  /** q14 — approx_count_distinct (HLL++): sketch values are engine-specific
    * → rows-only check; the exact counterpart q6 is the oracle-checked twin. */
  def q14ApproxDistinct(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** q24 — PORTABLE HyperLogLog, closing the oracle gap q14 documents (the
    * way n5 did for n3): the full sketch — hash, register bucketing, rank,
    * harmonic sum, estimate — built from engine-NEUTRAL primitives so
    * DuckDB re-derives it bit-for-bit:
    *
    *   - hash: first 15 hex chars of md5(user_id) as a 60-bit integer
    *     (identical in both engines);
    *   - m = 64 registers from the low 6 bits; rank ρ = 55 − bitlength of
    *     the remaining 54-bit field — INTEGER ops only (`bin()` string
    *     length; a float log2 would diverge at ULP boundaries);
    *   - harmonic sum scaled by 2⁵⁵: Σ 2^(55−M_b) over registers is an
    *     exact BIGINT (≤ 2⁶¹), empty registers contribute 2⁵⁵;
    *   - estimate = (α₆₄·m²·2⁵⁵) / S — ONE double literal (embedded
    *     identically in both engines) and ONE IEEE division, so the result
    *     is bit-identical. Canonical HLL's small-range linear-counting
    *     branch (`m·ln(m/V)`) only applies when some register is EMPTY
    *     (V > 0); it is deliberately omitted here because libm `ln`
    *     implementations can differ at the ULP, and m = 64 saturates all
    *     registers at the test cardinalities (V = 0 → canonical HLL uses
    *     the raw estimator anyway).
    *
    * This is the aggregation shape a 100 TB distinct-count actually uses:
    * partial per-partition register maxes merge associatively; only
    * (event_type, bucket, M) rows cross the shuffle. */
  def q24HllPortable(s: SparkSession, d: String): DataFrame = {
    // α₆₄·m²·2⁵⁵ precomputed once; MUST print identically in the oracle
    val numerator = 0.709 * 4096 * (1L << 55).toDouble
    events(s, d)
      .select(col("event_type"),
        conv(substring(md5(col("user_id").cast("string").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("hv"))
      .select(col("event_type"),
        col("hv").bitwiseAND(63L).as("bucket"),
        shiftright(col("hv"), 6).as("rest"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(when(col("rest") === 0L, lit(55L))
        .otherwise(lit(55L) - length(bin(col("rest"))))).as("m"))
      .groupBy(col("event_type"))
      .agg((sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - m AS INT))")) +
        (lit(64L) - count(lit(1))) * lit(1L << 55)).as("stot"))
      .select(col("event_type"),
        round(lit(numerator) / col("stot"), 4).as("est_users"))
      .orderBy(col("event_type"))
  }

  val q24Oracle: String = {
    val numerator = 0.709 * 4096 * (1L << 55).toDouble
    s"""WITH h AS (SELECT event_type,
      |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
      |  FROM events),
      |r AS (SELECT event_type, hv & 63 AS bucket, hv >> 6 AS rest FROM h),
      |reg AS (SELECT event_type, bucket,
      |    max(CASE WHEN rest = 0 THEN 55 ELSE 55 - length(bin(rest)) END) AS m
      |  FROM r GROUP BY 1, 2),
      |s AS (SELECT event_type,
      |    sum(CAST(1 AS BIGINT) << CAST(55 - m AS INT)) +
      |      (64 - count(*)) * (CAST(1 AS BIGINT) << 55) AS stot
      |  FROM reg GROUP BY 1)
      |SELECT event_type, round(CAST($numerator AS DOUBLE) / stot, 4) AS est_users
      |FROM s ORDER BY event_type""".stripMargin
  }

  /** Typed UDAF (Aggregator[IN,BUF,OUT]) — the engine's user-defined
    * aggregate surface. All outputs are exact integers (cents), so the
    * oracle matches despite arbitrary partial-aggregation order. */
  final case class PriceStats(n: Long, minCents: Long, maxCents: Long, sumCents: Long)

  object PriceStatsAgg extends Aggregator[Long, PriceStats, PriceStats] {
    override def zero: PriceStats = PriceStats(0, Long.MaxValue, Long.MinValue, 0)
    override def reduce(b: PriceStats, cents: Long): PriceStats =
      PriceStats(b.n + 1, math.min(b.minCents, cents), math.max(b.maxCents, cents),
        b.sumCents + cents)
    override def merge(a: PriceStats, b: PriceStats): PriceStats =
      PriceStats(a.n + b.n, math.min(a.minCents, b.minCents),
        math.max(a.maxCents, b.maxCents), a.sumCents + b.sumCents)
    override def finish(r: PriceStats): PriceStats = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[PriceStats] =
      org.apache.spark.sql.Encoders.product[PriceStats]
    override def outputEncoder: org.apache.spark.sql.Encoder[PriceStats] =
      org.apache.spark.sql.Encoders.product[PriceStats]
  }

  /** q15 — the Aggregator applied per return flag over price cents. */
  def q15PriceStatsUdaf(s: SparkSession, d: String): DataFrame = {
    val statsUdaf = udaf(PriceStatsAgg)
    lineitem(s, d)
      .withColumn("cents", round(col("l_extendedprice") * 100).cast("long"))
      .groupBy(col("l_returnflag"))
      .agg(statsUdaf(col("cents")).as("st"))
      .select(col("l_returnflag"), col("st.n").as("n"),
        col("st.minCents").as("min_cents"), col("st.maxCents").as("max_cents"),
        col("st.sumCents").as("sum_cents"))
      .orderBy(col("l_returnflag"))
  }

  val q15Oracle: String =
    """SELECT l_returnflag, count(*) AS n,
      |min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS min_cents,
      |max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS max_cents,
      |CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q18 — exact interpolated percentiles (Spark `percentile` vs DuckDB
    * `quantile_cont`). Restricted to quarter quantiles on integer-valued
    * quantities: q·(n−1) and the interpolation weights are then exact
    * binary fractions, so lower + frac·(upper−lower) is bit-identical
    * regardless of each engine's formula ordering. (0.95-style quantiles
    * would NOT hash-match — 0.95 has no finite binary representation.) */
  def q18Quantiles(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  val q18Oracle: String =
    """SELECT l_returnflag,
      |quantile_cont(l_quantity, 0.25) AS p25,
      |quantile_cont(l_quantity, 0.5) AS p50,
      |quantile_cont(l_quantity, 0.75) AS p75,
      |count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q19 — pivot (long→wide): event counts per day × type. The pivot list
    * is explicit (no discovery scan) and missing cells are filled with 0 so
    * both engines emit non-null BIGINT columns. */
  def q19Pivot(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("day",
        date_format(timestamp_micros(expr("ts div 1000")), "yyyy-MM-dd"))
      .groupBy(col("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0)
      .orderBy(col("day"))

  val q19Oracle: String =
    """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
      |count(*) FILTER (event_type = 'click') AS click,
      |count(*) FILTER (event_type = 'error') AS error,
      |count(*) FILTER (event_type = 'purchase') AS purchase,
      |count(*) FILTER (event_type = 'signup') AS signup,
      |count(*) FILTER (event_type = 'view') AS view
      |FROM events GROUP BY day ORDER BY day""".stripMargin

  /** q20 — scalar subqueries via the SQL entry path: orders priced above
    * the corpus average, counted per priority. Demonstrates `spark.sql`
    * over registered views (the API surface a SQL-first user drives) and
    * the uncorrelated-scalar-subquery planner path (subquery → broadcast
    * scalar). "price > avg" is evaluated as the integer cross-product
    * `price_cents · n > sum_cents` — no division anywhere, so the
    * comparison is exact on both engines (avg-of-decimal rounds
    * differently in Spark vs DuckDB). */
  def q20AboveAvgOrders(s: SparkSession, d: String): DataFrame = {
    Views.sql(s, orders(s, d), "graft_orders_v",
      """SELECT o_orderpriority, count(*) AS n_above
        |FROM graft_orders_v
        |WHERE CAST(round(o_totalprice * 100) AS BIGINT)
        |        * (SELECT count(*) FROM graft_orders_v) >
        |      (SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |       FROM graft_orders_v)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  val q20Oracle: String =
    """SELECT o_orderpriority, count(*) AS n_above
      |FROM orders
      |WHERE CAST(round(o_totalprice * 100) AS BIGINT)
      |        * (SELECT count(*) FROM orders) >
      |      (SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |       FROM orders)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q21 — INTERSECT (distinct set semantics), completing the set-op
    * family next to q9's EXCEPT and q13's UNION ALL: nations present in
    * BOTH the customer and supplier bases. */
  def q21Intersect(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_nationkey").cast("long").as("nationkey"))
      .intersect(supplier(s, d).select(col("s_nationkey").cast("long").as("nationkey")))
      .join(broadcast(nation(s, d)), col("nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"))
      .orderBy(col("nation"))

  val q21Oracle: String =
    """SELECT n_name AS nation FROM nation
      |WHERE n_nationkey IN (
      |  SELECT CAST(c_nationkey AS BIGINT) FROM customer
      |  INTERSECT
      |  SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
      |ORDER BY nation""".stripMargin

  /** q27 — MERGEABLE HISTOGRAM QUANTILES: the fixed-bin quantile sketch
    * that actually runs at 100 TB (t-digest/HDR-histogram class), as the
    * approximate counterpart to q18's exact sort-based percentiles.
    * Per-group state is O(bins) and merges associatively (partial+final
    * hash aggregation — never a per-group sort of raw values), and the
    * whole derivation is integer arithmetic so DuckDB replays it exactly:
    * price cents bucket into fixed 16384-cent bins; the q-quantile
    * estimate is the LOWER EDGE of the first bin whose cumulative count
    * reaches ceil(q·n), with ceil done as integer division. */
  def q27HistogramQuantiles(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = lineitem(s, d)
      .withColumn("cents", round(col("l_extendedprice") * 100).cast("long"))
      .withColumn("bin", expr("cents div 16384"))
      .groupBy(col("l_returnflag"), col("bin"))
      .agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy(col("l_returnflag")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(col("l_returnflag"))
    hist
      .withColumn("cum", sum(col("c")).over(cumW))
      .withColumn("n", sum(col("c")).over(totW))
      .groupBy(col("l_returnflag"))
      .agg(max(col("n")).as("n"),
        (min(when(col("cum") >= expr("(n + 1) div 2"), col("bin"))) * 16384L)
          .as("p50_floor_cents"),
        (min(when(col("cum") >= expr("(n * 9 + 9) div 10"), col("bin"))) * 16384L)
          .as("p90_floor_cents"))
      .orderBy(col("l_returnflag"))
  }

  val q27Oracle: String =
    """WITH h AS (SELECT l_returnflag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) // 16384 AS bin,
      |    count(*) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |cu AS (SELECT l_returnflag, bin, c,
      |    sum(c) OVER (PARTITION BY l_returnflag ORDER BY bin
      |                 ROWS UNBOUNDED PRECEDING) AS cum,
      |    sum(c) OVER (PARTITION BY l_returnflag) AS n
      |  FROM h)
      |SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n,
      |  CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN bin END) * 16384 AS BIGINT)
      |    AS p50_floor_cents,
      |  CAST(min(CASE WHEN cum >= (n * 9 + 9) // 10 THEN bin END) * 16384 AS BIGINT)
      |    AS p90_floor_cents
      |FROM cu GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q26 — EXCEPT ALL (bag semantics, multiplicity max(m₁−m₂, 0)),
    * completing the set-op family's multiset half next to q21's distinct
    * INTERSECT: per nation, how many customer rows survive after each
    * supplier row cancels one. Exercises Spark's `exceptAll` rewrite
    * (count-aggregate + generate), which has no distinct-set shortcut. */
  def q26ExceptAll(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_nationkey").cast("long").as("nationkey"))
      .exceptAll(supplier(s, d).select(col("s_nationkey").cast("long").as("nationkey")))
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n_remaining"))
      .join(broadcast(nation(s, d)), col("nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("n_remaining"))
      .orderBy(col("nation"))

  val q26Oracle: String =
    """SELECT n_name AS nation, count(*) AS n_remaining FROM (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
      |  EXCEPT ALL
      |  SELECT CAST(s_nationkey AS BIGINT) FROM supplier) t
      |JOIN nation ON nationkey = n_nationkey
      |GROUP BY n_name ORDER BY nation""".stripMargin

  /** q33 — INTERSECT ALL (bag semantics, multiplicity min(m₁, m₂)),
    * closing the set-op family: q13 UNION ALL, q21 INTERSECT, q9 EXCEPT,
    * q26 EXCEPT ALL. Per nation, how many customer rows find a matching
    * supplier row one-for-one. Exercises Spark's `intersectAll` rewrite
    * (dual-count aggregate + generate over the min multiplicity). */
  def q33IntersectAll(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_nationkey").cast("long").as("nationkey"))
      .intersectAll(supplier(s, d).select(col("s_nationkey").cast("long").as("nationkey")))
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n_matched"))
      .join(broadcast(nation(s, d)), col("nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("n_matched"))
      .orderBy(col("nation"))

  val q33Oracle: String =
    """SELECT n_name AS nation, count(*) AS n_matched FROM (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
      |  INTERSECT ALL
      |  SELECT CAST(s_nationkey AS BIGINT) FROM supplier) t
      |JOIN nation ON nationkey = n_nationkey
      |GROUP BY n_name ORDER BY nation""".stripMargin

  /** q34 — schema-driven JSON parsing (`from_json`, the §2.8-named
    * primitive q22's path-extraction doesn't exercise) both ways: into an
    * explicit STRUCT schema and into a MAP<STRING,BIGINT> probed with the
    * map functions (`element_at`, `map_keys`). The struct-path and
    * map-path sums must agree with each other and with the oracle's JSON
    * operators; the key inventory rides along as a joined string so the
    * map surface is pinned too. All parsing is per-row and codegen-able —
    * no shuffle beyond the final per-type aggregate. */
  def q34FromJson(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        expr("from_json(props, 'k BIGINT').k").as("k_struct"),
        expr("element_at(from_json(props, 'MAP<STRING,BIGINT>'), 'k')").as("k_map"),
        expr("array_join(map_keys(from_json(props, 'MAP<STRING,BIGINT>')), ',')").as("keys"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k_struct")).as("sum_k_struct"),
        sum(col("k_map")).as("sum_k_map"),
        max(col("keys")).as("key_set"))
      .orderBy(col("event_type"))

  val q34Oracle: String =
    """SELECT event_type, count(*) AS n,
      |CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k_struct,
      |CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k_map,
      |max(array_to_string(json_keys(props), ',')) AS key_set
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q54 — ORDERED STRING AGGREGATION (`listagg ... WITHIN GROUP`, the
    * Spark 4 ANSI aggregate): per region, the comma-joined nation list in
    * collation order — the report-building aggregate every BI layer
    * needs, with the determinism pitfall made explicit: listagg WITHOUT
    * the WITHIN GROUP order is nondeterministic under parallel
    * aggregation, so the ordered form is the only one a hash gate can
    * admit. DISTINCT dedup rides along via the supplier join fanout. */
  def q54Listagg(s: SparkSession, d: String): DataFrame = {
    Views.sqlN(s, Seq(nation(s, d) -> "graft_q54_nation_v",
      region(s, d) -> "graft_q54_region_v",
      supplier(s, d) -> "graft_q54_supplier_v"),
      """WITH rn AS (SELECT DISTINCT r.r_name, n.n_name
        |  FROM graft_q54_region_v r
        |  JOIN graft_q54_nation_v n ON n.n_regionkey = r.r_regionkey
        |  JOIN graft_q54_supplier_v s ON s.s_nationkey = n.n_nationkey)
        |SELECT r_name AS region,
        |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
        |  count(1) AS n_nations
        |FROM rn GROUP BY r_name ORDER BY region""".stripMargin)
  }

  val q54Oracle: String =
    """WITH rn AS (SELECT DISTINCT r.r_name, n.n_name
      |  FROM region r
      |  JOIN nation n ON n.n_regionkey = r.r_regionkey
      |  JOIN supplier s ON s.s_nationkey = n.n_nationkey)
      |SELECT r_name AS region,
      |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
      |  count(*) AS n_nations
      |FROM rn GROUP BY r_name ORDER BY region""".stripMargin

  /** q55 — the BITMAP aggregate family (Spark 3.5+ `bitmap_bucket_number`
    * / `bitmap_construct_agg` / `bitmap_count` / `bitmap_or_agg`): exact
    * distinct-count as a two-level bitmap rollup — per (key, bucket)
    * bitmaps built map-side, OR-merged, then popcounted. This is the
    * scalable exact alternative between q6's count(DISTINCT) (full
    * shuffle of values) and q14/q24's sketches (approximate): state per
    * group is bounded by 4KB-bucket bitmaps however many distinct values
    * arrive, merge is bitwise-OR (associative, any partiality), and the
    * final count is exact. Keys ride an injective ×1024 spread so MULTIPLE
    * buckets exist per group at every SF — the cross-bucket rollup (the
    * path the operator exists for) is exercised at the gate SF, not just
    * at rehearsal scale. The oracle is plain count(DISTINCT) — equality
    * proves the bitmap path loses nothing. */
  def q55Bitmap(s: SparkSession, d: String): DataFrame = {
    Views.sql(s, events(s, d), "graft_q55_events_v",
      """WITH b AS (SELECT event_type, bitmap_bucket_number(user_id * 1024 + 1) AS bkt,
        |    bitmap_construct_agg(bitmap_bit_position(user_id * 1024 + 1)) AS bm
        |  FROM graft_q55_events_v
        |  GROUP BY event_type, bitmap_bucket_number(user_id * 1024 + 1)),
        |m AS (SELECT event_type, sum(bitmap_count(bm)) AS n_users,
        |    count(1) AS n_buckets
        |  FROM b GROUP BY event_type)
        |SELECT event_type, CAST(n_users AS BIGINT) AS n_users,
        |  CAST(n_buckets AS BIGINT) AS n_buckets
        |FROM m ORDER BY event_type""".stripMargin)
  }

  val q55Oracle: String =
    """SELECT event_type,
      |  count(DISTINCT user_id) AS n_users,
      |  count(DISTINCT (user_id * 1024) // 32768) AS n_buckets
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q52 — XML ingestion (`from_xml`, the Spark 4 built-in that absorbed
    * spark-xml — the third wire format next to q34's JSON and f2's CSV):
    * an XML fragment is built per event from plain columns (the q49
    * move, so the oracle needs no XML of its own), parsed back through
    * an explicit struct schema — attribute (`_id`), nested element, and
    * a missing-element NULL all pinned — and aggregated. Round-tripping
    * build→parse proves the parser inverts the writer on exactly the
    * construct set used; parsing is per-row and shuffle-free until the
    * final aggregate. The one STRING interpolation (`event_type`) is
    * entity-escaped before the concat (ADVICE r8): a `&`/`<`/`>` in the
    * value would otherwise make `from_xml` return null structs and fail
    * the gate as a confusing hash mismatch; `from_xml` decodes the
    * entities back, so `p.t` still equals the raw column. */
  def q52FromXml(s: SparkSession, d: String): DataFrame = {
    def xmlEscape(c: Column): Column =
      regexp_replace(regexp_replace(regexp_replace(
        c, "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    events(s, d)
      .select(col("event_type"),
        concat(lit("<e id=\""), col("event_id"), lit("\"><u>"), col("user_id"),
          lit("</u><t>"), xmlEscape(col("event_type")), lit("</t></e>")).as("xml"))
      .select(col("event_type"), expr(
        "from_xml(xml, '_id BIGINT, u BIGINT, t STRING, missing BIGINT')").as("p"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("p._id")).as("sum_id"),
        sum(col("p.u")).as("sum_u"),
        sum(when(col("p.t") === col("event_type"), 1L).otherwise(0L)).as("n_t_match"),
        sum(when(col("p.missing").isNull, 1L).otherwise(0L)).as("n_missing_null"))
      .orderBy(col("event_type"))
  }

  val q52Oracle: String =
    """SELECT event_type, count(*) AS n,
      |CAST(sum(event_id) AS BIGINT) AS sum_id,
      |CAST(sum(user_id) AS BIGINT) AS sum_u,
      |count(*) AS n_t_match,
      |count(*) AS n_missing_null
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q53 — COLLATION-aware comparison (Spark 4 collations): grouping and
    * equality under `UTF8_LCASE` must merge case-variants the way the
    * oracle's explicit lower() does — the multilingual-corpus reality
    * where 'En'/'EN'/'en' are one language key. The collated path keeps
    * comparison semantics in the TYPE (so every downstream join/group
    * inherits it) instead of sprinkling lower() at use sites; the query
    * mixes case deterministically per row, groups under the collation,
    * and also counts collated equality hits against a fixed literal. */
  def q53Collation(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        // deterministic case mix: even ids upper-case the lang key
        when(pmod(col("doc_id"), lit(2)) === 0, upper(col("lang")))
          .otherwise(col("lang")).as("lang_mixed"))
      .select(col("doc_id"), col("n_chars"),
        expr("collate(lang_mixed, 'UTF8_LCASE')").as("lang_ci"))
      .groupBy(col("lang_ci"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(when(col("lang_ci") === lit("EN"), 1L).otherwise(0L)).as("n_en_ci"))
      .select(lower(col("lang_ci")).as("lang"), col("n_docs"),
        col("total_chars"), col("n_en_ci"))
      .orderBy(col("lang"))

  val q53Oracle: String =
    """SELECT lower(lang) AS lang, count(*) AS n_docs,
      |CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |CAST(sum(CASE WHEN lower(lang) = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en_ci
      |FROM documents GROUP BY lower(lang) ORDER BY lang""".stripMargin

  /** q51 — the VARIANT semi-structured type (Spark 4's open-schema JSON
    * path, next to q22's string extraction and q34's schema-pinned
    * `from_json`): `parse_json` → VARIANT → typed `variant_get` paths,
    * plus `try_variant_get` with a wrong type returning NULL instead of
    * raising (the q50 safety contract on the variant surface). VARIANT
    * stores a parsed binary form, so repeated path reads skip re-parsing
    * — the 100 TB answer to "props is JSON and every query probes it"
    * (parse once per row, no schema migration when keys appear).
    * Aggregates are engine-neutral integers, so DuckDB's JSON operators
    * re-derive them without a variant type of its own. */
  def q51Variant(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"), expr("parse_json(props)").as("v"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"),
        expr("try_variant_get(v, '$.k', 'array<bigint>')").as("bad_cast"),
        expr("try_variant_get(v, '$.missing', 'bigint')").as("absent"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        sum(when(col("bad_cast").isNull, 1L).otherwise(0L)).as("n_bad_cast_null"),
        sum(when(col("absent").isNull, 1L).otherwise(0L)).as("n_absent_null"))
      .orderBy(col("event_type"))

  val q51Oracle: String =
    """SELECT event_type, count(*) AS n,
      |CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      |CAST(min(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
      |CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k,
      |count(*) AS n_bad_cast_null,
      |count(*) AS n_absent_null
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q49 — the higher-order MAP-function surface (`transform_values`,
    * `map_filter`, `map_zip_with`, map explode), completing the
    * collection-function family next to q45's arrays and q34's map
    * parsing. A 3-entry map is built per event from plain columns, pushed
    * through a value transform, a key filter, and a two-map zip, then
    * EXPLODED to (event_id, src, key, val) rows — so the oracle re-derives
    * every entry from the underlying columns with plain string concat and
    * never needs a map type of its own. All map work is per-row codegen;
    * the probe filter (user_id < 5) reaches the scan.
    *
    * Scale shape: shuffle-free except the final presentation sort. */
  def q49MapFunctions(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).filter(col("user_id") < 5)
      .select(col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").as("k"),
        col("user_id").cast("string").as("u"))
      .withColumn("m1", map(lit("t"), col("event_type"),
        lit("k"), col("k"), lit("u"), col("u")))
      .withColumn("m2", expr("transform_values(m1, (k, v) -> concat(k, ':', v))"))
      .withColumn("m3", expr("map_filter(m2, (k, v) -> k != 'u')"))
      .withColumn("mz", expr("map_zip_with(m1, m2, (k, a, b) -> concat(a, '|', b))"))
    ev.select(col("event_id"), lit("filtered").as("src"),
        explode(col("m3")).as(Seq("key", "val")))
      .unionByName(ev.select(col("event_id"), lit("zipped").as("src"),
        explode(col("mz")).as(Seq("key", "val"))))
      .orderBy(col("event_id"), col("src"), col("key"))
  }

  val q49Oracle: String =
    """WITH e AS (SELECT event_id, event_type,
      |    props->>'$.k' AS k, CAST(user_id AS VARCHAR) AS u
      |  FROM events WHERE user_id < 5),
      |rows AS (
      |  SELECT event_id, 'filtered' AS src, 't' AS key, 't:' || event_type AS val FROM e
      |  UNION ALL SELECT event_id, 'filtered', 'k', 'k:' || k FROM e
      |  UNION ALL SELECT event_id, 'zipped', 't', event_type || '|' || 't:' || event_type FROM e
      |  UNION ALL SELECT event_id, 'zipped', 'k', k || '|' || 'k:' || k FROM e
      |  UNION ALL SELECT event_id, 'zipped', 'u', u || '|' || 'u:' || u FROM e)
      |SELECT event_id, src, key, val FROM rows
      |ORDER BY event_id, src, key""".stripMargin

  /** q50 — the ANSI error-safe `try_*` surface (`try_divide`, `try_cast`,
    * `try_element_at`): under ANSI semantics these return NULL where the
    * strict form would raise — the contract that lets a 100 TB pipeline
    * quarantine malformed rows as data instead of dying mid-job. Each
    * failure mode is made data-dependent (divide by `user_id % 3`,
    * out-of-range list index from `user_id % 4`, a non-numeric cast) and
    * counted per event type; the oracle re-derives the NULL rule with
    * plain CASE arithmetic, so the outputs pin the exact null semantics.
    *
    * Scale shape: per-row expressions + one partial+final aggregate. */
  def q50TryFunctions(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"), col("user_id"),
        // pmod, not %: a negative user_id under % yields a negative residue,
        // which try_element_at would index from the array END (returns a
        // value) while the oracle's CASE yields NULL (ADVICE r7)
        expr("try_divide(CAST(1 AS DOUBLE), CAST(pmod(user_id, 3) AS DOUBLE))").as("dv"),
        // index 0 is categorically invalid (raises even under try_); map
        // the 0 residue to 4 — genuinely out of range, which try_element_at
        // converts to NULL
        expr("try_element_at(array('a', 'b', 'c'), " +
          "CAST(CASE WHEN pmod(user_id, 4) = 0 THEN 4 ELSE pmod(user_id, 4) END AS INT))").as("el"),
        expr("try_cast(event_type AS BIGINT)").as("bc"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("dv").isNull, 1L).otherwise(0L)).as("n_div_null"),
        sum(when(col("el").isNull, 1L).otherwise(0L)).as("n_elem_null"),
        sum(when(col("bc").isNull, 1L).otherwise(0L)).as("n_cast_null"),
        max(col("el")).as("max_elem"))
      .orderBy(col("event_type"))

  val q50Oracle: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CASE WHEN ((user_id % 3) + 3) % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_div_null,
      |  CAST(sum(CASE WHEN ((user_id % 4) + 4) % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_elem_null,
      |  count(*) AS n_cast_null,
      |  max(CASE ((user_id % 4) + 4) % 4 WHEN 1 THEN 'a' WHEN 2 THEN 'b' WHEN 3 THEN 'c' END) AS max_elem
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q22 — semi-structured JSON extraction: the events `props` column is a
    * JSON string; pull `$.k` out (Spark `get_json_object`, DuckDB `->>`),
    * cast to BIGINT, and aggregate per event type. Exact integer outputs
    * keep the hash stable. */
  def q22JsonExtract(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"))

  val q22Oracle: String =
    """SELECT event_type, count(*) AS n,
      |min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
      |max(CAST(props->>'$.k' AS BIGINT)) AS max_k,
      |CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q23 — correlated EXISTS through the SQL planner path (rewritten to a
    * semi join by Catalyst; q8 is the DataFrame-API twin): customers with
    * at least one urgent open order. */
  def q23ExistsCorrelated(s: SparkSession, d: String): DataFrame = {
    Views.sqlN(s, Seq(orders(s, d) -> "graft_orders_v",
      customer(s, d) -> "graft_customer_v"),
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM graft_customer_v c
        |WHERE EXISTS (
        |  SELECT 1 FROM graft_orders_v o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'O')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)
  }

  val q23Oracle: String =
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer c
      |WHERE EXISTS (
      |  SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |    AND o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'O')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q36 — relative-rank windows (`percent_rank`, `cume_dist`), the two
    * rank-to-[0,1] normalizers the suite didn't yet exercise. The ordering
    * key is unique (balance, custkey), so percent_rank = (rn−1)/(n−1) and
    * cume_dist = rn/n — single IEEE divisions of exact integers, identical
    * in both engines. Aggregated per region (top-decile membership, lower
    * half count) so the output is 5 rows, not a per-customer dump.
    *
    * Scale shape: one exchange by region, then the standard partial+final
    * aggregation; the window partition key is the coarse region (5 values)
    * — fine at test SF, and the documented production variant partitions
    * by (region, nation) or buckets when a partition outgrows a task. */
  def q36RankDistribution(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("r_name"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .groupBy(col("r_name").as("region"))
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("pr") >= 0.9, col("c_custkey"))).as("top_decile_id_sum"),
        count(when(col("cd") <= 0.5, lit(1))).as("n_lower_half"),
        max(when(col("pr") >= 0.9, col("c_acctbal"))).as("top_decile_max_bal"))
      .orderBy(col("region"))
  }

  val q36Oracle: String =
    """WITH q AS (SELECT r_name, c_custkey, c_acctbal,
      |    percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WINDOW w AS (PARTITION BY r_name ORDER BY c_acctbal, c_custkey))
      |SELECT r_name AS region, count(*) AS n_customers,
      |  CAST(sum(CASE WHEN pr >= 0.9 THEN c_custkey END) AS BIGINT) AS top_decile_id_sum,
      |  count(CASE WHEN cd <= 0.5 THEN 1 END) AS n_lower_half,
      |  max(CASE WHEN pr >= 0.9 THEN c_acctbal END) AS top_decile_max_bal
      |FROM q GROUP BY 1 ORDER BY region""".stripMargin

  /** q37 — SCD2 / gaps-and-islands: collapse each user's event stream into
    * runs of consecutive equal `event_type` (change detection via `lag`,
    * run ids via a running `sum` window), then derive type-2-dimension
    * validity intervals [valid_from, valid_to) with `lead` over the runs —
    * the session/state-history shape every warehouse builds. −1 marks the
    * open (current) interval so no NULLs cross the oracle hash.
    *
    * Scale shape: both windows and the run aggregation share the user_id
    * partitioning, so Catalyst plans ONE exchange; micro precision per the
    * q17 rule. */
  def q37Scd2Intervals(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val lagType = lag(col("event_type"), 1).over(wOrd)
    val runs = events(s, d)
      .filter(col("user_id") < 30)
      .withColumn("tus", expr("ts div 1000"))
      .withColumn("chg", when(lagType.isNull || lagType =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(wOrd))
      .groupBy(col("user_id"), col("run_id"))
      .agg(min(col("event_type")).as("state"),
        min(col("tus")).as("valid_from_us"),
        count(lit(1)).as("n_events"))
    val wRun = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
    runs
      .withColumn("valid_to_us", coalesce(lead(col("valid_from_us"), 1).over(wRun), lit(-1L)))
      .withColumn("is_current", when(col("valid_to_us") === -1L, 1L).otherwise(0L))
      .select(col("user_id"), col("run_id"), col("state"), col("valid_from_us"),
        col("valid_to_us"), col("n_events"), col("is_current"))
      .orderBy(col("user_id"), col("run_id"))
  }

  val q37Oracle: String =
    """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
      |  FROM events WHERE user_id < 30),
      |c AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
      |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
      |r AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS run_id FROM c),
      |g AS (SELECT user_id, run_id, min(event_type) AS state,
      |    min(tus) AS valid_from_us, count(*) AS n_events
      |  FROM r GROUP BY 1, 2)
      |SELECT user_id, CAST(run_id AS BIGINT) AS run_id, state, valid_from_us,
      |  COALESCE(lead(valid_from_us) OVER w2, -1) AS valid_to_us,
      |  n_events,
      |  CAST(CASE WHEN lead(valid_from_us) OVER w2 IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
      |FROM g WINDOW w2 AS (PARTITION BY user_id ORDER BY run_id)
      |ORDER BY user_id, run_id""".stripMargin

  /** q38 — boundary-value windows: `first_value` / `last_value` /
    * `nth_value` over an explicit full frame (ROWS UNBOUNDED PRECEDING →
    * UNBOUNDED FOLLOWING — the frame spec last_value silently gets wrong
    * under the default frame, which is exactly why it deserves a pinned
    * query). One row per nation: its chronologically first, second, and
    * last order. Unique ordering (date, orderkey) makes all three
    * deterministic.
    *
    * Scale shape: full-frame window + `distinct` collapse; at production
    * scale the same answer is a `min/max(struct)` aggregation (the n2
    * pattern) — this query exists to pin the FRAME semantics. */
  def q38BoundaryValues(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col("n_name"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cnt = Window.partitionBy(col("n_name"))
    orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("first_key", first(col("o_orderkey")).over(win))
      .withColumn("last_key", last(col("o_orderkey")).over(win))
      .withColumn("second_key", nth_value(col("o_orderkey"), 2).over(win))
      .withColumn("n_orders", count(lit(1)).over(cnt))
      .select(col("n_name").as("nation"), col("first_key"), col("second_key"),
        col("last_key"), col("n_orders"))
      .distinct()
      .orderBy(col("nation"))
  }

  val q38Oracle: String =
    """WITH j AS (SELECT n_name, o_orderkey, o_orderdate
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      |w AS (SELECT n_name,
      |    first_value(o_orderkey) OVER win AS first_key,
      |    nth_value(o_orderkey, 2) OVER win AS second_key,
      |    last_value(o_orderkey) OVER win AS last_key,
      |    count(*) OVER (PARTITION BY n_name) AS n_orders
      |  FROM j WINDOW win AS (PARTITION BY n_name ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      |SELECT DISTINCT n_name AS nation, first_key, second_key, last_key,
      |  CAST(n_orders AS BIGINT) AS n_orders
      |FROM w ORDER BY nation""".stripMargin

  /** q39 — correlation/regression from EXACT integer moments: Pearson r
    * and the OLS slope of quantity on price per return flag. Spark's
    * `corr`/`covar_samp` fold doubles in partition order — a different
    * answer every shuffle, unusable under a hash gate — so the moments
    * (n, Σx, Σy, Σxy, Σx², Σy²) are accumulated EXACTLY: prices quantized
    * to cents, sums in DECIMAL(38,0) (Spark) vs HUGEINT (DuckDB), both
    * exact at any row count; only the final closed-form expressions touch
    * IEEE arithmetic, on bit-identical inputs.
    *
    * Scale shape: this IS the scalable statistics pattern — six mergeable
    * moments, partial+final aggregation, O(groups) state, no second pass
    * (contrast the textbook Σ(x−x̄)(y−ȳ) which needs the means first). */
  def q39ExactMoments(s: SparkSession, d: String): DataFrame = {
    val m = lineitem(s, d).select(col("l_returnflag"),
      expr("CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))").as("x"),
      col("l_quantity").cast("decimal(38,0)").as("y"))
    m.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("l_returnflag"),
        col("n").cast("long").as("n_rows"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))).as("corr"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")).as("slope_qty_per_cent"),
        (col("sx").cast("double") / col("n").cast("double")).as("mean_price_cents"),
        (col("sy").cast("double") / col("n").cast("double")).as("mean_qty"))
      .orderBy(col("l_returnflag"))
  }

  val q39Oracle: String =
    """WITH m AS (SELECT l_returnflag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS x,
      |    CAST(l_quantity AS BIGINT) AS y
      |  FROM lineitem),
      |g AS (SELECT l_returnflag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
      |  FROM m GROUP BY 1)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
      |  CAST(n*sxy - sx*sy AS DOUBLE) /
      |    sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)) AS corr,
      |  CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS slope_qty_per_cent,
      |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_price_cents,
      |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_qty
      |FROM g ORDER BY l_returnflag""".stripMargin

  /** q40 — NULL-AWARE anti join: `NOT IN (subquery)` with a NULLABLE outer
    * key. Three-valued logic makes this a DIFFERENT operator from the
    * `NOT EXISTS` anti join (q7/q9): a NULL outer key compares UNKNOWN to
    * every subquery row, so `NOT IN` never keeps it. `NULLIF(c_nationkey,5)`
    * manufactures those NULLs; nation-5 customers must vanish along with
    * the nations < 10 named by the subquery. Spark plans the single-column
    * case as a broadcast hash join with the NAAJ flag — the physical
    * operator this query pins.
    *
    * Scale shape: subquery side is dimension-sized and broadcast; the fact
    * side streams. A null-aware anti against a LARGE subquery is the one
    * join Spark cannot shuffle (NULL matches every partition), which is
    * why the production rewrite is NOT EXISTS when keys are provably
    * non-null — this query documents the semantic boundary. */
  def q40NullAwareAnti(s: SparkSession, d: String): DataFrame = {
    Views.sqlN(s, Seq(customer(s, d) -> "graft_customer_v",
      nation(s, d) -> "graft_nation_v"),
      """SELECT c_nationkey, count(1) AS n_customers,
        |  sum(c_custkey) AS id_sum
        |FROM graft_customer_v
        |WHERE nullif(c_nationkey, 5) NOT IN
        |  (SELECT n_nationkey FROM graft_nation_v WHERE n_nationkey < 10)
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin)
      .withColumn("c_nationkey", col("c_nationkey").cast("long"))
  }

  val q40Oracle: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
      |  count(1) AS n_customers, CAST(sum(c_custkey) AS BIGINT) AS id_sum
      |FROM customer
      |WHERE nullif(c_nationkey, 5) NOT IN
      |  (SELECT n_nationkey FROM nation WHERE n_nationkey < 10)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** q41 — MULTIPLE DISTINCT aggregates in one pass: per event type, the
    * distinct-user and distinct-day counts plus a plain count. Catalyst
    * compiles this to an Expand (one row replica per distinct group) +
    * two-level aggregation — the operator that makes multi-distinct a
    * single shuffle pipeline instead of N self-joined queries.
    *
    * Scale shape: Expand multiplies rows by the number of distinct specs
    * (2 here) BEFORE the shuffle — the documented cost knob; with high
    * per-key cardinality the partial distinct still collapses most of it
    * map-side. */
  def q41MultiDistinct(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("day", expr("(ts div 1000) div 86400000000"))
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("day")).as("n_days"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  val q41Oracle: String =
    """SELECT event_type,
      |  count(DISTINCT user_id) AS n_users,
      |  count(DISTINCT epoch_us(ts) // 86400000000) AS n_days,
      |  count(*) AS n_events
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  /** q42 — GENERATE with ordinality: posexplode over a bounded token
    * prefix, the lateral-view row-expansion operator (Spark's `Generate`
    * node). The slice bounds the expansion to ≤ 5 rows per document, so
    * the operator's output is O(5·docs) regardless of document length —
    * the pattern for exploding variable-length payloads without letting
    * one long row dominate a task. Narrow plan: no exchange at all before
    * the output sort. */
  def q42Posexplode(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), posexplode(slice(split(col("text"), " "), 1, 5)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("token"))
      .orderBy(col("doc_id"), col("pos"))

  val q42Oracle: String =
    """WITH d AS (SELECT doc_id, list_slice(string_split(text, ' '), 1, 5) AS ws
      |  FROM documents)
      |SELECT doc_id, CAST(t.range - 1 AS BIGINT) AS pos, ws[t.range] AS token
      |FROM d CROSS JOIN range(1, 6) t WHERE t.range <= len(ws)
      |ORDER BY doc_id, pos""".stripMargin

  /** q43 — correlated LATERAL subquery with LIMIT: top-2 customers by
    * balance per nation, written as the SQL-standard lateral join rather
    * than q4's window formulation. Catalyst decorrelates the limited
    * subquery into a partitioned rank filter (DecorrelateInnerQuery), so
    * the physical plan is the same shuffle-once window shape — the test
    * pins that the LATERAL surface is wired, not a new execution path. */
  def q43LateralTopk(s: SparkSession, d: String): DataFrame = {
    Views.sqlN(s, Seq(nation(s, d) -> "graft_q43_nation_v",
      customer(s, d) -> "graft_q43_customer_v"),
      """SELECT n_name, t.c_name, t.c_acctbal
        |FROM graft_q43_nation_v, LATERAL (
        |  SELECT c_name, c_acctbal FROM graft_q43_customer_v
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin)
  }

  val q43Oracle: String =
    """SELECT n_name, t.c_name, t.c_acctbal
      |FROM nation, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
      |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin

  /** q44 — regexp_extract_all + a fold over the match list: per event
    * type, the count and sum of every digit run in the raw `props` JSON
    * string. Exercises the regex-vectorized extraction path and a lambda
    * `aggregate` over its result — all integer math, shuffle carries one
    * partial row per (task, event_type). */
  def q44RegexpExtract(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        expr("aggregate(regexp_extract_all(props, '[0-9]+', 0), 0L, (a, x) -> a + CAST(x AS LONG))")
          .as("dsum"),
        size(expr("regexp_extract_all(props, '[0-9]+', 0)")).cast("long").as("nm"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("dsum")).as("digit_sum"),
        sum(col("nm")).as("n_matches"))
      .orderBy(col("event_type"))

  val q44Oracle: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(coalesce(list_sum(list_transform(regexp_extract_all(props, '[0-9]+'),
      |    x -> CAST(x AS BIGINT))), 0)) AS BIGINT) AS digit_sum,
      |  CAST(sum(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT) AS n_matches
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  /** q45 — array-function surface: distinct/sort/slice/join/intersect/
    * union over the token set of each document. Cross-engine list
    * ordering is never trusted: every array is `array_sort`ed before
    * slicing or counting, so the comparison is set-semantics with a
    * deterministic serialization. Pure column expressions, shuffle-free
    * per document. */
  def q45ArrayOps(s: SparkSession, d: String): DataFrame = {
    val stop = "array('the','a','of','and','to','in','is','it')"
    documents(s, d)
      .select(col("doc_id"), array_sort(array_distinct(split(col("text"), " "))).as("uniq"))
      .select(col("doc_id"),
        size(col("uniq")).cast("long").as("n_uniq"),
        array_join(slice(col("uniq"), 1, 3), ",").as("first3"),
        size(expr(s"array_intersect(uniq, $stop)")).cast("long").as("n_stop_present"),
        size(expr(s"array_union(uniq, $stop)")).cast("long").as("n_union"))
      .orderBy(col("doc_id"))
  }

  val q45Oracle: String =
    """WITH w AS (SELECT doc_id, list_sort(list_distinct(string_split(text, ' '))) AS uniq
      |  FROM documents)
      |SELECT doc_id, CAST(len(uniq) AS BIGINT) AS n_uniq,
      |  array_to_string(list_slice(uniq, 1, 3), ',') AS first3,
      |  CAST(len(list_intersect(uniq, ['the','a','of','and','to','in','is','it'])) AS BIGINT)
      |    AS n_stop_present,
      |  CAST(len(list_distinct(list_concat(uniq, ['the','a','of','and','to','in','is','it']))) AS BIGINT)
      |    AS n_union
      |FROM w ORDER BY doc_id""".stripMargin

  /** q46 — LOCF gap fill: `last(..., ignoreNulls)` over a running frame
    * carries the previous non-null reading forward (error events null
    * their value out, the sensor-dropout shape). The IGNORE NULLS window
    * surface is its own operator family — nth_value/first/last without it
    * (q38) cannot express forward fill. Total frame order via (ts,
    * event_id) so duplicate timestamps never make the fill ambiguous.
    * Scale shape: one exchange on user_id; the probe filter reaches the
    * scan. */
  def q46Locf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // compare at MICROsecond resolution: DuckDB truncates parquet
    // TIMESTAMP(NANOS) to micros on read, so (ts_us, event_id) is the
    // total order both engines can agree on
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .filter(col("user_id") < 50)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("v", when(col("event_type") =!= "error", col("value")))
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("ts_us"), col("event_type"), col("filled"))
      .orderBy(col("user_id"), col("ts_us"), col("event_id"))
  }

  val q46Oracle: String =
    """SELECT user_id, epoch_us(ts) AS ts_us, event_type,
      |  last_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |          ROWS UNBOUNDED PRECEDING) AS filled
      |FROM events WHERE user_id < 50
      |ORDER BY user_id, ts_us, event_id""".stripMargin

  /** q47 — ROLLING-WINDOW DISTINCT (trailing-7-day active users): count
    * distinct cannot ride a window frame, so the scalable form is
    * (day, user) pair dedup → range join against the tiny day list →
    * per-day distinct count. The range join broadcasts the DAY side
    * (O(date-span) rows) as the build of a conditioned nested-loop join
    * — the one sanctioned BNLJ shape — so the corpus-sized pair set
    * streams through once; both exchanges are partial+final aggregates
    * on bounded keys (day·users, day). */
  def q47RollingWau(s: SparkSession, d: String): DataFrame = {
    val pairs = events(s, d)
      .select(expr("(ts div 1000) div 86400000000").as("day"), col("user_id"))
      .distinct()
    val days = pairs.select(col("day").as("d")).distinct()
    broadcast(days)
      .join(pairs, col("day").between(col("d") - 6, col("d")))
      .groupBy(col("d"))
      .agg(countDistinct(col("user_id")).as("wau"))
      .select(col("d").as("day"), col("wau"))
      .orderBy(col("day"))
  }

  val q47Oracle: String =
    """WITH pairs AS (SELECT DISTINCT epoch_ms(ts) // 86400000 AS day, user_id
      |  FROM events),
      |days AS (SELECT DISTINCT day AS d FROM pairs)
      |SELECT CAST(d AS BIGINT) AS day, count(DISTINCT user_id) AS wau
      |FROM days JOIN pairs ON day BETWEEN d - 6 AND d
      |GROUP BY d ORDER BY day""".stripMargin

  /** q48 — RECURSIVE CTE (hierarchy walk): Spark 4's `WITH RECURSIVE`
    * (SPARK-24497) exercised as a registered, oracle-checked capability.
    * Users form an implicit referral forest — user u's referrer is
    * `u div 2` (u > 1; 0 and 1 are roots) — and the query walks it from
    * the roots, labeling every user with referral depth, then aggregates
    * per depth. Pure integer arithmetic: DuckDB replays the identical
    * recursion (`//` = `div` on non-negatives) so counts and id sums
    * hash exactly.
    *
    * Scale shape: each recursion level is ONE equi-join of the frontier
    * against the (distinct-user) node table on the halved key plus a
    * union — levels ≈ log₂(max user id), so a 10⁹-user forest is ~30
    * bounded joins, each shuffle-partitioned on the join key; the
    * frontier never exceeds the node count. This is the same shape as
    * n4's hand-rolled label propagation, but planner-managed. */
  def q48RecursiveChain(s: SparkSession, d: String): DataFrame = {
    // The `users` distinct is MATERIALIZED before the recursion (r14):
    // as an inline CTE it lands inside the UnionLoop's recursive leg,
    // which re-evaluates its plan ONCE PER RECURSION LEVEL — the before
    // plan showed `Aggregate [user_id] ← Relation parquet` under the
    // UnionLoopRef, i.e. depth ≈ log₂|users| full corpus scans +
    // distinct aggregations (O(depth·corpus) at 100 TB). The eager
    // localCheckpoint truncates it to an in-memory RDD scan, so each
    // level joins the ≤|users|-row table instead of rescanning events;
    // the recursion's row set is byte-identical.
    val users = events(s, d).select(col("user_id")).distinct()
      .localCheckpoint(true)
    Views.sql(s, users, "graft_q48_users_v",
      """WITH RECURSIVE walk(node, depth) AS (
        |  SELECT user_id, CAST(0 AS BIGINT) FROM graft_q48_users_v
        |  WHERE user_id <= 1
        |  UNION ALL
        |  SELECT u.user_id, w.depth + 1
        |  FROM walk w JOIN graft_q48_users_v u
        |    ON u.user_id div 2 = w.node AND u.user_id > 1
        |)
        |SELECT depth, count(1) AS n_users, sum(node) AS id_sum,
        |  min(node) AS min_id, max(node) AS max_id
        |FROM walk GROUP BY depth ORDER BY depth""".stripMargin)
  }

  val q48Oracle: String =
    """WITH RECURSIVE users AS (SELECT DISTINCT user_id FROM events),
      |walk(node, depth) AS (
      |  SELECT user_id, CAST(0 AS BIGINT) FROM users WHERE user_id <= 1
      |  UNION ALL
      |  SELECT u.user_id, w.depth + 1
      |  FROM walk w JOIN users u ON u.user_id // 2 = w.node AND u.user_id > 1
      |)
      |SELECT depth, count(*) AS n_users, CAST(sum(node) AS BIGINT) AS id_sum,
      |  min(node) AS min_id, max(node) AS max_id
      |FROM walk GROUP BY depth ORDER BY depth""".stripMargin

  /** q57 — SEQUENTIAL CONVERSION FUNNEL (view → click → purchase): the
    * ordered-event-pattern aggregation every product-analytics engine
    * ships as its funnel operator. A user reaches step n+1 only with an
    * event of that type STRICTLY AFTER their step-n time (first-touch
    * attribution: each step binds to its earliest qualifying event). Per
    * step: users reached and the exact total step-transition gap in
    * MICROS (BIGINT — q17's precision rule, so the hash is float-free).
    *
    * Scale shape: each step is a partial+final min-aggregation on
    * user_id over a type-pruned scan (the event_type filter reaches the
    * parquet scan), and each step JOIN is an equi-join on user_id against
    * a funnel that only ever SHRINKS — at 100 TB the step-1 aggregate is
    * the largest intermediate at one row per converting user, and AQE
    * broadcasts the later (smaller) funnel sides. No window over the raw
    * event stream, no per-user sort: ordering enters only through min()
    * and the strictly-after join condition. */
  def q57Funnel(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).withColumn("tus", expr("ts div 1000"))
      .select(col("user_id"), col("event_type"), col("tus"))
    val step1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tus")).as("t1"))
    val step2 = ev.filter(col("event_type") === "click")
      .join(step1, "user_id").filter(col("tus") > col("t1"))
      .groupBy(col("user_id"), col("t1")).agg(min(col("tus")).as("t2"))
    val step3 = ev.filter(col("event_type") === "purchase")
      .join(step2, "user_id").filter(col("tus") > col("t2"))
      .groupBy(col("user_id"), col("t2")).agg(min(col("tus")).as("t3"))
    step1.agg(count(lit(1)).as("users"), lit(0L).as("sum_gap_us"))
      .withColumn("step", lit(1L))
      .unionByName(step2
        .agg(count(lit(1)).as("users"),
          coalesce(sum(col("t2") - col("t1")), lit(0L)).as("sum_gap_us"))
        .withColumn("step", lit(2L)))
      .unionByName(step3
        .agg(count(lit(1)).as("users"),
          coalesce(sum(col("t3") - col("t2")), lit(0L)).as("sum_gap_us"))
        .withColumn("step", lit(3L)))
      .select(col("step"), col("users"), col("sum_gap_us"))
      .orderBy(col("step"))
  }

  /** q57 oracle — DuckDB replays the same first-touch chain; epoch_us
    * sees the identical integers as `ts div 1000` (q17's rule). */
  val q57Oracle: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
      |s1 AS (SELECT user_id, min(tus) AS t1 FROM e
      |       WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, s1.t1, min(e.tus) AS t2
      |       FROM e JOIN s1 ON e.user_id = s1.user_id AND e.tus > s1.t1
      |       WHERE e.event_type = 'click' GROUP BY 1, 2),
      |s3 AS (SELECT e.user_id, s2.t2, min(e.tus) AS t3
      |       FROM e JOIN s2 ON e.user_id = s2.user_id AND e.tus > s2.t2
      |       WHERE e.event_type = 'purchase' GROUP BY 1, 2)
      |SELECT CAST(1 AS BIGINT) AS step, count(*) AS users,
      |  CAST(0 AS BIGINT) AS sum_gap_us FROM s1
      |UNION ALL
      |SELECT 2, count(*), CAST(coalesce(sum(t2 - t1), 0) AS BIGINT) FROM s2
      |UNION ALL
      |SELECT 3, count(*), CAST(coalesce(sum(t3 - t2), 0) AS BIGINT) FROM s3
      |ORDER BY step""".stripMargin

  /** q58 — NATIVE EXACT MEDIAN + DETERMINISTIC MODE: the two ordered-
    * statistic aggregates q18 (manual exact quantiles) and q27 (mergeable
    * sketch) bracket, exercised through Spark's NATIVE `median` and
    * `mode(…, deterministic)` functions so the built-ins themselves sit
    * under the gate: median's even-count interpolation is one IEEE
    * (a+b)/2 over two exact pass-through doubles (identical in DuckDB's
    * median), and mode's tie-break is pinned by the `deterministic`
    * flag (lowest value among the most frequent) — the only mode form a
    * hash gate can admit, since free-tie mode is nondeterministic under
    * parallel aggregation. The oracle re-derives the mode from first
    * principles (count + row_number) rather than trusting DuckDB's own
    * tie rule.
    *
    * Scale shape: both are single-pass aggregates per group — median is
    * Spark's exact percentile state (per-group value buffer: apt for
    * bounded per-group cardinality; q27's histogram is the unbounded-
    * group escape hatch, q18/p19's bucket-histogram selection the exact
    * one), mode is a bounded per-(group, value) count map. */
  def q58MedianMode(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        expr("median(value)").as("med_value"),
        expr("mode(user_id, true)").as("top_user"))
      .orderBy(col("event_type"))

  val q58Oracle: String =
    """WITH c AS (SELECT event_type, user_id, count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |m AS (SELECT event_type, user_id FROM (
      |    SELECT event_type, user_id,
      |      row_number() OVER (PARTITION BY event_type
      |        ORDER BY cnt DESC, user_id) AS rn
      |    FROM c) t WHERE rn = 1)
      |SELECT e.event_type, count(*) AS n_events,
      |  median(e.value) AS med_value, min(m.user_id) AS top_user
      |FROM events e JOIN m ON m.event_type = e.event_type
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  /** q59 — ASSOCIATION RULES (market-basket support / confidence / lift):
    * the frequent-pair mining step behind recommender bootstraps and
    * catalog analytics — for every part pair co-purchased in ≥ 2 orders,
    * the classic rule metrics as EXACT parts-per-million integers, top 20
    * by lift under a full deterministic tie order. Float-free by q17's
    * precision rule: support = co·10⁶ div N, confidence = co·10⁶ div
    * cnt(a), and lift is STAGED as (conf_ppm · N) div cnt(b) — the first
    * factor is ≤ 10⁶ by construction (co ≤ cnt(a) always), so the product
    * stays in BIGINT for any order count below ~9.2·10¹² (vs the naive
    * co·N·10⁶ which overflows past N ≈ 3·10⁶). The staged floor order is
    * the pinned semantics; both engines replay it bit-for-bit.
    *
    * Scale shape: the corpus-sized work is ONE basket fold
    * ([[GraphOps.coPurchaseBaskets]]: a single shuffle on the order key,
    * map-side collect_set dedup) feeding both the bounded-fanout pair
    * generator and the item counts — and since r13 the REGISTERED query
    * reads that fold from [[GraphOps.coPurchaseStageDir]], the stage
    * SHARED with g3, so a sweep pays the 270 M-pair fold once, not
    * twice (VERDICT r12 #2). The order total is a bounded driver read
    * of the staged 1-row table, so NO 1-row total rides a broadcast
    * build thread (the naive formulation recomputed a corpus-sized
    * distinct inside the 300 s-capped broadcast thread — found at the
    * sf10 slope check). Item counts re-join the pair table on single
    * part keys (AQE-broadcast: |parts| rows), and the top-20 is a
    * TakeOrdered, never a global sort. */
  def q59AssocRules(s: SparkSession, d: String): DataFrame =
    q59RuleChain(s, GraphOps.coPurchasePairs2(s, d),
      GraphOps.coPurchaseItems(s, d), GraphOps.coPurchaseOrderTotal(s, d))

  /** The bounded rule chain over an (already aggregated) pair table —
    * shared between the staged registered query and the unstaged
    * plan-gate builder, so the pinned staged-integer semantics cannot
    * fork between the two. */
  private def q59RuleChain(s: SparkSession, pr: DataFrame, ic: DataFrame,
      nOrders: Long): DataFrame =
    Views.sqlN(s, Seq(pr -> "prv", ic -> "icv"),
      s"""WITH r AS (SELECT pa AS part_a, pb AS part_b, w AS co_cnt,
        |    (w * 1000000) div $nOrders AS supp_ppm,
        |    (w * 1000000) div ca.cnt AS conf_ppm,
        |    (((w * 1000000) div ca.cnt) * $nOrders) div cb.cnt
        |      AS lift_ppm
        |  FROM prv JOIN icv ca ON ca.pk = prv.pa
        |       JOIN icv cb ON cb.pk = prv.pb
        |  WHERE w >= 2)
        |SELECT part_a, part_b, co_cnt, supp_ppm, conf_ppm, lift_ppm
        |FROM r ORDER BY lift_ppm DESC, part_a, part_b LIMIT 20""".stripMargin)

  /** q59's UNSTAGED lazy plan + the persisted basket table — the g2
    * seam, so PlanSpec / RoundTwelveBOpsSpec can gate the join shapes
    * and the cache-read discipline of the underlying fold (the
    * registered query reads the staged parquet instead — the t22
    * precedent). */
  private[graft] def q59AssocRulesPlan(s: SparkSession,
      d: String): (DataFrame, DataFrame) = {
    val baskets = GraphOps.coPurchaseBaskets(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nOrders = baskets.count() // materializes the cache AND the total
    val pr = GraphOps.basketPairs(baskets)
    val ic = baskets.select(explode(col("ps")).as("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("cnt"))
    (q59RuleChain(s, pr, ic, nOrders), baskets)
  }

  /** q59 oracle — the identical staged-integer rule chain in DuckDB. */
  val q59Oracle: String =
    """WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |    FROM lineitem),
      |n AS (SELECT count(DISTINCT ok) AS n_orders FROM po),
      |ic AS (SELECT pk, count(*) AS cnt FROM po GROUP BY pk),
      |pr AS (SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS co_cnt
      |  FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2),
      |r AS (SELECT part_a, part_b, co_cnt,
      |    (co_cnt * 1000000) // n.n_orders AS supp_ppm,
      |    (co_cnt * 1000000) // ca.cnt AS conf_ppm,
      |    (((co_cnt * 1000000) // ca.cnt) * n.n_orders) // cb.cnt
      |      AS lift_ppm
      |  FROM pr JOIN ic ca ON ca.pk = pr.part_a
      |       JOIN ic cb ON cb.pk = pr.part_b CROSS JOIN n
      |  WHERE co_cnt >= 2)
      |SELECT part_a, part_b, co_cnt, supp_ppm, conf_ppm, lift_ppm
      |FROM r ORDER BY lift_ppm DESC, part_a, part_b LIMIT 20""".stripMargin

  /** q60 — NATIVE ORDERED-SET AGGREGATES (`percentile_cont` /
    * `percentile_disc` WITHIN GROUP): the SQL:2003 ordered-set surface,
    * exercised through Spark's native implementations so the built-ins
    * themselves sit under the gate (q58's discipline for median/mode;
    * q18/q27/p19 bracket the same statistics with manual derivations).
    * Hash-safety: the input is INTEGRAL (quantities cast to BIGINT), the
    * percentiles are dyadic (0.25/0.75), and n < 2⁵⁰ — so the cont
    * interpolation lo + (hi−lo)·frac is EXACT in IEEE doubles in any
    * association order, and the engines cannot diverge by a ULP. The
    * disc leg: Spark 4.1.2's non-legacy `PercentileDisc.getPercentile`
    * computes `ceil(n·p)` in IEEE doubles and binary-searches the
    * cumulative counts for the first value whose running count reaches
    * that rank. The oracle replays it as the `cume_dist ≥ p` double
    * comparison (rank/n ≥ 0.9), which for the pinned p = 0.9 is
    * numerically equivalent to `rank ≥ ceil(0.9·n)` — the double
    * products 0.9·n and rank/n land on the same side of every boundary
    * for n < 2⁵⁰ (verified against the catalyst implementation).
    * 0.9 is NOT dyadic, so if NEW percentiles are added here, keep them
    * dyadic or re-verify the two forms coincide for that p before
    * trusting the comparison-form oracle.
    *
    * Scale shape: Spark's exact percentile state is a per-group value
    * buffer — apt here because groups are few and bounded; q27's
    * mergeable histogram and q18/p19's bucket-histogram selection remain
    * the documented unbounded-group escape hatches. */
  def q60PercentileNative(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY q)").as("p25"),
        expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY q)").as("p75"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY q)")
          .cast("long").as("p90_disc"))
      .orderBy(col("l_returnflag"))

  /** q60 oracle — both statistics re-derived from first principles
    * (row_number + the exact interpolation / comparison rules), never
    * trusting DuckDB's own quantile functions. */
  val q60Oracle: String =
    """WITH v AS (SELECT l_returnflag AS rf, CAST(l_quantity AS BIGINT) AS q
      |    FROM lineitem),
      |o AS (SELECT rf, q,
      |    row_number() OVER (PARTITION BY rf ORDER BY q) - 1 AS rn,
      |    count(*) OVER (PARTITION BY rf) AS n FROM v),
      |pc AS (SELECT rf, max(n) AS n,
      |    min(CASE WHEN rn = CAST(floor(0.25 * (n - 1)) AS BIGINT)
      |        THEN q END) AS lo25,
      |    min(CASE WHEN rn = CAST(ceil(0.25 * (n - 1)) AS BIGINT)
      |        THEN q END) AS hi25,
      |    min(0.25 * (n - 1) - floor(0.25 * (n - 1))) AS f25,
      |    min(CASE WHEN rn = CAST(floor(0.75 * (n - 1)) AS BIGINT)
      |        THEN q END) AS lo75,
      |    min(CASE WHEN rn = CAST(ceil(0.75 * (n - 1)) AS BIGINT)
      |        THEN q END) AS hi75,
      |    min(0.75 * (n - 1) - floor(0.75 * (n - 1))) AS f75,
      |    min(CASE WHEN CAST(rn + 1 AS DOUBLE) / n >= 0.9
      |        THEN q END) AS p90d
      |  FROM o GROUP BY rf)
      |SELECT rf AS l_returnflag, CAST(n AS BIGINT) AS n_rows,
      |  lo25 + (hi25 - lo25) * f25 AS p25,
      |  lo75 + (hi75 - lo75) * f75 AS p75,
      |  CAST(p90d AS BIGINT) AS p90_disc
      |FROM pc ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_percentile_native" -> (q60PercentileNative _),
    "q59_assoc_rules" -> (q59AssocRules _),
    "q58_median_mode" -> (q58MedianMode _),
    "q57_funnel" -> (q57Funnel _),
    "q48_recursive_chain" -> (q48RecursiveChain _),
    "q49_map_functions" -> (q49MapFunctions _),
    "q55_bitmap" -> (q55Bitmap _),
    "q54_listagg" -> (q54Listagg _),
    "q53_collation" -> (q53Collation _),
    "q52_from_xml" -> (q52FromXml _),
    "q51_variant" -> (q51Variant _),
    "q50_try_functions" -> (q50TryFunctions _),
    "q46_locf" -> (q46Locf _),
    "q47_rolling_wau" -> (q47RollingWau _),
    "q42_posexplode" -> (q42Posexplode _),
    "q43_lateral_topk" -> (q43LateralTopk _),
    "q44_regexp_extract" -> (q44RegexpExtract _),
    "q45_array_ops" -> (q45ArrayOps _),
    "q40_null_aware_anti" -> (q40NullAwareAnti _),
    "q41_multi_distinct" -> (q41MultiDistinct _),
    "q36_rank_distribution" -> (q36RankDistribution _),
    "q37_scd2_intervals" -> (q37Scd2Intervals _),
    "q38_boundary_values" -> (q38BoundaryValues _),
    "q39_exact_moments" -> (q39ExactMoments _),
    "q23_exists_correlated" -> (q23ExistsCorrelated _),
    "q21_intersect" -> (q21Intersect _),
    "q26_except_all" -> (q26ExceptAll _),
    "q33_intersect_all" -> (q33IntersectAll _),
    "q34_from_json" -> (q34FromJson _),
    "q35_calendar" -> (q35Calendar _),
    "q27_histogram_quantiles" -> (q27HistogramQuantiles _),
    "q22_json_extract" -> (q22JsonExtract _),
    "q20_above_avg_orders" -> (q20AboveAvgOrders _),
    "q18_quantiles" -> (q18Quantiles _),
    "q19_pivot" -> (q19Pivot _),
    "q11_rollup" -> (q11Rollup _),
    "q16_cube" -> (q16Cube _),
    "q28_grouping_sets" -> (q28GroupingSets _),
    "q29_ntile_quartiles" -> (q29Ntile _),
    "q30_range_frame" -> (q30RangeFrame _),
    "q32_unpivot" -> (q32Unpivot _),
    "q17_event_gaps" -> (q17EventGaps _),
    "q12_event_time_window" -> (q12EventTimeWindow _),
    "q25_sliding_window" -> (q25SlidingWindow _),
    "q13_union_balances" -> (q13UnionBalances _),
    "q14_approx_distinct" -> (q14ApproxDistinct _),
    "q24_hll_portable" -> (q24HllPortable _),
    "q15_price_stats_udaf" -> (q15PriceStatsUdaf _)
  )

  /** q14 omitted: HLL++ sketch values are engine-specific (rows-only);
    * q24 is its fully-oracle-checked portable twin. */
  val oracles: Map[String, String] = Map(
    "q60_percentile_native" -> q60Oracle,
    "q59_assoc_rules" -> q59Oracle,
    "q58_median_mode" -> q58Oracle,
    "q57_funnel" -> q57Oracle,
    "q46_locf" -> q46Oracle,
    "q47_rolling_wau" -> q47Oracle,
    "q42_posexplode" -> q42Oracle,
    "q43_lateral_topk" -> q43Oracle,
    "q44_regexp_extract" -> q44Oracle,
    "q45_array_ops" -> q45Oracle,
    "q40_null_aware_anti" -> q40Oracle,
    "q41_multi_distinct" -> q41Oracle,
    "q36_rank_distribution" -> q36Oracle,
    "q37_scd2_intervals" -> q37Oracle,
    "q38_boundary_values" -> q38Oracle,
    "q39_exact_moments" -> q39Oracle,
    "q24_hll_portable" -> q24Oracle,
    "q23_exists_correlated" -> q23Oracle,
    "q21_intersect" -> q21Oracle,
    "q26_except_all" -> q26Oracle,
    "q33_intersect_all" -> q33Oracle,
    "q34_from_json" -> q34Oracle,
    "q35_calendar" -> q35Oracle,
    "q27_histogram_quantiles" -> q27Oracle,
    "q22_json_extract" -> q22Oracle,
    "q20_above_avg_orders" -> q20Oracle,
    "q18_quantiles" -> q18Oracle,
    "q19_pivot" -> q19Oracle,
    "q11_rollup" -> q11Oracle,
    "q16_cube" -> q16Oracle,
    "q28_grouping_sets" -> q28Oracle,
    "q29_ntile_quartiles" -> q29Oracle,
    "q30_range_frame" -> q30Oracle,
    "q32_unpivot" -> q32Oracle,
    "q17_event_gaps" -> q17Oracle,
    "q48_recursive_chain" -> q48Oracle,
    "q49_map_functions" -> q49Oracle,
    "q55_bitmap" -> q55Oracle,
    "q54_listagg" -> q54Oracle,
    "q53_collation" -> q53Oracle,
    "q52_from_xml" -> q52Oracle,
    "q51_variant" -> q51Oracle,
    "q50_try_functions" -> q50Oracle,
    "q12_event_time_window" -> q12Oracle,
    "q25_sliding_window" -> q25Oracle,
    "q13_union_balances" -> q13Oracle,
    "q15_price_stats_udaf" -> q15Oracle
  )
}
