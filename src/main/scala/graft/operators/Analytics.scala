package graft.operators

import graft.Caches.Tracked

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multi-join analytical queries in the TPC-H shape — the workload class
  * the engine must sustain at 100 TB (the reference's analytics are all
  * single-table + one dim join; these exercise 3–5-table join trees with
  * selective date/flag predicates).
  *
  * Plan goals (asserted in PlanSpec where stable): every filter reaches its
  * scan, small dims broadcast, the fact-fact join (orders ⋈ lineitem)
  * shuffles once on the shared key, aggregation is partial before the final
  * exchange, top-k is TakeOrderedAndProject.
  */
object Analytics {

  /** a01 — shipping-priority (TPC-H Q3 shape): revenue of undelivered
    * orders per (orderkey, orderdate) for one segment, top-10.
    */
  def a01ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      // the filtered customer side scales with |customers| (unbounded at
      // 100 TB), so no hard hint — AQE broadcasts it when actually small
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"),
        unix_timestamp(col("o_orderdate")).as("o_orderdate_epoch"))
      .agg(Det.r(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val a01Sql = {
    // l_extendedprice * (1 - l_discount) is a product of 2-dp and 2-dp-ish
    // doubles — not exactly representable; Det carries it at DECIMAL(28,4)
    // after the double multiply, which both engines compute identically.
    val rev = Det.sqlR(Det.sqlDsum("l_extendedprice * (1 - l_discount)"), 2)
    s"""SELECT l_orderkey,
       |  CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_epoch,
       |  $rev AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |  AND l_shipdate > TIMESTAMP '1998-01-01'
       |GROUP BY 1, 2
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin
  }

  /** a02 — local-supplier volume (TPC-H Q5 shape): revenue where customer
    * and supplier share a nation, per nation, one region + date year.
    * Five-table tree: region→nation broadcast down; the lineitem ⋈ orders
    * fact join dominates and shuffles on orderkey; supplier and customer
    * joins hash on their keys with the nation equality as the final
    * residual.
    */
  def a02LocalSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir)
      .filter(col("r_name") === "ASIA").select("r_regionkey")
    val n = Tables.nation(s, dir)
      .select("n_nationkey", "n_name", "n_regionkey")
    val rn = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select("n_nationkey", "n_name")
    val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(sup, l("l_suppkey") === sup("s_suppkey"))
      .join(c, o("o_custkey") === c("c_custkey")
        && sup("s_nationkey") === c("c_nationkey"))
      .join(broadcast(rn), c("c_nationkey") === rn("n_nationkey"))
      .groupBy("n_name")
      .agg(Det.r(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val a02Sql = {
    val rev = Det.sqlR(Det.sqlDsum("l_extendedprice * (1 - l_discount)"), 2)
    s"""SELECT n_name, $rev AS revenue, CAST(count(*) AS BIGINT) AS n_items
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin
  }

  /** a03 — TPC-H Q1 shape done properly (the reference's per-class stats
    * are its 2-column cousin): full pricing-summary aggregate battery per
    * (returnflag, linestatus) with derived measures.
    */
  def a03PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Det.r(Det.dsum(col("l_quantity")), 2).as("sum_qty"),
        Det.r(Det.dsum(col("l_extendedprice")), 2).as("sum_base_price"),
        Det.r(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        Det.davg(col("l_quantity"), 2).as("avg_qty"),
        Det.davg(col("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val a03Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Det.sqlR(Det.sqlDsum("l_quantity"), 2)} AS sum_qty,
       |  ${Det.sqlR(Det.sqlDsum("l_extendedprice"), 2)} AS sum_base_price,
       |  ${Det.sqlR(Det.sqlDsum("l_extendedprice * (1 - l_discount)"), 2)} AS sum_disc_price,
       |  ${Det.sqlDavg("l_quantity", 2)} AS avg_qty,
       |  ${Det.sqlDavg("l_discount", 4)} AS avg_disc,
       |  CAST(count(*) AS BIGINT) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
       |GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** a04 — weekly retention cohorts over the event stream: cohort = a
    * user's first active ISO week, retention = distinct users from that
    * cohort active k weeks later, as count and rate. The canonical
    * product-analytics query; its shape — per-entity first-touch aggregate
    * re-joined to the entity's activity — is the one every "as-of-first"
    * metric reduces to.
    *
    * Scale: two distinct-aggregations keyed by user (map-side combined)
    * plus one join on user_id that co-partitions with the first aggregate's
    * shuffle; cohort sizes are |weeks| rows — broadcast back. UTC epochs
    * make week arithmetic pure integers (no DST), mirrored exactly.
    */
  def a04RetentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.events(s, dir)
      .select(col("user_id"),
        unix_timestamp(date_trunc("week", col("ts"))).as("wk"))
      .distinct()
    val firsts = weekly.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
    val sizes = firsts.groupBy("cohort_wk")
      .agg(count(lit(1)).as("cohort_size"))
    weekly.join(firsts, "user_id")
      .withColumn("week_offset", expr("(wk - cohort_wk) div 604800"))
      .groupBy("cohort_wk", "week_offset")
      .agg(countDistinct(col("user_id")).as("active_users"))
      // bounded: one row per cohort WEEK — ∝ the stream's time span
      // (~1k rows for 20 years), not its volume
      .join(broadcast(sizes), "cohort_wk")
      .select(col("cohort_wk"), col("week_offset"), col("active_users"),
        col("cohort_size"),
        Det.r(col("active_users").cast("double") / col("cohort_size"), 4)
          .as("retention"))
      .orderBy("cohort_wk", "week_offset")
  }

  private val a04Sql =
    s"""WITH weekly AS (
       |  SELECT DISTINCT user_id,
       |    CAST(epoch(date_trunc('week', ts)) AS BIGINT) AS wk
       |  FROM events),
       |firsts AS (SELECT user_id, min(wk) AS cohort_wk
       |           FROM weekly GROUP BY 1),
       |sizes AS (SELECT cohort_wk, CAST(count(*) AS BIGINT) AS cohort_size
       |          FROM firsts GROUP BY 1),
       |act AS (SELECT f.cohort_wk, (w.wk - f.cohort_wk) // 604800 AS week_offset,
       |          CAST(count(DISTINCT w.user_id) AS BIGINT) AS active_users
       |        FROM weekly w JOIN firsts f ON f.user_id = w.user_id
       |        GROUP BY 1, 2)
       |SELECT a.cohort_wk, a.week_offset, a.active_users, s.cohort_size,
       |  ${Det.sqlR("CAST(a.active_users AS DOUBLE) / s.cohort_size", 4)}
       |    AS retention
       |FROM act a JOIN sizes s ON s.cohort_wk = a.cohort_wk
       |ORDER BY 1, 2""".stripMargin

  /** a05 — ordered-sequence funnel over the event stream: users who
    * signed up, then viewed AFTER signing up, then purchased AFTER that
    * view — each stage anchored on the previous stage's first-completion
    * time, which plain per-type counts cannot express. One row: stage
    * populations and conversion rates.
    *
    * Scale: a chain of per-user min-aggregations, each joined to the
    * previous stage on user_id — every shuffle keys on the same column,
    * so the stages co-partition and the chain is as wide as ONE
    * aggregation. The alternative window spelling (sort each user's full
    * history) pays a per-user sort this never needs.
    */
  def a05Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    def stage(prev: DataFrame, typ: String, prevT: String, outT: String) =
      ev.filter(col("event_type") === typ)
        .join(prev, "user_id")
        .filter(col("ts") > col(prevT))
        .groupBy("user_id").agg(min(col("ts")).as(outT))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val s2 = stage(s1, "view", "t1", "t2")
    val s3 = stage(s2, "purchase", "t2", "t3")
    val totals = ev.select("user_id").distinct()
      .agg(count(lit(1)).as("users"))
    val stages = s1
      .join(s2, Seq("user_id"), "left_outer")
      .join(s3, Seq("user_id"), "left_outer")
      .agg(count(col("t1")).as("signed_up"),
        count(col("t2")).as("viewed_after"),
        count(col("t3")).as("purchased_after"))
    totals.crossJoin(stages)
      .select(col("users"), col("signed_up"), col("viewed_after"),
        col("purchased_after"),
        Det.r(col("signed_up").cast("double") / col("users"), 4)
          .as("conv_signup"),
        Det.r(col("viewed_after").cast("double") / col("signed_up"), 4)
          .as("conv_view"),
        Det.r(col("purchased_after").cast("double") / col("viewed_after"), 4)
          .as("conv_purchase"))
  }

  private val a05Sql =
    s"""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
       |            WHERE event_type = 'signup' GROUP BY 1),
       |s2 AS (SELECT e.user_id, min(e.ts) AS t2
       |       FROM events e JOIN s1 ON s1.user_id = e.user_id
       |       WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1),
       |s3 AS (SELECT e.user_id, min(e.ts) AS t3
       |       FROM events e JOIN s2 ON s2.user_id = e.user_id
       |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
       |SELECT
       |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events) AS users,
       |  (SELECT CAST(count(*) AS BIGINT) FROM s1) AS signed_up,
       |  (SELECT CAST(count(*) AS BIGINT) FROM s2) AS viewed_after,
       |  (SELECT CAST(count(*) AS BIGINT) FROM s3) AS purchased_after,
       |  ${Det.sqlR("CAST((SELECT count(*) FROM s1) AS DOUBLE) / (SELECT count(DISTINCT user_id) FROM events)", 4)} AS conv_signup,
       |  ${Det.sqlR("CAST((SELECT count(*) FROM s2) AS DOUBLE) / (SELECT count(*) FROM s1)", 4)} AS conv_view,
       |  ${Det.sqlR("CAST((SELECT count(*) FROM s3) AS DOUBLE) / (SELECT count(*) FROM s2)", 4)} AS conv_purchase""".stripMargin

  /** a06 — behavior co-occurrence LIFT (market-basket over event types):
    * for every event-type pair, how much more often do both appear in
    * the SAME user's history than independence predicts —
    * lift = P(a∧b) / (P(a)·P(b)) over the user population. Lift > 1 is
    * the cross-sell / risk-bundle signal; the graph layer's edges count
    * co-occurrence, this NORMALIZES it by marginal prevalence.
    *
    * Scale: the self-join runs on the user×type DISTINCT set (≤ |users|
    * × |type domain|, tiny vs events), type marginals and the user total
    * are broadcast one-row/few-row frames, and the division is one
    * deterministic double op snapped at 4 dp. The event scan happens
    * once, map-side combined into the distinct.
    */
  def a06CooccurrenceLift(s: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(s, dir)
      .select(col("user_id"), col("event_type")).distinct().tracked
    val totals = ut.agg(countDistinct(col("user_id")).as("n_users"))
    val marg = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val pairs = ut.alias("a")
      .join(ut.alias("b"),
        col("a.user_id") === col("b.user_id")
          && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(marg.select(col("event_type").as("type_a"),
        col("n").as("n_a"))), Seq("type_a"))
      .join(broadcast(marg.select(col("event_type").as("type_b"),
        col("n").as("n_b"))), Seq("type_b"))
      .crossJoin(broadcast(totals))
      .select(col("type_a"), col("type_b"), col("n_both"),
        col("n_a"), col("n_b"),
        Det.r(col("n_both").cast("double") * col("n_users")
          / (col("n_a") * col("n_b")), 4).as("lift"))
      .orderBy("type_a", "type_b")
  }

  private val a06Sql =
    s"""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
       |totals AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       |           FROM ut),
       |marg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
       |         FROM ut GROUP BY 1),
       |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
       |            CAST(count(*) AS BIGINT) AS n_both
       |          FROM ut a JOIN ut b ON a.user_id = b.user_id
       |            AND a.event_type < b.event_type
       |          GROUP BY 1, 2)
       |SELECT type_a, type_b, n_both, ma.n AS n_a, mb.n AS n_b,
       |  ${Det.sqlR(
      "CAST(n_both AS DOUBLE) * n_users / (ma.n * mb.n)", 4)} AS lift
       |FROM pairs
       |JOIN marg ma ON ma.event_type = type_a
       |JOIN marg mb ON mb.event_type = type_b
       |CROSS JOIN totals
       |ORDER BY type_a, type_b""".stripMargin

  /** a07 — RFM (recency / frequency / monetary) customer segmentation,
    * the canonical commerce behavioral cut. Each customer gets three
    * boolean grades against fixed business thresholds — last order within
    * a year, ≥ 12 lifetime orders, ≥ $3M lifetime value — concatenated
    * into an `R-F-M` flag segment, then the segment census with exact
    * per-segment stats. Fixed thresholds keep every comparison exact
    * (integer day counts, DECIMAL money — quintile scoring would need
    * data-dependent cuts: compose with e18's exact percentiles for that).
    *
    * Scale: one narrow scan → per-customer aggregate (the natural
    * pre-aggregation; |customers| ≪ |orders|) → 8-row segment census;
    * the reference date is a broadcast 1-row cross join, never a window.
    */
  def a07RfmSegments(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("freq"),
        Det.dsumDec(col("o_totalprice")).as("monetary"))
      .tracked // reused: reference date scalar + the graded census
    val ref = perCust.agg(max(col("last_day")).as("ref_day"))
    perCust.crossJoin(broadcast(ref))
      .select(
        concat(
          when(datediff(col("ref_day"), col("last_day")) <= 365, lit("R"))
            .otherwise(lit("-")),
          when(col("freq") >= 12, lit("F")).otherwise(lit("-")),
          when(col("monetary") >= lit(3000000), lit("M")).otherwise(lit("-")))
          .as("segment"),
        datediff(col("ref_day"), col("last_day")).cast("long")
          .as("recency_days"),
        col("freq"), col("monetary"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_customers"),
        Det.r(sum(col("recency_days")).cast("double") / count(lit(1)), 4)
          .as("avg_recency_days"),
        Det.r(sum(col("freq")).cast("double") / count(lit(1)), 4)
          .as("avg_frequency"),
        Det.r(sum(col("monetary")).cast("double"), 2).as("total_monetary"))
      .orderBy("segment")
  }

  private val a07Sql =
    s"""WITH per_cust AS (
       |  SELECT o_custkey,
       |    max(CAST(o_orderdate AS DATE)) AS last_day,
       |    CAST(count(*) AS BIGINT) AS freq,
       |    ${Det.sqlDsumDec("o_totalprice")} AS monetary
       |  FROM orders GROUP BY 1),
       |ref AS (SELECT max(last_day) AS ref_day FROM per_cust),
       |graded AS (
       |  SELECT
       |    concat(
       |      CASE WHEN date_diff('day', last_day, ref_day) <= 365
       |           THEN 'R' ELSE '-' END,
       |      CASE WHEN freq >= 12 THEN 'F' ELSE '-' END,
       |      CASE WHEN monetary >= 3000000 THEN 'M' ELSE '-' END) AS segment,
       |    CAST(date_diff('day', last_day, ref_day) AS BIGINT)
       |      AS recency_days,
       |    freq, monetary
       |  FROM per_cust CROSS JOIN ref)
       |SELECT segment, CAST(count(*) AS BIGINT) AS n_customers,
       |  ${Det.sqlR("CAST(sum(recency_days) AS DOUBLE) / count(*)", 4)}
       |    AS avg_recency_days,
       |  ${Det.sqlR("CAST(sum(freq) AS DOUBLE) / count(*)", 4)}
       |    AS avg_frequency,
       |  ${Det.sqlR("CAST(sum(monetary) AS DOUBLE)", 2)} AS total_monetary
       |FROM graded GROUP BY 1 ORDER BY segment""".stripMargin

  /** a08 — Gini coefficient of order-value concentration per market
    * segment ("how whale-dominated is each segment?") — the inequality
    * summary next to a07's census, and a fraud signal in its own right
    * (stolen-card rings concentrate value far beyond organic segments).
    *
    * EXACT via the grouped-histogram identity: for ascending values with
    * counts, a value v with count c and p rows before it contributes
    * v·c·(2p + c − n) to S = Σᵢ(2i − n − 1)xᵢ, so
    * Gini = S / (n·Σx) needs only integer cents, the bounded per-(segment,
    * value) histogram, and ONE final division — no per-row rank, no
    * global sort (e18's scale argument; the cum window rides the
    * segment-partitioned histogram).
    */
  def a08GiniConcentration(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = Tables.orders(s, dir)
      // customer scales with SF (unbounded) — AQE decides the join side
      .join(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("segment").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("segment")
    val D = "decimal(18,0)" // 18+18-digit products fit both engines' 38 cap
    hist
      .withColumn("p", sum(col("c")).over(w) - col("c")) // rows strictly before
      .withColumn("n", sum(col("c")).over(wAll))
      .groupBy("segment")
      .agg(
        max(col("n")).as("n_orders"),
        sum((col("v") * col("c")).cast(D)).as("total_cents"),
        sum((col("v") * col("c")).cast(D)
          * (col("p") * 2 + col("c") - col("n")).cast(D)).as("s"))
      .select(col("segment"), col("n_orders"),
        (col("total_cents").cast("double") / lit(100.0)).as("total_usd"),
        Det.r(col("s").cast("double")
          / (col("n_orders").cast(D) * col("total_cents")).cast("double"), 6)
          .as("gini"))
      .orderBy("segment")
  }

  private val a08Sql =
    s"""WITH hist AS (
       |  SELECT c.c_mktsegment AS segment,
       |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       |  GROUP BY 1, 2),
       |cum AS (
       |  SELECT segment, v, c,
       |    CAST(sum(c) OVER (PARTITION BY segment ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
       |      AS BIGINT) AS p,
       |    CAST(sum(c) OVER (PARTITION BY segment) AS BIGINT) AS n
       |  FROM hist)
       |SELECT segment, max(n) AS n_orders,
       |  CAST(CAST(sum(CAST(v * c AS DECIMAL(18,0))) AS DOUBLE) / 100.0
       |    AS DOUBLE) AS total_usd,
       |  ${Det.sqlR(
            "CAST(sum(CAST(v * c AS DECIMAL(18,0)) " +
              "* CAST(p * 2 + c - n AS DECIMAL(18,0))) AS DOUBLE) " +
              "/ CAST(CAST(max(n) AS DECIMAL(18,0)) " +
              "* sum(CAST(v * c AS DECIMAL(18,0))) AS DOUBLE)", 6)} AS gini
       |FROM cum GROUP BY 1 ORDER BY segment""".stripMargin

  /** a09 — seasonality-adjusted revenue anomalies: daily order revenue
    * compared against its ISO-weekday baseline (mean of the SAME weekday's
    * days), flagged when the residual leaves the weekday's ±2σ band. The
    * monitoring query every revenue dashboard runs — a raw daily threshold
    * misfires every weekend; conditioning on weekday is the minimal
    * seasonal model that stops that. Weekday from pure epoch-day
    * arithmetic ((d+3)%7+1 — p04's spelling, no timezone), baseline and σ
    * through the exact decimal carriers ([[Det.dsum]]/[[Det.dstddev]]), so
    * the band is engine- and partition-order-independent.
    *
    * Scale: one scan → per-day aggregate (bounded by the date span) →
    * 7-row weekday stats broadcast back over the daily table. Nothing
    * downstream of the first aggregate ever sees row-level data.
    */
  def a09SeasonalAnomalies(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Det
    val daily = Tables.orders(s, dir)
      .select(floor(unix_timestamp(col("o_orderdate")) / 86400).cast("long")
        .as("d"), col("o_totalprice"))
      .groupBy("d")
      .agg(Det.r(Det.dsum(col("o_totalprice")), 2).as("revenue"))
      .withColumn("iso_dow", (col("d") + 3) % 7 + 1)
      .tracked // consumed by the weekday stats and the final projection
    val dow = daily.groupBy("iso_dow")
      .agg(
        Det.r(Det.dsum(col("revenue")) / count(lit(1)), 4).as("baseline"),
        Det.dstddev(col("revenue"), 4).as("sigma"),
        count(lit(1)).as("n_days"))
    daily.join(broadcast(dow), Seq("iso_dow"))
      .select(
        col("d").as("epoch_day"), col("iso_dow"), col("revenue"),
        col("baseline"),
        Det.r(col("revenue") - col("baseline"), 4).as("residual"),
        when(col("n_days") > 1,
          abs(Det.r(col("revenue") - col("baseline"), 4))
            > col("sigma") * 2).as("is_anomaly"))
      .orderBy("epoch_day")
  }

  private val a09Sql = {
    import graft.operators.Det
    s"""WITH daily AS (
       |  SELECT d,
       |    ${Det.sqlR(Det.sqlDsum("o_totalprice"), 2)} AS revenue,
       |    (d + 3) % 7 + 1 AS iso_dow
       |  FROM (SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS d,
       |               o_totalprice
       |        FROM orders)
       |  GROUP BY d),
       |dow AS (
       |  SELECT iso_dow,
       |    ${Det.sqlR(s"${Det.sqlDsum("revenue")} / count(*)", 4)} AS baseline,
       |    ${Det.sqlDstddev("revenue", 4)} AS sigma,
       |    CAST(count(*) AS BIGINT) AS n_days
       |  FROM daily GROUP BY 1)
       |SELECT daily.d AS epoch_day, CAST(daily.iso_dow AS BIGINT) AS iso_dow,
       |  daily.revenue, dow.baseline,
       |  ${Det.sqlR("daily.revenue - dow.baseline", 4)} AS residual,
       |  CASE WHEN dow.n_days > 1 THEN
       |    abs(${Det.sqlR("daily.revenue - dow.baseline", 4)}) > dow.sigma * 2
       |  END AS is_anomaly
       |FROM daily JOIN dow ON dow.iso_dow = daily.iso_dow
       |ORDER BY epoch_day""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a09_seasonal_anomalies" -> (a09SeasonalAnomalies _),
    "a08_gini_concentration" -> (a08GiniConcentration _),
    "a07_rfm_segments" -> (a07RfmSegments _),
    "a06_cooccurrence_lift" -> (a06CooccurrenceLift _),
    "a01_shipping_priority" -> (a01ShippingPriority _),
    "a02_local_supplier_volume" -> (a02LocalSupplierVolume _),
    "a03_pricing_summary" -> (a03PricingSummary _),
    "a04_retention_cohorts" -> (a04RetentionCohorts _),
    "a05_funnel" -> (a05Funnel _))

  val oracles: Map[String, String] = Map(
    "a09_seasonal_anomalies" -> a09Sql,
    "a08_gini_concentration" -> a08Sql,
    "a07_rfm_segments" -> a07Sql,
    "a06_cooccurrence_lift" -> a06Sql,
    "a01_shipping_priority" -> a01Sql,
    "a02_local_supplier_volume" -> a02Sql,
    "a03_pricing_summary" -> a03Sql,
    "a04_retention_cohorts" -> a04Sql,
    "a05_funnel" -> a05Sql)
}
