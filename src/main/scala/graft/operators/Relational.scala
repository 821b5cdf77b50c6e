package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator surface of the reference (SURVEY.md §2.2–§2.6),
  * re-expressed Spark-first over the driver testdata.
  *
  * Reference-semantics → testdata mapping (SURVEY.md §7.1): the fraud/normal
  * dichotomy maps to `l_returnflag` ('R' = "fraud"), `Amount` maps to
  * `l_extendedprice`, the hour bucket maps to `date_trunc('hour', events.ts)`.
  *
  * Every query here is declarative DataFrame API so Catalyst gets full
  * freedom: predicate pushdown into the Parquet scan, column pruning,
  * partial (map-side) aggregation before the shuffle, and
  * `TakeOrderedAndProject` for top-k. Scale notes are per-query.
  */
object Relational {

  /** Six-way price bucketing — the reference's CASE amount bins
    * (`notebooks/2_sql_analysis.ipynb:369-373,604-640`, SURVEY §2.2 P5),
    * rescaled to `l_extendedprice`'s 901..105000 range.
    */
  private def priceBin(c: Column): Column =
    when(c < 10000, "<10k")
      .when(c < 25000, "10k-25k")
      .when(c < 50000, "25k-50k")
      .when(c < 75000, "50k-75k")
      .when(c < 90000, "75k-90k")
      .otherwise("90k+")

  /** Custom bucket ordering — the reference sorts histogram rows with
    * `ORDER BY CASE WHEN plage='0-10' THEN 1 ... END`
    * (`2_sql_analysis.ipynb:626-640`, SURVEY §2.6 O3).
    */
  private def binOrdinal(c: Column): Column =
    when(c === "<10k", 1)
      .when(c === "10k-25k", 2)
      .when(c === "25k-50k", 3)
      .when(c === "50k-75k", 4)
      .when(c === "75k-90k", 5)
      .otherwise(6)

  private val binCaseSql =
    """CASE WHEN l_extendedprice < 10000 THEN '<10k'
      |     WHEN l_extendedprice < 25000 THEN '10k-25k'
      |     WHEN l_extendedprice < 50000 THEN '25k-50k'
      |     WHEN l_extendedprice < 75000 THEN '50k-75k'
      |     WHEN l_extendedprice < 90000 THEN '75k-90k'
      |     ELSE '90k+' END""".stripMargin
  private val binOrdSql =
    """CASE WHEN price_bin = '<10k' THEN 1 WHEN price_bin = '10k-25k' THEN 2
      |     WHEN price_bin = '25k-50k' THEN 3 WHEN price_bin = '50k-75k' THEN 4
      |     WHEN price_bin = '75k-90k' THEN 5 ELSE 6 END""".stripMargin

  /** q01 — flagship: 2-D amount-bin histogram (SURVEY §7.2; reference
    * `2_sql_analysis.ipynb:682-718`). CASE bins × returnflag →
    * count/avg/min/max, ORDER BY CASE.
    *
    * Scale: single shuffle on (bin, flag) — 18 groups regardless of input
    * size; partial aggregation reduces each map task to ≤18 rows before the
    * exchange, so this is scan-bound at 100 TB. Scan reads only 2 columns.
    */
  def q01PriceHistogram2d(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_extendedprice"), col("l_returnflag"))
    li.withColumn("price_bin", priceBin(col("l_extendedprice")))
      .groupBy(col("price_bin"), col("l_returnflag"))
      .agg(
        count(lit(1)).as("cnt"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
      .orderBy(binOrdinal(col("price_bin")), col("l_returnflag"))
  }

  private val q01Sql =
    s"""SELECT $binCaseSql AS price_bin, l_returnflag,
       |       CAST(count(*) AS BIGINT) AS cnt,
       |       round(avg(l_extendedprice), 2) AS avg_price,
       |       min(l_extendedprice) AS min_price,
       |       max(l_extendedprice) AS max_price
       |FROM lineitem
       |GROUP BY 1, 2
       |ORDER BY $binOrdSql, l_returnflag""".stripMargin

  /** q02 — class distribution: groupBy-count (reference
    * `1_data_cleaning.ipynb:200`, SURVEY §2.4 A1).
    * Scale: 3 groups; map-side combine makes the shuffle negligible.
    */
  def q02ClassDistribution(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("l_returnflag"))

  private val q02Sql =
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt
      |FROM lineitem GROUP BY 1 ORDER BY cnt DESC, l_returnflag""".stripMargin

  /** q03 — multi-aggregate per-class stats (reference
    * `2_sql_analysis.ipynb:243-251`, SURVEY §2.4 A2): count/avg/sum/max/min/
    * stddev of the amount per class. `stddev` = sample stddev in both Spark
    * and DuckDB. Sums/avgs rounded so float summation order (partition
    * count) can't flip the oracle hash.
    */
  def q03MultiAggStats(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("cnt"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        max(col("l_extendedprice")).as("max_price"),
        min(col("l_extendedprice")).as("min_price"),
        round(stddev(col("l_extendedprice")), 2).as("std_price"))
      .orderBy(col("l_returnflag"))

  private val q03Sql =
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt,
      |       round(avg(l_extendedprice), 2) AS avg_price,
      |       round(sum(l_extendedprice), 2) AS sum_price,
      |       max(l_extendedprice) AS max_price,
      |       min(l_extendedprice) AS min_price,
      |       round(stddev(l_extendedprice), 2) AS std_price
      |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  /** q04 — per-column null audit in ONE pass (reference
    * `1_data_cleaning.ipynb:168-173`, SURVEY §2.4 A6): 11 conditional
    * aggregates over all lineitem columns, no shuffle beyond the single
    * global-aggregate exchange of ≤11 longs per task.
    */
  def q04NullAudit(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.select(li.columns.toIndexedSeq.map(c =>
      sum(col(c).isNull.cast("int")).cast("long").as(c)): _*)
  }

  private val q04Sql = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    val exprs = cols.map(c =>
      s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS $c")
    s"SELECT ${exprs.mkString(", ")} FROM lineitem"
  }

  /** q05 — global aggregate with conditional counters and guarded division
    * (reference `setup_postgres.ps1:485-492`, SURVEY §2.4 A4/A5): total
    * rows, "fraud" (R-flag) rows via sum(when), fraud percentage with a
    * divide-by-zero guard. Single global agg: one exchange of one row.
    */
  def q05ConditionalAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .agg(
        count(lit(1)).as("total_rows"),
        sum(when(col("l_returnflag") === "R", 1).otherwise(0))
          .cast("long").as("fraud_rows"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        round(sum(when(col("l_returnflag") === "R", col("l_extendedprice"))
          .otherwise(0.0)), 2).as("fraud_amount"))
      .withColumn("fraud_pct",
        when(col("total_rows") > 0,
          round(col("fraud_rows") * lit(100.0) / col("total_rows"), 4))
          .otherwise(0.0))

  private val q05Sql =
    """SELECT CAST(count(*) AS BIGINT) AS total_rows,
      |       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS fraud_rows,
      |       round(avg(l_extendedprice), 2) AS avg_price,
      |       round(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END), 2) AS fraud_amount,
      |       CASE WHEN count(*) > 0
      |            THEN round(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 100.0 / count(*), 4)
      |            ELSE 0.0 END AS fraud_pct
      |FROM lineitem""".stripMargin

  /** q06 — top-k: highest-value "fraud" rows (reference
    * `2_sql_analysis.ipynb:444-450,555-558`, SURVEY §2.6 O4). Catalyst
    * plans `TakeOrderedAndProject`: each partition keeps its local top-10,
    * the driver merges — no global sort, no full shuffle. Tie-broken on
    * unique (orderkey, linenumber) for a deterministic oracle hash.
    */
  def q06TopFraudAmounts(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R" && col("l_extendedprice") > 90000)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("l_quantity"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
      .limit(10)

  private val q06Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
      |FROM lineitem
      |WHERE l_returnflag = 'R' AND l_extendedprice > 90000
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 10""".stripMargin

  /** q07 — conjunctive range filter + projection (reference
    * `4_graphx.ipynb:564`; `2_sql_analysis.ipynb:555`, SURVEY §2.2 P4).
    * Both predicates and the 4-column projection push into the Parquet
    * scan (`PushedFilters`/`ReadSchema`); top-k bounds the result.
    */
  def q07RangeFilter(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") >= 10 && col("l_quantity") <= 20
        && col("l_returnflag") === "A")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .limit(100)

  private val q07Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_quantity >= 10 AND l_quantity <= 20 AND l_returnflag = 'A'
      |ORDER BY l_orderkey, l_linenumber
      |LIMIT 100""".stripMargin

  /** q08 — the SQL path (reference `2_sql_analysis.ipynb:604-640`, SURVEY
    * §2.4 A3): temp view + `spark.sql` with the CASE expression repeated in
    * GROUP BY, quantity aggregates, ORDER BY CASE. Identical Catalyst plan
    * to the DSL path — this query pins the parse→analyze→optimize lifecycle
    * (SURVEY §3.1).
    */
  def q08SqlCaseGroupBy(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
    s.sql(
      s"""SELECT ${binCaseSql.replace("l_extendedprice", "l_extendedprice")} AS price_bin,
         |       count(*) AS cnt,
         |       round(sum(l_quantity), 2) AS sum_qty,
         |       round(avg(l_discount), 4) AS avg_disc
         |FROM lineitem_v
         |GROUP BY $binCaseSql
         |ORDER BY $binOrdSql""".stripMargin)
  }

  private val q08Sql =
    s"""SELECT $binCaseSql AS price_bin,
       |       CAST(count(*) AS BIGINT) AS cnt,
       |       round(sum(l_quantity), 2) AS sum_qty,
       |       round(avg(l_discount), 4) AS avg_disc
       |FROM lineitem
       |GROUP BY 1
       |ORDER BY $binOrdSql""".stripMargin

  /** q09 — distinct (reference `4_graphx.ipynb:150,208`, SURVEY §2.4 A8):
    * dedup of a 2-column projection. Planned as a hash aggregate on all
    * columns; partial aggregation dedups map-side before the shuffle, so
    * shuffle volume is bounded by distinct cardinality, not input rows.
    */
  def q09DistinctParts(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_returnflag"))
      .distinct()
      .orderBy(col("l_partkey"), col("l_returnflag"))

  private val q09Sql =
    """SELECT DISTINCT l_partkey, l_returnflag
      |FROM lineitem ORDER BY l_partkey, l_returnflag""".stripMargin

  /** q10 — multi-way equi-join + aggregate (SURVEY §2.3 J2): orders ⋈
    * customer ⋈ nation → revenue per nation.
    *
    * Scale: nation (25 rows) and customer (1.5M at SF100) are the small
    * sides — `broadcast()` on nation is explicit; customer⋈orders shuffles
    * on custkey. At 100 TB the orders side dominates: aggregation AFTER the
    * join keeps one shuffle on custkey + one on n_name (25 groups,
    * map-combined). AQE converts the customer join to broadcast when the
    * post-scan size is under the threshold.
    */
  def q10JoinRevenuePerNation(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_custkey"), col("o_totalprice"))
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("n_name"))
  }

  private val q10Sql =
    """SELECT n_name, CAST(count(*) AS BIGINT) AS n_orders,
      |       round(sum(o_totalprice), 2) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1 ORDER BY n_name""".stripMargin

  /** q11 — left outer join + null coalesce (reference PageRank dangling-node
    * handling, `4_graphx.ipynb:873-876`, SURVEY §2.3 J3 + §2.2 P6): orders
    * LEFT JOIN per-order high-value lineitem totals; orders with no match
    * get coalesce(0).
    *
    * Scale: the lineitem side is aggregated to one row per orderkey BEFORE
    * the join (map-side combine shrinks the shuffle), then the join runs
    * on the reduced set — never join-then-aggregate when the aggregate can
    * go first. Final re-agg per orderstatus is 3 groups.
    */
  def q11LeftJoinCoalesce(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderstatus"))
    val hi = Tables.lineitem(s, dir)
      .filter(col("l_extendedprice") > 90000)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice")).as("hi_amount"))
    o.join(hi, o("o_orderkey") === hi("l_orderkey"), "left_outer")
      .select(col("o_orderstatus"),
        coalesce(col("hi_amount"), lit(0.0)).as("hi_amount"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("hi_amount")), 2).as("hi_revenue"),
        sum((col("hi_amount") > 0).cast("int")).cast("long")
          .as("orders_with_hi"))
      .orderBy(col("o_orderstatus"))
  }

  private val q11Sql =
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
      |       round(sum(coalesce(hi_amount, 0.0)), 2) AS hi_revenue,
      |       CAST(sum(CASE WHEN coalesce(hi_amount, 0.0) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS orders_with_hi
      |FROM orders
      |LEFT JOIN (SELECT l_orderkey, sum(l_extendedprice) AS hi_amount
      |           FROM lineitem WHERE l_extendedprice > 90000
      |           GROUP BY 1) h
      |  ON o_orderkey = h.l_orderkey
      |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin

  /** q12 — hourly aggregate mart table (reference `hourly_transactions`,
    * `setup_postgres.ps1:429-437`, SURVEY §2.11): hour bucket from the
    * event timestamp, 4 aggregates, ordered, top-100. The hour is emitted
    * as epoch seconds (BIGINT) so the Spark-vs-DuckDB comparison never
    * depends on timestamp encoding (the testdata stores ns precision,
    * Spark reads µs).
    *
    * Scale: groups = hours-in-corpus (bounded, ~720/month) → map-side
    * combine collapses each task to the hour count before the exchange.
    */
  def q12HourlyEvents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("ts").cast("timestamp").as("ts"), col("value"))
      .withColumn("hour_epoch",
        unix_timestamp(date_trunc("hour", col("ts"))))
      .groupBy(col("hour_epoch"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"),
        round(avg(col("value")), 2).as("avg_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("hour_epoch"))
      .limit(100)

  private val q12Sql =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       round(sum(value), 2) AS sum_value,
      |       round(avg(value), 2) AS avg_value,
      |       max(value) AS max_value
      |FROM events
      |GROUP BY 1 ORDER BY hour_epoch LIMIT 100""".stripMargin

  /** q13 — global event stats incl. exact count-distinct (SURVEY §2.4 A4;
    * extends the reference's global_stats table).
    * Scale: count(DISTINCT user_id) expands to a two-phase aggregate
    * (distinct on user_id, then count) — at 100 TB prefer
    * `approx_count_distinct` (HLL) unless exactness is required; the exact
    * form is kept here because the oracle demands exact equality.
    */
  def q13GlobalEventStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("value"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 2).as("sum_value"),
        sum(when(col("event_type") === "error", 1).otherwise(0))
          .cast("long").as("n_errors"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0))
          .cast("long").as("n_purchases"))

  private val q13Sql =
    """SELECT CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |       round(sum(value), 2) AS sum_value,
      |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
      |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
      |FROM events""".stripMargin

  /** q14 — two-level "Grafana mart" (reference `grafana_dashboard`,
    * `setup_postgres.ps1:554-591`, SURVEY §2.11): hourly aggregates
    * re-aggregated to days with conditional sums and guarded percentage
    * division. The reference round-trips level 1 through Postgres; here
    * both levels compose in one plan (Catalyst collapses them — the mart
    * round-trip with a real sink lives in [[graft.sinks.MartPipeline]]).
    */
  def q14GrafanaMart(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"),
        col("value"))
      .withColumn("day_epoch", unix_timestamp(date_trunc("day", col("ts"))))
      .withColumn("is_error",
        when(col("event_type") === "error", 1).otherwise(0))
      .groupBy(col("day_epoch"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"))
      .agg(count(lit(1)).as("n"), sum(col("is_error")).as("errs"),
        sum(col("value")).as("v"))
    hourly
      .groupBy(col("day_epoch"))
      .agg(sum(col("n")).cast("long").as("total_events"),
        sum(col("errs")).cast("long").as("total_errors"),
        round(sum(col("v")), 2).as("total_value"),
        count(lit(1)).as("active_hours"))
      .withColumn("error_pct",
        when(col("total_events") > 0,
          round(col("total_errors") * lit(100.0) / col("total_events"), 4))
          .otherwise(0.0))
      .orderBy(col("day_epoch"))
  }

  private val q14Sql =
    """SELECT day_epoch,
      |       CAST(sum(n) AS BIGINT) AS total_events,
      |       CAST(sum(errs) AS BIGINT) AS total_errors,
      |       round(sum(v), 2) AS total_value,
      |       CAST(count(*) AS BIGINT) AS active_hours,
      |       CASE WHEN sum(n) > 0
      |            THEN round(sum(errs) * 100.0 / sum(n), 4)
      |            ELSE 0.0 END AS error_pct
      |FROM (SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch,
      |             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
      |             count(*) AS n,
      |             sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errs,
      |             sum(value) AS v
      |      FROM events GROUP BY 1, 2) hourly
      |GROUP BY day_epoch ORDER BY day_epoch""".stripMargin

  /** q15 — describe() equivalent (reference `1_data_cleaning.ipynb:228`,
    * SURVEY §2.4 A7): count/mean/stddev/min/max of one column as a single
    * global aggregate row.
    */
  def q15DescribePrice(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_extendedprice"))
      .agg(count(lit(1)).as("cnt"),
        round(avg(col("l_extendedprice")), 2).as("mean_price"),
        round(stddev(col("l_extendedprice")), 2).as("std_price"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))

  private val q15Sql =
    """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |       round(avg(l_extendedprice), 2) AS mean_price,
      |       round(stddev(l_extendedprice), 2) AS std_price,
      |       min(l_extendedprice) AS min_price,
      |       max(l_extendedprice) AS max_price
      |FROM lineitem""".stripMargin

  /** q16 — per-row derived-column projection (reference streaming derive
    * stage, `spark_streaming.py:37-42`, SURVEY §2.2 P2/P5/P6/P7): CASE tag,
    * cast, coalesce, arithmetic — the exact stateless transform the
    * streaming module applies ([[graft.streaming.StreamTransform]] reuses
    * this logic on the unbounded plan). Narrow-only: zero shuffles except
    * the top-k.
    */
  def q16EventDerive(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"),
        col("ts").cast("timestamp").as("ts"))
      .withColumn("type_tag",
        when(col("event_type") === "error", "fraud")
          .when(col("event_type") === "purchase", "money")
          .otherwise("normal"))
      .withColumn("value_filled",
        coalesce(col("value"), lit(0.0)))
      .withColumn("value_cents",
        round(col("value_filled") * 100).cast("long"))
      .withColumn("hour_epoch",
        unix_timestamp(date_trunc("hour", col("ts"))))
      .select(col("event_id"), col("type_tag"), col("value_cents"),
        col("hour_epoch"))
      .orderBy(col("event_id"))
      .limit(1000)

  private val q16Sql =
    """SELECT event_id,
      |       CASE WHEN event_type = 'error' THEN 'fraud'
      |            WHEN event_type = 'purchase' THEN 'money'
      |            ELSE 'normal' END AS type_tag,
      |       CAST(round(coalesce(value, 0.0) * 100, 0) AS BIGINT) AS value_cents,
      |       CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch
      |FROM events ORDER BY event_id LIMIT 1000""".stripMargin

  /** q17 — Spark 4 SQL PIPE syntax (`|>`): the same filter → aggregate →
    * order chain q01-style queries write, in the linear top-to-bottom
    * form Spark 4 added (each `|>` stage consumes the previous table —
    * no inside-out nesting). Same Catalyst plan as the classic spelling;
    * the oracle IS the classic spelling, proving the equivalence. The
    * aggregate rides the exact decimal carrier like every money sum.
    */
  def q17PipeSyntax(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("q17_lineitem")
    s.sql(
      s"""FROM q17_lineitem
         ||> WHERE l_quantity > 10
         ||> AGGREGATE CAST(count(*) AS BIGINT) AS n,
         |     ${Det.sqlR(Det.sqlDsum("l_extendedprice"), 2)} AS revenue
         |     GROUP BY l_returnflag
         ||> ORDER BY l_returnflag""".stripMargin)
  }

  private val q17Sql =
    s"""SELECT l_returnflag,
       |  CAST(count(*) AS BIGINT) AS n,
       |  ${Det.sqlR(Det.sqlDsum("l_extendedprice"), 2)} AS revenue
       |FROM lineitem
       |WHERE l_quantity > 10
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin

  /** ONE literal SQL body for both engines (e13's no-drift pattern):
    * correlated EXISTS + two correlated scalar subqueries. Catalyst
    * DECORRELATES all three into joins (left-semi for EXISTS, aggregated
    * left-outer for the scalars) — the rewrite that makes correlated SQL
    * scale-safe: the naive per-row re-execution a row engine does would
    * be |customer| scans of orders; the decorrelated plan is two shuffles.
    */
  private def q18Body(customer: String, orders: String) =
    s"""SELECT c.c_custkey, c.c_name,
       |  (SELECT CAST(count(*) AS BIGINT) FROM $orders o
       |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
       |  (SELECT max(o_totalprice) FROM $orders o
       |   WHERE o.o_custkey = c.c_custkey) AS max_order
       |FROM $customer c
       |WHERE EXISTS (SELECT 1 FROM $orders o
       |              WHERE o.o_custkey = c.c_custkey
       |                AND o.o_orderpriority = '1-URGENT')
       |ORDER BY c.c_custkey""".stripMargin

  /** q18 — correlated subqueries (EXISTS + scalar), decorrelated. */
  def q18CorrelatedSubqueries(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("q18_customer")
    Tables.orders(s, dir).createOrReplaceTempView("q18_orders")
    s.sql(q18Body("q18_customer", "q18_orders"))
  }

  private val q18Sql = q18Body("customer", "orders")

  /** ONE literal SQL body for both engines: a correlated LATERAL subquery
    * with ORDER BY … LIMIT — "top-2 customers per nation" written the way
    * an analyst writes it, per-nation. Catalyst DECORRELATES the lateral
    * limit into a window rank over one joined scan (DomainJoin rewrite) —
    * so the plan is one shuffle + one bounded per-key sort, not |nation|
    * re-executions of the inner query; that rewrite is what makes lateral
    * SQL admissible at 100 TB. Inner lateral: nations with no customers
    * drop out, identically in both engines.
    */
  private def q19Body(nation: String, customer: String) =
    s"""SELECT n.n_name, t.c_name, t.c_acctbal
       |FROM $nation n, LATERAL (
       |  SELECT c_name, c_acctbal FROM $customer c
       |  WHERE c.c_nationkey = n.n_nationkey
       |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
       |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin

  /** q19 — lateral top-n per group, decorrelated. */
  def q19LateralTopn(s: SparkSession, dir: String): DataFrame = {
    Tables.nation(s, dir).createOrReplaceTempView("q19_nation")
    Tables.customer(s, dir).createOrReplaceTempView("q19_customer")
    s.sql(q19Body("q19_nation", "q19_customer"))
  }

  private val q19Sql = q19Body("nation", "customer")

  /** The ONE SQL text [[q20RecursiveDecay]] runs on BOTH engines — every
    * construct (recursive UNION ALL CTE, window row_number, max_by,
    * floor-div spelling) chosen from the intersection of Spark 4 and
    * DuckDB SQL, so the oracle check certifies Spark 4.1's native
    * `WITH RECURSIVE` execution against DuckDB's mature implementation
    * on identical text.
    */
  private val q20Text =
    """WITH RECURSIVE chain AS (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn
      |  FROM orders),
      |walk(o_custkey, rn, decayed) AS (
      |  SELECT o_custkey, rn, cents FROM chain WHERE rn = 1
      |  UNION ALL
      |  SELECT c.o_custkey, c.rn,
      |    CAST(floor(w.decayed / 2.0) AS BIGINT) + c.cents
      |  FROM walk w JOIN chain c
      |    ON c.o_custkey = w.o_custkey AND c.rn = w.rn + 1)
      |SELECT o_custkey, CAST(max(rn) AS BIGINT) AS n_orders,
      |  max_by(decayed, rn) AS decayed_cents
      |FROM walk
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** q20 — NATIVE RECURSIVE CTE (Spark 4's `WITH RECURSIVE`): walk each
    * customer's order chain in date order computing the integer decay
    * recurrence bal_n = ⌊bal_{n−1}/2⌋ + cents_n — a genuine recurrence no
    * window aggregate expresses (each step depends on the previous
    * OUTPUT, not the previous inputs; the "running half-life balance" of
    * credit scoring). The recursion is LINEAR — each iteration joins the
    * frontier (one row per still-extending customer chain) to its rank's
    * successor, so the working set SHRINKS as short chains finish; with
    * UNION ALL (all Spark 4 supports in recursion) that linearity is what
    * keeps the plan bounded — a graph walk here would explode, which is
    * exactly why the closure oracles live DuckDB-side only (g03/g23).
    *
    * The oracle is the IDENTICAL SQL text ([[q20Text]]) — this check
    * certifies the new native recursion execution itself cross-engine.
    *
    * Scale: iterations = max chain length (orders per customer — tens,
    * data-bounded, not data-sized); each iteration one keyed equi-join of
    * the shrinking frontier against a rank-partitioned chain table.
    */
  def q20RecursiveDecay(s: SparkSession, dir: String): DataFrame = {
    // total walk rows = |orders| (one per chain element), which trips
    // Spark's 1M-row recursion safety default past sf0.1 — raise the
    // guard, don't disable it: runaway recursion should still abort
    s.conf.set("spark.sql.cteRecursionRowLimit", (100 * 1000 * 1000).toString)
    graft.Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(q20Text)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_recursive_decay" -> (q20RecursiveDecay _),
    "q17_pipe_syntax" -> (q17PipeSyntax _),
    "q18_correlated_subqueries" -> (q18CorrelatedSubqueries _),
    "q19_lateral_topn" -> (q19LateralTopn _),
    "q01_price_histogram_2d" -> (q01PriceHistogram2d _),
    "q02_class_distribution" -> (q02ClassDistribution _),
    "q03_multi_agg_stats" -> (q03MultiAggStats _),
    "q04_null_audit" -> (q04NullAudit _),
    "q05_conditional_agg" -> (q05ConditionalAgg _),
    "q06_top_fraud_amounts" -> (q06TopFraudAmounts _),
    "q07_range_filter" -> (q07RangeFilter _),
    "q08_sql_case_groupby" -> (q08SqlCaseGroupBy _),
    "q09_distinct_parts" -> (q09DistinctParts _),
    "q10_join_revenue_per_nation" -> (q10JoinRevenuePerNation _),
    "q11_left_join_coalesce" -> (q11LeftJoinCoalesce _),
    "q12_hourly_events" -> (q12HourlyEvents _),
    "q13_global_event_stats" -> (q13GlobalEventStats _),
    "q14_grafana_mart" -> (q14GrafanaMart _),
    "q15_describe_price" -> (q15DescribePrice _),
    "q16_event_derive" -> (q16EventDerive _)
  )

  val oracles: Map[String, String] = Map(
    "q20_recursive_decay" -> q20Text,
    "q17_pipe_syntax" -> q17Sql,
    "q18_correlated_subqueries" -> q18Sql,
    "q19_lateral_topn" -> q19Sql,
    "q01_price_histogram_2d" -> q01Sql,
    "q02_class_distribution" -> q02Sql,
    "q03_multi_agg_stats" -> q03Sql,
    "q04_null_audit" -> q04Sql,
    "q05_conditional_agg" -> q05Sql,
    "q06_top_fraud_amounts" -> q06Sql,
    "q07_range_filter" -> q07Sql,
    "q08_sql_case_groupby" -> q08Sql,
    "q09_distinct_parts" -> q09Sql,
    "q10_join_revenue_per_nation" -> q10Sql,
    "q11_left_join_coalesce" -> q11Sql,
    "q12_hourly_events" -> q12Sql,
    "q13_global_event_stats" -> q13Sql,
    "q14_grafana_mart" -> q14Sql,
    "q15_describe_price" -> q15Sql,
    "q16_event_derive" -> q16Sql
  )
}
