package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Det

/** The reference's six-table JDBC mart pipeline (SURVEY.md §2.11,
  * `streaming/setup_postgres.ps1:416-591`) re-expressed over the testdata:
  * five aggregate tables + a two-level Grafana mart built by reading the
  * hourly table BACK from the sink and re-aggregating — the round-trip is
  * the point (the reference stages through Postgres; the zero-egress
  * environment stages through Parquet behind the same [[TableSink]]
  * interface, with the JDBC options preserved in [[JdbcSink]]).
  *
  * Scale: every table is a bounded-cardinality aggregate (classes, hours,
  * bins) — map-side partial aggregation collapses each task before the
  * exchange, so the pipeline is scan-bound; the mart level re-aggregates
  * only |hours| rows. `fraud_details` is the one row-level table and is
  * `limit(500)`-bounded like the reference's.
  */
trait TableSink {
  def write(df: DataFrame, table: String, mode: String): Unit
  def read(s: SparkSession, table: String): DataFrame
}

/** Local stand-in staging store (zero-egress environments). */
final class ParquetSink(dir: String) extends TableSink {
  def write(df: DataFrame, table: String, mode: String): Unit =
    df.write.mode(mode).parquet(s"$dir/$table")
  def read(s: SparkSession, table: String): DataFrame =
    s.read.parquet(s"$dir/$table")
}

/** The reference's JDBC sink shape (`setup_postgres.ps1:510-517`,
  * `spark_to_postgres.py:26-34`): batchsize 10000, overwrite semantics.
  * `truncate` is deliberately NOT set: the reference's `global_stats` write
  * failed on a truncate schema mismatch (`setup_postgres.ps1:163`), so plain
  * overwrite is the correct mode. Compiles against the built-in JDBC
  * source; unusable in this environment (no database), exercised via
  * [[ParquetSink]].
  */
final class JdbcSink(url: String, user: String, password: String)
    extends TableSink {
  private def opts(df: DataFrame, table: String) =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("user", user).option("password", password)
      .option("batchsize", 10000)
  def write(df: DataFrame, table: String, mode: String): Unit =
    opts(df, table).mode(mode).save()
  def read(s: SparkSession, table: String): DataFrame =
    s.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("user", user).option("password", password)
      .load()
}

object MartPipeline {

  /** Table 1 — class_distribution (`setup_postgres.ps1:416-424`). */
  def classDistribution(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag").as("class"))
      .agg(count(lit(1)).as("cnt"),
        Det.davg(col("l_extendedprice"), 2).as("avg_amount"))
      .orderBy("class")

  /** Table 2 — hourly_transactions (`setup_postgres.ps1:429-437`): hour
    * bucket + 4 aggregates, ordered, top-100.
    */
  def hourlyTransactions(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"),
        col("value"))
      .withColumn("hour_epoch", unix_timestamp(date_trunc("hour", col("ts"))))
      .groupBy("hour_epoch")
      .agg(count(lit(1)).as("n_tx"),
        sum(when(col("event_type") === "error", 1).otherwise(0))
          .cast("long").as("n_fraud"),
        Det.r(Det.dsum(col("value")), 2).as("sum_value"),
        Det.davg(col("value"), 2).as("avg_value"))
      .orderBy("hour_epoch")
      .limit(100)

  /** Table 3 — amount_analysis (`setup_postgres.ps1:446-460`): CASE bins ×
    * class.
    */
  def amountAnalysis(s: SparkSession, dir: String): DataFrame = {
    val bin = when(col("l_extendedprice") < 10000, "<10k")
      .when(col("l_extendedprice") < 50000, "10k-50k")
      .when(col("l_extendedprice") < 90000, "50k-90k")
      .otherwise("90k+")
    Tables.lineitem(s, dir)
      .withColumn("amount_range", bin)
      .groupBy(col("amount_range"), col("l_returnflag").as("class"))
      .agg(count(lit(1)).as("cnt"),
        Det.r(Det.dsum(col("l_extendedprice")), 2).as("sum_amount"))
      .orderBy("amount_range", "class")
  }

  /** Table 4 — fraud_details (`setup_postgres.ps1:468-480`): row-level
    * fraud slice with a generated surrogate id, bounded to 500. The id is
    * `monotonically_increasing_id` like the reference's — nondeterministic
    * across partitionings, hence excluded from any oracle (SURVEY §2.2 P9).
    */
  def fraudDetails(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .orderBy("l_orderkey", "l_linenumber")
      .limit(500)
      .withColumn("fraud_id", monotonically_increasing_id())
      .select("fraud_id", "l_orderkey", "l_linenumber", "l_extendedprice",
        "l_quantity")

  /** Table 5 — global_stats (`setup_postgres.ps1:485-492`): one-row global
    * aggregate with conditional fraud counters.
    */
  def globalStats(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .agg(count(lit(1)).as("total_tx"),
        sum(when(col("l_returnflag") === "R", 1).otherwise(0))
          .cast("long").as("fraud_tx"),
        Det.davg(col("l_extendedprice"), 2).as("avg_amount"))
      .withColumn("fraud_pct",
        when(col("total_tx") > 0,
          Det.r(col("fraud_tx") * lit(100.0) / col("total_tx"), 4))
          .otherwise(0.0))

  /** Level 2 — grafana_dashboard (`setup_postgres.ps1:554-591`): the hourly
    * table read back from the SINK and re-aggregated per day with
    * conditional sums and the guarded percentage division.
    */
  def grafanaDashboard(hourlyFromSink: DataFrame): DataFrame =
    hourlyFromSink
      .withColumn("day_epoch", (col("hour_epoch") - pmod(col("hour_epoch"), lit(86400L))))
      .groupBy("day_epoch")
      .agg(sum(col("n_tx")).cast("long").as("total_tx"),
        sum(col("n_fraud")).cast("long").as("total_fraud"),
        Det.r(Det.dsum(col("sum_value")), 2).as("total_value"),
        count(lit(1)).as("active_hours"))
      .withColumn("fraud_pct",
        when(col("total_tx") > 0,
          Det.r(col("total_fraud") * lit(100.0) / col("total_tx"), 4))
          .otherwise(0.0))
      .orderBy("day_epoch")

  /** Full pipeline: write the five level-1 tables, read hourly back through
    * the sink, write + return the mart (the reference's end-to-end flow).
    */
  def run(s: SparkSession, dir: String, sink: TableSink): DataFrame = {
    sink.write(classDistribution(s, dir), "class_distribution", "overwrite")
    sink.write(hourlyTransactions(s, dir), "hourly_transactions", "overwrite")
    sink.write(amountAnalysis(s, dir), "amount_analysis", "overwrite")
    sink.write(fraudDetails(s, dir), "fraud_details", "overwrite")
    sink.write(globalStats(s, dir), "global_stats", "overwrite")
    val mart = grafanaDashboard(sink.read(s, "hourly_transactions"))
    sink.write(mart, "grafana_dashboard", "overwrite")
    sink.read(s, "grafana_dashboard")
  }

  /** p01 — the pipeline as a registered query: stage through a temp-dir
    * ParquetSink and return the mart. Parquet round-trips are value-exact,
    * so the two-level result is fully oracle-checkable.
    */
  def p01MartPipeline(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mart").toString
    run(s, dir, new ParquetSink(tmp)).orderBy("day_epoch")
  }

  private val p01Sql = {
    val hourly =
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        |       CAST(count(*) AS BIGINT) AS n_tx,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_fraud,
        |       %s AS sum_value
        |FROM events GROUP BY 1 ORDER BY hour_epoch LIMIT 100"""
        .stripMargin.format(Det.sqlR(Det.sqlDsum("value"), 2))
    s"""SELECT day_epoch,
       |  CAST(sum(n_tx) AS BIGINT) AS total_tx,
       |  CAST(sum(n_fraud) AS BIGINT) AS total_fraud,
       |  ${Det.sqlR(Det.sqlDsum("sum_value"), 2)} AS total_value,
       |  CAST(count(*) AS BIGINT) AS active_hours,
       |  CASE WHEN sum(n_tx) > 0
       |       THEN ${Det.sqlR("CAST(sum(n_fraud) AS BIGINT) * 100.0 / sum(n_tx)", 4)}
       |       ELSE 0.0 END AS fraud_pct
       |FROM (SELECT hour_epoch - (hour_epoch % 86400) AS day_epoch, n_tx,
       |             n_fraud, sum_value
       |      FROM ($hourly))
       |GROUP BY day_epoch ORDER BY day_epoch""".stripMargin
  }

  /** p02 — SCD2 dimension build: each user's event_type history collapsed
    * into versioned validity ranges — a new version opens whenever the
    * attribute CHANGES (lag compare), `valid_to` comes from the next
    * version's start (lead), the open version is flagged current. The
    * slowly-changing-dimension type-2 load every warehouse runs, expressed
    * as two windows over one (user, ts) sort — Catalyst plans a single
    * shuffle+sort for both.
    *
    * Scale: one exchange keyed by the dimension's natural key; the change
    * filter drops unchanged rows BEFORE the lead window would... no — lead
    * must see only version rows, so the second window runs on the
    * already-collapsed (typically tiny) version stream, not the raw
    * events. Composes with c04's merge for incremental SCD2 loads.
    */
  def p02Scd2Dimension(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("epoch_s"), col("event_id"))
    val versions = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("epoch_s"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNull
        || col("prev_type") =!= col("event_type"))
    val byVersion = Window.partitionBy("user_id")
      .orderBy(col("epoch_s"), col("event_id"))
    versions
      .withColumn("version", row_number().over(byVersion).cast("long"))
      .withColumn("valid_to", lead(col("epoch_s"), 1).over(byVersion))
      .select(col("user_id"), col("version"),
        col("event_type").as("attr"),
        col("epoch_s").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "version")
  }

  private val p02Sql =
    """SELECT user_id, version, attr, valid_from, valid_to,
      |  valid_to IS NULL AS is_current
      |FROM (
      |  SELECT user_id,
      |    CAST(row_number() OVER w AS BIGINT) AS version,
      |    event_type AS attr, epoch_s AS valid_from,
      |    lead(epoch_s, 1) OVER w AS valid_to
      |  FROM (
      |    SELECT event_id, user_id, event_type, epoch_s,
      |      lag(event_type, 1) OVER (PARTITION BY user_id
      |        ORDER BY epoch_s, event_id) AS prev_type
      |    FROM (SELECT event_id, user_id, event_type,
      |            CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
      |          FROM events))
      |  WHERE prev_type IS NULL OR prev_type <> event_type
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s, event_id))
      |ORDER BY user_id, version""".stripMargin

  /** p03 — TEMPORAL DIMENSION LOOKUP (the consumption side of SCD2):
    * enrich every purchase event with the dimension version active AT
    * THAT EVENT'S TIME. The dimension is an SCD2 built from a DISJOINT
    * signal — each user's error-severity band (minor/major by value),
    * versioned at band change-points — so the lookup is a genuine
    * cross-stream point-in-validity-range join; purchases before a
    * user's first error version resolve to NULL (left semantics).
    *
    * Spelled as the union-window AS-OF (w04's shape), not a range join:
    * version-start rows and probes union, one (user, time) sort, and
    * `last(attr, ignoreNulls)` carries the active version forward. Tie
    * discipline at equal seconds: versions sort before probes (tag),
    * and among same-second versions the HIGHEST version wins — exactly
    * the zero-length-version exclusion the range-join oracle applies
    * via `valid_from <= t < valid_to`. ONE shuffle on user_id; a range
    * join would BNLJ.
    */
  def p03TemporalLookup(s: SparkSession, dir: String): DataFrame = {
    val band = when(col("value") < 50.0, "minor").otherwise("major")
    val errs = graft.Tables.events(s, dir)
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("epoch_s"),
        band.as("attr"))
    val byU = Window.partitionBy("user_id")
      .orderBy(col("epoch_s"), col("event_id"))
    val changes = errs
      .withColumn("prev", lag(col("attr"), 1).over(byU))
      .filter(col("prev").isNull || col("prev") =!= col("attr"))
    val versions = changes
      .withColumn("version", row_number().over(Window.partitionBy("user_id")
        .orderBy(col("epoch_s"), col("event_id"))).cast("long"))
    val probes = graft.Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("epoch_s"))
    val unioned = versions
      .select(col("user_id"), col("epoch_s"), lit(0).as("tag"),
        col("version"), col("attr"),
        lit(null).cast("long").as("event_id"))
      .unionByName(probes.select(col("user_id"), col("epoch_s"),
        lit(1).as("tag"), lit(null).cast("long").as("version"),
        lit(null).cast("string").as("attr"), col("event_id")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("epoch_s"), col("tag"),
        coalesce(col("version"), lit(Long.MaxValue)), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("cur_version",
        last(col("version"), ignoreNulls = true).over(w))
      .withColumn("cur_attr", last(col("attr"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"), col("epoch_s"),
        col("cur_version").as("version"), col("cur_attr").as("attr"))
      .orderBy("event_id")
  }

  private val p03Sql =
    """WITH versions AS (
      |  SELECT user_id,
      |    CAST(row_number() OVER w AS BIGINT) AS version,
      |    attr, epoch_s AS valid_from,
      |    lead(epoch_s, 1) OVER w AS valid_to
      |  FROM (
      |    SELECT event_id, user_id, epoch_s, attr,
      |      lag(attr, 1) OVER (PARTITION BY user_id
      |        ORDER BY epoch_s, event_id) AS prev
      |    FROM (SELECT event_id, user_id,
      |            CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
      |            CASE WHEN value < 50.0 THEN 'minor' ELSE 'major' END AS attr
      |          FROM events WHERE event_type = 'error'))
      |  WHERE prev IS NULL OR prev <> attr
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s, event_id)),
      |probes AS (
      |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, p.epoch_s, v.version, v.attr
      |FROM probes p LEFT JOIN versions v
      |  ON p.user_id = v.user_id
      | AND v.valid_from <= p.epoch_s
      | AND (v.valid_to IS NULL OR p.epoch_s < v.valid_to)
      |ORDER BY p.event_id""".stripMargin

  /** p04 — CALENDAR DIMENSION build: the contiguous day spine over the
    * fact table's date span with the standard derived attributes, left-
    * joined to daily order stats so zero-activity days appear explicitly
    * (the property a BI tool needs and a bare `GROUP BY day` can never
    * give). ISO weekday comes from PURE EPOCH ARITHMETIC
    * ((epoch_day + 3) % 7 + 1 — 1970-01-01 was a Thursday), NOT the
    * engines' dow() functions, whose week-start conventions differ
    * (Spark 1=Sunday, DuckDB 0=Sunday); year/month/quarter come from the
    * UTC date both engines derive identically. Spine = `sequence` over
    * the span (one row per day — calendar-bounded, w11's argument), span
    * endpoints broadcast.
    */
  def p04CalendarDim(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Det
    val o = graft.Tables.orders(s, dir)
      .select(floor(unix_timestamp(col("o_orderdate")) / 86400).cast("long")
        .as("d"), col("o_totalprice"))
    val span = o.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val spine = span
      .select(explode(sequence(col("d0"), col("d1"))).as("d"))
    val daily = o.groupBy("d")
      .agg(count(lit(1)).as("n_orders"),
        Det.dsumDec(col("o_totalprice")).as("tot"))
    spine.join(daily, Seq("d"), "left")
      .select(
        col("d").as("epoch_day"),
        ((col("d") + 3) % 7 + 1).as("iso_dow"),
        (((col("d") + 3) % 7 + 1) >= 6).as("is_weekend"),
        // pure DATE arithmetic (epoch day + calendar), no timestamp/zone
        year(date_add(lit("1970-01-01").cast("date"), col("d").cast("int")))
          .as("year"),
        month(date_add(lit("1970-01-01").cast("date"), col("d").cast("int")))
          .as("month"),
        floor((month(date_add(lit("1970-01-01").cast("date"),
          col("d").cast("int"))) + 2) / 3).cast("int").as("quarter"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        Det.r(coalesce(col("tot"), lit(0)).cast("double"), 2).as("total_usd"))
      .orderBy("epoch_day")
  }

  private val p04Sql = {
    import graft.operators.Det
    s"""WITH o AS (
       |  SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS d,
       |         o_totalprice
       |  FROM orders),
       |span AS (SELECT min(d) AS d0, max(d) AS d1 FROM o),
       |spine AS (
       |  SELECT unnest(generate_series(d0, d1)) AS d FROM span),
       |daily AS (
       |  SELECT d, CAST(count(*) AS BIGINT) AS n_orders,
       |    ${Det.sqlDsumDec("o_totalprice")} AS tot
       |  FROM o GROUP BY 1)
       |SELECT s.d AS epoch_day,
       |  CAST((s.d + 3) % 7 + 1 AS BIGINT) AS iso_dow,
       |  ((s.d + 3) % 7 + 1) >= 6 AS is_weekend,
       |  CAST(year(DATE '1970-01-01' + CAST(s.d AS INT)) AS INT) AS year,
       |  CAST(month(DATE '1970-01-01' + CAST(s.d AS INT)) AS INT) AS month,
       |  CAST(floor((month(DATE '1970-01-01' + CAST(s.d AS INT)) + 2) / 3.0)
       |       AS INT) AS quarter,
       |  CAST(coalesce(dl.n_orders, 0) AS BIGINT) AS n_orders,
       |  ${Det.sqlR("CAST(coalesce(dl.tot, 0) AS DOUBLE)", 2)} AS total_usd
       |FROM spine s LEFT JOIN daily dl ON s.d = dl.d
       |ORDER BY epoch_day""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p04_calendar_dim" -> (p04CalendarDim _),
    "p01_mart_pipeline" -> (p01MartPipeline _),
    "p02_scd2_dimension" -> (p02Scd2Dimension _),
    "p03_temporal_lookup" -> (p03TemporalLookup _),
    "p05_cdc_apply" -> (p05CdcApply _),
    "p06_incremental_agg" -> (p06IncrementalAgg _))

  val oracles: Map[String, String] = Map(
    "p04_calendar_dim" -> p04Sql,
    "p01_mart_pipeline" -> p01Sql,
    "p02_scd2_dimension" -> p02Sql,
    "p03_temporal_lookup" -> p03Sql,
    "p05_cdc_apply" -> p05Sql,
    "p06_incremental_agg" -> p06Sql)

  /** p05 — CDC APPLY: materialize the CURRENT state table from a
    * change-data-capture log (the ingestion shape every warehouse mirror
    * of an OLTP source runs: a stream of upserts and deletes keyed by
    * entity, latest change wins). The events table plays the changelog:
    * `error` rows are DELETEs, everything else an UPSERT carrying
    * `value`; change order is (ts, event_id) — a total order, so "latest"
    * is engine-independent.
    *
    * Spelled as ONE `max(struct(...))` aggregate — struct comparison IS
    * the (ts, event_id) ordering with the payload riding along — NOT the
    * textbook `row_number() = 1` window: the aggregate partially
    * combines map-side (each task reduces its rows to ≤|keys| structs
    * BEFORE the exchange) and never sorts a partition, which at a
    * billion-row changelog is the difference between a combine and a
    * per-key sort. Deletes participate in the max (a delete newer than
    * every upsert wins) and drop in the final filter.
    *
    * Scale: shuffle volume = |distinct keys| per task, one exchange, no
    * window state. The same plan incrementalizes: new log days re-run
    * the aggregate over (old state ∪ delta) — c04's MERGE is the
    * two-table spelling of that step.
    */
  def p05CdcApply(s: SparkSession, dir: String): DataFrame = {
    val op = when(col("event_type") === "error", lit("D")).otherwise(lit("U"))
    Tables.events(s, dir)
      .select(col("user_id"),
        struct(
          unix_micros(col("ts").cast("timestamp")).as("us"),
          col("event_id"),
          op.as("op"),
          coalesce(col("value"), lit(0.0)).as("value")).as("chg"))
      .groupBy(col("user_id"))
      .agg(max(col("chg")).as("last"))
      .filter(col("last.op") =!= "D")
      .select(col("user_id"),
        col("last.us").as("changed_us"),
        col("last.event_id").as("change_id"),
        col("last.value").as("value"))
      .orderBy("user_id")
  }

  /** p06 — incremental aggregate maintenance (the IVM step behind every
    * "refresh the mart nightly without rescanning history" pipeline): the
    * materialized state (orders with key%10 ≠ 7 — yesterday's aggregate)
    * is MERGED with the delta batch's partial aggregate (key%10 = 7 —
    * tonight's arrivals) instead of recomputed. The merge algebra is the
    * point: count and decimal-sum add, max takes greatest, and the
    * algebraic mean is re-derived from the merged sum/count — never
    * averaged across batches (avg-of-avgs is the classic IVM bug).
    * Non-mergeable aggregates (exact COUNT DISTINCT, medians) are
    * deliberately absent — at scale those maintain through sketches
    * (e13's HLL union, e10's histogram rollup).
    *
    * The DuckDB oracle RECOMPUTES the aggregate from the full table —
    * exact hash equality of merge-path and recompute-path is precisely
    * the IVM correctness theorem for this query.
    *
    * Scale: each side is a bounded (status × month) map-side-combined
    * aggregate; the merge is a tiny full-outer join on the group key. A
    * 100 TB history is never rescanned — only the delta is, which is the
    * entire economic argument for maintaining marts incrementally.
    */
  def p06IncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      col("o_orderkey"),
      col("o_orderstatus").as("status"),
      date_trunc("month", col("o_orderdate")).cast("date").as("month"),
      col("o_totalprice"))
    val isDelta = pmod(col("o_orderkey"), lit(10L)) === 7L
    def partial(df: DataFrame): DataFrame = df.groupBy("status", "month")
      .agg(count(lit(1)).as("n"),
        Det.dsumDec(col("o_totalprice")).as("tot"),
        max(col("o_totalprice")).as("mx"))
    val state = partial(o.filter(!isDelta))
    val delta = partial(o.filter(isDelta))
    val zero = lit(0).cast(Det.MoneyType)
    state.as("s").join(delta.as("d"), Seq("status", "month"), "full_outer")
      .select(col("status"), col("month"),
        (coalesce(col("s.n"), lit(0L)) + coalesce(col("d.n"), lit(0L)))
          .as("n_orders"),
        (coalesce(col("s.tot"), zero) + coalesce(col("d.tot"), zero))
          .cast("double").as("total"),
        greatest(col("s.mx"), col("d.mx")).as("max_price"))
      .withColumn("avg_price",
        Det.r(col("total") / col("n_orders"), 4))
      .orderBy("status", "month")
  }

  private def p06Sql =
    s"""SELECT o_orderstatus AS status,
       |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       |  CAST(count(*) AS BIGINT) AS n_orders,
       |  ${Det.sqlDsum("o_totalprice")} AS total,
       |  max(o_totalprice) AS max_price,
       |  ${Det.sqlR(s"${Det.sqlDsum("o_totalprice")} / count(*)", 4)}
       |    AS avg_price
       |FROM orders
       |GROUP BY 1, 2 ORDER BY status, month""".stripMargin

  // def, not val: declared below the `oracles` map that references it
  private def p05Sql =
    """SELECT user_id,
      |  us AS changed_us, event_id AS change_id, value
      |FROM (
      |  SELECT user_id, us, event_id, op, value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY us DESC, event_id DESC) AS rk
      |  FROM (
      |    SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id,
      |      CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
      |      coalesce(value, 0.0) AS value
      |    FROM events))
      |WHERE rk = 1 AND op <> 'D'
      |ORDER BY user_id""".stripMargin
}
