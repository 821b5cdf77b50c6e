package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Analytic window functions — the reference imports `Window` but never uses
  * it (SURVEY.md §2.5); these extend the surface with the ranking /
  * time-series shapes a training-data pipeline needs (top-k per group,
  * lag deltas, running totals).
  *
  * Scale: each window shuffles once on its partition key; `row_number`
  * top-k per group is rank-then-filter — unlike global `orderBy().limit()`
  * it parallelizes over groups, which is the 100 TB way to take per-key
  * top-k. Partition keys here are low-skew (orderstatus, event_type); for
  * skewed keys pre-aggregate or salt before ranking.
  */
object WindowOps {

  /** w01 — top-3 orders by price per order status: `row_number` over a
    * (status, price desc) window, tie-broken on the unique key.
    */
  def w01TopPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .orderBy("o_orderstatus", "rk")
  }

  private val w01Sql =
    """SELECT o_orderstatus, o_orderkey, o_totalprice,
      |  CAST(row_number() OVER (PARTITION BY o_orderstatus
      |    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
      |FROM orders QUALIFY rk <= 3 ORDER BY o_orderstatus, rk""".stripMargin

  /** w02 — day-over-day event-count deltas per event type: `lag` over a
    * (type, day) window — the change-detection shape for pipeline
    * monitoring. Day counts first (bounded groups), then the window runs
    * on the SMALL aggregate, not the raw stream.
    */
  def w02LagDelta(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"))
      .withColumn("day_epoch", unix_timestamp(date_trunc("day", col("ts"))))
      .groupBy("event_type", "day_epoch")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("day_epoch")
    daily
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("delta", col("n") - coalesce(col("prev_n"), col("n")))
      .orderBy("event_type", "day_epoch")
  }

  private val w02Sql =
    """SELECT event_type, day_epoch, n,
      |  lag(n, 1) OVER (PARTITION BY event_type ORDER BY day_epoch) AS prev_n,
      |  n - coalesce(lag(n, 1) OVER (PARTITION BY event_type
      |    ORDER BY day_epoch), n) AS delta
      |FROM (SELECT event_type,
      |        CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch,
      |        CAST(count(*) AS BIGINT) AS n
      |      FROM events GROUP BY 1, 2)
      |ORDER BY event_type, day_epoch""".stripMargin

  /** w03 — running revenue total per nation over order days: `sum` over an
    * unbounded-preceding window on the daily aggregate (cumulative curves).
    */
  def w03RunningTotal(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .withColumn("day_epoch", unix_timestamp(date_trunc("day", col("o_orderdate"))))
      .groupBy("o_orderstatus", "day_epoch")
      .agg(Det.dsumDec(col("o_totalprice")).as("rev"))
    val w = Window.partitionBy("o_orderstatus").orderBy("day_epoch")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cum_rev", sum(col("rev")).over(w).cast("double"))
      .select(col("o_orderstatus"), col("day_epoch"),
        col("rev").cast("double").as("rev"), col("cum_rev"))
      .orderBy("o_orderstatus", "day_epoch")
      .limit(500)
  }

  private val w03Sql = {
    import Det.{sqlDsumDec}
    s"""SELECT o_orderstatus, day_epoch, CAST(rev AS DOUBLE) AS rev,
       |  CAST(sum(rev) OVER (PARTITION BY o_orderstatus ORDER BY day_epoch
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_rev
       |FROM (SELECT o_orderstatus,
       |        CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) AS day_epoch,
       |        ${sqlDsumDec("o_totalprice")} AS rev
       |      FROM orders GROUP BY 1, 2)
       |ORDER BY o_orderstatus, day_epoch LIMIT 500""".stripMargin
  }

  /** w04 — AS-OF join: for every purchase event, the value and age of the
    * most recent error event at-or-before it for the same user (the
    * time-series enrichment operator Spark has no built-in for).
    *
    * Implementation is the UNION-WINDOW spelling, not a join: tag both
    * event streams, union them, and take `last(err_value, ignoreNulls)`
    * over a (user, time) window up to the current row. ONE shuffle on the
    * partition key, no join, no range explosion — the 100 TB as-of shape
    * (a backward range join would rescan the probe side per row; the
    * union-window is a single sort-merge pass). Tie rule at equal ts:
    * 'error' sorts before 'purchase' (tag order), so a same-instant error
    * counts as prior; event_id breaks exact ties deterministically.
    */
  /** Shared purchase/error union frame of the as-of family (w04/w10/w18/
    * w19): ONE definition of the err_value/err_ts marker columns, so the
    * four directions can never disagree on what counts as error state.
    */
  private def purchaseErrorEvents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts"))
      .withColumn("err_value",
        when(col("event_type") === "error", coalesce(col("value"), lit(0.0))))
      .withColumn("err_ts",
        when(col("event_type") === "error", col("ts")))

  /** The as-of family's ONE tie order: at an equal timestamp 'error' sorts
    * before 'purchase', so a same-instant error belongs to the BACKWARD
    * direction (already happened) in every member — w18's nearest-join
    * equivalence with w04/w10 depends on all four sharing this spec.
    */
  private def asofOrder =
    Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_type"), col("event_id"))

  def w04AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = purchaseErrorEvents(s, dir)
    val w = asofOrder
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("last_err_value", last(col("err_value"), ignoreNulls = true).over(w))
      .withColumn("last_err_ts", last(col("err_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        coalesce(col("value"), lit(0.0)).as("purchase_value"),
        col("last_err_value"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("last_err_ts")))
          .as("secs_since_error"))
      .orderBy("event_id")
  }

  private val w04Sql =
    """SELECT event_id, user_id,
      |  coalesce(value, 0.0) AS purchase_value, last_err_value,
      |  -- floor, not CAST: Spark's unix_timestamp TRUNCATES sub-second
      |  -- parts while DuckDB's BIGINT cast rounds-to-nearest
      |  CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(last_err_ts)) AS BIGINT)
      |    AS secs_since_error
      |FROM (
      |  SELECT event_id, user_id, event_type, value, ts,
      |    last_value(err_value IGNORE NULLS) OVER w AS last_err_value,
      |    last_value(err_ts IGNORE NULLS) OVER w AS last_err_ts
      |  FROM (
      |    SELECT event_id, user_id, event_type, value, ts,
      |      CASE WHEN event_type = 'error' THEN coalesce(value, 0.0) END AS err_value,
      |      CASE WHEN event_type = 'error' THEN ts END AS err_ts
      |    FROM events WHERE event_type IN ('purchase', 'error'))
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  /** w10 — FORWARD as-of join (w04's time-mirror): each purchase enriched
    * with the FIRST error at-or-after it — "time to next failure", the
    * survival-analysis / alert-latency twin of w04's "state as of now".
    * Same union-window spelling: union both event kinds into ONE stream,
    * sort once per user, and take `first(ignoreNulls)` over the
    * current-row-to-unbounded-FOLLOWING frame — one shuffle, no range
    * join, no BroadcastNestedLoop. Tie order (ts, event_type, event_id)
    * is shared with w04: at an equal timestamp 'error' sorts before
    * 'purchase', so a same-instant error is w04's business (already
    * happened), not a future one — the two operators partition time
    * consistently.
    *
    * Scale: identical to w04 — the frame is evaluated in one backward
    * pass per partition, state is one (value, ts) pair, and the sort is
    * the same (user, ts) sort every other per-user operator reuses.
    */
  def w10AsofForward(s: SparkSession, dir: String): DataFrame = {
    val ev = purchaseErrorEvents(s, dir)
    val w = asofOrder
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ev
      .withColumn("next_err_value", first(col("err_value"), ignoreNulls = true).over(w))
      .withColumn("next_err_ts", first(col("err_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        coalesce(col("value"), lit(0.0)).as("purchase_value"),
        col("next_err_value"),
        (unix_timestamp(col("next_err_ts")) - unix_timestamp(col("ts")))
          .as("secs_to_error"))
      .orderBy("event_id")
  }

  private val w10Sql =
    """SELECT event_id, user_id,
      |  coalesce(value, 0.0) AS purchase_value, next_err_value,
      |  -- floor, not CAST: Spark's unix_timestamp TRUNCATES sub-second
      |  -- parts while DuckDB's BIGINT cast rounds-to-nearest
      |  CAST(floor(epoch(next_err_ts)) AS BIGINT) - CAST(floor(epoch(ts)) AS BIGINT)
      |    AS secs_to_error
      |FROM (
      |  SELECT event_id, user_id, event_type, value, ts,
      |    first_value(err_value IGNORE NULLS) OVER w AS next_err_value,
      |    first_value(err_ts IGNORE NULLS) OVER w AS next_err_ts
      |  FROM (
      |    SELECT event_id, user_id, event_type, value, ts,
      |      CASE WHEN event_type = 'error' THEN coalesce(value, 0.0) END AS err_value,
      |      CASE WHEN event_type = 'error' THEN ts END AS err_ts
      |    FROM events WHERE event_type IN ('purchase', 'error'))
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type, event_id
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  /** w05 — sessionization: split each user's event stream into sessions at
    * >30-minute gaps (lag → gap flag → running sum as session index), then
    * aggregate per session. The canonical two-window shape: both windows
    * share ONE (user, ts) sort, so Catalyst plans a single shuffle+sort and
    * the session aggregate reuses the partitioning. At 100 TB this is the
    * batch mirror of the streaming `session_window` — same semantics,
    * checked here where an exact oracle exists.
    */
  def w05Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull
          || unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800,
          1L).otherwise(0L))
      .withColumn("session_idx", sum(col("is_new")).over(run))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min(unix_timestamp(col("ts"))).as("start_epoch"),
        max(unix_timestamp(col("ts"))).as("end_epoch"),
        Det.r(Det.dsum(coalesce(col("value"), lit(0.0))), 4).as("session_value"))
      .withColumn("duration_secs", col("end_epoch") - col("start_epoch"))
      .orderBy("user_id", "session_idx")
  }

  private val w05Sql =
    """SELECT user_id, session_idx,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  min(CAST(floor(epoch(ts)) AS BIGINT)) AS start_epoch,
      |  max(CAST(floor(epoch(ts)) AS BIGINT)) AS end_epoch,
      |  SESSION_VALUE_EXPR AS session_value,
      |  max(CAST(floor(epoch(ts)) AS BIGINT))
      |    - min(CAST(floor(epoch(ts)) AS BIGINT)) AS duration_secs
      |FROM (
      |  SELECT event_id, user_id, ts, value,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_idx
      |  FROM (
      |    SELECT event_id, user_id, ts, value,
      |      CASE WHEN lag(ts, 1) OVER (PARTITION BY user_id
      |               ORDER BY ts, event_id) IS NULL
      |             OR CAST(floor(epoch(ts)) AS BIGINT)
      |               - CAST(floor(epoch(lag(ts, 1) OVER (PARTITION BY user_id
      |                   ORDER BY ts, event_id))) AS BIGINT) > 1800
      |           THEN 1 ELSE 0 END AS is_new
      |    FROM events))
      |GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin
      .replace("SESSION_VALUE_EXPR",
        Det.sqlR(Det.sqlDsum("coalesce(value, 0.0)"), 4))

  /** w06 — sliding TIME-RANGE window features: for every event, the count
    * and exact sum of the same user's event values in the trailing hour —
    * `RANGE BETWEEN` semantics (peers by ordering VALUE, not row position),
    * the standard online-feature shape ("activity in the last hour") that
    * `rowsBetween` cannot express when event spacing is irregular.
    *
    * Determinism: range frames include ALL peer rows at equal ordering
    * value, so the frame is a set — no tie order enters; the value sum
    * rides the exact DECIMAL carrier ([[Det]]). One shuffle on user_id.
    *
    * Scale: the frame is bounded by TIME, so a hot user costs its events
    * within one hour, not its lifetime; for per-key sort pressure the
    * mitigation is the same as any window — day-bucket the partition key
    * and union boundary hours, or move to the streaming twin
    * (`StreamPipeline`'s watermarked windows) when the input is unbounded.
    */
  def w06RangeFeatures(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("epoch_s"))
      .rangeBetween(-3600L, 0L)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("epoch_s"),
        coalesce(col("value"), lit(0.0)).as("value"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("value_1h",
        sum(col("value").cast(Det.MoneyType)).over(w).cast("double"))
      .select("event_id", "user_id", "epoch_s", "n_1h", "value_1h")
      .orderBy("event_id")
  }

  private val w06Sql =
    s"""SELECT event_id, user_id, epoch_s,
       |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
       |  CAST(sum(CAST(value AS ${Det.MoneyType.toUpperCase})) OVER w
       |    AS DOUBLE) AS value_1h
       |FROM (SELECT event_id, user_id,
       |        CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
       |        coalesce(value, 0.0) AS value
       |      FROM events)
       |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
       |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
       |ORDER BY event_id""".stripMargin

  /** Interval length (seconds) for [[w07IntervalJoin]] — ALSO the bucket
    * width, so every interval overlaps at most two buckets.
    */
  val IntervalSecs = 1800L

  /** w07 — INTERVAL JOIN, bucketed: enrich every purchase event with the
    * error windows covering it — each error event opens a half-open
    * exposure window `[t0, t0 + IntervalSecs)` for its user, and a
    * purchase inside ≥1 window reports how many cover it and the earliest
    * covering window's start. The point-in-interval join Spark has no
    * native operator for (the batch twin of the streaming interval join
    * in `StreamPipeline`).
    *
    * A naive spelling is a range-predicate join — Catalyst can only plan
    * BNLJ for it, quadratic per user. The scale spelling here makes it an
    * EQUI-join: bucket time by the maximum interval length, explode each
    * interval to the ≤2 buckets it overlaps, join on (user_id, bucket) —
    * a plain shuffle-hash/SMJ with the range test left as a residual
    * filter. Candidates per probe are bounded by the intervals in two
    * buckets, so the join is linear in true matches + bucket collisions,
    * never |probe|×|intervals|. The oracle is the naive range join —
    * DuckDB's IEJoin handles it at sf0.01 — proving the bucketed
    * rewrite LOSSLESS: exact-equal output.
    *
    * Scale: one shuffle each side keyed (user_id, bucket); AQE handles a
    * hot user × hot bucket; widen the bucket only with the max interval
    * length. Longer mixed-length intervals → `sequence(floor(t0/W),
    * floor((t1-1)/W))` already emits every overlapped bucket.
    */
  def w07IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val W = IntervalSecs
    val ev = Tables.events(s, dir)
    val intervals = ev.filter(col("event_type") === "error")
      .select(col("user_id"), unix_timestamp(col("ts")).as("t0"))
      .withColumn("t1", col("t0") + lit(W))
      .withColumn("bucket",
        explode(sequence(floor(col("t0") / lit(W.toDouble)).cast("long"),
          floor((col("t1") - 1) / lit(W.toDouble)).cast("long"))))
    val probes = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("tp"))
      .withColumn("bucket", floor(col("tp") / lit(W.toDouble)).cast("long"))
    probes.alias("p")
      .join(intervals.alias("i"),
        col("p.user_id") === col("i.user_id")
          && col("p.bucket") === col("i.bucket")
          && col("p.tp") >= col("i.t0") && col("p.tp") < col("i.t1"))
      .groupBy(col("p.event_id").as("event_id"),
        col("p.user_id").as("user_id"), col("p.tp").as("epoch_s"))
      .agg(count(lit(1)).as("n_windows"),
        min(col("i.t0")).as("first_window_start"))
      .orderBy("event_id")
  }

  private val w07Sql =
    s"""SELECT p.event_id, p.user_id, p.tp AS epoch_s,
       |  CAST(count(*) AS BIGINT) AS n_windows,
       |  min(i.t0) AS first_window_start
       |FROM (SELECT event_id, user_id,
       |        CAST(floor(epoch(ts)) AS BIGINT) AS tp
       |      FROM events WHERE event_type = 'purchase') p
       |JOIN (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t0
       |      FROM events WHERE event_type = 'error') i
       |  ON p.user_id = i.user_id
       | AND p.tp >= i.t0 AND p.tp < i.t0 + $IntervalSecs
       |GROUP BY 1, 2, 3
       |ORDER BY p.event_id""".stripMargin

  /** User-id cap bounding the w09 demo grid (span × users is the output
    * size; the operator itself is per-key linear).
    */
  private val GapFillMaxUser = 20L

  /** w09 — time-series RESAMPLE: gap-fill each user's hourly activity
    * series onto a complete per-user hour grid (missing hours appear
    * with n_events = 0) and FORWARD-FILL the last observed hourly value
    * across the gaps — the regularization step before any window-based
    * feature or sequence model consumes event data ("the model expects
    * one row per hour", but events don't arrive that way).
    *
    * The grid is PER-USER (first..last active hour via
    * `sequence(h0, h1, 3600)` + explode): a global-span × users grid
    * cross join would materialize mostly-dead rows for sparse users —
    * per-key spans bound the fill to each key's own activity window.
    * Forward fill is `last(value, ignoreNulls)` over the (user, hour)
    * window; the first grid row is always observed (h0 comes from the
    * data), so no leading-null edge case exists.
    *
    * Scale: one groupBy to hourly cells (map-combined), one tiny span
    * aggregate per key, explode bounded by span/granularity, one
    * left join + one window — all keyed on user_id, ONE shuffle
    * distribution reused end-to-end.
    */
  def w09GapFill(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .filter(col("user_id") < GapFillMaxUser)
      .select(col("user_id"),
        unix_timestamp(col("ts")).as("es"),
        coalesce(col("value"), lit(0.0)).as("v"))
      .withColumn("hour_epoch", col("es") - col("es") % lit(3600L))
      .groupBy("user_id", "hour_epoch")
      .agg(count(lit(1)).as("n"),
        Det.r(Det.dsum(col("v")), 2).as("value_sum"))
    val spans = hourly.groupBy("user_id")
      .agg(min("hour_epoch").as("h0"), max("hour_epoch").as("h1"))
    val grid = spans.select(col("user_id"),
      explode(sequence(col("h0"), col("h1"), lit(3600L))).as("hour_epoch"))
    val w = Window.partitionBy("user_id").orderBy("hour_epoch")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour_epoch"), "left_outer")
      .withColumn("n_events", coalesce(col("n"), lit(0L)))
      .withColumn("is_gap", col("n").isNull)
      .withColumn("value_ffill",
        last(col("value_sum"), ignoreNulls = true).over(w))
      .select("user_id", "hour_epoch", "n_events", "is_gap", "value_ffill")
      .orderBy("user_id", "hour_epoch")
  }

  private val w09Sql =
    s"""WITH hourly AS (
       |  SELECT user_id, es - es % 3600 AS hour_epoch,
       |    CAST(count(*) AS BIGINT) AS n,
       |    ${Det.sqlR(Det.sqlDsum("v"), 2)} AS value_sum
       |  FROM (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
       |          coalesce(value, 0.0) AS v
       |        FROM events WHERE user_id < $GapFillMaxUser)
       |  GROUP BY 1, 2),
       |spans AS (SELECT user_id, min(hour_epoch) AS h0, max(hour_epoch) AS h1
       |          FROM hourly GROUP BY 1),
       |grid AS (SELECT user_id, unnest(range(h0, h1 + 1, 3600)) AS hour_epoch
       |         FROM spans)
       |SELECT g.user_id, g.hour_epoch,
       |  coalesce(h.n, 0) AS n_events,
       |  h.n IS NULL AS is_gap,
       |  last_value(h.value_sum IGNORE NULLS) OVER (
       |    PARTITION BY g.user_id ORDER BY g.hour_epoch
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
       |FROM grid g LEFT JOIN hourly h
       |  ON g.user_id = h.user_id AND g.hour_epoch = h.hour_epoch
       |ORDER BY g.user_id, g.hour_epoch""".stripMargin

  /** w11 — EXACT cumulative distinct users per day via the FIRST-TOUCH
    * transform: "distinct users to date" is naively a running
    * `count(DISTINCT)` window — per-row set state, unbounded memory, the
    * op Spark (rightly) refuses to express. The scale-correct identity:
    * a user counts toward the cumulative exactly once, on their FIRST
    * day, so cum_users(d) = Σ_{d'≤d} new_users(d') — one per-user min,
    * one per-day count, one prefix sum over the BOUNDED day table
    * (calendar-bounded regardless of row volume; same justification as
    * e18's histogram window). Daily activity (events, exact per-day
    * distinct) rides the same per-day grouping.
    */
  def w11CumulativeDistinct(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(unix_timestamp(date_trunc("day", col("ts"))).as("day"),
        col("user_id"))
    val daily = ev.groupBy("day")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("active_users"))
    val firstTouch = ev.groupBy("user_id").agg(min(col("day")).as("day"))
      .groupBy("day").agg(count(lit(1)).as("new_users"))
    val cumW = Window.orderBy("day") // day table is calendar-bounded
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(firstTouch, Seq("day"), "left")
      .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
      .withColumn("cum_users", sum(col("new_users")).over(cumW))
      .orderBy("day")
  }

  private val w11Sql =
    """WITH ev AS (
      |  SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day, user_id
      |  FROM events),
      |daily AS (
      |  SELECT day, CAST(count(*) AS BIGINT) AS n_events,
      |    CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
      |  FROM ev GROUP BY 1),
      |first_touch AS (
      |  SELECT day, CAST(count(*) AS BIGINT) AS new_users
      |  FROM (SELECT user_id, min(day) AS day FROM ev GROUP BY 1) t
      |  GROUP BY 1)
      |SELECT d.day, d.n_events, d.active_users,
      |  CAST(coalesce(f.new_users, 0) AS BIGINT) AS new_users,
      |  CAST(sum(coalesce(f.new_users, 0)) OVER (ORDER BY d.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_users
      |FROM daily d LEFT JOIN first_touch f USING (day)
      |ORDER BY d.day""".stripMargin

  /** w12 — the full SQL rank-function family (rank / dense_rank /
    * percent_rank / cume_dist / ntile) in one frame, completing the
    * window surface beyond w01's row_number: per-priority ranking of
    * order totals. DETERMINISM RULE: every rank function is only
    * engine-stable under a TOTAL order, so the sort key is
    * (o_totalprice DESC, o_orderkey) — ties broken by the unique key;
    * rank==dense_rank on this data precisely because the order is total
    * (the spec asserts the tie-free identity). percent_rank/cume_dist
    * are ratios of identical small integers — bit-identical across
    * engines with no snapping. Output trimmed to the top 20 per group
    * AFTER the full-partition functions compute (the filter can't push
    * below the window).
    *
    * Scale: one shuffle on the group key; rank functions are a single
    * sorted pass per partition — no state beyond the running counters.
    */
  def w12RankFamily(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_orderpriority").as("priority"),
        col("o_orderkey"), col("o_totalprice"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"),
        ntile(4).over(w).as("quartile"))
      .filter(col("rnk") <= 20)
      .orderBy("priority", "rnk")
  }

  private val w12Sql =
    """SELECT * FROM (
      |  SELECT o_orderpriority AS priority, o_orderkey, o_totalprice,
      |    CAST(rank() OVER w AS INT) AS rnk,
      |    CAST(dense_rank() OVER w AS INT) AS drnk,
      |    percent_rank() OVER w AS prnk,
      |    cume_dist() OVER w AS cdist,
      |    CAST(ntile(4) OVER w AS INT) AS quartile
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority
      |               ORDER BY o_totalprice DESC, o_orderkey)) t
      |WHERE rnk <= 20
      |ORDER BY priority, rnk""".stripMargin

  /** w16 — NATIVE `session_window` aggregation in batch: the same 30-minute
    * sessionization as w05, spelled through Spark's built-in session-window
    * operator instead of the manual lag→flag→running-sum chain. The oracle
    * is the gaps-and-islands SQL — so this query cross-checks Spark's
    * native session semantics against the classical spelling: sessions
    * merge while the NEXT event starts strictly before prev_ts + gap
    * (a gap of exactly 30:00 starts a new session — note w05's manual
    * spelling uses `> 1800`, i.e. keeps the exact-boundary event; both are
    * valid conventions, which is precisely why the check pins which one
    * the native operator implements), and the emitted window end is
    * last_ts + gap (the watermark-eviction horizon), not last_ts.
    * Comparisons ride exact epoch MICROSECONDS (events.ts is nanos;
    * div-1000 truncation identical both engines) — no floored-seconds
    * approximation anywhere.
    *
    * Scale: one shuffle on user_id, then a per-key merge scan — the same
    * plan Structured Streaming runs incrementally with state eviction at
    * the watermark ([[graft.streaming.StreamPipeline]] holds the stream
    * twin); batch and stream agree because the gap arithmetic is shared.
    */
  def w16SessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        Det.r(Det.dsum(coalesce(col("value"), lit(0.0))), 4)
          .as("session_value"))
      .select(col("user_id"),
        // events.ts surfaces as TimestampNTZ on the nanos-parquet read
        // path; the session tz is UTC, so the cast is micros-identity
        unix_micros(col("w.start").cast("timestamp")).as("session_start_us"),
        unix_micros(col("w.end").cast("timestamp")).as("session_end_us"),
        col("n_events"), col("session_value"))
      .orderBy("user_id", "session_start_us")

  private val w16Sql =
    """SELECT user_id,
      |  min(us) AS session_start_us,
      |  max(us) + 1800000000 AS session_end_us,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  SESSION_VALUE_EXPR AS session_value
      |FROM (
      |  SELECT user_id, us, value,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_idx
      |  FROM (
      |    SELECT user_id, us, value,
      |      CASE WHEN lag(us, 1) OVER (PARTITION BY user_id ORDER BY us)
      |               IS NULL
      |             OR us - lag(us, 1) OVER (PARTITION BY user_id
      |                 ORDER BY us) >= 1800000000
      |           THEN 1 ELSE 0 END AS is_new
      |    FROM (SELECT user_id, epoch_ns(ts) // 1000 AS us, value
      |          FROM events)))
      |GROUP BY user_id, session_idx
      |ORDER BY user_id, session_start_us""".stripMargin
      .replace("SESSION_VALUE_EXPR",
        Det.sqlR(Det.sqlDsum("coalesce(value, 0.0)"), 4))

  /** Grid width for [[w17IntervalOverlapJoin]]'s bucketed interval join
    * (1 hour in µs). Correct for ANY interval length — longer intervals
    * just cover more buckets; with ≤1 h sessions each covers ≤ 2.
    */
  private val GridUs = 3600000000L

  /** w17 — INTERVAL × INTERVAL overlap join, the fourth range-join shape
    * (SCALE.md's family: as-of w04, trailing-range w06, point-in-interval
    * w07): which users' error SESSIONS overlapped in time — concurrent
    * fraud activity, the coordination signal. Sessions come from the
    * native `session_window` operator (w16's semantics); the interval is
    * the actual event extent [min ts, max ts], not the gap-padded window.
    *
    * Spark plans a raw `a.s <= b.e AND b.s <= a.e` join as BNLJ —
    * quadratic. The scale spelling: each interval explodes onto the
    * fixed [[GridUs]] grid buckets it covers (two narrow longs per
    * bucket), candidates equi-join on the bucket, pairs dedup, and the
    * overlap test is a residual. Cost = Σ per-bucket concurrency², the
    * physical quantity the query measures anyway. The ORACLE is the
    * naive quadratic SQL — equality proves the grid drops nothing
    * (d04b's certification pattern).
    */
  def w17IntervalOverlapJoin(s: SparkSession, dir: String): DataFrame = {
    val sess = Tables.events(s, dir)
      .filter(col("event_type") === "error")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(
        min(unix_micros(col("ts").cast("timestamp"))).as("s_us"),
        max(unix_micros(col("ts").cast("timestamp"))).as("e_us"))
      .select("user_id", "s_us", "e_us")
    val bucketed = sess.select(col("user_id"), col("s_us"), col("e_us"),
      explode(sequence(expr(s"s_us div $GridUs"), expr(s"e_us div $GridUs")))
        .as("bucket"))
    bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket")
          && col("a.user_id") < col("b.user_id"))
      .filter(col("a.s_us") <= col("b.e_us")
        && col("b.s_us") <= col("a.e_us"))
      .select(
        col("a.user_id").as("user_a"), col("b.user_id").as("user_b"),
        col("a.s_us").as("start_a_us"), col("b.s_us").as("start_b_us"),
        (least(col("a.e_us"), col("b.e_us"))
          - greatest(col("a.s_us"), col("b.s_us"))).as("overlap_us"))
      .distinct()
      .orderBy("user_a", "user_b", "start_a_us", "start_b_us")
  }

  private def w17Sql =
    """WITH sess AS (
      |  SELECT user_id, session_idx,
      |    min(us) AS s_us, max(us) AS e_us
      |  FROM (
      |    SELECT user_id, us,
      |      CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |        AS session_idx
      |    FROM (
      |      SELECT user_id, us,
      |        CASE WHEN lag(us, 1) OVER (PARTITION BY user_id ORDER BY us)
      |                 IS NULL
      |               OR us - lag(us, 1) OVER (PARTITION BY user_id
      |                   ORDER BY us) >= 1800000000
      |             THEN 1 ELSE 0 END AS is_new
      |      FROM (SELECT user_id, epoch_ns(ts) // 1000 AS us
      |            FROM events WHERE event_type = 'error')))
      |  GROUP BY 1, 2)
      |SELECT DISTINCT a.user_id AS user_a, b.user_id AS user_b,
      |  a.s_us AS start_a_us, b.s_us AS start_b_us,
      |  least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us) AS overlap_us
      |FROM sess a JOIN sess b
      |  ON a.user_id < b.user_id
      | AND a.s_us <= b.e_us AND b.s_us <= a.e_us
      |ORDER BY user_a, user_b, start_a_us, start_b_us""".stripMargin

  /** w18 — NEAREST as-of join: each purchase enriched with whichever error
    * is closer in time — the last at-or-before (w04's "state as of now") or
    * the first strictly after (w10's "next failure") — ties going backward.
    * The third as-of direction (backward w04 / forward w10 / nearest w18):
    * sensor-alignment and label-attribution pipelines ask for exactly this
    * ("the error closest to the purchase"), and naive spellings range-join
    * the two streams into a BroadcastNestedLoop. Here both candidate frames
    * ride ONE (user, ts, type, id) sort — `last(ignoreNulls)` over
    * preceding..current and `first(ignoreNulls)` over current..following —
    * so the plan is a single shuffle+sort with two frame passes, no join
    * at all. Tie order is shared with w04/w10: a same-instant error sorts
    * before the purchase, so it is the BACKWARD candidate at distance 0.
    *
    * Scale: identical to w04/w10 — per-partition state is two (value, ts)
    * pairs; the sort is the same (user, ts) sort every per-user operator
    * reuses, so AQE can reuse the exchange across the family.
    */
  def w18AsofNearest(s: SparkSession, dir: String): DataFrame = {
    val ev = purchaseErrorEvents(s, dir)
    val back = asofOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = asofOrder.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val secsB = unix_timestamp(col("ts")) - unix_timestamp(col("last_err_ts"))
    val secsF = unix_timestamp(col("next_err_ts")) - unix_timestamp(col("ts"))
    val takeBack = col("last_err_ts").isNotNull &&
      (col("next_err_ts").isNull || secsB <= secsF)
    ev
      .withColumn("last_err_value", last(col("err_value"), ignoreNulls = true).over(back))
      .withColumn("last_err_ts", last(col("err_ts"), ignoreNulls = true).over(back))
      .withColumn("next_err_value", first(col("err_value"), ignoreNulls = true).over(fwd))
      .withColumn("next_err_ts", first(col("err_ts"), ignoreNulls = true).over(fwd))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        coalesce(col("value"), lit(0.0)).as("purchase_value"),
        when(takeBack, col("last_err_value"))
          .when(col("next_err_ts").isNotNull, col("next_err_value"))
          .as("nearest_err_value"),
        when(takeBack, lit("before"))
          .when(col("next_err_ts").isNotNull, lit("after"))
          .as("nearest_dir"),
        when(takeBack, secsB)
          .when(col("next_err_ts").isNotNull, secsF)
          .as("nearest_abs_secs"))
      .orderBy("event_id")
  }

  private val w18Sql =
    """SELECT event_id, user_id,
      |  coalesce(value, 0.0) AS purchase_value,
      |  CASE WHEN take_back THEN last_err_value
      |       WHEN next_err_ts IS NOT NULL THEN next_err_value END
      |    AS nearest_err_value,
      |  CASE WHEN take_back THEN 'before'
      |       WHEN next_err_ts IS NOT NULL THEN 'after' END AS nearest_dir,
      |  CASE WHEN take_back THEN secs_b
      |       WHEN next_err_ts IS NOT NULL THEN secs_f END AS nearest_abs_secs
      |FROM (
      |  SELECT *,
      |    -- floor, not CAST: Spark's unix_timestamp TRUNCATES sub-second
      |    -- parts while DuckDB's BIGINT cast rounds-to-nearest
      |    CAST(floor(epoch(ts)) AS BIGINT)
      |      - CAST(floor(epoch(last_err_ts)) AS BIGINT) AS secs_b,
      |    CAST(floor(epoch(next_err_ts)) AS BIGINT)
      |      - CAST(floor(epoch(ts)) AS BIGINT) AS secs_f,
      |    last_err_ts IS NOT NULL AND (next_err_ts IS NULL
      |      OR CAST(floor(epoch(ts)) AS BIGINT)
      |           - CAST(floor(epoch(last_err_ts)) AS BIGINT)
      |         <= CAST(floor(epoch(next_err_ts)) AS BIGINT)
      |              - CAST(floor(epoch(ts)) AS BIGINT)) AS take_back
      |  FROM (
      |    SELECT event_id, user_id, event_type, value, ts,
      |      last_value(err_value IGNORE NULLS) OVER wb AS last_err_value,
      |      last_value(err_ts IGNORE NULLS) OVER wb AS last_err_ts,
      |      first_value(err_value IGNORE NULLS) OVER wf AS next_err_value,
      |      first_value(err_ts IGNORE NULLS) OVER wf AS next_err_ts
      |    FROM (
      |      SELECT event_id, user_id, event_type, value, ts,
      |        CASE WHEN event_type = 'error' THEN coalesce(value, 0.0) END AS err_value,
      |        CASE WHEN event_type = 'error' THEN ts END AS err_ts
      |      FROM events WHERE event_type IN ('purchase', 'error'))
      |    WINDOW
      |      wb AS (PARTITION BY user_id ORDER BY ts, event_type, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |      wf AS (PARTITION BY user_id ORDER BY ts, event_type, event_id
      |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)))
      |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  /** Max age of a backward as-of match before it is considered stale (w19).
    * Six hours: ~11% of this testdata's purchases have an error that
    * recent, so BOTH branches (fresh match / stale-dropped) carry real
    * rows through the oracle.
    */
  private val AsofToleranceSecs = 21600L

  /** w19 — TOLERANCE-bounded as-of join (pandas `merge_asof(tolerance=…)` /
    * kdb `wj` semantics): each purchase takes the last error at-or-before
    * it — but ONLY if that error is within [[AsofToleranceSecs]]; staler
    * state is reported as NO match (NULL value/age, matched=false) rather
    * than silently joining hours-old state. This is the as-of variant
    * sensor-fusion and market-data pipelines actually run: joining a
    * quote from last Tuesday to today's trade is worse than joining
    * nothing.
    *
    * The tolerance is applied AFTER the single-sort window match — the
    * frame state stays one (value, ts) pair and the plan is byte-identical
    * to w04's (one shuffle+sort, no range join); a range-join spelling of
    * the same semantics would buy no pruning (the window already evaluates
    * each row once) and cost a second shuffle.
    *
    * Scale: identical to w04; the staleness predicate is a per-row
    * projection, free at any scale.
    */
  def w19AsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val ev = purchaseErrorEvents(s, dir)
    val w = asofOrder
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val age = unix_timestamp(col("ts")) - unix_timestamp(col("last_err_ts"))
    val fresh = col("last_err_ts").isNotNull && age <= AsofToleranceSecs
    ev
      .withColumn("last_err_value", last(col("err_value"), ignoreNulls = true).over(w))
      .withColumn("last_err_ts", last(col("err_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        coalesce(col("value"), lit(0.0)).as("purchase_value"),
        when(fresh, col("last_err_value")).as("err_value"),
        when(fresh, age).as("secs_since_error"),
        fresh.as("matched"))
      .orderBy("event_id")
  }

  private val w19Sql =
    s"""SELECT event_id, user_id,
       |  coalesce(value, 0.0) AS purchase_value,
       |  CASE WHEN matched THEN last_err_value END AS err_value,
       |  CASE WHEN matched THEN age END AS secs_since_error,
       |  matched
       |FROM (
       |  SELECT *,
       |    -- floor, not CAST: Spark's unix_timestamp TRUNCATES sub-second
       |    -- parts while DuckDB's BIGINT cast rounds-to-nearest
       |    coalesce(last_err_ts IS NOT NULL
       |      AND CAST(floor(epoch(ts)) AS BIGINT)
       |            - CAST(floor(epoch(last_err_ts)) AS BIGINT)
       |          <= $AsofToleranceSecs, FALSE) AS matched,
       |    CAST(floor(epoch(ts)) AS BIGINT)
       |      - CAST(floor(epoch(last_err_ts)) AS BIGINT) AS age
       |  FROM (
       |    SELECT event_id, user_id, event_type, value, ts,
       |      last_value(err_value IGNORE NULLS) OVER w AS last_err_value,
       |      last_value(err_ts IGNORE NULLS) OVER w AS last_err_ts
       |    FROM (
       |      SELECT event_id, user_id, event_type, value, ts,
       |        CASE WHEN event_type = 'error' THEN coalesce(value, 0.0) END AS err_value,
       |        CASE WHEN event_type = 'error' THEN ts END AS err_ts
       |      FROM events WHERE event_type IN ('purchase', 'error'))
       |    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))
       |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  /** w20 — per-user maximum drawdown of the running net flow: purchases
    * credit, errors debit (the refund/chargeback proxy in this schema);
    * the running balance's largest peak-to-trough fall is THE classic
    * risk/exposure analytic (finance drawdown, fraud-loss exposure). Two
    * stacked frames over ONE (user, ts, id) sort — running sum, then
    * running max of it — all in exact integer cents, so the statistic is
    * engine- and partition-order-exact with no float drift.
    *
    * Scale: same single-sort shape as the rest of the per-user family;
    * per-partition state is two longs. The groupBy rides the window's
    * partitioning — Catalyst plans one exchange.
    */
  def w20MaxDrawdown(s: SparkSession, dir: String): DataFrame = {
    val flow = Tables.events(s, dir)
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("user_id"), col("event_id"), col("ts"),
        (when(col("event_type") === "purchase", lit(1L)).otherwise(lit(-1L))
          * Det.cents(coalesce(col("value"), lit(0.0)))).as("cents"))
    val run = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flow
      .withColumn("bal", sum(col("cents")).over(run))
      .withColumn("peak", max(col("bal")).over(run))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        max(col("peak")).as("peak_cents"),
        sum(col("cents")).as("final_cents"),
        max(col("peak") - col("bal")).as("max_drawdown_cents"))
      .orderBy("user_id")
  }

  private val w20Sql =
    """SELECT user_id,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(max(peak) AS BIGINT) AS peak_cents,
      |  CAST(sum(cents) AS BIGINT) AS final_cents,
      |  CAST(max(peak - bal) AS BIGINT) AS max_drawdown_cents
      |FROM (
      |  SELECT user_id, cents, bal,
      |    max(bal) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      |  FROM (
      |    SELECT user_id, event_id, ts, cents,
      |      sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bal
      |    FROM (
      |      SELECT user_id, event_id, ts,
      |        (CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END)
      |          * CAST(floor(coalesce(value, 0.0) * 100 + 0.5) AS BIGINT)
      |          AS cents
      |      FROM events WHERE event_type IN ('purchase', 'error'))))
      |GROUP BY 1 ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w20_max_drawdown" -> (w20MaxDrawdown _),
    "w19_asof_tolerance" -> (w19AsofTolerance _),
    "w18_asof_nearest" -> (w18AsofNearest _),
    "w17_interval_overlap" -> (w17IntervalOverlapJoin _),
    "w16_session_window" -> (w16SessionWindow _),
    "w12_rank_family" -> (w12RankFamily _),
    "w11_cumulative_distinct" -> (w11CumulativeDistinct _),
    "w09_gap_fill" -> (w09GapFill _),
    "w01_top_per_group" -> (w01TopPerGroup _),
    "w02_lag_delta" -> (w02LagDelta _),
    "w03_running_total" -> (w03RunningTotal _),
    "w04_asof_join" -> (w04AsofJoin _),
    "w05_sessionize" -> (w05Sessionize _),
    "w06_range_features" -> (w06RangeFeatures _),
    "w07_interval_join" -> (w07IntervalJoin _),
    "w10_asof_forward" -> (w10AsofForward _))

  val oracles: Map[String, String] = Map(
    "w20_max_drawdown" -> w20Sql,
    "w19_asof_tolerance" -> w19Sql,
    "w18_asof_nearest" -> w18Sql,
    "w17_interval_overlap" -> w17Sql,
    "w16_session_window" -> w16Sql,
    "w12_rank_family" -> w12Sql,
    "w11_cumulative_distinct" -> w11Sql,
    "w09_gap_fill" -> w09Sql,
    "w01_top_per_group" -> w01Sql,
    "w02_lag_delta" -> w02Sql,
    "w03_running_total" -> w03Sql,
    "w04_asof_join" -> w04Sql,
    "w05_sessionize" -> w05Sql,
    "w06_range_features" -> w06Sql,
    "w07_interval_join" -> w07Sql,
    "w10_asof_forward" -> w10Sql)
}
