package graft.sources

import graft.Caches.Tracked
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink surface of the reference beyond Parquet (SURVEY.md §2.1):
  * CSV ingest with header+inferSchema (S1, `notebooks/1_data_cleaning
  * .ipynb:40-43`) and with an explicit schema, CSV export with `coalesce(1)`
  * (S4, `notebooks/4_graphx.ipynb:1213-1217`), Parquet export with
  * `coalesce(5)` (S3, `:1204`), and the `spark.range`+`rand` synthetic
  * generator (S12, `streaming/spark_to_postgres.py:11-21`).
  *
  * Scale notes: `inferSchema` costs an extra full pass before the plan even
  * builds (SURVEY §3.2) — at 100 TB ALWAYS pass the explicit schema; the
  * inferring reader is kept for reference parity and ad-hoc work.
  * `coalesce(1)` serializes the write into one task — correct for a
  * top-100 export, catastrophic for bulk output; the bulk path keeps the
  * write parallelism of the upstream plan.
  */
object Ingest {

  /** S1 — the reference's ingest: header + inferSchema (extra pass!). */
  def readCsvInfer(s: SparkSession, path: String): DataFrame =
    s.read.option("header", true).option("inferSchema", true).csv(path)

  /** S1 at scale — explicit schema, single pass, no surprises. */
  def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.option("header", true).schema(schema).csv(path)

  /** Real-world ingest: PERMISSIVE mode with corrupt rows captured in a
    * quarantine column instead of failing the job (at 100 TB there is
    * ALWAYS a malformed row; FAILFAST is for contract tests, not
    * production loads). The schema must carry the corrupt column.
    *
    * Returned CACHED: Spark disallows queries over raw CSV/JSON that
    * reference only the internal corrupt-record column, so the quarantine
    * filter this helper exists for (`filter($"_corrupt_record".isNotNull)`)
    * throws AnalysisException on the uncached frame. The quarantine flow
    * reads the data twice (good rows + bad rows) anyway, so the cache pays
    * for itself; callers should `unpersist()` when done.
    */
  def readCsvPermissive(s: SparkSession, path: String,
      schema: StructType): DataFrame =
    s.read.option("header", true)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .csv(path)
      .tracked

  /** S4 — bounded result export: single CSV file with header. */
  def writeCsvSingle(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", true).csv(path)

  /** S3 — bounded parquet export, reference's `coalesce(5)`. */
  def writeParquetCoalesced(df: DataFrame, path: String, files: Int = 5): Unit =
    df.coalesce(files).write.mode("overwrite").parquet(path)

  /** Partition-pruned layout — the 100 TB default for time-keyed tables:
    * `partitionBy` on a low-cardinality derived key (one directory per
    * value) turns time-range predicates into PartitionFilters, so a query
    * over one day touches one directory instead of the whole table. Keep
    * partition cardinality in the thousands, not millions (small-files
    * death), and cap file size with maxRecordsPerFile rather than
    * coalesce.
    */
  def writePartitioned(df: DataFrame, path: String, key: String): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", 5000000)
      .partitionBy(key)
      .parquet(path)

  /** Write with SINGLE-PASS quality metrics via the `Observation` API:
    * row count, null-key count and an exact decimal value total are
    * collected ON THE WRITE JOB's pass over the data — no second scan.
    * The production pattern for emit-metrics-while-writing: at 100 TB a
    * separate audit query doubles the pipeline's scan cost, while an
    * observation is a free piggyback aggregate. Returns the metrics row.
    */
  def writeObserved(df: DataFrame, path: String, keyCol: String,
      valueCol: String): Map[String, Any] = {
    val obs = org.apache.spark.sql.Observation("write_metrics")
    df.observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col(keyCol).isNull.cast("long")).as("null_keys"),
        sum(col(valueCol).cast("decimal(28,4)")).cast("double")
          .as("value_total"))
      .write.mode("overwrite").parquet(path)
    obs.get
  }

  /** Dynamic partition overwrite — the idempotent BACKFILL primitive: with
    * `partitionOverwriteMode=dynamic`, an overwrite replaces ONLY the
    * partitions present in the incoming frame and leaves every other
    * directory untouched. The default (static) mode would truncate the
    * whole table first — the classic backfill footgun at 100 TB, where
    * "re-run one bad day" must never mean "rewrite three years". Set as a
    * writer option so it cannot leak session-wide.
    */
  def backfillPartition(df: DataFrame, path: String, key: String): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", 5000000)
      .partitionBy(key)
      .parquet(path)

  /** Schema-evolution read: `mergeSchema` unions the footer schemas of all
    * files, so batches written before a column existed read back as NULL in
    * that column — additive evolution without rewriting history. Off by
    * default in Spark because footer-merging costs a file-listing pass;
    * turn it on per-read exactly where evolution is expected, not globally.
    */
  def readParquetMerged(s: SparkSession, path: String): DataFrame =
    s.read.option("mergeSchema", true).parquet(path)

  /** Small-file compaction — the maintenance job every partitioned 100 TB
    * table needs: rewrite a directory to ~`targetFileMB` files computed from
    * the actual data size (many tiny files → namenode pressure + per-task
    * overhead; compaction restores scan efficiency). Rewrites to a new path:
    * at scale, compact-then-swap, never in place.
    */
  def compact(s: SparkSession, inPath: String, outPath: String,
      targetFileMB: Int = 128): Long = {
    val df = s.read.parquet(inPath)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val files = math.max(1L,
      (bytes / (targetFileMB.toLong * 1024 * 1024)).toLong).toInt
    df.repartition(files).write.mode("overwrite").parquet(outPath)
    files.toLong
  }

  /** ORC round-trip — the second columnar format Spark ships natively
    * (vectorized reader, predicate pushdown via file/stripe/row-group
    * min-max, column pruning — the same scan-side levers as Parquet).
    * Kept thin: format choice is a storage-layer concern; every operator
    * in this library is format-agnostic because plans only see the scan.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(s: SparkSession, path: String): DataFrame =
    s.read.orc(path)

  /** JSON-lines sink/source — the interchange format of the reference's
    * streaming layer (its Kafka values are JSON objects,
    * `streaming/kafka_producer.py`; here as a batch file format). Schema
    * is passed EXPLICITLY on read: like the streaming path's `from_json`,
    * an explicit StructType skips sampling-based inference (a full extra
    * pass at 100 TB) and pins types the way
    * `kafka_to_influxdb.py:33-65` does; column pruning still reaches the
    * JSON parser (Jackson only materializes requested fields), which
    * SinksSourcesSpec asserts via ReadSchema.
    */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonLines(s: SparkSession, schema: StructType,
      path: String): DataFrame =
    s.read.schema(schema).json(path)

  /** S12 — seeded synthetic transaction generator (the reference's
    * `spark.range(0,50)` + `rand()` frame, `spark_to_postgres.py:11-21`).
    * `rand(seed)`/`randn(seed)` are deterministic per (seed, partition
    * layout) — stable within one environment, not across partitionings, so
    * this stays a rows-only check (SURVEY §7.4).
    */
  def syntheticTransactions(s: SparkSession, n: Long): DataFrame =
    s.range(0, n)
      .withColumn("amount", round(rand(42) * 1000, 2))
      .withColumn("fraud_probability", rand(43))
      .withColumn("is_fraud", col("fraud_probability") > 0.85)
      .withColumn("transaction_type",
        when(col("id") % 3 === 0, "purchase")
          .when(col("id") % 3 === 1, "transfer").otherwise("withdrawal"))
      .withColumn("created_at", current_timestamp())

  /** x01 — generator as a registered query (rows-only; `rand`,
    * `current_timestamp` are nondeterministic by contract).
    */
  def x01Synthetic(s: SparkSession, dir: String): DataFrame =
    syntheticTransactions(s, 1000)

  /** x02 — stratified class rebalancing via `sampleBy`: keep every "fraud"
    * row ('R') but downsample the majority classes to ~20% — the standard
    * imbalanced-training-set move. Per-partition Bernoulli per stratum: no
    * shuffle, seeded, but partitioning-sensitive → rows-only check; the
    * fraction contract is asserted in SinksSourcesSpec.
    */
  def x02StratifiedSample(s: SparkSession, dir: String): DataFrame =
    graft.Tables.lineitem(s, dir)
      .stat.sampleBy("l_returnflag",
        Map("R" -> 1.0, "A" -> 0.2, "N" -> 0.2), seed = 42L)
      .groupBy("l_returnflag").agg(count(lit(1)).as("sampled_rows"))
      .orderBy("l_returnflag")

  /** x03 — x02's DETERMINISTIC twin: the same per-class keep-rates, but
    * decided by a Knuth multiplicative hash of the stable row key instead
    * of a per-partition RNG. A row's fate is a pure function of its
    * identity — stable across engines, partitionings, re-runs, and data
    * arrivals — which is what a 100 TB pipeline needs for reproducible
    * training sets (and what makes this one exactly oracle-checkable
    * where x02 is rows-only). Key encodes (orderkey, linenumber) as
    * `k·100 + ln` (e08's guarded PK encoding); pre-mod keeps the multiply
    * inside Long (e14's note).
    */
  def x03StratifiedHash(s: SparkSession, dir: String): DataFrame = {
    val keepPermille = Map("R" -> 1000L, "A" -> 200L, "N" -> 200L)
    val rate = keepPermille.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col("l_returnflag") === k, lit(v)).otherwise(acc)
    }
    val bucket = graft.operators.Det.knuthBucket(
      col("l_orderkey") * 100 + col("l_linenumber"), 1000L)
    graft.Tables.lineitem(s, dir)
      .select(col("l_returnflag"), bucket.as("b"), rate.as("keep_permille"))
      .filter(col("b") < col("keep_permille"))
      .groupBy("l_returnflag")
      .agg(max(col("keep_permille")).as("keep_permille"),
        count(lit(1)).as("sampled_rows"))
      .orderBy("l_returnflag")
  }

  private val x03Sql =
    s"""SELECT l_returnflag,
       |  CAST(max(keep_permille) AS BIGINT) AS keep_permille,
       |  CAST(count(*) AS BIGINT) AS sampled_rows
       |FROM (
       |  SELECT l_returnflag,
       |    ${graft.operators.Det.sqlKnuthBucket(
             "l_orderkey * 100 + l_linenumber", 1000L)} AS b,
       |    CASE l_returnflag WHEN 'R' THEN 1000 WHEN 'A' THEN 200
       |         WHEN 'N' THEN 200 ELSE 0 END AS keep_permille
       |  FROM lineitem) t
       |WHERE b < keep_permille
       |GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  /** Poisson(1) inverse-CDF thresholds at the 1e-6 grid — SHARED INTEGER
    * LITERALS (f03's Benford discipline: precomputed constants, never a
    * runtime exp/factorial), floor(P(X ≤ k)·10⁶) for k = 0..8; a uniform
    * draw ≥ the last threshold caps at 9 (P ≈ 1.1e-6).
    */
  private val PoissonCum: Seq[Long] =
    Seq(367879L, 735758L, 919698L, 981011L, 996340L,
      999405L, 999916L, 999989L, 999998L)
  private val BootReplicates = 32
  private val BootM = 1000000L

  /** x04 — DETERMINISTIC Poisson bootstrap over order totals: the
    * one-pass, no-resample spelling of bootstrap confidence intervals at
    * scale. Per (row, replicate) a hash-uniform draw maps through the
    * Poisson(1) inverse CDF to an integer weight (Poisson-ized multinomial
    * resampling — the standard approximation that makes bootstrap
    * EMBARRASSINGLY data-parallel: weights are a pure row function, so no
    * resampled copy of the data ever exists); replicate totals are exact
    * decimal sums of weight·amount, and the replicate spread IS the
    * sampling distribution of the total.
    *
    * Everything is engine-exact: integer thresholds (shared literals),
    * the Knuth hash mix, DECIMAL totals snapped at 4 dp, and the
    * mean/sd computed from decimal-exact Σx/Σx² in one identical double
    * op sequence (sqrt is IEEE correctly-rounded — the one libm-adjacent
    * call both engines agree on bit-for-bit).
    *
    * Scale: ONE scan with a 32× narrow fan-out (two longs per row) that
    * map-side-combines into [[BootReplicates]] groups — shuffle volume is
    * 32 rows per task regardless of data size. This is how you put a
    * confidence interval on a 100 TB metric without moving the data.
    */
  def x04PoissonBootstrap(s: SparkSession, dir: String): DataFrame = {
    val u = graft.operators.Det.knuthBucket(
      col("o_orderkey") * 101L + col("r") * 7919L, BootM)
    val w = PoissonCum.zipWithIndex.foldRight(
      lit(PoissonCum.length): org.apache.spark.sql.Column) {
      case ((t, k), rest) => when(col("u") < t, k.toLong).otherwise(rest)
    }
    // integer CENTS end-to-end (DriftOps' carrier): replicate totals are
    // BIGINT-exact to ~9e16 cents per replicate, and the Σx² pass squares
    // through DECIMAL(19,0) — scale 0, so neither engine ever rounds
    val totals = graft.Tables.orders(s, dir)
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
        explode(sequence(lit(0), lit(BootReplicates - 1))).as("r"))
      .withColumn("u", u)
      .withColumn("w", w)
      .groupBy(col("r"))
      .agg(sum(col("cents") * col("w")).as("bt_cents"))
    val summary = totals.agg(
      sum(col("bt_cents")).as("sx"),
      sum(col("bt_cents").cast("decimal(19,0)")
        * col("bt_cents").cast("decimal(19,0)")).as("sxx"))
    totals.crossJoin(broadcast(summary))
      .select(col("r").cast("long").as("replicate"),
        (col("bt_cents").cast("double") / 100.0).as("boot_total"),
        graft.operators.Det.r(
          col("sx").cast("double") / 100.0 / BootReplicates, 4).as("boot_mean"),
        graft.operators.Det.r(
          sqrt((col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")
              / BootReplicates) / (BootReplicates - 1)) / 100.0, 4)
          .as("boot_sd"))
      .orderBy("replicate")
  }

  private val x04Sql = {
    val whenChain = PoissonCum.zipWithIndex
      .map { case (t, k) => s"WHEN u < $t THEN $k" }.mkString(" ")
    s"""WITH draws AS (
       |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents, r,
       |    ${graft.operators.Det.sqlKnuthBucket(
            "o_orderkey * 101 + r * 7919", BootM)} AS u
       |  FROM orders CROSS JOIN (SELECT unnest(range(0, $BootReplicates)) AS r)),
       |weighted AS (
       |  SELECT r, cents,
       |    CASE $whenChain ELSE ${PoissonCum.length} END AS w
       |  FROM draws),
       |totals AS (
       |  SELECT r, CAST(sum(cents * w) AS BIGINT) AS bt_cents
       |  FROM weighted GROUP BY r),
       |summary AS (
       |  SELECT CAST(sum(bt_cents) AS BIGINT) AS sx,
       |         sum(CAST(bt_cents AS DECIMAL(19,0))
       |             * CAST(bt_cents AS DECIMAL(19,0))) AS sxx
       |  FROM totals)
       |SELECT CAST(r AS BIGINT) AS replicate,
       |  CAST(bt_cents AS DOUBLE) / 100.0 AS boot_total,
       |  ${graft.operators.Det.sqlR(
          s"CAST(sx AS DOUBLE) / 100.0 / $BootReplicates", 4)} AS boot_mean,
       |  ${graft.operators.Det.sqlR(
          s"sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)" +
            s" / $BootReplicates) / ${BootReplicates - 1}) / 100.0", 4)} AS boot_sd
       |FROM totals CROSS JOIN summary
       |ORDER BY replicate""".stripMargin
  }

  private val ReservoirK = 20

  /** x05 — EXACT-k-per-stratum deterministic sample: the [[ReservoirK]]
    * orders with the smallest Knuth-hash draw per priority stratum —
    * "bottom-k by hash", the mergeable/deterministic form of per-group
    * reservoir sampling (two bottom-k sketches union by re-taking the k
    * smallest, so per-day samples roll up to per-month samples without
    * re-scanning — the property rate-based x03 lacks, and RNG-based
    * reservoirs only have with careful weight bookkeeping).
    *
    * Runs through the library's own [[graft.plans.GroupedTopK]] physical
    * operator in ASCENDING mode: per-key bounded heaps, partial map-side
    * pass, shuffle capped at k rows per stratum per task — sampling cost
    * independent of data size. The oracle is the definitional
    * `row_number` spelling.
    */
  def x05GroupReservoir(s: SparkSession, dir: String): DataFrame = {
    val base = graft.Tables.orders(s, dir)
      .select(col("o_orderpriority"), col("o_orderkey"),
        graft.operators.Det.knuthBucket(col("o_orderkey"), 1000000000L)
          .cast("double").as("u"))
    graft.plans.GroupedTopK(base, Seq("o_orderpriority"), "u", "o_orderkey",
        ReservoirK, descending = false)
      .select(col("o_orderpriority"), col("o_orderkey"),
        col("u").cast("long").as("u"))
      .orderBy("o_orderpriority", "u", "o_orderkey")
  }

  private def x05Sql = {
    val u = graft.operators.Det.sqlKnuthBucket("o_orderkey", 1000000000L)
    s"""SELECT o_orderpriority, o_orderkey, CAST(u AS BIGINT) AS u
       |FROM (
       |  SELECT o_orderpriority, o_orderkey, u,
       |    row_number() OVER (PARTITION BY o_orderpriority
       |      ORDER BY u, o_orderkey) AS rk
       |  FROM (SELECT o_orderpriority, o_orderkey, $u AS u FROM orders))
       |WHERE rk <= $ReservoirK
       |ORDER BY o_orderpriority, u, o_orderkey""".stripMargin
  }

  /** Embargo width for x06, in days: test rows start this many days after
    * the train cutoff, so features windowed up to `EmbargoDays` back can
    * never straddle the boundary. (2 days against this testdata's ~30-day
    * span; production uses the feature-window width.)
    */
  private val EmbargoDays = 2L

  /** x06 — temporal embargo (purged) split of the event stream: train =
    * the first 70% of the covered day span, then [[EmbargoDays]] of
    * EMBARGO rows excluded from both sides, then test. The time-series
    * complement of c09's entity-level leakage-safe split: random or
    * hash splits leak FUTURE information into training whenever features
    * are windowed aggregates (w06's trailing features, a04's cohorts),
    * and rows adjacent to the cutoff leak through the window overlap —
    * the embargo purges exactly that band (López de Prado's purged
    * K-fold, single-split form). The cutoff day is pure integer
    * arithmetic on the observed span (min + span·7/10), so the split is
    * reproducible from the data alone — no config drift between the
    * pipeline and its backfill.
    *
    * Output: the per-split audit (rows, users, day range) a training job
    * logs before fitting. Scale: one narrow scan, a 2-row broadcast of
    * the span bounds, a 3-key aggregate — scan-bound at any size.
    */
  def x06TemporalEmbargoSplit(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        floor(unix_timestamp(col("ts")) / 86400).cast("long").as("d"))
    val span = ev.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    ev.crossJoin(broadcast(span))
      // `div`, not `/`: Column `/` is double division; the cutoff must be
      // the same integer day both engines compute
      .withColumn("cutoff", col("d0") + expr("(d1 - d0) * 7 div 10"))
      .withColumn("split",
        when(col("d") <= col("cutoff"), "train")
          .when(col("d") <= col("cutoff") + EmbargoDays, "embargo")
          .otherwise("test"))
      .groupBy("split")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("d")).as("first_day"),
        max(col("d")).as("last_day"))
      .orderBy("split")
  }

  private val x06Sql =
    s"""WITH ev AS (
       |  SELECT event_id, user_id,
       |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
       |  FROM events),
       |span AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
       |tagged AS (
       |  SELECT user_id, d,
       |    CASE WHEN d <= d0 + (d1 - d0) * 7 // 10 THEN 'train'
       |         WHEN d <= d0 + (d1 - d0) * 7 // 10 + $EmbargoDays
       |           THEN 'embargo'
       |         ELSE 'test' END AS split
       |  FROM ev CROSS JOIN span)
       |SELECT split,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       |  min(d) AS first_day, max(d) AS last_day
       |FROM tagged GROUP BY 1 ORDER BY split""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x01_synthetic_transactions" -> (x01Synthetic _),
    "x02_stratified_sample" -> (x02StratifiedSample _),
    "x03_stratified_hash" -> (x03StratifiedHash _),
    "x04_poisson_bootstrap" -> (x04PoissonBootstrap _),
    "x05_group_reservoir" -> (x05GroupReservoir _),
    "x06_temporal_embargo" -> (x06TemporalEmbargoSplit _))

  val oracles: Map[String, String] = Map(
    "x03_stratified_hash" -> x03Sql,
    "x04_poisson_bootstrap" -> x04Sql,
    "x05_group_reservoir" -> x05Sql,
    "x06_temporal_embargo" -> x06Sql)
}
