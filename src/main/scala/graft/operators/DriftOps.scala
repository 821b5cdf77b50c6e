package graft.operators

import graft.Caches.Tracked

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Det.r

/** Distribution-drift and forensic-statistics operators — the monitoring
  * layer a production fraud model needs around it (the reference trains and
  * evaluates once, `notebooks/3_ml_models.ipynb`; a deployed twin must
  * also DETECT when the incoming distribution no longer matches training).
  *
  * All three statistics are spelled EXACTLY — integer/decimal arithmetic
  * end-to-end, no libm calls — so both engines agree bit-for-bit:
  *
  *   - f01: total-variation distance between two deterministic hash splits
  *     (TVD = ½ Σ|p−q|; chosen over PSI/KL precisely because it needs no
  *     logarithm — `TextOps.t14` documents why libm log is banned from
  *     oracle-checked outputs).
  *   - f02: two-sample Kolmogorov–Smirnov statistic, computed from
  *     two-level prefix sums so no window ever sees the whole table.
  *   - f03: Benford first-significant-digit screen (forensic accounting's
  *     classic fabricated-amounts test — synthetic/uniform amounts, like
  *     this testdata's, light it up; organic ledgers don't).
  */
object DriftOps {

  /** Exact cents carrier — the shared [[Det.cents]] spelling. */
  private def cents(c: org.apache.spark.sql.Column) = Det.cents(c)

  /** Knuth multiplicative hash split ([[Det.knuthBucket]], k=2): a pure
    * row function of the stable key — reproducible across engines,
    * partitionings, and re-runs, unlike `randomSplit`.
    */
  private def hashSplit(c: org.apache.spark.sql.Column, k: Int) =
    Det.knuthBucket(c, k.toLong).cast("int")

  /** Count carrier for cross-class products: DECIMAL(18,0) × DECIMAL(18,0)
    * → 37 digits ≤ both engines' 38-digit cap, so cnt·n products stay
    * EXACT up to 1e18-row splits (a long×long would overflow at ~3e9×3e9).
    */
  private val Cnt = "decimal(18,0)"

  /** Dollar width of one drift histogram bin (f01) / one KS bucket (f02),
    * in cents. 10k-dollar bins over the [1k, 500k] order-total domain →
    * ~50 bins: bounded regardless of row count, so every "global" pass
    * below runs over a ~50-row table, never the data.
    */
  val BinCents = 1000000L

  /** The ONE bin definition every drift consumer shares — batch (f01/f02)
    * and the streaming monitor ([[graft.streaming.DriftStream]]): a
    * stream histogram is only comparable to its batch reference if both
    * used the same edges.
    */
  def amountBin(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    // floor, NOT cast-truncation: the SQL mirrors and f02's bucket floor
    // toward -∞, and a negative amount (refund) must land in bin -1 with
    // them, not truncate up into bin 0
    floor(cents(c).cast("double") / lit(BinCents.toDouble)).cast("long")

  /** The ONE ref/cur split definition the drift family shares (public for
    * the streaming twin): Knuth-hash half of a stable key — 0 = reference,
    * 1 = current.
    */
  def splitOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    hashSplit(c, 2)

  /** Per-bin two-split contingency counts over a frame carrying `split`
    * (0/1) and `bin` — the shared builder: batch f01/f06 run it over
    * [[splitOf]]-hashed orders, the streaming twin
    * ([[graft.streaming.DriftStream.windowedSplitBins]]) runs the same
    * aggregate per event-time window (extraKeys = the window column).
    * State/shuffle bounded by |bins| (× live windows when keyed).
    */
  def splitBins(binned: DataFrame, extraKeys: Seq[String] = Nil): DataFrame =
    binned.groupBy((extraKeys :+ "bin").map(col): _*)
      .agg(
        sum(when(col("split") === 0, 1L).otherwise(0L)).as("cnt_ref"),
        sum(when(col("split") === 1, 1L).otherwise(0L)).as("cnt_cur"))

  /** f06's EXACT χ² fold over a (bin, cnt_ref, cnt_cur) contingency table
    * — THE arithmetic shared by batch f06 and the streaming monitor that
    * reads [[graft.streaming.DriftStream.windowedSplitBins]]' sink (a
    * stream alert and a batch backfill can never disagree; the spec pins
    * cell equality). See [[f06Chi2Drift]] for the algebra and exactness
    * story.
    */
  def chi2TermsOn(perBin: DataFrame): DataFrame = {
    requireSingleWindow(perBin)
    val totals = perBin.agg(
      sum(col("cnt_ref")).as("n_ref"), sum(col("cnt_cur")).as("n_cur"))
    val d = (col("cnt_ref").cast(Cnt) * col("n_cur").cast(Cnt)
      - col("cnt_cur").cast(Cnt) * col("n_ref").cast(Cnt))
      .cast("decimal(19,0)")
    perBin.crossJoin(broadcast(totals))
      .select(
        col("bin"),
        (col("bin") * lit(BinCents / 100)).cast("double").as("lo_dollars"),
        col("cnt_ref"), col("cnt_cur"),
        when(col("n_ref") > 0L && col("n_cur") > 0L,
          r((d * d).cast("double")
            / ((col("cnt_ref") + col("cnt_cur")).cast("double")
              * col("n_ref").cast("double") * col("n_cur").cast("double")),
            8))
          .otherwise(lit(null).cast("double")).as("chi2_term"))
      .orderBy("bin")
  }

  /** f10's KS fold over a (bin, cnt_ref, cnt_cur) contingency table: the
    * sup over BIN-PREFIX cumulative differences, cross-multiplied exactly
    * like f02 (|cumRef·nCur − cumCur·nRef| in DECIMAL — no frequency ever
    * floats). This is the KS statistic COMPUTABLE FROM THE STREAM SINK
    * ([[graft.streaming.DriftStream.windowedSplitBins]]' output), with
    * the known coarsening property binnedKS ≤ exactKS ≤ binnedKS + max
    * within-bin mass (the sup is taken over ~50 bin edges instead of all
    * values). The one global window runs over the BIN table — bounded by
    * the price domain, never the data (f02's own discipline).
    */
  def ksFromBinsOn(perBin: DataFrame): DataFrame = {
    requireSingleWindow(perBin)
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perBin
      .withColumn("ca", sum(col("cnt_ref")).over(w))
      .withColumn("cb", sum(col("cnt_cur")).over(w))
    val totals = perBin.agg(
      sum(col("cnt_ref")).as("n_ref"), sum(col("cnt_cur")).as("n_cur"))
    cum.crossJoin(broadcast(totals))
      .withColumn("diff",
        abs(col("ca").cast(Cnt) * col("n_cur").cast(Cnt)
          - col("cb").cast(Cnt) * col("n_ref").cast(Cnt)))
      .orderBy(col("diff").desc, col("bin").asc)
      .limit(1)
      .select(
        ((col("bin") + 1) * lit(BinCents / 100)).cast("double")
          .as("at_edge_dollars"),
        // degenerate one-sided table (a low-volume window whose rows all
        // hash to one split) → NULL, not 0/0 = NaN — f04/f06's convention
        when(col("n_ref") > 0L && col("n_cur") > 0L,
          r(col("diff").cast("double")
            / (col("n_ref").cast(Cnt) * col("n_cur").cast(Cnt))
              .cast("double"), 6))
          .otherwise(lit(null).cast("double")).as("ks_stat"),
        col("n_ref"), col("n_cur"))
  }

  /** Guard for the per-bin folds: a WINDOWED contingency (the stream
    * sink) must be filtered to ONE window before folding — summing
    * totals across windows would silently produce a statistic belonging
    * to no window.
    */
  private def requireSingleWindow(perBin: DataFrame): Unit =
    require(!perBin.columns.contains("win"),
      "fold one window at a time: filter the windowed sink to a single " +
        "window (and drop `win`) before chi2TermsOn/ksFromBinsOn")

  /** f10 — binned two-sample KS between the f01/f06 hash splits of
    * `orders`: [[ksFromBinsOn]] over [[splitBins]]. The drift monitor's
    * stream-compatible KS — runs identically over a batch snapshot or any
    * finalized window of the live contingency sink.
    */
  def f10BinnedKs(s: SparkSession, dir: String): DataFrame = {
    val binned = Tables.orders(s, dir)
      .select(
        hashSplit(col("o_orderkey"), 2).as("split"),
        amountBin(col("o_totalprice")).as("bin"))
    ksFromBinsOn(splitBins(binned).tracked)
  }

  private val f10Sql =
    s"""WITH binned AS (
       |  SELECT ${Det.sqlKnuthBucket("o_orderkey", 2L)} AS split,
       |         CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
       |                    / $BinCents.0) AS BIGINT) AS bin
       |  FROM orders),
       |per_bin AS (
       |  SELECT bin,
       |    CAST(sum(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS cnt_ref,
       |    CAST(sum(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS cnt_cur
       |  FROM binned GROUP BY 1),
       |cum AS (
       |  SELECT bin,
       |    sum(cnt_ref) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS ca,
       |    sum(cnt_cur) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cb
       |  FROM per_bin),
       |totals AS (
       |  SELECT CAST(sum(cnt_ref) AS BIGINT) AS n_ref,
       |         CAST(sum(cnt_cur) AS BIGINT) AS n_cur FROM per_bin),
       |diffs AS (
       |  SELECT bin,
       |    abs(CAST(ca AS DECIMAL(18,0)) * CAST(n_cur AS DECIMAL(18,0))
       |      - CAST(cb AS DECIMAL(18,0)) * CAST(n_ref AS DECIMAL(18,0)))
       |      AS diff, n_ref, n_cur
       |  FROM cum CROSS JOIN totals)
       |SELECT CAST((bin + 1) * ${BinCents / 100} AS DOUBLE) AS at_edge_dollars,
       |  CASE WHEN n_ref > 0 AND n_cur > 0 THEN
       |  ${Det.sqlR(
            "CAST(diff AS DOUBLE) / CAST(CAST(n_ref AS DECIMAL(18,0)) " +
              "* CAST(n_cur AS DECIMAL(18,0)) AS DOUBLE)", 6)}
       |  ELSE CAST(NULL AS DOUBLE) END AS ks_stat,
       |  n_ref, n_cur
       |FROM diffs ORDER BY diff DESC, bin LIMIT 1""".stripMargin

  /** f01 — distribution drift as per-bin TOTAL-VARIATION terms between a
    * reference and a current split of `orders` (deterministic halves here;
    * in production: training snapshot vs live window).
    *
    * Each output row is one fixed-width amount bin with both counts and
    * its exact TVD contribution |cntR·nC − cntC·nR| / (2·nR·nC) — the
    * cross-multiplied form never materializes a per-split frequency, so
    * the only float ops are one decimal→double cast and one divide,
    * identical both engines. Σ terms = TVD ∈ [0,1] (spec-asserted).
    *
    * Scale: one narrow scan → ≤ ~50-bin map-combined aggregate; the grand
    * totals are a broadcast 1-row cross join (t05's pattern), NOT an
    * empty-frame window.
    */
  def f01TvdDrift(s: SparkSession, dir: String): DataFrame = {
    val binned = Tables.orders(s, dir)
      .select(
        hashSplit(col("o_orderkey"), 2).as("split"),
        amountBin(col("o_totalprice")).as("bin"))
    // the SAME shared builder f06/f10/the stream twin use — one split
    // definition for the whole family
    val perBin = splitBins(binned)
      .tracked // consumed twice: totals scalar + the per-bin projection
    val totals = perBin.agg(
      sum(col("cnt_ref")).as("n_ref"), sum(col("cnt_cur")).as("n_cur"))
    perBin.crossJoin(broadcast(totals))
      .select(
        col("bin"),
        (col("bin") * lit(BinCents / 100)).cast("double").as("lo_dollars"),
        col("cnt_ref"), col("cnt_cur"),
        r(col("cnt_ref").cast("double") / col("n_ref").cast("double"), 6)
          .as("freq_ref"),
        r(col("cnt_cur").cast("double") / col("n_cur").cast("double"), 6)
          .as("freq_cur"),
        r(abs(col("cnt_ref").cast(Cnt) * col("n_cur").cast(Cnt)
            - col("cnt_cur").cast(Cnt) * col("n_ref").cast(Cnt))
            .cast("double")
          / (col("n_ref").cast(Cnt) * col("n_cur").cast(Cnt) * lit(2))
            .cast("double"), 8).as("tvd_term"))
      .orderBy("bin")
  }

  private val f01Sql =
    s"""WITH binned AS (
       |  SELECT ${Det.sqlKnuthBucket("o_orderkey", 2L)} AS split,
       |         CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
       |                    / $BinCents.0) AS BIGINT) AS bin
       |  FROM orders),
       |per_bin AS (
       |  SELECT bin,
       |    CAST(sum(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS cnt_ref,
       |    CAST(sum(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS cnt_cur
       |  FROM binned GROUP BY 1),
       |totals AS (
       |  SELECT CAST(sum(cnt_ref) AS BIGINT) AS n_ref,
       |         CAST(sum(cnt_cur) AS BIGINT) AS n_cur FROM per_bin)
       |SELECT bin,
       |  CAST(bin * ${BinCents / 100} AS DOUBLE) AS lo_dollars,
       |  cnt_ref, cnt_cur,
       |  ${Det.sqlR("CAST(cnt_ref AS DOUBLE) / CAST(n_ref AS DOUBLE)", 6)}
       |    AS freq_ref,
       |  ${Det.sqlR("CAST(cnt_cur AS DOUBLE) / CAST(n_cur AS DOUBLE)", 6)}
       |    AS freq_cur,
       |  ${Det.sqlR(
            "CAST(abs(CAST(cnt_ref AS DECIMAL(18,0)) * CAST(n_cur AS DECIMAL(18,0)) " +
              "- CAST(cnt_cur AS DECIMAL(18,0)) * CAST(n_ref AS DECIMAL(18,0))) AS DOUBLE) " +
              "/ CAST(CAST(n_ref AS DECIMAL(18,0)) * CAST(n_cur AS DECIMAL(18,0)) * 2 AS DOUBLE)",
            8)} AS tvd_term
       |FROM per_bin CROSS JOIN totals
       |ORDER BY bin""".stripMargin

  /** f02 — EXACT two-sample Kolmogorov–Smirnov statistic between the
    * completed ('F') and open ('O') order-amount distributions:
    * D = sup_v |F_A(v) − F_B(v)|, reported with the amount where the
    * supremum is attained (min such amount on ties — a total order, so
    * the row is engine-independent).
    *
    * The textbook spelling sorts ALL values through one global cumsum —
    * a single-partition window, the exact scale bug e18/c07 avoid. Here
    * the prefix sums are TWO-LEVEL: per-value counts cum-summed WITHIN
    * their bounded amount bucket (parallel windows, one per bucket), plus
    * an exclusive prefix over the ~50-row bucket-total table (the only
    * "global" window, bounded by the price domain, never the data).
    * cum(v) = bucket_prefix + within_cum — exact integers throughout;
    * the sup comparison |cumA·nB − cumB·nA| is cross-multiplied in
    * DECIMAL so no frequency is ever a float. Final row via
    * orderBy(diff desc, v).limit(1) → TakeOrderedAndProject, no sort.
    */
  def f02KsDrift(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.orders(s, dir)
      .filter(col("o_orderstatus").isin("F", "O"))
      .select(
        cents(col("o_totalprice")).as("v"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("is_a"))
    val perV = base.groupBy("v")
      .agg(sum(col("is_a")).as("ca"), sum(lit(1L) - col("is_a")).as("cb"))
      .withColumn("bucket",
        floor(col("v").cast("double") / lit(BinCents.toDouble)).cast("long"))
      .tracked // consumed by within-cums, bucket totals, and grand totals
    val withinW = Window.partitionBy("bucket").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = perV
      .withColumn("wa", sum(col("ca")).over(withinW))
      .withColumn("wb", sum(col("cb")).over(withinW))
    val bucketTot = perV.groupBy("bucket")
      .agg(sum(col("ca")).as("ba"), sum(col("cb")).as("bb"))
    val prefixW = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bucketPrefix = bucketTot // bounded (~50 rows): global window is fine
      .withColumn("pa", sum(col("ba")).over(prefixW) - col("ba"))
      .withColumn("pb", sum(col("bb")).over(prefixW) - col("bb"))
      // fresh name: `bucket` here shares lineage (and expr id) with
      // within's — an equi-join on the same-id column would be ambiguous
      .select(col("bucket").as("pbucket"), col("pa"), col("pb"))
    val totals = bucketTot.agg(
      sum(col("ba")).as("n_a"), sum(col("bb")).as("n_b"))
    within.join(bucketPrefix, col("bucket") === col("pbucket"))
      .crossJoin(broadcast(totals))
      .withColumn("diff",
        abs((col("pa") + col("wa")).cast(Cnt) * col("n_b").cast(Cnt)
          - (col("pb") + col("wb")).cast(Cnt) * col("n_a").cast(Cnt)))
      .orderBy(col("diff").desc, col("v").asc)
      .limit(1)
      .select(
        (col("v").cast("double") / lit(100.0)).as("at_amount"),
        r(col("diff").cast("double")
          / (col("n_a").cast(Cnt) * col("n_b").cast(Cnt)).cast("double"), 6)
          .as("ks_stat"),
        col("n_a"), col("n_b"))
  }

  private val f02Sql =
    s"""WITH base AS (
       |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
       |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_a
       |  FROM orders WHERE o_orderstatus IN ('F', 'O')),
       |per_v AS (
       |  SELECT v, CAST(sum(is_a) AS BIGINT) AS ca,
       |         CAST(sum(1 - is_a) AS BIGINT) AS cb,
       |         CAST(floor(CAST(v AS DOUBLE) / $BinCents.0) AS BIGINT)
       |           AS bucket
       |  FROM base GROUP BY 1),
       |within AS (
       |  SELECT *,
       |    sum(ca) OVER (PARTITION BY bucket ORDER BY v
       |                  ROWS UNBOUNDED PRECEDING) AS wa,
       |    sum(cb) OVER (PARTITION BY bucket ORDER BY v
       |                  ROWS UNBOUNDED PRECEDING) AS wb
       |  FROM per_v),
       |bucket_tot AS (
       |  SELECT bucket, CAST(sum(ca) AS BIGINT) AS ba,
       |         CAST(sum(cb) AS BIGINT) AS bb
       |  FROM per_v GROUP BY 1),
       |bucket_prefix AS (
       |  SELECT bucket,
       |    CAST(sum(ba) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
       |         - ba AS BIGINT) AS pa,
       |    CAST(sum(bb) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
       |         - bb AS BIGINT) AS pb
       |  FROM bucket_tot),
       |totals AS (
       |  SELECT CAST(sum(ba) AS BIGINT) AS n_a,
       |         CAST(sum(bb) AS BIGINT) AS n_b FROM bucket_tot),
       |scored AS (
       |  SELECT w.v, totals.n_a, totals.n_b,
       |    abs(CAST(p.pa + w.wa AS DECIMAL(18,0))
       |          * CAST(totals.n_b AS DECIMAL(18,0))
       |        - CAST(p.pb + w.wb AS DECIMAL(18,0))
       |          * CAST(totals.n_a AS DECIMAL(18,0))) AS diff
       |  FROM within w JOIN bucket_prefix p USING (bucket)
       |  CROSS JOIN totals)
       |SELECT CAST(v AS DOUBLE) / 100.0 AS at_amount,
       |  ${Det.sqlR(
            "CAST(diff AS DOUBLE) / CAST(CAST(n_a AS DECIMAL(18,0)) " +
              "* CAST(n_b AS DECIMAL(18,0)) AS DOUBLE)", 6)} AS ks_stat,
       |  n_a, n_b
       |FROM scored ORDER BY diff DESC, v ASC LIMIT 1""".stripMargin

  /** Benford expected first-digit frequencies log10(1+1/d), 6 dp — shared
    * LITERALS (never a runtime log call) so both engines emit identical
    * doubles.
    */
  private val Benford: Seq[(Int, Double)] = Seq(
    1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939, 4 -> 0.096910,
    5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992, 8 -> 0.051153,
    9 -> 0.045757)

  /** f03 — Benford first-significant-digit screen over order totals.
    *
    * First digit extracted WITHOUT log10 (libm, banned): the amount's
    * exact integer-cents carrier is formatted as a string — long→string
    * is exact and identical both engines — and digit = first character.
    * (Scaling by 100 never changes the leading significant digit.)
    * Expected frequencies are shared literals; deviation = |obs − exp|.
    * On this synthetic uniform-amount data the screen FIRES (uniform
    * amounts are maximally non-Benford) — which is the point: it's the
    * forensic test for fabricated amounts.
    *
    * Scale: one narrow scan → 9-row map-combined aggregate → broadcast
    * total; the expected table is a 9-row literal join.
    */
  def f03Benford(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val digits = Tables.orders(s, dir)
      .select(cents(col("o_totalprice")).as("c"))
      .filter(col("c") > 0)
      .select(substring(col("c").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("total"))
    val expected = Benford.toDF("digit", "expected")
    digits // right-join BEFORE the total cross join so absent digits
      .join(broadcast(expected), Seq("digit"), "right") // still get `total`
      .crossJoin(broadcast(total))
      .select(
        col("digit"),
        coalesce(col("n"), lit(0L)).as("n"),
        r(coalesce(col("n"), lit(0L)).cast("double")
          / col("total").cast("double"), 6).as("freq"),
        col("expected"),
        r(abs(r(coalesce(col("n"), lit(0L)).cast("double")
          / col("total").cast("double"), 6) - col("expected")), 6)
          .as("abs_dev"))
      .orderBy("digit")
  }

  private val f03Sql = {
    // CAST each literal: a bare 0.30103 is DECIMAL in DuckDB, DOUBLE here
    val expectedRows = Benford
      .map { case (d, e) => s"($d, CAST($e AS DOUBLE))" }.mkString(", ")
    val freq = Det.sqlR("CAST(coalesce(n, 0) AS DOUBLE) / CAST(total AS DOUBLE)", 6)
    s"""WITH digits AS (
       |  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
       |        FROM orders) t
       |  WHERE c > 0 GROUP BY 1),
       |total AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM digits),
       |expected(digit, expected) AS (VALUES $expectedRows)
       |SELECT e.digit, CAST(coalesce(n, 0) AS BIGINT) AS n,
       |  $freq AS freq, e.expected,
       |  ${Det.sqlR(s"abs(($freq) - e.expected)", 6)} AS abs_dev
       |FROM expected e
       |LEFT JOIN digits d ON d.digit = e.digit
       |CROSS JOIN total
       |ORDER BY e.digit""".stripMargin
  }

  /** f04 — McNemar's paired test between two DETERMINISTIC fraud rules
    * (A: high-value; B: moderate-value in the overnight window) against
    * the error-event truth label. The right comparison for two
    * classifiers scored on the SAME rows is the DISCORDANT pairs only —
    * b = A right/B wrong, c = B right/A wrong — not two independent
    * accuracies; the statistic (b−c)²/(b+c) is a ratio of small exact
    * integers, so no continuity/χ² table lookup is needed to make the
    * VALUE engine-exact (the >3.84 significance reading is left to the
    * caller). Rule-based (pure row predicates) precisely so the whole
    * test is oracle-checkable — model scores are partitioning-sensitive,
    * which is why the ML rows are rows-only (m02–m04).
    *
    * Scale: one narrow scan → four counters (map-side combined) → one row.
    */
  def f04Mcnemar(s: SparkSession, dir: String): DataFrame = {
    val truth = (col("event_type") === "error").cast("int")
    val ruleA = (col("value") >= 300.0).cast("int")
    val ruleB = (col("value") >= 200.0 && hour(col("ts")) < 6).cast("int")
    Tables.events(s, dir)
      .select(truth.as("y"), ruleA.as("a"), ruleB.as("b"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("a") === col("y") && col("b") =!= col("y"), 1L)
          .otherwise(0L)).as("b_discordant"),
        sum(when(col("a") =!= col("y") && col("b") === col("y"), 1L)
          .otherwise(0L)).as("c_discordant"))
      .select(col("n"), col("b_discordant"), col("c_discordant"),
        // degenerate case: rules never disagree → b+c = 0 → statistic is
        // undefined; emit NULL (both engines agree on NULL, while NaN's
        // textual/hash form is engine-specific)
        when(col("b_discordant") + col("c_discordant") > 0L,
          r((col("b_discordant") - col("c_discordant")).cast("double")
            * (col("b_discordant") - col("c_discordant")).cast("double")
            / (col("b_discordant") + col("c_discordant")).cast("double"), 6))
          .otherwise(lit(null).cast("double"))
          .as("mcnemar_stat"))
  }

  private val f04Sql =
    s"""WITH scored AS (
       |  SELECT CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y,
       |    CASE WHEN value >= 300.0 THEN 1 ELSE 0 END AS a,
       |    CASE WHEN value >= 200.0 AND hour(ts) < 6 THEN 1 ELSE 0 END AS b
       |  FROM events),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN a = y AND b <> y THEN 1 ELSE 0 END) AS BIGINT)
       |      AS b_discordant,
       |    CAST(sum(CASE WHEN a <> y AND b = y THEN 1 ELSE 0 END) AS BIGINT)
       |      AS c_discordant
       |  FROM scored)
       |SELECT n, b_discordant, c_discordant,
       |  CASE WHEN b_discordant + c_discordant > 0 THEN
       |  ${Det.sqlR(
            "CAST(b_discordant - c_discordant AS DOUBLE) " +
              "* CAST(b_discordant - c_discordant AS DOUBLE) " +
              "/ CAST(b_discordant + c_discordant AS DOUBLE)", 6)}
       |  ELSE CAST(NULL AS DOUBLE) END
       |    AS mcnemar_stat
       |FROM agg""".stripMargin

  /** f05 — CUSUM change-point detection over the daily error-count
    * series: the day where the cumulative deviation from the overall
    * daily mean peaks — the classic "when did the regime change" scan
    * statistic. Kept EXACT by scaling instead of dividing:
    * S_t = n·Σ_{i≤t} x_i − t·Σx is (n × the usual CUSUM) in pure
    * integers, and argmax is scale-invariant, so the reported day and
    * direction carry no float at all; the normalized magnitude divides
    * once at the end, snapped.
    *
    * Scale: daily counts are one map-combined aggregate; the prefix sum
    * runs on the calendar-bounded day table (w11's argument); argmax via
    * top-1, not a sort.
    */
  def f05CusumChangepoint(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "error")
      .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).as("x"))
    val totals = daily.agg(
      sum(col("x")).as("total"), count(lit(1)).as("n_days"))
    val w = Window.orderBy("day") // calendar-bounded
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cum_x", sum(col("x")).over(w))
      .withColumn("t", count(lit(1)).over(w))
      .crossJoin(broadcast(totals))
      .withColumn("s_scaled",
        col("n_days") * col("cum_x") - col("t") * col("total"))
      .orderBy(abs(col("s_scaled")).desc, col("day").asc)
      .limit(1)
      .select(col("day").as("change_day"),
        col("n_days"), col("total").as("total_errors"),
        col("s_scaled"),
        when(col("s_scaled") > 0, lit("above-mean-then-drop"))
          .otherwise(lit("below-mean-then-rise")).as("direction"),
        r(abs(col("s_scaled")).cast("double")
          / col("n_days").cast("double"), 4).as("cusum_magnitude"))
  }

  private val f05Sql =
    s"""WITH daily AS (
       |  SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM events WHERE event_type = 'error' GROUP BY 1),
       |totals AS (
       |  SELECT CAST(sum(x) AS BIGINT) AS total,
       |         CAST(count(*) AS BIGINT) AS n_days FROM daily),
       |cum AS (
       |  SELECT day,
       |    CAST(sum(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
       |         AS BIGINT) AS cum_x,
       |    CAST(count(*) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
       |         AS BIGINT) AS t
       |  FROM daily),
       |scored AS (
       |  SELECT day, n_days, total,
       |    n_days * cum_x - t * total AS s_scaled
       |  FROM cum CROSS JOIN totals)
       |SELECT day AS change_day, n_days, total AS total_errors, s_scaled,
       |  CASE WHEN s_scaled > 0 THEN 'above-mean-then-drop'
       |       ELSE 'below-mean-then-rise' END AS direction,
       |  ${Det.sqlR("CAST(abs(s_scaled) AS DOUBLE) / CAST(n_days AS DOUBLE)", 4)}
       |    AS cusum_magnitude
       |FROM scored ORDER BY abs(s_scaled) DESC, day ASC LIMIT 1""".stripMargin

  /** f06 — Pearson χ² homogeneity test between the two hash splits over
    * the SAME amount bins as f01 (2×B contingency table) — the
    * significance-testable companion to f01's effect-size TVD: TVD says
    * how far apart the histograms are, χ² says whether that distance is
    * explainable by sampling noise (compare Σ terms to χ²_{B−1}).
    *
    * Exactness: the textbook Σ(O−E)²/E over both rows of the 2×B table
    * algebraically collapses — with D_i = cntRef_i·nCur − cntCur_i·nRef,
    * the bin's BOTH-splits contribution is exactly
    * D_i² / (rowtot_i·nRef·nCur). D is integer (DECIMAL-exact to 1e9-row
    * splits, f01's documented carrier cap: D ≤ n² must stay < 1e19 for
    * the 38-digit square), squared EXACTLY in decimal before its one
    * cast; the denominator's doubles are exact ≤ 2^53 and multiplied in
    * the same order both engines. Degenerate empty split → NULL terms
    * (f04's convention).
    *
    * Scale: identical to f01 — one narrow scan, ≤ ~50-bin map-combined
    * aggregate, broadcast 1-row totals.
    */
  def f06Chi2Drift(s: SparkSession, dir: String): DataFrame = {
    val binned = Tables.orders(s, dir)
      .select(
        hashSplit(col("o_orderkey"), 2).as("split"),
        amountBin(col("o_totalprice")).as("bin"))
    // cache: consumed twice inside the fold (totals scalar + projection)
    chi2TermsOn(splitBins(binned).tracked)
  }

  private val f06Sql = {
    val d = "(CAST(CAST(cnt_ref AS DECIMAL(18,0)) * CAST(n_cur AS DECIMAL(18,0)) " +
      "- CAST(cnt_cur AS DECIMAL(18,0)) * CAST(n_ref AS DECIMAL(18,0)) " +
      "AS DECIMAL(19,0)))"
    s"""WITH binned AS (
       |  SELECT ${Det.sqlKnuthBucket("o_orderkey", 2L)} AS split,
       |         CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
       |                    / $BinCents.0) AS BIGINT) AS bin
       |  FROM orders),
       |per_bin AS (
       |  SELECT bin,
       |    CAST(sum(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS cnt_ref,
       |    CAST(sum(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS cnt_cur
       |  FROM binned GROUP BY 1),
       |totals AS (
       |  SELECT CAST(sum(cnt_ref) AS BIGINT) AS n_ref,
       |         CAST(sum(cnt_cur) AS BIGINT) AS n_cur FROM per_bin)
       |SELECT bin,
       |  CAST(bin * ${BinCents / 100} AS DOUBLE) AS lo_dollars,
       |  cnt_ref, cnt_cur,
       |  CASE WHEN n_ref > 0 AND n_cur > 0 THEN
       |  ${Det.sqlR(
            s"CAST($d * $d AS DOUBLE) " +
              "/ (CAST(cnt_ref + cnt_cur AS DOUBLE) " +
              "* CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE))", 8)}
       |  ELSE CAST(NULL AS DOUBLE) END AS chi2_term
       |FROM per_bin CROSS JOIN totals
       |ORDER BY bin""".stripMargin
  }

  /** Wide exact-integer carrier for rank sums: Σ ca·(2·pre+t+1) ≤ n·(3n+2),
    * and the variance numerator n1·n2·(n³−n−T) ≤ n⁵/4 — inside 38 digits
    * up to ~3×10⁷ rows per test window; beyond that, pre-aggregate into
    * value buckets first (the bins are already there).
    */
  private val Dec38 = "decimal(38,0)"

  /** f07 — exact two-sample Mann–Whitney U (Wilcoxon rank-sum) between the
    * deterministic hash halves of the order totals: the nonparametric
    * location-shift drift test, completing the battery (f01 TVD = shape,
    * f02 KS = sup-CDF, f07 = stochastic dominance). Everything is INTEGER
    * until the final division: ranks are kept DOUBLED (2·rank = 2·pre +
    * t + 1 where pre = items strictly below, t = ties at the value — an
    * odd/even-safe integer), so midranks never touch a float; the doubled
    * rank sums, U statistics, and the tie-corrected variance numerator
    * n1·n2·(n³−n−Σ(t³−t)) are DECIMAL(38,0)-exact, and the z-score's only
    * float ops (one divide, one sqrt) run on bit-identical doubles in both
    * engines.
    *
    * Scale: f02's two-level prefix-sum layout — per-value counts cum-summed
    * within their bounded amount bucket, plus an exclusive prefix over the
    * ~50-row bucket-total table. No global sort, no global window; the
    * final statistics are a 1-row aggregate.
    */
  def f07MannWhitney(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.orders(s, dir)
      .select(
        cents(col("o_totalprice")).as("v"),
        hashSplit(col("o_orderkey"), 2).as("split"))
    val perV = base.groupBy("v")
      .agg(
        sum(when(col("split") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("split") === 1, 1L).otherwise(0L)).as("cb"))
      .withColumn("bucket",
        floor(col("v").cast("double") / lit(BinCents.toDouble)).cast("long"))
      .tracked // consumed by within-cums and bucket totals
    val withinW = Window.partitionBy("bucket").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = perV
      .withColumn("wa", sum(col("ca")).over(withinW))
      .withColumn("wb", sum(col("cb")).over(withinW))
    val bucketTot = perV.groupBy("bucket")
      .agg(sum(col("ca")).as("ba"), sum(col("cb")).as("bb"))
    val prefixW = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bucketPrefix = bucketTot // bounded (~50 rows): global window is fine
      .withColumn("pa", sum(col("ba")).over(prefixW) - col("ba"))
      .withColumn("pb", sum(col("bb")).over(prefixW) - col("bb"))
      .select(col("bucket").as("pbucket"), col("pa"), col("pb"))
    val t = (col("ca") + col("cb")).cast(Dec38)
    val pre = (col("pa") + col("wa") + col("pb") + col("wb")).cast(Dec38) - t
    val rank2 = pre * 2 + t + 1 // doubled midrank, exact integer
    val sums = within.join(bucketPrefix, col("bucket") === col("pbucket"))
      .select(
        col("ca"), col("cb"),
        (col("ca").cast(Dec38) * rank2).as("r2a_term"),
        (col("cb").cast(Dec38) * rank2).as("r2b_term"),
        (t * t * t - t).as("tie_term"))
      .agg(
        sum(col("ca")).as("n_ref"), sum(col("cb")).as("n_cur"),
        sum(col("r2a_term")).as("r2a"), sum(col("r2b_term")).as("r2b"),
        sum(col("tie_term")).as("tt"))
    val n1 = col("n_ref").cast(Dec38)
    val n2 = col("n_cur").cast(Dec38)
    val n = n1 + n2
    val u2Ref = col("r2a") - n1 * (n1 + 1)
    val u2Cur = col("r2b") - n2 * (n2 + 1)
    val varNum = n1 * n2 * ((n * n * n - n).cast(Dec38) - col("tt"))
    val varDen = (n * (n - 1) * 12).cast("double")
    val zRef = (u2Ref.cast("double") - (n1 * n2).cast("double")) /
      (sqrt(varNum.cast("double") / varDen) * 2)
    sums.select(
      col("n_ref"), col("n_cur"),
      u2Ref.cast("double").as("u2_ref"),
      u2Cur.cast("double").as("u2_cur"),
      col("tt").cast("double").as("tie_term"),
      when(varNum > 0, r(zRef, 6)).otherwise(lit(null).cast("double"))
        .as("z_ref"))
  }

  private val f07Sql = {
    // HUGEINT (int128), not DECIMAL: DuckDB decimal multiplication widens
    // p1+p2 past the 38-digit cap and binds to DOUBLE; int128 products stay
    // exact over the same range as Spark's DECIMAL(38,0) side
    val d38 = "HUGEINT"
    s"""WITH base AS (
       |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
       |         ${Det.sqlKnuthBucket("o_orderkey", 2L)} AS split
       |  FROM orders),
       |per_v AS (
       |  SELECT v,
       |    CAST(sum(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |    CAST(sum(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb,
       |    CAST(floor(CAST(v AS DOUBLE) / $BinCents.0) AS BIGINT) AS bucket
       |  FROM base GROUP BY 1),
       |within AS (
       |  SELECT *,
       |    sum(ca) OVER (PARTITION BY bucket ORDER BY v
       |                  ROWS UNBOUNDED PRECEDING) AS wa,
       |    sum(cb) OVER (PARTITION BY bucket ORDER BY v
       |                  ROWS UNBOUNDED PRECEDING) AS wb
       |  FROM per_v),
       |bucket_tot AS (
       |  SELECT bucket, CAST(sum(ca) AS BIGINT) AS ba,
       |         CAST(sum(cb) AS BIGINT) AS bb
       |  FROM per_v GROUP BY 1),
       |bucket_prefix AS (
       |  SELECT bucket,
       |    CAST(sum(ba) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
       |         - ba AS BIGINT) AS pa,
       |    CAST(sum(bb) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
       |         - bb AS BIGINT) AS pb
       |  FROM bucket_tot),
       |terms AS (
       |  SELECT w.ca, w.cb,
       |    CAST(w.ca AS $d38)
       |      * ((CAST(p.pa + w.wa + p.pb + w.wb AS $d38)
       |            - CAST(w.ca + w.cb AS $d38)) * 2
       |         + CAST(w.ca + w.cb AS $d38) + 1) AS r2a_term,
       |    CAST(w.cb AS $d38)
       |      * ((CAST(p.pa + w.wa + p.pb + w.wb AS $d38)
       |            - CAST(w.ca + w.cb AS $d38)) * 2
       |         + CAST(w.ca + w.cb AS $d38) + 1) AS r2b_term,
       |    CAST(w.ca + w.cb AS $d38) * CAST(w.ca + w.cb AS $d38)
       |      * CAST(w.ca + w.cb AS $d38)
       |      - CAST(w.ca + w.cb AS $d38) AS tie_term
       |  FROM within w JOIN bucket_prefix p ON w.bucket = p.bucket),
       |sums AS (
       |  SELECT CAST(sum(ca) AS BIGINT) AS n_ref,
       |         CAST(sum(cb) AS BIGINT) AS n_cur,
       |         CAST(sum(r2a_term) AS $d38) AS r2a,
       |         CAST(sum(r2b_term) AS $d38) AS r2b,
       |         CAST(sum(tie_term) AS $d38) AS tt
       |  FROM terms),
       |fin AS (
       |  SELECT n_ref, n_cur, r2a, r2b, tt,
       |    CAST(n_ref AS $d38) AS n1, CAST(n_cur AS $d38) AS n2,
       |    CAST(n_ref AS $d38) + CAST(n_cur AS $d38) AS n
       |  FROM sums)
       |SELECT n_ref, n_cur,
       |  CAST(r2a - n1 * (n1 + 1) AS DOUBLE) AS u2_ref,
       |  CAST(r2b - n2 * (n2 + 1) AS DOUBLE) AS u2_cur,
       |  CAST(tt AS DOUBLE) AS tie_term,
       |  CASE WHEN n1 * n2 * (CAST(n * n * n - n AS $d38) - tt) > 0 THEN
       |    ${Det.sqlR(
             s"(CAST(r2a - n1 * (n1 + 1) AS DOUBLE) - CAST(n1 * n2 AS DOUBLE)) " +
               s"/ (sqrt(CAST(n1 * n2 * (CAST(n * n * n - n AS $d38) - tt) AS DOUBLE) " +
               s"/ CAST(CAST(n * (n - 1) * 12 AS $d38) AS DOUBLE)) * 2)", 6)}
       |  ELSE CAST(NULL AS DOUBLE) END AS z_ref
       |FROM fin""".stripMargin
  }

  /** f08 — two-proportion z-test on the purchase-conversion rate between
    * the deterministic hash halves of the event stream: the A/B-test /
    * canary-release statistic (is the treatment half converting at the
    * control half's rate?). All counting is exact integers; the only float
    * ops are the four divisions, one multiply chain, and one sqrt of the
    * pooled-variance formula z = (p̂₁−p̂₂) / √(p̂(1−p̂)(1/n₁+1/n₂)),
    * spelled op-for-op identically in both engines on bit-identical
    * integer inputs. Degenerate pools (p̂ ∈ {0,1}, zero variance) → NULL.
    *
    * Scale: one narrow scan → a 2-row map-combined aggregate; nothing
    * downstream ever sees the data again. This is the cheapest statistic
    * in the battery and the one to run per-canary-deploy.
    */
  def f08TwoProportion(s: SparkSession, dir: String): DataFrame =
    twoProportionRow(conversionSplits(Tables.events(s, dir)))

  /** Running conversion counts (split, n, x) per deterministic hash half —
    * the SHARED state shape of the batch test and the streaming canary
    * monitor ([[graft.streaming.DriftStream.conversionSplits]]): as a
    * streaming complete-mode aggregate its state is bounded at exactly
    * 2 rows forever (the key domain is the hash range, not the data).
    */
  def conversionSplits(events: DataFrame): DataFrame =
    events
      .select(
        hashSplit(col("event_id"), 2).as("split"),
        (col("event_type") === "purchase").cast("long").as("is_conv"))
      .groupBy("split")
      .agg(count(lit(1)).as("n"), sum(col("is_conv")).as("x"))

  /** Fold the 2-row split table into the f08 statistic row — ONE
    * arithmetic definition consumed by both the batch operator and the
    * live monitor reading the stream's sink table, so the two can never
    * disagree (parity is spec-pinned on identical input).
    */
  def twoProportionRow(splits: DataFrame): DataFrame = {
    val agg = splits.agg(
      sum(when(col("split") === 0, col("n")).otherwise(0L)).as("n_ref"),
      sum(when(col("split") === 0, col("x")).otherwise(0L)).as("x_ref"),
      sum(when(col("split") === 1, col("n")).otherwise(0L)).as("n_cur"),
      sum(when(col("split") === 1, col("x")).otherwise(0L)).as("x_cur"))
    val p1 = col("x_ref").cast("double") / col("n_ref").cast("double")
    val p2 = col("x_cur").cast("double") / col("n_cur").cast("double")
    val pp = (col("x_ref") + col("x_cur")).cast("double") /
      (col("n_ref") + col("n_cur")).cast("double")
    val se = sqrt(pp * (lit(1.0) - pp)
      * (lit(1.0) / col("n_ref").cast("double")
        + lit(1.0) / col("n_cur").cast("double")))
    agg.select(
      col("n_ref"), col("x_ref"), col("n_cur"), col("x_cur"),
      // guarded: an EMPTY split (possible in an early canary micro-batch
      // where every id so far hashed one way) must yield NULL like
      // DuckDB's x/0, not a NaN/ANSI-divide hazard
      when(col("n_ref") > 0, r(p1, 6)).otherwise(lit(null).cast("double"))
        .as("conv_ref"),
      when(col("n_cur") > 0, r(p2, 6)).otherwise(lit(null).cast("double"))
        .as("conv_cur"),
      when(col("n_ref") > 0 && col("n_cur") > 0
        && col("x_ref") + col("x_cur") > 0
        && col("x_ref") + col("x_cur") < col("n_ref") + col("n_cur"),
        r((p1 - p2) / se, 6)).otherwise(lit(null).cast("double")).as("z"))
  }

  private val f08Sql = {
    val p1 = "CAST(x_ref AS DOUBLE) / CAST(n_ref AS DOUBLE)"
    val p2 = "CAST(x_cur AS DOUBLE) / CAST(n_cur AS DOUBLE)"
    val pp = "CAST(x_ref + x_cur AS DOUBLE) / CAST(n_ref + n_cur AS DOUBLE)"
    val se = s"sqrt($pp * (1.0 - $pp) " +
      s"* (1.0 / CAST(n_ref AS DOUBLE) + 1.0 / CAST(n_cur AS DOUBLE)))"
    s"""WITH agg AS (
       |  SELECT
       |    CAST(sum(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
       |    CAST(sum(CASE WHEN split = 0 THEN is_conv ELSE 0 END) AS BIGINT) AS x_ref,
       |    CAST(sum(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur,
       |    CAST(sum(CASE WHEN split = 1 THEN is_conv ELSE 0 END) AS BIGINT) AS x_cur
       |  FROM (
       |    SELECT ${Det.sqlKnuthBucket("event_id", 2L)} AS split,
       |      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_conv
       |    FROM events))
       |SELECT n_ref, x_ref, n_cur, x_cur,
       |  ${Det.sqlR(p1, 6)} AS conv_ref,
       |  ${Det.sqlR(p2, 6)} AS conv_cur,
       |  CASE WHEN n_ref > 0 AND n_cur > 0 AND x_ref + x_cur > 0
       |            AND x_ref + x_cur < n_ref + n_cur THEN
       |    ${Det.sqlR(s"($p1 - $p2) / $se", 6)}
       |  ELSE CAST(NULL AS DOUBLE) END AS z
       |FROM agg""".stripMargin
  }

  /** f09 — Wald–Wolfowitz RUNS test on the daily-revenue sequence: are
    * above-median and below-median days randomly interleaved, or do they
    * clump (trend/regime drift) or alternate (over-correction)? Completes
    * the nonparametric battery's last axis — f01 tests shape, f02 the
    * CDF, f07 location, f08 a proportion; f09 tests ORDERING, which none
    * of the others can see (shuffle the days and they all agree; the
    * runs count collapses). Exact to the end: the median is the exact
    * discrete p50 of the daily cents histogram (e18's cumsum spelling),
    * equal-to-median days are dropped per the standard recipe, the runs
    * count is an integer lag-compare sum, and the closed-form normal
    * approximation z = (R − μ)/σ (μ = 2n₁n₂/n + 1,
    * σ² = 2n₁n₂(2n₁n₂−n)/(n²(n−1))) runs the same double ops both
    * engines.
    *
    * Scale: everything after the per-day aggregate operates on the DAILY
    * table — bounded by the date span (decades ≈ 10⁴ rows), so its global
    * windows are bounded-table windows, never data-sized (the same
    * argument as f02's ~50-row bucket table).
    */
  def f09RunsTest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(s, dir)
      .select(floor(unix_timestamp(col("o_orderdate")) / 86400).cast("long")
        .as("d"), col("o_totalprice"))
      .groupBy("d")
      .agg(sum(cents(col("o_totalprice"))).as("rev"))
      .tracked // bounded (date span); feeds the median AND the runs pass
    // exact discrete median of the daily revenue (e18's histogram cumsum)
    val hist = daily.groupBy(col("rev").as("v")).agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy()))
    val med = cum.agg(min(when(
      col("cum") >= floor((col("n") * 50 + lit(99)) / lit(100.0)).cast("long"),
      col("v"))).as("median_rev"))
    val signed = daily.crossJoin(broadcast(med))
      .filter(col("rev") =!= col("median_rev")) // standard: drop ties
      .withColumn("above", (col("rev") > col("median_rev")).cast("long"))
    val seqW = Window.orderBy("d") // bounded daily table: global is fine
    val runs = signed
      .withColumn("prev", lag(col("above"), 1).over(seqW))
      .agg(
        sum(col("above")).as("n_above"),
        sum(lit(1L) - col("above")).as("n_below"),
        (sum((col("prev").isNull || col("prev") =!= col("above"))
          .cast("long"))).as("n_runs"))
    val n1 = col("n_above").cast("double")
    val n2 = col("n_below").cast("double")
    val n = n1 + n2
    val mu = lit(2.0) * n1 * n2 / n + lit(1.0)
    val sig = sqrt(lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n)
      / (n * n * (n - lit(1.0))))
    runs.select(
      col("n_above"), col("n_below"), col("n_runs"),
      // sigma > 0 required: at n1 = n2 = 1 the variance is exactly 0 and
      // an unguarded z is 0/0 — NULL like every degenerate statistic here
      when(col("n_above") > 0 && col("n_below") > 0
        && col("n_above") * col("n_below") * 2
           > col("n_above") + col("n_below"),
        r((col("n_runs").cast("double") - mu) / sig, 6))
        .otherwise(lit(null).cast("double")).as("z"))
  }

  private val f09Sql = {
    val n1 = "CAST(n_above AS DOUBLE)"
    val n2 = "CAST(n_below AS DOUBLE)"
    val n = s"($n1 + $n2)"
    val mu = s"(2.0 * $n1 * $n2 / $n + 1.0)"
    val sig = s"sqrt(2.0 * $n1 * $n2 * (2.0 * $n1 * $n2 - $n) " +
      s"/ ($n * $n * ($n - 1.0)))"
    s"""WITH daily AS (
       |  SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS d,
       |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
       |         AS BIGINT) AS rev
       |  FROM orders GROUP BY 1),
       |hist AS (SELECT rev AS v, CAST(count(*) AS BIGINT) AS c
       |         FROM daily GROUP BY 1),
       |cum AS (
       |  SELECT v,
       |    CAST(sum(c) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum,
       |    CAST(sum(c) OVER () AS BIGINT) AS n
       |  FROM hist),
       |med AS (
       |  SELECT min(CASE WHEN cum >=
       |      CAST(floor((n * 50 + 99) / 100.0) AS BIGINT) THEN v END)
       |    AS median_rev
       |  FROM cum),
       |signed AS (
       |  SELECT d, CASE WHEN rev > median_rev THEN 1 ELSE 0 END AS above
       |  FROM daily CROSS JOIN med
       |  WHERE rev <> median_rev),
       |runs AS (
       |  SELECT
       |    CAST(sum(above) AS BIGINT) AS n_above,
       |    CAST(sum(1 - above) AS BIGINT) AS n_below,
       |    CAST(sum(CASE WHEN prev IS NULL OR prev <> above
       |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
       |  FROM (SELECT above, lag(above, 1) OVER (ORDER BY d) AS prev
       |        FROM signed))
       |SELECT n_above, n_below, n_runs,
       |  CASE WHEN n_above > 0 AND n_below > 0
       |            AND n_above * n_below * 2 > n_above + n_below
       |  THEN ${Det.sqlR(s"(CAST(n_runs AS DOUBLE) - $mu) / $sig", 6)}
       |  ELSE CAST(NULL AS DOUBLE) END AS z
       |FROM runs""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f09_runs_test" -> (f09RunsTest _),
    "f10_binned_ks" -> (f10BinnedKs _),
    "f08_two_proportion" -> (f08TwoProportion _),
    "f07_mann_whitney" -> (f07MannWhitney _),
    "f01_tvd_drift" -> (f01TvdDrift _),
    "f02_ks_drift" -> (f02KsDrift _),
    "f03_benford" -> (f03Benford _),
    "f04_mcnemar" -> (f04Mcnemar _),
    "f05_cusum_changepoint" -> (f05CusumChangepoint _),
    "f06_chi2_drift" -> (f06Chi2Drift _))

  val oracles: Map[String, String] = Map(
    "f09_runs_test" -> f09Sql,
    "f10_binned_ks" -> f10Sql,
    "f08_two_proportion" -> f08Sql,
    "f07_mann_whitney" -> f07Sql,
    "f01_tvd_drift" -> f01Sql,
    "f02_ks_drift" -> f02Sql,
    "f03_benford" -> f03Sql,
    "f04_mcnemar" -> f04Sql,
    "f05_cusum_changepoint" -> f05Sql,
    "f06_chi2_drift" -> f06Sql)
}
