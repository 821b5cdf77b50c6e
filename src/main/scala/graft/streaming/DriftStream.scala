package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.DriftOps

/** Streaming twin of the drift-monitoring family: the live side of
  * f01's reference-vs-current comparison. The batch job freezes a
  * reference histogram of the training snapshot; this stream maintains
  * the CURRENT histogram over the live amount feed as a plain streaming
  * aggregate — the monitor then reads both tables and computes the same
  * cross-multiplied TVD terms f01 does.
  *
  * The design point (same argument as the streaming count-min sketch):
  * the histogram IS an ordinary streaming `groupBy(bin).count()` whose
  * state is bounded by the BIN COUNT (~50 rows) FOREVER — no watermark,
  * no timeout, no custom state store — because [[DriftOps.amountBin]]'s
  * fixed edges bound the key domain, not the data. Mergeable with any
  * batch histogram built from the same edges (cell-wise; the spec pins
  * stream ≡ batch equality on identical input).
  *
  * Scale: per micro-batch this shuffles ≤ |bins| partial rows after
  * map-side combine; the complete-mode sink rewrites ≤ |bins| rows.
  */
object DriftStream {

  /** Live histogram over an `amount` column (complete-mode friendly). */
  def amountBins(amounts: DataFrame): DataFrame =
    amounts
      .select(DriftOps.amountBin(col("amount")).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("cnt"))

  /** Windowed two-split per-bin contingency over a live (ts, key, amount)
    * feed — the stream side of f06's χ² homogeneity compare (and f01's
    * TVD): tumbling event-time windows, watermark-finalized, one output
    * row per (window, bin) carrying cnt_ref/cnt_cur. ALL three
    * ingredients are the batch family's own definitions — bins via
    * [[DriftOps.amountBin]], the ref/cur split via [[DriftOps.splitOf]],
    * the aggregate via [[DriftOps.splitBins]] — so the monitor folding
    * any finished window through [[DriftOps.chi2TermsOn]] runs the
    * IDENTICAL arithmetic batch f06 runs over the same rows: a streaming
    * drift alert and its batch backfill can never disagree
    * (StreamDriftCompareSpec pins the cell equality).
    *
    * State story: the windowed aggregate's state is |bins| × live
    * windows — the fixed bin edges bound the key domain per window, and
    * the watermark evicts finalized windows, so the query runs forever on
    * bounded memory at ANY event rate. Per micro-batch the shuffle is
    * ≤ that many partial rows after map-side combine.
    */
  def windowedSplitBins(rows: DataFrame, windowDur: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    DriftOps.splitBins(
      rows.withWatermark("ts", watermark)
        .select(
          window(col("ts"), windowDur).as("win"),
          DriftOps.splitOf(col("key")).as("split"),
          DriftOps.amountBin(col("amount")).as("bin")),
      extraKeys = Seq("win"))

  /** Streaming side of the f08 two-proportion canary: running conversion
    * counts per hash split over the live event feed — 2-row complete-mode
    * state forever, same argument as [[amountBins]]. The monitor reads the
    * sink table and folds it through [[DriftOps.twoProportionRow]] — the
    * IDENTICAL arithmetic the batch test runs, so a canary alert from the
    * stream and a backfill recomputation can never disagree
    * (StreamStatefulSpec pins stream ≡ batch on the same events).
    */
  def conversionSplits(events: DataFrame): DataFrame =
    DriftOps.conversionSplits(events)
}
