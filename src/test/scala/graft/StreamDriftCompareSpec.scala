package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DriftOps
import graft.streaming.DriftStream

/** Stream twin of the f02/f06 two-split drift compare (round-8 verdict
  * item 5): the windowed per-bin contingency stream must equal the batch
  * builder cell-for-cell on finalized windows, the χ² fold over any
  * window must be the exact textbook value, and the watermark must
  * actually evict finalized window state.
  */
class StreamDriftCompareSpec extends AnyFunSuite with SparkTestSession {

  private def t(v: String) = Timestamp.valueOf(v)

  test("windowed two-split contingency: stream == batch cell-for-cell on finalized windows") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val rows = Seq(
      // window 10:00 — bins 0 ($5k), 1 ($15k ×2), 2 ($25k)
      (t("2024-01-01 10:05:00"), 1L, 5000.0),
      (t("2024-01-01 10:15:00"), 2L, 15000.0),
      (t("2024-01-01 10:25:00"), 3L, 15000.0),
      (t("2024-01-01 10:35:00"), 4L, 25000.0),
      // window 11:00 — bins 0 (×2), 4 ($45k)
      (t("2024-01-01 11:05:00"), 5L, 5000.0),
      (t("2024-01-01 11:20:00"), 6L, 5000.0),
      (t("2024-01-01 11:40:00"), 7L, 45000.0))
    val ms = MemoryStream[(Timestamp, Long, Double)]
    ms.addData(rows: _*)
    val q = DriftStream.windowedSplitBins(ms.toDF().toDF("ts", "key", "amount"))
      .writeStream.format("memory").queryName("drift_bins_t")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // watermark pushers: 14:3x − 2 h > 12:00 ends both data windows;
      // the second batch lets the advanced watermark finalize + emit them
      ms.addData((t("2024-01-01 14:30:00"), 99L, 5000.0))
      q.processAllAvailable()
      ms.addData((t("2024-01-01 14:31:00"), 98L, 5000.0))
      q.processAllAvailable()

      def cells(df: org.apache.spark.sql.DataFrame) = df
        .select(col("win.start").cast("string").as("w"), col("bin"),
          col("cnt_ref"), col("cnt_cur"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet

      val got = cells(spark.table("drift_bins_t"))
      // batch twin: the SAME shared builder over the same rows, static
      val batch = cells(DriftOps.splitBins(
        rows.toDF("ts", "key", "amount")
          .select(window(col("ts"), "1 hour").as("win"),
            DriftOps.splitOf(col("key")).as("split"),
            DriftOps.amountBin(col("amount")).as("bin")),
        extraKeys = Seq("win")))
      assert(got.nonEmpty, "no finalized windows emitted")
      assert(got == batch,
        s"stream/batch contingency mismatch:\n stream=$got\n batch=$batch")

      // eviction: the 5 finalized (window, bin) cells left state; only
      // the pushers' unfinalized window-bin may remain
      val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows <= 2,
        s"finalized window state not evicted: $stateRows rows")
    } finally q.stop()
  }

  test("chi2 fold: exact textbook value on a known 2x2 contingency") {
    import spark.implicits._
    // bins {0: (ref 2, cur 1), 1: (ref 1, cur 2)} — classic 2×2 with
    // χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) = 6·9/81 = 2/3, split evenly
    val perBin = Seq((0L, 2L, 1L), (1L, 1L, 2L))
      .toDF("bin", "cnt_ref", "cnt_cur")
    val terms = DriftOps.chi2TermsOn(perBin)
      .select("bin", "chi2_term").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(terms(0L) == 0.33333333 && terms(1L) == 0.33333333,
      s"expected exact 8-dp thirds, got $terms")
  }
}
