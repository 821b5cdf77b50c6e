package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DriftOps

/** Contracts for the drift/forensic statistics beyond their DuckDB oracles:
  * TVD terms reassemble to the brute-force TVD and stay in [0,1]; the
  * two-level KS prefix-sum equals a brute-force single-sort recompute;
  * Benford frequencies form a probability distribution and the screen
  * fires on this (deliberately non-Benford, uniform-amount) testdata.
  */
class DriftOpsSpec extends AnyFunSuite with SparkTestSession {

  test("f01 TVD terms sum to the brute-force TVD over splits") {
    val rows = DriftOps.f01TvdDrift(spark, SfMid).collect()
    val tvd = rows.map(_.getAs[Double]("tvd_term")).sum
    assert(tvd >= 0.0 && tvd <= 1.0, s"TVD out of range: $tvd")

    // brute force: per-bin |p - q| / 2 from the raw counts
    val nRef = rows.map(_.getAs[Long]("cnt_ref")).sum.toDouble
    val nCur = rows.map(_.getAs[Long]("cnt_cur")).sum.toDouble
    val brute = rows.map { r =>
      math.abs(r.getAs[Long]("cnt_ref") / nRef - r.getAs[Long]("cnt_cur") / nCur)
    }.sum / 2
    assert(math.abs(tvd - brute) < 1e-6, s"terms $tvd vs brute $brute")

    // the deterministic halves of one distribution must be CLOSE (this is
    // the null case) — a large TVD here would mean the split is biased
    assert(tvd < 0.1, s"hash-split halves drifted: $tvd")
  }

  test("f02 two-level KS equals a brute-force single-sort recompute") {
    val out = DriftOps.f02KsDrift(spark, SfMid).collect()(0)
    val ks = out.getAs[Double]("ks_stat")
    val at = out.getAs[Double]("at_amount")

    val vals = Tables.orders(spark, SfMid)
      .filter(col("o_orderstatus").isin("F", "O"))
      .select(col("o_totalprice"), col("o_orderstatus"))
      .collect()
      .map(r => (math.floor(r.getDouble(0) * 100 + 0.5).toLong,
        r.getString(1) == "F"))
    val nA = vals.count(_._2).toDouble
    val nB = vals.count(!_._2).toDouble
    var cumA = 0L; var cumB = 0L
    var best = 0.0; var bestV = Long.MaxValue
    vals.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (v, g) =>
      cumA += g.count(_._2); cumB += g.count(!_._2)
      val d = math.abs(cumA / nA - cumB / nB)
      if (d > best + 1e-12) { best = d; bestV = v }
    }
    assert(math.abs(ks - best) < 1e-6, s"two-level $ks vs brute $best")
    assert(math.abs(at - bestV / 100.0) < 1e-9,
      s"argmax at $at vs brute ${bestV / 100.0}")
    assert(out.getAs[Long]("n_a") == nA.toLong
      && out.getAs[Long]("n_b") == nB.toLong)
  }

  test("f03 Benford frequencies are a distribution and the screen fires") {
    val rows = DriftOps.f03Benford(spark, SfMid).collect()
    assert(rows.length == 9, "one row per leading digit 1..9")
    assert(rows.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    val freqSum = rows.map(_.getAs[Double]("freq")).sum
    assert(math.abs(freqSum - 1.0) < 1e-4, s"freqs sum to $freqSum")
    val expSum = rows.map(_.getAs[Double]("expected")).sum
    assert(math.abs(expSum - 1.0) < 1e-3, s"Benford literals sum to $expSum")
    // uniform amounts over [1k, 500k] are maximally non-Benford: digits
    // 1-4 are inflated by the domain, 5-9 starved of the 6-digit band —
    // total deviation far above any organic ledger's
    val totalDev = rows.map(_.getAs[Double]("abs_dev")).sum
    assert(totalDev > 0.1, s"screen should fire on uniform data: $totalDev")
    // per-row arithmetic: |freq - expected| recomputes (both 6-dp snapped)
    rows.foreach { r =>
      val dev = math.abs(r.getAs[Double]("freq") - r.getAs[Double]("expected"))
      assert(math.abs(dev - r.getAs[Double]("abs_dev")) < 1e-9)
    }
  }

  test("f04 McNemar counts discordant pairs only, statistic recomputes") {
    val out = DriftOps.f04Mcnemar(spark, SfMid).collect()(0)
    val (n, b, c) = (out.getAs[Long]("n"), out.getAs[Long]("b_discordant"),
      out.getAs[Long]("c_discordant"))
    assert(n == Tables.events(spark, SfMid).count())
    assert(b + c <= n && b >= 0 && c >= 0)
    assert(b + c > 0, "rules must actually disagree somewhere on testdata")
    val stat = math.floor(
      (b - c).toDouble * (b - c).toDouble / (b + c).toDouble * 1e6 + 0.5) / 1e6
    assert(out.getAs[Double]("mcnemar_stat") == stat)
  }

  test("f05 CUSUM change-point equals the brute-force argmax") {
    val out = DriftOps.f05CusumChangepoint(spark, SfMid).collect()(0)
    val daily = Tables.events(spark, SfMid)
      .filter(col("event_type") === "error")
      .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("day"))
      .count().collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = daily.length.toLong
    val total = daily.map(_._2).sum
    var cum = 0L
    var best = 0L; var bestDay = Long.MaxValue
    var t = 0L
    daily.foreach { case (day, x) =>
      cum += x; t += 1
      val s = n * cum - t * total
      if (math.abs(s) > math.abs(best)) { best = s; bestDay = day }
    }
    assert(out.getAs[Long]("change_day") == bestDay)
    assert(out.getAs[Long]("s_scaled") == best)
    assert(out.getAs[Long]("n_days") == n)
    assert(out.getAs[Long]("total_errors") == total)
    // a non-constant series has a nonzero interior peak (the final
    // prefix is identically zero by construction, so it never wins)
    assert(bestDay != Long.MaxValue && bestDay != daily.last._1)
  }

  test("f01/f02 plans: broadcast scalar totals, no global-sort cumsum") {
    val p1 = DriftOps.f01TvdDrift(spark, SfMid)
      .queryExecution.executedPlan.toString()
    assert(p1.contains("BroadcastExchange"), "totals must broadcast:\n" +
      p1.linesIterator.take(25).mkString("\n"))
    val p2 = DriftOps.f02KsDrift(spark, SfMid)
      .queryExecution.executedPlan.toString()
    assert(p2.contains("TakeOrderedAndProject"),
      "argmax must be top-1, not a global sort")
  }

  test("f10 binned KS equals the brute-force recompute and is bounded by the exact sup") {
    val row = DriftOps.f10BinnedKs(spark, SfMid).collect()(0)
    val ks = row.getAs[Double]("ks_stat")
    val nRef = row.getAs[Long]("n_ref")
    val nCur = row.getAs[Long]("n_cur")
    // brute force from the raw per-bin counts
    val perBin = DriftOps.f01TvdDrift(spark, SfMid).collect()
      .map(r => (r.getAs[Long]("bin"),
        r.getAs[Long]("cnt_ref"), r.getAs[Long]("cnt_cur")))
      .sortBy(_._1)
    var ca = 0L; var cb = 0L
    var best = 0.0
    perBin.foreach { case (_, a, b) =>
      ca += a; cb += b
      val d = math.abs(ca.toDouble / nRef - cb.toDouble / nCur)
      if (d > best) best = d
    }
    assert(math.abs(ks - best) < 1e-6, s"binned KS $ks vs brute $best")
    assert(ks >= 0.0 && ks <= 1.0)
  }
}
