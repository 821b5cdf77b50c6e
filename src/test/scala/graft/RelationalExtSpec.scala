package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{RelationalExt, Similarity}

/** Extension-surface contracts that oracles can't express: sketch error
  * bounds and ANN recall against the exact baseline.
  */
class RelationalExtSpec extends AnyFunSuite with SparkTestSession {

  test("e07 sketches: HLL within 5% of exact, approx p50 within 5% of exact") {
    val r = RelationalExt.e07ApproxStats(spark, SfMid).head()
    // columns: n_rows, exact_users, users_within_5pct, p50_within_5pct
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    assert(r.getBoolean(2), "HLL distinct outside the 5% envelope")
    assert(r.getBoolean(3), "approx p50 outside the 5% envelope")
  }

  test("v02 ANN achieves measurable recall against the v01 exact baseline") {
    val exact = Similarity.v01CosineTopk(spark, SfMid)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.v02AnnLsh(spark, SfMid)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    // 4 hyperplane bits ≈ 1/16 of the corpus per bucket; near neighbors
    // collide far more often than random — require a real signal, and
    // record the number so regressions in the bucketing show up.
    assert(recall >= 0.35, s"ANN recall@5 $recall below floor")
    info(s"ANN recall@5 vs exact top-5: $recall")
  }

  test("v04 IVF ANN achieves measurable recall against the v01 exact baseline") {
    val exact = Similarity.v01CosineTopk(spark, SfMid)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.v04AnnIvf(spark, SfMid)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    // probing 3 of the label cells: near neighbors concentrate in the
    // query's own top cells, so recall must clear a real floor; record the
    // number so quantizer regressions show up
    assert(recall >= 0.35, s"IVF recall@5 $recall below floor")
    info(s"IVF recall@5 vs exact top-5: $recall")
  }

  test("v05 PQ ADC achieves measurable recall against the exact L2 baseline") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // PQ quantizes L2 distance, so its fair baseline is the exact L2 top-5
    // (v01 ranks by cosine — a different metric on unnormalized vectors)
    val e = Tables.embeddings(spark, SfMid)
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val d2 = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      graft.functions.VectorFunctions.vecDot(a, a) +
        graft.functions.VectorFunctions.vecDot(b, b) -
        lit(2.0) * graft.functions.VectorFunctions.vecDot(a, b)
    val exact = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        d2(col("qe"), col("embedding")).as("dist"))
      .withColumn("rk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("dist"), col("vec_id"))))
      .filter(col("rk") <= 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.v05AnnPq(spark, SfMid)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.35, s"PQ recall@5 $recall below floor")
    info(s"PQ recall@5 vs exact L2 top-5: $recall")
  }

  test("v07 IVF-PQ recall tracks its building blocks and candidates stay in probed cells") {
    import org.apache.spark.sql.expressions.Window
    // fair baseline = exact L2 (same metric as the PQ ADC ranking)
    val e = Tables.embeddings(spark, SfMid)
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val d2 = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      graft.functions.VectorFunctions.vecDot(a, a) +
        graft.functions.VectorFunctions.vecDot(b, b) -
        lit(2.0) * graft.functions.VectorFunctions.vecDot(a, b)
    val exact = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        d2(col("qe"), col("embedding")).as("dist"))
      .withColumn("rk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("dist"), col("vec_id"))))
      .filter(col("rk") <= 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = Similarity.v07AnnIvfPq(spark, SfMid)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivfpq).size.toDouble / exact.size
    // composed index: cell pruning can only REMOVE candidates relative to
    // v05's corpus-wide ADC, so the floor sits below the PQ floor; record
    // the number so either component's regression shows up
    assert(recall >= 0.25, s"IVF-PQ recall@5 $recall below floor")
    info(s"IVF-PQ recall@5 vs exact L2 top-5: $recall")
    assert(ivfpq.nonEmpty && ivfpq.size <= 50)
  }

  test("v09 int8 scalar quantization keeps high recall vs exact L2") {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, SfMid)
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val d2 = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      graft.functions.VectorFunctions.vecDot(a, a) +
        graft.functions.VectorFunctions.vecDot(b, b) -
        lit(2.0) * graft.functions.VectorFunctions.vecDot(a, b)
    val exact = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        d2(col("qe"), col("embedding")).as("dist"))
      .withColumn("rk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("dist"), col("vec_id"))))
      .filter(col("rk") <= 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = Similarity.v09AnnSq(spark, SfMid)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & sq).size.toDouble / exact.size
    // a 256-level grid loses far less than PQ's 64-codeword subspaces:
    // the recall floor sits well above the coarser quantizers'
    assert(recall >= 0.7, s"int8 SQ recall@5 $recall below floor")
    info(s"int8 SQ recall@5 vs exact L2 top-5: $recall")
  }

  test("e14 hash folds partition completely and stay balanced") {
    val rows = RelationalExt.e14CvFolds(spark, SfMid).collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables.orders(spark, SfMid).count(),
      "every order lands in exactly one (fold, class) cell")
    val byFold = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(byFold.size == 5)
    val mean = total.toDouble / 5
    byFold.values.foreach(n =>
      assert(math.abs(n - mean) / mean < 0.1,
        s"fold imbalance: $n vs mean $mean"))
  }

  test("e09 unioned daily sketches estimate the period distinct within 5%") {
    val exact = Tables.events(spark, SfMid)
      .select("user_id").distinct().count()
    val r = RelationalExt.e09SketchUnion(spark, SfMid).head()
    // columns: n_days, sum_daily_users, exact_period_users, union_within_5pct
    assert(r.getLong(2) == exact, "exact column must match a direct distinct")
    assert(r.getBoolean(3), "sketch-union estimate outside the 5% envelope")
    // the union must beat naive summing of daily distincts (which
    // double-counts users active on multiple days)
    assert(r.getLong(1) > exact, "testdata must have multi-day users")
  }

  test("e10 merged daily histograms equal the direct global histogram (lossless rollup)") {
    import org.apache.spark.sql.functions._
    // the re-aggregation claim: summing per-day (bin, cnt) sketches must
    // reproduce exactly the histogram a single global pass would build
    val direct = Tables.events(spark, SfMid)
      .select(floor(col("value") / 2.0).cast("long").as("bin"))
      .groupBy("bin").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDaily = Tables.events(spark, SfMid)
      .withColumn("d", date_trunc("day", col("ts")))
      .select(col("d"), floor(col("value") / 2.0).cast("long").as("bin"))
      .groupBy("d", "bin").count().collect()
      .groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(viaDaily == direct, "daily-sketch merge must be lossless")
    val r = RelationalExt.e10QuantileRollup(spark, SfMid).head()
    assert(r.getBoolean(5), "histogram p50 must land within one bin width of exact")
    assert(r.getDouble(2) <= r.getDouble(3) && r.getDouble(3) <= r.getDouble(4),
      "quantiles must be monotone: p50 <= p90 <= p99")
  }

  test("e18 exact percentiles are monotone actual data values") {
    import org.apache.spark.sql.functions.col
    val rows = RelationalExt.e18ExactPercentiles(spark, SfMid).collect()
    assert(rows.nonEmpty)
    val byPriority = Tables.orders(spark, SfMid)
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    rows.foreach { r =>
      val (pr, n) = (r.getString(0), r.getLong(1))
      val (p50, p90, p99) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val vs = byPriority(pr)
      assert(n == vs.length, s"$pr group size")
      assert(p50 <= p90 && p90 <= p99, s"$pr quantiles not monotone")
      // type-1 quantile = the ⌈p·n⌉-th smallest actual value, bit-exact
      def want(k: Int) = vs(((n * k + 99) / 100 - 1).toInt)
      assert(p50 == want(50) && p90 == want(90) && p99 == want(99),
        s"$pr: ($p50,$p90,$p99) != (${want(50)},${want(90)},${want(99)})")
    }
  }

  test("e05 hash sample is reproducible and ~10% sized") {
    val n = Tables.lineitem(spark, SfMid).count()
    val s1 = RelationalExt.e05HashSample(spark, SfMid)
      .agg(sum("sampled_rows")).head.getLong(0)
    val s2 = RelationalExt.e05HashSample(spark, SfMid)
      .agg(sum("sampled_rows")).head.getLong(0)
    assert(s1 == s2, "deterministic sample must be identical run-to-run")
    val frac = s1.toDouble / n
    assert(frac > 0.05 && frac < 0.15, s"sample fraction $frac")
  }
}
