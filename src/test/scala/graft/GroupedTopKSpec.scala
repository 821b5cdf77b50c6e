package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.GroupedTopK

/** Contracts for the native per-key top-k operator beyond its w13 oracle:
  * in-engine equality with the definitional row_number spelling, the
  * partial→exchange→final plan shape with NO sort, and the edge semantics
  * (small groups, NULL values, tie-breaking) on planted frames.
  */
class GroupedTopKSpec extends AnyFunSuite with SparkTestSession {

  private def base = Tables.orders(spark, SfMid)
    .select(col("o_orderpriority").as("priority"),
      col("o_orderkey"), col("o_totalprice"))

  test("operator output equals the row_number window spelling") {
    import org.apache.spark.sql.expressions.Window
    val ours = GroupedTopK(base, Seq("priority"), "o_totalprice",
      "o_orderkey", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy("priority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val ref = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ours == ref,
      s"missing=${(ref -- ours).take(5)} extra=${(ours -- ref).take(5)}")
  }

  test("plan: partial and final heap passes around ONE exchange, no sort") {
    // (nodeName renders GroupedTopKExec as "GroupedTopK ")
    val p = GroupedTopK(base, Seq("priority"), "o_totalprice",
      "o_orderkey", 3).queryExecution.executedPlan.toString()
    assert("GroupedTopK \\[".r.findAllIn(p).size == 2,
      s"expected partial+final pair:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"exactly one exchange:\n$p")
    assert(!p.contains("Sort "),
      s"bounded heaps must replace the sort:\n$p")
    // partitioning survives the operator: a downstream same-key aggregate
    // reuses the exchange instead of shuffling again
    val downstream = GroupedTopK(base, Seq("priority"), "o_totalprice",
      "o_orderkey", 3).groupBy("priority").count()
      .queryExecution.executedPlan.toString()
    assert("Exchange hashpartitioning".r.findAllIn(downstream).size == 1,
      s"same-key groupBy must not re-shuffle:\n$downstream")
  }

  test("small groups return all rows; NULLs excluded; ties break low-key") {
    import spark.implicits._
    val tiny = Seq(
      ("a", 1L, 5.0), ("a", 2L, 7.0), // |a| = 2 < k
      ("b", 10L, 9.0), ("b", 11L, 9.0), ("b", 12L, 9.0), ("b", 13L, 9.0),
      ("c", 20L, 1.0)
    ).toDF("g", "tie", "v")
      .unionByName(Seq(("c", 21L)).toDF("g", "tie")
        .withColumn("v", lit(null).cast("double")),
        allowMissingColumns = false)
    val out = GroupedTopK(tiny, Seq("g"), "v", "tie", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("a", 1L), ("a", 2L), // whole small group survives
      ("b", 10L), ("b", 11L), ("b", 12L),   // 4-way tie: 3 lowest keys
      ("c", 20L)))                          // null row gone
  }

  test("partial pass bounds the shuffle: records written ≤ k·partitions") {
    // 1000 rows, ONE hot group, k=3, 8 input partitions: the map-side
    // heap must shrink each partition's contribution to ≤ k rows before
    // the exchange — read back from the exchange's own write metrics
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "false") // bare exchange
    try {
      val big = (1L to 1000L).map(i => ("hot", i, i.toDouble))
        .toDF("g", "tie", "v").repartition(8)
      val df = GroupedTopK(big, Seq("g"), "v", "tie", 3)
      val out = df.collect()
      assert(out.map(_.getLong(1)).sorted.toSeq == Seq(998L, 999L, 1000L))
      val written = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.flatMap(_.metrics.collect {
        case (name, m) if name.toLowerCase.contains("records") => m.value
      })
      assert(written.nonEmpty, "exchange write metrics must be visible")
      assert(written.head <= 3L * 8,
        s"shuffle carried ${written.head} rows; partial heap must cap at 24")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("rewrite rule swaps user-written row_number SQL for the operator") {
    val df = GroupedTopK.w14TopkRewrite(spark, SfMid)
    val p = df.queryExecution.executedPlan.toString()
    assert("GroupedTopK \\[".r.findAllIn(p).size == 2,
      s"rewrite must fire (partial+final heaps in the plan):\n$p")
    assert(!p.contains("Window ") && !p.contains("RunningWindowFunction"),
      s"no window operator may remain:\n$p")
    // and the rewritten plan computes the right answer (w14's oracle
    // re-proves this against DuckDB at the gate; here, in-engine)
    assert(df.collect().length == 15)
  }

  test("rewrite refuses unsafe shapes: rank() and tied sorts stay windows") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.GraftBridge
    GraftBridge.addOptimization(spark, graft.plans.TopKRewriteRule)
    val w = Window.partitionBy("priority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    // rank() over-returns on boundary ties -> must NOT be rewritten
    val ranked = base.withColumn("rn", rank().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(!ranked.queryExecution.optimizedPlan.toString()
      .contains("GroupedTopK"), "rank() must not rewrite")
    // sort without the unique long tie-break -> no total order -> no match
    val noTie = base.withColumn("rn", row_number().over(
      Window.partitionBy("priority").orderBy(col("o_totalprice").desc)))
      .filter(col("rn") <= 3).drop("rn")
    assert(!noTie.queryExecution.optimizedPlan.toString()
      .contains("GroupedTopK"), "tieless sort must not rewrite")
    // the rank column surviving into the projection -> no match
    val keepsRn = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    assert(!keepsRn.queryExecution.optimizedPlan.toString()
      .contains("GroupedTopK"), "projected rank column must not rewrite")
    // global top-k (empty PARTITION BY) -> ClusteredDistribution(Nil)
    // would crash planning; must stay a window (and still run)
    val global = base.withColumn("rn", row_number().over(
      Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") <= 3).drop("rn")
    assert(!global.queryExecution.optimizedPlan.toString()
      .contains("GroupedTopK"), "global top-k must not rewrite")
    assert(global.collect().length == 3)
    // nullable value without an IsNotNull proof: the operator drops NULL
    // rows where row_number ranks them last -> must not rewrite (base's
    // parquet columns are nullable and carry no constraint here)
    val nullable = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(!nullable.queryExecution.optimizedPlan.toString()
      .contains("GroupedTopK"), "unproven-nullable value must not rewrite")
  }

  test("ascending mode: bottom-k equals the ASC window spelling") {
    import org.apache.spark.sql.expressions.Window
    val ours = GroupedTopK(base, Seq("priority"), "o_totalprice",
      "o_orderkey", 3, descending = false)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy("priority")
      .orderBy(col("o_totalprice").asc, col("o_orderkey"))
    val ref = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ours == ref)
    // and the ASC user spelling rewrites too (with the not-null proof)
    import org.apache.spark.sql.GraftBridge
    GraftBridge.addOptimization(spark, graft.plans.TopKRewriteRule)
    val ascSql = base
      .filter(col("o_totalprice").isNotNull && col("o_orderkey").isNotNull)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .drop("rn")
    assert(ascSql.queryExecution.optimizedPlan.toString()
      .contains("GroupedTopK"), "ASC spelling must rewrite")
    assert(ascSql.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      == ref)
  }

  test("heap order matches Spark's double total order on NaN and -0.0") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // Spark sorts doubles by java.lang.Double.compare: NaN above +Inf,
    // -0.0 below 0.0 — primitive comparisons would mis-rank both
    val tricky = Seq(
      ("a", 1L, Double.NaN), ("a", 2L, Double.PositiveInfinity),
      ("a", 3L, 5.0), ("a", 4L, 0.0), ("a", 5L, -0.0),
      ("a", 6L, Double.NegativeInfinity), ("a", 7L, Double.NaN)
    ).toDF("g", "tie", "v")
    for (desc <- Seq(true, false)) {
      val ours = GroupedTopK(tricky, Seq("g"), "v", "tie", 4, desc)
        .collect().map(_.getLong(1)).toSet
      val o = if (desc) col("v").desc else col("v").asc
      val w = Window.partitionBy("g").orderBy(o, col("tie"))
      val ref = tricky.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 4).collect().map(_.getLong(1)).toSet
      assert(ours == ref, s"desc=$desc: $ours vs window $ref")
    }
  }

  test("empty input and all-NULL values produce an empty result, no error") {
    import spark.implicits._
    val empty = Seq.empty[(String, Long, Double)].toDF("g", "tie", "v")
    assert(GroupedTopK(empty, Seq("g"), "v", "tie", 3).collect().isEmpty)
    val allNull = Seq(("a", 1L), ("a", 2L)).toDF("g", "tie")
      .withColumn("v", lit(null).cast("double"))
    assert(GroupedTopK(allNull, Seq("g"), "v", "tie", 3).collect().isEmpty)
  }

  test("top-k is associative: chunked partials re-reduce to the global") {
    // the algebraic fact the partial/final split relies on, pinned as a
    // pure property: top-k(concat(top-k(chunks))) == top-k(all)
    val rows = (1 to 500).map(i => (i * 37 % 101, i.toLong))
    def topk(xs: Seq[(Int, Long)]) =
      xs.sortBy { case (v, t) => (-v, t) }.take(7)
    val global = topk(rows)
    val chunked = topk(rows.grouped(50).flatMap(c => topk(c.toSeq)).toSeq)
    assert(chunked == global)
  }
}
