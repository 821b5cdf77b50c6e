package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 pins. */
class Round15Spec extends AnyFunSuite with SparkTestSession {

  /** The packed support round (one-long triangle sides, r15 §2.3) must
    * produce EXACTLY the struct spelling's (src, dst, support) rows —
    * pinned on a synthetic graph exercising shared edges across many
    * triangles plus boundary ids (0 and 2^31−1, the gated domain's
    * edges), and on the real capped edge set at two SFs.
    */
  test("packed trussSupport == struct trussSupport (synthetic + real)") {
    import spark.implicits._
    val top = (1L << 31) - 1 // largest id the pack gate admits
    // K4 on {0,1,2,top} (every edge in 2 triangles) + a pendant edge and
    // an isolated edge (support 0 — absent from BOTH spellings' output)
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, top), (1L, 2L), (1L, top), (2L, top),
      (2L, 5L), (6L, 7L)).toDF("src", "dst")
    for (hint <- Seq(true, false)) {
      val a = graph.Components.trussSupport(edges, hint = hint,
        packed = true)
      val b = graph.Components.trussSupport(edges, hint = hint,
        packed = false)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"hint=$hint: packed and struct support rows differ")
      assert(a.count() == 6L) // exactly the K4 edges carry support
    }
    Seq(Sf, SfMid).foreach { dir =>
      val und = graft.Cut.cut(graph.CoGraph.cappedEdges(spark, dir)
        .filter(col("src") < col("dst")).select("src", "dst"))
      val a = graph.Components.trussSupport(und, packed = true)
      val b = graph.Components.trussSupport(und, packed = false)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$dir: packed and struct support rows differ")
    }
  }

  /** g27b exactness certificate (VERDICT r14 item 7): g27b has no DuckDB
    * oracle row, so nothing independent checks its estimates — this pin
    * does. (a) The r=0 anchor is EXACT: a 1-element HLL estimates
    * exactly 1, so est_pairs(0) = |V| to the digit. (b) The whole output
    * is MERGE-ORDER-INSENSITIVE at the certification SFs: lgK=12 keeps
    * every ball in the HLL sparse-exact range (HyperBallLgK doc), so
    * re-running under a different partitioning — which permutes the
    * union order — must reproduce every row bit-equal. The r14 broadcast
    * rewrite moved the r=1 estimate 0.003% at sf0.1; this spec fails if
    * any future plan change moves the certification-SF estimates again.
    */
  test("g27b: exact r=0 anchor, merge-order-insensitive estimates") {
    Seq(Sf, SfMid).foreach { dir =>
      val out = graph.Centrality.g27bHyperball(spark, dir).collect()
      val nv = graph.CoGraph.cappedEdges(spark, dir)
        .select("src").distinct().count()
      val r0 = out.find(_.getLong(0) == 0L).get
      assert(r0.getLong(1) == nv,
        s"$dir: r=0 estimate ${r0.getLong(1)} != exact |V| $nv")
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, "7")
      try {
        val out2 = graph.Centrality.g27bHyperball(spark, dir).collect()
        assert(out.toSeq == out2.toSeq,
          s"$dir: estimates moved under a different merge order: " +
            s"${out.toSeq} vs ${out2.toSeq}")
      } finally spark.conf.set(key, prev)
    }
  }

  /** The packed round keeps every plan property PlanSpec pins for the
    * struct spelling: broadcast-hash probes, one explode (no 3-branch
    * union), map-side partial aggregation — and its ac probe joins on
    * the single packed long.
    */
  test("packed support round plan: broadcast, one explode, partial agg") {
    val und = graft.Cut.cut(graph.CoGraph.cappedEdges(spark, Sf)
      .filter(col("src") < col("dst")).select("src", "dst"))
    val p = graph.Components.trussSupport(und, packed = true)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin")
      && !p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("Generate explode"), p.take(2000))
    assert(!p.contains("Union"), p.take(2000))
    assert(p.contains("partial_count"), p.take(2000))
  }
}
