package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 centrality family (g27/g27b/g28/g29) — invariants the DuckDB
  * oracle cannot express (the HyperBall error bound) plus definitional
  * anchors that make the oracle-checked forms self-evident.
  */
class Round9bSpec extends AnyFunSuite with SparkTestSession {

  test("g27 exact NF anchors: r=0 is the diagonal, r=1 is the edge count, cum is monotone") {
    val nf = graph.Centrality.g27NeighborhoodFunction(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val edges = graph.CoGraph.cappedEdges(spark, Sf)
    val v = edges.select("src").distinct().count()
    val e = edges.count()
    assert(nf.head == ((0L, v, v)), "radius 0 must be exactly the |V| self-pairs")
    assert(nf(1)._2 == e, "pairs at exactly distance 1 must be the directed edge count")
    assert(nf.map(_._3).sliding(2).forall(w => w(0) <= w(1)), "cumulative pairs must be monotone")
    // every pair count is bounded by |V|^2 — the definitional ceiling
    assert(nf.last._3 <= v * v)
  }

  test("g27b HyperBall tracks exact g27 within 15% per radius (sparse-mode exact at this scale)") {
    val exact = graph.Centrality.g27NeighborhoodFunction(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val est = graph.Centrality.g27bHyperball(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    for ((r, ex) <- exact) {
      val er = math.abs(est(r) - ex).toDouble / ex
      assert(er <= 0.15, s"radius $r: HyperBall $est vs exact $ex — rel err $er > 15%")
    }
    // r=0 anchor: a 1-element HLL estimates exactly 1, so the sum is |V|
    assert(est(0L) == exact(0L))
  }

  test("g28 landmark harmonic invariants: bounds, zero-coupling, deterministic landmark set") {
    val k = graph.Centrality.LandmarkK
    val out = graph.Centrality.g28LandmarkHarmonic(spark, Sf)
    val rows = out.collect()
    val verts = graph.CoGraph.cappedEdges(spark, Sf).select("src").distinct().count()
    assert(rows.length == verts, "one row per endpoint vertex, unreached included")
    for (r <- rows) {
      val (reached, hx6) = (r.getLong(1), r.getLong(2))
      assert(reached >= 0 && reached <= k, "cannot reach more landmarks than exist")
      // harmonic_x6 per landmark is in [2, 6] (d in 1..3) — so the sum is
      // bounded by the reached count on both sides
      assert(hx6 >= 2 * reached && hx6 <= 6 * reached,
        s"harmonic_x6 $hx6 out of [2r, 6r] for reached=$reached")
      assert((reached == 0) == (hx6 == 0L))
      // the float column is exactly the integer divided once
      assert(r.getDouble(3) ==
        BigDecimal(hx6 / 6.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // landmarks are the K smallest vertex ids: each is at distance 0 from
    // itself (excluded) but the SMALLEST id is reachable by any vertex
    // that has any landmark within range — spot-check the ordering is by
    // integer harmonic, not float
    val hx = rows.map(_.getLong(2))
    assert(hx.sliding(2).forall(w => w(0) >= w(1)), "must be sorted by harmonic_x6 desc")
  }

  test("g28 harmonic matches an independent in-memory BFS recompute at sf0.01") {
    // third derivation path: neither Spark's iterative min-merge nor the
    // DuckDB recursive CTE — a plain scala.collection BFS on the collected
    // capped edge list, folded with the same CASE-lcm integer weights
    val edges = graph.CoGraph.cappedEdges(spark, SfMid).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val verts = edges.map(_._1).distinct.sorted
    val landmarks = verts.take(graph.Centrality.LandmarkK)
    val expect = scala.collection.mutable.Map[Long, (Long, Long)]()
      .withDefaultValue((0L, 0L)) // id -> (reached, harmonic_x6)
    for (lm <- landmarks) {
      val dist = scala.collection.mutable.Map(lm -> 0)
      var frontier = Seq(lm)
      for (h <- 1 to graph.Centrality.LandmarkHops) {
        frontier = frontier.flatMap(u => adj.getOrElse(u, Array.empty[Long]))
          .distinct.filterNot(dist.contains)
        frontier.foreach(v => dist(v) = h)
      }
      for ((v, h) <- dist if h > 0) {
        val (rc, hx) = expect(v)
        expect(v) = (rc + 1, hx + (if (h == 1) 6 else if (h == 2) 3 else 2))
      }
    }
    val got = graph.Centrality.g28LandmarkHarmonic(spark, SfMid).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == verts.toSet)
    for (v <- verts)
      assert(got(v) == expect(v), s"vertex $v: engine ${got(v)} vs BFS ${expect(v)}")
  }

  test("g14b == g14 and g29b == g29 where the bucket cap does not bind (sf0.001: max bucket 3)") {
    val lpa = graph.Components.lpaQ(spark, Sf)
    val lpab = graph.Components.g14bLpaCapped(spark, Sf)
    assert(lpab.exceptAll(lpa).isEmpty && lpa.exceptAll(lpab).isEmpty)
    val q29 = graph.Centrality.g29Modularity(spark, Sf)
    val q29b = graph.Centrality.g29bModularityCapped(spark, Sf)
    assert(q29b.exceptAll(q29).isEmpty && q29.exceptAll(q29b).isEmpty)
  }

  test("g29 modularity masses are conserved: sum(degree_sum)=M, internal<=M, Q in [-0.5, 1]") {
    val out = graph.Centrality.g29Modularity(spark, Sf).collect()
    val m = graph.CoGraph.edges(spark, Sf).count()
    assert(out.map(_.getLong(2)).sum == m,
      "community degree masses must partition the directed edge count")
    assert(out.map(_.getLong(1)).sum <= m,
      "internal edges cannot exceed the total")
    val q = out.map(_.getDouble(3)).sum
    assert(q >= -0.5 && q <= 1.0, s"Newman modularity Q=$q outside its range")
    // per-community: internal edges cannot exceed the community's degree
    // mass (every internal edge contributes 1 to some member's degree)
    for (r <- out) assert(r.getLong(1) <= r.getLong(2))
  }

  test("c14 leakage audit: cluster-bucket split leaks ZERO pairs by construction, schemes share the dup-pair universe") {
    val out = operators.Dedup.c14LeakageAudit(spark, SfMid).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.keySet == Set("cluster_bucket", "naive_hash"))
    val (_, dupC, leakC, rateC) = out("cluster_bucket")
    val (_, dupN, leakN, rateN) = out("naive_hash")
    assert(leakC == 0L && rateC == 0.0,
      "a cluster is atomic under the cluster-bucket rule — any crossing is a bug")
    assert(dupC == dupN, "dup-pair universe is split-scheme-independent")
    assert(leakN >= 0L && leakN <= dupN)
    assert(out("cluster_bucket")._1 == out("naive_hash")._1, "cluster census is scheme-independent")
    if (dupN > 0) assert(rateN == BigDecimal(leakN.toDouble / dupN)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("v15 hard negatives: cross-label only, ranked, dominated by the unconstrained v01 top-1") {
    val hn = operators.Similarity.v15HardNegatives(spark, SfMid)
    val rows = hn.collect()
    assert(rows.nonEmpty)
    // labels must differ from the anchor's — recompute each anchor's label
    val labels = Tables.embeddings(spark, SfMid)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (r <- rows)
      assert(labels(r.getLong(2)) != labels(r.getLong(0)),
        s"neighbor ${r.getLong(2)} shares the anchor ${r.getLong(0)}'s label")
    // per anchor: ranks are 1..k, cosine non-increasing in rank
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length))
      val cos = sorted.map(_.getDouble(4))
      assert(cos.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    }
    // the unconstrained v01 top-1 dominates the constrained top-1
    val v1 = operators.Similarity.v01CosineTopk(spark, SfMid)
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    for ((q, g) <- rows.groupBy(_.getLong(0)))
      assert(g.minBy(_.getLong(1)).getDouble(4) <= v1(q) + 1e-9)
  }

  test("g27/g27b agree at sf0.01 too, and the NF saturates at |V|^2 when the graph is one blob") {
    val exact = graph.Centrality.g27NeighborhoodFunction(spark, SfMid).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val est = graph.Centrality.g27bHyperball(spark, SfMid).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((r, ex) <- exact)
      assert(math.abs(est(r) - ex).toDouble / ex <= 0.15, s"radius $r off: ${est(r)} vs $ex")
  }
}
