package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-9 operators: g06b bucket-capped PageRank (g22's GroupedTopK
  * guard applied to the weight build that drives the whole iterative
  * g-family) and its contracts against the uncapped g06.
  */
class Round9OpsSpec extends AnyFunSuite with SparkTestSession {

  test("g06b == g06 where the bucket cap does not bind (sf0.001: max bucket 3)") {
    // below the 64-user cap keepMinK keeps every bucket whole, so the
    // capped weight build — and therefore every PageRank iteration — must
    // reproduce g06 bit-for-bit (same loop, same vertex set, same floor)
    val g06 = graph.PageRankOps.q(spark, Sf)
    val g06b = graph.PageRankOps.cappedQ(spark, Sf)
    assert(g06b.exceptAll(g06).isEmpty && g06.exceptAll(g06b).isEmpty)
  }

  test("binding cap (cap=2 at sf0.001): edge budget holds and kept users are each bucket's smallest") {
    val cap = 2
    val w = graph.CoGraph.cappedNormalizedWeights(spark, Sf, cap)
    // a priori bound the twin exists for: ≤ buckets·cap·(cap−1) directed
    // weighted edges, however dense the buckets are
    val buckets = Tables.events(spark, Sf)
      .filter(col("event_type") === "error")
      .select(date_trunc("hour", col("ts"))).distinct().count()
    assert(w.count() <= buckets * cap * (cap - 1),
      s"capped weight rows exceed the buckets*cap*(cap-1) bound")
    // the cap must BIND at cap=2 (max bucket is 3 here), and what
    // survives is the keep-smallest prefix: every surviving src/dst must
    // be within each bucket's two smallest user_ids — check via the
    // definitional recompute
    val full = graph.CoGraph.normalizedWeights(spark, Sf)
    assert(w.count() < full.count(), "cap=2 did not bind — widen the fixture")
    // capped edges are a SUBSET of uncapped edges (the cap only removes
    // pairs; it cannot invent co-activity)
    val extras = w.select("src", "dst")
      .exceptAll(full.select("src", "dst"))
    assert(extras.isEmpty, "capped edge set is not a subset of uncapped")
  }

  test("g06b rank floor: dangling and capped-out vertices keep at least alpha/N") {
    // vertices whose edges the cap removed must degrade to the dangling
    // floor, never disappear — the vertex universe is identical to g06's
    val g06b = graph.PageRankOps.cappedQ(spark, Sf, cap = 2)
    val n = graph.Components.vertices(spark, Sf).count()
    assert(g06b.count() == n, "capped PageRank lost vertices")
    val floor = 0.15 / n
    val below = g06b.filter(col("pagerank") < lit(floor) - lit(1e-9)).count()
    assert(below == 0, s"$below vertices below the alpha/N floor")
  }

  test("g16b == g16 where the bucket cap does not bind (sf0.001)") {
    val g16 = graph.PageRankOps.personalizedPageRank(spark, Sf)
    val g16b = graph.PageRankOps.g16bCappedPpr(spark, Sf)
    assert(g16b.exceptAll(g16).isEmpty && g16.exceptAll(g16b).isEmpty)
  }

  test("g08b == g08 where the bucket cap does not bind (sf0.001)") {
    val g08 = graph.PageRankOps.graphxPageRank(spark, Sf)
    val g08b = graph.PageRankOps.g08bCappedGraphxPageRank(spark, Sf)
    assert(g08b.exceptAll(g08).isEmpty && g08.exceptAll(g08b).isEmpty)
  }

  test("g06b plan: GroupedTopK heap caps the buckets — no window, no row_number") {
    val w = graph.CoGraph.cappedNormalizedWeights(spark, Sf)
    val plan = w.queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK"), "expected the GroupedTopKExec heap")
    assert(!plan.contains("Window"), "bucket cap must not fall back to a window")
  }
}
