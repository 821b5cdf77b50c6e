package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-10 scale twins (g15b/g17b/g21b/g26b): cap-non-binding
  * bit-equality with their uncapped siblings — the same contract the
  * g06b/g14b/g20b/g29b family certifies — plus the invariants that make
  * the capped forms meaningful in their own right.
  */
class Round10Spec extends AnyFunSuite with SparkTestSession {

  test("g15b == g15 where the bucket cap does not bind (sf0.001: max bucket 3)") {
    val a = graph.Components.kcoreQ(spark, Sf)
    val b = graph.Components.g15bKcoreCapped(spark, Sf)
    assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty)
  }

  test("g17b == g17 where the bucket cap does not bind") {
    val a = graph.Components.fraudCostDistance(spark, Sf)
    val b = graph.Components.g17bCostDistanceCapped(spark, Sf)
    assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty)
  }

  test("g26b == g26 and g21b == g21 where the bucket cap does not bind") {
    val d = graph.CoGraph.g26DegreeDistribution(spark, Sf)
    val db = graph.CoGraph.g26bCappedDegreeDistribution(spark, Sf)
    assert(db.exceptAll(d).isEmpty && d.exceptAll(db).isEmpty)
    val r = graph.NeighborAgg.g21Assortativity(spark, Sf)
    val rb = graph.NeighborAgg.g21bCappedAssortativity(spark, Sf)
    assert(rb.exceptAll(r).isEmpty && r.exceptAll(rb).isEmpty)
  }

  test("g15b k-core invariant holds on the capped graph at sf0.01: every survivor has core_deg >= k") {
    val rows = graph.Components.g15bKcoreCapped(spark, SfMid).collect()
    assert(rows.forall(_.getLong(1) >= graph.Components.KcoreK))
    // the capped core is a subgraph of the uncapped one's vertex set:
    // dropping edges can only peel MORE vertices, never add survivors
    val uncapped = graph.Components.kcoreQ(spark, SfMid).collect()
      .map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).forall(uncapped.contains))
  }

  test("g17b distances dominate g17's at sf0.01: dropping edges cannot shorten a cheapest path") {
    val full = graph.Components.fraudCostDistance(spark, SfMid).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val capped = graph.Components.g17bCostDistanceCapped(spark, SfMid)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // every capped-reachable vertex is fully-reachable, at cost >= full's
    for ((id, c) <- capped) {
      assert(full.contains(id), s"vertex $id reachable only under the cap")
      assert(c >= full(id), s"vertex $id: capped cost $c < uncapped ${full(id)}")
    }
  }
}
