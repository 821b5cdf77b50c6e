package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.Det

/** g32/g32b/g33 — deterministic hash walks checked against an INDEPENDENT
  * driver-side simulation (plain adjacency map + the same hop hash — no
  * Spark, no SQL), plus the walk-table invariants and the skip-gram
  * extraction's consistency with the walks it reads.
  */
class WalksSpec extends AnyFunSuite with SparkTestSession {

  /** Reference walk simulation over a directed edge set. */
  private def refWalks(edges: Set[(Long, Long)]): Map[(Long, Int), Long] = {
    val P = Det.KnuthP
    val A = Det.KnuthA
    def h(walk: Long, step: Int, dst: Long): Long =
      ((((walk % P) * A) % P + step) * A + dst % P) % P
    val adj = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    val out = scala.collection.mutable.Map[(Long, Int), Long]()
    for (start <- edges.map(_._1)) {
      var cur = start
      out((start, 0)) = cur
      var k = 1
      var alive = true
      while (alive && k <= Walks.WalkLen) {
        adj.get(cur) match {
          case Some(ns) =>
            cur = ns.minBy(d => (h(start, k, d), d))
            out((start, k)) = cur
            k += 1
          case None => alive = false
        }
      }
    }
    out.toMap
  }

  private def collectWalks(df: org.apache.spark.sql.DataFrame)
      : Map[(Long, Int), Long] =
    df.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap

  test("g32 == independent driver-side walk simulation (sf0.001)") {
    val edges = CoGraph.cappedEdges(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = collectWalks(Walks.g32HashWalks(spark, Sf))
    assert(got.nonEmpty)
    assert(got == refWalks(edges))
  }

  test("g32b == the same simulation over the fan-out relation; every " +
      "hop is an existing edge and every vertex walks") {
    val und = NeighborAgg.fanoutUnd(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val edges = und ++ und.map { case (a, b) => (b, a) }
    val got = collectWalks(Walks.g32bHashWalksFanout(spark, Sf))
    assert(got == refWalks(edges))
    // structural: each hop traverses a real edge
    got.foreach { case ((walk, step), v) =>
      if (step > 0) assert(edges.contains((got((walk, step - 1)), v)),
        s"walk $walk step $step does not traverse an edge")
    }
    // the symmetric relation has no dead ends: every walk is full-length
    val byWalk = got.keys.groupBy(_._1)
    byWalk.values.foreach(ks => assert(ks.size == Walks.WalkLen + 1))
    assert(byWalk.keySet == edges.map(_._1))
  }

  test("g33 pair counts == the definitional fold of the g32b walk table") {
    val walks = collectWalks(Walks.g32bHashWalksFanout(spark, Sf)).toSeq
      .map { case ((w, s), v) => (w, s, v) }
    val want = (for {
      (w1, s1, v1) <- walks
      (w2, s2, v2) <- walks
      if w1 == w2 && s1 != s2 && math.abs(s1 - s2) <= Walks.SkipWindow
    } yield (v1, v2)).groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val got = Walks.g33SkipgramPairs(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want)
  }
}
