package graft.graph

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Round-11 betweenness family (g31/g31b): the engine's distributed
  * hop-bounded Brandes checked against an INDEPENDENT driver-side
  * implementation (plain adjacency-map BFS + dependency accumulation —
  * no Spark, no SQL), plus the family's cap-non-binding equality
  * discipline and the ktruss k>=3 guard from ADVICE r10.
  */
class Round11Spec extends AnyFunSuite with SparkTestSession {

  /** Reference hop-bounded Brandes from the K smallest vertex ids over a
    * symmetric directed edge set: returns (betweenness, paths) maps.
    * Mirrors the SEMANTICS (level-synchronous BFS, σ path counts,
    * backward δ accumulation truncated at the horizon), not the engine's
    * spelling — double sums here are plain, so compares are tolerance-
    * based for δ and exact for the integer σ sums.
    */
  private def refBrandes(edges: Set[(Long, Long)], k: Int, hops: Int)
      : (Map[Long, Double], Map[Long, Long]) = {
    val adj = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    val landmarks = edges.map(_._1).toSeq.sorted.take(k)
    val bc = mutable.Map[Long, Double]().withDefaultValue(0.0)
    val paths = mutable.Map[Long, Long]().withDefaultValue(0L)
    for (s <- landmarks) {
      val dist = mutable.Map[Long, Int](s -> 0)
      val sigma = mutable.Map[Long, Long](s -> 1L).withDefaultValue(0L)
      var frontier = Seq(s)
      for (d <- 1 to hops) {
        val nxt = mutable.Map[Long, Long]().withDefaultValue(0L)
        for (u <- frontier; v <- adj.getOrElse(u, Set.empty))
          if (!dist.contains(v)) nxt(v) += sigma(u)
        nxt.foreach { case (v, sg) =>
          dist(v) = d; sigma(v) = sg; paths(v) += sg
        }
        frontier = nxt.keys.toSeq
      }
      val delta = mutable.Map[Long, Double]().withDefaultValue(0.0)
      for (d <- (hops - 1) to 1 by -1)
        for ((v, dv) <- dist if dv == d) {
          var acc = 0.0
          for (w <- adj.getOrElse(v, Set.empty) if dist.get(w).contains(d + 1))
            acc += sigma(v).toDouble / sigma(w).toDouble * (1.0 + delta(w))
          delta(v) = acc
          bc(v) += acc
        }
    }
    (bc.toMap.withDefaultValue(0.0), paths.toMap.withDefaultValue(0L))
  }

  private def checkAgainstRef(out: Array[org.apache.spark.sql.Row],
      edges: Set[(Long, Long)]): Unit = {
    val (bc, paths) = refBrandes(edges, Centrality.LandmarkK,
      Centrality.LandmarkHops)
    assert(out.nonEmpty)
    assert(out.map(_.getLong(0)).toSet == edges.map(_._1))
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == paths(id), s"sigma mismatch at $id")
      assert(math.abs(r.getDouble(2) - bc(id)) < 1e-6,
        s"betweenness mismatch at $id: ${r.getDouble(2)} vs ${bc(id)}")
      assert(r.getDouble(2) >= 0.0)
    }
  }

  test("g31 matches an independent driver-side Brandes at sf0.001 and sf0.01") {
    for (dir <- Seq(Sf, SfMid)) {
      val edges = CoGraph.cappedEdges(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      checkAgainstRef(
        Centrality.g31LandmarkBetweenness(spark, dir).collect(), edges)
    }
  }

  test("g31b matches the reference over the symmetrized fan-out relation at sf0.01") {
    val und = NeighborAgg.fanoutUnd(spark, SfMid).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = (und ++ und.map { case (a, b) => (b, a) }).toSet
    checkAgainstRef(
      Centrality.g31bBetweennessFanout(spark, SfMid).collect(), edges)
  }

  test("g31b == g31 where no cap binds (sf0.001: max bucket 3 < FanOut)") {
    val a = Centrality.g31LandmarkBetweenness(spark, Sf)
    val b = Centrality.g31bBetweennessFanout(spark, Sf)
    assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty)
  }

  test("ktruss rejects k < 3 (the support join cannot express a 2-truss)") {
    val e = intercept[IllegalArgumentException] {
      Components.ktruss(spark, Sf, k = 2)
    }
    assert(e.getMessage.contains("k >= 3"))
  }
}
