package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{CoGraph, Components, FacadeQueries, GraphFrame}

/** GraphFrames-shaped façade (graph/GraphFrame.scala): API-shape parity
  * with GraphFrames call-sites (`4_graphx.ipynb:334-373`), result parity
  * with the oracle-checked g* operators, plus hand-graph goldens for the
  * surfaces the gate queries don't reach (bfs, shortestPaths, SCC, LPA,
  * pageRank builder).
  */
class GraphFrameSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  // tiny directed graph: two triangles sharing vertex 3, plus a tail and
  // an isolated vertex; ids deliberately non-contiguous
  private lazy val v = Seq(1L, 2L, 3L, 5L, 8L, 13L, 21L).toDF("id")
  private lazy val e = Seq(
    (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L), // triangle 1-2-3
    (3L, 5L), (5L, 3L), (5L, 8L), (8L, 5L), (3L, 8L), (8L, 3L), // triangle 3-5-8
    (8L, 13L), (13L, 8L) // tail; 21 isolated
  ).toDF("src", "dst")

  private lazy val gf = GraphFrame(v, e)

  test("degrees / inDegrees / outDegrees on the hand graph") {
    val d = gf.degrees.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d === Map(1L -> 4, 2L -> 4, 3L -> 8, 5L -> 4, 8L -> 6, 13L -> 2))
    val ind = gf.inDegrees.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ind(3L) === 4 && ind(13L) === 1)
    assert(!d.contains(21L), "zero-degree vertices omitted (GraphFrames semantics)")
    val outd = gf.outDegrees.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(outd === ind, "symmetric edge set: in == out")
  }

  test("triplets joins vertex attributes onto both endpoints") {
    val t = gf.triplets
    assert(t.columns.toSeq === Seq("src", "edge", "dst"))
    assert(t.count() === 14)
    val one = t.filter(col("edge.src") === 13L).select(col("src.id"), col("dst.id"))
      .as[(Long, Long)].collect().toSeq
    assert(one === Seq((13L, 8L)))
  }

  test("connectedComponents labels with min member id, isolated kept") {
    val cc = gf.connectedComponents.run()
      .select(col("id"), col("component")).as[(Long, Long)]
      .collect().toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 8L -> 1L,
      13L -> 1L, 21L -> 21L))
  }

  test("stronglyConnectedComponents on a directed cycle vs a chain") {
    val dv = Seq(1L, 2L, 3L, 4L).toDF("id")
    val de = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val scc = GraphFrame(dv, de).stronglyConnectedComponents.maxIter(10).run()
      .select(col("id"), col("component")).as[(Long, Long)].collect().toMap
    assert(scc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  test("triangleCount matches the hand-counted triangles") {
    val tc = gf.triangleCount.run()
      .select(col("id"), col("count")).as[(Long, Long)].collect().toMap
    assert(tc === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 5L -> 1L, 8L -> 1L,
      13L -> 0L, 21L -> 0L))
  }

  test("pageRank builder: mass conserved, hub ranks highest, edges weighted") {
    val ranked = gf.pageRank.resetProbability(0.15).maxIter(20).run()
    val pr = ranked.vertices.select(col("id"), col("pagerank"))
      .as[(Long, Double)].collect().toMap
    // staticPageRank normalizes to sum == |V|
    assert(math.abs(pr.values.sum - 7.0) < 1e-6)
    assert(pr(3L) === pr.values.max, "degree-8 hub has top rank")
    val w = ranked.edges.filter(col("src") === 3L).select(col("weight"))
      .as[Double].collect()
    assert(w.length === 4 && w.forall(x => math.abs(x - 0.25) < 1e-12),
      "edge weights normalized by out-degree")
  }

  test("personalized pageRank concentrates mass near the source") {
    val pr = gf.pageRank.maxIter(20).sourceId(13L).run()
      .vertices.select(col("id"), col("pagerank")).as[(Long, Double)]
      .collect().toMap
    assert(pr(13L) > pr(1L), "source outranks the far side of the graph")
    assert(pr(21L) === 0.0, "unreachable vertex gets zero personalized mass")
  }

  test("labelPropagation converges to one label per dense community") {
    val lpa = gf.labelPropagation.maxIter(10).run()
    assert(lpa.columns.contains("label"))
    assert(lpa.count() === 7)
  }

  test("shortestPaths: hop counts to landmarks, unreached absent") {
    val sp = gf.shortestPaths.landmarks(Seq(1L, 13L)).run()
      .select(col("id"), col("distances")).as[(Long, Map[Long, Int])]
      .collect().toMap
    assert(sp(1L) === Map(1L -> 0, 13L -> 3))
    assert(sp(5L) === Map(1L -> 2, 13L -> 2))
    assert(sp(21L) === Map.empty[Long, Int], "isolated vertex reaches no landmark")
  }

  test("bfs finds the shortest path and names columns from/e0/v1/.../to") {
    val p = gf.bfs.fromExpr(col("id") === 1L).toExpr(col("id") === 13L)
      .maxPathLength(5).run()
    assert(p.columns.head === "from" && p.columns.last === "to")
    // 1→3→8→13 is the unique 3-hop route; 2 hops cannot reach 13
    assert(p.columns.count(_.startsWith("e")) === 3)
    val rows = p.select(col("from.id"), col("v1.id"), col("v2.id"), col("to.id"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(rows === Set((1L, 3L, 8L, 13L)))
  }

  test("bfs depth 0: from satisfying to returns immediately") {
    val p = gf.bfs.fromExpr(col("id") === 3L).toExpr(col("id") === 3L).run()
    assert(p.columns.toSeq === Seq("from", "to") && p.count() === 1)
  }

  test("bfs: no route within maxPathLength yields an empty frame") {
    val p = gf.bfs.fromExpr(col("id") === 1L).toExpr(col("id") === 21L)
      .maxPathLength(4).run()
    assert(p.count() === 0)
  }

  test("aggregateMessages sums neighbor ids both directions") {
    val am = gf.aggregateMessages
      .sendToDst(GraphFrame.AM.src("id"))
      .sendToSrc(GraphFrame.AM.dst("id"))
      .agg(sum(GraphFrame.AM.msg).as("sum_nbr"))
      .as[(Long, Long)].collect().toMap
    // vertex 13: neighbors {8} seen once per direction-pair → 8 + 8
    assert(am(13L) === 16L)
    // vertex 1: neighbors {2,3} each twice → 2*(2+3)
    assert(am(1L) === 10L)
  }

  test("motif find: chain, shared-vertex join, negation, anonymous terms") {
    val wedges = gf.find("(a)-[e]->(b); (b)-[e2]->(c)")
    assert(wedges.columns.toSeq === Seq("a", "e", "b", "e2", "c"))
    // closing edge present for triangle members: negation drops them
    val open = gf.find("(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")
    assert(open.columns.toSeq === Seq("a", "b", "c"))
    val openSet = open.select(col("a.id"), col("b.id"), col("c.id"))
      .as[(Long, Long, Long)].collect().toSet
    // 1→3→5: 1 and 5 not adjacent → open; 1→2→3 closed by (1,3)
    assert(openSet.contains((1L, 3L, 5L)) && !openSet.contains((1L, 2L, 3L)))
    // a==c round-trips survive the negation (no self-edges to close them)
    assert(openSet.contains((1L, 2L, 1L)))
    // anonymous vertex binds nothing: per-edge rows only
    assert(gf.find("(a)-[]->()").columns.toSeq === Seq("a"))
    val err = intercept[IllegalArgumentException](gf.find("(a)-[e]>(b)"))
    assert(err.getMessage.contains("unsupported motif term"))
  }

  test("fromEdges infers the vertex set from endpoints") {
    val g2 = GraphFrame.fromEdges(e)
    assert(g2.vertices.as[Long].collect().toSet ===
      Set(1L, 2L, 3L, 5L, 8L, 13L), "isolated 21 not inferable from edges")
  }

  test("string-id dictionary path: CC labels map back to min string id") {
    val sv = v.select(col("id").cast("string").as("id"))
    val se = e.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"))
    val cc = GraphFrame(sv, se).connectedComponents.run()
      .select(col("id"), col("component")).as[(String, String)]
      .collect().toMap
    assert(cc === Map("1" -> "1", "2" -> "1", "3" -> "1", "5" -> "1",
      "8" -> "1", "13" -> "1", "21" -> "21"))
  }

  test("string-id shortestPaths translates landmark map keys") {
    val sv = v.select(col("id").cast("string").as("id"))
    val se = e.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"))
    val sp = GraphFrame(sv, se).shortestPaths.landmarks(Seq("1")).run()
      .select(col("id"), col("distances")).as[(String, Map[String, Int])]
      .collect().toMap
    assert(sp("13") === Map("1" -> 3) && sp("21") === Map.empty[String, Int])
  }

  // -- parity with the oracle-checked g* operators on driver data --------

  test("façade degrees == CoGraph.degrees (g02) on sf0.001") {
    val facade = FacadeQueries.gf01Degrees(spark, Sf)
      .select(col("id"), col("degree").cast("long").as("degree"))
    val g02 = CoGraph.degrees(spark, Sf)
    assert(facade.exceptAll(g02).isEmpty && g02.exceptAll(facade).isEmpty)
  }

  test("façade CC == Components.q (g03) on sf0.001, long and string ids") {
    val g03 = Components.q(spark, Sf)
    val facade = FacadeQueries.gf02Components(spark, Sf)
    assert(facade.exceptAll(g03).isEmpty && g03.exceptAll(facade).isEmpty)
    val viaStrings = FacadeQueries.gf06StringIdComponents(spark, Sf)
      .select(col("id").cast("long").as("id"),
        col("component").cast("long").as("component"))
    assert(viaStrings.exceptAll(g03).isEmpty && g03.exceptAll(viaStrings).isEmpty)
  }

  test("façade triangles == Components.triangles (g12) on sf0.001") {
    val g12 = Components.triangles(spark, Sf)
    val facade = FacadeQueries.gf05Triangles(spark, Sf)
    assert(facade.exceptAll(g12).isEmpty && g12.exceptAll(facade).isEmpty)
  }
}
