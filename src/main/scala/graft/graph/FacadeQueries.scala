package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-gate queries exercising the [[GraphFrame]] façade end-to-end
  * (VERDICT r4 "what's missing" #3: a user porting GraphFrames call-sites
  * verbatim). Each gf* query drives a different façade surface —
  * `.degrees`, `.connectedComponents.run()`, `.find(motif)`,
  * `.aggregateMessages`, `.triangleCount.run()`, and the non-integral-id
  * dictionary path — over the SAME co-occurrence graph the g* operators
  * use (`4_graphx.ipynb:334-373`), so every oracle is an exact DuckDB
  * check against the established edge CTE.
  *
  * Scale: the façade adds nothing on top of the underlying operators —
  * gf01/gf02/gf05 delegate to the same union-all aggregate / GraphX
  * Pregel machinery as g02/g03/g12; gf03/gf04 are vertex-id equi-joins
  * and one keyed aggregate; gf06's dictionary is a distinct+sort over
  * VERTEX cardinality only (and is skipped entirely for integral ids).
  */
object FacadeQueries {

  /** The co-occurrence graph through the façade constructor. */
  private def g(s: SparkSession, dir: String): GraphFrame =
    GraphFrame(Components.vertices(s, dir), CoGraph.edges(s, dir))

  /** The CAPPED co-occurrence graph through the façade constructor — the
    * production arm for the façade's quadratic surfaces (motif chains,
    * triangle intersection). Built over [[NeighborAgg.fanoutUnd]]
    * (bucket-capped co-activity, per-node fan-out ≤ FanOut smallest
    * neighbor ids, MUTUAL-retention symmetrized), re-expanded to both
    * orientations so the directed façade semantics match [[g]]'s edge
    * shape. Max out-degree ≤ FanOut BY CONSTRUCTION, so any Σdeg²
    * enumeration over it is ≤ |V|·FanOut² a priori — the g20b/g30b
    * discipline applied to the façade (the raw relation's gf05 OOM'd at
    * sf1, SCALE.md "sf1 full-registry certification").
    *
    * Both orientations come from ONE explode projection over the capped
    * relation, not a 2-branch union: Spark shares no subplan across union
    * branches, so the union spelling would run the cap chain twice (the
    * g30/gf04 finding, enforced by UnionLintSpec).
    */
  private def gCapped(s: SparkSession, dir: String): GraphFrame = {
    val both = NeighborAgg.fanoutUnd(s, dir)
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    GraphFrame(Components.vertices(s, dir), both)
  }

  /** DuckDB mirror of [[gCapped]]'s edge relation: the fanoutUnd CTE chain
    * (ending in `und(src, dst)`, src < dst) re-expanded to both
    * orientations as `edges`.
    */
  private val cappedEdgesBothCte: String =
    s"""${NeighborAgg.fanoutUndCte},
       |edges AS (SELECT src, dst FROM und
       |          UNION ALL SELECT dst AS src, src AS dst FROM und)""".stripMargin

  /** gf01 — `g.degrees` (GraphFrames omit-zero semantics, INT degree). */
  def gf01Degrees(s: SparkSession, dir: String): DataFrame =
    g(s, dir).degrees.orderBy(col("id"))

  val gf01Sql: String =
    s"""WITH ${CoGraph.edgesCte}
       |SELECT id, CAST(count(*) AS INTEGER) AS degree
       |FROM (SELECT src AS id FROM edges
       |      UNION ALL SELECT dst AS id FROM edges) u
       |GROUP BY 1 ORDER BY id""".stripMargin

  /** gf02 — `g.connectedComponents.run()`: all vertices + min-member-id
    * component label, identical semantics to g03 (same recursive-CTE
    * oracle spelling).
    */
  def gf02Components(s: SparkSession, dir: String): DataFrame =
    g(s, dir).connectedComponents.run().orderBy(col("id"))

  val gf02Sql: String = Components.qSql

  /** gf03 — motif search: open wedges `(a)->(b)->(c)` with no closing
    * `(a)->(c)` edge, the GraphFrames `find` pattern the reference's
    * collusion-ring analysis would write. Two positive terms → one
    * vertex-id equi-join; the negated term → one anti-join.
    *
    * Scale note: chain motifs enumerate Σ deg² paths — quadratic in
    * degree, like any 2-hop expansion. Exact at the gate SFs; at sf1's
    * 103×-densified edge set the enumeration exceeds the sandbox (as
    * measured for g19), and the production spelling runs `find` over the
    * capped edge list ([[NeighborAgg.g22CappedNeighborFeatures]]'s
    * bucket + fan-out guards) exactly as a GNN pipeline samples
    * neighborhoods before expansion.
    */
  private val OpenWedgePattern = "(a)-[e]->(b); (b)-[e2]->(c); !(a)-[]->(c)"

  private def openWedgeAgg(found: DataFrame): DataFrame =
    found.agg(
      count(lit(1)).as("n_open_wedges"),
      count_distinct(col("b.id")).as("n_centers"))

  /** Open-wedge count/centers tail over a prior `edges(src, dst)` CTE —
    * shared by the uncapped (gf03) and capped (gf03b) oracle spellings.
    */
  private val openWedgeTail: String =
    """w AS (
      |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      |  FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
      |  WHERE NOT EXISTS (SELECT 1 FROM edges e3
      |                    WHERE e3.src = e1.src AND e3.dst = e2.dst))
      |SELECT CAST(count(*) AS BIGINT) AS n_open_wedges,
      |       CAST(count(DISTINCT b) AS BIGINT) AS n_centers
      |FROM w""".stripMargin

  def gf03Motif(s: SparkSession, dir: String): DataFrame =
    openWedgeAgg(g(s, dir).find(OpenWedgePattern))

  val gf03Sql: String =
    s"""WITH ${CoGraph.edgesCte},
       |$openWedgeTail""".stripMargin

  /** gf03b — the SAME `find` call over the capped graph ([[gCapped]]):
    * wedge enumeration bounded at |V|·FanOut² a priori, so the façade
    * motif surface survives sf1+ where gf03's raw-relation enumeration is
    * a documented quadratic. Same query text a GraphFrames user writes —
    * only the constructor changes, exactly how a GNN pipeline samples
    * neighborhoods before expansion.
    */
  def gf03bMotifCapped(s: SparkSession, dir: String): DataFrame =
    openWedgeAgg(gCapped(s, dir).find(OpenWedgePattern))

  val gf03bSql: String =
    s"""WITH $cappedEdgesBothCte,
       |$openWedgeTail""".stripMargin

  /** gf04 — `g.aggregateMessages`: min neighbor id per vertex (both
    * directions), the canonical AM example from the GraphFrames docs.
    */
  def gf04AggMsg(s: SparkSession, dir: String): DataFrame = {
    val gr = g(s, dir)
    gr.aggregateMessages
      .sendToDst(GraphFrame.AM.src("id"))
      .sendToSrc(GraphFrame.AM.dst("id"))
      .agg(min(GraphFrame.AM.msg).as("min_neighbor"))
      .orderBy(col("id"))
  }

  val gf04Sql: String =
    s"""WITH ${CoGraph.edgesCte}
       |SELECT id, min(nbr) AS min_neighbor
       |FROM (SELECT dst AS id, src AS nbr FROM edges
       |      UNION ALL SELECT src, dst FROM edges) u
       |GROUP BY 1 ORDER BY id""".stripMargin

  /** gf05 — `g.triangleCount.run()` shaped to g12's contract (vertices in
    * no triangle omitted) — same GraphX path, same exact three-way-join
    * oracle.
    */
  private def triangleShape(out: DataFrame): DataFrame =
    out.filter(col("count") > 0)
      .select(col("id"), col("count").as("n_triangles"))
      .orderBy(col("n_triangles").desc, col("id"))

  def gf05Triangles(s: SparkSession, dir: String): DataFrame =
    triangleShape(g(s, dir).triangleCount.run())

  val gf05Sql: String = Components.trianglesSql

  /** gf05b — `triangleCount.run()` over the capped graph: the GraphX
    * neighbor-set intersection runs on a relation whose max degree is
    * ≤ FanOut by construction, so per-vertex set size — the Σdeg² term
    * that OOM'd gf05's executors at sf1 — is bounded a priori. Same
    * façade call, capped constructor; the exact three-way-join oracle
    * enumerates triangles over the same `und` relation.
    */
  def gf05bTrianglesCapped(s: SparkSession, dir: String): DataFrame =
    triangleShape(gCapped(s, dir).triangleCount.run())

  val gf05bSql: String =
    s"""WITH ${NeighborAgg.fanoutUndCte},
       |tri AS (
       |  SELECT a.src AS x, a.dst AS y, b.dst AS z
       |  FROM und a
       |  JOIN und b ON b.src = a.dst
       |  JOIN und c ON c.src = a.src AND c.dst = b.dst)
       |SELECT id, CAST(count(*) AS BIGINT) AS n_triangles
       |FROM (SELECT x AS id FROM tri
       |      UNION ALL SELECT y FROM tri
       |      UNION ALL SELECT z FROM tri)
       |GROUP BY 1
       |ORDER BY n_triangles DESC, id""".stripMargin

  /** gf06 — the non-integral-id path: same CC as gf02 but with STRING
    * vertex ids, forcing the sorted-dictionary translation (ascending
    * dict ⇒ min-gid labels map back to min-string-id labels, so the
    * oracle is the same recursive closure over VARCHAR ids).
    */
  def gf06StringIdComponents(s: SparkSession, dir: String): DataFrame = {
    val v = Components.vertices(s, dir)
      .select(col("id").cast("string").as("id"))
    val e = CoGraph.edges(s, dir)
      .select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"))
    GraphFrame(v, e).connectedComponents.run().orderBy(col("id"))
  }

  val gf06Sql: String =
    s"""WITH RECURSIVE ${CoGraph.edgesCte},
       |edges_s AS (SELECT CAST(src AS VARCHAR) AS src,
       |                   CAST(dst AS VARCHAR) AS dst FROM edges),
       |vertices AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS id FROM events),
       |reach(id, x) AS (
       |  SELECT id, id FROM vertices
       |  UNION
       |  SELECT r.id, e.dst FROM reach r JOIN edges_s e ON r.x = e.src),
       |cc AS (SELECT id, min(x) AS component FROM reach GROUP BY 1)
       |SELECT id, component FROM cc ORDER BY id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gf01_facade_degrees" -> (gf01Degrees _),
    "gf02_facade_components" -> (gf02Components _),
    "gf03_facade_motif" -> (gf03Motif _),
    "gf03b_facade_motif_capped" -> (gf03bMotifCapped _),
    "gf04_facade_aggmsg" -> (gf04AggMsg _),
    "gf05_facade_triangles" -> (gf05Triangles _),
    "gf05b_facade_triangles_capped" -> (gf05bTrianglesCapped _),
    "gf06_facade_string_ids" -> (gf06StringIdComponents _)
  )

  val oracles: Map[String, String] = Map(
    "gf01_facade_degrees" -> gf01Sql,
    "gf02_facade_components" -> gf02Sql,
    "gf03_facade_motif" -> gf03Sql,
    "gf03b_facade_motif_capped" -> gf03bSql,
    "gf04_facade_aggmsg" -> gf04Sql,
    "gf05_facade_triangles" -> gf05Sql,
    "gf05b_facade_triangles_capped" -> gf05bSql,
    "gf06_facade_string_ids" -> gf06Sql
  )
}
