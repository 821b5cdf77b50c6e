package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables

/** G3/G4 — connected components + component analytics (reference
  * `notebooks/4_graphx.ipynb:504-577`, SURVEY §2.10).
  *
  * Uses native `org.apache.spark.graphx` (the reference uses GraphFrames,
  * a thin layer over the same Pregel machinery). `user_id` is already an
  * int64, so it IS the GraphX `VertexId` — no string↔Long dictionary
  * (the reference has to stringify ids, `4_graphx.ipynb:334-336`; we
  * don't). GraphX labels each component with its minimum VertexId, which
  * is also the canonical label the DuckDB oracle computes — so CC is
  * fully oracle-checkable here, unlike GraphFrames' opaque labels
  * (SURVEY §7.4 note).
  *
  * Scale: GraphX CC is iterative Pregel with edge-partition placement —
  * at 100 TB the vertex/edge RDDs partition by `PartitionStrategy` and
  * each superstep is a local join, no driver-side state. The isolated
  * vertices (the overwhelming majority in fraud graphs: 275,236 of
  * 275,663 in the reference) never enter the Pregel messages — only the
  * connected core iterates.
  */
object Components {

  /** All entity ids (analog of distinct V1, `4_graphx.ipynb:126`). */
  def vertices(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(col("user_id").as("id")).distinct()

  /** (id, component) over ALL vertices; component = min member id. */
  def connectedComponents(s: SparkSession, dir: String): DataFrame = {
    val session = s
    import session.implicits._
    val vtx = vertices(s, dir)
    val edgeRdd = CoGraph.edges(s, dir)
      .select(col("src"), col("dst")).as[(Long, Long)]
      .rdd.map { case (a, b) => Edge(a: VertexId, b: VertexId, 1) }
    val vtxRdd = vtx.select(col("id")).as[Long].rdd.map(id => (id, ()))
    // Graph() already persists its vertex/edge RDDs (MEMORY_ONLY default);
    // re-persisting throws "cannot change storage level".
    val g = Graph(vtxRdd, edgeRdd)
    g.connectedComponents().vertices.toDF("id", "component")
  }

  /** g03 query — deterministic (id, component) listing. */
  def q(s: SparkSession, dir: String): DataFrame =
    connectedComponents(s, dir).orderBy(col("id"))

  /** DuckDB mirror: min-id reachability closure via recursive CTE (the
    * edge set is symmetric, so one-directional reachability suffices).
    */
  val qSql: String =
    s"""WITH RECURSIVE ${CoGraph.edgesCte},
       |vertices AS (SELECT DISTINCT user_id AS id FROM events),
       |reach(id, x) AS (
       |  SELECT id, id FROM vertices
       |  UNION
       |  SELECT r.id, e.dst FROM reach r JOIN edges e ON r.x = e.src)
       |SELECT id, min(x) AS component FROM reach
       |GROUP BY 1 ORDER BY id""".stripMargin

  /** g04 — component analytics (`4_graphx.ipynb:520-577`): size per
    * component (groupBy-count on the CC output joined back), medium-size
    * flag (reference: 5–50), ordered largest-first.
    */
  def componentStats(s: SparkSession, dir: String): DataFrame =
    connectedComponents(s, dir)
      .groupBy(col("component"))
      .agg(count(lit(1)).as("component_size"))
      .withColumn("is_medium",
        col("component_size") >= 5 && col("component_size") <= 50)
      .orderBy(col("component_size").desc, col("component"))

  val componentStatsSql: String =
    s"""WITH RECURSIVE ${CoGraph.edgesCte},
       |vertices AS (SELECT DISTINCT user_id AS id FROM events),
       |reach(id, x) AS (
       |  SELECT id, id FROM vertices
       |  UNION
       |  SELECT r.id, e.dst FROM reach r JOIN edges e ON r.x = e.src),
       |cc AS (SELECT id, min(x) AS component FROM reach GROUP BY 1)
       |SELECT component, CAST(count(*) AS BIGINT) AS component_size,
       |       count(*) BETWEEN 5 AND 50 AS is_medium
       |FROM cc GROUP BY 1
       |ORDER BY component_size DESC, component""".stripMargin
}
