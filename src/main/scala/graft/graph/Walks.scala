package graft.graph

import graft.Caches.Tracked
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Det

/** Deterministic random-walk corpus generation — the DeepWalk/node2vec
  * data product (Perozzi et al., KDD'14; Grover & Leskovec, KDD'16,
  * public formulations): one truncated walk per vertex over the capped
  * co-occurrence graph, plus the skip-gram (center, context) pair
  * extraction an embedding trainer consumes. Extends the §2.10 G7
  * rank-analytics family (the graph built at
  * `notebooks/4_graphx.ipynb:193-208`) with the graph-ML training-data
  * step the reference stops short of.
  *
  * THE design decision is determinism: the classic formulation samples
  * next hops from an RNG, which is partition-order-dependent and
  * unverifiable. Here the next hop from vertex v in walk w at step t is
  * `argmin over out-neighbors u of H(w, t, u)` — a Knuth-scrambled hash
  * — so a walk is a PURE FUNCTION of (graph, start vertex): stable
  * across engines, partitionings, retries, and re-runs (the x03/e14
  * hash-not-rand discipline applied to graph traversal), and therefore
  * exactly oracle-checkable in SQL. Distributionally the hash argmin is
  * a uniform choice per (w, t) over the neighbor set, like any
  * hash-as-uniform sampler; biased second-order (node2vec p/q) variants
  * would reweight the ORDER BY key the same way.
  *
  * Scale: each step is ONE join of the frontier (V rows — one per live
  * walk) against the edge relation keyed by the current vertex, then a
  * per-walk argmin whose window partition is exactly the out-neighbor
  * list of one vertex — bounded a priori by the relation's max degree
  * (buckets·cap for g32's bucket-capped relation; FanOut for g32b's
  * fan-out-capped arm — the g31/g31b split applied to walks). State
  * between steps is V rows; per-step lineage is cut ([[graft.Cut]]) so
  * the step union re-reads materialized levels instead of re-running
  * the chain per branch (the SCALE.md union rule).
  */
object Walks {

  /** Truncated walk length (steps beyond the start vertex). */
  val WalkLen = 4

  /** Skip-gram context window (|step(center) − step(context)| ≤ this). */
  val SkipWindow = 2

  private val P = Det.KnuthP
  private val A = Det.KnuthA

  /** H(walk, step, candidate) — every intermediate stays < 2.7e18
    * (pmod before each multiply), Long-safe in both engines. */
  private def hopHash(walk: org.apache.spark.sql.Column, step: Int,
      dst: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod((pmod(pmod(walk, lit(P)) * lit(A), lit(P)) + lit(step.toLong))
      * lit(A) + pmod(dst, lit(P)), lit(P))

  private def hopHashSql(walk: String, step: Int, dst: String): String =
    s"(((($walk % $P) * $A) % $P + $step) * $A + $dst % $P) % $P"

  /** The walk table (walk_id, step, vertex_id) over a both-orientations
    * edge relation: step 0 is the start vertex (every endpoint vertex
    * starts one walk), step t+1 the hash-argmin next hop; a walk ends
    * early only at a vertex with no out-neighbors.
    */
  private def walksOn(edges0: DataFrame): DataFrame = {
    val edges = edges0.repartition(col("src")).tracked
    val verts = edges.select(col("src").as("id")).distinct()
    var frontier = verts.select(col("id").as("walk"), col("id").as("cur"))
    var out = frontier.select(col("walk"), lit(0).as("step"),
      col("cur").as("vertex"))
    for (k <- 1 to WalkLen) {
      // argmin via min(struct(h, dst)) — struct ordering IS the
      // (h asc, dst asc) tie-break the row_number window spelled, and
      // the groupBy partially aggregates map-side: each step's shuffle
      // carries ONE row per walk instead of sorting the whole frontier
      // fan-out per partition (r15, §2.3 "aggregate before you
      // shuffle"; the pqParts argmin pattern). (h, dst) pairs are
      // unique per walk — edges are distinct — so min(struct) selects
      // exactly the window's rn = 1 row.
      frontier = frontier.alias("f")
        .join(edges.alias("e"), col("f.cur") === col("e.src"))
        .select(col("f.walk").as("walk"),
          struct(hopHash(col("f.walk"), k, col("e.dst")).as("h"),
            col("e.dst").as("dst")).as("hd"))
        .groupBy("walk").agg(min(col("hd")).as("hd"))
        .select(col("walk"), col("hd.dst").as("cur"))
        .transform(graft.Cut.cut)
      out = out.unionAll(frontier.select(col("walk"), lit(k).as("step"),
        col("cur").as("vertex")))
    }
    out.select(col("walk").as("walk_id"), col("step"),
      col("vertex").as("vertex_id"))
  }

  private def walksSql(baseCtes: String): String = {
    val steps = (1 to WalkLen).map { k =>
      s"""step$k AS MATERIALIZED (
         |  SELECT walk, dst AS cur FROM (
         |    SELECT w.walk, e.dst,
         |      row_number() OVER (PARTITION BY w.walk
         |        ORDER BY ${hopHashSql("w.walk", k, "e.dst")}, e.dst) AS rn
         |    FROM step${k - 1} w JOIN edges e ON w.cur = e.src)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val union = (0 to WalkLen)
      .map(k => s"SELECT walk, $k AS step, cur FROM step$k")
      .mkString(" UNION ALL ")
    s"""$baseCtes,
       |step0 AS MATERIALIZED (
       |  SELECT DISTINCT src AS walk, src AS cur FROM edges),
       |$steps,
       |walks AS (SELECT walk AS walk_id, CAST(step AS INT) AS step,
       |          cur AS vertex_id FROM ($union))""".stripMargin
  }

  /** g32 — walks over the bucket-capped co-occurrence relation. */
  def g32HashWalks(s: SparkSession, dir: String): DataFrame =
    walksOn(CoGraph.cappedEdges(s, dir)).orderBy("walk_id", "step")

  val g32Sql: String =
    s"""WITH ${walksSql(CoGraph.cappedEdgesCte())}
       |SELECT walk_id, step, vertex_id FROM walks
       |ORDER BY walk_id, step""".stripMargin

  /** g32b — walks over the fan-out-capped mutual relation (max degree ≤
    * FanOut by construction): the production arm, per-step window
    * partitions ≤ FanOut rows a priori.
    */
  def g32bHashWalksFanout(s: SparkSession, dir: String): DataFrame =
    walksOnFanout(s, dir).orderBy("walk_id", "step")

  private def walksOnFanout(s: SparkSession, dir: String): DataFrame = {
    val und = NeighborAgg.fanoutUnd(s, dir)
    walksOn(und.unionAll(
      und.select(col("dst").as("src"), col("src").as("dst"))))
  }

  private val fanoutBase =
    s"""${NeighborAgg.fanoutUndCte},
       |edges AS (SELECT src, dst FROM und
       |          UNION ALL SELECT dst AS src, src AS dst FROM und)"""
      .stripMargin

  val g32bSql: String =
    s"""WITH ${walksSql(fanoutBase)}
       |SELECT walk_id, step, vertex_id FROM walks
       |ORDER BY walk_id, step""".stripMargin

  /** g33 — skip-gram training pairs from the g32b walks: (center,
    * context) for every within-walk position pair at distance ≤
    * [[SkipWindow]], with multiplicity — the table an embedding trainer
    * reads. The self-join is keyed by walk_id and each walk is ≤
    * WalkLen+1 rows, so per-walk cost is a constant (T+1)·2·window.
    */
  def g33SkipgramPairs(s: SparkSession, dir: String): DataFrame = {
    val walks = walksOnFanout(s, dir).tracked
    walks.alias("c")
      .join(walks.alias("x"), col("c.walk_id") === col("x.walk_id")
        && col("c.step") =!= col("x.step")
        && abs(col("c.step") - col("x.step")) <= SkipWindow)
      .groupBy(col("c.vertex_id").as("center_id"),
        col("x.vertex_id").as("context_id"))
      .agg(count(lit(1)).as("pair_count"))
      .orderBy("center_id", "context_id")
  }

  val g33Sql: String =
    s"""WITH ${walksSql(fanoutBase)}
       |SELECT c.vertex_id AS center_id, x.vertex_id AS context_id,
       |  count(*) AS pair_count
       |FROM walks c JOIN walks x ON c.walk_id = x.walk_id
       |  AND c.step <> x.step AND abs(c.step - x.step) <= $SkipWindow
       |GROUP BY 1, 2 ORDER BY center_id, context_id""".stripMargin
}
