package graft.graph

import scala.collection.mutable.ArrayBuffer

import graft.Caches.Tracked
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distance-structure analytics over the fraud co-occurrence graph —
  * the round-9 centrality family (g27/g27b/g28/g29).
  *
  * The reference stops at PageRank + connected components
  * (`notebooks/4_graphx.ipynb:504-759`); a fraud team working the same
  * graph at 100 TB additionally needs the DISTANCE structure: how fast
  * do neighborhoods grow (effective diameter — is the graph one tight
  * blob or many sparse threads), which vertices sit closest to
  * everything (centrality triage ordering), and how modular are the
  * detected communities (is a "ring" denser inside than its degree mass
  * predicts). Each operator here follows the repo's twin discipline:
  * an exact, oracle-checkable definitional form, plus a sketch/landmark
  * scale form whose state is bounded a priori.
  *
  *  - g27: exact neighborhood function N(r) on the bucket-capped edge
  *    set — the |pairs within r hops| curve, radius 0..[[NfRadius]].
  *  - g27b: HyperBall (Boldi–Vigna, WWW'11 — public algorithm): the
  *    same curve from per-vertex HLL sketches of the growing ball,
  *    iterated through `hll_union` — state is V fixed-size sketches
  *    instead of the Σ|B(u,r)| pair table, the 100 TB path.
  *  - g28: landmark harmonic centrality — BFS from [[LandmarkK]]
  *    deterministic landmarks; per-vertex harmonic sum over landmark
  *    distances. State bounded at K·V rather than V².
  *  - g29: modularity of the g14 label-propagation communities —
  *    per-community Q contribution from integer edge/degree masses.
  */
object Centrality {

  /** Ball radius for g27/g27b — matches the BFS depth the g13 fraud
    * triage uses ([[Components.MaxHops]]).
    */
  val NfRadius = 3

  /** Landmark count for g28 — the K smallest vertex ids. Landmark
    * closeness (Potamias et al., CIKM'09 — public technique) trades the
    * all-pairs V² state for K·V.
    */
  val LandmarkK = 8

  /** BFS depth for g28 landmark distances. */
  val LandmarkHops = 3

  /** HLL precision for g27b. Every round moves one sketch per EDGE
    * through the union aggregation, so sketch bytes multiply directly
    * into shuffle/CPU — lgK 9 measured ~2× faster than 12 at sf0.1.
    * The default stays 12 anyway, for DETERMINISM UNDER RETRY: a
    * DataSketches HLL is only merge-order-insensitive while it stays in
    * the exact sparse (coupon) range or is fully dense; the sparse→dense
    * PROMOTION point is order-dependent, so an executor-loss task retry
    * can flip an estimate near the boundary (FaultDrill caught exactly
    * this at lgK=9, where the boundary sits inside test-scale ball
    * sizes; at lgK=12 every certification SF's balls — ≤1500 — stay
    * sparse-exact, and the drill passes with bit-equal output). At
    * production scale estimates cross the boundary whatever lgK is:
    * treat N(r) as the approximate statistic it is, and lower lgK for
    * speed when a few-percent retry variance is acceptable.
    */
  val HyperBallLgK = 12

  /** Distinct vertex set of the (symmetric) directed edge relation —
    * src side suffices because both orientations are materialized.
    */
  private def endpointVertices(edges: DataFrame): DataFrame =
    edges.select(col("src").as("id")).distinct()

  // ------------------------------------------------------------------
  // g27 — exact neighborhood function (definitional baseline)
  // ------------------------------------------------------------------

  /** g27 — exact neighborhood function on the bucket-capped edge set:
    * for each radius r in 0..[[NfRadius]], the number of ordered vertex
    * pairs (u,v) with d(u,v) = r, the cumulative count d ≤ r, and the
    * average ball size |B(u,r)|.
    *
    * The loop is pair-BFS with min-merge: state (u,v,hops) starts at the
    * diagonal, each round extends v by one edge and keeps the per-pair
    * minimum — identical recurrence to [[Components.fraudDistance]] but
    * keyed by PAIR, so the state is Σ|B(u,r)|: definitional and exact,
    * quadratic in the worst case (a dense component ⇒ |C|² pairs). It
    * runs on [[CoGraph.cappedEdges]] so bucket densification cannot
    * explode the edge side, but the pair table itself is the documented
    * cost — g27b is the bounded-state twin, and Round9bSpec pins their
    * agreement. Per round: one shuffle keyed by v against the
    * statically-partitioned edge cache, map-side partial min, lineage
    * cut.
    */
  def g27NeighborhoodFunction(s: SparkSession, dir: String): DataFrame = {
    val edges = CoGraph.cappedEdges(s, dir).repartition(col("src")).tracked
    val verts = endpointVertices(edges)
    var dist = verts.select(col("id").as("u"), col("id").as("v"),
      lit(0L).as("hops"))
    for (k <- 1 to NfRadius) {
      val frontier = dist.alias("d")
        .join(edges.alias("e"), col("d.v") === col("e.src"))
        .select(col("d.u"), col("e.dst").as("v"), lit(k.toLong).as("hops"))
      dist = dist.union(frontier)
        .groupBy("u", "v").agg(min(col("hops")).as("hops"))
        .transform(graft.Cut.cut)
    }
    val perRadius = dist.groupBy(col("hops").as("r"))
      .agg(count(lit(1)).as("new_pairs"))
    // 4 rows — the unpartitioned running-sum window is driver-trivial
    val nv = verts.agg(count(lit(1)).as("nv"))
    perRadius
      .withColumn("cum_pairs", sum(col("new_pairs")).over(Window.orderBy("r")))
      .crossJoin(broadcast(nv))
      .select(col("r"), col("new_pairs"), col("cum_pairs"),
        round(col("cum_pairs").cast("double") / col("nv").cast("double"), 6)
          .as("avg_ball"))
      .orderBy("r")
  }

  /** DuckDB mirror of [[g27NeighborhoodFunction]] — recursive reach over
    * the identical capped edge CTE, min per pair, per-radius counts.
    */
  val g27Sql: String =
    s"""WITH RECURSIVE ${CoGraph.cappedEdgesCte()},
       |verts AS (SELECT DISTINCT src AS id FROM edges),
       |reach(u, v, hops) AS (
       |  SELECT id, id, 0 FROM verts
       |  UNION
       |  SELECT r.u, e.dst, r.hops + 1
       |  FROM reach r JOIN edges e ON r.v = e.src
       |  WHERE r.hops < $NfRadius),
       |md AS (SELECT u, v, min(hops) AS hops FROM reach GROUP BY 1, 2),
       |per AS (SELECT hops AS r, count(*) AS new_pairs FROM md GROUP BY 1)
       |SELECT CAST(r AS BIGINT) AS r,
       |       CAST(new_pairs AS BIGINT) AS new_pairs,
       |       CAST(sum(new_pairs) OVER (ORDER BY r) AS BIGINT) AS cum_pairs,
       |       round(CAST(sum(new_pairs) OVER (ORDER BY r) AS DOUBLE)
       |             / (SELECT count(*) FROM verts), 6) AS avg_ball
       |FROM per ORDER BY r""".stripMargin

  // ------------------------------------------------------------------
  // g27b — HyperBall: the sketch-state scale twin
  // ------------------------------------------------------------------

  /** g27b — HyperBall estimate of the same neighborhood function: every
    * vertex carries an HLL sketch of its ball, seeded with itself; each
    * round the sketch unions in the neighbors' round-(r−1) sketches
    * (`hll_union_agg` over the edge join + `hll_union` with the own
    * sketch). N(r) is then Σᵤ estimate(sketch_r(u)).
    *
    * THIS is the 100 TB form of g27: state is V fixed-size sketches
    * (~1.1 KiB at the default lgConfigK=12) however dense the balls
    * get, each round is one shuffle keyed by src with a mergeable,
    * order-insensitive union (HLL registers combine by max), and the
    * estimate is deterministic for a given input set. Not
    * SQL-expressible in the DuckDB oracle (no DataSketches there) —
    * registered rows-only; Round9bSpec pins the relative error against
    * exact g27 and the exact r=0 anchor (a 1-element HLL estimates
    * exactly 1).
    */
  def g27bHyperball(s: SparkSession, dir: String): DataFrame = {
    val edges = CoGraph.cappedEdges(s, dir).repartition(col("src")).tracked
    val verts = endpointVertices(edges)
    var sk = verts
      .groupBy("id").agg(hll_sketch_agg(col("id"), lit(HyperBallLgK)).as("sk"))
      .transform(graft.Cut.cut)
    val rounds = ArrayBuffer[DataFrame](
      sk.agg(sum(hll_sketch_estimate(col("sk"))).as("est"))
        .select(lit(0L).as("r"), col("est")))
    for (k <- 1 to NfRadius) {
      val nb = edges.alias("e")
        .join(sk.alias("s"), col("e.dst") === col("s.id"))
        .groupBy(col("e.src").as("id"))
        .agg(hll_union_agg(col("s.sk")).as("nb"))
      sk = sk.alias("s")
        .join(nb.alias("n"), col("s.id") === col("n.id"), "left_outer")
        .select(col("s.id").as("id"),
          when(col("n.nb").isNull, col("s.sk"))
            .otherwise(hll_union(col("s.sk"), col("n.nb"))).as("sk"))
        .transform(graft.Cut.cut)
      rounds += sk.agg(sum(hll_sketch_estimate(col("sk"))).as("est"))
        .select(lit(k.toLong).as("r"), col("est"))
    }
    val nv = verts.agg(count(lit(1)).as("nv"))
    rounds.reduce(_.unionAll(_))
      .crossJoin(broadcast(nv))
      .select(col("r"),
        round(col("est"), 3).as("est_pairs"),
        round(col("est") / col("nv").cast("double"), 6).as("avg_ball"))
      .orderBy("r")
  }

  // ------------------------------------------------------------------
  // g28 — landmark harmonic centrality
  // ------------------------------------------------------------------

  /** g28 — harmonic centrality approximated from [[LandmarkK]]
    * landmarks (the K smallest vertex ids — deterministic, no sampling
    * seed): labeled BFS to depth [[LandmarkHops]] keyed by
    * (landmark, vertex), then per vertex the count of landmarks reached
    * and the harmonic sum Σ 1/d over them.
    *
    * The harmonic sum is kept INTEGER-EXACT as `harmonic_x6` — 6/d for
    * d ∈ {1,2,3} via CASE (6 = lcm(1,2,3)) — so cross-engine comparison
    * and the ORDER BY are integer, not float-accumulation-dependent;
    * the float `harmonic` column is a single exact IEEE division of
    * that integer. Both scale guards compose here: landmarks bound the
    * STATE at K·V distance rows (vs the V² of all-pairs closeness) and
    * the bucket cap bounds the JOIN side (each BFS round joins the
    * frontier against the capped edge set, so per-vertex fan-out is
    * bounded however dense the hour buckets get — without it the sf1
    * densification put the frontier at Σ deg(v) ≈ 10⁸ rows/round, a
    * measured 33× slope; capped it is single-digit). Per round: one
    * shuffle keyed by the frontier vertex, map-side partial min,
    * lineage cut.
    */
  def g28LandmarkHarmonic(s: SparkSession, dir: String): DataFrame = {
    val edges = CoGraph.cappedEdges(s, dir).repartition(col("src")).tracked
    val verts = endpointVertices(edges)
    val landmarks = verts.orderBy("id").limit(LandmarkK)
    var dist = landmarks.select(col("id").as("lm"), col("id").as("id"),
      lit(0L).as("hops"))
    for (k <- 1 to LandmarkHops) {
      val frontier = dist.alias("d")
        .join(edges.alias("e"), col("d.id") === col("e.src"))
        .select(col("d.lm"), col("e.dst").as("id"), lit(k.toLong).as("hops"))
      dist = dist.union(frontier)
        .groupBy("lm", "id").agg(min(col("hops")).as("hops"))
        .transform(graft.Cut.cut)
    }
    val perVertex = dist.filter(col("hops") > 0)
      .groupBy("id")
      .agg(count(lit(1)).as("reached"),
        sum(expr("CASE hops WHEN 1 THEN 6 WHEN 2 THEN 3 ELSE 2 END"))
          .as("harmonic_x6"))
    verts.alias("v")
      .join(perVertex.alias("a"), col("v.id") === col("a.id"), "left_outer")
      .select(col("v.id").as("id"),
        coalesce(col("a.reached"), lit(0L)).as("reached"),
        coalesce(col("a.harmonic_x6"), lit(0L)).as("harmonic_x6"),
        round(coalesce(col("a.harmonic_x6"), lit(0L)).cast("double") / 6.0, 6)
          .as("harmonic"))
      .orderBy(col("harmonic_x6").desc, col("id"))
  }

  /** DuckDB mirror of [[g28LandmarkHarmonic]] — same capped edge CTE. */
  val g28Sql: String =
    s"""WITH RECURSIVE ${CoGraph.cappedEdgesCte()},
       |verts AS (SELECT DISTINCT src AS id FROM edges),
       |landmarks AS (SELECT id FROM verts ORDER BY id LIMIT $LandmarkK),
       |reach(lm, id, hops) AS (
       |  SELECT id, id, 0 FROM landmarks
       |  UNION
       |  SELECT r.lm, e.dst, r.hops + 1
       |  FROM reach r JOIN edges e ON r.id = e.src
       |  WHERE r.hops < $LandmarkHops),
       |md AS (SELECT lm, id, min(hops) AS hops FROM reach GROUP BY 1, 2),
       |agg AS (
       |  SELECT id, count(*) AS reached,
       |         sum(CASE hops WHEN 1 THEN 6 WHEN 2 THEN 3 ELSE 2 END)
       |           AS harmonic_x6
       |  FROM md WHERE hops > 0 GROUP BY 1)
       |SELECT v.id,
       |       CAST(coalesce(a.reached, 0) AS BIGINT) AS reached,
       |       CAST(coalesce(a.harmonic_x6, 0) AS BIGINT) AS harmonic_x6,
       |       round(CAST(coalesce(a.harmonic_x6, 0) AS DOUBLE) / 6.0, 6)
       |         AS harmonic
       |FROM verts v LEFT JOIN agg a ON v.id = a.id
       |ORDER BY harmonic_x6 DESC, v.id""".stripMargin

  // ------------------------------------------------------------------
  // g29 — modularity of the LPA communities
  // ------------------------------------------------------------------

  /** g29 — per-community modularity contribution of the g14
    * label-propagation partition: Q_c = m_c/M − (d_c/M)² over the
    * directed both-orientation edge relation, where m_c is the count of
    * directed edges internal to community c, d_c the community's degree
    * mass, and M the total directed edge count. Σ_c Q_c is Newman
    * modularity (public formula) — per-community rows are the analytics
    * a fraud team reads: a "ring" whose q_contrib is near zero is a
    * degree artifact; a strongly positive one is denser inside than its
    * degree mass predicts.
    *
    * All masses are integers (counts and degree sums); the only float
    * work is two exact IEEE divisions, one multiply, one subtract —
    * bit-identical across engines at round(…, 6). Shape: two broadcast-
    * friendly label joins + three keyed aggregations, no iteration
    * beyond what g14 already does.
    *
    * Coverage note: only communities with degree mass are emitted — deg
    * is built from edge endpoints and inner-joined to the labels, so a
    * community whose members all have zero degree (possible only if the
    * vertex universe outgrew the edge relation; never on this graph,
    * where vertices ARE edge endpoints) would not appear. Its Q_c is 0
    * by definition, so Σ_c Q_c is unaffected; the DuckDB mirror shares
    * the convention.
    */
  def g29Modularity(s: SparkSession, dir: String): DataFrame =
    modularityOf(s, dir, capped = false)

  /** g29b — [[g29Modularity]] with BOTH the community detection and the
    * scored edge relation on the bucket-capped build: the full
    * "communities + how modular are they" readout whose per-iteration
    * and scoring costs are bounded a priori (g29's sf1 slope is g14's
    * own 23×; g14b/g29b close it the way g06b closed g06). Where the
    * cap does not bind, bit-identical to g29 (Round9bSpec).
    */
  def g29bModularityCapped(s: SparkSession, dir: String): DataFrame =
    modularityOf(s, dir, capped = true)

  private def modularityOf(s: SparkSession, dir: String,
      capped: Boolean): DataFrame = {
    val edges =
      (if (capped) CoGraph.cappedEdges(s, dir) else CoGraph.edges(s, dir))
        .tracked
    val labels = Components.labelPropagation(s, dir, capped = capped).tracked
    val m = edges.agg(count(lit(1)).as("m"))
    val deg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val degc = deg.alias("d")
      .join(labels.alias("l"), col("d.id") === col("l.id"))
      .groupBy(col("l.label").as("label"))
      .agg(sum(col("d.deg")).as("degree_sum"))
    val mc = edges.alias("e")
      .join(labels.alias("ls"), col("e.src") === col("ls.id"))
      .join(labels.alias("ld"), col("e.dst") === col("ld.id"))
      .filter(col("ls.label") === col("ld.label"))
      .groupBy(col("ls.label").as("label"))
      .agg(count(lit(1)).as("internal_edges"))
    degc.alias("dc")
      .join(mc.alias("mc"), col("dc.label") === col("mc.label"), "left_outer")
      .crossJoin(broadcast(m))
      .select(col("dc.label").as("label"),
        coalesce(col("mc.internal_edges"), lit(0L)).as("internal_edges"),
        col("dc.degree_sum").as("degree_sum"),
        round(
          coalesce(col("mc.internal_edges"), lit(0L)).cast("double")
            / col("m").cast("double")
            - (col("dc.degree_sum").cast("double") / col("m").cast("double"))
            * (col("dc.degree_sum").cast("double") / col("m").cast("double")),
          6).as("q_contrib"))
      .orderBy("label")
  }

  /** DuckDB mirror of [[g29Modularity]] — composes the g14 LPA CTE. */
  val g29Sql: String = modularitySql(Components.lpaCte())

  /** g29b's mirror — the same statement over the capped LPA chain. */
  val g29bSql: String =
    modularitySql(Components.lpaCte(edgesCte = CoGraph.cappedEdgesCte()))

  private def modularitySql(lpaCte: String): String =
    s"""WITH $lpaCte,
       |deg AS (SELECT src AS id, count(*) AS deg FROM edges GROUP BY 1),
       |m AS (SELECT count(*) AS m FROM edges),
       |degc AS (
       |  SELECT l.label, sum(d.deg) AS degree_sum
       |  FROM deg d JOIN labels l ON d.id = l.id GROUP BY 1),
       |mc AS (
       |  SELECT ls.label, count(*) AS internal_edges
       |  FROM edges e
       |  JOIN labels ls ON e.src = ls.id
       |  JOIN labels ld ON e.dst = ld.id
       |  WHERE ls.label = ld.label GROUP BY 1)
       |SELECT dc.label,
       |       CAST(coalesce(mc.internal_edges, 0) AS BIGINT) AS internal_edges,
       |       CAST(dc.degree_sum AS BIGINT) AS degree_sum,
       |       round(CAST(coalesce(mc.internal_edges, 0) AS DOUBLE)
       |               / CAST(m.m AS DOUBLE)
       |             - (CAST(dc.degree_sum AS DOUBLE) / CAST(m.m AS DOUBLE))
       |             * (CAST(dc.degree_sum AS DOUBLE) / CAST(m.m AS DOUBLE)),
       |             6) AS q_contrib
       |FROM degc dc LEFT JOIN mc ON dc.label = mc.label CROSS JOIN m
       |ORDER BY dc.label""".stripMargin
}
