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

  /** Broadcast-hint ceiling for g27b's sketch side, in VERTICES (rows).
    * A sketch row is an id + ~1.1 KiB HLL at lgK=12, so the ceiling is
    * ~1.1 GiB broadcast — inside driver/executor headroom wherever this
    * runs, and far under Spark's 8 GiB broadcast cap. Like
    * [[Components.TrussBroadcastMaxRows]] the hint is gated on the
    * MATERIALIZED vertex count, never assumed: an out-of-envelope graph
    * falls back to the planner's shuffled join instead of OOMing the
    * driver.
    */
  private[graph] val HyperballBroadcastMaxVerts: Long = 1000000L

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
    // r14 optimization (guide §2.4/§3.1, profiled with graft.Profile):
    // the planner broadcast the EDGE side of the per-round union join —
    // edges are the byte-small relation — which streamed the sketch
    // frame on the 1-2 partitions AQE's byte-based coalescing had left
    // it with, serializing the CPU-heavy HLL unions (two 1-task jobs =
    // 8.2 s of the query's 11 s at sf0.1; sketch rows are few BYTES but
    // kilobytes of register-merge CPU each, the case byte-based
    // coalescing always misprices). Two deliberate moves, both gated /
    // conf-derived so they stay scale-honest:
    //  (1) pin the iterate's partitioning: explicit conf-derived
    //      partition count on the round-0 sketch frame (AQE never
    //      coalesces an explicit repartition), which every later round
    //      inherits through the broadcast joins;
    //  (2) broadcast the SKETCH side of both per-round joins, gated on
    //      the materialized vertex count like Components.
    //      TrussBroadcastMaxRows — the union aggregate then streams the
    //      src-partitioned edge cache and the heavy register merges run
    //      map-side at full parallelism, with the final merge touching
    //      one partial per vertex. Out-of-envelope graphs degrade to
    //      the planner's shuffled choice, never a driver OOM.
    // Measured: 8.9 s -> 2.6 s at sf0.1 (before/after plans in
    // plans/r14/), output bit-identical (lgK=12 keeps certification-SF
    // balls in the order-insensitive sparse-exact range — see
    // [[HyperBallLgK]]).
    val nParts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val hint = verts.count() <= HyperballBroadcastMaxVerts
    def sketchSide(d: DataFrame): DataFrame = if (hint) broadcast(d) else d
    var sk = verts
      .groupBy("id").agg(hll_sketch_agg(col("id"), lit(HyperBallLgK)).as("sk"))
      .repartition(nParts, col("id"))
      .transform(graft.Cut.cut)
    val rounds = ArrayBuffer[DataFrame](
      sk.agg(sum(hll_sketch_estimate(col("sk"))).as("est"))
        .select(lit(0L).as("r"), col("est")))
    for (k <- 1 to NfRadius) {
      val nb = edges.alias("e")
        .join(sketchSide(sk.alias("s")), col("e.dst") === col("s.id"))
        .groupBy(col("e.src").as("id"))
        .agg(hll_union_agg(col("s.sk")).as("nb"))
      sk = sk.alias("s")
        .join(sketchSide(nb.alias("n")), col("s.id") === col("n.id"),
          "left_outer")
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

  private[graph] def modularitySql(lpaCte: String): String =
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

  // ------------------------------------------------------------------
  // g31 — landmark-sampled betweenness centrality (Brandes)
  // ------------------------------------------------------------------

  /** g31 — betweenness centrality sampled from the g28 landmark seeds:
    * hop-bounded Brandes (Brandes 2001, "A faster algorithm for
    * betweenness centrality" — public formula) on the bucket-capped
    * edge set. For each of the [[LandmarkK]] deterministic landmark
    * sources, a level-synchronous BFS to [[LandmarkHops]] counts
    * shortest paths σ(v) (INTEGER-exact — sums of integer path counts),
    * then the backward pass accumulates the dependency
    * δ(v) = Σ_{w ∈ succ(v)} σ(v)/σ(w) · (1 + δ(w)); the reported
    * betweenness is Σ over landmark sources of δ — the Brandes
    * estimator restricted to the sampled sources and the hop horizon,
    * the standard scale form (Bader et al., ICALP'07 sampling).
    *
    * The one classic centrality the family lacked: degree (g02),
    * PageRank (g06/g08/g16), harmonic (g28), HITS (g18), modularity
    * (g29), k-core/truss (g15/g30) are in — betweenness is the
    * "broker" score a fraud team reads to find the mule ACCOUNTS THAT
    * CONNECT rings rather than sit inside them.
    *
    * Determinism discipline: σ are integers; each dependency term is
    * one IEEE division+multiply on bit-identical inputs, SNAPPED to
    * DECIMAL(38,12) before summation (the [[graft.operators.Det]]
    * dstddev pattern) so every aggregate is exact integer arithmetic —
    * order-independent across partitionings, retries and engines; the
    * final round is [[graft.operators.Det.r]]'s floor spelling.
    *
    * Scale: state is K·V rows per level (landmarks bound it like g28);
    * each forward round is one shuffle keyed by the frontier vertex
    * against the capped edge relation, each backward round one join
    * down-level plus one bounded left join; lineage cut per level.
    */
  def g31LandmarkBetweenness(s: SparkSession, dir: String): DataFrame =
    betweennessOn(CoGraph.cappedEdges(s, dir))

  /** g31b — [[g31LandmarkBetweenness]] over the fan-out-capped MUTUAL
    * edge relation ([[NeighborAgg.fanoutUnd]] symmetrized back to both
    * orientations — max degree ≤ FanOut by construction): the
    * production arm. g31's per-round frontier join is bounded by the
    * bucket-cap ceiling, but its fan-out per vertex is still the capped
    * relation's degree (up to buckets·cap for a user active in every
    * hour); under the fan-out cap each BFS round is ≤ K·V·FanOut rows
    * a priori — the g20b/g30b discipline applied to the BFS family.
    */
  def g31bBetweennessFanout(s: SparkSession, dir: String): DataFrame = {
    val und = NeighborAgg.fanoutUnd(s, dir)
    betweennessOn(und.unionAll(
      und.select(col("dst").as("src"), col("src").as("dst"))))
  }

  private def betweennessOn(edges0: DataFrame): DataFrame = {
    val edges = edges0.repartition(col("src")).tracked
    val verts = endpointVertices(edges)
    val landmarks = verts.orderBy("id").limit(LandmarkK)
    // forward: level-synchronous BFS with integer path counting.
    // levels(k) = (lm, id, sigma): vertices FIRST reached at depth k,
    // with their shortest-path count from lm. The anti-join against the
    // running (lm, id) visited set is what makes "first reached" exact.
    var levels = Vector(landmarks.select(col("id").as("lm"),
      col("id").as("id"), lit(1L).as("sigma")))
    var seen = levels(0).select("lm", "id")
    for (_ <- 1 to LandmarkHops) {
      val nxt = levels.last.alias("l")
        .join(edges.alias("e"), col("l.id") === col("e.src"))
        .select(col("l.lm").as("lm"), col("e.dst").as("id"),
          col("l.sigma").as("sigma"))
        .join(seen, Seq("lm", "id"), "left_anti")
        .groupBy("lm", "id").agg(sum(col("sigma")).as("sigma"))
        .transform(graft.Cut.cut)
      levels :+= nxt
      seen = seen.unionAll(nxt.select("lm", "id")).transform(graft.Cut.cut)
    }
    // backward: dependency accumulation. The horizon level's delta is 0
    // (no successors within the hop bound — the standard truncation of
    // sampled Brandes); each level k then pulls from level k+1 through
    // the edge relation: pred(w) ∩ level k = {v : v→w, d(v) = d(w)−1}.
    var down = levels(LandmarkHops)
      .select(col("lm"), col("id"), col("sigma"), lit(0.0).as("delta"))
    val deltaLevels = ArrayBuffer[DataFrame]()
    for (k <- (LandmarkHops - 1) to 1 by -1) {
      val dep = levels(k).alias("v")
        .join(edges.alias("e"), col("v.id") === col("e.src"))
        .join(down.alias("w"),
          col("v.lm") === col("w.lm") && col("e.dst") === col("w.id"))
        .groupBy(col("v.lm").as("lm"), col("v.id").as("id"))
        .agg(sum((col("v.sigma").cast("double") / col("w.sigma").cast("double")
          * (lit(1.0) + col("w.delta"))).cast("decimal(38,12)"))
          .cast("double").as("dep"))
      down = levels(k)
        .join(dep, Seq("lm", "id"), "left_outer")
        .select(col("lm"), col("id"), col("sigma"),
          coalesce(col("dep"), lit(0.0)).as("delta"))
        .transform(graft.Cut.cut)
      deltaLevels += down
    }
    val bc = deltaLevels.reduce(_.unionAll(_))
      .groupBy("id")
      .agg(sum(col("delta").cast("decimal(38,12)")).cast("double").as("bc"))
    val sig = levels.tail.reduce(_.unionAll(_))
      .groupBy("id").agg(sum(col("sigma")).as("paths"))
    verts.alias("v")
      .join(sig.alias("s"), col("v.id") === col("s.id"), "left_outer")
      .join(bc.alias("b"), col("v.id") === col("b.id"), "left_outer")
      .select(col("v.id").as("id"),
        coalesce(col("s.paths"), lit(0L)).as("paths_from_landmarks"),
        graft.operators.Det.r(coalesce(col("b.bc"), lit(0.0)), 6)
          .as("betweenness"))
      .orderBy(col("betweenness").desc, col("id"))
  }

  /** DuckDB mirror of the hop-bounded Brandes chain — unrolled lev/del
    * CTEs over a `baseCtes` that must end in a both-orientations
    * `edges(src, dst)` relation. Every level is `AS MATERIALIZED`
    * (each is referenced 3–4 times; see the k-truss mirror's fd note)
    * and every float aggregate mirrors the engine's decimal-snap
    * op-for-op.
    */
  private def betweennessSql(baseCtes: String): String = {
    val H = LandmarkHops
    val fwd = (1 to H).map { k =>
      val excl = (0 until k).map(j =>
        s"NOT EXISTS (SELECT 1 FROM lev$j p$j " +
          s"WHERE p$j.lm = l.lm AND p$j.id = e.dst)").mkString("\n    AND ")
      s"""lev$k AS MATERIALIZED (
         |  SELECT l.lm, e.dst AS id, sum(l.sigma) AS sigma
         |  FROM lev${k - 1} l JOIN edges e ON l.id = e.src
         |  WHERE $excl
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val bwd = ((H - 1) to 1 by -1).map { k =>
      s"""dep$k AS MATERIALIZED (
         |  SELECT v.lm, v.id,
         |    CAST(sum(CAST(CAST(v.sigma AS DOUBLE) / CAST(w.sigma AS DOUBLE)
         |      * (1.0 + w.delta) AS DECIMAL(38,12))) AS DOUBLE) AS dep
         |  FROM lev$k v
         |  JOIN edges e ON v.id = e.src
         |  JOIN del${k + 1} w ON w.lm = v.lm AND w.id = e.dst
         |  GROUP BY 1, 2),
         |del$k AS MATERIALIZED (
         |  SELECT l.lm, l.id, l.sigma,
         |         coalesce(d.dep, CAST(0 AS DOUBLE)) AS delta
         |  FROM lev$k l LEFT JOIN dep$k d ON d.lm = l.lm AND d.id = l.id)"""
        .stripMargin
    }.mkString(",\n")
    val delUnion = (1 to (H - 1))
      .map(k => s"SELECT id, delta FROM del$k").mkString(" UNION ALL ")
    val sigUnion = (1 to H)
      .map(k => s"SELECT id, sigma FROM lev$k").mkString(" UNION ALL ")
    s"""WITH $baseCtes,
       |verts AS (SELECT DISTINCT src AS id FROM edges),
       |landmarks AS (SELECT id FROM verts ORDER BY id LIMIT $LandmarkK),
       |lev0 AS MATERIALIZED (
       |  SELECT id AS lm, id, CAST(1 AS BIGINT) AS sigma FROM landmarks),
       |$fwd,
       |del$H AS MATERIALIZED (
       |  SELECT lm, id, sigma, CAST(0 AS DOUBLE) AS delta FROM lev$H),
       |$bwd,
       |bc AS (
       |  SELECT id, CAST(sum(CAST(delta AS DECIMAL(38,12))) AS DOUBLE) AS bc
       |  FROM ($delUnion) GROUP BY 1),
       |sig AS (
       |  SELECT id, sum(sigma) AS paths FROM ($sigUnion) GROUP BY 1)
       |SELECT v.id,
       |  CAST(coalesce(s.paths, 0) AS BIGINT) AS paths_from_landmarks,
       |  ${graft.operators.Det.sqlR("coalesce(b.bc, CAST(0 AS DOUBLE))", 6)}
       |    AS betweenness
       |FROM verts v
       |LEFT JOIN sig s ON s.id = v.id
       |LEFT JOIN bc b ON b.id = v.id
       |ORDER BY betweenness DESC, v.id""".stripMargin
  }

  val g31Sql: String = betweennessSql(CoGraph.cappedEdgesCte())

  /** g31b's mirror — the fan-out-capped mutual relation symmetrized
    * back to both orientations, then the identical Brandes chain. */
  val g31bSql: String = betweennessSql(
    s"""${NeighborAgg.fanoutUndCte},
       |edges AS (SELECT src, dst FROM und
       |          UNION ALL SELECT dst AS src, src AS dst FROM und)"""
      .stripMargin)
}
