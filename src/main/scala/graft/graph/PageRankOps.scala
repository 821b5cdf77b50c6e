package graft.graph

import graft.Caches.Tracked
import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** G6/G7 — PageRank (reference `notebooks/4_graphx.ipynb:836-908`,
  * SURVEY §2.10 G6).
  *
  * The reference hand-rolls PageRank as a driver-side loop of
  * join→aggregate→left-join→project with amount-normalized edge weights:
  * `PR_new = (1-α)·Σ(PR_src·w) + α/N`, α = 0.15, 5 iterations, dangling
  * vertices kept at the α/N floor via left_outer + coalesce(0)
  * (`4_graphx.ipynb:873-882`). That formulation is deterministic and
  * oracle-checkable, so it is the primary implementation here;
  * GraphX's `staticPageRank` is offered alongside ([[graphxPageRank]])
  * but is NOT numerically identical (out-degree normalization, different
  * dangling-mass handling — SURVEY §2.10).
  *
  * Scale: each iteration is one shuffle (contributions keyed by dst) +
  * one join against the statically-partitioned vertex/weight caches. Each
  * iteration ends in an EAGER `localCheckpoint`: materialize + truncate
  * lineage in one job (without lineage cuts the plan doubles per iteration
  * and the optimizer chokes long before the cluster does — the reference
  * hits the same issue and caches per iteration, SURVEY §3.4). Superseded
  * checkpoint blocks are freed by the ContextCleaner as the old RDDs are
  * GC'd, so memory is bounded by GC cadence. The cut routes through
  * [[graft.Cut.cut]]: set `spark.graft.reliableCheckpointDir` and every
  * iteration checkpoints to SHARED storage instead — the executor-loss
  * switch, drilled end-to-end by [[graft.FaultDrill]] (kill an executor
  * mid-loop, digest-identical result).
  *
  * Round-3 profile at sf0.1/local[32] (total ≈ 3.6-4.3 s vs the
  * reference's 22.5 s): vertices 0.3 s, weight build 1.3 s (the events
  * self-join), ~0.4 s per iteration — fixed job-scheduling cost of the
  * eager checkpoint at 32 partitions, not data volume. Checkpoint cadence
  * was measured (every-1 vs every-2 vs end-only): no wall-clock change at
  * this scale, so the safest lineage story (every iteration) stays.
  */
object PageRankOps {
  val Alpha = 0.15
  val Iterations = 5

  /** The deterministic DataFrame loop. Returns (id, pagerank) unrounded. */
  def pageRankLoop(s: SparkSession, dir: String,
      iterations: Int = Iterations): DataFrame =
    // hash-partition the (static) weight table on the join key ONCE: the
    // cached partitioning satisfies the join's distribution requirement in
    // every iteration, so only the rank side shuffles per step.
    pageRankLoopWith(s, dir, iterations,
      CoGraph.normalizedWeights(s, dir).repartition(col("src")).tracked)

  /** Loop over a CALLER-supplied pre-partitioned, cached weight table —
    * for callers that also need the edge set themselves (g11), so the
    * weight build (the most expensive stage of the whole query, ~1.3 s of
    * g06's 3.6 s at sf0.1) runs once, not twice.
    */
  def pageRankLoopWith(s: SparkSession, dir: String,
      iterations: Int, w: DataFrame): DataFrame = {
    // hash-partition the (static) vertex set on the join key once, like the
    // weight table — each iteration's dangling left-join then reuses
    // the cached distribution instead of re-shuffling vertices.
    val vertices = Components.vertices(s, dir)
      .repartition(col("id")).tracked
    val n = vertices.count()
    var pr = vertices.withColumn("pagerank", lit(1.0 / n))
    for (i <- 1 to iterations) {
      // `pr` derives from `w` after iteration 1, so qualify both sides
      // explicitly — Spark's ambiguous-self-join check rejects the bare
      // column references otherwise.
      val contribs = pr.alias("p").join(w.alias("w"),
          col("p.id") === col("w.src"))
        .select(col("w.dst").as("id"),
          (col("p.pagerank") * col("w.weight")).as("contrib"))
        .groupBy(col("id"))
        .agg(sum(col("contrib")).as("sum_contribution"))
      val next = vertices.join(contribs, Seq("id"), "left_outer")
        .select(col("id"),
          (lit(1.0 - Alpha) * coalesce(col("sum_contribution"), lit(0.0))
            + lit(Alpha / n)).as("pagerank"))
      pr = graft.Cut.cut(next) // see object doc for the memory story
    }
    pr
  }

  /** g06 query — PR scores rounded to 10 dp (float-drift-proof vs the
    * unrolled DuckDB oracle), ordered by id.
    */
  def q(s: SparkSession, dir: String): DataFrame =
    pageRankLoop(s, dir)
      .select(col("id"), round(col("pagerank"), 10).as("pagerank"))
      .orderBy(col("id"))

  /** g06b — g06 on the bucket-capped edge build
    * ([[CoGraph.cappedNormalizedWeights]]): the g-family's scale twin.
    * The loop, vertex set, damping, and dangling handling are IDENTICAL
    * to g06 — only the weight build caps each hour bucket at `cap`
    * smallest co-active users (g22's proven GroupedTopK guard) before
    * its self-join, so per-iteration cost is bounded by buckets·cap²
    * edges a priori. Where no bucket exceeds `cap`, g06b ≡ g06
    * bit-for-bit (Round9OpsSpec pins it; true at every gate SF). The sf1
    * scale-up is the motivating case: its replication densifies buckets
    * to 450 users (edge set ×103, the entire g-family sf1 slope), which
    * the cap turns back into a linear scan + bounded join.
    */
  def cappedQ(s: SparkSession, dir: String,
      cap: Int = NeighborAgg.BucketCap): DataFrame =
    pageRankLoopWith(s, dir, Iterations,
      CoGraph.cappedNormalizedWeights(s, dir, cap)
        .repartition(col("src")).tracked)
      .select(col("id"), round(col("pagerank"), 10).as("pagerank"))
      .orderBy(col("id"))

  /** g07 — rank analytics (`4_graphx.ipynb:1059-1104`): top-10 by PR. */
  def topQ(s: SparkSession, dir: String): DataFrame =
    pageRankLoop(s, dir)
      .select(col("id"), round(col("pagerank"), 10).as("pagerank"))
      .orderBy(col("pagerank").desc, col("id"))
      .limit(10)

  /** Unrolled DuckDB oracle: pr0..prN as chained CTEs over the weight CTE
    * (DuckDB's recursive CTEs can't aggregate over the recursive
    * reference, so the fixed iteration count is unrolled — it IS fixed in
    * the reference too).
    */
  private def prCtes(iterations: Int,
      weightsCte: String = CoGraph.weightsCte): String = {
    val n = "(SELECT count(*) FROM vertices)"
    val levels = (1 to iterations).map { k =>
      s"""pr$k AS (
         |  SELECT v.id,
         |         0.85 * coalesce(c.contrib, 0) + 0.15 / $n AS pagerank
         |  FROM vertices v LEFT JOIN (
         |    SELECT w.dst AS id, sum(p.pagerank * w.weight) AS contrib
         |    FROM pr${k - 1} p JOIN weights w ON p.id = w.src
         |    GROUP BY 1) c ON v.id = c.id)""".stripMargin
    }
    s"""$weightsCte,
       |vertices AS (SELECT DISTINCT user_id AS id FROM events),
       |pr0 AS (SELECT id, 1.0 / $n AS pagerank FROM vertices),
       |${levels.mkString(",\n")}""".stripMargin
  }

  def qSql(iterations: Int = Iterations): String =
    s"""WITH ${prCtes(iterations)}
       |SELECT id, round(pagerank, 10) AS pagerank
       |FROM pr$iterations ORDER BY id""".stripMargin

  /** [[cappedQ]]'s oracle: identical unrolled loop over the capped
    * weights mirror.
    */
  def cappedQSql(iterations: Int = Iterations): String =
    s"""WITH ${prCtes(iterations, CoGraph.cappedWeightsCte())}
       |SELECT id, round(pagerank, 10) AS pagerank
       |FROM pr$iterations ORDER BY id""".stripMargin

  def topQSql(iterations: Int = Iterations): String =
    s"""WITH ${prCtes(iterations)}
       |SELECT id, round(pagerank, 10) AS pagerank
       |FROM pr$iterations ORDER BY pagerank DESC, id LIMIT 10""".stripMargin

  /** "Confirmed fraud" threshold: error-event count at/above this marks a
    * confirmed offender; below it (but in the graph) is mule territory.
    */
  val ConfirmedErrT = 13

  /** THE confirmed-offender seed set — single definition shared by mules
    * (exclusion), fraudDistance (BFS seeds) and personalized PageRank
    * (teleport targets), with [[confirmedSeedsSql]] as its one SQL mirror.
    */
  def confirmedOffenders(s: SparkSession, dir: String): DataFrame =
    graft.Tables.events(s, dir)
      .filter(col("event_type") === "error")
      .groupBy(col("user_id").as("id"))
      .agg(count(lit(1)).as("n_err"))
      .filter(col("n_err") >= ConfirmedErrT)
      .select("id")

  /** DuckDB fragment: the seed-set subquery body (`SELECT … id`). */
  val confirmedSeedsSql: String =
    s"""SELECT user_id AS id FROM events
       |          WHERE event_type = 'error'
       |          GROUP BY 1 HAVING count(*) >= $ConfirmedErrT""".stripMargin

  /** g11 — "mules" (reference `4_graphx.ipynb:1059-1104`, SURVEY §2.10 G7):
    * entities connected to the fraud graph but BELOW the confirmed-offender
    * threshold, ranked by PageRank — high centrality without heavy direct
    * activity is the money-mule heuristic. (Exclusion must use a DIFFERENT
    * signal than edge construction: excluding every error-event user — the
    * graph's entire vertex support — would leave only the α/N floor and an
    * id sort. The threshold split keeps the centrality ranking meaningful.)
    */
  def mules(s: SparkSession, dir: String): DataFrame = {
    val confirmed = confirmedOffenders(s, dir)
    // In-graph membership is STRUCTURAL — a semi-join against the edge
    // set's distinct sources (the directed edge set carries both
    // orientations, so src ∪ dst = src) — not an epsilon over the α/N
    // PageRank floor, which would silently break the moment α, N, or
    // iteration count changes. The ONE cached weight table feeds both the
    // membership set and the PR loop (rebuilding it is g06's single most
    // expensive stage).
    val w = CoGraph.normalizedWeights(s, dir)
      .repartition(col("src")).tracked
    val inGraph = w.select(col("src").as("id")).distinct()
    pageRankLoopWith(s, dir, Iterations, w)
      .join(inGraph, Seq("id"), "left_semi")
      .join(confirmed, Seq("id"), "left_anti")
      .select(col("id"), round(col("pagerank"), 10).as("pagerank"))
      .orderBy(col("pagerank").desc, col("id"))
      .limit(10)
  }

  def mulesSql(iterations: Int = Iterations): String =
    s"""WITH ${prCtes(iterations)}
       |SELECT id, round(pagerank, 10) AS pagerank
       |FROM pr$iterations
       |WHERE id IN (SELECT DISTINCT src FROM edge_amount)
       |  AND id NOT IN ($confirmedSeedsSql)
       |ORDER BY pagerank DESC, id LIMIT 10""".stripMargin

  /** Result size for [[personalizedPageRank]]. */
  val PprTopK = 20

  /** g16 — PERSONALIZED PageRank from the confirmed-offender seed set:
    * the teleport lands only on seeds (α/|S| each, zero elsewhere), so a
    * vertex's score is its stationary probability of a random walk that
    * always restarts AT KNOWN FRAUD — "guilt by association", the ranking
    * a fraud analyst wants where global PageRank measures mere
    * centrality. Complements g13's hop distance with a weighted,
    * decay-aware version of the same question.
    *
    * Same deterministic loop shape as g06 (one shuffle per iteration
    * against the cached pre-partitioned weight table, eager
    * `localCheckpoint` lineage cuts), with two differences: the reset
    * vector is a COLUMN of the cached vertex frame (not a global
    * constant), and |S| arrives by broadcasting the 1-row seed count —
    * no driver collect. Unreached vertices stay at exactly 0.0 and are
    * filtered; output is the top-[[PprTopK]].
    */
  def personalizedPageRank(s: SparkSession, dir: String,
      iterations: Int = Iterations): DataFrame =
    pprOn(s, dir, iterations,
      CoGraph.normalizedWeights(s, dir).repartition(col("src")).tracked)

  /** g16b — g16 on the bucket-capped edge build: same twin relation as
    * [[cappedQ]]/g06b (identical loop, seeds, reset mass, and top-k; only
    * the weight build caps storm buckets via GroupedTopK), closing the
    * LAST member of the iterative family still bound to the uncapped sf1
    * edge densification. Equal to g16 bit-for-bit where no bucket
    * exceeds the cap — every gate SF (Round9OpsSpec).
    */
  def g16bCappedPpr(s: SparkSession, dir: String,
      cap: Int = NeighborAgg.BucketCap): DataFrame =
    pprOn(s, dir, Iterations,
      CoGraph.cappedNormalizedWeights(s, dir, cap)
        .repartition(col("src")).tracked)

  private def pprOn(s: SparkSession, dir: String,
      iterations: Int, w: DataFrame): DataFrame = {
    val seeds = confirmedOffenders(s, dir)
    val nSeeds = seeds.agg(count(lit(1)).as("ns"))
    // (id, reset, pr0): reset = α/|S| on seeds else 0 — cached once,
    // partitioned on the join key like g06's vertex frame
    val base = Components.vertices(s, dir)
      .join(seeds.withColumn("is_seed", lit(1)), Seq("id"), "left_outer")
      .crossJoin(broadcast(nSeeds))
      .select(col("id"),
        when(col("is_seed").isNotNull, lit(Alpha) / col("ns"))
          .otherwise(lit(0.0)).as("reset"),
        when(col("is_seed").isNotNull, lit(1.0) / col("ns"))
          .otherwise(lit(0.0)).as("pagerank"))
      .repartition(col("id")).tracked
    var pr = base.select(col("id"), col("pagerank"))
    for (_ <- 1 to iterations) {
      val contribs = pr.alias("p").join(w.alias("w"),
          col("p.id") === col("w.src"))
        .select(col("w.dst").as("id"),
          (col("p.pagerank") * col("w.weight")).as("contrib"))
        .groupBy(col("id"))
        .agg(sum(col("contrib")).as("sum_contribution"))
      pr = base.join(contribs, Seq("id"), "left_outer")
        .select(col("id"),
          (lit(1.0 - Alpha) * coalesce(col("sum_contribution"), lit(0.0))
            + col("reset")).as("pagerank"))
        .transform(graft.Cut.cut)
    }
    pr.filter(col("pagerank") > 0)
      .select(col("id"), round(col("pagerank"), 10).as("pagerank"))
      .orderBy(col("pagerank").desc, col("id"))
      .limit(PprTopK)
  }

  def pprSql(iterations: Int = Iterations,
      weightsCte: String = CoGraph.weightsCte): String = {
    val ns = "(SELECT count(*) FROM seeds)"
    val levels = (1 to iterations).map { k =>
      s"""ppr$k AS (
         |  SELECT b.id,
         |         0.85 * coalesce(c.contrib, 0) + b.reset AS pagerank
         |  FROM base b LEFT JOIN (
         |    SELECT w.dst AS id, sum(p.pagerank * w.weight) AS contrib
         |    FROM ppr${k - 1} p JOIN weights w ON p.id = w.src
         |    GROUP BY 1) c ON b.id = c.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $weightsCte,
       |vertices AS (SELECT DISTINCT user_id AS id FROM events),
       |seeds AS ($confirmedSeedsSql),
       |base AS (
       |  SELECT v.id,
       |    CASE WHEN s.id IS NOT NULL THEN 0.15 / $ns ELSE 0.0 END AS reset,
       |    CASE WHEN s.id IS NOT NULL THEN 1.0 / $ns ELSE 0.0 END AS pagerank
       |  FROM vertices v LEFT JOIN seeds s ON v.id = s.id),
       |ppr0 AS (SELECT id, pagerank FROM base),
       |$levels
       |SELECT id, round(pagerank, 10) AS pagerank
       |FROM ppr$iterations WHERE pagerank > 0
       |ORDER BY pagerank DESC, id LIMIT $PprTopK""".stripMargin
  }

  /** The idiomatic GraphX alternative (`staticPageRank`) — top-50 by
    * score, rounded to 10 dp like g06/g07 so the unrolled SQL oracle's
    * float-order drift is absorbed. Numerically DIFFERENT from g06 by
    * design (out-degree normalization instead of amount weights, init
    * rank 1.0 instead of 1/N, final sink-mass rescale), which is exactly
    * why it gets its own oracle: [[graphxSql]] mirrors the public GraphX
    * `PageRank.runWithOptions` op-for-op — edge weight `1/outDegree(src)`
    * (`mapTriplets(1.0 / e.srcAttr)`), per-iteration
    * `α + (1−α)·Σ incoming`, and the SPARK-18847 `normalizeRankSum`
    * correction (global rescale so ranks sum to |V|, compensating mass
    * lost to sink vertices).
    */
  def graphxPageRank(s: SparkSession, dir: String): DataFrame =
    graphxOn(s, dir, CoGraph.edges(s, dir))

  /** g08b — GraphX `staticPageRank` over the bucket-capped edge set
    * ([[CoGraph.cappedEdges]]): the native-GraphX member of the capped
    * iterative family (g06b/g16b's sibling). Same Pregel loop, vertex
    * universe, damping, and rescale — only the edge build caps storm
    * buckets, so edge-partition sizes are bounded a priori. Equal to g08
    * bit-for-bit where no bucket exceeds the cap (every gate SF,
    * Round9OpsSpec).
    */
  def g08bCappedGraphxPageRank(s: SparkSession, dir: String,
      cap: Int = NeighborAgg.BucketCap): DataFrame =
    graphxOn(s, dir, CoGraph.cappedEdges(s, dir, cap))

  private def graphxOn(s: SparkSession, dir: String,
      edges: DataFrame): DataFrame = {
    val session = s
    import session.implicits._
    val edgeRdd = edges
      .select(col("src"), col("dst")).as[(Long, Long)]
      .rdd.map { case (a, b) => Edge(a: VertexId, b: VertexId, 1.0) }
    val vtxRdd = Components.vertices(s, dir)
      .select(col("id")).as[Long].rdd.map(id => (id, 1.0))
    val g = Graph(vtxRdd, edgeRdd)
    g.staticPageRank(Iterations, Alpha).vertices
      .toDF("id", "pagerank")
      .select(col("id"), round(col("pagerank"), 10).as("pagerank"))
      .orderBy(col("pagerank").desc, col("id"))
      .limit(50)
  }

  /** g08's unrolled DuckDB oracle — GraphX `staticPageRank` semantics
    * transcribed from the public Spark source (graphx/lib/PageRank.scala,
    * verified against the 4.1.2 bytecode): out-degree-normalized weights,
    * rank₀ = 1.0 everywhere, rankₖ = α + (1−α)·Σ(rankₖ₋₁/outdeg) over
    * in-edges, then one global rescale to make Σrank = |V|.
    */
  def graphxSql(iterations: Int = Iterations,
      edgesCte: String = CoGraph.edgesCte): String = {
    val levels = (1 to iterations).map { k =>
      s"""gpr$k AS (
         |  SELECT v.id, 0.15 + 0.85 * coalesce(c.s, 0) AS pagerank
         |  FROM vertices v LEFT JOIN (
         |    SELECT e.dst AS id, sum(p.pagerank / o.d) AS s
         |    FROM gpr${k - 1} p JOIN edges e ON p.id = e.src
         |    JOIN outdeg o ON o.src = e.src
         |    GROUP BY 1) c ON v.id = c.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgesCte,
       |vertices AS (SELECT DISTINCT user_id AS id FROM events),
       |outdeg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
       |gpr0 AS (SELECT id, 1.0 AS pagerank FROM vertices),
       |$levels,
       |factor AS (SELECT (SELECT count(*) FROM vertices) / sum(pagerank)
       |           AS f FROM gpr$iterations)
       |SELECT id, round(pagerank * f, 10) AS pagerank
       |FROM gpr$iterations CROSS JOIN factor
       |ORDER BY round(pagerank * f, 10) DESC, id LIMIT 50""".stripMargin
  }

  /** Top-k per role for [[g18Hits]]. */
  val HitsTopK = 10

  /** g18 — HITS hub/authority scores (Kleinberg) over the customer →
    * supplier purchase bipartite (distinct `(o_custkey, l_suppkey)` pairs
    * from orders ⋈ lineitem): hubs are customers who buy from many
    * authoritative suppliers; authorities are suppliers bought from by
    * many strong hubs. The mutually-recursive complement of g06/g16's
    * single-score PageRank family — the right lens on BIPARTITE structure,
    * where PageRank's one score conflates the two roles.
    *
    * Two sweeps UNNORMALIZED with unit edge weights and hub₀ = 1, so every
    * score is an INTEGER path count (auth₁ = in-degree, hub₁ = Σ auth₁,
    * auth₂ = Σ hub₁, hub₂ = Σ auth₂): per-iteration normalization only
    * rescales the ranking, and dropping it makes the whole loop exact
    * BIGINT arithmetic — no float summation discipline needed, unlike the
    * PageRank oracles' round(…,10) envelope.
    *
    * Scale: the edge list is cached and pre-partitioned on `src` once;
    * each sweep is two shuffle aggregates over it (the g06 discipline);
    * the per-role top-k plans TakeOrderedAndProject, never a global sort.
    */
  def g18Hits(s: SparkSession, dir: String): DataFrame = {
    val edges = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
      .distinct()
      .repartition(col("src")).tracked
    val auth1 = edges.groupBy(col("dst").as("id"))
      .agg(count(lit(1)).as("a"))
    val hub1 = edges.join(auth1, col("dst") === col("id"))
      .groupBy("src").agg(sum(col("a")).as("h"))
    val auth2 = edges.join(hub1, Seq("src"))
      .groupBy(col("dst").as("id")).agg(sum(col("h")).as("a"))
    val hub2 = edges.join(auth2, col("dst") === col("id"))
      .groupBy("src").agg(sum(col("a")).as("h"))
    val topHubs = hub2
      .select(lit("hub").as("role"), col("src").as("id"),
        col("h").cast("long").as("score"))
      .orderBy(col("score").desc, col("id")).limit(HitsTopK)
    val topAuths = auth2
      .select(lit("authority").as("role"), col("id"),
        col("a").cast("long").as("score"))
      .orderBy(col("score").desc, col("id")).limit(HitsTopK)
    topHubs.unionByName(topAuths)
      .orderBy(col("role"), col("score").desc, col("id"))
  }

  val g18Sql: String =
    s"""WITH edges AS (
       |  SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |auth1 AS (SELECT dst AS id, CAST(count(*) AS BIGINT) AS a
       |          FROM edges GROUP BY 1),
       |hub1 AS (SELECT e.src, CAST(sum(a.a) AS BIGINT) AS h
       |         FROM edges e JOIN auth1 a ON e.dst = a.id GROUP BY 1),
       |auth2 AS (SELECT e.dst AS id, CAST(sum(h.h) AS BIGINT) AS a
       |          FROM edges e JOIN hub1 h ON e.src = h.src GROUP BY 1),
       |hub2 AS (SELECT e.src AS id, CAST(sum(a.a) AS BIGINT) AS h
       |         FROM edges e JOIN auth2 a ON e.dst = a.id GROUP BY 1)
       |SELECT * FROM (
       |  SELECT 'hub' AS role, id, h AS score FROM (
       |    SELECT id, h FROM hub2 ORDER BY h DESC, id LIMIT $HitsTopK)
       |  UNION ALL
       |  SELECT 'authority' AS role, id, a AS score FROM (
       |    SELECT id, a FROM auth2 ORDER BY a DESC, id LIMIT $HitsTopK))
       |ORDER BY role, score DESC, id""".stripMargin
}
