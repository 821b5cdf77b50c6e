package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over the `embeddings` table (`vec_id, embedding:
  * array<float>, label`): brute-force cosine top-k (the exactness baseline),
  * random-hyperplane LSH ANN (the scale path), and embedding-cosine near-dup
  * pairs (the dedup application).
  *
  * Cross-engine float determinism: every dot product is a strict
  * left-to-right fold in DOUBLE (`aggregate` in Spark, `list_reduce` with a
  * prepended 0 in DuckDB 1.0, which has no explicit init). float32 → double
  * widening is exact, and an identical sequence of IEEE-754 double ops gives
  * bit-identical results in both engines; the final cosine is snapped to 6 dp
  * with the shared round-half-up ([[Det.r]]) before any threshold or
  * ordering, so ranking can never diverge on ulps.
  */
object Similarity {
  import TextFn.{r, rSql}

  private val TopK = 5
  private val NearDupT = 0.4 // calibrated: testdata has no pairs above 0.52
  private val NQueries = 10 // vec_id < 10 are the query vectors
  private val LshBits = 4 // hyperplane sign bits → 16 buckets

  /** Sequential-fold dot product of two float arrays, in double — the
    * codegen'd [[graft.functions.VecDot]] expression (bit-identical to the
    * composable HOF spelling `aggregate(zip_with(...))` and to the DuckDB
    * `list_reduce` mirror, ~50× faster on the all-pairs scan: the HOF path
    * interprets one lambda per element).
    */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), " +
      s"(acc, x) -> acc + x)"

  /** vec_id, embedding, norm — norms computed once, reused by every pair. */
  private def withNorm(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))

  private val withNormSql =
    s"""SELECT vec_id, embedding,
       |  sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |FROM embeddings""".stripMargin

  /** v01 — brute-force cosine top-k: for each query vector (vec_id <
    * NQueries), the TopK nearest neighbors by cosine, ranked per query with
    * a window (rounded-cosine desc, then neighbor id — fully deterministic).
    *
    * Scale: |queries| × |corpus| partial products; Spark broadcasts the
    * query side so the corpus scan streams once with no shuffle until the
    * tiny per-query top-k. For a large query side, switch to v02's LSH
    * bucketing. This is the exactness oracle for any ANN variant.
    */
  def v01CosineTopk(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(s, dir)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val pairs = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        r(dot(col("qe"), col("embedding")) / (col("qn") * col("nrm")), 6)
          .as("cosine"))
    pairs
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= TopK)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .orderBy("query_id", "rank")
  }

  private def v01Sql =
    s"""WITH e AS ($withNormSql),
       |q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn
       |      FROM e WHERE vec_id < $NQueries),
       |pairs AS (SELECT q.query_id, e.vec_id AS neighbor_id,
       |    ${rSql(s"${dotSql("q.qe", "e.embedding")} / (q.qn * e.nrm)", 6)} AS cosine
       |  FROM e JOIN q ON e.vec_id <> q.query_id),
       |ranked AS (SELECT query_id, neighbor_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM pairs)
       |SELECT query_id, rank, neighbor_id, cosine
       |FROM ranked WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin

  /** Deterministic pseudo-random hyperplane component w[j][k] ∈ [-1001,1001]
    * from pure integer mixing — identical in both engines, no RNG/libm.
    */
  private def planeSql(j: Int, k: String): String =
    s"((($j * 73856093 + $k * 19349663) % 2003) - 1001)"
  private def plane(j: Int, k: Column): Column =
    (lit(j) * lit(73856093L) + k * lit(19349663L)) % lit(2003L) - lit(1001L)

  /** Sign bit j of an embedding against hyperplane j: fold of w·v. */
  private def signBit(j: Int, e: Column): Column = {
    val proj = aggregate(
      zip_with(e, sequence(lit(1L), size(e).cast("long")),
        (x, k) => x.cast("double") * plane(j, k).cast("double")),
      lit(0.0), (acc, x) => acc + x)
    when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
  }

  private def signBitSql(j: Int, e: String): String = {
    val proj = s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(range(1, len($e) + 1), " +
      s"k -> CAST($e[k] AS DOUBLE) * CAST(${planeSql(j, "k")} AS DOUBLE))), " +
      s"(acc, x) -> acc + x)"
    s"(CASE WHEN $proj >= 0 THEN ${1L << j} ELSE 0 END)"
  }

  /** v02 — LSH-bucketed approximate nearest neighbors: 4 random-hyperplane
    * sign bits → 16 buckets; each query searches only its own bucket, then
    * exact-ranks the candidates. The IVF/LSH shape for 100 TB: the bucket
    * join replaces the all-pairs product with |bucket| candidate streams,
    * and buckets are the partitioning key — co-located, skew-bounded.
    */
  def v02AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(s, dir)
      .withColumn("bucket",
        (0 until LshBits).map(j => signBit(j, col("embedding"))).reduce(_ + _))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("bucket"))
    val cand = e.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("bucket"), col("vec_id").as("neighbor_id"),
        r(dot(col("qe"), col("embedding")) / (col("qn") * col("nrm")), 6)
          .as("cosine"))
    cand
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= TopK)
      .select("query_id", "bucket", "rank", "neighbor_id", "cosine")
      .orderBy("query_id", "rank")
  }

  private def v02Sql = {
    val bucket = (0 until LshBits).map(j => signBitSql(j, "embedding"))
      .mkString(" + ")
    s"""WITH e AS (SELECT vec_id, embedding, nrm, $bucket AS bucket
       |  FROM ($withNormSql)),
       |q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn, bucket
       |      FROM e WHERE vec_id < $NQueries),
       |cand AS (SELECT q.query_id, q.bucket, e.vec_id AS neighbor_id,
       |    ${rSql(s"${dotSql("q.qe", "e.embedding")} / (q.qn * e.nrm)", 6)} AS cosine
       |  FROM e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.query_id),
       |ranked AS (SELECT query_id, bucket, neighbor_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM cand)
       |SELECT query_id, bucket, rank, neighbor_id, cosine
       |FROM ranked WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin
  }

  /** d05 — embedding-cosine near-duplicate pairs: all pairs ≥ threshold.
    * Brute-force half-matrix here (n² on vector COUNT); at 100 TB bucket by
    * v02's hyperplane signature first and verify only within buckets (near-
    * dups at cosine ≥ 0.9 collide with probability ≥ (1−θ/π)^bits).
    */
  def d05EmbeddingNeardup(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(s, dir)
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        r(dot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm")), 6).as("cosine"))
      .filter(col("cosine") >= NearDupT)
      .orderBy("id_a", "id_b")
  }

  private def d05Sql =
    s"""WITH e AS ($withNormSql)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  ${rSql(s"${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm)", 6)} AS cosine
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |WHERE ${rSql(s"${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm)", 6)} >= $NearDupT
       |ORDER BY id_a, id_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v01_cosine_topk" -> (v01CosineTopk _),
    "v02_ann_lsh" -> (v02AnnLsh _),
    "d05_embedding_neardup" -> (d05EmbeddingNeardup _))

  val oracles: Map[String, String] = Map(
    "v01_cosine_topk" -> v01Sql,
    "v02_ann_lsh" -> v02Sql,
    "d05_embedding_neardup" -> d05Sql)
}
