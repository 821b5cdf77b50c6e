package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 operator: d05c capped embedding near-dup — d05b's LSH verify
  * plus d09's vector canonicalization and mm04b's per-bucket member cap.
  * Contracts: (1) with a non-binding cap on the duplicate-free corpus it
  * IS d05b; (2) verbatim replica floods change nothing (canonicalization
  * absorbs them before bucketing); (3) a single overfull bucket of
  * distinct vectors is bounded at C(cap,2) pairs over the cap smallest
  * ids — the a-priori bound d05b lacks (measured 58× cost for 10× data
  * at the sf1 scale-up, vs d05's all-pairs 90×).
  */
class Round8OpsSpec extends AnyFunSuite with SparkTestSession {
  import org.apache.spark.sql.DataFrame

  private def embDim(emb: DataFrame): Int =
    emb.agg(max(size(col("embedding")))).head().getInt(0)

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2))).toSet

  test("d05c == d05b when the cap cannot bind and the corpus has no duplicate vectors (sf0.001)") {
    val emb = Tables.embeddings(spark, Sf)
    // precondition of the equality: canonicalization must be the identity
    assert(emb.count() == emb.select("embedding").distinct().count(),
      "fixture drifted: sf0.001 embeddings now contain duplicate vectors")
    val capped = operators.Similarity.d05cOn(emb, embDim(emb), cap = 1 << 20)
    val d05b = operators.Similarity.d05bEmbeddingNeardupLsh(spark, Sf)
    assert(pairSet(capped) == pairSet(d05b))
  }

  test("d05c is invariant under a 70x verbatim replica flood — canonicalization absorbs it before bucketing") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, Sf).select("vec_id", "embedding")
    val (minId, vec) = emb.orderBy("vec_id")
      .as[(Long, Array[Float])].head()
    val replicas = (1 to 70).map(i => (1000000L + i, vec)).toDF(
      "vec_id", "embedding")
    val d = embDim(emb)
    val base = operators.Similarity.d05cOn(emb, d)
    val flooded = operators.Similarity.d05cOn(emb.union(replicas), d)
    // min vec_id wins the canonical group, so every replica id vanishes
    // and the output is EXACTLY the un-flooded one (d05b by contrast
    // would add 70·(70-1)/2 + 70·|neighbors(minId)| pairs here)
    assert(pairSet(flooded) == pairSet(base))
    assert(minId < 1000000L)
  }

  test("d05c bounds one overfull bucket at C(cap,2) pairs over the cap smallest ids") {
    import spark.implicits._
    // 200 DISTINCT vectors on one ray: scaling never flips a hyperplane
    // sign, so all 200 share their (t, bk) in every table, and every
    // pairwise cosine is 1.0 — the adversarial bucket d05b has no answer
    // to (it would emit all 19900 pairs)
    val base = Array(1.0f, 2.0f, 3.0f, 4.0f)
    val ray = (1 to 200).map(i => (i.toLong, base.map(_ * i))).toDF(
      "vec_id", "embedding")
    val out = operators.Similarity.d05cOn(ray, 4)
    val cap = operators.Similarity.EmbBucketCap
    assert(out.count() == cap.toLong * (cap - 1) / 2,
      s"expected C($cap,2) pairs")
    assert(out.agg(max(col("id_b"))).head().getLong(0) == cap.toLong,
      "survivors must be the cap smallest vec_ids")
  }
}
