package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Regression fixture for the round-6 self-review catch: c09's df-cap
  * must be computed over the FULL corpus (d02's universe), not the
  * canonical corpus, or a d02-verified near-dup pair can miss the
  * cluster closure and straddle train/test.
  *
  * The plant realizes the exact failure mode: a boilerplate shingle H
  * ("x y z") occurs in 67 full-corpus docs (> MaxShingleDf = 64: 33
  * padding texts × 2 verbatim replicas + doc a) but only 34 canonical
  * docs (≤ 64). Docs a and b share exactly 7 shingles; WITHOUT H
  * (full-corpus cap, what d02 computes) their Jaccard is 7/14 = 0.5 —
  * a verified pair — while WITH H in a's set (canonical-corpus cap,
  * the pre-fix pair universe) it is 7/15 ≈ 0.467 — no pair, separate
  * clusters, potential leakage.
  */
class C09CapUniverseSpec extends AnyFunSuite with SparkTestSession {

  private lazy val dir: String = {
    val d = java.nio.file.Files
      .createTempDirectory("c09capuniverse").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    // 33 distinct padding texts, each ending in the hot shingle "x y z"
    // and each verbatim-replicated once → H's full-corpus df = 66 (+1
    // from doc a = 67 > 64); canonical df = 33 (+1 = 34 ≤ 64). The
    // padding bodies are unique words, so ONLY H is boilerplate.
    val padding = (0 until 33).flatMap { i =>
      val text = s"pad${i}a pad${i}b pad${i}c x y z"
      Seq(Row(100L + 2 * i, text, "en", "s0", text.length.toLong),
        Row(101L + 2 * i, text, "en", "s0", text.length.toLong))
    }
    // b: w1..w9 w10 → 8 shingles, 7 shared with a
    val b = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    // a: w1..w9 c1..c4 x y z → the 7 shared + 6 unique + H
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 c1 c2 c3 c4 x y z"
    val docs = padding ++ Seq(
      Row(1L, a, "en", "s1", a.length.toLong),
      Row(2L, b, "en", "s1", b.length.toLong))
    spark.createDataFrame(spark.sparkContext.parallelize(docs, 2), schema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("d02 verifies the planted pair at exactly the 0.5 boundary") {
    val pairs = Dedup.d02NgramJaccardPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0.5),
      s"plant must produce the boundary pair: ${pairs.mkString(",")}")
    // the plant DISCRIMINATES: under the canonical-corpus cap (d08's own
    // universe — c09's pre-fix pair source) H survives the cap, a's set
    // grows, and the same pair computes 7/15 < 0.5 — no pair. If this
    // assertion ever fails the fixture has stopped exercising the fix.
    val canonPairs = Dedup.d08NeardupAfterDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(!canonPairs.contains((1L, 2L)),
      s"canonical-universe cap must MISS the boundary pair: ${canonPairs.mkString(",")}")
  }

  test("c09 clusters the pair the canonical-universe cap would have split") {
    val split = Dedup.c09LeakageSafeSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // the invariant the fix makes structural: the d02-verified pair
    // shares a cluster (and therefore a split) BY CONSTRUCTION
    assert(split(1L)._1 == split(2L)._1,
      s"pair (1,2) must share a cluster: ${split(1L)} vs ${split(2L)}")
    assert(split(1L)._2 == split(2L)._2)
    // and the replicas of each padding text share their cluster too
    (0 until 33).foreach { i =>
      assert(split(100L + 2 * i) == split(101L + 2 * i),
        s"replica pair $i must share cluster+split")
    }
  }
}
