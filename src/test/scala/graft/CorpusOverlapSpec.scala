package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** c15/c15b — cross-corpus overlap accounting: the exact arm's grid
  * semantics, the KMV arm's estimate quality against it (the bounds the
  * scaladoc pins), and the sketch's structural state bound.
  */
class CorpusOverlapSpec extends AnyFunSuite with SparkTestSession {

  private lazy val exact = Corpus.c15CorpusOverlap(spark, SfMid).collect()
  private lazy val est = Corpus.c15bCorpusOverlapKmv(spark, SfMid).collect()

  test("c15 emits the FULL source-pair grid, zero-overlap pairs included") {
    val sources = exact.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct
    assert(exact.length == sources.length * (sources.length - 1) / 2)
    // grid ordering + orientation: every pair once, source_a < source_b
    exact.foreach(r => assert(r.getString(0) < r.getString(1)))
  }

  test("c15 jaccard is consistent with its own counts") {
    exact.foreach { r =>
      val (na, nb, ov) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val j = ov.toDouble / (na + nb - ov)
      assert(math.abs(r.getDouble(5) - j) <= 5e-5)
    }
  }

  test("c15b KMV estimates track c15 exact within the pinned bounds") {
    val ex = exact.map(r => ((r.getString(0), r.getString(1)),
      (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(est.length == ex.size, "sketch arm must cover the same pair grid")
    est.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val (na, nb, ov) = ex(key)
      val union = na + nb - ov
      val jExact = ov.toDouble / union
      assert(math.abs(r.getDouble(4) - jExact) <= 0.03,
        s"$key jaccard_est ${r.getDouble(4)} vs exact $jExact")
      assert(math.abs(r.getLong(3) - union).toDouble / union <= 0.25,
        s"$key union_est ${r.getLong(3)} vs exact $union")
      assert(math.abs(r.getLong(5) - ov) <= 0.035 * union,
        s"$key overlap_est ${r.getLong(5)} vs exact $ov (union $union)")
    }
  }

  test("c15b sketch state is bounded: m <= k, and the bottom-k runs " +
      "through the native partial top-k (no per-source full sort)") {
    est.foreach(r => assert(r.getLong(2) <= Corpus.KmvK.toLong))
    val plan = Corpus.c15bCorpusOverlapKmv(spark, SfMid)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("RankTopK"),
      "per-source bottom-k must be the GroupedTopK partial pass")
  }
}
