package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 pins.
  *
  * d05e's defining property: the sampled arm IS d05 restricted to pairs
  * whose both members fall in the fixed bottom-K hash sample — the same
  * dot/norm/round/threshold machinery on a subset chosen without looking
  * at the data. That equality is what lets d05e's DuckDB row at sf≥1
  * stand in as the exactness certificate for d05's machinery (d05's own
  * all-pairs mirror is quadratic by definition and times out there).
  */
class Round13Spec extends AnyFunSuite with SparkTestSession {

  private def checkSampledEqualsRestricted(dir: String): Unit = {
    val full = operators.Similarity.queries(
      "d05_embedding_neardup")(spark, dir)
    val sampleIds = Tables.embeddings(spark, dir)
      .orderBy(operators.Det.knuthBucket(col("vec_id"), 1000000000L),
        col("vec_id"))
      .limit(operators.Similarity.NeardupSampleK)
      .select(col("vec_id"))
    val restricted = full
      .join(sampleIds.withColumnRenamed("vec_id", "id_a"), Seq("id_a"))
      .join(sampleIds.withColumnRenamed("vec_id", "id_b"), Seq("id_b"))
      .select("id_a", "id_b", "cosine")
    val sampled = operators.Similarity.queries(
      "d05e_embedding_neardup_sampled")(spark, dir)
      .select("id_a", "id_b", "cosine")
    assert(sampled.exceptAll(restricted).isEmpty
      && restricted.exceptAll(sampled).isEmpty)
    assert(sampled.count() > 0)
  }

  test("d05e == d05 restricted to the hash sample (sf0.001)") {
    checkSampledEqualsRestricted(Sf)
  }

  test("d05e == d05 restricted to the hash sample (sf0.01)") {
    checkSampledEqualsRestricted(SfMid)
  }

  /** The native codegen'd fingerprint kernel must be bit-equal to the HOF
    * reference spelling (the signBit discipline) — on golden strings
    * covering ASCII, BMP multibyte, supplementary-plane code points, and
    * edge shapes, AND on every real document at two SFs.
    */
  test("native char_fingerprint == HOF reference on goldens and testdata") {
    import spark.implicits._
    val goldens = Seq("", "a", "abc", "hello world", "héllo ünïcode ⚡",
      "a😀b", "   spaces   ", "line\nbreak\ttab", "ÿ", "𝕌𝕟𝕚")
    val g = goldens.toDF("text")
      .select(operators.TextFn.charFingerprint(col("text")).as("n"),
        operators.TextFn.charFingerprintHof(col("text")).as("h"))
      .collect()
    g.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    Seq(Sf, SfMid).foreach { dir =>
      val bad = Tables.documents(spark, dir)
        .select(operators.TextFn.charFingerprint(col("text")).as("n"),
          operators.TextFn.charFingerprintHof(col("text")).as("h"))
        .filter(col("n") =!= col("h")).count()
      assert(bad == 0L, s"$dir: $bad fingerprint mismatches")
    }
  }
}
