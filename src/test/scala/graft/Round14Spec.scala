package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 pins. */
class Round14Spec extends AnyFunSuite with SparkTestSession {

  /** ADVICE r13: the native fingerprint kernel must match the HOF
    * reference spelling on MALFORMED UTF-8 too (strings cast from binary
    * are the real-world source) — invalid leading bytes, truncated
    * sequences, overlongs, surrogates, out-of-range 4-byte forms. The HOF
    * walks Spark's numBytesForFirstByte steps and folds the first code
    * point of each slice's Java replace-decode; this fuzz (fixed seed,
    * 2000 random byte strings from a malformation-biased pool plus the
    * canonical nasty cases) pins the native kernel to it byte-for-byte.
    */
  test("native char_fingerprint == HOF reference on malformed UTF-8") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pool: Array[Byte] = Array(0x41, 0x42, 0x7F, 0x80, 0x9F, 0xBF,
      0xC0, 0xC1, 0xC2, 0xDF, 0xE0, 0xA0, 0xED, 0xE1, 0xF0, 0x90, 0xF4,
      0x8F, 0xF5, 0xF8, 0xFE, 0xFF, 0x98, 0x80).map(_.toByte)
    val cases: Seq[Array[Byte]] = (1 to 2000).map { _ =>
      Array.fill(rnd.nextInt(12) + 1)(pool(rnd.nextInt(pool.length)))
    } ++ Seq(
      Array(0xF9, 0x41), Array(0xE1, 0x41), Array(0xE1, 0x80),
      Array(0xF0, 0x28, 0x8C, 0x28), Array(0xC2), Array(0xED, 0xA0, 0x80),
      Array(0xF4, 0x90, 0x80, 0x80), Array(0xC0, 0xAF), Array(0x80),
      Array(0xF0, 0x9F, 0x98), Array(0xE2, 0x82),
      Array(0xF0, 0x9F, 0x98, 0x80)).map(_.map(_.toByte))
    val bad = cases.zipWithIndex.map { case (b, i) => (i, b) }
      .toDF("i", "b")
      .select(col("i"),
        operators.TextFn.charFingerprintHof(col("b").cast("string")).as("h"),
        operators.TextFn.charFingerprint(col("b").cast("string")).as("n"))
      .filter(col("h") =!= col("n"))
      .count()
    assert(bad == 0L, s"$bad fingerprint mismatches on malformed UTF-8")
  }
}
