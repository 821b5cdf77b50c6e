package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins Spark's `xxhash64` (XXH64, seed 42) on golden fixtures that
  * tools/check_oracle.py pins IDENTICALLY for its Python `xxh64` UDF
  * (`_XXH64_GOLDENS` / `_xxh64_selftest`). The d06/d12 --alt oracle
  * spellings hash shingles on the DuckDB side with that UDF; this
  * two-sided pin means engine and oracle can never hash differently
  * without one of the two checks failing. Fixtures cover every XXH64
  * code path: empty input, 1- and 3-byte tails (1-byte loop), the
  * 8+4-byte tail, the ≥32-byte block loop, and multibyte UTF-8.
  */
class XxHashSpec extends AnyFunSuite with SparkTestSession {

  private val goldens = Seq(
    "" -> -7444071767201028348L,
    "a" -> -8582455328737087284L,
    "abc" -> 1423657621850124518L,
    "hello world" -> 7620854247404556961L,
    ("the quick brown fox jumps over the lazy dog repeatedly and then " +
      "some more to exceed 32 bytes") -> -1251745622146509217L,
    "héllo ünïcode ⚡" -> 625037590918019868L)

  test("xxhash64 matches the shared golden fixtures (Python UDF parity)") {
    import spark.implicits._
    val got = goldens.map(_._1).toDF("s")
      .select(xxhash64(col("s"))).as[Long].collect().toSeq
    assert(got === goldens.map(_._2))
  }
}
