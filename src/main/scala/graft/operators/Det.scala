package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic float arithmetic for oracle-checked outputs.
  *
  * The driver's correctness gate compares Spark results against DuckDB by
  * EXACT value hash (SURVEY.md §5, §7.4 "float aggregation order"). Two
  * independent hazards break naive float aggregates:
  *
  *   1. `sum(double)` depends on partition/visit order, so Spark and DuckDB
  *      produce doubles differing in the last ulps.
  *   2. Even on IDENTICAL input doubles, `round()` semantics differ: Spark
  *      rounds the shortest-decimal repr HALF_UP (19.955d → 19.96) while
  *      DuckDB rounds the binary value (19.95499999999999829… → 19.95).
  *
  * Fix for (1): aggregate through exact DECIMAL(28,4) — money columns in the
  * testdata carry 2 decimal digits, so the cast is lossless and decimal
  * summation is exact integer arithmetic, hence order-independent. Casting
  * the exact decimal back to double is round-to-nearest in both engines →
  * bit-identical doubles.
  *
  * Fix for (2): never call either engine's `round` on a double output.
  * Both sides compute `floor(x * 10^k + 0.5) / 10^k` — given bit-identical
  * inputs, identical IEEE-754 ops give bit-identical outputs.
  *
  * Every helper has a Scala (Column) and a SQL-fragment (DuckDB) form; the
  * two MUST be kept op-for-op in sync — same multiply-before-divide order.
  *
  * Scale note: `DecimalType` aggregation is marginally slower than double
  * (128-bit adds, no SIMD) but stays inside whole-stage codegen and keeps
  * map-side partial aggregation; at 100 TB the cost is dwarfed by the scan.
  * It is also the CORRECT choice for money at scale — a 1000-executor
  * double-sum is nondeterministic run-to-run, which no audited pipeline
  * tolerates.
  */
object Det {
  /** Lossless carrier for 2-dp money doubles; 28-4=24 integer digits of
    * headroom (sums to 1e24 — enough for 100 TB of line items).
    */
  val MoneyType = "decimal(28,4)"

  /** Exact integer-cents carrier for a 2-dp money double: floor(x·100+0.5)
    * is identical IEEE arithmetic in both engines. The ONE spelling every
    * cents consumer shares (drift statistics, w20's flow balance).
    */
  def cents(c: Column): Column =
    floor(c * lit(100) + lit(0.5)).cast("long")

  /** Exact, order-independent sum of a 2-dp money double, as double. */
  def dsum(c: Column): Column = sum(c.cast(MoneyType)).cast("double")

  /** Exact sum kept in decimal (for multi-level re-aggregation). */
  def dsumDec(c: Column): Column = sum(c.cast(MoneyType))

  /** Deterministic round-half-up-for-positives at k decimal places. */
  def r(x: Column, k: Int): Column = {
    val p = lit(math.pow(10, k))
    floor(x * p + lit(0.5)) / p
  }

  /** Deterministic average: exact decimal sum / count, in double. */
  def davg(c: Column, k: Int): Column = r(dsum(c) / count(lit(1)), k)

  /** Deterministic sample stddev from exact moments:
    * sqrt((Σx² − (Σx)²/n) / (n−1)). Each x² is an IEEE double product
    * (identical both engines), snapped to 8 dp decimal for exact summation.
    */
  def dstddev(c: Column, k: Int): Column = {
    val n = count(lit(1)).cast("double")
    val sx = dsum(c)
    val sxx = sum((c * c).cast("decimal(38,8)")).cast("double")
    r(sqrt((sxx - sx * sx / n) / (n - lit(1.0))), k)
  }

  /** Modulus/multiplier for [[knuthBucket]]: pre-modding by P keeps the
    * multiply inside Long ((P−1)·A ≈ 2.65e18 < Long.Max); a raw key past
    * ~3.5e9 would ANSI-overflow without it.
    */
  val KnuthP = 1000000007L
  val KnuthA = 2654435761L

  /** Deterministic Knuth multiplicative hash bucket in [0, m): the ONE
    * spelling every hash-split consumer shares (e14 CV folds, x03
    * stratified sampling, f01's drift halves) — a pure row function,
    * stable across engines/partitionings/re-runs, exactly mirrored by
    * [[sqlKnuthBucket]]. Callers pass a non-negative key expression.
    */
  def knuthBucket(c: Column, m: Long): Column =
    pmod(pmod(c, lit(KnuthP)) * KnuthA, lit(KnuthP)) % lit(m)

  // ---- DuckDB SQL mirrors (op-for-op identical) ----

  /** SQL mirror of [[knuthBucket]], pmod-spelled (`((x % P) + P) % P`) so
    * negative keys hash identically to the Spark side's `pmod` instead of
    * diverging on sign-following `%` — after the first pmod every term is
    * non-negative, so plain `%` suffices downstream.
    */
  def sqlKnuthBucket(e: String, m: Long): String =
    s"(((($e) % $KnuthP + $KnuthP) % $KnuthP) * $KnuthA % $KnuthP) % $m"

  def sqlDsum(e: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(28,4))) AS DOUBLE)"

  def sqlDsumDec(e: String): String =
    s"sum(CAST(($e) AS DECIMAL(28,4)))"

  def sqlR(e: String, k: Int): String = {
    val p = s"1e$k"
    s"floor(($e) * $p + 0.5) / $p"
  }

  def sqlDavg(e: String, k: Int): String =
    sqlR(s"${sqlDsum(e)} / count(*)", k)

  def sqlDstddev(e: String, k: Int): String = {
    val sx = sqlDsum(e)
    val sxx = s"CAST(sum(CAST((($e) * ($e)) AS DECIMAL(38,8))) AS DOUBLE)"
    val n = "CAST(count(*) AS DOUBLE)"
    sqlR(s"sqrt(($sxx - $sx * $sx / $n) / ($n - 1.0))", k)
  }
}
