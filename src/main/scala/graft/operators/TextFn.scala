package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared deterministic text primitives for the training-data pipeline
  * operators (tokenization, shingling, permutation hashing).
  *
  * Every primitive has a Column form and an op-for-op identical DuckDB SQL
  * fragment so the driver's exact-hash oracle compare holds: same split
  * semantics (empty tokens filtered on both sides — Spark's `split` keeps
  * trailing empties, DuckDB's `string_split` does too), same 1-based element
  * indexing, same integer modular arithmetic (all operands positive and
  * < 2^46, so Spark `%` and DuckDB `%` agree).
  *
  * The permutation constants are universal-hash style `h_j(x) = (a_j·x + b_j)
  * mod P` over the Mersenne prime P = 2^31 − 1; `a_j`/`b_j` derive from
  * Knuth's multiplicative constant so both the Scala plan and the generated
  * oracle SQL read from ONE table (this object) and can never drift.
  */
object TextFn {
  val P = 2147483647L // 2^31 - 1
  /** 32 permutation slopes/offsets; A(0) pairs with B(0) etc. */
  val A: IndexedSeq[Long] = (1 to 32).map(j => ((2L * j + 1) * 2654435761L) % P)
  val B: IndexedSeq[Long] = (1 to 32).map(j => (j.toLong * 40503L * 65537L + 17L) % P)

  /** Whitespace tokens, empties dropped (consistent across engines). */
  def tokens(text: Column): Column =
    filter(split(trim(text), " "), t => t =!= "")
  def tokensSql(text: String): String =
    s"list_filter(string_split(trim($text), ' '), x -> x <> '')"

  /** Distinct word 3-gram shingles of a token array (callers pre-filter
    * `size(t) >= 3`). 1-based `element_at` matches DuckDB list indexing.
    */
  def shingles3(t: Column): Column =
    array_distinct(transform(sequence(lit(1), size(t) - 2), i =>
      concat_ws(" ", element_at(t, i), element_at(t, i + 1),
        element_at(t, i + 2))))
  def shingles3Sql(t: String): String =
    s"list_distinct(list_transform(range(1, greatest(len($t) - 1, 1)), " +
      s"i -> $t[i] || ' ' || $t[i + 1] || ' ' || $t[i + 2]))"

  /** j-th MinHash permutation of a positive id column (j is 0-based). */
  def perm(j: Int, id: Column): Column =
    (lit(A(j)) * id + lit(B(j))) % lit(P)
  def permSql(j: Int, id: String): String =
    s"(${A(j)} * $id + ${B(j)}) % $P"

  /** j-th SimHash bit predicate of a positive id column (j in 0..62):
    * a distinct affine mix per bit position, tested for parity.
    */
  def simBit(j: Int, id: Column): Column =
    ((lit(A(j % 32)) * id + lit(B((j * 7 + 3) % 32)) + lit(j * 1013L))
      % lit(P)) % lit(2L) === lit(1L)
  def simBitSql(j: Int, id: String): String =
    s"(${A(j % 32)} * $id + ${B((j * 7 + 3) % 32)} + ${j * 1013L}) % $P % 2 = 1"

  /** Deterministic char-level rolling hash (polynomial base 31 mod 1e9+7):
    * identical left-to-right fold in both engines. Spark's `aggregate` has an
    * explicit zero; DuckDB 1.0's `list_reduce` seeds from the head, so the SQL
    * prepends a literal 0.
    */
  val FpMod = 1000000007L
  /** Native codegen'd rolling hash (round 13) — one raw-byte walk inside
    * whole-stage codegen instead of one interpreted lambda + one string
    * allocation PER CHARACTER (the t04-class HOF cost; 13 call sites
    * share this primitive). Bit-equal to [[charFingerprintHof]] — the
    * reference HOF spelling kept below for the equality spec — and to
    * the DuckDB `list_reduce` mirror, which is untouched.
    */
  def charFingerprint(text: Column): Column =
    graft.functions.StringFunctions.charFingerprint(text)

  /** The HOF reference spelling (the signBit pattern: interpreted, kept
    * only so Round13Spec can pin the native kernel bit-equal to it).
    */
  def charFingerprintHof(text: Column): Column =
    aggregate(
      transform(filter(split(text, ""), c => c =!= ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % lit(FpMod))
  def charFingerprintSql(text: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($text, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(acc, x) -> (acc * 31 + x) % $FpMod)"

  /** Deterministic round-half-up at k decimals — see [[Det.r]]. */
  def r(x: Column, k: Int): Column = Det.r(x, k)
  def rSql(e: String, k: Int): String = Det.sqlR(e, k)
}
