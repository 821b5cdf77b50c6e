package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Jaro–Winkler kernel, shared verbatim by the interpreted `eval` path
  * and the generated code (codegen emits one static call — the
  * `levenshtein` pattern, where the built-in's generated code calls
  * `UTF8String.levenshteinDistance`).
  *
  * Semantics are pinned to DuckDB 1.0's `jaro_winkler_similarity` (itself
  * the RapidFuzz definition), verified bit-exact on 30k fuzzed pairs
  * including multi-byte UTF-8:
  *   - BYTE-level comparison (multi-byte codepoints compare per byte);
  *   - match window = max(la, lb)/2 − 1 (floor, min 0);
  *   - transpositions = floor(mismatched-match-positions / 2);
  *   - jaro = (m/la + m/lb + (m−t)/m) / 3;
  *   - Winkler boost ONLY when jaro > 0.7: +l·0.1·(1−jaro), common-prefix
  *     l capped at 4 bytes;
  *   - any empty side → 0.0 (DuckDB returns 0 even for two empties).
  */
object JaroWinklerAlgo {
  final val BoostThreshold = 0.7
  final val PrefixScale = 0.1
  final val MaxPrefix = 4

  def jw(ls: UTF8String, rs: UTF8String): Double = {
    val a = ls.getBytes
    val b = rs.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    var window = math.max(la, lb) / 2 - 1
    if (window < 0) window = 0
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      var j = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var found = false
      while (!found && j <= hi) {
        if (!bm(j) && a(i) == b(j)) {
          am(i) = true; bm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    var sim = (m.toDouble / la + m.toDouble / lb
      + (m - t).toDouble / m) / 3.0
    if (sim > BoostThreshold) {
      var l = 0
      val cap = math.min(math.min(la, lb), MaxPrefix)
      while (l < cap && a(l) == b(l)) l += 1
      sim = sim + l * PrefixScale * (1.0 - sim)
    }
    sim
  }
}

/** Native Catalyst expression for Jaro–Winkler string similarity — the
  * fuzzy-matching metric record linkage uses when edit distance's unit
  * costs are too blunt (it privileges shared prefixes, the way human name
  * and product-label typos behave).
  *
  * Why custom: Spark ships `levenshtein` but no Jaro–Winkler, and the
  * alternative (a Scala UDF) boxes both strings per row and blocks
  * whole-stage codegen. This expression stays inside the generated plan
  * (one static call on the raw `UTF8String`s, no boxing) and its
  * semantics are pinned bit-exact to DuckDB's `jaro_winkler_similarity`
  * ([[JaroWinklerAlgo]]) — which is what makes `r02`'s oracle a genuine
  * cross-engine check of the kernel itself.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (string, string), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerAlgo.jw($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object StringFunctions {
  /** Column-level API (the library call sites use this directly). */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftBridge.column(
      JaroWinkler(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column-level API for the native fingerprint. */
  def charFingerprint(c: Column): Column =
    GraftBridge.column(CharFingerprint(GraftBridge.expression(c)))

  private val info = new ExpressionInfo(
    classOf[JaroWinkler].getName, null, "jaro_winkler",
    "_FUNC_(a, b) - Jaro-Winkler similarity in [0,1] (byte-level, " +
      "RapidFuzz/DuckDB semantics: boost threshold 0.7, prefix cap 4).", "")

  private[functions] val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => JaroWinkler(a, b)
    case exprs => throw new IllegalArgumentException(
      s"jaro_winkler expects 2 arguments, got ${exprs.length}")
  }

  /** SQL-surface registration for one session: `SELECT jaro_winkler(a, b)`. */
  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("jaro_winkler"), info, builder)
}

/** The char-fingerprint kernel (polynomial rolling hash, base 31 mod
  * 1e9+7 over Unicode CODE POINTS), shared verbatim by the interpreted
  * `eval` path and the generated code — the [[JaroWinklerAlgo]] pattern.
  *
  * Semantics are pinned bit-exact to the HOF reference spelling
  * `aggregate(transform(filter(split(text,'')), ascii), 0, (a,x) ->
  * (a*31+x) % 1e9+7)` — measured identical on ASCII, BMP multibyte, AND
  * supplementary-plane characters (Spark's split('')/ascii chain folds
  * CODE POINTS, 😀 → 128512, matching DuckDB's string_split/ascii) — so
  * the DuckDB `list_reduce` oracle mirror is untouched. The mod is
  * applied per character, exactly like the lambda; acc < 1e9+7 keeps
  * `acc*31 + cp` far inside Long range.
  *
  * MALFORMED input (round 14, ADVICE r13): bit-equality now covers
  * invalid UTF-8 too — the kernel reproduces the HOF's observable
  * behavior (split('') steps by UTF8String.numBytesForFirstByte, where
  * invalid leading bytes step 1; ascii() yields the first code point of
  * each slice's Java replace-decode, i.e. U+FFFD for any malformed or
  * truncated slice, with Java's overlong/surrogate/range checks).
  * Round14Spec fuzzes the equality over 2000 malformation-biased random
  * byte strings.
  */
object CharFingerprintAlgo {
  final val Mod = 1000000007L

  def fp(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    var acc = 0L
    var i = 0
    while (i < n) {
      val b0 = bytes(i) & 0xFF
      // Step width = Spark UTF8String.numBytesForFirstByte (what the HOF's
      // split('') walks by): valid leads step their sequence length,
      // INVALID leads (0x80–0xC1 continuations/overlong leads, 0xF5–0xFF)
      // step 1. ADVICE r13: the old loop put 0xF8–0xFF in the 4-byte
      // branch and folded partial code points on truncation, diverging
      // from the HOF spelling on malformed input (strings cast from
      // binary). Pinned by the malformed-byte fuzz in Round14Spec.
      val len =
        if (b0 < 0x80) 1
        else if (b0 >= 0xC2 && b0 <= 0xDF) 2
        else if (b0 >= 0xE0 && b0 <= 0xEF) 3
        else if (b0 >= 0xF0 && b0 <= 0xF4) 4
        else 1
      // Folded value = first code point of the slice's Java replace-decode
      // (ascii() semantics): the code point itself when the slice is a
      // complete valid sequence (incl. the overlong/surrogate/range checks
      // Java enforces), U+FFFD otherwise.
      var cp = 0xFFFD
      if (b0 < 0x80) cp = b0
      else if (len > 1 && i + len <= n) {
        val b1 = bytes(i + 1) & 0xFF
        var ok =
          if (len == 2) b1 >= 0x80 && b1 <= 0xBF
          else if (len == 3) {
            if (b0 == 0xE0) b1 >= 0xA0 && b1 <= 0xBF
            else if (b0 == 0xED) b1 >= 0x80 && b1 <= 0x9F
            else b1 >= 0x80 && b1 <= 0xBF
          } else {
            if (b0 == 0xF0) b1 >= 0x90 && b1 <= 0xBF
            else if (b0 == 0xF4) b1 >= 0x80 && b1 <= 0x8F
            else b1 >= 0x80 && b1 <= 0xBF
          }
        var j = 2
        while (ok && j < len) {
          val bj = bytes(i + j) & 0xFF
          ok = bj >= 0x80 && bj <= 0xBF
          j += 1
        }
        if (ok) {
          cp =
            if (len == 2) ((b0 & 0x1F) << 6) | (bytes(i + 1) & 0x3F)
            else if (len == 3) ((b0 & 0x0F) << 12) |
              ((bytes(i + 1) & 0x3F) << 6) | (bytes(i + 2) & 0x3F)
            else ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3F) << 12) |
              ((bytes(i + 2) & 0x3F) << 6) | (bytes(i + 3) & 0x3F)
        }
      }
      acc = (acc * 31 + cp) % Mod
      i += len
    }
    acc
  }
}

/** Native Catalyst expression for the document fingerprint — the rolling
  * hash every exact-dedup and corpus-snapshot operator keys on (13 call
  * sites: d01, t04, t15, the Corpus family, the stream twin).
  *
  * Why custom: the HOF reference spelling pays one INTERPRETED lambda
  * per character plus a per-character string allocation from
  * `split('')` — measured as the whole cost of t04 (0.89 s at sf0.1 for
  * a hash that should be memory-bandwidth-bound). This expression walks
  * the raw UTF-8 bytes once inside whole-stage codegen (one static call,
  * no boxing, no intermediate array), decoding code points inline.
  */
case class CharFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_fingerprint expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "char_fingerprint"

  override protected def nullSafeEval(s: Any): Any =
    CharFingerprintAlgo.fp(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharFingerprintAlgo.fp($c)")

  override protected def withNewChildInternal(
      newChild: Expression): CharFingerprint = copy(child = newChild)
}
