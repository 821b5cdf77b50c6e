package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Corpus, LmOps}
import graft.operators.TextFn

/** Contracts for the LM-pipeline operators (t10 line dedup, t11 bigram LM
  * scoring) and the c04 snapshot merge, beyond the driver's oracle rows.
  */
class LmOpsSpec extends AnyFunSuite with SparkTestSession {

  test("t10 removes every planted boilerplate line, keeps organic text") {
    val rows = LmOps.t10LineDedup(spark, SfMid).collect()
    val n = Tables.documents(spark, SfMid).count()
    assert(rows.length == n, "every document must survive line dedup")
    rows.foreach { r =>
      val (id, nLines, nKept, nRemoved) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val planted = LmOps.Boilerplate.count { case (m, _) => id % m == 0 }
      assert(nLines == 1 + planted, s"doc $id line construction")
      assert(nKept + nRemoved == nLines, s"doc $id accounting")
      // all planted lines are frequent by construction (df >= n/5 >> 10);
      // the organic line may also be removed if its text is duplicated
      // across >= MinLineDf docs, so removed is >= planted, not ==
      assert(nRemoved >= planted, s"doc $id kept a boilerplate line")
      assert(nKept <= 1, s"doc $id kept more than its organic line")
    }
  }

  test("t10 clean fingerprint equals the organic text's fingerprint") {
    // doc 1 is divisible by none of the boilerplate moduli: its cleaned
    // page must be byte-identical to the original document text
    val clean = LmOps.t10LineDedup(spark, SfMid)
      .filter(col("doc_id") === 1).select("clean_fp").head().getLong(0)
    val original = Tables.documents(spark, SfMid)
      .filter(col("doc_id") === 1)
      .select(TextFn.charFingerprint(col("text"))).head().getLong(0)
    assert(clean == original)
  }

  test("t10 removal join broadcasts the frequent-line set") {
    val p = LmOps.t10LineDedup(spark, SfMid)
      .queryExecution.executedPlan.toString()
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      p.linesIterator.take(30).mkString("\n"))
    assert(!p.contains("CartesianProduct"))
  }

  test("t11 scores every multi-token doc with n_bigrams = n_tokens - 1") {
    val scored = LmOps.t11LmScore(spark, SfMid)
    val expected = Tables.documents(spark, SfMid)
      .select(col("doc_id"),
        size(TextFn.tokens(col("text"))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 2)
    val joined = scored.join(expected, Seq("doc_id"), "full_outer")
    assert(joined.filter(col("n_bigrams").isNull
      || col("n_tokens").isNull
      || col("n_bigrams") =!= col("n_tokens") - 1).count() == 0)
  }

  test("t11 nll is positive/finite and the vocab cap exercises <unk>") {
    val rows = LmOps.t11LmScore(spark, SfMid).collect()
    rows.foreach { r =>
      val nll = r.getDouble(2)
      assert(nll > 0 && !nll.isNaN && !nll.isInfinite,
        s"doc ${r.getLong(0)} avg_nll $nll")
    }
    // the cap must bite at test scale, or the OOV path is never executed
    val distinct = Tables.documents(spark, SfMid)
      .select(explode(TextFn.tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0)
    assert(distinct > LmOps.VocabSize,
      s"corpus vocab $distinct must exceed cap ${LmOps.VocabSize}")
  }

  test("t12 tf-idf rows are internally consistent and df matches a recount") {
    val rows = LmOps.t12Tfidf(spark, SfMid).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // columns: doc_id, rk, token, tf, df, idf, tfidf
      val (rk, tf, df, idf, tfidf) = (r.getLong(1), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))
      assert(rk >= 1 && rk <= 5 && tf >= 1 && df >= 1 && idf > 0)
      assert(tfidf == tf.toDouble * idf, s"tfidf must be the exact product")
    }
    val perDoc = rows.groupBy(_.getLong(0))
    perDoc.foreach { case (d, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq,
        s"doc $d ranks not contiguous")
    }
    // recount document frequency for one token straight off the corpus
    val tok = rows.head.getString(2)
    val df0 = rows.find(_.getString(2) == tok).get.getLong(4)
    val recount = Tables.documents(spark, SfMid)
      .select(col("doc_id"), explode(array_distinct(
        TextFn.tokens(col("text")))).as("t"))
      .filter(col("t") === tok).count()
    assert(df0 == recount, s"token '$tok' df $df0 != recount $recount")
  }

  test("c05 weighted sample is deterministic, descending, quality-weighted") {
    val a = Corpus.c05WeightedSample(spark, SfMid).collect()
    val b = Corpus.c05WeightedSample(spark, SfMid).collect()
    assert(a.length == 20)
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq,
      "rerun must reproduce the identical sample")
    val keys = a.map(_.getDouble(2))
    assert(keys.zip(keys.tail).forall { case (x, y) => x >= y },
      "keys must be non-increasing")
    a.foreach(r => assert(r.getDouble(1) > 0, "zero-weight doc sampled"))
  }

  test("c04 merge ops follow the snapshot membership arithmetic") {
    val rows = Corpus.c04SnapshotMerge(spark, SfMid).collect()
    rows.foreach { r =>
      val (id, op) = (r.getLong(0), r.getString(1))
      val inBase = id % 5 != 0
      val inDelta = id % 3 == 0
      val want =
        if (inBase && inDelta) "update" else if (inDelta) "insert" else "keep"
      assert(op == want, s"doc $id: $op != $want")
      assert(!r.isNullAt(2), s"doc $id fp null")
    }
    val n = Tables.documents(spark, SfMid)
      .filter(col("doc_id") % 5 =!= 0 || col("doc_id") % 3 === 0).count()
    assert(rows.length == n, "merge must emit base ∪ delta exactly")
  }

  test("t16 BPE merge loop matches the hand-computed greedy golden") {
    // corpus: banana ×2, bandana ×1 — chosen because "anana" makes the
    // greedy/overlap distinction observable:
    //   r1: (a,n)=6 → "an"; banana → [b,an,an,a] (BOTH pairs merge —
    //       a shared-separator string replace would merge only the first)
    //   r2: (b,an)=3 ties (an,a)=3 → lexicographic "an" wins → "ana"
    //   r3: (b,an)=3 → "ban"
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types._
    val d = java.nio.file.Files.createTempDirectory("bpe_golden").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(
          Seq(R(1L, "banana banana bandana", "en", "s", 21L)), 1), schema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = LmOps.t16BpeMerges(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val want = Seq(
      (1L, "a", "n", "an", 6L),
      (2L, "an", "a", "ana", 3L),
      (3L, "b", "an", "ban", 3L))
    assert(got.toSeq == want, s"got ${got.mkString(", ")}")
  }

  test("t17 span dedup matches the hand-computed coverage golden") {
    // W = 8. doc 1 and doc 4 are byte-identical (10 tokens → all 3 windows
    // duplicated, interval union 1+1+8 = 10 = full coverage); doc 2 embeds
    // doc 1's first 8-token span mid-text (1 dup window → 8 of 10 tokens
    // covered); doc 3 is below W (no windows at all).
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types._
    val d = java.nio.file.Files.createTempDirectory("span_golden").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val texts = Seq(
      1L -> "a b c d e f g h i j",
      2L -> "x a b c d e f g h y",
      3L -> "p q r s t u v",
      4L -> "a b c d e f g h i j")
    spark.createDataFrame(
        spark.sparkContext.parallelize(
          texts.map { case (id, tx) => R(id, tx, "en", "s", tx.length.toLong) }, 2),
        schema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = LmOps.t17SpanDedup(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val want = Seq(
      (1L, 10L, 3L, 3L, 10L, 1.0),
      (2L, 10L, 3L, 1L, 8L, 0.8),
      (3L, 7L, 0L, 0L, 0L, 0.0),
      (4L, 10L, 3L, 3L, 10L, 1.0))
    assert(got.toSeq == want, s"got ${got.mkString(", ")}")
  }

  test("t17 coverage invariants hold corpus-wide") {
    val rows = LmOps.t17SpanDedup(spark, SfMid).collect()
    assert(rows.length == Tables.documents(spark, SfMid).count().toInt,
      "every document must get a row")
    rows.foreach { r =>
      val (id, n, nw, dw, cov) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(dw <= nw, s"doc $id: dup windows exceed window count")
      assert(cov <= n, s"doc $id: coverage exceeds document length")
      assert(cov <= dw * LmOps.SpanW, s"doc $id: coverage exceeds dw*W")
      assert(dw == 0 || cov >= LmOps.SpanW,
        s"doc $id: a dup window must cover at least W tokens")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0,
        s"doc $id: dup_frac out of [0,1]")
    }
  }
}
