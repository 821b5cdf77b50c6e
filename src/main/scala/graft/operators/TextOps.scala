package graft.operators

import graft.Caches.Tracked
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for a large-scale training-data pipeline over the
  * `documents` table: token statistics, heuristic language ID, quality
  * scoring, document fingerprinting, corpus token frequencies.
  *
  * These extend the reference's relational surface (its scalar inventory is
  * SURVEY.md §2.2; it has no text functions) with the operations an LLM-data
  * pipeline needs. All are narrow per-row projections + bounded-cardinality
  * aggregates: at 100 TB each is scan-bound — no shuffle except the final
  * small group-bys, and every expression is a Catalyst built-in that stays
  * inside whole-stage codegen (no UDFs).
  */
object TextOps {
  import TextFn._

  /** Small per-language stopword profiles for the n-gram/stopword heuristic
    * language-ID (a Bloom-filter-free, join-free argmax — per-row array
    * intersection against broadcast-literal sets).
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "en"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "in"))

  /** Guarded ratio: NULL for zero-token docs — matching DuckDB, whose
    * division by zero yields NULL while Spark's yields NaN.
    */
  private def ratio(num: Column, den: Column, k: Int): Column =
    when(den > 0, r(num.cast("double") / den, k)).otherwise(lit(null))

  /** The quality signals shared by t03 and the Corpus pipeline — ONE
    * definition on each engine so the batch pipeline, the quality table,
    * and their oracles can never drift. Zero-token docs get NULL ratios
    * (and therefore a NULL score → the 'drop' band) on both engines.
    */
  def qualitySignals(df: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val en = langProfiles.head._2
    // r14 measured: a Par.spread floor here TAXED the c05/c08/c12 class
    // (their cost is the window/fingerprint stages after the signals,
    // not the tokenize passes) - left on the caller's partitioning
    df
      .withColumn("n_tokens", size(t).cast("long"))
      .withColumn("distinct_ratio",
        ratio(size(array_distinct(t)), col("n_tokens"), 4))
      .withColumn("stopword_ratio",
        ratio(size(filter(t, x => x.isin(en.map(lit(_)): _*))),
          col("n_tokens"), 4))
      .withColumn("len_score",
        when(col("n_tokens") >= 20 && col("n_tokens") <= 1000, 1.0)
          .when(col("n_tokens") >= 5, 0.5).otherwise(0.0))
      .withColumn("quality_score",
        r(lit(0.4) * col("len_score") + lit(0.4) * col("distinct_ratio")
          + lit(0.2) * least(col("stopword_ratio") * lit(5.0), lit(1.0)), 4))
  }

  /** SQL mirror of [[qualitySignals]]: projects doc_id, text + the signal
    * columns from `documents`.
    */
  def qualitySignalsSql: String = {
    val t = tokensSql("text")
    val en = langProfiles.head._2.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""SELECT doc_id, text, n_tokens, distinct_ratio, stopword_ratio,
       |  len_score,
       |  ${rSql("0.4 * len_score + 0.4 * distinct_ratio + " +
        "0.2 * least(stopword_ratio * 5.0, 1.0)", 4)} AS quality_score
       |FROM (SELECT doc_id, text,
       |  CAST(len($t) AS BIGINT) AS n_tokens,
       |  ${rSql(s"CAST(len(list_distinct($t)) AS DOUBLE) / len($t)", 4)} AS distinct_ratio,
       |  ${rSql(s"CAST(len(list_filter($t, x -> list_contains($en, x))) " +
        s"AS DOUBLE) / len($t)", 4)} AS stopword_ratio,
       |  CASE WHEN len($t) BETWEEN 20 AND 1000 THEN 1.0
       |       WHEN len($t) >= 5 THEN 0.5 ELSE 0.0 END AS len_score
       |FROM documents)""".stripMargin
  }

  /** t01 — per-document token statistics: char length, whitespace token
    * count, distinct-token count, mean token length, and a BPE-ish subword
    * count (Σ ceil(len(tok)/4) — a deterministic proxy for a 4-chars-per-
    * token BPE budget). Narrow-only; `limit` bounds the verify dump.
    */
  def t01TokenStats(s: SparkSession, dir: String): DataFrame = {
    // tokens bound once (the t06 rule: four consumers below would each
    // re-run split+trim+filter); n_regex_tokens counts matches without
    // allocating the extract_all match array (the t06 alpha_ratio move)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_distinct_tokens",
        size(array_distinct(col("toks"))).cast("long"))
      .withColumn("sum_token_len",
        aggregate(transform(col("toks"), x => length(x).cast("long")),
          lit(0L), (acc, x) => acc + x))
      .withColumn("mean_token_len",
        when(col("n_tokens") > 0,
          r(col("sum_token_len").cast("double") / col("n_tokens"), 4))
          .otherwise(lit(null))) // NULL like DuckDB's x/0, not NaN
      .withColumn("n_subwords",
        aggregate(transform(col("toks"),
          x => ceil(length(x) / lit(4.0)).cast("long")),
          lit(0L), (acc, x) => acc + x))
      .withColumn("n_regex_tokens",
        regexp_count(col("text"), lit("[a-z0-9]+")).cast("long"))
      .select("doc_id", "n_chars", "n_tokens", "n_distinct_tokens",
        "mean_token_len", "n_subwords", "n_regex_tokens")
      .orderBy("doc_id")
  }

  private def t01Sql = {
    val t = tokensSql("text")
    s"""SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  CAST(len($t) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct($t)) AS BIGINT) AS n_distinct_tokens,
       |  ${rSql(s"CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform($t, x -> CAST(length(x) AS BIGINT))), " +
        s"(acc, x) -> acc + x) AS DOUBLE) / len($t)", 4)} AS mean_token_len,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform($t, x -> CAST(ceil(length(x) / 4.0) AS BIGINT))),
       |    (acc, x) -> acc + x) AS n_subwords,
       |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_regex_tokens
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** English-typical character bigrams for the n-gram half of the
    * language-ID heuristic.
    */
  private val enBigrams = Seq("th", "he", "in", "er", "an", "re", "on", "at")

  /** t02 — heuristic language ID, two signals per the standard recipe:
    * per-language stopword-hit ratios (word level) AND a character-bigram
    * profile score (n-gram level), argmax over the stopword scores with
    * deterministic tie-break (profile order), 'und' below 2% evidence.
    * Per-row only — the profile sets are plan literals, so this runs at scan
    * speed with zero shuffles at any scale.
    */
  def t02LangId(s: SparkSession, dir: String): DataFrame = {
    // Bigram hits via ONE codegen'd regex with a lookahead alternation:
    // `(?=b1|b2|…)` is zero-width, so the matcher advances one char per
    // hit and counts every POSITION whose 2-char prefix is a profile
    // bigram — exactly the old `transform(sequence(1, len-1), substr)` +
    // `filter(isin)` spelling, which paid one interpreted HOF lambda and
    // one substring allocation PER CHARACTER (measured 1.73 s vs 0.35 s
    // at sf0.1, zero differing rows; found by the round-13
    // count-elimination sweep).
    // Each alternative is Pattern.quote'd (ADVICE r13): today's profile is
    // letters-only, but a future bigram containing a regex metacharacter
    // would otherwise silently change the count vs the DuckDB
    // list_contains mirror.
    val bigramRe =
      "(?=" + enBigrams.map(java.util.regex.Pattern.quote).mkString("|") + ")"
    // Tokens bound as a REAL column, not a compound expression: the four
    // per-language filters (and size) each reference it, and
    // CollapseProject keeps multi-use non-cheap projections un-inlined,
    // so split+trim+filter runs once per row instead of five times.
    val base = graft.Par.spread(Tables.documents(s, dir), col("doc_id"))
      .select(col("doc_id"), col("lang").as("declared_lang"), col("text"))
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("ngram_en",
        when(length(col("text")) >= 2,
          r(regexp_count(col("text"), lit(bigramRe))
            .cast("double") / (length(col("text")) - 1), 4))
          .otherwise(0.0))
    val scored = langProfiles.foldLeft(base) { case (df, (lang, words)) =>
      df.withColumn(s"score_$lang",
        when(col("n_tokens") > 0,
          r(size(filter(col("toks"), x => x.isin(words.map(lit(_)): _*)))
            .cast("double") / col("n_tokens"), 4)).otherwise(lit(null)))
    }
    val best = langProfiles.map { case (l, _) => col(s"score_$l") }
    val pred = langProfiles.reverse.foldLeft(lit("und")) {
      case (acc, (lang, _)) =>
        when(col(s"score_$lang") >= lit(0.02)
          && col(s"score_$lang") === greatest(best: _*), lang).otherwise(acc)
    }
    scored
      .withColumn("predicted_lang", pred)
      .select(Seq(col("doc_id"), col("declared_lang"), col("ngram_en")) ++
        langProfiles.map { case (l, _) => col(s"score_$l") } :+
        col("predicted_lang"): _*)
      .orderBy("doc_id")
  }

  private def t02Sql = {
    val t = tokensSql("text")
    val scores = langProfiles.map { case (lang, words) =>
      val set = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"${rSql(s"CAST(len(list_filter($t, x -> list_contains($set, x))) " +
        s"AS DOUBLE) / len($t)", 4)} AS score_$lang"
    }.mkString(",\n  ")
    val best = langProfiles.map { case (l, _) => s"score_$l" }
      .mkString("greatest(", ", ", ")")
    val pred = langProfiles.map { case (lang, _) =>
      s"WHEN score_$lang >= 0.02 AND score_$lang = $best THEN '$lang'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    val bg = enBigrams.map(b => s"'$b'").mkString("[", ", ", "]")
    val ngram = s"CASE WHEN length(text) >= 2 THEN ${rSql(
        s"CAST(len(list_filter(list_transform(range(1, length(text)), " +
          s"i -> substr(text, i, 2)), b -> list_contains($bg, b))) AS DOUBLE)" +
          s" / (length(text) - 1)", 4)} ELSE 0.0 END"
    s"""SELECT doc_id, declared_lang, ngram_en,
       |  ${langProfiles.map { case (l, _) => s"score_$l" }.mkString(", ")},
       |  $pred AS predicted_lang
       |FROM (SELECT doc_id, lang AS declared_lang,
       |  $ngram AS ngram_en,
       |  $scores
       |FROM documents) ORDER BY doc_id""".stripMargin
  }

  /** t23 — language-ID confusion matrix: declared × predicted counts with
    * per-cell share of the declared language's mass — the QA aggregate
    * that grades the t02 heuristic against the corpus's own labels before
    * anyone routes documents by predicted language. Composes t02 (one
    * definition — any change to the classifier moves this matrix with it);
    * 'und' rows surface the abstention rate per declared language.
    *
    * Scale: t02 is per-row scan-bound; this adds one |langs|²-bounded
    * map-combined aggregate plus a broadcast of per-declared totals.
    */
  def t23LangConfusion(s: SparkSession, dir: String): DataFrame = {
    val cells = t02LangId(s, dir)
      .groupBy(col("declared_lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy("declared_lang")
      .agg(sum(col("n")).as("n_declared"))
    // bounded: one row per declared language — the language vocabulary
    cells.join(broadcast(totals), Seq("declared_lang"))
      .select(col("declared_lang"), col("predicted_lang"), col("n"),
        r(col("n").cast("double") / col("n_declared"), 4).as("share"))
      .orderBy("declared_lang", "predicted_lang")
  }

  private def t23Sql =
    s"""WITH t02 AS ($t02Sql),
       |cells AS (
       |  SELECT declared_lang, predicted_lang, CAST(count(*) AS BIGINT) AS n
       |  FROM t02 GROUP BY 1, 2),
       |totals AS (
       |  SELECT declared_lang, CAST(sum(n) AS BIGINT) AS n_declared
       |  FROM cells GROUP BY 1)
       |SELECT c.declared_lang, c.predicted_lang, c.n,
       |  ${rSql("CAST(c.n AS DOUBLE) / t.n_declared", 4)} AS share
       |FROM cells c JOIN totals t ON t.declared_lang = c.declared_lang
       |ORDER BY c.declared_lang, c.predicted_lang""".stripMargin

  /** t03 — quality scoring: length/stopword/repetition signals composed into
    * a 0..1 score and a keep/review/drop band (the standard pre-training
    * data filter shape). Per-row; scan-bound at any scale. The signal
    * expressions are [[qualitySignals]] — shared verbatim with the Corpus
    * pipeline.
    */
  def t03QualityScore(s: SparkSession, dir: String): DataFrame =
    qualitySignals(Tables.documents(s, dir).select(col("doc_id"), col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("band",
        when(col("quality_score") >= 0.6, "keep")
          .when(col("quality_score") >= 0.3, "review").otherwise("drop"))
      .select("doc_id", "n_chars", "n_tokens", "distinct_ratio",
        "stopword_ratio", "quality_score", "band")
      .orderBy("doc_id")

  private def t03Sql =
    s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, n_tokens,
       |  distinct_ratio, stopword_ratio, quality_score,
       |  CASE WHEN quality_score >= 0.6 THEN 'keep'
       |       WHEN quality_score >= 0.3 THEN 'review'
       |       ELSE 'drop' END AS band
       |FROM ($qualitySignalsSql) ORDER BY doc_id""".stripMargin

  /** t04 — document fingerprinting: char-level rolling hash (polynomial base
    * 31 mod 1e9+7) — the exact-dedup key for content-addressed pipelines.
    * Per-row fold; identical left-to-right in both engines ([[TextFn]]).
    */
  def t04Fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("fingerprint", charFingerprint(col("text")))
      .withColumn("fp_bucket", col("fingerprint") % 256)
      .select("doc_id", "fingerprint", "fp_bucket")
      .orderBy("doc_id")

  private def t04Sql =
    s"""SELECT doc_id, ${charFingerprintSql("text")} AS fingerprint,
       |  ${charFingerprintSql("text")} % 256 AS fp_bucket
       |FROM documents ORDER BY doc_id""".stripMargin

  /** t05 — corpus token-frequency table: explode → count per token → share
    * of corpus. The explode multiplies rows by tokens-per-doc, but partial
    * aggregation collapses each map task to |vocab| rows before the single
    * shuffle — the classic word-count shape that scales linearly.
    *
    * The corpus total is a scalar aggregate broadcast-cross-joined back —
    * NOT `sum over ()`: an empty-frame window would funnel the entire vocab
    * through ONE partition to compute the same number (a single-task
    * bottleneck at 100 TB vocab sizes; the broadcast of a 1-row total is
    * free at any scale).
    */
  def t05TokenFreq(s: SparkSession, dir: String): DataFrame = {
    // cached: both the scalar total and the join's left side consume it —
    // uncached, Spark would run the explode+aggregate corpus pass twice
    val counts = Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .tracked
    val total = counts.agg(sum(col("cnt")).as("total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", r(col("cnt").cast("double") / col("total"), 6))
      .drop("total")
      .orderBy(col("cnt").desc, col("token"))
  }

  private def t05Sql = {
    val t = tokensSql("text")
    s"""SELECT token, cnt, ${rSql("CAST(cnt AS DOUBLE) / sum(cnt) OVER ()", 6)} AS share
       |FROM (SELECT token, CAST(count(*) AS BIGINT) AS cnt
       |      FROM (SELECT unnest($t) AS token FROM documents) GROUP BY 1)
       |ORDER BY cnt DESC, token""".stripMargin
  }

  /** t20 — per-source vocabulary growth (the Heaps'-law / lexical-diversity
    * screen): vocabulary size, token count, type–token ratio, and the hapax
    * fraction (words seen exactly once — the sensitive end of the
    * distribution: template/boilerplate sources collapse to near-zero
    * hapaxes while organic text holds 40–60%). Run per SOURCE because
    * that's the actionable grain — a source whose vocab stops growing with
    * its token count is machine-generated or deduplicate-worthy.
    *
    * Scale: explode → (source, word) count with map-side combine → a
    * per-source re-aggregate on the SAME source-hashed partitioning
    * (Catalyst plans one exchange for both). Vocab tables are the classic
    * long-tail shape; the word-level pass never leaves its combiner above
    * a few MB per executor because counts fold before the shuffle.
    */
  def t20VocabGrowth(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .select(col("source"), explode(tokens(col("text"))).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("cnt"))
    counts.groupBy("source")
      .agg(
        count(lit(1)).as("vocab"),
        sum(col("cnt")).as("n_tokens"),
        sum((col("cnt") === 1).cast("long")).as("hapax"),
        r(count(lit(1)).cast("double") / sum(col("cnt")), 6)
          .as("type_token_ratio"),
        r(sum((col("cnt") === 1).cast("long")).cast("double")
          / count(lit(1)), 6).as("hapax_frac"))
      .orderBy("source")
  }

  private def t20Sql = {
    val t = tokensSql("text")
    s"""WITH counts AS (
       |  SELECT source, word, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT source, unnest($t) AS word FROM documents)
       |  GROUP BY 1, 2)
       |SELECT source,
       |  CAST(count(*) AS BIGINT) AS vocab,
       |  CAST(sum(cnt) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       |  ${rSql("CAST(count(*) AS DOUBLE) / sum(cnt)", 6)} AS type_token_ratio,
       |  ${rSql("CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE) " +
            "/ count(*)", 6)} AS hapax_frac
       |FROM counts GROUP BY 1 ORDER BY source""".stripMargin
  }

  /** t21's contamination window: 8 consecutive tokens (the PaLM-family
    * recipe band; GPT-3 used 13 — at this testdata's 30–150-token doc
    * lengths, 8 keeps enough windows per doc to be meaningful).
    */
  private val ContamK = 8
  /** t21's eval slice: doc_id % 5 == 0 — a 20% held-out set. */
  private val EvalMod = 5L

  /** Distinct word k-grams of a token array as strings (callers pre-filter
    * `size(t) >= k`); the k-wide sibling of [[TextFn.shingles3]].
    */
  private[graft] def gramsK(t: Column, k: Int): Column =
    array_distinct(transform(sequence(lit(1), size(t) - (k - 1)), i =>
      concat_ws(" ", (0 until k).map(j => element_at(t, i + j)): _*)))
  private def gramsKSql(t: String, k: Int): String = {
    val parts = (0 until k).map(j =>
      if (j == 0) s"$t[i]" else s"$t[i + $j]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(range(1, greatest(len($t) - ${k - 2}, 1)), " +
      s"i -> $parts))"
  }

  /** t21 — FUZZY test-set decontamination (the n-gram-overlap recipe from
    * the GPT-3/PaLM reports): a training document is contaminated if it
    * shares ANY [[ContamK]]-token window with the held-out eval slice —
    * catching partial copies and paraphrase-with-shared-runs leaks that
    * t07's exact-fingerprint match cannot. Output is the per-source audit:
    * train docs, flagged docs, flagged fraction, and the max distinct
    * shared windows any one doc carries (the "how bad is the worst leak"
    * number).
    *
    * Scale: the join is an equi-join on the gram — at 100 TB key it by
    * `xxhash64(gram)` (8 bytes vs ~50) and df-cap boilerplate grams
    * exactly as the shingle dictionary does ([[Dedup.MaxShingleDf]]);
    * the eval side is distinct-gram-deduped BEFORE the join so each
    * train window matches at most once per eval gram. Both sides explode
    * only (doc_id, gram) — never text.
    */
  def t21FuzzyDecontam(s: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val grams = graft.Par.spread(Tables.documents(s, dir), col("doc_id"))
      .select(col("doc_id"), col("source"), t.as("t"))
      .filter(size(col("t")) >= ContamK)
      .select(col("doc_id"), col("source"),
        explode(gramsK(col("t"), ContamK)).as("g"))
      .tracked // the dominant stage; consumed by BOTH join sides
    val evalGrams = grams.filter(pmod(col("doc_id"), lit(EvalMod)) === 0)
      .select("g").distinct()
    val train = grams.filter(pmod(col("doc_id"), lit(EvalMod)) =!= 0)
    val hits = train.join(evalGrams, Seq("g"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    val trainDocs = Tables.documents(s, dir)
      .filter(pmod(col("doc_id"), lit(EvalMod)) =!= 0)
      .select(col("doc_id"), col("source"))
    trainDocs.join(hits, Seq("doc_id"), "left_outer")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_train"),
        sum(col("n_shared").isNotNull.cast("long")).as("n_flagged"),
        r(sum(col("n_shared").isNotNull.cast("long")).cast("double")
          / count(lit(1)), 4).as("frac_flagged"),
        coalesce(max(col("n_shared")), lit(0L)).as("max_shared_grams"))
      .orderBy("source")
  }

  private def t21Sql = {
    val t = tokensSql("text")
    s"""WITH grams AS (
       |  SELECT doc_id, source, unnest(${gramsKSql("t", ContamK)}) AS g
       |  FROM (SELECT doc_id, source, $t AS t FROM documents)
       |  WHERE len(t) >= $ContamK),
       |eval_grams AS (
       |  SELECT DISTINCT g FROM grams WHERE doc_id % $EvalMod = 0),
       |hits AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
       |  FROM grams JOIN eval_grams USING (g)
       |  WHERE doc_id % $EvalMod <> 0
       |  GROUP BY 1),
       |train AS (
       |  SELECT doc_id, source FROM documents WHERE doc_id % $EvalMod <> 0)
       |SELECT source,
       |  CAST(count(*) AS BIGINT) AS n_train,
       |  CAST(sum(CASE WHEN h.n_shared IS NOT NULL THEN 1 ELSE 0 END)
       |       AS BIGINT) AS n_flagged,
       |  ${rSql("CAST(sum(CASE WHEN h.n_shared IS NOT NULL THEN 1 ELSE 0 END) " +
            "AS DOUBLE) / count(*)", 4)} AS frac_flagged,
       |  CAST(coalesce(max(h.n_shared), 0) AS BIGINT) AS max_shared_grams
       |FROM train LEFT JOIN hits h USING (doc_id)
       |GROUP BY 1 ORDER BY source""".stripMargin
  }

  /** t06 — repetition-based quality rules (the Gopher/C4 filter family):
    * mean word length bounds, most-frequent-token fraction, duplicate
    * word-3-gram fraction, alphabetic-character ratio, composed into a
    * pass/fail gate. All per-row higher-order-function folds over the token
    * array — scan-bound, zero shuffle, codegen'd; the exact filter a
    * pre-training pipeline runs before any expensive dedup.
    */
  def t06RepetitionRules(s: SparkSession, dir: String): DataFrame = {
    // highest single-token count per doc, the repetition ("spam spam spam")
    // flag — computed LINEARLY as explode → (doc, token) count → per-doc
    // max. A per-row fold over distinct tokens (count each token's
    // occurrences) is O(distinct × n) per document: fine on average docs,
    // a straggler-task hazard on the 100k-token tail a 100 TB corpus
    // always contains. Two map-side-combined shuffles beat a quadratic row.
    val maxCnt = Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("max_cnt"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      // tokens bound as a real column: shingles3's lambda reads
      // element_at(toks, i) THREE times per shingle, and an unbound
      // compound `t` there re-ran split+trim+filter on every access —
      // measured 4.7 s vs 0.4 s for the shingle stage alone at sf0.1
      // (round-13 count-elimination sweep). Multi-use non-cheap
      // projections survive CollapseProject, so this evaluates once.
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("mean_word_len",
        ratio(aggregate(transform(col("toks"), x => length(x).cast("long")),
          lit(0L), (acc, x) => acc + x), col("n_tokens"), 4))
      .join(maxCnt, Seq("doc_id"), "left_outer")
      .withColumn("max_token_frac", ratio(col("max_cnt"), col("n_tokens"), 4))
      // duplicated word-3-grams: shingles3 is DISTINCT shingles, total is
      // n_tokens - 2, so the duplicate fraction is 1 - distinct/total
      .withColumn("dup_3gram_frac",
        when(col("n_tokens") >= 3,
          r(lit(1.0) - size(shingles3(col("toks"))).cast("double")
            / (col("n_tokens") - 2), 4)))
      // regexp_count, not size(regexp_extract_all(…)): same count, but
      // the extract_all spelling allocates the full match array per row
      // just to take its length
      .withColumn("alpha_ratio",
        ratio(regexp_count(col("text"), lit("[a-z]")).cast("long"),
          length(col("text")).cast("long"), 4))
      .withColumn("gopher_pass",
        coalesce(col("n_tokens") >= 20
          && col("mean_word_len") >= 2.0 && col("mean_word_len") <= 12.0
          && col("max_token_frac") <= 0.2
          && col("dup_3gram_frac") <= 0.2
          && col("alpha_ratio") >= 0.5, lit(false)))
      .select("doc_id", "n_tokens", "mean_word_len", "max_token_frac",
        "dup_3gram_frac", "alpha_ratio", "gopher_pass")
      .orderBy("doc_id")
  }

  private def t06Sql = {
    val t = tokensSql("text")
    val sumLen = s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform($t, x -> CAST(length(x) AS BIGINT))), (acc, x) -> acc + x)"
    s"""WITH maxc AS (
       |  SELECT doc_id, max(c) AS max_cnt
       |  FROM (SELECT doc_id, tok, count(*) AS c
       |        FROM (SELECT doc_id, unnest($t) AS tok FROM documents)
       |        GROUP BY 1, 2)
       |  GROUP BY 1),
       |base AS (SELECT doc_id,
       |  CAST(len($t) AS BIGINT) AS n_tokens,
       |  CASE WHEN len($t) > 0
       |       THEN ${rSql(s"CAST($sumLen AS DOUBLE) / len($t)", 4)} END
       |    AS mean_word_len,
       |  CASE WHEN len($t) >= 3
       |       THEN ${rSql(s"1.0 - CAST(len(${shingles3Sql(t)}) AS DOUBLE)" +
        s" / (len($t) - 2)", 4)} END
       |    AS dup_3gram_frac,
       |  CASE WHEN length(text) > 0
       |       THEN ${rSql("CAST(len(regexp_extract_all(text, '[a-z]')) " +
        "AS DOUBLE) / length(text)", 4)} END
       |    AS alpha_ratio
       |FROM documents)
       |SELECT doc_id, n_tokens, mean_word_len,
       |  CASE WHEN n_tokens > 0
       |       THEN ${rSql("CAST(max_cnt AS DOUBLE) / n_tokens", 4)} END
       |    AS max_token_frac,
       |  dup_3gram_frac, alpha_ratio,
       |  coalesce(n_tokens >= 20
       |    AND mean_word_len BETWEEN 2.0 AND 12.0
       |    AND ${rSql("CAST(max_cnt AS DOUBLE) / n_tokens", 4)} <= 0.2
       |    AND dup_3gram_frac <= 0.2
       |    AND alpha_ratio >= 0.5, false) AS gopher_pass
       |FROM base LEFT JOIN maxc USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** t07 — test-set decontamination: fraction of each corpus document's
    * word-3-grams that also occur in a held-out probe set (here the
    * deterministic `doc_id % 97 = 0` slice plays the benchmark). The
    * standard pre-training hygiene pass: any training doc overlapping a
    * benchmark above threshold is flagged for removal.
    *
    * Scale: the probe side is a BENCHMARK set — thousands of docs against a
    * 100 TB corpus — so its distinct shingle set broadcasts; the corpus
    * side is one explode + one broadcast-hash semi-count + one per-doc
    * groupBy. No shuffle touches the probe side.
    */
  def t07Decontaminate(s: SparkSession, dir: String): DataFrame = {
    // cached: probe, totals, and hits all consume the exploded shingles —
    // uncached, the corpus would be tokenized and shingled three times
    val sh = Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(shingles3(col("t"))).as("s"))
      .tracked
    val probe = sh.filter(col("doc_id") % 97 === 0).select("s").distinct()
    val corpus = sh.filter(col("doc_id") % 97 =!= 0)
    val totals = corpus.groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"))
    val hits = corpus.join(broadcast(probe), Seq("s"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    totals.join(hits, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("contamination",
        r(col("n_hit").cast("double") / col("n_shingles"), 4))
      .withColumn("is_contaminated", col("contamination") >= 0.8)
      .orderBy("doc_id")
  }

  private def t07Sql = {
    val t = tokensSql("text")
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(${shingles3Sql("tt")}) AS s
       |  FROM (SELECT doc_id, $t AS tt FROM documents)
       |  WHERE len(tt) >= 3),
       |probe AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
       |corpus AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0),
       |totals AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
       |           FROM corpus GROUP BY 1),
       |hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit
       |         FROM corpus JOIN probe USING (s) GROUP BY 1)
       |SELECT t.doc_id, t.n_shingles, coalesce(h.n_hit, 0) AS n_hit,
       |  ${rSql("CAST(coalesce(h.n_hit, 0) AS DOUBLE) / t.n_shingles", 4)}
       |    AS contamination,
       |  ${rSql("CAST(coalesce(h.n_hit, 0) AS DOUBLE) / t.n_shingles", 4)} >= 0.8
       |    AS is_contaminated
       |FROM totals t LEFT JOIN hits h ON t.doc_id = h.doc_id
       |ORDER BY t.doc_id""".stripMargin
  }

  private val ChunkTokens = 50L

  /** t08 — sequence packing: split every document into fixed-token-budget
    * chunks (the pre-tokenization step that turns a ragged corpus into
    * training rows). One `explode(sequence(...))` fan-out per doc — rows
    * multiply by ceil(n_tokens/budget) but stay narrow (four longs), and
    * the fan-out happens AFTER column pruning so the scan never rereads
    * text per chunk. No shuffle at all until the verify dump's order-by.
    */
  def t08ChunkPack(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"),
        // `div`, not `/`: Spark's `/` on longs is true division (double)
        explode(sequence(lit(0L), expr(s"(n_tokens - 1) div $ChunkTokens")))
          .as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * ChunkTokens + 1).as("tok_start"),
        least(col("n_tokens"), (col("chunk_idx") + 1) * ChunkTokens)
          .as("tok_end"))
      .withColumn("n_chunk_tokens", col("tok_end") - col("tok_start") + 1)
      .orderBy("doc_id", "chunk_idx")

  private def t08Sql = {
    val t = tokensSql("text")
    s"""SELECT doc_id, chunk_idx,
       |  chunk_idx * $ChunkTokens + 1 AS tok_start,
       |  least(n_tokens, (chunk_idx + 1) * $ChunkTokens) AS tok_end,
       |  least(n_tokens, (chunk_idx + 1) * $ChunkTokens)
       |    - (chunk_idx * $ChunkTokens + 1) + 1 AS n_chunk_tokens
       |FROM (
       |  SELECT doc_id, n_tokens,
       |    unnest(range(0, (n_tokens - 1) // $ChunkTokens + 1)) AS chunk_idx
       |  FROM (SELECT doc_id, CAST(len($t) AS BIGINT) AS n_tokens
       |        FROM documents)
       |  WHERE n_tokens > 0)
       |ORDER BY doc_id, chunk_idx""".stripMargin
  }

  /** PII patterns shared by the Spark plan and the oracle SQL — RE2-safe
    * (no backreferences/lookaround) so Java regex and DuckDB agree.
    */
  private val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    ("phone", "\\+1-555-[0-9]{4}", "<PHONE>"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"))

  /** t09 — PII scrubbing: count and redact email / phone / SSN patterns,
    * emitting per-doc counts and the fingerprint of the REDACTED text (the
    * publishable corpus). The synthetic documents contain no PII, so the
    * operator deterministically plants contact lines on a doc_id schedule
    * first — the same planted-probe technique as t07's decontamination
    * fixtures — and the redaction chain then runs over the enriched text
    * exactly as it would over a real corpus.
    *
    * Scale: a pure narrow projection (regexp count + chained
    * regexp_replace), scan-bound with zero shuffle before the
    * presentation sort; patterns stay in whole-stage codegen.
    */
  def t09PiiRedact(s: SparkSession, dir: String): DataFrame = {
    val planted = Tables.documents(s, dir)
      .select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          concat(lit(" id 123-45-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit(""))).as("text"))
    val counted = PiiPatterns.foldLeft(planted) { case (df, (name, pat, _)) =>
      df.withColumn(s"n_$name",
        size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long"))
    }
    // SSN first: the email pattern can never swallow it, but a phone/SSN
    // containing digit run must be gone before broader patterns rewrite
    // the text; order is fixed and mirrored in SQL
    val redacted = PiiPatterns.reverse.foldLeft(counted) {
      case (df, (_, pat, repl)) =>
        df.withColumn("text", regexp_replace(col("text"), pat, repl))
    }
    redacted
      .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ssn"),
        charFingerprint(col("text")).as("clean_fp"))
      .filter(col("n_email") + col("n_phone") + col("n_ssn") > 0)
      .orderBy("doc_id")
  }

  private def t09Sql = {
    val planted = "text || " +
      "CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END || " +
      "CASE WHEN doc_id % 11 = 0 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END || " +
      "CASE WHEN doc_id % 13 = 0 THEN ' id 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    val counts = PiiPatterns.map { case (name, pat, _) =>
      s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_$name"
    }.mkString(",\n  ")
    val redact = PiiPatterns.reverse.foldLeft("text") {
      case (e, (_, pat, repl)) => s"regexp_replace($e, '$pat', '$repl', 'g')"
    }
    s"""SELECT doc_id, n_email, n_phone, n_ssn,
       |  ${charFingerprintSql("clean_text")} AS clean_fp
       |FROM (
       |  SELECT doc_id, $counts,
       |    $redact AS clean_text
       |  FROM (SELECT doc_id, $planted AS text FROM documents))
       |WHERE n_email + n_phone + n_ssn > 0
       |ORDER BY doc_id""".stripMargin
  }

  /** Merge-candidate pairs kept by [[t13BpePairs]]. */
  private val BpeTopK = 20

  /** t13 — BPE merge-candidate statistics (the tokenizer-training
    * primitive): count every adjacent character pair inside every corpus
    * word and keep the top [[BpeTopK]]. One BPE training iteration IS
    * exactly this count over the current symbol sequences — the argmax
    * pair becomes the next merge, the sequences re-segment, and the count
    * repeats; exposing the first iteration's full statistics pins the
    * primitive while staying oracle-checkable (later iterations depend on
    * re-segmentation state, not on any new engine capability).
    *
    * Scale: the explode fans out ~word-length rows per token, but the
    * aggregate key space is at most alphabet² pairs — partial (map-side)
    * aggregation collapses the fan-out before the shuffle, and the top-k
    * is a `TakeOrderedAndProject`, never a global sort.
    */
  def t13BpePairs(s: SparkSession, dir: String): DataFrame =
    graft.Par.spread(Tables.documents(s, dir), col("doc_id"))
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(transform(sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(BpeTopK)

  private def t13Sql =
    s"""SELECT pair, CAST(count(*) AS BIGINT) AS cnt
       |FROM (
       |  SELECT unnest(list_transform(range(1, len(w)), i -> w[i:i+1])) AS pair
       |  FROM (SELECT unnest(${tokensSql("text")}) AS w FROM documents)
       |  WHERE len(w) >= 2)
       |GROUP BY 1
       |ORDER BY cnt DESC, pair
       |LIMIT $BpeTopK""".stripMargin

  /** t14 — character-diversity quality signals, one narrow per-row pass:
    * distinct-char count, Simpson concentration index Σpᵢ² (1/Simpson is
    * the "effective alphabet size" — keyboard-mash and repeated-char spam
    * score near 1), and the top character's share. The log-free cousin of
    * char entropy, chosen deliberately: `log` is NOT correctly-rounded
    * IEEE (libm implementations disagree in the last ulp, poisoning an
    * exact-hash oracle), while pᵢ = cᵢ/n and pᵢ·pᵢ are single IEEE ops —
    * bit-identical in every engine.
    *
    * Determinism of the sum: `list_distinct` order is engine-defined, so
    * the Σpᵢ² fold cannot add raw doubles (addition order would differ).
    * Each term is snapped to a scaled LONG (floor(pᵢ²·1e8 + 0.5)) and the
    * fold sums integers — order-independent, exact.
    *
    * Scale: explode → (doc, char) count → one per-doc aggregate. The
    * original spelling was per-row higher-order-function math ("zero
    * shuffle, stays in codegen") — and a measured trap: per row it
    * rescans the char array once per DISTINCT char (O(len·|Σ|), with the
    * lambda filter outside vectorized codegen), which priced at 20.7 s
    * at sf0.1 once the round-12 noop-sink bench stopped count() from
    * pruning the whole projection. The explode spelling is O(len) rows
    * through two hash aggregates (map-side partial combine collapses
    * each partition to ≤ docs·|Σ| rows before the shuffle) and one
    * count-table-sized window; empty-char docs rejoin via left join so
    * the output contract (n_chars = 0, null ratios) is unchanged.
    */
  def t14CharDiversity(s: SparkSession, dir: String): DataFrame = {
    val chars = filter(split(col("text"), ""), c => c =!= "")
    val docs = graft.Par.spread(Tables.documents(s, dir), col("doc_id"))
    val cnt = docs
      .select(col("doc_id"), explode(chars).as("c"))
      .groupBy(col("doc_id"), col("c"))
      .agg(count(lit(1)).as("x"))
    // per-doc total BEFORE the final fold: a window over the count table
    // (≤ |Σ| rows per doc), partitioned on the same key the aggregate
    // below shuffles on — one exchange serves both
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val scaled = cnt.withColumn("n", sum(col("x")).over(w))
      .withColumn("p", col("x").cast("double") / col("n").cast("double"))
      .withColumn("sc", floor(col("p") * col("p") * lit(1e8) + lit(0.5))
        .cast("long"))
    val per = scaled.groupBy("doc_id").agg(
      max(col("n")).as("n_chars"),
      count(lit(1)).as("n_distinct_chars"),
      (sum(col("sc")).cast("double") / lit(1e8)).as("simpson"),
      r(max(col("x")).cast("double") / max(col("n")), 4).as("top_char_share"))
    // null-text docs keep NULL counts (size(null) semantics of the
    // original spelling and the DuckDB mirror); empty-text docs get 0s
    docs.select(col("doc_id"), col("text").isNotNull.as("has_text"))
      .join(per, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        when(col("has_text"), coalesce(col("n_chars"), lit(0L)))
          .otherwise(lit(null).cast("long")).as("n_chars"),
        when(col("has_text"), coalesce(col("n_distinct_chars"), lit(0L)))
          .otherwise(lit(null).cast("long")).as("n_distinct_chars"),
        col("simpson"), col("top_char_share"))
      .orderBy("doc_id")
  }

  private def t14Sql =
    s"""SELECT doc_id,
       |  CAST(len(chars) AS BIGINT) AS n_chars,
       |  CAST(len(list_distinct(chars)) AS BIGINT) AS n_distinct_chars,
       |  CASE WHEN len(chars) > 0 THEN
       |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(
       |        list_transform(list_distinct(chars),
       |          c -> CAST(len(list_filter(chars, x -> x = c)) AS BIGINT)),
       |        x -> CAST(floor(
       |          (CAST(x AS DOUBLE) / CAST(len(chars) AS BIGINT))
       |          * (CAST(x AS DOUBLE) / CAST(len(chars) AS BIGINT))
       |          * 1e8 + 0.5) AS BIGINT))),
       |      (acc, x) -> acc + x) AS DOUBLE) / 1e8
       |  END AS simpson,
       |  CASE WHEN len(chars) > 0 THEN
       |    ${rSql(s"CAST(list_max(list_transform(list_distinct(chars), " +
        s"c -> CAST(len(list_filter(chars, x -> x = c)) AS BIGINT))) " +
        s"AS DOUBLE) / CAST(len(chars) AS BIGINT)", 4)}
       |  END AS top_char_share
       |FROM (SELECT doc_id,
       |        list_filter(string_split(text, ''), c -> c <> '') AS chars
       |      FROM documents)
       |ORDER BY doc_id""".stripMargin

  /** Count-min sketch geometry + heavy-hitter threshold for e12. Width
    * must be a small multiple of 1/share for the candidate filter to
    * PRUNE: expected cell load is total/width, and with width ≲ 1/share
    * every cell already exceeds the share·total threshold, so the probe
    * admits the whole vocabulary and pass 2 degenerates into a full
    * recount. 1024 = 10× the 1/share=100 line → expected load ≈ 0.1% of
    * total per cell, an order under the 1% threshold.
    */
  val CmsDepth = 4
  val CmsWidth = 1024
  val HhShare = 0.01

  /** e12 — heavy hitters via a MERGEABLE count-min sketch + exact
    * recount (the two-pass guarantee): (1) per SOURCE, count token
    * occurrences into a fixed d×w cell grid (depth independent xxhash64
    * rows); summing cells across sources IS the corpus sketch — the same
    * re-aggregatable shape as e09's HLL union, sized d·w cells no matter
    * how many tokens flow through; (2) probe the sketch for every
    * distinct token (estimate = min over depth rows, which NEVER
    * underestimates), keep candidates ≥ the threshold; (3) exactly
    * recount ONLY the candidates and filter again.
    *
    * Because CMS overestimates, pass 2's candidate set is a superset of
    * the true heavy hitters, and the final recount-filter emits EXACTLY
    * the tokens with count ≥ ⌈share·total⌉ — so the oracle is the plain
    * exact GROUP BY/HAVING, independent of hash choice or collisions
    * (which is what lets the Spark side use native xxhash64 freely).
    *
    * Scale: the sketch build is one map-side-combined groupBy onto d·w
    * cells; the probe joins the DISTINCT vocabulary (not occurrences)
    * against a broadcast-size cell table; the recount semi-joins the
    * candidate set (true heavy hitters are ≤ 1/share by Markov; FALSE
    * candidates are governed by width — see the CmsWidth note — so the
    * set stays near that line) back onto occurrences.
    * At 100 TB the win is the incremental form: per-partition/day
    * sketches persist tiny and merge by cell-sum without rescanning.
    */
  /** The d CMS (row, bucket) coordinates of a token — ONE definition for
    * the batch sketch (e12), its probes, and the streaming twin
    * (`CorpusStream.cmsCells`), so the grids they build are mergeable
    * with each other by construction.
    */
  private[graft] def cmsBuckets(w: Column): Column =
    array((0 until CmsDepth).map(j =>
      struct(lit(j).as("j"),
        pmod(xxhash64(lit(j), w), lit(CmsWidth.toLong)).as("b"))): _*)

  def e12HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val occ = Tables.documents(s, dir)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .tracked
    val tot = occ.agg(count(lit(1)).as("total"))
    // per-source cell grids, merged by cell-sum (the mergeable sketch)
    val perSource = occ
      .select(col("source"), explode(cmsBuckets(col("w"))).as("c"))
      .groupBy(col("source"), col("c.j").as("j"), col("c.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val cms = perSource.groupBy("j", "b").agg(sum("cnt").as("cnt"))
    val probes = occ.select("w").distinct()
      .select(col("w"), explode(cmsBuckets(col("w"))).as("c"))
      .select(col("w"), col("c.j").as("j"), col("c.b").as("b"))
    val candidates = probes.join(cms, Seq("j", "b"))
      .groupBy("w").agg(min("cnt").as("est"))
      .crossJoin(broadcast(tot))
      .filter(col("est") >= ceil(col("total") * lit(HhShare)).cast("long"))
      .select("w")
    occ.join(candidates, Seq("w"), "left_semi")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .filter(col("cnt") >= ceil(col("total") * lit(HhShare)).cast("long"))
      .select(col("w").as("token"), col("cnt"),
        r(col("cnt").cast("double") / col("total"), 6).as("share"))
      .orderBy(col("cnt").desc, col("token"))
  }

  private def e12Sql =
    s"""WITH occ AS (SELECT unnest(${tokensSql("text")}) AS w FROM documents),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM occ)
       |SELECT w AS token, CAST(count(*) AS BIGINT) AS cnt,
       |  ${rSql("CAST(count(*) AS DOUBLE) / total", 6)} AS share
       |FROM occ, tot
       |GROUP BY w, total
       |HAVING count(*) >= CAST(ceil(total * $HhShare) AS BIGINT)
       |ORDER BY cnt DESC, token""".stripMargin

  /** t18 — Zipf sanity check over the corpus vocabulary: the top-30
    * tokens with rank, count, and the rank·count product — under Zipf's
    * law the product is roughly constant, and a corpus whose head
    * products TREND (rising: templated boilerplate flooding the head;
    * collapsing: vocabulary truncation) fails the naturalness screen.
    * Everything emitted is an exact integer except the 6-dp share; rank
    * comes from `row_number` over the 30-row `TakeOrderedAndProject`
    * result — the only window runs on the k-row frame, never the
    * vocabulary (t05's broadcast-total discipline).
    */
  def t18ZipfCheck(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = graft.Par.spread(Tables.documents(s, dir), col("doc_id"))
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .tracked // total scalar + top-k both read it
    val total = counts.agg(sum(col("cnt")).as("total"))
    val top = counts.orderBy(col("cnt").desc, col("token")).limit(30)
    top
      .withColumn("rnk", // bounded: ranks 30 rows, not the vocabulary
        row_number().over(Window.orderBy(col("cnt").desc, col("token"))))
      .crossJoin(broadcast(total))
      .select(col("rnk"), col("token"), col("cnt"),
        (col("rnk") * col("cnt")).as("zipf_product"),
        r(col("cnt").cast("double") / col("total").cast("double"), 6)
          .as("share"))
      .orderBy("rnk")
  }

  private def t18Sql = {
    val t = tokensSql("text")
    s"""WITH counts AS (
       |  SELECT token, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest($t) AS token FROM documents) GROUP BY 1),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts),
       |top AS (
       |  SELECT token, cnt,
       |    CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT) AS rnk
       |  FROM counts ORDER BY cnt DESC, token LIMIT 30)
       |SELECT rnk, token, cnt, rnk * cnt AS zipf_product,
       |  ${rSql("CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)", 6)} AS share
       |FROM top CROSS JOIN tot
       |ORDER BY rnk""".stripMargin
  }

  /** Retrieval-chunk window/stride (tokens): 50-token chunks every 40
    * tokens → 10-token overlap, the context-continuity margin.
    */
  private val RagWindow = 50L
  private val RagStride = 40L

  /** t19 — OVERLAPPING sliding-window chunking, the retrieval-side
    * (RAG-indexing) counterpart of t08's disjoint training packing: chunks
    * of [[RagWindow]] tokens start every [[RagStride]] tokens, so
    * consecutive chunks share window−stride tokens of context — an answer
    * span straddling a cut boundary appears whole in the next chunk.
    * Chunk count per doc = ceil(max(0, n−window)/stride) + 1: the LAST
    * chunk is the first whose end reaches the doc's end — no trailing
    * chunk fully contained in its predecessor.
    *
    * Scale: t08's shape exactly — one pruned scan, an `explode(sequence)`
    * fan-out of four narrow longs per chunk, no shuffle before the dump's
    * order-by; the text itself is never re-read per chunk.
    */
  def t19ChunkOverlap(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0L),
          expr(s"(greatest(n_tokens - $RagWindow, 0) + $RagStride - 1)" +
            s" div $RagStride"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * RagStride + 1).as("tok_start"),
        least(col("n_tokens"), col("chunk_idx") * RagStride + RagWindow)
          .as("tok_end"))
      .select(col("doc_id"), col("chunk_idx"), col("tok_start"), col("tok_end"),
        (col("tok_end") - col("tok_start") + 1).as("n_chunk_tokens"),
        // context shared with the PREVIOUS chunk (0 for the first)
        when(col("chunk_idx") > 0,
          greatest(
            least(col("tok_end"), (col("chunk_idx") - 1) * RagStride + RagWindow)
              - col("tok_start") + 1, lit(0L)))
          .otherwise(lit(0L)).as("overlap_prev"))
      .orderBy("doc_id", "chunk_idx")

  private def t19Sql = {
    val t = tokensSql("text")
    s"""SELECT doc_id, chunk_idx,
       |  chunk_idx * $RagStride + 1 AS tok_start,
       |  least(n_tokens, chunk_idx * $RagStride + $RagWindow) AS tok_end,
       |  least(n_tokens, chunk_idx * $RagStride + $RagWindow)
       |    - (chunk_idx * $RagStride + 1) + 1 AS n_chunk_tokens,
       |  CASE WHEN chunk_idx > 0 THEN greatest(
       |    least(least(n_tokens, chunk_idx * $RagStride + $RagWindow),
       |          (chunk_idx - 1) * $RagStride + $RagWindow)
       |      - (chunk_idx * $RagStride + 1) + 1, 0)
       |  ELSE 0 END AS overlap_prev
       |FROM (
       |  SELECT doc_id, n_tokens,
       |    unnest(range(0,
       |      (greatest(n_tokens - $RagWindow, 0) + $RagStride - 1)
       |        // $RagStride + 1)) AS chunk_idx
       |  FROM (SELECT doc_id, CAST(len($t) AS BIGINT) AS n_tokens
       |        FROM documents)
       |  WHERE n_tokens > 0)
       |ORDER BY doc_id, chunk_idx""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t19_chunk_overlap" -> (t19ChunkOverlap _),
    "t18_zipf_check" -> (t18ZipfCheck _),
    "t14_char_diversity" -> (t14CharDiversity _),
    "e12_heavy_hitters" -> (e12HeavyHitters _),
    "t13_bpe_pairs" -> (t13BpePairs _),
    "t01_token_stats" -> (t01TokenStats _),
    "t02_lang_id" -> (t02LangId _),
    "t03_quality_score" -> (t03QualityScore _),
    "t04_fingerprint" -> (t04Fingerprint _),
    "t05_token_freq" -> (t05TokenFreq _),
    "t20_vocab_growth" -> (t20VocabGrowth _),
    "t21_fuzzy_decontam" -> (t21FuzzyDecontam _),
    "t23_lang_confusion" -> (t23LangConfusion _),
    "t06_repetition_rules" -> (t06RepetitionRules _),
    "t07_decontaminate" -> (t07Decontaminate _),
    "t08_chunk_pack" -> (t08ChunkPack _),
    "t09_pii_redact" -> (t09PiiRedact _))

  val oracles: Map[String, String] = Map(
    "t19_chunk_overlap" -> t19Sql,
    "t18_zipf_check" -> t18Sql,
    "t14_char_diversity" -> t14Sql,
    "e12_heavy_hitters" -> e12Sql,
    "t13_bpe_pairs" -> t13Sql,
    "t01_token_stats" -> t01Sql,
    "t02_lang_id" -> t02Sql,
    "t03_quality_score" -> t03Sql,
    "t04_fingerprint" -> t04Sql,
    "t05_token_freq" -> t05Sql,
    "t20_vocab_growth" -> t20Sql,
    "t21_fuzzy_decontam" -> t21Sql,
    "t23_lang_confusion" -> t23Sql,
    "t06_repetition_rules" -> t06Sql,
    "t07_decontaminate" -> t07Sql,
    "t08_chunk_pack" -> t08Sql,
    "t09_pii_redact" -> t09Sql)
}
