package graft.operators

import graft.Caches.Tracked
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Language-model-flavoured corpus operators: C4-style boilerplate line
  * removal (t10) and an n-gram language-model quality score (t11) — the two
  * filters a pre-training pipeline runs between the cheap per-row rules
  * (TextOps t03/t06) and the expensive near-dedup shuffle (Dedup d03/d06).
  *
  * Extends the reference's surface (its text handling stops at CSV columns,
  * e.g. `1_exploration.ipynb`'s schema walk) with the corpus-hygiene steps
  * published pipelines (C4, Gopher, CCNet) standardise on.
  *
  * Scale notes are per-operator; the shared design rule is that every
  * model-side table here (frequent-line set, vocabulary, n-gram counts) is
  * CAPPED to a size independent of corpus size, so each one broadcasts and
  * the 100 TB corpus side never shuffles except where stated.
  */
object LmOps {
  import TextFn._

  /** A line survives unless it appears in at least this many documents. */
  val MinLineDf = 10L

  /** Boilerplate lines planted on a doc_id schedule (same planted-probe
    * technique as t09's PII): the synthetic corpus has no page chrome, so
    * the operator enriches each document into a multi-line "page" first,
    * then removes the lines whose document frequency crosses [[MinLineDf]]
    * — exactly what C4's line-level dedup does to cookie banners.
    */
  val Boilerplate: Seq[(Int, String)] = Seq(
    2 -> "subscribe to our newsletter for updates",
    3 -> "copyright 2026 example corp all rights reserved",
    5 -> "accept cookies to continue")

  private def pageLines = {
    val planted = Boilerplate.map { case (m, line) =>
      when(col("doc_id") % m === 0, array(lit(line)))
        .otherwise(array().cast("array<string>"))
    }
    concat(array(col("text")) +: planted: _*)
  }

  private def pageLinesSql = {
    val planted = Boilerplate.map { case (m, line) =>
      s"CASE WHEN doc_id % $m = 0 THEN ['$line'] ELSE CAST([] AS VARCHAR[]) END"
    }.mkString(" || ")
    s"[text] || $planted"
  }

  /** t10 — boilerplate line removal (C4-style line dedup): split every page
    * into lines, count each distinct line's document frequency across the
    * corpus, drop lines with df ≥ [[MinLineDf]], reassemble the page, and
    * emit per-doc line accounting plus the fingerprint of the cleaned text.
    *
    * Scale: the line-df aggregate is the word-count shape (map-side combine
    * collapses each task to its distinct lines before one shuffle); the
    * frequent-line set's bound is corpus_lines / K — LINEAR in corpus size,
    * not constant — so the removal join carries NO broadcast hint: AQE
    * broadcasts it when it is actually small and shuffles when it is not
    * (the c09 discipline). The corpus side's only guaranteed wide exchange
    * is the per-doc reassembly groupBy.
    * Lines appear once per page here so `count(*)` IS document frequency;
    * a corpus with repeated lines inside one page would use
    * `count(DISTINCT doc_id)`.
    */
  def t10LineDedup(s: SparkSession, dir: String): DataFrame = {
    val pages = graft.Par.spread(Tables.documents(s, dir), col("doc_id"))
      .select(col("doc_id"), pageLines.as("lines"))
      .withColumn("n_lines", size(col("lines")).cast("long"))
      .tracked
    // cached for the same reason capShingles caches its hot list: the
    // TableCacheQueryStage boundary sits AFTER the df filter, so the size
    // AQE prices for its broadcast-vs-shuffle call is the TRUE
    // frequent-line set — not the pre-filter line-df shuffle, which is
    // linear in corpus size (PlanSpec pins the runtime behavior on the
    // capShingles twin of this shape)
    val freq = pages
      .select(explode(col("lines")).as("line"))
      .groupBy("line").agg(count(lit(1)).as("df"))
      .filter(col("df") >= MinLineDf)
      .select("line")
      .tracked
    val kept = pages
      .select(col("doc_id"), posexplode(col("lines")).as(Seq("pos", "line")))
      .join(freq, Seq("line"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(sort_array(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")), "\n").as("clean_text"))
    pages.join(kept, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        charFingerprint(coalesce(col("clean_text"), lit(""))).as("clean_fp"))
      .orderBy("doc_id")
  }

  private def t10Sql =
    s"""WITH pages AS (
       |  SELECT doc_id, $pageLinesSql AS lines FROM documents),
       |expl AS (
       |  SELECT doc_id, i AS pos, lines[i] AS line
       |  FROM (SELECT doc_id, lines, unnest(range(1, len(lines) + 1)) AS i
       |        FROM pages)),
       |freq AS (SELECT line FROM (SELECT line, count(*) AS df FROM expl
       |                           GROUP BY 1) WHERE df >= $MinLineDf),
       |clean AS (
       |  SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       |    string_agg(e.line, chr(10) ORDER BY e.pos) AS clean_text
       |  FROM expl e LEFT JOIN freq f ON e.line = f.line
       |  WHERE f.line IS NULL
       |  GROUP BY 1)
       |SELECT p.doc_id, CAST(len(p.lines) AS BIGINT) AS n_lines,
       |  coalesce(c.n_kept, 0) AS n_kept,
       |  CAST(len(p.lines) AS BIGINT) - coalesce(c.n_kept, 0) AS n_removed,
       |  ${charFingerprintSql("coalesce(c.clean_text, '')")} AS clean_fp
       |FROM pages p LEFT JOIN clean c ON p.doc_id = c.doc_id
       |ORDER BY p.doc_id""".stripMargin

  /** Vocabulary cap for the LM: tokens outside the top-[[VocabSize]] map to
    * `<unk>`. Deliberately smaller than the test corpus' vocabulary so the
    * OOV path is exercised at sf0.01, not only at scale.
    */
  val VocabSize = 20

  /** t11 — bigram language-model scoring (the KenLM-style quality filter):
    * build a vocabulary-capped add-one-smoothed bigram LM from the corpus
    * itself, then score every document by its average negative log
    * likelihood — low-perplexity ≈ fluent, high ≈ gibberish/boilerplate.
    *
    * Per-term determinism: the probability `(c(w1,w2)+1) / (c(w1)+|V|)` is
    * an IEEE divide of exact integers (bit-identical on both engines); its
    * `ln` may differ in the last ulp across libm implementations, so each
    * term is snapped to 6 dp and summed through an exact DECIMAL(38,8)
    * carrier — order-independent, engine-independent (Det §notes).
    *
    * Scale: the model tables are all CAPPED — vocabulary at [[VocabSize]],
    * so unigram counts ≤ V+1 rows and bigram counts ≤ (V+1)² rows no matter
    * the corpus size — and therefore broadcast; scoring is corpus-scan +
    * broadcast joins + one per-doc groupBy. The lone wide exchange is the
    * lag window keyed (doc_id, pos) that forms bigrams; an array-native
    * variant could even avoid that by zipping adjacent tokens per row.
    */
  def t11LmScore(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .tracked
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok"))
      .limit(VocabSize)
      .select(col("tok"), lit(1).as("in_v"))
    val mapped = toks
      .join(broadcast(vocab), Seq("tok"), "left_outer")
      .select(col("doc_id"), col("pos"),
        when(col("in_v") === 1, col("tok")).otherwise("<unk>").as("w"))
      .tracked
    val uni = mapped.groupBy(col("w").as("w1"))
      .agg(count(lit(1)).as("cu"))
    val vt = uni.agg(count(lit(1)).as("vt"))
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val bigrams = mapped
      .withColumn("w1", lag(col("w"), 1).over(byPos))
      .filter(col("w1").isNotNull)
      .select(col("doc_id"), col("w1"), col("w").as("w2"))
    val cb = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    bigrams
      // bounded: cb ≤ (VocabSize+1)² rows, uni ≤ VocabSize+1 rows — the
      // <unk>-capped model tables, constant-size at any corpus scale
      .join(broadcast(cb), Seq("w1", "w2"))
      .join(broadcast(uni), Seq("w1"))
      .crossJoin(broadcast(vt))
      .withColumn("term",
        r(log((col("cb") + 1).cast("double")
          / (col("cu") + col("vt")).cast("double")), 6))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        r(-sum(col("term").cast("decimal(38,8)")).cast("double")
          / count(lit(1)), 4).as("avg_nll"))
      .orderBy("doc_id")
  }

  private def t11Sql = {
    val t = tokensSql("text")
    val term = rSql("ln(CAST(cb + 1 AS DOUBLE) / CAST(cu + vt AS DOUBLE))", 6)
    s"""WITH toks AS (
       |  SELECT doc_id, i AS pos, tt[i] AS tok
       |  FROM (SELECT doc_id, tt, unnest(range(1, len(tt) + 1)) AS i
       |        FROM (SELECT doc_id, $t AS tt FROM documents))),
       |vocab AS (
       |  SELECT tok FROM (
       |    SELECT tok, count(*) AS c FROM toks GROUP BY 1)
       |  ORDER BY c DESC, tok LIMIT $VocabSize),
       |mapped AS (
       |  SELECT t.doc_id, t.pos,
       |    CASE WHEN v.tok IS NOT NULL THEN t.tok ELSE '<unk>' END AS w
       |  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok),
       |uni AS (SELECT w AS w1, count(*) AS cu FROM mapped GROUP BY 1),
       |vts AS (SELECT count(*) AS vt FROM uni),
       |bg AS (SELECT a.doc_id, a.w AS w1, b.w AS w2
       |       FROM mapped a JOIN mapped b
       |         ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
       |cbs AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_bigrams,
       |  ${rSql("-CAST(sum(CAST(" + term + " AS DECIMAL(38,8))) AS DOUBLE)" +
        " / count(*)", 4)} AS avg_nll
       |FROM bg JOIN cbs USING (w1, w2) JOIN uni USING (w1) CROSS JOIN vts
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  private val TfidfTopK = 5

  /** t12 — TF-IDF keyword extraction: per-(doc, token) term frequency ×
    * smoothed inverse document frequency (`ln((N+1)/(df+1)) + 1`, the
    * sklearn convention), top-[[TfidfTopK]] terms per document — the
    * classic relevance weighting, and the embedding-free retrieval
    * baseline every corpus tool still ships.
    *
    * Determinism: tf and df are integers; N is a broadcast scalar; the
    * idf's `ln` is snapped to 6 dp before the product (libm ulp, Det
    * §notes) and the product of a small int with a 6-dp-snapped double is
    * IEEE-identical across engines, so ranking cannot diverge.
    *
    * Scale: tf is the word-count shape (map-side combine per doc); df
    * re-aggregates tf's output (already one row per (doc, token)); N
    * broadcasts; the only wide ops are the two counts and the per-doc
    * top-k window — all linear, no joins against the corpus text.
    */
  def t12Tfidf(s: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .tracked
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = tf.select("doc_id").distinct().agg(count(lit(1)).as("n_docs"))
    val byDoc = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("token"))
    // df is one row per DISTINCT token — Heaps-law sublinear but unbounded,
    // so no hard hint; n is a 1-row scalar
    tf.join(df, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("idf",
        r(log((col("n_docs") + 1).cast("double")
          / (col("df") + 1).cast("double")) + lit(1.0), 6))
      .withColumn("tfidf", col("tf").cast("double") * col("idf"))
      .withColumn("rk", row_number().over(byDoc).cast("long"))
      .filter(col("rk") <= TfidfTopK)
      .select("doc_id", "rk", "token", "tf", "df", "idf", "tfidf")
      .orderBy("doc_id", "rk")
  }

  private def t12Sql = {
    val t = tokensSql("text")
    val idf = rSql(
      "ln(CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)) + 1.0", 6)
    s"""WITH tf AS (
       |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest($t) AS token FROM documents)
       |  GROUP BY 1, 2),
       |dfs AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |ns AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
       |scored AS (
       |  -- ($idf) parenthesized: the rounding helper ends in "/ 1e6", and
       |  -- left-assoc "tf * floor(...) / 1e6" is a DIFFERENT float op order
       |  -- than Spark's tf * (floor(...) / 1e6) — one ulp apart
       |  SELECT doc_id, token, tf, df, $idf AS idf,
       |    CAST(tf AS DOUBLE) * ($idf) AS tfidf
       |  FROM tf JOIN dfs USING (token) CROSS JOIN ns)
       |SELECT doc_id, rk, token, tf, df, idf, tfidf
       |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
       |        ORDER BY tfidf DESC, token) AS BIGINT) AS rk
       |      FROM scored)
       |WHERE rk <= $TfidfTopK ORDER BY doc_id, rk""".stripMargin
  }

  /** t15 — cross-snapshot novelty rate: for every document in the DELTA
    * snapshot (the re-crawl, `doc_id % 3 = 0` — c04's convention), the
    * fraction of its distinct word-3-gram shingles that do NOT appear
    * anywhere in the BASE snapshot (`doc_id % 5 <> 0`), plus a one-row
    * corpus rollup appended (doc_id NULL). The dataset-iteration metric a
    * curation team tracks release over release: novelty ≈ 0 means the
    * crawl is stale; novelty ≈ 1 means the distribution moved.
    *
    * Scale: base's distinct shingle set is the big side — the membership
    * test is a LEFT ANTI equi-join on the shingle (shuffle bounded by
    * distinct shingles, map-side pre-distinct on both sides), never a
    * broadcast (unlike t07's probe set, the base corpus does not fit).
    * The per-doc rate is a groupBy on the delta's doc_id; the rollup
    * re-aggregates the per-doc counts, not the shingles.
    */
  def t15NoveltyRate(s: SparkSession, dir: String): DataFrame = {
    // cached: the tokenize+shingle explode feeds base, novel AND perDoc —
    // without the cache the corpus scan runs three times
    val shingled = graft.Par.spread(Tables.documents(s, dir), col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(shingles3(col("t"))).as("sh"))
      .tracked
    val base = shingled.filter(col("doc_id") % 5 =!= 0)
      .select("sh").distinct()
    val delta = shingled.filter(col("doc_id") % 3 === 0)
    val novel = delta.join(base, Seq("sh"), "left_anti")
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    // cached: perDoc feeds both the union branch and the rollup's
    // re-aggregation — uncached, the anti-join + outer-join chain ran
    // twice (union branches share no subplan; UnionLintSpec enforces)
    val perDoc = delta.groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"))
      .join(novel, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty", r(col("n_novel").cast("double")
        / col("n_shingles"), 4))
      .tracked
    val rollup = perDoc.agg(
      lit(null).cast("long").as("doc_id"),
      sum(col("n_shingles")).as("n_shingles"),
      sum(col("n_novel")).as("n_novel"),
      r(sum(col("n_novel")).cast("double")
        / sum(col("n_shingles")), 4).as("novelty"))
    perDoc.unionByName(rollup).orderBy(col("doc_id").asc_nulls_last)
  }

  private def t15Sql = {
    val t = tokensSql("text")
    s"""WITH shingled AS (
       |  SELECT doc_id, unnest(${shingles3Sql("t")}) AS sh
       |  FROM (SELECT doc_id, $t AS t FROM documents)
       |  WHERE len(t) >= 3),
       |base AS (SELECT DISTINCT sh FROM shingled WHERE doc_id % 5 <> 0),
       |delta AS (SELECT * FROM shingled WHERE doc_id % 3 = 0),
       |novel AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_novel
       |  FROM delta WHERE sh NOT IN (SELECT sh FROM base)
       |  GROUP BY 1),
       |per_doc AS (
       |  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       |    coalesce(any_value(n.n_novel), 0) AS n_novel
       |  FROM delta d LEFT JOIN novel n ON d.doc_id = n.doc_id
       |  GROUP BY 1),
       |with_rate AS (
       |  SELECT doc_id, n_shingles, n_novel,
       |    ${rSql("CAST(n_novel AS DOUBLE) / n_shingles", 4)} AS novelty
       |  FROM per_doc)
       |SELECT * FROM with_rate
       |UNION ALL
       |SELECT CAST(NULL AS BIGINT), CAST(sum(n_shingles) AS BIGINT),
       |  CAST(sum(n_novel) AS BIGINT),
       |  ${rSql("CAST(sum(n_novel) AS DOUBLE) / sum(n_shingles)", 4)}
       |FROM with_rate
       |ORDER BY doc_id NULLS LAST""".stripMargin
  }

  /** Merge rounds for [[t16BpeMerges]]. */
  val BpeMergeRounds = 3

  /** t16 — the BPE MERGE LOOP (tokenizer training, not just pair stats):
    * starting from character symbols, each round (1) counts adjacent
    * symbol pairs over word TYPES weighted by corpus frequency, (2) picks
    * the most frequent pair (ties → lexicographically smallest), and
    * (3) merges that pair into one symbol everywhere — the exact
    * Sennrich et al. algorithm, with the merge table (rank, left, right,
    * merged, cnt) as output: the artifact a tokenizer ships.
    *
    * Words are spaced symbol strings (" h e l l o ") and a merge is a
    * LEFT FOLD over the symbol list: append each symbol, but when the
    * accumulator ends with exactly " l" and the next symbol is r, splice
    * them into the merged symbol — greedy left-to-right non-overlapping
    * pairing, exactly Sennrich's scan ("a a a" → "aa a", and after a
    * merge the new symbol cannot immediately re-merge). A string
    * `replace(' l r ' → ' lr ')` was rejected: adjacent disjoint pairs
    * SHARE their separator space, so non-overlapping string search skips
    * every second occurrence in runs — a silent deviation from BPE. The
    * fold is plain string ops (right/left/length/||) with a string
    * accumulator, identical in both engines, so the loop is exactly
    * oracle-checkable with [[BpeMergeRounds]] rounds unrolled as CTEs.
    * (Suffix check " l" cannot false-match a just-merged "…lr": symbols
    * are space-delimited, and "lr" ends in r's chars, not " l".)
    *
    * Scale: the corpus is touched ONCE (word-type frequencies — vocab-
    * bounded, map-side combined); every round then runs on the word-TYPE
    * table (|vocab| rows), counting pairs via a per-row transform and
    * merging via one broadcast 1-row best-pair join. This is why BPE
    * training is tractable at 100 TB: round cost scales with vocabulary,
    * not corpus.
    */
  def t16BpeMerges(s: SparkSession, dir: String): DataFrame = {
    val words = graft.Par.spread(Tables.documents(s, dir), col("doc_id"))
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(concat(lit(" "),
        concat_ws(" ", filter(split(col("w"), ""), c => c =!= "")),
        lit(" ")).as("seq"), col("freq"))
      .tracked
    def pairCounts(seqs: DataFrame): DataFrame = {
      val sym = split(trim(col("seq")), " ")
      // zip_with over two shifted slices, not transform(sequence(1, n-1)):
      // Spark's sequence DESCENDS when start > stop, so a single-symbol
      // word (n-1 = 0) would emit [1, 0] and hit index 0; slice length 0
      // is just empty
      val pairs = zip_with(
        slice(sym, lit(1), size(sym) - 1), slice(sym, lit(2), size(sym) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))
      seqs
        .select(explode(pairs).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
    }
    var seqs = words
    val merges = (1 to BpeMergeRounds).map { rank =>
      // eager-checkpointed: consumed by THIS round's merge AND the final
      // union — without it the pair count over the previous round runs twice
      val best = pairCounts(seqs)
        .orderBy(col("cnt").desc, col("l"), col("r")).limit(1)
        .select(col("l"), col("r"), col("cnt"))
        .transform(graft.Cut.cut)
      seqs = seqs.crossJoin(broadcast(best))
        .select(expr(
          """aggregate(
            |  filter(split(trim(seq), ' '), x -> x != ''),
            |  '',
            |  (acc, x) -> CASE
            |    WHEN right(acc, length(l) + 1) = ' ' || l AND x = r
            |    THEN left(acc, length(acc) - length(l) - 1) || ' ' || l || r
            |    ELSE acc || ' ' || x END,
            |  acc -> acc || ' ')""".stripMargin).as("seq"), col("freq"))
        .transform(graft.Cut.cut)
      best.select(lit(rank.toLong).as("merge_rank"), col("l"), col("r"),
        concat(col("l"), col("r")).as("merged"), col("cnt"))
    }
    merges.reduce(_ unionByName _).orderBy("merge_rank")
  }

  private def t16Sql = {
    def pairCte(from: String, out: String) =
      s"""$out AS (
         |  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(list_transform(
         |          range(1, greatest(len(sym), 1)),
         |          i -> {'l': sym[i], 'r': sym[i + 1]})) AS p, freq
         |        FROM (SELECT string_split(trim(seq), ' ') AS sym, freq
         |              FROM $from))
         |  GROUP BY 1, 2)""".stripMargin
    def bestCte(cnts: String, out: String) =
      s"""$out AS (SELECT l, r, cnt FROM $cnts
         |  ORDER BY cnt DESC, l, r LIMIT 1)""".stripMargin
    def mergeCte(from: String, best: String, out: String) =
      s"""$out AS (
         |  SELECT list_reduce(
         |    list_prepend('', list_filter(string_split(trim(seq), ' '),
         |                                 x -> x <> '')),
         |    (acc, x) -> CASE
         |      WHEN right(acc, length(b.l) + 1) = ' ' || b.l AND x = b.r
         |      -- no leading '||' on continuation lines: this fragment is
         |      -- re-embedded under the OUTER stripMargin, which would eat
         |      -- one pipe
         |      THEN left(acc, length(acc) - length(b.l) - 1) || ' ' || b.l || b.r
         |      ELSE acc || ' ' || x END) || ' ' AS seq, freq
         |  FROM $from, $best b)""".stripMargin
    val rounds = (1 to BpeMergeRounds).map { k =>
      Seq(pairCte(s"seq${k - 1}", s"cnt$k"), bestCte(s"cnt$k", s"best$k"),
        mergeCte(s"seq${k - 1}", s"best$k", s"seq$k")).mkString(",\n")
    }.mkString(",\n")
    val out = (1 to BpeMergeRounds).map { k =>
      s"SELECT CAST($k AS BIGINT) AS merge_rank, l, r, l || r AS merged, cnt FROM best$k"
    }.mkString("\nUNION ALL ")
    s"""WITH seq0 AS (
       |  SELECT ' ' || array_to_string(list_filter(string_split(w, ''),
       |           c -> c <> ''), ' ') || ' ' AS seq,
       |    CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(${tokensSql("text")}) AS w FROM documents)
       |  GROUP BY w),
       |$rounds
       |$out
       |ORDER BY merge_rank""".stripMargin
  }

  /** Rolling-window width (tokens) for [[t17SpanDedup]]. */
  val SpanW = 8

  /** t17 — duplicated-SUBSTRING accounting (the ExactSubstr shape of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better"): slide a [[SpanW]]-token window over every document, find
    * windows that occur in ≥ 2 DISTINCT documents, and report per document
    * how much of its text sits under at least one such duplicated window —
    * window counts, covered-token count (the exact interval-union of the
    * duplicated windows' spans, via the sorted-starts `least(W, next−s)`
    * telescope) and the covered fraction. Document-level near-dedup (d03)
    * misses partial overlap — a quote, a syndicated paragraph — which is
    * exactly what this catches; the coverage column is what ExactSubstr
    * would cut.
    *
    * Scale: the window table is n_tokens rows per doc (the same order as
    * the shingle tables d02–d06 already carry); the df aggregate is the
    * word-count shape with map-side combine. The duplicated-window set is
    * NOT broadcast (unlike t10's frequent lines it is corpus-sized in the
    * worst case) — membership is a shuffle equi-join on the window text,
    * bounded by distinct windows; at 100 TB hash the window to 8 bytes
    * first (xxhash64, exactly d06's dictionary-free trick). The coverage
    * window partitions by doc_id — per-task state is one doc's dup starts.
    */
  def t17SpanDedup(s: SparkSession, dir: String): DataFrame = {
    val toks = graft.Par.spread(Tables.documents(s, dir), col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .tracked
    val wins = toks.filter(col("n_tokens") >= SpanW)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("t")) - lit(SpanW - 1))).as("s"),
        col("t"))
      .select(col("doc_id"), col("s"),
        concat_ws(" ", slice(col("t"), col("s"), lit(SpanW))).as("win"))
      .tracked
    val dup = wins.groupBy("win")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2)
      .select("win")
    val byDoc = Window.partitionBy("doc_id").orderBy("s")
    val cov = wins.join(dup, Seq("win"))
      .withColumn("nxt", lead(col("s"), 1).over(byDoc))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("dup_windows"),
        sum(least(lit(SpanW.toLong),
          coalesce(col("nxt") - col("s"), lit(SpanW.toLong))))
          .cast("long").as("covered_tokens"))
    toks.select("doc_id", "n_tokens")
      .join(cov, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        greatest(col("n_tokens") - lit(SpanW - 1L), lit(0L)).as("n_windows"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        when(col("n_tokens") > 0,
          r(coalesce(col("covered_tokens"), lit(0L)).cast("double")
            / col("n_tokens"), 4)).otherwise(lit(0.0)).as("dup_frac"))
      .orderBy("doc_id")
  }

  private def t17Sql = {
    val t = tokensSql("text")
    s"""WITH toks AS (
       |  SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n_tokens
       |  FROM (SELECT doc_id, $t AS t FROM documents)),
       |wins AS (
       |  SELECT doc_id, s, array_to_string(t[s:s + ${SpanW - 1}], ' ') AS win
       |  FROM (SELECT doc_id, t,
       |          unnest(range(1, len(t) - ${SpanW - 2})) AS s
       |        FROM toks WHERE n_tokens >= $SpanW)),
       |dup AS (SELECT win FROM (
       |          SELECT win, count(DISTINCT doc_id) AS df
       |          FROM wins GROUP BY 1)
       |        WHERE df >= 2),
       |cov AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_windows,
       |    CAST(sum(least($SpanW, coalesce(nxt - s, $SpanW))) AS BIGINT)
       |      AS covered_tokens
       |  FROM (SELECT w.doc_id, w.s,
       |          lead(w.s) OVER (PARTITION BY w.doc_id ORDER BY w.s) AS nxt
       |        FROM wins w JOIN dup d ON w.win = d.win)
       |  GROUP BY 1)
       |SELECT t.doc_id, t.n_tokens,
       |  greatest(t.n_tokens - ${SpanW - 1}, 0) AS n_windows,
       |  coalesce(c.dup_windows, 0) AS dup_windows,
       |  coalesce(c.covered_tokens, 0) AS covered_tokens,
       |  CASE WHEN t.n_tokens > 0 THEN
       |    ${rSql("coalesce(c.covered_tokens, 0) / CAST(t.n_tokens AS DOUBLE)", 4)}
       |  ELSE 0.0 END AS dup_frac
       |FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id
       |ORDER BY t.doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t10_line_dedup" -> (t10LineDedup _),
    "t11_lm_score" -> (t11LmScore _),
    "t12_tfidf" -> (t12Tfidf _),
    "t15_novelty_rate" -> (t15NoveltyRate _),
    "t16_bpe_merges" -> (t16BpeMerges _),
    "t17_span_dedup" -> (t17SpanDedup _))

  val oracles: Map[String, String] = Map(
    "t10_line_dedup" -> t10Sql,
    "t11_lm_score" -> t11Sql,
    "t12_tfidf" -> t12Sql,
    "t15_novelty_rate" -> t15Sql,
    "t16_bpe_merges" -> t16Sql,
    "t17_span_dedup" -> t17Sql)
}
