package graft.operators

import graft.Caches.Tracked
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The composed training-corpus pipeline — the flagship "what this engine is
  * for" job: documents → quality filter → near-duplicate removal → token
  * accounting, each stage one of the library's operators chained in ONE
  * declarative plan (Catalyst sees the whole pipeline: the quality filter
  * prunes before shingling, column pruning reaches the scan, and the
  * near-dup join only ever runs over quality survivors).
  *
  * Scale: stage order is the big lever — quality filtering is a narrow
  * per-row op that typically drops 20–60% of a web corpus BEFORE the
  * expensive near-dedup shuffle; dedup runs on the survivors only. At
  * 100 TB swap the d02 inverted-index pair stage for the d03/d06 LSH
  * stage (same interface, bounded candidates).
  */
object Corpus {
  import TextFn._

  private val JaccardT = 0.5

  /** c01 — the pipeline: (1) quality-score each doc (the SHARED
    * [[TextOps.qualitySignals]] expressions — one definition for the table
    * and the pipeline), drop the 'drop' band; (2) word-3-gram Jaccard
    * near-dup pairs among survivors (d02 logic), drop the HIGHER doc_id of
    * each pair (keep-first policy); (3) emit the kept corpus with per-doc
    * token counts + quality, ordered.
    */
  def c01TrainingCorpus(s: SparkSession, dir: String): DataFrame = {
    val scored = TextOps.qualitySignals(
        Tables.documents(s, dir).select(col("doc_id"), col("text")))
      .filter(col("quality_score") >= 0.3) // drop the 'drop' band
      .tracked
    val sh0 = scored
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(shingles3(col("t"))).as("s"))
      .tracked
    // df-cap boilerplate shingles before the self-join — THE Dedup cap
    // contract (a shingle shared by > MaxShingleDf survivors is site
    // chrome, not signal; dropping it bounds the join at df² per shingle
    // instead of n² for a universal shingle)
    val sh = Dedup.capShingles(sh0).tracked
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val dropIds = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s")
        && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("c"))
      .join(sizes.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.doc_id"))
      .filter(r(col("c").cast("double")
        / (col("sa.n") + col("sb.n") - col("c")), 4) >= JaccardT)
      .select(col("id_b").as("doc_id")).distinct() // keep-first: drop higher id
    scored.join(dropIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
      .orderBy("doc_id")
  }

  private val c01Sql = {
    s"""WITH scored AS (
       |  SELECT doc_id, text, n_tokens, quality_score
       |  FROM (${TextOps.qualitySignalsSql})
       |  WHERE quality_score >= 0.3),
       |sh0 AS (SELECT doc_id, unnest(${shingles3Sql("tt")}) AS s
       |        FROM (SELECT doc_id, ${tokensSql("text")} AS tt FROM scored)
       |        WHERE len(tt) >= 3),
       |${Dedup.capShinglesSql("sh0")},
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
       |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |drops AS (SELECT DISTINCT id_b AS doc_id
       |          FROM pairs
       |          JOIN sizes sa ON sa.doc_id = id_a
       |          JOIN sizes sb ON sb.doc_id = id_b
       |          WHERE ${rSql("CAST(c AS DOUBLE) / (sa.n + sb.n - c)", 4)} >= $JaccardT)
       |SELECT doc_id, n_tokens, quality_score
       |FROM scored WHERE doc_id NOT IN (SELECT doc_id FROM drops)
       |ORDER BY doc_id""".stripMargin
  }

  /** c02 — corpus accounting after the pipeline: documents kept, tokens
    * kept, mean quality — the budget numbers a data curator reads.
    */
  def c02CorpusBudget(s: SparkSession, dir: String): DataFrame =
    c01TrainingCorpus(s, dir)
      .agg(count(lit(1)).as("docs_kept"),
        sum(col("n_tokens")).cast("long").as("tokens_kept"),
        // exact decimal carrier: scores are 4-dp, so the cast is a stable
        // snap and the sum is order-free (Det §notes)
        r(Det.dsum(col("quality_score")) / count(lit(1)), 4).as("mean_quality"))

  private val c02Sql =
    s"""SELECT CAST(count(*) AS BIGINT) AS docs_kept,
       |  CAST(sum(n_tokens) AS BIGINT) AS tokens_kept,
       |  ${Det.sqlR(s"${Det.sqlDsum("quality_score")} / count(*)", 4)} AS mean_quality
       |FROM ($c01Sql)""".stripMargin

  /** Per-source token budget for the mixture sampler. */
  private val SourceBudget = 600L

  /** c03 — training-mix sampling: cap every source at a per-source token
    * budget, taking documents in DETERMINISTIC hash order (the content
    * fingerprint, so the sample is stable under re-partitioning, re-runs,
    * and engine — the property `rand()`-based sampling lacks) and keeping
    * the greedy prefix whose cumulative tokens fit the budget. This is the
    * data-mixture step of corpus assembly: weights per source reduce to a
    * budget per source; the window does the rest.
    *
    * Scale: one window keyed by source. Real mixtures have few hundred
    * sources with heavy skew — pre-aggregating to (source, hash-bucket)
    * subtotals first (or salting the giant source) bounds the per-task
    * sort; the greedy-prefix semantics survive because hash order is
    * uniform within a source.
    */
  def c03MixtureSample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        charFingerprint(col("text")).as("h"))
      .filter(col("n_tokens") > 0)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= SourceBudget)
      .select("source", "doc_id", "n_tokens", "cum_tokens")
      .orderBy("source", "cum_tokens")
  }

  private val c03Sql =
    s"""SELECT source, doc_id, n_tokens, cum_tokens
       |FROM (
       |  SELECT source, doc_id, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM (
       |    SELECT doc_id, source,
       |      CAST(len(${tokensSql("text")}) AS BIGINT) AS n_tokens,
       |      ${charFingerprintSql("text")} AS h
       |    FROM documents)
       |  WHERE n_tokens > 0)
       |WHERE cum_tokens <= $SourceBudget
       |ORDER BY source, cum_tokens""".stripMargin

  /** Global token budget for the temperature-scaled mixture (c06). */
  private val MixBudget = 6000L

  /** c06 — temperature-scaled mixture weighting (the T5/Pile recipe):
    * source s gets sampling weight ∝ tokens(s)^α with α = 0.5 — the
    * square-root temperature that up-weights small high-value sources
    * against a dominant crawl — normalized over all sources, then a
    * per-source token budget = ⌊global_budget × weight⌋, filled by the
    * same deterministic hash-order greedy prefix as c03. One row per
    * source: its size, weight, budget and what the sampler actually took
    * (a source whose budget is under its smallest document samples 0).
    *
    * α is fixed at 0.5 because `sqrt` is correctly-rounded IEEE in every
    * engine — `pow(x, 0.7)` is NOT, and a last-ulp disagreement would
    * poison the hash compare. The normalizer Σ√tokens is summed through
    * DECIMAL(28,8) (order-independent, Det's trick), then the one-row
    * result broadcast-joins onto the per-source totals — no driver
    * collect.
    *
    * Scale: totals is a map-side-combined groupBy on a few hundred
    * sources; the normalizer is a 1-row broadcast; the sampler window
    * partitions by source (salt a giant source exactly as c03 documents).
    */
  def c06TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        charFingerprint(col("text")).as("h"))
      .filter(col("n_tokens") > 0)
    val totals = docs
      .groupBy("source").agg(sum("n_tokens").as("total_tokens"))
      .withColumn("sq", sqrt(col("total_tokens").cast("double")))
    val z = totals.agg(
      sum(col("sq").cast("decimal(28,8)")).cast("double").as("z"))
    val budgets = totals.crossJoin(broadcast(z))
      .select(col("source"), col("total_tokens"),
        Det.r(col("sq") / col("z"), 6).as("weight"),
        floor(lit(MixBudget.toDouble) * col("sq") / col("z"))
          .cast("long").as("budget"))
    val w = Window.partitionBy("source")
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sampled = docs
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .join(budgets.select("source", "budget"), Seq("source"))
      .filter(col("cum_tokens") <= col("budget"))
      .groupBy("source")
      .agg(count(lit(1)).as("docs_sampled"),
        sum("n_tokens").as("tokens_sampled"))
    budgets.join(sampled, Seq("source"), "left_outer")
      .select(col("source"), col("total_tokens"), col("weight"), col("budget"),
        coalesce(col("docs_sampled"), lit(0L)).as("docs_sampled"),
        coalesce(col("tokens_sampled"), lit(0L)).as("tokens_sampled"))
      .orderBy("source")
  }

  private val c06Sql =
    s"""WITH d AS (
       |  SELECT * FROM (
       |    SELECT doc_id, source,
       |      CAST(len(${tokensSql("text")}) AS BIGINT) AS n_tokens,
       |      ${charFingerprintSql("text")} AS h
       |    FROM documents)
       |  WHERE n_tokens > 0),
       |totals AS (
       |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |    sqrt(CAST(CAST(sum(n_tokens) AS BIGINT) AS DOUBLE)) AS sq
       |  FROM d GROUP BY 1),
       |z AS (SELECT CAST(sum(CAST(sq AS DECIMAL(28,8))) AS DOUBLE) AS z
       |      FROM totals),
       |budgets AS (
       |  SELECT source, total_tokens, ${Det.sqlR("sq / z", 6)} AS weight,
       |    CAST(floor(CAST($MixBudget AS DOUBLE) * sq / z) AS BIGINT) AS budget
       |  FROM totals, z),
       |cum AS (
       |  SELECT source, doc_id, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum_tokens
       |  FROM d),
       |sampled AS (
       |  SELECT c.source, CAST(count(*) AS BIGINT) AS docs_sampled,
       |    CAST(sum(c.n_tokens) AS BIGINT) AS tokens_sampled
       |  FROM cum c JOIN budgets b ON c.source = b.source
       |  WHERE c.cum_tokens <= b.budget GROUP BY 1)
       |SELECT b.source AS source, b.total_tokens, b.weight, b.budget,
       |  coalesce(s.docs_sampled, 0) AS docs_sampled,
       |  coalesce(s.tokens_sampled, 0) AS tokens_sampled
       |FROM budgets b LEFT JOIN sampled s ON b.source = s.source
       |ORDER BY b.source""".stripMargin

  /** c04 — incremental snapshot merge (the MERGE INTO / upsert shape of a
    * continuously-refreshed corpus): a base snapshot (docs with
    * `doc_id % 5 <> 0`, standing in for last month's crawl) merged with a
    * delta snapshot (docs with `doc_id % 3 = 0`, re-crawled with changed
    * content — modelled by an appended token). Matched rows take the
    * delta's content (`update`), unmatched delta rows enter (`insert`),
    * unmatched base rows carry over (`keep`); every row emits the
    * fingerprint of its surviving content, so the output IS the next
    * snapshot's manifest.
    *
    * Scale: a single full-outer sort-merge join on the snapshot key. With
    * both snapshots bucketed by `doc_id` (sinks/Bucketing) the exchange
    * disappears entirely — the copy-on-write merge a lakehouse table
    * format performs, expressed as one declarative plan; AQE handles a
    * skewed re-crawl batch.
    */
  def c04SnapshotMerge(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), charFingerprint(col("text")).as("base_fp"))
    val delta = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"),
        charFingerprint(concat(col("text"), lit(" updated"))).as("delta_fp"))
    base.join(delta, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("base_fp").isNotNull && col("delta_fp").isNotNull, "update")
          .when(col("base_fp").isNull, "insert").otherwise("keep").as("op"),
        coalesce(col("delta_fp"), col("base_fp")).as("fp"))
      .orderBy("doc_id")
  }

  private val c04Sql =
    s"""WITH base AS (
       |  SELECT doc_id, ${charFingerprintSql("text")} AS base_fp
       |  FROM documents WHERE doc_id % 5 <> 0),
       |delta AS (
       |  SELECT doc_id, ${charFingerprintSql("text || ' updated'")} AS delta_fp
       |  FROM documents WHERE doc_id % 3 = 0)
       |SELECT coalesce(base.doc_id, delta.doc_id) AS doc_id,
       |  CASE WHEN base_fp IS NOT NULL AND delta_fp IS NOT NULL THEN 'update'
       |       WHEN base_fp IS NULL THEN 'insert' ELSE 'keep' END AS op,
       |  coalesce(delta_fp, base_fp) AS fp
       |FROM base FULL OUTER JOIN delta ON base.doc_id = delta.doc_id
       |ORDER BY doc_id""".stripMargin

  private val WSampleK = 20
  private val HashMod = 100000L

  /** c05 — deterministic weighted sampling (the A-Res / Efraimidis-
    * Spirakis shape): each quality-scored document draws a reproducible
    * uniform `u` from its content fingerprint, gets key `ln(u) / w`
    * (monotone-equivalent to the classical `u^(1/w)`), and the global
    * top-[[WSampleK]] keys are the sample — quality-proportional
    * inclusion odds with NO RNG, so the sample is stable across runs,
    * partitionings, and engines (the property `rand()`-weighted sampling
    * lacks, and the reason it can be exact-oracle-checked at all).
    *
    * Scale: one narrow scan computing (key, w) per doc + one global
    * top-k (TakeOrdered — per-partition heaps, no shuffle of the
    * corpus). The distributed-coordination-free weighted sampler a
    * curation pipeline wants: rerunning on a grown corpus reuses every
    * prior key unchanged.
    */
  def c05WeightedSample(s: SparkSession, dir: String): DataFrame = {
    val scored = TextOps.qualitySignals(
        Tables.documents(s, dir).select(col("doc_id"), col("text")))
      .filter(col("quality_score") > 0)
      .select(col("doc_id"), col("quality_score"),
        charFingerprint(col("text")).as("h"))
      // u in (0,1): bucket midpoint of the fingerprint's residue
      .withColumn("u", ((col("h") % HashMod) + lit(0.5)) / lit(HashMod.toDouble))
      .withColumn("skey", r(log(col("u")) / col("quality_score"), 6))
    scored
      .orderBy(col("skey").desc, col("doc_id"))
      .limit(WSampleK)
      .select(col("doc_id"), col("quality_score"), col("skey"))
  }

  private val c05Sql =
    s"""SELECT doc_id, quality_score, skey
       |FROM (
       |  SELECT doc_id, quality_score,
       |    ${rSql(s"ln((${charFingerprintSql("text")} % $HashMod + 0.5)" +
        s" / ${HashMod.toDouble}) / quality_score", 6)} AS skey
       |  FROM (${TextOps.qualitySignalsSql})
       |  WHERE quality_score > 0)
       |ORDER BY skey DESC, doc_id LIMIT $WSampleK""".stripMargin

  /** Hash-shard fanout for the c07 curriculum manifest. */
  private val CurriculumShards = 4L

  /** c07 — curriculum staging + shard manifest: band every document into a
    * quality QUARTILE (stage 1 = weakest quarter … stage 4 = strongest) and
    * a deterministic hash shard, then emit the (stage, shard) manifest a
    * curriculum-ordered training run consumes (count, token total, mean
    * quality per cell).
    *
    * The interesting part is EXACT quantiles without a global sort: a
    * naive `ntile(4)` is a single-partition total sort — the one shape
    * that cannot scale. Here quartile thresholds come from the score
    * HISTOGRAM: quality_score is 4-dp-snapped (TextOps contract), so its
    * cardinality is ≤ 10⁴ regardless of corpus size; groupBy-count the
    * scores (map-side combined), run the cumulative window on that tiny
    * aggregate, take threshold p as the minimal score whose cumulative
    * count reaches ⌈p·n/4⌉ (type-1 quantile), and broadcast the 1-row
    * threshold frame back onto the corpus. Ties share a stage (no
    * row-order dependence — ntile would split ties nondeterministically
    * at scale). Shard = fingerprint mod k: stable under repartitioning,
    * re-runs, and engines — `row_number() % k` is not.
    *
    * Scale: two narrow scans + one broadcast; the only window runs over
    * the ≤10⁴-row histogram (bounded by construction, same argument as
    * t05's vocabulary note). The manifest is k·4 rows.
    */
  def c07CurriculumShards(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // cached: feeds both the histogram and the final staging pass (the
    // scale note's "two narrow scans" must not silently become four)
    val scored = TextOps.qualitySignals(
        Tables.documents(s, dir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("n_tokens"), col("quality_score"),
        charFingerprint(col("text")).as("h"))
      .tracked
    // NULL scores (the zero-token 'drop' band) are EXCLUDED from the
    // quantile histogram and assigned stage 0 below: Spark windows order
    // NULLS FIRST while DuckDB orders NULLS LAST, so letting NULLs into
    // the cumulative curve would shift every threshold between engines.
    val hist = scored.filter(col("quality_score").isNotNull)
      .groupBy("quality_score").agg(count(lit(1)).as("c"))
      .tracked
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.orderBy("quality_score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = hist.agg(sum(col("c")).as("n"))
    def thr(p: Int) = min(when(
      col("cum") >= floor((col("n") * p + lit(3)) / lit(4.0)).cast("long"),
      col("quality_score"))).as(s"q$p")
    val thresholds = cum.crossJoin(broadcast(tot)).agg(thr(1), thr(2), thr(3))
    scored.crossJoin(broadcast(thresholds))
      .select(col("doc_id"), col("n_tokens"), col("quality_score"),
        when(col("quality_score").isNull, lit(0L)) // drop band → stage 0
          .otherwise(lit(1L)
            + (col("quality_score") > col("q1")).cast("long")
            + (col("quality_score") > col("q2")).cast("long")
            + (col("quality_score") > col("q3")).cast("long")).as("stage"),
        (col("h") % lit(CurriculumShards)).as("shard"))
      .groupBy("stage", "shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("tokens"),
        r(Det.dsum(col("quality_score")) / count(lit(1)), 4)
          .as("mean_quality"))
      .orderBy("stage", "shard")
  }

  private val c07Sql =
    s"""WITH scored AS (
       |  SELECT doc_id, n_tokens, quality_score,
       |    ${charFingerprintSql("text")} AS h
       |  FROM (${TextOps.qualitySignalsSql})),
       |hist AS (SELECT quality_score, CAST(count(*) AS BIGINT) AS c
       |         FROM scored WHERE quality_score IS NOT NULL GROUP BY 1),
       |cum AS (SELECT quality_score, c,
       |          sum(c) OVER (ORDER BY quality_score
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |        FROM hist),
       |tot AS (SELECT sum(c) AS n FROM hist),
       |thr AS (SELECT
       |    min(CASE WHEN cum >= CAST(floor((n * 1 + 3) / 4.0) AS BIGINT)
       |             THEN quality_score END) AS q1,
       |    min(CASE WHEN cum >= CAST(floor((n * 2 + 3) / 4.0) AS BIGINT)
       |             THEN quality_score END) AS q2,
       |    min(CASE WHEN cum >= CAST(floor((n * 3 + 3) / 4.0) AS BIGINT)
       |             THEN quality_score END) AS q3
       |  FROM cum, tot)
       |SELECT stage, shard, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS tokens,
       |  ${Det.sqlR(s"${Det.sqlDsum("quality_score")} / count(*)", 4)}
       |    AS mean_quality
       |FROM (
       |  SELECT doc_id, n_tokens, quality_score,
       |    CASE WHEN quality_score IS NULL THEN 0
       |         ELSE 1 + CAST(quality_score > q1 AS BIGINT)
       |            + CAST(quality_score > q2 AS BIGINT)
       |            + CAST(quality_score > q3 AS BIGINT) END AS stage,
       |    h % $CurriculumShards AS shard
       |  FROM scored, thr)
       |GROUP BY 1, 2
       |ORDER BY stage, shard""".stripMargin

  /** Max documents retained per source under the c08 domain cap. */
  private val DomainCap = 10L

  /** c08 — per-domain document cap: the de-domination pass every web-corpus
    * pipeline runs so no single site/domain floods the training mix. Rank
    * each source's documents by quality (ties broken by doc_id — a total
    * order, so the kept set is engine- and partitioning-independent), keep
    * the top [[DomainCap]], and emit the per-source manifest (total vs kept
    * counts, kept token budget, mean kept quality). The zero-token NULL-
    * quality 'drop' band is excluded before ranking — same contract as c07.
    *
    * Scale: the window shuffles once on `source`; at web scale that key is
    * millions of domains, so parallelism is the domain count, not 20. A
    * mega-domain (one key ≫ executor memory) is the known skew case: the
    * fix is the standard two-phase top-K — per-(domain, salt) partial
    * top-K first, then re-rank the ≤ salt·K survivors — same output,
    * bounded partitions. At this cardinality the single window IS the
    * right plan.
    */
  def c08DomainCap(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = TextOps.qualitySignals(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text"), col("source")))
      .filter(col("quality_score").isNotNull)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("quality_score"))
    val kept = (col("rk") <= DomainCap)
    scored
      .withColumn("rk", row_number().over(Window.partitionBy("source")
        .orderBy(col("quality_score").desc, col("doc_id"))))
      .groupBy("source")
      .agg(count(lit(1)).as("n_total"),
        sum(kept.cast("long")).cast("long").as("n_kept"),
        sum(when(kept, col("n_tokens"))).cast("long").as("tokens_kept"),
        r(Det.dsum(when(kept, col("quality_score")))
          / sum(kept.cast("long")), 4).as("mean_kept_quality"))
      .orderBy("source")
  }

  private val c08Sql =
    s"""WITH scored AS (
       |  SELECT q.doc_id, d.source, q.n_tokens, q.quality_score
       |  FROM (${TextOps.qualitySignalsSql}) q
       |  JOIN documents d ON q.doc_id = d.doc_id
       |  WHERE q.quality_score IS NOT NULL),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |      PARTITION BY source
       |      ORDER BY quality_score DESC, doc_id) AS rk
       |  FROM scored)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_total,
       |  CAST(sum(CASE WHEN rk <= $DomainCap THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept,
       |  CAST(sum(CASE WHEN rk <= $DomainCap THEN n_tokens END) AS BIGINT)
       |    AS tokens_kept,
       |  ${Det.sqlR(
        Det.sqlDsum(s"CASE WHEN rk <= $DomainCap THEN quality_score END")
          + s" / sum(CASE WHEN rk <= $DomainCap THEN 1 ELSE 0 END)", 4)}
       |    AS mean_kept_quality
       |FROM ranked GROUP BY 1 ORDER BY source""".stripMargin

  /** Tokens per packed training sequence (c10). Real runs use 2k–8k; 512
    * keeps several boundary crossings per source at sf0.01.
    */
  private val SeqLen = 512L

  /** c10 — sequence-packing accounting for the concat-and-chunk pretraining
    * layout: within each source, documents are concatenated in doc_id order
    * and the token stream is chunked into fixed [[SeqLen]]-token training
    * sequences. Each doc's span is [start_off, end_off) in the stream, so
    * its first/last sequence ids are integer divisions of the offsets — a
    * window cumsum, no explode of the token stream itself. Per source the
    * manifest reports: docs, tokens, sequence count, how many docs straddle
    * a sequence boundary (they become attention-contaminated unless the
    * loader masks across the cut — THE number a pretraining team asks for),
    * and the padding wasted in the final partial sequence.
    *
    * Scale: one narrow scan → one window keyed by `source` (millions of
    * domains at web scale — parallelism is the domain count) → a per-source
    * aggregate on the same partitioning, so Catalyst plans ONE exchange.
    * Zero-token docs contribute nothing and are excluded up front.
    */
  def c10SequencePacking(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val run = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("end_off", sum(col("n_tokens")).over(run))
      .withColumn("start_off", col("end_off") - col("n_tokens"))
      .withColumn("first_seq", expr(s"start_off div $SeqLen"))
      .withColumn("last_seq", expr(s"(end_off - 1) div $SeqLen"))
    packed.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        (max(col("last_seq")) + 1).as("n_seqs"),
        sum((col("last_seq") > col("first_seq")).cast("long"))
          .as("n_boundary_docs"),
        r(sum((col("last_seq") > col("first_seq")).cast("long"))
            .cast("double") / count(lit(1)), 6).as("frac_boundary_docs"))
      .withColumn("pad_tokens", col("n_seqs") * SeqLen - col("total_tokens"))
      .withColumn("pad_frac",
        r(col("pad_tokens").cast("double") / (col("n_seqs") * SeqLen), 6))
      .orderBy("source")
  }

  private val c10Sql = {
    val t = tokensSql("text")
    s"""WITH toks AS (
       |  SELECT doc_id, source, CAST(len($t) AS BIGINT) AS n_tokens
       |  FROM documents WHERE len($t) > 0),
       |packed AS (
       |  SELECT source, n_tokens,
       |    (end_off - n_tokens) // $SeqLen AS first_seq,
       |    (end_off - 1) // $SeqLen AS last_seq
       |  FROM (
       |    SELECT source, n_tokens,
       |      sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |        ROWS UNBOUNDED PRECEDING) AS end_off
       |    FROM toks)),
       |agg AS (
       |  SELECT source,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |    CAST(max(last_seq) + 1 AS BIGINT) AS n_seqs,
       |    CAST(sum(CASE WHEN last_seq > first_seq THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_boundary_docs,
       |    ${rSql("CAST(sum(CASE WHEN last_seq > first_seq THEN 1 ELSE 0 END) " +
                "AS DOUBLE) / count(*)", 6)} AS frac_boundary_docs
       |  FROM packed GROUP BY 1)
       |SELECT source, n_docs, total_tokens, n_seqs, n_boundary_docs,
       |  frac_boundary_docs,
       |  n_seqs * $SeqLen - total_tokens AS pad_tokens,
       |  ${rSql(s"CAST(n_seqs * $SeqLen - total_tokens AS DOUBLE) " +
            s"/ (n_seqs * $SeqLen)", 6)} AS pad_frac
       |FROM agg ORDER BY source""".stripMargin
  }

  /** Epoch cap for c11 — no source is repeated more than this many times
    * (past ~4 epochs repetition hurts; Muennighoff et al. 2023).
    */
  private val MaxEpochs = 4L
  /** Shards per epoch replica set (c11's writer-parallelism key). */
  private val EpochShards = 16L

  /** c11 — epoch-aware upsampling: under-represented sources are repeated
    * toward token balance. Per-source epoch counts are deterministic
    * integer arithmetic — the source with the most tokens trains 1 epoch,
    * the smallest [[MaxEpochs]], linearly interpolated in exact integers
    * (no RNG, no float weights), then every (doc, epoch) replica row is
    * MATERIALIZED via explode(sequence(1, reps)) and dealt a shard id.
    * Output: the per-(source, epoch) manifest — docs, tokens, distinct
    * shards touched — i.e. exactly what a downstream writer partitions by.
    *
    * Scale: the per-source totals table is domain-cardinality (small —
    * broadcast); the explode multiplies rows by ≤ [[MaxEpochs]] BEFORE the
    * shard/manifest aggregate but carries only (doc_id, source, n_tokens),
    * never text. At 100 TB the replica stream goes straight to the sharded
    * writer — the wide payload is joined back AFTER sampling, once.
    */
  def c11EpochUpsample(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .tracked // feeds totals (twice, via bounds) and the replica join
    val totals = toks.groupBy("source")
      .agg(sum(col("n_tokens")).as("tok"))
    val bounds = totals.agg(
      max(col("tok")).as("max_tok"), min(col("tok")).as("min_tok"))
    val reps = totals.crossJoin(broadcast(bounds))
      .withColumn("reps",
        lit(1L) + when(col("max_tok") > col("min_tok"),
          expr(s"((max_tok - tok) * (${MaxEpochs - 1})) div (max_tok - min_tok)"))
          .otherwise(lit(0L)))
      .select("source", "reps")
    toks.join(broadcast(reps), Seq("source"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        explode(sequence(lit(1L), col("reps"))).as("epoch"))
      .withColumn("shard",
        pmod(col("doc_id") * MaxEpochs + col("epoch"), lit(EpochShards)))
      .groupBy("source", "epoch")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens"),
        countDistinct(col("shard")).as("n_shards"))
      .orderBy("source", "epoch")
  }

  private val c11Sql = {
    val t = tokensSql("text")
    s"""WITH toks AS (
       |  SELECT doc_id, source, CAST(len($t) AS BIGINT) AS n_tokens
       |  FROM documents),
       |totals AS (
       |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS tok
       |  FROM toks GROUP BY 1),
       |bounds AS (
       |  SELECT max(tok) AS max_tok, min(tok) AS min_tok FROM totals),
       |reps AS (
       |  SELECT source,
       |    1 + CASE WHEN max_tok > min_tok
       |          THEN ((max_tok - tok) * ${MaxEpochs - 1}) // (max_tok - min_tok)
       |          ELSE 0 END AS reps
       |  FROM totals CROSS JOIN bounds),
       |replicas AS (
       |  SELECT t.doc_id, t.source, t.n_tokens, e.epoch,
       |    (t.doc_id * $MaxEpochs + e.epoch) % $EpochShards AS shard
       |  FROM toks t
       |  JOIN reps r ON r.source = t.source
       |  CROSS JOIN (SELECT unnest(generate_series(1, $MaxEpochs)) AS epoch) e
       |  WHERE e.epoch <= r.reps)
       |SELECT source, CAST(epoch AS BIGINT) AS epoch,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS tokens,
       |  CAST(count(DISTINCT shard) AS BIGINT) AS n_shards
       |FROM replicas GROUP BY 1, 2 ORDER BY source, epoch""".stripMargin
  }

  /** c12 — the corpus DATASHEET (Gebru et al.'s "Datasheets for Datasets",
    * per-language grain): the one-page accounting a training-data release
    * ships — volume (docs, sources, tokens), central quality (exact
    * decimal mean of the shared quality score), exact duplicate exposure
    * (docs whose fingerprint+text repeats within the language), and the
    * exact discrete token-length distribution (p50/p90 via e18's
    * histogram-cumsum spelling, no sampling). Every number composes an
    * operator the library already certifies — the datasheet is a VIEW
    * over the engine, not new machinery.
    *
    * Scale: three per-language aggregates over one cached narrow frame —
    * the histogram percentile is per-(lang, n_tokens), bounded by
    * distinct lengths, never the corpus. The dup grouping carries the
    * full text alongside the fingerprint as the residual equality check
    * (d01's contract); at 100 TB group on the 8-byte fp alone first and
    * equality-check only within fp collisions, exactly as d01 documents.
    * All shuffles are language-keyed.
    */
  def c12CorpusDatasheet(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = TextOps.qualitySignals(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text"), col("lang"), col("source")))
      .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"),
        col("quality_score"), charFingerprint(col("text")).as("fp"),
        col("text"))
      .tracked
    val vol = base.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_tokens")).as("total_tokens"),
        r(sum(col("quality_score").cast("decimal(38,8)")).cast("double")
          / sum(col("quality_score").isNotNull.cast("long")), 4)
          .as("mean_quality"))
    val dups = base.groupBy(col("lang"), col("fp"), col("text"))
      .agg(count(lit(1)).as("c"))
      .groupBy("lang")
      .agg(sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_dup_docs"))
    // NULL n_tokens (NULL-text docs) must not enter the histogram: Spark
    // windows order NULLS FIRST, DuckDB NULLS LAST, so a NULL row would
    // skew the cumulative percentile differently per engine (c10's guard)
    val hist = base.filter(col("n_tokens").isNotNull)
      .groupBy(col("lang"), col("n_tokens").as("v"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("lang").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("lang")
    def q(k: Int) = min(when(
      col("cum") >= floor((col("n") * k + lit(99)) / lit(100.0)).cast("long"),
      col("v"))).as(s"p${k}_tokens")
    val pct = hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .groupBy("lang")
      .agg(q(50), q(90))
    // LEFT join: a language whose every doc has NULL text has no
    // histogram rows — it must still appear in the datasheet (with NULL
    // percentiles), not silently vanish from volume accounting
    vol.join(dups, Seq("lang")).join(pct, Seq("lang"), "left_outer")
      .orderBy("lang")
  }

  private val c12Sql = {
    s"""WITH base AS (
       |  SELECT q.doc_id, d.lang, d.source, q.n_tokens, q.quality_score,
       |    ${charFingerprintSql("q.text")} AS fp, q.text
       |  FROM (${TextOps.qualitySignalsSql}) q
       |  JOIN documents d ON d.doc_id = q.doc_id),
       |vol AS (
       |  SELECT lang,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |    ${rSql("CAST(sum(CAST(quality_score AS DECIMAL(38,8))) AS DOUBLE) " +
            "/ sum(CASE WHEN quality_score IS NOT NULL THEN 1 ELSE 0 END)", 4)}
       |      AS mean_quality
       |  FROM base GROUP BY 1),
       |dups AS (
       |  SELECT lang,
       |    CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
       |      AS n_dup_docs
       |  FROM (SELECT lang, fp, text, count(*) AS c
       |        FROM base GROUP BY 1, 2, 3)
       |  GROUP BY 1),
       |hist AS (
       |  SELECT lang, n_tokens AS v, CAST(count(*) AS BIGINT) AS c
       |  FROM base WHERE n_tokens IS NOT NULL GROUP BY 1, 2),
       |cum AS (
       |  SELECT lang, v, c,
       |    CAST(sum(c) OVER (PARTITION BY lang ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum,
       |    CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS n
       |  FROM hist),
       |pct AS (
       |  SELECT lang,
       |    min(CASE WHEN cum >= CAST(floor((n * 50 + 99) / 100.0) AS BIGINT)
       |             THEN v END) AS p50_tokens,
       |    min(CASE WHEN cum >= CAST(floor((n * 90 + 99) / 100.0) AS BIGINT)
       |             THEN v END) AS p90_tokens
       |  FROM cum GROUP BY 1)
       |SELECT vol.lang, vol.n_docs, vol.n_sources, vol.total_tokens,
       |  vol.mean_quality, dups.n_dup_docs, pct.p50_tokens, pct.p90_tokens
       |FROM vol
       |JOIN dups ON dups.lang = vol.lang
       |LEFT JOIN pct ON pct.lang = vol.lang
       |ORDER BY vol.lang""".stripMargin
  }

  /** c13 — the composed end-to-end corpus JOB: quality gate → exact dedup
    * → near-dup clusters → leakage-safe split → sequence packing, chained
    * as ONE declarative query (Catalyst sees the whole pipeline, so the
    * gate prunes before shingling and the pair join only ever runs over
    * gated canonical survivors; the one mid-pipeline barrier is the
    * GraphX CC Pregel run, whose inputs are cached for exactly that span
    * and released before the query returns). Every stage is
    * an operator the library certifies on its own (c01's gate, d01's
    * hash-groupBy dedup, d08's capped verifier, c09's cluster-bucket
    * split rule, c10's packing accounting); this query certifies the
    * COMPOSITION — the shape a training-data pipeline actually runs
    * nightly. Output: the per-(split, source) packing manifest.
    *
    * Cap universe: the gated CANONICAL corpus (d08's), which here is
    * leakage-consistent because gate-dropped docs and verbatim replicas
    * never reach any split — unlike c09, where replicas are assigned via
    * their canonical and therefore need the full-corpus universe.
    *
    * Scale: stage order is the lever (gate drops 20–60% before the only
    * quadratic-hazard stage; exact dedup collapses replicas before the
    * pair join — d08's measured 79 GB-spill fix); the packing window
    * partitions by (split, source) so parallelism is the domain count.
    * Round7OpsSpec proves the fused plan equals the stage-by-stage run
    * with parquet barriers between stages, and that no near-dup pair
    * ever straddles a split.
    */
  def c13CorpusJob(s: SparkSession, dir: String): DataFrame =
    c13Pack(c13Assign(s, c13Canon(c13Gate(s, dir))))

  /** Stage 1: quality gate (c01's rule — drop the 'drop' band). */
  private[graft] def c13Gate(s: SparkSession, dir: String): DataFrame =
    TextOps.qualitySignals(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("text")))
      .filter(col("quality_score") >= 0.3)
      .select("doc_id", "source", "text", "n_tokens")

  /** Stage 2: exact dedup — keep the min-doc_id representative per
    * distinct text (d01's hash-groupBy), then join back for its columns.
    */
  private[graft] def c13Canon(gated: DataFrame): DataFrame = {
    val canonIds = gated.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    gated.join(canonIds, Seq("doc_id"))
  }

  /** Stage 3+4: near-dup clusters over the canonical survivors (d08's
    * capped verifier → GraphX CC) and the c09 cluster-bucket split rule.
    */
  private[graft] def c13Assign(s: SparkSession, canon0: DataFrame): DataFrame = {
    import org.apache.spark.graphx.{Edge, Graph, VertexId}
    val session = s
    import session.implicits._
    // cached: consumed by the shingle/pair path (whose GraphX CC action
    // materializes it first) AND the final cluster join — without the
    // cache the gate + canonical groupBy would recompute per consumer.
    // All four caches (canon, shingles, capped rows, capShingles' hot
    // list via capShinglesKeep) are RELEASED before returning (below):
    // the GraphX CC Pregel run is an eager barrier, so by the time `cc`
    // is cut the shingle/pair caches have served every consumer, and
    // cutting the final frame lets canon go too — a c13 run leaves no
    // cached frames behind in a long session (the round-7 advice item;
    // the bench runs 110 queries in one session). Operators that CAN'T
    // release early (their caches feed the caller's action) register
    // with graft.Caches instead.
    val canon = canon0.tracked
    val sh0 = canon
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(shingles3(col("t"))).as("s"))
      .tracked
    val (capped0, hot) = Dedup.capShinglesKeep(sh0)
    val capped = capped0.tracked
    val pairs = Dedup.verifiedPairsOn(capped)
      .select(col("id_a"), col("id_b"))
    val edgeRdd = pairs.as[(Long, Long)].rdd
      .map { case (a, b) => Edge(a: VertexId, b: VertexId, 1) }
    // cut cc (eager): the Pregel result is pinned independent of the
    // shingle lineage, so the shingle/pair caches can be dropped NOW
    val cc = graft.Cut.cut(
      Graph.fromEdges(edgeRdd, ())
        .connectedComponents().vertices.toDF("cc_id", "cluster_min"))
    capped.unpersist(false)
    hot.unpersist(false)
    sh0.unpersist(false)
    val assigned = canon
      .join(cc, canon("doc_id") === cc("cc_id"), "left_outer")
      .select(col("doc_id"), col("source"), col("n_tokens"),
        coalesce(col("cluster_min"), col("doc_id")).as("cluster_id"))
    val bucket = Det.knuthBucket(col("cluster_id"), 10L)
    val out = graft.Cut.cut(assigned.withColumn("split",
      when(bucket <= 7L, "train").when(bucket === 8L, "val")
        .otherwise("test")))
    canon.unpersist(false)
    out
  }

  /** Stage 5: c10's packing accounting per (split, source). */
  private[graft] def c13Pack(assigned: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val run = Window.partitionBy("split", "source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = assigned
      .filter(col("n_tokens") > 0)
      .withColumn("end_off", sum(col("n_tokens")).over(run))
      .withColumn("start_off", col("end_off") - col("n_tokens"))
      .withColumn("first_seq", expr(s"start_off div $SeqLen"))
      .withColumn("last_seq", expr(s"(end_off - 1) div $SeqLen"))
    packed.groupBy("split", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        (max(col("last_seq")) + 1).as("n_seqs"),
        sum((col("last_seq") > col("first_seq")).cast("long"))
          .as("n_boundary_docs"))
      .withColumn("pad_tokens", col("n_seqs") * SeqLen - col("total_tokens"))
      .orderBy("split", "source")
  }

  private val c13Sql = {
    val t = tokensSql("text")
    val j = rSql("CAST(c AS DOUBLE) / (sa.n + sb.n - c)", 4)
    val bucket = Det.sqlKnuthBucket("cluster_id", 10L)
    s"""WITH RECURSIVE gated AS (
       |  SELECT q.doc_id, d.source, q.text, q.n_tokens
       |  FROM (${TextOps.qualitySignalsSql}) q
       |  JOIN documents d ON d.doc_id = q.doc_id
       |  WHERE q.quality_score >= 0.3),
       |canon_ids AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY text),
       |canon AS (SELECT g.* FROM gated g JOIN canon_ids USING (doc_id)),
       |sh0 AS (SELECT doc_id, unnest(${shingles3Sql("tt")}) AS s
       |        FROM (SELECT doc_id, $t AS tt FROM canon)
       |        WHERE len(tt) >= 3),
       |${Dedup.capShinglesSql("sh0")},
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
       |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |pairs AS (SELECT id_a, id_b FROM inter
       |          JOIN sizes sa ON sa.doc_id = id_a
       |          JOIN sizes sb ON sb.doc_id = id_b
       |          WHERE $j >= $JaccardT),
       |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |      UNION SELECT id_b, id_a FROM pairs),
       |verts AS (SELECT DISTINCT src AS id FROM e),
       |reach(id, x) AS (
       |  SELECT id, id FROM verts
       |  UNION
       |  SELECT r.id, e.dst FROM reach r JOIN e ON r.x = e.src),
       |cc AS (SELECT id, min(x) AS cluster_min FROM reach GROUP BY 1),
       |assigned AS (
       |  SELECT c.doc_id, c.source, c.n_tokens,
       |    coalesce(cc.cluster_min, c.doc_id) AS cluster_id
       |  FROM canon c LEFT JOIN cc ON cc.id = c.doc_id),
       |splits AS (
       |  SELECT doc_id, source, n_tokens,
       |    CASE WHEN $bucket <= 7 THEN 'train'
       |         WHEN $bucket = 8 THEN 'val' ELSE 'test' END AS split
       |  FROM assigned),
       |packed AS (
       |  SELECT split, source, n_tokens,
       |    (end_off - n_tokens) // $SeqLen AS first_seq,
       |    (end_off - 1) // $SeqLen AS last_seq
       |  FROM (
       |    SELECT split, source, n_tokens,
       |      sum(n_tokens) OVER (PARTITION BY split, source ORDER BY doc_id
       |        ROWS UNBOUNDED PRECEDING) AS end_off
       |    FROM splits WHERE n_tokens > 0))
       |SELECT split, source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(max(last_seq) + 1 AS BIGINT) AS n_seqs,
       |  CAST(sum(CASE WHEN last_seq > first_seq THEN 1 ELSE 0 END)
       |       AS BIGINT) AS n_boundary_docs,
       |  CAST((max(last_seq) + 1) * $SeqLen - sum(n_tokens) AS BIGINT)
       |    AS pad_tokens
       |FROM packed GROUP BY 1, 2 ORDER BY split, source""".stripMargin
  }

  // ---------------------------------------------------------------------
  // c15 — cross-corpus overlap (contamination accounting between sources)
  // ---------------------------------------------------------------------

  /** Distinct (source, word-3-gram shingle) rows — the content universe
    * both overlap arms share. One linear scan + one distinct shuffle keyed
    * by (source, shingle); no cap: the downstream self-join fans out per
    * shingle by SOURCE count (hundreds at most), not document count, so a
    * universal boilerplate shingle costs sources² pair rows, not docs².
    */
  private def sourceShingles(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(col("text").isNotNull)
      .select(col("source"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("source"), explode(shingles3(col("t"))).as("s"))
      .distinct()

  // composed from the shared tokensSql/shingles3Sql spellings (not
  // hand-inlined) so a change to the tokenizer helpers can never desync
  // the c15/c15b oracles from the engine's `sourceShingles`
  private val ssSql =
    s"""ss AS (
       |  SELECT DISTINCT source, unnest(shp) AS s
       |  FROM (SELECT source, ${shingles3Sql("tt")} AS shp
       |        FROM (SELECT source, ${tokensSql("text")} AS tt
       |              FROM documents WHERE text IS NOT NULL)
       |        WHERE len(tt) >= 3))""".stripMargin

  /** c15 — EXACT pairwise corpus overlap: for every pair of sources, the
    * distinct-shingle intersection size and Jaccard — the contamination
    * number a curator reads before mixing corpora ("how much of B is
    * already in A?"). Full pair grid (zero-overlap pairs kept: absence of
    * overlap is the datum).
    *
    * Scale: the join key is the shingle over DISTINCT (source, shingle)
    * rows, so cost is one distinct shuffle of the corpus's shingle set
    * plus per-shingle source-pair fan-out (≤ sources², independent of
    * corpus size). This is the definitional arm; c15b is the fixed-state
    * sketch that answers the same question without shuffling the universe.
    */
  def c15CorpusOverlap(s: SparkSession, dir: String): DataFrame = {
    val ss = sourceShingles(s, dir).tracked
    val n = ss.groupBy("source").agg(count(lit(1)).as("n"))
    val ov = ss.as("a")
      .join(ss.as("b"), col("a.s") === col("b.s")
        && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("overlap"))
    // full grid: sources are a tiny dim (hundreds), the cross is sources²
    val grid = n.select(col("source").as("source_a"), col("n").as("n_a"))
      .crossJoin(n.select(col("source").as("source_b"), col("n").as("n_b")))
      .filter(col("source_a") < col("source_b"))
    grid.join(ov, Seq("source_a", "source_b"), "left")
      .withColumn("overlap", coalesce(col("overlap"), lit(0L)))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("overlap"),
        r(col("overlap").cast("double")
          / (col("n_a") + col("n_b") - col("overlap")), 4).as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  private val c15Sql =
    s"""WITH $ssSql,
       |n AS (SELECT source, count(*) AS n FROM ss GROUP BY 1),
       |ov AS (SELECT a.source AS source_a, b.source AS source_b,
       |         count(*) AS overlap
       |       FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source
       |       GROUP BY 1, 2),
       |grid AS (SELECT na.source AS source_a, nb.source AS source_b,
       |           na.n AS n_a, nb.n AS n_b
       |         FROM n na JOIN n nb ON na.source < nb.source)
       |SELECT source_a, source_b, n_a, n_b,
       |  coalesce(overlap, 0) AS overlap,
       |  ${rSql("coalesce(overlap, 0) * 1.0 / (n_a + n_b - coalesce(overlap, 0))", 4)}
       |    AS jaccard
       |FROM grid LEFT JOIN ov USING (source_a, source_b)
       |ORDER BY source_a, source_b""".stripMargin

  /** KMV sketch size: 512 bottom hashes per source. RSE of a bottom-k
    * distinct estimate is ~1/sqrt(k) ≈ 4.4%; measured against c15 at
    * sf0.01 the worst pairwise |Jaccard error| is 0.017 (CorpusOverlapSpec
    * pins ≤ 0.03 with headroom). */
  private[graft] val KmvK = 512

  /** c15b — the 100 TB arm: per-source KMV (bottom-k) sketch over the
    * SAME shingle universe, k smallest scrambled hashes per source via the
    * native [[graft.plans.GroupedTopK]] partial bottom-k (no full sort, no
    * per-source window over the universe). Each source compresses to ≤
    * [[KmvK]] longs — sketches are buildable in one linear pass, mergeable
    * across snapshots, and the pairwise estimate below never touches the
    * corpus again, which is the point: estimating overlap between two
    * 50 TB corpora without joining them.
    *
    * Estimators (Beyer et al., SIGMOD'07 K-Minimum-Values): for a pair,
    * take the k smallest of the merged sketches U; Ĵ = |{v ∈ U : v in
    * both sketches}| / |U|; |A∪B|^ = (k−1)·P / v_k when U saturates (else
    * exact |U|); overlap^ = round(Ĵ · |A∪B|^). All arithmetic is integer
    * (DIV / round-half-up spelled as (2·c·û + m) DIV (2·m)) except the
    * 4-dp-snapped Jaccard — bit-stable across engines, so the oracle is
    * exact even though the VALUE is an estimate.
    */
  /** (source, scrambled shingle hash) rows — the shared stream/batch
    * derive: the Knuth multiplicative scramble (a bijection on [0, P))
    * decorrelates bottom-k order from text. Callers dedup (the KMV fold
    * itself is a distinct-set operation).
    */
  private[graft] def shingleHashes(docs: DataFrame): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .select(col("source"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("source"), explode(shingles3(col("t"))).as("s"))
      .select(col("source"),
        pmod(charFingerprint(col("s")) * lit(Det.KnuthA),
          lit(Det.KnuthP)).as("h"))

  def c15bCorpusOverlapKmv(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.GroupedTopK
    // distinctValues bottom-k (round 14): the KMV fold's distinct-set
    // semantics live INSIDE the operator, so the plan is scan → partial
    // local-distinct-bottom-k → k-bounded exchange → final, replacing the
    // corpus-wide distinct() exchange that was c15b's whole shuffle cost
    // (the one superlinear-looking stage in the sf10 audit: the sketch
    // estimate tail is pairs-bounded and was never the problem)
    val u = shingleHashes(Tables.documents(s, dir))
    val sk = GroupedTopK.rank(
        u.withColumn("hd", col("h").cast("double")),
        Seq("source"), "hd", KmvK, descending = false,
        distinctValues = true)
      .select(col("source"), col("h"))
      .tracked
    kmvPairEstimates(sk)
  }

  /** Pairwise KMV estimates from (source, h) sketch rows — shared
    * VERBATIM by the batch arm (bottom-k via GroupedTopK above) and the
    * streaming accumulator's finalized sketches
    * ([[graft.streaming.KmvStream]]); KmvStreamSpec pins the equality.
    */
  private[graft] def kmvPairEstimates(sk: DataFrame): DataFrame = {
    val P = Det.KnuthP
    val srcs = sk.select("source").distinct()
    val pairs = srcs.select(col("source").as("pa"))
      .crossJoin(srcs.select(col("source").as("pb")))
      .filter(col("pa") < col("pb"))
    // one equi-join (explode the pair into members — no union, so no
    // shared-subplan re-run; the SCALE.md g30 rule)
    val pool = pairs
      .select(col("pa"), col("pb"),
        explode(array(col("pa"), col("pb"))).as("member"))
      .join(sk, col("member") === col("source"))
      .select(col("pa"), col("pb"), col("h"), col("member"))
    val uh = pool.groupBy(col("pa"), col("pb"), col("h"))
      .agg(max(when(col("member") === col("pa"), 1L).otherwise(0L)).as("in_a"),
        max(when(col("member") === col("pb"), 1L).otherwise(0L)).as("in_b"))
    // merged-sketch bottom-k: the window partition is ≤ 2k rows by
    // construction (two sketches), so this window is state-bounded
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pa", "pb").orderBy("h")
    val top = uh.withColumn("rn", row_number().over(w)).filter(col("rn") <= KmvK)
    top.groupBy(col("pa").as("source_a"), col("pb").as("source_b"))
      .agg(count(lit(1)).as("m"), max(col("h")).as("vk"),
        sum(col("in_a") * col("in_b")).as("c"))
      .withColumn("union_est",
        when(col("m") === KmvK, expr(s"((m - 1) * ${P}L) div vk"))
          .otherwise(col("m")))
      .select(col("source_a"), col("source_b"), col("m").as("sketch_m"),
        col("union_est"),
        r(col("c").cast("double") / col("m"), 4).as("jaccard_est"),
        expr("(2 * c * union_est + m) div (2 * m)").as("overlap_est"))
      .orderBy("source_a", "source_b")
  }

  private val c15bSql = {
    val P = Det.KnuthP
    val fp = TextFn.charFingerprintSql("s")
    s"""WITH $ssSql,
       |u AS (SELECT DISTINCT source, ($fp * ${Det.KnuthA}) % $P AS h FROM ss),
       |sk AS (SELECT source, h FROM (
       |         SELECT source, h,
       |           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |         FROM u) WHERE rn <= $KmvK),
       |srcs AS (SELECT DISTINCT source FROM sk),
       |pairs AS (SELECT a.source AS pa, b.source AS pb
       |          FROM srcs a JOIN srcs b ON a.source < b.source),
       |pool AS (SELECT pa, pb, sk.h, sk.source AS member
       |         FROM pairs JOIN sk ON sk.source = pa OR sk.source = pb),
       |uh AS (SELECT pa, pb, h,
       |         max(CASE WHEN member = pa THEN 1 ELSE 0 END) AS in_a,
       |         max(CASE WHEN member = pb THEN 1 ELSE 0 END) AS in_b
       |       FROM pool GROUP BY 1, 2, 3),
       |top AS (SELECT * FROM (
       |          SELECT uh.*,
       |            row_number() OVER (PARTITION BY pa, pb ORDER BY h) AS rn
       |          FROM uh) WHERE rn <= $KmvK),
       |agg AS (SELECT pa AS source_a, pb AS source_b,
       |          count(*) AS m, max(h) AS vk, sum(in_a * in_b) AS c
       |        FROM top GROUP BY 1, 2)
       |SELECT source_a, source_b, m AS sketch_m,
       |  CAST(CASE WHEN m = $KmvK THEN ((m - 1) * $P) // vk ELSE m END
       |       AS BIGINT) AS union_est,
       |  ${rSql("c * 1.0 / m", 4)} AS jaccard_est,
       |  CAST((2 * c * (CASE WHEN m = $KmvK THEN ((m - 1) * $P) // vk
       |                      ELSE m END) + m) // (2 * m) AS BIGINT)
       |    AS overlap_est
       |FROM agg ORDER BY source_a, source_b""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c15_corpus_overlap" -> (c15CorpusOverlap _),
    "c15b_corpus_overlap_kmv" -> (c15bCorpusOverlapKmv _),
    "c13_corpus_job" -> (c13CorpusJob _),
    "c12_corpus_datasheet" -> (c12CorpusDatasheet _),
    "c10_sequence_packing" -> (c10SequencePacking _),
    "c11_epoch_upsample" -> (c11EpochUpsample _),
    "c01_training_corpus" -> (c01TrainingCorpus _),
    "c02_corpus_budget" -> (c02CorpusBudget _),
    "c03_mixture_sample" -> (c03MixtureSample _),
    "c04_snapshot_merge" -> (c04SnapshotMerge _),
    "c05_weighted_sample" -> (c05WeightedSample _),
    "c06_temperature_mix" -> (c06TemperatureMix _),
    "c07_curriculum_shards" -> (c07CurriculumShards _),
    "c08_domain_cap" -> (c08DomainCap _))

  val oracles: Map[String, String] = Map(
    "c15_corpus_overlap" -> c15Sql,
    "c15b_corpus_overlap_kmv" -> c15bSql,
    "c13_corpus_job" -> c13Sql,
    "c12_corpus_datasheet" -> c12Sql,
    "c10_sequence_packing" -> c10Sql,
    "c11_epoch_upsample" -> c11Sql,
    "c01_training_corpus" -> c01Sql,
    "c02_corpus_budget" -> c02Sql,
    "c03_mixture_sample" -> c03Sql,
    "c04_snapshot_merge" -> c04Sql,
    "c05_weighted_sample" -> c05Sql,
    "c06_temperature_mix" -> c06Sql,
    "c07_curriculum_shards" -> c07Sql,
    "c08_domain_cap" -> c08Sql)
}
