package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues,
  ValueState}
import org.apache.spark.sql.types._
import graft.operators.TextFn

/** Per-source running profile state (top-level: encoder codegen needs
  * public, non-nested case classes).
  */
case class SourceProfile(source: String, docs: Long, tokens: Long,
    maxTokens: Long)

/** Projection consumed by the stateful operator. */
case class DocTokens(source: String, n_tokens: Long)

/** Streaming ingestion shape of the training-corpus pipeline: the SAME
  * quality/fingerprint logic as the batch `operators.Corpus`, applied to an
  * unbounded document stream — quality gate (stateless), exact near-line
  * dedup by content fingerprint within a watermark (state store bounded by
  * the horizon), and a custom per-source running profile via
  * `mapGroupsWithState` (the user-defined-state operator class the
  * reference's roadmap never reached).
  *
  * Scale: the dedup state is keyed by the 8-byte fingerprint (not the
  * text), so state size is O(docs in horizon × 8B); the profile state is
  * one row per source. Both shuffle once on their key per micro-batch.
  */
object CorpusStream {

  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("source", StringType), StructField("ts", TimestampType)))

  /** JSON envelope → typed docs (same envelope shape as the event stream). */
  def parseDocs(envelope: DataFrame): DataFrame =
    envelope
      .select(from_json(col("value").cast("string"), DocSchema).as("d"))
      .select("d.*")

  /** Stateless quality gate + fingerprint (TextFn logic, stream/batch
    * agnostic — the batch pipeline uses the identical expressions).
    */
  def qualityGate(docs: DataFrame): DataFrame = {
    val t = TextFn.tokens(col("text"))
    docs
      .withColumn("n_tokens", size(t).cast("long"))
      .withColumn("distinct_ratio",
        TextFn.r(size(array_distinct(t)).cast("double") / col("n_tokens"), 4))
      .filter(col("n_tokens") >= 3 && col("distinct_ratio") >= 0.2)
      .withColumn("fingerprint", TextFn.charFingerprint(col("text")))
  }

  /** Watermarked exact dedup on the content fingerprint: replayed or
    * re-crawled identical documents inside the horizon are dropped.
    */
  def dedupByFingerprint(gated: DataFrame): DataFrame =
    gated
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Custom state via `mapGroupsWithState`: one evolving profile row per
    * source, updated each micro-batch — the accumulate-forever shape that
    * windowed aggregation can't express (no window, state lives until the
    * source goes quiet past the timeout).
    */
  def sourceProfiles(deduped: DataFrame)(implicit s: SparkSession): Dataset[SourceProfile] = {
    import s.implicits._
    // NoTimeout: profiles live for the query's lifetime. (A processing-time
    // timeout would make the engine self-trigger empty batches forever just
    // to evaluate timers — a real cost on an idle stream, and it never lets
    // processAllAvailable settle. Evict by timeout only when state must be
    // garbage-collected, and accept the idle-trigger churn.)
    deduped.select(col("source"), col("n_tokens")).as[DocTokens]
      .groupByKey(_.source)
      .mapGroupsWithState[SourceProfile, SourceProfile](
        GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[DocTokens], state: GroupState[SourceProfile]) =>
          val prev = state.getOption.getOrElse(SourceProfile(source, 0L, 0L, 0L))
          val next = rows.foldLeft(prev) { (p, r) =>
            SourceProfile(source, p.docs + 1, p.tokens + r.n_tokens,
              math.max(p.maxTokens, r.n_tokens))
          }
          state.update(next)
          next
      }
  }

  /** Full streaming pipeline: envelope → quality → dedup → profiles. */
  def pipeline(envelope: DataFrame)(implicit s: SparkSession): Dataset[SourceProfile] =
    sourceProfiles(dedupByFingerprint(qualityGate(parseDocs(envelope))))

  /** Output mode contract: mapGroupsWithState requires update mode. */
  val ProfileOutputMode: OutputMode = OutputMode.Update()

  /** Streaming count-min sketch — the streaming twin of the batch e12
    * heavy-hitter sketch, and the cleanest demonstration that the CMS is
    * the RIGHT state shape for an unbounded stream: the sketch IS a
    * plain streaming aggregation over the (row, bucket) grid, so the
    * state store holds AT MOST d·w rows (256 here) no matter how many
    * tokens flow through — fixed-size state with no watermark, no
    * timeout, no custom state class. Cell coordinates come from the ONE
    * shared [[graft.operators.TextOps.cmsBuckets]] definition, so the
    * streaming grid is cell-mergeable with any batch grid (union by
    * cell-sum) and honors the same never-underestimates probe contract.
    */
  def cmsCells(docs: DataFrame): DataFrame =
    docs
      .select(explode(TextFn.tokens(col("text"))).as("w"))
      .select(explode(graft.operators.TextOps.cmsBuckets(col("w"))).as("c"))
      .groupBy(col("c.j").as("j"), col("c.b").as("b"))
      .agg(count(lit(1)).as("cnt"))

  /** Output mode contract: an unwindowed running aggregate emits its
    * updated cells per batch.
    */
  val CmsOutputMode: OutputMode = OutputMode.Update()

  /** The Spark 4 `transformWithState` spelling of [[sourceProfiles]] — the
    * operator that REPLACES `mapGroupsWithState` going forward: typed
    * named state handles (`ValueState`/`ListState`/`MapState`) created in
    * `init`, optional per-state TTL, timers, and schema evolution of
    * state, all backed by the RocksDB state store (the provider the
    * operator requires, and the one a 100 TB stateful deployment runs
    * anyway: state spills off-heap instead of living on the executor
    * heap like the HDFS-backed store). Semantics here are identical to
    * [[sourceProfiles]] — one evolving profile row per source — so the
    * spec can assert old-vs-new operator equivalence batch for batch.
    */
  class SourceProfileProcessor
      extends StatefulProcessor[String, DocTokens, SourceProfile] {
    @transient private var profile: ValueState[SourceProfile] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      profile = getHandle.getValueState[SourceProfile]("profile",
        Encoders.product[SourceProfile], TTLConfig.NONE)

    override def handleInputRows(source: String, rows: Iterator[DocTokens],
        timerValues: TimerValues): Iterator[SourceProfile] = {
      val prev =
        if (profile.exists()) profile.get()
        else SourceProfile(source, 0L, 0L, 0L)
      val next = rows.foldLeft(prev) { (p, r) =>
        SourceProfile(source, p.docs + 1, p.tokens + r.n_tokens,
          math.max(p.maxTokens, r.n_tokens))
      }
      profile.update(next)
      Iterator.single(next)
    }
  }

  /** [[pipeline]]'s profile stage on the new operator (gate + dedup are
    * unchanged — stateless/built-in stages don't care which stateful
    * operator follows them).
    */
  def sourceProfilesV2(deduped: DataFrame)(
      implicit s: SparkSession): Dataset[SourceProfile] = {
    import s.implicits._
    deduped.select(col("source"), col("n_tokens")).as[DocTokens]
      .groupByKey(_.source)
      .transformWithState(new SourceProfileProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
