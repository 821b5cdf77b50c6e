package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One scrambled shingle hash arriving for a source's KMV sketch. */
case class HashArrival(source: String, h: Long)

/** A source's KMV sketch snapshot after a micro-batch that changed it. */
case class KmvSnapshot(source: String, m: Int, vk: Long, values: Array[Long])

/** STREAMING KMV corpus sketch — [[graft.operators.Corpus.c15bCorpusOverlapKmv]]'s
  * stream twin: the per-source bottom-k distinct-hash sketch accumulated at
  * INGEST time, so cross-corpus overlap (contamination) is answerable
  * against a live feed without ever re-scanning it. The stateless derive is
  * the batch arm's own [[graft.operators.Corpus.shingleHashes]]; the pair
  * estimate over finalized sketches is the batch arm's own
  * [[graft.operators.Corpus.kmvPairEstimates]] — stream and batch share
  * both ends verbatim, and KmvStreamSpec pins bit-equality of the full
  * estimate table between the two paths.
  *
  * Shape: one `transformWithState` keyed by source, `TimeMode.None` (no
  * timers — a KMV sketch never closes; it is a monotone fold), Update
  * output. State per source is the running keep-smallest-k distinct hash
  * set — ≤ [[K]] longs no matter how much of the corpus streams past
  * (the same GroupedTopK-bound-as-state-bound argument as
  * [[EdgeStream]]). Keep-smallest of a SET is arrival-order-independent,
  * so the accumulated sketch — and every estimate derived from it — is a
  * pure function of the content seen, not of batching (the spec feeds the
  * same corpus in adversarial batch splits and gets the batch answer).
  *
  * Emission: after any micro-batch that changed a source's sketch, the
  * full snapshot (≤ k longs) is emitted in Update mode; the LATEST row
  * per source is the sketch. Snapshots are tiny and mergeable — ship
  * them to the driver, a mart, or another cluster and estimate overlap
  * against any other corpus's sketches without touching either corpus.
  */
object KmvStream {

  /** Sketch size — the batch arm's own k. */
  val K: Int = graft.operators.Corpus.KmvK

  /** Stateless derive shared with the batch arm: documents(source, text)
    * → (source, scrambled shingle hash) arrivals.
    */
  def arrivals(docs: DataFrame): DataFrame =
    graft.operators.Corpus.shingleHashes(docs)

  /** The sketch accumulator: keep-smallest-k DISTINCT hashes per source;
    * emit a snapshot when a batch changed the sketch.
    */
  class KmvProcessor(k: Int = K)
      extends StatefulProcessor[String, HashArrival, KmvSnapshot] {
    @transient private var values: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      values = getHandle.getListState[Long]("values",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(source: String, rows: Iterator[HashArrival],
        timerValues: TimerValues): Iterator[KmvSnapshot] = {
      val stored = mutable.SortedSet.empty[Long]
      values.get().foreach(stored += _)
      var changed = false
      rows.foreach { r =>
        val h = r.h
        if (!stored.contains(h)) {
          if (stored.size < k) { stored += h; changed = true }
          else if (h < stored.last) {
            stored -= stored.last; stored += h; changed = true
          }
        }
      }
      if (changed) {
        val arr = stored.toArray
        values.put(arr)
        Iterator.single(KmvSnapshot(source, arr.length, arr.last, arr))
      } else Iterator.empty
    }

    override def handleExpiredTimer(source: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[KmvSnapshot] =
      Iterator.empty // TimeMode.None — no timers
  }

  /** Streaming per-source sketch snapshots (Update mode: read the latest
    * row per source). `docs` must carry (source, text).
    *
    * k is fixed at [[K]] (= Corpus.KmvK): the shared pair-estimate stage
    * ([[graft.operators.Corpus.kmvPairEstimates]]) hardcodes that k for
    * both the merged bottom-k cutoff and the saturation test, so a
    * different sketch k would yield silently wrong union/overlap
    * estimates (a saturated smaller-k sketch would read as an exact
    * unsaturated union).
    */
  def sketches(docs: DataFrame)(
      implicit s: SparkSession): Dataset[KmvSnapshot] = {
    import s.implicits._
    arrivals(docs)
      .as[HashArrival]
      .groupByKey(_.source)
      .transformWithState(new KmvProcessor(K),
        TimeMode.None(), OutputMode.Update())
  }

  /** Latest snapshot per source from an Update-mode sink table, without a
    * batch ordinal: the sketch's own monotonicity orders snapshots — m is
    * nondecreasing (elements are only added or replaced) and once m = k,
    * every change strictly DECREASES vk — so the final state is the unique
    * row at (max m, then min vk) per source.
    */
  def latest(snapshots: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val w = Window.partitionBy("source")
      .orderBy(col("m").desc, col("vk").asc)
    snapshots.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Batch fold: latest snapshot per source → (source, h) sketch rows →
    * the SHARED pair-estimate stage. Compose as
    * `overlapEstimates(latest(sinkTable))`.
    */
  def overlapEstimates(latest: DataFrame): DataFrame =
    graft.operators.Corpus.kmvPairEstimates(
      latest.select(col("source"),
        org.apache.spark.sql.functions.explode(col("values")).as("h")))
}
