package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One fraud-activity arrival entering the bucket accumulator: the event
  * time rides along for the watermark; the key is the hour bucket.
  */
case class HourActivity(ts: java.sql.Timestamp, hour_epoch: Long,
    user_id: Long)

/** One directed co-occurrence edge emitted when its hour bucket closes. */
case class BucketEdge(hour_epoch: Long, src: Long, dst: Long)

/** STREAMING co-occurrence edge build — the graph layer's stream twin
  * (the one §2.10 family that had none; dedup/drift/phash/embed each
  * have one). The batch object is [[graft.graph.CoGraph.cappedEdges]]:
  * per hour bucket keep the [[graft.graph.NeighborAgg.BucketCap]]
  * SMALLEST co-active user ids (the GroupedTopK cap), then link every
  * ordered pair. Reference anchor: the same hour-bucket co-occurrence
  * join `notebooks/4_graphx.ipynb:193-208` — re-expressed as
  * ingestion-time accumulation instead of a batch self-join.
  *
  * Shape: stateless [[EdgeStream.activity]] derive (shared verbatim with
  * a batch frame — how the spec proves stream≡batch), then ONE
  * `transformWithState` keyed by hour bucket in EVENT-TIME mode:
  *
  *  - State per bucket is the running keep-smallest-`cap` id set —
  *    ≤ cap longs however hot the bucket gets, the GroupedTopK bound as
  *    a state bound. Keep-smallest is a pure function of the arrival
  *    SET, so the accumulated state is arrival-order-independent — a
  *    stronger determinism than the LSH bucket's first-seen cap
  *    (EdgeStreamSpec feeds a storm bucket in descending order across
  *    batches and gets the batch answer).
  *  - Edges are emitted ONCE per bucket, when the event-time timer
  *    fires at bucket close (watermark past hour end): emitting on
  *    arrival would have to retract when a smaller id later evicts a
  *    member, which append mode cannot do. Close-on-watermark is the
  *    same finalize-don't-retract trade `dropDuplicatesWithinWatermark`
  *    and windowed aggregation make; rows later than the watermark are
  *    dropped by the engine before the processor sees them, so a fired
  *    bucket cannot be re-opened by a straggler.
  *
  * Scale: state is buckets-in-flight × cap longs (a bucket leaves state
  * the moment it closes — the horizon, not the stream history, bounds
  * state); each firing emits ≤ cap·(cap−1) edges. The global
  * cross-bucket `distinct` the batch build ends with is deliberately
  * NOT in the stream (append mode cannot retract a re-emission of an
  * edge a later bucket repeats); [[EdgeStream.edges]] is the batch-side
  * fold, exactly [[DedupStream.dupDocs]]' role for verdicts.
  */
object EdgeStream {

  /** Per-bucket id cap — the batch build's own GroupedTopK bound. */
  val Cap: Int = graft.graph.NeighborAgg.BucketCap

  /** Stateless derive shared by stream and batch: fraud signals to
    * (ts, hour bucket, user) rows. Identical semantics to the batch
    * [[graft.graph.CoGraph.activity]] modulo the retained `ts` (the
    * watermark column) and the dropped `distinct` (the accumulator
    * dedups in-state; a batch caller gets the dedup from the
    * keep-smallest fold too).
    */
  def activity(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "error")
      .select(col("ts"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("user_id"))

  /** The bucket accumulator: keep-smallest-`cap` ids while the bucket is
    * open; emit all ordered pairs and clear when the close timer fires.
    */
  class HourBucketEdgeProcessor(cap: Int = Cap)
      extends StatefulProcessor[Long, HourActivity, BucketEdge] {
    @transient private var members: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[Long]("members",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(hour: Long, rows: Iterator[HourActivity],
        timerValues: TimerValues): Iterator[BucketEdge] = {
      // ≤ cap members — a SortedSet keeps the eviction candidate (max)
      // at the tail without re-sorting per arrival
      val stored = mutable.SortedSet.empty[Long]
      members.get().foreach(stored += _)
      var changed = false
      rows.foreach { r =>
        val id = r.user_id
        if (!stored.contains(id)) {
          if (stored.size < cap) { stored += id; changed = true }
          else if (id < stored.last) {
            stored -= stored.last; stored += id; changed = true
          }
        }
      }
      if (changed) members.put(stored.toArray)
      // (re-)register the close timer at hour end: registration is
      // keyed (key, expiry), so every micro-batch re-registering the
      // same instant is idempotent
      getHandle.registerTimer((hour + 3600L) * 1000L)
      Iterator.empty
    }

    override def handleExpiredTimer(hour: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[BucketEdge] = {
      val ids = members.get().toArray.sorted
      members.clear()
      ids.iterator.flatMap(a =>
        ids.iterator.filter(_ != a).map(b => BucketEdge(hour, a, b)))
    }
  }

  /** Streaming per-bucket finalized edges: one row per directed pair per
    * closed hour bucket. `events` must carry the batch events schema
    * (ts, user_id, event_type, …); `lateness` is the watermark delay —
    * how long a bucket stays open past its hour for stragglers.
    */
  def bucketEdges(events: DataFrame, cap: Int = Cap,
      lateness: String = "0 seconds")(
      implicit s: SparkSession): Dataset[BucketEdge] = {
    import s.implicits._
    activity(events)
      .withWatermark("ts", lateness)
      .as[HourActivity]
      .groupByKey(_.hour_epoch)
      .transformWithState(new HourBucketEdgeProcessor(cap),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Batch fold of finalized bucket edges to the global edge set — the
    * cross-bucket `distinct` the batch build ends with, run e.g. inside
    * `foreachBatch` or over the collected sink.
    */
  def edges(bucketEdges: DataFrame): DataFrame =
    bucketEdges.select("src", "dst").distinct()
}
