package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import graft.operators.Multimodal

/** One (doc, band-bucket) occurrence entering the stateful verify stage. */
case class PhBandDoc(bucket: String, doc_id: Long, ph: Long)

/** A perceptual hash remembered inside one band bucket's state. */
case class PhMember(doc_id: Long, ph: Long)

/** Emitted when an arriving frame Hamming-verifies ≤ radius against an
  * earlier frame sharing one of its band buckets.
  */
case class PhVerdict(doc_id: Long, dup_of: Long, hamming: Long)

/** STREAMING perceptual near-dup dedup — mm04b's ingestion-time
  * counterpart, and [[DedupStream]]'s discipline applied to the media
  * family: frames arrive on an unbounded stream, each is pHashed row-
  * locally, band-bucketed, and Hamming-verified against the ≤64 members
  * its buckets remember — candidates come from band collision (never a
  * corpus join), the verify is exact, and the owner is the EARLIEST
  * verifying member (d12's arg_min attribution, same as the text twin).
  *
  * Shape: the signature stage is mm04's own [[Multimodal.phashStub]]
  * through the one shared [[Multimodal.phashFrame]] scan (payload never
  * shuffles — only the 8-byte hash enters the stateful stage), and the
  * banding is mm04b's exact two-band split (`ph & 255`, `ph >> 8`) —
  * pigeonhole-lossless at radius [[Multimodal.PhRadius]] = 1. The member
  * cap is mm04b's own [[Multimodal.BucketMemberCap]]: one constant,
  * shared batch/stream, with mm04b's verbatim-flood guarantee carrying
  * over unchanged (identical payloads hash identically; the bucket's
  * earliest member is always retained; hamming(x,x)=0) —
  * PhashStreamSpec floods 70 replicas per text through the stream and
  * asserts the capped decision equals the uncapped one.
  *
  * Scale: state is buckets × ≤64 × 16 bytes — RocksDB-backed like the
  * text twin, with the same SCALE.md capacity model (the pHash member
  * row is ~30 B of heap vs the text twin's capped sid arrays, so the
  * media stream's state is the CHEAPER of the two). TTL horizon
  * ([[phVerdictsWithin]]) reuses the round-7 eviction contract:
  * re-crawls inside the horizon dedup, a replica arriving after it is
  * deliberately re-admitted, and state holds only the horizon's frames.
  */
object PhashStream {

  /** Band-bucket keys per frame — mm04b's two bands verbatim, as one
    * string key per (frame, band) for the keyed state stage.
    */
  def banded(hashes: DataFrame): DataFrame =
    hashes.select(col("doc_id"), col("ph"), explode(array(
      concat_ws("_", lit(0), col("ph").bitwiseAND(lit(255L))),
      concat_ws("_", lit(1), shiftright(col("ph"), 8))))
      .as("bucket"))

  /** The stateful verify stage: per band bucket, remember up to
    * [[Multimodal.BucketMemberCap]] members and Hamming-verify each
    * arrival against them. Within a micro-batch, arrivals are processed
    * in doc_id order so replayed batches are deterministic.
    */
  class PhBucketProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, PhBandDoc, PhVerdict] {
    @transient private var members: ListState[PhMember] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[PhMember]("members",
        Encoders.product[PhMember], ttl)

    override def handleInputRows(bucket: String, rows: Iterator[PhBandDoc],
        timerValues: TimerValues): Iterator[PhVerdict] = {
      val stored = scala.collection.mutable.ArrayBuffer.empty[PhMember]
      members.get().foreach(stored += _)
      val out = List.newBuilder[PhVerdict]
      rows.toSeq.sortBy(_.doc_id).foreach { r =>
        // owner = earliest verifying member in THIS bucket; dupDocs folds
        // min across buckets — mm04b's min(struct(mem_id, hamming)). The
        // m.doc_id < r.doc_id guard is mm04b's own join predicate:
        // without it an at-least-once redelivery would match a frame
        // against ITSELF (hamming = 0) and an out-of-order arrival could
        // name a LATER id as owner — both diverging from the batch twin.
        var ownerId = -1L
        var ownerH = 0L
        stored.foreach { m =>
          if (m.doc_id < r.doc_id && (ownerId < 0 || m.doc_id < ownerId)) {
            val h = java.lang.Long.bitCount(r.ph ^ m.ph).toLong
            if (h <= Multimodal.PhRadius) { ownerId = m.doc_id; ownerH = h }
          }
        }
        if (ownerId >= 0) out += PhVerdict(r.doc_id, ownerId, ownerH)
        // idempotent append: a redelivered frame must not burn a second
        // cap slot (batch members are DISTINCT smallest ids)
        if (stored.length < Multimodal.BucketMemberCap
            && !stored.exists(_.doc_id == r.doc_id)) {
          val m = PhMember(r.doc_id, r.ph)
          members.appendValue(m)
          stored += m
        }
      }
      out.result().iterator
    }
  }

  /** Streaming per-band verdicts over a media stream (the
    * [[graft.operators.MediaRow]] schema): a frame may emit up to 2 rows
    * (one per colliding band); fold with [[dupDocs]] (e.g. inside
    * `foreachBatch`) for the per-frame decision.
    */
  def phVerdicts(media: DataFrame)(
      implicit s: SparkSession): Dataset[PhVerdict] = {
    import s.implicits._
    banded(Multimodal.phashFrame(s, media))
      .select(col("bucket"), col("doc_id"), col("ph")).as[PhBandDoc]
      .groupByKey(_.bucket)
      .transformWithState(new PhBucketProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Horizon-bounded variant: bucket members expire after `ttl` — the
    * round-7 eviction contract (a replica inside the horizon dedups, one
    * past it is deliberately re-admitted), with [[DedupStream]]'s
    * documented ProcessingTime self-trigger caveat.
    */
  def phVerdictsWithin(media: DataFrame, ttl: java.time.Duration)(
      implicit s: SparkSession): Dataset[PhVerdict] = {
    import s.implicits._
    banded(Multimodal.phashFrame(s, media))
      .select(col("bucket"), col("doc_id"), col("ph")).as[PhBandDoc]
      .groupByKey(_.bucket)
      .transformWithState(new PhBucketProcessor(TTLConfig(ttl)),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** Batch fold of per-band verdicts to one row per duplicate frame —
    * earliest owner wins with ITS Hamming distance (mm04b's attribution).
    */
  def dupDocs(verdicts: DataFrame): DataFrame =
    verdicts.groupBy("doc_id")
      .agg(min(struct(col("dup_of"), col("hamming"))).as("o"))
      .select(col("doc_id"), col("o.dup_of").as("dup_of"),
        col("o.hamming").as("hamming"))
}
