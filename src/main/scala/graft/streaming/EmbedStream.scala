package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import graft.operators.Similarity

/** One (vector, LSH-table-bucket) occurrence entering the stateful
  * verify stage. `nrm` rides along so the cosine denominator is the
  * SAME Spark-computed sqrt both batch and stream use.
  */
case class EmbBandVec(bucket: String, vec_id: Long,
    embedding: Array[Float], nrm: Double)

/** A vector remembered inside one (table, bucket)'s state. */
case class EmbMember(vec_id: Long, embedding: Array[Float], nrm: Double)

/** Emitted when an arriving vector cosine-verifies ≥ threshold against
  * an earlier vector sharing one of its LSH buckets.
  */
case class EmbVerdict(vec_id: Long, dup_of: Long, cosine: Double)

/** STREAMING embedding near-dup dedup — d05d's ingestion-time
  * counterpart, completing the stream-twin set (text: [[DedupStream]],
  * perceptual: [[PhashStream]], embeddings: this). Vectors arrive on an
  * unbounded stream, each is bucketed row-locally by the SAME
  * deterministic hyperplane LSH every batch embedding operator uses
  * (v02/d05b/d05c/d05d — [[Similarity.bucketedOf]]), and cosine-verified
  * against the ≤[[Similarity.EmbBucketCap]] members its buckets
  * remember. Candidates come from bucket collision (never a corpus
  * join), the verify is exact, and the owner is the EARLIEST verifying
  * member (d12's arg_min attribution, same as both sibling twins).
  *
  * Exactness across the stream/batch boundary: the bucket ids and the
  * norms are computed by the SAME Spark column expressions batch d05d
  * uses (stateless stage — [[banded]]); only the pairwise dot product
  * runs inside the processor, as the IDENTICAL strict left-to-right
  * double fold `graft.functions.VecDot` compiles to, with the 6-dp
  * HALF_UP snap `round(col, 6)` applies — EmbedStreamSpec pins the
  * stream decision equal to batch d05d on the real corpus.
  *
  * Scale: state is buckets × ≤cap × (8 B id + d·4 B vector + 8 B norm)
  * — at d = 64 that is ~300 B/member, RocksDB-backed like the sibling
  * twins with the same SCALE.md capacity model. Per arrival the compare
  * cost is ≤ tables·cap cosines of d multiplications each, a priori.
  */
object EmbedStream {

  /** Stateless stage: norm + LSH buckets per vector — batch d05d's own
    * column expressions, one string key per (vector, table). `d` is the
    * embedding dimensionality (a stream cannot be probed for it the way
    * [[Similarity.maxDim]] probes a table).
    */
  def banded(emb: DataFrame, d: Int): DataFrame =
    Similarity.bucketedOf(Similarity.withNormOf(emb), d)
      .select(concat_ws("_", col("t"), col("bk")).as("bucket"),
        col("vec_id"), col("embedding"), col("nrm"))

  /** The exact arithmetic of the batch verify: VecDot's strict
    * left-to-right double fold, then Spark `round(_, 6)`'s HALF_UP snap.
    */
  private[graft] def cosine6(a: Array[Float], na: Double,
      b: Array[Float], nb: Double): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    java.math.BigDecimal.valueOf(acc / (na * nb))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
  }

  /** The stateful verify stage: per (table, bucket), remember up to
    * [[Similarity.EmbBucketCap]] members and cosine-verify each arrival
    * against them. Within a micro-batch, arrivals process in vec_id
    * order so replayed batches are deterministic.
    */
  class EmbBucketProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, EmbBandVec, EmbVerdict] {
    @transient private var members: ListState[EmbMember] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[EmbMember]("members",
        Encoders.product[EmbMember], ttl)

    override def handleInputRows(bucket: String, rows: Iterator[EmbBandVec],
        timerValues: TimerValues): Iterator[EmbVerdict] = {
      val stored = scala.collection.mutable.ArrayBuffer.empty[EmbMember]
      members.get().foreach(stored += _)
      val out = List.newBuilder[EmbVerdict]
      rows.toSeq.sortBy(_.vec_id).foreach { r =>
        // owner = earliest verifying member in THIS bucket; dupDocs
        // folds min across buckets — d05d's min(struct(mem_id, cosine)).
        // The m.vec_id < r.vec_id guard is batch d05d's own join
        // predicate: without it an at-least-once redelivery would match
        // a vector against ITSELF (cosine = 1), and an out-of-order
        // arrival could name a LATER id as its owner — both diverging
        // from the batch twin.
        var ownerId = -1L
        var ownerC = 0.0
        stored.foreach { m =>
          if (m.vec_id < r.vec_id && (ownerId < 0 || m.vec_id < ownerId)) {
            val c = cosine6(r.embedding, r.nrm, m.embedding, m.nrm)
            if (c >= Similarity.NearDupT) { ownerId = m.vec_id; ownerC = c }
          }
        }
        if (ownerId >= 0) out += EmbVerdict(r.vec_id, ownerId, ownerC)
        // idempotent append: a redelivered vector must not burn a second
        // cap slot (batch members are DISTINCT smallest ids)
        if (stored.length < Similarity.EmbBucketCap
            && !stored.exists(_.vec_id == r.vec_id)) {
          val m = EmbMember(r.vec_id, r.embedding, r.nrm)
          members.appendValue(m)
          stored += m
        }
      }
      out.result().iterator
    }
  }

  /** Streaming per-bucket verdicts over a (vec_id, embedding) stream: a
    * vector may emit up to [[Similarity]]'s table count of rows (one per
    * colliding table); fold with [[dupDocs]] (e.g. inside `foreachBatch`)
    * for the per-vector decision.
    */
  def embVerdicts(emb: DataFrame, d: Int)(
      implicit s: SparkSession): Dataset[EmbVerdict] = {
    import s.implicits._
    banded(emb, d).as[EmbBandVec]
      .groupByKey(_.bucket)
      .transformWithState(new EmbBucketProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Horizon-bounded variant: bucket members expire after `ttl` — the
    * round-7 eviction contract, with [[DedupStream]]'s documented
    * ProcessingTime self-trigger caveat.
    */
  def embVerdictsWithin(emb: DataFrame, d: Int, ttl: java.time.Duration)(
      implicit s: SparkSession): Dataset[EmbVerdict] = {
    import s.implicits._
    banded(emb, d).as[EmbBandVec]
      .groupByKey(_.bucket)
      .transformWithState(new EmbBucketProcessor(TTLConfig(ttl)),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** Batch fold of per-bucket verdicts to one row per duplicate vector —
    * earliest owner wins with ITS cosine (d05d's attribution).
    */
  def dupDocs(verdicts: DataFrame): DataFrame =
    verdicts.groupBy("vec_id")
      .agg(min(struct(col("dup_of"), col("cosine"))).as("o"))
      .select(col("vec_id"), col("o.dup_of").as("dup_of"),
        col("o.cosine").as("cosine"))
}
