package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{MediaRow, Multimodal}
import graft.streaming.PhashStream

/** Streaming perceptual near-dup dedup: the stateful bucket-verify
  * operator must reach exactly mm04b's batch decision — candidates from
  * band collision, exact Hamming verify, keep-first, ≤64 members per
  * bucket — while seeing the media corpus one arrival at a time.
  */
class PhashStreamSpec extends AnyFunSuite with SparkTestSession {

  /** Run media rows through the streaming operator in two micro-batches
    * split at the doc_id median (arrival order == doc_id order) and
    * return the collected verdicts.
    */
  private def streamVerdicts(media: Seq[MediaRow], name: String)
      : Array[(Long, Long, Long)] = {
    implicit val s = spark
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    withStateProvider(RocksDbProvider) {
      val ms = MemoryStream[MediaRow]
      val verdicts = PhashStream.phVerdicts(ms.toDF())
      val q = verdicts.toDF().writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        val sorted = media.sortBy(_.doc_id)
        val (b1, b2) = sorted.splitAt(sorted.length / 2)
        ms.addData(b1)
        q.processAllAvailable()
        ms.addData(b2)
        q.processAllAvailable()
      } finally q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
  }

  private def fold(got: Array[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    import spark.implicits._
    PhashStream.dupDocs(got.toSeq.toDF("doc_id", "dup_of", "hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("stream decision == batch mm04b decision on the real media corpus") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, Sf).as[MediaRow].collect().toSeq
    val got = streamVerdicts(media, "ph_stream_t")
    val streamDups = fold(got)
    val batchDups = Multimodal.mm04bCappedNeardup(spark, Sf).collect()
      .filter(!_.getBoolean(1))
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(batchDups.nonEmpty, "fixture must contain perceptual near-dups")
    // decision set AND owner attribution AND the owner's Hamming agree —
    // the streaming operator IS mm04b seen one arrival at a time
    assert(streamDups == batchDups,
      s"diff=${(streamDups diff batchDups) ++ (batchDups diff streamDups)}")
    // every streamed verdict names a valid earlier partner within radius
    got.foreach { case (dup, owner, h) =>
      assert(owner < dup && h <= Multimodal.PhRadius, s"($dup,$owner,$h)")
    }
  }

  test("member cap loses nothing on a streamed 70-replica verbatim flood") {
    // 70 > BucketMemberCap (64): members stop accumulating, yet every
    // later replica still matches the bucket's earliest member — the
    // streamed twin of Round7OpsSpec's mm04b flood contract
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "pack my box with five dozen liquor jugs before noon today",
      "how vexingly quick daft zebras jump over fences at dawn")
    val flood = for {
      (t, ti) <- texts.zipWithIndex
      r <- 0 until 70
    } yield MediaRow(ti * 1000L + r, "image", t.getBytes("UTF-8"), 64, 64, 0)
    val got = streamVerdicts(flood, "ph_flood_t")
    val streamDups = fold(got)
    val hashes = Multimodal.phashFrame(spark, flood.toDF()).cache()
    val uncapped = Multimodal.uncappedDecisionOn(hashes).collect()
      .filter(!_.getBoolean(1))
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    hashes.unpersist()
    assert(streamDups == uncapped,
      s"diff=${(streamDups diff uncapped) ++ (uncapped diff streamDups)}")
    // and exactly one keeper per text survives the stream
    assert(flood.map(_.doc_id).toSet.size - streamDups.size == texts.size)
  }

  test("TTL horizon variant evicts at the horizon: post-horizon replica is re-admitted") {
    // the round-7 eviction contract on the media family: a replica
    // arriving AFTER the horizon must NOT match the expired member — it
    // becomes the bucket's new first member — while companions arriving
    // with each wave still dedup (positive controls on both sides of the
    // horizon). Polls the SINK for the companion verdicts instead of
    // recentProgress — the bounded progress ring buffer can evict entries
    // under ProcessingTime self-triggering (the round-7 advice item)
    implicit val s = spark
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val ttl = java.time.Duration.ofSeconds(4)
    val bytes = "alpha beta gamma delta epsilon zeta".getBytes("UTF-8")
    def row(id: Long) = MediaRow(id, "image", bytes, 64, 64, 0)
    withStateProvider(RocksDbProvider) {
      val ms = MemoryStream[MediaRow]
      val q = PhashStream.phVerdictsWithin(ms.toDF(), ttl)
        .toDF().writeStream.format("memory").queryName("ph_ttl_t")
        .outputMode("append").start()
      val clock = new BatchClock(q)
      try {
        // wave 1: doc 1 + companion 2 — the (2 dup_of 1) verdict in the
        // sink proves doc 1 is IN STATE before the horizon wait starts
        ms.addData(Seq(row(1L), row(2L)))
        var tries = 0
        while (tries < 150 && spark.table("ph_ttl_t").count() < 1) {
          Thread.sleep(200); tries += 1
        }
        // baseline AFTER wave 1: verdicts are per-BAND (up to 2 rows for
        // one dup), so polling for an absolute count would be satisfied
        // by wave 1 alone and stop() would race the wave-2 batch
        val wave1Rows = spark.table("ph_ttl_t").count()
        // expiry wait derived from the stream's OWN clock (round-8
        // verdict item 7): ship wave 2 only once a batch's trigger
        // timestamp has passed the write batch's timestamp + ttl
        clock.awaitClockPast(clock.awaitWriteTs() + ttl.toMillis)
        // wave 2: replica 10 + companion 11
        ms.addData(Seq(row(10L), row(11L)))
        tries = 0
        while (tries < 150
            && spark.table("ph_ttl_t").count() <= wave1Rows) {
          Thread.sleep(200); tries += 1
        }
      } finally { clock.close(); q.stop() }
      val got = spark.table("ph_ttl_t").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // 2 dedups vs 1 in-horizon; 10 is re-admitted (1/2 expired);
      // 11 dedups vs 10 — and crucially NOT vs 1
      assert(got == Set(2L -> 1L, 11L -> 10L),
        s"expected {(2,1),(11,10)}, got $got")
    }
  }
}
