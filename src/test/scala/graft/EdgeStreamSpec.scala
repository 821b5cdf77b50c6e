package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EdgeStream

/** Streaming co-occurrence edge build: finalized hour buckets must equal
  * the batch capped edge set ([[graft.graph.CoGraph.cappedEdges]]) — the
  * graph layer's stream≡batch contract, including through a BINDING cap
  * fed in adversarial (descending) arrival order.
  */
class EdgeStreamSpec extends AnyFunSuite with SparkTestSession {

  /** Feed (ts, user_id, event_type) rows through the stream in `splits`
    * micro-batches, close every bucket with two far-future sentinel
    * batches, and return the finalized (hour_epoch, src, dst) rows.
    */
  private def streamEdges(rows: Seq[(Timestamp, Long, String)], name: String,
      cap: Int, splits: Int): Array[(Long, Long, Long)] = {
    implicit val s = spark
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    withStateProvider(RocksDbProvider) {
      val ms = MemoryStream[(Timestamp, Long, String)]
      val out = EdgeStream.bucketEdges(
        ms.toDF().toDF("ts", "user_id", "event_type"), cap)
      val q = out.toDF().writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        val n = math.max(1, rows.length / splits)
        rows.grouped(n).foreach { b =>
          ms.addData(b)
          q.processAllAvailable()
        }
        // two sentinel batches: the first advances the watermark past
        // every real bucket, the second gives the engine the batch in
        // which the now-expired timers fire. The sentinel is a lone user
        // in its own far-future bucket — even if finalized it emits no
        // pairs.
        val far = new Timestamp(rows.map(_._1.getTime).max + 86400L * 1000)
        for (_ <- 1 to 2) {
          ms.addData(Seq((far, 999999999L, "error")))
          q.processAllAvailable()
        }
      } finally q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
  }

  test("finalized buckets == batch capped edge set on the real events (sf0.001)") {
    val rows = Tables.events(spark, Sf)
      // ts is TIMESTAMP_NTZ in the testdata; session TZ is UTC, so the
      // cast to an instant is the identity the batch build assumes
      .select(col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type")).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2))).toSeq
      .sortBy(_._1.getTime) // realistic arrival order
    val got = streamEdges(rows, "edge_stream_t", EdgeStream.Cap, splits = 3)

    // global fold (cross-bucket distinct) == the batch build
    val batch = graph.CoGraph.cappedEdges(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.map(t => (t._2, t._3)).toSet == batch)

    // per-bucket: each finalized bucket is exactly the pair set of its
    // cap smallest co-active users (driver-side reference fold)
    val expected = rows.filter(_._3 == "error")
      .map(t => (t._1.getTime / 1000 / 3600 * 3600, t._2)).distinct
      .groupBy(_._1)
      .flatMap { case (h, us) =>
        val keep = us.map(_._2).distinct.sorted.take(EdgeStream.Cap)
        for (a <- keep; b <- keep if a != b) yield (h, a, b)
      }.toSet
    assert(got.toSet == expected)
    // emitted once per bucket — no duplicate rows
    assert(got.length == got.distinct.length)
  }

  test("binding cap in adversarial order: descending ids across batches still keep the smallest") {
    val h0 = 3600L * 1000000 // an arbitrary exact hour
    // 10 users in ONE bucket arriving LARGEST-FIRST across micro-batches:
    // an arrival-order (first-seen) cap would keep {109..106}; the
    // keep-smallest accumulator must evict down to {100..103}
    val rows = (0 until 10).map(i =>
      (new Timestamp((h0 + 60 * i) * 1000), 109L - i, "error"))
    val got = streamEdges(rows, "edge_stream_cap_t", cap = 4, splits = 5)
    val keep = Seq(100L, 101L, 102L, 103L)
    val expected =
      (for (a <- keep; b <- keep if a != b) yield (h0, a, b)).toSet
    assert(got.toSet == expected)
  }

  test("late rows past the watermark cannot re-open a finalized bucket") {
    implicit val s = spark
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    withStateProvider(RocksDbProvider) {
      val ms = MemoryStream[(Timestamp, Long, String)]
      val out = EdgeStream.bucketEdges(
        ms.toDF().toDF("ts", "user_id", "event_type"), EdgeStream.Cap)
      val q = out.toDF().writeStream.format("memory")
        .queryName("edge_stream_late_t").outputMode("append").start()
      try {
        val h0 = 3600L * 2000000
        val t = (m: Long) => new Timestamp((h0 + 60 * m) * 1000)
        ms.addData(Seq((t(0), 1L, "error"), (t(1), 2L, "error")))
        q.processAllAvailable()
        // sentinel advances watermark past h0; next batch fires the timer
        val far = new Timestamp((h0 + 7200L) * 1000)
        ms.addData(Seq((far, 99L, "error")))
        q.processAllAvailable()
        ms.addData(Seq((far, 99L, "error")))
        q.processAllAvailable()
        // a straggler for the CLOSED bucket: dropped by the watermark,
        // so no partial second emission for h0
        ms.addData(Seq((t(2), 3L, "error")))
        q.processAllAvailable()
        ms.addData(Seq((far, 99L, "error")))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("edge_stream_late_t").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val h0 = 3600L * 2000000
      assert(got == Set((h0, 1L, 2L), (h0, 2L, 1L)))
    }
  }
}
