package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamPipeline

/** Stateful streaming beyond the reference's stateless surface (SURVEY.md
  * §2.9 roadmap + training-pipeline needs): streaming deduplication with a
  * watermark-bounded state store, and an event-time stream-stream join.
  */
class StreamStatefulSpec extends AnyFunSuite with SparkTestSession {

  private def jsonEvent(id: Long, typ: String, value: Double, ts: String) =
    s"""{"event_id":$id,"user_id":${id % 7},"event_type":"$typ",""" +
      s""""value":$value,"ts":"$ts"}"""

  test("streaming dedup drops replayed event_ids (watermark-bounded state)") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[String]
    // id=1 sent twice in-batch, id=2 replayed in a later batch
    ms.addData(
      jsonEvent(1, "error", 1.0, "2024-01-01T10:00:00Z"),
      jsonEvent(1, "error", 1.0, "2024-01-01T10:00:00Z"),
      jsonEvent(2, "click", 2.0, "2024-01-01T10:01:00Z"))
    val deduped = StreamPipeline.parse(ms.toDF().select(col("value")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_t")
      .outputMode("append").start()
    q.processAllAvailable()
    ms.addData(jsonEvent(2, "click", 2.0, "2024-01-01T10:01:30Z")) // replay
    ms.addData(jsonEvent(3, "purchase", 3.0, "2024-01-01T10:02:00Z"))
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dedup_t").select("event_id").collect()
      .map(_.getLong(0)).toList
    assert(ids.sorted == List(1L, 2L, 3L), s"got $ids")
  }

  test("stream-static broadcast enrichment joins each micro-batch against a dimension") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    // static user dimension (the production shape: stream enriched against
    // a broadcast dim table; re-resolved per micro-batch, no state store)
    val dim = broadcast(Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier"))
    val ms = MemoryStream[String]
    ms.addData(
      jsonEvent(1, "error", 5.0, "2024-01-01T10:00:00Z"),   // user 1
      jsonEvent(2, "click", 1.0, "2024-01-01T10:01:00Z"),   // user 2
      jsonEvent(3, "click", 1.0, "2024-01-01T10:02:00Z"))   // user 3: no dim row
    val enriched = StreamPipeline.derive(
      StreamPipeline.parse(ms.toDF().select(col("value"))))
      .join(dim, Seq("user_id"), "left_outer")
      .select(col("event_id"), coalesce(col("tier"), lit("unknown")).as("tier"))
    val q = enriched.writeStream.format("memory").queryName("enrich_t")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("enrich_t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "gold"), (2L, "basic"), (3L, "unknown")), s"got $rows")
  }

  test("flatMapGroupsWithState emits velocity alerts and timer-driven silence alerts") {
    implicit val ctx = spark.sqlContext
    implicit val ss = spark
    import spark.implicits._
    import graft.streaming.AlertStream
    val ms = MemoryStream[String]
    // user 1 (ids 1,8,15 → 1%7=1): 3 events → velocity; user 2 (id 2): one
    ms.addData(
      jsonEvent(1, "click", 1.0, "2024-01-01T10:00:00Z"),
      jsonEvent(8, "click", 2.0, "2024-01-01T10:00:10Z"),
      jsonEvent(15, "purchase", 4.0, "2024-01-01T10:00:20Z"),
      jsonEvent(2, "click", 7.0, "2024-01-01T10:00:30Z"))
    val q = AlertStream.alerts(
        StreamPipeline.parse(ms.toDF().select(col("value"))))
      .writeStream.format("memory").queryName("alerts_t")
      .outputMode("append").start()
    q.processAllAvailable()
    // advance the watermark past both users' 2-min silence horizon…
    ms.addData(jsonEvent(3, "click", 1.0, "2024-01-01T10:10:00Z"))
    q.processAllAvailable()
    // …then one more batch so the armed timers are evaluated against it
    ms.addData(jsonEvent(4, "click", 1.0, "2024-01-01T10:12:00Z"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("alerts_t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(rows.contains((1L, "velocity", 3L, 7.0)), s"got $rows")
    assert(rows.contains((1L, "went_silent", 3L, 7.0)), s"got $rows")
    assert(rows.contains((2L, "went_silent", 1L, 7.0)), s"got $rows")
    // users 3/4 are still inside their horizon: no silence alert for them
    assert(!rows.exists(r => r._1 == 3L || r._1 == 4L), s"got $rows")
  }

  test("stream-stream LEFT OUTER join emits the null row only after the watermark closes the window") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[String]
    val buys = MemoryStream[String]
    clicks.addData(
      jsonEvent(10, "click", 1.0, "2024-01-01T10:00:00Z"),  // converts
      jsonEvent(11, "click", 1.0, "2024-01-01T10:01:00Z"))  // never buys
    buys.addData(
      jsonEvent(10, "purchase", 9.0, "2024-01-01T10:04:00Z"))
    def side(ms: MemoryStream[String], prefix: String) =
      StreamPipeline.parse(ms.toDF().select(col("value")))
        .select(col("event_id").as(s"${prefix}_id"),
          col("user_id").as(s"${prefix}_user"), col("ts").as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", "10 minutes")
    val joined = side(clicks, "c").join(side(buys, "b"),
      expr("c_user = b_user AND b_ts BETWEEN c_ts AND c_ts + INTERVAL 5 MINUTES"),
      "leftOuter")
    val q = joined.writeStream.format("memory").queryName("ssoj_t")
      .outputMode("append").start()
    q.processAllAvailable()
    // the matched pair can emit now; the unmatched click CANNOT — a buy
    // might still arrive until the watermark passes c_ts + 5 min + delay
    val early = spark.table("ssoj_t").collect()
      .map(r => (r.getLong(0), r.isNullAt(3))).toSet
    assert(early == Set((10L, false)), s"got $early")
    // push both watermarks far past the horizon, then one more batch so
    // the outer state is evaluated against the advanced watermark
    clicks.addData(jsonEvent(12, "click", 1.0, "2024-01-01T11:00:00Z"))
    buys.addData(jsonEvent(13, "purchase", 1.0, "2024-01-01T11:00:00Z"))
    q.processAllAvailable()
    clicks.addData(jsonEvent(14, "click", 1.0, "2024-01-01T11:30:00Z"))
    buys.addData(jsonEvent(15, "purchase", 1.0, "2024-01-01T11:30:00Z"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ssoj_t").collect()
      .map(r => (r.getLong(0), r.isNullAt(3))).toSet
    // click 11 now appears, with a NULL buy side
    assert(rows.contains((11L, true)), s"got $rows")
  }

  test("event-time stream-stream inner join within the watermark horizon") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[String]
    val buys = MemoryStream[String]
    clicks.addData(
      jsonEvent(10, "click", 1.0, "2024-01-01T10:00:00Z"),
      jsonEvent(11, "click", 1.0, "2024-01-01T10:20:00Z"))
    buys.addData(
      jsonEvent(10, "purchase", 9.0, "2024-01-01T10:04:00Z"), // within 5 min
      jsonEvent(11, "purchase", 9.0, "2024-01-01T10:50:00Z")) // too late
    def side(ms: MemoryStream[String], prefix: String) =
      StreamPipeline.parse(ms.toDF().select(col("value")))
        .select(col("user_id").as(s"${prefix}_user"),
          col("ts").as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", "10 minutes")
    val joined = side(clicks, "c").join(side(buys, "b"),
      expr("c_user = b_user AND b_ts BETWEEN c_ts AND c_ts + INTERVAL 5 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssj_t")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val users = spark.table("ssj_t").select("c_user").collect()
      .map(_.getLong(0)).toList
    assert(users == List(10L % 7), s"only the within-window pair joins: $users")
  }

  test("streaming canary z-stat == batch f08 on the same events (parity)") {
    import graft.operators.DriftOps
    import graft.streaming.DriftStream
    // file-stream the sf0.001 events table through the SAME split-count
    // aggregate the batch operator composes, complete-mode into a sink
    // table, then fold the sink with the shared arithmetic
    val path = s"$Sf/events.parquet"
    // the file source wants a DIRECTORY feed (its production shape: files
    // landing in a drop dir) — stage the single-file table into one
    val dir = java.nio.file.Files.createTempDirectory("canary_feed")
    java.nio.file.Files.copy(java.nio.file.Paths.get(path),
      dir.resolve("events.parquet"))
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val q = DriftStream.conversionSplits(stream)
      .writeStream.format("memory").queryName("canary_t")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val fromStream =
      DriftOps.twoProportionRow(spark.table("canary_t")).collect().head
    val fromBatch = DriftOps.f08TwoProportion(spark, Sf).collect().head
    assert(fromStream == fromBatch,
      s"stream $fromStream != batch $fromBatch")
    assert(!fromStream.isNullAt(fromStream.fieldIndex("z")))
  }
}
