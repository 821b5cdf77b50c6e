package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamJoins

/** Stream–stream join semantics (`streaming/StreamJoins.scala`): inner
  * attribution within the event-time window, and the left-outer variant's
  * watermark-gated emission of unconverted clicks.
  */
class StreamJoinSpec extends AnyFunSuite with SparkTestSession {

  private def ts(s: String) = Timestamp.valueOf(s)

  // (event_id, user_id, event_type, value, ts) — StreamPipeline.parse shape
  private type Ev = (Long, Long, String, Double, Timestamp)

  test("inner join: purchases attribute to clicks within the window only") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    def shape(ms: MemoryStream[Ev]) = ms.toDF()
      .toDF("event_id", "user_id", "event_type", "value", "ts")

    val joined = StreamJoins.attributionJoin(shape(clicks), shape(purchases))
    val q = joined.writeStream.format("memory").queryName("attr_inner")
      .outputMode("append").start()
    try {
      clicks.addData(
        (1L, 7L, "click", 0.0, ts("2024-01-01 10:00:00")),
        (2L, 7L, "click", 0.0, ts("2024-01-01 10:20:00")),
        (3L, 9L, "click", 0.0, ts("2024-01-01 10:00:00")))
      purchases.addData(
        // 5 min after click 1: inside the 10-min window
        (101L, 7L, "purchase", 25.0, ts("2024-01-01 10:05:00")),
        // 22 min after click 1, 2 min after click 2: attributes to 2 only
        (102L, 7L, "purchase", 40.0, ts("2024-01-01 10:22:00")),
        // user 9 purchase BEFORE the click: never attributes
        (103L, 9L, "purchase", 99.0, ts("2024-01-01 09:59:00")))
      q.processAllAvailable()
      val rows = spark.table("attr_inner")
        .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
      assert(rows == Set((1L, 101L), (2L, 102L)),
        "each purchase joins exactly the clicks inside its lookback window")
    } finally q.stop()
  }

  test("left-outer join: unconverted clicks emit with nulls after watermark") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    def shape(ms: MemoryStream[Ev]) = ms.toDF()
      .toDF("event_id", "user_id", "event_type", "value", "ts")

    val joined = StreamJoins.attributionJoinLeftOuter(
      shape(clicks), shape(purchases))
    val q = joined.writeStream.format("memory").queryName("attr_outer")
      .outputMode("append").start()
    try {
      clicks.addData(
        (1L, 7L, "click", 0.0, ts("2024-01-01 10:00:00")), // converts
        (2L, 8L, "click", 0.0, ts("2024-01-01 10:00:00"))) // never converts
      purchases.addData(
        (101L, 7L, "purchase", 25.0, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()

      // advance event time on BOTH sides far past click 2's window + the
      // 1-minute watermark delay, so the unmatched click becomes provable.
      clicks.addData((3L, 1L, "click", 0.0, ts("2024-01-01 11:00:00")))
      purchases.addData(
        (102L, 1L, "purchase", 1.0, ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      // one more batch: outer-join null emission happens when the watermark
      // ADVANCES, which Spark evaluates at the next trigger.
      clicks.addData((4L, 2L, "click", 0.0, ts("2024-01-01 11:30:00")))
      purchases.addData(
        (103L, 2L, "purchase", 1.0, ts("2024-01-01 11:30:00")))
      q.processAllAvailable()

      val byClick = spark.table("attr_outer")
        .select(col("click_id"), col("purchase_id"))
        .as[(Long, Option[Long])].collect().groupBy(_._1)
      assert(byClick(1L).map(_._2).toSet == Set(Some(101L)),
        "converted click carries its purchase")
      assert(byClick(2L).map(_._2).toSet == Set(None),
        "unconverted click must surface exactly once, with NULL purchase")
    } finally q.stop()
  }
}
