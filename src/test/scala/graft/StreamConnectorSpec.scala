package graft

import java.nio.file.{Files, Path, StandardOpenOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{LineProtocolSource, LpStreamOffset}

/** End-to-end micro-batch semantics of the DSv2 streaming connector
  * (`sources/LineProtocolStream.scala`) — the Kafka-shaped round-trip the
  * image's missing spark-sql-kafka jar prevents us from running against a
  * real broker (reference `streaming/kafka_to_influxdb.py:69-155`): records
  * are produced into the "topic" (append-only line files), consumed through
  * `readStream`, and checked for exactly-once delivery across restarts,
  * newline-aligned offset commits, and partial-line invisibility.
  */
class StreamConnectorSpec extends AnyFunSuite with SparkTestSession {

  private val fmt = classOf[LineProtocolSource].getName

  private def line(typeTag: String, id: Long, value: Double, ns: Long) =
    s"transactions,type_tag=$typeTag event_id=${id}i,value=$value $ns\n"

  /** One AvailableNow drain of the connector into a parquet sink. */
  private def drain(in: Path, out: String, ckpt: String,
      typeTag: Option[String] = None): Unit = {
    val src = spark.readStream.format(fmt).load(in.toString)
    val filtered = typeTag.fold(src)(t => src.filter(col("type_tag") === t))
    val q = filtered.writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("offset log + restart: exactly-once, partial lines invisible until newline") {
    val in = Files.createTempDirectory("lp_stream_in")
    val out = Files.createTempDirectory("lp_stream_out").toString + "/data"
    val ckpt = Files.createTempDirectory("lp_stream_ckpt").toString

    // batch 1: two complete records plus a producer-in-flight partial line
    // (no trailing newline) — the partial must NOT be consumed yet.
    val f1 = in.resolve("part-0.lp")
    Files.writeString(f1,
      line("error", 1, 10.0, 1700000000000000000L) +
        line("click", 2, 20.0, 1700000001000000000L) +
        "transactions,type_tag=click event_id=3i") // no newline, no fields yet
    drain(in, out, ckpt)
    val got1 = spark.read.parquet(out)
    assert(got1.count() == 2, "partial trailing line must be invisible")
    assert(got1.select("event_id").as[Long](spark.implicits.newLongEncoder)
      .collect().toSet == Set(1L, 2L))

    // batch 2: the producer finishes record 3 (same file grows past the
    // committed offset) and a second file lands.
    Files.writeString(f1, ",value=30.0 1700000002000000000\n",
      StandardOpenOption.APPEND)
    Files.writeString(in.resolve("part-1.lp"),
      line("purchase", 4, 40.0, 1700000003000000000L))
    drain(in, out, ckpt) // restart against the SAME checkpoint
    val got2 = spark.read.parquet(out).cache()
    assert(got2.count() == 4, "restart must resume from committed offsets")
    assert(got2.select("event_id").distinct().count() == 4,
      "no record may be delivered twice")
    assert(got2.filter(col("event_id") === 3)
      .head.getAs[Double]("value") == 30.0,
      "the completed partial line must arrive whole, not split")

    // idle restart: nothing new → no partitions planned, no new rows
    drain(in, out, ckpt)
    assert(spark.read.parquet(out).count() == 4)
  }

  test("streaming filter applies (connector reuses the batch scan builder)") {
    val in = Files.createTempDirectory("lp_stream_f_in")
    val out = Files.createTempDirectory("lp_stream_f_out").toString + "/data"
    val ckpt = Files.createTempDirectory("lp_stream_f_ckpt").toString
    Files.writeString(in.resolve("a.lp"),
      line("error", 1, 1.0, 1700000000000000000L) +
        line("click", 2, 2.0, 1700000001000000000L) +
        line("error", 3, 3.0, 1700000002000000000L) +
        "garbage line that does not parse\n")
    drain(in, out, ckpt, typeTag = Some("error"))
    val got = spark.read.parquet(out)
    assert(got.count() == 2)
    assert(got.select("type_tag").distinct().head.getString(0) == "error")
  }

  test("data loss: fails loudly by default, skips with failOnDataLoss=false") {
    // Kafka-parity contract: a file deleted after its offsets were
    // committed (expired segment) must kill the query unless the user
    // opts out, in which case the lost range is skipped and the stream
    // continues with the surviving files.
    val in = Files.createTempDirectory("lp_loss_in")
    val ckpt1 = Files.createTempDirectory("lp_loss_ckpt1").toString
    val out1 = Files.createTempDirectory("lp_loss_out1").toString + "/data"
    Files.writeString(in.resolve("old.lp"), line("error", 1, 1.0, 1700000000000000000L))
    Files.writeString(in.resolve("new.lp"), line("click", 2, 2.0, 1700000001000000000L))
    drain(in, out1, ckpt1)
    assert(spark.read.parquet(out1).count() == 2)

    // the "retention" event: old.lp disappears, a new record lands
    Files.delete(in.resolve("old.lp"))
    Files.writeString(in.resolve("new.lp"),
      line("purchase", 3, 3.0, 1700000002000000000L), StandardOpenOption.APPEND)

    val failed = intercept[Exception] { drain(in, out1, ckpt1) }
    def rootChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(rootChain(failed).exists(_.contains("data loss")),
      s"default mode must name the loss; got: ${rootChain(failed)}")

    // opt out: same checkpoint, loss skipped, new record still delivered
    val src = spark.readStream.format(fmt)
      .option("failOnDataLoss", "false").load(in.toString)
    val q = src.writeStream.format("parquet").option("path", out1)
      .option("checkpointLocation", ckpt1).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val ids = spark.read.parquet(out1)
      .select("event_id").as[Long](spark.implicits.newLongEncoder)
      .collect().toSet
    assert(ids == Set(1L, 2L, 3L),
      "lost range skipped, surviving file's new record delivered once")
  }

  test("offset round-trips through JSON with escaped paths") {
    val off = LpStreamOffset(Map(
      "/tmp/plain/part-0.lp" -> 123L,
      "/tmp/we\"ird\\dir/part-1.lp" -> 0L))
    assert(LpStreamOffset.fromJson(off.json()) == off)
    assert(!off.json().contains("\n"), "offset log stores one line per batch")
  }

  test("committedLength is the position after the last newline") {
    val d = Files.createTempDirectory("lp_commit")
    val f = d.resolve("x.lp")
    Files.writeString(f, "abc\ndef")
    assert(LpStreamOffset.committedLength(f.toString) == 4L)
    Files.writeString(f, "ghi\n", StandardOpenOption.APPEND)
    assert(LpStreamOffset.committedLength(f.toString) == 11L)
    val empty = d.resolve("empty.lp")
    Files.writeString(empty, "no newline at all")
    assert(LpStreamOffset.committedLength(empty.toString) == 0L)
  }
}
