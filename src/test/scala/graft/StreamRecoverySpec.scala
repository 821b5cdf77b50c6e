package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamPipeline
import java.nio.file.Files

/** Checkpointed restart semantics (the reference CONFIGURES checkpointing,
  * `streaming_config.yaml:84-86`, but never wires it — SURVEY.md §2.9; a
  * production stream must survive restarts exactly-once): a file-source →
  * parquet-sink query is stopped and restarted against the same checkpoint;
  * the second run must pick up only the new file, with no duplicates and no
  * loss.
  */
class StreamRecoverySpec extends AnyFunSuite with SparkTestSession {

  private def jsonEvent(id: Long, typ: String, value: Double, ts: String) =
    s"""{"event_id":$id,"user_id":${id % 7},"event_type":"$typ",""" +
      s""""value":$value,"ts":"$ts"}"""

  test("parquet sink + checkpoint: restart resumes exactly-once") {
    val in = Files.createTempDirectory("rec_in")
    val out = Files.createTempDirectory("rec_out").toString + "/data"
    val ckpt = Files.createTempDirectory("rec_ckpt").toString

    def runOnce(): Unit = {
      val derived = StreamPipeline.derive(StreamPipeline.parse(
        StreamPipeline.fileSource(spark, in.toString)))
        .select("event_id", "type_tag", "value_cents")
      val q = derived.writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    Files.writeString(in.resolve("batch1.json"),
      jsonEvent(1, "error", 1.0, "2024-01-01T10:00:00Z") + "\n" +
        jsonEvent(2, "click", 2.0, "2024-01-01T10:01:00Z") + "\n")
    runOnce()
    assert(spark.read.parquet(out).count() == 2)

    Files.writeString(in.resolve("batch2.json"),
      jsonEvent(3, "purchase", 3.0, "2024-01-01T10:02:00Z") + "\n")
    runOnce() // restart from the SAME checkpoint
    val rows = spark.read.parquet(out).cache()
    assert(rows.count() == 3, "restart must not re-emit batch1")
    assert(rows.select("event_id").distinct().count() == 3)
    assert(rows.filter(col("event_id") === 3)
      .head.getAs[String]("type_tag") == "money")
  }
}
