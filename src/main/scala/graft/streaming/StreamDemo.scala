package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentLinkedQueue
import scala.util.Random

/** Runnable streaming app mirroring the reference's deployment shape
  * (`streaming/spark_streaming.py` + `kafka_producer.py`): a producer
  * thread emits JSON events at ~1.8 msg/s (seeded 0.1–1.0 s sleeps, like
  * `kafka_producer.py:98`) into a directory standing in for the Kafka
  * topic; TWO concurrent queries — console append + foreachBatch line
  * protocol — consume the same source and the driver parks on
  * `awaitAnyTermination` (`spark_streaming.py:75`).
  *
  * Usage: `sbt "runMain graft.streaming.StreamDemo [seconds]"` (default 12).
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val runSeconds = args.headOption.map(_.toInt).getOrElse(12)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val topic = Files.createTempDirectory("stream_topic")
    val producer = startProducer(topic)

    val derived = StreamPipeline.derive(StreamPipeline.parse(
      StreamPipeline.fileSource(spark, topic.toString)))

    val emitted = new ConcurrentLinkedQueue[Long]()
    val console = StreamPipeline
      .consoleSink(derived, Trigger.ProcessingTime("5 seconds")).start()
    val influx = StreamPipeline.foreachBatchSink(
      derived, _.foreach(line => println(s"[influx] $line")), emitted,
      Trigger.ProcessingTime("5 seconds")).start()

    // the reference parks forever; the demo parks for a bounded window
    spark.streams.awaitAnyTermination(runSeconds * 1000L)
    producer.interrupt()
    console.stop(); influx.stop()
    println(s"[demo] batches=${emitted.size()} files=${topic.toFile.list().length}")
    spark.stop()
  }

  /** Seeded producer thread: one JSON event per file, 0.1–1.0 s apart. */
  private def startProducer(dir: Path): Thread = {
    val t = new Thread(() => {
      val rnd = new Random(42)
      var i = 0L
      try while (!Thread.interrupted()) {
        val typ = rnd.nextInt(10) match {
          case 0 => "error"
          case 1 | 2 => "purchase"
          case _ => "click"
        }
        val json =
          s"""{"event_id":$i,"user_id":${i % 7},"event_type":"$typ",""" +
            s""""value":${rnd.nextInt(10000) / 100.0},""" +
            s""""ts":"2024-01-01T10:00:00Z"}"""
        // ATOMIC placement: the file source may list mid-write — write to
        // a dot-temp (ignored by the source) and rename into place
        val tmp = dir.resolve(f".evt_$i%06d.json.tmp")
        Files.writeString(tmp, json + "\n")
        Files.move(tmp, dir.resolve(f"evt_$i%06d.json"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        i += 1
        Thread.sleep(100 + rnd.nextInt(900))
      } catch { case _: InterruptedException => () }
    }, "demo-producer")
    t.setDaemon(true)
    t.start()
    t
  }
}
