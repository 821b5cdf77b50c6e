package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.{JdbcSink, MartPipeline, ParquetSink}

/** Real JDBC round-trip (SURVEY.md §2.1 S8/S9): the six-table mart pipeline
  * staged through an in-process Derby database (embedded driver ships with
  * Spark) must produce the identical mart as the Parquet staging path —
  * the sink is genuinely interchangeable, not just shape-compatible.
  */
class JdbcSpec extends AnyFunSuite with SparkTestSession {

  test("mart pipeline through embedded Derby equals the Parquet-staged mart") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val jdbc = new JdbcSink(url, "app", "app")
    val viaJdbc = MartPipeline.run(spark, Sf, jdbc)
      .selectExpr("day_epoch", "total_tx", "total_fraud", "total_value",
        "active_hours", "fraud_pct")
    val tmp = java.nio.file.Files.createTempDirectory("mart_jdbc_ref").toString
    val viaParquet = MartPipeline.run(spark, Sf, new ParquetSink(tmp))
    val a = viaJdbc.collect().map(_.toSeq).sortBy(_.head.toString)
    val b = viaParquet.collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.length == b.length && a.length > 0)
    assert(a.sameElements(b),
      s"jdbc=${a.take(2).mkString(";")} parquet=${b.take(2).mkString(";")}")
    // and a direct S9 read-back of a level-1 table
    assert(jdbc.read(spark, "class_distribution").count() == 3)
  }
}
