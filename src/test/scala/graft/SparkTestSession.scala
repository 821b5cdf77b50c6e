package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (getOrCreate singleton). */
trait SparkTestSession {
  val Sf: String = "/root/testdata/sf0.001"
  val SfMid: String = "/root/testdata/sf0.01"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
