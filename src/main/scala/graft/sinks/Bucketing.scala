package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Det

/** Bucketed tables — the storage-level answer to repeated large-×-large
  * joins (SURVEY.md scale goals: "bucketing for co-located joins").
  *
  * Writing both sides bucketed (+ sorted) by the join key lets Spark plan a
  * SortMergeJoin with NO Exchange and NO Sort on either side: at 100 TB the
  * shuffle is the dominant cost of a fact-fact join, and bucketing pays it
  * ONCE at write time instead of per query. `PlanSpec`-style assertions live
  * in `BucketingSpec` — the joined plan must contain zero shuffle exchanges.
  *
  * Bucket count trades small-file overhead against per-task memory; pick
  * ~(largest table size / target partition size) and keep it a multiple of
  * executor cores. Both sides MUST agree on count and key.
  */
object Bucketing {
  val Buckets = 8

  /** Write a frame bucketed + in-bucket sorted by `key` into the session
    * catalog (Parquet files + bucket metadata; the catalog carries the
    * bucket spec that makes reads shuffle-free).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = Buckets): Unit = {
    val s = df.sparkSession
    // the in-memory catalog forgets tables across sessions but the warehouse
    // directory survives — drop both so a re-stage never hits
    // LOCATION_ALREADY_EXISTS
    s.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete(); ()
      }
      rm(loc)
    }
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Stage lineitem + orders bucketed by order key, then join WITHOUT a
    * shuffle: revenue + quantity per order priority.
    */
  def bucketedOrderJoin(s: SparkSession, dir: String): DataFrame = {
    writeBucketed(Tables.lineitem(s, dir)
      .select("l_orderkey", "l_quantity", "l_extendedprice"),
      "graft_lineitem_b", "l_orderkey")
    writeBucketed(Tables.orders(s, dir)
      .select("o_orderkey", "o_orderpriority"),
      "graft_orders_b", "o_orderkey")
    joinStaged(s)
  }

  /** The join over already-staged bucketed tables (no re-write). */
  def joinStaged(s: SparkSession): DataFrame =
    s.table("graft_lineitem_b")
      .join(s.table("graft_orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        Det.r(Det.dsum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy("o_orderpriority")

  /** b01 — registered query: the staged bucketed join, oracle-checked
    * against the plain-join SQL (bucketing changes the PLAN, not the rows).
    */
  def b01BucketedJoin(s: SparkSession, dir: String): DataFrame =
    bucketedOrderJoin(s, dir)

  private val b01Sql =
    s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
       |  ${Det.sqlR(Det.sqlDsum("l_extendedprice"), 2)} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b01_bucketed_join" -> (b01BucketedJoin _))

  val oracles: Map[String, String] = Map(
    "b01_bucketed_join" -> b01Sql)
}
