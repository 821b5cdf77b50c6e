package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew-mitigation operators — the 100 TB patterns for hot keys (SURVEY.md
  * scale goals; the reference never needs them at 285k rows, a 100 TB
  * deployment always does).
  *
  * Both use DETERMINISTIC salts (a hash of the row's unique key, not
  * `rand()`), so results are reproducible run-to-run and oracle-checkable —
  * the salt changes the SHUFFLE layout, never the answer.
  */
object SkewOps {
  private val Salts = 16

  /** k01 — two-phase salted aggregation over a pathologically skewed group
    * key (`l_returnflag`: 3 values → 3 reducers own 100% of the data in the
    * naive plan). Phase 1 groups by (key, salt) — fan-out 16× — phase 2
    * re-aggregates the 48 partial rows. Identical result to the direct
    * groupBy (sums/counts are associative; the decimal carrier keeps the
    * money sum exact and order-free), but no reducer ever sees more than
    * ~1/16th of a hot key.
    *
    * (Spark's map-side partial aggregation already gives this for plain
    * sums; the explicit salt is the pattern for the cases it can't cover —
    * high-cardinality partials, collect_list/distinct-style states, or
    * aggregation pushed through a join as here.)
    */
  def k01SaltedAgg(s: SparkSession, dir: String): DataFrame = {
    val salted = Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_extendedprice"),
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(Salts))
          .as("salt"))
    val partial = salted
      .groupBy("l_returnflag", "salt")
      .agg(count(lit(1)).as("pc"), Det.dsumDec(col("l_extendedprice")).as("ps"))
    partial
      .groupBy("l_returnflag")
      .agg(sum(col("pc")).cast("long").as("cnt"),
        Det.r(sum(col("ps")).cast("double"), 2).as("revenue"))
      .orderBy("l_returnflag")
  }

  private val k01Sql =
    s"""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt,
       |  ${Det.sqlR(Det.sqlDsum("l_extendedprice"), 2)} AS revenue
       |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  /** k02 — salted broadcast-defeating join: fact side tagged with a
    * deterministic salt, dimension side exploded ×16 with every salt value,
    * equi-join on (key, salt). The hot key's rows spread over 16 reducers
    * instead of one. Same rows as the unsalted join — asserted by the
    * oracle, which joins plainly.
    *
    * (When the dim fits in memory `broadcast()` is strictly better — q10
    * does that; salting is for when BOTH sides are too large to broadcast
    * and one key dominates. AQE's skew-join split handles moderate skew
    * automatically; explicit salting is the deterministic, bounded-memory
    * fallback for extreme cases.)
    */
  def k02SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.lineitem(s, dir)
      .select(col("l_returnflag")).distinct()
      .withColumn("flag_label", concat(lit("flag_"), col("l_returnflag")))
    val dimSalted = dim
      .withColumn("salt", explode(sequence(lit(0), lit(Salts - 1))))
    val fact = Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_quantity"),
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(Salts))
          .cast("int").as("salt"))
    fact.join(dimSalted, Seq("l_returnflag", "salt"))
      .groupBy("flag_label")
      .agg(count(lit(1)).as("cnt"),
        Det.r(Det.dsum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy("flag_label")
  }

  private val k02Sql =
    s"""SELECT 'flag_' || l_returnflag AS flag_label,
       |  CAST(count(*) AS BIGINT) AS cnt,
       |  ${Det.sqlR(Det.sqlDsum("l_quantity"), 2)} AS sum_qty
       |FROM lineitem GROUP BY 1 ORDER BY flag_label""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k01_salted_agg" -> (k01SaltedAgg _),
    "k02_salted_join" -> (k02SaltedJoin _))

  val oracles: Map[String, String] = Map(
    "k01_salted_agg" -> k01Sql,
    "k02_salted_join" -> k02Sql)
}
