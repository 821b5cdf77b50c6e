package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.WindowOps
import graft.sinks.MartPipeline

/** Invariant contracts for the warehouse-flavoured operators: the w06
  * time-range feature window and the p02 SCD2 dimension build.
  */
class WarehouseOpsSpec extends AnyFunSuite with SparkTestSession {

  test("writeTo V2 lifecycle: create partitioned, append, overwrite one day") {
    import graft.sinks.CatalogTables
    import spark.implicits._
    val t = "graft_v2_days"
    val day1 = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0))
      .toDF("id", "day", "v")
    val day2 = Seq((3L, "2024-01-02", 30.0)).toDF("id", "day", "v")
    CatalogTables.replaceWith(day1, t, "day")
    CatalogTables.appendTo(day2, t)
    assert(spark.table(t).count() == 3)
    // catalog carries the partitioning: the table is day-partitioned
    val parts = spark.sql(s"SHOW PARTITIONS $t").collect().map(_.getString(0))
    assert(parts.toSet == Set("day=2024-01-01", "day=2024-01-02"), parts.toSeq)
    // backfill day 1 only: day 2 must be untouched (dynamic overwrite)
    val fix = Seq((9L, "2024-01-01", 99.0)).toDF("id", "day", "v")
    CatalogTables.overwriteDay(fix, t)
    val rows = spark.table(t).select("id", "day").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((9L, "2024-01-01"), (3L, "2024-01-02")), rows)
    // partition pruning reaches the file scan when filtering on day
    val pruned = spark.table(t).filter(col("day") === "2024-01-02")
    assert(pruned.count() == 1)
    CatalogTables.dropWithLocation(spark, t)
  }

  test("w06 trailing-hour features match a brute-force recompute per user") {
    val busiest = Tables.events(spark, SfMid)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id")).head().getLong(0)
    val ev = Tables.events(spark, SfMid)
      .filter(col("user_id") === busiest)
      .select(col("event_id"),
        unix_timestamp(col("ts")).as("epoch_s"),
        coalesce(col("value"), lit(0.0)).as("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val got = WindowOps.w06RangeFeatures(spark, SfMid)
      .filter(col("user_id") === busiest)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4)))
      .toMap
    assert(ev.nonEmpty && got.nonEmpty)
    ev.foreach { case (id, t, _) =>
      val inFrame = ev.filter { case (_, t2, _) => t2 >= t - 3600 && t2 <= t }
      val (gotN, gotV) = got(id)
      assert(gotN == inFrame.length, s"event $id count")
      // mirror the operator's decimal-carrier arithmetic: snap each value
      // to 4 dp (lossless for 2-dp inputs), exact sum, back to double
      val want = inFrame.map { case (_, _, v) =>
        BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      assert(gotV == want, s"event $id sum: $gotV != $want")
    }
  }

  test("p02 SCD2 versions tile each user's history with one current row") {
    val rows = MartPipeline.p02Scd2Dimension(spark, SfMid).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (user, vs) =>
      val sorted = vs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to vs.length).toSeq,
        s"user $user versions not contiguous")
      assert(sorted.count(_.getBoolean(5)) == 1,
        s"user $user must have exactly one current version")
      assert(sorted.last.isNullAt(4) && sorted.last.getBoolean(5),
        s"user $user last version must be the open one")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getString(2) != b.getString(2),
            s"user $user consecutive versions with equal attr")
          assert(a.getLong(4) == b.getLong(3),
            s"user $user validity ranges must tile (valid_to = next valid_from)")
        case _ =>
      }
    }
  }
}
