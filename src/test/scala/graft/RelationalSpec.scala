package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

class RelationalSpec extends AnyFunSuite with SparkTestSession {

  test("q01 bins are total and mutually exclusive (counts sum to input)") {
    val total = Tables.lineitem(spark, Sf).count()
    val binned = Relational.q01PriceHistogram2d(spark, Sf)
      .agg(sum(col("cnt"))).head.getLong(0)
    assert(binned === total)
  }

  test("q02 class counts sum to input rows") {
    val total = Tables.lineitem(spark, Sf).count()
    val sumCnt = Relational.q02ClassDistribution(spark, Sf)
      .agg(sum(col("cnt"))).head.getLong(0)
    assert(sumCnt === total)
  }

  test("q04 null audit: testdata has zero nulls in every lineitem column") {
    val row = Relational.q04NullAudit(spark, Sf).head
    (0 until row.length).foreach(i => assert(row.getLong(i) === 0L))
  }

  test("q05 conditional agg consistent with direct filter count") {
    val expected = Tables.lineitem(spark, Sf)
      .filter(col("l_returnflag") === "R").count()
    val got = Relational.q05ConditionalAgg(spark, Sf)
      .head.getAs[Long]("fraud_rows")
    assert(got === expected)
  }

  test("q06 top-k is sorted descending and bounded") {
    val prices = Relational.q06TopFraudAmounts(spark, Sf)
      .collect().map(_.getAs[Double]("l_extendedprice"))
    assert(prices.length <= 10)
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("q08 SQL path and q01 DSL path agree on bin counts") {
    val sqlCnt = Relational.q08SqlCaseGroupBy(spark, Sf)
      .select(col("price_bin"), col("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dslCnt = Relational.q01PriceHistogram2d(spark, Sf)
      .groupBy(col("price_bin")).agg(sum(col("cnt")).as("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sqlCnt === dslCnt)
  }

  test("q11 left join keeps every order exactly once") {
    val orders = Tables.orders(spark, Sf).count()
    val got = Relational.q11LeftJoinCoalesce(spark, Sf)
      .agg(sum(col("n_orders"))).head.getLong(0)
    assert(got === orders)
  }

  test("q12 hourly events: per-hour counts sum to total (within limit)") {
    val hours = Relational.q12HourlyEvents(spark, Sf).collect()
    assert(hours.nonEmpty && hours.length <= 100)
    val epochs = hours.map(_.getAs[Long]("hour_epoch"))
    assert(epochs.sameElements(epochs.sorted))
  }

  test("q14 grafana mart error_pct is a guarded percentage") {
    Relational.q14GrafanaMart(spark, Sf).collect().foreach { r =>
      val pct = r.getAs[Double]("error_pct")
      assert(pct >= 0.0 && pct <= 100.0)
    }
  }

  test("top-k plans as TakeOrderedAndProject, not global sort") {
    val plan = Relational.q06TopFraudAmounts(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("scan projection is pruned to referenced columns") {
    val plan = Relational.q02ClassDistribution(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<l_returnflag:string>"))
  }
}
