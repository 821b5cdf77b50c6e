package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.Bucketing

/** Bucketed co-located joins: correctness AND the plan property that
  * justifies them — zero shuffle exchanges in the join.
  */
class BucketingSpec extends AnyFunSuite with SparkTestSession {

  test("bucketed join: no Exchange in the plan, same rows as plain join") {
    val bucketed = Bucketing.bucketedOrderJoin(spark, Sf).cache()
    // correctness: identical to the unbucketed join
    val plain = Tables.lineitem(spark, Sf)
      .join(Tables.orders(spark, Sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = bucketed.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == plain)
    // drop the cache or the plan check below would hit the InMemoryRelation
    // (whose physical plan was fixed before the conf changes)
    bucketed.unpersist(blocking = true)
    // plan: the bucketed JOIN itself must not shuffle its inputs — the only
    // allowed exchange is the final 5-group aggregate/sort, which consumes
    // the join output. At sf0.001 AQE rightly broadcasts instead (bucketing
    // is a LARGE×LARGE tool), so disable auto-broadcast to observe the plan
    // a fact-fact join would get.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val plan =
      try {
        val join = Bucketing.joinStaged(spark)
        join.count()
        join.queryExecution.executedPlan.toString()
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, plan.take(1500))
    val joinSubtree = plan.substring(joinIdx)
    assert(!joinSubtree.contains("Exchange hashpartitioning"),
      "bucketed join inputs must not shuffle:\n" + joinSubtree.take(1500))
    assert(plan.contains("SelectedBucketsCount")
      || joinSubtree.contains("Bucketed: true"), joinSubtree.take(1500))
  }
}
