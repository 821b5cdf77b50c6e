package graft

import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Union}
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide enforcement of the g30/g20 finding (SCALE.md round 10):
  * Spark does not share subplans across union branches, so a k-way union
  * whose branches repeat a common expensive subplan re-executes it k
  * times — the triangle-count spelling paid exactly this (37 s → 11 s
  * once rewritten as one explode projection). The rule was stated
  * library-wide but enforced only at the two fixed sites; this sweep
  * walks EVERY registered query's optimized logical plan and fails on
  * any Union whose children share a canonicalized subtree containing
  * more than one join. Materialized subplans are exempt by construction:
  * a cut/tracked iterate is a LogicalRDD leaf and a cached relation an
  * InMemoryRelation — neither contains Join nodes, which is precisely
  * why cut-or-explode is the approved spelling.
  */
class UnionLintSpec extends AnyFunSuite with SparkTestSession {

  private def joinCount(p: LogicalPlan): Int =
    p.collect { case j: Join => j }.size

  test("no registered query unions branches sharing a >1-join subplan") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val opt = fn(spark, Sf).queryExecution.optimizedPlan
        val bad = opt.collect { case u: Union => u }.exists { u =>
          val perChild = u.children.map(c =>
            c.collect { case p if joinCount(p) >= 2 => p.canonicalized }
              .toSet)
          perChild.combinations(2).exists {
            case Seq(a, b) => (a intersect b).nonEmpty
            case _ => false
          }
        }
        if (bad) offenders += name
      } catch {
        case e: Throwable =>
          offenders += s"$name (failed to plan: ${e.getMessage})"
      } finally {
        // the sweep BUILDS ~230 queries back to back — release operator
        // caches the way Verify does so the suite doesn't accumulate
        // storage blocks (checkpointed RDDs exempt: truncated lineage)
        Caches.release(spark)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(r => if (!r.isCheckpointed) r.unpersist(false))
      }
    }
    assert(offenders.isEmpty,
      s"union branches re-running a shared multi-join subplan in: " +
        offenders.mkString(", "))
  }
}
