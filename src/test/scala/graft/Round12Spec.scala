package graft

import graft.graph.FacadeQueries
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 pins: the capped façade arms (gf03b/gf05b) — the same
  * GraphFrames calls over the fan-out-capped constructor — agree with
  * their uncapped siblings wherever the cap does not bind (sf0.001: the
  * co-occurrence relation is symmetric, so MUTUAL retention keeps every
  * edge, and max degree < FanOut, so the keep-smallest fan-out is a
  * no-op — the g31b == g31 argument applied to the façade).
  */
class Round12Spec extends AnyFunSuite with SparkTestSession {

  test("gf03b == gf03 where no cap binds (sf0.001)") {
    val a = FacadeQueries.queries("gf03_facade_motif")(spark, Sf)
    val b = FacadeQueries.queries("gf03b_facade_motif_capped")(spark, Sf)
    assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty)
  }

  test("gf05b == gf05 where no cap binds (sf0.001)") {
    val a = FacadeQueries.queries("gf05_facade_triangles")(spark, Sf)
    val b = FacadeQueries.queries("gf05b_facade_triangles_capped")(spark, Sf)
    assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty)
  }

  /** d13's defining property: the incremental decision (band join's new
    * side shrunk to the increment) equals the FULL d12 run read at the
    * increment — i.e. a daily ingest never needs the old×old quadrant.
    */
  private def checkIncrementalEqualsFull(dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val full = operators.Dedup.d12ArrivalDedup(spark, dir)
    val cutoff = Tables.documents(spark, dir)
      .agg(expr("max(doc_id) * 9 div 10")).head().getLong(0)
    val restricted = full.filter(col("doc_id") >= cutoff)
    val incr = operators.Dedup.queries(
      "d13_incremental_arrival_dedup")(spark, dir)
    assert(incr.exceptAll(restricted).isEmpty
      && restricted.exceptAll(incr).isEmpty)
    assert(incr.count() > 0)
  }

  test("d13 == d12 restricted to the increment (sf0.001)") {
    checkIncrementalEqualsFull(Sf)
  }

  test("d13 == d12 restricted to the increment (sf0.01)") {
    checkIncrementalEqualsFull(SfMid)
  }
}
