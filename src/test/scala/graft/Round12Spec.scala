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
}
