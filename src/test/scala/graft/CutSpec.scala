package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The lineage-cut switch (`graft.Cut`): default local checkpoint vs the
  * `spark.graft.reliableCheckpointDir` shared-storage mode that
  * FaultDrill proves executor-loss-survivable.
  */
class CutSpec extends AnyFunSuite with SparkTestSession {

  test("default: eager localCheckpoint (no checkpoint dir involved)") {
    spark.conf.unset("spark.graft.reliableCheckpointDir")
    val cut = Cut.cut(spark.range(100).toDF("n"))
    assert(cut.count() == 100)
    // lineage is truncated: the plan is a materialized LogicalRDD scan,
    // not the original Range (df.rdd wraps the checkpointed RDD in a
    // deserializing MapPartitionsRDD, so assert on the plan, not the rdd)
    assert(cut.queryExecution.optimizedPlan.getClass.getSimpleName
      == "LogicalRDD", "cut must be eager and truncate lineage")
  }

  test("reliableCheckpointDir: cut data lands in shared storage") {
    val dir = Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set("spark.graft.reliableCheckpointDir", dir)
    try {
      val cut = Cut.cut(spark.range(1000).toDF("n"))
      assert(cut.count() == 1000)
      assert(cut.queryExecution.optimizedPlan.getClass.getSimpleName
        == "LogicalRDD")
      // reliable checkpoints materialize as files under the configured dir
      def filesUnder(f: java.io.File): Int =
        if (f.isFile) 1 else Option(f.listFiles()).fold(0)(_.map(filesUnder).sum)
      assert(filesUnder(new java.io.File(dir)) > 0,
        "reliable mode must write checkpoint blocks to the shared dir")
      // values survive the cut unchanged
      assert(cut.agg(org.apache.spark.sql.functions.sum("n"))
        .head.getLong(0) == 499500L)
    } finally spark.conf.unset("spark.graft.reliableCheckpointDir")
  }
}
