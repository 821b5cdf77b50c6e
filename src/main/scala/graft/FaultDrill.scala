package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Executor-loss recovery drill (SCALE.md evidence): on a 1000-executor
  * cluster, executor death is routine — Spark's contract is that lost
  * shuffle/task state is recomputed from lineage and the job still
  * produces the SAME result. `local[n]` can never exercise this (one JVM,
  * nothing to lose), so this main runs selected queries on a
  * `local-cluster` master, force-kills one executor JVM mid-job, and
  * compares the faulted result against a clean run of the same query in
  * the same session.
  *
  * Usage (via spark-submit from the packaged jar — sbt's layered
  * classloader cannot serialize lambdas for foreign executor JVMs, and a
  * raw `java -cp` + executor extraClassPath launch intermittently fails
  * deserializing cached/RDD plans with duplicate scala-library loaders;
  * `spark.jars` distribution is the reliable shape):
  * {{{
  * SPARK_SCALA_VERSION=2.13 /opt/spark/bin/spark-submit \
  *   --master 'local-cluster[3,4,4096]' --class graft.FaultDrill \
  *   <graft.jar> /root/testdata/sf0.01 q10_join_revenue_per_nation,d03_minhash_lsh
  * }}}
  *
  * Scope: queries whose state is lineage-recomputable. The iterative
  * graph loops use eager `localCheckpoint` (truncated lineage living ON
  * the executors) — surviving executor loss there requires reliable
  * `checkpoint()` to shared storage, the documented switch in SCALE.md;
  * they are deliberately not in the default drill list.
  */
object FaultDrill {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    // SPARK_GRAFT_RELIABLE_CKPT=<shared dir>: flips every Cut.cut in the
    // library from localCheckpoint to reliable checkpoint() — under it the
    // ITERATIVE loops become drillable too, so g06 joins the default list.
    val reliableDir = sys.env.get("SPARK_GRAFT_RELIABLE_CKPT")
    val names: Seq[String] =
      if (args.length > 1) args(1).split(',').toSeq.filter(SparkEntry.queries.contains)
      else Seq("q10_join_revenue_per_nation", "d03_minhash_lsh",
        "e12_heavy_hitters", "w13_grouped_topk", "t12_tfidf",
        "mm04_perceptual_neardup", "g23_scc",
        // round-5 session-3 paths: centroid-cell semantic dedup (cached
        // assignment + within-cell join) and the two-frame as-of window
        "d11_semdedup", "w18_asof_nearest") ++
        (if (reliableDir.isDefined) Seq("g06_pagerank_loop", "g14_label_propagation",
          // round-9 iterative additions: sketch-state HyperBall and the
          // landmark BFS — both Cut-per-round loops whose truncated
          // lineage only survives executor loss under reliable checkpoint
          "g27b_hyperball", "g28_landmark_harmonic",
          // round-10 iterative twins: capped k-core peeling and capped
          // Bellman-Ford — the same Cut-per-round shape
          "g15b_kcore_capped", "g17b_cost_distance_capped",
          // round-10 second wave: k-truss edge peeling, both arms
          "g30_ktruss", "g30b_ktruss_fanout",
          // round-11: hop-bounded Brandes — forward sigma levels and
          // backward delta levels are both Cut-per-round state
          "g31_landmark_betweenness", "g31b_betweenness_fanout",
          // round-11 second wave: hash-walk frontier is Cut-per-step;
          // the skip-gram fold rides the same walk levels — both arms
          // (uncapped g32 and fan-out g32b) drilled, like the g31 pair
          "g32_hash_walks", "g32b_hash_walks_fanout", "g33_skipgram_pairs")
         else Nil)
    val master =
      sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[3,4,4096]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", "12")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    reliableDir.foreach(d =>
      builder.config("spark.graft.reliableCheckpointDir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** Order-free result digest: count + sum of per-row string hashes. */
    def digest(name: String): (Long, Long) = {
      val rows = SparkEntry.queries(name)(spark, sfDir).collect()
      (rows.length.toLong,
        rows.map(r => r.toString.hashCode.toLong).sum)
    }

    def executorPids(): Seq[ProcessHandle] =
      ProcessHandle.allProcesses().iterator().asScala.filter { p =>
        p.info().commandLine().map[Boolean](
          _.contains("CoarseGrainedExecutorBackend")).orElse(false)
      }.toSeq

    val results = names.map { name =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(r => if (!r.isCheckpointed) r.unpersist(false))
      val clean = digest(name)

      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(r => if (!r.isCheckpointed) r.unpersist(false))
      // fire the kill while the job runs: 300 ms in, murder one executor
      val killer = new Thread(() => {
        Thread.sleep(300)
        executorPids().headOption match {
          case Some(p) =>
            System.err.println(s"[drill] $name: killing executor pid ${p.pid()}")
            p.destroyForcibly()
          case None =>
            System.err.println(s"[drill] $name: no executor JVM found to kill")
        }
      })
      killer.start()
      val faulted =
        try digest(name)
        catch { case e: Throwable =>
          System.err.println(s"[drill] $name FAILED after kill: ${e.getMessage}")
          (-1L, 0L)
        }
      killer.join()
      val ok = clean == faulted && clean._1 >= 0
      System.err.println(
        s"[drill] $name clean=$clean faulted=$faulted match=$ok")
      name -> ok
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"fault_drill","survived":${results.count(_._2)},"of":${results.size},"queries":$qs}""")
    spark.stop()
    // worker/executor shutdown can leave non-daemon threads; be decisive
    sys.exit(if (results.forall(_._2)) 0 else 1)
  }
}
