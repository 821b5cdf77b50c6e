package graft

import org.apache.spark.sql.Dataset

/** Eager lineage cut for iterative loops and memoized pins.
  *
  * Default is `localCheckpoint(eager = true)`: blocks live on the
  * executors, the fastest cut, and the right trade on a healthy cluster
  * (see PageRankOps doc for the memory story). Its known limit is
  * executor loss — truncated lineage cannot be recomputed if the hosting
  * executor dies.
  *
  * Setting `spark.graft.reliableCheckpointDir` (any shared filesystem
  * path — HDFS/S3A on a real cluster) switches every cut in the library
  * to reliable `checkpoint(eager = true)`: blocks are written to shared
  * storage, so a re-scheduled task on a surviving executor reads them
  * back instead of failing the job. This is the executor-loss switch
  * SCALE.md documents, proven by `FaultDrill` (g06's iterative loop
  * survives a force-killed executor only under this conf).
  */
object Cut {
  def cut[T](ds: Dataset[T]): Dataset[T] = {
    val s = ds.sparkSession
    s.conf.getOption("spark.graft.reliableCheckpointDir") match {
      case Some(dir) =>
        val sc = s.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        ds.checkpoint(true)
      case None => ds.localCheckpoint(true)
    }
  }
}
