package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** State-backend evidence at size (round-5 verdict item 7): the same
  * stateful dedup carrying ~1 KiB per state row runs against the default
  * HDFS-backed provider and RocksDB, and the GC-settled heap growth is
  * compared. The HDFS-backed store keeps every loaded version map ON HEAP
  * (measured ~1.3 KB/row), so streaming state is capped by executor heap —
  * a 100 M-session pipeline at 1 KiB/session (~100 GB state) cannot fit a
  * 16 GB executor. RocksDB keeps state in native memtables + SST files
  * (measured ~15 B/row of heap — an ~87× margin), so state scales with
  * DISK, the resource that actually grows with a 100 TB workload. Numbers
  * recorded in SCALE.md ("streaming state backend at size").
  */
class StateBackendSpec extends AnyFunSuite with SparkTestSession {

  private def usedHeap(): Long = {
    (1 to 5).foreach { _ => System.gc(); Thread.sleep(50) }
    val r = Runtime.getRuntime
    r.totalMemory() - r.freeMemory()
  }

  /** Run the 1-KiB-per-row streaming dedup with `n` distinct keys and
    * return the GC-settled heap growth across the state load.
    */
  private def heapGrowth(provider: String, n: Int): Long = {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    withStateProvider(provider) {
      val ms = MemoryStream[Long]
      val payload = "x" * 1024
      val dedup = ms.toDF()
        .select(col("value").as("k"),
          concat(lit(payload), col("value")).as("p"))
        .dropDuplicates("k", "p")
      val q = dedup.writeStream.format("noop").outputMode("append").start()
      try {
        ms.addData(Seq(-1L)) // materialize query + stores before baseline
        q.processAllAvailable()
        val h0 = usedHeap()
        var i = 0L
        while (i < n) {
          ms.addData(i until math.min(i + 25000, n))
          q.processAllAvailable()
          i += 25000
        }
        assert(q.lastProgress.stateOperators(0).numRowsTotal == n + 1L)
        usedHeap() - h0
      } finally q.stop()
    }
  }

  test("100k x 1KiB state rows: RocksDB stays off-heap where the HDFS store heap-resides them") {
    val n = 100000 // ~103 MB of raw state
    val hdfs = heapGrowth("org.apache.spark.sql.execution.streaming." +
      "state.HDFSBackedStateStoreProvider", n)
    val rocks = heapGrowth(RocksDbProvider, n)
    info(f"heap growth: hdfs=${hdfs / 1048576}%d MB (${hdfs.toDouble / n}%.0f B/row), " +
      f"rocksdb=${rocks / 1048576}%d MB (${rocks.toDouble / n}%.0f B/row)")
    // RELATIVE contract only (measured 2 MB vs 254 MB at 200k rows —
    // ~87×): absolute byte thresholds depend on heap size, GC algorithm,
    // and System.gc() honoring, so they flake across runners — the claim
    // that matters is that the HDFS-backed provider heap-resides state
    // where RocksDB does not, i.e. the RATIO, plus a loose per-row floor
    // on the HDFS side (raw state is ~1 KiB/row; 300 B/row tolerates
    // heavy GC noise while still proving heap residency)
    assert(hdfs > 300L * n,
      s"HDFS-backed state should be heap-resident (~1 KiB/row), " +
        s"grew only ${hdfs.toDouble / n} B/row")
    assert(rocks < hdfs / 4,
      s"RocksDB heap growth $rocks should be far under HDFS-backed $hdfs")
  }
}
