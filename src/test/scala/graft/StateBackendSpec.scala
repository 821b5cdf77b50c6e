package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** State-backend evidence at size (round-5 verdict item 7): the same
  * stateful dedup carrying ~1 KiB per state row runs against the default
  * HDFS-backed provider and RocksDB. The HDFS-backed store keeps every
  * loaded version map ON HEAP (~1.3 KB/row measured), so streaming state is
  * capped by executor heap — a 100 M-session pipeline at 1 KiB/session
  * (~100 GB state) cannot fit a 16 GB executor. RocksDB keeps state in
  * native memtables + SST files, so state scales with DISK, the resource
  * that actually grows with a 100 TB workload. Numbers in SCALE.md
  * ("streaming state backend at size").
  *
  * Round-9 rework (round-8 verdict item 1): the old assertions compared raw
  * `Runtime.usedHeap` deltas, which flake — a GC between the two samples
  * once measured a NEGATIVE delta. The claims are now pinned on the state
  * stores' OWN metrics, which are deterministic:
  *   - the HDFS provider's `stateOnCurrentVersionSizeBytes` custom metric
  *     IS a SizeEstimator walk of its on-heap version HashMap — heap
  *     residency by definition, no GC involved;
  *   - the RocksDB provider exposes NO on-heap map metric at all (state
  *     never lives in java objects); its `memoryUsedBytes` is native
  *     memtable/block-cache memory and `rocksdbTotalBytesWritten` proves
  *     the rows flowed through native storage.
  * Heap deltas are still printed via info() for the SCALE.md narrative, but
  * nothing asserts on them.
  */
class StateBackendSpec extends AnyFunSuite with SparkTestSession {

  private def usedHeap(): Long = {
    (1 to 5).foreach { _ => System.gc(); Thread.sleep(50) }
    val r = Runtime.getRuntime
    r.totalMemory() - r.freeMemory()
  }

  /** Run the 1-KiB-per-row streaming dedup with `n` distinct keys; return
    * (stateOperator memoryUsedBytes, customMetrics, informational heap delta).
    */
  private def stateFootprint(
      provider: String, n: Int): (Long, Map[String, Long], Long) = {
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
        val op = q.lastProgress.stateOperators(0)
        assert(op.numRowsTotal == n + 1L)
        import scala.jdk.CollectionConverters._
        val custom = op.customMetrics.asScala.toMap.map {
          case (k, v) => k -> v.longValue()
        }
        (op.memoryUsedBytes, custom, usedHeap() - h0)
      } finally q.stop()
    }
  }

  test("100k x 1KiB state rows: RocksDB stays off-heap where the HDFS store heap-resides them") {
    val n = 100000 // ~103 MB of raw state
    val (hdfsMem, hdfsCustom, hdfsHeap) = stateFootprint(
      "org.apache.spark.sql.execution.streaming." +
        "state.HDFSBackedStateStoreProvider", n)
    val (rocksMem, rocksCustom, rocksHeap) = stateFootprint(RocksDbProvider, n)
    info(f"hdfs: memoryUsedBytes=${hdfsMem / 1048576}%d MB, " +
      f"stateOnCurrentVersionSizeBytes=${hdfsCustom.getOrElse("stateOnCurrentVersionSizeBytes", -1L) / 1048576}%d MB, " +
      f"heap-delta(informational)=${hdfsHeap / 1048576}%d MB")
    info(f"rocksdb: memoryUsedBytes(native)=${rocksMem / 1048576}%d MB, " +
      f"totalBytesWritten=${rocksCustom.getOrElse("rocksdbTotalBytesWritten", -1L) / 1048576}%d MB, " +
      f"sstFileSize=${rocksCustom.getOrElse("rocksdbSstFileSize", -1L) / 1048576}%d MB, " +
      f"heap-delta(informational)=${rocksHeap / 1048576}%d MB")
    // HDFS-backed provider: its own metric measures the on-heap version map
    // (SizeEstimator over java objects). Raw state is ~1 KiB/row; 300 B/row
    // floor proves heap residency with ample headroom for layout variance.
    val onHeap = hdfsCustom.getOrElse("stateOnCurrentVersionSizeBytes", 0L)
    assert(onHeap > 300L * n,
      s"HDFS-backed state should be heap-resident (~1 KiB/row), " +
        s"provider reports only ${onHeap.toDouble / n} B/row on heap")
    // RocksDB: no on-heap state structure exists, so the provider exposes
    // no heap-map metric at all — the structural form of "off-heap".
    assert(!rocksCustom.contains("stateOnCurrentVersionSizeBytes"),
      "RocksDB provider should have no on-heap version-map metric")
    // ...and the rows demonstrably flowed through native storage. The
    // custom metrics cover the LAST micro-batch (25k rows), not the
    // cumulative run: puts are counted per row and the write volume covers
    // the ~1 KiB payloads of that batch.
    val lastBatch = 25000L
    assert(rocksCustom.getOrElse("rocksdbPutCount", 0L) >= lastBatch,
      s"expected >= $lastBatch native puts in the final micro-batch, " +
        s"got ${rocksCustom.get("rocksdbPutCount")}")
    assert(rocksCustom.getOrElse("rocksdbTotalBytesWritten", 0L) > 100L * lastBatch,
      "expected >= 100 B/row written into native storage, got " +
        s"${rocksCustom.get("rocksdbTotalBytesWritten")}")
  }
}
