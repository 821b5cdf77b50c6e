package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Corpus
import graft.streaming.KmvStream

/** Streaming KMV corpus sketch: the finalized per-source sketches, folded
  * through the SHARED pair-estimate stage, must equal the batch c15b
  * estimate table bit-for-bit — including when the corpus arrives in
  * adversarial (reversed) order across many micro-batches, the
  * arrival-order-independence the keep-smallest SET fold guarantees.
  */
class KmvStreamSpec extends AnyFunSuite with SparkTestSession {

  /** Feed (source, text) docs through the sketch accumulator in `splits`
    * micro-batches and return the finalized snapshot table.
    */
  private def streamSketches(rows: Seq[(String, String)], name: String,
      splits: Int): org.apache.spark.sql.DataFrame = {
    implicit val s = spark
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    withStateProvider(RocksDbProvider) {
      val ms = MemoryStream[(String, String)]
      val out = KmvStream.sketches(ms.toDF().toDF("source", "text"))
      val q = out.toDF().writeStream.format("memory")
        .queryName(name).outputMode("update").start()
      try {
        val n = math.max(1, rows.length / splits)
        rows.grouped(n).foreach { b =>
          ms.addData(b)
          q.processAllAvailable()
        }
      } finally q.stop()
      KmvStream.latest(spark.table(name))
    }
  }

  private def docs(dir: String): Seq[(String, String)] =
    Tables.documents(spark, dir)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  test("stream sketches == batch c15b estimates, reversed arrival order (sf0.001)") {
    // reversed + many splits: an arrival-order-dependent fold would keep
    // different hashes; the keep-smallest SET fold must not care
    val rows = docs(Sf).sortBy(_._2).reverse
    val latest = streamSketches(rows, "kmv_stream_t", splits = 5)

    // structural state bound + snapshot invariants
    latest.collect().foreach { r =>
      val m = r.getInt(1)
      val values = r.getSeq[Long](3)
      assert(m <= KmvStream.K && values.length == m)
      assert(r.getLong(2) == values.max, "vk must be the sketch maximum")
      assert(values.distinct.length == m, "sketch holds DISTINCT hashes")
    }

    val got = KmvStream.overlapEstimates(latest).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5))).toSeq
    val want = Corpus.c15bCorpusOverlapKmv(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5))).toSeq
    assert(want.nonEmpty)
    assert(got == want, "stream-accumulated sketches must reproduce the " +
      "batch estimate table bit-for-bit")
  }

  test("binding k in adversarial order: descending hashes still keep the smallest") {
    // one source, k+40 distinct single-shingle docs arriving in an order
    // that maximizes evictions (largest hash first): the final sketch must
    // be the k smallest hashes regardless
    implicit val s = spark
    import s.implicits._
    val texts = (0 until KmvStream.K + 40).map(i => s"tok$i a$i b$i")
    // one job: hash every text (each is exactly one 3-gram shingle),
    // keyed by the text itself so we can order arrivals by hash
    val hashOf = KmvStream.arrivals(
        texts.map(t => (t, t)).toDF("source", "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byHash = hashOf.values.toSeq.distinct.sorted
    val descending = texts.sortBy(t => -hashOf(t))
    val latest = streamSketches(descending.map(("src", _)), "kmv_adv_t",
      splits = 6)
    val sketch = latest.collect().head.getSeq[Long](3).sorted
    assert(sketch == byHash.take(KmvStream.K).toSeq)
  }
}
