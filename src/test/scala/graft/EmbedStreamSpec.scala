package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.streaming.EmbedStream

/** Streaming embedding near-dup dedup: the stateful bucket-verify
  * operator must reach exactly d05d's batch decision — candidates from
  * LSH-table collision, exact rounded-cosine verify, keep-first, ≤64
  * members per bucket — while seeing the embedding corpus one arrival at
  * a time.
  */
class EmbedStreamSpec extends AnyFunSuite with SparkTestSession {

  private def dim(dir: String): Int =
    Tables.embeddings(spark, dir)
      .agg(max(size(col("embedding")))).head().getInt(0)

  /** Run (vec_id, embedding) rows through the streaming operator in two
    * micro-batches split at the vec_id median (arrival order == vec_id
    * order) and return the collected verdicts.
    */
  private def streamVerdicts(rows: Seq[(Long, Array[Float])], d: Int,
      name: String): Array[(Long, Long, Double)] = {
    implicit val s = spark
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    withStateProvider(RocksDbProvider) {
      val ms = MemoryStream[(Long, Array[Float])]
      val verdicts = EmbedStream.embVerdicts(
        ms.toDF().toDF("vec_id", "embedding"), d)
      val q = verdicts.toDF().writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        val sorted = rows.sortBy(_._1)
        val (b1, b2) = sorted.splitAt(sorted.length / 2)
        ms.addData(b1)
        q.processAllAvailable()
        ms.addData(b2)
        q.processAllAvailable()
      } finally q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
  }

  private def fold(got: Array[(Long, Long, Double)]): Set[(Long, Long, Double)] = {
    import spark.implicits._
    EmbedStream.dupDocs(got.toSeq.toDF("vec_id", "dup_of", "cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("stream decision == batch d05d decision on the real embedding corpus") {
    import spark.implicits._
    val d = dim(SfMid)
    val rows = Tables.embeddings(spark, SfMid)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val got = streamVerdicts(rows, d, "emb_stream_t")
    val streamDups = fold(got)
    val batch = Similarity.d05dArrivalDedup(spark, SfMid).collect()
    val batchDups = batch.filter(!_.getBoolean(1))
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
    // decision set AND owner attribution AND the owner's rounded cosine
    // agree — the streaming operator IS d05d seen one arrival at a time.
    // (28 of sf0.01's 500 vectors are genuine near-dups — the decision
    // path is exercised on real data, not just the synthetic flood.)
    assert(streamDups.nonEmpty, "corpus must contain near-dups")
    assert(streamDups == batchDups,
      s"diff=${(streamDups diff batchDups) ++ (batchDups diff streamDups)}")
    // keeper count agrees too — over the nonzero-norm universe both
    // operators actually see (zero vectors have no cosine and are
    // excluded by withNormOf on BOTH paths)
    val nonZero = rows.count(_._2.exists(_ != 0f))
    assert(nonZero - streamDups.size
      == batch.count(_.getBoolean(1)), "keeper counts disagree")
  }

  test("member cap loses nothing on a streamed 70-replica verbatim flood") {
    // 70 > EmbBucketCap (64): members stop accumulating, yet every later
    // replica still matches the bucket's earliest member — identical
    // vectors bucket identically in every table and cosine(x,x) = 1
    val base = Array.tabulate(16)(i => (math.sin(i + 1) * 10).toFloat)
    val other = Array.tabulate(16)(i => (math.cos(3 * i + 2) * 10).toFloat)
    val flood: Seq[(Long, Array[Float])] =
      (0 until 70).map(r => (1000L + r, base)) ++
        (0 until 70).map(r => (2000L + r, other))
    val got = streamVerdicts(flood, 16, "emb_flood_t")
    val streamDups = fold(got)
    // every replica deduped onto its family's FIRST id with cosine 1.0
    val expected =
      (1 until 70).map(r => (1000L + r, 1000L, 1.0)).toSet ++
        (1 until 70).map(r => (2000L + r, 2000L, 1.0)).toSet
    assert(streamDups == expected,
      s"diff=${(streamDups diff expected) ++ (expected diff streamDups)}")
  }

  test("TTL horizon variant evicts at the horizon: post-horizon replica is re-admitted") {
    // the round-7 eviction contract on the embedding family: a replica
    // arriving AFTER the horizon must NOT match the expired member — it
    // becomes the bucket's new first member — while a same-wave companion
    // still dedups (positive controls both sides of the horizon). Waits
    // derive from the stream's own batch clock (BatchClock), never from
    // wall-clock sleeps scaled off the TTL.
    implicit val s = spark
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val ttl = java.time.Duration.ofSeconds(4)
    val v = Array.tabulate(16)(i => (math.sin(7 * i + 3) * 10).toFloat)
    withStateProvider(RocksDbProvider) {
      val ms = MemoryStream[(Long, Array[Float])]
      val q = EmbedStream.embVerdictsWithin(
          ms.toDF().toDF("vec_id", "embedding"), 16, ttl)
        .toDF().writeStream.format("memory").queryName("emb_ttl_t")
        .outputMode("append").start()
      val clock = new BatchClock(q)
      try {
        // wave 1: vec 1 + companion 2 — the (2 dup_of 1) verdict in the
        // sink proves vec 1 is IN STATE before the horizon wait starts
        ms.addData(Seq(1L -> v, 2L -> v))
        var tries = 0
        while (tries < 150 && spark.table("emb_ttl_t").count() < 1) {
          Thread.sleep(200); tries += 1
        }
        val wave1Rows = spark.table("emb_ttl_t").count()
        clock.awaitClockPast(clock.awaitWriteTs() + ttl.toMillis)
        // wave 2: replica 10 + companion 11
        ms.addData(Seq(10L -> v, 11L -> v))
        tries = 0
        while (tries < 150
            && spark.table("emb_ttl_t").count() <= wave1Rows) {
          Thread.sleep(200); tries += 1
        }
      } finally { clock.close(); q.stop() }
      val got = spark.table("emb_ttl_t").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // 2 dedups vs 1 in-horizon; 10 is re-admitted (1/2 expired);
      // 11 dedups vs 10 — and crucially NOT vs 1
      assert(got == Set(2L -> 1L, 11L -> 10L),
        s"expected {(2,1),(11,10)}, got $got")
    }
  }

  test("stream cosine fold == the batch VecDot round(6) on adversarial floats") {
    import spark.implicits._
    // the processor's Scala fold must be bit-identical to the Column
    // spelling batch d05d uses (VecDot strict left-to-right + round 6)
    val vecs = Seq(
      Array(1.1f, -2.7f, 3.14159f, 0.001f),
      Array(0.9999f, 2.0001f, -3.0f, 7.5f),
      Array(1e-8f, 1e8f, -1e-8f, -1e8f),
      Array(0.1f, 0.2f, 0.3f, 0.4f))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val e0 = Similarity.withNormOf(df)
    val batch = e0.as("x").crossJoin(e0.as("y"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id"), col("y.vec_id"),
        round(org.apache.spark.sql.GraftBridge.column(
          graft.functions.VecDot(
            org.apache.spark.sql.GraftBridge.expression(col("x.embedding")),
            org.apache.spark.sql.GraftBridge.expression(col("y.embedding"))))
          / (col("x.nrm") * col("y.nrm")), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val norms = e0.collect()
      .map(r => r.getLong(0) -> (r.getSeq[Float](1).toArray, r.getDouble(2)))
      .toMap
    batch.foreach { case (a, b, expect) =>
      val (va, na) = norms(a); val (vb, nb) = norms(b)
      val gotC = EmbedStream.cosine6(va, na, vb, nb)
      assert(gotC == expect, s"pair ($a,$b): scala $gotC vs batch $expect")
    }
  }
}
