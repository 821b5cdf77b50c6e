package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CorpusStream

/** Streaming training-corpus pipeline: quality gate, fingerprint dedup
  * within the watermark, and mapGroupsWithState running profiles that
  * accumulate ACROSS micro-batches.
  */
class CorpusStreamSpec extends AnyFunSuite with SparkTestSession {

  private def doc(id: Long, text: String, source: String, ts: String) =
    s"""{"doc_id":$id,"text":"$text","source":"$source","ts":"$ts"}"""

  test("quality gate + fingerprint dedup + cross-batch stateful profiles") {
    implicit val s = spark
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[String]
    val profiles = CorpusStream.pipeline(ms.toDF().select(col("value")))
    val q = profiles.toDF().writeStream.format("memory").queryName("prof_t")
      .outputMode(CorpusStream.ProfileOutputMode).start()

    // batch 1: one good doc, one duplicate of it, one too-short doc
    ms.addData(
      doc(1, "alpha beta gamma delta epsilon", "crawl", "2024-01-01T10:00:00Z"),
      doc(2, "alpha beta gamma delta epsilon", "crawl", "2024-01-01T10:00:30Z"),
      doc(3, "tiny", "crawl", "2024-01-01T10:01:00Z"))
    q.processAllAvailable()
    val after1 = spark.table("prof_t")
      .orderBy(col("docs").desc).collect()
    assert(after1.exists(r => r.getString(0) == "crawl" && r.getLong(1) == 1L),
      s"dup + short doc must be gated: ${after1.mkString(",")}")

    // batch 2: a new doc for the same source and one for a new source —
    // the crawl profile must ACCUMULATE (state survives the batch boundary)
    ms.addData(
      doc(4, "zeta eta theta iota kappa lambda", "crawl", "2024-01-01T10:02:00Z"),
      doc(5, "mu nu xi omicron pi rho sigma", "books", "2024-01-01T10:02:30Z"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("prof_t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val crawlFinal = rows.filter(_._1 == "crawl").maxBy(_._2)
    assert(crawlFinal._2 == 2L, s"crawl profile must reach 2 docs: ${rows.mkString(",")}")
    assert(crawlFinal._3 == 11L, s"token total 5+6: $crawlFinal")
    assert(rows.exists(r => r._1 == "books" && r._2 == 1L))
  }

  test("transformWithState profiles match the mapGroupsWithState operator") {
    implicit val s = spark
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[String]
      val profiles = CorpusStream.sourceProfilesV2(
        CorpusStream.dedupByFingerprint(CorpusStream.qualityGate(
          CorpusStream.parseDocs(ms.toDF().select(col("value"))))))
      val q = profiles.toDF().writeStream.format("memory")
        .queryName("prof_v2")
        .outputMode(CorpusStream.ProfileOutputMode).start()
      ms.addData(
        doc(1, "alpha beta gamma delta epsilon", "crawl", "2024-01-01T10:00:00Z"),
        doc(2, "alpha beta gamma delta epsilon", "crawl", "2024-01-01T10:00:30Z"))
      q.processAllAvailable()
      ms.addData(
        doc(4, "zeta eta theta iota kappa lambda", "crawl", "2024-01-01T10:02:00Z"),
        doc(5, "mu nu xi omicron pi rho sigma", "books", "2024-01-01T10:02:30Z"))
      q.processAllAvailable(); q.stop()
      val rows = spark.table("prof_v2").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      // same accumulation contract as the V1 operator's spec: crawl
      // reaches 2 docs / 11 tokens across batches, books 1 doc
      val crawlFinal = rows.filter(_._1 == "crawl").maxBy(_._2)
      assert(crawlFinal._2 == 2L && crawlFinal._3 == 11L,
        s"v2 state must accumulate: ${rows.mkString(",")}")
      assert(rows.exists(r => r._1 == "books" && r._2 == 1L))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming drift histogram equals the batch bins, state stays bounded") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Double]
    val amounts = ms.toDF().select(col("value").as("amount"))
    val q = graft.streaming.DriftStream.amountBins(amounts)
      .writeStream.format("memory").queryName("drift_t")
      .outputMode("complete").start()
    val batch1 = Seq(1013.70, 25000.0, 25000.5, 499978.59)
    val batch2 = Seq(9999.99, 10000.0, 250000.0, 25000.0)
    ms.addData(batch1)
    q.processAllAvailable()
    ms.addData(batch2)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("drift_t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch histogram over the SAME rows, via the SAME bin definition
    val batch = graft.streaming.DriftStream.amountBins(
        (batch1 ++ batch2).toDF("amount"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(streamed.values.sum == (batch1 ++ batch2).size)
    // the state key domain is the BIN space, not the data: ~50 bins max
    // for the [0, 500k] amount domain at 10k-dollar width
    assert(streamed.size <= 51)
  }

  test("streaming CMS accumulates across batches and equals the batch sketch") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[String]
    val docs = ms.toDF().select(col("value").as("text"))
    val q = CorpusStream.cmsCells(docs)
      .writeStream.format("memory").queryName("cms_t")
      .outputMode(CorpusStream.CmsOutputMode).start()
    ms.addData("alpha beta alpha", "gamma beta")
    q.processAllAvailable()
    ms.addData("alpha gamma gamma delta")
    q.processAllAvailable(); q.stop()
    // update mode re-emits changed cells; latest value per cell is the state
    val streamed = spark.table("cms_t")
      .groupBy("j", "b").agg(max("cnt").as("cnt"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    // batch-built sketch over the SAME corpus must be cell-identical
    val batch = CorpusStream.cmsCells(
        Seq("alpha beta alpha", "gamma beta", "alpha gamma gamma delta")
          .toDF("text"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(streamed == batch,
      s"stream/batch cell drift: ${streamed.toSet.diff(batch.toSet).take(5)}")
    // fixed-size state: never more than d*w cells
    assert(streamed.size <= graft.operators.TextOps.CmsDepth
      * graft.operators.TextOps.CmsWidth)
    // probe contract: min-over-rows estimate never underestimates a token
    val exact = Map("alpha" -> 3L, "beta" -> 2L, "gamma" -> 3L, "delta" -> 1L)
    exact.foreach { case (w, c) =>
      val est = (0 until graft.operators.TextOps.CmsDepth).map { j =>
        val probe = Seq(w).toDF("text")
        // reuse the shared bucket spelling via a 1-row frame
        val cell = CorpusStream.cmsCells(probe)
          .filter(col("j") === j).head()
        streamed((cell.getInt(0), cell.getLong(1)))
      }.min
      assert(est >= c, s"CMS underestimates $w: $est < $c")
    }
  }
}
