package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Multimodal, Similarity, TextOps}

/** Pathological-input robustness: null text, empty text, single-token docs,
  * unicode, null embeddings, and empty tables must flow through every
  * training-data operator without exceptions — at 100 TB every pathology
  * exists somewhere in the corpus.
  */
class EdgeCaseSpec extends AnyFunSuite with SparkTestSession {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("edge_data").toString
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val docs = Seq(
      Row(0L, null, "en", "s0", 0L), // null text
      Row(1L, "", "en", "s0", 0L), // empty text
      Row(2L, "one", "en", "s1", 3L), // single token (no shingles)
      Row(3L, "two tokens", "en", "s1", 10L), // below shingle width
      Row(4L, "a b c d e f g h", "en", "s2", 15L), // normal
      Row(5L, "a b c d e f g h", "fr", "s2", 15L), // exact duplicate text
      Row(6L, "héllo wörld ünïcode tokens here", "de", "s3", 31L),
      Row(7L, "  leading and trailing  spaces  ", "es", "s3", 32L))
    spark.createDataFrame(spark.sparkContext.parallelize(docs, 2), docSchema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val embs = Seq(
      Row(0L, Seq(1.0f, 0.0f, 0.0f), 0),
      Row(1L, Seq(1.0f, 0.0f, 0.0f), 0), // identical → cosine 1
      Row(2L, null, 1), // null embedding
      Row(3L, Seq(0.0f, 0.0f, 0.0f), 1), // zero vector (norm 0)
      Row(4L, Seq(-1.0f, 0.5f, 0.25f), 2))
    spark.createDataFrame(spark.sparkContext.parallelize(embs, 2), embSchema)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("text ops survive null/empty/unicode text") {
    assert(TextOps.t01TokenStats(spark, dir).count() == 8)
    assert(TextOps.t02LangId(spark, dir).count() == 8)
    assert(TextOps.t03QualityScore(spark, dir).count() == 8)
    val fp = TextOps.t04Fingerprint(spark, dir).collect()
    assert(fp.length == 8)
    // null text → null fingerprint; empty text → fold zero
    assert(fp.find(_.getLong(0) == 0L).exists(_.isNullAt(1)))
    assert(fp.find(_.getLong(0) == 1L).exists(_.getLong(1) == 0L))
    assert(TextOps.t05TokenFreq(spark, dir).count() > 0)
    // repetition rules: null/empty-token docs must land on gopher_pass=false,
    // never null or an exception
    val t06 = TextOps.t06RepetitionRules(spark, dir).collect()
    assert(t06.length == 8)
    assert(t06.filter(r => r.getLong(0) <= 1L).forall(!_.getBoolean(6)))
    TextOps.t07Decontaminate(spark, dir).count() // must not throw
  }

  test("dedup ops: sub-shingle docs drop out, exact dup collapses") {
    // docs 4 and 5 share identical text → one fingerprint group of size 4
    // in d01's doubled corpus
    val d01 = Dedup.d01ExactDedup(spark, dir)
    val copies = d01.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(copies(4L) == 4L, s"dup text must collapse: $copies")
    // shingle-based ops must not throw on docs 0–3 (no shingles possible)
    assert(Dedup.d02NgramJaccardPairs(spark, dir).collect()
      .exists(r => r.getLong(0) == 4L && r.getLong(1) == 5L))
    val d03 = Dedup.d03MinhashLsh(spark, dir).collect()
    assert(d03.exists(r => r.getLong(0) == 4L && r.getLong(1) == 5L
      && r.getDouble(2) == 1.0), "identical docs must LSH-collide at j=1")
    assert(Dedup.d04Simhash(spark, dir).collect()
      .exists(r => r.getLong(0) == 4L && r.getLong(1) == 5L
        && r.getLong(2) == 0L), "identical docs at hamming 0")
    assert(Dedup.d06MinhashXxhashScale(spark, dir).collect()
      .exists(r => r.getLong(0) == 4L && r.getLong(1) == 5L))
  }

  test("similarity ops: null and zero vectors never pair, identical pair at 1.0") {
    val nd = Similarity.d05EmbeddingNeardup(spark, dir).collect()
    assert(nd.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L
      && r.getDouble(2) == 1.0))
    // null embedding (2) and zero vector (3, NaN cosine) must not surface
    // in ANY pair, either side
    val degenerate = Set(2L, 3L)
    assert(!nd.exists(r => degenerate.contains(r.getLong(0))
      || degenerate.contains(r.getLong(1))))
    val topk = Similarity.v01CosineTopk(spark, dir)
    assert(topk.filter(col("cosine").isNull || isnan(col("cosine"))).count() == 0)
    Similarity.v02AnnLsh(spark, dir).count() // must not throw
    // centroid machinery: null/zero vectors are excluded upstream, the
    // 3 surviving vectors must all be assigned exactly once
    assert(Similarity.v03CentroidAssign(spark, dir)
      .agg(sum(col("n"))).head.getLong(0) == 3L)
    Similarity.v04AnnIvf(spark, dir).count() // must not throw
  }

  test("multimodal ops survive null payloads") {
    assert(Multimodal.mm01MediaMeta(spark, dir).count() == 8)
    val feats = Multimodal.mm02MediaFeatures(spark, dir)
    assert(feats.count() == 8)
    // null text → null payload → stub decode must not NPE; byte_len 0 path
    assert(feats.filter(col("byte_len") === 0).count() >= 1)
  }

  test("t13/c06 on pathological text: short words drop, dead sources vanish") {
    val pairs = TextOps.t13BpePairs(spark, dir).collect()
    assert(pairs.nonEmpty)
    // every emitted pair is exactly 2 chars — single-char words contribute
    // nothing, and unicode words pair by character, not byte
    pairs.foreach(r => assert(r.getString(0).length == 2, r.getString(0)))
    val m = pairs.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.get("in").exists(_ >= 2L), s"leading+trailing share in: $m")
    assert(m.get("hé").exists(_ >= 1L), s"unicode pair hé must count: $m")
    // top-k ordering: counts are non-increasing down the listing
    val cnts = pairs.map(_.getLong(1))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    // c06: source s0 holds only null/empty text → zero tokens → it must
    // disappear from the mixture instead of dividing by zero
    val mix = operators.Corpus.c06TemperatureMix(spark, dir).collect()
    assert(mix.nonEmpty && !mix.exists(_.getString(0) == "s0"))
  }

  test("empty tables flow through without exceptions") {
    val d = java.nio.file.Files.createTempDirectory("edge_empty").toString
    Tables.documents(spark, dir).limit(0)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    Tables.embeddings(spark, dir).limit(0)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    assert(TextOps.t01TokenStats(spark, d).count() == 0)
    assert(Dedup.d03MinhashLsh(spark, d).count() == 0)
    assert(Similarity.v01CosineTopk(spark, d).count() == 0)
    assert(Multimodal.mm02MediaFeatures(spark, d).count() == 0)
    assert(operators.LmOps.t10LineDedup(spark, d).count() == 0)
    assert(operators.LmOps.t11LmScore(spark, d).count() == 0)
    assert(operators.LmOps.t12Tfidf(spark, d).count() == 0)
    assert(operators.Corpus.c04SnapshotMerge(spark, d).count() == 0)
    assert(operators.Corpus.c05WeightedSample(spark, d).count() == 0)
    assert(Similarity.v05AnnPq(spark, d).count() == 0)
    assert(TextOps.t13BpePairs(spark, d).count() == 0)
    assert(operators.Corpus.c06TemperatureMix(spark, d).count() == 0)
    assert(Similarity.v06KmeansLloyd(spark, d).count() == 0)
    assert(TextOps.t14CharDiversity(spark, d).count() == 0)
    assert(TextOps.e12HeavyHitters(spark, d).count() == 0)
    assert(operators.Corpus.c07CurriculumShards(spark, d).count() == 0)
    // t15 on an empty corpus: only the rollup row (all-NULL counts) remains
    val t15 = operators.LmOps.t15NoveltyRate(spark, d).collect()
    assert(t15.length == 1 && t15.head.isNullAt(0))
    assert(Similarity.v07AnnIvfPq(spark, d).count() == 0)
  }

  test("centrality/audit family on an EMPTY graph and corpus: defined output, no exceptions") {
    val d = java.nio.file.Files.createTempDirectory("edge_empty_graph").toString
    Tables.events(spark, Sf).limit(0)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    Tables.documents(spark, Sf).limit(0)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    Tables.embeddings(spark, Sf).limit(0)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    // no edges → no vertices → empty curves/rankings, not crashes
    assert(graph.Centrality.g27NeighborhoodFunction(spark, d).count() == 0)
    assert(graph.Centrality.g28LandmarkHarmonic(spark, d).count() == 0)
    assert(graph.Centrality.g29Modularity(spark, d).count() == 0)
    // HyperBall on zero vertices: the per-round global sums have nothing
    // to fold — whatever the row count, no radius may claim a positive
    // ball and nothing may throw (ANSI mode: the avg division must not
    // be reached with nv=0 on a non-null estimate)
    val hb = graph.Centrality.g27bHyperball(spark, d).collect()
    assert(hb.forall(r => r.isNullAt(1) || r.getLong(1) == 0L))
    // audit + miner on empty inputs
    assert(operators.Dedup.c14LeakageAudit(spark, d).count() == 0)
    assert(operators.Similarity.v15HardNegatives(spark, d).count() == 0)
    // round-10 family: iterative peeling/relaxation loops and edge-scan
    // statistics on a graph with no edges — empty, not exceptions (the
    // loops must tolerate empty broadcast sides and empty checkpoints)
    assert(graph.Components.g15bKcoreCapped(spark, d).count() == 0)
    assert(graph.Components.g17bCostDistanceCapped(spark, d).count() == 0)
    assert(graph.CoGraph.g26bCappedDegreeDistribution(spark, d).count() == 0)
    assert(graph.Components.ktrussQ(spark, d).count() == 0)
    assert(graph.Components.g30bKtrussFanout(spark, d).count() == 0)
    // g21 on an empty edge set: the global aggregate emits its single
    // row with n_edges=0 and a NULL correlation (0/0 under ANSI must
    // not throw), in both arms
    val g21b = graph.NeighborAgg.g21bCappedAssortativity(spark, d).collect()
    assert(g21b.length == 1 && g21b.head.getLong(0) == 0L && g21b.head.isNullAt(1))
  }

  test("c12 percentiles skip NULL n_tokens; v13 recall never exceeds 1.0") {
    // doc 0 has NULL text → NULL n_tokens: it must count in n_docs but
    // stay OUT of the token-length histogram (Spark orders NULLS FIRST,
    // DuckDB NULLS LAST — a NULL row would skew the cumsum per engine)
    val en = operators.Corpus.c12CorpusDatasheet(spark, dir).collect()
      .find(_.getString(0) == "en").get
    assert(en.getLong(1) == 5L, "n_docs counts the NULL-text doc")
    // non-null en token lengths are {0, 1, 2, 8} → p50 = 1, p90 = 8
    assert(en.getLong(6) == 1L && en.getLong(7) == 8L, en.toString)
    // recall denominator is the per-query ground-truth row count, so even
    // on this 5-vector corpus (fewer than k valid neighbors) recall ≤ 1.0
    val rec = Similarity.v13AnnRecall(spark, dir).collect()
    rec.foreach(r => assert(r.getDouble(2) <= 1.0 + 1e-9, r.toString))
  }

  test("round-4 doc ops survive null/empty/unicode text") {
    // pathological 8-doc fixture (null text, empty text, unicode, dup)
    val t14 = TextOps.t14CharDiversity(spark, dir).collect()
    assert(t14.length == 8)
    // null text → split yields no chars → metrics null-safe, n_chars 0 or null
    t14.filter(r => !r.isNullAt(3)).foreach { r =>
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0 + 1e-9)
    }
    val hh = TextOps.e12HeavyHitters(spark, dir).collect()
    assert(hh.nonEmpty) // tiny corpus: everything above 1% share
    val cur = operators.Corpus.c07CurriculumShards(spark, dir).collect()
    assert(cur.map(_.getLong(2)).sum == 8L, "every doc lands in one cell")
  }
}
