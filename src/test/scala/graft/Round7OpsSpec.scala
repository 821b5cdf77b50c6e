package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-7 operators: g20b capped clustering coefficient (g22's fan-out
  * discipline applied to g20's metric) and its subgraph-consistency
  * contract against the uncapped spelling.
  */
class Round7OpsSpec extends AnyFunSuite with SparkTestSession {

  test("g20b == g20 where the caps do not bind (sf0.001: max bucket 3, max degree 9)") {
    // below both caps the fan-out keep-all makes mutual symmetrization a
    // no-op, so the capped spelling must reproduce g20 bit-for-bit
    val g20 = graph.NeighborAgg.g20ClusteringCoeff(spark, Sf)
    val g20b = graph.NeighborAgg.g20bCappedClusteringCoeff(spark, Sf)
    assert(g20b.exceptAll(g20).isEmpty && g20.exceptAll(g20b).isEmpty)
  }

  test("g20b is a subgraph of g20: per-node degree and triangles never exceed the uncapped values") {
    // the caps only REMOVE edges, so every g20b node must appear in g20
    // with degree_b <= min(degree, FanOut) and n_triangles_b <= n_triangles
    // — the property that makes the capped metric a sound lower-bound
    // screen at scale (sf0.01: the bucket cap binds on storm hours)
    val g20 = graph.NeighborAgg.g20ClusteringCoeff(spark, SfMid)
      .select(col("id"), col("degree").as("deg_full"),
        col("n_triangles").as("tri_full"))
    val g20b = graph.NeighborAgg.g20bCappedClusteringCoeff(spark, SfMid)
    val joined = g20b.join(g20, Seq("id"), "left").cache()
    assert(joined.filter(col("deg_full").isNull).isEmpty,
      "g20b node missing from g20")
    val violations = joined.filter(
      col("degree") > col("deg_full")
        || col("degree") > graph.NeighborAgg.FanOut
        || col("n_triangles") > col("tri_full"))
    assert(violations.isEmpty, violations.collect().mkString("; "))
    // and the caps must actually bind at this SF — otherwise the test
    // degenerates to the equality case above
    assert(joined.filter(col("degree") < col("deg_full")).count() > 0,
      "caps did not bind at sf0.01 — widen the fixture")
    joined.unpersist()
  }

  test("d10b sampled banding metrics sit within the stated envelope of full d10 (sf0.01)") {
    // the sampled grader must (a) find a non-degenerate pair population
    // and (b) estimate the full-corpus banding curve: recall/precision are
    // per-pair ratios, so a fixed 256-doc sample (~26% of pairs at this
    // 500-doc SF) stays within ±0.25 of the full values — the operator's
    // fitness-for-purpose claim (pick LSH params from the sample) in one
    // assertion
    def metrics(df: org.apache.spark.sql.DataFrame) = {
      val row = df.head()
      (row.getLong(row.fieldIndex("n_true")),
        row.getDouble(row.fieldIndex("cand_recall")),
        row.getDouble(row.fieldIndex("cand_precision")))
    }
    val (nFull, rFull, pFull) =
      metrics(operators.Dedup.d10LshEvaluation(spark, SfMid))
    val (nSamp, rSamp, pSamp) =
      metrics(operators.Dedup.d10bLshEvaluationSampled(spark, SfMid))
    assert(nSamp > 0, "sample found no true pairs — sampling too aggressive")
    assert(nSamp < nFull, "sample did not shrink the ground truth")
    assert(math.abs(rSamp - rFull) <= 0.25,
      s"recall $rSamp vs full $rFull")
    assert(math.abs(pSamp - pFull) <= 0.25,
      s"precision $pSamp vs full $pFull")
  }

  test("d10b's sample is fixed-SIZE: exactly SampleK docs whenever the corpus exceeds it") {
    // the round-8 contract: grader cost is corpus-independent because the
    // bottom-k-by-hash sample is a COUNT, not a rate — 256 docs out of
    // 500 here, 256 out of 50k at sf1, 256 out of a 100 TB crawl
    assert(operators.Dedup.sampledDocs(spark, SfMid).count()
      == operators.Dedup.SampleK)
    // and deterministic: two evaluations pick the identical doc set
    val a = operators.Dedup.sampledDocs(spark, SfMid).select("doc_id")
    val b = operators.Dedup.sampledDocs(spark, SfMid).select("doc_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // a smaller k is honored too (parameterized for production tuning)
    assert(operators.Dedup.sampledDocs(spark, SfMid, 32).count() == 32)
  }

  test("mm04b member cap loses nothing on a 70-replica verbatim flood") {
    // 70 > BucketMemberCap (64), so the cap BINDS — yet every replica's
    // bucket retains the global-minimum doc_id and hamming(x,x)=0, so the
    // capped decision must equal the uncapped one on the whole flood
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "pack my box with five dozen liquor jugs before noon today",
      "how vexingly quick daft zebras jump over fences at dawn")
    val flood = for {
      (t, ti) <- texts.zipWithIndex
      r <- 0 until 70
    } yield operators.MediaRow(ti * 1000L + r, "image",
      t.getBytes("UTF-8"), 64, 64, 0)
    val media = flood.toDF()
    val hashes = operators.Multimodal.phashFrame(spark, media).cache()
    val capped = operators.Multimodal.mm04bOn(hashes)
    val uncapped = operators.Multimodal.uncappedDecisionOn(hashes)
    assert(capped.exceptAll(uncapped).isEmpty
      && uncapped.exceptAll(capped).isEmpty)
    // and the decision is the right one: exactly one keeper per text
    assert(capped.filter(col("is_kept")).count() == texts.size)
  }

  test("c13 fused pipeline == stage-by-stage run with parquet barriers between stages") {
    // the composed single-materialization plan must equal the same stages
    // run as separate jobs with a real storage barrier after each — the
    // property that lets an operator either run fused nightly or restart
    // from any intermediate without changing the output
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("c13_stages").toString
    def barrier(df: org.apache.spark.sql.DataFrame, name: String) = {
      df.write.mode("overwrite").parquet(s"$tmp/$name")
      spark.read.parquet(s"$tmp/$name")
    }
    val gated = barrier(operators.Corpus.c13Gate(spark, SfMid), "gated")
    val canon = barrier(operators.Corpus.c13Canon(gated), "canon")
    val assigned = barrier(operators.Corpus.c13Assign(spark, canon), "assigned")
    val staged = operators.Corpus.c13Pack(assigned)
    val fused = operators.Corpus.c13CorpusJob(spark, SfMid)
    assert(fused.exceptAll(staged).isEmpty && staged.exceptAll(fused).isEmpty)
  }

  test("c13 split is leakage-safe: no verified near-dup pair straddles a split") {
    val assigned = operators.Corpus.c13Assign(spark,
      operators.Corpus.c13Canon(operators.Corpus.c13Gate(spark, SfMid)))
      .cache()
    // recompute the pair set the assignment was built from and check both
    // members always landed in the same split (the c09 guarantee, here
    // certified on the composed job's own universe)
    val canon = operators.Corpus.c13Canon(
      operators.Corpus.c13Gate(spark, SfMid))
    val shingled = canon
      .select(col("doc_id"), operators.TextFn.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        explode(operators.TextFn.shingles3(col("t"))).as("s"))
    val pairs = operators.Dedup.verifiedPairsOn(
      operators.Dedup.capShingles(shingled))
    val sa = assigned.select(col("doc_id").as("id_a"), col("split").as("split_a"))
    val sb = assigned.select(col("doc_id").as("id_b"), col("split").as("split_b"))
    val straddlers = pairs.join(sa, "id_a").join(sb, "id_b")
      .filter(col("split_a") =!= col("split_b"))
    assert(straddlers.isEmpty, straddlers.collect().mkString("; "))
    // non-degenerate: pairs exist and more than one split is populated
    assert(pairs.count() > 0 && assigned.select("split").distinct().count() == 3)
    assigned.unpersist()
  }

  test("c13 stages survive degenerate corpora: identical texts, short docs, empty gate") {
    import spark.implicits._
    // all-identical corpus: one canonical survivor, empty pair graph
    // (GraphX CC on zero edges), one split, one packed row
    val same = Seq((1L, "srcA", "alpha beta gamma delta", 4L),
      (2L, "srcA", "alpha beta gamma delta", 4L),
      (3L, "srcA", "alpha beta gamma delta", 4L))
      .toDF("doc_id", "source", "text", "n_tokens")
    val canonSame = operators.Corpus.c13Canon(same)
    assert(canonSame.count() == 1 && canonSame.head().getLong(0) == 1L)
    val packedSame = operators.Corpus.c13Pack(
      operators.Corpus.c13Assign(spark, canonSame))
    assert(packedSame.count() == 1)
    // sub-3-token doc: no shingles -> singleton cluster, still assigned
    // a split and packed (the gate keeps it; shingling must not drop it)
    val short = Seq((7L, "srcB", "tiny doc", 2L))
      .toDF("doc_id", "source", "text", "n_tokens")
    val assignedShort = operators.Corpus.c13Assign(spark, short).collect()
    assert(assignedShort.length == 1
      && assignedShort(0).getLong(assignedShort(0).fieldIndex("cluster_id")) == 7L)
    // empty canonical corpus: empty manifest, no NPE anywhere in the chain
    val empty = Seq.empty[(Long, String, String, Long)]
      .toDF("doc_id", "source", "text", "n_tokens")
    assert(operators.Corpus.c13Pack(
      operators.Corpus.c13Assign(spark, empty)).isEmpty)
  }

  test("d12 id-dependence contract: keep-decision flip rate bounded at a 10x verbatim scale-up") {
    // the sf1 certification documented 24/50,000 (0.048%) keep-decision
    // flips between the dictionary-id oracle chain and the xxhash-id
    // production chain — the id-dependence category d06's scaladoc pins.
    // This reproduces the same shape in CI (sf0.001 replicated 10x with
    // make_sf1.py's key-stride scheme) and asserts the rate stays under
    // 1% — a band-membership regression would blow through that by
    // orders of magnitude, failing here instead of hiding in prose.
    val stride = 1000000000L
    val base = Tables.documents(spark, Sf).select("doc_id", "text")
    val scaled = (0 until 10)
      .map(i => base.select((col("doc_id") + lit(i * stride)).as("doc_id"),
        col("text")))
      .reduce(_ unionAll _)
      .cache()
    val dict = operators.Dedup
      .arrivalDecisionOn(spark, scaled, dictionaryIds = true)
      .select(col("doc_id"), col("is_kept").as("kept_dict"))
    val xx = operators.Dedup
      .arrivalDecisionOn(spark, scaled, dictionaryIds = false)
      .select(col("doc_id"), col("is_kept").as("kept_xx"))
    val joined = dict.join(xx, "doc_id").cache()
    val n = joined.count()
    val flips = joined.filter(col("kept_dict") =!= col("kept_xx")).count()
    val rate = flips.toDouble / n
    info(s"flip rate: $flips / $n = $rate")
    assert(n == base.count() * 10)
    // non-degenerate: the scale-up must actually create dup decisions
    assert(joined.join(
      operators.Dedup.arrivalDecisionOn(spark, scaled, dictionaryIds = false)
        .filter(!col("is_kept")).select("doc_id"), "doc_id").count() > 0)
    assert(rate <= 0.01, s"flip rate $rate exceeds the 1% contract")
    joined.unpersist(); scaled.unpersist()
  }
}
