package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, DriftOps, Similarity, TextOps, WindowOps}
import graft.sinks.MartPipeline

/** Round-5 second-wave additions: w18 nearest as-of, c10 sequence packing,
  * c11 epoch upsampling, f07 Mann–Whitney U, v12 filtered ANN, t20 vocab
  * growth, p06 incremental aggregate maintenance. The oracle gate proves
  * engine equality; these specs pin the SEMANTIC invariants each operator
  * promises (the properties a user would file a bug about).
  */
class Round5cOpsSpec extends AnyFunSuite with SparkTestSession {

  test("w18 picks whichever error is closer, ties going backward") {
    val rows = WindowOps.w18AsofNearest(spark, SfMid)
      .select("event_id", "nearest_dir", "nearest_abs_secs").collect()
    assert(rows.nonEmpty)
    // cross-check against the independent w04/w10 spellings: when both
    // candidates exist, the nearest distance is their minimum; direction
    // 'before' iff backward <= forward
    val back = WindowOps.w04AsofJoin(spark, SfMid)
      .select(col("event_id"), col("secs_since_error")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val fwd = WindowOps.w10AsofForward(spark, SfMid)
      .select(col("event_id"), col("secs_to_error")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      (back(id), fwd(id)) match {
        case (Some(b), Some(f)) =>
          assert(r.getLong(2) == math.min(b, f), s"event $id distance")
          assert(r.getString(1) == (if (b <= f) "before" else "after"),
            s"event $id direction")
        case (Some(b), None) =>
          assert(r.getString(1) == "before" && r.getLong(2) == b)
        case (None, Some(f)) =>
          assert(r.getString(1) == "after" && r.getLong(2) == f)
        case (None, None) =>
          assert(r.isNullAt(1) && r.isNullAt(2))
      }
    }
  }

  test("c10 packing manifest is internally consistent per source") {
    val rows = Corpus.c10SequencePacking(spark, SfMid).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(nDocs, tot, nSeqs, nBoundary) =
        Seq("n_docs", "total_tokens", "n_seqs", "n_boundary_docs")
          .map(c => r.getLong(r.fieldIndex(c)))
      val pad = r.getLong(r.fieldIndex("pad_tokens"))
      assert(nSeqs == (tot + 511) / 512, "n_seqs = ceil(tokens / seqlen)")
      assert(pad == nSeqs * 512 - tot && pad >= 0 && pad < 512)
      assert(nBoundary >= 0 && nBoundary <= nDocs)
    }
    // the testdata's multi-hundred-token docs must actually straddle chunks
    assert(rows.map(r => r.getLong(r.fieldIndex("n_boundary_docs"))).sum > 0)
  }

  test("c11 epochs stay within [1, 4] and replicate token-light sources more") {
    val perSrc = Corpus.c11EpochUpsample(spark, SfMid)
      .groupBy("source")
      .agg(max(col("epoch")).as("reps"),
        first(col("tokens")).as("tok_epoch1"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(perSrc.forall { case (_, reps, _) => reps >= 1 && reps <= 4 })
    assert(perSrc.map(_._2).distinct.length > 1, "upsampling must vary")
    // monotone: a source with strictly more base tokens never gets MORE
    // epochs than a lighter one
    val sorted = perSrc.sortBy(_._3)
    sorted.sliding(2).foreach {
      case Array((_, r1, t1), (_, r2, t2)) if t1 < t2 =>
        assert(r1 >= r2, s"reps must be antitone in tokens ($t1:$r1 vs $t2:$r2)")
      case _ =>
    }
  }

  test("f07 doubled-U identity and sign consistency") {
    val r = DriftOps.f07MannWhitney(spark, SfMid).collect().head
    val n1 = r.getLong(r.fieldIndex("n_ref"))
    val n2 = r.getLong(r.fieldIndex("n_cur"))
    val u1 = r.getDouble(r.fieldIndex("u2_ref"))
    val u2 = r.getDouble(r.fieldIndex("u2_cur"))
    assert(n1 > 0 && n2 > 0)
    // U identity: U1 + U2 = n1*n2 (doubled on both sides) — exact, the
    // arithmetic is integer until the final cast
    assert(u1 + u2 == 2.0 * n1 * n2)
    // the halves are a uniform hash split of one distribution: |z| small
    val z = r.getDouble(r.fieldIndex("z_ref"))
    assert(math.abs(z) < 5.0, s"hash halves should not differ wildly (z=$z)")
  }

  test("v12 respects the metadata filter and never under-fills vs post-filter") {
    val out = Similarity.v12AnnFiltered(spark, SfMid)
    val labels = spark.read.parquet(s"$SfMid/embeddings.parquet")
      .select(col("vec_id"), col("label"))
    // every returned neighbor satisfies the predicate (pre-filtering)
    val bad = out.join(labels, out("neighbor_id") === labels("vec_id"))
      .filter(pmod(col("label"), lit(2)) =!= 0).count()
    assert(bad == 0, "filtered ANN returned a neighbor outside the predicate")
    // every query fills its full top-k (post-filtering would under-fill)
    val perQuery = out.groupBy("query_id").count().collect()
    assert(perQuery.nonEmpty && perQuery.forall(_.getLong(1) == 5))
  }

  test("w19 tolerance: fresh matches agree with w04, stale ones are nulled") {
    val tol = WindowOps.w19AsofTolerance(spark, SfMid)
      .select("event_id", "err_value", "secs_since_error", "matched").collect()
    val back = WindowOps.w04AsofJoin(spark, SfMid)
      .select(col("event_id"), col("last_err_value"), col("secs_since_error"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some((r.getDouble(1), r.getLong(2)))))
      .toMap
    assert(tol.count(_.getBoolean(3)) > 0, "some matches must be fresh")
    assert(tol.count(r => !r.getBoolean(3)) > 0, "some must be stale/absent")
    tol.foreach { r =>
      val id = r.getLong(0)
      back(id) match {
        case Some((v, secs)) if secs <= 21600L =>
          assert(r.getBoolean(3) && r.getDouble(1) == v && r.getLong(2) == secs)
        case _ =>
          assert(!r.getBoolean(3) && r.isNullAt(1) && r.isNullAt(2))
      }
    }
  }

  test("f08 split counts reconcile with direct totals and z is finite") {
    val r = DriftOps.f08TwoProportion(spark, SfMid).collect().head
    val total = spark.read.parquet(s"$SfMid/events.parquet").count()
    val conv = spark.read.parquet(s"$SfMid/events.parquet")
      .filter(col("event_type") === "purchase").count()
    assert(r.getLong(r.fieldIndex("n_ref")) + r.getLong(r.fieldIndex("n_cur"))
      == total)
    assert(r.getLong(r.fieldIndex("x_ref")) + r.getLong(r.fieldIndex("x_cur"))
      == conv)
    val z = r.getDouble(r.fieldIndex("z"))
    assert(!z.isNaN && math.abs(z) < 5.0, s"uniform hash halves (z=$z)")
  }

  test("v13 recall is the true intersection of v01 and v04 top-k") {
    val out = Similarity.v13AnnRecall(spark, SfMid).collect()
    assert(out.length == 10) // one row per query vector
    val exact = Similarity.v01CosineTopk(spark, SfMid)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.v04AnnIvf(spark, SfMid)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { r =>
      val q = r.getLong(r.fieldIndex("query_id"))
      val hits = r.getLong(r.fieldIndex("n_hits"))
      val expected = exact.filter(_._1 == q).intersect(ann.filter(_._1 == q))
      assert(hits == expected.size, s"query $q")
      val rec = r.getDouble(r.fieldIndex("recall_at_k"))
      assert(rec >= 0.0 && rec <= 1.0 && rec == hits / 5.0)
    }
  }

  test("d10 LSH evaluation: golden banding-curve numbers at sf0.01") {
    val r = graft.operators.Dedup.d10LshEvaluation(spark, SfMid).collect().head
    // deterministic data + deterministic permutations → pinned goldens:
    // all 25 true >=0.5-Jaccard pairs collide in a band (recall 1.0 — the
    // r=2 banding is generous at this threshold), 8 of 33 candidates are
    // below-threshold noise the verifier discards
    assert(r.getLong(r.fieldIndex("n_true")) == 25L)
    assert(r.getLong(r.fieldIndex("n_cand")) == 33L)
    assert(r.getLong(r.fieldIndex("n_cand_true")) == 25L)
    assert(r.getDouble(r.fieldIndex("cand_recall")) == 1.0)
    assert(r.getDouble(r.fieldIndex("cand_precision")) == 0.7576)
  }

  test("d11 SemDeDup manifest: kept+dropped reconcile and clusters partition the corpus") {
    val rows = Similarity.d11SemDedup(spark, SfMid).collect()
    assert(rows.length == 10) // one row per centroid cell
    rows.foreach { r =>
      val m = r.getLong(r.fieldIndex("n_members"))
      val d = r.getLong(r.fieldIndex("n_dropped"))
      val k = r.getLong(r.fieldIndex("n_kept"))
      val p = r.getLong(r.fieldIndex("n_dup_pairs"))
      assert(k == m - d && d <= p && d >= 0)
    }
    val total = rows.map(r => r.getLong(r.fieldIndex("n_members"))).sum
    val corpus = spark.read.parquet(s"$SfMid/embeddings.parquet").count()
    assert(total == corpus, "cells must partition every vector")
    assert(rows.map(r => r.getLong(r.fieldIndex("n_dropped"))).sum > 0,
      "the pass must actually drop semantic near-dups on this data")
  }

  test("t21 fuzzy decontamination: flagged counts reconcile and are pinned") {
    val rows = TextOps.t21FuzzyDecontam(spark, SfMid).collect()
    rows.foreach { r =>
      val nTrain = r.getLong(r.fieldIndex("n_train"))
      val nFlag = r.getLong(r.fieldIndex("n_flagged"))
      val maxSh = r.getLong(r.fieldIndex("max_shared_grams"))
      assert(nFlag <= nTrain)
      assert((nFlag > 0) == (maxSh > 0))
    }
    // deterministic corpus → pinned: 14 train docs share an 8-gram window
    // with the 20% eval slice (the planted near-dups leak through)
    assert(rows.map(r => r.getLong(r.fieldIndex("n_flagged"))).sum == 14L)
    val evalDocs = spark.read.parquet(s"$SfMid/documents.parquet")
      .filter(col("doc_id") % 5 === 0).count()
    assert(rows.map(r => r.getLong(r.fieldIndex("n_train"))).sum + evalDocs
      == 500L)
  }

  test("a09 seasonal anomalies: residuals centered per weekday, band respected") {
    val rows = graft.operators.Analytics.a09SeasonalAnomalies(spark, SfMid)
      .collect()
    assert(rows.nonEmpty)
    // per weekday, residuals sum to ~0 (mean-centered; rounding at 4 dp
    // leaves at most 5e-5 per day)
    rows.groupBy(r => r.getLong(r.fieldIndex("iso_dow"))).foreach {
      case (_, days) =>
        val sum = days.map(r => r.getDouble(r.fieldIndex("residual"))).sum
        assert(math.abs(sum) <= 5e-5 * days.length + 1e-6)
    }
    val n = rows.length
    val anomalies = rows.count(r => !r.isNullAt(r.fieldIndex("is_anomaly"))
      && r.getBoolean(r.fieldIndex("is_anomaly")))
    // a 2-sigma band flags a small minority, never none on 2.4k days
    assert(anomalies > 0 && anomalies < n / 10)
  }

  test("w20 drawdown invariants: nonnegative, bounded by peak-minus-final") {
    val rows = WindowOps.w20MaxDrawdown(spark, SfMid).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val peak = r.getLong(r.fieldIndex("peak_cents"))
      val fin = r.getLong(r.fieldIndex("final_cents"))
      val dd = r.getLong(r.fieldIndex("max_drawdown_cents"))
      assert(dd >= 0 && dd >= peak - fin,
        "the max drawdown dominates the peak-to-final fall")
    }
    assert(rows.count(r =>
      r.getLong(r.fieldIndex("max_drawdown_cents")) > 0) > 0)
  }

  test("g25 reciprocity: symmetric count, even, bounded") {
    val r = graft.graph.Scc.g25Reciprocity(spark, SfMid).collect().head
    val nE = r.getLong(r.fieldIndex("n_edges"))
    val nR = r.getLong(r.fieldIndex("n_reciprocal"))
    val nM = r.getLong(r.fieldIndex("n_mutual_pairs"))
    val rec = r.getDouble(r.fieldIndex("reciprocity"))
    assert(nR % 2 == 0 && nM == nR / 2, "reciprocal edges come in pairs")
    assert(nR <= nE && rec >= 0.0 && rec <= 1.0)
  }

  test("t23 lang confusion: shares sum to 1 per declared lang, mass reconciles") {
    val rows = TextOps.t23LangConfusion(spark, SfMid).collect()
    assert(rows.nonEmpty)
    val total = rows.map(r => r.getLong(r.fieldIndex("n"))).sum
    assert(total == spark.read.parquet(s"$SfMid/documents.parquet").count())
    rows.groupBy(r => r.getString(r.fieldIndex("declared_lang"))).foreach {
      case (_, cells) =>
        val sum = cells.map(r => r.getDouble(r.fieldIndex("share"))).sum
        // each share rounds at 4 dp; the row count per declared lang is small
        assert(math.abs(sum - 1.0) < 5e-4 * cells.length + 1e-9)
    }
  }

  test("e22 weighted quantiles: threshold semantics and unweighted degeneracy") {
    val rows = graft.operators.RelationalExt
      .e22WeightedQuantiles(spark, SfMid).collect()
    assert(rows.nonEmpty)
    val li = spark.read.parquet(s"$SfMid/lineitem.parquet")
    rows.foreach { r =>
      val flag = r.getString(r.fieldIndex("flag"))
      val tw = r.getLong(r.fieldIndex("total_units"))
      val p50 = r.getLong(r.fieldIndex("wp50_cents"))
      val p90 = r.getLong(r.fieldIndex("wp90_cents"))
      assert(p50 <= p90)
      // threshold semantics: at least half the UNITS sit at or below wp50
      val below = li.filter(col("l_returnflag") === flag
          && graft.operators.Det.cents(col("l_extendedprice")) <= p50)
        .agg(sum(col("l_quantity").cast("long"))).collect().head.getLong(0)
      assert(2 * below >= tw, s"$flag: $below of $tw units at/below wp50")
      // and strictly fewer than half sit strictly below it (minimality)
      val strictly = li.filter(col("l_returnflag") === flag
          && graft.operators.Det.cents(col("l_extendedprice")) < p50)
        .agg(coalesce(sum(col("l_quantity").cast("long")), lit(0L)))
        .collect().head.getLong(0)
      assert(2 * strictly < tw, s"$flag: wp50 must be minimal")
    }
  }

  test("f09 runs test: run count in range, iid daily revenue not flagged") {
    val r = DriftOps.f09RunsTest(spark, SfMid).collect().head
    val nA = r.getLong(r.fieldIndex("n_above"))
    val nB = r.getLong(r.fieldIndex("n_below"))
    val runs = r.getLong(r.fieldIndex("n_runs"))
    assert(nA > 0 && nB > 0)
    assert(runs >= 2 && runs <= nA + nB, "runs bounded by sequence length")
    val z = r.getDouble(r.fieldIndex("z"))
    assert(math.abs(z) < 5.0, s"iid synthetic days should pass (z=$z)")
  }

  test("g26 degree distribution: survival is a proper decreasing tail") {
    val rows = graft.graph.CoGraph.g26DegreeDistribution(spark, SfMid)
      .collect()
    assert(rows.nonEmpty)
    // vertex mass reconciles with g02's per-vertex degrees
    val nVerts = graft.graph.CoGraph.degrees(spark, SfMid).count()
    assert(rows.map(r => r.getLong(r.fieldIndex("n_vertices"))).sum == nVerts)
    // survival: 1.0 at the minimum degree, antitone in degree, > 0
    val byDeg = rows.sortBy(r => r.getLong(r.fieldIndex("degree")))
    assert(byDeg.head.getDouble(byDeg.head.fieldIndex("survival")) == 1.0)
    byDeg.map(r => r.getDouble(r.fieldIndex("survival"))).toSeq
      .sliding(2).foreach {
        case Seq(a, b) => assert(a >= b && b > 0.0)
        case _ =>
      }
  }

  test("c12 corpus datasheet reconciles with the raw corpus") {
    val rows = Corpus.c12CorpusDatasheet(spark, SfMid).collect()
    val docs = spark.read.parquet(s"$SfMid/documents.parquet")
    assert(rows.map(r => r.getLong(r.fieldIndex("n_docs"))).sum == docs.count())
    assert(rows.map(r => r.getString(r.fieldIndex("lang"))).toSet
      == docs.select("lang").distinct().collect().map(_.getString(0)).toSet)
    rows.foreach { r =>
      val p50 = r.getLong(r.fieldIndex("p50_tokens"))
      val p90 = r.getLong(r.fieldIndex("p90_tokens"))
      val mq = r.getDouble(r.fieldIndex("mean_quality"))
      assert(p50 <= p90 && p50 > 0)
      assert(mq > 0.0 && mq <= 1.0)
      assert(r.getLong(r.fieldIndex("n_dup_docs")) >= 0)
    }
  }

  test("x06 temporal embargo split: ordered, disjoint, gap-complete") {
    val rows = graft.sources.Ingest.x06TemporalEmbargoSplit(spark, SfMid)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet == Set("train", "embargo", "test"),
      "all three bands must be populated on this span")
    val (train, emb, test) = (rows("train"), rows("embargo"), rows("test"))
    // strict temporal order with no overlap: train < embargo < test
    assert(train._4 < emb._3 && emb._4 < test._3)
    // embargo band = days cutoff+1..cutoff+2: spans at most 1 day of range
    assert(emb._4 - emb._3 <= 1L)
    // every event is in exactly one band
    val total = spark.read.parquet(s"$SfMid/events.parquet").count()
    assert(train._1 + emb._1 + test._1 == total)
  }

  test("t20 vocab growth invariants: hapax <= vocab <= tokens") {
    val rows = TextOps.t20VocabGrowth(spark, SfMid).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vocab = r.getLong(r.fieldIndex("vocab"))
      val toks = r.getLong(r.fieldIndex("n_tokens"))
      val hapax = r.getLong(r.fieldIndex("hapax"))
      assert(hapax <= vocab && vocab <= toks && vocab > 0)
    }
  }

  test("p06 merge path == recompute path (IVM correctness) on a second grain") {
    // the oracle already proves (status, month); re-prove on a DIFFERENT
    // grain inside Spark alone: merge by priority, compare to recompute
    val o = spark.read.parquet(s"$SfMid/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority").as("prio"),
        col("o_totalprice"))
    val isDelta = pmod(col("o_orderkey"), lit(10L)) === 7L
    def agg(df: org.apache.spark.sql.DataFrame) = df.groupBy("prio")
      .agg(count(lit(1)).as("n"),
        graft.operators.Det.dsumDec(col("o_totalprice")).as("tot"))
    val merged = agg(o.filter(!isDelta)).as("s")
      .join(agg(o.filter(isDelta)).as("d"), Seq("prio"), "full_outer")
      .select(col("prio"),
        (coalesce(col("s.n"), lit(0L)) + coalesce(col("d.n"), lit(0L))).as("n"),
        (coalesce(col("s.tot"), lit(0).cast(graft.operators.Det.MoneyType))
          + coalesce(col("d.tot"), lit(0).cast(graft.operators.Det.MoneyType)))
          .as("tot"))
    val direct = agg(o)
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
  }

  test("p06 registered query returns the full month range") {
    val rows = MartPipeline.p06IncrementalAgg(spark, SfMid).collect()
    assert(rows.length > 10)
    assert(rows.forall(r => r.getLong(r.fieldIndex("n_orders")) > 0))
  }
}
