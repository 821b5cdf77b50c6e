package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{JaroWinklerAlgo, StringFunctions}
import graft.operators.{Dedup, DriftOps, Similarity, TextOps}

/** Round-5 additions: the JaroWinkler codegen expression + r02 linkage,
  * f06 χ² drift, t19 overlapping retrieval chunks, v10 two-stage re-rank.
  */
class Round5bOpsSpec extends AnyFunSuite with SparkTestSession {

  private def jw(a: String, b: String): Double =
    JaroWinklerAlgo.jw(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro_winkler kernel matches the DuckDB-pinned probe set bit-exact") {
    // expected values are DuckDB 1.0's jaro_winkler_similarity outputs,
    // captured verbatim (the full 30k-pair fuzz ran at build time; this
    // pins the corners: transposition floor-halving, the STRICT >0.7
    // boost threshold, the 4-byte prefix cap, byte-level UTF-8, empties)
    val pinned = Seq(
      ("martha", "marhta") -> 0.9611111111111111,
      ("dixon", "dicksonx") -> 0.8133333333333332,
      ("jellyfish", "smellyfish") -> 0.8962962962962964,
      ("DWAYNE", "DUANE") -> 0.8400000000000001,
      ("TRATE", "TRACE") -> 0.9066666666666667,
      ("aaaa", "aaaaaa") -> 0.9333333333333333,
      ("prefix", "prefixxxxx") -> 0.92,
      ("abQQQQQQ", "abZZZZZZ") -> 0.5, // jaro ≤ 0.7 → NO prefix boost
      ("abcdXYZ", "abcdQRS") -> 0.8285714285714286, // > 0.7 → boosted
      ("longprefixsame", "longprefixdiff") -> 0.8857142857142858, // cap 4
      ("abcdef", "bcadef") -> 0.9444444444444445, // 3 mismatches → t = 1
      ("日本語", "日本誤") -> 0.9555555555555556, // bytes, not codepoints
      ("abc", "abc") -> 1.0,
      ("", "abc") -> 0.0,
      ("", "") -> 0.0,
      ("a", "b") -> 0.0,
      ("ab", "ba") -> 0.0) // window 0: no cross-position matches
    pinned.foreach { case ((a, b), expect) =>
      assert(jw(a, b) == expect, s"jw($a, $b)")
      assert(jw(b, a) == expect, s"jw($b, $a) (symmetry)")
    }
  }

  test("jaro_winkler expression: codegen path == kernel, null-safe, SQL-registered") {
    import spark.implicits._
    StringFunctions.register(spark)
    val rows = Seq(("martha", "marhta"), ("dixon", "dicksonx"), ("", ""),
      ("日本語", "日本誤"), ("abcdef", "bcadef"))
    val df = rows.toDF("a", "b")
    // through the DataFrame (whole-stage codegen) and the SQL registry
    val viaCol = df.select(StringFunctions.jaroWinkler(col("a"), col("b")))
      .as[Double].collect()
    val viaSql = df.selectExpr("jaro_winkler(a, b)").as[Double].collect()
    val direct = rows.map { case (a, b) => jw(a, b) }
    assert(viaCol.toSeq == direct && viaSql.toSeq == direct)
    // null input → null out (BinaryExpression default null intolerance)
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .selectExpr("jaro_winkler(a, b)").collect()
    assert(n.head.isNullAt(0))
  }

  test("r02 pairs are canonical, blocked, and threshold-bounded") {
    val rows = Dedup.r02JaroLinkage(spark, SfMid).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1) < r.getString(2), "canonical name order")
      assert(r.getDouble(3) >= Dedup.JaroT && r.getDouble(3) <= 1.0)
      assert(jw(r.getString(1), r.getString(2)) >= Dedup.JaroT - 5e-5,
        "snapped similarity consistent with the kernel")
    }
  }

  test("f06 per-bin terms sum to the textbook two-row chi-square") {
    val rows = DriftOps.f06Chi2Drift(spark, SfMid).collect()
    assert(rows.nonEmpty)
    val cntR = rows.map(_.getLong(2).toDouble)
    val cntC = rows.map(_.getLong(3).toDouble)
    val (nR, nC) = (cntR.sum, cntC.sum)
    val n = nR + nC
    val textbook = rows.indices.map { i =>
      val rowtot = cntR(i) + cntC(i)
      val eR = rowtot * nR / n
      val eC = rowtot * nC / n
      (cntR(i) - eR) * (cntR(i) - eR) / eR +
        (cntC(i) - eC) * (cntC(i) - eC) / eC
    }.sum
    val terms = rows.map(_.getDouble(4)).sum
    // each of ≤ ~50 terms is snapped at 8 dp → total within 5e-7·bins
    assert(math.abs(terms - textbook) < 1e-5,
      s"sum of terms $terms vs textbook $textbook")
    // same bin set as f01 (shared bin definition is the comparability
    // contract with the streaming monitor)
    val f01Bins = DriftOps.f01TvdDrift(spark, SfMid)
      .select("bin").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet == f01Bins)
  }

  test("t19 chunks tile every doc: cover [1, n], bounded width, exact overlap") {
    val n = Tables.documents(spark, SfMid)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("nt"))
    val byDoc = TextOps.t19ChunkOverlap(spark, SfMid).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (_, chunks) =>
      assert(chunks.head.getLong(2) == 1L, "first chunk starts at token 1")
      chunks.foreach { c =>
        assert(c.getLong(3) - c.getLong(2) + 1 == c.getLong(4))
        assert(c.getLong(4) >= 1L && c.getLong(4) <= 50L)
      }
      chunks.sliding(2).foreach {
        case Array(p, c) =>
          assert(c.getLong(2) == p.getLong(2) + 40L, "stride 40")
          assert(c.getLong(2) <= p.getLong(3) + 1, "no gap")
          val overlap = math.max(0L,
            math.min(c.getLong(3), p.getLong(3)) - c.getLong(2) + 1)
          assert(c.getLong(5) == overlap, "overlap_prev exact")
        case _ => ()
      }
      // the last chunk reaches the end of the doc, and only the last:
      // every non-final chunk is full-width (window 50)
      chunks.init.foreach(c => assert(c.getLong(4) == 50L))
    }
    // chunk count per doc = ceil(max(0, n-50)/40) + 1
    val counts = byDoc.view.mapValues(_.length.toLong).toMap
    n.collect().foreach { r =>
      val nt = r.getLong(1)
      if (nt > 0)
        assert(counts(r.getLong(0)) == (math.max(0, nt - 50) + 39) / 40 + 1)
    }
  }

  test("w16 native session_window: disjoint, gap-padded, w05-refining") {
    val w16 = operators.WindowOps.w16SessionWindow(spark, SfMid).collect()
    assert(w16.nonEmpty)
    val nEvents = Tables.events(spark, SfMid).count()
    assert(w16.map(_.getLong(3)).sum == nEvents, "every event in one session")
    w16.groupBy(_.getLong(0)).values.foreach { ss =>
      val sorted = ss.sortBy(_.getLong(1))
      sorted.foreach(r =>
        assert(r.getLong(2) - r.getLong(1) >= 1800000000L,
          "end >= start + gap (window end is the eviction horizon)"))
      sorted.sliding(2).foreach {
        case Array(p, c) =>
          assert(c.getLong(1) >= p.getLong(2),
            "sessions of one user never overlap")
        case _ => ()
      }
    }
    // the native operator splits on gap == 30:00 exactly (w05's manual
    // spelling keeps it), so it can only REFINE w05's sessions per user
    val w05Counts = operators.WindowOps.w05Sessionize(spark, SfMid)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w16Counts = w16.groupBy(_.getLong(0)).view.mapValues(_.length.toLong)
    w16Counts.foreach { case (u, n) => assert(n >= w05Counts(u)) }
  }

  test("mm04 phash is resolution-independent and pairs are radius-bounded") {
    import operators.Multimodal
    // dHash's defining property: stretching the payload (each byte
    // repeated k times — a "higher-resolution" rendering of the same
    // media) scales every proportional block sum by k and so flips no
    // gradient bit. EXACT when block boundaries align (len divisible by
    // the block count — real dHash guarantees this by resampling to a
    // fixed grid); misaligned lengths redistribute only boundary bytes.
    val base = "the quick brown fox jumps over the lazy dog 048!".getBytes
    assert(base.length % 16 == 0)
    def row(p: Array[Byte]) =
      operators.MediaRow(1L, "image", p, 64, 64, 0)
    val h0 = Multimodal.phashStub(row(base))._2
    Seq(2, 3, 7).foreach { k =>
      val stretched = base.flatMap(b => Array.fill(k)(b))
      assert(Multimodal.phashStub(row(stretched))._2 == h0, s"stretch $k")
    }
    val pairs = Multimodal.mm04PerceptualNeardup(spark, SfMid).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "canonical id order")
      assert(r.getLong(2) <= Multimodal.PhRadius)
    }
  }

  test("g23 SCC labels == brute-force mutual reachability on the chain graph") {
    val edges = graph.Scc.chainEdges(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    // Floyd–Warshall reachability on the sf0.001 chain graph (15 verts)
    val idx = verts.zipWithIndex.toMap
    val n = verts.length
    val reach = Array.fill(n, n)(false)
    edges.foreach { case (a, b) => reach(idx(a))(idx(b)) = true }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
    val expected = verts.map { v =>
      val i = idx(v)
      val mutual = verts.filter(u =>
        u == v || (reach(i)(idx(u)) && reach(idx(u))(i)))
      v -> mutual.min
    }.toMap
    val got = graph.Scc.q(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    assert(got.length == n)
    got.foreach { case (v, (scc, size)) =>
      assert(scc == expected(v), s"vertex $v")
      assert(size == expected.values.count(_ == scc))
    }
    // the sf0.001 graph has genuine directed structure: many singleton
    // SCCs plus at least one nontrivial ring — NOT one giant component
    val sccs = expected.values.toSeq.distinct
    assert(sccs.length > 1 && got.map(_._2._2).max >= 2)
  }

  test("x04 bootstrap replicates center on the true total, sd is sane") {
    val rows = sources.Ingest.x04PoissonBootstrap(spark, SfMid).collect()
    assert(rows.length == 32)
    val trueTotal = Tables.orders(spark, SfMid)
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")))
      .head().getLong(0).toDouble / 100.0
    val totals = rows.map(_.getDouble(1))
    val (mean, sd) = (rows.head.getDouble(2), rows.head.getDouble(3))
    assert(sd > 0.0)
    // Poisson(1) weights are mean-1: the bootstrap mean sits within a few
    // standard errors of the point estimate (sd here IS the se of the
    // total), and every replicate within ~6
    assert(math.abs(mean - trueTotal) < 4 * sd / math.sqrt(32.0) * 5,
      s"mean $mean vs true $trueTotal (sd $sd)")
    totals.foreach(t => assert(math.abs(t - trueTotal) < 8 * sd))
    // mean/sd columns are constant across rows and consistent with the
    // replicate column to the 4-dp snap
    assert(rows.forall(r => r.getDouble(2) == mean && r.getDouble(3) == sd))
    val m2 = totals.sum / 32
    assert(math.abs(m2 - mean) < 1e-3)
    // deterministic: a second evaluation is identical
    val again = sources.Ingest.x04PoissonBootstrap(spark, SfMid).collect()
    assert(again.map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq)
  }

  test("p05 CDC apply: max(struct) aggregate == row_number window spelling") {
    import org.apache.spark.sql.expressions.Window
    val got = sinks.MartPipeline.p05CdcApply(spark, SfMid)
    // the textbook spelling, computed independently here
    val w = Window.partitionBy("user_id")
      .orderBy(col("us").desc, col("event_id").desc)
    val expected = Tables.events(spark, SfMid)
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U"))
          .as("op"),
        coalesce(col("value"), lit(0.0)).as("value"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1 && col("op") =!= "D")
      .select(col("user_id"), col("us").as("changed_us"),
        col("event_id").as("change_id"), col("value"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // deletes really delete: users absent from the state table are
    // exactly those whose latest change is an error row
    val nUsers = Tables.events(spark, SfMid)
      .select("user_id").distinct().count()
    assert(got.count() < nUsers, "some users must end deleted")
    // and the plan is the aggregate, not a window sort
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert("HashAggregate|SortAggregate|ObjectHashAggregate".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("w17 bucketed interval join == naive overlap join, and never BNLJ") {
    val got = operators.WindowOps.w17IntervalOverlapJoin(spark, SfMid)
    // independent naive spelling (the quadratic reference, fine at test SF)
    val sess = Tables.events(spark, SfMid)
      .filter(col("event_type") === "error")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(min(unix_micros(col("ts").cast("timestamp"))).as("s_us"),
        max(unix_micros(col("ts").cast("timestamp"))).as("e_us"))
      .select("user_id", "s_us", "e_us")
    val naive = sess.as("a").join(sess.as("b"),
        col("a.user_id") < col("b.user_id")
          && col("a.s_us") <= col("b.e_us")
          && col("b.s_us") <= col("a.e_us"))
      .select(col("a.user_id").as("user_a"), col("b.user_id").as("user_b"),
        col("a.s_us").as("start_a_us"), col("b.s_us").as("start_b_us"),
        (least(col("a.e_us"), col("b.e_us"))
          - greatest(col("a.s_us"), col("b.s_us"))).as("overlap_us"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    got.collect().foreach(r => assert(r.getLong(4) >= 0L))
    // the production plan is the grid equi-join, never a nested loop
    val p = got.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin")
      && !p.contains("CartesianProduct"), p)
  }

  test("v11 matryoshka: exact final cosines, recall floor, prefix stage honest") {
    val v01 = Similarity.v01CosineTopk(spark, SfMid).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val v11 = Similarity.v11MatryoshkaRerank(spark, SfMid).collect()
    assert(v11.nonEmpty)
    v11.foreach { r =>
      v01.get((r.getLong(0), r.getLong(2)))
        .foreach(exact => assert(r.getDouble(3) == exact))
      // prefix cosine is a genuine cosine: bounded
      assert(r.getDouble(4) >= -1.0 - 1e-9 && r.getDouble(4) <= 1.0 + 1e-9)
    }
    val hits = v11.count(r => v01.contains((r.getLong(0), r.getLong(2))))
    assert(hits.toDouble / v01.size >= 0.35,
      s"matryoshka recall@5 ${hits.toDouble / v01.size}")
  }

  test("g24 ping-pong == naive temporal self-join, window honored") {
    val got = graph.Scc.g24PingPong(spark, SfMid)
    val inst = graph.Scc.chainInstances(spark, SfMid)
    val naive = inst.as("e1").join(inst.as("e2"),
        col("e1.dst") === col("e2.src") && col("e1.src") === col("e2.dst")
          && col("e2.t_us") > col("e1.t_us")
          && col("e2.t_us") <= col("e1.t_us") + 21600000000L)
      .select(col("e1.src").as("user_a"), col("e1.dst").as("user_b"),
        col("e1.t_us").as("t1_us"), col("e2.t_us").as("t2_us"),
        (col("e2.t_us") - col("e1.t_us")).as("gap_us"))
      .distinct()
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    val rows = got.collect()
    assert(rows.nonEmpty, "sf0.01 must contain ping-pongs")
    rows.foreach(r =>
      assert(r.getLong(4) > 0L && r.getLong(4) <= 21600000000L))
    // production plan: bucket equi-join, not BNLJ
    val p = got.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin")
      && !p.contains("CartesianProduct"), p)
  }

  test("q20 native recursion == sequential recurrence replayed in Scala") {
    val got = operators.Relational.q20RecursiveDecay(spark, SfMid).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.nonEmpty)
    val chains = Tables.orders(spark, SfMid)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
      .collect()
      .groupBy(_.getLong(0))
    chains.foreach { case (cust, rows) =>
      // o_orderdate surfaces as LocalDateTime on this read path; its ISO
      // toString sorts identically to the SQL date order
      val ordered = rows.sortBy(r => (r.get(1).toString, r.getLong(2)))
      val bal = ordered.map(_.getLong(3))
        .foldLeft(0L)((acc, c) => acc / 2 + c) // seed 0/2+c1 == c1
      val (n, decayed) = got(cust)
      assert(n == ordered.length, s"chain length for $cust")
      assert(decayed == bal, s"decayed balance for $cust")
    }
  }

  test("c09 split never separates near-duplicates; ratios near 80/10/10") {
    val split = Dedup.c09LeakageSafeSplit(spark, SfMid).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(split.nonEmpty)
    // the leakage invariant: every near-dup pair shares a split
    val pairs = Dedup.d02NgramJaccardPairs(spark, SfMid).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { p =>
      val (ca, sa) = split(p.getLong(0))
      val (cb, sb) = split(p.getLong(1))
      assert(ca == cb && sa == sb,
        s"pair ${p.getLong(0)}/${p.getLong(1)} straddles $sa/$sb")
    }
    // same cluster → same split, by construction
    split.values.groupBy(_._1).values
      .foreach(g => assert(g.map(_._2).toSet.size == 1))
    val n = split.size.toDouble
    val frac = split.values.groupBy(_._2).view.mapValues(_.size / n)
    assert(frac("train") > 0.6 && frac("train") < 0.95)
    assert(frac.getOrElse("val", 0.0) > 0.0 && frac.getOrElse("test", 0.0) > 0.0)
  }

  test("x05 bottom-k-by-hash is exact-k, deterministic, and mergeable") {
    val rows = sources.Ingest.x05GroupReservoir(spark, SfMid).collect()
    val byGroup = rows.groupBy(_.getString(0))
    byGroup.values.foreach(g => assert(g.length == 20))
    // mergeability: bottom-k of (bottom-k of each half) == global bottom-k
    val base = Tables.orders(spark, SfMid)
      .select(col("o_orderpriority"), col("o_orderkey"),
        operators.Det.knuthBucket(col("o_orderkey"), 1000000000L).as("u"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    byGroup.foreach { case (prio, got) =>
      val all = base.filter(_._1 == prio).sortBy(t => (t._3, t._2))
      val (h1, h2) = all.splitAt(all.length / 2)
      val merged = (h1.take(20) ++ h2.take(20)).sortBy(t => (t._3, t._2)).take(20)
      assert(merged.toSeq == all.take(20).toSeq, "sketch union == global")
      assert(got.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
        all.take(20).map(t => (t._2, t._3)).toSeq, s"operator output $prio")
    }
  }

  test("v10 re-rank: exact cosines, v01-consistent, recall floor over v07") {
    val v01 = Similarity.v01CosineTopk(spark, SfMid).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val v10 = Similarity.v10TwoStageRerank(spark, SfMid).collect()
    assert(v10.nonEmpty)
    // every reported cosine equals the exact (v01-side) cosine when the
    // same pair appears in the exact top-k — quantization can only
    // mis-select the shortlist, never mis-score the survivors
    v10.foreach { r =>
      v01.get((r.getLong(0), r.getLong(2)))
        .foreach(exact => assert(r.getDouble(3) == exact))
    }
    // recall@5 of the two-stage plan vs exact — floor-pinned like v02's
    val hits = v10.count(r => v01.contains((r.getLong(0), r.getLong(2))))
    val recall = hits.toDouble / v01.size
    assert(recall >= 0.35, s"two-stage recall@5 $recall")
  }
}
