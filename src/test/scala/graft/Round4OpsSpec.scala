package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.Components
import graft.operators.{Corpus, TextOps, WindowOps}

/** Contracts for the round-4 operators beyond their DuckDB oracles:
  * losslessness of the bucketed interval join vs the naive range join,
  * k-core fixpoint-within-budget + the degree invariant, CMS superset
  * guarantee for the heavy-hitter candidates, Simpson-index bounds, and
  * curriculum stage/shard accounting.
  */
class Round4OpsSpec extends AnyFunSuite with SparkTestSession {

  test("w07 bucketed interval join equals the naive range-join spelling") {
    import WindowOps.IntervalSecs
    val ev = Tables.events(spark, SfMid)
    val probes = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("tp"))
    val intervals = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("iu"), unix_timestamp(col("ts")).as("t0"))
    val naive = probes.join(intervals,
        col("user_id") === col("iu")
          && col("tp") >= col("t0") && col("tp") < col("t0") + lit(IntervalSecs))
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_windows"), min("t0").as("first_window_start"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bucketed = WindowOps.w07IntervalJoin(spark, SfMid)
      .select("event_id", "n_windows", "first_window_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bucketed == naive,
      s"missing=${(naive -- bucketed).take(5)} extra=${(bucketed -- naive).take(5)}")
    assert(bucketed.nonEmpty, "testdata must contain covered purchases")
  }

  test("w07 plan is an equi-join, not BNLJ/cartesian") {
    val p = WindowOps.w07IntervalJoin(spark, SfMid)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("BroadcastNestedLoopJoin"), p.linesIterator.take(30).mkString("\n"))
    assert(!p.contains("CartesianProduct"))
  }

  test("g15 k-core reaches its fixpoint within the round budget") {
    val atBudget = Components.kcore(spark, SfMid).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val onePast = Components.kcore(spark, SfMid,
        rounds = Components.KcoreRounds + 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(atBudget == onePast,
      s"peeling not converged in ${Components.KcoreRounds} rounds: " +
        s"delta=${(atBudget -- onePast).take(5)} ${(onePast -- atBudget).take(5)}")
    assert(atBudget.nonEmpty, "testdata graph must contain a 2-core")
  }

  test("g15 cores nest: the 3-core is a subgraph of the 2-core") {
    val core2 = Components.kcore(spark, SfMid, k = 2).collect()
      .map(_.getLong(0)).toSet
    val core3 = Components.kcore(spark, SfMid, k = 3).collect()
      .map(_.getLong(0)).toSet
    assert(core3.subsetOf(core2),
      s"nesting violated: ${(core3 -- core2).take(5)}")
  }

  test("g15 every surviving vertex meets the k-core degree invariant") {
    val degs = Components.kcore(spark, SfMid).collect().map(_.getLong(1))
    assert(degs.forall(_ >= Components.KcoreK),
      s"core contains vertex with degree < ${Components.KcoreK}")
  }

  test("e12 CMS candidate estimates never underestimate (superset guarantee)") {
    val exact = Tables.documents(spark, SfMid)
      .select(explode(graft.operators.TextFn.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val hh = TextOps.e12HeavyHitters(spark, SfMid).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(hh.nonEmpty, "testdata must contain heavy hitters at the share threshold")
    // final output counts are EXACT (pass-2 recount), not estimates
    hh.foreach { case (w, c) => assert(exact(w) == c, s"recount drift for $w") }
    // and the output is exactly the set of tokens over the threshold
    val total = exact.values.sum
    val t = math.ceil(total * TextOps.HhShare).toLong
    assert(hh.map(_._1).toSet == exact.filter(_._2 >= t).keySet)
  }

  test("t14 Simpson index is bounded by [1/|alphabet|, 1]") {
    val rows = TextOps.t14CharDiversity(spark, SfMid)
      .filter(col("n_chars") > 0).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nd = r.getLong(2).toDouble
      val simpson = r.getDouble(3)
      assert(simpson >= 1.0 / nd - 1e-6 && simpson <= 1.0 + 1e-6,
        s"simpson $simpson out of [1/$nd, 1] for doc ${r.getLong(0)}")
    }
  }

  test("g16 PPR mass stays on the seed-reachable set and seeds keep reset mass") {
    import graft.graph.PageRankOps
    val ppr = PageRankOps.personalizedPageRank(spark, SfMid).collect()
    assert(ppr.nonEmpty && ppr.length <= PageRankOps.PprTopK)
    assert(ppr.forall(_.getDouble(1) > 0))
    // seeds always retain at least their own teleport mass α/|S| — the
    // top-k must therefore contain at least one confirmed offender
    val seeds = Tables.events(spark, SfMid)
      .filter(col("event_type") === "error")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .filter(col("n") >= PageRankOps.ConfirmedErrT)
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(ppr.map(_.getLong(0)).exists(seeds.contains))
  }

  test("w09 gap-filled grid tiles each user's span exactly, gaps carry the fill") {
    val rows = WindowOps.w09GapFill(spark, SfMid).collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, rs) =>
      val hours = rs.map(_.getLong(1)).sorted
      // complete hourly tiling: span/3600 + 1 rows, consecutive steps
      assert(hours.length == (hours.last - hours.head) / 3600 + 1,
        s"user $u grid not complete")
      assert(hours.zip(hours.tail).forall { case (a, b) => b - a == 3600L })
      // first row observed; every gap row repeats the last observed value
      val sortedRs = rs.sortBy(_.getLong(1))
      assert(!sortedRs.head.getBoolean(3), s"user $u leading gap")
      sortedRs.sliding(2).foreach {
        case Array(prev, cur) if cur.getBoolean(3) =>
          assert(cur.getDouble(4) == prev.getDouble(4),
            s"user $u gap at ${cur.getLong(1)} broke the forward fill")
        case _ =>
      }
    }
    assert(rows.exists(_.getBoolean(3)), "testdata must contain gap hours")
  }

  test("q18 correlated subqueries decorrelate to joins, no per-row re-execution") {
    val p = graft.operators.Relational
      .q18CorrelatedSubqueries(spark, SfMid)
      .queryExecution.executedPlan.toString()
    // EXISTS → left-semi, scalar subqueries → aggregated outer joins;
    // nothing nested-loop and no surviving per-row subquery execution
    assert(!p.contains("BroadcastNestedLoopJoin"), p.linesIterator.take(25).mkString("\n"))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Join"), "decorrelation must surface as joins")
  }

  test("c08 domain cap bounds every source and is partitioning-independent") {
    val m = Corpus.c08DomainCap(spark, SfMid).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      val (total, kept) = (r.getLong(1), r.getLong(2))
      assert(kept == math.min(total, 10L),
        s"source ${r.getString(0)}: kept $kept of $total under cap 10")
    }
    // the kept set must not depend on physical row order: the rank's
    // (quality DESC, doc_id) tie-break is a total order
    val again = Corpus.c08DomainCap(spark, SfMid).collect()
    assert(m.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("q19 lateral limit decorrelates to a windowed join, no nested loop") {
    val p = graft.operators.Relational
      .q19LateralTopn(spark, SfMid)
      .queryExecution.executedPlan.toString()
    // the LATERAL ... LIMIT must rewrite to a rank-style window over one
    // joined scan, never a per-nation re-execution (nested-loop shape)
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(25).mkString("\n"))
    assert(p.contains("Window"), "lateral limit should surface as a window rank")
  }

  test("c07 curriculum stages quarter the corpus and shards cover it") {
    val m = Corpus.c07CurriculumShards(spark, SfMid).collect()
    val total = m.map(_.getLong(2)).sum
    val docs = Tables.documents(spark, SfMid).count()
    assert(total == docs, s"manifest covers $total of $docs docs")
    val byStage = m.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(byStage.keys.toSet.subsetOf(Set(1L, 2L, 3L, 4L)))
    // type-1 quantile staging: no stage may exceed half the corpus unless
    // the score distribution is that degenerate (ties share a stage)
    assert(byStage.values.forall(_ > 0))
  }

  test("e19 median/MAD/outliers match a brute-force sorted recompute") {
    import graft.operators.RelationalExt
    val out = RelationalExt.e19MadOutliers(spark, SfMid).collect()
      .map(r => r.getString(0) -> r).toMap
    val rows = Tables.orders(spark, SfMid)
      .select(col("o_orderpriority"), col("o_totalprice"))
      .collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    def q50(xs: Seq[Long]): Long = { // type-1: value at ceil(n/2), 1-based
      val s = xs.sorted; s((s.size + 1) / 2 - 1)
    }
    rows.groupBy(_._1).foreach { case (prio, g) =>
      val vs = g.map(_._2).toSeq
      val med = q50(vs)
      val mad = q50(vs.map(v => math.abs(v - med)))
      val outliers = vs.count(v => math.abs(v - med) > 3 * mad)
      val r = out(prio)
      assert(r.getLong(1) == vs.size, s"$prio n")
      assert(r.getDouble(2) == med / 100.0, s"$prio median")
      assert(r.getDouble(3) == mad / 100.0, s"$prio mad")
      assert(r.getLong(4) == outliers, s"$prio outliers")
    }
  }

  test("w11 cumulative distinct users: first-touch identity holds") {
    import graft.operators.WindowOps
    val out = WindowOps.w11CumulativeDistinct(spark, SfMid).collect()
    val totalUsers = Tables.events(spark, SfMid)
      .select("user_id").distinct().count()
    assert(out.last.getAs[Long]("cum_users") == totalUsers,
      "final cumulative equals the global distinct count")
    assert(out.map(_.getAs[Long]("new_users")).sum == totalUsers)
    val cums = out.map(_.getAs[Long]("cum_users"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b }, "monotone")
    out.foreach { r =>
      assert(r.getAs[Long]("active_users") <= r.getAs[Long]("cum_users"),
        "daily active can never exceed distinct-to-date")
    }
  }

  test("x03 hash stratification is partitioning-independent and on-rate") {
    import graft.sources.Ingest
    val a = Ingest.x03StratifiedHash(spark, SfMid).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val totals = Tables.lineitem(spark, SfMid)
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byFlag = a.map { case (f, _, n) => f -> n }.toMap
    assert(byFlag("R") == totals("R"), "keep-all stratum keeps ALL rows")
    Seq("A", "N").foreach { f =>
      val rate = byFlag(f).toDouble / totals(f)
      assert(math.abs(rate - 0.2) < 0.03, s"$f sampled at $rate, want ~0.2")
    }
    // pure row function: a repartitioned re-run selects the SAME rows
    val re = Ingest.x03StratifiedHash(spark, SfMid).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(re.toSeq == a.toSeq)
  }

  test("t18 Zipf head: contiguous ranks, monotone counts, exact products") {
    import graft.operators.TextOps
    val rows = TextOps.t18ZipfCheck(spark, SfMid).collect()
    assert(rows.length == 30)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 30))
    val cnts = rows.map(_.getLong(2))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b }, "monotone")
    rows.foreach { r =>
      assert(r.getLong(3) == r.getInt(0).toLong * r.getLong(2),
        "zipf_product recomputes")
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) < 1.0)
    }
  }

  test("p04 calendar spine is contiguous, conserves orders, correct DOW") {
    import graft.sinks.MartPipeline
    val rows = MartPipeline.p04CalendarDim(spark, SfMid).collect()
    val days = rows.map(_.getLong(0))
    assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 },
      "no calendar gaps")
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      Tables.orders(spark, SfMid).count(), "every order lands on its day")
    assert(rows.exists(_.getAs[Long]("n_orders") == 0L),
      "zero-activity days appear explicitly")
    rows.take(400).foreach { r =>
      val d = java.time.LocalDate.ofEpochDay(r.getLong(0))
      assert(r.getAs[Long]("iso_dow") == d.getDayOfWeek.getValue.toLong,
        s"iso_dow at $d")
      assert(r.getAs[Int]("year") == d.getYear)
      assert(r.getAs[Int]("month") == d.getMonthValue)
      assert(r.getAs[Int]("quarter") == (d.getMonthValue + 2) / 3)
      assert(r.getAs[Boolean]("is_weekend") ==
        (d.getDayOfWeek.getValue >= 6))
    }
  }

  test("g21 assortativity equals brute-force Pearson over edge endpoints") {
    import graft.graph.{CoGraph, NeighborAgg}
    val out = NeighborAgg.g21Assortativity(spark, SfMid).collect()(0)
    val edges = CoGraph.edges(spark, SfMid).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val xs = edges.map(e => deg(e._1).toDouble)
    val ys = edges.map(e => deg(e._2).toDouble)
    val n = xs.length.toDouble
    val num = n * xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum
    val den = math.sqrt((n * xs.map(x => x * x).sum - xs.sum * xs.sum) *
      (n * ys.map(y => y * y).sum - ys.sum * ys.sum))
    val brute = num / den
    assert(out.getLong(0) == xs.length)
    assert(math.abs(out.getDouble(1) - brute) < 1e-4,
      s"engine ${out.getDouble(1)} vs brute $brute")
    assert(out.getDouble(1) >= -1.0 && out.getDouble(1) <= 1.0)
  }

  test("a08 Gini matches the sorted per-row definition and its bounds") {
    import graft.operators.Analytics
    val out = Analytics.a08GiniConcentration(spark, SfMid).collect()
      .map(r => r.getString(0) -> r).toMap
    val rows = Tables.orders(spark, SfMid)
      .join(Tables.customer(spark, SfMid),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"))
      .collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    rows.groupBy(_._1).foreach { case (seg, g) =>
      val xs = g.map(_._2).sorted
      val n = xs.length
      val s = xs.zipWithIndex.map { case (x, i) =>
        x.toDouble * (2 * (i + 1) - n - 1) }.sum
      val brute = s / (n.toDouble * xs.map(_.toDouble).sum)
      val r = out(seg)
      assert(r.getAs[Long]("n_orders") == n)
      assert(math.abs(r.getAs[Double]("gini") - brute) < 1e-4,
        s"$seg: ${r.getAs[Double]("gini")} vs $brute")
      // uniform-ish synthetic amounts: inequality present but moderate
      assert(r.getAs[Double]("gini") > 0.0 && r.getAs[Double]("gini") < 1.0)
    }
  }

  test("e21 key sweep proves PK uniqueness across the whole warehouse") {
    import graft.operators.RelationalExt
    val out = RelationalExt.e21KeySweep(spark, SfMid).collect()
    assert(out.map(_.getString(0)).toSeq ==
      Seq("customer", "events", "lineitem", "nation", "orders", "region"))
    out.foreach { r =>
      assert(r.getAs[Long]("min_key") <= r.getAs[Long]("max_key"))
      assert(r.getAs[Long]("n_rows") > 0)
      if (r.getString(0) == "lineitem")
        // the testdata's known integrity defect (e08's deliberately red
        // unique_pk check): the sweep must DETECT it, not paper over it
        assert(r.getAs[Long]("key_distinct") < r.getAs[Long]("n_rows"))
      else
        assert(r.getAs[Long]("key_distinct") == r.getAs[Long]("n_rows"),
          s"duplicate keys in ${r.getString(0)}")
    }
  }

  test("w12 rank family: total order makes every rank function exact") {
    import graft.operators.WindowOps
    val out = WindowOps.w12RankFamily(spark, SfMid).collect()
    val groupN = Tables.orders(spark, SfMid)
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.groupBy(_.getString(0)).foreach { case (prio, rows) =>
      val n = groupN(prio).toDouble
      rows.foreach { r =>
        val rnk = r.getInt(3)
        assert(r.getInt(4) == rnk, "tie-free total order: dense_rank == rank")
        assert(r.getDouble(5) == (rnk - 1) / (n - 1), "percent_rank identity")
        assert(r.getDouble(6) == rnk / n, "cume_dist identity (no ties)")
        assert(r.getInt(7) >= 1 && r.getInt(7) <= 4)
      }
      assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to 20),
        s"top-20 ranks contiguous for $prio")
    }
  }

  test("e20 array pipeline equals the explode-and-regroup recompute") {
    import graft.operators.RelationalExt
    val out = RelationalExt.e20ArrayOps(spark, Sf).collect()
    val brute = Tables.lineitem(spark, Sf)
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(out.nonEmpty)
    assert(out.map(_.getLong(0)).toSet ==
      brute.filter(_._2.size >= 5).keySet, "filter keeps exactly >=5-item orders")
    out.foreach { r =>
      val qs = brute(r.getLong(0))
      assert(r.getInt(1) == qs.size)
      assert(r.getString(2) == qs.mkString(","))
      assert(r.getLong(3) == qs.sum)
      assert(r.getInt(4) == qs.count(_ >= 30))
    }
  }

  test("g20 clustering coefficient: triangle counts cross-validate GraphX") {
    import graft.graph.{Components, NeighborAgg}
    val lcc = NeighborAgg.g20ClusteringCoeff(spark, SfMid).collect()
    assert(lcc.nonEmpty)
    // bounds + arithmetic: lcc = 2·tri / (deg·(deg−1)) recomputed per row
    lcc.foreach { r =>
      val (deg, tri, v) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(deg >= 2)
      assert(v >= 0.0 && v <= 1.0, s"lcc $v out of range")
      val expect = math.floor(2.0 * tri / (deg * (deg - 1)) * 1e6 + 0.5) / 1e6
      assert(math.abs(v - expect) < 1e-9, s"lcc arithmetic for id ${r.getLong(0)}")
    }
    // the DataFrame triangle enumeration must agree with GraphX Pregel
    val mine = lcc.map(r => r.getLong(0) -> r.getLong(2))
      .filter(_._2 > 0).toMap
    val graphx = Components.triangles(spark, SfMid).collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue()).toMap
    assert(mine == graphx.filter { case (id, _) => mine.contains(id) } &&
      graphx.keySet.subsetOf(lcc.map(_.getLong(0)).toSet),
      "per-node triangle counts diverge from GraphX triangleCount")
  }

  test("a07 RFM segments partition the customer base exactly") {
    import graft.operators.Analytics
    val out = Analytics.a07RfmSegments(spark, SfMid).collect()
    val nCust = Tables.orders(spark, SfMid)
      .select("o_custkey").distinct().count()
    assert(out.map(_.getAs[Long]("n_customers")).sum == nCust,
      "every customer lands in exactly one segment")
    val segs = out.map(_.getAs[String]("segment"))
    assert(segs.distinct.length == segs.length)
    assert(segs.forall(_.matches("[R-][F-][M-]")), segs.mkString(","))
    out.foreach { r =>
      assert(r.getAs[Double]("avg_recency_days") >= 0.0)
      assert(r.getAs[Double]("avg_frequency") >= 1.0)
    }
  }

  test("j03 schema-drift union: v1 era all-NULL k, totals conserved") {
    import graft.operators.JsonOps
    val out = JsonOps.j03UnionDrift(spark, SfMid).collect()
    val total = Tables.events(spark, SfMid).count()
    assert(out.map(_.getAs[Long]("n")).sum == total,
      "union loses/duplicates no rows")
    out.filter(_.getAs[String]("era") == "v1").foreach { r =>
      assert(r.getAs[Long]("k_nulls") == r.getAs[Long]("n"),
        "v1 rows predate the k column: all NULL")
      assert(r.isNullAt(r.fieldIndex("min_k")))
    }
    // v2 rows parse real values (testdata props carry k throughout)
    val v2 = out.filter(_.getAs[String]("era") == "v2")
    assert(v2.nonEmpty && v2.exists(_.getAs[Long]("k_nulls") <
      v2.map(_.getAs[Long]("n")).max))
  }

  test("g19 neighbor aggregation matches a brute-force recompute") {
    import graft.graph.{CoGraph, NeighborAgg}
    val edges = CoGraph.edges(spark, SfMid).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val feats = Tables.events(spark, SfMid)
      .filter(col("event_type") === "error")
      .groupBy("user_id")
      .agg(sum(col("value").cast("decimal(28,4)")).as("f"))
      .collect()
      .map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
    val out = NeighborAgg.g19NeighborFeatures(spark, SfMid).collect()
    assert(out.nonEmpty && out.map(_.getLong(0)).toSet == adj.keySet,
      "one output row per node with out-edges")
    out.foreach { r =>
      val u = r.getLong(0)
      val n1 = adj(u)
      assert(r.getLong(1) == n1.size, s"h1_n for $u")
      val mean1 = n1.toSeq.map(feats).sum / n1.size
      assert(math.abs(r.getDouble(2) - mean1) < 1e-3, s"h1_mean for $u")
      // hop-2: exactly two steps, self excluded; overlap with hop-1 allowed
      val n2 = n1.flatMap(v => adj.getOrElse(v, Set.empty) - u)
      assert(r.getLong(3) == n2.size, s"h2_n for $u")
      if (n2.nonEmpty) {
        val mean2 = n2.toSeq.map(feats).sum / n2.size
        assert(math.abs(r.getDouble(4) - mean2) < 1e-3, s"h2_mean for $u")
      } else assert(r.isNullAt(4), s"empty hop-2 mean must be NULL for $u")
    }
  }
}
