package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational, Similarity}
import graft.functions.VectorFunctions

/** Physical-plan shape assertions (SURVEY.md §7.4): the queries must not
  * just return the right rows — they must produce the plans that survive a
  * 100× scale-up. Each test pins a property `.explain` shows today so a
  * regression (lost pushdown, join degradation, codegen fallback) fails CI
  * instead of surfacing as a 100 TB incident.
  */
class PlanSpec extends AnyFunSuite with SparkTestSession {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()

  test("top-k plans as TakeOrderedAndProject, not global sort") {
    assert(plan(Relational.q06TopFraudAmounts(spark, Sf))
      .contains("TakeOrderedAndProject"))
  }

  test("filters and projection push into the parquet scan") {
    val p = plan(Relational.q07RangeFilter(spark, Sf))
    assert(p.contains("PushedFilters:"))
    assert(p.contains("GreaterThanOrEqual(l_quantity,10.0)")
      || p.contains("GreaterThanOrEqual(l_quantity,10"), p)
    // column pruning: the scan reads only the 4 projected columns
    // (sparkPlan: the AQE wrapper is itself a leaf and would hide the scan)
    val scans = Relational.q07RangeFilter(spark, Sf)
      .queryExecution.sparkPlan.collectLeaves()
    assert(scans.exists(_.schema.fieldNames.toSet ==
      Set("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag")))
  }

  test("small-dimension join broadcasts (nation side)") {
    assert(plan(Relational.q10JoinRevenuePerNation(spark, Sf))
      .contains("BroadcastHashJoin"))
  }

  test("co-occurrence edge build never degrades to a nested-loop join") {
    assert(!plan(graph.CoGraph.q(spark, Sf))
      .contains("BroadcastNestedLoopJoin"))
  }

  test("the fraud-signal filter pushes through the events loader's ts projection") {
    // Tables.events wraps the scan in a nanos-normalizing projection; the
    // edge build's event_type filter must still reach the parquet reader
    val p = plan(graph.CoGraph.q(spark, Sf))
    assert(p.contains("EqualTo(event_type,error)"),
      p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("aggregation is partial before the exchange (map-side combine)") {
    val p = plan(Relational.q01PriceHistogram2d(spark, Sf))
    // partial + final HashAggregate pair around one exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("identical subplans reuse one exchange (scan+shuffle paid once)") {
    // a self-join of the same aggregate: Spark must detect the identical
    // subtree and pay its scan + shuffle ONCE — at 100 TB, exchange reuse
    // is the difference between reading the fact table once or twice in
    // every self-join shape (dedup pairs, co-occurrence, a06, g15 all
    // lean on it; g15's recorded plan shows it live)
    import org.apache.spark.sql.functions.{col, count, lit}
    val agg = Tables.orders(spark, Sf)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val j = agg.as("a").join(agg.as("b"),
      col("a.o_orderpriority") < col("b.o_orderpriority"))
    j.collect()
    val p = j.queryExecution.executedPlan.toString()
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage")
        || "ShuffleQueryStage \\d".r.findAllIn(p).toSeq.distinct.size <
           "ShuffleQueryStage \\d".r.findAllIn(p).size,
      s"the identical aggregate subtree must not shuffle twice:\n$p")
  }

  test("AQE skew-join splits a planted skewed SMJ (built-in path beside SkewOps' manual salt)") {
    // k01/k02 prove the MANUAL salting path; this pins the runtime path a
    // 1000-executor deployment leans on first: AQE detecting a skewed
    // shuffle partition and splitting it, marked `skew=true` on the join.
    // Scenario + confs are Plans' own objects — CI asserts exactly what
    // the PLANS.md evidence section publishes.
    Plans.withConfs(spark, Plans.SkewConfs) {
      val joined = Plans.skewScenario(spark)
      // execute THIS dataframe's own QueryExecution (count() would build a
      // separate one and leave joined's plan unfinalized, isFinalPlan=false)
      assert(joined.collect().nonEmpty)
      val p = joined.queryExecution.executedPlan.toString()
      assert(p.contains("skew=true"),
        "AQE must mark the skewed SMJ:\n" +
          p.linesIterator.take(40).mkString("\n"))
    }
  }

  test("runtime bloom filter from a filtered dim prunes the fact-side scan") {
    // the third leg of the 100 TB join-pruning story: AQE skew split
    // (above), manual salting (SkewOps), and Catalyst's InjectRuntimeFilter
    // — a selective dim filter materializes a bloom filter that is pushed
    // into the fact side's scan stage, cutting shuffle input before the
    // sort-merge join ever sees it. Same scenario objects as PLANS.md.
    Plans.withConfs(spark, Plans.BloomConfs) {
      val j = Plans.bloomScenario(spark, Sf)
      val opt = j.queryExecution.optimizedPlan.toString()
      assert(opt.contains("might_contain"),
        "InjectRuntimeFilter must add a bloom probe to the fact side:\n" +
          opt.linesIterator.take(25).mkString("\n"))
      assert(j.count() >= 0) // and the filtered plan still executes
    }
  }

  test("CBO with catalog stats reorders the join: selective dim first") {
    // static complement of the two runtime evidences above: ANALYZE'd
    // catalog stats + cbo.joinReorder put σ(customer)⋈orders BEFORE the
    // fact table even though the query text lists lineitem first. Same
    // scenario objects as the PLANS.md evidence section.
    Plans.withConfs(spark, Plans.CboConfs) {
      import org.apache.spark.sql.catalyst.plans.logical.Join
      val q = Plans.cboScenario(spark, Sf)
      val opt = q.queryExecution.optimizedPlan
      // stats actually reached the optimizer (rowCount comes only from
      // the catalog — file sources alone never produce one)
      assert(opt.stats.rowCount.isDefined, s"no CBO rowCount: ${opt.stats}")
      // the innermost join (no Join below it) touches only the two
      // selective relations, never the fact table
      val innermost = opt.collect {
        case j: Join if j.children.forall(c => c.collect { case x: Join => x }.isEmpty) => j
      }
      assert(innermost.nonEmpty, s"no join found:\n$opt")
      val txt = innermost.head.toString()
      assert(txt.contains("cbo_customer") && txt.contains("cbo_orders")
          && !txt.contains("cbo_lineitem"),
        s"CBO should join dim⋈orders first:\n$txt")
      assert(q.collect().nonEmpty) // and the reordered plan executes
    }
  }

  test("vec_dot stays inside whole-stage codegen (no fallback)") {
    val df = Similarity.v01CosineTopk(spark, Sf)
    assert(plan(df).contains("vec_dot"))
    // execute with interpreted fallback DISABLED: if VecDot.doGenCode
    // emitted uncompilable Java, this throws instead of silently degrading
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try assert(df.count() > 0)
    finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("vec_dot is bit-identical to the composable HOF fold") {
    val e = Tables.embeddings(spark, Sf).limit(200)
    val hof = aggregate(
      zip_with(col("embedding"), col("a2"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val paired = e.select(col("vec_id"), col("embedding"),
      reverse(col("embedding")).as("a2"))
    val diff = paired
      .select(VectorFunctions.vecDot(col("embedding"), col("a2")).as("fast"),
        hof.as("slow"))
      .filter(col("fast") =!= col("slow")) // EXACT equality, not tolerance
      .count()
    assert(diff == 0)
  }

  test("vec_dot registers as a SQL function via extension/registry") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(CAST(array(1.0, 2.0) AS array<float>), " +
        "CAST(array(3.0, 4.0) AS array<float>)) AS d").head()
    assert(r.getDouble(0) == 11.0)
    // double and mixed float×double operands (the broadcast-centroid path)
    val d = spark.sql(
      "SELECT vec_dot(CAST(array(1.0, 2.0) AS array<double>), " +
        "CAST(array(3.0, 4.0) AS array<double>)) AS a, " +
        "vec_dot(CAST(array(1.0, 2.0) AS array<float>), " +
        "CAST(array(0.5, 4.0) AS array<double>)) AS b").head()
    assert(d.getDouble(0) == 11.0 && d.getDouble(1) == 8.5)
    // a null ELEMENT nulls the fold — like the HOF spelling and the
    // DuckDB list_reduce mirror, never a silent 0.0
    val n = spark.sql(
      "SELECT vec_dot(CAST(array(1.0, NULL, 2.0) AS array<double>), " +
        "CAST(array(1.0, 1.0, 1.0) AS array<double>)) AS d").head()
    assert(n.isNullAt(0))
  }

  test("d08 pair join is an equi-join on the shingle, never nested-loop") {
    val p = plan(operators.Dedup.d08NeardupAfterDedup(spark, Sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("c09 carries no broadcast hint — cluster-table size is AQE's call") {
    // the near-dup cluster table grows with the corpus's duplication rate
    // (30-50% on web crawls → multi-TB at 100 TB input), so a hard
    // broadcast() hint there is an OOM lying in wait. The analyzed plan
    // must contain no hint node anywhere in c09's tree; whether the final
    // cluster join broadcasts is decided by AQE from the ACTUAL size.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val hints = operators.Dedup.c09LeakageSafeSplit(spark, Sf)
      .queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.isEmpty, hints.mkString("; "))
  }

  test("capShingles hot-list removal carries no broadcast hint (d02's whole tree)") {
    // the df>64 hot list's bound is corpus_shingles/64 — linear in corpus
    // size, ~10^10 entries on a boilerplate-heavy 100 TB crawl. A hard
    // broadcast() there is the OOM pattern c09 dropped in round 6; the
    // d02 tree (which consumes capShingles directly) must carry zero hint
    // nodes — AQE decides the join side from the runtime size.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val hints = operators.Dedup.d02NgramJaccardPairs(spark, Sf)
      .queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.isEmpty, hints.mkString("; "))
  }

  test("capShingles anti-join: AQE broadcasts the real sf0.1 hot list, declines the planted flood") {
    // round-7 removed the hint and ASSERTED "AQE broadcasts it at runtime
    // whenever it is actually small"; this pins both halves of that claim
    // as runtime behavior, not a static-plan hope. Scenario + confs are
    // Plans' own objects — CI asserts exactly what PLANS.md publishes.
    // the FINAL adaptive plan only — executedPlan.toString() appends the
    // "== Initial Plan ==" section, which always shows the pre-AQE SMJ
    def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
      df.queryExecution.toRdd.count() // finalize THIS QueryExecution
      val s = df.queryExecution.executedPlan.toString()
      val cut = s.indexOf("== Initial Plan ==")
      if (cut < 0) s else s.substring(0, cut)
    }
    Plans.withConfs(spark, Plans.CapAntiConfs) {
      try {
        // real tree at sf0.1, df>8: hot list small+non-empty → runtime BHJ
        val rp = finalPlan(Plans.capAntiScenario(spark, "/root/testdata/sf0.1"))
        assert(rp.contains("BroadcastHashJoin") && rp.contains("LeftAnti"),
          "AQE must broadcast the small hot list:\n" +
            rp.linesIterator.take(30).mkString("\n"))
        // real tree at the production df>64: hot list EMPTY here → AQE
        // deletes the anti-join entirely (PropagateEmptyRelation)
        val ep = finalPlan(Plans.capEmptyScenario(spark, "/root/testdata/sf0.1"))
        assert(!ep.contains("Join"),
          "AQE must eliminate the anti-join against an empty hot list:\n" +
            ep.linesIterator.take(30).mkString("\n"))
        // planted 1M-fat-string hot list past the 10MB threshold: AQE
        // must keep the shuffled join — the case a hard hint would OOM
        val fp = finalPlan(Plans.capFloodScenario(spark))
        assert(!fp.contains("BroadcastHashJoin") && fp.contains("LeftAnti"),
          "AQE must NOT broadcast the oversized hot list:\n" +
            fp.linesIterator.take(30).mkString("\n"))
      } finally Caches.release(spark) // scoped: only graft-internal caches
    }
  }

  test("mm04b member cap runs through the GroupedTopK operator, no window") {
    // the per-bucket smallest-K retention must be the skew-safe heap
    // operator (partial+final pair), never a row_number window that would
    // single-task a storm bucket. sparkPlan (not optimizedPlan): the
    // GroupedTopK node lives in the live plan, not behind a cached
    // InMemoryRelation as in g22's spelling
    val p = operators.Multimodal.mm04bCappedNeardup(spark, Sf)
      .queryExecution.sparkPlan.toString
    assert("GroupedTopK \\[".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.contains("Window") && !p.toLowerCase.contains("row_number"), p.take(2000))
  }

  test("d05c bucket cap runs through the GroupedTopK operator, no window") {
    // same contract as mm04b: the per-(table,bucket) smallest-K retention
    // must be the skew-safe heap operator (partial+final pair), never a
    // row_number window that would single-task an overfull bucket
    val p = operators.Similarity.d05cCappedNeardupLsh(spark, Sf)
      .queryExecution.sparkPlan.toString
    assert("GroupedTopK \\[".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.contains("Window") && !p.toLowerCase.contains("row_number"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(2000))
  }

  test("g20b triangle join is equi-only: no BNLJ or cartesian anywhere") {
    val p = plan(graph.NeighborAgg.g20bCappedClusteringCoeff(spark, Sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(2000))
  }

  test("g30 triangle round: broadcast-hash joins (stats-free checkpoint side), explode not union, no BNLJ") {
    // the round plan, not ktruss's output plan — the eager per-round
    // checkpoints make the final executedPlan a bare RDD scan, so the
    // shape that matters is the support round itself, on a checkpointed
    // relation exactly as the loop sees it
    val und = graft.Cut.cut(graph.CoGraph.cappedEdges(spark, Sf)
      .filter(col("src") < col("dst")).select("src", "dst"))
    val p = plan(graph.Components.trussSupport(und))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(2000))
    // the two probe sides of the triangle join must be broadcast — the
    // post-checkpoint relation has no size statistics, and the SMJ
    // cascade it otherwise picks cost 37 s vs 11 s at sf0.1
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // support counting is ONE explode (Generate) into a partial
    // aggregate, never a 3-branch union re-running the triangle join
    assert(p.contains("Generate explode"), p.take(2000))
    assert(!p.contains("Union"), "3-branch union spelling regressed: " + p.take(2000))
    // and the aggregate is partial before the exchange (map-side combine)
    assert(p.contains("partial_count"), p.take(2000))
  }

  test("c13 composed pipeline plans hint-free with no BNLJ or cartesian") {
    val df = operators.Corpus.c13CorpusJob(spark, Sf)
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.isEmpty, hints.mkString("; "))
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(2000))
  }

  test("t10 frequent-line removal carries no broadcast hint") {
    // same linear bound (corpus_lines / K frequent lines); AQE's call.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val hints = operators.LmOps.t10LineDedup(spark, Sf)
      .queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.isEmpty, hints.mkString("; "))
  }

  test("g22's caps run through the GroupedTopK operator (partial+final, both caps), no window") {
    // the capped edge list is cached; optimizedPlan inlines the
    // InMemoryRelation's cached physical plan, where the heap operator's
    // nodeName prints as `GroupedTopK [group], …` (partial+final pair per
    // cap stage → ≥ 4 occurrences across the two caps)
    val p = graph.NeighborAgg.g22CappedNeighborFeatures(spark, Sf)
      .queryExecution.optimizedPlan.toString
    assert("GroupedTopK \\[".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("Window") && !p.toLowerCase.contains("row_number"), p)
  }

  test("d09 canonicalizes with one hash aggregate before the pair join") {
    val p = plan(operators.Similarity.d09EmbeddingNeardupCanonical(spark, Sf))
    // the content groupBy must aggregate, and the pair stage is the same
    // vec_id range self-join d05 uses (a BNLJ on the id inequality is the
    // documented brute-force shape — what matters is the canonicalization
    // happened BEFORE it, i.e. an aggregate feeds the join)
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate")
      || p.contains("SortAggregate"), p)
  }

  test("r02 blocks on an equi-join with jaro_winkler as codegen'd residual") {
    val df = operators.Dedup.r02JaroLinkage(spark, Sf)
    val p = plan(df)
    // the brand block is the join KEY; the expensive metric must be a
    // residual predicate, never the join condition of a nested loop
    assert(!p.contains("BroadcastNestedLoopJoin")
      && !p.contains("CartesianProduct"), p)
    assert(p.contains("jaro_winkler"), p)
    // and the expression stays inside whole-stage codegen (no fallback
    // marker on the join/filter stage that evaluates it)
    assert(!p.contains("codegen=false") || {
      val bad = p.linesIterator
        .filter(l => l.contains("jaro_winkler") && l.contains("codegen=false"))
      bad.isEmpty
    }, p)
  }

  test("v10's re-rank stage broadcasts queries and distance table, never the corpus") {
    val p = plan(operators.Similarity.v10TwoStageRerank(spark, Sf))
    // stage 1 (IVF-PQ) and stage 2 (exact re-rank) both hang off
    // broadcast joins of the small sides; the corpus embedding table must
    // not appear under a BroadcastExchange
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("w16 session_window plans one user_id exchange then the session merge") {
    val df = operators.WindowOps.w16SessionWindow(spark, Sf)
    val p = plan(df)
    // sessionization must shuffle on the user key once; the session
    // assembly is the dedicated UpdatingSessionsExec (or a sort-based
    // merge) — never a global single-partition window
    assert(p.contains("hashpartitioning(user_id"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("c15b sketch build: distinct lives in the partial pass, one k-bounded exchange") {
    import graft.plans.{GroupedTopK, RankTopKExec}
    // the round-14 distinctValues mode: the KMV fold's distinct-set
    // semantics collapse equal values BEFORE the shuffle, so the only
    // exchange in the sketch build carries ≤ k rows per (source) group —
    // the old spelling's corpus-wide distinct() pair (HashAggregate /
    // Exchange / HashAggregate over every (source, h)) must be gone
    val u = operators.Corpus.shingleHashes(Tables.documents(spark, Sf))
    val sk = GroupedTopK.rank(u.withColumn("hd", col("h").cast("double")),
      Seq("source"), "hd", 128, descending = false, distinctValues = true)
    val ranks = sk.queryExecution.sparkPlan.collect { case r: RankTopKExec => r }
    assert(ranks.length == 2 && ranks.forall(_.distinctValues),
      sk.queryExecution.sparkPlan.toString)
    // exchange placement is EnsureRequirements' work — read the prepared
    // plan (sparkPlan predates it and shows the two passes adjacent)
    val s = sk.queryExecution.executedPlan.toString()
    assert(!s.contains("HashAggregate"), s)
    // exactly one exchange keyed by the GROUP key (the k-bounded one the
    // distinct-partial mode exists to produce). The r14 load-time
    // parallelism floor (Tables.documents -> Par.spread) may add one
    // doc_id-keyed repartition BELOW the sketch build on tiny scans —
    // metadata-gated, absent at production scan sizes — so the pin counts
    // group-key exchanges, not all exchanges.
    assert(s.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(source")) == 1, s)
  }
}
