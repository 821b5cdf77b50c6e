package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextFn
import graft.streaming.StreamPipeline

/** Property-based tests (SURVEY.md §5.3, ScalaCheck generators with
  * deterministic seeded sampling — the scalatest/scalacheck bridge artifact
  * is not in the offline cache, so sampling is driven directly): algebraic
  * invariants of the deterministic primitives plus distributed-result
  * properties of the graph layer on the smallest testdata.
  */
class PropertySpec extends AnyFunSuite with SparkTestSession {

  /** n deterministic samples of a generator (seeds 0..n-1). */
  private def samples[A](g: Gen[A], n: Int = 100): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("perm hashes stay in [0, P) for any positive id") {
    for {
      id <- samples(Gen.choose(1L, 10000000L))
      j <- 0 until 32
    } {
      val v = (TextFn.A(j) * id + TextFn.B(j)) % TextFn.P
      assert(v >= 0 && v < TextFn.P)
    }
  }

  test("stream offsets: arbitrary append schedules deliver every complete line exactly once") {
    // Pure simulation of the LpMicroBatchStream cycle (committedLength →
    // new-bytes ranges → read) over random multi-file append schedules
    // with partial-line tails: union of all batches = every line whose
    // newline has landed, each exactly once, regardless of batch timing.
    import graft.sources.LpStreamOffset
    import java.nio.file.{Files, StandardOpenOption}
    val gSchedule = Gen.listOfN(8, for {
      fileIdx <- Gen.choose(0, 2)
      lines <- Gen.choose(0, 3)
      partial <- Gen.oneOf(true, false)
    } yield (fileIdx, lines, partial))
    var lineId = 0
    samples(gSchedule, 20).foreach { schedule =>
      val dir = Files.createTempDirectory("lp_prop")
      val pending = scala.collection.mutable.Map[Int, String]() // unfinished tails
      var committed = Map[String, Long]()
      val delivered = scala.collection.mutable.ArrayBuffer[String]()
      val expected = scala.collection.mutable.ArrayBuffer[String]()
      def step(): Unit = { // one micro-batch: latestOffset + read new ranges
        val files = dir.toFile.listFiles().filter(_.isFile).map(_.getPath).sorted
        val latest = files.map(p => p -> LpStreamOffset.committedLength(p)).toMap
        latest.foreach { case (f, end) =>
          val start = committed.getOrElse(f, 0L)
          if (end > start) {
            val raf = new java.io.RandomAccessFile(f, "r")
            val buf = new Array[Byte]((end - start).toInt)
            raf.seek(start); raf.readFully(buf); raf.close()
            delivered ++= new String(buf, "UTF-8").split("\n").filter(_.nonEmpty)
          }
        }
        committed = latest
      }
      schedule.foreach { case (fi, n, partial) =>
        val f = dir.resolve(s"f$fi.lp")
        // finish an open tail: the tail bytes are already in the file,
        // only the suffix + newline lands now
        val sb = new StringBuilder(pending.remove(fi).fold("") { tail =>
          expected += tail + "END"; "END\n"
        })
        (1 to n).foreach { _ =>
          lineId += 1; expected += s"line$lineId"; sb ++= s"line$lineId\n"
        }
        if (partial) { lineId += 1; pending(fi) = s"line$lineId" ; sb ++= s"line$lineId" }
        Files.writeString(f, sb.toString,
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        step()
      }
      step() // drain whatever the last append left complete
      // every complete line exactly once; still-open tails (no newline
      // yet) are not in `expected` and must not have been delivered
      assert(delivered.sorted == expected.sorted,
        s"schedule $schedule: delivered ${delivered.size} vs expected ${expected.size}")
    }
  }

  test("round-half-up matches the closed form for bounded doubles") {
    val xs = samples(Gen.choose(-1000000.0, 1000000.0), 25)
    val ks = samples(Gen.choose(0, 6), 25)
    import spark.implicits._
    xs.zip(ks).foreach { case (x, k) =>
      val p = math.pow(10, k)
      val expect = math.floor(x * p + 0.5) / p
      val got = spark.range(1)
        .select(graft.operators.Det.r(lit(x), k).as("r")).head().getDouble(0)
      assert(got == expect, s"r($x, $k)")
    }
  }

  test("line protocol is parseable and field-faithful") {
    for {
      id <- samples(Gen.choose(0L, 1000000L), 30)
      tag <- Seq("fraud", "money", "normal")
    } {
      val v = id * 0.25 + 0.1
      val line = StreamPipeline.lineProtocol("m", tag, id, v, 1700000000000000L)
      assert(line.startsWith(s"m,type_tag=$tag "))
      val fields = line.split(' ')(1).split(',')
      assert(fields.contains(s"event_id=${id}i"))
      assert(fields.contains(s"value=$v"))
      assert(line.endsWith((1700000000000000L * 1000L).toString))
    }
  }

  test("PageRank scores respect the alpha/N floor and unit mass bound") {
    import graft.graph.PageRankOps
    val pr = PageRankOps.pageRankLoop(spark, Sf).cache()
    val n = pr.count()
    val mn = pr.agg(min("pagerank")).head.getDouble(0)
    val total = pr.agg(sum("pagerank")).head.getDouble(0)
    // every vertex keeps at least the teleport mass alpha/N
    assert(mn >= PageRankOps.Alpha / n - 1e-12)
    // amount-normalized out-weights sum to <= 1 per src, so mass can only
    // shrink (dangling loss): total stays within (0, 1]
    assert(total > 0.0 && total <= 1.0 + 1e-9, s"total PR mass $total")
  }

  test("g13 BFS distances satisfy the triangle/frontier invariants") {
    import graft.graph.{Components, CoGraph, PageRankOps}
    val dist = Components.fraudDistance(spark, SfMid).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist.nonEmpty && dist.values.forall(h => h >= 0 && h <= Components.MaxHops))
    val seeds = Tables.events(spark, SfMid)
      .filter(col("event_type") === "error")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .filter(col("n") >= PageRankOps.ConfirmedErrT)
      .collect().map(_.getLong(0)).toSet
    assert(seeds.forall(s => dist.get(s).contains(0L)),
      "every seed must sit at hop 0")
    assert(dist.filter(_._2 == 0L).keySet == seeds,
      "hop 0 must be exactly the seed set")
    // BFS frontier property: every hop-k vertex (k>0) has an in-neighbor
    // at hop k-1, and no edge spans more than one hop level downward
    val edges = CoGraph.edges(spark, SfMid).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val inNbrs = edges.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    dist.filter(_._2 > 0).foreach { case (v, h) =>
      assert(inNbrs.getOrElse(v, Set.empty).exists(u => dist.get(u).contains(h - 1)),
        s"vertex $v at hop $h lacks a predecessor at ${h - 1}")
    }
    edges.foreach { case (u, v) =>
      (dist.get(u), dist.get(v)) match {
        case (Some(hu), Some(hv)) =>
          assert(hv <= hu + 1 || hu == Components.MaxHops,
            s"edge $u($hu)->$v($hv) violates BFS level property")
        case _ =>
      }
    }
  }

  test("degree table of the symmetric edge set is even-summed") {
    val e = graph.CoGraph.edges(spark, Sf).cache()
    val deg = graph.CoGraph.degrees(spark, Sf)
    val degSum = deg.agg(sum("degree")).head.getLong(0)
    assert(degSum == 2 * e.count())
    val asym = e.select(col("dst").as("src"), col("src").as("dst"))
      .except(e).count()
    assert(asym == 0)
  }

  test("char fingerprint is stable, bounded, and order-sensitive") {
    import spark.implicits._
    val strs = samples(Gen.alphaNumStr, 60).filter(_.length > 1).distinct.take(20)
    val df = (strs ++ strs.map(_.reverse)).toDF("text")
      .select(col("text"), TextFn.charFingerprint(col("text")).as("fp"))
    val fps = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    fps.values.foreach(f => assert(f >= 0 && f < TextFn.FpMod))
    strs.filter(s => s != s.reverse).foreach { s =>
      assert(fps(s) != fps(s.reverse), s"fingerprint insensitive for $s")
    }
  }

  test("chunk-pack arithmetic tiles any token count exactly") {
    val Chunk = 50L
    samples(Gen.choose(1L, 100000L), 200).foreach { n =>
      val nChunks = (n - 1) / Chunk + 1
      val bounds = (0L until nChunks).map { i =>
        (i * Chunk + 1, math.min(n, (i + 1) * Chunk))
      }
      assert(bounds.head._1 == 1L)
      assert(bounds.last._2 == n)
      bounds.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(s2 == e1 + 1)
        case _ =>
      }
      assert(bounds.map { case (s, e) => e - s + 1 }.sum == n)
    }
  }

  test("simhash banding is pigeonhole-lossless at radius < band count") {
    // any 63-bit pair at hamming <= 3 must agree exactly on one of the
    // four 16-bit chunks — the theorem d04b's oracle equality rests on
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val base = rnd.nextLong() & Long.MaxValue
      val nFlips = rnd.nextInt(4) // 0..3 flipped bits
      val flipped = (1 to nFlips).foldLeft(base) { (v, _) =>
        v ^ (1L << rnd.nextInt(63))
      }
      val chunkMatch = (0 until 4).exists(b =>
        ((base >>> (16 * b)) & 0xFFFFL) == ((flipped >>> (16 * b)) & 0xFFFFL))
      assert(chunkMatch,
        f"pair at hamming<=3 with no matching chunk: $base%x vs $flipped%x")
    }
  }

  test("g14 synchronous LPA matches a local recompute exactly") {
    import graft.graph.{Components, CoGraph}
    val edges = CoGraph.edges(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val verts = Components.vertices(spark, Sf).collect()
      .map(_.getLong(0)).toSet
    val inN = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var lab = verts.iterator.map(v => v -> v).toMap
    for (_ <- 1 to Components.LpaIterations) {
      val prev = lab
      lab = verts.iterator.map { v =>
        val nbrLabels = inN.getOrElse(v, Array.empty[Long]).map(prev)
        if (nbrLabels.isEmpty) v -> prev(v)
        else v -> nbrLabels.groupBy(identity).view.mapValues(_.length)
          .toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    val got = Components.lpaQ(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == lab)
    // labels refine connectivity: every community sits inside one CC
    val cc = Components.connectedComponents(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.groupBy(_._2).values.foreach { members =>
      assert(members.keys.map(cc).toSet.size == 1,
        "an LPA community may never span connected components")
    }
  }

  test("r01 linkage pairs are canonical, blocked, and threshold-bounded") {
    import graft.operators.Dedup
    val rows = Dedup.r01RecordLinkage(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, d) = (r.getString(1), r.getString(2), r.getLong(3))
      assert(a < b, "canonical order")
      assert(d <= Dedup.LinkageT && d >= 1, s"distance $d out of band")
    }
    // exhaustive local check inside one block: the blocked join must find
    // EVERY within-block pair under the threshold (blocking is on brand,
    // so within-brand recall is total)
    def lev(x: String, y: String): Int = {
      val dp = Array.tabulate(x.length + 1, y.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to x.length; j <- 1 to y.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      dp(x.length)(y.length)
    }
    val recs = Tables.part(spark, Sf).select("p_brand", "p_name")
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val expect = (for {
      (ba, na) <- recs; (bb, nb) <- recs
      if ba == bb && na < nb && lev(na, nb) <= Dedup.LinkageT
    } yield (ba, na, nb)).toSet
    val got = rows.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == expect)
  }

  test("c06 temperature weights normalize and budgets never overfill") {
    import graft.operators.Corpus
    val rows = Corpus.c06TemperatureMix(spark, Sf).collect()
    assert(rows.nonEmpty)
    val wsum = rows.map(_.getDouble(2)).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to $wsum")
    rows.foreach { r =>
      assert(r.getLong(5) <= r.getLong(3), "sampled tokens exceed budget")
      assert(r.getLong(5) <= r.getLong(1), "sampled tokens exceed source size")
    }
    // sqrt temperature flattens: the largest source's weight share must
    // not exceed its raw token share
    val total = rows.map(_.getLong(1)).sum.toDouble
    val big = rows.maxBy(_.getLong(1))
    assert(big.getDouble(2) <= big.getLong(1) / total + 1e-9)
  }

  test("v06 k-means partitions every vector and sizes are consistent") {
    import graft.operators.Similarity
    val rows = Similarity.v06KmeansLloyd(spark, Sf).collect()
    val n = Tables.embeddings(spark, Sf)
      .filter(col("embedding").isNotNull).count()
    // every nonzero-norm vector appears exactly once
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    assert(rows.length.toLong <= n && rows.nonEmpty)
    // at most K clusters; per-cluster n_members matches the actual count
    val byCluster = rows.groupBy(_.getLong(1))
    assert(byCluster.size <= 4)
    byCluster.foreach { case (_, members) =>
      assert(members.map(_.getLong(2)).distinct.toSeq == Seq(members.length.toLong))
    }
  }

  test("MinHash signature agreement estimates Jaccard within LSH tolerance") {
    // identical shingle sets => identical signatures; disjoint => (almost
    // surely) different on every permutation
    import spark.implicits._
    val a = (1L to 50L).toDF("sid")
    val sigOf: Seq[Long] => Seq[Long] = ids =>
      (0 until 16).map(j => ids.map(id =>
        (TextFn.A(j) * id + TextFn.B(j)) % TextFn.P).min)
    val s1 = sigOf(1L to 50L)
    val s2 = sigOf(1L to 50L)
    val s3 = sigOf(1000L to 1050L)
    assert(s1 == s2)
    assert(s1.zip(s3).count { case (x, y) => x == y } <= 2)
  }

  test("jaro_winkler kernel: range, symmetry, identity, disjointness") {
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String) = graft.functions.JaroWinklerAlgo.jw(
      UTF8String.fromString(a), UTF8String.fromString(b))
    val str = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("abcdeXY #1é".toSeq)).map(_.mkString))
    for {
      (a, b) <- samples(Gen.zip(str, str), 400)
    } {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"range: jw($a, $b) = $s")
      assert(s == jw(b, a), s"symmetry: ($a, $b)")
      if (a.nonEmpty) assert(jw(a, a) == 1.0, s"identity: $a")
      // fully disjoint byte sets share no matches → similarity 0
      val disjoint = "zzzz" * (a.length.max(1) / 4 + 1)
      if (a.nonEmpty) assert(jw(a, disjoint.take(a.length.max(1))) == 0.0)
    }
  }

  test("gramsK(3) agrees with shingles3 on arbitrary token arrays") {
    // the t21 k-gram helper must be the k-wide generalization of the
    // established shingle primitive every dedup path builds on
    import spark.implicits._
    val gDoc = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dd", "e"))
      .map(_.mkString(" "))
    val docs = samples(gDoc, 60).zipWithIndex.map { case (t, i) => (i, t) }
    val df = docs.toDF("id", "text")
      .select(col("id"), graft.operators.TextFn.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("id"),
        graft.operators.TextOps.gramsK(col("t"), 3).as("g3"),
        graft.operators.TextFn.shingles3(col("t")).as("s3"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"id ${r.getInt(0)}")
    }
  }

  test("w18 nearest as-of matches a brute-force reference on random event sets") {
    import spark.implicits._
    val gEvents = Gen.listOfN(40, for {
      user <- Gen.choose(1, 3)
      secs <- Gen.choose(0, 500)
      typ <- Gen.frequency(4 -> Gen.const("purchase"),
        3 -> Gen.const("error"), 2 -> Gen.const("click"))
      value <- Gen.choose(1, 99)
    } yield (user.toLong, secs.toLong, typ, value.toDouble))
    samples(gEvents, 6).zipWithIndex.foreach { case (events, k) =>
      val rows = events.zipWithIndex.map { case ((u, secs, typ, v), i) =>
        (i.toLong, u, typ, v, new java.sql.Timestamp(secs * 1000L), "{}")
      }
      val dir = java.nio.file.Files.createTempDirectory(s"w18_prop_$k")
      rows.toDF("event_id", "user_id", "event_type", "value", "ts", "props")
        .write.parquet(s"$dir/events.parquet")
      val got = graft.operators.WindowOps.w18AsofNearest(spark, dir.toString)
        .collect()
        .map(r => r.getLong(0) -> (
          if (r.isNullAt(4)) None
          else Some((r.getString(4), r.getLong(5))))).toMap
      // brute-force reference: the as-of family's documented tie order —
      // at an equal timestamp an error is the BACKWARD candidate
      val byId = rows.map(r => r._1 -> r).toMap
      rows.filter(_._3 == "purchase").foreach { p =>
        val errs = rows.filter(e => e._3 == "error" && e._2 == p._2)
        val back = errs.filter(e => e._5.getTime <= p._5.getTime)
          .sortBy(e => (e._5.getTime, e._1)).lastOption
        val fwd = errs.filter(e => e._5.getTime > p._5.getTime)
          .sortBy(e => (e._5.getTime, e._1)).headOption
        val expect = (back, fwd) match {
          case (Some(b), Some(f))
            if (p._5.getTime - b._5.getTime) <= (f._5.getTime - p._5.getTime) =>
            Some(("before", (p._5.getTime - b._5.getTime) / 1000))
          case (Some(_), Some(f)) =>
            Some(("after", (f._5.getTime - p._5.getTime) / 1000))
          case (Some(b), None) =>
            Some(("before", (p._5.getTime - b._5.getTime) / 1000))
          case (None, Some(f)) =>
            Some(("after", (f._5.getTime - p._5.getTime) / 1000))
          case _ => None
        }
        assert(got(p._1) == expect, s"sample $k event ${p._1} (${byId(p._1)})")
      }
    }
  }
}
