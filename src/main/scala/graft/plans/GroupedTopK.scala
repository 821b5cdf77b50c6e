package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Per-key top-k as a NATIVE physical operator — the whole-operator
  * extension point (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`
  * via the planner hook), completing graft's extension inventory next to
  * the codegen'd `VecDot` expression and the LineProtocol DataSource V2.
  *
  * WHY an operator, not a query: Spark spells per-key top-k as
  * `row_number() OVER (PARTITION BY k ORDER BY v) <= n` — a full SORT of
  * every partition (O(n log n) comparisons, full materialization in the
  * sort buffer) to keep 3 rows per key. The right machine is a bounded
  * HEAP per key: O(n log k), no sort buffer, and — the 100 TB point — it
  * runs map-side BEFORE the shuffle too (top-k of per-partition top-ks is
  * top-k: the same associativity partial aggregation exploits), so the
  * exchange carries at most k rows per (key, input partition) instead of
  * the full table. The strategy plans partial → exchange → final
  * automatically via `requiredChildDistribution`.
  *
  * Semantics: rows ranked per group by `value` DESC with `tie` ASC as the
  * unique tie-break (the total-order determinism rule every ranked
  * operator in this repo follows); NULL values are excluded. Output order
  * within/across groups is unspecified — callers order, as after any
  * aggregate. Column pruning: the node passes `child.output` through, so
  * project the input to needed columns BEFORE wrapping (the builder does
  * not re-derive prunability through an opaque node).
  *
  * The `rank() <= k` sibling (boundary ties kept, no tie column) is
  * [[RankTopKNode]] below, matched from SQL by [[TopKRewriteRule]].
  */
object GroupedTopK {

  /** Partial-pass safety valve: the map-side pass tracks at most this many
    * distinct groups per input partition; past it, rows of UNSEEN groups
    * stream through unfiltered (the partial pass is only an optimization —
    * the post-shuffle final pass, whose group count per partition is
    * 1/numPartitions of the key space, remains exact). Bounds partial-pass
    * memory at cap·k rows on high-cardinality keys instead of groups·k
    * (the round-4 advice's unbounded case).
    */
  val PartialGroupCap: Int = 1 << 16

  private[plans] def resolveAttr(df: DataFrame, n: String): Attribute = {
    val analyzed = df.queryExecution.analyzed
    val resolver = df.sparkSession.sessionState.conf.resolver
    analyzed.output.filter(a => resolver(a.name, n)) match {
      case Seq(a) => a
      case Seq() => throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(",")}")
      case many => throw new IllegalArgumentException(
        s"column $n is ambiguous: matches ${many.map(_.name).mkString(",")}" +
          " — disambiguate the input projection first")
    }
  }

  /** Wrap `df` in the operator. `valueCol` must be DOUBLE, `tieCol` LONG
    * and unique within each group (typed narrowly on purpose — this is an
    * operator demo, not a framework; widening to any ordered type is
    * mechanical). Columns resolve with the session's case-sensitivity
    * setting; a name matching twice (self-join residue) throws instead of
    * silently binding the first occurrence.
    *
    * Id-magnitude note (the keepMinK pattern: `value = tie.cast(double)`,
    * used by mm04b, g22's caps, x05): ids past 2^53 collapse in the
    * double cast, but the composite heap order `(value, tie)` stays
    * EXACT anyway — long→double is monotone (a < b ⟹ (double) a ≤
    * (double) b), so any two ids the cast collapses are resolved by the
    * exact long tie compare, and keep-smallest-K by `(double(id), id)`
    * equals keep-smallest-K by `id` at every magnitude
    * (GroupedTopKSpec pins this with colliding ids near Long.MaxValue).
    * [[rank]] has NO tie column, so there the caller's value must be
    * exactly representable — its call sites rank by genuine doubles.
    */
  def apply(df: DataFrame, groupCols: Seq[String], valueCol: String,
      tieCol: String, k: Int, descending: Boolean = true): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(groupCols.nonEmpty, // ClusteredDistribution(Nil) is rejected by
      "grouped top-k needs group columns; use orderBy+limit for global top-k")
    val s = df.sparkSession
    GraftBridge.addStrategy(s, GroupedTopKStrategy)
    val v = resolveAttr(df, valueCol)
    require(v.dataType == DoubleType, s"$valueCol must be double")
    val t = resolveAttr(df, tieCol)
    require(t.dataType == LongType, s"$tieCol must be long")
    GraftBridge.ofRows(s, GroupedTopKNode(groupCols.map(resolveAttr(df, _)),
      v, t, k, descending, df.queryExecution.analyzed))
  }

  /** Per-key `rank() <= k` (ties at the k-th boundary KEPT — output may
    * exceed k rows per group; that is rank's contract). Value-only order.
    */
  def rank(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int, descending: Boolean = true,
      distinctValues: Boolean = false): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(groupCols.nonEmpty,
      "grouped top-k needs group columns; use orderBy+limit for global top-k")
    val s = df.sparkSession
    GraftBridge.addStrategy(s, GroupedTopKStrategy)
    val v = resolveAttr(df, valueCol)
    require(v.dataType == DoubleType, s"$valueCol must be double")
    GraftBridge.ofRows(s, RankTopKNode(groupCols.map(resolveAttr(df, _)),
      v, k, descending, df.queryExecution.analyzed, distinctValues))
  }

  /** w13 — registered query: top-3 orders by total per priority through
    * the native operator; the oracle is the definitional `row_number`
    * window spelling (which is also what `GroupedTopKSpec` diffs against
    * in-engine).
    */
  def w13GroupedTopk(s: SparkSession, dir: String): DataFrame = {
    val base = graft.Tables.orders(s, dir)
      .select(col("o_orderpriority").as("priority"),
        col("o_orderkey"), col("o_totalprice"))
    GroupedTopK(base, Seq("priority"), "o_totalprice", "o_orderkey", 3)
      .orderBy(col("priority"), col("o_totalprice").desc, col("o_orderkey"))
  }

  /** w14 — the SAME top-3-per-priority result, but written the way an
    * analyst writes it (`row_number` window + filter + drop) with
    * [[TopKRewriteRule]] active: the optimizer swaps in the native
    * operator, and the driver's oracle gate hash-compares the rewritten
    * plan's output against the definitional SQL — rewrite-correctness
    * proven by the same machinery as every other operator, not by a
    * bespoke test alone.
    */
  def w14TopkRewrite(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    GraftBridge.addStrategy(s, GroupedTopKStrategy)
    GraftBridge.addOptimization(s, TopKRewriteRule)
    val w = Window.partitionBy("priority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    graft.Tables.orders(s, dir)
      .select(col("o_orderpriority").as("priority"),
        col("o_orderkey"), col("o_totalprice"))
      // the not-null proof the rewrite demands (parquet columns are
      // nullable by schema even when the data carries no nulls)
      .filter(col("o_totalprice").isNotNull && col("o_orderkey").isNotNull)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") <= 3)
      .drop("rn")
      .orderBy(col("priority"), col("o_totalprice").desc, col("o_orderkey"))
  }

  /** w15 — the `rank() <= k` spelling (the second-most-common top-k SQL),
    * rewritten to [[RankTopKNode]]'s tie-admitting heap: boundary ties are
    * KEPT, exactly as `rank` defines — which is why this is a distinct
    * operator from w13/w14's exactly-k row_number machine. Oracle is the
    * definitional rank window SQL.
    */
  def w15RankRewrite(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    GraftBridge.addStrategy(s, GroupedTopKStrategy)
    GraftBridge.addOptimization(s, TopKRewriteRule)
    val w = Window.partitionBy("priority").orderBy(col("o_totalprice").desc)
    graft.Tables.orders(s, dir)
      .select(col("o_orderpriority").as("priority"),
        col("o_orderkey"), col("o_totalprice"))
      .filter(col("o_totalprice").isNotNull)
      .withColumn("rk", org.apache.spark.sql.functions.rank().over(w))
      .filter(col("rk") <= 3)
      .drop("rk")
      .orderBy(col("priority"), col("o_totalprice").desc, col("o_orderkey"))
  }

  private val w13Sql =
    """SELECT priority, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority AS priority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY priority, o_totalprice DESC, o_orderkey""".stripMargin

  private val w15Sql =
    """SELECT priority, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority AS priority, o_orderkey, o_totalprice,
      |    rank() OVER (PARTITION BY o_orderpriority
      |                 ORDER BY o_totalprice DESC) AS rk
      |  FROM orders) t
      |WHERE rk <= 3
      |ORDER BY priority, o_totalprice DESC, o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w13_grouped_topk" -> (w13GroupedTopk _),
    "w14_topk_rewrite" -> (w14TopkRewrite _),
    "w15_rank_topk" -> (w15RankRewrite _))

  val oracles: Map[String, String] = Map(
    "w13_grouped_topk" -> w13Sql,
    "w14_topk_rewrite" -> w13Sql, // definitionally the same answer
    "w15_rank_topk" -> w15Sql)
}

/** Logical marker node: output = child.output, rows filtered to the
  * per-group top k. Built already-resolved (attributes taken from the
  * analyzed child), so the analyzer passes it through untouched.
  */
case class GroupedTopKNode(groupAttrs: Seq[Attribute], valueAttr: Attribute,
    tieAttr: Attribute, k: Int, descending: Boolean,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopKNode =
    copy(child = newChild)
}

/** Logical marker for `rank() <= k` semantics: per group, keep every row
  * whose count of strictly-stronger rows is < k — boundary ties admitted
  * whole, so output can exceed k rows per group (that IS rank's return
  * set; `row_number`'s exactly-k is [[GroupedTopKNode]]).
  *
  * `distinctValues = true` additionally collapses equal-VALUED rows
  * within a group to one (keep-first): per group, the k smallest/largest
  * DISTINCT values. Only meaningful when (group, value) determines the
  * row — the KMV sketch build (c15b) is the caller, where rows are
  * exactly (source, hash). The win is in the PARTIAL pass: local
  * distinct-bottom-k makes the pre-shuffle volume k-bounded per (input
  * partition × group) instead of requiring a corpus-wide distinct()
  * exchange before the operator (a value in the global distinct bottom-k
  * is locally distinct in every partition holding it, with local
  * distinct-rank <= its global distinct-rank, so no survivor is dropped —
  * the same associativity argument as plain rank-top-k).
  */
case class RankTopKNode(groupAttrs: Seq[Attribute], valueAttr: Attribute,
    k: Int, descending: Boolean, child: LogicalPlan,
    distinctValues: Boolean = false) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): RankTopKNode =
    copy(child = newChild)
}

/** Planner rule: partial (pre-shuffle) → final (post-shuffle) pair, the
  * exchange inserted by EnsureRequirements from the final's
  * ClusteredDistribution requirement — exactly how partial aggregation
  * plans, because it IS the same trick (top-k is associative; rank-top-k
  * too: a row's strictly-stronger set in any subset is contained in its
  * global one, so local rank <= global rank and no survivor is dropped).
  */
object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKNode(g, v, t, k, desc, child) =>
      GroupedTopKExec(g, v, t, k, desc, partial = false,
        GroupedTopKExec(g, v, t, k, desc, partial = true,
          planLater(child))) :: Nil
    case RankTopKNode(g, v, k, desc, child, dv) =>
      RankTopKExec(g, v, k, desc, partial = false,
        RankTopKExec(g, v, k, desc, partial = true,
          planLater(child), distinctValues = dv), distinctValues = dv) :: Nil
    case _ => Nil
  }
}

/** Shared shape of the two top-k passes: stream the child, absorb rows
  * into per-group bounded state, emit pass-through rows IMMEDIATELY when
  * the partial pass hits [[GroupedTopK.PartialGroupCap]] unseen groups,
  * then drain the kept rows after input exhausts. One iterator, no
  * buffering of pass-through rows.
  */
private[plans] abstract class TopKPassIterator(
    iter: Iterator[InternalRow], partial: Boolean) extends Iterator[InternalRow] {
  /** Absorb `row` into state; return true if absorbed, false if the row
    * belongs to an untracked group (cap hit) and must pass through. */
  protected def absorb(row: InternalRow): Boolean
  protected def drain(): Iterator[InternalRow]

  private var pass: InternalRow = _
  private var tail: Iterator[InternalRow] = _
  private def advance(): Unit = {
    while (pass == null && iter.hasNext) {
      val row = iter.next()
      if (!absorb(row)) pass = row
    }
    if (pass == null && tail == null && !iter.hasNext) tail = drain()
  }
  override def hasNext: Boolean = {
    advance(); pass != null || tail.hasNext
  }
  override def next(): InternalRow = {
    advance()
    if (pass != null) { val r = pass; pass = null; r } else tail.next()
  }
}

/** Bounded-heap per-key top-k pass. partial=true runs on whatever
  * partitioning the child has (map-side); partial=false demands
  * co-location by group key. Per partition: one hash map of ≤k-element
  * min-heaps keyed by the group projection — O(rows·log k), memory
  * O(min(groups, cap)·k): the partial pass stops tracking NEW groups past
  * [[GroupedTopK.PartialGroupCap]] and streams their rows through (the
  * final pass stays exact — its per-partition group count is the key
  * space over the shuffle fan-out, and correctness needs no partial).
  */
case class GroupedTopKExec(groupAttrs: Seq[Attribute], valueAttr: Attribute,
    tieAttr: Attribute, k: Int, descending: Boolean, partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // row-filtering operator: partitioning survives (the final pass sits on
  // the group-key hash partitioning, so a downstream groupBy/join on the
  // same keys plans WITHOUT another exchange)
  override def outputPartitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupAttrs))

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val (g, v, t, kk, desc, part) = (groupAttrs, valueAttr, tieAttr, k, descending, partial)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, childOutput)
      val vBound = BindReferences.bindReference(v: Expression, childOutput)
      val tBound = BindReferences.bindReference(t: Expression, childOutput)
      // strength = Spark's OWN double total order (java Double.compare:
      // NaN above +Inf, -0.0 below 0.0 — primitive >/== would diverge
      // from the row_number sort on exactly those values), flipped for
      // ascending; ties: smaller tie key is stronger. Head of the heap =
      // WEAKEST kept row, so one comparison decides admission.
      val stronger: ((Double, Long), (Double, Long)) => Boolean = {
        case ((av, at), (bv, bt)) =>
          val c0 = java.lang.Double.compare(av, bv)
          val c = if (desc) c0 else -c0
          c > 0 || (c == 0 && at < bt)
      }
      val weakestFirst: Ordering[(Double, Long, InternalRow)] =
        new Ordering[(Double, Long, InternalRow)] {
          override def compare(a: (Double, Long, InternalRow),
              b: (Double, Long, InternalRow)): Int =
            if (stronger((a._1, a._2), (b._1, b._2))) -1
            else if (stronger((b._1, b._2), (a._1, a._2))) 1
            else 0
        }
      val heaps = mutable.HashMap.empty[UnsafeRow,
        mutable.PriorityQueue[(Double, Long, InternalRow)]]
      new TopKPassIterator(iter, part) {
        override protected def absorb(row: InternalRow): Boolean = {
          val raw = vBound.eval(row)
          if (raw == null) return true // NULL values excluded by contract
          val value = raw.asInstanceOf[Double]
          val tie = tBound.eval(row).asInstanceOf[Long]
          // look up with the projection's REUSED row; copy the key only on
          // first insert — the common case (group present, row rejected)
          // must not allocate
          val key = keyProj(row)
          val heap = heaps.get(key) match {
            case Some(h) => h
            case None =>
              if (part && heaps.size >= GroupedTopK.PartialGroupCap)
                return false // untracked group: stream through to the final
              val h = mutable.PriorityQueue.empty(weakestFirst)
              heaps.put(key.copy(), h)
              h
          }
          if (heap.size < kk) heap.enqueue((value, tie, row.copy()))
          else if (stronger((value, tie), (heap.head._1, heap.head._2))) {
            heap.dequeue()
            heap.enqueue((value, tie, row.copy()))
          }
          true
        }
        override protected def drain(): Iterator[InternalRow] =
          heaps.valuesIterator.flatMap(
            _.dequeueAll[(Double, Long, InternalRow)].iterator.map(_._3))
      }
    }, preservesPartitioning = true)
  }
}

/** Tie-admitting per-key rank-top-k pass: keeps every row whose count of
  * strictly-stronger rows is < k (`rank() <= k`). Per group: an ordered
  * map value → rows, pruned from the weak end while dropping the weakest
  * bucket still leaves >= k rows — so the boundary-tie bucket always
  * survives whole. Memory O(k + boundary-tie width) rows per group, the
  * inherent minimum for rank semantics; same partial/final split and
  * partial-pass group cap as [[GroupedTopKExec]].
  */
case class RankTopKExec(groupAttrs: Seq[Attribute], valueAttr: Attribute,
    k: Int, descending: Boolean, partial: Boolean,
    child: SparkPlan, distinctValues: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupAttrs))

  override protected def withNewChildInternal(newChild: SparkPlan): RankTopKExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val (g, v, kk, desc, part) = (groupAttrs, valueAttr, k, descending, partial)
    val dv = distinctValues
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, childOutput)
      val vBound = BindReferences.bindReference(v: Expression, childOutput)
      // java.lang.Double natural order IS Double.compare's total order
      // (NaN top, -0.0 < 0.0) — the same order the window sort uses.
      // The map is kept ascending; the WEAK end is the head for DESC
      // mode, the tail for ASC.
      final class Group {
        val buckets = new java.util.TreeMap[java.lang.Double,
          mutable.ArrayBuffer[InternalRow]]()
        var total = 0
        def weakKey: java.lang.Double =
          if (desc) buckets.firstKey() else buckets.lastKey()
        def add(value: Double, row: InternalRow): Unit = {
          // distinct-values mode: a value already held is a duplicate row
          // (keep-first) — this is what makes the PARTIAL pass a local
          // distinct-bottom-k and spares the caller a corpus-wide
          // distinct() exchange (see the node scaladoc)
          if (dv && buckets.containsKey(value)) return
          // reject only rows strictly weaker than the weakest kept value
          // once >= k rows are held — equal-valued rows share a rank, so
          // they are admitted (tie-admitting)
          if (total >= kk) {
            val c = java.lang.Double.compare(value, weakKey.doubleValue())
            if (if (desc) c < 0 else c > 0) return
          }
          buckets.computeIfAbsent(value, _ => mutable.ArrayBuffer.empty)
            .append(row.copy())
          total += 1
          // prune: drop the weakest bucket while the rest still holds >= k
          // rows (rows in a dropped bucket had >= k strictly-stronger rows
          // → rank > k; the surviving weakest bucket's rank <= k)
          var weak = buckets.get(weakKey)
          while (total - weak.size >= kk) {
            buckets.remove(weakKey)
            total -= weak.size
            weak = buckets.get(weakKey)
          }
        }
      }
      val groups = mutable.HashMap.empty[UnsafeRow, Group]
      new TopKPassIterator(iter, part) {
        override protected def absorb(row: InternalRow): Boolean = {
          val raw = vBound.eval(row)
          if (raw == null) return true // NULL values excluded by contract
          val value = raw.asInstanceOf[Double]
          val key = keyProj(row)
          val grp = groups.get(key) match {
            case Some(x) => x
            case None =>
              if (part && groups.size >= GroupedTopK.PartialGroupCap)
                return false
              val x = new Group
              groups.put(key.copy(), x)
              x
          }
          grp.add(value, row)
          true
        }
        override protected def drain(): Iterator[InternalRow] =
          groups.valuesIterator.flatMap { grp =>
            import scala.jdk.CollectionConverters._
            grp.buckets.values().asScala.iterator.flatten
          }
      }
    }, preservesPartitioning = true)
  }
}
