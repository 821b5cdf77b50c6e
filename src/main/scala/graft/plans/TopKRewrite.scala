package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, IntegerLiteral, IsNotNull, LessThan, LessThanOrEqual, Rank, RowNumber, SortOrder, WindowExpression, WindowSpecDefinition, Ascending, Descending}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: recognize the analyst's `row_number() OVER
  * (PARTITION BY g ORDER BY v DESC, tie) <= k` and `rank() OVER
  * (PARTITION BY g ORDER BY v DESC) <= k` spellings and swap in the
  * native top-k operators — users keep writing the idiomatic window
  * SQL, the engine substitutes the bounded-heap operator (no per-partition
  * sort, map-side partial before the exchange). The fourth extension
  * point in graft's inventory: expression (VecDot) → source (LineProtocol
  * DSv2) → planner strategy (GroupedTopK) → now a `Rule[LogicalPlan]`.
  *
  * The match is deliberately NARROW — exactly the shapes whose semantics
  * the operators reproduce bit-for-bit, nothing speculative:
  *   - `Project(p, Filter(rn <= k, Window(fn over (PARTITION BY attrs
  *     ORDER BY ...))))` where fn is `row_number` (order: v:double
  *     [ASC|DESC], tie:long ASC → [[GroupedTopKNode]], exactly k rows) or
  *     `rank` (order: v:double [ASC|DESC] alone → [[RankTopKNode]],
  *     boundary ties kept — the tie-admitting heap);
  *   - the projection must NOT reference the rank column (it is consumed
  *     by the filter and dropped — the usual `.drop("rn")` shape);
  *   - `dense_rank`/`percent_rank`/`ntile` never match — their return
  *     sets aren't expressible as a bounded per-group heap (dense_rank
  *     admits unboundedly many rows across distinct values; percent_rank
  *     needs the full group count) — no match, no rewrite, no risk;
  *   - a NON-EMPTY partition spec (a global top-k would plan
  *     `ClusteredDistribution(Nil)`, which Spark rejects — and Spark's
  *     own TakeOrderedAndProject already owns that case);
  *   - ordering columns provably NON-NULL at the window input (the
  *     child's propagated constraints carry `IsNotNull`, e.g. from an
  *     upstream filter): the operators drop NULL-valued rows while
  *     window ranking orders them last, so on nullable-without-constraint
  *     inputs the two differ whenever a group has nulls and fewer than
  *     k non-null rows — no proof, no rewrite.
  * Spark's own InferWindowGroupLimit may already have wedged a
  * `WindowGroupLimit` under the Window (its limit-aware-sort
  * optimization); the rewrite strips it ONLY after verifying it is the
  * one implied by this very filter — same rank function shape, partition
  * and order specs semantically equal to the matched window spec, and
  * limit >= k (a stricter or unrelated group limit changes the row set,
  * so stripping it would be wrong — in that case the whole rewrite is
  * skipped, per the round-4 advice).
  *
  * Registered via `GraftExtensions` (injectOptimizerRule) and the
  * `experimental.extraOptimizations` hook (both run AFTER the main
  * optimizer batches, so the pattern is in its final shape when matched).
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList, Filter(cond, w: Window)) =>
      rewrite(cond, w).map(Project(projectList, _)) match {
        case Some(next)
          if projectList.forall(_.references.subsetOf(next.child.outputSet)) =>
          next
        case _ => p
      }
  }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] = {
    // one window expression: rn = row_number()/rank() over (p ORDER BY o)
    val (fn, rnAttr, part, order) = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(f @ (_: RowNumber | _: Rank),
          WindowSpecDefinition(p, o, _)), _)) =>
        (f, a.toAttribute, p, o)
      case _ => return None
    }
    // filter: rn <= k (or rn < k+1) against an integer literal
    val k = cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(n))
        if a.semanticEquals(rnAttr) => n
      case LessThan(a: Attribute, IntegerLiteral(n))
        if a.semanticEquals(rnAttr) => n - 1
      case _ => return None
    }
    if (k <= 0) return None
    val groupAttrs = part.map {
      case a: AttributeReference => a
      case _ => return None
    }
    if (groupAttrs.isEmpty) return None // global top-k: not our operator
    // strip Spark's own InferWindowGroupLimit insert — subsumed by the
    // heap, but ONLY when provably the limit implied by this filter:
    // same rank function shape, semantically equal specs, limit >= k.
    // Anything else (the rule is installed session-wide) must survive;
    // since the node can't sit under our operator, skip the rewrite.
    val child = w.child match {
      case wgl @ WindowGroupLimit(wp, wo, wfn, limit, grandchild) =>
        val sameFn = (fn, wfn) match {
          case (_: RowNumber, _: RowNumber) => true
          case (_: Rank, _: Rank)           => true
          case _                            => false
        }
        val sameSpec = wp.length == part.length && wo.length == order.length &&
          wp.zip(part).forall { case (x, y) => x.semanticEquals(y) } &&
          wo.zip(order).forall { case (x, y) => x.semanticEquals(y) }
        if (sameFn && sameSpec && limit >= k) grandchild
        else return None
      case c => c
    }
    // NULL-safety proof: the heap drops NULL values, window ranking
    // orders them — only equivalent when nulls provably cannot reach
    def provedNotNull(a: Attribute): Boolean = !a.nullable ||
      child.constraints.exists(_.semanticEquals(IsNotNull(a)))
    fn match {
      case _: RowNumber =>
        // ORDER BY v:double ASC|DESC, tie:long ASC over plain attributes
        // (the exec's typed contract; the unique tie makes exactly-k safe)
        val (v, tie, desc) = order match {
          case Seq(SortOrder(v: AttributeReference, Descending, _, _),
                   SortOrder(t: AttributeReference, Ascending, _, _))
            if v.dataType == DoubleType && t.dataType == LongType =>
            (v, t, true)
          case Seq(SortOrder(v: AttributeReference, Ascending, _, _),
                   SortOrder(t: AttributeReference, Ascending, _, _))
            if v.dataType == DoubleType && t.dataType == LongType =>
            (v, t, false)
          case _ => return None
        }
        if (!provedNotNull(v) || !provedNotNull(tie)) return None
        Some(GroupedTopKNode(groupAttrs, v, tie, k, desc, child))
      case _: Rank =>
        // ORDER BY v:double ASC|DESC alone — rank() ties share a rank, so
        // the boundary group is admitted whole (RankTopK's tie-admitting
        // semantics). A multi-column order would need a lexicographic
        // comparator the exec doesn't carry — no match.
        val (v, desc) = order match {
          case Seq(SortOrder(v: AttributeReference, Descending, _, _))
            if v.dataType == DoubleType => (v, true)
          case Seq(SortOrder(v: AttributeReference, Ascending, _, _))
            if v.dataType == DoubleType => (v, false)
          case _ => return None
        }
        if (!provedNotNull(v)) return None
        Some(RankTopKNode(groupAttrs, v, k, desc, child))
      case _ => None
    }
  }
}
