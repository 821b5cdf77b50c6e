package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, IntegerLiteral, IsNotNull, LessThan, LessThanOrEqual, RowNumber, SortOrder, WindowExpression, WindowSpecDefinition, Ascending, Descending}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: recognize the analyst's `row_number() OVER
  * (PARTITION BY g ORDER BY v DESC, tie) <= k` spelling and swap in the
  * native [[GroupedTopKNode]] — users keep writing the idiomatic window
  * SQL, the engine substitutes the bounded-heap operator (no per-partition
  * sort, map-side partial before the exchange). The fourth extension
  * point in graft's inventory: expression (VecDot) → source (LineProtocol
  * DSv2) → planner strategy (GroupedTopK) → now a `Rule[LogicalPlan]`.
  *
  * The match is deliberately NARROW — exactly the shape whose semantics
  * the operator reproduces bit-for-bit, nothing speculative:
  *   - `Project(p, Filter(rn <= k, Window(row_number over
  *     (PARTITION BY attrs ORDER BY v:double [ASC|DESC], tie:long ASC))))`
  *   - the projection must NOT reference the rank column (it is consumed
  *     by the filter and dropped — the usual `.drop("rn")` shape);
  *   - ONLY `row_number` (exactly k rows per group, like the heap) —
  *     `rank`/`dense_rank` over-return on boundary ties, so rewriting
  *     them would be wrong unless tie-uniqueness were provable; no
  *     match, no rewrite, no risk;
  *   - a NON-EMPTY partition spec (a global top-k would plan
  *     `ClusteredDistribution(Nil)`, which Spark rejects — and Spark's
  *     own TakeOrderedAndProject already owns that case);
  *   - value and tie provably NON-NULL at the window input (the child's
  *     propagated constraints carry `IsNotNull` for both, e.g. from an
  *     upstream filter): the operator drops NULL-valued rows while
  *     `row_number` ranks them last, so on nullable-without-constraint
  *     inputs the two differ whenever a group has nulls and fewer than
  *     k non-null rows — no proof, no rewrite.
  * Spark's own InferWindowGroupLimit may already have wedged a
  * `WindowGroupLimit` under the Window (its limit-aware-sort
  * optimization); the rewrite strips it — the heap operator subsumes it.
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
    val (rnAttr, part, order) = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(p, o, _)), _)) =>
        (a.toAttribute, p, o)
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
    // ORDER BY v:double ASC|DESC, tie:long ASC over plain attributes;
    // partition keys plain attributes too (the exec's typed contract)
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
    val groupAttrs = part.map {
      case a: AttributeReference => a
      case _ => return None
    }
    if (groupAttrs.isEmpty) return None // global top-k: not our operator
    // strip Spark's own InferWindowGroupLimit insert — subsumed by the heap
    val child = w.child match {
      case WindowGroupLimit(_, _, _, _, grandchild) => grandchild
      case c => c
    }
    // NULL-safety proof: the heap drops NULL values, row_number ranks them
    // — only equivalent when nulls provably cannot reach the window
    def provedNotNull(a: Attribute): Boolean = !a.nullable ||
      child.constraints.exists(_.semanticEquals(IsNotNull(a)))
    if (!provedNotNull(v) || !provedNotNull(tie)) return None
    Some(GroupedTopKNode(groupAttrs, v, tie, k, desc, child))
  }
}
