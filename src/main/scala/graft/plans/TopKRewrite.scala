package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StructType}

import graft.functions.TopKOrdered

/** Optimizer rule (injected by [[graft.GraftExtensions]]): rewrite the
  * latest-N-per-key idiom
  *
  *   Filter(rn <= k,
  *     Window([row_number() OVER (PARTITION BY p ORDER BY o DESC...) AS rn],
  *       p, o, child))
  *
  * into the bounded [[TopKOrdered]] aggregate + posexplode. The window form
  * shuffles and sorts EVERY row of every key; the aggregate form carries at
  * most k rows per key per partition through the exchange (map-side partial
  * top-k), which is the plan you want when keys are large.
  *
  * Soundness envelope (the rule bails out otherwise):
  *   - single row_number window expression, default running frame;
  *   - the filter is exactly `rn <= k` / `rn < k+1` / `rn = 1` with literal k;
  *   - sort keys are uniformly Descending+NullsLast (top-k) or uniformly
  *     Ascending+NullsFirst (bottom-k, `asc = true`) — each direction's
  *     default null ordering; the (is-not-null, key) struct encoding
  *     reproduces it under the aggregate's order in both cases;
  *   - k ≤ maxK (buffer is O(k) per key per task);
  *   - all partition and sort-key expressions are deterministic (the rule
  *     duplicates them into the Aggregate and evaluates sort keys twice).
  * Ties beyond the sort keys are broken by the remaining child columns
  * (deterministic), where row_number's tie order is partition-dependent —
  * both are valid row_number outputs.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private val maxK = 10000

  private def matchLimit(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, IntegerType)) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  private def isDefaultRunningFrame(spec: WindowSpecDefinition): Boolean =
    spec.frameSpecification match {
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
      case UnspecifiedFrame => true
      case _ => false
    }

  /** Both default sort shapes rewrite: DESC NullsLast → top-k (descending
    * buffer), ASC NullsFirst → bottom-k (`asc = true`). The (IsNotNull, key)
    * struct encoding serves both: under descending order the true flag sorts
    * non-nulls first (NULLS LAST), under ascending order the false flag
    * sorts nulls first (NULLS FIRST) — exactly each direction's default.
    * Mixed directions or non-default null ordering bail out.
    *
    * `rank()/dense_rank() = 1` stays out of scope deliberately: rank ties
    * make the result set unbounded (all rows tying the max key), so no
    * fixed-k buffer can hold it; vanilla Spark already gives those shapes a
    * streaming per-partition group-limit (InferWindowGroupLimit →
    * WindowGroupLimitExec) which is the right plan for them.
    */
  private def uniformDirection(order: Seq[SortOrder]): Option[Boolean] =
    if (order.forall(so => so.direction == Descending && so.nullOrdering == NullsLast))
      Some(false)
    else if (order.forall(so => so.direction == Ascending && so.nullOrdering == NullsFirst))
      Some(true)
    else None

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)), part, order, child, _))
      if isDefaultRunningFrame(spec) &&
        order.nonEmpty &&
        uniformDirection(order).isDefined &&
        // non-deterministic partition/sort expressions (e.g. rand()) must not
        // be duplicated into the Aggregate or re-evaluated inside the struct —
        // the same guard Spark's InferWindowGroupLimit applies
        part.forall(_.deterministic) && order.forall(_.child.deterministic) =>
      matchLimit(cond, alias.toAttribute) match {
        case Some(k) if k > 0 && k <= maxK =>
          val asc = uniformDirection(order).get
          val rnAttr = alias.toAttribute
          // struct fields: per sort key (is-not-null flag, key) — so the
          // aggregate's descending order puts nulls last like NULLS LAST —
          // then every child column as payload/tie-break
          val ordFields: Seq[Expression] = order.zipWithIndex.flatMap { case (so, i) =>
            Seq(Literal(s"_nn$i"), IsNotNull(so.child), Literal(s"_k$i"), so.child)
          }
          val payloadFields: Seq[Expression] = child.output.flatMap { a =>
            Seq(Literal(a.name), a)
          }
          val structExpr = CreateNamedStruct(ordFields ++ payloadFields)
          val aggFunc = TopKOrdered(structExpr, Literal(k), asc)
          val topkAlias = Alias(
            AggregateExpression(aggFunc, aggregate.Complete, isDistinct = false), "_topk")()
          val agg = Aggregate(part, Seq(topkAlias), child)
          val structT = structExpr.dataType.asInstanceOf[StructType]
          val posAttr = AttributeReference("_pos", IntegerType, nullable = false)()
          val colAttr = AttributeReference("_col", structT, nullable = false)()
          val gen = Generate(PosExplode(topkAlias.toAttribute),
            unrequiredChildIndex = Seq(0), outer = false, qualifier = None,
            generatorOutput = Seq(posAttr, colAttr), agg)
          val nOrd = 2 * order.length
          val childCols = child.output.zipWithIndex.map { case (a, i) =>
            Alias(GetStructField(colAttr, nOrd + i, Some(a.name)), a.name)(exprId = a.exprId)
          }
          val rnOut = Alias(Add(posAttr, Literal(1)), rnAttr.name)(exprId = rnAttr.exprId)
          Project(childCols :+ rnOut, gen)
        case _ => f
      }
  }

  private object aggregate {
    val Complete = org.apache.spark.sql.catalyst.expressions.aggregate.Complete
  }
}
