package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, MapType, StructType}

/**
 * Optimizer rule: rewrite the standard per-key top-k idiom
 *
 *   `row_number().over(partitionBy(p).orderBy(o)) <= k`  (Filter over Window)
 *
 * into the heap-based [[TopKPerKey]] operator — so EVERY query written the
 * ordinary DataFrame/SQL way gets the O(n log k) no-sort plan, not just
 * callers of [[TopK.perKey]]. This is the (c)-tier extension mechanism from
 * SURVEY.md §7.3 completed: custom logical node + strategy + physical
 * operator + a `Rule[LogicalPlan]` that retargets existing query shapes,
 * all registered through [[GraftExtensions]] / [[TopK.install]].
 *
 * Matches conservatively:
 *  - the Window computes EXACTLY ONE expression: `row_number()` with the
 *    default running frame and a non-empty PARTITION BY;
 *  - some conjunct of the Filter bounds that rank attribute from above
 *    (`rnk <= k` / `rnk < k` / reversed); remaining conjuncts stay as a
 *    residual Filter on top;
 *  - an all-attribute Project between Filter and Window (column pruning's
 *    footprint) is preserved above the rewrite.
 * Anything else (rank used elsewhere, other window functions alongside,
 * RANK()'s tie semantics, global top-k with empty PARTITION BY) is left to
 * Spark's stock Window execution.
 */
object TopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** `e` as an upper bound on `rnk`: Some(k) if it forces rnk ≤ k. */
  private def rankLimit(e: Expression, rnk: Attribute): Option[Int] = e match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType))
      if a.semanticEquals(rnk) => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, IntegerType))
      if a.semanticEquals(rnk) => Some(v - 1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rnk) => Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rnk) => Some(v - 1)
    case EqualTo(a: Attribute, Literal(1, IntegerType))
      if a.semanticEquals(rnk) => Some(1)
    case _ => None
  }

  /** Float/double (incl. nested) partition keys are skipped: the stock Window
    * path normalizes -0.0/0.0 and NaN bit patterns (NormalizeFloatingNumbers)
    * before hashing, and TopKPerKeyExec's raw UnsafeRow grouping would treat
    * them as distinct keys, emitting up to 2k rows for one logical key. */
  private def containsFloating(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType => true
    case s: StructType => s.fields.exists(f => containsFloating(f.dataType))
    case a: ArrayType => containsFloating(a.elementType)
    case m: MapType => containsFloating(m.keyType) || containsFloating(m.valueType)
    case _ => false
  }

  private def rowNumberWindow(w: Window): Option[(Alias, Seq[Expression], Seq[SortOrder])] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(part, order,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _))
        if part.nonEmpty && order.nonEmpty &&
          !part.exists(e => containsFloating(e.dataType)) => Some((a, part, order))
      case _ => None
    }

  private def rewriteFilter(cond: Expression, w: Window): Option[LogicalPlan] =
    rowNumberWindow(w).flatMap { case (alias, part, order) =>
      val rnk = alias.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val limits = conjuncts.flatMap(c => rankLimit(c, rnk))
      if (limits.isEmpty) None
      else if (limits.min <= 0) {
        // `rnk <= 0` is legal and empty under stock Spark; TopKPerKeyExec
        // would crash on heap.head with k <= 0 (Spark's own
        // InferWindowGroupLimit guards limit > 0 for the same reason).
        Some(LocalRelation(w.output))
      } else {
        val residual = conjuncts.filter(c => rankLimit(c, rnk).isEmpty)
        val rankAttr = AttributeReference(alias.name, IntegerType,
          nullable = false)(exprId = alias.exprId)
        // Spark's own InferWindowGroupLimit may already have planted a
        // (sort-based) WindowGroupLimit below the Window; TopKPerKey computes
        // the exact top-k itself, so strip it — otherwise its required sort
        // survives under our sort-free operator.
        val input = w.child match {
          case wgl: WindowGroupLimit => wgl.child
          case other => other
        }
        val topk = TopKPerKey(limits.min, part, order, rankAttr, input)
        Some(if (residual.isEmpty) topk else Filter(residual.reduce(And), topk))
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case f @ Filter(cond, w: Window) =>
      rewriteFilter(cond, w).getOrElse(f)
    case f @ Filter(cond, p @ Project(projList, w: Window))
      if projList.forall(_.isInstanceOf[AttributeReference]) =>
      rewriteFilter(cond, w)
        .map(rewritten => Project(projList, rewritten))
        .getOrElse(f)
  }
}

/** Idempotent session-level registration for the rule (the strategy is
  * installed by [[TopK.install]]; [[GraftExtensions]] wires both). */
object TopKRewriteInstaller {
  def install(spark: SparkSession): Unit = {
    TopK.install(spark)
    if (!spark.experimental.extraOptimizations.contains(TopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewrite
  }
}
