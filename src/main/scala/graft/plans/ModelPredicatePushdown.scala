package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.DoubleType

import graft.functions.DistScalar

/** Optimizer rule: fold monotone model predicates into column ranges.
  *
  * A filter like "keep rows inside the fitted model's central 90%" is
  * naturally written against the CDF:
  *
  * {{{ df.where(dist_cdf('expon', params, x) between (0.05, 0.95)) }}}
  *
  * As written, that predicate evaluates a CodegenFallback scalar per row
  * and — far worse at 100 TB — pushes NOTHING to the parquet scan: every
  * row group is read and decoded. But a continuous CDF with foldable
  * (name, params) is a nondecreasing function of x, strictly increasing
  * on its support, so for q ∈ (0, 1):
  *
  *   cdf(x) ≥ q  ⇔  x ≥ ppf(q)      cdf(x) ≤ q  ⇔  x ≤ ppf(q)
  *
  * This rule computes `ppf(q)` ONCE on the driver and rewrites the
  * comparison into a plain range on x, which then reaches the scan as a
  * `PushedFilters` entry and prunes row groups by their min/max stats —
  * the standard monotone-function predicate folding databases do, applied
  * to the fitted-model surface. Within a Filter condition the rewrite is
  * applied only to comparisons reachable from the root through And/Or —
  * the positions where null ≡ false holds (see [[rewrite]]).
  *
  * Exactness: the rewrite holds exactly for continuous families (the CDF
  * is continuous, and strictly increasing wherever 0 < cdf < 1), up to
  * the cdf/ppf inverse-pair round-trip error (≤ a few ULPs — the same
  * tolerance any cross-engine double comparison already carries). It
  * fires only inside Filter CONDITIONS (see [[apply]] — in filters,
  * null and false both drop the row, so the rewrite is invisible;
  * value-producing contexts keep the row-wise expression), and only
  * when kind == "cdf", name and params are foldable and resolve to a
  * registered continuous family with a positive scale, and the
  * threshold is a foldable double strictly inside (0, 1) — boundary
  * thresholds (q = 0, 1) keep the row-wise evaluation, as do discrete
  * families (their PMF steps break strict monotonicity at the cut).
  *
  * Null semantics are preserved: a null x nulls both the original
  * predicate and the rewritten comparison; an unresolvable name leaves
  * the expression untouched. NaN x needs care: `dist_cdf(.., NaN)`
  * evaluates to null (DistScalar nulls non-finite results) so the
  * row-wise filter drops the row, but Spark's total ordering places NaN
  * above every double, so a bare `x >= ppf(q)` would KEEP it. The
  * greater-than rewrites therefore conjoin `NOT isnan(x)` — NaN rows
  * evaluate to false (filter-equivalent to the original null), and null
  * rows still null the conjunction. The less-than forms need no guard
  * (`NaN <= c` is already false).
  *
  * Installed automatically by [[graft.GraftExtensions]]
  * (`injectOptimizerRule`), or on an existing session via [[install]].
  */
object ModelPredicatePushdown extends Rule[LogicalPlan] {

  /** Idempotently add the rule to a session built without extensions. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  private def foldableDouble(e: Expression): Option[Double] = e match {
    case Literal(v: Double, DoubleType) => Some(v)
    case _ if e.foldable && e.dataType == DoubleType =>
      Option(e.eval(null)).map(_.asInstanceOf[Double])
    case _ => None
  }

  /** ppf(q) for a foldable-cdf DistScalar, if the rewrite applies. */
  private def cutoff(d: DistScalar, q: Double): Option[Double] = {
    if (d.kind != "cdf" || !(q > 0.0 && q < 1.0)) return None
    if (!d.nameExpr.foldable || !d.paramsExpr.foldable) return None
    val nameV = d.nameExpr.eval(null)
    val paramsV = d.paramsExpr.eval(null)
    if (nameV == null || paramsV == null) return None
    val arr = paramsV.asInstanceOf[ArrayData]
    val pa = new Array[Double](arr.numElements())
    var i = 0
    while (i < pa.length) {
      if (arr.isNullAt(i)) return None
      pa(i) = arr.getDouble(i)
      i += 1
    }
    d.custom.get(nameV.toString)
      .orElse(graft.dists.DistRegistry.get(nameV.toString))
      .flatMap { dist =>
        if (pa.length != dist.numParams || dist.scale(pa) <= 0.0) None
        else {
          val v = dist.ppf(q, pa)
          if (java.lang.Double.isFinite(v)) Some(v) else None
        }
      }
  }

  /** `x >[=] c AND NOT isnan(x)` — Spark orders NaN above every double,
    * so without the guard a greater-than rewrite would keep NaN rows the
    * row-wise cdf (which nulls on NaN) dropped. Null x still nulls the
    * conjunction (`null >= c` is null), matching the original.
    */
  private def nanSafeGreater(x: Expression, c: Double, strict: Boolean): Expression = {
    val cmp: Expression =
      if (strict) GreaterThan(x, Literal(c)) else GreaterThanOrEqual(x, Literal(c))
    And(cmp, Not(IsNaN(x)))
  }

  /** The rewrite fires ONLY inside Filter conditions. Under filter
    * semantics null and false are interchangeable (both drop the row),
    * so the NaN guard's false-for-null-cdf substitution is invisible
    * there — but in a projection, CASE arm, count(expr), or join
    * condition the same substitution visibly changes NULL into
    * false/true. Restricting to Filter keeps the scan-pruning benefit
    * (that is where pushdown happens) and leaves every value-producing
    * context with the row-wise expression's exact null semantics.
    */
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transform {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.copy(condition = rewrite(f.condition))
    }

  /** Recurse ONLY through And/Or: those are the positions where a filter
    * condition's null ≡ false equivalence actually holds (a conjunct or
    * disjunct that turns from null to false cannot resurrect a row). A
    * comparison nested under ANY other parent — Coalesce, IsNull,
    * EqualNullSafe, Not, a CASE arm used as a value — can observe the
    * difference: e.g. `coalesce(dist_cdf(..) >= q, true)` KEEPS a NaN-x
    * row (cdf nulls → coalesce true) while the rewritten
    * `x >= c AND NOT isnan(x)` is false. Those positions keep the
    * row-wise expression. (Not(..) was previously saved only because
    * BooleanSimplification happened to normalize it first in the same
    * batch — incidental, now structural.)
    */
  private def rewrite(expr: Expression): Expression = expr match {
    case And(l, r) => And(rewrite(l), rewrite(r))
    case Or(l, r)  => Or(rewrite(l), rewrite(r))
    case leaf      => rewriteComparison(leaf)
  }

  private def rewriteComparison(expr: Expression): Expression =
    expr match {
      case e @ GreaterThanOrEqual(d: DistScalar, qe) =>
        foldableDouble(qe).flatMap(cutoff(d, _))
          .map(c => nanSafeGreater(d.xExpr, c, strict = false))
          .getOrElse(e)
      case e @ GreaterThan(d: DistScalar, qe) =>
        foldableDouble(qe).flatMap(cutoff(d, _))
          .map(c => nanSafeGreater(d.xExpr, c, strict = true))
          .getOrElse(e)
      case e @ LessThanOrEqual(d: DistScalar, qe) =>
        foldableDouble(qe).flatMap(cutoff(d, _))
          .map(c => LessThanOrEqual(d.xExpr, Literal(c)): Expression)
          .getOrElse(e)
      case e @ LessThan(d: DistScalar, qe) =>
        foldableDouble(qe).flatMap(cutoff(d, _))
          .map(c => LessThan(d.xExpr, Literal(c)): Expression)
          .getOrElse(e)
      // flipped operand order: q OP cdf(x)
      case e @ GreaterThanOrEqual(qe, d: DistScalar) =>
        foldableDouble(qe).flatMap(cutoff(d, _))
          .map(c => LessThanOrEqual(d.xExpr, Literal(c)): Expression)
          .getOrElse(e)
      case e @ GreaterThan(qe, d: DistScalar) =>
        foldableDouble(qe).flatMap(cutoff(d, _))
          .map(c => LessThan(d.xExpr, Literal(c)): Expression)
          .getOrElse(e)
      case e @ LessThanOrEqual(qe, d: DistScalar) =>
        foldableDouble(qe).flatMap(cutoff(d, _))
          .map(c => nanSafeGreater(d.xExpr, c, strict = false))
          .getOrElse(e)
      case e @ LessThan(qe, d: DistScalar) =>
        foldableDouble(qe).flatMap(cutoff(d, _))
          .map(c => nanSafeGreater(d.xExpr, c, strict = true))
          .getOrElse(e)
      case other => other
    }
}
