package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.dists.{ContinuousDist, DiscreteDist, DiscreteRegistry, DistRegistry, FrozenDist}

/** Native Catalyst expression behind the SQL functions
  * `dist_pdf/dist_logpdf/dist_cdf/dist_ppf/dist_pmf(name, params, x)`
  * when they are injected through [[graft.GraftExtensions]]
  * (SURVEY.md §2.9; the reference exposes the same frozen-dist scalar
  * surface through scipy objects, src/spark_bestfit/distributions.py:198-259).
  *
  * Params follow the scipy convention `shapes ++ [loc, scale]` — exactly
  * the `parameters` column a fit produces.
  *
  * Cluster-safety: the custom-registry snapshot is a CONSTRUCTOR FIELD,
  * captured on the driver at query-planning time when the function
  * builder runs. The expression tree is what Spark serializes to
  * executors, so runtime-registered families ride along with the plan —
  * the same discipline the fit fan-out uses for its broadcast context
  * (`Fitter.scala`), with no executor-side registry lookup of mutable
  * driver state. Builtin families resolve from the object registry, which
  * is identical in every JVM.
  *
  * Evaluation is `CodegenFallback`: one virtual call into JVM math per
  * row. These functions are an interop surface (scoring, plotting,
  * drift), not the fit hot path — the fit kernels never route through
  * SQL expressions.
  *
  * Null semantics match [[SqlUdfs]]: unknown name, null/NaN input, null
  * array element, or a non-finite result → NULL, never an exception.
  */
case class DistScalar(
    kind: String,
    nameExpr: Expression,
    paramsExpr: Expression,
    xExpr: Expression,
    custom: Map[String, ContinuousDist],
    customDisc: Map[String, DiscreteDist])
  extends TernaryExpression with CodegenFallback {

  require(DistScalar.kinds.contains(kind), s"unknown dist function kind: $kind")

  override def first: Expression = nameExpr
  override def second: Expression = paramsExpr
  override def third: Expression = xExpr

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = s"dist_$kind"

  override def nullSafeEval(n: Any, p: Any, xv: Any): Any = {
    val name = n.asInstanceOf[UTF8String].toString
    val arr = p.asInstanceOf[ArrayData]
    val k = arr.numElements()
    val pa = new Array[Double](k)
    var i = 0
    while (i < k) {
      if (arr.isNullAt(i)) return null
      pa(i) = arr.getDouble(i)
      i += 1
    }
    val res: Double =
      if (kind == "pmf") {
        customDisc.get(name).orElse(DiscreteRegistry.get(name)) match {
          case Some(d) => d.pmf(xv.asInstanceOf[Long], pa)
          case None => return null
        }
      } else {
        custom.get(name).orElse(DistRegistry.get(name)) match {
          case Some(d) =>
            val m = FrozenDist(d, pa)
            val x = xv.asInstanceOf[Double]
            kind match {
              case "pdf"    => m.pdf(x)
              case "logpdf" => m.logpdf(x)
              case "cdf"    => m.cdf(x)
              case "ppf"    => m.ppf(x)
            }
          case None => return null
        }
      }
    if (java.lang.Double.isFinite(res)) res else null
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): DistScalar =
    copy(nameExpr = newFirst, paramsExpr = newSecond, xExpr = newThird)
}

object DistScalar {
  val kinds: Set[String] = Set("pdf", "logpdf", "cdf", "ppf", "pmf")

  /** Builder used by the function-injection path: coerces the arguments
    * with `Cast` (ImplicitCastInputTypes is `private[sql]`, so coercion
    * is applied explicitly here) — integer literals, float params, and
    * varchar names all work in SQL. */
  def build(kind: String, args: Seq[Expression],
            custom: Map[String, ContinuousDist],
            customDisc: Map[String, DiscreteDist]): DistScalar = {
    require(args.length == 3,
      s"dist_$kind(name, params, x) takes 3 arguments, got ${args.length}")
    def cast(e: Expression, t: DataType): Expression =
      if (e.resolved && e.dataType == t) e else Cast(e, t)
    DistScalar(kind,
      cast(args(0), StringType),
      cast(args(1), ArrayType(DoubleType)),
      cast(args(2), if (kind == "pmf") LongType else DoubleType),
      custom, customDisc)
  }
}
