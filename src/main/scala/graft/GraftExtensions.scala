package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.dists.{DiscreteRegistry, DistRegistry}
import graft.functions.{ArrayDotProduct, DistScalar}

/** Spark extension entry point (SURVEY.md §2.9) — the idiomatic way to
  * make the engine's SQL surface available with zero driver code:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or programmatically:
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * }}}
  *
  * Injects as native catalog functions:
  *   - `dist_pdf / dist_logpdf / dist_cdf / dist_ppf (name, params, x)`
  *   - `dist_pmf(name, params, k)`
  *   - `array_dot(a, b)` — the codegen'd dot product the ANN operators use
  *
  * Unlike [[graft.functions.SqlUdfs.register]] (which snapshots the
  * custom registries once, at registration time), the injected builders
  * run at QUERY PLANNING time, so each query picks up the custom
  * families registered on the driver as of that query — and the snapshot
  * serializes inside the expression tree to executors, which is what
  * makes runtime-registered distributions work on a real cluster where
  * `DistRegistry.register` never ran in the executor JVMs.
  *
  * `SqlUdfs.register` stays available for sessions built without
  * extensions (and for the `hist_counts` UDAF, which Spark's function
  * injection API does not cover).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // monotone model-predicate folding: dist_cdf(..., x) >= q becomes a
    // plain pushable range on x (see ModelPredicatePushdown)
    ext.injectOptimizerRule(_ => graft.plans.ModelPredicatePushdown)

    def inject(name: String, builder: Seq[Expression] => Expression,
               usage: String): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[DistScalar].getName, null, name, usage, ""),
        builder))

    def distBuilder(kind: String)(args: Seq[Expression]): Expression =
      DistScalar.build(kind, args,
        DistRegistry.customSnapshot, DiscreteRegistry.customSnapshot)

    inject("dist_pdf", distBuilder("pdf"),
      "_FUNC_(name, params, x) - density of the named distribution at x; params = shapes ++ [loc, scale].")
    inject("dist_logpdf", distBuilder("logpdf"),
      "_FUNC_(name, params, x) - log-density of the named distribution at x.")
    inject("dist_cdf", distBuilder("cdf"),
      "_FUNC_(name, params, x) - CDF of the named distribution at x.")
    inject("dist_ppf", distBuilder("ppf"),
      "_FUNC_(name, params, q) - quantile (inverse CDF) of the named distribution at q.")
    inject("dist_pmf", distBuilder("pmf"),
      "_FUNC_(name, params, k) - probability mass of the named discrete distribution at integer k.")

    ext.injectFunction((FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, null, "array_dot",
        "_FUNC_(a, b) - codegen'd dot product over two float/double array columns.", ""),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"array_dot(a, b) takes 2 arguments, got ${args.length}")
        ArrayDotProduct(args(0), args(1))
      }))
  }
}
