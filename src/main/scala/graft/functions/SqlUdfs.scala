package graft.functions

import org.apache.spark.sql.SparkSession
import graft.dists.{DistRegistry, DiscreteRegistry, FrozenModel, FrozenDist}

/** SQL exposure of the distribution library (SURVEY.md §2.9; reference:
  * custom dists broadcast into the fitting UDF,
  * src/spark_bestfit/distributions.py:198-259): scalar UDFs
  * `dist_pdf/cdf/ppf(name, params, x)` plus discrete `dist_pmf`. Params
  * follow the scipy convention `shapes ++ [loc, scale]` — exactly the
  * `parameters` column a fit produces, so
  * `SELECT dist_pdf(distribution, parameters, x) FROM fits` works
  * directly. Unknown names and bad params return NULL, never throw. */
object SqlUdfs {

  private def finiteOrNull(v: Double): java.lang.Double =
    if (java.lang.Double.isFinite(v)) java.lang.Double.valueOf(v) else null

  /** Register every UDF on the session; returns the registered names.
    *
    * The custom-registry snapshot is captured HERE, on the driver, and
    * rides the UDF closures to executors — `DistRegistry.get` inside a
    * UDF body would consult the executor JVM's (empty) custom map on a
    * real cluster. Dists registered after this call need a re-`register`
    * to become visible to SQL. */
  def register(spark: SparkSession): Seq[String] = {
    val customC = DistRegistry.customSnapshot
    val customD = DiscreteRegistry.customSnapshot
    def model(name: String, params: Seq[Double]): Option[FrozenModel] =
      customC.get(name).orElse(DistRegistry.get(name))
        .map(d => FrozenDist(d, params.toArray))
    spark.udf.register("dist_pdf",
      (name: String, params: Seq[Double], x: Double) =>
        model(name, params).map(m => finiteOrNull(m.pdf(x))).orNull)
    spark.udf.register("dist_logpdf",
      (name: String, params: Seq[Double], x: Double) =>
        model(name, params).map(m => finiteOrNull(m.logpdf(x))).orNull)
    spark.udf.register("dist_cdf",
      (name: String, params: Seq[Double], x: Double) =>
        model(name, params).map(m => finiteOrNull(m.cdf(x))).orNull)
    spark.udf.register("dist_ppf",
      (name: String, params: Seq[Double], q: Double) =>
        model(name, params).map(m => finiteOrNull(m.ppf(q))).orNull)
    spark.udf.register("dist_pmf",
      (name: String, params: Seq[Double], k: Long) =>
        customD.get(name).orElse(DiscreteRegistry.get(name))
          .map(d => finiteOrNull(d.pmf(k, params.toArray))).orNull)
    spark.udf.register("hist_counts",
      org.apache.spark.sql.functions.udaf(HistAggregator))
    Seq("dist_pdf", "dist_logpdf", "dist_cdf", "dist_ppf", "dist_pmf",
      "hist_counts")
  }
}
