package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.clustering.GaussianMixture

/** Gaussian mixture model fitting (reference: src/spark_bestfit/
  * mixture.py:111-711 implements full-covariance EM by hand; Spark ML's
  * GaussianMixture IS that distributed EM, so we use it directly — SURVEY
  * §2.8 G7 — and add the reference's reporting surface: weights, means,
  * covariances, converged log-likelihood, AIC/BIC with the full-covariance
  * free-parameter count, and predict/predict_proba).
  */
final case class GaussianMixtureResult(
    columns: Seq[String],
    weights: Array[Double],
    means: Array[Array[Double]],
    covariances: Array[Array[Array[Double]]],
    logLikelihood: Double,
    n: Long,
    aic: Double,
    bic: Double) extends Serializable {
  def k: Int = weights.length
}

object Mixture {

  /** Free parameters of a k-component full-covariance GMM in d dims:
    * (k−1) weights + k·d means + k·d(d+1)/2 covariance entries
    * (reference: mixture.py:280-305). */
  def freeParams(k: Int, d: Int): Int = (k - 1) + k * d + k * d * (d + 1) / 2

  def fit(df: DataFrame, columns: Seq[String], k: Int,
          seed: Long = 42L, maxIter: Int = 100, tol: Double = 1e-4): (GaussianMixtureResult, DataFrame) = {
    val assembler = new VectorAssembler()
      .setInputCols(columns.toArray).setOutputCol("__features")
      .setHandleInvalid("skip")
    // lineage-free materialization (vs cache()): the blocks are released
    // by the ContextCleaner when the frame is dropped, so repeated fits
    // don't accumulate pinned relations
    val vecDf = assembler.transform(
      df.select(columns.map(c => F.col(c).cast("double").as(c)): _*))
      .localCheckpoint(true)
    val n = vecDf.count()
    val gmm = new GaussianMixture()
      .setK(k).setSeed(seed).setMaxIter(maxIter).setTol(tol)
      .setFeaturesCol("__features")
    val model = gmm.fit(vecDf)
    val d = columns.length
    val ll = model.summary.logLikelihood
    val p = freeParams(k, d)
    val aic = 2.0 * p - 2.0 * ll
    val bic = p * math.log(n.toDouble) - 2.0 * ll
    val result = GaussianMixtureResult(
      columns,
      model.weights,
      model.gaussians.map(_.mean.toArray),
      model.gaussians.map(g => {
        val m = g.cov
        Array.tabulate(d, d)((i, j) => m(i, j))
      }),
      ll, n, aic, bic)
    val assigned = model.transform(vecDf)
      .withColumnRenamed("prediction", "component")
      .drop("__features")
    (result, assigned)
  }

  /** Flat per-component report DataFrame (component, weight, means, diag
    * variances) — the query surface for the harness. */
  def report(spark: org.apache.spark.sql.SparkSession, r: GaussianMixtureResult): DataFrame = {
    import spark.implicits._
    (0 until r.k).map { c =>
      (c, r.weights(c),
        r.means(c).toSeq,
        (0 until r.columns.length).map(i => r.covariances(c)(i)(i)).toSeq,
        r.aic, r.bic)
    }.toDF("component", "weight", "means", "variances", "aic", "bic")
  }
}
