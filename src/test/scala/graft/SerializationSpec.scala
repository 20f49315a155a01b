package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import graft.operators._

/** Round-trip tests for JSON model persistence + plot-data operators. */
class SerializationSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-ser-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val tmp = java.nio.file.Files.createTempDirectory("graft-ser").toString

  test("fit result JSON round-trip preserves name, params, metrics, bounds") {
    val r = FitResult("col", "gamma", Array(2.5, 0.0, 1.5),
      0.001, 123.4, 130.2, Some(0.012), Some(0.87), Some(0.45), Some(0.25),
      0.1, 99.0, 5.0, 2.0, 10000.0, 0.1, -0.2, Some(0.0), None)
    val path = s"$tmp/fit.json"
    Serialization.saveFitResult(r, path)
    val back = Serialization.loadFitResult(path)
    assert(back.distribution == "gamma")
    assert(back.parameters.sameElements(r.parameters))
    assert(back.aic == r.aic && back.ks_statistic == r.ks_statistic)
    assert(back.lower_bound.contains(0.0) && back.upper_bound.isEmpty)
    assert(back.ad_pvalue.contains(0.25))
  }

  test("copula JSON round-trip + sampling from the loaded model") {
    val cop = new GaussianCopula(
      Seq(Marginal("x", "norm", Array(0.0, 1.0)),
        Marginal("y", "expon", Array(0.0, 2.0), lowerBound = Some(0.0), upperBound = Some(10.0))),
      Array(Array(1.0, 0.5), Array(0.5, 1.0)))
    val path = s"$tmp/copula.json"
    Serialization.saveCopula(cop, path)
    val back = Serialization.loadCopula(path)
    assert(back.columns == Seq("x", "y"))
    assert(back.marginals(1).upperBound.contains(10.0))
    assert(back.correlation(0)(1) == 0.5)
    val s1 = cop.sampleLocal(100, seed = 9L)
    val s2 = back.sampleLocal(100, seed = 9L)
    assert(s1.flatten.toSeq == s2.flatten.toSeq) // identical model → identical draws
  }

  test("MVN and GMM JSON round-trips") {
    val mvn = MultivariateNormalResult(Seq("a", "b"),
      Array(1.0, 2.0), Array(Array(2.0, 0.3), Array(0.3, 1.0)), 5000L)
    Serialization.saveMvn(mvn, s"$tmp/mvn.json")
    val mvnBack = Serialization.loadMvn(s"$tmp/mvn.json")
    assert(mvnBack.mean.sameElements(mvn.mean))
    assert(mvnBack.cov(0)(1) == 0.3 && mvnBack.sampleSize == 5000L)
    assert(math.abs(mvnBack.logpdf(Array(1.0, 2.0)) - mvn.logpdf(Array(1.0, 2.0))) < 1e-12)

    val gmm = GaussianMixtureResult(Seq("v"), Array(0.4, 0.6),
      Array(Array(0.0), Array(5.0)),
      Array(Array(Array(1.0)), Array(Array(1.2))),
      -1234.5, 6000L, 2479.0, 2512.0)
    Serialization.saveGmm(gmm, s"$tmp/gmm.json")
    val gmmBack = Serialization.loadGmm(s"$tmp/gmm.json")
    assert(gmmBack.weights.sameElements(gmm.weights))
    assert(gmmBack.covariances(1)(0)(0) == 1.2)
    assert(gmmBack.aic == gmm.aic)
  }

  test("linear/logistic/cox/kmeans model JSON round-trips") {
    val lin = Regression.LinearModel(Seq("x1", "x2"),
      Array(0.5, 1.5, -2.0), 100L, 0.87)
    Serialization.saveLinear(lin, s"$tmp/lin.json")
    val linBack = Serialization.loadLinear(s"$tmp/lin.json")
    assert(linBack.features == lin.features &&
      linBack.beta.sameElements(lin.beta) && linBack.r2 == 0.87)

    val logit = Regression.LogisticModel(Seq("q"), Array(-1.0, 0.25),
      -321.5, 4000L, 3)
    Serialization.saveLogistic(logit, s"$tmp/logit.json")
    val logitBack = Serialization.loadLogistic(s"$tmp/logit.json")
    assert(logitBack.beta.sameElements(logit.beta) &&
      logitBack.logLik == -321.5 && logitBack.iterations == 3)

    val cox = Survival.CoxModel(Seq("age", "dose"),
      Array(0.03, -0.8), Array(0.01, 0.2), -55.5, -60.1, 200L, 80L, 4)
    Serialization.saveCox(cox, s"$tmp/cox.json")
    val coxBack = Serialization.loadCox(s"$tmp/cox.json")
    assert(coxBack.beta.sameElements(cox.beta) &&
      coxBack.se.sameElements(cox.se) && coxBack.nEvents == 80L &&
      coxBack.logLik0 == -60.1)
    assert(math.abs(coxBack.hazardRatio(1) - math.exp(-0.8)) < 1e-12)

    val km = Clustering.KMeansModel(
      Array(Array(0.0, 1.0), Array(5.0, 5.0)), Array(40L, 60L),
      12.5, 100L, 3)
    Serialization.saveKMeans(km, s"$tmp/km.json")
    val kmBack = Serialization.loadKMeans(s"$tmp/km.json")
    assert(kmBack.centroids(1).sameElements(km.centroids(1)) &&
      kmBack.sizes.sameElements(km.sizes) && kmBack.inertia == 12.5)
    // cross-type load fails the tag check
    intercept[IllegalArgumentException] {
      Serialization.loadCox(s"$tmp/km.json") }
  }

  test("type tag mismatch raises") {
    val mvn = MultivariateNormalResult(Seq("a"), Array(0.0), Array(Array(1.0)), 10L)
    Serialization.saveMvn(mvn, s"$tmp/typed.json")
    intercept[IllegalArgumentException] { Serialization.loadCopula(s"$tmp/typed.json") }
  }

  test("plot data: qq/pp near the diagonal for the true family, residuals small") {
    val rng = new java.util.Random(29L)
    val sample = Array.fill(2000)(10.0 + 2.0 * rng.nextGaussian())
    val params = graft.dists.ContinuousFamilies.Norm.fit(sample)

    val qq = PlotData.qqData(spark, sample, "norm", params).collect()
    assert(qq.length == 2000)
    val maxDev = qq.filter(r => math.abs(r.getDouble(1) - 10.0) < 4.0) // body, not tails
      .map(r => math.abs(r.getDouble(0) - r.getDouble(1))).max
    assert(maxDev < 0.5, s"qq body deviation $maxDev")

    val pp = PlotData.ppData(spark, sample, "norm", params).collect()
    assert(pp.forall(r => math.abs(r.getDouble(0) - r.getDouble(1)) < 0.05))

    val curve = PlotData.pdfCurve(spark, "norm", params, points = 50).collect()
    assert(curve.length == 50 && curve.forall(_.getDouble(1) >= 0))

    import spark.implicits._
    val df = sample.toSeq.toDF("v")
    val hist = Histogram.continuous(df, "v", bins = 30)
    val cmp = PlotData.histogramComparison(spark, hist, "norm", params).collect()
    assert(cmp.length == 30)
    assert(cmp.map(r => math.abs(r.getDouble(3))).max < 0.05) // residuals small

    val cdf = PlotData.cdfComparison(spark, sample, "norm", params, points = 100).collect()
    assert(cdf.forall(r => math.abs(r.getDouble(1) - r.getDouble(2)) < 0.05))
  }
}
