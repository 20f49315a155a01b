package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.dists.{DistRegistry, FrozenModel}

/** Plot-DATA operators (reference: src/spark_bestfit/plotting.py renders
  * eight matplotlib figures; the data each one plots is engine work —
  * SURVEY.md §2.10 — so the engine exposes the DataFrames and skips the
  * rendering).
  */
object PlotData {

  private def frozen(distName: String, params: Array[Double],
                     lb: Option[Double], ub: Option[Double]): FrozenModel = {
    val dist = DistRegistry.get(distName).getOrElse(
      throw new IllegalArgumentException(s"unknown distribution '$distName'"))
    FrozenModel(dist, params, lb, ub)
  }

  /** Histogram (bin center, density) + fitted expected density per bin —
    * the data behind plot_distribution and plot_residual_histogram. */
  def histogramComparison(spark: SparkSession, hist: Hist,
                          distName: String, params: Array[Double],
                          lb: Option[Double] = None, ub: Option[Double] = None): DataFrame = {
    import spark.implicits._
    val m = frozen(distName, params, lb, ub)
    val rows = (0 until hist.nBins).map { i =>
      val lo = hist.edges(i); val hi = hist.edges(i + 1)
      val center = (lo + hi) / 2
      val expected = (m.cdf(hi) - m.cdf(lo)) / (hi - lo)
      val exp = if (expected.isNaN || expected.isInfinite) 0.0 else expected
      (center, hist.density(i), exp, hist.density(i) - exp)
    }
    rows.toDF("bin_center", "density", "expected_density", "residual")
  }

  /** PDF curve on the ppf(0.01)..ppf(0.99) range with histogram-bounds
    * fallback (reference: estimation.py:1003-1039). */
  def pdfCurve(spark: SparkSession, distName: String, params: Array[Double],
               points: Int = 200, hist: Option[Hist] = None,
               lb: Option[Double] = None, ub: Option[Double] = None): DataFrame = {
    import spark.implicits._
    val m = frozen(distName, params, lb, ub)
    var lo = m.ppf(0.01); var hi = m.ppf(0.99)
    if (!java.lang.Double.isFinite(lo) || !java.lang.Double.isFinite(hi) || lo >= hi) {
      hist.foreach { h => lo = h.edges.head; hi = h.edges.last }
    }
    val rows = (0 until points).map { i =>
      val x = lo + (hi - lo) * i / (points - 1)
      (x, m.pdf(x))
    }
    rows.toDF("x", "pdf")
  }

  /** Q-Q data: theoretical vs sample quantiles at Blom plotting positions
    * (i − 0.375)/(n + 0.25) (reference: plotting.py:101-114). */
  def qqData(spark: SparkSession, sample: Array[Double],
             distName: String, params: Array[Double],
             lb: Option[Double] = None, ub: Option[Double] = None): DataFrame = {
    import spark.implicits._
    val m = frozen(distName, params, lb, ub)
    val sorted = sample.clone()
    java.util.Arrays.sort(sorted)
    val n = sorted.length
    val rows = (1 to n).map { i =>
      val p = (i - 0.375) / (n + 0.25)
      (m.ppf(p), sorted(i - 1))
    }
    rows.toDF("theoretical_quantile", "sample_quantile")
  }

  /** P-P data: model CDF vs empirical CDF at the sorted sample. */
  def ppData(spark: SparkSession, sample: Array[Double],
             distName: String, params: Array[Double],
             lb: Option[Double] = None, ub: Option[Double] = None): DataFrame = {
    import spark.implicits._
    val m = frozen(distName, params, lb, ub)
    val sorted = sample.clone()
    java.util.Arrays.sort(sorted)
    val n = sorted.length
    val rows = (1 to n).map { i =>
      ((i - 0.5) / n, m.cdf(sorted(i - 1)))
    }
    rows.toDF("empirical_cdf", "model_cdf")
  }

  /** ECDF vs fitted CDF over the sample range — plot_cdf_comparison. */
  def cdfComparison(spark: SparkSession, sample: Array[Double],
                    distName: String, params: Array[Double], points: Int = 200,
                    lb: Option[Double] = None, ub: Option[Double] = None): DataFrame = {
    import spark.implicits._
    val m = frozen(distName, params, lb, ub)
    val sorted = sample.clone()
    java.util.Arrays.sort(sorted)
    val n = sorted.length
    val lo = sorted.head; val hi = sorted.last
    val rows = (0 until points).map { i =>
      val x = lo + (hi - lo) * i / (points - 1)
      // ECDF via binary search
      var idx = java.util.Arrays.binarySearch(sorted, x)
      if (idx < 0) idx = -idx - 1 else { while (idx < n && sorted(idx) <= x) idx += 1 }
      (x, idx.toDouble / n, m.cdf(x))
    }
    rows.toDF("x", "ecdf", "model_cdf")
  }
}
