package graft.functions

import graft.dists.{ContinuousDist, DiscreteDist, FrozenModel}
import org.apache.commons.math3.stat.inference.KolmogorovSmirnovTest

/** Goodness-of-fit metrics (reference: src/spark_bestfit/metrics.py).
  *
  * All functions are pure JVM math over driver/executor-local arrays —
  * they run inside the fit fan-out map and must never touch a
  * SparkSession.
  */
object Metrics extends Serializable {

  /** CDF clamp epsilon (reference: metrics.py:20, NUMERICAL_EPSILON). */
  final val Eps = 1e-10

  /** AIC and BIC from the sample log-likelihood
    * (reference: metrics.py:33-106). Returns (inf, inf) on non-finite LL. */
  def informationCriteria(model: FrozenModel, k: Int, sample: Array[Double]): (Double, Double) = {
    val n = sample.length
    var ll = 0.0
    var i = 0
    while (i < n) {
      ll += model.logpdf(sample(i))
      i += 1
    }
    if (!java.lang.Double.isFinite(ll)) (Double.PositiveInfinity, Double.PositiveInfinity)
    else (2.0 * k - 2.0 * ll, k * math.log(n.toDouble) - 2.0 * ll)
  }

  /** One-sample two-sided K-S statistic over a sorted copy of the sample:
    * D = max_i max(i/n − F(x_i), F(x_i) − (i−1)/n). P-value via
    * commons-math3's Kolmogorov CDF (exact/Pelz-Good, matching scipy's
    * exact mode closely at n = 10k), falling back to the asymptotic
    * Kolmogorov tail. Non-finite → (inf, 0) (reference: metrics.py:109-175). */
  def ksStatistic(model: FrozenModel, sample: Array[Double]): (Double, Double) = {
    val n = sample.length
    if (n == 0) return (Double.PositiveInfinity, 0.0)
    val xs = sample.clone()
    java.util.Arrays.sort(xs)
    var d = 0.0
    var i = 0
    while (i < n) {
      val f = model.cdf(xs(i))
      if (f.isNaN) return (Double.PositiveInfinity, 0.0)
      val hi = (i + 1).toDouble / n - f
      val lo = f - i.toDouble / n
      if (hi > d) d = hi
      if (lo > d) d = lo
      i += 1
    }
    if (!java.lang.Double.isFinite(d)) return (Double.PositiveInfinity, 0.0)
    val p = try {
      1.0 - new KolmogorovSmirnovTest().cdf(d, n)
    } catch {
      case _: Throwable => SpecialMath.kolmogorovSf(math.sqrt(n.toDouble) * d)
    }
    (d, math.min(1.0, math.max(0.0, p)))
  }

  /** Anderson-Darling A² with the reference's CDF clamp
    * (reference: metrics.py:178-266). */
  def adStatistic(model: FrozenModel, sample: Array[Double]): Double = {
    val n = sample.length
    if (n < 2) return Double.PositiveInfinity
    val xs = sample.clone()
    java.util.Arrays.sort(xs)
    val cdfs = new Array[Double](n)
    var i = 0
    while (i < n) {
      var f = model.cdf(xs(i))
      if (f.isNaN) return Double.PositiveInfinity
      if (f < Eps) f = Eps
      if (f > 1 - Eps) f = 1 - Eps
      cdfs(i) = f
      i += 1
    }
    var s = 0.0
    i = 0
    while (i < n) {
      s += (2 * i + 1) * (math.log(cdfs(i)) + math.log1p(-cdfs(n - 1 - i)))
      i += 1
    }
    val a2 = -n - s / n
    if (java.lang.Double.isFinite(a2)) a2 else Double.PositiveInfinity
  }

  /** A-D critical-value tables: published Stephens (1974/77) tables, the
    * same ones scipy.anderson embeds (reference: metrics.py:24-30 maps
    * {norm, expon, logistic, gumbel_r, gumbel_l} to them). Each entry:
    * (significance levels in percent, raw critical values, n-correction). */
  private def adTable(name: String, n: Int): Option[(Array[Double], Array[Double])] = {
    val nn = n.toDouble
    name match {
      case "norm" =>
        val corr = 1.0 + 4.0 / nn - 25.0 / (nn * nn)
        Some((Array(15, 10, 5, 2.5, 1), Array(0.576, 0.656, 0.787, 0.918, 1.092).map(_ / corr)))
      case "expon" =>
        val corr = 1.0 + 0.6 / nn
        Some((Array(15, 10, 5, 2.5, 1), Array(0.922, 1.078, 1.341, 1.606, 1.957).map(_ / corr)))
      case "logistic" =>
        val corr = 1.0 + 0.25 / nn
        Some((Array(25, 10, 5, 2.5, 1, 0.5), Array(0.426, 0.563, 0.660, 0.769, 0.906, 1.010).map(_ / corr)))
      case "gumbel_r" | "gumbel_l" =>
        val corr = 1.0 + 0.2 / math.sqrt(nn)
        Some((Array(25, 10, 5, 2.5, 1), Array(0.474, 0.637, 0.757, 0.877, 1.038).map(_ / corr)))
      case _ => None
    }
  }

  /** Approximate A-D p-value for the supported families: refit the family
    * to the sample (as scipy.anderson does), compute A², then interpolate
    * the critical-value table; below-table → 0.25, above-table → 0.005
    * (reference: metrics.py:269-322). */
  def adPValue(dist: ContinuousDist, sample: Array[Double]): Option[Double] = {
    adTable(dist.name, sample.length).map { case (sigPct, crit) =>
      val params = dist.name match {
        case "norm" =>
          // scipy.anderson standardizes with ddof=1 std
          val n = sample.length
          val m = sample.sum / n
          val v = sample.map(x => (x - m) * (x - m)).sum / math.max(n - 1, 1)
          Array(m, math.sqrt(v))
        case "expon" =>
          Array(0.0, sample.sum / sample.length) // w = y / mean
        case _ => dist.fit(sample)
      }
      val model = graft.dists.FrozenDist(dist, params)
      val a2 = adStatistic(model, sample)
      val sig = sigPct.map(_ / 100.0)
      if (a2 < crit(0)) 0.25
      else if (a2 > crit(crit.length - 1)) 0.005
      else {
        var p = 0.005
        var i = 0
        var done = false
        while (i < crit.length - 1 && !done) {
          if (crit(i) <= a2 && a2 <= crit(i + 1)) {
            val frac = (a2 - crit(i)) / (crit(i + 1) - crit(i))
            p = sig(i) - frac * (sig(i) - sig(i + 1))
            done = true
          }
          i += 1
        }
        p
      }
    }
  }

  /** Continuous SSE via CDF differencing against the histogram density
    * (reference: estimation.py:599-606, 672-687): expected density per bin
    * = (F(hi) − F(lo)) / width, NaN/±inf → 0. */
  def sseContinuous(model: FrozenModel, density: Array[Double], edges: Array[Double]): Double = {
    if (edges.length < 2) return Double.PositiveInfinity // single-bin (constant) data: no valid bins
    val nb = edges.length - 1
    var prev = model.cdf(edges(0))
    var sse = 0.0
    var i = 0
    while (i < nb) {
      val cur = model.cdf(edges(i + 1))
      val w = edges(i + 1) - edges(i)
      var exp = (cur - prev) / w
      if (exp.isNaN || exp.isInfinite) exp = 0.0
      val d = density(i) - exp
      sse += d * d
      prev = cur
      i += 1
    }
    sse
  }

  /** Discrete SSE: squared PMF error at the observed values
    * (reference: discrete_fitting.py:184-209). */
  def sseDiscrete(dist: DiscreteDist, params: Array[Double],
                  xs: Array[Long], empiricalPmf: Array[Double]): Double = {
    var sse = 0.0
    var i = 0
    while (i < xs.length) {
      var fit = dist.pmf(xs(i), params)
      if (fit.isNaN || fit.isInfinite) fit = 0.0
      val d = empiricalPmf(i) - fit
      sse += d * d
      i += 1
    }
    sse
  }

  /** Discrete AIC/BIC from the sample log-pmf
    * (reference: discrete_fitting.py:212-253). */
  def informationCriteriaDiscrete(dist: DiscreteDist, params: Array[Double],
                                  sample: Array[Long]): (Double, Double) = {
    val n = sample.length
    var ll = 0.0
    var i = 0
    while (i < n) {
      ll += dist.logpmf(sample(i), params)
      i += 1
    }
    val k = params.length
    if (!java.lang.Double.isFinite(ll)) (Double.PositiveInfinity, Double.PositiveInfinity)
    else (2.0 * k - 2.0 * ll, k * math.log(n.toDouble) - 2.0 * ll)
  }

  /** Two-sided discrete K-S: D⁺ = max_i(i/n − F(x_i)), D⁻ = max_i(F(x_i) −
    * (i−1)/n) over ALL sorted observations (ties included), p ≈ the
    * asymptotic Kolmogorov tail sf(√n·D). This mirrors the reference's
    * formulation exactly, which it documents as conservative / rank-only
    * for discrete data (reference: discrete_fitting.py:256-320). Within a
    * run of tied values only the run's end (for D⁺) and start (for D⁻)
    * can attain the max, so runs are evaluated once. */
  def ksDiscrete(dist: DiscreteDist, params: Array[Double], sample: Array[Long]): (Double, Double) = {
    val n = sample.length
    if (n == 0) return (Double.PositiveInfinity, 0.0)
    val xs = sample.clone()
    java.util.Arrays.sort(xs)
    var d = 0.0
    var i = 0
    while (i < n) {
      if (i == n - 1 || xs(i + 1) != xs(i)) {
        val f = dist.cdf(xs(i), params)
        if (f.isNaN) return (Double.PositiveInfinity, 0.0)
        var lo = i
        while (lo > 0 && xs(lo - 1) == xs(i)) lo -= 1
        val dPlus = (i + 1).toDouble / n - f
        val dMinus = f - lo.toDouble / n
        if (dPlus > d) d = dPlus
        if (dMinus > d) d = dMinus
      }
      i += 1
    }
    (d, SpecialMath.kolmogorovSf(math.sqrt(n.toDouble) * d))
  }

  /** KL divergence KL(P‖Q) between two fitted normals — closed form:
    * ln(σq/σp) + (σp² + (μp−μq)²)/(2σq²) − ½. The model-drift metric
    * between two fit snapshots (yesterday's model vs today's): zero iff
    * the fits agree, grows quadratically in the mean shift measured in
    * target standard deviations. The arithmetic shape is kept
    * SQL-replayable on purpose (no log1p/expm1 refactor) so drift values
    * hash-check against an external engine's replay of the same formula. */
  def klNormal(meanP: Double, stdP: Double, meanQ: Double, stdQ: Double): Double = {
    require(stdP > 0 && stdQ > 0, "std must be positive")
    math.log(stdQ / stdP) +
      (stdP * stdP + (meanP - meanQ) * (meanP - meanQ)) / (2.0 * stdQ * stdQ) - 0.5
  }
}
