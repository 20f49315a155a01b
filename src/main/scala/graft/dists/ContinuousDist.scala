package graft.dists

import graft.functions.{Optimize, SpecialMath => SM}

/** A continuous distribution family following the scipy parameter
  * convention the reference uses throughout: the parameter vector is
  * `shapes ++ [loc, scale]` and `pdf(x; p) = pdf0((x-loc)/scale) / scale`
  * where pdf0 is the standardized density
  * (reference: src/spark_bestfit/estimation.py:970-1000 splits params the
  * same way; src/spark_bestfit/distributions.py:10-327 registry).
  *
  * Implementations provide standardized pdf/cdf/ppf over the shape
  * parameters only; loc/scale handling, support checks, and the generic
  * MLE refinement loop live here.
  */
trait ContinuousDist extends Serializable {
  def name: String

  /** Shape parameter names (excluding loc/scale). */
  def shapeNames: Seq[String]

  final def paramNames: Seq[String] = shapeNames ++ Seq("loc", "scale")
  final def numShapes: Int = shapeNames.length
  final def numParams: Int = numShapes + 2

  /** Standardized support lower bound given shapes (scipy `dist.a`). */
  def a0(s: Array[Double]): Double = Double.NegativeInfinity

  /** Standardized support upper bound given shapes (scipy `dist.b`). */
  def b0(s: Array[Double]): Double = Double.PositiveInfinity

  /** Whether the standardized support starts at >= 0 for default shapes
    * (scipy `dist.a >= 0`; used by the support-at-zero filter,
    * reference: src/spark_bestfit/distributions.py:120-164). */
  def supportAtZero: Boolean = a0(defaultShapes) >= 0.0

  /** Representative shapes used only for the support-at-zero check. */
  protected def defaultShapes: Array[Double] = Array.fill(numShapes)(1.0)

  /** Validity of a shape vector (domain constraints). */
  def shapesValid(s: Array[Double]): Boolean = true

  // ---- standardized kernel (z = (x - loc)/scale) ----
  def pdf0(z: Double, s: Array[Double]): Double
  def cdf0(z: Double, s: Array[Double]): Double
  def ppf0(q: Double, s: Array[Double]): Double
  def logpdf0(z: Double, s: Array[Double]): Double = {
    val p = pdf0(z, s)
    if (p <= 0.0) Double.NegativeInfinity else math.log(p)
  }

  // ---- loc/scale wrappers ----
  final def shapes(p: Array[Double]): Array[Double] = p.slice(0, numShapes)
  final def loc(p: Array[Double]): Double = p(numShapes)
  final def scale(p: Array[Double]): Double = p(numShapes + 1)

  final def pdf(x: Double, p: Array[Double]): Double = {
    val sc = scale(p)
    if (sc <= 0.0) return Double.NaN
    val z = (x - loc(p)) / sc
    val s = shapes(p)
    if (z < a0(s) || z > b0(s)) 0.0 else pdf0(z, s) / sc
  }

  final def logpdf(x: Double, p: Array[Double]): Double = {
    val sc = scale(p)
    if (sc <= 0.0) return Double.NaN
    val z = (x - loc(p)) / sc
    val s = shapes(p)
    if (z < a0(s) || z > b0(s)) Double.NegativeInfinity
    else logpdf0(z, s) - math.log(sc)
  }

  final def cdf(x: Double, p: Array[Double]): Double = {
    val sc = scale(p)
    if (sc <= 0.0) return Double.NaN
    val z = (x - loc(p)) / sc
    val s = shapes(p)
    if (z <= a0(s)) 0.0 else if (z >= b0(s)) 1.0 else cdf0(z, s)
  }

  final def ppf(q: Double, p: Array[Double]): Double =
    loc(p) + scale(p) * ppf0(q, shapes(p))

  /** Survival function; families with analytic tails may override sf0. */
  def sf0(z: Double, s: Array[Double]): Double = 1.0 - cdf0(z, s)

  final def sf(x: Double, p: Array[Double]): Double = {
    val z = (x - loc(p)) / scale(p)
    val s = shapes(p)
    if (z <= a0(s)) 1.0 else if (z >= b0(s)) 0.0 else sf0(z, s)
  }

  /** log-survival, clamped the way the censored-MLE path needs
    * (reference: src/spark_bestfit/estimation.py:327-477 clamps at -700). */
  final def logsf(x: Double, p: Array[Double]): Double = {
    val v = sf(x, p)
    if (v <= 0.0) -700.0 else math.max(math.log(v), -700.0)
  }

  /** Warm start for MLE: feasible full parameter vector. */
  def warmStart(xs: Array[Double]): Array[Double]

  /** Whether the generic Nelder-Mead refinement runs after warmStart.
    * Families with exact closed-form MLEs disable it. */
  def refineAfterWarmStart: Boolean = true

  /** Exact maximizer of the maximum-spacing objective on the given
    * SORTED points, if the family has one (Cheng & Amin 1983 give the
    * uniform case in closed form). `None` routes the MSE estimator
    * through the generic Nelder-Mead path. */
  def mspClosedForm(sorted: Array[Double]): Option[Array[Double]] = None

  /** Sum of standardized log-densities over z values. Families whose
    * logpdf0 contains shape-only constants (lgamma terms etc.) override
    * this to hoist them out of the point loop — the single hottest path
    * in the whole engine (every Nelder-Mead evaluation runs it over the
    * 10K fitting sample). Returns -inf if any point is off-support. */
  def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
    var ll = 0.0
    var i = 0
    while (i < zs.length) {
      val lp = logpdf0(zs(i), s)
      if (lp.isNaN || lp == Double.NegativeInfinity) return Double.NegativeInfinity
      ll += lp
      i += 1
    }
    ll
  }

  /** Negative log-likelihood with domain penalties; used by fit() and the
    * MSE/censored estimators. */
  final def negLogLik(p: Array[Double], xs: Array[Double]): Double = {
    val sc = scale(p); val s = shapes(p)
    if (sc <= 0.0 || !shapesValid(s)) return Optimize.Penalty
    val l = loc(p)
    val a = a0(s); val b = b0(s)
    val zs = new Array[Double](xs.length)
    var i = 0
    while (i < xs.length) {
      val z = (xs(i) - l) / sc
      if (z < a || z > b) return Optimize.Penalty
      zs(i) = z
      i += 1
    }
    val ll = logpdf0Sum(zs, s)
    if (ll == Double.NegativeInfinity || ll.isNaN) return Optimize.Penalty
    -(ll - xs.length * math.log(sc))
  }

  /** Maximum-likelihood fit: family warm start, then (optionally) a
    * Nelder-Mead polish of the full parameter vector — the same
    * warm-start + simplex strategy scipy's generic `.fit` uses. */
  def fit(xs: Array[Double]): Array[Double] = {
    val w = warmStart(xs)
    if (!refineAfterWarmStart) return w
    val f0 = negLogLik(w, xs)
    if (f0 >= Optimize.Penalty) return w // infeasible start: keep closed form
    val (best, fBest) = Optimize.nelderMead(negLogLik(_, xs), w, maxIter = 300)
    if (fBest < f0 && fBest < Optimize.Penalty) best else w
  }
}

/** Helper mixin for positive-support families: warm starts put loc just
  * below the sample minimum so every observation stays strictly inside
  * the support (mirrors how scipy's fit treats loc for lb-bounded dists). */
trait PositiveSupport { self: ContinuousDist =>
  override def a0(s: Array[Double]): Double = 0.0

  /** loc estimate strictly below min(xs). */
  protected def locBelowMin(xs: Array[Double]): Double = {
    var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
    var i = 0
    while (i < xs.length) { val v = xs(i); if (v < mn) mn = v; if (v > mx) mx = v; i += 1 }
    val span = math.max(mx - mn, math.abs(mn) * 1e-6 + 1e-12)
    mn - 1e-4 * span
  }
}

object ContinuousDist {
  /** numpy-style helpers shared by warm starts. */
  def meanStd(xs: Array[Double]): (Double, Double) = {
    val (_, m, s, _, _, _, _) = SM.moments(xs)
    (m, s)
  }

  def minMax(xs: Array[Double]): (Double, Double) = {
    var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
    var i = 0
    while (i < xs.length) { val v = xs(i); if (v < mn) mn = v; if (v > mx) mx = v; i += 1 }
    (mn, mx)
  }

  def median(xs: Array[Double]): Double = quantile(xs, 0.5)

  /** Seeded partial Fisher-Yates: an unbiased n-element subsample (a head
    * slice of an ordered sample would be its left tail). */
  def seededSubsample(xs: Array[Double], n: Int, seed: Long): Array[Double] = {
    val rng = new java.util.Random(seed)
    val a = xs.clone()
    var i = 0
    val k = math.min(n, a.length)
    while (i < k) {
      val j = i + rng.nextInt(a.length - i)
      val t = a(i); a(i) = a(j); a(j) = t
      i += 1
    }
    java.util.Arrays.copyOfRange(a, 0, k)
  }

  /** numpy 'linear' interpolation quantile on a copy. */
  def quantile(xs: Array[Double], q: Double): Double = {
    val a = xs.clone()
    java.util.Arrays.sort(a)
    val n = a.length
    if (n == 0) return Double.NaN
    if (n == 1) return a(0)
    val h = q * (n - 1)
    val i = math.floor(h).toInt
    val frac = h - i
    if (i + 1 < n) a(i) * (1 - frac) + a(i + 1) * frac else a(i)
  }
}
