package graft.functions

import org.apache.commons.math3.special.{Beta => CBeta, Erf => CErf, Gamma => CGamma}
import org.apache.commons.math3.distribution.{GammaDistribution, BetaDistribution, TDistribution, FDistribution}

/** Special functions used by the distribution library.
  *
  * Thin, allocation-free wrappers over commons-math3 (available in
  * /opt/spark/jars). Semantics follow the standard definitions used by the
  * reference's scipy backend (see /root/reference/src/spark_bestfit/
  * fast_ppf.py:56-309 for the closed-form inverse-CDF catalogue we mirror).
  */
object SpecialMath extends Serializable {

  final val SqrtTwo = math.sqrt(2.0)
  final val SqrtTwoPi = math.sqrt(2.0 * math.Pi)
  final val LnSqrtTwoPi = 0.5 * math.log(2.0 * math.Pi)
  final val EulerGamma = 0.5772156649015329

  /** Standard normal PDF. */
  @inline def normPdf(z: Double): Double = math.exp(-0.5 * z * z) / SqrtTwoPi

  @inline def normLogPdf(z: Double): Double = -0.5 * z * z - LnSqrtTwoPi

  /** Standard normal CDF Φ(z) via erfc for tail accuracy. */
  def normCdf(z: Double): Double = 0.5 * CErf.erfc(-z / SqrtTwo)

  /** Standard normal inverse CDF Φ⁻¹(q). */
  def normPpf(q: Double): Double = {
    if (q <= 0.0) Double.NegativeInfinity
    else if (q >= 1.0) Double.PositiveInfinity
    else SqrtTwo * CErf.erfInv(2.0 * q - 1.0)
  }

  @inline def erf(x: Double): Double = CErf.erf(x)
  @inline def erfc(x: Double): Double = CErf.erfc(x)

  @inline def lgamma(x: Double): Double = CGamma.logGamma(x)
  @inline def digamma(x: Double): Double = CGamma.digamma(x)
  @inline def trigamma(x: Double): Double = CGamma.trigamma(x)

  /** Regularized lower incomplete gamma P(a, x). */
  @inline def gammaInc(a: Double, x: Double): Double =
    if (x <= 0.0) 0.0 else CGamma.regularizedGammaP(a, x)

  /** Regularized upper incomplete gamma Q(a, x). */
  @inline def gammaIncC(a: Double, x: Double): Double =
    if (x <= 0.0) 1.0 else CGamma.regularizedGammaQ(a, x)

  /** Inverse of the regularized lower incomplete gamma in x: P(a, x) = q. */
  def gammaIncInv(a: Double, q: Double): Double = {
    if (q <= 0.0) 0.0
    else if (q >= 1.0) Double.PositiveInfinity
    else new GammaDistribution(null, a, 1.0).inverseCumulativeProbability(q)
  }

  @inline def lbeta(a: Double, b: Double): Double =
    CGamma.logGamma(a) + CGamma.logGamma(b) - CGamma.logGamma(a + b)

  /** Regularized incomplete beta I_x(a, b). */
  @inline def betaInc(a: Double, b: Double, x: Double): Double = {
    if (x <= 0.0) 0.0 else if (x >= 1.0) 1.0 else CBeta.regularizedBeta(x, a, b)
  }

  /** Inverse of the regularized incomplete beta in x. */
  def betaIncInv(a: Double, b: Double, q: Double): Double = {
    if (q <= 0.0) 0.0
    else if (q >= 1.0) 1.0
    else new BetaDistribution(null, a, b).inverseCumulativeProbability(q)
  }

  /** Student-t CDF with df degrees of freedom (standardized). */
  def tCdf(df: Double, z: Double): Double = new TDistribution(null, df).cumulativeProbability(z)

  def tPpf(df: Double, q: Double): Double = {
    if (q <= 0.0) Double.NegativeInfinity
    else if (q >= 1.0) Double.PositiveInfinity
    else new TDistribution(null, df).inverseCumulativeProbability(q)
  }

  def fCdf(d1: Double, d2: Double, z: Double): Double =
    if (z <= 0.0) 0.0 else new FDistribution(null, d1, d2).cumulativeProbability(z)

  def fPpf(d1: Double, d2: Double, q: Double): Double = {
    if (q <= 0.0) 0.0
    else if (q >= 1.0) Double.PositiveInfinity
    else new FDistribution(null, d1, d2).inverseCumulativeProbability(q)
  }

  /** log(1 - exp(x)) for x < 0, numerically stable. */
  def log1mexp(x: Double): Double = {
    if (x >= 0.0) Double.NaN
    else if (x > -0.6931471805599453) math.log(-math.expm1(x))
    else math.log1p(-math.exp(x))
  }

  /** Kolmogorov distribution survival function: P(K > t) = 2 Σ (-1)^{j-1} e^{-2 j² t²}.
    * Matches the asymptotic tail the reference uses for discrete K-S
    * (reference: src/spark_bestfit/discrete_fitting.py:256-320).
    */
  def kolmogorovSf(t: Double): Double = {
    if (t <= 0.0) return 1.0
    if (t >= 4.0) return 0.0
    var sum = 0.0
    var j = 1
    var term = Double.MaxValue
    while (j <= 100 && math.abs(term) > 1e-16) {
      term = 2.0 * (if (j % 2 == 1) 1.0 else -1.0) * math.exp(-2.0 * j * j * t * t)
      sum += term
      j += 1
    }
    math.min(1.0, math.max(0.0, sum))
  }

  /** Sample moments matching numpy: population (ddof=0) variance,
    * Fisher skewness g1, excess kurtosis g2. Returns
    * (n, mean, std, skew, exkurtosis, min, max). */
  def moments(xs: Array[Double]): (Long, Double, Double, Double, Double, Double, Double) = {
    val n = xs.length
    if (n == 0) return (0L, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN)
    var s = 0.0; var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) { val v = xs(i); s += v; if (v < mn) mn = v; if (v > mx) mx = v; i += 1 }
    val mean = s / n
    var m2 = 0.0; var m3 = 0.0; var m4 = 0.0
    i = 0
    while (i < n) {
      val d = xs(i) - mean; val d2 = d * d
      m2 += d2; m3 += d2 * d; m4 += d2 * d2
      i += 1
    }
    m2 /= n; m3 /= n; m4 /= n
    val std = math.sqrt(m2)
    val skew = if (m2 > 0) m3 / math.pow(m2, 1.5) else 0.0
    val kurt = if (m2 > 0) m4 / (m2 * m2) - 3.0 else 0.0
    (n.toLong, mean, std, skew, kurt, mn, mx)
  }
}
