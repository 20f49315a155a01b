package graft.dists

import graft.functions.{SpecialMath => SM}
import org.apache.commons.math3.special.{Erf => CErf}
import ContinuousDist.{meanStd, minMax, median, quantile}
import ContinuousFamilies.ppfBisect

/** Tier-B continuous families — the second coverage wave toward the
  * reference's scipy registry (SURVEY.md §7.4). Same standardized-kernel
  * conventions as ContinuousFamilies; warm starts are moment/quantile
  * based with the shared Nelder-Mead polish.
  */
object ContinuousFamiliesB {

  /** asinh(x) = ln(x + sqrt(x^2+1)), stable for negative x via oddness. */
  @inline private def asinh(x: Double): Double = {
    val ax = math.abs(x)
    val r = math.log(ax + math.sqrt(ax * ax + 1.0))
    if (x >= 0) r else -r
  }

  /** Lomax (Pareto II): pdf0 = c(1+z)^{-c-1}, z ≥ 0. */
  object Lomax extends ContinuousDist with PositiveSupport {
    val name = "lomax"; val shapeNames = Seq("c")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) =
      if (z < 0) Double.NegativeInfinity else math.log(s(0)) - (s(0) + 1) * math.log1p(z)
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = if (z <= 0) 0.0 else 1 - math.pow(1 + z, -s(0))
    override def sf0(z: Double, s: Array[Double]) = if (z <= 0) 1.0 else math.pow(1 + z, -s(0))
    def ppf0(q: Double, s: Array[Double]) = math.pow(1 - q, -1.0 / s(0)) - 1
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val y = xs.map(_ - l)
      val m = y.sum / y.length
      Array(2.5, l, math.max(m * 1.5, 1e-9)) // c=2.5 start: finite mean zone
    }
  }

  /** Log-Laplace: pdf0 = (c/2)·z^{c−1} for z<1, (c/2)·z^{−c−1} for z≥1. */
  object LogLaplace extends ContinuousDist with PositiveSupport {
    val name = "loglaplace"; val shapeNames = Seq("c")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val c = s(0)
      if (z <= 0) Double.NegativeInfinity
      else math.log(c / 2) + (if (z < 1) (c - 1) * math.log(z) else -(c + 1) * math.log(z))
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = {
      val c = s(0)
      if (z <= 0) 0.0
      else if (z < 1) 0.5 * math.pow(z, c)
      else 1 - 0.5 * math.pow(z, -c)
    }
    def ppf0(q: Double, s: Array[Double]) = {
      val c = s(0)
      if (q < 0.5) math.pow(2 * q, 1.0 / c) else math.pow(2 * (1 - q), -1.0 / c)
    }
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val ly = xs.map(v => math.log(v - l))
      val med = median(ly)
      val mad = ly.map(v => math.abs(v - med)).sum / ly.length
      Array(math.max(1.0 / math.max(mad, 1e-9), 0.05), l, math.exp(med))
    }
  }

  /** Truncated exponential on [0, b]. */
  object TruncExpon extends ContinuousDist {
    val name = "truncexpon"; val shapeNames = Seq("b")
    override def a0(s: Array[Double]) = 0.0
    override def b0(s: Array[Double]) = s(0)
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) =
      if (z < 0 || z > s(0)) Double.NegativeInfinity
      else -z - math.log(-math.expm1(-s(0)))
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= 0) 0.0 else if (z >= s(0)) 1.0
      else math.expm1(-z) / math.expm1(-s(0))
    def ppf0(q: Double, s: Array[Double]) = -math.log1p(q * math.expm1(-s(0)))
    def warmStart(xs: Array[Double]) = {
      val (mn, mx) = minMax(xs)
      val span = math.max(mx - mn, 1e-300)
      val l = mn - 1e-4 * span
      val m = xs.map(_ - l).sum / xs.length
      val sc = math.max(m, 1e-9)
      Array(math.max((mx - l) / sc * 1.05, 0.1), l, sc)
    }
  }

  /** Bradford: cdf0 = ln(1+cz)/ln(1+c) on [0,1]. */
  object Bradford extends ContinuousDist {
    val name = "bradford"; val shapeNames = Seq("c")
    override def a0(s: Array[Double]) = 0.0
    override def b0(s: Array[Double]) = 1.0
    override def shapesValid(s: Array[Double]) = s(0) > 0
    def pdf0(z: Double, s: Array[Double]) = {
      val c = s(0)
      if (z < 0 || z > 1) 0.0 else c / ((1 + c * z) * math.log1p(c))
    }
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= 0) 0.0 else if (z >= 1) 1.0 else math.log1p(s(0) * z) / math.log1p(s(0))
    def ppf0(q: Double, s: Array[Double]) = math.expm1(q * math.log1p(s(0))) / s(0)
    def warmStart(xs: Array[Double]) = {
      val (mn, mx) = minMax(xs)
      val span = math.max(mx - mn, 1e-300)
      Array(1.0, mn - 1e-4 * span, span * (1 + 2e-4))
    }
  }

  /** Burr III (scipy burr): cdf0 = (1+z^{-c})^{-d}. */
  object Burr extends ContinuousDist with PositiveSupport {
    val name = "burr"; val shapeNames = Seq("c", "d")
    override def shapesValid(s: Array[Double]) = s(0) > 0 && s(1) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val c = s(0); val d = s(1)
      if (z <= 0) Double.NegativeInfinity
      else math.log(c * d) - (c + 1) * math.log(z) - (d + 1) * math.log1p(math.pow(z, -c))
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= 0) 0.0 else math.pow(1 + math.pow(z, -s(0)), -s(1))
    def ppf0(q: Double, s: Array[Double]) =
      math.pow(math.pow(q, -1.0 / s(1)) - 1, -1.0 / s(0))
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      Array(2.0, 1.0, l, math.max(median(xs.map(_ - l)), 1e-9))
    }
  }

  /** Burr XII: cdf0 = 1 − (1+z^c)^{-d}. */
  object Burr12 extends ContinuousDist with PositiveSupport {
    val name = "burr12"; val shapeNames = Seq("c", "d")
    override def shapesValid(s: Array[Double]) = s(0) > 0 && s(1) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val c = s(0); val d = s(1)
      if (z <= 0) Double.NegativeInfinity
      else math.log(c * d) + (c - 1) * math.log(z) - (d + 1) * math.log1p(math.pow(z, c))
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= 0) 0.0 else 1 - math.pow(1 + math.pow(z, s(0)), -s(1))
    override def sf0(z: Double, s: Array[Double]) =
      if (z <= 0) 1.0 else math.pow(1 + math.pow(z, s(0)), -s(1))
    def ppf0(q: Double, s: Array[Double]) =
      math.pow(math.pow(1 - q, -1.0 / s(1)) - 1, 1.0 / s(0))
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      Array(2.0, 1.0, l, math.max(median(xs.map(_ - l)), 1e-9))
    }
  }

  /** Johnson SU: cdf0 = Φ(a + b·asinh(z)). */
  object JohnsonSU extends ContinuousDist {
    val name = "johnsonsu"; val shapeNames = Seq("a", "b")
    override def shapesValid(s: Array[Double]) = s(1) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val t = s(0) + s(1) * asinh(z)
      math.log(s(1)) - 0.5 * math.log(z * z + 1) + SM.normLogPdf(t)
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = SM.normCdf(s(0) + s(1) * asinh(z))
    def ppf0(q: Double, s: Array[Double]) = math.sinh((SM.normPpf(q) - s(0)) / s(1))
    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      Array(0.0, 1.5, m, math.max(sd, 1e-9))
    }
  }

  /** Johnson SB: cdf0 = Φ(a + b·ln(z/(1−z))) on (0,1). */
  object JohnsonSB extends ContinuousDist {
    val name = "johnsonsb"; val shapeNames = Seq("a", "b")
    override def a0(s: Array[Double]) = 0.0
    override def b0(s: Array[Double]) = 1.0
    override def shapesValid(s: Array[Double]) = s(1) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      if (z <= 0 || z >= 1) Double.NegativeInfinity
      else {
        val t = s(0) + s(1) * math.log(z / (1 - z))
        math.log(s(1)) - math.log(z * (1 - z)) + SM.normLogPdf(t)
      }
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= 0) 0.0 else if (z >= 1) 1.0
      else SM.normCdf(s(0) + s(1) * math.log(z / (1 - z)))
    def ppf0(q: Double, s: Array[Double]) = {
      val e = math.exp((SM.normPpf(q) - s(0)) / s(1))
      e / (1 + e)
    }
    def warmStart(xs: Array[Double]) = {
      val (mn, mx) = minMax(xs)
      val span = math.max(mx - mn, 1e-300)
      Array(0.0, 1.0, mn - 1e-4 * span, span * (1 + 2e-4))
    }
  }

  /** Exponentially modified Gaussian (scipy exponnorm, shape K). */
  object ExponNorm extends ContinuousDist {
    val name = "exponnorm"; val shapeNames = Seq("K")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val k = s(0)
      val v = 1.0 / (2 * k * k) - z / k
      val arg = (1.0 / k - z) / SM.SqrtTwo
      // for large arg, exp(v)·erfc(arg) must be combined analytically:
      // log erfc(t) ≈ −t² − ln(t√π); v − arg² = −z²/2, which recovers the
      // normal log-density exactly as K → 0 (separate evaluation is ∞·0)
      val lerfc =
        if (arg > 20.0) -arg * arg - math.log(arg * math.sqrt(math.Pi))
        else math.log(math.max(CErf.erfc(arg), 1e-320))
      -math.log(2 * k) + v + lerfc
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = {
      val k = s(0)
      val t = z - 1.0 / k
      val w = 1.0 / (2 * k * k) - z / k
      val tail =
        if (t < -25.0) math.exp(-z * z / 2) / (math.abs(t) * SM.SqrtTwoPi)
        else math.exp(w) * SM.normCdf(t)
      math.min(1.0, math.max(0.0, SM.normCdf(z) - tail))
    }
    def ppf0(q: Double, s: Array[Double]) = ppfBisect(this, q, s,
      Double.NegativeInfinity, Double.PositiveInfinity)
    def warmStart(xs: Array[Double]) = {
      val (n, m, sd, skew, _, _, _) = SM.moments(xs)
      // skew γ = 2K³/(1+K²)^{3/2}: invert roughly
      val g = math.min(math.max(skew, 0.01), 1.9)
      val k = math.max(0.05, math.pow(g / 2, 1.0 / 3) * (1 + g))
      val sc = sd / math.sqrt(1 + k * k)
      Array(k, m - sc * k, math.max(sc, 1e-9))
    }
  }

  /** Folded normal |N(c,1)|. */
  object FoldNorm extends ContinuousDist with PositiveSupport {
    val name = "foldnorm"; val shapeNames = Seq("c")
    override def shapesValid(s: Array[Double]) = s(0) >= 0
    def pdf0(z: Double, s: Array[Double]) = {
      val c = s(0)
      if (z < 0) 0.0
      else SM.normPdf(z - c) + SM.normPdf(z + c)
    }
    def cdf0(z: Double, s: Array[Double]) = {
      val c = s(0)
      if (z <= 0) 0.0 else SM.normCdf(z - c) + SM.normCdf(z + c) - 1.0
    }
    def ppf0(q: Double, s: Array[Double]) = ppfBisect(this, q, s, 0.0, Double.PositiveInfinity)
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val y = xs.map(_ - l)
      val (m, sd) = meanStd(y)
      Array(math.max(m / math.max(sd, 1e-9), 0.1), l, math.max(sd, 1e-9))
    }
  }

  /** Inverse Weibull (Fréchet): cdf0 = exp(−z^{−c}), z > 0. */
  object InvWeibull extends ContinuousDist with PositiveSupport {
    val name = "invweibull"; val shapeNames = Seq("c")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val c = s(0)
      if (z <= 0) Double.NegativeInfinity
      else math.log(c) - (c + 1) * math.log(z) - math.pow(z, -c)
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = if (z <= 0) 0.0 else math.exp(-math.pow(z, -c0(s)))
    private def c0(s: Array[Double]) = s(0)
    def ppf0(q: Double, s: Array[Double]) = math.pow(-math.log(q), -1.0 / s(0))
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val ly = xs.map(v => math.log(v - l))
      val sd = meanStd(ly)._2
      Array(math.max(math.Pi / (math.sqrt(6) * math.max(sd, 1e-9)), 0.2), l, math.exp(median(ly)))
    }
  }

  /** Generalized logistic (type I): cdf0 = (1+e^{−z})^{−c}. */
  object GenLogistic extends ContinuousDist {
    val name = "genlogistic"; val shapeNames = Seq("c")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) =
      math.log(s(0)) - z - (s(0) + 1) * math.log1p(math.exp(-z))
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = math.pow(1 + math.exp(-z), -s(0))
    def ppf0(q: Double, s: Array[Double]) = -math.log(math.pow(q, -1.0 / s(0)) - 1)
    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      Array(1.0, m, math.max(sd * math.sqrt(3) / math.Pi, 1e-9))
    }
  }

  /** Double gamma: pdf0 = |z|^{a−1} e^{−|z|} / (2Γ(a)). */
  object DGamma extends ContinuousDist {
    val name = "dgamma"; val shapeNames = Seq("a")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val az = math.abs(z)
      if (az == 0 && s(0) < 1) Double.NegativeInfinity
      else (s(0) - 1) * math.log(az) - az - math.log(2.0) - SM.lgamma(s(0))
    }
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val a = s(0); val k = math.log(2.0) + SM.lgamma(a)
      var ll = 0.0; var i = 0
      while (i < zs.length) {
        val az = math.abs(zs(i))
        if (az == 0 && a < 1) return Double.NegativeInfinity
        ll += (a - 1) * math.log(az) - az
        i += 1
      }
      ll - zs.length * k
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = {
      val g = SM.gammaInc(s(0), math.abs(z))
      if (z >= 0) 0.5 + 0.5 * g else 0.5 - 0.5 * g
    }
    def ppf0(q: Double, s: Array[Double]) = {
      if (q == 0.5) 0.0
      else {
        val g = SM.gammaIncInv(s(0), math.abs(2 * q - 1))
        if (q > 0.5) g else -g
      }
    }
    def warmStart(xs: Array[Double]) = {
      val med = median(xs)
      val y = xs.map(v => math.abs(v - med))
      val m = y.sum / y.length
      Array(math.max(m * m / math.max(meanStd(y)._2, 1e-9) / m, 0.3), med,
        math.max(meanStd(y)._2 / 2, 1e-9))
    }
  }

  /** Double Weibull: pdf0 = (c/2)|z|^{c−1} e^{−|z|^c}. */
  object DWeibull extends ContinuousDist {
    val name = "dweibull"; val shapeNames = Seq("c")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val c = s(0); val az = math.abs(z)
      if (az == 0 && c < 1) Double.NegativeInfinity
      else math.log(c / 2) + (c - 1) * math.log(az) - math.pow(az, c)
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = {
      val t = 0.5 * math.exp(-math.pow(math.abs(z), s(0)))
      if (z >= 0) 1 - t else t
    }
    def ppf0(q: Double, s: Array[Double]) = {
      if (q == 0.5) 0.0
      else if (q > 0.5) math.pow(-math.log(2 * (1 - q)), 1.0 / s(0))
      else -math.pow(-math.log(2 * q), 1.0 / s(0))
    }
    def warmStart(xs: Array[Double]) = {
      val med = median(xs)
      Array(1.2, med, math.max(xs.map(v => math.abs(v - med)).sum / xs.length, 1e-9))
    }
  }

  /** Hyperbolic secant: cdf0 = (2/π)·atan(e^z). */
  object HypSecant extends ContinuousDist {
    val name = "hypsecant"; val shapeNames = Seq.empty
    def pdf0(z: Double, s: Array[Double]) = 1.0 / (math.Pi * math.cosh(z))
    override def logpdf0(z: Double, s: Array[Double]) = {
      val az = math.abs(z)
      -math.log(math.Pi) - az - math.log1p(math.exp(-2 * az)) + math.log(2.0)
    }
    def cdf0(z: Double, s: Array[Double]) = 2.0 / math.Pi * math.atan(math.exp(z))
    def ppf0(q: Double, s: Array[Double]) = math.log(math.tan(math.Pi * q / 2))
    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      Array(m, math.max(sd * 2 / math.Pi, 1e-9))
    }
  }

  /** Semicircular on [−1, 1]. */
  object Semicircular extends ContinuousDist {
    val name = "semicircular"; val shapeNames = Seq.empty
    override def a0(s: Array[Double]) = -1.0
    override def b0(s: Array[Double]) = 1.0
    def pdf0(z: Double, s: Array[Double]) =
      if (z < -1 || z > 1) 0.0 else 2.0 / math.Pi * math.sqrt(1 - z * z)
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= -1) 0.0 else if (z >= 1) 1.0
      else 0.5 + (z * math.sqrt(1 - z * z) + math.asin(z)) / math.Pi
    def ppf0(q: Double, s: Array[Double]) = ppfBisect(this, q, s, -1.0, 1.0)
    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      Array(m, math.max(sd * 2, 1e-9)) // std of semicircle = R/2
    }
  }

  /** Anglit on [−π/4, π/4]: cdf0 = sin²(z + π/4). */
  object Anglit extends ContinuousDist {
    val name = "anglit"; val shapeNames = Seq.empty
    override def a0(s: Array[Double]) = -math.Pi / 4
    override def b0(s: Array[Double]) = math.Pi / 4
    def pdf0(z: Double, s: Array[Double]) =
      if (z < -math.Pi / 4 || z > math.Pi / 4) 0.0 else math.cos(2 * z)
    def cdf0(z: Double, s: Array[Double]) = {
      if (z <= -math.Pi / 4) 0.0 else if (z >= math.Pi / 4) 1.0
      else { val v = math.sin(z + math.Pi / 4); v * v }
    }
    def ppf0(q: Double, s: Array[Double]) = math.asin(math.sqrt(q)) - math.Pi / 4
    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      Array(m, math.max(sd / 0.338, 1e-9))
    }
  }

  /** Moyal: cdf0 = erfc(e^{−z/2}/√2). */
  object Moyal extends ContinuousDist {
    val name = "moyal"; val shapeNames = Seq.empty
    override def logpdf0(z: Double, s: Array[Double]) =
      -0.5 * (z + math.exp(-z)) - SM.LnSqrtTwoPi
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = CErf.erfc(math.exp(-z / 2) / SM.SqrtTwo)
    def ppf0(q: Double, s: Array[Double]) =
      -2.0 * math.log(SM.SqrtTwo * CErf.erfcInv(q))
    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      val sc = math.max(sd / (math.Pi / math.sqrt(2)), 1e-9)
      Array(m - sc * (SM.EulerGamma + math.log(2.0)), sc)
    }
  }

  /** Lévy: cdf0 = erfc(1/√(2z)), z > 0. */
  object Levy extends ContinuousDist with PositiveSupport {
    val name = "levy"; val shapeNames = Seq.empty
    override def logpdf0(z: Double, s: Array[Double]) =
      if (z <= 0) Double.NegativeInfinity
      else -SM.LnSqrtTwoPi - 1.5 * math.log(z) - 1.0 / (2 * z)
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= 0) 0.0 else CErf.erfc(1.0 / math.sqrt(2 * z))
    def ppf0(q: Double, s: Array[Double]) = {
      val u = CErf.erfcInv(q)
      1.0 / (2 * u * u)
    }
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      Array(l, math.max(median(xs.map(_ - l)) * 2 * math.pow(CErf.erfcInv(0.5), 2), 1e-9))
    }
  }

  /** Lévy left-skewed (mirror of Levy on −x). */
  object LevyL extends ContinuousDist {
    val name = "levy_l"; val shapeNames = Seq.empty
    override def b0(s: Array[Double]) = 0.0
    override def logpdf0(z: Double, s: Array[Double]) = Levy.logpdf0(-z, s)
    def pdf0(z: Double, s: Array[Double]) = Levy.pdf0(-z, s)
    def cdf0(z: Double, s: Array[Double]) = if (z >= 0) 1.0 else 1.0 - Levy.cdf0(-z, s)
    def ppf0(q: Double, s: Array[Double]) = -Levy.ppf0(1 - q, s)
    def warmStart(xs: Array[Double]) = {
      val w = Levy.warmStart(xs.map(-_))
      Array(-w(0), w(1))
    }
  }

  /** Exponentiated Weibull: cdf0 = (1 − e^{−z^c})^a. */
  object ExponWeib extends ContinuousDist with PositiveSupport {
    val name = "exponweib"; val shapeNames = Seq("a", "c")
    override def shapesValid(s: Array[Double]) = s(0) > 0 && s(1) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val a = s(0); val c = s(1)
      if (z <= 0) Double.NegativeInfinity
      else {
        val zc = math.pow(z, c)
        math.log(a * c) + (a - 1) * math.log(-math.expm1(-zc)) - zc + (c - 1) * math.log(z)
      }
    }
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val a = s(0); val c = s(1); val k = math.log(a * c)
      var ll = 0.0; var i = 0
      while (i < zs.length) {
        val z = zs(i)
        if (z <= 0) return Double.NegativeInfinity
        val zc = math.pow(z, c)
        ll += (a - 1) * math.log(-math.expm1(-zc)) - zc + (c - 1) * math.log(z)
        i += 1
      }
      ll + zs.length * k
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= 0) 0.0 else math.pow(-math.expm1(-math.pow(z, s(1))), s(0))
    def ppf0(q: Double, s: Array[Double]) =
      math.pow(-math.log1p(-math.pow(q, 1.0 / s(0))), 1.0 / s(1))
    def warmStart(xs: Array[Double]) = {
      val w = ContinuousFamilies.WeibullMin.warmStart(xs)
      Array(1.0, w(0), w(1), w(2))
    }
  }

  /** Gilbrat = lognorm with s = 1 fixed (loc/scale only). */
  object Gilbrat extends ContinuousDist with PositiveSupport {
    val name = "gilbrat"; val shapeNames = Seq.empty
    private val one = Array(1.0)
    override def logpdf0(z: Double, s: Array[Double]) = ContinuousFamilies.LogNorm.logpdf0(z, one)
    def pdf0(z: Double, s: Array[Double]) = ContinuousFamilies.LogNorm.pdf0(z, one)
    def cdf0(z: Double, s: Array[Double]) = ContinuousFamilies.LogNorm.cdf0(z, one)
    def ppf0(q: Double, s: Array[Double]) = ContinuousFamilies.LogNorm.ppf0(q, one)
    def warmStart(xs: Array[Double]) = {
      val w = ContinuousFamilies.LogNorm.warmStart(xs)
      Array(w(1), w(2))
    }
  }

  val all: Seq[ContinuousDist] = Seq(
    Lomax, LogLaplace, TruncExpon, Bradford, Burr, Burr12, JohnsonSU,
    JohnsonSB, ExponNorm, FoldNorm, InvWeibull, GenLogistic, DGamma,
    DWeibull, HypSecant, Semicircular, Anglit, Moyal, Levy, LevyL,
    ExponWeib, Gilbrat)
}
