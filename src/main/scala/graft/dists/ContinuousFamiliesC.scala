package graft.dists

import graft.functions.{SpecialMath => SM}
import ContinuousDist.{meanStd, minMax, median, quantile}
import ContinuousFamilies.ppfBisect

/** Tier-C continuous families — third coverage wave toward the
  * reference's scipy registry (reference: src/spark_bestfit/
  * distributions.py:33-164 keeps ~87 scipy defaults; SURVEY.md §7.4).
  * Same standardized-kernel conventions as ContinuousFamilies: the
  * parameter vector is shapes ++ [loc, scale], densities are implemented
  * over z = (x − loc)/scale.
  */
object ContinuousFamiliesC {

  /** Owen's T function T(h, a), reduced to |a| ≤ 1 via the standard
    * identity then integrated with composite Simpson — plenty for the
    * 1e-10 accuracy the skew-normal CDF needs. */
  private[dists] def owensT(h: Double, a: Double): Double = {
    if (a == 0.0) return 0.0
    if (a < 0.0) return -owensT(h, -a)
    if (a > 1.0) {
      // T(h,a) = ½[Φ(h) + Φ(ah)] − Φ(h)Φ(ah) − T(ah, 1/a)
      val ph = SM.normCdf(h); val pah = SM.normCdf(a * h)
      return 0.5 * (ph + pah) - ph * pah - owensT(a * h, 1.0 / a)
    }
    val n = 64
    val w = a / n
    val h2 = h * h
    @inline def f(t: Double): Double = math.exp(-0.5 * h2 * (1 + t * t)) / (1 + t * t)
    var s = f(0.0) + f(a)
    var i = 1
    while (i < n) { s += (if (i % 2 == 1) 4.0 else 2.0) * f(i * w); i += 1 }
    s * w / 3.0 / (2 * math.Pi)
  }

  /** Alpha: pdf0 = φ(a − 1/z)/(z²Φ(a)), z > 0. */
  object Alpha extends ContinuousDist with PositiveSupport {
    val name = "alpha"; val shapeNames = Seq("a")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) =
      if (z <= 0) Double.NegativeInfinity
      else SM.normLogPdf(s(0) - 1.0 / z) - 2 * math.log(z) - math.log(SM.normCdf(s(0)))
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= 0) 0.0 else SM.normCdf(s(0) - 1.0 / z) / SM.normCdf(s(0))
    def ppf0(q: Double, s: Array[Double]): Double = {
      val u = s(0) - SM.normPpf(q * SM.normCdf(s(0)))
      if (u <= 0) Double.PositiveInfinity else 1.0 / u
    }
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val a = s(0); val c = math.log(SM.normCdf(a)) // shape-only Φ(a) hoisted
      var ll = 0.0; var i = 0
      while (i < zs.length) {
        val z = zs(i)
        if (z <= 0) return Double.NegativeInfinity
        ll += SM.normLogPdf(a - 1.0 / z) - 2 * math.log(z)
        i += 1
      }
      ll - zs.length * c
    }
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val med = median(xs) - l
      val a = 2.0
      Array(a, l, math.max(med * (a - SM.normPpf(0.5 * SM.normCdf(a))), 1e-9))
    }
  }

  /** Birnbaum–Saunders (fatigue-life): cdf0 = Φ((√z − 1/√z)/c). */
  object FatigueLife extends ContinuousDist with PositiveSupport {
    val name = "fatiguelife"; val shapeNames = Seq("c")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val c = s(0)
      if (z <= 0) Double.NegativeInfinity
      else {
        val sq = math.sqrt(z)
        val u = (sq - 1.0 / sq) / c
        SM.normLogPdf(u) + math.log((sq + 1.0 / sq) / (2 * c * z))
      }
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= 0) 0.0 else SM.normCdf((math.sqrt(z) - 1.0 / math.sqrt(z)) / s(0))
    def ppf0(q: Double, s: Array[Double]): Double = {
      val u = s(0) * SM.normPpf(q)
      val r = (u + math.sqrt(u * u + 4)) / 2
      r * r
    }
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val y = xs.map(_ - l)
      val sc = math.max(median(y), 1e-9)
      val m = y.sum / y.length / sc
      Array(math.sqrt(math.max(2 * (m - 1), 0.01)), l, sc)
    }
  }

  /** Folded Cauchy: pdf0 = [C(z−c) + C(z+c)], z ≥ 0, C = standard Cauchy. */
  object FoldCauchy extends ContinuousDist with PositiveSupport {
    val name = "foldcauchy"; val shapeNames = Seq("c")
    override def shapesValid(s: Array[Double]) = s(0) >= 0
    def pdf0(z: Double, s: Array[Double]): Double = {
      val c = s(0)
      if (z < 0) 0.0
      else (1.0 / (1 + (z - c) * (z - c)) + 1.0 / (1 + (z + c) * (z + c))) / math.Pi
    }
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= 0) 0.0
      else (math.atan(z - s(0)) + math.atan(z + s(0))) / math.Pi
    def ppf0(q: Double, s: Array[Double]) = ppfBisect(this, q, s, 0.0, Double.PositiveInfinity)
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val y = xs.map(_ - l)
      val med = median(y)
      val mad = y.map(v => math.abs(v - med)).sorted.apply(y.length / 2)
      Array(math.max(med / math.max(mad, 1e-9), 0.1), l, math.max(mad, 1e-9))
    }
  }

  /** Fisher F(dfn, dfd). */
  object FDist extends ContinuousDist with PositiveSupport {
    val name = "f"; val shapeNames = Seq("dfn", "dfd")
    override def shapesValid(s: Array[Double]) = s(0) > 0 && s(1) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val m = s(0); val n = s(1)
      if (z <= 0) Double.NegativeInfinity
      else (m / 2) * math.log(m) + (n / 2) * math.log(n) + (m / 2 - 1) * math.log(z) -
        ((m + n) / 2) * math.log(n + m * z) - SM.lbeta(m / 2, n / 2)
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= 0) 0.0 else SM.betaInc(s(0) / 2, s(1) / 2, s(0) * z / (s(0) * z + s(1)))
    def ppf0(q: Double, s: Array[Double]): Double = {
      val u = SM.betaIncInv(s(0) / 2, s(1) / 2, q)
      if (u >= 1.0) Double.PositiveInfinity else s(1) * u / (s(0) * (1 - u))
    }
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val m = s(0); val n = s(1)
      val c = (m / 2) * math.log(m) + (n / 2) * math.log(n) - SM.lbeta(m / 2, n / 2)
      var ll = 0.0; var i = 0
      while (i < zs.length) {
        val z = zs(i)
        if (z <= 0) return Double.NegativeInfinity
        ll += (m / 2 - 1) * math.log(z) - ((m + n) / 2) * math.log(n + m * z)
        i += 1
      }
      ll + zs.length * c
    }
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val y = xs.map(_ - l)
      val m = y.sum / y.length
      // mean = n/(n−2) for the standardized F; pick dfd from it
      val dfd = math.max(2 * m / math.max(m - 1, 0.05), 5.0)
      Array(5.0, dfd, l, 1.0)
    }
  }

  /** Generalized normal: pdf0 = β e^{−|z|^β} / (2Γ(1/β)). */
  object GenNorm extends ContinuousDist {
    val name = "gennorm"; val shapeNames = Seq("beta")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val b = s(0)
      math.log(b / 2) - SM.lgamma(1.0 / b) - math.pow(math.abs(z), b)
    }
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val b = s(0); val k = math.log(b / 2) - SM.lgamma(1.0 / b)
      var ll = 0.0; var i = 0
      while (i < zs.length) { ll -= math.pow(math.abs(zs(i)), b); i += 1 }
      ll + zs.length * k
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]): Double = {
      val b = s(0)
      val half = 0.5 * SM.gammaInc(1.0 / b, math.pow(math.abs(z), b))
      if (z >= 0) 0.5 + half else 0.5 - half
    }
    def ppf0(q: Double, s: Array[Double]): Double = {
      val b = s(0)
      if (q == 0.5) 0.0
      else {
        val u = math.pow(SM.gammaIncInv(1.0 / b, math.abs(2 * q - 1)), 1.0 / b)
        if (q > 0.5) u else -u
      }
    }
    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      Array(1.5, m, math.max(sd, 1e-9))
    }
  }

  /** Half generalized normal: pdf0 = β e^{−z^β}/Γ(1/β), z ≥ 0. */
  object HalfGenNorm extends ContinuousDist with PositiveSupport {
    val name = "halfgennorm"; val shapeNames = Seq("beta")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) =
      if (z < 0) Double.NegativeInfinity
      else math.log(s(0)) - SM.lgamma(1.0 / s(0)) - math.pow(z, s(0))
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val b = s(0); val k = math.log(b) - SM.lgamma(1.0 / b)
      var ll = 0.0; var i = 0
      while (i < zs.length) {
        val z = zs(i)
        if (z < 0) return Double.NegativeInfinity
        ll -= math.pow(z, b)
        i += 1
      }
      ll + zs.length * k
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= 0) 0.0 else SM.gammaInc(1.0 / s(0), math.pow(z, s(0)))
    def ppf0(q: Double, s: Array[Double]) =
      math.pow(SM.gammaIncInv(1.0 / s(0), q), 1.0 / s(0))
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val y = xs.map(_ - l)
      val (m, sd) = meanStd(y)
      Array(1.5, l, math.max(sd, 1e-9))
    }
  }

  /** Inverse gamma: pdf0 = z^{−a−1} e^{−1/z}/Γ(a). */
  object InvGamma extends ContinuousDist with PositiveSupport {
    val name = "invgamma"; val shapeNames = Seq("a")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) =
      if (z <= 0) Double.NegativeInfinity
      else -(s(0) + 1) * math.log(z) - 1.0 / z - SM.lgamma(s(0))
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= 0) 0.0 else SM.gammaIncC(s(0), 1.0 / z)
    def ppf0(q: Double, s: Array[Double]): Double = {
      val x = SM.gammaIncInv(s(0), 1 - q)
      if (x <= 0) Double.PositiveInfinity else 1.0 / x
    }
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val a = s(0); val c = SM.lgamma(a)
      var ll = 0.0; var i = 0
      while (i < zs.length) {
        val z = zs(i)
        if (z <= 0) return Double.NegativeInfinity
        ll += -(a + 1) * math.log(z) - 1.0 / z
        i += 1
      }
      ll - zs.length * c
    }
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val y = xs.map(_ - l)
      val (m, sd) = meanStd(y)
      val v = sd * sd
      val a = math.max(m * m / math.max(v, 1e-12) + 2, 2.1)
      Array(a, l, math.max(m * (a - 1), 1e-9))
    }
  }

  /** Log-gamma: pdf0 = e^{cz − e^z}/Γ(c). */
  object LogGamma extends ContinuousDist {
    val name = "loggamma"; val shapeNames = Seq("c")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) =
      s(0) * z - math.exp(z) - SM.lgamma(s(0))
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = SM.gammaInc(s(0), math.exp(z))
    def ppf0(q: Double, s: Array[Double]) = math.log(SM.gammaIncInv(s(0), q))
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val c0 = s(0); val c = SM.lgamma(c0)
      var ll = 0.0; var i = 0
      while (i < zs.length) { val z = zs(i); ll += c0 * z - math.exp(z); i += 1 }
      ll - zs.length * c
    }
    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      // c from the skewness-free moment pair: mean = ψ(c), var = ψ′(c)
      var c = 1.0
      var i = 0
      while (i < 20) { c = math.max(c - (SM.digamma(c)) / SM.trigamma(c), 0.05); i += 1 }
      val sc = sd / math.sqrt(SM.trigamma(c))
      Array(c, m - SM.digamma(c) * sc, math.max(sc, 1e-9))
    }
  }

  /** Log-uniform (reciprocal): pdf0 = 1/(z ln(b/a)), a ≤ z ≤ b. */
  object LogUniform extends ContinuousDist {
    val name = "loguniform"; val shapeNames = Seq("a", "b")
    override def a0(s: Array[Double]) = s(0)
    override def b0(s: Array[Double]) = s(1)
    override def shapesValid(s: Array[Double]) = s(0) > 0 && s(1) > s(0)
    override protected def defaultShapes = Array(1.0, 2.0)
    override def logpdf0(z: Double, s: Array[Double]) =
      if (z < s(0) || z > s(1)) Double.NegativeInfinity
      else -math.log(z) - math.log(math.log(s(1) / s(0)))
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= s(0)) 0.0 else if (z >= s(1)) 1.0
      else math.log(z / s(0)) / math.log(s(1) / s(0))
    def ppf0(q: Double, s: Array[Double]) = s(0) * math.pow(s(1) / s(0), q)
    def warmStart(xs: Array[Double]) = {
      val (mn, mx) = minMax(xs)
      val span = math.max(mx - mn, 1e-9)
      // keep loc = 0, scale = 1; the shapes carry the range directly
      if (mn > 0) Array(mn * 0.9999, mx * 1.0001, 0.0, 1.0)
      else Array(1e-6, span * 1.001, mn - span * 1e-4, 1.0)
    }
  }

  /** Skew-normal: pdf0 = 2φ(z)Φ(az); cdf via Owen's T. */
  object SkewNorm extends ContinuousDist {
    val name = "skewnorm"; val shapeNames = Seq("a")
    override def logpdf0(z: Double, s: Array[Double]) = {
      val t = SM.normCdf(s(0) * z)
      if (t <= 0) Double.NegativeInfinity
      else math.log(2.0) + SM.normLogPdf(z) + math.log(t)
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]): Double = {
      val v = SM.normCdf(z) - 2 * owensT(z, s(0))
      math.min(1.0, math.max(0.0, v))
    }
    def ppf0(q: Double, s: Array[Double]) =
      ppfBisect(this, q, s, Double.NegativeInfinity, Double.PositiveInfinity)
    def warmStart(xs: Array[Double]) = {
      val (n, m, sd, g1, _, _, _) = SM.moments(xs)
      // method-of-moments δ from sample skewness, clamped inside (−1, 1)
      val b = math.pow(math.abs(g1), 2.0 / 3.0)
      val c = math.pow((4 - math.Pi) / 2, 2.0 / 3.0)
      val delta0 = math.sqrt(math.Pi / 2 * b / (b + c))
      val delta = math.min(0.98, delta0) * (if (g1 >= 0) 1 else -1)
      val a = delta / math.sqrt(math.max(1 - delta * delta, 1e-6))
      val sc = sd / math.sqrt(math.max(1 - 2 * delta * delta / math.Pi, 1e-6))
      Array(a, m - sc * delta * math.sqrt(2 / math.Pi), math.max(sc, 1e-9))
    }
  }

  /** Skew-Cauchy: pdf0 = 1/(π[(z/(1+a·sgn z))² + 1]). */
  object SkewCauchy extends ContinuousDist {
    val name = "skewcauchy"; val shapeNames = Seq("a")
    override def shapesValid(s: Array[Double]) = math.abs(s(0)) < 1
    def pdf0(z: Double, s: Array[Double]): Double = {
      val w = 1 + s(0) * math.signum(z)
      val u = z / w
      1.0 / (math.Pi * (u * u + 1))
    }
    def cdf0(z: Double, s: Array[Double]): Double = {
      val a = s(0)
      if (z < 0) (1 - a) * (0.5 + math.atan(z / (1 - a)) / math.Pi)
      else (1 - a) / 2 + (1 + a) * (math.atan(z / (1 + a)) / math.Pi)
    }
    def ppf0(q: Double, s: Array[Double]): Double = {
      val a = s(0)
      val qm = (1 - a) / 2
      if (q < qm) (1 - a) * math.tan(math.Pi * (q / (1 - a) - 0.5))
      else (1 + a) * math.tan(math.Pi * (q - qm) / (1 + a))
    }
    def warmStart(xs: Array[Double]) = {
      val med = median(xs)
      val y = xs.map(v => math.abs(v - med)).sorted
      val mad = y(y.length / 2)
      val (_, _, _, g1, _, _, _) = SM.moments(xs)
      Array(math.max(-0.9, math.min(0.9, g1 / 5)), med, math.max(mad, 1e-9))
    }
  }

  /** Trapezoidal on [0,1] with corners c ≤ d. */
  object Trapezoid extends ContinuousDist {
    val name = "trapezoid"; val shapeNames = Seq("c", "d")
    override def a0(s: Array[Double]) = 0.0
    override def b0(s: Array[Double]) = 1.0
    override def shapesValid(s: Array[Double]) =
      s(0) >= 0 && s(1) <= 1 && s(0) <= s(1)
    override protected def defaultShapes = Array(0.25, 0.75)
    private def h(s: Array[Double]): Double = 2.0 / (s(1) - s(0) + 1)
    def pdf0(z: Double, s: Array[Double]): Double = {
      val c = s(0); val d = s(1)
      if (z < 0 || z > 1) 0.0
      else if (z < c) h(s) * z / math.max(c, 1e-300)
      else if (z <= d) h(s)
      else h(s) * (1 - z) / math.max(1 - d, 1e-300)
    }
    def cdf0(z: Double, s: Array[Double]): Double = {
      val c = s(0); val d = s(1)
      if (z <= 0) 0.0
      else if (z >= 1) 1.0
      else if (z < c) h(s) * z * z / (2 * math.max(c, 1e-300))
      else if (z <= d) h(s) * (z - c / 2)
      else 1 - h(s) * (1 - z) * (1 - z) / (2 * math.max(1 - d, 1e-300))
    }
    def ppf0(q: Double, s: Array[Double]): Double = {
      val c = s(0); val d = s(1)
      val fc = cdf0(c, s); val fd = cdf0(d, s)
      if (q <= fc) math.sqrt(2 * q * c / h(s))
      else if (q <= fd) q / h(s) + c / 2
      else 1 - math.sqrt(2 * (1 - q) * (1 - d) / h(s))
    }
    def warmStart(xs: Array[Double]) = {
      val (mn, mx) = minMax(xs)
      val span = math.max(mx - mn, 1e-9)
      Array(0.25, 0.75, mn - span * 0.005, span * 1.01)
    }
  }

  /** Truncated normal on [a, b]. */
  object TruncNorm extends ContinuousDist {
    val name = "truncnorm"; val shapeNames = Seq("a", "b")
    override def a0(s: Array[Double]) = s(0)
    override def b0(s: Array[Double]) = s(1)
    override def shapesValid(s: Array[Double]) = s(0) < s(1)
    override protected def defaultShapes = Array(0.0, 1.0)
    private def delta(s: Array[Double]): Double =
      math.max(SM.normCdf(s(1)) - SM.normCdf(s(0)), 1e-300)
    override def logpdf0(z: Double, s: Array[Double]) =
      if (z < s(0) || z > s(1)) Double.NegativeInfinity
      else SM.normLogPdf(z) - math.log(delta(s))
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= s(0)) 0.0 else if (z >= s(1)) 1.0
      else (SM.normCdf(z) - SM.normCdf(s(0))) / delta(s)
    def ppf0(q: Double, s: Array[Double]) =
      SM.normPpf(SM.normCdf(s(0)) + q * delta(s))
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val a = s(0); val b = s(1); val c = math.log(delta(s)) // 2 Φ calls hoisted
      var ll = 0.0; var i = 0
      while (i < zs.length) {
        val z = zs(i)
        if (z < a || z > b) return Double.NegativeInfinity
        ll += SM.normLogPdf(z)
        i += 1
      }
      ll - zs.length * c
    }
    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      val (mn, mx) = minMax(xs)
      val s0 = math.max(sd, 1e-9)
      Array((mn - m) / s0 * 1.05, (mx - m) / s0 * 1.05, m, s0)
    }
  }

  /** Truncated Pareto on [1, c]: pdf0 = b z^{−b−1}/(1 − c^{−b}). */
  object TruncPareto extends ContinuousDist {
    val name = "truncpareto"; val shapeNames = Seq("b", "c")
    override def a0(s: Array[Double]) = 1.0
    override def b0(s: Array[Double]) = s(1)
    override def shapesValid(s: Array[Double]) = s(0) > 0 && s(1) > 1
    override protected def defaultShapes = Array(2.0, 10.0)
    override def logpdf0(z: Double, s: Array[Double]) =
      if (z < 1 || z > s(1)) Double.NegativeInfinity
      else math.log(s(0)) - (s(0) + 1) * math.log(z) -
        math.log1p(-math.pow(s(1), -s(0)))
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= 1) 0.0 else if (z >= s(1)) 1.0
      else (1 - math.pow(z, -s(0))) / (1 - math.pow(s(1), -s(0)))
    def ppf0(q: Double, s: Array[Double]) =
      math.pow(1 - q * (1 - math.pow(s(1), -s(0))), -1.0 / s(0))
    def warmStart(xs: Array[Double]) = {
      val (mn, mx) = minMax(xs)
      val sc = math.max(mn * 0.9999, 1e-9)
      Array(1.5, mx / sc * 1.001, 0.0, sc)
    }
  }

  /** Truncated Weibull-min on [a, b] (shape c). */
  object TruncWeibullMin extends ContinuousDist {
    val name = "truncweibull_min"; val shapeNames = Seq("c", "a", "b")
    override def a0(s: Array[Double]) = s(1)
    override def b0(s: Array[Double]) = s(2)
    override def shapesValid(s: Array[Double]) =
      s(0) > 0 && s(1) >= 0 && s(2) > s(1)
    override protected def defaultShapes = Array(1.0, 0.0, 1.0)
    private def mass(s: Array[Double]): Double = {
      val ea = math.exp(-math.pow(s(1), s(0)))
      val eb = math.exp(-math.pow(s(2), s(0)))
      math.max(ea - eb, 1e-300)
    }
    override def logpdf0(z: Double, s: Array[Double]) =
      if (z < s(1) || z > s(2)) Double.NegativeInfinity
      else math.log(s(0)) + (s(0) - 1) * math.log(z) - math.pow(z, s(0)) - math.log(mass(s))
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]): Double = {
      if (z <= s(1)) 0.0 else if (z >= s(2)) 1.0
      else (math.exp(-math.pow(s(1), s(0))) - math.exp(-math.pow(z, s(0)))) / mass(s)
    }
    def ppf0(q: Double, s: Array[Double]): Double = {
      val u = math.exp(-math.pow(s(1), s(0))) - q * mass(s)
      math.pow(-math.log(math.max(u, 1e-300)), 1.0 / s(0))
    }
    def warmStart(xs: Array[Double]) = {
      val w = ContinuousFamilies.WeibullMin.warmStart(xs) // (c, loc, scale)
      val (mn, mx) = minMax(xs)
      val sc = w(2)
      val lo = math.max((mn - w(1)) / sc * 0.95, 0.0)
      val hi = (mx - w(1)) / sc * 1.05
      Array(w(0), lo, math.max(hi, lo + 1e-6), w(1), sc)
    }
  }

  /** Power-normal: pdf0 = c φ(z) Φ(−z)^{c−1}. */
  object PowerNorm extends ContinuousDist {
    val name = "powernorm"; val shapeNames = Seq("c")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val t = SM.normCdf(-z)
      if (t <= 0) Double.NegativeInfinity
      else math.log(s(0)) + SM.normLogPdf(z) + (s(0) - 1) * math.log(t)
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = 1 - math.pow(SM.normCdf(-z), s(0))
    def ppf0(q: Double, s: Array[Double]) = -SM.normPpf(math.pow(1 - q, 1.0 / s(0)))
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val c0 = s(0); val c = math.log(c0)
      var ll = 0.0; var i = 0
      while (i < zs.length) {
        val z = zs(i)
        val t = SM.normCdf(-z)
        if (t <= 0) return Double.NegativeInfinity
        ll += SM.normLogPdf(z) + (c0 - 1) * math.log(t)
        i += 1
      }
      ll + zs.length * c
    }
    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      Array(1.0, m, math.max(sd, 1e-9))
    }
  }

  /** Power-lognormal: pdf0 = c/(zs)·φ(ln z/s)·Φ(−ln z/s)^{c−1}. */
  object PowerLognorm extends ContinuousDist with PositiveSupport {
    val name = "powerlognorm"; val shapeNames = Seq("c", "s")
    override def shapesValid(s: Array[Double]) = s(0) > 0 && s(1) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val c = s(0); val sg = s(1)
      if (z <= 0) Double.NegativeInfinity
      else {
        val u = math.log(z) / sg
        val t = SM.normCdf(-u)
        if (t <= 0) Double.NegativeInfinity
        else math.log(c / sg) - math.log(z) + SM.normLogPdf(u) + (c - 1) * math.log(t)
      }
    }
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val c0 = s(0); val sg = s(1); val c = math.log(c0 / sg)
      var ll = 0.0; var i = 0
      while (i < zs.length) {
        val z = zs(i)
        if (z <= 0) return Double.NegativeInfinity
        val lz = math.log(z)
        val u = lz / sg
        val t = SM.normCdf(-u)
        if (t <= 0) return Double.NegativeInfinity
        ll += SM.normLogPdf(u) - lz + (c0 - 1) * math.log(t)
        i += 1
      }
      ll + zs.length * c
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= 0) 0.0 else 1 - math.pow(SM.normCdf(-math.log(z) / s(1)), s(0))
    def ppf0(q: Double, s: Array[Double]) =
      math.exp(-s(1) * SM.normPpf(math.pow(1 - q, 1.0 / s(0))))
    def warmStart(xs: Array[Double]) = {
      val w = ContinuousFamilies.LogNorm.warmStart(xs) // (s, loc, scale)
      Array(1.0, w(0), w(1), w(2))
    }
  }

  /** Pearson III: gamma re-skewed; skew → 0 degenerates to the normal. */
  object Pearson3 extends ContinuousDist {
    val name = "pearson3"; val shapeNames = Seq("skew")
    override def logpdf0(z: Double, s: Array[Double]) = {
      val sk = s(0)
      if (math.abs(sk) < 1e-6) SM.normLogPdf(z)
      else {
        val b = 2.0 / sk // beta
        val a = b * b // alpha
        val y = b * (z + b) // = beta·(z − zeta), zeta = −beta
        if (y <= 0) Double.NegativeInfinity
        else math.log(math.abs(b)) + (a - 1) * math.log(y) - y - SM.lgamma(a)
      }
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]): Double = {
      val sk = s(0)
      if (math.abs(sk) < 1e-6) SM.normCdf(z)
      else {
        val b = 2.0 / sk
        val a = b * b
        val y = b * (z + b)
        if (b > 0) { if (y <= 0) 0.0 else SM.gammaInc(a, y) }
        else { if (y <= 0) 1.0 else SM.gammaIncC(a, y) }
      }
    }
    def ppf0(q: Double, s: Array[Double]): Double = {
      val sk = s(0)
      if (math.abs(sk) < 1e-6) SM.normPpf(q)
      else {
        val b = 2.0 / sk
        val a = b * b
        if (b > 0) SM.gammaIncInv(a, q) / b - b
        else SM.gammaIncInv(a, 1 - q) / b - b
      }
    }
    def warmStart(xs: Array[Double]) = {
      val (_, m, sd, g1, _, _, _) = SM.moments(xs)
      Array(math.max(-3.9, math.min(3.9, g1)), m, math.max(sd, 1e-9))
    }
  }

  /** Rice: pdf0 = z·e^{−(z²+b²)/2}·I₀(bz), z ≥ 0. */
  object Rice extends ContinuousDist with PositiveSupport {
    val name = "rice"; val shapeNames = Seq("b")
    override def shapesValid(s: Array[Double]) = s(0) >= 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val b = s(0)
      if (z <= 0) Double.NegativeInfinity
      else math.log(z) - (z * z + b * b) / 2 + SM.logBesselI(0.0, b * z)
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= 0) 0.0 else SM.riceCdf(s(0), z)
    def ppf0(q: Double, s: Array[Double]) = ppfBisect(this, q, s, 0.0, Double.PositiveInfinity)
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val y = xs.map(_ - l)
      val (m, sd) = meanStd(y)
      val sc = math.max(sd, 1e-9)
      Array(math.max(m / sc - 1, 0.1), l, sc)
    }
  }

  /** Generalized gamma: pdf0 = |c| z^{ca−1} e^{−z^c}/Γ(a), z > 0. */
  object GenGamma extends ContinuousDist with PositiveSupport {
    val name = "gengamma"; val shapeNames = Seq("a", "c")
    override def shapesValid(s: Array[Double]) = s(0) > 0 && s(1) != 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val a = s(0); val c = s(1)
      if (z <= 0) Double.NegativeInfinity
      else math.log(math.abs(c)) + (c * a - 1) * math.log(z) - math.pow(z, c) - SM.lgamma(a)
    }
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val a = s(0); val c = s(1)
      val k = math.log(math.abs(c)) - SM.lgamma(a)
      var ll = 0.0; var i = 0
      while (i < zs.length) {
        val z = zs(i)
        if (z <= 0) return Double.NegativeInfinity
        ll += (c * a - 1) * math.log(z) - math.pow(z, c)
        i += 1
      }
      ll + zs.length * k
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]): Double = {
      if (z <= 0) return 0.0
      val u = SM.gammaInc(s(0), math.pow(z, s(1)))
      if (s(1) > 0) u else 1 - u
    }
    def ppf0(q: Double, s: Array[Double]): Double = {
      val qq = if (s(1) > 0) q else 1 - q
      math.pow(SM.gammaIncInv(s(0), qq), 1.0 / s(1))
    }
    def warmStart(xs: Array[Double]) = {
      val w = ContinuousFamilies.Gamma.warmStart(xs) // (a, loc, scale)
      Array(w(0), 1.0, w(1), w(2))
    }
  }

  val all: Seq[ContinuousDist] = Seq(
    Alpha, FatigueLife, FoldCauchy, FDist, GenNorm, HalfGenNorm, InvGamma,
    LogGamma, LogUniform, SkewNorm, SkewCauchy, Trapezoid, TruncNorm,
    TruncPareto, TruncWeibullMin, PowerNorm, PowerLognorm, Pearson3, Rice,
    GenGamma)
}
