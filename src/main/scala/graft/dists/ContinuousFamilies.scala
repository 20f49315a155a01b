package graft.dists

import graft.functions.{Optimize, SpecialMath => SM}
import ContinuousDist.{meanStd, minMax, median, quantile}

/** Standardized implementations of the continuous families the engine
  * supports in its Tier-A registry (SURVEY.md §7.4: tiered coverage of the
  * reference's scipy registry, src/spark_bestfit/distributions.py:33-164).
  *
  * Math sources: standard closed forms for pdf/cdf/ppf of each family
  * (identical to the published scipy conventions: params = shapes ++
  * [loc, scale], standardized kernel over z = (x-loc)/scale).
  */
object ContinuousFamilies {

  /** Numeric inverse CDF via bisection on cdf0 — used by families without
    * a closed-form quantile. Monotone, so plain bisection is robust. */
  private[dists] def ppfBisect(d: ContinuousDist, q: Double, s: Array[Double],
                               lo0: Double, hi0: Double): Double = {
    if (q <= 0.0) return lo0
    if (q >= 1.0) return hi0
    var lo = lo0; var hi = hi0
    // expand open-ended brackets
    if (lo.isNegInfinity) { lo = -1.0; while (d.cdf0(lo, s) > q && lo > -1e18) lo *= 2 }
    if (hi.isPosInfinity) { hi = 1.0; while (d.cdf0(hi, s) < q && hi < 1e18) hi *= 2 }
    var i = 0
    while (i < 200 && hi - lo > 1e-14 * (1.0 + math.abs(lo) + math.abs(hi))) {
      val mid = 0.5 * (lo + hi)
      if (d.cdf0(mid, s) < q) lo = mid else hi = mid
      i += 1
    }
    0.5 * (lo + hi)
  }

  // ------------------------------------------------------------------
  object Norm extends ContinuousDist {
    val name = "norm"; val shapeNames = Seq.empty
    def pdf0(z: Double, s: Array[Double]) = SM.normPdf(z)
    override def logpdf0(z: Double, s: Array[Double]) = SM.normLogPdf(z)
    def cdf0(z: Double, s: Array[Double]) = SM.normCdf(z)
    def ppf0(q: Double, s: Array[Double]) = SM.normPpf(q)
    override def refineAfterWarmStart = false // exact MLE
    def warmStart(xs: Array[Double]) = { val (m, sd) = meanStd(xs); Array(m, math.max(sd, 1e-300)) }
  }

  object Expon extends ContinuousDist with PositiveSupport {
    val name = "expon"; val shapeNames = Seq.empty
    def pdf0(z: Double, s: Array[Double]) = if (z < 0) 0.0 else math.exp(-z)
    override def logpdf0(z: Double, s: Array[Double]) = if (z < 0) Double.NegativeInfinity else -z
    def cdf0(z: Double, s: Array[Double]) = if (z < 0) 0.0 else -math.expm1(-z)
    override def sf0(z: Double, s: Array[Double]) = if (z < 0) 1.0 else math.exp(-z)
    def ppf0(q: Double, s: Array[Double]) = -math.log1p(-q)
    override def refineAfterWarmStart = false // analytic MLE: loc=min, scale=mean-min
    def warmStart(xs: Array[Double]) = {
      val (mn, _) = minMax(xs); val (m, _) = meanStd(xs)
      Array(mn, math.max(m - mn, 1e-300))
    }
  }

  object Uniform extends ContinuousDist {
    val name = "uniform"; val shapeNames = Seq.empty
    override def a0(s: Array[Double]) = 0.0
    override def b0(s: Array[Double]) = 1.0
    def pdf0(z: Double, s: Array[Double]) = if (z < 0 || z > 1) 0.0 else 1.0
    def cdf0(z: Double, s: Array[Double]) = math.min(1.0, math.max(0.0, z))
    def ppf0(q: Double, s: Array[Double]) = q
    override def refineAfterWarmStart = false // exact MLE: [min, max]
    def warmStart(xs: Array[Double]) = { val (mn, mx) = minMax(xs); Array(mn, math.max(mx - mn, 1e-300)) }
    /** MSP optimum in closed form (Cheng & Amin 1983): with m sorted
      * points spanning range R, the boundary spacings each take mass
      * 1/(m+1), so loc = x₍₁₎ − R/(m−1) and scale = R·(m+1)/(m−1). */
    override def mspClosedForm(sorted: Array[Double]): Option[Array[Double]] = {
      val m = sorted.length
      val r = sorted(m - 1) - sorted(0)
      if (m < 2 || r <= 0.0) None
      else Some(Array(sorted(0) - r / (m - 1).toDouble,
        r * (m + 1).toDouble / (m - 1).toDouble))
    }
  }

  object LogNorm extends ContinuousDist with PositiveSupport {
    val name = "lognorm"; val shapeNames = Seq("s")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      if (z <= 0) Double.NegativeInfinity
      else { val lz = math.log(z); -lz * lz / (2 * s(0) * s(0)) - math.log(s(0) * z) - SM.LnSqrtTwoPi }
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = if (z <= 0) 0.0 else SM.normCdf(math.log(z) / s(0))
    def ppf0(q: Double, s: Array[Double]) = math.exp(s(0) * SM.normPpf(q))
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val sig = s(0); val c = math.log(sig) + SM.LnSqrtTwoPi
      val inv2s2 = 1.0 / (2 * sig * sig)
      var ll = 0.0; var i = 0
      while (i < zs.length) {
        val z = zs(i)
        if (z <= 0) return Double.NegativeInfinity
        val lz = math.log(z)
        ll += -lz * lz * inv2s2 - lz
        i += 1
      }
      ll - zs.length * c
    }
    def warmStart(xs: Array[Double]) = {
      val (mn, _) = minMax(xs)
      val l = if (mn > 0) 0.0 else locBelowMin(xs)
      val logs = xs.map(x => math.log(x - l))
      val (m, sd) = meanStd(logs)
      Array(math.max(sd, 1e-8), l, math.exp(m))
    }
  }

  object Gamma extends ContinuousDist with PositiveSupport {
    val name = "gamma"; val shapeNames = Seq("a")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val a = s(0)
      if (z < 0 || (z == 0 && a < 1)) Double.NegativeInfinity
      else if (z == 0) { if (a == 1) 0.0 else Double.NegativeInfinity }
      else (a - 1) * math.log(z) - z - SM.lgamma(a)
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = SM.gammaInc(s(0), z)
    def ppf0(q: Double, s: Array[Double]) = SM.gammaIncInv(s(0), q)
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val a = s(0); val c = SM.lgamma(a)
      var ll = 0.0; var i = 0
      while (i < zs.length) {
        val z = zs(i)
        if (z <= 0) return Double.NegativeInfinity
        ll += (a - 1) * math.log(z) - z
        i += 1
      }
      ll - zs.length * c
    }
    def warmStart(xs: Array[Double]) = {
      val (mn, _) = minMax(xs)
      val l = if (mn > 0) 0.0 else locBelowMin(xs)
      val y = xs.map(_ - l)
      val m = y.sum / y.length
      val mlog = y.map(v => math.log(math.max(v, 1e-300))).sum / y.length
      val sStat = math.max(math.log(m) - mlog, 1e-9)
      // Thom/Minka approximation, then two Newton steps on digamma
      var k = (3 - sStat + math.sqrt((sStat - 3) * (sStat - 3) + 24 * sStat)) / (12 * sStat)
      var i = 0
      while (i < 4 && k > 0) {
        val g = math.log(k) - SM.digamma(k) - sStat
        val gp = 1.0 / k - SM.trigamma(k)
        val next = k - g / gp
        if (next > 0 && next.isFinite) k = next
        i += 1
      }
      k = math.max(k, 1e-3)
      Array(k, l, m / k)
    }
  }

  object WeibullMin extends ContinuousDist with PositiveSupport {
    val name = "weibull_min"; val shapeNames = Seq("c")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val c = s(0)
      if (z < 0) Double.NegativeInfinity
      else if (z == 0) { if (c < 1) Double.NegativeInfinity else if (c == 1) 0.0 else Double.NegativeInfinity }
      else math.log(c) + (c - 1) * math.log(z) - math.pow(z, c)
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = if (z <= 0) 0.0 else -math.expm1(-math.pow(z, s(0)))
    override def sf0(z: Double, s: Array[Double]) = if (z <= 0) 1.0 else math.exp(-math.pow(z, s(0)))
    def ppf0(q: Double, s: Array[Double]) = math.pow(-math.log1p(-q), 1.0 / s(0))
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val y = xs.map(_ - l)
      val ly = y.map(math.log)
      val mly = ly.sum / ly.length
      // profile-MLE equation for c: h(c) = Σ y^c ln y / Σ y^c − 1/c − mean(ln y) = 0
      def h(c: Double): Double = {
        var num = 0.0; var den = 0.0
        var i = 0
        while (i < y.length) { val w = math.pow(y(i), c); num += w * ly(i); den += w; i += 1 }
        num / den - 1.0 / c - mly
      }
      var c = 1.2 / math.max(1e-9, math.sqrt(ly.map(v => (v - mly) * (v - mly)).sum / ly.length) * math.sqrt(6) / math.Pi)
      c = math.min(math.max(c, 0.05), 50.0)
      // bisection on monotone-increasing h
      var lo = 0.02; var hi = 100.0
      var i = 0
      while (i < 60) { val mid = 0.5 * (lo + hi); if (h(mid) < 0) lo = mid else hi = mid; i += 1 }
      c = 0.5 * (lo + hi)
      val sc = math.pow(y.map(v => math.pow(v, c)).sum / y.length, 1.0 / c)
      Array(c, l, sc)
    }
  }

  object WeibullMax extends ContinuousDist {
    val name = "weibull_max"; val shapeNames = Seq("c")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def b0(s: Array[Double]) = 0.0
    override def logpdf0(z: Double, s: Array[Double]) =
      WeibullMin.logpdf0(-z, s)
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = if (z >= 0) 1.0 else math.exp(-math.pow(-z, s(0)))
    def ppf0(q: Double, s: Array[Double]) = -math.pow(-math.log(q), 1.0 / s(0))
    def warmStart(xs: Array[Double]) = {
      val w = WeibullMin.warmStart(xs.map(-_))
      Array(w(0), -w(1), w(2))
    }
  }

  object BetaDist extends ContinuousDist {
    val name = "beta"; val shapeNames = Seq("a", "b")
    override def a0(s: Array[Double]) = 0.0
    override def b0(s: Array[Double]) = 1.0
    override def shapesValid(s: Array[Double]) = s(0) > 0 && s(1) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      if (z <= 0 || z >= 1) {
        if ((z == 0 && s(0) >= 1) || (z == 1 && s(1) >= 1)) Double.NegativeInfinity else Double.NegativeInfinity
      } else (s(0) - 1) * math.log(z) + (s(1) - 1) * math.log1p(-z) - SM.lbeta(s(0), s(1))
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = SM.betaInc(s(0), s(1), z)
    def ppf0(q: Double, s: Array[Double]) = SM.betaIncInv(s(0), s(1), q)
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val c = SM.lbeta(s(0), s(1))
      var ll = 0.0; var i = 0
      while (i < zs.length) {
        val z = zs(i)
        if (z <= 0 || z >= 1) return Double.NegativeInfinity
        ll += (s(0) - 1) * math.log(z) + (s(1) - 1) * math.log1p(-z)
        i += 1
      }
      ll - zs.length * c
    }
    def warmStart(xs: Array[Double]) = {
      val (mn, mx) = minMax(xs)
      val span = math.max(mx - mn, 1e-300)
      val l = mn - 1e-4 * span
      val sc = span * (1 + 2e-4)
      val u = xs.map(x => (x - l) / sc)
      val (m, sd) = meanStd(u)
      val v = math.max(sd * sd, 1e-12)
      val c = math.max(m * (1 - m) / v - 1.0, 0.1)
      Array(math.max(m * c, 0.05), math.max((1 - m) * c, 0.05), l, sc)
    }
  }

  object Pareto extends ContinuousDist {
    val name = "pareto"; val shapeNames = Seq("b")
    override def a0(s: Array[Double]) = 1.0
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) =
      if (z < 1) Double.NegativeInfinity else math.log(s(0)) - (s(0) + 1) * math.log(z)
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = if (z <= 1) 0.0 else 1.0 - math.pow(z, -s(0))
    override def sf0(z: Double, s: Array[Double]) = if (z <= 1) 1.0 else math.pow(z, -s(0))
    def ppf0(q: Double, s: Array[Double]) = math.pow(1.0 - q, -1.0 / s(0))
    def warmStart(xs: Array[Double]) = {
      val (mn, _) = minMax(xs)
      val sc = math.abs(mn) * (1 - 1e-9) match { case v if v > 0 => v; case _ => 1e-9 }
      val scl = if (mn > 0) mn * (1 - 1e-9) else sc
      val b = xs.length / math.max(xs.map(x => math.log(math.max(x / scl, 1 + 1e-12))).sum, 1e-9)
      Array(math.max(b, 0.05), 0.0, scl)
    }
  }

  object Cauchy extends ContinuousDist {
    val name = "cauchy"; val shapeNames = Seq.empty
    def pdf0(z: Double, s: Array[Double]) = 1.0 / (math.Pi * (1.0 + z * z))
    override def logpdf0(z: Double, s: Array[Double]) = -math.log(math.Pi) - math.log1p(z * z)
    def cdf0(z: Double, s: Array[Double]) = 0.5 + math.atan(z) / math.Pi
    def ppf0(q: Double, s: Array[Double]) = math.tan(math.Pi * (q - 0.5))
    def warmStart(xs: Array[Double]) = {
      val med = median(xs)
      val iqr = quantile(xs, 0.75) - quantile(xs, 0.25)
      Array(med, math.max(iqr / 2.0, 1e-9))
    }
  }

  object Laplace extends ContinuousDist {
    val name = "laplace"; val shapeNames = Seq.empty
    def pdf0(z: Double, s: Array[Double]) = 0.5 * math.exp(-math.abs(z))
    override def logpdf0(z: Double, s: Array[Double]) = math.log(0.5) - math.abs(z)
    def cdf0(z: Double, s: Array[Double]) = if (z < 0) 0.5 * math.exp(z) else 1.0 - 0.5 * math.exp(-z)
    def ppf0(q: Double, s: Array[Double]) = if (q < 0.5) math.log(2 * q) else -math.log(2 * (1 - q))
    override def refineAfterWarmStart = false // exact MLE: median + mean abs dev
    def warmStart(xs: Array[Double]) = {
      val med = median(xs)
      val mad = xs.map(x => math.abs(x - med)).sum / xs.length
      Array(med, math.max(mad, 1e-300))
    }
  }

  object Logistic extends ContinuousDist {
    val name = "logistic"; val shapeNames = Seq.empty
    def pdf0(z: Double, s: Array[Double]) = { val e = math.exp(-math.abs(z)); e / ((1 + e) * (1 + e)) }
    override def logpdf0(z: Double, s: Array[Double]) = { val az = math.abs(z); -az - 2 * math.log1p(math.exp(-az)) }
    def cdf0(z: Double, s: Array[Double]) = 1.0 / (1.0 + math.exp(-z))
    def ppf0(q: Double, s: Array[Double]) = math.log(q / (1.0 - q))
    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      Array(m, math.max(sd * math.sqrt(3) / math.Pi, 1e-9))
    }
  }

  object GumbelR extends ContinuousDist {
    val name = "gumbel_r"; val shapeNames = Seq.empty
    def pdf0(z: Double, s: Array[Double]) = math.exp(-(z + math.exp(-z)))
    override def logpdf0(z: Double, s: Array[Double]) = -(z + math.exp(-z))
    def cdf0(z: Double, s: Array[Double]) = math.exp(-math.exp(-z))
    def ppf0(q: Double, s: Array[Double]) = -math.log(-math.log(q))
    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      val sc = math.max(sd * math.sqrt(6) / math.Pi, 1e-9)
      Array(m - SM.EulerGamma * sc, sc)
    }
  }

  object GumbelL extends ContinuousDist {
    val name = "gumbel_l"; val shapeNames = Seq.empty
    def pdf0(z: Double, s: Array[Double]) = math.exp(z - math.exp(z))
    override def logpdf0(z: Double, s: Array[Double]) = z - math.exp(z)
    def cdf0(z: Double, s: Array[Double]) = -math.expm1(-math.exp(z))
    override def sf0(z: Double, s: Array[Double]) = math.exp(-math.exp(z))
    def ppf0(q: Double, s: Array[Double]) = math.log(-math.log1p(-q))
    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      val sc = math.max(sd * math.sqrt(6) / math.Pi, 1e-9)
      Array(m + SM.EulerGamma * sc, sc)
    }
  }

  object Rayleigh extends ContinuousDist with PositiveSupport {
    val name = "rayleigh"; val shapeNames = Seq.empty
    def pdf0(z: Double, s: Array[Double]) = if (z < 0) 0.0 else z * math.exp(-0.5 * z * z)
    override def logpdf0(z: Double, s: Array[Double]) =
      if (z <= 0) Double.NegativeInfinity else math.log(z) - 0.5 * z * z
    def cdf0(z: Double, s: Array[Double]) = if (z < 0) 0.0 else -math.expm1(-0.5 * z * z)
    override def sf0(z: Double, s: Array[Double]) = if (z < 0) 1.0 else math.exp(-0.5 * z * z)
    def ppf0(q: Double, s: Array[Double]) = math.sqrt(-2.0 * math.log1p(-q))
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val y = xs.map(v => { val d = v - l; d * d })
      Array(l, math.max(math.sqrt(y.sum / y.length / 2.0), 1e-9))
    }
  }

  object Chi2 extends ContinuousDist with PositiveSupport {
    val name = "chi2"; val shapeNames = Seq("df")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val k2 = s(0) / 2
      if (z <= 0) Double.NegativeInfinity
      else (k2 - 1) * math.log(z) - z / 2 - k2 * math.log(2.0) - SM.lgamma(k2)
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = SM.gammaInc(s(0) / 2, z / 2)
    def ppf0(q: Double, s: Array[Double]) = 2.0 * SM.gammaIncInv(s(0) / 2, q)
    // chi2(df, loc, sc): (x-loc)/(2·sc) ~ gamma(df/2, 1), so a gamma fit
    // (a, loc, gsc) maps to (df, loc, sc) = (2a, loc, gsc/2).
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val k2 = s(0) / 2
      val c = k2 * math.log(2.0) + SM.lgamma(k2)
      var ll = 0.0; var i = 0
      while (i < zs.length) {
        val z = zs(i)
        if (z <= 0) return Double.NegativeInfinity
        ll += (k2 - 1) * math.log(z) - z / 2
        i += 1
      }
      ll - zs.length * c
    }
    def warmStart(xs: Array[Double]) = {
      val g = Gamma.warmStart(xs)
      Array(2 * g(0), g(1), g(2) / 2.0)
    }
    override def fit(xs: Array[Double]): Array[Double] = {
      val g = Gamma.fit(xs)
      val w = Array(2 * g(0), g(1), g(2) / 2.0)
      val f0 = negLogLik(w, xs)
      if (f0 >= Optimize.Penalty) return w
      val (best, fBest) = Optimize.nelderMead(negLogLik(_, xs), w, maxIter = 200)
      if (fBest < f0) best else w
    }
    override def refineAfterWarmStart = false
  }

  object StudentT extends ContinuousDist {
    val name = "t"; val shapeNames = Seq("df")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val v = s(0)
      SM.lgamma((v + 1) / 2) - SM.lgamma(v / 2) - 0.5 * math.log(v * math.Pi) -
        (v + 1) / 2 * math.log1p(z * z / v)
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = {
      val v = s(0)
      val ib = SM.betaInc(v / 2, 0.5, v / (v + z * z))
      if (z >= 0) 1.0 - 0.5 * ib else 0.5 * ib
    }
    def ppf0(q: Double, s: Array[Double]) = {
      if (q == 0.5) 0.0
      else {
        val v = s(0)
        val qq = if (q < 0.5) q else 1 - q
        val x = SM.betaIncInv(v / 2, 0.5, 2 * qq)
        val t = math.sqrt(v * (1 - x) / x)
        if (q < 0.5) -t else t
      }
    }
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val v = s(0)
      val c = SM.lgamma((v + 1) / 2) - SM.lgamma(v / 2) - 0.5 * math.log(v * math.Pi)
      var ll = 0.0; var i = 0
      while (i < zs.length) { val z = zs(i); ll += math.log1p(z * z / v); i += 1 }
      zs.length * c - (v + 1) / 2 * ll
    }
    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      Array(4.0, m, math.max(sd / math.sqrt(2.0), 1e-9)) // df=4 ⇒ var=2·scale²
    }
  }

  object InvGauss extends ContinuousDist with PositiveSupport {
    val name = "invgauss"; val shapeNames = Seq("mu")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val mu = s(0)
      if (z <= 0) Double.NegativeInfinity
      else {
        val d = z - mu
        -0.5 * math.log(2 * math.Pi * z * z * z) - d * d / (2 * z * mu * mu)
      }
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = {
      val mu = s(0)
      if (z <= 0) 0.0
      else {
        val sq = math.sqrt(z)
        val u = (z / mu - 1) / sq
        val v = -(z / mu + 1) / sq
        SM.normCdf(u) + math.exp(2.0 / mu + math.log(math.max(SM.normCdf(v), 1e-320)))
      }
    }
    def ppf0(q: Double, s: Array[Double]) = ppfBisect(this, q, s, 0.0, Double.PositiveInfinity)
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val y = xs.map(_ - l)
      val m = y.sum / y.length
      val lamInv = y.map(v => 1.0 / v - 1.0 / m).sum / y.length
      val lam = 1.0 / math.max(lamInv, 1e-12)
      // (x-loc)/scale ~ IG(mean=mu, lambda=1) ⇒ scale = lam, mu = m/lam
      Array(math.max(m / lam, 1e-9), l, math.max(lam, 1e-9))
    }
  }

  object HalfNorm extends ContinuousDist with PositiveSupport {
    val name = "halfnorm"; val shapeNames = Seq.empty
    def pdf0(z: Double, s: Array[Double]) = if (z < 0) 0.0 else math.sqrt(2 / math.Pi) * math.exp(-0.5 * z * z)
    override def logpdf0(z: Double, s: Array[Double]) =
      if (z < 0) Double.NegativeInfinity else 0.5 * math.log(2 / math.Pi) - 0.5 * z * z
    def cdf0(z: Double, s: Array[Double]) = if (z < 0) 0.0 else SM.erf(z / SM.SqrtTwo)
    def ppf0(q: Double, s: Array[Double]) = SM.normPpf(0.5 * (1 + q))
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val y = xs.map(v => { val d = v - l; d * d })
      Array(l, math.max(math.sqrt(y.sum / y.length), 1e-9))
    }
  }

  object HalfLogistic extends ContinuousDist with PositiveSupport {
    val name = "halflogistic"; val shapeNames = Seq.empty
    def pdf0(z: Double, s: Array[Double]) = {
      if (z < 0) 0.0 else { val e = math.exp(-z); 2 * e / ((1 + e) * (1 + e)) }
    }
    def cdf0(z: Double, s: Array[Double]) = if (z < 0) 0.0 else math.tanh(z / 2)
    def ppf0(q: Double, s: Array[Double]) = math.log((1 + q) / (1 - q))
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val m = xs.map(_ - l).sum / xs.length
      Array(l, math.max(m / (2 * math.log(2)), 1e-9))
    }
  }

  object HalfCauchy extends ContinuousDist with PositiveSupport {
    val name = "halfcauchy"; val shapeNames = Seq.empty
    def pdf0(z: Double, s: Array[Double]) = if (z < 0) 0.0 else 2.0 / (math.Pi * (1 + z * z))
    def cdf0(z: Double, s: Array[Double]) = if (z < 0) 0.0 else 2.0 * math.atan(z) / math.Pi
    def ppf0(q: Double, s: Array[Double]) = math.tan(math.Pi * q / 2)
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      Array(l, math.max(median(xs.map(_ - l)), 1e-9)) // median of halfcauchy = scale
    }
  }

  object PowerLaw extends ContinuousDist {
    val name = "powerlaw"; val shapeNames = Seq("a")
    override def a0(s: Array[Double]) = 0.0
    override def b0(s: Array[Double]) = 1.0
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) =
      if (z <= 0 || z > 1) Double.NegativeInfinity else math.log(s(0)) + (s(0) - 1) * math.log(z)
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = if (z <= 0) 0.0 else if (z >= 1) 1.0 else math.pow(z, s(0))
    def ppf0(q: Double, s: Array[Double]) = math.pow(q, 1.0 / s(0))
    def warmStart(xs: Array[Double]) = {
      val (mn, mx) = minMax(xs)
      val span = math.max(mx - mn, 1e-300)
      val l = mn - 1e-4 * span
      val sc = span * (1 + 2e-4)
      val a = -xs.length / xs.map(x => math.log((x - l) / sc)).sum
      Array(math.max(a, 0.05), l, sc)
    }
  }

  object Triang extends ContinuousDist {
    val name = "triang"; val shapeNames = Seq("c")
    override def a0(s: Array[Double]) = 0.0
    override def b0(s: Array[Double]) = 1.0
    override def shapesValid(s: Array[Double]) = s(0) >= 0 && s(0) <= 1
    def pdf0(z: Double, s: Array[Double]) = {
      val c = s(0)
      if (z < 0 || z > 1) 0.0
      else if (z < c) 2 * z / c
      else if (z > c) 2 * (1 - z) / (1 - c)
      else 2.0
    }
    def cdf0(z: Double, s: Array[Double]) = {
      val c = s(0)
      if (z <= 0) 0.0 else if (z >= 1) 1.0
      else if (z <= c) z * z / c
      else 1 - (1 - z) * (1 - z) / (1 - c)
    }
    def ppf0(q: Double, s: Array[Double]) = {
      val c = s(0)
      if (q <= c) math.sqrt(q * c) else 1 - math.sqrt((1 - q) * (1 - c))
    }
    def warmStart(xs: Array[Double]) = {
      val (mn, mx) = minMax(xs)
      val span = math.max(mx - mn, 1e-300)
      val l = mn - 1e-4 * span
      val sc = span * (1 + 2e-4)
      val m = (xs.sum / xs.length - l) / sc
      Array(math.min(math.max(3 * m - 1, 0.01), 0.99), l, sc)
    }
  }

  object Maxwell extends ContinuousDist with PositiveSupport {
    val name = "maxwell"; val shapeNames = Seq.empty
    override def logpdf0(z: Double, s: Array[Double]) =
      if (z <= 0) Double.NegativeInfinity
      else 0.5 * math.log(2 / math.Pi) + 2 * math.log(z) - 0.5 * z * z
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = if (z <= 0) 0.0 else SM.gammaInc(1.5, z * z / 2)
    def ppf0(q: Double, s: Array[Double]) = math.sqrt(2 * SM.gammaIncInv(1.5, q))
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val y = xs.map(v => { val d = v - l; d * d })
      Array(l, math.max(math.sqrt(y.sum / y.length / 3.0), 1e-9))
    }
  }

  object Chi extends ContinuousDist with PositiveSupport {
    val name = "chi"; val shapeNames = Seq("df")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val df = s(0)
      if (z <= 0) Double.NegativeInfinity
      else (df - 1) * math.log(z) - 0.5 * z * z - (df / 2 - 1) * math.log(2.0) - SM.lgamma(df / 2)
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = if (z <= 0) 0.0 else SM.gammaInc(s(0) / 2, z * z / 2)
    def ppf0(q: Double, s: Array[Double]) = math.sqrt(2 * SM.gammaIncInv(s(0) / 2, q))
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val df = s(0)
      val c = (df / 2 - 1) * math.log(2.0) + SM.lgamma(df / 2)
      var ll = 0.0; var i = 0
      while (i < zs.length) {
        val z = zs(i)
        if (z <= 0) return Double.NegativeInfinity
        ll += (df - 1) * math.log(z) - 0.5 * z * z
        i += 1
      }
      ll - zs.length * c
    }
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val y = xs.map(_ - l)
      val m2 = y.map(v => v * v).sum / y.length
      val m = y.sum / y.length
      // E[z²]=df·sc², E[z]≈sc·√df for large df ⇒ rough: df0 from m²/m2
      val df0 = math.max(1.0, 1.0 / math.max(1e-6, m2 / (m * m) - 1.0) * 0.5)
      Array(df0, l, math.max(math.sqrt(m2 / df0), 1e-9))
    }
  }

  object Fisk extends ContinuousDist with PositiveSupport {
    val name = "fisk"; val shapeNames = Seq("c")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val c = s(0)
      if (z <= 0) Double.NegativeInfinity
      else math.log(c) + (c - 1) * math.log(z) - 2 * math.log1p(math.pow(z, c))
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = if (z <= 0) 0.0 else 1.0 / (1.0 + math.pow(z, -s(0)))
    def ppf0(q: Double, s: Array[Double]) = math.pow(q / (1 - q), 1.0 / s(0))
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val ly = xs.map(v => math.log(v - l))
      val (m, sd) = meanStd(ly)
      Array(math.max(math.Pi / (math.sqrt(3) * math.max(sd, 1e-9)), 0.05), l, math.exp(m))
    }
  }

  object GenPareto extends ContinuousDist {
    val name = "genpareto"; val shapeNames = Seq("c")
    override def a0(s: Array[Double]) = 0.0
    override def b0(s: Array[Double]) = if (s(0) < 0) -1.0 / s(0) else Double.PositiveInfinity
    override def logpdf0(z: Double, s: Array[Double]) = {
      val c = s(0)
      if (z < 0) Double.NegativeInfinity
      else if (math.abs(c) < 1e-12) -z
      else {
        val t = 1 + c * z
        if (t <= 0) Double.NegativeInfinity else -(1.0 / c + 1) * math.log(t)
      }
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = {
      val c = s(0)
      if (z <= 0) 0.0
      else if (math.abs(c) < 1e-12) -math.expm1(-z)
      else { val t = 1 + c * z; if (t <= 0) 1.0 else 1.0 - math.pow(t, -1.0 / c) }
    }
    def ppf0(q: Double, s: Array[Double]) = {
      val c = s(0)
      if (math.abs(c) < 1e-12) -math.log1p(-q)
      else (math.pow(1 - q, -c) - 1) / c
    }
    def warmStart(xs: Array[Double]) = {
      val (mn, _) = minMax(xs)
      val l = mn - 1e-9 * (math.abs(mn) + 1)
      val y = xs.map(_ - l)
      val (m, sd) = meanStd(y)
      val v = math.max(sd * sd, 1e-12)
      val xi = math.min(0.5 * (1 - m * m / v), 0.49) // MoM
      val sg = math.max(0.5 * m * (m * m / v + 1), 1e-9)
      Array(xi, l, sg)
    }
  }

  object GenExtreme extends ContinuousDist {
    val name = "genextreme"; val shapeNames = Seq("c")
    override def a0(s: Array[Double]) = if (s(0) > 0) Double.NegativeInfinity else if (s(0) < 0) 1.0 / s(0) else Double.NegativeInfinity
    override def b0(s: Array[Double]) = if (s(0) > 0) 1.0 / s(0) else Double.PositiveInfinity
    override def logpdf0(z: Double, s: Array[Double]) = {
      val c = s(0)
      if (math.abs(c) < 1e-12) -(z + math.exp(-z))
      else {
        val t = 1 - c * z
        if (t <= 0) Double.NegativeInfinity
        else {
          val lt = math.log(t)
          (1.0 / c - 1) * lt - math.exp(lt / c)
        }
      }
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = {
      val c = s(0)
      if (math.abs(c) < 1e-12) math.exp(-math.exp(-z))
      else {
        val t = 1 - c * z
        if (t <= 0) { if (c > 0) 1.0 else 0.0 }
        else math.exp(-math.pow(t, 1.0 / c))
      }
    }
    def ppf0(q: Double, s: Array[Double]) = {
      val c = s(0)
      if (math.abs(c) < 1e-12) -math.log(-math.log(q))
      else (1 - math.pow(-math.log(q), c)) / c
    }
    def warmStart(xs: Array[Double]) = {
      val g = GumbelR.warmStart(xs)
      Array(0.05, g(0), g(1))
    }
  }

  object Arcsine extends ContinuousDist {
    val name = "arcsine"; val shapeNames = Seq.empty
    override def a0(s: Array[Double]) = 0.0
    override def b0(s: Array[Double]) = 1.0
    override def logpdf0(z: Double, s: Array[Double]) =
      if (z <= 0 || z >= 1) Double.NegativeInfinity
      else -math.log(math.Pi) - 0.5 * (math.log(z) + math.log1p(-z))
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= 0) 0.0 else if (z >= 1) 1.0 else 2.0 / math.Pi * math.asin(math.sqrt(z))
    def ppf0(q: Double, s: Array[Double]) = { val v = math.sin(math.Pi * q / 2); v * v }
    override def refineAfterWarmStart = false // loc/scale pinned by support
    def warmStart(xs: Array[Double]) = {
      val (mn, mx) = minMax(xs)
      val span = math.max(mx - mn, 1e-300)
      Array(mn - 1e-6 * span, span * (1 + 2e-6))
    }
  }

  object Cosine extends ContinuousDist {
    val name = "cosine"; val shapeNames = Seq.empty
    override def a0(s: Array[Double]) = -math.Pi
    override def b0(s: Array[Double]) = math.Pi
    def pdf0(z: Double, s: Array[Double]) =
      if (z < -math.Pi || z > math.Pi) 0.0 else (1 + math.cos(z)) / (2 * math.Pi)
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= -math.Pi) 0.0 else if (z >= math.Pi) 1.0
      else (math.Pi + z + math.sin(z)) / (2 * math.Pi)
    def ppf0(q: Double, s: Array[Double]) = ppfBisect(this, q, s, -math.Pi, math.Pi)
    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      Array(m, math.max(sd / math.sqrt(math.Pi * math.Pi / 3 - 2), 1e-9))
    }
  }

  object Nakagami extends ContinuousDist with PositiveSupport {
    val name = "nakagami"; val shapeNames = Seq("nu")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val nu = s(0)
      if (z <= 0) Double.NegativeInfinity
      else math.log(2.0) + nu * math.log(nu) - SM.lgamma(nu) + (2 * nu - 1) * math.log(z) - nu * z * z
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = if (z <= 0) 0.0 else SM.gammaInc(s(0), s(0) * z * z)
    def ppf0(q: Double, s: Array[Double]) = math.sqrt(SM.gammaIncInv(s(0), q) / s(0))
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val nu = s(0)
      val c = math.log(2.0) + nu * math.log(nu) - SM.lgamma(nu)
      var ll = 0.0; var i = 0
      while (i < zs.length) {
        val z = zs(i)
        if (z <= 0) return Double.NegativeInfinity
        ll += (2 * nu - 1) * math.log(z) - nu * z * z
        i += 1
      }
      ll + zs.length * c
    }
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val y2 = xs.map(v => { val d = v - l; d * d })
      val m2 = y2.sum / y2.length
      val v2 = y2.map(v => (v - m2) * (v - m2)).sum / y2.length
      val nu = math.max(m2 * m2 / math.max(v2, 1e-12), 0.1)
      Array(nu, l, math.max(math.sqrt(m2), 1e-9))
    }
  }

  object BetaPrime extends ContinuousDist with PositiveSupport {
    val name = "betaprime"; val shapeNames = Seq("a", "b")
    override def shapesValid(s: Array[Double]) = s(0) > 0 && s(1) > 0
    override def logpdf0(z: Double, s: Array[Double]) =
      if (z <= 0) Double.NegativeInfinity
      else (s(0) - 1) * math.log(z) - (s(0) + s(1)) * math.log1p(z) - SM.lbeta(s(0), s(1))
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = if (z <= 0) 0.0 else SM.betaInc(s(0), s(1), z / (1 + z))
    def ppf0(q: Double, s: Array[Double]) = { val y = SM.betaIncInv(s(0), s(1), q); y / (1 - y) }
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val c = SM.lbeta(s(0), s(1))
      var ll = 0.0; var i = 0
      while (i < zs.length) {
        val z = zs(i)
        if (z <= 0) return Double.NegativeInfinity
        ll += (s(0) - 1) * math.log(z) - (s(0) + s(1)) * math.log1p(z)
        i += 1
      }
      ll - zs.length * c
    }
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      Array(2.0, 3.0, l, math.max(median(xs.map(_ - l)), 1e-9))
    }
  }

  object Gompertz extends ContinuousDist with PositiveSupport {
    val name = "gompertz"; val shapeNames = Seq("c")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) =
      if (z < 0) Double.NegativeInfinity
      else math.log(s(0)) + z - s(0) * math.expm1(z)
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = if (z < 0) 0.0 else -math.expm1(-s(0) * math.expm1(z))
    def ppf0(q: Double, s: Array[Double]) = math.log1p(-math.log1p(-q) / s(0))
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val m = xs.map(_ - l).sum / xs.length
      Array(1.0, l, math.max(m, 1e-9))
    }
  }

  /** Erlang is scipy's gamma restricted to integer shape; scipy's fit does
    * not enforce integrality, so an alias of gamma matches its behavior. */
  object Erlang extends ContinuousDist with PositiveSupport {
    val name = "erlang"; val shapeNames = Seq("a")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = Gamma.logpdf0(z, s)
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]) = Gamma.logpdf0Sum(zs, s)
    def pdf0(z: Double, s: Array[Double]) = Gamma.pdf0(z, s)
    def cdf0(z: Double, s: Array[Double]) = Gamma.cdf0(z, s)
    def ppf0(q: Double, s: Array[Double]) = Gamma.ppf0(q, s)
    def warmStart(xs: Array[Double]) = Gamma.warmStart(xs)
  }

  /** Wald = invgauss with mu fixed at 1 (loc/scale only). */
  object Wald extends ContinuousDist with PositiveSupport {
    val name = "wald"; val shapeNames = Seq.empty
    private val one = Array(1.0)
    override def logpdf0(z: Double, s: Array[Double]) = InvGauss.logpdf0(z, one)
    def pdf0(z: Double, s: Array[Double]) = InvGauss.pdf0(z, one)
    def cdf0(z: Double, s: Array[Double]) = InvGauss.cdf0(z, one)
    def ppf0(q: Double, s: Array[Double]) = InvGauss.ppf0(q, one)
    def warmStart(xs: Array[Double]) = {
      val w = InvGauss.warmStart(xs) // (mu, loc, scale)
      Array(w(1), math.max(w(0) * w(2), 1e-9))
    }
  }

  val all: Seq[ContinuousDist] = Seq(
    Norm, Expon, Uniform, LogNorm, Gamma, WeibullMin, WeibullMax, BetaDist,
    Pareto, Cauchy, Laplace, Logistic, GumbelR, GumbelL, Rayleigh, Chi2,
    StudentT, InvGauss, HalfNorm, HalfLogistic, HalfCauchy, PowerLaw, Triang,
    Maxwell, Chi, Fisk, GenPareto, GenExtreme, Arcsine, Cosine, Nakagami,
    BetaPrime, Gompertz, Erlang, Wald)
}
