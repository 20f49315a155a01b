package graft.dists

import graft.functions.{Optimize, SpecialMath => SM}
import ContinuousDist.{meanStd, minMax, median, quantile}
import ContinuousFamilies.ppfBisect

/** Tier-D continuous families — final coverage wave: the specialist and
  * noncentral tail of the reference's scipy registry, including several
  * families scipy EXCLUDES by default for speed (kappa4, ncx2, ncf,
  * vonmises, tukeylambda, recipinvgauss; reference:
  * src/spark_bestfit/distributions.py:33-54) — available here because the
  * JVM kernels stay cheap. Same standardized-kernel conventions as
  * ContinuousFamilies.
  */
object ContinuousFamiliesD {

  /** Generalized exponential (Marshall–Olkin form scipy uses):
    * sf0 = exp(−az − bz + (b/c)(1 − e^{−cz})). */
  object GenExpon extends ContinuousDist with PositiveSupport {
    val name = "genexpon"; val shapeNames = Seq("a", "b", "c")
    override def shapesValid(s: Array[Double]) = s(0) > 0 && s(1) > 0 && s(2) > 0
    @inline private def lnSf(z: Double, s: Array[Double]): Double =
      -s(0) * z - s(1) * z + s(1) / s(2) * (1 - math.exp(-s(2) * z))
    override def logpdf0(z: Double, s: Array[Double]) =
      if (z < 0) Double.NegativeInfinity
      else math.log(s(0) + s(1) * (1 - math.exp(-s(2) * z))) + lnSf(z, s)
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= 0) 0.0 else -math.expm1(lnSf(z, s))
    override def sf0(z: Double, s: Array[Double]) =
      if (z <= 0) 1.0 else math.exp(lnSf(z, s))
    def ppf0(q: Double, s: Array[Double]) = ppfBisect(this, q, s, 0.0, Double.PositiveInfinity)
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val y = xs.map(_ - l)
      val m = math.max(y.sum / y.length, 1e-9)
      Array(1.0, 1.0, 2.0, l, m)
    }
  }

  /** Generalized half-logistic: cdf0 = (1−u)/(1+u), u = (1−cz)^{1/c},
    * 0 ≤ z ≤ 1/c. */
  object GenHalfLogistic extends ContinuousDist {
    val name = "genhalflogistic"; val shapeNames = Seq("c")
    override def a0(s: Array[Double]) = 0.0
    override def b0(s: Array[Double]) = 1.0 / s(0)
    override def shapesValid(s: Array[Double]) = s(0) > 0
    def pdf0(z: Double, s: Array[Double]): Double = {
      val c = s(0)
      if (z < 0 || z > 1.0 / c) 0.0
      else {
        val u = math.pow(1 - c * z, 1.0 / c - 1)
        val v = math.pow(1 - c * z, 1.0 / c)
        2 * u / ((1 + v) * (1 + v))
      }
    }
    def cdf0(z: Double, s: Array[Double]): Double = {
      val c = s(0)
      if (z <= 0) 0.0
      else if (z >= 1.0 / c) 1.0
      else { val u = math.pow(1 - c * z, 1.0 / c); (1 - u) / (1 + u) }
    }
    def ppf0(q: Double, s: Array[Double]): Double = {
      val c = s(0)
      val u = (1 - q) / (1 + q)
      (1 - math.pow(u, c)) / c
    }
    def warmStart(xs: Array[Double]) = {
      val (mn, mx) = minMax(xs)
      val span = math.max(mx - mn, 1e-9)
      val l = mn - span * 1e-3
      // support [0, 1/c] in z: pick c = 0.5 and scale to cover the range
      Array(0.5, l, span * 0.55)
    }
  }

  /** Kappa-3: cdf0 = z(a + z^a)^{−1/a}, z > 0. */
  object Kappa3 extends ContinuousDist with PositiveSupport {
    val name = "kappa3"; val shapeNames = Seq("a")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    def pdf0(z: Double, s: Array[Double]): Double = {
      val a = s(0)
      if (z <= 0) 0.0
      else a * math.pow(a + math.pow(z, a), -(a + 1) / a)
    }
    def cdf0(z: Double, s: Array[Double]): Double = {
      val a = s(0)
      if (z <= 0) 0.0 else z * math.pow(a + math.pow(z, a), -1.0 / a)
    }
    def ppf0(q: Double, s: Array[Double]): Double = {
      val a = s(0)
      if (q >= 1) Double.PositiveInfinity
      else { val qa = math.pow(q, a); math.pow(a * qa / (1 - qa), 1.0 / a) }
    }
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val y = xs.map(_ - l)
      Array(1.5, l, math.max(median(y), 1e-9))
    }
  }

  /** Kappa-4 (Hosking): cdf0 = (1 − h(1−kz)^{1/k})^{1/h}, with the h→0 and
    * k→0 limits folded in. */
  object Kappa4 extends ContinuousDist {
    val name = "kappa4"; val shapeNames = Seq("h", "k")
    private final val Eps = 1e-8
    override def a0(s: Array[Double]): Double = {
      val h = s(0); val k = s(1)
      if (h > Eps) {
        if (math.abs(k) > Eps) (1 - math.pow(h, -k)) / k else math.log(h)
      } else if (k < -Eps) 1.0 / k
      else Double.NegativeInfinity
    }
    override def b0(s: Array[Double]): Double =
      if (s(1) > Eps) 1.0 / s(1) else Double.PositiveInfinity
    override protected def defaultShapes = Array(0.1, 0.1)
    @inline private def uOf(z: Double, k: Double): Double =
      if (math.abs(k) > Eps) math.pow(math.max(1 - k * z, 0.0), 1.0 / k) else math.exp(-z)
    def cdf0(z: Double, s: Array[Double]): Double = {
      val h = s(0); val k = s(1)
      val u = uOf(z, k)
      val v = if (math.abs(h) > Eps) math.pow(math.max(1 - h * u, 0.0), 1.0 / h) else math.exp(-u)
      math.min(1.0, math.max(0.0, v))
    }
    def pdf0(z: Double, s: Array[Double]): Double = {
      val h = s(0); val k = s(1)
      if (z < a0(s) || z > b0(s)) return 0.0
      val oneKz = 1 - k * z
      val du = if (math.abs(k) > Eps) {
        if (oneKz <= 0) return 0.0
        math.pow(oneKz, 1.0 / k - 1)
      } else math.exp(-z)
      val u = uOf(z, k)
      val dv = if (math.abs(h) > Eps) {
        val oneHu = 1 - h * u
        if (oneHu <= 0) return 0.0
        math.pow(oneHu, 1.0 / h - 1)
      } else math.exp(-u)
      du * dv
    }
    def ppf0(q: Double, s: Array[Double]): Double = {
      val h = s(0); val k = s(1)
      if (q <= 0) return a0(s)
      if (q >= 1) return b0(s)
      val u = if (math.abs(h) > Eps) (1 - math.pow(q, h)) / h else -math.log(q)
      if (math.abs(k) > Eps) (1 - math.pow(u, k)) / k else -math.log(u)
    }
    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      Array(0.1, 0.1, m, math.max(sd, 1e-9))
    }
  }

  /** R-distribution: symmetric Beta(c/2, c/2) stretched to [−1, 1]. */
  object RDist extends ContinuousDist {
    val name = "rdist"; val shapeNames = Seq("c")
    override def a0(s: Array[Double]) = -1.0
    override def b0(s: Array[Double]) = 1.0
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val c = s(0)
      if (z <= -1 || z >= 1) Double.NegativeInfinity
      else (c / 2 - 1) * math.log1p(-z * z) - SM.lbeta(0.5, c / 2)
    }
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val c = s(0); val k = SM.lbeta(0.5, c / 2)
      var ll = 0.0; var i = 0
      while (i < zs.length) {
        val z = zs(i)
        if (z <= -1 || z >= 1) return Double.NegativeInfinity
        ll += (c / 2 - 1) * math.log1p(-z * z)
        i += 1
      }
      ll - zs.length * k
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= -1) 0.0 else if (z >= 1) 1.0
      else SM.betaInc(s(0) / 2, s(0) / 2, (z + 1) / 2)
    def ppf0(q: Double, s: Array[Double]) =
      2 * SM.betaIncInv(s(0) / 2, s(0) / 2, q) - 1
    def warmStart(xs: Array[Double]) = {
      val (mn, mx) = minMax(xs)
      val center = (mn + mx) / 2
      val half = math.max((mx - mn) / 2 * 1.01, 1e-9)
      val (_, _, sd, _, _, _, _) = SM.moments(xs.map(v => (v - center) / half))
      val v = math.max(sd * sd, 1e-4)
      Array(math.max(1.0 / v - 1.0, 0.2), center, half)
    }
  }

  /** ARGUS: pdf0 = χ³/(√(2π)Ψ(χ)) · z√(1−z²) e^{−χ²(1−z²)/2}, 0 ≤ z ≤ 1,
    * Ψ(χ) = Φ(χ) − χφ(χ) − ½. */
  object Argus extends ContinuousDist {
    val name = "argus"; val shapeNames = Seq("chi")
    override def a0(s: Array[Double]) = 0.0
    override def b0(s: Array[Double]) = 1.0
    override def shapesValid(s: Array[Double]) = s(0) > 0
    @inline private def psi(chi: Double): Double =
      math.max(SM.normCdf(chi) - chi * SM.normPdf(chi) - 0.5, 1e-300)
    def pdf0(z: Double, s: Array[Double]): Double = {
      val chi = s(0)
      if (z <= 0 || z >= 1) 0.0
      else {
        val u = 1 - z * z
        math.pow(chi, 3) / (SM.SqrtTwoPi * psi(chi)) * z * math.sqrt(u) *
          math.exp(-chi * chi * u / 2)
      }
    }
    def cdf0(z: Double, s: Array[Double]): Double = {
      val chi = s(0)
      if (z <= 0) 0.0 else if (z >= 1) 1.0
      else 1 - psi(chi * math.sqrt(1 - z * z)) / psi(chi)
    }
    def ppf0(q: Double, s: Array[Double]) = ppfBisect(this, q, s, 0.0, 1.0)
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val chi = s(0)
      // ln[χ³/(√2π·ψ(χ))] hoisted — ψ costs Φ + φ per call
      val k = 3 * math.log(chi) - math.log(SM.SqrtTwoPi * psi(chi))
      val h = chi * chi / 2
      var ll = 0.0; var i = 0
      while (i < zs.length) {
        val z = zs(i)
        if (z <= 0 || z >= 1) return Double.NegativeInfinity
        val u = 1 - z * z
        ll += math.log(z) + 0.5 * math.log(u) - h * u
        i += 1
      }
      ll + zs.length * k
    }
    def warmStart(xs: Array[Double]) = {
      val (mn, mx) = minMax(xs)
      val span = math.max(mx - mn, 1e-9)
      Array(1.0, mn - span * 0.01, span * 1.02)
    }
  }

  /** Crystal Ball: Gaussian core, power-law left tail below −β. */
  object CrystalBall extends ContinuousDist {
    val name = "crystalball"; val shapeNames = Seq("beta", "m")
    override def shapesValid(s: Array[Double]) = s(0) > 0 && s(1) > 1
    @inline private def nconst(s: Array[Double]): Double = {
      val b = s(0); val m = s(1)
      val c = m / (b * (m - 1)) * math.exp(-b * b / 2)
      val d = math.sqrt(math.Pi / 2) * (1 + SM.erf(b / SM.SqrtTwo))
      1.0 / (c + d)
    }
    def pdf0(z: Double, s: Array[Double]): Double = {
      val b = s(0); val m = s(1)
      val n = nconst(s)
      if (z > -b) n * math.exp(-z * z / 2)
      else {
        val a = math.pow(m / b, m) * math.exp(-b * b / 2)
        n * a * math.pow(m / b - b - z, -m)
      }
    }
    def cdf0(z: Double, s: Array[Double]): Double = {
      val b = s(0); val m = s(1)
      val n = nconst(s)
      if (z <= -b) {
        val a = math.pow(m / b, m) * math.exp(-b * b / 2)
        n * a * math.pow(m / b - b - z, -(m - 1)) / (m - 1)
      } else {
        val tail = n * m / (b * (m - 1)) * math.exp(-b * b / 2)
        tail + n * math.sqrt(math.Pi / 2) * (SM.erf(z / SM.SqrtTwo) + SM.erf(b / SM.SqrtTwo))
      }
    }
    def ppf0(q: Double, s: Array[Double]) =
      ppfBisect(this, q, s, Double.NegativeInfinity, Double.PositiveInfinity)
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val b = s(0); val m = s(1)
      val lnN = math.log(nconst(s)) // erf+exp+pow normalization hoisted
      val lnA = m * math.log(m / b) - b * b / 2
      val shift = m / b - b
      var ll = 0.0; var i = 0
      while (i < zs.length) {
        val z = zs(i)
        ll += (if (z > -b) -z * z / 2 else lnA - m * math.log(shift - z))
        i += 1
      }
      ll + zs.length * lnN
    }
    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      Array(1.0, 3.0, m, math.max(sd, 1e-9))
    }
  }

  /** Asymmetric Laplace: pdf0 = κ/(1+κ²)·e^{−zκ} (z ≥ 0), ·e^{z/κ} (z < 0). */
  object LaplaceAsymmetric extends ContinuousDist {
    val name = "laplace_asymmetric"; val shapeNames = Seq("kappa")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val k = s(0)
      math.log(k / (1 + k * k)) + (if (z >= 0) -z * k else z / k)
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]): Double = {
      val k = s(0); val k2 = k * k
      if (z < 0) k2 / (1 + k2) * math.exp(z / k)
      else 1 - math.exp(-z * k) / (1 + k2)
    }
    def ppf0(q: Double, s: Array[Double]): Double = {
      val k = s(0); val k2 = k * k
      val qm = k2 / (1 + k2)
      if (q < qm) k * math.log(q / qm)
      else -math.log((1 - q) * (1 + k2)) / k
    }
    def warmStart(xs: Array[Double]) = {
      val med = median(xs)
      val y = xs.map(v => math.abs(v - med)).sorted
      val mad = math.max(y(y.length / 2), 1e-9)
      val (_, _, _, g1, _, _, _) = SM.moments(xs)
      // κ < 1 skews right, κ > 1 skews left
      Array(math.exp(-math.max(-1.5, math.min(1.5, g1)) / 3), med, mad)
    }
  }

  /** Jones–Faddy skew-t: closed-form cdf/ppf through the incomplete beta
    * with u = (1 + z/√(a+b+z²))/2. */
  object JFSkewT extends ContinuousDist {
    val name = "jf_skew_t"; val shapeNames = Seq("a", "b")
    override def shapesValid(s: Array[Double]) = s(0) > 0 && s(1) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val a = s(0); val b = s(1)
      val r = math.sqrt(a + b + z * z)
      (a + 0.5) * math.log1p(z / r) + (b + 0.5) * math.log1p(-z / r) -
        (a + b - 1) * math.log(2.0) - SM.lbeta(a, b) - 0.5 * math.log(a + b)
    }
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val a = s(0); val b = s(1)
      val k = (a + b - 1) * math.log(2.0) + SM.lbeta(a, b) + 0.5 * math.log(a + b)
      val ab = a + b
      var ll = 0.0; var i = 0
      while (i < zs.length) {
        val z = zs(i)
        val r = math.sqrt(ab + z * z)
        ll += (a + 0.5) * math.log1p(z / r) + (b + 0.5) * math.log1p(-z / r)
        i += 1
      }
      ll - zs.length * k
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]): Double = {
      val a = s(0); val b = s(1)
      SM.betaInc(a, b, (1 + z / math.sqrt(a + b + z * z)) / 2)
    }
    def ppf0(q: Double, s: Array[Double]): Double = {
      val a = s(0); val b = s(1)
      val y = 2 * SM.betaIncInv(a, b, q) - 1
      if (y <= -1) Double.NegativeInfinity
      else if (y >= 1) Double.PositiveInfinity
      else y * math.sqrt((a + b) / (1 - y * y))
    }
    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      Array(2.0, 2.0, m, math.max(sd, 1e-9))
    }
  }

  /** Wrapped Cauchy on [0, 2π): pdf0 = (1−c²)/(2π(1+c²−2c·cos z)). */
  object WrapCauchy extends ContinuousDist {
    val name = "wrapcauchy"; val shapeNames = Seq("c")
    override def a0(s: Array[Double]) = 0.0
    override def b0(s: Array[Double]) = 2 * math.Pi
    override def shapesValid(s: Array[Double]) = s(0) > 0 && s(0) < 1
    def pdf0(z: Double, s: Array[Double]): Double = {
      val c = s(0)
      if (z < 0 || z > 2 * math.Pi) 0.0
      else (1 - c * c) / (2 * math.Pi * (1 + c * c - 2 * c * math.cos(z)))
    }
    def cdf0(z: Double, s: Array[Double]): Double = {
      val c = s(0)
      if (z <= 0) 0.0
      else if (z >= 2 * math.Pi) 1.0
      else {
        val r = (1 + c) / (1 - c)
        // branch-safe: atan argument flips sign at z = π
        if (z <= math.Pi) math.atan(r * math.tan(z / 2)) / math.Pi
        else 1.0 + math.atan(r * math.tan(z / 2)) / math.Pi
      }
    }
    def ppf0(q: Double, s: Array[Double]): Double = {
      val c = s(0)
      val r = (1 - c) / (1 + c)
      if (q <= 0.5) 2 * math.atan(r * math.tan(math.Pi * q))
      else 2 * math.Pi + 2 * math.atan(r * math.tan(math.Pi * (q - 1)))
    }
    def warmStart(xs: Array[Double]) = {
      val (mn, mx) = minMax(xs)
      val span = math.max(mx - mn, 1e-9)
      Array(0.5, mn - span * 0.005, span * 1.01 / (2 * math.Pi))
    }
  }

  /** Tukey lambda: defined by its quantile function
    * Q(q) = (q^λ − (1−q)^λ)/λ; cdf by monotone inversion. */
  object TukeyLambda extends ContinuousDist {
    val name = "tukeylambda"; val shapeNames = Seq("lam")
    override def a0(s: Array[Double]) =
      if (s(0) > 0) -1.0 / s(0) else Double.NegativeInfinity
    override def b0(s: Array[Double]) =
      if (s(0) > 0) 1.0 / s(0) else Double.PositiveInfinity
    def ppf0(q: Double, s: Array[Double]): Double = {
      val lam = s(0)
      if (math.abs(lam) < 1e-10) math.log(q / (1 - q))
      else (math.pow(q, lam) - math.pow(1 - q, lam)) / lam
    }
    def cdf0(z: Double, s: Array[Double]): Double = {
      // invert the monotone quantile function by bisection in q
      var lo = 1e-15; var hi = 1 - 1e-15
      if (z <= ppf0(lo, s)) return 0.0
      if (z >= ppf0(hi, s)) return 1.0
      var i = 0
      while (i < 80) {
        val mid = 0.5 * (lo + hi)
        if (ppf0(mid, s) < z) lo = mid else hi = mid
        i += 1
      }
      0.5 * (lo + hi)
    }
    def pdf0(z: Double, s: Array[Double]): Double = {
      val lam = s(0)
      val q = cdf0(z, s)
      if (q <= 0 || q >= 1) 0.0
      else {
        val dq = math.pow(q, lam - 1) + math.pow(1 - q, lam - 1)
        if (dq <= 0) 0.0 else 1.0 / dq
      }
    }
    /** The generic path inverts the quantile function per point (≈80
      * bisections each). Here the quantile curve is tabulated once per
      * evaluation on a uniform q-grid and each point is resolved with a
      * binary search + local interpolation — same 1/Q′(q) density. */
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val lam = s(0)
      val n = 4096
      val grid = new Array[Double](n + 1)
      var i = 0
      while (i <= n) {
        val q = (i + 0.5) / (n + 1)
        grid(i) = ppf0(q, s)
        i += 1
      }
      var ll = 0.0
      i = 0
      while (i < zs.length) {
        val z = zs(i)
        val q =
          if (z <= grid(0) || z >= grid(n)) cdf0(z, s) // exact in the tails
          else {
            var lo = 0; var hi = n
            while (hi - lo > 1) {
              val mid = (lo + hi) >>> 1
              if (grid(mid) < z) lo = mid else hi = mid
            }
            val frac = (z - grid(lo)) / math.max(grid(hi) - grid(lo), 1e-300)
            ((lo + 0.5) + frac) / (n + 1)
          }
        if (q <= 0 || q >= 1) return Double.NegativeInfinity
        val dq = math.pow(q, lam - 1) + math.pow(1 - q, lam - 1)
        if (dq <= 0 || dq.isNaN) return Double.NegativeInfinity
        ll -= math.log(dq)
        i += 1
      }
      ll
    }

    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      Array(0.14, m, math.max(sd / 1.9, 1e-9)) // λ ≈ 0.14 mimics the normal
    }
  }

  /** Reciprocal inverse Gaussian: 1/X of an invgauss(μ) —
    * cdf0(z) = 1 − F_IG(1/z; μ). */
  object RecipInvGauss extends ContinuousDist with PositiveSupport {
    val name = "recipinvgauss"; val shapeNames = Seq("mu")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val mu = s(0)
      if (z <= 0) Double.NegativeInfinity
      else {
        val d = 1 - mu * z
        -0.5 * math.log(2 * math.Pi * z) - d * d / (2 * z * mu * mu)
      }
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) =
      if (z <= 0) 0.0
      else 1.0 - ContinuousFamilies.InvGauss.cdf0(1.0 / z, s)
    def ppf0(q: Double, s: Array[Double]) = ppfBisect(this, q, s, 0.0, Double.PositiveInfinity)
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val y = xs.map(_ - l)
      val m = math.max(y.sum / y.length, 1e-9)
      // standardized mean ≈ 1/μ + μ·0 … seed μ from the harmonic-ish mean
      Array(1.0 / m, l, 1.0)
    }
  }

  /** Von Mises (line form, support [−π, π]): pdf0 = e^{κcos z}/(2π I₀(κ)).
    * The cdf Fourier series needs the ratios I_j(κ)/I₀(κ); they are
    * memoized per κ since cdf calls arrive in same-shape batches. */
  sealed class VonMisesBase(val name: String) extends ContinuousDist {
    val shapeNames = Seq("kappa")
    override def a0(s: Array[Double]) = -math.Pi
    override def b0(s: Array[Double]) = math.Pi
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val k = s(0)
      if (z < -math.Pi || z > math.Pi) Double.NegativeInfinity
      else k * math.cos(z) - math.log(2 * math.Pi) - SM.logBesselI(0.0, k)
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    private val ratioCache = new ThreadLocal[(Double, Array[Double])]
    private def ratios(k: Double): Array[Double] = {
      val c = ratioCache.get()
      if (c != null && c._1 == k) return c._2
      val li0 = SM.logBesselI(0.0, k)
      val nTerms = math.min(2000, math.max(30, (k + 12 * math.sqrt(k) + 20).toInt))
      val arr = new Array[Double](nTerms)
      var j = 1
      var keep = nTerms
      var done = false
      while (j <= nTerms && !done) {
        val r = math.exp(SM.logBesselI(j.toDouble, k) - li0)
        arr(j - 1) = r
        if (r < 1e-14) { keep = j; done = true }
        j += 1
      }
      val out = java.util.Arrays.copyOfRange(arr, 0, keep)
      ratioCache.set((k, out))
      out
    }
    def cdf0(z: Double, s: Array[Double]): Double = {
      if (z <= -math.Pi) 0.0
      else if (z >= math.Pi) 1.0
      else {
        val k = s(0)
        val r = ratios(k)
        var sum = 0.0
        var j = r.length
        while (j >= 1) { sum += r(j - 1) * math.sin(j * z) / j; j -= 1 }
        math.min(1.0, math.max(0.0, 0.5 + z / (2 * math.Pi) + sum / math.Pi))
      }
    }
    def ppf0(q: Double, s: Array[Double]) = ppfBisect(this, q, s, -math.Pi, math.Pi)
    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      val (mn, mx) = minMax(xs)
      // scale so the sample range maps strictly inside [−π, π], then pick
      // κ from the circular concentration of the standardized data
      val half = math.max(math.max(mx - m, m - mn), 1e-9)
      val sc = half / math.Pi * 1.02
      val sdz = sd / sc
      Array(math.max(1.0 / math.max(sdz * sdz, 1e-4), 0.1), m, sc)
    }
  }
  object VonMisesLine extends VonMisesBase("vonmises_line")
  object VonMises extends VonMisesBase("vonmises")

  /** Noncentral chi-squared(df, nc): pdf via log-Bessel, cdf via the
    * Poisson-weighted central-χ² mixture. */
  object Ncx2 extends ContinuousDist with PositiveSupport {
    val name = "ncx2"; val shapeNames = Seq("df", "nc")
    override def shapesValid(s: Array[Double]) = s(0) > 0 && s(1) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val k = s(0); val l = s(1)
      if (z <= 0) Double.NegativeInfinity
      else -math.log(2.0) - (z + l) / 2 + (k / 4 - 0.5) * (math.log(z) - math.log(l)) +
        SM.logBesselI(k / 2 - 1, math.sqrt(l * z))
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]): Double = {
      val k = s(0); val l2 = s(1) / 2
      if (z <= 0) return 0.0
      if (k + s(1) > 2000) {
        // Sankaran's normal approximation — the Poisson mixture would need
        // O(√λ) incomplete-gamma terms per call in this regime
        val p = (k + 2 * s(1)) / ((k + s(1)) * (k + s(1)))
        val h = 1 - 2.0 / 3.0 * (k + s(1)) * (k + 3 * s(1)) / ((k + 2 * s(1)) * (k + 2 * s(1)))
        val m = (h - 1) * (1 - 3 * h)
        val num = math.pow(z / (k + s(1)), h) - (1 + h * p * (h - 1 - 0.5 * (2 - h) * m * p))
        val den = h * math.sqrt(2 * p) * (1 + 0.5 * m * p)
        return SM.normCdf(num / den)
      }
      val mode = math.max(0L, math.floor(l2).toLong)
      var total = 0.0
      @inline def w(j: Long): Double = math.exp(-l2 + j * math.log(l2) - SM.lgamma(j + 1.0))
      var j = mode
      while (j >= 0) {
        val wj = w(j)
        if (wj < 1e-17 && j < mode) j = -1
        else { total += wj * SM.gammaInc(k / 2 + j, z / 2); j -= 1 }
      }
      j = mode + 1
      var wj = w(j)
      while (wj > 1e-17 && j < mode + 100000) {
        total += wj * SM.gammaInc(k / 2 + j, z / 2); j += 1; wj = w(j)
      }
      math.min(1.0, total)
    }
    def ppf0(q: Double, s: Array[Double]) = ppfBisect(this, q, s, 0.0, Double.PositiveInfinity)
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val y = xs.map(_ - l)
      val (m, sd) = meanStd(y)
      val v = sd * sd
      // m = k + λ, v = 2(k + 2λ) ⇒ λ = v/2 − m, k = 2m − v/2
      val lam = math.max(v / 2 - m, 0.5)
      val k = math.max(2 * m - v / 2, 0.5)
      Array(k, lam, l, 1.0)
    }
  }

  /** Noncentral F(dfn, dfd, nc): Poisson-weighted incomplete-beta mixture. */
  object Ncf extends ContinuousDist with PositiveSupport {
    val name = "ncf"; val shapeNames = Seq("dfn", "dfd", "nc")
    override def shapesValid(s: Array[Double]) = s(0) > 0 && s(1) > 0 && s(2) >= 0
    def cdf0(z: Double, s: Array[Double]): Double = {
      val dn = s(0); val dd = s(1); val l2 = s(2) / 2
      if (z <= 0) return 0.0
      val x = dn * z / (dn * z + dd)
      val mode = math.max(0L, math.floor(l2).toLong)
      var total = 0.0
      @inline def w(j: Long): Double =
        if (l2 <= 0) { if (j == 0) 1.0 else 0.0 }
        else math.exp(-l2 + j * math.log(l2) - SM.lgamma(j + 1.0))
      var j = mode
      while (j >= 0) {
        val wj = w(j)
        if (wj < 1e-17 && j < mode) j = -1
        else { total += wj * SM.betaInc(dn / 2 + j, dd / 2, x); j -= 1 }
      }
      j = mode + 1
      var wj = w(j)
      while (wj > 1e-17 && j < mode + 100000) {
        total += wj * SM.betaInc(dn / 2 + j, dd / 2, x); j += 1; wj = w(j)
      }
      math.min(1.0, total)
    }
    def pdf0(z: Double, s: Array[Double]): Double = {
      val dn = s(0); val dd = s(1); val l2 = s(2) / 2
      if (z <= 0) return 0.0
      val x = dn * z / (dn * z + dd)
      val dxdz = dn * dd / ((dn * z + dd) * (dn * z + dd))
      val mode = math.max(0L, math.floor(l2).toLong)
      var total = 0.0
      @inline def w(j: Long): Double =
        if (l2 <= 0) { if (j == 0) 1.0 else 0.0 }
        else math.exp(-l2 + j * math.log(l2) - SM.lgamma(j + 1.0))
      @inline def betaPdf(a: Double, b: Double): Double =
        math.exp((a - 1) * math.log(x) + (b - 1) * math.log1p(-x) - SM.lbeta(a, b))
      var j = mode
      while (j >= 0) {
        val wj = w(j)
        if (wj < 1e-17 && j < mode) j = -1
        else { total += wj * betaPdf(dn / 2 + j, dd / 2); j -= 1 }
      }
      j = mode + 1
      var wj = w(j)
      while (wj > 1e-17 && j < mode + 100000) {
        total += wj * betaPdf(dn / 2 + j, dd / 2); j += 1; wj = w(j)
      }
      total * dxdz
    }
    def ppf0(q: Double, s: Array[Double]) = ppfBisect(this, q, s, 0.0, Double.PositiveInfinity)

    /** The Poisson weights and lbeta normalizers depend only on the
      * shapes — hoist them out of the 10K-point loop (the generic path
      * pays ~20 lgamma calls per point per NM evaluation; this pays ~20
      * per evaluation total). */
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val dn = s(0); val dd = s(1); val l2 = s(2) / 2
      val mode = math.max(0L, math.floor(l2).toLong)
      // collect the non-negligible Poisson terms once
      @inline def w(j: Long): Double =
        if (l2 <= 0) { if (j == 0) 1.0 else 0.0 }
        else math.exp(-l2 + j * math.log(l2) - SM.lgamma(j + 1.0))
      var jLo = mode
      while (jLo > 0 && w(jLo - 1) > 1e-17) jLo -= 1
      var jHi = mode
      while (w(jHi + 1) > 1e-17 && jHi < mode + 100000) jHi += 1
      val nj = (jHi - jLo + 1).toInt
      if (nj <= 0 || nj > 200000) return Double.NegativeInfinity
      val ws = new Array[Double](nj)
      val am1 = new Array[Double](nj) // a_j − 1 exponents
      val lb = new Array[Double](nj)
      var j = 0
      while (j < nj) {
        val jj = jLo + j
        ws(j) = w(jj)
        am1(j) = dn / 2 + jj - 1
        lb(j) = SM.lbeta(dn / 2 + jj, dd / 2)
        j += 1
      }
      val bm1 = dd / 2 - 1
      var ll = 0.0
      var i = 0
      while (i < zs.length) {
        val z = zs(i)
        if (z <= 0) return Double.NegativeInfinity
        val x = dn * z / (dn * z + dd)
        val lx = math.log(x); val l1x = math.log1p(-x)
        val dxdz = dn * dd / ((dn * z + dd) * (dn * z + dd))
        var total = 0.0
        j = 0
        while (j < nj) {
          total += ws(j) * math.exp(am1(j) * lx + bm1 * l1x - lb(j))
          j += 1
        }
        val p = total * dxdz
        if (p <= 0 || p.isNaN) return Double.NegativeInfinity
        ll += math.log(p)
        i += 1
      }
      ll
    }

    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val y = xs.map(_ - l)
      val m = y.sum / y.length
      val dfd = math.max(2 * m / math.max(m - 1, 0.05), 5.0)
      Array(5.0, dfd, 1.0, l, 1.0)
    }
  }

  /** Normal-inverse-Gaussian(a, b): pdf via K₁; cdf by composite-Simpson
    * integration of the density from the effective lower tail. */
  object NormInvGauss extends ContinuousDist {
    val name = "norminvgauss"; val shapeNames = Seq("a", "b")
    override def shapesValid(s: Array[Double]) = s(0) > 0 && math.abs(s(1)) < s(0)
    override def logpdf0(z: Double, s: Array[Double]) = {
      val a = s(0); val b = s(1)
      val g = math.sqrt(a * a - b * b)
      val r = math.sqrt(1 + z * z)
      math.log(a / math.Pi) + g + b * z + SM.logBesselK1(a * r) - math.log(r)
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]): Double = {
      // integrate the density over [lo, z]; the NIG tails decay like
      // e^{−(a∓b)|z|}, so 40/(a−|b|) standard deviations of margin suffice
      val a = s(0); val b = s(1)
      val g = math.sqrt(a * a - b * b)
      val mean = b / g
      val spread = math.sqrt(a * a / (g * g * g)) + 1.0
      val lo = mean - spread * 6 - 40.0 / math.max(a - math.abs(b), 0.05)
      if (z <= lo) return 0.0
      val n0 = math.min(800, math.max(80, ((z - lo) * 8).toInt))
      val n = if (n0 % 2 == 0) n0 else n0 + 1
      val h = (z - lo) / n
      var sum = pdf0(lo, s) + pdf0(z, s)
      var i = 1
      while (i < n) {
        sum += (if (i % 2 == 1) 4.0 else 2.0) * pdf0(lo + i * h, s)
        i += 1
      }
      math.min(1.0, math.max(0.0, sum * h / 3))
    }
    def ppf0(q: Double, s: Array[Double]) =
      ppfBisect(this, q, s, Double.NegativeInfinity, Double.PositiveInfinity)
    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      Array(1.5, 0.0, m, math.max(sd, 1e-9))
    }
  }

  /** Noncentral t(df, nc): pdf in closed form via two Kummer ₁F₁ calls
    * with POSITIVE argument nc²z²/(2(df+z²)) — the direct power series in
    * nc·z alternates and cancels, the Kummer form never does. CDF by
    * Lenth's series: Φ(−δ) + ½Σ[pⱼ·I_x(j+½, df/2) + qⱼ·I_x(j+1, df/2)]
    * with Poisson-type weights in δ²/2, mirroring the Ncx2/Ncf mixture
    * loops; negative z via the (z, δ) → (−z, −δ) reflection. In the
    * reference this family is default-EXCLUDED for speed
    * (distributions.py:52 '~1.4s'); registered here, excluded by default,
    * opt-in via distributions=Some(...). */
  object Nct extends ContinuousDist {
    val name = "nct"; val shapeNames = Seq("df", "nc")
    override def shapesValid(s: Array[Double]) = s(0) > 0

    /** ₁F₁(a; b; z) for z ≥ 0, a,b > 0 — all-positive-term series. */
    @inline private def hyp1f1Pos(a: Double, b: Double, z: Double): Double = {
      var term = 1.0
      var sum = 1.0
      var k = 0
      while (term > sum * 1e-16 && k < 10000) {
        term *= (a + k) * z / ((b + k) * (k + 1))
        sum += term
        k += 1
      }
      sum
    }

    override def logpdf0(z: Double, s: Array[Double]): Double = {
      val p = pdf0(z, s)
      if (p <= 0.0) Double.NegativeInfinity else math.log(p)
    }

    def pdf0(z: Double, s: Array[Double]): Double = {
      val n = s(0); val nc = s(1)
      val x2 = z * z
      val fac1 = n + x2
      val logPx = 0.5 * n * math.log(n) + SM.lgamma(n + 1.0) -
        (n * math.log(2.0) + 0.5 * nc * nc + 0.5 * n * math.log(fac1) +
          SM.lgamma(0.5 * n))
      val valF = nc * nc * x2 / (2.0 * fac1)
      val trm1 = math.sqrt(2.0) * nc * z * hyp1f1Pos(0.5 * n + 1.0, 1.5, valF) /
        (fac1 * math.exp(SM.lgamma(0.5 * (n + 1.0))))
      val trm2 = hyp1f1Pos(0.5 * (n + 1.0), 0.5, valF) /
        (math.sqrt(fac1) * math.exp(SM.lgamma(0.5 * n + 1.0)))
      val p = math.exp(logPx) * (trm1 + trm2)
      if (java.lang.Double.isFinite(p)) math.max(0.0, p) else 0.0
    }

    def cdf0(z: Double, s: Array[Double]): Double = {
      val n = s(0)
      if (z < 0) return 1.0 - cdfNonneg(-z, n, -s(1))
      cdfNonneg(z, n, s(1))
    }

    /** Lenth (1989) series for t ≥ 0. */
    private def cdfNonneg(t: Double, n: Double, del: Double): Double = {
      val x = t * t / (t * t + n)
      val l2 = 0.5 * del * del
      var total = SM.normCdf(-del)
      if (x > 0) {
        val mode = math.max(0L, math.floor(l2).toLong)
        @inline def pw(j: Long): Double =
          if (l2 <= 0) { if (j == 0) 1.0 else 0.0 }
          else math.exp(-l2 + j * math.log(l2) - SM.lgamma(j + 1.0))
        @inline def qw(j: Long): Double =
          if (l2 <= 0) {
            if (j == 0) del / math.exp(SM.lgamma(1.5) + 0.5 * math.log(2.0)) else 0.0
          } else del / math.sqrt(2.0) *
            math.exp(-l2 + j * math.log(l2) - SM.lgamma(j + 1.5))
        var j = mode
        while (j >= 0) {
          val p = pw(j)
          if (p < 1e-17 && j < mode) j = -1
          else {
            total += 0.5 * (p * SM.betaInc(j + 0.5, 0.5 * n, x) +
              qw(j) * SM.betaInc(j + 1.0, 0.5 * n, x))
            j -= 1
          }
        }
        j = mode + 1
        var p = pw(j)
        while (p > 1e-17 && j < mode + 100000) {
          total += 0.5 * (p * SM.betaInc(j + 0.5, 0.5 * n, x) +
            qw(j) * SM.betaInc(j + 1.0, 0.5 * n, x))
          j += 1
          p = pw(j)
        }
      }
      math.min(1.0, math.max(0.0, total))
    }

    def ppf0(q: Double, s: Array[Double]) =
      ppfBisect(this, q, s, Double.NegativeInfinity, Double.PositiveInfinity)

    def warmStart(xs: Array[Double]) = {
      // loc and δ are confounded — pin a moderate df, set δ's sign from
      // the sample skew, and let the NM refine separate them
      val (_, _, _, skew, _, _, _) = SM.moments(xs)
      val del = math.max(-3.0, math.min(3.0, skew * 2.0))
      val sc = math.max((quantile(xs, 0.75) - quantile(xs, 0.25)) / 1.5, 1e-9)
      Array(5.0, del, median(xs) - del * sc, sc)
    }
  }

  /** Relativistic Breit-Wigner (scipy ≥1.11 `rel_breitwigner`, shape
    * ρ = M/Γ): pdf0(z, ρ) ∝ 1/((z²−ρ²)² + ρ²) on z ≥ 0. The CDF is
    * exact: the quartic factors into the real quadratics
    * (z²−bz+c)(z²+bz+c) with c = ρ√(ρ²+1), b² = 2(ρ²+c), and the
    * partial-fraction integral reduces to one log and two arctans. The
    * normalization k = 2cd/π is derived as 1/F(∞) from the same
    * factorization, so pdf/cdf are self-consistent by construction. */
  object RelBreitwigner extends ContinuousDist with PositiveSupport {
    val name = "rel_breitwigner"; val shapeNames = Seq("rho")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    // b, c, d with d² = 4c−b² = 2ρ(√(ρ²+1)−ρ) in cancellation-free form
    @inline private def bcd(rho: Double): (Double, Double, Double) = {
      val r1 = math.sqrt(rho * rho + 1.0)
      val c = rho * r1
      val b = math.sqrt(2.0 * (rho * rho + c))
      val d = math.sqrt(2.0 * rho / (r1 + rho))
      (b, c, d)
    }
    /** ∫₀^z du/((u²−ρ²)²+ρ²); A = −1/(2bc) is the log coefficient. */
    @inline private def fAt(z: Double, b: Double, c: Double, d: Double): Double = {
      val logTerm = -0.25 / (b * c) *
        math.log((z * z - b * z + c) / (z * z + b * z + c))
      val atanTerm = 0.5 / (c * d) *
        (math.atan((2 * z - b) / d) + math.atan((2 * z + b) / d))
      logTerm + atanTerm
    }
    def pdf0(z: Double, s: Array[Double]) = {
      if (z < 0) 0.0
      else {
        val rho = s(0)
        val (_, c, d) = bcd(rho)
        val t = z * z - rho * rho
        2.0 * c * d / (math.Pi * (t * t + rho * rho))
      }
    }
    def cdf0(z: Double, s: Array[Double]) = {
      if (z <= 0) 0.0
      else {
        val (b, c, d) = bcd(s(0))
        math.min(1.0, math.max(0.0, fAt(z, b, c, d) * 2.0 * c * d / math.Pi))
      }
    }
    def ppf0(q: Double, s: Array[Double]) =
      ppfBisect(this, q, s, 0.0, Double.PositiveInfinity)
    def warmStart(xs: Array[Double]) = {
      // the standardized density is a Lorentzian of IQR ≈ 1 centered near
      // ρ: scale from the IQR, then ρ from the scaled median
      val l = locBelowMin(xs)
      val y = xs.map(_ - l)
      val sc = math.max(quantile(y, 0.75) - quantile(y, 0.25), 1e-9)
      Array(math.max(0.5, median(y) / sc), l, sc)
    }
  }

  /** Irwin–Hall (scipy ≥1.16 `irwinhall`): sum of n iid U(0,1); support
    * [0, n]. pdf/cdf are the alternating piecewise-polynomial sums;
    * evaluation mirrors z → n−z (the density is symmetric) so the
    * alternating sum always runs on the smaller half, which bounds the
    * cancellation. n is capped at 40 — beyond that the sum loses the
    * mantissa (and the family is indistinguishable from a normal). */
  object IrwinHall extends ContinuousDist {
    val name = "irwinhall"; val shapeNames = Seq("n")
    override def shapesValid(s: Array[Double]) = s(0) >= 0.5 && s(0) <= 40.49
    override def a0(s: Array[Double]) = 0.0
    override def b0(s: Array[Double]) = math.max(1, math.round(s(0))).toDouble
    @inline private def nOf(s: Array[Double]) = math.max(1, math.round(s(0)).toInt)
    // 1/k! for k ≤ 41 — pdf0/cdf0 sit in the MLE hot loop, and
    // exp(lgamma(n)) per call costs more than the whole alternating sum
    private val invFact: Array[Double] = {
      val a = new Array[Double](42)
      a(0) = 1.0
      var k = 1
      while (k < 42) { a(k) = a(k - 1) / k; k += 1 }
      a
    }
    /** Σ_{k=0}^{⌊z⌋} (−1)^k C(n,k) (z−k)^pow — shared by pdf (pow=n−1)
      * and cdf (pow=n); binomials by exact multiplicative recurrence
      * (C(40,20) < 2^53). */
    @inline private def altSum(z: Double, n: Int, pow: Int): Double = {
      var sum = 0.0
      var binom = 1.0
      var k = 0
      val kMax = math.min(n, math.floor(z).toInt)
      while (k <= kMax) {
        val term = binom * math.pow(z - k, pow)
        sum += (if ((k & 1) == 0) term else -term)
        binom = binom * (n - k) / (k + 1)
        k += 1
      }
      sum
    }
    def pdf0(z: Double, s: Array[Double]) = {
      val n = nOf(s)
      // out-of-range n degrades to NaN like every other family's invalid
      // shape (the SQL UDFs map it to NULL) — never an array overrun
      if (n > 40) Double.NaN
      else if (z < 0 || z > n) 0.0
      else {
        val zz = if (z > 0.5 * n) n - z else z // symmetry halves cancellation
        math.max(0.0, altSum(zz, n, n - 1) * invFact(n - 1))
      }
    }
    def cdf0(z: Double, s: Array[Double]) = {
      val n = nOf(s)
      if (n > 40) Double.NaN
      else if (z <= 0) 0.0
      else if (z >= n) 1.0
      else if (z > 0.5 * n) 1.0 - cdfLower(n - z, n)
      else cdfLower(z, n)
    }
    @inline private def cdfLower(z: Double, n: Int): Double =
      math.min(1.0, math.max(0.0, altSum(z, n, n) * invFact(n)))
    def ppf0(q: Double, s: Array[Double]) =
      ppfBisect(this, q, s, 0.0, nOf(s).toDouble)
    def warmStart(xs: Array[Double]) = {
      // n lives on an integer plateau the NM polish can't cross, and the
      // kurtosis-moment estimate of n (−6/(5n)) is far too noisy — so
      // profile: for each candidate n, moment-match loc/scale
      // (var = n/12·scale², mean = n/2·scale + loc) and keep the n whose
      // start likelihood wins; the generic refine then polishes loc/scale
      val (_, m, sd, _, _, mn, mx) = SM.moments(xs)
      // rank candidates on a ≤2K subsample: the n-scan only needs to land
      // on the right integer plateau, and 40 full-sample NLL sweeps would
      // dominate the whole fit's cost
      // seeded shuffle, not a prefix — a head slice of an ordered sample
      // would rank candidates on the left tail alone
      val sub = if (xs.length > 2000) ContinuousDist.seededSubsample(xs, 2000, 42L) else xs
      val shortlist = (1 to 40).map { n =>
        // moment-matched scale, then widened so [loc, loc+n·scale] covers
        // the data — an uncovered sample is −inf likelihood and a penalty
        // start sends the NM refine wandering across n plateaus
        val scM = math.max(sd, 1e-9) * math.sqrt(12.0 / n)
        val sc = math.max(scM, (mx - mn) / n * (1.0 + 1e-9))
        val loc = mn - 0.5 * (n * sc - (mx - mn))
        val cand = Array(n.toDouble, loc, sc)
        (negLogLik(cand, sub), cand)
      }.sortBy(_._1).take(3)
      // adjacent n are too close for a subsample to separate — settle the
      // finalists on the full sample (3 full NLL sweeps, not 40)
      shortlist.map { case (_, cand) => (negLogLik(cand, xs), cand) }
        .minBy(_._1)._2
    }
  }

  /** Landau (scipy ≥1.15 `landau`): the α=1, β=1 stable distribution, no
    * shape parameters. There is no closed form; the standardized pdf is
    * p(z) = (1/π)∫₀^∞ exp(−t·ln t − zt)·sin(πt) dt, evaluated ONCE per
    * JVM by Simpson quadrature onto a fixed grid (step 0.01 on
    * [−3.6, 15], geometric to 400), with the exact 1/z² stable-law right
    * tail grafted past the grid and total mass renormalized. pdf0
    * interpolates the grid linearly; cdf0 uses cubic Hermite with the
    * tabulated density as the derivative, so cdf′ ≈ pdf to O(h²) (the
    * SSE/AIC pipelines need that consistency). The < 2e−6 of true mass
    * below −3.6 is truncated — see the zLo note for why the edge sits
    * there. */
  object Landau extends ContinuousDist {
    val name = "landau"; val shapeNames = Seq.empty

    // left edge −3.6, not further: the quadrature integrand's envelope is
    // e^(e^(−z−1)) — at z = −4.5 that is ~e^33 and Simpson noise on the
    // cancelling oscillations fabricates ~0.5% of spurious mass, while
    // the TRUE density below −3.6 is < 2e-6 (double-exponential tail), so
    // truncating there costs ~1e-6 of mass and removes the noise source
    private val zLo = -3.6
    private val coreHi = 15.0
    private val coreStep = 0.01
    private val zHi = 400.0

    /** Direct quadrature of the Landau integral — init-time only. */
    private def rawPdf(z: Double): Double = {
      // envelope exp(−t(ln t + z)) dies once t ln t + zt > 45. For large
      // z the integrand lives entirely in t ≲ 1/z, so BOTH the range and
      // the step must shrink with z — a fixed 0.02 step under-resolves
      // e^(−zt) beyond z ≈ 30 and silently loses ~1% of the tail mass
      // (which the renormalization then smears into a shifted median)
      val tMax =
        if (z >= 3) math.min(25.0, 60.0 / z + 1.0)
        else if (z >= 0) 25.0
        else 3.0 * math.exp(-z) + 25.0
      // left of 0 the envelope grows double-exponentially; h = 0.005
      // keeps the per-period Simpson error ~envelope·h⁴ below 1e-4 at the
      // −3.6 edge
      val n0 =
        if (z < 0) math.max(24000, (tMax / 0.005).toInt)
        else math.max(4000, (tMax / 0.02).toInt)
      val n = if (n0 % 2 == 0) n0 else n0 + 1
      val h = tMax / n
      @inline def f(t: Double): Double =
        if (t <= 0.0) 0.0
        else math.exp(-t * math.log(t) - z * t) * math.sin(math.Pi * t)
      var sum = f(0.0) + f(tMax)
      var i = 1
      while (i < n) {
        sum += (if ((i & 1) == 1) 4.0 else 2.0) * f(i * h)
        i += 1
      }
      math.max(0.0, sum * h / (3.0 * math.Pi))
    }

    // (grid, pdf, cdf, tail constant C with pdf≈C/z² beyond the grid,
    //  standardized quartiles for the warm start)
    private lazy val table: (Array[Double], Array[Double], Array[Double],
        Double, Double, Double, Double) = {
      val core = (0 to ((coreHi - zLo) / coreStep).toInt)
        .map(i => zLo + i * coreStep)
      val geo = Iterator.iterate(coreHi * 1.005)(_ * 1.005)
        .takeWhile(_ < zHi).toSeq
      val zs = (core ++ geo :+ zHi).toArray
      val pdf = zs.map(rawPdf)
      // cumulative Simpson: midpoint-refined per segment
      val cdf = new Array[Double](zs.length)
      var i = 1
      while (i < zs.length) {
        val h = zs(i) - zs(i - 1)
        val mid = rawPdf(0.5 * (zs(i) + zs(i - 1)))
        cdf(i) = cdf(i - 1) + h / 6.0 * (pdf(i - 1) + 4.0 * mid + pdf(i))
        i += 1
      }
      // stable-law right tail p(z) = C/z²: continuity in the density, then
      // renormalize so cdf_end + C/z_end = 1 exactly
      val cRaw = pdf.last * zHi * zHi
      val total = cdf.last + cRaw / zHi
      var j = 0
      while (j < zs.length) { pdf(j) /= total; cdf(j) /= total; j += 1 }
      val c = cRaw / total
      def q(p: Double): Double = {
        val k = cdf.indexWhere(_ >= p)
        if (k <= 0) zs(0)
        else zs(k - 1) + (zs(k) - zs(k - 1)) * (p - cdf(k - 1)) / (cdf(k) - cdf(k - 1))
      }
      (zs, pdf, cdf, c, q(0.25), q(0.5), q(0.75))
    }

    @inline private def idxOf(z: Double, zs: Array[Double]): Int = {
      if (z < coreHi) ((z - zLo) / coreStep).toInt
      else {
        var lo = ((coreHi - zLo) / coreStep).toInt; var hi = zs.length - 1
        while (hi - lo > 1) {
          val mid = (lo + hi) >>> 1
          if (zs(mid) <= z) lo = mid else hi = mid
        }
        lo
      }
    }

    def pdf0(z: Double, s: Array[Double]) = {
      val (zs, pdf, _, c, _, _, _) = table
      if (z <= zLo) 0.0
      else if (z >= zHi) c / (z * z)
      else {
        val i = math.min(idxOf(z, zs), zs.length - 2)
        val w = (z - zs(i)) / (zs(i + 1) - zs(i))
        pdf(i) * (1.0 - w) + pdf(i + 1) * w
      }
    }

    def cdf0(z: Double, s: Array[Double]) = {
      val (zs, pdf, cdf, c, _, _, _) = table
      if (z <= zLo) 0.0
      else if (z >= zHi) 1.0 - c / z
      else {
        val i = math.min(idxOf(z, zs), zs.length - 2)
        val h = zs(i + 1) - zs(i)
        val t = (z - zs(i)) / h
        // cubic Hermite with the density as the derivative: cdf′ tracks
        // pdf to O(h²), which the cdf-vs-pdf consistency property needs
        val t2 = t * t; val t3 = t2 * t
        (2 * t3 - 3 * t2 + 1) * cdf(i) + (t3 - 2 * t2 + t) * h * pdf(i) +
          (-2 * t3 + 3 * t2) * cdf(i + 1) + (t3 - t2) * h * pdf(i + 1)
      }
    }

    def ppf0(q: Double, s: Array[Double]) =
      ppfBisect(this, q, s, zLo, Double.PositiveInfinity)

    def warmStart(xs: Array[Double]) = {
      val (_, _, _, _, q25, q50, q75) = table
      val iqr = math.max(quantile(xs, 0.75) - quantile(xs, 0.25), 1e-9)
      val sc = iqr / (q75 - q25)
      Array(median(xs) - q50 * sc, sc)
    }
  }

  /** Double Pareto-lognormal (scipy ≥1.16 `dpareto_lognorm`; Reed &
    * Jorgensen 2004, "The double Pareto-lognormal distribution"): the
    * law of e^{BM+drift} observed at an exponentially-distributed time —
    * power-law upper tail z^{−α−1}, power-law lower tail z^{β−1}, a
    * lognormal body with log-scale σ. Shapes (alpha, beta, sigma),
    * standardized at log-location ν = 0 (loc/scale carry it as
    * scale = e^ν). pdf/cdf are the closed Φ/Φc forms with every
    * z-power·Φ product evaluated in log space (the raw products
    * overflow/underflow across the tails); cdf′ = pdf holds analytically
    * (verified term-by-term: the φ pieces cancel against Φ(y)′). The
    * reference default-EXCLUDES this family for speed
    * (src/spark_bestfit/distributions.py:53); registered here under the
    * same opt-in semantics. */
  object DParetoLognorm extends ContinuousDist with PositiveSupport {
    val name = "dpareto_lognorm"
    val shapeNames = Seq("alpha", "beta", "sigma")
    override def shapesValid(s: Array[Double]) =
      s(0) > 0 && s(1) > 0 && s(2) > 0

    override def logpdf0(z: Double, s: Array[Double]): Double = {
      if (z <= 0) return Double.NegativeInfinity
      val a = s(0); val b = s(1); val t = s(2)
      val lz = math.log(z); val y = lz / t
      val c = math.log(a) + math.log(b) - math.log(a + b)
      val u1 = -(a + 1.0) * lz + 0.5 * a * a * t * t + SM.normLogCdf(y - a * t)
      val u2 = (b - 1.0) * lz + 0.5 * b * b * t * t + SM.normLogSf(y + b * t)
      val m = math.max(u1, u2)
      if (m.isNegInfinity) Double.NegativeInfinity
      else c + m + math.log1p(math.exp(math.min(u1, u2) - m))
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))

    def cdf0(z: Double, s: Array[Double]): Double = {
      if (z <= 0) return 0.0
      val a = s(0); val b = s(1); val t = s(2)
      val lz = math.log(z); val y = lz / t
      val e1 = math.exp(-a * lz + 0.5 * a * a * t * t + SM.normLogCdf(y - a * t))
      val e2 = math.exp(b * lz + 0.5 * b * b * t * t + SM.normLogSf(y + b * t))
      val f = SM.normCdf(y) - (b * e1 - a * e2) / (a + b)
      math.min(1.0, math.max(0.0, f))
    }

    def ppf0(q: Double, s: Array[Double]) =
      ppfBisect(this, q, s, 0.0, Double.PositiveInfinity)

    def warmStart(xs: Array[Double]) = {
      val (mn, _) = minMax(xs)
      val l = if (mn > 0) 0.0 else locBelowMin(xs)
      val logs = xs.map(x => math.log(x - l))
      val (m, sd) = meanStd(logs)
      // moderate tail indices + a body narrower than the log-spread (the
      // Pareto wings account for part of the observed variance)
      Array(2.5, 2.5, math.max(0.7 * sd, 1e-3), l, math.exp(m))
    }
  }

  val all: Seq[ContinuousDist] = Seq(
    GenExpon, GenHalfLogistic, Kappa3, Kappa4, RDist, Argus, CrystalBall,
    LaplaceAsymmetric, JFSkewT, WrapCauchy, TukeyLambda, RecipInvGauss,
    VonMisesLine, VonMises, Ncx2, Ncf, NormInvGauss,
    Nct, RelBreitwigner, IrwinHall, Landau, DParetoLognorm)
}
