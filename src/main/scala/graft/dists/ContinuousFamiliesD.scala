package graft.dists

import graft.functions.{SpecialMath => SM}
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

  val all: Seq[ContinuousDist] = Seq(
    GenExpon, GenHalfLogistic, Kappa3, Kappa4, RDist, Argus, CrystalBall,
    LaplaceAsymmetric, JFSkewT, WrapCauchy, TukeyLambda, RecipInvGauss,
    VonMisesLine, VonMises, Ncx2, Ncf, NormInvGauss)
}
