package graft.dists

import graft.functions.{SpecialMath => SM}
import ContinuousDist.{meanStd, minMax, median, quantile}
import ContinuousFamilies.ppfBisect

/** Tier E: the final continuous families closing the registry out to the
  * reference's full scipy zoo (reference: src/spark_bestfit/distributions.py:79-80
  * enumerates every rv_continuous; lines 33-54 default-exclude the slow
  * ones). Every family here except `gibrat` is default-EXCLUDED by the
  * reference for speed — implemented and registered so the
  * `custom_exclusions` / `distributions=[...]` opt-in paths work, excluded
  * from the default zoo exactly like the reference.
  *
  * `gibrat` is the one default-zoo member: scipy renamed `gilbrat` →
  * `gibrat`, and the reference's ALL_DISTRIBUTIONS (built from
  * `dir(scipy.stats)`) carries only the new name.
  */
object ContinuousFamiliesE {

  /** Gibrat = lognorm with s = 1 fixed — scipy's post-1.9 name for
    * `gilbrat`; the legacy spelling stays registered (default-excluded)
    * so existing call sites keep working. */
  object Gibrat extends ContinuousDist with PositiveSupport {
    val name = "gibrat"; val shapeNames = Seq.empty
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

  /** Exponential power (scipy `exponpow`, shape b > 0):
    * pdf0(z) = b z^{b−1} exp(1 + z^b − e^{z^b}), z ≥ 0. CDF and PPF are
    * closed form: F = 1 − exp(1 − e^{z^b}), F⁻¹(q) = (ln(1 − ln(1−q)))^{1/b}. */
  object ExponPow extends ContinuousDist with PositiveSupport {
    val name = "exponpow"; val shapeNames = Seq("b")
    override def shapesValid(s: Array[Double]) = s(0) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      val b = s(0)
      // z == 0 maps to −∞ even for b < 1 (where the density truly
      // diverges): feeding the +∞ spike to the MLE would reward parking
      // loc exactly on a data point (the classic unbounded-likelihood
      // pathology); scipy's fit penalizes the same way
      if (z <= 0) Double.NegativeInfinity
      else {
        val zb = math.pow(z, b)
        if (zb > 700) Double.NegativeInfinity
        else math.log(b) + (b - 1) * math.log(z) + 1.0 + zb - math.exp(zb)
      }
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = {
      if (z <= 0) 0.0
      else {
        val zb = math.pow(z, s(0))
        if (zb > 700) 1.0 else 1.0 - math.exp(1.0 - math.exp(zb))
      }
    }
    def ppf0(q: Double, s: Array[Double]) =
      math.pow(math.log(1.0 - math.log1p(-q)), 1.0 / s(0))
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      val (_, mx) = minMax(xs)
      // pdf mass sits in z ∈ (0, ~1.3) for b ≈ 1: scale from the max
      Array(1.0, l, math.max((mx - l) / 1.2, 1e-9))
    }
  }

  /** Mielke Beta-Kappa (scipy `mielke`, shapes k > 0, s > 0):
    * pdf0(z) = k z^{k−1} / (1 + z^s)^{1 + k/s}, z > 0, with the exact CDF
    * F = (z^s / (1 + z^s))^{k/s} and closed-form PPF
    * z = (u/(1−u))^{1/s}, u = q^{s/k}. Default-excluded by the reference
    * ("Slow", distributions.py:40). */
  object Mielke extends ContinuousDist with PositiveSupport {
    val name = "mielke"; val shapeNames = Seq("k", "s")
    override def shapesValid(s: Array[Double]) = s(0) > 0 && s(1) > 0
    override def logpdf0(z: Double, s: Array[Double]) = {
      if (z <= 0) Double.NegativeInfinity
      else {
        val k = s(0); val ss = s(1)
        val ls = ss * math.log(z)
        // log(1 + z^s) = softplus(s ln z), overflow-free
        val l1p = if (ls > 700) ls else math.log1p(math.exp(math.min(ls, 700)))
        math.log(k) + (k - 1) * math.log(z) - (1.0 + k / ss) * l1p
      }
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    def cdf0(z: Double, s: Array[Double]) = {
      if (z <= 0) 0.0
      else {
        val k = s(0); val ss = s(1)
        val ls = ss * math.log(z)
        // log F = (k/s)(log z^s − log(1+z^s)) = −(k/s)·softplus(−s ln z)
        val sp = if (-ls > 700) -ls else math.log1p(math.exp(math.min(-ls, 700)))
        math.exp(-(k / ss) * sp)
      }
    }
    def ppf0(q: Double, s: Array[Double]) = {
      val k = s(0); val ss = s(1)
      // z = (u/(1−u))^{1/s}, u = q^{s/k}, computed in logs for tail safety
      val lu = (ss / k) * math.log(q)
      val l1mu = SM.log1mexp(lu) // log(1 − u)
      math.exp((lu - l1mu) / ss)
    }
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      Array(2.0, 2.0, l, math.max(median(xs) - l, 1e-9))
    }
  }

  /** Kolmogorov limit distribution (scipy `kstwobign`): the law of
    * sup|B(t)| of the Brownian bridge — the n→∞ limit of √n·D_n. Both
    * theta-series representations are used on their fast side
    * (Jacobi transform): the alternating sum for z ≥ 1, the
    * √(2π)/z · Σ exp(−(2k−1)²π²/(8z²)) dual for z < 1, with the pdf as
    * the exact term-by-term derivative of whichever series is active. */
  object KsTwoBign extends ContinuousDist with PositiveSupport {
    val name = "kstwobign"; val shapeNames = Seq.empty
    private val Pi2o8 = math.Pi * math.Pi / 8.0
    def cdf0(z: Double, s: Array[Double]): Double = {
      if (z <= 0.04) return 0.0 // < 1e-300 territory
      if (z >= 1.0) 1.0 - SM.kolmogorovSf(z)
      else {
        var sum = 0.0
        var k = 1
        var term = Double.MaxValue
        while (k <= 20 && term > 1e-18 * sum) {
          val a = (2 * k - 1.0) * (2 * k - 1.0) * Pi2o8
          term = math.exp(-a / (z * z))
          sum += term
          k += 1
        }
        math.min(1.0, SM.SqrtTwoPi * sum / z)
      }
    }
    def pdf0(z: Double, s: Array[Double]): Double = {
      if (z <= 0.0) return 0.0
      if (z >= 1.0) {
        // d/dz [1 − 2Σ(−1)^{k−1}e^{−2k²z²}] = 8z Σ (−1)^{k−1} k² e^{−2k²z²}
        var sum = 0.0
        var k = 1
        var term = Double.MaxValue
        while (k <= 60 && math.abs(term) > 1e-18) {
          term = (if (k % 2 == 1) 1.0 else -1.0) * k * k * math.exp(-2.0 * k * k * z * z)
          sum += term
          k += 1
        }
        math.max(0.0, 8.0 * z * sum)
      } else {
        // d/dz [√(2π)/z Σ e^{−a_k/z²}] = √(2π) Σ e^{−a_k/z²}(2a_k/z⁴ − 1/z²)
        var sum = 0.0
        var k = 1
        var go = true
        while (k <= 20 && go) {
          val a = (2 * k - 1.0) * (2 * k - 1.0) * Pi2o8
          val e = math.exp(-a / (z * z))
          val t = e * (2.0 * a / math.pow(z, 4) - 1.0 / (z * z))
          sum += t
          go = e > 1e-18
          k += 1
        }
        math.max(0.0, SM.SqrtTwoPi * sum)
      }
    }
    /** The left tail underflows double precision near z ≈ 0.04
      * (pdf ~ e^{−π²/8z²}); the MLE needs the exponent, not the
      * underflowed 0, or every warm start with loc near min(x) reads as a
      * −∞ cliff and the polish never runs. */
    override def logpdf0(z: Double, s: Array[Double]): Double = {
      if (z <= 0.0) Double.NegativeInfinity
      else if (z < 0.3) {
        val a1 = Pi2o8
        -a1 / (z * z) + math.log(SM.SqrtTwoPi * (2.0 * a1 / math.pow(z, 4) - 1.0 / (z * z)))
      } else {
        val p = pdf0(z, s)
        if (p <= 0.0) Double.NegativeInfinity else math.log(p)
      }
    }
    def ppf0(q: Double, s: Array[Double]) = ppfBisect(this, q, s, 0.0, 10.0)
    def warmStart(xs: Array[Double]) = {
      // median of the Kolmogorov law ≈ 0.82757·scale above loc; anchor loc
      // a quarter-gap below the min so the smallest point sits at z ≈ 0.2,
      // inside the representable left tail
      val (mn, _) = minMax(xs)
      val med = median(xs)
      val l = mn - 0.25 * math.max(med - mn, 1e-9)
      Array(l, math.max((med - l) / 0.82757, 1e-9))
    }
  }

  /** One-sided Kolmogorov-Smirnov D⁺_n (scipy `ksone`, integer shape n):
    * survival by the exact Birnbaum–Tingey sum
    * sf(x) = x Σ_{j=0}^{⌊n(1−x)⌋} C(n,j)(x+j/n)^{j−1}(1−x−j/n)^{n−j},
    * terms evaluated in log space; the pdf is the term-by-term analytic
    * derivative −d sf/dx. n is capped at 2000 (the sum is O(n) per
    * evaluation; the family is default-excluded, distributions.py:37). */
  object KsOne extends ContinuousDist {
    val name = "ksone"; val shapeNames = Seq("n")
    override def a0(s: Array[Double]) = 0.0
    override def b0(s: Array[Double]) = 1.0
    override def shapesValid(s: Array[Double]) = s(0) >= 0.5 && s(0) <= 2000.49
    @inline private def nOf(s: Array[Double]) = math.max(1, math.round(s(0)).toInt)

    /** (sf, −d sf/dx) in one pass. */
    private def sfAndNegDeriv(x: Double, n: Int): (Double, Double) = {
      if (x <= 0) return (1.0, 0.0)
      if (x >= 1) return (0.0, 0.0)
      val jMax = math.floor(n * (1.0 - x)).toInt
      val lgN = SM.lgamma(n + 1.0)
      var sf = 0.0
      var dsum = 0.0 // Σ d/dx [x·T_j]
      var j = 0
      while (j <= jMax) {
        val aj = x + j.toDouble / n        // > 0
        val bj = 1.0 - x - j.toDouble / n  // >= 0 at the boundary term
        val lC = lgN - SM.lgamma(j + 1.0) - SM.lgamma(n - j + 1.0)
        if (j == 0) {
          // x·T_0 = (1−x)^n
          val t = math.exp(n * math.log1p(-x))
          sf += t
          dsum += -n * math.exp((n - 1) * math.log1p(-x))
        } else if (bj <= 0.0) {
          // boundary term (1−x−j/n)^{n−j}: zero unless n=j (then it is 1)
          if (n == j) {
            val t = math.exp(lC + (j - 1) * math.log(aj)) * x
            sf += t
            dsum += math.exp(lC + (j - 2) * math.log(aj)) * (j * aj - (j - 1) * (aj - x)) // d/dx[x a^{j-1}]
          }
        } else {
          val lT = lC + (j - 1) * math.log(aj) + (n - j) * math.log(bj)
          val t = math.exp(lT)
          sf += x * t
          // d/dx [x·T_j] = T_j + x·T_j·((j−1)/a_j − (n−j)/b_j)
          dsum += t * (1.0 + x * ((j - 1) / aj - (n - j).toDouble / bj))
        }
        j += 1
      }
      (math.min(1.0, math.max(0.0, sf)), -dsum)
    }

    def cdf0(z: Double, s: Array[Double]) = 1.0 - sfAndNegDeriv(z, nOf(s))._1
    def pdf0(z: Double, s: Array[Double]) = {
      val d = -sfAndNegDeriv(z, nOf(s))._2
      if (d < 0) 0.0 else d
    }
    def ppf0(q: Double, s: Array[Double]) = ppfBisect(this, q, s, 0.0, 1.0)
    def warmStart(xs: Array[Double]) = {
      // E[D⁺_n] ≈ √(π/(8n)) ⇒ n ≈ π/(8·mean²) for loc=0, scale=1
      val (mn, mx) = minMax(xs)
      val span = math.max(mx - mn, 1e-9)
      val l = mn - 1e-4 * span
      val sc = span * 1.02
      val m = (meanStd(xs)._1 - l) / sc
      Array(math.min(2000.0, math.max(1.0, math.Pi / (8.0 * m * m))), l, sc)
    }
  }

  /** Two-sided Kolmogorov-Smirnov D_n (scipy `kstwo`, integer shape n):
    * cdf via the Stephens-corrected Kolmogorov limit
    * P(D_n ≤ d) ≈ K((√n + 0.12 + 0.11/√n)·d) (Stephens 1970, the same
    * public modification the engine's K-S p-values use), with the exact
    * Ruben-Gambino closed forms on the support edges
    * (d ≤ 1/n: n!(2d−1/n)^n; d ≥ 1−1/n: 1−2(1−d)^n). Accuracy ~1e-3 for
    * n ≥ 5 — documented approximation; the family is default-excluded
    * ("Slow", distributions.py:46) and the exact Durbin-matrix evaluation
    * costs O(n³ log n) per point, which no fit loop survives. pdf is the
    * central difference of this cdf, so pdf/cdf stay mutually consistent. */
  object KsTwo extends ContinuousDist {
    val name = "kstwo"; val shapeNames = Seq("n")
    override def a0(s: Array[Double]) = 0.0
    override def b0(s: Array[Double]) = 1.0
    override def shapesValid(s: Array[Double]) = s(0) >= 0.5 && s(0) <= 100000.49
    @inline private def nOf(s: Array[Double]) = math.max(1, math.round(s(0)).toInt)
    def cdf0(z: Double, s: Array[Double]): Double = {
      val n = nOf(s)
      if (z <= 0.5 / n) return 0.0
      if (z >= 1.0) return 1.0
      if (z <= 1.0 / n) {
        // exact: n!(2d − 1/n)^n
        return math.exp(SM.lgamma(n + 1.0) + n * math.log(2 * z - 1.0 / n))
      }
      if (z >= 1.0 - 1.0 / n)
        return 1.0 - 2.0 * math.exp(n * math.log1p(-z))
      val sn = math.sqrt(n.toDouble)
      val t = (sn + 0.12 + 0.11 / sn) * z
      1.0 - SM.kolmogorovSf(t)
    }
    def pdf0(z: Double, s: Array[Double]): Double = {
      val h = 1e-6
      val d = (cdf0(z + h, s) - cdf0(z - h, s)) / (2 * h)
      if (d < 0) 0.0 else d
    }
    def ppf0(q: Double, s: Array[Double]) = ppfBisect(this, q, s, 0.0, 1.0)
    def warmStart(xs: Array[Double]) = {
      // E[D_n] ≈ 0.8687/√n for loc=0, scale=1
      val (mn, mx) = minMax(xs)
      val span = math.max(mx - mn, 1e-9)
      val l = mn - 1e-4 * span
      val sc = span * 1.02
      val m = (meanStd(xs)._1 - l) / sc
      Array(math.min(100000.0, math.max(1.0, math.pow(0.8687 / m, 2))), l, sc)
    }
  }

  /** Generalized inverse Gaussian (scipy `geninvgauss`, shapes p ∈ ℝ,
    * b > 0): pdf0(z) = z^{p−1} e^{−b(z+1/z)/2} / (2 K_p(b)), z > 0. The
    * K_p(b) normalizer comes from [[SM.logBesselK]] and is hoisted out of
    * the sample loop in logpdf0Sum; the cdf integrates the density with
    * composite Simpson (the essential singularity e^{−b/2z} flattens the
    * z→0 end, so the integrand is smooth on the closed bracket).
    * Default-excluded by the reference ("Can hang", distributions.py:44). */
  object GenInvGauss extends ContinuousDist with PositiveSupport {
    val name = "geninvgauss"; val shapeNames = Seq("p", "b")
    override def shapesValid(s: Array[Double]) =
      s(1) > 1e-8 && s(1) < 700 && math.abs(s(0)) < 100
    override def logpdf0(z: Double, s: Array[Double]) = {
      if (z <= 0) Double.NegativeInfinity
      else {
        val p = s(0); val b = s(1)
        (p - 1) * math.log(z) - 0.5 * b * (z + 1.0 / z) -
          (math.log(2.0) + SM.logBesselK(p, b))
      }
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val p = s(0); val b = s(1)
      val lnorm = math.log(2.0) + SM.logBesselK(p, b) // ONE Bessel per objective eval
      var ll = 0.0
      var i = 0
      while (i < zs.length) {
        val z = zs(i)
        if (z <= 0) return Double.NegativeInfinity
        ll += (p - 1) * math.log(z) - 0.5 * b * (z + 1.0 / z) - lnorm
        i += 1
      }
      if (ll.isNaN) Double.NegativeInfinity else ll
    }
    def cdf0(z: Double, s: Array[Double]): Double = {
      if (z <= 0) return 0.0
      val p = s(0); val b = s(1)
      // mode m = ((p−1) + √((p−1)²+b²))/b; past the upper-tail cutoff the
      // density mass is < e^{−45}, so clamp to 1 instead of integrating on
      val m = ((p - 1) + math.sqrt((p - 1) * (p - 1) + b * b)) / b
      val cut = m + 90.0 / b + 20.0 * math.max(1.0, m) +
        math.max(0.0, 2.0 * (p - 1)) * 20.0 / b
      val hi = math.min(z, cut)
      val n0 = 1200
      val h = hi / n0
      var sum = pdf0(hi, s) // pdf(0) = 0 (essential singularity kills it)
      var i = 1
      while (i < n0) {
        sum += (if (i % 2 == 1) 4.0 else 2.0) * pdf0(i * h, s)
        i += 1
      }
      val v = sum * h / 3
      if (z >= cut) 1.0 else math.min(1.0, math.max(0.0, v))
    }
    def ppf0(q: Double, s: Array[Double]) =
      ppfBisect(this, q, s, 0.0, Double.PositiveInfinity)
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      Array(1.0, 1.0, l, math.max(meanStd(xs)._1 - l, 1e-9))
    }
  }

  /** Generalized hyperbolic (scipy `genhyperbolic`, shapes p ∈ ℝ, a > 0,
    * |b| < a): pdf0(z) = C · (1+z²)^{(p−1/2)/2} K_{p−1/2}(a√(1+z²)) e^{bz}
    * with C = (a²−b²)^{p/2} / (√(2π) a^{p−1/2} K_p(√(a²−b²))). One
    * Bessel K per point (log-space), the C normalizer hoisted in
    * logpdf0Sum; cdf by composite Simpson over the e^{−(a−|b|)|z|} tails.
    * Default-excluded by the reference ("Slow", distributions.py:45). */
  object GenHyperbolic extends ContinuousDist {
    val name = "genhyperbolic"; val shapeNames = Seq("p", "a", "b")
    override def shapesValid(s: Array[Double]) =
      s(1) > 1e-6 && math.abs(s(2)) < s(1) - 1e-12 && math.abs(s(0)) < 100 && s(1) < 350
    @inline private def logC(p: Double, a: Double, b: Double): Double = {
      val g = math.sqrt(a * a - b * b)
      0.5 * p * math.log(a * a - b * b) - SM.LnSqrtTwoPi - // log √(2π)
        (p - 0.5) * math.log(a) - SM.logBesselK(p, g)
    }
    override def logpdf0(z: Double, s: Array[Double]) =
      logpdf0C(z, s, logC(s(0), s(1), s(2)))
    @inline private def logpdf0C(z: Double, s: Array[Double], lc: Double): Double = {
      val p = s(0); val a = s(1); val b = s(2)
      val r = math.sqrt(1.0 + z * z)
      lc + 0.5 * (p - 0.5) * math.log1p(z * z) + SM.logBesselK(p - 0.5, a * r) + b * z
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val lc = logC(s(0), s(1), s(2))
      var ll = 0.0
      var i = 0
      while (i < zs.length) {
        val lp = logpdf0C(zs(i), s, lc)
        if (lp.isNaN || lp == Double.NegativeInfinity) return Double.NegativeInfinity
        ll += lp
        i += 1
      }
      ll
    }
    def cdf0(z: Double, s: Array[Double]): Double = {
      val a = s(1); val b = s(2)
      val decay = math.max(a - math.abs(b), 0.02)
      val lo = math.min(-1.0, z - 1.0) - 45.0 / decay
      if (z <= lo) return 0.0
      val n0 = math.min(2000, math.max(200, ((z - lo) * 10).toInt)) / 2 * 2
      val h = (z - lo) / n0
      val lc = logC(s(0), a, b)
      var sum = math.exp(logpdf0C(lo, s, lc)) + math.exp(logpdf0C(z, s, lc))
      var i = 1
      while (i < n0) {
        sum += (if (i % 2 == 1) 4.0 else 2.0) * math.exp(logpdf0C(lo + i * h, s, lc))
        i += 1
      }
      math.min(1.0, math.max(0.0, sum * h / 3))
    }
    def ppf0(q: Double, s: Array[Double]) =
      ppfBisect(this, q, s, Double.NegativeInfinity, Double.PositiveInfinity)
    def warmStart(xs: Array[Double]) = {
      val (m, sd) = meanStd(xs)
      Array(1.0, 1.5, 0.0, m, math.max(sd, 1e-9))
    }
  }

  /** Gauss hypergeometric (scipy `gausshyper`, shapes a > 0, b > 0, c ∈ ℝ,
    * z > −1): pdf0(x) = C x^{a−1}(1−x)^{b−1}(1+zx)^{−c} on [0, 1] with
    * 1/C = B(a,b)·₂F₁(c, a; a+b; −z). The normalizer and the cdf integrate
    * the kernel directly (the Euler integral IS the normalizer), with the
    * endpoint substitutions t = u^{1/a} / 1−t = w^{1/b} that make the
    * integrand polynomial-smooth for Gauss–Legendre even when a, b < 1.
    * Default-excluded by the reference ("Very slow", distributions.py:43). */
  object GaussHyper extends ContinuousDist {
    val name = "gausshyper"; val shapeNames = Seq("a", "b", "c", "z")
    override def a0(s: Array[Double]) = 0.0
    override def b0(s: Array[Double]) = 1.0
    override def shapesValid(s: Array[Double]) =
      s(0) > 1e-3 && s(0) < 1e3 && s(1) > 1e-3 && s(1) < 1e3 &&
        math.abs(s(2)) < 1e3 && s(3) > -1.0 + 1e-9 && s(3) < 1e6

    // 32-point Gauss–Legendre nodes/weights on [0, 1]
    private val (glX, glW) = GaussLegendre.on01(32)

    /** log kernel x^{a−1}(1−x)^{b−1}(1+zx)^{−c} (no normalizer). */
    @inline private def logKernel(x: Double, a: Double, b: Double, c: Double, zz: Double): Double =
      (a - 1) * math.log(x) + (b - 1) * math.log1p(-x) - c * math.log1p(zz * x)

    /** ∫_0^x kernel dt for x ≤ 1/2: substitute t = x·u^{1/a} so the
      * integrand is u-smooth; value = (x^a / a)·∫₀¹ g(x u^{1/a}) du. */
    private def lowerInt(x: Double, a: Double, b: Double, c: Double, zz: Double): Double = {
      var sum = 0.0
      var i = 0
      while (i < glX.length) {
        val t = x * math.pow(glX(i), 1.0 / a)
        sum += glW(i) * math.exp((b - 1) * math.log1p(-t) - c * math.log1p(zz * t))
        i += 1
      }
      math.exp(a * math.log(x)) / a * sum
    }

    /** ∫_x^1 kernel dt for x ≥ 1/2 via 1−t = (1−x)·w^{1/b}. */
    private def upperInt(x: Double, a: Double, b: Double, c: Double, zz: Double): Double = {
      val y = 1.0 - x
      var sum = 0.0
      var i = 0
      while (i < glX.length) {
        val t = 1.0 - y * math.pow(glX(i), 1.0 / b)
        sum += glW(i) * math.exp((a - 1) * math.log(t) - c * math.log1p(zz * t))
        i += 1
      }
      math.exp(b * math.log(y)) / b * sum
    }

    /** Full normalizer ∫₀¹ kernel = B(a,b)·₂F₁(c, a; a+b; −z). */
    private def norm(a: Double, b: Double, c: Double, zz: Double): Double =
      lowerInt(0.5, a, b, c, zz) + upperInt(0.5, a, b, c, zz)

    override def logpdf0(z: Double, s: Array[Double]) = {
      if (z <= 0 || z >= 1) Double.NegativeInfinity
      else logKernel(z, s(0), s(1), s(2), s(3)) - math.log(norm(s(0), s(1), s(2), s(3)))
    }
    def pdf0(z: Double, s: Array[Double]) = math.exp(logpdf0(z, s))
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val a = s(0); val b = s(1); val c = s(2); val zz = s(3)
      val ln = math.log(norm(a, b, c, zz)) // quadrature ONCE per objective eval
      var ll = 0.0
      var i = 0
      while (i < zs.length) {
        val x = zs(i)
        if (x <= 0 || x >= 1) return Double.NegativeInfinity
        ll += logKernel(x, a, b, c, zz) - ln
        i += 1
      }
      if (ll.isNaN) Double.NegativeInfinity else ll
    }
    def cdf0(z: Double, s: Array[Double]): Double = {
      if (z <= 0) return 0.0
      if (z >= 1) return 1.0
      val a = s(0); val b = s(1); val c = s(2); val zz = s(3)
      val nrm = norm(a, b, c, zz)
      val v =
        if (z <= 0.5) lowerInt(z, a, b, c, zz) / nrm
        else 1.0 - upperInt(z, a, b, c, zz) / nrm
      math.min(1.0, math.max(0.0, v))
    }
    def ppf0(q: Double, s: Array[Double]) = ppfBisect(this, q, s, 0.0, 1.0)
    def warmStart(xs: Array[Double]) = {
      val (mn, mx) = minMax(xs)
      val span = math.max(mx - mn, 1e-9)
      Array(2.0, 2.0, 1.0, 0.5, mn - 1e-4 * span, span * 1.02)
    }
  }

  /** Studentized range (scipy `studentized_range`, shapes k ≥ 2 groups,
    * df ν > 0): cdf(q) = ∫₀^∞ f_ν(s)·k·∫ φ(u)[Φ(u)−Φ(u−qs)]^{k−1} du ds
    * where f_ν is the density of χ_ν/√ν (the classic Tukey HSD integral,
    * Gleason 1999); the pdf is the analytic ∂/∂q of the same double
    * integral. Both use composite Gauss–Legendre (8×16 panels outer over
    * s, 48 inner over u) — a few ms per evaluation, which is exactly why
    * the reference default-excludes it ("Very slow — scipy docs recommend
    * approximation", distributions.py:42). */
  object StudentizedRange extends ContinuousDist with PositiveSupport {
    val name = "studentized_range"; val shapeNames = Seq("k", "df")
    override def shapesValid(s: Array[Double]) =
      s(0) >= 1.5 && s(0) <= 200.49 && s(1) > 0.5 && s(1) < 1e5
    @inline private def kOf(s: Array[Double]) = math.max(2, math.round(s(0)).toInt)

    private val (inX, inW) = GaussLegendre.on01(48)
    private val (pX, pW) = GaussLegendre.on01(16)
    // the inner u-grid is FIXED: u_i = −8 + 16·x_i, so Φ(u_i), and the
    // weight prefix (w_i·16)·φ(u_i) of every inner term, are constants —
    // hoisted once here (same values, same left-assoc multiply order the
    // inline expressions computed; opt guide §1.2 per-task work)
    private val uGrid = inX.map(x => -8.0 + 16.0 * x)
    private val cdfU = uGrid.map(SM.normCdf)
    private val wpIn = Array.tabulate(inX.length)(i =>
      inW(i) * 16.0 * SM.normPdf(uGrid(i)))

    /** density of S = χ_ν/√ν at s, in logs. */
    @inline private def logChiScaled(sv: Double, nu: Double): Double = {
      // f(s) = ν^{ν/2} s^{ν−1} e^{−νs²/2} / (Γ(ν/2) 2^{ν/2−1})
      0.5 * nu * math.log(nu) + (nu - 1) * math.log(sv) - 0.5 * nu * sv * sv -
        SM.lgamma(0.5 * nu) - (0.5 * nu - 1.0) * math.log(2.0)
    }

    /** inner ∫ φ(u)[Φ(u)−Φ(u−w)]^{k−1} du over u ∈ [−8, 8]. */
    private def innerCdf(w: Double, k: Int): Double = {
      var sum = 0.0
      var i = 0
      while (i < uGrid.length) {
        val d = cdfU(i) - SM.normCdf(uGrid(i) - w)
        if (d > 0) sum += wpIn(i) * math.pow(d, k - 1)
        i += 1
      }
      sum
    }

    /** inner ∫ φ(u)φ(u−w)[Φ(u)−Φ(u−w)]^{k−2} du. */
    private def innerPdf(w: Double, k: Int): Double = {
      var sum = 0.0
      var i = 0
      while (i < uGrid.length) {
        val u = uGrid(i)
        val d = cdfU(i) - SM.normCdf(u - w)
        val base = if (k == 2) 1.0 else if (d > 0) math.pow(d, k - 2) else 0.0
        sum += wpIn(i) * SM.normPdf(u - w) * base
        i += 1
      }
      sum
    }

    /** outer bracket: χ_ν/√ν concentrates at 1 with σ ≈ 1/√(2ν) — the
      * panel range tracks that width so large-ν peaks stay resolved. */
    @inline private def sRange(nu: Double): (Double, Double) = {
      val sig = 1.0 / math.sqrt(2.0 * nu)
      (math.max(0.0, 1.0 - 12.0 * sig), 1.0 + 14.0 * sig)
    }

    /** The outer composite grid — node positions sv_j and their weight
      * prefixes (pW·wP)·f_ν(sv_j) — depends only on ν, not on the
      * evaluation point z, so one objective evaluation over an n-point
      * sample can build it ONCE instead of n times (it costs an lgamma +
      * exp per node). Nodes the inline loop skipped (sv ≤ 1e-12 or
      * f ≤ 1e-300) are dropped here the same way, and the surviving
      * (panel, node) order is the accumulation order, so sums are
      * bit-identical to the original inline form. */
    private def outerGrid(nu: Double): (Array[Double], Array[Double]) = {
      val (lo, hi) = sRange(nu)
      val sv = new Array[Double](8 * pX.length)
      val g = new Array[Double](8 * pX.length)
      var n = 0
      var panel = 0
      while (panel < 8) {
        val aP = lo + (hi - lo) * panel / 8.0
        val wP = (hi - lo) / 8.0
        var i = 0
        while (i < pX.length) {
          val s = aP + wP * pX(i)
          if (s > 1e-12) {
            val f = math.exp(logChiScaled(s, nu))
            if (f > 1e-300) { sv(n) = s; g(n) = pW(i) * wP * f; n += 1 }
          }
          i += 1
        }
        panel += 1
      }
      (java.util.Arrays.copyOf(sv, n), java.util.Arrays.copyOf(g, n))
    }

    /** composite outer quadrature over a prebuilt (sv, weight) grid;
      * term algebra and accumulation order match the original inline
      * loop exactly (see outerGrid). */
    private def outerOnGrid(z: Double, k: Int, sv: Array[Double],
                            g: Array[Double], forPdf: Boolean): Double = {
      var total = 0.0
      var j = 0
      while (j < sv.length) {
        val s = sv(j)
        total += g(j) * (
          if (forPdf) s * k * (k - 1) * innerPdf(z * s, k)
          else k * innerCdf(z * s, k))
        j += 1
      }
      total
    }

    /** composite outer quadrature: 8 GL-16 panels over the χ_ν/√ν mass. */
    private def outer(z: Double, k: Int, nu: Double, forPdf: Boolean): Double = {
      val (sv, g) = outerGrid(nu)
      outerOnGrid(z, k, sv, g, forPdf)
    }

    /** MLE objective: each point needs its own double quadrature (~6k
      * erf/exp evals), which made this single family the fan-out straggler
      * (303 s of the sf0.01 Verify gate measured in round 13). The outer
      * grid is hoisted per evaluation, the per-point log-densities are
      * computed on the common ForkJoin pool, and the sum is taken in index
      * order afterwards — each lp_i is bit-identical to the sequential
      * path and so is the ordered sum, so the Nelder–Mead trajectory and
      * the fitted parameters are unchanged (opt guide §1.2: per-task work;
      * the interleave() scheduler already runs this family first, so the
      * idle cores it parallelizes onto are the fan-out tail's own). */
    override def logpdf0Sum(zs: Array[Double], s: Array[Double]): Double = {
      val k = kOf(s); val nu = s(1)
      // cheap pre-scan: any off-support point (z <= 0) makes the whole
      // sum -Inf, and early Nelder–Mead steps hit this often — the base
      // implementation short-circuits on the first such point, so do the
      // same here before paying n parallel double quadratures
      var pre = 0
      while (pre < zs.length) {
        if (zs(pre) <= 0) return Double.NegativeInfinity
        pre += 1
      }
      val (sv, g) = outerGrid(nu)
      val lps = new Array[Double](zs.length)
      def lpAt(i: Int): Double = {
        val z = zs(i)
        val p = if (z <= 0) 0.0 else math.max(0.0, outerOnGrid(z, k, sv, g, forPdf = true))
        if (p <= 0.0) Double.NegativeInfinity else math.log(p)
      }
      if (zs.length >= 16)
        java.util.stream.IntStream.range(0, zs.length).parallel()
          .forEach(i => lps(i) = lpAt(i))
      else {
        var i = 0
        while (i < zs.length) { lps(i) = lpAt(i); i += 1 }
      }
      var ll = 0.0
      var i = 0
      while (i < zs.length) {
        val lp = lps(i)
        if (lp.isNaN || lp == Double.NegativeInfinity) return Double.NegativeInfinity
        ll += lp
        i += 1
      }
      ll
    }

    def cdf0(z: Double, s: Array[Double]): Double = {
      if (z <= 0) return 0.0
      math.min(1.0, math.max(0.0, outer(z, kOf(s), s(1), forPdf = false)))
    }
    def pdf0(z: Double, s: Array[Double]): Double = {
      if (z <= 0) return 0.0
      math.max(0.0, outer(z, kOf(s), s(1), forPdf = true))
    }
    def ppf0(q: Double, s: Array[Double]) = ppfBisect(this, q, s, 0.0, 500.0)
    def warmStart(xs: Array[Double]) = {
      val l = locBelowMin(xs)
      Array(3.0, 10.0, l, math.max((meanStd(xs)._1 - l) / 3.0, 1e-9))
    }
  }

  /** α-stable (scipy `levy_stable`, shapes α ∈ (0, 2], β ∈ [−1, 1], S1
    * parameterization): density and CDF via Nolan's integral
    * representation (Nolan, Comm. Statist. Stochastic Models 13 (1997)):
    * for α ≠ 1 and x > 0 (S1 puts the integral's origin at 0, which is
    * why the branch point is x = 0 here rather than S0's ζ),
    *   f(x) = α x^{1/(α−1)} / (π|α−1|) ∫_{−θ₀}^{π/2} V(θ) e^{−x^{α/(α−1)} V(θ)} dθ
    *   F(x) = c₁ + sign(1−α)/π ∫_{−θ₀}^{π/2} e^{−x^{α/(α−1)} V(θ)} dθ
    * with θ₀ = arctan(β tan(πα/2))/α, V the Nolan kernel, c₁ = ½ − θ₀/π
    * for α < 1 and 1 for α > 1; x < 0 via the (x, β) → (−x, −β) mirror;
    * α = 2 is N(0, √2) and α = 1 uses the V₁ exponential-kernel variant.
    * The integrand V e^{−gV} peaks where gV = 1: the peak is located by
    * bisection on the monotone V and each side integrated with
    * Gauss–Legendre, which keeps the narrow large-|x| peaks resolved.
    * |α−1| < 0.02 (β ≠ 0) is clamped to α = 1 and |x| < 0.1 at α > 1
    * bridges through the exact f(0) (both documented approximations —
    * the same regions scipy's piecewise evaluator special-cases).
    * Default-excluded by the reference ("Extremely slow — MLE doesn't
    * always converge", distributions.py:34). */
  object LevyStable extends ContinuousDist {
    val name = "levy_stable"; val shapeNames = Seq("alpha", "beta")
    override def shapesValid(s: Array[Double]) =
      s(0) > 0.25 && s(0) <= 2.0 && math.abs(s(1)) <= 1.0

    private val (glX, glW) = GaussLegendre.on01(48)

    /** Nolan V(θ) in log space, α ≠ 1 branch. */
    @inline private def logV(th: Double, al: Double, th0: Double): Double = {
      val aTh0 = al * th0
      val s1 = math.sin(al * (th0 + th))
      val c = math.cos(th)
      val cTop = math.cos(aTh0 + (al - 1) * th)
      if (s1 <= 0 || c <= 0 || cTop <= 0) return Double.NaN
      (1.0 / (al - 1)) * math.log(math.cos(aTh0)) +
        (al / (al - 1)) * (math.log(c) - math.log(s1)) +
        math.log(cTop) - math.log(c)
    }

    /** α = 1, β ≠ 0 kernel in log space. */
    @inline private def logV1(th: Double, be: Double): Double = {
      val c = math.cos(th)
      if (c <= 0) return Double.NaN
      val a = 0.5 * math.Pi + be * th
      if (a <= 0) return Double.NaN
      math.log(2.0 / math.Pi) + math.log(a) - math.log(c) +
        (1.0 / be) * a * math.tan(th)
    }

    /** ∫ over [lo, hi] of e^{−e^{lg + logV}}·(if withV) e^{logV} dθ, split
      * at the peak (where lg + logV = 0) found by bisection. */
    private def nolanIntegral(lo: Double, hi: Double, lg: Double,
                              lv: Double => Double, withV: Boolean): Double = {
      // bisect for logV(θ) = −lg (logV monotone on the bracket)
      val eps = 1e-12 * (hi - lo + 1.0)
      @inline def f(th: Double): Double = {
        val v = lv(th)
        if (v.isNaN) Double.NaN else v + lg
      }
      var split = Double.NaN
      val fLo = f(lo + eps); val fHi = f(hi - eps)
      if (!fLo.isNaN && !fHi.isNaN && fLo * fHi < 0) {
        var a = lo + eps; var b = hi - eps
        var i = 0
        while (i < 200 && b - a > 1e-14 * (1 + math.abs(a) + math.abs(b))) {
          val m = 0.5 * (a + b)
          val fm = f(m)
          if (fm.isNaN) { i = 200 } // kernel hole: fall back to midpoint
          else { if (fm * fLo > 0) a = m else b = m; i += 1 }
        }
        split = 0.5 * (a + b)
      } else split = 0.5 * (lo + hi)
      @inline def panel(a: Double, b: Double): Double = {
        var sum = 0.0
        var i = 0
        while (i < glX.length) {
          val th = a + (b - a) * glX(i)
          val lgv = f(th)
          if (!lgv.isNaN) {
            val inner = math.exp(-math.exp(math.min(lgv, 700.0)))
            val w = if (withV) inner * math.exp(lgv - lg) else inner
            sum += glW(i) * (b - a) * w
          }
          i += 1
        }
        sum
      }
      panel(lo, split) + panel(split, hi)
    }

    /** standardized S1 density. */
    private def pdfS1(x0: Double, al: Double, be0: Double): Double = {
      if (al == 2.0) return SM.normPdf(x0 / SqrtTwoLS) / SqrtTwoLS
      if (math.abs(al - 1.0) < 0.02) {
        if (math.abs(be0) < 1e-12)
          return 1.0 / (math.Pi * (1.0 + x0 * x0)) // Cauchy
        // α = 1, β ≠ 0 (clamped band): Nolan Thm 1(b), stated for β > 0;
        // β < 0 via the (x, β) → (−x, −β) mirror
        if (be0 < 0) return pdfS1(-x0, al, -be0)
        val be = be0
        val u = -math.Pi * x0 / (2.0 * be)
        if (u > 690) return 0.0
        val integral = nolanIntegral(-math.Pi / 2 + 1e-10, math.Pi / 2 - 1e-10,
          u, th => logV1(th, be), withV = true)
        return math.max(0.0, integral * math.exp(u) / (2.0 * math.abs(be)))
      }
      val (x, be) = if (x0 >= 0) (x0, be0) else (-x0, -be0)
      val ta = math.tan(0.5 * math.Pi * al)
      val th0 = math.atan(be * ta) / al
      if (x < 0.1 && al > 1.0) {
        // bridge through the exact f(0) with a 3-point quadratic
        val zeta = -be * ta
        val f0 = SM.lgamma(1.0 + 1.0 / al)
        val fAt0 = math.exp(f0) * math.cos(th0) /
          (math.Pi * math.pow(1.0 + zeta * zeta, 0.5 / al))
        val fp = pdfS1At(0.1, al, be, th0)
        val fm = pdfS1At(0.1, al, -be, math.atan(-be * ta) / al)
        // quadratic through (−0.1, fm), (0, fAt0), (0.1, fp) evaluated at ±x
        val xx = if (x0 >= 0) x else -x
        val a2 = (fp + fm - 2 * fAt0) / (2 * 0.01)
        val a1 = (fp - fm) / 0.2
        return math.max(0.0, fAt0 + a1 * xx + a2 * xx * xx)
      }
      if (x == 0.0) {
        val zeta = -be * ta
        return math.exp(SM.lgamma(1.0 + 1.0 / al)) * math.cos(th0) /
          (math.Pi * math.pow(1.0 + zeta * zeta, 0.5 / al))
      }
      pdfS1At(x, al, be, th0)
    }

    /** density at x > 0 via the integral (α ≠ 1). */
    private def pdfS1At(x: Double, al: Double, be: Double, th0: Double): Double = {
      if (th0 <= -math.Pi / 2 + 1e-12) return 0.0 // empty bracket: off-support side
      val lg = (al / (al - 1.0)) * math.log(x) // log g
      val integral = nolanIntegral(-th0 + 1e-10, math.Pi / 2 - 1e-10, lg,
        th => logV(th, al, th0), withV = true)
      math.max(0.0,
        al * math.pow(x, 1.0 / (al - 1.0)) / (math.Pi * math.abs(al - 1.0)) * integral)
    }

    /** standardized S1 CDF. */
    private def cdfS1(x0: Double, al: Double, be0: Double): Double = {
      if (al == 2.0) return SM.normCdf(x0 / SqrtTwoLS)
      if (math.abs(al - 1.0) < 0.02) {
        if (math.abs(be0) < 1e-12) return 0.5 + math.atan(x0) / math.Pi
        if (be0 < 0) return 1.0 - cdfS1(-x0, al, -be0)
        val be = be0
        val u = -math.Pi * x0 / (2.0 * be)
        val integral = nolanIntegral(-math.Pi / 2 + 1e-10, math.Pi / 2 - 1e-10,
          if (u > 690) 690 else u, th => logV1(th, be), withV = false)
        return math.min(1.0, math.max(0.0, integral / math.Pi))
      }
      if (x0 < 0) return 1.0 - cdfS1(-x0, al, -be0)
      val ta = math.tan(0.5 * math.Pi * al)
      val th0 = math.atan(be0 * ta) / al
      if (x0 == 0.0) return 0.5 - th0 / math.Pi
      if (th0 <= -math.Pi / 2 + 1e-12) return 0.0
      val lg = (al / (al - 1.0)) * math.log(x0)
      val integral = nolanIntegral(-th0 + 1e-10, math.Pi / 2 - 1e-10, lg,
        th => logV(th, al, th0), withV = false)
      val c1 = if (al < 1.0) 0.5 - th0 / math.Pi else 1.0
      val v = c1 + math.signum(1.0 - al) * integral / math.Pi
      math.min(1.0, math.max(0.0, v))
    }

    private val SqrtTwoLS = math.sqrt(2.0)

    def pdf0(z: Double, s: Array[Double]) = pdfS1(z, s(0), s(1))
    def cdf0(z: Double, s: Array[Double]) = cdfS1(z, s(0), s(1))
    def ppf0(q: Double, s: Array[Double]) =
      ppfBisect(this, q, s, Double.NegativeInfinity, Double.PositiveInfinity)
    def warmStart(xs: Array[Double]) = {
      // McCulloch-style quantile start: ν_α = (q95−q05)/(q75−q25) grows as
      // α falls (≈2.44 at α=2, ≈6.3 at α=1); log-interpolate, β from the
      // quantile-skew sign
      val q05 = quantile(xs, 0.05); val q25 = quantile(xs, 0.25)
      val q50 = quantile(xs, 0.50); val q75 = quantile(xs, 0.75)
      val q95 = quantile(xs, 0.95)
      val iqr = math.max(q75 - q25, 1e-12)
      val va = (q95 - q05) / iqr
      val al = math.min(2.0, math.max(0.6,
        2.0 - math.log(math.max(va, 2.44) / 2.439) / math.log(6.31 / 2.439)))
      val vb = (q95 + q05 - 2 * q50) / math.max(q95 - q05, 1e-12)
      val be = math.min(1.0, math.max(-1.0, 2.5 * vb))
      Array(al, be, q50, iqr / 2.0)
    }
  }

  val all: Seq[ContinuousDist] = Seq(
    Gibrat, ExponPow, Mielke, KsTwoBign, KsOne, KsTwo,
    GenInvGauss, GenHyperbolic, GaussHyper, StudentizedRange, LevyStable)
}

/** Gauss–Legendre nodes/weights, computed once by Newton iteration on the
  * Legendre recurrence (the standard Golub-free construction) and mapped
  * to [0, 1]. */
private[dists] object GaussLegendre {
  def on01(n: Int): (Array[Double], Array[Double]) = {
    val x = new Array[Double](n)
    val w = new Array[Double](n)
    var i = 0
    while (i < (n + 1) / 2) {
      // initial guess (Chebyshev) then Newton on P_n
      var z = math.cos(math.Pi * (i + 0.75) / (n + 0.5))
      var delta = 1.0
      var pp = 0.0
      var iter = 0
      while (math.abs(delta) > 1e-15 && iter < 100) {
        var p0 = 1.0; var p1 = 0.0
        var j = 0
        while (j < n) {
          val p2 = p1; p1 = p0
          p0 = ((2 * j + 1) * z * p1 - j * p2) / (j + 1)
          j += 1
        }
        pp = n * (z * p0 - p1) / (z * z - 1.0)
        delta = -p0 / pp
        z += delta
        iter += 1
      }
      // map [−1,1] → [0,1]
      x(i) = 0.5 * (1.0 - z)
      x(n - 1 - i) = 0.5 * (1.0 + z)
      val wi = 1.0 / ((1.0 - z * z) * pp * pp)
      w(i) = wi; w(n - 1 - i) = wi
      i += 1
    }
    (x, w)
  }
}
