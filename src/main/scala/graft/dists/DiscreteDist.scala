package graft.dists

import graft.functions.{Optimize, SpecialMath => SM}

/** Discrete distribution family. Parameter conventions mirror the
  * reference's discrete registry (name, param_names, moment-based
  * initial values, box bounds; reference:
  * src/spark_bestfit/distributions.py:329-605), with MLE by direct
  * minimization of the negative log-likelihood and integer rounding for
  * count-type parameters (reference: src/spark_bestfit/
  * discrete_fitting.py:67-124).
  */
trait DiscreteDist extends Serializable {
  def name: String
  def paramNames: Seq[String]
  final def numParams: Int = paramNames.length

  /** Indices of parameters that must be integers (rounded post-fit). */
  def integerParams: Set[Int] = Set.empty

  def valid(p: Array[Double]): Boolean
  def logpmf(k: Long, p: Array[Double]): Double
  def pmf(k: Long, p: Array[Double]): Double = {
    val lp = logpmf(k, p)
    if (lp == Double.NegativeInfinity) 0.0 else math.exp(lp)
  }

  /** P(X <= k). Default: direct summation from the support minimum. */
  def cdf(k: Long, p: Array[Double]): Double = {
    val (lo, _) = support(p)
    if (k < lo) return 0.0
    var s = 0.0
    var i = lo
    while (i <= k) { s += pmf(i, p); i += 1 }
    math.min(1.0, s)
  }

  def support(p: Array[Double]): (Long, Long)

  /** Moment-based initial parameter estimate. */
  def initial(xs: Array[Long]): Array[Double]

  /** Whether a Nelder-Mead refinement follows the initial estimate. */
  def refine: Boolean = true

  final def negLogLik(p: Array[Double], xs: Array[Long]): Double = {
    val (vals, cnts) = DiscreteDist.compress(xs)
    negLogLikCompressed(p, vals, cnts)
  }

  /** Likelihood over (distinct value, count) pairs: integer samples have
    * few distinct values, so Σ cnt_k · logpmf(k) turns a 10K-point loop
    * into a ~50-point one — the discrete fit hot path. */
  final def negLogLikCompressed(p: Array[Double], vals: Array[Long], cnts: Array[Long]): Double = {
    if (!valid(p)) return Optimize.Penalty
    var ll = 0.0
    var i = 0
    while (i < vals.length) {
      val lp = logpmf(vals(i), p)
      if (lp.isNaN || lp == Double.NegativeInfinity) return Optimize.Penalty
      ll += cnts(i) * lp
      i += 1
    }
    -ll
  }

  def fit(xs: Array[Long]): Array[Double] = {
    val w0 = initial(xs)
    if (!refine) return w0
    val (vals, cnts) = DiscreteDist.compress(xs)
    def negLogLik(p: Array[Double]): Double = negLogLikCompressed(p, vals, cnts)
    if (integerParams.isEmpty) {
      val f0 = negLogLik(w0)
      if (f0 >= Optimize.Penalty) return w0
      val (best, fb) = Optimize.nelderMead(negLogLik(_), w0, maxIter = 300)
      if (fb < f0) best else w0
    } else {
      // profile over the integer parameter(s): optimize the continuous rest
      // for a few integer candidates around the initial value.
      val intIdx = integerParams.head // all current families have one int param
      val base = math.round(w0(intIdx))
      val candidates = (math.max(intLowerBound(xs), base - 3) to base + 8).distinct
      var best: Array[Double] = null
      var fBest = Double.PositiveInfinity
      for (n <- candidates) {
        val p0 = w0.clone(); p0(intIdx) = n.toDouble
        val free = p0.indices.filterNot(_ == intIdx).toArray
        val g = (v: Array[Double]) => {
          val full = p0.clone()
          var j = 0
          while (j < free.length) { full(free(j)) = v(j); j += 1 }
          negLogLik(full)
        }
        if (free.nonEmpty) {
          val v0 = free.map(p0)
          if (g(v0) < Optimize.Penalty) {
            val (vb, fb) = Optimize.nelderMead(g, v0, maxIter = 200)
            if (fb < fBest) {
              fBest = fb
              best = p0.clone()
              var j = 0
              while (j < free.length) { best(free(j)) = vb(j); j += 1 }
            }
          }
        } else {
          val fb = negLogLik(p0)
          if (fb < fBest) { fBest = fb; best = p0 }
        }
      }
      if (best != null) best else w0
    }
  }

  /** Minimum admissible value for the integer parameter (e.g. max(x) for
    * binomial n). */
  protected def intLowerBound(xs: Array[Long]): Long = 1L

  protected def mean(xs: Array[Long]): Double = {
    var s = 0.0; var i = 0
    while (i < xs.length) { s += xs(i); i += 1 }
    s / xs.length
  }
  protected def variance(xs: Array[Long]): Double = {
    val m = mean(xs)
    var s = 0.0; var i = 0
    while (i < xs.length) { val d = xs(i) - m; s += d * d; i += 1 }
    s / xs.length
  }
  protected def maxOf(xs: Array[Long]): Long = xs.max
}

object DiscreteDist {
  /** (distinct values, counts), values ascending. */
  def compress(xs: Array[Long]): (Array[Long], Array[Long]) = {
    val sorted = xs.clone()
    java.util.Arrays.sort(sorted)
    val vals = new scala.collection.mutable.ArrayBuffer[Long]()
    val cnts = new scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j) == sorted(i)) j += 1
      vals += sorted(i); cnts += (j - i).toLong
      i = j
    }
    (vals.toArray, cnts.toArray)
  }
}

object DiscreteFamilies {

  /** Riemann zeta via Euler-Maclaurin (a > 1). */
  def zeta(a: Double): Double = {
    val N = 40
    var s = 0.0
    var k = 1
    while (k <= N) { s += math.pow(k, -a); k += 1 }
    s + math.pow(N, 1 - a) / (a - 1) - 0.5 * math.pow(N, -a) + a * math.pow(N, -a - 1) / 12.0
  }

  /** Generalized harmonic number H_{n,a} = Σ_{k=1..n} k^{-a}. */
  def genHarmonic(n: Long, a: Double): Double = {
    if (n <= 2000) {
      var s = 0.0; var k = 1L
      while (k <= n) { s += math.pow(k.toDouble, -a); k += 1 }
      s
    } else if (a > 1) zeta(a) - (math.pow(n + 0.5, 1 - a)) / (a - 1)
    else {
      var s = 0.0; var k = 1L
      while (k <= 2000) { s += math.pow(k.toDouble, -a); k += 1 }
      // integral tail for k in (2000, n]
      s + (math.pow(n + 0.5, 1 - a) - math.pow(2000.5, 1 - a)) / (1 - a)
    }
  }

  @inline private def lchoose(n: Double, k: Double): Double =
    SM.lgamma(n + 1) - SM.lgamma(k + 1) - SM.lgamma(n - k + 1)

  object Poisson extends DiscreteDist {
    val name = "poisson"; val paramNames = Seq("mu")
    def valid(p: Array[Double]) = p(0) > 0
    def logpmf(k: Long, p: Array[Double]) =
      if (k < 0) Double.NegativeInfinity
      else k * math.log(p(0)) - p(0) - SM.lgamma(k + 1.0)
    override def cdf(k: Long, p: Array[Double]) =
      if (k < 0) 0.0 else SM.gammaIncC(k + 1.0, p(0))
    def support(p: Array[Double]) = (0L, Long.MaxValue)
    override def refine = false // MLE is the sample mean
    def initial(xs: Array[Long]) = Array(math.max(mean(xs), 1e-9))
  }

  object Geom extends DiscreteDist {
    val name = "geom"; val paramNames = Seq("p")
    def valid(p: Array[Double]) = p(0) > 0 && p(0) <= 1
    // scipy geom: k >= 1, pmf = (1-p)^{k-1} p
    def logpmf(k: Long, p: Array[Double]) =
      if (k < 1) Double.NegativeInfinity
      else (k - 1) * math.log1p(-p(0)) + math.log(p(0))
    override def cdf(k: Long, p: Array[Double]) =
      if (k < 1) 0.0 else -math.expm1(k * math.log1p(-p(0)))
    def support(p: Array[Double]) = (1L, Long.MaxValue)
    override def refine = false // MLE p = 1/mean
    def initial(xs: Array[Long]) = Array(math.min(1.0, 1.0 / math.max(mean(xs), 1.0)))
  }

  object Binom extends DiscreteDist {
    val name = "binom"; val paramNames = Seq("n", "p")
    override def integerParams = Set(0)
    def valid(p: Array[Double]) = p(0) >= 1 && p(1) > 0 && p(1) < 1
    def logpmf(k: Long, p: Array[Double]) = {
      val n = math.round(p(0)).toDouble
      if (k < 0 || k > n) Double.NegativeInfinity
      else lchoose(n, k.toDouble) + k * math.log(p(1)) + (n - k) * math.log1p(-p(1))
    }
    def support(p: Array[Double]) = (0L, math.round(p(0)))
    override protected def intLowerBound(xs: Array[Long]) = math.max(1L, maxOf(xs))
    def initial(xs: Array[Long]) = {
      val m = mean(xs); val v = variance(xs)
      val nMom = if (v < m && v > 0) m * m / (m - v) else maxOf(xs).toDouble
      val n = math.max(maxOf(xs).toDouble, nMom)
      Array(math.round(n).toDouble, math.min(0.999, math.max(1e-3, m / math.max(n, 1))))
    }
  }

  object NBinom extends DiscreteDist {
    val name = "nbinom"; val paramNames = Seq("n", "p")
    def valid(p: Array[Double]) = p(0) > 0 && p(1) > 0 && p(1) < 1
    // scipy nbinom: number of failures before n-th success
    def logpmf(k: Long, p: Array[Double]) = {
      val n = p(0); val pr = p(1)
      if (k < 0) Double.NegativeInfinity
      else SM.lgamma(k + n) - SM.lgamma(n) - SM.lgamma(k + 1.0) +
        n * math.log(pr) + k * math.log1p(-pr)
    }
    override def cdf(k: Long, p: Array[Double]) =
      if (k < 0) 0.0 else SM.betaInc(p(0), k + 1.0, p(1))
    def support(p: Array[Double]) = (0L, Long.MaxValue)
    def initial(xs: Array[Long]) = {
      val m = math.max(mean(xs), 1e-9); val v = variance(xs)
      if (v > m) { val n = m * m / (v - m); Array(math.max(n, 0.05), math.min(0.999, m / v)) }
      else Array(10.0, math.min(0.999, 10.0 / (10.0 + m)))
    }
  }

  object Zipf extends DiscreteDist {
    val name = "zipf"; val paramNames = Seq("a")
    def valid(p: Array[Double]) = p(0) > 1
    def logpmf(k: Long, p: Array[Double]) =
      if (k < 1) Double.NegativeInfinity else -p(0) * math.log(k.toDouble) - math.log(zeta(p(0)))
    def support(p: Array[Double]) = (1L, Long.MaxValue)
    def initial(xs: Array[Long]) = Array(2.0)
  }

  /** Finite Zipfian over 1..n (scipy zipfian(a, n)); n pinned to max(x). */
  object Zipfian extends DiscreteDist {
    val name = "zipfian"; val paramNames = Seq("a", "n")
    override def integerParams = Set(1)
    def valid(p: Array[Double]) = p(0) >= 0 && math.round(p(1)) >= 1
    def logpmf(k: Long, p: Array[Double]) = {
      val n = math.round(p(1))
      if (k < 1 || k > n) Double.NegativeInfinity
      else -p(0) * math.log(k.toDouble) - math.log(genHarmonic(n, p(0)))
    }
    def support(p: Array[Double]) = (1L, math.round(p(1)))
    override protected def intLowerBound(xs: Array[Long]) = math.max(1L, maxOf(xs))
    def initial(xs: Array[Long]) = Array(1.1, maxOf(xs).toDouble)
  }

  object DLaplace extends DiscreteDist {
    val name = "dlaplace"; val paramNames = Seq("a")
    def valid(p: Array[Double]) = p(0) > 0
    def logpmf(k: Long, p: Array[Double]) = {
      val a = p(0)
      math.log(math.tanh(a / 2)) - a * math.abs(k.toDouble)
    }
    def support(p: Array[Double]) = (Long.MinValue / 4, Long.MaxValue / 4)
    override def cdf(k: Long, p: Array[Double]) = {
      // geometric tail sums with tanh(a/2) = (1-e^{-a})/(1+e^{-a}):
      //   k >= 0: F(k) = 1 - e^{-a(k+1)}/(1+e^{-a});  k < 0: F(k) = e^{ak}/(1+e^{-a})
      val a = p(0)
      val ea = math.exp(-a)
      if (k >= 0) 1.0 - math.exp(-a * (k + 1)) / (1 + ea)
      else math.exp(a * k) / (1 + ea)
    }
    def initial(xs: Array[Long]) = {
      val mad = xs.map(k => math.abs(k.toDouble)).sum / xs.length
      Array(math.max(math.log1p(1.0 / math.max(mad, 1e-9)), 1e-3))
    }
  }

  object LogSer extends DiscreteDist {
    val name = "logser"; val paramNames = Seq("p")
    def valid(p: Array[Double]) = p(0) > 0 && p(0) < 1
    def logpmf(k: Long, p: Array[Double]) =
      if (k < 1) Double.NegativeInfinity
      else k * math.log(p(0)) - math.log(k.toDouble) - math.log(-math.log1p(-p(0)))
    def support(p: Array[Double]) = (1L, Long.MaxValue)
    override def refine = false // 1-D MLE solved directly by bisection
    def initial(xs: Array[Long]): Array[Double] = {
      val m = mean(xs)
      if (m <= 1.0) return Array(1e-6)
      // solve mean(p) = -p/((1-p) ln(1-p)) = m by bisection
      def meanOf(p: Double) = -p / ((1 - p) * math.log1p(-p))
      var lo = 1e-9; var hi = 1 - 1e-12
      var i = 0
      while (i < 100) { val mid = 0.5 * (lo + hi); if (meanOf(mid) < m) lo = mid else hi = mid; i += 1 }
      Array(0.5 * (lo + hi))
    }
  }

  object Planck extends DiscreteDist {
    val name = "planck"; val paramNames = Seq("lambda")
    def valid(p: Array[Double]) = p(0) > 0
    def logpmf(k: Long, p: Array[Double]) =
      if (k < 0) Double.NegativeInfinity
      else math.log(-math.expm1(-p(0))) - p(0) * k
    override def cdf(k: Long, p: Array[Double]) =
      if (k < 0) 0.0 else -math.expm1(-p(0) * (k + 1))
    def support(p: Array[Double]) = (0L, Long.MaxValue)
    override def refine = false // MLE λ = ln(1 + 1/mean)
    def initial(xs: Array[Long]) = Array(math.log1p(1.0 / math.max(mean(xs), 1e-9)))
  }

  object Boltzmann extends DiscreteDist {
    val name = "boltzmann"; val paramNames = Seq("lambda", "N")
    override def integerParams = Set(1)
    def valid(p: Array[Double]) = p(0) > 0 && math.round(p(1)) >= 1
    def logpmf(k: Long, p: Array[Double]) = {
      val n = math.round(p(1))
      if (k < 0 || k >= n) Double.NegativeInfinity
      else math.log(-math.expm1(-p(0))) - p(0) * k - math.log(-math.expm1(-p(0) * n))
    }
    def support(p: Array[Double]) = (0L, math.round(p(1)) - 1)
    override protected def intLowerBound(xs: Array[Long]) = math.max(1L, maxOf(xs) + 1)
    def initial(xs: Array[Long]) = Array(
      math.log1p(1.0 / math.max(mean(xs), 1e-9)), (maxOf(xs) + 1).toDouble)
  }

  object YuleSimon extends DiscreteDist {
    val name = "yulesimon"; val paramNames = Seq("alpha")
    def valid(p: Array[Double]) = p(0) > 0
    def logpmf(k: Long, p: Array[Double]) =
      if (k < 1) Double.NegativeInfinity
      else math.log(p(0)) + SM.lbeta(k.toDouble, p(0) + 1)
    def support(p: Array[Double]) = (1L, Long.MaxValue)
    def initial(xs: Array[Long]) = {
      val m = mean(xs)
      // mean = alpha/(alpha-1) for alpha>1
      val a = if (m > 1.001) m / (m - 1) else 2.0
      Array(math.max(a, 0.1))
    }
  }

  object BetaBinom extends DiscreteDist {
    val name = "betabinom"; val paramNames = Seq("n", "a", "b")
    override def integerParams = Set(0)
    def valid(p: Array[Double]) = p(0) >= 1 && p(1) > 0 && p(2) > 0
    def logpmf(k: Long, p: Array[Double]) = {
      val n = math.round(p(0)).toDouble
      if (k < 0 || k > n) Double.NegativeInfinity
      else lchoose(n, k.toDouble) + SM.lbeta(k + p(1), n - k + p(2)) - SM.lbeta(p(1), p(2))
    }
    def support(p: Array[Double]) = (0L, math.round(p(0)))
    override protected def intLowerBound(xs: Array[Long]) = math.max(1L, maxOf(xs))
    def initial(xs: Array[Long]): Array[Double] = {
      val n = maxOf(xs).toDouble
      val m = mean(xs) / math.max(n, 1)
      val v = variance(xs) / math.max(n * n, 1)
      // method-of-moments on the scaled beta mean/variance
      val c = math.max(m * (1 - m) / math.max(v, 1e-9) - 1.0, 0.2)
      Array(n, math.max(m * c, 0.05), math.max((1 - m) * c, 0.05))
    }
  }

  /** Shared continuous-relaxation fit for the all-integer-parameter
    * families (hypergeom/nhypergeom): Nelder-Mead over real-valued
    * parameters with the lgamma-smooth likelihood, then rounding + a
    * constraint repair so the final integers still cover the sample
    * (reference: distributions.py:446-467 fits the same three integers
    * box-bounded). */
  private def fitRelaxedInts(xs: Array[Long], w0: Array[Double],
                             nll: Array[Double] => Double,
                             repair: Array[Double] => Array[Double]): Array[Double] = {
    val f0 = nll(w0)
    if (f0 >= Optimize.Penalty) return repair(w0)
    val (best, fb) = Optimize.nelderMead(nll, w0, maxIter = 300)
    repair(if (fb < f0) best else w0)
  }

  /** Hypergeometric(M, n, N): draws without replacement — pmf(k) =
    * C(n,k)·C(M−n,N−k)/C(M,N) (reference: distributions.py:446-475). */
  object Hypergeom extends DiscreteDist {
    val name = "hypergeom"; val paramNames = Seq("M", "n", "N")
    override def integerParams = Set(0, 1, 2)
    def valid(p: Array[Double]) = {
      val m = math.round(p(0)); val n = math.round(p(1)); val nn = math.round(p(2))
      m >= 1 && n >= 0 && nn >= 0 && n <= m && nn <= m
    }
    def logpmf(k: Long, p: Array[Double]) = {
      val m = math.round(p(0)).toDouble
      val n = math.round(p(1)).toDouble
      val nn = math.round(p(2)).toDouble
      if (k < math.max(0, nn - (m - n)) || k > math.min(n, nn)) Double.NegativeInfinity
      else lchoose(n, k.toDouble) + lchoose(m - n, nn - k) - lchoose(m, nn)
    }
    def support(p: Array[Double]) = {
      val m = math.round(p(0)); val n = math.round(p(1)); val nn = math.round(p(2))
      (math.max(0L, nn - (m - n)), math.min(n, nn))
    }
    def initial(xs: Array[Long]) = {
      val mx = maxOf(xs).toDouble; val m = mean(xs)
      val draws = math.max(mx + 5, m * 2)
      val succ = math.max(mx + 10, draws)
      Array(math.max(succ + draws, succ * 2), succ, draws)
    }
    override def fit(xs: Array[Long]): Array[Double] = {
      val (vals, cnts) = DiscreteDist.compress(xs)
      val kMin = vals.head; val kMax = vals.last
      // smooth likelihood: identical lgamma algebra with UNROUNDED params
      def nll(p: Array[Double]): Double = {
        val m = p(0); val n = p(1); val nn = p(2)
        if (!(m >= kMax + 1 && n >= kMax && nn >= kMax && n <= m && nn <= m &&
              m - n >= nn - kMin)) return Optimize.Penalty
        var ll = 0.0
        var i = 0
        while (i < vals.length) {
          val k = vals(i).toDouble
          val lp = lchoose(n, k) + lchoose(m - n, nn - k) - lchoose(m, nn)
          if (lp.isNaN || lp.isInfinite) return Optimize.Penalty
          ll += cnts(i) * lp
          i += 1
        }
        -ll
      }
      fitRelaxedInts(xs, initial(xs), nll, { p =>
        val n = math.max(math.round(p(1)), kMax)
        val nn = math.max(math.round(p(2)), kMax)
        val m = math.max(math.round(p(0)), math.max(n, nn) + math.max(nn - kMin, 0L))
        Array(m.toDouble, n.toDouble, nn.toDouble)
      })
    }
  }

  /** Negative hypergeometric(M, n, r): failures drawn before the r-th
    * success — pmf(k) = C(k+r−1,k)·C(M−r−k,n−r)/C(M,n), k ∈ [0, M−n]
    * (reference: distributions.py:538-548). */
  object NHypergeom extends DiscreteDist {
    val name = "nhypergeom"; val paramNames = Seq("M", "n", "r")
    override def integerParams = Set(0, 1, 2)
    def valid(p: Array[Double]) = {
      val m = math.round(p(0)); val n = math.round(p(1)); val r = math.round(p(2))
      m >= 1 && n >= 0 && n <= m && r >= 1 && r <= n
    }
    def logpmf(k: Long, p: Array[Double]) = {
      val m = math.round(p(0)).toDouble
      val n = math.round(p(1)).toDouble
      val r = math.round(p(2)).toDouble
      if (k < 0 || k > m - n) Double.NegativeInfinity
      else lchoose(k + r - 1, k.toDouble) + lchoose(m - r - k, n - r) - lchoose(m, n)
    }
    def support(p: Array[Double]) = (0L, math.round(p(0)) - math.round(p(1)))
    def initial(xs: Array[Long]) = {
      val mx = maxOf(xs).toDouble
      Array(mx * 2 + 20, mx + 10, mx + 5)
    }
    override def fit(xs: Array[Long]): Array[Double] = {
      val (vals, cnts) = DiscreteDist.compress(xs)
      val kMax = vals.last
      def nll(p: Array[Double]): Double = {
        val m = p(0); val n = p(1); val r = p(2)
        if (!(r >= 1 && r <= n && n <= m && m - n >= kMax && m - r - kMax >= n - r))
          return Optimize.Penalty
        var ll = 0.0
        var i = 0
        while (i < vals.length) {
          val k = vals(i).toDouble
          val lp = lchoose(k + r - 1, k) + lchoose(m - r - k, n - r) - lchoose(m, n)
          if (lp.isNaN || lp.isInfinite) return Optimize.Penalty
          ll += cnts(i) * lp
          i += 1
        }
        -ll
      }
      fitRelaxedInts(xs, initial(xs), nll, { p =>
        val r = math.max(math.round(p(2)), 1L)
        val n = math.max(math.round(p(1)), r)
        val m = math.max(math.round(p(0)), n + kMax)
        Array(m.toDouble, n.toDouble, r.toDouble)
      })
    }
  }

  /** Skellam(μ₁, μ₂): difference of two independent Poissons — support all
    * of ℤ; pmf via the modified Bessel I (reference:
    * distributions.py:516-531). */
  object Skellam extends DiscreteDist {
    val name = "skellam"; val paramNames = Seq("mu1", "mu2")
    def valid(p: Array[Double]) = p(0) > 0 && p(1) > 0
    def logpmf(k: Long, p: Array[Double]) = {
      val mu1 = p(0); val mu2 = p(1)
      -(mu1 + mu2) + (k / 2.0) * math.log(mu1 / mu2) +
        SM.logBesselI(math.abs(k).toDouble, 2 * math.sqrt(mu1 * mu2))
    }
    def support(p: Array[Double]) = {
      // practical support: mean ± 40σ keeps the summation-based cdf finite
      val m = p(0) - p(1); val sd = math.sqrt(p(0) + p(1))
      (math.floor(m - 40 * sd - 5).toLong, math.ceil(m + 40 * sd + 5).toLong)
    }
    def initial(xs: Array[Long]) = {
      val m = mean(xs); val v = variance(xs)
      Array(math.max((v + m) / 2, 0.1), math.max((v - m) / 2, 0.1))
    }
  }

  /** Beta-negative-binomial(n, a, b): nbinom with Beta-mixed success
    * probability (reference: distributions.py:483-489). */
  object BetaNBinom extends DiscreteDist {
    val name = "betanbinom"; val paramNames = Seq("n", "a", "b")
    def valid(p: Array[Double]) = p(0) > 0 && p(1) > 0 && p(2) > 0
    def logpmf(k: Long, p: Array[Double]) = {
      val n = p(0); val a = p(1); val b = p(2)
      if (k < 0) Double.NegativeInfinity
      else lchoose(n + k - 1, k.toDouble) + SM.lbeta(a + n, b + k) - SM.lbeta(a, b)
    }
    def support(p: Array[Double]) = (0L, Long.MaxValue)
    def initial(xs: Array[Long]) = Array(math.max(mean(xs), 1.0), 1.0, 1.0)
  }

  /** scipy bernoulli: single trial, P(X=1) = p. MLE is the sample mean. */
  object Bernoulli extends DiscreteDist {
    val name = "bernoulli"; val paramNames = Seq("p")
    def valid(p: Array[Double]) = p(0) >= 0.0 && p(0) <= 1.0
    def logpmf(k: Long, p: Array[Double]) =
      if (k == 1L) { if (p(0) <= 0.0) Double.NegativeInfinity else math.log(p(0)) }
      else if (k == 0L) { if (p(0) >= 1.0) Double.NegativeInfinity else math.log1p(-p(0)) }
      else Double.NegativeInfinity
    override def cdf(k: Long, p: Array[Double]) =
      if (k < 0) 0.0 else if (k < 1) 1.0 - p(0) else 1.0
    def support(p: Array[Double]) = (0L, 1L)
    override def refine = false // MLE is the sample mean
    def initial(xs: Array[Long]): Array[Double] = {
      // any value outside {0,1} makes the family inapplicable — signal
      // with invalid params so the kernel emits the sentinel row
      var i = 0
      while (i < xs.length) {
        if (xs(i) != 0L && xs(i) != 1L) return Array(Double.NaN)
        i += 1
      }
      Array(mean(xs))
    }
  }

  /** scipy randint: discrete uniform on [low, high-1], pmf 1/(high-low).
    * MLE is closed-form: low = min(x), high = max(x) + 1. */
  object Randint extends DiscreteDist {
    val name = "randint"; val paramNames = Seq("low", "high")
    def valid(p: Array[Double]) = p(1) > p(0)
    def logpmf(k: Long, p: Array[Double]) =
      if (k < p(0) || k >= p(1)) Double.NegativeInfinity
      else -math.log(p(1) - p(0))
    override def cdf(k: Long, p: Array[Double]) =
      if (k < p(0)) 0.0
      else if (k >= p(1) - 1) 1.0
      else (math.floor(k.toDouble) - p(0) + 1.0) / (p(1) - p(0))
    def support(p: Array[Double]) = (math.ceil(p(0)).toLong, math.ceil(p(1)).toLong - 1L)
    override def integerParams = Set(0, 1)
    override def refine = false // MLE: tightest covering interval
    def initial(xs: Array[Long]) = {
      var mn = Long.MaxValue; var mx = Long.MinValue
      var i = 0
      while (i < xs.length) {
        if (xs(i) < mn) mn = xs(i)
        if (xs(i) > mx) mx = xs(i)
        i += 1
      }
      Array(mn.toDouble, mx.toDouble + 1.0)
    }
  }

  val all: Seq[DiscreteDist] = Seq(
    Poisson, Geom, Binom, NBinom, Zipf, Zipfian, DLaplace, LogSer, Planck,
    Boltzmann, YuleSimon, BetaBinom, Hypergeom, NHypergeom, Skellam, BetaNBinom,
    Randint, Bernoulli)
}
