package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dists._
import graft.functions.{Metrics, SpecialMath => SM}

/** Spark-free math tests, mirroring the reference's known-distribution
  * pattern (/root/reference/tests/conftest.py:91-178): generate seeded
  * samples from a known family via inverse-transform, fit, and assert
  * parameter recovery within tolerance + distribution invariants. */
class DistributionSpec extends AnyFunSuite {

  /** Deterministic sample via inverse transform with a seeded generator. */
  def sample(d: ContinuousDist, params: Array[Double], n: Int, seed: Long = 42L): Array[Double] = {
    val rng = new java.util.Random(seed)
    Array.fill(n)(d.ppf(rng.nextDouble() match {
      case u if u <= 0.0 => 1e-12
      case u if u >= 1.0 => 1 - 1e-12
      case u => u
    }, params))
  }

  def sampleD(d: DiscreteDist, params: Array[Double], n: Int, seed: Long = 42L): Array[Long] = {
    val rng = new java.util.Random(seed)
    val (lo, _) = d.support(params)
    Array.fill(n) {
      val u = rng.nextDouble()
      // inverse transform by scanning the CDF
      var k = lo
      var c = d.pmf(k, params)
      while (c < u && k < lo + 100000) { k += 1; c += d.pmf(k, params) }
      k
    }
  }

  private val shapeExamples: Map[String, Array[Double]] = Map(
      "norm" -> Array(0.0, 1.0), "expon" -> Array(0.0, 2.0),
      "uniform" -> Array(1.0, 3.0), "lognorm" -> Array(0.6, 0.0, 2.0),
      "gamma" -> Array(2.5, 0.0, 1.5), "weibull_min" -> Array(1.8, 0.0, 2.0),
      "weibull_max" -> Array(1.8, 10.0, 2.0), "beta" -> Array(2.0, 3.0, 0.0, 1.0),
      "pareto" -> Array(2.5, 0.0, 1.0), "cauchy" -> Array(1.0, 2.0),
      "laplace" -> Array(0.5, 1.5), "logistic" -> Array(2.0, 1.0),
      "gumbel_r" -> Array(1.0, 2.0), "gumbel_l" -> Array(1.0, 2.0),
      "rayleigh" -> Array(0.0, 2.0), "chi2" -> Array(4.0, 0.0, 1.0),
      "t" -> Array(6.0, 0.0, 1.0), "invgauss" -> Array(0.8, 0.0, 1.0),
      "halfnorm" -> Array(0.0, 1.0), "halflogistic" -> Array(0.0, 1.0),
      "halfcauchy" -> Array(0.0, 1.0), "powerlaw" -> Array(1.7, 0.0, 1.0),
      "triang" -> Array(0.3, 0.0, 1.0), "maxwell" -> Array(0.0, 1.5),
      "chi" -> Array(3.0, 0.0, 1.0), "fisk" -> Array(2.2, 0.0, 1.0),
      "genpareto" -> Array(0.2, 0.0, 1.0), "genextreme" -> Array(0.1, 0.0, 1.0),
      "arcsine" -> Array(0.0, 1.0), "cosine" -> Array(0.0, 1.0),
      "nakagami" -> Array(1.4, 0.0, 1.0), "betaprime" -> Array(3.0, 4.0, 0.0, 1.0),
      "gompertz" -> Array(1.2, 0.0, 1.0), "erlang" -> Array(3.0, 0.0, 2.0),
      "wald" -> Array(0.0, 1.0),
      // Tier B
      "lomax" -> Array(2.5, 0.0, 1.0), "loglaplace" -> Array(2.0, 0.0, 1.0),
      "truncexpon" -> Array(3.0, 0.0, 1.0), "bradford" -> Array(1.5, 0.0, 1.0),
      "burr" -> Array(2.0, 1.5, 0.0, 1.0), "burr12" -> Array(2.0, 1.5, 0.0, 1.0),
      "johnsonsu" -> Array(0.5, 1.5, 0.0, 1.0), "johnsonsb" -> Array(0.3, 1.2, 0.0, 1.0),
      "exponnorm" -> Array(1.5, 0.0, 1.0), "foldnorm" -> Array(1.2, 0.0, 1.0),
      "invweibull" -> Array(2.5, 0.0, 1.0), "genlogistic" -> Array(1.8, 0.0, 1.0),
      "dgamma" -> Array(2.0, 0.0, 1.0), "dweibull" -> Array(1.8, 0.0, 1.0),
      "hypsecant" -> Array(0.0, 1.0), "semicircular" -> Array(0.0, 1.0),
      "anglit" -> Array(0.0, 1.0), "moyal" -> Array(0.0, 1.0),
      "levy" -> Array(0.0, 1.0), "levy_l" -> Array(0.0, 1.0),
      "exponweib" -> Array(1.5, 1.8, 0.0, 1.0), "gilbrat" -> Array(0.0, 1.0),
      // Tier C
      "alpha" -> Array(2.0, 0.0, 1.0), "fatiguelife" -> Array(0.8, 0.0, 1.0),
      "foldcauchy" -> Array(1.5, 0.0, 1.0), "f" -> Array(5.0, 12.0, 0.0, 1.0),
      "gennorm" -> Array(1.5, 0.0, 1.0), "halfgennorm" -> Array(1.5, 0.0, 1.0),
      "invgamma" -> Array(3.0, 0.0, 1.0), "loggamma" -> Array(2.0, 0.0, 1.0),
      "loguniform" -> Array(0.5, 4.0, 0.0, 1.0), "skewnorm" -> Array(3.0, 0.0, 1.0),
      "skewcauchy" -> Array(0.4, 0.0, 1.0), "trapezoid" -> Array(0.3, 0.7, 0.0, 1.0),
      "truncnorm" -> Array(-1.0, 2.0, 0.0, 1.0), "truncpareto" -> Array(1.8, 5.0, 0.0, 1.0),
      "truncweibull_min" -> Array(1.5, 0.2, 2.5, 0.0, 1.0),
      "powernorm" -> Array(2.2, 0.0, 1.0), "powerlognorm" -> Array(2.0, 0.5, 0.0, 1.0),
      "pearson3" -> Array(0.8, 0.0, 1.0), "rice" -> Array(1.5, 0.0, 1.0),
      "gengamma" -> Array(2.0, 1.5, 0.0, 1.0),
      // Tier D
      "genexpon" -> Array(1.0, 1.0, 2.0, 0.0, 1.0),
      "genhalflogistic" -> Array(0.5, 0.0, 1.0), "kappa3" -> Array(1.5, 0.0, 1.0),
      "kappa4" -> Array(0.3, 0.2, 0.0, 1.0), "rdist" -> Array(3.0, 0.0, 1.0),
      "argus" -> Array(1.5, 0.0, 1.0), "crystalball" -> Array(1.2, 3.0, 0.0, 1.0),
      "laplace_asymmetric" -> Array(1.5, 0.0, 1.0),
      "jf_skew_t" -> Array(3.0, 2.0, 0.0, 1.0), "wrapcauchy" -> Array(0.5, 0.0, 1.0),
      "tukeylambda" -> Array(0.2, 0.0, 1.0), "recipinvgauss" -> Array(0.7, 0.0, 1.0),
      "vonmises_line" -> Array(2.0, 0.0, 1.0), "vonmises" -> Array(2.0, 0.0, 1.0),
      "ncx2" -> Array(4.0, 2.0, 0.0, 1.0), "ncf" -> Array(5.0, 12.0, 2.0, 0.0, 1.0),
      "norminvgauss" -> Array(1.5, 0.5, 0.0, 1.0),
      "nct" -> Array(6.0, 1.5, 0.0, 1.0),
      "rel_breitwigner" -> Array(4.0, 0.0, 1.0),
      "irwinhall" -> Array(6.0, 0.0, 1.0), "landau" -> Array(0.0, 1.0),
      "dpareto_lognorm" -> Array(2.5, 1.5, 0.5, 0.0, 1.0),
      // Tier E
      "gibrat" -> Array(0.0, 1.0), "exponpow" -> Array(1.5, 0.0, 1.0),
      "mielke" -> Array(3.0, 2.0, 0.0, 1.0), "kstwobign" -> Array(0.0, 1.0),
      "ksone" -> Array(50.0, 0.0, 1.0), "kstwo" -> Array(30.0, 0.0, 1.0),
      "geninvgauss" -> Array(1.2, 2.0, 0.0, 1.0),
      "genhyperbolic" -> Array(0.8, 1.5, 0.3, 0.0, 1.0),
      "gausshyper" -> Array(2.0, 3.0, 1.5, 0.8, 0.0, 1.0),
      "studentized_range" -> Array(3.0, 10.0, 0.0, 1.0),
      "levy_stable" -> Array(1.7, 0.5, 0.0, 1.0))

  test("ppf/cdf round-trip for every registered continuous family") {
    for (d <- ContinuousFamilies.all ++ ContinuousFamiliesB.all ++
              ContinuousFamiliesC.all ++ ContinuousFamiliesD.all ++
              ContinuousFamiliesE.all) {
      val p = shapeExamples(d.name)
      for (q <- Seq(0.01, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99)) {
        val x = d.ppf(q, p)
        assert(java.lang.Double.isFinite(x), s"${d.name}.ppf($q) = $x")
        val back = d.cdf(x, p)
        assert(math.abs(back - q) < 1e-6, s"${d.name}: cdf(ppf($q)) = $back")
      }
      // cdf monotone + pdf nonnegative on a grid
      val grid = (1 to 99).map(i => d.ppf(i / 100.0, p))
      grid.sliding(2).foreach { case Seq(a, b) =>
        assert(d.cdf(a, p) <= d.cdf(b, p) + 1e-12, s"${d.name} cdf not monotone")
      }
      grid.foreach { x => assert(d.pdf(x, p) >= 0, s"${d.name} pdf<0 at $x") }
    }
  }

  test("pdf matches the numerical cdf derivative for every family") {
    // central difference (cdf(x+h) − cdf(x−h)) / 2h ≈ pdf(x): a silent
    // cdf0/pdf0 disagreement corrupts SSE (CDF-differencing) vs AIC
    // (logpdf) rankings without failing any single-function test
    for (d <- ContinuousFamilies.all ++ ContinuousFamiliesB.all ++
              ContinuousFamiliesC.all ++ ContinuousFamiliesD.all ++
              ContinuousFamiliesE.all) {
      val p = shapeExamples(d.name)
      for (q <- Seq(0.15, 0.35, 0.5, 0.65, 0.85)) {
        val x = d.ppf(q, p)
        val pdf = d.pdf(x, p)
        if (java.lang.Double.isFinite(x) && java.lang.Double.isFinite(pdf) && pdf > 1e-8) {
          val h = 1e-5 * (1.0 + math.abs(x))
          val num = (d.cdf(x + h, p) - d.cdf(x - h, p)) / (2 * h)
          assert(math.abs(num - pdf) <= 2e-3 * pdf + 1e-7,
            s"${d.name}: pdf($x)=$pdf but dCDF/dx=$num (q=$q)")
        }
      }
    }
  }

  test("logpdf0Sum overrides agree with the naive logpdf0 sum for every family") {
    val rng = new java.util.Random(9L)
    val xs = Array.fill(500)(1.0 + 9.0 * rng.nextDouble())
    var covered = 0
    for (name <- DistRegistry.allNames) {
      val d = DistRegistry.get(name).get
      val p = try d.warmStart(xs) catch { case _: Throwable => null }
      if (p != null && d.scale(p) > 0 && d.shapesValid(d.shapes(p))) {
        val s = d.shapes(p); val l = d.loc(p); val sc = d.scale(p)
        val zs = xs.map(x => (x - l) / sc)
          .filter(z => z >= d.a0(s) && z <= d.b0(s))
        if (zs.nonEmpty) {
          val naive = zs.map(d.logpdf0(_, s)).sum
          val fast = d.logpdf0Sum(zs, s)
          if (naive.isNegInfinity || naive.isNaN)
            assert(fast.isNegInfinity, s"$name: fast=$fast naive=$naive")
          else {
            assert(math.abs(fast - naive) <= 1e-6 * math.max(1.0, math.abs(naive)),
              s"$name: fast=$fast naive=$naive")
            covered += 1
          }
        }
      }
    }
    assert(covered > 60, s"only $covered families exercised")
  }

  test("logpdf agrees with log(pdf) where pdf > 0") {
    val p = Array(2.5, 0.0, 1.5)
    for (q <- Seq(0.05, 0.5, 0.95)) {
      val x = ContinuousFamilies.Gamma.ppf(q, p)
      val lp = ContinuousFamilies.Gamma.logpdf(x, p)
      assert(math.abs(math.exp(lp) - ContinuousFamilies.Gamma.pdf(x, p)) < 1e-12)
    }
  }

  test("normal fit recovers loc=50 scale=10") {
    val xs = sample(ContinuousFamilies.Norm, Array(50.0, 10.0), 10000)
    val p = ContinuousFamilies.Norm.fit(xs)
    assert(math.abs(p(0) - 50.0) < 0.5, s"loc=${p(0)}")
    assert(math.abs(p(1) - 10.0) < 0.5, s"scale=${p(1)}")
  }

  test("exponential fit recovers scale=5") {
    val xs = sample(ContinuousFamilies.Expon, Array(0.0, 5.0), 10000)
    val p = ContinuousFamilies.Expon.fit(xs)
    assert(math.abs(p(1) - 5.0) < 0.3, s"scale=${p(1)}")
  }

  test("gamma fit recovers shape=2 scale=2") {
    val xs = sample(ContinuousFamilies.Gamma, Array(2.0, 0.0, 2.0), 10000)
    val p = ContinuousFamilies.Gamma.fit(xs)
    assert(math.abs(p(0) - 2.0) < 0.3, s"shape=${p(0)}")
    assert(math.abs(p(2) - 2.0) < 0.4, s"scale=${p(2)}")
  }

  test("weibull fit recovers c=2 scale=10") {
    val xs = sample(ContinuousFamilies.WeibullMin, Array(2.0, 0.0, 10.0), 10000)
    val p = ContinuousFamilies.WeibullMin.fit(xs)
    assert(math.abs(p(0) - 2.0) < 0.3, s"c=${p(0)}")
    assert(math.abs(p(2) - 10.0) < 0.5, s"scale=${p(2)}")
  }

  test("lognorm fit recovers s=0.5 scale=e") {
    val xs = sample(ContinuousFamilies.LogNorm, Array(0.5, 0.0, math.exp(1.0)), 10000)
    val p = ContinuousFamilies.LogNorm.fit(xs)
    assert(math.abs(p(0) - 0.5) < 0.1, s"s=${p(0)}")
    assert(math.abs(p(2) - math.exp(1.0)) < 0.3, s"scale=${p(2)}")
  }

  test("model selection: norm data ranks norm best by AIC among rivals") {
    val xs = sample(ContinuousFamilies.Norm, Array(50.0, 10.0), 10000)
    val rivals = Seq("norm", "cauchy", "logistic", "gumbel_r", "laplace", "uniform")
    val aics = rivals.map { nm =>
      val d = DistRegistry.get(nm).get
      val p = d.fit(xs)
      val (aic, _) = Metrics.informationCriteria(FrozenDist(d, p), p.length, xs)
      nm -> aic
    }
    assert(aics.minBy(_._2)._1 == "norm", s"AICs: $aics")
  }

  test("KS statistic small for the true family, p reasonable") {
    val xs = sample(ContinuousFamilies.Norm, Array(0.0, 1.0), 5000)
    val p = ContinuousFamilies.Norm.fit(xs)
    val (d, pv) = Metrics.ksStatistic(FrozenDist(ContinuousFamilies.Norm, p), xs)
    assert(d < 0.02, s"KS D=$d")
    assert(pv > 0.01, s"KS p=$pv")
    // wrong family should have much larger D
    val pe = ContinuousFamilies.Expon.fit(xs.map(x => x - xs.min + 0.01))
    val (dBad, _) = Metrics.ksStatistic(
      FrozenDist(ContinuousFamilies.Expon, pe), xs.map(x => x - xs.min + 0.01))
    assert(dBad > d * 3, s"expected worse fit: $dBad vs $d")
  }

  test("AD statistic and p-value for normal data") {
    val xs = sample(ContinuousFamilies.Norm, Array(10.0, 3.0), 5000)
    val p = ContinuousFamilies.Norm.fit(xs)
    val a2 = Metrics.adStatistic(FrozenDist(ContinuousFamilies.Norm, p), xs)
    assert(a2 < 2.0, s"A2=$a2")
    val pv = Metrics.adPValue(ContinuousFamilies.Norm, xs)
    assert(pv.isDefined && pv.get >= 0.005 && pv.get <= 0.25, s"ad p=$pv")
    assert(Metrics.adPValue(ContinuousFamilies.Gamma, xs).isEmpty)
  }

  test("normal KL divergence: identity zero, asymmetry, scale/shift structure") {
    import graft.functions.Metrics.klNormal
    assert(klNormal(5.0, 2.0, 5.0, 2.0) == 0.0)
    // pure mean shift of k target-sigmas: KL = k²/2
    assert(math.abs(klNormal(0.0, 1.0, 2.0, 1.0) - 2.0) < 1e-12)
    // asymmetric in general
    val pq = klNormal(0.0, 1.0, 0.0, 2.0)
    val qp = klNormal(0.0, 2.0, 0.0, 1.0)
    assert(pq != qp && pq > 0 && qp > 0)
    // closed form vs direct Monte-Carlo estimate of E_P[ln p/q]
    val rng = new java.util.Random(11L)
    val est = (1 to 200000).map { _ =>
      val x = 1.0 + 2.5 * rng.nextGaussian()
      def lnpdf(m: Double, s: Double) =
        -0.5 * math.log(2 * math.Pi * s * s) - (x - m) * (x - m) / (2 * s * s)
      lnpdf(1.0, 2.5) - lnpdf(-0.5, 1.8)
    }.sum / 200000
    val exact = klNormal(1.0, 2.5, -0.5, 1.8)
    assert(math.abs(est - exact) < 0.05, s"mc=$est exact=$exact")
    intercept[IllegalArgumentException] { klNormal(0.0, 0.0, 0.0, 1.0) }
  }

  test("truncated wrapper: mass renormalized, ppf maps quantiles") {
    val t = new Truncated(ContinuousFamilies.Norm, Array(0.0, 1.0), -1.0, 1.0)
    assert(math.abs(t.cdf(1.0) - 1.0) < 1e-12)
    assert(math.abs(t.cdf(-1.0)) < 1e-12)
    assert(math.abs(t.ppf(0.5)) < 1e-9) // symmetric
    val integral = (0 until 1000).map { i =>
      val x = -1.0 + 2.0 * i / 1000.0
      t.pdf(x) * 2.0 / 1000.0
    }.sum
    assert(math.abs(integral - 1.0) < 0.01, s"truncated pdf integrates to $integral")
  }

  test("poisson fit recovers mu=7; ranks best by AIC vs geom/nbinom") {
    val xs = sampleD(DiscreteFamilies.Poisson, Array(7.0), 5000)
    val p = DiscreteFamilies.Poisson.fit(xs)
    assert(math.abs(p(0) - 7.0) < 0.2, s"mu=${p(0)}")
    val rivals = Seq(DiscreteFamilies.Poisson, DiscreteFamilies.NBinom, DiscreteFamilies.DLaplace)
    val aics = rivals.map { d =>
      val pp = d.fit(xs)
      d.name -> Metrics.informationCriteriaDiscrete(d, pp, xs)._1
    }
    assert(aics.minBy(_._2)._1 == "poisson", s"AICs: $aics")
  }

  test("nbinom fit recovers n=5 p=0.4") {
    val xs = sampleD(DiscreteFamilies.NBinom, Array(5.0, 0.4), 5000)
    val p = DiscreteFamilies.NBinom.fit(xs)
    assert(math.abs(p(0) - 5.0) < 1.0, s"n=${p(0)}")
    assert(math.abs(p(1) - 0.4) < 0.05, s"p=${p(1)}")
  }

  test("discrete KS matches the reference's index formulation") {
    val xs = sampleD(DiscreteFamilies.Poisson, Array(7.0), 5000)
    val p = DiscreteFamilies.Poisson.fit(xs)
    val (d, pv) = Metrics.ksDiscrete(DiscreteFamilies.Poisson, p, xs)
    // brute-force the reference's definition over every sorted index
    val sorted = xs.sorted
    val n = sorted.length
    val dBrute = (0 until n).map { i =>
      val f = DiscreteFamilies.Poisson.cdf(sorted(i), p)
      math.max((i + 1).toDouble / n - f, f - i.toDouble / n)
    }.max
    assert(math.abs(d - dBrute) < 1e-12, s"D=$d brute=$dBrute")
    assert(pv >= 0.0 && pv <= 1.0)
    // D is bounded below by the largest PMF jump under this formulation;
    // for a good fit it should not exceed maxJump by much
    val maxJump = (0L to 30L).map(k => DiscreteFamilies.Poisson.pmf(k, p)).max
    assert(d < maxJump + 0.05, s"D=$d maxJump=$maxJump")
  }

  test("Tier-B fit recovery: lomax, johnsonsu, dweibull, betabinom") {
    val xsL = sample(ContinuousFamiliesB.Lomax, Array(3.0, 0.0, 2.0), 8000)
    val pL = ContinuousFamiliesB.Lomax.fit(xsL)
    assert(math.abs(pL(0) - 3.0) < 1.0, s"lomax c=${pL(0)}")

    val xsJ = sample(ContinuousFamiliesB.JohnsonSU, Array(0.5, 1.5, 10.0, 2.0), 8000)
    val pJ = ContinuousFamiliesB.JohnsonSU.fit(xsJ)
    val llTrue = -ContinuousFamiliesB.JohnsonSU.negLogLik(Array(0.5, 1.5, 10.0, 2.0), xsJ)
    val llFit = -ContinuousFamiliesB.JohnsonSU.negLogLik(pJ, xsJ)
    assert(llFit >= llTrue - 10.0, s"johnsonsu LL fit=$llFit true=$llTrue")

    val xsD = sample(ContinuousFamiliesB.DWeibull, Array(2.0, 5.0, 3.0), 8000)
    val pD = ContinuousFamiliesB.DWeibull.fit(xsD)
    assert(math.abs(pD(0) - 2.0) < 0.4, s"dweibull c=${pD(0)}")
    assert(math.abs(pD(1) - 5.0) < 0.3, s"dweibull loc=${pD(1)}")

    val xsB = sampleD(DiscreteFamilies.BetaBinom, Array(20.0, 2.0, 3.0), 4000)
    val pB = DiscreteFamilies.BetaBinom.fit(xsB)
    val (aicBB, _) = Metrics.informationCriteriaDiscrete(DiscreteFamilies.BetaBinom, pB, xsB)
    val pBin = DiscreteFamilies.Binom.fit(xsB)
    val (aicBin, _) = Metrics.informationCriteriaDiscrete(DiscreteFamilies.Binom, pBin, xsB)
    assert(aicBB < aicBin, s"betabinom AIC $aicBB should beat binom $aicBin on overdispersed data")
  }

  test("Tier-C/D fit recovery: skewnorm, invgamma, rice, truncnorm") {
    val xsS = sample(ContinuousFamiliesC.SkewNorm, Array(4.0, 10.0, 2.0), 8000)
    val pS = ContinuousFamiliesC.SkewNorm.fit(xsS)
    val llTrue = -ContinuousFamiliesC.SkewNorm.negLogLik(Array(4.0, 10.0, 2.0), xsS)
    val llFit = -ContinuousFamiliesC.SkewNorm.negLogLik(pS, xsS)
    assert(llFit >= llTrue - 10.0, s"skewnorm LL fit=$llFit true=$llTrue")

    val xsI = sample(ContinuousFamiliesC.InvGamma, Array(3.0, 0.0, 2.0), 8000)
    val pI = ContinuousFamiliesC.InvGamma.fit(xsI)
    assert(math.abs(pI(0) - 3.0) < 1.2, s"invgamma a=${pI(0)}")

    val xsR = sample(ContinuousFamiliesC.Rice, Array(2.0, 0.0, 1.5), 6000)
    val pR = ContinuousFamiliesC.Rice.fit(xsR)
    val llTrueR = -ContinuousFamiliesC.Rice.negLogLik(Array(2.0, 0.0, 1.5), xsR)
    val llFitR = -ContinuousFamiliesC.Rice.negLogLik(pR, xsR)
    assert(llFitR >= llTrueR - 10.0, s"rice LL fit=$llFitR true=$llTrueR")

    val xsT = sample(ContinuousFamiliesC.TruncNorm, Array(-1.0, 1.5, 5.0, 2.0), 8000)
    val pT = ContinuousFamiliesC.TruncNorm.fit(xsT)
    val llTrueT = -ContinuousFamiliesC.TruncNorm.negLogLik(Array(-1.0, 1.5, 5.0, 2.0), xsT)
    val llFitT = -ContinuousFamiliesC.TruncNorm.negLogLik(pT, xsT)
    assert(llFitT >= llTrueT - 10.0, s"truncnorm LL fit=$llFitT true=$llTrueT")
  }

  test("version-new family recovery: rel_breitwigner, irwinhall, landau, nct") {
    // rel_breitwigner: LL at the fit must match/beat the truth
    val xsB = sample(ContinuousFamiliesD.RelBreitwigner, Array(5.0, 0.0, 2.0), 8000)
    val pB = ContinuousFamiliesD.RelBreitwigner.fit(xsB)
    val llTrueB = -ContinuousFamiliesD.RelBreitwigner.negLogLik(Array(5.0, 0.0, 2.0), xsB)
    val llFitB = -ContinuousFamiliesD.RelBreitwigner.negLogLik(pB, xsB)
    assert(llFitB >= llTrueB - 10.0, s"rel_breitwigner LL fit=$llFitB true=$llTrueB")

    // irwinhall: small n is sharply identifiable (support corners); the
    // integer shape recovers exactly and loc/scale stay close. (Large n
    // is near-normal — adjacent n are statistically indistinguishable by
    // design, so exact recovery is only a meaningful contract for small n.)
    val xsH = sample(ContinuousFamiliesD.IrwinHall, Array(3.0, 2.0, 3.0), 8000)
    val pH = ContinuousFamiliesD.IrwinHall.fit(xsH)
    assert(math.round(pH(0)) == 3L, s"irwinhall n=${pH(0)}")
    assert(math.abs(pH(1) - 2.0) < 0.5 && math.abs(pH(2) - 3.0) < 0.5,
      s"irwinhall loc/scale=${pH.toSeq}")

    // nct: excluded-by-default noncentral t; LL at the fit must
    // match/beat the truth (df/nc/loc are partially confounded, so exact
    // parameter recovery is not the contract)
    val xsN = sample(ContinuousFamiliesD.Nct, Array(6.0, 1.5, 0.0, 1.0), 6000)
    val pN = ContinuousFamiliesD.Nct.fit(xsN)
    val llTrueN = -ContinuousFamiliesD.Nct.negLogLik(Array(6.0, 1.5, 0.0, 1.0), xsN)
    val llFitN = -ContinuousFamiliesD.Nct.negLogLik(pN, xsN)
    assert(llFitN >= llTrueN - 10.0, s"nct LL fit=$llFitN true=$llTrueN")

    // landau: table is a proper distribution and loc/scale recover
    val xsL = sample(ContinuousFamiliesD.Landau, Array(10.0, 2.0), 8000)
    val pL = ContinuousFamiliesD.Landau.fit(xsL)
    val llTrueL = -ContinuousFamiliesD.Landau.negLogLik(Array(10.0, 2.0), xsL)
    val llFitL = -ContinuousFamiliesD.Landau.negLogLik(pL, xsL)
    assert(llFitL >= llTrueL - 10.0, s"landau LL fit=$llFitL true=$llTrueL")
    assert(math.abs(pL(0) - 10.0) < 1.0 && math.abs(pL(1) - 2.0) < 0.6,
      s"landau loc/scale=${pL.toSeq}")

    // dpareto_lognorm: LL at the fit must match/beat the truth (the two
    // tail indices and sigma are partially confounded at n=8000, so LL —
    // not exact parameter recovery — is the contract, as for nct)
    val dpln = ContinuousFamiliesD.DParetoLognorm
    val pTrue = Array(2.5, 1.5, 0.5, 0.0, 1.0)
    val xsP = sample(dpln, pTrue, 8000)
    val pP = dpln.fit(xsP)
    val llTrueP = -dpln.negLogLik(pTrue, xsP)
    val llFitP = -dpln.negLogLik(pP, xsP)
    assert(llFitP >= llTrueP - 10.0, s"dpareto_lognorm LL fit=$llFitP true=$llTrueP")
  }

  test("registry safety: no builtin shadowing, no silent overwrite, strict unregister") {
    import graft.dists._
    object Custom extends ContinuousDist with PositiveSupport {
      val name = "reg_safety_test_dist"
      val shapeNames = Seq.empty[String]
      def pdf0(z: Double, s: Array[Double]) = math.exp(-z)
      def cdf0(z: Double, s: Array[Double]) = 1 - math.exp(-z)
      def ppf0(q: Double, s: Array[Double]) = -math.log1p(-q)
      def warmStart(xs: Array[Double]) = Array(0.0, 1.0)
    }
    object Shadow extends ContinuousDist {
      val name = "norm" // builtin name — must be rejected
      val shapeNames = Seq.empty[String]
      def pdf0(z: Double, s: Array[Double]) = 0.0
      def cdf0(z: Double, s: Array[Double]) = 0.0
      def ppf0(q: Double, s: Array[Double]) = 0.0
      def warmStart(xs: Array[Double]) = Array(0.0, 1.0)
    }
    intercept[IllegalArgumentException] { DistRegistry.register(Shadow) }
    DistRegistry.register(Custom)
    try {
      intercept[IllegalArgumentException] { DistRegistry.register(Custom) }
      DistRegistry.register(Custom, overwrite = true) // explicit replace OK
      assert(DistRegistry.get("reg_safety_test_dist").isDefined)
    } finally DistRegistry.unregister("reg_safety_test_dist")
    intercept[IllegalArgumentException] {
      DistRegistry.unregister("reg_safety_test_dist") // already gone
    }
  }

  test("logBesselK matches closed half-integer forms, K1, and K0(1)") {
    // K_{1/2}(x) = √(π/2x)·e^{−x} exactly
    for (x <- Seq(0.1, 0.5, 1.0, 2.0, 5.0, 10.0, 50.0, 300.0, 650.0)) {
      val exact = 0.5 * math.log(math.Pi / (2 * x)) - x
      val got = SM.logBesselK(0.5, x)
      assert(math.abs(got - exact) < 1e-9 * (1 + math.abs(exact)),
        s"K_1/2($x): got=$got exact=$exact")
      // K_{5/2}(x) = √(π/2x)·e^{−x}·(1 + 3/x + 3/x²)
      val exact52 = exact + math.log(1.0 + 3.0 / x + 3.0 / (x * x))
      val got52 = SM.logBesselK(2.5, x)
      assert(math.abs(got52 - exact52) < 1e-9 * (1 + math.abs(exact52)),
        s"K_5/2($x): got=$got52 exact=$exact52")
      // order symmetry K_{−v} = K_v
      assert(SM.logBesselK(-2.5, x) == got52)
      // order 1 agrees with the A&S-fit logBesselK1 (that one is ~1e-7)
      assert(math.abs(SM.logBesselK(1.0, x) - SM.logBesselK1(x)) < 2e-6,
        s"K_1($x) vs logBesselK1")
    }
    // K_0(1) = 0.421024438240708... (A&S table 9.8)
    assert(math.abs(math.exp(SM.logBesselK(0.0, 1.0)) - 0.4210244382407083) < 1e-9)
    // high order via the half-integer closed form
    // K_{n+1/2}(x) = √(π/2x) e^{−x} Σ_k (n+k)!/(k!(n−k)!) (2x)^{−k}
    for ((n, x) <- Seq((10, 2.0), (30, 2.0), (30, 40.0), (60, 5.0))) {
      var lse = Double.NegativeInfinity
      for (k <- 0 to n) {
        val lt = SM.lgamma(n + k + 1.0) - SM.lgamma(k + 1.0) -
          SM.lgamma(n - k + 1.0) - k * math.log(2 * x)
        lse = if (lse == Double.NegativeInfinity) lt
              else math.max(lse, lt) + math.log1p(math.exp(-math.abs(lse - lt)))
      }
      val exact = 0.5 * math.log(math.Pi / (2 * x)) - x + lse
      val got = SM.logBesselK(n + 0.5, x)
      assert(math.abs(got - exact) < 1e-8 * (1 + math.abs(exact)),
        s"K_{$n+1/2}($x): got=$got exact=$exact")
    }
  }

  test("Tier-E recovery: gibrat, exponpow, mielke, geninvgauss, kstwobign") {
    // gibrat ≡ lognorm(s=1): loc/scale recover
    val xsG = sample(ContinuousFamiliesE.Gibrat, Array(1.0, 2.0), 6000)
    val pG = ContinuousFamiliesE.Gibrat.fit(xsG)
    assert(math.abs(pG(0) - 1.0) < 0.3 && math.abs(pG(1) - 2.0) < 0.3,
      s"gibrat loc/scale=${pG.toSeq}")

    val xsE = sample(ContinuousFamiliesE.ExponPow, Array(1.5, 0.0, 2.0), 6000)
    val pE = ContinuousFamiliesE.ExponPow.fit(xsE)
    assert(math.abs(pE(0) - 1.5) < 0.4, s"exponpow b=${pE.toSeq}")

    val xsM = sample(ContinuousFamiliesE.Mielke, Array(3.0, 2.5, 0.0, 1.0), 6000)
    val pM = ContinuousFamiliesE.Mielke.fit(xsM)
    val llTrueM = -ContinuousFamiliesE.Mielke.negLogLik(Array(3.0, 2.5, 0.0, 1.0), xsM)
    val llFitM = -ContinuousFamiliesE.Mielke.negLogLik(pM, xsM)
    assert(llFitM >= llTrueM - 10.0, s"mielke LL fit=$llFitM true=$llTrueM")

    val xsI = sample(ContinuousFamiliesE.GenInvGauss, Array(1.2, 2.0, 0.0, 1.5), 1500)
    val pI = ContinuousFamiliesE.GenInvGauss.fit(xsI)
    val llTrueI = -ContinuousFamiliesE.GenInvGauss.negLogLik(Array(1.2, 2.0, 0.0, 1.5), xsI)
    val llFitI = -ContinuousFamiliesE.GenInvGauss.negLogLik(pI, xsI)
    assert(llFitI >= llTrueI - 10.0, s"geninvgauss LL fit=$llFitI true=$llTrueI")

    // kstwobign: the soft left edge (density ~ e^{−π²/8z²} → 0) leaves
    // (loc, scale) individually weakly identified from a finite sample —
    // the contract is the fitted LAW: LL matches/beats truth and the
    // median loc + 0.82757·scale recovers
    val xsK = sample(ContinuousFamiliesE.KsTwoBign, Array(5.0, 3.0), 6000)
    val pK = ContinuousFamiliesE.KsTwoBign.fit(xsK)
    val llTrueK = -ContinuousFamiliesE.KsTwoBign.negLogLik(Array(5.0, 3.0), xsK)
    val llFitK = -ContinuousFamiliesE.KsTwoBign.negLogLik(pK, xsK)
    assert(llFitK >= llTrueK - 10.0, s"kstwobign LL fit=$llFitK true=$llTrueK")
    assert(math.abs((pK(0) + 0.82757 * pK(1)) - (5.0 + 0.82757 * 3.0)) < 0.25,
      s"kstwobign median: loc/scale=${pK.toSeq}")
  }

  test("levy_stable anchors: α=2 is N(0,√2), α=1 is Cauchy, S(1/2,1) is Lévy") {
    val d = ContinuousFamiliesE.LevyStable
    // α = 2 (any β): X ~ N(0, √2)
    for (x <- Seq(-2.0, 0.0, 1.0, 3.0)) {
      val exact = SM.normPdf(x / math.sqrt(2.0)) / math.sqrt(2.0)
      assert(math.abs(d.pdf(x, Array(2.0, 0.3, 0.0, 1.0)) - exact) < 1e-10, s"alpha=2 pdf($x)")
      assert(math.abs(d.cdf(x, Array(2.0, 0.3, 0.0, 1.0)) - SM.normCdf(x / math.sqrt(2.0))) < 1e-10)
    }
    // α = 1, β = 0: standard Cauchy
    assert(math.abs(d.pdf(0.0, Array(1.0, 0.0, 0.0, 1.0)) - 1.0 / math.Pi) < 1e-12)
    assert(math.abs(d.cdf(1.0, Array(1.0, 0.0, 0.0, 1.0)) - 0.75) < 1e-12)
    // α = 1/2, β = 1 (S1): the Lévy distribution —
    // pdf(x) = x^{−3/2} e^{−1/(2x)}/√(2π), cdf(x) = erfc(1/√(2x))
    for (x <- Seq(0.5, 1.0, 2.0, 5.0)) {
      val exactPdf = math.pow(x, -1.5) * math.exp(-0.5 / x) / SM.SqrtTwoPi
      val exactCdf = SM.erfc(1.0 / math.sqrt(2.0 * x))
      val gotPdf = d.pdf(x, Array(0.5, 1.0, 0.0, 1.0))
      val gotCdf = d.cdf(x, Array(0.5, 1.0, 0.0, 1.0))
      assert(math.abs(gotPdf - exactPdf) < 2e-6 * exactPdf + 1e-12,
        s"levy pdf($x): got=$gotPdf exact=$exactPdf")
      assert(math.abs(gotCdf - exactCdf) < 2e-6,
        s"levy cdf($x): got=$gotCdf exact=$exactCdf")
      // no mass below 0 for the α<1, β=1 one-sided case
      assert(d.pdf(-x, Array(0.5, 1.0, 0.0, 1.0)) == 0.0)
    }
    // symmetric α=1.3: cdf(0) = 1/2 and pdf is the mirror of −x
    assert(math.abs(d.cdf(0.0, Array(1.3, 0.0, 0.0, 1.0)) - 0.5) < 1e-9)
    assert(math.abs(d.pdf(1.5, Array(1.3, 0.4, 0.0, 1.0)) -
      d.pdf(-1.5, Array(1.3, -0.4, 0.0, 1.0))) < 1e-9)
  }

  test("levy_stable(1,1) and the Landau table agree up to the affine reparameterization") {
    // Landau IS the α=1, β=1 stable law in a different location/scale
    // convention. Both implementations here are fully independent (Landau:
    // init-time Simpson of the Kölbig-Schorr integral onto a grid;
    // levy_stable: Nolan's V₁ exponential-kernel integral), so agreement
    // after fitting the affine map from two quantiles is a strong mutual
    // correctness check of exactly the α=1 |β|=1 corner.
    val lan = ContinuousFamiliesD.Landau
    val ls = ContinuousFamiliesE.LevyStable
    val pL = Array(0.0, 1.0)
    val pS = Array(1.0, 1.0, 0.0, 1.0)
    // affine map x_landau = A·x_stable + B from the 25th/75th quantiles
    val (s25, s75) = (ls.ppf(0.25, pS), ls.ppf(0.75, pS))
    val (l25, l75) = (lan.ppf(0.25, pL), lan.ppf(0.75, pL))
    val a = (l75 - l25) / (s75 - s25)
    val b = l25 - a * s25
    assert(a > 0, s"degenerate affine fit a=$a")
    for (q <- Seq(0.05, 0.1, 0.4, 0.6, 0.9, 0.95)) {
      val viaStable = a * ls.ppf(q, pS) + b
      val direct = lan.ppf(q, pL)
      assert(math.abs(viaStable - direct) < 3e-2 * (1 + math.abs(direct)),
        s"q=$q: stable-mapped=$viaStable landau=$direct (a=$a b=$b)")
    }
  }

  test("Tier-E default-zoo membership mirrors the reference registry") {
    val names = DistRegistry.defaultNames.toSet
    // gibrat (modern spelling) is IN the default zoo; the legacy spelling
    // and every reference-DEFAULT_EXCLUSIONS member we implement are OUT
    assert(names.contains("gibrat"))
    for (n <- Seq("gilbrat", "mielke", "exponpow", "ksone", "kstwo",
                  "kstwobign", "geninvgauss", "genhyperbolic", "gausshyper",
                  "studentized_range", "nct", "tukeylambda", "levy_stable"))
      assert(!names.contains(n), s"$n should be default-excluded")
    // all Tier-E names resolve through the registry
    for (d <- ContinuousFamiliesE.all)
      assert(DistRegistry.get(d.name).contains(d), d.name)
  }

  test("bernoulli: closed-form MLE and the non-binary sentinel contract") {
    val d = DiscreteFamilies.Bernoulli
    val xs = sampleD(d, Array(0.3), 4000)
    val p = d.fit(xs)
    assert(math.abs(p(0) - 0.3) < 0.03, s"p=${p(0)}")
    assert(math.abs(d.pmf(1L, Array(0.3)) - 0.3) < 1e-12)
    assert(d.cdf(0L, Array(0.3)) == 0.7)
    // non-binary data → invalid params (the fit kernel then emits the
    // never-crash sentinel row instead of a bogus fit)
    assert(d.initial(Array(0L, 1L, 2L)).exists(_.isNaN))
  }

  test("landau table reproduces published distribution constants") {
    val d = ContinuousFamiliesD.Landau
    val p = Array(0.0, 1.0)
    // mode x ≈ -0.22278 (Kölbig & Schorr 1984): the density peak
    val grid = (-100 to 100).map(i => i * 0.005)
    val peak = grid.maxBy(z => d.pdf(z, p))
    assert(math.abs(peak - (-0.22278)) < 0.01, s"mode=$peak")
    assert(math.abs(d.pdf(peak, p) - 0.18065) < 0.002, s"peak density=${d.pdf(peak, p)}")
    // median ≈ 1.35578
    assert(math.abs(d.ppf(0.5, p) - 1.35578) < 0.01, s"median=${d.ppf(0.5, p)}")
    // heavy right tail: p(x) ~ 1/x² ⇒ P(X > x)·x → ~1 (slowly-varying
    // correction keeps it a few % above 1 at x = 200)
    val x = 200.0
    val sf = 1.0 - d.cdf(x, p)
    assert(sf * x > 0.9 && sf * x < 1.2, s"tail sf*x=${sf * x}")
  }

  test("new discrete families: skellam, hypergeom, betanbinom, nhypergeom") {
    // skellam recovery
    val xsSk = sampleD(DiscreteFamilies.Skellam, Array(6.0, 2.0), 4000)
    val pSk = DiscreteFamilies.Skellam.fit(xsSk)
    assert(math.abs(pSk(0) - 6.0) < 1.5 && math.abs(pSk(1) - 2.0) < 1.0,
      s"skellam fit ${pSk.toSeq}")
    // hypergeom: pmf sums to 1 over support, fit produces consistent ints
    val pH = Array(50.0, 20.0, 10.0)
    val sumH = (0L to 10L).map(DiscreteFamilies.Hypergeom.pmf(_, pH)).sum
    assert(math.abs(sumH - 1.0) < 1e-9, s"hypergeom pmf sum=$sumH")
    val xsH = sampleD(DiscreteFamilies.Hypergeom, pH, 3000)
    val fH = DiscreteFamilies.Hypergeom.fit(xsH)
    assert(fH.forall(v => v == math.round(v).toDouble), s"hypergeom ints ${fH.toSeq}")
    assert(DiscreteFamilies.Hypergeom.valid(fH) &&
      xsH.max <= math.min(math.round(fH(1)), math.round(fH(2))), s"hypergeom covers sample")
    // betanbinom: overdispersed vs nbinom
    val xsB = sampleD(DiscreteFamilies.BetaNBinom, Array(8.0, 3.0, 4.0), 3000)
    val pB = DiscreteFamilies.BetaNBinom.fit(xsB)
    val (aicB, _) = Metrics.informationCriteriaDiscrete(DiscreteFamilies.BetaNBinom, pB, xsB)
    assert(java.lang.Double.isFinite(aicB), s"betanbinom aic=$aicB")
    // nhypergeom: pmf sums to 1 over its finite support
    val pN = Array(50.0, 40.0, 5.0)
    val sumN = (0L to 10L).map(DiscreteFamilies.NHypergeom.pmf(_, pN)).sum
    assert(math.abs(sumN - 1.0) < 1e-9, s"nhypergeom pmf sum=$sumN")
  }

  test("logBesselI and logBesselK1 against reference values") {
    // I_0(1) = 1.2660658777520084 (A&S polynomial path, ~2e-7 rel);
    // I_1(2) = 1.5906368546373291 (exact series path)
    assert(math.abs(math.exp(SM.logBesselI(0.0, 1.0)) - 1.2660658777520084) < 1e-6)
    assert(math.abs(math.exp(SM.logBesselI(1.0, 2.0)) - 1.5906368546373291) < 1e-10)
    // large-argument asymptotic branch: I_0(100) = 1.0737517071310738e42
    assert(math.abs(SM.logBesselI(0.0, 100.0) - math.log(1.0737517071310738e42)) < 1e-4)
    // K_1(1) = 0.6019072301972346, K_1(5) = 0.004044613445452164
    assert(math.abs(math.exp(SM.logBesselK1(1.0)) - 0.6019072301972346) < 1e-6)
    assert(math.abs(math.exp(SM.logBesselK1(5.0)) - 0.004044613445452164) < 1e-7)
  }

  test("rational erfc matches commons-math erfc across the full domain") {
    import org.apache.commons.math3.special.{Erf => CErf}
    // dense core grid + deep-tail spot checks; commons-math is accurate
    // to ~1e-15 rel, so agreement here validates the Cody coefficients
    var x = -8.0
    while (x <= 8.0) {
      val fast = SM.erfc(x)
      val ref = CErf.erfc(x)
      val tol = math.max(1e-13, 5e-14 * math.abs(ref))
      assert(math.abs(fast - ref) <= tol, s"erfc($x): $fast vs $ref")
      x += 0.0137
    }
    for (t <- Seq(10.0, 15.0, 20.0, 26.0)) {
      val fast = SM.erfc(t)
      val ref = CErf.erfc(t)
      assert(math.abs(fast - ref) <= 1e-12 * math.max(ref, 1e-300) + 1e-320,
        s"erfc($t): $fast vs $ref")
      assert(SM.erfc(-t) == 2.0 - SM.erfc(t))
    }
    assert(SM.erfc(30.0) == 0.0 && SM.erfc(-30.0) == 2.0)
    // normCdf round-trip with ppf stays consistent after the swap
    // (tolerance bounded by commons-math erfInv tail accuracy ~1e-7 rel)
    for (q <- Seq(1e-10, 1e-4, 0.025, 0.5, 0.975, 1 - 1e-6))
      assert(math.abs(SM.normCdf(SM.normPpf(q)) - q) <= 1e-6 * q + 1e-15)
  }

  test("special functions: normal ppf, kolmogorov, zeta") {
    assert(math.abs(SM.normPpf(0.975) - 1.959963984540054) < 1e-9)
    assert(math.abs(SM.normCdf(1.96) - 0.9750021048517795) < 1e-12)
    assert(math.abs(DiscreteFamilies.zeta(2.0) - math.Pi * math.Pi / 6) < 1e-8)
    assert(math.abs(SM.kolmogorovSf(0.828) - 0.4993) < 0.001) // K(0.828) ≈ 0.5007
  }
}
