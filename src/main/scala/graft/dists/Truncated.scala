package graft.dists

/** Truncation wrapper: renormalizes a fitted continuous distribution to
  * [lb, ub] (reference: src/spark_bestfit/truncated.py:10-344 —
  * renormalized pdf/logpdf, shifted-scaled cdf, quantile-mapped ppf
  * F⁻¹(F(lb) + q·Z)).
  *
  * The boundary CDFs are computed once at construction (the reference
  * LRU-caches them; here they are plain fields).
  */
final class Truncated(
    val dist: ContinuousDist,
    val params: Array[Double],
    val lb: Double,
    val ub: Double,
    raiseOnEmpty: Boolean = true) extends Serializable {

  val cdfLb: Double = if (lb.isNegInfinity) 0.0 else dist.cdf(lb, params)
  val cdfUb: Double = if (ub.isPosInfinity) 1.0 else dist.cdf(ub, params)
  val mass: Double = cdfUb - cdfLb

  if (raiseOnEmpty) require(mass > 1e-300,
    s"truncation [$lb, $ub] leaves no probability mass for ${dist.name}")

  def pdf(x: Double): Double =
    if (x < lb || x > ub || mass <= 0) 0.0 else dist.pdf(x, params) / mass

  def logpdf(x: Double): Double =
    if (x < lb || x > ub || mass <= 0) Double.NegativeInfinity
    else dist.logpdf(x, params) - math.log(mass)

  def cdf(x: Double): Double =
    if (x <= lb) 0.0
    else if (x >= ub) 1.0
    else math.min(1.0, math.max(0.0, (dist.cdf(x, params) - cdfLb) / mass))

  def sf(x: Double): Double = 1.0 - cdf(x)

  def ppf(q: Double): Double = {
    if (q <= 0.0) return math.max(lb, dist.ppf(0.0, params))
    if (q >= 1.0) return math.min(ub, dist.ppf(1.0, params))
    dist.ppf(cdfLb + q * mass, params)
  }
}

/** Uniform view over possibly-truncated fitted models, so the metric code
  * is written once (reference treats frozen and truncated-frozen dists
  * uniformly, src/spark_bestfit/estimation.py:667-671). */
sealed trait FrozenModel extends Serializable {
  def pdf(x: Double): Double
  def logpdf(x: Double): Double
  def cdf(x: Double): Double
  def ppf(q: Double): Double
}

final case class FrozenDist(dist: ContinuousDist, params: Array[Double]) extends FrozenModel {
  def pdf(x: Double) = dist.pdf(x, params)
  def logpdf(x: Double) = dist.logpdf(x, params)
  def cdf(x: Double) = dist.cdf(x, params)
  def ppf(q: Double) = dist.ppf(q, params)
}

final case class FrozenTruncated(t: Truncated) extends FrozenModel {
  def pdf(x: Double) = t.pdf(x)
  def logpdf(x: Double) = t.logpdf(x)
  def cdf(x: Double) = t.cdf(x)
  def ppf(q: Double) = t.ppf(q)
}

object FrozenModel {
  def apply(dist: ContinuousDist, params: Array[Double],
            lb: Option[Double], ub: Option[Double]): FrozenModel = {
    if (lb.isEmpty && ub.isEmpty) FrozenDist(dist, params)
    else FrozenTruncated(new Truncated(dist, params,
      lb.getOrElse(Double.NegativeInfinity), ub.getOrElse(Double.PositiveInfinity)))
  }
}
