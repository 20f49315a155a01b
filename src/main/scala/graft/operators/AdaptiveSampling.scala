package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Adaptive pre-fit sampling policy (reference: src/spark_bestfit/
  * base_fitter.py:243-477 — uniform policy :278-308, strategy select
  * :287-301, pilot skew :310-364).
  *
  * Large inputs are reduced BEFORE the histogram/sample scans:
  *  - below `sampleThresholdRows` nothing happens (full data);
  *  - above it, a pilot scan estimates skewness on a small uniform sample;
  *  - heavily skewed data selects the stratified sampler (tail boost), the
  *    rest selects plain uniform sampling;
  *  - the sampled fraction is `sampleFraction`, capped so the expected
  *    sampled row count stays ≤ `sampleCapRows`.
  *
  * At 100 TB this is the difference between histogramming the corpus and
  * histogramming a bounded, shape-preserving subset: one cheap pilot
  * aggregate, then one sample pushed into the scan.
  */
object AdaptiveSampling {

  final case class SamplePlan(strategy: String, fraction: Double,
                              numBins: Int = 5)

  /** Pure policy: which strategy, fraction, and stratum count apply to n
    * rows with the given pilot skewness. None = fit on the full data.
    * Mirrors the reference's two-threshold select: |skew| ≥ mild picks
    * stratified, |skew| ≥ high escalates to 10 strata
    * (base_fitter.py:291-301, 367-387). */
  def plan(n: Long, pilotSkew: Double, cfg: FitConfig): Option[SamplePlan] = {
    if (n <= cfg.sampleThresholdRows) return None
    val fraction = math.min(cfg.sampleFraction, cfg.sampleCapRows.toDouble / n)
    val strategy = cfg.samplingStrategy match {
      case "auto" => if (math.abs(pilotSkew) >= cfg.skewThresholdMild)
        "stratified" else "uniform"
      case s => s
    }
    val bins =
      if (math.abs(pilotSkew) >= cfg.skewThresholdForStratified) 10 else 5
    Some(SamplePlan(strategy, fraction, bins))
  }

  /** Pilot skewness estimate from a small uniform sample — one cheap
    * aggregate over ~pilotRows rows. */
  def pilotSkewness(df: DataFrame, column: String, n: Long, cfg: FitConfig): Double = {
    val fraction = math.min(1.0, cfg.pilotRows.toDouble / math.max(n, 1L))
    val row = df.sample(withReplacement = false, fraction, cfg.sampleSeed)
      .agg(F.skewness(F.col(column).cast("double")).as("sk")).head()
    if (row.isNullAt(0)) 0.0 else row.getDouble(0)
  }

  /** Apply the policy: returns the (possibly reduced) DataFrame and the
    * plan that produced it. Stratification uses the FIRST requested column
    * as the stratification key. */
  def prepare(df: DataFrame, columns: Seq[String], n: Long,
              cfg: FitConfig): (DataFrame, Option[SamplePlan]) = {
    if (cfg.samplingStrategy == "none" || n <= cfg.sampleThresholdRows)
      return (df, None)
    val skew =
      if (cfg.samplingStrategy == "auto") pilotSkewness(df, columns.head, n, cfg)
      else 0.0
    plan(n, skew, cfg) match {
      case None => (df, None)
      case Some(p) =>
        val reduced = p.strategy match {
          case "stratified" =>
            Sampling.stratifiedSample(df, columns.head, p.fraction,
              numBins = p.numBins, seed = cfg.sampleSeed,
              knownCount = Some(n))
          case _ =>
            df.sample(withReplacement = false, p.fraction, cfg.sampleSeed)
        }
        (reduced, Some(p))
    }
  }
}
