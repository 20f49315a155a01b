package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.dists.{ContinuousDist, DiscreteDist, ContinuousDist => CD}

/** Percentile-bootstrap confidence intervals for fitted parameters
  * (reference: src/spark_bestfit/estimation.py:826-943, discrete twin
  * :626-712): B resamples with replacement, refit each, drop failed fits
  * (≥ 10 successes required), remove 3×IQR outlier rows per parameter,
  * take (α/2, 1−α/2) percentiles.
  *
  * The refits fan out over the cluster via `spark.range(B)` — each task
  * holds only the broadcast 10K sample, so B can be large without driver
  * involvement.
  */
object Bootstrap {

  final case class ParamCI(param: String, lower: Double, upper: Double, point: Double)

  def confidenceIntervals(spark: SparkSession, dist: ContinuousDist,
                          sample: Array[Double], b: Int = 1000,
                          alpha: Double = 0.05, seed: Long = 42L): Seq[ParamCI] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(sample)
    val point = dist.fit(sample)
    val fits = spark.range(0, b, 1, math.min(b, 2 * spark.sparkContext.defaultParallelism))
      .map { i =>
        val xs = bc.value
        val rng = new java.util.SplittableRandom(seed + i)
        val res = Array.fill(xs.length)(xs(rng.nextInt(xs.length)))
        try {
          val p = dist.fit(res)
          if (p.forall(java.lang.Double.isFinite)) p else Array.empty[Double]
        } catch { case _: Throwable => Array.empty[Double] }
      }
      .filter(_.nonEmpty)
      .collect()
    require(fits.length >= 10,
      s"bootstrap needs >= 10 successful refits, got ${fits.length}")
    buildCIs(dist.paramNames, fits, point, alpha)
  }

  def confidenceIntervalsDiscrete(spark: SparkSession, dist: DiscreteDist,
                                  sample: Array[Long], b: Int = 1000,
                                  alpha: Double = 0.05, seed: Long = 42L): Seq[ParamCI] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(sample)
    val point = dist.fit(sample)
    val fits = spark.range(0, b, 1, math.min(b, 2 * spark.sparkContext.defaultParallelism))
      .map { i =>
        val xs = bc.value
        val rng = new java.util.SplittableRandom(seed + i)
        val res = Array.fill(xs.length)(xs(rng.nextInt(xs.length)))
        try {
          val p = dist.fit(res)
          if (p.forall(java.lang.Double.isFinite)) p else Array.empty[Double]
        } catch { case _: Throwable => Array.empty[Double] }
      }
      .filter(_.nonEmpty)
      .collect()
    require(fits.length >= 10,
      s"bootstrap needs >= 10 successful refits, got ${fits.length}")
    buildCIs(dist.paramNames, fits, point, alpha)
  }

  private def buildCIs(names: Seq[String], fits: Array[Array[Double]],
                       point: Array[Double], alpha: Double): Seq[ParamCI] = {
    // 3×IQR outlier-row removal per parameter (reference: estimation.py:898-914)
    val nParams = point.length
    val keep = Array.fill(fits.length)(true)
    for (p <- 0 until nParams) {
      val col = fits.map(_(p))
      val q1 = CD.quantile(col, 0.25)
      val q3 = CD.quantile(col, 0.75)
      val iqr = q3 - q1
      if (iqr > 0) {
        val lo = q1 - 3 * iqr; val hi = q3 + 3 * iqr
        for (i <- fits.indices if fits(i)(p) < lo || fits(i)(p) > hi) keep(i) = false
      }
    }
    val kept = fits.indices.filter(keep).map(fits).toArray
    val use = if (kept.length >= 10) kept else fits
    names.indices.map { p =>
      val col = use.map(_(p))
      ParamCI(names(p),
        CD.quantile(col, alpha / 2),
        CD.quantile(col, 1 - alpha / 2),
        point(p))
    }
  }
}
