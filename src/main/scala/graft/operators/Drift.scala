package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Data-drift metrics between two cohorts of one table (reference vs
  * current snapshot, control vs treatment, yesterday vs today) — the
  * monitoring companions to the model-level normal KL in
  * [[graft.functions.Metrics.klNormal]] and the streaming drift score:
  *
  *  - [[histDrift]]: Population Stability Index + KL both ways over a
  *    FIXED equal-width binning of a continuous column (the industry
  *    drift gauge: PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted).
  *  - [[pmfDrift]]: the same divergences over the empirical PMF of a
  *    discrete/categorical column (label drift, source-mix drift).
  *
  * Scale shape: ONE groupBy over the cell key — partial-aggregated
  * map-side with both cohort counts as conditional sums, so the exchange
  * carries ≤ cells rows regardless of input size — then the divergence
  * folds over that tiny frame. Cells observed in only one cohort get a
  * deterministic +0.5 Laplace smoothing (divergences need p, q > 0); the
  * support is the cells observed in EITHER cohort, which is exactly the
  * set an external SQL engine's GROUP BY sees, so every count is integer
  * and the whole metric replays hash-exactly up to ln ULPs (absorbed by
  * the caller's rounding).
  */
object Drift {

  /** PSI + KL(a‖b) + KL(b‖a) over `numBins` equal-width bins of
    * `[binStart, binStart + numBins·binWidth)`, values outside clamped to
    * the edge bins (same floor-bin arithmetic as the histogram path).
    * `cohortCol` must take exactly the values "a" and "b".
    *
    * @return one row: (psi, kl_ab, kl_ba, n_a, n_b, n_cells) */
  def histDrift(df: DataFrame, cohortCol: String, valueCol: String,
                binStart: Double, binWidth: Double, numBins: Int): DataFrame = {
    require(numBins > 0 && binWidth > 0, "need positive bins/width")
    val v = F.col(valueCol).cast("double")
    val bin = F.least(
      F.greatest(F.floor((v - F.lit(binStart)) / F.lit(binWidth)), F.lit(0L)),
      F.lit((numBins - 1).toLong))
    divergences(df.where(v.isNotNull)
      .select(F.col(cohortCol).as("g"), bin.as("k")))
  }

  /** The same divergences over the empirical PMF of a discrete column.
    *
    * @return one row: (psi, kl_ab, kl_ba, n_a, n_b, n_cells) */
  def pmfDrift(df: DataFrame, cohortCol: String, valueCol: String): DataFrame =
    divergences(df.where(F.col(valueCol).isNotNull)
      .select(F.col(cohortCol).as("g"), F.col(valueCol).as("k")))

  /** One (cell → both-cohort counts) aggregate, then the smoothed
    * divergence fold. Smoothing: p = (count + 0.5) / (n + 0.5·cells) —
    * strictly positive, integer-count-exact. */
  private def divergences(cells: DataFrame): DataFrame = {
    val counts = cells.groupBy("k")
      .agg(
        F.sum(F.when(F.col("g") === "a", 1L).otherwise(0L)).as("ca"),
        F.sum(F.when(F.col("g") === "b", 1L).otherwise(0L)).as("cb"))
    val head = counts.agg(F.sum("ca"), F.sum("cb"), F.count(F.lit(1))).head()
    require(!head.isNullAt(0) && head.getLong(0) > 0 && head.getLong(1) > 0,
      "both cohorts need rows")
    val na = head.getLong(0); val nb = head.getLong(1); val nCells = head.getLong(2)
    val pa = (F.col("ca") + F.lit(0.5)) / F.lit(na + 0.5 * nCells)
    val pb = (F.col("cb") + F.lit(0.5)) / F.lit(nb + 0.5 * nCells)
    counts.agg(
      F.sum((pa - pb) * F.log(pa / pb)).as("psi"),
      F.sum(pa * F.log(pa / pb)).as("kl_ab"),
      F.sum(pb * F.log(pb / pa)).as("kl_ba"))
      .withColumn("n_a", F.lit(na))
      .withColumn("n_b", F.lit(nb))
      .withColumn("n_cells", F.lit(nCells))
  }
}
