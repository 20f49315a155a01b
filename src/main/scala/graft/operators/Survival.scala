package graft.operators

import org.apache.spark.sql.{DataFrame, Column, functions => F}
import org.apache.spark.sql.expressions.Window

/** Nonparametric survival analysis — the Kaplan–Meier product-limit
  * estimator, per group, with Greenwood standard errors and median
  * survival times. The distribution-free companion to the parametric
  * censored-MLE path (reference: spark-bestfit's censored fitting,
  * `src/spark_bestfit/fitting.py` censored branch): the same
  * (duration, event-observed) data model, answering "what does the
  * survival curve actually look like" before any family is assumed —
  * churn/retention curves, time-to-failure, job-completion tails.
  *
  * Scale shape: ONE (group, time) aggregation reduces the data to
  * per-distinct-time event/censor counts (map-side combined, the
  * exchange carries ≤ groups·times rows), then at-risk counts, the
  * product-limit survival, and the Greenwood variance all ride windows
  * PARTITIONED BY GROUP over that tiny cells frame — no global window,
  * no driver loop; a million groups fit one pass. The product is
  * computed as exp(Σ ln(1 − d/n)) — the one ln/exp pair an external SQL
  * engine replays identically (absorbed by 6-decimal rounding).
  */
object Survival {

  /** Kaplan–Meier curve per group: for each distinct duration t (in
    * ascending order within a group),
    *
    *   n_risk(t)  = #{duration ≥ t},
    *   S(t)       = Π_{t' ≤ t} (1 − d(t')/n_risk(t')),
    *   Var(S(t))  = S(t)² · Σ_{t' ≤ t} d/(n·(n−d))   (Greenwood),
    *
    * where d = events at t (censored rows count in n_risk but not d —
    * the standard right-censoring convention: a row with event = false
    * is known to survive PAST its duration). The final time of a group
    * can exhaust the risk set (d = n_risk → S = 0); there the Greenwood
    * variance is undefined and `std_err` is null.
    *
    * @param durationCol non-negative numeric time-to-event/censoring
    * @param eventCol    boolean-ish: true/nonzero = event observed,
    *                    false/0 = right-censored
    * @return one row per (group, t): (groupCols..., t, n_risk, n_event,
    *         n_censored, survival, std_err), survival/std_err rounded
    *         to 6 decimals */
  def kmByGroup(df: DataFrame, durationCol: String, eventCol: String,
                groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(!groupCols.exists(_.startsWith("__")),
      "group columns must not use the __ internal prefix")
    val gCols = groupCols.map(F.col)
    val cells = df
      .select(gCols :+
        F.col(durationCol).cast("double").as("__t") :+
        F.col(eventCol).cast("boolean").as("__e"): _*)
      .where(F.col("__t").isNotNull && !F.isnan(F.col("__t")) &&
        F.col("__t") >= 0.0 && F.col("__e").isNotNull)
      .groupBy(gCols :+ F.col("__t"): _*)
      .agg(F.sum(F.when(F.col("__e"), 1L).otherwise(0L)).as("__d"),
        F.count(F.lit(1)).as("__c"))
    val wg = Window.partitionBy(gCols: _*)
    val wOrd = wg.orderBy("__t")
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val nRisk = F.sum("__c").over(wg) -
      F.coalesce(F.sum("__c").over(wPrev), F.lit(0L))
    val withRisk = cells.withColumn("__nr", nRisk)
    val dOverN = F.col("__d").cast("double") / F.col("__nr")
    // d = n_risk only at a group's final time (later rows would be in
    // the risk set) — guard the ln there; the running sums never see a
    // non-finite term because that row IS the end of its frame
    val lnTerm = F.when(F.col("__d") === F.col("__nr"), F.lit(0.0))
      .otherwise(F.log(F.lit(1.0) - dOverN))
    val gwTerm = F.when(F.col("__d") === F.col("__nr"), F.lit(0.0))
      .otherwise(F.col("__d").cast("double") /
        (F.col("__nr") * (F.col("__nr") - F.col("__d"))))
    val surv = F.when(F.col("__d") === F.col("__nr"), F.lit(0.0))
      .otherwise(F.exp(F.sum(lnTerm).over(wCum)))
    val stdErr = F.when(F.col("__d") === F.col("__nr"),
        F.lit(null).cast("double"))
      .otherwise(F.round(
        F.col("__surv") * F.sqrt(F.sum(gwTerm).over(wCum)), 6))
    withRisk
      .withColumn("__surv", surv)
      .select(gCols ++ Seq(
        F.col("__t").as("t"),
        F.col("__nr").as("n_risk"),
        F.col("__d").as("n_event"),
        (F.col("__c") - F.col("__d")).as("n_censored"),
        F.round(F.col("__surv"), 6).as("survival"),
        stdErr.as("std_err")): _*)
  }

  /** Median survival per group: the smallest t with S(t) ≤ ½ (null when
    * the curve never reaches it — heavy censoring), plus the group's
    * subject count and final survival level. One [[kmByGroup]] pass and
    * a per-group fold over the tiny curve frame.
    *
    * @return one row per group: (groupCols..., median_t, n, final_survival) */
  def medianSurvival(df: DataFrame, durationCol: String, eventCol: String,
                     groupCols: Seq[String]): DataFrame = {
    val km = kmByGroup(df, durationCol, eventCol, groupCols)
    val gCols = groupCols.map(F.col)
    km.groupBy(gCols: _*).agg(
      F.min(F.when(F.col("survival") <= 0.5, F.col("t"))).as("median_t"),
      (F.sum("n_event") + F.sum("n_censored")).as("n"),
      F.max_by(F.col("survival"), F.col("t")).as("final_survival"))
  }
}
