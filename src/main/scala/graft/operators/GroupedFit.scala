package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Per-group distribution fitting in ONE aggregation pass — the
  * 100 TB-native complement to the driver-orchestrated fan-out.
  *
  * [[Fitter]] fits ~100 families to a FEW columns: cost flat in N,
  * linear in families, one broadcast context per fit. This operator
  * inverts the shape: fit the sufficient-statistic families to
  * MILLIONS of groups ("a latency distribution per customer", "a
  * doc-length model per domain") — a workload the fan-out cannot touch
  * (a driver loop over groups would launch one job per group) but that
  * collapses to a single codegen'd groupBy when every family's MLE
  * *and* maximized log-likelihood are exact functions of per-group
  * aggregates:
  *
  *   - norm:     loc = mean, scale = √var_pop; ll = −n/2·ln(2πσ²) − n/2
  *   - expon:    loc = min,  scale = mean−min; ll = −n·ln(scale) − n
  *   - uniform:  loc = min,  scale = max−min;  ll = −n·ln(scale)
  *   - lognorm:  s = √var_pop(ln x), scale = exp(mean(ln x)), loc = 0;
  *               ll = −n·mean(ln x) − n/2·ln(2π·s²) − n/2  (x > 0 only)
  *   - rayleigh: loc = 0, scale σ = √(Σx²/2n);
  *               ll = Σln x − n·ln(σ²) − n  (x > 0 only)
  *   - halfnorm: loc = 0, scale σ = √(Σx²/n);
  *               ll = n/2·ln(2/π) − n/2·ln(σ²) − n/2  (x ≥ 0)
  *   - pareto:   scale x_m = min, loc = 0, b = 1/(mean(ln x) − ln x_m);
  *               ll = n·ln b + n·b·ln x_m − (b+1)·Σln x  (x_m > 0,
  *               some x > x_m)
  *
  * Everything — params, AIC/BIC, best-by-AIC — is plain column
  * arithmetic over those aggregates: one shuffle on the group key,
  * zero driver involvement, zero per-group jobs. Parameters follow the
  * same scipy conventions as [[Fitter]] ([shape...], loc, scale), so a
  * per-group row composes with the dist_* SQL surface and the samplers
  * unchanged.
  */
object GroupedFit {

  val families: Seq[String] =
    Seq("norm", "expon", "uniform", "lognorm", "rayleigh", "halfnorm", "pareto")

  /** One row per (group, family) with parameters, loglik, aic, bic.
    * Groups where a family's MLE is undefined (zero variance, zero
    * range, non-positive values for lognorm, n < 2) omit that family's
    * row rather than emitting sentinels — per-group absence is the
    * honest signal at 10⁶ groups. */
  def fitByGroup(df: DataFrame, valueCol: String,
                 groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val v = F.col(valueCol).cast("double")
    val clean = df.where(v.isNotNull && !F.isnan(v))
      .select(groupCols.map(F.col) :+ v.as("__v"): _*)
    val x = F.col("__v")
    val lnx = F.when(x > 0.0, F.log(x))
    val agged = clean.groupBy(groupCols.map(F.col): _*).agg(
      F.count(F.lit(1)).as("n"),
      F.avg(x).as("m"),
      F.var_pop(x).as("s2"),
      F.min(x).as("mn"),
      F.max(x).as("mx"),
      F.avg(lnx).as("mln"),
      F.var_pop(lnx).as("s2ln"),
      F.sum(x * x).as("sxx"))
    finalizeContinuous(agged, groupCols)
  }

  /** The closed-form family algebra shared by [[fitByGroup]] and
    * [[fitFromPartials]]: expects a frame with one row per group
    * carrying (n, m, s2, mn, mx, mln, s2ln, sxx). */
  private def finalizeContinuous(agged: DataFrame,
                                 groupCols: Seq[String]): DataFrame = {
    val n = F.col("n").cast("double")
    val twoPi = 2.0 * math.Pi
    def fam(name: String, valid: Column, params: Column, k: Int,
            ll: Column): Column =
      F.when(valid, F.struct(
        F.lit(name).as("distribution"),
        params.as("parameters"),
        ll.as("loglik"),
        (F.lit(2.0 * k) - F.lit(2.0) * ll).as("aic"),
        (F.lit(k.toDouble) * F.log(n) - F.lit(2.0) * ll).as("bic")))
    val m = F.col("m"); val s2 = F.col("s2")
    val mn = F.col("mn"); val mx = F.col("mx")
    val mln = F.col("mln"); val s2ln = F.col("s2ln")
    val fams = F.array(
      fam("norm", F.col("n") >= 2 && s2 > 0.0,
        F.array(m, F.sqrt(s2)), 2,
        -n / 2.0 * F.log(F.lit(twoPi) * s2) - n / 2.0),
      fam("expon", F.col("n") >= 2 && m - mn > 0.0,
        F.array(mn, m - mn), 2,
        -n * F.log(m - mn) - n),
      fam("uniform", F.col("n") >= 2 && mx - mn > 0.0,
        F.array(mn, mx - mn), 2,
        -n * F.log(mx - mn)),
      // k = 2: loc is PINNED at 0 (scipy fit(floc=0) convention), so
      // only (s, scale) are estimated — charging 3 would bias the
      // best-by-AIC pick against lognorm by a flat 2 AIC
      fam("lognorm", F.col("n") >= 2 && mn > 0.0 && s2ln > 0.0,
        F.array(F.sqrt(s2ln), F.lit(0.0), F.exp(mln)), 2,
        -n * mln - n / 2.0 * F.log(F.lit(twoPi) * s2ln) - n / 2.0),
      // rayleigh, loc pinned 0 ⇒ k = 1: σ² = Σx²/2n makes Σx²/(2σ²) = n
      // exactly, so ll = Σln x − n·ln σ² − n
      fam("rayleigh", F.col("n") >= 2 && mn > 0.0,
        F.array(F.lit(0.0), F.sqrt(F.col("sxx") / (F.lit(2.0) * n))), 1,
        n * mln - n * F.log(F.col("sxx") / (F.lit(2.0) * n)) - n),
      // halfnorm, loc pinned 0 ⇒ k = 1: σ² = Σx²/n, Σx²/(2σ²) = n/2;
      // x = 0 is INSIDE the support (pdf(0) = √(2/π)/σ), unlike rayleigh
      fam("halfnorm", F.col("n") >= 2 && mn >= 0.0 && F.col("sxx") > 0.0,
        F.array(F.lit(0.0), F.sqrt(F.col("sxx") / n)), 1,
        n * F.lit(0.5 * math.log(2.0 / math.Pi)) -
          n / 2.0 * F.log(F.col("sxx") / n) - n / 2.0),
      // pareto with x_m pinned at the group min (the pareto MLE's own
      // scale estimate); b̂ = 1/(mean(ln x) − ln x_m). k = 2: like
      // uniform's data-derived support bounds, both b and x_m are
      // estimated from the group
      fam("pareto",
        F.col("n") >= 2 && mn > 0.0 && mln > F.log(mn),
        F.array(F.lit(1.0) / (mln - F.log(mn)), F.lit(0.0), mn), 2,
        n * F.log(F.lit(1.0) / (mln - F.log(mn))) +
          n * (F.lit(1.0) / (mln - F.log(mn))) * F.log(mn) -
          (F.lit(1.0) / (mln - F.log(mn)) + 1.0) * n * mln))
    agged
      .select(groupCols.map(F.col) :+ F.col("n") :+
        F.explode(F.filter(fams, _.isNotNull)).as("f"): _*)
      .select(groupCols.map(F.col) :+ F.col("n") :+
        F.col("f.distribution").as("distribution") :+
        F.col("f.parameters").as("parameters") :+
        F.col("f.loglik").as("loglik") :+
        F.col("f.aic").as("aic") :+ F.col("f.bic").as("bic"): _*)
  }

  /** Mergeable per-group fit state — the INCREMENTAL form of
    * [[fitByGroup]] for append-only corpora: compute partials per
    * batch/day/shard, persist the tiny (group, 8-sums) table, merge
    * any number of partial tables with [[mergeFitPartials]] (sums add,
    * min/max fold — no raw data is ever re-read), and finalize with
    * [[fitFromPartials]]. At 100 TB this is the difference between
    * re-scanning history nightly and scanning only the new day.
    *
    * @return one row per group: (groupCols..., pn, psx, psxx, pnln,
    *         pslnx, pslnx2, pmn, pmx) */
  def fitPartialsByGroup(df: DataFrame, valueCol: String,
                         groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val v = F.col(valueCol).cast("double")
    val clean = df.where(v.isNotNull && !F.isnan(v))
      .select(groupCols.map(F.col) :+ v.as("__v"): _*)
    val x = F.col("__v")
    val lnx = F.when(x > 0.0, F.log(x))
    clean.groupBy(groupCols.map(F.col): _*).agg(
      F.count(F.lit(1)).as("pn"),
      F.sum(x).as("psx"),
      F.sum(x * x).as("psxx"),
      F.count(lnx).as("pnln"),
      F.coalesce(F.sum(lnx), F.lit(0.0)).as("pslnx"),
      F.coalesce(F.sum(lnx * lnx), F.lit(0.0)).as("pslnx2"),
      F.min(x).as("pmn"),
      F.max(x).as("pmx"))
  }

  /** Merge any number of [[fitPartialsByGroup]] tables (pass their
    * UNION): sums add, counts add, min/min and max/max fold — the
    * associative merge that makes the partials a day-over-day artifact. */
  def mergeFitPartials(partials: DataFrame,
                       groupCols: Seq[String]): DataFrame =
    partials.groupBy(groupCols.map(F.col): _*).agg(
      F.sum("pn").as("pn"), F.sum("psx").as("psx"),
      F.sum("psxx").as("psxx"), F.sum("pnln").as("pnln"),
      F.sum("pslnx").as("pslnx"), F.sum("pslnx2").as("pslnx2"),
      F.min("pmn").as("pmn"), F.max("pmx").as("pmx"))

  /** Finalize merged partials into the [[fitByGroup]] output schema:
    * the same closed-form family algebra, with moments derived from
    * the raw sums (m = Σx/n, s² = Σx²/n − m², ln-moments over the
    * positive subset). Numerically this is the textbook moment form —
    * fine for the group scales the partials pattern targets; a single
    * astronomically-conditioned group belongs in [[fitByGroup]]'s
    * Welford-style one-shot path instead. */
  def fitFromPartials(partials: DataFrame,
                      groupCols: Seq[String]): DataFrame = {
    val pn = F.col("pn").cast("double")
    val pnln = F.col("pnln").cast("double")
    val m = F.col("psx") / pn
    val mln = F.when(F.col("pnln") > 0L, F.col("pslnx") / pnln)
    val agged = partials.select(groupCols.map(F.col) ++ Seq(
      F.col("pn").as("n"),
      m.as("m"),
      (F.col("psxx") / pn - m * m).as("s2"),
      F.col("pmn").as("mn"),
      F.col("pmx").as("mx"),
      mln.as("mln"),
      F.when(F.col("pnln") > 0L,
        F.col("pslnx2") / pnln - mln * mln).as("s2ln"),
      F.col("psxx").as("sxx")): _*)
    finalizeContinuous(agged, groupCols)
  }

  /** Discrete counterpart of [[fitByGroup]]: the sufficient-statistic
    * DISCRETE families, one aggregation pass per million groups.
    *
    *   - bernoulli (x ∈ {0,1}): p = mean;
    *     ll = n·(m·ln m + (1−m)·ln(1−m)),  0 < m < 1
    *   - geometric (integer x ≥ 1): p = 1/mean;
    *     ll = n·ln p + (Σx − n)·ln(1−p) = n·ln p + n·(m−1)·ln(1−p), m > 1
    *   - poisson (integer x ≥ 0): λ = mean;
    *     ll = n·λ·ln λ − n·λ − Σ ln(x!), where Σ ln(x!) = Σ lgamma(x+1)
    *     is a plain per-row aggregate (the one non-codegen'd term — a
    *     JVM lgamma call per row, same cost class as the hash functions
    *     the dedup path runs per row)
    *
    * Support checks are exact aggregates, not tolerances: bernoulli
    * needs Σx² = Σx (true iff every value is 0 or 1 — both exact
    * doubles); geometric and poisson need zero rows with x ≠ floor(x)
    * and min ≥ 1 (geometric) / min ≥ 0 (poisson).
    * Parameters are [p] / [λ] (scipy convention, loc pinned 0 ⇒ k = 1). */
  def fitDiscreteByGroup(df: DataFrame, valueCol: String,
                         groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val v = F.col(valueCol).cast("double")
    val clean = df.where(v.isNotNull && !F.isnan(v))
      .select(groupCols.map(F.col) :+ v.as("__v"): _*)
    val x = F.col("__v")
    val lgUdf = F.udf((v: Double) => graft.functions.SpecialMath.lgamma(v + 1.0))
    val agged = clean.groupBy(groupCols.map(F.col): _*).agg(
      F.count(F.lit(1)).as("n"),
      F.avg(x).as("m"),
      F.min(x).as("mn"),
      F.sum(x).as("sx"),
      F.sum(x * x).as("sxx"),
      F.sum(F.when(x =!= F.floor(x), 1L).otherwise(0L)).as("nonint"),
      F.sum(lgUdf(x)).as("slg"))
    finalizeDiscrete(agged, groupCols)
  }

  /** The discrete family algebra shared by [[fitDiscreteByGroup]] and
    * [[fitDiscreteFromPartials]]: expects one row per group with
    * (n, m, mn, sx, sxx, nonint, slg). */
  private def finalizeDiscrete(agged: DataFrame,
                               groupCols: Seq[String]): DataFrame = {
    val n = F.col("n").cast("double")
    val m = F.col("m")
    def fam(name: String, valid: Column, p: Column, ll: Column): Column =
      F.when(valid, F.struct(
        F.lit(name).as("distribution"),
        F.array(p).as("parameters"),
        ll.as("loglik"),
        (F.lit(2.0) - F.lit(2.0) * ll).as("aic"),
        (F.log(n) - F.lit(2.0) * ll).as("bic")))
    val fams = F.array(
      fam("bernoulli",
        F.col("n") >= 2 && F.col("sxx") === F.col("sx") && m > 0.0 && m < 1.0,
        m, n * (m * F.log(m) + (F.lit(1.0) - m) * F.log(F.lit(1.0) - m))),
      fam("geom",
        F.col("n") >= 2 && F.col("nonint") === 0L && F.col("mn") >= 1.0 && m > 1.0,
        F.lit(1.0) / m,
        n * F.log(F.lit(1.0) / m) +
          n * (m - 1.0) * F.log(F.lit(1.0) - F.lit(1.0) / m)),
      fam("poisson",
        F.col("n") >= 2 && F.col("nonint") === 0L && F.col("mn") >= 0.0 && m > 0.0,
        m,
        n * m * F.log(m) - n * m - F.col("slg")))
    agged
      .select(groupCols.map(F.col) :+ F.col("n") :+
        F.explode(F.filter(fams, _.isNotNull)).as("f"): _*)
      .select(groupCols.map(F.col) :+ F.col("n") :+
        F.col("f.distribution").as("distribution") :+
        F.col("f.parameters").as("parameters") :+
        F.col("f.loglik").as("loglik") :+
        F.col("f.aic").as("aic") :+ F.col("f.bic").as("bic"): _*)
  }

  /** Discrete counterpart of [[fitPartialsByGroup]]: mergeable per-group
    * state for the bernoulli/geom/poisson closed forms. */
  def fitDiscretePartialsByGroup(df: DataFrame, valueCol: String,
                                 groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val v = F.col(valueCol).cast("double")
    val clean = df.where(v.isNotNull && !F.isnan(v))
      .select(groupCols.map(F.col) :+ v.as("__v"): _*)
    val x = F.col("__v")
    val lgUdf = F.udf((v: Double) => graft.functions.SpecialMath.lgamma(v + 1.0))
    clean.groupBy(groupCols.map(F.col): _*).agg(
      F.count(F.lit(1)).as("pn"),
      F.sum(x).as("psx"),
      F.sum(x * x).as("psxx"),
      F.min(x).as("pmn"),
      F.sum(F.when(x =!= F.floor(x), 1L).otherwise(0L)).as("pnonint"),
      F.sum(lgUdf(x)).as("pslg"))
  }

  /** Merge unioned [[fitDiscretePartialsByGroup]] tables. */
  def mergeDiscreteFitPartials(partials: DataFrame,
                               groupCols: Seq[String]): DataFrame =
    partials.groupBy(groupCols.map(F.col): _*).agg(
      F.sum("pn").as("pn"), F.sum("psx").as("psx"),
      F.sum("psxx").as("psxx"), F.min("pmn").as("pmn"),
      F.sum("pnonint").as("pnonint"), F.sum("pslg").as("pslg"))

  /** Finalize merged discrete partials into the [[fitDiscreteByGroup]]
    * output schema. */
  def fitDiscreteFromPartials(partials: DataFrame,
                              groupCols: Seq[String]): DataFrame = {
    val pn = F.col("pn").cast("double")
    val agged = partials.select(groupCols.map(F.col) ++ Seq(
      F.col("pn").as("n"),
      (F.col("psx") / pn).as("m"),
      F.col("pmn").as("mn"),
      F.col("psx").as("sx"),
      F.col("psxx").as("sxx"),
      F.col("pnonint").as("nonint"),
      F.col("pslg").as("slg")): _*)
    finalizeDiscrete(agged, groupCols)
  }

  /** FREQUENCY-WEIGHTED [[fitByGroup]]: each row counts `weightCol`
    * times — the shape for pre-aggregated data ("value × occurrence
    * count" tables, importance-capped corpus mixes) where exploding the
    * weights back into rows would undo someone's aggregation. Every
    * sufficient statistic becomes a weighted sum (n ⇒ Σw, mean ⇒
    * Σwx/Σw, …) and the same seven closed forms apply verbatim, because
    * the weighted MLE of an exponential-family model IS the unweighted
    * MLE of the weight-replicated sample. `n` in the output is Σw (a
    * DOUBLE — fractional weights are allowed; AIC/BIC use it as the
    * effective sample size). Rows with w ≤ 0 or null are ignored.
    * Weighted variances use the Σwx²/Σw − m² form so an external engine
    * replays the exact arithmetic (the cancellation costs ~8 digits at
    * worst — fine for parameters read at 4–6 decimals; callers needing
    * ulp-tight σ on near-constant data should pre-center). */
  def fitByGroupWeighted(df: DataFrame, valueCol: String, weightCol: String,
                         groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val v = F.col(valueCol).cast("double")
    val wt = F.col(weightCol).cast("double")
    val clean = df.where(v.isNotNull && !F.isnan(v) &&
        wt.isNotNull && !F.isnan(wt) && wt > 0.0)
      .select(groupCols.map(F.col) :+ v.as("__v") :+ wt.as("__w"): _*)
    val x = F.col("__v"); val w0 = F.col("__w")
    val lnx = F.when(x > 0.0, F.log(x))
    val agged = clean.groupBy(groupCols.map(F.col): _*).agg(
      F.sum(w0).as("sw"),
      F.sum(w0 * x).as("swx"),
      F.sum(w0 * x * x).as("swxx"),
      F.min(x).as("mn"),
      F.max(x).as("mx"),
      F.sum(w0 * lnx).as("swln"),
      F.sum(w0 * lnx * lnx).as("swln2"))
    val n = F.col("sw")
    val m = F.col("swx") / n
    val s2 = F.col("swxx") / n - m * m
    val mln = F.col("swln") / n
    val s2ln = F.col("swln2") / n - mln * mln
    val mn = F.col("mn"); val mx = F.col("mx")
    val twoPi = 2.0 * math.Pi
    def fam(name: String, valid: Column, params: Column, k: Int,
            ll: Column): Column =
      F.when(valid, F.struct(
        F.lit(name).as("distribution"),
        params.as("parameters"),
        ll.as("loglik"),
        (F.lit(2.0 * k) - F.lit(2.0) * ll).as("aic"),
        (F.lit(k.toDouble) * F.log(n) - F.lit(2.0) * ll).as("bic")))
    val fams = F.array(
      fam("norm", n >= 2.0 && s2 > 0.0,
        F.array(m, F.sqrt(s2)), 2,
        -n / 2.0 * F.log(F.lit(twoPi) * s2) - n / 2.0),
      fam("expon", n >= 2.0 && m - mn > 0.0,
        F.array(mn, m - mn), 2,
        -n * F.log(m - mn) - n),
      fam("uniform", n >= 2.0 && mx - mn > 0.0,
        F.array(mn, mx - mn), 2,
        -n * F.log(mx - mn)),
      fam("lognorm", n >= 2.0 && mn > 0.0 && s2ln > 0.0,
        F.array(F.sqrt(s2ln), F.lit(0.0), F.exp(mln)), 2,
        -n * mln - n / 2.0 * F.log(F.lit(twoPi) * s2ln) - n / 2.0),
      fam("rayleigh", n >= 2.0 && mn > 0.0,
        F.array(F.lit(0.0), F.sqrt(F.col("swxx") / (F.lit(2.0) * n))), 1,
        n * mln - n * F.log(F.col("swxx") / (F.lit(2.0) * n)) - n),
      fam("halfnorm", n >= 2.0 && mn >= 0.0 && F.col("swxx") > 0.0,
        F.array(F.lit(0.0), F.sqrt(F.col("swxx") / n)), 1,
        n * F.lit(0.5 * math.log(2.0 / math.Pi)) -
          n / 2.0 * F.log(F.col("swxx") / n) - n / 2.0),
      fam("pareto", n >= 2.0 && mn > 0.0 && mln > F.log(mn),
        F.array(F.lit(1.0) / (mln - F.log(mn)), F.lit(0.0), mn), 2,
        n * F.log(F.lit(1.0) / (mln - F.log(mn))) +
          n * (F.lit(1.0) / (mln - F.log(mn))) * F.log(mn) -
          (F.lit(1.0) / (mln - F.log(mn)) + 1.0) * n * mln))
    agged
      .select(groupCols.map(F.col) :+ F.col("sw").as("n") :+
        F.explode(F.filter(fams, _.isNotNull)).as("f"): _*)
      .select(groupCols.map(F.col) :+ F.col("n") :+
        F.col("f.distribution").as("distribution") :+
        F.col("f.parameters").as("parameters") :+
        F.col("f.loglik").as("loglik") :+
        F.col("f.aic").as("aic") :+ F.col("f.bic").as("bic"): _*)
  }

  /** Best family per group from an ALREADY-COMPUTED [[fitByGroup]]
    * frame (aic default; ties break on the family name). One parallel
    * window over the group partitioning — no global sort, no driver,
    * and no re-aggregation: callers wanting both the fits and the best
    * pick (the headline use) pay for one pass. */
  def bestFrom(fits: DataFrame, groupCols: Seq[String],
               metric: String = "aic"): DataFrame = {
    require(Set("aic", "bic", "loglik")(metric), s"unknown metric $metric")
    val ord = if (metric == "loglik") F.col(metric).desc else F.col(metric).asc
    val w = Window.partitionBy(groupCols.map(F.col): _*)
      .orderBy(ord, F.col("distribution").asc)
    fits.withColumn("__rk", F.row_number().over(w))
      .where(F.col("__rk") === 1).drop("__rk")
  }

  /** [[bestFrom]] over a fresh [[fitByGroup]] pass. */
  def bestByGroup(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  metric: String = "aic"): DataFrame =
    bestFrom(fitByGroup(df, valueCol, groupCols), groupCols, metric)

  /** Per-group goodness of fit: the exact one-sample K-S distance of
    * every (group, family) row in `fits` against that group's empirical
    * CDF, plus the asymptotic significance — the answer to "the AIC
    * winner per customer: is it actually a GOOD fit?" that the
    * single-column path gives via M7 and [[fitByGroup]] alone cannot.
    *
    * Construction (exact-rank, hash-replayable): per-group DISTINCT
    * value counts first (one groupBy — the family join then multiplies
    * only distinct values, never raw rows), join the per-group fit rows
    * (co-partitioned on the group key), model CDF per row through the
    * same [[graft.functions.DistScalar]] scalar the SQL surface uses
    * (any registered family works, custom conventions included), then
    * D = max(|F̂(x) − F(x)|, |F̂(x⁻) − F(x)|) via a per-(group, family)
    * running sum — a window PARTITIONED by (group, family), so state
    * per partition is one group's distinct values: the 10⁶-small-groups
    * regime this operator targets. `ks_p` is the asymptotic Kolmogorov
    * tail at √n·D (the M7/M8 series, valid for the n ≫ 35 monitoring
    * regime), computed in column arithmetic so an external engine can
    * replay it term by term.
    *
    * The same pass also yields the per-group Anderson–Darling A² (M9's
    * per-group analog — tail-sensitive where K-S is median-sensitive):
    * A² = −n − (1/n)·Σᵢ (2i−1)[ln F(x₍ᵢ₎) + ln(1−F(x₍ₙ₊₁₋ᵢ₎))]
    * collapses over each DISTINCT value's tie block to exact integer
    * weights w₁ = c·(2·cum − c) on ln F and w₂ = c·(2(n−cum) + c) on
    * ln(1−F) — order-invariant within ties, so the running sum that
    * already exists for K-S computes A² with two extra column products.
    * F is clamped to [ε, 1−ε] (ε = 1e-10), the M9 convention.
    *
    * @param fits output of [[fitByGroup]]/[[fitDiscreteByGroup]] (or a
    *             filtered subset, e.g. [[bestFrom]] winners)
    * @return one row per (group, distribution): ks_d, n, ks_p, ad_a2 */
  def gofByGroup(df: DataFrame, valueCol: String, groupCols: Seq[String],
                 fits: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    require(groupCols.nonEmpty, "need at least one group column")
    val v = F.col(valueCol).cast("double")
    val clean = df.where(v.isNotNull && !F.isnan(v))
      .select(groupCols.map(F.col) :+ v.as("__v"): _*)
    val vc = clean.groupBy((groupCols :+ "__v").map(F.col): _*)
      .agg(F.count(F.lit(1)).as("__c"))
    val famRows = fits.select(
      (groupCols.map(F.col) :+ F.col("distribution") :+
        F.col("parameters") :+ F.col("n")): _*)
    val joined = vc.join(famRows, groupCols)
    val cdfCol = ColumnBridge.column(graft.functions.DistScalar.build("cdf",
      Seq(ColumnBridge.expression(F.col("distribution")),
        ColumnBridge.expression(F.col("parameters")),
        ColumnBridge.expression(F.col("__v"))),
      Map.empty, Map.empty))
    val w = Window
      .partitionBy((groupCols :+ "distribution").map(F.col): _*)
      .orderBy(F.col("__v"))
    val nD = F.col("n").cast("double")
    val eps = graft.functions.Metrics.Eps
    val scored = joined
      .withColumn("__cum", F.sum(F.col("__c")).over(w))
      .withColumn("__cdf", cdfCol)
      .withColumn("__d", F.greatest(
        F.abs(F.col("__cum") / nD - F.col("__cdf")),
        F.abs((F.col("__cum") - F.col("__c")) / nD - F.col("__cdf"))))
    val fc = F.least(F.lit(1.0 - eps), F.greatest(F.lit(eps), F.col("__cdf")))
    val cD = F.col("__c").cast("double")
    val adTerm =
      cD * (F.lit(2.0) * F.col("__cum") - cD) * F.log(fc) +
        cD * (F.lit(2.0) * (nD - F.col("__cum")) + cD) *
          F.log(F.lit(1.0) - fc)
    // a null model CDF at ANY value (DistScalar nulls unknown families,
    // bad params, and non-finite results) voids the whole (group, family)
    // row: a max/sum over the surviving points would report a finite,
    // plausible-looking statistic for a fit M9's driver-side metrics
    // would call +inf — null is the honest per-group signal
    val badCdf = F.sum(F.when(F.col("__cdf").isNull, 1L).otherwise(0L))
    val agg = scored
      .groupBy((groupCols :+ "distribution").map(F.col): _*)
      .agg(
        F.when(badCdf === 0L, F.max(F.col("__d"))).as("ks_d"),
        F.first(F.col("n")).as("n"),
        F.when(badCdf === 0L,
          -F.first(F.col("n")).cast("double") -
            F.sum(adTerm) / F.first(F.col("n")).cast("double")).as("ad_a2"))
    val t = F.sqrt(F.col("n").cast("double")) * F.col("ks_d")
    val series = F.aggregate(F.sequence(F.lit(1), F.lit(100)), F.lit(0.0),
      (acc, j) => acc + F.lit(2.0) * F.pow(F.lit(-1.0), j + 1) *
        F.exp(F.lit(-2.0) * j * j * t * t))
    // greatest/least SKIP nulls, so a voided ks_d must null ks_p
    // explicitly rather than clamp to 0
    agg.withColumn("ks_p",
      F.when(F.col("ks_d").isNotNull,
        F.least(F.lit(1.0), F.greatest(F.lit(0.0), series))))
  }

  /** Discrete counterpart of [[gofByGroup]] — M8's rank-only one-sample
    * K-S per (group, family) for [[fitDiscreteByGroup]] rows:
    * D = max over distinct k of max(F̂(k) − F(k), F(k) − F̂(k⁻)), the
    * exact construction `Metrics.ksDiscrete` runs driver-side, evaluated
    * as the same distinct-value window as the continuous path. The model
    * CDF comes from the discrete registry via one JVM call per
    * (group, family, distinct k) — bounded by the support size, the
    * discrete regime's defining property, and the reason a UDF is
    * acceptable here where the continuous path uses the native
    * DistScalar. A null/non-finite CDF anywhere voids the row (same
    * honesty contract as [[gofByGroup]]). `ks_p` is the asymptotic
    * Kolmogorov tail — conservative for discrete data, exactly as M8
    * documents.
    *
    * @return one row per (group, distribution): ks_d, n, ks_p */
  def gofDiscreteByGroup(df: DataFrame, valueCol: String,
                         groupCols: Seq[String], fits: DataFrame): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val v = F.col(valueCol).cast("double")
    val clean = df.where(v.isNotNull && !F.isnan(v))
      .select(groupCols.map(F.col) :+ v.as("__v"): _*)
    val vc = clean.groupBy((groupCols :+ "__v").map(F.col): _*)
      .agg(F.count(F.lit(1)).as("__c"))
    val famRows = fits.select(
      (groupCols.map(F.col) :+ F.col("distribution") :+
        F.col("parameters") :+ F.col("n")): _*)
    val cdfUdf = F.udf((name: String, params: Seq[Double], x: Double) =>
      graft.dists.DiscreteRegistry.get(name).flatMap { d =>
        val c = d.cdf(math.floor(x).toLong, params.toArray)
        if (java.lang.Double.isFinite(c)) Some(c) else None
      })
    val w = Window
      .partitionBy((groupCols :+ "distribution").map(F.col): _*)
      .orderBy(F.col("__v"))
    val nD = F.col("n").cast("double")
    val scored = vc.join(famRows, groupCols)
      .withColumn("__cum", F.sum(F.col("__c")).over(w))
      .withColumn("__cdf",
        cdfUdf(F.col("distribution"), F.col("parameters"), F.col("__v")))
      .withColumn("__d", F.greatest(
        F.abs(F.col("__cum") / nD - F.col("__cdf")),
        F.abs((F.col("__cum") - F.col("__c")) / nD - F.col("__cdf"))))
    val badCdf = F.sum(F.when(F.col("__cdf").isNull, 1L).otherwise(0L))
    val agg = scored
      .groupBy((groupCols :+ "distribution").map(F.col): _*)
      .agg(F.when(badCdf === 0L, F.max(F.col("__d"))).as("ks_d"),
        F.first(F.col("n")).as("n"))
    val t = F.sqrt(F.col("n").cast("double")) * F.col("ks_d")
    val series = F.aggregate(F.sequence(F.lit(1), F.lit(100)), F.lit(0.0),
      (acc, j) => acc + F.lit(2.0) * F.pow(F.lit(-1.0), j + 1) *
        F.exp(F.lit(-2.0) * j * j * t * t))
    agg.withColumn("ks_p",
      F.when(F.col("ks_d").isNotNull,
        F.least(F.lit(1.0), F.greatest(F.lit(0.0), series))))
  }

  /** Sketch-probe form of [[gofByGroup]] — the scale path when SINGLE
    * groups outgrow a partition-local sort (the exact form windows each
    * group's distinct values inside one partition; a group with 10⁹
    * distinct values breaks that). ONE
    * [[Sketches.kllByGroup]] aggregation builds a ~3 KB KLL artifact per
    * group; D̂ per (group, family) is then the max |rank − cdf| probed
    * at BOTH the sketch's and the model's quantile grids (the
    * [[Drift.ksFromSketches]] discipline), with error bounded by the
    * KLL rank guarantee (~1.65/√k per side at 99%) plus the grid pitch
    * 1/probes. Families resolve from the continuous registry (custom
    * conventions via [[graft.dists.DistRegistry.register]]); unknown
    * names yield null D̂ rather than an exception.
    *
    * @return one row per (group, distribution): ks_d_est, n */
  def gofByGroupSketch(df: DataFrame, valueCol: String,
                       groupCols: Seq[String], fits: DataFrame,
                       k: Int = 800, probes: Int = 200): DataFrame = {
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    require(groupCols.nonEmpty, "need at least one group column")
    val sketches = Sketches.kllByGroup(df, valueCol, groupCols, k)
    val famRows = fits.select(
      (groupCols.map(F.col) :+ F.col("distribution") :+
        F.col("parameters")): _*)
    val nProbes = probes
    val probeUdf = F.udf((name: String, params: Seq[Double],
                          bytes: Array[Byte]) =>
      graft.dists.DistRegistry.get(name).flatMap { dist =>
        val pa = params.toArray
        if (pa.length != dist.numParams || dist.scale(pa) <= 0.0) None
        else {
          val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
          if (sk.isEmpty) None
          else {
            val model = graft.dists.FrozenDist(dist, pa)
            var best = 0.0
            var i = 0
            while (i <= nProbes) {
              val q = i.toDouble / nProbes
              // sketch-grid probe: where the DATA has mass
              val xs = sk.getQuantile(q)
              val ds = math.abs(sk.getRank(xs) - model.cdf(xs))
              if (ds > best) best = ds
              // model-grid probe: where the MODEL has mass — catches a
              // gap the data grid skips over (heavy model tail, say)
              if (q > 0.0 && q < 1.0) {
                val xm = model.ppf(q)
                if (java.lang.Double.isFinite(xm)) {
                  val dm = math.abs(sk.getRank(xm) - model.cdf(xm))
                  if (dm > best) best = dm
                }
              }
              i += 1
            }
            Some(best)
          }
        }
      })
    sketches.join(famRows, groupCols)
      .select(groupCols.map(F.col) :+ F.col("distribution") :+
        probeUdf(F.col("distribution"), F.col("parameters"), F.col("kll"))
          .as("ks_d_est") :+ F.col("n"): _*)
  }
}
