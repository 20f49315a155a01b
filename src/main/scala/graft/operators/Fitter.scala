package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession, functions => F}
import graft.dists._
import graft.functions.{Metrics, SpecialMath => SM}

/** One row of the results table — the reference's 19-column flat schema
  * with JVM-native doubles (reference: src/spark_bestfit/estimation.py:
  * 51-76, FIT_RESULT_SCHEMA; flat columns replaced a MapType in v2.0 for
  * ~20% perf, which we keep). */
final case class FitResult(
    column_name: String,
    distribution: String,
    parameters: Array[Double],
    sse: Double,
    aic: Double,
    bic: Double,
    ks_statistic: Option[Double],
    pvalue: Option[Double],
    ad_statistic: Option[Double],
    ad_pvalue: Option[Double],
    data_min: Double,
    data_max: Double,
    data_mean: Double,
    data_stddev: Double,
    data_count: Double,
    data_kurtosis: Double,
    data_skewness: Double,
    lower_bound: Option[Double],
    upper_bound: Option[Double],
    fit_seconds: Double = 0.0)

/** Fit configuration (reference: src/spark_bestfit/config.py:35-427). */
final case class FitConfig(
    bins: Int = 50,
    useRiceRule: Boolean = false,
    supportAtZeroOnly: Boolean = false,
    fittingSampleSize: Int = 10000,
    sampleSeed: Long = 42L,
    lazyMetrics: Boolean = false,
    estimationMethod: String = "mle", // mle | mse | auto
    lowerBound: Option[Double] = None,
    upperBound: Option[Double] = None,
    // per-column overrides for multi-column bounded fits (reference:
    // config.py lower_bound/upper_bound scalar-or-dict); a column absent
    // here falls back to the scalar bound above
    lowerBounds: Map[String, Double] = Map.empty,
    upperBounds: Map[String, Double] = Map.empty,
    // explicit histogram bin edges (reference: config.py bins tuple
    // form) — non-uniform widths allowed, values outside [head, last]
    // are excluded from the histogram; overrides bins/useRiceRule
    binEdges: Option[Seq[Double]] = None,
    prefilter: Option[String] = None, // None | "standard" | "aggressive"
    maxDistributions: Int = Int.MaxValue,
    numPartitions: Option[Int] = None,
    censoringColumn: Option[String] = None,
    // adaptive pre-fit sampling policy (reference: base_fitter.py:243-477)
    samplingStrategy: String = "auto", // auto | uniform | stratified | none
    sampleThresholdRows: Long = 10000000L,
    sampleCapRows: Long = 1000000L,
    sampleFraction: Double = 0.35,
    pilotRows: Long = 100000L,
    // mild threshold SELECTS stratified sampling, the high threshold
    // escalates it to 10 strata (reference: base_fitter.py:291-301,
    // 367-387 — skew_threshold_mild=0.5 / skew_threshold_high=2.0)
    skewThresholdMild: Double = 0.5,
    skewThresholdForStratified: Double = 2.0)

/** Everything a fit task needs, broadcast once per column: ~8 KB histogram
  * + ~80 KB sample (reference: backends/spark.py:143-147; executor
  * overhead stays < 2 MB per task regardless of data size,
  * docs/performance.rst:94-116). */
final case class FitContext(
    columnName: String,
    hist: Hist,
    sample: Array[Double],
    stats: DataStats,
    censoring: Option[Array[Boolean]]) extends Serializable

final case class DataStats(
    min: Double, max: Double, mean: Double, stddev: Double,
    count: Double, kurtosis: Double, skewness: Double) extends Serializable

object DataStats {
  /** Stats of the fitting sample (np conventions: population std, Fisher
    * excess kurtosis; reference: estimation.py:81-102). */
  def of(xs: Array[Double]): DataStats = {
    val (n, mean, std, skew, kurt, mn, mx) = SM.moments(xs)
    DataStats(mn, mx, mean, std, n.toDouble, kurt, skew)
  }
}

object Fitter {

  /** Sentinel row for failed fits — never crash the job
    * (reference: estimation.py:739-772). */
  def failed(distName: String, columnName: String, st: DataStats,
             lb: Option[Double], ub: Option[Double]): FitResult =
    FitResult(columnName, distName, Array(Double.NaN),
      Double.PositiveInfinity, Double.PositiveInfinity, Double.PositiveInfinity,
      Some(Double.PositiveInfinity), Some(0.0), Some(Double.PositiveInfinity), None,
      st.min, st.max, st.mean, st.stddev, st.count, st.kurtosis, st.skewness, lb, ub)

  /** The per-distribution fit kernel (reference: estimation.py:583-736).
    * Runs inside the executor-side map; must never throw.
    *
    * `custom` is the broadcast snapshot of runtime-registered families —
    * on a real cluster the driver's `DistRegistry.register` is invisible
    * to executor JVMs, so custom names MUST resolve from this map first
    * (reference ships custom dists in the broadcast the same way,
    * estimation.py:496-528, 637-641). */
  def fitOne(distName: String, ctx: FitContext, cfg: FitConfig,
             custom: Map[String, ContinuousDist] = Map.empty): FitResult = {
    val t0 = System.nanoTime()
    val r = fitOneImpl(distName, ctx, cfg, custom)
    val dt = (System.nanoTime() - t0) / 1e9
    if (dt > 2.0)
      System.err.println(f"SLOW FIT: $distName%-18s ${ctx.columnName}%-18s $dt%7.2f s")
    // per-family wall time rides on the row so stragglers are diagnosable
    // from the results table alone (no log scraping) — at 1000 executors
    // this is the only practical way to see which family ate the stage
    r.copy(fit_seconds = dt)
  }

  private def fitOneImpl(distName: String, ctx: FitContext, cfg: FitConfig,
                         custom: Map[String, ContinuousDist]): FitResult = {
    val st = ctx.stats
    // per-column bound overrides win over the scalar config bounds
    val lb = cfg.lowerBounds.get(ctx.columnName).orElse(cfg.lowerBound)
    val ub = cfg.upperBounds.get(ctx.columnName).orElse(cfg.upperBound)
    try {
      val dist = custom.get(distName).orElse(DistRegistry.get(distName)).getOrElse(
        return failed(distName, ctx.columnName, st, lb, ub))

      val params: Array[Double] = ctx.censoring match {
        case Some(censor) =>
          try Estimators.fitCensoredMle(dist, ctx.sample, censor)
          catch { case _: Throwable =>
            dist.fit(ctx.sample.zip(censor).filter(_._2).map(_._1))
          }
        case None => cfg.estimationMethod match {
          case "mse" =>
            try Estimators.fitMse(dist, ctx.sample)
            catch { case _: Throwable => dist.fit(ctx.sample) }
          case _ => dist.fit(ctx.sample)
        }
      }
      if (params.exists(p => !java.lang.Double.isFinite(p)))
        return failed(distName, ctx.columnName, st, lb, ub)

      val frozen = FrozenModel(dist, params, lb, ub)

      val sse = Metrics.sseContinuous(frozen, ctx.hist.density, ctx.hist.edges)
      if (!java.lang.Double.isFinite(sse))
        return failed(distName, ctx.columnName, st, lb, ub)

      val (aic, bic) = Metrics.informationCriteria(frozen, params.length, ctx.sample)

      val (ks, pv, ad, adP) =
        if (cfg.lazyMetrics || ctx.censoring.isDefined) (None, None, None, None)
        else {
          val (k, p) = Metrics.ksStatistic(frozen, ctx.sample)
          val a = Metrics.adStatistic(frozen, ctx.sample)
          val ap = if (lb.isEmpty && ub.isEmpty)
            Metrics.adPValue(dist, ctx.sample) else None
          (Some(k), Some(p), Some(a), ap)
        }

      FitResult(ctx.columnName, distName, params, sse, aic, bic,
        ks, pv, ad, adP,
        st.min, st.max, st.mean, st.stddev, st.count, st.kurtosis, st.skewness,
        lb, ub)
    } catch {
      case _: Throwable => failed(distName, ctx.columnName, st, lb, ub)
    }
  }

  /** Partition count: min(effective, 2·cores) with slow families weighted
    * 3× (reference: base_fitter.py:524-544, backends/spark.py:309-328). */
  def partitionCount(spark: SparkSession, distNames: Seq[String], requested: Option[Int]): Int = {
    requested.getOrElse {
      val nSlow = distNames.count(DistRegistry.slowDistributions)
      val effective = distNames.length + 2 * nSlow
      val cores = spark.sparkContext.defaultParallelism
      math.max(1, math.min(effective, 2 * cores))
    }
  }

  /** Anti-straggler interleaving: spread slow families evenly through the
    * name list so no partition holds several of them
    * (reference: core.py:31-67). */
  def interleave(names: Seq[String]): Seq[String] = {
    val (slow, fast) = names.partition(DistRegistry.slowDistributions)
    if (slow.isEmpty || fast.isEmpty) return names
    val stride = math.max(1, (slow.length + fast.length) / slow.length)
    val out = new scala.collection.mutable.ArrayBuffer[String](names.length)
    val fi = fast.iterator; val si = slow.iterator
    var i = 0
    while (fi.hasNext || si.hasNext) {
      if (i % stride == 0 && si.hasNext) out += si.next()
      else if (fi.hasNext) out += fi.next()
      else if (si.hasNext) out += si.next()
      i += 1
    }
    out.toSeq
  }

  /** Prefilter: drop intrinsically positive-skew families on clearly
    * negative-skew samples; 'aggressive' also drops uniform on
    * high-kurtosis samples; restore all if everything got filtered
    * (reference: continuous_fitter.py:966-1063). */
  def prefilter(names: Seq[String], stats: DataStats, mode: Option[String]): Seq[String] = {
    if (mode.isEmpty) return names
    var out = names
    if (stats.skewness < -1.0)
      out = out.filterNot(DistRegistry.positiveSkewOnly)
    if (mode.contains("aggressive") && stats.kurtosis > 10.0)
      out = out.filterNot(_ == "uniform")
    if (out.isEmpty) names else out
  }

  /** Collect the fitting sample for one column: ≤ sampleSize rows, NaN/null
    * filtered, deterministic seed; exact-size driver downsample when the
    * pre-sample overshoots (reference: base_fitter.py:681-700,
    * estimation.py:946-967). */
  def fittingSample(df: DataFrame, column: String, sampleSize: Int, seed: Long,
                    totalCount: Option[Long] = None): Array[Double] = {
    val c = F.col(column).cast("double")
    val valid = df.select(c.as("x")).where(validValue(F.col("x")))
    val n = totalCount.getOrElse(valid.count())
    val collected: Array[Double] =
      if (n <= sampleSize) {
        valid.collect().map(_.getDouble(0))
      } else {
        // oversample slightly so the post-filter size still reaches target
        val fraction = math.min(1.0, sampleSize * 1.2 / n)
        val arr = valid.sample(withReplacement = false, fraction, seed)
          .limit(sampleSize * 2).collect().map(_.getDouble(0))
        arr
      }
    if (collected.length <= sampleSize) collected
    else exactResample(collected, sampleSize, seed)
  }

  /** Finite-value predicate: NaN AND ±Inf are invalid, like the
    * reference's `data[np.isfinite(data)]` (estimation.py:146) — an inf
    * would otherwise blow up min/max and give every histogram an
    * infinite range. */
  private def validValue(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.isNotNull && !F.isnan(c) &&
      c =!= Double.PositiveInfinity && c =!= Double.NegativeInfinity

  /** NaN/±Inf → null so aggregates and samples see only finite values. */
  private def finiteOrNull(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    F.when(validValue(c), c).otherwise(F.lit(null))

  /** Empty results with the full fit schema — the reference's contract
    * for a column with no valid data (tests/test_numerical_stability.py:
    * 105-116): queries over the collection work, `best()` returns zero
    * rows, nothing throws. */
  private def emptyResults(spark: SparkSession, cfg: FitConfig): FitResults = {
    import spark.implicits._
    new FitResults(spark.emptyDataset[FitResult].toDF(), Map.empty, cfg)
  }

  /** Exact-size downsample without replacement via seeded Fisher-Yates
    * (reference: estimation.py:946-967). Delegates to the shared kernel
    * in [[graft.dists.ContinuousDist.seededSubsample]] so there is ONE
    * implementation of the sampling discipline. */
  def exactResample(xs: Array[Double], n: Int, seed: Long): Array[Double] =
    graft.dists.ContinuousDist.seededSubsample(xs, n, seed)

  /** Same seeded Fisher-Yates, over whole rows, so paired columns (e.g.
    * value + censor flag) stay aligned through the downsample. */
  def exactResampleRows(xs: Array[org.apache.spark.sql.Row], n: Int,
                        seed: Long): Array[org.apache.spark.sql.Row] =
    exactResampleG(xs, n, seed)

  private def exactResampleG[T: scala.reflect.ClassTag](
      xs: Array[T], n: Int, seed: Long): Array[T] = {
    val rng = new java.util.Random(seed)
    val a = xs.clone()
    var i = 0
    while (i < n) {
      val j = i + rng.nextInt(a.length - i)
      val t = a(i); a(i) = a(j); a(j) = t
      i += 1
    }
    a.slice(0, n)
  }

  /** Fit all requested continuous families to one or more numeric columns.
    *
    * Pipeline per column (reference lifecycle, SURVEY.md §3.1): distributed
    * histogram + 10K sample collect → driver stats/prefilter/interleave →
    * broadcast FitContext → `Dataset[String].map(fitOne)` fan-out (a plain
    * JVM closure — the reference's Arrow/pandas-UDF hop does not exist
    * here) → union → cache.
    */
  def fit(spark: SparkSession, df: DataFrame, columns: Seq[String],
          distributions: Option[Seq[String]] = None,
          cfg: FitConfig = FitConfig()): FitResults = {
    import spark.implicits._
    require(columns.nonEmpty, "at least one column required")
    val schema = df.schema
    columns.foreach { c =>
      val fld = schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"column '$c' not found"))
      require(fld.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"column '$c' is not numeric: ${fld.dataType}")
    }

    // unknown names flow through to fitOne and come back as sentinel rows,
    // matching the reference's never-crash UDF behavior
    val baseNames = distributions.getOrElse(DistRegistry.defaultNames)
    val supportFiltered =
      if (cfg.supportAtZeroOnly) baseNames.filter(DistRegistry.supportsAtZero)
      else baseNames
    val capped = supportFiltered.take(cfg.maxDistributions)

    // ---- shared-scan data collection: ONE stats scan + ONE histogram
    // shuffle + ONE sample scan for ALL columns (the reference fits 3
    // columns for ~the price of 1, docs/_static/benchmark_summary.md:36-43;
    // round 1 looped columns and paid 3×) ----

    // censored fitting collects the paired (value, event) sample per
    // column with the same seeded-sample + exact-resample discipline as
    // the continuous path — a bare `.limit` would take the head of the
    // table in partition order, a time-biased (and layout-dependent)
    // subsample when the source is time-ordered
    val censorByCol: Map[String, (Array[Double], Array[Boolean])] =
      cfg.censoringColumn match {
        case None => Map.empty
        case Some(cc) => columns.map { column =>
          val valid = df
            .select(F.col(column).cast("double").as("x"), F.col(cc).cast("boolean").as("e"))
            .where(validValue(F.col("x")))
          val n = valid.count()
          val rows =
            if (n <= cfg.fittingSampleSize) valid.collect()
            else valid
              .sample(withReplacement = false,
                math.min(1.0, cfg.fittingSampleSize * 1.2 / n), cfg.sampleSeed)
              .limit(cfg.fittingSampleSize * 2).collect()
          val sized =
            if (rows.length <= cfg.fittingSampleSize) rows
            else exactResampleRows(rows, cfg.fittingSampleSize, cfg.sampleSeed)
          column -> (sized.map(_.getDouble(0)), sized.map(_.getBoolean(1)))
        }.toMap
      }

    // NaN/±Inf→null per column so min/max/count see only finite values
    val cleaned = df.select(columns.map { c =>
      finiteOrNull(F.col(c).cast("double")).as(c)
    }: _*)
    val statAggs = columns.flatMap(c =>
      Seq(F.min(c).as(s"mn_$c"), F.max(c).as(s"mx_$c"), F.count(c).as(s"cnt_$c")))
    val statRow = cleaned.agg(statAggs.head, statAggs.tail: _*).head()
    // a column with no finite values fits nothing but fails nothing —
    // it is dropped here, and an all-invalid request returns the empty
    // collection (the reference's contract, not an exception)
    val colStats: Map[String, (Double, Double, Long)] = columns.zipWithIndex.flatMap {
      case (c, i) =>
        if (statRow.isNullAt(3 * i) || statRow.getLong(3 * i + 2) == 0L) None
        else Some(c -> ((statRow.getDouble(3 * i), statRow.getDouble(3 * i + 1),
          statRow.getLong(3 * i + 2))))
    }.toMap
    val fitCols = columns.filter(colStats.contains)
    if (fitCols.isEmpty) return emptyResults(spark, cfg)

    // ---- adaptive pre-fit sampling (A7/P3/P1, reference:
    // base_fitter.py:243-477): inputs above the row threshold are reduced
    // ONCE here — pilot skew decides uniform vs stratified — and both the
    // histogram and the sample scan below run over the reduced frame. At
    // 100 TB this bounds every downstream scan instead of rescanning the
    // corpus per fit.
    val nMax = colStats.values.map(_._3).max
    val (scanDf, samplePlan) = AdaptiveSampling.prepare(cleaned, fitCols, nMax, cfg)

    // one sample scan shared by every column; per-column null filter +
    // exact-size downsample happen on the collected rows. The fraction is
    // derived from the MINIMUM per-column count so sparse (nully) columns
    // still reach the fitting sample size; the row cap bounds the collect.
    // The sample scan and the histogram scan below are INDEPENDENT (both
    // depend only on the stats row), so the sample collect runs on a
    // driver thread while the histogram job is submitted — the two scans
    // overlap instead of serializing (opt guide §2.6).
    val reduceFactor = samplePlan.map(_.fraction).getOrElse(1.0)
    val nMin = math.max(1L, (colStats.values.map(_._3).min * reduceFactor).toLong)
    val nMaxEff = math.max(1L, (nMax * reduceFactor).toLong)
    val sampleRowsF: scala.concurrent.Future[Array[org.apache.spark.sql.Row]] =
      scala.concurrent.Future {
        if (nMaxEff <= cfg.fittingSampleSize) scanDf.collect()
        else scanDf
          .sample(withReplacement = false,
            math.min(1.0, cfg.fittingSampleSize * 1.2 / nMin), cfg.sampleSeed)
          .limit(cfg.fittingSampleSize * 4).collect()
      }(scala.concurrent.ExecutionContext.global)

    // one histogram pass for all non-singular columns: explode
    // (columnIndex, bin) pairs → ONE ~(columns·bins)-row shuffle; bin
    // arithmetic identical to Histogram.continuous
    case class HistSpec(c: String, mn: Double, hi: Double, nBins: Int, width: Double)
    // explicit bin edges (reference's tuple `bins` form): one CASE-chain
    // bin expression per column in the SAME single exploded scan, with
    // per-bin widths in the density normalization (edges may be
    // non-uniform); values outside [head, last] are excluded
    val explicitHists: Option[Map[String, Hist]] = cfg.binEdges.map { es =>
      // shared helpers with Histogram.continuousWithEdges — ONE bin/
      // density definition. The struct is emitted unconditionally with a
      // nullable bin (evaluating the CASE chain once per column per row)
      // and null bins drop after the explode.
      val edges = Histogram.validEdges(es)
      val entries = F.array(fitCols.zipWithIndex.map { case (c, i) =>
        F.struct(F.lit(i).as("ci"),
          Histogram.edgeBinExpr(F.col(c), edges).as("bin"))
      }: _*)
      val countsByCol = scanDf.select(F.explode(entries).as("e"))
        .where(F.col("e.bin").isNotNull)
        .groupBy(F.col("e.ci").as("ci"), F.col("e.bin").as("bin"))
        .agg(F.count(F.lit(1)).as("cnt"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (ci, rows) =>
          ci -> rows.map(r => r.getLong(1).toInt -> r.getLong(2)).toMap
        }
      fitCols.zipWithIndex.map { case (c, i) =>
        val counts = countsByCol.getOrElse(i, Map.empty[Int, Long])
        c -> Hist(Histogram.edgeDensity(counts, edges), edges)
      }.toMap
    }
    val specs = if (explicitHists.isDefined) Nil else fitCols.flatMap { c =>
      val (mn, mx, cnt) = colStats(c)
      if (mn == mx) None
      else {
        val nBins = math.max(2,
          if (cfg.useRiceRule) Histogram.riceBins(cnt) else cfg.bins)
        val hi = mx + (mx - mn) * 1e-10
        Some(HistSpec(c, mn, hi, nBins, (hi - mn) / nBins))
      }
    }
    val histByCol: Map[String, Hist] = explicitHists.getOrElse {
      val countsByCol: Map[Int, Map[Int, Long]] =
        if (specs.isEmpty) Map.empty
        else {
          val entries = F.array(specs.zipWithIndex.map { case (sp, i) =>
            val bin = F.least(
              F.greatest(F.floor((F.col(sp.c) - F.lit(sp.mn)) / F.lit(sp.width)), F.lit(0L)),
              F.lit((sp.nBins - 1).toLong))
            F.when(F.col(sp.c).isNotNull,
              F.struct(F.lit(i).as("ci"), bin.as("bin"))).otherwise(F.lit(null))
          }: _*)
          scanDf.select(F.explode(entries).as("e"))
            .where(F.col("e").isNotNull)
            .groupBy(F.col("e.ci").as("ci"), F.col("e.bin").as("bin"))
            .agg(F.count(F.lit(1)).as("cnt"))
            .collect()
            .groupBy(_.getInt(0))
            .map { case (ci, rows) =>
              ci -> rows.map(r => r.getLong(1).toInt -> r.getLong(2)).toMap
            }
        }
      fitCols.map { c =>
        val (mn, mx, cnt) = colStats(c)
        if (mn == mx) c -> Hist(Array(1.0), Array(mn))
        else {
          val i = specs.indexWhere(_.c == c)
          val sp = specs(i)
          val counts = countsByCol.getOrElse(i, Map.empty)
          val edges = Array.tabulate(sp.nBins + 1)(j => sp.mn + j * (sp.hi - sp.mn) / sp.nBins)
          // normalize by the rows the histogram scan actually saw (the
          // adaptive sampler may have reduced it below the full count)
          val nScan = math.max(counts.values.sum, 1L)
          val density = Array.tabulate(sp.nBins)(b =>
            counts.getOrElse(b, 0L).toDouble / (nScan * sp.width))
          c -> Hist(density, edges)
        }
      }.toMap
    }

    val sampleRows: Array[org.apache.spark.sql.Row] =
      scala.concurrent.Await.result(sampleRowsF,
        scala.concurrent.duration.Duration.Inf)
    val samples: Map[String, Array[Double]] = fitCols.map { c =>
      val i = columns.indexOf(c) // scanDf keeps the original column order
      val arr = sampleRows.iterator.filterNot(_.isNullAt(i)).map(_.getDouble(i)).toArray
      val sized =
        if (arr.length <= cfg.fittingSampleSize) arr
        else exactResample(arr, cfg.fittingSampleSize, cfg.sampleSeed)
      if (sized.isEmpty)
        throw new IllegalArgumentException(s"column '$c' has no valid data")
      c -> sized
    }.toMap

    // ---- one fan-out job over every (column, family) pair ----
    val ctxs: Map[String, FitContext] = fitCols.map { c =>
      val sample = censorByCol.get(c).map(_._1).getOrElse(samples(c))
      c -> FitContext(c, histByCol(c), sample, DataStats.of(sample),
        censorByCol.get(c).map(_._2))
    }.toMap
    val methodByCol: Map[String, String] = fitCols.map { c =>
      c -> (if (cfg.estimationMethod == "auto") {
        if (Estimators.isHeavyTailed(ctxs(c).sample, ctxs(c).stats)) "mse" else "mle"
      } else cfg.estimationMethod)
    }.toMap
    val pairs: Seq[(String, String)] = fitCols.flatMap { c =>
      interleave(prefilter(capped, ctxs(c).stats, cfg.prefilter)).map(n => (c, n))
    }
    // fine-grained tasks (≤2 fits each) keep one slow family from
    // queueing behind another on the same core — the wall clock floor is
    // then the single slowest fit, not a partition's sum
    val nParts = cfg.numPartitions.getOrElse(
      math.max(1, math.min(pairs.length, 4 * spark.sparkContext.defaultParallelism)))

    // the custom-registry snapshot rides the broadcast so runtime-registered
    // families resolve on executor JVMs (not just in local mode)
    val bc = spark.sparkContext.broadcast((ctxs, methodByCol, DistRegistry.customSnapshot))
    val cfgBase = cfg
    val results: Dataset[FitResult] = spark.createDataset(pairs)
      .repartition(nParts)
      .map { case (c, name) =>
        val (ctxMap, methods, customDists) = bc.value
        fitOne(name, ctxMap(c), cfgBase.copy(estimationMethod = methods(c)), customDists)
      }

    val combined = results.toDF().cache()
    combined.count() // materialize, as the reference does (continuous_fitter.py:409-414)
    new FitResults(combined, samples ++ censorByCol.collect {
      case (c, v) if fitCols.contains(c) => c -> v._1 }, cfg)
  }

  /** Group-wise continuous fit: fit every requested family to `valueCol`
    * WITHIN each distinct `groupCol` value — "fit a distribution per
    * segment", the grouped generalization of [[fit]] (beyond the
    * reference, which fits whole columns only; its lifecycle per group
    * would rescan the table G times).
    *
    * Shared-scan discipline, independent of the number of groups:
    * ONE stats shuffle (groupBy stats), ONE histogram shuffle (broadcast
    * spec join → (group, bin) counts), ONE sample pass (per-group
    * `sampleBy` with fractions sized from the stats), then a single
    * (group, family) fan-out through the same [[fitOne]] kernel. Results
    * carry the group value in `column_name`. Driver state is
    * O(groups · (bins + sampleSize)) — groups must be segment-like
    * (flags, categories), not key-like. */
  def fitGrouped(spark: SparkSession, df: DataFrame, groupCol: String,
                 valueCol: String,
                 distributions: Option[Seq[String]] = None,
                 cfg: FitConfig = FitConfig()): FitResults = {
    import spark.implicits._
    // explicit error beats a silently-ignored config field
    require(cfg.censoringColumn.isEmpty,
      "censored fitting is not supported in grouped fits")
    // per-column bounds are keyed by COLUMN name; a grouped fit's context
    // names are group values, so the map would silently miss (or a group
    // named like a column would truncate unexpectedly)
    require(cfg.lowerBounds.isEmpty && cfg.upperBounds.isEmpty,
      "per-column bounds are not supported in grouped fits — use the scalar bounds")
    val vc = F.col(valueCol).cast("double")
    val cleaned = df
      .select(F.col(groupCol).cast("string").as("g"),
        F.when(F.isnan(vc), F.lit(null)).otherwise(vc).as("x"))
      .where(F.col("g").isNotNull && F.col("x").isNotNull)

    // 1) one stats shuffle
    val statRows = cleaned.groupBy("g")
      .agg(F.min("x").as("mn"), F.max("x").as("mx"), F.count("x").as("cnt"))
      .collect()
    require(statRows.nonEmpty, s"no valid data in '$valueCol'")
    val stats: Map[String, (Double, Double, Long)] = statRows.map { r =>
      r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))
    }.toMap

    // 2) one histogram shuffle: broadcast per-group bin specs, then a
    // (group, bin) count — ~groups·bins rows regardless of input size
    val specs = stats.toSeq.collect { case (g, (mn, mx, cnt)) if mn < mx =>
      val nBins = math.max(2,
        if (cfg.useRiceRule) Histogram.riceBins(cnt) else cfg.bins)
      val hi = mx + (mx - mn) * 1e-10
      (g, mn, (hi - mn) / nBins, nBins, hi)
    }
    val histByGroup: Map[String, Hist] = if (specs.isEmpty) Map.empty else {
      val specDf = specs.map(s => (s._1, s._2, s._3, s._4)).toDF("g", "bmn", "width", "nb")
      val counts = cleaned.join(F.broadcast(specDf), "g")
        .select(F.col("g"),
          F.least(
            F.greatest(F.floor((F.col("x") - F.col("bmn")) / F.col("width")), F.lit(0L)),
            (F.col("nb") - 1).cast("long")).as("bin"))
        .groupBy("g", "bin").agg(F.count(F.lit(1)).as("cnt"))
        .collect()
        .groupBy(_.getString(0))
      specs.map { case (g, mn, width, nBins, hi) =>
        val byBin = counts.getOrElse(g, Array.empty)
          .map(r => r.getLong(1).toInt -> r.getLong(2)).toMap
        val nScan = math.max(byBin.values.sum, 1L)
        val edges = Array.tabulate(nBins + 1)(j => mn + j * (hi - mn) / nBins)
        val density = Array.tabulate(nBins)(b =>
          byBin.getOrElse(b, 0L).toDouble / (nScan * width))
        g -> Hist(density, edges)
      }.toMap
    }

    // 3) one sample pass: per-group fractions from the known counts. The
    // full-collect shortcut gates on the TOTAL row count — gating on the
    // max group size would let many small groups pull the whole table
    // onto the driver
    val totalRows = stats.values.map(_._3).sum
    val sampleRows: Array[(String, Double)] =
      if (totalRows <= cfg.fittingSampleSize.toLong * 4)
        cleaned.as[(String, Double)].collect()
      else {
        val fracs: Map[String, Double] = stats.map { case (g, (_, _, n)) =>
          g -> math.min(1.0, cfg.fittingSampleSize * 1.2 / n)
        }
        cleaned.stat.sampleBy("g", fracs.map { case (k, v) => (k: Any, v) }, cfg.sampleSeed)
          .as[(String, Double)].collect()
      }
    val samples: Map[String, Array[Double]] = sampleRows.groupBy(_._1).map {
      case (g, rows) =>
        val arr = rows.map(_._2)
        g -> (if (arr.length <= cfg.fittingSampleSize) arr
              else exactResample(arr, cfg.fittingSampleSize, cfg.sampleSeed))
    }

    // 4) one (group, family) fan-out through the shared kernel
    val baseNames = distributions.getOrElse(DistRegistry.defaultNames)
    val capped = (if (cfg.supportAtZeroOnly)
      baseNames.filter(DistRegistry.supportsAtZero) else baseNames)
      .take(cfg.maxDistributions)
    val ctxs: Map[String, FitContext] = samples.map { case (g, sample) =>
      val (mn, _, _) = stats(g)
      val hist = histByGroup.getOrElse(g, Hist(Array(1.0), Array(mn)))
      g -> FitContext(g, hist, sample, DataStats.of(sample), None)
    }
    // per-group auto method selection, same rule as fit()
    val methodByGroup: Map[String, String] = ctxs.map { case (g, ctx) =>
      g -> (if (cfg.estimationMethod == "auto") {
        if (Estimators.isHeavyTailed(ctx.sample, ctx.stats)) "mse" else "mle"
      } else cfg.estimationMethod)
    }
    val pairs: Seq[(String, String)] = ctxs.keys.toSeq.sorted.flatMap { g =>
      interleave(prefilter(capped, ctxs(g).stats, cfg.prefilter)).map(n => (g, n))
    }
    val nParts = cfg.numPartitions.getOrElse(
      math.max(1, math.min(pairs.length, 4 * spark.sparkContext.defaultParallelism)))
    val bc = spark.sparkContext.broadcast((ctxs, methodByGroup, DistRegistry.customSnapshot))
    val cfgBase = cfg
    val results = spark.createDataset(pairs)
      .repartition(nParts)
      .map { case (g, name) =>
        val (ctxMap, methods, customDists) = bc.value
        fitOne(name, ctxMap(g), cfgBase.copy(estimationMethod = methods(g)), customDists)
      }
    val combined = results.toDF().cache()
    combined.count()
    new FitResults(combined, samples, cfg)
  }

  /** Discrete fit over the registry's discrete families
    * (reference: discrete_fitter.py + discrete_fitting.py:380-470). */
  def fitDiscrete(spark: SparkSession, df: DataFrame, column: String,
                  distributions: Option[Seq[String]] = None,
                  cfg: FitConfig = FitConfig()): FitResults =
    fitDiscreteMulti(spark, df, Seq(column), distributions, cfg)

  /** Multi-column discrete fit with the same shared-scan discipline as the
    * continuous path: ONE exploded scan computes every column's empirical
    * PMF, ONE scan collects every column's fitting sample, then a single
    * fan-out job runs every (column, family) pair. m columns cost ~1. */
  def fitDiscreteMulti(spark: SparkSession, df: DataFrame, columns: Seq[String],
                       distributions: Option[Seq[String]] = None,
                       cfg: FitConfig = FitConfig()): FitResults = {
    import spark.implicits._
    require(columns.nonEmpty, "at least one column required")
    // floating columns route through double so NaN/±Inf become null
    // BEFORE the long cast (a bare double→long cast turns NaN into 0 and
    // would silently inject spurious zeros into the PMF); integral
    // columns cast directly — no NaN possible, and the double hop would
    // corrupt values above 2^53
    val cleaned = df.select(columns.map { c =>
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType =>
          finiteOrNull(F.col(c).cast("double")).cast("long").as(c)
        case _ => F.col(c).cast("long").as(c)
      }
    }: _*)

    // per-column PMFs from one exploded (columnIndex, value) shuffle —
    // the collect is ~(columns · unique values) rows, bounded for
    // genuinely discrete data regardless of input size
    val entries = F.array(columns.zipWithIndex.map { case (c, i) =>
      F.when(F.col(c).isNotNull, F.struct(F.lit(i).as("ci"), F.col(c).as("k")))
        .otherwise(F.lit(null))
    }: _*)
    val grouped = cleaned.select(F.explode(entries).as("e"))
      .where(F.col("e").isNotNull)
      .groupBy(F.col("e.ci").as("ci"), F.col("e.k").as("k"))
      .agg(F.count(F.lit(1)).as("cnt"))
      .collect()
    // all-invalid columns drop out; an all-invalid request returns the
    // empty collection with the full schema (the reference's contract)
    val pmfByCol: Map[String, Pmf] = columns.zipWithIndex.flatMap { case (c, i) =>
      val rows = grouped.filter(_.getInt(0) == i).sortBy(_.getLong(1))
      if (rows.isEmpty) None
      else {
        val counts = rows.map(_.getLong(2))
        val total = counts.sum
        Some(c -> Pmf(rows.map(_.getLong(1)), counts.map(_.toDouble / total), total))
      }
    }.toMap
    val fitCols = columns.filter(pmfByCol.contains)
    if (fitCols.isEmpty) return emptyResults(spark, cfg)

    // one shared sample scan; per-column null-filter + exact resample on
    // the collected rows (fraction from the MINIMUM count so sparse
    // columns still reach the target size)
    val nMax = pmfByCol.values.map(_.total).max
    val nMin = pmfByCol.values.map(_.total).min
    val sampleRows: Array[org.apache.spark.sql.Row] =
      if (nMax <= cfg.fittingSampleSize) cleaned.collect()
      else cleaned
        .sample(withReplacement = false,
          math.min(1.0, cfg.fittingSampleSize * 1.2 / math.max(nMin, 1L)), cfg.sampleSeed)
        .limit(cfg.fittingSampleSize * 4).collect()
    val samplesByCol: Map[String, Array[Long]] = fitCols.map { c =>
      val i = columns.indexOf(c)
      val arr = sampleRows.iterator.filterNot(_.isNullAt(i)).map(_.getLong(i)).toArray
      val sized =
        if (arr.length <= cfg.fittingSampleSize) arr
        else {
          val rng = new java.util.Random(cfg.sampleSeed)
          val a = arr.clone()
          var j = 0
          while (j < cfg.fittingSampleSize) {
            val m = j + rng.nextInt(a.length - j)
            val t = a(j); a(j) = a(m); a(m) = t
            j += 1
          }
          java.util.Arrays.copyOfRange(a, 0, cfg.fittingSampleSize)
        }
      c -> sized
    }.toMap

    // default zoo = registry minus the reference's discrete exclusions
    // (bernoulli/randint stay opt-in, distributions.py:351-357)
    val names = distributions.getOrElse(DiscreteRegistry.defaultNames)
      .filter(n => DiscreteRegistry.get(n).isDefined)
    val pairs: Seq[(String, String)] = fitCols.flatMap(c => names.map(n => (c, n)))

    // SSE compares empirical vs fitted PMF at the unique observed values
    // (reference: discrete_fitting.py:184-209)
    val ctx: Map[String, (Array[Long], Pmf, DataStats)] = fitCols.map { c =>
      c -> ((samplesByCol(c), pmfByCol(c), DataStats.of(samplesByCol(c).map(_.toDouble))))
    }.toMap
    val bc = spark.sparkContext.broadcast((ctx, DiscreteRegistry.customSnapshot))

    val results = spark.createDataset(pairs)
      .repartition(math.max(1, math.min(pairs.length, 2 * spark.sparkContext.defaultParallelism)))
      .map { case (colName, name) =>
        val (ctxMap, customDists) = bc.value
        val (sample, pm, st) = ctxMap(colName)
        val t0 = System.nanoTime()
        val res = try {
          val dist = customDists.get(name).orElse(DiscreteRegistry.get(name)).get
          val params = dist.fit(sample)
          if (params.exists(p => !java.lang.Double.isFinite(p)))
            failed(name, colName, st, None, None)
          else {
            val sse = Metrics.sseDiscrete(dist, params, pm.xs, pm.p)
            val (aic, bic) = Metrics.informationCriteriaDiscrete(dist, params, sample)
            // lazy metrics defer the K-S pass exactly like the
            // continuous path; FitResults.fillMetrics recomputes it from
            // the cached sample on demand
            val (ks, pv) =
              if (cfg.lazyMetrics) (None, None)
              else {
                val (k, p) = Metrics.ksDiscrete(dist, params, sample)
                (Some(k), Some(p))
              }
            FitResult(colName, name, params, sse, aic, bic,
              ks, pv, None, None,
              st.min, st.max, st.mean, st.stddev, st.count, st.kurtosis, st.skewness,
              None, None)
          }
        } catch {
          case _: Throwable => failed(name, colName, st, None, None)
        }
        res.copy(fit_seconds = (System.nanoTime() - t0) / 1e9)
      }
    val combined = results.toDF().cache()
    combined.count()
    // carry the fitting samples so deferred metrics can fill on demand —
    // both the double view and the exact integral sample (the latter so
    // a lazy K-S never loses bits above 2^53)
    new FitResults(combined,
      samplesByCol.map { case (c, a) => c -> a.map(_.toDouble) }, cfg,
      None, samplesByCol)
  }
}
