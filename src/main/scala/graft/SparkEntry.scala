package graft

import org.apache.spark.sql.{SparkSession, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2;
  * `oracleSql` carries DuckDB-runnable ANSI SQL for the SQL-expressible
  * subset (identical column names AND identical IEEE arithmetic shape, so
  * value hashes line up). Fit results are verified by the rows-only check
  * plus the ScalaTest tolerance suites.
  */
object SparkEntry {

  private def li(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Harness contract: `ts` is epoch-NANOS as BIGINT, whatever the file's
    * physical type. Driver datasets have shipped `ts` as both INT64
    * TIMESTAMP(NANOS) (readable only via the nanosAsLong legacy conf) and
    * plain timestamp[us]; every downstream query does integer nanos
    * arithmetic (`ts div 1000` → µs, `div 3600e9` → hours), so both
    * shapes normalize here and nowhere else. */
  private def rawEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // µs timestamps must arrive as TIMESTAMP (not NTZ) so unix_micros
    // reads the stored value with no session-timezone dependence; pin
    // UTC anyway so NTZ-typed frames from other readers cast cleanly
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.read.parquet(s"$dir/events.parquet")
  }

  private def tsToNanos(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df // already nanos
      case _ =>
        df.withColumn("ts",
          F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000L))
    }

  private def events(spark: SparkSession, dir: String): DataFrame =
    tsToNanos(rawEvents(spark, dir))

  /** Streaming twin of [[events]]: same nanos-BIGINT `ts` contract over a
    * file-source stream (the source needs the file's real schema, so the
    * normalization happens on the streaming frame, not the schema). The
    * `{events}` brace-glob keeps the FileStreamSource's derived basePath
    * at the directory — a bare file path fails its directory check. */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val raw = rawEvents(spark, dir)
    tsToNanos(spark.readStream.schema(raw.schema).parquet(s"$dir/{events}.parquet"))
  }

  /** The driver's oracle comparator sorts result frames with pandas, which
    * cannot hash array cells — every harness output must be array-free.
    * Arrays become a deterministic comma-joined string. */
  private def arrStr(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    F.concat_ws(",", F.transform(c, x => F.format_string("%.6f", x.cast("double"))))

  /** FitResult frames carry `parameters: array<double>` — stringify it;
    * `fit_seconds` is wall-clock (nondeterministic) so it is dropped from
    * harness output to keep the dump stable across runs. */
  private def fitOut(df: DataFrame): DataFrame =
    df.withColumn("parameters", arrStr(F.col("parameters")))
      .drop("fit_seconds")

  /** Layout-stable bounded cap: a `l_orderkey < K` range predicate is
    * pushed into the parquet scan (PlanSpec asserts it), selects the SAME
    * row set regardless of partition layout (a bare limit takes whichever
    * partitions answer first), and — because TPC-H order keys are a
    * fixed-density sequence — keeps the selected row count bounded as SF
    * grows (~K/4 orders → ~K lineitem rows). An orderBy+limit top-K was
    * tried first and costs a k-row heap merge per partition; the
    * predicate costs nothing. */
  private[graft] def keyCappedLineitem(s: SparkSession, dir: String,
                                       maxOrderKey: Long, cols: Seq[String]): DataFrame =
    li(s, dir)
      .where(F.col("l_orderkey") < maxOrderKey)
      .select(cols.map(F.col): _*)

  /** The reference fits once and serves best/filter/summary off the cached
    * combined DataFrame (continuous_fitter.py:409-414, collection.py). Our
    * harness queries are independent closures, so the shared "results
    * collection" lives in this memo: one full fit per (dir, spec), reused
    * by every downstream query. */
  private val fitMemoMax = 64

  /** LRU-bounded: a long-lived session cycling through many (dir, column,
    * dists, cfg) specs evicts the least-recently-used fit and unpersists
    * its cached relation instead of pinning one relation per spec
    * forever. 64 is ~an order of magnitude above what one harness sweep
    * creates. */
  private val fitMemo: java.util.Map[String, FitResults] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, FitResults](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, FitResults]): Boolean = {
          val evict = size() > fitMemoMax
          if (evict) {
            // per-column slices of one multi-column fit share a cached
            // root — only release it when the LAST sharing entry leaves,
            // or the surviving siblings silently refit on every action
            val victim = e.getValue
            val shared = {
              val it = values().iterator()
              var found = false
              while (!found && it.hasNext) {
                val v = it.next()
                found = (v ne victim) && (v.rootDf eq victim.rootDf)
              }
              found
            }
            if (!shared)
              try victim.unpersist()
              catch { case _: Throwable => }
          }
          evict
        }
      })

  /** Memoize an arbitrary fit under an explicit key — the non-li-continuous
    * fits (discrete, bounded, censored, MSE) go through here so
    * `clearFitMemo` can release EVERY cached relation a harness sweep
    * creates (nothing stays pinned for the life of the session). */
  private def memoFit(key: String)(mk: => FitResults): FitResults = {
    val hit = fitMemo.get(key)
    if (hit != null) { memoHits.incrementAndGet(); hit }
    else {
      memoMisses.incrementAndGet()
      val v = mk
      val prev = fitMemo.putIfAbsent(key, v)
      if (prev != null) { v.unpersist(); prev } else v
    }
  }

  /** Cumulative fit/copula-memo hit and miss counters. The bench reads
    * them around each timed query so round-over-round deltas can be
    * attributed to memo LAYOUT (which query pays a cold fit first) vs
    * real plan changes — without this, whichever timed query first
    * touches a spec books the whole fit and reads as a regression. */
  private val memoHits = new java.util.concurrent.atomic.AtomicLong()
  private val memoMisses = new java.util.concurrent.atomic.AtomicLong()
  def memoCounters: (Long, Long) = (memoHits.get, memoMisses.get)

  /** Drop every memoized fit (and its cached relation). The bench's
    * untimed pre-warm pass calls this so the timed queries re-run the
    * real fitting work against a warm JVM, exactly like the reference's
    * warm-process timeit loops. */
  def clearFitMemo(): Unit = fitMemo.synchronized {
    // synchronizedMap iteration needs the wrapper lock — and the
    // access-ordered LinkedHashMap mutates its link chain even on get()
    val it = fitMemo.values().iterator()
    while (it.hasNext) {
      try it.next().unpersist()
      catch { case _: Throwable => }
    }
    fitMemo.clear()
    copulaMemo.synchronized(copulaMemo.clear())
  }

  /** The fitted norm-marginal copula over the key-capped slice, shared by
    * q_copula_fit and q_copula_serde (same model, different subjects:
    * the fit VALUES vs the sink round-trip). Holds only driver-side
    * parameters (no pinned relations), so eviction is just `clear` —
    * dropped together with the fit memo so a timed bench loop still pays
    * the fit exactly once. */
  private val copulaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, GaussianCopula]()

  private def cappedNormCopula(s: SparkSession, dir: String): GaussianCopula = {
    if (copulaMemo.containsKey(dir)) memoHits.incrementAndGet()
    else memoMisses.incrementAndGet()
    copulaMemo.computeIfAbsent(dir, _ => {
      val cols = Seq("l_extendedprice", "l_quantity")
      val capped = keyCappedLineitem(s, dir, 100000, cols :+ "l_orderkey")
      val fr = Fitter.fit(s, capped, cols, Some(Seq("norm")),
        FitConfig(fittingSampleSize = 2000000))
      val cop = GaussianCopula.fit(s, capped, fr, cols,
        metric = "aic", corrMethod = "spearman_rank")
      fr.unpersist() // marginals are extracted; don't pin the relation
      cop
    })
  }

  /** Memoized at COLUMN granularity: overlapping multi-column queries
    * (e.g. {price, discount, tax} then {price, discount}) reuse each
    * column's cached results instead of refitting. */
  private def cachedFit(s: SparkSession, dir: String, cols: Seq[String],
                        dists: Option[Seq[String]] = None,
                        cfg: FitConfig = FitConfig()): FitResults = {
    def key(c: String) = s"$dir|$c|${dists.map(_.mkString(",")).getOrElse("ALL")}|$cfg"
    // fit ALL missing columns in one Fitter.fit call — the single-pass
    // shared-scan path makes m columns cost ~1 column; per-column slices
    // of the cached combined table land in the memo individually so
    // overlapping queries reuse them
    val missing = cols.filterNot(c => fitMemo.containsKey(key(c)))
    memoHits.addAndGet(cols.length - missing.length)
    memoMisses.addAndGet(missing.length)
    if (missing.nonEmpty) {
      val fitted = Fitter.fit(s, li(s, dir), missing, dists, cfg)
      missing.foreach(c => fitMemo.putIfAbsent(key(c), fitted.forColumn(c)))
    }
    val perCol = cols.map(c => fitMemo.get(key(c)))
    if (perCol.length == 1) perCol.head
    else new FitResults(perCol.map(_.df).reduce(_ union _),
      perCol.flatMap(_.samples).toMap, cfg)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * full continuous fit of lineitem.l_extendedprice, best family per
    * metric ranking. */
  def entry(spark: SparkSession): DataFrame = {
    val df = li(spark, "/root/testdata/sf0.001")
    Fitter.fit(spark, df, Seq("l_extendedprice")).best(10, "aic")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- fitting operators (rows-only checks; E1-E7, §2.5) ----
    "fit_continuous" -> ((s, dir) =>
      fitOut(cachedFit(s, dir, Seq("l_extendedprice")).successful
        .orderBy("distribution"))),
    "fit_best_aic" -> ((s, dir) =>
      fitOut(cachedFit(s, dir, Seq("l_extendedprice")).best(5, "aic"))),
    "fit_multi_column" -> ((s, dir) =>
      fitOut(cachedFit(s, dir, Seq("l_extendedprice", "l_discount", "l_tax"))
        .bestPerColumn(3, "aic"))),
    "fit_multi_closed_form" -> ((s, dir) =>
      // the multi-column shared-scan path (ONE stats agg + ONE histogram
      // shuffle + ONE sample scan for ALL columns) hash-checked: norm MLE
      // on the full columns is (mean, std_pop), SQL-exact per column
      memoFit(s"$dir|multi|cf")(Fitter.fit(s,
        li(s, dir), Seq("l_quantity", "l_extendedprice", "l_discount"),
        distributions = Some(Seq("norm")),
        cfg = FitConfig(fittingSampleSize = 2000000)))
        .successful
        .select(F.col("column_name"), F.col("distribution"),
          F.round(F.element_at(F.col("parameters"), 1), 4).as("p_loc"),
          F.round(F.element_at(F.col("parameters"), 2), 4).as("p_scale"))
        .orderBy("column_name")),
    "fit_discrete" -> ((s, dir) =>
      fitOut(memoFit(s"$dir|disc|l_quantity|ALL")(
        Fitter.fitDiscrete(s, li(s, dir), "l_quantity")).successful
        .orderBy("distribution"))),
    "fit_bounded" -> ((s, dir) =>
      fitOut(memoFit(s"$dir|bounded")(Fitter.fit(s, li(s, dir), Seq("l_extendedprice"),
        distributions = Some(Seq("norm", "lognorm", "gamma", "weibull_min", "uniform")),
        cfg = FitConfig(lowerBound = Some(900.0), upperBound = Some(105000.0))))
        .successful.orderBy("distribution"))),
    "fit_mse_heavy_tail" -> ((s, dir) =>
      fitOut(memoFit(s"$dir|mse")(Fitter.fit(s, li(s, dir), Seq("l_extendedprice"),
        distributions = Some(Seq("norm", "lognorm", "gamma", "pareto", "fisk")),
        cfg = FitConfig(estimationMethod = "mse"))).successful.orderBy("distribution"))),
    "fit_optin_excluded" -> ((s, dir) =>
      // §2.9/D1 opt-in path: reference-DEFAULT_EXCLUSIONS families fitted
      // through the distributed fan-out by explicit request — the
      // fast-kernel Tier-E members (closed-form or series CDFs; the
      // quadrature-heavy ones are opt-in the same way but not benched)
      fitOut(memoFit(s"$dir|optin")(Fitter.fit(s, li(s, dir), Seq("l_extendedprice"),
        distributions = Some(Seq("gibrat", "mielke", "exponpow", "kstwobign",
          "wald", "tukeylambda"))))
        .successful.orderBy("distribution"))),
    "fit_optin_quadrature" -> ((s, dir) =>
      // the HARDEST opt-in kernels through the same distributed fan-out:
      // levy_stable (Zolotarev-integral cdf), studentized_range (double
      // quadrature), geninvgauss (Bessel-normalized) — the Tier-E members
      // fit_optin_excluded skips. A 500-point sample + deferred metrics
      // bound the quadrature bill (every NM step integrates per point);
      // Bench SKIPS this row by name — it exists as the fan-out runtime
      // signal for the opt-in path, not as a latency benchmark. Recovery
      // accuracy is DistributionSpec's job.
      fitOut(memoFit(s"$dir|optin|quad")(Fitter.fit(s, li(s, dir),
        Seq("l_extendedprice"),
        distributions = Some(Seq("levy_stable", "studentized_range",
          "geninvgauss")),
        cfg = FitConfig(fittingSampleSize = 500, lazyMetrics = true)))
        .successful.orderBy("distribution"))),
    "fit_heavy_tail_detector" -> ((s, dir) => {
      // M11 hash-checked: the estimation_method="auto" router's actual
      // decision inputs — numpy-linear p99, population excess kurtosis,
      // max/p99 — computed by the REAL Estimators.isHeavyTailed over the
      // cap-lifted sample (= the full column, so everything is exact
      // SQL). `plain` (l_extendedprice) triggers neither branch; `heavy`
      // ((106000−x)^−2, a Pareto-style inversion) triggers BOTH, with
      // ~4x margin on the ratio and ~20x on kurtosis at every SF.
      import s.implicits._
      val base = li(s, dir).select(
        F.col("l_extendedprice").cast("double").as("plain"),
        F.pow(F.lit(106000.0) - F.col("l_extendedprice"), -2.0).as("heavy"))
      def row(col: String) = {
        val sample = Fitter.fittingSample(base, col, 2000000, 42L)
        val stats = DataStats.of(sample)
        val p99 = graft.dists.ContinuousDist.quantile(sample, 0.99)
        (col, Estimators.isHeavyTailed(sample, stats),
          math.rint(stats.max / p99 * 1e6) / 1e6,
          math.rint(stats.kurtosis * 1e6) / 1e6)
      }
      Seq(row("heavy"), row("plain"))
        .toDF("column_name", "heavy_tailed", "extreme_ratio", "kurtosis_r")
        .orderBy("column_name")
    }),
    "fit_mse_closed_form" -> ((s, dir) =>
      // M2 hash row: the uniform MSP optimum is closed form (Cheng & Amin
      // 1983) and the estimator takes that exact path, so the MSE
      // pipeline (full-column sample → thinned order statistics →
      // spacing maximizer) replays in SQL; m = 2000 thinned points at
      // every SF ≥ 0.001, so the (m±1) constants are literals
      memoFit(s"$dir|mse|cf")(Fitter.fit(s, li(s, dir), Seq("l_extendedprice"),
        distributions = Some(Seq("uniform")),
        cfg = FitConfig(estimationMethod = "mse", fittingSampleSize = 2000000)))
        .successful
        .select(F.col("distribution"),
          F.round(F.element_at(F.col("parameters"), 1), 4).as("p_loc"),
          F.round(F.element_at(F.col("parameters"), 2), 4).as("p_scale"))),
    "fit_lazy" -> ((s, dir) =>
      fitOut(cachedFit(s, dir, Seq("l_extendedprice"),
        cfg = FitConfig(lazyMetrics = true)).best(5, "aic"))),
    "fit_doc_len_closed_form" -> ((s, dir) =>
      // the fitter is corpus-agnostic: the same closed-form norm pipeline
      // hash-checked on a SECOND table (documents.n_chars, full column) —
      // the document-length prior a packing/chunking policy consumes
      memoFit(s"$dir|doclen|cf")(Fitter.fit(s,
          docs(s, dir).select(F.col("n_chars").cast("double").as("len")),
          Seq("len"), Some(Seq("norm")),
          FitConfig(fittingSampleSize = 2000000)))
        .successful
        .select(F.col("distribution"),
          F.round(F.element_at(F.col("parameters"), 1), 4).as("p_loc"),
          F.round(F.element_at(F.col("parameters"), 2), 4).as("p_scale"),
          F.round(F.col("aic"), 2).as("aic_r"))
        .orderBy("distribution")),
    "fit_censored" -> ((s, dir) => {
      // M3: right-censored MLE over the events stream table — values above
      // the censor point are observed-as-at-least (event = false)
      val ev = events(s, dir).select(F.col("value"),
        (F.col("value") < F.lit(75.0)).as("uncensored"))
        .withColumn("value", F.least(F.col("value"), F.lit(75.0)))
      fitOut(memoFit(s"$dir|censored")(Fitter.fit(s, ev, Seq("value"),
        distributions = Some(Seq("norm", "lognorm", "gamma", "weibull_min", "expon")),
        cfg = FitConfig(censoringColumn = Some("uncensored"))))
        .successful.orderBy("distribution"))
    }),
    "fit_censored_closed_form" -> ((s, dir) => {
      // M3 hash row: the right-censored exponential MLE is closed-form
      // (loc = min observed event, scale = total exposure above loc per
      // observed event), so fitting the FULL column makes the censored
      // collection + kernel SQL-checkable; the NM polish converges to the
      // closed form well inside the 4-decimal rounding
      val ev = events(s, dir).select(F.col("value"),
        (F.col("value") < F.lit(75.0)).as("uncensored"))
        .withColumn("value", F.least(F.col("value"), F.lit(75.0)))
      memoFit(s"$dir|censored_cf")(Fitter.fit(s, ev, Seq("value"),
        distributions = Some(Seq("expon")),
        cfg = FitConfig(censoringColumn = Some("uncensored"),
          fittingSampleSize = 2000000)))
        .successful
        .select(F.col("distribution"),
          F.round(F.element_at(F.col("parameters"), 1), 4).as("p_loc"),
          F.round(F.element_at(F.col("parameters"), 2), 4).as("p_scale"))
    }),
    "fit_closed_form" -> ((s, dir) =>
      // closed-form MLE families (norm/expon/uniform) fitted on the FULL
      // column — lifting the sample cap makes the estimates SQL-exact, so
      // the sampling → MLE pipeline itself gets a DuckDB hash row instead
      // of a rows-only check
      cachedFit(s, dir, Seq("l_extendedprice"),
        dists = Some(Seq("norm", "expon", "uniform")),
        cfg = FitConfig(fittingSampleSize = 2000000))
        .successful
        .select(F.col("distribution"),
          F.round(F.element_at(F.col("parameters"), 1), 4).as("p_loc"),
          F.round(F.element_at(F.col("parameters"), 2), 4).as("p_scale"),
          // AIC = 2k − 2·Σ logpdf over the full column is SQL-expressible
          // for closed-form families, hash-checking the information-
          // criteria pipeline (the LL is stationary at the MLE, so
          // cross-engine parameter noise is second-order)
          F.round(F.col("aic"), 2).as("aic_r"),
          // K-S is SQL-expressible where the CDF is (expon/uniform; DuckDB
          // has no erf, so the norm row carries a −1 sentinel both sides)
          F.when(F.col("distribution") === "norm", F.lit(-1.0))
            .otherwise(F.round(F.col("ks_statistic"), 6)).as("ks_r"))
        .orderBy("distribution")),
    "fit_serde_closed_form" -> ((s, dir) => {
      // S3 hash row: every closed-form fit result goes model -> JSON file
      // -> model on the driver, and the SELECT reads params/AIC from the
      // ROUND-TRIPPED objects. The oracle is the same closed-form SQL as
      // fit_closed_form, so a green hash proves the JSON sink preserves
      // values bit-for-bit through write + parse.
      import s.implicits._
      val fits = cachedFit(s, dir, Seq("l_extendedprice"),
        dists = Some(Seq("norm", "expon", "uniform")),
        cfg = FitConfig(fittingSampleSize = 2000000))
        .successful.as[FitResult].collect()
      val tmp = java.nio.file.Files.createTempDirectory("graft_serde")
      val back = try {
        fits.map { r =>
          val p = tmp.resolve(r.distribution + ".json")
          Serialization.saveFitResult(r, p.toString)
          val loaded = Serialization.loadFitResult(p.toString)
          java.nio.file.Files.delete(p)
          loaded
        }.toSeq
      } finally java.nio.file.Files.delete(tmp)
      s.createDataset(back).toDF()
        .select(F.col("distribution"),
          F.round(F.element_at(F.col("parameters"), 1), 4).as("p_loc"),
          F.round(F.element_at(F.col("parameters"), 2), 4).as("p_scale"),
          F.round(F.col("aic"), 2).as("aic_r"))
        .orderBy("distribution")
    }),
    "q_adaptive_plan" -> ((s, dir) => {
      // A7/P1/P3 hash row: the adaptive sampling policy made SQL-exact by
      // giving the pilot a budget >= the column (fraction 1.0 keeps every
      // row), so pilot skewness is the population skewness, and the
      // strategy/fraction decision is a CASE over it. events.value (skew
      // 1.93) selects stratified at threshold 1.5; l_extendedprice
      // (symmetric) selects uniform.
      import s.implicits._
      val cfg = FitConfig(sampleThresholdRows = 5000, pilotRows = 10000000L,
        skewThresholdForStratified = 1.5)
      def planRow(name: String, df: org.apache.spark.sql.DataFrame, col: String) = {
        val n = df.count()
        val sk = AdaptiveSampling.pilotSkewness(df, col, n, cfg)
        val p = AdaptiveSampling.plan(n, sk, cfg)
          .getOrElse(AdaptiveSampling.SamplePlan("full", 1.0))
        (name, n, sk, p.strategy, p.fraction)
      }
      Seq(planRow("events.value", events(s, dir), "value"),
          planRow("lineitem.l_extendedprice", li(s, dir), "l_extendedprice"))
        .toDF("column_name", "n_rows", "pilot_skew", "strategy", "fraction")
        .withColumn("pilot_skew", F.round(F.col("pilot_skew"), 6))
        .withColumn("fraction", F.round(F.col("fraction"), 6))
        .orderBy("column_name")
    }),
    "fit_ad_closed_form" -> ((s, dir) =>
      // M9/M10 hash row: the Anderson-Darling statistic over the FULL
      // column is SQL-expressible where the CDF is (expon/uniform), and
      // the expon A-D p-value replays the Stephens table interpolation
      // (scipy.anderson refit convention: loc=0, scale=mean). Reuses the
      // memoized fit_closed_form relation, so the bench pays no new fit.
      cachedFit(s, dir, Seq("l_extendedprice"),
        dists = Some(Seq("norm", "expon", "uniform")),
        cfg = FitConfig(fittingSampleSize = 2000000))
        .successful
        .where(F.col("distribution") =!= "norm")
        .select(F.col("distribution"),
          F.round(F.col("ad_statistic"), 4).as("ad_r"),
          F.round(F.col("ad_pvalue"), 4).as("ad_p"))
        .orderBy("distribution")),
    "fit_closed_form_discrete" -> ((s, dir) =>
      // the discrete kernel's closed-form families on the FULL column —
      // poisson (mu = mean), geom (p = 1/mean), planck (λ = ln(1+1/mean)),
      // randint (low = min, high = max+1) — gives the E7 path a 4-family
      // DuckDB hash row over both 1- and 2-parameter estimates
      memoFit(s"$dir|disc|l_quantity|cf")(
        Fitter.fitDiscrete(s, li(s, dir), "l_quantity",
          distributions = Some(Seq("poisson", "geom", "planck", "randint")),
          cfg = FitConfig(fittingSampleSize = 2000000)))
        .successful
        // F.get is 0-based and null-safe — 1-param families surface p2 as
        // NULL instead of an ANSI out-of-bounds error
        .select(F.col("distribution"),
          F.round(F.get(F.col("parameters"), F.lit(0)), 4).as("p1"),
          F.round(F.get(F.col("parameters"), F.lit(1)), 4).as("p2"))
        .orderBy("distribution")),
    "fit_ks_discrete" -> ((s, dir) =>
      // M8 hash row: the discrete K-S statistic (tie-run D+/D- over
      // distinct values) for all four closed-form discrete families on
      // the FULL column. Every CDF is SQL-expressible (poisson via the
      // cumulative pmf sum = regularized gamma, geom/planck via expm1
      // identities, randint linearly), so the tie-run construction
      // itself gets the oracle. Reuses the memoized discrete fit.
      memoFit(s"$dir|disc|l_quantity|cf")(
        Fitter.fitDiscrete(s, li(s, dir), "l_quantity",
          distributions = Some(Seq("poisson", "geom", "planck", "randint")),
          cfg = FitConfig(fittingSampleSize = 2000000)))
        .successful
        .select(F.col("distribution"),
          F.round(F.col("ks_statistic"), 6).as("ks_r"))
        .orderBy("distribution")),
    "fit_grouped_closed_form" -> ((s, dir) =>
      // group-wise fitting (beyond-reference): closed-form families per
      // l_returnflag segment on the FULL groups — per-group MLE params
      // and AIC are SQL-exact, so the whole grouped pipeline (stats
      // shuffle, per-group sampling, fan-out) gets a hash row
      memoFit(s"$dir|grouped|cf")(
        Fitter.fitGrouped(s, li(s, dir), "l_returnflag", "l_extendedprice",
          distributions = Some(Seq("norm", "expon")),
          cfg = FitConfig(fittingSampleSize = 2000000)))
        .successful
        .select(F.col("column_name").as("grp"),
          F.col("distribution"),
          F.round(F.element_at(F.col("parameters"), 1), 4).as("p_loc"),
          F.round(F.element_at(F.col("parameters"), 2), 4).as("p_scale"),
          F.round(F.col("aic"), 2).as("aic_r"))
        .orderBy("grp", "distribution")),
    "fit_lazy_closed_form" -> ((s, dir) => {
      // M14/F8 hash-checked: fit with DEFERRED metrics (ks null), then
      // bestLazy's AIC-preselect + K-S recompute from the cached sample.
      // With the cap lifted, the cached sample IS the column, so the
      // lazily-filled K-S is SQL-exact (norm row masked — DuckDB has no
      // erf)
      cachedFit(s, dir, Seq("l_extendedprice"),
        dists = Some(Seq("norm", "expon", "uniform")),
        cfg = FitConfig(fittingSampleSize = 2000000, lazyMetrics = true))
        .bestLazy(s, 3, "ks_statistic")
        .select(F.col("distribution"),
          F.when(F.col("distribution") === "norm", F.lit(-1.0))
            .otherwise(F.round(F.col("ks_statistic"), 6)).as("ks_r"))
        .orderBy("distribution")
    }),
    "fit_lazy_select_closed_form" -> ((s, dir) =>
      // M14/F8's SELECTION order hash-checked (fit_lazy_closed_form pins
      // the metric FILL; this pins the decisions): 5 columns x {expon,
      // uniform} = 10 lazy rows with n=1 makes the 3n+5=8-row AIC
      // preselection BIND — two rows are excluded before any K-S exists —
      // and the K-S re-sort then picks the winner among survivors.
      // Closed-form MLE + lifted cap => every AIC and every recomputed
      // K-S is SQL-exact, so DuckDB replays BOTH ranking decisions.
      cachedFit(s, dir,
        Seq("l_extendedprice", "l_quantity", "l_discount", "l_tax",
          "l_orderkey"),
        dists = Some(Seq("expon", "uniform")),
        cfg = FitConfig(fittingSampleSize = 2000000, lazyMetrics = true))
        .bestLazy(s, 1, "ks_statistic")
        .select(F.col("column_name"), F.col("distribution"),
          F.round(F.col("ks_statistic"), 6).as("ks_r"))),
    "fit_bounded_closed_form" -> ((s, dir) =>
      // D3's truncation renormalization, hash-checked: closed-form
      // families under [900, 105000] bounds on the FULL column. The expon
      // model keeps ~6e-4 tail mass beyond the upper bound, so its
      // truncated AIC/K-S differ from the plain fit by a
      // SQL-reproducible −n·ln(mass) / rescaled-CDF amount
      cachedFit(s, dir, Seq("l_extendedprice"),
        dists = Some(Seq("expon", "uniform")),
        cfg = FitConfig(fittingSampleSize = 2000000,
          lowerBound = Some(900.0), upperBound = Some(105000.0)))
        .successful
        .select(F.col("distribution"),
          F.round(F.element_at(F.col("parameters"), 1), 4).as("p_loc"),
          F.round(F.element_at(F.col("parameters"), 2), 4).as("p_scale"),
          F.round(F.col("aic"), 2).as("aic_r"),
          F.round(F.col("ks_statistic"), 6).as("ks_r"))
        .orderBy("distribution")),
    "fit_closed_form_bernoulli" -> ((s, dir) =>
      // bernoulli MLE (= indicator mean) on a derived 0/1 column, full
      // data — one more closed-form hash row for the discrete kernel
      memoFit(s"$dir|disc|qflag|bern")(
        Fitter.fitDiscrete(s,
          li(s, dir).select((F.col("l_quantity") <= 25).cast("long").as("qflag")),
          "qflag", distributions = Some(Seq("bernoulli")),
          cfg = FitConfig(fittingSampleSize = 2000000)))
        .successful
        .select(F.col("distribution"),
          F.round(F.get(F.col("parameters"), F.lit(0)), 4).as("p1"))),
    "q_grouped_fit" -> ((s, dir) => {
      // per-GROUP fitting in one aggregation pass, hash-checked: the
      // sufficient-statistic families (norm/expon/uniform/lognorm) have
      // closed-form MLE AND closed-form maximized loglik, so params,
      // AIC, and the best-by-AIC pick per l_returnflag are all exact
      // SQL over per-group aggregates — the shape that scales to 10^6
      // groups where a driver loop over per-group fits cannot
      val fits = GroupedFit.fitByGroup(li(s, dir), "l_extendedprice",
        Seq("l_returnflag"))
      val best = GroupedFit.bestFrom(fits, Seq("l_returnflag"))
        .select(F.col("l_returnflag"), F.col("distribution").as("best_family"))
      fits.join(best, "l_returnflag")
        .select(F.col("l_returnflag"), F.col("n"), F.col("distribution"),
          F.round(F.get(F.col("parameters"), F.lit(0)), 4).as("p1"),
          F.round(F.get(F.col("parameters"), F.lit(1)), 4).as("p2"),
          F.round(F.coalesce(F.get(F.col("parameters"), F.lit(2)),
            F.lit(-1.0)), 4).as("p3"),
          F.round(F.col("aic"), 2).as("aic_r"),
          F.col("best_family"))
        .orderBy("l_returnflag", "distribution")
    }),
    "q_grouped_fit_discrete" -> ((s, dir) => {
      // E7's per-group form: the sufficient-statistic DISCRETE families.
      // l_quantity (integers 1..50) admits only geom per group; the
      // derived 0/1 indicator admits only bernoulli — the support checks
      // (exact Σx²=Σx / integrality aggregates) are part of what the
      // hash pins.
      val d = li(s, dir)
      val qty = GroupedFit.fitDiscreteByGroup(d, "l_quantity",
        Seq("l_returnflag"))
      val flag = GroupedFit.fitDiscreteByGroup(
        d.select(F.col("l_returnflag"),
          (F.col("l_quantity") <= 25).cast("double").as("qflag")),
        "qflag", Seq("l_returnflag"))
      qty.withColumn("value_col", F.lit("l_quantity"))
        .unionByName(flag.withColumn("value_col", F.lit("qflag")))
        .select(F.col("l_returnflag"), F.col("value_col"), F.col("n"),
          F.col("distribution"),
          F.round(F.get(F.col("parameters"), F.lit(0)), 6).as("p1"),
          F.round(F.col("aic"), 2).as("aic_r"))
        .orderBy("l_returnflag", "value_col", "distribution")
    }),
    "q_grouped_fit_gof" -> ((s, dir) => {
      // per-group GOODNESS of fit: exact-rank K-S of each fitted family
      // against the group's ECDF plus the asymptotic p — the answer the
      // grouped fitter's AIC ranking alone cannot give ("the winner per
      // customer: is it actually a good fit?"). Restricted here to the
      // elementary-CDF families DuckDB can replay (expon/uniform/
      // rayleigh/pareto — norm/lognorm/halfnorm need erf); the CDF rides
      // the same DistScalar scalar the SQL surface uses, so ANY
      // registered family works in the operator itself
      val d = li(s, dir)
      val fits = GroupedFit.fitByGroup(d, "l_extendedprice",
          Seq("l_returnflag"))
        .where(F.col("distribution").isin("expon", "uniform", "rayleigh", "pareto"))
      GroupedFit.gofByGroup(d, "l_extendedprice", Seq("l_returnflag"), fits)
        .select(F.col("l_returnflag"), F.col("distribution"),
          F.round(F.col("ks_d"), 6).as("ks_d"),
          F.round(F.col("ks_p"), 6).as("ks_p"),
          F.round(F.col("ad_a2"), 4).as("ad_a2"),
          F.col("n"))
        .orderBy("l_returnflag", "distribution")
    }),
    "q_grouped_fit_gof_discrete" -> ((s, dir) => {
      // E7's per-group GOF: M8's rank-only discrete K-S for every
      // (group, discrete family) row — geom and poisson per returnflag
      // on the integer quantities; the registry cdf drives the model
      // side (geom closed form, poisson regularized gamma), DuckDB
      // replays geom exactly and poisson via the pmf series
      val d = li(s, dir)
      val fits = GroupedFit.fitDiscreteByGroup(d, "l_quantity",
        Seq("l_returnflag"))
      GroupedFit.gofDiscreteByGroup(d, "l_quantity", Seq("l_returnflag"), fits)
        .select(F.col("l_returnflag"), F.col("distribution"),
          F.round(F.col("ks_d"), 6).as("ks_d"),
          F.round(F.col("ks_p"), 6).as("ks_p"),
          F.col("n"))
        .orderBy("l_returnflag", "distribution")
    }),
    "q_grouped_generate" -> ((s, dir) => {
      // grouped-fit → generation composability: the per-group best model
      // (among the elementary-ppf families) feeds the SAME dist_ppf
      // scalar the G1 samplers use, on a deterministic quantile grid —
      // proving fitByGroup's parameter convention round-trips into the
      // generation surface unchanged. Oracle replays the best-by-AIC
      // pick AND each family's closed-form ppf.
      import org.apache.spark.sql.graftbridge.ColumnBridge
      val d = li(s, dir)
      val fits = GroupedFit.fitByGroup(d, "l_extendedprice",
          Seq("l_returnflag"))
        .where(F.col("distribution").isin("expon", "uniform", "rayleigh", "pareto"))
      val best = GroupedFit.bestFrom(fits, Seq("l_returnflag"))
      val grid = best.select(F.col("l_returnflag"), F.col("distribution"),
        F.col("parameters"),
        F.explode(F.array(Seq(0.05, 0.25, 0.5, 0.75, 0.95).map(F.lit): _*))
          .as("q"))
      val ppf = ColumnBridge.column(graft.functions.DistScalar.build("ppf",
        Seq(ColumnBridge.expression(F.col("distribution")),
          ColumnBridge.expression(F.col("parameters")),
          ColumnBridge.expression(F.col("q"))),
        Map.empty, Map.empty))
      grid.select(F.col("l_returnflag"), F.col("distribution"), F.col("q"),
        F.round(ppf, 4).as("x_q"))
        .orderBy("l_returnflag", "q")
    }),
    "q_grouped_fit_gof_sketch" -> ((s, dir) => {
      // the sketch-probe GOF (per-group KLL aggregate → quantile-grid
      // probes) audited against the exact-rank construction, the
      // kllRankCheck discipline: D̂ must land within the KLL+grid error
      // bound of the exact D for EVERY (group, family) — a sketch,
      // merge, or probe regression flips within_tol and reddens the
      // hash; the exact D itself replays in DuckDB
      val d = li(s, dir)
      val fits = GroupedFit.fitByGroup(d, "l_extendedprice",
          Seq("l_returnflag"))
        .where(F.col("distribution").isin("expon", "uniform", "rayleigh", "pareto"))
      val est = GroupedFit.gofByGroupSketch(d, "l_extendedprice",
          Seq("l_returnflag"), fits)
        .select(F.col("l_returnflag"), F.col("distribution"),
          F.col("ks_d_est"))
      GroupedFit.gofByGroup(d, "l_extendedprice", Seq("l_returnflag"), fits)
        .join(est, Seq("l_returnflag", "distribution"))
        .select(F.col("l_returnflag"), F.col("distribution"),
          (F.abs(F.col("ks_d_est") - F.col("ks_d")) <= 0.02).as("within_tol"),
          F.round(F.col("ks_d"), 6).as("ks_d"), F.col("n"))
        .orderBy("l_returnflag", "distribution")
    }),
    "q_grouped_fit_weighted" -> ((s, dir) => {
      // frequency-weighted per-group fitting: each price counts
      // l_quantity times (the pre-aggregated "value × count" shape) —
      // all seven closed forms over weighted sufficient statistics,
      // n = Σw, every formula replayed by DuckDB from sum(w·x) shapes
      GroupedFit.fitByGroupWeighted(li(s, dir), "l_extendedprice",
          "l_quantity", Seq("l_returnflag"))
        .select(F.col("l_returnflag"),
          F.round(F.col("n"), 4).as("n_w"),
          F.col("distribution"),
          F.round(F.get(F.col("parameters"), F.lit(0)), 4).as("p1"),
          F.round(F.get(F.col("parameters"), F.lit(1)), 4).as("p2"),
          F.round(F.coalesce(F.get(F.col("parameters"), F.lit(2)),
            F.lit(-1.0)), 4).as("p3"),
          F.round(F.col("aic"), 2).as("aic_r"))
        .orderBy("l_returnflag", "distribution")
    }),
    "fit_summary" -> ((s, dir) =>
      cachedFit(s, dir, Seq("l_extendedprice")).summary),
    "fit_summary_closed_form" -> ((s, dir) =>
      // A9's 19-aggregate summary over the closed-form full-column fit:
      // the AIC slice is SQL-exact, so the summary AGGREGATION itself
      // (min/mean/max over metric columns + count) gets a hash row
      cachedFit(s, dir, Seq("l_extendedprice"),
        dists = Some(Seq("norm", "expon", "uniform")),
        cfg = FitConfig(fittingSampleSize = 2000000))
        .summary
        .select(F.col("n_results"),
          F.round(F.col("min_aic"), 2).as("min_aic_r"),
          F.round(F.col("mean_aic"), 2).as("mean_aic_r"),
          F.round(F.col("max_aic"), 2).as("max_aic_r"))),
    "fit_acceptable_count" -> ((s, dir) => {
      // A10's conjunctive acceptability count where every live threshold
      // is SQL-expressible: K-S on closed-form CDFs (expon/uniform),
      // pvalue/A-D legs neutralized (≥0 / ≤inf pass-through)
      import s.implicits._
      val n = cachedFit(s, dir, Seq("l_extendedprice"),
        dists = Some(Seq("expon", "uniform")),
        cfg = FitConfig(fittingSampleSize = 2000000))
        .acceptableCount(minPvalue = 0.0, maxKs = 0.05, maxAd = Double.MaxValue)
      Seq(n).toDF("n_acceptable")
    }),
    "fit_filter_metrics" -> ((s, dir) =>
      // F2's conjunctive metric-threshold filter on the same closed-form
      // fit: which families clear ks ≤ 0.05 is SQL-decidable
      cachedFit(s, dir, Seq("l_extendedprice"),
        dists = Some(Seq("expon", "uniform")),
        cfg = FitConfig(fittingSampleSize = 2000000))
        .filterByMetrics(maxKs = Some(0.05))
        .df.select(F.col("distribution"),
          F.round(F.col("ks_statistic"), 6).as("ks_r"))
        .orderBy("distribution")),
    "fit_best_closed_form" -> ((s, dir) =>
      // F5's top-k on actual fit output (not the relational emulation):
      // the AIC ranking among closed-form families is SQL-decidable
      cachedFit(s, dir, Seq("l_extendedprice"),
        dists = Some(Seq("norm", "expon", "uniform")),
        cfg = FitConfig(fittingSampleSize = 2000000))
        .best(1, "aic")
        .select(F.col("distribution"), F.round(F.col("aic"), 2).as("aic_r"))),
    "fit_quality_report" -> ((s, dir) =>
      cachedFit(s, dir, Seq("l_extendedprice", "l_discount")).qualityReport("aic")),
    "fit_quality_report_closed_form" -> ((s, dir) =>
      // A9's quality-report aggregate on the closed-form CDF families:
      // counts, the conjunctive acceptability (KS leg exact in SQL, p
      // leg via the asymptotic Kolmogorov series — decisions sit far
      // from the 0.05 boundary), and best-by-AIC are all SQL-decidable
      cachedFit(s, dir, Seq("l_extendedprice"),
        dists = Some(Seq("expon", "uniform")),
        cfg = FitConfig(fittingSampleSize = 2000000))
        .qualityReport("aic")
        .select(F.col("column_name"), F.col("n_fits"), F.col("n_successful"),
          F.col("n_acceptable"), F.col("best_distribution"),
          F.round(F.col("best_metric_value"), 2).as("best_aic_r"))),

    // ---- relational/statistical core (oracle-checked; A2-A10, F5, F6) ----
    "q_stats" -> ((s, dir) => {
      li(s, dir).agg(
        F.min("l_extendedprice").as("mn"),
        F.max("l_extendedprice").as("mx"),
        F.count(F.col("l_extendedprice")).as("cnt"),
        F.round(F.avg("l_extendedprice"), 4).as("mean"),
        F.round(F.stddev_pop("l_extendedprice"), 4).as("std"),
        F.round(F.skewness(F.col("l_extendedprice")), 6).as("skew"),
        F.round(F.kurtosis(F.col("l_extendedprice")), 6).as("kurt"))
    }),
    "q_hist" -> ((s, dir) => {
      // equal-width histogram, same IEEE arithmetic as the DuckDB oracle
      val df = li(s, dir)
      val r = df.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).head()
      val mn = r.getDouble(0); val mx = r.getDouble(1)
      val hi = mx + (mx - mn) * 1e-10
      val width = (hi - mn) / 40
      df.select(F.least(F.greatest(
          F.floor((F.col("l_extendedprice") - F.lit(mn)) / F.lit(width)), F.lit(0L)),
          F.lit(39L)).as("bin"))
        .groupBy("bin").agg(F.count(F.lit(1)).as("cnt"))
        .orderBy("bin")
    }),
    "q_pmf" -> ((s, dir) =>
      li(s, dir).select(F.col("l_quantity").cast("long").as("k"))
        .groupBy("k").agg(F.count(F.lit(1)).as("cnt"))
        .orderBy("k")),
    "q_quantiles" -> ((s, dir) =>
      li(s, dir).agg(
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).as("p99"))),
    "q_topk" -> ((s, dir) =>
      li(s, dir)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc, F.col("l_orderkey").asc,
          F.col("l_linenumber").asc)
        .limit(100)),
    "q_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy("l_returnflag")
        .orderBy(F.col("l_extendedprice").desc, F.col("l_orderkey").asc,
          F.col("l_linenumber").asc)
      li(s, dir)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 5)
        .orderBy("l_returnflag", "rk")
    }),
    "q_corr_pearson" -> ((s, dir) =>
      li(s, dir).agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).as("price_qty"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).as("price_disc"),
        F.round(F.corr("l_quantity", "l_tax"), 6).as("qty_tax"))),
    "q_filter_count" -> ((s, dir) =>
      li(s, dir).where(
          F.col("l_discount") >= 0.02 && F.col("l_discount") <= 0.08 &&
          F.col("l_tax") < 0.05 && F.col("l_extendedprice") > 10000.0)
        .agg(F.count(F.lit(1)).as("cnt"))),
    "q_distinct_flags" -> ((s, dir) =>
      li(s, dir).select("l_returnflag").distinct().orderBy("l_returnflag")),
    "q_model_filter" -> ((s, dir) => {
      // model-predicate pushdown: "rows inside the fitted model's central
      // 90%" written against dist_cdf with literal params; the
      // ModelPredicatePushdown optimizer rule folds each monotone cdf
      // comparison into a plain range on the column (cut = ppf(q),
      // computed once on the driver), which then reaches the parquet scan
      // as PushedFilters and prunes row groups by min/max stats (PlanSpec
      // asserts both). Oracle replays the FOLDED predicate: the expon cut
      // is loc - scale*ln(1-q), closed-form in DuckDB. Decimal-sum
      // discipline keeps the aggregate order-independent.
      import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal}
      import org.apache.spark.sql.graftbridge.ColumnBridge
      plans.ModelPredicatePushdown.install(s)
      val cdf = ColumnBridge.column(graft.functions.DistScalar.build("cdf",
        Seq(Literal("expon"),
          CreateArray(Seq(Literal(900.0), Literal(30000.0))),
          ColumnBridge.expression(F.col("l_extendedprice"))),
        Map.empty, Map.empty))
      li(s, dir).where(cdf >= F.lit(0.05) && cdf <= F.lit(0.95))
        .agg(F.count(F.lit(1)).as("n_rows"),
          F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
              .cast("double"), 2).as("sum_price"),
          F.round(F.min("l_extendedprice"), 2).as("mn"),
          F.round(F.max("l_extendedprice"), 2).as("mx"))
    }),

    // ---- training-data pipeline ops over documents/embeddings ----
    "q_doc_tokens" -> ((s, dir) =>
      docs(s, dir).select(F.col("doc_id"),
        TextOps.tokenCount(F.col("text")).as("n_tokens"),
        F.length(F.col("text")).as("text_len"))
        .orderBy("doc_id")),
    "q_doc_quality" -> ((s, dir) =>
      TextOps.qualityScore(docs(s, dir), "text")
        .select("doc_id", "n_tokens", "mean_token_len", "type_token_ratio",
          "stopword_ratio", "punct_ratio", "quality_score")
        .orderBy("doc_id")),
    "q_quality_by_length" -> ((s, dir) =>
      // composed curation step: quality scoring → bucketed aggregation
      // (the "how much good data do I have per length band" query every
      // training-data pipeline runs before filtering)
      TextOps.qualityScore(docs(s, dir), "text")
        .select((F.col("n_tokens") / 100).cast("long").as("len_bucket"),
          F.col("quality_score"))
        .groupBy("len_bucket")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.round(F.avg("quality_score"), 6).as("avg_quality"))
        .orderBy("len_bucket")),
    "q_snapshot_diff" -> ((s, dir) => {
      // dataset-versioning changeset hash-checked: old = doc_id < 400,
      // new = doc_id >= 100 with every 7th doc's text amended — so
      // [0,100) is removed, [400,...) is added, and the %7 rows inside
      // the overlap are changed. Both engines compute md5 digests of the
      // same bytes; only (id, status) ships out.
      val d = docs(s, dir)
      val oldSnap = d.where(F.col("doc_id") < 400).select("doc_id", "text")
      val newSnap = d.where(F.col("doc_id") >= 100)
        .select(F.col("doc_id"),
          F.concat(F.coalesce(F.col("text"), F.lit("")),
            F.when(F.col("doc_id") % 7 === 0, " v2").otherwise("")).as("text"))
      Dedup.snapshotDiff(oldSnap, newSnap, "doc_id", "text").orderBy("id")
    }),
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exact(docs(s, dir), "doc_id", "text").orderBy("text_md5")),
    "q_dedup_minhash" -> ((s, dir) =>
      // hash-checked: the whole LSH pipeline is deterministic integer
      // math, so the DuckDB oracle replays signatures, band keys,
      // buckets, and estimates bit-for-bit (see the oracle comment)
      Dedup.minhashPairs(docs(s, dir), "doc_id", "text", threshold = 0.5)
        .orderBy("id_a", "id_b")),
    "q_dedup_minhash_survivors" -> ((s, dir) =>
      // hash-checked via the same SQL replay at threshold 0.8
      Dedup.minhashSurvivors(docs(s, dir), "doc_id", "text", threshold = 0.8)
        .select("doc_id").orderBy("doc_id")),
    "q_dedup_clusters" -> ((s, dir) => {
      // duplicate-cluster resolution, hash-checked: shingle-overlap
      // candidate pairs (inverted-index join, stop-shingle cap) closed
      // transitively by alternating large-star/small-star connected
      // components; singletons label themselves. The DuckDB oracle
      // replays the same pair graph with a recursive min-label CTE.
      val d = docs(s, dir).where(F.col("doc_id") < 300)
        .select(F.col("doc_id"), F.coalesce(F.col("text"), F.lit("")).as("text"))
      val pairs = Dedup.shingleSharePairs(d, "doc_id", "text", n = 4, maxShingleFreq = 100)
      val cc = Dedup.connectedComponents(pairs, "id_a", "id_b", numPartitions = 8)
      d.join(cc, d("doc_id") === cc("id"), "left")
        .select(F.col("doc_id"),
          F.coalesce(F.col("component"), F.col("doc_id")).as("component"))
        .orderBy("doc_id")
    }),
    "q_dup_spans" -> ((s, dir) =>
      // exact duplicated-substring spans (Lee et al.-style), hash-checked:
      // corpus-repeated 8-grams mark windows, fixed-k lag merge produces
      // maximal per-doc spans; DuckDB replays the whole construction
      Dedup.duplicatedSpans(docs(s, dir), "doc_id", "text", k = 8, minCount = 2)
        .orderBy("id", "island")),
    "q_dedup_incremental" -> ((s, dir) => {
      // ingest-time dedup against a persisted signature index: docs < 400
      // are "yesterday's corpus" (signatures computed once, text never
      // re-read), the rest arrive as the new batch; only (new, old)
      // candidates are generated and verified — no old-old work
      val d = docs(s, dir)
      val index = Dedup.minhashSignatures(
        d.where(F.col("doc_id") < 400), "doc_id", "text")
      Dedup.minhashPairsAgainst(index, d.where(F.col("doc_id") >= 400),
          "doc_id", "text")
        .orderBy("new_id", "old_id")
    }),
    "q_dedup_simhash" -> ((s, dir) =>
      // maxHamming=3 → 4×16-bit chunks, the classic configuration; larger
      // budgets shrink chunks into a tiny keyspace and the banded join
      // degenerates to quadratic (round-1 bench: 68 s at maxHamming=10).
      // Hash-checked: the DuckDB oracle replays the full SimHash pipeline
      Dedup.simhashPairs(docs(s, dir), "doc_id", "text", maxHamming = 3)
        .orderBy("id_a", "id_b")),
    "q_lang_id" -> ((s, dir) =>
      // hash-checked: the script-count + marker-vote heuristic is fully
      // deterministic (sorted-lang tie-break), so DuckDB replays it
      TextOps.withLanguage(docs(s, dir), "text")
        .select("doc_id", "detected_lang").orderBy("doc_id")),
    "q_fingerprint" -> ((s, dir) =>
      // hash-checked: the rolling 31·h+c polynomial + splitmix64
      // finalizer is pure mod-2^64 integer math, so the DuckDB oracle
      // replays it bit-for-bit in HUGEINT arithmetic
      TextOps.withFingerprint(docs(s, dir), "text")
        .select("doc_id", "fingerprint").orderBy("doc_id")),
    "q_fingerprint_md5" -> ((s, dir) =>
      // md5 content fingerprint over whitespace-normalized text
      // (identical normalize+digest exists in DuckDB)
      docs(s, dir).select(F.col("doc_id"),
        F.md5(F.encode(F.regexp_replace(F.trim(F.coalesce(F.col("text"), F.lit(""))),
          "\\s+", " "), "UTF-8")).as("fp_md5"))
        .orderBy("doc_id")),
    "q_ann_bruteforce" -> ((s, dir) => {
      val q = emb(s, dir).where(F.col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      Similarity.bruteForceTopK(emb(s, dir), "embedding", "vec_id", q, 20)
    }),
    "q_ann_lsh" -> ((s, dir) => {
      // hash-checked: seeded splitmix64 hyperplanes + strict left-fold
      // signature dots are bit-reproducible, so DuckDB replays bucketing,
      // multiprobe, and the rounded-cosine ranking exactly
      val q = emb(s, dir).where(F.col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      Similarity.lshTopK(emb(s, dir), "embedding", "vec_id", q, 10, nPlanes = 8)
    }),
    "q_ann_pq" -> ((s, dir) => {
      // product-quantized ANN serving: codebooks train on a bounded
      // sample, codes are m bytes per vector (32x smaller than the
      // floats), and the query scores by ADC table lookups — rows-only
      // (k-means), with the exact re-rank left to q_ann_bruteforce
      val e = emb(s, dir)
      val cb = Similarity.pqTrain(e, "embedding", m = 8, k = 16)
      val codes = Similarity.pqEncode(e, "embedding", cb)
      val q = e.where(F.col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      Similarity.pqTopK(codes, "pq_code", "vec_id", q, cb, 10)
    }),
    "q_ann_pq_fixed" -> ((s, dir) => {
      // the PQ serving path (encode + ADC top-k) hash-checked end-to-end:
      // vectors are int8-quantized first (integer arithmetic → no float-
      // accumulation ambiguity) and the codebooks are PINNED to the
      // quantized embeddings of vec_id 0..15 sliced per subspace, so the
      // argmin encode (first-index-on-tie) and the LUT scoring are exact
      // integer computations DuckDB replays bit-for-bit. k-means
      // TRAINING stays on q_ann_pq as the rows-only production path —
      // this query proves the other two thirds of the PQ pipeline.
      val e = emb(s, dir)
      val scales = Similarity.quantizeScales(e, "embedding")
      val q = Similarity.quantizeEmbeddings(e, "embedding", scales)
        .select(F.col("vec_id"),
          F.expr("transform(q_embedding, x -> CAST(x AS float))").as("qf"))
      val cbVecs = q.where(F.col("vec_id") < 16).orderBy("vec_id").collect()
        .map(_.getSeq[Float](1).toArray.map(_.toDouble))
      val (m, dSub) = (8, 8)
      val cb = Similarity.PqCodebooks(m, cbVecs.length, dSub,
        Array.tabulate(m)(sub => cbVecs.map(v =>
          java.util.Arrays.copyOfRange(v, sub * dSub, (sub + 1) * dSub))))
      val codes = Similarity.pqEncode(q, "qf", cb)
      val qv = q.where(F.col("vec_id") === 0).head().getSeq[Float](1).toArray
      Similarity.pqTopK(codes, "pq_code", "vec_id", qv, cb, 10)
    }),
    "q_procrustes" -> ((s, dir) => {
      // align the embedding table against its own exact 3-4-5 rotation
      // in dims (0,1): the polar factor W = M(MᵀM)^(-1/2) from ONE
      // Kahan cross-moment pass must recover the rotation — engine-
      // attested booleans carry the non-SQL verdict, err_before
      // replays exactly
      val aCol = F.col("embedding").cast("array<double>")
      val bArr = F.array((0 until 64).map {
        case 0 => aCol(0) * 0.6 - aCol(1) * 0.8
        case 1 => aCol(0) * 0.8 + aCol(1) * 0.6
        case i => aCol(i)
      }: _*)
      val bDf = emb(s, dir)
        .select(F.col("vec_id"), bArr.as("emb_b"))
      Pca.procrustesAlign(emb(s, dir), "vec_id", "embedding",
        bDf, "vec_id", "emb_b")
    }),
    "q_bayes_ab" -> ((s, dir) =>
      // exact Bayesian A/B on purchase conversion between the even/odd
      // user cohorts: P(p_b > p_a) as the closed finite Beta sum —
      // no Monte Carlo; DuckDB replays every term via lgamma
      Experiments.bayesAb(
        events(s, dir)
          .where(F.col("user_id").isNotNull &&
            F.col("event_type").isNotNull)
          .select(F.when(F.col("user_id") % 2 === 0, "a")
            .otherwise("b").as("g"),
            (F.col("event_type") === "purchase").as("y")),
        "g", "y", "a", "b")),
    "q_silhouette" -> ((s, dir) =>
      // are the embedding labels real clusters: centroid-variant
      // silhouette per label — long-form distances against the
      // broadcast k·d centroid frame, rows never pairwise-join
      Clustering.silhouetteByLabel(emb(s, dir), "vec_id", "embedding",
          "label")
        .orderBy("label")),
    "q_embedding_centroids" -> ((s, dir) => {
      // per-language embedding centroids, hash-checked: embeddings join
      // their documents row (vec_id = doc_id), posexplode, (lang, dim)
      // mean — shuffle carries partial sums only
      val d = docs(s, dir).select(F.col("doc_id"), F.col("lang"))
      val e = emb(s, dir).join(d, F.col("vec_id") === F.col("doc_id"))
      Similarity.groupCentroids(e, "lang", "embedding")
        .select(F.col("grp").as("lang"), F.col("dim").cast("long").as("dim"),
          F.round(F.col("centroid"), 6).as("centroid"))
        .orderBy("lang", "dim")
    }),
    "q_embedding_quantize" -> ((s, dir) => {
      // int8 symmetric quantization, hash-checked: per-dim scales from
      // one map-side-combined pass over the corpus, then a pure per-row
      // quantize — integers replay exactly in SQL
      val e = emb(s, dir)
      val scales = Similarity.quantizeScales(e, "embedding")
      Similarity.quantizeEmbeddings(e, "embedding", scales)
        .where(F.col("vec_id") < 100)
        .select(F.col("vec_id"),
          F.posexplode(F.col("q_embedding")).as(Seq("dim", "q")))
        .select(F.col("vec_id"), F.col("dim").cast("long").as("dim"),
          F.col("q").cast("long").as("q"))
        .orderBy("vec_id", "dim")
    }),
    "q_embedding_near_dup" -> ((s, dir) =>
      Similarity.nearDupPairs(emb(s, dir), "embedding", "vec_id",
        threshold = 0.3, nPlanes = 8).orderBy("id_a", "id_b")),
    "q_embedding_near_dup_exact" -> ((s, dir) =>
      // exact all-pairs verification baseline for the LSH path — DuckDB
      // oracle-checked, so the cosine arithmetic itself gets a hash row
      Similarity.nearDupPairsExact(emb(s, dir), "embedding", "vec_id",
        threshold = 0.3).orderBy("id_a", "id_b")),
    "q_semdedup" -> ((s, dir) =>
      // SemDeDup full path: trained coarse quantizer bounds pairwise
      // work to within-cell comparisons (rows-only — centroids come from
      // seeded k-means; the _fixed twin below hash-checks the machinery)
      Similarity.semDedupPairs(emb(s, dir), "embedding", "vec_id",
          threshold = 0.3, nCells = 8)
        .orderBy("id_a", "id_b")),
    "q_semdedup_fixed" -> ((s, dir) => {
      // the deterministic twin: centroids pinned to the normalized
      // embeddings of vec_id 0..7, so cell assignment and within-cell
      // cosine are pure arithmetic — DuckDB replays normalize → argmin
      // assign → pairwise dot end-to-end
      val ctrs = emb(s, dir).where(F.col("vec_id") < 8)
        .select(F.col("vec_id"), F.col("embedding")).collect()
        .sortBy(_.getLong(0))
        .map { r =>
          val e = r.getSeq[Float](1).toArray
          var ss = 0.0
          e.foreach(x => ss += x.toDouble * x.toDouble)
          val n = math.sqrt(ss)
          e.map(_.toDouble / n)
        }
      Similarity.semDedupPairsWith(emb(s, dir), "embedding", "vec_id",
          ctrs, threshold = 0.3)
        .select(F.col("cell").cast("long").as("cell"), F.col("id_a"),
          F.col("id_b"), F.col("cosine"))
        .orderBy("id_a", "id_b")
    }),
    "q_knn_join" -> ((s, dir) => {
      // batched k-NN join, production shape: trained quantizer, 4-probe
      // pruned search for every query at once (rows-only — the _fixed
      // twin below hash-checks the machinery exhaustively)
      val idx = Similarity.ivfBuild(emb(s, dir), "embedding", "vec_id",
        nCells = 8)
      Similarity.ivfKnnJoin(idx, emb(s, dir).where(F.col("vec_id") < 50),
          "embedding", "vec_id", k = 5, nProbe = 4)
        .orderBy("q_id", "rank")
    }),
    "q_knn_join_fixed" -> ((s, dir) => {
      // the deterministic twin: pinned centroids + exhaustive probing =
      // per-query brute force through the full join machinery; DuckDB
      // replays normalize → pairwise dot → per-query rank
      val ctrs = emb(s, dir).where(F.col("vec_id") < 8)
        .select(F.col("vec_id"), F.col("embedding")).collect()
        .sortBy(_.getLong(0))
        .map { r =>
          val e = r.getSeq[Float](1).toArray
          var ss = 0.0
          e.foreach(x => ss += x.toDouble * x.toDouble)
          val n = math.sqrt(ss)
          e.map(_.toDouble / n)
        }
      val idx = Similarity.ivfBuildWith(emb(s, dir), "embedding", "vec_id", ctrs)
      Similarity.ivfKnnJoin(idx, emb(s, dir).where(F.col("vec_id") < 20),
          "embedding", "vec_id", k = 5, nProbe = ctrs.length)
        .orderBy("q_id", "rank")
    }),
    "q_ann_recall" -> ((s, dir) => {
      // recall@5 of 1-probe IVF vs exhaustive probing over the SAME
      // pinned index — the ANN acceptance metric, end-to-end
      // deterministic; DuckDB re-derives both retrievals (cell-pruned
      // and exhaustive) and the per-query intersection
      val ctrs = emb(s, dir).where(F.col("vec_id") < 8)
        .select(F.col("vec_id"), F.col("embedding")).collect()
        .sortBy(_.getLong(0))
        .map { r =>
          val e = r.getSeq[Float](1).toArray
          var ss = 0.0
          e.foreach(x => ss += x.toDouble * x.toDouble)
          val n = math.sqrt(ss)
          e.map(_.toDouble / n)
        }
      val idx = Similarity.ivfBuildWith(emb(s, dir), "embedding",
        "vec_id", ctrs)
      val queries = emb(s, dir).where(F.col("vec_id") < 20)
      val approx = Similarity.ivfKnnJoin(idx, queries, "embedding",
        "vec_id", k = 5, nProbe = 1)
      val exact = Similarity.ivfKnnJoin(idx, queries, "embedding",
        "vec_id", k = 5, nProbe = ctrs.length)
      Evaluation.recallAtK(approx, exact, "q_id", "c_id")
        .orderBy("q_id")
    }),
    "q_ann_ivf" -> ((s, dir) => {
      // IVF coarse-quantizer ANN: build index, probe 8 cells, exact rank
      val q = emb(s, dir).where(F.col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      val idx = Similarity.ivfBuild(emb(s, dir), "embedding", "vec_id")
      Similarity.ivfTopK(idx, q, 10, nProbe = 8)
    }),
    "q_ann_ivf_full" -> ((s, dir) => {
      // IVF probed EXHAUSTIVELY (nProbe = every cell) must reproduce the
      // brute-force top-k bit-for-bit — a DuckDB hash row over the whole
      // IVF machinery (normalize, assign, probe, re-rank); the recall of
      // the 8-probe variant above is then a pure pruning question
      val q = emb(s, dir).where(F.col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      val idx = Similarity.ivfBuild(emb(s, dir), "embedding", "vec_id")
      Similarity.ivfTopK(idx, q, 20, nProbe = idx.centroids.length)
        .select(F.col("id").as("vec_id"), F.col("cosine"))
        .orderBy(F.col("cosine").desc, F.col("vec_id").asc)
    }),
    "q_multimodal_features" -> ((s, dir) => {
      // the FULL 8-feature extraction vector hash-checked: mixed
      // synthetic payloads — constant-gray PNG, single-frame
      // identity-palette GIF, and empty — are pure functions of doc_id,
      // so every decoded dimension and every feature (channel means,
      // luma mean/std/min/max, aspect ratio) is SQL-predictable. The
      // raw-bytes fallback tier keeps its coverage in q_media_meta.
      val payloadUdf = F.udf((id: Long) =>
        if (id % 3 == 0) Multimodal.syntheticPng(id)
        else if (id % 3 == 1) Multimodal.syntheticGif(id, 1)
        else null)
      def feat(i: Int, name: String) =
        F.round(F.element_at(F.col("features"), i).cast("double"), 5).as(name)
      Multimodal.extractFeatures(
        docs(s, dir).select(F.col("doc_id")).where(F.col("doc_id") < 120)
          .withColumn("payload", payloadUdf(F.col("doc_id"))),
        "payload")
        .select(F.col("doc_id"), F.col("format"),
          F.col("width").cast("long").as("width"),
          F.col("height").cast("long").as("height"),
          feat(1, "mean_r"), feat(2, "mean_g"), feat(3, "mean_b"),
          feat(4, "luma_mean"), feat(5, "luma_std"),
          feat(6, "luma_min"), feat(7, "luma_max"), feat(8, "aspect"))
        .orderBy("doc_id")
    }),
    "q_partitioned_sink" -> ((s, dir) => {
      // partitioned parquet sink + partition-pruned read-back: write the
      // corpus partitioned by lang (the layout a 100 TB text lake uses so
      // per-language jobs touch only their directories), read it back
      // through a lang filter the scan prunes (OpsSpec asserts the
      // PartitionFilters), aggregate. The oracle aggregates the SOURCE
      // table — a green hash proves the sink+source round-trip loses
      // nothing and the pruned read sees exactly the right rows.
      val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
      docs(s, dir).select("doc_id", "lang", "text")
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      s.read.parquet(out).where(F.col("lang").isin("en", "fr"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).as("total_chars"),
          F.min("doc_id").as("min_id"), F.max("doc_id").as("max_id"))
        .orderBy("lang")
    }),
    "q_salted_join" -> ((s, dir) => {
      // skew-mitigated join, hash-checked by EQUIVALENCE: salting must
      // not change join semantics, so the oracle is the plain SQL join.
      // The salt spreads any hot orderkey across 8 reducers; the dim side
      // replicates 8x (it's orders — bounded), the fact side pays one
      // pmod. Same decimal revenue discipline as q_join_revenue.
      val dim = s.read.parquet(s"$dir/orders.parquet")
        .select(F.col("o_orderkey").as("l_orderkey"), F.col("o_orderpriority"))
      SkewJoin.saltedJoin(
          li(s, dir).select("l_orderkey", "l_extendedprice", "l_discount"),
          dim, Seq("l_orderkey"), saltFactor = 8)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).as("n_items"),
          F.round(
            F.sum(F.round(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 6)
              .cast("decimal(24,6)")).cast("double"), 2).as("revenue"))
        .orderBy("o_orderpriority")
    }),
    "q_join_revenue" -> ((s, dir) => {
      // multi-table join-aggregation (lineitem ⋈ orders ⋈ customer ⋈
      // nation): the two fact joins shuffle on their keys, the nation dim
      // broadcasts (PlanSpec asserts it). Revenue rounds per-row to 6
      // then sums as DECIMAL — exact and order-independent, so the total
      // is reproducible across engines where a double sum is not
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey")
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select("c_custkey", "c_nationkey")
      val nat = s.read.parquet(s"$dir/nation.parquet")
        .select("n_nationkey", "n_name")
      li(s, dir).select("l_orderkey", "l_extendedprice", "l_discount")
        .join(ord, F.col("l_orderkey") === F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") === F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") === F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          F.round(
            F.sum(F.round(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 6)
              .cast("decimal(24,6)")).cast("double"), 2).as("revenue"),
          F.count(F.lit(1)).as("n_items"))
        .orderBy("n_name")
    }),
    "q_bucketed_join" -> ((s, dir) => {
      // bucketed co-located join: both sides written ONCE with
      // bucketBy(8, key) + sortBy, then the equi-join reads matching
      // buckets pairwise with NO Exchange on either side (PlanSpec
      // asserts it). At 100 TB this turns an every-query two-sided fact
      // shuffle into a one-time layout cost. Data lands in a temp dir
      // (external tables); the catalog entries are session-local.
      // Oracle = the plain SQL join — bucketing must not change
      // semantics, same decimal revenue discipline as q_salted_join.
      val out = java.nio.file.Files.createTempDirectory("graft_bkt").toString
      Bucketed.writeBucketed(
        li(s, dir).select("l_orderkey", "l_extendedprice", "l_discount"),
        "graft_bkt_lineitem", 8, Seq("l_orderkey"), Some(s"$out/lineitem"))
      Bucketed.writeBucketed(
        s.read.parquet(s"$dir/orders.parquet")
          .select(F.col("o_orderkey").as("l_orderkey"), F.col("o_orderpriority")),
        "graft_bkt_orders", 8, Seq("l_orderkey"), Some(s"$out/orders"))
      Bucketed.coLocatedJoin(s, "graft_bkt_lineitem", "graft_bkt_orders",
          Seq("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).as("n_items"),
          F.round(
            F.sum(F.round(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 6)
              .cast("decimal(24,6)")).cast("double"), 2).as("revenue"))
        .orderBy("o_orderpriority")
    }),
    "q_sessionize" -> ((s, dir) =>
      // gap-based sessionization (30-min gap): one key shuffle feeds the
      // lag flag + running-sum numbering; spans are exact integers.
      // ts is truncated to microseconds FIRST because DuckDB's TIMESTAMP
      // is µs-precision — both engines then sessionize identical values
      Sessionize.summarize(
        events(s, dir).withColumn("ts", F.expr("(ts div 1000) * 1000")),
        "user_id", "ts", 1800000000000L)
        .orderBy("user_id", "session_idx")),
    "q_asof_join" -> ((s, dir) => {
      // as-of join: each click enriched with the user's latest prior (or
      // simultaneous) purchase value — one key shuffle + sort, no range
      // explosion; DuckDB's native ASOF LEFT JOIN is the oracle.
      // ts truncates to µs first: DuckDB TIMESTAMP is µs-precision, so a
      // same-µs click/purchase pair would compare differently on raw ns
      val ev = events(s, dir)
        .withColumn("ts", F.expr("(ts div 1000) * 1000"))
      val clicks = ev.where(F.col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.where(F.col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(F.max("value").as("last_purchase_value"))
      AsOfJoin.asofLeft(clicks, purchases, "user_id", "ts", Seq("last_purchase_value"))
        .select(F.col("event_id"), F.col("user_id"),
          F.round(F.col("last_purchase_value"), 6).as("last_purchase_value"))
        .orderBy("event_id")
    }),
    "q_stream_hist" -> ((s, dir) => {
      // Structured Streaming windowed histogram, hash-checked: the SAME
      // operator that would tail a live ingest replays the bounded events
      // source with Trigger.AvailableNow; the day-window bin counts are
      // integer-exact, so the batch SQL oracle must match bit-for-bit.
      // State per window is ≤ numBins rows at any throughput.
      val src = eventsStream(s, dir)
        .withColumn("event_ts", F.timestamp_micros(F.expr("ts div 1000")))
      val hist = graft.streaming.StreamingOps.windowedHistogram(
        src, "value", "event_ts", binStart = 0.0, binWidth = 50.0,
        numBins = 10, window = "24 hours", watermark = "1 hour")
      graft.streaming.StreamingOps.runToBatch(s, hist, "graft_stream_hist", statePartitions = 8)
        .select(F.unix_timestamp(F.col("window.start")).as("win_start"),
          F.col("bin"), F.col("cnt"))
        .orderBy("win_start", "bin")
    }),
    "q_stream_grouped_fit" -> ((s, dir) => {
      // streaming per-(window, key) distribution fitting, hash-checked:
      // the GroupedFit closed forms ride a windowed streaming
      // aggregation (state = ONE sufficient-statistic row per
      // (day, event_type); family arithmetic + explode are stateless
      // after the aggregate), and the batch SQL oracle replays every
      // parameter and AIC — a live stream fitting models as windows
      // close, reproduced exactly
      val src = eventsStream(s, dir)
        .withColumn("event_ts", F.timestamp_micros(F.expr("ts div 1000")))
      val fits = graft.streaming.StreamingOps.windowedGroupedFit(
        src, "value", Seq("event_type"), "event_ts",
        window = "24 hours", watermark = "1 hour")
      graft.streaming.StreamingOps.runToBatch(s, fits,
          "graft_stream_grouped_fit", statePartitions = 8)
        .select(F.unix_timestamp(F.col("window.start")).as("win_start"),
          F.col("event_type"), F.col("n"), F.col("distribution"),
          F.round(F.get(F.col("parameters"), F.lit(0)), 4).as("p1"),
          F.round(F.get(F.col("parameters"), F.lit(1)), 4).as("p2"),
          F.round(F.coalesce(F.get(F.col("parameters"), F.lit(2)),
            F.lit(-1.0)), 4).as("p3"),
          F.round(F.col("aic"), 2).as("aic_r"))
        .orderBy("win_start", "event_type", "distribution")
    }),
    "q_stream_distinct" -> ((s, dir) => {
      // streaming distinct-users-per-day via the HLL sketch aggregate
      // (exact countDistinct is unsupported in streaming — unbounded
      // state), hash-checked with the q_sketch_hll discipline: the
      // replayed stream estimates join the batch-exact counts and the
      // oracle pins the within-2% booleans TRUE alongside the exact
      // counts
      val src = eventsStream(s, dir)
        .withColumn("event_ts", F.timestamp_micros(F.expr("ts div 1000")))
      val est = graft.streaming.StreamingOps.windowedDistinct(
        src, "user_id", "event_ts", window = "24 hours",
        watermark = "1 hour", lgK = 12)
      val replayed = graft.streaming.StreamingOps
        .runToBatch(s, est, "graft_stream_distinct", statePartitions = 8)
        .select(F.unix_timestamp(F.col("window.start")).as("win_start"),
          F.col("n_distinct_est"))
      val exact = events(s, dir)
        .withColumn("event_ts", F.timestamp_micros(F.expr("ts div 1000")))
        .groupBy(F.window(F.col("event_ts"), "24 hours").as("window"))
        .agg(F.count_distinct(F.col("user_id")).as("n_exact"))
        .select(F.unix_timestamp(F.col("window.start")).as("win_start"),
          F.col("n_exact"))
      replayed.join(exact, "win_start")
        .select(F.col("win_start"), F.col("n_exact"),
          (F.abs(F.col("n_distinct_est") - F.col("n_exact")) <=
            F.col("n_exact") * 0.02).as("within_2pct"))
        .orderBy("win_start")
    }),
    "q_stream_stats" -> ((s, dir) => {
      // streaming per-day column statistics via the same availableNow
      // replay — count exact, moments rounded like the batch q_stats
      val src = eventsStream(s, dir)
        .withColumn("event_ts", F.timestamp_micros(F.expr("ts div 1000")))
      val stats = graft.streaming.StreamingOps.windowedStats(
        src, "value", "event_ts", window = "24 hours", watermark = "1 hour")
      graft.streaming.StreamingOps.runToBatch(s, stats, "graft_stream_stats", statePartitions = 8)
        .select(F.unix_timestamp(F.col("window.start")).as("win_start"),
          F.col("cnt"), F.round(F.col("mean"), 6).as("mean_r"),
          F.round(F.col("mn"), 2).as("mn"), F.round(F.col("mx"), 2).as("mx"),
          F.round(F.col("std"), 4).as("std_r"))
        .orderBy("win_start")
    }),
    "q_stream_cusum" -> ((s, dir) => {
      // streaming two-sided CUSUM drift alarm, hash-checked end to
      // end: the no-reset statistic is a pure function of running
      // sums + prefix minima, so the batch oracle replays the whole
      // trajectory with two window functions — no recursion
      import s.implicits._
      val saved = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val src = eventsStream(s, dir)
          .select(F.col("event_type").as("_1"), F.col("ts").as("_2"),
            F.col("event_id").as("_3"), F.col("value").as("_4"))
          .as[(String, Long, Long, Double)]
        val out = graft.streaming.StreamingOps.runToBatch(
          s, graft.streaming.StreamingOps
            .streamingCusum(src, target = 50.0, slack = 1.0, h = 500.0)
            .toDF(),
          "graft_stream_cusum", outputMode = "update",
          statePartitions = 8)
        val w = Window.partitionBy("key").orderBy(F.col("n").desc)
        val sHi = F.col("cumHi") - F.col("minHi")
        val sLo = F.col("cumLo") - F.col("minLo")
        out.withColumn("__rk", F.row_number().over(w))
          .where(F.col("__rk") === 1)
          .select(F.col("key").as("event_type"), F.col("n"),
            F.round(sHi, 6).as("s_hi"), F.round(sLo, 6).as("s_lo"),
            F.round(F.col("maxHi"), 6).as("max_s_hi"),
            F.round(F.col("maxLo"), 6).as("max_s_lo"),
            F.col("nAlarms").as("n_alarms"),
            (sHi > 500.0 || sLo > 500.0).as("alarm"))
          .orderBy("event_type")
      } finally {
        saved match {
          case Some(v) => s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
          case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
    }),
    "q_stream_welford" -> ((s, dir) => {
      // transformWithState per-key Welford over the bounded replay,
      // hash-checked: RocksDB ValueState carries (n, mean, M2) per
      // event type; the final update-mode row per key must reproduce
      // the batch count/avg/stddev_pop (Welford is numerically exact
      // well past the rounding)
      import s.implicits._
      val saved = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val src = eventsStream(s, dir)
          .select(F.col("event_type").as("_1"), F.col("value").as("_2"))
          .as[(String, Double)]
        val stats = graft.streaming.StreamingOps.keyedRunningStatsTwsExact(src)
        val out = graft.streaming.StreamingOps.runToBatch(
          s, stats.toDF(), "graft_stream_welford", outputMode = "update",
          statePartitions = 8)
        // update mode emits one row per key per batch; the final state
        // row is the one with the largest n
        val w = Window.partitionBy("key").orderBy(F.col("n").desc)
        out.withColumn("__rk", F.row_number().over(w)).where(F.col("__rk") === 1)
          .select(F.col("key").as("event_type"), F.col("n"),
            F.round(F.col("mean"), 6).as("mean_r"),
            F.round(F.sqrt(F.col("m2") / F.col("n")), 4).as("std_r"))
          .orderBy("event_type")
      } finally {
        saved match {
          case Some(v) => s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
          case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
    }),
    "q_stream_anomaly" -> ((s, dir) => {
      // streaming prequential anomaly monitor: each event z-scored
      // against its key's running Welford state AS OF ARRIVAL (state
      // excludes the event), hash-checked against the batch
      // prefix-window replay
      import s.implicits._
      val saved = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val src = eventsStream(s, dir)
          .where(F.col("value").isNotNull && !F.isnan(F.col("value")) &&
            F.col("ts").isNotNull && F.col("event_id").isNotNull)
          .select(F.col("event_type").as("_1"), F.col("ts").as("_2"),
            F.col("event_id").as("_3"),
            F.col("value").cast("double").as("_4"))
          .as[(String, Long, Long, Double)]
        val flagged = graft.streaming.StreamingOps
          .prequentialAnomaly(src, zThreshold = 2.5, minN = 30L)
        graft.streaming.StreamingOps.runToBatch(s, flagged.toDF(),
          "graft_stream_anomaly", outputMode = "append",
          statePartitions = 8)
          .select(F.col("key").as("event_type"), F.col("tns").as("ts"),
            F.col("value"), F.col("z"), F.col("n_before"))
          .orderBy("event_type", "ts", "value")
      } finally {
        saved match {
          case Some(v) => s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
          case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
    }),
    "q_stream_dedup" -> ((s, dir) => {
      // streaming exact dedup over the bounded replay, hash-checked on
      // the survivor COUNT: one md5 state row per distinct payload
      // inside the horizon. The watermark must COVER the dataset's
      // duplicate spread (~30 days here) for the count to equal
      // count(DISTINCT) even if the replay splits into multiple
      // micro-batches — a narrower horizon would evict state between
      // batches and let later duplicates survive
      val src = eventsStream(s, dir)
        .withColumn("event_ts", F.timestamp_micros(F.expr("ts div 1000")))
      val deduped = graft.streaming.StreamingOps.streamingDedup(
        src, "props", "event_ts", watermark = "60 days")
        .groupBy().agg(F.count(F.lit(1)).as("n_survivors"))
      graft.streaming.StreamingOps.runToBatch(
        s, deduped, "graft_stream_dedup", outputMode = "complete",
        statePartitions = 8)
    }),
    "q_stream_sessions" -> ((s, dir) => {
      // flatMapGroupsWithState sessionization over the bounded replay,
      // hash-checked: closed sessions (inline gap-splits + watermark
      // timeouts) must equal the batch sessionization minus any session
      // still open at the final watermark — DuckDB replays exactly that
      import s.implicits._
      val src = eventsStream(s, dir)
        .withColumn("event_ts", F.timestamp_micros(F.expr("ts div 1000")))
        .withWatermark("event_ts", "0 seconds")
      val ds = src.select(F.col("user_id").cast("string").as("_1"),
          F.col("event_ts").as("_2"), F.lit(0.0).as("_3"))
        .as[(String, java.sql.Timestamp, Double)]
      val closed = graft.streaming.StreamingOps.sessionizeWithState(ds, gapMs = 1800000L)
      graft.streaming.StreamingOps.runToBatch(
          s, closed.toDF(), "graft_stream_sessions", outputMode = "append",
          statePartitions = 8)
        .select(F.col("key").cast("long").as("user_id"),
          F.col("start").as("start_ms"), F.col("end").as("end_ms"),
          F.col("n").as("n_events"))
        .orderBy("user_id", "start_ms")
    }),
    "q_stream_drift" -> ((s, dir) => {
      // per-window drift score against a fixed reference model (fit once
      // offline, watch the stream walk away from it) — hash-checked: the
      // exponential reference masses replay as exp() arithmetic (expm1 vs
      // exp-1 differ ~1 ULP, far below the 8-decimal rounding) and the
      // SSE folds in bin order like the zip_with/aggregate expression
      val src = eventsStream(s, dir)
        .withColumn("event_ts", F.timestamp_micros(F.expr("ts div 1000")))
      val drift = graft.streaming.StreamingOps.windowedDriftScore(
        src, "value", "event_ts", "expon", Array(0.0, 60.0),
        binStart = 0.0, binWidth = 50.0, numBins = 10,
        window = "24 hours", watermark = "1 hour")
      graft.streaming.StreamingOps.runToBatch(s, drift, "graft_stream_drift", statePartitions = 8)
        .select(F.unix_timestamp(F.col("window.start")).as("win_start"),
          F.col("n"), F.col("drift_sse"))
        .orderBy("win_start")
    }),
    "q_unigram_logprob" -> ((s, dir) =>
      // CCNet-style LM-quality stand-in, hash-checked: corpus-wide
      // unigram frequencies, per-doc mean token log-probability on a
      // bounded slice; DuckDB replays the same frequency model
      TextOps.unigramLogProb(docs(s, dir),
          docs(s, dir).where(F.col("doc_id") < 100), "doc_id", "text")
        .orderBy("id")),
    "q_range_join" -> ((s, dir) => {
      // point-in-interval range join, hash-checked: each early order
      // opens a 30-day window; shipments landing in each window count
      // via the bucketed join (hash join on week buckets + exact filter
      // — never a broadcast-nested-loop over points x intervals)
      val iv = s.read.parquet(s"$dir/orders.parquet")
        .where(F.col("o_orderkey") < 200)
        .select(F.col("o_orderkey"),
          // NTZ -> LTZ -> epoch seconds; session tz is pinned UTC, so
          // the wall-clock reading equals DuckDB's tz-free epoch()
          F.col("o_orderdate").cast("timestamp").cast("long").as("w_start"),
          (F.col("o_orderdate").cast("timestamp").cast("long") + 30L * 86400L)
            .as("w_end"))
      val pts = li(s, dir)
        .select(F.col("l_shipdate").cast("timestamp").cast("long").as("p"))
      RangeJoin.pointInInterval(pts, "p", iv, "w_start", "w_end",
          bucketWidth = 7L * 86400L)
        .groupBy("o_orderkey").agg(F.count(F.lit(1)).as("n_ship"))
        .orderBy("o_orderkey")
    }),
    "q_heavy_hitters" -> ((s, dir) => {
      // SpaceSaving top-k sketch in its exactness regime (k ≥ distinct
      // keys — no eviction, zero error), hash-checked against a plain
      // GROUP BY: bounded sketch state replaces the per-key shuffle. At
      // real scale k ≪ distinct and the same aggregate returns
      // guaranteed-overcount heavy hitters (bounds asserted in spec).
      val ss = F.udaf(new graft.functions.SpaceSaving(256))
      docs(s, dir)
        .select(F.concat_ws("|", F.col("lang"), F.col("source")).as("k"))
        .agg(ss(F.col("k")).as("hh"))
        .select(F.explode(F.col("hh")).as("h"))
        .select(F.col("h._1").as("key"), F.col("h._2").as("cnt"),
          F.col("h._3").as("err"))
        .orderBy("key")
    }),
    "q_sketch_hll" -> ((s, dir) => {
      // mergeable HLL distinct sketches: per-shard sketches union-merged
      // vs a single-pass sketch per group. The hash row carries the
      // EXACT distinct count (DuckDB-replayable) plus two engine-attested
      // booleans the oracle pins to TRUE: the single-pass AND the
      // shard-merged estimates both land within the lgK=12 error bound
      // of exact — the property that lets 100 TB distincts re-aggregate
      // from per-day sketches without touching raw data. A sketch
      // regression flips a boolean and reddens the hash.
      Sketches.hllDistinctByGroup(li(s, dir), "l_returnflag", "l_orderkey")
        .select(F.col("l_returnflag"), F.col("n_exact"),
          (F.abs(F.col("merged_est") - F.col("n_exact")) <
            F.col("n_exact") * 0.02).as("merged_within_2pct"),
          (F.abs(F.col("single_est") - F.col("n_exact")) <
            F.col("n_exact") * 0.02).as("single_within_2pct"))
        .orderBy("l_returnflag")
    }),
    "q_sketch_kll" -> ((s, dir) =>
      // mergeable KLL quantile summaries: per-partition sketches merged
      // on the driver, rank-checked at four probes. The hash row carries
      // the EXACT ranks (order-exact 0/1 average) plus engine-attested
      // within-eps booleans the oracle pins TRUE — same discipline as
      // q_sketch_hll
      Sketches.kllRankCheck(li(s, dir), "l_extendedprice",
          Seq(10000.0, 30000.0, 60000.0, 90000.0))
        .orderBy("probe")),
    "q_sketch_cms" -> ((s, dir) => {
      // count-min frequency sketch: a 4×256 salted-md5 counter grid
      // (ONE bounded aggregation, additively mergeable across shards),
      // point-estimated at the 20 lowest supplier keys — exact
      // integers end to end, so the replay is bit-for-bit
      val sk = Sketches.countMinBuild(
        li(s, dir).select("l_suppkey"), "l_suppkey",
        depth = 4, width = 256)
      val probes = li(s, dir).select("l_suppkey")
        .where(F.col("l_suppkey") < 20).distinct()
      Sketches.countMinEstimate(sk, probes, "l_suppkey",
          depth = 4, width = 256)
        .orderBy("key")
    }),
    "q_zorder" -> ((s, dir) => {
      // Morton-curve clustering for multi-dim data skipping: quantize
      // (l_extendedprice, l_quantity) to a 256×256 grid off one shared
      // min/max scan, interleave bits in a codegen'd expression chain,
      // range-shuffle on the z-value. The z arithmetic is pure integer/
      // IEEE work, so DuckDB replays every z-value bit-for-bit; the
      // layout property (per-partition bounding boxes shrink on BOTH
      // dims) is asserted in OpsSpec.
      ZOrder.clusterByZ(li(s, dir), Seq("l_extendedprice", "l_quantity"),
          bits = 8, numPartitions = 8)
        .where(F.col("l_orderkey") < 200)
        .select(F.col("l_orderkey"), F.col("l_linenumber").cast("long")
          .as("l_linenumber"), F.col("z_value"))
        .orderBy("l_orderkey", "l_linenumber")
    }),
    "q_theta_artifact" -> ((s, dir) => {
      // the persisted-summary lifecycle, hash-checked end-to-end: one
      // theta sketch per source written to a parquet artifact table,
      // read back, and union-merged into the GLOBAL distinct-gram count
      // without ever touching raw text again — the re-aggregation that
      // replaces a 100 TB rescan with a C-row sketch merge. Exact below
      // 2^18 distinct grams, so the oracle is the literal COUNT(DISTINCT).
      val grams = docs(s, dir).select(F.col("source"),
        F.explode(Decontam.gramsCol(F.col("text"), 8)).as("gram"))
      val artifacts = grams.groupBy("source")
        .agg(F.expr("theta_sketch_agg(gram, 18)").as("sk"))
      val out = java.nio.file.Files.createTempDirectory("graft_theta").toString
      artifacts.write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .agg(F.round(F.expr("theta_sketch_estimate(theta_union_agg(sk, 18))"))
          .cast("long").as("n_distinct_grams"),
          F.count(F.lit(1)).as("n_artifacts"))
    }),
    "q_theta_overlap" -> ((s, dir) => {
      // join-free train/benchmark contamination triage: theta sketches
      // of each side's 8-gram sets, set-algebra on the driver. lgK=18
      // keeps both sides in the exact regime at sf<=0.1 (<=262144
      // distinct grams), so every output — including the intersection —
      // is EXACT and the oracle replays the literal set algebra; at
      // 100 TB the same query runs at default lgK with error bounds.
      val d = docs(s, dir)
      val grams = d.select(F.col("doc_id"),
        F.explode(Decontam.gramsCol(F.col("text"), 8)).as("gram"))
      Sketches.thetaOverlap(
        grams.where(F.col("doc_id") % 50 =!= 0), "gram",
        grams.where(F.col("doc_id") % 50 === 0), "gram", lgK = 18)
    }),
    "q_theta_cohort" -> ((s, dir) => {
      // pairwise source-overlap matrix from per-cohort theta sketches:
      // one distributed pass, C·(C-1)/2 driver-side set ops. Exact
      // regime at sf<=0.1 (per-source grams < 2^14), hash-checked
      // against DuckDB's pairwise distinct-gram joins.
      val d = docs(s, dir)
      Sketches.thetaCohortOverlap(
        d.select(F.col("source"),
          F.explode(Decontam.gramsCol(F.col("text"), 8)).as("gram")),
        "source", "gram", lgK = 14)
        .orderBy("cohort_a", "cohort_b")
    }),
    "q_stratified_hash" -> ((s, dir) =>
      // P2's stratified tail-boost semantics in deterministic form,
      // hash-checked END-TO-END: exact-min/max equal-width strata,
      // md5-bucket thresholds (10% mid, 50% tails) — the surviving row
      // SET is engine-replayable, so the oracle compares every row
      Sampling.stratifiedHashSample(events(s, dir), "value", "event_id",
          fraction = 0.1, tailFraction = 0.5, numBins = 5, buckets = 10000)
        .select(F.col("event_id"), F.round(F.col("value"), 2).as("value_r"))
        .orderBy("event_id")),
    "q_props_json" -> ((s, dir) =>
      // semi-structured sidecar parse, hash-checked: the JSON property
      // extracts with codegen'd get_json_object inside the scan
      // projection (no UDF); only per-type partial aggregates shuffle
      events(s, dir)
        .select(F.col("event_type"),
          F.get_json_object(F.col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).as("n"), F.sum("k").as("k_sum"),
          F.min("k").as("k_min"), F.max("k").as("k_max"))
        .orderBy("event_type")),
    "q_decontaminate" -> ((s, dir) => {
      // benchmark-overlap decontamination, hash-checked: every 50th
      // document stands in as the held-out benchmark; its distinct 8-gram
      // set broadcasts, so only matched (id, gram) pairs reach a shuffle
      val d = docs(s, dir)
      Decontam.contaminationReport(d, d.where(F.col("doc_id") % 50 === 0),
          "doc_id", "text", n = 8)
        .orderBy("id")
    }),
    "q_decontam_fuzzy" -> ((s, dir) => {
      // near-verbatim leakage detection, hash-checked: shared-5-gram
      // candidates (stop-gram capped) verified by Levenshtein over
      // normalized 400-char prefixes — DuckDB replays the candidate
      // join AND the edit-distance DP exactly
      val d = docs(s, dir)
      Decontam.fuzzyContaminationReport(d, d.where(F.col("doc_id") % 50 === 0),
          "doc_id", "text", k = 5, maxGramDocs = 50)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "bench_id")
    }),
    "q_pack_sequences" -> ((s, dir) => {
      // concat-and-chunk packing at 1024 tokens/sequence, hash-checked:
      // global token offsets come from the distributed prefix sum (no
      // single-partition window anywhere in the plan)
      val d = docs(s, dir).select(F.col("doc_id"),
        TextOps.tokenCount(F.coalesce(F.col("text"), F.lit(""))).cast("long")
          .as("n_tokens"))
      Packing.packSequences(d, "doc_id", "n_tokens", 1024L).orderBy("id")
    }),
    "q_domain_mix" -> ((s, dir) => {
      // deterministic domain-mix resampling toward en30/de20/es20/fr15/zh15,
      // hash-checked end-to-end: integer thresholds over md5 id-buckets
      // make the surviving id SET engine-replayable, so per-domain counts
      // AND id-sums must match exactly
      val mixed = Sampling.domainMixSample(docs(s, dir), "lang", "doc_id",
        Map("en" -> 30L, "de" -> 20L, "es" -> 20L, "fr" -> 15L, "zh" -> 15L),
        buckets = 10000)
      mixed.groupBy("lang")
        .agg(F.count(F.lit(1)).as("n_docs"), F.sum("doc_id").as("id_sum"))
        .orderBy("lang")
    }),
    "q_robust_outliers" -> ((s, dir) =>
      // median/MAD robust z-scores, hash-checked end-to-end: both
      // medians come from the exact rank-select construction with
      // quantile_disc semantics, so DuckDB replays the scalars AND every
      // per-row score; threshold 1.2 so the report carries real flags
      Outliers.flag(events(s, dir), "value", threshold = 1.2)
        .where(F.col("event_id") < 100)
        .select(F.col("event_id"), F.round(F.col("value"), 2).as("value_r"),
          F.col("robust_z"), F.col("is_outlier"))
        .orderBy("event_id")),
    "q_data_quality" -> ((s, dir) =>
      // declarative contract validation (the Deequ shape) in ONE shared
      // aggregate scan, hash-checked: null/range/uniqueness/accepted-
      // values/regex rules compile to conditional counts — the range
      // rule is deliberately tight so the report carries real failures
      Validation.check(docs(s, dir), Seq(
          Validation.NotNull("text"),
          Validation.Unique("doc_id"),
          Validation.AcceptedValues("lang", Seq("en", "de", "es", "fr", "zh")),
          Validation.InRange("n_chars", 100.0, 500.0),
          Validation.MatchesRegex("source", "src[0-9]+")))
        .orderBy("column", "rule")),
    "q_ntile_buckets" -> ((s, dir) =>
      // tie-stable quantile binning on a heavily-tied column
      // (l_quantity: 50 distinct values), hash-checked: same-value rows
      // must share a bucket — the property NTILE lacks — and the DuckDB
      // rank() replay pins every assignment
      Ranks.quantileBuckets(
          li(s, dir).where(F.col("l_orderkey") < 200)
            .select(F.col("l_orderkey"), F.col("l_linenumber").cast("long")
              .as("l_linenumber"), F.col("l_quantity")),
          "l_quantity", k = 5)
        .select(F.col("l_orderkey"), F.col("l_linenumber"),
          F.col("l_quantity").cast("long").as("l_quantity"), F.col("bucket"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")),
    "q_corpus_report" -> ((s, dir) =>
      // per-language corpus data card, hash-checked: volumes, dup
      // pressure (distinct digests), and the quality profile from ONE
      // scan + one groupBy — the before/after summary of a curation
      // stage
      TextOps.corpusReport(docs(s, dir), "text", "lang")),
    "q_kfold" -> ((s, dir) =>
      // content-addressed 5-fold CV assignment, hash-checked: per-fold
      // counts AND id sums pin every row's fold — stable across layouts,
      // cluster sizes, and engines
      Sampling.kFolds(docs(s, dir), "doc_id", 5)
        .groupBy("fold")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum("doc_id").as("id_sum"))
        .orderBy("fold")),
    "q_weighted_sample" -> ((s, dir) =>
      // length-proportional Bernoulli sample, hash-checked: inclusion
      // p_i = min(1, f·N·wᵢ/W) over md5 buckets makes the surviving row
      // SET engine-replayable — a fraction-0.2 sample that carries ≈0.2
      // of the corpus CHARS instead of over-representing short docs
      Sampling.weightedHashSample(
          docs(s, dir).select("doc_id", "n_chars"), "n_chars", "doc_id",
          fraction = 0.2)
        .orderBy("doc_id")),
    "q_repetition" -> ((s, dir) =>
      // Gopher-style repetition filters, hash-checked per doc: token
      // duplication ratio + top-bigram share + the filter flag, replayed
      // in DuckDB list algebra
      TextOps.repetitionFeatures(docs(s, dir).where(F.col("doc_id") < 100), "text")
        .select("doc_id", "n_tokens", "dup_token_ratio",
          "top_bigram_share", "is_repetitive")
        .orderBy("doc_id")),
    "q_chunk_docs" -> ((s, dir) =>
      // context-window chunking (32-token windows, 8-token overlap),
      // hash-checked on the full chunk strings: DuckDB replays the
      // stride arithmetic with list slices
      TextOps.chunkDocuments(docs(s, dir).where(F.col("doc_id") < 20),
          "doc_id", "text", chunkSize = 32, overlap = 8)
        .orderBy("doc_id", "chunk_id")),
    "q_train_split" -> ((s, dir) =>
      // deterministic 90/5/5 split assignment by md5(doc_id) bucket —
      // content-addressed, so the same doc lands in the same split on any
      // partitioning/cluster/engine (randomSplit can't promise that).
      // Hash-checked: DuckDB replays the md5-hex bucket and CASE ranges.
      Sampling.deterministicSplit(docs(s, dir), "doc_id")
        .groupBy("split")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.min("split_bucket").as("min_bucket"),
          F.max("split_bucket").as("max_bucket"))
        .orderBy("split")),
    "q_global_shuffle" -> ((s, dir) =>
      // deterministic corpus shuffle: total order by md5(doc_id ":" seed)
      // (tie-broken by id), positions 0..n-1 assigned via the
      // prefix-sum construction — one range shuffle, driver sees only
      // per-partition counts. The full (doc_id, position) permutation is
      // hash-checked against DuckDB's row_number over the same md5 order.
      Sampling.globalShuffle(docs(s, dir), "doc_id", seed = 42L)
        .select("doc_id", "position").orderBy("position")),
    "q_pii_mask" -> ((s, dir) => {
      // normalization + PII scrubbing, hash-checked on the full output
      // strings: the synthetic corpus carries no PII, so the query plants
      // deterministic emails/IPs/SSN-shaped ids (same construction in the
      // oracle), then masks them through the codegen'd regexp chain. The
      // patterns live in the Java∩RE2 subset so DuckDB replays them.
      val d = docs(s, dir).where(F.col("doc_id") < 50)
        .withColumn("aug", F.concat(
          F.lit("User user"), F.col("doc_id"), F.lit("@Example.COM  \t"),
          F.coalesce(F.col("text"), F.lit("")),
          F.lit(" ip 10.0."), F.col("doc_id") % 256,
          F.lit(".7 id 123-45-6789 end")))
      TextOps.withCleanText(d, "aug")
        .select(F.col("doc_id"),
          F.col("n_emails").cast("long").as("n_emails"),
          F.col("n_ips").cast("long").as("n_ips"),
          F.col("n_ids").cast("long").as("n_ids"),
          F.col("clean_text"))
        .orderBy("doc_id")
    }),
    "q_clean_pipeline" -> ((s, dir) => {
      // the composed curation pipeline end-to-end: quality scoring →
      // threshold filter → exact dedup (min-id survivor) → per-language
      // token budget. One hash row covers the COMPOSITION of three
      // operators, not just each in isolation
      // rank-1-per-hash keeps the min-doc_id survivor in ONE pass over
      // the scored frame — a groupBy+self-join would evaluate the
      // regex-heavy scoring subtree twice
      val w = Window.partitionBy(F.md5(F.col("text").cast("binary")))
        .orderBy(F.col("doc_id").asc)
      TextOps.qualityScore(docs(s, dir), "text")
        .where(F.col("quality_score") >= 0.5)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") === 1)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum("n_tokens").cast("long").as("total_tokens"),
          F.round(F.avg("quality_score"), 6).as("avg_quality"))
        .orderBy("lang")
    }),
    "q_time_windows" -> ((s, dir) =>
      // tumbling 1-hour windows over the event stream (batch analog of
      // the streaming windowed aggregates): integer nanos division keeps
      // the bucketing exact — a double division would lose precision at
      // 1.7e18 ns
      events(s, dir)
        .withColumn("hour_bucket", F.expr("ts div 3600000000000"))
        .groupBy("hour_bucket", "event_type")
        .agg(F.count(F.lit(1)).as("n_events"),
          F.countDistinct(F.col("user_id")).as("n_users"),
          F.round(F.avg("value"), 6).as("avg_value"))
        .orderBy("hour_bucket", "event_type")),
    "q_vocab_topk" -> ((s, dir) =>
      // vocabulary-building pass: top tokens with doc frequency, one
      // token shuffle + bounded top-k
      TextOps.vocabTopK(docs(s, dir), "doc_id", "text", 100)),
    "q_pmi" -> ((s, dir) =>
      // collocation mining: top bigrams by PMI with a min-count floor;
      // vocabulary-sized shuffles, rounded-pmi TakeOrdered top-k
      TextOps.pmiCollocations(docs(s, dir), "doc_id", "text",
        minCount = 5L, k = 50)),
    "q_textrank" -> ((s, dir) =>
      // graph-based keywords: PageRank over the window-2 token
      // co-occurrence graph, 2 fixed rounds — DuckDB replays edge
      // construction AND both rounds as chained CTEs
      TextOps.textRank(docs(s, dir), "doc_id", "text",
        window = 2, iters = 2, k = 20)),
    "q_zipf" -> ((s, dir) =>
      // Zipf slope of the vocabulary: ln-count vs ln-rank OLS over the
      // top-200 terms — one vocab aggregation + a <=200-row fold
      TextOps.zipfFit(docs(s, dir), "doc_id", "text", topN = 200)),
    "q_tfidf_top" -> ((s, dir) =>
      // per-doc top-3 terms by smoothed TF-IDF; corpus-wide df,
      // broadcast-joined to the target slice's tf
      TextOps.tfidfTopTerms(docs(s, dir),
        docs(s, dir).where(F.col("doc_id") < 50), "doc_id", "text", 3)
        .orderBy("id", "rank")),
    "q_jaccard_exact" -> ((s, dir) => {
      // the exact n-gram Jaccard verifier behind MinHash candidate
      // filtering, hash-checked pairwise on a deterministic doc slice —
      // word 3-gram shingle sets are reproducible in DuckDB list algebra
      val j = F.udf((a: String, b: String) => Dedup.ngramJaccard(a, b))
      val d = docs(s, dir)
        .select(F.col("doc_id"), F.coalesce(F.col("text"), F.lit("")).as("text"))
        .where(F.col("doc_id") < 16)
      val a = d.select(F.col("doc_id").as("id_a"), F.col("text").as("ta"))
      val b = d.select(F.col("doc_id").as("id_b"), F.col("text").as("tb"))
      a.join(b, F.col("id_a") < F.col("id_b"))
        .select(F.col("id_a"), F.col("id_b"),
          F.round(j(F.col("ta"), F.col("tb")), 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),
    "q_image_decode" -> ((s, dir) => {
      // REAL image decode, hash-checked: synthesize a deterministic PNG
      // per doc_id on executors, decode it back with javax.imageio, and
      // report dimensions + mean luma — all SQL-expressible from doc_id
      // alone because the payload is constructed, lossless, and constant
      val pngUdf = F.udf((id: Long) => Multimodal.syntheticPng(id))
      Multimodal.extractFeatures(
        docs(s, dir).select(F.col("doc_id")).where(F.col("doc_id") < 64)
          .withColumn("payload", pngUdf(F.col("doc_id"))),
        "payload")
        .select(F.col("doc_id"),
          F.col("width").cast("long").as("width"),
          F.col("height").cast("long").as("height"),
          F.col("format"),
          F.round(F.element_at(F.col("features"), 4).cast("double"), 5).as("luma_mean"))
        .orderBy("doc_id")
    }),
    "q_image_resize" -> ((s, dir) => {
      // REAL resize, hash-checked through a decode round-trip: constant-
      // fill PNGs are invariant under bilinear resampling, so the 8×8
      // output's dimensions AND mean luma are SQL-predictable from doc_id
      val pngUdf = F.udf((id: Long) => Multimodal.syntheticPng(id))
      Multimodal.extractFeatures(
        Multimodal.resizeImages(
          docs(s, dir).select(F.col("doc_id")).where(F.col("doc_id") < 64)
            .withColumn("payload", pngUdf(F.col("doc_id"))),
          "payload", 8, 8)
          .select(F.col("doc_id"), F.col("resized")),
        "resized")
        .select(F.col("doc_id"),
          F.col("width").cast("long").as("width"),
          F.col("height").cast("long").as("height"),
          F.round(F.element_at(F.col("features"), 4).cast("double"), 5).as("luma_mean"))
        .orderBy("doc_id")
    }),
    "q_frame_sample" -> ((s, dir) => {
      // REAL video-style frame sampling, hash-checked: synthetic animated
      // GIFs (4 + id%5 frames), keep every 2nd frame; each kept frame's
      // dimensions and mean luma are SQL-predictable from (doc_id, k)
      val gifUdf = F.udf((id: Long) => Multimodal.syntheticGif(id, (4 + id % 5).toInt))
      Multimodal.extractFeatures(
        Multimodal.sampleFrames(
          docs(s, dir).select(F.col("doc_id")).where(F.col("doc_id") < 48)
            .withColumn("payload", gifUdf(F.col("doc_id"))),
          "payload", every = 2),
        "frame")
        .select(F.col("doc_id"),
          F.col("frame_index").cast("long").as("frame_index"),
          F.col("width").cast("long").as("width"),
          F.round(F.element_at(F.col("features"), 4).cast("double"), 5).as("luma_mean"))
        .orderBy("doc_id", "frame_index")
    }),
    "q_audio_features" -> ((s, dir) => {
      // REAL audio decode, hash-checked: synthetic constant-PCM WAVs make
      // rate / frames / duration / rms SQL-predictable from doc_id
      val wavUdf = F.udf((id: Long) => Multimodal.syntheticWav(id))
      Multimodal.extractAudioFeatures(
        docs(s, dir).select(F.col("doc_id")).where(F.col("doc_id") < 64)
          .withColumn("payload", wavUdf(F.col("doc_id"))),
        "payload")
        .select(F.col("doc_id"), F.col("sample_rate"),
          F.col("channels").cast("long").as("channels"),
          F.col("n_frames"),
          F.round(F.col("duration_s"), 6).as("duration_s"),
          F.round(F.col("rms"), 6).as("rms"))
        .orderBy("doc_id")
    }),
    "q_media_meta" -> ((s, dir) =>
      // SQL-expressible slice of the multimodal surface (n_bytes + format
      // sniff) so the binary-column plumbing gets an exact oracle row
      Multimodal.extractFeatures(
        docs(s, dir).select(F.col("doc_id"), F.col("text").cast("binary").as("payload")),
        "payload")
        .select("doc_id", "n_bytes", "format")
        .orderBy("doc_id")),
    "q_qq_plot" -> ((s, dir) =>
      // distributed Q-Q data against a FIXED expon(0, 1000) model — exact
      // order statistics via the scale-safe rank-select path
      PlotData.qqDist(li(s, dir), "l_extendedprice", "expon",
        Array(0.0, 1000.0), points = 100).orderBy("rank")),
    "q_pp_plot" -> ((s, dir) =>
      PlotData.ppDist(li(s, dir), "l_extendedprice", "expon",
        Array(0.0, 1000.0), points = 100).orderBy("rank")),

    // ---- generation / multivariate (G1-G7, M13, M14, P2, A8) ----
    "q_generate_grid" -> ((s, dir) =>
      // G1/D4 hash row: the midpoint-grid generation mode is partition-
      // independent and RNG-free, so a uniform grid's count / mean /
      // extremes replay exactly in SQL (same loc + scale·u op shape)
      Sampling.generateGrid(s, "uniform", Array(10.0, 70.0), 100000L,
        numPartitions = 32)
        .agg(F.count(F.lit(1)).as("n"),
          F.round(F.avg("sample"), 6).as("mean_s"),
          F.round(F.min("sample"), 6).as("min_s"),
          F.round(F.max("sample"), 6).as("max_s"))),
    "q_generate_samples" -> ((s, dir) => {
      // G1/G2: fit best family to l_extendedprice, generate 100K rows
      // distributed, report the generated sample's stats
      val best = cachedFit(s, dir, Seq("l_extendedprice")).best(1, "aic").head()
      Sampling.generate(s, best.getAs[String]("distribution"),
          best.getSeq[Double](best.fieldIndex("parameters")).toArray, 100000L, seed = 42L)
        .agg(F.count(F.lit(1)).as("n"),
          F.round(F.avg("sample"), 2).as("mean"),
          F.round(F.stddev_pop("sample"), 2).as("std"))
    }),
    "q_stratified_sample" -> ((s, dir) =>
      // P2: stratified sample with tail boost; per-bin deterministic counts
      Sampling.stratifiedSample(li(s, dir), "l_extendedprice", 0.1, numBins = 5, seed = 42L)
        .agg(F.count(F.lit(1)).as("n_sampled"),
          F.round(F.min("l_extendedprice"), 2).as("mn"),
          F.round(F.max("l_extendedprice"), 2).as("mx"))),
    "q_copula_sample" -> ((s, dir) => {
      // G2/G5's RNG form rides the SAME memo-shared copula spec as
      // q_copula_fit / q_copula_serde: the marginal fit + Spearman +
      // Cholesky are paid ONCE per bench by whichever copula query runs
      // first, so this row times what it is named for — the DISTRIBUTED
      // sampling machinery (partition-seeded draws → Cholesky →
      // Φ → marginal ppf) — instead of a third copy of the fit.
      // Family-diverse ppf coverage lives in q_copula_sample_fixed and
      // q_generate_grid; the sampled-moment sanity stays rows-only (RNG).
      val cop = cappedNormCopula(s, dir)
      val sampled = cop.sampleDistributed(s, 50000L, seed = 42L)
      sampled.agg(
        F.count(F.lit(1)).as("n"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 2).as("corr_pq"),
        F.round(F.avg("l_extendedprice"), 0).as("mean_price"))
    }),
    "q_copula_sample_fixed" -> ((s, _) =>
      // G5's distributed-generation twin hash-checked END-TO-END: md5
      // coordinates replace the PRNG (the q_bootstrap_hash discipline),
      // a pinned rho=0.6 correlation goes through the REAL commons-math
      // Cholesky, Phi is the REAL Cody erfc (branch 1 only — a pure
      // rational polynomial, so DuckDB replays it with plain
      // arithmetic), and the expon/uniform marginals apply their exact
      // ppf. Every one of the 300x2 generated values hash-checks at 6
      // decimals — the draw -> correlate -> Phi -> ppf pipeline is
      // SQL-replayed arithmetically (see hashSampleAudit's scaladoc for
      // the one ulp-level log1p caveat and why it cannot flake).
      new GaussianCopula(
        Seq(Marginal("x_expon", "expon", Array(10.0, 200.0)),
          Marginal("x_unif", "uniform", Array(5.0, 50.0))),
        Array(Array(1.0, 0.6), Array(0.6, 1.0)))
        .hashSampleAudit(s, 300).orderBy("sample_id")),
    "q_mvn_fit" -> ((s, dir) => {
      import s.implicits._
      val mvn = MultivariateNormal.fit(li(s, dir),
        Seq("l_extendedprice", "l_quantity", "l_discount"))
      mvn.columns.zipWithIndex.map { case (c, i) =>
        (c, math.round(mvn.mean(i) * 100) / 100.0,
          math.round(mvn.cov(i)(i) * 100) / 100.0,
          math.round(mvn.correlation(i)((i + 1) % 3) * 1e6) / 1e6)
      }.toDF("column", "mean", "variance", "corr_next")
    }),
    "q_mvn_serde" -> ((s, dir) => {
      // S5 hash row: the MVN model goes save -> JSON -> load, and the
      // output reads means/variances/correlations from the ROUND-TRIPPED
      // object against the same moment SQL as q_mvn_fit — proving the
      // multivariate sink preserves the mean vector and covariance
      // matrix exactly (correlation is derived from the loaded cov).
      import s.implicits._
      val mvn = MultivariateNormal.fit(li(s, dir),
        Seq("l_extendedprice", "l_quantity", "l_discount"))
      val p = java.nio.file.Files.createTempFile("graft_mvn", ".json")
      Serialization.saveMvn(mvn, p.toString)
      val back = Serialization.loadMvn(p.toString)
      java.nio.file.Files.delete(p)
      back.columns.zipWithIndex.map { case (c, i) =>
        (c, math.round(back.mean(i) * 100) / 100.0,
          math.round(back.cov(i)(i) * 100) / 100.0,
          math.round(back.correlation(i)((i + 1) % 3) * 1e6) / 1e6)
      }.toDF("column", "mean", "variance", "corr_next")
    }),
    "q_gmm" -> ((s, dir) => {
      // EM parameter estimates stabilize well below 100K rows; the
      // key-capped input bounds the per-row breeze density evaluation
      // (non-codegen) as SF grows.
      // 8 partitions, not 32: EM here is scheduling-bound (30 iterations
      // of sub-ms tasks), so fewer/larger partitions cut wall time
      val capped = keyCappedLineitem(s, dir, 50000, Seq("l_extendedprice"))
        .repartition(8)
      val (r, _) = Mixture.fit(capped, Seq("l_extendedprice"), k = 3, seed = 42L,
        maxIter = 30, tol = 1e-3)
      // distributed EM partial sums reduce in nondeterministic order, so
      // raw doubles wobble at ~1e-12 across runs — round well above that
      // noise floor so repeated runs emit byte-identical rows
      Mixture.report(s, r)
        .withColumn("weight", F.round(F.col("weight"), 6))
        .withColumn("means", arrStr(F.transform(F.col("means"), x => F.round(x, 3))))
        .withColumn("variances",
          arrStr(F.transform(F.col("variances"), x => F.round(x, 1))))
        .withColumn("aic", F.round(F.col("aic"), 1))
        .withColumn("bic", F.round(F.col("bic"), 1))
        .orderBy("component")
    }),
    "q_bootstrap_ci" -> ((s, dir) => {
      import s.implicits._
      val sample = Fitter.fittingSample(li(s, dir), "l_extendedprice", 2000, 42L)
      Bootstrap.confidenceIntervals(s, graft.dists.ContinuousFamilies.Norm,
          sample, b = 200, seed = 42L)
        .map(ci => (ci.param, math.round(ci.lower * 10) / 10.0,
          math.round(ci.upper * 10) / 10.0))
        .toDF("param", "lower", "upper")
    }),
    "q_bootstrap_hash" -> ((s, dir) =>
      // M13's resampling pipeline hash-checked END-TO-END: md5-indexed
      // draws replace the PRNG, the replicate statistic is an
      // integer-exact sum, and DuckDB replays every draw, every replicate
      // sum, and the percentile interpolation — the audit twin of the
      // seeded q_bootstrap_ci above
      Bootstrap.hashResampleCI(
        s.read.parquet(s"$dir/orders.parquet")
          .where(F.col("o_orderkey") < 2000).select("o_custkey"),
        "o_custkey", b = 200)),
    "q_gmm_score" -> ((s, dir) =>
      // G7's serving path hash-checked: score every row under a FIXED
      // 2-component mixture (as if loaded from the JSON sink) — the
      // max-factored logsumexp density and the argmax assignment are pure
      // codegen'd arithmetic, so DuckDB replays per-row log-likelihoods
      // and hard assignments exactly; only integer counts and well-
      // rounded sums shuffle
      Mixture.score(li(s, dir).where(F.col("l_extendedprice").isNotNull),
          Seq("l_extendedprice"),
          weights = Array(0.6, 0.4),
          means = Array(Array(20000.0), Array(60000.0)),
          variances = Array(Array(2.0e8), Array(4.0e8)))
        .groupBy("component")
        .agg(F.count(F.lit(1)).as("n"),
          F.round(F.sum("loglik"), 2).as("ll_sum"),
          F.round(F.avg("loglik"), 6).as("ll_avg"))
        .orderBy("component")),
    "q_gmm_serde" -> ((s, dir) => {
      // S5's GMM sink hash-checked: a fixed mixture goes save -> JSON ->
      // load, and every row is scored with the ROUND-TRIPPED weights/
      // means/covariances against the SAME oracle as q_gmm_score — a
      // green hash proves the sink preserves the model exactly (any
      // parameter drift would move log-likelihoods and assignments)
      val model = GaussianMixtureResult(
        columns = Seq("l_extendedprice"),
        weights = Array(0.6, 0.4),
        means = Array(Array(20000.0), Array(60000.0)),
        covariances = Array(Array(Array(2.0e8)), Array(Array(4.0e8))),
        logLikelihood = -1.0, n = 1L, aic = 0.0, bic = 0.0)
      val p = java.nio.file.Files.createTempFile("graft_gmm", ".json")
      Serialization.saveGmm(model, p.toString)
      val back = Serialization.loadGmm(p.toString)
      java.nio.file.Files.delete(p)
      Mixture.score(li(s, dir).where(F.col("l_extendedprice").isNotNull),
          back.columns, back.weights, back.means,
          back.covariances.map(c => Array(c(0)(0))))
        .groupBy("component")
        .agg(F.count(F.lit(1)).as("n"),
          F.round(F.sum("loglik"), 2).as("ll_sum"),
          F.round(F.avg("loglik"), 6).as("ll_avg"))
        .orderBy("component")
    }),
    "q_copula_fit" -> ((s, dir) => {
      // G4's fit path hash-checked: norm marginals on the full column
      // (SQL-exact MLE), the scale-safe min-rank Spearman, and the
      // 2x2 Cholesky factor the sampler consumes — everything DuckDB can
      // replay: avg/stddev_pop, corr over rank(), and sqrt(1-rho^2)
      import s.implicits._
      // everything fits over the SAME layout-stable key-capped slice
      // (marginal MLE and Spearman alike): the cap is a key predicate the
      // oracle replays verbatim, the lifted sample cap makes the norm
      // params SQL-exact over that slice, and the full-table Spearman
      // cost stays on q_corr_spearman where it is the thing measured
      val cop = cappedNormCopula(s, dir)
      val rho = cop.correlation(0)(1)
      val l = cop.cholesky
      val m = cop.marginals
      def r6(x: Double) = math.round(x * 1e6) / 1e6
      def r4(x: Double) = math.round(x * 1e4) / 1e4
      Seq(
        ("chol_row2", r6(l(1)(0)), r6(l(1)(1))),
        ("marginal_loc", r4(m(0).params(0)), r4(m(1).params(0))),
        ("marginal_scale", r4(m(0).params(1)), r4(m(1).params(1))),
        ("spearman", r6(rho), if (m.forall(_.distName == "norm")) 1.0 else 0.0))
        .toDF("stat", "v1", "v2").orderBy("stat")
    }),
    "q_fit_drift" -> ((s, dir) => {
      // model drift between two fit snapshots, hash-checked end-to-end:
      // ONE grouped shared-scan fit estimates norm params on the even-
      // and odd-orderkey halves (SF-independent parity split, SQL-exact
      // MLE with the lifted sample cap), then the closed-form normal KL
      // in both directions — the fit-vs-fit monitoring metric, replayed
      // by DuckDB as avg/stddev_pop + the same formula
      import s.implicits._
      val half = li(s, dir).select(
        F.when(F.col("l_orderkey") % 2 === 0, "a").otherwise("b").as("g"),
        F.col("l_extendedprice"))
      val fr = Fitter.fitGrouped(s, half, "g", "l_extendedprice",
        Some(Seq("norm")), FitConfig(fittingSampleSize = 4000000))
      val byG = fr.df.select("column_name", "parameters").collect()
        .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      fr.unpersist()
      val (m1, s1) = (byG("a")(0), byG("a")(1))
      val (m2, s2) = (byG("b")(0), byG("b")(1))
      def r4(x: Double) = math.round(x * 1e4) / 1e4
      def r8(x: Double) = math.round(x * 1e8) / 1e8
      Seq((r4(m1), r4(s1), r4(m2), r4(s2),
        r8(graft.functions.Metrics.klNormal(m1, s1, m2, s2)),
        r8(graft.functions.Metrics.klNormal(m2, s2, m1, s1))))
        .toDF("mean_a", "std_a", "mean_b", "std_b", "kl_ab", "kl_ba")
    }),
    "q_drift_psi" -> ((s, dir) =>
      // Population Stability Index between the parity halves of the
      // price column, hash-checked: one (cohort, bin) conditional-sum
      // aggregate (exchange carries <= bins rows), Laplace-smoothed
      // probabilities, PSI + KL both ways — the standard serving-time
      // feature-drift gauge, replayed exactly by DuckDB
      Drift.histDrift(
        li(s, dir).select(
          F.when(F.col("l_orderkey") % 2 === 0, "a").otherwise("b").as("cohort"),
          F.col("l_extendedprice")),
        "cohort", "l_extendedprice", binStart = 0.0, binWidth = 5500.0,
        numBins = 20)
        .select(F.round(F.col("psi"), 8).as("psi"),
          F.round(F.col("kl_ab"), 8).as("kl_ab"),
          F.round(F.col("kl_ba"), 8).as("kl_ba"),
          F.col("n_a"), F.col("n_b"), F.col("n_cells"))),
    "q_drift_psi_by_group" -> ((s, dir) =>
      // per-GROUP drift in one pass: "which return-flag segments
      // drifted?" — (group, bin) conditional sums, per-group totals over
      // the tiny cell frame, smoothed PSI/KL per group; a driver loop of
      // histDrift calls would launch one job per group
      Drift.histDriftByGroup(
        li(s, dir).select(F.col("l_returnflag"),
          F.when(F.col("l_orderkey") % 2 === 0, "a").otherwise("b").as("cohort"),
          F.col("l_extendedprice")),
        "cohort", "l_extendedprice", Seq("l_returnflag"),
        binStart = 0.0, binWidth = 5500.0, numBins = 20)
        .select(F.col("l_returnflag"),
          F.round(F.col("psi"), 8).as("psi"),
          F.round(F.col("kl_ab"), 8).as("kl_ab"),
          F.round(F.col("kl_ba"), 8).as("kl_ba"),
          F.col("n_a"), F.col("n_b"), F.col("n_cells"))
        .orderBy("l_returnflag")),
    "q_drift_pmf" -> ((s, dir) =>
      // the categorical twin: event-type mix drift between user-parity
      // cohorts — label/source-mix drift over the union support
      Drift.pmfDrift(
        events(s, dir).select(
          F.when(F.col("user_id") % 2 === 0, "a").otherwise("b").as("cohort"),
          F.col("event_type")),
        "cohort", "event_type")
        .select(F.round(F.col("psi"), 8).as("psi"),
          F.round(F.col("kl_ab"), 8).as("kl_ab"),
          F.round(F.col("kl_ba"), 8).as("kl_ba"),
          F.col("n_a"), F.col("n_b"), F.col("n_cells"))),
    "q_drift_ks" -> ((s, dir) =>
      // two-sample KS between the parity cohorts, hash-checked: the
      // scale-safe prefix-sum construction (no global window) must land
      // on the exact integer-ratio D that DuckDB's cumulative-window
      // replay computes
      Drift.ksTwoSample(
        li(s, dir).select(
          F.when(F.col("l_orderkey") % 2 === 0, "a").otherwise("b").as("cohort"),
          F.col("l_extendedprice")),
        "cohort", "l_extendedprice")
        .select(F.round(F.col("ks_d"), 9).as("ks_d"),
          F.col("n_a"), F.col("n_b"))),
    "q_drift_wasserstein" -> ((s, dir) =>
      // exact 1-D Wasserstein-1 between the parity cohorts — the
      // magnitude-aware companion to q_drift_ks (HOW MUCH the CDFs
      // differ, in price units): same prefix-sum construction, plus
      // the per-partition boundary gap tiling the |Fa−Fb| integral
      Drift.wassersteinTwoSample(
        li(s, dir).select(
          F.when(F.col("l_orderkey") % 2 === 0, "a").otherwise("b").as("cohort"),
          F.col("l_extendedprice")),
        "cohort", "l_extendedprice")),
    "q_drift_jsd_by_group" -> ((s, dir) =>
      // bounded symmetric drift per language: did the SOURCE mix move
      // between the doc-parity cohorts? JSD stays finite on mass a
      // cohort lacks (KL does not) — same smoothed cells frame as
      // q_drift_psi_by_group, windows partitioned by group
      Drift.jsdByGroup(
        docs(s, dir).select(F.col("lang"),
          F.when(F.col("doc_id") % 2 === 0, "a").otherwise("b").as("cohort"),
          F.col("source")),
        "cohort", "source", Seq("lang"))
        .orderBy("lang")),
    "q_drift_ks_sketch" -> ((s, dir) => {
      // the mergeable-sketch K-S audited against the exact construction
      // (composed HERE — the operator itself is sketch-only by design):
      // the KLL-probed estimate must land within the KLL+grid error
      // bound of the exact integer-ratio D that DuckDB replays; a
      // sketch/merge/probe regression flips within_tol and reddens the
      // hash
      val cohorts = li(s, dir).select(
        F.when(F.col("l_orderkey") % 2 === 0, "a").otherwise("b").as("cohort"),
        F.col("l_extendedprice"))
      val sk = Drift.ksTwoSampleSketch(cohorts, "cohort", "l_extendedprice")
        .head()
      val est = sk.getAs[Double]("ks_est")
      val pEst = sk.getAs[Double]("p_value")
      // sketch p consistency: kolmogorovSf is decreasing in D, so the
      // sketch p must land inside the p-band the d-tolerance implies —
      // checked through the driver-side series, independent of the
      // column-arithmetic p_exact below
      // band slack 2e-6: pEst was rounded to 6 decimals by the sketch
      // row (error ≤ 5e-7), so a 1e-9 slack could redden a valid
      // estimate sitting on a band edge
      val pBand = F.udf((d: Double, na: Long, nb: Long) => {
        val nEff = na.toDouble * nb / (na.toDouble + nb)
        val lo = graft.functions.SpecialMath.kolmogorovSf(
          math.sqrt(nEff) * (d + 0.02))
        val hi = graft.functions.SpecialMath.kolmogorovSf(
          math.sqrt(nEff) * math.max(0.0, d - 0.02))
        pEst >= lo - 2e-6 && pEst <= hi + 2e-6
      })
      val exact = Drift.ksTwoSample(cohorts, "cohort", "l_extendedprice")
        .select((F.abs(F.lit(est) - F.col("ks_d")) <= 0.02).as("within_tol"),
          pBand(F.col("ks_d"), F.col("n_a"), F.col("n_b")).as("p_within_tol"),
          F.round(F.col("ks_d"), 9).as("ks_d"),
          F.col("n_a"), F.col("n_b"))
      // exact-D significance, SQL-replayed: the Kolmogorov tail series
      // Σ 2(−1)^{j+1} e^{−2j²t²} at t = √(n_a·n_b/(n_a+n_b))·D — the
      // same arithmetic DuckDB folds over generate_series(1,100), both
      // sides reading the ROUNDED ks_d so the inputs agree bit-exactly
      val tt = F.sqrt(F.col("n_a").cast("double") * F.col("n_b") /
        (F.col("n_a") + F.col("n_b"))) * F.col("ks_d")
      val series = F.aggregate(F.sequence(F.lit(1), F.lit(100)), F.lit(0.0),
        (acc, j) => acc + F.lit(2.0) * F.pow(F.lit(-1.0), j + 1) *
          F.exp(F.lit(-2.0) * j * j * tt * tt))
      exact.withColumn("p_exact",
        F.round(F.least(F.lit(1.0), F.greatest(F.lit(0.0), series)), 6))
    }),
    "q_drift_mwu" -> ((s, dir) =>
      // Mann–Whitney rank-sum between the parity cohorts, hash-checked
      // END TO END including the p-value: U and the tie sum are exact
      // integer/half-integer sums (bit-identical to DuckDB's window
      // replay), z is rounded to 6 decimals BEFORE the erfc, and the
      // oracle carries the SAME Cody rational-Chebyshev erfc unrolled
      // into SQL (all three branches) — the only cross-engine gap is
      // exp() ULPs, absorbed by the p rounding
      StatTests.mannWhitneyU(
        li(s, dir).select(
          F.when(F.col("l_orderkey") % 2 === 0, "a").otherwise("b").as("cohort"),
          F.col("l_extendedprice")),
        "cohort", "l_extendedprice")),
    "q_drift_cvm" -> ((s, dir) =>
      // Cramér–von Mises L² distance between the parity cohorts — the
      // whole-shape complement to K-S's sup distance. The statistic is
      // an exact integer-ratio sum over the pooled ECDF (hash-checked);
      // the asymptotic ω² p-value rides a Bessel-K¼ series no SQL
      // engine carries, so the API's p is pinned by the ScalaTest
      // critical-value suite instead of the oracle
      StatTests.cvmTwoSample(
        li(s, dir).select(
          F.when(F.col("l_orderkey") % 2 === 0, "a").otherwise("b").as("cohort"),
          F.col("l_extendedprice")),
        "cohort", "l_extendedprice")
        .select(F.col("cvm_t"), F.col("n_a"), F.col("n_b"))),
    "q_drift_chi2" -> ((s, dir) =>
      // chi-squared homogeneity of the order-priority mix between
      // customer-parity cohorts, p-value included: the 5-cell support
      // gives dof = 4, so Q(dof/2, X²/2) is a finite Poisson sum the
      // oracle replays from the ROUNDED X² — integer counts in, exact
      // expected-count arithmetic, 6-decimal rounding out
      StatTests.chiSquareTwoSample(
        s.read.parquet(s"$dir/orders.parquet").select(
          F.when(F.col("o_custkey") % 2 === 0, "a").otherwise("b").as("cohort"),
          F.col("o_orderpriority")),
        "cohort", "o_orderpriority")),
    "q_chi2_gof_group" -> ((s, dir) =>
      // per-GROUP chi-squared uniformity over a SHARED 7-cell support
      // (user_id mod 7 within each event type) — ONE aggregation tests
      // every group; X² folds from three sufficient statistics
      // (Σo², n, observed cells) so missing cells cost nothing, and the
      // per-GROUP p-value is Q(3, X²/2) from the rounded X²
      StatTests.chiSquareGofByGroup(
        events(s, dir).select(F.col("event_type"),
          (F.col("user_id") % 7).as("cell")),
        Seq("event_type"), "cell")
        .orderBy("event_type")),
    "q_drift_fdr" -> ((s, dir) => {
      // Benjamini–Hochberg across the per-group tests — the step that
      // makes per-group monitoring honest at scale (raw α would fire
      // 5% of a million groups every run). Max-rank, the m·p/rank
      // ratio, and the right-to-left running minimum all replay as
      // exact window arithmetic over the rounded p inputs
      val gof = StatTests.chiSquareGofByGroup(
        events(s, dir).select(F.col("event_type"),
          (F.col("user_id") % 7).as("cell")),
        Seq("event_type"), "cell")
      StatTests.bhAdjust(gof, "p_value", alpha = 0.05)
        .select(F.col("event_type"), F.col("chi2"), F.col("p_value"),
          F.col("bh_rank"), F.round(F.col("q_value"), 9).as("q_value"),
          F.col("reject"))
        .orderBy("event_type")
    }),
    "q_km_curve" -> ((s, dir) =>
      // Kaplan–Meier per line status: duration = quantity, event =
      // returned/accepted vs still-open ('N' = right-censored). One
      // (group, t) aggregate, per-group windows over the ≤ groups·50
      // cells frame — at-risk counts, the exp(Σ ln) product limit, and
      // the Greenwood variance all replay in DuckDB to 6 decimals
      Survival.kmByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_linestatus"), F.col("l_quantity"),
            (F.col("l_returnflag") =!= "N").as("ev")),
        "l_quantity", "ev", Seq("l_linestatus"))
        .orderBy("l_linestatus", "t")),
    "q_km_median" -> ((s, dir) =>
      // median survival + final level per group — the per-group fold
      // over the product-limit curve (smallest t with S ≤ ½)
      Survival.medianSurvival(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_linestatus"), F.col("l_quantity"),
            (F.col("l_returnflag") =!= "N").as("ev")),
        "l_quantity", "ev", Seq("l_linestatus"))
        .orderBy("l_linestatus")),
    "q_km_hazard" -> ((s, dir) =>
      // Nelson–Aalen cumulative hazard per line status — the additive
      // companion to q_km_curve over the same cells frame; hazard and
      // its Poisson variance are pure ratio-of-integer window sums, so
      // the replay has no ln/exp at all
      Survival.naByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_linestatus"), F.col("l_quantity"),
            (F.col("l_returnflag") =!= "N").as("ev")),
        "l_quantity", "ev", Seq("l_linestatus"))
        .orderBy("l_linestatus", "t")),
    "q_survival_logrank" -> ((s, dir) =>
      // Mantel–Cox log-rank between the order-parity cohorts, p-value
      // included end-to-end: O_a is an exact integer, E_a and V are
      // 6-rounded sums of integer-ratio terms, X² folds from the
      // ROUNDED pieces, and p = erfc(√(X²/2)) rides the same Cody
      // erfc the MWU oracle replays
      Survival.logRank(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(
            F.when(F.col("l_orderkey") % 2 === 0, "a").otherwise("b")
              .as("cohort"),
            F.col("l_quantity"),
            (F.col("l_returnflag") =!= "N").as("ev")),
        "l_quantity", "ev", "cohort")),
    "q_rmst" -> ((s, dir) =>
      // restricted mean survival time to tau = 30 per line status —
      // the area under the K-M curve; the 6-rounded survival feeds the
      // area so DuckDB replays the step integral exactly
      Survival.rmstByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_linestatus"), F.col("l_quantity"),
            (F.col("l_returnflag") =!= "N").as("ev")),
        "l_quantity", "ev", Seq("l_linestatus"), tau = 30.0)
        .orderBy("l_linestatus")),
    "q_mrl" -> ((s, dir) =>
      // truncated mean residual life per line status: expected
      // remaining duration at each event time — the same t-ordered
      // remaining-area window as q_rmst_diff, per curve point
      Survival.meanResidualLife(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_linestatus"), F.col("l_quantity"),
            (F.col("l_returnflag") =!= "N").as("ev")),
        "l_quantity", "ev", Seq("l_linestatus"), tau = 30.0)
        .orderBy("l_linestatus", "t")),
    "q_gumbel" -> ((s, dir) =>
      // extreme-value tail planning: Gumbel moments on daily value
      // maxima per event type + the 365-day return level — the worst
      // case a p99.9 can't extrapolate to
      StatTests.gumbelByGroup(
        events(s, dir)
          .where(F.col("event_type").isNotNull && F.col("ts").isNotNull)
          .select(F.col("event_type"),
            F.expr("CAST(ts AS BIGINT) DIV 86400000000000").as("day"),
            F.col("value")),
        Seq("event_type"), "day", "value", returnPeriod = 365)
        .orderBy("event_type")),
    "q_cond_survival" -> ((s, dir) =>
      // conditional survival S(a+10 | a) at anchors 10/20/30 per line
      // status — the "given you made it this far" re-forecast; as-of
      // lookups over the tiny KM curve frame
      Survival.conditionalSurvival(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_linestatus"), F.col("l_quantity"),
            (F.col("l_returnflag") =!= "N").as("ev")),
        "l_quantity", "ev", Seq("l_linestatus"),
        anchors = Seq(10.0, 20.0, 30.0), horizon = 10.0)
        .orderBy("l_linestatus", "anchor")),
    "q_rmst_diff" -> ((s, dir) =>
      // how much restricted mean survival does cohort b buy over a by
      // tau = 30: Uno remaining-area variance per cohort, z from the
      // pooled SE — the effect-size companion to q_survival_logrank
      Survival.rmstDiff(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.when(F.col("l_orderkey") % 2 === 0, "a")
            .otherwise("b").as("g"),
            F.col("l_quantity").as("t0"),
            (F.col("l_returnflag") =!= "N").as("ev")),
        "t0", "ev", "g", "a", "b", tau = 30.0)),
    "q_hazard_rates" -> ((s, dir) =>
      // piecewise-exponential rates from the Nelson-Aalen increments —
      // the nonparametric→parametric bridge; pure ratio-of-integer
      // arithmetic over the same cells frame as q_km_hazard
      Survival.piecewiseExpByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_linestatus"), F.col("l_quantity"),
            (F.col("l_returnflag") =!= "N").as("ev")),
        "l_quantity", "ev", Seq("l_linestatus"))
        .orderBy("l_linestatus", "t_end")),
    "q_stream_funnel" -> ((s, dir) => {
      // three-step funnel as CHAINED watermarked interval joins
      // (view → click → purchase, each within 1h, strictly ordered):
      // multiple stateful operators composing in one streaming query;
      // exactly-once emission makes the availableNow run hash-match
      // the batch triple join
      val src = eventsStream(s, dir)
        .withColumn("event_ts", F.timestamp_micros(F.expr("ts div 1000")))
      def stage(t: String) = src
        .where(F.col("event_type") === t)
        .select(F.col("user_id"), F.col("event_ts"))
      val paths = graft.streaming.StreamingOps.funnelPaths(
        stage("view"), stage("click"), stage("purchase"),
        "user_id", "event_ts", lookback = "1 hour",
        watermark = "1 hour")
      graft.streaming.StreamingOps
        .runToBatch(s, paths, "graft_stream_funnel",
          outputMode = "append", statePartitions = 8)
        .agg(F.count(F.lit(1)).as("n_paths"),
          F.count_distinct(F.col("user_id")).as("n_users"))
    }),
    "q_stream_abtest" -> ((s, dir) => {
      // live A/B conversion monitor: per-(day window, variant) purchase
      // rate with Wilson bands — watermark-bounded windowed state, the
      // Wilson algebra stateless after the aggregate; batch replay must
      // hash-match the plain GROUP BY + closed-form band
      val src = eventsStream(s, dir)
        .withColumn("event_ts", F.timestamp_micros(F.expr("ts div 1000")))
        .withColumn("variant",
          F.when(F.col("user_id") % 2 === 0, "a").otherwise("b"))
        .withColumn("conv", F.col("event_type") === "purchase")
      val conv = graft.streaming.StreamingOps.windowedConversion(
        src, "variant", "conv", "event_ts",
        window = "24 hours", watermark = "1 hour")
      graft.streaming.StreamingOps
        .runToBatch(s, conv, "graft_stream_abtest", statePartitions = 8)
        .select(F.unix_timestamp(F.col("window.start")).as("win_start"),
          F.col("variant"), F.col("n"), F.col("x"), F.col("rate"),
          F.col("ci_lo"), F.col("ci_hi"))
        .orderBy("win_start", "variant")
    }),
    "q_incremental_fit" -> ((s, dir) => {
      // the INCREMENTAL grouped-fit path: per-batch partials (here the
      // order-parity halves standing in for day shards), a mergeable
      // union, and the closed-form finalize — proving fit state
      // composes without re-reading history. DuckDB replays the full
      // two-stage sum algebra
      val half1 = li(s, dir).where(F.col("l_orderkey") % 2 === 0)
      val half2 = li(s, dir).where(F.col("l_orderkey") % 2 =!= 0)
      val parts = GroupedFit.fitPartialsByGroup(half1, "l_extendedprice",
          Seq("l_returnflag"))
        .unionByName(GroupedFit.fitPartialsByGroup(half2,
          "l_extendedprice", Seq("l_returnflag")))
      val merged = GroupedFit.mergeFitPartials(parts, Seq("l_returnflag"))
      GroupedFit.fitFromPartials(merged, Seq("l_returnflag"))
        .select(F.col("l_returnflag"), F.col("n"), F.col("distribution"),
          F.round(F.get(F.col("parameters"), F.lit(0)), 4).as("p1"),
          F.round(F.get(F.col("parameters"), F.lit(1)), 4).as("p2"),
          F.round(F.coalesce(F.get(F.col("parameters"), F.lit(2)),
            F.lit(-1.0)), 4).as("p3"),
          F.round(F.col("aic"), 2).as("aic_r"))
        .orderBy("l_returnflag", "distribution")
    }),
    "q_ks_by_group" -> ((s, dir) =>
      // exact two-sample K-S per line status between the parity
      // cohorts — distribution-level drift per segment via per-GROUP
      // windows on the cells frame; D hash-checked (p follows the
      // q_drift_ks precedent: Kolmogorov tail isn't SQL)
      Drift.ksTwoSampleByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_linestatus"),
            F.when(F.col("l_orderkey") % 2 === 0, "a").otherwise("b")
              .as("cohort"),
            F.col("l_extendedprice")),
        Seq("l_linestatus"), "cohort", "l_extendedprice")
        .select(F.col("l_linestatus"), F.col("ks_d"),
          F.col("n_a"), F.col("n_b"))
        .orderBy("l_linestatus")),
    "q_grouped_nbinom" -> ((s, dir) =>
      // negative-binomial moment fit per status — the overdispersion
      // follow-up; closed-form (r, p) from one aggregation
      StatTests.nbinomMomentsByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        Seq("l_linestatus"), "l_quantity")
        .orderBy("l_linestatus")),
    "q_zip_moments" -> ((s, dir) => {
      // zero-inflated Poisson moment fit per event type over DENSE
      // (user, day) activity counts — the grid join materializes the
      // structural zeros the mixture exists to model; closed-form
      // (λ, π) from one aggregation
      val ev = events(s, dir)
        .where(F.col("user_id").isNotNull && F.col("ts").isNotNull &&
          F.col("event_type").isNotNull)
        .select(F.col("user_id"), F.col("event_type"),
          F.expr("CAST(ts AS BIGINT) DIV 86400000000000").as("day"))
      // the dense grid grows multiplicatively with SF if left uncapped —
      // bound the user and day dimensions deterministically (first 200
      // users / 400 days by key order, SQL-replayable) so the harness
      // slice keeps a fixed shape at any scale factor
      val grid = ev.select("user_id").distinct().orderBy("user_id").limit(200)
        .crossJoin(ev.select("day").distinct().orderBy("day").limit(400))
        .crossJoin(ev.select("event_type").distinct())
      val cnts = ev.groupBy("user_id", "day", "event_type")
        .agg(F.count(F.lit(1)).as("c"))
      val full = grid
        .join(cnts, Seq("user_id", "day", "event_type"), "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0L)))
      StatTests.zipMomentsByGroup(full, Seq("event_type"), "c")
        .orderBy("event_type")
    }),
    "q_cat_profile" -> ((s, dir) =>
      // data-card concentration profile of source within each language:
      // entropy / normalized entropy / HHI / top share from ONE
      // (group, value) aggregation + a per-group fold
      Evaluation.categoricalProfile(docs(s, dir), Seq("lang"), "source")
        .orderBy("lang")),
    "q_cluster_agreement" -> ((s, dir) =>
      // do the source slices recover the languages: ARI + NMI +
      // majority purity from the exact (lang, source) contingency
      // cells, driver folds in sorted order so every ln-sum replays
      Evaluation.clusterAgreement(docs(s, dir), "lang", "source")),
    "q_shapley" -> ((s, dir) =>
      // exact Shapley credit for purchase conversion over the 2^4
      // touched-channel coalitions (click/error/signup/view): the
      // axiomatically fair split first/last-touch cannot give
      Cohorts.shapleyAttribution(events(s, dir), "user_id",
        "event_type", convValue = "purchase")),
    "q_dispersion_group" -> ((s, dir) =>
      // Poisson overdispersion routing statistic per line status:
      // dispersion index + conditional chi2 D with the Wilson-Hilferty
      // tail at the rounded D
      StatTests.dispersionByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        Seq("l_linestatus"), "l_quantity")
        .orderBy("l_linestatus")),
    "q_ab_test" -> ((s, dir) =>
      // two-proportion z between the order-parity cohorts on the
      // returned-line rate — ONE conditional aggregation; p at the
      // 6-rounded z via the shared Cody erfc
      Experiments.twoProportionZ(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(
            F.when(F.col("l_orderkey") % 2 === 0, "a").otherwise("b")
              .as("cohort"),
            (F.col("l_returnflag") === "R").as("conv")),
        "cohort", "conv")),
    "q_wilson_group" -> ((s, dir) =>
      // conversion rate + Wilson band per line status — the interval
      // that stays inside [0,1] at extreme rates/small segments
      Experiments.wilsonByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_linestatus"),
            (F.col("l_returnflag") === "R").as("conv")),
        Seq("l_linestatus"), "conv")
        .orderBy("l_linestatus")),
    "q_cuped" -> ((s, dir) =>
      // CUPED: how much extendedprice variance does quantity soak up —
      // theta and the adjusted variance in closed form from ONE moment
      // aggregation
      Experiments.cuped(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        "l_extendedprice", "l_quantity")),
    "q_rolling_features" -> ((s, dir) =>
      // trailing-window behavioral features per user as-of each event
      // (1 h and 24 h horizons): per-KEY range windows — one shuffle on
      // user_id serves both horizons
      Features.rollingAggregates(events(s, dir), "user_id", "ts",
          "value", Seq(3600000000000L, 86400000000000L))
        .select(F.col("event_id"),
          F.col("rolling_cnt_0"),
          F.round(F.col("rolling_sum_0"), 6).as("sum0_r"),
          F.col("rolling_cnt_1"),
          F.round(F.col("rolling_sum_1"), 6).as("sum1_r"))
        .orderBy("event_id")),
    "q_inter_arrival" -> ((s, dir) =>
      // time since the user's previous event (event_id tie-break) —
      // one lag window per key; exact integer nanos replay
      Features.interArrival(events(s, dir), "user_id", "ts",
          tieBreakCols = Seq("event_id"))
        .select(F.col("event_id"), F.col("delta_ts"))
        .orderBy("event_id")),
    "q_retention" -> ((s, dir) =>
      // daily cohort retention matrix over the events table: users
      // cohorted by first-seen day (integer DIV on epoch nanos —
      // exact), per-cell distinct-user counts, cohort share — one
      // distinct reduction + one user window + one cell aggregation
      Cohorts.retention(events(s, dir), "user_id", "ts",
          periodNanos = 86400000000000L)
        .orderBy("cohort_period", "period_offset")),
    "q_funnel" -> ((s, dir) =>
      // ordered view→click→purchase funnel: step k counts only at or
      // after the user's earliest qualifying step k−1 (strict
      // sequential semantics) — a chain of user-partitioned windows on
      // ONE shuffle, then a steps-sized long-form frame with rates
      Cohorts.funnel(events(s, dir), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy("step_idx")),
    "q_funnel_latency" -> ((s, dir) =>
      // time-to-convert per funnel transition: exact p50/p90 of the
      // integer-nanos deltas via the cumulative cell-count walk —
      // every output is a delta that actually occurred
      Cohorts.funnelLatency(events(s, dir), "user_id", "ts",
          "event_type", Seq("view", "click", "purchase"))
        .orderBy("step_idx")),
    "q_trend" -> ((s, dir) =>
      // rank-based trend per event type: Spearman rho of value vs time
      // order (midranks for value ties) from one sufficient-statistic
      // aggregation per key
      Features.trendByKey(events(s, dir), "event_type", "ts", "value",
          tieBreakCols = Seq("event_id"))
        .orderBy("event_type")),
    "q_mutual_info_group" -> ((s, dir) =>
      // per-language MI between source and a length bucket — the
      // contingency construction with group-partitioned windows
      Evaluation.mutualInfoByGroup(
        docs(s, dir).select(F.col("lang"), F.col("source"),
          F.when(F.col("n_chars") < 500, "short").otherwise("long")
            .as("len")),
        Seq("lang"), "source", "len")
        .orderBy("lang")),
    "q_distinctive_terms" -> ((s, dir) =>
      // Monroe log-odds "fightin' words": what characterizes each
      // language vs the rest — prior-shrunk z, rank-limited top-5
      TextOps.distinctiveTerms(docs(s, dir), "doc_id", "text", "lang",
          alpha = 0.01, k = 5)
        .orderBy("group", "rank")),
    "q_monotone_bins" -> ((s, dir) =>
      // supervised monotone binning of price vs the returned flag:
      // decile pre-bins pooled to the isotonic fit via the exact
      // minimax formula over the 10-row bucket frame — pooled buckets
      // share bit-identical fitted rates, so the merge replays
      Evaluation.monotoneWoeBins(
        li(s, dir).select(F.col("l_extendedprice").as("x"),
          (F.col("l_returnflag") === "R").as("y")),
        "x", "y", bins = 10)
        .orderBy("bucket")),
    "q_paired_t" -> ((s, dir) =>
      // paired comparison of two per-row scores (quantity vs scaled
      // discount): the pairing removes between-row variance; p rides
      // the operator's t CDF (q_anova convention)
      StatTests.pairedTTest(
        li(s, dir).select(F.col("l_quantity").as("a"),
          (F.col("l_discount") * 100).as("b")),
        "a", "b")
        .select(F.col("n"), F.col("mean_diff"), F.col("sd_diff"),
          F.col("t_stat"), F.col("dof"), F.col("cohen_dz"))),
    "q_cronbach" -> ((s, dir) =>
      // internal consistency of three scaled lineitem "items" — do
      // they measure one construct; explicit-sum variances replay
      StatTests.cronbachAlpha(
        li(s, dir).select(F.col("l_quantity").as("i1"),
          (F.col("l_discount") * 100).as("i2"),
          (F.col("l_tax") * 100).as("i3")),
        Seq("i1", "i2", "i3"))),
    "q_mi_continuous" -> ((s, dir) =>
      // nonlinear-dependence screen: MI between price and quantity
      // through tie-stable decile bins on both sides
      Evaluation.miContinuous(li(s, dir), "l_extendedprice",
        "l_quantity", bins = 10)),
    "q_hbos" -> ((s, dir) =>
      // histogram-based outlier screen over three lineitem features:
      // top-20 rows whose marginal-bin densities are jointly rare —
      // linear-time anomaly sweep, rank-limited take, no global sort
      Outliers.hbosScore(
        li(s, dir).select(
          (F.col("l_orderkey") * 10 + F.col("l_linenumber")).as("id"),
          F.col("l_quantity"), F.col("l_extendedprice"),
          F.col("l_discount")),
        "id", Seq("l_quantity", "l_extendedprice", "l_discount"),
        bins = 10, topK = 20)),
    "q_ecod" -> ((s, dir) =>
      // ECDF-tail outlier screen over the same three features — the
      // bin-free rank twin of q_hbos: exact integer tail counts via
      // the prefix-sum min-rank construction, top-20 by the rounded
      // max(s_left, s_right), never a global sort
      Outliers.ecodScore(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).as("id"),
            F.col("l_quantity"), F.col("l_extendedprice"),
            F.col("l_discount")),
        "id", Seq("l_quantity", "l_extendedprice", "l_discount"),
        topK = 20)),
    "q_its" -> ((s, dir) =>
      // interrupted time series on the daily value means at a pinned
      // mid-January break: level jump + slope change from segmented
      // fits, decimal-exact period means
      Regression.itsEstimate(events(s, dir), "ts", "value",
        periodUnit = 86400000000000L,
        breakTs = 1705363200000000000L)),
    "q_ols_weighted" -> ((s, dir) =>
      // price-on-quantity trend per return flag under discount-derived
      // row weights — the fit that belongs downstream of raking
      Regression.olsByGroupWeighted(
        li(s, dir).select(F.col("l_returnflag"),
          F.col("l_quantity").as("x"), F.col("l_extendedprice").as("y"),
          (F.lit(1.0) + F.col("l_discount") * 10).as("w")),
        "y", "x", "w", Seq("l_returnflag"))
        .orderBy("l_returnflag")),
    "q_srm" -> ((s, dir) =>
      // sample-ratio-mismatch gate on the parity assignment vs the
      // 50/50 design; dof 1 so p = erfc(sqrt(chi2/2)) replays exactly
      Experiments.srmCheck(
        events(s, dir).select(
          F.when(F.col("user_id") % 2 === 0, "a").otherwise("b")
            .as("arm")),
        "arm", Seq(("a", 0.5), ("b", 0.5)))),
    "q_weighted_moments" -> ((s, dir) =>
      // weighted quantity moments per line status under the same
      // discount weights — mean/var on the fixed mix + the effective
      // sample size behind them
      StatTests.weightedMomentsByGroup(
        li(s, dir).select(F.col("l_linestatus"),
          F.col("l_quantity").as("x"),
          (F.lit(1.0) + F.col("l_discount") * 10).as("w")),
        Seq("l_linestatus"), "x", "w")
        .orderBy("l_linestatus")),
    "q_dr" -> ((s, dir) =>
      // doubly-robust policy value: the q_ips setup plus a pinned
      // deterministic reward model qhat(a) = 0.3 + (len(a) % 3) * 0.2
      // — unbiased if either the propensities or the model is right
      Evaluation.drOffPolicy(
        events(s, dir).select(F.col("event_type").as("action"),
          ((F.col("user_id") % 10 + 1).cast("double") / 20.0).as("p"),
          (F.col("value") / 100.0).as("r"),
          F.when(F.col("user_id") % 7 === 0, "click").otherwise("view")
            .as("target"))
          .withColumn("qt", F.lit(0.3) +
            (F.length(F.col("target")) % 3).cast("double") * 0.2)
          .withColumn("ql", F.lit(0.3) +
            (F.length(F.col("action")) % 3).cast("double") * 0.2),
        "action", "p", "r", "target", "qt", "ql", clipMax = 10.0)),
    "q_ratio_ci" -> ((s, dir) =>
      // revenue-per-unit ratio metric per return flag with the
      // delta-method CI — numerator and denominator are correlated
      // within the row, so the naive mean-of-ratios is wrong
      Experiments.ratioMetricCi(li(s, dir), Seq("l_returnflag"),
          "l_extendedprice", "l_quantity")
        .orderBy("l_returnflag")),
    "q_post_strat" -> ((s, dir) =>
      // price mean reweighted to a target return-flag mix — the 1-D
      // survey correction with the stratified-sampling SE
      Experiments.postStratifiedMean(li(s, dir), "l_returnflag",
        "l_extendedprice", Seq(("A", 0.3), ("N", 0.5), ("R", 0.2)))),
    "q_corr_ci" -> ((s, dir) =>
      // is the quantity-price correlation real per return flag?
      // Fisher-z band + two-sided p, all from one moment aggregation
      Regression.corrCiByGroup(li(s, dir), Seq("l_returnflag"),
          "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag")),
    "q_ips" -> ((s, dir) =>
      // off-policy eval from logs: what reward would the "click for
      // user_id % 7 == 0, else view" policy have earned — IPS/SNIPS
      // with clipped weights and the effective sample size
      Evaluation.ipsOffPolicy(
        events(s, dir).select(F.col("event_type").as("action"),
          ((F.col("user_id") % 10 + 1).cast("double") / 20.0).as("p"),
          (F.col("value") / 100.0).as("r"),
          F.when(F.col("user_id") % 7 === 0, "click").otherwise("view")
            .as("target")),
        "action", "p", "r", "target", clipMax = 10.0)),
    "q_ccf" -> ((s, dir) =>
      // lead-lag profile per event type: corr(value_t, bucket_{t+l})
      // for l = -2..2 over decimal-exact daily means — the curve
      // behind q_granger's single verdict
      Features.ccfByKey(
        events(s, dir).select(F.col("event_type"), F.col("ts"),
          F.col("value").as("x"),
          (F.col("user_id") % 50).cast("double").as("y")),
        "event_type", "ts", "x", "y", maxLag = 2,
        periodUnit = 86400000000000L)
        .orderBy("event_type", "lag")),
    "q_quantile_ci" -> ((s, dir) =>
      // distribution-free p90 CI per line status: exact order
      // statistics at binomial-normal rank bounds — every output is a
      // value that occurred
      Outliers.quantileCiByGroup(li(s, dir), Seq("l_linestatus"),
          "l_extendedprice", q = 0.9)
        .orderBy("l_linestatus")),
    "q_yuen" -> ((s, dir) =>
      // robust A/B location test between the parity cohorts: Yuen's
      // trimmed-mean t with winsorized variance — exact rank clamps
      // and integer band overlaps; p rides the operator's t CDF
      StatTests.yuenTTest(
        li(s, dir).select(
          F.when(F.col("l_orderkey") % 2 === 0, "a").otherwise("b")
            .as("cohort"),
          F.col("l_extendedprice")),
        "cohort", "l_extendedprice", trim = 0.2)
        .select(F.col("mean_trim_a"), F.col("mean_trim_b"),
          F.col("diff"), F.col("t_stat"), F.col("dof"), F.col("n_a"),
          F.col("n_b"), F.col("h_a"), F.col("h_b"))),
    "q_qte" -> ((s, dir) =>
      // per-quantile lift between the parity cohorts at p50/p90 with
      // marginal order-statistic CIs — the readout when the mean
      // hides the story
      Experiments.qteByQuantile(
        li(s, dir).select(
          F.when(F.col("l_orderkey") % 2 === 0, "a").otherwise("b")
            .as("cohort"),
          F.col("l_extendedprice")),
        "cohort", "l_extendedprice", qs = Seq(0.5, 0.9))
        .orderBy("q")),
    "q_did" -> ((s, dir) =>
      // difference-in-differences on the 2x2 (order parity x open
      // status) panel over price: one conditional-moment aggregation,
      // p at the 6-rounded z via the shared erfc
      Experiments.didEstimate(
        li(s, dir).select(
          (F.col("l_orderkey") % 2 === 0).as("t"),
          (F.col("l_linestatus") === "O").as("post"),
          F.col("l_extendedprice").as("y")),
        "t", "post", "y")),
    "q_power_means" -> ((s, dir) =>
      // experiment sizing on the live quantity variance: n per arm to
      // detect a 0.5-unit lift; raw n 6-rounded BEFORE the ceiling so
      // engines can't straddle the integer boundary
      Experiments.powerTwoMeans(
        li(s, dir).select(F.col("l_quantity").as("y")), "y",
        mde = 0.5)),
    "q_granger" -> ((s, dir) =>
      // lead-lag screen per event type: does yesterday's mean user
      // bucket help predict today's mean value beyond yesterday's
      // value — nested-OLS F from one moment aggregation over
      // decimal-exact daily means (p rides the operator's F CDF;
      // oracle replays the statistic, the q_anova convention)
      Regression.grangerByKey(
        events(s, dir).select(F.col("event_type"), F.col("ts"),
          F.col("value").as("y"),
          (F.col("user_id") % 50).cast("double").as("x")),
        "event_type", "ts", "y", "x", periodUnit = 86400000000000L)
        .select(F.col("event_type"), F.col("m"), F.col("b_ylag"),
          F.col("b_xlag"), F.col("f_stat"))
        .orderBy("event_type")),
    "q_profile_diff" -> ((s, dir) =>
      // snapshot drift card between the parity halves of documents:
      // null-rate/mean/distinct deltas per column — deltas subtract
      // 6-rounded profile values so they replay exactly
      Validation.profileDiff(
        docs(s, dir).where(F.col("doc_id") % 2 === 0),
        docs(s, dir).where(F.col("doc_id") % 2 === 1),
        Seq("lang", "n_chars"))
        .orderBy("column")),
    "q_rolling_corr" -> ((s, dir) =>
      // 6-hour rolling correlation of value vs hour-of-day per event
      // type — the co-movement monitor; hour is exact integer nanos
      // arithmetic, all five sums ride ONE trailing RANGE frame
      Features.rollingCorrByKey(
        events(s, dir).select(F.col("event_type"), F.col("ts"),
          F.col("value").as("x"),
          (F.expr("ts DIV 3600000000000") % 24).cast("double")
            .as("hr")),
        "event_type", "ts", "x", "hr", window = 21600000000000L)),
    "q_forecast_accuracy" -> ((s, dir) =>
      // scorecard for the q_holt model per event type: MAE/RMSE/MAPE
      // and MASE vs the one-day-naive baseline — composed directly on
      // holtByKey's (v, fitted) output, so the oracle rides the same
      // recursive-CTE replay
      Features.forecastAccuracyByKey(
        Features.holtByKey(events(s, dir), "event_type", "ts", "value",
          periodUnit = 86400000000000L, alpha = 0.3, beta = 0.1),
        "event_type", "period", "v", "fitted", seasonLag = 1)
        .orderBy("event_type")),
    "q_fellegi_sunter" -> ((s, dir) => {
      // probabilistic linkage on blocked customer pairs: EM over the
      // <= 8-row agreement-pattern table (2 pinned iterations), the
      // classic log2 match weight per pattern; the pair generation is
      // block-bounded so the fan-out stays linear in customers
      val c = s.read.parquet(s"$dir/customer.parquet")
        .select(F.col("c_custkey").as("k"),
          F.expr("c_custkey DIV 50").as("blk"),
          F.col("c_mktsegment").as("seg"),
          F.col("c_nationkey").as("nat"), F.col("c_acctbal").as("bal"))
      val a = c.select(F.col("k").as("ka"), F.col("blk"),
        F.col("seg").as("sa"), F.col("nat").as("na"),
        F.col("bal").as("ba"))
      val b = c.select(F.col("k").as("kb"), F.col("blk"),
        F.col("seg").as("sb"), F.col("nat").as("nb"),
        F.col("bal").as("bb"))
      val pairs = a.join(b, "blk")
        .where(F.col("ka") < F.col("kb"))
        .select((F.col("sa") === F.col("sb")).as("seg_eq"),
          (F.col("na") === F.col("nb")).as("nat_eq"),
          (F.abs(F.col("ba") - F.col("bb")) < 1000.0).as("bal_close"))
      Linkage.fellegiSunter(pairs, Seq("seg_eq", "nat_eq", "bal_close"),
          iters = 2, priorP = 0.1)
        .orderBy("seg_eq", "nat_eq", "bal_close")
    }),
    "q_theils_u" -> ((s, dir) =>
      // directed association: how much of language's entropy does
      // source remove, and vice versa — both coefficients fold from
      // ONE contingency frame
      Evaluation.theilsU(docs(s, dir), "lang", "source")),
    "q_holt" -> ((s, dir) =>
      // Holt level+trend per event type over decimal-exact daily
      // means: the recurrence is bit-reproducible, so DuckDB replays
      // it step-for-step as a RECURSIVE CTE
      Features.holtByKey(events(s, dir), "event_type", "ts", "value",
          periodUnit = 86400000000000L, alpha = 0.3, beta = 0.1)
        .orderBy("event_type", "period")),
    "q_holt_tune" -> ((s, dir) =>
      // the fit-and-rank spirit applied to forecasting: per event
      // type, the (alpha, beta) grid combo minimizing the one-step
      // in-sample MAE — every combo's trajectory replays in ONE
      // recursive CTE keyed by (key, alpha, beta)
      Features.holtTuneByKey(events(s, dir), "event_type", "ts",
          "value", periodUnit = 86400000000000L)
        .orderBy("event_type")),
    "q_holt_winters" -> ((s, dir) =>
      // Holt–Winters additive per event type over the same daily
      // means, weekly season (m = 7) learned from a zero seed: the
      // triple recurrence replays step-for-step as a recursive CTE
      // carrying the seven seasonal slots
      Features.holtWintersByKey(events(s, dir), "event_type", "ts",
          "value", periodUnit = 86400000000000L, seasonLength = 7,
          alpha = 0.3, beta = 0.1, gamma = 0.2)
        .orderBy("event_type", "period")),
    "q_hw_accuracy" -> ((s, dir) => {
      // did the seasonals PAY? the shared accuracy fold over
      // Holt–Winters' and Holt's one-step fits, MASE vs the weekly
      // seasonal naive — the acceptance metric for the triple model
      val hw = Features.forecastAccuracyByKey(
        Features.holtWintersByKey(events(s, dir), "event_type", "ts",
          "value", periodUnit = 86400000000000L, seasonLength = 7,
          alpha = 0.3, beta = 0.1, gamma = 0.2),
        "event_type", "period", "v", "fitted", seasonLag = 7)
        .withColumn("model", F.lit("holt_winters"))
      val h = Features.forecastAccuracyByKey(
        Features.holtByKey(events(s, dir), "event_type", "ts",
          "value", periodUnit = 86400000000000L, alpha = 0.3,
          beta = 0.1),
        "event_type", "period", "v", "fitted", seasonLag = 7)
        .withColumn("model", F.lit("holt"))
      hw.unionByName(h).orderBy("model", "event_type")
    }),
    "q_holt_winters_mul" -> ((s, dir) =>
      // the ratio-seasonal twin for level-proportional swings: unit
      // seasonal seed, strictly positive period means only
      Features.holtWintersMulByKey(events(s, dir), "event_type", "ts",
          "value", periodUnit = 86400000000000L, seasonLength = 7,
          alpha = 0.3, beta = 0.1, gamma = 0.2)
        .orderBy("event_type", "period")),
    "q_hw_forecast" -> ((s, dir) =>
      // the two-week projection from each event type's final HW state:
      // level + h·trend + the continuing seasonal slot — the recursion
      // replays to the last row, then a generate_series projects
      Features.hwForecastByKey(events(s, dir), "event_type", "ts",
          "value", periodUnit = 86400000000000L, seasonLength = 7,
          alpha = 0.3, beta = 0.1, gamma = 0.2, horizon = 14)
        .orderBy("event_type", "h")),
    "q_ar_fit" -> ((s, dir) =>
      // AR(3) per event type via Yule-Walker closed forms over the
      // decimal-exact daily means — the parametric rung above Holt
      // that q_pacf's order chooser points at; Cramer's rule on the
      // 3x3 Toeplitz system replays in SQL from the centered-lag sums
      Features.arFitByKey(events(s, dir), "event_type", "ts", "value",
          periodUnit = 86400000000000L, p = 3)
        .orderBy("event_type")),
    "q_arma" -> ((s, dir) =>
      // ARMA(1,1) per event type by Hannan–Rissanen: AR(1) residuals
      // at the ROUNDED phi0, then the 2×2 no-intercept normal
      // equations — lag windows + per-key sums over the daily cells,
      // the MA rung the AR panel stops short of
      Features.armaByKey(events(s, dir), "event_type", "ts", "value",
          periodUnit = 86400000000000L)
        .orderBy("event_type")),
    "q_ar_accuracy" -> ((s, dir) =>
      // score the AR(1) in-sample one-step predictions with the shared
      // forecast-accuracy fold (MASE vs the weekly seasonal naive) —
      // the acceptance metric that q_holt's fitted column also runs
      Features.forecastAccuracyByKey(
        Features.arFittedByKey(events(s, dir), "event_type", "ts",
          "value", periodUnit = 86400000000000L, p = 1),
        "event_type", "period", "v", "fitted", seasonLag = 7)
        .orderBy("event_type")),
    "q_newey_west" -> ((s, dir) =>
      // HAC slope uncertainty for each event type's daily trend: the
      // Bartlett-kernel (L=5) standard error next to the naive OLS
      // one — hac_ratio > 1 quantifies how much autocorrelation was
      // understating the noise
      Features.neweyWestByKey(events(s, dir), "event_type", "ts",
          "value", periodUnit = 86400000000000L, maxLag = 5)
        .orderBy("event_type")),
    "q_croston" -> ((s, dir) =>
      // intermittent-demand forecast over the sparse high-value event
      // stream (daily sums of value > 95 spikes): smoothed sizes and
      // intervals with the SBA bias correction; the recursion replays
      // as a recursive CTE
      Features.crostonByKey(
        events(s, dir).where(F.col("value") > 95),
        "event_type", "ts", "value", periodUnit = 86400000000000L,
        alpha = 0.3)
        .orderBy("event_type", "period")),
    "q_theta_forecast" -> ((s, dir) =>
      // theta-method one-step forecast per event type: OLS trend line
      // + SES over the theta=2 line, averaged — the M3-winning default
      Features.thetaForecastByKey(events(s, dir), "event_type", "ts",
          "value", periodUnit = 86400000000000L, alpha = 0.3)
        .orderBy("event_type")),
    "q_growth_accounting" -> ((s, dir) =>
      // the canonical DAU decomposition per day: new + retained +
      // resurrected = active, churn counted on the day after the last
      // active day, quick ratio as the growth health check
      Cohorts.growthAccounting(events(s, dir), "user_id", "ts",
          periodUnit = 86400000000000L)
        .orderBy("period")),
    "q_var1" -> ((s, dir) =>
      // the value/volume feedback system per event type: VAR(1)
      // coefficient matrix + spectral radius — do shocks die out, or
      // does the system spiral; one lag-moment pass, closed-form eigen
      Features.var1ByKey(events(s, dir), "event_type", "ts", "value",
          periodUnit = 86400000000000L)
        .orderBy("event_type")),
    "q_ece" -> ((s, dir) =>
      // can the scaled discount be read as a return probability:
      // bin-weighted calibration gap (ECE), worst bin (MCE), and the
      // signed net over/under-confidence
      Evaluation.expectedCalibrationError(
        li(s, dir).select((F.col("l_returnflag") === "R").as("y"),
          (F.col("l_discount") * 10).as("sc")),
        "y", "sc", bins = 10)),
    "q_kalman" -> ((s, dir) =>
      // local-level Kalman filter over each event type's daily means
      // (q=0.5, r=2.0): the adaptive-gain EWMA whose innovations come
      // out whitened; the recursion replays as a recursive CTE
      Features.kalmanLevelByKey(events(s, dir), "event_type", "ts",
          "value", periodUnit = 86400000000000L, q = 0.5, r = 2.0)
        .orderBy("event_type", "period")),
    "q_pr_auc" -> ((s, dir) =>
      // average precision of discount as a return-risk score: the
      // rare-positive-honest metric next to q_auc, same prefix-sum
      // substrate with suffix counts
      Evaluation.averagePrecision(
        li(s, dir).select((F.col("l_returnflag") === "R").as("y"),
          F.col("l_discount").as("sc")),
        "y", "sc")),
    "q_beta_binomial" -> ((s, dir) =>
      // overdispersion of per-order return counts (orders with exactly
      // 4 lines): beta-binomial MoM alpha/beta + the intraclass rho
      // that says how far from binomial the order-level rates sit
      StatTests.betaBinomialMoM(
        li(s, dir).groupBy("l_orderkey")
          .agg(F.count(F.lit(1)).as("n"),
            F.sum(F.when(F.col("l_returnflag") === "R", 1L)
              .otherwise(0L)).as("k")),
        "k", "n", trials = 4)),
    "q_spectral_entropy" -> ((s, dir) =>
      // one forecastability number per event type: normalized Shannon
      // entropy of the 10-frequency periodogram + the peak frequency
      Features.spectralEntropyByKey(events(s, dir), "event_type", "ts",
          "value", periodUnit = 86400000000000L, maxFreq = 10)
        .orderBy("event_type")),
    "q_mahalanobis" -> ((s, dir) =>
      // joint (quantity, price) outliers per line status: bivariate
      // Mahalanobis against the closed-form chi2(2) cut, fully
      // in-plan (det is magnitude-unsafe for hashing and stays
      // operator-side; the d2 RATIO and exact counts replay)
      Outliers.mahalanobis2ByGroup(li(s, dir), Seq("l_linestatus"),
          "l_quantity", "l_extendedprice", alpha = 0.001)
        .select(F.col("l_linestatus"), F.col("n"), F.col("n_flagged"),
          F.col("flag_share"), F.col("max_d2"))
        .orderBy("l_linestatus")),
    "q_ks_separation" -> ((s, dir) =>
      // credit-scoring KS per line status: the peak ECDF gap of price
      // between returned and kept rows — argmax decided on the exact
      // integer cross-product, so the located threshold replays
      Evaluation.ksSeparation(
        li(s, dir).select(F.col("l_linestatus"),
          (F.col("l_returnflag") === "R").as("y"),
          F.col("l_extendedprice")),
        "y", "l_extendedprice", Seq("l_linestatus"))
        .orderBy("l_linestatus")),
    "q_woe" -> ((s, dir) =>
      // WoE/IV of the decile-ish quantity bin against the returned
      // flag — exact integer shares, ln the only transcendental
      Evaluation.woeTable(
        li(s, dir).select(F.floor(F.col("l_quantity") / 10).as("bin"),
          (F.col("l_returnflag") === "R").as("y")),
        "bin", "y")
        .orderBy("bin")),
    "q_split_gains" -> ((s, dir) =>
      // decision-stump scan over two stacked features: top-5 gini
      // cuts per feature, the whole rank-limited candidate table
      // (deterministic — no bare argmax)
      Evaluation.splitGains(
        li(s, dir).select(F.col("l_quantity"), F.col("l_discount"),
          (F.col("l_returnflag") === "R").as("y")),
        Seq("l_quantity", "l_discount"), "y", topK = 5)
        .orderBy("feature", "rank")),
    "q_ipf" -> ((s, dir) =>
      // rake the (return flag x line status) cell table to a target
      // training mix: 3 IPF rounds over the 6-cell frame — the data
      // is touched ONCE; DuckDB replays the whole trajectory as
      // chained window CTEs
      Weighting.ipfWeights(li(s, dir), "l_returnflag", "l_linestatus",
          Seq(("A", 0.3), ("N", 0.5), ("R", 0.2)),
          Seq(("F", 0.5), ("O", 0.5)), iters = 3)
        .orderBy("l_returnflag", "l_linestatus")),
    "q_gamma_glm" -> ((s, dir) => {
      // gamma GLM (log link) of price on discount, 3 Fisher-scoring
      // steps from ln ybar: the Gram is CONSTANT under this link so
      // each step is only the 2 gradient sums; DuckDB replays every
      // step (q_poisson_glm pattern with the Gram hoisted)
      import s.implicits._
      val df = li(s, dir).select(F.col("l_extendedprice").as("y"),
        F.col("l_discount").as("x"))
      val m = Regression.gammaIrls(df, "y", Seq("x"), iters = 3)
      Seq((math.rint(m.beta(0) * 1e6) / 1e6,
        math.rint(m.beta(1) * 1e6) / 1e6,
        math.rint(m.deviance * 100.0) / 100.0,
        math.rint(m.dispersion * 1e6) / 1e6, m.n))
        .toDF("b0_r", "b1_r", "dev_r", "disp_r", "n")
    }),
    "q_tweedie" -> ((s, dir) => {
      // Tweedie GLM (p=1.5, log link) of the zero-inflated "excess
      // value over 60" on hour-of-day: the semi-continuous family with
      // an exact point mass at zero that Gamma rejects and Poisson
      // mis-scales; every Fisher step replays (q_poisson_glm pattern,
      // with the mu-dependent information re-summed per step)
      import s.implicits._
      val df = events(s, dir).select(
        F.greatest(F.col("value") - 60, F.lit(0.0)).as("y"),
        ((F.col("ts") % 86400000000000L).cast("double") /
          F.lit(3600000000000.0)).as("x"))
      val m = Regression.tweedieIrls(df, "y", Seq("x"), iters = 3)
      Seq((math.rint(m.beta(0) * 1e6) / 1e6,
        math.rint(m.beta(1) * 1e6) / 1e6,
        math.rint(m.deviance * 100.0) / 100.0,
        math.rint(m.dispersion * 1e6) / 1e6, m.n))
        .toDF("b0_r", "b1_r", "dev_r", "disp_r", "n")
    }),
    "q_rake" -> ((s, dir) =>
      // corpus keywords by RAKE: stopword-delimited phrase candidates,
      // deg/freq word scores, top-20 phrases — multi-word terms beat
      // bare frequency; all counts exact integers
      TextOps.rakeKeywords(docs(s, dir), "text", topK = 20)),
    "q_burstiness" -> ((s, dir) =>
      // do the top-30 corpus terms clump into bursts: repeat
      // probability and variance-to-mean over all docs, exact ratios
      TextOps.burstiness(docs(s, dir), "doc_id", "text", topN = 30)),
    "q_by_adjust" -> ((s, dir) => {
      // Benjamini-Yekutieli over the q_drift_fdr p family — the
      // dependence-robust FDR: q_BY = min(1, c(m) q_BH) exactly, so
      // the BH machinery runs once and the harmonic scalar rides on
      // top; reject reported at the 6-rounded q for engine parity
      val gof = StatTests.chiSquareGofByGroup(
        events(s, dir).select(F.col("event_type"),
          (F.col("user_id") % 7).as("cell")),
        Seq("event_type"), "cell")
      StatTests.byAdjust(gof, "p_value", alpha = 0.05)
        .select(F.col("event_type"), F.col("p_value"), F.col("by_rank"),
          F.round(F.col("q_value_by"), 6).as("q_by"),
          (F.round(F.col("q_value_by"), 6) <= 0.05).as("reject_r"))
        .orderBy("event_type")
    }),
    "q_ljung_box" -> ((s, dir) =>
      // whiteness test per event type: Ljung-Box Q over the 6-rounded
      // acf_1..4 — Q is a pure function of an already-deterministic
      // frame; p at the rounded Q (chi2, dof 4)
      Features.ljungBoxByKey(events(s, dir), "event_type", "ts",
          "value", maxLag = 4, tieBreakCols = Seq("event_id"))
        .orderBy("event_type")),
    "q_ad_twosample" -> ((s, dir) =>
      // tail-sensitive two-sample test between the parity cohorts:
      // Scholz-Stephens midrank A² (exact half-integer blocks) with
      // the exact-variance standardized T; no p column by design —
      // T thresholds against the S-S table (spec pins 19/11 example)
      StatTests.adTwoSample(
        li(s, dir).select(
          F.when(F.col("l_orderkey") % 2 === 0, "a").otherwise("b")
            .as("cohort"),
          F.col("l_extendedprice")),
        "cohort", "l_extendedprice")),
    "q_breslow_day" -> ((s, dir) =>
      // is the discount-rate odds ratio the SAME across return flags?
      // Breslow-Day + Tarone on the 3-stratum 2x2s — the homogeneity
      // gate in front of q_mantel_haenszel's pooled OR
      Experiments.breslowDay(
        li(s, dir).select(F.col("l_returnflag"),
          F.when(F.col("l_orderkey") % 2 === 0, "a").otherwise("b")
            .as("cohort"),
          (F.col("l_discount") >= 0.05).as("y")),
        "cohort", "y", Seq("l_returnflag"))),
    "q_chi2_terms" -> ((s, dir) =>
      // χ² filter selection: top-5 tokens per language by the 2×2
      // presence×class association — every χ² input is an exact
      // integer, so scores and the (chi2 desc, token asc) ranks
      // replay bit-for-bit
      TextOps.chi2Terms(docs(s, dir), "doc_id", "text", "lang", topK = 5)
        .orderBy("cls", "rank")),
    "q_hellinger" -> ((s, dir) =>
      // bounded drift per return flag: Hellinger/Bhattacharyya between
      // the parity cohorts' integer-quantity PMFs — exact integer cell
      // ratios, one (group, value) aggregation + per-group fold
      Drift.hellingerByGroup(
        li(s, dir).select(F.col("l_returnflag"),
          F.when(F.col("l_orderkey") % 2 === 0, "a").otherwise("b")
            .as("cohort"),
          F.col("l_quantity").cast("int").as("qty")),
        "cohort", "qty", Seq("l_returnflag"))
        .orderBy("l_returnflag")),
    "q_mann_kendall" -> ((s, dir) =>
      // monotone-trend test per event type: daily means
      // (decimal-exact, so S replays bit-for-bit), pairwise S over the
      // tiny period frame, tie-corrected Var(S), continuity-corrected
      // z, Sen's slope as the lower pair median
      Features.mannKendallByKey(events(s, dir), "event_type", "ts",
          "value", periodUnit = 86400000000000L)
        .orderBy("event_type")),
    "q_pettitt" -> ((s, dir) =>
      // single-changepoint test per event type on the same daily
      // means: rank-form U_t is exactly integer (avg ranks), the
      // break = first argmax of |U|, p = 2·exp(−6K²/(n³+n²))
      Features.pettittByKey(events(s, dir), "event_type", "ts",
          "value", periodUnit = 86400000000000L)
        .orderBy("event_type")),
    "q_kpss" -> ((s, dir) =>
      // level-stationarity per event type: η̂ from t-ordered partial
      // sums over a Bartlett(5) long-run variance — every quadratic
      // form folds in t-order, so the replay associates identically
      Features.kpssByKey(events(s, dir), "event_type", "ts",
          "value", periodUnit = 86400000000000L, lags = 5)
        .orderBy("event_type")),
    "q_hurst" -> ((s, dir) =>
      // persistence vs mean-reversion per event type: R/S over block
      // sizes 5/10/15 of the daily series, H = ln-ln OLS slope —
      // block cumsums fold t-ordered, block means decimal-exact
      Features.hurstByKey(events(s, dir), "event_type", "ts",
          "value", periodUnit = 86400000000000L, sizes = Seq(5, 10, 15))
        .orderBy("event_type", "size")),
    "q_runs_test" -> ((s, dir) =>
      // randomness-around-the-median screen per event type: explicit
      // type-7 median, equal-to-median days dropped, exact integer
      // run/side counts, z from the closed-form moments
      Features.runsTestByKey(events(s, dir), "event_type", "ts",
          "value", periodUnit = 86400000000000L)
        .orderBy("event_type")),
    "q_holm" -> ((s, dir) =>
      // FWER control over the per-event-type chi2 p family: Holm
      // step-down via the prefix-max fold — the q_drift_fdr base with
      // the stricter guarantee
      StatTests.holmAdjust(
        StatTests.chiSquareGofByGroup(
          events(s, dir).select(F.col("event_type"),
            (F.col("user_id") % 7).as("v")),
          Seq("event_type"), "v"),
        "p_value")
        .select("event_type", "chi2", "p_value", "holm_rank", "p_holm",
          "reject_fwer")
        .orderBy("event_type")),
    "q_hist_by_group" -> ((s, dir) =>
      // per-segment fixed-grid histogram: one (group, bin) aggregation
      Histogram.continuousByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        Seq("l_returnflag"), "l_extendedprice",
        binStart = 0.0, binWidth = 5500.0, numBins = 20)
        .orderBy("l_returnflag", "bin")),
    "q_effect_sizes" -> ((s, dir) =>
      // magnitude companion to q_pairwise_contrasts: Cohen's d +
      // Hedges' g for every return-flag pair from one moment pass
      StatTests.effectSizes(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        "l_returnflag", "l_extendedprice")
        .orderBy("group_a", "group_b")),
    "q_icc" -> ((s, dir) =>
      // intraclass correlation of doc length within sources: are docs
      // within a source more alike than across — one ANOVA-stats fold
      StatTests.icc(docs(s, dir), "source", "n_chars")),
    "q_lorenz" -> ((s, dir) =>
      // Lorenz curve points per line status — the plot behind the
      // q_gini scalar; exact cumulative cell shares
      PlotData.lorenzByGroup(
        li(s, dir).where(F.col("l_orderkey") < 20000),
        Seq("l_linestatus"), "l_extendedprice")
        .orderBy("l_linestatus", "v")),
    "q_crosstab" -> ((s, dir) =>
      // percentage crosstab of return flag x line status: counts with
      // row/col/total shares from cell windows
      Evaluation.crosstab(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        "l_returnflag", "l_linestatus")
        .orderBy("a", "b")),
    "q_rate_ratio" -> ((s, dir) =>
      // Poisson rate-ratio: purchases per event between the user-
      // parity cohorts, log-scale CI + z
      Experiments.rateRatio(
        events(s, dir)
          .where(F.col("user_id").isNotNull &&
            F.col("event_type").isNotNull)
          .select(F.when(F.col("user_id") % 2 === 0, "a").otherwise("b")
            .as("cohort"),
            (F.col("event_type") === "purchase").as("ev"),
            F.lit(1.0).as("expo")),
        "cohort", "ev", "expo")),
    "q_median_ci" -> ((s, dir) =>
      // distribution-free median CI per return flag from binomial-rank
      // order statistics — every bound a value that occurred
      Outliers.medianCiByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        Seq("l_returnflag"), "l_extendedprice")
        .orderBy("l_returnflag")),
    "q_eb_shrinkage" -> ((s, dir) =>
      // empirical-Bayes shrinkage of per-supplier return rates: the
      // beta prior moment-matched from the observed rate spread, small
      // suppliers pulled toward it
      Experiments.ebShrinkRates(
        li(s, dir).where(F.col("l_orderkey") < 50000)
          .select(F.col("l_suppkey"),
            (F.col("l_returnflag") === "R").as("y")),
        Seq("l_suppkey"), "y")
        .orderBy("l_suppkey")),
    "q_event_study" -> ((s, dir) => {
      // staggered rollout read off the data itself: each user's first
      // purchase week is their treatment cohort, with a deterministic
      // user_id % 3 == 0 HOLDOUT whose purchases are ignored — the
      // never-treated control must exist at every scale factor (at
      // tiny SF every user purchases) — y = weekly mean event value
      val week = 604800000000000L
      val ev = events(s, dir)
        .where(F.col("user_id").isNotNull && F.col("ts").isNotNull)
      val cohort = ev.where(F.col("event_type") === "purchase" &&
          F.col("user_id") % 3 =!= 0)
        .groupBy(F.col("user_id"))
        .agg(F.min(F.expr(s"CAST(ts AS BIGINT) DIV $week"))
          .as("cohort"))
      val base = ev.select(F.col("user_id"),
          F.expr(s"CAST(ts AS BIGINT) DIV $week").as("week"),
          F.col("value"))
        .join(cohort, Seq("user_id"), "left")
      Experiments.eventStudy(base, "user_id", "week", "cohort",
          "value")
        .orderBy("cohort", "period")
    }),
    "q_eb_poisson" -> ((s, dir) =>
      // the gamma–Poisson sibling: per-supplier-bucket return RATE
      // with line-count exposure, MoM gamma prior, small buckets pull
      // toward the global rate
      Experiments.ebShrinkPoisson(
        li(s, dir).select((F.col("l_suppkey") % 20).as("bucket"),
          F.when(F.col("l_returnflag") === "R", 1.0).otherwise(0.0)
            .as("evt"),
          F.lit(1.0).as("exp")),
        Seq("bucket"), "evt", "exp")
        .orderBy("bucket")),
    "q_control_chart" -> ((s, dir) =>
      // XmR individuals chart per event type over the daily means:
      // x̄ ± 2.66·mR̄ limits (rounded), out-of-limit day count — the
      // SPC screen for "did the process change"
      Features.controlChartByKey(events(s, dir), "event_type", "ts",
          "value", periodUnit = 86400000000000L)
        .orderBy("event_type")),
    "q_demand_class" -> ((s, dir) =>
      // Syntetos–Boylan ADI/CV² quadrant per sparse user series: the
      // router that decides Holt/HW vs Croston before any fitting
      Features.demandClassifyByKey(
        events(s, dir).where(F.col("user_id") < 30),
        "user_id", "ts", "value", periodUnit = 86400000000000L)
        .orderBy("user_id")),
    "q_split_leakage" -> ((s, dir) =>
      // the eval-contamination audit: row-wise splits leak users
      // across train/val/test — count the cross-split entities the
      // key-wise splitter exists to zero out
      Sampling.splitLeakageAudit(
        events(s, dir).select(F.col("user_id"),
          F.when(F.col("event_id") % 10 < 8, "train")
            .when(F.col("event_id") % 10 === 8, "val")
            .otherwise("test").as("split")),
        "user_id", "split")
        .orderBy("split_a", "split_b")),
    "q_rbo" -> ((s, dir) =>
      // the top-weighted ranking agreement on the same two vocabulary
      // heads: truncated rank-biased overlap at p = 0.9, shallow
      // ranks geometrically dominant
      Validation.rankBiasedOverlap(
        docs(s, dir).where(F.col("lang") === "en")
          .select(F.explode(TextOps.wordTokens(F.col("text")))
            .as("w")),
        docs(s, dir).where(F.col("lang") =!= "en")
          .select(F.explode(TextOps.wordTokens(F.col("text")))
            .as("w")),
        "w", k = 20, p = 0.9)),
    "q_interval_overlap" -> ((s, dir) => {
      // interval x interval overlap join without a cartesian: both
      // 30-day order windows explode to week buckets, hash-join, and
      // each pair emits once in the overlap-start bucket
      val ords = s.read.parquet(s"$dir/orders.parquet")
        .select(F.col("o_orderkey"),
          F.col("o_orderdate").cast("timestamp").cast("long")
            .as("start"))
      val a = ords.where(F.col("o_orderkey") < 100)
        .select(F.col("o_orderkey").as("a_key"),
          F.col("start").as("a_s"),
          (F.col("start") + 30L * 86400L).as("a_e"))
      val b = ords.where(F.col("o_orderkey") >= 100 &&
          F.col("o_orderkey") < 300)
        .select(F.col("o_orderkey").as("b_key"),
          F.col("start").as("b_s"),
          (F.col("start") + 30L * 86400L).as("b_e"))
      RangeJoin.intervalOverlap(a, "a_s", "a_e", b, "b_s", "b_e",
          bucketWidth = 604800L)
        .groupBy("a_key")
        .agg(F.count(F.lit(1)).as("n_overlaps"),
          F.sum(F.least(F.col("a_e"), F.col("b_e")) -
            F.greatest(F.col("a_s"), F.col("b_s")))
            .as("overlap_secs"))
        .orderBy("a_key")
    }),
    "q_peaks" -> ((s, dir) =>
      // which days actually spiked, per event type: strict local
      // maxima of the daily means clearing both neighbors by >= 1.0
      Features.peaksByKey(events(s, dir), "event_type", "ts", "value",
          periodUnit = 86400000000000L, minMargin = 1.0)
        .orderBy("event_type", "period")),
    "q_adf" -> ((s, dir) =>
      // the unit-root half of the stationarity pair (KPSS tests the
      // other null): lag-0 ADF with drift per event type over the
      // daily means, t vs the pinned -2.86
      Features.adfByKey(events(s, dir), "event_type", "ts", "value",
          periodUnit = 86400000000000L)
        .orderBy("event_type")),
    "q_cointegration" -> ((s, dir) =>
      // do daily quantity and price share a long-run equilibrium per
      // return flag: Engle-Granger two-step over the daily decimal
      // means — OLS residuals, then the Dickey-Fuller t vs -3.34
      Features.cointegrationByKey(
        li(s, dir).select(F.col("l_returnflag"),
          F.col("l_shipdate").cast("timestamp").as("ts"),
          F.col("l_quantity").as("x"),
          F.col("l_extendedprice").as("y")),
        "l_returnflag", "ts", "x", "y", periodUnit = 86400L)
        .orderBy("l_returnflag")),
    "q_period_detect" -> ((s, dir) =>
      // which lag is this series' season: argmax of the rounded ACF
      // over lags 2..7 per event type (ties to the smaller lag) with
      // the 2/sqrt(n) white-noise bar — the seasonLength router
      Features.periodDetectByKey(events(s, dir), "event_type", "ts",
          "value", periodUnit = 86400000000000L, maxLag = 7)
        .orderBy("event_type")),
    "q_k_anonymity" -> ((s, dir) =>
      // pre-release privacy screen: (partkey, returnflag) quasi tuple,
      // quantity sensitive — violation shares at k = 2/5/10 plus the
      // l-diversity floor, one group aggregation
      Validation.kAnonymityAudit(li(s, dir),
        Seq("l_partkey", "l_returnflag"), "l_quantity",
        ks = Seq(2, 5, 10))
        .orderBy("k")),
    "q_topk_churn" -> ((s, dir) =>
      // did the vocabulary HEAD move between slices: top-20 token
      // overlap, newcomers/dropouts, Spearman footrule on the common
      // ranks — the ranked complement of mass-based drift
      Validation.topkChurn(
        docs(s, dir).where(F.col("lang") === "en")
          .select(F.explode(TextOps.wordTokens(F.col("text")))
            .as("w")),
        docs(s, dir).where(F.col("lang") =!= "en")
          .select(F.explode(TextOps.wordTokens(F.col("text")))
            .as("w")),
        "w", k = 20)),
    "q_sequential" -> ((s, dir) =>
      // group-sequential A/B monitor: weekly looks at the cumulative
      // purchase-rate z vs the O'Brien-Fleming-shaped boundary
      Experiments.sequentialMonitor(
        events(s, dir)
          .where(F.col("ts").isNotNull && F.col("user_id").isNotNull &&
            F.col("event_type").isNotNull)
          .select(
            F.floor((F.col("ts") -
              F.pmod(F.col("ts"), F.lit(604800000000000L))) /
              604800000000000.0).cast("long").as("period"),
            F.when(F.col("user_id") % 2 === 0, "a").otherwise("b")
              .as("cohort"),
            (F.col("event_type") === "purchase").as("y")),
        "period", "cohort", "y")
        .orderBy("period")),
    "q_fk_coverage" -> ((s, dir) =>
      // referential integrity: do lineitem supplier keys resolve in
      // the supplier dim — row and key coverage + orphan count
      Validation.fkCoverage(li(s, dir),
        s.read.parquet(s"$dir/supplier.parquet"),
        "l_suppkey", "s_suppkey")),
    "q_candidate_keys" -> ((s, dir) =>
      // candidate-key discovery: is (orderkey), (orderkey, linenumber)
      // or (partkey) a row identifier — exact distinct/dup counts per
      // candidate set, one pruned pass each
      Validation.candidateKeys(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        Seq(Seq("l_orderkey"), Seq("l_orderkey", "l_linenumber"),
          Seq("l_partkey")))
        .orderBy("key_cols")),
    "q_fd_check" -> ((s, dir) =>
      // functional-dependency audit: does user_id determine
      // event_type (it should NOT — the violation path is the
      // interesting one); distinct-pair then determinant reduction
      Validation.functionalDependency(events(s, dir),
        Seq("user_id"), "event_type")),
    "q_readability" -> ((s, dir) =>
      // Coleman-Liau readability: the no-syllable formula — every
      // count a codegen'd regexp, the score replays exactly
      TextOps.withReadability(docs(s, dir), "text")
        .select(F.col("doc_id"), F.col("n_letters"), F.col("n_words"),
          F.col("n_sentences"), F.col("cli"))
        .orderBy("doc_id")),
    "q_attribution" -> ((s, dir) =>
      // first/last-touch conversion attribution: one user shuffle
      // serves both bookend models; organic conversions report nulls
      Cohorts.touchAttribution(events(s, dir), "user_id", "ts",
          "event_type", conversionType = "purchase",
          tieBreakCols = Seq("event_id"))
        .orderBy("user_id", "ts")),
    "q_cv_auc" -> ((s, dir) => {
      // cross-validated metric: deterministic md5 folds + per-fold
      // rank-identity AUC — the composition an eval harness runs
      val base = li(s, dir).where(F.col("l_orderkey") < 100000)
        .select((F.col("l_returnflag") === "R").as("y"),
          F.col("l_discount"), F.col("l_orderkey"))
      Evaluation.aucByGroup(
        Sampling.kFolds(base, "l_orderkey", 5),
        Seq("fold"), "y", "l_discount")
        .orderBy("fold")
    }),
    "q_seasonal_index" -> ((s, dir) =>
      // day-of-week seasonal index per event type: integer-exact phase
      // buckets, one (key, phase) aggregation, key mean over <= 7 cells
      Features.seasonalIndexByKey(events(s, dir), "event_type", "ts",
          "value", phaseUnit = 86400000000000L, period = 7)
        .orderBy("event_type", "phase")),
    "q_decayed" -> ((s, dir) => {
      // recency-weighted activity per event type at an explicit
      // reference time (the dataset's max ts — a pure function of the
      // data, backfillable): half-life 7 days, ONE aggregation
      val ref = events(s, dir).agg(F.max(F.col("ts"))).head().getLong(0)
      Features.decayedByKey(events(s, dir), "event_type", "ts",
          "value", refTs = ref, halfLife = 604800000000000.0)
        .orderBy("event_type")
    }),
    "q_lsh_plan" -> ((s, dir) =>
      // LSH banding planner: every (b, r) factorization of a 128-hash
      // budget with its S-curve crossover and catch probability at
      // jaccard 0.8 — closed-form planning math
      Dedup.lshPlan(s, threshold = 0.8, nHashes = 128)
        .orderBy("bands")),
    "q_bradley_terry" -> ((s, dir) => {
      // preference ranking: within-order supplier comparisons by line
      // price -> Bradley-Terry MM strengths, 2 fixed rounds, every
      // round a DuckDB-chained CTE
      val base = keyCappedLineitem(s, dir, 20000,
          Seq("l_orderkey", "l_suppkey", "l_extendedprice"))
        .select(F.col("l_orderkey").as("o"),
          F.col("l_suppkey").cast("string").as("sk"),
          F.col("l_extendedprice").cast("double").as("p"))
      val pairs = base.as("a").join(base.as("b"),
        F.col("a.o") === F.col("b.o") &&
          F.col("a.sk") =!= F.col("b.sk") &&
          F.col("a.p") > F.col("b.p"))
        .select(F.col("a.sk").as("winner"), F.col("b.sk").as("loser"))
      Preference.bradleyTerry(pairs, "winner", "loser", iters = 2)
        .orderBy("item")
    }),
    "q_isotonic_group" -> ((s, dir) =>
      // per-segment isotonic calibration: PAV runs INSIDE executors
      // over (group, bin) cells — a million segments in one shuffle
      Evaluation.isotonicByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_linestatus"),
            (F.col("l_returnflag") === "R").as("y"),
            (F.col("l_discount") * 10.0).as("score")),
        "l_linestatus", "y", "score", bins = 10)
        .orderBy("l_linestatus", "bin")),
    "q_whiten" -> ((s, dir) => {
      // PCA whitening invariants: unit variance per whitened coord,
      // zero cross-covariance, zero mean — pinned as oracle constants
      // (the q_embedding_pca pattern)
      val m = Pca.fit(emb(s, dir), "embedding")
      emb(s, dir).select(
        m.whitenedProjection(F.col("embedding"), 0).as("w1"),
        m.whitenedProjection(F.col("embedding"), 1).as("w2"))
        .agg(F.round(F.var_pop(F.col("w1")), 6).as("var_w1"),
          F.round(F.var_pop(F.col("w2")), 6).as("var_w2"),
          F.round(F.abs(F.covar_pop(F.col("w1"), F.col("w2"))), 6)
            .as("cov_w12"),
          F.round(F.abs(F.avg(F.col("w1"))), 6).as("mean_w1"))
    }),
    "q_winsorized" -> ((s, dir) =>
      // winsorized mean per return flag: the clamp sibling of
      // q_trimmed_mean — mid-mass clamp + two boundary order
      // statistics, all exact integer cell algebra
      Outliers.winsorizedMeanByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        Seq("l_returnflag"), "l_extendedprice", trim = 0.1)
        .orderBy("l_returnflag")),
    "q_quantile_map" -> ((s, dir) =>
      // CDF matching: cohort-b prices rewritten onto cohort-a's
      // distribution — prefix-sum ranks both sides, range-sorted merge
      // with a broadcast-seeded last-ref carry (as-of without the
      // single-key window)
      Ranks.quantileMap(
        li(s, dir).where(F.col("l_orderkey") < 20000)
          .select(F.when(F.col("l_orderkey") % 2 === 0, "a")
            .otherwise("b").as("cohort"),
            F.col("l_extendedprice")),
        "cohort", "l_extendedprice", labelSrc = "b", labelRef = "a")
        .orderBy("value")),
    "q_stratified_ate" -> ((s, dir) =>
      // Rosenbaum-Rubin stratified ATE: parity "treatment" on price,
      // stratified on quantity quintiles — per-stratum gaps weighted
      // by size, one-armed strata excluded and counted
      Experiments.stratifiedAte(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select((F.col("l_orderkey") % 2 === 0).as("t"),
            F.col("l_extendedprice").as("y"),
            F.col("l_quantity").as("score")),
        "t", "y", "score", k = 5)),
    "q_power" -> ((s, dir) =>
      // experiment power readout at the observed state: achieved power
      // + required n per arm at 80% target — closed-form normal algebra
      Experiments.powerTwoProportion(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.when(F.col("l_orderkey") % 2 === 0, "a")
            .otherwise("b").as("cohort"),
            (F.col("l_returnflag") === "R").as("y")),
        "cohort", "y")),
    "q_competing_risks" -> ((s, dir) =>
      // Aalen-Johansen cumulative incidence: returned (cause 1) vs
      // damaged-proxy (cause 2) competing over quantity-as-duration —
      // 1−KM per cause would overstate both; S(t-) rides the all-cause
      // frame, increments join on (group, time)
      Survival.cumulativeIncidence(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_linestatus"), F.col("l_quantity"),
            F.when(F.col("l_returnflag") === "R", 1L)
              .when(F.col("l_returnflag") === "A", 2L).otherwise(0L)
              .as("cause")),
        "l_quantity", "cause", Seq("l_linestatus"))
        .orderBy("l_linestatus", "cause", "t")),
    "q_rfm" -> ((s, dir) =>
      // RFM segmentation: one user aggregation + three tie-stable
      // prefix-sum bucketings; monetary pre-rounded so sum noise can't
      // flip a near-tie across a bucket edge
      Cohorts.rfm(events(s, dir), "user_id", "ts", "value", k = 5)
        .orderBy("user_id")),
    "q_dunn" -> ((s, dir) =>
      // nonparametric post-hoc: Dunn's pairwise z on pooled midranks
      // (prefix-sum construction, no global window), BH across pairs
      StatTests.dunnTest(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        "l_returnflag", "l_quantity")
        .orderBy("group_a", "group_b")),
    "q_levene" -> ((s, dir) =>
      // Brown-Forsythe variance homogeneity across return flags:
      // median-centered |z| ANOVA — the assumption check q_anova leans
      // on; p rides the operator (unit-pinned), oracle replays F.
      // The raw SS columns are dropped from the harness output: at
      // price scale they are ~1e13, where a double sum's reduce-order
      // wobble (~1e-2 absolute) exceeds any fixed-decimal rounding
      // grain — the F RATIO is reduce-order-safe, the addends aren't
      StatTests.brownForsythe(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        "l_returnflag", "l_extendedprice")
        .select(F.col("f_stat"), F.col("df1"), F.col("df2"),
          F.col("n"))),
    "q_jarque_bera" -> ((s, dir) =>
      // Jarque-Bera normality per line status on quantity: one raw-
      // moment aggregation, dof-2 survival is closed-form exp(-JB/2)
      StatTests.jarqueBeraByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        Seq("l_linestatus"), "l_quantity")
        .orderBy("l_linestatus")),
    "q_trend_test" -> ((s, dir) =>
      // Cochran-Armitage: is the returned-rate monotone in the
      // discount tier? one (score) cell aggregation + closed-form z
      StatTests.cochranArmitage(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_discount"),
            (F.col("l_returnflag") === "R").as("y")),
        "l_discount", "y")),
    "q_mcnemar" -> ((s, dir) =>
      // paired binary comparison on the SAME rows: returned-flag vs a
      // discount rule — only discordant cells carry information
      StatTests.mcnemar(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select((F.col("l_returnflag") === "R").as("fa"),
            (F.col("l_discount") >= 0.05).as("fb")),
        "fa", "fb")),
    "q_odds_ratio" -> ((s, dir) =>
      // effect sizes for the parity-cohort 2x2: OR and RR with
      // log-scale 95% normal CIs
      Experiments.oddsRatio(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.when(F.col("l_orderkey") % 2 === 0, "a")
            .otherwise("b").as("cohort"),
            (F.col("l_returnflag") === "R").as("y")),
        "cohort", "y")),
    "q_transitions" -> ((s, dir) =>
      // first-order Markov matrix of user event sequences: lag pairing
      // on one key shuffle, |states|^2 cells, row-normalized
      Cohorts.transitionMatrix(events(s, dir), "user_id", "ts",
          "event_type", tieBreakCols = Seq("event_id"))
        .orderBy("from_state", "to_state")),
    "q_seq_patterns" -> ((s, dir) =>
      // frequent 3-step user journeys: contiguous event-type trigrams
      // under the per-user window, support = distinct users, top-25
      // by (support desc, pattern asc) — sequence mining's first rung
      Cohorts.sequencePatterns(events(s, dir), "user_id", "ts",
        "event_type", size = 3, minSupport = 2L, topK = 25,
        tieBreakCols = Seq("event_id"))),
    "q_fairness" -> ((s, dir) =>
      // per-segment fairness table: base rate, mean score, per-group
      // AUC and its gap vs the overall AUC baseline
      Evaluation.fairnessReport(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_linestatus"),
            (F.col("l_returnflag") === "R").as("y"),
            F.col("l_discount")),
        Seq("l_linestatus"), "y", "l_discount")
        .orderBy("l_linestatus")),
    "q_hashing_trick" -> ((s, dir) =>
      // feature hashing: md5 dim + Weinberger sign, no vocabulary
      // table, bit-exact across engines — sparse triples for a slice
      Features.hashingVectorize(
        docs(s, dir).where(F.col("doc_id") < 50), "doc_id", "text",
        dims = 64)
        .orderBy("id", "dim")),
    "q_psi_quantile" -> ((s, dir) =>
      // production-convention PSI: equal-mass bins from cohort A's
      // EXACT decile edges (prefix-sum order statistics), both cohorts
      // binned by the same edges, smoothed divergences
      Drift.quantileBinDrift(
        li(s, dir).select(
          F.when(F.col("l_orderkey") % 2 === 0, "a").otherwise("b")
            .as("cohort"),
          F.col("l_extendedprice")),
        "cohort", "l_extendedprice", bins = 10)
        .select(F.round(F.col("psi"), 8).as("psi"),
          F.round(F.col("kl_ab"), 8).as("kl_ab"),
          F.round(F.col("kl_ba"), 8).as("kl_ba"),
          F.col("n_a"), F.col("n_b"), F.col("n_cells"))),
    "q_brier" -> ((s, dir) =>
      // Murphy decomposition over the q_calibration bins: is the Brier
      // error miscalibration (reliability) or missing discrimination
      // (resolution)?
      Evaluation.brierDecomposition(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select((F.col("l_returnflag") === "R").as("y"),
            (F.col("l_discount") * 10.0).as("score")),
        "y", "score", bins = 10)),
    "q_centroid_sim" -> ((s, dir) => {
      // domain similarity matrix: pairwise cosine between per-language
      // embedding centroids — k^2·d cell pairs, corpus-size-independent
      val d = docs(s, dir).select(F.col("doc_id"), F.col("lang"))
      val e = emb(s, dir).join(d, F.col("vec_id") === F.col("doc_id"))
      Similarity.centroidSimilarity(e, "lang", "embedding")
        .orderBy("group_a", "group_b")
    }),
    "q_negative_sample" -> ((s, dir) =>
      // contrastive-pair negatives: 3 md5-deterministic non-self draws
      // per document via the dense-index prefix-sum + skip-own shift —
      // no RNG state, replays bit-exactly
      Sampling.negativeSample(docs(s, dir), "doc_id", k = 3)
        .orderBy("anchor", "j")),
    "q_qini" -> ((s, dir) =>
      // uplift/Qini deciles: price-ranked buckets, order-parity
      // "treatment", cumulative incremental conversions over the
      // control baseline
      Experiments.qiniTable(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select((F.col("l_orderkey") % 2 === 0).as("treated"),
            (F.col("l_returnflag") === "R").as("y"),
            F.col("l_extendedprice")),
        "treated", "y", "l_extendedprice", k = 10)
        .orderBy("bucket")),
    "q_pairwise_contrasts" -> ((s, dir) =>
      // post-hoc "WHICH segments differ": all return-flag pairs,
      // Welch z from one moment aggregation, BH-FDR across the pairs
      StatTests.pairwiseContrasts(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        "l_returnflag", "l_extendedprice")
        .orderBy("group_a", "group_b")),
    "q_cramers_v" -> ((s, dir) =>
      // chi2 independence + Cramér's V of return flag × line status:
      // expected counts ride cell windows, missing cells fold in
      // algebraically, p replays as the even-dof Poisson sum
      Evaluation.contingencyEffects(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        "l_returnflag", "l_linestatus")),
    "q_life_table" -> ((s, dir) =>
      // actuarial life table of quantity-as-duration in width-10
      // intervals: half-interval censoring adjustment, per-group cell
      // windows — the grouped-time complement to q_km_curve
      Survival.lifeTable(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_linestatus"), F.col("l_quantity"),
            (F.col("l_returnflag") =!= "N").as("ev")),
        "l_quantity", "ev", Seq("l_linestatus"), width = 10.0)
        .orderBy("l_linestatus", "period")),
    "q_basket_lift" -> ((s, dir) =>
      // market-basket pairs over order×part incidence: top-50 by lift
      // with a min-pair floor; per-basket quadratic fan-out, size-
      // guarded and OBSERVED, item counts joined back
      Associations.basketPairs(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        "l_orderkey", "l_partkey", minPairCount = 2L, k = 50)),
    "q_rrf" -> ((s, dir) => {
      // hybrid-retrieval fusion: supplier rankings by revenue and by
      // quantity per line status (top-20 lists, deterministic rounded-
      // score order) fused with reciprocal-rank fusion
      import org.apache.spark.sql.expressions.Window
      val base = li(s, dir).where(F.col("l_orderkey") < 100000)
        .groupBy(F.col("l_linestatus"), F.col("l_suppkey"))
        .agg(F.round(F.sum(F.col("l_extendedprice") *
          (F.lit(1.0) - F.col("l_discount"))), 2).as("rev"),
          F.sum(F.col("l_quantity")).as("qty"))
      def top(ord: org.apache.spark.sql.Column) = {
        val w = Window.partitionBy("l_linestatus")
          .orderBy(ord, F.col("l_suppkey").asc)
        base.withColumn("rank", F.row_number().over(w).cast("long"))
          .where(F.col("rank") <= 20)
          .select("l_linestatus", "l_suppkey", "rank")
      }
      Evaluation.rrfFuse(top(F.col("rev").desc), top(F.col("qty").desc),
        "l_linestatus", "l_suppkey", "rank", kConst = 60, topK = 10)
        .withColumn("rrf", F.round(F.col("rrf"), 9))
        .orderBy("l_linestatus", "fused_rank")
    }),
    "q_partial_corr" -> ((s, dir) =>
      // partial correlation of quantity and revenue controlling for
      // discount, per return flag — three correlations from ONE raw-
      // moment aggregation
      Regression.partialCorrByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        Seq("l_returnflag"), "l_quantity", "l_extendedprice",
        "l_discount")
        .orderBy("l_returnflag")),
    "q_profile" -> ((s, dir) =>
      // schema-level data card: every column profiled (null rate,
      // EXACT distinct, numeric min/max/mean) in ONE (column, value)
      // cells shuffle — no per-column countDistinct expansion
      Validation.profile(docs(s, dir),
        Seq("doc_id", "text", "lang", "source", "n_chars"))
        .orderBy("column")),
    "q_rare_collapse" -> ((s, dir) =>
      // cardinality control: part types below 1% share collapse to
      // _other; survivor set provably <= 1/minShare levels, broadcast
      // back for a map-side rewrite — the row table never shuffles
      Features.collapseRareLevels(
        s.read.parquet(s"$dir/part.parquet"), "p_type",
        minShare = 0.01)
        .groupBy("collapsed").agg(F.count(F.lit(1)).as("n"))
        .orderBy("collapsed")),
    "q_kendall" -> ((s, dir) =>
      // Kendall tau-b of quantity vs discount: exact concordance from
      // contingency CELLS (one cell join, O(cells^2) not O(n^2)) with
      // full tie correction
      Ranks.kendallTauB(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        "l_quantity", "l_discount")),
    "q_weighted_median" -> ((s, dir) =>
      // quantity-weighted median price per return flag: exact type-1
      // pick via per-group cumulative weight cells
      Ranks.weightedMedianByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        Seq("l_returnflag"), "l_extendedprice", "l_quantity")
        .orderBy("l_returnflag")),
    "q_mi_ranking" -> ((s, dir) =>
      // filter-method feature selection: MI of each candidate feature
      // with the length label — ALL features in one (feature, value,
      // label) cells shuffle via stack + grouped-MI
      Evaluation.miRanking(
        docs(s, dir).select(F.col("lang"), F.col("source"),
          F.when(F.col("n_chars") < 500, "short").otherwise("long")
            .as("len")),
        Seq("lang", "source"), "len")
        .orderBy("feature")),
    "q_acf" -> ((s, dir) =>
      // autocorrelation per event type at lags 1..3 over the time-
      // ordered value series — one shuffle on the key serves the mean
      // window, the lag windows and the final fold
      Features.acfByKey(events(s, dir), "event_type", "ts", "value",
          maxLag = 3, tieBreakCols = Seq("event_id"))
        .orderBy("event_type")),
    "q_pacf" -> ((s, dir) =>
      // PARTIAL autocorrelation at lags 1..3 — Durbin-Levinson
      // unrolled in closed form over the q_acf sums; the AR-order
      // chooser next to the raw ACF
      Features.pacfByKey(events(s, dir), "event_type", "ts", "value",
          tieBreakCols = Seq("event_id"))
        .orderBy("event_type")),
    "q_cusum" -> ((s, dir) =>
      // CUSUM changepoint scan per event type on the floored value
      // series: the argmax runs on the exact integer-shaped numerator
      // |n·CS − i·S| so the changepoint location replays bit-exactly
      Features.cusumByKey(
        events(s, dir)
          .where(F.col("value").isNotNull && !F.isnan(F.col("value")))
          .select(F.col("event_type"), F.col("ts"), F.col("event_id"),
            F.floor(F.col("value")).cast("double").as("valq")),
        "event_type", "ts", "valq", tieBreakCols = Seq("event_id"))
        .orderBy("event_type")),
    "q_seasonal_anomaly" -> ((s, dir) =>
      // seasonal-naive anomaly scan: residual vs the value 7
      // observations back per event type, z against the key's own
      // residual distribution — one key shuffle serves lag + moments
      Features.seasonalAnomaly(events(s, dir), "event_type", "ts",
          "value", season = 7, zThreshold = 2.5,
          tieBreakCols = Seq("event_id"))
        .orderBy("event_type", "ts", "value")),
    "q_trimmed_mean" -> ((s, dir) =>
      // 10%-trimmed mean of line prices per return flag: exact integer
      // cell-clamp algebra, deterministic under any tie pattern
      Outliers.trimmedMeanByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        Seq("l_returnflag"), "l_extendedprice", trim = 0.1)
        .orderBy("l_returnflag")),
    "q_target_encode" -> ((s, dir) =>
      // target encoding of line status against the returned-flag label:
      // smoothed (m-estimate) and leave-one-out variants — category
      // table broadcast back, no row shuffle
      Features.targetEncode(
        li(s, dir).where(F.col("l_orderkey") < 50000)
          .select(F.col("l_orderkey"), F.col("l_linenumber"),
            F.col("l_linestatus"),
            (F.col("l_returnflag") === "R").cast("double").as("y")),
        "l_linestatus", "y", smoothing = 20.0)
        .select(F.col("l_orderkey"), F.col("l_linenumber"),
          F.col("te_smooth"), F.col("te_loo"))
        .orderBy("l_orderkey", "l_linenumber")),
    "q_ewma" -> ((s, dir) =>
      // per-user EWMA (alpha = 0.2) via the secondary-sort scan — the
      // recurrence no window frame can express; DuckDB replays the
      // closed-form (1-a)-power sum per row
      Features.ewmaByKey(
        events(s, dir).where(F.col("value").isNotNull &&
          !F.isnan(F.col("value"))),
        "user_id", "ts", "value", alpha = 0.2,
        tieBreakCols = Seq("event_id"))
        .select(F.col("event_id"), F.round(F.col("ewma"), 6).as("ewma_r"))
        .orderBy("event_id")),
    "q_cox_ph2" -> ((s, dir) => {
      // the MULTI-covariate Cox path (k=2): 2 Newton steps over the
      // 2x2 information matrix — pins the Gram aggregation + pivoted
      // solve that q_cox_ph's scalar case can't; DuckDB replays both
      // steps with closed-form 2x2 Cramer solves and the final
      // information pass for the SEs
      val d = li(s, dir).where(F.col("l_orderkey") < 100000)
        .select(F.col("l_quantity"),
          (F.col("l_returnflag") =!= "N").as("ev"),
          F.col("l_discount"), F.col("l_tax"))
      val m = Survival.coxPH(d, "l_quantity", "ev",
        Seq("l_discount", "l_tax"), iters = 2)
      import s.implicits._
      m.features.indices.map(i => (m.features(i),
          math.rint(m.beta(i) * 1e6) / 1e6,
          math.rint(math.exp(m.beta(i)) * 1e6) / 1e6,
          math.rint(m.se(i) * 1e6) / 1e6, m.n, m.nEvents))
        .toDF("feature", "coef_r", "hr_r", "se_r", "n", "n_events")
        .orderBy("feature")
    }),
    "q_kmeans_fixed" -> ((s, dir) => {
      // distributed Lloyd k-means, 2 iterations from the embeddings of
      // vec_id 1..4, iterates QUANTIZED to 6 decimals — the rounding
      // pins the whole trajectory so DuckDB replays both assignment +
      // update rounds bit-for-bit (modulo 6-dp mean rounding)
      val e = emb(s, dir)
      val init = e.where(F.col("vec_id").between(1, 4)).orderBy("vec_id")
        .select(F.col("embedding").cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toArray)
      val m = Clustering.kMeans(e, "embedding", "vec_id", k = 4,
        iters = 2, init = init, quantizeDecimals = 6)
      import s.implicits._
      m.sizes.indices.map(c => (c, m.sizes(c),
          m.centroids(c)(0), m.centroids(c)(1)))
        .toDF("cluster", "size", "c1_r", "c2_r")
    }),
    "q_auc_by_group" -> ((s, dir) =>
      // per-group ROC AUC ("which tenant's classifier degraded") — the
      // Mann-Whitney prefix sum on a window PARTITIONED BY GROUP over
      // the per-(group, score) cells frame
      Evaluation.aucByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_linestatus"),
            (F.col("l_returnflag") === "R").as("y"), F.col("l_discount")),
        Seq("l_linestatus"), "y", "l_discount")
        .orderBy("l_linestatus")),
    "q_mutual_info" -> ((s, dir) =>
      // categorical mutual information (nats) between return flag and
      // line status — ONE contingency aggregation; composes with
      // quantile bucketing for binned numeric MI
      Evaluation.mutualInformation(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        "l_returnflag", "l_linestatus")),
    "q_ranking_metrics" -> ((s, dir) =>
      // per-query ranking metrics (RR / AP / NDCG@5): each order is a
      // "query", its lines the candidate list ranked by discount with
      // linenumber tie-break, graded relevance from the return flag —
      // windows PARTITIONED BY QUERY, one aggregation per query
      Evaluation.rankingMetrics(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_orderkey"), F.col("l_linenumber"),
            F.when(F.col("l_returnflag") === "R", 2.0)
              .when(F.col("l_returnflag") === "A", 1.0)
              .otherwise(0.0).as("rel"),
            F.col("l_discount")),
        "l_orderkey", "l_linenumber", "rel", "l_discount", k = 5)
        .orderBy("l_orderkey")),
    "q_corr_by_group" -> ((s, dir) =>
      // pairwise Pearson matrix per group in long form — all pairs in
      // ONE aggregation (a corr column per pair)
      Regression.corrByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        Seq("l_linestatus"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy("l_linestatus", "col_a", "col_b")),
    "q_es_sample_group" -> ((s, dir) =>
      // exact-k weighted sampling per language — the stratified ES
      // form: deterministic md5 keys, per-group window rank, no global
      // sort
      Sampling.esWeightedSampleByGroup(docs(s, dir), Seq("lang"),
          "n_chars", "doc_id", k = 20)
        .select(F.col("lang"), F.col("doc_id"), F.col("n_chars"),
          F.round(F.col("es_key"), 9).as("es_key_r"))
        .orderBy("lang", "es_key_r", "doc_id")),
    "q_survival_gehan" -> ((s, dir) =>
      // Gehan-Breslow-Wilcoxon: the log-rank fold with weight n(t) —
      // early differences dominate; same prefix-sum construction and
      // rounding discipline as q_survival_logrank
      Survival.gehanWilcoxon(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(
            F.when(F.col("l_orderkey") % 2 === 0, "a").otherwise("b")
              .as("cohort"),
            F.col("l_quantity"),
            (F.col("l_returnflag") =!= "N").as("ev")),
        "l_quantity", "ev", "cohort")),
    "q_auc" -> ((s, dir) =>
      // rank-based ROC AUC (the Mann-Whitney identity): does discount
      // rank returned lines above kept ones? U is an exact half-integer
      // via the prefix-sum fold; auc/gini/se at the rounded auc
      Evaluation.aucRoc(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select((F.col("l_returnflag") === "R").as("y"),
            F.col("l_discount")),
        "y", "l_discount")),
    "q_calibration" -> ((s, dir) =>
      // reliability-diagram data: 10 equal-width score bins, observed
      // positive rate vs mean score — ONE aggregation
      Evaluation.calibrationBins(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select((F.col("l_returnflag") === "R").as("y"),
            (F.col("l_discount") * 10.0).as("score")),
        "y", "score", bins = 10)
        .orderBy("bin")),
    "q_welch_group" -> ((s, dir) =>
      // Welch's unequal-variance t per line status between the order-
      // parity cohorts — ONE aggregation, normal-approx p at the
      // 6-rounded t (corpus-scale dof)
      StatTests.welchTTestByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_linestatus"),
            F.when(F.col("l_orderkey") % 2 === 0, "a").otherwise("b")
              .as("cohort"),
            F.col("l_extendedprice")),
        Seq("l_linestatus"), "cohort", "l_extendedprice")
        .orderBy("l_linestatus")),
    "q_lift" -> ((s, dir) =>
      // gains/decile table of price as a "returned" score: tie-stable
      // desc rank buckets via the prefix-sum min-rank construction,
      // cumulative capture + lift over <= k bucket rows
      Evaluation.liftTable(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select((F.col("l_returnflag") === "R").as("y"),
            F.col("l_extendedprice")),
        "y", "l_extendedprice", k = 10)
        .orderBy("bucket")),
    "q_balance" -> ((s, dir) =>
      // covariate balance between the order-parity cohorts: SMD +
      // variance ratio per covariate, all covariates long-form through
      // one stack and ONE conditional-moment aggregation
      Experiments.covariateBalance(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.when(F.col("l_orderkey") % 2 === 0, "a")
            .otherwise("b").as("cohort"),
            F.col("l_quantity"), F.col("l_discount"),
            F.col("l_extendedprice"), F.col("l_tax")),
        "cohort", Seq("l_quantity", "l_discount", "l_extendedprice",
          "l_tax"))
        .orderBy("covariate")),
    "q_isotonic" -> ((s, dir) =>
      // isotonic (PAV) calibration of a discount-derived score against
      // the returned-flag label: one cells aggregation, driver PAV on
      // integer blocks; DuckDB replays the fit via the exact minimax
      // characterization max_{j<=i} min_{k>=i} mean(y[j..k])
      Evaluation.isotonicCalibrate(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select((F.col("l_returnflag") === "R").as("y"),
            (F.col("l_discount") * 10.0).as("score")),
        "y", "score", bins = 10)
        .orderBy("bin")),
    "q_gini" -> ((s, dir) =>
      // Gini inequality of line revenue per line status — one rank
      // window partitioned by group + one aggregation
      Ranks.giniByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        Seq("l_linestatus"), "l_extendedprice")
        .orderBy("l_linestatus")),
    "q_inequality" -> ((s, dir) =>
      // moment-based inequality panel per return flag: Theil T,
      // Atkinson(1), CV from ONE aggregation — the no-ranking
      // companions to q_gini
      Ranks.inequalityByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        Seq("l_returnflag"), "l_extendedprice")
        .orderBy("l_returnflag")),
    "q_periodogram" -> ((s, dir) =>
      // spectral power at the first six Fourier frequencies of each
      // event type's daily series — which cycle length carries the
      // variance; trig sums fold t-ordered so the replay associates
      // identically
      Features.periodogramByKey(events(s, dir), "event_type", "ts",
          "value", periodUnit = 86400000000000L, maxFreq = 6)
        .orderBy("event_type", "freq")),
    "q_pareto" -> ((s, dir) =>
      // supplier concentration per line status: how many suppliers
      // carry 80% of revenue — (group, key) aggregation + per-group
      // cumulative-share window, deterministic (value desc, key) order
      Ranks.paretoByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        Seq("l_linestatus"), "l_suppkey", "l_extendedprice", share = 0.8)
        .orderBy("l_linestatus")),
    "q_huber" -> ((s, dir) => {
      // Huber robust fit price ~ quantity (delta = 5000 price units,
      // 3 fixed IRLS passes): iteration 1 is OLS, then min(1, d/|r|)
      // reweighting with beta folded in as literals — one weighted
      // Gram aggregation per pass, replayed by chained Cramer CTEs
      import s.implicits._
      val m = Regression.huberIrls(li(s, dir), "l_extendedprice",
        Seq("l_quantity"), delta = 5000.0, iters = 3)
      ("intercept" +: m.features).zip(m.beta.toSeq)
        .toDF("feature", "coef")
        .select(F.col("feature"), F.round(F.col("coef"), 4).as("coef_r"))
        .withColumn("n", F.lit(m.n))
        .orderBy("feature")
    }),
    "q_conformal" -> ((s, dir) =>
      // split-conformal interval half-width per line status at 90%
      // coverage: exact ceil((n+1)(1-alpha))-th order statistic of the
      // absolute residuals, picked by cumulative cell counts
      Evaluation.conformalByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_linestatus"), F.col("l_extendedprice"),
            (F.col("l_quantity") * 3000.0).as("pred")),
        Seq("l_linestatus"), "l_extendedprice", "pred", alpha = 0.1)
        .orderBy("l_linestatus")),
    "q_anova" -> ((s, dir) =>
      // one-way ANOVA per line status: does mean quantity differ
      // across return flags — sufficient-statistic cells only; the
      // F-distribution p rides the operator (unit-pinned), the oracle
      // replays the exact SSB/SSW/F algebra
      StatTests.anovaByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        Seq("l_linestatus"), "l_returnflag", "l_quantity")
        .select(F.col("l_linestatus"), F.col("f_stat"), F.col("df1"),
          F.col("df2"), F.col("ss_between"), F.col("ss_within"),
          F.col("n"))
        .orderBy("l_linestatus")),
    "q_kruskal" -> ((s, dir) =>
      // Kruskal-Wallis per line status on the same design — midranks
      // via the RANGE-framed peer window, exact integer tie correction
      StatTests.kruskalWallisByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        Seq("l_linestatus"), "l_returnflag", "l_quantity")
        .select(F.col("l_linestatus"), F.col("h_stat"), F.col("dof"),
          F.col("n"))
        .orderBy("l_linestatus")),
    "q_cohen_kappa" -> ((s, dir) =>
      // chance-corrected agreement between two derived binary raters
      // — ONE contingency aggregation, marginals from the cells frame
      Evaluation.cohenKappa(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(
            F.when(F.col("l_returnflag") === "N", "keep")
              .otherwise("return").as("ra"),
            F.when(F.col("l_linestatus") === "O", "keep")
              .otherwise("return").as("rb")),
        "ra", "rb")),
    "q_bpe_encode_fixed" -> ((s, dir) => {
      // train 3 merges, then ENCODE the vocabulary with them — the
      // round-trip a tokenizer artifact exists for; DuckDB replays the
      // training CTEs plus one more rewrite and re-derives every
      // encoded symbol sequence
      val m = TextOps.bpeMerges(docs(s, dir), "doc_id", "text",
          numMerges = 3, tokenRegex = "^[a-z]+$")
        .orderBy("merge_rank").collect()
        .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
        .toSeq
      TextOps.bpeEncode(docs(s, dir), "doc_id", "text", m,
          tokenRegex = "^[a-z]+$")
        .orderBy("token")
    }),
    "q_cox_baseline" -> ((s, dir) => {
      // Breslow baseline cumulative hazard at the q_cox_ph fit — the
      // absolute-risk curve S0(t) whose riskScore power gives
      // per-subject survival predictions; two prefix-sum fold passes,
      // no global window even with all-distinct durations
      val d = li(s, dir).where(F.col("l_orderkey") < 100000)
        .select(F.col("l_quantity"),
          (F.col("l_returnflag") =!= "N").as("ev"), F.col("l_discount"))
      val m = Survival.coxPH(d, "l_quantity", "ev", Seq("l_discount"),
        iters = 3)
      Survival.baselineHazard(d, "l_quantity", "ev", m)
        .orderBy("t")
    }),
    "q_cox_ph" -> ((s, dir) => {
      // Cox proportional hazards (Breslow ties, 3 fixed Newton steps
      // from β=0 + one information/log-lik pass): does discount drive
      // the return hazard? Each pass is ONE groupBy(t) cells
      // aggregation + the t-DESC prefix fold (risk-set suffix sums) —
      // the oracle replays every Newton step as chained CTEs with
      // t-DESC window suffix sums, so the hash pins the whole iterate
      // trajectory, the SE, and both log-likelihoods
      val d = li(s, dir).where(F.col("l_orderkey") < 100000)
        .select(F.col("l_quantity"),
          (F.col("l_returnflag") =!= "N").as("ev"), F.col("l_discount"))
      val m = Survival.coxPH(d, "l_quantity", "ev", Seq("l_discount"),
        iters = 3)
      import s.implicits._
      Seq((math.rint(m.beta(0) * 1e6) / 1e6,
          math.rint(math.exp(m.beta(0)) * 1e6) / 1e6,
          math.rint(m.se(0) * 1e6) / 1e6,
          math.rint(m.logLik * 100) / 100,
          math.rint(m.logLik0 * 100) / 100, m.n, m.nEvents))
        .toDF("coef_r", "hr_r", "se_r", "ll_r", "ll0_r", "n", "n_events")
    }),
    "q_copula_serde" -> ((s, dir) => {
      // S5's copula sink hash-checked: the fitted copula goes save ->
      // JSON -> load on the driver, and the output reads marginal
      // params, Spearman, and the Cholesky row from the ROUND-TRIPPED
      // object against the SAME oracle as q_copula_fit — a green hash
      // proves the sink preserves every matrix and parameter exactly
      import s.implicits._
      val cop = cappedNormCopula(s, dir)
      val p = java.nio.file.Files.createTempFile("graft_copula", ".json")
      Serialization.saveCopula(cop, p.toString)
      val back = Serialization.loadCopula(p.toString)
      java.nio.file.Files.delete(p)
      val rho = back.correlation(0)(1)
      val l = back.cholesky
      val m = back.marginals
      def r6(x: Double) = math.round(x * 1e6) / 1e6
      def r4(x: Double) = math.round(x * 1e4) / 1e4
      Seq(
        ("chol_row2", r6(l(1)(0)), r6(l(1)(1))),
        ("marginal_loc", r4(m(0).params(0)), r4(m(1).params(0))),
        ("marginal_scale", r4(m(0).params(1)), r4(m(1).params(1))),
        ("spearman", r6(rho), if (m.forall(_.distName == "norm")) 1.0 else 0.0))
        .toDF("stat", "v1", "v2").orderBy("stat")
    }),
    "q_lazy_best_ks" -> ((s, dir) => {
      // M14/F8: lazy fit, then top-5 by K-S — forces the deferred-metric
      // recompute path (3n+5 AIC candidates, driver-side KS/AD fill)
      val r = cachedFit(s, dir, Seq("l_extendedprice"), cfg = FitConfig(lazyMetrics = true))
      fitOut(r.bestLazy(s, 5, "ks_statistic"))
    }),
    "q_hist_agg" -> ((s, dir) => {
      // §2.9's custom Catalyst aggregate: hist_counts computes the same
      // 40-bin histogram as q_hist in ONE partial-aggregate pass (the
      // exchange carries one array per partition, not grouped rows)
      graft.functions.SqlUdfs.register(s)
      val st = li(s, dir)
        .agg(F.min("l_extendedprice"), F.max("l_extendedprice")).head()
      val mn = st.getDouble(0)
      val hi = st.getDouble(1) + (st.getDouble(1) - mn) * 1e-10
      li(s, dir).where(F.col("l_extendedprice").isNotNull)
        .agg(F.call_udf("hist_counts", F.col("l_extendedprice"),
          F.lit(mn), F.lit(hi), F.lit(40)).as("h"))
        .select(F.posexplode(F.col("h")).as(Seq("pos", "cnt")))
        .where(F.col("cnt") > 0)
        .select(F.col("pos").cast("long").as("bin"), F.col("cnt"))
        .orderBy("bin")
    }),
    "q_dist_udf" -> ((s, dir) => {
      // §2.9 SQL surface: scalar dist_* UDFs usable from plain SQL over the
      // scipy-convention parameter arrays a fit emits
      graft.functions.SqlUdfs.register(s)
      li(s, dir).createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT l_orderkey, l_linenumber,
          |  round(dist_cdf('expon', array(0.0D, 10000.0D), l_extendedprice), 6) AS expon_cdf,
          |  round(dist_pdf('uniform', array(900.0D, 104100.0D), l_extendedprice), 9) AS unif_pdf,
          |  round(dist_ppf('uniform', array(0.0D, 1.0D),
          |        dist_cdf('uniform', array(900.0D, 104100.0D), l_extendedprice)), 6) AS unit_q
          |FROM lineitem_v ORDER BY l_orderkey, l_linenumber LIMIT 50""".stripMargin)
    }),
    "q_corr_spearman" -> ((s, dir) =>
      // A8 (reference default): Spearman with SQL rank() tie semantics,
      // computed scale-safe (Ranks: distinct-count shuffle + range-
      // partitioned prefix sums + hash-join back — no single-partition
      // global window)
      Ranks.spearman(li(s, dir), "l_extendedprice", "l_quantity")
        .select(F.round(F.col("spearman"), 6).as("spearman_price_qty"))),
    "q_sketch_bottomk" -> ((s, dir) => {
      // KMV bottom-k sketch, hash-checked end-to-end: per language, the 8
      // docs with the smallest md5(doc_id) — a content-addressed uniform
      // sample whose selected SET is engine/layout/rerun-stable — plus
      // the classic (k−1)/U(h_k) distinct-count estimate off the k-th
      // smallest hash. State is ≤ k pairs per partial aggregate; the
      // shuffle carries k rows per (partition, lang), never the group.
      // The estimate arithmetic stays in Catalyst so DuckDB replays it
      // bit-for-bit (same IEEE division off the same 32-bit hash prefix).
      val bk = F.udaf(new graft.functions.BottomK(8))
      val kLit = F.lit(8)
      docs(s, dir)
        .select(F.col("lang"),
          F.md5(F.col("doc_id").cast("string")).as("h"), F.col("doc_id"))
        .groupBy("lang")
        .agg(bk(F.col("h"), F.col("doc_id")).as("bk"))
        .withColumn("est_distinct",
          F.when(F.size(F.col("bk")) < kLit,
            F.size(F.col("bk")).cast("double"))
            .otherwise((kLit - 1).cast("double") /
              ((F.conv(F.substring(F.element_at(F.col("bk"), -1)("_1"), 1, 8),
                16, 10).cast("double") + 1.0) / 4294967296.0)))
        .select(F.col("lang"), F.round(F.col("est_distinct"), 4).as("est_r"),
          F.posexplode(F.col("bk")).as(Seq("pos", "e")))
        .select(F.col("lang"), F.col("est_r"),
          (F.col("pos") + 1).cast("long").as("rk"),
          F.col("e")("_2").as("doc_id"))
        .orderBy("lang", "rk")
    }),
    "q_decontam_bloom" -> ((s, dir) => {
      // the Bloom-prefiltered decontamination scale path, hash-checked
      // against the SAME oracle as q_decontaminate: the bloom prunes
      // corpus grams map-side (~12 bits/gram broadcast instead of the
      // gram strings) and the exact verify join removes its false
      // positives, so the report is exact — the bloom changes the plan,
      // never the answer
      val d = docs(s, dir)
      Decontam.bloomContaminationReport(d,
          d.where(F.col("doc_id") % 50 === 0), "doc_id", "text", n = 8)
        .orderBy("id")
    }),
    "q_hist_merge" -> ((s, dir) => {
      // mergeable-summary discipline, hash-checked: one hist_counts
      // sketch per event_type batch (the per-batch persisted artifact in
      // an incremental pipeline), element-wise merged into the global
      // histogram — the merge never touches raw rows, so backfilling a
      // new batch costs one sketch + one k-row merge, not a full rescan
      val histUdaf = F.udaf(graft.functions.HistAggregator)
      events(s, dir)
        .where(F.col("value").isNotNull)
        .groupBy("event_type")
        .agg(histUdaf(F.col("value"), F.lit(0.0), F.lit(500.0),
          F.lit(10)).as("h"))
        .select(F.posexplode(F.col("h")).as(Seq("pos", "cnt")))
        .groupBy(F.col("pos").cast("long").as("bin"))
        .agg(F.sum("cnt").as("cnt"))
        .where(F.col("cnt") > 0) // a GROUP BY oracle can't see empty bins
        .orderBy("bin")
    }),
    "q_stream_join" -> ((s, dir) => {
      // watermarked stream-stream interval join (click → purchases of the
      // same user in the trailing hour), hash-checked: inner-join matches
      // are emitted exactly once, so the availableNow replay reproduces
      // the batch interval join — DuckDB is the batch side
      def src = eventsStream(s, dir)
        .withColumn("ts_us", F.expr("ts div 1000"))
        .withColumn("event_ts", F.timestamp_micros(F.col("ts_us")))
      val clicks = src.where(F.col("event_type") === "click")
        .select(F.col("event_id").as("click_id"), F.col("user_id"),
          F.col("ts_us").as("click_us"), F.col("event_ts").as("click_ts"))
      val purchases = src.where(F.col("event_type") === "purchase")
        .select(F.col("event_id").as("purchase_id"),
          F.col("user_id"), F.col("value"),
          F.col("event_ts").as("purchase_ts"))
      val joined = graft.streaming.StreamingOps.intervalJoin(
        clicks, purchases, "user_id", "click_ts", "purchase_ts",
        lookback = "1 hour", watermark = "1 hour")
      graft.streaming.StreamingOps
        .runToBatch(s, joined, "graft_stream_join", outputMode = "append",
          statePartitions = 8)
        .select(F.col("click_id"), F.col("user_id"), F.col("purchase_id"),
          F.round(F.col("value"), 6).as("purchase_value"))
        .orderBy("click_id", "purchase_id")
    }),
    "q_grouped_ols" -> ((s, dir) => {
      // per-group simple OLS in ONE aggregation (slope/intercept/R²/
      // residual σ/t all exact functions of {n, mean, var_pop,
      // covar_pop}) — the "trend per tenant" workload at 10⁶-group
      // scale; every formula replays in DuckDB from the same moments.
      // resid σ (not σ²) is emitted: sqrt halves the relative float
      // noise, the same discipline as the grouped-fit norm scale
      Regression.olsByGroup(li(s, dir), "l_extendedprice", "l_quantity",
          Seq("l_returnflag"))
        .select(F.col("l_returnflag"), F.col("n"),
          F.round(F.col("slope"), 4).as("slope_r"),
          F.round(F.col("intercept"), 4).as("intercept_r"),
          F.round(F.col("r2"), 6).as("r2_r"),
          F.round(F.sqrt(F.col("resid_var")), 4).as("resid_std_r"),
          F.round(F.col("t_stat"), 2).as("t_r"))
        .orderBy("l_returnflag")
    }),
    "q_mediation" -> ((s, dir) =>
      // does discount move revenue THROUGH quantity: Baron-Kenny
      // a/b/c/c' paths + Sobel z, all closed forms of one nine-sum
      // moment aggregation
      Regression.mediation(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select((F.col("l_discount") * 100).as("x"),
            F.col("l_quantity").as("m"),
            (F.col("l_extendedprice") / 1000).as("y")),
        "x", "m", "y")),
    "q_response_curve" -> ((s, dir) =>
      // model-free return-rate curve over price deciles: tie-stable
      // quantile buckets + per-bucket mean response with normal CI
      Ranks.binnedResponse(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_extendedprice").as("x"),
            (F.col("l_returnflag") === "R").cast("int").as("y")),
        "x", "y", bins = 10)
        .orderBy("bucket")),
    "q_cluster_se" -> ((s, dir) =>
      // cluster-robust CR1 standard errors for the price-on-quantity
      // slope, clustered by supplier — randomized-by-store analyzed-
      // by-receipt protection; the iid SE rides along for the ratio
      Regression.clusterRobustOls(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_suppkey").as("g"),
            (F.col("l_extendedprice") / 1000).as("y"),
            F.col("l_quantity").as("x")),
        "g", "y", "x")),
    "q_fixed_effects" -> ((s, dir) =>
      // within estimator: the price-on-quantity slope AFTER absorbing
      // every supplier's own level — one per-unit demeaning window,
      // one pooled moment aggregation
      Regression.fixedEffectsOls(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_suppkey").as("u"),
            (F.col("l_extendedprice") / 1000).as("y"),
            F.col("l_quantity").as("x")),
        "u", "y", "x")),
    "q_cca" -> ((s, dir) =>
      // first/second canonical correlations between the (quantity,
      // discount) and (price, tax) blocks — closed-form 2×2 eigen of
      // Σxx⁻¹ΣxyΣyy⁻¹Σyx from ONE 14-sum aggregation
      Regression.cca2x2(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.col("l_quantity").as("a0"),
            (F.col("l_discount") * 100).as("b0"),
            (F.col("l_extendedprice") / 1000).as("c0"),
            (F.col("l_tax") * 100).as("d0")),
        "a0", "b0", "c0", "d0")),
    "q_kitagawa" -> ((s, dir) =>
      // mean-gap decomposition between the even/odd order cohorts
      // over line-status segments: mix vs rate effects, exact
      // identity with a reported residual for non-common support
      Experiments.kitagawa(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select(F.when(F.col("l_orderkey") % 2 === 0, "a")
            .otherwise("b").as("g"),
            F.col("l_linestatus"), F.col("l_extendedprice")),
        "g", "a", "b", "l_linestatus", "l_extendedprice")),
    "q_lda" -> ((s, dir) =>
      // Fisher's closed-form discriminant: which (quantity, scaled
      // discount) direction separates returned from kept lines —
      // one 12-column moment aggregation, 2×2 adjugate inverse in
      // column arithmetic, J = squared Mahalanobis gap
      Regression.fisherLda(
        li(s, dir).where(F.col("l_orderkey") < 100000)
          .select((F.col("l_returnflag") === "R").as("y"),
            F.col("l_quantity").as("x1"),
            (F.col("l_discount") * 100).as("x2")),
        "y", "x1", "x2")),
    "q_ols_multi" -> ((s, dir) => {
      // multiple regression via the Gram-matrix aggregation + driver
      // (k+1)×(k+1) solve; the DuckDB oracle re-solves the same normal
      // equations by 3×3 Cramer cofactors — agreement pins the whole
      // path (listwise filter, Gram sums, solve) to 2 decimals, the
      // bound set by the system's conditioning, not the data pass
      val m = Regression.olsFit(li(s, dir), "l_extendedprice",
        Seq("l_quantity", "l_discount"))
      import s.implicits._
      m.features.indices.map(i =>
          (m.features(i), math.rint(m.beta(i + 1) * 100) / 100))
        .toDF("feature", "coef_r")
        .union(Seq(("intercept", math.rint(m.beta(0) * 100) / 100))
          .toDF("feature", "coef_r"))
        .orderBy("feature")
    }),
    "q_logistic_quality" -> ((s, dir) => {
      // IRLS logistic regression (3 fixed Newton steps from β=0 + one
      // log-likelihood pass), trained ON the cluster — the quality-
      // classifier shape. The oracle replays all three Newton steps as
      // chained CTEs (2×2 solves in closed form) and the final ll with
      // the same overflow-stable softplus, so the hash pins the entire
      // iterate trajectory, not just the fixed point
      val d = li(s, dir).withColumn("y",
        (F.col("l_returnflag") === "R").cast("double"))
      val m = Regression.logisticIrls(d, "y", Seq("l_discount"), iters = 3)
      import s.implicits._
      Seq((math.rint(m.beta(0) * 1e6) / 1e6,
          math.rint(m.beta(1) * 1e6) / 1e6,
          math.rint(m.logLik * 100) / 100, m.n))
        .toDF("b0_r", "b1_r", "ll_r", "n")
    }),
    "q_bpe_pairs" -> ((s, dir) =>
      // BPE round-1 statistics: adjacent char-pair counts weighted by
      // word frequency — the only corpus-sized pass is the word count;
      // pair generation runs over the (much smaller) distinct-word
      // table. The [a-z]+ token filter pins the symbol alphabet so
      // substr replays identically in DuckDB
      TextOps.bpePairCounts(docs(s, dir), "doc_id", "text", 50,
        tokenRegex = "^[a-z]+$")),
    "q_bpe_merges" -> ((s, dir) =>
      // greedy BPE merge learning (8 rounds over the vocab table);
      // deterministic tie-break, rows-only in the harness — the
      // iterative rewrite isn't SQL, but OpsSpec pins the classic
      // hand-computable example
      TextOps.bpeMerges(docs(s, dir), "doc_id", "text", numMerges = 8)
        .orderBy("merge_rank")),
    "q_bpe_merges_fixed" -> ((s, dir) =>
      // deterministic hash twin for the merge TABLE: 3 merge rounds over
      // the [a-z]+-pinned vocab — DuckDB replays each round as chained
      // CTEs (pair counts → argmax with the count-desc/left-asc tie
      // break → list_reduce left-to-right non-overlapping rewrite)
      TextOps.bpeMerges(docs(s, dir), "doc_id", "text", numMerges = 3,
          tokenRegex = "^[a-z]+$")
        .orderBy("merge_rank")),
    "q_bigram_logprob" -> ((s, dir) =>
      // interpolated bigram-LM quality score (the rung above
      // q_unigram_logprob): map-side bigram construction, three
      // vocabulary-sized count tables, slice tf broadcast to each —
      // DuckDB replays the full interpolation
      TextOps.bigramLogProb(docs(s, dir),
          docs(s, dir).where(F.col("doc_id") < 100), "doc_id", "text")
        .orderBy("id")),
    "q_trigram_logprob" -> ((s, dir) =>
      // trigram stupid backoff (the ladder's top rung): corpus n-gram
      // tables semi-joined down to the slice's keys, then broadcast —
      // nothing corpus-sized shuffles; DuckDB replays all three
      // backoff branches
      TextOps.trigramLogProb(docs(s, dir),
          docs(s, dir).where(F.col("doc_id") < 100), "doc_id", "text")
        .orderBy("id")),
    "q_truncation_recall" -> ((s, dir) =>
      // Matryoshka QA: recall@10 of 16-dim truncated cosine retrieval
      // vs full 64-dim, per probe — both sides rounded-cosine
      // TakeOrdered scans, overlap a broadcast join over k rows
      Similarity.truncationRecall(emb(s, dir), "vec_id", "embedding",
        queryIds = Seq(0L, 1L, 2L), dims = 16, k = 10)),
    "q_pair_cosine" -> ((s, dir) =>
      // anisotropy audit: cosine across unrelated consecutive-id
      // pairs — a healthy isotropic space centers near 0; drift
      // toward +1 silently breaks every tuned cosine threshold
      Similarity.pairCosineStats(emb(s, dir), "vec_id", "embedding")),
    "q_jl_project" -> ((s, dir) =>
      // deterministic JL ±1/√k projection 64 → 16 (md5-parity matrix,
      // left-to-right folds): the shuffle-shrinker for ANN candidate
      // generation, long-form over the first 200 vectors
      Similarity.jlProject(emb(s, dir).where(F.col("vec_id") < 200),
          "vec_id", "embedding", inDim = 64, outDim = 16)
        .select(F.col("vec_id"), F.posexplode(F.col("proj")))
        .select(F.col("vec_id"), F.col("pos").cast("long").as("j"),
          F.col("col").as("y"))
        .orderBy("vec_id", "j")),
    "q_jl_distortion" -> ((s, dir) =>
      // the JL acceptance audit: original vs projected distance on
      // consecutive-id pairs — ratios near 1 = safe to route ANN
      // through the 16-dim space
      Similarity.jlDistortion(emb(s, dir).where(F.col("vec_id") < 200),
          "vec_id", "embedding", inDim = 64, outDim = 16)
        .orderBy("id_a")),
    "q_mmr" -> ((s, dir) => {
      // diversified retrieval: MMR re-rank of the cosine top-20 pool
      // down to 5 (λ = ½ so both engines share every constant);
      // 6-rounded relevances/similarities make each greedy argmax
      // replayable
      val q = emb(s, dir).where(F.col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      Similarity.mmrRerank(emb(s, dir).where(F.col("vec_id") =!= 0),
        "vec_id", "embedding", q, poolK = 20, selectK = 5,
        lambda = 0.5)
    }),
    "q_containment" -> ((s, dir) =>
      // asymmetric n-gram containment — the doc-contains-doc dedup case
      // Jaccard misses; inverted-index join with the stop-gram cap,
      // per-direction containment against full pre-cap gram sizes
      Dedup.containmentPairs(docs(s, dir), "doc_id", "text", n = 3,
          threshold = 0.5, maxShingleFreq = 200)
        .select(F.col("id_a"), F.col("id_b"), F.col("shared"),
          F.col("size_a"), F.col("size_b"),
          F.round(F.col("c_a"), 6).as("c_a_r"),
          F.round(F.col("c_b"), 6).as("c_b_r"))
        .orderBy("id_a", "id_b")),
    "q_rank_transform" -> ((s, dir) =>
      // rank-based inverse transform: plotting-position u through the
      // dist_ppf scalar (exponentialize the events.value marginal) —
      // prefix-sum ranks, no global window; ties transform identically
      Ranks.rankInverseTransform(
          events(s, dir).where(F.col("value").isNotNull &&
            !F.isnan(F.col("value"))),
          "value", "expon", Seq(0.0, 1.0))
        .select(F.col("event_id"), F.round(F.col("u"), 6).as("u_r"),
          F.round(F.col("transformed"), 6).as("x_r"))
        .orderBy("event_id")),
    "q_skew_report" -> ((s, dir) =>
      // the pre-join skew diagnostic: key cardinality, hottest-key
      // mass, exact count quantiles, max/mean ratio and the integer
      // salt suggestion — two aggregations, key-sized state
      SkewJoin.skewReport(events(s, dir), Seq("user_id"),
        partitions = 32)),
    "q_key_skew" -> ((s, dir) =>
      // top-k heaviest keys with table share — the broadcast/salt/plain
      // decision table; deterministic tie-break on (count desc, key)
      SkewJoin.keySkewProfile(events(s, dir), Seq("user_id"), k = 20)),
    "q_pagerank" -> ((s, dir) => {
      // fixed-iteration PageRank over the supplier↔part co-occurrence
      // graph (both directions → real cycles, so iterates evolve):
      // r₀ = 1, three rounds of (1−d) + d·Σ r/outdeg — DuckDB replays
      // every round as a chained CTE, so the hash pins the whole
      // trajectory, not a fixed point
      val base = keyCappedLineitem(s, dir, 50000,
          Seq("l_suppkey", "l_partkey"))
        .select(F.concat(F.lit("s"), F.col("l_suppkey")).as("a"),
          F.concat(F.lit("p"), F.col("l_partkey")).as("b"))
        .distinct()
      val e = base.select(F.col("a").as("src"), F.col("b").as("dst"))
        .union(base.select(F.col("b").as("src"), F.col("a").as("dst")))
      Graph.pageRank(e, "src", "dst", iters = 3)
        .select(F.col("node"), F.round(F.col("rank"), 6).as("rank_r"))
        .orderBy("node")
    }),
    "q_ppr" -> ((s, dir) => {
      // personalized PageRank seeded at suppliers 0..4: the teleport
      // mass pins to the seed set, so rank = proximity to those
      // suppliers; 3 rounds, every round replayed as a chained CTE
      val base = keyCappedLineitem(s, dir, 50000,
          Seq("l_suppkey", "l_partkey"))
        .select(F.concat(F.lit("s"), F.col("l_suppkey")).as("a"),
          F.concat(F.lit("p"), F.col("l_partkey")).as("b"))
        .distinct()
      val e = base.select(F.col("a").as("src"), F.col("b").as("dst"))
        .union(base.select(F.col("b").as("src"), F.col("a").as("dst")))
      val seeds = keyCappedLineitem(s, dir, 50000, Seq("l_suppkey"))
        .where(F.col("l_suppkey") < 5)
        .select(F.concat(F.lit("s"), F.col("l_suppkey")).as("node"))
      Graph.personalizedPageRank(e, "src", "dst", seeds, "node",
          iters = 3)
        .select(F.col("node"), F.round(F.col("rank"), 6).as("rank_r"))
        .orderBy("node")
    }),
    "q_kcore" -> ((s, dir) => {
      // 3-core peel of the co-occurrence graph: four remove-the-fringe
      // rounds (early-stopped when stable — identical to the replay's
      // unconditional rounds since peeling only removes)
      val base = keyCappedLineitem(s, dir, 50000,
          Seq("l_suppkey", "l_partkey"))
        .select(F.concat(F.lit("s"), F.col("l_suppkey")).as("a"),
          F.concat(F.lit("p"), F.col("l_partkey")).as("b"))
      Graph.kCorePeel(base, "a", "b", k = 3, rounds = 4)
        .orderBy("node")
    }),
    "q_bfs" -> ((s, dir) => {
      // multi-source BFS hop distances over the same co-occurrence
      // graph, seeded at suppliers 0..4: frontier-only joins, exact
      // integer distances, nodes beyond 3 hops absent — the replay
      // runs 3 Bellman-Ford min-relax rounds (identical result ≤ k)
      val base = keyCappedLineitem(s, dir, 50000,
          Seq("l_suppkey", "l_partkey"))
        .select(F.concat(F.lit("s"), F.col("l_suppkey")).as("a"),
          F.concat(F.lit("p"), F.col("l_partkey")).as("b"))
        .distinct()
      val e = base.select(F.col("a").as("src"), F.col("b").as("dst"))
        .union(base.select(F.col("b").as("src"), F.col("a").as("dst")))
      val seeds = keyCappedLineitem(s, dir, 50000, Seq("l_suppkey"))
        .where(F.col("l_suppkey") < 5)
        .select(F.concat(F.lit("s"), F.col("l_suppkey")).as("node"))
      Graph.bfsHops(e, "src", "dst", seeds, "node", maxHops = 3)
        .orderBy("node")
    }),
    "q_degree_dist" -> ((s, dir) => {
      // degree distribution of the same co-occurrence graph: per-
      // direction node-degree histogram — the power-law audit that
      // tells you whether pagerank scores carry signal
      val base = keyCappedLineitem(s, dir, 50000,
          Seq("l_suppkey", "l_partkey"))
        .select(F.concat(F.lit("s"), F.col("l_suppkey")).as("a"),
          F.concat(F.lit("p"), F.col("l_partkey")).as("b"))
        .distinct()
      val e = base.select(F.col("a").as("src"), F.col("b").as("dst"))
        .union(base.select(F.col("b").as("src"), F.col("a").as("dst")))
      Graph.degreeHistogram(e, "src", "dst")
        .orderBy("kind", "degree")
    }),
    "q_vuong" -> ((s, dir) =>
      // is lognormal SIGNIFICANTLY better than normal for prices, or
      // just ahead on AIC: Vuong's z on the per-row log-likelihood
      // differences of the two closed-form MLEs
      StatTests.vuongTest(li(s, dir), "l_extendedprice", "norm",
        "lognorm")),
    "q_benford" -> ((s, dir) =>
      // Benford first-digit conformity of line prices per return flag:
      // boundary-safe digit extraction, missing digits folded in
      // algebraically — one (group, digit) aggregation
      StatTests.benfordByGroup(
        li(s, dir).where(F.col("l_orderkey") < 100000),
        Seq("l_returnflag"), "l_extendedprice")
        .orderBy("l_returnflag")),
    "q_hill" -> ((s, dir) =>
      // Hill tail index of document lengths over the top-200 order
      // statistics: TakeOrdered top-(k+1), one ln fold
      StatTests.hillTailIndex(docs(s, dir), "n_chars", k = 200)),
    "q_es_sample" -> ((s, dir) =>
      // exact-k weighted sampling without replacement (Efraimidis-
      // Spirakis keys from md5 draws): deterministic, engine-replayable,
      // and a distributed top-k — never a global sort
      Sampling.esWeightedSample(docs(s, dir), "n_chars", "doc_id", k = 100)
        .select(F.col("doc_id"), F.col("n_chars"),
          F.round(F.col("es_key"), 9).as("es_key_r"))
        .orderBy("es_key_r")),
    "q_embedding_cov" -> ((s, dir) =>
      // the PCA input: population covariance of the embedding table in
      // long form, from ONE moment aggregation (state = d(d+3)/2+1
      // doubles, rows never leave executors) — DuckDB replays with
      // covar_pop over an index cross-join
      Pca.covLongForm(emb(s, dir), "embedding")
        .select(F.col("i").cast("long").as("i"),
          F.col("j").cast("long").as("j"),
          F.round(F.col("cov"), 6).as("cov_r"))
        .orderBy("i", "j")),
    "q_hits" -> ((s, dir) => {
      // HITS hubs/authorities on the bipartite supplier→part graph
      // (2 fixed iterations): suppliers are hubs, parts authorities;
      // DuckDB replays both normalized iterations as chained CTEs
      val base = keyCappedLineitem(s, dir, 50000,
          Seq("l_suppkey", "l_partkey"))
        .select(F.concat(F.lit("s"), F.col("l_suppkey")).as("src"),
          F.concat(F.lit("p"), F.col("l_partkey")).as("dst"))
        .distinct()
      Graph.hits(base, "src", "dst", iters = 2)
        .select(F.col("node"), F.round(F.col("hub"), 6).as("hub_r"),
          F.round(F.col("authority"), 6).as("auth_r"))
        .orderBy("node")
    }),
    "q_fuzzy_join" -> ((s, dir) => {
      // blocked fuzzy join (record linkage): distinct part names
      // blocked on their noun, verified with exact Levenshtein ≤ 3 —
      // candidates only within blocks, never the quadratic cross join;
      // DuckDB's levenshtein agrees exactly
      val names = s.read.parquet(s"$dir/part.parquet")
        .groupBy(F.col("p_name").as("key"))
        .agg(F.min("p_partkey").as("id"))
        .withColumn("block",
          F.element_at(F.split(F.col("key"), " "), -1))
        .select("id", "key", "block")
      Dedup.fuzzyJoinBlocked(names, names, maxDistance = 3)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "key_a", "key_b", "distance")
        .orderBy("id_a", "id_b")
    }),
    "q_jw_join" -> ((s, dir) => {
      // blocked Jaro-Winkler record linkage over distinct part names
      // (same noun blocking as q_fuzzy_join): transposition-tolerant
      // similarity >= 0.9, rounded to 6 before the threshold so the
      // kept-pair set replays; DuckDB's jaro_winkler_similarity agrees
      val names = s.read.parquet(s"$dir/part.parquet")
        .groupBy(F.col("p_name").as("key"))
        .agg(F.min("p_partkey").as("id"))
        .withColumn("block",
          F.element_at(F.split(F.col("key"), " "), -1))
        .select("id", "key", "block")
      Dedup.jaroWinklerJoinBlocked(names, names, minSim = 0.9)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "key_a", "key_b", "sim")
        .orderBy("id_a", "id_b")
    }),
    "q_grouped_ols2" -> ((s, dir) =>
      // two-feature OLS per group in ONE aggregation: centered moments
      // collapse the 3×3 normal equations to a 2×2 Cramer solve in
      // column arithmetic — every coefficient, R², and the residual σ
      // replay in DuckDB from the same var_pop/covar_pop moments
      Regression.olsByGroup2(li(s, dir), "l_extendedprice",
          "l_quantity", "l_discount", Seq("l_returnflag"))
        .select(F.col("l_returnflag"), F.col("n"),
          F.round(F.col("intercept"), 4).as("intercept_r"),
          F.round(F.col("b1"), 4).as("b1_r"),
          F.round(F.col("b2"), 4).as("b2_r"),
          F.round(F.col("r2"), 6).as("r2_r"),
          F.round(F.sqrt(F.col("resid_var")), 4).as("resid_std_r"))
        .orderBy("l_returnflag")),
    "q_outliers_by_group" -> ((s, dir) =>
      // per-group robust outliers ("anomalous FOR ITS event type"):
      // group median/MAD via exact interpolated percentile
      // (≡ quantile_cont), map-side robust z, flagged rows only
      Outliers.flagByGroup(events(s, dir), "value", Seq("event_type"),
          threshold = 2.5)
        .where(F.col("is_outlier"))
        .select(F.col("event_id"), F.col("event_type"), F.col("robust_z"))
        .orderBy("event_id")),
    "q_sparse_cosine" -> ((s, dir) =>
      // sparse TF-IDF cosine near-dup pairs — the model-free lexical
      // complement to the embedding ANN path; inverted-index join with
      // the df-cap skew guard, norms over ALL terms (capped boilerplate
      // can only under-estimate a cosine, never inflate it)
      TextOps.tfidfCosinePairs(docs(s, dir), "doc_id", "text",
          threshold = 0.25, maxDf = 100)
        .select(F.col("id_a"), F.col("id_b"),
          F.round(F.col("cosine"), 6).as("cosine_r"))
        .orderBy("id_a", "id_b")),
    "q_stream_topk" -> ((s, dir) => {
      // streaming per-window heavy hitters in SpaceSaving's exactness
      // regime (cap ≥ distinct users/day → zero eviction, zero error):
      // bounded sketch state replaces the unbounded per-key windowed
      // groupBy; the replay's top-5 must match the batch GROUP BY
      // bit-for-bit, and the err column must pin to 0
      val src = eventsStream(s, dir)
        .withColumn("event_ts", F.timestamp_micros(F.expr("ts div 1000")))
      val hh = graft.streaming.StreamingOps.windowedTopK(
        src, "user_id", "event_ts", cap = 8192, window = "24 hours",
        watermark = "1 hour")
      val replayed = graft.streaming.StreamingOps
        .runToBatch(s, hh, "graft_stream_topk", statePartitions = 8)
        .select(F.unix_timestamp(F.col("window.start")).as("win_start"),
          F.col("key"), F.col("cnt"), F.col("err"))
      val w = Window.partitionBy("win_start")
        .orderBy(F.col("cnt").desc, F.col("key").asc)
      replayed.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 5)
        .select(F.col("win_start"), F.col("rk"), F.col("key"),
          F.col("cnt"), F.col("err"))
        .orderBy("win_start", "rk")
    }),
    "q_stream_quantiles" -> ((s, dir) => {
      // streaming windowed quantiles via mergeable KLL state (ONE ~3 KB
      // sketch per window at any throughput — exact windowed quantiles
      // are unbounded-state and rightly unsupported); audited with the
      // kllRankCheck discipline: the exact rank of each probed value
      // must land within the KLL bound (+1/n discretization) of its
      // target, so a sketch/merge/probe regression flips the pinned
      // booleans
      val src = eventsStream(s, dir)
        .withColumn("event_ts", F.timestamp_micros(F.expr("ts div 1000")))
      val qs = graft.streaming.StreamingOps.windowedQuantiles(
        src, "value", "event_ts", probs = Seq(0.5, 0.9),
        k = 800, window = "24 hours", watermark = "1 hour")
      val replayed = graft.streaming.StreamingOps
        .runToBatch(s, qs, "graft_stream_quantiles", statePartitions = 8)
        .select(F.unix_timestamp(F.col("window.start")).as("win_start"),
          F.col("n"), F.col("q_50"), F.col("q_90"))
      events(s, dir)
        .where(F.col("value").isNotNull && !F.isnan(F.col("value")))
        .withColumn("event_ts", F.timestamp_micros(F.expr("ts div 1000")))
        .select(F.unix_timestamp(
            F.window(F.col("event_ts"), "24 hours")("start")).as("win_start"),
          F.col("value"))
        .join(F.broadcast(replayed), "win_start")
        .groupBy("win_start")
        .agg(F.first("n").as("n"),
          F.sum(F.when(F.col("value") <= F.col("q_50"), 1L).otherwise(0L))
            .as("__le50"),
          F.sum(F.when(F.col("value") <= F.col("q_90"), 1L).otherwise(0L))
            .as("__le90"))
        .select(F.col("win_start"), F.col("n"),
          (F.abs(F.col("__le50").cast("double") / F.col("n") - 0.5)
            <= F.lit(0.02) + F.lit(1.0) / F.col("n")).as("within_50"),
          (F.abs(F.col("__le90").cast("double") / F.col("n") - 0.9)
            <= F.lit(0.02) + F.lit(1.0) / F.col("n")).as("within_90"))
        .orderBy("win_start")
    }),
    "q_embedding_pca" -> ((s, dir) => {
      // the eigendecomposition itself isn't SQL, but its defining
      // invariants are: projecting the data onto component k must give
      // variance exactly λₖ (the matrix we diagonalized IS this data's
      // covariance), and distinct components must be uncorrelated. The
      // oracle pins those invariants as constants — a wrong eigensolve,
      // sign convention, or projection column reddens the hash
      val m = Pca.fit(emb(s, dir), "embedding")
      val e = emb(s, dir)
      val p = e.select(
        m.projection(F.col("embedding"), 0).as("p1"),
        m.projection(F.col("embedding"), 1).as("p2"))
      p.agg(
        F.round(F.var_pop(F.col("p1")) / m.eigenvalues(0), 6).as("var_ratio_1"),
        F.round(F.var_pop(F.col("p2")) / m.eigenvalues(1), 6).as("var_ratio_2"),
        F.round(F.abs(F.covar_pop(F.col("p1"), F.col("p2")) /
          math.sqrt(m.eigenvalues(0) * m.eigenvalues(1))), 6).as("corr_12"),
        F.round(F.abs(F.avg(F.col("p1"))), 6).as("mean_p1"))
    }),
    "q_poisson_glm" -> ((s, dir) => {
      // Poisson GLM of quantity on discount, 3 fixed Newton steps from
      // the ln ȳ warm start (pass 1 sees the constant rate μ = ȳ) —
      // DuckDB replays every step as a chained CTE, the
      // q_logistic_quality pattern with W = μ
      import s.implicits._
      val df = li(s, dir).select(F.col("l_quantity").as("y"),
        F.col("l_discount").as("x"))
      val m = Regression.poissonIrls(df, "y", Seq("x"), iters = 3)
      Seq((math.rint(m.beta(0) * 1e6) / 1e6,
        math.rint(m.beta(1) * 1e6) / 1e6,
        math.rint(m.logLik * 100.0) / 100.0, m.n))
        .toDF("b0_r", "b1_r", "ll_r", "n")
    }),
    "q_nbinom_glm" -> ((s, dir) => {
      // NB2 GLM of quantity on discount — the regression rung the
      // overdispersion router (q_dispersion_group) points at. 2 Poisson
      // warm-start steps, MoM α at that fit, 2 NB2 Fisher steps; DuckDB
      // replays the whole trajectory as a chained CTE
      import s.implicits._
      val df = li(s, dir).select(F.col("l_quantity").as("y"),
        F.col("l_discount").as("x"))
      val m = Regression.nbinomIrls(df, "y", Seq("x"),
        poissonIters = 2, iters = 2)
      Seq((math.rint(m.beta(0) * 1e6) / 1e6,
        math.rint(m.beta(1) * 1e6) / 1e6,
        math.rint(m.alpha * 1e6) / 1e6,
        math.rint(m.logLik * 100.0) / 100.0, m.n))
        .toDF("b0_r", "b1_r", "alpha_r", "ll_r", "n")
    }),
    "q_energy_distance" -> ((s, dir) =>
      // Székely–Rizzo energy distance A-vs-N per line status over the
      // INTEGER-valued quantity column: every prefix sum is an exactly
      // representable integer, so the whole statistic replays
      // bit-for-bit through the RANGE-frame construction
      StatTests.energyDistance(
        li(s, dir).select(F.col("l_returnflag"), F.col("l_linestatus"),
          F.col("l_quantity")),
        "l_returnflag", "l_quantity", labelA = "A", labelB = "N",
        groupCols = Seq("l_linestatus"))
        .orderBy("l_linestatus")),
    "q_mood_median" -> ((s, dir) =>
      // k = 5 order priorities → df = 4 (even), so the χ² survival
      // replays exactly via the Poisson-sum closed form; the pooled
      // median is the exact quantile_disc(0.5) order statistic
      StatTests.moodMedianTest(
        s.read.parquet(s"$dir/orders.parquet"),
        "o_orderpriority", "o_totalprice")),
    "q_fisher_exact" -> ((s, dir) =>
      // exact hypergeometric two-sided p on a deliberately SMALL table
      // (the regime where the χ² approximation is invalid); the scipy
      // 1+1e−7 inclusion gate keeps the tail sum ULP-robust across
      // engines' lgamma
      StatTests.fisherExact(
        li(s, dir).where(F.col("l_orderkey") < 300)
          .select((F.col("l_returnflag") === "R").as("fa"),
            (F.col("l_discount") > 0.05).as("fb")),
        "fa", "fb")),
    "q_cochran_q" -> ((s, dir) =>
      // do click/view/purchase have the same high-value rate across
      // matched users? k = 3 → df = 2 (even) for exact p replay;
      // any-success collapse per (user, type), complete blocks only
      StatTests.cochranQ(
        events(s, dir).select(F.col("user_id"), F.col("event_type"),
          (F.col("value") > 60).as("hi")),
        "user_id", "event_type", "hi",
        Seq("click", "view", "purchase"))),
    "q_wilcoxon" -> ((s, dir) =>
      // rank-based twin of q_paired_t on the same quantity-vs-scaled-
      // discount pairs: midranks over distinct |d| cells via the
      // prefix-sum walk; W+ is a half-integer sum so it replays exactly
      StatTests.wilcoxonSignedRank(
        li(s, dir).select(F.col("l_quantity").as("a"),
          (F.col("l_discount") * 100).as("b")),
        "a", "b")),
    "q_sign_test" -> ((s, dir) =>
      // the assumption-free floor under q_wilcoxon: signs only, one
      // aggregation of exact counts, continuity-corrected normal p
      StatTests.signTest(
        li(s, dir).select(F.col("l_quantity").as("a"),
          (F.col("l_discount") * 100).as("b")),
        "a", "b")),
    "q_bartlett" -> ((s, dir) =>
      // normal-theory variance homogeneity across return flags on the
      // integer-valued quantity (moment sums exact); k = 3 → df = 2 so
      // the chi2 survival replays as exp(-T/2)
      StatTests.bartlettTest(li(s, dir), "l_returnflag", "l_quantity")),
    "q_cliff_delta" -> ((s, dir) =>
      // ordinal effect size for the q_drift_mwu cohort split: exact
      // pair counts from the same prefix-sum substrate as U
      StatTests.cliffsDelta(
        li(s, dir).select(
          F.when(F.col("l_orderkey") % 2 === 0, "a").otherwise("b")
            .as("g"),
          F.col("l_quantity").as("v")),
        "g", "v")),
    "q_jonckheere" -> ((s, dir) =>
      // ordered-alternative trend: does order value fall monotonically
      // with priority rank? J folds from per-value level counts in one
      // prefix-sum pass; half-integer J replays exactly
      StatTests.jonckheereTerpstra(
        s.read.parquet(s"$dir/orders.parquet"), "o_orderpriority",
        "o_totalprice",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
          "5-LOW"))),
    "q_page_trend" -> ((s, dir) =>
      // does per-user mean value rise monotonically along the
      // click -> view -> purchase funnel: Page's L over complete
      // user blocks, midranks on decimal-exact cell means
      StatTests.pageTrend(events(s, dir), "user_id", "event_type",
        "value", Seq("click", "view", "purchase"))),
    "q_kendall_w" -> ((s, dir) =>
      // how consistently do users rank the three funnel stages by
      // value: Kendall's W with midrank tie correction; k=3 -> df=2
      // so the chi2 survival replays as exp(-X/2)
      StatTests.kendallW(events(s, dir), "user_id", "event_type",
        "value", Seq("click", "view", "purchase"))),
    "q_distance_corr" -> ((s, dir) =>
      // exact Szekely-Rizzo distance correlation of quantity vs
      // discount on the <=550-cell joint frame: n^2 pairs collapse to
      // weighted cell pairs — the any-dependence test next to q_xicor
      StatTests.distanceCorrCells(li(s, dir), "l_quantity",
        "l_discount")),
    "q_neyman" -> ((s, dir) =>
      // how to spend a 10k-row sample budget across return flags:
      // Neyman vs proportional allocation + the variance each implies
      Sampling.neymanAllocation(li(s, dir), "l_returnflag",
        "l_extendedprice", budget = 10000L)
        .orderBy("stratum")),
    "q_capture_recapture" -> ((s, dir) =>
      // estimate the distinct-customer count from two independent 30%
      // md5 captures: Lincoln-Petersen + bias-corrected Chapman with
      // its SE — the coverage audit that never scans twice
      Validation.captureRecapture(
        s.read.parquet(s"$dir/orders.parquet"), "o_custkey",
        pct = 30)),
    "q_entropy_rate" -> ((s, dir) =>
      // how predictable is the next corpus token: bigram conditional
      // entropy H(w2|w1) and the per-token perplexity floor a bigram
      // model must beat
      TextOps.entropyRate(docs(s, dir), "doc_id", "text")),
    "q_diversity" -> ((s, dir) =>
      // the Hill diversity ladder of the corpus vocabulary: richness,
      // effective vocab exp(H), inverse Simpson, evenness
      TextOps.hillNumbers(docs(s, dir), "text")),
    "q_jsd_matrix" -> ((s, dir) =>
      // which languages' unigram distributions sit closest: pairwise
      // Jensen-Shannon distances via ONE word-keyed join (absent-word
      // mass enters through the matched-mass complement)
      TextOps.jsdMatrix(docs(s, dir), "lang", "text")
        .orderBy("slice_a", "slice_b")),
    "q_bm25" -> ((s, dir) =>
      // Okapi BM25 top-20 for a fixed query over the corpus: one token
      // explode feeds lengths and query-term tfs; the ranking is a
      // TakeOrdered on the 6-rounded score with doc_id tie-break
      TextOps.bm25TopK(docs(s, dir), "doc_id", "text",
        Seq("join", "hash", "vector"), topK = 20)),
    "q_moore_lewis" -> ((s, dir) =>
      // Moore–Lewis in-domain selection: the 25 non-English docs that
      // read most like the English slice under two add-one unigram
      // LMs — the classic cross-entropy-difference curation ranking
      TextOps.mooreLewisSelect(
        docs(s, dir).where(F.col("lang") === "en"),
        docs(s, dir).where(F.col("lang") =!= "en"),
        "doc_id", "text", topK = 25)),
    "q_longest_streak" -> ((s, dir) =>
      // how long did each event type's surge LAST: longest run of
      // above-mean days via the exact gaps-and-islands construction
      Features.longestStreakByKey(events(s, dir), "event_type", "ts",
          "value", periodUnit = 86400000000000L)
        .orderBy("event_type")),
    "q_chao1" -> ((s, dir) =>
      // how much vocabulary has this corpus NOT seen: Chao1 richness
      // from hapax/dis counts + Good's coverage, exact integers
      TextOps.chao1(docs(s, dir), "text")),
    "q_xicor" -> ((s, dir) =>
      // Chatterjee's xi per return flag: functional-dependence
      // coefficient of price on quantity — x-ties broken by the unique
      // (orderkey, linenumber) so the statistic is reproducible
      Ranks.xicorByGroup(li(s, dir), Seq("l_returnflag"), "l_quantity",
        "l_extendedprice", Seq("l_orderkey", "l_linenumber"))
        .orderBy("l_returnflag")),
    "q_circular" -> ((s, dir) =>
      // time-of-day direction per event type: resultant-vector mean
      // angle + Rayleigh uniformity test; trig sums rounded first so
      // every derived stat computes from the rounded values
      Features.circularStatsByKey(events(s, dir), "event_type", "ts",
        periodNanos = 86400000000000L)
        .orderBy("event_type")),
    "q_quantile_reg" -> ((s, dir) =>
      // p90 price vs quantity: exact per-bin order-statistic quantiles
      // (10 equal-width quantity bins) + the count-weighted trend line
      // through the bin centers — the conditional-quantile rung next
      // to Theil-Sen's robust mean trend
      Regression.quantileTrend(li(s, dir), "l_quantity",
        "l_extendedprice", tau = 0.9, nBins = 10)
        .orderBy("bin")),
    "q_ridge" -> ((s, dir) =>
      // shrinkage path for price ~ (quantity, scaled discount): one
      // decimal-exact moment pass prices every lambda; the coefficient
      // drift under penalty is the collinearity diagnostic in action
      Regression.ridge2(
        li(s, dir).select(F.col("l_extendedprice").as("y"),
          F.col("l_quantity").as("x1"),
          (F.col("l_discount") * 100).as("x2")),
        "y", "x1", "x2", lambdas = Seq(0.0, 1.0e6, 1.0e8))
        .orderBy("lambda")),
    "q_cindex" -> ((s, dir) =>
      // does discount discriminate the return hazard (the q_cox_ph
      // acceptance metric): Harrell's C on the exact 550-cell
      // (duration, score) frame — n^2 pairs collapse to cell pairs
      Survival.concordanceIndex(
        li(s, dir).select(F.col("l_quantity").as("t"),
          (F.col("l_returnflag") =!= "N").as("ev"),
          F.col("l_discount").as("sc")),
        "t", "ev", "sc")),
    "q_probit" -> ((s, dir) => {
      // probit twin of the logistic rung: P(returned) vs quantity in
      // latent-SD units; Cody-erfc mean, 3 Fisher steps from beta=0,
      // every step CTE-replayed (mu clamped so tails can't blow up w)
      import s.implicits._
      val df = li(s, dir).select(
        (F.col("l_returnflag") === "R").cast("double").as("y"),
        F.col("l_quantity").as("x"))
      val m = Regression.probitIrls(df, "y", Seq("x"), iters = 3)
      Seq((math.rint(m.beta(0) * 1e6) / 1e6,
        math.rint(m.beta(1) * 1e6) / 1e6,
        math.rint(m.logLik * 100.0) / 100.0,
        math.rint(m.brier * 1e6) / 1e6, m.n))
        .toDF("b0_r", "b1_r", "ll_r", "brier_r", "n")
    }),
    "q_lasso" -> ((s, dir) =>
      // L1 path next to q_ridge: coordinate descent on three rounded
      // correlations — selection, not just shrinkage; the trajectory
      // is a pure function of rounded scalars so it replays exactly
      Regression.lasso2(
        li(s, dir).select(F.col("l_extendedprice").as("y"),
          F.col("l_quantity").as("x1"),
          (F.col("l_discount") * 100).as("x2")),
        "y", "x1", "x2", lambdas = Seq(0.0, 0.05, 0.3))
        .orderBy("lambda")),
    "q_lasso_k" -> ((s, dir) =>
      // the k-feature elastic net past lasso2's two-feature limit:
      // cyclic coordinate descent on the rounded 3×3 correlation
      // matrix, α = 0.5 — selection among quantity/discount/
      // linenumber; each sweep replays one coordinate per step as a
      // recursive CTE
      Regression.elasticNetPath(
        li(s, dir).select(F.col("l_extendedprice").as("y"),
          F.col("l_quantity").as("x1"),
          (F.col("l_discount") * 100).as("x2"),
          F.col("l_linenumber").cast("double").as("x3")),
        "y", Seq("x1", "x2", "x3"), lambdas = Seq(0.0, 0.05, 0.3),
        alpha = 0.5)
        .orderBy("lambda", "feature")),
    "q_weighted_kappa" -> ((s, dir) =>
      // ordinal agreement between two correlated quantity buckets:
      // quadratic weights credit near misses; exact k x k cell counts
      Evaluation.weightedKappa(
        li(s, dir).select(
          F.floor(F.col("l_quantity") / 10).cast("string").as("a"),
          F.floor((F.col("l_quantity") + F.col("l_linenumber")) / 10)
            .cast("string").as("b")),
        "a", "b", Seq("0", "1", "2", "3", "4", "5"))),
    "q_vif" -> ((s, dir) =>
      // multicollinearity gate over the three lineitem drivers: exact
      // closed-form 3x3 inverse diagonal on 6-rounded correlations
      Regression.vif3(li(s, dir),
        Seq("l_quantity", "l_discount", "l_tax"))
        .orderBy("feature")),
    "q_cooks" -> ((s, dir) =>
      // which 20 rows own the price~quantity fit: leverage + Cook's D
      // from rounded broadcast scalars, TakeOrdered with id tie-breaks
      Regression.olsInfluence(li(s, dir), "l_extendedprice",
        "l_quantity",
        Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        topK = 20)),
    "q_breusch_pagan" -> ((s, dir) =>
      // does the price noise level trend with quantity (the
      // homoskedasticity assumption slope_se makes): Koenker LM with
      // df=1 so p replays as erfc(sqrt(LM/2))
      Regression.breuschPagan(li(s, dir), "l_extendedprice",
        "l_quantity")),
    "q_chow" -> ((s, dir) =>
      // one line or two: structural-break F between the even/odd order
      // cohorts; p rides the operator's F CDF (q_anova convention)
      Regression.chowTest(
        li(s, dir).select(
          F.when(F.col("l_orderkey") % 2 === 0, "a").otherwise("b")
            .as("g"),
          F.col("l_quantity").as("x"), F.col("l_extendedprice").as("y")),
        "y", "x", "g")
        .select(F.col("n_a"), F.col("n_b"), F.col("f_stat"),
          F.col("df1"), F.col("df2"), F.col("slope_a"),
          F.col("slope_b"))),
    "q_segmented" -> ((s, dir) =>
      // two-piece price~quantity with the breakpoint chosen by exact
      // SSE grid search over the 50 quantity cells; argmin decided on
      // rounded SSE with the candidate as tie-break, so it replays
      Regression.segmentedOls(li(s, dir), "l_extendedprice",
        "l_quantity")),
    "q_theil_sen" -> ((s, dir) =>
      // robust price-per-quantity trend per return flag on a bounded
      // slice; all pairs fit under the cap, and the pairwise-slope
      // multiset is orientation-invariant, so DuckDB replays the exact
      // lower-median order statistic without the md5 capping order
      Regression.theilSenByGroup(
        li(s, dir).where(F.col("l_orderkey") < 500),
        "l_extendedprice", "l_quantity", Seq("l_returnflag"))
        .select(F.col("l_returnflag"), F.col("n_used"), F.col("n_pairs"),
          F.round(F.col("slope"), 6).as("slope_r"),
          F.round(F.col("intercept"), 6).as("intercept_r"))
        .orderBy("l_returnflag")),
    "q_durbin_watson" -> ((s, dir) =>
      // serial correlation of value-on-time residuals per event type in
      // event-id order (UNIQUE — synthetic lineitem duplicates
      // (orderkey, linenumber), which would make the lag order
      // engine-dependent); x = integer hours since epoch
      Regression.durbinWatsonByGroup(
        events(s, dir).select(F.col("event_type"),
          F.expr("ts DIV 3600000000000").as("hrs"),
          F.col("value"), F.col("event_id")),
        "value", "hrs", "event_id", Seq("event_type"))
        .select(F.col("event_type"), F.col("n"),
          F.round(F.col("slope"), 6).as("slope_r"),
          F.round(F.col("intercept"), 6).as("intercept_r"),
          F.round(F.col("dw"), 6).as("dw_r"))
        .orderBy("event_type")),
    "q_triangle_stats" -> ((s, dir) => {
      // per-node triangles + clustering coefficient over the parts-
      // that-share-an-order co-occurrence graph (each order's parts
      // form a clique → real triangles); Schank–Wagner orientation in
      // the engine, naive a<b<c triple join in the oracle
      val lp = li(s, dir).where(F.col("l_orderkey") < 12000)
        .select(F.col("l_orderkey").as("k"), F.col("l_partkey").as("p"))
        .distinct()
      val e = lp.as("x").join(lp.as("y"), "k")
        .where(F.col("x.p") =!= F.col("y.p"))
        .select(F.col("x.p").as("src"), F.col("y.p").as("dst"))
      Graph.triangleStats(e, "src", "dst")
        .orderBy("node")
    }),
    "q_sbg_retention" -> ((s, dir) =>
      // Fader–Hardie sBG churn fit over customers' 30-day order
      // periods (lifetimes 0..80, genuinely heterogeneous churn);
      // deterministic grid MLE — DuckDB replays the per-cell
      // log-likelihood and the argmax via lgamma over generate_series
      Cohorts.sbgRetention(
        s.read.parquet(s"$dir/orders.parquet")
          .select(F.col("o_custkey").as("u"),
            F.col("o_orderdate").cast("timestamp").cast("long").as("ts")),
        "u", "ts", periodNanos = 30L * 86400L)),
    "q_ipw_ate" -> ((s, dir) =>
      // IPW/Hájek ATE of return flag on price with discount as the
      // confounder: the 3-step logistic propensity replays as the
      // q_logistic_quality CTE chain, then one weighted-mean CTE
      Experiments.ipwAte(
        li(s, dir).select(
          F.when(F.col("l_returnflag") === "R", 1.0).otherwise(0.0)
            .as("t"),
          F.col("l_discount").as("x"), F.col("l_extendedprice").as("y")),
        "t", "y", Seq("x"), iters = 3, clip = 0.01)),
    "q_mantel_haenszel" -> ((s, dir) =>
      // discount→return odds pooled across line-status strata; all
      // sufficient statistics are exact integer ratios, the RBG CI
      // needs only ln/exp/sqrt
      Experiments.mantelHaenszel(
        li(s, dir).select(
          F.when(F.col("l_discount") > 0.05, "a").otherwise("b")
            .as("cohort"),
          (F.col("l_returnflag") === "R").as("ret"),
          F.col("l_linestatus")),
        "cohort", "ret", Seq("l_linestatus"))),
    "q_seasonal_decompose" -> ((s, dir) =>
      // additive trend/seasonal/remainder split of each user's value
      // series in event-id order (unique → deterministic), period 4
      // (even → the textbook 2×4 centered MA)
      Features.seasonalDecompose(
        events(s, dir).where(F.col("user_id") < 10)
          .select(F.col("user_id"), F.col("event_id"), F.col("value")),
        "user_id", "event_id", "value", period = 4)
        .orderBy("user_id", "event_id")),
    "q_seasonal_strength" -> ((s, dir) =>
      // Hyndman's F_s / F_t router over the period-4 decomposition:
      // one variance fold of the already-hash-checked rounded
      // component columns decides which users' series are genuinely
      // seasonal / trending — the decompose's acceptance metric
      Features.seasonalStrengthByKey(
        events(s, dir).where(F.col("user_id") < 10)
          .select(F.col("user_id"), F.col("event_id"), F.col("value")),
        "user_id", "event_id", "value", period = 4)
        .orderBy("user_id")),
    "q_boxcox" -> ((s, dir) =>
      // profile-likelihood Box–Cox λ per return flag over the strictly
      // positive price column; the λ grid explodes map-side and the
      // argmax replays per group over the same generate_series grid
      Features.boxCoxByGroup(
        li(s, dir).select(F.col("l_returnflag"),
          F.col("l_extendedprice")),
        "l_extendedprice", Seq("l_returnflag"))
        .orderBy("l_returnflag")),
    "q_good_turing" -> ((s, dir) =>
      // simple Good–Turing adjusted counts over the documents corpus —
      // pure integer frequency-of-frequency arithmetic until the final
      // exact-ratio division
      TextOps.goodTuring(docs(s, dir), "doc_id", "text")
        .orderBy("r")),
    "q_heaps_law" -> ((s, dir) =>
      // Heaps' vocabulary-growth fit over 10 nested md5-deterministic
      // corpus prefixes; cumulative token/vocab counts are exact
      // integers, the log-log OLS replays over the same 10 points
      TextOps.heapsLaw(docs(s, dir), "doc_id", "text", buckets = 10)
        .orderBy("bucket")),
    "q_avg_precision" -> ((s, dir) =>
      // PR-AUC (step interpolation, sklearn threshold semantics) of
      // discount as a "return" ranker per line status — every term is
      // a ratio of exact integer counts
      Evaluation.averagePrecisionByGroup(
        li(s, dir).select(F.col("l_linestatus"),
          (F.col("l_returnflag") === "R").as("ret"),
          F.col("l_discount")),
        Seq("l_linestatus"), "ret", "l_discount")
        .orderBy("l_linestatus")),
    "q_naive_bayes" -> ((s, dir) => {
      // multinomial NB trained on the documents corpus (lang labels),
      // self-scored → confusion matrix; the argmax ranks the
      // 6-dp-ROUNDED per-class log scores (ties → smaller class), so
      // DuckDB replays train AND classify exactly
      val d = docs(s, dir)
      val m = TextOps.nbTrain(d, "doc_id", "text", "lang")
      val pred = TextOps.nbScore(d, "doc_id", "text", m)
        .select(F.col("id"), F.col("predicted")).distinct()
      d.select(F.col("doc_id").as("id"), F.col("lang"))
        .join(pred, "id")
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).as("n_docs"))
        .orderBy("lang", "predicted")
    }),
    "q_friedman" -> ((s, dir) =>
      // repeated-measures rank test over matched (user, event-type)
      // mean values; k = 3 → df = 2 (even) for exact p replay
      StatTests.friedmanTest(events(s, dir), "user_id", "event_type",
        "value", Seq("click", "view", "purchase"))),
    "q_label_prop" -> ((s, dir) => {
      // 2 synchronous label-propagation rounds over the parts-that-
      // share-an-order graph; label trajectory is pure integer/string
      // arithmetic — DuckDB chains both rounds as CTEs
      val lp = li(s, dir).where(F.col("l_orderkey") < 3000)
        .select(F.col("l_orderkey").as("k"), F.col("l_partkey").as("p"))
        .distinct()
      val e = lp.as("x").join(lp.as("y"), "k")
        .where(F.col("x.p") =!= F.col("y.p"))
        .select(F.col("x.p").as("src"), F.col("y.p").as("dst"))
      Graph.labelPropagation(e, "src", "dst", iters = 2).orderBy("node")
    }),
    "q_modularity" -> ((s, dir) => {
      // Newman modularity of the 2-round label-propagation communities
      // over the same parts-share-an-order graph — the acceptance
      // metric for the partition; integer cell counts replay exactly,
      // Q_c is plain arithmetic on (e_c, a_c, m)
      val lp = li(s, dir).where(F.col("l_orderkey") < 3000)
        .select(F.col("l_orderkey").as("k"), F.col("l_partkey").as("p"))
        .distinct()
      val e = lp.as("x").join(lp.as("y"), "k")
        .where(F.col("x.p") =!= F.col("y.p"))
        .select(F.col("x.p").as("src"), F.col("y.p").as("dst"))
      val labels = Graph.labelPropagation(e, "src", "dst", iters = 2)
      Graph.modularityByLabel(e, "src", "dst", labels)
        .orderBy("label")
    }),
    "q_adamic_adar" -> ((s, dir) => {
      // link prediction over the parts co-occurrence graph: which
      // non-adjacent part pairs share the most (inverse-log-weighted)
      // neighbors — top-20 by Adamic-Adar with lexicographic tie-break
      val lp = li(s, dir).where(F.col("l_orderkey") < 3000)
        .select(F.col("l_orderkey").as("k"), F.col("l_partkey").as("p"))
        .distinct()
      val e = lp.as("x").join(lp.as("y"), "k")
        .where(F.col("x.p") =!= F.col("y.p"))
        .select(F.col("x.p").as("src"), F.col("y.p").as("dst"))
      Graph.linkPrediction(e, "src", "dst", topK = 20)
    }),
    "q_assortativity" -> ((s, dir) => {
      // do high-degree parts co-occur with high-degree parts: Newman
      // degree assortativity, exact integer sums up to one division
      val lp = li(s, dir).where(F.col("l_orderkey") < 12000)
        .select(F.col("l_orderkey").as("k"), F.col("l_partkey").as("p"))
        .distinct()
      val e = lp.as("x").join(lp.as("y"), "k")
        .where(F.col("x.p") =!= F.col("y.p"))
        .select(F.col("x.p").as("src"), F.col("y.p").as("dst"))
      Graph.assortativity(e, "src", "dst")
    }),
    "q_iv_wald" -> ((s, dir) =>
      // just-identified IV: even-orderkey "encouragement" -> scaled
      // discount take-up -> price; reported with the weak-instrument
      // first-stage F so the ratio's credibility is visible
      Experiments.ivWald(
        li(s, dir).select((F.col("l_orderkey") % 2 === 0).as("z"),
          (F.col("l_discount") * 100).as("d"),
          F.col("l_extendedprice").as("y")),
        "z", "d", "y")),
    "q_rdd" -> ((s, dir) =>
      // sharp RDD at quantity 25 (bandwidth 15): local-linear fits on
      // both sides, effect = the jump at the cutoff (not a mean diff)
      Experiments.rddEstimate(li(s, dir), "l_quantity",
        "l_extendedprice", cutoff = 25.0, bandwidth = 15.0)),
    "q_perm_test" -> ((s, dir) =>
      // assumption-free randomization test: 100 md5-coin reassignments
      // of click-vs-view over event values, one K-way exploded pass
      // with map-side combine; add-one p (Phipson-Smyth)
      Experiments.permutationTest(
        events(s, dir).where(F.col("event_type").isin("click", "view")),
        "event_id", "event_type", "value", labelA = "click",
        labelB = "view", k = 100)),
    "q_psm" -> ((s, dir) =>
      // grid-collapsed nearest-neighbor matching ATT of returned vs
      // kept lineitems on a deterministic score: broadcast cell lookup,
      // no row-by-row join — the matching shape that survives 100 TB
      Experiments.psmAtt(
        li(s, dir).select((F.col("l_returnflag") === "R").as("t"),
          ((F.col("l_quantity") + F.col("l_linenumber")) / 100)
            .as("s"),
          F.col("l_extendedprice").as("y")),
        "t", "s", "y")),
    "q_scd2" -> ((s, dir) =>
      // type-2 dimension build from the user event stream: validity
      // intervals for each user's event_type attribute, event_id as
      // the deterministic within-timestamp tie-break
      Cdc.scd2Build(events(s, dir), "user_id", "ts",
        Seq("event_type"), Seq("event_id"))
        .orderBy("user_id", "version")),
    "q_stream_scd2" -> ((s, dir) => {
      // streaming twin of q_scd2 on transformWithState: the open
      // version per user is the ONLY state; closed intervals emit as
      // they close, the open row re-emits per batch, and the
      // closed-wins dedup reconstructs the batch dimension exactly —
      // hash-checked against the SAME oracle as q_scd2
      import s.implicits._
      val saved = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val src = eventsStream(s, dir)
          .where(F.col("user_id").isNotNull && F.col("ts").isNotNull)
          .select(F.col("user_id").as("_1"), F.col("ts").as("_2"),
            F.col("event_id").as("_3"), F.col("event_type").as("_4"))
          .as[(Long, Long, Long, String)]
        val out = graft.streaming.StreamingOps.runToBatch(
          s, graft.streaming.StreamingOps.streamingScd2(src).toDF(),
          "graft_stream_scd2", outputMode = "update",
          statePartitions = 8)
        out.groupBy(F.col("key").as("user_id"), F.col("version"))
          .agg(F.max("attr").as("event_type"),
            F.min("validFrom").as("valid_from"),
            F.max("validTo").as("valid_to"))
          .withColumn("is_current", F.col("valid_to").isNull)
          .select("user_id", "event_type", "valid_from", "valid_to",
            "version", "is_current")
          .orderBy("user_id", "version")
      } finally {
        saved match {
          case Some(v) => s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
          case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
    }),
    "q_reconcile" -> ((s, dir) => {
      // bucketed checksum diff of lineitem vs a copy missing every
      // 997th order: counts + order-independent hash sums localize the
      // damage to buckets, O(64) output for any table size
      val a = li(s, dir)
      val b = li(s, dir).where(F.col("l_orderkey") % 997 =!= 0)
      Cdc.checksumReconcile(a, b, "l_orderkey",
        Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_returnflag", "l_linestatus"), buckets = 64)
        .orderBy("bucket")
    }),
    "q_coreset" -> ((s, dir) =>
      // greedy k-center coreset over the embedding table: the 5 most
      // mutually-distant vectors (Gonzalez 2-approximation) + the
      // coverage radius — deterministic left-to-right distance folds
      Clustering.kCenterCoreset(emb(s, dir), "vec_id", "embedding",
        k = 5))
  )

  /** The 7-family closed-form fits CTE shared by every grouped-fit
    * oracle (q_grouped_fit, q_stream_grouped_fit, q_grouped_fit_weighted
    * reads it over weighted stats): ONE copy of the MLE/loglik algebra,
    * interpolated with the stats-CTE key columns — a formula correction
    * can never update one oracle and silently leave a twin stale. The
    * stats CTE must be named `s` and expose n, m, s2, mn, mx, mln,
    * s2ln, sxx alongside the keys. */
  /** W. J. Cody's rational-Chebyshev erfc (the exact algorithm in
    * `SpecialMath.erfc`, all three branches) unrolled into a DuckDB SQL
    * expression over the non-negative argument `y` — same coefficient
    * literals, same Horner association, same exp(−ysq²)·exp(−del)
    * split, so both engines evaluate the identical IEEE expression and
    * only exp() ULPs differ (absorbed by the caller's rounding). Used
    * by the Mann–Whitney oracle to replay normal-approximation
    * p-values without a native SQL erfc. */
  /** Shared q_cox_ph Newton-iteration CTEs (base data, three
    * chained steps ending at b3 = the fitted beta) - reused by the
    * baseline-hazard replay. */
  private val coxPh1NewtonSql: String =
    """WITH base AS (SELECT CAST(l_quantity AS DOUBLE) AS t,
        |    (l_returnflag <> 'N') AS e,
        |    CAST(l_discount AS DOUBLE) AS x
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND CAST(l_quantity AS DOUBLE) >= 0.0
        |    AND l_returnflag IS NOT NULL
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))),
        |c1 AS (SELECT t, sum(CASE WHEN e THEN 1 ELSE 0 END) AS d,
        |    sum(CASE WHEN e THEN x ELSE 0.0 END) AS s,
        |    sum(exp(0.0 * x)) AS r0, sum(x * exp(0.0 * x)) AS r1,
        |    sum(x * x * exp(0.0 * x)) AS r2
        |  FROM base GROUP BY t),
        |w1 AS (SELECT t, d, s,
        |    sum(r0) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS m0,
        |    sum(r1) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS m1,
        |    sum(r2) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS m2
        |  FROM c1),
        |n1 AS (SELECT sum(s - d * m1 / m0) AS u,
        |    sum(d * (m2 / m0 - (m1 / m0) * (m1 / m0))) AS i,
        |    sum(0.0 * s - d * ln(m0)) AS ll0 FROM w1 WHERE d > 0),
        |b1 AS (SELECT u / i AS b FROM n1),
        |c2 AS (SELECT t, any_value(b.b) AS pb,
        |    sum(CASE WHEN e THEN 1 ELSE 0 END) AS d,
        |    sum(CASE WHEN e THEN x ELSE 0.0 END) AS s,
        |    sum(exp(b.b * x)) AS r0, sum(x * exp(b.b * x)) AS r1,
        |    sum(x * x * exp(b.b * x)) AS r2
        |  FROM base CROSS JOIN b1 b GROUP BY t),
        |w2 AS (SELECT t, d, s, pb,
        |    sum(r0) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS m0,
        |    sum(r1) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS m1,
        |    sum(r2) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS m2
        |  FROM c2),
        |n2 AS (SELECT any_value(pb) AS pb, sum(s - d * m1 / m0) AS u,
        |    sum(d * (m2 / m0 - (m1 / m0) * (m1 / m0))) AS i
        |  FROM w2 WHERE d > 0),
        |b2 AS (SELECT pb + u / i AS b FROM n2),
        |c3 AS (SELECT t, any_value(b.b) AS pb,
        |    sum(CASE WHEN e THEN 1 ELSE 0 END) AS d,
        |    sum(CASE WHEN e THEN x ELSE 0.0 END) AS s,
        |    sum(exp(b.b * x)) AS r0, sum(x * exp(b.b * x)) AS r1,
        |    sum(x * x * exp(b.b * x)) AS r2
        |  FROM base CROSS JOIN b2 b GROUP BY t),
        |w3 AS (SELECT t, d, s, pb,
        |    sum(r0) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS m0,
        |    sum(r1) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS m1,
        |    sum(r2) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS m2
        |  FROM c3),
        |n3 AS (SELECT any_value(pb) AS pb, sum(s - d * m1 / m0) AS u,
        |    sum(d * (m2 / m0 - (m1 / m0) * (m1 / m0))) AS i
        |  FROM w3 WHERE d > 0),
        |b3 AS (SELECT pb + u / i AS b FROM n3),""".stripMargin

  /** q_probit replay: the clamped probit mean μ = ½·erfc(−η/√2) with
    * the Cody erfc inlined (negative arguments via the 2−r
    * reflection, exactly like SpecialMath.erfc). */
  private def probitMuSql(eta: String): String = {
    val ae = s"(abs($eta) / sqrt(2.0))"
    val e = codyErfcSql(ae)
    s"least(greatest(0.5 * (CASE WHEN $eta <= 0.0 THEN $e " +
      s"ELSE 2.0 - $e END), 1e-10), (1.0 - 1e-10))"
  }

  private def probitOracleSql: String = {
    val eta = "(b.b0 + b.b1 * x)"
    val phi = s"exp($eta * $eta * -0.5) * 0.3989422804014327"
    def step(i: Int): String = {
      val prev = if (i == 1) "bs0" else s"bs${i - 1}"
      s"""p$i AS (SELECT y, x, ${probitMuSql(eta)} AS mu,
         |    $phi AS phi FROM base, $prev b),
         |s$i AS (SELECT
         |    sum((y - mu) * phi / (mu * (1.0 - mu))) AS g0,
         |    sum((y - mu) * phi / (mu * (1.0 - mu)) * x) AS g1,
         |    sum(phi * phi / (mu * (1.0 - mu))) AS h00,
         |    sum(phi * phi / (mu * (1.0 - mu)) * x) AS h01,
         |    sum(phi * phi / (mu * (1.0 - mu)) * x * x) AS h11
         |  FROM p$i),
         |bs$i AS (SELECT
         |    b.b0 + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01)
         |      AS b0,
         |    b.b1 + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01)
         |      AS b1
         |  FROM $prev b, s$i)""".stripMargin
    }
    s"""WITH base AS (SELECT
       |    CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y,
       |    CAST(l_quantity AS DOUBLE) AS x
       |  FROM lineitem WHERE l_returnflag IS NOT NULL
       |    AND l_quantity IS NOT NULL
       |    AND NOT isnan(CAST(l_quantity AS DOUBLE))),
       |cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
       |bs0 AS (SELECT CAST(0.0 AS DOUBLE) AS b0,
       |  CAST(0.0 AS DOUBLE) AS b1),
       |${step(1)},
       |${step(2)},
       |${step(3)},
       |pf AS (SELECT y, ${probitMuSql(eta)} AS mu FROM base, bs3 b),
       |fin AS (SELECT sum(y * ln(mu) + (1.0 - y) * ln(1.0 - mu))
       |    AS ll, sum((y - mu) * (y - mu)) AS sq FROM pf)
       |SELECT round_even(bs3.b0 * 1e6, 0) / 1e6 AS b0_r,
       |  round_even(bs3.b1 * 1e6, 0) / 1e6 AS b1_r,
       |  round_even(fin.ll * 100.0, 0) / 100.0 AS ll_r,
       |  round_even(fin.sq / cnt.n * 1e6, 0) / 1e6 AS brier_r,
       |  cnt.n
       |FROM bs3, fin, cnt""".stripMargin
  }

  /** q_coreset replay: the greedy k-center chain as five materialized
    * CTE steps. Squared distances fold left-to-right (list_reduce over
    * a prepended 0.0) exactly like the engine's aggregate/zip_with, so
    * every argmax comparison is bit-identical. */
  private def coresetOracleSql: String = {
    def dist(j: Int) =
      s"list_reduce(list_prepend(0.0, list_transform(range(64), " +
        s"d -> (p.e[d+1] - c$j.e$j[d+1]) * (p.e[d+1] - c$j.e$j[d+1])))" +
        s", (a, b) -> a + b)"
    def minDist(n: Int) =
      (1 to n).map(dist).reduce((x, y) => s"least($x, $y)")
    val steps = (2 to 5).map { i =>
      val froms = (1 until i).map(j => s"c$j").mkString(", ")
      s"""c$i AS MATERIALIZED (SELECT p.id AS id$i, p.e AS e$i,
         |    ${minDist(i - 1)} AS d$i
         |  FROM pts p, $froms
         |  ORDER BY d$i DESC, p.id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val sel = (2 to 5).map(i =>
      s"  UNION ALL SELECT CAST($i AS BIGINT), id$i, d$i FROM c$i")
      .mkString("\n")
    s"""WITH pts AS MATERIALIZED (SELECT vec_id AS id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings WHERE vec_id IS NOT NULL
       |    AND embedding IS NOT NULL),
       |c1 AS MATERIALIZED (SELECT id AS id1, e AS e1 FROM pts
       |  ORDER BY id LIMIT 1),
       |$steps,
       |cov AS (SELECT max(${minDist(5)}) AS r
       |  FROM pts p, c1, c2, c3, c4, c5),
       |sel AS (SELECT CAST(1 AS BIGINT) AS "rank", id1 AS vec_id,
       |    0.0 AS sd FROM c1
       |$sel)
       |SELECT "rank", vec_id,
       |  round_even(sqrt(sd) * 1e6, 0) / 1e6 AS sel_dist,
       |  round_even(sqrt(cov.r) * 1e6, 0) / 1e6 AS coverage_radius
       |FROM sel, cov ORDER BY "rank"""".stripMargin
  }

  /** SCD2 replay shared by q_scd2 (batch windows) and q_stream_scd2
    * (transformWithState) — ONE copy: the two engines must agree on
    * the same dimension, so a contract fix can never update one and
    * silently leave the twin stale. */
  private def scd2OracleSql: String =
    """WITH e AS (SELECT user_id AS k, epoch_ns(ts) AS t,
      |    event_type AS a, event_id AS id
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      |w AS (SELECT k, t, a, id,
      |    row_number() OVER win AS rn,
      |    lag(a) OVER win AS pa
      |  FROM e WINDOW win AS (PARTITION BY k ORDER BY t, id)),
      |c AS (SELECT k, t, a, id FROM w
      |  WHERE rn = 1 OR a IS DISTINCT FROM pa),
      |f AS (SELECT k, a AS event_type, t AS valid_from,
      |    lead(t) OVER win2 AS valid_to,
      |    CAST(row_number() OVER win2 AS BIGINT) AS version
      |  FROM c WINDOW win2 AS (PARTITION BY k ORDER BY t, id))
      |SELECT k AS user_id, event_type, valid_from, valid_to,
      |  version, valid_to IS NULL AS is_current
      |FROM f ORDER BY user_id, version""".stripMargin

  /** q_lasso_k replay: the q_lasso recursion generalized to k = 3 —
    * ONE coordinate per step, cycling j = i mod 3 (the engine's exact
    * Gauss–Seidel order), with the α = 0.5 soft threshold and the
    * elastic-net ridge shrink in the same expression shape. */
  /** q_vuong replay: rounded closed-form MLEs, per-row rounded ll
    * difference, decimal-exact moment fold, Cody erfc at the rounded
    * z — the identical pipeline the engine runs. */
  private def vuongOracleSql: String = {
    val lla = "-0.5 * (ln(2.0 * pi()) + ln(v2))" +
      " - (x - mu) * (x - mu) / (2.0 * v2)"
    val llb = "-ln(x) + -0.5 * (ln(2.0 * pi()) + ln(vl))" +
      " - (ln(x) - ml) * (ln(x) - ml) / (2.0 * vl)"
    val erfc = codyErfcSql("(abs(z) / sqrt(2.0))")
    s"""WITH b AS MATERIALIZED (SELECT
       |    CAST(l_extendedprice AS DOUBLE) AS x
       |  FROM lineitem WHERE l_extendedprice IS NOT NULL
       |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
       |    AND CAST(l_extendedprice AS DOUBLE) > 0.0),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS s,
       |    CAST(sum(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS ss,
       |    CAST(sum(CAST(ln(x) AS DECIMAL(38,6))) AS DOUBLE) AS sl,
       |    CAST(sum(CAST(ln(x) * ln(x) AS DECIMAL(38,6))) AS DOUBLE)
       |      AS sll
       |  FROM b),
       |pr AS MATERIALIZED (SELECT n,
       |    round_even(s / CAST(n AS DOUBLE) * 1e6, 0) / 1e6 AS mu,
       |    round_even((ss / CAST(n AS DOUBLE) - (s / CAST(n AS DOUBLE))
       |      * (s / CAST(n AS DOUBLE))) * 1e6, 0) / 1e6 AS v2,
       |    round_even(sl / CAST(n AS DOUBLE) * 1e6, 0) / 1e6 AS ml,
       |    round_even((sll / CAST(n AS DOUBLE)
       |      - (sl / CAST(n AS DOUBLE)) * (sl / CAST(n AS DOUBLE)))
       |      * 1e6, 0) / 1e6 AS vl
       |  FROM m),
       |d AS (SELECT round(($lla) - ($llb), 6) AS dd,
       |    round($lla, 6) AS la, round($llb, 6) AS lb
       |  FROM b, pr),
       |a AS (SELECT
       |    CAST(sum(CAST(dd AS DECIMAL(38,6))) AS DOUBLE) AS sd,
       |    CAST(sum(CAST(dd * dd AS DECIMAL(38,6))) AS DOUBLE) AS sdd,
       |    CAST(sum(CAST(la AS DECIMAL(38,6))) AS DOUBLE) AS sa,
       |    CAST(sum(CAST(lb AS DECIMAL(38,6))) AS DOUBLE) AS sb
       |  FROM d),
       |f AS (SELECT pr.n, sd / CAST(pr.n AS DOUBLE) AS md,
       |    sdd / CAST(pr.n AS DOUBLE) - (sd / CAST(pr.n AS DOUBLE))
       |      * (sd / CAST(pr.n AS DOUBLE)) AS vd,
       |    sa / CAST(pr.n AS DOUBLE) AS ma,
       |    sb / CAST(pr.n AS DOUBLE) AS mb FROM a, pr),
       |g AS (SELECT n, ma, mb,
       |    round_even(sqrt(CAST(n AS DOUBLE)) * md / sqrt(vd) * 1e6,
       |      0) / 1e6 AS z
       |  FROM f)
       |SELECT n, 'norm' AS dist_a, 'lognorm' AS dist_b,
       |  round_even(ma * 1e6, 0) / 1e6 AS mean_ll_a,
       |  round_even(mb * 1e6, 0) / 1e6 AS mean_ll_b,
       |  z,
       |  round_even($erfc * 1e6, 0) / 1e6 AS p_value,
       |  CASE WHEN round_even($erfc * 1e6, 0) / 1e6 >= 0.05
       |    THEN 'indistinguishable'
       |    WHEN z > 0.0 THEN 'norm' ELSE 'lognorm' END AS preferred
       |FROM g""".stripMargin
  }

  private def lassoKOracleSql: String = {
    def upd(j: Int): String = {
      val others = Seq(1, 2, 3).filter(_ != j)
      def rr(a: Int, b: Int) = s"c.r${math.min(a, b)}${math.max(a, b)}"
      val z = s"c.r${j}y" +
        others.map(o => s" - ${rr(j, o)} * b$o").mkString
      s"sign($z)\n      * greatest(abs($z) - lambda * 0.5, 0.0)\n" +
        s"      / (1.0 + lambda * (1.0 - 0.5))"
    }
    def ds(expr: String, as: String) =
      s"CAST(sum(CAST($expr AS DECIMAL(38,6))) AS DOUBLE) AS $as"
    val x = Map(1 -> "CAST(l_quantity AS DOUBLE)",
      2 -> "(CAST(l_discount AS DOUBLE) * 100)",
      3 -> "CAST(l_linenumber AS DOUBLE)")
    val yv = "CAST(l_extendedprice AS DOUBLE)"
    val sums = (1 to 3).map(i => ds(x(i), s"s$i")) ++
      (for { i <- 1 to 3; j <- i to 3 }
        yield ds(s"${x(i)} * ${x(j)}", s"s$i$j")) ++
      (1 to 3).map(i => ds(s"${x(i)} * $yv", s"s${i}y")) ++
      Seq(ds(yv, "sy"), ds(s"$yv * $yv", "syy"))
    def mean(i: Int) = s"s$i / CAST(n AS DOUBLE)"
    def sd(i: Int) =
      s"sqrt(s$i$i / CAST(n AS DOUBLE) - (${mean(i)}) * (${mean(i)}))"
    def corr(a: String, ma: String, sda: String,
             mb: String, sdb: String) =
      s"round_even(($a / CAST(n AS DOUBLE) - $ma * $mb)\n" +
        s"      / ($sda * $sdb) * 1e6, 0) / 1e6"
    val outs = (1 to 3).map { i =>
      s"""  SELECT lambda, 'x$i' AS feature,
         |    round_even(b$i * 1e6, 0) / 1e6 AS beta_std,
         |    round_even(b$i * c.sdy / c.sd$i * 1e6, 0) / 1e6 AS beta,
         |    round_even((c.my - b1 * c.sdy / c.sd1 * c.m1
         |      - b2 * c.sdy / c.sd2 * c.m2
         |      - b3 * c.sdy / c.sd3 * c.m3) * 1e6, 0) / 1e6
         |      AS intercept,
         |    CAST((CASE WHEN b1 <> 0.0 THEN 1 ELSE 0 END)
         |      + (CASE WHEN b2 <> 0.0 THEN 1 ELSE 0 END)
         |      + (CASE WHEN b3 <> 0.0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_nonzero
         |  FROM cd, co c WHERE i = 60""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH RECURSIVE g AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    ${sums.mkString(",\n    ")}
       |  FROM lineitem WHERE l_quantity IS NOT NULL
       |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
       |    AND l_discount IS NOT NULL
       |    AND NOT isnan(CAST(l_discount AS DOUBLE) * 100)
       |    AND l_linenumber IS NOT NULL
       |    AND NOT isnan(CAST(l_linenumber AS DOUBLE))
       |    AND l_extendedprice IS NOT NULL
       |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
       |mo AS (SELECT n, ${(1 to 3).map(i =>
              s"${mean(i)} AS m$i").mkString(", ")},
       |    sy / CAST(n AS DOUBLE) AS my,
       |    ${(1 to 3).map(i => s"${sd(i)} AS sd$i").mkString(",\n    ")},
       |    sqrt(syy / CAST(n AS DOUBLE) - (sy / CAST(n AS DOUBLE))
       |      * (sy / CAST(n AS DOUBLE))) AS sdy,
       |    s12, s13, s23, s1y, s2y, s3y FROM g),
       |co AS (SELECT n, m1, m2, m3, my, sd1, sd2, sd3, sdy,
       |    ${corr("s12", "m1", "sd1", "m2", "sd2")} AS r12,
       |    ${corr("s13", "m1", "sd1", "m3", "sd3")} AS r13,
       |    ${corr("s23", "m2", "sd2", "m3", "sd3")} AS r23,
       |    ${corr("s1y", "m1", "sd1", "my", "sdy")} AS r1y,
       |    ${corr("s2y", "m2", "sd2", "my", "sdy")} AS r2y,
       |    ${corr("s3y", "m3", "sd3", "my", "sdy")} AS r3y
       |  FROM mo),
       |lam AS (SELECT CAST(l AS DOUBLE) AS lambda
       |  FROM (VALUES (0.0), (0.05), (0.3)) AS t(l)),
       |cd AS (
       |  SELECT lambda, 0 AS i, CAST(0.0 AS DOUBLE) AS b1,
       |    CAST(0.0 AS DOUBLE) AS b2, CAST(0.0 AS DOUBLE) AS b3
       |  FROM lam
       |  UNION ALL
       |  SELECT lambda, i + 1,
       |    CASE WHEN i % 3 = 0 THEN ${upd(1)} ELSE b1 END,
       |    CASE WHEN i % 3 = 1 THEN ${upd(2)} ELSE b2 END,
       |    CASE WHEN i % 3 = 2 THEN ${upd(3)} ELSE b3 END
       |  FROM cd, co c WHERE i < 60)
       |$outs
       |ORDER BY lambda, feature""".stripMargin
  }

  /** Shared e/cells/idx prologue for the Holt–Winters replays: the
    * q_holt daily-mean cells with a per-key 1-based row index. */
  private def hwIdxSql: String =
    """e AS (SELECT event_type AS k, epoch_ns(ts) AS t,
      |    CAST(value AS DOUBLE) AS v FROM events
      |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
      |    AND value IS NOT NULL AND NOT isnan(value)),
      |cells AS (SELECT k, t // 86400000000000 AS p,
      |    CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) / count(*)
      |      AS mv
      |  FROM e GROUP BY k, p),
      |idx AS (SELECT k, p, mv, CAST(row_number() OVER (PARTITION BY k
      |    ORDER BY p) AS BIGINT) AS i FROM cells)""".stripMargin

  /** The Holt–Winters recursive CTE body: m = 7 seasonal slots as
    * scalar columns, one step per period, phase = (i − 1) mod 7. */
  private def hwRecursionSql: String = {
    val sOld = "CASE (idx.i - 1) % 7 " +
      (0 until 7).map(j => s"WHEN $j THEN hw.s$j").mkString(" ") +
      " END"
    val lNew = s"(0.3 * (idx.mv - $sOld)\n" +
      s"      + (1.0 - 0.3) * (hw.l + hw.b))"
    val bNew = s"(0.1 * ($lNew - hw.l) + (1.0 - 0.1) * hw.b)"
    def sNew(j: Int) =
      s"CASE WHEN (idx.i - 1) % 7 = $j\n" +
        s"      THEN 0.2 * (idx.mv - $lNew) + (1.0 - 0.2) * hw.s$j\n" +
        s"      ELSE hw.s$j END"
    val sCols = (0 until 7).map(j => s"s$j").mkString(", ")
    val seedS = (0 until 7).map(_ => "CAST(0.0 AS DOUBLE)")
      .mkString(",\n    ")
    s"""hw(k, i, p, mv, l, b, $sCols, fit) AS (
       |  SELECT k, i, p, mv, mv, CAST(0.0 AS DOUBLE),
       |    $seedS,
       |    CAST(NULL AS DOUBLE) FROM idx WHERE i = 1
       |  UNION ALL
       |  SELECT idx.k, idx.i, idx.p, idx.mv,
       |    $lNew,
       |    $bNew,
       |    ${(0 until 7).map(sNew).mkString(",\n    ")},
       |    hw.l + hw.b + $sOld
       |  FROM hw JOIN idx ON idx.k = hw.k AND idx.i = hw.i + 1)"""
      .stripMargin
  }

  /** The multiplicative HW recursion: unit seasonal seed, ratio
    * updates, positive-mean keys only. */
  private def hwMulRecursionSql: String = {
    val sOld = "CASE (idx.i - 1) % 7 " +
      (0 until 7).map(j => s"WHEN $j THEN hw.s$j").mkString(" ") +
      " END"
    val lNew = s"(0.3 * (idx.mv / $sOld)\n" +
      s"      + (1.0 - 0.3) * (hw.l + hw.b))"
    val bNew = s"(0.1 * ($lNew - hw.l) + (1.0 - 0.1) * hw.b)"
    def sNew(j: Int) =
      s"CASE WHEN (idx.i - 1) % 7 = $j\n" +
        s"      THEN 0.2 * (idx.mv / $lNew) + (1.0 - 0.2) * hw.s$j\n" +
        s"      ELSE hw.s$j END"
    val sCols = (0 until 7).map(j => s"s$j").mkString(", ")
    val seedS = (0 until 7).map(_ => "CAST(1.0 AS DOUBLE)")
      .mkString(",\n    ")
    s"""pos AS (SELECT k FROM cells GROUP BY k HAVING min(mv) > 0.0),
       |idx2 AS (SELECT idx.* FROM idx JOIN pos ON idx.k = pos.k),
       |hw(k, i, p, mv, l, b, $sCols, fit) AS (
       |  SELECT k, i, p, mv, mv, CAST(0.0 AS DOUBLE),
       |    $seedS,
       |    CAST(NULL AS DOUBLE) FROM idx2 WHERE i = 1
       |  UNION ALL
       |  SELECT idx.k, idx.i, idx.p, idx.mv,
       |    $lNew,
       |    $bNew,
       |    ${(0 until 7).map(sNew).mkString(",\n    ")},
       |    (hw.l + hw.b) * $sOld
       |  FROM hw JOIN idx2 idx ON idx.k = hw.k AND idx.i = hw.i + 1)"""
      .stripMargin
  }

  private def hwMulOracleSql: String = {
    val seaOut = "CASE (i - 1) % 7 " +
      (0 until 7).map(j => s"WHEN $j THEN s$j").mkString(" ") + " END"
    s"""WITH RECURSIVE $hwIdxSql,
       |$hwMulRecursionSql
       |SELECT k AS event_type, p AS period, round(mv, 6) AS v,
       |  round(l, 6) + 0.0 AS level, round(b, 6) + 0.0 AS trend,
       |  round($seaOut, 6) + 0.0 AS seasonal,
       |  round(fit, 6) + 0.0 AS fitted
       |FROM hw ORDER BY event_type, period""".stripMargin
  }

  private def hwOracleSql: String = {
    val seaOut = "CASE (i - 1) % 7 " +
      (0 until 7).map(j => s"WHEN $j THEN s$j").mkString(" ") + " END"
    s"""WITH RECURSIVE $hwIdxSql,
       |$hwRecursionSql
       |SELECT k AS event_type, p AS period, round(mv, 6) AS v,
       |  round(l, 6) + 0.0 AS level, round(b, 6) + 0.0 AS trend,
       |  round($seaOut, 6) + 0.0 AS seasonal,
       |  round(fit, 6) + 0.0 AS fitted
       |FROM hw ORDER BY event_type, period""".stripMargin
  }

  /** q_hw_forecast replay: the HW recursion to each key's final row,
    * then a generate_series projection with the continuing phase. */
  private def hwForecastOracleSql: String = {
    val sPick = "CASE (l2.i - 1 + h.h) % 7 " +
      (0 until 7).map(j => s"WHEN $j THEN l2.s$j").mkString(" ") +
      " END"
    s"""WITH RECURSIVE $hwIdxSql,
       |$hwRecursionSql,
       |mx AS (SELECT k, max(i) AS mi FROM hw GROUP BY k),
       |l2 AS (SELECT hw.* FROM hw
       |  JOIN mx ON hw.k = mx.k AND hw.i = mx.mi),
       |f AS (SELECT l2.k, CAST(h.h AS BIGINT) AS h,
       |    l2.p + h.h AS period,
       |    l2.l + CAST(h.h AS DOUBLE) * l2.b + $sPick AS fc
       |  FROM l2, generate_series(1, 14) h(h))
       |SELECT k AS event_type, h, period,
       |  round(fc, 6) + 0.0 AS forecast
       |FROM f ORDER BY event_type, h""".stripMargin
  }

  /** q_hw_accuracy replay: both recurrences (HW and plain Holt) over
    * the shared daily-mean cells, then the q_ar_accuracy fold per
    * (model, key) with the weekly seasonal-naive MASE denominator. */
  private def hwAccuracyOracleSql: String =
    s"""WITH RECURSIVE $hwIdxSql,
       |$hwRecursionSql,
       |ho(k, i, p, mv, l, b) AS (
       |  SELECT k, i, p, mv, mv, CAST(0.0 AS DOUBLE) FROM idx
       |  WHERE i = 1
       |  UNION ALL
       |  SELECT idx.k, idx.i, idx.p, idx.mv,
       |    0.3 * idx.mv + (1.0 - 0.3) * (ho.l + ho.b),
       |    0.1 * ((0.3 * idx.mv + (1.0 - 0.3) * (ho.l + ho.b)) - ho.l)
       |      + (1.0 - 0.1) * ho.b
       |  FROM ho JOIN idx ON idx.k = ho.k AND idx.i = ho.i + 1),
       |fitu AS (
       |  SELECT 'holt_winters' AS model, k, p, round(mv, 6) AS a,
       |    round(fit, 6) AS pr FROM hw
       |  UNION ALL
       |  SELECT 'holt', k, p, round(mv, 6),
       |    round(lag(l) OVER (PARTITION BY k ORDER BY i)
       |      + lag(b) OVER (PARTITION BY k ORDER BY i), 6) FROM ho),
       |w2 AS (SELECT model, k, p, a, pr,
       |    lag(a, 7) OVER (PARTITION BY model, k ORDER BY p) AS nv
       |  FROM fitu),
       |agg AS (SELECT model, k,
       |    CAST(sum(CASE WHEN pr IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_scored,
       |    sum(CASE WHEN pr IS NOT NULL THEN abs(a - pr) END) AS sae,
       |    sum(CASE WHEN pr IS NOT NULL
       |      THEN abs(a - pr) * abs(a - pr) END) AS sse,
       |    sum(CASE WHEN pr IS NOT NULL AND a <> 0.0
       |      THEN abs(a - pr) / abs(a) END) AS sape,
       |    CAST(sum(CASE WHEN pr IS NOT NULL AND a <> 0.0
       |      THEN 1 ELSE 0 END) AS BIGINT) AS nape,
       |    sum(CASE WHEN nv IS NOT NULL THEN abs(a - nv) END) AS snv,
       |    CAST(sum(CASE WHEN nv IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS nnv
       |  FROM w2 GROUP BY model, k)
       |SELECT k AS event_type, n_scored,
       |  round(sae / n_scored, 6) AS mae,
       |  round(sqrt(sse / n_scored), 6) AS rmse,
       |  CASE WHEN nape > 0 THEN round(sape / nape, 6) END AS mape,
       |  CASE WHEN nnv > 0 AND snv / nnv > 0.0
       |    THEN round((sae / n_scored) / (snv / nnv), 6) END AS mase,
       |  model
       |FROM agg WHERE n_scored > 0
       |ORDER BY model, event_type""".stripMargin

  private def codyErfcSql(y: String): String = {
    val z = s"($y * $y)"
    val num1 = s"((((1.85777706184603153e-1 * $z + 3.16112374387056560) * $z" +
      s" + 1.13864154151050156e2) * $z + 3.77485237685302021e2) * $z" +
      s" + 3.20937758913846947e3)"
    val den1 = s"(((($z + 2.36012909523441209e1) * $z" +
      s" + 2.44024637934444173e2) * $z + 1.28261652607737228e3) * $z" +
      s" + 2.84423683343917062e3)"
    val num2 = s"((((((((2.15311535474403846e-8 * $y" +
      s" + 5.64188496988670089e-1) * $y + 8.88314979438837594) * $y" +
      s" + 6.61191906371416295e1) * $y + 2.98635138197400131e2) * $y" +
      s" + 8.81952221241769090e2) * $y + 1.71204761263407058e3) * $y" +
      s" + 2.05107837782607147e3) * $y + 1.23033935479799725e3)"
    val den2 = s"(((((((($y + 1.57449261107098347e1) * $y" +
      s" + 1.17693950891312499e2) * $y + 5.37181101862009858e2) * $y" +
      s" + 1.62138957456669019e3) * $y + 3.29079923573345963e3) * $y" +
      s" + 4.36261909014324716e3) * $y + 3.43936767414372164e3) * $y" +
      s" + 1.23033935480374942e3)"
    val zi = s"(1.0 / ($y * $y))"
    val num3 = s"(((((1.63153871373020978e-2 * $zi" +
      s" + 3.05326634961232344e-1) * $zi + 3.60344899949804439e-1) * $zi" +
      s" + 1.25781726111229246e-1) * $zi + 1.60837851487422766e-2) * $zi" +
      s" + 6.58749161529837803e-4)"
    val den3 = s"((((($zi + 2.56852019228982242) * $zi" +
      s" + 1.87295284992346047) * $zi + 5.27905102951428412e-1) * $zi" +
      s" + 6.05183413124413191e-2) * $zi + 2.33520497626869185e-3)"
    val ysq = s"(floor($y * 16.0) / 16.0)"
    val expf = s"(exp(-($ysq * $ysq)) * exp(-(($y - $ysq) * ($y + $ysq))))"
    s"(CASE WHEN $y <= 0.46875 THEN 1.0 - $y * $num1 / $den1 " +
      s"WHEN $y <= 4.0 THEN $expf * ($num2 / $den2) " +
      s"WHEN $y < 26.543 THEN $expf * " +
      s"((5.6418958354775628695e-1 - $zi * $num3 / $den3) / $y) " +
      s"ELSE 0.0 END)"
  }

  private def groupedFitOracleArms(keys: String): String =
    s"""fits AS (
       |  SELECT $keys, n, 'norm' AS distribution, m AS p1, sqrt(s2) AS p2,
       |    -1.0 AS p3, -n / 2.0 * ln(2 * pi() * s2) - n / 2.0 AS ll, 2 AS k
       |  FROM s WHERE n >= 2 AND s2 > 0
       |  UNION ALL SELECT $keys, n, 'expon', mn, m - mn, -1.0,
       |    -n * ln(m - mn) - n, 2 FROM s WHERE n >= 2 AND m - mn > 0
       |  UNION ALL SELECT $keys, n, 'uniform', mn, mx - mn, -1.0,
       |    -n * ln(mx - mn), 2 FROM s WHERE n >= 2 AND mx - mn > 0
       |  UNION ALL SELECT $keys, n, 'lognorm', sqrt(s2ln), 0.0, exp(mln),
       |    -n * mln - n / 2.0 * ln(2 * pi() * s2ln) - n / 2.0, 2
       |  FROM s WHERE n >= 2 AND mn > 0 AND s2ln > 0
       |  UNION ALL SELECT $keys, n, 'rayleigh', 0.0, sqrt(sxx / (2.0 * n)),
       |    -1.0, n * mln - n * ln(sxx / (2.0 * n)) - n, 1
       |  FROM s WHERE n >= 2 AND mn > 0
       |  UNION ALL SELECT $keys, n, 'halfnorm', 0.0, sqrt(sxx / n), -1.0,
       |    n * (0.5 * ln(2.0 / pi())) - n / 2.0 * ln(sxx / n) - n / 2.0, 1
       |  FROM s WHERE n >= 2 AND mn >= 0 AND sxx > 0
       |  UNION ALL SELECT $keys, n, 'pareto', 1.0 / (mln - ln(mn)), 0.0, mn,
       |    n * ln(1.0 / (mln - ln(mn)))
       |      + n * (1.0 / (mln - ln(mn))) * ln(mn)
       |      - (1.0 / (mln - ln(mn)) + 1.0) * n * mln, 2
       |  FROM s WHERE n >= 2 AND mn > 0 AND mln > ln(mn))""".stripMargin

  /** Shared prefix of the per-group GOF oracles (q_grouped_fit_gof and
    * its sketch-audit twin): the elementary-CDF family parameters, the
    * distinct-value frame, the per-(group, family) CDF CASE, and the
    * cumulative window — identical by construction in both. */
  private val groupedGofOraclePrefix: String =
    """WITH s AS (SELECT l_returnflag AS g, count(*) AS n,
      |    avg(l_extendedprice) AS m,
      |    min(l_extendedprice) AS mn, max(l_extendedprice) AS mx,
      |    avg(ln(l_extendedprice)) FILTER (WHERE l_extendedprice > 0)
      |      AS mln,
      |    sum(l_extendedprice * l_extendedprice) AS sxx
      |  FROM lineitem WHERE l_extendedprice IS NOT NULL
      |  GROUP BY l_returnflag),
      |fits AS (
      |  SELECT g, n, 'expon' AS distribution, mn AS loc, m - mn AS sc,
      |    0.0 AS b FROM s WHERE n >= 2 AND m - mn > 0
      |  UNION ALL SELECT g, n, 'uniform', mn, mx - mn, 0.0
      |  FROM s WHERE n >= 2 AND mx - mn > 0
      |  UNION ALL SELECT g, n, 'rayleigh', 0.0, sqrt(sxx / (2.0 * n)), 0.0
      |  FROM s WHERE n >= 2 AND mn > 0
      |  UNION ALL SELECT g, n, 'pareto', 0.0, mn, 1.0 / (mln - ln(mn))
      |  FROM s WHERE n >= 2 AND mn > 0 AND mln > ln(mn)),
      |v AS (SELECT l_returnflag AS g, l_extendedprice AS x,
      |    count(*) AS c
      |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2),
      |j AS (SELECT f.g, f.distribution, f.n, v.x, v.c,
      |    CASE f.distribution
      |      WHEN 'expon' THEN CASE WHEN v.x <= f.loc THEN 0.0
      |        ELSE 1.0 - exp(-((v.x - f.loc) / f.sc)) END
      |      WHEN 'uniform' THEN least(1.0, greatest(0.0,
      |        (v.x - f.loc) / f.sc))
      |      WHEN 'rayleigh' THEN CASE WHEN v.x <= 0 THEN 0.0
      |        ELSE 1.0 - exp(-0.5 * (v.x / f.sc) * (v.x / f.sc)) END
      |      WHEN 'pareto' THEN CASE WHEN v.x <= f.sc THEN 0.0
      |        ELSE 1.0 - power(v.x / f.sc, -f.b) END
      |    END AS cdf
      |  FROM v JOIN fits f ON v.g = f.g),
      |cw AS (SELECT g, distribution, n, c, cdf,
      |    least(1.0 - 1e-10, greatest(1e-10, cdf)) AS fc,
      |    sum(c) OVER (PARTITION BY g, distribution ORDER BY x) AS cum
      |  FROM j)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_partitioned_sink" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents WHERE lang IN ('en', 'fr')
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_salted_join" ->
      """SELECT o.o_orderpriority, count(*) AS n_items,
        |  round(CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount), 6)
        |        AS DECIMAL(24,6))) AS DOUBLE), 2) AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,
    "q_bucketed_join" ->
      """SELECT o.o_orderpriority, count(*) AS n_items,
        |  round(CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount), 6)
        |        AS DECIMAL(24,6))) AS DOUBLE), 2) AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,
    "q_join_revenue" ->
      """SELECT n.n_name,
        |  round(CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount), 6)
        |        AS DECIMAL(24,6))) AS DOUBLE), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS tns FROM events),
        |f AS (SELECT user_id, tns,
        |  CASE WHEN lag(tns) OVER w IS NULL
        |         OR tns - lag(tns) OVER w > 1800000000000 THEN 1 ELSE 0 END AS nf
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tns)),
        |s AS (SELECT user_id, tns,
        |  CAST(sum(nf) OVER (PARTITION BY user_id ORDER BY tns) AS BIGINT) AS session_idx
        |  FROM f)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  min(tns) AS t_start, max(tns) - min(tns) AS span
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    "q_asof_join" ->
      """SELECT l.event_id, l.user_id, round(r.pv, 6) AS last_purchase_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS pv FROM events
        |                WHERE event_type = 'purchase' GROUP BY 1, 2) r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY event_id""".stripMargin,
    "q_stream_hist" ->
      """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400 AS win_start,
        |  least(greatest(CAST(floor(value / 50.0) AS BIGINT), 0), 9) AS bin,
        |  count(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_stream_distinct" ->
      """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400 AS win_start,
        |  count(DISTINCT user_id) AS n_exact, TRUE AS within_2pct
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // Streaming grouped fit: the q_grouped_fit closed forms per
    // (day window, event_type) — batch replay of the streaming result.
    "q_stream_grouped_fit" ->
      ("""WITH e AS (SELECT
        |    (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400 AS ws,
        |    event_type AS et, CAST(value AS DOUBLE) AS x
        |  FROM events WHERE value IS NOT NULL),
        |s AS (SELECT ws, et, count(*) AS n, avg(x) AS m, var_pop(x) AS s2,
        |    min(x) AS mn, max(x) AS mx,
        |    avg(ln(x)) FILTER (WHERE x > 0) AS mln,
        |    var_pop(ln(x)) FILTER (WHERE x > 0) AS s2ln,
        |    sum(x * x) AS sxx
        |  FROM e GROUP BY ws, et),
        |""".stripMargin + groupedFitOracleArms("ws, et") + """
        |SELECT ws AS win_start, et AS event_type, CAST(n AS BIGINT) AS n,
        |  distribution, round(p1, 4) AS p1, round(p2, 4) AS p2,
        |  round(p3, 4) AS p3, round(2.0 * k - 2.0 * ll, 2) AS aic_r
        |FROM fits ORDER BY win_start, event_type, distribution""".stripMargin),
    // CUSUM replay: per-row running sums ordered by (ts, event_id),
    // prefix minima seeded with the implicit cum_0 = 0, per-row
    // statistics for the peak/alarm folds, final row per key.
    "q_stream_cusum" ->
      """WITH e AS (SELECT event_type AS k, epoch_ns(ts) AS t,
        |    event_id AS eid, CAST(value AS DOUBLE) AS v FROM events),
        |w AS (SELECT k, t, eid,
        |    sum(v - 50.0 - 1.0) OVER pre AS cum_hi,
        |    sum(50.0 - v - 1.0) OVER pre AS cum_lo,
        |    CAST(row_number() OVER (PARTITION BY k ORDER BY t, eid)
        |      AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n
        |  FROM e
        |  WINDOW pre AS (PARTITION BY k ORDER BY t, eid
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT k, rn, n, cum_hi, cum_lo,
        |    least(0.0, min(cum_hi) OVER pre) AS min_hi,
        |    least(0.0, min(cum_lo) OVER pre) AS min_lo
        |  FROM w
        |  WINDOW pre AS (PARTITION BY k ORDER BY rn
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |st AS (SELECT k, rn, n, cum_hi - min_hi AS s_hi,
        |    cum_lo - min_lo AS s_lo FROM s),
        |agg AS (SELECT k, max(n) AS n, max(s_hi) AS max_hi,
        |    max(s_lo) AS max_lo,
        |    CAST(sum(CASE WHEN s_hi > 500.0 OR s_lo > 500.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms
        |  FROM st GROUP BY k),
        |fin AS (SELECT k, s_hi, s_lo FROM st WHERE rn = n)
        |SELECT agg.k AS event_type, agg.n,
        |  round(fin.s_hi, 6) AS s_hi, round(fin.s_lo, 6) AS s_lo,
        |  round(agg.max_hi, 6) AS max_s_hi,
        |  round(agg.max_lo, 6) AS max_s_lo, agg.n_alarms,
        |  (fin.s_hi > 500.0 OR fin.s_lo > 500.0) AS alarm
        |FROM agg JOIN fin ON agg.k = fin.k
        |ORDER BY event_type""".stripMargin,
    "q_stream_welford" ->
      """SELECT event_type, count(*) AS n, round(avg(value), 6) AS mean_r,
        |  round(stddev_pop(value), 4) AS std_r
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_stream_anomaly" ->
      """WITH e AS (SELECT event_type AS k, epoch_ns(ts) AS tns,
        |    event_id, CAST(value AS DOUBLE) AS v FROM events
        |  WHERE value IS NOT NULL AND NOT isnan(value)
        |    AND ts IS NOT NULL AND event_id IS NOT NULL),
        |w AS (SELECT k, tns, v,
        |    CAST(count(*) OVER pre AS BIGINT) AS nb,
        |    avg(v) OVER pre AS mu, var_pop(v) OVER pre AS vr
        |  FROM e WINDOW pre AS (PARTITION BY k ORDER BY tns, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT k AS event_type, tns AS ts, v AS value,
        |    (v - mu) / sqrt(vr) AS zr, nb AS n_before FROM w
        |  WHERE nb >= 30 AND vr > 0)
        |SELECT event_type, ts, value,
        |  round_even(zr * 1000000.0, 0) / 1000000.0 AS z, n_before
        |FROM z WHERE abs(zr) > 2.5
        |ORDER BY event_type, ts, value""".stripMargin,
    "q_stream_dedup" ->
      """SELECT count(DISTINCT props) AS n_survivors FROM events""",
    "q_stream_sessions" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000 AS tms FROM events),
        |mx AS (SELECT max(tms) AS m FROM e),
        |f AS (SELECT user_id, tms,
        |  CASE WHEN lag(tms) OVER w IS NULL OR tms - lag(tms) OVER w > 1800000
        |       THEN 1 ELSE 0 END AS nf
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms)),
        |s AS (SELECT user_id, tms,
        |  CAST(sum(nf) OVER (PARTITION BY user_id ORDER BY tms) AS BIGINT) AS sid
        |  FROM f),
        |g AS (SELECT user_id, sid, min(tms) AS start_ms, max(tms) AS end_ms,
        |  count(*) AS n_events FROM s GROUP BY user_id, sid),
        |l AS (SELECT user_id, max(sid) AS last_sid FROM g GROUP BY user_id)
        |SELECT g.user_id, g.start_ms, g.end_ms, g.n_events
        |FROM g JOIN l USING (user_id), mx
        |WHERE g.sid < l.last_sid OR g.end_ms + 1800000 < mx.m
        |ORDER BY user_id, start_ms""".stripMargin,
    "q_stream_stats" ->
      """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400 AS win_start,
        |  count(*) AS cnt, round(avg(value), 6) AS mean_r,
        |  round(min(value), 2) AS mn, round(max(value), 2) AS mx,
        |  round(stddev_pop(value), 4) AS std_r
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // Drift replay: day-window bin shares vs the frozen expon(0,60)
    // reference — expected masses as exp() arithmetic, SSE as an ordered
    // left fold matching the zip_with/aggregate evaluation order.
    "q_stream_drift" ->
      """WITH ev AS (SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400 AS win_start,
        |    least(greatest(CAST(floor(value / 50.0) AS BIGINT), 0), 9) AS bin
        |  FROM events),
        |n AS (SELECT win_start, count(*) AS n FROM ev GROUP BY 1),
        |c AS (SELECT win_start, bin, count(*) AS c FROM ev GROUP BY 1, 2),
        |grid AS (SELECT n.win_start, n.n, b.i,
        |    coalesce(c.c, 0) AS c
        |  FROM n CROSS JOIN (SELECT unnest(range(10)) AS i) b
        |  LEFT JOIN c ON c.win_start = n.win_start AND c.bin = b.i),
        |pexp AS (SELECT i,
        |  CASE WHEN i = 0 THEN -(exp(-(((0.0 + CAST(i AS DOUBLE) * 50.0) + 50.0) / 60.0)) - 1)
        |       WHEN i = 9 THEN 1.0 - (-(exp(-((0.0 + CAST(i AS DOUBLE) * 50.0) / 60.0)) - 1))
        |       ELSE (-(exp(-(((0.0 + CAST(i AS DOUBLE) * 50.0) + 50.0) / 60.0)) - 1))
        |          - (-(exp(-((0.0 + CAST(i AS DOUBLE) * 50.0) / 60.0)) - 1)) END AS p
        |  FROM (SELECT unnest(range(10)) AS i)),
        |terms AS (SELECT g.win_start, g.n, g.i,
        |    (CAST(g.c AS DOUBLE) / g.n - p.p) * (CAST(g.c AS DOUBLE) / g.n - p.p) AS t
        |  FROM grid g JOIN pexp p ON p.i = g.i),
        |agg AS (SELECT win_start, n,
        |    round(list_reduce(list_prepend(0.0, list(t ORDER BY i)),
        |      (a, x) -> a + x), 8) AS drift_sse
        |  FROM terms GROUP BY win_start, n)
        |SELECT win_start, n, drift_sse FROM agg ORDER BY win_start""".stripMargin,
    "q_unigram_logprob" ->
      """WITH tok AS (SELECT doc_id,
        |  unnest(list_filter(regexp_split_to_array(lower(coalesce(text, '')),
        |    '\s+'), x -> x <> '')) AS token FROM documents),
        |freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
        |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS nt FROM freq),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
        |  WHERE doc_id < 100 GROUP BY doc_id, token)
        |SELECT tf.doc_id AS id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
        |  round(sum(tf.tf * ln(CAST(freq.cnt AS DOUBLE) / tot.nt))
        |        / CAST(sum(tf.tf) AS DOUBLE), 6) AS mean_logprob
        |FROM tf JOIN freq USING (token), tot
        |GROUP BY tf.doc_id ORDER BY id""".stripMargin,
    "q_range_join" ->
      """WITH iv AS (SELECT o_orderkey,
        |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS ws,
        |  CAST(floor(epoch(o_orderdate)) AS BIGINT) + 30 * 86400 AS we
        |  FROM orders WHERE o_orderkey < 200),
        |p AS (SELECT CAST(floor(epoch(l_shipdate)) AS BIGINT) AS p FROM lineitem)
        |SELECT o_orderkey, count(*) AS n_ship
        |FROM iv JOIN p ON p.p BETWEEN iv.ws AND iv.we
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "q_heavy_hitters" ->
      """SELECT lang || '|' || source AS key, count(*) AS cnt,
        |  CAST(0 AS BIGINT) AS err
        |FROM documents GROUP BY 1 ORDER BY key""".stripMargin,
    "q_sketch_hll" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_exact,
        |  TRUE AS merged_within_2pct, TRUE AS single_within_2pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_sketch_kll" ->
      """SELECT p.probe,
        |  round_even(avg(CASE WHEN l_extendedprice <= p.probe
        |    THEN 1.0 ELSE 0.0 END) * 1000000.0, 0) / 1000000.0 AS exact_rank,
        |  TRUE AS within_eps
        |FROM lineitem CROSS JOIN (VALUES (10000.0), (30000.0), (60000.0),
        |  (90000.0)) p(probe)
        |WHERE l_extendedprice IS NOT NULL
        |GROUP BY p.probe ORDER BY p.probe""".stripMargin,
    // same quantize shape as q_stratified_hash (floor((x-mn)/w) with
    // w = (mx-mn)/2^bits computed first), then the bit interleave as a
    // sum over range(bits) — integer-exact in both engines
    "q_zorder" ->
      """WITH s AS (SELECT min(l_extendedprice) AS mnx, max(l_extendedprice) AS mxx,
        |  min(l_quantity) AS mny, max(l_quantity) AS mxy FROM lineitem),
        |c AS (SELECT l_orderkey, l_linenumber,
        |  least(greatest(CAST(floor((l_extendedprice - s.mnx)
        |    / ((s.mxx - s.mnx) / 256)) AS BIGINT), 0), 255) AS cx,
        |  least(greatest(CAST(floor((CAST(l_quantity AS DOUBLE) - s.mny)
        |    / ((s.mxy - s.mny) / 256)) AS BIGINT), 0), 255) AS cy
        |  FROM lineitem, s WHERE l_orderkey < 200)
        |SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(list_sum(list_transform(range(8), b ->
        |    (((cx >> b) & 1) << (2 * b)) + (((cy >> b) & 1) << (2 * b + 1))))
        |    AS BIGINT) AS z_value
        |FROM c
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_theta_artifact" ->
      """WITH tok AS (SELECT source, doc_id,
        |  list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |    x -> x <> '') AS t FROM documents),
        |g AS (SELECT source, unnest(list_transform(range(len(t) - 7),
        |    i -> array_to_string(t[i+1:i+8], ' '))) AS gram
        |  FROM tok WHERE len(t) >= 8)
        |SELECT count(DISTINCT gram) AS n_distinct_grams,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_artifacts
        |FROM g""".stripMargin,
    // exact-regime theta set algebra replayed literally: distinct 8-gram
    // sets per side, counts by join. round_even matches rint.
    "q_theta_overlap" ->
      """WITH tok AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |    x -> x <> '') AS t FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(len(t) - 7),
        |    i -> array_to_string(t[i+1:i+8], ' '))) AS gram
        |  FROM tok WHERE len(t) >= 8),
        |tr AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 <> 0),
        |be AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
        |c AS (SELECT count(*) AS n_common FROM tr JOIN be USING (gram)),
        |n AS (SELECT (SELECT count(*) FROM tr) AS n_a,
        |             (SELECT count(*) FROM be) AS n_b, n_common FROM c)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  CAST(n_common AS BIGINT) AS n_common,
        |  CAST(n_a - n_common AS BIGINT) AS n_a_only,
        |  CAST(n_b - n_common AS BIGINT) AS n_b_only,
        |  round_even(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common)
        |    * 1000000.0, 0) / 1000000.0 AS jaccard
        |FROM n""".stripMargin,
    "q_theta_cohort" ->
      """WITH tok AS (SELECT source, doc_id,
        |  list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |    x -> x <> '') AS t FROM documents),
        |g AS (SELECT DISTINCT source, unnest(list_transform(range(len(t) - 7),
        |    i -> array_to_string(t[i+1:i+8], ' '))) AS gram
        |  FROM tok WHERE len(t) >= 8),
        |n AS (SELECT source, count(*) AS n FROM g GROUP BY source),
        |c AS (SELECT a.source AS ca, b.source AS cb, count(*) AS n_common
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
        |  GROUP BY 1, 2),
        |p AS (SELECT x.source AS ca, y.source AS cb, x.n AS n_a, y.n AS n_b,
        |    coalesce(c.n_common, 0) AS n_common
        |  FROM n x JOIN n y ON x.source < y.source
        |  LEFT JOIN c ON c.ca = x.source AND c.cb = y.source)
        |SELECT ca AS cohort_a, cb AS cohort_b, CAST(n_a AS BIGINT) AS n_a,
        |  CAST(n_b AS BIGINT) AS n_b, CAST(n_common AS BIGINT) AS n_common,
        |  CAST(n_a - n_common AS BIGINT) AS n_a_only,
        |  CAST(n_b - n_common AS BIGINT) AS n_b_only,
        |  round_even(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common)
        |    * 1000000.0, 0) / 1000000.0 AS jaccard
        |FROM p ORDER BY cohort_a, cohort_b""".stripMargin,
    "q_stratified_hash" ->
      """WITH s AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
        |b AS (SELECT event_id, value,
        |  least(greatest(CAST(floor((value - s.mn) / ((s.mx - s.mn) / 5))
        |    AS BIGINT), 0), 4) AS bin,
        |  CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |    % 10000 AS bucket
        |  FROM events, s)
        |SELECT event_id, round(value, 2) AS value_r FROM b
        |WHERE bucket < (CASE WHEN bin = 0 OR bin = 4 THEN 5000 ELSE 1000 END)
        |ORDER BY event_id""".stripMargin,
    "q_props_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_dup_spans" ->
      """WITH tok AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |    x -> x <> '') AS t FROM documents),
        |p AS (SELECT doc_id, t, unnest(range(len(t) - 7)) AS pos
        |  FROM tok WHERE len(t) >= 8),
        |g AS (SELECT doc_id, pos,
        |    array_to_string(t[pos+1:pos+8], ' ') AS gram FROM p),
        |d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        |m AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)),
        |f AS (SELECT doc_id, pos,
        |  CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + 8
        |       THEN 1 ELSE 0 END AS nf
        |  FROM m WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |s AS (SELECT doc_id, pos,
        |  CAST(sum(nf) OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT)
        |    AS island FROM f)
        |SELECT doc_id AS id, island, CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) + 7 AS BIGINT) AS span_end, count(*) AS n_grams
        |FROM s GROUP BY doc_id, island ORDER BY id, island""".stripMargin,
    "q_decontaminate" ->
      """WITH tok AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |    x -> x <> '') AS t FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(len(t) - 7),
        |    i -> array_to_string(t[i+1:i+8], ' '))) AS gram
        |  FROM tok WHERE len(t) >= 8),
        |bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
        |SELECT g.doc_id AS id, count(*) AS n_hits,
        |  count(DISTINCT g.gram) AS n_uniq_grams
        |FROM g JOIN bg USING (gram)
        |GROUP BY g.doc_id ORDER BY id""".stripMargin,
    // Replays the fuzzy tier: shared-5-gram candidates under the
    // stop-gram cap, then the same Levenshtein DP over identically
    // normalized prefixes (regexp_replace needs the 'g' flag to match
    // Spark's replace-all semantics).
    "q_decontam_fuzzy" ->
      """WITH tok AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |    x -> x <> '') AS t FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(len(t) - 4),
        |    i -> array_to_string(t[i+1:i+5], ' '))) AS gram
        |  FROM tok WHERE len(t) >= 5),
        |bg AS (SELECT DISTINCT doc_id AS bench_id, gram FROM g
        |  WHERE doc_id % 50 = 0),
        |mg AS (SELECT g.doc_id, g.gram FROM g
        |  WHERE g.gram IN (SELECT gram FROM bg)),
        |keep AS (SELECT gram FROM mg GROUP BY gram
        |  HAVING count(DISTINCT doc_id) <= 50),
        |pairs AS (SELECT DISTINCT mg.doc_id, bg.bench_id
        |  FROM mg JOIN keep USING (gram) JOIN bg USING (gram)),
        |pre AS (SELECT doc_id, substr(trim(regexp_replace(
        |    lower(coalesce(text, '')), '\s+', ' ', 'g')), 1, 400) AS p
        |  FROM documents)
        |SELECT p.doc_id, p.bench_id,
        |  CAST(levenshtein(ca.p, cb.p) AS INTEGER) AS edit_dist,
        |  CAST(length(ca.p) AS INTEGER) AS len_a,
        |  CAST(length(cb.p) AS INTEGER) AS len_b,
        |  levenshtein(ca.p, cb.p) <= 0.2 * greatest(length(ca.p),
        |    length(cb.p)) AS is_contaminated
        |FROM pairs p JOIN pre ca ON p.doc_id = ca.doc_id
        |JOIN pre cb ON p.bench_id = cb.doc_id
        |ORDER BY p.doc_id, p.bench_id""".stripMargin,
    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id AS id,
        |  CAST(length(regexp_extract_all(coalesce(text, ''), '\S+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (SELECT id, n_tokens,
        |  COALESCE(CAST(sum(n_tokens) OVER (ORDER BY id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |    0) AS "offset" FROM t)
        |SELECT id, n_tokens, "offset",
        |  "offset" // 1024 AS first_seq,
        |  CASE WHEN n_tokens = 0 THEN "offset" // 1024
        |       ELSE ("offset" + n_tokens - 1) // 1024 END AS last_seq,
        |  CASE WHEN n_tokens = 0 THEN "offset" // 1024
        |       ELSE ("offset" + n_tokens - 1) // 1024 END
        |    - "offset" // 1024 + 1 AS n_seqs
        |FROM o ORDER BY id""".stripMargin,
    "q_domain_mix" ->
      """WITH w AS (SELECT 'en' AS lang, 30 AS p UNION ALL
        |  SELECT 'de', 20 UNION ALL SELECT 'es', 20 UNION ALL
        |  SELECT 'fr', 15 UNION ALL SELECT 'zh', 15),
        |n AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |k AS (SELECT min(n.n // w.p) AS kk FROM n JOIN w USING (lang)),
        |t AS (SELECT w.lang, (w.p * k.kk * 10000) // n.n AS thr
        |      FROM w JOIN n USING (lang) CROSS JOIN k),
        |b AS (SELECT doc_id, lang,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |    % 10000 AS bucket FROM documents)
        |SELECT b.lang, count(*) AS n_docs, CAST(sum(b.doc_id) AS BIGINT) AS id_sum
        |FROM b JOIN t ON b.lang = t.lang WHERE b.bucket < t.thr
        |GROUP BY b.lang ORDER BY b.lang""".stripMargin,
    "q_robust_outliers" ->
      """WITH v AS (SELECT event_id, CAST(value AS DOUBLE) AS x FROM events),
        |m AS (SELECT quantile_disc(x, 0.5) AS med FROM v
        |  WHERE x IS NOT NULL AND NOT isnan(x)),
        |d AS (SELECT quantile_disc(abs(x - m.med), 0.5) AS mad FROM v, m
        |  WHERE x IS NOT NULL AND NOT isnan(x))
        |SELECT event_id, round(x, 2) AS value_r,
        |  round(abs(x - m.med) / (1.4826 * d.mad), 6) AS robust_z,
        |  round(abs(x - m.med) / (1.4826 * d.mad), 6) > 1.2 AS is_outlier
        |FROM v, m, d WHERE event_id < 100 ORDER BY event_id""".stripMargin,
    "q_data_quality" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |v AS (
        |  SELECT 'text' AS "column", 'not_null' AS rule,
        |    CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS violations FROM documents
        |  UNION ALL SELECT 'doc_id', 'unique',
        |    CAST(count(doc_id) - count(DISTINCT doc_id) AS BIGINT)
        |    FROM documents
        |  UNION ALL SELECT 'lang', 'accepted_values',
        |    CAST(sum(CASE WHEN lang IS NOT NULL AND lang NOT IN
        |      ('en','de','es','fr','zh') THEN 1 ELSE 0 END) AS BIGINT)
        |    FROM documents
        |  UNION ALL SELECT 'n_chars', 'in_range',
        |    CAST(sum(CASE WHEN n_chars IS NOT NULL AND
        |      (CAST(n_chars AS DOUBLE) < 100.0 OR CAST(n_chars AS DOUBLE) > 500.0)
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM documents
        |  UNION ALL SELECT 'source', 'matches_regex',
        |    CAST(sum(CASE WHEN source IS NOT NULL AND
        |      NOT regexp_full_match(source, '(?:src[0-9]+)')
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM documents)
        |SELECT v."column", v.rule, v.violations, n.n AS n_rows,
        |  v.violations = 0 AS passed
        |FROM v, n ORDER BY v."column", v.rule""".stripMargin,
    // min-rank NTILE replay: rank() is 1 + count(smaller) in both
    // engines; the bucket arithmetic runs in doubles with the same shape
    "q_ntile_buckets" ->
      """WITH s AS (SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(l_quantity AS DOUBLE) AS qv
        |  FROM lineitem WHERE l_orderkey < 200),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s
        |  WHERE qv IS NOT NULL AND NOT isnan(qv)),
        |r AS (SELECT l_orderkey, l_linenumber, qv,
        |  rank() OVER (ORDER BY qv) AS rk FROM s)
        |SELECT l_orderkey, l_linenumber, CAST(qv AS BIGINT) AS l_quantity,
        |  CAST(floor((CAST(rk AS DOUBLE) - 1) * 5 / n.n) + 1 AS BIGINT)
        |    AS bucket
        |FROM r, n ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    // the per-doc quality score is the q_doc_quality replay; integer
    // volumes are exact, the two averages are rounded post-agg
    "q_corpus_report" ->
      """WITH f AS (
        |  SELECT lang, text,
        |    length(regexp_extract_all(text, '\S+')) AS n_tokens,
        |    length(text) AS n_chars,
        |    CASE WHEN length(regexp_extract_all(text, '\S+')) > 0
        |      THEN round(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / length(regexp_extract_all(text, '\S+')), 6)
        |      ELSE 0.0 END AS mean_token_len,
        |    CASE WHEN length(regexp_extract_all(lower(text), '[a-z]+')) > 0
        |      THEN round(CAST(length(list_distinct(regexp_extract_all(lower(text), '[a-z]+'))) AS DOUBLE) / length(regexp_extract_all(lower(text), '[a-z]+')), 6)
        |      ELSE 0.0 END AS type_token_ratio,
        |    CASE WHEN length(text) > 0
        |      THEN round(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text), 6)
        |      ELSE 0.0 END AS punct_ratio
        |  FROM documents),
        |q AS (SELECT lang, text, n_tokens, n_chars,
        |  round(least(n_tokens / 50.0, 1.0) * 0.4 + type_token_ratio * 0.3 +
        |    (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2 +
        |    least(mean_token_len / 8.0, 1.0) * 0.1, 6) AS quality_score
        |  FROM f)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  count(DISTINCT md5(text)) AS n_unique_texts,
        |  round(avg(quality_score), 6) AS avg_quality,
        |  round(avg(CAST(n_tokens AS DOUBLE)), 2) AS avg_tokens,
        |  CAST(min(n_tokens) AS BIGINT) AS min_tokens,
        |  CAST(max(n_tokens) AS BIGINT) AS max_tokens
        |FROM q GROUP BY lang ORDER BY lang""".stripMargin,
    "q_kfold" ->
      """SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |    AS BIGINT) % 5 AS fold,
        |  count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // threshold arithmetic replayed in the same order: ((f·N)/W)·w·2^20,
    // with W and N exact integer sums cast to double
    "q_weighted_sample" ->
      """WITH s AS (SELECT CAST(sum(n_chars) AS DOUBLE) AS W,
        |  CAST(count(*) AS DOUBLE) AS N FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars > 0)
        |SELECT doc_id, n_chars FROM documents, s
        |WHERE n_chars IS NOT NULL
        |  AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 1048576
        |    < least(1048576, CAST(floor(0.2 * N / W * n_chars * 1048576.0)
        |      AS BIGINT))
        |ORDER BY doc_id""".stripMargin,
    "q_repetition" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |              x -> x <> '') AS w
        |  FROM documents WHERE doc_id < 100),
        |f AS (SELECT doc_id, len(w) AS n,
        |  CASE WHEN len(w) > 0
        |    THEN round(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6)
        |    ELSE 0.0 END AS dup_token_ratio,
        |  CASE WHEN len(w) >= 2 THEN
        |    round(CAST(list_max(list_transform(
        |        list_distinct(list_transform(range(1, len(w)),
        |          i -> w[i] || ' ' || w[i+1])),
        |        d -> len(list_filter(list_transform(range(1, len(w)),
        |          i -> w[i] || ' ' || w[i+1]), x -> x = d)))) AS DOUBLE)
        |      / (len(w) - 1), 6)
        |  ELSE 0.0 END AS top_bigram_share
        | FROM t)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, dup_token_ratio,
        |  top_bigram_share,
        |  (dup_token_ratio > 0.6 OR top_bigram_share > 0.18) AS is_repetitive
        |FROM f ORDER BY doc_id""".stripMargin,
    "q_chunk_docs" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
        |              x -> x <> '') AS w
        |  FROM documents WHERE doc_id < 20),
        |n AS (SELECT doc_id, w,
        |  CASE WHEN len(w) = 0 THEN 0
        |       ELSE greatest(CAST(ceil((len(w) - 32.0) / 24.0) AS BIGINT) + 1, 1)
        |  END AS nc FROM t),
        |c AS (SELECT doc_id, unnest(range(0, nc)) AS chunk_id, w FROM n)
        |SELECT doc_id, chunk_id,
        |  array_to_string(w[(chunk_id * 24 + 1):(chunk_id * 24 + 32)], ' ')
        |    AS chunk_text,
        |  CAST(len(w[(chunk_id * 24 + 1):(chunk_id * 24 + 32)]) AS BIGINT)
        |    AS n_tokens
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "q_train_split" ->
      """WITH b AS (SELECT
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |    % 10000 AS bucket FROM documents),
        |s AS (SELECT bucket,
        |  CASE WHEN bucket < 9000 THEN 'train'
        |       WHEN bucket < 9500 THEN 'val'
        |       ELSE 'test' END AS split FROM b)
        |SELECT split, count(*) AS n_docs, min(bucket) AS min_bucket,
        |  max(bucket) AS max_bucket
        |FROM s GROUP BY split ORDER BY split""".stripMargin,
    "q_global_shuffle" ->
      """SELECT doc_id,
        |  CAST(row_number() OVER (
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42'), doc_id) - 1
        |    AS BIGINT) AS position
        |FROM documents ORDER BY position""".stripMargin,
    "q_pii_mask" ->
      """WITH a AS (SELECT doc_id,
        |  'User user' || doc_id || '@Example.COM  ' || chr(9) ||
        |  coalesce(text, '') || ' ip 10.0.' || (doc_id % 256) ||
        |  '.7 id 123-45-6789 end' AS aug
        |  FROM documents WHERE doc_id < 50)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(aug,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(aug,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(aug, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT)
        |    AS n_ids,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    trim(regexp_replace(regexp_replace(lower(aug),
        |      '[\x00-\x1f\x7f]', ' ', 'g'), '\s+', ' ', 'g')),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}-\d{2}-\d{4}\b', '<ID>', 'g') AS clean_text
        |FROM a ORDER BY doc_id""".stripMargin,
    "q_clean_pipeline" ->
      """WITH f AS (
        |  SELECT doc_id, lang, text,
        |    length(regexp_extract_all(text, '\S+')) AS n_tokens,
        |    CASE WHEN length(regexp_extract_all(text, '\S+')) > 0
        |      THEN round(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / length(regexp_extract_all(text, '\S+')), 6)
        |      ELSE 0.0 END AS mean_token_len,
        |    CASE WHEN length(regexp_extract_all(lower(text), '[a-z]+')) > 0
        |      THEN round(CAST(length(list_distinct(regexp_extract_all(lower(text), '[a-z]+'))) AS DOUBLE) / length(regexp_extract_all(lower(text), '[a-z]+')), 6)
        |      ELSE 0.0 END AS type_token_ratio,
        |    CASE WHEN length(text) > 0
        |      THEN round(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text), 6)
        |      ELSE 0.0 END AS punct_ratio
        |  FROM documents),
        |q AS (SELECT doc_id, lang, text, n_tokens,
        |  round(least(n_tokens / 50.0, 1.0) * 0.4 + type_token_ratio * 0.3 +
        |    (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2 +
        |    least(mean_token_len / 8.0, 1.0) * 0.1, 6) AS quality_score
        |  FROM f),
        |kept AS (SELECT * FROM q WHERE quality_score >= 0.5),
        |surv AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text))
        |SELECT k.lang, count(*) AS n_docs,
        |  CAST(sum(k.n_tokens) AS BIGINT) AS total_tokens,
        |  round(avg(k.quality_score), 6) AS avg_quality
        |FROM kept k JOIN surv s ON k.doc_id = s.doc_id
        |GROUP BY k.lang ORDER BY k.lang""".stripMargin,
    "q_time_windows" ->
      """SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
        |  count(*) AS n_events, count(DISTINCT user_id) AS n_users,
        |  round(avg(value), 6) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_vocab_topk" ->
      """WITH w AS (SELECT doc_id AS id,
        |  unnest(list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |         x -> x <> '')) AS token
        |  FROM documents)
        |SELECT token, count(*) AS n_occurrences,
        |  count(DISTINCT id) AS n_docs
        |FROM w GROUP BY token
        |ORDER BY n_occurrences DESC, token ASC LIMIT 100""".stripMargin,
    "q_pmi" ->
      """WITH t AS (SELECT doc_id, list_filter(
        |    regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |    x -> x <> '') AS w FROM documents),
        |bg AS (SELECT unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS b FROM t WHERE len(w) >= 2),
        |big AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM bg
        |  GROUP BY b),
        |uni AS (SELECT unnest(w) AS token FROM t),
        |freq AS (SELECT token, CAST(count(*) AS BIGINT) AS cu FROM uni
        |  GROUP BY token),
        |nb AS (SELECT CAST(sum(n) AS DOUBLE) AS nb FROM big),
        |nu AS (SELECT CAST(sum(cu) AS DOUBLE) AS nu FROM freq)
        |SELECT big.b AS bigram, big.n, f1.cu AS c1, f2.cu AS c2,
        |  round(ln((big.n / nb.nb)
        |    / ((f1.cu / nu.nu) * (f2.cu / nu.nu))), 6) AS pmi
        |FROM big
        |  JOIN freq f1 ON f1.token = split_part(big.b, ' ', 1)
        |  JOIN freq f2 ON f2.token = split_part(big.b, ' ', 2), nb, nu
        |WHERE big.n >= 5
        |ORDER BY pmi DESC, bigram ASC LIMIT 50""".stripMargin,
    "q_zipf" ->
      """WITH w AS (SELECT
        |  unnest(list_filter(regexp_split_to_array(lower(coalesce(text,
        |    '')), '\s+'), x -> x <> '')) AS token FROM documents),
        |freq AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM w
        |  GROUP BY token),
        |top AS (SELECT token, n FROM freq
        |  ORDER BY n DESC, token ASC LIMIT 200),
        |xy AS (SELECT
        |    ln(CAST(row_number() OVER (ORDER BY n DESC, token ASC)
        |      AS DOUBLE)) AS x,
        |    ln(CAST(n AS DOUBLE)) AS y FROM top),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_terms, sum(x) AS sx,
        |    sum(y) AS sy, sum(x * x) AS sxx, sum(y * y) AS syy,
        |    sum(x * y) AS sxy FROM xy)
        |SELECT n_terms,
        |  CASE WHEN n_terms * sxx - sx * sx > 0 THEN
        |    round((n_terms * sxy - sx * sy)
        |      / (n_terms * sxx - sx * sx), 6) END AS slope,
        |  CASE WHEN n_terms * sxx - sx * sx > 0 THEN
        |    round((sy - ((n_terms * sxy - sx * sy)
        |      / (n_terms * sxx - sx * sx)) * sx) / n_terms, 6)
        |    END AS intercept,
        |  CASE WHEN n_terms * sxx - sx * sx > 0
        |      AND n_terms * syy - sy * sy > 0 THEN
        |    round((n_terms * sxy - sx * sy) * (n_terms * sxy - sx * sy)
        |      / ((n_terms * sxx - sx * sx)
        |        * (n_terms * syy - sy * sy)), 6) END AS r2
        |FROM a""".stripMargin,
    "q_tfidf_top" ->
      """WITH w AS (SELECT doc_id AS id,
        |  unnest(list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |         x -> x <> '')) AS token
        |  FROM documents),
        |n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS nd FROM documents),
        |dfreq AS (SELECT token, count(DISTINCT id) AS df FROM w GROUP BY token),
        |tf AS (SELECT id, token, count(*) AS tf FROM w WHERE id < 50 GROUP BY id, token),
        |scored AS (SELECT tf.id, tf.token,
        |  tf.tf * (ln((1.0 + n.nd) / (1.0 + dfreq.df)) + 1.0) AS tfidf
        |  FROM tf JOIN dfreq USING (token), n),
        |r AS (SELECT id, token, tfidf,
        |  CAST(row_number() OVER (PARTITION BY id ORDER BY tfidf DESC, token ASC)
        |       AS BIGINT) AS rank FROM scored)
        |SELECT id, rank, token, round(tfidf, 6) AS tfidf_r
        |FROM r WHERE rank <= 3 ORDER BY id, rank""".stripMargin,
    "q_jaccard_exact" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |              x -> x <> '') AS w
        |  FROM documents WHERE doc_id < 16),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(w) = 0 THEN []
        |       WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |       ELSE list_distinct(list_transform(range(1, len(w) - 1),
        |              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
        |  END AS s FROM t)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CASE
        |    WHEN len(a.s) = 0 AND len(b.s) = 0 THEN 1.0
        |    WHEN len(a.s) = 0 OR len(b.s) = 0 THEN 0.0
        |    ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |         / len(list_distinct(list_concat(a.s, b.s)))
        |  END, 6) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |ORDER BY id_a, id_b""".stripMargin,
    "q_image_resize" ->
      """SELECT doc_id,
        |  CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        |  round(CAST((doc_id * 7) % 256 AS DOUBLE) / 255.0, 5) AS luma_mean
        |FROM documents WHERE doc_id < 64 ORDER BY doc_id""".stripMargin,
    "q_embedding_centroids" ->
      """WITH e AS (SELECT d.lang, g.pos AS pos,
        |    CAST(em.embedding[g.pos + 1] AS DOUBLE) AS v
        |  FROM embeddings em
        |  JOIN documents d ON em.vec_id = d.doc_id,
        |  generate_series(0, 63) AS g(pos))
        |SELECT lang, CAST(pos AS BIGINT) AS dim,
        |  round(avg(v), 6) AS centroid
        |FROM e GROUP BY lang, pos ORDER BY lang, dim""".stripMargin,
    // Replays PQ encode + ADC scoring over the quantized vectors: the
    // same per-subspace integer squared distances, argmin with
    // first-index tie-break (row_number over (d2, c)), and the LUT sum
    // for the query vector.
    "q_ann_pq_fixed" ->
      """WITH e AS (SELECT vec_id, g.pos AS pos,
        |    CAST(embedding[g.pos + 1] AS DOUBLE) AS v
        |  FROM embeddings, generate_series(0, 63) AS g(pos)),
        |s AS (SELECT pos, max(abs(v)) AS s FROM e GROUP BY pos),
        |q AS (SELECT e.vec_id, e.pos,
        |    CAST(round(e.v / s.s * 127.0) AS BIGINT) AS qv
        |  FROM e JOIN s ON e.pos = s.pos),
        |dist AS (SELECT a.vec_id, a.pos // 8 AS sub, b.vec_id AS c,
        |    CAST(sum((a.qv - b.qv) * (a.qv - b.qv)) AS DOUBLE) AS d2
        |  FROM q a JOIN q b ON b.vec_id < 16 AND a.pos = b.pos
        |  GROUP BY a.vec_id, a.pos // 8, b.vec_id),
        |enc AS (SELECT vec_id, sub, c, d2,
        |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, c)
        |      AS rk FROM dist),
        |code AS (SELECT vec_id, sub, c FROM enc WHERE rk = 1),
        |lut AS (SELECT sub, c, d2 FROM dist WHERE vec_id = 0),
        |adc AS (SELECT code.vec_id, round(sum(lut.d2), 6) AS pq_dist
        |  FROM code JOIN lut ON code.sub = lut.sub AND code.c = lut.c
        |  GROUP BY code.vec_id)
        |SELECT vec_id, pq_dist FROM adc
        |ORDER BY pq_dist, vec_id LIMIT 10""".stripMargin,
    "q_embedding_quantize" ->
      """WITH e AS (SELECT vec_id, g.pos AS pos,
        |    CAST(embedding[g.pos + 1] AS DOUBLE) AS v
        |  FROM embeddings, generate_series(0, 63) AS g(pos)),
        |s AS (SELECT pos, max(abs(v)) AS s FROM e GROUP BY pos)
        |SELECT e.vec_id, CAST(e.pos AS BIGINT) AS dim,
        |  CAST(round(e.v / s.s * 127.0) AS BIGINT) AS q
        |FROM e JOIN s ON e.pos = s.pos
        |WHERE e.vec_id < 100
        |ORDER BY e.vec_id, dim""".stripMargin,
    "q_audio_features" ->
      """SELECT doc_id,
        |  CAST(8000 AS DOUBLE) AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(1000 + (doc_id % 10) * 100 AS BIGINT) AS n_frames,
        |  round(CAST(1000 + (doc_id % 10) * 100 AS DOUBLE) / 8000.0, 6) AS duration_s,
        |  round(CAST((doc_id * 37) % 16384 AS DOUBLE) / 32768.0, 6) AS rms
        |FROM documents WHERE doc_id < 64 ORDER BY doc_id""".stripMargin,
    "q_frame_sample" ->
      """SELECT d.doc_id, CAST(t.k AS BIGINT) AS frame_index,
        |  CAST(16 + d.doc_id % 16 AS BIGINT) AS width,
        |  round(CAST((d.doc_id * 7 + t.k * 11) % 256 AS DOUBLE) / 255.0, 5) AS luma_mean
        |FROM documents d, generate_series(0, 8, 2) AS t(k)
        |WHERE d.doc_id < 48 AND t.k < 4 + d.doc_id % 5
        |ORDER BY d.doc_id, frame_index""".stripMargin,
    "q_image_decode" ->
      """SELECT doc_id,
        |  CAST(16 + doc_id % 32 AS BIGINT) AS width,
        |  CAST(16 + doc_id % 16 AS BIGINT) AS height,
        |  'png' AS format,
        |  round(CAST((doc_id * 7) % 256 AS DOUBLE) / 255.0, 5) AS luma_mean
        |FROM documents WHERE doc_id < 64 ORDER BY doc_id""".stripMargin,
    // Constant-gray payloads make every feature a closed form of doc_id:
    // all channel/luma means are gray/255, std is 0, aspect is w/(w+h).
    "q_multimodal_features" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
        |    ELSE 'empty' END AS format,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 16 + doc_id % 32
        |    WHEN 1 THEN 16 + doc_id % 16 ELSE 0 END AS BIGINT) AS width,
        |  CAST(CASE doc_id % 3 WHEN 2 THEN 0
        |    ELSE 16 + doc_id % 16 END AS BIGINT) AS height,
        |  round(CASE WHEN doc_id % 3 = 2 THEN 0.0
        |    ELSE CAST((doc_id * 7) % 256 AS DOUBLE) / 255.0 END, 5) AS mean_r,
        |  round(CASE WHEN doc_id % 3 = 2 THEN 0.0
        |    ELSE CAST((doc_id * 7) % 256 AS DOUBLE) / 255.0 END, 5) AS mean_g,
        |  round(CASE WHEN doc_id % 3 = 2 THEN 0.0
        |    ELSE CAST((doc_id * 7) % 256 AS DOUBLE) / 255.0 END, 5) AS mean_b,
        |  round(CASE WHEN doc_id % 3 = 2 THEN 0.0
        |    ELSE CAST((doc_id * 7) % 256 AS DOUBLE) / 255.0 END, 5) AS luma_mean,
        |  0.0 AS luma_std,
        |  round(CASE WHEN doc_id % 3 = 2 THEN 0.0
        |    ELSE CAST((doc_id * 7) % 256 AS DOUBLE) / 255.0 END, 5) AS luma_min,
        |  round(CASE WHEN doc_id % 3 = 2 THEN 0.0
        |    ELSE CAST((doc_id * 7) % 256 AS DOUBLE) / 255.0 END, 5) AS luma_max,
        |  round(CASE doc_id % 3
        |    WHEN 0 THEN CAST(16 + doc_id % 32 AS DOUBLE)
        |      / (32 + doc_id % 32 + doc_id % 16)
        |    WHEN 1 THEN 0.5 ELSE 0.0 END, 5) AS aspect
        |FROM documents WHERE doc_id < 120 ORDER BY doc_id""".stripMargin,
    "q_media_meta" ->
      """SELECT doc_id,
        |  CAST(coalesce(octet_length(encode(text)), 0) AS BIGINT) AS n_bytes,
        |  CASE WHEN text IS NULL OR octet_length(encode(text)) = 0
        |       THEN 'empty' ELSE 'raw' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_qq_plot" ->
      """WITH c AS (SELECT count(l_extendedprice) AS n FROM lineitem
        |           WHERE l_extendedprice IS NOT NULL),
        |t AS (SELECT DISTINCT greatest(1, (j * n) // 100) AS r, n
        |      FROM generate_series(1, 100) g(j), c),
        |o AS (SELECT l_extendedprice AS v,
        |        row_number() OVER (ORDER BY l_extendedprice) AS rn
        |      FROM lineitem WHERE l_extendedprice IS NOT NULL)
        |SELECT CAST(t.r AS BIGINT) AS rank,
        |  round(0.0 + 1000.0 * (-ln(1.0 - ((t.r - 0.375) / (t.n + 0.25)))), 6)
        |    AS theoretical_quantile,
        |  o.v AS sample_quantile
        |FROM t JOIN o ON o.rn = t.r ORDER BY rank""".stripMargin,
    "q_pp_plot" ->
      """WITH c AS (SELECT count(l_extendedprice) AS n FROM lineitem
        |           WHERE l_extendedprice IS NOT NULL),
        |t AS (SELECT DISTINCT greatest(1, (j * n) // 100) AS r, n
        |      FROM generate_series(1, 100) g(j), c),
        |o AS (SELECT l_extendedprice AS v,
        |        row_number() OVER (ORDER BY l_extendedprice) AS rn
        |      FROM lineitem WHERE l_extendedprice IS NOT NULL)
        |SELECT CAST(t.r AS BIGINT) AS rank,
        |  (t.r - 0.5) / t.n AS empirical_cdf,
        |  round(CASE WHEN ((o.v - 0.0) / 1000.0) <= 0 THEN 0.0
        |        ELSE 1.0 - exp(-((o.v - 0.0) / 1000.0)) END, 6) AS model_cdf
        |FROM t JOIN o ON o.rn = t.r ORDER BY rank""".stripMargin,
    "q_stats" ->
      """WITH mu AS (SELECT avg(l_extendedprice) AS m, min(l_extendedprice) AS mn,
        |  max(l_extendedprice) AS mx, count(l_extendedprice) AS cnt FROM lineitem),
        |mom AS (SELECT avg(power(l_extendedprice - mu.m, 2)) AS m2,
        |  avg(power(l_extendedprice - mu.m, 3)) AS m3,
        |  avg(power(l_extendedprice - mu.m, 4)) AS m4 FROM lineitem, mu)
        |SELECT mu.mn AS mn, mu.mx AS mx, mu.cnt AS cnt, round(mu.m, 4) AS mean,
        |  round(sqrt(mom.m2), 4) AS std,
        |  round(mom.m3 / power(mom.m2, 1.5), 6) AS skew,
        |  round(mom.m4 / power(mom.m2, 2) - 3, 6) AS kurt
        |FROM mu, mom""".stripMargin,
    "q_hist" ->
      """WITH b AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx FROM lineitem),
        |w AS (SELECT mn, ((mx + (mx - mn) * 1e-10) - mn) / 40 AS width FROM b)
        |SELECT least(greatest(CAST(floor((l_extendedprice - w.mn) / w.width) AS BIGINT), 0), 39) AS bin,
        |count(*) AS cnt
        |FROM lineitem, w GROUP BY 1 ORDER BY bin""".stripMargin,
    "q_hist_agg" ->
      """WITH b AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx FROM lineitem),
        |w AS (SELECT mn, ((mx + (mx - mn) * 1e-10) - mn) / 40 AS width FROM b)
        |SELECT least(greatest(CAST(floor((l_extendedprice - w.mn) / w.width) AS BIGINT), 0), 39) AS bin,
        |count(*) AS cnt
        |FROM lineitem, w GROUP BY 1 ORDER BY bin""".stripMargin,
    "q_pmf" ->
      """SELECT CAST(l_quantity AS BIGINT) AS k, count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY k""".stripMargin,
    "q_quantiles" ->
      """SELECT round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
        |round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
        |FROM lineitem""".stripMargin,
    "q_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 100""".stripMargin,
    "q_topk_per_group" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rk FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |    CAST(row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS BIGINT) AS rk
        |  FROM lineitem) t
        |WHERE rk <= 5 ORDER BY l_returnflag, rk""".stripMargin,
    "q_corr_pearson" ->
      """SELECT round(corr(l_extendedprice, l_quantity), 6) AS price_qty,
        |round(corr(l_extendedprice, l_discount), 6) AS price_disc,
        |round(corr(l_quantity, l_tax), 6) AS qty_tax
        |FROM lineitem""".stripMargin,
    "q_filter_count" ->
      """SELECT count(*) AS cnt FROM lineitem
        |WHERE l_discount >= 0.02 AND l_discount <= 0.08
        |AND l_tax < 0.05 AND l_extendedprice > 10000.0""".stripMargin,
    "q_distinct_flags" ->
      "SELECT DISTINCT l_returnflag FROM lineitem ORDER BY l_returnflag",
    "q_model_filter" ->
      """SELECT count(*) AS n_rows,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price,
        |  round(min(l_extendedprice), 2) AS mn,
        |  round(max(l_extendedprice), 2) AS mx
        |FROM lineitem
        |WHERE l_extendedprice >= 900.0 - 30000.0 * ln(1.0 - 0.05)
        |  AND l_extendedprice <= 900.0 - 30000.0 * ln(1.0 - 0.95)""".stripMargin,
    "q_doc_tokens" ->
      """SELECT doc_id, length(regexp_extract_all(text, '\S+')) AS n_tokens,
        |length(text) AS text_len FROM documents ORDER BY doc_id""".stripMargin,
    "q_doc_quality" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    length(regexp_extract_all(text, '\S+')) AS n_tokens,
        |    CASE WHEN length(regexp_extract_all(text, '\S+')) > 0
        |      THEN round(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / length(regexp_extract_all(text, '\S+')), 6)
        |      ELSE 0.0 END AS mean_token_len,
        |    CASE WHEN length(regexp_extract_all(lower(text), '[a-z]+')) > 0
        |      THEN round(CAST(length(list_distinct(regexp_extract_all(lower(text), '[a-z]+'))) AS DOUBLE) / length(regexp_extract_all(lower(text), '[a-z]+')), 6)
        |      ELSE 0.0 END AS type_token_ratio,
        |    CASE WHEN length(regexp_extract_all(lower(text), '[a-z]+')) > 0
        |      THEN round(CAST(length(list_filter(regexp_extract_all(lower(text), '[a-z]+'), w -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','at','by','it','be','this','that'], w))) AS DOUBLE) / length(regexp_extract_all(lower(text), '[a-z]+')), 6)
        |      ELSE 0.0 END AS stopword_ratio,
        |    CASE WHEN length(text) > 0
        |      THEN round(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text), 6)
        |      ELSE 0.0 END AS punct_ratio
        |  FROM documents)
        |SELECT doc_id, n_tokens, mean_token_len, type_token_ratio, stopword_ratio, punct_ratio,
        |  round(least(n_tokens / 50.0, 1.0) * 0.4 + type_token_ratio * 0.3 +
        |    (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2 +
        |    least(mean_token_len / 8.0, 1.0) * 0.1, 6) AS quality_score
        |FROM f ORDER BY doc_id""".stripMargin,
    "q_quality_by_length" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    length(regexp_extract_all(text, '\S+')) AS n_tokens,
        |    CASE WHEN length(regexp_extract_all(text, '\S+')) > 0
        |      THEN round(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / length(regexp_extract_all(text, '\S+')), 6)
        |      ELSE 0.0 END AS mean_token_len,
        |    CASE WHEN length(regexp_extract_all(lower(text), '[a-z]+')) > 0
        |      THEN round(CAST(length(list_distinct(regexp_extract_all(lower(text), '[a-z]+'))) AS DOUBLE) / length(regexp_extract_all(lower(text), '[a-z]+')), 6)
        |      ELSE 0.0 END AS type_token_ratio,
        |    CASE WHEN length(text) > 0
        |      THEN round(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text), 6)
        |      ELSE 0.0 END AS punct_ratio
        |  FROM documents),
        |q AS (
        |  SELECT CAST(floor(n_tokens / 100.0) AS BIGINT) AS len_bucket,
        |    round(least(n_tokens / 50.0, 1.0) * 0.4 + type_token_ratio * 0.3 +
        |      (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2 +
        |      least(mean_token_len / 8.0, 1.0) * 0.1, 6) AS quality_score
        |  FROM f)
        |SELECT len_bucket, count(*) AS n_docs,
        |  round(avg(quality_score), 6) AS avg_quality
        |FROM q GROUP BY len_bucket ORDER BY len_bucket""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS survivor_id,
        |count(*) AS n_copies FROM documents GROUP BY md5(text)
        |ORDER BY text_md5""".stripMargin,
    // Discrete per-group fits: geom on quantities, bernoulli on the
    // indicator; p and the closed-form AIC replay from avg/count alone.
    "q_grouped_fit_discrete" ->
      """WITH q AS (SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS x
        |    FROM lineitem WHERE l_quantity IS NOT NULL),
        |f AS (SELECT l_returnflag AS g,
        |    CASE WHEN l_quantity <= 25 THEN 1.0 ELSE 0.0 END AS x
        |  FROM lineitem WHERE l_quantity IS NOT NULL),
        |qs AS (SELECT g, count(*) AS n, avg(x) AS m,
        |    sum(lgamma(x + 1.0)) AS slg FROM q GROUP BY g),
        |fs AS (SELECT g, count(*) AS n, avg(x) AS m,
        |    sum(lgamma(x + 1.0)) AS slg FROM f GROUP BY g)
        |SELECT g AS l_returnflag, 'l_quantity' AS value_col,
        |  CAST(n AS BIGINT) AS n, 'geom' AS distribution,
        |  round(1.0 / m, 6) AS p1,
        |  round(2.0 - 2.0 * (n * ln(1.0 / m)
        |    + n * (m - 1.0) * ln(1.0 - 1.0 / m)), 2) AS aic_r
        |FROM qs
        |UNION ALL
        |SELECT g, 'l_quantity', CAST(n AS BIGINT), 'poisson',
        |  round(m, 6),
        |  round(2.0 - 2.0 * (n * m * ln(m) - n * m - slg), 2)
        |FROM qs
        |UNION ALL
        |SELECT g, 'qflag', CAST(n AS BIGINT), 'bernoulli',
        |  round(m, 6),
        |  round(2.0 - 2.0 * (n * (m * ln(m) + (1.0 - m) * ln(1.0 - m))), 2)
        |FROM fs
        |UNION ALL
        |SELECT g, 'qflag', CAST(n AS BIGINT), 'poisson',
        |  round(m, 6),
        |  round(2.0 - 2.0 * (n * m * ln(m) - n * m - slg), 2)
        |FROM fs
        |ORDER BY l_returnflag, value_col, distribution""".stripMargin,
    // Per-group sufficient-statistic fits: params, loglik, AIC, and the
    // per-group best pick are all closed forms of groupwise aggregates.
    "q_grouped_fit" ->
      ("""WITH s AS (SELECT l_returnflag AS g, count(*) AS n,
        |    avg(l_extendedprice) AS m, var_pop(l_extendedprice) AS s2,
        |    min(l_extendedprice) AS mn, max(l_extendedprice) AS mx,
        |    avg(ln(l_extendedprice)) FILTER (WHERE l_extendedprice > 0)
        |      AS mln,
        |    var_pop(ln(l_extendedprice)) FILTER (WHERE l_extendedprice > 0)
        |      AS s2ln,
        |    sum(l_extendedprice * l_extendedprice) AS sxx
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |  GROUP BY l_returnflag),
        |""".stripMargin + groupedFitOracleArms("g") + """,
        |best AS (SELECT g, distribution AS best_family,
        |    row_number() OVER (PARTITION BY g
        |      ORDER BY 2.0 * k - 2.0 * ll ASC, distribution ASC) AS rk
        |  FROM fits)
        |SELECT f.g AS l_returnflag, CAST(f.n AS BIGINT) AS n,
        |  f.distribution, round(f.p1, 4) AS p1, round(f.p2, 4) AS p2,
        |  round(f.p3, 4) AS p3, round(2.0 * f.k - 2.0 * f.ll, 2) AS aic_r,
        |  b.best_family
        |FROM fits f JOIN (SELECT g, best_family FROM best WHERE rk = 1) b
        |  ON f.g = b.g
        |ORDER BY l_returnflag, distribution""".stripMargin),
    // Per-group K-S GOF: distinct-value ECDF vs each family's closed-form
    // CDF (z = (x-loc)/scale, support clamps matching the cdf wrapper),
    // D via a per-(group, family) cumulative window, p via the same
    // 100-term Kolmogorov series the drift path replays.
    "q_grouped_fit_gof" ->
      (groupedGofOraclePrefix + """,
        |d AS (SELECT g, distribution, CAST(max(n) AS BIGINT) AS n,
        |    max(greatest(abs(cum / n - cdf), abs((cum - c) / n - cdf)))
        |      AS ks_d,
        |    -max(n) - sum(c * (2.0 * cum - c) * ln(fc)
        |      + c * (2.0 * (n - cum) + c) * ln(1.0 - fc)) / max(n) AS ad_a2
        |  FROM cw GROUP BY g, distribution),
        |k AS (SELECT g, distribution, n, ks_d, ad_a2,
        |    sqrt(CAST(n AS DOUBLE)) * ks_d AS tt FROM d)
        |SELECT k.g AS l_returnflag, k.distribution,
        |  round(k.ks_d, 6) AS ks_d,
        |  round(least(1.0, greatest(0.0,
        |    (SELECT sum(2 * power(-1.0, gs.j + 1)
        |       * exp(-2 * gs.j * gs.j * k.tt * k.tt))
        |     FROM generate_series(1, 100) AS gs(j)))), 6) AS ks_p,
        |  round(k.ad_a2, 4) AS ad_a2,
        |  k.n
        |FROM k ORDER BY l_returnflag, distribution""".stripMargin),
    // The sketch-probe GOF audit: exact D replay + the within-bound
    // boolean (the sketch estimate itself is never hashed — KLL
    // compaction is randomized; only the error CONTRACT is pinned).
    "q_grouped_fit_gof_sketch" ->
      (groupedGofOraclePrefix + """
        |SELECT g AS l_returnflag, distribution, TRUE AS within_tol,
        |  round(max(greatest(abs(cum / n - cdf), abs((cum - c) / n - cdf))), 6)
        |    AS ks_d,
        |  CAST(max(n) AS BIGINT) AS n
        |FROM cw GROUP BY g, distribution
        |ORDER BY l_returnflag, distribution""".stripMargin),
    // Frequency-weighted grouped fit: the same seven closed forms over
    // weighted sufficient statistics, n = sum(w), sum(w*x) shapes.
    // Weighted grouped fit: the weighted sufficient statistics are
    // renamed to the shared arms' vocabulary (n = Σw, s2/mln/s2ln from
    // weighted moments, sxx = Σw·x²) so the SAME fits CTE applies — the
    // weighted MLE of these families IS the replicated-sample MLE.
    "q_grouped_fit_weighted" ->
      ("""WITH r AS (SELECT l_returnflag AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS x,
        |    CAST(l_quantity AS DOUBLE) AS w
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        |    AND l_quantity > 0),
        |w0 AS (SELECT g, sum(w) AS sw, sum(w * x) AS swx,
        |    sum(w * x * x) AS swxx, min(x) AS mn, max(x) AS mx,
        |    sum(w * ln(x)) FILTER (WHERE x > 0) AS swln,
        |    sum(w * ln(x) * ln(x)) FILTER (WHERE x > 0) AS swln2
        |  FROM r GROUP BY g),
        |s AS (SELECT g, sw AS n, swx / sw AS m,
        |    swxx / sw - (swx / sw) * (swx / sw) AS s2, mn, mx,
        |    swln / sw AS mln,
        |    swln2 / sw - (swln / sw) * (swln / sw) AS s2ln, swxx AS sxx
        |  FROM w0),
        |""".stripMargin + groupedFitOracleArms("g") + """
        |SELECT g AS l_returnflag, round(n, 4) AS n_w, distribution,
        |  round(p1, 4) AS p1, round(p2, 4) AS p2, round(p3, 4) AS p3,
        |  round(2.0 * k - 2.0 * ll, 2) AS aic_r
        |FROM fits ORDER BY l_returnflag, distribution""".stripMargin),
    // Discrete per-group GOF: distinct-k ECDF vs model CDF (geom closed
    // form; poisson as its pmf partial sum — equal to the engine's
    // regularized gamma far below the 6-decimal rounding), same cum
    // window and Kolmogorov series as the continuous oracle.
    "q_grouped_fit_gof_discrete" ->
      """WITH q AS (SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS x
        |    FROM lineitem WHERE l_quantity IS NOT NULL),
        |s AS (SELECT g, count(*) AS n, avg(x) AS m, min(x) AS mn,
        |    sum(CASE WHEN x <> floor(x) THEN 1 ELSE 0 END) AS nonint
        |  FROM q GROUP BY g),
        |fits AS (
        |  SELECT g, n, 'geom' AS distribution, 1.0 / m AS p1
        |  FROM s WHERE n >= 2 AND nonint = 0 AND mn >= 1 AND m > 1
        |  UNION ALL SELECT g, n, 'poisson', m
        |  FROM s WHERE n >= 2 AND nonint = 0 AND mn >= 0 AND m > 0),
        |v AS (SELECT g, x, count(*) AS c FROM q GROUP BY g, x),
        |ser AS (SELECT j FROM generate_series(0, 200) AS gs(j)),
        |pois AS (SELECT f.g, v.x,
        |    sum(exp(ser.j * ln(f.p1) - f.p1 - lgamma(ser.j + 1.0))) AS pc
        |  FROM v JOIN fits f ON v.g = f.g AND f.distribution = 'poisson'
        |  JOIN ser ON ser.j <= v.x
        |  GROUP BY f.g, v.x),
        |j AS (SELECT f.g, f.distribution, f.n, v.x, v.c,
        |    CASE f.distribution
        |      WHEN 'geom' THEN CASE WHEN v.x < 1 THEN 0.0
        |        ELSE 1.0 - power(1.0 - f.p1, v.x) END
        |      WHEN 'poisson' THEN CASE WHEN v.x < 0 THEN 0.0
        |        ELSE least(1.0, p.pc) END
        |    END AS cdf
        |  FROM v JOIN fits f ON v.g = f.g
        |  LEFT JOIN pois p ON p.g = f.g AND p.x = v.x
        |    AND f.distribution = 'poisson'),
        |cw AS (SELECT g, distribution, n, c, cdf,
        |    sum(c) OVER (PARTITION BY g, distribution ORDER BY x) AS cum
        |  FROM j),
        |d AS (SELECT g, distribution, CAST(max(n) AS BIGINT) AS n,
        |    max(greatest(abs(cum / n - cdf), abs((cum - c) / n - cdf)))
        |      AS ks_d
        |  FROM cw GROUP BY g, distribution),
        |k AS (SELECT g, distribution, n, ks_d,
        |    sqrt(CAST(n AS DOUBLE)) * ks_d AS tt FROM d)
        |SELECT k.g AS l_returnflag, k.distribution,
        |  round(k.ks_d, 6) AS ks_d,
        |  round(least(1.0, greatest(0.0,
        |    (SELECT sum(2 * power(-1.0, gs.j + 1)
        |       * exp(-2 * gs.j * gs.j * k.tt * k.tt))
        |     FROM generate_series(1, 100) AS gs(j)))), 6) AS ks_p,
        |  k.n
        |FROM k ORDER BY l_returnflag, distribution""".stripMargin,
    // Grouped-fit → generation: best-of-subset by AIC per group, then
    // each family's closed-form ppf on the fixed quantile grid.
    "q_grouped_generate" ->
      """WITH s AS (SELECT l_returnflag AS g, count(*) AS n,
        |    avg(l_extendedprice) AS m,
        |    min(l_extendedprice) AS mn, max(l_extendedprice) AS mx,
        |    avg(ln(l_extendedprice)) FILTER (WHERE l_extendedprice > 0)
        |      AS mln,
        |    sum(l_extendedprice * l_extendedprice) AS sxx
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |  GROUP BY l_returnflag),
        |fits AS (
        |  SELECT g, n, 'expon' AS distribution, mn AS loc, m - mn AS sc,
        |    0.0 AS b, -n * ln(m - mn) - n AS ll, 2 AS k
        |  FROM s WHERE n >= 2 AND m - mn > 0
        |  UNION ALL SELECT g, n, 'uniform', mn, mx - mn, 0.0,
        |    -n * ln(mx - mn), 2 FROM s WHERE n >= 2 AND mx - mn > 0
        |  UNION ALL SELECT g, n, 'rayleigh', 0.0, sqrt(sxx / (2.0 * n)),
        |    0.0, n * mln - n * ln(sxx / (2.0 * n)) - n, 1
        |  FROM s WHERE n >= 2 AND mn > 0
        |  UNION ALL SELECT g, n, 'pareto', 0.0, mn,
        |    1.0 / (mln - ln(mn)),
        |    n * ln(1.0 / (mln - ln(mn)))
        |      + n * (1.0 / (mln - ln(mn))) * ln(mn)
        |      - (1.0 / (mln - ln(mn)) + 1.0) * n * mln, 2
        |  FROM s WHERE n >= 2 AND mn > 0 AND mln > ln(mn)),
        |best AS (SELECT *, row_number() OVER (PARTITION BY g
        |    ORDER BY 2.0 * k - 2.0 * ll ASC, distribution ASC) AS rk
        |  FROM fits),
        |grid AS (SELECT b.g, b.distribution, b.loc, b.sc, b.b, q.q
        |  FROM (SELECT * FROM best WHERE rk = 1) b
        |  CROSS JOIN (SELECT unnest([CAST(0.05 AS DOUBLE),
        |    CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
        |    CAST(0.75 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS q) q)
        |SELECT g AS l_returnflag, distribution, q,
        |  round(CASE distribution
        |    WHEN 'expon' THEN loc + sc * (-ln(1.0 - q))
        |    WHEN 'uniform' THEN loc + sc * q
        |    WHEN 'rayleigh' THEN loc + sc * sqrt(-2.0 * ln(1.0 - q))
        |    WHEN 'pareto' THEN loc + sc * power(1.0 - q, -1.0 / b)
        |  END, 4) AS x_q
        |FROM grid ORDER BY l_returnflag, q""".stripMargin,
    "q_snapshot_diff" ->
      """WITH o AS (SELECT doc_id AS id, md5(coalesce(text, '')) AS h
        |    FROM documents WHERE doc_id < 400),
        |n AS (SELECT doc_id AS id,
        |    md5(coalesce(text, '') ||
        |      CASE WHEN doc_id % 7 = 0 THEN ' v2' ELSE '' END) AS h
        |  FROM documents WHERE doc_id >= 100)
        |SELECT coalesce(o.id, n.id) AS id,
        |  CASE WHEN o.id IS NULL THEN 'added'
        |       WHEN n.id IS NULL THEN 'removed'
        |       WHEN o.h <> n.h THEN 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.id = n.id
        |WHERE o.id IS NULL OR n.id IS NULL OR o.h <> n.h
        |ORDER BY id""".stripMargin,
    "q_dedup_clusters" ->
      """WITH RECURSIVE t AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |              x -> x <> '') AS w
        |  FROM documents WHERE doc_id < 300),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(w) = 0 THEN []
        |       WHEN len(w) < 4 THEN [array_to_string(w, ' ')]
        |       ELSE list_distinct(list_transform(range(1, len(w) - 2),
        |              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))
        |  END AS s FROM t),
        |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |ok AS (SELECT g FROM ex GROUP BY g HAVING count(*) BETWEEN 2 AND 100),
        |kept AS (SELECT ex.doc_id, ex.g FROM ex JOIN ok ON ex.g = ok.g),
        |pairs AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
        |  FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id),
        |edges AS (SELECT ia AS src, ib AS dst FROM pairs
        |  UNION ALL SELECT ib, ia FROM pairs),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM t
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id)
        |SELECT id AS doc_id, min(r) AS component
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    // NOTE: list_cosine_similarity returns float32 in DuckDB — explicit
    // double arithmetic over zipped unnest keeps both engines in doubles
    "q_ann_bruteforce" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |pairs AS (
        |  SELECT e.vec_id AS vid, CAST(unnest(e.embedding) AS DOUBLE) AS a,
        |         CAST(unnest(q.qe) AS DOUBLE) AS b
        |  FROM embeddings e, q),
        |agg AS (SELECT vid, sum(a*b) AS dp, sum(a*a) AS na, sum(b*b) AS nb
        |        FROM pairs GROUP BY vid)
        |SELECT vid AS vec_id, round(dp / (sqrt(na) * sqrt(nb)), 6) AS cosine
        |FROM agg ORDER BY cosine DESC, vec_id ASC LIMIT 20""".stripMargin,
    // LSH replay: the 8 hyperplanes regenerate from the same splitmix64
    // sequence (seed 42), signature dots fold strictly left-to-right so
    // every sign decision matches the JVM bit-for-bit, then multiprobe
    // (exact bucket + 1-bit flips) and the rounded-cosine ranking.
    "q_ann_lsh" ->
      """WITH pd0 AS (SELECT unnest(range(8)) AS p),
        |dd0 AS (SELECT unnest(range(64)) AS d),
        |p0 AS (SELECT p, d, CAST(42 + p * 1000003 + d AS HUGEINT) AS x
        |  FROM pd0 CROSS JOIN dd0),
        |pma AS (SELECT p, d, ((x) + 11400714819323198485) % 18446744073709551616 AS z0 FROM p0),
        |pmb AS (SELECT p, d, xor(z0, z0 >> 30) AS y0 FROM pma),
        |pmc AS (SELECT p, d, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM pmb),
        |pmd AS (SELECT p, d, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM pmc),
        |pme AS (SELECT p, d, xor(z2, z2 >> 31) AS h FROM pmd),
        |pl0 AS (SELECT p, d,
        |  CAST(CAST(CASE WHEN h >= 9223372036854775808 THEN h - 18446744073709551616 ELSE h END AS BIGINT)
        |    AS DOUBLE) / 9223372036854775807 AS hv FROM pme),
        |pl AS (SELECT p, list(hv ORDER BY d) AS pvec FROM pl0 GROUP BY p),
        |sigbits AS (SELECT e.vec_id, p.p,
        |  CASE WHEN list_reduce(list_prepend(0.0,
        |      list_transform(range(64),
        |        d -> CAST(e.embedding[d+1] AS DOUBLE) * p.pvec[d+1])),
        |      (a, b) -> a + b) > 0
        |    THEN CAST(1 AS BIGINT) << CAST(p.p AS INT) ELSE 0 END AS bit
        |  FROM embeddings e CROSS JOIN pl p),
        |bsig AS (SELECT vec_id, CAST(sum(bit) AS BIGINT) AS bucket
        |  FROM sigbits GROUP BY vec_id),
        |probes AS (SELECT DISTINCT pb FROM (
        |  SELECT bucket AS pb FROM bsig WHERE vec_id = 0
        |  UNION ALL
        |  SELECT xor(b.bucket, CAST(1 AS BIGINT) << CAST(t.b AS INT)) AS pb
        |  FROM bsig b CROSS JOIN (SELECT unnest(range(8)) AS b) t
        |  WHERE b.vec_id = 0)),
        |cand AS (SELECT b.vec_id FROM bsig b JOIN probes pr ON b.bucket = pr.pb),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |pairs AS (SELECT e.vec_id AS vid, CAST(unnest(e.embedding) AS DOUBLE) AS a,
        |    CAST(unnest(q.qe) AS DOUBLE) AS b
        |  FROM embeddings e JOIN cand c ON c.vec_id = e.vec_id, q),
        |agg AS (SELECT vid, sum(a*b) AS dp, sum(a*a) AS na, sum(b*b) AS nb
        |  FROM pairs GROUP BY vid)
        |SELECT vid AS vec_id, round(dp / (sqrt(na) * sqrt(nb)), 6) AS cosine
        |FROM agg ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin,
    // Same plane replay for the near-dup path, plus L2 normalization
    // (strict-fold norms) and half-even 6-decimal pair cosines.
    "q_embedding_near_dup" ->
      """WITH pd0 AS (SELECT unnest(range(8)) AS p),
        |dd0 AS (SELECT unnest(range(64)) AS d),
        |p0 AS (SELECT p, d, CAST(42 + p * 1000003 + d AS HUGEINT) AS x
        |  FROM pd0 CROSS JOIN dd0),
        |pma AS (SELECT p, d, ((x) + 11400714819323198485) % 18446744073709551616 AS z0 FROM p0),
        |pmb AS (SELECT p, d, xor(z0, z0 >> 30) AS y0 FROM pma),
        |pmc AS (SELECT p, d, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM pmb),
        |pmd AS (SELECT p, d, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM pmc),
        |pme AS (SELECT p, d, xor(z2, z2 >> 31) AS h FROM pmd),
        |pl0 AS (SELECT p, d,
        |  CAST(CAST(CASE WHEN h >= 9223372036854775808 THEN h - 18446744073709551616 ELSE h END AS BIGINT)
        |    AS DOUBLE) / 9223372036854775807 AS hv FROM pme),
        |pl AS (SELECT p, list(hv ORDER BY d) AS pvec FROM pl0 GROUP BY p),
        |sigbits AS (SELECT e.vec_id, p.p,
        |  CASE WHEN list_reduce(list_prepend(0.0,
        |      list_transform(range(64),
        |        d -> CAST(e.embedding[d+1] AS DOUBLE) * p.pvec[d+1])),
        |      (a, b) -> a + b) > 0
        |    THEN CAST(1 AS BIGINT) << CAST(p.p AS INT) ELSE 0 END AS bit
        |  FROM embeddings e CROSS JOIN pl p),
        |bsig AS (SELECT vec_id, CAST(sum(bit) AS BIGINT) AS bucket
        |  FROM sigbits GROUP BY vec_id),
        |nrm AS (SELECT e.vec_id, b.bucket,
        |  list_transform(range(64), d -> CAST(e.embedding[d+1] AS DOUBLE) /
        |    sqrt(list_reduce(list_prepend(0.0, list_transform(range(64),
        |      i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(e.embedding[i+1] AS DOUBLE))),
        |      (a, c) -> a + c))) AS ne
        |  FROM embeddings e JOIN bsig b ON b.vec_id = e.vec_id),
        |bu AS (SELECT bucket FROM nrm GROUP BY bucket
        |  HAVING count(*) BETWEEN 2 AND 2000),
        |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round_even(list_reduce(list_prepend(0.0, list_transform(range(64),
        |      d -> a.ne[d+1] * b.ne[d+1])), (x, y) -> x + y) * 1000000.0, 0)
        |      / 1000000.0 AS cosine
        |  FROM nrm a JOIN nrm b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |  JOIN bu ON bu.bucket = a.bucket)
        |SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,
    "q_ann_ivf_full" ->
      // identical to the brute-force oracle: full-probe IVF IS exhaustive
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |pairs AS (
        |  SELECT e.vec_id AS vid, CAST(unnest(e.embedding) AS DOUBLE) AS a,
        |         CAST(unnest(q.qe) AS DOUBLE) AS b
        |  FROM embeddings e, q),
        |agg AS (SELECT vid, sum(a*b) AS dp, sum(a*a) AS na, sum(b*b) AS nb
        |        FROM pairs GROUP BY vid)
        |SELECT vid AS vec_id, round(dp / (sqrt(na) * sqrt(nb)), 6) AS cosine
        |FROM agg ORDER BY cosine DESC, vec_id ASC LIMIT 20""".stripMargin,
    "q_dist_udf" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(1.0 - exp(-(l_extendedprice - 0.0) / 10000.0), 6) AS expon_cdf,
        |  round(CASE WHEN l_extendedprice >= 900.0 AND l_extendedprice <= 105000.0
        |        THEN 1.0 / 104100.0 ELSE 0.0 END, 9) AS unif_pdf,
        |  round((l_extendedprice - 900.0) / 104100.0, 6) AS unit_q
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 50""".stripMargin,
    // exhaustive-probe k-NN join IS per-query brute force: normalize,
    // all-pairs dot, rank per query with the same (cosine desc, c_id)
    // tie-break — rounding to 6 happens BEFORE ranking on both sides
    "q_knn_join_fixed" ->
      """WITH nrm AS (SELECT vec_id, list_transform(range(64), d ->
        |    CAST(embedding[d+1] AS DOUBLE) / sqrt(list_reduce(list_prepend(0.0,
        |      list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) *
        |        CAST(embedding[i+1] AS DOUBLE))), (a, c) -> a + c))) AS ne
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, ne AS qe FROM nrm WHERE vec_id < 20),
        |p AS (SELECT q.q_id, n.vec_id AS c_id,
        |    round_even(list_reduce(list_prepend(0.0, list_transform(range(64),
        |      d -> q.qe[d+1] * n.ne[d+1])), (x, y) -> x + y)
        |      * 1000000.0, 0) / 1000000.0 AS cosine
        |  FROM q CROSS JOIN nrm n),
        |r AS (SELECT q_id, c_id, cosine, row_number() OVER (PARTITION BY q_id
        |    ORDER BY cosine DESC, c_id) AS rk FROM p)
        |SELECT q_id, c_id, cosine, CAST(rk AS BIGINT) AS rank
        |FROM r WHERE rk <= 5 ORDER BY q_id, rank""".stripMargin,
    // Recall@5: both retrievals re-derived (the approx one candidates
    // only within the query's argmin cell; the exact one over all
    // vectors), then the per-query intersection.
    "q_ann_recall" ->
      """WITH nrm AS (SELECT vec_id, list_transform(range(64), d ->
        |    CAST(embedding[d+1] AS DOUBLE) / sqrt(list_reduce(list_prepend(0.0,
        |      list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) *
        |        CAST(embedding[i+1] AS DOUBLE))), (a, c) -> a + c))) AS ne
        |  FROM embeddings),
        |ctr AS (SELECT vec_id AS cid, ne AS ce FROM nrm WHERE vec_id < 8),
        |asg AS (SELECT n.vec_id, n.ne, c.cid,
        |    list_reduce(list_prepend(0.0, list_transform(range(64), j ->
        |      (n.ne[j+1] - c.ce[j+1]) * (n.ne[j+1] - c.ce[j+1]))),
        |      (a, b) -> a + b) AS dist
        |  FROM nrm n CROSS JOIN ctr c
        |  QUALIFY row_number() OVER (PARTITION BY n.vec_id
        |    ORDER BY dist, c.cid) = 1),
        |q AS (SELECT vec_id AS q_id, ne AS qe, cid AS qcell
        |  FROM asg WHERE vec_id < 20),
        |px AS (SELECT q.q_id, n.vec_id AS c_id,
        |    round_even(list_reduce(list_prepend(0.0, list_transform(range(64),
        |      d -> q.qe[d+1] * n.ne[d+1])), (x, y) -> x + y)
        |      * 1000000.0, 0) / 1000000.0 AS cosine
        |  FROM q CROSS JOIN nrm n),
        |rx AS (SELECT q_id, c_id FROM (SELECT q_id, c_id, row_number()
        |    OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rk
        |  FROM px) WHERE rk <= 5),
        |pa AS (SELECT q.q_id, a.vec_id AS c_id,
        |    round_even(list_reduce(list_prepend(0.0, list_transform(range(64),
        |      d -> q.qe[d+1] * a.ne[d+1])), (x, y) -> x + y)
        |      * 1000000.0, 0) / 1000000.0 AS cosine
        |  FROM q JOIN asg a ON a.cid = q.qcell),
        |ra AS (SELECT q_id, c_id FROM (SELECT q_id, c_id, row_number()
        |    OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rk
        |  FROM pa) WHERE rk <= 5),
        |h AS (SELECT ra.q_id, CAST(count(*) AS BIGINT) AS hits
        |  FROM ra JOIN rx ON ra.q_id = rx.q_id AND ra.c_id = rx.c_id
        |  GROUP BY ra.q_id),
        |kx AS (SELECT q_id, CAST(count(*) AS BIGINT) AS k_exact
        |  FROM rx GROUP BY q_id)
        |SELECT kx.q_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
        |  kx.k_exact,
        |  round(CAST(coalesce(h.hits, 0) AS DOUBLE) / kx.k_exact, 6)
        |    AS recall
        |FROM kx LEFT JOIN h ON kx.q_id = h.q_id
        |ORDER BY kx.q_id""".stripMargin,
    // SemDeDup with pinned centroids: normalize → argmin-assign (lowest
    // cid wins ties, mirroring the strict-< scan) → within-cell pairwise
    // dot, every step the same left-to-right double arithmetic
    "q_semdedup_fixed" ->
      """WITH nrm AS (SELECT vec_id, list_transform(range(64), d ->
        |    CAST(embedding[d+1] AS DOUBLE) / sqrt(list_reduce(list_prepend(0.0,
        |      list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) *
        |        CAST(embedding[i+1] AS DOUBLE))), (a, c) -> a + c))) AS ne
        |  FROM embeddings),
        |ctr AS (SELECT vec_id AS cid, ne AS ce FROM nrm WHERE vec_id < 8),
        |asg AS (SELECT n.vec_id, n.ne, c.cid,
        |    list_reduce(list_prepend(0.0, list_transform(range(64), j ->
        |      (n.ne[j+1] - c.ce[j+1]) * (n.ne[j+1] - c.ce[j+1]))),
        |      (a, b) -> a + b) AS dist
        |  FROM nrm n CROSS JOIN ctr c
        |  QUALIFY row_number() OVER (PARTITION BY n.vec_id
        |    ORDER BY dist, c.cid) = 1),
        |pairs AS (SELECT a.cid AS cell, a.vec_id AS id_a, b.vec_id AS id_b,
        |    round_even(list_reduce(list_prepend(0.0, list_transform(range(64),
        |      d -> a.ne[d+1] * b.ne[d+1])), (x, y) -> x + y)
        |      * 1000000.0, 0) / 1000000.0 AS cosine
        |  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id)
        |SELECT CAST(cell AS BIGINT) AS cell, id_a, id_b, cosine FROM pairs
        |WHERE cosine >= 0.3 ORDER BY id_a, id_b""".stripMargin,
    "q_embedding_near_dup_exact" ->
      """WITH p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    CAST(unnest(a.embedding) AS DOUBLE) AS x,
        |    CAST(unnest(b.embedding) AS DOUBLE) AS y
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
        |agg AS (SELECT id_a, id_b, sum(x*y) AS dp, sum(x*x) AS na, sum(y*y) AS nb
        |        FROM p GROUP BY id_a, id_b)
        |SELECT id_a, id_b, round(dp / (sqrt(na) * sqrt(nb)), 6) AS cosine
        |FROM agg WHERE round(dp / (sqrt(na) * sqrt(nb)), 6) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,
    "fit_closed_form" ->
      """WITH s AS (SELECT avg(l_extendedprice) AS m, min(l_extendedprice) AS mn,
        |  max(l_extendedprice) AS mx, stddev_pop(l_extendedprice) AS sd,
        |  count(l_extendedprice) AS n FROM lineitem),
        |ll AS (SELECT
        |  sum(-0.5 * pow((l.l_extendedprice - s.m) / s.sd, 2))
        |    - s.n * ln(s.sd) - s.n * 0.5 * ln(2 * pi()) AS ll_norm,
        |  sum(-(l.l_extendedprice - s.mn) / (s.m - s.mn))
        |    - s.n * ln(s.m - s.mn) AS ll_expon,
        |  -s.n * ln(s.mx - s.mn) AS ll_unif
        |  FROM lineitem l, s GROUP BY s.n, s.sd, s.m, s.mn, s.mx),
        |ranked AS (SELECT l_extendedprice AS x,
        |  CAST(row_number() OVER (ORDER BY l_extendedprice) AS DOUBLE) AS rn
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |ks AS (SELECT
        |  max(greatest(rn / s.n - (1.0 - exp(-(r.x - s.mn) / (s.m - s.mn))),
        |               (1.0 - exp(-(r.x - s.mn) / (s.m - s.mn))) - (rn - 1.0) / s.n))
        |    AS d_expon,
        |  max(greatest(rn / s.n - (r.x - s.mn) / (s.mx - s.mn),
        |               (r.x - s.mn) / (s.mx - s.mn) - (rn - 1.0) / s.n)) AS d_unif
        |  FROM ranked r, s GROUP BY s.n, s.m, s.mn, s.mx)
        |SELECT 'expon' AS distribution, round(mn, 4) AS p_loc,
        |  round(m - mn, 4) AS p_scale, round(4 - 2 * ll_expon, 2) AS aic_r,
        |  round(d_expon, 6) AS ks_r FROM s, ll, ks
        |UNION ALL SELECT 'norm', round(m, 4), round(sd, 4),
        |  round(4 - 2 * ll_norm, 2), -1.0 FROM s, ll, ks
        |UNION ALL SELECT 'uniform', round(mn, 4), round(mx - mn, 4),
        |  round(4 - 2 * ll_unif, 2), round(d_unif, 6) FROM s, ll, ks
        |ORDER BY 1""".stripMargin,
    "fit_doc_len_closed_form" ->
      """WITH s AS (SELECT avg(CAST(n_chars AS DOUBLE)) AS m,
        |  stddev_pop(CAST(n_chars AS DOUBLE)) AS sd, count(*) AS n
        |  FROM documents),
        |ll AS (SELECT sum(-0.5 * pow((CAST(d.n_chars AS DOUBLE) - s.m) / s.sd, 2))
        |    - s.n * ln(s.sd) - s.n * 0.5 * ln(2 * pi()) AS ll_norm
        |  FROM documents d, s GROUP BY s.n, s.sd)
        |SELECT 'norm' AS distribution, round(m, 4) AS p_loc,
        |  round(sd, 4) AS p_scale, round(4 - 2 * ll_norm, 2) AS aic_r
        |FROM s, ll""".stripMargin,
    "fit_serde_closed_form" ->
      """WITH s AS (SELECT avg(l_extendedprice) AS m, min(l_extendedprice) AS mn,
        |  max(l_extendedprice) AS mx, stddev_pop(l_extendedprice) AS sd,
        |  count(l_extendedprice) AS n FROM lineitem),
        |ll AS (SELECT
        |  sum(-0.5 * pow((l.l_extendedprice - s.m) / s.sd, 2))
        |    - s.n * ln(s.sd) - s.n * 0.5 * ln(2 * pi()) AS ll_norm,
        |  sum(-(l.l_extendedprice - s.mn) / (s.m - s.mn))
        |    - s.n * ln(s.m - s.mn) AS ll_expon,
        |  -s.n * ln(s.mx - s.mn) AS ll_unif
        |  FROM lineitem l, s GROUP BY s.n, s.sd, s.m, s.mn, s.mx)
        |SELECT 'expon' AS distribution, round(mn, 4) AS p_loc,
        |  round(m - mn, 4) AS p_scale, round(4 - 2 * ll_expon, 2) AS aic_r
        |FROM s, ll
        |UNION ALL SELECT 'norm', round(m, 4), round(sd, 4),
        |  round(4 - 2 * ll_norm, 2) FROM s, ll
        |UNION ALL SELECT 'uniform', round(mn, 4), round(mx - mn, 4),
        |  round(4 - 2 * ll_unif, 2) FROM s, ll
        |ORDER BY 1""".stripMargin,
    "q_adaptive_plan" ->
      """WITH sk AS (
        |  SELECT 'events.value' AS column_name, count(*) AS n_rows,
        |    (sum(pow(value - (SELECT avg(value) FROM events), 3)) / count(*))
        |      / pow(sum(pow(value - (SELECT avg(value) FROM events), 2))
        |            / count(*), 1.5) AS skew
        |  FROM events
        |  UNION ALL
        |  SELECT 'lineitem.l_extendedprice', count(*),
        |    (sum(pow(l_extendedprice
        |         - (SELECT avg(l_extendedprice) FROM lineitem), 3)) / count(*))
        |      / pow(sum(pow(l_extendedprice
        |         - (SELECT avg(l_extendedprice) FROM lineitem), 2))
        |            / count(*), 1.5)
        |  FROM lineitem)
        |SELECT column_name, n_rows, round(skew, 6) AS pilot_skew,
        |  CASE WHEN abs(skew) > 1.5 THEN 'stratified' ELSE 'uniform' END AS strategy,
        |  round(least(0.35, 1000000.0 / n_rows), 6) AS fraction
        |FROM sk ORDER BY column_name""".stripMargin,
    "fit_ad_closed_form" ->
      """WITH v AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |st AS (SELECT min(x) AS mn, max(x) AS mx, avg(x) AS mu,
        |  CAST(count(*) AS DOUBLE) AS n FROM v),
        |r AS (SELECT x, CAST(row_number() OVER (ORDER BY x) AS DOUBLE) AS rk FROM v),
        |c AS (SELECT rk, n,
        |  greatest(least(1.0 - exp(-(x - mn) / (mu - mn)), 1.0 - 1e-10), 1e-10) AS fe,
        |  greatest(least((x - mn) / (mx - mn), 1.0 - 1e-10), 1e-10) AS fu,
        |  greatest(least(1.0 - exp(-x / mu), 1.0 - 1e-10), 1e-10) AS fr
        | FROM r, st),
        |a AS (SELECT max(n) AS n,
        |  sum((2*rk - 1)*ln(fe) + (2*n + 1 - 2*rk)*ln(1.0 - fe)) AS se,
        |  sum((2*rk - 1)*ln(fu) + (2*n + 1 - 2*rk)*ln(1.0 - fu)) AS su,
        |  sum((2*rk - 1)*ln(fr) + (2*n + 1 - 2*rk)*ln(1.0 - fr)) AS sr
        | FROM c),
        |p AS (SELECT n, -n - se/n AS ae, -n - su/n AS au, -n - sr/n AS ar,
        |  1.0 + 0.6/n AS corr FROM a)
        |SELECT 'expon' AS distribution, round(ae, 4) AS ad_r,
        |  round(CASE WHEN ar < 0.922/corr THEN 0.25
        |    WHEN ar > 1.957/corr THEN 0.005
        |    WHEN ar <= 1.078/corr
        |      THEN 0.15 - (ar - 0.922/corr)/(1.078/corr - 0.922/corr)*0.05
        |    WHEN ar <= 1.341/corr
        |      THEN 0.10 - (ar - 1.078/corr)/(1.341/corr - 1.078/corr)*0.05
        |    WHEN ar <= 1.606/corr
        |      THEN 0.05 - (ar - 1.341/corr)/(1.606/corr - 1.341/corr)*0.025
        |    ELSE 0.025 - (ar - 1.606/corr)/(1.957/corr - 1.606/corr)*0.015
        |  END, 4) AS ad_p FROM p
        |UNION ALL SELECT 'uniform', round(au, 4), CAST(NULL AS DOUBLE) FROM p
        |ORDER BY 1""".stripMargin,
    "fit_closed_form_discrete" ->
      """WITH s AS (SELECT avg(CAST(l_quantity AS BIGINT)) AS m,
        |  min(CAST(l_quantity AS BIGINT)) AS mn,
        |  max(CAST(l_quantity AS BIGINT)) AS mx FROM lineitem)
        |SELECT 'geom' AS distribution, round(1.0 / m, 4) AS p1,
        |  CAST(NULL AS DOUBLE) AS p2 FROM s
        |UNION ALL SELECT 'planck', round(ln(1 + 1.0 / m), 4), NULL FROM s
        |UNION ALL SELECT 'poisson', round(m, 4), NULL FROM s
        |UNION ALL SELECT 'randint', round(CAST(mn AS DOUBLE), 4),
        |  round(CAST(mx AS DOUBLE) + 1.0, 4) FROM s
        |ORDER BY 1""".stripMargin,
    "fit_ks_discrete" ->
      """WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS x FROM lineitem),
        |st AS (SELECT avg(x) AS mu, CAST(min(x) AS DOUBLE) AS mn,
        |  CAST(max(x) AS DOUBLE) AS mx, CAST(count(*) AS DOUBLE) AS n FROM v),
        |g AS (SELECT x, CAST(count(*) AS DOUBLE) AS c FROM v GROUP BY x),
        |r AS (SELECT x, c, CAST(sum(c) OVER (ORDER BY x) AS DOUBLE) AS hi FROM g),
        |ks AS (SELECT unnest(range(0, CAST(mx AS BIGINT) + 1)) AS k FROM st),
        |pk AS (SELECT ks.k, exp(-st.mu + ks.k * ln(st.mu) - lgamma(ks.k + 1.0))
        |         AS pmf FROM ks, st),
        |pc AS (SELECT r.x, (SELECT sum(pmf) FROM pk WHERE pk.k <= r.x) AS fp FROM r),
        |d AS (SELECT r.x, r.hi / st.n AS ehi, (r.hi - r.c) / st.n AS elo,
        |  pc.fp AS f_poisson,
        |  1.0 - exp(r.x * ln(1.0 - 1.0 / st.mu)) AS f_geom,
        |  1.0 - exp(-ln(1.0 + 1.0 / st.mu) * (r.x + 1)) AS f_planck,
        |  CASE WHEN r.x >= st.mx THEN 1.0
        |       ELSE (r.x - st.mn + 1.0) / (st.mx + 1.0 - st.mn) END AS f_randint
        | FROM r JOIN pc ON r.x = pc.x, st)
        |SELECT 'geom' AS distribution,
        |  round(max(greatest(ehi - f_geom, f_geom - elo)), 6) AS ks_r FROM d
        |UNION ALL SELECT 'planck',
        |  round(max(greatest(ehi - f_planck, f_planck - elo)), 6) FROM d
        |UNION ALL SELECT 'poisson',
        |  round(max(greatest(ehi - f_poisson, f_poisson - elo)), 6) FROM d
        |UNION ALL SELECT 'randint',
        |  round(max(greatest(ehi - f_randint, f_randint - elo)), 6) FROM d
        |ORDER BY 1""".stripMargin,
    "fit_grouped_closed_form" ->
      """WITH s AS (SELECT l_returnflag AS grp, avg(l_extendedprice) AS m,
        |  min(l_extendedprice) AS mn, stddev_pop(l_extendedprice) AS sd,
        |  count(l_extendedprice) AS n FROM lineitem GROUP BY 1),
        |ll AS (SELECT l.l_returnflag AS grp,
        |  sum(-0.5 * pow((l.l_extendedprice - s.m) / s.sd, 2))
        |    - s.n * ln(s.sd) - s.n * 0.5 * ln(2 * pi()) AS ll_norm,
        |  sum(-(l.l_extendedprice - s.mn) / (s.m - s.mn))
        |    - s.n * ln(s.m - s.mn) AS ll_expon
        |  FROM lineitem l JOIN s ON l.l_returnflag = s.grp
        |  GROUP BY 1, s.n, s.sd, s.m, s.mn)
        |SELECT s.grp, 'expon' AS distribution, round(s.mn, 4) AS p_loc,
        |  round(s.m - s.mn, 4) AS p_scale, round(4 - 2 * ll.ll_expon, 2) AS aic_r
        |FROM s JOIN ll ON s.grp = ll.grp
        |UNION ALL SELECT s.grp, 'norm', round(s.m, 4), round(s.sd, 4),
        |  round(4 - 2 * ll.ll_norm, 2)
        |FROM s JOIN ll ON s.grp = ll.grp
        |ORDER BY 1, 2""".stripMargin,
    "fit_lazy_closed_form" ->
      """WITH s AS (SELECT avg(l_extendedprice) AS m, min(l_extendedprice) AS mn,
        |  max(l_extendedprice) AS mx, count(l_extendedprice) AS n FROM lineitem),
        |ranked AS (SELECT l_extendedprice AS x,
        |  CAST(row_number() OVER (ORDER BY l_extendedprice) AS DOUBLE) AS rn
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |ks AS (SELECT
        |  max(greatest(rn / s.n - (1.0 - exp(-(r.x - s.mn) / (s.m - s.mn))),
        |               (1.0 - exp(-(r.x - s.mn) / (s.m - s.mn))) - (rn - 1.0) / s.n))
        |    AS d_expon,
        |  max(greatest(rn / s.n - (r.x - s.mn) / (s.mx - s.mn),
        |               (r.x - s.mn) / (s.mx - s.mn) - (rn - 1.0) / s.n)) AS d_unif
        |  FROM ranked r, s GROUP BY s.n, s.m, s.mn, s.mx)
        |SELECT 'expon' AS distribution, round(d_expon, 6) AS ks_r FROM ks
        |UNION ALL SELECT 'norm', -1.0 FROM ks
        |UNION ALL SELECT 'uniform', round(d_unif, 6) FROM ks
        |ORDER BY 1""".stripMargin,
    // M11's router inputs replayed: numpy-linear p99 = quantile_cont,
    // population central moments, and the two threshold branches.
    "fit_heavy_tail_detector" ->
      """WITH t AS (
        |  SELECT 'plain' AS c, CAST(l_extendedprice AS DOUBLE) AS x
        |    FROM lineitem WHERE l_extendedprice IS NOT NULL
        |  UNION ALL SELECT 'heavy', pow(106000.0 - l_extendedprice, -2.0)
        |    FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |m AS (SELECT c, avg(x) AS mu, count(*) AS n, max(x) AS mx,
        |    quantile_cont(x, 0.99) AS p99 FROM t GROUP BY c),
        |k AS (SELECT t.c,
        |    (sum(pow(t.x - m.mu, 4)) / m.n)
        |      / pow(sum(pow(t.x - m.mu, 2)) / m.n, 2) - 3.0 AS kurt
        |  FROM t JOIN m ON t.c = m.c GROUP BY t.c, m.n, m.mu)
        |SELECT m.c AS column_name,
        |  (k.kurt > 6.0 OR m.mx / m.p99 > 3.0) AS heavy_tailed,
        |  round_even(m.mx / m.p99 * 1000000.0, 0) / 1000000.0
        |    AS extreme_ratio,
        |  round_even(k.kurt * 1000000.0, 0) / 1000000.0 AS kurtosis_r
        |FROM m JOIN k ON m.c = k.c ORDER BY column_name""".stripMargin,
    // bestLazy's DECISIONS replayed: rank all 10 (column, family) rows by
    // closed-form AIC, keep 3n+5 = 8, re-rank those by exact K-S, take 1.
    "fit_lazy_select_closed_form" ->
      """WITH vals AS (
        |  SELECT 'l_extendedprice' AS c, CAST(l_extendedprice AS DOUBLE) AS x
        |    FROM lineitem WHERE l_extendedprice IS NOT NULL
        |  UNION ALL SELECT 'l_quantity', CAST(l_quantity AS DOUBLE)
        |    FROM lineitem WHERE l_quantity IS NOT NULL
        |  UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE)
        |    FROM lineitem WHERE l_discount IS NOT NULL
        |  UNION ALL SELECT 'l_tax', CAST(l_tax AS DOUBLE)
        |    FROM lineitem WHERE l_tax IS NOT NULL
        |  UNION ALL SELECT 'l_orderkey', CAST(l_orderkey AS DOUBLE)
        |    FROM lineitem WHERE l_orderkey IS NOT NULL),
        |s AS (SELECT c, avg(x) AS m, min(x) AS mn, max(x) AS mx,
        |    count(*) AS n FROM vals GROUP BY c),
        |ll AS (SELECT v.c,
        |    sum(-(v.x - s.mn) / (s.m - s.mn)) - s.n * ln(s.m - s.mn) AS ll_e,
        |    -s.n * ln(s.mx - s.mn) AS ll_u
        |  FROM vals v JOIN s ON v.c = s.c
        |  GROUP BY v.c, s.n, s.m, s.mn, s.mx),
        |ranked AS (SELECT c, x,
        |    CAST(row_number() OVER (PARTITION BY c ORDER BY x) AS DOUBLE) AS rn
        |  FROM vals),
        |ks AS (SELECT r.c,
        |    max(greatest(rn / s.n - (1.0 - exp(-(r.x - s.mn) / (s.m - s.mn))),
        |      (1.0 - exp(-(r.x - s.mn) / (s.m - s.mn))) - (rn - 1.0) / s.n))
        |      AS d_e,
        |    max(greatest(rn / s.n - (r.x - s.mn) / (s.mx - s.mn),
        |      (r.x - s.mn) / (s.mx - s.mn) - (rn - 1.0) / s.n)) AS d_u
        |  FROM ranked r JOIN s ON r.c = s.c
        |  GROUP BY r.c, s.n, s.m, s.mn, s.mx),
        |cand AS (
        |  SELECT ll.c AS column_name, 'expon' AS distribution,
        |    4.0 - 2.0 * ll.ll_e AS aic, ks.d_e AS ks
        |  FROM ll JOIN ks ON ll.c = ks.c
        |  UNION ALL
        |  SELECT ll.c, 'uniform', 4.0 - 2.0 * ll.ll_u, ks.d_u
        |  FROM ll JOIN ks ON ll.c = ks.c),
        |pre AS (SELECT * FROM cand ORDER BY aic ASC LIMIT 8)
        |SELECT column_name, distribution, round(ks, 6) AS ks_r
        |FROM pre ORDER BY ks ASC, distribution ASC LIMIT 1""".stripMargin,
    "fit_bounded_closed_form" ->
      """WITH s AS (SELECT avg(l_extendedprice) AS m, min(l_extendedprice) AS mn,
        |  max(l_extendedprice) AS mx, count(l_extendedprice) AS n FROM lineitem),
        |msk AS (SELECT
        |  greatest(0.0, 1.0 - exp(-(105000.0 - mn) / (m - mn)))
        |    - greatest(0.0, 1.0 - exp(-(900.0 - mn) / (m - mn))) AS mass_e,
        |  least(1.0, greatest(0.0, (105000.0 - mn) / (mx - mn)))
        |    - least(1.0, greatest(0.0, (900.0 - mn) / (mx - mn))) AS mass_u,
        |  greatest(0.0, 1.0 - exp(-(900.0 - mn) / (m - mn))) AS flo_e,
        |  least(1.0, greatest(0.0, (900.0 - mn) / (mx - mn))) AS flo_u
        |  FROM s),
        |ll AS (SELECT
        |  sum(-(l.l_extendedprice - s.mn) / (s.m - s.mn))
        |    - s.n * ln(s.m - s.mn) - s.n * ln(k.mass_e) AS ll_e,
        |  -s.n * ln(s.mx - s.mn) - s.n * ln(k.mass_u) AS ll_u
        |  FROM lineitem l, s, msk k GROUP BY s.n, s.m, s.mn, s.mx, k.mass_e, k.mass_u),
        |ranked AS (SELECT l_extendedprice AS x,
        |  CAST(row_number() OVER (ORDER BY l_extendedprice) AS DOUBLE) AS rn
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |ks AS (SELECT
        |  max(greatest(
        |    rn / s.n - (greatest(0.0, 1.0 - exp(-(r.x - s.mn) / (s.m - s.mn))) - k.flo_e) / k.mass_e,
        |    (greatest(0.0, 1.0 - exp(-(r.x - s.mn) / (s.m - s.mn))) - k.flo_e) / k.mass_e - (rn - 1.0) / s.n))
        |    AS d_e,
        |  max(greatest(
        |    rn / s.n - (least(1.0, greatest(0.0, (r.x - s.mn) / (s.mx - s.mn))) - k.flo_u) / k.mass_u,
        |    (least(1.0, greatest(0.0, (r.x - s.mn) / (s.mx - s.mn))) - k.flo_u) / k.mass_u - (rn - 1.0) / s.n))
        |    AS d_u
        |  FROM ranked r, s, msk k GROUP BY s.n, s.m, s.mn, s.mx, k.flo_e, k.flo_u, k.mass_e, k.mass_u)
        |SELECT 'expon' AS distribution, round(mn, 4) AS p_loc,
        |  round(m - mn, 4) AS p_scale, round(4 - 2 * ll_e, 2) AS aic_r,
        |  round(d_e, 6) AS ks_r FROM s, ll, ks
        |UNION ALL SELECT 'uniform', round(mn, 4), round(mx - mn, 4),
        |  round(4 - 2 * ll_u, 2), round(d_u, 6) FROM s, ll, ks
        |ORDER BY 1""".stripMargin,
    "q_generate_grid" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  round(avg(10.0 + 70.0 * ((t.k + 0.5) / 100000.0)), 6) AS mean_s,
        |  round(min(10.0 + 70.0 * ((t.k + 0.5) / 100000.0)), 6) AS min_s,
        |  round(max(10.0 + 70.0 * ((t.k + 0.5) / 100000.0)), 6) AS max_s
        |FROM generate_series(0, 99999) AS t(k)""".stripMargin,
    "fit_mse_closed_form" ->
      """WITH s AS (SELECT min(l_extendedprice) AS mn,
        |  max(l_extendedprice) AS mx FROM lineitem)
        |SELECT 'uniform' AS distribution,
        |  round(mn - (mx - mn) / 1999.0, 4) AS p_loc,
        |  round((mx - mn) * 2001.0 / 1999.0, 4) AS p_scale
        |FROM s""".stripMargin,
    "fit_multi_closed_form" ->
      """SELECT c.column_name, 'norm' AS distribution,
        |  round(c.m, 4) AS p_loc, round(c.sd, 4) AS p_scale
        |FROM (
        |  SELECT 'l_quantity' AS column_name, avg(l_quantity) AS m,
        |    stddev_pop(l_quantity) AS sd FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', avg(l_extendedprice),
        |    stddev_pop(l_extendedprice) FROM lineitem
        |  UNION ALL SELECT 'l_discount', avg(l_discount),
        |    stddev_pop(l_discount) FROM lineitem) c
        |ORDER BY c.column_name""".stripMargin,
    "fit_censored_closed_form" ->
      """WITH c AS (SELECT LEAST(value, 75.0) AS t, value < 75.0 AS obs
        |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
        |m AS (SELECT min(t) FILTER (WHERE obs) AS l FROM c),
        |s AS (SELECT sum(c.t - m.l) /
        |        sum(CASE WHEN c.obs THEN 1 ELSE 0 END) AS sc FROM c, m)
        |SELECT 'expon' AS distribution,
        |  round(m.l, 4) AS p_loc, round(s.sc, 4) AS p_scale
        |FROM m, s""".stripMargin,
    "fit_closed_form_bernoulli" ->
      """SELECT 'bernoulli' AS distribution,
        |  round(avg(CASE WHEN CAST(l_quantity AS BIGINT) <= 25
        |            THEN 1.0 ELSE 0.0 END), 4) AS p1
        |FROM lineitem""".stripMargin,
    "fit_summary_closed_form" ->
      """WITH s AS (SELECT avg(l_extendedprice) AS m, min(l_extendedprice) AS mn,
        |  max(l_extendedprice) AS mx, stddev_pop(l_extendedprice) AS sd,
        |  count(l_extendedprice) AS n FROM lineitem),
        |ll AS (SELECT
        |  sum(-0.5 * pow((l.l_extendedprice - s.m) / s.sd, 2))
        |    - s.n * ln(s.sd) - s.n * 0.5 * ln(2 * pi()) AS ll_norm,
        |  sum(-(l.l_extendedprice - s.mn) / (s.m - s.mn))
        |    - s.n * ln(s.m - s.mn) AS ll_expon,
        |  -s.n * ln(s.mx - s.mn) AS ll_unif
        |  FROM lineitem l, s GROUP BY s.n, s.sd, s.m, s.mn, s.mx),
        |a AS (SELECT 4 - 2 * ll_norm AS aic_n, 4 - 2 * ll_expon AS aic_e,
        |  4 - 2 * ll_unif AS aic_u FROM ll)
        |SELECT CAST(3 AS BIGINT) AS n_results,
        |  round(least(aic_n, aic_e, aic_u), 2) AS min_aic_r,
        |  round((aic_n + aic_e + aic_u) / 3.0, 2) AS mean_aic_r,
        |  round(greatest(aic_n, aic_e, aic_u), 2) AS max_aic_r
        |FROM a""".stripMargin,
    "fit_acceptable_count" ->
      """WITH s AS (SELECT avg(l_extendedprice) AS m, min(l_extendedprice) AS mn,
        |  max(l_extendedprice) AS mx, count(l_extendedprice) AS n FROM lineitem),
        |ranked AS (SELECT l_extendedprice AS x,
        |  CAST(row_number() OVER (ORDER BY l_extendedprice) AS DOUBLE) AS rn
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |ks AS (SELECT
        |  max(greatest(rn / s.n - (1.0 - exp(-(r.x - s.mn) / (s.m - s.mn))),
        |               (1.0 - exp(-(r.x - s.mn) / (s.m - s.mn))) - (rn - 1.0) / s.n))
        |    AS d_expon,
        |  max(greatest(rn / s.n - (r.x - s.mn) / (s.mx - s.mn),
        |               (r.x - s.mn) / (s.mx - s.mn) - (rn - 1.0) / s.n)) AS d_unif
        |  FROM ranked r, s GROUP BY s.n, s.m, s.mn, s.mx)
        |SELECT CAST(CASE WHEN d_expon <= 0.05 THEN 1 ELSE 0 END
        |          + CASE WHEN d_unif  <= 0.05 THEN 1 ELSE 0 END AS BIGINT)
        |  AS n_acceptable FROM ks""".stripMargin,
    "fit_quality_report_closed_form" ->
      """WITH s AS (SELECT avg(l_extendedprice) AS m, min(l_extendedprice) AS mn,
        |  max(l_extendedprice) AS mx, count(l_extendedprice) AS n FROM lineitem),
        |ll AS (SELECT
        |  sum(-(l.l_extendedprice - s.mn) / (s.m - s.mn))
        |    - s.n * ln(s.m - s.mn) AS ll_expon,
        |  -s.n * ln(s.mx - s.mn) AS ll_unif
        |  FROM lineitem l, s GROUP BY s.n, s.m, s.mn, s.mx),
        |ranked AS (SELECT l_extendedprice AS x,
        |  CAST(row_number() OVER (ORDER BY l_extendedprice) AS DOUBLE) AS rn
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |ks AS (SELECT
        |  max(greatest(rn / s.n - (1.0 - exp(-(r.x - s.mn) / (s.m - s.mn))),
        |               (1.0 - exp(-(r.x - s.mn) / (s.m - s.mn))) - (rn - 1.0) / s.n))
        |    AS d_expon,
        |  max(greatest(rn / s.n - (r.x - s.mn) / (s.mx - s.mn),
        |               (r.x - s.mn) / (s.mx - s.mn) - (rn - 1.0) / s.n)) AS d_unif,
        |  max(s.n) AS nn FROM ranked r, s GROUP BY s.n, s.m, s.mn, s.mx)
        |SELECT 'l_extendedprice' AS column_name, CAST(2 AS BIGINT) AS n_fits,
        |  CAST(2 AS BIGINT) AS n_successful,
        |  CAST((CASE WHEN d_expon <= 0.1 AND
        |          2 * (exp(-2 * nn * d_expon * d_expon)
        |             - exp(-8 * nn * d_expon * d_expon)
        |             + exp(-18 * nn * d_expon * d_expon)) >= 0.05
        |        THEN 1 ELSE 0 END)
        |     + (CASE WHEN d_unif <= 0.1 AND
        |          2 * (exp(-2 * nn * d_unif * d_unif)
        |             - exp(-8 * nn * d_unif * d_unif)
        |             + exp(-18 * nn * d_unif * d_unif)) >= 0.05
        |        THEN 1 ELSE 0 END) AS BIGINT) AS n_acceptable,
        |  CASE WHEN (4 - 2 * ll_expon) <= (4 - 2 * ll_unif) THEN 'expon'
        |       ELSE 'uniform' END AS best_distribution,
        |  round(CASE WHEN (4 - 2 * ll_expon) <= (4 - 2 * ll_unif)
        |        THEN 4 - 2 * ll_expon ELSE 4 - 2 * ll_unif END, 2) AS best_aic_r
        |FROM s, ll, ks""".stripMargin,
    "fit_filter_metrics" ->
      """WITH s AS (SELECT avg(l_extendedprice) AS m, min(l_extendedprice) AS mn,
        |  max(l_extendedprice) AS mx, count(l_extendedprice) AS n FROM lineitem),
        |ranked AS (SELECT l_extendedprice AS x,
        |  CAST(row_number() OVER (ORDER BY l_extendedprice) AS DOUBLE) AS rn
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |ks AS (SELECT
        |  max(greatest(rn / s.n - (1.0 - exp(-(r.x - s.mn) / (s.m - s.mn))),
        |               (1.0 - exp(-(r.x - s.mn) / (s.m - s.mn))) - (rn - 1.0) / s.n))
        |    AS d_expon,
        |  max(greatest(rn / s.n - (r.x - s.mn) / (s.mx - s.mn),
        |               (r.x - s.mn) / (s.mx - s.mn) - (rn - 1.0) / s.n)) AS d_unif
        |  FROM ranked r, s GROUP BY s.n, s.m, s.mn, s.mx)
        |SELECT d.distribution, round(d.d, 6) AS ks_r
        |FROM (SELECT 'expon' AS distribution, d_expon AS d FROM ks
        |      UNION ALL SELECT 'uniform', d_unif FROM ks) d
        |WHERE d.d < 0.05 ORDER BY d.distribution""".stripMargin,
    "fit_best_closed_form" ->
      """WITH s AS (SELECT avg(l_extendedprice) AS m, min(l_extendedprice) AS mn,
        |  max(l_extendedprice) AS mx, stddev_pop(l_extendedprice) AS sd,
        |  count(l_extendedprice) AS n FROM lineitem),
        |ll AS (SELECT
        |  sum(-0.5 * pow((l.l_extendedprice - s.m) / s.sd, 2))
        |    - s.n * ln(s.sd) - s.n * 0.5 * ln(2 * pi()) AS ll_norm,
        |  sum(-(l.l_extendedprice - s.mn) / (s.m - s.mn))
        |    - s.n * ln(s.m - s.mn) AS ll_expon,
        |  -s.n * ln(s.mx - s.mn) AS ll_unif
        |  FROM lineitem l, s GROUP BY s.n, s.sd, s.m, s.mn, s.mx),
        |a AS (SELECT 'norm' AS distribution, 4 - 2 * ll_norm AS aic FROM ll
        |  UNION ALL SELECT 'expon', 4 - 2 * ll_expon FROM ll
        |  UNION ALL SELECT 'uniform', 4 - 2 * ll_unif FROM ll)
        |SELECT distribution, round(aic, 2) AS aic_r FROM a
        |ORDER BY aic ASC, distribution ASC LIMIT 1""".stripMargin,
    "q_fingerprint_md5" ->
      """SELECT doc_id,
        |  md5(regexp_replace(trim(coalesce(text, '')), '\s+', ' ', 'g')) AS fp_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Replays TextOps.fingerprint64 bit-for-bit: whitespace-collapse,
    // the 31·h+c polynomial over char codes, then the splitmix64
    // finalizer — all in mod-2^64 HUGEINT arithmetic. Each ·K multiply
    // is split into 32-bit halves (lo/hi of 0xbf58476d1ce4e5b9 and
    // 0x94d049bb133111eb) so no intermediate exceeds 128 bits, and the
    // unsigned result maps back to the signed BIGINT Spark emits.
    "q_fingerprint" ->
      """WITH n AS (SELECT doc_id, text IS NULL AS nul,
        |    regexp_replace(coalesce(text, ''), '\s+', ' ', 'g') AS s
        |  FROM documents),
        |p AS (SELECT doc_id, nul,
        |  CASE WHEN length(s) = 0 THEN CAST(1125899906842597 AS HUGEINT)
        |  ELSE list_reduce(
        |    list_prepend(CAST(1125899906842597 AS HUGEINT),
        |      list_transform(range(1, length(s) + 1),
        |        i -> CAST(unicode(substr(s, CAST(i AS INT), 1)) AS HUGEINT))),
        |    (acc, c) -> (31 * acc + c) % 18446744073709551616) END AS h
        |  FROM n),
        |x1 AS (SELECT doc_id, nul, xor(h, h >> 30) AS x FROM p),
        |z1 AS (SELECT doc_id, nul, ((x % 4294967296) * 484763065
        |  + (((x % 4294967296) * 3210233709 + (x >> 32) * 484763065)
        |     % 4294967296) * 4294967296) % 18446744073709551616 AS z FROM x1),
        |x2 AS (SELECT doc_id, nul, xor(z, z >> 27) AS x FROM z1),
        |z2 AS (SELECT doc_id, nul, ((x % 4294967296) * 321982955
        |  + (((x % 4294967296) * 2496678331 + (x >> 32) * 321982955)
        |     % 4294967296) * 4294967296) % 18446744073709551616 AS z FROM x2),
        |f AS (SELECT doc_id, nul, xor(z, z >> 31) AS zu FROM z2)
        |SELECT doc_id, CAST(CASE WHEN nul THEN 0
        |  WHEN zu >= 9223372036854775808 THEN zu - 18446744073709551616
        |  ELSE zu END AS BIGINT) AS fingerprint
        |FROM f ORDER BY doc_id""".stripMargin,
    // The next three oracles replay the ENTIRE MinHash+LSH pipeline in
    // SQL — shingling, FNV-1a + splitmix64 shingle hashes, the 128
    // multiply-shift permutation minima (signed-compare, like the JVM),
    // per-band mix64 bucket keys, the bucket-size cap, candidate
    // pairing, and slot-match Jaccard estimation — all in mod-2^64
    // HUGEINT arithmetic (64×64 multiplies split into 32-bit halves).
    // Machine-generated CTE chains; every constant mirrors Dedup.scala.
    "q_dedup_minhash" ->
      """WITH tok AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |      x -> x <> '') AS t FROM documents),
        |sh AS (SELECT doc_id, unnest(CASE WHEN len(t) = 0 THEN []
        |    WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(len(t) - 2),
        |      i -> array_to_string(t[i+1:i+3], ' ')) END) AS s FROM tok),
        |f0 AS (SELECT DISTINCT doc_id, s FROM sh),
        |f1 AS (SELECT doc_id, s, list_reduce(
        |    list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |      list_transform(range(1, length(s) + 1),
        |        i -> CAST(unicode(substr(s, CAST(i AS INT), 1)) AS HUGEINT))),
        |    (acc, c) -> (xor(acc, c) * 1099511628211) % 18446744073709551616) AS h0 FROM f0),
        |sma AS (SELECT doc_id, s, ((h0) + 11400714819323198485) % 18446744073709551616 AS z0 FROM f1),
        |smb AS (SELECT doc_id, s, xor(z0, z0 >> 30) AS y0 FROM sma),
        |smc AS (SELECT doc_id, s, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM smb),
        |smd AS (SELECT doc_id, s, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM smc),
        |sme AS (SELECT doc_id, s, xor(z2, z2 >> 31) AS h FROM smd),
        |hsh AS (SELECT doc_id, h AS h_u FROM sme),
        |cj0 AS (SELECT unnest(range(128)) AS j,
        |  (CAST(11562461410679940143 AS HUGEINT) + unnest(range(128))) AS xa,
        |  (CAST(16646288086500911323 AS HUGEINT) + unnest(range(128))) AS xb),
        |caa AS (SELECT j, ((xa) + 11400714819323198485) % 18446744073709551616 AS z0 FROM cj0),
        |cab AS (SELECT j, xor(z0, z0 >> 30) AS y0 FROM caa),
        |cac AS (SELECT j, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM cab),
        |cad AS (SELECT j, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM cac),
        |cae AS (SELECT j, xor(z2, z2 >> 31) AS h FROM cad),
        |cba AS (SELECT j, ((xb) + 11400714819323198485) % 18446744073709551616 AS z0 FROM cj0),
        |cbb AS (SELECT j, xor(z0, z0 >> 30) AS y0 FROM cba),
        |cbc AS (SELECT j, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM cbb),
        |cbd AS (SELECT j, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM cbc),
        |cbe AS (SELECT j, xor(z2, z2 >> 31) AS h FROM cbd),
        |coeff AS (SELECT a.j,
        |    a.h + CASE WHEN a.h % 2 = 0 THEN 1 ELSE 0 END AS a_u,
        |    b.h AS b_u
        |  FROM cae a JOIN cbe b USING (j)),
        |sl AS (SELECT doc_id, j, min(CAST(CASE WHEN v >= 9223372036854775808 THEN v - 18446744073709551616
        |      ELSE v END AS BIGINT)) AS slot
        |  FROM (SELECT doc_id, j, (((a_u % 4294967296) * (h_u % 4294967296) + (((a_u % 4294967296) * (h_u >> 32) + (a_u >> 32) * (h_u % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 + b_u) % 18446744073709551616 AS v FROM hsh CROSS JOIN coeff)
        |  GROUP BY doc_id, j),
        |sig AS (SELECT doc_id, list(slot ORDER BY j) AS sg FROM sl GROUP BY doc_id),
        |b0 AS (SELECT s.doc_id, b.band,
        |  xor(CAST(14695981039346656037 AS HUGEINT), CAST(b.band AS HUGEINT)) AS h
        |  FROM sig s CROSS JOIN (SELECT unnest(range(32)) AS band) b),
        |bj0 AS (SELECT p.doc_id, p.band,
        |  xor(p.h, CASE WHEN sl.slot < 0 THEN CAST(sl.slot AS HUGEINT) + 18446744073709551616
        |               ELSE CAST(sl.slot AS HUGEINT) END) AS x
        |  FROM b0 p JOIN sl ON sl.doc_id = p.doc_id AND sl.j = 4 * band + 0),
        |bm0a AS (SELECT doc_id, band, ((x) + 11400714819323198485) % 18446744073709551616 AS z0 FROM bj0),
        |bm0b AS (SELECT doc_id, band, xor(z0, z0 >> 30) AS y0 FROM bm0a),
        |bm0c AS (SELECT doc_id, band, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM bm0b),
        |bm0d AS (SELECT doc_id, band, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM bm0c),
        |bm0e AS (SELECT doc_id, band, xor(z2, z2 >> 31) AS h FROM bm0d),
        |bj1 AS (SELECT p.doc_id, p.band,
        |  xor(p.h, CASE WHEN sl.slot < 0 THEN CAST(sl.slot AS HUGEINT) + 18446744073709551616
        |               ELSE CAST(sl.slot AS HUGEINT) END) AS x
        |  FROM bm0e p JOIN sl ON sl.doc_id = p.doc_id AND sl.j = 4 * band + 1),
        |bm1a AS (SELECT doc_id, band, ((x) + 11400714819323198485) % 18446744073709551616 AS z0 FROM bj1),
        |bm1b AS (SELECT doc_id, band, xor(z0, z0 >> 30) AS y0 FROM bm1a),
        |bm1c AS (SELECT doc_id, band, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM bm1b),
        |bm1d AS (SELECT doc_id, band, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM bm1c),
        |bm1e AS (SELECT doc_id, band, xor(z2, z2 >> 31) AS h FROM bm1d),
        |bj2 AS (SELECT p.doc_id, p.band,
        |  xor(p.h, CASE WHEN sl.slot < 0 THEN CAST(sl.slot AS HUGEINT) + 18446744073709551616
        |               ELSE CAST(sl.slot AS HUGEINT) END) AS x
        |  FROM bm1e p JOIN sl ON sl.doc_id = p.doc_id AND sl.j = 4 * band + 2),
        |bm2a AS (SELECT doc_id, band, ((x) + 11400714819323198485) % 18446744073709551616 AS z0 FROM bj2),
        |bm2b AS (SELECT doc_id, band, xor(z0, z0 >> 30) AS y0 FROM bm2a),
        |bm2c AS (SELECT doc_id, band, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM bm2b),
        |bm2d AS (SELECT doc_id, band, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM bm2c),
        |bm2e AS (SELECT doc_id, band, xor(z2, z2 >> 31) AS h FROM bm2d),
        |bj3 AS (SELECT p.doc_id, p.band,
        |  xor(p.h, CASE WHEN sl.slot < 0 THEN CAST(sl.slot AS HUGEINT) + 18446744073709551616
        |               ELSE CAST(sl.slot AS HUGEINT) END) AS x
        |  FROM bm2e p JOIN sl ON sl.doc_id = p.doc_id AND sl.j = 4 * band + 3),
        |bm3a AS (SELECT doc_id, band, ((x) + 11400714819323198485) % 18446744073709551616 AS z0 FROM bj3),
        |bm3b AS (SELECT doc_id, band, xor(z0, z0 >> 30) AS y0 FROM bm3a),
        |bm3c AS (SELECT doc_id, band, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM bm3b),
        |bm3d AS (SELECT doc_id, band, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM bm3c),
        |bm3e AS (SELECT doc_id, band, xor(z2, z2 >> 31) AS h FROM bm3d),
        |bk AS (SELECT doc_id, band, h AS bkey FROM bm3e),
        |buckets AS (SELECT band, bkey, list(doc_id ORDER BY doc_id) AS members
        |  FROM bk GROUP BY band, bkey HAVING count(*) BETWEEN 2 AND 1000),
        |cand AS (SELECT DISTINCT m1.a AS id_a, m2.a AS id_b FROM (
        |    SELECT unnest(members) AS a, band, bkey FROM buckets) m1
        |  JOIN (SELECT unnest(members) AS a, band, bkey FROM buckets) m2
        |    ON m1.band = m2.band AND m1.bkey = m2.bkey AND m1.a < m2.a),
        |est AS (SELECT c.id_a, c.id_b,
        |    round(len(list_filter(range(128), k -> sa.sg[k+1] = sb.sg[k+1])) / 128.0,
        |      6) AS est_jaccard
        |  FROM cand c JOIN sig sa ON sa.doc_id = c.id_a
        |  JOIN sig sb ON sb.doc_id = c.id_b)
        |SELECT id_a, id_b, est_jaccard FROM est
        |WHERE est_jaccard >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_minhash_survivors" ->
      """WITH tok AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |      x -> x <> '') AS t FROM documents),
        |sh AS (SELECT doc_id, unnest(CASE WHEN len(t) = 0 THEN []
        |    WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(len(t) - 2),
        |      i -> array_to_string(t[i+1:i+3], ' ')) END) AS s FROM tok),
        |f0 AS (SELECT DISTINCT doc_id, s FROM sh),
        |f1 AS (SELECT doc_id, s, list_reduce(
        |    list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |      list_transform(range(1, length(s) + 1),
        |        i -> CAST(unicode(substr(s, CAST(i AS INT), 1)) AS HUGEINT))),
        |    (acc, c) -> (xor(acc, c) * 1099511628211) % 18446744073709551616) AS h0 FROM f0),
        |sma AS (SELECT doc_id, s, ((h0) + 11400714819323198485) % 18446744073709551616 AS z0 FROM f1),
        |smb AS (SELECT doc_id, s, xor(z0, z0 >> 30) AS y0 FROM sma),
        |smc AS (SELECT doc_id, s, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM smb),
        |smd AS (SELECT doc_id, s, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM smc),
        |sme AS (SELECT doc_id, s, xor(z2, z2 >> 31) AS h FROM smd),
        |hsh AS (SELECT doc_id, h AS h_u FROM sme),
        |cj0 AS (SELECT unnest(range(128)) AS j,
        |  (CAST(11562461410679940143 AS HUGEINT) + unnest(range(128))) AS xa,
        |  (CAST(16646288086500911323 AS HUGEINT) + unnest(range(128))) AS xb),
        |caa AS (SELECT j, ((xa) + 11400714819323198485) % 18446744073709551616 AS z0 FROM cj0),
        |cab AS (SELECT j, xor(z0, z0 >> 30) AS y0 FROM caa),
        |cac AS (SELECT j, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM cab),
        |cad AS (SELECT j, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM cac),
        |cae AS (SELECT j, xor(z2, z2 >> 31) AS h FROM cad),
        |cba AS (SELECT j, ((xb) + 11400714819323198485) % 18446744073709551616 AS z0 FROM cj0),
        |cbb AS (SELECT j, xor(z0, z0 >> 30) AS y0 FROM cba),
        |cbc AS (SELECT j, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM cbb),
        |cbd AS (SELECT j, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM cbc),
        |cbe AS (SELECT j, xor(z2, z2 >> 31) AS h FROM cbd),
        |coeff AS (SELECT a.j,
        |    a.h + CASE WHEN a.h % 2 = 0 THEN 1 ELSE 0 END AS a_u,
        |    b.h AS b_u
        |  FROM cae a JOIN cbe b USING (j)),
        |sl AS (SELECT doc_id, j, min(CAST(CASE WHEN v >= 9223372036854775808 THEN v - 18446744073709551616
        |      ELSE v END AS BIGINT)) AS slot
        |  FROM (SELECT doc_id, j, (((a_u % 4294967296) * (h_u % 4294967296) + (((a_u % 4294967296) * (h_u >> 32) + (a_u >> 32) * (h_u % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 + b_u) % 18446744073709551616 AS v FROM hsh CROSS JOIN coeff)
        |  GROUP BY doc_id, j),
        |sig AS (SELECT doc_id, list(slot ORDER BY j) AS sg FROM sl GROUP BY doc_id),
        |b0 AS (SELECT s.doc_id, b.band,
        |  xor(CAST(14695981039346656037 AS HUGEINT), CAST(b.band AS HUGEINT)) AS h
        |  FROM sig s CROSS JOIN (SELECT unnest(range(32)) AS band) b),
        |bj0 AS (SELECT p.doc_id, p.band,
        |  xor(p.h, CASE WHEN sl.slot < 0 THEN CAST(sl.slot AS HUGEINT) + 18446744073709551616
        |               ELSE CAST(sl.slot AS HUGEINT) END) AS x
        |  FROM b0 p JOIN sl ON sl.doc_id = p.doc_id AND sl.j = 4 * band + 0),
        |bm0a AS (SELECT doc_id, band, ((x) + 11400714819323198485) % 18446744073709551616 AS z0 FROM bj0),
        |bm0b AS (SELECT doc_id, band, xor(z0, z0 >> 30) AS y0 FROM bm0a),
        |bm0c AS (SELECT doc_id, band, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM bm0b),
        |bm0d AS (SELECT doc_id, band, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM bm0c),
        |bm0e AS (SELECT doc_id, band, xor(z2, z2 >> 31) AS h FROM bm0d),
        |bj1 AS (SELECT p.doc_id, p.band,
        |  xor(p.h, CASE WHEN sl.slot < 0 THEN CAST(sl.slot AS HUGEINT) + 18446744073709551616
        |               ELSE CAST(sl.slot AS HUGEINT) END) AS x
        |  FROM bm0e p JOIN sl ON sl.doc_id = p.doc_id AND sl.j = 4 * band + 1),
        |bm1a AS (SELECT doc_id, band, ((x) + 11400714819323198485) % 18446744073709551616 AS z0 FROM bj1),
        |bm1b AS (SELECT doc_id, band, xor(z0, z0 >> 30) AS y0 FROM bm1a),
        |bm1c AS (SELECT doc_id, band, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM bm1b),
        |bm1d AS (SELECT doc_id, band, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM bm1c),
        |bm1e AS (SELECT doc_id, band, xor(z2, z2 >> 31) AS h FROM bm1d),
        |bj2 AS (SELECT p.doc_id, p.band,
        |  xor(p.h, CASE WHEN sl.slot < 0 THEN CAST(sl.slot AS HUGEINT) + 18446744073709551616
        |               ELSE CAST(sl.slot AS HUGEINT) END) AS x
        |  FROM bm1e p JOIN sl ON sl.doc_id = p.doc_id AND sl.j = 4 * band + 2),
        |bm2a AS (SELECT doc_id, band, ((x) + 11400714819323198485) % 18446744073709551616 AS z0 FROM bj2),
        |bm2b AS (SELECT doc_id, band, xor(z0, z0 >> 30) AS y0 FROM bm2a),
        |bm2c AS (SELECT doc_id, band, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM bm2b),
        |bm2d AS (SELECT doc_id, band, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM bm2c),
        |bm2e AS (SELECT doc_id, band, xor(z2, z2 >> 31) AS h FROM bm2d),
        |bj3 AS (SELECT p.doc_id, p.band,
        |  xor(p.h, CASE WHEN sl.slot < 0 THEN CAST(sl.slot AS HUGEINT) + 18446744073709551616
        |               ELSE CAST(sl.slot AS HUGEINT) END) AS x
        |  FROM bm2e p JOIN sl ON sl.doc_id = p.doc_id AND sl.j = 4 * band + 3),
        |bm3a AS (SELECT doc_id, band, ((x) + 11400714819323198485) % 18446744073709551616 AS z0 FROM bj3),
        |bm3b AS (SELECT doc_id, band, xor(z0, z0 >> 30) AS y0 FROM bm3a),
        |bm3c AS (SELECT doc_id, band, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM bm3b),
        |bm3d AS (SELECT doc_id, band, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM bm3c),
        |bm3e AS (SELECT doc_id, band, xor(z2, z2 >> 31) AS h FROM bm3d),
        |bk AS (SELECT doc_id, band, h AS bkey FROM bm3e),
        |buckets AS (SELECT band, bkey, list(doc_id ORDER BY doc_id) AS members
        |  FROM bk GROUP BY band, bkey HAVING count(*) BETWEEN 2 AND 1000),
        |cand AS (SELECT DISTINCT m1.a AS id_a, m2.a AS id_b FROM (
        |    SELECT unnest(members) AS a, band, bkey FROM buckets) m1
        |  JOIN (SELECT unnest(members) AS a, band, bkey FROM buckets) m2
        |    ON m1.band = m2.band AND m1.bkey = m2.bkey AND m1.a < m2.a),
        |est AS (SELECT c.id_a, c.id_b,
        |    round(len(list_filter(range(128), k -> sa.sg[k+1] = sb.sg[k+1])) / 128.0,
        |      6) AS est_jaccard
        |  FROM cand c JOIN sig sa ON sa.doc_id = c.id_a
        |  JOIN sig sb ON sb.doc_id = c.id_b)
        |SELECT d.doc_id FROM documents d
        |WHERE d.doc_id NOT IN (SELECT id_b FROM est WHERE est_jaccard >= 0.8)
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_incremental" ->
      """WITH tok AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |      x -> x <> '') AS t FROM documents),
        |sh AS (SELECT doc_id, unnest(CASE WHEN len(t) = 0 THEN []
        |    WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(len(t) - 2),
        |      i -> array_to_string(t[i+1:i+3], ' ')) END) AS s FROM tok),
        |f0 AS (SELECT DISTINCT doc_id, s FROM sh),
        |f1 AS (SELECT doc_id, s, list_reduce(
        |    list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |      list_transform(range(1, length(s) + 1),
        |        i -> CAST(unicode(substr(s, CAST(i AS INT), 1)) AS HUGEINT))),
        |    (acc, c) -> (xor(acc, c) * 1099511628211) % 18446744073709551616) AS h0 FROM f0),
        |sma AS (SELECT doc_id, s, ((h0) + 11400714819323198485) % 18446744073709551616 AS z0 FROM f1),
        |smb AS (SELECT doc_id, s, xor(z0, z0 >> 30) AS y0 FROM sma),
        |smc AS (SELECT doc_id, s, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM smb),
        |smd AS (SELECT doc_id, s, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM smc),
        |sme AS (SELECT doc_id, s, xor(z2, z2 >> 31) AS h FROM smd),
        |hsh AS (SELECT doc_id, h AS h_u FROM sme),
        |cj0 AS (SELECT unnest(range(128)) AS j,
        |  (CAST(11562461410679940143 AS HUGEINT) + unnest(range(128))) AS xa,
        |  (CAST(16646288086500911323 AS HUGEINT) + unnest(range(128))) AS xb),
        |caa AS (SELECT j, ((xa) + 11400714819323198485) % 18446744073709551616 AS z0 FROM cj0),
        |cab AS (SELECT j, xor(z0, z0 >> 30) AS y0 FROM caa),
        |cac AS (SELECT j, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM cab),
        |cad AS (SELECT j, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM cac),
        |cae AS (SELECT j, xor(z2, z2 >> 31) AS h FROM cad),
        |cba AS (SELECT j, ((xb) + 11400714819323198485) % 18446744073709551616 AS z0 FROM cj0),
        |cbb AS (SELECT j, xor(z0, z0 >> 30) AS y0 FROM cba),
        |cbc AS (SELECT j, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM cbb),
        |cbd AS (SELECT j, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM cbc),
        |cbe AS (SELECT j, xor(z2, z2 >> 31) AS h FROM cbd),
        |coeff AS (SELECT a.j,
        |    a.h + CASE WHEN a.h % 2 = 0 THEN 1 ELSE 0 END AS a_u,
        |    b.h AS b_u
        |  FROM cae a JOIN cbe b USING (j)),
        |sl AS (SELECT doc_id, j, min(CAST(CASE WHEN v >= 9223372036854775808 THEN v - 18446744073709551616
        |      ELSE v END AS BIGINT)) AS slot
        |  FROM (SELECT doc_id, j, (((a_u % 4294967296) * (h_u % 4294967296) + (((a_u % 4294967296) * (h_u >> 32) + (a_u >> 32) * (h_u % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 + b_u) % 18446744073709551616 AS v FROM hsh CROSS JOIN coeff)
        |  GROUP BY doc_id, j),
        |sig AS (SELECT doc_id, list(slot ORDER BY j) AS sg FROM sl GROUP BY doc_id),
        |b0 AS (SELECT s.doc_id, b.band,
        |  xor(CAST(14695981039346656037 AS HUGEINT), CAST(b.band AS HUGEINT)) AS h
        |  FROM sig s CROSS JOIN (SELECT unnest(range(32)) AS band) b),
        |bj0 AS (SELECT p.doc_id, p.band,
        |  xor(p.h, CASE WHEN sl.slot < 0 THEN CAST(sl.slot AS HUGEINT) + 18446744073709551616
        |               ELSE CAST(sl.slot AS HUGEINT) END) AS x
        |  FROM b0 p JOIN sl ON sl.doc_id = p.doc_id AND sl.j = 4 * band + 0),
        |bm0a AS (SELECT doc_id, band, ((x) + 11400714819323198485) % 18446744073709551616 AS z0 FROM bj0),
        |bm0b AS (SELECT doc_id, band, xor(z0, z0 >> 30) AS y0 FROM bm0a),
        |bm0c AS (SELECT doc_id, band, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM bm0b),
        |bm0d AS (SELECT doc_id, band, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM bm0c),
        |bm0e AS (SELECT doc_id, band, xor(z2, z2 >> 31) AS h FROM bm0d),
        |bj1 AS (SELECT p.doc_id, p.band,
        |  xor(p.h, CASE WHEN sl.slot < 0 THEN CAST(sl.slot AS HUGEINT) + 18446744073709551616
        |               ELSE CAST(sl.slot AS HUGEINT) END) AS x
        |  FROM bm0e p JOIN sl ON sl.doc_id = p.doc_id AND sl.j = 4 * band + 1),
        |bm1a AS (SELECT doc_id, band, ((x) + 11400714819323198485) % 18446744073709551616 AS z0 FROM bj1),
        |bm1b AS (SELECT doc_id, band, xor(z0, z0 >> 30) AS y0 FROM bm1a),
        |bm1c AS (SELECT doc_id, band, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM bm1b),
        |bm1d AS (SELECT doc_id, band, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM bm1c),
        |bm1e AS (SELECT doc_id, band, xor(z2, z2 >> 31) AS h FROM bm1d),
        |bj2 AS (SELECT p.doc_id, p.band,
        |  xor(p.h, CASE WHEN sl.slot < 0 THEN CAST(sl.slot AS HUGEINT) + 18446744073709551616
        |               ELSE CAST(sl.slot AS HUGEINT) END) AS x
        |  FROM bm1e p JOIN sl ON sl.doc_id = p.doc_id AND sl.j = 4 * band + 2),
        |bm2a AS (SELECT doc_id, band, ((x) + 11400714819323198485) % 18446744073709551616 AS z0 FROM bj2),
        |bm2b AS (SELECT doc_id, band, xor(z0, z0 >> 30) AS y0 FROM bm2a),
        |bm2c AS (SELECT doc_id, band, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM bm2b),
        |bm2d AS (SELECT doc_id, band, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM bm2c),
        |bm2e AS (SELECT doc_id, band, xor(z2, z2 >> 31) AS h FROM bm2d),
        |bj3 AS (SELECT p.doc_id, p.band,
        |  xor(p.h, CASE WHEN sl.slot < 0 THEN CAST(sl.slot AS HUGEINT) + 18446744073709551616
        |               ELSE CAST(sl.slot AS HUGEINT) END) AS x
        |  FROM bm2e p JOIN sl ON sl.doc_id = p.doc_id AND sl.j = 4 * band + 3),
        |bm3a AS (SELECT doc_id, band, ((x) + 11400714819323198485) % 18446744073709551616 AS z0 FROM bj3),
        |bm3b AS (SELECT doc_id, band, xor(z0, z0 >> 30) AS y0 FROM bm3a),
        |bm3c AS (SELECT doc_id, band, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM bm3b),
        |bm3d AS (SELECT doc_id, band, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM bm3c),
        |bm3e AS (SELECT doc_id, band, xor(z2, z2 >> 31) AS h FROM bm3d),
        |bk AS (SELECT doc_id, band, h AS bkey FROM bm3e),
        |ok AS (SELECT band, bkey FROM bk WHERE doc_id < 400
        |  GROUP BY band, bkey HAVING count(*) <= 1000),
        |cand AS (SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
        |  FROM bk n JOIN bk o ON n.band = o.band AND n.bkey = o.bkey
        |  JOIN ok ON ok.band = n.band AND ok.bkey = n.bkey
        |  WHERE n.doc_id >= 400 AND o.doc_id < 400 AND n.doc_id <> o.doc_id),
        |est AS (SELECT c.new_id, c.old_id,
        |    round(len(list_filter(range(128), k -> sa.sg[k+1] = sb.sg[k+1])) / 128.0,
        |      6) AS est_jaccard
        |  FROM cand c JOIN sig sa ON sa.doc_id = c.new_id
        |  JOIN sig sb ON sb.doc_id = c.old_id)
        |SELECT new_id, old_id, est_jaccard FROM est
        |WHERE est_jaccard >= 0.7
        |ORDER BY new_id, old_id""".stripMargin,
    // SimHash replay: per-token FNV-1a+splitmix64 hashes, the 64 bit
    // votes, signature assembly, 4x16-bit pigeonhole chunks, the bucket
    // cap, and xor+bit_count verification - same HUGEINT discipline.
    "q_dedup_simhash" ->
      """WITH tk AS (SELECT doc_id, unnest(list_filter(
        |    regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |    x -> x <> '')) AS s FROM documents),
        |g0 AS (SELECT doc_id, s, row_number() OVER () AS rn FROM tk),
        |g1 AS (SELECT doc_id, rn, list_reduce(
        |    list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |      list_transform(range(1, length(s) + 1),
        |        i -> CAST(unicode(substr(s, CAST(i AS INT), 1)) AS HUGEINT))),
        |    (acc, c) -> (xor(acc, c) * 1099511628211) % 18446744073709551616) AS h0 FROM g0),
        |tma AS (SELECT doc_id, rn, ((h0) + 11400714819323198485) % 18446744073709551616 AS z0 FROM g1),
        |tmb AS (SELECT doc_id, rn, xor(z0, z0 >> 30) AS y0 FROM tma),
        |tmc AS (SELECT doc_id, rn, (((y0) % 4294967296) * 484763065 + ((((y0) % 4294967296) * 3210233709 + ((y0) >> 32) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z1 FROM tmb),
        |tmd AS (SELECT doc_id, rn, (((xor(z1, z1 >> 27)) % 4294967296) * 321982955 + ((((xor(z1, z1 >> 27)) % 4294967296) * 2496678331 + ((xor(z1, z1 >> 27)) >> 32) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z2 FROM tmc),
        |tme AS (SELECT doc_id, rn, xor(z2, z2 >> 31) AS h FROM tmd),
        |hs AS (SELECT doc_id, h AS hu FROM tme),
        |votes AS (SELECT doc_id, b, sum(CASE WHEN (hu >> b) % 2 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM hs CROSS JOIN (SELECT unnest(range(64)) AS b) GROUP BY doc_id, b),
        |sigu AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN (CAST(1 AS HUGEINT) << CAST(b AS INT))
        |    ELSE CAST(0 AS HUGEINT) END) AS u FROM votes GROUP BY doc_id),
        |sg AS (SELECT d.doc_id, coalesce(s.u, CAST(0 AS HUGEINT)) AS u,
        |    CAST(CASE WHEN coalesce(s.u, CAST(0 AS HUGEINT)) >= 9223372036854775808
        |      THEN coalesce(s.u, CAST(0 AS HUGEINT)) - 18446744073709551616
        |      ELSE coalesce(s.u, CAST(0 AS HUGEINT)) END AS BIGINT) AS sig
        |  FROM documents d LEFT JOIN sigu s USING (doc_id)),
        |bc AS (SELECT doc_id, sig, band, (u >> (16 * CAST(band AS INT))) % 65536 AS chunk
        |  FROM sg CROSS JOIN (SELECT unnest(range(4)) AS band) b),
        |bu AS (SELECT band, chunk FROM bc GROUP BY band, chunk
        |  HAVING count(*) BETWEEN 2 AND 1000),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |    bit_count(xor(a.sig, b.sig)) AS hamming
        |  FROM bc a JOIN bc b ON a.band = b.band AND a.chunk = b.chunk
        |    AND a.doc_id < b.doc_id
        |  JOIN bu k ON k.band = a.band AND k.chunk = a.chunk
        |  WHERE bit_count(xor(a.sig, b.sig)) <= 3)
        |SELECT id_a, id_b, hamming FROM cand ORDER BY id_a, id_b""".stripMargin,
    // Replays TextOps.detectLanguage: script counts over the first 2000
    // chars, then marker-word voting over the first 500 tokens with the
    // pinned sorted-lang tie-break (simple CASE picks the FIRST score
    // equal to the max — exactly "smallest lang code wins ties").
    // `latin` is [A-Za-z] here vs Character.isLetter in the JVM — equal
    // on any ASCII corpus, which the documents table is.
    "q_lang_id" ->
      """WITH c AS (SELECT doc_id, coalesce(text, '') AS x,
        |    substr(coalesce(text, ''), 1, 2000) AS h FROM documents),
        |sc AS (SELECT doc_id, x,
        |  length(h) - length(regexp_replace(h,
        |    '[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}]', '', 'g')) AS cjk,
        |  length(h) - length(regexp_replace(h,
        |    '[\x{0400}-\x{04FF}]', '', 'g')) AS cyr,
        |  length(h) - length(regexp_replace(h,
        |    '[\x{0600}-\x{06FF}]', '', 'g')) AS ara,
        |  length(regexp_replace(h, '[^A-Za-z]', '', 'g')) AS latin
        |  FROM c),
        |w AS (SELECT doc_id, cjk, cyr, ara, latin,
        |  list_filter(regexp_split_to_array(lower(x), '[^\p{L}]+'),
        |    y -> y <> '')[1:500] AS ws FROM sc),
        |v AS (SELECT doc_id, cjk, cyr, ara, latin, ws,
        |  len(list_filter(ws, y -> y IN ('der','die','das','und','ist',
        |    'nicht','ein','mit','für'))) AS s_de,
        |  len(list_filter(ws, y -> y IN ('the','and','of','to','is',
        |    'that','with','for','this'))) AS s_en,
        |  len(list_filter(ws, y -> y IN ('el','los','las','es','una',
        |    'para','con','por','como'))) AS s_es,
        |  len(list_filter(ws, y -> y IN ('le','la','les','et','est',
        |    'une','dans','pour','que'))) AS s_fr,
        |  len(list_filter(ws, y -> y IN ('il','che','di','non','per',
        |    'una','sono','con'))) AS s_it,
        |  len(list_filter(ws, y -> y IN ('de','het','een','van','niet',
        |    'met','voor','zijn'))) AS s_nl,
        |  len(list_filter(ws, y -> y IN ('o','os','um','uma','não',
        |    'para','com','por'))) AS s_pt FROM w)
        |SELECT doc_id, CASE
        |  WHEN cjk + cyr + ara > latin THEN
        |    CASE WHEN cjk >= cyr AND cjk >= ara THEN 'zh'
        |         WHEN cyr >= ara THEN 'ru' ELSE 'ar' END
        |  WHEN len(ws) = 0 THEN 'und'
        |  ELSE CASE greatest(s_de, s_en, s_es, s_fr, s_it, s_nl, s_pt)
        |    WHEN 0 THEN 'und' WHEN s_de THEN 'de' WHEN s_en THEN 'en'
        |    WHEN s_es THEN 'es' WHEN s_fr THEN 'fr' WHEN s_it THEN 'it'
        |    WHEN s_nl THEN 'nl' ELSE 'pt' END
        |  END AS detected_lang
        |FROM v ORDER BY doc_id""".stripMargin,
    "q_mvn_fit" ->
      """WITH s AS (SELECT
        |  avg(l_extendedprice) AS m0, avg(l_quantity) AS m1, avg(l_discount) AS m2,
        |  var_samp(l_extendedprice) AS v0, var_samp(l_quantity) AS v1,
        |  var_samp(l_discount) AS v2,
        |  corr(l_extendedprice, l_quantity) AS c01,
        |  corr(l_quantity, l_discount) AS c12,
        |  corr(l_discount, l_extendedprice) AS c20
        |FROM lineitem)
        |SELECT 'l_extendedprice' AS "column", round(m0, 2) AS mean,
        |  round(v0, 2) AS variance, round(c01, 6) AS corr_next FROM s
        |UNION ALL SELECT 'l_quantity', round(m1, 2), round(v1, 2), round(c12, 6) FROM s
        |UNION ALL SELECT 'l_discount', round(m2, 2), round(v2, 2), round(c20, 6) FROM s""".stripMargin,
    "q_mvn_serde" ->
      """WITH s AS (SELECT
        |  avg(l_extendedprice) AS m0, avg(l_quantity) AS m1, avg(l_discount) AS m2,
        |  var_samp(l_extendedprice) AS v0, var_samp(l_quantity) AS v1,
        |  var_samp(l_discount) AS v2,
        |  corr(l_extendedprice, l_quantity) AS c01,
        |  corr(l_quantity, l_discount) AS c12,
        |  corr(l_discount, l_extendedprice) AS c20
        |FROM lineitem)
        |SELECT 'l_extendedprice' AS "column", round(m0, 2) AS mean,
        |  round(v0, 2) AS variance, round(c01, 6) AS corr_next FROM s
        |UNION ALL SELECT 'l_quantity', round(m1, 2), round(v1, 2), round(c12, 6) FROM s
        |UNION ALL SELECT 'l_discount', round(m2, 2), round(v2, 2), round(c20, 6) FROM s""".stripMargin,
    "q_corr_spearman" ->
      """WITH r AS (SELECT
        |  CAST(rank() OVER (ORDER BY l_extendedprice) AS DOUBLE) AS ra,
        |  CAST(rank() OVER (ORDER BY l_quantity) AS DOUBLE) AS rb
        |FROM lineitem)
        |SELECT round(corr(ra, rb), 6) AS spearman_price_qty FROM r""".stripMargin,
    // Replays the md5-indexed bootstrap draw-for-draw: same rank-sorted
    // sample, same 32-bit md5 prefix mod n per (rep, j), same integer
    // replicate sums, same linear-interpolation percentile.
    "q_bootstrap_hash" ->
      """WITH s AS (SELECT o_custkey AS x FROM orders
        |  WHERE o_orderkey < 2000 AND o_custkey IS NOT NULL),
        |i AS (SELECT x, CAST(row_number() OVER (ORDER BY x) AS BIGINT) - 1
        |  AS idx FROM s),
        |c AS (SELECT count(*) AS n FROM s),
        |d AS (SELECT r.rep,
        |    CAST(('0x' || substr(md5(CAST(r.rep AS VARCHAR) || '_' ||
        |      CAST(j.j AS VARCHAR)), 1, 8)) AS BIGINT) % c.n AS idx
        |  FROM c,
        |    (SELECT unnest(range(200)) AS rep) r,
        |    (SELECT unnest(range((SELECT n FROM c))) AS j) j),
        |m AS (SELECT rep, sum(i.x) AS stat FROM d JOIN i USING (idx)
        |  GROUP BY rep)
        |SELECT count(*) AS b_reps,
        |  round(quantile_cont(stat, 0.025), 4) AS sum_lower,
        |  round(quantile_cont(stat, 0.975), 4) AS sum_upper,
        |  round(quantile_cont(stat, 0.025) / c.n, 6) AS mean_lower,
        |  round(quantile_cont(stat, 0.975) / c.n, 6) AS mean_upper,
        |  c.n AS n
        |FROM m, c GROUP BY c.n""".stripMargin,
    // Replays the fixed-model mixture scoring: per-row component log
    // densities, max-factored logsumexp, strict-> argmax — identical
    // expression tree, so assignments and (rounded) LL sums match.
    "q_gmm_score" ->
      """WITH p AS (SELECT l_extendedprice AS x FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL),
        |l AS (SELECT x,
        |  (x - 20000.0) * (x - 20000.0) / (-400000000.0)
        |    - 0.5 * ln(2 * pi() * 200000000.0) + ln(0.6) AS l0,
        |  (x - 60000.0) * (x - 60000.0) / (-800000000.0)
        |    - 0.5 * ln(2 * pi() * 400000000.0) + ln(0.4) AS l1
        |  FROM p),
        |sc AS (SELECT CASE WHEN l1 > l0 THEN 1 ELSE 0 END AS component,
        |  greatest(l0, l1) + ln(exp(l0 - greatest(l0, l1))
        |    + exp(l1 - greatest(l0, l1))) AS ll
        |  FROM l)
        |SELECT component, count(*) AS n, round(sum(ll), 2) AS ll_sum,
        |  round(avg(ll), 6) AS ll_avg
        |FROM sc GROUP BY component ORDER BY component""".stripMargin,
    // The GMM serde round-trip scores with the loaded model, so its
    // oracle IS the fixed-model scoring oracle.
    "q_gmm_serde" ->
      """WITH p AS (SELECT l_extendedprice AS x FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL),
        |l AS (SELECT x,
        |  (x - 20000.0) * (x - 20000.0) / (-400000000.0)
        |    - 0.5 * ln(2 * pi() * 200000000.0) + ln(0.6) AS l0,
        |  (x - 60000.0) * (x - 60000.0) / (-800000000.0)
        |    - 0.5 * ln(2 * pi() * 400000000.0) + ln(0.4) AS l1
        |  FROM p),
        |sc AS (SELECT CASE WHEN l1 > l0 THEN 1 ELSE 0 END AS component,
        |  greatest(l0, l1) + ln(exp(l0 - greatest(l0, l1))
        |    + exp(l1 - greatest(l0, l1))) AS ll
        |  FROM l)
        |SELECT component, count(*) AS n, round(sum(ll), 2) AS ll_sum,
        |  round(avg(ll), 6) AS ll_avg
        |FROM sc GROUP BY component ORDER BY component""".stripMargin,
    // Replays the copula fit: full-column norm MLE (avg/stddev_pop),
    // min-rank Spearman, and the 2x2 Cholesky row the sampler uses
    // (l21 = rho, l22 = sqrt(1 - rho^2)).
    // The full generation pipeline replayed arithmetically: md5 draws,
    // the 2x2 Cholesky row (0.6, sqrt(1-0.36)), Cody's branch-1 erfc
    // (pure rational — no exp), exact expon/uniform ppf. Same operation
    // order as the engine; the one ulp-level exception is ln(1-u) here
    // vs log1p(-u) in Expon.ppf0 — see hashSampleAudit's scaladoc for
    // why the FIXED draw set makes that deterministic, not flaky.
    "q_copula_sample_fixed" ->
      """WITH draws AS (SELECT i,
        |    ((CAST(('0x' || substr(md5('cs_' || i || '_0'), 1, 8)) AS BIGINT)
        |      % 1001) / 1000.0 - 0.5) * 0.5 AS z1,
        |    ((CAST(('0x' || substr(md5('cs_' || i || '_1'), 1, 8)) AS BIGINT)
        |      % 1001) / 1000.0 - 0.5) * 0.5 AS z2
        |  FROM range(0, 300) t(i)),
        |ys AS (SELECT i, 1 AS c, z1 AS y FROM draws
        |  UNION ALL
        |  SELECT i, 2, 0.6 * z1 + sqrt(1.0 - 0.6 * 0.6) * z2 FROM draws),
        |sq AS (SELECT i, c, -y / sqrt(2.0) AS x,
        |    (-y / sqrt(2.0)) * (-y / sqrt(2.0)) AS xx FROM ys),
        |us AS (SELECT i, c, 0.5 * (1.0 - x *
        |    ((((1.85777706184603153e-1 * xx + 3.16112374387056560) * xx
        |       + 1.13864154151050156e2) * xx + 3.77485237685302021e2) * xx
        |       + 3.20937758913846947e3)
        |    / ((((xx + 2.36012909523441209e1) * xx + 2.44024637934444173e2)
        |       * xx + 1.28261652607737228e3) * xx + 2.84423683343917062e3))
        |    AS u FROM sq),
        |vals AS (SELECT i, c,
        |    round_even((CASE WHEN c = 1 THEN 10.0 + 200.0 * (-ln(1.0 - u))
        |      ELSE 5.0 + 50.0 * u END) * 1000000.0, 0) / 1000000.0 AS v
        |  FROM us)
        |SELECT i AS sample_id,
        |  max(CASE WHEN c = 1 THEN v END) AS x_expon,
        |  max(CASE WHEN c = 2 THEN v END) AS x_unif
        |FROM vals GROUP BY i ORDER BY sample_id""".stripMargin,
    "q_copula_fit" ->
      """WITH r AS (SELECT
        |    CAST(rank() OVER (ORDER BY l_extendedprice) AS DOUBLE) AS ra,
        |    CAST(rank() OVER (ORDER BY l_quantity) AS DOUBLE) AS rb
        |  FROM lineitem WHERE l_orderkey < 100000),
        |rho AS (SELECT corr(ra, rb) AS v FROM r),
        |s AS (SELECT avg(l_extendedprice) AS m1,
        |    stddev_pop(l_extendedprice) AS s1, avg(l_quantity) AS m2,
        |    stddev_pop(l_quantity) AS s2 FROM lineitem
        |  WHERE l_orderkey < 100000)
        |SELECT 'chol_row2' AS stat, round(rho.v, 6) AS v1,
        |  round(sqrt(1 - rho.v * rho.v), 6) AS v2 FROM rho
        |UNION ALL SELECT 'marginal_loc', round(m1, 4), round(m2, 4) FROM s
        |UNION ALL SELECT 'marginal_scale', round(s1, 4), round(s2, 4) FROM s
        |UNION ALL SELECT 'spearman', round(rho.v, 6), 1.0 FROM rho
        |ORDER BY stat""".stripMargin,
    // The serde round-trip must reproduce the fit bit-for-bit, so its
    // oracle IS the fit oracle.
    "q_copula_serde" ->
      """WITH r AS (SELECT
        |    CAST(rank() OVER (ORDER BY l_extendedprice) AS DOUBLE) AS ra,
        |    CAST(rank() OVER (ORDER BY l_quantity) AS DOUBLE) AS rb
        |  FROM lineitem WHERE l_orderkey < 100000),
        |rho AS (SELECT corr(ra, rb) AS v FROM r),
        |s AS (SELECT avg(l_extendedprice) AS m1,
        |    stddev_pop(l_extendedprice) AS s1, avg(l_quantity) AS m2,
        |    stddev_pop(l_quantity) AS s2 FROM lineitem
        |  WHERE l_orderkey < 100000)
        |SELECT 'chol_row2' AS stat, round(rho.v, 6) AS v1,
        |  round(sqrt(1 - rho.v * rho.v), 6) AS v2 FROM rho
        |UNION ALL SELECT 'marginal_loc', round(m1, 4), round(m2, 4) FROM s
        |UNION ALL SELECT 'marginal_scale', round(s1, 4), round(s2, 4) FROM s
        |UNION ALL SELECT 'spearman', round(rho.v, 6), 1.0 FROM rho
        |ORDER BY stat""".stripMargin,
    // Replays the PSI pipeline: same floor-bin cells, same conditional
    // counts, same +0.5 smoothing, same divergence folds.
    "q_drift_psi" ->
      """WITH c AS (SELECT
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    least(greatest(CAST(floor((l_extendedprice - 0.0) / 5500.0)
        |      AS BIGINT), 0), 19) AS k
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |m AS (SELECT k, sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS cb
        |  FROM c GROUP BY k),
        |t AS (SELECT sum(ca) AS na, sum(cb) AS nb, count(*) AS nc FROM m),
        |p AS (SELECT (ca + 0.5) / (na + 0.5 * nc) AS pa,
        |    (cb + 0.5) / (nb + 0.5 * nc) AS pb, na, nb, nc FROM m, t)
        |SELECT round(sum((pa - pb) * ln(pa / pb)), 8) AS psi,
        |  round(sum(pa * ln(pa / pb)), 8) AS kl_ab,
        |  round(sum(pb * ln(pb / pa)), 8) AS kl_ba,
        |  CAST(min(na) AS BIGINT) AS n_a, CAST(min(nb) AS BIGINT) AS n_b,
        |  CAST(min(nc) AS BIGINT) AS n_cells
        |FROM p""".stripMargin,
    // Per-group PSI: the q_drift_psi construction with GROUP BY pushed
    // through every CTE; per-group totals joined back, same smoothing.
    "q_drift_psi_by_group" ->
      """WITH c AS (SELECT l_returnflag AS grp,
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    least(greatest(CAST(floor((l_extendedprice - 0.0) / 5500.0)
        |      AS BIGINT), 0), 19) AS k
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |m AS (SELECT grp, k, sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS cb
        |  FROM c GROUP BY grp, k),
        |t AS (SELECT grp, sum(ca) AS na, sum(cb) AS nb, count(*) AS nc
        |  FROM m GROUP BY grp),
        |p AS (SELECT m.grp, (ca + 0.5) / (na + 0.5 * nc) AS pa,
        |    (cb + 0.5) / (nb + 0.5 * nc) AS pb, na, nb, nc
        |  FROM m JOIN t ON m.grp = t.grp
        |  WHERE na > 0 AND nb > 0)
        |SELECT grp AS l_returnflag,
        |  round(sum((pa - pb) * ln(pa / pb)), 8) AS psi,
        |  round(sum(pa * ln(pa / pb)), 8) AS kl_ab,
        |  round(sum(pb * ln(pb / pa)), 8) AS kl_ba,
        |  CAST(min(na) AS BIGINT) AS n_a, CAST(min(nb) AS BIGINT) AS n_b,
        |  CAST(min(nc) AS BIGINT) AS n_cells
        |FROM p GROUP BY grp ORDER BY l_returnflag""".stripMargin,
    "q_drift_pmf" ->
      """WITH c AS (SELECT
        |    CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    event_type AS k
        |  FROM events WHERE event_type IS NOT NULL),
        |m AS (SELECT k, sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS cb
        |  FROM c GROUP BY k),
        |t AS (SELECT sum(ca) AS na, sum(cb) AS nb, count(*) AS nc FROM m),
        |p AS (SELECT (ca + 0.5) / (na + 0.5 * nc) AS pa,
        |    (cb + 0.5) / (nb + 0.5 * nc) AS pb, na, nb, nc FROM m, t)
        |SELECT round(sum((pa - pb) * ln(pa / pb)), 8) AS psi,
        |  round(sum(pa * ln(pa / pb)), 8) AS kl_ab,
        |  round(sum(pb * ln(pb / pa)), 8) AS kl_ba,
        |  CAST(min(na) AS BIGINT) AS n_a, CAST(min(nb) AS BIGINT) AS n_b,
        |  CAST(min(nc) AS BIGINT) AS n_cells
        |FROM p""".stripMargin,
    // Replays the two-sample KS: cumulative conditional counts over the
    // sorted distinct values, max |Fa - Fb| as exact integer ratios.
    "q_drift_ks" ->
      """WITH c AS (SELECT
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    l_extendedprice AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |m AS (SELECT v, sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS cb
        |  FROM c GROUP BY v),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM m),
        |cum AS (SELECT
        |    CAST(sum(ca) OVER (ORDER BY v) AS DOUBLE) AS fa,
        |    CAST(sum(cb) OVER (ORDER BY v) AS DOUBLE) AS fb
        |  FROM m)
        |SELECT round(max(abs(fa / t.na - fb / t.nb)), 9) AS ks_d,
        |  t.na AS n_a, t.nb AS n_b
        |FROM cum, t GROUP BY t.na, t.nb""".stripMargin,
    // Replays W1 = Σ |Fa − Fb|·gap over sorted distinct values: the
    // cumulative windows plus lead(v) for the gap to the successor.
    "q_drift_wasserstein" ->
      """WITH c AS (SELECT
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |m AS (SELECT v, sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS cb
        |  FROM c GROUP BY v),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM m),
        |cum AS (SELECT v,
        |    CAST(sum(ca) OVER (ORDER BY v) AS DOUBLE) AS fa,
        |    CAST(sum(cb) OVER (ORDER BY v) AS DOUBLE) AS fb,
        |    lead(v) OVER (ORDER BY v) AS vn
        |  FROM m)
        |SELECT round(sum(abs(fa / t.na - fb / t.nb) * (vn - v)), 6) AS w1,
        |  t.na AS n_a, t.nb AS n_b
        |FROM cum, t WHERE vn IS NOT NULL
        |GROUP BY t.na, t.nb""".stripMargin,
    "q_drift_jsd_by_group" ->
      """WITH c AS (SELECT lang AS grp,
        |    CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    source AS k
        |  FROM documents WHERE source IS NOT NULL),
        |m AS (SELECT grp, k, sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS cb
        |  FROM c GROUP BY grp, k),
        |t AS (SELECT grp, sum(ca) AS na, sum(cb) AS nb, count(*) AS nc
        |  FROM m GROUP BY grp),
        |p AS (SELECT m.grp, (ca + 0.5) / (na + 0.5 * nc) AS pa,
        |    (cb + 0.5) / (nb + 0.5 * nc) AS pb, na, nb, nc
        |  FROM m JOIN t ON m.grp = t.grp
        |  WHERE na > 0 AND nb > 0)
        |SELECT grp AS lang,
        |  round(sum(0.5 * pa * ln(pa / ((pa + pb) / 2.0))
        |    + 0.5 * pb * ln(pb / ((pa + pb) / 2.0))), 6) AS jsd,
        |  round(sum(0.5 * pa * ln(pa / ((pa + pb) / 2.0))
        |    + 0.5 * pb * ln(pb / ((pa + pb) / 2.0))) / ln(2.0), 6)
        |    AS jsd_norm,
        |  CAST(min(na) AS BIGINT) AS n_a, CAST(min(nb) AS BIGINT) AS n_b,
        |  CAST(min(nc) AS BIGINT) AS n_cells
        |FROM p GROUP BY grp ORDER BY lang""".stripMargin,
    // The sketch path's audit: exact D + the within-bound boolean.
    "q_drift_ks_sketch" ->
      """WITH c AS (SELECT
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    l_extendedprice AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |m AS (SELECT v, sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS cb
        |  FROM c GROUP BY v),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM m),
        |cum AS (SELECT
        |    CAST(sum(ca) OVER (ORDER BY v) AS DOUBLE) AS fa,
        |    CAST(sum(cb) OVER (ORDER BY v) AS DOUBLE) AS fb
        |  FROM m),
        |d AS (SELECT round(max(abs(fa / t.na - fb / t.nb)), 9) AS ks_d,
        |    t.na AS n_a, t.nb AS n_b
        |  FROM cum, t GROUP BY t.na, t.nb),
        |k AS (SELECT ks_d, n_a, n_b,
        |    sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)) * ks_d AS tt
        |  FROM d)
        |SELECT TRUE AS within_tol, TRUE AS p_within_tol, k.ks_d,
        |  k.n_a, k.n_b,
        |  round(least(1.0, greatest(0.0,
        |    (SELECT sum(2 * power(-1.0, g.j + 1) * exp(-2 * g.j * g.j * k.tt * k.tt))
        |     FROM generate_series(1, 100) AS g(j)))), 6) AS p_exact
        |FROM k""".stripMargin,
    // Replays the Mann–Whitney pipeline: per-value conditional counts,
    // the cumulative-cb window for U, the exact tie sum, the identical
    // sigma/z arithmetic (z rounded to 6 BEFORE the erfc), and Cody's
    // erfc unrolled into SQL by codyErfcSql.
    "q_drift_mwu" ->
      s"""WITH c AS (SELECT
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    l_extendedprice AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |m AS (SELECT v, sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS cb
        |  FROM c GROUP BY v),
        |cum AS (SELECT v, ca, cb,
        |    coalesce(CAST(sum(cb) OVER (ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cumb
        |  FROM m),
        |a AS (SELECT sum(ca * (cumb + 0.5 * cb)) AS u,
        |    sum(CAST(ca + cb AS DOUBLE) * (ca + cb) * (ca + cb)
        |      - (ca + cb)) AS ties,
        |    CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM cum),
        |st AS (SELECT u, na, nb, ties,
        |    CAST(na + nb AS DOUBLE) AS n,
        |    CAST(na AS DOUBLE) * nb / 2.0 AS mu FROM a),
        |sg AS (SELECT u, na, nb, mu,
        |    sqrt(CAST(na AS DOUBLE) * nb / 12.0
        |      * ((n + 1.0) - ties / (n * (n - 1.0)))) AS sigma FROM st),
        |zz AS (SELECT u, na, nb,
        |    CASE WHEN sigma = 0.0 OR u = mu THEN 0.0
        |      ELSE round_even((u - mu - 0.5 * sign(u - mu)) / sigma
        |        * 1000000.0, 0) / 1000000.0 END AS z FROM sg),
        |ye AS (SELECT u, na, nb, z, abs(z) / sqrt(2.0) AS y FROM zz)
        |SELECT u AS u_a, z,
        |  round_even(${codyErfcSql("y")} * 1000000.0, 0) / 1000000.0
        |    AS p_value,
        |  na AS n_a, nb AS n_b FROM ye""".stripMargin,
    // Replays the pooled-ECDF integral: cumulative counts per distinct
    // value, the squared gap weighted by pooled mass, and the same
    // na·nb/N² scaling — all exact integer ratios until the final sum.
    "q_drift_cvm" ->
      """WITH c AS (SELECT
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    l_extendedprice AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |m AS (SELECT v, sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS cb
        |  FROM c GROUP BY v),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM m),
        |cum AS (SELECT ca, cb,
        |    CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
        |    CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cumb
        |  FROM m),
        |s AS (SELECT sum((ca + cb)
        |      * (CAST(cuma AS DOUBLE) / t.na - CAST(cumb AS DOUBLE) / t.nb)
        |      * (CAST(cuma AS DOUBLE) / t.na - CAST(cumb AS DOUBLE) / t.nb))
        |      AS acc,
        |    t.na AS na, t.nb AS nb FROM cum, t GROUP BY t.na, t.nb)
        |SELECT round_even(CAST(na AS DOUBLE) * nb
        |    / (CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE)) * acc
        |    * 1000000.0, 0) / 1000000.0 AS cvm_t,
        |  na AS n_a, nb AS n_b FROM s""".stripMargin,
    // Replays the homogeneity test: per-cell expected counts from the
    // margins, the (O−E)²/E fold, and Q(dof/2, X²/2) as the finite
    // Poisson sum (dof = 4 is even) from the ROUNDED X².
    "q_drift_chi2" ->
      """WITH c AS (SELECT
        |    CASE WHEN o_custkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    o_orderpriority AS v
        |  FROM orders WHERE o_orderpriority IS NOT NULL),
        |m AS (SELECT v, sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS cb
        |  FROM c GROUP BY v),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb,
        |    CAST(count(*) AS BIGINT) AS k FROM m),
        |e AS (SELECT ca, cb,
        |    CAST(t.na AS DOUBLE) * (ca + cb) / CAST(t.na + t.nb AS DOUBLE)
        |      AS ea,
        |    CAST(t.nb AS DOUBLE) * (ca + cb) / CAST(t.na + t.nb AS DOUBLE)
        |      AS eb,
        |    t.na AS na, t.nb AS nb, t.k AS k FROM m, t),
        |x AS (SELECT round_even(sum((ca - ea) * (ca - ea) / ea
        |      + (cb - eb) * (cb - eb) / eb) * 1000000.0, 0) / 1000000.0
        |      AS chi2,
        |    max(na) AS na, max(nb) AS nb, max(k) AS k FROM e)
        |SELECT chi2, k - 1 AS dof,
        |  round_even((SELECT sum(exp(-x.chi2 / 2.0
        |      + s.j * ln(x.chi2 / 2.0) - lgamma(s.j + 1.0)))
        |    FROM generate_series(0, 49) s(j) WHERE s.j < ((x.k - 1) // 2))
        |    * 1000000.0, 0) / 1000000.0 AS p_value,
        |  na AS n_a, nb AS n_b, k AS n_cells FROM x""".stripMargin,
    // Replays the per-group uniformity fold from the same three
    // sufficient statistics (Σo², n, observed cells) over the shared
    // 7-cell support; p = Q(3, X²/2) as the finite Poisson sum.
    "q_chi2_gof_group" ->
      """WITH c AS (SELECT event_type, user_id % 7 AS v FROM events),
        |cells AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS o
        |  FROM c GROUP BY event_type, v),
        |g AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS kg,
        |    CAST(sum(o * o) AS BIGINT) AS ssq
        |  FROM cells GROUP BY event_type),
        |x AS (SELECT event_type,
        |    round(ssq / (CAST(n AS DOUBLE) / 7.0) - 2.0 * n
        |      + kg * (CAST(n AS DOUBLE) / 7.0)
        |      + (7.0 - kg) * (CAST(n AS DOUBLE) / 7.0), 6) AS chi2,
        |    n FROM g)
        |SELECT event_type, chi2, CAST(6 AS BIGINT) AS dof,
        |  round_even((SELECT sum(exp(-x.chi2 / 2.0
        |      + s.j * ln(x.chi2 / 2.0) - lgamma(s.j + 1.0)))
        |    FROM generate_series(0, 49) s(j) WHERE s.j < 3)
        |    * 1000000.0, 0) / 1000000.0 AS p_value,
        |  n FROM x ORDER BY event_type""".stripMargin,
    // The per-group p-values plus the BH step-up: max-rank via the
    // RANGE frame (ties share a rank), m·p/rank, right-to-left running
    // minimum capped at 1, rejection at q ≤ α.
    "q_drift_fdr" ->
      """WITH c AS (SELECT event_type, user_id % 7 AS v FROM events),
        |cells AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS o
        |  FROM c GROUP BY event_type, v),
        |g AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS kg,
        |    CAST(sum(o * o) AS BIGINT) AS ssq
        |  FROM cells GROUP BY event_type),
        |x AS (SELECT event_type,
        |    round(ssq / (CAST(n AS DOUBLE) / 7.0) - 2.0 * n
        |      + kg * (CAST(n AS DOUBLE) / 7.0)
        |      + (7.0 - kg) * (CAST(n AS DOUBLE) / 7.0), 6) AS chi2,
        |    n FROM g),
        |p AS (SELECT event_type, chi2,
        |    round_even((SELECT sum(exp(-x.chi2 / 2.0
        |        + s.j * ln(x.chi2 / 2.0) - lgamma(s.j + 1.0)))
        |      FROM generate_series(0, 49) s(j) WHERE s.j < 3)
        |      * 1000000.0, 0) / 1000000.0 AS p_value FROM x),
        |f AS (SELECT event_type, chi2, p_value,
        |    CAST(count(*) OVER (ORDER BY p_value RANGE BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rk,
        |    CAST(count(*) OVER () AS BIGINT) AS m FROM p),
        |q AS (SELECT event_type, chi2, p_value, rk,
        |    least(1.0, min(CAST(m AS DOUBLE) * p_value / rk)
        |      OVER (ORDER BY p_value ROWS BETWEEN CURRENT ROW
        |        AND UNBOUNDED FOLLOWING)) AS qv FROM f)
        |SELECT event_type, chi2, p_value, rk AS bh_rank,
        |  round(qv, 9) AS q_value, qv <= 0.05 AS reject
        |FROM q ORDER BY event_type""".stripMargin,
    // Replays the product-limit construction: per-(group, t) event and
    // total counts, at-risk from the partitioned cumulative window,
    // survival as exp(Σ ln(1 − d/n)) in the same ascending order, and
    // the Greenwood running sum — the exhausted-risk-set final row
    // pinned to S = 0 with a null standard error on both sides.
    "q_km_curve" ->
      """WITH base AS (SELECT l_linestatus AS g,
        |    CAST(l_quantity AS DOUBLE) AS t,
        |    (l_returnflag <> 'N') AS e
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND CAST(l_quantity AS DOUBLE) >= 0.0
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT g, t,
        |    CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY g, t),
        |w AS (SELECT g, t, d, c,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT)
        |      - CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS BIGINT) AS nr
        |  FROM cells),
        |s AS (SELECT g, t, d, c, nr,
        |    CASE WHEN d = nr THEN 0.0
        |      ELSE exp(sum(CASE WHEN d = nr THEN 0.0
        |        ELSE ln(1.0 - CAST(d AS DOUBLE) / nr) END)
        |        OVER (PARTITION BY g ORDER BY t ROWS BETWEEN
        |          UNBOUNDED PRECEDING AND CURRENT ROW)) END AS surv,
        |    sum(CASE WHEN d = nr THEN 0.0
        |      ELSE CAST(d AS DOUBLE) / (nr * (nr - d)) END)
        |      OVER (PARTITION BY g ORDER BY t ROWS BETWEEN
        |        UNBOUNDED PRECEDING AND CURRENT ROW) AS gw
        |  FROM w)
        |SELECT g AS l_linestatus, t, nr AS n_risk, d AS n_event,
        |  c - d AS n_censored, round(surv, 6) AS survival,
        |  CASE WHEN d = nr THEN NULL
        |    ELSE round(surv * sqrt(gw), 6) END AS std_err,
        |  CASE WHEN d = nr OR surv >= 1.0 OR surv <= 0.0 THEN NULL
        |    ELSE round(pow(surv, exp(1.959964
        |      * (sqrt(gw) / abs(ln(surv))))), 6) END AS ci_lo,
        |  CASE WHEN d = nr OR surv >= 1.0 OR surv <= 0.0 THEN NULL
        |    ELSE round(pow(surv, exp(-1.959964
        |      * (sqrt(gw) / abs(ln(surv))))), 6) END AS ci_hi
        |FROM s ORDER BY l_linestatus, t""".stripMargin,
    // The per-group fold over the same curve: smallest t whose ROUNDED
    // survival is ≤ ½, the subject count, and the final level.
    "q_km_median" ->
      """WITH base AS (SELECT l_linestatus AS g,
        |    CAST(l_quantity AS DOUBLE) AS t,
        |    (l_returnflag <> 'N') AS e
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND CAST(l_quantity AS DOUBLE) >= 0.0
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT g, t,
        |    CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY g, t),
        |w AS (SELECT g, t, d, c,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT)
        |      - CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS BIGINT) AS nr
        |  FROM cells),
        |s AS (SELECT g, t, d, c, nr,
        |    round(CASE WHEN d = nr THEN 0.0
        |      ELSE exp(sum(CASE WHEN d = nr THEN 0.0
        |        ELSE ln(1.0 - CAST(d AS DOUBLE) / nr) END)
        |        OVER (PARTITION BY g ORDER BY t ROWS BETWEEN
        |          UNBOUNDED PRECEDING AND CURRENT ROW)) END, 6) AS surv
        |  FROM w)
        |SELECT g AS l_linestatus,
        |  min(CASE WHEN surv <= 0.5 THEN t END) AS median_t,
        |  CAST(sum(c) AS BIGINT) AS n,
        |  arg_max(surv, t) AS final_survival
        |FROM s GROUP BY g ORDER BY l_linestatus""".stripMargin,
    // Replays the Nelson–Aalen fold over the same cells frame: at-risk
    // window, the Σ d/n hazard, and the Σ d/n² Poisson variance — pure
    // integer-ratio sums, rounded to 6.
    "q_km_hazard" ->
      """WITH base AS (SELECT l_linestatus AS g,
        |    CAST(l_quantity AS DOUBLE) AS t,
        |    (l_returnflag <> 'N') AS e
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND CAST(l_quantity AS DOUBLE) >= 0.0
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT g, t,
        |    CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY g, t),
        |w AS (SELECT g, t, d, c,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT)
        |      - CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS BIGINT) AS nr
        |  FROM cells)
        |SELECT g AS l_linestatus, t, nr AS n_risk, d AS n_event,
        |  c - d AS n_censored,
        |  round(sum(CAST(d AS DOUBLE) / nr)
        |    OVER (PARTITION BY g ORDER BY t ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_hazard,
        |  round(sqrt(sum(CAST(d AS DOUBLE) / (nr * nr))
        |    OVER (PARTITION BY g ORDER BY t ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS std_err
        |FROM w ORDER BY l_linestatus, t""".stripMargin,
    // Replays the Mantel–Cox fold: per-time cohort counts, prefix-sum
    // at-risk, the exact-integer O_a, 6-rounded E_a and V, X² from the
    // ROUNDED pieces, and p = erfc(√(X²/2)) via Cody's erfc.
    "q_survival_logrank" ->
      s"""WITH base AS (SELECT
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    CAST(l_quantity AS DOUBLE) AS t,
        |    (l_returnflag <> 'N') AS e
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND CAST(l_quantity AS DOUBLE) >= 0.0
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT t,
        |    sum(CASE WHEN g = 'a' AND e THEN 1 ELSE 0 END) AS da,
        |    sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN g = 'b' AND e THEN 1 ELSE 0 END) AS db,
        |    sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS cb
        |  FROM base GROUP BY t),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM cells),
        |w AS (SELECT t, da, db,
        |    CAST(tot.na - coalesce(CAST(sum(ca) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS DOUBLE) AS nat,
        |    CAST(tot.nb - coalesce(CAST(sum(cb) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS DOUBLE) AS nbt,
        |    tot.na AS na, tot.nb AS nb
        |  FROM cells, tot),
        |acc AS (SELECT CAST(sum(da) AS BIGINT) AS oa,
        |    round_even(sum(CAST(da + db AS DOUBLE) * nat / (nat + nbt)
        |      ORDER BY t)
        |      * 1000000.0, 0) / 1000000.0 AS ea,
        |    round_even(sum(CASE WHEN nat + nbt > 1.0
        |      THEN CAST(da + db AS DOUBLE) * (nat / (nat + nbt))
        |        * (nbt / (nat + nbt))
        |        * ((nat + nbt) - CAST(da + db AS DOUBLE))
        |        / ((nat + nbt) - 1.0)
        |      ELSE 0.0 END ORDER BY t) * 1000000.0, 0) / 1000000.0 AS v,
        |    max(na) AS na, max(nb) AS nb FROM w),
        |x AS (SELECT CASE WHEN v <= 0.0 THEN 0.0
        |      ELSE round_even((oa - ea) * (oa - ea) / v * 1000000.0, 0)
        |        / 1000000.0 END AS chi2,
        |    oa, ea, v, na, nb FROM acc),
        |ye AS (SELECT chi2, oa, ea, v, na, nb,
        |    sqrt(chi2 / 2.0) AS y FROM x)
        |SELECT chi2, oa AS o_a, ea AS e_a, v AS var_lr,
        |  round_even(${codyErfcSql("y")} * 1000000.0, 0) / 1000000.0
        |    AS p_value,
        |  na AS n_a, nb AS n_b FROM ye""".stripMargin,
    "q_stream_abtest" ->
      """WITH base AS (SELECT
        |    (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400
        |      AS win_start,
        |    CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS variant,
        |    (event_type = 'purchase') AS y FROM events),
        |agged AS (SELECT win_start, variant,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS x
        |  FROM base GROUP BY 1, 2),
        |w AS (SELECT win_start, variant, n, x,
        |    CAST(n AS DOUBLE) AS nd,
        |    CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p FROM agged)
        |SELECT win_start, variant, n, x,
        |  round(p, 6) AS rate,
        |  round((p + ((1.959964 * 1.959964) / 2.0) / nd)
        |      / (1.0 + (1.959964 * 1.959964) / nd)
        |    - 1.959964 * sqrt(p * (1.0 - p) / nd
        |        + ((1.959964 * 1.959964) / 4.0) / (nd * nd))
        |      / (1.0 + (1.959964 * 1.959964) / nd), 6) AS ci_lo,
        |  round((p + ((1.959964 * 1.959964) / 2.0) / nd)
        |      / (1.0 + (1.959964 * 1.959964) / nd)
        |    + 1.959964 * sqrt(p * (1.0 - p) / nd
        |        + ((1.959964 * 1.959964) / 4.0) / (nd * nd))
        |      / (1.0 + (1.959964 * 1.959964) / nd), 6) AS ci_hi
        |FROM w ORDER BY win_start, variant""".stripMargin,
    // Replays the incremental path end-to-end: per-parity-half partial
    // sums, the associative merge, moments from the merged sums, then
    // the SAME family arms as q_grouped_fit.
    "q_incremental_fit" ->
      ("""WITH h AS (SELECT l_returnflag AS g, l_orderkey % 2 AS half,
        |    count(*) AS pn, sum(l_extendedprice) AS psx,
        |    sum(l_extendedprice * l_extendedprice) AS psxx,
        |    count(*) FILTER (WHERE l_extendedprice > 0) AS pnln,
        |    coalesce(sum(ln(l_extendedprice))
        |      FILTER (WHERE l_extendedprice > 0), 0.0) AS pslnx,
        |    coalesce(sum(ln(l_extendedprice) * ln(l_extendedprice))
        |      FILTER (WHERE l_extendedprice > 0), 0.0) AS pslnx2,
        |    min(l_extendedprice) AS pmn, max(l_extendedprice) AS pmx
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |  GROUP BY 1, 2),
        |mg AS (SELECT g, sum(pn) AS pn, sum(psx) AS psx,
        |    sum(psxx) AS psxx, sum(pnln) AS pnln, sum(pslnx) AS pslnx,
        |    sum(pslnx2) AS pslnx2, min(pmn) AS pmn, max(pmx) AS pmx
        |  FROM h GROUP BY g),
        |s AS (SELECT g, pn AS n,
        |    psx / pn AS m,
        |    psxx / pn - (psx / pn) * (psx / pn) AS s2,
        |    pmn AS mn, pmx AS mx,
        |    CASE WHEN pnln > 0 THEN pslnx / pnln END AS mln,
        |    CASE WHEN pnln > 0
        |      THEN pslnx2 / pnln - (pslnx / pnln) * (pslnx / pnln)
        |      END AS s2ln,
        |    psxx AS sxx FROM mg),
        |""".stripMargin + groupedFitOracleArms("g") + """
        |SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n, distribution,
        |  round(p1, 4) AS p1, round(p2, 4) AS p2, round(p3, 4) AS p3,
        |  round(2.0 * k - 2.0 * ll, 2) AS aic_r
        |FROM fits ORDER BY l_returnflag, distribution""".stripMargin),
    "q_ks_by_group" ->
      """WITH c AS (SELECT l_linestatus AS grp,
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS v
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |m AS (SELECT grp, v,
        |    sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS cb
        |  FROM c GROUP BY grp, v),
        |t AS (SELECT grp, CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM m GROUP BY grp),
        |cum AS (SELECT grp,
        |    CAST(sum(ca) OVER (PARTITION BY grp ORDER BY v)
        |      AS DOUBLE) AS fa,
        |    CAST(sum(cb) OVER (PARTITION BY grp ORDER BY v)
        |      AS DOUBLE) AS fb
        |  FROM m)
        |SELECT cum.grp AS l_linestatus,
        |  round(max(abs(fa / t.na - fb / t.nb)), 6) AS ks_d,
        |  t.na AS n_a, t.nb AS n_b
        |FROM cum JOIN t ON cum.grp = t.grp
        |WHERE t.na > 0 AND t.nb > 0
        |GROUP BY cum.grp, t.na, t.nb ORDER BY l_linestatus""".stripMargin,
    "q_grouped_nbinom" ->
      """WITH base AS (SELECT l_linestatus AS g,
        |    CAST(l_quantity AS DOUBLE) AS v
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))),
        |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n, avg(v) AS m,
        |    var_samp(v) AS s2 FROM base GROUP BY g)
        |SELECT g AS l_linestatus, n, round(m, 6) AS mean,
        |  round(s2, 6) AS variance,
        |  round(m * m / (s2 - m), 6) AS r, round(m / s2, 6) AS prob
        |FROM a WHERE n >= 2 AND m > 0.0 AND s2 > m
        |ORDER BY l_linestatus""".stripMargin,
    "q_cat_profile" ->
      """WITH cells AS (SELECT lang, source AS v,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM documents WHERE source IS NOT NULL GROUP BY lang, v),
        |g AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS k,
        |    sum(c * ln(c)) AS clc,
        |    sum(CAST(c AS DOUBLE) * c) AS ssq,
        |    CAST(max(c) AS BIGINT) AS top
        |  FROM cells GROUP BY lang)
        |SELECT lang, n, k,
        |  round(ln(n) - clc / n, 6) AS entropy,
        |  CASE WHEN k > 1 THEN round((ln(n) - clc / n)
        |    / ln(CAST(k AS DOUBLE)), 6) END AS norm_entropy,
        |  round(ssq / (CAST(n AS DOUBLE) * n), 6) AS hhi,
        |  round(top / CAST(n AS DOUBLE), 6) AS top_share
        |FROM g ORDER BY lang""".stripMargin,
    // Cluster-agreement replay: exact contingency cells, ordered
    // list folds for the entropy/MI sums, exact Long pair counts.
    "q_cluster_agreement" ->
      """WITH c AS MATERIALIZED (SELECT lang AS a, source AS b,
        |    CAST(count(*) AS BIGINT) AS c FROM documents
        |  WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY lang, source),
        |am AS MATERIALIZED (SELECT a, CAST(sum(c) AS BIGINT) AS ca
        |  FROM c GROUP BY a),
        |bm AS MATERIALIZED (SELECT b, CAST(sum(c) AS BIGINT) AS cb
        |  FROM c GROUP BY b),
        |tot AS MATERIALIZED (SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_cells,
        |    CAST(sum(c * (c - 1) / 2) AS BIGINT) AS sumc2 FROM c),
        |ma AS (SELECT CAST(sum(ca * (ca - 1) / 2) AS BIGINT) AS a2,
        |    list_sum(list(
        |      -(CAST(ca AS DOUBLE) / (SELECT CAST(n AS DOUBLE)
        |          FROM tot))
        |      * ln(CAST(ca AS DOUBLE) / (SELECT CAST(n AS DOUBLE)
        |          FROM tot)) ORDER BY a)) AS ha FROM am),
        |mb AS (SELECT CAST(sum(cb * (cb - 1) / 2) AS BIGINT) AS b2,
        |    list_sum(list(
        |      -(CAST(cb AS DOUBLE) / (SELECT CAST(n AS DOUBLE)
        |          FROM tot))
        |      * ln(CAST(cb AS DOUBLE) / (SELECT CAST(n AS DOUBLE)
        |          FROM tot)) ORDER BY b)) AS hb FROM bm),
        |mim AS (SELECT list_sum(list(
        |      (CAST(c.c AS DOUBLE) / (SELECT CAST(n AS DOUBLE)
        |          FROM tot))
        |      * ln(CAST(c.c AS DOUBLE) * (SELECT CAST(n AS DOUBLE)
        |          FROM tot) / (CAST(am.ca AS DOUBLE) * bm.cb))
        |      ORDER BY c.a, c.b)) AS mi
        |  FROM c JOIN am ON c.a = am.a JOIN bm ON c.b = bm.b),
        |pur AS (SELECT CAST(sum(mx) AS BIGINT) AS ps FROM
        |  (SELECT b, max(c) AS mx FROM c GROUP BY b)),
        |x AS (SELECT tot.n, tot.n_cells,
        |    CAST(ma.a2 AS DOUBLE) * mb.b2
        |      / (tot.n * (tot.n - 1) / 2) AS expected,
        |    (CAST(ma.a2 AS DOUBLE) + mb.b2) / 2.0 AS maxidx,
        |    CAST(tot.sumc2 AS DOUBLE) AS sc2, ma.ha, mb.hb, mim.mi,
        |    pur.ps
        |  FROM tot, ma, mb, mim, pur)
        |SELECT n, n_cells,
        |  CASE WHEN maxidx - expected <> 0.0 THEN
        |    round_even((sc2 - expected) / (maxidx - expected) * 1e6,
        |      0) / 1e6 END AS ari,
        |  CASE WHEN ha > 0.0 AND hb > 0.0 THEN
        |    round_even(mi / sqrt(ha * hb) * 1e6, 0) / 1e6 END AS nmi,
        |  round_even(CAST(ps AS DOUBLE) / n * 1e6, 0) / 1e6 AS purity
        |FROM x""".stripMargin,
    // Shapley replay: user coalition masks via bit_or, exact
    // coalition rates, the ordered 2^C subset fold with factorial
    // weights, per-channel touched margins.
    "q_shapley" ->
      """WITH b AS MATERIALIZED (SELECT CAST(user_id AS VARCHAR) AS u,
        |    event_type AS c FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |vc AS MATERIALIZED (SELECT c AS channel,
        |    CAST(row_number() OVER (ORDER BY c) - 1 AS BIGINT) AS bit
        |  FROM (SELECT DISTINCT c FROM b WHERE c <> 'purchase')),
        |cc AS (SELECT CAST(count(*) AS INT) AS cc FROM vc),
        |tm AS (SELECT b.u, bit_or(1 << vc.bit) AS m FROM b
        |  JOIN vc ON b.c = vc.channel GROUP BY b.u),
        |cu AS (SELECT u, max(CASE WHEN c = 'purchase' THEN 1 ELSE 0
        |    END) AS conv FROM b GROUP BY u),
        |coal AS MATERIALIZED (SELECT coalesce(tm.m, 0) AS m,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cu.conv) AS BIGINT) AS nc
        |  FROM cu LEFT JOIN tm ON cu.u = tm.u
        |  GROUP BY coalesce(tm.m, 0)),
        |vv AS MATERIALIZED (SELECT m,
        |    round_even(CAST(nc AS DOUBLE) / n * 1e6, 0) / 1e6 AS v
        |  FROM coal),
        |subs AS MATERIALIZED (SELECT s.s FROM
        |  generate_series(0, 4095) s(s), cc WHERE s.s < (1 << cc.cc)),
        |ph AS (SELECT t.channel,
        |    list_sum(list(t.w * (t.v1 - t.v0) ORDER BY t.s)) AS phi
        |  FROM (SELECT vc.channel, subs.s,
        |      CAST(factorial(bit_count(CAST(subs.s AS BIGINT)))
        |          AS DOUBLE)
        |        * factorial(cc.cc - 1
        |          - bit_count(CAST(subs.s AS BIGINT)))
        |        / factorial(cc.cc) AS w,
        |      coalesce(v1.v, 0.0) AS v1, coalesce(v0.v, 0.0) AS v0
        |    FROM vc CROSS JOIN subs CROSS JOIN cc
        |      LEFT JOIN vv v0 ON v0.m = subs.s
        |      LEFT JOIN vv v1 ON v1.m = (subs.s | (1 << vc.bit))
        |    WHERE ((subs.s >> vc.bit) & 1) = 0) t
        |  GROUP BY t.channel),
        |nt AS (SELECT vc.channel,
        |    CAST(coalesce(sum(CASE WHEN ((coal.m >> vc.bit) & 1) = 1
        |      THEN coal.n END), 0) AS BIGINT) AS n_touched,
        |    CAST(coalesce(sum(CASE WHEN ((coal.m >> vc.bit) & 1) = 1
        |      THEN coal.nc END), 0) AS BIGINT) AS nc_t
        |  FROM vc CROSS JOIN coal GROUP BY vc.channel)
        |SELECT ph.channel,
        |  round_even(ph.phi * 1e6, 0) / 1e6 AS shapley,
        |  nt.n_touched,
        |  CASE WHEN nt.n_touched > 0 THEN
        |    round_even(CAST(nt.nc_t AS DOUBLE) / nt.n_touched * 1e6,
        |      0) / 1e6 END AS conv_rate_touched
        |FROM ph JOIN nt ON ph.channel = nt.channel
        |ORDER BY ph.channel""".stripMargin,
    "q_dispersion_group" ->
      s"""WITH base AS (SELECT l_linestatus AS g,
        |    CAST(l_quantity AS DOUBLE) AS v
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))),
        |agged AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    avg(v) AS m, var_samp(v) AS s2
        |  FROM base GROUP BY g),
        |d AS (SELECT g, n, m, s2,
        |    round((n - 1) * s2 / m, 6) AS d_stat,
        |    CAST(n - 1 AS DOUBLE) AS dof
        |  FROM agged WHERE n >= 2 AND m > 0.0),
        |z AS (SELECT g, n, m, s2, d_stat,
        |    (cbrt(d_stat / dof) - (1.0 - 2.0 / (9.0 * dof)))
        |      / sqrt(2.0 / (9.0 * dof)) AS zv
        |  FROM d),
        |ye AS (SELECT g, n, m, s2, d_stat, zv,
        |    abs(zv) / sqrt(2.0) AS y FROM z)
        |SELECT g AS l_linestatus, n, round(m, 6) AS mean,
        |  round(s2 / m, 6) AS dispersion, d_stat,
        |  CASE WHEN zv >= 0.0
        |    THEN round_even(0.5 * ${codyErfcSql("y")} * 1000000.0, 0)
        |      / 1000000.0
        |    ELSE round_even((1.0 - 0.5 * ${codyErfcSql("y")})
        |      * 1000000.0, 0) / 1000000.0 END AS p_value
        |FROM ye ORDER BY l_linestatus""".stripMargin,
    "q_ab_test" ->
      s"""WITH base AS (SELECT
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    (l_returnflag = 'R') AS y
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_returnflag IS NOT NULL),
        |c AS (SELECT
        |    CAST(sum(CASE WHEN g = 'a' AND y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS xa,
        |    CAST(sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS na,
        |    CAST(sum(CASE WHEN g = 'b' AND y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS xb,
        |    CAST(sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nb FROM base),
        |s AS (SELECT xa, na, xb, nb,
        |    CAST(xa AS DOUBLE) / na AS pa, CAST(xb AS DOUBLE) / nb AS pb,
        |    CAST(xa + xb AS DOUBLE) / (na + nb) AS pp FROM c),
        |zc AS (SELECT xa, na, xb, nb, pa, pb,
        |    CASE WHEN pp * (1.0 - pp) * (1.0 / na + 1.0 / nb) = 0.0
        |      THEN 0.0
        |      ELSE round_even((pa - pb)
        |        / sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))
        |        * 1000000.0, 0) / 1000000.0 END AS z FROM s),
        |ye AS (SELECT *, abs(z) / sqrt(2.0) AS y FROM zc)
        |SELECT z,
        |  round_even(${codyErfcSql("y")} * 1000000.0, 0) / 1000000.0
        |    AS p_value,
        |  round_even(pa * 1000000.0, 0) / 1000000.0 AS rate_a,
        |  round_even(pb * 1000000.0, 0) / 1000000.0 AS rate_b,
        |  xa AS x_a, na AS n_a, xb AS x_b, nb AS n_b FROM ye""".stripMargin,
    "q_wilson_group" ->
      """WITH agged AS (SELECT l_linestatus AS g,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_returnflag IS NOT NULL
        |  GROUP BY 1),
        |w AS (SELECT g, n, x, CAST(n AS DOUBLE) AS nd,
        |    CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p FROM agged)
        |SELECT g AS l_linestatus, n, x,
        |  round(p, 6) AS rate,
        |  round((p + ((1.959964 * 1.959964) / 2.0) / nd)
        |      / (1.0 + (1.959964 * 1.959964) / nd)
        |    - 1.959964 * sqrt(p * (1.0 - p) / nd
        |        + ((1.959964 * 1.959964) / 4.0) / (nd * nd))
        |      / (1.0 + (1.959964 * 1.959964) / nd), 6) AS ci_lo,
        |  round((p + ((1.959964 * 1.959964) / 2.0) / nd)
        |      / (1.0 + (1.959964 * 1.959964) / nd)
        |    + 1.959964 * sqrt(p * (1.0 - p) / nd
        |        + ((1.959964 * 1.959964) / 4.0) / (nd * nd))
        |      / (1.0 + (1.959964 * 1.959964) / nd), 6) AS ci_hi
        |FROM w ORDER BY l_linestatus""".stripMargin,
    "q_cuped" ->
      """WITH base AS (SELECT CAST(l_extendedprice AS DOUBLE) AS y,
        |    CAST(l_quantity AS DOUBLE) AS x
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))),
        |m AS (SELECT count(*) AS n, var_pop(y) AS vy, var_pop(x) AS vx,
        |    covar_pop(x, y) AS cxy FROM base)
        |SELECT round_even(cxy / vx * 1000000.0, 0) / 1000000.0 AS theta,
        |  round_even(vy * 100.0, 0) / 100.0 AS var_raw,
        |  round_even((vy - cxy * cxy / vx) * 100.0, 0) / 100.0 AS var_adj,
        |  round_even((1.0 - (vy - cxy * cxy / vx) / vy) * 1000000.0, 0)
        |    / 1000000.0 AS reduction,
        |  CAST(n AS BIGINT) AS n FROM m""".stripMargin,
    "q_rolling_features" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS tns, value
        |  FROM events)
        |SELECT event_id,
        |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY tns
        |    RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS rolling_cnt_0,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY tns
        |    RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW), 6)
        |    AS sum0_r,
        |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY tns
        |    RANGE BETWEEN 86400000000000 PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS rolling_cnt_1,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY tns
        |    RANGE BETWEEN 86400000000000 PRECEDING AND CURRENT ROW), 6)
        |    AS sum1_r
        |FROM e ORDER BY event_id""".stripMargin,
    "q_inter_arrival" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS tns
        |  FROM events)
        |SELECT event_id,
        |  tns - lag(tns) OVER (PARTITION BY user_id
        |    ORDER BY tns, event_id) AS delta_ts
        |FROM e ORDER BY event_id""".stripMargin,
    "q_retention" ->
      """WITH e AS (SELECT DISTINCT user_id AS u,
        |    epoch_ns(ts) // 86400000000000 AS p
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |m AS (SELECT u, p, min(p) OVER (PARTITION BY u) AS c FROM e),
        |cells AS (SELECT c AS cohort_period, p - c AS period_offset,
        |    CAST(count(*) AS BIGINT) AS n_users FROM m GROUP BY 1, 2),
        |s AS (SELECT *, max(CASE WHEN period_offset = 0 THEN n_users END)
        |    OVER (PARTITION BY cohort_period) AS cohort_size FROM cells)
        |SELECT cohort_period, period_offset, n_users,
        |  CAST(cohort_size AS BIGINT) AS cohort_size,
        |  round(CAST(n_users AS DOUBLE) / cohort_size, 6) AS retention
        |FROM s ORDER BY cohort_period, period_offset""".stripMargin,
    "q_funnel" ->
      """WITH e AS (SELECT user_id AS u, epoch_ns(ts) AS tns,
        |    event_type AS et
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        |t0 AS (SELECT u, min(tns) AS t FROM e WHERE et = 'view'
        |  GROUP BY u),
        |t1 AS (SELECT e.u, min(e.tns) AS t FROM e
        |  JOIN t0 ON e.u = t0.u
        |  WHERE e.et = 'click' AND e.tns >= t0.t GROUP BY e.u),
        |t2 AS (SELECT e.u, min(e.tns) AS t FROM e
        |  JOIN t1 ON e.u = t1.u
        |  WHERE e.et = 'purchase' AND e.tns >= t1.t GROUP BY e.u),
        |c AS (SELECT
        |    (SELECT CAST(count(*) AS BIGINT) FROM t0) AS u0,
        |    (SELECT CAST(count(*) AS BIGINT) FROM t1) AS u1,
        |    (SELECT CAST(count(*) AS BIGINT) FROM t2) AS u2)
        |SELECT CAST(0 AS BIGINT) AS step_idx, 'view' AS step,
        |  u0 AS users,
        |  CASE WHEN u0 > 0 THEN round(CAST(u0 AS DOUBLE) / u0, 6) END
        |    AS rate_vs_first,
        |  CAST(NULL AS DOUBLE) AS rate_vs_prev FROM c
        |UNION ALL SELECT CAST(1 AS BIGINT), 'click', u1,
        |  CASE WHEN u0 > 0 THEN round(CAST(u1 AS DOUBLE) / u0, 6) END,
        |  CASE WHEN u0 > 0 THEN round(CAST(u1 AS DOUBLE) / u0, 6) END
        |  FROM c
        |UNION ALL SELECT CAST(2 AS BIGINT), 'purchase', u2,
        |  CASE WHEN u0 > 0 THEN round(CAST(u2 AS DOUBLE) / u0, 6) END,
        |  CASE WHEN u1 > 0 THEN round(CAST(u2 AS DOUBLE) / u1, 6) END
        |  FROM c
        |ORDER BY step_idx""".stripMargin,
    "q_funnel_latency" ->
      """WITH e AS (SELECT user_id AS u, epoch_ns(ts) AS tns,
        |    event_type AS et
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        |t0 AS (SELECT u, min(tns) AS t FROM e WHERE et = 'view'
        |  GROUP BY u),
        |t1 AS (SELECT e.u, min(e.tns) AS t FROM e
        |  JOIN t0 ON e.u = t0.u
        |  WHERE e.et = 'click' AND e.tns >= t0.t GROUP BY e.u),
        |t2 AS (SELECT e.u, min(e.tns) AS t FROM e
        |  JOIN t1 ON e.u = t1.u
        |  WHERE e.et = 'purchase' AND e.tns >= t1.t GROUP BY e.u),
        |d AS (SELECT CAST(1 AS BIGINT) AS step_idx, 'click' AS step,
        |    t1.t - t0.t AS delta FROM t1 JOIN t0 USING (u)
        |  UNION ALL SELECT CAST(2 AS BIGINT), 'purchase',
        |    t2.t - t1.t FROM t2 JOIN t1 USING (u)),
        |cells AS (SELECT step_idx, step, delta,
        |    CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1, 2, 3),
        |w AS (SELECT *,
        |    CAST(sum(c) OVER (PARTITION BY step_idx) AS BIGINT) AS n,
        |    CAST(sum(c) OVER (PARTITION BY step_idx ORDER BY delta
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM cells)
        |SELECT step_idx, step, CAST(max(n) AS BIGINT) AS n_conv,
        |  min(CASE WHEN cum >= ceil(n * 0.5) THEN delta END) AS p50,
        |  min(CASE WHEN cum >= ceil(n * 0.9) THEN delta END) AS p90
        |FROM w GROUP BY step_idx, step ORDER BY step_idx""".stripMargin,
    "q_trend" ->
      """WITH e AS (SELECT event_type AS k, epoch_ns(ts) AS tns,
        |    event_id, value AS x
        |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        |    AND ts IS NOT NULL),
        |r AS (SELECT k, x,
        |    CAST(row_number() OVER (PARTITION BY k
        |      ORDER BY tns, event_id) AS BIGINT) AS r,
        |    CAST(count(*) OVER (PARTITION BY k, x) AS BIGINT) AS ct,
        |    CAST(count(*) OVER (PARTITION BY k ORDER BY x
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM e),
        |m AS (SELECT k, r, (cum - ct) + (ct + 1) / 2.0 AS s FROM r),
        |a AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    sum(r) AS sr, sum(r * r) AS srr, sum(s) AS ss,
        |    sum(s * s) AS sss, sum(r * s) AS srs
        |  FROM m GROUP BY k)
        |SELECT k AS event_type,
        |  round((CAST(n AS DOUBLE) * srs - sr * ss)
        |    / sqrt((CAST(n AS DOUBLE) * srr - sr * sr)
        |      * (CAST(n AS DOUBLE) * sss - ss * ss)), 6) AS rho,
        |  n
        |FROM a WHERE (CAST(n AS DOUBLE) * srr - sr * sr) > 0
        |  AND (CAST(n AS DOUBLE) * sss - ss * ss) > 0
        |ORDER BY event_type""".stripMargin,
    "q_mutual_info_group" ->
      """WITH cells AS (SELECT lang, source AS a,
        |    CASE WHEN n_chars < 500 THEN 'short' ELSE 'long' END AS b,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM documents WHERE source IS NOT NULL
        |  GROUP BY 1, 2, 3),
        |m AS (SELECT lang, a, b, n,
        |    CAST(sum(n) OVER (PARTITION BY lang, a) AS BIGINT) AS na,
        |    CAST(sum(n) OVER (PARTITION BY lang, b) AS BIGINT) AS nb,
        |    CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS nt
        |  FROM cells)
        |SELECT lang,
        |  round(sum((CAST(n AS DOUBLE) / nt)
        |    * ln((CAST(n AS DOUBLE) * nt)
        |      / (CAST(na AS DOUBLE) * nb))), 6) AS mi,
        |  max(nt) AS n,
        |  CAST(count(DISTINCT a) AS BIGINT) AS n_a,
        |  CAST(count(DISTINCT b) AS BIGINT) AS n_b
        |FROM m GROUP BY lang ORDER BY lang""".stripMargin,
    "q_whiten" ->
      """SELECT CAST(1.0 AS DOUBLE) AS var_w1,
        |  CAST(1.0 AS DOUBLE) AS var_w2,
        |  CAST(0.0 AS DOUBLE) AS cov_w12,
        |  CAST(0.0 AS DOUBLE) AS mean_w1""".stripMargin,
    "q_winsorized" ->
      """WITH base AS (SELECT l_returnflag AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        |  WHERE l_orderkey < 100000 AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |cells AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM base
        |  GROUP BY g, v),
        |w AS (SELECT *,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n,
        |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM cells),
        |k AS (SELECT *, greatest(0, least(cum, n - lo)
        |      - greatest(cum - c, lo)) AS kept
        |  FROM (SELECT *, CAST(floor(n * 0.1) AS BIGINT) AS lo FROM w))
        |SELECT g AS l_returnflag, CAST(max(n) AS BIGINT) AS n,
        |  round((sum(v * kept)
        |    + max(lo) * min(CASE WHEN cum >= lo + 1 THEN v END)
        |    + max(lo) * min(CASE WHEN cum >= n - lo THEN v END))
        |    / CAST(max(n) AS DOUBLE), 6) AS winsorized_mean
        |FROM k GROUP BY g HAVING max(n) > 2 * max(lo)
        |ORDER BY g""".stripMargin,
    "q_quantile_map" ->
      """WITH base AS (SELECT
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        |  WHERE l_orderkey < 20000 AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base
        |  WHERE g = 'b'),
        |nr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base
        |  WHERE g = 'a'),
        |sc AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM base
        |  WHERE g = 'b' GROUP BY v),
        |sr AS (SELECT v, CAST(sum(c) OVER (ORDER BY v ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND CURRENT ROW) - c + 1 AS BIGINT)
        |    AS rk FROM sc),
        |rc AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM base
        |  WHERE g = 'a' GROUP BY v),
        |rr AS (SELECT v, CAST(sum(c) OVER (ORDER BY v ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND CURRENT ROW) - c + 1 AS BIGINT)
        |    AS rk FROM rc),
        |st AS (SELECT sr.v AS value,
        |    (CAST(sr.rk AS DOUBLE) - 0.5) / ns.n AS u,
        |    ceil(((CAST(sr.rk AS DOUBLE) - 0.5) / ns.n) * nr.n) AS t
        |  FROM sr, ns, nr)
        |SELECT st.value, st.u, r.v AS mapped
        |FROM st ASOF JOIN rr r ON st.t >= r.rk
        |ORDER BY value""".stripMargin,
    "q_stratified_ate" ->
      """WITH base AS (SELECT (l_orderkey % 2 = 0) AS t,
        |    CAST(l_extendedprice AS DOUBLE) AS y,
        |    CAST(l_quantity AS DOUBLE) AS s FROM lineitem
        |  WHERE l_orderkey < 100000
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
        |rk AS (SELECT *, rank() OVER (ORDER BY s) AS rks FROM base),
        |b AS (SELECT t, y,
        |    CAST(floor((CAST(rks AS DOUBLE) - 1) * 5 / nn.n) + 1
        |      AS BIGINT) AS strat FROM rk, nn),
        |st AS (SELECT strat, CAST(count(*) AS BIGINT) AS ns,
        |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nc,
        |    sum(CASE WHEN t THEN y ELSE 0.0 END) AS sy_t,
        |    sum(CASE WHEN NOT t THEN y ELSE 0.0 END) AS sy_c
        |  FROM b GROUP BY strat),
        |naive AS (SELECT
        |    sum(CASE WHEN t THEN y ELSE 0.0 END)
        |      / sum(CASE WHEN t THEN 1 ELSE 0 END)
        |    - sum(CASE WHEN NOT t THEN y ELSE 0.0 END)
        |      / sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS nd
        |  FROM base)
        |SELECT
        |  round(sum(CASE WHEN nt > 0 AND nc > 0 THEN
        |      CAST(ns AS DOUBLE) * (sy_t / nt - sy_c / nc) END)
        |    / CAST(sum(CASE WHEN nt > 0 AND nc > 0 THEN ns END)
        |      AS DOUBLE), 6) AS ate,
        |  round(max(naive.nd), 6) AS naive_diff,
        |  CAST(coalesce(sum(CASE WHEN nt > 0 AND nc > 0 THEN ns END),
        |    0) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN nt > 0 AND nc > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_strata,
        |  CAST(coalesce(sum(CASE WHEN NOT (nt > 0 AND nc > 0)
        |    THEN ns END), 0) AS BIGINT) AS n_excluded
        |FROM st, naive GROUP BY naive.nd""".stripMargin,
    "q_power" ->
      s"""WITH base AS (SELECT
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    (l_returnflag = 'R') AS y FROM lineitem
        |  WHERE l_orderkey < 100000 AND l_returnflag IS NOT NULL),
        |agged AS (SELECT
        |    CAST(sum(CASE WHEN g = 'a' AND y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x_a,
        |    CAST(sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN g = 'b' AND y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x_b,
        |    CAST(sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b FROM base),
        |m AS (SELECT *, CAST(x_a AS DOUBLE) / n_a AS pa,
        |    CAST(x_b AS DOUBLE) / n_b AS pb,
        |    CAST(x_a + x_b AS DOUBLE) / (n_a + n_b) AS pbar
        |  FROM agged WHERE n_a > 0 AND n_b > 0),
        |d AS (SELECT *, abs(pa - pb) AS delta,
        |    sqrt(pa * (1.0 - pa) / n_a + pb * (1.0 - pb) / n_b) AS se,
        |    1.959964 * sqrt(2.0 * pbar * (1.0 - pbar))
        |      + 0.841621 * sqrt(pa * (1.0 - pa) + pb * (1.0 - pb))
        |      AS nnum FROM m),
        |zz AS (SELECT *, CASE WHEN se > 0 THEN
        |    round(delta / se - 1.959964, 6) END AS z FROM d),
        |ye AS (SELECT *, abs(z) / sqrt(2.0) AS y FROM zz)
        |SELECT round(pa, 6) AS rate_a, round(pb, 6) AS rate_b,
        |  round(delta, 6) AS delta, n_a, n_b,
        |  CASE WHEN z IS NOT NULL THEN round_even(0.5 *
        |    (CASE WHEN z >= 0 THEN 2.0 - (${codyErfcSql("y")})
        |      ELSE (${codyErfcSql("y")}) END)
        |    * 1000000.0, 0) / 1000000.0 END AS power,
        |  CASE WHEN delta > 0 THEN
        |    round(nnum * nnum / (delta * delta), 6) END
        |    AS n_needed_per_arm
        |FROM ye""".stripMargin,
    "q_competing_risks" ->
      """WITH base AS (SELECT l_linestatus AS g,
        |    CAST(l_quantity AS DOUBLE) AS t,
        |    CASE l_returnflag WHEN 'R' THEN 1 WHEN 'A' THEN 2
        |      ELSE 0 END AS cz FROM lineitem
        |  WHERE l_orderkey < 100000 AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND CAST(l_quantity AS DOUBLE) >= 0
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT g, t, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN cz > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d FROM base GROUP BY g, t),
        |w AS (SELECT *,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT)
        |      - CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS BIGINT) AS nr FROM cells),
        |s AS (SELECT *, exp(coalesce(
        |    sum(CASE WHEN d = nr THEN 0.0
        |      ELSE ln(1.0 - CAST(d AS DOUBLE) / nr) END)
        |      OVER (PARTITION BY g ORDER BY t ROWS BETWEEN UNBOUNDED
        |        PRECEDING AND 1 PRECEDING), 0.0)) AS sprev FROM w),
        |cc AS (SELECT g, t, CAST(cz AS BIGINT) AS cause,
        |    CAST(count(*) AS BIGINT) AS dc FROM base WHERE cz > 0
        |  GROUP BY g, t, cz)
        |SELECT cc.g AS l_linestatus, cause, cc.t, s.nr AS n_risk,
        |  dc AS n_event_cause,
        |  round(sum(s.sprev * dc / s.nr)
        |    OVER (PARTITION BY cc.g, cause ORDER BY cc.t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |    AS cif
        |FROM cc JOIN s ON cc.g = s.g AND cc.t = s.t
        |ORDER BY l_linestatus, cause, cc.t""".stripMargin,
    "q_rfm" ->
      """WITH per AS (SELECT user_id,
        |    CAST(max(epoch_ns(ts)) AS BIGINT) AS recency_ts,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    round(sum(CAST(value AS DOUBLE)), 6) AS monetary
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)
        |  GROUP BY user_id),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per),
        |rk AS (SELECT *, rank() OVER (ORDER BY recency_ts) AS rkr,
        |    rank() OVER (ORDER BY frequency) AS rkf,
        |    rank() OVER (ORDER BY monetary) AS rkm FROM per),
        |b AS (SELECT user_id, recency_ts, frequency, monetary,
        |    CAST(floor((CAST(rkr AS DOUBLE) - 1) * 5 / nn.n) + 1
        |      AS BIGINT) AS r,
        |    CAST(floor((CAST(rkf AS DOUBLE) - 1) * 5 / nn.n) + 1
        |      AS BIGINT) AS f,
        |    CAST(floor((CAST(rkm AS DOUBLE) - 1) * 5 / nn.n) + 1
        |      AS BIGINT) AS m FROM rk, nn)
        |SELECT user_id, recency_ts, frequency, monetary, r, f, m,
        |  r * 100 + f * 10 + m AS rfm_code
        |FROM b ORDER BY user_id""".stripMargin,
    "q_dunn" ->
      s"""WITH base AS (SELECT l_returnflag AS l,
        |    CAST(l_quantity AS DOUBLE) AS v FROM lineitem
        |  WHERE l_orderkey < 100000 AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT v, l, CAST(count(*) AS BIGINT) AS cl
        |  FROM base GROUP BY v, l),
        |rk AS (SELECT *,
        |    CAST(sum(cl) OVER (PARTITION BY v) AS BIGINT) AS ct,
        |    CAST(sum(cl) OVER (ORDER BY v RANGE BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM cells),
        |m AS (SELECT l, cl,
        |    (cum - ct + 1) + (ct - 1) / 2.0 AS mid FROM rk),
        |tt AS (SELECT v, CAST(sum(cl) AS BIGINT) AS ct FROM cells
        |  GROUP BY v),
        |ties AS (SELECT coalesce(sum(CAST(ct AS DOUBLE) * ct * ct
        |      - ct), 0.0) AS ts,
        |    CAST(sum(ct) AS BIGINT) AS n FROM tt),
        |sg AS (SELECT CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
        |    / 12.0 - ts / (12.0 * (CAST(n AS DOUBLE) - 1.0)) AS sigma2
        |  FROM ties),
        |lv AS (SELECT l, CAST(sum(cl) AS BIGINT) AS nl,
        |    sum(cl * mid) AS rl FROM m GROUP BY l),
        |p0 AS (SELECT a.l AS group_a, b.l AS group_b, a.nl AS n_a,
        |    b.nl AS n_b, a.rl AS ra, b.rl AS rb, sg.sigma2
        |  FROM lv a JOIN lv b ON a.l < b.l, sg WHERE sg.sigma2 > 0),
        |zt AS (SELECT group_a, group_b, n_a, n_b,
        |    round(ra / n_a, 6) AS mean_rank_a,
        |    round(rb / n_b, 6) AS mean_rank_b,
        |    round((ra / n_a - rb / n_b) / sqrt(sigma2
        |      * (1.0 / n_a + 1.0 / n_b)), 6) AS z FROM p0),
        |ye AS (SELECT *, abs(z) / sqrt(2.0) AS y FROM zt),
        |pv AS (SELECT group_a, group_b, n_a, n_b, mean_rank_a,
        |    mean_rank_b, z,
        |    round_even(${codyErfcSql("y")} * 1000000.0, 0) / 1000000.0
        |      AS p_value FROM ye),
        |f AS (SELECT *,
        |    CAST(count(*) OVER (ORDER BY p_value RANGE BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS bh_rank,
        |    CAST(count(*) OVER () AS BIGINT) AS m FROM pv),
        |q AS (SELECT *, least(1.0,
        |    min(CAST(m AS DOUBLE) * p_value / bh_rank)
        |      OVER (ORDER BY p_value ROWS BETWEEN CURRENT ROW
        |        AND UNBOUNDED FOLLOWING)) AS qv FROM f)
        |SELECT group_a, group_b, n_a, n_b, mean_rank_a, mean_rank_b,
        |  z, p_value, bh_rank, round(qv, 9) AS q_value,
        |  qv <= 0.05 AS reject
        |FROM q ORDER BY group_a, group_b""".stripMargin,
    "q_levene" ->
      """WITH base AS (SELECT l_returnflag AS f,
        |    CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
        |  WHERE l_orderkey < 100000 AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_returnflag IS NOT NULL),
        |med AS (SELECT f, quantile_cont(x, 0.5) AS m FROM base
        |  GROUP BY f),
        |zt AS (SELECT base.f, abs(x - m) AS z FROM base
        |  JOIN med USING (f)),
        |cells AS (SELECT f, CAST(count(*) AS BIGINT) AS cn,
        |    sum(z) AS s, sum(z * z) AS ssq FROM zt GROUP BY f),
        |agg AS (SELECT CAST(sum(cn) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS k, sum(s) AS st,
        |    sum(s * s / cn) AS a, sum(ssq) AS t FROM cells)
        |SELECT round(((a - st * st / n) / (k - 1))
        |    / ((t - a) / (n - k)), 6) AS f_stat,
        |  k - 1 AS df1, n - k AS df2, n
        |FROM agg WHERE k >= 2 AND n > k AND (t - a) > 0""".stripMargin,
    "q_jarque_bera" ->
      """WITH base AS (SELECT l_linestatus AS g,
        |    CAST(l_quantity AS DOUBLE) AS x FROM lineitem
        |  WHERE l_orderkey < 100000 AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))),
        |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n, sum(x) AS s1,
        |    sum(x * x) AS s2, sum(x * x * x) AS s3,
        |    sum(x * x * x * x) AS s4 FROM base GROUP BY g),
        |m AS (SELECT g, n, s1 / CAST(n AS DOUBLE) AS mu,
        |    s2 / CAST(n AS DOUBLE) AS r2, s3 / CAST(n AS DOUBLE) AS r3,
        |    s4 / CAST(n AS DOUBLE) AS r4 FROM a),
        |c AS (SELECT g, n,
        |    r2 - mu * mu AS m2,
        |    r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
        |    r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
        |      - 3.0 * mu * mu * mu * mu AS m4 FROM m),
        |k AS (SELECT g, n, m3 / pow(m2, 1.5) AS sk,
        |    m4 / (m2 * m2) - 3.0 AS ek FROM c
        |  WHERE m2 > 0 AND n >= 4),
        |j AS (SELECT g, n, round(sk, 6) AS skewness,
        |    round(ek, 6) AS kurtosis_ex,
        |    round(CAST(n AS DOUBLE) / 6.0
        |      * (sk * sk + ek * ek / 4.0), 6) AS jb FROM k)
        |SELECT g AS l_linestatus, n, skewness, kurtosis_ex, jb,
        |  round(exp(-jb / 2.0), 6) AS p_value
        |FROM j ORDER BY l_linestatus""".stripMargin,
    "q_trend_test" ->
      s"""WITH base AS (SELECT CAST(l_discount AS DOUBLE) AS w,
        |    (l_returnflag = 'R') AS y FROM lineitem
        |  WHERE l_orderkey < 100000 AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT w, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS x
        |  FROM base GROUP BY w),
        |a AS (SELECT CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS tx,
        |    CAST(count(*) AS BIGINT) AS n_levels,
        |    sum(w * x) AS swx, sum(w * n) AS swn,
        |    sum(w * w * n) AS swwn FROM cells),
        |t AS (SELECT n, n_levels,
        |    (swx - (tx / CAST(n AS DOUBLE)) * swn) AS num,
        |    sqrt((tx / CAST(n AS DOUBLE))
        |      * (1.0 - tx / CAST(n AS DOUBLE))
        |      * (swwn - swn * swn / CAST(n AS DOUBLE))) AS den
        |  FROM a),
        |zz AS (SELECT round(num / den, 6) AS z, n, n_levels FROM t
        |  WHERE den > 0),
        |ye AS (SELECT z, n, n_levels, abs(z) / sqrt(2.0) AS y FROM zz)
        |SELECT z,
        |  round_even(${codyErfcSql("y")} * 1000000.0, 0) / 1000000.0
        |    AS p_value, n, n_levels FROM ye""".stripMargin,
    "q_mcnemar" ->
      s"""WITH base AS (SELECT (l_returnflag = 'R') AS fa,
        |    (CAST(l_discount AS DOUBLE) >= 0.05) AS fb FROM lineitem
        |  WHERE l_orderkey < 100000 AND l_returnflag IS NOT NULL
        |    AND l_discount IS NOT NULL),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN fa AND NOT fb THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n10,
        |    CAST(sum(CASE WHEN NOT fa AND fb THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n01 FROM base),
        |zz AS (SELECT n, n10, n01,
        |    CASE WHEN n10 + n01 > 0 THEN
        |      round(greatest(0.0, CAST(abs(n10 - n01) AS DOUBLE) - 1.0)
        |        / sqrt(CAST(n10 + n01 AS DOUBLE)), 6)
        |    ELSE 0.0 END AS z FROM a),
        |ye AS (SELECT *, z / sqrt(2.0) AS y FROM zz)
        |SELECT n, n10, n01, z,
        |  round_even(${codyErfcSql("y")} * 1000000.0, 0) / 1000000.0
        |    AS p_value FROM ye""".stripMargin,
    "q_odds_ratio" ->
      """WITH base AS (SELECT
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    (l_returnflag = 'R') AS y FROM lineitem
        |  WHERE l_orderkey < 100000 AND l_returnflag IS NOT NULL),
        |agged AS (SELECT
        |    CAST(sum(CASE WHEN g = 'a' AND y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x_a,
        |    CAST(sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN g = 'b' AND y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x_b,
        |    CAST(sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b FROM base),
        |m AS (SELECT *, CAST(x_a AS DOUBLE) AS a,
        |    CAST(x_b AS DOUBLE) AS b,
        |    CAST(n_a AS DOUBLE) - CAST(x_a AS DOUBLE) AS c,
        |    CAST(n_b AS DOUBLE) - CAST(x_b AS DOUBLE) AS d FROM agged),
        |e AS (SELECT *,
        |    (a > 0 AND b > 0 AND c > 0 AND d > 0) AS orok,
        |    (a > 0 AND b > 0 AND n_a > 0 AND n_b > 0) AS rrok FROM m),
        |f AS (SELECT *,
        |    CASE WHEN orok THEN ln((a * d) / (b * c)) END AS lor,
        |    CASE WHEN orok THEN
        |      sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d) END AS seor,
        |    CASE WHEN rrok THEN ln((a / n_a) / (b / n_b)) END AS lrr,
        |    CASE WHEN rrok THEN sqrt(1.0 / a - 1.0 / n_a
        |      + 1.0 / b - 1.0 / n_b) END AS serr FROM e)
        |SELECT x_a, n_a, x_b, n_b,
        |  round(exp(lor), 6) AS odds_ratio,
        |  round(exp(lor - 1.959964 * seor), 6) AS or_lo,
        |  round(exp(lor + 1.959964 * seor), 6) AS or_hi,
        |  round(exp(lrr), 6) AS risk_ratio,
        |  round(exp(lrr - 1.959964 * serr), 6) AS rr_lo,
        |  round(exp(lrr + 1.959964 * serr), 6) AS rr_hi
        |FROM f""".stripMargin,
    "q_transitions" ->
      """WITH e AS (SELECT user_id AS u, epoch_ns(ts) AS tns, event_id,
        |    event_type AS st FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        |l AS (SELECT st AS to_state,
        |    lag(st) OVER (PARTITION BY u ORDER BY tns, event_id)
        |      AS from_state FROM e),
        |p AS (SELECT from_state, to_state,
        |    CAST(count(*) AS BIGINT) AS n FROM l
        |  WHERE from_state IS NOT NULL GROUP BY 1, 2)
        |SELECT from_state, to_state, n,
        |  round(CAST(n AS DOUBLE)
        |    / sum(n) OVER (PARTITION BY from_state), 6) AS prob
        |FROM p ORDER BY from_state, to_state""".stripMargin,
    "q_fairness" ->
      """WITH base AS (SELECT l_linestatus AS g,
        |    CAST(l_discount AS DOUBLE) AS v, (l_returnflag = 'R') AS y
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))
        |    AND l_returnflag IS NOT NULL),
        |oc AS (SELECT v,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS cp,
        |    CAST(sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cn
        |  FROM base GROUP BY v),
        |ow AS (SELECT cp, cn,
        |    coalesce(CAST(sum(cn) OVER (ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |      AS cumn FROM oc),
        |oa AS (SELECT round(sum(cp * (cumn + 0.5 * cn))
        |    / (CAST(sum(cp) AS DOUBLE) * sum(cn)), 6) AS auc_overall
        |  FROM ow),
        |cells AS (SELECT g, v,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS cp,
        |    CAST(sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cn
        |  FROM base GROUP BY g, v),
        |w AS (SELECT g, cp, cn,
        |    coalesce(CAST(sum(cn) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS cumn FROM cells),
        |ga AS (SELECT g, round(sum(cp * (cumn + 0.5 * cn))
        |    / (CAST(sum(cp) AS DOUBLE) * sum(cn)), 6) AS auc
        |  FROM w GROUP BY g
        |  HAVING sum(cp) > 0 AND sum(cn) > 0),
        |rates AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    round(avg(CASE WHEN y THEN 1.0 ELSE 0.0 END), 6)
        |      AS base_rate,
        |    round(avg(v), 6) AS mean_score FROM base GROUP BY g)
        |SELECT g AS l_linestatus, n, base_rate, mean_score, auc,
        |  auc_overall, round(auc - auc_overall, 6) AS auc_gap
        |FROM ga JOIN rates USING (g), oa
        |ORDER BY l_linestatus""".stripMargin,
    "q_hashing_trick" ->
      """WITH t AS (SELECT doc_id AS id,
        |    unnest(list_filter(regexp_split_to_array(lower(
        |      coalesce(text, '')), '\s+'), x -> x <> '')) AS tok
        |  FROM documents WHERE doc_id < 50),
        |h AS (SELECT id,
        |    CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 64
        |      AS dim,
        |    CASE WHEN CAST(('0x' || substr(md5(tok), 9, 1)) AS BIGINT)
        |      % 2 = 0 THEN 1 ELSE -1 END AS sgn FROM t)
        |SELECT id, dim, CAST(sum(sgn) AS BIGINT) AS value
        |FROM h GROUP BY id, dim ORDER BY id, dim""".stripMargin,
    "q_psi_quantile" ->
      """WITH base AS (SELECT
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |av AS (SELECT v FROM base WHERE g = 'a'),
        |cells AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM av
        |  GROUP BY v),
        |rr AS (SELECT *,
        |    CAST(sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(c) OVER () AS BIGINT) AS n FROM cells),
        |ed AS (SELECT
        |    max(CASE WHEN cum - c + 1 <=
        |      CAST(ceil(n * 1 / 10.0) AS BIGINT) THEN v END) AS e1,
        |    max(CASE WHEN cum - c + 1 <=
        |      CAST(ceil(n * 2 / 10.0) AS BIGINT) THEN v END) AS e2,
        |    max(CASE WHEN cum - c + 1 <=
        |      CAST(ceil(n * 3 / 10.0) AS BIGINT) THEN v END) AS e3,
        |    max(CASE WHEN cum - c + 1 <=
        |      CAST(ceil(n * 4 / 10.0) AS BIGINT) THEN v END) AS e4,
        |    max(CASE WHEN cum - c + 1 <=
        |      CAST(ceil(n * 5 / 10.0) AS BIGINT) THEN v END) AS e5,
        |    max(CASE WHEN cum - c + 1 <=
        |      CAST(ceil(n * 6 / 10.0) AS BIGINT) THEN v END) AS e6,
        |    max(CASE WHEN cum - c + 1 <=
        |      CAST(ceil(n * 7 / 10.0) AS BIGINT) THEN v END) AS e7,
        |    max(CASE WHEN cum - c + 1 <=
        |      CAST(ceil(n * 8 / 10.0) AS BIGINT) THEN v END) AS e8,
        |    max(CASE WHEN cum - c + 1 <=
        |      CAST(ceil(n * 9 / 10.0) AS BIGINT) THEN v END) AS e9
        |  FROM rr),
        |binned AS (SELECT g, CAST(
        |    (CASE WHEN v > e1 THEN 1 ELSE 0 END)
        |    + (CASE WHEN v > e2 THEN 1 ELSE 0 END)
        |    + (CASE WHEN v > e3 THEN 1 ELSE 0 END)
        |    + (CASE WHEN v > e4 THEN 1 ELSE 0 END)
        |    + (CASE WHEN v > e5 THEN 1 ELSE 0 END)
        |    + (CASE WHEN v > e6 THEN 1 ELSE 0 END)
        |    + (CASE WHEN v > e7 THEN 1 ELSE 0 END)
        |    + (CASE WHEN v > e8 THEN 1 ELSE 0 END)
        |    + (CASE WHEN v > e9 THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM base, ed),
        |m AS (SELECT k, sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS cb
        |  FROM binned GROUP BY k),
        |t AS (SELECT sum(ca) AS na, sum(cb) AS nb, count(*) AS nc
        |  FROM m),
        |p AS (SELECT (ca + 0.5) / (na + 0.5 * nc) AS pa,
        |    (cb + 0.5) / (nb + 0.5 * nc) AS pb, na, nb, nc FROM m, t)
        |SELECT round(sum((pa - pb) * ln(pa / pb)), 8) AS psi,
        |  round(sum(pa * ln(pa / pb)), 8) AS kl_ab,
        |  round(sum(pb * ln(pb / pa)), 8) AS kl_ba,
        |  CAST(min(na) AS BIGINT) AS n_a, CAST(min(nb) AS BIGINT) AS n_b,
        |  CAST(min(nc) AS BIGINT) AS n_cells
        |FROM p""".stripMargin,
    "q_brier" ->
      """WITH base AS (SELECT CAST(l_discount AS DOUBLE) * 10.0 AS s,
        |    (l_returnflag = 'R') AS yb FROM lineitem
        |  WHERE l_orderkey < 100000 AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE) * 10.0)
        |    AND l_returnflag IS NOT NULL),
        |b AS (SELECT least(9, greatest(0, CAST(floor(s * 10) AS INT)))
        |    AS bin, s, CASE WHEN yb THEN 1.0 ELSE 0.0 END AS y
        |  FROM base),
        |cells AS (SELECT bin, CAST(count(*) AS BIGINT) AS nk,
        |    sum(s) AS ss, sum(y) AS sy,
        |    sum((s - y) * (s - y)) AS sq FROM b GROUP BY bin),
        |t AS (SELECT CAST(sum(nk) AS BIGINT) AS n, sum(sy) AS ty
        |  FROM cells)
        |SELECT t.n,
        |  round(sum(sq) / CAST(t.n AS DOUBLE), 6) AS brier,
        |  round(sum(nk * (ss / nk - sy / nk) * (ss / nk - sy / nk))
        |    / CAST(t.n AS DOUBLE), 6) AS reliability,
        |  round(sum(nk * (sy / nk - ty / CAST(t.n AS DOUBLE))
        |    * (sy / nk - ty / CAST(t.n AS DOUBLE)))
        |    / CAST(t.n AS DOUBLE), 6) AS resolution,
        |  round(max((ty / CAST(t.n AS DOUBLE))
        |    * (1.0 - ty / CAST(t.n AS DOUBLE))), 6) AS uncertainty
        |FROM cells, t GROUP BY t.n, t.ty""".stripMargin,
    "q_centroid_sim" ->
      """WITH e AS (SELECT d.lang, g.pos AS pos,
        |    CAST(em.embedding[g.pos + 1] AS DOUBLE) AS v
        |  FROM embeddings em
        |  JOIN documents d ON em.vec_id = d.doc_id,
        |  generate_series(0, 63) AS g(pos)),
        |c AS (SELECT lang, pos, avg(v) AS ce FROM e GROUP BY lang, pos),
        |p AS (SELECT a.lang AS group_a, b.lang AS group_b,
        |    sum(a.ce * b.ce) AS dt, sum(a.ce * a.ce) AS na,
        |    sum(b.ce * b.ce) AS nb
        |  FROM c a JOIN c b ON a.pos = b.pos AND a.lang < b.lang
        |  GROUP BY 1, 2)
        |SELECT group_a, group_b,
        |  round(dt / (sqrt(na) * sqrt(nb)), 6) AS cosine
        |FROM p WHERE na > 0 AND nb > 0
        |ORDER BY group_a, group_b""".stripMargin,
    "q_negative_sample" ->
      """WITH ids AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS id
        |  FROM documents WHERE doc_id IS NOT NULL),
        |r AS (SELECT id, CAST(row_number() OVER (ORDER BY id)
        |    AS BIGINT) AS rk FROM ids),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ids),
        |a AS (SELECT id AS anchor, rk AS own, CAST(s.j AS BIGINT) AS j
        |  FROM r, generate_series(1, 3) s(j)),
        |d AS (SELECT anchor, j, own,
        |    (CAST(('0x' || substr(md5(CAST(anchor AS VARCHAR) || ':'
        |      || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % (nn.n - 1)) + 1 AS d0
        |  FROM a, nn),
        |i AS (SELECT anchor, j,
        |    CASE WHEN d0 >= own THEN d0 + 1 ELSE d0 END AS idx FROM d)
        |SELECT i.anchor, i.j, r.id AS negative
        |FROM i JOIN r ON r.rk = i.idx
        |ORDER BY anchor, j""".stripMargin,
    "q_qini" ->
      """WITH base AS (SELECT CAST(l_extendedprice AS DOUBLE) AS s,
        |    (l_orderkey % 2 = 0) AS t,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT s, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nc,
        |    CAST(sum(CASE WHEN t THEN y ELSE 0 END) AS BIGINT) AS pt,
        |    CAST(sum(CASE WHEN NOT t THEN y ELSE 0 END) AS BIGINT)
        |      AS pc
        |  FROM base GROUP BY s),
        |rr AS (SELECT *,
        |    CAST(sum(c) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(c) OVER () AS BIGINT) AS n FROM cells),
        |b AS (SELECT 10 - CAST(floor((cum - c) * 10.0 / n) AS BIGINT)
        |    AS bucket, nt, nc, pt, pc FROM rr),
        |a AS (SELECT bucket, CAST(sum(nt) AS BIGINT) AS n_t,
        |    CAST(sum(nc) AS BIGINT) AS n_c,
        |    CAST(sum(pt) AS BIGINT) AS pos_t,
        |    CAST(sum(pc) AS BIGINT) AS pos_c FROM b GROUP BY bucket),
        |w AS (SELECT *,
        |    CAST(sum(n_t) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS ct,
        |    CAST(sum(n_c) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cc,
        |    CAST(sum(pos_t) OVER (ORDER BY bucket ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cpt,
        |    CAST(sum(pos_c) OVER (ORDER BY bucket ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cpc
        |  FROM a)
        |SELECT bucket, n_t, n_c, pos_t, pos_c,
        |  CASE WHEN n_t > 0 THEN
        |    round(CAST(pos_t AS DOUBLE) / n_t, 6) END AS rate_t,
        |  CASE WHEN n_c > 0 THEN
        |    round(CAST(pos_c AS DOUBLE) / n_c, 6) END AS rate_c,
        |  CASE WHEN n_t > 0 AND n_c > 0 THEN
        |    round(CAST(pos_t AS DOUBLE) / n_t
        |      - CAST(pos_c AS DOUBLE) / n_c, 6) END AS uplift,
        |  CASE WHEN cc > 0 THEN round(CAST(cpt AS DOUBLE)
        |    - CAST(cpc AS DOUBLE) * ct / cc, 6) END AS qini
        |FROM w ORDER BY bucket""".stripMargin,
    "q_pairwise_contrasts" ->
      s"""WITH base AS (SELECT l_returnflag AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        |  WHERE l_orderkey < 100000 AND l_returnflag IS NOT NULL
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |mm AS (SELECT g, CAST(count(*) AS BIGINT) AS n, avg(v) AS mu,
        |    var_samp(v) AS vr FROM base GROUP BY g
        |  HAVING count(*) >= 2 AND var_samp(v) IS NOT NULL),
        |pairs AS (SELECT l.g AS group_a, r.g AS group_b, l.n AS n_a,
        |    r.n AS n_b, l.mu AS ma, r.mu AS mb,
        |    l.vr / l.n + r.vr / r.n AS se2
        |  FROM mm l JOIN mm r ON l.g < r.g),
        |zt AS (SELECT group_a, group_b, n_a, n_b,
        |    round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
        |    round((ma - mb) / sqrt(se2), 6) AS z FROM pairs
        |  WHERE se2 > 0),
        |py AS (SELECT *, abs(z) / sqrt(2.0) AS y FROM zt),
        |pv AS (SELECT group_a, group_b, n_a, n_b, mean_a, mean_b, z,
        |    round_even(${codyErfcSql("y")} * 1000000.0, 0) / 1000000.0
        |      AS p_value FROM py),
        |f AS (SELECT *,
        |    CAST(count(*) OVER (ORDER BY p_value RANGE BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS bh_rank,
        |    CAST(count(*) OVER () AS BIGINT) AS m FROM pv),
        |q AS (SELECT *, least(1.0,
        |    min(CAST(m AS DOUBLE) * p_value / bh_rank)
        |      OVER (ORDER BY p_value ROWS BETWEEN CURRENT ROW
        |        AND UNBOUNDED FOLLOWING)) AS qv FROM f)
        |SELECT group_a, group_b, n_a, n_b, mean_a, mean_b, z, p_value,
        |  bh_rank, round(qv, 9) AS q_value, qv <= 0.05 AS reject
        |FROM q ORDER BY group_a, group_b""".stripMargin,
    "q_cramers_v" ->
      """WITH cells AS (SELECT l_returnflag AS a, l_linestatus AS b,
        |    CAST(count(*) AS BIGINT) AS o FROM lineitem
        |  WHERE l_orderkey < 100000 AND l_returnflag IS NOT NULL
        |    AND l_linestatus IS NOT NULL GROUP BY 1, 2),
        |w AS (SELECT *,
        |    CAST(sum(o) OVER (PARTITION BY a) AS BIGINT) AS na,
        |    CAST(sum(o) OVER (PARTITION BY b) AS BIGINT) AS nb,
        |    CAST(sum(o) OVER () AS BIGINT) AS n FROM cells),
        |x AS (SELECT CAST(max(n) AS BIGINT) AS n,
        |    CAST(count(DISTINCT a) AS BIGINT) AS n_a,
        |    CAST(count(DISTINCT b) AS BIGINT) AS n_b,
        |    round(sum(
        |      (o - CAST(na AS DOUBLE) * nb / CAST(n AS DOUBLE))
        |      * (o - CAST(na AS DOUBLE) * nb / CAST(n AS DOUBLE))
        |      / (CAST(na AS DOUBLE) * nb / CAST(n AS DOUBLE))
        |      - CAST(na AS DOUBLE) * nb / CAST(n AS DOUBLE))
        |      + CAST(max(n) AS DOUBLE), 6) AS chi2
        |  FROM w)
        |SELECT n, n_a, n_b, chi2,
        |  CAST((n_a - 1) * (n_b - 1) AS BIGINT) AS dof,
        |  round_even((SELECT sum(exp(-x.chi2 / 2.0
        |      + s.j * ln(x.chi2 / 2.0) - lgamma(s.j + 1.0)))
        |    FROM generate_series(0, 49) s(j)
        |    WHERE s.j < (x.n_a - 1) * (x.n_b - 1) / 2)
        |    * 1000000.0, 0) / 1000000.0 AS p_value,
        |  round(sqrt(chi2 / (CAST(n AS DOUBLE)
        |    * CAST(least(n_a - 1, n_b - 1) AS DOUBLE))), 6)
        |    AS cramers_v
        |FROM x WHERE (n_a - 1) * (n_b - 1) > 0""".stripMargin,
    "q_life_table" ->
      """WITH base AS (SELECT l_linestatus AS g,
        |    CAST(floor(CAST(l_quantity AS DOUBLE) / 10.0) + 1
        |      AS DOUBLE) AS p,
        |    (l_returnflag <> 'N') AS e FROM lineitem
        |  WHERE l_orderkey < 100000 AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND CAST(l_quantity AS DOUBLE) >= 0
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT g, p,
        |    CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS c FROM base GROUP BY g, p),
        |w AS (SELECT *,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT)
        |      - CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY p
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS BIGINT) AS nr FROM cells),
        |qe AS (SELECT *, CAST(nr AS DOUBLE)
        |    - CAST(c - d AS DOUBLE) / 2.0 AS neff FROM w),
        |q2 AS (SELECT *, CAST(d AS DOUBLE) / neff AS qq FROM qe),
        |s AS (SELECT *, CASE WHEN qq >= 1.0 THEN 0.0 ELSE
        |    exp(sum(CASE WHEN qq >= 1.0 THEN 0.0
        |      ELSE ln(1.0 - qq) END)
        |      OVER (PARTITION BY g ORDER BY p ROWS BETWEEN UNBOUNDED
        |        PRECEDING AND CURRENT ROW)) END AS surv FROM q2)
        |SELECT g AS l_linestatus, CAST(p AS BIGINT) AS period,
        |  (p - 1.0) * 10.0 AS t_start, p * 10.0 AS t_end,
        |  nr AS n_risk, d AS n_event, c - d AS n_censored,
        |  round(neff, 6) AS n_eff, round(qq, 6) AS hazard,
        |  round(surv, 6) AS survival
        |FROM s ORDER BY l_linestatus, period""".stripMargin,
    "q_basket_lift" ->
      """WITH items AS (SELECT DISTINCT
        |    CAST(l_orderkey AS VARCHAR) AS b,
        |    CAST(l_partkey AS VARCHAR) AS i FROM lineitem
        |  WHERE l_orderkey < 100000 AND l_orderkey IS NOT NULL
        |    AND l_partkey IS NOT NULL),
        |sz AS (SELECT b FROM (SELECT b, count(*) AS c FROM items
        |  GROUP BY b) WHERE c <= 1000),
        |kept AS (SELECT items.* FROM items JOIN sz USING (b)),
        |nb AS (SELECT CAST(count(DISTINCT b) AS DOUBLE) AS n
        |  FROM kept),
        |ic AS (SELECT i, CAST(count(*) AS BIGINT) AS ci FROM kept
        |  GROUP BY i),
        |pairs AS (SELECT l.i AS item_a, r.i AS item_b,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM kept l JOIN kept r ON l.b = r.b AND l.i < r.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT item_a, item_b, n_ab, ia.ci AS n_a, ib.ci AS n_b,
        |  round(CAST(n_ab AS DOUBLE) / nb.n, 6) AS support,
        |  round(CAST(n_ab AS DOUBLE) / ia.ci, 6) AS conf_a_b,
        |  round(nb.n * n_ab / (CAST(ia.ci AS DOUBLE) * ib.ci), 6)
        |    AS lift
        |FROM pairs JOIN ic ia ON ia.i = pairs.item_a
        |  JOIN ic ib ON ib.i = pairs.item_b, nb
        |ORDER BY lift DESC, item_a, item_b LIMIT 50""".stripMargin,
    "q_rrf" ->
      """WITH base AS (SELECT l_linestatus AS st, l_suppkey AS sk,
        |    round(sum(CAST(l_extendedprice AS DOUBLE)
        |      * (1.0 - CAST(l_discount AS DOUBLE))), 2) AS rev,
        |    sum(CAST(l_quantity AS DOUBLE)) AS qty
        |  FROM lineitem WHERE l_orderkey < 100000 GROUP BY 1, 2),
        |ta AS (SELECT * FROM (SELECT st, sk,
        |    CAST(row_number() OVER (PARTITION BY st
        |      ORDER BY rev DESC, sk) AS BIGINT) AS rank FROM base)
        |  WHERE rank <= 20),
        |tb AS (SELECT * FROM (SELECT st, sk,
        |    CAST(row_number() OVER (PARTITION BY st
        |      ORDER BY qty DESC, sk) AS BIGINT) AS rank FROM base)
        |  WHERE rank <= 20),
        |f AS (SELECT coalesce(ta.st, tb.st) AS st,
        |    coalesce(ta.sk, tb.sk) AS sk,
        |    coalesce(1.0 / (60.0 + ta.rank), 0.0)
        |      + coalesce(1.0 / (60.0 + tb.rank), 0.0) AS rrf
        |  FROM ta FULL OUTER JOIN tb
        |    ON ta.st = tb.st AND ta.sk = tb.sk),
        |rk AS (SELECT st, sk, rrf,
        |    CAST(row_number() OVER (PARTITION BY st
        |      ORDER BY rrf DESC, sk) AS BIGINT) AS fused_rank FROM f)
        |SELECT st AS l_linestatus, sk AS l_suppkey,
        |  round(rrf, 9) AS rrf, fused_rank
        |FROM rk WHERE fused_rank <= 10
        |ORDER BY l_linestatus, fused_rank""".stripMargin,
    "q_partial_corr" ->
      """WITH base AS (SELECT l_returnflag AS g,
        |    CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y,
        |    CAST(l_discount AS DOUBLE) AS z FROM lineitem
        |  WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))),
        |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(z) AS sz,
        |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(z * z) AS szz,
        |    sum(x * y) AS sxy, sum(x * z) AS sxz, sum(y * z) AS syz
        |  FROM base GROUP BY g),
        |r AS (SELECT g, n,
        |    (n * sxy - sx * sy)
        |      / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS rxy,
        |    (n * sxz - sx * sz)
        |      / sqrt((n * sxx - sx * sx) * (n * szz - sz * sz)) AS rxz,
        |    (n * syz - sy * sz)
        |      / sqrt((n * syy - sy * sy) * (n * szz - sz * sz)) AS ryz,
        |    n * sxx - sx * sx AS vx, n * syy - sy * sy AS vy,
        |    n * szz - sz * sz AS vz
        |  FROM a)
        |SELECT g AS l_returnflag, n, round(rxy, 6) AS r_xy,
        |  round((rxy - rxz * ryz)
        |    / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6)
        |    AS r_xy_z
        |FROM r WHERE vx > 0 AND vy > 0 AND vz > 0
        |  AND (1.0 - rxz * rxz) * (1.0 - ryz * ryz) > 0
        |ORDER BY g""".stripMargin,
    "q_profile" ->
      """WITH long AS (
        |  SELECT 'doc_id' AS c0, CAST(doc_id AS VARCHAR) AS v
        |    FROM documents
        |  UNION ALL SELECT 'text', text FROM documents
        |  UNION ALL SELECT 'lang', lang FROM documents
        |  UNION ALL SELECT 'source', source FROM documents
        |  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR)
        |    FROM documents),
        |cells AS (SELECT c0, v, CAST(count(*) AS BIGINT) AS c
        |  FROM long GROUP BY c0, v),
        |t AS (SELECT *, TRY_CAST(v AS DOUBLE) AS num FROM cells),
        |a AS (SELECT c0, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(coalesce(sum(CASE WHEN v IS NULL THEN c END), 0)
        |      AS BIGINT) AS n_null,
        |    CAST(count(v) AS BIGINT) AS n_distinct,
        |    CAST(coalesce(sum(CASE WHEN num IS NOT NULL
        |      AND NOT isnan(num) THEN c END), 0) AS BIGINT)
        |      AS n_numeric,
        |    min(CASE WHEN num IS NOT NULL AND NOT isnan(num)
        |      THEN num END) AS min,
        |    max(CASE WHEN num IS NOT NULL AND NOT isnan(num)
        |      THEN num END) AS max,
        |    round(sum(CASE WHEN num IS NOT NULL AND NOT isnan(num)
        |        THEN num * c END)
        |      / CAST(sum(CASE WHEN num IS NOT NULL AND NOT isnan(num)
        |        THEN c END) AS DOUBLE), 6) AS mean
        |  FROM t GROUP BY c0)
        |SELECT c0 AS "column", n, n_null,
        |  round(CAST(n_null AS DOUBLE) / n, 6) AS null_rate,
        |  n_distinct, n_numeric, min, max, mean
        |FROM a ORDER BY c0""".stripMargin,
    "q_rare_collapse" ->
      """WITH counts AS (SELECT p_type AS lvl,
        |    CAST(count(*) AS BIGINT) AS c FROM part
        |  WHERE p_type IS NOT NULL GROUP BY p_type),
        |tot AS (SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) AS n
        |  FROM counts),
        |keep AS (SELECT lvl FROM counts, tot
        |  WHERE CAST(c AS DOUBLE) >= n * 0.01),
        |mapped AS (SELECT CASE WHEN p.p_type IS NULL THEN NULL
        |    WHEN k.lvl IS NOT NULL THEN p.p_type
        |    ELSE '_other' END AS collapsed
        |  FROM part p LEFT JOIN keep k ON p.p_type = k.lvl)
        |SELECT collapsed, CAST(count(*) AS BIGINT) AS n FROM mapped
        |GROUP BY collapsed ORDER BY collapsed""".stripMargin,
    "q_kendall" ->
      """WITH base AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_discount AS DOUBLE) AS y FROM lineitem
        |  WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))),
        |cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c FROM base
        |  GROUP BY x, y),
        |p AS (SELECT
        |    CAST(coalesce(sum(CASE WHEN r.y > l.y
        |      THEN l.c * r.c END), 0) AS BIGINT) AS con,
        |    CAST(coalesce(sum(CASE WHEN r.y < l.y
        |      THEN l.c * r.c END), 0) AS BIGINT) AS dis
        |  FROM cells l JOIN cells r ON r.x > l.x AND r.y <> l.y),
        |m AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
        |t1 AS (SELECT sum(t * (t - 1) / 2) AS n1 FROM
        |  (SELECT CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY x)),
        |t2 AS (SELECT sum(t * (t - 1) / 2) AS n2 FROM
        |  (SELECT CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY y))
        |SELECT n, con AS concordant, dis AS discordant,
        |  CASE WHEN n * (n - 1) / 2 > n1 AND n * (n - 1) / 2 > n2 THEN
        |    round((con - dis) / sqrt(
        |      CAST(n * (n - 1) / 2 - n1 AS DOUBLE)
        |      * CAST(n * (n - 1) / 2 - n2 AS DOUBLE)), 6) END AS tau_b
        |FROM p, m, t1, t2""".stripMargin,
    "q_weighted_median" ->
      """WITH base AS (SELECT l_returnflag AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS v,
        |    CAST(l_quantity AS DOUBLE) AS w FROM lineitem
        |  WHERE l_orderkey < 100000 AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND CAST(l_quantity AS DOUBLE) > 0),
        |cells AS (SELECT g, v, sum(w) AS w FROM base GROUP BY g, v),
        |c2 AS (SELECT *, sum(w) OVER (PARTITION BY g) AS tw,
        |    sum(w) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM cells)
        |SELECT g AS l_returnflag, round(max(tw), 6) AS total_weight,
        |  min(CASE WHEN cum >= tw * 0.5 THEN v END) AS w_median
        |FROM c2 GROUP BY g ORDER BY g""".stripMargin,
    "q_mi_ranking" ->
      """WITH base AS (SELECT lang, source,
        |    CASE WHEN n_chars < 500 THEN 'short' ELSE 'long' END AS b
        |  FROM documents),
        |long AS (SELECT 'lang' AS feature, CAST(lang AS VARCHAR) AS a,
        |    b FROM base
        |  UNION ALL SELECT 'source', CAST(source AS VARCHAR), b
        |  FROM base),
        |cells AS (SELECT feature, a, b, CAST(count(*) AS BIGINT) AS n
        |  FROM long WHERE a IS NOT NULL AND b IS NOT NULL
        |  GROUP BY 1, 2, 3),
        |m AS (SELECT feature, a, b, n,
        |    CAST(sum(n) OVER (PARTITION BY feature, a) AS BIGINT)
        |      AS na,
        |    CAST(sum(n) OVER (PARTITION BY feature, b) AS BIGINT)
        |      AS nb,
        |    CAST(sum(n) OVER (PARTITION BY feature) AS BIGINT) AS nt
        |  FROM cells)
        |SELECT feature,
        |  round(sum((CAST(n AS DOUBLE) / nt)
        |    * ln((CAST(n AS DOUBLE) * nt)
        |      / (CAST(na AS DOUBLE) * nb))), 6) AS mi,
        |  max(nt) AS n,
        |  CAST(count(DISTINCT a) AS BIGINT) AS n_a,
        |  CAST(count(DISTINCT b) AS BIGINT) AS n_b
        |FROM m GROUP BY feature ORDER BY feature""".stripMargin,
    // AR(3) Yule-Walker replay: decimal-exact daily means, centered-lag
    // sums, Cramer's rule on the 3x3 Toeplitz system, innovation
    // variance and the one-step forecast from the max_by-last deviations.
    // + 0.0 on every rounded double: tiny-negative phis round to -0.0 in
    // DuckDB but +0.0 through Spark's BigDecimal round (house rule).
    "q_ar_fit" ->
      """WITH e AS (SELECT event_type AS k,
        |    epoch_ns(ts) // 86400000000000 AS p, value AS x
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |cells AS (SELECT k, p,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS v
        |  FROM e GROUP BY k, p),
        |m AS (SELECT k, p, v, avg(v) OVER (PARTITION BY k) AS mu
        |  FROM cells),
        |d AS (SELECT k, p, mu, v - mu AS dd,
        |    lag(v - mu, 1) OVER w AS d1,
        |    lag(v - mu, 2) OVER w AS d2,
        |    lag(v - mu, 3) OVER w AS d3
        |  FROM m WINDOW w AS (PARTITION BY k ORDER BY p)),
        |a AS (SELECT k, CAST(count(*) AS BIGINT) AS n, max(mu) AS mu,
        |    sum(dd * dd) AS ss, sum(dd * d1) AS s1,
        |    sum(dd * d2) AS s2, sum(dd * d3) AS s3,
        |    max_by(dd, p) AS e0, max_by(d1, p) AS e1,
        |    max_by(d2, p) AS e2
        |  FROM d GROUP BY k),
        |r AS (SELECT k, n, mu, ss, e0, e1, e2,
        |    s1 / ss AS r1, s2 / ss AS r2, s3 / ss AS r3
        |  FROM a WHERE n >= 5 AND ss > 0.0),
        |c AS (SELECT k, n, mu, ss, e0, e1, e2, r1, r2, r3,
        |    (1.0 - r1 * r1) - r1 * (r1 - r1 * r2)
        |      + r2 * (r1 * r1 - r2) AS det,
        |    r1 * (1.0 - r1 * r1) - r1 * (r2 - r1 * r3)
        |      + r2 * (r2 * r1 - r3) AS n1,
        |    (r2 - r1 * r3) - r1 * (r1 - r1 * r2)
        |      + r2 * (r1 * r3 - r2 * r2) AS n2,
        |    (r3 - r2 * r1) - r1 * (r1 * r3 - r2 * r2)
        |      + r1 * (r1 * r1 - r2) AS n3
        |  FROM r),
        |f AS (SELECT k, n, mu, ss, e0, e1, e2, r1, r2, r3,
        |    n1 / det AS f1, n2 / det AS f2, n3 / det AS f3
        |  FROM c WHERE abs(det) > 1e-12)
        |SELECT k AS event_type, n AS n_periods,
        |  round(mu, 6) + 0.0 AS mean,
        |  round(f1, 6) + 0.0 AS phi_1, round(f2, 6) + 0.0 AS phi_2,
        |  round(f3, 6) + 0.0 AS phi_3,
        |  round(ss / n * (1.0 - (f1 * r1 + f2 * r2 + f3 * r3)), 6)
        |    + 0.0 AS sigma2,
        |  round(mu + (f1 * e0 + f2 * e1 + f3 * e2), 6) + 0.0 AS forecast
        |FROM f ORDER BY event_type""".stripMargin,
    // ARMA(1,1) HR replay: AR(1) phi0 rounded, residual lag chain,
    // the 2x2 normal equations, sigma2 from moments at rounded coefs.
    "q_arma" ->
      """WITH e AS (SELECT event_type AS k,
        |    epoch_ns(ts) // 86400000000000 AS p, value AS x
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |cells AS (SELECT k, p,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS v
        |  FROM e GROUP BY k, p),
        |m AS (SELECT k, p, v, avg(v) OVER (PARTITION BY k) AS mu
        |  FROM cells),
        |d AS (SELECT k, p, v, mu, v - mu AS dd,
        |    lag(v - mu) OVER (PARTITION BY k ORDER BY p) AS d1
        |  FROM m),
        |a AS (SELECT k, CAST(count(*) AS BIGINT) AS n, max(mu) AS mu,
        |    sum(dd * dd) AS ss, sum(dd * d1) AS s1 FROM d GROUP BY k),
        |p0 AS (SELECT k, n, mu, round(s1 / ss, 6) AS phi0 FROM a
        |  WHERE n >= 5 AND ss > 0.0),
        |e2 AS (SELECT d.k, d.p, d.dd, d.d1,
        |    CASE WHEN d.d1 IS NOT NULL
        |      THEN d.dd - p0.phi0 * d.d1 END AS er
        |  FROM d JOIN p0 ON d.k = p0.k),
        |l2 AS (SELECT k, p, dd, d1, er,
        |    lag(er) OVER (PARTITION BY k ORDER BY p) AS e1 FROM e2),
        |s2 AS (SELECT k, CAST(count(*) AS BIGINT) AS n2,
        |    sum(d1 * d1) AS s11, sum(d1 * e1) AS s12,
        |    sum(e1 * e1) AS s22, sum(d1 * dd) AS s1y,
        |    sum(e1 * dd) AS s2y, sum(dd * dd) AS syy
        |  FROM l2 WHERE d1 IS NOT NULL AND e1 IS NOT NULL GROUP BY k),
        |co AS (SELECT k, n2, s11, s12, s22, s1y, s2y, syy,
        |    s11 * s22 - s12 * s12 AS det FROM s2),
        |f AS (SELECT k, n2, s11, s12, s22, s1y, s2y, syy,
        |    round((s1y * s22 - s2y * s12) / det, 6) AS phi,
        |    round((s2y * s11 - s1y * s12) / det, 6) AS theta
        |  FROM co WHERE n2 >= 4 AND det > 0.0)
        |SELECT f.k AS event_type, p0.n AS n_periods,
        |  round(p0.mu, 6) + 0.0 AS mean, p0.phi0 + 0.0 AS phi_init,
        |  f.phi + 0.0 AS phi, f.theta + 0.0 AS theta,
        |  round((f.syy - 2.0 * f.phi * f.s1y - 2.0 * f.theta * f.s2y
        |    + f.phi * f.phi * f.s11 + 2.0 * f.phi * f.theta * f.s12
        |    + f.theta * f.theta * f.s22) / f.n2, 6) + 0.0 AS sigma2
        |FROM f JOIN p0 ON f.k = p0.k ORDER BY event_type""".stripMargin,
    // AR(1) in-sample predictions scored by the shared accuracy fold:
    // phi1 = s1/ss per key, fitted = mu + phi1*d_{t-1} (rounded 6, like
    // the engine's long-form output), then MAE/RMSE/MAPE and MASE vs
    // the lag-7 seasonal naive over the same rounded period means.
    "q_ar_accuracy" ->
      """WITH e AS (SELECT event_type AS k,
        |    epoch_ns(ts) // 86400000000000 AS p, value AS x
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |cells AS (SELECT k, p,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS v
        |  FROM e GROUP BY k, p),
        |m AS (SELECT k, p, v, avg(v) OVER (PARTITION BY k) AS mu
        |  FROM cells),
        |d AS (SELECT k, p, v, mu, v - mu AS dd,
        |    lag(v - mu, 1) OVER w AS d1
        |  FROM m WINDOW w AS (PARTITION BY k ORDER BY p)),
        |a AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    sum(dd * dd) AS ss, sum(dd * d1) AS s1
        |  FROM d GROUP BY k),
        |coef AS (SELECT k, s1 / ss AS f1 FROM a
        |  WHERE n >= 3 AND ss > 0.0),
        |fit AS (SELECT d.k, d.p, round(d.v, 6) AS a,
        |    CASE WHEN d.d1 IS NOT NULL
        |      THEN round(d.mu + c.f1 * d.d1, 6) END AS pr
        |  FROM d JOIN coef c ON d.k = c.k),
        |w2 AS (SELECT k, p, a, pr,
        |    lag(a, 7) OVER (PARTITION BY k ORDER BY p) AS nv FROM fit),
        |agg AS (SELECT k,
        |    CAST(sum(CASE WHEN pr IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_scored,
        |    sum(CASE WHEN pr IS NOT NULL THEN abs(a - pr) END) AS sae,
        |    sum(CASE WHEN pr IS NOT NULL
        |      THEN abs(a - pr) * abs(a - pr) END) AS sse,
        |    sum(CASE WHEN pr IS NOT NULL AND a <> 0.0
        |      THEN abs(a - pr) / abs(a) END) AS sape,
        |    CAST(sum(CASE WHEN pr IS NOT NULL AND a <> 0.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS nape,
        |    sum(CASE WHEN nv IS NOT NULL THEN abs(a - nv) END) AS snv,
        |    CAST(sum(CASE WHEN nv IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nnv
        |  FROM w2 GROUP BY k)
        |SELECT k AS event_type, n_scored,
        |  round(sae / n_scored, 6) AS mae,
        |  round(sqrt(sse / n_scored), 6) AS rmse,
        |  CASE WHEN nape > 0 THEN round(sape / nape, 6) END AS mape,
        |  CASE WHEN nnv > 0 AND snv / nnv > 0.0
        |    THEN round((sae / n_scored) / (snv / nnv), 6) END AS mase
        |FROM agg WHERE n_scored > 0
        |ORDER BY event_type""".stripMargin,
    "q_acf" ->
      """WITH e AS (SELECT event_type AS k, epoch_ns(ts) AS tns,
        |    event_id, value AS x
        |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        |    AND ts IS NOT NULL),
        |m AS (SELECT k, tns, event_id, x,
        |    avg(x) OVER (PARTITION BY k) AS mu FROM e),
        |d AS (SELECT k, x - mu AS dd,
        |    lag(x - mu, 1) OVER (PARTITION BY k ORDER BY tns, event_id)
        |      AS d1,
        |    lag(x - mu, 2) OVER (PARTITION BY k ORDER BY tns, event_id)
        |      AS d2,
        |    lag(x - mu, 3) OVER (PARTITION BY k ORDER BY tns, event_id)
        |      AS d3
        |  FROM m)
        |SELECT k AS event_type, CAST(count(*) AS BIGINT) AS n,
        |  CASE WHEN sum(dd * dd) > 0
        |    THEN round(sum(dd * d1) / sum(dd * dd), 6) END AS acf_1,
        |  CASE WHEN sum(dd * dd) > 0
        |    THEN round(sum(dd * d2) / sum(dd * dd), 6) END AS acf_2,
        |  CASE WHEN sum(dd * dd) > 0
        |    THEN round(sum(dd * d3) / sum(dd * dd), 6) END AS acf_3
        |FROM d GROUP BY k ORDER BY event_type""".stripMargin,
    "q_cusum" ->
      """WITH e AS (SELECT event_type AS k, epoch_ns(ts) AS tns,
        |    event_id, CAST(floor(value) AS DOUBLE) AS x
        |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
        |w AS (SELECT k, tns, x,
        |    CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n,
        |    sum(x) OVER (PARTITION BY k) AS s,
        |    sum(x * x) OVER (PARTITION BY k) AS ssq,
        |    sum(x) OVER (PARTITION BY k ORDER BY tns, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
        |    CAST(row_number() OVER (PARTITION BY k
        |      ORDER BY tns, event_id) AS BIGINT) AS i
        |  FROM e),
        |s2 AS (SELECT k, tns, n, s, ssq,
        |    abs(n * cs - i * s) AS num,
        |    ssq / n - (s / n) * (s / n) AS vr FROM w),
        |mx AS (SELECT *, max(num) OVER (PARTITION BY k) AS mxn FROM s2)
        |SELECT k AS event_type, CAST(max(n) AS BIGINT) AS n,
        |  round(max(mxn) / (CAST(max(n) AS DOUBLE) * sqrt(max(vr))
        |    * sqrt(CAST(max(n) AS DOUBLE))), 6) AS cusum,
        |  min(tns) AS cp_ts
        |FROM mx WHERE vr > 0 AND num = mxn
        |GROUP BY k ORDER BY event_type""".stripMargin,
    "q_seasonal_anomaly" ->
      """WITH e AS (SELECT event_type AS k, ts, epoch_ns(ts) AS tns,
        |    event_id, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        |    AND ts IS NOT NULL),
        |l AS (SELECT k, tns, v, lag(v, 7) OVER (PARTITION BY k
        |    ORDER BY tns, event_id) AS expected FROM e),
        |r AS (SELECT k, tns, v, expected, v - expected AS res FROM l
        |  WHERE expected IS NOT NULL),
        |m AS (SELECT *,
        |    CAST(count(*) OVER (PARTITION BY k) AS DOUBLE) AS n,
        |    sum(res) OVER (PARTITION BY k) AS s,
        |    sum(res * res) OVER (PARTITION BY k) AS ss FROM r),
        |z AS (SELECT k AS event_type, tns AS ts, v AS value, expected,
        |    res AS residual,
        |    CASE WHEN ss / n - (s / n) * (s / n) > 0 THEN
        |      round((res - s / n)
        |        / sqrt(ss / n - (s / n) * (s / n)), 6) END AS z
        |  FROM m)
        |SELECT * FROM z WHERE abs(z) > 2.5
        |ORDER BY event_type, ts, value""".stripMargin,
    // Trimmed mean replay: per-group cumulative cell counts, each cell
    // keeps max(0, min(cum, n−⌊αn⌋) − max(cum−c, ⌊αn⌋)) copies.
    "q_trimmed_mean" ->
      """WITH base AS (SELECT l_returnflag AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        |  WHERE l_orderkey < 100000 AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |cells AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM base
        |  GROUP BY g, v),
        |w AS (SELECT *,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n,
        |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM cells),
        |k AS (SELECT *, greatest(0, least(cum, n - lo)
        |      - greatest(cum - c, lo)) AS kept
        |  FROM (SELECT *, CAST(floor(n * 0.1) AS BIGINT) AS lo FROM w))
        |SELECT g AS l_returnflag, CAST(max(n) AS BIGINT) AS n,
        |  CAST(sum(kept) AS BIGINT) AS n_kept,
        |  round(sum(v * kept) / CAST(sum(kept) AS DOUBLE), 6)
        |    AS trimmed_mean
        |FROM k GROUP BY g HAVING sum(kept) > 0
        |ORDER BY g""".stripMargin,
    "q_target_encode" ->
      """WITH base AS (SELECT l_orderkey, l_linenumber, l_linestatus,
        |    CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
        |  FROM lineitem WHERE l_orderkey < 50000),
        |p AS (SELECT avg(y) AS prior FROM base),
        |c AS (SELECT l_linestatus AS cat,
        |    CAST(count(*) AS BIGINT) AS cn, sum(y) AS cs
        |  FROM base GROUP BY 1)
        |SELECT b.l_orderkey, b.l_linenumber,
        |  round((c.cs + 20.0 * p.prior) / (c.cn + 20.0), 6) AS te_smooth,
        |  CASE WHEN c.cn > 1
        |    THEN round((c.cs - b.y) / (c.cn - 1), 6) END AS te_loo
        |FROM base b JOIN c ON b.l_linestatus = c.cat, p
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // Replays the EWMA recurrence in closed form: ewma_i =
    // (1−α)^(i−1)·x₁ + α·Σ_{j=2..i}(1−α)^(i−j)·x_j over each user's
    // rank order (fine at sf0.01 row counts; the ENGINE uses the O(n)
    // scan — this quadratic form exists only for the oracle).
    "q_ewma" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS tns, value
        |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
        |r AS (SELECT event_id, user_id, value, row_number()
        |    OVER (PARTITION BY user_id ORDER BY tns, event_id) AS rn
        |  FROM e)
        |SELECT a.event_id,
        |  round(sum(CASE WHEN b.rn = 1
        |    THEN pow(0.8, a.rn - 1) * b.value
        |    ELSE 0.2 * pow(0.8, a.rn - b.rn) * b.value END), 6)
        |    AS ewma_r
        |FROM r a JOIN r b ON a.user_id = b.user_id AND b.rn <= a.rn
        |GROUP BY a.event_id ORDER BY a.event_id""".stripMargin,
    // The k=2 Cox replay: per Newton step SIX risk-set moment suffix
    // windows (m0, m1a, m1b, m2aa, m2ab, m2bb), score/information sums
    // over event times, and the closed-form symmetric 2x2 solve
    // (Cramer); final pass re-derives the information at beta_2 for the
    // inverse-diagonal standard errors.
    "q_cox_ph2" ->
      """WITH base AS (SELECT CAST(l_quantity AS DOUBLE) AS t,
        |    (l_returnflag <> 'N') AS e,
        |    CAST(l_discount AS DOUBLE) AS x1,
        |    CAST(l_tax AS DOUBLE) AS x2
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND CAST(l_quantity AS DOUBLE) >= 0.0
        |    AND l_returnflag IS NOT NULL
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))
        |    AND l_tax IS NOT NULL
        |    AND NOT isnan(CAST(l_tax AS DOUBLE))),
        |c1 AS (SELECT t, sum(CASE WHEN e THEN 1 ELSE 0 END) AS d,
        |    sum(CASE WHEN e THEN x1 ELSE 0.0 END) AS s1,
        |    sum(CASE WHEN e THEN x2 ELSE 0.0 END) AS s2,
        |    sum(exp(0.0 * x1 + 0.0 * x2)) AS r0,
        |    sum(x1 * exp(0.0 * x1 + 0.0 * x2)) AS r1a,
        |    sum(x2 * exp(0.0 * x1 + 0.0 * x2)) AS r1b,
        |    sum(x1 * x1 * exp(0.0 * x1 + 0.0 * x2)) AS r2aa,
        |    sum(x1 * x2 * exp(0.0 * x1 + 0.0 * x2)) AS r2ab,
        |    sum(x2 * x2 * exp(0.0 * x1 + 0.0 * x2)) AS r2bb
        |  FROM base GROUP BY t),
        |w1 AS (SELECT t, d, s1, s2,
        |    sum(r0) OVER wd AS m0, sum(r1a) OVER wd AS m1a,
        |    sum(r1b) OVER wd AS m1b, sum(r2aa) OVER wd AS m2aa,
        |    sum(r2ab) OVER wd AS m2ab, sum(r2bb) OVER wd AS m2bb
        |  FROM c1 WINDOW wd AS (ORDER BY t DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |n1 AS (SELECT sum(s1 - d * m1a / m0) AS u1,
        |    sum(s2 - d * m1b / m0) AS u2,
        |    sum(d * (m2aa / m0 - (m1a / m0) * (m1a / m0))) AS iaa,
        |    sum(d * (m2ab / m0 - (m1a / m0) * (m1b / m0))) AS iab,
        |    sum(d * (m2bb / m0 - (m1b / m0) * (m1b / m0))) AS ibb
        |  FROM w1 WHERE d > 0),
        |b1 AS (SELECT
        |    (ibb * u1 - iab * u2) / (iaa * ibb - iab * iab) AS bx1,
        |    (iaa * u2 - iab * u1) / (iaa * ibb - iab * iab) AS bx2
        |  FROM n1),
        |c2 AS (SELECT t, any_value(b.bx1) AS pb1, any_value(b.bx2) AS pb2,
        |    sum(CASE WHEN e THEN 1 ELSE 0 END) AS d,
        |    sum(CASE WHEN e THEN x1 ELSE 0.0 END) AS s1,
        |    sum(CASE WHEN e THEN x2 ELSE 0.0 END) AS s2,
        |    sum(exp(x1 * b.bx1 + x2 * b.bx2)) AS r0,
        |    sum(x1 * exp(x1 * b.bx1 + x2 * b.bx2)) AS r1a,
        |    sum(x2 * exp(x1 * b.bx1 + x2 * b.bx2)) AS r1b,
        |    sum(x1 * x1 * exp(x1 * b.bx1 + x2 * b.bx2)) AS r2aa,
        |    sum(x1 * x2 * exp(x1 * b.bx1 + x2 * b.bx2)) AS r2ab,
        |    sum(x2 * x2 * exp(x1 * b.bx1 + x2 * b.bx2)) AS r2bb
        |  FROM base CROSS JOIN b1 b GROUP BY t),
        |w2 AS (SELECT t, d, s1, s2, pb1, pb2,
        |    sum(r0) OVER wd AS m0, sum(r1a) OVER wd AS m1a,
        |    sum(r1b) OVER wd AS m1b, sum(r2aa) OVER wd AS m2aa,
        |    sum(r2ab) OVER wd AS m2ab, sum(r2bb) OVER wd AS m2bb
        |  FROM c2 WINDOW wd AS (ORDER BY t DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |n2 AS (SELECT any_value(pb1) AS pb1, any_value(pb2) AS pb2,
        |    sum(s1 - d * m1a / m0) AS u1,
        |    sum(s2 - d * m1b / m0) AS u2,
        |    sum(d * (m2aa / m0 - (m1a / m0) * (m1a / m0))) AS iaa,
        |    sum(d * (m2ab / m0 - (m1a / m0) * (m1b / m0))) AS iab,
        |    sum(d * (m2bb / m0 - (m1b / m0) * (m1b / m0))) AS ibb
        |  FROM w2 WHERE d > 0),
        |b2 AS (SELECT
        |    pb1 + (ibb * u1 - iab * u2) / (iaa * ibb - iab * iab) AS bx1,
        |    pb2 + (iaa * u2 - iab * u1) / (iaa * ibb - iab * iab) AS bx2
        |  FROM n2),
        |cf AS (SELECT t, sum(CASE WHEN e THEN 1 ELSE 0 END) AS d,
        |    sum(exp(x1 * b.bx1 + x2 * b.bx2)) AS r0,
        |    sum(x1 * exp(x1 * b.bx1 + x2 * b.bx2)) AS r1a,
        |    sum(x2 * exp(x1 * b.bx1 + x2 * b.bx2)) AS r1b,
        |    sum(x1 * x1 * exp(x1 * b.bx1 + x2 * b.bx2)) AS r2aa,
        |    sum(x1 * x2 * exp(x1 * b.bx1 + x2 * b.bx2)) AS r2ab,
        |    sum(x2 * x2 * exp(x1 * b.bx1 + x2 * b.bx2)) AS r2bb
        |  FROM base CROSS JOIN b2 b GROUP BY t),
        |wf AS (SELECT t, d,
        |    sum(r0) OVER wd AS m0, sum(r1a) OVER wd AS m1a,
        |    sum(r1b) OVER wd AS m1b, sum(r2aa) OVER wd AS m2aa,
        |    sum(r2ab) OVER wd AS m2ab, sum(r2bb) OVER wd AS m2bb
        |  FROM cf WINDOW wd AS (ORDER BY t DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |nf AS (SELECT
        |    sum(d * (m2aa / m0 - (m1a / m0) * (m1a / m0))) AS iaa,
        |    sum(d * (m2ab / m0 - (m1a / m0) * (m1b / m0))) AS iab,
        |    sum(d * (m2bb / m0 - (m1b / m0) * (m1b / m0))) AS ibb
        |  FROM wf WHERE d > 0),
        |nn AS (SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS ne
        |  FROM base)
        |SELECT 'l_discount' AS feature,
        |  round_even(b2.bx1 * 1000000.0, 0) / 1000000.0 AS coef_r,
        |  round_even(exp(b2.bx1) * 1000000.0, 0) / 1000000.0 AS hr_r,
        |  round_even(sqrt(nf.ibb / (nf.iaa * nf.ibb - nf.iab * nf.iab))
        |    * 1000000.0, 0) / 1000000.0 AS se_r,
        |  nn.n, nn.ne AS n_events FROM b2, nf, nn
        |UNION ALL
        |SELECT 'l_tax',
        |  round_even(b2.bx2 * 1000000.0, 0) / 1000000.0,
        |  round_even(exp(b2.bx2) * 1000000.0, 0) / 1000000.0,
        |  round_even(sqrt(nf.iaa / (nf.iaa * nf.ibb - nf.iab * nf.iab))
        |    * 1000000.0, 0) / 1000000.0,
        |  nn.n, nn.ne FROM b2, nf, nn
        |ORDER BY feature""".stripMargin,
    // Replays both Lloyd rounds: init = quantized embeddings of
    // vec_id 1..4 (cell = id rank), assignment = squared-Euclidean
    // nearest centroid via a (dist, cell)-ordered row_number window
    // (strict-< lowest index), update = per-(cell, dim) mean QUANTIZED
    // to 6 — the quantization makes the round-2 centroids bit-identical
    // across engines, so sizes and components hash-match.
    "q_kmeans_fixed" ->
      """WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |c0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT)
        |    AS cell,
        |    list_transform(v, x ->
        |      round_even(x * 1000000.0, 0) / 1000000.0) AS v
        |  FROM e WHERE id BETWEEN 1 AND 4),
        |d1 AS (SELECT e.id, c.cell,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))) AS dist
        |  FROM e CROSS JOIN c0 c),
        |a1 AS (SELECT id, cell FROM (SELECT id, cell, row_number()
        |    OVER (PARTITION BY id ORDER BY dist ASC, cell ASC) AS rk
        |  FROM d1) WHERE rk = 1),
        |u1 AS (SELECT a.cell, i.i AS i,
        |    round_even(avg(e.v[i.i]) * 1000000.0, 0) / 1000000.0 AS x
        |  FROM a1 a JOIN e ON e.id = a.id, range(1, 65) i(i)
        |  GROUP BY a.cell, i.i),
        |c1 AS (SELECT cell, list(x ORDER BY i) AS v FROM u1
        |  GROUP BY cell),
        |d2 AS (SELECT e.id, c.cell,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))) AS dist
        |  FROM e CROSS JOIN c1 c),
        |a2 AS (SELECT id, cell FROM (SELECT id, cell, row_number()
        |    OVER (PARTITION BY id ORDER BY dist ASC, cell ASC) AS rk
        |  FROM d2) WHERE rk = 1),
        |u2 AS (SELECT a.cell, i.i AS i,
        |    round_even(avg(e.v[i.i]) * 1000000.0, 0) / 1000000.0 AS x
        |  FROM a2 a JOIN e ON e.id = a.id, range(1, 65) i(i)
        |  GROUP BY a.cell, i.i),
        |c2 AS (SELECT cell, list(x ORDER BY i) AS v FROM u2
        |  GROUP BY cell),
        |d3 AS (SELECT e.id, c.cell,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))) AS dist
        |  FROM e CROSS JOIN c2 c),
        |a3 AS (SELECT id, cell FROM (SELECT id, cell, row_number()
        |    OVER (PARTITION BY id ORDER BY dist ASC, cell ASC) AS rk
        |  FROM d3) WHERE rk = 1),
        |sz AS (SELECT cell, CAST(count(*) AS BIGINT) AS size
        |  FROM a3 GROUP BY cell)
        |SELECT s.cell AS cluster, s.size, c.v[1] AS c1_r, c.v[2] AS c2_r
        |FROM sz s JOIN c2 c USING (cell) ORDER BY cluster""".stripMargin,
    "q_auc_by_group" ->
      """WITH base AS (SELECT l_linestatus AS g,
        |    CAST(l_discount AS DOUBLE) AS v, (l_returnflag = 'R') AS y
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT g, v,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS cp,
        |    CAST(sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT) AS cn
        |  FROM base GROUP BY g, v),
        |w AS (SELECT g, cp, cn,
        |    coalesce(CAST(sum(cn) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS cumn
        |  FROM cells),
        |agged AS (SELECT g, sum(cp * (cumn + 0.5 * cn)) AS u,
        |    CAST(sum(cp) AS BIGINT) AS np,
        |    CAST(sum(cn) AS BIGINT) AS nn
        |  FROM w GROUP BY g)
        |SELECT g AS l_linestatus,
        |  round(u / (CAST(np AS DOUBLE) * nn), 6) AS auc,
        |  u AS u_stat, np AS n_pos, nn AS n_neg
        |FROM agged WHERE np > 0 AND nn > 0
        |ORDER BY l_linestatus""".stripMargin,
    "q_mutual_info" ->
      """WITH cells AS (SELECT l_returnflag AS a, l_linestatus AS b,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
        |  GROUP BY 1, 2),
        |m AS (SELECT a, b, n,
        |    CAST(sum(n) OVER (PARTITION BY a) AS BIGINT) AS na,
        |    CAST(sum(n) OVER (PARTITION BY b) AS BIGINT) AS nb,
        |    CAST(sum(n) OVER () AS BIGINT) AS nt
        |  FROM cells)
        |SELECT round(sum((CAST(n AS DOUBLE) / nt)
        |    * ln((CAST(n AS DOUBLE) * nt)
        |      / (CAST(na AS DOUBLE) * nb))), 6) AS mi,
        |  max(nt) AS n,
        |  CAST(count(DISTINCT a) AS BIGINT) AS n_a,
        |  CAST(count(DISTINCT b) AS BIGINT) AS n_b
        |FROM m""".stripMargin,
    "q_ranking_metrics" ->
      """WITH base AS (SELECT l_orderkey AS q, l_linenumber AS id,
        |    CASE WHEN l_returnflag = 'R' THEN 2.0
        |      WHEN l_returnflag = 'A' THEN 1.0 ELSE 0.0 END AS rel,
        |    CAST(l_discount AS DOUBLE) AS s
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))
        |    AND l_returnflag IS NOT NULL),
        |rk AS (SELECT q, rel,
        |    CAST(row_number() OVER (PARTITION BY q
        |      ORDER BY s DESC, id, rel) AS BIGINT) AS r,
        |    CAST(row_number() OVER (PARTITION BY q ORDER BY rel DESC, id)
        |      AS BIGINT) AS ri
        |  FROM base),
        |ranked AS (SELECT q, rel, r, ri,
        |    CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY q ORDER BY r
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cumrel
        |  FROM rk),
        |agged AS (SELECT q,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_rel,
        |    min(CASE WHEN rel > 0 THEN r END) AS first_r,
        |    sum(CASE WHEN rel > 0 THEN CAST(cumrel AS DOUBLE) / r END)
        |      AS apsum,
        |    sum(CASE WHEN r <= 5
        |      THEN (pow(2.0, rel) - 1.0) / log2(r + 1.0) ELSE 0.0 END)
        |      AS dcg,
        |    sum(CASE WHEN ri <= 5
        |      THEN (pow(2.0, rel) - 1.0) / log2(ri + 1.0) ELSE 0.0 END)
        |      AS idcg
        |  FROM ranked GROUP BY q)
        |SELECT q AS l_orderkey, n, n_rel,
        |  round(1.0 / first_r, 6) AS rr,
        |  CASE WHEN n_rel > 0 THEN round(apsum / n_rel, 6) END AS ap,
        |  round(dcg, 6) AS dcg_k,
        |  round(idcg, 6) AS idcg_k,
        |  CASE WHEN idcg > 0 THEN round(dcg / idcg, 6) END AS ndcg_k
        |FROM agged ORDER BY l_orderkey""".stripMargin,
    "q_corr_by_group" ->
      """WITH base AS (SELECT l_linestatus AS g,
        |    CAST(l_quantity AS DOUBLE) AS q,
        |    CAST(l_extendedprice AS DOUBLE) AS p,
        |    CAST(l_discount AS DOUBLE) AS d
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))),
        |agged AS (SELECT g, count(*) AS n,
        |    corr(q, p) AS r_qp, corr(q, d) AS r_qd, corr(p, d) AS r_pd
        |  FROM base GROUP BY g),
        |long AS (
        |  SELECT g, 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
        |    round(r_qp, 6) AS r, n FROM agged WHERE r_qp IS NOT NULL
        |  UNION ALL
        |  SELECT g, 'l_quantity', 'l_discount', round(r_qd, 6), n
        |  FROM agged WHERE r_qd IS NOT NULL
        |  UNION ALL
        |  SELECT g, 'l_extendedprice', 'l_discount', round(r_pd, 6), n
        |  FROM agged WHERE r_pd IS NOT NULL)
        |SELECT g AS l_linestatus, col_a, col_b, r, CAST(n AS BIGINT) AS n
        |FROM long ORDER BY l_linestatus, col_a, col_b""".stripMargin,
    "q_es_sample_group" ->
      """WITH k AS (SELECT lang, doc_id, n_chars,
        |    -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |        AS BIGINT) + 1.0) / 4294967296.0) / n_chars AS ek
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        |r AS (SELECT lang, doc_id, n_chars, ek,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY ek ASC, doc_id ASC) AS rk
        |  FROM k)
        |SELECT lang, doc_id, n_chars, round(ek, 9) AS es_key_r
        |FROM r WHERE rk <= 20 ORDER BY lang, es_key_r, doc_id""".stripMargin,
    // The Gehan fold: the log-rank replay with weight n(t) on the
    // score and n(t)² on the variance, rounding discipline identical.
    "q_survival_gehan" ->
      s"""WITH base AS (SELECT
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    CAST(l_quantity AS DOUBLE) AS t,
        |    (l_returnflag <> 'N') AS e
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND CAST(l_quantity AS DOUBLE) >= 0.0
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT t,
        |    sum(CASE WHEN g = 'a' AND e THEN 1 ELSE 0 END) AS da,
        |    sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN g = 'b' AND e THEN 1 ELSE 0 END) AS db,
        |    sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS cb
        |  FROM base GROUP BY t),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM cells),
        |w AS (SELECT t, da, db,
        |    CAST(tot.na - coalesce(CAST(sum(ca) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS DOUBLE) AS nat,
        |    CAST(tot.nb - coalesce(CAST(sum(cb) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS DOUBLE) AS nbt,
        |    tot.na AS na, tot.nb AS nb
        |  FROM cells, tot),
        |acc AS (SELECT
        |    round_even(sum(((nat + nbt) / CAST(na + nb AS DOUBLE))
        |      * (da - CAST(da + db AS DOUBLE) * nat / (nat + nbt)))
        |      * 1000000.0, 0) / 1000000.0 AS zn,
        |    round_even(sum(CASE WHEN nat + nbt > 1.0
        |      THEN ((nat + nbt) / CAST(na + nb AS DOUBLE))
        |        * ((nat + nbt) / CAST(na + nb AS DOUBLE))
        |        * (CAST(da + db AS DOUBLE) * (nat / (nat + nbt))
        |          * (nbt / (nat + nbt))
        |          * ((nat + nbt) - CAST(da + db AS DOUBLE))
        |          / ((nat + nbt) - 1.0))
        |      ELSE 0.0 END) * 1000000.0, 0) / 1000000.0 AS v,
        |    max(na) AS na, max(nb) AS nb FROM w),
        |x AS (SELECT CASE WHEN v <= 0.0 THEN 0.0
        |      ELSE round_even(zn * zn / v * 1000000.0, 0)
        |        / 1000000.0 END AS chi2,
        |    zn, v, na, nb FROM acc),
        |ye AS (SELECT chi2, zn, v, na, nb,
        |    sqrt(chi2 / 2.0) AS y FROM x)
        |SELECT chi2, zn AS z_num, v AS var_gw,
        |  round_even(${codyErfcSql("y")} * 1000000.0, 0) / 1000000.0
        |    AS p_value,
        |  na AS n_a, nb AS n_b FROM ye""".stripMargin,
    // The Mann–Whitney AUC identity: prefix-sum of negatives below each
    // distinct score, U exact, auc/gini/Hanley–McNeil SE at the
    // 6-rounded auc.
    "q_auc" ->
      """WITH base AS (SELECT CAST(l_discount AS DOUBLE) AS v,
        |    (l_returnflag = 'R') AS y
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT v,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS cp,
        |    CAST(sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT) AS cn
        |  FROM base GROUP BY v),
        |w AS (SELECT cp, cn,
        |    coalesce(CAST(sum(cn) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS cumn
        |  FROM cells),
        |tot AS (SELECT CAST(sum(cp) AS BIGINT) AS np,
        |    CAST(sum(cn) AS BIGINT) AS nn FROM cells),
        |us AS (SELECT sum(cp * (cumn + 0.5 * cn)) AS u FROM w),
        |a AS (SELECT round_even(us.u / (CAST(tot.np AS DOUBLE) * tot.nn)
        |      * 1000000.0, 0) / 1000000.0 AS auc,
        |    us.u AS u, tot.np AS np, tot.nn AS nn FROM us, tot),
        |q AS (SELECT auc, u, np, nn, auc / (2.0 - auc) AS q1,
        |    2.0 * auc * auc / (1.0 + auc) AS q2 FROM a)
        |SELECT auc,
        |  round_even((2.0 * auc - 1.0) * 1000000.0, 0) / 1000000.0
        |    AS gini,
        |  round_even(sqrt((auc * (1.0 - auc)
        |      + (np - 1) * (q1 - auc * auc)
        |      + (nn - 1) * (q2 - auc * auc))
        |    / (CAST(np AS DOUBLE) * nn)) * 1000000.0, 0) / 1000000.0
        |    AS se,
        |  u AS u_stat, np AS n_pos, nn AS n_neg FROM q""".stripMargin,
    "q_calibration" ->
      """WITH base AS (SELECT CAST(l_discount AS DOUBLE) * 10.0 AS s,
        |    (l_returnflag = 'R') AS y
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_discount IS NOT NULL AND l_returnflag IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE) * 10.0))
        |SELECT least(9, greatest(0, CAST(floor(s * 10) AS INT))) AS bin,
        |  count(*) AS n, round(avg(s), 6) AS mean_score,
        |  round(avg(CASE WHEN y THEN 1.0 ELSE 0.0 END), 6) AS frac_pos
        |FROM base GROUP BY 1 ORDER BY bin""".stripMargin,
    // Lift replay: asc min-rank − 1 = cum − c over score cells, bucket
    // = k − floor(rank·k/n), then cumulative windows over <= k buckets.
    "q_lift" ->
      """WITH base AS (SELECT CAST(l_extendedprice AS DOUBLE) AS s,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT s, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(y) AS BIGINT) AS p FROM base GROUP BY s),
        |r AS (SELECT *,
        |    CAST(sum(c) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(c) OVER () AS BIGINT) AS nt FROM cells),
        |b AS (SELECT 10 - CAST(floor((cum - c) * 10.0 / nt) AS BIGINT)
        |    AS bucket, c, p FROM r),
        |a AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(p) AS BIGINT) AS n_pos FROM b GROUP BY bucket),
        |w AS (SELECT *,
        |    CAST(sum(n) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
        |    CAST(sum(n_pos) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
        |    CAST(sum(n) OVER () AS BIGINT) AS tn,
        |    CAST(sum(n_pos) OVER () AS BIGINT) AS tp FROM a)
        |SELECT bucket, n, n_pos,
        |  round(CAST(n_pos AS DOUBLE) / n, 6) AS rate, cum_n, cum_pos,
        |  CASE WHEN tp > 0 THEN
        |    round(CAST(cum_pos AS DOUBLE) / tp, 6) END AS capture,
        |  CASE WHEN tp > 0 THEN
        |    round((CAST(cum_pos AS DOUBLE) / cum_n)
        |      / (CAST(tp AS DOUBLE) / tn), 6) END AS lift
        |FROM w ORDER BY bucket""".stripMargin,
    // Balance replay: explicit Σx²/n − x̄² population moments per
    // cohort per covariate via UNPIVOT-style unions.
    "q_balance" ->
      """WITH base AS (SELECT
        |    CASE WHEN l_orderkey % 2 = 0 THEN TRUE ELSE FALSE END AS a,
        |    CAST(l_quantity AS DOUBLE) AS l_quantity,
        |    CAST(l_discount AS DOUBLE) AS l_discount,
        |    CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
        |    CAST(l_tax AS DOUBLE) AS l_tax
        |  FROM lineitem WHERE l_orderkey < 100000),
        |long AS (
        |  SELECT a, 'l_quantity' AS covariate, l_quantity AS x FROM base
        |  UNION ALL SELECT a, 'l_discount', l_discount FROM base
        |  UNION ALL SELECT a, 'l_extendedprice', l_extendedprice
        |    FROM base
        |  UNION ALL SELECT a, 'l_tax', l_tax FROM base),
        |agged AS (SELECT covariate,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    sum(CASE WHEN a THEN x ELSE 0.0 END) AS sa,
        |    sum(CASE WHEN NOT a THEN x ELSE 0.0 END) AS sb,
        |    sum(CASE WHEN a THEN x * x ELSE 0.0 END) AS ssa,
        |    sum(CASE WHEN NOT a THEN x * x ELSE 0.0 END) AS ssb
        |  FROM long WHERE x IS NOT NULL AND NOT isnan(x)
        |  GROUP BY covariate),
        |m AS (SELECT *, sa / n_a AS ma, sb / n_b AS mb,
        |    ssa / n_a - (sa / n_a) * (sa / n_a) AS va,
        |    ssb / n_b - (sb / n_b) * (sb / n_b) AS vb
        |  FROM agged WHERE n_a > 0 AND n_b > 0)
        |SELECT covariate, n_a, n_b, round(ma, 6) AS mean_a,
        |  round(mb, 6) AS mean_b,
        |  CASE WHEN (va + vb) / 2.0 > 0 THEN
        |    round((ma - mb) / sqrt((va + vb) / 2.0), 6) END AS smd,
        |  CASE WHEN vb > 0 THEN round(va / vb, 6) END AS var_ratio
        |FROM m ORDER BY covariate""".stripMargin,
    // Welch per group: conditional count/avg/var_samp per cohort, the
    // Welch–Satterthwaite dof, p = erfc(|t|/√2) at the 6-rounded t.
    // Replays the PAV fit through its minimax characterization:
    // iso_i = max_{j<=i} min_{k>=i} mean(y over bins j..k), all block
    // means exact integer ratios from prefix sums over <= 10 bins.
    "q_isotonic" ->
      """WITH base AS (SELECT least(9, greatest(0,
        |      CAST(floor((l_discount * 10.0) * 10) AS INT))) AS bin,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount * 10.0 AS DOUBLE))
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS pos
        |  FROM base GROUP BY bin),
        |ord AS (SELECT bin, n, pos,
        |    CAST(row_number() OVER (ORDER BY bin) AS BIGINT) AS i
        |  FROM cells),
        |pre AS (SELECT *,
        |    CAST(sum(n) OVER (ORDER BY i) AS BIGINT) AS cn,
        |    CAST(sum(pos) OVER (ORDER BY i) AS BIGINT) AS cp
        |  FROM ord),
        |pre2 AS (SELECT *,
        |    coalesce(CAST(lag(cn) OVER (ORDER BY i) AS BIGINT), 0)
        |      AS cnp,
        |    coalesce(CAST(lag(cp) OVER (ORDER BY i) AS BIGINT), 0)
        |      AS cpp
        |  FROM pre),
        |pairavg AS (SELECT jr.i AS j, kr.i AS k,
        |    CAST(kr.cp - jr.cpp AS DOUBLE) / (kr.cn - jr.cnp) AS m
        |  FROM pre2 jr JOIN pre2 kr ON jr.i <= kr.i),
        |step1 AS (SELECT p.j, o.i, min(p.m) AS mn
        |  FROM pairavg p JOIN ord o ON p.j <= o.i AND p.k >= o.i
        |  GROUP BY p.j, o.i),
        |step2 AS (SELECT i, max(mn) AS iso FROM step1 GROUP BY i)
        |SELECT o.bin, o.n, o.pos,
        |  round(CAST(o.pos AS DOUBLE) / o.n, 6) AS rate,
        |  round(s.iso, 6) AS iso_rate
        |FROM ord o JOIN step2 s ON o.i = s.i
        |ORDER BY o.bin""".stripMargin,
    "q_distinctive_terms" ->
      """WITH toks AS (SELECT lang AS g,
        |    unnest(list_filter(regexp_split_to_array(lower(
        |      coalesce(text, '')), '\s+'), x -> x <> '')) AS token
        |  FROM documents WHERE lang IS NOT NULL),
        |cells AS (SELECT g, token, CAST(count(*) AS BIGINT) AS y
        |  FROM toks GROUP BY g, token),
        |vv AS (SELECT CAST(count(DISTINCT token) AS DOUBLE) AS v
        |  FROM cells),
        |w AS (SELECT g, token, y,
        |    CAST(sum(y) OVER (PARTITION BY token) AS BIGINT) AS yw,
        |    CAST(sum(y) OVER (PARTITION BY g) AS BIGINT) AS ng,
        |    CAST(sum(y) OVER () AS BIGINT) AS nt FROM cells),
        |z AS (SELECT g, token, y, yw, ng, nt,
        |    round((ln((CAST(y AS DOUBLE) + 0.01)
        |      / (CAST(ng AS DOUBLE) + 0.01 * vv.v
        |        - CAST(y AS DOUBLE) - 0.01))
        |    - ln((CAST(yw - y AS DOUBLE) + 0.01)
        |      / (CAST(nt - ng AS DOUBLE) + 0.01 * vv.v
        |        - CAST(yw - y AS DOUBLE) - 0.01)))
        |    / sqrt(1.0 / (CAST(y AS DOUBLE) + 0.01)
        |      + 1.0 / (CAST(yw - y AS DOUBLE) + 0.01)), 6) AS z
        |  FROM w, vv),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY g
        |    ORDER BY z DESC, token ASC) AS BIGINT) AS rank FROM z)
        |SELECT g AS "group", token, y AS n_in_group,
        |  CAST(yw - y AS BIGINT) AS n_rest, z, rank
        |FROM r WHERE rank <= 5 ORDER BY "group", rank""".stripMargin,
    // χ² term replay: document-distinct presence, exact-integer 2×2
    // cells, the same left-associative double expression, rank over
    // the ROUNDED chi2.
    "q_chi2_terms" ->
      """WITH base AS (SELECT doc_id AS id,
        |    lower(coalesce(text, '')) AS txt, CAST(lang AS VARCHAR) AS cls
        |  FROM documents WHERE lang IS NOT NULL),
        |tk AS (SELECT DISTINCT id, token FROM (
        |    SELECT id, unnest(list_filter(regexp_split_to_array(txt,
        |      '\s+'), x -> x <> '')) AS token FROM base)),
        |pres AS (SELECT t.id, t.token, bs.cls
        |  FROM tk t JOIN base bs USING (id)),
        |cells AS (SELECT cls, token, CAST(count(*) AS BIGINT) AS a
        |  FROM pres GROUP BY cls, token),
        |dft AS (SELECT token, CAST(count(*) AS BIGINT) AS df_all
        |  FROM pres GROUP BY token),
        |cs AS (SELECT cls, CAST(count(*) AS BIGINT) AS nc
        |  FROM base GROUP BY cls),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
        |sc AS (SELECT c.cls, c.token, c.a, c.a AS aa,
        |    d.df_all - c.a AS b, s.nc, s.nc - c.a AS cc,
        |    n.n - s.nc - (d.df_all - c.a) AS dd, n.n
        |  FROM cells c JOIN dft d USING (token)
        |    JOIN cs s USING (cls), nt n),
        |x AS (SELECT cls, token, nc, a, b,
        |    round(CAST(n AS DOUBLE)
        |      * (CAST(a AS DOUBLE) * dd - CAST(b AS DOUBLE) * cc)
        |      * (CAST(a AS DOUBLE) * dd - CAST(b AS DOUBLE) * cc)
        |      / ((CAST(a AS DOUBLE) + b) * (CAST(cc AS DOUBLE) + dd))
        |      / ((CAST(a AS DOUBLE) + cc) * (CAST(b AS DOUBLE) + dd)),
        |      6) AS chi2
        |  FROM sc),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY cls
        |    ORDER BY chi2 DESC, token ASC) AS BIGINT) AS rank FROM x)
        |SELECT cls, token, nc AS n_class_docs, a AS df_in_class,
        |  b AS df_rest, chi2, rank
        |FROM r WHERE rank <= 5 ORDER BY cls, rank""".stripMargin,
    // Hellinger replay: exact integer cell/total ratios, the identical
    // sqrt-product term, sum folded per group, transforms on the
    // clamped BC.
    "q_hellinger" ->
      """WITH c AS (SELECT l_returnflag AS g,
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS coh,
        |    CAST(l_quantity AS INT) AS v FROM lineitem
        |  WHERE l_quantity IS NOT NULL),
        |cells AS (SELECT g, v,
        |    CAST(sum(CASE WHEN coh = 'a' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN coh = 'b' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cb
        |  FROM c GROUP BY g, v),
        |w AS (SELECT g, ca, cb,
        |    CAST(sum(ca) OVER (PARTITION BY g) AS BIGINT) AS na,
        |    CAST(sum(cb) OVER (PARTITION BY g) AS BIGINT) AS nb
        |  FROM cells),
        |a AS (SELECT g, max(na) AS n_a, max(nb) AS n_b,
        |    CAST(count(*) AS BIGINT) AS n_cells,
        |    sum(sqrt((CAST(ca AS DOUBLE) / na)
        |      * (CAST(cb AS DOUBLE) / nb))) AS bcr
        |  FROM w GROUP BY g HAVING max(na) > 0 AND max(nb) > 0)
        |SELECT g AS l_returnflag, n_a, n_b, n_cells,
        |  round(bcr, 6) AS bc,
        |  round(sqrt(1.0 - least(bcr, 1.0)), 6) AS hellinger,
        |  CASE WHEN bcr > 0.0 THEN round(-ln(least(bcr, 1.0)), 6)
        |    END AS bhattacharyya
        |FROM a ORDER BY l_returnflag""".stripMargin,
    // Mann–Kendall replay: decimal-exact daily means make every
    // pairwise sign and slope bit-identical; S and the tie sums are
    // integers, z is rounded to 6 before the shared Cody erfc.
    "q_mann_kendall" ->
      s"""WITH e AS (SELECT event_type AS k, epoch_ns(ts) AS t,
        |    CAST(value AS DOUBLE) AS v FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |cells AS (SELECT k, t // 86400000000000 AS p,
        |    CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS mv
        |  FROM e GROUP BY k, p),
        |pr AS (SELECT a.k AS k, a.p AS pi, a.mv AS vi,
        |    b.p AS pj, b.mv AS vj
        |  FROM cells a JOIN cells b ON a.k = b.k WHERE a.p < b.p),
        |ss AS (SELECT k, CAST(sum(CASE WHEN vj > vi THEN 1
        |      WHEN vj < vi THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        |  FROM pr GROUP BY k),
        |tg AS (SELECT k, mv, CAST(count(*) AS BIGINT) AS tt
        |  FROM cells GROUP BY k, mv),
        |ti AS (SELECT k, CAST(sum(tt) AS BIGINT) AS m,
        |    CAST(sum(tt * (tt - 1) * (2 * tt + 5)) AS BIGINT) AS tcorr
        |  FROM tg GROUP BY k HAVING sum(tt) >= 3),
        |sl AS (SELECT k, (vj - vi) / CAST(pj - pi AS DOUBLE) AS slope
        |  FROM pr),
        |sr AS (SELECT k, slope,
        |    CAST(row_number() OVER (PARTITION BY k ORDER BY slope)
        |      AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS sm
        |  FROM sl),
        |sen AS (SELECT k, slope AS sen_slope FROM sr
        |  WHERE rn = CAST(floor((sm + 1) / 2.0) AS BIGINT)),
        |st AS (SELECT ti.k AS k, ti.m AS m, ss.s_stat AS s_stat,
        |    (CAST(ti.m AS DOUBLE) * (CAST(ti.m AS DOUBLE) - 1.0)
        |      * (2.0 * CAST(ti.m AS DOUBLE) + 5.0)
        |      - CAST(ti.tcorr AS DOUBLE)) / 18.0 AS vs
        |  FROM ti JOIN ss USING (k)),
        |zz AS (SELECT st.k AS k, m, s_stat, vs, sen_slope,
        |    round(CASE
        |      WHEN s_stat > 0
        |        THEN (CAST(s_stat AS DOUBLE) - 1.0) / sqrt(vs)
        |      WHEN s_stat < 0
        |        THEN (CAST(s_stat AS DOUBLE) + 1.0) / sqrt(vs)
        |      ELSE 0.0 END, 6) AS z
        |  FROM st JOIN sen USING (k) WHERE vs > 0.0),
        |ye AS (SELECT k, m, s_stat, vs, z, sen_slope,
        |    abs(z) / sqrt(2.0) AS y FROM zz)
        |SELECT k AS event_type, m, s_stat, round(vs, 6) AS var_s, z,
        |  round(${codyErfcSql("y")}, 6) AS p_value,
        |  round(sen_slope, 6) AS sen_slope
        |FROM ye ORDER BY event_type""".stripMargin,
    // Pettitt replay: the same daily decimal-exact means, avg ranks
    // from min-rank + tie counts, t-ordered cumsum, integer U_t, and
    // the first argmax of |U| (tie-stable by period).
    "q_pettitt" ->
      """WITH e AS (SELECT event_type AS k, epoch_ns(ts) AS t,
        |    CAST(value AS DOUBLE) AS v FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |cells AS (SELECT k, t // 86400000000000 AS p,
        |    CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS mv
        |  FROM e GROUP BY k, p),
        |r AS (SELECT k, p,
        |    CAST(rank() OVER (PARTITION BY k ORDER BY mv) AS DOUBLE)
        |      + (CAST(count(*) OVER (PARTITION BY k, mv) AS DOUBLE)
        |        - 1.0) / 2.0 AS rv,
        |    CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n
        |  FROM cells),
        |u AS (SELECT k, p, n,
        |    CAST(row_number() OVER (PARTITION BY k ORDER BY p)
        |      AS BIGINT) AS ti,
        |    sum(rv) OVER (PARTITION BY k ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM r),
        |au AS (SELECT k, p, n,
        |    CAST(abs(2.0 * cum - CAST(ti AS DOUBLE)
        |      * CAST(n + 1 AS DOUBLE)) AS BIGINT) AS absu
        |  FROM u WHERE ti < n),
        |pick AS (SELECT k, p, n, absu,
        |    row_number() OVER (PARTITION BY k
        |      ORDER BY absu DESC, p ASC) AS rk FROM au)
        |SELECT k AS event_type, n, absu AS k_stat, p AS cp_period,
        |  round(least(1.0, 2.0 * exp(-6.0 * CAST(absu AS DOUBLE)
        |    * CAST(absu AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |      * CAST(n AS DOUBLE)
        |      + CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))), 6)
        |    AS p_value
        |FROM pick WHERE rk = 1 ORDER BY event_type""".stripMargin,
    // KPSS replay: decimal-exact mean, t-ordered partial sums, every
    // quadratic form as an ordered cumulative sum read at the last
    // row — identical FP association to the Scala fold.
    "q_kpss" ->
      """WITH e AS (SELECT event_type AS k, epoch_ns(ts) AS t,
        |    CAST(value AS DOUBLE) AS v FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |cells AS (SELECT k, t // 86400000000000 AS p,
        |    CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS mv
        |  FROM e GROUP BY k, p),
        |b AS (SELECT k, p, mv,
        |    CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n,
        |    CAST(sum(CAST(mv AS DECIMAL(38,6)))
        |        OVER (PARTITION BY k) AS DOUBLE)
        |      / CAST(count(*) OVER (PARTITION BY k) AS DOUBLE) AS mu
        |  FROM cells),
        |d AS (SELECT k, p, n, mv - mu AS ed FROM b),
        |s AS (SELECT k, p, n, ed,
        |    sum(ed) OVER (PARTITION BY k ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS st,
        |    lag(ed, 1) OVER (PARTITION BY k ORDER BY p) AS e1,
        |    lag(ed, 2) OVER (PARTITION BY k ORDER BY p) AS e2,
        |    lag(ed, 3) OVER (PARTITION BY k ORDER BY p) AS e3,
        |    lag(ed, 4) OVER (PARTITION BY k ORDER BY p) AS e4,
        |    lag(ed, 5) OVER (PARTITION BY k ORDER BY p) AS e5
        |  FROM d),
        |c AS (SELECT k, p, n,
        |    CAST(row_number() OVER (PARTITION BY k ORDER BY p)
        |      AS BIGINT) AS ti,
        |    sum(st * st) OVER (PARTITION BY k ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS css,
        |    sum(ed * ed) OVER (PARTITION BY k ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cg0,
        |    sum(ed * e1) OVER (PARTITION BY k ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cg1,
        |    sum(ed * e2) OVER (PARTITION BY k ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cg2,
        |    sum(ed * e3) OVER (PARTITION BY k ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cg3,
        |    sum(ed * e4) OVER (PARTITION BY k ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cg4,
        |    sum(ed * e5) OVER (PARTITION BY k ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cg5
        |  FROM s),
        |f AS (SELECT k, n, css,
        |    cg0 / CAST(n AS DOUBLE)
        |      + 2.0 * (1.0 - 1.0 / 6.0)
        |        * (coalesce(cg1, 0.0) / CAST(n AS DOUBLE))
        |      + 2.0 * (1.0 - 2.0 / 6.0)
        |        * (coalesce(cg2, 0.0) / CAST(n AS DOUBLE))
        |      + 2.0 * (1.0 - 3.0 / 6.0)
        |        * (coalesce(cg3, 0.0) / CAST(n AS DOUBLE))
        |      + 2.0 * (1.0 - 4.0 / 6.0)
        |        * (coalesce(cg4, 0.0) / CAST(n AS DOUBLE))
        |      + 2.0 * (1.0 - 5.0 / 6.0)
        |        * (coalesce(cg5, 0.0) / CAST(n AS DOUBLE)) AS lrv
        |  FROM c WHERE ti = n)
        |SELECT k AS event_type, n, CAST(5 AS BIGINT) AS lags,
        |  round(css / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * lrv),
        |    6) AS kpss_stat,
        |  round(lrv, 6) AS s2_lrv
        |FROM f WHERE lrv > 0.0 ORDER BY event_type""".stripMargin,
    // Runs-test replay: explicit two-middle type-7 median, drop
    // equal-to-median days, integer run counts, closed-form moments,
    // p via Cody's erfc at the 6-rounded z.
    "q_runs_test" ->
      s"""WITH e AS (SELECT event_type AS k, epoch_ns(ts) AS t,
        |    CAST(value AS DOUBLE) AS v FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |cells AS (SELECT k, t // 86400000000000 AS p,
        |    CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS mv
        |  FROM e GROUP BY k, p),
        |r AS (SELECT k, p, mv,
        |    CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n,
        |    CAST(row_number() OVER (PARTITION BY k ORDER BY mv)
        |      AS BIGINT) AS rn
        |  FROM cells),
        |med AS (SELECT k, sum(mv) / count(*) AS md FROM r
        |  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY k),
        |sg AS (SELECT r.k AS k, r.p AS p,
        |    CASE WHEN r.mv > med.md THEN 1 ELSE 0 END AS s
        |  FROM r JOIN med ON r.k = med.k WHERE r.mv <> med.md),
        |lg AS (SELECT k, s,
        |    lag(s, 1) OVER (PARTITION BY k ORDER BY p) AS prev
        |  FROM sg),
        |agg AS (SELECT k,
        |    CAST(1 + sum(CASE WHEN prev IS NOT NULL AND prev <> s
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
        |    CAST(sum(s) AS BIGINT) AS n1,
        |    CAST(sum(1 - s) AS BIGINT) AS n2
        |  FROM lg GROUP BY k),
        |m AS (SELECT k, n_runs, n1, n2,
        |    2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |      / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0 AS mu,
        |    2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |      * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |        - (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
        |      / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |        * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |        * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0))
        |      AS sig2
        |  FROM agg WHERE n1 > 0 AND n2 > 0),
        |zz AS (SELECT k, n_runs, n1, n2,
        |    round((CAST(n_runs AS DOUBLE) - mu) / sqrt(sig2), 6) AS z
        |  FROM m WHERE sig2 > 0.0),
        |ye AS (SELECT k, n_runs, n1, n2, z,
        |    abs(z) / sqrt(2.0) AS y FROM zz)
        |SELECT k AS event_type, n_runs, n1, n2, z,
        |  round(${codyErfcSql("y")}, 6) AS p_value
        |FROM ye ORDER BY event_type""".stripMargin,
    // CMS replay: the same salted-md5 4×256 counter grid and min-of-
    // cells point estimates — exact integers end to end.
    "q_sketch_cms" ->
      """WITH keys AS (SELECT l_suppkey AS k FROM lineitem
        |  WHERE l_suppkey IS NOT NULL),
        |cells AS (SELECT r.r AS row,
        |    CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':'
        |      || CAST(k AS VARCHAR)), 1, 8)) AS BIGINT) % 256
        |      AS bucket,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM keys, range(4) r(r) GROUP BY 1, 2),
        |probes AS (SELECT DISTINCT CAST(l_suppkey AS VARCHAR) AS key,
        |    l_suppkey AS k
        |  FROM lineitem WHERE l_suppkey < 20),
        |pc AS (SELECT p.key AS key, r.r AS row,
        |    CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':'
        |      || CAST(p.k AS VARCHAR)), 1, 8)) AS BIGINT) % 256
        |      AS bucket
        |  FROM probes p, range(4) r(r))
        |SELECT pc.key AS key,
        |  CAST(min(coalesce(cells.cnt, 0)) AS BIGINT) AS est
        |FROM pc LEFT JOIN cells
        |  ON pc.row = cells.row AND pc.bucket = cells.bucket
        |GROUP BY pc.key ORDER BY key""".stripMargin,
    // PPR replay: the q_pagerank chain with the teleport mass pinned
    // to the seed indicator (1/|S| on seeds, 0 elsewhere).
    "q_ppr" ->
      """WITH base AS (SELECT DISTINCT 's' || l_suppkey AS a,
        |    'p' || l_partkey AS b FROM lineitem
        |  WHERE l_orderkey < 50000),
        |e AS (SELECT a AS src, b AS dst FROM base
        |  UNION ALL SELECT b, a FROM base),
        |deg AS (SELECT src, count(*) AS dg FROM e GROUP BY src),
        |seeds AS (SELECT DISTINCT 's' || l_suppkey AS node
        |  FROM lineitem WHERE l_orderkey < 50000 AND l_suppkey < 5),
        |ns AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM seeds),
        |nodes AS (SELECT DISTINCT src AS node FROM e
        |  UNION SELECT DISTINCT dst FROM e),
        |ev AS (SELECT n.node AS node,
        |    CASE WHEN s.node IS NOT NULL THEN 1.0 / ns.c
        |      ELSE 0.0 END AS ev
        |  FROM nodes n LEFT JOIN seeds s ON n.node = s.node, ns),
        |r0 AS (SELECT node, ev AS r FROM ev),
        |r1 AS (SELECT v.node AS node, v.ev AS ev,
        |    0.15 * v.ev + 0.85 * coalesce(c.s, 0.0) AS r
        |  FROM ev v LEFT JOIN (SELECT e.dst, sum(p.r / d.dg) AS s
        |    FROM e JOIN deg d ON e.src = d.src
        |    JOIN r0 p ON p.node = e.src GROUP BY e.dst) c
        |  ON v.node = c.dst),
        |r2 AS (SELECT v.node AS node, v.ev AS ev,
        |    0.15 * v.ev + 0.85 * coalesce(c.s, 0.0) AS r
        |  FROM r1 v LEFT JOIN (SELECT e.dst, sum(p.r / d.dg) AS s
        |    FROM e JOIN deg d ON e.src = d.src
        |    JOIN r1 p ON p.node = e.src GROUP BY e.dst) c
        |  ON v.node = c.dst),
        |r3 AS (SELECT v.node AS node,
        |    0.15 * v.ev + 0.85 * coalesce(c.s, 0.0) AS r
        |  FROM r2 v LEFT JOIN (SELECT e.dst, sum(p.r / d.dg) AS s
        |    FROM e JOIN deg d ON e.src = d.src
        |    JOIN r2 p ON p.node = e.src GROUP BY e.dst) c
        |  ON v.node = c.dst)
        |SELECT node, round(r, 6) AS rank_r FROM r3
        |ORDER BY node""".stripMargin,
    // K-core replay: four unconditional peel rounds (peeling only
    // removes, so the engine's early stop cannot diverge).
    "q_kcore" ->
      """WITH raw AS (SELECT 's' || l_suppkey AS a,
        |    'p' || l_partkey AS b FROM lineitem
        |  WHERE l_orderkey < 50000),
        |e0 AS (SELECT DISTINCT a, b FROM (
        |  SELECT a, b FROM raw WHERE a <> b
        |  UNION ALL SELECT b AS a, a AS b FROM raw WHERE a <> b)),
        |d1 AS (SELECT a, count(*) AS d FROM e0 GROUP BY a),
        |k1 AS (SELECT a FROM d1 WHERE d >= 3),
        |e1 AS (SELECT e0.a AS a, e0.b AS b FROM e0
        |  JOIN k1 ON e0.a = k1.a JOIN k1 kb ON e0.b = kb.a),
        |d2 AS (SELECT a, count(*) AS d FROM e1 GROUP BY a),
        |k2 AS (SELECT a FROM d2 WHERE d >= 3),
        |e2 AS (SELECT e1.a AS a, e1.b AS b FROM e1
        |  JOIN k2 ON e1.a = k2.a JOIN k2 kb ON e1.b = kb.a),
        |d3 AS (SELECT a, count(*) AS d FROM e2 GROUP BY a),
        |k3 AS (SELECT a FROM d3 WHERE d >= 3),
        |e3 AS (SELECT e2.a AS a, e2.b AS b FROM e2
        |  JOIN k3 ON e2.a = k3.a JOIN k3 kb ON e2.b = kb.a),
        |d4 AS (SELECT a, count(*) AS d FROM e3 GROUP BY a),
        |k4 AS (SELECT a FROM d4 WHERE d >= 3),
        |e4 AS (SELECT e3.a AS a, e3.b AS b FROM e3
        |  JOIN k4 ON e3.a = k4.a JOIN k4 kb ON e3.b = kb.a)
        |SELECT a AS node, CAST(count(*) AS BIGINT) AS degree
        |FROM e4 GROUP BY a ORDER BY node""".stripMargin,
    // Fixed-effects replay: per-unit demeaning windows, one pooled
    // moment fold, the same se/t/r2 op order.
    "q_fixed_effects" ->
      """WITH c AS (SELECT l_suppkey AS u,
        |    CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) / 1000 AS y
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_suppkey IS NOT NULL
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE) / 1000)),
        |d AS (SELECT u,
        |    x - avg(x) OVER (PARTITION BY u) AS xd,
        |    y - avg(y) OVER (PARTITION BY u) AS yd FROM c),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(DISTINCT u) AS BIGINT) AS n_units,
        |    sum(xd * xd) AS sxx, sum(yd * yd) AS syy,
        |    sum(xd * yd) AS sxy FROM d),
        |f AS (SELECT n, n_units, sxx, syy, sxy,
        |    sxy / sxx AS beta,
        |    CAST(n AS DOUBLE) - CAST(n_units AS DOUBLE) - 1.0 AS dof
        |  FROM a WHERE sxx > 0.0 AND syy > 0.0),
        |g AS (SELECT n, n_units, beta, syy, sxy,
        |    sqrt((syy - beta * sxy) / dof / sxx) AS se
        |  FROM f WHERE dof > 0.0)
        |SELECT n, n_units, round(beta, 6) AS beta, round(se, 6) AS se,
        |  round(beta / se, 6) AS t_stat,
        |  round(beta * sxy / syy, 6) AS within_r2
        |FROM g""".stripMargin,
    // BFS replay: three Bellman-Ford min-relax rounds over the same
    // bidirectional edge set — after k rounds every node within k hops
    // carries its exact distance, and the dist <= k filter drops the
    // provisional tails, so the result equals frontier BFS.
    "q_bfs" ->
      """WITH base AS (SELECT DISTINCT
        |    's' || CAST(l_suppkey AS VARCHAR) AS a,
        |    'p' || CAST(l_partkey AS VARCHAR) AS b
        |  FROM lineitem WHERE l_orderkey < 50000),
        |e AS (SELECT a AS src, b AS dst FROM base
        |  UNION ALL SELECT b AS src, a AS dst FROM base),
        |g0 AS (SELECT DISTINCT
        |    's' || CAST(l_suppkey AS VARCHAR) AS node,
        |    CAST(0 AS BIGINT) AS dist
        |  FROM lineitem WHERE l_orderkey < 50000 AND l_suppkey < 5),
        |g1 AS (SELECT node, min(dist) AS dist FROM (
        |    SELECT node, dist FROM g0
        |    UNION ALL
        |    SELECT e.dst AS node, g.dist + 1 AS dist
        |    FROM e JOIN g0 g ON e.src = g.node) GROUP BY node),
        |g2 AS (SELECT node, min(dist) AS dist FROM (
        |    SELECT node, dist FROM g1
        |    UNION ALL
        |    SELECT e.dst AS node, g.dist + 1 AS dist
        |    FROM e JOIN g1 g ON e.src = g.node) GROUP BY node),
        |g3 AS (SELECT node, min(dist) AS dist FROM (
        |    SELECT node, dist FROM g2
        |    UNION ALL
        |    SELECT e.dst AS node, g.dist + 1 AS dist
        |    FROM e JOIN g2 g ON e.src = g.node) GROUP BY node)
        |SELECT node, CAST(dist AS BIGINT) AS dist FROM g3
        |WHERE dist <= 3 ORDER BY node""".stripMargin,
    // LDA replay: the same 12 moment sums, pooled covariance, 2×2
    // adjugate inverse, and midpoint threshold — identical op order.
    "q_lda" ->
      """WITH c AS (SELECT (l_returnflag = 'R') AS y,
        |    CAST(l_quantity AS DOUBLE) AS x1,
        |    CAST(l_discount AS DOUBLE) * 100 AS x2
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE) * 100)
        |    AND l_returnflag IS NOT NULL),
        |a AS (SELECT
        |    CAST(sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n0,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    sum(CASE WHEN NOT y THEN x1 ELSE 0.0 END) AS sx0,
        |    sum(CASE WHEN NOT y THEN x2 ELSE 0.0 END) AS sy0,
        |    sum(CASE WHEN NOT y THEN x1 * x1 ELSE 0.0 END) AS sxx0,
        |    sum(CASE WHEN NOT y THEN x2 * x2 ELSE 0.0 END) AS syy0,
        |    sum(CASE WHEN NOT y THEN x1 * x2 ELSE 0.0 END) AS sxy0,
        |    sum(CASE WHEN y THEN x1 ELSE 0.0 END) AS sx1,
        |    sum(CASE WHEN y THEN x2 ELSE 0.0 END) AS sy1,
        |    sum(CASE WHEN y THEN x1 * x1 ELSE 0.0 END) AS sxx1,
        |    sum(CASE WHEN y THEN x2 * x2 ELSE 0.0 END) AS syy1,
        |    sum(CASE WHEN y THEN x1 * x2 ELSE 0.0 END) AS sxy1
        |  FROM c),
        |m AS (SELECT n0, n1,
        |    sx0 / CAST(n0 AS DOUBLE) AS mx0,
        |    sy0 / CAST(n0 AS DOUBLE) AS my0,
        |    sx1 / CAST(n1 AS DOUBLE) AS mx1,
        |    sy1 / CAST(n1 AS DOUBLE) AS my1,
        |    sxx0, syy0, sxy0, sxx1, syy1, sxy1 FROM a),
        |s AS (SELECT n0, n1, mx0, my0, mx1, my1,
        |    (sxx0 - CAST(n0 AS DOUBLE) * mx0 * mx0
        |      + sxx1 - CAST(n1 AS DOUBLE) * mx1 * mx1)
        |      / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) - 2.0)
        |      AS sxx,
        |    (syy0 - CAST(n0 AS DOUBLE) * my0 * my0
        |      + syy1 - CAST(n1 AS DOUBLE) * my1 * my1)
        |      / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) - 2.0)
        |      AS syy,
        |    (sxy0 - CAST(n0 AS DOUBLE) * mx0 * my0
        |      + sxy1 - CAST(n1 AS DOUBLE) * mx1 * my1)
        |      / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) - 2.0)
        |      AS sxy
        |  FROM m),
        |w AS (SELECT n0, n1, mx0, my0, mx1, my1, sxx, syy, sxy,
        |    sxx * syy - sxy * sxy AS det,
        |    mx1 - mx0 AS dx, my1 - my0 AS dy FROM s),
        |v AS (SELECT n0, n1, mx0, my0, mx1, my1, det,
        |    (syy * dx - sxy * dy) / det AS wxr,
        |    (sxx * dy - sxy * dx) / det AS wyr,
        |    dx, dy FROM w),
        |z AS (SELECT n0, n1, mx0, my0, mx1, my1, det,
        |    wxr, wyr, dx * wxr + dy * wyr AS j,
        |    sqrt(wxr * wxr + wyr * wyr) AS nrm FROM v)
        |SELECT n0, n1,
        |  round(wxr / nrm, 6) AS w1,
        |  round(wyr / nrm, 6) AS w2,
        |  round(wxr / nrm * (mx0 + mx1) / 2.0
        |    + wyr / nrm * (my0 + my1) / 2.0, 6) AS threshold,
        |  round(j, 6) AS j_stat
        |FROM z WHERE n0 >= 2 AND n1 >= 2 AND det > 0.0 AND nrm > 0.0""".stripMargin,
    // ZIP replay: the same dense user×day×type grid with zero-filled
    // counts, then the closed-form moment inversion.
    "q_zip_moments" ->
      """WITH e AS (SELECT user_id, event_type,
        |    epoch_ns(ts) // 86400000000000 AS day
        |  FROM events WHERE user_id IS NOT NULL
        |    AND ts IS NOT NULL AND event_type IS NOT NULL),
        |grid AS (SELECT u.user_id, d.day, t.event_type
        |  FROM (SELECT DISTINCT user_id FROM e ORDER BY user_id LIMIT 200) u,
        |    (SELECT DISTINCT day FROM e ORDER BY day LIMIT 400) d,
        |    (SELECT DISTINCT event_type FROM e) t),
        |c AS (SELECT user_id, day, event_type,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM e GROUP BY 1, 2, 3),
        |fl AS (SELECT g.event_type AS event_type,
        |    CAST(coalesce(c.c, 0) AS DOUBLE) AS v
        |  FROM grid g LEFT JOIN c ON g.user_id = c.user_id
        |    AND g.day = c.day AND g.event_type = c.event_type),
        |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    avg(v) AS m, var_samp(v) AS s2
        |  FROM fl GROUP BY 1)
        |SELECT event_type, n, round(m, 6) AS mean,
        |  round(s2, 6) AS variance,
        |  round(m + s2 / m - 1.0, 6) AS lambda,
        |  round((s2 - m) / (m * m + s2 - m), 6) AS pi
        |FROM a WHERE n >= 2 AND m > 0.0 AND s2 > m
        |ORDER BY event_type""".stripMargin,
    // ECOD replay: exact integer tail counts via RANGE windows
    // (ties included both directions), the same −ln sums left-
    // associated, top-20 at the ROUNDED score.
    "q_ecod" ->
      """WITH c AS (SELECT
        |    l_orderkey * 10 + l_linenumber AS id,
        |    CAST(l_quantity AS DOUBLE) AS x0,
        |    CAST(l_extendedprice AS DOUBLE) AS x1,
        |    CAST(l_discount AS DOUBLE) AS x2
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM c),
        |r AS (SELECT id,
        |    CAST(count(*) OVER (ORDER BY x0 RANGE BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS DOUBLE) AS le0,
        |    CAST(count(*) OVER (ORDER BY x0 DESC RANGE BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS ge0,
        |    CAST(count(*) OVER (ORDER BY x1 RANGE BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS DOUBLE) AS le1,
        |    CAST(count(*) OVER (ORDER BY x1 DESC RANGE BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS ge1,
        |    CAST(count(*) OVER (ORDER BY x2 RANGE BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS DOUBLE) AS le2,
        |    CAST(count(*) OVER (ORDER BY x2 DESC RANGE BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS ge2
        |  FROM c),
        |s AS (SELECT id,
        |    round((- ln(le0 / nn.n)) + (- ln(le1 / nn.n))
        |      + (- ln(le2 / nn.n)), 6) AS s_left,
        |    round((- ln(ge0 / nn.n)) + (- ln(ge1 / nn.n))
        |      + (- ln(ge2 / nn.n)), 6) AS s_right
        |  FROM r, nn)
        |SELECT id, s_left, s_right,
        |  greatest(s_left, s_right) AS score
        |FROM s ORDER BY score DESC, id ASC LIMIT 20""".stripMargin,
    // Sequence-pattern replay: the same per-user lead trigrams,
    // distinct-user support, and the (support desc, pattern asc)
    // rank-limited take.
    "q_seq_patterns" ->
      """WITH e AS (SELECT user_id AS k, epoch_ns(ts) AS t, event_id,
        |    event_type AS t0 FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        |l AS (SELECT k, t0,
        |    lead(t0, 1) OVER (PARTITION BY k ORDER BY t, event_id)
        |      AS t1,
        |    lead(t0, 2) OVER (PARTITION BY k ORDER BY t, event_id)
        |      AS t2
        |  FROM e),
        |p AS (SELECT t0 || '>' || t1 || '>' || t2 AS pattern, k
        |  FROM l WHERE t1 IS NOT NULL AND t2 IS NOT NULL),
        |a AS (SELECT pattern,
        |    CAST(count(DISTINCT k) AS BIGINT) AS support,
        |    CAST(count(*) AS BIGINT) AS occurrences
        |  FROM p GROUP BY 1)
        |SELECT pattern, support, occurrences FROM a
        |WHERE support >= 2
        |ORDER BY support DESC, pattern ASC LIMIT 25""".stripMargin,
    // Candidate-key replay: per-set tuple counts, exact distinct and
    // duplicate-row tallies, UNION ALL across the three sets.
    "q_candidate_keys" ->
      """WITH s1 AS (SELECT CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_orderkey IS NOT NULL
        |  GROUP BY CAST(l_orderkey AS VARCHAR)),
        |s2 AS (SELECT CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
        |  GROUP BY CAST(l_orderkey AS VARCHAR),
        |    CAST(l_linenumber AS VARCHAR)),
        |s3 AS (SELECT CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_partkey IS NOT NULL
        |  GROUP BY CAST(l_partkey AS VARCHAR)),
        |u AS (
        |  SELECT 'l_orderkey' AS key_cols,
        |    CAST(coalesce(sum(c), 0) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_distinct,
        |    CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0)
        |      AS BIGINT) AS n_dup_rows
        |  FROM s1
        |  UNION ALL
        |  SELECT 'l_orderkey,l_linenumber',
        |    CAST(coalesce(sum(c), 0) AS BIGINT),
        |    CAST(count(*) AS BIGINT),
        |    CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0)
        |      AS BIGINT)
        |  FROM s2
        |  UNION ALL
        |  SELECT 'l_partkey',
        |    CAST(coalesce(sum(c), 0) AS BIGINT),
        |    CAST(count(*) AS BIGINT),
        |    CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0)
        |      AS BIGINT)
        |  FROM s3)
        |SELECT key_cols, n_rows, n_distinct, n_dup_rows,
        |  (n_rows = n_distinct AND n_rows > 0) AS is_key
        |FROM u ORDER BY key_cols""".stripMargin,
    // FD replay: distinct (determinant, dependent) pairs, then the
    // determinant-group cardinality reduction.
    "q_fd_check" ->
      """WITH d AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS det,
        |    CAST(event_type AS VARCHAR) AS dep
        |  FROM events WHERE user_id IS NOT NULL),
        |g AS (SELECT det, CAST(count(*) AS BIGINT) AS card
        |  FROM d GROUP BY det)
        |SELECT CAST(count(*) AS BIGINT) AS n_det_groups,
        |  CAST(coalesce(sum(CASE WHEN card > 1 THEN 1 END), 0)
        |    AS BIGINT) AS n_violating_groups,
        |  CAST(coalesce(max(card), 0) AS BIGINT) AS max_dep_card,
        |  (coalesce(sum(CASE WHEN card > 1 THEN 1 END), 0) = 0
        |    AND count(*) > 0) AS holds
        |FROM g""".stripMargin,
    // Inequality replay: the same one-pass moment sums and index
    // algebra (Theil, Atkinson(1), population CV).
    "q_inequality" ->
      """WITH c AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v,
        |    l_returnflag
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND CAST(l_extendedprice AS DOUBLE) > 0.0),
        |a AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    sum(v) AS s, sum(v * v) AS ss,
        |    sum(v * ln(v)) AS sxl, sum(ln(v)) AS sl
        |  FROM c GROUP BY l_returnflag),
        |m AS (SELECT l_returnflag, n, s,
        |    s / CAST(n AS DOUBLE) AS mu, ss, sxl, sl FROM a)
        |SELECT l_returnflag, n, round(mu, 6) AS mean,
        |  round(sxl / (CAST(n AS DOUBLE) * mu) - ln(mu), 6)
        |    AS theil_t,
        |  round(1.0 - exp(sl / CAST(n AS DOUBLE)) / mu, 6)
        |    AS atkinson_1,
        |  round(CASE WHEN ss / CAST(n AS DOUBLE) - mu * mu > 0.0
        |    THEN sqrt(ss / CAST(n AS DOUBLE) - mu * mu)
        |    ELSE 0.0 END / mu, 6) AS cv
        |FROM m WHERE n >= 2 AND s > 0.0
        |ORDER BY l_returnflag""".stripMargin,
    // Periodogram replay: the same daily decimal-exact means, centered
    // residuals, and per-(key, freq) t-ordered trig cumsums read at
    // the last row.
    "q_periodogram" ->
      """WITH e AS (SELECT event_type AS k, epoch_ns(ts) AS t,
        |    CAST(value AS DOUBLE) AS v FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |cells AS (SELECT k, t // 86400000000000 AS p,
        |    CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS mv
        |  FROM e GROUP BY k, p),
        |b AS (SELECT k, p, mv,
        |    CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n,
        |    CAST(sum(CAST(mv AS DECIMAL(38,6)))
        |        OVER (PARTITION BY k) AS DOUBLE)
        |      / CAST(count(*) OVER (PARTITION BY k) AS DOUBLE) AS mu,
        |    CAST(row_number() OVER (PARTITION BY k ORDER BY p) - 1
        |      AS DOUBLE) AS ti
        |  FROM cells),
        |x AS (SELECT k, p, n, ti, mv - mu AS ed FROM b),
        |f AS (SELECT x.k AS k, x.p AS p, x.n AS n, j.j AS j, x.ti
        |    AS ti, x.ed AS ed FROM x, range(1, 7) j(j)),
        |c AS (SELECT k, p, n, j,
        |    sum(ed * cos(2.0 * pi() * CAST(j AS DOUBLE) * ti
        |      / CAST(n AS DOUBLE)))
        |      OVER (PARTITION BY k, j ORDER BY p
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS ca,
        |    sum(ed * sin(2.0 * pi() * CAST(j AS DOUBLE) * ti
        |      / CAST(n AS DOUBLE)))
        |      OVER (PARTITION BY k, j ORDER BY p
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cb,
        |    row_number() OVER (PARTITION BY k, j ORDER BY p) AS rn
        |  FROM f)
        |SELECT k AS event_type, n, CAST(j AS BIGINT) AS freq,
        |  round((ca * ca + cb * cb) / CAST(n AS DOUBLE), 6) AS power
        |FROM c WHERE rn = n ORDER BY event_type, freq""".stripMargin,
    // Newey-West replay: decimal-exact per-key moment windows, the
    // same closed-form OLS residual per cell, five Bartlett lag sums
    // with the engine's driver-folded weight expressions.
    "q_newey_west" ->
      """WITH e AS (SELECT event_type AS k,
        |    epoch_ns(ts) // 86400000000000 AS p, value AS x
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |cells AS (SELECT k, p,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS v
        |  FROM e GROUP BY k, p),
        |m AS (SELECT k, p, v,
        |    CAST(count(*) OVER w AS BIGINT) AS n,
        |    CAST(sum(CAST(p AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sp,
        |    CAST(sum(CAST(v AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sv,
        |    CAST(sum(CAST(CAST(p AS DOUBLE) * CAST(p AS DOUBLE)
        |      AS DECIMAL(38,6))) OVER w AS DOUBLE) AS spp,
        |    CAST(sum(CAST(CAST(p AS DOUBLE) * v AS DECIMAL(38,6)))
        |      OVER w AS DOUBLE) AS spv
        |  FROM cells WINDOW w AS (PARTITION BY k)),
        |d AS (SELECT k, p, v, n, sp, sv,
        |    spp - sp * sp / CAST(n AS DOUBLE) AS sxx,
        |    spv - sp * sv / CAST(n AS DOUBLE) AS sxy FROM m),
        |r AS (SELECT k, p, v, n, sp, sxx, sxy / sxx AS slope,
        |    sv / CAST(n AS DOUBLE) - sxy / sxx
        |      * (sp / CAST(n AS DOUBLE)) AS icept FROM d),
        |g AS (SELECT k, p, n, sxx, slope,
        |    v - (icept + slope * CAST(p AS DOUBLE)) AS u,
        |    (CAST(p AS DOUBLE) - sp / CAST(n AS DOUBLE))
        |      * (v - (icept + slope * CAST(p AS DOUBLE))) AS g
        |  FROM r),
        |lg AS (SELECT k, n, sxx, slope, u, g,
        |    lag(g, 1) OVER wo AS g1, lag(g, 2) OVER wo AS g2,
        |    lag(g, 3) OVER wo AS g3, lag(g, 4) OVER wo AS g4,
        |    lag(g, 5) OVER wo AS g5
        |  FROM g WINDOW wo AS (PARTITION BY k ORDER BY p)),
        |a AS (SELECT k, max(n) AS n_periods, max(sxx) AS sxx,
        |    max(slope) AS slope_raw, sum(u * u) AS su2,
        |    sum(g * g) AS s0,
        |    2.0 * (1.0 - 1.0 / 6.0) * sum(g * g1)
        |      + 2.0 * (1.0 - 2.0 / 6.0) * sum(g * g2)
        |      + 2.0 * (1.0 - 3.0 / 6.0) * sum(g * g3)
        |      + 2.0 * (1.0 - 4.0 / 6.0) * sum(g * g4)
        |      + 2.0 * (1.0 - 5.0 / 6.0) * sum(g * g5) AS meat_l
        |  FROM lg GROUP BY k)
        |SELECT k AS event_type, n_periods,
        |  round(slope_raw, 6) + 0.0 AS slope,
        |  round(sqrt((su2 / (CAST(n_periods AS DOUBLE) - 2.0)) / sxx),
        |    6) AS se_ols,
        |  round(sqrt(s0 + meat_l) / sxx, 6) AS se_hac,
        |  round((sqrt(s0 + meat_l) / sxx)
        |    / sqrt((su2 / (CAST(n_periods AS DOUBLE) - 2.0)) / sxx), 6)
        |    AS hac_ratio
        |FROM a WHERE n_periods > 7 AND sxx > 0.0
        |ORDER BY event_type""".stripMargin,
    // Croston replay: positive daily demand sums, the z/p smoothing
    // recursion as a RECURSIVE CTE (seeds CAST to DOUBLE), the same
    // driver-folded SBA constant expression.
    "q_croston" ->
      """WITH RECURSIVE e AS (SELECT event_type AS k,
        |    epoch_ns(ts) // 86400000000000 AS p, value AS x
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value) AND value > 95),
        |cells AS (SELECT k, p,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS v
        |  FROM e GROUP BY k, p
        |  HAVING CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) > 0.0),
        |nb AS (SELECT k, p, v,
        |    CAST(row_number() OVER (PARTITION BY k ORDER BY p)
        |      AS BIGINT) AS rn FROM cells),
        |r AS (
        |  SELECT k, p, v AS size, CAST(1 AS BIGINT) AS itv, rn,
        |    CAST(v AS DOUBLE) AS z, CAST(1.0 AS DOUBLE) AS psm
        |  FROM nb WHERE rn = 1
        |  UNION ALL
        |  SELECT n.k, n.p, n.v, n.p - r.p, n.rn,
        |    r.z + 0.3 * (n.v - r.z),
        |    r.psm + 0.3 * (CAST(n.p - r.p AS DOUBLE) - r.psm)
        |  FROM r JOIN nb n ON n.k = r.k AND n.rn = r.rn + 1)
        |SELECT k AS event_type, p AS period, round(size, 6) AS size,
        |  itv AS "interval", round(z, 6) AS z,
        |  round(psm, 6) AS p_smooth, round(z / psm, 6) AS forecast,
        |  round((1.0 - 0.3 / 2.0) * (z / psm), 6) AS sba
        |FROM r ORDER BY event_type, period""".stripMargin,
    // Theta replay: t-ORDERED aggregate moment sums (the engine folds
    // the collected sorted series left-to-right), closed-form trend,
    // the SES-on-theta2 recursion, the averaged one-step combination.
    "q_theta_forecast" ->
      """WITH RECURSIVE e AS (SELECT event_type AS k,
        |    epoch_ns(ts) // 86400000000000 AS p, value AS x
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |cells AS (SELECT k, p,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS v
        |  FROM e GROUP BY k, p),
        |nb AS (SELECT k, p, v,
        |    CAST(row_number() OVER (PARTITION BY k ORDER BY p)
        |      AS BIGINT) AS rn FROM cells),
        |c0 AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(p AS DOUBLE) ORDER BY p) AS sp,
        |    sum(v ORDER BY p) AS sv,
        |    sum(CAST(p AS DOUBLE) * CAST(p AS DOUBLE) ORDER BY p)
        |      AS spp,
        |    sum(CAST(p AS DOUBLE) * v ORDER BY p) AS spv,
        |    max(p) AS plast
        |  FROM nb GROUP BY k),
        |coef AS (SELECT k, n, plast,
        |    (spv - sp * sv / CAST(n AS DOUBLE))
        |      / (spp - sp * sp / CAST(n AS DOUBLE)) AS b,
        |    sv / CAST(n AS DOUBLE)
        |      - (spv - sp * sv / CAST(n AS DOUBLE))
        |        / (spp - sp * sp / CAST(n AS DOUBLE))
        |        * (sp / CAST(n AS DOUBLE)) AS a
        |  FROM c0 WHERE n >= 3
        |    AND spp - sp * sp / CAST(n AS DOUBLE) > 0.0),
        |r AS (
        |  SELECT nb.k, nb.rn,
        |    2.0 * nb.v - (c.a + c.b * CAST(nb.p AS DOUBLE)) AS ses
        |  FROM nb JOIN coef c ON nb.k = c.k WHERE nb.rn = 1
        |  UNION ALL
        |  SELECT n.k, n.rn,
        |    r.ses + 0.3 * ((2.0 * n.v
        |      - (c.a + c.b * CAST(n.p AS DOUBLE))) - r.ses)
        |  FROM r JOIN nb n ON n.k = r.k AND n.rn = r.rn + 1
        |    JOIN coef c ON c.k = n.k)
        |SELECT c.k AS event_type, c.n AS n_periods,
        |  round(c.a, 6) + 0.0 AS trend_a,
        |  round(c.b, 6) + 0.0 AS trend_b,
        |  round(r.ses, 6) + 0.0 AS ses_theta2,
        |  round(0.5 * (c.a + c.b * CAST(c.plast + 1 AS DOUBLE))
        |    + 0.5 * r.ses, 6) + 0.0 AS forecast
        |FROM coef c JOIN r ON r.k = c.k AND r.rn = c.n
        |ORDER BY event_type""".stripMargin,
    // Growth-accounting replay: (user, day) distinct, per-user
    // lag/lead flags, the day aggregation, full-outer churn join.
    "q_growth_accounting" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u,
        |    epoch_ns(ts) // 86400000000000 AS d
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |f AS (SELECT u, d,
        |    lag(d) OVER w AS prevd, lead(d) OVER w AS nextd
        |  FROM ud WINDOW w AS (PARTITION BY u ORDER BY d)),
        |g AS (SELECT d, prevd, nextd,
        |    prevd IS NULL AS is_new,
        |    prevd = d - 1 AS is_retained,
        |    prevd IS NOT NULL AND prevd < d - 1 AS is_resurrected,
        |    nextd IS NULL OR nextd > d + 1 AS churns_next FROM f),
        |pd AS (SELECT d AS period, CAST(count(*) AS BIGINT) AS active,
        |    CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
        |      AS new_users,
        |    CAST(sum(CASE WHEN is_retained THEN 1 ELSE 0 END)
        |      AS BIGINT) AS retained,
        |    CAST(sum(CASE WHEN is_resurrected THEN 1 ELSE 0 END)
        |      AS BIGINT) AS resurrected
        |  FROM g GROUP BY d),
        |ch AS (SELECT d + 1 AS period, CAST(count(*) AS BIGINT)
        |    AS churned FROM g WHERE churns_next GROUP BY d + 1)
        |SELECT coalesce(pd.period, ch.period) AS period,
        |  coalesce(active, 0) AS active,
        |  coalesce(new_users, 0) AS new_users,
        |  coalesce(retained, 0) AS retained,
        |  coalesce(resurrected, 0) AS resurrected,
        |  coalesce(churned, 0) AS churned,
        |  CASE WHEN coalesce(churned, 0) > 0
        |    THEN round(CAST(coalesce(new_users, 0)
        |      + coalesce(resurrected, 0) AS DOUBLE)
        |      / coalesce(churned, 0), 6) END AS quick_ratio
        |FROM pd FULL JOIN ch ON pd.period = ch.period
        |ORDER BY period""".stripMargin,
    // VAR(1) replay: decimal-exact lag moments per key, the two
    // centered 2x2 Cramer equations, closed-form 2x2 eigen modulus.
    "q_var1" ->
      """WITH e AS (SELECT event_type AS k,
        |    epoch_ns(ts) // 86400000000000 AS p, value AS x
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |cells AS (SELECT k, p,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS v,
        |    CAST(count(*) AS DOUBLE) AS c
        |  FROM e GROUP BY k, p),
        |lg AS (SELECT k, v, c,
        |    lag(v) OVER w AS v1, lag(c) OVER w AS c1
        |  FROM cells WINDOW w AS (PARTITION BY k ORDER BY p)),
        |f AS (SELECT * FROM lg WHERE v1 IS NOT NULL),
        |m AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(v1 AS DECIMAL(38,6))) AS DOUBLE) AS sx1,
        |    CAST(sum(CAST(c1 AS DECIMAL(38,6))) AS DOUBLE) AS sx2,
        |    CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS sy1,
        |    CAST(sum(CAST(c AS DECIMAL(38,6))) AS DOUBLE) AS sy2,
        |    CAST(sum(CAST(v1 * v1 AS DECIMAL(38,6))) AS DOUBLE) AS s11,
        |    CAST(sum(CAST(v1 * c1 AS DECIMAL(38,6))) AS DOUBLE) AS s12,
        |    CAST(sum(CAST(c1 * c1 AS DECIMAL(38,6))) AS DOUBLE) AS s22,
        |    CAST(sum(CAST(v1 * v AS DECIMAL(38,6))) AS DOUBLE) AS s1y1,
        |    CAST(sum(CAST(c1 * v AS DECIMAL(38,6))) AS DOUBLE) AS s2y1,
        |    CAST(sum(CAST(v1 * c AS DECIMAL(38,6))) AS DOUBLE) AS s1y2,
        |    CAST(sum(CAST(c1 * c AS DECIMAL(38,6))) AS DOUBLE) AS s2y2
        |  FROM f GROUP BY k),
        |cc AS (SELECT k, n, sx1, sx2, sy1, sy2, s1y1, s2y1, s1y2, s2y2,
        |    s11 - sx1 * sx1 / CAST(n AS DOUBLE) AS c11,
        |    s12 - sx1 * sx2 / CAST(n AS DOUBLE) AS c12,
        |    s22 - sx2 * sx2 / CAST(n AS DOUBLE) AS c22
        |  FROM m),
        |d AS (SELECT *, c11 * c22 - c12 * c12 AS det FROM cc),
        |q AS (SELECT k, n, det, c11, c12, c22, sx1, sx2,
        |    ((s1y1 - sx1 * sy1 / CAST(n AS DOUBLE)) * c22
        |      - c12 * (s2y1 - sx2 * sy1 / CAST(n AS DOUBLE))) / det
        |      AS a11,
        |    (c11 * (s2y1 - sx2 * sy1 / CAST(n AS DOUBLE))
        |      - c12 * (s1y1 - sx1 * sy1 / CAST(n AS DOUBLE))) / det
        |      AS a12,
        |    ((s1y2 - sx1 * sy2 / CAST(n AS DOUBLE)) * c22
        |      - c12 * (s2y2 - sx2 * sy2 / CAST(n AS DOUBLE))) / det
        |      AS a21,
        |    (c11 * (s2y2 - sx2 * sy2 / CAST(n AS DOUBLE))
        |      - c12 * (s1y2 - sx1 * sy2 / CAST(n AS DOUBLE))) / det
        |      AS a22,
        |    sy1, sy2 FROM d),
        |r AS (SELECT k, n, det, a11, a12, a21, a22,
        |    sy1 / CAST(n AS DOUBLE) - a11 * (sx1 / CAST(n AS DOUBLE))
        |      - a12 * (sx2 / CAST(n AS DOUBLE)) AS cv,
        |    sy2 / CAST(n AS DOUBLE) - a21 * (sx1 / CAST(n AS DOUBLE))
        |      - a22 * (sx2 / CAST(n AS DOUBLE)) AS cc2,
        |    a11 + a22 AS tr, a11 * a22 - a12 * a21 AS deta
        |  FROM q),
        |s AS (SELECT *,
        |    CASE WHEN tr * tr - 4.0 * deta >= 0.0
        |      THEN greatest(abs((tr + sqrt(tr * tr - 4.0 * deta))
        |        / 2.0), abs((tr - sqrt(tr * tr - 4.0 * deta)) / 2.0))
        |      ELSE sqrt(deta) END AS rho
        |  FROM r)
        |SELECT k AS event_type, n AS n_periods,
        |  round(a11, 6) + 0.0 AS a11, round(a12, 6) + 0.0 AS a12,
        |  round(a21, 6) + 0.0 AS a21, round(a22, 6) + 0.0 AS a22,
        |  round(cv, 6) + 0.0 AS const_v, round(cc2, 6) + 0.0 AS const_c,
        |  round(rho, 6) AS spec_radius, rho < 1.0 AS stable
        |FROM s WHERE n >= 6 AND det > 1e-12
        |ORDER BY event_type""".stripMargin,
    // ECE replay: the calibrationBins grid, bin-count weights, the
    // weighted absolute/signed gap folds.
    "q_ece" ->
      """WITH c AS (SELECT (l_returnflag = 'R') AS y,
        |    CAST(l_discount AS DOUBLE) * 10 AS s
        |  FROM lineitem WHERE l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE) * 10)
        |    AND l_returnflag IS NOT NULL),
        |b AS (SELECT least(9, greatest(0,
        |    CAST(floor(s * 10) AS INT))) AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    round(avg(s), 6) AS mean_score,
        |    round(avg(CASE WHEN y THEN 1.0 ELSE 0.0 END), 6)
        |      AS frac_pos
        |  FROM c GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM b)
        |SELECT t.nt AS n,
        |  (SELECT CAST(count(*) AS BIGINT) FROM b) AS bins_used,
        |  round(sum(CAST(b.n AS DOUBLE) / t.nt
        |    * abs(b.frac_pos - b.mean_score)), 6) AS ece,
        |  round(max(abs(b.frac_pos - b.mean_score)), 6) AS mce,
        |  round(sum(CAST(b.n AS DOUBLE) / t.nt
        |    * (b.frac_pos - b.mean_score)), 6) + 0.0 AS signed_gap
        |FROM b, t GROUP BY t.nt""".stripMargin,
    // Kalman replay: the predict/update recursion as a RECURSIVE CTE
    // over the numbered decimal-exact daily means (seeds CAST DOUBLE).
    "q_kalman" ->
      """WITH RECURSIVE e AS (SELECT event_type AS k,
        |    epoch_ns(ts) // 86400000000000 AS p, value AS x
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |cells AS (SELECT k, p,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS v
        |  FROM e GROUP BY k, p),
        |nb AS (SELECT k, p, v,
        |    CAST(row_number() OVER (PARTITION BY k ORDER BY p)
        |      AS BIGINT) AS rn FROM cells),
        |r AS (
        |  SELECT k, p, v, rn, CAST(v AS DOUBLE) AS m,
        |    CAST(2.0 AS DOUBLE) AS pv, CAST(0.0 AS DOUBLE) AS gain,
        |    CAST(0.0 AS DOUBLE) AS innov
        |  FROM nb WHERE rn = 1
        |  UNION ALL
        |  SELECT n.k, n.p, n.v, n.rn,
        |    r.m + ((r.pv + 0.5) / ((r.pv + 0.5) + 2.0)) * (n.v - r.m),
        |    (1.0 - (r.pv + 0.5) / ((r.pv + 0.5) + 2.0)) * (r.pv + 0.5),
        |    (r.pv + 0.5) / ((r.pv + 0.5) + 2.0),
        |    n.v - r.m
        |  FROM r JOIN nb n ON n.k = r.k AND n.rn = r.rn + 1)
        |SELECT k AS event_type, p AS period, round(v, 6) + 0.0 AS v,
        |  round(m, 6) + 0.0 AS level, round(gain, 6) AS gain,
        |  round(pv, 6) AS p_var, round(innov, 6) + 0.0 AS innovation
        |FROM r ORDER BY event_type, period""".stripMargin,
    // AP replay: distinct-score cells, before-cumulative windows so
    // suffix counts are total - prefix, the same per-threshold term.
    "q_pr_auc" ->
      """WITH c AS (SELECT (l_returnflag = 'R') AS y,
        |    CAST(l_discount AS DOUBLE) AS v
        |  FROM lineitem WHERE l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))
        |    AND l_returnflag IS NOT NULL),
        |m AS (SELECT v,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS cp,
        |    CAST(count(*) AS BIGINT) AS ct FROM c GROUP BY v),
        |t AS (SELECT CAST(sum(cp) AS BIGINT) AS p,
        |    CAST(sum(ct) AS BIGINT) AS tot FROM m),
        |cum AS (SELECT v, cp, ct,
        |    coalesce(CAST(sum(cp) OVER (ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |      AS cumpb,
        |    coalesce(CAST(sum(ct) OVER (ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |      AS cumtb
        |  FROM m),
        |a AS (SELECT sum(CAST(cp AS DOUBLE) / t.p
        |      * (CAST(t.p - cumpb AS DOUBLE) / (t.tot - cumtb)))
        |    AS ap FROM cum, t GROUP BY t.p, t.tot)
        |SELECT round_even(a.ap * 1e6, 0) / 1e6 AS ap,
        |  round_even(CAST(t.p AS DOUBLE) / t.tot * 1e6, 0) / 1e6
        |    AS baseline,
        |  t.p AS n_pos, t.tot - t.p AS n_neg
        |FROM a, t""".stripMargin,
    // Beta-binomial replay: per-order (k out of 4) counts, exact
    // integer moment sums, the closed MoM forms.
    "q_beta_binomial" ->
      """WITH o AS (SELECT l_orderkey,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS k
        |  FROM lineitem GROUP BY l_orderkey),
        |f AS (SELECT k FROM o WHERE n = 4 AND k >= 0 AND k <= 4),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS g,
        |    CAST(sum(k) AS BIGINT) AS sk,
        |    CAST(sum(k * k) AS BIGINT) AS skk FROM f),
        |mm AS (SELECT g, sk / CAST(g AS DOUBLE) AS m1,
        |    skk / CAST(g AS DOUBLE) AS m2 FROM a),
        |d AS (SELECT g, m1, m2,
        |    4.0 * (m2 / m1 - m1 - 1.0) + m1 AS den FROM mm),
        |ab AS (SELECT g, m1, m2,
        |    (4.0 * m1 - m2) / den AS alpha,
        |    (4.0 - m1) * (4.0 - m2 / m1) / den AS beta FROM d)
        |SELECT CAST(4 AS BIGINT) AS n_trials, g AS n_groups,
        |  round_even(m1 * 1e6, 0) / 1e6 AS m1,
        |  round_even(m2 * 1e6, 0) / 1e6 AS m2,
        |  round_even(alpha * 1e6, 0) / 1e6 AS alpha,
        |  round_even(beta * 1e6, 0) / 1e6 AS beta,
        |  round_even(1.0 / (alpha + beta + 1.0) * 1e6, 0) / 1e6 AS rho
        |FROM ab""".stripMargin,
    // Spectral-entropy replay: the q_periodogram construction at 10
    // frequencies, normalized-share entropy on the rounded powers,
    // argmax peak via (power DESC, freq) row_number.
    "q_spectral_entropy" ->
      """WITH e AS (SELECT event_type AS k, epoch_ns(ts) AS t,
        |    CAST(value AS DOUBLE) AS v FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |cells AS (SELECT k, t // 86400000000000 AS p,
        |    CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS mv
        |  FROM e GROUP BY k, p),
        |b AS (SELECT k, p, mv,
        |    CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n,
        |    CAST(sum(CAST(mv AS DECIMAL(38,6)))
        |        OVER (PARTITION BY k) AS DOUBLE)
        |      / CAST(count(*) OVER (PARTITION BY k) AS DOUBLE) AS mu,
        |    CAST(row_number() OVER (PARTITION BY k ORDER BY p) - 1
        |      AS DOUBLE) AS ti
        |  FROM cells),
        |x AS (SELECT k, p, n, ti, mv - mu AS ed FROM b),
        |f AS (SELECT x.k AS k, x.p AS p, x.n AS n, j.j AS j, x.ti
        |    AS ti, x.ed AS ed FROM x, range(1, 11) j(j)),
        |c AS (SELECT k, p, n, j,
        |    sum(ed * cos(2.0 * pi() * CAST(j AS DOUBLE) * ti
        |      / CAST(n AS DOUBLE)))
        |      OVER (PARTITION BY k, j ORDER BY p
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS ca,
        |    sum(ed * sin(2.0 * pi() * CAST(j AS DOUBLE) * ti
        |      / CAST(n AS DOUBLE)))
        |      OVER (PARTITION BY k, j ORDER BY p
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cb,
        |    row_number() OVER (PARTITION BY k, j ORDER BY p) AS rn
        |  FROM f),
        |pw AS (SELECT k, CAST(j AS BIGINT) AS freq,
        |    round((ca * ca + cb * cb) / CAST(n AS DOUBLE), 6) AS power
        |  FROM c WHERE rn = n),
        |sh AS (SELECT k, freq, power,
        |    power / sum(power) OVER (PARTITION BY k) AS s,
        |    sum(power) OVER (PARTITION BY k) AS tot FROM pw),
        |flt AS (SELECT * FROM sh WHERE tot > 0.0),
        |ent AS (SELECT k, CAST(count(*) AS BIGINT) AS m_freqs,
        |    round(-sum(CASE WHEN s > 0.0 THEN s * ln(s) ELSE 0.0 END)
        |      / ln(CAST(count(*) AS DOUBLE)), 6) + 0.0 AS entropy
        |  FROM flt GROUP BY k),
        |pk AS (SELECT k, freq AS peak_freq, round(s, 6) AS peak_share
        |  FROM (SELECT k, freq, s, row_number() OVER (PARTITION BY k
        |      ORDER BY power DESC, freq) AS rn FROM flt)
        |  WHERE rn = 1)
        |SELECT ent.k AS event_type, ent.m_freqs, ent.entropy,
        |  pk.peak_freq, pk.peak_share
        |FROM ent JOIN pk ON ent.k = pk.k
        |ORDER BY event_type""".stripMargin,
    // Procrustes replay: err_before from the same moment sums over the
    // reconstructed rotated copy; the alignment verdict booleans are
    // engine-attested and pinned TRUE (the q_sketch_hll discipline).
    "q_procrustes" ->
      """WITH r AS (SELECT vec_id,
        |    CAST(embedding[1] AS DOUBLE) AS a0,
        |    CAST(embedding[2] AS DOUBLE) AS a1
        |  FROM embeddings WHERE vec_id IS NOT NULL
        |    AND embedding IS NOT NULL),
        |l AS (SELECT e.vec_id AS vec_id, g.pos AS pos,
        |    CAST(e.embedding[g.pos + 1] AS DOUBLE) AS a,
        |    CASE WHEN g.pos = 0 THEN r.a0 * 0.6 - r.a1 * 0.8
        |      WHEN g.pos = 1 THEN r.a0 * 0.8 + r.a1 * 0.6
        |      ELSE CAST(e.embedding[g.pos + 1] AS DOUBLE) END AS b
        |  FROM embeddings e JOIN r ON e.vec_id = r.vec_id,
        |    generate_series(0, 63) AS g(pos)
        |  WHERE e.vec_id IS NOT NULL AND e.embedding IS NOT NULL),
        |s AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n,
        |    sum(a * a) AS saa, sum(b * b) AS sbb, sum(a * b) AS sab
        |  FROM l)
        |SELECT n, CAST(64 AS BIGINT) AS d,
        |  round((saa + sbb - 2.0 * sab) / CAST(n AS DOUBLE), 6)
        |    AS err_before,
        |  TRUE AS orthogonal_ok, TRUE AS improved, TRUE AS recovered
        |FROM s""".stripMargin,
    // Bayes-A/B replay: the same counts, then every term of the closed
    // Beta sum via lgamma over a bounded series.
    "q_bayes_ab" ->
      """WITH c AS (SELECT
        |    CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    (event_type = 'purchase') AS y
        |  FROM events WHERE user_id IS NOT NULL
        |    AND event_type IS NOT NULL),
        |a AS (SELECT
        |    CAST(sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS na,
        |    CAST(sum(CASE WHEN g = 'a' AND y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS sa,
        |    CAST(sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nb,
        |    CAST(sum(CASE WHEN g = 'b' AND y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS sb
        |  FROM c),
        |t AS (SELECT na, sa, nb, sb,
        |    CAST(sa + 1 AS DOUBLE) AS aa,
        |    CAST(na - sa + 1 AS DOUBLE) AS ba,
        |    CAST(sb + 1 AS DOUBLE) AS ab2,
        |    CAST(nb - sb + 1 AS DOUBLE) AS bb FROM a),
        |ser AS (SELECT t.*, CAST(i.i AS DOUBLE) AS i
        |  FROM t, generate_series(0, 100000) AS i(i)
        |  WHERE i.i <= t.sb),
        |p AS (SELECT max(na) AS n_a, max(sa) AS s_a, max(nb) AS n_b,
        |    max(sb) AS s_b, max(aa) AS aa, max(ba) AS ba,
        |    max(ab2) AS ab2, max(bb) AS bb,
        |    sum(exp(
        |      (lgamma(aa + i) + lgamma(ba + bb)
        |        - lgamma(aa + i + ba + bb))
        |      - ln(bb + i)
        |      - (lgamma(1.0 + i) + lgamma(bb)
        |        - lgamma(1.0 + i + bb))
        |      - (lgamma(aa) + lgamma(ba) - lgamma(aa + ba))))
        |      AS pr
        |  FROM ser)
        |SELECT n_a, s_a, n_b, s_b,
        |  round(CAST(s_a AS DOUBLE) / n_a, 6) AS rate_a,
        |  round(CAST(s_b AS DOUBLE) / n_b, 6) AS rate_b,
        |  round(ab2 / (ab2 + bb) - aa / (aa + ba), 6) AS uplift,
        |  round(pr, 6) AS prob_b_beats_a
        |FROM p""".stripMargin,
    // MMR replay: the rounded-cosine top-20 pool, round_even pairwise
    // similarities, and five greedy argmax steps as chained CTEs
    // (λ = ½; ties break to the smaller id).
    "q_mmr" -> {
      // step i picks from the pool minus sel_{i-1} by
      // max(0.5·rel − 0.5·maxsim-to-selected)
      def step(i: Int) = {
        val prevSel = (1 until i).map(j => s"SELECT vid FROM st$j")
          .mkString(" UNION ALL ")
        val ms =
          if (i == 1) "0.0"
          else s"""coalesce((SELECT max(sim.s) FROM sim
             | WHERE sim.v1 = p.vid
             |   AND sim.v2 IN ($prevSel)), 0.0)""".stripMargin
        val notIn =
          if (i == 1) ""
          else s" WHERE p.vid NOT IN ($prevSel)"
        s"""st$i AS MATERIALIZED (SELECT p.vid AS vid, p.c AS rel,
           |    round_even((0.5 * p.c - 0.5 * ($ms)) * 1000000.0, 0)
           |      / 1000000.0 AS m
           |  FROM pool p$notIn
           |  ORDER BY m DESC, p.vid ASC LIMIT 1)""".stripMargin
      }
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings
        |  WHERE vec_id = 0),
        |pr AS (SELECT e.vec_id AS vid,
        |    CAST(unnest(e.embedding) AS DOUBLE) AS a,
        |    CAST(unnest(q.qe) AS DOUBLE) AS b
        |  FROM embeddings e, q WHERE e.vec_id <> 0),
        |rel AS (SELECT vid, round(sum(a*b)
        |    / (sqrt(sum(a*a)) * sqrt(sum(b*b))), 6) AS c
        |  FROM pr GROUP BY vid),
        |pool AS MATERIALIZED (SELECT vid, c FROM rel
        |  ORDER BY c DESC, vid ASC LIMIT 20),
        |pe AS (SELECT p.vid AS vid, e.embedding AS emb
        |  FROM pool p JOIN embeddings e ON e.vec_id = p.vid),
        |pw AS (SELECT x.vid AS v1, y.vid AS v2,
        |    CAST(unnest(x.emb) AS DOUBLE) AS a,
        |    CAST(unnest(y.emb) AS DOUBLE) AS b
        |  FROM pe x, pe y WHERE x.vid <> y.vid),
        |sim AS MATERIALIZED (SELECT v1, v2, round_even(sum(a*b)
        |    / (sqrt(sum(a*a)) * sqrt(sum(b*b))) * 1000000.0, 0)
        |    / 1000000.0 AS s
        |  FROM pw GROUP BY v1, v2),
        |${step(1)},
        |${step(2)},
        |${step(3)},
        |${step(4)},
        |${step(5)},
        |u AS (SELECT CAST(1 AS BIGINT) AS rank, vid, rel, m FROM st1
        |  UNION ALL SELECT 2, vid, rel, m FROM st2
        |  UNION ALL SELECT 3, vid, rel, m FROM st3
        |  UNION ALL SELECT 4, vid, rel, m FROM st4
        |  UNION ALL SELECT 5, vid, rel, m FROM st5)
        |SELECT rank, CAST(vid AS BIGINT) AS id, rel AS relevance,
        |  m AS mmr_score FROM u ORDER BY rank""".stripMargin
    },
    // Mediation replay: the same nine moment sums (population forms),
    // 2×2 partial slopes, Sobel variance, Cody-erfc p at rounded z.
    "q_mediation" ->
      s"""WITH c AS (SELECT CAST(l_discount AS DOUBLE) * 100 AS x,
        |    CAST(l_quantity AS DOUBLE) AS m,
        |    CAST(l_extendedprice AS DOUBLE) / 1000 AS y
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE) * 100)
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE) / 1000)),
        |mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(x * x) / count(*) - avg(x) * avg(x) AS vx,
        |    sum(m * m) / count(*) - avg(m) * avg(m) AS vm,
        |    sum(y * y) / count(*) - avg(y) * avg(y) AS vy,
        |    sum(x * m) / count(*) - avg(x) * avg(m) AS cxm,
        |    sum(x * y) / count(*) - avg(x) * avg(y) AS cxy,
        |    sum(m * y) / count(*) - avg(m) * avg(y) AS cmy
        |  FROM c),
        |f AS (SELECT n, CAST(n AS DOUBLE) AS nd, vx, vm, vy, cxm,
        |    cxy, cmy, cxm / vx AS a, cxy / vx AS cc,
        |    vx * vm - cxm * cxm AS det FROM mo),
        |g AS (SELECT n, nd, vx, vm, vy, cxm, cxy, cmy, a, cc, det,
        |    (vm * cxy - cxm * cmy) / det AS cp,
        |    (vx * cmy - cxm * cxy) / det AS b FROM f),
        |h AS (SELECT n, nd, vx, a, b, cc, cp, det, cxm, cxy, cmy,
        |    vy, vm,
        |    nd * (vm - a * cxm) / (nd - 2.0) AS s2a,
        |    nd * (vy - cp * cxy - b * cmy) / (nd - 3.0) AS s2f
        |  FROM g),
        |i AS (SELECT n, a, b, cc, cp, s2a, s2f, vx, vm, det,
        |    sqrt(s2a / (nd * vx)) AS sea,
        |    sqrt(s2f * vx / (nd * det)) AS seb FROM h),
        |zz AS (SELECT n, a, b, cc, cp,
        |    round(a * b / sqrt(a * a * seb * seb + b * b * sea * sea),
        |      6) AS z, s2a, s2f, vx, vm, det
        |  FROM i),
        |ye AS (SELECT n, a, b, cc, cp, z, s2a, s2f, vx, vm, det,
        |    abs(z) / sqrt(2.0) AS y FROM zz)
        |SELECT n, round(a, 6) AS a, round(b, 6) AS b,
        |  round(cc, 6) AS c, round(cp, 6) AS c_prime,
        |  round(a * b, 6) AS indirect, z AS sobel_z,
        |  round(${codyErfcSql("y")}, 6) AS p_value,
        |  CASE WHEN abs(cc) > 0.0 THEN round(a * b / cc, 6) END
        |    AS prop_mediated
        |FROM ye WHERE n >= 4 AND vx > 0.0 AND vm > 0.0 AND det > 0.0
        |  AND s2a > 0.0 AND s2f > 0.0""".stripMargin,
    // Response-curve replay: min-rank decile buckets, explicit bucket
    // sums, the same normal CI.
    "q_response_curve" ->
      """WITH c AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x,
        |    CAST(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
        |      AS DOUBLE) AS y
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_returnflag IS NOT NULL),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
        |r AS (SELECT x, y, rank() OVER (ORDER BY x) AS rk FROM c),
        |b AS (SELECT x, y,
        |    CAST(floor((CAST(rk AS DOUBLE) - 1) * 10 / nn.n) + 1
        |      AS BIGINT) AS bucket
        |  FROM r, nn),
        |a AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(y * y) AS syy
        |  FROM b GROUP BY bucket),
        |f AS (SELECT bucket, n, CAST(n AS DOUBLE) AS nd, sx, sy, syy
        |  FROM a WHERE n >= 2),
        |g AS (SELECT bucket, n, sx / nd AS xm, sy / nd AS ym,
        |    (syy - nd * (sy / nd) * (sy / nd)) / (nd - 1.0) AS s2,
        |    nd FROM f),
        |h AS (SELECT bucket, n, xm, ym,
        |    sqrt(CASE WHEN s2 > 0.0 THEN s2 ELSE 0.0 END / nd) AS se
        |  FROM g)
        |SELECT bucket, n, round(xm, 6) AS x_mean,
        |  round(ym, 6) AS y_mean,
        |  round(ym - 1.959964 * se, 6) AS ci_lo,
        |  round(ym + 1.959964 * se, 6) AS ci_hi
        |FROM h ORDER BY bucket""".stripMargin,
    // Cluster-robust replay: global moments, residual score sums per
    // cluster, the CR1 sandwich in the same op order.
    "q_cluster_se" ->
      """WITH c AS (SELECT l_suppkey AS g,
        |    CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) / 1000 AS y
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_suppkey IS NOT NULL
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE) / 1000)),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(x) AS mx,
        |    avg(y) AS my,
        |    sum(x * x) / count(*) - avg(x) * avg(x) AS vx0,
        |    sum(x * y) / count(*) - avg(x) * avg(y) AS cxy0
        |  FROM c),
        |d AS (SELECT c.g AS g, m.n AS n, m.cxy0 / m.vx0 AS beta,
        |    m.vx0 AS vx, c.x - m.mx AS xd,
        |    c.y - m.my - (m.cxy0 / m.vx0) * (c.x - m.mx) AS e
        |  FROM c, m),
        |pc AS (SELECT g, max(n) AS n, max(beta) AS beta,
        |    max(vx) AS vx, sum(xd * e) AS sc, sum(e * e) AS se2
        |  FROM d GROUP BY g),
        |a AS (SELECT max(n) AS n,
        |    CAST(count(*) AS BIGINT) AS n_clusters,
        |    max(beta) AS beta, max(vx) AS vx,
        |    sum(sc * sc) AS meat, sum(se2) AS rss FROM pc),
        |f AS (SELECT n, n_clusters, beta,
        |    vx * CAST(n AS DOUBLE) AS sxx, meat, rss,
        |    CAST(n AS DOUBLE) AS nd,
        |    CAST(n_clusters AS DOUBLE) AS gd FROM a
        |  WHERE n >= 3 AND n_clusters >= 2 AND vx > 0.0)
        |SELECT n, n_clusters, round(beta, 6) AS beta,
        |  round(sqrt(rss / (nd - 2.0) / sxx), 6) AS se_iid,
        |  round(sqrt(meat / (sxx * sxx) * (gd / (gd - 1.0))
        |    * ((nd - 1.0) / (nd - 2.0))), 6) AS se_cluster,
        |  round(beta / sqrt(meat / (sxx * sxx) * (gd / (gd - 1.0))
        |    * ((nd - 1.0) / (nd - 2.0))), 6) AS t_cluster
        |FROM f""".stripMargin,
    // Truncation-recall replay: per probe, full-dim and 16-dim
    // rounded-cosine top-10 retrievals (id tie-break), overlap counts.
    "q_truncation_recall" -> {
      def block(x: Int) =
        s"""q$x AS (SELECT embedding AS qe FROM embeddings
          |  WHERE vec_id = $x),
          |fp$x AS (SELECT e.vec_id AS vid,
          |    CAST(unnest(e.embedding) AS DOUBLE) AS a,
          |    CAST(unnest(q$x.qe) AS DOUBLE) AS b
          |  FROM embeddings e, q$x WHERE e.vec_id <> $x),
          |fa$x AS (SELECT vid, round(sum(a*b)
          |    / (sqrt(sum(a*a)) * sqrt(sum(b*b))), 6) AS c
          |  FROM fp$x GROUP BY vid),
          |ff$x AS (SELECT vid FROM fa$x
          |  ORDER BY c DESC, vid ASC LIMIT 10),
          |tp$x AS (SELECT e.vec_id AS vid,
          |    CAST(unnest(e.embedding[1:16]) AS DOUBLE) AS a,
          |    CAST(unnest(q$x.qe[1:16]) AS DOUBLE) AS b
          |  FROM embeddings e, q$x WHERE e.vec_id <> $x),
          |ta$x AS (SELECT vid, round(sum(a*b)
          |    / (sqrt(sum(a*a)) * sqrt(sum(b*b))), 6) AS c
          |  FROM tp$x GROUP BY vid),
          |tt$x AS (SELECT vid FROM ta$x
          |  ORDER BY c DESC, vid ASC LIMIT 10),
          |r$x AS (SELECT CAST($x AS BIGINT) AS query_id,
          |    CAST(16 AS BIGINT) AS dims, CAST(10 AS BIGINT) AS k,
          |    CAST((SELECT count(*) FROM tt$x
          |      JOIN ff$x ON tt$x.vid = ff$x.vid) AS BIGINT)
          |      AS n_overlap)""".stripMargin
      s"""WITH ${block(0)},
        |${block(1)},
        |${block(2)},
        |u AS (SELECT * FROM r0 UNION ALL SELECT * FROM r1
        |  UNION ALL SELECT * FROM r2)
        |SELECT query_id, dims, k, n_overlap,
        |  round(CAST(n_overlap AS DOUBLE) / 10.0, 6) AS recall
        |FROM u ORDER BY query_id""".stripMargin
    },
    // Silhouette replay: long-form embeddings, (label, dim) centroids,
    // per-(row, centroid) squared distances, the same a/b/s algebra.
    // JL replay: the md5-parity sign matrix, left-to-right
    // list_reduce folds, /sqrt(16), rounded components.
    "q_jl_project" ->
      """WITH base AS MATERIALIZED (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings WHERE vec_id IS NOT NULL
        |    AND embedding IS NOT NULL AND len(embedding) = 64
        |    AND vec_id < 200)
        |SELECT vec_id, CAST(j.j AS BIGINT) AS j,
        |  round(list_reduce(list_prepend(0.0, list_transform(range(64),
        |    i -> e[i + 1] * CASE WHEN CAST(('0x' ||
        |      substr(md5('jl#' || i || '#' || j.j), 1, 8)) AS BIGINT)
        |      % 2 = 0 THEN 1.0 ELSE -1.0 END)),
        |    (a, b) -> a + b) / sqrt(16.0), 6) + 0.0 AS y
        |FROM base, generate_series(0, 15) j(j)
        |ORDER BY vec_id, j""".stripMargin,
    // Anisotropy replay: ordered pair folds, rounded cosines,
    // decimal-exact summary.
    "q_pair_cosine" ->
      """WITH base AS MATERIALIZED (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings WHERE vec_id IS NOT NULL
        |    AND embedding IS NOT NULL),
        |pr AS (SELECT
        |    round(
        |      list_reduce(list_prepend(0.0, list_transform(range(64),
        |        i -> a.e[i + 1] * b.e[i + 1])), (x, y) -> x + y)
        |      / (sqrt(list_reduce(list_prepend(0.0,
        |          list_transform(range(64),
        |            i -> a.e[i + 1] * a.e[i + 1])), (x, y) -> x + y))
        |        * sqrt(list_reduce(list_prepend(0.0,
        |          list_transform(range(64),
        |            i -> b.e[i + 1] * b.e[i + 1])), (x, y) -> x + y)))
        |      , 6) AS c
        |  FROM base a JOIN base b ON b.vec_id = a.vec_id + 1
        |    AND a.vec_id % 2 = 0
        |  WHERE sqrt(list_reduce(list_prepend(0.0,
        |      list_transform(range(64),
        |        i -> a.e[i + 1] * a.e[i + 1])), (x, y) -> x + y)) > 0.0
        |    AND sqrt(list_reduce(list_prepend(0.0,
        |      list_transform(range(64),
        |        i -> b.e[i + 1] * b.e[i + 1])), (x, y) -> x + y)) > 0.0)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(CAST(sum(CAST(c AS DECIMAL(38,6))) AS DOUBLE)
        |    / count(*), 6) + 0.0 AS mean_cos,
        |  min(c) + 0.0 AS min_cos, max(c) + 0.0 AS max_cos,
        |  round(CAST(sum(CASE WHEN c > 0.5 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 6) AS share_above_half
        |FROM pr""".stripMargin,
    "q_jl_distortion" ->
      """WITH base AS MATERIALIZED (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings WHERE vec_id IS NOT NULL
        |    AND embedding IS NOT NULL AND len(embedding) = 64
        |    AND vec_id < 200),
        |p AS MATERIALIZED (SELECT vec_id, list_transform(range(16),
        |    jj -> round(list_reduce(list_prepend(0.0,
        |      list_transform(range(64),
        |        i -> e[i + 1] * CASE WHEN CAST(('0x' ||
        |          substr(md5('jl#' || i || '#' || jj), 1, 8))
        |          AS BIGINT) % 2 = 0 THEN 1.0 ELSE -1.0 END)),
        |      (a, b) -> a + b) / sqrt(16.0), 6)) AS proj
        |  FROM base),
        |jn AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    sqrt(list_reduce(list_prepend(0.0, list_transform(
        |      range(64), i -> (a.e[i + 1] - b.e[i + 1])
        |        * (a.e[i + 1] - b.e[i + 1]))),
        |      (x, y) -> x + y)) AS do_raw,
        |    sqrt(list_reduce(list_prepend(0.0, list_transform(
        |      range(16), i -> (pa.proj[i + 1] - pb.proj[i + 1])
        |        * (pa.proj[i + 1] - pb.proj[i + 1]))),
        |      (x, y) -> x + y)) AS dp_raw
        |  FROM base a JOIN base b ON b.vec_id = a.vec_id + 1
        |    AND a.vec_id % 2 = 0
        |  JOIN p pa ON pa.vec_id = a.vec_id
        |  JOIN p pb ON pb.vec_id = b.vec_id)
        |SELECT id_a, id_b, round(do_raw, 6) AS dist_orig,
        |  round(dp_raw, 6) AS dist_proj,
        |  CASE WHEN do_raw > 0.0 THEN round(dp_raw / do_raw, 6) END
        |    AS ratio
        |FROM jn ORDER BY id_a""".stripMargin,
    "q_silhouette" ->
      """WITH l AS (SELECT vec_id AS id,
        |    CAST(label AS VARCHAR) AS lb, g.pos AS dim,
        |    CAST(embedding[g.pos + 1] AS DOUBLE) AS v
        |  FROM embeddings, generate_series(0, 63) AS g(pos)
        |  WHERE vec_id IS NOT NULL AND label IS NOT NULL
        |    AND embedding IS NOT NULL),
        |c AS (SELECT lb AS cl, dim, avg(v) AS cv
        |  FROM l GROUP BY lb, dim),
        |d AS (SELECT l.id AS id, l.lb AS lb, c.cl AS cl,
        |    sum((l.v - c.cv) * (l.v - c.cv)) AS d2
        |  FROM l JOIN c ON l.dim = c.dim GROUP BY l.id, l.lb, c.cl),
        |p AS (SELECT id, lb,
        |    sqrt(sum(CASE WHEN cl = lb THEN d2 END)) AS a,
        |    sqrt(min(CASE WHEN cl <> lb THEN d2 END)) AS b
        |  FROM d GROUP BY id, lb),
        |s AS (SELECT lb, a, b,
        |    CASE WHEN greatest(a, b) > 0.0
        |      THEN (b - a) / greatest(a, b) ELSE 0.0 END AS sv
        |  FROM p WHERE a IS NOT NULL AND b IS NOT NULL)
        |SELECT lb AS label, CAST(count(*) AS BIGINT) AS n,
        |  round(avg(a), 6) AS a_mean, round(avg(b), 6) AS b_mean,
        |  round(avg(sv), 6) AS silhouette
        |FROM s GROUP BY lb ORDER BY label""".stripMargin,
    // PACF replay: the q_acf lag sums, then the unrolled
    // Durbin-Levinson closed forms in the same op order.
    "q_pacf" ->
      """WITH e AS (SELECT event_type AS k, epoch_ns(ts) AS tns,
        |    event_id, value AS x
        |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        |    AND ts IS NOT NULL),
        |m AS (SELECT k, tns, event_id, x,
        |    avg(x) OVER (PARTITION BY k) AS mu FROM e),
        |d AS (SELECT k, x - mu AS dd,
        |    lag(x - mu, 1) OVER (PARTITION BY k ORDER BY tns, event_id)
        |      AS d1,
        |    lag(x - mu, 2) OVER (PARTITION BY k ORDER BY tns, event_id)
        |      AS d2,
        |    lag(x - mu, 3) OVER (PARTITION BY k ORDER BY tns, event_id)
        |      AS d3
        |  FROM m),
        |a AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    sum(dd * dd) AS ss, sum(dd * d1) AS s1,
        |    sum(dd * d2) AS s2, sum(dd * d3) AS s3
        |  FROM d GROUP BY k),
        |r AS (SELECT k, n, s1 / ss AS r1, s2 / ss AS r2, s3 / ss AS r3
        |  FROM a WHERE ss > 0.0),
        |p AS (SELECT k, n, r1, r2, r3,
        |    (r2 - r1 * r1) / (1.0 - r1 * r1) AS p2 FROM r),
        |p2 AS (SELECT k, n, r1, r2, r3, p2,
        |    r1 * (1.0 - p2) AS p21 FROM p)
        |SELECT k AS event_type, n, round(r1, 6) AS pacf_1,
        |  CASE WHEN 1.0 - r1 * r1 > 0.0 THEN round(p2, 6) END
        |    AS pacf_2,
        |  CASE WHEN 1.0 - r1 * r1 > 0.0
        |      AND abs(1.0 - p21 * r1 - p2 * r2) > 0.0
        |    THEN round((r3 - p21 * r2 - p2 * r1)
        |      / (1.0 - p21 * r1 - p2 * r2), 6) END AS pacf_3
        |FROM p2 ORDER BY event_type""".stripMargin,
    // CCA replay: the same 14 moment sums, population covariance
    // blocks, adjugate inverses, 2×2 product and quadratic eigenpair.
    "q_cca" ->
      """WITH c AS (SELECT CAST(l_quantity AS DOUBLE) AS a,
        |    CAST(l_discount AS DOUBLE) * 100 AS b,
        |    CAST(l_extendedprice AS DOUBLE) / 1000 AS cc,
        |    CAST(l_tax AS DOUBLE) * 100 AS d
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE) * 100)
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE) / 1000)
        |    AND l_tax IS NOT NULL
        |    AND NOT isnan(CAST(l_tax AS DOUBLE) * 100)),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(a) AS sa, sum(b) AS sb, sum(cc) AS sc, sum(d) AS sd,
        |    sum(a * a) AS qaa, sum(a * b) AS qab, sum(a * cc) AS qac,
        |    sum(a * d) AS qad, sum(b * b) AS qbb, sum(b * cc) AS qbc,
        |    sum(b * d) AS qbd, sum(cc * cc) AS qcc, sum(cc * d) AS qcd,
        |    sum(d * d) AS qdd
        |  FROM c),
        |v AS (SELECT n,
        |    qaa / CAST(n AS DOUBLE) - (sa / CAST(n AS DOUBLE))
        |      * (sa / CAST(n AS DOUBLE)) AS vaa,
        |    qab / CAST(n AS DOUBLE) - (sa / CAST(n AS DOUBLE))
        |      * (sb / CAST(n AS DOUBLE)) AS vab,
        |    qbb / CAST(n AS DOUBLE) - (sb / CAST(n AS DOUBLE))
        |      * (sb / CAST(n AS DOUBLE)) AS vbb,
        |    qcc / CAST(n AS DOUBLE) - (sc / CAST(n AS DOUBLE))
        |      * (sc / CAST(n AS DOUBLE)) AS vcc,
        |    qcd / CAST(n AS DOUBLE) - (sc / CAST(n AS DOUBLE))
        |      * (sd / CAST(n AS DOUBLE)) AS vcd,
        |    qdd / CAST(n AS DOUBLE) - (sd / CAST(n AS DOUBLE))
        |      * (sd / CAST(n AS DOUBLE)) AS vdd,
        |    qac / CAST(n AS DOUBLE) - (sa / CAST(n AS DOUBLE))
        |      * (sc / CAST(n AS DOUBLE)) AS vac,
        |    qad / CAST(n AS DOUBLE) - (sa / CAST(n AS DOUBLE))
        |      * (sd / CAST(n AS DOUBLE)) AS vad,
        |    qbc / CAST(n AS DOUBLE) - (sb / CAST(n AS DOUBLE))
        |      * (sc / CAST(n AS DOUBLE)) AS vbc,
        |    qbd / CAST(n AS DOUBLE) - (sb / CAST(n AS DOUBLE))
        |      * (sd / CAST(n AS DOUBLE)) AS vbd
        |  FROM s),
        |w AS (SELECT n, vaa, vab, vbb, vcc, vcd, vdd, vac, vad, vbc,
        |    vbd, vaa * vbb - vab * vab AS detxx,
        |    vcc * vdd - vcd * vcd AS detyy FROM v),
        |pq AS (SELECT n, detxx, detyy,
        |    (vbb * vac - vab * vbc) / detxx AS p11,
        |    (vbb * vad - vab * vbd) / detxx AS p12,
        |    (vaa * vbc - vab * vac) / detxx AS p21,
        |    (vaa * vbd - vab * vad) / detxx AS p22,
        |    (vdd * vac - vcd * vad) / detyy AS q11,
        |    (vdd * vbc - vcd * vbd) / detyy AS q12,
        |    (vcc * vad - vcd * vac) / detyy AS q21,
        |    (vcc * vbd - vcd * vbc) / detyy AS q22
        |  FROM w),
        |mm AS (SELECT n, detxx, detyy,
        |    p11 * q11 + p12 * q21 AS m11,
        |    p11 * q12 + p12 * q22 AS m12,
        |    p21 * q11 + p22 * q21 AS m21,
        |    p21 * q12 + p22 * q22 AS m22 FROM pq),
        |t AS (SELECT n, detxx, detyy, m11 + m22 AS tr,
        |    m11 * m22 - m12 * m21 AS dt FROM mm),
        |l AS (SELECT n, detxx, detyy,
        |    tr * tr - 4.0 * dt AS disc,
        |    (tr + sqrt(tr * tr - 4.0 * dt)) / 2.0 AS l1,
        |    (tr - sqrt(tr * tr - 4.0 * dt)) / 2.0 AS l2 FROM t)
        |SELECT n, round(sqrt(l1), 6) AS rho1,
        |  round(sqrt(l2), 6) AS rho2,
        |  round(l1, 6) AS lambda1, round(l2, 6) AS lambda2
        |FROM l WHERE n >= 5 AND detxx > 0.0 AND detyy > 0.0
        |  AND disc >= 0.0 AND l2 >= 0.0 AND l1 <= 1.000001""".stripMargin,
    // Kitagawa replay: the same (cohort, segment) cells, share/rate
    // algebra, and the exact-identity residual.
    "q_kitagawa" ->
      """WITH c AS (SELECT
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    CAST(l_linestatus AS VARCHAR) AS s,
        |    CAST(l_extendedprice AS DOUBLE) AS v
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_linestatus IS NOT NULL
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |cells AS (SELECT s,
        |    CAST(sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS na,
        |    sum(CASE WHEN g = 'a' THEN v ELSE 0.0 END) AS sa,
        |    CAST(sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nb,
        |    sum(CASE WHEN g = 'b' THEN v ELSE 0.0 END) AS sb
        |  FROM c GROUP BY s),
        |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n_a, sum(sa) AS s_a,
        |    CAST(sum(nb) AS BIGINT) AS n_b, sum(sb) AS s_b
        |  FROM cells),
        |ag AS (SELECT max(tot.n_a) AS n_a, max(tot.n_b) AS n_b,
        |    max(tot.s_a / CAST(tot.n_a AS DOUBLE)) AS ma,
        |    max(tot.s_b / CAST(tot.n_b AS DOUBLE)) AS mb,
        |    sum(CASE WHEN na > 0 THEN
        |      (CAST(nb AS DOUBLE) / CAST(tot.n_b AS DOUBLE)
        |        - CAST(na AS DOUBLE) / CAST(tot.n_a AS DOUBLE))
        |        * (sa / CAST(na AS DOUBLE)) ELSE 0.0 END) AS mix,
        |    sum(CASE WHEN na > 0 AND nb > 0 THEN
        |      CAST(nb AS DOUBLE) / CAST(tot.n_b AS DOUBLE)
        |        * (sb / CAST(nb AS DOUBLE) - sa / CAST(na AS DOUBLE))
        |      ELSE 0.0 END) AS rate,
        |    CAST(count(*) AS BIGINT) AS n_segments,
        |    CAST(sum(CASE WHEN na > 0 AND nb > 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_common
        |  FROM cells, tot)
        |SELECT n_a, n_b, round(ma, 6) AS mean_a,
        |  round(mb, 6) AS mean_b, round(mb - ma, 6) AS gap,
        |  round(mix, 6) AS mix_effect, round(rate, 6) AS rate_effect,
        |  round(mb - ma - mix - rate, 6) AS residual,
        |  n_segments, n_common
        |FROM ag WHERE n_a > 0 AND n_b > 0""".stripMargin,
    // Streaming-funnel replay: the batch triple interval join with
    // the same strict ordering and 1h lookbacks.
    "q_stream_funnel" ->
      """WITH v AS (SELECT user_id AS u, ts AS t FROM events
        |  WHERE event_type = 'view' AND user_id IS NOT NULL
        |    AND ts IS NOT NULL),
        |c AS (SELECT user_id AS u, ts AS t FROM events
        |  WHERE event_type = 'click' AND user_id IS NOT NULL
        |    AND ts IS NOT NULL),
        |p AS (SELECT user_id AS u, ts AS t FROM events
        |  WHERE event_type = 'purchase' AND user_id IS NOT NULL
        |    AND ts IS NOT NULL),
        |j AS (SELECT v.u AS u FROM v
        |  JOIN c ON c.u = v.u
        |    AND v.t >= c.t - INTERVAL 1 HOUR AND v.t < c.t
        |  JOIN p ON p.u = c.u
        |    AND c.t >= p.t - INTERVAL 1 HOUR AND c.t < p.t)
        |SELECT CAST(count(*) AS BIGINT) AS n_paths,
        |  CAST(count(DISTINCT u) AS BIGINT) AS n_users FROM j""".stripMargin,
    // MRL replay: the KM step curve, segment areas with a t-ordered
    // cumulative window, remaining-area / survival per curve point.
    "q_mrl" ->
      """WITH base AS (SELECT l_linestatus AS g,
        |    CAST(l_quantity AS DOUBLE) AS t,
        |    (l_returnflag <> 'N') AS e
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND CAST(l_quantity AS DOUBLE) >= 0.0
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT g, t,
        |    CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY g, t),
        |w AS (SELECT g, t, d, c,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT)
        |      - CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS BIGINT) AS nr
        |  FROM cells),
        |s AS (SELECT g, t,
        |    CASE WHEN d = nr THEN 0.0
        |      ELSE exp(sum(CASE WHEN d = nr THEN 0.0
        |        ELSE ln(1.0 - CAST(d AS DOUBLE) / nr) END)
        |        OVER (PARTITION BY g ORDER BY t ROWS BETWEEN
        |          UNBOUNDED PRECEDING AND CURRENT ROW)) END AS surv
        |  FROM w),
        |km AS (SELECT g, t, round(surv, 6) AS sv FROM s
        |  WHERE t <= 30.0),
        |seg AS (SELECT g, t, sv,
        |    coalesce(lag(t) OVER (PARTITION BY g ORDER BY t), 0.0)
        |      AS tp,
        |    coalesce(lag(sv) OVER (PARTITION BY g ORDER BY t), 1.0)
        |      AS sp
        |  FROM km),
        |seg2 AS (SELECT g, t, sv, sp * (t - tp) AS sg,
        |    sum(sp * (t - tp)) OVER (PARTITION BY g ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum
        |  FROM seg),
        |tot AS (SELECT g,
        |    sum(sg) + max_by(sv, t) * (30.0 - max(t)) AS rmst
        |  FROM seg2 GROUP BY g)
        |SELECT seg2.g AS l_linestatus, seg2.t AS t,
        |  seg2.sv AS survival,
        |  CASE WHEN seg2.sv > 0.0
        |    THEN round((tot.rmst - seg2.cum) / seg2.sv, 6) END AS mrl
        |FROM seg2 JOIN tot ON seg2.g = tot.g
        |ORDER BY l_linestatus, t""".stripMargin,
    // Gumbel replay: (group, day) maxima, explicit moment sums, the
    // same beta/mu/return-level op order.
    "q_gumbel" ->
      """WITH e AS (SELECT event_type AS k,
        |    epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(value AS DOUBLE) AS v FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |mx AS (SELECT k, day, max(v) AS m FROM e GROUP BY k, day),
        |a AS (SELECT k, CAST(count(*) AS BIGINT) AS n_blocks,
        |    sum(m) AS s, sum(m * m) AS ss FROM mx GROUP BY k),
        |f AS (SELECT k, n_blocks, CAST(n_blocks AS DOUBLE) AS nd,
        |    s / CAST(n_blocks AS DOUBLE) AS mn, ss FROM a
        |  WHERE n_blocks >= 3),
        |g AS (SELECT k, n_blocks, mn,
        |    (ss - nd * mn * mn) / (nd - 1.0) AS s2 FROM f),
        |h AS (SELECT k, n_blocks, mn, s2,
        |    sqrt(s2) * sqrt(6.0) / pi() AS beta FROM g
        |  WHERE s2 > 0.0),
        |i AS (SELECT k, n_blocks, beta,
        |    mn - beta * 0.5772156649015329 AS mu FROM h)
        |SELECT k AS event_type, n_blocks, round(mu, 6) AS mu,
        |  round(beta, 6) AS beta,
        |  round(mu - beta * ln(-ln(1.0 - 1.0 / 365.0)), 6)
        |    AS return_level
        |FROM i ORDER BY event_type""".stripMargin,
    // Conditional-survival replay: the q_km_curve step function, an
    // anchor grid, and as-of (last point ≤ anchor) lookups.
    "q_cond_survival" ->
      """WITH base AS (SELECT l_linestatus AS g,
        |    CAST(l_quantity AS DOUBLE) AS t,
        |    (l_returnflag <> 'N') AS e
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND CAST(l_quantity AS DOUBLE) >= 0.0
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT g, t,
        |    CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY g, t),
        |w AS (SELECT g, t, d, c,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT)
        |      - CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS BIGINT) AS nr
        |  FROM cells),
        |s AS (SELECT g, t,
        |    CASE WHEN d = nr THEN 0.0
        |      ELSE exp(sum(CASE WHEN d = nr THEN 0.0
        |        ELSE ln(1.0 - CAST(d AS DOUBLE) / nr) END)
        |        OVER (PARTITION BY g ORDER BY t ROWS BETWEEN
        |          UNBOUNDED PRECEDING AND CURRENT ROW)) END AS surv
        |  FROM w),
        |km AS (SELECT g, t, round(surv, 6) AS sv FROM s),
        |anch AS (SELECT unnest([10.0, 20.0, 30.0]) AS anchor),
        |grid AS (SELECT DISTINCT km.g AS g, anch.anchor AS anchor
        |  FROM km, anch),
        |sa AS (SELECT grid.g AS g, grid.anchor AS anchor,
        |    coalesce(max_by(km.sv, km.t), 1.0) AS s_anchor
        |  FROM grid LEFT JOIN km ON km.g = grid.g
        |    AND km.t <= grid.anchor
        |  GROUP BY grid.g, grid.anchor),
        |sh AS (SELECT grid.g AS g, grid.anchor AS anchor,
        |    coalesce(max_by(km.sv, km.t), 1.0) AS s_horizon
        |  FROM grid LEFT JOIN km ON km.g = grid.g
        |    AND km.t <= grid.anchor + 10.0
        |  GROUP BY grid.g, grid.anchor)
        |SELECT sa.g AS l_linestatus, sa.anchor AS anchor,
        |  sa.s_anchor AS s_anchor, sh.s_horizon AS s_horizon,
        |  CASE WHEN sa.s_anchor > 0.0
        |    THEN round(sh.s_horizon / sa.s_anchor, 6) END
        |    AS cond_survival
        |FROM sa JOIN sh ON sa.g = sh.g AND sa.anchor = sh.anchor
        |ORDER BY l_linestatus, anchor""".stripMargin,
    // RMST-difference replay: the KM step curve per cohort (6-rounded
    // survival), segment areas, Uno remaining-area variance at event
    // rows, pooled-SE z, Cody-erfc p.
    "q_rmst_diff" ->
      s"""WITH base AS (SELECT
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    CAST(l_quantity AS DOUBLE) AS t,
        |    (l_returnflag <> 'N') AS e
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND CAST(l_quantity AS DOUBLE) >= 0.0
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT g, t,
        |    CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY g, t),
        |w AS (SELECT g, t, d, c,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT)
        |      - CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS BIGINT) AS nr
        |  FROM cells),
        |s AS (SELECT g, t, d, c, nr,
        |    CASE WHEN d = nr THEN 0.0
        |      ELSE exp(sum(CASE WHEN d = nr THEN 0.0
        |        ELSE ln(1.0 - CAST(d AS DOUBLE) / nr) END)
        |        OVER (PARTITION BY g ORDER BY t ROWS BETWEEN
        |          UNBOUNDED PRECEDING AND CURRENT ROW)) END AS surv
        |  FROM w),
        |km AS (SELECT g, t, d, c, nr, round(surv, 6) AS sv
        |  FROM s WHERE t <= 30.0),
        |seg AS (SELECT g, t, d, c, nr, sv,
        |    coalesce(lag(t) OVER (PARTITION BY g ORDER BY t), 0.0)
        |      AS tp,
        |    coalesce(lag(sv) OVER (PARTITION BY g ORDER BY t), 1.0)
        |      AS sp
        |  FROM km),
        |seg2 AS (SELECT g, t, d, c, nr, sv, sp * (t - tp) AS sg,
        |    sum(sp * (t - tp)) OVER (PARTITION BY g ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum
        |  FROM seg),
        |tot AS (SELECT g,
        |    sum(sg) + max_by(sv, t) * (30.0 - max(t)) AS rmst,
        |    CAST(sum(c) AS BIGINT) AS n FROM seg2 GROUP BY g),
        |pg AS (SELECT seg2.g AS g, max(tot.rmst) AS r,
        |    sum(CASE WHEN seg2.d > 0 AND seg2.nr > seg2.d
        |      THEN (tot.rmst - seg2.cum) * (tot.rmst - seg2.cum)
        |        * CAST(seg2.d AS DOUBLE)
        |        / (CAST(seg2.nr AS DOUBLE)
        |          * CAST(seg2.nr - seg2.d AS DOUBLE))
        |      ELSE 0.0 END) AS v,
        |    max(tot.n) AS n
        |  FROM seg2 JOIN tot ON seg2.g = tot.g GROUP BY seg2.g),
        |one AS (SELECT
        |    sum(CASE WHEN g = 'a' THEN r END) AS ra,
        |    sum(CASE WHEN g = 'b' THEN r END) AS rb,
        |    sum(CASE WHEN g = 'a' THEN v END) AS va,
        |    sum(CASE WHEN g = 'b' THEN v END) AS vb,
        |    CAST(sum(CASE WHEN g = 'a' THEN n END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN g = 'b' THEN n END) AS BIGINT) AS n_b
        |  FROM pg),
        |zz AS (SELECT ra, rb, va, vb, n_a, n_b,
        |    sqrt(va + vb) AS se,
        |    round((rb - ra) / sqrt(va + vb), 6) AS z
        |  FROM one WHERE ra IS NOT NULL AND rb IS NOT NULL
        |    AND sqrt(va + vb) > 0.0),
        |ye AS (SELECT ra, rb, se, z, n_a, n_b,
        |    abs(z) / sqrt(2.0) AS y FROM zz)
        |SELECT 30.0 AS tau, round(ra, 6) AS rmst_a,
        |  round(rb, 6) AS rmst_b, round(rb - ra, 6) AS diff,
        |  round(se, 6) AS se, z AS z_stat,
        |  round(${codyErfcSql("y")}, 6) AS p_value, n_a, n_b
        |FROM ye""".stripMargin,
    // Hurst replay: per-size block R/S from decimal-exact block means
    // and t-ordered block cumsums, then the ln-ln OLS slope per key.
    "q_hurst" -> {
      def sizeCte(m: Int) =
        s"""b$m AS (SELECT k, p, mv,
          |    CAST(floor((rn - 1) / $m) AS BIGINT) AS bid FROM idx),
          |c$m AS (SELECT k, bid, p, mv,
          |    CAST(count(*) OVER (PARTITION BY k, bid) AS BIGINT)
          |      AS bc,
          |    CAST(sum(CAST(mv AS DECIMAL(38,6)))
          |      OVER (PARTITION BY k, bid) AS DOUBLE) / $m AS bm
          |  FROM b$m),
          |d$m AS (SELECT k, bid, p, mv - bm AS e FROM c$m
          |  WHERE bc = $m),
          |e$m AS (SELECT k, bid, p, e,
          |    sum(e) OVER (PARTITION BY k, bid ORDER BY p
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      AS s,
          |    sum(e * e) OVER (PARTITION BY k, bid ORDER BY p
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      AS ss,
          |    row_number() OVER (PARTITION BY k, bid ORDER BY p)
          |      AS brn
          |  FROM d$m),
          |f$m AS (SELECT k, bid, max(s) AS rmax, min(s) AS rmin,
          |    max(CASE WHEN brn = $m THEN ss END) AS ss
          |  FROM e$m GROUP BY k, bid),
          |g$m AS (SELECT k, (rmax - rmin) / sqrt(ss / $m) AS rs
          |  FROM f$m WHERE ss > 0.0),
          |h$m AS (SELECT k, CAST($m AS BIGINT) AS size,
          |    sum(rs) / count(*) AS rsm,
          |    CAST(count(*) AS BIGINT) AS n_blocks
          |  FROM g$m GROUP BY k)""".stripMargin
      s"""WITH e AS (SELECT event_type AS k, epoch_ns(ts) AS t,
        |    CAST(value AS DOUBLE) AS v FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |cells AS (SELECT k, t // 86400000000000 AS p,
        |    CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS mv
        |  FROM e GROUP BY k, p),
        |idx AS (SELECT k, p, mv,
        |    row_number() OVER (PARTITION BY k ORDER BY p) AS rn
        |  FROM cells),
        |${sizeCte(5)},
        |${sizeCte(10)},
        |${sizeCte(15)},
        |u AS (SELECT * FROM h5 UNION ALL SELECT * FROM h10
        |  UNION ALL SELECT * FROM h15),
        |pts AS (SELECT k, size, rsm, n_blocks,
        |    ln(CAST(size AS DOUBLE)) AS x, ln(rsm) AS y FROM u),
        |ft AS (SELECT k, CAST(count(*) AS BIGINT) AS np,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
        |    sum(x * y) AS sxy FROM pts GROUP BY k),
        |hh AS (SELECT k,
        |    round((CAST(np AS DOUBLE) * sxy - sx * sy)
        |      / (CAST(np AS DOUBLE) * sxx - sx * sx), 6) AS hurst
        |  FROM ft WHERE np >= 2
        |    AND CAST(np AS DOUBLE) * sxx - sx * sx > 0.0)
        |SELECT pts.k AS event_type, pts.size AS size,
        |  pts.n_blocks AS n_blocks, round(pts.rsm, 6) AS rs_mean,
        |  hh.hurst AS hurst
        |FROM pts JOIN hh ON pts.k = hh.k
        |ORDER BY event_type, size""".stripMargin
    },
    // TextRank replay: window-2 co-occurrence edges from the same
    // whitespace tokens, then two PageRank rounds as chained CTEs
    // (the q_pagerank discipline).
    "q_textrank" ->
      """WITH t AS (SELECT list_filter(
        |    regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |    x -> x <> '') AS w FROM documents),
        |p1 AS (SELECT unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS pr
        |  FROM t WHERE len(w) >= 2),
        |p2 AS (SELECT unnest(list_transform(range(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+2])) AS pr
        |  FROM t WHERE len(w) >= 3),
        |pp AS (SELECT split_part(pr, ' ', 1) AS a,
        |    split_part(pr, ' ', 2) AS b
        |  FROM (SELECT pr FROM p1 UNION ALL SELECT pr FROM p2)
        |  WHERE split_part(pr, ' ', 1) <> split_part(pr, ' ', 2)),
        |e AS (SELECT DISTINCT src, dst FROM (
        |  SELECT a AS src, b AS dst FROM pp
        |  UNION ALL SELECT b AS src, a AS dst FROM pp)),
        |deg AS (SELECT src, count(*) AS dg FROM e GROUP BY src),
        |nodes AS (SELECT DISTINCT src AS node FROM e
        |  UNION SELECT DISTINCT dst FROM e),
        |r1 AS (SELECT n.node, 0.15 + 0.85 * coalesce(c.s, 0.0) AS r
        |  FROM nodes n LEFT JOIN (SELECT e.dst, sum(1.0 / d.dg) AS s
        |    FROM e JOIN deg d ON e.src = d.src GROUP BY e.dst) c
        |  ON n.node = c.dst),
        |r2 AS (SELECT n.node, 0.15 + 0.85 * coalesce(c.s, 0.0) AS r
        |  FROM nodes n LEFT JOIN (SELECT e.dst, sum(p.r / d.dg) AS s
        |    FROM e JOIN deg d ON e.src = d.src
        |    JOIN r1 p ON p.node = e.src GROUP BY e.dst) c
        |  ON n.node = c.dst)
        |SELECT node AS token, round(r, 6) AS rank FROM r2
        |ORDER BY rank DESC, token ASC LIMIT 20""".stripMargin,
    // Monotone-bins replay: decile buckets by min-rank, interval
    // rates from prefix sums, the (a, j, b) minimax grid, dense_rank
    // on the bit-identical pooled fits.
    "q_monotone_bins" ->
      """WITH c AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_returnflag IS NOT NULL),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
        |r AS (SELECT x, y, rank() OVER (ORDER BY x) AS rk FROM c),
        |b AS (SELECT CAST(floor((CAST(rk AS DOUBLE) - 1) * 10 / nn.n)
        |    + 1 AS BIGINT) AS bucket, y FROM r, nn),
        |cells AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS n_pos FROM b GROUP BY bucket),
        |pre AS (SELECT bucket, n, n_pos,
        |    CAST(sum(n) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
        |    CAST(sum(n_pos) OVER (ORDER BY bucket ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cp
        |  FROM cells),
        |iv AS (SELECT a.bucket AS a, b2.bucket AS b,
        |    CAST(b2.cp - (a.cp - a.n_pos) AS DOUBLE)
        |      / (b2.cn - (a.cn - a.n)) AS avg
        |  FROM pre a JOIN pre b2 ON a.bucket <= b2.bucket),
        |im AS (SELECT j.bucket AS j, iv.a AS a, min(iv.avg) AS mn
        |  FROM pre j JOIN iv ON iv.a <= j.bucket
        |    AND iv.b >= j.bucket
        |  GROUP BY j.bucket, iv.a),
        |ft AS (SELECT j, max(mn) AS fit FROM im GROUP BY j),
        |mg AS (SELECT j, fit, CAST(dense_rank() OVER (ORDER BY fit)
        |    AS BIGINT) AS merged_bin FROM ft)
        |SELECT pre.bucket AS bucket, pre.n AS n, pre.n_pos AS n_pos,
        |  round(CAST(pre.n_pos AS DOUBLE) / pre.n, 6) AS rate,
        |  round(mg.fit, 6) AS fitted, mg.merged_bin
        |FROM pre JOIN mg ON pre.bucket = mg.j
        |ORDER BY bucket""".stripMargin,
    // Paired-t replay: per-row differences, explicit moment algebra,
    // rint-rounded outputs; p omitted (t CDF is not SQL).
    "q_paired_t" ->
      """WITH c AS (SELECT CAST(l_quantity AS DOUBLE)
        |      - CAST(l_discount AS DOUBLE) * 100 AS d
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE) * 100)),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(d) AS sd,
        |    sum(d * d) AS sdd FROM c),
        |m AS (SELECT n, sd / CAST(n AS DOUBLE) AS md,
        |    sqrt((sdd - CAST(n AS DOUBLE) * (sd / CAST(n AS DOUBLE))
        |      * (sd / CAST(n AS DOUBLE)))
        |      / (CAST(n AS DOUBLE) - 1.0)) AS s FROM a)
        |SELECT n, round_even(md * 1000000.0, 0) / 1000000.0
        |    AS mean_diff,
        |  round_even(s * 1000000.0, 0) / 1000000.0 AS sd_diff,
        |  round_even(md / (s / sqrt(CAST(n AS DOUBLE)))
        |    * 1000000.0, 0) / 1000000.0 AS t_stat,
        |  n - 1 AS dof,
        |  round_even(md / s * 1000000.0, 0) / 1000000.0 AS cohen_dz
        |FROM m""".stripMargin,
    // Cronbach replay: the same explicit-sum item/total variances.
    "q_cronbach" ->
      """WITH c AS (SELECT CAST(l_quantity AS DOUBLE) AS i1,
        |    CAST(l_discount AS DOUBLE) * 100 AS i2,
        |    CAST(l_tax AS DOUBLE) * 100 AS i3 FROM lineitem
        |  WHERE l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE) * 100)
        |    AND l_tax IS NOT NULL
        |    AND NOT isnan(CAST(l_tax AS DOUBLE) * 100)),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(i1) AS s0, sum(i1 * i1) AS q0,
        |    sum(i2) AS s1, sum(i2 * i2) AS q1,
        |    sum(i3) AS s2, sum(i3 * i3) AS q2,
        |    sum(i1 + i2 + i3) AS st,
        |    sum((i1 + i2 + i3) * (i1 + i2 + i3)) AS qt FROM c),
        |v AS (SELECT n,
        |    (q0 - CAST(n AS DOUBLE) * (s0 / CAST(n AS DOUBLE))
        |      * (s0 / CAST(n AS DOUBLE))) / (CAST(n AS DOUBLE) - 1.0)
        |    + (q1 - CAST(n AS DOUBLE) * (s1 / CAST(n AS DOUBLE))
        |      * (s1 / CAST(n AS DOUBLE))) / (CAST(n AS DOUBLE) - 1.0)
        |    + (q2 - CAST(n AS DOUBLE) * (s2 / CAST(n AS DOUBLE))
        |      * (s2 / CAST(n AS DOUBLE))) / (CAST(n AS DOUBLE) - 1.0)
        |      AS ivs,
        |    (qt - CAST(n AS DOUBLE) * (st / CAST(n AS DOUBLE))
        |      * (st / CAST(n AS DOUBLE))) / (CAST(n AS DOUBLE) - 1.0)
        |      AS tv FROM a)
        |SELECT n, CAST(3 AS BIGINT) AS k,
        |  round(1.5 * (1.0 - ivs / tv), 6) AS alpha,
        |  round(ivs, 6) AS item_var_sum, round(tv, 6) AS total_var
        |FROM v WHERE n >= 2 AND tv > 0.0""".stripMargin,
    // Binned-MI replay: tie-stable decile buckets via min-rank on
    // both columns, then the q_mutual_info cell algebra.
    "q_mi_continuous" ->
      """WITH c AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x,
        |    CAST(l_quantity AS DOUBLE) AS y FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
        |r AS (SELECT x, y, rank() OVER (ORDER BY x) AS rx,
        |    rank() OVER (ORDER BY y) AS ry FROM c),
        |b AS (SELECT
        |    CAST(floor((CAST(rx AS DOUBLE) - 1) * 10 / nn.n) + 1
        |      AS BIGINT) AS ba,
        |    CAST(floor((CAST(ry AS DOUBLE) - 1) * 10 / nn.n) + 1
        |      AS BIGINT) AS bb
        |  FROM r, nn),
        |cells AS (SELECT ba, bb, CAST(count(*) AS BIGINT) AS n
        |  FROM b GROUP BY ba, bb),
        |m AS (SELECT ba, bb, n,
        |    CAST(sum(n) OVER (PARTITION BY ba) AS BIGINT) AS na,
        |    CAST(sum(n) OVER (PARTITION BY bb) AS BIGINT) AS nb,
        |    CAST(sum(n) OVER () AS BIGINT) AS nt FROM cells)
        |SELECT round(sum((CAST(n AS DOUBLE) / nt)
        |    * ln((CAST(n AS DOUBLE) * nt)
        |      / (CAST(na AS DOUBLE) * nb))), 6) AS mi,
        |  max(nt) AS n,
        |  CAST(count(DISTINCT ba) AS BIGINT) AS n_a,
        |  CAST(count(DISTINCT bb) AS BIGINT) AS n_b
        |FROM m""".stripMargin,
    // HBOS replay: one min/max scan, fixed-grid bins, per-feature
    // histogram joins, the summed negative log densities, top-20.
    "q_hbos" ->
      """WITH c AS (SELECT l_orderkey * 10 + l_linenumber AS id,
        |    CAST(l_quantity AS DOUBLE) AS x0,
        |    CAST(l_extendedprice AS DOUBLE) AS x1,
        |    CAST(l_discount AS DOUBLE) AS x2 FROM lineitem
        |  WHERE l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))
        |    AND l_orderkey IS NOT NULL),
        |st AS (SELECT min(x0) AS mn0, max(x0) AS mx0, min(x1) AS mn1,
        |    max(x1) AS mx1, min(x2) AS mn2, max(x2) AS mx2,
        |    CAST(count(*) AS BIGINT) AS n FROM c),
        |b AS (SELECT id, n,
        |    CASE WHEN mx0 > mn0 THEN least(9, CAST(floor((x0 - mn0)
        |      / ((mx0 - mn0) / 10)) AS BIGINT)) ELSE 0 END AS b0,
        |    CASE WHEN mx1 > mn1 THEN least(9, CAST(floor((x1 - mn1)
        |      / ((mx1 - mn1) / 10)) AS BIGINT)) ELSE 0 END AS b1,
        |    CASE WHEN mx2 > mn2 THEN least(9, CAST(floor((x2 - mn2)
        |      / ((mx2 - mn2) / 10)) AS BIGINT)) ELSE 0 END AS b2
        |  FROM c, st),
        |h0 AS (SELECT b0, CAST(count(*) AS BIGINT) AS c0 FROM b
        |  GROUP BY b0),
        |h1 AS (SELECT b1, CAST(count(*) AS BIGINT) AS c1 FROM b
        |  GROUP BY b1),
        |h2 AS (SELECT b2, CAST(count(*) AS BIGINT) AS c2 FROM b
        |  GROUP BY b2),
        |sc AS (SELECT b.id AS id,
        |    round((-ln(CAST(c0 AS DOUBLE) / CAST(n AS DOUBLE)))
        |      + (-ln(CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE)))
        |      + (-ln(CAST(c2 AS DOUBLE) / CAST(n AS DOUBLE))), 6)
        |      AS score,
        |    b0, b1, b2
        |  FROM b JOIN h0 USING (b0) JOIN h1 USING (b1)
        |    JOIN h2 USING (b2))
        |SELECT id, score, b0 AS bin_l_quantity,
        |  b1 AS bin_l_extendedprice, b2 AS bin_l_discount
        |FROM sc ORDER BY score DESC, id ASC LIMIT 20""".stripMargin,
    // ITS replay: decimal-exact daily means, conditional segment
    // moments, the olsByGroup ratio algebra, rint-rounded outputs.
    "q_its" ->
      """WITH e AS (SELECT epoch_ns(ts) AS t, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        |    AND NOT isnan(value)),
        |cells AS (SELECT t // 86400000000000 AS p,
        |    CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS y
        |  FROM e GROUP BY p),
        |seg AS (SELECT p, y,
        |    CASE WHEN p < 1705363200000000000 // 86400000000000
        |      THEN 'pre' ELSE 'post' END AS s FROM cells),
        |a AS (SELECT s, CAST(count(*) AS BIGINT) AS m,
        |    sum(CAST(p AS DOUBLE)) AS sx, sum(y) AS sy,
        |    sum(CAST(p AS DOUBLE) * CAST(p AS DOUBLE)) AS sxx,
        |    sum(CAST(p AS DOUBLE) * y) AS sxy FROM seg GROUP BY s),
        |f AS (SELECT s, m,
        |    (sxy / CAST(m AS DOUBLE) - (sx / CAST(m AS DOUBLE))
        |      * (sy / CAST(m AS DOUBLE)))
        |    / (sxx / CAST(m AS DOUBLE) - (sx / CAST(m AS DOUBLE))
        |      * (sx / CAST(m AS DOUBLE))) AS slope,
        |    sx / CAST(m AS DOUBLE) AS mx, sy / CAST(m AS DOUBLE) AS my
        |  FROM a),
        |i AS (SELECT s, m, slope, my - slope * mx AS icept FROM f),
        |w AS (SELECT
        |    max(CASE WHEN s = 'pre' THEN m END) AS n_pre,
        |    max(CASE WHEN s = 'post' THEN m END) AS n_post,
        |    max(CASE WHEN s = 'pre' THEN slope END) AS sp,
        |    max(CASE WHEN s = 'post' THEN slope END) AS so,
        |    max(CASE WHEN s = 'pre' THEN icept END) AS ip,
        |    max(CASE WHEN s = 'post' THEN icept END) AS io
        |  FROM i)
        |SELECT n_pre, n_post,
        |  round_even(sp * 1000000.0, 0) / 1000000.0 AS slope_pre,
        |  round_even(so * 1000000.0, 0) / 1000000.0 AS slope_post,
        |  round_even((so - sp) * 1000000.0, 0) / 1000000.0
        |    AS slope_change,
        |  round_even(((io + so * CAST(1705363200000000000
        |      // 86400000000000 AS DOUBLE))
        |    - (ip + sp * CAST(1705363200000000000
        |      // 86400000000000 AS DOUBLE))) * 1000000.0, 0)
        |    / 1000000.0 AS level_change
        |FROM w""".stripMargin,
    // Weighted-OLS replay: explicit weighted sums, the identical
    // moment-ratio algebra.
    "q_ols_weighted" ->
      """WITH c AS (SELECT l_returnflag AS g,
        |    CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y,
        |    1.0 + CAST(l_discount AS DOUBLE) * 10 AS w FROM lineitem
        |  WHERE l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(1.0 + CAST(l_discount AS DOUBLE) * 10)
        |    AND 1.0 + CAST(l_discount AS DOUBLE) * 10 >= 0.0),
        |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n, sum(w) AS sw,
        |    sum(w * x) AS swx, sum(w * y) AS swy,
        |    sum(w * x * x) AS swxx, sum(w * y * y) AS swyy,
        |    sum(w * x * y) AS swxy FROM c GROUP BY g),
        |m AS (SELECT g, n, sw, swx / sw AS mx, swy / sw AS my,
        |    swxx / sw AS rxx, swyy / sw AS ryy, swxy / sw AS rxy
        |  FROM a),
        |v AS (SELECT g, n, sw, mx, my, rxx - mx * mx AS vx,
        |    ryy - my * my AS vy, rxy - mx * my AS cxy FROM m)
        |SELECT g AS l_returnflag, n, round(sw, 6) AS w_sum,
        |  round(cxy / vx, 6) AS slope,
        |  round(my - cxy / vx * mx, 6) AS intercept,
        |  round(cxy * cxy / (vx * vy), 6) AS r2
        |FROM v WHERE n >= 3 AND sw > 0.0 AND vx > 0.0 AND vy > 0.0
        |ORDER BY l_returnflag""".stripMargin,
    // SRM replay: counts vs design expectation, dof-1 tail via erfc.
    "q_srm" ->
      s"""WITH c AS (SELECT
        |    CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm
        |  FROM events WHERE user_id IS NOT NULL),
        |cnt AS (SELECT arm, CAST(count(*) AS BIGINT) AS c FROM c
        |  GROUP BY arm),
        |t(av, share) AS (VALUES ('a', CAST(0.5 AS DOUBLE)),
        |  ('b', CAST(0.5 AS DOUBLE))),
        |j AS (SELECT t.av, coalesce(cnt.c, 0) AS c, t.share
        |  FROM t LEFT JOIN cnt ON cnt.arm = t.av),
        |un AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS nunexp
        |  FROM cnt WHERE arm NOT IN ('a', 'b')),
        |a AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM j),
        |x AS (SELECT a.n,
        |    round(sum((CAST(j.c AS DOUBLE) - CAST(a.n AS DOUBLE)
        |      * j.share) * (CAST(j.c AS DOUBLE) - CAST(a.n AS DOUBLE)
        |      * j.share) / (CAST(a.n AS DOUBLE) * j.share)), 6)
        |      AS chi2
        |  FROM j, a GROUP BY a.n),
        |ye AS (SELECT n, chi2, sqrt(chi2 / 2.0) AS y FROM x),
        |p AS (SELECT n, chi2,
        |    round_even(${codyErfcSql("y")} * 1000000.0, 0) / 1000000.0
        |      AS p_value FROM ye)
        |SELECT n, chi2, CAST(1 AS BIGINT) AS dof, p_value,
        |  p_value < 0.001 AS srm, un.nunexp AS n_unexpected
        |FROM p, un""".stripMargin,
    // Weighted-moments replay: the same frequency-weight sums.
    "q_weighted_moments" ->
      """WITH c AS (SELECT l_linestatus AS g,
        |    CAST(l_quantity AS DOUBLE) AS x,
        |    1.0 + CAST(l_discount AS DOUBLE) * 10 AS w FROM lineitem
        |  WHERE l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(1.0 + CAST(l_discount AS DOUBLE) * 10)
        |    AND 1.0 + CAST(l_discount AS DOUBLE) * 10 >= 0.0),
        |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n, sum(w) AS sw,
        |    sum(w * w) AS sww, sum(w * x) AS swx,
        |    sum(w * x * x) AS swxx FROM c GROUP BY g),
        |m AS (SELECT g, n, sw, sww, swx / sw AS mw,
        |    swxx / sw - (swx / sw) * (swx / sw) AS vw FROM a)
        |SELECT g AS l_linestatus, n, round(sw, 6) AS w_sum,
        |  CASE WHEN sww > 0.0 THEN round(sw * sw / sww, 6) END AS ess,
        |  round(mw, 6) AS mean_w, round(vw, 6) AS var_w,
        |  CASE WHEN vw >= 0.0 THEN round(sqrt(vw), 6) END AS std_w
        |FROM m WHERE sw > 0.0 ORDER BY l_linestatus""".stripMargin,
    // DR replay: the q_ips weight arithmetic plus the pinned model.
    "q_dr" ->
      """WITH c AS (SELECT event_type AS action,
        |    CAST(user_id % 10 + 1 AS DOUBLE) / 20.0 AS p,
        |    CAST(value AS DOUBLE) / 100.0 AS r,
        |    CASE WHEN user_id % 7 = 0 THEN 'click' ELSE 'view' END
        |      AS target
        |  FROM events WHERE user_id IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)
        |    AND event_type IS NOT NULL),
        |q AS (SELECT *,
        |    0.3 + CAST(length(target) % 3 AS DOUBLE) * 0.2 AS qt,
        |    0.3 + CAST(length(action) % 3 AS DOUBLE) * 0.2 AS ql
        |  FROM c WHERE p > 0.0),
        |w AS (SELECT *,
        |    CASE WHEN action = target THEN 1.0 / p ELSE 0.0 END AS wr,
        |    least(CASE WHEN action = target THEN 1.0 / p ELSE 0.0 END,
        |      10.0) AS wc
        |  FROM q),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(qt + wc * (r - ql)) AS sdr, sum(qt) AS sdm,
        |    sum(wc * (r - ql)) AS scorr,
        |    CAST(sum(CASE WHEN action = target THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nm,
        |    CAST(sum(CASE WHEN wr > 10.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nclip
        |  FROM w)
        |SELECT n, round(sdr / CAST(n AS DOUBLE), 6) AS dr,
        |  round(sdm / CAST(n AS DOUBLE), 6) AS dm,
        |  round(scorr / CAST(n AS DOUBLE), 6) AS correction,
        |  round(CAST(nm AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    AS match_rate,
        |  round(CAST(nclip AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    AS clip_share
        |FROM a WHERE n > 0""".stripMargin,
    // Ratio-metric replay: explicit moments, the identical
    // delta-method shape.
    "q_ratio_ci" ->
      """WITH c AS (SELECT l_returnflag AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS y,
        |    CAST(l_quantity AS DOUBLE) AS x FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))),
        |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n, sum(y) AS sy,
        |    sum(x) AS sx, sum(y * y) AS syy, sum(x * x) AS sxx,
        |    sum(x * y) AS sxy FROM c GROUP BY g),
        |m AS (SELECT g, n, CAST(n AS DOUBLE) AS nd,
        |    sy / CAST(n AS DOUBLE) AS my, sx / CAST(n AS DOUBLE) AS mx,
        |    sy, sx, syy, sxx, sxy FROM a),
        |v AS (SELECT g, n, nd, mx, my / mx AS ratio,
        |    (syy - nd * my * my) / (nd - 1.0) AS vy,
        |    (sxx - nd * mx * mx) / (nd - 1.0) AS vx,
        |    (sxy - nd * mx * my) / (nd - 1.0) AS cxy, sx FROM m),
        |se AS (SELECT g, n, ratio,
        |    sqrt((vy + ratio * ratio * vx - 2.0 * ratio * cxy)
        |      / (nd * (mx * mx))) AS se, sx FROM v)
        |SELECT g AS l_returnflag, n, round(ratio, 6) AS ratio,
        |  round(se, 6) AS se,
        |  round(ratio - 1.959964 * se, 6) AS ci_lo,
        |  round(ratio + 1.959964 * se, 6) AS ci_hi
        |FROM se WHERE n >= 2 AND abs(sx) > 0.0
        |ORDER BY l_returnflag""".stripMargin,
    // Post-stratification replay: strata moments joined to the target
    // VALUES, the identical weighted fold.
    "q_post_strat" ->
      """WITH t(sv, t) AS (VALUES ('A', CAST(0.3 AS DOUBLE)),
        |  ('N', CAST(0.5 AS DOUBLE)), ('R', CAST(0.2 AS DOUBLE))),
        |cells AS (SELECT l_returnflag AS sv,
        |    CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(l_extendedprice AS DOUBLE)) AS sy,
        |    sum(CAST(l_extendedprice AS DOUBLE)
        |      * CAST(l_extendedprice AS DOUBLE)) AS syy
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_returnflag IS NOT NULL
        |  GROUP BY l_returnflag),
        |j AS (SELECT cells.sv, n, sy, syy, t.t FROM cells
        |  JOIN t ON cells.sv = t.sv WHERE n >= 2)
        |SELECT
        |  round(sum(sy) / CAST(sum(n) AS DOUBLE), 6) AS mean_raw,
        |  round(sum(t * (sy / CAST(n AS DOUBLE))), 6) AS mean_post,
        |  round(sqrt(sum(t * t * ((syy - CAST(n AS DOUBLE)
        |      * (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
        |      / (CAST(n AS DOUBLE) - 1.0)) / CAST(n AS DOUBLE))), 6)
        |    AS se,
        |  CAST(sum(n) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS n_strata
        |FROM j""".stripMargin,
    // Fisher-z replay: explicit moments, the ln/exp tanh expansion,
    // p at the rounded statistic via Cody erfc.
    "q_corr_ci" ->
      s"""WITH c AS (SELECT l_returnflag AS g,
        |    CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem
        |  WHERE l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
        |    sum(y) AS sy, sum(x * x) AS sxx, sum(y * y) AS syy,
        |    sum(x * y) AS sxy FROM c GROUP BY g),
        |m AS (SELECT g, n, CAST(n AS DOUBLE) AS nd,
        |    sx / CAST(n AS DOUBLE) AS mx, sy / CAST(n AS DOUBLE) AS my,
        |    sxx / CAST(n AS DOUBLE) AS rxx,
        |    syy / CAST(n AS DOUBLE) AS ryy,
        |    sxy / CAST(n AS DOUBLE) AS rxy FROM a),
        |v AS (SELECT g, n, nd, rxx - mx * mx AS vx, ryy - my * my AS vy,
        |    rxy - mx * my AS cxy FROM m),
        |r AS (SELECT g, n, nd, vx, vy,
        |    cxy / sqrt(vx * vy) AS r FROM v),
        |zz AS (SELECT g, n, nd, vx, vy, r,
        |    0.5 * ln((1.0 + r) / (1.0 - r)) AS zr,
        |    1.0 / sqrt(nd - 3.0) AS se FROM r),
        |st AS (SELECT g, n, vx, vy, r, zr, se,
        |    round(abs(zr) * sqrt(nd - 3.0), 6) AS stat FROM zz),
        |ye AS (SELECT g, n, vx, vy, r, zr, se, stat,
        |    stat / sqrt(2.0) AS y FROM st)
        |SELECT g AS l_returnflag, n, round(r, 6) AS r,
        |  round((exp((zr - 1.959964 * se) * 2.0) - 1.0)
        |    / (exp((zr - 1.959964 * se) * 2.0) + 1.0), 6) AS ci_lo,
        |  round((exp((zr + 1.959964 * se) * 2.0) - 1.0)
        |    / (exp((zr + 1.959964 * se) * 2.0) + 1.0), 6) AS ci_hi,
        |  round_even(${codyErfcSql("y")} * 1000000.0, 0) / 1000000.0
        |    AS p_value
        |FROM ye WHERE n > 3 AND vx > 0.0 AND vy > 0.0 AND abs(r) < 1.0
        |ORDER BY l_returnflag""".stripMargin,
    // IPS replay: the identical clipped-weight ratio arithmetic.
    "q_ips" ->
      """WITH c AS (SELECT event_type AS action,
        |    CAST(user_id % 10 + 1 AS DOUBLE) / 20.0 AS p,
        |    CAST(value AS DOUBLE) / 100.0 AS r,
        |    CASE WHEN user_id % 7 = 0 THEN 'click' ELSE 'view' END
        |      AS target
        |  FROM events WHERE user_id IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)
        |    AND event_type IS NOT NULL),
        |w AS (SELECT *,
        |    CASE WHEN action = target THEN 1.0 / p ELSE 0.0 END AS wr,
        |    least(CASE WHEN action = target THEN 1.0 / p ELSE 0.0 END,
        |      10.0) AS wc
        |  FROM c WHERE p > 0.0),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN action = target THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nm,
        |    sum(wc * r) AS swr, sum(wc) AS sw, sum(wc * wc) AS sww,
        |    CAST(sum(CASE WHEN wr > 10.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nclip
        |  FROM w)
        |SELECT n,
        |  round(CAST(nm AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    AS match_rate,
        |  round(swr / CAST(n AS DOUBLE), 6) AS ips,
        |  CASE WHEN sw > 0.0 THEN round(swr / sw, 6) END AS snips,
        |  CASE WHEN sww > 0.0 THEN round(sw * sw / sww, 6) END AS ess,
        |  round(CAST(nclip AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    AS clip_share
        |FROM a WHERE n > 0""".stripMargin,
    // CCF replay: decimal-exact daily means, one lead subquery per
    // lag unioned, the shared moment-ratio shape.
    "q_ccf" ->
      """WITH e AS (SELECT event_type AS k, epoch_ns(ts) AS t,
        |    CAST(value AS DOUBLE) AS x,
        |    CAST(user_id % 50 AS DOUBLE) AS y FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)
        |    AND user_id IS NOT NULL),
        |cells AS (SELECT k, t // 86400000000000 AS p,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS xv,
        |    CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS yv
        |  FROM e GROUP BY k, p),
        |lagged AS (
        |  SELECT k, CAST(-2 AS BIGINT) AS lag,
        |      lead(xv, 2) OVER (PARTITION BY k ORDER BY p) AS a,
        |      yv AS b FROM cells
        |  UNION ALL SELECT k, CAST(-1 AS BIGINT),
        |      lead(xv, 1) OVER (PARTITION BY k ORDER BY p), yv
        |    FROM cells
        |  UNION ALL SELECT k, CAST(0 AS BIGINT), xv, yv FROM cells
        |  UNION ALL SELECT k, CAST(1 AS BIGINT), xv,
        |      lead(yv, 1) OVER (PARTITION BY k ORDER BY p) FROM cells
        |  UNION ALL SELECT k, CAST(2 AS BIGINT), xv,
        |      lead(yv, 2) OVER (PARTITION BY k ORDER BY p) FROM cells),
        |ag AS (SELECT k, lag, CAST(count(*) AS BIGINT) AS n,
        |    sum(a) AS sa, sum(b) AS sb, sum(a * a) AS saa,
        |    sum(b * b) AS sbb, sum(a * b) AS sab
        |  FROM lagged WHERE a IS NOT NULL AND b IS NOT NULL
        |  GROUP BY k, lag),
        |mo AS (SELECT k, lag, n,
        |    sa / CAST(n AS DOUBLE) AS ma, sb / CAST(n AS DOUBLE) AS mb,
        |    saa / CAST(n AS DOUBLE) AS raa,
        |    sbb / CAST(n AS DOUBLE) AS rbb,
        |    sab / CAST(n AS DOUBLE) AS rab FROM ag),
        |cv AS (SELECT k, lag, n, raa - ma * ma AS va,
        |    rbb - mb * mb AS vb, rab - ma * mb AS cab FROM mo)
        |SELECT k AS event_type, lag, n,
        |  round(cab / sqrt(va * vb), 6) AS ccf
        |FROM cv WHERE n >= 3 AND va > 0.0 AND vb > 0.0
        |ORDER BY event_type, lag""".stripMargin,
    // Quantile-CI replay: distinct-value cells, cumulative ranks, the
    // binomial-normal rank bounds, exact order-statistic selects.
    "q_quantile_ci" ->
      """WITH c AS (SELECT l_linestatus AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |cells AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
        |  FROM c GROUP BY g, v),
        |w AS (SELECT g, v, c,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n,
        |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM cells),
        |r AS (SELECT g, v, c, n, cum,
        |    CAST(ceil(CAST(n AS DOUBLE) * 0.9) AS BIGINT) AS rq,
        |    greatest(1, CAST(floor(CAST(n AS DOUBLE) * 0.9
        |      - 1.959964 * sqrt(CAST(n AS DOUBLE) * 0.9 * (1.0 - 0.9)))
        |      AS BIGINT)) AS rlo,
        |    least(n, CAST(ceil(CAST(n AS DOUBLE) * 0.9
        |      + 1.959964 * sqrt(CAST(n AS DOUBLE) * 0.9 * (1.0 - 0.9)))
        |      AS BIGINT) + 1) AS rhi
        |  FROM w)
        |SELECT g AS l_linestatus, max(n) AS n,
        |  min(CASE WHEN cum >= rq THEN v END) AS quantile,
        |  CASE WHEN max(n) >= 2
        |    THEN min(CASE WHEN cum >= rlo THEN v END) END AS ci_lo,
        |  CASE WHEN max(n) >= 2
        |    THEN min(CASE WHEN cum >= rhi THEN v END) END AS ci_hi
        |FROM r GROUP BY g ORDER BY l_linestatus""".stripMargin,
    // Yuen replay: rank-located winsorization bounds, integer band
    // overlaps for the trimmed sum, the exact Welch-Satterthwaite
    // algebra; p is omitted (t CDF is not SQL — q_anova convention).
    "q_yuen" ->
      """WITH c AS (SELECT
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |cells AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
        |  FROM c GROUP BY g, v),
        |w AS (SELECT g, v, c,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n,
        |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM cells),
        |gc AS (SELECT g, v, c, n, cum,
        |    CAST(floor(CAST(n AS DOUBLE) * 0.2) AS BIGINT) AS gcut
        |  FROM w),
        |bnd AS (SELECT g, max(n) AS n, max(gcut) AS gcut,
        |    min(CASE WHEN cum >= gcut + 1 THEN v END) AS lo,
        |    min(CASE WHEN cum >= n - gcut THEN v END) AS hi
        |  FROM gc GROUP BY g),
        |j AS (SELECT gc.g AS g, gc.v AS v, gc.c AS c, gc.cum AS cum,
        |    b.n AS n, b.gcut AS gcut, b.lo AS lo, b.hi AS hi
        |  FROM gc JOIN bnd b ON gc.g = b.g),
        |ag AS (SELECT g, max(n) AS n, max(gcut) AS gcut,
        |    sum(v * CAST(greatest(0, least(cum, n - gcut)
        |      - greatest(cum - c, gcut)) AS DOUBLE)) AS ts,
        |    sum(least(greatest(v, lo), hi) * c) AS ws,
        |    sum(least(greatest(v, lo), hi)
        |      * least(greatest(v, lo), hi) * c) AS wq
        |  FROM j GROUP BY g),
        |sides AS (SELECT
        |    max(CASE WHEN g = 'a' THEN n END) AS na,
        |    max(CASE WHEN g = 'a' THEN n - 2 * gcut END) AS ha,
        |    max(CASE WHEN g = 'a' THEN ts END) AS tsa,
        |    max(CASE WHEN g = 'a' THEN ws END) AS wsa,
        |    max(CASE WHEN g = 'a' THEN wq END) AS wqa,
        |    max(CASE WHEN g = 'b' THEN n END) AS nb,
        |    max(CASE WHEN g = 'b' THEN n - 2 * gcut END) AS hb,
        |    max(CASE WHEN g = 'b' THEN ts END) AS tsb,
        |    max(CASE WHEN g = 'b' THEN ws END) AS wsb,
        |    max(CASE WHEN g = 'b' THEN wq END) AS wqb
        |  FROM ag),
        |mm AS (SELECT na, nb, ha, hb,
        |    tsa / ha AS mta, tsb / hb AS mtb,
        |    (wqa - na * (wsa / na) * (wsa / na))
        |      / (na - 1.0) * (na - 1.0)
        |      / (CAST(ha AS DOUBLE) * (ha - 1.0)) AS da,
        |    (wqb - nb * (wsb / nb) * (wsb / nb))
        |      / (nb - 1.0) * (nb - 1.0)
        |      / (CAST(hb AS DOUBLE) * (hb - 1.0)) AS db
        |  FROM sides),
        |st AS (SELECT na, nb, ha, hb, mta, mtb, da, db,
        |    round_even((mta - mtb) / sqrt(da + db) * 1000000.0, 0)
        |      / 1000000.0 AS t_stat,
        |    round_even((da + db) * (da + db)
        |      / (da * da / (ha - 1.0) + db * db / (hb - 1.0))
        |      * 1000000.0, 0) / 1000000.0 AS dof
        |  FROM mm)
        |SELECT round_even(mta * 1000000.0, 0) / 1000000.0
        |    AS mean_trim_a,
        |  round_even(mtb * 1000000.0, 0) / 1000000.0 AS mean_trim_b,
        |  round_even((mta - mtb) * 1000000.0, 0) / 1000000.0 AS diff,
        |  t_stat, dof, na AS n_a, nb AS n_b, ha AS h_a, hb AS h_b
        |FROM st""".stripMargin,
    // QTE replay: the quantile-CI construction per cohort and per q,
    // joined on q.
    "q_qte" ->
      """WITH c AS (SELECT
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |cells AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
        |  FROM c GROUP BY g, v),
        |w AS (SELECT g, v, c,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n,
        |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM cells),
        |qq(q) AS (VALUES (CAST(0.5 AS DOUBLE)),
        |  (CAST(0.9 AS DOUBLE))),
        |per AS (SELECT w.g AS g, qq.q AS q, max(w.n) AS n,
        |    min(CASE WHEN cum >= CAST(ceil(CAST(n AS DOUBLE) * qq.q)
        |      AS BIGINT) THEN v END) AS qv,
        |    min(CASE WHEN cum >= greatest(1,
        |      CAST(floor(CAST(n AS DOUBLE) * qq.q - 1.959964
        |        * sqrt(CAST(n AS DOUBLE) * qq.q * (1.0 - qq.q)))
        |        AS BIGINT)) THEN v END) AS lo,
        |    min(CASE WHEN cum >= least(n,
        |      CAST(ceil(CAST(n AS DOUBLE) * qq.q + 1.959964
        |        * sqrt(CAST(n AS DOUBLE) * qq.q * (1.0 - qq.q)))
        |        AS BIGINT) + 1) THEN v END) AS hi
        |  FROM w, qq GROUP BY w.g, qq.q)
        |SELECT a.q AS q, a.n AS n_a, b.n AS n_b, a.qv AS q_a,
        |  b.qv AS q_b, round(b.qv - a.qv, 6) AS qte,
        |  a.lo AS a_lo, a.hi AS a_hi, b.lo AS b_lo, b.hi AS b_hi
        |FROM per a JOIN per b ON a.q = b.q
        |  AND a.g = 'a' AND b.g = 'b'
        |ORDER BY q""".stripMargin,
    // DiD replay: four conditional-moment cells, the identical
    // sample-variance algebra, p at the rounded z via Cody erfc.
    "q_did" ->
      s"""WITH c AS (SELECT (l_orderkey % 2 = 0) AS t,
        |    (l_linestatus = 'O') AS post,
        |    CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |a AS (SELECT
        |    CAST(sum(CASE WHEN t AND NOT post THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    sum(CASE WHEN t AND NOT post THEN y ELSE 0.0 END) AS s1,
        |    sum(CASE WHEN t AND NOT post THEN y * y ELSE 0.0 END) AS q1,
        |    CAST(sum(CASE WHEN t AND post THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n2,
        |    sum(CASE WHEN t AND post THEN y ELSE 0.0 END) AS s2,
        |    sum(CASE WHEN t AND post THEN y * y ELSE 0.0 END) AS q2,
        |    CAST(sum(CASE WHEN NOT t AND NOT post THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n3,
        |    sum(CASE WHEN NOT t AND NOT post THEN y ELSE 0.0 END) AS s3,
        |    sum(CASE WHEN NOT t AND NOT post THEN y * y ELSE 0.0 END)
        |      AS q3,
        |    CAST(sum(CASE WHEN NOT t AND post THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n4,
        |    sum(CASE WHEN NOT t AND post THEN y ELSE 0.0 END) AS s4,
        |    sum(CASE WHEN NOT t AND post THEN y * y ELSE 0.0 END) AS q4
        |  FROM c),
        |d AS (SELECT n1, n2, n3, n4,
        |    s1 / n1 AS m1, s2 / n2 AS m2, s3 / n3 AS m3, s4 / n4 AS m4,
        |    (q1 - n1 * (s1 / n1) * (s1 / n1))
        |      / CAST(n1 - 1 AS DOUBLE) AS v1,
        |    (q2 - n2 * (s2 / n2) * (s2 / n2))
        |      / CAST(n2 - 1 AS DOUBLE) AS v2,
        |    (q3 - n3 * (s3 / n3) * (s3 / n3))
        |      / CAST(n3 - 1 AS DOUBLE) AS v3,
        |    (q4 - n4 * (s4 / n4) * (s4 / n4))
        |      / CAST(n4 - 1 AS DOUBLE) AS v4
        |  FROM a WHERE n1 > 1 AND n2 > 1 AND n3 > 1 AND n4 > 1),
        |e AS (SELECT n1, n2, n3, n4, m1, m2, m3, m4,
        |    (m2 - m1) - (m4 - m3) AS did,
        |    sqrt(v1 / n1 + v2 / n2 + v3 / n3 + v4 / n4) AS se
        |  FROM d),
        |zz AS (SELECT *, round(did / se, 6) AS z FROM e),
        |ye AS (SELECT *, abs(z) / sqrt(2.0) AS y FROM zz)
        |SELECT round(m1, 6) AS mean_t_pre, round(m2, 6) AS mean_t_post,
        |  round(m3, 6) AS mean_c_pre, round(m4, 6) AS mean_c_post,
        |  round(did, 6) AS did, round(se, 6) AS se, z,
        |  round_even(${codyErfcSql("y")} * 1000000.0, 0) / 1000000.0
        |    AS p_value,
        |  n1 + n2 + n3 + n4 AS n FROM ye""".stripMargin,
    // Power replay: one variance fold, pinned z literals written as
    // the same sums the Scala computes, ceiling after the 6-round.
    "q_power_means" ->
      """WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(l_quantity AS DOUBLE)) AS s,
        |    sum(CAST(l_quantity AS DOUBLE)
        |      * CAST(l_quantity AS DOUBLE)) AS q
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))),
        |v AS (SELECT n,
        |    (q - CAST(n AS DOUBLE) * (s / CAST(n AS DOUBLE))
        |      * (s / CAST(n AS DOUBLE)))
        |      / (CAST(n AS DOUBLE) - 1.0) AS s2 FROM a),
        |r AS (SELECT s2, round(2.0
        |    * ((1.959964 + 0.841621) * (1.959964 + 0.841621)) * s2
        |    / (0.5 * 0.5), 6) AS raw
        |  FROM v WHERE n > 1 AND s2 > 0.0)
        |SELECT round(s2, 6) AS sigma2, 0.5 AS mde,
        |  CAST(ceil(raw) AS BIGINT) AS n_per_arm,
        |  CAST(ceil(raw) AS BIGINT) * 2 AS n_total FROM r""".stripMargin,
    // Granger replay: decimal-exact daily means, one lag window, the
    // olsByGroup2 central-moment algebra for both nested SSEs.
    "q_granger" ->
      """WITH e AS (SELECT event_type AS k, epoch_ns(ts) AS t,
        |    CAST(value AS DOUBLE) AS y,
        |    CAST(user_id % 50 AS DOUBLE) AS x FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)
        |    AND user_id IS NOT NULL),
        |cells AS (SELECT k, t // 86400000000000 AS p,
        |    CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS yv,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS xv
        |  FROM e GROUP BY k, p),
        |lg AS (SELECT k, yv AS y,
        |    lag(yv) OVER (PARTITION BY k ORDER BY p) AS a,
        |    lag(xv) OVER (PARTITION BY k ORDER BY p) AS b
        |  FROM cells),
        |ok AS (SELECT * FROM lg WHERE a IS NOT NULL AND b IS NOT NULL),
        |ag AS (SELECT k, CAST(count(*) AS BIGINT) AS m,
        |    sum(y) AS sy, sum(a) AS sa, sum(b) AS sb,
        |    sum(y * y) AS syy, sum(a * a) AS saa, sum(b * b) AS sbb,
        |    sum(a * y) AS say, sum(b * y) AS sby, sum(a * b) AS sab
        |  FROM ok GROUP BY k),
        |mo AS (SELECT k, m, CAST(m AS DOUBLE) AS n,
        |    sy / CAST(m AS DOUBLE) AS my, sa / CAST(m AS DOUBLE) AS ma,
        |    sb / CAST(m AS DOUBLE) AS mb,
        |    syy / CAST(m AS DOUBLE) AS ryy,
        |    saa / CAST(m AS DOUBLE) AS raa,
        |    sbb / CAST(m AS DOUBLE) AS rbb,
        |    say / CAST(m AS DOUBLE) AS ray,
        |    sby / CAST(m AS DOUBLE) AS rby,
        |    sab / CAST(m AS DOUBLE) AS rab FROM ag),
        |cv AS (SELECT k, m, n,
        |    ryy - my * my AS vy, raa - ma * ma AS va,
        |    rbb - mb * mb AS vb, ray - ma * my AS cay,
        |    rby - mb * my AS cby, rab - ma * mb AS cab FROM mo),
        |fit AS (SELECT k, m, n, vy, va, vb, cay, cby, cab,
        |    va * vb - cab * cab AS det,
        |    (vb * cay - cab * cby) / (va * vb - cab * cab) AS b1,
        |    (va * cby - cab * cay) / (va * vb - cab * cab) AS b2
        |  FROM cv),
        |ss AS (SELECT k, m, n, va, vb, vy, det, b1, b2,
        |    n * vy * (1.0 - cay * cay / (va * vy)) AS sser,
        |    n * vy * (1.0 - (b1 * cay + b2 * cby) / vy) AS ssef
        |  FROM fit)
        |SELECT k AS event_type, m, round(b1, 6) AS b_ylag,
        |  round(b2, 6) AS b_xlag,
        |  round((sser - ssef) / (ssef / (n - 3.0)), 6) AS f_stat
        |FROM ss WHERE m >= 5 AND va > 0.0 AND vb > 0.0 AND vy > 0.0
        |  AND det > va * vb * 1e-12 AND ssef > 0.0
        |ORDER BY event_type""".stripMargin,
    // Profile-diff replay: the q_profile construction per parity
    // half, full-outer joined; deltas subtract the rounded values.
    "q_profile_diff" ->
      """WITH la AS (SELECT 'lang' AS c0, lang AS v FROM documents
        |    WHERE doc_id % 2 = 0
        |  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR)
        |    FROM documents WHERE doc_id % 2 = 0),
        |lb AS (SELECT 'lang' AS c0, lang AS v FROM documents
        |    WHERE doc_id % 2 = 1
        |  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR)
        |    FROM documents WHERE doc_id % 2 = 1),
        |ca AS (SELECT c0, v, CAST(count(*) AS BIGINT) AS c FROM la
        |  GROUP BY c0, v),
        |cb AS (SELECT c0, v, CAST(count(*) AS BIGINT) AS c FROM lb
        |  GROUP BY c0, v),
        |pa AS (SELECT c0, CAST(sum(c) AS BIGINT) AS n,
        |    round(CAST(coalesce(sum(CASE WHEN v IS NULL THEN c END), 0)
        |      AS DOUBLE) / sum(c), 6) AS null_rate,
        |    CAST(count(v) AS BIGINT) AS n_distinct,
        |    round(sum(CASE WHEN TRY_CAST(v AS DOUBLE) IS NOT NULL
        |        AND NOT isnan(TRY_CAST(v AS DOUBLE))
        |        THEN TRY_CAST(v AS DOUBLE) * c END)
        |      / CAST(sum(CASE WHEN TRY_CAST(v AS DOUBLE) IS NOT NULL
        |        AND NOT isnan(TRY_CAST(v AS DOUBLE)) THEN c END)
        |        AS DOUBLE), 6) AS mean
        |  FROM ca GROUP BY c0),
        |pb AS (SELECT c0, CAST(sum(c) AS BIGINT) AS n,
        |    round(CAST(coalesce(sum(CASE WHEN v IS NULL THEN c END), 0)
        |      AS DOUBLE) / sum(c), 6) AS null_rate,
        |    CAST(count(v) AS BIGINT) AS n_distinct,
        |    round(sum(CASE WHEN TRY_CAST(v AS DOUBLE) IS NOT NULL
        |        AND NOT isnan(TRY_CAST(v AS DOUBLE))
        |        THEN TRY_CAST(v AS DOUBLE) * c END)
        |      / CAST(sum(CASE WHEN TRY_CAST(v AS DOUBLE) IS NOT NULL
        |        AND NOT isnan(TRY_CAST(v AS DOUBLE)) THEN c END)
        |        AS DOUBLE), 6) AS mean
        |  FROM cb GROUP BY c0)
        |SELECT coalesce(pa.c0, pb.c0) AS "column",
        |  pa.n AS n_a, pb.n AS n_b,
        |  CASE WHEN pa.n > 0 THEN round(CAST(pb.n AS DOUBLE) / pa.n, 6)
        |    END AS n_ratio,
        |  pa.null_rate AS null_rate_a, pb.null_rate AS null_rate_b,
        |  round(pb.null_rate - pa.null_rate, 6) AS null_rate_delta,
        |  pa.n_distinct AS n_distinct_a, pb.n_distinct AS n_distinct_b,
        |  pa.mean AS mean_a, pb.mean AS mean_b,
        |  round(pb.mean - pa.mean, 6) AS mean_delta
        |FROM pa FULL OUTER JOIN pb ON pa.c0 = pb.c0
        |ORDER BY "column"""".stripMargin,
    // Rolling-corr replay: the identical five-sum RANGE frame and
    // moment-ratio shape.
    "q_rolling_corr" ->
      """WITH e AS (SELECT event_type AS k, epoch_ns(ts) AS ts,
        |    CAST(value AS DOUBLE) AS x,
        |    CAST((epoch_ns(ts) // 3600000000000) % 24 AS DOUBLE) AS hr
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |w AS (SELECT k, ts, x, hr,
        |    CAST(count(*) OVER fr AS BIGINT) AS n_window,
        |    sum(x) OVER fr / CAST(count(*) OVER fr AS DOUBLE) AS mx,
        |    sum(hr) OVER fr / CAST(count(*) OVER fr AS DOUBLE) AS my,
        |    sum(x * x) OVER fr / CAST(count(*) OVER fr AS DOUBLE) AS sxx,
        |    sum(hr * hr) OVER fr / CAST(count(*) OVER fr AS DOUBLE)
        |      AS syy,
        |    sum(x * hr) OVER fr / CAST(count(*) OVER fr AS DOUBLE)
        |      AS sxy
        |  FROM e
        |  WINDOW fr AS (PARTITION BY k ORDER BY ts
        |    RANGE BETWEEN 21600000000000 PRECEDING AND CURRENT ROW)),
        |v AS (SELECT k, ts, x, hr, n_window,
        |    sxx - mx * mx AS vx, syy - my * my AS vy,
        |    sxy - mx * my AS cxy FROM w)
        |SELECT k AS event_type, ts, x, hr, n_window,
        |  CASE WHEN n_window >= 2 AND vx > 0.0 AND vy > 0.0
        |    THEN round(cxy / sqrt(vx * vy), 6) END AS rolling_corr
        |FROM v""".stripMargin,
    // Forecast-accuracy replay: the q_holt recursive trajectory, then
    // one fold of the four error metrics over (v, fitted).
    "q_forecast_accuracy" ->
      """WITH RECURSIVE e AS (SELECT event_type AS k, epoch_ns(ts) AS t,
        |    CAST(value AS DOUBLE) AS v FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |cells AS (SELECT k, t // 86400000000000 AS p,
        |    CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS mv
        |  FROM e GROUP BY k, p),
        |idx AS (SELECT k, p, mv, CAST(row_number() OVER (PARTITION BY k
        |    ORDER BY p) AS BIGINT) AS i FROM cells),
        |hw(k, i, p, mv, l, b) AS (
        |  SELECT k, i, p, mv, mv, CAST(0.0 AS DOUBLE) FROM idx
        |  WHERE i = 1
        |  UNION ALL
        |  SELECT idx.k, idx.i, idx.p, idx.mv,
        |    0.3 * idx.mv + (1.0 - 0.3) * (hw.l + hw.b),
        |    0.1 * ((0.3 * idx.mv + (1.0 - 0.3) * (hw.l + hw.b)) - hw.l)
        |      + (1.0 - 0.1) * hw.b
        |  FROM hw JOIN idx ON idx.k = hw.k AND idx.i = hw.i + 1),
        |out AS (SELECT k, p, round(mv, 6) AS a,
        |    round(lag(l) OVER (PARTITION BY k ORDER BY i)
        |      + lag(b) OVER (PARTITION BY k ORDER BY i), 6) AS pr
        |  FROM hw),
        |nv AS (SELECT k, a, pr,
        |    lag(a, 1) OVER (PARTITION BY k ORDER BY p) AS naive
        |  FROM out),
        |ag AS (SELECT k,
        |    CAST(sum(CASE WHEN pr IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_scored,
        |    sum(CASE WHEN pr IS NOT NULL THEN abs(a - pr) END) AS sae,
        |    sum(CASE WHEN pr IS NOT NULL
        |      THEN abs(a - pr) * abs(a - pr) END) AS sse,
        |    sum(CASE WHEN pr IS NOT NULL AND a <> 0.0
        |      THEN abs(a - pr) / abs(a) END) AS sape,
        |    CAST(sum(CASE WHEN pr IS NOT NULL AND a <> 0.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS nape,
        |    sum(CASE WHEN naive IS NOT NULL
        |      THEN abs(a - naive) END) AS snv,
        |    CAST(sum(CASE WHEN naive IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nnv
        |  FROM nv GROUP BY k)
        |SELECT k AS event_type, n_scored,
        |  round(sae / n_scored, 6) AS mae,
        |  round(sqrt(sse / n_scored), 6) AS rmse,
        |  CASE WHEN nape > 0 THEN round(sape / nape, 6) END AS mape,
        |  CASE WHEN nnv > 0 AND snv / nnv > 0.0
        |    THEN round((sae / n_scored) / (snv / nnv), 6) END AS mase
        |FROM ag WHERE n_scored > 0 ORDER BY event_type""".stripMargin,
    // Fellegi-Sunter replay: blocked pairs -> pattern counts, then
    // each EM round as chained CTEs; products are parenthesized to
    // match the Scala fold order (p * ((q1*q2)*q3)), and every 1-x
    // is written as a SUBTRACTION (the holt literal lesson).
    "q_fellegi_sunter" ->
      """WITH c AS (SELECT c_custkey AS k, c_custkey // 50 AS blk,
        |    c_mktsegment AS seg, c_nationkey AS nat, c_acctbal AS bal
        |  FROM customer),
        |pr AS (SELECT coalesce(a.seg = b.seg, false) AS a1,
        |    coalesce(a.nat = b.nat, false) AS a2,
        |    coalesce(abs(a.bal - b.bal) < 1000.0, false) AS a3
        |  FROM c a JOIN c b ON a.blk = b.blk AND a.k < b.k),
        |pat AS (SELECT a1, a2, a3, CAST(count(*) AS BIGINT) AS cnt
        |  FROM pr GROUP BY a1, a2, a3),
        |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM pat),
        |g1 AS (SELECT a1, a2, a3, cnt,
        |    (0.1 * (((CASE WHEN a1 THEN 0.9 ELSE 1.0 - 0.9 END)
        |      * (CASE WHEN a2 THEN 0.9 ELSE 1.0 - 0.9 END))
        |      * (CASE WHEN a3 THEN 0.9 ELSE 1.0 - 0.9 END)))
        |    / ((0.1 * (((CASE WHEN a1 THEN 0.9 ELSE 1.0 - 0.9 END)
        |        * (CASE WHEN a2 THEN 0.9 ELSE 1.0 - 0.9 END))
        |        * (CASE WHEN a3 THEN 0.9 ELSE 1.0 - 0.9 END)))
        |      + ((1.0 - 0.1)
        |        * (((CASE WHEN a1 THEN 0.1 ELSE 1.0 - 0.1 END)
        |        * (CASE WHEN a2 THEN 0.1 ELSE 1.0 - 0.1 END))
        |        * (CASE WHEN a3 THEN 0.1 ELSE 1.0 - 0.1 END)))) AS g
        |  FROM pat),
        |m1 AS (SELECT sum(g * cnt) / (SELECT n FROM tot) AS p,
        |    sum(CASE WHEN a1 THEN g * cnt ELSE 0.0 END)
        |      / sum(g * cnt) AS m1,
        |    sum(CASE WHEN a2 THEN g * cnt ELSE 0.0 END)
        |      / sum(g * cnt) AS m2,
        |    sum(CASE WHEN a3 THEN g * cnt ELSE 0.0 END)
        |      / sum(g * cnt) AS m3,
        |    sum(CASE WHEN a1 THEN (1.0 - g) * cnt ELSE 0.0 END)
        |      / sum((1.0 - g) * cnt) AS u1,
        |    sum(CASE WHEN a2 THEN (1.0 - g) * cnt ELSE 0.0 END)
        |      / sum((1.0 - g) * cnt) AS u2,
        |    sum(CASE WHEN a3 THEN (1.0 - g) * cnt ELSE 0.0 END)
        |      / sum((1.0 - g) * cnt) AS u3
        |  FROM g1),
        |g2 AS (SELECT a1, a2, a3, cnt,
        |    (p * (((CASE WHEN a1 THEN m1 ELSE 1.0 - m1 END)
        |      * (CASE WHEN a2 THEN m2 ELSE 1.0 - m2 END))
        |      * (CASE WHEN a3 THEN m3 ELSE 1.0 - m3 END)))
        |    / ((p * (((CASE WHEN a1 THEN m1 ELSE 1.0 - m1 END)
        |        * (CASE WHEN a2 THEN m2 ELSE 1.0 - m2 END))
        |        * (CASE WHEN a3 THEN m3 ELSE 1.0 - m3 END)))
        |      + ((1.0 - p)
        |        * (((CASE WHEN a1 THEN u1 ELSE 1.0 - u1 END)
        |        * (CASE WHEN a2 THEN u2 ELSE 1.0 - u2 END))
        |        * (CASE WHEN a3 THEN u3 ELSE 1.0 - u3 END)))) AS g
        |  FROM pat, m1),
        |m2s AS (SELECT sum(g * cnt) / (SELECT n FROM tot) AS p,
        |    sum(CASE WHEN a1 THEN g * cnt ELSE 0.0 END)
        |      / sum(g * cnt) AS m1,
        |    sum(CASE WHEN a2 THEN g * cnt ELSE 0.0 END)
        |      / sum(g * cnt) AS m2,
        |    sum(CASE WHEN a3 THEN g * cnt ELSE 0.0 END)
        |      / sum(g * cnt) AS m3,
        |    sum(CASE WHEN a1 THEN (1.0 - g) * cnt ELSE 0.0 END)
        |      / sum((1.0 - g) * cnt) AS u1,
        |    sum(CASE WHEN a2 THEN (1.0 - g) * cnt ELSE 0.0 END)
        |      / sum((1.0 - g) * cnt) AS u2,
        |    sum(CASE WHEN a3 THEN (1.0 - g) * cnt ELSE 0.0 END)
        |      / sum((1.0 - g) * cnt) AS u3
        |  FROM g2),
        |fin AS (SELECT a1 AS seg_eq, a2 AS nat_eq, a3 AS bal_close,
        |    cnt AS n_pairs,
        |    ((CASE WHEN a1 THEN m1 ELSE 1.0 - m1 END)
        |      * (CASE WHEN a2 THEN m2 ELSE 1.0 - m2 END))
        |      * (CASE WHEN a3 THEN m3 ELSE 1.0 - m3 END) AS pm,
        |    ((CASE WHEN a1 THEN u1 ELSE 1.0 - u1 END)
        |      * (CASE WHEN a2 THEN u2 ELSE 1.0 - u2 END))
        |      * (CASE WHEN a3 THEN u3 ELSE 1.0 - u3 END) AS pu,
        |    p FROM pat, m2s)
        |SELECT seg_eq, nat_eq, bal_close, n_pairs,
        |  round_even((p * pm) / ((p * pm) + ((1.0 - p) * pu))
        |    * 1000000.0, 0) / 1000000.0 AS posterior,
        |  round_even(ln(pm / pu) / ln(2.0) * 1000000.0, 0) / 1000000.0
        |    AS match_weight
        |FROM fin ORDER BY seg_eq, nat_eq, bal_close""".stripMargin,
    // Theil's U replay: one contingency frame, margin windows, the
    // identical per-cell ln shapes for I, H(A), H(B).
    "q_theils_u" ->
      """WITH cells AS (SELECT CAST(lang AS VARCHAR) AS a,
        |    CAST(source AS VARCHAR) AS b, CAST(count(*) AS BIGINT) AS n
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY a, b),
        |w AS (SELECT a, b, n,
        |    CAST(sum(n) OVER (PARTITION BY a) AS BIGINT) AS na,
        |    CAST(sum(n) OVER (PARTITION BY b) AS BIGINT) AS nb,
        |    CAST(sum(n) OVER () AS BIGINT) AS nt FROM cells),
        |f AS (SELECT
        |    sum((n / CAST(nt AS DOUBLE)) * ln((CAST(n AS DOUBLE)
        |      * CAST(nt AS DOUBLE)) / (CAST(na AS DOUBLE) * nb)))
        |      AS mi,
        |    sum(-(n / CAST(nt AS DOUBLE))
        |      * ln(na / CAST(nt AS DOUBLE))) AS ha,
        |    sum(-(n / CAST(nt AS DOUBLE))
        |      * ln(nb / CAST(nt AS DOUBLE))) AS hb,
        |    CAST(max(nt) AS BIGINT) AS n,
        |    CAST(count(DISTINCT a) AS BIGINT) AS n_a,
        |    CAST(count(DISTINCT b) AS BIGINT) AS n_b FROM w)
        |SELECT round(mi, 6) AS mi, round(ha, 6) AS h_a,
        |  round(hb, 6) AS h_b,
        |  CASE WHEN ha > 0.0 THEN round(mi / ha, 6) END AS u_a_given_b,
        |  CASE WHEN hb > 0.0 THEN round(mi / hb, 6) END AS u_b_given_a,
        |  n, n_a, n_b FROM f""".stripMargin,
    // Holt replay: decimal-exact daily means, then the recurrence as
    // a recursive CTE — (1.0 - 0.3)/(1.0 - 0.1) are written as
    // SUBTRACTIONS because 1.0-α and the literal 0.7 are DIFFERENT
    // doubles; the trajectory must match the Scala arithmetic bit
    // for bit.
    "q_holt" ->
      """WITH RECURSIVE e AS (SELECT event_type AS k, epoch_ns(ts) AS t,
        |    CAST(value AS DOUBLE) AS v FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |cells AS (SELECT k, t // 86400000000000 AS p,
        |    CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS mv
        |  FROM e GROUP BY k, p),
        |idx AS (SELECT k, p, mv, CAST(row_number() OVER (PARTITION BY k
        |    ORDER BY p) AS BIGINT) AS i FROM cells),
        |hw(k, i, p, mv, l, b) AS (
        |  -- the seed MUST be CAST: a bare 0.0 is DECIMAL(2,1) and the
        |  -- recursive column type truncates every later trend to one
        |  -- decimal
        |  SELECT k, i, p, mv, mv, CAST(0.0 AS DOUBLE) FROM idx
        |  WHERE i = 1
        |  UNION ALL
        |  SELECT idx.k, idx.i, idx.p, idx.mv,
        |    0.3 * idx.mv + (1.0 - 0.3) * (hw.l + hw.b),
        |    0.1 * ((0.3 * idx.mv + (1.0 - 0.3) * (hw.l + hw.b)) - hw.l)
        |      + (1.0 - 0.1) * hw.b
        |  FROM hw JOIN idx ON idx.k = hw.k AND idx.i = hw.i + 1)
        |SELECT k AS event_type, p AS period, round(mv, 6) AS v,
        |  round(l, 6) AS level, round(b, 6) AS trend,
        |  round(lag(l) OVER (PARTITION BY k ORDER BY i)
        |    + lag(b) OVER (PARTITION BY k ORDER BY i), 6) AS fitted
        |FROM hw ORDER BY event_type, period""".stripMargin,
    // Holt-Winters replay: the q_holt recursion with seven seasonal
    // slots carried as scalar columns, phase = (i-1) mod 7.
    "q_holt_winters" -> hwOracleSql,
    // Both recurrences + the shared q_ar_accuracy fold per model.
    "q_hw_accuracy" -> hwAccuracyOracleSql,
    // Holt-tune replay: ONE recursion keyed by (k, alpha, beta) over
    // the literal grid, rounded MAE argmin with (mae, a, b) order.
    "q_holt_tune" ->
      (s"""WITH RECURSIVE $hwIdxSql,
        |grid(a, bb) AS (VALUES (0.1, 0.0),
        |  (0.1, 0.1),
        |  (0.1, 0.3),
        |  (0.3, 0.0),
        |  (0.3, 0.1),
        |  (0.3, 0.3),
        |  (0.5, 0.0),
        |  (0.5, 0.1),
        |  (0.5, 0.3),
        |  (0.7, 0.0),
        |  (0.7, 0.1),
        |  (0.7, 0.3),
        |  (0.9, 0.0),
        |  (0.9, 0.1),
        |  (0.9, 0.3)),
        |ix AS (SELECT idx.k, idx.i, idx.mv, g.a, g.bb FROM idx,
        |  grid g),
        |ho(k, a, bb, i, l, b, sae, cnt) AS (
        |  SELECT k, a, bb, i, mv, CAST(0.0 AS DOUBLE),
        |    CAST(0.0 AS DOUBLE), CAST(0 AS BIGINT)
        |  FROM ix WHERE i = 1
        |  UNION ALL
        |  SELECT ix.k, ix.a, ix.bb, ix.i,
        |    ix.a * ix.mv + (1.0 - ix.a) * (ho.l + ho.b),
        |    ix.bb * ((ix.a * ix.mv + (1.0 - ix.a) * (ho.l + ho.b))
        |      - ho.l) + (1.0 - ix.bb) * ho.b,
        |    ho.sae + abs(ix.mv - (ho.l + ho.b)),
        |    ho.cnt + 1
        |  FROM ho JOIN ix ON ix.k = ho.k AND ix.a = ho.a
        |    AND ix.bb = ho.bb AND ix.i = ho.i + 1),
        |lastr AS (SELECT ho.* FROM ho JOIN (SELECT k, a, bb,
        |      max(i) AS mi FROM ho GROUP BY k, a, bb) t
        |  ON ho.k = t.k AND ho.a = t.a AND ho.bb = t.bb
        |    AND ho.i = t.mi),
        |sc AS (SELECT k, a, bb,
        |    round_even(sae / cnt * 1e6, 0) / 1e6 AS mae FROM lastr
        |  WHERE cnt > 0),
        |nn AS (SELECT k, CAST(count(*) AS BIGINT) AS n_periods
        |  FROM cells GROUP BY k),
        |rk AS (SELECT sc.k, sc.a, sc.bb, sc.mae, row_number() OVER
        |    (PARTITION BY sc.k ORDER BY sc.mae, sc.a, sc.bb) AS rn
        |  FROM sc)
        |SELECT rk.k AS event_type, nn.n_periods, rk.a AS alpha,
        |  rk.bb AS beta, rk.mae
        |FROM rk JOIN nn ON rk.k = nn.k
        |WHERE rk.rn = 1 AND nn.n_periods >= 3
        |ORDER BY event_type""").stripMargin,
    // Multiplicative HW: ratio recursion, unit seasonal seed.
    "q_holt_winters_mul" -> hwMulOracleSql,
    // HW recursion to the final per-key row + generate_series project.
    "q_hw_forecast" -> hwForecastOracleSql,
    // Mahalanobis replay: per-group raw moments, the explicit 2x2
    // inverse as column arithmetic, the identical d2 shape, exact
    // flag counts.
    "q_mahalanobis" ->
      """WITH base AS (SELECT l_linestatus AS g,
        |    CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem
        |  WHERE l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_linestatus IS NOT NULL),
        |mom AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    avg(x) AS mx, avg(y) AS my,
        |    sum(x * x) / count(*) AS sxx,
        |    sum(y * y) / count(*) AS syy,
        |    sum(x * y) / count(*) AS sxy
        |  FROM base GROUP BY g),
        |mv AS (SELECT g, n, mx, my,
        |    sxx - mx * mx AS vx, syy - my * my AS vy,
        |    sxy - mx * my AS cxy,
        |    (sxx - mx * mx) * (syy - my * my)
        |      - (sxy - mx * my) * (sxy - mx * my) AS det
        |  FROM mom),
        |ok AS (SELECT * FROM mv WHERE det > 0.0 AND n > 2),
        |d AS (SELECT base.g AS g,
        |    ((base.x - mx) * (vy * (base.x - mx) - cxy * (base.y - my))
        |      + (base.y - my) * (vx * (base.y - my)
        |        - cxy * (base.x - mx))) / det AS d2
        |  FROM base JOIN ok ON base.g = ok.g)
        |SELECT g AS l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN d2 > -2.0 * ln(0.001) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_flagged,
        |  round(CAST(sum(CASE WHEN d2 > -2.0 * ln(0.001) THEN 1 ELSE 0
        |    END) AS DOUBLE) / count(*), 6) AS flag_share,
        |  round(max(d2), 6) AS max_d2
        |FROM d GROUP BY g ORDER BY l_linestatus""".stripMargin,
    // KS replay: distinct-score cells, partitioned cumulative counts,
    // the integer gap numerator, rank over (num desc, score asc).
    "q_ks_separation" ->
      """WITH c AS (SELECT l_linestatus AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS v,
        |    (l_returnflag = 'R') AS y FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_linestatus IS NOT NULL),
        |cells AS (SELECT g, v,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS cp,
        |    CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS cn
        |  FROM c GROUP BY g, v),
        |w AS (SELECT g, v,
        |    CAST(sum(cp) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp,
        |    CAST(sum(cn) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fn,
        |    CAST(sum(cp) OVER (PARTITION BY g) AS BIGINT) AS np,
        |    CAST(sum(cn) OVER (PARTITION BY g) AS BIGINT) AS nn
        |  FROM cells),
        |num AS (SELECT g, v, np, nn, abs(fp * nn - fn * np) AS num
        |  FROM w WHERE np > 0 AND nn > 0),
        |r AS (SELECT *, row_number() OVER (PARTITION BY g
        |    ORDER BY num DESC, v ASC) AS rk FROM num)
        |SELECT g AS l_linestatus,
        |  round(CAST(num AS DOUBLE) / (CAST(np AS DOUBLE) * nn), 6)
        |    AS ks,
        |  v AS ks_score, np AS n_pos, nn AS n_neg
        |FROM r WHERE rk = 1 ORDER BY l_linestatus""".stripMargin,
    // WoE replay: exact bin shares, the 0.5 zero-cell substitution,
    // one window total for IV.
    "q_woe" ->
      """WITH c AS (SELECT CAST(floor(l_quantity / 10) AS BIGINT) AS bin,
        |    (l_returnflag = 'R') AS y FROM lineitem
        |  WHERE l_quantity IS NOT NULL),
        |cells AS (SELECT bin,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |    CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
        |  FROM c GROUP BY bin),
        |w AS (SELECT bin, n_pos, n_neg,
        |    CAST(sum(n_pos) OVER () AS BIGINT) AS tp,
        |    CAST(sum(n_neg) OVER () AS BIGINT) AS tn,
        |    CASE WHEN n_pos = 0 THEN 0.5
        |      ELSE CAST(n_pos AS DOUBLE) END AS pa,
        |    CASE WHEN n_neg = 0 THEN 0.5
        |      ELSE CAST(n_neg AS DOUBLE) END AS na
        |  FROM cells),
        |x AS (SELECT bin, n_pos, n_neg, tp, tn,
        |    round(CAST(n_pos AS DOUBLE) / tp, 6) AS pos_share,
        |    round(CAST(n_neg AS DOUBLE) / tn, 6) AS neg_share,
        |    round(ln((pa / tp) / (na / tn)), 6) AS woe,
        |    round((pa / tp - na / tn) * ln((pa / tp) / (na / tn)), 6)
        |      AS iv_term,
        |    round(sum((pa / tp - na / tn)
        |      * ln((pa / tp) / (na / tn))) OVER (), 6) AS iv_total
        |  FROM w WHERE tp > 0 AND tn > 0)
        |SELECT bin, n_pos, n_neg, pos_share, neg_share, woe, iv_term,
        |  iv_total FROM x ORDER BY bin""".stripMargin,
    // Split-gain replay: stacked features, cumulative cells, the
    // identical gini-gain expression, rank over the rounded gain.
    "q_split_gains" ->
      """WITH s AS (
        |  SELECT 'l_quantity' AS feature,
        |      CAST(l_quantity AS DOUBLE) AS v,
        |      CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |    FROM lineitem WHERE l_quantity IS NOT NULL
        |      AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |  UNION ALL
        |  SELECT 'l_discount' AS feature,
        |      CAST(l_discount AS DOUBLE) AS v,
        |      CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |    FROM lineitem WHERE l_discount IS NOT NULL
        |      AND NOT isnan(CAST(l_discount AS DOUBLE))),
        |cells AS (SELECT feature, v, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(y) AS BIGINT) AS p
        |  FROM s GROUP BY feature, v),
        |w AS (SELECT feature, v,
        |    CAST(sum(c) OVER (PARTITION BY feature ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS n_left,
        |    CAST(sum(p) OVER (PARTITION BY feature ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS pos_left,
        |    CAST(sum(c) OVER (PARTITION BY feature) AS BIGINT) AS n,
        |    CAST(sum(p) OVER (PARTITION BY feature) AS BIGINT) AS tp
        |  FROM cells),
        |gq AS (SELECT feature, v, n_left, pos_left, n, tp,
        |    round((1.0 - (CAST(tp AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (CAST(tp AS DOUBLE) / CAST(n AS DOUBLE))
        |      - ((CAST(n AS DOUBLE) - tp) / CAST(n AS DOUBLE))
        |        * ((CAST(n AS DOUBLE) - tp) / CAST(n AS DOUBLE)))
        |      - (CAST(n_left AS DOUBLE)
        |        * (1.0 - (CAST(pos_left AS DOUBLE)
        |            / CAST(n_left AS DOUBLE))
        |          * (CAST(pos_left AS DOUBLE) / CAST(n_left AS DOUBLE))
        |          - ((CAST(n_left AS DOUBLE) - pos_left)
        |            / CAST(n_left AS DOUBLE))
        |          * ((CAST(n_left AS DOUBLE) - pos_left)
        |            / CAST(n_left AS DOUBLE)))
        |      + (CAST(n AS DOUBLE) - n_left)
        |        * (1.0 - ((CAST(tp AS DOUBLE) - pos_left)
        |            / (CAST(n AS DOUBLE) - n_left))
        |          * ((CAST(tp AS DOUBLE) - pos_left)
        |            / (CAST(n AS DOUBLE) - n_left))
        |          - (((CAST(n AS DOUBLE) - n_left)
        |              - (CAST(tp AS DOUBLE) - pos_left))
        |            / (CAST(n AS DOUBLE) - n_left))
        |          * (((CAST(n AS DOUBLE) - n_left)
        |              - (CAST(tp AS DOUBLE) - pos_left))
        |            / (CAST(n AS DOUBLE) - n_left))))
        |      / CAST(n AS DOUBLE), 6) AS gain
        |  FROM w WHERE n_left < n),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY feature
        |    ORDER BY gain DESC, v ASC) AS BIGINT) AS rank FROM gq)
        |SELECT feature, v AS threshold, n_left, n - n_left AS n_right,
        |  pos_left, tp - pos_left AS pos_right, gain, rank
        |FROM r WHERE rank <= 5 ORDER BY feature, rank""".stripMargin,
    // IPF replay: the exact cell/total shares, then each raking round
    // as a chained pair of partitioned window rescalings.
    "q_ipf" ->
      """WITH cells AS (SELECT l_returnflag AS r, l_linestatus AS c,
        |    CAST(count(*) AS BIGINT) AS n FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
        |  GROUP BY r, c),
        |tr(rv, tr) AS (VALUES ('A', 0.3), ('N', 0.5), ('R', 0.2)),
        |tc(cv, tc) AS (VALUES ('F', 0.5), ('O', 0.5)),
        |j AS (SELECT cells.r, cells.c, cells.n, tr.tr, tc.tc
        |  FROM cells JOIN tr ON cells.r = tr.rv
        |    JOIN tc ON cells.c = tc.cv),
        |p0 AS (SELECT r, c, n, tr, tc,
        |    CAST(n AS DOUBLE) / sum(n) OVER () AS p, 1.0 AS w FROM j),
        |r1 AS (SELECT r, c, n, tr, tc, p,
        |    w * tr / sum(p * w) OVER (PARTITION BY r) AS w FROM p0),
        |c1 AS (SELECT r, c, n, tr, tc, p,
        |    w * tc / sum(p * w) OVER (PARTITION BY c) AS w FROM r1),
        |r2 AS (SELECT r, c, n, tr, tc, p,
        |    w * tr / sum(p * w) OVER (PARTITION BY r) AS w FROM c1),
        |c2 AS (SELECT r, c, n, tr, tc, p,
        |    w * tc / sum(p * w) OVER (PARTITION BY c) AS w FROM r2),
        |r3 AS (SELECT r, c, n, tr, tc, p,
        |    w * tr / sum(p * w) OVER (PARTITION BY r) AS w FROM c2),
        |c3 AS (SELECT r, c, n, tr, tc, p,
        |    w * tc / sum(p * w) OVER (PARTITION BY c) AS w FROM r3)
        |SELECT r AS l_returnflag, c AS l_linestatus, n,
        |  round(w, 6) AS weight
        |FROM c3 ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // Gamma GLM replay: constant Gram hoisted once, each Fisher step
    // only the two gradient sums, closed 2x2 solve per step.
    "q_gamma_glm" ->
      """WITH base AS (SELECT CAST(l_extendedprice AS DOUBLE) AS y,
        |    CAST(l_discount AS DOUBLE) AS x
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))
        |    AND CAST(l_extendedprice AS DOUBLE) > 0.0),
        |gram AS (SELECT sum(1.0) AS h00, sum(x) AS h01,
        |    sum(x * x) AS h11, ln(avg(y)) AS b0i,
        |    count(*) AS n FROM base),
        |s1 AS (SELECT sum(y / exp(g.b0i) - 1.0) AS g0,
        |    sum((y / exp(g.b0i) - 1.0) * x) AS g1
        |  FROM base CROSS JOIN gram g),
        |b1 AS (SELECT
        |    b0i + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
        |    (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1,
        |    h00, h01, h11, n FROM gram, s1),
        |s2 AS (SELECT sum(y / exp(b.b0 + b.b1 * x) - 1.0) AS g0,
        |    sum((y / exp(b.b0 + b.b1 * x) - 1.0) * x) AS g1
        |  FROM base CROSS JOIN b1 b),
        |b2 AS (SELECT
        |    b0 + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
        |    b1 + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1,
        |    h00, h01, h11, n FROM b1, s2),
        |s3 AS (SELECT sum(y / exp(b.b0 + b.b1 * x) - 1.0) AS g0,
        |    sum((y / exp(b.b0 + b.b1 * x) - 1.0) * x) AS g1
        |  FROM base CROSS JOIN b2 b),
        |b3 AS (SELECT
        |    b0 + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
        |    b1 + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1,
        |    n FROM b2, s3),
        |fin AS (SELECT sum(2.0 * (-ln(y / mu) + (y - mu) / mu)) AS dev,
        |    sum(((y - mu) / mu) * ((y - mu) / mu)) AS pearson
        |  FROM (SELECT y, exp(b.b0 + b.b1 * x) AS mu
        |    FROM base CROSS JOIN b3 b))
        |SELECT round_even(b3.b0 * 1e6, 0) / 1e6 AS b0_r,
        |  round_even(b3.b1 * 1e6, 0) / 1e6 AS b1_r,
        |  round_even(fin.dev * 100.0, 0) / 100.0 AS dev_r,
        |  round_even(fin.pearson / (b3.n - 2) * 1e6, 0) / 1e6 AS disp_r,
        |  b3.n AS n
        |FROM b3, fin""".stripMargin,
    // BY replay: the q_drift_fdr machinery times the harmonic c(m).
    "q_by_adjust" ->
      """WITH c AS (SELECT event_type, user_id % 7 AS v FROM events),
        |cells AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS o
        |  FROM c GROUP BY event_type, v),
        |g AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS kg,
        |    CAST(sum(o * o) AS BIGINT) AS ssq
        |  FROM cells GROUP BY event_type),
        |x AS (SELECT event_type,
        |    round(ssq / (CAST(n AS DOUBLE) / 7.0) - 2.0 * n
        |      + kg * (CAST(n AS DOUBLE) / 7.0)
        |      + (7.0 - kg) * (CAST(n AS DOUBLE) / 7.0), 6) AS chi2,
        |    n FROM g),
        |p AS (SELECT event_type, chi2,
        |    round_even((SELECT sum(exp(-x.chi2 / 2.0
        |        + s.j * ln(x.chi2 / 2.0) - lgamma(s.j + 1.0)))
        |      FROM generate_series(0, 49) s(j) WHERE s.j < 3)
        |      * 1000000.0, 0) / 1000000.0 AS p_value FROM x),
        |cm AS (SELECT sum(1.0 / i) AS c FROM generate_series(1, 4000000)
        |  t(i) WHERE i <= (SELECT count(*) FROM p)),
        |f AS (SELECT event_type, chi2, p_value,
        |    CAST(count(*) OVER (ORDER BY p_value RANGE BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rk,
        |    CAST(count(*) OVER () AS BIGINT) AS m FROM p),
        |q AS (SELECT event_type, chi2, p_value, rk,
        |    least(1.0, min(CAST(m AS DOUBLE) * p_value / rk)
        |      OVER (ORDER BY p_value ROWS BETWEEN CURRENT ROW
        |        AND UNBOUNDED FOLLOWING)) AS qv FROM f)
        |SELECT event_type, p_value, rk AS by_rank,
        |  round(least(1.0, qv * cm.c), 6) AS q_by,
        |  round(least(1.0, qv * cm.c), 6) <= 0.05 AS reject_r
        |FROM q, cm ORDER BY event_type""".stripMargin,
    // Ljung-Box replay: the q_acf construction at 4 lags, Q from the
    // ROUNDED acf values, p = exp(-Q/2)(1 + Q/2) — the closed chi2(4)
    // upper tail — round_even'd like the Scala rint.
    "q_ljung_box" ->
      """WITH e AS (SELECT event_type AS k, epoch_ns(ts) AS tns,
        |    event_id, value AS x
        |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        |    AND ts IS NOT NULL),
        |m AS (SELECT k, tns, event_id, x,
        |    avg(x) OVER (PARTITION BY k) AS mu FROM e),
        |d AS (SELECT k, x - mu AS dd,
        |    lag(x - mu, 1) OVER (PARTITION BY k ORDER BY tns, event_id)
        |      AS d1,
        |    lag(x - mu, 2) OVER (PARTITION BY k ORDER BY tns, event_id)
        |      AS d2,
        |    lag(x - mu, 3) OVER (PARTITION BY k ORDER BY tns, event_id)
        |      AS d3,
        |    lag(x - mu, 4) OVER (PARTITION BY k ORDER BY tns, event_id)
        |      AS d4
        |  FROM m),
        |acf AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    round(sum(dd * d1) / sum(dd * dd), 6) AS acf_1,
        |    round(sum(dd * d2) / sum(dd * dd), 6) AS acf_2,
        |    round(sum(dd * d3) / sum(dd * dd), 6) AS acf_3,
        |    round(sum(dd * d4) / sum(dd * dd), 6) AS acf_4
        |  FROM d GROUP BY k HAVING sum(dd * dd) > 0 AND count(*) > 4),
        |q AS (SELECT *, round(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
        |      + 2.0)
        |    * (acf_1 * acf_1 / (CAST(n AS DOUBLE) - 1.0)
        |      + acf_2 * acf_2 / (CAST(n AS DOUBLE) - 2.0)
        |      + acf_3 * acf_3 / (CAST(n AS DOUBLE) - 3.0)
        |      + acf_4 * acf_4 / (CAST(n AS DOUBLE) - 4.0)), 6)
        |    AS lb_stat FROM acf)
        |SELECT k AS event_type, n, acf_1, acf_2, acf_3, acf_4,
        |  lb_stat, CAST(4 AS BIGINT) AS dof,
        |  round_even(exp(-lb_stat / 2.0) * (1.0 + lb_stat / 2.0)
        |    * 1000000.0, 0) / 1000000.0 AS p_value
        |FROM q ORDER BY event_type""".stripMargin,
    // A-D replay: midrank blocks from before-block prefix counts (all
    // half-integers), per-block terms in the identical shape, the
    // Scholz-Stephens exact variance via a generate_series harmonic
    // cumsum (ascending, the same order as the Scala loop).
    "q_ad_twosample" ->
      """WITH c AS (SELECT
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    l_extendedprice AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |m AS (SELECT v, sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS cb
        |  FROM c GROUP BY v),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb,
        |    CAST(sum(ca + cb) AS DOUBLE) AS n FROM m),
        |pre AS (SELECT v, ca, cb,
        |    coalesce(CAST(sum(ca) OVER (ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS fa,
        |    coalesce(CAST(sum(cb) OVER (ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS fb
        |  FROM m),
        |terms AS (SELECT
        |    CAST(ca + cb AS DOUBLE) / n * ((n * (fa + ca / 2.0)
        |      - na * ((fa + fb) + CAST(ca + cb AS DOUBLE) / 2.0))
        |      * (n * (fa + ca / 2.0)
        |      - na * ((fa + fb) + CAST(ca + cb AS DOUBLE) / 2.0)))
        |      / (((fa + fb) + CAST(ca + cb AS DOUBLE) / 2.0)
        |        * (n - ((fa + fb) + CAST(ca + cb AS DOUBLE) / 2.0))
        |        - n * CAST(ca + cb AS DOUBLE) / 4.0) AS ta,
        |    CAST(ca + cb AS DOUBLE) / n * ((n * (fb + cb / 2.0)
        |      - nb * ((fa + fb) + CAST(ca + cb AS DOUBLE) / 2.0))
        |      * (n * (fb + cb / 2.0)
        |      - nb * ((fa + fb) + CAST(ca + cb AS DOUBLE) / 2.0)))
        |      / (((fa + fb) + CAST(ca + cb AS DOUBLE) / 2.0)
        |        * (n - ((fa + fb) + CAST(ca + cb AS DOUBLE) / 2.0))
        |        - n * CAST(ca + cb AS DOUBLE) / 4.0) AS tb
        |  FROM pre, tot WHERE ca + cb < n),
        |a2 AS (SELECT round_even((n - 1.0) / n
        |    * ((SELECT sum(ta) FROM terms) / na
        |      + (SELECT sum(tb) FROM terms) / nb) * 1000000.0, 0)
        |    / 1000000.0 AS a2r, na, nb, n FROM tot),
        |har AS (SELECT i, sum(1.0 / i) OVER (ORDER BY i) AS h
        |  FROM generate_series(1, 4000000) t(i)
        |  WHERE i <= (SELECT CAST(n AS BIGINT) - 1 FROM tot)),
        |hh AS (SELECT max(h) AS h FROM har),
        |gg AS (SELECT sum((hh.h - har.h) / (tot.n - har.i)) AS g
        |  FROM har, hh, tot WHERE har.i <= CAST(tot.n AS BIGINT) - 2),
        |sig AS (SELECT a2.a2r AS a2r, a2.na AS na, a2.nb AS nb,
        |    round_even(sqrt((
        |      ((4.0 * g - 6.0) * 1.0 + (10.0 - 6.0 * g)
        |        * (1.0 / a2.na + 1.0 / a2.nb)) * a2.n * a2.n * a2.n
        |      + ((2.0 * g - 4.0) * 4.0 + 8.0 * h * 2.0
        |        + (2.0 * g - 14.0 * h - 4.0)
        |          * (1.0 / a2.na + 1.0 / a2.nb)
        |        - 8.0 * h + 4.0 * g - 6.0) * a2.n * a2.n
        |      + ((6.0 * h + 2.0 * g - 2.0) * 4.0
        |        + (4.0 * h - 4.0 * g + 6.0) * 2.0
        |        + (2.0 * h - 6.0) * (1.0 / a2.na + 1.0 / a2.nb)
        |        + 4.0 * h) * a2.n
        |      + ((2.0 * h + 6.0) * 4.0 - 4.0 * h * 2.0))
        |      / ((a2.n - 1.0) * (a2.n - 2.0) * (a2.n - 3.0)))
        |      * 1000000.0, 0) / 1000000.0 AS sr
        |  FROM a2, hh, gg)
        |SELECT a2r AS ad_stat, sr AS sigma,
        |  round_even((a2r - 1.0) / sr * 1000000.0, 0) / 1000000.0
        |    AS t_stat,
        |  na AS n_a, nb AS n_b FROM sig""".stripMargin,
    // Breslow-Day replay: exact integer 2x2 cells, the identical
    // quadratic-root selection and harmonic variance, p = exp(-x/2)
    // (the closed chi2(2) upper tail) at the rounded statistics.
    "q_breslow_day" ->
      """WITH c AS (SELECT l_returnflag AS st,
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    l_discount >= 0.05 AS y FROM lineitem
        |  WHERE l_discount IS NOT NULL),
        |cells AS (SELECT st,
        |    CAST(sum(CASE WHEN g = 'a' AND y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN g = 'a' AND NOT y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN g = 'b' AND y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cc,
        |    CAST(sum(CASE WHEN g = 'b' AND NOT y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d
        |  FROM c GROUP BY st),
        |ok AS (SELECT st, CAST(a AS DOUBLE) AS a, CAST(b AS DOUBLE) AS b,
        |    CAST(cc AS DOUBLE) AS cc, CAST(d AS DOUBLE) AS d
        |  FROM cells
        |  WHERE a + b > 0 AND cc + d > 0 AND a + cc > 0
        |    AND a + cc < a + b + cc + d),
        |tot AS (SELECT sum(a * d / (a + b + cc + d)) AS sr,
        |    sum(b * cc / (a + b + cc + d)) AS ss,
        |    CAST(count(*) AS BIGINT) AS n_strata FROM ok),
        |q AS (SELECT ok.*, tot.sr / tot.ss AS r, tot.n_strata
        |  FROM ok, tot WHERE tot.sr > 0 AND tot.ss > 0),
        |rt AS (SELECT *, r - 1.0 AS qa,
        |    -(r * ((a + b) + (a + cc)) + (cc + d) - (a + cc)) AS qb,
        |    r * (a + b) * (a + cc) AS qc,
        |    greatest(0.0, (a + cc) - (cc + d)) - 0.000000001 AS lo,
        |    least(a + b, a + cc) + 0.000000001 AS hi
        |  FROM q),
        |rr AS (SELECT *,
        |    (-qb + sqrt(qb * qb - qa * qc * 4.0)) / (qa * 2.0) AS r1,
        |    (-qb - sqrt(qb * qb - qa * qc * 4.0)) / (qa * 2.0) AS r2
        |  FROM rt),
        |ah AS (SELECT *, CASE WHEN abs(qa) < 0.000000000001
        |      THEN -qc / qb
        |      WHEN r1 >= lo AND r1 <= hi THEN r1 ELSE r2 END AS ahat
        |  FROM rr),
        |vv AS (SELECT n_strata, r, a - ahat AS dev,
        |    1.0 / (1.0 / ahat + 1.0 / ((a + b) - ahat)
        |      + 1.0 / ((a + cc) - ahat)
        |      + 1.0 / ((cc + d) - (a + cc) + ahat)) AS v
        |  FROM ah),
        |fold AS (SELECT max(n_strata) AS n_strata, max(r) AS r,
        |    round(sum(dev * dev / v), 6) AS bd_stat,
        |    round(sum(dev * dev / v)
        |      - sum(dev) * sum(dev) / sum(v), 6) AS bd_tarone
        |  FROM vv)
        |SELECT round(r, 6) AS or_mh, bd_stat, bd_tarone,
        |  n_strata - 1 AS dof,
        |  round_even(exp(-bd_stat / 2.0) * 1000000.0, 0) / 1000000.0
        |    AS p_value,
        |  round_even(exp(-bd_tarone / 2.0) * 1000000.0, 0) / 1000000.0
        |    AS p_tarone,
        |  n_strata FROM fold WHERE n_strata > 1""".stripMargin,
    // Holm replay: the q_drift_fdr p-value base, min-rank via cum −
    // peers + 1, ROWS-framed prefix max of the clamped candidate.
    "q_holm" ->
      """WITH c AS (SELECT event_type, user_id % 7 AS v FROM events),
        |cells AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS o
        |  FROM c GROUP BY event_type, v),
        |g AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS kg,
        |    CAST(sum(o * o) AS BIGINT) AS ssq
        |  FROM cells GROUP BY event_type),
        |x AS (SELECT event_type,
        |    round(ssq / (CAST(n AS DOUBLE) / 7.0) - 2.0 * n
        |      + kg * (CAST(n AS DOUBLE) / 7.0)
        |      + (7.0 - kg) * (CAST(n AS DOUBLE) / 7.0), 6) AS chi2,
        |    n FROM g),
        |p AS (SELECT event_type, chi2,
        |    round_even((SELECT sum(exp(-x.chi2 / 2.0
        |        + s.j * ln(x.chi2 / 2.0) - lgamma(s.j + 1.0)))
        |      FROM generate_series(0, 49) s(j) WHERE s.j < 3)
        |      * 1000000.0, 0) / 1000000.0 AS p_value FROM x),
        |f AS (SELECT event_type, chi2, p_value,
        |    CAST(count(*) OVER (ORDER BY p_value RANGE BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - CAST(count(*) OVER (PARTITION BY p_value) AS BIGINT)
        |      + 1 AS rk,
        |    CAST(count(*) OVER () AS BIGINT) AS m FROM p),
        |h AS (SELECT *, max(least(1.0,
        |    CAST(m - rk + 1 AS DOUBLE) * p_value))
        |    OVER (ORDER BY p_value ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS ph FROM f)
        |SELECT event_type, chi2, p_value, rk AS holm_rank,
        |  ph AS p_holm, ph <= 0.05 AS reject_fwer
        |FROM h ORDER BY event_type""".stripMargin,
    "q_hist_by_group" ->
      """WITH base AS (SELECT l_returnflag AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        |  WHERE l_orderkey < 100000 AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_returnflag IS NOT NULL)
        |SELECT g AS l_returnflag,
        |  least(greatest(CAST(floor((v - 0.0) / 5500.0) AS BIGINT),
        |    0), 19) AS bin,
        |  CAST(count(*) AS BIGINT) AS n,
        |  0.0 + least(greatest(CAST(floor((v - 0.0) / 5500.0)
        |    AS BIGINT), 0), 19) * 5500.0 AS bin_lo,
        |  0.0 + (least(greatest(CAST(floor((v - 0.0) / 5500.0)
        |    AS BIGINT), 0), 19) + 1) * 5500.0 AS bin_hi
        |FROM base GROUP BY 1, 2, 4, 5
        |ORDER BY l_returnflag, bin""".stripMargin,
    "q_effect_sizes" ->
      """WITH base AS (SELECT l_returnflag AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        |  WHERE l_orderkey < 100000 AND l_returnflag IS NOT NULL
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |mm AS (SELECT g, CAST(count(*) AS BIGINT) AS n, avg(v) AS mu,
        |    var_samp(v) AS vr FROM base GROUP BY g
        |  HAVING count(*) >= 2 AND var_samp(v) IS NOT NULL),
        |p AS (SELECT a.g AS group_a, b.g AS group_b, a.n AS n_a,
        |    b.n AS n_b, a.mu AS ma, b.mu AS mb,
        |    (CAST(a.n - 1 AS DOUBLE) * a.vr
        |      + CAST(b.n - 1 AS DOUBLE) * b.vr)
        |      / CAST(a.n + b.n - 2 AS DOUBLE) AS sp
        |  FROM mm a JOIN mm b ON a.g < b.g)
        |SELECT group_a, group_b, n_a, n_b,
        |  round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
        |  round((ma - mb) / sqrt(sp), 6) AS cohen_d,
        |  round(((ma - mb) / sqrt(sp)) * (1.0 - 3.0
        |    / (4.0 * CAST(n_a + n_b AS DOUBLE) - 9.0)), 6)
        |    AS hedges_g
        |FROM p WHERE sp > 0 ORDER BY group_a, group_b""".stripMargin,
    "q_icc" ->
      """WITH base AS (SELECT source AS g,
        |    CAST(n_chars AS DOUBLE) AS v FROM documents
        |  WHERE source IS NOT NULL AND n_chars IS NOT NULL
        |    AND NOT isnan(CAST(n_chars AS DOUBLE))),
        |cells AS (SELECT g, CAST(count(*) AS BIGINT) AS cn,
        |    sum(v) AS s, sum(v * v) AS ssq FROM base GROUP BY g),
        |a AS (SELECT CAST(sum(cn) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS k, sum(s) AS st,
        |    sum(s * s / cn) AS aa, sum(ssq) AS t,
        |    sum(cn * cn) AS sn2 FROM cells),
        |m AS (SELECT n, k,
        |    (aa - st * st / n) / (CAST(k AS DOUBLE) - 1.0) AS msb,
        |    (t - aa) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) AS msw,
        |    (CAST(n AS DOUBLE) - sn2 / CAST(n AS DOUBLE))
        |      / (CAST(k AS DOUBLE) - 1.0) AS n0
        |  FROM a WHERE k >= 2 AND n > k)
        |SELECT CASE WHEN msb + (n0 - 1.0) * msw > 0 THEN
        |    round((msb - msw) / (msb + (n0 - 1.0) * msw), 6) END
        |    AS icc,
        |  round(msb, 6) AS ms_between, round(msw, 6) AS ms_within,
        |  n, k FROM m""".stripMargin,
    "q_lorenz" ->
      """WITH base AS (SELECT l_linestatus AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        |  WHERE l_orderkey < 20000 AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND CAST(l_extendedprice AS DOUBLE) >= 0),
        |cells AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c,
        |    sum(v) AS s FROM base GROUP BY g, v),
        |w AS (SELECT *,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n,
        |    sum(s) OVER (PARTITION BY g) AS t,
        |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc,
        |    sum(s) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS cs FROM cells)
        |SELECT g AS l_linestatus, v,
        |  round(CAST(cc AS DOUBLE) / n, 6) AS pop_share,
        |  CASE WHEN t > 0 THEN round(cs / t, 6) END AS mass_share
        |FROM w ORDER BY l_linestatus, v""".stripMargin,
    "q_crosstab" ->
      """WITH cells AS (SELECT l_returnflag AS a, l_linestatus AS b,
        |    CAST(count(*) AS BIGINT) AS n FROM lineitem
        |  WHERE l_orderkey < 100000 AND l_returnflag IS NOT NULL
        |    AND l_linestatus IS NOT NULL GROUP BY 1, 2)
        |SELECT a, b, n,
        |  round(CAST(n AS DOUBLE)
        |    / sum(n) OVER (PARTITION BY a), 6) AS row_pct,
        |  round(CAST(n AS DOUBLE)
        |    / sum(n) OVER (PARTITION BY b), 6) AS col_pct,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (), 6) AS total_pct
        |FROM cells ORDER BY a, b""".stripMargin,
    "q_rate_ratio" ->
      s"""WITH base AS (SELECT
        |    CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    (event_type = 'purchase') AS y, 1.0 AS ex FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |a AS (SELECT
        |    CAST(sum(CASE WHEN g = 'a' AND y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x_a,
        |    round(sum(CASE WHEN g = 'a' THEN ex ELSE 0.0 END), 6)
        |      AS e_a,
        |    CAST(sum(CASE WHEN g = 'b' AND y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x_b,
        |    round(sum(CASE WHEN g = 'b' THEN ex ELSE 0.0 END), 6)
        |      AS e_b FROM base),
        |m AS (SELECT *, CAST(x_a AS DOUBLE) / e_a AS ra,
        |    CAST(x_b AS DOUBLE) / e_b AS rb,
        |    (x_a > 0 AND x_b > 0 AND e_a > 0 AND e_b > 0) AS ok
        |  FROM a),
        |t AS (SELECT *,
        |    CASE WHEN ok THEN ln(ra / rb) END AS lrr,
        |    CASE WHEN ok THEN
        |      sqrt(1.0 / x_a + 1.0 / x_b) END AS se FROM m),
        |zt AS (SELECT *, CASE WHEN ok THEN round(lrr / se, 6) END AS z
        |  FROM t),
        |ye AS (SELECT *, abs(z) / sqrt(2.0) AS yv FROM zt)
        |SELECT x_a, e_a, x_b, e_b,
        |  CASE WHEN e_a > 0 THEN round(ra, 6) END AS rate_a,
        |  CASE WHEN e_b > 0 THEN round(rb, 6) END AS rate_b,
        |  CASE WHEN ok THEN round(ra / rb, 6) END AS rate_ratio,
        |  CASE WHEN ok THEN
        |    round(exp(lrr - 1.959964 * se), 6) END AS rr_lo,
        |  CASE WHEN ok THEN
        |    round(exp(lrr + 1.959964 * se), 6) END AS rr_hi,
        |  z,
        |  CASE WHEN ok THEN
        |    round_even(${codyErfcSql("yv")} * 1000000.0, 0)
        |    / 1000000.0 END AS p_value
        |FROM ye""".stripMargin,
    "q_median_ci" ->
      """WITH base AS (SELECT l_returnflag AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        |  WHERE l_orderkey < 100000 AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |cells AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM base
        |  GROUP BY g, v),
        |w AS (SELECT *,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n,
        |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM cells),
        |r AS (SELECT *,
        |    CAST(ceil(CAST(n AS DOUBLE) * 0.5) AS BIGINT) AS rmed,
        |    greatest(1, CAST(floor(CAST(n AS DOUBLE) * 0.5
        |      - 1.959964 * sqrt(CAST(n AS DOUBLE)) / 2.0) AS BIGINT))
        |      AS rlo,
        |    least(n, CAST(ceil(CAST(n AS DOUBLE) * 0.5
        |      + 1.959964 * sqrt(CAST(n AS DOUBLE)) / 2.0) AS BIGINT)
        |      + 1) AS rhi FROM w)
        |SELECT g AS l_returnflag, CAST(max(n) AS BIGINT) AS n,
        |  min(CASE WHEN cum >= rmed THEN v END) AS median,
        |  CASE WHEN max(n) >= 2 THEN
        |    min(CASE WHEN cum >= rlo THEN v END) END AS ci_lo,
        |  CASE WHEN max(n) >= 2 THEN
        |    min(CASE WHEN cum >= rhi THEN v END) END AS ci_hi
        |FROM r GROUP BY g ORDER BY g""".stripMargin,
    "q_eb_shrinkage" ->
      """WITH groups AS (SELECT l_suppkey AS g,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x FROM lineitem
        |  WHERE l_orderkey < 50000 AND l_returnflag IS NOT NULL
        |  GROUP BY 1),
        |r AS (SELECT *, CAST(x AS DOUBLE) / n AS rr FROM groups),
        |mm AS (SELECT CAST(count(*) AS BIGINT) AS k, sum(rr) AS sr,
        |    sum(rr * rr) AS srr FROM r),
        |pr AS (SELECT sr / k AS m,
        |    CASE WHEN (srr / k - (sr / k) * (sr / k)) > 0
        |      AND (srr / k - (sr / k) * (sr / k))
        |        < (sr / k) * (1.0 - sr / k)
        |    THEN (sr / k) * (1.0 - sr / k)
        |      / (srr / k - (sr / k) * (sr / k)) - 1.0
        |    ELSE 0.0 END AS s FROM mm)
        |SELECT g AS l_suppkey, n, x,
        |  round(CAST(x AS DOUBLE) / n, 6) AS rate,
        |  round((CAST(x AS DOUBLE) + m * s)
        |    / (CAST(n AS DOUBLE) + m * s + (1.0 - m) * s), 6)
        |    AS shrunk_rate,
        |  round(m * s, 6) AS alpha,
        |  round((1.0 - m) * s, 6) AS beta
        |FROM r, pr ORDER BY l_suppkey""".stripMargin,
    // Event-study replay: per-(unit, week) decimal means, the
    // cohort-period frame, the ATT(g,t) double difference vs the
    // never-treated baseline.
    "q_event_study" ->
      """WITH ev AS (SELECT user_id AS u,
        |    epoch_ns(ts) // 604800000000000 AS w,
        |    CAST(value AS DOUBLE) AS y, event_type AS et
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |coh AS MATERIALIZED (SELECT u, CAST(min(w) AS BIGINT) AS g
        |  FROM ev WHERE et = 'purchase' AND u % 3 <> 0 GROUP BY u),
        |cells AS (SELECT ev.u, ev.w,
        |    CAST(sum(CAST(ev.y AS DECIMAL(38,6))) AS DOUBLE)
        |      / count(*) AS cy,
        |    max(coh.g) AS g
        |  FROM ev LEFT JOIN coh ON ev.u = coh.u
        |  WHERE ev.y IS NOT NULL AND NOT isnan(ev.y)
        |  GROUP BY ev.u, ev.w),
        |cp AS MATERIALIZED (SELECT g, w, CAST(count(*) AS BIGINT)
        |      AS n,
        |    CAST(sum(CAST(cy AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS m
        |  FROM cells GROUP BY g, w),
        |tr AS (SELECT g AS cohort, w AS period, n AS n_treated,
        |    m AS mgt FROM cp WHERE g IS NOT NULL AND w >= g),
        |bt AS (SELECT g AS cohort, m AS mgb FROM cp
        |  WHERE g IS NOT NULL AND w = g - 1),
        |c0 AS (SELECT w AS period, n AS n_control, m AS m0t FROM cp
        |  WHERE g IS NULL),
        |c0b AS (SELECT w, m AS m0b FROM cp WHERE g IS NULL)
        |SELECT tr.cohort, tr.period, tr.n_treated, c0.n_control,
        |  round((tr.mgt - bt.mgb) - (c0.m0t - c0b.m0b), 6) + 0.0
        |    AS att
        |FROM tr JOIN bt ON tr.cohort = bt.cohort
        |  JOIN c0 ON tr.period = c0.period
        |  JOIN c0b ON c0b.w = tr.cohort - 1
        |ORDER BY tr.cohort, tr.period""".stripMargin,
    // Gamma-Poisson replay: decimal-exact group events/exposure, the
    // k-row MoM prior fold, posterior column arithmetic.
    "q_eb_poisson" ->
      """WITH g AS MATERIALIZED (SELECT l_suppkey % 20 AS bucket,
        |    CAST(sum(CAST(CASE WHEN l_returnflag = 'R' THEN 1.0
        |      ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE) AS ev,
        |    CAST(sum(CAST(1.0 AS DECIMAL(38,6))) AS DOUBLE) AS ex
        |  FROM lineitem GROUP BY 1 HAVING
        |    CAST(sum(CAST(1.0 AS DECIMAL(38,6))) AS DOUBLE) > 0.0),
        |r AS (SELECT bucket, ev, ex, ev / ex AS rr FROM g),
        |mm AS (SELECT CAST(count(*) AS BIGINT) AS k, sum(rr) AS sr,
        |    sum(rr * rr) AS srr FROM r),
        |ab AS (SELECT
        |    CASE WHEN srr / k - (sr / k) * (sr / k) > 0.0
        |      AND sr / k > 0.0
        |    THEN (sr / k) * (sr / k)
        |      / (srr / k - (sr / k) * (sr / k)) ELSE 0.0 END AS alpha,
        |    CASE WHEN srr / k - (sr / k) * (sr / k) > 0.0
        |      AND sr / k > 0.0
        |    THEN (sr / k)
        |      / (srr / k - (sr / k) * (sr / k)) ELSE 0.0 END AS beta
        |  FROM mm)
        |SELECT bucket, round(ev, 6) AS events, round(ex, 6)
        |    AS exposure,
        |  round(rr, 6) AS rate,
        |  round((ev + alpha) / (ex + beta), 6) AS shrunk_rate,
        |  round(alpha, 6) AS alpha, round(beta, 6) AS beta
        |FROM r, ab ORDER BY bucket""".stripMargin,
    // XmR replay: decimal daily cells, lag moving ranges, rounded
    // 2.66 limits, the out-of-limit recount against them.
    "q_control_chart" ->
      """WITH e AS (SELECT event_type AS k,
        |    epoch_ns(ts) // 86400000000000 AS p, value AS x
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |cells AS MATERIALIZED (SELECT k, p,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS v
        |  FROM e GROUP BY k, p),
        |mr AS (SELECT k, p, v,
        |    abs(v - lag(v) OVER (PARTITION BY k ORDER BY p)) AS d
        |  FROM cells),
        |st AS (SELECT k, CAST(count(*) AS BIGINT) AS n_periods,
        |    avg(v) AS xb, avg(d) AS mrb FROM mr GROUP BY k
        |  HAVING count(*) >= 3),
        |lim AS (SELECT k, n_periods, round(xb, 6) AS xbar,
        |    round(mrb, 6) AS mr_bar,
        |    round(xb + 2.66 * mrb, 6) AS ucl,
        |    round(xb - 2.66 * mrb, 6) AS lcl
        |  FROM st),
        |fl AS (SELECT lim.k,
        |    CAST(sum(CASE WHEN cells.v > lim.ucl
        |      OR cells.v < lim.lcl THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_beyond
        |  FROM lim JOIN cells ON cells.k = lim.k GROUP BY lim.k)
        |SELECT lim.k AS event_type, n_periods, xbar, mr_bar, ucl,
        |  lcl, n_beyond
        |FROM lim JOIN fl ON lim.k = fl.k ORDER BY event_type""".stripMargin,
    // ADI/CV2 replay: decimal period demand sums, the min..max grid
    // span, quadrant cutoffs on the rounded statistics.
    "q_demand_class" ->
      """WITH e AS (SELECT user_id AS k,
        |    epoch_ns(ts) // 86400000000000 AS p, value AS x
        |  FROM events WHERE user_id IS NOT NULL AND user_id < 30
        |    AND ts IS NOT NULL AND value IS NOT NULL
        |    AND NOT isnan(value)),
        |cells AS (SELECT k, p,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS s
        |  FROM e GROUP BY k, p),
        |st AS (SELECT k, min(p) AS pmin, max(p) AS pmax,
        |    CAST(sum(CASE WHEN s <> 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_nonzero,
        |    sum(CASE WHEN s <> 0.0 THEN s END) AS ss,
        |    sum(CASE WHEN s <> 0.0 THEN s * s END) AS ssq
        |  FROM cells GROUP BY k),
        |x AS (SELECT k, pmax - pmin + 1 AS n_periods, n_nonzero,
        |    round(CAST(pmax - pmin + 1 AS DOUBLE) / n_nonzero, 6)
        |      AS adi,
        |    round((ssq / n_nonzero - (ss / n_nonzero)
        |        * (ss / n_nonzero))
        |      / ((ss / n_nonzero) * (ss / n_nonzero)), 6) + 0.0 AS cv2
        |  FROM st WHERE n_nonzero >= 2 AND ss <> 0.0)
        |SELECT k AS user_id, n_periods, n_nonzero, adi, cv2,
        |  CASE WHEN adi < 1.32 AND cv2 < 0.49 THEN 'smooth'
        |    WHEN adi >= 1.32 AND cv2 < 0.49 THEN 'intermittent'
        |    WHEN adi < 1.32 THEN 'erratic' ELSE 'lumpy' END
        |    AS demand_class
        |FROM x ORDER BY user_id""".stripMargin,
    // Leakage replay: distinct (entity, split), margins cross-join so
    // disjoint pairs report zero, entity self-join overlap counts.
    "q_split_leakage" ->
      """WITH p AS MATERIALIZED (SELECT DISTINCT
        |    CAST(user_id AS VARCHAR) AS e,
        |    CASE WHEN event_id % 10 < 8 THEN 'train'
        |      WHEN event_id % 10 = 8 THEN 'val' ELSE 'test' END AS s
        |  FROM events WHERE user_id IS NOT NULL),
        |m AS MATERIALIZED (SELECT s, CAST(count(*) AS BIGINT) AS n
        |  FROM p GROUP BY s),
        |ov AS (SELECT a.s AS sa, b.s AS sb,
        |    CAST(count(*) AS BIGINT) AS nb
        |  FROM p a JOIN p b ON a.e = b.e AND a.s < b.s
        |  GROUP BY a.s, b.s),
        |ap AS (SELECT a.s AS sa, a.n AS n_a, b.s AS sb, b.n AS n_b
        |  FROM m a, m b WHERE a.s < b.s)
        |SELECT ap.sa AS split_a, ap.sb AS split_b, ap.n_a, ap.n_b,
        |  coalesce(ov.nb, CAST(0 AS BIGINT)) AS n_both,
        |  round(CAST(coalesce(ov.nb, 0) AS DOUBLE)
        |    / least(ap.n_a, ap.n_b), 6) AS leak_share
        |FROM ap LEFT JOIN ov ON ap.sa = ov.sa AND ap.sb = ov.sb
        |ORDER BY split_a, split_b""".stripMargin,
    // Interval-overlap replay: the plain inclusive overlap join on
    // the two slices, exact integer second sums.
    "q_interval_overlap" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(epoch(o_orderdate)) AS BIGINT) AS st
        |  FROM orders),
        |a AS (SELECT k AS a_key, st AS a_s, st + 30 * 86400 AS a_e
        |  FROM o WHERE k < 100),
        |b AS (SELECT k AS b_key, st AS b_s, st + 30 * 86400 AS b_e
        |  FROM o WHERE k >= 100 AND k < 300)
        |SELECT a_key, CAST(count(*) AS BIGINT) AS n_overlaps,
        |  CAST(sum(least(a_e, b_e) - greatest(a_s, b_s)) AS BIGINT)
        |    AS overlap_secs
        |FROM a JOIN b ON a_s <= b_e AND b_s <= a_e
        |GROUP BY a_key ORDER BY a_key""".stripMargin,
    // Peaks replay: daily cells, lag/lead neighbors, strict maxima
    // with the margin bar.
    "q_peaks" ->
      """WITH e AS (SELECT event_type AS k,
        |    epoch_ns(ts) // 86400000000000 AS p, value AS x
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |cells AS (SELECT k, p,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS v
        |  FROM e GROUP BY k, p),
        |w AS (SELECT k, p, v,
        |    lag(v) OVER win AS pv, lead(v) OVER win AS nv
        |  FROM cells WINDOW win AS (PARTITION BY k ORDER BY p))
        |SELECT k AS event_type, p AS period, round(v, 6) AS v,
        |  round(v - greatest(pv, nv), 6) AS margin
        |FROM w WHERE pv IS NOT NULL AND nv IS NOT NULL
        |  AND v > pv AND v > nv AND v - greatest(pv, nv) >= 1.0
        |ORDER BY event_type, period""".stripMargin,
    // ADF replay: daily cells, lag/diff chain, closed-form drift OLS,
    // the t vs -2.86 verdict.
    "q_adf" ->
      """WITH e AS (SELECT event_type AS k,
        |    epoch_ns(ts) // 86400000000000 AS p, value AS x
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |cells AS (SELECT k, p,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS v
        |  FROM e GROUP BY k, p),
        |lg AS (SELECT k, p, v,
        |    lag(v) OVER (PARTITION BY k ORDER BY p) AS el FROM cells),
        |r AS (SELECT k, el, v - el AS de FROM lg
        |  WHERE el IS NOT NULL),
        |mo AS (SELECT k, CAST(count(*) AS BIGINT) AS m,
        |    sum(el) AS sel, sum(de) AS sde, sum(el * el) AS see,
        |    sum(el * de) AS sed, sum(de * de) AS sdd
        |  FROM r GROUP BY k),
        |f AS (SELECT k, m,
        |    (sed - sel * sde / CAST(m AS DOUBLE))
        |      / (see - sel * sel / CAST(m AS DOUBLE)) AS gam,
        |    see - sel * sel / CAST(m AS DOUBLE) AS sxx,
        |    sde, sed, sdd, sel FROM mo
        |  WHERE m >= 8 AND see - sel * sel / CAST(m AS DOUBLE) > 0.0),
        |g AS (SELECT k, m, gam, sxx,
        |    sdd - (sde / CAST(m AS DOUBLE)
        |      - gam * (sel / CAST(m AS DOUBLE))) * sde - gam * sed
        |      AS sse
        |  FROM f),
        |h AS (SELECT k, m, round(gam, 6) AS gamma,
        |    round(gam / sqrt((sse / (CAST(m AS DOUBLE) - 2.0)) / sxx),
        |      6) AS t_stat
        |  FROM g WHERE sse > 0.0)
        |SELECT k AS event_type, m + 1 AS n_periods,
        |  gamma + 0.0 AS gamma, t_stat + 0.0 AS t_stat,
        |  t_stat < -2.86 AS stationary
        |FROM h ORDER BY event_type""".stripMargin,
    // Cointegration replay: daily decimal means of both metrics, the
    // rounded OLS, the residual lag chain, the DF t-statistic.
    "q_cointegration" ->
      """WITH b AS (SELECT l_returnflag AS k,
        |    CAST(floor(epoch(l_shipdate)) AS BIGINT) // 86400 AS p,
        |    CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y
        |  FROM lineitem WHERE l_returnflag IS NOT NULL
        |    AND l_shipdate IS NOT NULL AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |cells AS MATERIALIZED (SELECT k, p,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS vx,
        |    CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS vy
        |  FROM b GROUP BY k, p),
        |mo AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    sum(vx) AS sx, sum(vy) AS sy, sum(vx * vx) AS sxx,
        |    sum(vx * vy) AS sxy FROM cells GROUP BY k),
        |co AS MATERIALIZED (SELECT k, n,
        |    round((sxy - sx * sy / CAST(n AS DOUBLE))
        |      / (sxx - sx * sx / CAST(n AS DOUBLE)), 6) AS beta,
        |    round(sy / CAST(n AS DOUBLE)
        |      - ((sxy - sx * sy / CAST(n AS DOUBLE))
        |        / (sxx - sx * sx / CAST(n AS DOUBLE)))
        |      * (sx / CAST(n AS DOUBLE)), 6) AS alpha
        |  FROM mo WHERE n >= 8
        |    AND sxx - sx * sx / CAST(n AS DOUBLE) > 0.0),
        |r AS (SELECT cells.k, cells.p,
        |    cells.vy - (co.alpha + co.beta * cells.vx) AS e
        |  FROM cells JOIN co ON cells.k = co.k),
        |r2 AS (SELECT k, p, e,
        |    lag(e) OVER (PARTITION BY k ORDER BY p) AS el FROM r),
        |r3 AS (SELECT k, e - el AS de, el FROM r2
        |  WHERE el IS NOT NULL),
        |g AS (SELECT k, CAST(count(*) AS BIGINT) AS m,
        |    sum(el * de) AS sed, sum(el * el) AS see,
        |    sum(de * de) AS sdd FROM r3 GROUP BY k),
        |f AS (SELECT k, m, sed / see AS gam,
        |    sdd - (sed / see) * (sed / see) * see AS sse, see FROM g
        |  WHERE m >= 4 AND see > 0.0
        |    AND sdd - (sed / see) * (sed / see) * see > 0.0)
        |SELECT f.k AS l_returnflag, co.n AS n_periods,
        |  co.beta + 0.0 AS beta, co.alpha + 0.0 AS alpha,
        |  round(f.gam, 6) + 0.0 AS gamma,
        |  round(f.gam / sqrt((f.sse / (CAST(f.m AS DOUBLE) - 1.0))
        |    / f.see), 6) + 0.0 AS t_stat,
        |  round(f.gam / sqrt((f.sse / (CAST(f.m AS DOUBLE) - 1.0))
        |    / f.see), 6) < -3.34 AS cointegrated
        |FROM f JOIN co ON f.k = co.k ORDER BY l_returnflag""".stripMargin,
    // Period-detect replay: rounded ACF over the daily cells for lags
    // 2..7, per-key argmax (ties to the smaller lag), 2/sqrt(n) bar.
    "q_period_detect" ->
      """WITH e AS (SELECT event_type AS k,
        |    epoch_ns(ts) // 86400000000000 AS p, value AS x
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |cells AS (SELECT k, p,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS v
        |  FROM e GROUP BY k, p),
        |m AS (SELECT k, p, v, avg(v) OVER (PARTITION BY k) AS mu
        |  FROM cells),
        |d AS (SELECT k, v - mu AS dd,
        |    lag(v - mu, 2) OVER w AS d2,
        |    lag(v - mu, 3) OVER w AS d3,
        |    lag(v - mu, 4) OVER w AS d4,
        |    lag(v - mu, 5) OVER w AS d5,
        |    lag(v - mu, 6) OVER w AS d6,
        |    lag(v - mu, 7) OVER w AS d7
        |  FROM m WINDOW w AS (PARTITION BY k ORDER BY p)),
        |ag AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    sum(dd * dd) AS ss,
        |    sum(dd * d2) AS s2,
        |    sum(dd * d3) AS s3,
        |    sum(dd * d4) AS s4,
        |    sum(dd * d5) AS s5,
        |    sum(dd * d6) AS s6,
        |    sum(dd * d7) AS s7
        |  FROM d GROUP BY k),
        |ac AS (SELECT k, n,
        |    CASE WHEN ss > 0.0 THEN round(s2 / ss, 6) END AS a2,
        |    CASE WHEN ss > 0.0 THEN round(s3 / ss, 6) END AS a3,
        |    CASE WHEN ss > 0.0 THEN round(s4 / ss, 6) END AS a4,
        |    CASE WHEN ss > 0.0 THEN round(s5 / ss, 6) END AS a5,
        |    CASE WHEN ss > 0.0 THEN round(s6 / ss, 6) END AS a6,
        |    CASE WHEN ss > 0.0 THEN round(s7 / ss, 6) END AS a7
        |  FROM ag),
        |f AS (SELECT k, n, 2 AS l, a2 AS a FROM ac
        |  UNION ALL SELECT k, n, 3 AS l, a3 AS a FROM ac
        |  UNION ALL SELECT k, n, 4 AS l, a4 AS a FROM ac
        |  UNION ALL SELECT k, n, 5 AS l, a5 AS a FROM ac
        |  UNION ALL SELECT k, n, 6 AS l, a6 AS a FROM ac
        |  UNION ALL SELECT k, n, 7 AS l, a7 AS a FROM ac),
        |ok AS (SELECT k FROM ac WHERE a2 IS NOT NULL AND a3 IS NOT NULL AND a4 IS NOT NULL AND a5 IS NOT NULL AND a6 IS NOT NULL AND a7 IS NOT NULL),
        |rk AS (SELECT f.k, f.n, f.l, f.a, row_number() OVER
        |    (PARTITION BY f.k ORDER BY f.a DESC, f.l) AS rn
        |  FROM f JOIN ok ON f.k = ok.k)
        |SELECT k AS event_type, n, CAST(l AS BIGINT) AS best_lag,
        |  a + 0.0 AS best_acf,
        |  round(2.0 / sqrt(CAST(n AS DOUBLE)), 6) AS threshold,
        |  a > round(2.0 / sqrt(CAST(n AS DOUBLE)), 6) AS significant
        |FROM rk WHERE rn = 1 ORDER BY event_type""".stripMargin,
    // k-anonymity replay: one quasi-group aggregation, per-k folds
    // over the group frame, exact integer counts.
    "q_k_anonymity" ->
      """WITH g AS MATERIALIZED (SELECT l_partkey, l_returnflag,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(DISTINCT l_quantity) AS BIGINT) AS l
        |  FROM lineitem GROUP BY l_partkey, l_returnflag),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS gt,
        |    CAST(sum(n) AS BIGINT) AS rt, CAST(min(l) AS BIGINT) AS ml,
        |    CAST(sum(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS l1 FROM g),
        |per AS (SELECT k.k,
        |    CAST(sum(CASE WHEN g.n < k.k THEN 1 ELSE 0 END) AS BIGINT)
        |      AS gb,
        |    CAST(sum(CASE WHEN g.n < k.k THEN g.n ELSE 0 END)
        |      AS BIGINT) AS rb
        |  FROM g, (VALUES (2), (5), (10)) k(k) GROUP BY k.k)
        |SELECT CAST(per.k AS BIGINT) AS k, per.gb AS n_groups_below,
        |  per.rb AS n_rows_below,
        |  round(CAST(per.rb AS DOUBLE) / t.rt, 6) AS row_share_below,
        |  t.gt AS n_groups, t.rt AS n_rows, t.ml AS min_l_diversity,
        |  t.l1 AS n_groups_single_sensitive
        |FROM per, t ORDER BY k""".stripMargin,
    // Top-k churn replay: both ranked top-20 token lists, the common
    // join, exact footrule and set counts.
    "q_topk_churn" ->
      """WITH ca AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM
        |  (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+'))
        |     AS w FROM documents WHERE lang = 'en') GROUP BY w),
        |cb AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM
        |  (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+'))
        |     AS w FROM documents WHERE lang <> 'en') GROUP BY w),
        |ta AS (SELECT w, r FROM (SELECT w,
        |    row_number() OVER (ORDER BY c DESC, w) AS r FROM ca)
        |  WHERE r <= 20),
        |tb AS (SELECT w, r FROM (SELECT w,
        |    row_number() OVER (ORDER BY c DESC, w) AS r FROM cb)
        |  WHERE r <= 20),
        |cm AS (SELECT CAST(count(*) AS BIGINT) AS nc,
        |    CAST(coalesce(sum(abs(ta.r - tb.r)), 0) AS BIGINT) AS foot
        |  FROM ta JOIN tb ON ta.w = tb.w)
        |SELECT CAST(20 AS BIGINT) AS k, nc AS n_common,
        |  round(CAST(nc AS DOUBLE) / (40 - nc), 6) AS jaccard,
        |  CAST(20 - nc AS BIGINT) AS n_new,
        |  CAST(20 - nc AS BIGINT) AS n_dropped,
        |  foot AS footrule
        |FROM cm""".stripMargin,
    // RBO replay: the same ranked heads, per-depth prefix overlaps,
    // the geometric fold in ascending depth order.
    "q_rbo" ->
      """WITH ca AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM
        |  (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+'))
        |     AS w FROM documents WHERE lang = 'en') GROUP BY w),
        |cb AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM
        |  (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+'))
        |     AS w FROM documents WHERE lang <> 'en') GROUP BY w),
        |ta AS MATERIALIZED (SELECT w, r FROM (SELECT w,
        |    row_number() OVER (ORDER BY c DESC, w) AS r FROM ca)
        |  WHERE r <= 20),
        |tb AS MATERIALIZED (SELECT w, r FROM (SELECT w,
        |    row_number() OVER (ORDER BY c DESC, w) AS r FROM cb)
        |  WHERE r <= 20),
        |dd AS MATERIALIZED (SELECT d.d, CAST((SELECT count(*)
        |      FROM ta JOIN tb ON ta.w = tb.w
        |      WHERE ta.r <= d.d AND tb.r <= d.d) AS BIGINT) AS xd
        |  FROM generate_series(1, 20) d(d)),
        |s AS (SELECT list_sum(list(power(0.9, d - 1) * xd / d
        |    ORDER BY d)) AS acc FROM dd)
        |SELECT CAST(20 AS BIGINT) AS k, 0.9 AS p,
        |  round((1.0 - 0.9) * acc, 6) AS rbo,
        |  round(CAST((SELECT xd FROM dd WHERE d = 20) AS DOUBLE)
        |    / 20, 6) AS agreement_k
        |FROM s""".stripMargin,
    "q_sequential" ->
      """WITH e AS (SELECT
        |    CAST(floor((epoch_ns(ts) - epoch_ns(ts) % 604800000000000)
        |      / 604800000000000.0) AS BIGINT) AS period,
        |    CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    (event_type = 'purchase') AS y FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IS NOT NULL),
        |cells AS (SELECT period,
        |    CAST(sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS na,
        |    CAST(sum(CASE WHEN g = 'a' AND y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS xa,
        |    CAST(sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nb,
        |    CAST(sum(CASE WHEN g = 'b' AND y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS xb
        |  FROM e GROUP BY period),
        |cum AS (SELECT period,
        |    CAST(sum(na) OVER w AS BIGINT) AS n_a,
        |    CAST(sum(xa) OVER w AS BIGINT) AS x_a,
        |    CAST(sum(nb) OVER w AS BIGINT) AS n_b,
        |    CAST(sum(xb) OVER w AS BIGINT) AS x_b,
        |    CAST(row_number() OVER (ORDER BY period) AS BIGINT) AS k,
        |    CAST(count(*) OVER () AS BIGINT) AS bigk
        |  FROM cells WINDOW w AS (ORDER BY period ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND CURRENT ROW)),
        |zt AS (SELECT *,
        |    sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
        |      * (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
        |      * (1.0 / n_a + 1.0 / n_b)) AS se
        |  FROM cum WHERE n_a > 0 AND n_b > 0)
        |SELECT period, n_a, x_a, n_b, x_b,
        |  round((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
        |    / se, 6) AS z,
        |  round(1.959964 * sqrt(CAST(bigk AS DOUBLE) / k), 6)
        |    AS boundary,
        |  abs(round((CAST(x_a AS DOUBLE) / n_a
        |    - CAST(x_b AS DOUBLE) / n_b) / se, 6))
        |    > round(1.959964 * sqrt(CAST(bigk AS DOUBLE) / k), 6)
        |    AS crossed
        |FROM zt WHERE se > 0 ORDER BY period""".stripMargin,
    "q_fk_coverage" ->
      """WITH fk AS (SELECT CAST(l_suppkey AS VARCHAR) AS k,
        |    CAST(count(*) AS BIGINT) AS c FROM lineitem
        |  WHERE l_suppkey IS NOT NULL GROUP BY 1),
        |dk AS (SELECT DISTINCT CAST(s_suppkey AS VARCHAR) AS k
        |  FROM supplier WHERE s_suppkey IS NOT NULL)
        |SELECT CAST(sum(c) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(CASE WHEN dk.k IS NOT NULL THEN c END), 0)
        |    AS BIGINT) AS n_matched_rows,
        |  round(CAST(coalesce(sum(CASE WHEN dk.k IS NOT NULL
        |    THEN c END), 0) AS DOUBLE) / sum(c), 6) AS row_coverage,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(coalesce(sum(CASE WHEN dk.k IS NOT NULL THEN 1 END), 0)
        |    AS BIGINT) AS n_matched_keys,
        |  CAST(count(*) - coalesce(sum(CASE WHEN dk.k IS NOT NULL
        |    THEN 1 END), 0) AS BIGINT) AS n_orphan_keys
        |FROM fk LEFT JOIN dk ON fk.k = dk.k""".stripMargin,
    "q_readability" ->
      """WITH c AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(coalesce(text, ''),
        |      '[A-Za-z]')) AS BIGINT) AS n_letters,
        |    CAST(len(list_filter(regexp_split_to_array(
        |      coalesce(text, ''), '\s+'), x -> x <> '')) AS BIGINT)
        |      AS n_words,
        |    CAST(greatest(1, len(regexp_extract_all(coalesce(text, ''),
        |      '[.!?]+'))) AS BIGINT) AS n_sentences
        |  FROM documents)
        |SELECT doc_id, n_letters, n_words, n_sentences,
        |  CASE WHEN n_words > 0 THEN round(
        |    0.0588 * (CAST(n_letters AS DOUBLE) * 100.0 / n_words)
        |    - 0.296 * (CAST(n_sentences AS DOUBLE) * 100.0 / n_words)
        |    - 15.8, 6) END AS cli
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_attribution" ->
      """WITH e AS (SELECT user_id AS u, epoch_ns(ts) AS tns, event_id,
        |    event_type AS et FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        |w AS (SELECT u, tns, et,
        |    first_value(CASE WHEN et <> 'purchase' THEN et END
        |      IGNORE NULLS) OVER cur AS ft,
        |    first_value(CASE WHEN et <> 'purchase' THEN tns END
        |      IGNORE NULLS) OVER cur AS fts,
        |    last_value(CASE WHEN et <> 'purchase' THEN et END
        |      IGNORE NULLS) OVER prev AS lt,
        |    last_value(CASE WHEN et <> 'purchase' THEN tns END
        |      IGNORE NULLS) OVER prev AS lts
        |  FROM e WINDOW
        |    cur AS (PARTITION BY u ORDER BY tns, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    prev AS (PARTITION BY u ORDER BY tns, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT u AS user_id, tns AS ts, ft AS first_touch_type,
        |  fts AS first_touch_ts, lt AS last_touch_type,
        |  lts AS last_touch_ts
        |FROM w WHERE et = 'purchase'
        |ORDER BY user_id, ts""".stripMargin,
    "q_cv_auc" ->
      """WITH base AS (SELECT
        |    CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),
        |      1, 8)) AS BIGINT) % 5 AS fold,
        |    CAST(l_discount AS DOUBLE) AS v, (l_returnflag = 'R') AS y
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT fold, v,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS cp,
        |    CAST(sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cn
        |  FROM base GROUP BY fold, v),
        |w AS (SELECT fold, cp, cn,
        |    coalesce(CAST(sum(cn) OVER (PARTITION BY fold ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS cumn FROM cells)
        |SELECT fold,
        |  round(sum(cp * (cumn + 0.5 * cn))
        |    / (CAST(sum(cp) AS DOUBLE) * sum(cn)), 6) AS auc,
        |  sum(cp * (cumn + 0.5 * cn)) AS u_stat,
        |  CAST(sum(cp) AS BIGINT) AS n_pos,
        |  CAST(sum(cn) AS BIGINT) AS n_neg
        |FROM w GROUP BY fold HAVING sum(cp) > 0 AND sum(cn) > 0
        |ORDER BY fold""".stripMargin,
    "q_seasonal_index" ->
      """WITH e AS (SELECT event_type AS k, epoch_ns(ts) AS t,
        |    CAST(value AS DOUBLE) AS v FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |ph AS (SELECT k, v,
        |    CAST(floor((t - t % 86400000000000)
        |      / 86400000000000.0) AS BIGINT) % 7 AS phase FROM e),
        |cells AS (SELECT k, phase, CAST(count(*) AS BIGINT) AS n,
        |    sum(v) AS s FROM ph GROUP BY k, phase),
        |w AS (SELECT *,
        |    sum(s) OVER (PARTITION BY k) AS ks,
        |    CAST(sum(n) OVER (PARTITION BY k) AS BIGINT) AS kn
        |  FROM cells)
        |SELECT k AS event_type, phase, n,
        |  round(s / CAST(n AS DOUBLE), 6) AS phase_mean,
        |  CASE WHEN ks / CAST(kn AS DOUBLE) <> 0.0 THEN
        |    round((s / CAST(n AS DOUBLE))
        |      / (ks / CAST(kn AS DOUBLE)), 6) END AS seasonal_index
        |FROM w ORDER BY event_type, phase""".stripMargin,
    "q_decayed" ->
      """WITH ref AS (SELECT max(epoch_ns(ts)) AS rt FROM events),
        |e AS (SELECT event_type AS k, epoch_ns(ts) AS t,
        |    CAST(value AS DOUBLE) AS v FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value))
        |SELECT k AS event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(pow(2.0, -(CAST(rt AS DOUBLE) - CAST(t AS DOUBLE))
        |    / 604800000000000.0)), 6) AS decayed_count,
        |  round(sum(v * pow(2.0,
        |    -(CAST(rt AS DOUBLE) - CAST(t AS DOUBLE))
        |    / 604800000000000.0)), 6) AS decayed_sum
        |FROM e, ref WHERE t <= rt GROUP BY k ORDER BY k""".stripMargin,
    "q_lsh_plan" ->
      """WITH b AS (SELECT CAST(g.b AS BIGINT) AS bands,
        |    CAST(128 // g.b AS BIGINT) AS r
        |  FROM generate_series(1, 128) g(b) WHERE 128 % g.b = 0)
        |SELECT bands, r AS "rows",
        |  round_even(pow(1.0 / bands, 1.0 / r) * 1000000.0, 0)
        |    / 1000000.0 AS crossover,
        |  round_even((1.0 - pow(1.0 - pow(0.8, r), bands))
        |    * 1000000.0, 0) / 1000000.0 AS p_catch_at_threshold
        |FROM b ORDER BY bands""".stripMargin,
    // Bradley-Terry replay: both MM rounds as chained CTEs (the
    // q_pagerank pattern) with the per-round mean normalization.
    "q_bradley_terry" ->
      """WITH base AS (SELECT l_orderkey AS o,
        |    CAST(l_suppkey AS VARCHAR) AS sk,
        |    CAST(l_extendedprice AS DOUBLE) AS p FROM lineitem
        |  WHERE l_orderkey < 20000),
        |decided AS (SELECT a.sk AS w, b.sk AS l FROM base a
        |  JOIN base b ON a.o = b.o AND a.sk <> b.sk AND a.p > b.p),
        |wc AS (SELECT w, l, CAST(count(*) AS BIGINT) AS n FROM decided
        |  GROUP BY w, l),
        |mm AS (SELECT i, j, CAST(sum(n) AS BIGINT) AS m FROM (
        |    SELECT w AS i, l AS j, n FROM wc
        |    UNION ALL SELECT l, w, n FROM wc) GROUP BY i, j),
        |items AS (SELECT DISTINCT i FROM mm),
        |wins AS (SELECT items.i,
        |    CAST(coalesce(ww.wn, 0) AS BIGINT) AS wins FROM items
        |  LEFT JOIN (SELECT w AS i, CAST(sum(n) AS BIGINT) AS wn
        |    FROM wc GROUP BY w) ww ON ww.i = items.i),
        |s0 AS (SELECT i, 1.0 AS s FROM items),
        |d1 AS (SELECT mm.i, sum(mm.m / (si.s + sj.s)) AS den FROM mm
        |  JOIN s0 si ON si.i = mm.i JOIN s0 sj ON sj.i = mm.j
        |  GROUP BY mm.i),
        |r1 AS (SELECT w.i, CAST(w.wins AS DOUBLE) / d1.den AS s
        |  FROM wins w JOIN d1 ON d1.i = w.i),
        |mu1 AS (SELECT avg(s) AS mu FROM r1),
        |s1 AS (SELECT i, s / mu1.mu AS s FROM r1, mu1),
        |d2 AS (SELECT mm.i, sum(mm.m / (si.s + sj.s)) AS den FROM mm
        |  JOIN s1 si ON si.i = mm.i JOIN s1 sj ON sj.i = mm.j
        |  GROUP BY mm.i),
        |r2 AS (SELECT w.i, CAST(w.wins AS DOUBLE) / d2.den AS s
        |  FROM wins w JOIN d2 ON d2.i = w.i),
        |mu2 AS (SELECT avg(s) AS mu FROM r2),
        |s2 AS (SELECT i, s / mu2.mu AS s FROM r2, mu2)
        |SELECT wins.i AS item, wins.wins, nm.n_matches,
        |  round(s2.s, 6) AS strength
        |FROM wins JOIN (SELECT i, CAST(sum(m) AS BIGINT) AS n_matches
        |  FROM mm GROUP BY i) nm ON nm.i = wins.i
        |JOIN s2 ON s2.i = wins.i ORDER BY item""".stripMargin,
    // The q_isotonic minimax replay with the group dimension threaded
    // through every CTE (windows PARTITION BY g, joins carry g).
    "q_isotonic_group" ->
      """WITH base AS (SELECT l_linestatus AS g,
        |    least(9, greatest(0,
        |      CAST(floor((l_discount * 10.0) * 10) AS INT))) AS bin,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount * 10.0 AS DOUBLE))
        |    AND l_returnflag IS NOT NULL
        |    AND l_linestatus IS NOT NULL),
        |cells AS (SELECT g, bin, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS pos FROM base GROUP BY g, bin),
        |ord AS (SELECT g, bin, n, pos,
        |    CAST(row_number() OVER (PARTITION BY g ORDER BY bin)
        |      AS BIGINT) AS i FROM cells),
        |pre AS (SELECT *,
        |    CAST(sum(n) OVER (PARTITION BY g ORDER BY i) AS BIGINT)
        |      AS cn,
        |    CAST(sum(pos) OVER (PARTITION BY g ORDER BY i) AS BIGINT)
        |      AS cp FROM ord),
        |pre2 AS (SELECT *,
        |    coalesce(CAST(lag(cn) OVER (PARTITION BY g ORDER BY i)
        |      AS BIGINT), 0) AS cnp,
        |    coalesce(CAST(lag(cp) OVER (PARTITION BY g ORDER BY i)
        |      AS BIGINT), 0) AS cpp FROM pre),
        |pairavg AS (SELECT jr.g, jr.i AS j, kr.i AS k,
        |    CAST(kr.cp - jr.cpp AS DOUBLE) / (kr.cn - jr.cnp) AS m
        |  FROM pre2 jr JOIN pre2 kr ON jr.g = kr.g AND jr.i <= kr.i),
        |step1 AS (SELECT p.g, p.j, o.i, min(p.m) AS mn
        |  FROM pairavg p JOIN ord o
        |    ON p.g = o.g AND p.j <= o.i AND p.k >= o.i
        |  GROUP BY p.g, p.j, o.i),
        |step2 AS (SELECT g, i, max(mn) AS iso FROM step1
        |  GROUP BY g, i)
        |SELECT o.g AS l_linestatus, o.bin, o.n, o.pos,
        |  round(CAST(o.pos AS DOUBLE) / o.n, 6) AS rate,
        |  round(s.iso, 6) AS iso_rate
        |FROM ord o JOIN step2 s ON o.g = s.g AND o.i = s.i
        |ORDER BY l_linestatus, o.bin""".stripMargin,
    "q_gini" ->
      """WITH base AS (SELECT l_linestatus AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS v
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND CAST(l_extendedprice AS DOUBLE) >= 0.0),
        |r AS (SELECT g, v, CAST(row_number()
        |    OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS i
        |  FROM base)
        |SELECT g AS l_linestatus,
        |  round((2.0 * sum(i * v)
        |    - (CAST(count(*) AS BIGINT) + 1) * sum(v))
        |    / (CAST(count(*) AS BIGINT) * sum(v)), 6) AS gini,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(v), 2) AS total
        |FROM r GROUP BY g HAVING sum(v) > 0
        |ORDER BY l_linestatus""".stripMargin,
    "q_pareto" ->
      """WITH base AS (SELECT l_linestatus AS g, l_suppkey AS k,
        |    CAST(l_extendedprice AS DOUBLE) AS v
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_suppkey IS NOT NULL),
        |keys AS (SELECT g, k, sum(v) AS kv FROM base GROUP BY g, k),
        |w AS (SELECT g, k, kv,
        |    sum(kv) OVER (PARTITION BY g) AS tot,
        |    sum(kv) OVER (PARTITION BY g ORDER BY kv DESC, k
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    CAST(row_number() OVER (PARTITION BY g
        |      ORDER BY kv DESC, k) AS BIGINT) AS r
        |  FROM keys)
        |SELECT g AS l_linestatus, CAST(count(*) AS BIGINT) AS n_keys,
        |  round(max(tot), 2) AS total,
        |  CAST(min(CASE WHEN cum >= 0.8 * tot THEN r END) AS BIGINT)
        |    AS k_top,
        |  round(CAST(min(CASE WHEN cum >= 0.8 * tot THEN r END)
        |    AS DOUBLE) / count(*), 6) AS k_frac
        |FROM w WHERE tot > 0 GROUP BY g
        |ORDER BY l_linestatus""".stripMargin,
    // Replays 3 Huber IRLS passes as chained CTEs (the
    // q_logistic_quality pattern): OLS first, then min(1, d/|r|)
    // weights at the previous beta, 2x2 Cramer solves; coef at 4 dp
    // absorbs the elimination-vs-Cramer ULP gap.
    "q_huber" ->
      """WITH base AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |it1 AS (SELECT count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
        |    sum(y) AS sy, sum(x * y) AS sxy FROM base),
        |b1 AS (SELECT
        |    (sxx * sy - sx * sxy) / (n * sxx - sx * sx) AS b0,
        |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b1, n FROM it1),
        |w2 AS (SELECT x, y,
        |    CASE WHEN abs(y - (b.b0 + x * b.b1)) <= 5000.0 THEN 1.0
        |      ELSE 5000.0 / abs(y - (b.b0 + x * b.b1)) END AS w
        |  FROM base CROSS JOIN b1 b),
        |it2 AS (SELECT sum(w) AS sw, sum(w * x) AS swx,
        |    sum(w * x * x) AS swxx, sum(w * y) AS swy,
        |    sum(w * x * y) AS swxy FROM w2),
        |b2 AS (SELECT
        |    (swxx * swy - swx * swxy) / (sw * swxx - swx * swx) AS b0,
        |    (sw * swxy - swx * swy) / (sw * swxx - swx * swx) AS b1
        |  FROM it2),
        |w3 AS (SELECT x, y,
        |    CASE WHEN abs(y - (b.b0 + x * b.b1)) <= 5000.0 THEN 1.0
        |      ELSE 5000.0 / abs(y - (b.b0 + x * b.b1)) END AS w
        |  FROM base CROSS JOIN b2 b),
        |it3 AS (SELECT sum(w) AS sw, sum(w * x) AS swx,
        |    sum(w * x * x) AS swxx, sum(w * y) AS swy,
        |    sum(w * x * y) AS swxy FROM w3),
        |b3 AS (SELECT
        |    (swxx * swy - swx * swxy) / (sw * swxx - swx * swx) AS b0,
        |    (sw * swxy - swx * swy) / (sw * swxx - swx * swx) AS b1
        |  FROM it3)
        |SELECT 'intercept' AS feature, round(b0, 4) AS coef_r,
        |  (SELECT CAST(n AS BIGINT) FROM b1) AS n FROM b3
        |UNION ALL SELECT 'l_quantity', round(b1, 4),
        |  (SELECT CAST(n AS BIGINT) FROM b1) FROM b3
        |ORDER BY feature""".stripMargin,
    "q_conformal" ->
      """WITH base AS (SELECT l_linestatus AS g,
        |    abs(CAST(l_extendedprice AS DOUBLE)
        |      - CAST(l_quantity AS DOUBLE) * 3000.0) AS r
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE) * 3000.0)),
        |cells AS (SELECT g, r, CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY g, r),
        |w AS (SELECT g, r, c,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n,
        |    CAST(sum(c) OVER (PARTITION BY g ORDER BY r
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM cells),
        |k AS (SELECT *, CAST(ceil((n + 1) * 0.9) AS BIGINT) AS kk FROM w)
        |SELECT g AS l_linestatus, CAST(max(n) AS BIGINT) AS n,
        |  CAST(max(kk) AS BIGINT) AS q_rank,
        |  min(CASE WHEN cum >= kk THEN r END) AS qhat
        |FROM k GROUP BY g ORDER BY l_linestatus""".stripMargin,
    "q_anova" ->
      """WITH base AS (SELECT l_linestatus AS g, l_returnflag AS l,
        |    CAST(l_quantity AS DOUBLE) AS x
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT g, l, CAST(count(*) AS BIGINT) AS cn,
        |    sum(x) AS s, sum(x * x) AS ssq
        |  FROM base GROUP BY g, l),
        |agg AS (SELECT g, CAST(sum(cn) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS k,
        |    sum(s) AS st, sum(s * s / cn) AS a, sum(ssq) AS t
        |  FROM cells GROUP BY g)
        |SELECT g AS l_linestatus,
        |  round(((a - st * st / n) / (k - 1)) / ((t - a) / (n - k)), 6)
        |    AS f_stat,
        |  k - 1 AS df1, n - k AS df2,
        |  round(a - st * st / n, 6) AS ss_between,
        |  round(t - a, 6) AS ss_within, n
        |FROM agg WHERE k >= 2 AND n > k AND (t - a) > 0
        |ORDER BY l_linestatus""".stripMargin,
    "q_kruskal" ->
      """WITH base AS (SELECT l_linestatus AS g, l_returnflag AS l,
        |    CAST(l_quantity AS DOUBLE) AS x
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT g, x AS v, l, CAST(count(*) AS BIGINT) AS cl
        |  FROM base GROUP BY g, x, l),
        |r AS (SELECT g, v, l, cl,
        |    CAST(sum(cl) OVER (PARTITION BY g, v) AS BIGINT) AS ct,
        |    CAST(sum(cl) OVER (PARTITION BY g ORDER BY v
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM cells),
        |mid AS (SELECT g, l, cl, ct,
        |    (cum - ct) + (ct + 1) / 2.0 AS mid FROM r),
        |lvl AS (SELECT g, l, CAST(sum(cl) AS BIGINT) AS nl,
        |    sum(cl * mid) AS rl,
        |    CAST(sum((ct * ct - 1) * cl) AS BIGINT) AS tie
        |  FROM mid GROUP BY g, l),
        |agg AS (SELECT g, CAST(sum(nl) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS k,
        |    sum(rl * rl / nl) AS r2, CAST(sum(tie) AS BIGINT) AS ties
        |  FROM lvl GROUP BY g)
        |SELECT g AS l_linestatus,
        |  round((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
        |      * r2 - 3.0 * (CAST(n AS DOUBLE) + 1.0))
        |    / (1.0 - ties / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |      * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))), 6) AS h_stat,
        |  k - 1 AS dof, n
        |FROM agg
        |WHERE k >= 2 AND (1.0 - ties / (CAST(n AS DOUBLE)
        |  * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))) > 0
        |ORDER BY l_linestatus""".stripMargin,
    "q_cohen_kappa" ->
      """WITH base AS (SELECT
        |    CASE WHEN l_returnflag = 'N' THEN 'keep' ELSE 'return' END
        |      AS a,
        |    CASE WHEN l_linestatus = 'O' THEN 'keep' ELSE 'return' END
        |      AS b
        |  FROM lineitem WHERE l_orderkey < 100000),
        |cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n
        |  FROM base GROUP BY a, b),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN a = b THEN n ELSE 0 END) AS BIGINT)
        |      AS diag FROM cells),
        |ra AS (SELECT a AS l, CAST(sum(n) AS BIGINT) AS na
        |  FROM cells GROUP BY a),
        |rb AS (SELECT b AS l, CAST(sum(n) AS BIGINT) AS nb
        |  FROM cells GROUP BY b),
        |pe AS (SELECT coalesce(sum(CAST(na AS DOUBLE) * nb), 0.0) AS pn
        |  FROM ra JOIN rb USING (l))
        |SELECT
        |  CASE WHEN pn / (CAST(t.n AS DOUBLE) * t.n) < 1.0
        |    THEN round((CAST(diag AS DOUBLE) / t.n
        |      - pn / (CAST(t.n AS DOUBLE) * t.n))
        |      / (1.0 - pn / (CAST(t.n AS DOUBLE) * t.n)), 6) END AS kappa,
        |  round(CAST(diag AS DOUBLE) / t.n, 6) AS po,
        |  round(pn / (CAST(t.n AS DOUBLE) * t.n), 6) AS pe, t.n AS n
        |FROM tot t, pe""".stripMargin,
    "q_welch_group" ->
      s"""WITH base AS (SELECT l_linestatus AS g,
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS c,
        |    CAST(l_extendedprice AS DOUBLE) AS v
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |agged AS (SELECT g,
        |    count(CASE WHEN c = 'a' THEN 1 END) AS n_a,
        |    count(CASE WHEN c = 'b' THEN 1 END) AS n_b,
        |    avg(CASE WHEN c = 'a' THEN v END) AS ma,
        |    avg(CASE WHEN c = 'b' THEN v END) AS mb,
        |    var_samp(CASE WHEN c = 'a' THEN v END) AS va,
        |    var_samp(CASE WHEN c = 'b' THEN v END) AS vb
        |  FROM base GROUP BY g),
        |st AS (SELECT g, n_a, n_b, ma, mb,
        |    va / n_a AS sea, vb / n_b AS seb FROM agged
        |  WHERE n_a >= 2 AND n_b >= 2 AND va / n_a + vb / n_b > 0.0),
        |t AS (SELECT g, n_a, n_b, ma, mb, sea, seb,
        |    round((ma - mb) / sqrt(sea + seb), 6) AS t_stat,
        |    round((sea + seb) * (sea + seb)
        |      / (sea * sea / (n_a - 1) + seb * seb / (n_b - 1)), 2)
        |      AS dof FROM st),
        |ye AS (SELECT g, n_a, n_b, ma, mb, t_stat, dof,
        |    abs(t_stat) / sqrt(2.0) AS y FROM t)
        |SELECT g AS l_linestatus, t_stat, dof,
        |  round_even(${codyErfcSql("y")} * 1000000.0, 0) / 1000000.0
        |    AS p_value,
        |  round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
        |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b
        |FROM ye ORDER BY l_linestatus""".stripMargin,
    // Training replay (the q_bpe_merges_fixed CTEs, word column carried
    // through) plus ONE more list_reduce rewrite with m3: the encoded
    // symbol sequence of every vocabulary word.
    "q_bpe_encode_fixed" ->
      """WITH tok AS (SELECT unnest(list_filter(
        |    regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |    x -> x <> '')) AS t FROM documents),
        |v0 AS (SELECT t AS w, count(*) AS wc FROM tok
        |  WHERE regexp_matches(t, '^[a-z]+$') GROUP BY t),
        |s0 AS (SELECT w, string_split(w, '') AS sy, wc FROM v0),
        |p1 AS (SELECT unnest(list_transform(range(1, len(sy)),
        |    j -> sy[j] || ' ' || sy[j+1])) AS pair, wc
        |  FROM s0 WHERE len(sy) >= 2),
        |g1 AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n
        |  FROM p1 GROUP BY pair),
        |m1 AS (SELECT split_part(pair, ' ', 1) AS l,
        |    split_part(pair, ' ', 2) AS r, n
        |  FROM g1 ORDER BY n DESC, l ASC, r ASC LIMIT 1),
        |s1 AS (SELECT w, string_split(list_reduce(sy,
        |    (acc, x) -> CASE WHEN x = m.r
        |        AND (acc = m.l OR acc LIKE '% ' || m.l)
        |      THEN left(acc, length(acc) - length(m.l)) || m.l || m.r
        |      ELSE acc || ' ' || x END), ' ') AS sy, wc
        |  FROM s0, m1 m),
        |p2 AS (SELECT unnest(list_transform(range(1, len(sy)),
        |    j -> sy[j] || ' ' || sy[j+1])) AS pair, wc
        |  FROM s1 WHERE len(sy) >= 2),
        |g2 AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n
        |  FROM p2 GROUP BY pair),
        |m2 AS (SELECT split_part(pair, ' ', 1) AS l,
        |    split_part(pair, ' ', 2) AS r, n
        |  FROM g2 ORDER BY n DESC, l ASC, r ASC LIMIT 1),
        |s2 AS (SELECT w, string_split(list_reduce(sy,
        |    (acc, x) -> CASE WHEN x = m.r
        |        AND (acc = m.l OR acc LIKE '% ' || m.l)
        |      THEN left(acc, length(acc) - length(m.l)) || m.l || m.r
        |      ELSE acc || ' ' || x END), ' ') AS sy, wc
        |  FROM s1, m2 m),
        |p3 AS (SELECT unnest(list_transform(range(1, len(sy)),
        |    j -> sy[j] || ' ' || sy[j+1])) AS pair, wc
        |  FROM s2 WHERE len(sy) >= 2),
        |g3 AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n
        |  FROM p3 GROUP BY pair),
        |m3 AS (SELECT split_part(pair, ' ', 1) AS l,
        |    split_part(pair, ' ', 2) AS r, n
        |  FROM g3 ORDER BY n DESC, l ASC, r ASC LIMIT 1),
        |s3 AS (SELECT w, list_reduce(sy,
        |    (acc, x) -> CASE WHEN x = m.r
        |        AND (acc = m.l OR acc LIKE '% ' || m.l)
        |      THEN left(acc, length(acc) - length(m.l)) || m.l || m.r
        |      ELSE acc || ' ' || x END) AS enc, wc
        |  FROM s2, m3 m)
        |SELECT w AS token, enc AS encoded,
        |  CAST(len(string_split(enc, ' ')) AS BIGINT) AS n_pieces,
        |  CAST(wc AS BIGINT) AS wc
        |FROM s3 ORDER BY token""".stripMargin,
    // Replays the K-M step integral: the q_km_curve survival frame
    // truncated at tau, lag windows for the step widths, the tail term
    // from the last curve point.
    "q_rmst" ->
      """WITH base AS (SELECT l_linestatus AS g,
        |    CAST(l_quantity AS DOUBLE) AS t,
        |    (l_returnflag <> 'N') AS e
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND CAST(l_quantity AS DOUBLE) >= 0.0
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT g, t,
        |    CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY g, t),
        |w AS (SELECT g, t, d, c,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT)
        |      - CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS BIGINT) AS nr
        |  FROM cells),
        |s AS (SELECT g, t,
        |    round(CASE WHEN d = nr THEN 0.0
        |      ELSE exp(sum(CASE WHEN d = nr THEN 0.0
        |        ELSE ln(1.0 - CAST(d AS DOUBLE) / nr) END)
        |        OVER (PARTITION BY g ORDER BY t ROWS BETWEEN
        |          UNBOUNDED PRECEDING AND CURRENT ROW)) END, 6) AS surv
        |  FROM w),
        |trunc AS (SELECT g, t, surv,
        |    coalesce(lag(t) OVER (PARTITION BY g ORDER BY t), 0.0) AS tp,
        |    coalesce(lag(surv) OVER (PARTITION BY g ORDER BY t), 1.0)
        |      AS sp
        |  FROM s WHERE t <= 30.0)
        |SELECT g AS l_linestatus, 30.0 AS tau,
        |  round(sum(sp * (t - tp))
        |    + arg_max(surv, t) * (30.0 - max(t)), 6) AS rmst,
        |  count(*) AS n_times
        |FROM trunc GROUP BY g ORDER BY l_linestatus""".stripMargin,
    // Replays the Nelson–Aalen-increment piecewise rates: the same
    // at-risk window as q_km_hazard plus a lag for interval starts.
    "q_hazard_rates" ->
      """WITH base AS (SELECT l_linestatus AS g,
        |    CAST(l_quantity AS DOUBLE) AS t,
        |    (l_returnflag <> 'N') AS e
        |  FROM lineitem WHERE l_orderkey < 100000
        |    AND l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND CAST(l_quantity AS DOUBLE) >= 0.0
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT g, t,
        |    CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY g, t),
        |w AS (SELECT g, t, d, c,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT)
        |      - CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS BIGINT) AS nr,
        |    coalesce(lag(t) OVER (PARTITION BY g ORDER BY t), 0.0) AS tp
        |  FROM cells)
        |SELECT g AS l_linestatus, tp AS t_start, t AS t_end,
        |  nr AS n_risk, d AS n_event,
        |  CASE WHEN t - tp > 0.0
        |    THEN round(CAST(d AS DOUBLE) / (nr * (t - tp)), 6)
        |    ELSE NULL END AS rate
        |FROM w ORDER BY l_linestatus, t_end""".stripMargin,
    // Replays every Cox/Breslow Newton step as chained CTEs: per-step
    // cells aggregation (β from the previous step cross-joined in),
    // t-DESC window suffix sums for the risk-set moments m0/m1/m2,
    // score u = Σ(s − d·m1/m0) and information i = Σ d·(m2/m0 −
    // (m1/m0)²) over event times, β' = β + u/i — then a final pass at
    // β₃ for the observed information (→ SE) and the log-likelihood.
    // The baseline-hazard replay: the shared Newton CTEs give b3, then
    // one more cells pass at the fitted beta, the t-DESC m0 suffix
    // window, and the ascending d/m0 cumulative — h0 per event time,
    // s0 = exp(−H0) at the UNROUNDED running sum.
    "q_cox_baseline" ->
      (coxPh1NewtonSql + """
        |cb AS (SELECT t, sum(CASE WHEN e THEN 1 ELSE 0 END) AS d,
        |    sum(exp(b.b * x)) AS r0
        |  FROM base CROSS JOIN b3 b GROUP BY t),
        |wb AS (SELECT t, d,
        |    sum(r0) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS m0
        |  FROM cb),
        |hb AS (SELECT t, d,
        |    sum(CASE WHEN d > 0 AND m0 > 0.0
        |      THEN CAST(d AS DOUBLE) / m0 ELSE 0.0 END)
        |      OVER (ORDER BY t ASC ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND CURRENT ROW) AS h
        |  FROM wb)
        |SELECT t, CAST(d AS BIGINT) AS n_event,
        |  round_even(h * 1000000.0, 0) / 1000000.0 AS h0,
        |  round_even(exp(-h) * 1000000.0, 0) / 1000000.0 AS s0
        |FROM hb WHERE d > 0 ORDER BY t""".stripMargin),
    "q_cox_ph" ->
      (coxPh1NewtonSql + """
        |cf AS (SELECT t, any_value(b.b) AS pb,
        |    sum(CASE WHEN e THEN 1 ELSE 0 END) AS d,
        |    sum(CASE WHEN e THEN x ELSE 0.0 END) AS s,
        |    sum(exp(b.b * x)) AS r0, sum(x * exp(b.b * x)) AS r1,
        |    sum(x * x * exp(b.b * x)) AS r2
        |  FROM base CROSS JOIN b3 b GROUP BY t),
        |wf AS (SELECT t, d, s, pb,
        |    sum(r0) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS m0,
        |    sum(r1) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS m1,
        |    sum(r2) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS m2
        |  FROM cf),
        |nf AS (SELECT
        |    sum(d * (m2 / m0 - (m1 / m0) * (m1 / m0))) AS i,
        |    sum(pb * s - d * ln(m0)) AS ll FROM wf WHERE d > 0),
        |nn AS (SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS ne
        |  FROM base)
        |SELECT round_even(b3.b * 1000000.0, 0) / 1000000.0 AS coef_r,
        |  round_even(exp(b3.b) * 1000000.0, 0) / 1000000.0 AS hr_r,
        |  round_even(sqrt(1.0 / nf.i) * 1000000.0, 0) / 1000000.0
        |    AS se_r,
        |  round_even(nf.ll * 100.0, 0) / 100.0 AS ll_r,
        |  round_even((SELECT ll0 FROM n1) * 100.0, 0) / 100.0 AS ll0_r,
        |  nn.n, nn.ne AS n_events
        |FROM b3, nf, nn""".stripMargin),
    // Replays the grouped closed-form fit on the parity halves and the
    // same KL arithmetic shape (ln + squared-difference ratio).
    "q_fit_drift" ->
      """WITH a AS (SELECT avg(l_extendedprice) AS m,
        |    stddev_pop(l_extendedprice) AS s FROM lineitem
        |  WHERE l_orderkey % 2 = 0),
        |b AS (SELECT avg(l_extendedprice) AS m,
        |    stddev_pop(l_extendedprice) AS s FROM lineitem
        |  WHERE l_orderkey % 2 = 1)
        |SELECT round(a.m, 4) AS mean_a, round(a.s, 4) AS std_a,
        |  round(b.m, 4) AS mean_b, round(b.s, 4) AS std_b,
        |  round(ln(b.s / a.s) + (a.s * a.s + (a.m - b.m) * (a.m - b.m))
        |    / (2 * b.s * b.s) - 0.5, 8) AS kl_ab,
        |  round(ln(a.s / b.s) + (b.s * b.s + (b.m - a.m) * (b.m - a.m))
        |    / (2 * a.s * a.s) - 0.5, 8) AS kl_ba
        |FROM a, b""".stripMargin,
    "q_sketch_bottomk" ->
      """WITH h AS (SELECT lang, doc_id,
        |  md5(CAST(doc_id AS VARCHAR)) AS hh FROM documents),
        |r AS (SELECT lang, doc_id, hh, CAST(row_number() OVER
        |    (PARTITION BY lang ORDER BY hh, doc_id) AS BIGINT) AS rk,
        |  count(*) OVER (PARTITION BY lang) AS n FROM h),
        |e AS (SELECT lang,
        |  CASE WHEN min(n) < 8 THEN CAST(min(n) AS DOUBLE)
        |       ELSE 7.0 / ((CAST(('0x' || substr(max(CASE WHEN rk = 8
        |           THEN hh END), 1, 8)) AS BIGINT) + 1.0) / 4294967296.0)
        |  END AS est FROM r WHERE rk <= 8 GROUP BY lang)
        |SELECT r.lang, round(e.est, 4) AS est_r, r.rk, r.doc_id
        |FROM r JOIN e USING (lang) WHERE r.rk <= 8
        |ORDER BY r.lang, r.rk""".stripMargin,
    "q_decontam_bloom" ->
      """WITH tok AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |    x -> x <> '') AS t FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(len(t) - 7),
        |    i -> array_to_string(t[i+1:i+8], ' '))) AS gram
        |  FROM tok WHERE len(t) >= 8),
        |bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
        |SELECT g.doc_id AS id, count(*) AS n_hits,
        |  count(DISTINCT g.gram) AS n_uniq_grams
        |FROM g JOIN bg USING (gram)
        |GROUP BY g.doc_id ORDER BY id""".stripMargin,
    "q_hist_merge" ->
      """SELECT least(greatest(CAST(floor(value / 50.0) AS BIGINT), 0), 9)
        |    AS bin, count(*) AS cnt
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1 ORDER BY bin""".stripMargin,
    "q_stream_join" ->
      """SELECT l.event_id AS click_id, l.user_id,
        |  r.event_id AS purchase_id, round(r.value, 6) AS purchase_value
        |FROM events l JOIN events r ON l.user_id = r.user_id
        |  AND l.event_type = 'click' AND r.event_type = 'purchase'
        |  AND epoch_us(r.ts) BETWEEN epoch_us(l.ts) - 3600000000
        |    AND epoch_us(l.ts)
        |ORDER BY click_id, purchase_id""".stripMargin,
    "q_grouped_ols" ->
      """WITH s AS (SELECT l_returnflag, count(*) AS n,
        |    avg(l_quantity) AS mx, avg(l_extendedprice) AS my,
        |    var_pop(l_quantity) AS vx, var_pop(l_extendedprice) AS vy,
        |    covar_pop(l_quantity, l_extendedprice) AS cxy
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |  GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round(cxy / vx, 4) AS slope_r,
        |  round(my - cxy / vx * mx, 4) AS intercept_r,
        |  round(cxy * cxy / (vx * vy), 6) AS r2_r,
        |  round(sqrt(n * vy * (1.0 - cxy * cxy / (vx * vy)) / (n - 2.0)),
        |    4) AS resid_std_r,
        |  round((cxy / vx) / sqrt(
        |    (n * vy * (1.0 - cxy * cxy / (vx * vy)) / (n - 2.0)) / (n * vx)),
        |    2) AS t_r
        |FROM s WHERE n >= 3 AND vx > 0 AND vy > 0
        |ORDER BY l_returnflag""".stripMargin,
    "q_ols_multi" ->
      """WITH g AS (SELECT count(*) AS n,
        |    sum(l_quantity) AS s1, sum(l_discount) AS s2,
        |    sum(l_quantity * l_quantity) AS s11,
        |    sum(l_quantity * l_discount) AS s12,
        |    sum(l_discount * l_discount) AS s22,
        |    sum(l_extendedprice) AS t0,
        |    sum(l_quantity * l_extendedprice) AS t1,
        |    sum(l_discount * l_extendedprice) AS t2
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_discount IS NOT NULL AND l_extendedprice IS NOT NULL),
        |d AS (SELECT
        |    n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s12 - s11 * s2) AS det,
        |    t0 * (s11 * s22 - s12 * s12) - s1 * (t1 * s22 - s12 * t2)
        |      + s2 * (t1 * s12 - s11 * t2) AS det0,
        |    n * (t1 * s22 - s12 * t2) - t0 * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * t2 - t1 * s2) AS det1,
        |    n * (s11 * t2 - t1 * s12) - s1 * (s1 * t2 - t1 * s2)
        |      + t0 * (s1 * s12 - s11 * s2) AS det2
        |  FROM g)
        |SELECT feature, coef_r FROM (
        |  SELECT 'intercept' AS feature,
        |    round_even(det0 / det * 100.0, 0) / 100.0 AS coef_r FROM d
        |  UNION ALL SELECT 'l_quantity',
        |    round_even(det1 / det * 100.0, 0) / 100.0 FROM d
        |  UNION ALL SELECT 'l_discount',
        |    round_even(det2 / det * 100.0, 0) / 100.0 FROM d)
        |ORDER BY feature""".stripMargin,
    "q_logistic_quality" ->
      """WITH base AS (SELECT l_discount AS x,
        |    CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
        |  FROM lineitem
        |  WHERE l_discount IS NOT NULL AND l_returnflag IS NOT NULL),
        |it1 AS (SELECT sum(0.25) AS h00, sum(0.25 * x) AS h01,
        |    sum(0.25 * x * x) AS h11, sum(y - 0.5) AS g0,
        |    sum((y - 0.5) * x) AS g1, count(*) AS n FROM base),
        |b1 AS (SELECT (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
        |    (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1, n
        |  FROM it1),
        |p2 AS (SELECT y, x, b.b0 AS pb0, b.b1 AS pb1,
        |    1.0 / (1.0 + exp(-(b.b0 + b.b1 * x))) AS p
        |  FROM base CROSS JOIN b1 b),
        |it2 AS (SELECT any_value(pb0) AS pb0, any_value(pb1) AS pb1,
        |    sum(p * (1.0 - p)) AS h00, sum(p * (1.0 - p) * x) AS h01,
        |    sum(p * (1.0 - p) * x * x) AS h11,
        |    sum(y - p) AS g0, sum((y - p) * x) AS g1 FROM p2),
        |b2 AS (SELECT
        |    pb0 + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
        |    pb1 + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1
        |  FROM it2),
        |p3 AS (SELECT y, x, b.b0 AS pb0, b.b1 AS pb1,
        |    1.0 / (1.0 + exp(-(b.b0 + b.b1 * x))) AS p
        |  FROM base CROSS JOIN b2 b),
        |it3 AS (SELECT any_value(pb0) AS pb0, any_value(pb1) AS pb1,
        |    sum(p * (1.0 - p)) AS h00, sum(p * (1.0 - p) * x) AS h01,
        |    sum(p * (1.0 - p) * x * x) AS h11,
        |    sum(y - p) AS g0, sum((y - p) * x) AS g1 FROM p3),
        |b3 AS (SELECT
        |    pb0 + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
        |    pb1 + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1
        |  FROM it3),
        |ll AS (SELECT sum(y * z - (greatest(z, 0.0)
        |      + ln(1.0 + exp(-abs(z))))) AS ll
        |  FROM (SELECT y, b.b0 + b.b1 * x AS z FROM base CROSS JOIN b3 b))
        |SELECT round_even(b3.b0 * 1e6, 0) / 1e6 AS b0_r,
        |  round_even(b3.b1 * 1e6, 0) / 1e6 AS b1_r,
        |  round_even(ll.ll * 100.0, 0) / 100.0 AS ll_r,
        |  (SELECT n FROM b1) AS n
        |FROM b3, ll""".stripMargin,
    "q_bpe_pairs" ->
      """WITH tok AS (SELECT unnest(list_filter(
        |    regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |    x -> x <> '')) AS t FROM documents),
        |w AS (SELECT t, count(*) AS wc FROM tok
        |  WHERE regexp_matches(t, '^[a-z]+$') GROUP BY t),
        |p AS (SELECT unnest(list_transform(range(1, len(t)),
        |    i -> substr(t, i, 2))) AS pair, wc FROM w WHERE len(t) >= 2)
        |SELECT pair, CAST(sum(wc) AS BIGINT) AS n FROM p
        |GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 50""".stripMargin,
    // Replays 3 greedy BPE merge rounds: per round a pair-count
    // aggregation over the space-joined symbol lists, the argmax with
    // the Scala tie break (n desc, l asc, r asc — binary collation both
    // engines), and the left-to-right non-overlapping rewrite as a
    // list_reduce fold (merging into the accumulator's LAST token is
    // equivalent to the scan because a merged token l||r can never
    // equal l again — r is non-empty).
    "q_bpe_merges_fixed" ->
      """WITH tok AS (SELECT unnest(list_filter(
        |    regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |    x -> x <> '')) AS t FROM documents),
        |v0 AS (SELECT t AS w, count(*) AS wc FROM tok
        |  WHERE regexp_matches(t, '^[a-z]+$') GROUP BY t),
        |s0 AS (SELECT string_split(w, '') AS sy, wc FROM v0),
        |p1 AS (SELECT unnest(list_transform(range(1, len(sy)),
        |    j -> sy[j] || ' ' || sy[j+1])) AS pair, wc
        |  FROM s0 WHERE len(sy) >= 2),
        |g1 AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n
        |  FROM p1 GROUP BY pair),
        |m1 AS (SELECT split_part(pair, ' ', 1) AS l,
        |    split_part(pair, ' ', 2) AS r, n
        |  FROM g1 ORDER BY n DESC, l ASC, r ASC LIMIT 1),
        |s1 AS (SELECT string_split(list_reduce(sy,
        |    (acc, x) -> CASE WHEN x = m.r
        |        AND (acc = m.l OR acc LIKE '% ' || m.l)
        |      THEN left(acc, length(acc) - length(m.l)) || m.l || m.r
        |      ELSE acc || ' ' || x END), ' ') AS sy, wc
        |  FROM s0, m1 m),
        |p2 AS (SELECT unnest(list_transform(range(1, len(sy)),
        |    j -> sy[j] || ' ' || sy[j+1])) AS pair, wc
        |  FROM s1 WHERE len(sy) >= 2),
        |g2 AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n
        |  FROM p2 GROUP BY pair),
        |m2 AS (SELECT split_part(pair, ' ', 1) AS l,
        |    split_part(pair, ' ', 2) AS r, n
        |  FROM g2 ORDER BY n DESC, l ASC, r ASC LIMIT 1),
        |s2 AS (SELECT string_split(list_reduce(sy,
        |    (acc, x) -> CASE WHEN x = m.r
        |        AND (acc = m.l OR acc LIKE '% ' || m.l)
        |      THEN left(acc, length(acc) - length(m.l)) || m.l || m.r
        |      ELSE acc || ' ' || x END), ' ') AS sy, wc
        |  FROM s1, m2 m),
        |p3 AS (SELECT unnest(list_transform(range(1, len(sy)),
        |    j -> sy[j] || ' ' || sy[j+1])) AS pair, wc
        |  FROM s2 WHERE len(sy) >= 2),
        |g3 AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n
        |  FROM p3 GROUP BY pair),
        |m3 AS (SELECT split_part(pair, ' ', 1) AS l,
        |    split_part(pair, ' ', 2) AS r, n
        |  FROM g3 ORDER BY n DESC, l ASC, r ASC LIMIT 1)
        |SELECT 1 AS merge_rank, l AS "left", r AS "right", n FROM m1
        |UNION ALL SELECT 2, l, r, n FROM m2
        |UNION ALL SELECT 3, l, r, n FROM m3
        |ORDER BY merge_rank""".stripMargin,
    "q_bigram_logprob" ->
      """WITH t AS (SELECT doc_id, list_filter(
        |    regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |    x -> x <> '') AS w FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS b FROM t WHERE len(w) >= 2),
        |big AS (SELECT b, count(*) AS cb FROM bg GROUP BY b),
        |m1 AS (SELECT split_part(b, ' ', 1) AS w1, sum(cb) AS c1
        |  FROM big GROUP BY 1),
        |uni AS (SELECT unnest(w) AS token FROM t),
        |freq AS (SELECT token, count(*) AS cu FROM uni GROUP BY token),
        |tot AS (SELECT CAST(sum(cu) AS DOUBLE) AS nt FROM freq),
        |tf AS (SELECT doc_id, b, count(*) AS tf FROM bg
        |  WHERE doc_id < 100 GROUP BY doc_id, b)
        |SELECT tf.doc_id AS id, CAST(sum(tf.tf) AS BIGINT) AS n_bigrams,
        |  round(sum(tf.tf * ln(0.7 * big.cb / m1.c1
        |      + (1.0 - 0.7) * freq.cu / tot.nt))
        |    / CAST(sum(tf.tf) AS DOUBLE), 6) AS mean_logprob
        |FROM tf JOIN big USING (b)
        |  JOIN m1 ON m1.w1 = split_part(tf.b, ' ', 1)
        |  JOIN freq ON freq.token = split_part(tf.b, ' ', 2), tot
        |GROUP BY tf.doc_id ORDER BY id""".stripMargin,
    // Trigram stupid-backoff replay: the same three corpus count
    // tables, key splits, and the CASE ladder with 0.4 * 0.4 written
    // as the product (so both engines round the constant identically).
    "q_trigram_logprob" ->
      """WITH t AS (SELECT doc_id, list_filter(
        |    regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |    x -> x <> '') AS w FROM documents),
        |tg AS (SELECT doc_id, unnest(list_transform(
        |    range(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tri
        |  FROM t WHERE len(w) >= 3),
        |tric AS (SELECT tri, count(*) AS c3 FROM tg GROUP BY tri),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS b FROM t
        |  WHERE len(w) >= 2),
        |big AS (SELECT b, count(*) AS cb FROM bg GROUP BY b),
        |uni AS (SELECT unnest(w) AS token FROM t),
        |freq AS (SELECT token, count(*) AS cu FROM uni GROUP BY token),
        |tot AS (SELECT CAST(sum(cu) AS DOUBLE) AS nt FROM freq),
        |tf AS (SELECT doc_id, tri, count(*) AS tf FROM tg
        |  WHERE doc_id < 100 GROUP BY doc_id, tri),
        |k AS (SELECT doc_id, tri, tf,
        |    split_part(tri, ' ', 1) || ' ' || split_part(tri, ' ', 2)
        |      AS b12,
        |    split_part(tri, ' ', 2) || ' ' || split_part(tri, ' ', 3)
        |      AS b23,
        |    split_part(tri, ' ', 2) AS w2,
        |    split_part(tri, ' ', 3) AS w3 FROM tf),
        |j AS (SELECT k.doc_id AS doc_id, k.tf AS tf,
        |    CASE WHEN tric.c3 IS NOT NULL AND b1.cb IS NOT NULL
        |      THEN CAST(tric.c3 AS DOUBLE) / b1.cb
        |    WHEN b2.cb IS NOT NULL AND f2.cu IS NOT NULL
        |      THEN 0.4 * b2.cb / f2.cu
        |    ELSE 0.4 * 0.4 * f3.cu / tot.nt END AS p
        |  FROM k LEFT JOIN tric ON tric.tri = k.tri
        |    LEFT JOIN big b1 ON b1.b = k.b12
        |    LEFT JOIN big b2 ON b2.b = k.b23
        |    LEFT JOIN freq f2 ON f2.token = k.w2
        |    JOIN freq f3 ON f3.token = k.w3, tot)
        |SELECT doc_id AS id, CAST(sum(tf) AS BIGINT) AS n_trigrams,
        |  round(sum(tf * ln(p)) / CAST(sum(tf) AS DOUBLE), 6)
        |    AS mean_logprob
        |FROM j GROUP BY doc_id ORDER BY id""".stripMargin,
    "q_containment" ->
      """WITH t AS (SELECT doc_id, list_filter(
        |    regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |    x -> x <> '') AS w FROM documents),
        |g0 AS (SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
        |  FROM t WHERE len(w) >= 3),
        |sz AS (SELECT doc_id, count(*) AS sz FROM g0 GROUP BY doc_id),
        |ok AS (SELECT g FROM g0 GROUP BY g
        |  HAVING count(*) BETWEEN 2 AND 200),
        |k AS (SELECT doc_id, g FROM g0 JOIN ok USING (g)),
        |sh AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    count(*) AS shared
        |  FROM k a JOIN k b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT sh.id_a, sh.id_b, sh.shared, sa.sz AS size_a,
        |  sb.sz AS size_b,
        |  round(sh.shared / CAST(sa.sz AS DOUBLE), 6) AS c_a_r,
        |  round(sh.shared / CAST(sb.sz AS DOUBLE), 6) AS c_b_r
        |FROM sh JOIN sz sa ON sh.id_a = sa.doc_id
        |  JOIN sz sb ON sh.id_b = sb.doc_id
        |WHERE greatest(sh.shared / CAST(sa.sz AS DOUBLE),
        |  sh.shared / CAST(sb.sz AS DOUBLE)) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "q_rank_transform" ->
      """WITH v AS (SELECT event_id, value FROM events
        |  WHERE value IS NOT NULL AND NOT isnan(value)),
        |r AS (SELECT event_id,
        |    rank() OVER (ORDER BY value) AS rk,
        |    count(*) OVER () AS n FROM v)
        |SELECT event_id, round((rk - 0.5) / n, 6) AS u_r,
        |  round(-ln(1.0 - (rk - 0.5) / n), 6) AS x_r
        |FROM r ORDER BY event_id""".stripMargin,
    "q_skew_report" ->
      """WITH c AS (SELECT user_id, count(*) AS cnt FROM events
        |  GROUP BY user_id),
        |s AS (SELECT count(*) AS n_keys,
        |    CAST(sum(cnt) AS BIGINT) AS n_rows, max(cnt) AS max_cnt,
        |    avg(cnt) AS mean_raw,
        |    quantile_cont(cnt, 0.5) AS p50_cnt,
        |    quantile_cont(cnt, 0.9) AS p90_cnt,
        |    quantile_cont(cnt, 0.99) AS p99_cnt
        |  FROM c)
        |SELECT n_keys, n_rows, max_cnt, round(mean_raw, 4) AS mean_cnt,
        |  p50_cnt, p90_cnt, p99_cnt,
        |  round(CAST(max_cnt AS DOUBLE) * n_keys / n_rows, 4)
        |    AS skew_ratio,
        |  greatest(1, CAST(ceil(CAST(max_cnt AS DOUBLE) * 32 / n_rows)
        |    AS BIGINT)) AS salt_suggest
        |FROM s""".stripMargin,
    "q_key_skew" ->
      """WITH tot AS (SELECT count(*) AS n FROM events)
        |SELECT user_id, count(*) AS n_rows,
        |  round(count(*) / CAST(tot.n AS DOUBLE), 6) AS share
        |FROM events, tot GROUP BY user_id, tot.n
        |ORDER BY n_rows DESC, user_id ASC LIMIT 20""".stripMargin,
    "q_pagerank" ->
      """WITH base AS (SELECT DISTINCT 's' || l_suppkey AS a,
        |    'p' || l_partkey AS b FROM lineitem
        |  WHERE l_orderkey < 50000),
        |e AS (SELECT a AS src, b AS dst FROM base
        |  UNION ALL SELECT b, a FROM base),
        |deg AS (SELECT src, count(*) AS dg FROM e GROUP BY src),
        |nodes AS (SELECT DISTINCT src AS node FROM e
        |  UNION SELECT DISTINCT dst FROM e),
        |r1 AS (SELECT n.node, 0.15 + 0.85 * coalesce(c.s, 0.0) AS r
        |  FROM nodes n LEFT JOIN (SELECT e.dst, sum(1.0 / d.dg) AS s
        |    FROM e JOIN deg d ON e.src = d.src GROUP BY e.dst) c
        |  ON n.node = c.dst),
        |r2 AS (SELECT n.node, 0.15 + 0.85 * coalesce(c.s, 0.0) AS r
        |  FROM nodes n LEFT JOIN (SELECT e.dst, sum(p.r / d.dg) AS s
        |    FROM e JOIN deg d ON e.src = d.src
        |    JOIN r1 p ON p.node = e.src GROUP BY e.dst) c
        |  ON n.node = c.dst),
        |r3 AS (SELECT n.node, 0.15 + 0.85 * coalesce(c.s, 0.0) AS r
        |  FROM nodes n LEFT JOIN (SELECT e.dst, sum(p.r / d.dg) AS s
        |    FROM e JOIN deg d ON e.src = d.src
        |    JOIN r2 p ON p.node = e.src GROUP BY e.dst) c
        |  ON n.node = c.dst)
        |SELECT node, round(r, 6) AS rank_r FROM r3
        |ORDER BY node""".stripMargin,
    "q_degree_dist" ->
      """WITH base AS (SELECT DISTINCT 's' || l_suppkey AS a,
        |    'p' || l_partkey AS b FROM lineitem
        |  WHERE l_orderkey < 50000),
        |e AS (SELECT a AS src, b AS dst FROM base
        |  UNION ALL SELECT b, a FROM base),
        |d AS (SELECT 'out' AS kind,
        |    CAST(count(*) AS BIGINT) AS degree FROM e GROUP BY src
        |  UNION ALL SELECT 'in', CAST(count(*) AS BIGINT) FROM e
        |  GROUP BY dst)
        |SELECT kind, degree, CAST(count(*) AS BIGINT) AS n_nodes
        |FROM d GROUP BY kind, degree ORDER BY kind, degree""".stripMargin,
    // Benford replay: the same boundary-safe digit branches, window
    // marginals over (group, digit) cells, the algebraic missing-digit
    // fold, and the even-dof closed-form Poisson-sum chi2 tail.
    "q_benford" ->
      """WITH base AS (SELECT l_returnflag AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
        |  WHERE l_orderkey < 100000 AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND CAST(l_extendedprice AS DOUBLE) > 0),
        |m AS (SELECT g, x / pow(10.0, floor(log10(x))) AS m0 FROM base),
        |dg AS (SELECT g, CAST(CASE WHEN m0 < 1 THEN floor(m0 * 10.0)
        |    WHEN m0 >= 10 THEN floor(m0 / 10.0)
        |    ELSE floor(m0) END AS BIGINT) AS d FROM m),
        |cells AS (SELECT g, d, CAST(count(*) AS BIGINT) AS o FROM dg
        |  GROUP BY g, d),
        |w AS (SELECT *,
        |    CAST(sum(o) OVER (PARTITION BY g) AS BIGINT) AS n,
        |    log10(1.0 + 1.0 / d) AS p FROM cells),
        |a AS (SELECT g, CAST(max(n) AS BIGINT) AS n,
        |    round(sum((o - CAST(n AS DOUBLE) * p)
        |        * (o - CAST(n AS DOUBLE) * p)
        |        / (CAST(n AS DOUBLE) * p) - CAST(n AS DOUBLE) * p)
        |      + CAST(max(n) AS DOUBLE), 6) AS chi2,
        |    round((sum(abs(o / CAST(n AS DOUBLE) - p) - p) + 1.0)
        |      / 9.0, 6) AS mad
        |  FROM w GROUP BY g)
        |SELECT g AS l_returnflag, n, chi2, CAST(8 AS BIGINT) AS dof,
        |  round_even((SELECT sum(exp(-a.chi2 / 2.0
        |      + s.j * ln(a.chi2 / 2.0) - lgamma(s.j + 1.0)))
        |    FROM generate_series(0, 49) s(j) WHERE s.j < 4)
        |    * 1000000.0, 0) / 1000000.0 AS p_value,
        |  mad FROM a ORDER BY l_returnflag""".stripMargin,
    // Vuong replay: shared Cody erfc at the rounded z.
    "q_vuong" -> vuongOracleSql,
    "q_hill" ->
      """WITH base AS (SELECT CAST(n_chars AS DOUBLE) AS x
        |  FROM documents WHERE n_chars IS NOT NULL
        |    AND CAST(n_chars AS DOUBLE) > 0),
        |top AS (SELECT x FROM base ORDER BY x DESC LIMIT 201),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS nt, min(x) AS xr,
        |    sum(ln(x)) AS sl FROM top)
        |SELECT CAST(200 AS BIGINT) AS k, xr AS x_ref,
        |  CASE WHEN nt = 201 AND sl - 201.0 * ln(xr) > 0 THEN
        |    round(200.0 / (sl - 201.0 * ln(xr)), 6) END AS alpha
        |FROM a""".stripMargin,
    "q_es_sample" ->
      """WITH k AS (SELECT doc_id, n_chars,
        |    -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |        AS BIGINT) + 1.0) / 4294967296.0) / n_chars AS ek
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
        |  ORDER BY ek LIMIT 100)
        |SELECT doc_id, n_chars, round(ek, 9) AS es_key_r FROM k
        |ORDER BY es_key_r""".stripMargin,
    "q_embedding_cov" ->
      """SELECT i.i, j.j,
        |  round(covar_pop(CAST(embedding[i.i] AS DOUBLE),
        |    CAST(embedding[j.j] AS DOUBLE)), 6) + 0.0 AS cov_r
        |FROM embeddings, range(1, 65) i(i), range(1, 65) j(j)
        |WHERE i.i <= j.j AND embedding IS NOT NULL
        |GROUP BY i.i, j.j ORDER BY i.i, j.j""".stripMargin,
    "q_hits" ->
      """WITH base AS (SELECT DISTINCT 's' || l_suppkey AS src,
        |    'p' || l_partkey AS dst FROM lineitem
        |  WHERE l_orderkey < 50000),
        |nodes AS (SELECT DISTINCT src AS node FROM base
        |  UNION SELECT DISTINCT dst FROM base),
        |a1r AS (SELECT dst AS node, CAST(count(*) AS DOUBLE) AS a
        |  FROM base GROUP BY dst),
        |a1n AS (SELECT sqrt(sum(a * a)) AS z FROM a1r),
        |a1 AS (SELECT n.node, coalesce(r.a, 0.0) / a1n.z AS a
        |  FROM nodes n LEFT JOIN a1r r ON n.node = r.node, a1n),
        |h1r AS (SELECT b.src AS node, sum(a1.a) AS h
        |  FROM base b JOIN a1 ON a1.node = b.dst GROUP BY b.src),
        |h1n AS (SELECT sqrt(sum(h * h)) AS z FROM h1r),
        |h1 AS (SELECT n.node, coalesce(r.h, 0.0) / h1n.z AS h
        |  FROM nodes n LEFT JOIN h1r r ON n.node = r.node, h1n),
        |a2r AS (SELECT b.dst AS node, sum(h1.h) AS a
        |  FROM base b JOIN h1 ON h1.node = b.src GROUP BY b.dst),
        |a2n AS (SELECT sqrt(sum(a * a)) AS z FROM a2r),
        |a2 AS (SELECT n.node, coalesce(r.a, 0.0) / a2n.z AS a
        |  FROM nodes n LEFT JOIN a2r r ON n.node = r.node, a2n),
        |h2r AS (SELECT b.src AS node, sum(a2.a) AS h
        |  FROM base b JOIN a2 ON a2.node = b.dst GROUP BY b.src),
        |h2n AS (SELECT sqrt(sum(h * h)) AS z FROM h2r),
        |h2 AS (SELECT n.node, coalesce(r.h, 0.0) / h2n.z AS h
        |  FROM nodes n LEFT JOIN h2r r ON n.node = r.node, h2n)
        |SELECT n.node, round(h2.h, 6) AS hub_r, round(a2.a, 6) AS auth_r
        |FROM nodes n JOIN h2 ON h2.node = n.node
        |  JOIN a2 ON a2.node = n.node
        |ORDER BY n.node""".stripMargin,
    "q_fuzzy_join" ->
      """WITH names AS (SELECT p_name AS key, min(p_partkey) AS id
        |  FROM part GROUP BY p_name),
        |b AS (SELECT id, key,
        |    list_extract(string_split(key, ' '), -1) AS block
        |  FROM names)
        |SELECT a.id AS id_a, bb.id AS id_b, a.key AS key_a,
        |  bb.key AS key_b,
        |  CAST(levenshtein(a.key, bb.key) AS BIGINT) AS distance
        |FROM b a JOIN b bb ON a.block = bb.block AND a.id < bb.id
        |WHERE levenshtein(a.key, bb.key) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    "q_jw_join" ->
      """WITH names AS (SELECT p_name AS key, min(p_partkey) AS id
        |  FROM part GROUP BY p_name),
        |b AS (SELECT id, key,
        |    list_extract(string_split(key, ' '), -1) AS block
        |  FROM names)
        |SELECT a.id AS id_a, bb.id AS id_b, a.key AS key_a,
        |  bb.key AS key_b,
        |  round(jaro_winkler_similarity(a.key, bb.key), 6) AS sim
        |FROM b a JOIN b bb ON a.block = bb.block AND a.id < bb.id
        |WHERE round(jaro_winkler_similarity(a.key, bb.key), 6) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,
    "q_grouped_ols2" ->
      """WITH s AS (SELECT l_returnflag, count(*) AS n,
        |    avg(l_quantity) AS m1, avg(l_discount) AS m2,
        |    avg(l_extendedprice) AS my,
        |    var_pop(l_quantity) AS v1, var_pop(l_discount) AS v2,
        |    var_pop(l_extendedprice) AS vy,
        |    covar_pop(l_quantity, l_discount) AS c12,
        |    covar_pop(l_quantity, l_extendedprice) AS c1y,
        |    covar_pop(l_discount, l_extendedprice) AS c2y
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_discount IS NOT NULL AND l_extendedprice IS NOT NULL
        |  GROUP BY l_returnflag),
        |b AS (SELECT l_returnflag, n, m1, m2, my, vy, c1y, c2y,
        |    (v2 * c1y - c12 * c2y) / (v1 * v2 - c12 * c12) AS b1,
        |    (v1 * c2y - c12 * c1y) / (v1 * v2 - c12 * c12) AS b2
        |  FROM s WHERE n >= 4 AND v1 > 0 AND v2 > 0 AND vy > 0
        |    AND (v1 * v2 - c12 * c12) > v1 * v2 * 1e-12)
        |SELECT l_returnflag, n,
        |  round(my - b1 * m1 - b2 * m2, 4) AS intercept_r,
        |  round(b1, 4) AS b1_r, round(b2, 4) AS b2_r,
        |  round((b1 * c1y + b2 * c2y) / vy, 6) AS r2_r,
        |  round(sqrt(n * vy * (1.0 - (b1 * c1y + b2 * c2y) / vy)
        |    / (n - 3.0)), 4) AS resid_std_r
        |FROM b ORDER BY l_returnflag""".stripMargin,
    "q_outliers_by_group" ->
      """WITH v AS (SELECT event_id, event_type,
        |    CAST(value AS DOUBLE) AS x FROM events
        |  WHERE value IS NOT NULL AND NOT isnan(value)),
        |med AS (SELECT event_type, quantile_cont(x, 0.5) AS med
        |  FROM v GROUP BY 1),
        |mad AS (SELECT v.event_type,
        |    quantile_cont(abs(v.x - med.med), 0.5) AS mad
        |  FROM v JOIN med USING (event_type) GROUP BY 1)
        |SELECT v.event_id, v.event_type,
        |  round(abs(v.x - med.med) / (1.4826 * mad.mad), 6) AS robust_z
        |FROM v JOIN med USING (event_type) JOIN mad USING (event_type)
        |WHERE round(abs(v.x - med.med) / (1.4826 * mad.mad), 6) > 2.5
        |ORDER BY event_id""".stripMargin,
    "q_sparse_cosine" ->
      """WITH tok AS (SELECT doc_id AS id, unnest(list_filter(
        |    regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |    x -> x <> '')) AS token FROM documents),
        |tf AS (SELECT id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n
        |  FROM documents),
        |w AS (SELECT tf.id, tf.token, dfq.df,
        |    tf.tf * (ln((1.0 + nd.n) / (1.0 + dfq.df)) + 1.0) AS w
        |  FROM tf JOIN dfq USING (token), nd),
        |norms AS (SELECT id, sqrt(sum(w * w)) AS norm FROM w GROUP BY id),
        |k AS (SELECT token, id, w FROM w WHERE df <= 100),
        |dt AS (SELECT a.id AS id_a, b.id AS id_b, sum(a.w * b.w) AS dt
        |  FROM k a JOIN k b ON a.token = b.token AND a.id < b.id
        |  GROUP BY 1, 2)
        |SELECT dt.id_a, dt.id_b,
        |  round(dt.dt / (na.norm * nb.norm), 6) AS cosine_r
        |FROM dt JOIN norms na ON dt.id_a = na.id
        |  JOIN norms nb ON dt.id_b = nb.id
        |WHERE dt.dt / (na.norm * nb.norm) >= 0.25
        |ORDER BY id_a, id_b""".stripMargin,
    "q_stream_topk" ->
      """WITH w AS (SELECT
        |    (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400
        |      AS win_start,
        |    CAST(user_id AS VARCHAR) AS key
        |  FROM events WHERE user_id IS NOT NULL),
        |c AS (SELECT win_start, key, count(*) AS cnt FROM w
        |  GROUP BY 1, 2),
        |r AS (SELECT win_start, key, cnt, row_number() OVER (
        |    PARTITION BY win_start ORDER BY cnt DESC, key ASC) AS rk
        |  FROM c)
        |SELECT win_start, rk, key, cnt, CAST(0 AS BIGINT) AS err
        |FROM r WHERE rk <= 5 ORDER BY win_start, rk""".stripMargin,
    "q_stream_quantiles" ->
      """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400
        |    AS win_start,
        |  count(*) AS n, TRUE AS within_50, TRUE AS within_90
        |FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        |GROUP BY 1 ORDER BY win_start""".stripMargin,
    "q_embedding_pca" ->
      """SELECT CAST(1.0 AS DOUBLE) AS var_ratio_1,
        |  CAST(1.0 AS DOUBLE) AS var_ratio_2,
        |  CAST(0.0 AS DOUBLE) AS corr_12,
        |  CAST(0.0 AS DOUBLE) AS mean_p1""".stripMargin,
    // Replays all 3 Poisson-GLM Newton steps as chained CTEs from the
    // ln ȳ warm start (pass 1 sees the constant rate μ = ȳ — the
    // q_logistic_quality pattern with W = μ); ln y! via lgamma
    "q_poisson_glm" ->
      """WITH base AS (SELECT CAST(l_quantity AS DOUBLE) AS y,
        |    CAST(l_discount AS DOUBLE) AS x
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))
        |    AND CAST(l_quantity AS DOUBLE) >= 0.0),
        |b0i AS (SELECT ln(avg(y)) AS b FROM base),
        |p1 AS (SELECT y, x, b0i.b AS pb0, exp(b0i.b) AS mu
        |  FROM base CROSS JOIN b0i),
        |it1 AS (SELECT any_value(pb0) AS pb0, sum(mu) AS h00,
        |    sum(mu * x) AS h01, sum(mu * x * x) AS h11,
        |    sum(y - mu) AS g0, sum((y - mu) * x) AS g1,
        |    count(*) AS n FROM p1),
        |b1 AS (SELECT
        |    pb0 + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
        |    (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1, n
        |  FROM it1),
        |p2 AS (SELECT y, x, b.b0 AS pb0, b.b1 AS pb1,
        |    exp(b.b0 + b.b1 * x) AS mu
        |  FROM base CROSS JOIN b1 b),
        |it2 AS (SELECT any_value(pb0) AS pb0, any_value(pb1) AS pb1,
        |    sum(mu) AS h00, sum(mu * x) AS h01, sum(mu * x * x) AS h11,
        |    sum(y - mu) AS g0, sum((y - mu) * x) AS g1 FROM p2),
        |b2 AS (SELECT
        |    pb0 + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
        |    pb1 + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1
        |  FROM it2),
        |p3 AS (SELECT y, x, b.b0 AS pb0, b.b1 AS pb1,
        |    exp(b.b0 + b.b1 * x) AS mu
        |  FROM base CROSS JOIN b2 b),
        |it3 AS (SELECT any_value(pb0) AS pb0, any_value(pb1) AS pb1,
        |    sum(mu) AS h00, sum(mu * x) AS h01, sum(mu * x * x) AS h11,
        |    sum(y - mu) AS g0, sum((y - mu) * x) AS g1 FROM p3),
        |b3 AS (SELECT
        |    pb0 + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
        |    pb1 + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1
        |  FROM it3),
        |ll AS (SELECT sum(y * z - exp(z) - lgamma(y + 1.0)) AS ll
        |  FROM (SELECT y, b.b0 + b.b1 * x AS z FROM base CROSS JOIN b3 b))
        |SELECT round_even(b3.b0 * 1e6, 0) / 1e6 AS b0_r,
        |  round_even(b3.b1 * 1e6, 0) / 1e6 AS b1_r,
        |  round_even(ll.ll * 100.0, 0) / 100.0 AS ll_r,
        |  (SELECT n FROM b1) AS n
        |FROM b3, ll""".stripMargin,
    // NB2 replay: the Poisson warm-start steps (q_poisson_glm CTEs),
    // the MoM alpha aggregation, then each NB2 Fisher step with
    // w = mu/(1+alpha*mu), and the final NB log-likelihood via lgamma.
    "q_nbinom_glm" ->
      """WITH base AS (SELECT CAST(l_quantity AS DOUBLE) AS y,
        |    CAST(l_discount AS DOUBLE) AS x
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))
        |    AND CAST(l_quantity AS DOUBLE) >= 0.0),
        |b0i AS (SELECT ln(avg(y)) AS b FROM base),
        |p1 AS (SELECT y, x, b0i.b AS pb0, exp(b0i.b) AS mu
        |  FROM base CROSS JOIN b0i),
        |it1 AS (SELECT any_value(pb0) AS pb0, sum(mu) AS h00,
        |    sum(mu * x) AS h01, sum(mu * x * x) AS h11,
        |    sum(y - mu) AS g0, sum((y - mu) * x) AS g1,
        |    count(*) AS n FROM p1),
        |b1 AS (SELECT
        |    pb0 + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
        |    (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1, n
        |  FROM it1),
        |p2 AS (SELECT y, x, b.b0 AS pb0, b.b1 AS pb1,
        |    exp(b.b0 + b.b1 * x) AS mu
        |  FROM base CROSS JOIN b1 b),
        |it2 AS (SELECT any_value(pb0) AS pb0, any_value(pb1) AS pb1,
        |    sum(mu) AS h00, sum(mu * x) AS h01, sum(mu * x * x) AS h11,
        |    sum(y - mu) AS g0, sum((y - mu) * x) AS g1 FROM p2),
        |b2 AS (SELECT
        |    pb0 + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
        |    pb1 + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1
        |  FROM it2),
        |pa AS (SELECT y, exp(b.b0 + b.b1 * x) AS mu
        |  FROM base CROSS JOIN b2 b),
        |al AS (SELECT greatest(sum((y - mu) * (y - mu) - mu)
        |    / sum(mu * mu), 0.000001) AS alpha FROM pa),
        |n1 AS (SELECT y, x, b.b0 AS pb0, b.b1 AS pb1, al.alpha AS alpha,
        |    exp(b.b0 + b.b1 * x) AS mu
        |  FROM base CROSS JOIN b2 b CROSS JOIN al),
        |ni1 AS (SELECT any_value(pb0) AS pb0, any_value(pb1) AS pb1,
        |    any_value(alpha) AS alpha,
        |    sum(mu / (1.0 + alpha * mu)) AS h00,
        |    sum(mu / (1.0 + alpha * mu) * x) AS h01,
        |    sum(mu / (1.0 + alpha * mu) * x * x) AS h11,
        |    sum((y - mu) / (1.0 + alpha * mu)) AS g0,
        |    sum((y - mu) / (1.0 + alpha * mu) * x) AS g1 FROM n1),
        |nb1 AS (SELECT
        |    pb0 + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
        |    pb1 + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1,
        |    alpha FROM ni1),
        |n2 AS (SELECT y, x, b.b0 AS pb0, b.b1 AS pb1, b.alpha AS alpha,
        |    exp(b.b0 + b.b1 * x) AS mu
        |  FROM base CROSS JOIN nb1 b),
        |ni2 AS (SELECT any_value(pb0) AS pb0, any_value(pb1) AS pb1,
        |    any_value(alpha) AS alpha,
        |    sum(mu / (1.0 + alpha * mu)) AS h00,
        |    sum(mu / (1.0 + alpha * mu) * x) AS h01,
        |    sum(mu / (1.0 + alpha * mu) * x * x) AS h11,
        |    sum((y - mu) / (1.0 + alpha * mu)) AS g0,
        |    sum((y - mu) / (1.0 + alpha * mu) * x) AS g1 FROM n2),
        |nb2 AS (SELECT
        |    pb0 + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
        |    pb1 + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1,
        |    alpha FROM ni2),
        |llp AS (SELECT y, 1.0 / b.alpha AS r,
        |    exp(b.b0 + b.b1 * x) AS mu
        |  FROM base CROSS JOIN nb2 b),
        |ll AS (SELECT sum(lgamma(y + r) - lgamma(r) - lgamma(y + 1.0)
        |    + r * (ln(r) - ln(r + mu))
        |    + y * (ln(mu) - ln(r + mu))) AS ll FROM llp)
        |SELECT round_even(nb2.b0 * 1e6, 0) / 1e6 AS b0_r,
        |  round_even(nb2.b1 * 1e6, 0) / 1e6 AS b1_r,
        |  round_even(nb2.alpha * 1e6, 0) / 1e6 AS alpha_r,
        |  round_even(ll.ll * 100.0, 0) / 100.0 AS ll_r,
        |  (SELECT n FROM b1) AS n
        |FROM nb2, ll""".stripMargin,
    // Energy distance via the prefix-sum identity Σ|xᵢ−v| =
    // v·(2c−n) − (2s−S); integer-valued quantity → every sum exact
    "q_energy_distance" ->
      """WITH base AS (SELECT l_linestatus AS g,
        |    CAST(l_quantity AS DOUBLE) AS v, (l_returnflag = 'A') AS ia
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_returnflag IN ('A', 'N')),
        |w AS (SELECT g, v, ia,
        |    sum(CASE WHEN ia THEN 1 ELSE 0 END) OVER pre AS ca,
        |    sum(CASE WHEN ia THEN v ELSE 0.0 END) OVER pre AS sa,
        |    sum(CASE WHEN ia THEN 0 ELSE 1 END) OVER pre AS cb,
        |    sum(CASE WHEN ia THEN 0.0 ELSE v END) OVER pre AS sb,
        |    sum(CASE WHEN ia THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY g) AS na,
        |    sum(CASE WHEN ia THEN 0 ELSE 1 END)
        |      OVER (PARTITION BY g) AS nb,
        |    sum(CASE WHEN ia THEN v ELSE 0.0 END)
        |      OVER (PARTITION BY g) AS ta,
        |    sum(CASE WHEN ia THEN 0.0 ELSE v END)
        |      OVER (PARTITION BY g) AS tb
        |  FROM base
        |  WINDOW pre AS (PARTITION BY g ORDER BY v
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |a AS (SELECT g, CAST(max(na) AS BIGINT) AS n_a0,
        |    CAST(max(nb) AS BIGINT) AS n_b0,
        |    sum(CASE WHEN NOT ia
        |      THEN v * (2.0 * ca - na) - (2.0 * sa - ta)
        |      ELSE 0.0 END) AS crs,
        |    sum(CASE WHEN ia THEN v * ca - sa ELSE 0.0 END) AS wa,
        |    sum(CASE WHEN NOT ia THEN v * cb - sb ELSE 0.0 END) AS wb
        |  FROM w GROUP BY g HAVING max(na) > 0 AND max(nb) > 0)
        |SELECT g AS l_linestatus, n_a0 AS n_a, n_b0 AS n_b,
        |  round_even(crs / (CAST(n_a0 AS DOUBLE) * CAST(n_b0 AS DOUBLE))
        |    * 1e6, 0) / 1e6 AS e_cross,
        |  round_even(2.0 * wa / (CAST(n_a0 AS DOUBLE) * CAST(n_a0 AS DOUBLE))
        |    * 1e6, 0) / 1e6 AS e_within_a,
        |  round_even(2.0 * wb / (CAST(n_b0 AS DOUBLE) * CAST(n_b0 AS DOUBLE))
        |    * 1e6, 0) / 1e6 AS e_within_b,
        |  round_even(sqrt(greatest(
        |    2.0 * (crs / (CAST(n_a0 AS DOUBLE) * CAST(n_b0 AS DOUBLE)))
        |    - 2.0 * wa / (CAST(n_a0 AS DOUBLE) * CAST(n_a0 AS DOUBLE))
        |    - 2.0 * wb / (CAST(n_b0 AS DOUBLE) * CAST(n_b0 AS DOUBLE)),
        |    0.0)) * 1e6, 0) / 1e6 AS energy_dist
        |FROM a ORDER BY g""".stripMargin,
    // Pooled quantile_disc(0.5) median + 2×k χ² fold; df = 4 (even) so
    // the survival replays via the Poisson-sum closed form at the
    // 6-dp-rounded statistic
    "q_mood_median" ->
      """WITH base AS (SELECT CAST(o_orderpriority AS VARCHAR) AS g,
        |    CAST(o_totalprice AS DOUBLE) AS v
        |  FROM orders WHERE o_totalprice IS NOT NULL
        |    AND NOT isnan(CAST(o_totalprice AS DOUBLE))
        |    AND o_orderpriority IS NOT NULL),
        |m AS (SELECT quantile_disc(v, 0.5) AS med FROM base),
        |c AS (SELECT g,
        |    CAST(sum(CASE WHEN v > m.med THEN 1 ELSE 0 END) AS BIGINT)
        |      AS above,
        |    CAST(count(*) AS BIGINT) AS tot
        |  FROM base, m GROUP BY g),
        |t AS (SELECT CAST(sum(above) AS BIGINT) AS atot,
        |    CAST(sum(tot) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS k FROM c),
        |x AS (SELECT round_even(sum(
        |      (above - tot * (CAST(t.atot AS DOUBLE) / t.n))
        |        * (above - tot * (CAST(t.atot AS DOUBLE) / t.n))
        |        / (tot * (CAST(t.atot AS DOUBLE) / t.n))
        |      + ((tot - above) - tot * (1.0 - CAST(t.atot AS DOUBLE) / t.n))
        |        * ((tot - above) - tot * (1.0 - CAST(t.atot AS DOUBLE) / t.n))
        |        / (tot * (1.0 - CAST(t.atot AS DOUBLE) / t.n)))
        |    * 1000000.0, 0) / 1000000.0 AS chi2,
        |    max(t.n) AS n, max(t.k) AS k
        |  FROM c, t)
        |SELECT (SELECT med FROM m) AS median, x.chi2,
        |  x.k - 1 AS dof,
        |  round_even((SELECT sum(exp(-x.chi2 / 2.0
        |      + s.j * ln(x.chi2 / 2.0) - lgamma(s.j + 1.0)))
        |    FROM generate_series(0, 49) s(j) WHERE s.j < ((x.k - 1) // 2))
        |    * 1000000.0, 0) / 1000000.0 AS p_value,
        |  x.n, x.k FROM x""".stripMargin,
    // Exact hypergeometric tail sum over generate_series with the
    // scipy 1+1e−7 inclusion gate
    "q_fisher_exact" ->
      """WITH b AS (SELECT (l_returnflag = 'R') AS fa,
        |    (l_discount > 0.05) AS fb
        |  FROM lineitem WHERE l_orderkey < 300
        |    AND l_returnflag IS NOT NULL AND l_discount IS NOT NULL),
        |c AS (SELECT
        |    CAST(sum(CASE WHEN fa AND fb THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN fa AND NOT fb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS b,
        |    CAST(sum(CASE WHEN NOT fa AND fb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c,
        |    CAST(sum(CASE WHEN NOT fa AND NOT fb THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d FROM b),
        |m AS (SELECT a, b, c, d, a + b AS r1, a + c AS c1,
        |    a + b + c + d AS n FROM c),
        |p AS (SELECT m.a, m.b, m.c, m.d, s.j AS kk,
        |    exp(lgamma(m.r1 + 1.0) + lgamma(m.n - m.r1 + 1.0)
        |      + lgamma(m.c1 + 1.0) + lgamma(m.n - m.c1 + 1.0)
        |      - lgamma(m.n + 1.0) - lgamma(s.j + 1.0)
        |      - lgamma(m.r1 - s.j + 1.0) - lgamma(m.c1 - s.j + 1.0)
        |      - lgamma(m.n - m.r1 - m.c1 + s.j + 1.0)) AS pk
        |  FROM m, generate_series(0, 5000) s(j)
        |  WHERE s.j >= greatest(0, m.r1 + m.c1 - m.n)
        |    AND s.j <= least(m.r1, m.c1)),
        |po AS (SELECT pk AS pobs FROM p WHERE kk = a)
        |SELECT any_value(a) AS a, any_value(b) AS b, any_value(c) AS c,
        |  any_value(d) AS d,
        |  CASE WHEN any_value(b) * any_value(c) = 0 THEN NULL
        |    ELSE round_even(CAST(any_value(a) AS DOUBLE) * any_value(d)
        |      / (CAST(any_value(b) AS DOUBLE) * any_value(c)) * 1e6, 0)
        |      / 1e6 END AS odds_ratio,
        |  round_even(least(1.0, sum(CASE WHEN pk <= po.pobs * (1.0 + 1e-7)
        |    THEN pk ELSE 0.0 END)) * 1e6, 0) / 1e6 AS p_value
        |FROM p, po""".stripMargin,
    // Complete-block fold: any-success per (user, type), subjects with
    // all 3 treatments; Q is a ratio of exact integers, df = 2 (even)
    "q_cochran_q" ->
      """WITH cell AS (SELECT user_id AS s, event_type AS t,
        |    max(CASE WHEN value > 60 THEN 1 ELSE 0 END) AS y
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |    AND event_type IN ('click', 'view', 'purchase')
        |  GROUP BY user_id, event_type),
        |subj AS (SELECT s, count(*) AS kt, sum(y) AS ri
        |  FROM cell GROUP BY s),
        |comp AS (SELECT s, ri FROM subj WHERE kt = 3),
        |sa AS (SELECT CAST(count(*) AS BIGINT) AS ns,
        |    CAST(sum(ri) AS BIGINT) AS bb,
        |    CAST(sum(ri * ri) AS BIGINT) AS r2 FROM comp),
        |tj AS (SELECT cell.t, CAST(sum(cell.y) AS BIGINT) AS tj
        |  FROM cell JOIN comp ON cell.s = comp.s GROUP BY cell.t),
        |q AS (SELECT round_even(
        |    (3.0 * 2.0 * sum((tj - sa.bb / 3.0) * (tj - sa.bb / 3.0)))
        |      / (3.0 * max(sa.bb) - max(sa.r2)) * 1e6, 0) / 1e6 AS q0,
        |    max(sa.ns) AS ns FROM tj, sa)
        |SELECT q.q0 AS q_stat, CAST(2 AS BIGINT) AS dof,
        |  round_even(exp(-q.q0 / 2.0) * 1e6, 0) / 1e6 AS p_value,
        |  q.ns AS n_subjects,
        |  (SELECT CAST(count(*) AS BIGINT) FROM subj WHERE kt <> 3)
        |    AS n_incomplete
        |FROM q""".stripMargin,
    // Signed-rank replay: distinct-|d| cells, midrank = prefix + (t+1)/2,
    // W+ as a sum of half-integers (exact), tie-corrected sigma, rint-
    // rounded z, Cody erfc at the rounded z (q_drift_mwu convention).
    "q_wilcoxon" ->
      s"""WITH c AS (SELECT CAST(l_quantity AS DOUBLE)
        |      - CAST(l_discount AS DOUBLE) * 100 AS d
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))),
        |nz AS (SELECT CAST(count(*) AS BIGINT) AS n_zero FROM c
        |  WHERE d = 0.0),
        |m AS (SELECT abs(d) AS v,
        |    CAST(sum(CASE WHEN d > 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cp,
        |    CAST(count(*) AS BIGINT) AS ct
        |  FROM c WHERE d <> 0.0 GROUP BY abs(d)),
        |cum AS (SELECT v, cp, ct,
        |    coalesce(CAST(sum(ct) OVER (ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cb
        |  FROM m),
        |a AS (SELECT sum(cp * (cb + (ct + 1.0) / 2.0)) AS w,
        |    sum(CAST(ct AS DOUBLE) * ct * ct - ct) AS ties,
        |    CAST(sum(ct) AS BIGINT) AS n FROM cum),
        |st AS (SELECT n, w, ties, CAST(n AS DOUBLE) AS nd FROM a),
        |sg AS (SELECT n, w, nd * (nd + 1.0) / 4.0 AS mu,
        |    sqrt(nd * (nd + 1.0) * (2.0 * nd + 1.0) / 24.0
        |      - ties / 48.0) AS sigma FROM st),
        |zz AS (SELECT n, w,
        |    CASE WHEN sigma = 0.0 OR w = mu THEN 0.0
        |      ELSE round_even((w - mu - 0.5 * sign(w - mu)) / sigma
        |        * 1e6, 0) / 1e6 END AS z FROM sg),
        |ye AS (SELECT n, w, z, abs(z) / sqrt(2.0) AS y FROM zz)
        |SELECT n, nz.n_zero, w AS w_plus, z,
        |  round_even(${codyErfcSql("y")} * 1e6, 0) / 1e6 AS p_value
        |FROM ye, nz""".stripMargin,
    // Sign-test replay: one aggregation of exact sign counts, the same
    // continuity-corrected z expression, Cody erfc at the rounded z.
    "q_sign_test" ->
      s"""WITH c AS (SELECT CAST(l_quantity AS DOUBLE)
        |      - CAST(l_discount AS DOUBLE) * 100 AS d
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))),
        |a AS (SELECT
        |    CAST(sum(CASE WHEN d > 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS np,
        |    CAST(sum(CASE WHEN d < 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nn,
        |    CAST(sum(CASE WHEN d = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nz FROM c),
        |st AS (SELECT np, nn, nz, CAST(np + nn AS DOUBLE) AS nd FROM a),
        |zz AS (SELECT np, nn, nz,
        |    CASE WHEN CAST(np AS DOUBLE) = nd / 2.0 THEN 0.0
        |      ELSE round_even((CAST(np AS DOUBLE) - nd / 2.0
        |        - 0.5 * sign(CAST(np AS DOUBLE) - nd / 2.0))
        |        / sqrt(nd / 4.0) * 1e6, 0) / 1e6 END AS z FROM st),
        |ye AS (SELECT np, nn, nz, z, abs(z) / sqrt(2.0) AS y FROM zz)
        |SELECT np AS n_pos, nn AS n_neg, nz AS n_zero, z,
        |  round_even(${codyErfcSql("y")} * 1e6, 0) / 1e6 AS p_value
        |FROM ye""".stripMargin,
    // Bartlett replay: integer-exact moment sums per flag, ordered
    // 3-term folds (the engine sorts groups by name before folding),
    // and exp(-T/2) for the even-df chi2 survival at the rounded T.
    "q_bartlett" ->
      """WITH g AS (SELECT l_returnflag AS g,
        |    CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(l_quantity AS DOUBLE)) AS sx,
        |    sum(CAST(l_quantity AS DOUBLE)
        |      * CAST(l_quantity AS DOUBLE)) AS sxx
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND l_returnflag IS NOT NULL
        |  GROUP BY l_returnflag),
        |s AS (SELECT g, CAST(n AS DOUBLE) AS nd,
        |    (sxx - sx * sx / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0) AS s2 FROM g),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS k, sum(nd) AS bign,
        |    sum((nd - 1.0) * s2 ORDER BY g) AS ps,
        |    sum(1.0 / (nd - 1.0) ORDER BY g) AS invs,
        |    sum((nd - 1.0) * ln(s2) ORDER BY g) AS lns FROM s),
        |t AS (SELECT k, bign,
        |    round_even(((bign - k) * ln(ps / (bign - k)) - lns)
        |      / (1.0 + (invs - 1.0 / (bign - k)) / (3.0 * (k - 1.0)))
        |      * 1e6, 0) / 1e6 AS t0 FROM a)
        |SELECT k, CAST(bign AS BIGINT) AS n, t0 AS t_stat,
        |  CAST(k - 1 AS BIGINT) AS dof,
        |  round_even(exp(-t0 / 2.0) * 1e6, 0) / 1e6 AS p_value
        |FROM t""".stripMargin,
    // Cliff's delta replay: the q_drift_mwu cumulative-count substrate,
    // exact pair counts, rint-rounded delta, Romano magnitude bands.
    "q_cliff_delta" ->
      """WITH c AS (SELECT
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    CAST(l_quantity AS DOUBLE) AS v
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))),
        |m AS (SELECT v,
        |    CAST(sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ca,
        |    CAST(sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cb
        |  FROM c GROUP BY v),
        |cum AS (SELECT v, ca, cb,
        |    coalesce(CAST(sum(cb) OVER (ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cbb
        |  FROM m),
        |a AS (SELECT CAST(sum(ca * cbb) AS BIGINT) AS gt,
        |    CAST(sum(ca * cb) AS BIGINT) AS tie,
        |    CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM cum),
        |d AS (SELECT gt, tie, na, nb, na * nb - gt - tie AS lt FROM a),
        |f AS (SELECT gt, lt, tie, na, nb,
        |    round_even(CAST(gt - lt AS DOUBLE)
        |      / (CAST(na AS DOUBLE) * nb) * 1e6, 0) / 1e6 AS delta
        |  FROM d)
        |SELECT delta,
        |  CASE WHEN abs(delta) < 0.147 THEN 'negligible'
        |    WHEN abs(delta) < 0.33 THEN 'small'
        |    WHEN abs(delta) < 0.474 THEN 'medium'
        |    ELSE 'large' END AS magnitude,
        |  gt AS n_gt, lt AS n_lt, tie AS n_tie, na AS n_a, nb AS n_b
        |FROM f""".stripMargin,
    // Jonckheere replay: per-value level counts, shared 1-PRECEDING
    // cumulative window per level, J as a sum of exact half-integers in
    // the engine's level order, the no-tie variance, Cody erfc.
    "q_jonckheere" ->
      s"""WITH c AS (SELECT CAST(o_totalprice AS DOUBLE) AS v,
        |    o_orderpriority AS g
        |  FROM orders WHERE o_totalprice IS NOT NULL
        |    AND NOT isnan(CAST(o_totalprice AS DOUBLE))
        |    AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM',
        |      '4-NOT SPECIFIED', '5-LOW')),
        |m AS (SELECT v,
        |    CAST(sum(CASE WHEN g = '1-URGENT' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN g = '2-HIGH' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c2,
        |    CAST(sum(CASE WHEN g = '3-MEDIUM' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c3,
        |    CAST(sum(CASE WHEN g = '4-NOT SPECIFIED' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c4,
        |    CAST(sum(CASE WHEN g = '5-LOW' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c5
        |  FROM c GROUP BY v),
        |cum AS (SELECT v, c1, c2, c3, c4, c5,
        |    coalesce(CAST(sum(c1) OVER w AS BIGINT), 0) AS b1,
        |    coalesce(CAST(sum(c2) OVER w AS BIGINT), 0) AS b2,
        |    coalesce(CAST(sum(c3) OVER w AS BIGINT), 0) AS b3,
        |    coalesce(CAST(sum(c4) OVER w AS BIGINT), 0) AS b4
        |  FROM m WINDOW w AS (ORDER BY v ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |a AS (SELECT
        |    sum(c2 * (b1 + 0.5 * c1)
        |      + c3 * ((b1 + b2) + 0.5 * (c1 + c2))
        |      + c4 * ((b1 + b2 + b3) + 0.5 * (c1 + c2 + c3))
        |      + c5 * ((b1 + b2 + b3 + b4)
        |        + 0.5 * (c1 + c2 + c3 + c4))) AS j,
        |    CAST(sum(c1) AS BIGINT) AS n1,
        |    CAST(sum(c2) AS BIGINT) AS n2,
        |    CAST(sum(c3) AS BIGINT) AS n3,
        |    CAST(sum(c4) AS BIGINT) AS n4,
        |    CAST(sum(c5) AS BIGINT) AS n5 FROM cum),
        |st AS (SELECT j, n1 + n2 + n3 + n4 + n5 AS n,
        |    CAST(n1 + n2 + n3 + n4 + n5 AS DOUBLE) AS nd,
        |    CAST(n1 AS DOUBLE) AS d1, CAST(n2 AS DOUBLE) AS d2,
        |    CAST(n3 AS DOUBLE) AS d3, CAST(n4 AS DOUBLE) AS d4,
        |    CAST(n5 AS DOUBLE) AS d5 FROM a),
        |mv AS (SELECT j, n,
        |    (nd * nd - (d1 * d1 + d2 * d2 + d3 * d3 + d4 * d4
        |      + d5 * d5)) / 4.0 AS mean,
        |    sqrt((nd * nd * (2.0 * nd + 3.0)
        |      - (d1 * d1 * (2.0 * d1 + 3.0) + d2 * d2 * (2.0 * d2 + 3.0)
        |        + d3 * d3 * (2.0 * d3 + 3.0) + d4 * d4 * (2.0 * d4 + 3.0)
        |        + d5 * d5 * (2.0 * d5 + 3.0))) / 72.0) AS sigma
        |  FROM st),
        |zz AS (SELECT j, n,
        |    CASE WHEN sigma = 0.0 OR j = mean THEN 0.0
        |      ELSE round_even((j - mean - 0.5 * sign(j - mean)) / sigma
        |        * 1e6, 0) / 1e6 END AS z FROM mv),
        |ye AS (SELECT j, n, z, abs(z) / sqrt(2.0) AS y FROM zz)
        |SELECT j AS j_stat, z,
        |  round_even(${codyErfcSql("y")} * 1e6, 0) / 1e6 AS p_value,
        |  n, CAST(5 AS BIGINT) AS k FROM ye""".stripMargin,
    // Page-trend replay: decimal-exact (user, type) cell means,
    // complete blocks, the same midrank construction, the 1/2/3
    // hypothesized weights in funnel order, Cody erfc at rounded z.
    "q_page_trend" ->
      s"""WITH cell AS (SELECT user_id AS b, event_type AS t,
        |    CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
        |      / count(*) AS m
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |    AND NOT isnan(value)
        |    AND event_type IN ('click', 'view', 'purchase')
        |  GROUP BY user_id, event_type),
        |kc AS (SELECT b, count(*) AS kt FROM cell GROUP BY b),
        |ni AS (SELECT CAST(count(*) AS BIGINT) AS n_incomplete
        |  FROM kc WHERE kt <> 3),
        |comp AS (SELECT cell.b, cell.t, cell.m FROM cell
        |  JOIN kc ON cell.b = kc.b AND kc.kt = 3),
        |rk AS (SELECT b, t,
        |    (CAST(count(*) OVER (PARTITION BY b ORDER BY m
        |        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DOUBLE)
        |     + (4.0 - count(*) OVER (PARTITION BY b ORDER BY m DESC
        |        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))
        |      / 2.0 AS r
        |  FROM comp),
        |rs AS (SELECT t, sum(r) AS rj, CAST(count(*) AS BIGINT) AS bj
        |  FROM rk GROUP BY t),
        |lt AS (SELECT
        |    (1.0 * (SELECT rj FROM rs WHERE t = 'click')
        |      + 2.0 * (SELECT rj FROM rs WHERE t = 'view'))
        |      + 3.0 * (SELECT rj FROM rs WHERE t = 'purchase') AS l,
        |    (SELECT bj FROM rs WHERE t = 'click') AS b),
        |mv AS (SELECT l, b,
        |    CAST(b AS DOUBLE) * 3.0 * (3.0 + 1.0) * (3.0 + 1.0) / 4.0
        |      AS mean,
        |    sqrt(CAST(b AS DOUBLE) * 3.0 * 3.0 * (3.0 + 1.0)
        |      * (3.0 * 3.0 - 1.0) / 144.0) AS sigma FROM lt),
        |zz AS (SELECT l, b,
        |    CASE WHEN sigma = 0.0 OR l = mean THEN 0.0
        |      ELSE round_even((l - mean) / sigma * 1e6, 0) / 1e6 END
        |      AS z FROM mv),
        |ye AS (SELECT l, b, z, abs(z) / sqrt(2.0) AS y FROM zz)
        |SELECT l AS l_stat, z,
        |  round_even(${codyErfcSql("y")} * 1e6, 0) / 1e6 AS p_value,
        |  b AS n_blocks, ni.n_incomplete, CAST(3 AS BIGINT) AS k
        |FROM ye, ni""".stripMargin,
    // Kendall-W replay: the same cells/midranks, per-row tie terms
    // t^2-1, value-ORDERED squared-deviation fold, exp(-X/2) p.
    "q_kendall_w" ->
      """WITH cell AS (SELECT user_id AS b, event_type AS t,
        |    CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
        |      / count(*) AS m
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |    AND NOT isnan(value)
        |    AND event_type IN ('click', 'view', 'purchase')
        |  GROUP BY user_id, event_type),
        |kc AS (SELECT b, count(*) AS kt FROM cell GROUP BY b),
        |comp AS (SELECT cell.b, cell.t, cell.m FROM cell
        |  JOIN kc ON cell.b = kc.b AND kc.kt = 3),
        |rk AS (SELECT b, t,
        |    (CAST(count(*) OVER (PARTITION BY b ORDER BY m
        |        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DOUBLE)
        |     + (4.0 - count(*) OVER (PARTITION BY b ORDER BY m DESC
        |        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))
        |      / 2.0 AS r,
        |    count(*) OVER (PARTITION BY b ORDER BY m
        |      RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS tt
        |  FROM comp),
        |ag AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS nb,
        |    sum(CAST(tt AS DOUBLE) * tt - 1.0) AS ties FROM rk),
        |rs AS (SELECT t, sum(r) AS rj FROM rk GROUP BY t),
        |sv AS (SELECT ag.nb, ag.ties,
        |    sum((rj - CAST(ag.nb AS DOUBLE) * (3.0 + 1.0) / 2.0)
        |      * (rj - CAST(ag.nb AS DOUBLE) * (3.0 + 1.0) / 2.0)
        |      ORDER BY rj) AS s
        |  FROM rs, ag GROUP BY ag.nb, ag.ties),
        |wv AS (SELECT nb,
        |    round_even(12.0 * s
        |      / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE) * 3.0
        |        * (3.0 * 3.0 - 1.0) - CAST(nb AS DOUBLE) * ties)
        |      * 1e6, 0) / 1e6 AS w FROM sv),
        |cv AS (SELECT nb, w,
        |    round_even(CAST(nb AS DOUBLE) * (3.0 - 1.0) * w * 1e6, 0)
        |      / 1e6 AS chi2 FROM wv)
        |SELECT w, chi2, CAST(2 AS BIGINT) AS dof,
        |  round_even(exp(-chi2 / 2.0) * 1e6, 0) / 1e6 AS p_value,
        |  nb AS n_blocks, CAST(3 AS BIGINT) AS k FROM cv""".stripMargin,
    // Distance-correlation replay: the weighted cell-pair cross join,
    // double centering via joined row means, raw-ratio dCor.
    "q_distance_corr" ->
      """WITH c AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_discount AS DOUBLE) AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))),
        |cells AS MATERIALIZED (SELECT x, y,
        |    CAST(count(*) AS BIGINT) AS w FROM c GROUP BY x, y),
        |nn AS (SELECT CAST(sum(w) AS BIGINT) AS n,
        |    CAST(sum(w) AS DOUBLE) AS nd,
        |    CAST(count(*) AS BIGINT) AS ncells FROM cells),
        |pairs AS MATERIALIZED (SELECT k.x AS xk, k.y AS yk, k.w AS wk,
        |    l.x AS xl, l.y AS yl, l.w AS wl,
        |    abs(k.x - l.x) AS a, abs(k.y - l.y) AS bb
        |  FROM cells k CROSS JOIN cells l),
        |rm AS MATERIALIZED (SELECT xk, yk,
        |    sum(wl * a) / nn.nd AS am, sum(wl * bb) / nn.nd AS bm
        |  FROM pairs, nn GROUP BY xk, yk, nn.nd),
        |g AS (SELECT
        |    sum(CAST(wk AS DOUBLE) * wl * a) / (nn.nd * nn.nd) AS ag,
        |    sum(CAST(wk AS DOUBLE) * wl * bb) / (nn.nd * nn.nd) AS bg
        |  FROM pairs, nn GROUP BY nn.nd),
        |cen AS (SELECT p.wk, p.wl,
        |    p.a - mk.am - ml.am + g.ag AS ac,
        |    p.bb - mk.bm - ml.bm + g.bg AS bc
        |  FROM pairs p
        |  JOIN rm mk ON p.xk = mk.xk AND p.yk = mk.yk
        |  JOIN rm ml ON p.xl = ml.xk AND p.yl = ml.yk, g),
        |s AS (SELECT
        |    sum(CAST(wk AS DOUBLE) * wl * ac * bc) AS sab,
        |    sum(CAST(wk AS DOUBLE) * wl * ac * ac) AS saa,
        |    sum(CAST(wk AS DOUBLE) * wl * bc * bc) AS sbb FROM cen)
        |SELECT nn.n AS n, nn.ncells AS n_cells,
        |  round_even(s.sab / (nn.nd * nn.nd) * 1e6, 0) / 1e6 AS dcov2,
        |  round_even(s.saa / (nn.nd * nn.nd) * 1e6, 0) / 1e6 AS dvar_x,
        |  round_even(s.sbb / (nn.nd * nn.nd) * 1e6, 0) / 1e6 AS dvar_y,
        |  round_even(sqrt(greatest(s.sab / (nn.nd * nn.nd), 0.0)
        |    / sqrt((s.saa / (nn.nd * nn.nd))
        |      * (s.sbb / (nn.nd * nn.nd)))) * 1e6, 0) / 1e6 AS dcor
        |FROM s, nn""".stripMargin,
    // Neyman replay: decimal-exact stratum moments, name-ordered
    // folds for the shared totals, the same allocation arithmetic.
    "q_neyman" ->
      """WITH s AS (SELECT CAST(l_returnflag AS VARCHAR) AS h,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DOUBLE)
        |      AS DECIMAL(38,6))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DOUBLE)
        |      * CAST(l_extendedprice AS DOUBLE) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS sxx
        |  FROM lineitem WHERE l_returnflag IS NOT NULL
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |  GROUP BY l_returnflag),
        |st AS (SELECT h, n, CAST(n AS DOUBLE) AS nd,
        |    sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0)) AS sd FROM s),
        |tot AS (SELECT sum(nd ORDER BY h) AS bign,
        |    sum(nd * sd ORDER BY h) AS denom FROM st),
        |al AS (SELECT h, n, nd, sd,
        |    10000.0 * (nd * sd) / tot.denom AS ney,
        |    10000.0 * nd / tot.bign AS prop, tot.bign
        |  FROM st, tot),
        |vs AS (SELECT
        |    sum(nd / bign * (nd / bign) * sd * sd / ney ORDER BY h)
        |      AS vney,
        |    sum(nd / bign * (nd / bign) * sd * sd / prop ORDER BY h)
        |      AS vprop FROM al)
        |SELECT h AS stratum, n AS n_rows,
        |  round_even(sd * 1e6, 0) / 1e6 AS std,
        |  round_even(ney * 1e6, 0) / 1e6 AS neyman_n,
        |  round_even(prop * 1e6, 0) / 1e6 AS prop_n,
        |  round_even(vs.vney * 1e6, 0) / 1e6 AS v_neyman,
        |  round_even(vs.vprop * 1e6, 0) / 1e6 AS v_prop
        |FROM al, vs ORDER BY stratum""".stripMargin,
    // Capture-recapture replay: the same md5 coins, exact counts,
    // Lincoln-Petersen / Chapman arithmetic on them.
    "q_capture_recapture" ->
      """WITH k AS (SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS ks
        |  FROM orders WHERE o_custkey IS NOT NULL),
        |c AS (SELECT ks,
        |    CAST(('0x' || substr(md5(ks || '#' || 'c1'), 1, 8))
        |      AS BIGINT) % 100 < 30 AS c1,
        |    CAST(('0x' || substr(md5(ks || '#' || 'c2'), 1, 8))
        |      AS BIGINT) % 100 < 30 AS c2
        |  FROM k),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN c1 AND c2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ov FROM c)
        |SELECT n1, n2, ov AS overlap, n AS true_n,
        |  round_even(CAST(n1 AS DOUBLE) * n2 / ov * 1e6, 0) / 1e6
        |    AS lincoln,
        |  round_even(((n1 + 1.0) * (n2 + 1.0) / (ov + 1.0) - 1.0)
        |    * 1e6, 0) / 1e6 AS chapman,
        |  round_even(sqrt((n1 + 1.0) * (n2 + 1.0) * (n1 - ov)
        |    * (n2 - ov) / ((ov + 1.0) * (ov + 1.0) * (ov + 2.0)))
        |    * 1e6, 0) / 1e6 AS chapman_se
        |FROM a""".stripMargin,
    // Entropy-rate replay: the q_bigram_logprob bigram construction,
    // bigram and context-margin entropy folds, rint-rounded outputs.
    "q_entropy_rate" ->
      """WITH t AS (SELECT doc_id, list_filter(
        |    regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |    x -> x <> '') AS w FROM documents),
        |bg AS (SELECT unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS b FROM t WHERE len(w) >= 2),
        |big AS (SELECT b, CAST(count(*) AS BIGINT) AS cb FROM bg
        |  GROUP BY b),
        |tot AS (SELECT CAST(sum(cb) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS vb FROM big),
        |hb AS (SELECT sum(-(cb / (SELECT CAST(n AS DOUBLE) FROM tot))
        |    * ln(cb / (SELECT CAST(n AS DOUBLE) FROM tot))) AS h
        |  FROM big),
        |ctx AS (SELECT split_part(b, ' ', 1) AS w1,
        |    CAST(sum(cb) AS BIGINT) AS c1 FROM big GROUP BY 1),
        |hc AS (SELECT CAST(count(*) AS BIGINT) AS vc,
        |    sum(-(c1 / (SELECT CAST(n AS DOUBLE) FROM tot))
        |      * ln(c1 / (SELECT CAST(n AS DOUBLE) FROM tot))) AS h
        |  FROM ctx)
        |SELECT tot.n AS n_bigrams, tot.vb AS vocab_bigrams,
        |  hc.vc AS vocab_contexts,
        |  round_even(hb.h * 1e6, 0) / 1e6 AS h_bigram,
        |  round_even(hc.h * 1e6, 0) / 1e6 AS h_context,
        |  round_even((hb.h - hc.h) * 1e6, 0) / 1e6 AS h_rate,
        |  round_even(exp(hb.h - hc.h) * 1e6, 0) / 1e6 AS perplexity
        |FROM tot, hb, hc""".stripMargin,
    // Hill-numbers replay: token counts, the Shannon and Simpson
    // folds, rint-rounded effective-vocabulary outputs.
    "q_diversity" ->
      """WITH tok AS (SELECT
        |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        |  FROM documents),
        |cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok
        |  GROUP BY w),
        |a AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS v FROM cnt),
        |f AS (SELECT
        |    sum(-(c / (SELECT CAST(n AS DOUBLE) FROM a))
        |      * ln(c / (SELECT CAST(n AS DOUBLE) FROM a))) AS h,
        |    sum((c / (SELECT CAST(n AS DOUBLE) FROM a))
        |      * (c / (SELECT CAST(n AS DOUBLE) FROM a))) AS simp
        |  FROM cnt)
        |SELECT a.n AS n_tokens, a.v AS d0,
        |  round_even(exp(f.h) * 1e6, 0) / 1e6 AS d1,
        |  round_even(1.0 / f.simp * 1e6, 0) / 1e6 AS d2,
        |  round_even(exp(f.h) / a.v * 1e6, 0) / 1e6 AS evenness
        |FROM a, f""".stripMargin,
    // JSD-matrix replay: per-slice unigram shares, the word-keyed
    // pair join, matched terms + ln2 mass complements.
    "q_jsd_matrix" ->
      """WITH tok AS (SELECT lang AS s,
        |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        |  FROM documents WHERE lang IS NOT NULL),
        |cnt AS (SELECT s, w, CAST(count(*) AS BIGINT) AS c FROM tok
        |  GROUP BY s, w),
        |tot AS (SELECT s, CAST(sum(c) AS BIGINT) AS t FROM cnt
        |  GROUP BY s),
        |p AS (SELECT cnt.s, cnt.w, CAST(cnt.c AS DOUBLE) / tot.t AS p
        |  FROM cnt JOIN tot ON cnt.s = tot.s),
        |m AS (SELECT a.s AS sa, b.s AS sb,
        |    CAST(count(*) AS BIGINT) AS n_shared_words,
        |    sum(a.p * ln(2.0 * a.p / (a.p + b.p))) AS ta,
        |    sum(b.p * ln(2.0 * b.p / (a.p + b.p))) AS tb,
        |    sum(a.p) AS ma, sum(b.p) AS mb
        |  FROM p a JOIN p b ON a.w = b.w AND a.s < b.s
        |  GROUP BY a.s, b.s),
        |pr AS (SELECT a.s AS sa, b.s AS sb FROM tot a, tot b
        |  WHERE a.s < b.s),
        |j AS (SELECT pr.sa, pr.sb,
        |    coalesce(m.n_shared_words, CAST(0 AS BIGINT))
        |      AS n_shared_words,
        |    (coalesce(m.ta, 0.0) + (1.0 - coalesce(m.ma, 0.0)) * ln(2.0)
        |      + coalesce(m.tb, 0.0)
        |      + (1.0 - coalesce(m.mb, 0.0)) * ln(2.0))
        |      / 2.0 AS jsd FROM pr LEFT JOIN m
        |    ON pr.sa = m.sa AND pr.sb = m.sb)
        |SELECT sa AS slice_a, sb AS slice_b, n_shared_words,
        |  round(jsd, 6) AS jsd,
        |  round(sqrt(greatest(jsd, 0.0)), 6) AS js_dist
        |FROM j ORDER BY slice_a, slice_b""".stripMargin,
    // BM25 replay: one token frame feeds lengths and query-term tfs,
    // the exact Lucene idf/tf formula, top-20 on the rounded score.
    "q_bm25" ->
      """WITH tok AS MATERIALIZED (SELECT doc_id AS id,
        |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        |  FROM documents WHERE doc_id IS NOT NULL
        |    AND text IS NOT NULL),
        |dls AS MATERIALIZED (SELECT id, CAST(count(*) AS BIGINT) AS dl
        |  FROM tok GROUP BY id),
        |corpus AS (SELECT CAST(count(*) AS BIGINT) AS nd,
        |    CAST(sum(dl) AS BIGINT) AS tt FROM dls),
        |tf AS (SELECT id, w, CAST(count(*) AS BIGINT) AS tf FROM tok
        |  WHERE w IN ('join', 'hash', 'vector') GROUP BY id, w),
        |dfx AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf
        |  GROUP BY w),
        |sc AS (SELECT tf.id,
        |    ln(1.0 + (CAST(nd AS DOUBLE) - df + 0.5) / (df + 0.5))
        |      * (CAST(tf AS DOUBLE) * (1.2 + 1.0))
        |      / (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * dl
        |        / (CAST(tt AS DOUBLE) / nd))) AS term
        |  FROM tf JOIN dfx ON tf.w = dfx.w
        |    JOIN dls ON tf.id = dls.id, corpus),
        |agg AS (SELECT id, CAST(count(*) AS BIGINT)
        |      AS n_terms_matched,
        |    round(sum(term), 6) AS score FROM sc GROUP BY id)
        |SELECT id AS doc_id, n_terms_matched, score FROM agg
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    // Moore-Lewis replay: two token-count tables, the full-outer LM
    // vocab, per-token log ratios, per-doc mean, top-25.
    "q_moore_lewis" ->
      """WITH tt AS MATERIALIZED (SELECT doc_id AS id,
        |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        |  FROM documents WHERE lang = 'en' AND doc_id IS NOT NULL
        |    AND text IS NOT NULL),
        |tp AS MATERIALIZED (SELECT doc_id AS id,
        |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        |  FROM documents WHERE lang <> 'en' AND doc_id IS NOT NULL
        |    AND text IS NOT NULL),
        |ct AS (SELECT w, CAST(count(*) AS BIGINT) AS ct FROM tt
        |  GROUP BY w),
        |cp AS (SELECT w, CAST(count(*) AS BIGINT) AS cp FROM tp
        |  GROUP BY w),
        |vo AS MATERIALIZED (SELECT coalesce(ct.w, cp.w) AS w,
        |    coalesce(ct.ct, CAST(0 AS BIGINT)) AS ctc,
        |    coalesce(cp.cp, CAST(0 AS BIGINT)) AS cpc
        |  FROM ct FULL JOIN cp ON ct.w = cp.w),
        |tot AS (SELECT CAST(sum(ctc) AS BIGINT) AS nt,
        |    CAST(sum(cpc) AS BIGINT) AS np,
        |    CAST(count(*) AS BIGINT) AS v FROM vo),
        |lr AS MATERIALIZED (SELECT w,
        |    ln(CAST(ctc + 1 AS DOUBLE) / (nt + v))
        |      - ln(CAST(cpc + 1 AS DOUBLE) / (np + v)) AS lr
        |  FROM vo, tot),
        |agg AS (SELECT id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    round(sum(lr) / count(*), 6) + 0.0 AS score
        |  FROM tp JOIN lr ON tp.w = lr.w GROUP BY id)
        |SELECT id AS doc_id, n_tokens, score FROM agg
        |ORDER BY score DESC, doc_id LIMIT 25""".stripMargin,
    // Longest-streak replay: decimal-exact key means, strict > flag,
    // rn - rn_by_flag islands, (len DESC, start) pick.
    "q_longest_streak" ->
      """WITH e AS (SELECT event_type AS k,
        |    epoch_ns(ts) // 86400000000000 AS p, value AS x
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |cells AS (SELECT k, p,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS v
        |  FROM e GROUP BY k, p),
        |f AS (SELECT k, p, v,
        |    CAST(count(*) OVER wk AS BIGINT) AS n,
        |    CAST(sum(CAST(v AS DECIMAL(38,6))) OVER wk AS DOUBLE)
        |      / CAST(count(*) OVER wk AS DOUBLE) AS mu,
        |    row_number() OVER (PARTITION BY k ORDER BY p) AS rn
        |  FROM cells WINDOW wk AS (PARTITION BY k)),
        |h AS (SELECT k, p, n, rn, v > mu AS hot FROM f),
        |g AS (SELECT k, p, n,
        |    rn - row_number() OVER (PARTITION BY k, hot ORDER BY p)
        |      AS grp, hot FROM h),
        |i AS (SELECT k, grp, CAST(count(*) AS BIGINT) AS len,
        |    min(p) AS start, CAST(max(n) AS BIGINT) AS n
        |  FROM g WHERE hot GROUP BY k, grp),
        |r AS (SELECT k, n, len, start,
        |    CAST(sum(len) OVER (PARTITION BY k) AS BIGINT) AS n_above,
        |    CAST(max(len) OVER (PARTITION BY k) AS BIGINT)
        |      AS longest_streak,
        |    row_number() OVER (PARTITION BY k ORDER BY len DESC, start)
        |      AS rnk
        |  FROM i)
        |SELECT k AS event_type, n AS n_periods, n_above,
        |  longest_streak, start AS streak_start
        |FROM r WHERE rnk = 1 ORDER BY event_type""".stripMargin,
    // Chao1 replay: token frequency-of-frequencies, the bias-corrected
    // richness and Good's coverage — exact integers to the end.
    "q_chao1" ->
      """WITH tok AS (SELECT
        |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        |  FROM documents),
        |cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok
        |  GROUP BY w),
        |a AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS f1,
        |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS f2 FROM cnt)
        |SELECT n AS n_tokens, v AS vocab, f1, f2,
        |  round_even((v + CAST(f1 AS DOUBLE) * (f1 - 1.0)
        |    / (2.0 * (f2 + 1.0))) * 1e6, 0) / 1e6 AS chao1,
        |  round_even((1.0 - CAST(f1 AS DOUBLE) / n) * 1e6, 0) / 1e6
        |    AS coverage
        |FROM a""".stripMargin,
    // Chatterjee xi replay: RANGE-frame cumulative y-counts up and down
    // per flag, the deterministic (x, y, orderkey, linenumber) lag
    // order, exact integer numerator/denominator, one final ratio.
    "q_xicor" ->
      """WITH c AS (SELECT l_returnflag AS g,
        |    CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y,
        |    l_orderkey AS k1, l_linenumber AS k2
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |r AS (SELECT g, x, y, k1, k2,
        |    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n,
        |    CAST(count(*) OVER (PARTITION BY g ORDER BY y
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS r,
        |    CAST(count(*) OVER (PARTITION BY g ORDER BY y DESC
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS l
        |  FROM c),
        |d AS (SELECT g, n, l,
        |    abs(r - lag(r) OVER (PARTITION BY g ORDER BY x, k1, k2, y))
        |      AS dr
        |  FROM r)
        |SELECT g AS l_returnflag, max(n) AS n,
        |  round(1.0 - CAST(max(n) AS DOUBLE) * sum(dr)
        |    / (2.0 * sum(l * (n - l))), 6) + 0.0 AS xi
        |FROM d GROUP BY g ORDER BY g""".stripMargin,
    // Circular-stats replay: fold each event to its day-phase angle,
    // round the two trig sums FIRST (partial-sum order + trig ULPs die
    // there), then every derived statistic from the rounded values.
    "q_circular" ->
      """WITH e AS (SELECT event_type AS k,
        |    epoch_ns(ts) % 86400000000000 AS m
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        |a AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    round(sum(cos(CAST(m AS DOUBLE) / 86400000000000.0
        |      * 2.0 * pi())), 6) + 0.0 AS c_sum,
        |    round(sum(sin(CAST(m AS DOUBLE) / 86400000000000.0
        |      * 2.0 * pi())), 6) + 0.0 AS s_sum
        |  FROM e GROUP BY k),
        |b AS (SELECT k, n, c_sum, s_sum,
        |    round(sqrt(c_sum * c_sum + s_sum * s_sum)
        |      / CAST(n AS DOUBLE), 6) AS r_bar FROM a),
        |z AS (SELECT k, n, c_sum, s_sum, r_bar,
        |    round(CAST(n AS DOUBLE) * r_bar * r_bar, 6) AS rayleigh_z
        |  FROM b)
        |SELECT k AS event_type, n, c_sum, s_sum, r_bar,
        |  round(atan2(s_sum, c_sum), 6) + 0.0 AS mean_angle,
        |  round(1.0 - r_bar, 6) AS circ_var, rayleigh_z,
        |  round(exp(-rayleigh_z) * (1.0 + (2.0 * rayleigh_z
        |    - rayleigh_z * rayleigh_z) / (4.0 * CAST(n AS DOUBLE))), 6)
        |    + 0.0 AS p_value
        |FROM z ORDER BY event_type""".stripMargin,
    // The pairwise-slope multiset is orientation-invariant, so the
    // replay pairs in (orderkey, linenumber) order instead of the
    // engine's md5 cap order (no group exceeds the cap here); lower
    // medians are exact order statistics — note CAST-vs-floor: DuckDB
    // CAST(double AS INT) rounds, so the rank select floors explicitly
    // Conditional-quantile trend replay: equal-width bins from exact
    // min/max, the ceil(n*tau) order statistic per bin via cumulative
    // cells, then the count-weighted OLS over the bin centers.
    "q_quantile_reg" ->
      """WITH base AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |mm AS (SELECT min(x) AS lo, max(x) AS hi FROM base),
        |bx AS (SELECT least(9, greatest(0,
        |    CAST(floor((x - mm.lo) / (mm.hi - mm.lo) * 10) AS BIGINT)))
        |    AS b, y
        |  FROM base, mm),
        |cells AS (SELECT b, y, CAST(count(*) AS BIGINT) AS c
        |  FROM bx GROUP BY b, y),
        |w AS (SELECT b, y, c,
        |    CAST(sum(c) OVER (PARTITION BY b) AS BIGINT) AS n,
        |    CAST(sum(c) OVER (PARTITION BY b ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM cells),
        |bins AS (SELECT b, CAST(max(n) AS BIGINT) AS n,
        |    min(CASE WHEN cum >= ceil(CAST(n AS DOUBLE) * 0.9)
        |      THEN y END) AS q_y
        |  FROM w GROUP BY b),
        |binc AS (SELECT b, n, q_y,
        |    mm.lo + (CAST(b AS DOUBLE) + 0.5) * ((mm.hi - mm.lo) / 10.0)
        |      AS x_center
        |  FROM bins, mm),
        |fit AS (SELECT sum(CAST(n AS DOUBLE)) AS sw,
        |    sum(CAST(n AS DOUBLE) * x_center) AS swx,
        |    sum(CAST(n AS DOUBLE) * q_y) AS swy,
        |    sum(CAST(n AS DOUBLE) * x_center * x_center) AS swxx,
        |    sum(CAST(n AS DOUBLE) * x_center * q_y) AS swxy FROM binc),
        |l AS (SELECT (sw * swxy - swx * swy)
        |      / (sw * swxx - swx * swx) AS slope,
        |    sw, swx, swy FROM fit)
        |SELECT binc.b AS bin, binc.x_center, binc.n, binc.q_y,
        |  round(l.slope, 6) + 0.0 AS slope,
        |  round((l.swy - l.slope * l.swx) / l.sw, 6) + 0.0 AS intercept
        |FROM binc, l ORDER BY bin""".stripMargin,
    // Ridge-path replay: decimal-exact raw moments, centered 2x2
    // Cramer with lambda on the diagonal, the same three lambda
    // literals; + 0.0 everywhere F.round may meet a tiny negative.
    "q_ridge" ->
      """WITH g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(CAST(l_quantity AS DOUBLE) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS s1,
        |    CAST(sum(CAST(CAST(l_discount AS DOUBLE) * 100
        |      AS DECIMAL(38,6))) AS DOUBLE) AS s2,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DOUBLE)
        |      AS DECIMAL(38,6))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(CAST(l_quantity AS DOUBLE)
        |      * CAST(l_quantity AS DOUBLE) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS s11,
        |    CAST(sum(CAST(CAST(l_quantity AS DOUBLE)
        |      * (CAST(l_discount AS DOUBLE) * 100) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS s12,
        |    CAST(sum(CAST((CAST(l_discount AS DOUBLE) * 100)
        |      * (CAST(l_discount AS DOUBLE) * 100) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS s22,
        |    CAST(sum(CAST(CAST(l_quantity AS DOUBLE)
        |      * CAST(l_extendedprice AS DOUBLE) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS s1y,
        |    CAST(sum(CAST((CAST(l_discount AS DOUBLE) * 100)
        |      * CAST(l_extendedprice AS DOUBLE) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS s2y
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_discount IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND NOT isnan(CAST(l_discount AS DOUBLE) * 100)
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |lam AS (SELECT CAST(l AS DOUBLE) AS lambda
        |  FROM (VALUES (0.0), (1000000.0), (100000000.0)) AS t(l)),
        |c AS (SELECT lam.lambda, g.n, CAST(g.n AS DOUBLE) AS nd,
        |    g.s1, g.s2, g.sy,
        |    g.s11 - g.s1 * g.s1 / CAST(g.n AS DOUBLE) AS c11,
        |    g.s12 - g.s1 * g.s2 / CAST(g.n AS DOUBLE) AS c12,
        |    g.s22 - g.s2 * g.s2 / CAST(g.n AS DOUBLE) AS c22,
        |    g.s1y - g.s1 * g.sy / CAST(g.n AS DOUBLE) AS c1y,
        |    g.s2y - g.s2 * g.sy / CAST(g.n AS DOUBLE) AS c2y
        |  FROM g, lam),
        |d AS (SELECT lambda, n, nd, s1, s2, sy, c1y, c2y, c12,
        |    (c11 + lambda) * (c22 + lambda) - c12 * c12 AS det,
        |    c11, c22 FROM c),
        |b AS (SELECT lambda, n, nd, s1, s2, sy,
        |    (c1y * (c22 + lambda) - c12 * c2y) / det AS b1,
        |    ((c11 + lambda) * c2y - c12 * c1y) / det AS b2
        |  FROM d WHERE abs(det) > 1e-12 AND n >= 4)
        |SELECT lambda, n, round(b1, 6) + 0.0 AS beta1,
        |  round(b2, 6) + 0.0 AS beta2,
        |  round(sy / nd - b1 * (s1 / nd) - b2 * (s2 / nd), 6) + 0.0
        |    AS intercept
        |FROM b ORDER BY lambda""".stripMargin,
    // Probit replay: three Fisher steps with the Cody-erfc mean and
    // clamped weights, 2x2 Cramer per step, final ll/Brier pass.
    "q_probit" -> probitOracleSql,
    // C-index replay: (duration, score) cells with event counts, the
    // t1 < t2 cell-pair join, exact integer concordance counts.
    "q_cindex" ->
      """WITH c AS (SELECT CAST(l_quantity AS DOUBLE) AS t,
        |    CAST(l_discount AS DOUBLE) AS s,
        |    (l_returnflag <> 'N') AS e
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_discount IS NOT NULL AND l_returnflag IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))),
        |cells AS (SELECT t, s,
        |    CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS ev,
        |    CAST(count(*) AS BIGINT) AS cn
        |  FROM c GROUP BY t, s),
        |nn AS (SELECT CAST(sum(cn) AS BIGINT) AS n FROM cells),
        |p AS (SELECT a.ev AS e1, a.s AS s1, b.s AS s2, b.cn AS c2
        |  FROM cells a JOIN cells b ON a.t < b.t),
        |agg AS (SELECT
        |    CAST(coalesce(sum(e1 * c2), 0) AS BIGINT) AS comp,
        |    CAST(coalesce(sum(CASE WHEN s1 > s2 THEN e1 * c2 ELSE 0
        |      END), 0) AS BIGINT) AS conc,
        |    CAST(coalesce(sum(CASE WHEN s1 = s2 THEN e1 * c2 ELSE 0
        |      END), 0) AS BIGINT) AS tied FROM p)
        |SELECT nn.n, agg.comp AS n_comparable,
        |  agg.conc AS n_concordant, agg.tied AS n_tied_score,
        |  round_even((conc + 0.5 * tied) / comp * 1e6, 0) / 1e6
        |    AS c_index,
        |  round_even((2.0 * ((conc + 0.5 * tied) / comp) - 1.0)
        |    * 1e6, 0) / 1e6 AS somers_d
        |FROM agg, nn""".stripMargin,
    // Lasso replay: decimal-exact moments, the three rint-rounded
    // correlations, 20 coordinate-descent sweeps as a RECURSIVE CTE
    // (b1's fresh value inlined into b2's update, as the engine
    // sequences them), exact back-transform from the raw moments.
    "q_lasso" ->
      """WITH RECURSIVE g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(CAST(l_quantity AS DOUBLE) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS s1,
        |    CAST(sum(CAST(CAST(l_discount AS DOUBLE) * 100
        |      AS DECIMAL(38,6))) AS DOUBLE) AS s2,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DOUBLE)
        |      AS DECIMAL(38,6))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(CAST(l_quantity AS DOUBLE)
        |      * CAST(l_quantity AS DOUBLE) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS s11,
        |    CAST(sum(CAST(CAST(l_quantity AS DOUBLE)
        |      * (CAST(l_discount AS DOUBLE) * 100) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS s12,
        |    CAST(sum(CAST((CAST(l_discount AS DOUBLE) * 100)
        |      * (CAST(l_discount AS DOUBLE) * 100) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS s22,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DOUBLE)
        |      * CAST(l_extendedprice AS DOUBLE) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS syy,
        |    CAST(sum(CAST(CAST(l_quantity AS DOUBLE)
        |      * CAST(l_extendedprice AS DOUBLE) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS s1y,
        |    CAST(sum(CAST((CAST(l_discount AS DOUBLE) * 100)
        |      * CAST(l_extendedprice AS DOUBLE) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS s2y
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_discount IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND NOT isnan(CAST(l_discount AS DOUBLE) * 100)
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |mo AS (SELECT n, s1 / CAST(n AS DOUBLE) AS m1,
        |    s2 / CAST(n AS DOUBLE) AS m2, sy / CAST(n AS DOUBLE) AS my,
        |    sqrt(s11 / CAST(n AS DOUBLE) - (s1 / CAST(n AS DOUBLE))
        |      * (s1 / CAST(n AS DOUBLE))) AS sd1,
        |    sqrt(s22 / CAST(n AS DOUBLE) - (s2 / CAST(n AS DOUBLE))
        |      * (s2 / CAST(n AS DOUBLE))) AS sd2,
        |    sqrt(syy / CAST(n AS DOUBLE) - (sy / CAST(n AS DOUBLE))
        |      * (sy / CAST(n AS DOUBLE))) AS sdy,
        |    s12, s1y, s2y FROM g),
        |co AS (SELECT n, m1, m2, my, sd1, sd2, sdy,
        |    round_even((s12 / CAST(n AS DOUBLE) - m1 * m2)
        |      / (sd1 * sd2) * 1e6, 0) / 1e6 AS r12,
        |    round_even((s1y / CAST(n AS DOUBLE) - m1 * my)
        |      / (sd1 * sdy) * 1e6, 0) / 1e6 AS r1y,
        |    round_even((s2y / CAST(n AS DOUBLE) - m2 * my)
        |      / (sd2 * sdy) * 1e6, 0) / 1e6 AS r2y
        |  FROM mo),
        |lam AS (SELECT CAST(l AS DOUBLE) AS lambda
        |  FROM (VALUES (0.0), (0.05), (0.3)) AS t(l)),
        |cd AS (
        |  SELECT lambda, 0 AS i, CAST(0.0 AS DOUBLE) AS b1,
        |    CAST(0.0 AS DOUBLE) AS b2 FROM lam
        |  UNION ALL
        |  SELECT lambda, i + 1,
        |    sign(c.r1y - c.r12 * b2)
        |      * greatest(abs(c.r1y - c.r12 * b2) - lambda, 0.0),
        |    sign(c.r2y - c.r12 * (sign(c.r1y - c.r12 * b2)
        |        * greatest(abs(c.r1y - c.r12 * b2) - lambda, 0.0)))
        |      * greatest(abs(c.r2y - c.r12 * (sign(c.r1y - c.r12 * b2)
        |        * greatest(abs(c.r1y - c.r12 * b2) - lambda, 0.0)))
        |        - lambda, 0.0)
        |  FROM cd, co c WHERE i < 20)
        |SELECT lambda, round_even(b1 * 1e6, 0) / 1e6 AS beta1_std,
        |  round_even(b2 * 1e6, 0) / 1e6 AS beta2_std,
        |  round_even(b1 * c.sdy / c.sd1 * 1e6, 0) / 1e6 AS beta1,
        |  round_even(b2 * c.sdy / c.sd2 * 1e6, 0) / 1e6 AS beta2,
        |  round_even((c.my - b1 * c.sdy / c.sd1 * c.m1
        |    - b2 * c.sdy / c.sd2 * c.m2) * 1e6, 0) / 1e6 AS intercept,
        |  CAST((CASE WHEN b1 <> 0.0 THEN 1 ELSE 0 END)
        |    + (CASE WHEN b2 <> 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_nonzero
        |FROM cd, co c WHERE i = 20 ORDER BY lambda""".stripMargin,
    // k=3 elastic-net replay: one coordinate per recursion step,
    // cycling j = i mod 3 in the engine's Gauss-Seidel order.
    "q_lasso_k" -> lassoKOracleSql,
    // Weighted-kappa replay: integer (i, j) cells, quadratic weights
    // on both the observed and expected folds, exact margins.
    "q_weighted_kappa" ->
      """WITH c AS (SELECT
        |    CAST(floor(CAST(l_quantity AS DOUBLE) / 10) AS INT) AS i,
        |    CAST(floor((CAST(l_quantity AS DOUBLE) + l_linenumber)
        |      / 10) AS INT) AS j
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_linenumber IS NOT NULL),
        |m AS (SELECT i, j, CAST(count(*) AS BIGINT) AS n
        |  FROM c WHERE i BETWEEN 0 AND 5 AND j BETWEEN 0 AND 5
        |  GROUP BY i, j),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n,
        |    sum((1.0 - (CAST(i - j AS DOUBLE) / 5.0)
        |      * (CAST(i - j AS DOUBLE) / 5.0)) * n) AS wo FROM m),
        |ra AS (SELECT i, CAST(sum(n) AS BIGINT) AS ni FROM m GROUP BY i),
        |rb AS (SELECT j, CAST(sum(n) AS BIGINT) AS nj FROM m GROUP BY j),
        |pe AS (SELECT sum((1.0 - (CAST(ra.i - rb.j AS DOUBLE) / 5.0)
        |    * (CAST(ra.i - rb.j AS DOUBLE) / 5.0))
        |    * CAST(ra.ni AS DOUBLE) * rb.nj) AS we
        |  FROM ra CROSS JOIN rb)
        |SELECT
        |  CASE WHEN pe.we / (CAST(tot.n AS DOUBLE) * tot.n) < 1.0
        |    THEN round((tot.wo / CAST(tot.n AS DOUBLE)
        |      - pe.we / (CAST(tot.n AS DOUBLE) * tot.n))
        |      / (1.0 - pe.we / (CAST(tot.n AS DOUBLE) * tot.n)), 6)
        |    END AS kappa_w,
        |  round(tot.wo / CAST(tot.n AS DOUBLE), 6) AS po_w,
        |  round(pe.we / (CAST(tot.n AS DOUBLE) * tot.n), 6) AS pe_w,
        |  tot.n
        |FROM tot, pe""".stripMargin,
    // VIF replay: 6-rounded pairwise correlations (rint convention),
    // exact closed-form 3x3 inverse diagonal on the rounded r's.
    "q_vif" ->
      """WITH g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(CAST(l_quantity AS DOUBLE) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS s1,
        |    CAST(sum(CAST(CAST(l_discount AS DOUBLE) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS s2,
        |    CAST(sum(CAST(CAST(l_tax AS DOUBLE) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS s3,
        |    CAST(sum(CAST(CAST(l_quantity AS DOUBLE)
        |      * CAST(l_quantity AS DOUBLE) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS s11,
        |    CAST(sum(CAST(CAST(l_discount AS DOUBLE)
        |      * CAST(l_discount AS DOUBLE) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS s22,
        |    CAST(sum(CAST(CAST(l_tax AS DOUBLE)
        |      * CAST(l_tax AS DOUBLE) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS s33,
        |    CAST(sum(CAST(CAST(l_quantity AS DOUBLE)
        |      * CAST(l_discount AS DOUBLE) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS s12,
        |    CAST(sum(CAST(CAST(l_quantity AS DOUBLE)
        |      * CAST(l_tax AS DOUBLE) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS s13,
        |    CAST(sum(CAST(CAST(l_discount AS DOUBLE)
        |      * CAST(l_tax AS DOUBLE) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS s23
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_discount IS NOT NULL AND l_tax IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))
        |    AND NOT isnan(CAST(l_tax AS DOUBLE))),
        |r AS (SELECT CAST(n AS DOUBLE) AS nd,
        |    round_even((s12 - s1 * s2 / CAST(n AS DOUBLE))
        |      / sqrt((s11 - s1 * s1 / CAST(n AS DOUBLE))
        |        * (s22 - s2 * s2 / CAST(n AS DOUBLE))) * 1e6, 0) / 1e6
        |      AS r12,
        |    round_even((s13 - s1 * s3 / CAST(n AS DOUBLE))
        |      / sqrt((s11 - s1 * s1 / CAST(n AS DOUBLE))
        |        * (s33 - s3 * s3 / CAST(n AS DOUBLE))) * 1e6, 0) / 1e6
        |      AS r13,
        |    round_even((s23 - s2 * s3 / CAST(n AS DOUBLE))
        |      / sqrt((s22 - s2 * s2 / CAST(n AS DOUBLE))
        |        * (s33 - s3 * s3 / CAST(n AS DOUBLE))) * 1e6, 0) / 1e6
        |      AS r23
        |  FROM g),
        |dt AS (SELECT r12, r13, r23,
        |    1.0 - r12 * r12 - r13 * r13 - r23 * r23
        |      + 2.0 * r12 * r13 * r23 AS det FROM r),
        |v AS (SELECT 'l_quantity' AS feature,
        |    (1.0 - r23 * r23) / det AS vif FROM dt
        |  UNION ALL SELECT 'l_discount', (1.0 - r13 * r13) / det FROM dt
        |  UNION ALL SELECT 'l_tax', (1.0 - r12 * r12) / det FROM dt)
        |SELECT feature,
        |  round_even((1.0 - 1.0 / vif) * 1e6, 0) / 1e6 AS r2_other,
        |  round_even(vif * 1e6, 0) / 1e6 AS vif
        |FROM v ORDER BY feature""".stripMargin,
    // Influence replay: decimal-exact moments collapse to the same six
    // rint-rounded scalars, per-row leverage/Cook's D as exact
    // arithmetic on them, ORDER BY (d DESC, ids) LIMIT 20.
    "q_cooks" ->
      """WITH base AS (SELECT l_orderkey, l_linenumber, l_partkey,
        |    l_suppkey, CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy
        |  FROM base),
        |sc AS (SELECT CAST(n AS DOUBLE) AS nd,
        |    sxx - sx * sx / CAST(n AS DOUBLE) AS cxx,
        |    sxy - sx * sy / CAST(n AS DOUBLE) AS cxy,
        |    syy - sy * sy / CAST(n AS DOUBLE) AS cyy,
        |    sx, sy FROM g),
        |k AS (SELECT nd,
        |    round_even(cxy / cxx * 1e6, 0) / 1e6 AS beta,
        |    round_even((sy / nd - (cxy / cxx) * (sx / nd)) * 1e6, 0)
        |      / 1e6 AS alpha,
        |    round_even(sx / nd * 1e6, 0) / 1e6 AS mx,
        |    round_even(cxx * 1e6, 0) / 1e6 AS sxxr,
        |    round_even((cyy - cxy * cxy / cxx) / (nd - 2.0) * 1e6, 0)
        |      / 1e6 AS s2 FROM sc),
        |rows_ AS (SELECT b.l_orderkey, b.l_linenumber, b.l_partkey,
        |    b.l_suppkey, b.x, b.y,
        |    b.y - (k.alpha + k.beta * b.x) AS e,
        |    (1.0 / k.nd) + (b.x - k.mx) * (b.x - k.mx) / k.sxxr AS h,
        |    k.s2 FROM base b, k),
        |d AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    x, y, round(e, 6) + 0.0 AS resid, round(h, 6) AS leverage,
        |    round(e * e / (s2 * (1.0 - h)) * h / (2.0 * (1.0 - h)), 6)
        |      AS cooks_d
        |  FROM rows_)
        |SELECT * FROM d ORDER BY cooks_d DESC, l_orderkey,
        |  l_linenumber, l_partkey, l_suppkey LIMIT 20""".stripMargin,
    // Breusch-Pagan replay: rounded (alpha, beta) from decimal-exact
    // OLS moments, raw auxiliary sums of the reproducible u^2, LM
    // rounded at 6, p = Cody erfc(sqrt(LM/2)) (df = 1).
    "q_breusch_pagan" ->
      s"""WITH base AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy
        |  FROM base),
        |sc AS (SELECT n, CAST(n AS DOUBLE) AS nd,
        |    sxx - sx * sx / CAST(n AS DOUBLE) AS cxx,
        |    sxy - sx * sy / CAST(n AS DOUBLE) AS cxy, sx, sy FROM g),
        |k AS (SELECT n, nd, sx, cxx,
        |    round_even(cxy / cxx * 1e6, 0) / 1e6 AS beta,
        |    round_even((sy / nd - (cxy / cxx) * (sx / nd)) * 1e6, 0)
        |      / 1e6 AS alpha FROM sc),
        |aux AS (SELECT k.n, k.nd, k.sx, k.cxx, k.beta, k.alpha,
        |    sum((b.y - (k.alpha + k.beta * b.x))
        |      * (b.y - (k.alpha + k.beta * b.x))) AS su,
        |    sum(((b.y - (k.alpha + k.beta * b.x))
        |      * (b.y - (k.alpha + k.beta * b.x)))
        |      * ((b.y - (k.alpha + k.beta * b.x))
        |        * (b.y - (k.alpha + k.beta * b.x)))) AS suu,
        |    sum(b.x * ((b.y - (k.alpha + k.beta * b.x))
        |      * (b.y - (k.alpha + k.beta * b.x)))) AS sxu
        |  FROM base b, k
        |  GROUP BY k.n, k.nd, k.sx, k.cxx, k.beta, k.alpha),
        |lm AS (SELECT n, beta, alpha,
        |    round_even(nd * ((sxu - sx * su / nd) * (sxu - sx * su / nd)
        |      / (cxx * (suu - su * su / nd))) * 1e6, 0) / 1e6 AS lm_stat
        |  FROM aux),
        |ye AS (SELECT n, beta, alpha, lm_stat,
        |    sqrt(lm_stat / 2.0) AS y FROM lm)
        |SELECT n, lm_stat, CAST(1 AS BIGINT) AS dof,
        |  round_even(${codyErfcSql("y")} * 1e6, 0) / 1e6 AS p_value,
        |  beta, alpha FROM ye""".stripMargin,
    // Chow replay: one conditional decimal-exact moment pass (FILTER
    // mirrors the engine's masked sums exactly on decimals), centered
    // closed-form SSEs, the same F shape; p omitted (F CDF not SQL).
    "q_chow" ->
      """WITH base AS (SELECT
        |    CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n0,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx0,
        |    CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy0,
        |    CAST(sum(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx0,
        |    CAST(sum(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy0,
        |    CAST(sum(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy0,
        |    CAST(count(*) FILTER (WHERE g = 'a') AS BIGINT) AS n1,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) FILTER (WHERE g = 'a')
        |      AS DOUBLE) AS sx1,
        |    CAST(sum(CAST(y AS DECIMAL(38,6))) FILTER (WHERE g = 'a')
        |      AS DOUBLE) AS sy1,
        |    CAST(sum(CAST(x * x AS DECIMAL(38,6)))
        |      FILTER (WHERE g = 'a') AS DOUBLE) AS sxx1,
        |    CAST(sum(CAST(x * y AS DECIMAL(38,6)))
        |      FILTER (WHERE g = 'a') AS DOUBLE) AS sxy1,
        |    CAST(sum(CAST(y * y AS DECIMAL(38,6)))
        |      FILTER (WHERE g = 'a') AS DOUBLE) AS syy1,
        |    CAST(count(*) FILTER (WHERE g = 'b') AS BIGINT) AS n2,
        |    CAST(sum(CAST(x AS DECIMAL(38,6))) FILTER (WHERE g = 'b')
        |      AS DOUBLE) AS sx2,
        |    CAST(sum(CAST(y AS DECIMAL(38,6))) FILTER (WHERE g = 'b')
        |      AS DOUBLE) AS sy2,
        |    CAST(sum(CAST(x * x AS DECIMAL(38,6)))
        |      FILTER (WHERE g = 'b') AS DOUBLE) AS sxx2,
        |    CAST(sum(CAST(x * y AS DECIMAL(38,6)))
        |      FILTER (WHERE g = 'b') AS DOUBLE) AS sxy2,
        |    CAST(sum(CAST(y * y AS DECIMAL(38,6)))
        |      FILTER (WHERE g = 'b') AS DOUBLE) AS syy2
        |  FROM base),
        |sse AS (SELECT n1, n2, CAST(n0 AS DOUBLE) AS nall,
        |    (syy0 - sy0 * sy0 / CAST(n0 AS DOUBLE))
        |      - (sxy0 - sx0 * sy0 / CAST(n0 AS DOUBLE))
        |        * (sxy0 - sx0 * sy0 / CAST(n0 AS DOUBLE))
        |        / (sxx0 - sx0 * sx0 / CAST(n0 AS DOUBLE)) AS ssep,
        |    (syy1 - sy1 * sy1 / CAST(n1 AS DOUBLE))
        |      - (sxy1 - sx1 * sy1 / CAST(n1 AS DOUBLE))
        |        * (sxy1 - sx1 * sy1 / CAST(n1 AS DOUBLE))
        |        / (sxx1 - sx1 * sx1 / CAST(n1 AS DOUBLE)) AS ssea,
        |    (syy2 - sy2 * sy2 / CAST(n2 AS DOUBLE))
        |      - (sxy2 - sx2 * sy2 / CAST(n2 AS DOUBLE))
        |        * (sxy2 - sx2 * sy2 / CAST(n2 AS DOUBLE))
        |        / (sxx2 - sx2 * sx2 / CAST(n2 AS DOUBLE)) AS sseb,
        |    (sxy1 - sx1 * sy1 / CAST(n1 AS DOUBLE))
        |      / (sxx1 - sx1 * sx1 / CAST(n1 AS DOUBLE)) AS slopea,
        |    (sxy2 - sx2 * sy2 / CAST(n2 AS DOUBLE))
        |      / (sxx2 - sx2 * sx2 / CAST(n2 AS DOUBLE)) AS slopeb
        |  FROM m)
        |SELECT n1 AS n_a, n2 AS n_b,
        |  round_even(((ssep - ssea - sseb) / 2.0)
        |    / ((ssea + sseb) / (nall - 4.0)) * 1e6, 0) / 1e6 AS f_stat,
        |  CAST(2 AS BIGINT) AS df1, CAST(nall - 4.0 AS BIGINT) AS df2,
        |  round_even(slopea * 1e6, 0) / 1e6 AS slope_a,
        |  round_even(slopeb * 1e6, 0) / 1e6 AS slope_b
        |FROM sse""".stripMargin,
    // Segmented replay: quantity cells with decimal-exact y-moments,
    // the same prefix/total windows, centered closed-form split SSEs,
    // argmin on (rounded SSE, candidate) — selection replays exactly.
    "q_segmented" ->
      """WITH base AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |cells AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy
        |  FROM base GROUP BY x),
        |w AS (SELECT v,
        |    CAST(sum(c) OVER wp AS BIGINT) AS nl,
        |    CAST(sum(c) OVER wa AS BIGINT) AS nt,
        |    sum(v * c) OVER wp AS sxl, sum(v * c) OVER wa AS sxt,
        |    sum(v * v * c) OVER wp AS sxxl,
        |    sum(v * v * c) OVER wa AS sxxt,
        |    sum(sy) OVER wp AS syl, sum(sy) OVER wa AS syt,
        |    sum(syy) OVER wp AS syyl, sum(syy) OVER wa AS syyt,
        |    sum(v * sy) OVER wp AS sxyl, sum(v * sy) OVER wa AS sxyt
        |  FROM cells
        |  WINDOW wp AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW),
        |  wa AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND UNBOUNDED FOLLOWING)),
        |s AS (SELECT v, nl, nt, CAST(nl AS DOUBLE) AS nld,
        |    CAST(nt - nl AS DOUBLE) AS nrd,
        |    sxxl - sxl * sxl / CAST(nl AS DOUBLE) AS cxxl,
        |    (sxxt - sxxl) - (sxt - sxl) * (sxt - sxl)
        |      / CAST(nt - nl AS DOUBLE) AS cxxr,
        |    sxyl - sxl * syl / CAST(nl AS DOUBLE) AS cxyl,
        |    (sxyt - sxyl) - (sxt - sxl) * (syt - syl)
        |      / CAST(nt - nl AS DOUBLE) AS cxyr,
        |    syyl - syl * syl / CAST(nl AS DOUBLE) AS cyyl,
        |    (syyt - syyl) - (syt - syl) * (syt - syl)
        |      / CAST(nt - nl AS DOUBLE) AS cyyr,
        |    syyt - syt * syt / CAST(nt AS DOUBLE) AS cyyt,
        |    sxyt - sxt * syt / CAST(nt AS DOUBLE) AS cxyt,
        |    sxxt - sxt * sxt / CAST(nt AS DOUBLE) AS cxxt,
        |    sxl, syl, sxt, syt
        |  FROM w),
        |sc AS (SELECT v, nl, nt,
        |    round((cyyl - cxyl * cxyl / cxxl)
        |      + (cyyr - cxyr * cxyr / cxxr), 2) AS sse_split,
        |    round(cxyl / cxxl, 6) + 0.0 AS slope_left,
        |    round(cxyr / cxxr, 6) + 0.0 AS slope_right,
        |    round(syl / nld - cxyl / cxxl * (sxl / nld), 6) + 0.0
        |      AS intercept_left,
        |    round((syt - syl) / nrd - cxyr / cxxr
        |      * ((sxt - sxl) / nrd), 6) + 0.0 AS intercept_right,
        |    round(((cyyl - cxyl * cxyl / cxxl)
        |      + (cyyr - cxyr * cxyr / cxxr))
        |      / (cyyt - cxyt * cxyt / cxxt), 6) AS sse_ratio
        |  FROM s WHERE nl >= 3 AND nt - nl >= 3 AND cxxl > 0.0
        |    AND cxxr > 0.0)
        |SELECT v AS breakpoint, nl AS n_left, nt - nl AS n_right,
        |  slope_left, slope_right, intercept_left, intercept_right,
        |  sse_ratio
        |FROM sc ORDER BY sse_split, v LIMIT 1""".stripMargin,
    "q_theil_sen" ->
      """WITH b AS (SELECT l_returnflag AS g,
        |    CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y,
        |    l_orderkey, l_linenumber
        |  FROM lineitem WHERE l_orderkey < 500
        |    AND l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |r AS (SELECT g, x, y, row_number() OVER
        |    (PARTITION BY g ORDER BY l_orderkey, l_linenumber) AS rid
        |  FROM b),
        |p AS (SELECT a.g, (b2.y - a.y) / (b2.x - a.x) AS s
        |  FROM r a JOIN r b2 ON a.g = b2.g AND a.rid < b2.rid
        |    AND a.x <> b2.x),
        |sm AS (SELECT g, s,
        |    row_number() OVER (PARTITION BY g ORDER BY s) AS sr,
        |    count(*) OVER (PARTITION BY g) AS m FROM p),
        |sl AS (SELECT g, s AS slope, CAST(m AS BIGINT) AS n_pairs
        |  FROM sm WHERE sr = CAST(floor((m + 1) / 2.0) AS BIGINT)),
        |res AS (SELECT b.g, sl.slope, sl.n_pairs,
        |    b.y - sl.slope * b.x AS rr FROM b JOIN sl ON b.g = sl.g),
        |rm AS (SELECT g, slope, n_pairs, rr,
        |    row_number() OVER (PARTITION BY g ORDER BY rr) AS kr,
        |    count(*) OVER (PARTITION BY g) AS mm FROM res)
        |SELECT g AS l_returnflag, CAST(mm AS BIGINT) AS n_used, n_pairs,
        |  round_even(slope * 1e6, 0) / 1e6 AS slope_r,
        |  round_even(rr * 1e6, 0) / 1e6 AS intercept_r
        |FROM rm WHERE kr = CAST(floor((mm + 1) / 2.0) AS BIGINT)
        |ORDER BY g""".stripMargin,
    // Closed-form per-group OLS from {avg, var_pop, covar_pop} then the
    // lag-differenced residual ratio in unique event-id order
    "q_durbin_watson" ->
      """WITH b AS (SELECT event_type AS g,
        |    CAST(CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS DOUBLE) AS x,
        |    CAST(value AS DOUBLE) AS y, event_id AS ord
        |  FROM events WHERE value IS NOT NULL
        |    AND NOT isnan(CAST(value AS DOUBLE)) AND ts IS NOT NULL),
        |f0 AS (SELECT g, CAST(count(*) AS BIGINT) AS n, avg(x) AS mx,
        |    avg(y) AS my, var_pop(x) AS vx, covar_pop(x, y) AS cxy
        |  FROM b GROUP BY g HAVING count(*) >= 3 AND var_pop(x) > 0.0),
        |f AS (SELECT g, n, cxy / vx AS slope,
        |    my - cxy / vx * mx AS ic FROM f0),
        |e AS (SELECT b.g, f.n, f.slope, f.ic,
        |    b.y - f.ic - f.slope * b.x AS ee, b.ord
        |  FROM b JOIN f ON b.g = f.g),
        |d AS (SELECT g, n, slope, ic, ee,
        |    ee - lag(ee) OVER (PARTITION BY g ORDER BY ord) AS de FROM e)
        |SELECT g AS event_type, max(n) AS n,
        |  round_even(max(slope) * 1e6, 0) / 1e6 AS slope_r,
        |  round_even(max(ic) * 1e6, 0) / 1e6 AS intercept_r,
        |  round_even(sum(de * de) / sum(ee * ee) * 1e6, 0) / 1e6 AS dw_r
        |FROM d GROUP BY g HAVING sum(ee * ee) > 0.0
        |ORDER BY g""".stripMargin,
    // Naive a<b<c triple join over the canonical undirected edge set —
    // the oracle for the engine's degree-oriented wedge enumeration
    "q_triangle_stats" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p
        |  FROM lineitem WHERE l_orderkey < 12000),
        |e0 AS (SELECT CAST(a.p AS VARCHAR) AS s, CAST(b.p AS VARCHAR) AS d
        |  FROM lp a JOIN lp b ON a.k = b.k AND a.p <> b.p),
        |und AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
        |  FROM e0),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
        |  FROM (SELECT a AS node FROM und
        |    UNION ALL SELECT b AS node FROM und) GROUP BY node),
        |tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
        |  FROM und e1 JOIN und e2 ON e2.a = e1.b
        |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        |pn AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles
        |  FROM (SELECT u AS node FROM tri
        |    UNION ALL SELECT v AS node FROM tri
        |    UNION ALL SELECT w AS node FROM tri) GROUP BY node)
        |SELECT deg.node, deg.degree,
        |  coalesce(pn.triangles, 0) AS triangles,
        |  CASE WHEN deg.degree >= 2 THEN
        |    round_even(2.0 * coalesce(pn.triangles, 0)
        |      / (deg.degree * (deg.degree - 1)) * 1e6, 0) / 1e6
        |  ELSE 0.0 END AS clustering_coeff
        |FROM deg LEFT JOIN pn ON deg.node = pn.node
        |ORDER BY deg.node""".stripMargin,
    // sBG grid MLE replay: per-user lifetimes → death cells → the full
    // 80×80 (α, β) log-likelihood surface via lgamma → argmax with the
    // engine's tie order (ll desc, α asc, β asc)
    "q_sbg_retention" ->
      """WITH act AS (SELECT o_custkey AS u,
        |    CAST(floor(epoch(o_orderdate)) AS BIGINT) // (30 * 86400)
        |      AS p
        |  FROM orders WHERE o_custkey IS NOT NULL
        |    AND o_orderdate IS NOT NULL),
        |life AS (SELECT u, max(p) - min(p) AS l FROM act GROUP BY u),
        |cells AS (SELECT l, CAST(count(*) AS BIGINT) AS c
        |  FROM life GROUP BY l),
        |tm AS (SELECT max(l) AS t FROM cells),
        |deaths AS (SELECT l + 1 AS t, c AS d FROM cells, tm
        |  WHERE l < tm.t),
        |cens AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS nc
        |  FROM cells, tm WHERE l >= tm.t),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS nu FROM cells),
        |grid AS (SELECT gi.i * 0.1 AS a, gj.i * 0.1 AS b
        |  FROM generate_series(1, 80) gi(i), generate_series(1, 80) gj(i)),
        |dl AS (SELECT g.a, g.b,
        |    sum(d * (lgamma(g.a + 1.0) + lgamma(g.b + t - 1.0)
        |      - lgamma(g.a + 1.0 + g.b + t - 1.0)
        |      - (lgamma(g.a) + lgamma(g.b) - lgamma(g.a + g.b)))) AS dsum
        |  FROM grid g, deaths GROUP BY g.a, g.b),
        |ll AS (SELECT dl.a, dl.b,
        |    dsum + (SELECT nc FROM cens) * (lgamma(dl.a)
        |      + lgamma(dl.b + (SELECT t FROM tm))
        |      - lgamma(dl.a + dl.b + (SELECT t FROM tm))
        |      - (lgamma(dl.a) + lgamma(dl.b)
        |        - lgamma(dl.a + dl.b))) AS llv
        |  FROM dl),
        |best AS (SELECT a, b, llv FROM ll
        |  ORDER BY llv DESC, a ASC, b ASC LIMIT 1)
        |SELECT round_even(a * 1e6, 0) / 1e6 AS alpha,
        |  round_even(b * 1e6, 0) / 1e6 AS beta,
        |  round_even(llv * 1e6, 0) / 1e6 AS ll,
        |  (SELECT nu FROM tot) AS n_users,
        |  (SELECT nu FROM tot) - (SELECT nc FROM cens) AS n_churned,
        |  (SELECT nc FROM cens) AS n_censored,
        |  (SELECT t FROM tm) AS horizon,
        |  round_even(a / (a + b) * 1e6, 0) / 1e6 AS mean_churn
        |FROM best""".stripMargin,
    // Propensity = the 3-step logistic chain (q_logistic_quality shape,
    // label = treatment), then one clipped Hájek weighted-mean CTE
    "q_ipw_ate" ->
      """WITH base AS (SELECT
        |    CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS t,
        |    CAST(l_discount AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y
        |  FROM lineitem WHERE l_discount IS NOT NULL
        |    AND l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |it1 AS (SELECT sum(0.25) AS h00, sum(0.25 * x) AS h01,
        |    sum(0.25 * x * x) AS h11, sum(t - 0.5) AS g0,
        |    sum((t - 0.5) * x) AS g1, count(*) AS n FROM base),
        |b1 AS (SELECT (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
        |    (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1, n
        |  FROM it1),
        |p2 AS (SELECT t, x, b.b0 AS pb0, b.b1 AS pb1,
        |    1.0 / (1.0 + exp(-(b.b0 + b.b1 * x))) AS p
        |  FROM base CROSS JOIN b1 b),
        |it2 AS (SELECT any_value(pb0) AS pb0, any_value(pb1) AS pb1,
        |    sum(p * (1.0 - p)) AS h00, sum(p * (1.0 - p) * x) AS h01,
        |    sum(p * (1.0 - p) * x * x) AS h11,
        |    sum(t - p) AS g0, sum((t - p) * x) AS g1 FROM p2),
        |b2 AS (SELECT
        |    pb0 + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
        |    pb1 + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1
        |  FROM it2),
        |p3 AS (SELECT t, x, b.b0 AS pb0, b.b1 AS pb1,
        |    1.0 / (1.0 + exp(-(b.b0 + b.b1 * x))) AS p
        |  FROM base CROSS JOIN b2 b),
        |it3 AS (SELECT any_value(pb0) AS pb0, any_value(pb1) AS pb1,
        |    sum(p * (1.0 - p)) AS h00, sum(p * (1.0 - p) * x) AS h01,
        |    sum(p * (1.0 - p) * x * x) AS h11,
        |    sum(t - p) AS g0, sum((t - p) * x) AS g1 FROM p3),
        |b3 AS (SELECT
        |    pb0 + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
        |    pb1 + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1
        |  FROM it3),
        |wts AS (SELECT base.t, base.y,
        |    least(greatest(1.0 / (1.0 + exp(-(b.b0 + b.b1 * base.x))),
        |      0.01), 0.99) AS e
        |  FROM base CROSS JOIN b3 b),
        |agg AS (SELECT sum((t / e) * y) AS s1y, sum(t / e) AS s1,
        |    sum((t / e) * (t / e)) AS s1sq,
        |    sum(((1.0 - t) / (1.0 - e)) * y) AS s0y,
        |    sum((1.0 - t) / (1.0 - e)) AS s0,
        |    sum(((1.0 - t) / (1.0 - e)) * ((1.0 - t) / (1.0 - e)))
        |      AS s0sq,
        |    count(*) AS n FROM wts)
        |SELECT round_even((s1y / s1 - s0y / s0) * 1e6, 0) / 1e6 AS ate,
        |  round_even(s1y / s1 * 1e6, 0) / 1e6 AS mu_treated,
        |  round_even(s0y / s0 * 1e6, 0) / 1e6 AS mu_control,
        |  round_even(s1 * s1 / s1sq * 1e6, 0) / 1e6 AS ess_treated,
        |  round_even(s0 * s0 / s0sq * 1e6, 0) / 1e6 AS ess_control,
        |  n FROM agg""".stripMargin,
    // Per-stratum integer cells → MH pooled ratio + RBG variance +
    // CMH χ²(1), all exact-integer ratios and ln/exp/sqrt
    "q_mantel_haenszel" ->
      """WITH cells AS (SELECT l_linestatus,
        |    CAST(sum(CASE WHEN l_discount > 0.05
        |      AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN l_discount > 0.05
        |      AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN l_discount <= 0.05
        |      AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN l_discount <= 0.05
        |      AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM lineitem WHERE l_returnflag IS NOT NULL
        |  GROUP BY l_linestatus),
        |m AS (SELECT a, b, c, d,
        |    CAST(a AS DOUBLE) + b + c + d AS ni FROM cells
        |  WHERE CAST(a AS DOUBLE) + b + c + d > 1.0),
        |agg AS (SELECT sum(a * d / ni) AS sr, sum(b * c / ni) AS ss,
        |    sum(((a + d) / ni) * (a * d / ni)) AS spr,
        |    sum(((a + d) / ni) * (b * c / ni)
        |      + ((b + c) / ni) * (a * d / ni)) AS sps_qr,
        |    sum(((b + c) / ni) * (b * c / ni)) AS sqs,
        |    sum(a - (CAST(a AS DOUBLE) + b) * (CAST(a AS DOUBLE) + c) / ni)
        |      AS dev,
        |    sum((CAST(a AS DOUBLE) + b) * (CAST(c AS DOUBLE) + d)
        |      * (CAST(a AS DOUBLE) + c) * (CAST(b AS DOUBLE) + d)
        |      / (ni * ni * (ni - 1.0))) AS var,
        |    CAST(count(*) AS BIGINT) AS n_strata,
        |    CAST(sum(a + b + c + d) AS BIGINT) AS n FROM m)
        |SELECT
        |  CASE WHEN sr > 0.0 AND ss > 0.0
        |    THEN round_even(sr / ss * 1e6, 0) / 1e6 END AS or_mh,
        |  CASE WHEN sr > 0.0 AND ss > 0.0
        |    THEN round_even(exp(ln(sr / ss) - 1.959964
        |      * sqrt(spr / (2.0 * sr * sr) + sps_qr / (2.0 * sr * ss)
        |        + sqs / (2.0 * ss * ss))) * 1e6, 0) / 1e6 END AS or_lo,
        |  CASE WHEN sr > 0.0 AND ss > 0.0
        |    THEN round_even(exp(ln(sr / ss) + 1.959964
        |      * sqrt(spr / (2.0 * sr * sr) + sps_qr / (2.0 * sr * ss)
        |        + sqs / (2.0 * ss * ss))) * 1e6, 0) / 1e6 END AS or_hi,
        |  CASE WHEN var > 0.0
        |    THEN round_even(dev * dev / var * 1e6, 0) / 1e6 END
        |    AS chi2_cmh,
        |  n_strata, n FROM agg""".stripMargin,
    // 2×4 centered MA + zero-centered phase means in event-id order
    "q_seasonal_decompose" ->
      """WITH b AS (SELECT user_id AS k, event_id AS t,
        |    CAST(value AS DOUBLE) AS v
        |  FROM events WHERE user_id < 10 AND user_id IS NOT NULL
        |    AND event_id IS NOT NULL AND value IS NOT NULL
        |    AND NOT isnan(CAST(value AS DOUBLE))),
        |w AS (SELECT k, t, v,
        |    CAST((row_number() OVER ord - 1) % 4 AS BIGINT) AS phase,
        |    sum(v) OVER sp AS s, count(v) OVER sp AS cnt,
        |    lag(v, 2) OVER ord AS lg, lead(v, 2) OVER ord AS ld
        |  FROM b
        |  WINDOW ord AS (PARTITION BY k ORDER BY t),
        |    sp AS (PARTITION BY k ORDER BY t
        |      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)),
        |de AS (SELECT k, t, v, phase,
        |    CASE WHEN cnt = 5 THEN (s - (lg + ld) * 0.5) / 4.0 END
        |      AS trd FROM w),
        |d2 AS (SELECT k, t, v, phase, trd, v - trd AS dt FROM de),
        |pm AS (SELECT k, phase, avg(dt) AS pmv FROM d2
        |  WHERE dt IS NOT NULL GROUP BY k, phase),
        |ctr AS (SELECT k, phase,
        |    pmv - avg(pmv) OVER (PARTITION BY k) AS sea FROM pm)
        |SELECT d2.k AS user_id, d2.t AS event_id, d2.v AS value,
        |  d2.phase,
        |  round_even(d2.trd * 1e6, 0) / 1e6 AS trend,
        |  round_even(ctr.sea * 1e6, 0) / 1e6 AS seasonal,
        |  round_even((d2.dt - ctr.sea) * 1e6, 0) / 1e6 AS remainder
        |FROM d2 LEFT JOIN ctr ON d2.k = ctr.k AND d2.phase = ctr.phase
        |ORDER BY d2.k, d2.t""".stripMargin,
    // Seasonal-strength replay: the decompose chain's ROUNDED
    // components (the hash-checked values), decimal-exact variance
    // folds, Hyndman's clamped 1 - Var(R)/Var(S+R) per key.
    "q_seasonal_strength" ->
      """WITH b AS (SELECT user_id AS k, event_id AS t,
        |    CAST(value AS DOUBLE) AS v
        |  FROM events WHERE user_id < 10 AND user_id IS NOT NULL
        |    AND event_id IS NOT NULL AND value IS NOT NULL
        |    AND NOT isnan(CAST(value AS DOUBLE))),
        |w AS (SELECT k, t, v,
        |    CAST((row_number() OVER ord - 1) % 4 AS BIGINT) AS phase,
        |    sum(v) OVER sp AS s, count(v) OVER sp AS cnt,
        |    lag(v, 2) OVER ord AS lg, lead(v, 2) OVER ord AS ld
        |  FROM b
        |  WINDOW ord AS (PARTITION BY k ORDER BY t),
        |    sp AS (PARTITION BY k ORDER BY t
        |      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)),
        |de AS (SELECT k, t, v, phase,
        |    CASE WHEN cnt = 5 THEN (s - (lg + ld) * 0.5) / 4.0 END
        |      AS trd FROM w),
        |d2 AS (SELECT k, t, v, phase, trd, v - trd AS dt FROM de),
        |pm AS (SELECT k, phase, avg(dt) AS pmv FROM d2
        |  WHERE dt IS NOT NULL GROUP BY k, phase),
        |ctr AS (SELECT k, phase,
        |    pmv - avg(pmv) OVER (PARTITION BY k) AS sea FROM pm),
        |comp AS (SELECT d2.k,
        |    round_even(d2.trd * 1e6, 0) / 1e6 AS tr,
        |    round_even(ctr.sea * 1e6, 0) / 1e6 AS se,
        |    round_even((d2.dt - ctr.sea) * 1e6, 0) / 1e6 AS re
        |  FROM d2 LEFT JOIN ctr ON d2.k = ctr.k AND d2.phase = ctr.phase
        |  WHERE d2.dt IS NOT NULL AND ctr.sea IS NOT NULL),
        |ag AS (SELECT k, CAST(count(*) AS BIGINT) AS n_used,
        |    CAST(sum(CAST(re AS DECIMAL(38,6))) AS DOUBLE) AS sr,
        |    CAST(sum(CAST(re * re AS DECIMAL(38,6))) AS DOUBLE)
        |      AS srr,
        |    CAST(sum(CAST(se + re AS DECIMAL(38,6))) AS DOUBLE) AS ss,
        |    CAST(sum(CAST((se + re) * (se + re) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS sss,
        |    CAST(sum(CAST(tr + re AS DECIMAL(38,6))) AS DOUBLE) AS st,
        |    CAST(sum(CAST((tr + re) * (tr + re) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS stt
        |  FROM comp GROUP BY k)
        |SELECT k AS user_id, n_used,
        |  CASE WHEN sss / CAST(n_used AS DOUBLE)
        |      - (ss / CAST(n_used AS DOUBLE))
        |      * (ss / CAST(n_used AS DOUBLE)) > 0.0
        |    THEN round(greatest(0.0, 1.0
        |      - (srr / CAST(n_used AS DOUBLE)
        |        - (sr / CAST(n_used AS DOUBLE))
        |        * (sr / CAST(n_used AS DOUBLE)))
        |      / (sss / CAST(n_used AS DOUBLE)
        |        - (ss / CAST(n_used AS DOUBLE))
        |        * (ss / CAST(n_used AS DOUBLE)))), 6) END
        |    AS seasonal_strength,
        |  CASE WHEN stt / CAST(n_used AS DOUBLE)
        |      - (st / CAST(n_used AS DOUBLE))
        |      * (st / CAST(n_used AS DOUBLE)) > 0.0
        |    THEN round(greatest(0.0, 1.0
        |      - (srr / CAST(n_used AS DOUBLE)
        |        - (sr / CAST(n_used AS DOUBLE))
        |        * (sr / CAST(n_used AS DOUBLE)))
        |      / (stt / CAST(n_used AS DOUBLE)
        |        - (st / CAST(n_used AS DOUBLE))
        |        * (st / CAST(n_used AS DOUBLE)))), 6) END
        |    AS trend_strength
        |FROM ag WHERE n_used >= 2 ORDER BY user_id""".stripMargin,
    // Per-(group, λ) profile-likelihood cells over the exploded grid,
    // then the per-group argmax (ties → smaller λ)
    "q_boxcox" ->
      """WITH b AS (SELECT l_returnflag AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS x
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |grid AS (SELECT i * 0.25 AS lam FROM generate_series(-8, 8) s(i)),
        |cells AS (SELECT g, lam, CAST(count(*) AS BIGINT) AS n,
        |    sum(CASE WHEN x <= 0.0 THEN 1 ELSE 0 END) AS bad,
        |    sum(CASE WHEN x > 0.0 THEN
        |      CASE WHEN lam = 0.0 THEN ln(x)
        |        ELSE (exp(lam * ln(x)) - 1.0) / lam END END) AS sy,
        |    sum(CASE WHEN x > 0.0 THEN
        |      (CASE WHEN lam = 0.0 THEN ln(x)
        |        ELSE (exp(lam * ln(x)) - 1.0) / lam END)
        |      * (CASE WHEN lam = 0.0 THEN ln(x)
        |        ELSE (exp(lam * ln(x)) - 1.0) / lam END) END) AS syy,
        |    sum(CASE WHEN x > 0.0 THEN ln(x) END) AS slx
        |  FROM b, grid GROUP BY g, lam
        |  HAVING sum(CASE WHEN x <= 0.0 THEN 1 ELSE 0 END) = 0
        |    AND count(*) >= 3),
        |lls AS (SELECT g, lam, n,
        |    (-0.5) * n * ln(syy / n - (sy / n) * (sy / n))
        |      + (lam - 1.0) * slx AS llv
        |  FROM cells WHERE syy / n - (sy / n) * (sy / n) > 0.0),
        |rk AS (SELECT g, lam, llv, n, row_number() OVER
        |    (PARTITION BY g ORDER BY llv DESC, lam ASC) AS rn FROM lls)
        |SELECT g AS l_returnflag, lam AS lambda,
        |  round_even(llv * 1e6, 0) / 1e6 AS ll, n
        |FROM rk WHERE rn = 1 ORDER BY g""".stripMargin,
    // Frequency-of-frequency table with the (r+1)·N_{r+1}/N_r fold;
    // p_smoothed divides the ROUNDED r* (mirrors the engine)
    "q_good_turing" ->
      """WITH tok AS (SELECT unnest(list_filter(
        |    regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |    x -> x <> '')) AS t FROM documents),
        |cnt AS (SELECT t, CAST(count(*) AS BIGINT) AS r FROM tok
        |  GROUP BY t),
        |nr AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM cnt
        |  GROUP BY r),
        |tt AS (SELECT CAST(sum(r * n_r) AS BIGINT) AS total FROM nr),
        |led AS (SELECT r, n_r, lead(r) OVER (ORDER BY r) AS rn,
        |    lead(n_r) OVER (ORDER BY r) AS nn FROM nr),
        |rs AS (SELECT r, n_r,
        |    CASE WHEN rn = r + 1 THEN
        |      round_even(CAST(r + 1 AS DOUBLE) * nn / n_r * 1e6, 0) / 1e6
        |    END AS r_star FROM led)
        |SELECT r, n_r, r_star,
        |  round_even(r_star / CAST(tt.total AS DOUBLE) * 1e9, 0) / 1e9
        |    AS p_smoothed
        |FROM rs, tt ORDER BY r""".stripMargin,
    // Nested md5-bucket prefixes → cumulative (tokens, vocab) points →
    // log-log OLS; integers exact, the fit repeats on every row
    "q_heaps_law" ->
      """WITH tok AS (SELECT doc_id, unnest(list_filter(
        |    regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |    x -> x <> '')) AS t FROM documents),
        |tb AS (SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
        |      1, 8)) AS BIGINT) % 10 AS bk, t FROM tok),
        |pb AS (SELECT bk, CAST(count(*) AS BIGINT) AS nt FROM tb
        |  GROUP BY bk),
        |fs AS (SELECT t, min(bk) AS bk FROM tb GROUP BY t),
        |fb AS (SELECT bk, CAST(count(*) AS BIGINT) AS nv FROM fs
        |  GROUP BY bk),
        |j AS (SELECT coalesce(pb.bk, fb.bk) AS bucket,
        |    coalesce(nt, 0) AS nt, coalesce(nv, 0) AS nv
        |  FROM pb FULL JOIN fb ON pb.bk = fb.bk),
        |c AS (SELECT bucket,
        |    CAST(sum(nt) OVER cum AS BIGINT) AS n_tokens,
        |    CAST(sum(nv) OVER cum AS BIGINT) AS vocab
        |  FROM j WINDOW cum AS (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |p AS (SELECT bucket, n_tokens, vocab,
        |    ln(CAST(n_tokens AS DOUBLE)) AS xx,
        |    ln(CAST(vocab AS DOUBLE)) AS yy
        |  FROM c WHERE n_tokens > 0 AND vocab > 0),
        |f AS (SELECT CAST(count(*) AS DOUBLE) AS cn, sum(xx) AS sx,
        |    sum(yy) AS sy, sum(xx * xx) AS sxx, sum(yy * yy) AS syy,
        |    sum(xx * yy) AS sxy FROM p)
        |SELECT p.bucket, p.n_tokens, p.vocab,
        |  CASE WHEN f.cn * f.sxx - f.sx * f.sx > 0.0 THEN
        |    round_even((f.cn * f.sxy - f.sx * f.sy)
        |      / (f.cn * f.sxx - f.sx * f.sx) * 1e6, 0) / 1e6 END AS beta,
        |  CASE WHEN f.cn * f.sxx - f.sx * f.sx > 0.0 THEN
        |    round_even((f.sy - ((f.cn * f.sxy - f.sx * f.sy)
        |      / (f.cn * f.sxx - f.sx * f.sx)) * f.sx) / f.cn * 1e6, 0)
        |      / 1e6 END AS ln_k,
        |  CASE WHEN f.cn * f.sxx - f.sx * f.sx > 0.0
        |    AND f.cn * f.syy - f.sy * f.sy > 0.0 THEN
        |    round_even((f.cn * f.sxy - f.sx * f.sy)
        |      * (f.cn * f.sxy - f.sx * f.sy)
        |      / ((f.cn * f.sxx - f.sx * f.sx)
        |        * (f.cn * f.syy - f.sy * f.sy)) * 1e6, 0) / 1e6 END
        |    AS r2
        |FROM p, f ORDER BY p.bucket""".stripMargin,
    // sklearn step-interpolated AP per group: per-(group, score) cells,
    // descending inclusive prefix, every term an exact-integer ratio
    "q_avg_precision" ->
      """WITH b AS (SELECT l_linestatus AS g,
        |    CAST(l_discount AS DOUBLE) AS s, (l_returnflag = 'R') AS y
        |  FROM lineitem WHERE l_discount IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE))
        |    AND l_returnflag IS NOT NULL),
        |cells AS (SELECT g, s,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS cp,
        |    CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS cn
        |  FROM b GROUP BY g, s),
        |w AS (SELECT g, cp, cn, sum(cp) OVER wd AS tp,
        |    sum(cp + cn) OVER wd AS pred
        |  FROM cells WINDOW wd AS (PARTITION BY g ORDER BY s DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |a AS (SELECT g, sum(CAST(cp AS DOUBLE) * tp / pred) AS apn,
        |    CAST(sum(cp) AS BIGINT) AS n_pos,
        |    CAST(sum(cn) AS BIGINT) AS n_neg
        |  FROM w GROUP BY g)
        |SELECT g AS l_linestatus,
        |  round_even(apn / n_pos * 1e6, 0) / 1e6 AS avg_precision,
        |  n_pos, n_neg FROM a WHERE n_pos > 0 AND n_neg > 0
        |ORDER BY g""".stripMargin,
    // Replays NB train (counts, priors, smoothed denominators) and
    // classification (rounded-score argmax) end-to-end
    "q_naive_bayes" ->
      """WITH d AS (SELECT doc_id, text, lang FROM documents
        |  WHERE lang IS NOT NULL),
        |tok AS (SELECT doc_id, unnest(list_filter(
        |    regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |    x -> x <> '')) AS t FROM d),
        |tokc AS (SELECT d.lang AS cls, tok.t,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM tok JOIN d ON tok.doc_id = d.doc_id GROUP BY d.lang, tok.t),
        |v AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS vv FROM tokc),
        |dc AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS nd
        |  FROM d GROUP BY lang),
        |td AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM d),
        |tt AS (SELECT cls, CAST(sum(cnt) AS BIGINT) AS tok_total
        |  FROM tokc GROUP BY cls),
        |cl AS (SELECT dc.cls,
        |    ln(CAST(dc.nd AS DOUBLE) / (SELECT tot FROM td)) AS log_prior,
        |    ln(CAST(coalesce(tt.tok_total, 0) AS DOUBLE)
        |      + 1.0 * (SELECT vv FROM v)) AS ln_denom
        |  FROM dc LEFT JOIN tt ON dc.cls = tt.cls),
        |dt AS (SELECT doc_id AS id, t, CAST(count(*) AS BIGINT) AS nt
        |  FROM tok GROUP BY doc_id, t),
        |dl AS (SELECT id, CAST(sum(nt) AS BIGINT) AS nd FROM dt
        |  GROUP BY id),
        |pc AS (SELECT dt.id, c.cls,
        |    sum(dt.nt * ln(CAST(coalesce(tokc.cnt, 0) AS DOUBLE) + 1.0))
        |      AS tok_ll
        |  FROM dt CROSS JOIN (SELECT cls FROM cl) c
        |  LEFT JOIN tokc ON tokc.cls = c.cls AND tokc.t = dt.t
        |  GROUP BY dt.id, c.cls),
        |sc AS (SELECT pc.id, pc.cls,
        |    round_even((cl.log_prior + pc.tok_ll
        |      - dl.nd * cl.ln_denom) * 1e6, 0) / 1e6 AS score
        |  FROM pc JOIN dl ON pc.id = dl.id JOIN cl ON pc.cls = cl.cls),
        |pr AS (SELECT id, cls, row_number() OVER
        |    (PARTITION BY id ORDER BY score DESC, cls ASC) AS rk FROM sc)
        |SELECT d.lang, pr.cls AS predicted,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM d JOIN pr ON d.doc_id = pr.id AND pr.rk = 1
        |GROUP BY d.lang, pr.cls ORDER BY d.lang, pr.cls""".stripMargin,
    // Conover rank-variance Friedman over matched per-(user, type)
    // means; χ² = (k−1)·Σ(Rⱼ−b·r̄)² / Σ(rᵢⱼ−r̄)², r̄ = 2
    "q_friedman" ->
      """WITH cell AS (SELECT user_id AS s, event_type AS t,
        |    avg(CAST(value AS DOUBLE)) AS v
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |    AND NOT isnan(CAST(value AS DOUBLE))
        |    AND event_type IN ('click', 'view', 'purchase')
        |  GROUP BY user_id, event_type),
        |cb AS (SELECT s, t, v, count(*) OVER (PARTITION BY s) AS kt
        |  FROM cell),
        |comp AS (SELECT s, t, v FROM cb WHERE kt = 3),
        |rk AS (SELECT s, t,
        |    CAST(rank() OVER (PARTITION BY s ORDER BY v) AS DOUBLE)
        |    + (CAST(count(*) OVER (PARTITION BY s, v) AS DOUBLE) - 1.0)
        |      / 2.0 AS r
        |  FROM comp),
        |h AS (SELECT CAST(count(DISTINCT s) AS BIGINT) AS b,
        |    sum((r - 2.0) * (r - 2.0)) AS den FROM rk),
        |tj AS (SELECT t, sum(r) AS rj FROM rk GROUP BY t),
        |x AS (SELECT round_even(2.0 * sum((rj - h.b * 2.0)
        |      * (rj - h.b * 2.0)) / max(h.den) * 1e6, 0) / 1e6 AS chi2,
        |    max(h.b) AS b FROM tj, h)
        |SELECT x.chi2, CAST(2 AS BIGINT) AS dof,
        |  round_even(exp(-x.chi2 / 2.0) * 1e6, 0) / 1e6 AS p_value,
        |  x.b AS n_subjects,
        |  (SELECT CAST(count(*) AS BIGINT) FROM
        |    (SELECT s FROM cell GROUP BY s HAVING count(*) <> 3))
        |    AS n_incomplete
        |FROM x""".stripMargin,
    // Both label-propagation rounds chained: neighbor-label counts →
    // (count desc, label asc) argmax → coalesce for no-update nodes
    "q_label_prop" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p
        |  FROM lineitem WHERE l_orderkey < 3000),
        |und AS (SELECT DISTINCT CAST(a.p AS VARCHAR) AS a,
        |    CAST(b.p AS VARCHAR) AS b
        |  FROM lp a JOIN lp b ON a.k = b.k AND a.p <> b.p),
        |l0 AS (SELECT DISTINCT a AS node, a AS label FROM und),
        |c1 AS (SELECT und.a AS node, l0.label,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM und JOIN l0 ON und.b = l0.node GROUP BY und.a, l0.label),
        |w1 AS (SELECT node, label, row_number() OVER
        |    (PARTITION BY node ORDER BY c DESC, label ASC) AS rk FROM c1),
        |l1 AS (SELECT l0.node,
        |    coalesce(w.label, l0.label) AS label
        |  FROM l0 LEFT JOIN (SELECT node, label FROM w1 WHERE rk = 1) w
        |    ON l0.node = w.node),
        |c2 AS (SELECT und.a AS node, l1.label,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM und JOIN l1 ON und.b = l1.node GROUP BY und.a, l1.label),
        |w2 AS (SELECT node, label, row_number() OVER
        |    (PARTITION BY node ORDER BY c DESC, label ASC) AS rk FROM c2),
        |l2 AS (SELECT l1.node,
        |    coalesce(w.label, l1.label) AS label
        |  FROM l1 LEFT JOIN (SELECT node, label FROM w2 WHERE rk = 1) w
        |    ON l1.node = w.node)
        |SELECT node, label FROM l2 ORDER BY node""".stripMargin,
    // Modularity replay: the q_label_prop LP chain for the labels, the
    // canonical a<b edge set, exact integer e_c / degree sums, then
    // Q_c = e_c/m - (a_c/2m)^2 per community + the __total__ fold.
    // + 0.0: singleton communities give tiny-negative Q_c -> -0.0.
    "q_modularity" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p
        |  FROM lineitem WHERE l_orderkey < 3000),
        |und AS (SELECT DISTINCT CAST(a.p AS VARCHAR) AS a,
        |    CAST(b.p AS VARCHAR) AS b
        |  FROM lp a JOIN lp b ON a.k = b.k AND a.p <> b.p),
        |l0 AS (SELECT DISTINCT a AS node, a AS label FROM und),
        |c1 AS (SELECT und.a AS node, l0.label,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM und JOIN l0 ON und.b = l0.node GROUP BY und.a, l0.label),
        |w1 AS (SELECT node, label, row_number() OVER
        |    (PARTITION BY node ORDER BY c DESC, label ASC) AS rk FROM c1),
        |l1 AS (SELECT l0.node,
        |    coalesce(w.label, l0.label) AS label
        |  FROM l0 LEFT JOIN (SELECT node, label FROM w1 WHERE rk = 1) w
        |    ON l0.node = w.node),
        |c2 AS (SELECT und.a AS node, l1.label,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM und JOIN l1 ON und.b = l1.node GROUP BY und.a, l1.label),
        |w2 AS (SELECT node, label, row_number() OVER
        |    (PARTITION BY node ORDER BY c DESC, label ASC) AS rk FROM c2),
        |l2 AS (SELECT l1.node,
        |    coalesce(w.label, l1.label) AS label
        |  FROM l1 LEFT JOIN (SELECT node, label FROM w2 WHERE rk = 1) w
        |    ON l1.node = w.node),
        |canon AS (SELECT DISTINCT a, b FROM und WHERE a < b),
        |mm AS (SELECT CAST(count(*) AS DOUBLE) AS md FROM canon),
        |ein AS (SELECT la.label,
        |    CAST(count(*) AS BIGINT) AS internal_edges
        |  FROM canon c JOIN l2 la ON c.a = la.node
        |    JOIN l2 lb ON c.b = lb.node
        |  WHERE la.label = lb.label GROUP BY la.label),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS dg
        |  FROM (SELECT a AS node FROM canon
        |    UNION ALL SELECT b FROM canon) GROUP BY node),
        |ac AS (SELECT l2.label, CAST(count(*) AS BIGINT) AS n_nodes,
        |    CAST(sum(deg.dg) AS BIGINT) AS degree_sum
        |  FROM deg JOIN l2 ON deg.node = l2.node GROUP BY l2.label),
        |per AS (SELECT ac.label, ac.n_nodes,
        |    coalesce(ein.internal_edges, 0) AS internal_edges,
        |    ac.degree_sum,
        |    CAST(coalesce(ein.internal_edges, 0) AS DOUBLE) / mm.md
        |      - (CAST(ac.degree_sum AS DOUBLE) / (2.0 * mm.md))
        |        * (CAST(ac.degree_sum AS DOUBLE) / (2.0 * mm.md)) AS q
        |  FROM ac LEFT JOIN ein ON ac.label = ein.label, mm)
        |SELECT label, n_nodes,
        |  CAST(internal_edges AS BIGINT) AS internal_edges,
        |  degree_sum, round(q, 6) + 0.0 AS q_c FROM per
        |UNION ALL
        |SELECT '__total__' AS label,
        |  CAST(sum(n_nodes) AS BIGINT) AS n_nodes,
        |  CAST(sum(internal_edges) AS BIGINT) AS internal_edges,
        |  CAST(sum(degree_sum) AS BIGINT) AS degree_sum,
        |  round(sum(q), 6) + 0.0 AS q_c FROM per
        |ORDER BY label""".stripMargin,
    // Link-prediction replay: the symmetrized distinct edge set, the
    // wedge join a<b (string order, both engines bytewise on digits),
    // AA rounded per pair, ANTI JOIN vs edges, (AA desc, a, b) top-20.
    "q_adamic_adar" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p
        |  FROM lineitem WHERE l_orderkey < 3000),
        |e0 AS (SELECT CAST(x.p AS VARCHAR) AS s, CAST(y.p AS VARCHAR)
        |    AS d
        |  FROM lp x JOIN lp y ON x.k = y.k AND x.p <> y.p),
        |und AS (SELECT DISTINCT s, d FROM (
        |  SELECT s, d FROM e0 UNION ALL SELECT d AS s, s AS d FROM e0)
        |  WHERE s <> d),
        |deg AS (SELECT s, CAST(count(*) AS BIGINT) AS deg FROM und
        |  GROUP BY s),
        |wedge AS (SELECT u.d AS a, v.d AS b, u.s AS u
        |  FROM und u JOIN und v ON u.s = v.s WHERE u.d < v.d),
        |pairs AS (SELECT a, b, CAST(count(*) AS BIGINT) AS common,
        |    round(sum(1.0 / ln(dg.deg)), 6) AS adamic_adar
        |  FROM wedge JOIN deg dg ON wedge.u = dg.s GROUP BY a, b),
        |ne AS (SELECT pairs.* FROM pairs
        |  ANTI JOIN und ON pairs.a = und.s AND pairs.b = und.d)
        |SELECT ne.a, ne.b, ne.common,
        |  round(CAST(ne.common AS DOUBLE)
        |    / (da.deg + db.deg - ne.common), 6) AS jaccard,
        |  ne.adamic_adar
        |FROM ne JOIN deg da ON ne.a = da.s JOIN deg db ON ne.b = db.s
        |ORDER BY ne.adamic_adar DESC, ne.a, ne.b LIMIT 20""".stripMargin,
    // Assortativity replay: exact integer degree sums over the
    // directed edge multiset, Newman's ratio, one rint-rounded output.
    "q_assortativity" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p
        |  FROM lineitem WHERE l_orderkey < 12000),
        |e0 AS (SELECT CAST(x.p AS VARCHAR) AS s, CAST(y.p AS VARCHAR)
        |    AS d
        |  FROM lp x JOIN lp y ON x.k = y.k AND x.p <> y.p),
        |und AS (SELECT DISTINCT s, d FROM (
        |  SELECT s, d FROM e0 UNION ALL SELECT d AS s, s AS d FROM e0)
        |  WHERE s <> d),
        |deg AS (SELECT s, CAST(count(*) AS BIGINT) AS deg FROM und
        |  GROUP BY s),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(dj.deg * dk.deg) AS BIGINT) AS sjk,
        |    CAST(sum(dj.deg + dk.deg) AS BIGINT) AS sj,
        |    CAST(sum(dj.deg * dj.deg + dk.deg * dk.deg) AS BIGINT)
        |      AS sj2
        |  FROM und JOIN deg dj ON und.s = dj.s
        |    JOIN deg dk ON und.d = dk.s),
        |st AS (SELECT m, sjk, sj, sj2, CAST(m AS DOUBLE) AS md,
        |    CAST(sj AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)) AS mu
        |  FROM a)
        |SELECT m AS m_edges,
        |  (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
        |  round_even((CAST(sjk AS DOUBLE) / md - mu * mu)
        |    / (CAST(sj2 AS DOUBLE) / (2.0 * md) - mu * mu) * 1e6, 0)
        |    / 1e6 AS assortativity
        |FROM st""".stripMargin,
    // IV replay: conditional decimal-exact arm sums, the Wald ratio,
    // pooled-variance first-stage F, rint-rounded outputs.
    "q_iv_wald" ->
      """WITH c AS (SELECT (l_orderkey % 2 = 0) AS z,
        |    CAST(l_discount AS DOUBLE) * 100 AS d,
        |    CAST(l_extendedprice AS DOUBLE) AS y
        |  FROM lineitem WHERE l_discount IS NOT NULL
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_discount AS DOUBLE) * 100)
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |m AS (SELECT
        |    CAST(count(*) FILTER (WHERE z) AS BIGINT) AS n1,
        |    CAST(count(*) FILTER (WHERE NOT z) AS BIGINT) AS n0,
        |    CAST(sum(CAST(y AS DECIMAL(38,6))) FILTER (WHERE z)
        |      AS DOUBLE) AS sy1,
        |    CAST(sum(CAST(y AS DECIMAL(38,6))) FILTER (WHERE NOT z)
        |      AS DOUBLE) AS sy0,
        |    CAST(sum(CAST(d AS DECIMAL(38,6))) FILTER (WHERE z)
        |      AS DOUBLE) AS sd1,
        |    CAST(sum(CAST(d AS DECIMAL(38,6))) FILTER (WHERE NOT z)
        |      AS DOUBLE) AS sd0,
        |    CAST(sum(CAST(d * d AS DECIMAL(38,6))) FILTER (WHERE z)
        |      AS DOUBLE) AS sdd1,
        |    CAST(sum(CAST(d * d AS DECIMAL(38,6))) FILTER (WHERE NOT z)
        |      AS DOUBLE) AS sdd0
        |  FROM c),
        |s AS (SELECT n0, n1, CAST(n1 AS DOUBLE) AS n1d,
        |    CAST(n0 AS DOUBLE) AS n0d,
        |    sy1 / CAST(n1 AS DOUBLE) - sy0 / CAST(n0 AS DOUBLE) AS itt,
        |    sd1 / CAST(n1 AS DOUBLE) - sd0 / CAST(n0 AS DOUBLE) AS fs,
        |    sd1 / CAST(n1 AS DOUBLE) AS md1,
        |    sd0 / CAST(n0 AS DOUBLE) AS md0, sdd1, sdd0 FROM m),
        |v AS (SELECT n0, n1, n1d, n0d, itt, fs,
        |    ((sdd1 - n1d * md1 * md1) / (n1d - 1.0) * (n1d - 1.0)
        |      + (sdd0 - n0d * md0 * md0) / (n0d - 1.0) * (n0d - 1.0))
        |      / (n1d + n0d - 2.0) AS sp2 FROM s)
        |SELECT n0, n1,
        |  round_even(itt * 1e6, 0) / 1e6 AS itt,
        |  round_even(fs * 1e6, 0) / 1e6 AS first_stage,
        |  round_even(itt / fs * 1e6, 0) / 1e6 AS beta_iv,
        |  round_even(fs * fs / (sp2 * (1.0 / n1d + 1.0 / n0d))
        |    * 1e6, 0) / 1e6 AS first_stage_f
        |FROM v""".stripMargin,
    // RDD replay: conditional decimal-exact side moments on (x − c),
    // centered local-linear fits, the jump AT the cutoff.
    "q_rdd" ->
      """WITH c AS (SELECT CAST(l_quantity AS DOUBLE) - 25.0 AS xc,
        |    CAST(l_quantity AS DOUBLE) >= 25.0 AS r,
        |    CAST(l_extendedprice AS DOUBLE) AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_quantity AS DOUBLE))
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        |    AND abs(CAST(l_quantity AS DOUBLE) - 25.0) <= 15.0),
        |m AS (SELECT
        |    CAST(count(*) FILTER (WHERE NOT r) AS BIGINT) AS nl,
        |    CAST(count(*) FILTER (WHERE r) AS BIGINT) AS nr,
        |    CAST(sum(CAST(xc AS DECIMAL(38,6))) FILTER (WHERE NOT r)
        |      AS DOUBLE) AS sxl,
        |    CAST(sum(CAST(xc AS DECIMAL(38,6))) FILTER (WHERE r)
        |      AS DOUBLE) AS sxr,
        |    CAST(sum(CAST(y AS DECIMAL(38,6))) FILTER (WHERE NOT r)
        |      AS DOUBLE) AS syl,
        |    CAST(sum(CAST(y AS DECIMAL(38,6))) FILTER (WHERE r)
        |      AS DOUBLE) AS syr,
        |    CAST(sum(CAST(xc * xc AS DECIMAL(38,6)))
        |      FILTER (WHERE NOT r) AS DOUBLE) AS sxxl,
        |    CAST(sum(CAST(xc * xc AS DECIMAL(38,6))) FILTER (WHERE r)
        |      AS DOUBLE) AS sxxr,
        |    CAST(sum(CAST(xc * y AS DECIMAL(38,6)))
        |      FILTER (WHERE NOT r) AS DOUBLE) AS sxyl,
        |    CAST(sum(CAST(xc * y AS DECIMAL(38,6))) FILTER (WHERE r)
        |      AS DOUBLE) AS sxyr
        |  FROM c),
        |f AS (SELECT nl, nr,
        |    (sxyl - sxl * syl / CAST(nl AS DOUBLE))
        |      / (sxxl - sxl * sxl / CAST(nl AS DOUBLE)) AS sl,
        |    (sxyr - sxr * syr / CAST(nr AS DOUBLE))
        |      / (sxxr - sxr * sxr / CAST(nr AS DOUBLE)) AS sr,
        |    syl / CAST(nl AS DOUBLE) AS myl,
        |    syr / CAST(nr AS DOUBLE) AS myr,
        |    sxl / CAST(nl AS DOUBLE) AS mxl,
        |    sxr / CAST(nr AS DOUBLE) AS mxr FROM m),
        |i AS (SELECT nl, nr, sl, sr, myl - sl * mxl AS il,
        |    myr - sr * mxr AS ir FROM f)
        |SELECT nl AS n_left, nr AS n_right,
        |  round_even(il * 1e6, 0) / 1e6 AS intercept_left,
        |  round_even(ir * 1e6, 0) / 1e6 AS intercept_right,
        |  round_even(sl * 1e6, 0) / 1e6 AS slope_left,
        |  round_even(sr * 1e6, 0) / 1e6 AS slope_right,
        |  round_even((ir - il) * 1e6, 0) / 1e6 AS effect
        |FROM i""".stripMargin,
    // Randomization-test replay: the same md5 fair coin per (row, k),
    // per-k mean gaps on 6-rounded values, add-one p — all integers
    // and rounded ratios.
    "q_perm_test" ->
      """WITH c AS (SELECT CAST(event_id AS VARCHAR) AS id,
        |    event_type AS g, value AS v
        |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        |    AND event_type IN ('click', 'view')),
        |obs AS (SELECT
        |    CAST(count(*) FILTER (WHERE g = 'click') AS BIGINT) AS na,
        |    CAST(count(*) FILTER (WHERE g = 'view') AS BIGINT) AS nb,
        |    sum(CASE WHEN g = 'click' THEN v ELSE 0.0 END) AS sa,
        |    sum(CASE WHEN g = 'view' THEN v ELSE 0.0 END) AS sb
        |  FROM c),
        |ob AS (SELECT na, nb,
        |    round_even((sa / CAST(na AS DOUBLE)
        |      - sb / CAST(nb AS DOUBLE)) * 1e6, 0) / 1e6 AS diff_obs
        |  FROM obs),
        |perm AS (SELECT c.id, c.v, k.k,
        |    CAST(('0x' || substr(md5(c.id || '#' ||
        |      CAST(k.k AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS coin
        |  FROM c, (SELECT unnest(range(1, 101)) AS k) k),
        |d AS (SELECT k,
        |    CAST(count(*) FILTER (WHERE coin = 0) AS BIGINT) AS ka,
        |    CAST(count(*) FILTER (WHERE coin = 1) AS BIGINT) AS kb,
        |    sum(CASE WHEN coin = 0 THEN v ELSE 0.0 END) AS sa,
        |    sum(CASE WHEN coin = 1 THEN v ELSE 0.0 END) AS sb
        |  FROM perm GROUP BY k),
        |ge AS (SELECT CAST(sum(CASE WHEN ka = 0 OR kb = 0 THEN 1 WHEN
        |      abs(round(sa / CAST(ka AS DOUBLE)
        |        - sb / CAST(kb AS DOUBLE), 6)) >= (SELECT abs(diff_obs)
        |          FROM ob)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_ge
        |  FROM d)
        |SELECT ob.na AS n_a, ob.nb AS n_b, ob.diff_obs,
        |  CAST(100 AS BIGINT) AS k, ge.n_ge,
        |  round_even((1.0 + ge.n_ge) / 101.0 * 1e6, 0) / 1e6 AS p_value
        |FROM ob, ge""".stripMargin,
    // PSM replay: control cells on the 4-rounded score grid, nearest
    // cell per distinct treated score (ties toward the LOWER cell),
    // decimal-exact gap fold.
    "q_psm" ->
      """WITH c AS (SELECT (l_returnflag = 'R') AS t,
        |    round((CAST(l_quantity AS DOUBLE)
        |      + CAST(l_linenumber AS DOUBLE)) / 100, 4) AS s,
        |    CAST(l_extendedprice AS DOUBLE) AS y
        |  FROM lineitem WHERE l_returnflag IS NOT NULL
        |    AND l_quantity IS NOT NULL AND l_linenumber IS NOT NULL
        |    AND l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |cells AS (SELECT s, CAST(count(*) AS BIGINT) AS cnt,
        |    round(avg(y), 6) AS my FROM c WHERE NOT t GROUP BY s),
        |tr AS (SELECT s, y FROM c WHERE t),
        |tcell AS (SELECT DISTINCT s FROM tr),
        |cand AS (SELECT t.s, cl.my, abs(cl.s - t.s) AS dist,
        |    cl.s AS cs FROM tcell t CROSS JOIN cells cl),
        |pick AS (SELECT s, my FROM (SELECT s, my,
        |    row_number() OVER (PARTITION BY s ORDER BY dist, cs)
        |      AS rn FROM cand) WHERE rn = 1),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS nt,
        |    CAST(sum(CAST(t.y - p.my AS DECIMAL(38,6))) AS DOUBLE)
        |      AS sg,
        |    CAST(sum(CAST(abs(t.y - p.my) AS DECIMAL(38,6)))
        |      AS DOUBLE) AS sa
        |  FROM tr t JOIN pick p USING (s))
        |SELECT nt AS n_treated,
        |  (SELECT CAST(sum(cnt) AS BIGINT) FROM cells) AS n_control,
        |  (SELECT CAST(count(*) AS BIGINT) FROM cells) AS n_cells,
        |  round_even(sg / nt * 1e6, 0) / 1e6 AS att,
        |  round_even(sa / nt * 1e6, 0) / 1e6 AS mean_gap
        |FROM agg""".stripMargin,
    // Tweedie replay: three Fisher steps with mu-dependent gradient
    // AND information re-summed per step (2x2 Cramer per step; the
    // engine's Gaussian solve agrees to the output rounding), then
    // the p=1.5 unit deviance and Pearson dispersion.
    "q_tweedie" ->
      """WITH base AS (SELECT greatest(value - 60, 0.0) AS y,
        |    CAST(epoch_ns(ts) % 86400000000000 AS DOUBLE)
        |      / 3600000000000.0 AS x
        |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        |    AND ts IS NOT NULL),
        |w AS (SELECT ln(avg(y)) AS b0i, CAST(count(*) AS BIGINT) AS n
        |  FROM base),
        |s1 AS (SELECT
        |    sum((y - exp(w.b0i)) / sqrt(exp(w.b0i))) AS g0,
        |    sum((y - exp(w.b0i)) / sqrt(exp(w.b0i)) * x) AS g1,
        |    sum(sqrt(exp(w.b0i))) AS h00,
        |    sum(sqrt(exp(w.b0i)) * x) AS h01,
        |    sum(sqrt(exp(w.b0i)) * x * x) AS h11
        |  FROM base CROSS JOIN w),
        |b1 AS (SELECT
        |    w.b0i + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01)
        |      AS b0,
        |    (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1,
        |    w.n FROM w, s1),
        |s2 AS (SELECT
        |    sum((y - exp(b.b0 + b.b1 * x))
        |      / sqrt(exp(b.b0 + b.b1 * x))) AS g0,
        |    sum((y - exp(b.b0 + b.b1 * x))
        |      / sqrt(exp(b.b0 + b.b1 * x)) * x) AS g1,
        |    sum(sqrt(exp(b.b0 + b.b1 * x))) AS h00,
        |    sum(sqrt(exp(b.b0 + b.b1 * x)) * x) AS h01,
        |    sum(sqrt(exp(b.b0 + b.b1 * x)) * x * x) AS h11
        |  FROM base CROSS JOIN b1 b),
        |b2 AS (SELECT
        |    b0 + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
        |    b1 + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1,
        |    n FROM b1, s2),
        |s3 AS (SELECT
        |    sum((y - exp(b.b0 + b.b1 * x))
        |      / sqrt(exp(b.b0 + b.b1 * x))) AS g0,
        |    sum((y - exp(b.b0 + b.b1 * x))
        |      / sqrt(exp(b.b0 + b.b1 * x)) * x) AS g1,
        |    sum(sqrt(exp(b.b0 + b.b1 * x))) AS h00,
        |    sum(sqrt(exp(b.b0 + b.b1 * x)) * x) AS h01,
        |    sum(sqrt(exp(b.b0 + b.b1 * x)) * x * x) AS h11
        |  FROM base CROSS JOIN b2 b),
        |b3 AS (SELECT
        |    b0 + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
        |    b1 + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1,
        |    n FROM b2, s3),
        |fin AS (SELECT
        |    sum(2.0 * (-4.0 * sqrt(y) + 2.0 * y / sqrt(mu)
        |      + 2.0 * sqrt(mu))) AS dev,
        |    sum((y - mu) * (y - mu) / (mu * sqrt(mu))) AS pearson
        |  FROM (SELECT y, exp(b.b0 + b.b1 * x) AS mu
        |    FROM base CROSS JOIN b3 b))
        |SELECT round_even(b3.b0 * 1e6, 0) / 1e6 AS b0_r,
        |  round_even(b3.b1 * 1e6, 0) / 1e6 AS b1_r,
        |  round_even(fin.dev * 100.0, 0) / 100.0 AS dev_r,
        |  round_even(fin.pearson / (b3.n - 2) * 1e6, 0) / 1e6 AS disp_r,
        |  b3.n FROM b3, fin""".stripMargin,
    // RAKE replay: the same lowercase/collapse/stopword-delimit
    // pipeline (RE2 and Java agree on these \b alternations), exact
    // integer deg/freq, rounded phrase-score ranking.
    "q_rake" ->
      """WITH ph AS (SELECT unnest(list_filter(list_transform(
        |    str_split(regexp_replace(regexp_replace(
        |      lower(coalesce(text, '')), '[^a-z]+', ' ', 'g'),
        |      '\b(the|a|an|and|or|of|to|in|is|are|was|for|on|with|as|at|by|it|be|this|that)\b',
        |      '|', 'g'), '|'),
        |    p -> trim(regexp_replace(p, ' +', ' ', 'g'))),
        |    p -> p <> '')) AS phrase
        |  FROM documents),
        |occ AS (SELECT phrase,
        |    CAST(len(str_split(phrase, ' ')) AS BIGINT) AS nw
        |  FROM ph),
        |ws AS (SELECT w, CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(nw) AS BIGINT) AS deg
        |  FROM (SELECT unnest(str_split(phrase, ' ')) AS w, nw
        |    FROM occ) GROUP BY w),
        |pt AS (SELECT phrase, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(max(nw) AS BIGINT) AS n_words FROM occ GROUP BY phrase),
        |px AS (SELECT pt.phrase, pt.n_words, pt.cnt,
        |    unnest(str_split(pt.phrase, ' ')) AS w FROM pt),
        |sc AS (SELECT phrase, n_words, cnt,
        |    round(sum(CAST(deg AS DOUBLE) / freq), 6) AS score
        |  FROM px JOIN ws USING (w) GROUP BY phrase, n_words, cnt)
        |SELECT phrase, n_words, cnt AS count, score FROM sc
        |ORDER BY score DESC, phrase LIMIT 20""".stripMargin,
    // Burstiness replay: one (term, doc) count aggregation, exact
    // integer ratios, VMR over all docs (zeros via the N denominator).
    "q_burstiness" ->
      """WITH tok AS (SELECT doc_id AS id,
        |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        |  FROM documents WHERE doc_id IS NOT NULL),
        |pd AS (SELECT id, w, CAST(count(*) AS BIGINT) AS c
        |  FROM tok GROUP BY id, w),
        |st AS (SELECT w, CAST(sum(c) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS doc_freq,
        |    CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS repeat_docs,
        |    CAST(sum(c * c) AS BIGINT) AS c2 FROM pd GROUP BY w),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents
        |  WHERE doc_id IS NOT NULL)
        |SELECT w AS term, total, doc_freq, repeat_docs,
        |  round(CAST(repeat_docs AS DOUBLE) / doc_freq, 6)
        |    AS adaptation,
        |  round(CAST(total AS DOUBLE) / doc_freq, 6) AS rate_in_docs,
        |  round((CAST(c2 AS DOUBLE) / n.nd
        |    - (CAST(total AS DOUBLE) / n.nd)
        |      * (CAST(total AS DOUBLE) / n.nd))
        |    / (CAST(total AS DOUBLE) / n.nd), 6) AS vmr
        |FROM st, n ORDER BY total DESC, term LIMIT 30""".stripMargin,
    // SCD2 replay: null-safe change detection under the (key, ts, id)
    // window, lead() validity intervals, per-key version numbering.
    "q_scd2" -> scd2OracleSql,
    // The streaming twin replays to the IDENTICAL dimension — one
    // oracle, two engines (batch windows vs transformWithState).
    "q_stream_scd2" -> scd2OracleSql,
    // Reconciliation replay: identical md5 row/bucket hashing (48-bit
    // prefix mod 1e9), per-bucket counts + hash sums, FULL JOIN.
    "q_reconcile" ->
      """WITH ha AS (SELECT
        |    CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),
        |      1, 8)) AS BIGINT) % 64 AS bucket,
        |    CAST(('0x' || substr(md5(concat_ws('|',
        |      coalesce('v' || CAST(l_orderkey AS VARCHAR), 'n'),
        |      coalesce('v' || CAST(l_linenumber AS VARCHAR), 'n'),
        |      coalesce('v' || CAST(l_partkey AS VARCHAR), 'n'),
        |      coalesce('v' || CAST(l_suppkey AS VARCHAR), 'n'),
        |      coalesce('v' || l_returnflag, 'n'),
        |      coalesce('v' || l_linestatus, 'n'))), 1, 12)) AS BIGINT)
        |      % 1000000000 AS h
        |  FROM lineitem WHERE l_orderkey IS NOT NULL),
        |hb AS (SELECT
        |    CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),
        |      1, 8)) AS BIGINT) % 64 AS bucket,
        |    CAST(('0x' || substr(md5(concat_ws('|',
        |      coalesce('v' || CAST(l_orderkey AS VARCHAR), 'n'),
        |      coalesce('v' || CAST(l_linenumber AS VARCHAR), 'n'),
        |      coalesce('v' || CAST(l_partkey AS VARCHAR), 'n'),
        |      coalesce('v' || CAST(l_suppkey AS VARCHAR), 'n'),
        |      coalesce('v' || l_returnflag, 'n'),
        |      coalesce('v' || l_linestatus, 'n'))), 1, 12)) AS BIGINT)
        |      % 1000000000 AS h
        |  FROM lineitem WHERE l_orderkey IS NOT NULL
        |    AND l_orderkey % 997 <> 0),
        |ga AS (SELECT bucket, CAST(count(*) AS BIGINT) AS count_a,
        |    CAST(sum(h) AS BIGINT) AS hash_a FROM ha GROUP BY bucket),
        |gb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS count_b,
        |    CAST(sum(h) AS BIGINT) AS hash_b FROM hb GROUP BY bucket)
        |SELECT coalesce(ga.bucket, gb.bucket) AS bucket,
        |  coalesce(count_a, 0) AS count_a, coalesce(count_b, 0)
        |    AS count_b,
        |  coalesce(hash_a, 0) AS hash_a, coalesce(hash_b, 0) AS hash_b,
        |  coalesce(count_a, 0) = coalesce(count_b, 0)
        |    AND coalesce(hash_a, 0) = coalesce(hash_b, 0) AS is_match
        |FROM ga FULL JOIN gb ON ga.bucket = gb.bucket
        |ORDER BY bucket""".stripMargin,
    // Coreset replay: the same greedy chain as five materialized CTE
    // steps — left-to-right list_reduce distance folds match the
    // engine's aggregate/zip_with bit-for-bit, argmax by (d DESC, id).
    "q_coreset" -> coresetOracleSql
  )
}
