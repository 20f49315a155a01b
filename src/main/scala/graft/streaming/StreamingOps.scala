package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, functions => F}
import org.apache.spark.sql.streaming.GroupStateTimeout
import graft.dists.{DistRegistry, FrozenModel}

/** Structured Streaming surface: the engine's aggregations re-expressed
  * over unbounded inputs (readStream → transform → writeStream), designed
  * the way the batch operators are — fixed-size state, no per-row driver
  * work, watermarks bounding state growth.
  *
  * The reference is batch-only; these are the streaming equivalents a
  * 100 TB ingest pipeline needs: continuous histograms over event-time
  * windows (monitoring a distribution as data lands) and streaming
  * dedup (dropping repeated documents on arrival).
  *
  * Design notes for scale:
  *  - A streaming histogram cannot scan for min/max first, so bins are
  *    FIXED up-front (binStart/binWidth/numBins) — state per window is
  *    ≤ numBins rows regardless of throughput, and the aggregation is a
  *    plain codegen'd groupBy the planner runs with partial aggregation.
  *  - Dedup keeps one fingerprint per key inside the watermark horizon —
  *    `dropDuplicatesWithinWatermark` bounds state; an unbounded
  *    `dropDuplicates` on a stream would grow state forever.
  */
object StreamingOps {

  /** Equal-width bin index with fixed spec — identical arithmetic to the
    * batch Histogram (floor((x − start)/width), clamped). */
  def binOf(col: Column, binStart: Double, binWidth: Double, numBins: Int): Column =
    F.least(
      F.greatest(F.floor((col - F.lit(binStart)) / F.lit(binWidth)), F.lit(0L)),
      F.lit((numBins - 1).toLong))

  /** Per-event-time-window histogram of a numeric column.
    *
    * @param df         streaming DataFrame
    * @param valueCol   numeric column to histogram
    * @param timeCol    event-time column (timestamp)
    * @param window     window duration, e.g. "1 minute"
    * @param watermark  lateness horizon, e.g. "2 minutes"
    * @return streaming DF of (window, bin, cnt) — append/update-mode ready
    */
  def windowedHistogram(df: DataFrame, valueCol: String, timeCol: String,
                        binStart: Double, binWidth: Double, numBins: Int,
                        window: String = "1 minute",
                        watermark: String = "2 minutes"): DataFrame = {
    val v = F.col(valueCol).cast("double")
    // NaN excluded like the batch Histogram (floor(NaN) codegens to 0L,
    // which would silently count NaN rows as bin-0 mass)
    df.withWatermark(timeCol, watermark)
      .where(v.isNotNull && !F.isnan(v))
      .select(F.window(F.col(timeCol), window).as("window"),
        binOf(v, binStart, binWidth, numBins).as("bin"))
      .groupBy("window", "bin")
      .agg(F.count(F.lit(1)).as("cnt"))
  }

  /** Windowed distinct counts via the mergeable HLL sketch aggregate —
    * the metric exact aggregation CANNOT provide in streaming
    * (`countDistinct` needs unbounded per-window distinct state, which
    * Structured Streaming rejects): state per window is one ~2^lgK-byte
    * sketch regardless of throughput, micro-batch partials merge by
    * sketch union, and the estimate carries HLL's ~1.6%/√(2^lgK·2⁻¹⁰)
    * error contract. "Distinct users per day over an unbounded ingest"
    * in bounded state. */
  def windowedDistinct(df: DataFrame, valueCol: String, timeCol: String,
                       window: String = "1 minute",
                       watermark: String = "2 minutes",
                       lgK: Int = 12): DataFrame =
    df.withWatermark(timeCol, watermark)
      .groupBy(F.window(F.col(timeCol), window).as("window"))
      .agg(F.expr(s"hll_sketch_estimate(hll_sketch_agg($valueCol, $lgK))")
        .as("n_distinct_est"))

  /** Windowed heavy hitters via the SpaceSaving typed aggregate — exact
    * per-window top keys when `cap` ≥ the window's distinct-key count,
    * guaranteed-overcount candidates beyond that; either way state per
    * window is `cap` entries REGARDLESS of throughput (the per-key
    * windowed groupBy would hold every key). Micro-batch partials merge
    * by the sketch's own merge; the explode after the aggregation is
    * stateless. Ranking/limit stays with the caller (a window function
    * is not streamable — and the sink sees ≤ cap rows per window
    * anyway).
    *
    * @return (window, key, cnt, err) — err is SpaceSaving's overcount
    *         bound, 0 in the exactness regime */
  def windowedTopK(df: DataFrame, keyCol: String, timeCol: String,
                   cap: Int = 256, window: String = "1 minute",
                   watermark: String = "2 minutes"): DataFrame = {
    val ss = F.udaf(new graft.functions.SpaceSaving(cap))
    df.withWatermark(timeCol, watermark)
      .where(F.col(keyCol).isNotNull)
      .select(F.window(F.col(timeCol), window).as("window"),
        F.col(keyCol).cast("string").as("__k"))
      .groupBy("window")
      .agg(ss(F.col("__k")).as("hh"))
      .select(F.col("window"), F.explode(F.col("hh")).as("h"))
      .select(F.col("window"), F.col("h._1").as("key"),
        F.col("h._2").as("cnt"), F.col("h._3").as("err"))
  }

  private lazy val kllProbeUdf = F.udf {
    (bytes: Array[Byte], p: Double) =>
      if (bytes == null) null
      else {
        val sk = org.apache.datasketches.kll.KllDoublesSketch.heapify(
          org.apache.datasketches.memory.Memory.wrap(bytes))
        if (sk.isEmpty) null else java.lang.Double.valueOf(sk.getQuantile(p))
      }
  }

  /** Windowed quantiles via the mergeable KLL sketch aggregate — the
    * streaming analogue of [[graft.operators.Sketches.kllSketch]]:
    * per-window state is ONE ~3 KB sketch however many rows the window
    * sees (exact windowed quantiles would hold every value — Structured
    * Streaming rightly rejects that), micro-batch partials merge by
    * sketch union, probes carry KLL's ~1.33%/(k/100) rank-error
    * contract. The probe projection after the aggregation is stateless.
    *
    * @return (window, n, q_<p> for each requested probe) */
  def windowedQuantiles(df: DataFrame, valueCol: String, timeCol: String,
                        probs: Seq[Double] = Seq(0.5, 0.9, 0.99),
                        k: Int = 800, window: String = "1 minute",
                        watermark: String = "2 minutes"): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0.0 && p < 1.0),
      "probes must be in (0, 1)")
    val kll = F.udaf(new graft.functions.KllGroupSketch(k))
    val v = F.col(valueCol).cast("double")
    val agged = df.withWatermark(timeCol, watermark)
      .where(v.isNotNull && !F.isnan(v))
      .select(F.window(F.col(timeCol), window).as("window"), v.as("__v"))
      .groupBy("window")
      .agg(F.count(F.lit(1)).as("n"), kll(F.col("__v")).as("__sk"))
    probs.foldLeft(agged) { (acc, p) =>
      acc.withColumn(s"q_${(p * 100).round}",
        kllProbeUdf(F.col("__sk"), F.lit(p)))
    }.drop("__sk")
  }

  /** Running global histogram (update mode): one row per bin, state size
    * = numBins forever. */
  def runningHistogram(df: DataFrame, valueCol: String,
                       binStart: Double, binWidth: Double, numBins: Int): DataFrame = {
    val v = F.col(valueCol).cast("double")
    df.where(v.isNotNull && !F.isnan(v))
      .select(binOf(v, binStart, binWidth, numBins).as("bin"))
      .groupBy("bin")
      .agg(F.count(F.lit(1)).as("cnt"))
  }

  /** Streaming exact dedup: drop rows whose text fingerprint was already
    * seen within the watermark horizon. State = one md5 per surviving
    * document inside the horizon. */
  def streamingDedup(df: DataFrame, textCol: String, timeCol: String,
                     watermark: String = "10 minutes"): DataFrame =
    df.withWatermark(timeCol, watermark)
      .withColumn("__md5", F.md5(F.col(textCol).cast("binary")))
      .dropDuplicatesWithinWatermark("__md5")
      .drop("__md5")

  /** Streaming per-(window, key) distribution FITTING: the
    * [[graft.operators.GroupedFit]] closed forms over a windowed
    * streaming aggregation — "fit a latency model per (hour, tenant) on
    * the live ingest, pick the best family by AIC as the window closes".
    *
    * Works because the whole fit is sufficient statistics: the stateful
    * part is ONE bounded row per (window, key) — count/mean/var/min/max/
    * log-moments/Σx², all built-in declarative aggregates the streaming
    * engine partial-aggregates and watermark-expires like any windowed
    * stats query — and the per-family parameter/loglik/AIC arithmetic
    * plus the family explode are STATELESS projections after the
    * aggregate. No fitting state grows with throughput; the driver-side
    * fan-out fitter could never run inside a micro-batch.
    *
    * @return streaming frame of (window, keyCols..., n, distribution,
    *         parameters, loglik, aic, bic) — one row per admissible
    *         family per (window, key), same schema and semantics as the
    *         batch [[graft.operators.GroupedFit.fitByGroup]] */
  def windowedGroupedFit(df: DataFrame, valueCol: String,
                         keyCols: Seq[String], timeCol: String,
                         window: String = "1 minute",
                         watermark: String = "2 minutes"): DataFrame = {
    val base = df.withWatermark(timeCol, watermark)
      .select((keyCols.map(F.col) :+
        F.window(F.col(timeCol), window).as("window") :+
        F.col(valueCol)): _*)
    graft.operators.GroupedFit.fitByGroup(base, valueCol,
      "window" +: keyCols)
  }

  /** Streaming per-window column statistics (count/mean/min/max/stddev) —
    * the data-stats operator over an unbounded input. */
  def windowedStats(df: DataFrame, valueCol: String, timeCol: String,
                    window: String = "1 minute",
                    watermark: String = "2 minutes"): DataFrame = {
    val v = F.col(valueCol).cast("double")
    df.withWatermark(timeCol, watermark)
      .select(F.window(F.col(timeCol), window).as("window"), v.as("v"))
      .groupBy("window")
      .agg(F.count(F.lit(1)).as("cnt"), F.avg("v").as("mean"),
        F.min("v").as("mn"), F.max("v").as("mx"),
        F.stddev_pop("v").as("std"))
  }

  /** Live A/B conversion monitor: per (window, variant) the conversion
    * count/rate plus the Wilson score band — the interval that stays
    * inside [0, 1] when a fresh window has 3 users. Pure watermarked
    * windowed aggregation (state = one row per (window, variant));
    * the Wilson algebra is stateless column arithmetic after the
    * aggregate, so ANY throughput carries the same state. The
    * streaming face of [[graft.operators.Experiments.wilsonByGroup]].
    */
  def windowedConversion(df: DataFrame, variantCol: String,
                         successCol: String, timeCol: String,
                         window: String = "1 minute",
                         watermark: String = "2 minutes",
                         z: Double = 1.959964): DataFrame = {
    val y = F.col(successCol).cast("boolean")
    val agged = df.withWatermark(timeCol, watermark)
      .select(F.window(F.col(timeCol), window).as("window"),
        F.col(variantCol).cast("string").as("variant"), y.as("y"))
      .where(F.col("y").isNotNull)
      .groupBy("window", "variant")
      .agg(F.count(F.lit(1)).as("n"),
        F.sum(F.when(F.col("y"), 1L).otherwise(0L)).as("x"))
    val n = F.col("n").cast("double")
    val p = F.col("x").cast("double") / n
    val z2 = z * z
    val denom = F.lit(1.0) + F.lit(z2) / n
    val center = (p + F.lit(z2 / 2.0) / n) / denom
    val half = F.lit(z) * F.sqrt(p * (F.lit(1.0) - p) / n +
      F.lit(z2 / 4.0) / (n * n)) / denom
    agged
      .withColumn("rate", F.round(p, 6))
      .withColumn("ci_lo", F.round(center - half, 6))
      .withColumn("ci_hi", F.round(center + half, 6))
  }

  /** Per-window distribution-drift score against a fitted reference model:
    * the histogram rides the hist_counts typed aggregate (ONE array-state
    * row per window, partial-aggregated map-side), and the drift is the
    * SSE between each window's empirical bin share and the model's bin
    * probability (tails folded into the clamped edge bins). This is the
    * streaming companion of the batch fit: fit once on yesterday's data,
    * watch today's stream drift away from it. */
  def windowedDriftScore(df: DataFrame, valueCol: String, timeCol: String,
                         distName: String, params: Array[Double],
                         binStart: Double, binWidth: Double, numBins: Int,
                         window: String = "1 minute",
                         watermark: String = "2 minutes"): DataFrame = {
    val dist = DistRegistry.get(distName).getOrElse(
      throw new IllegalArgumentException(s"unknown distribution '$distName'"))
    val m = FrozenModel(dist, params, None, None)
    val expected: Array[Double] = Array.tabulate(numBins) { i =>
      val lo = binStart + i * binWidth
      val hi = lo + binWidth
      val p =
        if (numBins == 1) 1.0
        else if (i == 0) m.cdf(hi)
        else if (i == numBins - 1) 1.0 - m.cdf(lo)
        else m.cdf(hi) - m.cdf(lo)
      if (p.isNaN) 0.0 else p
    }
    val histUdaf = F.udaf(graft.functions.HistAggregator)
    val share = (c: Column) => c.cast("double") / F.col("n")
    df.withWatermark(timeCol, watermark)
      .select(F.window(F.col(timeCol), window).as("window"),
        F.col(valueCol).cast("double").as("v"))
      .groupBy("window")
      .agg(
        histUdaf(F.col("v"), F.lit(binStart),
          F.lit(binStart + binWidth * numBins), F.lit(numBins)).as("h"),
        F.count(F.lit(1)).as("n"))
      .select(F.col("window"), F.col("n"),
        F.round(F.aggregate(
          F.zip_with(F.col("h"), F.lit(expected),
            (c, p) => (share(c) - p) * (share(c) - p)),
          F.lit(0.0), (acc, x) => acc + x), 8).as("drift_sse"))
  }

  /** Streaming gap-based sessionization via the native `session_window`:
    * per-key sessions close once no event arrives within `gap`, emitting
    * (key, session window, n_events, value sum). The streaming companion
    * of the batch [[graft.operators.Sessionize]] — state per open session
    * is one window row, bounded by the watermark horizon. */
  def sessionStats(df: DataFrame, keyCol: String, timeCol: String,
                   valueCol: String, gap: String = "30 minutes",
                   watermark: String = "1 hour"): DataFrame =
    df.withWatermark(timeCol, watermark)
      .groupBy(F.col(keyCol), F.session_window(F.col(timeCol), gap).as("session"))
      .agg(F.count(F.lit(1)).as("n_events"),
        F.sum(F.col(valueCol).cast("double")).as("value_sum"))

  /** Watermarked stream-stream inner join: each left event pairs with the
    * right-stream events of the same key whose event time falls in
    * `[leftTime − lookback, leftTime]` — the click-to-recent-purchase
    * attribution shape. Both sides carry watermarks and the join condition
    * carries the time bound, so Spark derives a state-eviction horizon for
    * BOTH buffers (without the interval condition, stream-stream join
    * state grows forever). Inner-join matches are emitted exactly once,
    * so the availableNow replay of a bounded source reproduces the batch
    * interval join bit-for-bit — that equivalence is the harness check.
    *
    * At scale the state per key is the lookback window's worth of rows on
    * each side; the join itself is a key-hash exchange of the two streams,
    * identical in shape to the batch shuffle join. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTimeCol: String, rightTimeCol: String,
                   lookback: String = "1 hour",
                   watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTimeCol, watermark)
    val r = right.withWatermark(rightTimeCol, watermark)
    l.join(r,
      l(keyCol) === r(keyCol) &&
        r(rightTimeCol) >= l(leftTimeCol) - F.expr(s"INTERVAL $lookback") &&
        r(rightTimeCol) <= l(leftTimeCol),
      "inner")
      .drop(r(keyCol))
  }

  /** Streaming three-step funnel as CHAINED watermarked interval joins
    * — "view → click within `lookback` → purchase within `lookback`",
    * emitted as one row per qualifying (k, t1, t2, t3) path in append
    * mode: the multi-hop generalization of [[intervalJoin]], and the
    * shape that proves multiple stateful operators compose (Spark
    * 3.4+). Strict `<` ordering between consecutive steps keeps a
    * same-timestamp pair from matching in both directions.
    *
    * State per hop is the lookback's worth of rows per key on each
    * side (both sides watermarked, the join condition carries the
    * bound, so eviction horizons derive for every buffer); matches
    * emit exactly once, which is why the availableNow replay of a
    * bounded source hash-matches the batch triple join.
    *
    * @param step1/step2/step3 frames of (keyCol, timeCol) events for
    *        each funnel stage (pre-filtered by the caller) */
  def funnelPaths(step1: DataFrame, step2: DataFrame, step3: DataFrame,
                  keyCol: String, timeCol: String,
                  lookback: String = "1 hour",
                  watermark: String = "1 hour"): DataFrame = {
    val s1 = step1.select(F.col(keyCol).as("k1"), F.col(timeCol).as("t1"))
      .withWatermark("t1", watermark)
    val s2 = step2.select(F.col(keyCol).as("k2"), F.col(timeCol).as("t2"))
      .withWatermark("t2", watermark)
    val s3 = step3.select(F.col(keyCol).as("k3"), F.col(timeCol).as("t3"))
      .withWatermark("t3", watermark)
    val hop1 = s2.join(s1,
        F.col("k2") === F.col("k1") &&
          F.col("t1") >= F.col("t2") - F.expr(s"INTERVAL $lookback") &&
          F.col("t1") < F.col("t2"),
        "inner")
      // strip t1's event-time tag (alias with empty metadata): the next
      // stateful operator allows at most ONE event-time column per side
      .select(F.col("k2"), F.col("t2"),
        F.col("t1").as("t1",
          org.apache.spark.sql.types.Metadata.empty))
    val hop2 = s3.join(hop1,
      F.col("k3") === F.col("k2") &&
        F.col("t2") >= F.col("t3") - F.expr(s"INTERVAL $lookback") &&
        F.col("t2") < F.col("t3"),
      "inner")
    hop2.select(F.col("k2").as(keyCol), F.col("t1"), F.col("t2"),
      F.col("t3"))
  }

  /** Per-key running statistics via explicit streaming state
    * (mapGroupsWithState): Welford count/mean/M2 updated per micro-batch.
    * State is three doubles per key — fixed-size regardless of throughput
    * — and the Welford recurrence is exact, so the emitted stats equal a
    * batch aggregate over everything seen so far. */
  final case class KeyStats(key: String, n: Long, mean: Double, m2: Double) {
    def variance: Double = if (n > 0) m2 / n else 0.0
    def std: Double = math.sqrt(variance)
  }

  def keyedRunningStats(ds: Dataset[(String, Double)]): Dataset[KeyStats] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .mapGroupsWithState[KeyStats, KeyStats](GroupStateTimeout.NoTimeout()) {
        (key, values, state) =>
          var (n, mean, m2) = state.getOption
            .map(s => (s.n, s.mean, s.m2)).getOrElse((0L, 0.0, 0.0))
          values.foreach { case (_, v) =>
            n += 1
            val d = v - mean
            mean += d / n
            m2 += d * (v - mean)
          }
          val s = KeyStats(key, n, mean, m2)
          state.update(s)
          s
      }
  }

  /** [[keyedRunningStats]] on Spark 4's `transformWithState` API — the
    * arbitrary-state v2 successor to mapGroupsWithState: typed
    * `ValueState` in the RocksDB state store with a declarative TTL, so
    * idle keys age out of state automatically instead of accumulating
    * forever (the unbounded-key-cardinality hazard at ingest scale).
    * Queries using this must run with the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`). */
  class WelfordProcessor(ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Double), KeyStats] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimerValues, OutputMode, TimeMode}
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[KeyStats] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[KeyStats]("welford",
        org.apache.spark.sql.Encoders.product[KeyStats],
        if (ttl == null) TTLConfig.NONE else TTLConfig(ttl))
    override def handleInputRows(key: String, rows: Iterator[(String, Double)],
                                 timerValues: TimerValues): Iterator[KeyStats] = {
      var (n, mean, m2) = Option(state.get())
        .map(s => (s.n, s.mean, s.m2)).getOrElse((0L, 0.0, 0.0))
      rows.foreach { case (_, v) =>
        n += 1
        val d = v - mean
        mean += d / n
        m2 += d * (v - mean)
      }
      val s = KeyStats(key, n, mean, m2)
      state.update(s)
      Iterator.single(s)
    }
  }

  def keyedRunningStatsTws(ds: Dataset[(String, Double)],
                           ttl: java.time.Duration): Dataset[KeyStats] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new WelfordProcessor(ttl),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** [[keyedRunningStatsTws]] without TTL, in TimeMode.None — no timer
    * micro-batches, so an availableNow replay terminates and the final
    * per-key stats are exact (the harness hash-checks them against
    * batch SQL). Use the TTL variant for 24/7 unbounded-key streams. */
  def keyedRunningStatsTwsExact(ds: Dataset[(String, Double)]): Dataset[KeyStats] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new WelfordProcessor(null),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** A prequentially-flagged anomalous event. */
  final case class Anomaly(key: String, tns: Long, value: Double,
                           z: Double, n_before: Long)

  /** Streaming prequential anomaly monitor on `transformWithState`:
    * each event is z-scored against its key's running Welford state AS
    * OF ARRIVAL (the state excludes the event itself — prequential, so
    * a level shift flags immediately instead of polluting its own
    * baseline), then folded in. State is (n, mean, M2) per key — three
    * numbers, any throughput. Within a micro-batch a key's rows are
    * sorted by (tns, eventId) before scoring, so with time-ordered
    * batches the flag sequence is deterministic and an availableNow
    * replay reproduces the batch prefix-window computation exactly
    * (the harness hash-checks that equivalence).
    *
    * @param ds (key, timestampNanos, eventId, value); eventId breaks
    *           timestamp ties
    * @return flagged events only: (key, tns, value, z rounded 6,
    *         n_before) */
  class PrequentialAnomalyProcessor(zThreshold: Double, minN: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long, Long, Double), Anomaly] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimerValues, OutputMode, TimeMode}
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[KeyStats] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[KeyStats]("welford",
        org.apache.spark.sql.Encoders.product[KeyStats], TTLConfig.NONE)
    override def handleInputRows(key: String,
                                 rows: Iterator[(String, Long, Long, Double)],
                                 timerValues: TimerValues): Iterator[Anomaly] = {
      var (n, mean, m2) = Option(state.get())
        .map(s => (s.n, s.mean, s.m2)).getOrElse((0L, 0.0, 0.0))
      val sorted = rows.toArray.sortBy(r => (r._2, r._3))
      val out = scala.collection.mutable.ArrayBuffer.empty[Anomaly]
      sorted.foreach { case (_, tns, _, v) =>
        if (n >= minN && m2 > 0.0) {
          val z = (v - mean) / math.sqrt(m2 / n)
          if (math.abs(z) > zThreshold)
            out += Anomaly(key, tns, v, math.rint(z * 1e6) / 1e6, n)
        }
        n += 1
        val d = v - mean
        mean += d / n
        m2 += d * (v - mean)
      }
      state.update(KeyStats(key, n, mean, m2))
      out.iterator
    }
  }

  def prequentialAnomaly(ds: Dataset[(String, Long, Long, Double)],
                         zThreshold: Double = 3.0,
                         minN: Long = 30L): Dataset[Anomaly] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(
        new PrequentialAnomalyProcessor(zThreshold, minN),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }

  /** Per-key CUSUM drift state: running sums, their prefix minima,
    * the statistic peaks and the alarm count. */
  final case class CusumState(key: String, n: Long,
                              cumHi: Double, minHi: Double,
                              cumLo: Double, minLo: Double,
                              maxHi: Double, maxLo: Double,
                              nAlarms: Long) {
    def sHi: Double = cumHi - minHi
    def sLo: Double = cumLo - minLo
  }

  /** Streaming two-sided CUSUM drift alarm on `transformWithState` —
    * the ACCUMULATING companion to [[prequentialAnomaly]] (which flags
    * single outliers; CUSUM integrates small persistent shifts until
    * they cross h, the classic "the mean moved 0.3σ three days ago"
    * detector):
    *
    *   S⁺_t = max(0, S⁺_{t−1} + (x_t − target − slack)),
    *   S⁻_t = max(0, S⁻_{t−1} + (target − x_t − slack))
    *
    * carried in the algebraically equal prefix-min form S⁺_t = cum_t −
    * min_{j≤t} cum_j (cum₀ = 0), so the state is SIX numbers per key
    * and — crucially — the no-reset statistic is a pure function of
    * the running sums: a batch engine replays the whole trajectory
    * with two window functions, no recursion, and the harness
    * hash-checks that equivalence. Rows sort by (tns, eventId) within
    * each batch (the [[PrequentialAnomalyProcessor]] determinism
    * contract). Emits the per-key state once per batch (update mode).
    */
  class CusumProcessor(target: Double, slack: Double, h: Double)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long, Long, Double), CusumState] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimerValues, OutputMode, TimeMode}
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[CusumState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[CusumState]("cusum",
        org.apache.spark.sql.Encoders.product[CusumState], TTLConfig.NONE)
    override def handleInputRows(key: String,
                                 rows: Iterator[(String, Long, Long, Double)],
                                 timerValues: TimerValues): Iterator[CusumState] = {
      var s = Option(state.get())
        .getOrElse(CusumState(key, 0L, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0L))
      val sorted = rows.toArray.sortBy(r => (r._2, r._3))
      sorted.foreach { case (_, _, _, v) =>
        val cumHi = s.cumHi + (v - target - slack)
        val minHi = math.min(s.minHi, cumHi)
        val cumLo = s.cumLo + (target - v - slack)
        val minLo = math.min(s.minLo, cumLo)
        val sHi = cumHi - minHi
        val sLo = cumLo - minLo
        s = CusumState(key, s.n + 1, cumHi, minHi, cumLo, minLo,
          math.max(s.maxHi, sHi), math.max(s.maxLo, sLo),
          s.nAlarms + (if (sHi > h || sLo > h) 1L else 0L))
      }
      state.update(s)
      Iterator.single(s)
    }
  }

  /** [[CusumProcessor]] wired for an exact availableNow replay
    * (TimeMode.None, update mode): ds = (key, tsNanos, eventId,
    * value). */
  def streamingCusum(ds: Dataset[(String, Long, Long, Double)],
                     target: Double, slack: Double,
                     h: Double): Dataset[CusumState] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new CusumProcessor(target, slack, h),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** An open per-key session under explicit streaming state. */
  final case class OpenSession(start: Long, last: Long, n: Long, valueSum: Double)

  /** A closed session emitted once its gap expires. */
  final case class ClosedSession(key: String, start: Long, end: Long,
                                 n: Long, valueSum: Double)

  /** Gap-based sessionization with EXPLICIT state via
    * `flatMapGroupsWithState` + event-time timeout — the fully-custom
    * state machine (vs [[sessionStats]], which leans on the native
    * `session_window`). Sessions close either when a later event arrives
    * past the gap (emitted immediately) or when the watermark passes
    * last+gap with no successor (emitted by the timeout callback).
    * State per key is ONE OpenSession — four numbers — bounded by key
    * cardinality regardless of throughput; a key whose session closed by
    * timeout holds no state at all. Late-but-valid stragglers (above the
    * watermark, behind the open session) merge into it with
    * min-start/max-end — one OpenSession of state cannot retroactively
    * split history; widen the watermark delay if exact late-event
    * session boundaries matter.
    *
    * Input: (key, eventTime, value) with the watermark set on the
    * timestamp column — it must survive into this operator (no
    * projection dropping it), or Spark rejects the event-time timeout. */
  def sessionizeWithState(ds: Dataset[(String, java.sql.Timestamp, Double)],
                          gapMs: Long): Dataset[ClosedSession] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) { (key, events, state) =>
        if (state.hasTimedOut) {
          val s = state.get
          state.remove()
          Iterator.single(ClosedSession(key, s.start, s.last, s.n, s.valueSum))
        } else {
          // micro-batch iterators are unsorted; order by event time first
          val sorted = events.toArray
            .map { case (k, t, v) => (k, t.getTime, v) }.sortBy(_._2)
          val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
          var cur = state.getOption
          sorted.foreach { case (_, t, v) =>
            cur match {
              // only a FORWARD gap splits sessions; a late-but-valid event
              // (t inside or before the open session, still above the
              // watermark) merges, extending start/end as needed — without
              // buffering every event, retroactively splitting an earlier
              // session isn't possible, so merge-with-min-start is the
              // documented approximation for cross-batch stragglers
              case Some(s) if t <= s.last || t - s.last <= gapMs =>
                cur = Some(OpenSession(math.min(s.start, t),
                  math.max(s.last, t), s.n + 1, s.valueSum + v))
              case Some(s) =>
                closed += ClosedSession(key, s.start, s.last, s.n, s.valueSum)
                cur = Some(OpenSession(t, t, 1L, v))
              case None =>
                cur = Some(OpenSession(t, t, 1L, v))
            }
          }
          cur match {
            case Some(s) =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            case None => state.remove()
          }
          closed.iterator
        }
      }
  }

  /** Drive a streaming DataFrame over a bounded source to completion with
    * `Trigger.AvailableNow` into an in-memory sink and return the final
    * result as a batch DataFrame. This is the backfill entry point: the
    * same streaming operator graph that runs 24/7 against a live source
    * replays a historical directory to a terminal state, so batch and
    * streaming answers can be compared bit-for-bit (the harness
    * hash-checks the streaming aggregates against the batch SQL oracle
    * through this). The memory sink holds only the AGGREGATED state
    * (windows·bins rows), never the input. */
  /** `statePartitions` > 0 pins `spark.sql.shuffle.partitions` for the
    * duration of the run (restored after). Stateful operators open one
    * state store per shuffle partition, so their fixed cost scales with
    * the SESSION's parallelism unless the state partition count is sized
    * to the keyspace explicitly — at 32 session partitions a bounded
    * stream-stream join pays 4× the store overhead it needs (measured
    * 8.0 s → 3.9 s on the interval join). At real scale the same
    * parameter sizes state to keys/throughput, decoupled from corpus
    * parallelism; it is baked into the checkpoint, so pick it per query,
    * not per session. */
  /** One SCD2 version row emitted by [[streamingScd2]]: validTo None
    * while the version is still open. */
  final case class Scd2Version(key: Long, attr: String, validFrom: Long,
                               validTo: Option[Long], version: Long)

  /** The open version per key plus the last-processed (ts, id) pair
    * for the out-of-order guard. */
  final case class Scd2State(key: Long, attr: String, validFrom: Long,
                             version: Long, lastTs: Long, lastId: Long)

  /** Streaming type-2 dimension maintenance on `transformWithState` —
    * the streaming twin of [[graft.operators.Cdc.scd2Build]] (the
    * batch/stream pairing discipline funnel, CUSUM and grouped-fit
    * already follow): RocksDB ValueState carries ONLY the open version
    * per key (attr, validFrom, version) — bounded state, the 100 TB
    * shape. Each arriving attribute change CLOSES the open version
    * (emitting the finished [validFrom, ts) interval) and opens the
    * next; every batch also re-emits the still-open version, so the
    * union of emissions, deduplicated per (key, version) with
    * "closed wins" (max over validTo ignores the open row's null),
    * reconstructs the batch SCD2 exactly — the harness hash-checks
    * that equivalence against [[graft.operators.Cdc.scd2Build]]'s
    * oracle on the same prefix.
    *
    * Rows sort by (tsNanos, tieId) within each batch (the
    * [[PrequentialAnomalyProcessor]] determinism contract); a row
    * arriving BEHIND the open version's last processed (ts, id) —
    * cross-batch late data — fails loudly rather than silently
    * rewriting closed history (SCD2 is an append-only contract; feed
    * late sources through the batch builder instead).
    */
  class Scd2Processor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Long, String), Scd2Version] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimerValues, OutputMode, TimeMode}
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[Scd2State] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Scd2State]("scd2",
        org.apache.spark.sql.Encoders.product[Scd2State], TTLConfig.NONE)
    override def handleInputRows(key: Long,
                                 rows: Iterator[(Long, Long, Long, String)],
                                 timerValues: TimerValues): Iterator[Scd2Version] = {
      val sorted = rows.toArray.sortBy(r => (r._2, r._3))
      val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Version]
      var s = Option(state.get())
      sorted.foreach { case (_, ts, id, attr) =>
        s match {
          case None =>
            s = Some(Scd2State(key, attr, ts, 1L, ts, id))
          case Some(st) =>
            require(ts > st.lastTs || (ts == st.lastTs && id > st.lastId),
              s"out-of-order row for key $key: (" + ts + ", " + id +
                ") arrived after (" + st.lastTs + ", " + st.lastId +
                ") — SCD2 state is append-only; route late data " +
                "through the batch builder")
            if (attr != st.attr) {
              out += Scd2Version(key, st.attr, st.validFrom, Some(ts),
                st.version)
              s = Some(Scd2State(key, attr, ts, st.version + 1L, ts, id))
            } else {
              s = Some(st.copy(lastTs = ts, lastId = id))
            }
        }
      }
      s.foreach { st =>
        state.update(st)
        out += Scd2Version(key, st.attr, st.validFrom, None, st.version)
      }
      out.iterator
    }
  }

  /** [[Scd2Processor]] wired for an exact availableNow replay
    * (TimeMode.None, update mode): ds = (key, tsNanos, tieId, attr). */
  def streamingScd2(ds: Dataset[(Long, Long, Long, String)]):
      Dataset[Scd2Version] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new Scd2Processor(),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  def runToBatch(spark: org.apache.spark.sql.SparkSession, streamDf: DataFrame,
                 name: String, outputMode: String = "complete",
                 statePartitions: Int = 0): DataFrame = {
    spark.catalog.dropTempView(name)
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    if (statePartitions > 0) spark.conf.set(key, statePartitions)
    try {
      val q = streamDf.writeStream
        .format("memory").queryName(name).outputMode(outputMode)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally if (statePartitions > 0) spark.conf.set(key, prev)
    spark.table(name)
  }
}
