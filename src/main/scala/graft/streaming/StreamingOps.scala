package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, functions => F}

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
                        watermark: String = "2 minutes"): DataFrame =
    df.withWatermark(timeCol, watermark)
      .select(F.window(F.col(timeCol), window).as("window"),
        binOf(F.col(valueCol).cast("double"), binStart, binWidth, numBins).as("bin"))
      .groupBy("window", "bin")
      .agg(F.count(F.lit(1)).as("cnt"))

  /** Running global histogram (update mode): one row per bin, state size
    * = numBins forever. */
  def runningHistogram(df: DataFrame, valueCol: String,
                       binStart: Double, binWidth: Double, numBins: Int): DataFrame =
    df.select(binOf(F.col(valueCol).cast("double"), binStart, binWidth, numBins).as("bin"))
      .groupBy("bin")
      .agg(F.count(F.lit(1)).as("cnt"))

  /** Streaming exact dedup: drop rows whose text fingerprint was already
    * seen within the watermark horizon. State = one md5 per surviving
    * document inside the horizon. */
  def streamingDedup(df: DataFrame, textCol: String, timeCol: String,
                     watermark: String = "10 minutes"): DataFrame =
    df.withWatermark(timeCol, watermark)
      .withColumn("__md5", F.md5(F.col(textCol).cast("binary")))
      .dropDuplicatesWithinWatermark("__md5")
      .drop("__md5")

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
}
