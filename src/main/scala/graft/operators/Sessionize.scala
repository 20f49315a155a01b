package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Gap-based sessionization: consecutive events of the same key belong
  * to one session while the inter-event gap stays ≤ `gap`; a larger gap
  * starts a new session. The batch analog of a streaming session window
  * (and exactly what `session_window` computes in Structured Streaming).
  *
  * Plan shape: ONE hash shuffle on the key + one sort feeds both window
  * functions (the new-session flag via lag, then the running sum that
  * numbers sessions) — no self-join, no range explosion, the same cost
  * profile at any scale. Time ties: the running sum uses RANGE-with-peers
  * framing in both Spark and ANSI SQL, so tied rows land in the same
  * session deterministically regardless of their physical order.
  */
object Sessionize {

  /** Adds `session_idx` (1-based per key, in time order). `time` must be
    * a numeric (e.g. epoch nanos as long) or otherwise subtractable
    * column type. */
  def assign(df: DataFrame, key: String, time: String, gap: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(time)
    df.withColumn("__new_session",
        F.when(F.lag(F.col(time), 1).over(w).isNull ||
          F.col(time) - F.lag(F.col(time), 1).over(w) > gap, 1L).otherwise(0L))
      .withColumn("session_idx", F.sum("__new_session").over(w))
      .drop("__new_session")
  }

  /** Per-session summary: event count and exact span. */
  def summarize(df: DataFrame, key: String, time: String, gap: Long): DataFrame =
    assign(df, key, time, gap)
      .groupBy(key, "session_idx")
      .agg(F.count(F.lit(1)).as("n_events"),
        F.min(time).as("t_start"),
        (F.max(F.col(time)) - F.min(F.col(time))).as("span"))
}
