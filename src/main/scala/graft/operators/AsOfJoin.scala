package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, attach the LATEST right row with
  * rightTime ≤ leftTime within the same key — the standard time-series
  * enrichment operator (trades←quotes, clicks←purchases) that Spark has
  * no native operator for.
  *
  * Spark-first plan: instead of a range join (which Catalyst executes as
  * a broadcast-nested-loop or an exploding theta join), both sides union
  * into ONE frame, shuffle ONCE on the key, sort by (time, side) within
  * partitions, and a running `last(value, ignoreNulls)` window carries
  * each right payload forward to the left rows that follow it. Cost is
  * one hash shuffle + one sort regardless of match density — the same
  * shape at 100 TB as at 100 MB. Ties (leftTime == rightTime) order the
  * right row first, so the join is inclusive, matching DuckDB/kdb
  * `ASOF JOIN ... ON l.t >= r.t` semantics.
  *
  * LEFT-join semantics: unmatched left rows keep null payloads. Right
  * rows should be unique per (key, time) — pre-aggregate otherwise, or
  * which duplicate wins is partition-order-dependent.
  */
object AsOfJoin {

  def asofLeft(left: DataFrame, right: DataFrame, key: String, time: String,
               rightVals: Seq[String]): DataFrame = {
    require(rightVals.nonEmpty, "need at least one right payload column")
    val clash = rightVals.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"right payload columns collide with left: $clash")
    // the payload rides as ONE struct so the window carries a whole right
    // ROW atomically — per-column last(ignoreNulls) would stitch fields
    // from different right rows (and resurrect a stale value where the
    // matched row's field is genuinely null)
    val r = right
      .select(F.col(key), F.col(time),
        F.struct(rightVals.map(F.col): _*).as("__payload"))
      .withColumn("__side", F.lit(0))
    val l = left.withColumn("__side", F.lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(F.col(time).asc, F.col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__carried", F.last(F.col("__payload"), ignoreNulls = true).over(w))
      .where(F.col("__side") === 1)
    val outCols = left.columns.map(F.col) ++
      rightVals.map(c => F.col(s"__carried.$c").as(c))
    carried.select(outCols.toIndexedSeq: _*)
  }
}
