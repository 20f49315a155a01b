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
    val r = right
      .select((Seq(key, time) ++ rightVals).map(F.col): _*)
      .withColumn("__side", F.lit(0))
    val l = left.withColumn("__side", F.lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(F.col(time).asc, F.col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightVals.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, F.last(F.col(c), ignoreNulls = true).over(w))
    }
      .where(F.col("__side") === 1)
      .drop("__side")
  }
}
