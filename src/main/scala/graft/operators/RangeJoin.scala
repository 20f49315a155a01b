package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Point-in-interval range join without the cartesian explosion.
  *
  * A naive `p BETWEEN start AND end` join has no equality key, so Spark
  * plans a broadcast-nested-loop (or worse) — points × intervals
  * comparisons. This operator bins time into fixed-width buckets:
  * each interval explodes to the buckets it covers, each point maps to
  * exactly one, the join runs as a plain HASH join on the bucket key,
  * and the exact containment predicate filters the residue. Shuffle
  * volume is points + intervals·(span/bucketWidth) rows instead of the
  * product — the same binning Spark's RANGE_JOIN hint applies inside
  * Databricks' optimizer, expressed as a first-class operator.
  *
  * Pick `bucketWidth` near the typical interval span: much smaller
  * multiplies the interval-side explosion, much larger multiplies the
  * post-join filter residue.
  */
object RangeJoin {

  /** @param points    DataFrame with a numeric point column (e.g. epoch
    *                  seconds); every input column is preserved
    * @param intervals DataFrame with numeric [startCol, endCol] bounds
    *                  (inclusive), span ≥ 0; every input column preserved
    * @return inner join of points with the intervals containing them */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // collision-proof bucket column; inputs may share column names, so
    // the containment filter resolves through the parent DataFrames
    // rather than bare names
    val b = {
      var n = "__rj_bucket"
      val taken = (points.columns ++ intervals.columns).toSet
      while (taken.contains(n)) n = n + "_"
      n
    }
    // bucket keys truncate; the exact containment filter compares the
    // RAW values — truncating there would false-match fractional points
    val p = points.withColumn(b,
      F.floor(F.col(pointCol).cast("double") / bucketWidth).cast("long"))
    val iv = intervals
      .withColumn(b, F.explode(F.sequence(
        F.floor(F.col(startCol).cast("double") / bucketWidth).cast("long"),
        F.floor(F.col(endCol).cast("double") / bucketWidth).cast("long"))))
    p.join(iv, Seq(b))
      .where(p(pointCol).between(iv(startCol), iv(endCol)))
      .drop(b)
  }
}
