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
    val p = points.withColumn("__b",
      F.floor(F.col(pointCol).cast("long") / bucketWidth))
    val iv = intervals
      .withColumn("__b", F.explode(F.sequence(
        F.floor(F.col(startCol).cast("long") / bucketWidth),
        F.floor(F.col(endCol).cast("long") / bucketWidth))))
    p.join(iv, Seq("__b"))
      .where(F.col(pointCol).cast("long").between(
        F.col(startCol).cast("long"), F.col(endCol).cast("long")))
      .drop("__b")
  }
}
