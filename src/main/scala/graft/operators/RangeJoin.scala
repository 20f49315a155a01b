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

  /** Per-row bucket explosion with the loud-guard contract: a reversed
    * interval (start > end — Spark's sequence() would silently DESCEND,
    * joining with inverted semantics) or an interval spanning more than
    * `maxBucketsPerRow` buckets (long interval × small caller-chosen
    * width — unbounded row multiplication) fails the job with a row-level
    * error instead of corrupting results or melting the shuffle. The
    * check is a codegen'd CASE inside the explode — zero extra passes. */
  private def guardedBuckets(df: DataFrame, s: String, e: String,
                             bucketWidth: Long, maxBucketsPerRow: Long,
                             bk: String): DataFrame = {
    val lo = F.floor(F.col(s).cast("double") / bucketWidth).cast("long")
    val hi = F.floor(F.col(e).cast("double") / bucketWidth).cast("long")
    val seq = F.when(F.col(s).cast("double") > F.col(e).cast("double"),
        F.raise_error(F.concat(
          F.lit(s"reversed interval ($s > $e): start="),
          F.col(s).cast("string"), F.lit(" end="), F.col(e).cast("string")))
          .cast("array<bigint>"))
      .when(hi - lo >= F.lit(maxBucketsPerRow),
        F.raise_error(F.concat(
          F.lit(s"interval [$s,$e] spans > $maxBucketsPerRow buckets at " +
            s"bucketWidth=$bucketWidth (start="),
          F.col(s).cast("string"), F.lit(" end="), F.col(e).cast("string"),
          F.lit("); widen bucketWidth or raise maxBucketsPerRow")))
          .cast("array<bigint>"))
      .otherwise(F.sequence(lo, hi))
    df.withColumn(bk, F.explode(seq))
  }

  /** @param points    DataFrame with a numeric point column (e.g. epoch
    *                  seconds); every input column is preserved
    * @param intervals DataFrame with numeric [startCol, endCol] bounds
    *                  (inclusive), span ≥ 0; every input column preserved
    * @param maxBucketsPerRow loud-failure cap on one interval's bucket
    *                  fan-out (reversed intervals also fail loudly)
    * @return inner join of points with the intervals containing them */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long,
                      maxBucketsPerRow: Long = 4096L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerRow > 0, "maxBucketsPerRow must be positive")
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
    val iv = guardedBuckets(intervals, startCol, endCol, bucketWidth,
      maxBucketsPerRow, b)
    p.join(iv, Seq(b))
      .where(p(pointCol).between(iv(startCol), iv(endCol)))
      .drop(b)
  }

  /** Interval-×-interval OVERLAP join without the cartesian — the
    * temporal-join sibling of [[pointInInterval]] (promotion windows ×
    * order windows, session spans × incident spans): both sides
    * explode to the fixed-width buckets they cover, the join runs as
    * a plain hash join on the bucket, and each overlapping pair emits
    * EXACTLY once — the row is kept only in the canonical bucket of
    * the overlap start, max(aStart, bStart) — so no distinct shuffle
    * is ever needed. Overlap test is the inclusive aS ≤ bE ∧ bS ≤ aE.
    *
    * Column names must not collide across the two inputs (rename
    * upstream); every input column is preserved, so the caller
    * computes overlap length as least(aE, bE) − greatest(aS, bS).
    *
    * @return inner join of the overlapping interval pairs */
  def intervalOverlap(a: DataFrame, aStart: String, aEnd: String,
                      b: DataFrame, bStart: String, bEnd: String,
                      bucketWidth: Long,
                      maxBucketsPerRow: Long = 4096L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerRow > 0, "maxBucketsPerRow must be positive")
    require(a.columns.toSet.intersect(b.columns.toSet).isEmpty,
      "column names collide across the two inputs; rename upstream")
    val bk = {
      var n = "__ov_bucket"
      val taken = (a.columns ++ b.columns).toSet
      while (taken.contains(n)) n = n + "_"
      n
    }
    val ae = guardedBuckets(a, aStart, aEnd, bucketWidth, maxBucketsPerRow, bk)
    val be = guardedBuckets(b, bStart, bEnd, bucketWidth, maxBucketsPerRow, bk)
    ae.join(be, Seq(bk))
      .where(ae(aStart) <= be(bEnd) && be(bStart) <= ae(aEnd) &&
        F.col(bk) === F.floor(
          F.greatest(ae(aStart), be(bStart)).cast("double") /
            bucketWidth).cast("long"))
      .drop(bk)
  }
}
