package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Mergeable cardinality sketches (Datasketches HLL, builtin since Spark
  * 3.5: `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`).
  *
  * The 100 TB story is NOT the estimate — it's mergeability: per-shard /
  * per-day sketches are tiny (~2^lgK bytes), re-aggregable without
  * touching raw data, and the union adds no error beyond the sketch's
  * own precision (HLL registers are max-based; in dense mode the union
  * IS the single-pass sketch; in the small-cardinality coupon regime
  * the merged and single-pass representations can differ by a promotion
  * boundary, so the contract is tolerance, not bit-equality). "Distinct
  * users per cohort, across 400 daily partitions" becomes a union of
  * 400 sketches instead of a 100 TB distinct shuffle.
  */
object Sketches {

  /** Per-group distinct-count estimates with the merge path exercised
    * end-to-end: each group's rows are split into `shards` sub-sketches
    * (stand-ins for per-partition/per-day sketches), union-merged, and
    * estimated; a single-pass whole-group sketch runs alongside.
    * Output per group:
    *   - `n_exact`: exact distinct (the audit baseline)
    *   - `merged_est` / `single_est`: the two estimates — both within
    *     the sketch's error bound of exact, asserted in OpsSpec
    */
  def hllDistinctByGroup(df: DataFrame, groupCol: String, valueCol: String,
                         shards: Int = 4, lgK: Int = 12): DataFrame = {
    require(shards >= 1 && lgK >= 4 && lgK <= 21, "bad shards/lgK")
    val sharded = df
      .withColumn("__shard", F.pmod(F.xxhash64(F.col(valueCol)), F.lit(shards)))
      .groupBy(F.col(groupCol), F.col("__shard"))
      .agg(F.expr(s"hll_sketch_agg($valueCol, $lgK)").as("__sketch"))
      .groupBy(groupCol)
      .agg(F.expr("hll_sketch_estimate(hll_union_agg(__sketch))").as("merged_est"))
    val single = df.groupBy(groupCol)
      .agg(
        F.countDistinct(F.col(valueCol)).as("n_exact"),
        F.expr(s"hll_sketch_estimate(hll_sketch_agg($valueCol, $lgK))").as("single_est"))
    single.join(sharded, Seq(groupCol))
  }
}
