package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Skew-mitigated equi-join: salt the fact side, replicate the dimension
  * side.
  *
  * A shuffle join hashes rows by join key, so one hot key (the null-ish
  * customer, the default partition, the viral document) lands its entire
  * payload on ONE reducer — at 100 TB that single task runs for hours
  * while the rest of the cluster idles. Salting breaks the hot key into
  * `saltFactor` sub-keys: the big side sprays rows uniformly across
  * salts (cheap: one deterministic pmod per row), the small side is
  * replicated `saltFactor`× (explode of a literal range — tiny, it's the
  * dimension table), and the join runs on (key, salt). Result semantics
  * are EXACTLY a plain inner/left join — only the physical distribution
  * changes — which is what the equivalence oracle checks.
  *
  * AQE's skew-join handles sort-merge splits automatically when stats
  * expose the skew; explicit salting remains the portable fix when the
  * planner can't see it (e.g. skew appears after filters) or when the
  * join is bucketed. Complements `F.broadcast` (the right answer when
  * the dim side fits in memory — salting is for when it doesn't).
  */
object SkewJoin {

  /** Join `big` with `small` on `keys`, salted `saltFactor` ways.
    *
    * The big side's salt is a deterministic hash of the whole row's
    * monotonically-unique partition/offset — NOT of the join key (all
    * copies of the hot key must spread, so the salt must be independent
    * of it). `spark_partition_id` + per-partition row position would be
    * layout-dependent; a hash of all non-key columns risks collisions on
    * duplicate rows. `monotonically_increasing_id` is the standard
    * layout-local choice: values differ per row in a run, and the salt
    * only needs uniformity, not cross-run stability.
    *
    * @param joinType "inner" or "left_outer" (dim-replication keeps
    *                 exactly these semantics; right/full would need
    *                 anti-dedup on the replicated side) */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    require(Seq("inner", "left_outer", "left").contains(joinType),
      s"unsupported join type for salting: $joinType")
    val salted = big.withColumn("__salt",
      F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      F.explode(F.sequence(F.lit(0), F.lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Top-k heaviest join keys with their share of the table — the
    * diagnostic that decides between broadcast, salting, and a plain
    * shuffle join. One map-side-combined aggregation. */
  def keySkewProfile(df: DataFrame, keys: Seq[String], k: Int = 10): DataFrame = {
    val total = df.count()
    df.groupBy(keys.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("n_rows"))
      .withColumn("share", F.round(F.col("n_rows") / total.toDouble, 6))
      .orderBy((F.col("n_rows").desc +: keys.map(F.col(_).asc)): _*)
      .limit(k)
  }

  /** One-row skew report over a key's count distribution — the numbers
    * an operator (or an engineer) reads before picking a join strategy
    * at scale: key cardinality, hottest-key mass, count quantiles, the
    * max/mean skew ratio, and a suggested salt factor.
    *
    * Two aggregations total: per-key counts (one map-side-combined
    * shuffle, state = key cardinality), then a single summary row over
    * the counts. Quantiles are exact by default (a sort-based aggregate
    * over KEY-cardinality rows, not data rows); pass `exact = false`
    * at 10⁸⁺-key scale to swap in `approx_percentile` — same schema,
    * sketch-bounded memory.
    *
    * `salt_suggest` = ceil(max_cnt · partitions / n_rows), clamped to
    * ≥ 1: how many even-partition-loads the hottest key alone weighs.
    * 1 means "no salting needed"; k means "split the hot keys k ways
    * before they straggle the join" — integer arithmetic, replayable.
    */
  def skewReport(df: DataFrame, keys: Seq[String], partitions: Int,
                 exact: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(partitions >= 1, "partitions must be >= 1")
    val counts = df.groupBy(keys.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("cnt"))
    def pct(p: Double) =
      if (exact) F.percentile(F.col("cnt"), F.lit(p))
      else F.approx_percentile(F.col("cnt"), F.lit(p), F.lit(10000))
    counts.agg(
        F.count(F.lit(1)).as("n_keys"),
        F.sum("cnt").cast("long").as("n_rows"),
        F.max("cnt").as("max_cnt"),
        F.avg("cnt").as("__mean_raw"),
        pct(0.5).as("p50_cnt"), pct(0.9).as("p90_cnt"),
        pct(0.99).as("p99_cnt"))
      // ratio from the integer aggregates (exact, replayable), not the
      // display-rounded mean
      .withColumn("skew_ratio",
        F.round(F.col("max_cnt").cast("double") * F.col("n_keys") /
          F.col("n_rows"), 4))
      .withColumn("salt_suggest",
        F.greatest(F.lit(1L),
          F.ceil(F.col("max_cnt").cast("double") * partitions /
            F.col("n_rows"))))
      .withColumn("mean_cnt", F.round(F.col("__mean_raw"), 4))
      .select("n_keys", "n_rows", "max_cnt", "mean_cnt", "p50_cnt",
        "p90_cnt", "p99_cnt", "skew_ratio", "salt_suggest")
  }
}
