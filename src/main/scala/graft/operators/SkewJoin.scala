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
}
