package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Survey-style reweighting for training-data curation: iterative
  * proportional fitting (raking) of a two-way cell table to target
  * marginals — "weight my corpus so the (language, source) mix matches
  * the mix I actually want to train on", the standard post-
  * stratification tool when the joint target is unknown but the
  * margins are policy.
  *
  * Scale shape: ONE (row, col) counting aggregation reduces the data
  * to a cell table bounded by the category cardinalities; the IPF
  * rounds then run as window sums over that tiny frame — the data is
  * touched exactly once regardless of the iteration count, and the
  * fixed-iteration trajectory replays engine-for-engine as chained
  * CTEs (the PageRank/k-means replay pattern).
  */
object Weighting {

  /** Iterative proportional fitting over the (rowCol, colCol) cells:
    * starting from w = 1, each round rescales w to match the row
    * target shares, then the column target shares:
    *
    *   w ← w · tr_r / Σ_c (p·w),   then   w ← w · tc_c / Σ_r (p·w)
    *
    * with p = n_cell / N over the target-covered cells. Fixed `iters`
    * rounds (IPF converges geometrically when every margin is
    * reachable; 8 rounds is plenty for reporting-grade weights).
    * Cells whose row or column value is absent from the targets are
    * EXCLUDED (and excluded from N) — the caller's targets define the
    * population. Weights are rounded to 6 only at the end, so the
    * whole trajectory is plain double arithmetic any engine replays.
    *
    * @param rowTargets (value, share) for rowCol; shares must be
    *        positive and sum to 1 (±1e-6). Same for colTargets.
    * @return one row per observed covered cell: (rowCol, colCol, n,
    *         weight) — multiply a row's example weight by `weight` to
    *         hit the target margins.
    */
  def ipfWeights(df: DataFrame, rowCol: String, colCol: String,
                 rowTargets: Seq[(String, Double)],
                 colTargets: Seq[(String, Double)],
                 iters: Int = 8): DataFrame = {
    require(iters >= 1, "need at least one IPF round")
    def check(t: Seq[(String, Double)], which: String): Unit = {
      require(t.nonEmpty, s"$which targets must be non-empty")
      require(t.forall(_._2 > 0.0), s"$which shares must be positive")
      require(t.map(_._1).distinct.length == t.length,
        s"$which target values must be distinct")
      require(math.abs(t.map(_._2).sum - 1.0) <= 1e-6,
        s"$which shares must sum to 1")
    }
    check(rowTargets, "row"); check(colTargets, "column")
    val spark = df.sparkSession
    import spark.implicits._
    val tr = rowTargets.toDF("__r", "tr")
    val tc = colTargets.toDF("__c", "tc")
    val cells = df
      .where(F.col(rowCol).isNotNull && F.col(colCol).isNotNull)
      .groupBy(F.col(rowCol).cast("string").as("__r"),
        F.col(colCol).cast("string").as("__c"))
      .agg(F.count(F.lit(1)).as("n"))
      .join(F.broadcast(tr), "__r")
      .join(F.broadcast(tc), "__c")
    val wr = Window.partitionBy("__r")
    val wc = Window.partitionBy("__c")
    val nTot = F.sum("n").over(Window.partitionBy())
    var cur = cells
      .withColumn("__p", F.col("n").cast("double") / nTot)
      .withColumn("__w", F.lit(1.0))
    var it = 0
    while (it < iters) {
      cur = cur.withColumn("__w",
        F.col("__w") * F.col("tr") /
          F.sum(F.col("__p") * F.col("__w")).over(wr))
      cur = cur.withColumn("__w",
        F.col("__w") * F.col("tc") /
          F.sum(F.col("__p") * F.col("__w")).over(wc))
      it += 1
    }
    cur.select(F.col("__r").as(rowCol), F.col("__c").as(colCol),
      F.col("n"), F.round(F.col("__w"), 6).as("weight"))
  }
}
