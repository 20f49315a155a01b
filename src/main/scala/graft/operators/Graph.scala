package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Link-graph operators for corpus curation. Web-scale training-data
  * pipelines use graph signals (inlink authority, hub scores) as
  * document-quality priors; this is that layer in fixed-iteration,
  * deterministic form.
  */
object Graph {

  /** PageRank with a FIXED iteration count (deterministic, replayable):
    * r₀ = 1 for every node, then `iters` rounds of
    *
    *   r(v) ← (1−d) + d · Σ_{(u,v)∈E} r(u) / outdeg(u)
    *
    * — the original Brin–Page formulation (unnormalized base; dangling
    * nodes simply leak mass, which preserves per-node comparability and
    * keeps the recurrence join-shaped). Duplicate edges count as
    * parallel edges; dedupe upstream if that is not the intent.
    *
    * Scale shape: the edge table (joined once with out-degrees, then
    * localCheckpointed) is the only corpus-sized artifact; each round is
    * ONE hash join (ranks are node-sized) + ONE aggregation on dst —
    * the standard distributed PageRank step. Each round's rank frame is
    * eagerly checkpointed so the plan stays O(1) deep instead of
    * O(iters); fixed `iters` bounds total work at iters·(join+agg).
    *
    * @return (node, rank) for every node appearing as src or dst */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require(damping > 0.0 && damping < 1.0, "damping must be in (0, 1)")
    val e = edges.select(F.col(srcCol).cast("string").as("src"),
      F.col(dstCol).cast("string").as("dst"))
    val deg = e.groupBy("src").agg(F.count(F.lit(1)).as("__deg"))
    val ed = e.join(deg, "src").localCheckpoint(true)
    val nodes = e.select(F.col("src").as("node"))
      .union(e.select(F.col("dst").as("node")))
      .distinct().localCheckpoint(true)
    var ranks = nodes.withColumn("rank", F.lit(1.0))
    var it = 0
    while (it < iters) {
      val contrib = ed
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(F.col("dst").as("node"))
        .agg(F.sum(F.col("rank") / F.col("__deg")).as("__in"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(F.col("node"),
          (F.lit(1.0 - damping) + F.lit(damping) *
            F.coalesce(F.col("__in"), F.lit(0.0))).as("rank"))
        .localCheckpoint(true)
      ranks.unpersist(false)
      ranks = next
      it += 1
    }
    ranks
  }
}
