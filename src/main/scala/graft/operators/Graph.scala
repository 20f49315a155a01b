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

  /** HITS hubs & authorities (Kleinberg) with a fixed iteration count:
    * h₀ = 1, then per round a(v) = Σ_{u→v} h(u) normalized to unit
    * 2-norm, h(u) = Σ_{u→v} a(v) normalized likewise. On a bipartite
    * doc↔source graph this separates "pages that point at good content"
    * from "content good pages point at" — the complementary quality
    * prior to [[pageRank]]'s single score.
    *
    * Scale shape identical to [[pageRank]]: the checkpointed edge table
    * is the only corpus-sized artifact; each round is two node-sized
    * hash joins + two aggregations. The 2-norms are distributed
    * aggregations whose single scalar lands on the driver (O(1)
    * traffic) and re-enters the plan as a literal.
    *
    * @return (node, hub, authority) — nodes missing a role score 0 */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 8): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val e = edges.select(F.col(srcCol).cast("string").as("src"),
      F.col(dstCol).cast("string").as("dst")).localCheckpoint(true)
    val nodes = e.select(F.col("src").as("node"))
      .union(e.select(F.col("dst").as("node")))
      .distinct().localCheckpoint(true)
    var hubs = nodes.withColumn("hub", F.lit(1.0))
    var auths: DataFrame = null
    var it = 0
    while (it < iters) {
      val aRaw = e.join(hubs.withColumnRenamed("node", "src"), "src")
        .groupBy(F.col("dst").as("node"))
        .agg(F.sum(F.col("hub")).as("__a"))
      val aNorm = math.sqrt(aRaw
        .agg(F.sum(F.col("__a") * F.col("__a"))).head().getDouble(0))
      val a = nodes.join(aRaw, Seq("node"), "left")
        .select(F.col("node"),
          (F.coalesce(F.col("__a"), F.lit(0.0)) / aNorm).as("authority"))
        .localCheckpoint(true)
      val hRaw = e.join(a.withColumnRenamed("node", "dst"), "dst")
        .groupBy(F.col("src").as("node"))
        .agg(F.sum(F.col("authority")).as("__h"))
      val hNorm = math.sqrt(hRaw
        .agg(F.sum(F.col("__h") * F.col("__h"))).head().getDouble(0))
      val h = nodes.join(hRaw, Seq("node"), "left")
        .select(F.col("node"),
          (F.coalesce(F.col("__h"), F.lit(0.0)) / hNorm).as("hub"))
        .localCheckpoint(true)
      if (auths != null) auths.unpersist(false)
      hubs.unpersist(false)
      auths = a
      hubs = h
      it += 1
    }
    hubs.join(auths, "node")
  }
}
