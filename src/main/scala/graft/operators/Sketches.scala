package graft.operators

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, UpdateSketch}
import org.apache.spark.sql.{Column, DataFrame, functions => F}

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

  // ---- KLL quantile sketches: mergeable rank/quantile summaries ----

  /** Tree depth for executor-side sketch merging: base-16 fan-in keeps
    * the reduction O(log p) deep while each task unions a handful of
    * kilobyte blobs. The driver receives ONE sketch, not one per
    * partition — at 100 TB with ~10⁵ partitions a flat collect would
    * ship GBs of sketch bytes into a single-threaded merge loop. */
  private def treeDepth(numPartitions: Int): Int =
    math.max(2, math.ceil(
      math.log(math.max(numPartitions, 2).toDouble) / math.log(16.0)).toInt)

  /** One KLL doubles sketch over a column: per-partition sketches (each
    * O(k·log(n/k)) memory regardless of data size — Karnin/Lang/Liberty
    * 2016) union-merged in an executor-side `treeReduce` — the driver
    * sees one sketch, so its traffic is O(1) in partition count. The
    * 100 TB story mirrors the HLL note: per-day/per-shard quantile
    * summaries re-aggregate by merge without touching raw data, with the
    * rank-error guarantee surviving the merge — a global
    * `approx_percentile` would rescan everything. NaN is excluded up
    * front: `KllDoublesSketch.update` ignores NaN, so admitting it
    * anywhere (here or in a rank denominator) would desynchronize the
    * sketch population from the exact-rank population. */
  def kllSketch(df: DataFrame, valueCol: String, k: Int = 800)
      : org.apache.datasketches.kll.KllDoublesSketch = {
    import org.apache.datasketches.kll.KllDoublesSketch
    val v = F.col(valueCol).cast("double")
    val rdd = df.select(v.as("v"))
      .where(v.isNotNull && !F.isnan(v))
      .rdd.mapPartitions { it =>
        val sk = KllDoublesSketch.newHeapInstance(k)
        it.foreach(r => sk.update(r.getDouble(0)))
        Iterator.single(sk.toByteArray)
      }
    if (rdd.getNumPartitions == 0) return KllDoublesSketch.newHeapInstance(k)
    val bytes = rdd.treeReduce((a, b) => {
      val sk = KllDoublesSketch.heapify(Memory.wrap(a))
      sk.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
      sk.toByteArray
    }, treeDepth(rdd.getNumPartitions))
    KllDoublesSketch.heapify(Memory.wrap(bytes))
  }

  /** One KLL sketch PER GROUP in a single aggregation —
    * `groupBy(keys).agg(kll_sketch(x))` through the
    * [[graft.functions.KllGroupSketch]] typed aggregate. Output: the
    * group columns plus (`kll`: compact sketch bytes, `n`: exact row
    * count). State per group is O(k·log(n/k)) wherever the partial
    * aggregate runs, and the exchange carries one ~3 KB blob per
    * (partition, group) — a group with 10⁹ values costs the same wire
    * bytes as one with 10³, which is what makes this the scale path for
    * per-group quantiles and the sketch K-S probe
    * ([[GroupedFit.gofByGroupSketch]]) when single groups outgrow a
    * partition-local sort. Artifacts union later via
    * `KllDoublesSketch.merge` (per-day → per-month roll-ups) without
    * re-reading data. */
  def kllByGroup(df: DataFrame, valueCol: String, groupCols: Seq[String],
                 k: Int = 800): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val v = F.col(valueCol).cast("double")
    val kllUdaf = F.udaf(new graft.functions.KllGroupSketch(k))
    df.where(v.isNotNull && !F.isnan(v))
      .groupBy(groupCols.map(F.col): _*)
      .agg(kllUdaf(v).as("kll"), F.count(F.lit(1)).as("n"))
  }

  /** Rank check at probe values: the EXACT rank (one codegen'd agg pass,
    * SQL-replayable — 0/1 sums are order-exact in doubles) next to a
    * boolean attesting the shard-merged sketch's rank landed within
    * `eps`. KLL's guarantee is ~1.65/√k normalized rank error at 99%
    * confidence (~0.006 at k=800), so eps=0.01 pins the contract with
    * margin; a sketch/merge regression flips the boolean and reddens the
    * oracle hash. */
  def kllRankCheck(df: DataFrame, valueCol: String, probes: Seq[Double],
                   k: Int = 800, eps: Double = 0.01): DataFrame = {
    require(probes.nonEmpty, "need at least one probe")
    val sk = kllSketch(df, valueCol, k)
    val v = F.col(valueCol).cast("double")
    val aggs = probes.zipWithIndex.map { case (p, i) =>
      F.avg(F.when(v <= p, 1.0).otherwise(0.0)).as(s"__r$i")
    }
    // !isnan mirrors kllSketch's filter: the sketch ignores NaN updates,
    // so a NaN row in this denominator (where `NaN <= p` is false — a
    // phantom "above every probe" value) would skew exact vs sketch rank
    val r = df.where(v.isNotNull && !F.isnan(v)).agg(aggs.head, aggs.tail: _*).head()
    val spark = df.sparkSession
    import spark.implicits._
    // no non-null rows: empty result with the full schema (ranks over an
    // empty population are undefined, not an NPE)
    if (r.isNullAt(0))
      return Seq.empty[(Double, Double, Boolean)]
        .toDF("probe", "exact_rank", "within_eps")
    probes.zipWithIndex.map { case (p, i) =>
      val exact = r.getDouble(i)
      val est = sk.getRank(p)
      (p, math.rint(exact * 1e6) / 1e6, math.abs(est - exact) <= eps)
    }.toDF("probe", "exact_rank", "within_eps")
  }

  // ---- Theta sketches: distinct counts WITH set operations ----
  //
  // HLL unions; theta sketches also INTERSECT and DIFFERENCE
  // (Dasgupta et al., "Theta-Sketch Framework", 2016). That buys the
  // join-free contamination estimate: |train-grams ∩ bench-grams| from
  // two ~k-entry sketches instead of a corpus × benchmark shuffle.
  // Below ~k distinct values a theta sketch retains every hash
  // (theta = 1), so estimates — including intersections — are EXACT;
  // the harness queries run in that regime and hash-check against
  // DuckDB's literal set algebra, which proves the whole sketch path
  // (hashing, per-partition build, union merge, set ops). At 100 TB the
  // same code runs with the default lgK and the error bounds take over.

  /** One theta sketch over a column: per-partition `UpdateSketch`es
    * (each a bounded ~8·2^lgK-byte table built where the data lives),
    * compacted and union-merged executor-side in a `treeReduce` — the
    * driver receives ONE ~2^lgK-entry sketch regardless of partition
    * count; values never travel at all. */
  def thetaSketch(df: DataFrame, valueCol: String, lgK: Int = 12): CompactSketch = {
    val rdd = df.select(F.col(valueCol).cast("string"))
      .where(F.col(valueCol).isNotNull)
      .rdd.mapPartitions { it =>
        val sk = UpdateSketch.builder().setNominalEntries(1 << lgK).build()
        it.foreach(r => sk.update(r.getString(0)))
        Iterator.single(sk.compact().toByteArray)
      }
    if (rdd.getNumPartitions == 0)
      return UpdateSketch.builder().setNominalEntries(1 << lgK).build().compact()
    val bytes = rdd.treeReduce((a, b) => {
      val u = SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()
      u.union(Sketch.wrap(Memory.wrap(a)))
      u.union(Sketch.wrap(Memory.wrap(b)))
      u.getResult.toByteArray
    }, treeDepth(rdd.getNumPartitions))
    Sketch.wrap(Memory.wrap(bytes)).compact()
  }

  private def overlapRow(a: CompactSketch, b: CompactSketch, lgK: Int)
      : (Long, Long, Long, Long, Long, Double) = {
    val inter = SetOperation.builder().setNominalEntries(1 << lgK)
      .buildIntersection()
    inter.intersect(a)
    inter.intersect(b)
    val common = inter.getResult.getEstimate
    val aOnly = SetOperation.builder().buildANotB().aNotB(a, b).getEstimate
    val bOnly = SetOperation.builder().buildANotB().aNotB(b, a).getEstimate
    val uni = a.getEstimate + b.getEstimate - common
    val jac = if (uni <= 0) 0.0 else common / uni
    (math.round(a.getEstimate), math.round(b.getEstimate),
      math.round(common), math.round(aOnly), math.round(bOnly),
      math.rint(jac * 1e6) / 1e6)
  }

  private val overlapSchema = Seq("n_a", "n_b", "n_common", "n_a_only",
    "n_b_only", "jaccard")

  /** Join-free overlap estimate between two column value sets — the
    * train/benchmark contamination triage at corpus scale: each side is
    * sketched in one pass over its own data, and |A|, |B|, |A∩B|,
    * |A\B|, |B\A|, Jaccard all come from driver-side set ops on two
    * ~2^lgK-entry sketches. Exact below ~2^lgK distinct values per the
    * class note; use [[graft.operators.Decontam]] for the row-level
    * verdicts once this triage says the overlap is material. */
  def thetaOverlap(dfA: DataFrame, colA: String, dfB: DataFrame,
                   colB: String, lgK: Int = 12): DataFrame = {
    val t = overlapRow(thetaSketch(dfA, colA, lgK), thetaSketch(dfB, colB, lgK), lgK)
    val spark = dfA.sparkSession
    import spark.implicits._
    Seq(t).toDF(overlapSchema: _*)
  }

  /** Pairwise overlap matrix across the cohorts of one table (e.g.
    * sources of a corpus), fully distributed: Spark 4's native
    * `theta_sketch_agg` (a TypedImperativeAggregate — live sketches in
    * the hash map, serialized only at the shuffle boundary) builds one
    * sketch per cohort with map-side partials, then the C·(C−1)/2
    * pairwise set ops run as scalar `theta_intersection`/
    * `theta_difference` expressions over the C² self-joined sketch rows
    * — ~2^lgK·8 bytes each, so even 10⁴ cohorts stay a trivially small
    * join. Nothing ever funnels through the driver. Emits one row per
    * unordered cohort pair (a < b), zero-overlap pairs included. */
  def thetaCohortOverlap(df: DataFrame, cohortCol: String, valueCol: String,
                         lgK: Int = 12): DataFrame = {
    val sk = df
      .where(F.col(cohortCol).isNotNull && F.col(valueCol).isNotNull)
      .groupBy(F.col(cohortCol).cast("string").as("cohort"))
      .agg(F.expr(s"theta_sketch_agg(CAST($valueCol AS STRING), $lgK)")
        .as("__sk"))
    val a = sk.select(F.col("cohort").as("cohort_a"), F.col("__sk").as("__ska"))
    val b = sk.select(F.col("cohort").as("cohort_b"), F.col("__sk").as("__skb"))
    // round (not truncate) the estimate so the estimation regime agrees
    // with the driver path's math.round; identity in the exact regime
    def est(c: Column): Column =
      F.round(F.call_function("theta_sketch_estimate", c)).cast("long")
    val na = est(F.col("__ska"))
    val nb = est(F.col("__skb"))
    val common = est(
      F.call_function("theta_intersection", F.col("__ska"), F.col("__skb")))
    val aOnly = est(
      F.call_function("theta_difference", F.col("__ska"), F.col("__skb")))
    val bOnly = est(
      F.call_function("theta_difference", F.col("__skb"), F.col("__ska")))
    val uni = na + nb - common
    a.join(b, F.col("cohort_a") < F.col("cohort_b"))
      .select(F.col("cohort_a"), F.col("cohort_b"), na.as("n_a"), nb.as("n_b"),
        common.as("n_common"), aOnly.as("n_a_only"), bOnly.as("n_b_only"),
        F.when(uni > 0L,
            F.rint(common.cast("double") / uni * 1e6) / 1e6)
          .otherwise(0.0).as("jaccard"))
  }

  /** Deterministic row-r bucket for the count-min sketch: the first 32
    * bits of md5("r:" || key) mod `width` — the [[graft.operators
    * .Sampling.md5Bucket]] convention with a per-row salt, so every
    * engine (and every re-run) lands keys in identical cells. */
  private def cmsBucket(keyCol: Column, row: Int, width: Int): Column =
    F.conv(F.substring(
        F.md5(F.concat(F.lit(s"$row:"), keyCol.cast("string"))
          .cast("binary")), 1, 8), 16, 10)
      .cast("long") % width

  /** Count-min sketch build — the frequency complement to HLL's
    * cardinality: a depth×width grid of counters (d independent salted
    * hash rows) whose point estimate min_r cell(r, h_r(k)) never
    * UNDER-counts and over-counts by ≤ εN with probability 1−δ
    * (ε = e/width, δ = e^−depth — Cormode & Muthukrishnan 2005).
    *
    * The 100 TB story is the same as HLL's: the sketch is ONE bounded
    * aggregation (≤ depth·width cells regardless of input rows or key
    * cardinality), cells are additively mergeable across shards/days
    * (counts just add), and the estimate never touches raw data again.
    * Null keys are dropped.
    *
    * @return the sketch table: (row, bucket, cnt) — depth·width rows max */
  def countMinBuild(df: DataFrame, keyCol: String, depth: Int,
                    width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, "depth must be in 1..16")
    require(width >= 2 && width <= (1 << 24), "width must be in 2..2^24")
    val k = F.col(keyCol)
    val cells = F.explode(F.array((0 until depth).map(r =>
      F.struct(F.lit(r.toLong).as("row"),
        cmsBucket(k, r, width).as("bucket"))): _*))
    df.where(k.isNotNull)
      .select(cells.as("__c"))
      .groupBy(F.col("__c.row").as("row"), F.col("__c.bucket").as("bucket"))
      .agg(F.count(F.lit(1)).as("cnt"))
  }

  /** Point-frequency estimates from a [[countMinBuild]] sketch for the
    * keys in `probes`: est(k) = min over rows of the key's cell (0 when
    * a cell is empty — an empty cell is an exact zero count). The probe
    * frame is depth·|probes| rows joined against the ≤ depth·width cell
    * table — broadcast-sized both sides, never a data scan.
    *
    * @return one row per probe key: (key, est) with est ≥ true count */
  def countMinEstimate(sketch: DataFrame, probes: DataFrame,
                       keyCol: String, depth: Int,
                       width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, "depth must be in 1..16")
    val k = F.col(keyCol)
    val cells = F.explode(F.array((0 until depth).map(r =>
      F.struct(F.lit(r.toLong).as("row"),
        cmsBucket(k, r, width).as("bucket"))): _*))
    probes.where(k.isNotNull)
      .select(k.cast("string").as("key"), cells.as("__c"))
      .select(F.col("key"), F.col("__c.row").as("row"),
        F.col("__c.bucket").as("bucket"))
      .join(F.broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy("key")
      .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0L))).as("est"))
  }
}
