package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession

/** Physical-plan audits: the properties that make the harness queries
  * survive a 100× scale-up are asserted here, so a regression in plan
  * shape (lost pushdown, a global sort where a top-k take belongs, a
  * single-partition window) fails CI rather than showing up as a 100 TB
  * incident. Runs against the sf0.001 testdata.
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-plan-audit")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    // static conf: bucketed-table test writes its tables under /tmp
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def physicalPlan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q_quantile_map: no single-partition exchange in the rank merge") {
    val plan = physicalPlan("q_quantile_map")
    assert(!plan.contains("SinglePartition"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("q_bradley_terry and q_transitions avoid cartesians") {
    for (q <- Seq("q_bradley_terry", "q_transitions")) {
      val plan = physicalPlan(q)
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(400)}")
    }
  }

  test("q_decayed is one aggregation, no shuffle beyond the key exchange") {
    val plan = physicalPlan("q_decayed")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("Window"), plan.take(800))
  }

  test("q_basket_lift: top-k by lift is a TakeOrdered, pair join keyed on basket") {
    val plan = physicalPlan("q_basket_lift")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("q_rare_collapse: keep-list joins by broadcast, rows never shuffle for the rewrite") {
    val plan = physicalPlan("q_rare_collapse")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("q_negative_sample: index join is hash-keyed, no cartesian") {
    val plan = physicalPlan("q_negative_sample")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("q_lift and q_qini bucket without a global row sort") {
    for (q <- Seq("q_lift", "q_qini")) {
      val plan = physicalPlan(q)
      // the only Sort allowed is inside the <= k-row cumulative window
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(400)}")
      assert(!plan.contains("rangepartitioning(bucket"),
        s"$q: ${plan.take(400)}")
    }
  }

  test("q_topk plans as TakeOrderedAndProject, not a global sort") {
    val plan = physicalPlan("q_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    // a global Sort before the limit would shuffle the full table
    assert(!plan.contains("Sort ["), plan.take(800))
  }

  test("q_topk_per_group pushes the rank limit into the shuffle (WindowGroupLimit)") {
    val plan = physicalPlan("q_topk_per_group")
    // Spark 4's WindowGroupLimit drops rows beyond rank k on the map side,
    // so the exchange carries ≤ k·groups·partitions rows, not the table
    assert(plan.contains("WindowGroupLimit"), plan.take(1200))
  }

  test("q_filter_count pushes all four predicates into the parquet scan") {
    val plan = physicalPlan("q_filter_count")
    assert(plan.contains("PushedFilters:"), plan.take(800))
    for (c <- Seq("l_discount", "l_tax", "l_extendedprice"))
      assert(plan.replaceAll("\\s+", " ").matches(s".*PushedFilters:.*$c.*"),
        s"predicate on $c not pushed:\n${plan.take(1200)}")
  }

  test("q_stats prunes the scan to the single aggregated column") {
    val plan = physicalPlan("q_stats").replaceAll("\\s+", " ")
    val readSchema = "ReadSchema: [^ ]*".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.contains("l_extendedprice"), plan.take(800))
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_comment"),
      s"scan reads more columns than the aggregate needs: $readSchema")
  }

  test("q_doc_tokens is pure native expressions (no UDF in the scan path)") {
    // AQE prints the pre-execution plan without codegen spans; the
    // codegen-ability property is "native expressions only, no ScalaUDF"
    val plan = physicalPlan("q_doc_tokens")
    assert(plan.contains("regexp_extract_all"), plan.take(800))
    assert(!plan.contains("BatchEvalUDF") && !plan.contains("ScalaUDF"), plan.take(800))
  }

  test("q_grouped_fit: grouped fitting is aggregation-shaped, no driver loop") {
    val plan = physicalPlan("q_grouped_fit")
    // the whole per-group fit (4 families x G groups) must be hash
    // aggregation + window + join — no UDFs, no cartesian, and the
    // window/join reuse the aggregation's group partitioning rather
    // than adding their own exchanges
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalUDF"),
      plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2,
      s"grouped fit should need at most 2 group-key exchanges, got $exchanges:\n${plan.take(2000)}")
  }

  test("q_grouped_fit_weighted: one aggregation, no UDF, no extra exchange") {
    val plan = physicalPlan("q_grouped_fit_weighted")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalUDF"),
      plan.take(1200))
    assert(!plan.contains("CartesianProduct") && !plan.contains("SinglePartition"),
      plan.take(1200))
    // weighted sufficient statistics are ONE groupBy: a single group-key
    // hash exchange (the orderBy adds a range exchange, which is fine)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1,
      s"weighted grouped fit should need 1 group-key exchange, got $exchanges:\n${plan.take(2000)}")
  }

  test("q_grouped_fit_gof: distinct-value K-S/A-D stays partitioned per group") {
    val plan = physicalPlan("q_grouped_fit_gof")
    // the model CDF is the native DistScalar expression, not a ScalaUDF;
    // no cartesian pair blow-up; and the per-(group, family) window must
    // never collapse to a single partition (the round-1 global-window
    // failure shape this suite exists to catch)
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalUDF"),
      plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("SinglePartition"), plan.take(1500))
    assert(plan.contains("dist_cdf"), "DistScalar should drive the CDF: " +
      plan.take(1500))
  }

  test("q_drift_psi_by_group: cell aggregation before any per-group work") {
    val plan = physicalPlan("q_drift_psi_by_group")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalUDF"),
      plan.take(1200))
    assert(!plan.contains("CartesianProduct") && !plan.contains("SinglePartition"),
      plan.take(1200))
    // (group, bin) aggregate first, then group-partitioned window + final
    // aggregate over the ≤ groups·bins cell frame: at most 3 hash
    // exchanges, none carrying raw rows twice
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 3,
      s"per-group drift grew extra shuffles ($exchanges):\n${plan.take(2000)}")
  }

  test("q_corr_spearman has no single-partition exchange") {
    val plan = physicalPlan("q_corr_spearman")
    // the round-1 global Window.orderBy plan carried SinglePartition —
    // the scale-safe rank construction must not
    assert(!plan.contains("SinglePartition") ||
      plan.indexOf("SinglePartition") > plan.indexOf("HashAggregate"),
      plan.take(1500))
  }

  test("q_image_decode decodes without a shuffle before the final order") {
    // the decode UDF runs where the rows are born: the only exchanges
    // allowed are the final orderBy's range partitioning (and AQE reads)
    val plan = physicalPlan("q_image_decode")
    val decodeIdx = plan.indexOf("graft.operators.Multimodal")
    val body = if (decodeIdx >= 0) plan.substring(decodeIdx) else plan
    assert(!body.contains("hashpartitioning"),
      "decode stage should not hash-shuffle payloads: " + plan.take(1200))
  }

  test("q_frame_sample and q_audio_features decode without payload shuffles") {
    // the frame generator and audio decoder both run where the payload
    // rows are born; only the final orderBy may exchange
    for (q <- Seq("q_frame_sample", "q_audio_features")) {
      val plan = physicalPlan(q)
      val idx = plan.indexOf("graft.operators.Multimodal")
      val body = if (idx >= 0) plan.substring(idx) else plan
      assert(!body.contains("hashpartitioning"),
        s"$q should not hash-shuffle payloads: " + plan.take(1200))
    }
  }

  test("q_copula/q_gmm input cap pushes the key range into the parquet scan") {
    // a bare limit() takes whichever partitions answer first — the
    // keyCappedLineitem range predicate (shared by q_copula_sample /
    // q_gmm) must reach the scan as a pushed filter, not a post-scan
    // Filter over the full read, and must not plan any limit at all
    val plan = SparkEntry.keyCappedLineitem(spark, dir, 50000, Seq("l_extendedprice"))
      .queryExecution.executedPlan.toString.replaceAll("\\s+", " ")
    assert(plan.contains("PushedFilters:") &&
      "PushedFilters: \\[[^\\]]*LessThan\\(l_orderkey".r.findFirstIn(plan).isDefined,
      s"key range not pushed to scan: ${plan.take(1200)}")
    assert(!plan.contains("GlobalLimit") && !plan.contains("TakeOrderedAndProject"),
      s"cap should be a pure predicate: ${plan.take(1200)}")
  }

  test("q_join_revenue broadcasts the nation dim and prunes fact scans") {
    val plan = physicalPlan("q_join_revenue").replaceAll("\\s+", " ")
    assert(plan.contains("BroadcastHashJoin"),
      "nation dim should broadcast: " + plan.take(1200))
    // fact scan pruned to the join/agg columns only
    val liSchema = "ReadSchema: [^ ]*l_extendedprice[^ ]*".r.findFirstIn(plan).getOrElse("")
    assert(!liSchema.contains("l_comment") && !liSchema.contains("l_shipdate"),
      s"lineitem scan not pruned: $liSchema")
  }

  test("q_tfidf_top broadcasts the bounded slice tf table and rank-limits the window") {
    val plan = physicalPlan("q_tfidf_top")
    assert(plan.contains("BroadcastHashJoin"),
      "slice tf should broadcast-join against the distributed df table: " + plan.take(1200))
    assert(plan.contains("WindowGroupLimit"),
      "per-doc top-k should push the rank limit into the shuffle: " + plan.take(1200))
  }

  test("fit fan-out partition count tracks cores and family count") {
    val nParts = operators.Fitter.partitionCount(spark,
      graft.dists.DistRegistry.defaultNames, None)
    assert(nParts >= 2 && nParts <= 2 * spark.sparkContext.defaultParallelism)
  }

  test("decontamination joins the corpus grams by broadcast, never by shuffle") {
    import org.apache.spark.sql.functions.col
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val plan = operators.Decontam.contaminationReport(
        d, d.where(col("doc_id") % 50 === 0), "doc_id", "text", n = 8)
      .queryExecution.executedPlan.toString
    // the benchmark gram set broadcasts; the corpus-gram stream must hit
    // it map-side — a SortMergeJoin here would shuffle every corpus gram
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
    assert(!plan.contains("SortMergeJoin"), plan.take(1200))
  }

  test("chunking, repetition, split and quantize are shuffle-free projections") {
    import org.apache.spark.sql.functions.col
    val d = spark.read.parquet(s"$dir/documents.parquet")
    for ((name, df) <- Seq(
        "chunkDocuments" -> operators.TextOps.chunkDocuments(d, "doc_id", "text"),
        "repetitionFeatures" -> operators.TextOps.repetitionFeatures(d, "text"),
        "deterministicSplit" -> operators.Sampling.deterministicSplit(d, "doc_id"))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"$name should be a per-row projection, found a shuffle:\n${plan.take(800)}")
    }
    // quantize: the per-row map is exchange-free once scales are known
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = operators.Similarity.quantizeEmbeddings(e, "embedding",
      Array.fill(64)(1.0))
    assert(!q.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("z-order clustering plans one range exchange; z-value stays codegen'd") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val plan = operators.ZOrder
      .clusterByZ(li, Seq("l_extendedprice", "l_quantity"), bits = 8,
        numPartitions = 8)
      .queryExecution.executedPlan.toString
    // exactly one Exchange — the rangepartitioning on z_value; the
    // quantize+interleave must not introduce a hash shuffle or a UDF
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"want exactly 1 exchange, got $exchanges:\n${plan.take(900)}")
    assert(plan.contains("rangepartitioning"), plan.take(400))
    assert(!plan.toLowerCase.contains("batchevalpython") &&
      !plan.contains("ScalaUDF"), "z-value must be native expressions")
  }

  test("weightedHashSample is a shuffle-free map-side filter") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val plan = operators.Sampling
      .weightedHashSample(d, "n_chars", "doc_id", 0.2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"the weighted filter must not shuffle:\n${plan.take(800)}")
    assert(!plan.contains("ScalaUDF"), "threshold math must be codegen'd")
  }

  test("theta cohort matrix aggregates sketches distributed, pairs on sketch rows") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val plan = operators.Sketches
      .thetaCohortOverlap(d, "source", "doc_id", lgK = 12)
      .queryExecution.executedPlan.toString
    // the sketch agg must do a map-side partial (ObjectHashAggregate
    // partial_theta_sketch_agg) before the cohort exchange — the shape
    // that keeps the union off the driver
    assert(plan.contains("ObjectHashAggregate"), plan.take(800))
    assert(plan.contains("partial_theta_sketch_agg") ||
      plan.contains("theta_sketch_agg"), plan.take(800))
  }

  test("k-NN join pushes the per-query top-k below the shuffle (WindowGroupLimit)") {
    val plan = physicalPlan("q_knn_join_fixed")
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k must rewrite to WindowGroupLimit:\n${plan.take(900)}")
  }

  test("q_gmm_score is pure codegen'd arithmetic: no UDF, no pre-agg shuffle") {
    val plan = physicalPlan("q_gmm_score").replaceAll("\\s+", " ")
    // the scoring columns (logsumexp + argmax CASE ladder) must live in
    // the scan-side projection inside whole-stage codegen
    assert(!plan.contains("BatchEvalPython") && !plan.contains("UDF"), plan.take(800))
    // the whole score (logsumexp + CASE argmax) must sit in a Project
    // directly over the scan, with the null filter pushed to parquet
    // (AQE's pre-final plan string omits WholeStageCodegen spans, so
    // assert the shape, not the codegen label)
    assert(plan.contains("Project [") && plan.contains("greatest("), plan.take(800))
    assert(plan.contains("PushedFilters: [IsNotNull(l_extendedprice)]"), plan.take(800))
    // exactly one exchange: the final groupBy(component) — scoring itself
    // must not shuffle
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"scoring path shuffles more than the aggregate needs:\n${plan.take(1500)}")
  }

  test("hash bootstrap broadcasts the indexed sample into the draw-grid join") {
    val plan = physicalPlan("q_bootstrap_hash").replaceAll("\\s+", " ")
    // the b×n draw grid joins the rank-indexed sample by BROADCAST — a
    // shuffle join here would exchange the grid at every scale
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("fuzzy decontamination joins benchmark grams and prefixes by broadcast") {
    val plan = physicalPlan("q_decontam_fuzzy").replaceAll("\\s+", " ")
    // three broadcast joins (gram filter, stop-gram keep-list, benchmark
    // prefixes); the corpus side must never be the exchanged side
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 3, plan.take(2000))
  }

  test("range join plans as a hash join on buckets, never a nested loop") {
    import org.apache.spark.sql.functions.col
    val iv = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"),
        col("o_orderdate").cast("timestamp").cast("long").as("ws"),
        (col("o_orderdate").cast("timestamp").cast("long") + 86400L).as("we"))
    val pts = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_shipdate").cast("timestamp").cast("long").as("p"))
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = operators.RangeJoin
        .pointInInterval(pts, "p", iv, "ws", "we", 86400L)
        .queryExecution.executedPlan.toString
      // a naive BETWEEN theta join would be BroadcastNestedLoopJoin —
      // points x intervals comparisons; the bucketed form is an equi-join
      assert(!plan.contains("NestedLoop"), plan.take(1000))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan.take(1000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }


  test("salted join partitions the exchange on (key, salt), dim replicates") {
    import org.apache.spark.sql.functions.col
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    // a dim small enough to broadcast still joins on (key, salt)...
    val bPlan = operators.SkewJoin.saltedJoin(li, ord, Seq("l_orderkey"), 8)
      .queryExecution.executedPlan.toString.replaceAll("\\s+", " ")
    assert("Join \\[[^\\]]*__salt[^\\]]*\\]".r.findFirstIn(bPlan).isDefined,
      s"salt missing from join keys: ${bPlan.take(800)}")
    // ...and with broadcast off (the 100 TB case — the dim that needs
    // salting doesn't fit in memory) every exchange carries the salt
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = operators.SkewJoin.saltedJoin(li, ord, Seq("l_orderkey"), 8)
        .queryExecution.executedPlan.toString.replaceAll("\\s+", " ")
      val parts = "hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toSeq
      assert(parts.nonEmpty, plan.take(800))
      assert(parts.forall(_.contains("__salt")),
        s"un-salted exchange found: ${parts.mkString("; ")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("q_model_filter folds the cdf predicate into pushed parquet range filters") {
    val plan = physicalPlan("q_model_filter").replaceAll("\\s+", " ")
    // the rewritten predicate must reach the scan as min/max-prunable
    // range filters on the raw column...
    assert(plan.contains("PushedFilters:") &&
      "PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(l_extendedprice".r
        .findFirstIn(plan).isDefined &&
      "PushedFilters: \\[[^\\]]*LessThanOrEqual\\(l_extendedprice".r
        .findFirstIn(plan).isDefined,
      plan.take(1200))
    // ...and the per-row cdf evaluation must be gone entirely
    assert(!plan.contains("dist_cdf"), plan.take(1200))
  }

  test("bucketed co-located join runs with zero Exchange on either side") {
    import org.apache.spark.sql.functions.col
    operators.Bucketed.writeBucketed(
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice"),
      "plan_bkt_li", 4, Seq("l_orderkey"))
    operators.Bucketed.writeBucketed(
      spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
      "plan_bkt_ord", 4, Seq("l_orderkey"))
    // broadcast off = the 100 TB regime where neither fact side fits in
    // memory; matching bucket layouts must satisfy the sort-merge join's
    // distribution requirement with NO shuffle
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = operators.Bucketed.coLocatedJoin(
        spark, "plan_bkt_li", "plan_bkt_ord", Seq("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      assert(!plan.contains("Exchange"),
        s"bucketed join should be exchange-free:\n${plan.take(1200)}")
      // sanity: the join result matches the plain shuffle join
      val expected = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("q_rolling_features: all horizons share ONE key exchange") {
    // both RANGE frames partition on user_id — a second shuffle for the
    // second horizon would double the job's cost for nothing
    val plan = physicalPlan("q_rolling_features")
    val partExchanges = "hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(partExchanges <= 1,
      s"both horizons must ride one user_id exchange:\n${plan.take(1500)}")
  }

  test("q_auc_by_group: the AUC prefix sum is partitioned by group") {
    val plan = physicalPlan("q_auc_by_group")
    // the window must NOT collapse to a single partition
    assert(!plan.contains("SinglePartition") ||
      plan.indexOf("SinglePartition") > plan.indexOf("HashAggregate"),
      plan.take(1500))
  }

  test("q_ks_by_group: the ECDF windows stay partitioned by group") {
    val plan = physicalPlan("q_ks_by_group")
    assert(!plan.contains("SinglePartition") ||
      plan.indexOf("SinglePartition") > plan.indexOf("HashAggregate"),
      plan.take(1500))
  }

  test("q_chi2_terms: class sizes broadcast, no cartesian anywhere") {
    val plan = physicalPlan("q_chi2_terms")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("q_split_gains and q_ks_separation windows stay feature/group-partitioned") {
    for (q <- Seq("q_split_gains", "q_ks_separation")) {
      val plan = physicalPlan(q)
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(400)}")
      // every Window should be partitioned (no global single-partition
      // window over data rows)
      assert(!plan.contains("Window [")
        || !plan.contains("SinglePartition"), s"$q: ${plan.take(1200)}")
    }
  }

  test("q_mahalanobis: group moments broadcast back, d2 is map-side") {
    val plan = physicalPlan("q_mahalanobis")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
  }

  test("q_fellegi_sunter pair generation never degenerates to a cartesian") {
    val plan = physicalPlan("q_fellegi_sunter")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("q_trigram_logprob shrinks corpus tables semi-joined, then broadcasts") {
    val plan = physicalPlan("q_trigram_logprob")
    // the corpus n-gram tables must reach the slice as LeftSemi +
    // broadcast builds — nothing corpus-sized shuffles into the probe
    assert(plan.contains("LeftSemi"), plan.take(800))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("q_sketch_cms estimate side broadcasts the bounded cell table") {
    val plan = physicalPlan("q_sketch_cms")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("new stat panels avoid cartesians and single-partition windows") {
    for (q <- Seq("q_fixed_effects", "q_cluster_se", "q_mediation",
        "q_inequality", "q_zip_moments")) {
      val plan = physicalPlan(q)
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(400)}")
      // the only tolerated SinglePartition is the final 1-row fold
      assert(!plan.contains("Window [") ||
        !plan.contains("SinglePartition, Window"),
        s"$q window on SinglePartition: ${plan.take(400)}")
    }
  }

  test("q_silhouette joins rows against broadcast centroids, never pairwise") {
    val plan = physicalPlan("q_silhouette")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
  }

  test("per-key series tests keep windows partitioned by key") {
    for (q <- Seq("q_pettitt", "q_kpss", "q_runs_test", "q_hurst",
        "q_periodogram", "q_pacf")) {
      val plan = physicalPlan(q)
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(400)}")
      // every window partitions by the key — no global-sort window
      assert(!plan.contains("Window [") ||
        plan.contains("hashpartitioning"),
        s"$q: ${plan.take(400)}")
    }
  }

  test("round-9 rank/robust panels keep windows key-partitioned") {
    for (q <- Seq("q_xicor", "q_scd2", "q_newey_west", "q_page_trend",
        "q_kendall_w")) {
      val plan = physicalPlan(q)
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(400)}")
      assert(!plan.contains("Window [") ||
        plan.contains("hashpartitioning"),
        s"$q: ${plan.take(400)}")
    }
  }

  test("q_cooks: influence top-k is a TakeOrdered, never a global sort") {
    val plan = physicalPlan("q_cooks")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("link-prediction wedge shape: hash-keyed join, TakeOrdered top-k") {
    // q_adamic_adar's result frame is checkpoint-materialized (20
    // rows), so audit the operator's inner shape on the same edges
    import org.apache.spark.sql.{functions => F}
    val lp = spark.read.parquet(s"$dir/lineitem.parquet")
      .where(F.col("l_orderkey") < 3000)
      .select(F.col("l_orderkey").as("k"), F.col("l_partkey").as("p"))
      .distinct()
    val e = lp.as("x").join(lp.as("y"), "k")
      .where(F.col("x.p") =!= F.col("y.p"))
      .select(F.col("x.p").cast("string").as("s"),
        F.col("y.p").cast("string").as("d"))
    val und = e.union(e.select(F.col("d").as("s"), F.col("s").as("d")))
      .where(F.col("s") =!= F.col("d")).distinct()
    val wedge = und.as("u").join(und.as("v"), "s")
      .where(F.col("u.d") < F.col("v.d"))
      .groupBy(F.col("u.d").as("a"), F.col("v.d").as("b"))
      .agg(F.count(F.lit(1)).as("common"))
      .orderBy(F.col("common").desc, F.col("a")).limit(20)
    val plan = wedge.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
  }

  test("q_psm: treated rows never join controls row-by-row") {
    // the matching is a broadcast binary-search lookup, so the plan has
    // no join of the treated frame against a row-scale control frame
    val plan = physicalPlan("q_psm")
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("forecast recursions stay windowless per-key folds") {
    // croston/theta collapse each key's series via sorted collect_list
    // + a per-key UDF — no window, no cartesian, key-hash exchange only
    for (q <- Seq("q_croston", "q_theta_forecast")) {
      val plan = physicalPlan(q)
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(400)}")
      assert(!plan.contains("Window ["), s"$q: ${plan.take(400)}")
    }
  }

  test("q_distance_corr: cell pairs ride a broadcast join, never SMJ") {
    val plan = physicalPlan("q_distance_corr")
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
  }

  test("q_reconcile: per-side bucket aggregation, no row-scale join") {
    val plan = physicalPlan("q_reconcile")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    // the only join is the 64-bucket full-outer — row frames aggregate
    // before any join
    assert(plan.contains("FullOuter") || plan.contains("full_outer"),
      plan.take(1200))
  }

  test("round-10 retrieval/selection queries: no cartesians, ranked " +
    "takes stay TakeOrdered") {
    for (q <- Seq("q_bm25", "q_moore_lewis")) {
      val plan = physicalPlan(q)
      assert(!plan.contains("CartesianProduct"), q + ": " + plan.take(400))
      // the top-k is a TakeOrderedAndProject, never a global sort+limit
      assert(plan.contains("TakeOrderedAndProject"), q + ": " + plan.take(800))
    }
    val hw = physicalPlan("q_holt_winters")
    assert(!hw.contains("CartesianProduct"), hw.take(400))
    // the per-key fold stays windowless (collect_list + UDF, no
    // Window operator anywhere in the plan)
    assert(!hw.contains("Window"), hw.take(800))
  }

  test("round-10 time-series/causal/join additions: keyed windows, " +
    "no cartesians, no single-partition exchanges") {
    for (q <- Seq("q_arma", "q_cointegration", "q_event_study",
        "q_interval_overlap", "q_control_chart", "q_demand_class")) {
      val plan = physicalPlan(q)
      assert(!plan.contains("CartesianProduct"), q + ": " + plan.take(400))
      assert(!plan.contains("BroadcastNestedLoop"),
        q + ": " + plan.take(400))
      assert(!plan.contains("SinglePartition"), q + ": " + plan.take(400))
    }
  }

  test("round-11 regression/time-series/attribution additions: no " +
    "cartesians, keyed folds, no single-partition exchanges") {
    // softmax/quantile are pure aggregations (no join at all); the
    // per-key series ops are collect_list folds or keyed windows; the
    // champion ranks inside a key-partitioned window; markov shrinks
    // to the transition frame before anything non-keyed happens
    for (q <- Seq("q_softmax", "q_quantile_fit", "q_garch", "q_arima",
        "q_gesd", "q_page_hinkley", "q_burst", "q_forecast_champion",
        "q_markov_attrib", "q_quantile_by_group", "q_gesd_seasonal",
        "q_binary_segment", "q_decontam_embed", "q_oov_rate", "q_c2st",
        "q_token_budget", "q_garch_forecast", "q_cuped_ab", "q_sprt",
        "q_weight_diag")) {
      val plan = physicalPlan(q)
      assert(!plan.contains("CartesianProduct"), q + ": " + plan.take(400))
      assert(!plan.contains("BroadcastNestedLoop"),
        q + ": " + plan.take(400))
    }
    // the per-key grid profile and the burst DP stay windowless
    // (collect_list + UDF — no Window operator, no global sort)
    for (q <- Seq("q_garch", "q_gesd", "q_page_hinkley", "q_burst")) {
      val plan = physicalPlan(q)
      assert(!plan.contains("Window ["), q + ": " + plan.take(800))
      assert(!plan.contains("SinglePartition"), q + ": " + plan.take(400))
    }
  }

  test("round-12 additions: sarima/aipw/cox-efron/unigram-lm plans " +
    "stay cartesian-free with keyed shuffles only") {
    // sarima: keyed lag windows + per-key sums (the arima shape with
    // a lag-7 difference); aipw: pure aggregations (logistic passes +
    // two arm Grams + one augmentation agg); cox_efron: one groupBy(t)
    // per pass + the RDD fold (plan shows the cells aggregation);
    // unigram: vocab-sized aggregations + an explode over the word
    // table — none may cartesian or funnel through one partition
    for (q <- Seq("q_sarima", "q_aipw", "q_cox_efron",
        "q_unigram_tokenizer", "q_brunner_munzel", "q_cucconi",
        "q_lepage", "q_hosmer_lemeshow", "q_hotelling",
        "q_cluster_validity", "q_diebold_mariano", "q_interval_score",
        "q_split_half", "q_t_closeness", "q_eigencentrality",
        "q_spiegelhalter", "q_bloom_plan", "q_langid_confusion",
        "q_tokenizer_fertility", "q_turning_points", "q_bartels",
        "q_cox_stuart", "q_conover", "q_dagostino", "q_rogan_gladen",
        "q_youden", "q_var_es", "q_adwin", "q_impute_regression",
        "q_factorability", "q_press", "q_cochrane_orcutt")) {
      val plan = physicalPlan(q)
      assert(!plan.contains("CartesianProduct"), q + ": " + plan.take(400))
      assert(!plan.contains("BroadcastNestedLoop"),
        q + ": " + plan.take(400))
    }
    // the agreement/crosstab ops join ONE-ROW aggregates (and gk's
    // guarded bounded cell join) — a BroadcastNestedLoop over one-row
    // frames is the cohenKappa house shape, so only forbid the
    // unbounded cartesian
    for (q <- Seq("q_fleiss_kappa", "q_krippendorff", "q_gk_assoc",
        "q_stuart_maxwell", "q_archimedean", "q_lof", "q_mmd")) {
      val plan = physicalPlan(q)
      assert(!plan.contains("CartesianProduct"), q + ": " + plan.take(400))
    }
  }

  test("round-13 additions: shapiro/ad-ksample/frank/aft/lda/stl " +
    "plans stay cartesian-free") {
    // ad_ksample: per-distinct-value count lanes + the RDD prefix
    // fold; weibull_aft: pure chained aggregations; stl: per-key
    // windows and half-window-bounded keyed self-joins — none may
    // produce an unbounded cartesian
    for (q <- Seq("q_ad_ksample", "q_weibull_aft", "q_stl",
        "q_variance_ratio", "q_breusch_godfrey", "q_entropy_balance",
        "q_ccc", "q_deming", "q_bland_altman", "q_logrank_trend",
        "q_chow_by_key", "q_pesaran_timmermann", "q_mz_calibration",
        "q_rbo_rankers")) {
      val plan = physicalPlan(q)
      assert(!plan.contains("CartesianProduct"), q + ": " + plan.take(400))
      assert(!plan.contains("BroadcastNestedLoop"),
        q + ": " + plan.take(400))
    }
    // shapiro runs on a BOUNDED (<= 5000 row) slice where the
    // single-partition window is the contract; frank/lda join one-row
    // or k-row aggregates (the cohenKappa house shape); hl_shift is
    // the guarded bounded cell-product join — forbid only the
    // unbounded cartesian
    for (q <- Seq("q_shapiro", "q_archimedean_frank", "q_lda_multi",
        "q_hl_shift", "q_shift_function")) {
      val plan = physicalPlan(q)
      assert(!plan.contains("CartesianProduct"), q + ": " + plan.take(400))
    }
  }

  test("cardinality guards refuse row-scale cell frames LOUDLY") {
    import org.apache.spark.sql.functions.col
    // a continuous column: every row its own cell — the quadratic
    // cell join / single-reducer cell sort must be refused up front
    val big = spark.range(70000).select(
      (col("id").cast("double") + 0.25).as("x"),
      (col("id").cast("double") * 1.7 + 0.5).as("y"))
    val e1 = intercept[IllegalArgumentException] {
      operators.Ranks.kendallTauB(big, "x", "y")
    }
    assert(e1.getMessage.contains("joint cells"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      operators.Regression.segmentedOls(big, "y", "x")
    }
    assert(e2.getMessage.contains("distinct x cells"), e2.getMessage)
  }
}
