package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession, functions => F}
import org.apache.spark.sql.execution.{CollectMetricsExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.util.QueryExecutionListener

/** Zero-extra-pass observability for the engine's silent-cap guards.
  *
  * The LSH-style `maxBucket` skew guards (MinHash/SimHash bands,
  * embedding near-dup buckets) DROP degenerate buckets by contract — a
  * giant bucket is a degenerate band key whose quadratic expansion would
  * dominate the job. That contract is correct, but dropping silently
  * reads as "covered everything" when it didn't. This helper rides
  * `Dataset.observe` (a CollectMetrics node: the metric accumulates on
  * the rows already streaming through the aggregation — no second scan,
  * no action of its own) and a once-per-session
  * [[QueryExecutionListener]] that WARN-logs whenever a guarded query
  * actually dropped something. The metrics also surface in the Spark UI
  * / listener bus under the `graft.dropped/...` observation name.
  */
object Observability {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  // weak keys: a static strong set would pin every session (and its
  // listener-bus registration) for the process lifetime in
  // session-per-tenant / per-suite services
  private val installed = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())
  private val seq = new java.util.concurrent.atomic.AtomicLong()

  /** `qe.observedMetrics`, hardened against AQE empty-relation pruning.
    *
    * When a skew guard drops EVERY bucket, the downstream joins see an
    * empty completed stage and AQE's empty-relation propagation replaces
    * the whole subtree — CollectMetricsExec included — in the final
    * adaptive plan, so `observedMetrics` (which walks only
    * `executedPlan`) comes back EMPTY in exactly the total-drop case the
    * warn exists for. The pruned node's accumulator outlives the
    * replacement (the stage DID run — that is how AQE learned it was
    * empty), and the pre-replacement instance is still reachable through
    * `AdaptiveSparkPlanExec.inputPlan`, so metrics missing from the
    * final plan are recovered from there; final-plan values win on
    * collision. */
  private[graft] def observedMetricsOf(qe: QueryExecution): Map[String, Row] = {
    val direct = qe.observedMetrics
    val recovered = scala.collection.mutable.Map.empty[String, List[Row]]
    def scan(plan: SparkPlan): Unit = plan.foreach {
      case c: CollectMetricsExec =>
        recovered(c.name) = c.collectedMetrics :: recovered.getOrElse(c.name, Nil)
      case _ => ()
    }
    qe.executedPlan.foreach {
      case a: AdaptiveSparkPlanExec =>
        // AQE re-plans per stage round, so the instance that actually
        // accumulated lives inside a MATERIALIZED stage in the stage
        // cache — still there after empty-relation pruning dropped the
        // stage from the final plan; inputPlan generations are scanned
        // too (pre-AQE single-generation case)
        a.context.stageCache.values.foreach(st => scan(st.plan))
        scan(a.inputPlan)
      case _ => ()
    }
    // several plan generations can carry the same observation name with
    // fresh (all-default) accumulators; at most one actually executed —
    // prefer the row with any non-default value
    val best = recovered.map { case (n, rows) =>
      n -> rows.find(_.toSeq.exists(v => v != null && v != 0L && v != 0.0))
        .getOrElse(rows.head)
    }.toMap
    best ++ direct
  }

  /** The listener's decision function, factored out so tests can pin the
    * arithmetic: the warn message for one observed-metric row, or None
    * when the observation isn't a graft.dropped one or nothing was
    * dropped. */
  private[graft] def droppedWarning(name: String,
                                    row: org.apache.spark.sql.Row): Option[String] =
    if (!name.startsWith("graft.dropped/")) None
    else {
      val buckets = row.getAs[Long]("dropped_buckets")
      val members = row.getAs[Long]("dropped_members")
      if (buckets > 0L)
        Some(s"$name: skew guard dropped $buckets oversize " +
          s"bucket(s) totalling $members members — near-dups inside " +
          "them were NOT compared")
      else None
    }

  private object DroppedListener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      observedMetricsOf(qe).foreach { case (name, row) =>
        droppedWarning(name, row).foreach(log.warn(_))
      }
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = ()
  }

  /** Attach a dropped-oversize-bucket observation to the pre-guard
    * bucket frame. `size` is the bucket-size column the guard tests;
    * buckets with `size > maxBucket` are the ones the subsequent
    * `.where` will discard. Returns the same frame with the metric
    * attached; results are unchanged. */
  def observeDropped(buckets: DataFrame, op: String, size: Column,
                     maxBucket: Int): DataFrame = {
    val spark = buckets.sparkSession
    if (installed.putIfAbsent(spark, java.lang.Boolean.TRUE) == null)
      spark.listenerManager.register(DroppedListener)
    // unique per call: duplicate observation names in one query tree are
    // an analysis error, and one operator can be instantiated many times
    val name = s"graft.dropped/$op/${seq.incrementAndGet()}"
    buckets.observe(name,
      F.count(F.when(size > maxBucket, 1)).as("dropped_buckets"),
      F.coalesce(F.sum(F.when(size > maxBucket, size.cast("long"))), F.lit(0L))
        .as("dropped_members"))
  }
}
