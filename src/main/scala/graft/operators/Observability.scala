package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.execution.QueryExecution
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

  private object DroppedListener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        if (name.startsWith("graft.dropped/")) {
          val buckets = row.getAs[Long]("dropped_buckets")
          val members = row.getAs[Long]("dropped_members")
          if (buckets > 0L)
            log.warn(s"$name: skew guard dropped $buckets oversize " +
              s"bucket(s) totalling $members members — near-dups inside " +
              "them were NOT compared")
        }
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
