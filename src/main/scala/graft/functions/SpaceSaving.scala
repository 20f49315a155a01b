package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SpaceSaving top-k sketch (Metwally, Agrawal & El Abbadi, "Efficient
  * Computation of Frequent and Top-k Elements in Data Streams",
  * ICDT 2005) as a typed Spark Aggregator — bounded-state heavy-hitter
  * detection for unbounded key domains, where an exact groupBy would
  * shuffle one row per distinct key.
  *
  * State is AT MOST k (key, count, error) counters per partial; the
  * exchange carries one k-counter summary per partition. Guarantees
  * (asserted in spec):
  *   - estimates only ever OVERCOUNT: true ≤ est ≤ true + error;
  *   - any key with true frequency > n/k is present in the summary;
  *   - with k ≥ the stream's distinct-key count no eviction ever
  *     happens, error stays 0, and the sketch is EXACT — the regime the
  *     harness oracle pins against a plain GROUP BY.
  *
  * Merge follows the mergeable-summaries construction (Agarwal et al.,
  * PODS 2012): a key absent from a FULL summary may have occurred up to
  * that summary's minimum counter value while untracked, so the absent
  * side contributes (minCounter, minCounter); counts and error bounds
  * add, then the union trims back to the k largest counters.
  */
class SpaceSaving(k: Int)
    extends Aggregator[String, Map[String, (Long, Long)], Seq[(String, Long, Long)]] {
  require(k >= 1, "k must be >= 1")

  def zero: Map[String, (Long, Long)] = Map.empty

  def reduce(b: Map[String, (Long, Long)], key: String): Map[String, (Long, Long)] =
    b.get(key) match {
      case Some((c, e)) => b.updated(key, (c + 1L, e))
      case None if b.size < k => b.updated(key, (1L, 0L))
      case None =>
        // evict the counter with the smallest upper bound; the newcomer
        // inherits min+1 with error = min (it may have occurred up to
        // min times while untracked)
        val (minKey, (minC, _)) = b.minBy { case (kk, (c, _)) => (c, kk) }
        (b - minKey).updated(key, (minC + 1L, minC))
    }

  def merge(a: Map[String, (Long, Long)], b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    // a key absent from a summary that never evicted (size < k) truly
    // has count 0 there; absent from a FULL summary it may have been
    // seen up to that summary's minimum counter times
    val boundA = if (a.size < k) 0L else a.valuesIterator.map(_._1).min
    val boundB = if (b.size < k) 0L else b.valuesIterator.map(_._1).min
    val union = (a.keySet ++ b.keySet).iterator.map { kk =>
      val (c1, e1) = a.getOrElse(kk, (boundA, boundA))
      val (c2, e2) = b.getOrElse(kk, (boundB, boundB))
      kk -> (c1 + c2, e1 + e2)
    }.toMap
    if (union.size <= k) union
    else union.toSeq.sortBy { case (kk, (c, _)) => (-c, kk) }.take(k).toMap
  }

  def finish(b: Map[String, (Long, Long)]): Seq[(String, Long, Long)] =
    b.toSeq.map { case (kk, (c, e)) => (kk, c, e) }
      .sortBy { case (kk, c, _) => (-c, kk) }

  def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
    Encoders.kryo[Map[String, (Long, Long)]]
  def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
