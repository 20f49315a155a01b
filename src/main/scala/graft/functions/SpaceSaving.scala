package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** SpaceSaving top-k sketch (Metwally, Agrawal & El Abbadi, "Efficient
  * Computation of Frequent and Top-k Elements in Data Streams",
  * ICDT 2005) as a typed Spark Aggregator — bounded-state heavy-hitter
  * detection for unbounded key domains, where an exact groupBy would
  * shuffle one row per distinct key.
  *
  * State is AT MOST k (key, count, error) counters per partial; the
  * exchange carries one k-counter summary per partition. Guarantees
  * (asserted in spec + property tests):
  *   - estimates only ever OVERCOUNT: true ≤ est ≤ true + error;
  *   - any key with true frequency > n/k is present in the summary;
  *   - with k ≥ the stream's distinct-key count no eviction ever
  *     happens, error stays 0, and the sketch is EXACT — the regime the
  *     harness oracle pins against a plain GROUP BY.
  *
  * The buffer is the paper's stream-summary shape: a key→counter map
  * plus count-ordered buckets of keys, so the hot path is O(1)-ish per
  * row (hash update + bucket move) and eviction picks the minimum
  * counter in O(log k) — no O(k) scan or map rebuild per input row.
  * Victim selection within a bucket is by smallest key, keeping the
  * sketch byte-deterministic across reruns.
  *
  * Merge follows the mergeable-summaries construction (Agarwal et al.,
  * PODS 2012): a key absent from a FULL summary may have occurred up to
  * that summary's minimum counter value while untracked, so the absent
  * side contributes (minCounter, minCounter); counts and error bounds
  * add, then the union trims back to the k largest counters.
  */
final class SSState(val k: Int) extends Serializable {
  val counts: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty
  // count → keys at that count (TreeSet: deterministic min key)
  val buckets: mutable.TreeMap[Long, mutable.TreeSet[String]] = mutable.TreeMap.empty

  private def bucketRemove(c: Long, key: String): Unit = {
    val set = buckets(c)
    set.remove(key)
    if (set.isEmpty) buckets.remove(c)
  }
  private def bucketAdd(c: Long, key: String): Unit =
    buckets.getOrElseUpdate(c, mutable.TreeSet.empty[String]).add(key)

  def minCount: Long = if (buckets.isEmpty) 0L else buckets.head._1

  def put(key: String, c: Long, e: Long): Unit = {
    counts.get(key).foreach { case (old, _) => bucketRemove(old, key) }
    counts.update(key, (c, e))
    bucketAdd(c, key)
  }

  def add(key: String): Unit = counts.get(key) match {
    case Some((c, e)) =>
      bucketRemove(c, key)
      counts.update(key, (c + 1L, e))
      bucketAdd(c + 1L, key)
    case None if counts.size < k =>
      counts.update(key, (1L, 0L))
      bucketAdd(1L, key)
    case None =>
      // evict the deterministic minimum counter; the newcomer inherits
      // min+1 with error = min (it may have occurred up to min times
      // while untracked)
      val (minC, set) = buckets.head
      val victim = set.head
      bucketRemove(minC, victim)
      counts.remove(victim)
      counts.update(key, (minC + 1L, minC))
      bucketAdd(minC + 1L, key)
  }
}

class SpaceSaving(k: Int)
    extends Aggregator[String, SSState, Seq[(String, Long, Long)]] {
  require(k >= 1, "k must be >= 1")

  def zero: SSState = new SSState(k)

  def reduce(b: SSState, key: String): SSState = { b.add(key); b }

  def merge(a: SSState, b: SSState): SSState = {
    if (a.counts.isEmpty) return b
    if (b.counts.isEmpty) return a
    val boundA = if (a.counts.size < k) 0L else a.minCount
    val boundB = if (b.counts.size < k) 0L else b.minCount
    val union = (a.counts.keySet ++ b.counts.keySet).iterator.map { kk =>
      val (c1, e1) = a.counts.getOrElse(kk, (boundA, boundA))
      val (c2, e2) = b.counts.getOrElse(kk, (boundB, boundB))
      (kk, c1 + c2, e1 + e2)
    }.toSeq
    val kept =
      if (union.size <= k) union
      else union.sortBy { case (kk, c, _) => (-c, kk) }.take(k)
    val out = new SSState(k)
    kept.foreach { case (kk, c, e) => out.put(kk, c, e) }
    out
  }

  def finish(b: SSState): Seq[(String, Long, Long)] =
    b.counts.toSeq.map { case (kk, (c, e)) => (kk, c, e) }
      .sortBy { case (kk, c, _) => (-c, kk) }

  // java serialization, not kryo: kryo's field-level restore of scala's
  // red-black TreeMap/TreeSet internals is unreliable (objenesis skips
  // constructors), while these collections implement java serialization
  // correctly; the buffer crosses the wire once per partial, not per row
  def bufferEncoder: Encoder[SSState] = Encoders.javaSerialization[SSState]
  def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
