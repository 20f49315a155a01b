package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Serializable KLL holder for aggregation buffers: the in-memory form
  * is a live heap sketch (updates are O(1) amortized, no per-row
  * serialization), the wire form is the sketch's own compact byte image
  * — written only when a partial buffer actually crosses the exchange.
  */
private[graft] final class KllHolder(k: Int) extends Serializable {
  @transient var sk: KllDoublesSketch = KllDoublesSketch.newHeapInstance(k)

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    val b = sk.toByteArray
    out.writeInt(b.length)
    out.write(b)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    val n = in.readInt()
    val b = new Array[Byte](n)
    in.readFully(b)
    sk = KllDoublesSketch.heapify(Memory.wrap(b))
  }
}

/** Per-GROUP KLL quantile sketch as a typed aggregate —
  * `groupBy(keys).agg(kll_sketch(x))` — the grouped complement of
  * [[graft.operators.Sketches.kllSketch]]'s whole-column build.
  *
  * One aggregation pass yields a mergeable quantile artifact per group
  * (compact KLL bytes, ~3 KB at k = 800): per-tenant latency quantiles,
  * per-day distribution snapshots that union later via
  * `KllDoublesSketch.merge`, and the bounded-error per-group K-S probe
  * ([[graft.operators.GroupedFit.gofByGroupSketch]]) all read it. The
  * buffer is a live heap sketch — rows stream into `update` with no
  * per-row serialization; Java serialization (the sketch's own compact
  * image) happens only when a partial aggregate crosses the exchange,
  * so the shuffle carries one ~3 KB blob per (partition, group), never
  * values. NaN inputs are skipped (KLL would throw).
  */
final class KllGroupSketch(k: Int = 800)
    extends Aggregator[Double, KllHolder, Array[Byte]] {
  def zero: KllHolder = new KllHolder(k)
  def reduce(b: KllHolder, x: Double): KllHolder = {
    if (!x.isNaN) b.sk.update(x)
    b
  }
  def merge(a: KllHolder, b: KllHolder): KllHolder = {
    a.sk.merge(b.sk)
    a
  }
  def finish(b: KllHolder): Array[Byte] = b.sk.toByteArray
  def bufferEncoder: Encoder[KllHolder] = Encoders.javaSerialization[KllHolder]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
