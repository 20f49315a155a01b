package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Histogram as a typed Catalyst aggregate — SURVEY.md §2.9/§7's "one
  * genuinely custom Catalyst piece".
  *
  * `hist_counts(x, lo, hi, nBins)` counts equal-width bins in one
  * partial-aggregate pass: each partition reduces into a single
  * `Array[Long]`, and the exchange carries ONE array per partition
  * instead of ~`nBins` grouped rows. Unlike the floor-bin/groupBy plan
  * (Histogram.continuous) it also composes with `GROUP BY`, giving
  * per-group histograms with a single shuffle.
  *
  * Bin arithmetic is identical to Histogram.continuous (reference:
  * src/spark_bestfit/histogram.py:51-132): bin = clamp(floor((x−lo)/w),
  * 0, n−1), w = (hi−lo)/n. The grid (lo, hi, nBins) must be constant
  * within an aggregation group.
  */
object HistAggregator
    extends Aggregator[(Double, Double, Double, Int), Array[Long], Seq[Long]] {

  def zero: Array[Long] = Array.empty[Long]

  def reduce(b: Array[Long], in: (Double, Double, Double, Int)): Array[Long] = {
    val (x, lo, hi, nBins) = in
    val buf = if (b.length == nBins) b else new Array[Long](nBins)
    val width = (hi - lo) / nBins
    if (width > 0 && !x.isNaN) {
      val bin = math.min(math.max(math.floor((x - lo) / width).toLong, 0L),
        (nBins - 1).toLong).toInt
      buf(bin) += 1L
    }
    buf
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    var i = 0
    while (i < a.length && i < b.length) { a(i) += b(i); i += 1 }
    a
  }

  def finish(b: Array[Long]): Seq[Long] = b.toSeq

  def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
