package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Concat-and-chunk sequence packing: lay every document's tokens end to
  * end in id order and cut fixed-capacity training sequences — the
  * GPT-style packing step that turns a filtered corpus into equal-length
  * model inputs. Each document learns its global token offset and which
  * sequences it lands in (a document may span several).
  *
  * Scale design: the global offset is a prefix sum in id order. A window
  * `sum() over (order by id)` would funnel the corpus through ONE
  * partition; instead this uses the zipWithIndex construction —
  * range-partition by id, collect per-partition token sums (#partitions
  * longs, nothing else, to the driver), broadcast the partition base
  * offsets, then a per-partition running sum where the rows already live.
  * Every stage is distributed; driver traffic is O(#partitions).
  */
object Packing {

  /** @param capacity tokens per packed training sequence
    * @return (id, n_tokens, offset, first_seq, last_seq, n_seqs) */
  def packSequences(df: DataFrame, idCol: String, nTokensCol: String,
                    capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // null ids have no place in the order and are excluded; null token
    // counts pack as zero-length documents (they occupy no tokens)
    val base = df
      .select(F.col(idCol).cast("long").as("id"),
        F.coalesce(F.col(nTokensCol).cast("long"), F.lit(0L)).as("n_tokens"))
      .where(F.col("id").isNotNull)
      .repartitionByRange(F.col("id"))
      .sortWithinPartitions("id")
      .as[(Long, Long)].rdd
    base.cache()
    val partSums = base.mapPartitionsWithIndex { case (i, it) =>
      var s = 0L; it.foreach(s += _._2); Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val packed = base.mapPartitionsWithIndex { case (i, it) =>
      var running = bc.value(i)
      it.map { case (id, nt) =>
        val off = running
        running += nt
        val first = off / capacity
        val last = if (nt == 0) first else (off + nt - 1) / capacity
        (id, nt, off, first, last, last - first + 1)
      }
    }.toDF("id", "n_tokens", "offset", "first_seq", "last_seq", "n_seqs")
    // lineage-free copy so the result survives the base RDD's unpersist
    val pinned = packed.localCheckpoint(true)
    base.unpersist(blocking = false)
    pinned
  }
}
