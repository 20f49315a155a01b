package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Z-order (Morton-curve) clustering — the multi-dimensional data-skipping
  * layout for a 100 TB lake: files written in z-value order carry tight
  * min/max zone maps on EVERY clustered dimension at once, so a range
  * predicate on any of them prunes most files at the parquet-footer level
  * (single-column sorting buys that for one dimension only). The same
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`, built here from
  * codegen'd builtins: quantize each dimension to a 2^bits grid against
  * its global min/max, interleave the bits (one `shiftright`/`and`/
  * `shiftleft`/`or` chain — no UDF), then one `repartitionByRange` +
  * in-partition sort on the z-value. Total cost: one min/max agg scan +
  * one range shuffle, independent of dimension count.
  */
object ZOrder {

  /** Grid cell index of `c` in `[mn, mx]` quantized to 2^bits cells,
    * clamped to the grid (values at mx land in the top cell; a degenerate
    * mn == mx column collapses to cell 0; nulls land in cell 0 so they
    * cluster together instead of poisoning the z-value to null). */
  def cell(c: Column, mn: Column, mx: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, "bits must be in [1, 20]")
    val n = 1 << bits
    val w = F.when(mx > mn, (mx - mn) / F.lit(n.toDouble)).otherwise(F.lit(1.0))
    F.least(F.greatest(
      F.floor((F.coalesce(c, mn) - mn) / w).cast("long"), F.lit(0L)),
      F.lit((n - 1).toLong))
  }

  /** Morton z-value: bit b of dimension d lands at position b·D + d.
    * A pure expression tree over integer builtins — whole-stage codegen
    * keeps it in the scan projection. */
  def zValue(cells: Seq[Column], bits: Int): Column = {
    val d = cells.length
    require(d >= 1, "at least one dimension")
    require(bits * d <= 63, s"bits·dims = ${bits * d} overflows a long")
    val terms = for {
      b <- 0 until bits
      (c, i) <- cells.zipWithIndex
    } yield F.shiftleft(
      F.shiftrightunsigned(c, b).bitwiseAND(F.lit(1L)), b * d + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` by the z-order of `cols`: one shared min/max agg over
    * all dimensions, a `z_value` column from [[cell]] + [[zValue]], then
    * `repartitionByRange(z_value)` + in-partition sort — the layout pass
    * before a partitioned/ordered parquet write. Returns the clustered
    * frame with `z_value` retained (writers typically drop it). */
  def clusterByZ(df: DataFrame, cols: Seq[String], bits: Int = 8,
                 numPartitions: Int = 0): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(F.min(F.col(c).cast("double")).as(s"__mn_$c"),
        F.max(F.col(c).cast("double")).as(s"__mx_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    // empty input / all-null column: null bounds degrade to the (0,0)
    // degenerate range, so every row (if any) lands in cell 0 — no NPE
    val cells = cols.zipWithIndex.map { case (c, i) =>
      val mn = if (r.isNullAt(2 * i)) 0.0 else r.getDouble(2 * i)
      val mx = if (r.isNullAt(2 * i + 1)) 0.0 else r.getDouble(2 * i + 1)
      cell(F.col(c).cast("double"), F.lit(mn), F.lit(mx), bits)
    }
    val out = df.withColumn("z_value", zValue(cells, bits))
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    out.repartitionByRange(parts, F.col("z_value"))
      .sortWithinPartitions("z_value")
  }

  /** Per-partition bounding boxes of the clustered dimensions — the
    * zone maps a parquet writer would persist, surfaced as data so tests
    * and operators can measure skipping power. Returns one row per
    * non-empty partition: (partition, n_rows, min/max per dim). */
  def partitionBounds(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = F.count(F.lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(F.min(F.col(c).cast("double")).as(s"min_$c"),
        F.max(F.col(c).cast("double")).as(s"max_$c")))
    df.withColumn("__pid", F.spark_partition_id())
      .groupBy(F.col("__pid").as("partition"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
