package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Change-data-capture table maintenance — the dimension-building and
  * reconciliation primitives a warehouse pipeline runs around every
  * ingest (reference semantics: the standard Kimball SCD type-2
  * contract and the rsync-style bucketed-checksum diff):
  *
  *  - [[scd2Build]]: collapse an attribute-change event stream into a
  *    type-2 slowly-changing dimension (validity intervals + current
  *    flag) — key-partitioned windows only, one shuffle.
  *  - [[checksumReconcile]]: compare two huge tables WITHOUT moving
  *    either — per-bucket row counts and order-independent hash sums;
  *    only mismatching buckets need re-transfer or row-level diffing.
  *    O(B) output for any table size.
  */
object Cdc {

  /** Build a type-2 slowly-changing dimension from an attribute
    * history: keep only the rows where any tracked attribute CHANGED
    * (null-safe comparison), stamp each with its validity interval
    * [valid_from, valid_to) from the next change's timestamp
    * (valid_to null = current version), and number versions per key.
    *
    * Scale shape: one shuffle on the key; everything else is lag/lead
    * under the (key, order) window. Ties in `orderCol` are broken by
    * `tieCols` (pass a unique event id — an ambiguous order would make
    * "which write wins" nondeterministic).
    *
    * @return (key, attrs…, valid_from, valid_to, version, is_current) */
  def scd2Build(df: DataFrame, keyCol: String, orderCol: String,
                attrCols: Seq[String], tieCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one tracked attribute")
    require(tieCols.nonEmpty, "need deterministic order tie-break columns")
    val ord = (F.col(orderCol).asc +: tieCols.map(c => F.col(c).asc))
    val w = Window.partitionBy(keyCol).orderBy(ord: _*)
    val changed = attrCols
      .map(c => !(F.col(c) <=> F.lag(F.col(c), 1).over(w)))
      .reduce(_ || _)
    val flagged = df
      .where(F.col(keyCol).isNotNull && F.col(orderCol).isNotNull)
      .withColumn("__rn", F.row_number().over(w))
      .withColumn("__chg", F.col("__rn") === 1 || changed)
      .where(F.col("__chg"))
    val wc = Window.partitionBy(keyCol)
      .orderBy(F.col(orderCol).asc +: tieCols.map(c => F.col(c).asc): _*)
    flagged
      .withColumn("valid_from", F.col(orderCol))
      .withColumn("valid_to", F.lead(F.col(orderCol), 1).over(wc))
      .withColumn("version", F.row_number().over(wc).cast("long"))
      .withColumn("is_current", F.col("valid_to").isNull)
      .select(F.col(keyCol) +: attrCols.map(F.col) :+
        F.col("valid_from") :+ F.col("valid_to") :+ F.col("version") :+
        F.col("is_current"): _*)
  }

  /** Bucketed checksum reconciliation of two tables: hash each row's
    * identity columns to a 48-bit md5 prefix (mod 10⁹ so bucket sums
    * can never overflow a long), bucket rows by md5(key) % B, and
    * compare per-bucket (count, hash-sum) pairs across the two sides.
    * A matching bucket is PROOF the two sides agree on it (up to md5
    * collisions); a mismatching bucket localizes the diff to 1/B of
    * the keyspace — the shape that reconciles two 100 TB tables with
    * O(B) driver traffic and zero row transfer.
    *
    * Hash columns must be integer/string typed (float-to-string
    * rendering differs across engines; cast or round upstream). NULLs
    * are encoded explicitly — each column renders as `v<value>` or the
    * bare sentinel `n` when NULL — so rows differing only in WHICH
    * column holds a NULL (e.g. (x, NULL) vs (NULL, x)) hash
    * differently; a plain concat_ws would skip NULLs and let such
    * diffs cancel silently.
    *
    * @return one row per bucket present on either side: (bucket,
    *         count_a, count_b, hash_a, hash_b, is_match) */
  def checksumReconcile(a: DataFrame, b: DataFrame, keyCol: String,
                        hashCols: Seq[String],
                        buckets: Int = 64): DataFrame = {
    require(buckets >= 1, "need at least one bucket")
    require(hashCols.nonEmpty, "need at least one hash column")
    def side(df: DataFrame, cntAs: String, sumAs: String): DataFrame = {
      val rowHash = F.conv(F.substring(F.md5(
        F.concat_ws("|", hashCols.map(c =>
          F.coalesce(F.concat(F.lit("v"), F.col(c).cast("string")),
            F.lit("n"))): _*)
          .cast("binary")), 1, 12), 16, 10).cast("long") % 1000000000L
      val bucket = F.conv(F.substring(F.md5(
        F.col(keyCol).cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long") % buckets.toLong
      df.where(F.col(keyCol).isNotNull)
        .groupBy(bucket.as("bucket"))
        .agg(F.count(F.lit(1)).as(cntAs), F.sum(rowHash).as(sumAs))
    }
    val sa = side(a, "count_a", "hash_a")
    val sb = side(b, "count_b", "hash_b")
    sa.join(sb, Seq("bucket"), "full_outer")
      .select(F.col("bucket"),
        F.coalesce(F.col("count_a"), F.lit(0L)).as("count_a"),
        F.coalesce(F.col("count_b"), F.lit(0L)).as("count_b"),
        F.coalesce(F.col("hash_a"), F.lit(0L)).as("hash_a"),
        F.coalesce(F.col("hash_b"), F.lit(0L)).as("hash_b"))
      .withColumn("is_match",
        F.col("count_a") === F.col("count_b") &&
          F.col("hash_a") === F.col("hash_b"))
  }
}
