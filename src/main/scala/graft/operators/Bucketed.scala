package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-located joins — the 100 TB answer to "we join these
  * two fact tables on the same key every day".
  *
  * A shuffle join on two 10 TB fact tables moves both sides across the
  * network every query. Writing each table ONCE with `bucketBy(n, key)`
  * pre-partitions the data by `hash(key) % n` on disk; every subsequent
  * equi-join on that key reads matching buckets pairwise and skips both
  * Exchanges entirely (Spark's `FileSourceScanExec` reports
  * `HashPartitioning(key, n)` as its output partitioning, satisfying the
  * join's distribution requirement). `sortBy(key)` additionally removes
  * the per-task Sort under a sort-merge join.
  *
  * This is a thin, opinionated wrapper over the builtin bucketing
  * machinery — Catalyst does all the work; the value is the contract:
  * same bucket count + same key on both sides = exchange-free joins,
  * asserted by PlanSpec.
  */
object Bucketed {

  /** Persist `df` as a bucketed, bucket-sorted catalog table. The table
    * data lands under `spark.sql.warehouse.dir`. Buckets on `keys`, sorts
    * each bucket file by the same keys (the layout sort-merge join wants).
    *
    * `numBuckets` should be sized so one bucket of the LARGER table fits
    * an executor's scan comfortably (e.g. 10 TB / 4096 buckets ≈ 2.4 GB);
    * both sides of a planned join must use the same count.
    */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
                    keys: Seq[String], path: Option[String] = None): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
    // explicit path → external table (data outlives/escapes the
    // session's warehouse dir); otherwise managed under warehouse.dir
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Equi-join two bucketed catalog tables on their (shared) bucket keys.
    * With matching bucket counts the plan contains NO Exchange on either
    * side — verify with `.explain("formatted")` or the PlanSpec assert.
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)
}
