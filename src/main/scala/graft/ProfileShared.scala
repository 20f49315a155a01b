package graft

import org.apache.spark.sql.SparkSession

/** Debug harness: time the full Fitter.fit fan-out (the bench's memoized
  * path) directly. Usage: runMain graft.ProfileShared [sfDir] */
object ProfileShared {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val t0 = System.nanoTime()
    val r = operators.Fitter.fit(spark, df,
      Seq("l_extendedprice", "l_discount", "l_tax"))
    val n = r.df.count()
    println(f"FIT WALL: ${(System.nanoTime() - t0) / 1e9}%.1f s, rows=$n")
    r.df.orderBy(org.apache.spark.sql.functions.col("fit_seconds").desc)
      .select("column_name", "distribution", "fit_seconds")
      .limit(15).collect()
      .foreach(x => println(f"  ${x.getString(0)}%-18s ${x.getString(1)}%-18s ${x.getDouble(2)}%6.2f s"))
    spark.stop()
  }
}
