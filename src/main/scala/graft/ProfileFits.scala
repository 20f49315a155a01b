package graft

import org.apache.spark.sql.SparkSession

/** Debug harness: per-family wall-clock of the exact fit kernel (fit +
  * metrics) on real fitting samples, outside the Spark fan-out — isolates
  * algorithmic cost from scheduling/contention. Usage:
  *   runMain graft.ProfileFits [sfDir] [column] [minSeconds]
  */
object ProfileFits {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val column = args.lift(1).getOrElse("l_discount")
    val minS = args.lift(2).map(_.toDouble).getOrElse(0.2)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val sample = operators.Fitter.fittingSample(df, column, 10000, 42L)
    spark.stop()
    println(s"sample n=${sample.length} col=$column")

    val hist = {
      // same histogram shape the fitter builds
      val mn = sample.min; val mx = sample.max
      val hi = mx + (mx - mn) * 1e-10
      val nBins = 50
      val w = (hi - mn) / nBins
      val counts = new Array[Long](nBins)
      sample.foreach { v =>
        val b = math.min(nBins - 1, math.max(0, ((v - mn) / w).toInt)); counts(b) += 1
      }
      val edges = Array.tabulate(nBins + 1)(j => mn + j * (hi - mn) / nBins)
      operators.Hist(counts.map(_.toDouble / (sample.length * w)), edges)
    }
    val ctx = operators.FitContext(column, hist, sample,
      operators.DataStats.of(sample), None)
    val cfg = operators.FitConfig()
    val parallel = args.contains("par")
    val names = graft.dists.DistRegistry.defaultNames
    if (parallel) {
      // mimic the local[32] fan-out: 3 copies (as if 3 columns), 32 threads
      val work = (1 to 3).flatMap(_ => names)
      val t0 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
      val times = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()
      val futs: Seq[java.util.concurrent.Future[_]] = work.map { name =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val s = System.nanoTime()
            operators.Fitter.fitOne(name, ctx, cfg)
            val dt = (System.nanoTime() - s) / 1e9
            times.compute(name, (_, old) =>
              if (old == null || old.doubleValue < dt) java.lang.Double.valueOf(dt) else old)
          }
        })
      }
      futs.foreach(_.get())
      pool.shutdown()
      val wall = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      times.asScala.toSeq.map { case (k, v) => (k, v.doubleValue) }.filter(_._2 >= minS).sortBy(-_._2).take(20).foreach {
        case (n, t) => println(f"$t%8.2f s (max of 3)  $n%-20s")
      }
      println(f"PARALLEL WALL: $wall%.1f s for ${work.length} fits on 32 threads")
    } else {
      val results = names.map { name =>
        val t0 = System.nanoTime()
        val r = operators.Fitter.fitOne(name, ctx, cfg)
        val t1 = System.nanoTime()
        (name, (t1 - t0) / 1e9, r.aic)
      }
      results.filter(_._2 >= minS).sortBy(-_._2).foreach { case (n, t, aic) =>
        println(f"$t%8.2f s  $n%-20s aic=$aic%.1f")
      }
      val total = results.map(_._2).sum
      println(f"TOTAL: $total%.1f s over ${results.length} families")
    }
  }
}
