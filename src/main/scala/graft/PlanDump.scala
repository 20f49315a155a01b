package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import java.nio.file.{Files, Paths}

/** Measurement aid (optimization rounds): dump `.explain("formatted")`
  * for named SparkEntry queries to files — the plan evidence the
  * optimization round commits under plans/rNN/.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> q1,q2,...
  * writes <outDir>/<query>_<suffix>.txt
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // mirror Bench/Verify's default (see Bench.scala) so dumped plans
      // are the plans the bench times and the verify gate checks — all
      // three tools share the SPARK_GRAFT_CONSTRAINT_PROP switch
      .config("spark.sql.constraintPropagation.enabled",
        (sys.env.getOrElse("SPARK_GRAFT_CONSTRAINT_PROP", "0") == "1").toString)
    // mirror Bench's A/B passthrough so plan evidence can be dumped
    // under the exact session confs an experiment ran with; applied at
    // builder time (static confs accepted when this JVM creates the
    // session) AND re-applied after getOrCreate with logged failures —
    // the same reach Bench gives the variable, so an A/B experiment's
    // two tools see identical configs
    sys.env.get("SPARK_GRAFT_EXTRA_CONFS").foreach(_.split(";").foreach { kv =>
      val i = kv.indexOf('=')
      if (i > 0) builder.config(kv.take(i), kv.drop(i + 1))
    })
    val spark = builder.getOrCreate()
    sys.env.get("SPARK_GRAFT_EXTRA_CONFS").foreach(_.split(";").foreach { kv =>
      val i = kv.indexOf('=')
      if (i > 0) try spark.conf.set(kv.take(i), kv.drop(i + 1))
      catch { case e: Throwable =>
        System.err.println(s"EXTRA CONF rejected: $kv -> ${e.getMessage}") }
    })
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.split(",").foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        System.err.println(s"[plandump] wrote $name ($suffix)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: $e")
      }
    }
    spark.stop()
  }
}
