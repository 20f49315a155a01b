package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession

import graft.dists.{ContinuousDist, DistRegistry}

/** `GraftExtensions` — the spark.sql.extensions entry point (§2.9). The
  * session here is built WITH the extensions instance, the way
  * `--conf spark.sql.extensions=graft.GraftExtensions` would.
  */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = {
    // other suites in this JVM may have left a default session without
    // extensions; this suite needs its own
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("dist_pdf/cdf/ppf resolve as catalog functions without any register call") {
    val row = spark.sql(
      """SELECT dist_pdf('norm', array(0D, 1D), 0D)    AS pdf0,
        |       dist_cdf('norm', array(0D, 1D), 0D)    AS cdf0,
        |       dist_ppf('norm', array(0D, 1D), 0.975D) AS q975,
        |       dist_logpdf('expon', array(0D, 2D), 1D) AS lp
        |""".stripMargin).head()
    assert(math.abs(row.getDouble(0) - 1.0 / math.sqrt(2 * math.Pi)) < 1e-12)
    assert(math.abs(row.getDouble(1) - 0.5) < 1e-12)
    assert(math.abs(row.getDouble(2) - 1.959963984540054) < 1e-9)
    assert(math.abs(row.getDouble(3) - (math.log(0.5) - 0.5)) < 1e-12)
  }

  test("dist_pmf takes integer k; unknown name and bad params yield NULL") {
    val row = spark.sql(
      """SELECT dist_pmf('poisson', array(3D), 2)            AS pmf2,
        |       dist_pdf('no_such_dist', array(1D, 2D), 0D)  AS unknown,
        |       dist_pdf('norm', array(0D, -1D), 0D)         AS badscale,
        |       dist_pdf('norm', array(0D, 1D), CAST(NULL AS DOUBLE)) AS nullx
        |""".stripMargin).head()
    val expected = math.exp(-3.0) * 9.0 / 2.0 // e^-3 3^2/2!
    assert(math.abs(row.getDouble(0) - expected) < 1e-12)
    assert(row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(3))
  }

  test("array_dot injects as the codegen'd expression") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val v = spark.sql("SELECT array_dot(a, b) AS d FROM vecs").head().getDouble(0)
    assert(v == 1.0 * 4 + 2 * 5 + 3 * 6)
  }

  test("cdf predicate folding rewrites to the same rows the row-wise filter keeps") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // spark.range (not a LocalRelation) so the optimizer can't collapse
    // the whole query into a pre-evaluated literal relation
    spark.range(1, 2001).select((col("id") * 0.37).as("x"))
      .createOrReplaceTempView("mf")
    // rewritten path: filter directly on dist_cdf (rule fires — the
    // injected optimizer rule is active on this session)
    val folded = spark.sql(
      "SELECT count(*) AS n FROM mf WHERE dist_cdf('expon', array(10D, 200D), x) >= 0.25 AND dist_cdf('expon', array(10D, 200D), x) < 0.75")
    val plan = folded.queryExecution.optimizedPlan.toString
    assert(!plan.contains("dist_cdf"),
      s"rule should have folded the cdf comparisons:\n$plan")
    // equivalence: the kept row set must be exactly what the row-wise
    // cdf evaluation keeps, computed here straight off the engine's own
    // frozen-model API (a nested-subquery SQL baseline is NOT independent
    // — CollapseProject merges it into a filter and the rule folds it too)
    val model = graft.dists.FrozenDist(
      graft.dists.DistRegistry.get("expon").get, Array(10.0, 200.0))
    val expected = (1 until 2001).map(_ * 0.37)
      .count(x => model.cdf(x) >= 0.25 && model.cdf(x) < 0.75)
    assert(folded.head().getLong(0) == expected)
    // boundary thresholds stay row-wise (q = 0 or 1 would not be a
    // strictly-increasing cut)
    val boundary = spark.sql(
      "SELECT count(*) FROM mf WHERE dist_cdf('expon', array(10D, 200D), x) >= 0.0")
    assert(boundary.queryExecution.optimizedPlan.toString.contains("dist_cdf"))
  }

  test("folded greater-than predicates drop NaN x like the row-wise cdf does") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // row 0 carries NaN; the row-wise dist_cdf nulls it (dropped), while a
    // bare x >= ppf(q) would KEEP it under Spark's NaN-above-all ordering —
    // the rule's NOT isnan(x) guard is what this pins down
    spark.range(0, 100)
      .select(when(col("id") === 0, lit(Double.NaN))
        .otherwise(col("id").cast("double")).as("x"))
      .createOrReplaceTempView("mf_nan")
    val folded = spark.sql(
      "SELECT count(*) AS n FROM mf_nan WHERE dist_cdf('expon', array(0D, 50D), x) >= 0.25")
    val plan = folded.queryExecution.optimizedPlan.toString
    assert(!plan.contains("dist_cdf"),
      s"rule should still fold the guarded comparison:\n$plan")
    val model = graft.dists.FrozenDist(
      graft.dists.DistRegistry.get("expon").get, Array(0.0, 50.0))
    val expected = (1 until 100).map(_.toDouble)
      .count(x => model.cdf(x) >= 0.25)
    assert(folded.head().getLong(0) == expected)
    // value-producing contexts stay row-wise: a PROJECTED comparison
    // keeps dist_cdf (and with it null-on-NaN semantics) — the rule
    // only rewrites Filter conditions, where null ≡ false
    val proj = spark.sql(
      "SELECT dist_cdf('expon', array(0D, 50D), x) >= 0.25 AS flag FROM mf_nan")
    assert(proj.queryExecution.optimizedPlan.toString.contains("dist_cdf"),
      "projection context must not be rewritten")
  }

  test("null-sensitive wrappers around a cdf comparison stay row-wise") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // Row 0 carries NaN x: the row-wise cdf NULLs it, and under
    // coalesce(.., true) / IS NULL the row is KEPT — a rewrite to
    // `x >= c AND NOT isnan(x)` (false) would silently drop it. The rule
    // must only rewrite comparisons in positive And/Or positions.
    spark.range(0, 100)
      .select(when(col("id") === 0, lit(Double.NaN))
        .otherwise(col("id").cast("double")).as("x"))
      .createOrReplaceTempView("mf_wrap")
    val model = graft.dists.FrozenDist(
      graft.dists.DistRegistry.get("expon").get, Array(0.0, 50.0))
    // coalesce(cdf >= q, true): NaN row kept, plus rows passing the cut
    val co = spark.sql(
      "SELECT count(*) AS n FROM mf_wrap WHERE coalesce(dist_cdf('expon', array(0D, 50D), x) >= 0.25, true)")
    assert(co.queryExecution.optimizedPlan.toString.contains("dist_cdf"),
      "comparison under coalesce must not be rewritten")
    val expectedCo = 1 + (1 until 100).map(_.toDouble).count(x => model.cdf(x) >= 0.25)
    assert(co.head().getLong(0) == expectedCo)
    // (cdf >= q) IS NULL: keeps EXACTLY the NaN row
    val isn = spark.sql(
      "SELECT count(*) AS n FROM mf_wrap WHERE (dist_cdf('expon', array(0D, 50D), x) >= 0.25) IS NULL")
    assert(isn.queryExecution.optimizedPlan.toString.contains("dist_cdf"),
      "comparison under IS NULL must not be rewritten")
    assert(isn.head().getLong(0) == 1L)
    // positive AND/OR positions still fold — the restriction must not
    // disable the rule where it is safe
    val conj = spark.sql(
      "SELECT count(*) AS n FROM mf_wrap WHERE dist_cdf('expon', array(0D, 50D), x) >= 0.25 OR x < 5D")
    assert(!conj.queryExecution.optimizedPlan.toString.contains("dist_cdf"),
      "comparison under Or must still fold")
    val expectedConj = (1 until 100).map(_.toDouble)
      .count(x => model.cdf(x) >= 0.25 || x < 5.0)
    assert(conj.head().getLong(0) == expectedConj)
  }

  test("custom families registered on the driver reach the plan snapshot") {
    // triangular-ish toy family under a name the builtin registry lacks
    object Toy extends ContinuousDist {
      val name = "toy_ext_dist"
      val shapeNames: Seq[String] = Seq.empty
      override def a0(s: Array[Double]): Double = 0.0
      override def b0(s: Array[Double]): Double = 1.0
      def pdf0(z: Double, s: Array[Double]): Double =
        if (z >= 0 && z <= 1) 2 * z else 0.0
      def cdf0(z: Double, s: Array[Double]): Double =
        if (z < 0) 0 else if (z > 1) 1 else z * z
      def ppf0(q: Double, s: Array[Double]): Double = math.sqrt(q)
      def warmStart(xs: Array[Double]): Array[Double] = Array(0.0, 1.0)
      override def refineAfterWarmStart: Boolean = false
    }
    DistRegistry.register(Toy)
    try {
      // builder runs at planning time → snapshot includes the new family
      val v = spark.sql(
        "SELECT dist_cdf('toy_ext_dist', array(0D, 1D), 0.5D) AS c").head().getDouble(0)
      assert(math.abs(v - 0.25) < 1e-12)
    } finally DistRegistry.unregister("toy_ext_dist")
  }
}
