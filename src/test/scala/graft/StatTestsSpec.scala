package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.operators.{Cohorts, Experiments, StatTests, Survival}
import graft.functions.SpecialMath

/** Hypothesis tests (Mann–Whitney, Cramér–von Mises, chi-squared, BH
  * FDR) and Kaplan–Meier survival — hand-computed small examples. */
class StatTestsSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-stat-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("mannWhitneyU matches the hand-computed tie-corrected example") {
    import spark.implicits._
    // a = {1,2,3}, b = {2,3,4}: U_a = 1 + 0.5 + 0.5 = 2 (pairs won + ½·ties)
    val df = (Seq(1, 2, 3).map(("a", _)) ++ Seq(2, 3, 4).map(("b", _)))
      .toDF("cohort", "v")
    val r = StatTests.mannWhitneyU(df, "cohort", "v").head()
    assert(r.getAs[Double]("u_a") == 2.0)
    // σ² = (9/12)(7 − 12/30) = 4.95, z = (2 − 4.5 + 0.5)/√4.95 = −0.898933
    assert(math.abs(r.getAs[Double]("z") - -0.898933) < 1e-5)
    // two-sided normal p ≈ 0.3687
    assert(math.abs(r.getAs[Double]("p_value") - 0.3687) < 5e-3)
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
  }

  test("anovaByGroup matches the hand-computed three-level example") {
    import spark.implicits._
    // levels a=[1,2,3], b=[2,3,4], c=[3,4,5]: SSB = 6, SSW = 6,
    // F = (6/2)/(6/6) = 3; p = (1 + d1·F/d2)^(−d2/2) = 2^(−3) = 0.125
    val df = (Seq(1.0, 2.0, 3.0).map(("g", "a", _)) ++
      Seq(2.0, 3.0, 4.0).map(("g", "b", _)) ++
      Seq(3.0, 4.0, 5.0).map(("g", "c", _))).toDF("grp", "lvl", "x")
    val r = StatTests.anovaByGroup(df, Seq("grp"), "lvl", "x").head()
    assert(math.abs(r.getAs[Double]("f_stat") - 3.0) < 1e-9)
    assert(r.getAs[Long]("df1") == 2L && r.getAs[Long]("df2") == 6L)
    assert(math.abs(r.getAs[Double]("ss_between") - 6.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("ss_within") - 6.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("p_value") - 0.125) < 1e-6)
    // a constant-value group (zero within-variance) is omitted
    val const = Seq(("z", "a", 1.0), ("z", "b", 1.0)).toDF("grp", "lvl", "x")
    assert(StatTests.anovaByGroup(const, Seq("grp"), "lvl", "x").count() == 0)
  }

  test("kruskalWallisByGroup: untied and tied hand examples") {
    import spark.implicits._
    // a=[1,2], b=[3,4]: ranks 1..4, H = 0.6·(9/2 + 49/2) − 15 = 2.4
    val plain = Seq(("g", "a", 1.0), ("g", "a", 2.0),
      ("g", "b", 3.0), ("g", "b", 4.0)).toDF("grp", "lvl", "x")
    val r = StatTests.kruskalWallisByGroup(plain, Seq("grp"), "lvl", "x")
      .head()
    assert(math.abs(r.getAs[Double]("h_stat") - 2.4) < 1e-9)
    assert(r.getAs[Long]("dof") == 1L && r.getAs[Long]("n") == 4L)
    // p = chi2 sf(1, 2.4)
    assert(math.abs(r.getAs[Double]("p_value") -
      SpecialMath.gammaIncC(0.5, 1.2)) < 1e-5)
    // ties: a=[1,1], b=[2,2] → midranks 1.5/3.5, raw H = 2.4,
    // C = 1 − 12/60 = 0.8 → H = 3.0
    val tied = Seq(("g", "a", 1.0), ("g", "a", 1.0),
      ("g", "b", 2.0), ("g", "b", 2.0)).toDF("grp", "lvl", "x")
    val rt = StatTests.kruskalWallisByGroup(tied, Seq("grp"), "lvl", "x")
      .head()
    assert(math.abs(rt.getAs[Double]("h_stat") - 3.0) < 1e-9)
    // all values identical → C = 0 → omitted
    val flat = Seq(("g", "a", 1.0), ("g", "b", 1.0)).toDF("grp", "lvl", "x")
    assert(StatTests.kruskalWallisByGroup(flat, Seq("grp"), "lvl", "x")
      .count() == 0)
  }

  test("mannWhitneyU on identical cohorts gives z = 0, p = 1") {
    import spark.implicits._
    val df = (Seq(1, 2, 3).map(("a", _)) ++ Seq(1, 2, 3).map(("b", _)))
      .toDF("cohort", "v")
    val r = StatTests.mannWhitneyU(df, "cohort", "v").head()
    assert(r.getAs[Double]("z") == 0.0)
    assert(r.getAs[Double]("p_value") == 1.0)
  }

  test("cvmTwoSample statistic and degenerate cases") {
    import spark.implicits._
    // a = {1}, b = {2}: at v=1 the ECDF gap is 1 with pooled mass ½ each →
    // T = (1·1/4)·1 = 0.25
    val df = Seq(("a", 1), ("b", 2)).toDF("cohort", "v")
    val r = StatTests.cvmTwoSample(df, "cohort", "v").head()
    assert(r.getAs[Double]("cvm_t") == 0.25)
    // identical cohorts → T = 0, p = 1
    val same = (Seq(1, 2).map(("a", _)) ++ Seq(1, 2).map(("b", _)))
      .toDF("cohort", "v")
    val r2 = StatTests.cvmTwoSample(same, "cohort", "v").head()
    assert(r2.getAs[Double]("cvm_t") == 0.0)
    assert(r2.getAs[Double]("p_value") == 1.0)
  }

  test("cvmCdfInf reproduces the published ω² critical values") {
    // Anderson–Darling (1952) table: P(ω² > 0.34730) = 0.10,
    // P(ω² > 0.46136) = 0.05, P(ω² > 0.74346) = 0.01
    assert(math.abs(SpecialMath.cvmCdfInf(0.34730) - 0.90) < 2e-3)
    assert(math.abs(SpecialMath.cvmCdfInf(0.46136) - 0.95) < 2e-3)
    assert(math.abs(SpecialMath.cvmCdfInf(0.74346) - 0.99) < 2e-3)
    assert(SpecialMath.cvmCdfInf(0.0) == 0.0)
    assert(SpecialMath.cvmCdfInf(100.0) == 1.0)
  }

  test("chiSquareTwoSample matches the 2x2 hand example") {
    import spark.implicits._
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val r = StatTests.chiSquareTwoSample(rows.toDF("cohort", "v"),
      "cohort", "v").head()
    assert(math.abs(r.getAs[Double]("chi2") - 6.666667) < 1e-5)
    assert(r.getAs[Long]("dof") == 1L)
    // χ²(1) upper tail at 6.667 ≈ 0.00982
    assert(math.abs(r.getAs[Double]("p_value") - 0.0098) < 1e-3)
  }

  test("chiSquareGofByGroup: uniform, skewed, and missing-cell groups") {
    import spark.implicits._
    val rows =
      Seq.fill(5)(("g1", "a")) ++ Seq.fill(5)(("g1", "b")) ++
      Seq.fill(8)(("g2", "a")) ++ Seq.fill(2)(("g2", "b")) ++
      Seq.fill(4)(("g3", "a")) // g3 never produces cell b
    val out = StatTests.chiSquareGofByGroup(rows.toDF("g", "v"),
      Seq("g"), "v").orderBy("g").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Double]("chi2") == 0.0 &&
      out(0).getAs[Double]("p_value") == 1.0)
    assert(math.abs(out(1).getAs[Double]("chi2") - 3.6) < 1e-9)
    assert(math.abs(out(1).getAs[Double]("p_value") - 0.0578) < 1e-3)
    // missing cell contributes its full expected mass: (4−2)²/2 + 2 = 4
    assert(out(2).getAs[Double]("chi2") == 4.0)
    assert(out.forall(_.getAs[Long]("dof") == 1L))
  }

  test("bhAdjust reproduces the step-up rule with ties") {
    import spark.implicits._
    val df = Seq(0.005, 0.049, 0.05, 0.2).zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("id", "p")
    val out = StatTests.bhAdjust(df, "p", alpha = 0.05)
      .orderBy("id").collect()
    // ratios m·p/rank = .02, .098, .0667, .2 → right-to-left cummin
    val q = out.map(_.getAs[Double]("q_value"))
    assert(math.abs(q(0) - 0.02) < 1e-12)
    assert(math.abs(q(1) - 0.2 / 3.0) < 1e-12)
    assert(math.abs(q(2) - 0.2 / 3.0) < 1e-12)
    assert(math.abs(q(3) - 0.2) < 1e-12)
    assert(out.map(_.getAs[Boolean]("reject")).toSeq ==
      Seq(true, false, false, false))
    // tied p-values share the largest rank of their block
    val tied = Seq(0.01, 0.01, 0.04).zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("id", "p")
    val qt = StatTests.bhAdjust(tied, "p").orderBy("id").collect()
      .map(_.getAs[Double]("q_value"))
    assert(math.abs(qt(0) - 0.015) < 1e-12 && math.abs(qt(1) - 0.015) < 1e-12)
    assert(math.abs(qt(2) - 0.04) < 1e-12)
  }

  test("kmByGroup matches the classic product-limit worked example") {
    import spark.implicits._
    val df = Seq((1.0, true), (2.0, true), (3.0, false), (4.0, true),
      (5.0, false)).map { case (t, e) => ("g", t, e) }
      .toDF("g", "t", "e")
    val km = Survival.kmByGroup(df, "t", "e", Seq("g")).orderBy("t").collect()
    val surv = km.map(_.getAs[Double]("survival"))
    assert(surv.toSeq == Seq(0.8, 0.6, 0.6, 0.3, 0.3))
    val risk = km.map(_.getAs[Long]("n_risk"))
    assert(risk.toSeq == Seq(5L, 4L, 3L, 2L, 1L))
    // Greenwood at t=2: 0.6·√(1/20 + 1/12) = 0.219089
    assert(math.abs(km(1).getAs[Double]("std_err") - 0.219089) < 1e-6)
    // 95% log-log band at t=2: se_θ = √0.133333/|ln 0.6|,
    // CI = [0.6^exp(+z·se_θ), 0.6^exp(−z·se_θ)] = [0.125730, 0.881756]
    assert(math.abs(km(1).getAs[Double]("ci_lo") - 0.12573) < 1e-6)
    assert(math.abs(km(1).getAs[Double]("ci_hi") - 0.881756) < 1e-6)
    assert(math.abs(km(0).getAs[Double]("ci_lo") - 0.203809) < 1e-6)
    assert(math.abs(km(3).getAs[Double]("ci_hi") - 0.719218) < 1e-6)
    val med = Survival.medianSurvival(df, "t", "e", Seq("g")).head()
    assert(med.getAs[Double]("median_t") == 4.0)
    assert(med.getAs[Long]("n") == 5L)
    assert(med.getAs[Double]("final_survival") == 0.3)
  }

  test("naByGroup matches the hand-computed Nelson–Aalen example") {
    import spark.implicits._
    val df = Seq((1.0, true), (2.0, true), (3.0, false), (4.0, true),
      (5.0, false)).map { case (t, e) => ("g", t, e) }
      .toDF("g", "t", "e")
    val na = Survival.naByGroup(df, "t", "e", Seq("g")).orderBy("t").collect()
    val h = na.map(_.getAs[Double]("cum_hazard"))
    assert(h.toSeq == Seq(0.2, 0.45, 0.45, 0.95, 0.95))
    // Poisson variance at t=4: 1/25 + 1/16 + 1/4 = 0.3525 → se 0.593717
    assert(math.abs(na(3).getAs[Double]("std_err") - 0.593717) < 1e-6)
    assert(na.map(_.getAs[Long]("n_risk")).toSeq == Seq(5L, 4L, 3L, 2L, 1L))
  }

  test("logRank matches the hand-computed interleaved example") {
    import spark.implicits._
    val df = Seq(("a", 1.0, true), ("a", 3.0, true),
      ("b", 2.0, true), ("b", 4.0, true)).toDF("cohort", "t", "e")
    val r = Survival.logRank(df, "t", "e", "cohort").head()
    // O_a = 2, E_a = 1/2 + 1/3 + 1/2 = 1.333333,
    // V = 1/4 + 2/9 + 1/4 = 0.722222 → X² = 0.615384
    assert(r.getAs[Long]("o_a") == 2L)
    assert(math.abs(r.getAs[Double]("e_a") - 1.333333) < 1e-6)
    assert(math.abs(r.getAs[Double]("var_lr") - 0.722222) < 1e-6)
    assert(math.abs(r.getAs[Double]("chi2") - 0.615384) < 1e-5)
    // χ²(1) upper tail at 0.6154 ≈ 0.4328
    assert(math.abs(r.getAs[Double]("p_value") - 0.4328) < 1e-3)
  }

  test("logRank on identical cohorts gives X² = 0, p = 1") {
    import spark.implicits._
    val df = Seq(("a", 1.0, true), ("a", 2.0, true),
      ("b", 1.0, true), ("b", 2.0, true)).toDF("cohort", "t", "e")
    val r = Survival.logRank(df, "t", "e", "cohort").head()
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.getAs[Double]("p_value") == 1.0)
    // censored rows leave the risk set without counting as events
    val cens = Seq(("a", 1.0, true), ("a", 2.0, false),
      ("b", 1.0, false), ("b", 2.0, true)).toDF("cohort", "t", "e")
    val rc = Survival.logRank(cens, "t", "e", "cohort").head()
    assert(rc.getAs[Long]("o_a") == 1L)
  }

  test("kmByGroup: exhausted risk set ends the curve at S = 0") {
    import spark.implicits._
    val df = Seq(("g", 1.0, true), ("g", 2.0, true)).toDF("g", "t", "e")
    val km = Survival.kmByGroup(df, "t", "e", Seq("g")).orderBy("t").collect()
    assert(km(0).getAs[Double]("survival") == 0.5)
    assert(km(1).getAs[Double]("survival") == 0.0)
    assert(km(1).isNullAt(km(1).fieldIndex("std_err")))
    // the band is undefined at S = 0 (and would be at S = 1)
    assert(km(1).isNullAt(km(1).fieldIndex("ci_lo")))
    assert(km(1).isNullAt(km(1).fieldIndex("ci_hi")))
  }

  test("twoProportionZ / wilsonByGroup / cuped match hand-computed values") {
    import spark.implicits._
    // 40/100 vs 25/100 → z = 2.264554, p = 0.02354
    val ab = ((1 to 100).map(i => ("a", i <= 40)) ++
      (1 to 100).map(i => ("b", i <= 25))).toDF("g", "conv")
    val r = Experiments.twoProportionZ(ab, "g", "conv").head()
    assert(math.abs(r.getAs[Double]("z") - 2.264554) < 1e-6)
    assert(math.abs(r.getAs[Double]("p_value") - 0.02354) < 1e-6)
    assert(r.getAs[Double]("rate_a") == 0.4 && r.getAs[Long]("n_b") == 100L)

    // Wilson at 50/100: [0.403832, 0.596168]
    val w = Experiments.wilsonByGroup(
      (1 to 100).map(i => ("g", i <= 50)).toDF("g", "conv"),
      Seq("g"), "conv").head()
    assert(math.abs(w.getAs[Double]("ci_lo") - 0.403832) < 1e-6)
    assert(math.abs(w.getAs[Double]("ci_hi") - 0.596168) < 1e-6)
    // the band stays inside [0, 1] even at rate 0
    val z0 = Experiments.wilsonByGroup(
      (1 to 20).map(_ => ("g", false)).toDF("g", "conv"),
      Seq("g"), "conv").head()
    assert(z0.getAs[Double]("ci_lo") == 0.0)
    assert(z0.getAs[Double]("ci_hi") > 0.0 && z0.getAs[Double]("ci_hi") < 0.2)

    // y = 2x exactly → theta = 2, all variance soaked up
    val cu = Experiments.cuped(
      (1 to 10).map(i => (2.0 * i, i.toDouble)).toDF("y", "x"),
      "y", "x").head()
    assert(cu.getAs[Double]("theta") == 2.0)
    assert(cu.getAs[Double]("var_adj") == 0.0)
    assert(cu.getAs[Double]("reduction") == 1.0)
  }

  test("welchTTestByGroup matches the hand-computed unequal-variance example") {
    import spark.implicits._
    // a = [1..4] (m 2.5, s² 5/3), b = [2,4,6,8,10] (m 6, s² 10):
    // t = −3.5/√(5/12 + 2) = −2.251436, Welch ν = 5.52,
    // p = erfc(|t|/√2) = 0.024358
    val rows = Seq(1.0, 2.0, 3.0, 4.0).map(v => ("g", "a", v)) ++
      Seq(2.0, 4.0, 6.0, 8.0, 10.0).map(v => ("g", "b", v))
    val r = StatTests.welchTTestByGroup(rows.toDF("g", "c", "v"),
      Seq("g"), "c", "v").head()
    assert(math.abs(r.getAs[Double]("t_stat") - (-2.251436)) < 1e-6)
    assert(math.abs(r.getAs[Double]("dof") - 5.52) < 1e-9)
    assert(math.abs(r.getAs[Double]("p_value") - 0.024358) < 1e-6)
    assert(r.getAs[Double]("mean_a") == 2.5 && r.getAs[Double]("mean_b") == 6.0)
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 5L)
    // a group missing a cohort is omitted, not sentinel'd
    val partial = (rows ++ Seq(("h", "a", 1.0), ("h", "a", 2.0)))
      .toDF("g", "c", "v")
    assert(StatTests.welchTTestByGroup(partial, Seq("g"), "c", "v")
      .count() == 1L)
  }

  test("gehanWilcoxon weights the interleaved example by risk fraction") {
    import spark.implicits._
    // a events at 1, 3; b at 2, 4 (N = 4): weights 1, ¾, ½, ¼ →
    // Z = 0.5·1 − 0.25 + 0.25 + 0 = 0.5, V = 0.25 + 0.125 + 0.0625
    // = 0.4375 → X² = 0.571429
    val df = Seq(("a", 1.0, true), ("a", 3.0, true),
      ("b", 2.0, true), ("b", 4.0, true)).toDF("cohort", "t", "e")
    val r = Survival.gehanWilcoxon(df, "t", "e", "cohort").head()
    assert(math.abs(r.getAs[Double]("z_num") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("var_gw") - 0.4375) < 1e-9)
    assert(math.abs(r.getAs[Double]("chi2") - 0.571429) < 1e-6)
    // identical cohorts → X² = 0, p = 1 (same contract as logRank)
    val same = Seq(("a", 1.0, true), ("a", 2.0, true),
      ("b", 1.0, true), ("b", 2.0, true)).toDF("cohort", "t", "e")
    val rs = Survival.gehanWilcoxon(same, "t", "e", "cohort").head()
    assert(rs.getAs[Double]("chi2") == 0.0)
    assert(rs.getAs[Double]("p_value") == 1.0)
  }

  test("coxPH riskScore column is the codegen'd hazard multiplier") {
    import spark.implicits._
    val df = Seq((1.0, true, 1.0), (2.0, true, 0.0), (3.0, false, 1.0),
      (4.0, true, 0.0), (5.0, false, 1.0)).toDF("t", "e", "x")
    val m = Survival.coxPH(df, "t", "e", Seq("x"), iters = 4)
    val scores = df.select(m.riskScore.as("s")).collect()
      .map(_.getAs[Double]("s"))
    // x = 1 rows score exp(β), x = 0 rows score exp(0) = 1
    assert(math.abs(scores(0) - math.exp(m.beta(0))) < 1e-12)
    assert(scores(1) == 1.0)
  }

  test("rmstByGroup integrates the worked K-M curve") {
    import spark.implicits._
    // S steps: 1 on [0,1), .8 on [1,2), .6 on [2,4), .3 on [4,5);
    // τ = 4.5 → 1 + .8 + .6·2 + .3·.5 = 3.15
    val df = Seq((1.0, true), (2.0, true), (3.0, false), (4.0, true),
      (5.0, false)).map { case (t, e) => ("g", t, e) }
      .toDF("g", "t", "e")
    val r = Survival.rmstByGroup(df, "t", "e", Seq("g"), tau = 4.5).head()
    assert(math.abs(r.getAs[Double]("rmst") - 3.15) < 1e-9)
    assert(r.getAs[Double]("tau") == 4.5)
    // τ beyond the last time extends the final level: τ = 6 →
    // 1 + .8 + 1.2 + .3 + .3·(6−5) = 3.6  (S stays .3 at t = 5)
    val r6 = Survival.rmstByGroup(df, "t", "e", Seq("g"), tau = 6.0).head()
    assert(math.abs(r6.getAs[Double]("rmst") - 3.6) < 1e-9)
  }

  test("piecewiseExpByGroup emits Nelson–Aalen increment rates") {
    import spark.implicits._
    // same worked example as naByGroup: increments 0.2, 0.25, 0, 0.5, 0
    // over unit-width intervals from 0 → rates equal ΔH/Δt
    val df = Seq((1.0, true), (2.0, true), (3.0, false), (4.0, true),
      (5.0, false)).map { case (t, e) => ("g", t, e) }
      .toDF("g", "t", "e")
    val pw = Survival.piecewiseExpByGroup(df, "t", "e", Seq("g"))
      .orderBy("t_end").collect()
    assert(pw.map(_.getAs[Double]("t_start")).toSeq ==
      Seq(0.0, 1.0, 2.0, 3.0, 4.0))
    assert(pw.map(_.getAs[Double]("t_end")).toSeq ==
      Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    val rates = pw.map(r => Option(r.getAs[Double]("rate")))
    assert(rates(0).contains(0.2))   // 1/(5·1)
    assert(rates(1).contains(0.25))  // 1/(4·1)
    assert(rates(2).contains(0.0))   // censored-only cell
    assert(rates(3).contains(0.5))   // 1/(2·1)
    // zero-width first interval (event at t = 0) has no rate
    val z = Survival.piecewiseExpByGroup(
      Seq(("g", 0.0, true), ("g", 1.0, true)).toDF("g", "t", "e"),
      "t", "e", Seq("g")).orderBy("t_end").collect()
    assert(z(0).isNullAt(z(0).fieldIndex("rate")))
    assert(z(1).getAs[Double]("rate") == 1.0)
  }

  test("coxPH converges to the hand-solved single-covariate MLE") {
    import spark.implicits._
    // (t, e, x): events at t=1 (x=1), t=2 (x=0), t=4 (x=0); the Breslow
    // partial likelihood ℓ(β) = [β − ln(3e^β+2)] − ln(2e^β+2) − ln(e^β+1)
    // has its maximum at β = −0.83411519 (Newton from 0, verified by
    // hand: I(β̂) = 0.66106403 → se = 1.22992389)
    val df = Seq((1.0, true, 1.0), (2.0, true, 0.0), (3.0, false, 1.0),
      (4.0, true, 0.0), (5.0, false, 1.0)).toDF("t", "e", "x")
    val m = Survival.coxPH(df, "t", "e", Seq("x"), iters = 4)
    assert(math.abs(m.beta(0) - (-0.8341151943524)) < 1e-9)
    assert(math.abs(m.hazardRatio(0) - 0.4342585459) < 1e-9)
    assert(math.abs(m.se(0) - 1.2299238878) < 1e-8)
    assert(math.abs(m.logLik - (-3.4433216380689)) < 1e-9)
    assert(math.abs(m.logLik0 - (-3.6888794541139)) < 1e-9)
    assert(m.n == 5L && m.nEvents == 3L)
    val out = m.toDf(spark).head()
    assert(out.getAs[String]("feature") == "x")
    assert(math.abs(out.getAs[Double]("z_stat") -
      (-0.8341151943524 / 1.2299238878)) < 1e-8)
  }

  test("baselineHazard accumulates Breslow increments at the fitted beta") {
    import spark.implicits._
    // same fit as the MLE test: e^β = 0.434259; H₀ increments
    // 1/(3e^β+2), 1/(2e^β+2), 1/(1+e^β) at t = 1, 2, 4
    val df = Seq((1.0, true, 1.0), (2.0, true, 0.0), (3.0, false, 1.0),
      (4.0, true, 0.0), (5.0, false, 1.0)).toDF("t", "e", "x")
    val m = Survival.coxPH(df, "t", "e", Seq("x"), iters = 4)
    val curve = Survival.baselineHazard(df, "t", "e", m)
      .orderBy("t").collect()
    assert(curve.map(_.getAs[Double]("t")).toSeq == Seq(1.0, 2.0, 4.0))
    val h0 = curve.map(_.getAs[Double]("h0"))
    assert(math.abs(h0(0) - 0.302776) < 1e-6)
    assert(math.abs(h0(1) - 0.651388) < 1e-6)
    assert(math.abs(h0(2) - 1.348612) < 1e-6)
    assert(math.abs(curve(2).getAs[Double]("s0") - 0.2596) < 1e-6)
    assert(curve.map(_.getAs[Long]("n_event")).toSeq == Seq(1L, 1L, 1L))
  }

  test("coxPHEfron equals coxPH tie-free, matches the pinned tied fit") {
    import spark.implicits._
    // tie-free: every phi_r loop has d = 1, so Efron IS Breslow —
    // the whole Newton trajectory must agree to fold-order ULPs
    val free = Seq((1.0, true, 1.0), (2.0, true, 0.0), (3.0, false, 1.0),
      (4.0, true, 0.0), (5.0, false, 1.0), (6.0, true, 1.0),
      (7.0, false, 0.0)).toDF("t", "e", "x")
    val mb = Survival.coxPH(free, "t", "e", Seq("x"), iters = 4)
    val me = Survival.coxPHEfron(free, "t", "e", Seq("x"), iters = 4)
    assert(math.abs(mb.beta(0) - me.beta(0)) < 1e-9)
    assert(math.abs(mb.se(0) - me.se(0)) < 1e-9)
    assert(math.abs(mb.logLik - me.logLik) < 1e-9)
    assert(mb.nEvents == me.nEvents && mb.n == me.n)
    // heavy-tie fixture pinned against an independent Efron
    // implementation (3 Newton steps from 0; also the converged MLE
    // to 6 decimals): beta 0.260453, se 0.732457, ll -14.953,
    // ll0 -15.0174 — R's coxph default ties=efron semantics
    val tied = Seq((1.0, true, 0.0), (1.0, true, 1.0), (2.0, true, 1.0),
      (2.0, true, 1.0), (2.0, false, 0.0), (3.0, true, 0.0),
      (3.0, false, 1.0), (4.0, true, 1.0), (5.0, false, 0.0),
      (5.0, true, 1.0), (6.0, true, 0.0), (7.0, false, 1.0))
      .toDF("t", "e", "x")
    val mt = Survival.coxPHEfron(tied, "t", "e", Seq("x"), iters = 3)
    assert(math.abs(mt.beta(0) - 0.260453) < 1e-6)
    assert(math.abs(mt.se(0) - 0.732457) < 1e-6)
    assert(math.abs(mt.logLik - (-14.953)) < 1e-3)
    assert(math.abs(mt.logLik0 - (-15.0174)) < 1e-3)
    // Breslow on the same ties lands elsewhere — the correction is real
    val mtb = Survival.coxPH(tied, "t", "e", Seq("x"), iters = 3)
    assert(math.abs(mtb.beta(0) - mt.beta(0)) > 1e-3)
  }

  test("coxPH solves the two-covariate system (Gram path)") {
    import spark.implicits._
    // independently Newton-iterated by hand: β = (−1.26753618,
    // 0.72548918), SE = (1.23709755, 1.46711281)
    val df = Seq((1.0, true, 1.0, 0.5), (2.0, true, 0.0, 1.0),
      (3.0, false, 1.0, 0.0), (4.0, true, 0.0, 0.25),
      (5.0, false, 1.0, 1.0), (6.0, true, 1.0, 0.0))
      .toDF("t", "e", "x1", "x2")
    val m = Survival.coxPH(df, "t", "e", Seq("x1", "x2"), iters = 6)
    assert(math.abs(m.beta(0) - (-1.2675361757)) < 1e-8)
    assert(math.abs(m.beta(1) - 0.7254891791) < 1e-8)
    assert(math.abs(m.se(0) - 1.2370975508) < 1e-8)
    assert(math.abs(m.se(1) - 1.4671128140) < 1e-8)
    assert(m.n == 6L && m.nEvents == 4L)
  }

  test("coxPH score step at β = 0 equals the log-rank statistic " +
       "on a binary covariate with unique event times") {
    import spark.implicits._
    // with x ∈ {0,1}, d(t) = 1 everywhere: U(0)²/I(0) = log-rank X²
    // (the classical score-test identity — ties would break it via the
    // (n−d)/(n−1) factor, so times are all distinct here)
    val rows = Seq(
      ("a", 1.0, true), ("a", 3.0, true), ("a", 6.0, false),
      ("b", 2.0, true), ("b", 4.0, true), ("b", 5.0, false))
    val lr = Survival.logRank(rows.toDF("cohort", "t", "e"),
      "t", "e", "cohort").head()
    val cox = rows.map { case (g, t, e) =>
      (t, e, if (g == "a") 1.0 else 0.0) }.toDF("t", "e", "x")
    // one Newton step from 0 is U(0)/I(0); rebuild X² = U·Δβ... instead
    // assert via the fitted trajectory: ll0 and the score-test identity
    // computed directly from the cells
    val m1 = Survival.coxPH(cox, "t", "e", Seq("x"), iters = 1)
    // β₁ = U/I, so U²/I = β₁·U; recover U from β₁·I is circular — use
    // the analytic values instead: risk sets are small enough to check
    // U(0) and I(0) by hand: U = Σ [x_event − n_a/n], I = Σ (n_a/n)(n_b/n)
    val times = Seq(1.0, 2.0, 3.0, 4.0)
    val atRisk = times.map(t => rows.filter(_._2 >= t))
    val u0 = Seq(1.0, 0.0, 1.0, 0.0).zip(atRisk).map { case (x, rs) =>
      x - rs.count(_._1 == "a").toDouble / rs.size
    }.sum
    val i0 = atRisk.map { rs =>
      val pa = rs.count(_._1 == "a").toDouble / rs.size
      pa * (1.0 - pa)
    }.sum
    assert(math.abs(m1.beta(0) - u0 / i0) < 1e-12)
    assert(math.abs(u0 * u0 / i0 - lr.getAs[Double]("chi2")) < 1e-5)
  }

  test("energyDistance matches the hand-computed four-point example") {
    import spark.implicits._
    // A = {0,2}, B = {1,3}: E|XY| = (1+3+1+1)/4 = 1.5,
    // E|XX'| = 2·2/4 = 1, E|YY'| = 1 → D² = 2·1.5 − 2 = 1, D = 1
    val df = Seq(("a", 0.0), ("a", 2.0), ("b", 1.0), ("b", 3.0))
      .toDF("cohort", "v")
    val r = StatTests.energyDistance(df, "cohort", "v").head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(math.abs(r.getAs[Double]("e_cross") - 1.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("e_within_a") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("e_within_b") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("energy_dist") - 1.0) < 1e-9)
    // identical samples → zero distance
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("cohort", "v")
    val r2 = StatTests.energyDistance(same, "cohort", "v").head()
    assert(r2.getAs[Double]("energy_dist") == 0.0)
  }

  test("moodMedianTest matches the hand-computed three-cohort example") {
    import spark.implicits._
    // pooled = 1..9, quantile_disc(0.5) = 5; above: a 0, b 1, c 3 → χ² = 6.3
    val df = (Seq(1, 2, 3).map(("a", _)) ++ Seq(4, 5, 6).map(("b", _)) ++
      Seq(7, 8, 9).map(("c", _))).toDF("cohort", "v")
    val r = StatTests.moodMedianTest(df, "cohort", "v").head()
    assert(r.getAs[Double]("median") == 5.0)
    assert(math.abs(r.getAs[Double]("chi2") - 6.3) < 1e-9)
    assert(r.getAs[Long]("dof") == 2L)
    // df=2: p = exp(−χ²/2) = exp(−3.15)
    assert(math.abs(r.getAs[Double]("p_value") - math.exp(-3.15)) < 1e-5)
    assert(r.getAs[Long]("n") == 9L && r.getAs[Long]("k") == 3L)
  }

  test("fisherExact reproduces the tea-tasting 2x2") {
    import spark.implicits._
    // a=3 b=1 c=1 d=3: hypergeom(8,4,4) pmfs {1,16,36,16,1}/70,
    // two-sided p = 34/70; OR = 9
    val rows = Seq.fill(3)((true, true)) ++ Seq.fill(1)((true, false)) ++
      Seq.fill(1)((false, true)) ++ Seq.fill(3)((false, false))
    val df = rows.toDF("fa", "fb")
    val r = StatTests.fisherExact(df, "fa", "fb").head()
    assert(r.getAs[Long]("a") == 3L && r.getAs[Long]("b") == 1L)
    assert(r.getAs[Long]("c") == 1L && r.getAs[Long]("d") == 3L)
    assert(math.abs(r.getAs[Double]("p_value") - 34.0 / 70.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("odds_ratio") - 9.0) < 1e-9)
    // a zero off-diagonal cell → null odds ratio, p still defined
    val oneSided = (Seq.fill(4)((true, true)) ++
      Seq.fill(4)((false, false))).toDF("fa", "fb")
    val r2 = StatTests.fisherExact(oneSided, "fa", "fb").head()
    assert(r2.isNullAt(r2.fieldIndex("odds_ratio")))
    // p = 2/70 (both extreme tables)
    assert(math.abs(r2.getAs[Double]("p_value") - 2.0 / 70.0) < 1e-6)
  }

  test("friedmanTest matches the textbook and tied examples") {
    import spark.implicits._
    // three identically-ordered blocks: R = (3,6,9) → χ² = 6 (textbook
    // 12/(bk(k+1))·ΣR² − 3b(k+1) gives the same), p = exp(−3)
    val df = (for { b <- 1 to 3; (t, v) <- Seq(("t1", 1.0), ("t2", 2.0),
      ("t3", 3.0)) } yield (b, t, v)).toDF("subj", "treat", "v")
    val r = StatTests.friedmanTest(df, "subj", "treat", "v",
      Seq("t1", "t2", "t3")).head()
    assert(math.abs(r.getAs[Double]("chi2") - 6.0) < 1e-9)
    assert(r.getAs[Long]("dof") == 2L)
    assert(math.abs(r.getAs[Double]("p_value") - math.exp(-3.0)) < 1e-5)
    assert(r.getAs[Long]("n_subjects") == 3L)
    // ties: block (1,1,2) ranks (1.5,1.5,3) + block (1,2,3) →
    // R = (2.5,3.5,6), num = 2·6.5 = 13, den = 1.5+2 = 3.5
    val tied = Seq((1, "t1", 1.0), (1, "t2", 1.0), (1, "t3", 2.0),
      (2, "t1", 1.0), (2, "t2", 2.0), (2, "t3", 3.0))
      .toDF("subj", "treat", "v")
    val rt = StatTests.friedmanTest(tied, "subj", "treat", "v",
      Seq("t1", "t2", "t3")).head()
    assert(math.abs(rt.getAs[Double]("chi2") - 13.0 / 3.5) < 1e-6)
    // an incomplete block is excluded and counted
    val inc = (Seq((1, "t1", 1.0), (1, "t2", 2.0), (1, "t3", 3.0),
      (2, "t1", 1.0))).toDF("subj", "treat", "v")
    val ri = StatTests.friedmanTest(inc, "subj", "treat", "v",
      Seq("t1", "t2", "t3")).head()
    assert(ri.getAs[Long]("n_subjects") == 1L)
    assert(ri.getAs[Long]("n_incomplete") == 1L)
  }

  test("cochranQ matches the hand-computed 4-subject example") {
    import spark.implicits._
    // outcomes per subject over t1..t3: (1,1,0),(1,0,0),(1,1,1),(0,0,0)
    // T = (3,2,1), B = 6, ΣR² = 14 → Q = 3·2·2/(18−14) = 3, df 2
    val df = Seq(
      (1, "t1", true), (1, "t2", true), (1, "t3", false),
      (2, "t1", true), (2, "t2", false), (2, "t3", false),
      (3, "t1", true), (3, "t2", true), (3, "t3", true),
      (4, "t1", false), (4, "t2", false), (4, "t3", false),
      (5, "t1", true)) // incomplete block — excluded
      .toDF("subj", "treat", "y")
    val r = StatTests.cochranQ(df, "subj", "treat", "y",
      Seq("t1", "t2", "t3")).head()
    assert(math.abs(r.getAs[Double]("q_stat") - 3.0) < 1e-9)
    assert(r.getAs[Long]("dof") == 2L)
    assert(math.abs(r.getAs[Double]("p_value") - math.exp(-1.5)) < 1e-5)
    assert(r.getAs[Long]("n_subjects") == 4L)
    assert(r.getAs[Long]("n_incomplete") == 1L)
  }

  test("mantelHaenszel pools the two-stratum example to OR 2.0") {
    import spark.implicits._
    // stratum 1: (4,1,1,4) → R=1.6 S=0.1; stratum 2: (2,3,3,2) →
    // R=0.4 S=0.9; OR_MH = 2.0/1.0 = 2; CMH dev = 1.5−0.5 = 1,
    // var = 2·(625/900) → χ² = 0.72
    def stratum(s: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, "a", true)) ++ Seq.fill(b)((s, "a", false)) ++
      Seq.fill(c)((s, "b", true)) ++ Seq.fill(d)((s, "b", false))
    val df = (stratum("s1", 4, 1, 1, 4) ++ stratum("s2", 2, 3, 3, 2))
      .toDF("stratum", "cohort", "y")
    val r = Experiments.mantelHaenszel(df, "cohort", "y",
      Seq("stratum")).head()
    assert(math.abs(r.getAs[Double]("or_mh") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("chi2_cmh") - 0.72) < 1e-6)
    assert(r.getAs[Long]("n_strata") == 2L && r.getAs[Long]("n") == 20L)
    assert(r.getAs[Double]("or_lo") < 2.0 && r.getAs[Double]("or_hi") > 2.0)
  }

  test("sbgRetention recovers a homogeneous-geometric churn rate") {
    import spark.implicits._
    // lifetimes with exact halving: 8×L0, 4×L1, 2×L2, 1×L3, 1×L4
    // (censored at horizon 4) — each period half the survivors churn,
    // so the fitted mean one-period churn must sit near 0.5
    val rows = (
      (1 to 8).map(u => (u.toLong, Seq(0L))) ++
      (9 to 12).map(u => (u.toLong, Seq(0L, 1L))) ++
      (13 to 14).map(u => (u.toLong, Seq(0L, 2L))) ++
      Seq((15L, Seq(0L, 3L)), (16L, Seq(0L, 4L)))
    ).flatMap { case (u, ps) => ps.map(p => (u, p * 100L)) }
    val df = rows.toDF("user", "ts")
    val r = Cohorts.sbgRetention(df, "user", "ts", periodNanos = 100L)
      .head()
    assert(r.getAs[Long]("n_users") == 16L)
    assert(r.getAs[Long]("n_censored") == 1L)
    assert(r.getAs[Long]("n_churned") == 15L)
    assert(r.getAs[Long]("horizon") == 4L)
    val mc = r.getAs[Double]("mean_churn")
    assert(mc > 0.4 && mc < 0.6, s"mean churn $mc should be near 0.5")
    // the grid argmax really is an argmax: perturbing either parameter
    // by one grid step cannot improve the reported log-likelihood
    val alpha = r.getAs[Double]("alpha"); val beta = r.getAs[Double]("beta")
    val ll = r.getAs[Double]("ll")
    def lnB(a: Double, b: Double) = SpecialMath.lgamma(a) +
      SpecialMath.lgamma(b) - SpecialMath.lgamma(a + b)
    def llAt(a: Double, b: Double): Double = {
      val deaths = Seq((1L, 8L), (2L, 4L), (3L, 2L), (4L, 1L))
      deaths.map { case (t, d) =>
        d * (lnB(a + 1.0, b + t - 1.0) - lnB(a, b)) }.sum +
        1.0 * (lnB(a, b + 4.0) - lnB(a, b))
    }
    assert(math.abs(llAt(alpha, beta) - ll) < 1e-4)
    // in-grid neighbors can't beat the argmax (homogeneous data pushes
    // the MLE toward the α,β→∞ boundary, so only probe INSIDE the grid)
    Seq((alpha - 0.1, beta), (alpha, beta - 0.1),
        (alpha + 0.1, beta), (alpha, beta + 0.1))
      .filter { case (a, b) => a >= 0.1 && b >= 0.1 && a <= 8.0 && b <= 8.0 }
      .foreach { case (a, b) => assert(llAt(a, b) <= ll + 1e-9) }
  }

  test("wilcoxonSignedRank matches the hand-computed tied example") {
    import spark.implicits._
    // d = [-1,1,-2,1,-2,-2,1,-2]: |d| ties at 1 (×4, midrank 2.5) and
    // 2 (×4, midrank 6.5) → W+ = 3·2.5 = 7.5; Σ(t³−t) = 2·(4³−4) =
    // 120 → σ² = 51 − 120/48 = 48.5
    val df = Seq((1.0, 2.0), (2.0, 1.0), (3.0, 5.0), (4.0, 3.0),
      (5.0, 7.0), (6.0, 8.0), (7.0, 6.0), (8.0, 10.0)).toDF("a", "b")
    val r = StatTests.wilcoxonSignedRank(df, "a", "b").head()
    assert(r.getAs[Long]("n") == 8L && r.getAs[Long]("n_zero") == 0L)
    assert(r.getAs[Double]("w_plus") == 7.5)
    assert(math.abs(r.getAs[Double]("z") - -1.435916) < 1e-5)
    assert(math.abs(r.getAs[Double]("p_value") - 0.151026) < 1e-5)
  }

  test("signTest counts signs and applies the continuity correction") {
    import spark.implicits._
    val df = Seq((1.0, 2.0), (2.0, 1.0), (3.0, 5.0), (4.0, 3.0),
      (5.0, 7.0), (6.0, 8.0), (7.0, 6.0), (8.0, 10.0), (9.0, 9.0))
      .toDF("a", "b")
    val r = StatTests.signTest(df, "a", "b").head()
    assert(r.getAs[Long]("n_pos") == 3L && r.getAs[Long]("n_neg") == 5L)
    assert(r.getAs[Long]("n_zero") == 1L)
    // z = (3 − 4 + 0.5)/√2 = −0.353553 (corrects TOWARD the null)
    assert(math.abs(r.getAs[Double]("z") - -0.353553) < 1e-5)
    assert(math.abs(r.getAs[Double]("p_value") - 0.723674) < 1e-4)
  }

  test("bartlettTest matches the hand-computed three-group example") {
    import spark.implicits._
    val df = (Seq(1.0, 2, 3, 4, 5).map(("x", _)) ++
      Seq(2.0, 4, 6, 7, 9).map(("y", _)) ++
      Seq(3.0, 5, 8, 9, 12).map(("z", _))).toDF("g", "v")
    val r = StatTests.bartlettTest(df, "g", "v").head()
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("n") == 15L)
    assert(math.abs(r.getAs[Double]("t_stat") - 2.077674) < 1e-5)
    assert(r.getAs[Long]("dof") == 2L)
    // df = 2 → p = exp(−T/2)
    assert(math.abs(r.getAs[Double]("p_value") - 0.353866) < 1e-5)
  }

  test("cliffsDelta: exact pair counts and magnitude band") {
    import spark.implicits._
    // a = {1,2,3}, b = {2,3,4}: gt = 1, lt = 6, ties = 2 → δ = −5/9
    val df = (Seq(1, 2, 3).map(("a", _)) ++ Seq(2, 3, 4).map(("b", _)))
      .toDF("cohort", "v")
    val r = StatTests.cliffsDelta(df, "cohort", "v").head()
    assert(r.getAs[Long]("n_gt") == 1L && r.getAs[Long]("n_lt") == 6L)
    assert(r.getAs[Long]("n_tie") == 2L)
    assert(math.abs(r.getAs[Double]("delta") - -0.555556) < 1e-5)
    assert(r.getAs[String]("magnitude") == "large")
  }

  test("concordanceIndex: censored subjects open no pairs, ties score half") {
    import spark.implicits._
    // events at t=1 (s=.9 and s=.5), censored t=2 (s=.5), event t=3
    // (s=.5): comparable = 4, concordant = 2 (the .9 wins), tied = 2
    val df = Seq((1.0, true, 0.9), (1.0, true, 0.5), (2.0, false, 0.5),
      (3.0, true, 0.5)).toDF("t", "ev", "sc")
    val r = Survival.concordanceIndex(df, "t", "ev", "sc").head()
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("n_comparable") == 4L)
    assert(r.getAs[Long]("n_concordant") == 2L)
    assert(r.getAs[Long]("n_tied_score") == 2L)
    assert(math.abs(r.getAs[Double]("c_index") - 0.75) < 1e-9)
    assert(math.abs(r.getAs[Double]("somers_d") - 0.5) < 1e-9)
  }

  test("pageTrend: a perfect monotone funnel maxes L") {
    import spark.implicits._
    // 4 complete blocks, each strictly increasing a < b < c:
    // R = (4, 8, 12), L = 56, E = 48, Var = 8 → z = 2.828427
    val df = (1 to 4).flatMap(u => Seq((u.toLong, "a", 1.0 * u),
      (u.toLong, "b", 2.0 * u), (u.toLong, "c", 3.0 * u)))
      .toDF("blk", "trt", "v")
    val r = StatTests.pageTrend(df, "blk", "trt", "v",
      Seq("a", "b", "c")).head()
    assert(r.getAs[Double]("l_stat") == 56.0)
    assert(math.abs(r.getAs[Double]("z") - 2.828427) < 1e-5)
    assert(math.abs(r.getAs[Double]("p_value") - 0.004678) < 1e-5)
    assert(r.getAs[Long]("n_blocks") == 4L)
    assert(r.getAs[Long]("n_incomplete") == 0L)
  }

  test("kendallW: perfect concordance gives W = 1") {
    import spark.implicits._
    val df = (1 to 4).flatMap(u => Seq((u.toLong, "a", 1.0 * u),
      (u.toLong, "b", 2.0 * u), (u.toLong, "c", 3.0 * u)))
      .toDF("blk", "item", "v")
    val r = StatTests.kendallW(df, "blk", "item", "v",
      Seq("a", "b", "c")).head()
    assert(r.getAs[Double]("w") == 1.0)
    assert(math.abs(r.getAs[Double]("chi2") - 8.0) < 1e-9)
    // df = 2 → p = exp(−4)
    assert(math.abs(r.getAs[Double]("p_value") - 0.018316) < 1e-5)
  }

  test("distanceCorrCells: functional dependence gives dCor = 1") {
    import spark.implicits._
    val dep = (1 to 4).flatMap(i => Seq.fill(i)((i.toDouble, i.toDouble)))
      .toDF("x", "y")
    val r = StatTests.distanceCorrCells(dep, "x", "y").head()
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("n_cells") == 4L)
    assert(math.abs(r.getAs[Double]("dcor") - 1.0) < 1e-9)
    assert(r.getAs[Double]("dcov2") == r.getAs[Double]("dvar_x"))
    // a noise-free orthogonal grid still has finite-sample dCov > 0,
    // but far below the functional case
    val ind = (for { i <- 1 to 4; j <- 1 to 4 }
      yield (i.toDouble, j.toDouble)).toDF("x", "y")
    val r2 = StatTests.distanceCorrCells(ind, "x", "y").head()
    assert(r2.getAs[Double]("dcor") < 0.25)
  }

  test("ivWald recovers the hand-computed Wald ratio and first-stage F") {
    import spark.implicits._
    val df = Seq((true, 1.0, 5.0), (true, 1.0, 5.0), (true, 0.0, 3.0),
      (true, 0.0, 3.0), (false, 1.0, 4.0), (false, 0.0, 2.0),
      (false, 0.0, 2.0), (false, 0.0, 2.0)).toDF("z", "d", "y")
    val r = Experiments.ivWald(df, "z", "d", "y").head()
    assert(r.getAs[Long]("n1") == 4L && r.getAs[Long]("n0") == 4L)
    assert(math.abs(r.getAs[Double]("itt") - 1.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("first_stage") - 0.25) < 1e-9)
    assert(math.abs(r.getAs[Double]("beta_iv") - 6.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("first_stage_f") - 0.428571) < 1e-5)
  }

  test("rddEstimate measures the jump AT the cutoff, not the mean gap") {
    import spark.implicits._
    // left: y = x − 10 (15 at the cutoff); right: y = 2x + 50
    // (100 at the cutoff) → effect 85, NOT mean(right) − mean(left)
    val df = Seq((20.0, 10.0), (22.0, 12.0), (24.0, 14.0),
      (25.0, 100.0), (27.0, 104.0), (29.0, 108.0)).toDF("x", "y")
    val r = Experiments.rddEstimate(df, "x", "y", cutoff = 25.0,
      bandwidth = 15.0).head()
    assert(r.getAs[Long]("n_left") == 3L && r.getAs[Long]("n_right") == 3L)
    assert(math.abs(r.getAs[Double]("intercept_left") - 15.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept_right") - 100.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("slope_left") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("slope_right") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("effect") - 85.0) < 1e-9)
  }

  test("vuongTest prefers the true generating family") {
    import spark.implicits._
    // exact lognormal quantile-ish sample: exp of a symmetric grid —
    // lognorm must beat norm significantly; flipped order flips z
    val vals = (-20 to 20).map(i => math.exp(i * 0.25))
    val df = vals.toDF("x")
    val r = StatTests.vuongTest(df, "x", "lognorm", "norm").head()
    assert(r.getAs[Long]("n") == 41L)
    assert(r.getAs[Double]("z") > 0.0)
    assert(r.getAs[String]("preferred") == "lognorm")
    val r2 = StatTests.vuongTest(df, "x", "norm", "lognorm").head()
    assert(r2.getAs[Double]("z") == -r.getAs[Double]("z"))
    assert(r2.getAs[String]("preferred") == "lognorm")
    assert(r2.getAs[Double]("p_value") == r.getAs[Double]("p_value"))
  }

  test("permutationTest: exact observed diff, deterministic p") {
    import spark.implicits._
    val df = Seq((1L, "a", 10.0), (2L, "a", 10.0), (3L, "b", 0.0),
      (4L, "b", 0.0)).toDF("id", "g", "v")
    val r1 = Experiments.permutationTest(df, "id", "g", "v",
      k = 50).head()
    assert(math.abs(r1.getAs[Double]("diff_obs") - 10.0) < 1e-9)
    assert(r1.getAs[Long]("n_a") == 2L && r1.getAs[Long]("n_b") == 2L)
    val p1 = r1.getAs[Double]("p_value")
    assert(p1 > 0.0 && p1 <= 1.0)
    // md5-keyed: the same inputs give the same p, run to run
    val r2 = Experiments.permutationTest(df, "id", "g", "v",
      k = 50).head()
    assert(r2.getAs[Double]("p_value") == p1)
    assert(r2.getAs[Long]("n_ge") == r1.getAs[Long]("n_ge"))
    // n = 2: every draw is either degenerate (counted as an
    // exceedance, conservatively) or splits 1/1 with |Δ| = |Δ_obs| —
    // so p must be exactly 1, not deflated by dropped draws
    val tiny = Seq((1L, "a", 5.0), (2L, "b", 1.0)).toDF("id", "g", "v")
    val r3 = Experiments.permutationTest(tiny, "id", "g", "v",
      k = 50).head()
    assert(r3.getAs[Double]("p_value") == 1.0)
  }

  test("psmAtt: exact-cell match, nearest fallback, lower-cell ties") {
    import spark.implicits._
    val df = Seq(
      (true, 0.1, 10.0), (true, 0.3, 20.0),
      (false, 0.1, 5.0), (false, 0.1, 5.0), (false, 0.25, 8.0))
      .toDF("t", "s", "y")
    val r = Experiments.psmAtt(df, "t", "s", "y").head()
    assert(r.getAs[Long]("n_treated") == 2L)
    assert(r.getAs[Long]("n_control") == 3L)
    assert(r.getAs[Long]("n_cells") == 2L)
    // 0.1 matches its own cell (gap 5); 0.3 → nearest 0.25 (gap 12)
    assert(math.abs(r.getAs[Double]("att") - 8.5) < 1e-9)
    // an equidistant treated score matches the LOWER cell (0.25/0.75
    // around 0.5 — binary-exact quarters so the tie is a true tie)
    val tie = Seq((true, 0.5, 10.0), (false, 0.25, 1.0),
      (false, 0.75, 7.0)).toDF("t", "s", "y")
    val t = Experiments.psmAtt(tie, "t", "s", "y").head()
    assert(math.abs(t.getAs[Double]("att") - 9.0) < 1e-9)
  }

  test("jonckheereTerpstra matches the hand-computed ordered example") {
    import spark.implicits._
    // g1=[1,2,3] < g2=[2,3,4] < g3=[4,5,6]: J = 24.5 (ties at ½),
    // mean = 13.5, var = 20.25 → z = (24.5 − 13.5 − 0.5)/4.5 = 2.333333
    val df = (Seq(1.0, 2, 3).map(("g1", _)) ++
      Seq(2.0, 3, 4).map(("g2", _)) ++
      Seq(4.0, 5, 6).map(("g3", _))).toDF("lvl", "v")
    val r = StatTests.jonckheereTerpstra(df, "lvl", "v",
      Seq("g1", "g2", "g3")).head()
    assert(r.getAs[Double]("j_stat") == 24.5)
    assert(math.abs(r.getAs[Double]("z") - 2.333333) < 1e-5)
    assert(math.abs(r.getAs[Double]("p_value") - 0.019631) < 1e-5)
    assert(r.getAs[Long]("n") == 9L && r.getAs[Long]("k") == 3L)
  }

  test("hotellingT2: axis-separated clouds fire, identical clouds don't") {
    import spark.implicits._
    // cohort b shifted by (2, 0) with identity-ish scatter: T² large.
    // hand check: d = (-2, 0), pooled S = I·(2/3)·(8/6)... the exact
    // value is pinned by construction below
    val a = Seq((0.0, 0.0), (1.0, 0.0), (-1.0, 0.0), (0.0, 1.0),
      (0.0, -1.0)).map { case (x, y) => ("a", x, y) }
    val b = Seq((2.0, 0.0), (3.0, 0.0), (1.0, 0.0), (2.0, 1.0),
      (2.0, -1.0)).map { case (x, y) => ("b", x, y) }
    val df = (a ++ b).toDF("g", "x", "y")
    val r = StatTests.hotellingT2(df, "g", "x", "y").head()
    assert(r.getAs[Long]("n_a") == 5L && r.getAs[Long]("n_b") == 5L)
    assert(r.getAs[Double]("d1") == -2.0 && r.getAs[Double]("d2") == 0.0)
    // S11 = S22 = (2+2)/8 = 0.5, S12 = 0 → T² = 2.5·(4/0.5) = 20
    assert(math.abs(r.getAs[Double]("t2") - 20.0) < 1e-9)
    assert(r.getAs[Double]("p_value") < 0.02)
    // identical clouds: T² = 0, p = 1
    val same = (a ++ a.map { case (_, x, y) => ("b", x, y) })
      .toDF("g", "x", "y")
    val r0 = StatTests.hotellingT2(same, "g", "x", "y").head()
    assert(r0.getAs[Double]("t2") == 0.0)
    assert(r0.getAs[Double]("p_value") == 1.0)
  }

  test("brunnerMunzel/cucconi/lepage match the independent references") {
    import spark.implicits._
    // fixture with ties in both samples; references computed with a
    // standalone midrank implementation (BM agrees with R lawstat /
    // scipy's brunnermunzel on tie-free data by construction)
    val a = Seq(1.0, 2, 2, 3, 4, 5, 5, 6, 7, 8)
    val b = Seq(2.0, 3, 3, 4, 5, 6, 7, 7, 8, 9, 10, 11)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    val bm = StatTests.brunnerMunzel(df, "g", "v").head()
    assert(bm.getAs[Long]("n_a") == 10L && bm.getAs[Long]("n_b") == 12L)
    assert(math.abs(bm.getAs[Double]("p_hat") - 0.695833) < 2e-6)
    assert(math.abs(bm.getAs[Double]("w") - 1.717308) < 2e-6)
    assert(math.abs(bm.getAs[Double]("df") - 19.999719) < 2e-6)
    val cu = StatTests.cucconiTest(df, "g", "v").head()
    assert(math.abs(cu.getAs[Double]("u") - 1.574995) < 2e-6)
    assert(math.abs(cu.getAs[Double]("v") - (-1.434408)) < 2e-6)
    assert(math.abs(cu.getAs[Double]("c") - 1.243856) < 2e-6)
    assert(math.abs(cu.getAs[Double]("p_value") - 0.28827) < 2e-6 * 10)
    val le = StatTests.lepageTest(df, "g", "v").head()
    assert(le.getAs[Double]("w_stat") == 91.5)
    assert(le.getAs[Double]("ab_stat") == 64.5)
    assert(math.abs(le.getAs[Double]("z_w") - (-1.557924)) < 2e-6)
    assert(math.abs(le.getAs[Double]("z_ab") - 0.533403) < 2e-6)
    assert(math.abs(le.getAs[Double]("d") - 2.711645) < 2e-6)
    assert(math.abs(le.getAs[Double]("p_value") - 0.257735) < 2e-6 * 10)
    // identical samples: all three must read null-ish
    val same = (a.map(("a", _)) ++ a.map(("b", _))).toDF("g", "v")
    assert(math.abs(StatTests.brunnerMunzel(same, "g", "v").head()
      .getAs[Double]("p_hat") - 0.5) < 1e-9)
    assert(StatTests.lepageTest(same, "g", "v").head()
      .getAs[Double]("p_value") > 0.9)
  }

  test("c2stLogistic separates shifted slices, clears identical ones") {
    import spark.implicits._
    // well-separated: A around 100, B around 0 — the classifier must
    // reach near-perfect accuracy and a tiny p
    val a = (0 until 200).map(i => 100.0 + (i % 10)).toDF("v")
    val b = (0 until 200).map(i => 0.0 + (i % 10)).toDF("v")
    val sep = StatTests.c2stLogistic(a, b, Seq("v"), iters = 6).head()
    assert(sep.getAs[Long]("n") == 400L)
    assert(sep.getAs[Double]("accuracy") > 0.99)
    assert(sep.getAs[Double]("p_value") < 1e-6)
    // identical slices: accuracy must hug 1/2 and p stay large
    val same = StatTests.c2stLogistic(a, a, Seq("v"), iters = 6).head()
    assert(math.abs(same.getAs[Double]("accuracy") - 0.5) < 0.05)
    assert(same.getAs[Double]("p_value") > 0.01)
    // imbalanced identical slices (3:1): the intercept alone reaches
    // 0.75 accuracy — the majority-class baseline must absorb it, not
    // flag a phantom difference (the old ½ baseline would report p≈0)
    val a3 = (0 until 600).map(i => 100.0 + (i % 10)).toDF("v")
    val b1 = (0 until 200).map(i => 100.0 + (i % 10)).toDF("v")
    val imb = StatTests.c2stLogistic(a3, b1, Seq("v"), iters = 6).head()
    assert(imb.getAs[Double]("accuracy") >= 0.70)
    assert(imb.getAs[Double]("p_value") > 0.01)
    // β on the 1e-6 replay grid
    assert(sep.getAs[Double]("b1") ==
      math.rint(sep.getAs[Double]("b1") * 1e6) / 1e6)
  }

  test("shapiroWilk: accepts normal-ish, rejects exponential, " +
    "affine-invariant, and agrees with an independent probit") {
    import spark.implicits._
    val n = 40
    // near-normal: the normal quantile grid itself (Blom positions)
    val normish = (1 to n).map(i =>
      new org.apache.commons.math3.distribution.NormalDistribution(
        null, 0.0, 1.0)
        .inverseCumulativeProbability((i - 0.375) / (n + 0.25)))
    val rNorm = StatTests.shapiroWilk(normish.toDF("v"), "v").head()
    assert(rNorm.getAs[Long]("n") == n.toLong)
    assert(rNorm.getAs[Double]("w_stat") > 0.98)
    assert(rNorm.getAs[Double]("p_value") > 0.5)
    // exponential quantile grid: decisive rejection
    val expo = (1 to n).map(i => -math.log(1.0 - (i - 0.5) / n.toDouble))
    val rExp = StatTests.shapiroWilk(expo.toDF("v"), "v").head()
    assert(rExp.getAs[Double]("w_stat") < 0.92)
    assert(rExp.getAs[Double]("p_value") < 0.01)
    // W is affine-invariant (location/scale cancel in the ratio)
    val shifted = expo.map(x => 100.0 + 3.0 * x)
    val rShift = StatTests.shapiroWilk(shifted.toDF("v"), "v").head()
    assert(math.abs(rShift.getAs[Double]("w_stat") -
      rExp.getAs[Double]("w_stat")) < 1e-5)
    // independent reimplementation: commons-math probit (a DIFFERENT
    // inverse-CDF algorithm) through the same Royston weights
    val xs = expo.sorted.toArray
    val nD = n.toDouble
    val nd = new org.apache.commons.math3.distribution.NormalDistribution(
      null, 0.0, 1.0)
    val m = (1 to n).map(i =>
      nd.inverseCumulativeProbability((i - 0.375) / (nD + 0.25))).toArray
    val sm2 = m.map(x => x * x).sum
    val rsn = 1.0 / math.sqrt(nD)
    val aN = ((((-2.706056 * rsn + 4.434685) * rsn - 2.071190) * rsn -
      0.147981) * rsn + 0.221157) * rsn + m(n - 1) / math.sqrt(sm2)
    val aN1 = ((((-3.582633 * rsn + 5.682633) * rsn - 1.752461) * rsn -
      0.293762) * rsn + 0.042981) * rsn + m(n - 2) / math.sqrt(sm2)
    val phi = (sm2 - 2.0 * m(n - 1) * m(n - 1) -
      2.0 * m(n - 2) * m(n - 2)) /
      (1.0 - 2.0 * aN * aN - 2.0 * aN1 * aN1)
    val a = Array.tabulate(n) { j =>
      if (j == 0) -aN else if (j == 1) -aN1
      else if (j == n - 1) aN else if (j == n - 2) aN1
      else m(j) / math.sqrt(phi)
    }
    val xbar = xs.sum / nD
    val wRef = math.pow(a.zip(xs).map { case (ai, xi) => ai * xi }.sum, 2) /
      xs.map(x => (x - xbar) * (x - xbar)).sum
    assert(math.abs(rExp.getAs[Double]("w_stat") - wRef) < 1e-5)
  }

  test("adKSample: k=2 is exactly adTwoSample; separated cohorts " +
    "fire, identical cohorts don't") {
    import spark.implicits._
    val two = (Seq(1.0, 2.0, 3.0, 5.0, 7.0).map(("a", _)) ++
      Seq(2.0, 4.0, 6.0, 8.0, 9.0).map(("b", _))).toDF("g", "v")
    val r2k = StatTests.adKSample(two, "g", "v").head()
    val r2 = StatTests.adTwoSample(two, "g", "v").head()
    assert(r2k.getAs[Long]("n_cohorts") == 2L)
    assert(r2k.getAs[Double]("ad_stat") == r2.getAs[Double]("ad_stat"))
    assert(r2k.getAs[Double]("sigma") == r2.getAs[Double]("sigma"))
    assert(r2k.getAs[Double]("t_stat") == r2.getAs[Double]("t_stat"))
    // three well-separated cohorts: T far beyond the S-S threshold
    val sep = ((1 to 40).map(i => ("a", i * 0.1)) ++
      (1 to 40).map(i => ("b", 10.0 + i * 0.1)) ++
      (1 to 40).map(i => ("c", 20.0 + i * 0.1))).toDF("g", "v")
    assert(StatTests.adKSample(sep, "g", "v").head()
      .getAs[Double]("t_stat") > 5.0)
    // three identical cohorts: T small
    val same = (1 to 40).flatMap(i =>
      Seq(("a", i * 0.1), ("b", i * 0.1), ("c", i * 0.1))).toDF("g", "v")
    assert(StatTests.adKSample(same, "g", "v").head()
      .getAs[Double]("t_stat") < 1.0)
    // bounded-label contract raises loudly
    val many = (0 until 40).map(i => (s"g$i", i * 1.0)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      StatTests.adKSample(many, "g", "v")
    }
    assert(e.getMessage.contains("maxCohorts"))
  }

  test("hodgesLehmannShift matches the hand-computed weighted median " +
    "and the bounded-cells contract raises") {
    import spark.implicits._
    // a = {1,2,3}, b = {4,6}: diffs 3,5,2,4,1,3 -> sorted weighted
    // median (W=6, target 3) = 3
    val df = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(4.0, 6.0).map(("b", _))).toDF("g", "v")
    val r = StatTests.hodgesLehmannShift(df, "g", "v").head()
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("hl_shift") == 3.0)
    // shift-equivariance: adding 10 to b adds 10 to the estimate
    val df2 = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(14.0, 16.0).map(("b", _))).toDF("g", "v")
    assert(StatTests.hodgesLehmannShift(df2, "g", "v").head()
      .getAs[Double]("hl_shift") == 13.0)
    val e = intercept[IllegalArgumentException] {
      StatTests.hodgesLehmannShift(df, "g", "v", maxCellProduct = 4L)
    }
    assert(e.getMessage.contains("cells"))
  }

  test("logRankTrend: k=2 squares to the plain log-rank chi2, " +
    "ordered separation fires, identical cohorts don't") {
    import spark.implicits._
    val two = (Seq((1.0, true), (3.0, true), (5.0, false), (7.0, true))
      .map { case (t, e) => ("a", t, e) } ++
      Seq((2.0, true), (4.0, true), (6.0, true), (8.0, false))
        .map { case (t, e) => ("b", t, e) }).toDF("g", "t", "e")
    val tr = Survival.logRankTrend(two, "t", "e", "g").head()
    val lr = Survival.logRank(two, "t", "e", "g").head()
    val z = tr.getAs[Double]("z")
    assert(math.abs(z * z - lr.getAs[Double]("chi2")) < 1e-3,
      s"z^2 ${z * z} vs chi2 ${lr.getAs[Double]("chi2")}")
    // three ordered cohorts with strictly improving survival
    val sep = ((1 to 30).map(i => ("c0", i * 1.0, true)) ++
      (1 to 30).map(i => ("c1", 30.0 + i, true)) ++
      (1 to 30).map(i => ("c2", 60.0 + i, true))).toDF("g", "t", "e")
    assert(math.abs(Survival.logRankTrend(sep, "t", "e", "g").head()
      .getAs[Double]("z")) > 5.0)
    // identical cohorts: no trend
    val same = (1 to 30).flatMap(i => Seq(("c0", i * 1.0, true),
      ("c1", i * 1.0, true), ("c2", i * 1.0, true))).toDF("g", "t", "e")
    assert(math.abs(Survival.logRankTrend(same, "t", "e", "g").head()
      .getAs[Double]("z")) < 1.0)
  }

  test("shiftFunction: pure shift is flat, scale change grows with " +
    "the quantile") {
    import spark.implicits._
    // b = a + 10: every decile shift exactly 10
    val shift = ((1 to 20).map(i => ("a", i * 1.0)) ++
      (1 to 20).map(i => ("b", i + 10.0))).toDF("g", "v")
    val rs = StatTests.shiftFunction(shift, "g", "v").collect()
    assert(rs.length == 9)
    rs.foreach { r =>
      assert(r.getAs[Double]("shift") == 10.0,
        s"q=${r.getAs[Double]("quantile")} got ${r.getAs[Double]("shift")}")
    }
    // b = 2a: shift at decile q is the a-decile itself (2Q - Q = Q)
    val scale = ((1 to 20).map(i => ("a", i * 1.0)) ++
      (1 to 20).map(i => ("b", i * 2.0))).toDF("g", "v")
    val rc = StatTests.shiftFunction(scale, "g", "v").collect()
      .sortBy(_.getAs[Double]("quantile"))
    assert(rc.head.getAs[Double]("shift") <
      rc.last.getAs[Double]("shift"))
    rc.foreach { r =>
      assert(r.getAs[Double]("shift") == r.getAs[Double]("q_a"),
        s"q=${r.getAs[Double]("quantile")}")
    }
  }

  test("weibullAft recovers planted AFT parameters and censoring " +
    "shifts the fit the right way") {
    import spark.implicits._
    // planted: ln T = 1.0 + 0.05 x + 0.5 W, W standard Gumbel(min)
    // via the quantile grid w = ln(-ln(1 - u)); x cycles 0..9
    val n = 400
    val rows = (0 until n).map { i =>
      val u = (i + 0.5) / n
      val w = math.log(-math.log(1.0 - u))
      val x = (i % 10).toDouble
      (math.exp(1.0 + 0.05 * x + 0.5 * w), true, x)
    }
    val df = rows.toDF("t", "e", "x")
    val fit = Survival.weibullAft(df, "t", "e", "x").head()
    assert(fit.getAs[Long]("n") == n.toLong)
    assert(fit.getAs[Long]("n_events") == n.toLong)
    assert(math.abs(fit.getAs[Double]("icept") - 1.0) < 0.15)
    assert(math.abs(fit.getAs[Double]("slope") - 0.05) < 0.02)
    assert(math.abs(fit.getAs[Double]("sigma") - 0.5) < 0.08)
    // median at mean covariate matches the formula surface
    val med = fit.getAs[Double]("median_at_mean")
    val manual = math.exp(fit.getAs[Double]("icept") +
      fit.getAs[Double]("slope") * 4.5 +
      fit.getAs[Double]("sigma") * math.log(math.log(2.0)))
    assert(math.abs(med - manual) < 1e-5)
    // right-censor everything above the 70th percentile at that
    // threshold: estimates should stay in the same neighborhood
    // (that is the point of modeling the censoring)
    val thr = rows.map(_._1).sorted.apply((0.7 * n).toInt)
    val cens = rows.map { case (t, _, x) =>
      if (t > thr) (thr, false, x) else (t, true, x) }
    val fitC = Survival.weibullAft(cens.toDF("t", "e", "x"),
      "t", "e", "x").head()
    assert(fitC.getAs[Long]("n_events") < n.toLong)
    assert(math.abs(fitC.getAs[Double]("slope") - 0.05) < 0.04)
    assert(math.abs(fitC.getAs[Double]("sigma") - 0.5) < 0.15)
    // the codegen median surface agrees with the scalar formula
    val mcol = Survival.weibullAftMedian(1.0, 0.05, 0.5, F.col("x"))
    val got = Seq(2.0).toDF("x").select(mcol.as("m")).head().getDouble(0)
    assert(math.abs(got - math.exp(1.0 + 0.1 +
      0.5 * math.log(math.log(2.0)))) < 1e-9)
  }
}
