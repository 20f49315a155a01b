package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Probabilistic record linkage — the Fellegi–Sunter model (1969), the
  * standard behind every serious dedup/merge system: given candidate
  * pairs and boolean field-agreement indicators, estimate how likely
  * each agreement PATTERN is under "same entity" (m-probabilities) vs
  * "different entities" (u-probabilities) by EM, and score every
  * pattern with the classic log₂ match weight.
  *
  * Scale shape: the data-sized work is ONE aggregation from pairs to
  * agreement-pattern counts — at f fields that's ≤ 2^f rows (f ≤ 16
  * enforced), so the EM loop runs on the driver over a provably tiny
  * table, exactly like the k×k solves in [[Regression]]: jobs are
  * independent of the pair count, and no pair row is ever collected.
  * Fixed iterations + deterministic pattern order keep the whole
  * trajectory engine-replayable (chained-CTE oracle).
  */
object Linkage {

  /** Fit the Fellegi–Sunter model on candidate pairs.
    *
    * Initialization is pinned (p₀ = `priorP`, m_j = 0.9, u_j = 0.1 —
    * the textbook start) and `iters` EM rounds run over the pattern
    * counts; the posterior and weight are evaluated at the final
    * parameters. Null agreement values are treated as disagreement
    * (the conservative convention — an unverifiable field should not
    * vote for a match).
    *
    *   E: g(γ) = p·Π m_j^{γ_j}(1−m_j)^{1−γ_j} /
    *             (p·Πm… + (1−p)·Πu…)
    *   M: p = Σ g·c / N,  m_j = Σ g·c·γ_j / Σ g·c,
    *      u_j = Σ (1−g)·c·γ_j / Σ (1−g)·c
    *
    * @param pairs one row per candidate pair
    * @param agreementCols boolean columns (one per compared field)
    * @return one row per observed pattern: (agreementCols...,
    *         n_pairs, posterior, match_weight) — posterior = final
    *         E-step g, match_weight = log₂ of the final
    *         likelihood ratio; both rounded to 6. Sorted driver-side
    *         work is O(2^f · iters).
    */
  def fellegiSunter(pairs: DataFrame, agreementCols: Seq[String],
                    iters: Int = 5, priorP: Double = 0.1): DataFrame = {
    require(agreementCols.nonEmpty && agreementCols.length <= 16,
      "need 1..16 agreement columns")
    require(iters >= 1, "need at least one EM iteration")
    require(priorP > 0.0 && priorP < 1.0, "priorP must be in (0,1)")
    val f = agreementCols.length
    val aCols = agreementCols.map(c =>
      F.coalesce(F.col(c).cast("boolean"), F.lit(false)).as(c))
    val patterns = pairs
      .select(aCols: _*)
      .groupBy(agreementCols.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("n_pairs"))
    val rows = patterns.collect()
      .map(r => (Array.tabulate(f)(i => r.getBoolean(i)),
        r.getAs[Long]("n_pairs")))
      .sortBy(_._1.map(b => if (b) '1' else '0').mkString) // pinned order
    require(rows.nonEmpty, "no candidate pairs")
    val nTot = rows.map(_._2).sum.toDouble
    var p = priorP
    var m = Array.fill(f)(0.9)
    var u = Array.fill(f)(0.1)
    def lik(a: Array[Boolean], q: Array[Double]): Double = {
      var acc = 1.0; var j = 0
      while (j < f) { acc *= (if (a(j)) q(j) else 1.0 - q(j)); j += 1 }
      acc
    }
    var it = 0
    while (it < iters) {
      val g = rows.map { case (a, _) =>
        val pm = p * lik(a, m)
        val pu = (1.0 - p) * lik(a, u)
        pm / (pm + pu)
      }
      val sg = rows.indices.map(i => g(i) * rows(i)._2).sum
      val su = rows.indices.map(i => (1.0 - g(i)) * rows(i)._2).sum
      p = sg / nTot
      m = Array.tabulate(f)(j => rows.indices
        .map(i => if (rows(i)._1(j)) g(i) * rows(i)._2 else 0.0)
        .sum / sg)
      u = Array.tabulate(f)(j => rows.indices
        .map(i => if (rows(i)._1(j)) (1.0 - g(i)) * rows(i)._2 else 0.0)
        .sum / su)
      it += 1
    }
    val spark = pairs.sparkSession
    import spark.implicits._
    val out = rows.map { case (a, c) =>
      val pm = lik(a, m); val pu = lik(a, u)
      val g = p * pm / (p * pm + (1.0 - p) * pu)
      val w = math.log(pm / pu) / math.log(2.0)
      (a.map(b => if (b) "1" else "0").mkString, c,
        math.rint(g * 1e6) / 1e6, math.rint(w * 1e6) / 1e6)
    }.toSeq.toDF("__pat", "n_pairs", "posterior", "match_weight")
    val patCols = agreementCols.zipWithIndex.map { case (c, i) =>
      (F.substring(F.col("__pat"), i + 1, 1) === "1").as(c)
    }
    out.select(patCols ++ Seq(F.col("n_pairs"), F.col("posterior"),
      F.col("match_weight")): _*)
  }
}
