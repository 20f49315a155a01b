package graft.functions

/** Classic Jaro / Jaro–Winkler string similarity — the record-linkage
  * comparator for short identifier-like strings (names, SKUs, titles)
  * where Levenshtein's unit-cost edits over-penalize transpositions.
  * Semantics match the common reference implementation (and DuckDB's
  * `jaro_winkler_similarity`, which the correctness oracle replays):
  * match window ⌊max(|a|,|b|)/2⌋−1, transpositions counted over the
  * matched subsequences and halved, Winkler prefix boost (scale 0.1,
  * prefix capped at 4) applied only when Jaro exceeds 0.7; either
  * string empty → 0.
  */
object StringSim {

  /** Jaro similarity in [0, 1]. */
  def jaro(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val win = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - win)
      val hi = math.min(l2 - 1, i + win)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / l1 + md / l2 + (md - t / 2.0) / md) / 3.0
  }

  /** Jaro–Winkler: Jaro plus the common-prefix boost
    * ℓ·scale·(1−jaro), ℓ ≤ 4, applied only above the 0.7 threshold. */
  def jaroWinkler(s1: String, s2: String,
                  prefixScale: Double = 0.1,
                  boostThreshold: Double = 0.7): Double = {
    val j = jaro(s1, s2)
    if (j <= boostThreshold) return j
    var l = 0
    val cap = math.min(4, math.min(s1.length, s2.length))
    while (l < cap && s1.charAt(l) == s2.charAt(l)) l += 1
    j + l * prefixScale * (1.0 - j)
  }
}
