package graft.functions

/** Derivative-free optimizers for MLE / MSE refinement.
  *
  * The reference relies on scipy's Nelder-Mead (maxiter 2000, tol 1e-8)
  * with an L-BFGS-B fallback (/root/reference/src/spark_bestfit/
  * estimation.py:282-306). We implement a standard Nelder-Mead simplex
  * (Lagarias et al. 1998 parameterization, as used by scipy) plus a
  * 1-D golden-section/Brent-style minimizer for single-parameter fits.
  * Objective functions signal infeasibility by returning a large finite
  * penalty or +Infinity.
  */
object Optimize extends Serializable {

  final val Penalty = 1e12

  /** Nelder-Mead simplex minimization.
    *
    * @param f objective (may return +Inf / Penalty outside the domain)
    * @param x0 starting point (must be feasible)
    * @param step initial simplex step per coordinate (defaults to 5% of |x|)
    * @return (argmin, fmin)
    */
  def nelderMead(
      f: Array[Double] => Double,
      x0: Array[Double],
      maxIter: Int = 2000,
      tolF: Double = 1e-10,
      tolX: Double = 1e-8,
      step: Array[Double] = null): (Array[Double], Double) = {
    val n = x0.length
    val alpha = 1.0; val gamma = 2.0; val rho = 0.5; val sigma = 0.5

    // initial simplex: x0 plus n perturbed vertices
    val simplex = Array.ofDim[Array[Double]](n + 1)
    simplex(0) = x0.clone()
    var i = 0
    while (i < n) {
      val v = x0.clone()
      val h = if (step != null) step(i)
              else if (v(i) != 0.0) 0.05 * math.abs(v(i)) else 0.00025
      v(i) += h
      simplex(i + 1) = v
      i += 1
    }
    val fv = simplex.map(f)

    var iter = 0
    var order = (0 to n).toArray.sortBy(fv)
    while (iter < maxIter) {
      order = (0 to n).toArray.sortBy(fv)
      val best = order(0); val worst = order(n); val second = order(n - 1)
      // convergence: function spread and simplex size
      if (math.abs(fv(worst) - fv(best)) <= tolF * (math.abs(fv(best)) + tolF)) {
        var maxD = 0.0
        var j = 0
        while (j < n) {
          maxD = math.max(maxD, math.abs(simplex(worst)(j) - simplex(best)(j)))
          j += 1
        }
        if (maxD <= tolX * (1.0 + math.abs(simplex(best).map(math.abs).max))) {
          iter = maxIter // break
        }
      }
      if (iter < maxIter) {
        // centroid of all but worst
        val c = new Array[Double](n)
        var k = 0
        while (k <= n) {
          if (k != worst) {
            var j = 0
            while (j < n) { c(j) += simplex(k)(j) / n; j += 1 }
          }
          k += 1
        }
        def combine(t: Double): Array[Double] = {
          val out = new Array[Double](n)
          var j = 0
          while (j < n) { out(j) = c(j) + t * (simplex(worst)(j) - c(j)); j += 1 }
          out
        }
        val xr = combine(-alpha)
        val fr = f(xr)
        if (fr < fv(best)) {
          val xe = combine(-gamma)
          val fe = f(xe)
          if (fe < fr) { simplex(worst) = xe; fv(worst) = fe }
          else { simplex(worst) = xr; fv(worst) = fr }
        } else if (fr < fv(second)) {
          simplex(worst) = xr; fv(worst) = fr
        } else {
          val xc = if (fr < fv(worst)) combine(-rho) else combine(rho)
          val fc = f(xc)
          if (fc < math.min(fr, fv(worst))) { simplex(worst) = xc; fv(worst) = fc }
          else {
            // shrink toward best
            var k2 = 0
            while (k2 <= n) {
              if (k2 != best) {
                var j = 0
                while (j < n) {
                  simplex(k2)(j) = simplex(best)(j) + sigma * (simplex(k2)(j) - simplex(best)(j))
                  j += 1
                }
                fv(k2) = f(simplex(k2))
              }
              k2 += 1
            }
          }
        }
        iter += 1
      }
    }
    val bi = (0 to n).minBy(fv)
    (simplex(bi), fv(bi))
  }

  /** Golden-section search for a 1-D minimum on [a, b]. */
  def goldenSection(f: Double => Double, a0: Double, b0: Double,
                    tol: Double = 1e-10, maxIter: Int = 200): Double = {
    val invPhi = (math.sqrt(5.0) - 1.0) / 2.0
    var a = a0; var b = b0
    var c = b - invPhi * (b - a)
    var d = a + invPhi * (b - a)
    var fc = f(c); var fd = f(d)
    var it = 0
    while (math.abs(b - a) > tol * (math.abs(a) + math.abs(b) + 1e-30) && it < maxIter) {
      if (fc < fd) { b = d; d = c; fd = fc; c = b - invPhi * (b - a); fc = f(c) }
      else { a = c; c = d; fc = fd; d = a + invPhi * (b - a); fd = f(d) }
      it += 1
    }
    (a + b) / 2.0
  }

  /** Newton iteration with bisection safeguard on [lo, hi] for g(x)=0,
    * where g is monotone-ish. Used by per-family profile-MLE equations. */
  def safeNewton(g: Double => Double, gPrime: Double => Double,
                 x0: Double, lo: Double, hi: Double,
                 tol: Double = 1e-12, maxIter: Int = 100): Double = {
    var x = math.min(math.max(x0, lo), hi)
    var a = lo; var b = hi
    var i = 0
    while (i < maxIter) {
      val gx = g(x)
      if (math.abs(gx) < tol) return x
      if (gx > 0) b = x else a = x
      val gp = gPrime(x)
      var next = if (gp != 0.0 && !gp.isNaN) x - gx / gp else Double.NaN
      if (next.isNaN || next <= a || next >= b) next = 0.5 * (a + b)
      if (math.abs(next - x) < tol * (1.0 + math.abs(x))) return next
      x = next
      i += 1
    }
    x
  }
}
