package graft.ml

/** Driver-side distribution functions for the regression t-test
  * (reference testBeta's 2-sided p-values, mahout-samsara-book:
  * myMahoutApp/src/main/scala/myMahoutApp/LinearRegression.scala:59-97,
  * esp. 88-93 — the reference calls commons-math3 `TDistribution`; this
  * is a dependency-free re-implementation of the same math).
  *
  * Two-sided p for Student's t with ν degrees of freedom:
  *   p = P(|T| > |t|) = I_{ν/(ν+t²)}(ν/2, 1/2)
  * with I the regularized incomplete beta, evaluated by the standard
  * Lentz continued fraction (Numerical Recipes §6.4 formulation —
  * textbook math, public). Accuracy ~1e-12, ample for reporting p-values.
  */
object Stat {

  /** log Γ(x) via the Lanczos approximation (g=7, n=9 coefficients). */
  def logGamma(x: Double): Double = {
    require(x > 0, s"logGamma domain: $x")
    val g = 7.0
    val c = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5) {
      // reflection: Γ(x)Γ(1−x) = π/sin(πx)
      math.log(math.Pi / math.sin(math.Pi * x)) - logGamma(1.0 - x)
    } else {
      val z = x - 1.0
      var a = c(0)
      for (i <- 1 until c.length) a += c(i) / (z + i)
      val t = z + g + 0.5
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t +
        math.log(a)
    }
  }

  /** Continued fraction for the incomplete beta (modified Lentz). */
  private def betacf(a: Double, b: Double, x: Double): Double = {
    val eps = 1e-15
    val fpmin = 1e-300
    val qab = a + b
    val qap = a + 1.0
    val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < fpmin) d = fpmin
    d = 1.0 / d
    var h = d
    var m = 1
    var converged = false
    while (m <= 300 && !converged) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c
      if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c
      if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      val del = d * c
      h *= del
      converged = math.abs(del - 1.0) < eps
      m += 1
    }
    h
  }

  /** Regularized incomplete beta I_x(a, b). */
  def regIncBeta(a: Double, b: Double, x: Double): Double = {
    require(x >= 0.0 && x <= 1.0, s"regIncBeta domain: $x")
    if (x == 0.0 || x == 1.0) x
    else {
      val lnFront = logGamma(a + b) - logGamma(a) - logGamma(b) +
        a * math.log(x) + b * math.log(1.0 - x)
      // symmetry pick keeps the continued fraction convergent
      if (x < (a + 1.0) / (a + b + 2.0))
        math.exp(lnFront) * betacf(a, b, x) / a
      else
        1.0 - math.exp(lnFront) * betacf(b, a, 1.0 - x) / b
    }
  }

  /** Two-sided p-value of Student's t with `df` degrees of freedom.
    * t = NaN (a 0/0 from β = 0 with SE = 0 on a perfect fit) reports
    * p = 1: zero coefficient, zero evidence against the null. */
  def tTestPValue(t: Double, df: Double): Double = {
    require(df > 0, s"degrees of freedom must be positive: $df")
    if (t.isNaN) 1.0
    else if (t.isInfinite) 0.0
    else regIncBeta(df / 2.0, 0.5, df / (df + t * t))
  }
}
