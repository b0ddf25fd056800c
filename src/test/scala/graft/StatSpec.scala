package graft

import graft.ml.{Ridge, Stat}
import org.apache.spark.sql.functions._

/** Student-t p-values (reference testBeta's TDistribution calls,
  * LinearRegression.scala:88-93). Reference values computed with
  * mpmath's regularized incomplete beta at 30 digits.
  */
class StatSpec extends SparkSpec {

  test("two-sided t p-values match high-precision references") {
    val refs = Seq(
      (2.0, 10.0, 0.0733880347707),
      (2.228139, 10.0, 0.0499999874529), // the t_{0.025,10} table entry
      (1.0, 1.0, 0.5), // Cauchy: P(|T|>1) = 1/2 exactly
      (3.5, 25.0, 0.00176549531436),
      (0.5, 100.0, 0.618173565831),
      (12.7062, 1.0, 0.0500000185607), // t_{0.025,1}
      (1.959964, 1e6, 0.0500002754873)) // ≈ normal limit
    for ((t, df, p) <- refs)
      math.abs(Stat.tTestPValue(t, df) - p) should be < 1e-9
  }

  test("p-values are symmetric in t and monotone in |t|") {
    for (df <- Seq(1.0, 5.0, 50.0); t <- Seq(0.3, 1.7, 4.2)) {
      Stat.tTestPValue(-t, df) shouldBe Stat.tTestPValue(t, df)
      Stat.tTestPValue(t + 0.5, df) should be < Stat.tTestPValue(t, df)
    }
    Stat.tTestPValue(0.0, 7.0) shouldBe 1.0 +- 1e-12
  }

  test("property: regularized incomplete beta satisfies the reflection identity") {
    // I_x(a,b) + I_{1−x}(b,a) = 1 — exercises both continued-fraction
    // branches against each other across the parameter space
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 200) {
      val a = 0.5 + rnd.nextDouble() * 20
      val b = 0.5 + rnd.nextDouble() * 20
      val x = rnd.nextDouble()
      val s = Stat.regIncBeta(a, b, x) + Stat.regIncBeta(b, a, 1 - x)
      math.abs(s - 1.0) should be < 1e-10
    }
  }

  test("noiseless fit: algebraic SSR clamps at zero, p-values stay defined") {
    import spark.implicits._
    // y is an exact linear function: true SSR = 0, where the fused
    // cancellation yy − 2βᵀb + βᵀGβ could land epsilon-negative
    val data = (0 until 100).map { i =>
      val x = (i % 37).toDouble
      (x, 3.0 + 2.0 * x)
    }
    val fit = Ridge.fit(data.toDF("x1", "y"), Seq(col("x1")), col("y"),
      lambda = 0.0)
    fit.ssr shouldBe 0.0
    fit.se.toArray.foreach(_.isNaN shouldBe false)
    fit.pValues.toArray.foreach { p =>
      p.isNaN shouldBe false
      p should (be >= 0.0 and be <= 1.0)
    }
  }

  test("ridge sums survive magnitudes where a long accumulator wraps") {
    import spark.implicits._
    // per-row products of ~9.2e8-magnitude values are ~8.5e17 — a LONG
    // sum wraps after ~11 rows; the decimal(38,0) accumulators must not.
    // Exact linear target keeps the expected beta known despite the
    // astronomic sums.
    val big = 9.2e8
    val data = (0 until 1000).map { i =>
      val x = ((i % 97) - 48).toDouble * (big / 48.0)
      (x, 2.0 * x)
    }
    val fit = Ridge.fit(data.toDF("x1", "y"), Seq(col("x1")), col("y"),
      lambda = 0.0)
    // a wrapped (silently negative / null) Gram destroys the solve by
    // orders of magnitude; double conditioning on ~1e21 sums costs only
    // ~1e-11 relative — so the bounds are scale-relative, wide enough for
    // fp conditioning and astronomically tight against a wrap
    fit.beta(1) shouldBe 2.0 +- 1e-6
    fit.beta(0) shouldBe 0.0 +- big * 1e-6
    fit.ssr should be >= 0.0
    // yᵀy ~ 1e21: a relative bound distinguishes fp cancellation noise
    // (~1e5 absolute) from a wrapped accumulator (~1e21 absolute)
    fit.ssr should be < 1e12
  }

  test("Ridge.pValues: seeded regression rejects true signal, keeps noise") {
    import spark.implicits._
    // The MyAppSuite.scala:78-111 scenario: strong linear signal on
    // x1..x2 plus a pure-noise column x3 with zero true coefficient.
    val rnd = new scala.util.Random(77)
    val data = (0 until 400).map { _ =>
      val x1 = rnd.nextInt(30).toDouble
      val x2 = rnd.nextInt(30).toDouble
      val x3 = rnd.nextInt(30).toDouble // not used in y
      val y = math.rint(5.0 + 4.0 * x1 - 3.0 * x2 + rnd.nextGaussian() * 8.0)
      (x1, x2, x3, y)
    }
    val df = data.toDF("x1", "x2", "x3", "y")
    val fit = Ridge.fit(df, Seq(col("x1"), col("x2"), col("x3")), col("y"),
      lambda = 0.0)
    val p = fit.pValues
    // signal coefficients: overwhelming evidence
    p(1) should be < 1e-8
    p(2) should be < 1e-8
    // noise coefficient: comfortably non-significant for this seed
    // (t = beta3/se3 is ordinary sampling noise)
    p(3) should be > 0.05
    // consistency: pValues are exactly the Stat transform of tStats
    val t = fit.tStats
    val dfree = (fit.n - fit.beta.length).toDouble
    for (j <- 0 until fit.beta.length)
      p(j) shouldBe Stat.tTestPValue(t(j), dfree) +- 1e-15
  }
}
