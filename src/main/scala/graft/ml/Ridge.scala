package graft.ml

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed ridge / OLS via normal equations, re-expressing the
  * reference's `dridge`/`ssr`/`testBeta` (mahout-samsara-book:
  * myMahoutApp/src/main/scala/myMahoutApp/LinearRegression.scala:17-97).
  *
  * The lifecycle mirrors SURVEY.md §3.1: one distributed pass computes the
  * k×k Gram and Xᵀy as exact partial+final aggregates (map-side combine —
  * the only shuffle moves k² doubles per partition, independent of row
  * count, so the pattern holds unchanged at 100 TB); the k×k solve is
  * driver-side Breeze, as in the reference (`solve(mxA, b)`,
  * LinearRegression.scala:33).
  *
  * Determinism for the oracle hash-match: features and the target are
  * quantized to integer-valued doubles before the sums, so Gram/Xᵀy are
  * bit-exact in any summation order; only the final solve differs between
  * engines (Breeze LU here, Cramer in the DuckDB oracle), absorbed by
  * rounding β to 4 decimals.
  */
object Ridge {

  final case class Fit(beta: DenseVector[Double], gramInv: DenseMatrix[Double],
      n: Long, ssr: Double) {
    /** σ̂² = SSR/(m−n), reference `regVarEstimate`
      * (LinearRegression.scala:50-57). */
    def sigma2: Double = ssr / (n - beta.length)
    /** SE(βⱼ) = sqrt(σ̂² · (XᵀX)⁻¹ⱼⱼ), reference `testBeta`
      * (LinearRegression.scala:59-97). */
    def se: DenseVector[Double] =
      DenseVector.tabulate(beta.length)(j => math.sqrt(sigma2 * gramInv(j, j)))
    def tStats: DenseVector[Double] =
      DenseVector.tabulate(beta.length)(j => beta(j) / se(j))
    /** 2-sided coefficient p-values, reference testBeta
      * (LinearRegression.scala:88-93 — commons-math3 TDistribution there,
      * [[Stat.tTestPValue]] here). df = m − n as in the reference. */
    def pValues: DenseVector[Double] = {
      val df = (n - beta.length).toDouble
      val t = tStats
      DenseVector.tabulate(beta.length)(j => Stat.tTestPValue(t(j), df))
    }
  }

  /** Fit y ~ [1, features...] with ridge λ. `features` and `target` are
    * column expressions over `df` that must evaluate to integer-valued
    * doubles (quantize upstream) for cross-engine exactness.
    */
  def fit(df: DataFrame, features: Seq[org.apache.spark.sql.Column],
      target: org.apache.spark.sql.Column, lambda: Double): Fit =
    fitFromSums(sums(df, features, target), features.length + 1, lambda)

  /** The distributed half of [[fit]]: the exact Gram/Xᵀy/yᵀy sums row.
    * Split out (round-15) because the sums are λ-INDEPENDENT — the ridge
    * diagonal is added driver-side in [[fitFromSums]] — so q_ridge_beta
    * (λ=10) and q_beta_tstats (λ=0) can share one memoized pass over the
    * fact table instead of each re-running the identical aggregate. */
  def sums(df: DataFrame, features: Seq[org.apache.spark.sql.Column],
      target: org.apache.spark.sql.Column): Row = {
    val k = features.length + 1
    val x = lit(1.0) +: features
    // ONE pass: all Gram + Xᵀy sums plus yᵀy as exact aggregates — SSR
    // then follows algebraically (no second scan of the data):
    //   SSR = ‖y − Xβ‖² = yᵀy − 2βᵀ(Xᵀy) + βᵀ(XᵀX)β.
    // All three terms come from the same exact integer sums, so the fused
    // form agrees with an explicit residual pass to ~1e-11 relative
    // (double rounding on the k² driver-side products only). EVERY sum
    // accumulates in DECIMAL(38,0): per-row products fit a long, but the
    // SUMS are n·(quantized magnitudes)² — Σy² blows past 2⁶³ already at
    // sf0.1, and Σx·y / Σx·x are only ~10× below the same cliff. Decimal
    // sums stay exact (and mergeable) at any row count; conversion to
    // double happens once, driver-side.
    def exactSum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      sum(c.cast("long").cast("decimal(38,0)"))
    val aggs =
      (for (p <- 0 until k; q <- p until k)
        yield exactSum(x(p) * x(q)).as(s"g_${p}_$q")) ++
        (for (p <- 0 until k) yield exactSum(x(p) * target).as(s"b_$p")) :+
        exactSum(target * target).as("yy") :+
        count(lit(1)).as("n")
    df.agg(aggs.head, aggs.tail: _*).head()
  }

  /** The driver half of [[fit]]: solve the normal equations from a
    * [[sums]] row — pure Breeze, no Spark jobs. */
  def fitFromSums(row: Row, k: Int, lambda: Double): Fit = {
    def dbl(name: String): Double =
      row.getAs[java.math.BigDecimal](name).doubleValue()
    val g = DenseMatrix.zeros[Double](k, k)
    for (p <- 0 until k; q <- p until k) {
      val v = dbl(s"g_${p}_$q")
      g(p, q) = v; g(q, p) = v
    }
    val b = DenseVector.tabulate(k)(p => dbl(s"b_$p"))
    val yy = dbl("yy")
    val n = row.getAs[Long]("n")
    val reg = g + DenseMatrix.eye[Double](k) * lambda
    val beta = reg \ b
    val gramInv = breeze.linalg.inv(reg)

    // clamp: the algebraic form is a cancellation of large terms, so a
    // noiseless/collinear fit (true SSR = 0) can land epsilon-negative in
    // double — the residual-pass formulation it replaces was non-negative
    // by construction, and sigma2/se/p-values need that invariant
    val ssr = math.max(0.0, yy - 2.0 * (beta dot b) + (beta dot (g * beta)))
    Fit(beta, gramInv, n, ssr)
  }

  /** β as a (j, beta) DataFrame rounded for the oracle hash-match.
    * `scale` divides β back to natural units after quantization. */
  def betaFrame(s: SparkSession, fit: Fit, scale: Double): DataFrame = {
    val rows = fit.beta.toArray.zipWithIndex.map { case (b, j) =>
      (j.toLong, round4(b / scale))
    }
    s.createDataFrame(rows.toIndexedSeq).toDF("j", "beta").orderBy("j")
  }

  def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
}
