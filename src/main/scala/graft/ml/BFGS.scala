package graft.ml

import breeze.linalg.{DenseMatrix, DenseVector, norm}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BFGS quasi-Newton minimizer, re-expressing the reference's in-core
  * optimizer (mahout-samsara-book: myMahoutApp/src/main/scala/myMahoutApp/
  * BFGS.scala:19-67) on Breeze driver-side linear algebra, plus the wiring
  * that makes it *distributed*: the objective/gradient callbacks may be
  * DataFrame aggregations, so each line-search step is one Spark job over
  * the full dataset while the O(d²) inverse-Hessian update stays on the
  * driver — the right split for d ≲ 10⁴ at any row count.
  *
  * Update rule kept verbatim from the reference (BFGS.scala:52-56):
  *   ρ = 1/(yᵀs);  BInv ← (I − ρ s yᵀ) BInv (I − ρ y sᵀ) + ρ s sᵀ
  * Convergence: ‖∇f‖₂ < ε (ref BFGS.scala:48); `newtonStep` constant-1
  * line search as the default (ref BFGS.scala:69).
  */
object BFGS {

  /** (objective, x, direction, gradient-at-x) => step size. */
  type LineSearch = (DenseVector[Double] => Double, DenseVector[Double],
    DenseVector[Double], DenseVector[Double]) => Double

  /** Constant unit step (ref `newtonStep`, BFGS.scala:69). */
  val newtonStep: LineSearch = (_, _, _, _) => 1.0

  /** Backtracking Armijo search — the practical default for non-quadratic
    * objectives (extension; the reference only ships the constant step).
    * The sufficient-decrease slope is the directional derivative
    * ∇f·dir = −gᵀBInv g — NOT −(dir·dir) = −gᵀBInv²g, which mis-scales
    * the test whenever BInv departs from the identity. */
  def backtracking(c: Double = 1e-4, shrink: Double = 0.5,
      maxHalvings: Int = 30): LineSearch = (f, x, dir, grad0) => {
    val f0 = f(x)
    val slope = grad0 dot dir // < 0: dir = -BInv·grad is a descent dir
    var t = 1.0
    var n = 0
    while (n < maxHalvings && f(x + dir * t) > f0 + c * t * slope) {
      t *= shrink; n += 1
    }
    t
  }

  final case class Result(x: DenseVector[Double], iterations: Int,
      gradNorm: Double, converged: Boolean)

  /** Minimize `f` with gradient `grad` from `x0`. Mirrors the reference
    * loop (BFGS.scala:19-67) including the failure contract: requires
    * convergence within `maxIter` unless `strict=false`. */
  def minimize(f: DenseVector[Double] => Double,
      grad: DenseVector[Double] => DenseVector[Double],
      x0: DenseVector[Double], maxIter: Int = 40, epsilon: Double = 1e-7,
      lineSearch: LineSearch = newtonStep, strict: Boolean = true): Result = {
    val d = x0.length
    var bInv = DenseMatrix.eye[Double](d)
    var x = x0.copy
    var g = grad(x)
    var iter = 0
    var stop = norm(g) < epsilon
    while (!stop && iter < maxIter) {
      val dir = -(bInv * g)
      val alpha = lineSearch(f, x, dir, g)
      val s = dir * alpha
      val xNext = x + s
      val gNext = grad(xNext)
      val y = gNext - g
      val ys = y dot s
      if (ys > 1e-16) { // curvature condition; skip update otherwise
        val rho = 1.0 / ys
        val iMat = DenseMatrix.eye[Double](d)
        val t = iMat - (s * y.t) * rho
        bInv = t * bInv * t.t + (s * s.t) * rho
      }
      x = xNext
      g = gNext
      iter += 1
      stop = norm(g) < epsilon
    }
    if (strict) require(stop,
      s"BFGS failed to converge in $maxIter iterations (|grad|=${norm(g)})")
    Result(x, iter, norm(g), stop)
  }

  /** Distributed least-squares objective/gradient factory: given feature
    * columns and a target over `df`, returns (f, ∇f) where each evaluation
    * is ONE aggregation job (partial sums on executors, k+1 doubles to the
    * driver) — the distributed-callback pattern SURVEY §2.5 T5 prescribes.
    * f(β) = ½‖Xβ − y‖²;  ∇f(β) = Xᵀ(Xβ − y).
    */
  def leastSquares(df: DataFrame, features: Seq[Column], target: Column)
      : (DenseVector[Double] => Double,
         DenseVector[Double] => DenseVector[Double]) = {
    val x = lit(1.0) +: features
    val k = x.length
    def resid(beta: DenseVector[Double]): Column =
      x.zipWithIndex.map { case (c, j) => c * lit(beta(j)) }.reduce(_ + _) -
        target
    val f = (beta: DenseVector[Double]) =>
      df.agg(sum(pow(resid(beta), 2)).as("v")).head().getAs[Double]("v") / 2
    val g = (beta: DenseVector[Double]) => {
      val r = resid(beta)
      val aggs = x.map(c => sum(c * r))
      val row = df.agg(aggs.head.as("g0"),
        aggs.tail.zipWithIndex.map { case (a, j) => a.as(s"g${j + 1}") }: _*)
        .head()
      DenseVector.tabulate(k)(j => row.getAs[Double](s"g$j"))
    }
    (f, g)
  }
}
