package graft.ml

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import breeze.linalg.DenseMatrix

/** In-core multithreaded matrix multiply, re-expressing the reference's
  * `mmulParA` (mahout-samsara-book: myMahoutApp/src/main/scala/myMahoutApp/
  * mthread/MMul.scala:21-55): split A into balanced horizontal row ranges
  * — `slack` ranges of `step+1` rows, the rest `step` (ref createSplits,
  * MMul.scala:21-33) — multiply each block against B in a future, write
  * into a shared preallocated result (disjoint row ranges, so no
  * synchronization), and await all.
  *
  * Inside the engine this pattern is subsumed by Spark task parallelism
  * (SURVEY §2.7 V3); it lives here as the driver-side kernel for in-core
  * finales (Gram solves, sketch post-processing) and as reference parity.
  */
object MMul {

  /** Balanced row ranges: nsplits = min(parallelism, nrow). Empty for a
    * 0-row matrix (the degenerate-but-legal case; dividing by n = 0
    * would throw from inside the split math). */
  private[graft] def createSplits(nrow: Int, nsplits: Int): Seq[Range] = {
    require(nsplits > 0, s"createSplits: nsplits must be positive ($nsplits)")
    if (nrow == 0) return Seq.empty
    val n = math.min(nsplits, nrow)
    val step = nrow / n
    val slack = nrow % n
    val bounds = (0 to n).map(i =>
      if (i <= slack) i * (step + 1) else slack * (step + 1) + (i - slack) * step)
    (0 until n).map(i => bounds(i) until bounds(i + 1))
  }

  /** Parallel C = A × B over row-range futures. */
  def mmulPar(a: DenseMatrix[Double], b: DenseMatrix[Double],
      parallelism: Int = Runtime.getRuntime.availableProcessors())
      : DenseMatrix[Double] = {
    require(a.cols == b.rows, s"geometry: ${a.cols} != ${b.rows}")
    implicit val ec: ExecutionContext = ExecutionContext.global
    val c = DenseMatrix.zeros[Double](a.rows, b.cols)
    val work = createSplits(a.rows, parallelism).map { range =>
      Future {
        val block = a(range, ::).toDenseMatrix * b
        var r = 0
        while (r < range.length) {
          var j = 0
          while (j < b.cols) {
            c(range.start + r, j) = block(r, j)
            j += 1
          }
          r += 1
        }
      }
    }
    Await.result(Future.sequence(work), Duration.Inf)
    c
  }
}
