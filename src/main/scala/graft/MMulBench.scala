package graft

import breeze.linalg.{norm, DenseMatrix}
import graft.ml.MMul

/** The reference repo's only performance artifact, reproduced: in-core
  * dense mmul C = A(5000×350) × B(350×300), single-threaded control vs
  * the balanced row-range-futures multiply, 30 reps after one warm-up,
  * average ms printed (mahout-samsara-book: myMahoutApp/src/test/scala/
  * myMahoutApp/mthread/MThreadSuite.scala:22-46; correctness gate
  * ‖C_ctl − C_par‖_F < 1e-5 at :51).
  *
  * Run: sbt "runMain graft.MMulBench [reps]"
  */
object MMulBench {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(30)
    val rnd = new scala.util.Random(1234)
    val a = DenseMatrix.fill(5000, 350)(rnd.nextDouble())
    val b = DenseMatrix.fill(350, 300)(rnd.nextDouble())

    // warm-up
    val ctl = a * b
    val par = MMul.mmulPar(a, b)
    require(norm((ctl - par).toDenseVector) < 1e-5, "parity gate failed")

    def time(f: => DenseMatrix[Double]): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) { f; i += 1 }
      (System.nanoTime() - t0) / 1e6 / reps
    }

    val ctlMs = time(a * b)
    val parMs = time(MMul.mmulPar(a, b))
    println(f"control: $ctlMs%.1f ms")
    println(f"mthread: $parMs%.1f ms (${ctlMs / parMs}%.2fx)")
  }
}
