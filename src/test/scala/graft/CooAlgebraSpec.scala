package graft

import graft.functions.GramAggregator
import graft.operators.Coo
import org.apache.spark.sql.functions._

/** Property layer the reference lacks (SURVEY.md §5): algebraic invariants
  * of the COO operators on seeded sparse matrices, checked exactly (cell
  * values are dyadic rationals, so every sum is float-exact in any order).
  */
class CooAlgebraSpec extends SparkSpec {

  private lazy val mA = cooOf(randomCoo(40, 30, 0.3, seed = 1234))
  private lazy val mB = cooOf(randomCoo(30, 20, 0.3, seed = 2345))

  test("transpose is an involution: (At)t = A") {
    maxAbsDiff(cells(Coo.transpose(Coo.transpose(mA))), cells(mA)) shouldBe 0.0
  }

  test("(A B)t = Bt At") {
    val lhs = cells(Coo.transpose(Coo.matmul(mA, mB)))
    val rhs = cells(Coo.matmul(Coo.transpose(mB), Coo.transpose(mA)))
    maxAbsDiff(lhs, rhs) shouldBe 0.0
  }

  test("gram(A) = At A via matmul, and is symmetric") {
    val g = cells(Coo.gram(mA))
    val viaMatmul = cells(Coo.matmul(Coo.transpose(mA), mA))
    maxAbsDiff(g, viaMatmul) shouldBe 0.0
    g.foreach { case ((i, j), v) => g((j, i)) shouldBe v }
  }

  test("GramAggregator (one-pass outer products) matches the self-join gram") {
    import spark.implicits._
    val k = 30
    val rows = Coo.toRows(mA, k).select($"vec".as[Array[Double]])
    val flat = rows.select(
      new GramAggregator(k).toColumn.name("g")).head()
    val viaAgg = (for {
      p <- 0 until k; q <- 0 until k
      v = flat(p * k + q) if v != 0.0
    } yield (p.toLong, q.toLong) -> v).toMap
    maxAbsDiff(viaAgg, cells(Coo.gram(mA))) shouldBe 0.0
  }

  test("colSums(rbind(A, B')) = colSums(A) + colSums(B')") {
    val b2 = cooOf(randomCoo(25, 30, 0.3, seed = 777))
    val stacked = Coo.rbind(mA, b2, offset = 1000L)
    val lhs = cells(Coo.colSums(stacked).select(lit(0L).as("i"), col("j"), col("v")))
    val sa = cells(Coo.colSums(mA).select(lit(0L).as("i"), col("j"), col("v")))
    val sb = cells(Coo.colSums(b2).select(lit(0L).as("i"), col("j"), col("v")))
    val rhs = (sa.keySet ++ sb.keySet).map(k =>
      k -> (sa.getOrElse(k, 0.0) + sb.getOrElse(k, 0.0))).toMap
    maxAbsDiff(lhs, rhs) shouldBe 0.0
  }

  test("matvec agrees with matmul against a 1-column matrix") {
    import spark.implicits._
    val vecCells = (0 until 30).map(j => (j.toLong, (j % 7).toDouble / 4.0))
    val vec = vecCells.toDF("j", "w")
    val asCol = vecCells.map { case (j, w) => (j, 0L, w) }.toDF("i", "j", "v")
    val lhs = cells(Coo.matvec(mA, vec)
      .select(col("i"), lit(0L).as("j"), col("v")))
    maxAbsDiff(lhs, cells(Coo.matmul(mA, asCol))) shouldBe 0.0
  }

  test("cbindScalar prepends an all-ones column and shifts the rest") {
    val c = cells(Coo.cbindScalar(mA, 1.0))
    val orig = cells(mA)
    orig.foreach { case ((i, j), v) => c((i, j + 1)) shouldBe v }
    mA.select("i").distinct().collect().map(_.getLong(0))
      .foreach(i => c((i, 0L)) shouldBe 1.0)
  }

  test("sliceCols + reindex keeps exactly the window") {
    val s = cells(Coo.sliceCols(mA, 5, 14))
    val orig = cells(mA)
    s.foreach { case ((i, j), v) =>
      j should (be >= 0L and be <= 9L)
      orig((i, j + 5)) shouldBe v
    }
    orig.count { case ((_, j), _) => j >= 5 && j <= 14 } shouldBe s.size
  }

  test("round-trip toRows/fromRows preserves cells") {
    val dedup = mA.groupBy("i", "j").agg(sum("v").as("v"))
    maxAbsDiff(cells(Coo.fromRows(Coo.toRows(mA, 30))), cells(dedup)) shouldBe 0.0
  }

  test("froNorm^2 = sum of squares; diagReg shifts only the diagonal") {
    val g = Coo.gram(mA)
    val fro = Coo.froNorm(g).head().getAs[Double]("fro")
    val sumSq = cells(g).values.map(v => v * v).sum
    math.abs(fro * fro - sumSq) / sumSq should be < 1e-12
    val lam = 2.5
    val shifted = cells(Coo.diagReg(g, lam))
    cells(g).foreach { case ((i, j), v) =>
      shifted((i, j)) shouldBe (if (i == j) v + lam else v)
    }
  }

  test("pairwiseDistSq is zero on the diagonal and symmetric") {
    val centers = cooOf(randomCoo(6, 10, 0.9, seed = 99))
    val d = cells(Coo.pairwiseDistSq(centers))
    (0L until 6L).foreach(i => d.getOrElse((i, i), 0.0) shouldBe 0.0)
    d.foreach { case ((i, j), v) => d.getOrElse((j, i), 0.0) shouldBe v }
  }
}
