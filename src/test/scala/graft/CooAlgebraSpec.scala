package graft

import graft.functions.GramAggregator
import graft.operators.{Coo, CooQueries, CooViews}
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

  test("gramBlocked equals the self-join gram (ragged tiles, k=37)") {
    import graft.operators.BlockGram
    // tile=8 / rowBlock=16 force many partial edge tiles and multi-block rows
    val m = cooOf(randomCoo(200, 37, 0.2, seed = 777))
    maxAbsDiff(cells(BlockGram.gramBlocked(m, tile = 8, rowBlock = 16)),
      cells(Coo.gram(m))) shouldBe 0.0
  }

  test("gramBlocked at k=5000 — beyond the dense aggregator's range") {
    import graft.operators.BlockGram
    // 3000×5000, ~8 nnz/row: GramAggregator's 8·k² buffer would be 200 MB
    // per task here; the tiled path caps every buffer at 8·1024²
    val raw = randomCoo(3000, 5000, 8.0 / 5000, seed = 31337)
    val got = cells(BlockGram.gramBlocked(cooOf(raw)))
    val want = scala.collection.mutable.HashMap.empty[(Long, Long), Double]
    for {
      (_, rowCells) <- raw.groupBy(_._1)
      (_, ja, va) <- rowCells
      (_, jb, vb) <- rowCells
    } want((ja, jb)) = want.getOrElse((ja, jb), 0.0) + va * vb
    maxAbsDiff(got, want.toMap) shouldBe 0.0
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

  test("pairwiseDistSq honors implicit zeros: disjoint sparse rows still get a distance") {
    // rows share NO column — the naive equi-join formulation drops the
    // pair entirely; true dist² = 1² + 2² = 5
    val m = cooOf(Seq((0L, 0L, 1.0), (1L, 1L, 2.0)))
    val d = cells(Coo.pairwiseDistSq(m))
    d((0L, 1L)) shouldBe 5.0
    d((1L, 0L)) shouldBe 5.0
    // partial overlap: (1,0,3) vs (0:1, 2:4) → (3-1)² + 4² = 20
    val p = cooOf(Seq((0L, 0L, 3.0), (1L, 0L, 1.0), (1L, 2L, 4.0)))
    cells(Coo.pairwiseDistSq(p))((0L, 1L)) shouldBe 20.0
  }

  test("diagReg adds lambda to diagonal cells ABSENT from the sparse matrix") {
    // column 2 is all-zero: the Gram has no (2,2) cell, yet ridge must
    // still regularize that singular coordinate
    val g = cooOf(Seq((0L, 0L, 4.0), (0L, 1L, 1.0), (1L, 0L, 1.0),
      (1L, 1L, 3.0), (2L, 0L, 0.5), (0L, 2L, 0.5)))
    val r = cells(Coo.diagReg(g, 10.0))
    r((2L, 2L)) shouldBe 10.0 // materialized from nothing
    r((0L, 0L)) shouldBe 14.0
    r((1L, 1L)) shouldBe 13.0
    r((0L, 1L)) shouldBe 1.0
  }

  test("toRows(ncol = 0) yields empty vectors, not a backwards sequence") {
    val m = cooOf(Seq((0L, 0L, 1.0), (1L, 0L, 2.0)))
    val vecs = Coo.toRows(m, 0).collect()
      .map(r => r.getAs[Long]("i") -> r.getSeq[Double](r.fieldIndex("vec")))
    vecs.length shouldBe 2
    vecs.foreach { case (_, v) => v.isEmpty shouldBe true }
  }

  test("q_gram's row assembly matches the declared cooX oracle view") {
    // gramRows (CooQueries) and the cooX SQL view are maintained in
    // parallel; this differential catches drift with a clear failure
    // instead of an opaque oracle hash mismatch
    val viaAgg = CooQueries.gramCellsForTest(spark, sfDir).map {
      case (i, j, v) => (i, j) -> v
    }.toMap
    val viaSelfJoin = cells(
      Coo.gram(CooViews.cooX(spark, sfDir))
        .select(col("i"), col("j"), (col("v") / 10000.0).as("v")))
    viaAgg.keySet shouldBe viaSelfJoin.keySet
    viaAgg.foreach { case (k, v) =>
      math.abs(v - viaSelfJoin(k)) should be < 1e-6
    }
  }
}
