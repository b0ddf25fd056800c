package graft

import graft.operators.Coo
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator property layer over the COO algebra (SURVEY §5:
  * the property-based testing the reference lacks). Generators produce
  * small sparse matrices with dyadic-rational cells so every algebraic
  * identity holds exactly (no float tolerance). Samples are drawn with
  * fixed seeds (the scalatest-scalacheck bridge isn't on the offline
  * classpath, so `Gen` is driven directly — fully deterministic).
  */
class CooPropertySpec extends SparkSpec {

  private val cellGen: Gen[(Long, Long, Double)] = for {
    i <- Gen.choose(0L, 12L)
    j <- Gen.choose(0L, 9L)
    num <- Gen.choose(-64, 64)
  } yield (i, j, num / 8.0)

  /** Deduplicated sparse matrix (COO invariant: one cell per (i,j)). */
  private val matGen: Gen[Seq[(Long, Long, Double)]] =
    Gen.nonEmptyListOf(cellGen).map(
      _.groupBy(c => (c._1, c._2)).map(_._2.head).toSeq)

  private def draw[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default.withSize(20), Seed(seed))
      .getOrElse(sys.error(s"generator failed at seed $seed"))

  private def forSeeds(n: Int)(body: Long => Unit): Unit =
    (1 to n).foreach(k => withClue(s"[seed $k] ") { body(k.toLong) })

  test("property: transpose involution and norm invariance") {
    forSeeds(5) { k =>
      val m = cooOf(draw(matGen, k))
      maxAbsDiff(cells(Coo.transpose(Coo.transpose(m))), cells(m)) shouldBe 0.0
      val n1 = Coo.froNorm(m).head().getAs[Double]("fro")
      val n2 = Coo.froNorm(Coo.transpose(m)).head().getAs[Double]("fro")
      n1 shouldBe n2
    }
  }

  test("property: matmul distributes over rbind of disjoint row blocks") {
    forSeeds(5) { k =>
      // C = [A1; A2] B  ==  [A1 B; A2 B]
      val as = draw(matGen, k)
      val bs = draw(matGen, k + 100)
      val a1 = cooOf(as)
      val a2 = cooOf(as.map { case (i, j, v) => (i, j, -v) })
      val b = cooOf(bs.map { case (i, j, v) => (j, i, v) })
      val offset = 100L
      val stacked = Coo.matmul(Coo.rbind(a1, a2, offset), b)
      val parts = Coo.rbind(Coo.matmul(a1, b), Coo.matmul(a2, b), offset)
      maxAbsDiff(cells(stacked), cells(parts)) shouldBe 0.0
    }
  }

  test("property: colSums/rowSums are transpose-dual and sum to the same total") {
    forSeeds(5) { k =>
      val m = cooOf(draw(matGen, k))
      val colViaRow = cells(Coo.rowSums(Coo.transpose(m))
        .select(lit(0L).as("i"), col("i").as("j"), col("v")))
      val colDirect = cells(Coo.colSums(m)
        .select(lit(0L).as("i"), col("j"), col("v")))
      maxAbsDiff(colViaRow, colDirect) shouldBe 0.0
      val t1 = colDirect.values.sum
      val t2 = cells(Coo.rowSums(m)
        .select(col("i"), lit(0L).as("j"), col("v"))).values.sum
      t1 shouldBe t2
    }
  }

  test("property: ewise scale by c then 1/c is identity (dyadic c)") {
    forSeeds(4) { k =>
      val c = draw(Gen.oneOf(2.0, 4.0, 8.0, 0.5), k)
      val m = cooOf(draw(matGen, k))
      val back = Coo.ewise(Coo.ewise(m, _ * c), _ / c)
      maxAbsDiff(cells(back), cells(m)) shouldBe 0.0
    }
  }
}
