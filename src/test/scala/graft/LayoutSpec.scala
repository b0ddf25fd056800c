package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: Morton-code correctness against a bit-twiddling
  * reference, and the actual file-pruning payoff measured from parquet
  * per-file min-max footprints.
  */
class LayoutSpec extends SparkSpec {

  private def mortonRef(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zvalue equals the bit-twiddling Morton reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cases = Seq.fill(500)((rnd.nextInt(Int.MaxValue).toLong,
      rnd.nextInt(Int.MaxValue).toLong)) :+ (0L, 0L) :+
      (0xFFFFFFFFL, 0xFFFFFFFFL)
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zvalue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (a, b) =>
      withClue(s"morton($a,$b):") { got((a, b)) shouldBe mortonRef(a, b) }
    }
  }

  test("z-order layout prunes file footprints on BOTH dimensions") {
    val sf01 = "/root/testdata/sf0.01"
    val li = Tables.lineitem(spark, sf01)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val n = li.count()
    val nFiles = 32
    val zDir = "/tmp/layout_z"
    val sDir = "/tmp/layout_s"
    Layout.zorderWrite(li, "l_partkey", "l_suppkey", zDir, nFiles)
    // the best SINGLE-key layout: range-sorted by partkey only
    li.repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(sDir)

    // per-file min-max footprints, exactly what parquet footers give a
    // scan planner
    def footprints(dir: String) =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("l_partkey").as("pLo"), max("l_partkey").as("pHi"),
          min("l_suppkey").as("sLo"), max("l_suppkey").as("sHi"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val z = footprints(zDir)
    val s = footprints(sDir)
    z.length shouldBe nFiles
    spark.read.parquet(zDir).count() shouldBe n // rewrite preserves rows

    val (pLo, pHi) = (1L, 200L)   // ~10% of the partkey domain
    val (sLo, sHi) = (1L, 10L)    // ~10% of the suppkey domain
    def touchP(fp: Array[(Long, Long, Long, Long)]) =
      fp.count { case (lo, hi, _, _) => hi >= pLo && lo <= pHi }
    def touchS(fp: Array[(Long, Long, Long, Long)]) =
      fp.count { case (_, _, lo, hi) => hi >= sLo && lo <= sHi }

    // single-key sort: perfect on its own key, ZERO pruning on the other
    touchS(s) shouldBe nFiles
    // z-order: real pruning on BOTH dimensions
    withClue(s"z partkey files ${touchP(z)}/$nFiles:") {
      touchP(z) should be <= nFiles / 2
    }
    withClue(s"z suppkey files ${touchS(z)}/$nFiles:") {
      touchS(z) should be <= nFiles / 2
    }
    Cleanup(spark)
  }
}
