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

  test("composed scale path: z-ordered layout and runtime bloom filter prune the same fact scan") {
    // The two scale features proven separately in round 5 (LayoutSpec
    // file pruning; OptimizerSpec bloom injection), composed on ONE
    // plan: a z-ordered fact table scanned under a second-dimension
    // predicate (file-footprint pruning) and joined to a selective
    // dimension past the broadcast threshold (runtime bloom filter on
    // the probe rows). This is the 100 TB fact-fact shape: static
    // pruning cuts the files read, the runtime filter cuts the rows
    // shuffled — multiplicative, on different columns of the same scan.
    import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec}
    val sfd = sys.env.getOrElse("GRAFT_LAYOUT_SF", "/root/testdata/sf0.01")
    val zDir = "/tmp/layout_zb"
    val nFiles = 32
    val li = Tables.lineitem(spark, sfd)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    Layout.zorderWrite(li, "l_partkey", "l_suppkey", zDir, nFiles)
    val conf = spark.conf
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "100MB")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      // concrete (non-adaptive) plan so per-node metrics are reachable
      conf.set("spark.sql.adaptive.enabled", "false")
      val dim = Tables.part(spark, sfd)
        .filter(col("p_brand") === "Brand#11").select("p_partkey")
      val probe = spark.read.parquet(zDir).filter(col("l_suppkey") <= 10)
      val joined = probe.join(dim, col("l_partkey") === col("p_partkey"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
      val opt = joined.queryExecution.optimizedPlan.toString
      withClue(s"optimized plan:\n$opt") { opt should include("might_contain") }
      val result = joined.collect()

      // (1) footprint pruning: files whose suppkey range meets [1, 10]
      val fp = spark.read.parquet(zDir)
        .groupBy(input_file_name().as("f"))
        .agg(min("l_suppkey").as("lo"), max("l_suppkey").as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      val filesTouched = fp.count { case (lo, hi) => hi >= 1L && lo <= 10L }

      // (2) runtime-filter row pruning: output of the might_contain
      // filter vs the suppkey-filtered probe rows entering it
      val bloomFilters = joined.queryExecution.executedPlan.collect {
        case f: FilterExec if f.condition.toString.contains("might_contain")
          => f
      }
      bloomFilters should not be empty
      val survived = bloomFilters.head.metrics("numOutputRows").value
      val probeRows = probe.count()

      // cross-check the composed plan returns the same answer without
      // either feature
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val control = li.filter(col("l_suppkey") <= 10)
        .join(dim, col("l_partkey") === col("p_partkey"))
        .agg(sum(col("l_quantity").cast("long")).as("q")).collect()
      result shouldBe control

      info(s"files touched $filesTouched/$nFiles; probe rows " +
        s"$probeRows -> $survived after the runtime bloom filter")
      filesTouched should be <= nFiles / 2
      survived.toDouble should be < probeRows * 0.5
    } finally {
      prev.foreach { case (k, v) => conf.set(k, v) }
      Cleanup(spark)
    }
  }
}
