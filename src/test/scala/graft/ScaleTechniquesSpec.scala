package graft


import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Scale-technique demonstrations with verifiable local behavior:
  * bucketed co-located joins (no Exchange in the plan) and salted skew
  * joins (identical results to the plain join).
  */
class ScaleTechniquesSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    // (warehouse dir is a static conf — managed tables land in the
    // default ./spark-warehouse, dropped below and gitignored)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    try {
      Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_custkey", "o_orderpriority")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("b_orders")
      Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("b_lineitem")

      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      // Both sides pre-bucketed on the key: the sort-merge join consumes
      // bucket files directly — no Exchange anywhere in the join subtree.
      val plan = joined.queryExecution.executedPlan.toString
      withClue(plan) {
        plan should not include "Exchange hashpartitioning"
      }
      // and it is still correct
      val expect = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey")).count()
      joined.count() shouldBe expect
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("salted join equals the plain join on a skewed key distribution") {
    import spark.implicits._
    // Hot-key distribution: 80% of rows share key 1.
    val rnd = new scala.util.Random(7)
    val large = (0 until 5000).map { i =>
      (i.toLong, if (rnd.nextDouble() < 0.8) 1L else (rnd.nextInt(20) + 2).toLong)
    }.toDF("row_id", "k")
    val small = (1 to 21).map(k => (k.toLong, s"dim$k")).toDF("k", "name")

    val plain = large.join(small, "k")
      .select("row_id", "k", "name").collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(large, small, "k", nSalts = 8,
      saltSource = col("row_id"))
      .select("row_id", "k", "name").collect().map(_.toString).sorted
    salted shouldBe plain

    // The salt actually spreads the hot key across partitions.
    val spread = large.withColumn("__salt",
      pmod(xxhash64(col("row_id")), lit(8)).cast("int"))
      .filter(col("k") === 1)
      .select("__salt").distinct().count()
    spread should be >= 6L
  }
}
