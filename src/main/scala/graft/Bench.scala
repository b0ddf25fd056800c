package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default matches the contract environment: local[32], 32 shuffle
    // partitions (SPARK_GRAFT_CPUS overrides for constrained local runs)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: JVM/codegen/scheduler spin-up otherwise lands on
    // whichever query happens to run first, skewing its number by ~4s.
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).limit(10).collect()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // record -1 on failure: a swallowed exception must not masquerade
      // as a (fast) timing
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // total sums SUCCESSFUL timings only — summing the -1 sentinels would
    // make a failing run look FASTER; failures are listed explicitly
    val total = results.values.filter(_ >= 0).sum
    val failed = results.collect { case (k, v) if v < 0 => s"\"$k\"" }
      .mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
