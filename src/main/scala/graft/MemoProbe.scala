package graft

import org.apache.spark.sql.SparkSession

/** Cold-build cost probe for the [[Memo]]-shared frames: starting from
  * an empty memo, times each builder IN DEPENDENCY ORDER, so each
  * number is that builder's INCREMENTAL cost given its memoized
  * dependencies (kCoreShared is timed after coOccurEdgesCk; bfsShared
  * and lpaAssignment after weightedEdges) and the TOTAL is the true
  * cold end-to-end cost of all shared builds — the one-time figure the
  * per-query bench marginals exclude (min-of-reps drops the first
  * consumer's build rep). A single query run alone cold pays its own
  * dependency chain, i.e. the SUM of its builders' lines, not one
  * line. Run: `sbt "runMain graft.MemoProbe [sfDir]"`.
  */
object MemoProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // builders are eager (localCheckpoint(true)), so wall time around the
    // call IS the materialization cost; warm-up once on sf0.001 to keep
    // JVM/codegen cold-start out of the numbers
    operators.Graph.edgeFrames(spark, "/root/testdata/sf0.001")
    Memo.clear(); Cleanup(spark)
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("edgeFrames") { operators.Graph.edgeFrames(spark, d) }
    time("coOccurEdgesCk") { operators.Graph.coOccurEdgesCk(spark, d) }
    time("weightedEdges") { operators.Graph.weightedEdges(spark, d) }
    time("lpaAssignment") { operators.Graph.lpaAssignment(spark, d) }
    time("kCoreShared") { operators.Graph.kCoreShared(spark, d) }
    time("bfsShared") { operators.Graph.bfsShared(spark, d) }
    time("jaccardPairsShared") {
      operators.PipelineQueries.jaccardPairsShared(spark, d)
    }
    time("tfMatrix") { operators.TextQueries.tfMatrix(spark, d) }
    spark.stop()
  }
}
