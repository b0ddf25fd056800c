import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** USAGE.md's dedup-chain and graph-fixpoint examples, compiled and run
  * against the PACKAGED jar only (driven by tools/package_check.sh with
  * target/classes explicitly OFF the classpath) — proves the published
  * artifact carries the documented public API, not just the source
  * tree. Mirrors graftusage.UsageSpec, which pins the same surface
  * in-tree.
  */
object PackagedUsage {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-packaged-usage")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      // dedup chain: candidate pairs -> connected components -> verdict
      val docs = graft.Tables.documents(spark, dir)
      val pairs = graft.operators.PipelineQueries.jaccardPairs(docs)
        .filter(col("jaccard") >= 0.3)
        .select(col("a_id").as("a"), col("b_id").as("b"))
        .localCheckpoint(true)
      val verdict = graft.operators.Dedup.resolve(docs.select("doc_id"), pairs)
      val n = verdict.count()
      require(n == docs.count(), s"verdict rows $n != corpus rows")

      // graph fixpoint on explicit frames
      import spark.implicits._
      val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L))
      val e = (und ++ und.map(_.swap)).toDF("src", "dst")
      val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val (pr, rounds) = graft.operators.Graph.pagerankFixpoint(
        e, deg, n = 4L, eps = 1e-9, maxRounds = 50)
      val mass = pr.agg(sum("pr")).head.getDouble(0)
      require(math.abs(mass - 1.0) < 1e-6, s"rank mass $mass != 1")

      println(s"PACKAGED-USAGE-OK verdictRows=$n prRounds=$rounds")
    } finally spark.stop()
  }
}
