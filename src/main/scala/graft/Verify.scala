package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: restrict to the named queries (local iteration;
    // the driver always runs the full set)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shuffle partitions scale with DATA at big sf, same knob as Bench
    val shufParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    // big-sf mode (SPARK_GRAFT_SETTLE=1): scratch-settle at query
    // boundaries so a big-sf oracle sweep doesn't ENOSPC-cascade on dead
    // shuffle files (Cleanup scaladoc; the cleaner confs are static)
    val settle = sys.env.get("SPARK_GRAFT_SETTLE").exists(_.trim == "1")
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufParts)
      .config("spark.sql.session.timeZone", "UTC")
      // let AQE re-coalesce cached-plan output (see Bench.scala)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
    val spark =
      (if (settle) Cleanup.settleBuilderConfs(builder0) else builder0)
        .getOrCreate()
    if (settle) spark.conf.set("graft.cleanup.settleScratch", "true")
    spark.sparkContext.setLogLevel("WARN")
    // pinned-byte memo budget, same default as Bench (round-15 verdict
    // #9): SPARK_GRAFT_MEMO_BUDGET overrides, else half the nominal
    // storage pool — corpus-width pins evict cost-aware at big sf
    // instead of warn-and-OOM; far above the gate working set.
    val memoBudget = sys.env.get("SPARK_GRAFT_MEMO_BUDGET").getOrElse {
      def frac(k: String, dflt: Double) = spark.conf.getOption(k)
        .flatMap(v => scala.util.Try(v.trim.toDouble).toOption).getOrElse(dflt)
      val pool = Runtime.getRuntime.maxMemory *
        frac("spark.memory.fraction", 0.6) *
        frac("spark.memory.storageFraction", 0.5)
      (pool / 2).toLong.toString
    }
    spark.conf.set("graft.memo.maxPinnedBytes", memoBudget)
    // optional edge-checkpoint storage dispatch override (see Bench)
    sys.env.get("SPARK_GRAFT_SER_CKPT_BYTES").foreach(b =>
      spark.conf.set("graft.graph.serializedCheckpointBytes", b))
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      Cleanup(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
