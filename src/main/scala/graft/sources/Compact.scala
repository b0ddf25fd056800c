package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the standing operational problem of any
  * long-lived 100 TB lake: streaming sinks and over-parallel writers leave
  * directories of KB-scale parquet files whose per-file open/footer cost
  * dominates scans and whose count explodes driver-side listings.
  *
  * `compact` rewrites a parquet directory into ~`targetBytes` output files:
  * file count comes from the ACTUAL on-disk byte size (listed via the
  * Hadoop FS, so it works on any FileSystem implementation), not a guess
  * from row counts. The rewrite is one narrow-ish job — a round-robin
  * `repartition(n)` whose shuffle moves each row once; column order,
  * schema, and row multiset are preserved exactly (asserted in
  * CompactionSpec). Partitioned layouts should compact per partition
  * directory so the partition pruning structure survives.
  */
object Compact {

  final case class Stats(inFiles: Long, inBytes: Long, outFiles: Long)

  /** Total bytes and file count of the parquet data files under `dir`. */
  def dirStats(spark: SparkSession, dir: String): (Long, Long) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var files = 0L
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      // count data files only — skip _SUCCESS markers and hidden files
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        files += 1
        bytes += f.getLen
      }
    }
    (files, bytes)
  }

  /** Rewrite `inDir` (parquet) into `outDir` as ceil(bytes/targetBytes)
    * files. Returns before/after stats. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L << 20): Stats = {
    require(targetBytes > 0, "targetBytes must be positive")
    val (inFiles, inBytes) = dirStats(spark, inDir)
    val n = math.max(1L, (inBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartition(n)
      .write.mode("overwrite").parquet(outDir)
    val (outFiles, _) = dirStats(spark, outDir)
    Stats(inFiles, inBytes, outFiles)
  }
}
