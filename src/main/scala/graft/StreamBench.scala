package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming throughput/latency probe (round-12 verdict ask #5): drive
  * [[graft.streaming.EventStreams.windowedMonitor]] over the events
  * table as a RATE-LIMITED file stream and publish the operational half
  * of the bounded-state claim — sustained rows/s, per-batch latency,
  * and the state-store trajectory across the run.
  *
  * Shape: the events table is split (untimed prep) into
  * `SPARK_GRAFT_STREAM_FILES` time-range-partitioned parquet files; the
  * query reads them back as a file stream at
  * `SPARK_GRAFT_FILES_PER_TRIGGER` files per micro-batch into the fused
  * monitor (1 HLL + d count-min + 1 histogram cell per event, one
  * exchange, one mixed aggregate) and discards output to the `noop`
  * sink in Update mode, so the measured cost is the operator, not a
  * sink. A [[StreamingQueryListener]] records every batch's input rows,
  * duration, and state-operator footprint.
  *
  * What "bounded state" means operationally, and what the artifact
  * shows: monitor state is |open windows| × (64 + d·w + bins) cells —
  * proportional to the event-time RANGE, NOT the event count. The
  * synthesized scale factors multiply event count inside the same time
  * range, so state rows must plateau at the same ceiling at sf0.1 and
  * sf10 while throughput scales with the box; `state_rows_max` across
  * scales is the flatness evidence SCALE.md publishes.
  *
  * Emits one JSON line (driver-tail style, like [[Bench]]); the
  * lossless per-batch record goes to target/streambench.json.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_STREAM_FILES", "100").toInt
    val perTrigger = sys.env.getOrElse("SPARK_GRAFT_FILES_PER_TRIGGER", "5")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed prep: one arrival unit per time-range slice (files arrive
    // roughly in event-time order, the realistic ingestion shape)
    val work = java.nio.file.Files.createTempDirectory("streambench")
    val srcDir = s"$work/events"
    val ckpt = s"$work/ckpt"
    val ev = Tables.events(spark, sfDir).select("ts", "user_id", "value")
    val total = ev.count()
    ev.repartitionByRange(nFiles, col("ts"))
      .write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    final case class B(id: Long, rows: Long, durMs: Long,
        stateRows: Long, stateBytes: Long)
    val batches = scala.collection.mutable.ArrayBuffer.empty[B]
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val so = p.stateOperators
        batches.synchronized {
          batches += B(p.batchId, p.numInputRows, p.batchDuration,
            if (so.nonEmpty) so.map(_.numRowsTotal).sum else -1L,
            if (so.nonEmpty) so.map(_.memoryUsedBytes).sum else -1L)
        }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", perTrigger).parquet(srcDir)
    val t0 = System.nanoTime()
    val q = graft.streaming.EventStreams.windowedMonitor(stream)
      .writeStream.format("noop").outputMode("update")
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    q.stop()
    val wall = (System.nanoTime() - t0) / 1e9

    val bs = batches.synchronized(batches.toSeq)
      .filter(_.rows > 0).sortBy(_.id)
    val durs = bs.map(_.durMs).sorted
    def r2(x: Double): Double = math.rint(x * 100) / 100
    val json =
      s"""{"metric":"stream_rows_per_sec","value":${r2(total / wall)},""" +
      s""""unit":"rows/sec","sf":"$sfDir","total_rows":$total,""" +
      s""""wall_sec":${r2(wall)},"n_batches":${bs.size},""" +
      s""""batch_ms_median":${if (durs.nonEmpty) durs(durs.size / 2) else -1},""" +
      s""""batch_ms_max":${if (durs.nonEmpty) durs.last else -1},""" +
      s""""state_rows_first":${bs.headOption.map(_.stateRows).getOrElse(-1L)},""" +
      s""""state_rows_max":${if (bs.nonEmpty) bs.map(_.stateRows).max else -1L},""" +
      s""""state_rows_last":${bs.lastOption.map(_.stateRows).getOrElse(-1L)},""" +
      s""""state_bytes_max":${if (bs.nonEmpty) bs.map(_.stateBytes).max else -1L},""" +
      s""""files":$nFiles,"files_per_trigger":$perTrigger}"""
    new java.io.File("target").mkdirs()
    val detail = bs.map(b => s"""{"batch":${b.id},"rows":${b.rows},""" +
      s""""ms":${b.durMs},"state_rows":${b.stateRows},""" +
      s""""state_bytes":${b.stateBytes}}""").mkString("[", ",", "]")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/streambench.json"),
      json.dropRight(1) + s""","batches":$detail}""" + "\n")
    spark.stop()
    println(json)
  }
}
