package graft

import java.sql.Timestamp

import graft.streaming.{CorpusIngest, EventStreams}
import graft.streaming.CorpusIngest.Doc
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Restart durability (round-8 verdict gap #3): StreamingSpec pins
  * stream == batch within ONE query lifetime; production deployments
  * additionally rely on `checkpointLocation` recovery — stop the query,
  * start a NEW one on the same checkpoint, and the operator state
  * (sessionizer per-user state, Bloom sketch words, windowed monitor
  * cells) must carry across the restart, not rebuild from zero.
  *
  * Each test here runs query #1 over a data prefix, stops it, starts a
  * fresh query instance from the same checkpoint, feeds the remainder,
  * and asserts the combined result equals the one-shot batch semantics —
  * which can only hold if the first instance's state survived. Sinks are
  * `foreachBatch` (the one sink that supports restart and lets a test
  * observe output across query instances); its at-least-once replay of a
  * trailing batch is absorbed the same way a production idempotent sink
  * would (distinct / last-snapshot-wins).
  */
class StreamingRestartSpec extends SparkSpec {

  import spark.implicits._

  private def tmin(min: Long): Timestamp =
    new Timestamp((2000000 + min) * 60000L)

  private def chkDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-restart-$tag")
      .toString

  // ---- sessionizer ----------------------------------------------------

  /** 8 users × 3 bursts; bursts are 10 events 1 min apart, gaps 60 min —
    * deterministic, time-sorted, with the halfway split landing inside
    * bursts so sessions genuinely straddle the restart. */
  private lazy val sessionEvents: Seq[Event] = {
    var id = 0L
    (for {
      u <- 1 to 8
      burst <- 0 until 3
      i <- 0 until 10
    } yield {
      id += 1
      Event(id, tmin(u * 7 + burst * 60 + i), u.toLong, "click",
        (u * 31 + burst * 7 + i) / 16.0, "{}")
    }).sortBy(e => (e.ts.getTime, e.event_id))
  }

  test("sessionizer state survives a checkpoint restart: straddling sessions merge, result == batch") {
    implicit val sqlCtx = spark.sqlContext
    val all = sessionEvents
    val (first, second) = all.splitAt(all.size / 2)
    // precondition — the split lands mid-session for at least one user,
    // else this test could pass with state dropped on the floor
    val splitTs = second.head.ts.getTime
    val straddlers = all.groupBy(_.user_id).filter { case (_, es) =>
      val before = es.filter(_.ts.getTime < splitTs).map(_.ts.getTime)
      val after = es.filter(_.ts.getTime >= splitTs).map(_.ts.getTime)
      before.nonEmpty && after.nonEmpty &&
        (after.min - before.max) < 30 * 60000L
    }
    straddlers should not be empty

    val chk = chkDir("sess")
    val mem = MemoryStream[Event]
    val buf = scala.collection.mutable.ArrayBuffer[Row]()
    def start() = EventStreams.sessionize(mem.toDS(), gapMinutes = 30)
      .toDF().writeStream.outputMode(OutputMode.Update)
      .option("checkpointLocation", chk)
      .foreachBatch { (df: Dataset[Row], _: Long) =>
        val rows = df.collect(); buf.synchronized { buf ++= rows }; ()
      }.start()

    val q1 = start()
    first.grouped(60).foreach { b => mem.addData(b); q1.processAllAvailable() }
    q1.stop(); q1.awaitTermination()

    val q2 = start() // NEW query instance, same checkpoint
    try {
      second.grouped(60).foreach { b => mem.addData(b); q2.processAllAvailable() }
      val updates = spark.createDataFrame(
        spark.sparkContext.parallelize(buf.synchronized(buf.toSeq)),
        EventStreams.sessionize(all.toDS(), 30).schema)
      // closed sessions + final open session per user == batch sessions
      // (same reconstruction as StreamingSpec's single-lifetime test;
      // distinct absorbs foreachBatch's at-least-once replays)
      val finalOpen = updates.filter(!col("closed"))
        .groupBy("user_id")
        .agg(max_by(struct(col("session_start"), col("session_end"),
          col("n_events"), col("sum_value")), col("session_end")).as("s"))
        .select(col("user_id"), col("s.session_start"),
          col("s.n_events"), col("s.sum_value"))
      val closed = updates.filter(col("closed"))
        .select("user_id", "session_start", "n_events", "sum_value")
        .distinct()
      val ours = closed.unionAll(finalOpen)
        .withColumn("sum_value", round(col("sum_value"), 6))
      val batch = EventStreams.sessions(all.toDS().toDF())
        .withColumn("sum_value", round(col("sum_value"), 6))
        .select("user_id", "session_start", "n_events", "sum_value")
      canon(ours) shouldBe canon(batch)
      // durability, explicitly: each straddling user's spanning session
      // appears ONCE with the full pre+post event count — a state-losing
      // restart would emit it split in two
      straddlers.keys.foreach { u =>
        val sessions = canon(ours.filter(col("user_id") === u))
        sessions shouldBe canon(batch.filter(col("user_id") === u))
      }
    } finally q2.stop()
  }

  // ---- complete-mode sketches ----------------------------------------

  /** Run `transform` in Complete mode across a restart: query #1 sees
    * `first`, is stopped, query #2 resumes from the same checkpoint and
    * sees `second`; returns the final full-state snapshot (last
    * foreachBatch emission wins — snapshot replay is idempotent). */
  private def completeAcrossRestart[T](mem: MemoryStream[T],
      feed: (Seq[Seq[T]], org.apache.spark.sql.streaming.StreamingQuery) => Unit,
      first: Seq[Seq[T]], second: Seq[Seq[T]],
      out: DataFrame): Array[Row] = {
    val chk = chkDir("complete")
    @volatile var last: Array[Row] = Array.empty
    def start() = out.writeStream.outputMode(OutputMode.Complete)
      .option("checkpointLocation", chk)
      .foreachBatch { (df: Dataset[Row], _: Long) =>
        last = df.collect(); ()
      }.start()
    val q1 = start()
    feed(first, q1)
    q1.stop(); q1.awaitTermination()
    val q2 = start()
    try { feed(second, q2); last } finally q2.stop()
  }

  test("streaming Bloom sketch survives a checkpoint restart: pre-restart words persist") {
    implicit val sqlCtx = spark.sqlContext
    def text(seed: Int): String = {
      val rnd = new scala.util.Random(seed)
      (0 until 40).map(_ => s"w${rnd.nextInt(500)}").mkString(" ")
    }
    val docs = (0 until 120).map(i => Doc(i, tmin(i), text(300 + i)))
    val mem = MemoryStream[Doc]
    val got = completeAcrossRestart[Doc](mem,
      (bs, q) => bs.foreach { b => mem.addData(b); q.processAllAvailable() },
      Seq(docs.take(60)), Seq(docs.drop(60)),
      CorpusIngest.bloomSketch(mem.toDS()))
      .map(r => r.getAs[Long]("word") -> r.getAs[Long]("bits")).toMap
    val batch = graft.operators.PipelineQueries.bloomWordsOf(
        docs.toDF().select(md5($"text").as("dig")).distinct())
      .collect().map(r => r.getAs[Long]("word") -> r.getAs[Long]("bits"))
      .filter(_._2 != 0L).toMap
    got shouldBe batch
    // and the first half's bits really are part of that equality — the
    // second half alone misses words the full sketch carries
    val halfOnly = graft.operators.PipelineQueries.bloomWordsOf(
        docs.drop(60).toDF().select(md5($"text").as("dig")).distinct())
      .collect().map(r => r.getAs[Long]("word") -> r.getAs[Long]("bits"))
      .filter(_._2 != 0L).toMap
    halfOnly should not be batch
  }

  test("streaming content dedup suppresses a post-restart re-delivery of a pre-restart document") {
    implicit val sqlCtx = spark.sqlContext
    def text(seed: Int): String = {
      val rnd = new scala.util.Random(seed)
      (0 until 60).map(_ => s"w${rnd.nextInt(400)}").mkString(" ")
    }
    val tA = text(1); val tB = text(2); val tC = text(3)
    // doc 0 (tA) and doc 1 (tB) arrive before the restart; doc 2
    // re-delivers tA AFTER it — only recovered digest state can
    // suppress it. doc 3 (tC) is genuinely new and must pass.
    val firstDocs = Seq(Doc(0, tmin(0), tA), Doc(1, tmin(1), tB))
    val secondDocs = Seq(Doc(2, tmin(2), tA), Doc(3, tmin(3), tC))

    val chk = chkDir("dedup")
    val mem = MemoryStream[Doc]
    val buf = scala.collection.mutable.ArrayBuffer[Row]()
    def start() = CorpusIngest.dedupExact(mem.toDS())
      .toDF().writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", chk)
      .foreachBatch { (df: Dataset[Row], _: Long) =>
        val rows = df.collect(); buf.synchronized { buf ++= rows }; ()
      }.start()
    val q1 = start()
    mem.addData(firstDocs); q1.processAllAvailable()
    q1.stop(); q1.awaitTermination()
    val q2 = start()
    try {
      mem.addData(secondDocs); q2.processAllAvailable()
      val kept = buf.synchronized(buf.toSeq)
        .map(_.getAs[Long]("doc_id")).distinct.sorted
      kept shouldBe Seq(0L, 1L, 3L)
      // the batch twin over the full feed keeps the same survivors
      CorpusIngest.dedupExact((firstDocs ++ secondDocs).toDS()).collect()
        .map(_.doc_id).sorted.toSeq shouldBe kept
    } finally q2.stop()
  }

  test("streaming MinHash near-dup finds a pair that straddles the restart") {
    implicit val sqlCtx = spark.sqlContext
    // doc 0 arrives before the restart; its near-duplicate doc 1 after —
    // the pair can only be reported if doc 0's band signatures were
    // recovered from the checkpointed band-list state
    val base = (0 until 120).map(i => s"w${(i * 37) % 500}").toArray
    val near = (base.take(110) ++ base.take(10)).mkString(" ")
    val far = (0 until 120).map(i => s"x${(i * 53) % 500}").mkString(" ")
    val firstDocs = Seq(Doc(0, tmin(0), base.mkString(" ")),
      Doc(2, tmin(1), far))
    val secondDocs = Seq(Doc(1, tmin(2), near))

    val chk = chkDir("neardup")
    val mem = MemoryStream[Doc]
    val buf = scala.collection.mutable.ArrayBuffer[Row]()
    def start() = CorpusIngest.nearDupPairs(mem.toDS())
      .toDF().writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", chk)
      .foreachBatch { (df: Dataset[Row], _: Long) =>
        val rows = df.collect(); buf.synchronized { buf ++= rows }; ()
      }.start()
    val q1 = start()
    mem.addData(firstDocs); q1.processAllAvailable()
    buf.synchronized(buf.size) shouldBe 0 // no pair exists pre-restart
    q1.stop(); q1.awaitTermination()
    val q2 = start()
    try {
      mem.addData(secondDocs); q2.processAllAvailable()
      val pairs = buf.synchronized(buf.toSeq)
        .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
        .distinct.sorted
      pairs shouldBe Seq((0L, 1L))
      // batch twin over the full feed reports the same single pair
      CorpusIngest.nearDupPairs((firstDocs ++ secondDocs).toDS()).collect()
        .map(p => (p.a_id, p.b_id)).distinct.sorted.toSeq shouldBe pairs
    } finally q2.stop()
  }

  test("windowed monitor sketch cells survive a checkpoint restart") {
    implicit val sqlCtx = spark.sqlContext
    // reuse the session fixture's bursty arrivals; windows are 1 day so
    // every event lands in one window and the restart splits its content
    val all = sessionEvents
    val mem = MemoryStream[Event]
    val got = completeAcrossRestart[Event](mem,
      (bs, q) => bs.foreach { b => mem.addData(b); q.processAllAvailable() },
      Seq(all.take(all.size / 2)), Seq(all.drop(all.size / 2)),
      EventStreams.windowedMonitor(mem.toDF()))
    val batch = EventStreams.windowedMonitor(all.toDS().toDF()).collect()
    got.map(_.toString).sorted.toSeq shouldBe batch.map(_.toString).sorted.toSeq
  }

  // ---- kill DURING a batch (round-11 ask #7) --------------------------
  //
  // The clean-stop tests above exercise recovery from a COMMITTED
  // checkpoint. The at-least-once edge production actually fears is a
  // crash between the sink observing a batch's output and the commit log
  // recording it: Structured Streaming writes the offset WAL before
  // running a batch and the commit log after, so a failure in that window
  // replays the whole batch (same batchId, same offset range) on restart
  // — the sink sees the emission twice and the operator redoes the
  // batch's state transition from the previous committed version. The
  // tests inject that crash deterministically: foreachBatch buffers the
  // output, then THROWS — output emitted, commit never written.

  test("sessionizer: a batch that crashes after sink output replays on restart — no loss, duplication absorbed") {
    implicit val sqlCtx = spark.sqlContext
    val all = sessionEvents
    val (first, second) = all.splitAt(all.size / 2)
    val chk = chkDir("sess-crash")
    val mem = MemoryStream[Event]
    val buf = scala.collection.mutable.ArrayBuffer[Row]()
    val emissions = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
    @volatile var crashArmed = false
    def start() = EventStreams.sessionize(mem.toDS(), gapMinutes = 30)
      .toDF().writeStream.outputMode(OutputMode.Update)
      .option("checkpointLocation", chk)
      .foreachBatch { (df: Dataset[Row], bid: Long) =>
        val rows = df.collect()
        buf.synchronized { buf ++= rows; emissions += (bid -> rows.length) }
        // crash AFTER the sink wrote, BEFORE the commit log records the
        // batch — the exact at-least-once window
        if (crashArmed && rows.nonEmpty) {
          crashArmed = false
          throw new RuntimeException("injected mid-batch crash")
        }
        ()
      }.start()

    val q1 = start()
    first.grouped(60).foreach { b => mem.addData(b); q1.processAllAvailable() }
    // arm the crash and feed the first post-split chunk: its batch will
    // emit to the sink, then die uncommitted
    crashArmed = true
    val (crashChunk, rest) = second.splitAt(60)
    mem.addData(crashChunk)
    scala.util.Try(q1.processAllAvailable()) // query dies on the injection
    scala.util.Try(q1.awaitTermination())
    q1.isActive shouldBe false

    val q2 = start() // same checkpoint: must REPLAY the crashed batch
    try {
      rest.grouped(60).foreach { b => mem.addData(b); q2.processAllAvailable() }
      q2.processAllAvailable()
      // the replay really happened: some batchId emitted twice
      // same monitor as the writer (buf.synchronized guards emissions too)
      val byBatch = buf.synchronized(emissions.toSeq)
        .groupBy(_._1).view.mapValues(_.size)
      byBatch.values.max should be >= 2
      // and end-to-end semantics survived it: the same reconstruction as
      // the clean-restart test (distinct absorbs the duplicate emission)
      val updates = spark.createDataFrame(
        spark.sparkContext.parallelize(buf.synchronized(buf.toSeq)),
        EventStreams.sessionize(all.toDS(), 30).schema)
      val finalOpen = updates.filter(!col("closed"))
        .groupBy("user_id")
        .agg(max_by(struct(col("session_start"), col("session_end"),
          col("n_events"), col("sum_value")), col("session_end")).as("s"))
        .select(col("user_id"), col("s.session_start"),
          col("s.n_events"), col("s.sum_value"))
      val closed = updates.filter(col("closed"))
        .select("user_id", "session_start", "n_events", "sum_value")
        .distinct()
      val ours = closed.unionAll(finalOpen)
        .withColumn("sum_value", round(col("sum_value"), 6))
      val batch = EventStreams.sessions(all.toDS().toDF())
        .withColumn("sum_value", round(col("sum_value"), 6))
        .select("user_id", "session_start", "n_events", "sum_value")
      canon(ours) shouldBe canon(batch)
    } finally q2.stop()
  }

  test("Bloom sketch: a batch that crashes after sink output replays on restart — final state == batch") {
    implicit val sqlCtx = spark.sqlContext
    def text(seed: Int): String = {
      val rnd = new scala.util.Random(seed)
      (0 until 40).map(_ => s"w${rnd.nextInt(500)}").mkString(" ")
    }
    val docs = (0 until 120).map(i => Doc(i, tmin(i), text(700 + i)))
    val chk = chkDir("bloom-crash")
    val mem = MemoryStream[Doc]
    @volatile var last: Array[Row] = Array.empty
    val seenBatches = scala.collection.mutable.ArrayBuffer[Long]()
    @volatile var crashArmed = false
    def start() = CorpusIngest.bloomSketch(mem.toDS())
      .writeStream.outputMode(OutputMode.Complete)
      .option("checkpointLocation", chk)
      .foreachBatch { (df: Dataset[Row], bid: Long) =>
        last = df.collect()
        seenBatches.synchronized { seenBatches += bid }
        if (crashArmed) {
          crashArmed = false
          throw new RuntimeException("injected mid-batch crash")
        }
        ()
      }.start()

    val q1 = start()
    mem.addData(docs.take(60)); q1.processAllAvailable()
    crashArmed = true
    mem.addData(docs.slice(60, 90))
    scala.util.Try(q1.processAllAvailable())
    scala.util.Try(q1.awaitTermination())
    q1.isActive shouldBe false

    val q2 = start()
    try {
      mem.addData(docs.drop(90)); q2.processAllAvailable()
      // the crashed batchId was re-delivered to the sink
      val ids = seenBatches.synchronized(seenBatches.toSeq)
      ids.groupBy(identity).values.map(_.size).max should be >= 2
      // last-snapshot-wins absorbs the replay; no word lost, none doubled
      // (Complete-mode bits are idempotent ORs, so equality is exact)
      val got = last
        .map(r => r.getAs[Long]("word") -> r.getAs[Long]("bits")).toMap
      val batch = graft.operators.PipelineQueries.bloomWordsOf(
          docs.toDF().select(md5($"text").as("dig")).distinct())
        .collect().map(r => r.getAs[Long]("word") -> r.getAs[Long]("bits"))
        .filter(_._2 != 0L).toMap
      got shouldBe batch
    } finally q2.stop()
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq
}
