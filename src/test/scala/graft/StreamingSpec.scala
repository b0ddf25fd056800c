package graft

import java.sql.Timestamp

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Batch/stream equivalence harness (SURVEY.md §7.3(5)): the same
  * transform run (a) statically over events.parquet and (b) incrementally
  * over a MemoryStream fed the same rows in several micro-batches must
  * produce identical results — streaming is the incremental execution of
  * the one declared plan, not a second implementation.
  */
class StreamingSpec extends SparkSpec {

  /** Deterministic synthetic events, shaped like the testdata table
    * (bursty per-user arrivals → real session gaps; purchase/error types
    * for the interval join) but generated in-process: the stream==batch
    * equivalence property is about the TRANSFORMS, not any external
    * table, and a generated fixture keeps this suite green across
    * testdata regenerations (the round-6 failure mode).
    */
  private lazy val fixtureEvents: Seq[Event] = {
    val rnd = new scala.util.Random(20240501L)
    val types = Array("click", "view", "purchase", "error")
    val t0 = Timestamp.valueOf("2024-05-01 00:00:00").getTime
    var id = 0L
    (1 to 40).flatMap { user =>
      // each user: a few bursts separated by >30 min (session gaps),
      // events inside a burst seconds-to-minutes apart
      var t = t0 + rnd.nextInt(3 * 3600) * 1000L
      (0 until 2 + rnd.nextInt(3)).flatMap { _ =>
        t += (45 + rnd.nextInt(180)) * 60000L // inter-burst gap ≥ 45 min
        (0 until 3 + rnd.nextInt(8)).map { _ =>
          t += (5 + rnd.nextInt(600)) * 1000L
          id += 1
          Event(id, new Timestamp(t), user.toLong,
            types(rnd.nextInt(types.length)),
            math.rint(rnd.nextDouble() * 1000) / 16.0,
            s"""{"n":${rnd.nextInt(100)}}""")
        }
      }
      // globally time-sorted, like the real table: several consumers feed
      // chunks in sequence order, and watermark-bearing stateful operators
      // (dedupEvents) drop arrivals behind the watermark — an unordered
      // fixture would silently shed whole users as "late data"
    }.sortBy(e => (e.ts.getTime, e.event_id))
  }

  private def staticEvents: DataFrame = {
    import spark.implicits._
    fixtureEvents.toDS().toDF()
  }

  private def asEvents: Seq[Event] = fixtureEvents

  /** Run a streaming aggregation over the events fed in `nChunks`
    * micro-batches; return the final complete-mode result. */
  private def runStream(transform: DataFrame => DataFrame, nChunks: Int)
      : DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val name = s"stream_out_${System.nanoTime()}"
    val q = transform(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Complete)
      .start()
    try {
      val all = asEvents
      val chunk = math.max(1, all.size / nChunks)
      all.grouped(chunk).foreach { batch =>
        mem.addData(batch)
        q.processAllAvailable()
      }
      spark.table(name)
    } finally q.stop()
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("tumbling window: streaming over micro-batches == batch") {
    val batch = EventStreams.tumbling(staticEvents)
      .withColumn("sum_value", round(col("sum_value"), 6))
    val stream = runStream(EventStreams.tumbling(_), nChunks = 7)
      .withColumn("sum_value", round(col("sum_value"), 6))
    canon(stream) shouldBe canon(batch)
  }

  test("sliding window: streaming == batch, rows appear in every overlapping window") {
    val batch = EventStreams.sliding(staticEvents)
      .withColumn("sum_value", round(col("sum_value"), 6))
    val stream = runStream(EventStreams.sliding(_), nChunks = 5)
      .withColumn("sum_value", round(col("sum_value"), 6))
    canon(stream) shouldBe canon(batch)
    // each event lands in width/slide = 2 windows
    val n = staticEvents.count()
    batch.agg(sum("n")).head().getLong(0) shouldBe 2 * n
  }

  test("windowed HLL sketch: streaming == batch, registers only grow") {
    val batch = EventStreams.windowedDistinctSketch(staticEvents)
    val stream = runStream(EventStreams.windowedDistinctSketch(_), nChunks = 6)
    canon(stream) shouldBe canon(batch)
    // bounded-state property: per window at most m = 64 register rows,
    // regardless of how many distinct users the window saw
    batch.groupBy("ws").count().agg(max("count")).head().getLong(0) should
      be <= 64L
  }

  test("windowed count-min sketch: streaming == batch, cell count bounded") {
    val batch = EventStreams.windowedFreqSketch(staticEvents)
    val stream = runStream(EventStreams.windowedFreqSketch(_), nChunks = 5)
    canon(stream) shouldBe canon(batch)
    // bounded-state property: at most d*w = 1024 cells per window
    batch.groupBy("ws").count().agg(max("count")).head().getLong(0) should
      be <= 1024L
    // conservation: each of the d rows counts every event exactly once
    val n = staticEvents.count()
    batch.groupBy("r").agg(sum("cnt").as("s")).collect()
      .foreach(_.getLong(1) shouldBe n)
  }

  test("windowed value histogram: streaming == batch, bins bounded and conservative") {
    val batch = EventStreams.windowedValueHist(staticEvents)
    val stream = runStream(EventStreams.windowedValueHist(_), nChunks = 6)
    canon(stream) shouldBe canon(batch)
    // bounded-state property: at most 256 bin rows per window
    batch.groupBy("ws").count().agg(max("count")).head().getLong(0) should
      be <= 256L
    // conservation: the histogram counts every event exactly once
    batch.agg(sum("cnt")).head().getLong(0) shouldBe staticEvents.count()
  }

  test("windowed monitor (single-pass multi-sketch): streaming == batch, fused == standalone") {
    val batch = EventStreams.windowedMonitor(staticEvents)
    val stream = runStream(EventStreams.windowedMonitor(_), nChunks = 5)
    canon(stream) shouldBe canon(batch)
    // the fused cells must be bit-identical to the standalone sketches'
    val hll = EventStreams.windowedDistinctSketch(staticEvents)
      .select(col("ws"), lit("hll").as("family"), lit(0).as("r"),
        col("bucket").as("idx"), col("register").as("val"))
    val cm = EventStreams.windowedFreqSketch(staticEvents)
      .select(col("ws"), lit("cm").as("family"), col("r"),
        col("bkt").as("idx"), col("cnt").as("val"))
    val hist = EventStreams.windowedValueHist(staticEvents)
      .select(col("ws"), lit("hist").as("family"), lit(0).as("r"),
        col("bin").as("idx"), col("cnt").as("val"))
    canon(batch) shouldBe canon(hll.unionAll(cm).unionAll(hist))
    // bounded state: at most 64 + 4*256 + 256 cells per window
    batch.groupBy("ws").count().agg(max("count")).head().getLong(0) should
      be <= (64L + 4 * 256 + 256)
  }

  test("session windows: streaming == batch") {
    val batch = EventStreams.sessions(staticEvents)
      .withColumn("sum_value", round(col("sum_value"), 6))
    val stream = runStream(EventStreams.sessions(_), nChunks = 4)
      .withColumn("sum_value", round(col("sum_value"), 6))
    canon(stream) shouldBe canon(batch)
  }

  test("watermark bounds state in append mode without dropping in-order data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val name = s"wm_out_${System.nanoTime()}"
    val q = EventStreams.tumbling(EventStreams.watermarked(mem.toDF(), "1 hour"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      val all = asEvents.sortBy(_.ts.getTime)
      all.grouped(math.max(1, all.size / 5)).foreach { batch =>
        mem.addData(batch)
        q.processAllAvailable()
      }
      // Only windows at least 1h behind the max event time have been
      // finalized (append emits closed windows only).
      val emitted = spark.table(name)
      val maxTs = all.last.ts.getTime
      val closed = EventStreams.tumbling(staticEvents)
        .filter(col("ws") < new Timestamp(maxTs - 2 * 3600 * 1000L))
      val emittedKeys = emitted.select("ws", "event_type").collect()
        .map(_.toString).toSet
      closed.select("ws", "event_type").collect().map(_.toString)
        .foreach(k => emittedKeys should contain(k))
    } finally q.stop()
  }

  test("stateful sessionizer: closed sessions match session_window batch semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val name = s"sess_out_${System.nanoTime()}"
    val q = EventStreams.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
    try {
      // Feed in event-time order so per-user in-batch sort sees ordered data.
      val all = asEvents.sortBy(_.ts.getTime)
      all.grouped(200).foreach { batch =>
        mem.addData(batch)
        q.processAllAvailable()
      }
      val updates = spark.table(name)
      // closed sessions + the final open session per user == batch sessions
      val finalOpen = updates.filter(!col("closed"))
        .groupBy("user_id")
        .agg(max_by(struct(col("session_start"), col("session_end"),
          col("n_events"), col("sum_value")), col("session_end")).as("s"))
        .select(col("user_id"), col("s.session_start"), col("s.session_end"),
          col("s.n_events"), col("s.sum_value"))
      val closed = updates.filter(col("closed"))
        .select("user_id", "session_start", "session_end", "n_events",
          "sum_value").distinct()
      val ours = closed.unionAll(finalOpen)
        .withColumn("sum_value", round(col("sum_value"), 6))
        .select("user_id", "session_start", "n_events", "sum_value")
      // session_window end = last_ts + gap; compare on (start, n, sum)
      val batch = EventStreams.sessions(staticEvents)
        .withColumn("sum_value", round(col("sum_value"), 6))
        .select("user_id", "session_start", "n_events", "sum_value")
      canon(ours) shouldBe canon(batch)
    } finally q.stop()
  }

  test("stream-static broadcast enrichment == batch join, append mode, no state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = staticEvents.select("user_id").distinct()
      .withColumn("tier",
        when(col("user_id") % 3 === 0, "gold").otherwise("std"))
    val batch = EventStreams.enrich(staticEvents, dim, "user_id")
      .select("event_id", "user_id", "tier")

    val mem = MemoryStream[Event]
    val name = s"enrich_out_${System.nanoTime()}"
    val q = EventStreams.enrich(mem.toDF(), dim, "user_id")
      .select("event_id", "user_id", "tier")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      val all = asEvents
      all.grouped(math.max(1, all.size / 5)).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      canon(spark.table(name)) shouldBe canon(batch)
    } finally q.stop()
  }

  test("composed topology: dedup -> enrich -> windowed agg, stream == batch under re-delivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = staticEvents.select("user_id").distinct()
      .withColumn("tier", when(col("user_id") % 2 === 0, "even").otherwise("odd"))
    def topo(df: DataFrame): DataFrame =
      EventStreams.enrich(EventStreams.dedupEvents(df), dim, "user_id")
        .groupBy(window(col("ts"), "1 hour"), col("tier"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("tier"), col("n"))

    val batch = topo(staticEvents)

    val mem = MemoryStream[Event]
    val name = s"topo_out_${System.nanoTime()}"
    val q = topo(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Complete)
      .start()
    try {
      val all = asEvents
      all.grouped(math.max(1, all.size / 5)).foreach { b =>
        // at-least-once source: every chunk re-delivers part of itself;
        // the dedup stage must collapse it before the aggregate
        mem.addData(b ++ b.take(b.size / 3))
        q.processAllAvailable()
      }
      canon(spark.table(name)) shouldBe canon(batch)
    } finally q.stop()
  }

  test("stream-stream interval join == static range join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = asEvents.sortBy(_.ts.getTime)
    val isLeft = (e: Event) => e.event_type == "purchase"
    val isRight = (e: Event) => e.event_type == "error"

    val batch = EventStreams.intervalJoin(
      staticEvents.filter(col("event_type") === "purchase"),
      staticEvents.filter(col("event_type") === "error"),
      before = "30 minutes", after = "30 minutes")
      .select("event_id", "r_event_id")

    val memL = MemoryStream[Event]
    val memR = MemoryStream[Event]
    val name = s"ssj_out_${System.nanoTime()}"
    val q = EventStreams.intervalJoin(memL.toDF(), memR.toDF(),
      before = "30 minutes", after = "30 minutes",
      watermark = Some("2 hours"))
      .select("event_id", "r_event_id")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      all.grouped(math.max(1, all.size / 4)).foreach { chunk =>
        memL.addData(chunk.filter(isLeft))
        memR.addData(chunk.filter(isRight))
        q.processAllAvailable()
      }
      val got = spark.table(name).collect().map(_.toString).sorted.toSeq
      got shouldBe batch.collect().map(_.toString).sorted.toSeq
    } finally q.stop()
  }

  test("sessionizer merges a cross-batch late event instead of splitting the session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, t: String, v: Double) =
      Event(id, Timestamp.valueOf(t), 1L, "click", v, "{}")
    val mem = MemoryStream[Event]
    val name = s"sess_late_${System.nanoTime()}"
    val q = EventStreams.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(Seq(ev(1, "2024-01-01 10:00:00", 1.0)))
      q.processAllAvailable()
      // batch 2: a LATE 9:50 event plus an in-order 10:25 event. The late
      // event must extend the open session backwards — if `last` regressed
      // to 9:50, the 10:25 event would see a 35-min false gap and split.
      mem.addData(Seq(ev(2, "2024-01-01 09:50:00", 1.0),
        ev(3, "2024-01-01 10:25:00", 1.0)))
      q.processAllAvailable()
      val last = spark.table(name)
        .orderBy(col("closed"), col("n_events").desc).collect().head
      last.getAs[Boolean]("closed") shouldBe false
      last.getAs[Long]("n_events") shouldBe 3L
      last.getAs[Timestamp]("session_start") shouldBe
        Timestamp.valueOf("2024-01-01 09:50:00")
      last.getAs[Timestamp]("session_end") shouldBe
        Timestamp.valueOf("2024-01-01 10:25:00")
      // no spurious closed session anywhere in the update log
      spark.table(name).filter(col("closed")).count() shouldBe 0L
    } finally q.stop()
  }

  test("streaming dedup collapses cross-batch re-deliveries to exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val name = s"dedup_out_${System.nanoTime()}"
    val q = EventStreams.dedupEvents(mem.toDF())
      .select("event_id")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      val all = asEvents.sortBy(_.ts.getTime).take(600)
      // every chunk re-delivers the tail of the previous one (the
      // at-least-once source pattern)
      val chunks = all.grouped(200).toSeq
      chunks.zipWithIndex.foreach { case (chunk, i) =>
        val redelivered = if (i == 0) chunk
          else chunks(i - 1).takeRight(50) ++ chunk
        mem.addData(redelivered)
        q.processAllAvailable()
      }
      val got = spark.table(name).collect().map(_.getLong(0))
      got.length shouldBe all.length            // nothing lost
      got.distinct.length shouldBe got.length   // nothing duplicated
      got.toSet shouldBe all.map(_.event_id).toSet
    } finally q.stop()
  }

  // --- streaming corpus ingest: content dedup with watermark TTL ---

  import graft.streaming.CorpusIngest
  import graft.streaming.CorpusIngest.Doc
  import org.apache.spark.sql.Dataset

  /** Minutes → Timestamp, offset well past epoch 0: the stream's initial
    * watermark IS 0, and a stateful operator treats event-time ≤ watermark
    * as late data to drop — epoch-0 rows silently vanish. */
  private def tmin(min: Long): Timestamp =
    new Timestamp((1000000 + min) * 60000L)

  private def vocabText(seed: Int, words: Int): String = {
    val rnd = new scala.util.Random(seed)
    (0 until words).map(_ => s"w${rnd.nextInt(500)}").mkString(" ")
  }

  /** Feed doc batches through a CorpusIngest transform in append mode,
    * collecting the full output. */
  private def runCorpusStream(batches: Seq[Seq[Doc]],
      transform: Dataset[Doc] => Dataset[_]): Seq[org.apache.spark.sql.Row] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val name = s"corpus_out_${System.nanoTime()}"
    val q = transform(mem.toDS()).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  test("content dedupExact: stream == batch under cross-batch re-delivery") {
    import spark.implicits._
    val tA = vocabText(1, 80); val tB = vocabText(2, 80)
    val tC = vocabText(3, 80)
    val docs = Seq(
      Doc(0, tmin(0), tA), Doc(1, tmin(1), tA),   // dup within batch 1
      Doc(2, tmin(2), tB),
      Doc(3, tmin(3), tB),                        // dup across batches
      Doc(4, tmin(4), tC), Doc(5, tmin(5), tA))   // re-delivery of tA
    val batches = Seq(docs.take(2), docs.slice(2, 4), docs.drop(4))
    val got = runCorpusStream(batches, d => CorpusIngest.dedupExact(d))
      .map(_.getAs[Long]("doc_id")).sorted
    got shouldBe Seq(0L, 2L, 4L)
    // the batch twin (same operator, static Dataset) keeps the same docs
    CorpusIngest.dedupExact(docs.toDS()).collect()
      .map(_.doc_id).sorted.toSeq shouldBe got
  }

  test("streaming Bloom sketch: bounded state, re-delivery-proof, equals the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = (0 until 120).map(i => Doc(i, tmin(i), vocabText(100 + i, 40)))
    val mem = MemoryStream[Doc]
    val name = s"bloom_out_${System.nanoTime()}"
    val q = CorpusIngest.bloomSketch(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    try {
      // batch 2 re-delivers the tail of batch 1: BIT_OR idempotence must
      // leave the sketch identical to exactly-once delivery
      mem.addData(docs.take(60)); q.processAllAvailable()
      mem.addData(docs.slice(40, 120)); q.processAllAvailable()
      val got = spark.table(name).collect()
        .map(r => r.getAs[Long]("word") -> r.getAs[Long]("bits")).toMap
      got.size should be <= graft.functions.Sketches.BloomWords
      val batch = graft.operators.PipelineQueries.bloomWordsOf(
          docs.toDF().select(md5($"text").as("dig")).distinct())
        .collect().map(r => r.getAs[Long]("word") -> r.getAs[Long]("bits"))
        .filter(_._2 != 0L).toMap
      got shouldBe batch
    } finally q.stop()
  }

  test("content dedupExact: digest state expires by TTL and re-admits") {
    val tA = vocabText(11, 80); val tB = vocabText(12, 80)
    val tC = vocabText(13, 80)
    val batches = Seq(
      Seq(Doc(0, tmin(0), tA)),
      // pushes the watermark (delay 60 min) to 540 min after this batch,
      // far past doc 0's timeout at 0 + 120 min TTL
      Seq(Doc(1, tmin(600), tB)),
      // timeouts fire for keys WITHOUT new data in a batch: this
      // unrelated batch runs with watermark 540 -> digest-A state drops
      Seq(Doc(3, tmin(602), tC)),
      // same content as doc 0, after expiry: admitted AGAIN - dedup is a
      // horizon contract, not stream-lifetime uniqueness
      Seq(Doc(2, tmin(603), tA)))
    val got = runCorpusStream(batches,
      d => CorpusIngest.dedupExact(d, watermarkMinutes = 60,
        ttlMinutes = 120))
      .map(_.getAs[Long]("doc_id")).sorted
    got shouldBe Seq(0L, 1L, 2L, 3L)
  }

  test("streaming MinHash near-dup: stream == batch, finds the near pair only") {
    import spark.implicits._
    val base = vocabText(7, 120).split(" ")
    val near = (base.take(110) ++ base.take(10)).mkString(" ") // ~heavy overlap
    val far = vocabText(99, 120)
    val docs = Seq(
      Doc(0, tmin(0), base.mkString(" ")),
      Doc(1, tmin(1), near),
      Doc(2, tmin(2), far))
    val got = runCorpusStream(docs.map(Seq(_)),
      d => CorpusIngest.nearDupPairs(d))
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("sim"))).distinct.sorted
    got.map(p => (p._1, p._2)) shouldBe Seq((0L, 1L))
    got.head._3 should be >= 0.5
    // batch twin: identical pair set
    CorpusIngest.nearDupPairs(docs.toDS()).collect()
      .map(p => (p.a_id, p.b_id, p.sim)).distinct.sorted.toSeq shouldBe got
  }
}
