package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming corpus ingest — the streaming twins of the batch dedup
  * surface (PipelineQueries q_dedup_exact / q_dedup_minhash), the shape a
  * continuously-fed training-data pipeline runs: documents arrive as a
  * stream, exact duplicates collapse on a content digest, near-duplicates
  * surface as candidate pairs from MinHash band buckets — and ALL state
  * is watermark-bounded (TTL per key), so a forever-running ingest holds
  * state proportional to the dedup horizon, not the stream's lifetime.
  *
  * Both operators are valid on static AND streaming Datasets (the
  * equivalence-test discipline of [[EventStreams]]): on a static frame
  * each key's group sees all its documents at once and the state path is
  * trivially empty; on a stream the same sequential logic runs
  * incrementally with `flatMapGroupsWithState` + event-time timeout.
  * Determinism: within each invocation documents process in
  * (ts, doc_id) order, so stream results equal the batch twin whenever
  * micro-batches respect event-time order (asserted in StreamingSpec).
  *
  * Scale notes: the only exchanges move (digest) or (band_key) — 8-byte
  * keys plus the fixed-width signature, never full payloads more than
  * once; per-band state is capped ([[nearDupPairs]] `bandCap`) so a
  * boilerplate band (the streaming analog of the batch τ-cap on shingle
  * document frequency) cannot grow state or emit quadratic pairs.
  */
object CorpusIngest {

  /** A streamed document: event time + payload. */
  final case class Doc(doc_id: Long, ts: Timestamp, text: String)

  /** Near-duplicate candidate: a_id < b_id, `sim` = fraction of equal
    * MinHash components (an unbiased Jaccard estimate). */
  final case class DupPair(a_id: Long, b_id: Long, sim: Double)

  /** One doc exploded to one MinHash band. */
  final case class BandDoc(band_key: Long, doc_id: Long, ts: Timestamp,
      sig: Array[Long])

  /** Per-band stored entry (the keyed state is an array of these). */
  final case class BandEntry(doc_id: Long, tsMs: Long, sig: Array[Long])

  // --- deterministic hashing (self-contained: stable across JVMs) ---

  /** FNV-1a 64-bit over UTF-8 bytes. */
  private[streaming] def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private def mix64(z0: Long): Long = { // splitmix64 finalizer
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Content digest for exact dedup: 64-bit FNV of the raw text. */
  def digestOf(text: String): Long = fnv64(text)

  /** n-component MinHash signature over 3-token shingles (tokenizer
    * mirrors [[graft.functions.TextFns.normalize]]: lowercase,
    * non-alphanumeric runs collapse). Empty/short docs get the empty-set
    * sentinel signature (Long.MaxValue components). */
  private[streaming] def signature(text: String, n: Int): Array[Long] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val out = Array.fill(n)(Long.MaxValue)
    var i = 0
    while (i + 2 < toks.length) {
      val base = fnv64(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      var f = 0
      while (f < n) {
        val h = mix64(base ^ mix64(f.toLong))
        if (h < out(f)) out(f) = h
        f += 1
      }
      i += 1
    }
    out
  }

  /** Exact streaming dedup on the content digest: the FIRST document
    * (by event time, doc_id tie-break) per digest passes; re-arrivals
    * inside the TTL horizon are suppressed; state for a digest expires
    * `ttlMinutes` after its last sighting. Batch form: keep-first by
    * (ts, doc_id) per digest — event-time-first, unlike q_dedup_exact's
    * min-doc_id keeper; the two agree exactly when arrival order matches
    * id order. */
  def dedupExact(docs: Dataset[Doc], watermarkMinutes: Long = 60,
      ttlMinutes: Long = 120): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    val streaming = docs.isStreaming
    val ttlMs = ttlMinutes * 60000L
    val src =
      if (streaming) docs.withWatermark("ts", s"$watermarkMinutes minutes")
      else docs

    def update(digest: Long, it: Iterator[Doc],
        state: GroupState[Long]): Iterator[Doc] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val batch = it.toArray
        val out =
          if (batch.isEmpty || state.exists) Iterator.empty
          else Iterator(batch.minBy(d => (d.ts.getTime, d.doc_id)))
        if (batch.nonEmpty) {
          if (!state.exists)
            state.update(batch.minBy(d => (d.ts.getTime, d.doc_id)).doc_id)
          if (streaming) {
            val maxTs = batch.map(_.ts.getTime).max
            // timeout must sit strictly above the current watermark
            state.setTimeoutTimestamp(
              math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1))
          }
        }
        out
      }
    }

    src.groupByKey(d => digestOf(d.text))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming MinHash near-dup: each document signs once, explodes to
    * `bands` band keys, and each band's keyed state holds the signatures
    * seen in the TTL horizon (capped at `bandCap` — a hot boilerplate
    * band stops admitting new entries instead of going quadratic).
    * A new document emits a [[DupPair]] against every stored entry whose
    * signature agrees on ≥ `threshold` of components. The same pair can
    * surface from several bands — downstream consumers `dropDuplicates`
    * (batch) or dedup within watermark (stream); `sim` is
    * band-independent so duplicates are exact row copies. */
  def nearDupPairs(docs: Dataset[Doc], bands: Int = 8, rowsPerBand: Int = 4,
      threshold: Double = 0.5, watermarkMinutes: Long = 60,
      ttlMinutes: Long = 120, bandCap: Int = 64): Dataset[DupPair] = {
    import docs.sparkSession.implicits._
    val streaming = docs.isStreaming
    val n = bands * rowsPerBand
    val ttlMs = ttlMinutes * 60000L

    val banded = docs.flatMap { d =>
      val sig = signature(d.text, n)
      // all-MaxValue = the empty-shingle-set sentinel (doc under 3
      // tokens): banding it would funnel EVERY short doc into the same
      // `bands` buckets, each pair reporting spurious sim = 1.0 until
      // bandCap saturates — emit no bands; near-dup over an empty
      // shingle set is undefined, exact dedup still covers such docs
      if (sig.forall(_ == Long.MaxValue)) Iterator.empty
      else (0 until bands).iterator.map { b =>
        var bk = mix64(b.toLong)
        var r = b * rowsPerBand
        while (r < (b + 1) * rowsPerBand) { bk = mix64(bk ^ sig(r)); r += 1 }
        BandDoc(bk, d.doc_id, d.ts, sig)
      }
    }
    // the typed flatMap drops column-level watermark metadata, so the
    // watermark attaches AFTER the explode, on the banded stream
    val src =
      if (streaming) banded.withWatermark("ts", s"$watermarkMinutes minutes")
      else banded

    def update(bandKey: Long, it: Iterator[BandDoc],
        state: GroupState[Array[BandEntry]]): Iterator[DupPair] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val batch = it.toArray.sortBy(d => (d.ts.getTime, d.doc_id))
        if (batch.isEmpty) Iterator.empty
        else {
          var entries = state.getOption.getOrElse(Array.empty[BandEntry])
          if (streaming) {
            val wm = state.getCurrentWatermarkMs()
            entries = entries.filter(_.tsMs >= wm - ttlMs)
          }
          val out = Seq.newBuilder[DupPair]
          for (d <- batch) {
            var i = 0
            while (i < entries.length) {
              val e = entries(i)
              if (e.doc_id != d.doc_id) {
                var eq = 0
                var f = 0
                while (f < n) { if (e.sig(f) == d.sig(f)) eq += 1; f += 1 }
                val sim = eq.toDouble / n
                if (sim >= threshold)
                  out += DupPair(math.min(e.doc_id, d.doc_id),
                    math.max(e.doc_id, d.doc_id), sim)
              }
              i += 1
            }
            if (entries.length < bandCap)
              entries = entries :+ BandEntry(d.doc_id, d.ts.getTime, d.sig)
          }
          state.update(entries)
          if (streaming) {
            val maxTs = batch.map(_.ts.getTime).max
            state.setTimeoutTimestamp(
              math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1))
          }
          out.result().iterator
        }
      }
    }

    src.groupByKey(_.band_key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Continuous membership-sketch maintenance — the streaming twin of
    * `PipelineQueries.bloomWordsOf` / q_bloom_registers. Each arriving
    * document's content digest sets k = 4 Carter–Wegman bit positions;
    * a streaming aggregate keyed on the 2048 word indexes maintains the
    * BIT_OR of each word across micro-batches. Unlike the digest-set
    * dedup state above (proportional to the dedup horizon), this state
    * is capped at `Sketches.BloomWords` cells FOREVER — the resident
    * footprint a 100 TB perpetual ingest actually affords — and each
    * micro-batch's exchange carries at most 2048 (word, long) partial
    * rows. BIT_OR is idempotent, so at-least-once re-delivery cannot
    * corrupt the sketch. Downstream, each trigger's sketch snapshot is
    * exactly the broadcast prefilter of q_dedup_incremental's confirm
    * join. Valid on static and streaming frames (complete/update mode
    * on a stream — only touched words appear; absent word = 0L). */
  def bloomSketch(docs: Dataset[Doc]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.Sketches
    docs.select(md5(col("text")).as("dig"))
      .select(Sketches.hash60(col("dig")).as("h"))
      .select(explode(array((0 until Sketches.BloomK).map(i =>
        Sketches.bloomPos(col("h"), i)): _*)).as("p"))
      .select(shiftright(col("p"), 5).as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p & 31 AS INT))").as("m"))
      .groupBy("word").agg(expr("bit_or(m)").as("bits"))
  }
}
