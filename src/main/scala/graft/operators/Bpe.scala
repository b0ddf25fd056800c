package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer TRAINING — the
  * corpus-scale companion to the BPE-ish segmentation counters
  * (`q_bpe_count`): learn the merge table itself from the corpus, the way
  * an LLM data pipeline trains its tokenizer before anything else runs.
  *
  * Classic greedy BPE (Sennrich et al., ACL 2016 — public), restated for
  * Spark's execution model. Each round:
  *
  *   1. count adjacent symbol pairs — a NARROW per-document pass
  *      (symbols never leave their row) into one aggregate whose
  *      exchange is |distinct pairs| × ~24 bytes, with map-side partial
  *      aggregation; corpus bytes never shuffle;
  *   2. argmax over the pair counts with a deterministic total
  *      tie-break (count desc, then lexicographic) — a driver scalar,
  *      like the Bahmani cost probe;
  *   3. apply the merge — another narrow per-document pass (greedy
  *      left-to-right, the sequential BPE semantics exactly).
  *
  * So a K-merge training run is K narrow passes + K pair aggregates and
  * nothing else; the evolving corpus is re-materialized every
  * `checkpointEvery` rounds (eager localCheckpoint, same lineage-cut
  * discipline as the Bahmani/CC loops) so plan depth stays bounded. The
  * driver holds the merge table (K rows) and each round's argmax — never
  * rows of the corpus.
  *
  * Counts words (whitespace-split, then character symbols) WITH
  * multiplicity, the reference BPE formulation; training on the distinct
  * word-shape table with frequency weights (the classic wordpiece
  * speedup) composes on top by feeding `wordCounts` in directly.
  */
object Bpe {

  /** One learned merge: `rank`-th round merged (left, right) which
    * appeared `count` times. */
  final case class Merge(rank: Int, left: String, right: String,
      count: Long)

  /** (word, multiplicity) — the training unit. A word is segmented into
    * 1-char symbols to start; merges only ever happen inside a word. */
  final case class Word(syms: Array[String], n: Long)

  /** documents(text) → distinct word shapes with multiplicities. Narrow
    * tokenize + one aggregate keyed on the word — the same exchange
    * shape as term counting; at 100 TB the distinct-word table is
    * orders of magnitude smaller than the corpus (Zipf), which is why
    * BPE trainers run on it rather than raw text. */
  def wordCounts(docs: DataFrame): Dataset[Word] = {
    import docs.sparkSession.implicits._
    docs.select(explode(split(graft.functions.TextFns.normalize(col("text")),
        " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .map { case (w, n) => Word(w.map(_.toString).toArray, n) }
  }

  /** [[wordCounts]] from a pre-aggregated (term, tf-sum) frame — the
    * memoized tf matrix's tokenization is identical to [[wordCounts]]'
    * (TextFns.normalize + split + drop-empties), so
    * `tfMatrix.groupBy(term).sum(tf)` yields the same multiplicities
    * without re-tokenizing the corpus (round-15). */
  def wordCountsFrom(termCounts: DataFrame): Dataset[Word] = {
    import termCounts.sparkSession.implicits._
    termCounts.as[(String, Long)]
      .map { case (w, n) => Word(w.map(_.toString).toArray, n) }
  }

  /** Greedy left-to-right single-pair merge — the sequential BPE
    * semantics, applied per word (narrow). */
  private[graft] def mergeWord(syms: Array[String], l: String,
      r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Learn `numMerges` merges. Returns the merge table in rank order.
    * Deterministic: the argmax tie-break is total (count desc, left asc,
    * right asc), so the learned table is independent of partitioning. */
  def train(words: Dataset[Word], numMerges: Int,
      checkpointEvery: Int = 8): Seq[Merge] = {
    import words.sparkSession.implicits._
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var cur = words.localCheckpoint(true)
    // the checkpoint whose blocks the current lineage reads — superseded
    // snapshots are unpersisted as soon as the next one materializes, so
    // a long training run holds exactly ONE corpus snapshot, not
    // numMerges/checkpointEvery of them (advisor finding, round 4)
    var liveCkpt = cur
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      // adjacent-pair counts, weighted by word multiplicity: narrow
      // flatMap (pairs stay inside their row) + ONE DataFrame aggregate —
      // groupBy(l, r).sum stays in Tungsten with map-side partial
      // aggregation (the typed groupByKey/reduceGroups form it replaces
      // dragged every pair through the tuple codec)
      val top = cur.flatMap { w =>
        (0 until w.syms.length - 1).iterator
          .map(i => (w.syms(i), w.syms(i + 1), w.n))
      }
        .toDF("l", "r", "n")
        .groupBy("l", "r").agg(sum("n").as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .head(1)
      if (top.isEmpty) done = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += Merge(round, l, r, n)
        val next = cur.map(w => Word(mergeWord(w.syms, l, r), w.n))
        // lineage cut: without it round k's plan nests k maps deep
        cur = if ((round + 1) % checkpointEvery == 0) {
          val ck = next.localCheckpoint(true) // eager: materializes BEFORE
          liveCkpt.unpersist(blocking = false) // ...the old blocks drop
          liveCkpt = ck
          ck
        } else next
        round += 1
      }
    }
    merges.toSeq
  }

  /** Segment words with a learned merge table (rank order — BPE apply
    * is the same greedy loop the trainer ran). Narrow. */
  def segment(words: Dataset[Word], merges: Seq[Merge]): Dataset[Word] = {
    import words.sparkSession.implicits._
    val bc = words.sparkSession.sparkContext
      .broadcast(merges.sortBy(_.rank).map(m => (m.left, m.right)))
    words.map { w =>
      var syms = w.syms
      bc.value.foreach { case (l, r) => syms = mergeWord(syms, l, r) }
      Word(syms, w.n)
    }
  }

  /** Sequential reference trainer (driver-side, tiny inputs) — the
    * differential baseline for [[train]]. Same tie-break. */
  private[graft] def trainSequential(words: Seq[Word],
      numMerges: Int): Seq[Merge] = {
    var cur = words.map(w => (w.syms.toSeq, w.n))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      for ((syms, n) <- cur; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + n
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += Merge(round, l, r, n)
        cur = cur.map { case (syms, m) =>
          (mergeWord(syms.toArray, l, r).toSeq, m)
        }
        round += 1
      }
    }
    merges.toSeq
  }
}
