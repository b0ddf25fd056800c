package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transformed-Weight Complement Naive Bayes (book Alg. 8.2), re-expressing
  * the reference's `twcnbTrain` (mahout-samsara-book:
  * myMahoutApp/src/main/scala/myMahoutApp/TWCNB.scala:28-148).
  *
  * The reference's lifecycle needs two distributed transposes, one
  * allreduce, one driver re-parallelize, and two colSums round-trips
  * (SURVEY.md §3.2). Here the same chain — per-class aggregate →
  * complement counts → smoothed log-likelihood → per-class L1 weight
  * normalization — is ONE Catalyst plan with zero driver round-trips:
  *
  *   1. per-(label, term) counts: plain hash aggregate (the honest form of
  *      the "transpose trick", TWCNB.scala:48-50 — group-by also fixes the
  *      empty-row pathology noted at TWCNBSuite.scala:76-87);
  *   2. complement Ñ_tc = Σ_c' N_tc' − N_tc (TWCNB.scala:109-113): join
  *      with per-term totals on the (label,term) grid;
  *   3. θ_tc = ln((Ñ_tc + α) / Σ_t(Ñ_tc + α)) (TWCNB.scala:117-129);
  *   4. w_tc = θ_tc / Σ_t |θ_tc| (TWCNB.scala:134-147).
  *
  * Scale: the only wide exchanges key on (label, term) and label. The two
  * per-label normalizers (smoothing denominator, L1 weight norm) are
  * per-label SCALARS, so they run as `groupBy(label)` aggregates
  * (partial+final, parallel across the vocabulary) joined back as an
  * L-row broadcast — NOT as `Window.partitionBy(label)` sums, which would
  * funnel each class's entire vocabulary slice (|V|/L rows — effectively
  * the whole vocab when L is small) through a single task.
  */
object TWCNB {

  /** Train from token occurrences `(label, term)` — one row per token.
    * Returns `(label, term, w)`. */
  def train(tokens: DataFrame, alpha: Double = 1.0): DataFrame =
    trainWeighted(
      tokens.select(col("label"), col("term"), lit(1L).as("f")), alpha)

  /** Train from weighted rows `(label, term, f)` — the reference's actual
    * input is the TF-IDF matrix (`twcnbTrain(drmTfIdf)`, TWCNB.scala:28-32),
    * i.e. f = tfidf(doc, term), one row per (doc, term). Raw-count
    * training is the f = 1 special case ([[train]]). For cross-engine
    * exactness feed integer-quantized weights (see q_twcnb_tfidf) — the
    * class-count sums are then bit-exact in any summation order. */
  def trainWeighted(weighted: DataFrame, alpha: Double = 1.0): DataFrame = {
    // ntc is the corpus boundary: everything upstream of `weighted` is
    // corpus-sized, everything from here on is model-sized (|V|·L). ntc
    // feeds 4 plan positions (both grid distincts, tot, the comp join)
    // that Catalyst does not dedupe — so ntc is materialized HERE, at the
    // model boundary: the corpus-sized tokenize/aggregate chain runs
    // exactly once (into |V|·L-row stored blocks), and the 4 consumers
    // read the blocks. Materializing `weighted` instead would store a
    // corpus-sized table (measured 2-4× slower at bench scale).
    // An EAGER localCheckpoint (not .persist) does the materialization:
    // the downstream plan sees a plain LogicalRDD, avoiding the
    // InMemoryRelation path's columnar cache-build and per-consumer
    // cached-plan re-optimization, which dominated the trio's wall time
    // at sf0.1 (q_twcnb_model 1.0→4.5 s under .persist, round-4 verdict).
    // Lifecycle: the checkpoint blocks live until the caller/harness
    // frees them (the Verify/Bench harness runs [[graft.Cleanup]] —
    // which unpersists all persistent RDDs — after each query's terminal
    // action).
    val ntc = weighted.groupBy("label", "term").agg(sum("f").as("n"))
      .localCheckpoint()
    val grid = ntc.select("label").distinct()
      .crossJoin(ntc.select("term").distinct())
    val tot = ntc.groupBy("term").agg(sum("n").as("tot"))
    val comp = grid
      .join(ntc, Seq("label", "term"), "left")
      .join(tot, "term")
      .select(col("label"), col("term"),
        (col("tot") - coalesce(col("n"), lit(0L))).as("nc"))
    // θ_tc = ln((nc+α) / Σ_t(nc+α)): the denominator is one scalar per
    // label — aggregate in parallel, join back broadcast (L rows)
    val denom = comp.groupBy("label").agg(sum(col("nc") + alpha).as("den"))
    val theta = comp.join(broadcast(denom), "label")
      .select(col("label"), col("term"),
        log((col("nc") + alpha) / col("den")).as("theta"))
    // w_tc = θ_tc / Σ_t|θ_tc|: same shape, one L1 scalar per label
    val norm = theta.groupBy("label").agg(sum(abs(col("theta"))).as("nrm"))
    theta.join(broadcast(norm), "label")
      .select(col("label"), col("term"), (col("theta") / col("nrm")).as("w"))
  }

  /** Score documents against a trained model: score(d,c) = Σ_t tf(d,t)·w_tc
    * — the distributed matmul form of classification (reference:
    * `drmTfIdfTest %*% drmTwcnbWtModel`, TWCNBSuite.scala:115).
    * No broadcast hint on `model`: it is |V|·L rows — vocabulary-sized at
    * corpus scale, where a forced broadcast would pin the full term×class
    * table in every executor. A plain equi-join on `term` shuffles both
    * sides by key (the scale plan); the planner still auto-broadcasts
    * whenever the model is actually below the threshold. */
  def score(docTf: DataFrame, model: DataFrame): DataFrame =
    docTf.join(model, "term")
      .groupBy("doc_id", "label")
      .agg(sum(col("tf") * col("w")).as("score"))
}
