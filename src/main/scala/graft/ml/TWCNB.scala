package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * Scale: the only wide exchanges key on (label, term) and label; per-label
  * windows assume the per-class vocabulary fits a partition (true for any
  * realistic vocab; salt by term-range if a single class ever exceeds it).
  */
object TWCNB {

  /** Train from token occurrences `(label, term)` — one row per token.
    * Returns `(label, term, w)`. */
  def train(tokens: DataFrame, alpha: Double = 1.0): DataFrame = {
    val ntc = tokens.groupBy("label", "term").agg(count(lit(1)).as("n"))
    val grid = ntc.select("label").distinct()
      .crossJoin(ntc.select("term").distinct())
    val tot = ntc.groupBy("term").agg(sum("n").as("tot"))
    val comp = grid
      .join(ntc, Seq("label", "term"), "left")
      .join(tot, "term")
      .select(col("label"), col("term"),
        (col("tot") - coalesce(col("n"), lit(0L))).as("nc"))
    val byLabel = Window.partitionBy("label")
    comp
      .withColumn("theta",
        log((col("nc") + alpha) / sum(col("nc") + alpha).over(byLabel)))
      .withColumn("w", col("theta") / sum(abs(col("theta"))).over(byLabel))
      .select("label", "term", "w")
  }

  /** Score documents against a trained model: score(d,c) = Σ_t tf(d,t)·w_tc
    * — the distributed matmul form of classification (reference:
    * `drmTfIdfTest %*% drmTwcnbWtModel`, TWCNBSuite.scala:115). */
  def score(docTf: DataFrame, model: DataFrame): DataFrame =
    docTf.join(model, "term")
      .groupBy("doc_id", "label")
      .agg(sum(col("tf") * col("w")).as("score"))
}
