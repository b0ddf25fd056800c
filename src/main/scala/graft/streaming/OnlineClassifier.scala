package graft.streaming

import graft.functions.TextFns
import graft.ml.TWCNB
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Online text classification — the engine-side analog of the reference's
  * serving layer (mahout-samsara-book: naiveBayesExample/src/main/scala/
  * nbexample/NaiveBayesServlet.scala:76-143: tokenize → TF → dictionary
  * filter → TF-IDF → NB score → argmax, per HTTP request).
  *
  * Here the same pipeline is ONE DataFrame transform applied to any
  * source: a static frame (batch scoring), a 1-row frame (the "per
  * request" case), or a stream (`readStream` → [[score]] → `writeStream`
  * / `foreachBatch`). The model and dictionary ride as small DataFrames
  * broadcast-joined into the plan — never collected to driver maps
  * (the reference's `collectAsMap` pattern inverted, SURVEY §2.1 S6).
  */
object OnlineClassifier {

  final case class Model(weights: DataFrame, labels: Seq[String]) {
    def unpersist(): Unit = weights.unpersist()
  }

  /** Train TWCNB on labeled documents (label = `lang` on the testdata
    * documents table). Weights: (label, term, w), persisted — every
    * scored micro-batch joins them, and without the persist each batch
    * would re-execute the full training plan (the most expensive DAG in
    * the serving path). Labels come from the INPUT labels, not from a
    * collect over the trained weights (which would run the training plan
    * an extra time just for the label list). Call [[Model.unpersist]]
    * when retiring a model. */
  def train(docs: DataFrame, alpha: Double = 1.0): Model = {
    val tokens = TextFns.tokens(docs)
      .select(col("lang").as("label"), col("term"))
    val labels = tokens.select("label").distinct().collect()
      .map(_.getString(0)).toSeq.sorted
    val w = TWCNB.train(tokens, alpha)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Model(w, labels)
  }

  /** Score a frame of (doc_id, text): tokenize → per-doc TF → broadcast
    * join the weight matrix → Σ tf·w per (doc, label) → argmin (CNB picks
    * the class with the smallest complement score) with a deterministic
    * label tie-break. Chains two aggregations, so streams go through
    * [[serve]] (foreachBatch hands each micro-batch here statically).
    */
  def score(docs: DataFrame, model: Model): DataFrame = {
    val tf = TextFns.tokens(docs.withColumn("lang", lit("")))
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("double").as("tf"))
    val scored = tf.join(broadcast(model.weights), "term")
      .groupBy("doc_id", "label")
      .agg(sum(col("tf") * col("w")).as("score"))
      .groupBy("doc_id")
      .agg(min_by(col("label"), struct(col("score"), col("label")))
        .as("pred_label"),
        min(col("score")).as("best_score"))
    // EVERY request gets a prediction: a doc whose tokens are all
    // out-of-vocabulary inner-joins to zero weight rows — the reference
    // servlet's argmax over an all-zero score vector returns the first
    // label, so the left join + default reproduces that contract instead
    // of silently dropping the request.
    docs.select("doc_id").distinct()
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("pred_label"), lit(model.labels.head)).as("pred_label"),
        coalesce(col("best_score"), lit(0.0)).as("best_score"))
  }

  /** Batch variant with full per-class scores (the reference's
    * `classifyFull`, NaiveBayesServlet.scala:134) ranked per document. */
  def scoreFull(docs: DataFrame, model: Model): DataFrame = {
    val tf = TextFns.tokens(docs.withColumn("lang", lit("")))
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("double").as("tf"))
    val byDoc = Window.partitionBy("doc_id")
      .orderBy(col("score").asc, col("label"))
    tf.join(broadcast(model.weights), "term")
      .groupBy("doc_id", "label")
      .agg(sum(col("tf") * col("w")).as("score"))
      .withColumn("rank", row_number().over(byDoc))
  }

  /** Streaming serving: score each micro-batch and hand results to a
    * sink callback — the Structured-Streaming replacement for the
    * reference's servlet `doPost` (TomcatServer.scala:12-24). */
  def serve(stream: DataFrame, model: Model)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(score(batch, model), id)
      }
      .start()
}
