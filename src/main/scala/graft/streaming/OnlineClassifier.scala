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

  /** HTTP serving endpoint — the literal V1 analog of the reference's
    * embedded Tomcat + servlet (TomcatServer.scala:12-24,
    * NaiveBayesServlet.scala:68-71), on the JDK-bundled
    * `com.sun.net.httpserver` (zero new dependencies). POST /classify
    * with a UTF-8 text body returns `{"label":…,"score":…}`; every
    * request scores a 1-row frame through the SAME broadcast-join plan
    * as batch and stream serving — one code path for all three shapes.
    * `port = 0` binds a free port (read it back via
    * `getAddress.getPort`); callers own the lifecycle (`stop(0)`).
    * Latency note: this is the functional contract, not a low-latency
    * server — per-request Spark job dispatch is ~10s of ms on an idle
    * local session; a production deployment keeps this plan warm behind
    * a request-batching front (exactly what [[serve]]'s micro-batching
    * does). */
  def httpServe(spark: org.apache.spark.sql.SparkSession, model: Model,
      port: Int = 0): com.sun.net.httpserver.HttpServer = {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    def jsonEscape(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => "\\u%04x".format(c.toInt)
        case c => c.toString
      }
    val server = HttpServer.create(new java.net.InetSocketAddress(port), 0)
    server.createContext("/classify", (ex: HttpExchange) =>
      try {
        if (ex.getRequestMethod != "POST") ex.sendResponseHeaders(405, -1)
        else {
          // bounded read: readNBytes caps the per-request allocation (an
          // unbounded readAllBytes lets one request exhaust the heap);
          // over-limit bodies get 413
          val maxBody = 1 << 20
          val body = ex.getRequestBody.readNBytes(maxBody + 1)
          if (body.length > maxBody) ex.sendResponseHeaders(413, -1)
          else {
          val text = new String(body, "UTF-8")
          import spark.implicits._
          val row = score(Seq((0L, text)).toDF("doc_id", "text"), model)
            .head()
          // NaN/Infinity are not valid JSON number literals — emit null
          val score0 = row.getAs[Double]("best_score")
          val scoreJson =
            if (java.lang.Double.isFinite(score0)) score0.toString else "null"
          val json =
            s"""{"label":"${jsonEscape(row.getAs[String]("pred_label"))}","score":$scoreJson}"""
          val bytes = json.getBytes("UTF-8")
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(200, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
          }
        }
      } catch {
        case scala.util.control.NonFatal(_) =>
          // a bad request must not kill the handler thread; 500 and move on
          try ex.sendResponseHeaders(500, -1)
          catch { case scala.util.control.NonFatal(_) => () }
      } finally ex.close())
    server.start()
    server
  }
}
