package graft

import java.util.concurrent.ConcurrentLinkedQueue

import graft.streaming.OnlineClassifier
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Serving-layer tests: SQL-level registration of the native expressions
  * via SparkSessionExtensions, and the streaming classifier (the
  * reference-servlet analog) agreeing with its own batch scoring.
  */
class ServingSpec extends SparkSpec {

  test("GraftExtensions registers graft_dot for SQL text") {
    // `withExtensions` only takes effect on a fresh SparkContext, and the
    // JVM-shared test context must never be stopped mid-run — so exercise
    // the install-on-running-session path (same injected function tuple).
    GraftExtensions.install(spark)
    val v = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    v shouldBe 32.0
    // matches the Column-API form
    val col = graft.functions.ArrayExprs.dot(
      expr("array(1.0d, 2.0d)"), expr("array(3.0d, 4.0d)"))
    spark.range(1).select(col.as("d")).head().getDouble(0) shouldBe 11.0
  }

  test("online classifier: streaming foreachBatch scoring == batch scoring") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang", "text")
    val model = OnlineClassifier.train(docs)
    model.labels should not be empty

    val batchPred = OnlineClassifier.score(docs, model)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_label"))
      .toMap

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val got = new ConcurrentLinkedQueue[(Long, String)]()
    val q = OnlineClassifier.serve(
      mem.toDF().toDF("doc_id", "text"), model) { (scored, _) =>
      scored.collect().foreach(r =>
        got.add(r.getAs[Long]("doc_id") -> r.getAs[String]("pred_label")))
    }
    try {
      val rows = docs.select("doc_id", "text").as[(Long, String)].collect()
      rows.grouped(math.max(1, rows.length / 3)).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamPred = got.toArray(Array.empty[(Long, String)]).toMap
    streamPred.keySet shouldBe batchPred.keySet
    streamPred.foreach { case (id, p) => batchPred(id) shouldBe p }
  }

  test("every request gets a prediction: OOV-only documents fall back to the first label") {
    import spark.implicits._
    val train = Seq(
      (0L, "alpha alpha beta", "en"),
      (1L, "gamma gamma delta", "es")).toDF("doc_id", "text", "lang")
    val model = OnlineClassifier.train(train)
    // doc 10: pure out-of-vocabulary; doc 11: known terms
    val reqs = Seq((10L, "zzz qqq www"), (11L, "alpha beta"))
      .toDF("doc_id", "text")
    val got = OnlineClassifier.score(reqs, model).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_label"))
      .toMap
    got.keySet shouldBe Set(10L, 11L) // nothing silently dropped
    got(10L) shouldBe model.labels.head // argmax over all-zero scores
    model.unpersist()
  }

  test("classifier learns separable labels (seeded class-biased corpus)") {
    import spark.implicits._
    // The testdata documents draw one shared vocabulary for every lang
    // value (label not learnable from text by construction), so train-set
    // accuracy is asserted on a separable seeded corpus instead.
    val rnd = new scala.util.Random(4321)
    val vocab = (0 until 40).map(t => f"w$t%02d")
    val corpus = (0L until 120L).map { d =>
      val c = (d % 3).toInt
      val toks = Seq.fill(25) {
        if (rnd.nextDouble() < 0.6) vocab(c * 10 + rnd.nextInt(10))
        else vocab(30 + rnd.nextInt(10))
      }
      (d, s"lang$c", toks.mkString(" "))
    }
    val docs = corpus.toDF("doc_id", "lang", "text")
    val model = OnlineClassifier.train(docs)
    val joined = OnlineClassifier.score(docs, model)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val n = joined.count().toDouble
    val correct = joined.filter(col("pred_label") === col("lang")).count()
    info(f"train-set accuracy: ${correct / n}%.3f over ${n.toLong} docs")
    correct / n should be > 0.95
  }

  test("HTTP endpoint: POST text -> label round trip matches direct scoring") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").limit(200)
    val model = OnlineClassifier.train(docs)
    val server = OnlineClassifier.httpServe(spark, model, port = 0)
    try {
      val port = server.getAddress.getPort
      val sample = docs.select("text").head().getString(0)
      val client = java.net.http.HttpClient.newHttpClient()
      val resp = client.send(
        java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(s"http://127.0.0.1:$port/classify"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(sample))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      resp.statusCode() shouldBe 200
      val body = resp.body()
      val label = "\"label\":\"([^\"]*)\"".r
        .findFirstMatchIn(body).get.group(1)
      val direct = OnlineClassifier
        .score(Seq((0L, sample)).toDF("doc_id", "text"), model)
        .head().getAs[String]("pred_label")
      label shouldBe direct
      // wrong method: 405, handler stays alive for the next request
      val bad = client.send(
        java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(s"http://127.0.0.1:$port/classify"))
          .GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      bad.statusCode() shouldBe 405
      val again = client.send(
        java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(s"http://127.0.0.1:$port/classify"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(sample))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      again.statusCode() shouldBe 200
    } finally {
      server.stop(0)
      model.unpersist()
    }
  }

  test("scoreFull ranks every trained label per document") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang", "text")
      .limit(20)
    val model = OnlineClassifier.train(
      Tables.documents(spark, sfDir).select("doc_id", "lang", "text"))
    val full = OnlineClassifier.scoreFull(docs, model)
    val perDoc = full.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
      .collect()
    perDoc.foreach { r =>
      r.getAs[Long]("n") shouldBe model.labels.size.toLong
      r.getAs[Int]("lo") shouldBe 1
      r.getAs[Int]("hi") shouldBe model.labels.size
    }
    // rank 1 agrees with score()'s argmin prediction
    val top = full.filter(col("rank") === 1)
      .select("doc_id", "label").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("label")).toMap
    val pred = OnlineClassifier.score(docs, model).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_label")).toMap
    top shouldBe pred
  }
}
