package graft

import org.apache.spark.sql.functions._

/** Sanity semantics for the training-data pipeline additions: repetition
  * metrics bounded and discriminative, stratified sampling close to its
  * declared per-source rates.
  */
class PipelineOpsSpec extends SparkSpec {

  private val byName =
    graft.operators.PipelineQueries.all.map(q => q.name -> q).toMap

  test("repetition metrics are bounded and discriminative") {
    val rows = byName("q_repetition").fn(spark, sfDir).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val top = r.getAs[Double]("top_term_frac")
      val dup = r.getAs[Double]("dup_shingle_frac")
      top should (be >= 0.0 and be <= 1.0)
      dup should (be >= 0.0 and be <= 1.0)
    }
    // the corpus is word salad over a small vocab — metrics must spread,
    // not collapse to a constant
    rows.map(_.getAs[Double]("top_term_frac")).distinct.length should be > 10
  }

  test("stratified sample hits its per-source rates within sampling noise") {
    val docs = Tables.documents(spark, sfDir)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n"))
      .toMap
    val kept = byName("q_stratified_sample").fn(spark, sfDir)
      .groupBy("source").agg(count(lit(1)).as("k"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("k"))
      .toMap
    val rates = Map("src0" -> 0.8, "src1" -> 0.5)
    for ((src, n) <- docs) {
      val want = rates.getOrElse(src, 0.2)
      val got = kept.getOrElse(src, 0L).toDouble / n
      // binomial noise at n ~ 100-200 per source: allow ±3σ-ish
      val tol = 3 * math.sqrt(want * (1 - want) / n) + 1e-9
      withClue(s"$src: got $got want $want ±$tol (n=$n)") {
        math.abs(got - want) should be <= tol
      }
    }
  }
}
