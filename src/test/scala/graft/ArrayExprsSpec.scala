package graft

import graft.functions.ArrayExprs
import org.apache.spark.sql.functions._

/** Null/shape semantics of the native dot product: must match the
  * zip_with/aggregate HOF form it replaced — including NULL on length
  * mismatch (zip_with null-pads) and NULL on null elements — so swapping
  * the implementations can never silently change results.
  */
class ArrayExprsSpec extends SparkSpec {

  private def hofDot = (a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  test("graft_dot equals the HOF form on values, length mismatch, and nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](4.0, 5.0, 6.0)),
      (2L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](4.0, 5.0, 6.0)),
      (3L, Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](4.0, 5.0, 6.0)),
      (4L, Seq.empty[java.lang.Double], Seq.empty[java.lang.Double])
    ).toDF("id", "a", "b")
    val got = df.select(col("id"),
      ArrayExprs.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof"))
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[java.lang.Double]("native")),
          Option(r.getAs[java.lang.Double]("hof")))).toMap
    got(1L)._1 shouldBe Some(32.0)
    got(2L)._1 shouldBe None // length mismatch: both forms null
    got(3L)._1 shouldBe None // null element: both forms null
    got(4L)._1 shouldBe Some(0.0)
    got.values.foreach { case (native, hof) => native shouldBe hof }
  }
}
