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

  test("graft_sorted_intersect equals array_intersect on sorted distinct arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { id =>
      def arr() = Seq.fill(rnd.nextInt(12))(rnd.nextInt(30).toLong)
        .distinct.sorted
      (id.toLong, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
      ArrayExprs.sortedIntersect(col("a"), col("b")).as("native"),
      // array_intersect keeps left-side order; left is ascending, so the
      // built-in's output equals the merge walk's ascending output
      array_intersect(col("a"), col("b")).as("builtin"))
      .collect()
    got.foreach { r =>
      r.getSeq[Long](1) shouldBe r.getSeq[Long](2)
    }
    // empty sides
    val e = Seq((1L, Seq.empty[Long], Seq(1L, 2L))).toDF("id", "a", "b")
      .select(ArrayExprs.sortedIntersect(col("a"), col("b"))).collect()
    e.head.getSeq[Long](0) shouldBe Seq.empty
  }

  /** The HOF formula graft_shingles replaced (TextFns.shinglesOf pre
    * round 10) — kept here as the equivalence reference. */
  private def hofShingles(a: org.apache.spark.sql.Column, k: Int) = {
    val n = org.apache.spark.sql.functions.size(a) - (k - 1)
    when(n >= 1, transform(sequence(lit(1), n),
      i => concat_ws(" ", (0 until k).map(o => element_at(a, i + o)): _*)))
  }

  test("graft_shingles equals the HOF k-gram form, including short-array null") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "b", "gamma9", "x", "delta", "ee")
    val rows = (1L to 60L).map { id =>
      // lengths 0..11 — covers n < k (null), n == k (one gram), long
      (id, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    }
    val df = rows.toDF("id", "a")
    for (k <- Seq(2, 3, 8)) {
      val got = df.select(col("id"),
        ArrayExprs.shingles(col("a"), k).as("native"),
        hofShingles(col("a"), k).as("hof")).collect()
      got.foreach { r =>
        withClue(s"k=$k id=${r.getLong(0)}: ") {
          Option(r.getSeq[String](1)) shouldBe Option(r.getSeq[String](2))
        }
      }
    }
    // explode semantics: short docs contribute zero rows, not nulls
    df.select(col("id"), explode(ArrayExprs.shingles(col("a"), 3)).as("sh"))
      .where(col("sh").isNull).count() shouldBe 0L
    // null ELEMENTS: the scaladoc claims concat_ws semantics (nulls
    // skipped by the separator join) — pin that against the HOF form,
    // which uses concat_ws itself, on arrays containing nulls at the
    // edge and interior (token arrays are null-free in practice; this
    // pins the documented contract, not a production path)
    val withNulls = Seq(
      (1L, Seq[String]("a", null, "b", "c")),
      (2L, Seq[String](null, "x", "y")),
      (3L, Seq[String]("p", "q", null)),
      (4L, Seq[String](null, null, "z"))
    ).toDF("id", "a")
    for (k <- Seq(2, 3)) {
      withNulls.select(col("id"),
        ArrayExprs.shingles(col("a"), k).as("native"),
        hofShingles(col("a"), k).as("hof")).collect().foreach { r =>
        withClue(s"nulls k=$k id=${r.getLong(0)}: ") {
          Option(r.getSeq[String](1)) shouldBe Option(r.getSeq[String](2))
        }
      }
    }
  }

  test("toDoubleArray (array cast) equals the transform-HOF widening it replaced") {
    import spark.implicits._
    // float→double widening is exact for every float; adversarial values:
    // signed zero, denormal, extremes, values with no short decimal form
    val vecs = Seq(
      Array(0.0f, -0.0f, 1.0f, -1.0f),
      Array(Float.MinPositiveValue, Float.MaxValue, -Float.MaxValue),
      Array(0.1f, 0.3f, 1.0f / 3.0f, 1e-20f, 3.4e38f),
      Array.empty[Float])
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "embedding")
    val got = df.select(col("id"),
      graft.functions.TextFns.toDoubleArray(col("embedding")).as("native"),
      transform(col("embedding"), x => x.cast("double")).as("hof")).collect()
    got.foreach { r =>
      val a = r.getSeq[Double](1)
      val b = r.getSeq[Double](2)
      withClue(s"id=${r.getLong(0)}: ") {
        a.length shouldBe b.length
        a.zip(b).foreach { case (x, y) =>
          java.lang.Double.doubleToRawLongBits(x) shouldBe
            java.lang.Double.doubleToRawLongBits(y)
        }
      }
    }
  }

  test("abs-max via greatest(array_max, -array_min) equals transform(abs)") {
    import spark.implicits._
    val vecs = Seq(
      Array(0.5, -2.5, 1.0), Array(-3.0, -1.0), Array(2.0, 7.0),
      Array(0.0, -0.0), Array(1e-300, -1e300), Array(42.0))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val got = df.select(col("id"),
      greatest(array_max(col("v")), -array_min(col("v"))).as("native"),
      array_max(transform(col("v"), x => abs(x))).as("hof")).collect()
    got.foreach { r =>
      withClue(s"id=${r.getLong(0)}: ") {
        r.getDouble(1) shouldBe r.getDouble(2)
      }
    }
  }

  test("tokenArr equals the filter-HOF tokenizer it replaced") {
    import spark.implicits._
    // adversarial boundaries: leading/trailing punctuation (the only
    // producers of empty tokens post-normalize), all-punct, empty, and
    // unicode that the [a-z0-9] class strips entirely
    val texts = Seq(
      "Hello, World!", "!!leading", "trailing??", "  ", "", "a",
      "¡uni¢ode text", "42 is the answer.", "a--b__c  d",
      "ALL CAPS AND 123", ".", "x!", "!x", "!x!", "a b c d e f g")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val hof = filter(
      split(graft.functions.TextFns.normalize(col("text")), " "),
      t => org.apache.spark.sql.functions.length(t) > 0)
    val got = df.select(col("id"),
      graft.functions.TextFns.tokenArr(col("text")).as("native"),
      hof.as("hof")).collect()
    got.foreach { r =>
      withClue(s"id=${r.getLong(0)}: ") {
        r.getSeq[String](1) shouldBe r.getSeq[String](2)
      }
    }
  }

  test("graft_count_eq equals both composed counting forms it replaced") {
    import spark.implicits._
    // boundaries: absent needle, repeated needle, needle as every
    // element, empty array, null elements (count as non-matching in all
    // three forms: filter's x = t is null-false, array_remove retains
    // nulls so the size difference skips them too)
    val df = Seq(
      (1L, Seq[String]("a", "b", "a", "c", "a")),
      (2L, Seq[String]("b", "c")),
      (3L, Seq[String]("a", "a")),
      (4L, Seq.empty[String]),
      (5L, Seq[String]("a", null, "a", null))
    ).toDF("id", "a")
    val needle = lit("a")
    val F = org.apache.spark.sql.functions
    val got = df.select(col("id"),
      ArrayExprs.countEq(col("a"), needle).as("native"),
      F.size(F.filter(col("a"),
        (t: org.apache.spark.sql.Column) => t === needle))
        .cast("long").as("hof"),
      (F.size(col("a")) - F.size(array_remove(col("a"), "a")))
        .cast("long").as("removeid")).collect()
    got.foreach { r =>
      withClue(s"id=${r.getLong(0)}: ") {
        r.getLong(1) shouldBe r.getLong(2)
        r.getLong(1) shouldBe r.getLong(3)
      }
    }
    // null array and null needle → null, like both composed forms
    val nulls = Seq((1L, null: Seq[String])).toDF("id", "a")
      .select(ArrayExprs.countEq(col("a"), needle).as("n1"),
        ArrayExprs.countEq(lit(Array("a")), lit(null: String)).as("n2"))
      .collect().head
    nulls.isNullAt(0) shouldBe true
    nulls.isNullAt(1) shouldBe true
  }
}
