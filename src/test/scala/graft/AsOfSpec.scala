package graft

import java.sql.Timestamp

import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** Semantics pins for the composed as-of join: greatest right ts <= left
  * ts per key, same-instant matches included, unmatched left rows dropped
  * (inner), multiple payload columns carried.
  */
class AsOfSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("as-of picks the most recent prior or same-instant right row per key") {
    import spark.implicits._
    val left = Seq(
      (1L, t("2024-01-01 10:00:00"), "p1"),
      (1L, t("2024-01-01 12:00:00"), "p2"),
      (2L, t("2024-01-01 09:00:00"), "p3"), // before any right row: dropped
      (2L, t("2024-01-01 11:30:00"), "p4"),
      (3L, t("2024-01-01 11:00:00"), "p5")  // key with no right rows
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, t("2024-01-01 09:30:00"), 100.0),
      (1L, t("2024-01-01 10:00:00"), 200.0), // same instant as p1
      (1L, t("2024-01-01 11:00:00"), 300.0),
      (2L, t("2024-01-01 10:00:00"), 400.0)
    ).toDF("user_id", "ts", "amount")

    val got = AsOf.asofJoin(left, right, key = "user_id")
      .select("tag", "r_amount").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    got shouldBe Map("p1" -> 200.0, "p2" -> 300.0, "p4" -> 400.0)
  }

  test("staleness bound drops rows whose only match is too old, keeps fresh ones") {
    import spark.implicits._
    val left = Seq(
      (1L, t("2024-01-01 10:00:00"), "fresh"),   // match 5 min old: kept
      (2L, t("2024-01-01 12:00:00"), "stale"),   // match 125 min old: dropped
      (3L, t("2024-01-01 09:00:00"), "none")     // no prior match at all
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, t("2024-01-01 09:55:00"), 1.0),
      (2L, t("2024-01-01 09:55:00"), 2.0)
    ).toDF("user_id", "ts", "amount")
    val got = AsOf.asofJoin(left, right, key = "user_id",
        maxStalenessSeconds = Some(3600L))
      .select("tag").collect().map(_.getString(0)).toSeq
    got shouldBe Seq("fresh")
    // same instant is 0 seconds stale — still a match at any bound
    val same = AsOf.asofJoin(
      Seq((9L, t("2024-01-01 10:00:00"), "x")).toDF("user_id", "ts", "tag"),
      Seq((9L, t("2024-01-01 10:00:00"), 5.0)).toDF("user_id", "ts", "amount"),
      key = "user_id", maxStalenessSeconds = Some(0L))
    same.count() shouldBe 1L
  }

  test("as-of carries every right payload column and preserves left columns") {
    import spark.implicits._
    val left = Seq((7L, t("2024-02-01 00:00:05"), 42, "keepme"))
      .toDF("user_id", "ts", "num", "note")
    val right = Seq((7L, t("2024-02-01 00:00:01"), "x", 1.5))
      .toDF("user_id", "ts", "code", "score")
    val row = AsOf.asofJoin(left, right, key = "user_id").head()
    row.getAs[Int]("num") shouldBe 42
    row.getAs[String]("note") shouldBe "keepme"
    row.getAs[String]("r_code") shouldBe "x"
    row.getAs[Double]("r_score") shouldBe 1.5
    row.getAs[Timestamp]("r_ts") shouldBe t("2024-02-01 00:00:01")
  }

  test("dotted column names stay single columns, not nested paths") {
    import spark.implicits._
    // "price.usd" is a legal DataFrame column name; every name-derived
    // col(...) in asofJoin must backtick-quote or it parses as struct
    // field access and the join fails to resolve (or silently mis-binds)
    val left = Seq((1L, t("2024-03-01 10:00:00"), "l.note"))
      .toDF("user_id", "ts", "tag.kind")
    val right = Seq((1L, t("2024-03-01 09:00:00"), 9.99))
      .toDF("user_id", "ts", "price.usd")
    val row = AsOf.asofJoin(left, right, key = "user_id").head()
    row.getAs[String]("tag.kind") shouldBe "l.note"
    row.getAs[Double]("r_price.usd") shouldBe 9.99
    row.getAs[Timestamp]("r_ts") shouldBe t("2024-03-01 09:00:00")
  }

  test("null right payload values do not stitch columns from different right rows") {
    import spark.implicits._
    // Newest prior right row has amount = null: the joined row must carry
    // THAT row's (null) amount, not resurrect the older row's 100.0 —
    // the failure mode of carrying each r_ column in its own
    // last(ignoreNulls) window.
    val left = Seq((1L, t("2024-01-01 12:00:00"), "p"))
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, t("2024-01-01 10:00:00"), Some(100.0), "old"),
      (1L, t("2024-01-01 11:00:00"), None: Option[Double], "new")
    ).toDF("user_id", "ts", "amount", "label")
    val row = AsOf.asofJoin(left, right, key = "user_id").head()
    row.getAs[Timestamp]("r_ts") shouldBe t("2024-01-01 11:00:00")
    row.getAs[String]("r_label") shouldBe "new"
    row.isNullAt(row.fieldIndex("r_amount")) shouldBe true
  }

  test("property: as-of equals the brute-force max-prior-ts formulation on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(2468)
    def randRows(n: Int, tag: String) = (0 until n).map { i =>
      (s"$tag$i", rnd.nextInt(6).toLong,
        t(f"2024-03-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"))
    }
    // dedupe right per (key, ts): as-of tie order is undefined otherwise
    val left = randRows(120, "L").toDF("id", "user_id", "ts")
    val right = randRows(80, "R").toDF("rid0", "user_id", "ts")
      .groupBy("user_id", "ts").agg(max("rid0").as("rid"))

    val got = AsOf.asofJoin(left, right, key = "user_id")
      .select("id", "r_rid").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

    // brute force: all priors, keep max ts then max rid
    val brute = left.join(right.select(col("user_id"),
        col("ts").as("rts"), col("rid")), Seq("user_id"))
      .filter(col("rts") <= col("ts"))
      .groupBy("id")
      .agg(max_by(col("rid"), struct(col("rts"), col("rid"))).as("rid"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

    got shouldBe brute
  }

  test("fill-forward resampling equals the brute-force last-observation lookup") {
    // q_fill_forward's composition (sequence/explode grid + asofJoin)
    // against an independent O(grid x events) formulation at sf0.001
    val byName = graft.operators.Relational.all.map(q => q.name -> q).toMap
    val got = byName("q_fill_forward").fn(spark, sfDir)

    val ev = Tables.events(spark, sfDir)
    val obs = ev.groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("v"))
    val grid = ev.groupBy("user_id")
      .agg(date_trunc("hour", min("ts")).as("t0"),
        date_trunc("hour", max("ts")).as("t1"))
      .select(col("user_id"),
        explode(sequence(col("t0"), col("t1"), expr("INTERVAL 1 HOUR")))
          .as("gts"))
    val brute = grid.join(obs, Seq("user_id"))
      .filter(col("ts") <= col("gts"))
      .groupBy("user_id", "gts")
      .agg(max_by(col("v"), col("ts")).as("value"))

    got.count() should be > 0L
    got.except(brute).count() shouldBe 0
    brute.except(got).count() shouldBe 0
  }
}
