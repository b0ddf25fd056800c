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
}
