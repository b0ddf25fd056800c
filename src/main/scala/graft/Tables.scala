package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  * One parquet file per table under `<sfDir>/<name>.parquet`.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * directly. Read it as a long (legacy conf) and truncate to microseconds
    * with integer division — identical to DuckDB's nanos→micros truncation
    * (double division would lose precision at 1.7e18 ns).
    *
    * SIDE EFFECT, deliberate: the legacy conf is session-wide and must
    * stay set while the (lazy) scan executes, so it is NOT restored —
    * after this call, any other TIMESTAMP(NANOS) parquet in the session
    * also reads as BIGINT nanos instead of failing. The testdata has one
    * nanos table, so this is contained; a multi-tenant session would
    * scope the read to its own SparkSession instead.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
