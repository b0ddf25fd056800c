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
  /** events.ts has shipped in three physical parquet encodings across
    * testdata generations: TIMESTAMP(NANOS) (read by Spark 4 only as a
    * BIGINT of nanos under the legacy conf), TIMESTAMP_NTZ micros (the
    * current generation), and plain TIMESTAMP micros. Normalize all three
    * to a session-UTC TimestampType by branching on the dtype the scan
    * actually reports:
    *
    *  - `LongType`         → nanos-as-long: truncate to micros with integer
    *    division (identical to DuckDB's nanos→micros truncation; double
    *    division would lose precision at 1.7e18 ns).
    *  - `TimestampNTZType` → `cast("timestamp")`. The engine runs with
    *    `spark.sql.session.timeZone=UTC`, so the cast is the identity on
    *    wall-clock values — `window()`, `unix_micros`, and the DuckDB
    *    naive-timestamp oracles all see the same instants as before.
    *  - `TimestampType`    → already normalized, pass through.
    *
    * SIDE EFFECT, deliberate: the nanosAsLong legacy conf is session-wide
    * and must stay set while the (lazy) scan executes, so it is NOT
    * restored — after this call, any other TIMESTAMP(NANOS) parquet in the
    * session also reads as BIGINT nanos instead of failing. The testdata
    * has at most one nanos table, so this is contained; a multi-tenant
    * session would scope the read to its own SparkSession instead.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    normalizeTs(raw)
  }

  /** Schema-adaptive `ts` normalization (see [[events]]); exposed so tests
    * can pin each encoding branch against hand-written fixtures.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other; expected nanos-as-long, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
