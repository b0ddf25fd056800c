package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global ranking — the scale-safe replacement for
  * `row_number()/ntile() OVER (ORDER BY ...)` with an empty partitionBy,
  * whose single window partition funnels the ENTIRE table through one
  * task. Here the sort is Spark's range-partitioned distributed sort and
  * the per-row index comes from RDD `zipWithIndex` (one extra count job to
  * learn partition sizes, then a narrow map — no row ever leaves its
  * partition to be numbered).
  *
  * Deterministic only when the sort columns form a total order (unique
  * key); the callers below all sort on a key-suffixed column list.
  */
object Rank {

  /** Append a 0-based dense global row index in the order of `sortCols`. */
  def withRowIndex(df: DataFrame, sortCols: String*): DataFrame = {
    val sorted = df.orderBy(sortCols.map(col): _*)
    val schema = StructType(sorted.schema.fields :+
      StructField("idx", LongType, nullable = false))
    sorted.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
  }

  /** SQL `ntile(k) OVER (ORDER BY sortCols)` without the single-task
    * window: rank via [[withRowIndex]], then the standard ntile split in
    * arithmetic — the first n % k buckets get ⌈n/k⌉ rows, the rest ⌊n/k⌋
    * (identical to the SQL definition, asserted against DuckDB by
    * q_ntile's oracle). `n` rides in as two scalar literals; the count
    * job zipWithIndex runs anyway learns it for free at the call site. */
  def globalNtile(df: DataFrame, k: Int, n: Long,
      sortCols: String*): DataFrame = {
    val size = n / k
    val rem = n % k
    // n < k degenerates to bucket = rank (size = 0 would divide by zero)
    val bucket = if (size == 0) col("idx")
    else when(col("idx") < rem * (size + 1),
      col("idx") / (size + 1))
      .otherwise(lit(rem) + (col("idx") - rem * (size + 1)) / size)
    withRowIndex(df, sortCols: _*)
      .withColumn("ntile", (floor(bucket) + 1).cast("long"))
      .drop("idx")
  }
}
