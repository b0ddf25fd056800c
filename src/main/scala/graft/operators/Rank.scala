package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.JoinedRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Distributed global ranking — the scale-safe replacement for
  * `row_number()/ntile() OVER (ORDER BY ...)` with an empty partitionBy,
  * whose single window partition funnels the ENTIRE table through one
  * task. Here the sort is Spark's range-partitioned distributed sort and
  * the per-row index comes from per-partition offsets (one count job to
  * learn partition sizes, then a narrow map — no row ever leaves its
  * partition to be numbered).
  *
  * Stays inside Tungsten end to end: the numbering runs over
  * `queryExecution.toRdd` (InternalRow — no external-Row codec), appends
  * the index as one long, and re-enters the DataFrame world through
  * [[org.apache.spark.sql.GraftSqlBridge]]. Both jobs (count pass, map
  * pass) share one RDD lineage, so the sort's shuffle files are written
  * once and the map pass skips the scan+sort stage entirely — the table
  * is read once, not per-job.
  *
  * Deterministic only when the sort columns form a total order (unique
  * key); the callers below all sort on a key-suffixed column list.
  */
object Rank {

  /** Append a 0-based dense global row index in the order of `sortCols`,
    * and return the total row count alongside — the count pass the
    * numbering needs anyway learns n for free, so callers that want both
    * (ntile's bucket arithmetic) don't pay a separate `df.count()` scan.
    */
  def withRowIndexAndCount(df: DataFrame, sortCols: String*)
      : (DataFrame, Long) = {
    val sorted = df.orderBy(sortCols.map(col): _*)
    val rdd = sorted.queryExecution.toRdd
    val counts = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)),
        preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val indexed = rdd.mapPartitionsWithIndex[InternalRow] { (i, it) =>
      var idx = offsets(i) - 1
      // copy(): sort readers reuse the UnsafeRow buffer per element; the
      // appended row must own its bytes. Still a flat byte copy — not the
      // external-Row decode the previous df.rdd formulation paid.
      it.map { r => idx += 1; new JoinedRow(r.copy(), InternalRow(idx)) }
    }
    val schema = StructType(sorted.schema.fields :+
      StructField("idx", LongType, nullable = false))
    (GraftSqlBridge.internalRowsToDf(sorted.sparkSession, indexed, schema),
      offsets.last)
  }

  /** Append a 0-based dense global row index in the order of `sortCols`. */
  def withRowIndex(df: DataFrame, sortCols: String*): DataFrame =
    withRowIndexAndCount(df, sortCols: _*)._1

  /** Distributed exclusive prefix sum (scan): append `off` = the sum of
    * `valueCol` over all rows STRICTLY BEFORE this one in `sortCols`
    * order — `SUM(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING AND 1
    * PRECEDING)` without the empty-partitionBy window's single task.
    * Same two-job shape as [[withRowIndexAndCount]]: one pass sums each
    * partition of the range-partitioned sort (driver collects one long
    * per partition), one narrow map emits running offsets; both jobs
    * share the sort's shuffle files. `valueCol` must be a non-null LONG
    * (exact integer arithmetic — the prefix is reproducible in any
    * engine, which a floating scan would not be). */
  def withRunningTotal(df: DataFrame, valueCol: String, sortCols: String*)
      : DataFrame = {
    val sorted = df.orderBy(sortCols.map(col): _*)
    val ord = sorted.schema.fieldIndex(valueCol)
    require(sorted.schema(ord).dataType == LongType,
      s"withRunningTotal needs LONG $valueCol, found " +
        sorted.schema(ord).dataType)
    val rdd = sorted.queryExecution.toRdd
    val sums = rdd
      .mapPartitionsWithIndex((i, it) => {
        var s = 0L
        it.foreach(r => s += r.getLong(ord))
        Iterator((i, s))
      }, preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(0L)(_ + _)
    val indexed = rdd.mapPartitionsWithIndex[InternalRow] { (i, it) =>
      var acc = offsets(i)
      it.map { r =>
        val v = r.getLong(ord)
        val out = new JoinedRow(r.copy(), InternalRow(acc))
        acc += v
        out
      }
    }
    val schema = StructType(sorted.schema.fields :+
      StructField("off", LongType, nullable = false))
    GraftSqlBridge.internalRowsToDf(sorted.sparkSession, indexed, schema)
  }

  /** Sequence packing, PER-PARTITION form — the linear alternative to
    * the global concat-and-chunk (q_pack_chunks): each input partition
    * concatenates ITS documents' token streams in arrival order and
    * cuts at every `chunkTokens` boundary, emitting the per-chunk fill
    * profile (part_id, chunk_id, n_docs, n_tokens). No global sort, no
    * prefix-sum jobs, no shuffle of any kind — one streaming pass per
    * partition, linear by construction; the cost the global form pays
    * is its total document order (a distributed sort, n log n), which a
    * pretraining pipeline that accepts per-partition packing order does
    * not need (chunk boundaries then depend on the input's partition
    * layout — the semantics choice this operator leaves to the caller,
    * SCALE.md round-11). Every chunk except possibly the LAST OF EACH
    * PARTITION is exactly `chunkTokens` full, and total tokens are
    * conserved: Σ n_tokens = Σ valueCol (both pinned in RankSpec
    * against a driver-side reference and against the global form).
    * Rows with valueCol ≤ 0 are skipped, matching the global form's
    * ntok > 0 filter. `valueCol` must be a non-null LONG. Stays inside
    * Tungsten: reads `queryExecution.toRdd` (InternalRow), aggregates
    * chunks on the fly (a chunk closes the moment its boundary is
    * crossed — nothing token-proportional is ever buffered), re-enters
    * through [[org.apache.spark.sql.GraftSqlBridge]]. */
  def packChunksLocal(df: DataFrame, valueCol: String,
      chunkTokens: Long): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    val ord = df.schema.fieldIndex(valueCol)
    require(df.schema(ord).dataType == LongType,
      s"packChunksLocal needs LONG $valueCol, found " +
        df.schema(ord).dataType)
    val rdd = df.queryExecution.toRdd
    val out = rdd.mapPartitionsWithIndex[InternalRow] { (pid, it) =>
      var off = 0L    // tokens consumed in this partition so far
      var chunk = 0L  // current (still-open) local chunk id
      var docs = 0L   // docs touching the open chunk
      var tok = 0L    // tokens in the open chunk
      val body = it.flatMap { r =>
        val ntok = r.getLong(ord)
        if (ntok <= 0L) Iterator.empty
        else {
          var remaining = ntok
          var emitted = List.empty[InternalRow]
          while (remaining > 0L) {
            val chunkEnd = (chunk + 1L) * chunkTokens
            val take = math.min(remaining, chunkEnd - off)
            docs += 1L; tok += take; off += take; remaining -= take
            if (off == chunkEnd) {
              emitted = InternalRow(pid, chunk, docs, tok) :: emitted
              chunk += 1L; docs = 0L; tok = 0L
            }
          }
          emitted.reverse.iterator
        }
      }
      // by-name ++: the partial-chunk check runs only after `body` has
      // drained, when the vars hold the partition's final state
      body ++ (if (tok > 0L)
        Iterator.single(InternalRow(pid, chunk, docs, tok))
      else Iterator.empty)
    }
    val schema = StructType(Seq(
      StructField("part_id", IntegerType, nullable = false),
      StructField("chunk_id", LongType, nullable = false),
      StructField("n_docs", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false)))
    GraftSqlBridge.internalRowsToDf(df.sparkSession, out, schema)
  }

  /** SQL `ntile(k) OVER (ORDER BY sortCols)` without the single-task
    * window: rank via [[withRowIndexAndCount]], then the standard ntile
    * split in arithmetic — the first n % k buckets get ⌈n/k⌉ rows, the
    * rest ⌊n/k⌋ (identical to the SQL definition, asserted against DuckDB
    * by q_ntile's oracle). n comes from the numbering pass itself — no
    * extra scan at the call site. */
  def globalNtile(df: DataFrame, k: Int, sortCols: String*): DataFrame = {
    val (ranked, n) = withRowIndexAndCount(df, sortCols: _*)
    val size = n / k
    val rem = n % k
    // n < k degenerates to bucket = rank (size = 0 would divide by zero)
    val bucket = if (size == 0) col("idx")
    else when(col("idx") < rem * (size + 1),
      col("idx") / (size + 1))
      .otherwise(lit(rem) + (col("idx") - rem * (size + 1)) / size)
    ranked
      .withColumn("ntile", (floor(bucket) + 1).cast("long"))
      .drop("idx")
  }
}
