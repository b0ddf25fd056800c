package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The generic per-block escape hatch — Samsara's `mapBlock`/
  * `allreduceBlock` signature kept for parity (mahout-samsara-book:
  * myMahoutApp/src/main/scala/myMahoutApp/TWCNB.scala:90-147,
  * BahmaniSketch.scala:63-92: closures over `(keys: Array[K],
  * block: Matrix)` partitions).
  *
  * Every concrete use in the reference decomposes into relational form
  * (SURVEY §2.3) and those forms are what the declared queries run — this
  * generic version exists for the genuinely imperative cases (custom
  * kernels no expression can state). It operates on the row-vector view
  * `(key BIGINT, vec ARRAY<DOUBLE>)`; one partition = one block.
  *
  * Scale: the closure sees one partition at a time as arrays (bounded by
  * partition size, not dataset size); no shuffle is introduced — callers
  * control partitioning upstream.
  */
object Block {

  type RowVec = (Long, Array[Double])

  /** Per-partition block transform; `f` may rewrite keys, change row
    * count, and change width (ref `mapBlock(ncol = ...)`). */
  def mapBlock(rows: Dataset[RowVec])(
      f: (Array[Long], Array[Array[Double]]) => (Array[Long], Array[Array[Double]]))
      : Dataset[RowVec] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      val (keys, vecs) = it.toArray.unzip
      if (keys.isEmpty) Iterator.empty
      else {
        val (k2, v2) = f(keys, vecs)
        require(k2.length == v2.length,
          s"mapBlock: ${k2.length} keys vs ${v2.length} rows")
        k2.iterator.zip(v2.iterator)
      }
    }
  }

  /** Map each block to a local value, reduce to the driver (ref
    * `allreduceBlock(blockF, reduceF)`, TWCNB.scala:54-83). */
  def allreduceBlock[A: scala.reflect.ClassTag](rows: Dataset[RowVec],
      blockF: (Array[Long], Array[Array[Double]]) => A,
      reduceF: (A, A) => A): A = {
    val parts = rows.rdd
      .mapPartitions { it =>
        val (keys, vecs) = it.toArray.unzip
        if (keys.isEmpty) Iterator.empty else Iterator.single(blockF(keys, vecs))
      }
    // RDD.reduce throws a bare UnsupportedOperationException("empty
    // collection") from deep inside the job on an empty dataset — fail
    // with the actual contract violation instead
    require(!parts.isEmpty(),
      "allreduceBlock: empty input (no blocks to reduce)")
    parts.reduce(reduceF)
  }

  /** COO matrix → row-vector Dataset at a given width (the typed twin of
    * [[Coo.toRows]]). */
  def rowsOf(coo: DataFrame, ncol: Int): Dataset[RowVec] = {
    import coo.sparkSession.implicits._
    Coo.toRows(coo, ncol).select(col("i"), col("vec")).as[RowVec]
  }
}
