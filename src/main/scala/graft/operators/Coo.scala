package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear algebra over the canonical COO (coordinate) matrix
  * view: a DataFrame with columns `i BIGINT, j BIGINT, v DOUBLE`, sparse by
  * construction (absent cells are implicit zeros).
  *
  * This is the Spark-native re-expression of the reference's `DrmLike[K]`
  * row-matrix algebra (mahout-samsara-book: myMahoutApp/src/main/scala/
  * myMahoutApp/TWCNB.scala:28, LinearRegression.scala:17-34,
  * BahmaniSketch.scala:37-40). Where Samsara partitions rows into
  * `(Array[K], Matrix)` blocks and runs closures over them, here every
  * operator is a pure `DataFrame => DataFrame` relational transform, so
  * whole pipelines stay inside one Catalyst plan: filters push down, partial
  * aggregation is map-side, and joins pick broadcast/shuffle by size.
  *
  * Scale notes (100 TB): all operators shuffle at most once, keyed on their
  * natural output key; matmul cost is bounded by the inner-dimension join
  * fan-out, so keep one side's inner dimension small or pre-aggregate (the
  * Gram path for tall-skinny matrices avoids the n² cell shuffle entirely —
  * see [[GramAggregator]]).
  */
object Coo {

  /** Transpose: pure projection, zero shuffle (reference: `A.t`,
    * TWCNB.scala:50,54; LinearRegression.scala:26). */
  def transpose(m: DataFrame): DataFrame =
    m.select(col("j").as("i"), col("i").as("j"), col("v"))

  /** Matrix multiply A %*% B: equi-join on the inner dimension + hash
    * aggregate (reference: `%*%`, TWCNBSuite.scala:115). Catalyst picks
    * broadcast-hash when one side is small.
    */
  def matmul(a: DataFrame, b: DataFrame): DataFrame =
    a.as("a").join(b.as("b"), col("a.j") === col("b.i"))
      .groupBy(col("a.i").as("i"), col("b.j").as("j"))
      .agg(sum(col("a.v") * col("b.v")).as("v"))

  /** Gram matrix Xᵀ X as a self-join on the row id (reference:
    * `drmXB.t %*% drmXB`, LinearRegression.scala:26). The transpose is
    * implicit — never materialized. For tall-skinny X prefer
    * [[GramAggregator]] (one pass, k×k buffer, no n² shuffle).
    */
  def gram(x: DataFrame): DataFrame =
    x.as("a").join(x.as("b"), col("a.i") === col("b.i"))
      .groupBy(col("a.j").as("i"), col("b.j").as("j"))
      .agg(sum(col("a.v") * col("b.v")).as("v"))

  /** Matrix × broadcast vector (reference: `drmXB.t %*% y`,
    * LinearRegression.scala:30). `vec` is a small (j, w) DataFrame —
    * broadcast-joined so the matrix side never shuffles before the
    * aggregate. */
  def matvec(a: DataFrame, vec: DataFrame): DataFrame =
    a.join(broadcast(vec), "j")
      .groupBy("i").agg(sum(col("v") * col("w")).as("v"))

  /** Prepend a constant column (reference: `1 cbind drmX`,
    * LinearRegression.scala:23): shift existing j, union the bias cells. */
  def cbindScalar(m: DataFrame, value: Double): DataFrame =
    m.select(col("i")).distinct()
      .select(col("i"), lit(0L).as("j"), lit(value).as("v"))
      .unionAll(m.select(col("i"), (col("j") + 1).as("j"), col("v")))

  /** Vertical concat with row-key offset (reference: `rbind`,
    * TWCNB.scala:81; BahmaniSketch.scala:91). */
  def rbind(a: DataFrame, b: DataFrame, offset: Long): DataFrame =
    a.unionAll(b.select((col("i") + offset).as("i"), col("j"), col("v")))

  /** Column sums (reference: `colSums()`, TWCNB.scala:117,134). */
  def colSums(m: DataFrame): DataFrame =
    m.groupBy("j").agg(sum("v").as("v"))

  /** Row sums (reference: `rowSums()`, TWCNB.scala:110). */
  def rowSums(m: DataFrame): DataFrame =
    m.groupBy("i").agg(sum("v").as("v"))

  /** Column-range slice with reindex (reference: `mxC(::, 2 until n+2)`,
    * BahmaniSketch.scala:49). Pure filter — pushes into the scan. */
  def sliceCols(m: DataFrame, lo: Long, hi: Long): DataFrame =
    m.filter(col("j").between(lo, hi))
      .select(col("i"), (col("j") - lo).as("j"), col("v"))

  /** Elementwise transform of the value column (reference: `:=` functional
    * assign, TWCNB.scala:126). */
  def ewise(m: DataFrame, f: Column => Column): DataFrame =
    m.select(col("i"), col("j"), f(col("v")).as("v"))

  /** Frobenius norm (reference: `norm`, BahmaniSketch.scala:134). */
  def froNorm(m: DataFrame): DataFrame =
    m.agg(sqrt(sum(col("v") * col("v"))).as("fro"))

  /** Pairwise squared Euclidean distances between rows (reference:
    * `dist(mxC)`, BahmaniSketch.scala:122), in the norm-expansion form
    * ‖a‖² + ‖b‖² − 2·a·b. The naive Σ(aⱼ−bⱼ)² over an equi-join on j is
    * WRONG on sparse rows — cells present in only one row vanish from the
    * join, and row pairs sharing no column disappear entirely; the
    * expansion needs the dot product only over shared columns (absent
    * cells contribute 0 to a·b) plus per-row norms, honoring the
    * implicit-zero contract. */
  def pairwiseDistSq(m: DataFrame): DataFrame = {
    val n2 = m.groupBy("i").agg(sum(col("v") * col("v")).as("n2"))
    val dots = m.as("a").join(m.as("b"), col("a.j") === col("b.j"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(col("a.v") * col("b.v")).as("dot"))
    n2.select(col("i"), col("n2").as("n2a"))
      .crossJoin(n2.select(col("i").as("j"), col("n2").as("n2b")))
      .join(dots, Seq("i", "j"), "left")
      .select(col("i"), col("j"),
        (col("n2a") + col("n2b") - coalesce(col("dot"), lit(0.0)) * 2.0)
          .as("v"))
  }

  /** Add λ to the diagonal (reference: `mxA.diagv += lambda`,
    * LinearRegression.scala:27). Diagonal cells ABSENT from the sparse
    * matrix (an all-zero feature column has no (j,j) Gram cell) must
    * still receive λ — that singular coordinate is exactly what ridge
    * regularization exists to fix — so the λ cells are unioned in over
    * the full key domain and merged. */
  def diagReg(m: DataFrame, lambda: Double): DataFrame = {
    val keys = m.select(col("i")).unionAll(m.select(col("j").as("i")))
      .distinct()
    val diag = keys.select(col("i"), col("i").as("j"),
      lit(lambda).as("v"))
    m.unionAll(diag).groupBy("i", "j").agg(sum("v").as("v"))
  }

  /** Densify a COO matrix into the row-vector view
    * `(i BIGINT, vec ARRAY<DOUBLE>)` of width `ncol` — the bridge to
    * MLlib / `mapPartitions` block ops (reference block `(keys, Matrix)`,
    * TWCNB.scala:109). One shuffle on the row key. */
  def toRows(m: DataFrame, ncol: Int): DataFrame = {
    // ncol == 0 must yield empty vectors: sequence(0, -1) would run
    // BACKWARDS ([0, -1]) and fabricate two phantom columns
    val vec =
      if (ncol == 0) array().cast("array<double>")
      else transform(sequence(lit(0L), lit(ncol - 1L)),
        jj => coalesce(element_at(col("m"), jj), lit(0.0)))
    m.groupBy("i", "j").agg(sum("v").as("v")) // duplicate COO cells sum
      .groupBy("i")
      .agg(map_from_arrays(collect_list("j"), collect_list("v")).as("m"))
      .select(col("i"), vec.as("vec"))
  }

  /** Row-vector view back to COO, dropping explicit zeros. */
  def fromRows(rows: DataFrame): DataFrame =
    rows.select(col("i"), posexplode(col("vec")).as(Seq("j", "v")))
      .filter(col("v") =!= 0.0)
      .select(col("i"), col("j").cast("long").as("j"), col("v"))
}
