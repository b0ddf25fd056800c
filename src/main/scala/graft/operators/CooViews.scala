package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic COO matrices derived from the parquet testdata, defined
  * identically here (Spark) and as SQL CTEs (DuckDB oracle) so both engines
  * see bit-identical input without any RNG (SURVEY.md §2.9).
  *
  * Determinism: every cell value is an *integer-valued double* (quantized
  * where the source column has decimals), so sums/products are exact in
  * any summation order in both engines.
  */
object CooViews {

  /** 64×8-ish dense-ish matrix: quantity totals keyed by (orderkey mod 64,
    * linenumber). Exact: l_quantity is integer-valued. */
  val matASql: String =
    """matA AS (SELECT l_orderkey % 64 AS i, CAST(l_linenumber AS BIGINT) AS j,
      |  SUM(l_quantity) AS v FROM lineitem GROUP BY 1, 2)""".stripMargin
  // The three COO views are MODULUS-KEYED aggregates — ≤ 64×8, 7×16 and
  // 32×7 cells BY CONSTRUCTION at any corpus scale — consumed by ~15
  // declared queries that each re-ran the fact-table scan + aggregate.
  // Memoized per (session, dir) like every other shared build (round-15):
  // one scan per harness run, every consumer reads the ≤512-row
  // checkpointed blocks. Downstream joins on these views (and on
  // aggregates derived from them) may broadcast unconditionally — the
  // cell count is bounded by the key moduli, not the data.
  def matA(s: SparkSession, d: String): DataFrame =
    graft.Memo(s, s"coo.matA:$d", d) {
      Tables.lineitem(s, d)
        .groupBy((col("l_orderkey") % 64).as("i"),
          col("l_linenumber").cast("long").as("j"))
        .agg(sum("l_quantity").as("v"))
        .localCheckpoint(true)
    }

  /** 7×16 matrix on the inner dimension of matA: discount cents keyed by
    * (linenumber, suppkey mod 16). */
  val matBSql: String =
    """matB AS (SELECT CAST(l_linenumber AS BIGINT) AS i, l_suppkey % 16 AS j,
      |  CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT)) AS DOUBLE) AS v
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin
  def matB(s: SparkSession, d: String): DataFrame =
    graft.Memo(s, s"coo.matB:$d", d) {
      Tables.lineitem(s, d)
        .groupBy(col("l_linenumber").cast("long").as("i"),
          (col("l_suppkey") % 16).as("j"))
        .agg(sum(round(col("l_discount") * 100).cast("long")).cast("double")
          .as("v"))
        .localCheckpoint(true)
    }

  /** Signed matrix (for abs / nonzero ops): centered discount cents. */
  val matSSql: String =
    """matS AS (SELECT l_partkey % 32 AS i, CAST(l_linenumber AS BIGINT) AS j,
      |  CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT) - 5) AS DOUBLE) AS v
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin
  def matS(s: SparkSession, d: String): DataFrame =
    graft.Memo(s, s"coo.matS:$d", d) {
      Tables.lineitem(s, d)
        .groupBy((col("l_partkey") % 32).as("i"),
          col("l_linenumber").cast("long").as("j"))
        .agg(sum(round(col("l_discount") * 100).cast("long") - 5).cast("double")
          .as("v"))
        .localCheckpoint(true)
    }

  /** Tall-skinny design matrix X for the normal-equations path: one row per
    * lineitem, 4 quantized feature columns (bias, quantity, discount, tax —
    * all ×100, so the Gram is exact integer arithmetic; divide by 10^4 at
    * the end). Reference: the dridge design matrix,
    * LinearRegression.scala:17-34. */
  val cooXSql: String =
    """cooX AS (
      |  SELECT l_orderkey*8 + l_linenumber AS i, CAST(0 AS BIGINT) AS j,
      |         CAST(100 AS DOUBLE) AS v FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey*8 + l_linenumber, 1, ROUND(l_quantity*100) FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey*8 + l_linenumber, 2, ROUND(l_discount*100) FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey*8 + l_linenumber, 3, ROUND(l_tax*100) FROM lineitem)"""
      .stripMargin
  def cooX(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).selectExpr(
      "l_orderkey*8 + l_linenumber AS i",
      """stack(4,
        |  CAST(0 AS BIGINT), CAST(100 AS DOUBLE),
        |  CAST(1 AS BIGINT), ROUND(l_quantity*100),
        |  CAST(2 AS BIGINT), ROUND(l_discount*100),
        |  CAST(3 AS BIGINT), ROUND(l_tax*100)) AS (j, v)""".stripMargin)
      .select("i", "j", "v")

  /** Raw (unaggregated) lineitem COO with the natural order key — input for
    * re-keying joins. */
  val cooLiSql: String =
    """cooLi AS (SELECT l_orderkey AS i, CAST(l_linenumber AS BIGINT) AS j,
      |  l_quantity AS v FROM lineitem)""".stripMargin
  def cooLi(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(col("l_orderkey").as("i"),
      col("l_linenumber").cast("long").as("j"), col("l_quantity").as("v"))
}
