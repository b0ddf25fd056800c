package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities (SURVEY §2.8 / the 100 TB checklist:
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join handles sort-merge skew automatically at runtime; this
  * explicit salt is for the cases AQE can't split — a single hot key whose
  * matching build-side rows must be replicated, e.g. an aggregation-free
  * broadcast-unfriendly dimension, or deterministic plans where runtime
  * re-planning is disabled.
  *
  * Mechanics: the large (skewed) side gets a deterministic salt in
  * [0, n) derived from non-key columns; the small side is replicated n
  * times with every salt value; the join key becomes (key, salt), so one
  * hot key spreads over n shuffle partitions. Result set is identical to
  * the unsalted join (each large-side row still meets each matching
  * small-side row exactly once).
  */
object Skew {

  /** Inner equi-join `large ⋈ small` on `key`, salting the large side
    * `nSalts` ways. `saltSource` must be a deterministic expression over
    * the LARGE side (e.g. a row id) — it only needs to spread rows, not
    * be random. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      nSalts: Int, saltSource: Column): DataFrame = {
    require(nSalts > 0, s"saltedJoin: nSalts must be positive ($nSalts)" +
      " — 0 would pmod-by-zero and replicate over a backwards sequence")
    require(!large.columns.contains("__salt") &&
      !small.columns.contains("__salt"),
      "saltedJoin: inputs already carry a __salt column — rename it first" +
        " (it would be silently overwritten and dropped)")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(nSalts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted SUM/COUNT aggregation: phase 1 aggregates on
    * (key, salt) — a hot key's rows spread over `nSalts` reducers —
    * phase 2 merges the per-salt partials on the key alone (tiny input:
    * ≤ nSalts rows per key). Use when ONE group dominates; Catalyst's
    * map-side partial aggregation already handles mild skew. Sums are
    * reassociated only (same addends), so quantized-exact inputs stay
    * bit-identical. */
  def saltedSum(df: DataFrame, key: String, valueCol: Column,
      nSalts: Int, saltSource: Column): DataFrame = {
    require(nSalts > 0, s"saltedSum: nSalts must be positive ($nSalts)")
    require(!df.columns.contains("__salt"),
      "saltedSum: input already carries a __salt column — rename it first")
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(nSalts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("sum"), sum(col("__n")).as("n"))
  }
}
