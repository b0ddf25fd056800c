package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (merge_asof / "most recent prior fact"): each left row
  * matches the single right row with the greatest `rightTs ≤ leftTs` for
  * the same key — the canonical event-enrichment operator Spark has no
  * built-in for.
  *
  * Built by COMPOSITION (SURVEY §2.8 X16 preference (a); no custom
  * physical operator needed): tag both sides, union, and carry the last
  * non-null right payload forward with a running `last(..., ignoreNulls)`
  * window ordered by (ts, side) — right rows sort before left rows at
  * equal timestamps so same-instant facts are visible. One shuffle on the
  * key, O(n log n) in the partition sort, versus the O(n·m) range join a
  * naive formulation pays. At 100 TB both sides shuffle once on the key;
  * per-key event streams sort within partitions.
  */
object AsOf {

  /** Name → Column without path parsing: `col("a.b")` means field b of
    * struct a, so every name-derived column here goes through backtick
    * quoting — a payload column legitimately named "a.b" stays one
    * column. */
  private def qcol(name: String) =
    col("`" + name.replace("`", "``") + "`")

  /** Inner as-of join. `right` columns (except `key`/`rightTs`) come back
    * `r_`-prefixed; `rightTs` returns as `r_ts`. Right side should be
    * unique per (key, ts) — pre-aggregate if not (result would otherwise
    * depend on tie order, which no engine defines for as-of).
    *
    * `maxStalenessSeconds`: when set, a matched right row older than the
    * bound is no match at all (the row drops, inner semantics) — the
    * feature-store freshness contract: "enrich with the latest feature
    * value, unless it has gone stale". A post-filter on the carried
    * `r_ts`, so the plan shape (one shuffle on the key, per-key sort) is
    * unchanged; the bound prunes AFTER the single-pass carry rather than
    * re-scoping the window, which would reintroduce the O(n·m) range
    * join this composition exists to avoid.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String = "ts", rightTs: String = "ts",
      maxStalenessSeconds: Option[Long] = None): DataFrame = {
    val rPayload = right.columns.filter(c => c != key && c != rightTs)
    val rCols = ("r_ts" +: rPayload.map("r_" + _)).toSeq
    val lCols = left.columns.filterNot(_ == key).toSeq
    // a left column named like a generated r_ output (e.g. feeding a
    // previous asofJoin result back in as the new left) would be
    // silently overwritten with nulls and then collide in the select —
    // fail with the actual problem instead
    val collisions = lCols.toSet.intersect(rCols.toSet)
    require(collisions.isEmpty,
      s"asofJoin: left columns collide with generated right outputs: " +
        collisions.mkString(", ") + " — rename them on the left first")

    val lTagged = left
      .withColumn("__ts", qcol(leftTs))
      .withColumn("__is_left", lit(1))
    val lAligned = rCols.foldLeft(lTagged)((df, c) =>
      df.withColumn(c, lit(null).cast(
        right.schema(if (c == "r_ts") rightTs else c.stripPrefix("r_"))
          .dataType)))

    val rTagged = right
      .withColumn("__ts", qcol(rightTs))
      .withColumn("__is_left", lit(0))
      .withColumn("r_ts", qcol(rightTs))
    val rRenamed = rPayload.foldLeft(rTagged)((df, c) =>
      df.withColumnRenamed(c, "r_" + c))
    val rAligned = lCols.foldLeft(rRenamed)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val unioned = lAligned.select((key +: "__ts" +: "__is_left" +:
      (lCols ++ rCols)).map(qcol): _*)
      .unionByName(rAligned.select((key +: "__ts" +: "__is_left" +:
        (lCols ++ rCols)).map(qcol): _*))

    // right (0) sorts before left (1) at equal ts → r_ts <= leftTs matches.
    // The right payload is carried as ONE struct under a single
    // last(ignoreNulls) — per-column windows would stitch values from
    // different right rows whenever a right payload column is
    // legitimately null, breaking as-of row semantics. The struct is
    // null exactly on left rows (never on right rows), so ignoreNulls
    // skips left rows and nothing else.
    val w = Window.partitionBy(qcol(key))
      .orderBy(col("__ts"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rStruct = when(col("__is_left") === 0,
      struct(rCols.map(qcol): _*))
    val carried = unioned
      .withColumn("__r", last(rStruct, ignoreNulls = true).over(w))

    // getField, not col("__r.name"): a payload column whose name contains
    // a dot (legal in DataFrames) would parse as a deeper nested path
    val matched = rCols.foldLeft(carried)((df, c) =>
      df.withColumn(c, col("__r").getField(c)))
      .filter(col("__is_left") === 1 && col("r_ts").isNotNull)
    val bounded = maxStalenessSeconds match {
      case Some(sec) => matched.filter(
        col("r_ts") >= col("__ts") - expr(s"INTERVAL '$sec' SECOND"))
      case None => matched
    }
    bounded.drop("__ts", "__is_left", "__r")
  }
}
