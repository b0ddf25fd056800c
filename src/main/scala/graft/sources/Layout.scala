package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) data layout — the write-side half of
  * multi-dimensional scan pruning at 100 TB. Parquet footers carry
  * per-file/rowgroup min-max stats for every column, but a sort on ONE
  * key only clusters THAT key: a query box on (a, b) still touches
  * every file for the unsorted dimension. Interleaving the bits of both
  * keys and range-partitioning on the interleaved value gives every
  * file a small min-max RECTANGLE in (a, b) space, so a two-dimensional
  * predicate prunes on both columns at once (measured ~4× fewer files
  * touched in LayoutSpec at fixture scale; the ratio grows with file
  * count).
  *
  * The whole path is codegen'd Column arithmetic — bit-spread via the
  * classic mask cascade, no UDF — and ONE range-partitioned shuffle,
  * the same cost as any global sort of the table.
  */
object Layout {

  /** Spread the low 32 bits of `x` to even bit positions (Morton
    * spread): the standard 5-step mask cascade, expressed as Column
    * ops so it stays inside whole-stage codegen. */
  def spreadBits(x: Column): Column = {
    val s0 = (x.bitwiseOR(shiftleft(x, 32))).bitwiseAND(lit(0x00000000FFFFFFFFL))
    val s1 = (s0.bitwiseOR(shiftleft(s0, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val s4 = (s3.bitwiseOR(shiftleft(s3, 2))).bitwiseAND(lit(0x3333333333333333L))
    (s4.bitwiseOR(shiftleft(s4, 1))).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Morton code of two non-negative int-valued columns (each must fit
    * in 32 bits — quantize/rank wider domains first). `a` occupies the
    * even bit positions, `b` the odd. */
  def zvalue(a: Column, b: Column): Column =
    spreadBits(a.cast("long"))
      .bitwiseOR(shiftleft(spreadBits(b.cast("long")), 1))

  /** Min-max quantization of `c` onto [0, 2¹⁶): raw Morton interleaving
    * of UNEQUAL domains degenerates — the wider column's high bits own
    * every leading z-bit and the layout collapses to a single-key sort
    * (measured: suppkey ~7 bits vs partkey ~11 bits left 28/32 files
    * touched by a suppkey predicate). Scaling both dimensions to a
    * common width first is what production z-order writers do (Delta
    * uses per-column range ids); min-max scaling is the one-aggregate
    * version, adequate for roughly uniform keys. */
  private def quantize16(c: Column, lo: Long, hi: Long): Column =
    if (hi <= lo) lit(0L)
    // decimal intermediate: (c − lo) * 65535 as a Long would silently
    // overflow once the column domain spans more than ~2⁴⁷
    else ((c.cast("long") - lo).cast("decimal(38,0)") * 65535L / (hi - lo))
      .cast("long")

  /** Rewrite `df` into `nFiles` parquet files z-ordered on (a, b): one
    * tiny min-max aggregate, then ONE range-partitioned shuffle on the
    * Morton code of the 16-bit-quantized keys (plus the partitioner's
    * sampling pass), then per-file sort — each output file covers a
    * compact rectangle of the (a, b) domain. */
  def zorderWrite(df: DataFrame, a: String, b: String, outDir: String,
      nFiles: Int): Unit = {
    val r = df.agg(min(col(a)).cast("long"), max(col(a)).cast("long"),
      min(col(b)).cast("long"), max(col(b)).cast("long")).head()
    if (r.isNullAt(0) || r.isNullAt(2)) {
      // empty input: min/max aggregate to NULL — write the (empty) frame
      // directly rather than NPE on getLong
      df.write.mode("overwrite").parquet(outDir)
      return
    }
    val z = zvalue(quantize16(col(a), r.getLong(0), r.getLong(1)),
      quantize16(col(b), r.getLong(2), r.getLong(3)))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }
}
