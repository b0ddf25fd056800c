package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared engine-portable sketch primitives (HyperLogLog register logic),
  * used by the batch corpus sketch (`q_hll_registers`), the windowed event
  * sketch (`q_event_hll`), and its streaming twin
  * ([[graft.streaming.EventStreams.windowedDistinctSketch]]). Both the
  * Column and the SQL form of every primitive are generated from the same
  * constants so Spark and the DuckDB oracle agree bit-for-bit.
  *
  * Hash: top 15 hex digits of md5 → a 60-bit non-negative BIGINT (md5 is
  * identical in both engines; 60 bits keeps all downstream arithmetic
  * inside BIGINT under ANSI overflow checking). Registers: p = 6 top bits
  * pick one of m = 64 registers; ρ = 1 + leading-zeros of the remaining
  * 54 bits, computed by a generated 54-way integer threshold CASE — no
  * float log2, whose rounding at power-of-two boundaries differs across
  * engines.
  */
object Sketches {

  /** Register-index bits / register count of the HLL sketch. */
  val HllP = 6
  val HllM: Int = 1 << HllP // 64

  private val RemBits = 60 - HllP // 54
  val RemMask: Long = (1L << RemBits) - 1

  /** 60-bit engine-portable hash of a string column. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** SQL form of [[hash60]]; `%s` is the string expression. */
  val hash60Sql = "CAST('0x' || substr(md5(%s), 1, 15) AS BIGINT)"

  /** Register index: the hash's top p bits. */
  def bucket(h: Column): Column = shiftright(h, RemBits)

  def bucketSql(h: String): String = s"$h >> $RemBits"

  /** ρ(rem) = 1 + leading zeros of the 54-bit remainder (55 when zero) —
    * a descending threshold ladder, exact integer logic. */
  def rho(rem: Column): Column =
    (2 to RemBits).foldLeft(when(rem >= (1L << (RemBits - 1)), 1)) {
      (acc, r) => acc.when(rem >= (1L << (RemBits - r)), r)
    }.otherwise(RemBits + 1)

  def rhoSql(rem: String): String =
    (1 to RemBits).map(r =>
      s"WHEN $rem >= ${1L << (RemBits - r)} THEN $r").mkString(
      "CASE ", " ", s" ELSE ${RemBits + 1} END")

  /** Carter–Wegman bucket family for the count-min rows, over the
    * Mersenne prime P = 2³¹−1: row i maps h → ((h mod P)·aᵢ + bᵢ) mod P
    * mod w. Products stay < 2⁶³ (h mod P < 2³¹, aᵢ < 2³¹). Same
    * derivation as the minhash family (one base hash, cheap affine
    * mixes) so d rows cost ONE md5 per key. */
  val CmP = 2147483647L
  def cmA(i: Int): Long = (2654435761L * (2L * i + 1)) % CmP
  def cmB(i: Int): Long = (40503L * (i + 7L)) % CmP

  def cmBucket(h: Column, i: Int, w: Int): Column =
    ((h % CmP) * cmA(i) + cmB(i)) % CmP % w

  def cmBucketSql(h: String, i: Int, w: Int): String =
    s"(($h % $CmP) * ${cmA(i)} + ${cmB(i)}) % $CmP % $w"

  /** Bloom filter geometry: m = 2¹⁶ bit positions stored as 2048
    * 32-bit words inside BIGINTs — bit values stay ≤ 2³¹, so every
    * engine's shift/OR runs in positive BIGINT range with no sign or
    * overflow divergence — and k = 4 probes from the same
    * Carter–Wegman family as the count-min rows (one md5 per key, k
    * cheap affine mixes). At n = 10⁵ digests the fill is
    * 1−e^(−kn/m) ≈ 0.998… so m scales with corpus: these constants
    * are the bench-scale operating point (n ≈ 10³–10⁴ → FP ≈ 0.5–5%);
    * production picks m ≈ 10·n_old bits and the dataflow is unchanged
    * (the sketch stays ≤ m/8 bytes, broadcastable at any m that fits
    * an executor). */
  val BloomBits: Int = 1 << 16
  val BloomWords: Int = BloomBits >> 5 // 2048 x 32-bit words
  val BloomK = 4

  /** Bit position of probe `i` for 60-bit hash column `h`. */
  def bloomPos(h: Column, i: Int): Column = cmBucket(h, i, BloomBits)

  def bloomPosSql(h: String, i: Int): String = cmBucketSql(h, i, BloomBits)
}
