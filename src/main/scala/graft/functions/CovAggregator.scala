package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass second-moment matrix over QUANTIZED (integer-valued long)
  * feature vectors, augmented with a leading 1: the buffer holds the
  * upper triangle of Σ aᵀa for a = (1, x₁ … x_k), so a single aggregate
  * yields the row count (S₀₀), the per-dimension sums (S₀q) and every
  * cross moment (S_pq) — the inputs PCA/covariance need — in exact
  * integer arithmetic (order-free addition, reproducible in any engine).
  *
  * This is the covariance analog of [[GramAggregator]] (the physical
  * form Samsara's optimizer picks for self-transpose products,
  * reference: myMahoutApp/src/main/scala/myMahoutApp/
  * LinearRegression.scala:26) with two differences: long accumulation
  * (exactness discipline of ml/Ridge.scala's decimal sums — a long
  * buffer holds |x|≤3·10⁴ quantized products for ~10¹⁰ rows before
  * wraparound, past which the caller shards the aggregate) and a
  * triangular buffer (k ≲ 2000; 8·(k+1)(k+2)/2 bytes).
  *
  * Input rows must already be quantized to integer-valued longs by the
  * caller's SQL `round` projection so the engine-portable rounding
  * convention (half away from zero) is applied by Catalyst, not JVM
  * `math.round` (which rounds half UP — toward +∞ — and disagrees on
  * negative halves).
  */
class CovAggregator(k: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  private val d = k + 1 // augmented width
  private val bufLen = d * (d + 1) / 2

  /** Index of (p,q), p ≤ q, in the row-major upper-triangle layout. */
  @inline private def tri(p: Int, q: Int): Int =
    p * d - p * (p - 1) / 2 + (q - p)

  override def zero: Array[Long] = new Array[Long](bufLen)

  override def reduce(buf: Array[Long], row: Array[Long]): Array[Long] = {
    require(row.length == k,
      s"CovAggregator(k=$k): row of width ${row.length}")
    // p = 0 block: count and linear sums
    buf(0) += 1L
    var q = 0
    while (q < k) { buf(1 + q) += row(q); q += 1 }
    var p = 0
    while (p < k) {
      val vp = row(p)
      if (vp != 0L) {
        val base = tri(p + 1, p + 1)
        var j = p
        while (j < k) { buf(base + (j - p)) += vp * row(j); j += 1 }
      }
      p += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var x = 0
    while (x < a.length) { a(x) += b(x); x += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  /** (n, Σx_p vector, Σx_p·x_q upper triangle as (p,q)→value). */
  def decode(buf: Array[Long]): (Long, Array[Long], (Int, Int) => Long) = {
    val n = buf(0)
    val sums = java.util.Arrays.copyOfRange(buf, 1, 1 + k)
    (n, sums, (p: Int, q: Int) => buf(tri(p + 1, q + 1)))
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
