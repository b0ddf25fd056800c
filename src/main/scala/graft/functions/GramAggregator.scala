package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass Gram matrix Xᵀ X as a typed Aggregator: each input row is a
  * dense feature vector; the buffer is the k×k sum of per-row outer
  * products.
  *
  * This is the physical form Samsara's optimizer picks for the
  * self-transpose product (reference: `drmXB.t %*% drmXB`,
  * myMahoutApp/src/main/scala/myMahoutApp/LinearRegression.scala:26 — fused
  * AtA, never materializing Xᵀ). Against the relational self-join
  * formulation ([[graft.operators.Coo.gram]]) this trades the n·k² joined
  * cells shuffle for a single map-side pass with a k²-double buffer merged
  * tree-wise — the right shape for tall-skinny (n ≫ k) matrices at 100 TB.
  * Holds k ≲ 2000 (buffer = 8·k² bytes); beyond that use
  * [[graft.operators.BlockGram.gramBlocked]], whose buffers are bounded by
  * the tile size independent of k.
  *
  * Addition order differs from the sequential sum only in partition
  * grouping; with quantized integer-valued inputs (the determinism
  * discipline) the result is bit-exact regardless.
  */
class GramAggregator(k: Int)
    extends Aggregator[Array[Double], Array[Double], Array[Double]] {

  override def zero: Array[Double] = new Array[Double](k * k)

  override def reduce(buf: Array[Double], row: Array[Double]): Array[Double] = {
    require(row.length == k,
      s"GramAggregator(k=$k): row of width ${row.length} — a wider row " +
        "would silently drop features from the Gram, a narrower one AIOOBE")
    var p = 0
    while (p < k) {
      val vp = row(p)
      if (vp != 0.0) {
        var q = 0
        while (q < k) {
          buf(p * k + q) += vp * row(q)
          q += 1
        }
      }
      p += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var x = 0
    while (x < a.length) { a(x) += b(x); x += 1 }
    a
  }

  override def finish(buf: Array[Double]): Array[Double] = buf

  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()

  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
