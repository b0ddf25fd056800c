package graft.ml

/** Engine-exact top-2 PCA components via quantized matrix squaring — the
  * driver-side half of `q_embed_pca`'s oracle (the other half is the
  * generated DuckDB SQL in PipelineQueries, which executes THE SAME
  * dataflow CTE-by-CTE).
  *
  * Why not Breeze (the previous form): an eigensolver's output is not
  * reproducible across engines, so `q_embed_pca` was rows-only checked.
  * This replaces it with a deterministic dataflow both engines can run
  * bit-identically — the q_pagerank discipline (quantize every
  * floating-point intermediate to BIGINT so sums are order-free integer
  * additions; the remaining scalar ops are identical IEEE arithmetic on
  * exact inputs) applied to an eigensolver:
  *
  *   1. C = n·Σxxᵀ − (Σx)(Σx)ᵀ from exact integer moments (CovAggregator);
  *   2. nine quantized matrix squarings → A ≈ C⁵¹² (each stage rescaled
  *      to max-abs 10¹², entries exact BIGINTs; the power sharpens the
  *      spectrum so (λ₂/λ₁)⁵¹² ≲ 10⁻³ — plain power iteration would need
  *      ~500 unrolled stages at this corpus's λ₂/λ₁ ≈ 0.987);
  *   3. v₁ = A·1, one refining A·v pass, quantized to max-abs 10⁶;
  *   4. Rayleigh-deflate the UNSQUARED C by v₁ (see [[components]] for
  *      why the order matters), square the deflated matrix nine times,
  *      extract v₂ the same way, one explicit orthogonalization
  *      against v₁.
  *
  * Every ROUND is half-away-from-zero on a double < 2⁵¹ (where
  * `floor(|x|+0.5)` is exact and matches both DuckDB's std::round and
  * Spark's BigDecimal HALF_UP round). All quantized magnitudes are bounded
  * well inside BIGINT (largest: the Rayleigh numerator, ≤ 4096·10¹²).
  *
  * Accuracy (measured against an exact eigensolver at sf0.001/0.01/0.1):
  * |cos(v_k, u_k)| = 1.000000000 for BOTH components, and the projection
  * variances reproduce the eigenvalues to 6 decimals — the components
  * are DEFINED by this dataflow, and the definition coincides with true
  * PCA to measurement precision (pinned in PipelineOpsSpec's eigenvalue
  * differential).
  */
object QuantPca {

  /** Half-away-from-zero to Long — exact for |x| < 2⁵¹ (0.5 is a multiple
    * of ulp there, so the addition is exact). */
  private[ml] def rnd(x: Double): Long =
    (math.signum(x) * math.floor(math.abs(x) + 0.5)).toLong

  private def qscaleM(m: Array[Array[Long]], target: Double): Array[Array[Long]] = {
    val mx = m.iterator.flatMap(_.iterator).map(math.abs).max.toDouble
    m.map(_.map(v => rnd(v.toDouble / mx * target)))
  }

  private def qscaleV(v: Array[Long], target: Double): Array[Long] = {
    val mx = v.iterator.map(math.abs).max.toDouble
    v.map(x => rnd(x.toDouble / mx * target))
  }

  /** P_pj = Σ_t round(A_pt·A_tj / 10¹²) — the SQL squaring CTE's exact twin
    * (same multiply/divide expression tree, integer sum). */
  private def qsquare(a: Array[Array[Long]]): Array[Array[Long]] = {
    val k = a.length
    Array.tabulate(k, k) { (p, j) =>
      var s = 0L
      var t = 0
      while (t < k) {
        s += rnd(a(p)(t).toDouble * a(t)(j).toDouble / 1e12)
        t += 1
      }
      s
    }
  }

  /** w_j = Σ_p round(A_pj·v_p / 10¹²). */
  private def qmatvec(a: Array[Array[Long]], v: Array[Long]): Array[Long] = {
    val k = a.length
    Array.tabulate(k) { j =>
      var s = 0L
      var p = 0
      while (p < k) {
        s += rnd(a(p)(j).toDouble * v(p).toDouble / 1e12)
        p += 1
      }
      s
    }
  }

  /** Top-2 quantized components of the exact integer matrix `cq`:
    * (v1, |v1|², v2, |v2|²), each v max-abs-normalized to 10⁶.
    *
    * Deflation happens on the UNSQUARED a0, and the deflated matrix is
    * then squared on its own: deflating the squared A would find nothing
    * — after nine squarings (λ₂/λ₁)⁵¹² can sit below the 10⁻¹²
    * quantization floor (measured 2.4·10⁻¹⁶ at the sf0.001 corpus), so
    * A⁵¹² minus its rank-1 top is pure rounding noise. Deflating a0
    * leaves a λ₁-residual of only λ₁·O(10⁻⁶) (v₁'s own quantization),
    * which the subsequent squarings crush relative to λ₂. */
  def components(cq: Array[Array[Long]])
      : (Array[Long], Long, Array[Long], Long) = {
    val k = cq.length
    val a0 = qscaleM(cq, 1e12)
    var a = a0
    for (_ <- 1 to 9) a = qscaleM(qsquare(a), 1e12)
    val ones = Array.fill(k)(1000000L)
    val v0 = qscaleV(qmatvec(a, ones), 1e6)
    val v1 = qscaleV(qmatvec(a, v0), 1e6)
    val d1 = v1.map(x => x * x).sum
    // Rayleigh deflation of a0: B₀ = A₀ − (v₁ᵀA₀v₁/(v₁ᵀv₁)²)·v₁v₁ᵀ
    var r = 0L
    for (p <- 0 until k; j <- 0 until k)
      r += rnd(v1(p).toDouble * a0(p)(j).toDouble * v1(j).toDouble / 1e12)
    val coef = r.toDouble * 1e12 / d1.toDouble / d1.toDouble
    var b = qscaleM(Array.tabulate(k, k) { (p, j) =>
      rnd(a0(p)(j).toDouble - coef * v1(p).toDouble * v1(j).toDouble)
    }, 1e12)
    for (_ <- 1 to 9) b = qscaleM(qsquare(b), 1e12)
    val u0 = qscaleV(qmatvec(b, ones), 1e6)
    val u1 = qscaleV(qmatvec(b, u0), 1e6)
    // one explicit Gram–Schmidt pass against v₁ (cleans the ≤10⁻³
    // deflation leak from v₁'s own quantization)
    var dq = 0L
    for (j <- 0 until k) dq += rnd(u1(j).toDouble * v1(j).toDouble / 100.0)
    val orth = Array.tabulate(k) { j =>
      u1(j) - rnd(dq.toDouble * 100.0 / d1.toDouble * v1(j).toDouble)
    }
    val v2 = qscaleV(orth, 1e6)
    val d2 = v2.map(x => x * x).sum
    (v1, d1, v2, d2)
  }

  /** Projection offset Σ_j round((s_j/n)·v_j / 100) — the mean's dot with
    * the quantized component, in the same 10⁻² units as the per-row
    * projection sums. */
  def offset(sums: Array[Long], n: Long, v: Array[Long]): Long = {
    var o = 0L
    for (j <- sums.indices)
      o += rnd(sums(j).toDouble / n.toDouble * v(j).toDouble / 100.0)
    o
  }
}
