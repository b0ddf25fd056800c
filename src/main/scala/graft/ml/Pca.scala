package graft.ml

import breeze.linalg.{eigSym, DenseMatrix, DenseVector}

/** Driver-side finale of distributed PCA: eigendecomposition of the
  * k×k covariance assembled by [[graft.functions.CovAggregator]] — the
  * Samsara dspca shape (distributed wide pass → in-core k×k solve, the
  * same S2/A18 collect-to-driver pattern as [[Ridge]]'s normal-equation
  * solve; reference: myMahoutApp/src/main/scala/myMahoutApp/
  * LinearRegression.scala:28-31's in-core `solve` finale).
  *
  * Determinism: `eigSym` is deterministic on an exact input, but each
  * eigenvector's SIGN is arbitrary — fixed here by the convention that
  * the coordinate of largest |value| (lowest index on ties) is
  * positive, so declared query output is reproducible run-to-run.
  */
object Pca {

  /** Top-`nc` principal components of the covariance matrix, by
    * descending eigenvalue. Returns (eigenvalues, components) — each
    * component a unit-norm array of length k. */
  def topComponents(cov: Array[Array[Double]], nc: Int)
      : (Array[Double], Array[Array[Double]]) = {
    val k = cov.length
    val m = DenseMatrix.tabulate(k, k)((i, j) => cov(i)(j))
    val es = eigSym(m)
    // breeze returns eigenvalues ascending; take the top nc descending
    val order = es.eigenvalues.toArray.zipWithIndex.sortBy(-_._1).take(nc)
    val vals = order.map(_._1)
    val vecs = order.map { case (_, idx) =>
      val v: DenseVector[Double] = es.eigenvectors(::, idx).copy
      val arr = v.toArray
      val pivot = arr.indices.maxBy(i => (math.abs(arr(i)), -i))
      if (arr(pivot) < 0) arr.map(x => -x) else arr
    }
    (vals, vecs)
  }
}
