package graft.ml

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** k-means‖ (Bahmani et al., VLDB 2012) distributed sketch, re-expressing
  * the reference's `dSample`/`computePointWeights`/Elkan assignment
  * (mahout-samsara-book: myMahoutApp/src/main/scala/myMahoutApp/
  * BahmaniSketch.scala:37-99, 102-156, 159-174) over a typed Dataset of
  * (id, vec) points.
  *
  * Loop shape (ref BahmaniSketch.scala:53-96): seed one center; each
  * iteration computes φ = Σ d²(x, C), resamples points with probability
  * l·d²/φ, and appends them to the sketch. Spark-native choices:
  *
  *  - centers ride in a task broadcast (ref `drmBroadcast`,
  *    BahmaniSketch.scala:104) — the sketch is O(l·iters), always tiny;
  *  - per-point state (d² to current sketch) is recomputed against ONLY
  *    the newly added centers each round (`min(dsq_old, d²_new)`), the
  *    same incremental trick the reference's loop relies on; the point set
  *    is persisted per iteration and the previous lineage truncated (ref
  *    `checkpoint()`, BahmaniSketch.scala:46,51,94);
  *  - sampling is deterministic: splitmix64(id ⊕ iter·seed) → U(0,1)
  *    (ref per-partition `new Random(subseed·keys(0).hashCode)`,
  *    BahmaniSketch.scala:70-77 — same structure, portable);
  *  - the assignment kernel keeps the reference's Elkan lemma-1 pruning:
  *    skip center c when (‖c‖−‖x‖)² > minDsq (BahmaniSketch.scala:128-141).
  *
  * Scale: every pass is one narrow map over the points (no shuffle at
  * all — d² and sampling are per-row against broadcast centers); only the
  * final weight histogram aggregates, keyed by center index, k·l·iters
  * groups. Exactly the shape that survives 100 TB.
  */
object Bahmani {

  final case class Point(id: Long, vec: Array[Double])
  final case class Scored(id: Long, vec: Array[Double], dsq: Double)

  private def sq(x: Double) = x * x

  private[graft] def distSq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += sq(a(i) - b(i)); i += 1 }
    s
  }

  /** Deterministic U(0,1) from (id, iter, seed) — splitmix64 finalizer. */
  private[graft] def unif(id: Long, iter: Int, seed: Long): Double = {
    var z = id ^ (iter * 0x9e3779b97f4a7c15L) ^ seed
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble
  }

  /** Precomputed center metadata for the Elkan-pruned assignment: norms
    * for the lemma-1 bound plus the quarter squared center-center
    * distance matrix for the triangle-inequality bound (ref
    * `mxCDsq = dist(mxC)/4`, BahmaniSketch.scala:122). O(k²d) once on the
    * driver, broadcast with the centers — never recomputed per point. */
  final case class CenterIndex(centers: Array[Array[Double]],
      norms: Array[Double], cdSqQuarter: Array[Array[Double]]) {
    def k: Int = centers.length
  }

  def centerIndex(centers: Array[Array[Double]]): CenterIndex = {
    val norms = centers.map(c => math.sqrt(c.map(sq).sum))
    val cd = Array.tabulate(centers.length, centers.length)((a, b) =>
      distSq(centers(a), centers(b)) / 4.0)
    CenterIndex(centers, norms, cd)
  }

  /** Elkan-pruned nearest-center search (ref BahmaniSketch.scala:112-150):
    * returns (index, d², #distances evaluated). Two exact skip bounds:
    *  - lemma 1: (‖c‖−‖x‖)² > minDsq ⇒ d²(x,c) > minDsq;
    *  - center-center (ref BahmaniSketch.scala:122,128-141): if
    *    d(best,c)/2 ≥ d(x,best), the triangle inequality gives
    *    d(x,c) ≥ d(x,best), so c can never strictly win — i.e. skip when
    *    cdSqQuarter(best)(c) ≥ minDsq.
    * Both bounds only suppress candidates that cannot be strictly closer,
    * so assignments are identical to brute force (ties keep the lowest
    * index either way). */
  private[graft] def nearestCounted(x: Array[Double], idx: CenterIndex)
      : (Int, Double, Int) = {
    val centers = idx.centers
    val xNorm = math.sqrt(x.map(sq).sum)
    var best = 0
    var bestD = distSq(x, centers(0))
    var evals = 1
    var c = 1
    while (c < centers.length) {
      if (sq(idx.norms(c) - xNorm) <= bestD && // Elkan lemma-1 skip
        idx.cdSqQuarter(best)(c) < bestD) { // center-center skip
        val d = distSq(x, centers(c))
        evals += 1
        if (d < bestD) { bestD = d; best = c }
      }
      c += 1
    }
    (best, bestD, evals)
  }

  private[graft] def nearest(x: Array[Double], idx: CenterIndex)
      : (Int, Double) = {
    val (b, d, _) = nearestCounted(x, idx)
    (b, d)
  }

  /** Norm-bound-only variant kept for call sites that already hold plain
    * (centers, norms); prefer the [[CenterIndex]] overload. */
  private[graft] def nearest(x: Array[Double], centers: Array[Array[Double]],
      cNorms: Array[Double]): (Int, Double) = {
    var best = 0
    var bestD = distSq(x, centers(0))
    val xNorm = math.sqrt(x.map(sq).sum)
    var c = 1
    while (c < centers.length) {
      if (sq(cNorms(c) - xNorm) <= bestD) {
        val d = distSq(x, centers(c))
        if (d < bestD) { bestD = d; best = c }
      }
      c += 1
    }
    (best, bestD)
  }

  /** The k-means‖ sketch: returns (sketch centers, their normalized
    * weights). `l` is the oversampling factor (expected new centers per
    * iteration). */
  def sketch(points: Dataset[Point], l: Double, iterations: Int,
      seed: Long = 42L): (Array[Array[Double]], Array[Double]) = {
    import points.sparkSession.implicits._
    val sc = points.sparkSession.sparkContext

    // Seed center: deterministic "random" pick — max splitmix rank.
    val seedPt = points.map(p => (unif(p.id, -1, seed), p.vec))
      .reduce((a, b) => if (a._1 >= b._1) a else b)._2
    var sketch = Vector[Array[Double]](seedPt)

    // Per-point d² to the current sketch, maintained incrementally.
    var scored: Dataset[Scored] = {
      val bc = sc.broadcast(seedPt)
      points.map(p => Scored(p.id, p.vec, distSq(p.vec, bc.value)))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    scored.count()

    for (iter <- 0 until iterations) {
      val phi = scored.agg(sum($"dsq")).as[Double].head()
      val lOverPhi = l / phi
      val newCenters = scored
        .filter(p => unif(p.id, iter, seed) < lOverPhi * p.dsq)
        .collect().map(_.vec)
      if (newCenters.nonEmpty) {
        sketch = sketch ++ newCenters
        val bc = sc.broadcast(newCenters)
        val prev = scored
        scored = prev.map { p =>
          var d = p.dsq
          for (c <- bc.value) d = math.min(d, distSq(p.vec, c))
          Scored(p.id, p.vec, d)
        }.persist(StorageLevel.MEMORY_AND_DISK)
        scored.count()
        prev.unpersist()
      }
    }

    // Point weights (ref computePointWeights, BahmaniSketch.scala:159-174):
    // histogram of nearest-sketch-center assignment, normalized.
    val centers = sketch.toArray
    val bc = sc.broadcast(centerIndex(centers))
    // histogram over the PERSISTED scored set (same ids/vecs as points)
    // — mapping over `points` would re-scan and re-decode the whole
    // corpus while the vectors already sit in cache
    val counts = scored
      .map(p => nearest(p.vec, bc.value)._1)
      .groupByKey(identity).count().collect().toMap
    val total = counts.values.sum.toDouble
    scored.unpersist()
    (centers, centers.indices.map(i =>
      counts.getOrElse(i, 0L) / total).toArray)
  }

  /** Driver-side weighted Lloyd on the sketch (the small final step that
    * turns the sketch into k centers — in-core, like the reference's
    * downstream use of the sketch). Deterministic k-means++-style seeding
    * by weight rank. */
  def lloydOnSketch(sketch: Array[Array[Double]], weights: Array[Double],
      k: Int, iters: Int = 20): Array[Array[Double]] = {
    require(sketch.nonEmpty, "lloydOnSketch: empty sketch")
    // A sketch smaller than k cannot seed k distinct centers — clamp
    // rather than index out of bounds; callers see centers.length ≤ k
    // (e.g. q_ann_ivf simply gets fewer cells).
    val kEff = math.min(k, sketch.length)
    val dim = sketch.head.length
    var centers = sketch.zip(weights).sortBy(-_._2).take(kEff).map(_._1)
    for (_ <- 0 until iters) {
      val idx = centerIndex(centers)
      val sums = Array.fill(kEff)(new Array[Double](dim))
      val wsum = new Array[Double](kEff)
      for ((p, w) <- sketch.zip(weights)) {
        val (c, _) = nearest(p, idx)
        var i = 0
        while (i < dim) { sums(c)(i) += w * p(i); i += 1 }
        wsum(c) += w
      }
      centers = Array.tabulate(kEff)(c =>
        if (wsum(c) > 0) sums(c).map(_ / wsum(c)) else centers(c))
    }
    centers
  }

  /** Distributed clustering cost φ(C) = Σ min_c d²(x, c) — the quality
    * metric both the differential test and a production fit monitor use. */
  def cost(points: Dataset[Point], centers: Array[Array[Double]]): Double = {
    import points.sparkSession.implicits._
    val bc = points.sparkSession.sparkContext.broadcast(centerIndex(centers))
    points.map(p => nearest(p.vec, bc.value)._2)
      .agg(sum("value")).as[Double].head()
  }

  /** Points view over the embeddings table. */
  def embeddingPoints(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Dataset[Point] = {
    import spark.implicits._
    graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        graft.functions.TextFns.toDoubleArray(col("embedding")).as("vec"))
      .as[(Long, Array[Double])]
      .map { case (id, v) => Point(id, v) }
  }
}
