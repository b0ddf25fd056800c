package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-tiled Gram XᵀX for WIDE feature spaces — the k > ~2000 fallback
  * where [[graft.functions.GramAggregator]]'s dense k×k buffer
  * (8·k² bytes per task) stops fitting, and the cell-level self-join
  * ([[Coo.gram]]) pays |cells|²/|rows| joined pairs on the wire.
  *
  * Realizes the intent of the reference's (unimplemented) `BlockMatrix`
  * trait (mahout-samsara-book: myMahoutApp/src/main/scala/myMahoutApp/
  * mthread/BlockMatrix.scala:8-16) in Spark terms: cells are grouped into
  * (rowBlock × tile) sparse blocks, blocks self-join on the ROW block id
  * only, each joined pair multiplies locally into a dense tile×tile
  * partial (a bare merge-walk over li-sorted cells — no per-pair
  * allocation beyond the one output array), and partials tree-reduce per
  * (tileP, tileQ). No buffer anywhere exceeds 8·tile² bytes, independent
  * of k; the only wide exchanges move (a) each cell once to its block,
  * (b) each block once per column-tile pairing (k/tile duplication — the
  * classic block-outer-product tradeoff), and (c) tile-sized partials
  * with map-side combine. Upper-triangle pairs only; the lower triangle
  * is emitted by symmetry.
  *
  * Requires non-negative (i, j). Exact for integer-valued inputs (the
  * determinism discipline): addition order differs from [[Coo.gram]] only
  * in grouping. Emits the sparse result (zero sums dropped) — callers
  * comparing against the self-join form should treat absent cells as 0.
  */
object BlockGram {

  def gramBlocked(x: DataFrame, tile: Int = 1024,
      rowBlock: Int = 1024): DataFrame = {
    val spark = x.sparkSession
    import spark.implicits._
    val t = tile

    // integer DIV, not double `/`: block id and the pmod local offset
    // must derive from the same exact arithmetic (a float quotient can
    // round across an integer boundary for ids beyond ~2^53)
    val cells = x.select(
        expr(s"CAST(i AS BIGINT) DIV $rowBlock").as("bi"),
        expr(s"CAST(j AS BIGINT) DIV $t").as("bj"),
        pmod(col("i"), lit(rowBlock)).cast("int").as("li"),
        pmod(col("j"), lit(t)).cast("int").as("lj"),
        col("v").cast("double").as("v"))
      .as[(Long, Long, Int, Int, Double)]

    // (bi, bj) → li-sorted parallel cell arrays: one exchange of the cells
    val blocks = cells.groupByKey(c => (c._1, c._2))
      .mapGroups { (key: (Long, Long),
          it: Iterator[(Long, Long, Int, Int, Double)]) =>
        val cs = it.toArray.sortBy(c => (c._3, c._4))
        (key._1, key._2, cs.map(_._3), cs.map(_._4), cs.map(_._5))
      }

    val a = blocks.toDF("bi", "p", "ali", "alj", "av")
    val b = blocks.toDF("bi", "q", "bli", "blj", "bv")

    // per row-block, every upper-triangle tile pairing multiplies locally:
    // both sides are li-sorted, so equal-row runs merge-walk in one pass
    val partials = a.join(b, "bi").filter(col("p") <= col("q"))
      .select(col("p"), col("q"), col("ali"), col("alj"), col("av"),
        col("bli"), col("blj"), col("bv"))
      .as[(Long, Long, Array[Int], Array[Int], Array[Double],
        Array[Int], Array[Int], Array[Double])]
      .map { case (p, q, ali, alj, av, bli, blj, bv) =>
        val out = new Array[Double](t * t)
        var ia = 0
        var ib = 0
        while (ia < ali.length && ib < bli.length) {
          val ra = ali(ia)
          val rb = bli(ib)
          if (ra < rb) ia += 1
          else if (rb < ra) ib += 1
          else {
            var ea = ia; while (ea < ali.length && ali(ea) == ra) ea += 1
            var eb = ib; while (eb < bli.length && bli(eb) == ra) eb += 1
            var xx = ia
            while (xx < ea) {
              val base = alj(xx) * t
              val va = av(xx)
              var y = ib
              while (y < eb) { out(base + blj(y)) += va * bv(y); y += 1 }
              xx += 1
            }
            ia = ea; ib = eb
          }
        }
        (p, q, out)
      }

    // tree-reduce tile partials (map-side combine merges 8·t² arrays)
    val tiles = partials.groupByKey(r => (r._1, r._2))
      .reduceGroups { (u, w) =>
        val acc = u._3; val add = w._3
        var i = 0
        while (i < acc.length) { acc(i) += add(i); i += 1 }
        u
      }
      .map { case ((p, q), (_, _, arr)) => (p, q, arr) }

    tiles.flatMap { case (p, q, arr) =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      var idx = 0
      while (idx < arr.length) {
        val v = arr(idx)
        if (v != 0.0) {
          val gp = p * t + idx / t
          val gq = q * t + idx % t
          buf += ((gp, gq, v))
          // diagonal tiles already hold both triangles (the pair join kept
          // p <= q, but within a tile all (lj_a, lj_b) combinations ran)
          if (p != q) buf += ((gq, gp, v))
        }
        idx += 1
      }
      buf
    }.toDF("i", "j", "v")
  }
}
