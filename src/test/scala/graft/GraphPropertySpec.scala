package graft

import org.apache.spark.sql.functions._

/** Random-graph property tests: the distributed graph operators vs
  * in-core reference implementations that replicate the SAME
  * deterministic arithmetic (quantized contributions, exact BIGINT
  * votes, total-order tie-breaks). The fixed differentials
  * (GraphFixpointSpec) pin loop-form equivalences on one graph shape;
  * these catch structure-dependent bugs — stars, near-cliques, pendant
  * chains, whatever the seeds produce — by comparing EXACT results, not
  * tolerances, across many shapes. Kept at n ≤ 24 nodes so each case is
  * sub-second; the reference implementations are deliberately naive
  * (recompute-from-scratch rounds) so their correctness is readable.
  */
class GraphPropertySpec extends SparkSpec {
  import graft.operators.Graph

  /** Random undirected simple graph on 0..n-1, each node degree ≥ 2 via
    * a ring backbone; edges each-once as (lo, hi). */
  private def randomGraph(n: Int, p: Double, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val base = for {
      i <- 0 until n; j <- i + 1 until n
      if rnd.nextDouble() < p
    } yield (i.toLong, j.toLong)
    val ring = (0 until n).map(i =>
      if (i + 1 < n) (i.toLong, (i + 1).toLong) else (0L, i.toLong))
    (base ++ ring).distinct
  }

  /** Spark's round-to-integer on a double (RoundBase: BigDecimal
    * HALF_UP), as a Long — the reference must quantize identically. */
  private def q12(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble.toLong

  test("pagerank: bounded ranks equal the in-core quantized reference on random graphs") {
    import spark.implicits._
    for (seed <- Seq(11L, 12L, 13L)) {
      val n = 20
      val und = randomGraph(n, 0.15, seed)
      val dir = und ++ und.map(_.swap)
      val e = dir.toDF("src", "dst")
      val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
        .localCheckpoint(true)
      val got = Graph.pagerankRanksOn(e.localCheckpoint(true), deg, n, 5)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

      val outdeg = dir.groupBy(_._1).map { case (k, es) => k -> es.size }
      var pr = (0 until n).map(i => i.toLong -> 1.0 / n).toMap
      for (_ <- 1 to 5) {
        val contrib = scala.collection.mutable.Map[Long, Long]()
          .withDefaultValue(0L)
        dir.foreach { case (s, d) =>
          contrib(d) += q12(pr(s) / outdeg(s) * 1000000000000L)
        }
        pr = pr.keys.map(k =>
          k -> (0.15 / n + 0.85 * (contrib(k) / 1000000000000.0))).toMap
      }
      withClue(s"seed=$seed: ") {
        got.keySet shouldBe pr.keySet
        // exact: both sides run the identical IEEE expression tree over
        // identical exact integer sums
        got.foreach { case (node, v) => v shouldBe pr(node) }
      }
    }
  }

  test("k-core fixpoint equals the naive simultaneous-peel reference on random graphs") {
    import spark.implicits._
    for (seed <- Seq(21L, 22L, 23L); k <- Seq(2, 3)) {
      val und = randomGraph(24, 0.12, seed)
      val (coreDf, _) =
        Graph.kCoreFixpoint(und.toDF("s", "t").localCheckpoint(true), k)
      val got = coreDf.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

      var active = und.flatMap(e => Seq(e._1, e._2)).toSet
      def degrees = {
        val sub = und.filter(e => active(e._1) && active(e._2))
        sub.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
          .map { case (n, xs) => n -> xs.size.toLong }
      }
      var stable = false
      while (!stable) {
        val d = degrees
        val drop = active.filter(n => d.getOrElse(n, 0L) < k)
        if (drop.isEmpty) stable = true else active --= drop
      }
      withClue(s"seed=$seed k=$k: ") { got shouldBe degrees }
    }
  }

  test("multi-source BFS hops equal the in-core BFS reference on random graphs") {
    import spark.implicits._
    for (seed <- Seq(31L, 32L)) {
      val und = randomGraph(24, 0.1, seed)
      val sym = und ++ und.map(_.swap)
      val seeds = Seq(0L, 7L)
      val rounds = 4
      val got = Graph.bfsHops(sym.toDF("s", "t").localCheckpoint(true),
          seeds.toDF("n"), rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      val adj = sym.groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
      var dist = seeds.map(_ -> 0L).toMap
      for (_ <- 1 to rounds) {
        val relaxed = dist.toSeq.flatMap { case (u, du) =>
          adj.getOrElse(u, Nil).map(_ -> (du + 1))
        }
        dist = (dist.toSeq ++ relaxed).groupBy(_._1)
          .map { case (n, ds) => n -> ds.map(_._2).min }
      }
      withClue(s"seed=$seed: ") { got shouldBe dist }
    }
  }

  test("star-contraction connected components equal the union-find reference on random graphs") {
    // round-10 verdict optional ask: the dedup CC operator was pinned on
    // fixed shapes + the declared oracle only; here it must produce
    // comp = min node id of the component on arbitrary random structure,
    // exactly what a textbook union-find says.
    import spark.implicits._
    for (seed <- Seq(51L, 52L, 53L)) {
      // sparser than the ring-backed generator so the graph actually has
      // MULTIPLE components (the ring would glue everything together):
      // random pairs over a 30-node id space, no connectivity floor
      val rnd = new scala.util.Random(seed)
      val pairs = (for {
        i <- 0 until 30; j <- i + 1 until 30
        if rnd.nextDouble() < 0.04
      } yield (i.toLong, j.toLong)) :+ ((rnd.nextInt(30).toLong, 30L))
      val got = graft.operators.Dedup.connectedComponents(
          pairs.toDF("a", "b").localCheckpoint(true))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // union-find with path compression; label = component minimum
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(n => n -> find(n)).toMap
      withClue(s"seed=$seed: ") {
        got shouldBe expected
        // sanity: the generator really produced a multi-component graph
        expected.values.toSet.size should be > 1
      }
    }
  }

  test("modularity terms equal the in-core per-community reference on random weighted graphs") {
    // round-10 verdict optional ask: modularityTerms was pinned on the
    // declared oracle's one corpus shape only. Reference: per community
    // c over the symmetrized weighted graph,
    //   q_term(c) = w_in(c)/W − (s_deg(c)/W)²
    // with every sum an exact BIGINT and the IEEE ops replayed
    // identically (valueOf-based HALF_UP round, zero-sign normalized —
    // the Q.roundz discipline).
    import spark.implicits._
    for (seed <- Seq(61L, 62L)) {
      val rnd = new scala.util.Random(seed)
      val und = randomGraph(18, 0.18, seed).map { case (s, t) =>
        (s, t, (rnd.nextInt(4) + 1).toLong)
      }
      val sym = und ++ und.map { case (s, t, w) => (t, s, w) }
      val nodes = sym.map(_._1).distinct
      val lbl = nodes.map(n => n -> (n % 3)) // arbitrary fixed communities
      val got = Graph.modularityTerms(
          sym.toDF("s", "t", "w").localCheckpoint(true),
          lbl.toDF("n", "lbl").localCheckpoint(true))
        .collect().map(r => (r.getLong(0),
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

      val wdeg = sym.groupBy(_._1).map { case (n, es) => n -> es.map(_._3).sum }
      val bigW = sym.map(_._3).sum.toDouble
      val expected = lbl.groupBy(_._2).map { case (c, members) =>
        val ms = members.map(_._1).toSet
        val wIn = sym.filter(e => ms(e._1) && ms(e._2) &&
          lbl.toMap.apply(e._1) == lbl.toMap.apply(e._2)).map(_._3).sum
        val sDeg = ms.toSeq.map(wdeg).sum
        val raw = wIn / bigW - (sDeg / bigW) * (sDeg / bigW)
        val q = java.math.BigDecimal.valueOf(raw)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0
        c -> ((ms.size.toLong, wIn, sDeg, q))
      }
      withClue(s"seed=$seed: ") { got shouldBe expected }
    }
  }

  test("weighted LPA labels equal the in-core argmax reference on random graphs") {
    import spark.implicits._
    for (seed <- Seq(41L, 42L)) {
      val rnd = new scala.util.Random(seed)
      val und = randomGraph(20, 0.15, seed).map { case (s, t) =>
        (s, t, (rnd.nextInt(3) + 1).toLong)
      }
      val sym = und ++ und.map { case (s, t, w) => (t, s, w) }
      val maxRounds = 16
      val (lblDf, roundsRun) = Graph.labelPropagationFixpoint(
        sym.toDF("s", "t", "w").localCheckpoint(true), maxRounds)
      val got = lblDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      val nbrs = sym.groupBy(_._1)
        .map { case (k, es) => k -> es.map(e => (e._2, e._3)) }
      var lbl = nbrs.keys.map(n => n -> n).toMap
      var r = 0
      var converged = false
      while (r < maxRounds && !converged) {
        val next = nbrs.map { case (n, es) =>
          val votes = es.groupBy(e => lbl(e._1))
            .map { case (l, xs) => l -> xs.map(_._2).sum }
          // max total weight, ties toward the SMALLEST label — the
          // max(struct(v, -lbl)) total order
          n -> votes.toSeq.maxBy { case (l, v) => (v, -l) }._1
        }
        r += 1
        if (next == lbl) converged = true
        lbl = next
      }
      withClue(s"seed=$seed: ") {
        got shouldBe lbl
        roundsRun shouldBe r
      }
    }
  }
}
