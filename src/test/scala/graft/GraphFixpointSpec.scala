package graft

import graft.operators.Graph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-9 verdict asks #1/#2: the fixpoint forms of the iterative graph
  * loops (converge-and-stop, vs the bounded-round declared queries) and
  * the size-dispatched state joins (broadcast under the budget, plain
  * shuffle join beyond — never a driver-OOM hard hint at 10⁸ nodes).
  *
  * The load-bearing property for the declared fixpoint queries
  * (q_kcore_fixpoint, q_bfs_reach) is CAPPED FIXPOINT ≡ BOUNDED FORM on
  * every input: converged early → remaining rounds are identity; not
  * converged → both executed exactly the cap. That equivalence is what
  * lets a data-dependent loop keep an exact unrolled DuckDB oracle, so
  * it is pinned here differentially on synthetic graphs engineered to
  * hit both sides (early convergence AND a binding cap).
  */
class GraphFixpointSpec extends SparkSpec {

  import spark.implicits._

  /** Undirected helper: symmetrize an (s, t) pair list. */
  private def und(pairs: Seq[(Long, Long)]): DataFrame = {
    val d = pairs.toDF("s", "t")
    d.union(d.select($"t", $"s"))
  }

  private def coreMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // K4 clique (all degree 3) + pendant path 4-5-6-7-8: peeling at k = 2
  // eats the path one node per round from the free end — a 4-round
  // cascade, so fixpoint genuinely iterates past the declared queries'
  // bounded budget before the clique alone survives. NOTE: peelKCore
  // takes each undirected edge ONCE (it degree-counts both endpoints),
  // unlike the symmetrized lists the LPA/BFS loops consume.
  private def caterpillar: DataFrame =
    ((for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b)) ++
      Seq((4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L))).toDF("s", "t")

  test("k-core fixpoint: peels the whole pendant path, stops early, equals the bounded form") {
    val (core, rounds) = Graph.kCoreFixpoint(caterpillar, k = 2, maxRounds = 64)
    // the path needs 4 peel rounds (8, then 7, 6, 5); K4 survives at deg 3
    coreMap(core) shouldBe (1L to 4L).map(_ -> 3L).toMap
    rounds shouldBe 4
    // capped-fixpoint == bounded form once converged
    coreMap(Graph.peelKCore(caterpillar, k = 2, rounds = 10)) shouldBe coreMap(core)
  }

  test("k-core fixpoint with a binding cap == the bounded form at the cap") {
    val (capped, rounds) = Graph.kCoreFixpoint(caterpillar, k = 2, maxRounds = 2)
    rounds shouldBe 2
    coreMap(capped) shouldBe coreMap(Graph.peelKCore(caterpillar, k = 2, rounds = 2))
    // and it is genuinely NOT yet the fixpoint: node 6 still alive at deg 1
    coreMap(capped).keySet should contain(6L)
  }

  test("LPA fixpoint converges on bridged triangles and equals the bounded form") {
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L)).map { case (a, b) => (a, b, 3L) }
    val w = (tri :+ ((3L, 10L, 1L))).toDF("s", "t", "w")
    val e = w.union(w.select($"t", $"s", $"w"))
    val (lbl, rounds) = Graph.labelPropagationFixpoint(e, maxRounds = 16)
    coreMap(lbl) shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L)
    // settles in 2 rounds + 1 detection round; well under the cap
    rounds should be < 16
    coreMap(Graph.labelPropagation(e, rounds)) shouldBe coreMap(lbl)
  }

  test("LPA fixpoint cap is load-bearing: a 2-cycle oscillator runs exactly maxRounds") {
    // single edge 1-2: synchronous LPA swaps labels every round, forever
    val e = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("s", "t", "w")
    val (lbl, rounds) = Graph.labelPropagationFixpoint(e, maxRounds = 5)
    rounds shouldBe 5
    // parity of the cap decides the phase; 5 rounds == bounded 5 rounds
    coreMap(lbl) shouldBe coreMap(Graph.labelPropagation(e, 5))
  }

  test("BFS fixpoint reaches the whole path at exact distances and stops early") {
    val path = und((1L to 10L).sliding(2).map(x => (x(0), x(1))).toSeq)
    val seeds = Seq(Tuple1(1L)).toDF("n")
    val (dist, rounds) = Graph.bfsFixpoint(path, seeds, maxRounds = 64)
    coreMap(dist) shouldBe (1L to 10L).map(n => n -> (n - 1)).toMap
    // 9 relaxation rounds + 1 stationarity-detection round
    rounds shouldBe 10
    coreMap(Graph.bfsHops(path, seeds, 12)) shouldBe coreMap(dist)
  }

  test("BFS fixpoint with a binding cap == the bounded form at the cap") {
    val path = und((1L to 10L).sliding(2).map(x => (x(0), x(1))).toSeq)
    val seeds = Seq(Tuple1(1L)).toDF("n")
    val (capped, rounds) = Graph.bfsFixpoint(path, seeds, maxRounds = 3)
    rounds shouldBe 3
    coreMap(capped) shouldBe coreMap(Graph.bfsHops(path, seeds, 3))
    coreMap(capped).keySet shouldBe (1L to 4L).toSet
  }

  /** (e, deg, n) the rank loops consume, built exactly like
    * Graph.edgeFramesBuild from a symmetrized pair list. */
  private def rankFrames(pairs: Seq[(Long, Long)]): (DataFrame, DataFrame, Long) = {
    val e = und(pairs).toDF("src", "dst").localCheckpoint(true)
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    (e, deg, deg.count())
  }

  private def rankMap(df: DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("PageRank fixpoint: uniform rank is stationary on a regular graph — stops after one round") {
    // K4: every node has outdeg 3, so the uniform init is the exact
    // stationary distribution; the quantized L1 delta is 0 after round 1
    val (e, deg, n) = rankFrames(
      for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b))
    val (pr, rounds) = Graph.pagerankFixpoint(e, deg, n, eps = 1e-9,
      maxRounds = 64)
    rounds shouldBe 1
    // capped fixpoint == the bounded form at the round it stopped
    rankMap(pr) shouldBe rankMap(Graph.pagerankRanksOn(e, deg, n, 1))
    rankMap(pr).values.foreach(_ shouldBe 0.25 +- 1e-12)
  }

  test("PageRank fixpoint: ε-probe fires mid-run on an asymmetric graph, == bounded at that round") {
    // K4 + pendant path (the caterpillar): rank keeps sloshing between
    // the clique and the tail, decaying ~0.85^r — the probe must stop
    // the loop strictly between round 1 and the cap
    val (e, deg, n) = rankFrames(
      (for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b)) ++
        Seq((4L, 5L), (5L, 6L)))
    val (pr, rounds) = Graph.pagerankFixpoint(e, deg, n, eps = 5e-3,
      maxRounds = 64)
    rounds should be > 1
    rounds should be < 64
    rankMap(pr) shouldBe rankMap(Graph.pagerankRanksOn(e, deg, n, rounds))
  }

  test("PageRank fixpoint with a binding cap == the bounded form at the cap") {
    val (e, deg, n) = rankFrames(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    // eps = 0 can never fire (the delta is non-negative): the cap binds
    val (pr, rounds) = Graph.pagerankFixpoint(e, deg, n, eps = 0.0,
      maxRounds = 3)
    rounds shouldBe 3
    rankMap(pr) shouldBe rankMap(Graph.pagerankRanksOn(e, deg, n, 3))
  }

  test("PPR fixpoint: stationary seed distribution stops after one round, == bounded") {
    // single edge, both endpoints seeds at reset 1/2: pr stays (.5, .5)
    val (e, deg, n) = rankFrames(Seq((1L, 2L)))
    val reset = when(col("node") <= 2, lit(0.5)).otherwise(lit(0.0))
    val (pr, rounds) = Graph.pprFixpoint(e, deg, n, reset, eps = 1e-9,
      maxRounds = 16)
    rounds shouldBe 1
    rankMap(pr) shouldBe rankMap(Graph.pprRanksOn(e, deg, n, reset, 1))
  }

  test("PPR fixpoint with a binding cap == the bounded form at the cap") {
    val (e, deg, n) = rankFrames(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    val reset = when(col("node") === 1, lit(1.0)).otherwise(lit(0.0))
    val (pr, rounds) = Graph.pprFixpoint(e, deg, n, reset, eps = 0.0,
      maxRounds = 3)
    rounds shouldBe 3
    rankMap(pr) shouldBe rankMap(Graph.pprRanksOn(e, deg, n, reset, 3))
  }

  private def countBhj(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    def walk(p: SparkPlan): Int = p match {
      case _: BroadcastHashJoinExec => 1 + p.children.map(walk).sum
      case _ => p.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("state joins dispatch on estimated size: broadcast under the budget, shuffle join beyond") {
    Graph.withAqeOff(spark) {
      val (e, deg, n) = Graph.edgeFrames(spark, sfDir)
      val pr0 = deg.select(col("src").as("node"), (lit(1.0) / n).as("pr"))
        .localCheckpoint(true)
      val key = "graft.graph.broadcastStateBytes"
      // default budget: both node-width state joins broadcast
      spark.conf.unset(key)
      val hinted = Graph.rankIteration(e, deg, pr0, n)
      countBhj(hinted) shouldBe 2
      // zero budget: the SAME iteration plans plain (shuffle) joins —
      // the |V| ≥ 10⁸ shape where a hard broadcast hint would OOM
      spark.conf.set(key, "0")
      try {
        val plain = Graph.rankIteration(e, deg, pr0, n)
        countBhj(plain) shouldBe 0
        // and the dispatch is plan-only: bit-identical ranks either way
        // (quantized-long contributions are order-free)
        val a = hinted.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val b = plain.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        b shouldBe a
      } finally spark.conf.unset(key)
    }
  }

  test("edge-checkpoint storage level dispatches on source bytes, results unchanged") {
    // round-13: unconditional MEMORY_AND_DISK_SER (the sf100 OOM fix)
    // taxed every gate-scale fixpoint read with deserialization —
    // 15-22% on the r12 driver bench. The dispatch keeps the fast
    // deserialized default below graft.graph.serializedCheckpointBytes
    // of lineitem bytes and the compact spill-friendly SER form above.
    import org.apache.spark.storage.StorageLevel
    val key = "graft.graph.serializedCheckpointBytes"
    spark.conf.unset(key)
    try {
      // sf0.001 lineitem is ~100 KB — far under the 4 GiB default
      Graph.edgeCheckpointLevel(spark, sfDir) shouldBe
        StorageLevel.MEMORY_AND_DISK
      // force the big-data side: everything is past a 0-byte budget
      spark.conf.set(key, "0")
      Graph.edgeCheckpointLevel(spark, sfDir) shouldBe
        StorageLevel.MEMORY_AND_DISK_SER
      // a missing source dir dispatches to SER (survival default for
      // non-local deployments, which should set the conf explicitly)
      spark.conf.unset(key)
      Graph.edgeCheckpointLevel(spark, "/nonexistent") shouldBe
        StorageLevel.MEMORY_AND_DISK_SER
      // storage level is plan-invisible: the same ranks come out of a
      // fresh edge build either way
      def ranks(): Map[Long, Double] = {
        Memo.release(spark); Cleanup(spark)
        Graph.pagerankRanks(spark, sfDir, 3).collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      }
      val fast = ranks()
      spark.conf.set(key, "0")
      ranks() shouldBe fast
    } finally {
      spark.conf.unset(key)
      Memo.release(spark); Cleanup(spark)
    }
  }

  // ---- round-15: the shared bounded-snapshot/fixpoint rank run ----
  // q_pagerank/q_ppr are now the round-`iters` SNAPSHOT of the same run
  // whose terminal state is q_pagerank_fixpoint/q_ppr_fixpoint (the
  // kCoreShared discipline). Load-bearing equivalences: snapshot ≡ the
  // bounded loop at snapAt, terminal ≡ the standalone fixpoint — on
  // inputs where the cap binds AND where the ε-probe fires early
  // (before and after the snapshot round).

  test("shared rank run with a binding cap: snapshot == bounded, terminal == fixpoint") {
    val (e, deg, n) = rankFrames(
      (for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b)) ++
        Seq((4L, 5L), (5L, 6L)))
    val init = deg.select(col("src").as("node"), (lit(1.0) / n).as("pr"))
    // eps = 0 never fires: both snapshot and terminal come off one loop
    val (snap, fix, rounds) = Graph.rankSharedRun(init,
      pr => Graph.rankIteration(e, deg, pr, n), n, eps = 0.0,
      snapAt = 2, maxRounds = 5)
    rounds shouldBe 5
    rankMap(snap) shouldBe rankMap(Graph.pagerankRanksOn(e, deg, n, 2))
    rankMap(fix) shouldBe rankMap(Graph.pagerankRanksOn(e, deg, n, 5))
  }

  test("shared rank run: ε fires BEFORE the snapshot round — fixpoint keeps the early state, snapshot still advances") {
    // K4: uniform rank is stationary, delta = 0 after round 1
    val (e, deg, n) = rankFrames(
      for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b))
    val init = deg.select(col("src").as("node"), (lit(1.0) / n).as("pr"))
    val (snap, fix, rounds) = Graph.rankSharedRun(init,
      pr => Graph.rankIteration(e, deg, pr, n), n, eps = 1e-9,
      snapAt = 3, maxRounds = 10)
    rounds shouldBe 1 // the probe fired at round 1 — same as standalone
    rankMap(fix) shouldBe
      rankMap(Graph.pagerankFixpoint(e, deg, n, 1e-9, 10)._1)
    // the loop still ran to round 3 for the bounded consumer
    rankMap(snap) shouldBe rankMap(Graph.pagerankRanksOn(e, deg, n, 3))
  }

  test("shared rank run: ε fires AFTER the snapshot round — loop stops at the fire, both results exact") {
    // caterpillar: rank keeps sloshing, converges at 5e-3 strictly
    // between round 1 and the cap (see the fixpoint test above)
    val (e, deg, n) = rankFrames(
      (for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b)) ++
        Seq((4L, 5L), (5L, 6L)))
    val init = deg.select(col("src").as("node"), (lit(1.0) / n).as("pr"))
    val (fixRef, refRounds) = Graph.pagerankFixpoint(e, deg, n, 5e-3, 64)
    refRounds should be > 1
    val (snap, fix, rounds) = Graph.rankSharedRun(init,
      pr => Graph.rankIteration(e, deg, pr, n), n, eps = 5e-3,
      snapAt = 1, maxRounds = 64)
    rounds shouldBe refRounds
    rankMap(fix) shouldBe rankMap(fixRef)
    rankMap(snap) shouldBe rankMap(Graph.pagerankRanksOn(e, deg, n, 1))
  }

  test("declared rank queries read one shared run: snapshot/terminal == the standalone loops on the corpus") {
    try {
      val (e, deg, n) = Graph.edgeFrames(spark, sfDir)
      val (snap, fix) = Graph.rankShared(spark, sfDir)
      rankMap(snap) shouldBe rankMap(Graph.pagerankRanksOn(e, deg, n, 5))
      rankMap(fix) shouldBe
        rankMap(Graph.pagerankFixpoint(e, deg, n, 1e-12, 8)._1)
      val reset = when(col("node") < 1000000L && col("node") % 100 === 0,
        lit(1.0) / deg.select(col("src").as("node"))
          .where(col("node") < 1000000L && col("node") % 100 === 0).count())
        .otherwise(lit(0.0))
      val (psnap, pfix) = Graph.pprShared(spark, sfDir)
      rankMap(psnap) shouldBe rankMap(Graph.pprRanksOn(e, deg, n, reset, 5))
      rankMap(pfix) shouldBe
        rankMap(Graph.pprFixpoint(e, deg, n, reset, 1e-12, 8)._1)
    } finally {
      Memo.release(spark); Cleanup(spark)
    }
  }

  // ---- round-16: snap-only dispatch for the BOUNDED rank queries ----

  test("bounded rank query standalone runs snap-only; with the shared run built it reads the snapshot") {
    try {
      Memo.release(spark); Cleanup(spark)
      // cold session, bounded query only: the snap-only loop (no probes,
      // no rounds past `iters`) — results == the plain bounded loop
      val coldSnap = Graph.rankSnap(spark, sfDir)
      val (e, deg, n) = Graph.edgeFrames(spark, sfDir)
      rankMap(coldSnap) shouldBe rankMap(Graph.pagerankRanksOn(e, deg, n, 5))
      val coldPpr = Graph.pprSnap(spark, sfDir)
      val reset = when(col("node") < 1000000L && col("node") % 100 === 0,
        lit(1.0) / deg.select(col("src").as("node"))
          .where(col("node") < 1000000L && col("node") % 100 === 0).count())
        .otherwise(lit(0.0))
      rankMap(coldPpr) shouldBe rankMap(Graph.pprRanksOn(e, deg, n, reset, 5))
      // once the shared run exists, the dispatch returns ITS snapshot
      // (same values, and the very same memoized frame — no extra loop)
      val (sharedSnap, _) = Graph.rankShared(spark, sfDir)
      assert(Graph.rankSnap(spark, sfDir) eq sharedSnap)
    } finally {
      Memo.release(spark); Cleanup(spark)
    }
  }

  test("rankSharedRun rejects a snapshot round past the cap") {
    val (e, deg, n) = rankFrames(
      for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b))
    val init = deg.select(col("src").as("node"), (lit(1.0) / n).as("pr"))
    an[IllegalArgumentException] should be thrownBy
      Graph.rankSharedRun(init, pr => Graph.rankIteration(e, deg, pr, n),
        n, eps = 0.0, snapAt = 9, maxRounds = 8)
  }
}
