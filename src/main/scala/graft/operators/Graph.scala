package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components (extension
  * family of operators/Dedup.scala's star-contraction CC): PageRank over
  * the customer–supplier transaction graph, the Pregel-shaped join-agg
  * loop every distributed graph engine reduces to on Spark.
  *
  * Determinism discipline: per-iteration rank contributions are
  * integer-quantized (ROUND(pr/outdeg · 10¹²) summed as BIGINT — the
  * q_moments_stats trick) so every iteration's aggregate is order-free
  * and bit-identical in any engine/partitioning; the remaining ops
  * ((1−d)/N offset, d·sum scale) are identical IEEE double arithmetic
  * on exact inputs. The DuckDB oracle unrolls the same five iterations
  * as CTEs.
  *
  * Scale shape (100 TB): the edge list and degree table materialize
  * once (eager localCheckpoint — 5 reuses each); each iteration is one
  * co-keyed join (edges ⋈ ranks ⋈ degrees on src) and ONE map-side-
  * combined aggregate exchange on dst carrying (dst, long) pairs — rank
  * state is 16 bytes/node, never adjacency or payload. On a cluster the
  * edge table is bucketed by src once so the per-iteration join is
  * exchange-free; the loop adds no driver-side state beyond N.
  */
object Graph {

  private val damping = 0.85
  private val iters = 5
  private val supplierOffset = 1000000L

  /** Per-iteration oracle CTE: quantized contributions summed exactly. */
  private def iterSql(i: Int): String =
    s"""p$i AS (SELECT e.dst AS node,
       |  0.15/nn.n + 0.85*(SUM(CAST(ROUND(p.pr/d.outdeg*1000000000000)
       |    AS BIGINT))/1000000000000.0) AS pr
       |  FROM e JOIN p${i - 1} p ON e.src = p.node
       |  JOIN deg d ON d.src = e.src
       |  CROSS JOIN n nn GROUP BY e.dst, nn.n)""".stripMargin

  /** One rank iteration from the materialized edge/degree frames —
    * factored out so ShuffleAuditSpec can plan-assert its exchange
    * budget. With `e` pre-hashed AND pre-sorted on src (see
    * pagerankRanks), the edge side of both joins is exchange-free and
    * sort-free; only the node-cardinality frames move: pr re-hashes on
    * node into the join, and the map-side-combined aggregate exchanges
    * (dst, long) partials. */
  private[graft] def rankIteration(e: DataFrame, deg: DataFrame,
      pr: DataFrame, n: Long): DataFrame =
    e.join(pr, col("src") === col("node"))
      .join(deg, "src")
      .select(col("dst"),
        round(col("pr") / col("outdeg") * 1000000000000L).cast("long")
          .as("contrib"))
      .groupBy("dst").agg(sum("contrib").as("sc"))
      .select(col("dst").as("node"),
        (lit(0.15) / n + lit(0.85) * (col("sc") / 1000000000000.0))
          .as("pr"))

  /** The rank loop, shared by the declared query and the plan-growth
    * test. Each iteration ends in an EAGER localCheckpoint (the CC-loop
    * discipline, Dedup.scala) so iteration i's plan starts from a
    * LogicalRDD leaf: lineage depth, plan size, and planner time stay
    * O(1) in `nIters`, making the iteration count a safe knob instead
    * of a plan-explosion fuse. Dangling mass: the undirected edge
    * construction gives every node outdeg ≥ 1 by construction, so no
    * sink-redistribution term exists to handle.
    *
    * Edge-table layout: `e` is hash-repartitioned on src (explicit
    * partition count — user-specified, so AQE never re-coalesces it out
    * of alignment) and sorted within partitions BEFORE its one
    * localCheckpoint. Dataset.localCheckpoint preserves the physical
    * plan's outputPartitioning and outputOrdering into the LogicalRDD
    * leaf, so all nIters sort-merge joins on src consume the edge table
    * in place — zero edge shuffles, zero edge sorts after the first.
    * `deg` aggregates from the aligned `e`, inheriting hash(src) with no
    * exchange of its own. This is the local-mode twin of the
    * cluster-scale "bucket the edge table by src once" layout
    * (ScaleTechniquesSpec pins the bucketed variant).
    */
  /** Run `f` with AQE disabled, restoring the previous setting after.
    * Why: localCheckpoint records the materialized plan's
    * outputPartitioning/outputOrdering into its LogicalRDD leaf — but
    * under AQE the physical plan is an AdaptiveSparkPlanExec whose
    * pre-execution partitioning is unknown, so the leaf gets
    * UnknownPartitioning and every later join re-shuffles the frame
    * (measured: the probe plan showed 4 exchanges/iteration instead of
    * 1). The rank loop's plans are tiny and fixed-shape, so AQE buys
    * nothing inside this scope; queries execute sequentially in
    * Bench/Verify/tests, so the scoped session-conf flip cannot race. */
  private[graft] def withAqeOff[T](s: org.apache.spark.sql.SparkSession)(
      f: => T): T = {
    val k = "spark.sql.adaptive.enabled"
    val prev = s.conf.get(k)
    s.conf.set(k, "false")
    try f finally s.conf.set(k, prev)
  }

  /** Materialize the aligned edge/degree frames once: (e, deg, |nodes|).
    * Exposed so ShuffleAuditSpec can plan-assert a single iteration's
    * exchange budget against exactly these layouts. */
  private[graft] def edgeFrames(s: org.apache.spark.sql.SparkSession,
      d: String): (DataFrame, DataFrame, Long) = withAqeOff(s) {
    val np = s.sessionState.conf.numShufflePartitions
    val edges0 = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
    // undirected: each endpoint both emits and receives rank
    val e = edges0.select(col("c").as("src"),
        (col("s") + supplierOffset).as("dst"))
      .union(edges0.select((col("s") + supplierOffset).as("src"),
        col("c").as("dst")))
      .repartition(np, col("src")).sortWithinPartitions("src")
      .localCheckpoint(true) // nIters reuses: materialize the distinct once
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .sortWithinPartitions("src")
      .localCheckpoint(true)
    (e, deg, deg.count())
  }

  private[graft] def pagerankRanks(s: org.apache.spark.sql.SparkSession,
      d: String, nIters: Int): DataFrame = {
    val (e, deg, n) = edgeFrames(s, d)
    var pr: DataFrame = deg.select(col("src").as("node"),
      (lit(1.0) / n).as("pr"))
    withAqeOff(s) { for (i <- 1 to nIters) {
      pr = rankIteration(e, deg, pr, n)
      // sever lineage EVERY round (the r5 cadence): the round-6
      // every-2nd-round relaxation looked faster solo (2.30 s) but
      // regressed under the full-suite bench (3.16 s → 3.94 s, r5→r6
      // artifacts) — the doubled plan depth re-plans two joined
      // iterations per round and its unmaterialized intermediates
      // compete for memory with neighboring queries. The terminal
      // iteration still flows into the caller's projection
      // unmaterialized.
      if (i < nIters) pr = pr.localCheckpoint(true)
    } }
    pr
  }

  private val qPagerank = Q("q_pagerank",
    s"""WITH ed0 AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |e AS (SELECT c AS src, s + $supplierOffset AS dst FROM ed0
       |      UNION ALL SELECT s + $supplierOffset, c FROM ed0),
       |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
       |  FROM e GROUP BY 1),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
       |p0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE)/nn.n AS pr
       |  FROM deg CROSS JOIN n nn),
       |${(1 to iters).map(iterSql).mkString(",\n")}
       |SELECT node, ROUND(pr, 6) AS pr FROM p$iters
       |ORDER BY node""".stripMargin) { (s, d) =>
    pagerankRanks(s, d, iters)
      .select(col("node"), round(col("pr"), 6).as("pr")).orderBy("node")
  }

  val all: Seq[Q] = Seq(qPagerank)
}
