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

  /** The rank loop, shared by the declared query and the plan-growth
    * test. Each iteration ends in an EAGER localCheckpoint (the CC-loop
    * discipline, Dedup.scala) so iteration i's plan starts from a
    * LogicalRDD leaf: lineage depth, plan size, and planner time stay
    * O(1) in `nIters`, making the iteration count a safe knob instead
    * of a plan-explosion fuse. Dangling mass: the undirected edge
    * construction gives every node outdeg ≥ 1 by construction, so no
    * sink-redistribution term exists to handle. */
  private[graft] def pagerankRanks(s: org.apache.spark.sql.SparkSession,
      d: String, nIters: Int): DataFrame = {
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
      .localCheckpoint(true) // nIters reuses: materialize the distinct once
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    val n = deg.count()
    var pr: DataFrame = deg.select(col("src").as("node"),
      (lit(1.0) / n).as("pr"))
    for (i <- 1 to nIters) {
      pr = e.join(pr, col("src") === col("node"))
        .join(deg, "src")
        .select(col("dst"),
          round(col("pr") / col("outdeg") * 1000000000000L).cast("long")
            .as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("sc"))
        .select(col("dst").as("node"),
          (lit(0.15) / n + lit(0.85) * (col("sc") / 1000000000000.0))
            .as("pr"))
      // sever lineage EVERY round (the r5 cadence): the round-6
      // every-2nd-round relaxation looked faster solo (2.30 s) but
      // regressed under the full-suite bench (3.16 s → 3.94 s, r5→r6
      // artifacts) — the doubled plan depth re-plans two joined
      // iterations per round and its unmaterialized intermediates
      // compete for memory with neighboring queries. The terminal
      // iteration still flows into the caller's projection
      // unmaterialized.
      if (i < nIters) pr = pr.localCheckpoint(true)
    }
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
