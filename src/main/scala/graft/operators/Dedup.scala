package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a candidate-pair graph — the step that turns
  * pairwise near-dup hits (MinHash/ngram/embedding) into dedup GROUPS:
  * one canonical document per component, everything else dropped.
  *
  * Algorithm: iterative min-label propagation with pointer jumping.
  * Each node starts as its own component; every round each node takes
  * the minimum component id among itself and its neighbors, then
  * path-compresses (comp ← comp(comp)), which collapses chains
  * exponentially — O(log diameter) rounds instead of O(diameter), the
  * difference between 6 and 10⁶ rounds on a pathological chain. Per
  * round: two key-partitioned joins + one min-aggregate; a 100 TB
  * corpus never sees a driver-side graph. Lineage is truncated per
  * round (persist/unpersist) exactly like the Bahmani loop.
  */
object Dedup {

  /** `edges`: (a, b) undirected candidate pairs (any orientation, dups
    * fine). Returns (node, comp) with comp = min node id of the
    * component. Nodes absent from `edges` are their own components —
    * callers union isolated nodes back if needed.
    *
    * NOT thread-safe with respect to OTHER persisted datasets: the loop's
    * checkpoint-block cleanup identifies each round's blocks by diffing
    * `sc.getPersistentRDDs` around the checkpoint call, so a CONCURRENT
    * persist on the same SparkContext (another thread submitting queries
    * while this loop runs) can land in the diff and be unpersisted from
    * under its owner. Run from a single-threaded driver section — the
    * normal shape for a batch dedup pass — or fork a separate session. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // symmetrize in ONE pass over `edges` (explode both orientations —
    // a unionAll of two selects would evaluate the candidate-pair
    // pipeline upstream twice); self-loops drop out of the propagation
    val sym = edges
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // localCheckpoint (not persist): persist caches data but keeps the
    // logical plan growing each round — after ~10 iterations the nested
    // join plan OOMs the driver just stringifying itself. Checkpointing
    // cuts lineage to a fresh scan of the materialized blocks.
    // Seed comp = min(node, min neighbor): one aggregate over sym does
    // the work of a whole propagation round for free — near-dup
    // components are tiny, so most converge in the seed itself.
    //
    // Checkpoint-block hygiene: each round's localCheckpoint persists a
    // fresh copy of the label set; without explicit cleanup, up to
    // maxIter copies sit in executor storage until the driver GC +
    // ContextCleaner get around to them. The Dataset API gives no handle
    // on the checkpointed RDD, so the loop diffs the context's persistent-
    // RDD registry around each checkpoint and frees the PREVIOUS round's
    // blocks once the next round is materialized (safe: the loop is
    // single-threaded driver code; eager checkpoint means `next` no
    // longer reads them). The final round's blocks stay for the caller.
    val sc = edges.sparkSession.sparkContext
    def persistedIds: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    val beforeSeed = persistedIds
    var labels = sym.groupBy("src")
      .agg(least(col("src"), min("dst")).as("comp"))
      .withColumnRenamed("src", "node")
      .localCheckpoint(true)
    var prevBlocks: Set[Int] = persistedIds -- beforeSeed
    var converged = false
    var iter = 0
    // labels only ever decrease, so Σcomp strictly decreases until the
    // fixpoint — a one-aggregate convergence probe instead of a
    // join+diff per round. coalesce(…, 0): sum over ZERO rows is null
    // (empty edge set — a corpus with no candidate pairs is legal).
    def compSum(df: DataFrame): Long =
      df.agg(coalesce(sum("comp"), lit(0L))).head().getLong(0)
    var prevSum = compSum(labels)
    while (!converged && iter < maxIter) {
      // neighbor minimum: comp of dst pulled to src
      val neighborMin = sym
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"))
        .agg(min("comp").as("ncomp"))
      val prop = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("ncomp"), col("comp")))
            .as("comp"))
      // pointer jumping: comp <- comp(comp) (comp ids are node ids, so
      // the lookup is a self-join; labels only ever decrease)
      val beforeCk = persistedIds
      val next = prop
        .join(prop.select(col("node").as("comp"),
          col("comp").as("jump")), Seq("comp"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("jump"), col("comp")))
            .as("comp"))
        .localCheckpoint(true)
      val nextBlocks = persistedIds -- beforeCk
      val curSum = compSum(next)
      prevBlocks.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      prevBlocks = nextBlocks
      labels = next
      converged = curSum == prevSum
      prevSum = curSum
      iter += 1
    }
    sym.unpersist()
    labels
  }

  /** Full dedup resolution: candidate pairs → components → per-document
    * verdict (keep = the component's minimum doc id). Documents with no
    * near-dup edge keep themselves. */
  def resolve(docIds: DataFrame, candidatePairs: DataFrame): DataFrame = {
    val cc = connectedComponents(candidatePairs)
    docIds.select(col("doc_id"))
      .join(cc.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("keep_id"))
      .withColumn("is_canonical", col("doc_id") === col("keep_id"))
  }
}
