package graft

import org.apache.spark.sql.SparkSession

/** Per-query storage hygiene for the Verify/Bench harnesses: queries are
  * allowed to `persist`/`localCheckpoint` intermediates they reuse within
  * one plan (rare-shingle tables, TWCNB complement counts, tf
  * materializations), and the HARNESS frees them after each query's
  * terminal action — otherwise a full 85-query run accumulates orphaned
  * MEMORY_AND_DISK blocks for the session lifetime, evicting later
  * queries' working set and skewing timings (advisor finding, round 2).
  *
  * [[Memo]]-pinned blocks are the one exception: frames deliberately
  * shared ACROSS queries (graph builds, the LPA assignment) must survive
  * the per-query sweep — they are bounded (node/edge-width) and freed
  * with the session.
  *
  * Big-sf mode (`graft.cleanup.settleScratch=true`, round-13 verdict
  * wrong #3): [[apply]] additionally runs [[settleScratch]] — the
  * scratch-disk settle discipline the round-13 sf100 graph probe proved
  * out. Spark frees shuffle FILES only when the dead ShuffleDependency
  * objects are garbage-collected (ContextCleaner is weak-reference
  * driven; its periodic-GC backstop defaults to 30 min — longer than
  * whole queries at sf100), and even then the async cleaner thread
  * cannot unlink ~10⁶ small map-output files faster than the next query
  * writes new ones — measured round 13 as a 49 GB blockmgr directory
  * persisting at 99% disk with every job dead and two GCs fired. A
  * multi-query suite at big sf therefore ENOSPC-cascades unless each
  * query boundary (1) GCs, surfacing the dead shuffles to the cleaner,
  * and (2) polls the block-manager directories to quiescence before the
  * next query starts writing. The conf belongs WITH these two STATIC
  * companions, set at session build (the harnesses wire all three to
  * `SPARK_GRAFT_SETTLE=1`):
  * `spark.cleaner.referenceTracking.blocking.shuffle=true` (the cleaner
  * thread blocks on each unlink instead of racing the next query) and a
  * tightened `spark.cleaner.periodicGC.interval` (e.g. 2min). At gate
  * scale the poll settles in one iteration (~2 s) — measurable but the
  * harness default stays OFF so gate timings keep measuring plans, not
  * hygiene. */
object Cleanup {
  def apply(spark: SparkSession): Unit = {
    // query boundary first: the finished query's frames are dead, so
    // memo entries handed to it become eligible for byte-budget
    // eviction again (Memo's touched-set protection)
    Memo.queryBoundary(spark)
    spark.sharedState.cacheManager.clearCache()
    val keep = Memo.pinnedRddIds(spark)
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!keep.contains(id)) rdd.unpersist(blocking = false)
    }
    if (spark.conf.getOption("graft.cleanup.settleScratch")
        .exists(_.trim.equalsIgnoreCase("true")))
      settleScratch(spark)
  }

  /** Scratch-disk settle: GC (surfaces dead shuffle deps to the
    * ContextCleaner, whose shuffle removal should be blocking — see the
    * object scaladoc) then poll the JVM's block-manager directories
    * until their footprint stops shrinking (2 s quiet, 180 s cap).
    * Between sf100-sized queries this is the difference between a green
    * family and an ENOSPC cascade; at small sf it settles in one poll. */
  def settleScratch(s: SparkSession): Unit = {
    def scratchBytes: Long = {
      val roots = s.sparkContext.getConf
        .get("spark.local.dir", System.getProperty("java.io.tmpdir"))
        .split(",").map(_.trim).filter(_.nonEmpty)
      roots.map { r =>
        val d = new java.io.File(r)
        Option(d.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith("blockmgr-"))
          .map { bm =>
            var acc = 0L
            val stack = scala.collection.mutable.Stack(bm)
            while (stack.nonEmpty) {
              val f = stack.pop()
              if (f.isDirectory)
                Option(f.listFiles()).foreach(_.foreach(stack.push))
              else acc += f.length()
            }
            acc
          }.sum
      }.sum
    }
    System.gc()
    val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
    var last = Long.MaxValue
    var cur = scratchBytes
    while (cur < last && System.nanoTime() < deadline) {
      last = cur
      Thread.sleep(2000)
      System.gc()
      cur = scratchBytes
    }
  }

  /** The STATIC cleaner confs the settle discipline relies on, applied
    * to a session builder when big-sf mode is requested (they cannot be
    * set post-context-creation): blocking shuffle removal + tightened
    * periodic GC. Shared by Bench/Verify (`SPARK_GRAFT_SETTLE=1`) and
    * GraphScaleProbe (always on). */
  def settleBuilderConfs(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.cleaner.referenceTracking.blocking.shuffle", "true")
}
