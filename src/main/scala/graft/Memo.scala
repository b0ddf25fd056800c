package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Per-(session, key) memo for MATERIALIZED frames shared across declared
  * queries in one harness run (Verify/Bench execute every query in a
  * single session, sequentially).
  *
  * Why it exists: several declared queries are honest consumers of the
  * same expensive intermediate — q_pagerank and q_ppr of the
  * customer–supplier edge/degree frames, q_label_prop / q_modularity /
  * q_bfs_hops / q_bfs_reach of the repeat-co-purchase graph, q_modularity
  * of the LPA assignment q_label_prop also computes. Declaring them
  * independent is right (each is a complete query a user can run alone:
  * the memo computes on first use); RE-running a multi-second graph build
  * per query is the same recompute waste the dedup family's shared
  * candidate builder removed in round 8. At 100 TB the materialize-once
  * discipline is not optional — you checkpoint the contracted graph and
  * score it per metric, you don't rebuild it per metric.
  *
  * Values must be eagerly materialized by the builder (localCheckpoint
  * (true)) so the memo hands later consumers a LogicalRDD leaf, not a
  * lazy plan that would re-execute anyway. The harness's per-query
  * [[Cleanup]] unpersists every persistent RDD after each query
  * (round-2 advisor hygiene) — the memo therefore records which RDD ids
  * its builds persisted and [[Cleanup]] spares exactly those, so shared
  * frames survive query boundaries while per-query transients are still
  * freed. Entries from stopped sessions are purged on every access; keys
  * are reference-identity on the session, so concurrent test suites with
  * their own sessions never collide.
  *
  * Staleness contract: entries built over a testdata directory carry a
  * cheap driver-side FINGERPRINT of that directory (an order-free XOR
  * of per-file (path, size, mtime) hashes, one bounded listing) taken
  * at build time; a later call with the same key rebuilds — releasing
  * the stale pins — when the fingerprint no longer matches, so a
  * regenerated directory cannot serve stale frames mid-session
  * (round-6's silent testdata regeneration is the documented
  * precedent). The fingerprint is a change DETECTOR, not a content
  * hash: it catches any regeneration that renames, resizes, or
  * re-stamps at least one file, not a byte-identical rewrite with
  * preserved names/sizes/mtimes, which no cheap listing can see.
  *
  * Footprint contract: `graft.memo.maxPinnedBytes` (unset = unlimited,
  * the harness default) bounds the pinned working set — exceeding it
  * evicts entries COST-AWARE (their blocks unpersisted; a later call
  * rebuilds), so an embedding application streaming many datasets
  * through one session cannot grow executor storage without bound.
  * Victim order is greedy bytes-per-rebuild-second, not LRU: each
  * candidate scores (freeable bytes it alone pins) / (its measured
  * build seconds), highest first, recency as tiebreak — the round-12
  * sf10 run showed pure recency evicting 20-40 s graph builds to keep
  * cheap frames (q_label_prop 0.13 → 42.4 s rebuild storms). Eviction
  * respects QUERY BOUNDARIES: entries handed out since the last
  * [[queryBoundary]] (Cleanup calls it per query) are in-flight — a
  * live plan may still read their truncated-lineage checkpoints — and
  * are never evicted; between boundaries the budget may therefore stay
  * temporarily exceeded. With the conf UNSET, the first crossing of
  * half the nominal storage pool logs one WARN naming the conf
  * ([[warnIfUnbounded]]) — loud, but advisory only. [[pinnedBytes]]
  * publishes the current figure; [[evictions]] counts evictions;
  * [[rebuilds]]/[[rebuildSeconds]] ledger the recompute tax budgeted
  * runs pay.
  *
  * Concurrency contract: CONCURRENT BUILDS of distinct keys are
  * supported (round-16 — the harness's upfront build phase runs
  * independent builders from a small thread pool, guide §2.6): the
  * build-time persistent-RDD diff is context-global, so an overlapped
  * build window may capture a sibling's fresh blocks — entry
  * registration tolerates that (over-pinning co-pins, safe under the
  * remove-then-diff release), and the eager transient sweep, the one
  * unsafe step, detects the overlap and defers to the caller's next
  * [[Cleanup]] (see `buildThreads`). Two threads racing the SAME key
  * still resolve first-writer-wins (the loser's value is dropped; its
  * blocks are freed at the next Cleanup) — schedule distinct keys per
  * wave to avoid duplicate work. [[Cleanup]]'s sweep must NOT run
  * concurrently with builds: it would free in-flight, not-yet-registered
  * checkpoints; the harness runs it only at wave/query boundaries.
  * Pin-sparing ([[pinnedRddIds]]) matches on the shared SparkContext,
  * not session identity — Cleanup from any session of a context spares
  * every sibling session's pins, which over-spares (safe) rather than
  * frees a sibling's live checkpoint.
  */
object Memo {
  private final case class Entry(value: AnyRef, rddIds: Set[Int],
      fingerprint: Long, buildNanos: Long) {
    // recency stamp for the byte-budget eviction TIEBREAK; mutated under
    // the single-threaded build discipline the concurrency contract
    // already requires, so a plain volatile is enough.
    @volatile var lastUse: Long = 0L
  }

  private val m = new ConcurrentHashMap[(SparkSession, String), Entry]

  // Entries handed out (hit or fresh build) since the last QUERY
  // BOUNDARY: a caller may still hold their frames inside a
  // not-yet-executed plan, and evicting a truncated-lineage
  // localCheckpoint that a live plan references fails the in-flight
  // query with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — found the first time
  // the budget machinery ran under the gate workload (q_modularity
  // consumes TWO memo entries; touching the second evicted the first
  // mid-query; MemoSpec's mid-suite eviction pin reproduces it). The
  // budget pass therefore never evicts a touched entry; [[queryBoundary]]
  // (called by the harness's Cleanup after each query's terminal action,
  // and by release) clears the set, at which point the previous query's
  // frames are dead by the harness discipline and the entries become
  // evictable again.
  private val touched = java.util.Collections.newSetFromMap(
    new ConcurrentHashMap[(SparkSession, String), java.lang.Boolean])

  /** Declare a query boundary for `s`'s context: entries handed out
    * before this call become eligible for byte-budget eviction (their
    * consumers' plans have run). The harness's [[Cleanup]] calls this
    * per query; an embedding application without Cleanup calls it — or
    * [[release]] — at its own dataset/query boundaries, and until it
    * does the budget may stay exceeded rather than break live plans. */
  def queryBoundary(s: SparkSession): Unit =
    touched.removeIf(_._1.sparkContext eq s.sparkContext)

  // monotonic use counter (NOT wall time: two uses in one millisecond
  // must still order) — drives least-recently-used eviction.
  private val useTick = new java.util.concurrent.atomic.AtomicLong(0L)

  // ---- concurrent-build window tracking (round-16) -------------------
  // The harness's upfront build phase now runs INDEPENDENT builders from
  // a small thread pool (guide §2.6 — the round-15 verdict's top ask:
  // the serial build region was ~40% of cold suite cost). The only part
  // of applyImpl that is unsafe under overlap is the eager
  // transient-block sweep: `added` is a context-GLOBAL persistent-RDD
  // diff, so build A's sweep window can capture build B's fresh blocks
  // and unpersist B's not-yet-registered checkpoints (B's consumers then
  // die with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND). Entry REGISTRATION is
  // already overlap-tolerant (added ∩ keep can only over-pin siblings'
  // registered blocks — co-pinning is safe by the remove-then-diff
  // release discipline), so the fix is to detect an overlapped build
  // window and SKIP the sweep there: the dead transients are freed by
  // the caller's next [[Cleanup]] (the harness runs one per build wave
  // and per query), which spares exactly the pinned ids. Nested builds
  // on ONE thread (rankShared → edgeFrames) are not overlap — the
  // per-thread set membership keeps their sweep behavior byte-identical
  // to the sequential discipline.
  private val buildThreads =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Thread]()
  private val stampClock = new java.util.concurrent.atomic.AtomicLong(0L)
  private val overlapStamp = new java.util.concurrent.atomic.AtomicLong(0L)

  // never-repeating sentinel for a fingerprint listing that failed
  // mid-walk: unique per failure AND disjoint from the digest value
  // space by construction (sentinels are the negative longs, counting
  // down from −1; legitimate digests mask the sign bit off), so it can
  // match neither a stored digest nor a previously stored sentinel —
  // the access rebuilds, which is the correct response to a directory
  // that is being rewritten right now.
  private val fpFail = new java.util.concurrent.atomic.AtomicLong(-1L)

  /** splitmix64 finalizer — the per-file mixer for [[fingerprint]]. */
  private def mix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Bounded-depth listing digest of a data directory: every file's
    * (path, size, mtime) tuple mixed to 64 bits (splitmix64) and XOR'd
    * into one order-free Long — one bounded listing, but unlike an
    * aggregate-stats fold (count + max mtime + total bytes, the
    * round-10 form) a regeneration that preserves the aggregates
    * (bytes moving between files, mtime-preserving copies, coarse-mtime
    * filesystems inside one granularity tick) still flips the digest
    * unless every individual file's tuple survives. Masked
    * non-negative so the value space is disjoint from the negative
    * failure sentinels. Depth 3 covers `<dir>/<table>.parquet
    * [/part-files]` for both the driver's single-file tables and
    * directory-shaped parquet output. A walk that fails mid-listing (a
    * part-file deleted between enumerate and stat — exactly the
    * regeneration-in-progress scenario the fingerprint exists for)
    * yields a unique sentinel instead of throwing, forcing a rebuild
    * rather than failing the calling query. */
  private[graft] def fingerprint(dir: String): Long = try {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) return 0L
    var acc = 0L
    val stream = java.nio.file.Files.walk(root, 3)
    try {
      stream.forEach { p =>
        val f = p.toFile
        if (f.isFile) {
          val h = mix64(mix64(mix64(
            root.relativize(p).toString.hashCode.toLong ^
              0x9e3779b97f4a7c15L) ^ f.length()) ^ f.lastModified())
          acc ^= h
        }
      }
    } finally stream.close()
    acc & Long.MaxValue // tag bit: digests ≥ 0, failure sentinels < 0
  } catch {
    case _: java.io.UncheckedIOException | _: java.io.IOException =>
      fpFail.getAndDecrement()
  }

  /** Memoize a frame (or tuple of frames) with no backing data
    * directory — test fixtures and synthetic builds. */
  def apply[T <: AnyRef](s: SparkSession, key: String)(f: => T): T =
    applyImpl(s, key, 0L)(f)

  /** Memoize a build derived from the parquet tables under `dir`; the
    * entry is invalidated (stale pins released, value rebuilt) when the
    * directory's [[fingerprint]] changes. */
  def apply[T <: AnyRef](s: SparkSession, key: String, dir: String)(
      f: => T): T = applyImpl(s, key, fingerprint(dir))(f)

  /** Non-building lookup: the live entry for (s, key) if present and its
    * data fingerprint still matches — never builds, never invalidates.
    * Lets a query prefer an already-built SUPERSET entry over running
    * its own cheaper build (the bounded-rank snap-only dispatch,
    * round-16): a hit counts as a use (recency + in-flight protection,
    * like [[apply]]); a stale or absent entry is simply None. */
  def peek[T <: AnyRef](s: SparkSession, key: String,
      dir: String): Option[T] = {
    val k = (s, key)
    val hit = m.get(k)
    if (hit != null && hit.fingerprint == fingerprint(dir)) {
      hit.lastUse = useTick.incrementAndGet()
      touched.add(k)
      Some(hit.value.asInstanceOf[T])
    } else None
  }

  private def applyImpl[T <: AnyRef](s: SparkSession, key: String,
      fp: Long)(f: => T): T = {
    // purge entries whose session's CONTEXT is gone — their checkpointed
    // RDDs are unusable and the references would pin the stopped session.
    // (Assumes one session per context, like the harness: a discarded
    // newSession() on a live context is NOT purged here — such an
    // embedding must call release(s) at its session boundary.)
    m.keySet.removeIf(k => k._1.sparkContext.isStopped)
    // same hygiene for the in-flight set: a stopped context that never
    // reaches another queryBoundary would otherwise strand its touched
    // keys (strong session refs) for the JVM lifetime — exactly the
    // long-lived embedding scenario the budget machinery targets
    touched.removeIf(k => k._1.sparkContext.isStopped)
    val k = (s, key)
    val hit = m.get(k)
    if (hit != null) {
      if (hit.fingerprint == fp) {
        hit.lastUse = useTick.incrementAndGet()
        touched.add(k)
        return hit.value.asInstanceOf[T]
      }
      // data under the key's directory changed since the build: the
      // memoized frames describe bytes that no longer exist — release
      // the stale pins and fall through to a rebuild
      releaseEntry(s, k, hit, blocking = false)
    }
    // Compute OUTSIDE the map's lock, then first-writer-wins: several
    // builders are themselves memo consumers (kCoreShared →
    // coOccurEdgesCk, lpaAssignment → weightedEdges), and a nested
    // computeIfAbsent on one ConcurrentHashMap throws "Recursive
    // update" whenever the two keys land in the same bin — a
    // session-identity-hash-dependent flake. Harness builds run
    // sequentially, so a racing duplicate build is theoretical; if it
    // happens the loser's value is simply dropped (its blocks stay
    // until release/session end — bounded node/edge-width frames).
    val before = s.sparkContext.getPersistentRDDs.keySet
    // overlap window open: my start stamp precedes any overlap mark a
    // concurrent build (or this one, seeing a concurrent build already
    // in flight) sets during the window
    val myStart = stampClock.incrementAndGet()
    val firstForThread = buildThreads.add(Thread.currentThread())
    if (buildThreads.size > 1) overlapStamp.set(stampClock.incrementAndGet())
    val buildT0 = System.nanoTime()
    // the thread stays registered through the SWEEP below (not just
    // through f): a build starting between our diff and our unpersist
    // pass must still mark this window overlapped
    val v = try f catch { case e: Throwable =>
      if (firstForThread) buildThreads.remove(Thread.currentThread())
      throw e
    }
    val buildNanos = System.nanoTime() - buildT0
    // rebuild ledger: a build for a key this JVM has built before (same
    // context) is recompute the memo already paid once — evictions and
    // fingerprint invalidations land here. Bench publishes the totals
    // (memo_rebuilds / memo_rebuild_sec) so a budgeted run's recompute
    // tax is a first-class artifact number, and the eviction policy's
    // cost term below is measured the same way.
    locally {
      // context identity = applicationId@startTime — unlike an identity
      // hash it cannot be REUSED by a later context after GC (advisor
      // finding, round 13: a reused hash miscounts a first build in a
      // fresh context as a rebuild). Spark enforces one active context
      // per JVM, so any ledger entry under a DIFFERENT id belongs to a
      // stopped context — prune those here, the same hygiene point the
      // entry/touched maps use above.
      val ctxId = contextLedgerId(s)
      everBuilt.removeIf(_._1 != ctxId)
      if (!everBuilt.add((ctxId, key))) {
        rebuildTick.incrementAndGet()
        rebuildNanosTotal.addAndGet(buildNanos)
      }
    }
    val added = s.sparkContext.getPersistentRDDs.keySet.diff(before).toSet
    // Pin ONLY what later consumers can actually read: the checkpoint
    // RDDs reachable from the returned frames' plans (LogicalRDD
    // leaves), plus anything a NESTED memo build registered for itself.
    // Everything else the build persisted is a dead per-round
    // intermediate (old k-core/BFS/LPA round states, the rare-shingle
    // inverted lists behind the pair frame) — free it NOW, or a full
    // harness run accumulates orphaned MEMORY_AND_DISK blocks for the
    // session lifetime (the round-2 problem Cleanup exists to prevent).
    // If the value's frames cannot be extracted (unknown shape), pin
    // everything — over-pinning is safe, freeing a live block is not.
    val vFrames = framesOf(v)
    val keep: Set[Int] =
      if (vFrames.isEmpty) added
      else vFrames.flatMap(reachableRddIds).toSet ++ pinnedRddIds(s)
    // overlap check happens with this thread still registered, so any
    // build racing this window has marked (or will see and mark) the
    // overlap stamp; an overlapped diff may hold a SIBLING's in-flight
    // blocks, so the eager transient sweep is skipped — the caller's
    // next Cleanup frees the same blocks (it spares only pinned ids).
    if (buildThreads.size > 1)
      overlapStamp.set(stampClock.incrementAndGet())
    val overlapped = overlapStamp.get() >= myStart
    if (!overlapped) {
      val persisted = s.sparkContext.getPersistentRDDs
      added.diff(keep).foreach(id =>
        persisted.get(id).foreach(_.unpersist(blocking = false)))
    }
    if (firstForThread) buildThreads.remove(Thread.currentThread())
    val entry = Entry(v, added.intersect(keep), fp, buildNanos)
    entry.lastUse = useTick.incrementAndGet()
    val prev = m.putIfAbsent(k, entry)
    val out = if (prev != null) prev.value.asInstanceOf[T] else v
    touched.add(k)
    enforceBudget(s, k)
    out
  }

  /** Optional pinned-byte budget: `graft.memo.maxPinnedBytes` (unset =
    * unlimited, the harness default — its whole working set is ~8
    * bounded builds). When the context's pinned storage exceeds the
    * budget, evict least-recently-USED entries of this context — never
    * the entry just touched — unpersisting their blocks; a later call
    * for an evicted key simply rebuilds (the same path a fingerprint
    * change takes). This bounds the memo's executor-storage footprint
    * for an embedding application that streams many datasets through
    * one session; it deliberately may leave the budget exceeded when a
    * SINGLE live entry is larger than the budget (evicting the entry in
    * use would thrash every call).
    */
  private def enforceBudget(s: SparkSession,
      justUsed: (SparkSession, String)): Unit = {
    val budget = s.conf.getOption("graft.memo.maxPinnedBytes")
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
    def bytes: Long = pinnedBytes(s)
    if (budget.isEmpty) {
      warnIfUnbounded(s, bytes)
      return
    }
    if (bytes <= budget.get) return
    // One storage-info scan + one pin-count pass up front, then pure
    // arithmetic per victim: a co-pinned block's bytes come off the
    // running total only when its LAST pinning entry is evicted —
    // mirroring exactly when releaseEntry's remove-then-diff actually
    // unpersists it. releaseEntry itself is untouched (the co-pin
    // safety invariant MemoSpec pins); the maps only drive the stop
    // condition, so eviction costs O(entries + pinned RDDs) instead of
    // a full getRDDStorageInfo walk per victim.
    val sizeOf: Map[Int, Long] = s.sparkContext.getRDDStorageInfo
      .map(i => i.id -> (i.memSize + i.diskSize)).toMap
    val pins = scala.collection.mutable.Map.empty[Int, Int]
    locally {
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey._1.sparkContext eq s.sparkContext)
          e.getValue.rddIds.foreach(id =>
            pins(id) = pins.getOrElse(id, 0) + 1)
      }
    }
    // same-context entries, sparing justUsed and everything touched
    // since the last query boundary (a live plan may still reference
    // those frames — see `touched`). When every entry is in-flight the
    // budget stays exceeded until the boundary, the same deliberate
    // trade as the larger-than-budget single entry.
    //
    // Victim ORDER is cost-aware, not LRU (round-12 ask #5: the sf10
    // budgeted run showed pure recency evicting 20-40 s graph builds to
    // keep cheap frames — q_label_prop 0.13 → 42.4 s rebuild storms).
    // Greedy knapsack: evict the entry freeing the most bytes per
    // rebuild-second first, where the bytes are the entry's FREEABLE
    // bytes (blocks it alone pins — a co-pinned dependency frees
    // nothing while its pinner survives, so it scores 0 and naturally
    // sorts last) and the cost is its measured build time. Scores are
    // computed once against the pre-eviction pin counts (an entry whose
    // blocks become sole-pinned mid-pass keeps its stale score — a
    // bounded approximation, not a safety issue: the accounting loop
    // below still frees exactly the right bytes). lastUse breaks ties
    // (equal-score entries evict least-recently-used first).
    val victims = {
      val it = m.entrySet().iterator()
      var acc = List.empty[((SparkSession, String), Entry)]
      while (it.hasNext) {
        val e = it.next()
        if ((e.getKey._1.sparkContext eq s.sparkContext) &&
            e.getKey != justUsed && !touched.contains(e.getKey))
          acc = (e.getKey -> e.getValue) :: acc
      }
      def freeable(e: Entry): Long = e.rddIds.iterator
        .filter(id => pins.getOrElse(id, 0) == 1)
        .map(id => sizeOf.getOrElse(id, 0L)).sum
      def score(e: Entry): Double =
        freeable(e) / math.max(e.buildNanos / 1e9, 1e-3)
      // graft.memo.evictionPolicy=lru restores the pre-round-13 pure
      // recency order — kept as the A/B control for the policy
      // measurement (SCALE.md round-13), not a recommended setting
      if (s.conf.getOption("graft.memo.evictionPolicy")
          .contains("lru")) acc.sortBy(_._2.lastUse)
      else acc.map { case (k, e) => (k, e, score(e)) }
        .sortBy { case (_, e, sc) => (-sc, e.lastUse) }
        .map { case (k, e, _) => (k, e) }
    }
    var remaining = bytes
    val vi = victims.iterator
    while (remaining > budget.get && vi.hasNext) {
      val (vk, ve) = vi.next()
      releaseEntry(s, vk, ve, blocking = true)
      val beforeBytes = remaining
      // the victim's own block bytes, logged separately from the
      // accounting delta: a victim whose blocks are co-pinned by
      // survivors frees ~0 accounted bytes even though the eviction
      // happened — the two figures disambiguate that in budgeted logs
      val ownBytes = ve.rddIds.iterator
        .map(id => sizeOf.getOrElse(id, 0L)).sum
      ve.rddIds.foreach { id =>
        val c = pins.getOrElse(id, 0) - 1
        pins(id) = c
        if (c == 0) remaining -= sizeOf.getOrElse(id, 0L)
      }
      evictionTick.incrementAndGet()
      log.info(s"graft.Memo evicted '${vk._2}' (cost-aware: ~$ownBytes " +
        s"block bytes over ${math.rint(ve.buildNanos / 1e7) / 100} s " +
        s"build; ~${beforeBytes - remaining} pinned bytes freed net of " +
        s"co-pins) to meet graft.memo.maxPinnedBytes=${budget.get}; a " +
        s"later call rebuilds.")
    }
  }

  // lifetime eviction counter — probe/spec observability for the budget
  // machinery (SCALE.md publishes it for the budgeted sf10 run)
  private val evictionTick = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Total budget evictions performed by [[enforceBudget]] in this JVM. */
  def evictions: Long = evictionTick.get()

  // rebuild ledger (see applyImpl): keys this JVM has built at least
  // once, by non-reusable context id — no strong context refs to leak,
  // and dead-context rows are pruned at the applyImpl hygiene point
  private val everBuilt = java.util.Collections.newSetFromMap(
    new ConcurrentHashMap[(String, String), java.lang.Boolean])

  /** Non-reusable identity for the rebuild ledger: applicationId plus
    * startTime — a stopped context's identity HASH can be reused after
    * GC, this pair cannot. */
  private def contextLedgerId(s: SparkSession): String =
    s.sparkContext.applicationId + "@" + s.sparkContext.startTime
  private val rebuildTick = new java.util.concurrent.atomic.AtomicLong(0L)
  private val rebuildNanosTotal =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Builds of a key this JVM already built once (eviction/fingerprint
    * recompute) — the budgeted-run tax the cost-aware victim order
    * minimizes; Bench publishes it as memo_rebuilds. */
  def rebuilds: Long = rebuildTick.get()

  /** Wall seconds spent in [[rebuilds]] — memo_rebuild_sec in Bench. */
  def rebuildSeconds: Double =
    math.rint(rebuildNanosTotal.get() / 1e7) / 100

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  // warn-once latch per context for the unbounded-memo advisory
  private val warnedContexts = java.util.Collections.newSetFromMap(
    new ConcurrentHashMap[org.apache.spark.SparkContext, java.lang.Boolean])

  /** With `graft.memo.maxPinnedBytes` unset the memo is unbounded — the
    * right default for the harness, whose whole working set is ~8
    * bounded builds, but a footgun for an embedding application
    * streaming many datasets through one session (round-11 ask #5). The
    * first time this context's pinned bytes cross HALF the nominal
    * storage pool (process max heap × `spark.memory.fraction` ×
    * `spark.memory.storageFraction` — exact in local mode where the
    * driver heap IS the cluster memory, an order-of-magnitude proxy on
    * a real cluster whose executors size differently), one WARN names
    * the conf to set. Advisory only: nothing is evicted and harness
    * behavior is unchanged. Returns whether THIS call warned (the
    * first-crossing latch MemoSpec pins). */
  private[graft] def warnIfUnbounded(s: SparkSession, bytes: Long): Boolean = {
    // latch hygiene: a long-lived JVM that stops and recreates contexts
    // (the embedding-application scenario this warning targets) must not
    // accumulate strong references to dead SparkContexts here
    warnedContexts.removeIf(_.isStopped)
    if (warnedContexts.contains(s.sparkContext)) return false
    def fracConf(key: String, dflt: Double): Double = s.conf.getOption(key)
      .flatMap(v => scala.util.Try(v.trim.toDouble).toOption).getOrElse(dflt)
    val pool = (Runtime.getRuntime.maxMemory *
      fracConf("spark.memory.fraction", 0.6) *
      fracConf("spark.memory.storageFraction", 0.5)).toLong
    val warn = bytes > pool / 2 && warnedContexts.add(s.sparkContext)
    if (warn)
      log.warn(s"graft.Memo pins $bytes bytes of materialized frames " +
        s"with no graft.memo.maxPinnedBytes budget set — past half the " +
        s"nominal storage pool ($pool bytes). Long-lived sessions that " +
        s"stream many datasets should set graft.memo.maxPinnedBytes " +
        s"(LRU eviction) or call Memo.release(session) at dataset " +
        s"boundaries.")
    warn
  }

  /** Test hook: forget which contexts already got the unbounded-memo
    * advisory (so a spec can assert the first-crossing semantics). */
  private[graft] def resetWarnLatch(): Unit = warnedContexts.clear()

  /** Remove `e` from the memo and unpersist ONLY the blocks no surviving
    * entry still pins. Composite entries CO-PIN their nested
    * dependencies' checkpoints (a build's `added ∩ keep` includes ids a
    * nested memo build registered for itself — lpaAssignment's entry
    * carries weightedEdges' checkpoint id), so unpersisting a victim's
    * full id set would destroy blocks a still-live sibling entry serves:
    * its next hit would return a lineage-truncated frame whose blocks
    * are gone. Remove-then-diff makes every release path (fingerprint
    * invalidation, budget eviction, session release) safe against shared
    * pins. */
  private def releaseEntry(s: SparkSession, k: (SparkSession, String),
      e: Entry, blocking: Boolean): Unit = {
    m.remove(k, e)
    val survivors = pinnedRddIds(s)
    val persisted = s.sparkContext.getPersistentRDDs
    e.rddIds.diff(survivors).foreach(id =>
      persisted.get(id).foreach(_.unpersist(blocking)))
  }

  /** The DataFrames inside a memo value (frame, or tuple of frames and
    * scalars) — the roots for live-block reachability. */
  private def framesOf(v: AnyRef): Seq[org.apache.spark.sql.DataFrame] = {
    val parts = v match {
      case t: Product => t.productIterator.toSeq
      case other      => Seq(other)
    }
    parts.collect { case d: org.apache.spark.sql.DataFrame => d }
  }

  /** Checkpoint RDD ids a frame's plan reads (its LogicalRDD leaves). */
  private def reachableRddIds(df: org.apache.spark.sql.DataFrame): Set[Int] =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }.toSet

  /** RDD ids [[Cleanup]] must NOT unpersist. Matched on the shared
    * SparkContext (not session identity): getPersistentRDDs — the set
    * Cleanup sweeps — is context-global, so a Cleanup driven from one
    * session must spare every sibling session's pins or it would
    * unpersist lineage-truncated checkpoints a sibling still reads. */
  def pinnedRddIds(s: SparkSession): Set[Int] = {
    val it = m.entrySet().iterator()
    var acc = Set.empty[Int]
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1.sparkContext eq s.sparkContext)
        acc = acc.union(e.getValue.rddIds)
    }
    acc
  }

  /** Total storage (memory + disk) currently held by this context's
    * pinned blocks — the memo's working-set figure, logged by MemoProbe
    * so the one-time builds' footprint is a published number alongside
    * their build seconds. */
  def pinnedBytes(s: SparkSession): Long = {
    val pinned = pinnedRddIds(s)
    s.sparkContext.getRDDStorageInfo
      .filter(i => pinned.contains(i.id))
      .map(i => i.memSize + i.diskSize).sum
  }

  /** Release every entry for `s` and unpersist its pinned blocks — an
    * embedding application that processes many datasets in one session
    * calls this at dataset boundaries; the harness never needs it (its
    * memo dies with the session). */
  def release(s: SparkSession): Unit = {
    touched.removeIf(_._1 eq s)
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) {
        it.remove()
        // diff AFTER removal: a sibling session of the same context may
        // co-pin this entry's checkpoints (see releaseEntry)
        val survivors = pinnedRddIds(s)
        val persisted = s.sparkContext.getPersistentRDDs
        e.getValue.rddIds.diff(survivors).foreach(id =>
          persisted.get(id).foreach(_.unpersist(blocking = false)))
      }
    }
  }

  /** Test hook: drop everything (e.g. between conf-flip scenarios) —
    * releases each live session's pins so the blocks are freed, not
    * stranded with no remaining handle. */
  private[graft] def clear(): Unit = {
    val sessions = {
      val it = m.keySet.iterator()
      var acc = Set.empty[SparkSession]
      while (it.hasNext) acc += it.next()._1
      acc
    }
    sessions.foreach(s => if (!s.sparkContext.isStopped) release(s))
    m.clear()
  }
}
