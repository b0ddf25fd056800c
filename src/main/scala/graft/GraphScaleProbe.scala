package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** sf100 graph-family probe over a PRE-BUCKETED fact layout (round-13
  * verdict ask #2): demonstrate on this box the cluster mechanism the
  * round-12 probe could only state in prose.
  *
  * The round-12 ceiling: the graph family's edge builds die at sf100 in
  * a single 32-64 g JVM — first execution-pool starvation at 32 shuffle
  * partitions, then (at 256) a ~190 MB humongous G1 allocation inside
  * the 600 M-row basket aggregate, because one global hash aggregation
  * holds millions of rows of grouped state per task while 8 GB of memo
  * pins share the same unified pool. A real deployment does not run
  * that plan: it pre-buckets the fact table once and every edge build
  * consumes partition-sized slices.
  *
  * What this probe runs, in one session (managed bucket tables live in
  * the in-memory catalog):
  *   1. LAYOUT (timed, the deployment's one-time write): lineitem
  *      (l_orderkey, l_partkey, l_suppkey) and orders (o_orderkey,
  *      o_custkey) written `bucketBy(N, key).sortBy(key)` into the
  *      session warehouse.
  *   2. The graph-family declared queries with
  *      `graft.graph.lineitemBucketTable` / `ordersBucketTable` pointed
  *      at the bucket tables and
  *      `spark.sql.execution.useObjectHashAggregateExec=false`, so the
  *      basket aggregate consumes each pre-sorted bucket as a STREAMING
  *      sort-aggregate — one basket of state at a time, O(basket)
  *      memory per task, no humongous allocations — and the
  *      orders⋈lineitem edge join consumes the buckets co-keyed with no
  *      exchange on either 600 M-row side.
  *
  * Knobs (env): SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_SHUFFLE_PARTITIONS, SPARK_GRAFT_MEMO_BUDGET,
  * SPARK_GRAFT_BUCKETS (default 256), SPARK_GRAFT_WAREHOUSE (default
  * /tmp/graft_warehouse), SPARK_GRAFT_PAGE_SIZE (spark.buffer.pageSize,
  * default 8m here — small task-memory pages cap the size of any single
  * sorter allocation, the anti-humongous-G1 discipline). Optional args:
  * query-name subset (default: the full lineitem-graph family). One
  * timed rep per query (sf100 reps are minutes; cross-checking against
  * gate-scale numbers is Bench's job, not this probe's).
  *
  * Emits one JSON line; per-query seconds also land in
  * target/graphprobe.json.
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // parse up front (fail fast): the value is interpolated into the
    // emitted JSON — a non-numeric env would both fail Spark later AND
    // corrupt the artifact line (advisor finding, round 13)
    val shufParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
      cpus).trim.toInt
    val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "256").toInt
    val warehouse = sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE",
      "/tmp/graft_warehouse")
    val pageSize = sys.env.getOrElse("SPARK_GRAFT_PAGE_SIZE", "8m")
    // the scratch-settle cleaner confs (blocking shuffle removal,
    // tightened periodic GC — [[Cleanup.settleBuilderConfs]]) are always
    // ON here: this probe exists for big-sf runs, where they are the
    // difference between a green family and an ENOSPC cascade
    // (mechanism + measurements in the Cleanup scaladoc / SCALE.md r13)
    val spark = Cleanup.settleBuilderConfs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufParts.toString)
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.buffer.pageSize", pageSize)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_MEMO_BUDGET").foreach(b =>
      spark.conf.set("graft.memo.maxPinnedBytes", b))
    // size-dispatch override for the node-state broadcasts (the sf100
    // triangle adjacency join broadcasts ~5-6 GB on a 64 g heap — beyond
    // the 1 GiB library default, sane for this single-JVM probe)
    sys.env.get("SPARK_GRAFT_BROADCAST_STATE").foreach(b =>
      spark.conf.set("graft.graph.broadcastStateBytes", b))

    def timed[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val v = f
      (math.rint((System.nanoTime() - t0) / 1e7) / 100, v)
    }

    // scratch-disk settle between queries — the shared discipline
    // ([[Cleanup.settleScratch]]; this probe proved it out in round 13,
    // then it moved into the library so Bench/Verify big-sf runs get it
    // too via SPARK_GRAFT_SETTLE=1)
    def settleScratch(s: SparkSession): Unit = Cleanup.settleScratch(s)

    // ---- stage 1: the deployment's one-time bucketed layout ----------
    // the in-memory catalog is fresh each JVM, so DROP TABLE alone is a
    // no-op across runs while the PRIOR run's table directories persist
    // in the warehouse — saveAsTable then refuses to create a managed
    // table over a non-empty location (advisor finding, round 13):
    // delete the directories too
    spark.sql("DROP TABLE IF EXISTS g_li_b")
    spark.sql("DROP TABLE IF EXISTS g_ord_b")
    for (t <- Seq("g_li_b", "g_ord_b")) {
      val dir = java.nio.file.Paths.get(warehouse, t)
      if (java.nio.file.Files.exists(dir)) {
        val st = java.nio.file.Files.walk(dir)
        try st.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally st.close()
      }
    }
    val (liSec, _) = timed {
      Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_partkey", "l_suppkey")
        .write.bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("g_li_b")
    }
    val (ordSec, _) = timed {
      Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
        .write.bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("g_ord_b")
    }
    System.err.println(s"[probe] bucketed layout: lineitem $liSec s, " +
      s"orders $ordSec s ($buckets buckets)")
    // the layout writes shuffled 750 M rows — free their dead shuffle
    // files BEFORE the first query, or it pays them as lost scratch
    // (measured: q_pagerank ENOSPCs first-in-line while the identical
    // q_ppr fits after the abort cleans the leftovers)
    settleScratch(spark)

    // ---- stage 2: the graph family over the bucketed sources ---------
    spark.conf.set("graft.graph.lineitemBucketTable", "g_li_b")
    spark.conf.set("graft.graph.ordersBucketTable", "g_ord_b")
    // sorted buckets + sort-aggregate = one basket of state at a time
    spark.conf.set("spark.sql.execution.useObjectHashAggregateExec", "false")

    val family = Seq("q_pagerank", "q_ppr", "q_pagerank_fixpoint",
      "q_ppr_fixpoint", "q_triangles", "q_kcore", "q_kcore_fixpoint",
      "q_label_prop", "q_modularity", "q_bfs_hops", "q_bfs_reach")
    val selected = if (args.nonEmpty) args.toSeq.distinct else family
    val results = selected.map { name =>
      val (sec, ok) = timed {
        try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[probe] $name FAILED: ${e.getMessage}")
          false
        }
      }
      Cleanup(spark)
      settleScratch(spark)
      System.err.println(s"[probe] $name: ${if (ok) s"$sec s" else "FAILED"}")
      name -> (if (ok) sec else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"$k\":$v" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => s"\"$k\"" }
      .mkString("[", ",", "]")
    val json =
      s"""{"metric":"graph_scale_probe","sf":"$sfDir","buckets":$buckets,""" +
      s""""shuffle_partitions":$shufParts,"page_size":"$pageSize",""" +
      s""""layout_sec":{"lineitem":$liSec,"orders":$ordSec},""" +
      s""""memo_evictions":${Memo.evictions},""" +
      s""""memo_rebuild_sec":${Memo.rebuildSeconds},""" +
      s""""queries":$qs,"failed":$failed}"""
    new java.io.File("target").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/graphprobe.json"), json + "\n")
    spark.stop()
    println(json)
  }
}
