package graft


import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Scale-technique demonstrations with verifiable local behavior:
  * bucketed co-located joins (no Exchange in the plan) and salted skew
  * joins (identical results to the plain join).
  */
class ScaleTechniquesSpec extends SparkSpec {

  test("dictionary id assignment plans contain no single-partition Window") {
    // row_number() OVER (ORDER BY term) with no partitionBy funnels the
    // whole vocabulary through one task; the zipWithIndex formulation
    // must keep Window out of the physical plan entirely.
    val byName = graft.operators.TextQueries.all.map(q => q.name -> q).toMap
    for (n <- Seq("q_dict_load", "q_dict_vectorize")) {
      val plan = byName(n).fn(spark, sfDir).queryExecution.executedPlan.toString
      withClue(s"$n plan:") { plan should not include "Window" }
    }
  }

  test("TWCNB plans contain no label-partitioned Window") {
    // per-label normalizers are per-label SCALARS: groupBy(label)
    // aggregates joined back. A Window.partitionBy(label) would funnel
    // each class's whole vocabulary slice through one task (L is small),
    // the same failure class as the dictionary window above.
    val byName = graft.operators.TextQueries.all.map(q => q.name -> q).toMap
    for (n <- Seq("q_twcnb_model", "q_twcnb_tfidf", "q_nb_score")) {
      val plan = byName(n).fn(spark, sfDir).queryExecution.executedPlan.toString
      withClue(s"$n plan:") { plan should not include "Window" }
    }
  }

  test("range join blocks on (user_id, time bucket), not user_id alone") {
    val byName = graft.operators.Relational.all.map(q => q.name -> q).toMap
    val plan = byName("q_join_range").fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the equi-join keys must include the derived bucket column
    plan.toLowerCase should include ("bucket")
  }

  test("bucketed tables join without a shuffle exchange") {
    // (warehouse dir is a static conf — managed tables land in the
    // default ./spark-warehouse, dropped below and gitignored)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    try {
      Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_custkey", "o_orderpriority")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("b_orders")
      Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("b_lineitem")

      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      // Both sides pre-bucketed on the key: the sort-merge join consumes
      // bucket files directly — no Exchange anywhere in the join subtree.
      val plan = joined.queryExecution.executedPlan.toString
      withClue(plan) {
        plan should not include "Exchange hashpartitioning"
      }
      // and it is still correct
      val expect = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey")).count()
      joined.count() shouldBe expect
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("pagerank iterates on a bucketed edge table with zero edge-side exchanges") {
    // Graph.scala's cluster-scale claim made measurable: persist the edge
    // and degree tables bucketed+sorted by src ONCE, and a rank iteration
    // joins them in place — the only remaining exchange is the (dst,
    // long) partial aggregate; nothing re-partitions on src, ever.
    spark.sql("DROP TABLE IF EXISTS b_edges")
    spark.sql("DROP TABLE IF EXISTS b_deg")
    try {
      val (e, deg, n) = graft.operators.Graph.edgeFrames(spark, sfDir)
      e.write.bucketBy(8, "src").sortBy("src").saveAsTable("b_edges")
      deg.write.bucketBy(8, "src").sortBy("src").saveAsTable("b_deg")
      val eb = spark.table("b_edges")
      val db = spark.table("b_deg")
      val pr0 = db.select(col("src").as("node"), (lit(1.0) / n).as("pr"))
      val it = graft.operators.Graph.rankIteration(eb, db, pr0, n)
      it.count()
      val plan = it.queryExecution.executedPlan.toString
      withClue(plan) {
        "Exchange hashpartitioning\\(src".r.findAllIn(plan).size shouldBe 0
      }
      // the bucketed iteration agrees with the layout-checkpoint one
      val expect = graft.operators.Graph.rankIteration(e, deg,
        deg.select(col("src").as("node"), (lit(1.0) / n).as("pr")), n)
      it.select(col("node"), round(col("pr"), 9).as("pr")).orderBy("node")
        .collect() shouldBe
        expect.select(col("node"), round(col("pr"), 9).as("pr"))
          .orderBy("node").collect()
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_edges")
      spark.sql("DROP TABLE IF EXISTS b_deg")
    }
  }

  test("beyond the broadcast budget the rank iteration consumes the bucketed layout co-keyed") {
    // The round-9 dispatch's far side, made measurable: with
    // graft.graph.broadcastStateBytes = 0 (the |V| ≥ 10⁸ regime where a
    // broadcast would OOM the driver), stateHint plans PLAIN joins — and
    // over the bucketed-by-src edge/degree tables, with rank state
    // derived from the same layout, those joins consume the buckets
    // co-keyed: no BroadcastHashJoin anywhere, no exchange on src on ANY
    // side, only the (dst, long) partial aggregate moves. This is the
    // production deployment the loop scaladocs describe.
    spark.sql("DROP TABLE IF EXISTS c_edges")
    spark.sql("DROP TABLE IF EXISTS c_deg")
    val key = "graft.graph.broadcastStateBytes"
    val autoKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevAuto = spark.conf.get(autoKey)
    try {
      val (e, deg, n) = graft.operators.Graph.edgeFrames(spark, sfDir)
      e.write.bucketBy(8, "src").sortBy("src").saveAsTable("c_edges")
      deg.write.bucketBy(8, "src").sortBy("src").saveAsTable("c_deg")
      val eb = spark.table("c_edges")
      val db = spark.table("c_deg")
      val pr0 = db.select(col("src").as("node"), (lit(1.0) / n).as("pr"))
      spark.conf.set(key, "0")
      // at 10⁸ nodes the state tables' stats exceed the planner's own
      // broadcast threshold too; bench-scale tables are KBs, so simulate
      // that by disabling auto-broadcast — the dispatch already dropped
      // the hint, this makes the planner see "too big" as it would there
      spark.conf.set(autoKey, "-1")
      val it = graft.operators.Graph.rankIteration(eb, db, pr0, n)
      it.count()
      val plan = it.queryExecution.executedPlan.toString
      withClue(plan) {
        plan should not include "BroadcastHashJoin"
        "Exchange hashpartitioning\\(src".r.findAllIn(plan).size shouldBe 0
        "Exchange hashpartitioning\\(node".r.findAllIn(plan).size shouldBe 0
      }
      // and the dispatch is plan-only: identical ranks to the hinted form
      spark.conf.unset(key)
      spark.conf.set(autoKey, prevAuto)
      val expect = graft.operators.Graph.rankIteration(e, deg,
        deg.select(col("src").as("node"), (lit(1.0) / n).as("pr")), n)
      it.select(col("node"), round(col("pr"), 9).as("pr")).orderBy("node")
        .collect() shouldBe
        expect.select(col("node"), round(col("pr"), 9).as("pr"))
          .orderBy("node").collect()
    } finally {
      spark.conf.unset(key)
      spark.conf.set(autoKey, prevAuto)
      spark.sql("DROP TABLE IF EXISTS c_edges")
      spark.sql("DROP TABLE IF EXISTS c_deg")
    }
  }

  test("declared scans push predicates and prune columns at the parquet scan") {
    // the two halves of "don't read what you don't need" at 100 TB:
    // predicates must reach the parquet reader (row-group/page skipping)
    // and the ReadSchema must carry only touched columns. Assert both on
    // the plan text of declared queries, not on trust.
    val sf01 = "/root/testdata/sf0.01"
    val rel = graft.operators.Relational.all.map(q => q.name -> q).toMap
    val pipe = graft.operators.PipelineQueries.all.map(q => q.name -> q).toMap
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val fscan = scans(
      rel("q_filter").fn(spark, sf01).queryExecution.executedPlan)
    fscan should have size 1
    val pushed = fscan.head.metadata("PushedFilters")
    pushed should include ("GreaterThanOrEqual(l_shipdate")
    pushed should include ("LessThan(l_quantity,25")
    pushed should include ("GreaterThanOrEqual(l_discount,0.03")
    // projection pruning: untouched lineitem columns stay out of the scan
    fscan.head.requiredSchema.fieldNames.toSet shouldBe Set("l_orderkey",
      "l_linenumber", "l_quantity", "l_discount", "l_shipdate")
    // the PII scrub touches doc_id/text/source only — lang and n_chars
    // must not be decoded from a 100 TB corpus for it
    val pscan = scans(
      pipe("q_pii_redact").fn(spark, sf01).queryExecution.executedPlan)
    pscan should have size 1
    pscan.head.requiredSchema.fieldNames.toSet shouldBe
      Set("doc_id", "text", "source")
  }

  test("AQE splits a skewed sort-merge join partition without manual salting") {
    // the first-line 100 TB skew answer is AQE's runtime split (salting
    // below is the fallback for aggregates / pre-AQE engines): lower the
    // skew thresholds to fixture scale, force a shuffle join, and assert
    // the final adaptive plan actually marked and split the hot
    // partition — with results identical to the unskewed expectation.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // 60% of 40k padded rows share one key; the rest spread over 1k keys
      val left = spark.range(40000).select(
        when(col("id") % 10 < 6, 1L).otherwise(col("id") % 1000).as("k"),
        col("id").as("v"), lit("x" * 64).as("pad"))
      val right = spark.range(1000).select(col("id").as("k"), col("id").as("w"))
      val j = left.join(right, "k")
      // execute THIS frame (not a derived count plan) so AQE finalizes it
      j.collect().length shouldBe 40000 // every left row matches one dim row
      val plan = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      withClue(s"plan:\n$plan") { plan should include ("skew=true") }
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("salted join equals the plain join on a skewed key distribution") {
    import spark.implicits._
    // Hot-key distribution: 80% of rows share key 1.
    val rnd = new scala.util.Random(7)
    val large = (0 until 5000).map { i =>
      (i.toLong, if (rnd.nextDouble() < 0.8) 1L else (rnd.nextInt(20) + 2).toLong)
    }.toDF("row_id", "k")
    val small = (1 to 21).map(k => (k.toLong, s"dim$k")).toDF("k", "name")

    val plain = large.join(small, "k")
      .select("row_id", "k", "name").collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(large, small, "k", nSalts = 8,
      saltSource = col("row_id"))
      .select("row_id", "k", "name").collect().map(_.toString).sorted
    salted shouldBe plain

    // The salt actually spreads the hot key across partitions.
    val spread = large.withColumn("__salt",
      pmod(xxhash64(col("row_id")), lit(8)).cast("int"))
      .filter(col("k") === 1)
      .select("__salt").distinct().count()
    spread should be >= 6L
  }

  test("two-phase salted aggregation equals the direct groupBy on exact integers") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 4000).map { i =>
      (i.toLong, if (rnd.nextDouble() < 0.7) 1L else rnd.nextInt(10).toLong,
        rnd.nextInt(1000).toLong)
    }.toDF("row_id", "k", "v")
    val direct = rows.groupBy("k")
      .agg(sum("v").as("sum"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedSum(rows, "k", col("v"), nSalts = 16,
      saltSource = col("row_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    salted shouldBe direct
  }

  test("streaming file sink recovers from checkpoint without loss or duplicates") {
    import java.nio.file.{Files, Paths}
    // exactly-once file->file: run a checkpointed query over a growing
    // source dir, stop it mid-stream, restart with the SAME checkpoint,
    // and require final output == batch result over all input.
    val base = Files.createTempDirectory("ckpt_test").toString
    val srcDir = s"$base/src"; val outDir = s"$base/out"; val ck = s"$base/ck"
    Files.createDirectories(Paths.get(srcDir))
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "value")
    val chunks = ev.collect().grouped(400).toSeq
    def writeChunk(i: Int): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(chunks(i).toSeq, 1), ev.schema)
        .write.mode("append").parquet(srcDir)

    def startQuery() = spark.readStream.schema(ev.schema).parquet(srcDir)
      .withColumn("double_value", col("value") * 2)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ck)
      .start()

    writeChunk(0)
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()     // simulate shutdown
    writeChunk(1)
    writeChunk(2)
    val q2 = startQuery()                    // recover from checkpoint
    q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(outDir)
    got.count() shouldBe chunks.take(3).map(_.length).sum
    got.select("event_id").distinct().count() shouldBe got.count()
    val sumGot = got.agg(sum("double_value")).head().getDouble(0)
    val sumExp = spark.createDataFrame(
      spark.sparkContext.parallelize(chunks.take(3).flatten.toSeq, 2), ev.schema)
      .agg(sum(col("value") * 2)).head().getDouble(0)
    math.abs(sumGot - sumExp) should be < 1e-6
  }

  test("globalNtile matches the SQL ntile definition, plan Window-free") {
    import graft.operators.Rank
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // sizes exercising n % k == 0, n % k != 0, and n < k
    for ((n, k) <- Seq((100, 10), (103, 10), (7, 10), (1, 3))) {
      val df = (0 until n).map(i => ((i * 7919) % n, i)).toDF("key", "tie")
      val got = Rank.globalNtile(df, k, "key", "tie")
      val want = df.withColumn("ntile",
        ntile(k).over(Window.orderBy("key", "tie")).cast("long"))
      withClue(s"n=$n k=$k:") {
        got.except(want).count() shouldBe 0
        want.except(got).count() shouldBe 0
        got.queryExecution.executedPlan.toString should not include "Window"
      }
    }
  }

  test("withRowIndexAndCount stays in Tungsten and returns n for free") {
    import graft.operators.Rank
    import spark.implicits._
    val df = (0 until 257).map(i => ((i * 31) % 257, s"v$i")).toDF("key", "v")
    val (ranked, n) = Rank.withRowIndexAndCount(df, "key")
    n shouldBe 257
    // dense 0-based index in key order
    ranked.orderBy("idx").select("key").as[Int].collect() shouldBe
      (0 until 257).map(i => (i * 31) % 257).sorted
    ranked.agg(min("idx"), max("idx")).head() shouldBe
      org.apache.spark.sql.Row(0L, 256L)
    // the returned frame reads the already-numbered RDD — no re-scan of
    // the input, no external-Row round trip in the plan
    val plan = ranked.queryExecution.executedPlan.toString
    plan should include("ExistingRDD")
    plan should not include "LocalTableScan"
  }

  test("withRunningTotal equals the SQL running-sum window, Window-free") {
    import graft.operators.Rank
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // shuffled keys, varying values incl. zeros; repartition(7) forces
    // the offsets to stitch across many sort partitions
    val df = (0 until 311)
      .map(i => ((i * 7919) % 311, ((i * 13) % 5).toLong))
      .toDF("key", "v").repartition(7)
    val got = Rank.withRunningTotal(df, "v", "key")
    val want = df.withColumn("off",
      coalesce(sum("v").over(Window.orderBy("key")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    got.except(want).count() shouldBe 0
    want.except(got).count() shouldBe 0
    got.queryExecution.executedPlan.toString should not include "Window"
    // exclusive prefix: first row 0, and off + v of the last row = Σv
    val total = df.agg(sum("v")).head().getLong(0)
    got.orderBy(col("key").desc).select(col("off") + col("v"))
      .head().getLong(0) shouldBe total
  }

  test("q_pack_chunks: every chunk except the last is exactly full") {
    val byName = graft.operators.PipelineQueries.all
      .map(q => q.name -> q).toMap
    val got = byName("q_pack_chunks").fn(spark, sfDir).collect()
    got.init.foreach(_.getLong(2) shouldBe 512L)
    got.last.getLong(2) should be <= 512L
    // chunk ids are dense from 0
    got.map(_.getLong(0)).toSeq shouldBe got.indices.map(_.toLong)
  }

  test("packChunksLocal: exact per-partition reference pack, boundary cases") {
    import graft.operators.Rank
    import spark.implicits._
    // values exercise every boundary: multi-chunk docs (v > C), exact
    // fills, tiny docs; repartition(5) gives genuinely independent
    // partition streams
    val C = 16L
    val df = (0 until 113).map(i => (i.toLong, ((i * 37) % 45 + 1).toLong))
      .toDF("id", "v").repartition(5)
    val got = Rank.packChunksLocal(df, "v", C)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq
    // driver-side reference over the SAME per-partition streams
    val streams = df.rdd.mapPartitionsWithIndex((p, it) =>
      Iterator(p -> it.map(_.getLong(1)).toArray)).collect()
    val want = streams.toSeq.flatMap { case (p, vs) =>
      val out = scala.collection.mutable
        .ArrayBuffer.empty[(Int, Long, Long, Long)]
      var off = 0L; var chunk = 0L; var docs = 0L; var tok = 0L
      vs.foreach { v =>
        var rem = v
        while (rem > 0) {
          val take = math.min(rem, (chunk + 1) * C - off)
          docs += 1; tok += take; off += take; rem -= take
          if (off == (chunk + 1) * C) {
            out += ((p, chunk, docs, tok)); chunk += 1; docs = 0; tok = 0
          }
        }
      }
      if (tok > 0) out += ((p, chunk, docs, tok))
      out
    }.sortBy(t => (t._1, t._2))
    got shouldBe want
    // token conservation against the raw input
    got.map(_._4).sum shouldBe df.agg(sum("v")).head().getLong(0)
  }

  test("q_pack_chunks_local: conserves tokens vs global form; zero shuffle") {
    val byName = graft.operators.PipelineQueries.all
      .map(q => q.name -> q).toMap
    val localRows = byName("q_pack_chunks_local").fn(spark, sfDir).collect()
    val globalRows = byName("q_pack_chunks").fn(spark, sfDir).collect()
    // token conservation: both pack the identical token stream
    localRows.map(_.getLong(3)).sum shouldBe globalRows.map(_.getLong(2)).sum
    // per partition: all but the last chunk exactly full, ids dense from 0
    localRows.groupBy(_.getInt(0)).values.foreach { part =>
      val sorted = part.sortBy(_.getLong(1))
      sorted.init.foreach(_.getLong(3) shouldBe 512L)
      sorted.last.getLong(3) should be <= 512L
      sorted.map(_.getLong(1)).toSeq shouldBe sorted.indices.map(_.toLong)
    }
    // linear by construction: the OPERATOR (before the declared query's
    // small profile sort) plans no Exchange of any kind — the global
    // form's distributed sort is exactly what this variant removes
    val wc = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        org.apache.spark.sql.functions
          .size(graft.functions.TextFns.tokenArr(col("text")))
          .cast("long").as("ntok"))
      .filter(col("ntok") > 0)
    val opPlan = graft.operators.Rank.packChunksLocal(wc, "ntok", 512L)
      .queryExecution.executedPlan.toString
    withClue(s"plan:\n$opPlan") { opPlan should not include "Exchange" }
  }

  test("q_mix_temperature flattens the source distribution toward uniform") {
    import spark.implicits._
    val byName = graft.operators.PipelineQueries.all
      .map(q => q.name -> q).toMap
    val sel = byName("q_mix_temperature").fn(spark, sfDir)
    val docs = graft.Tables.documents(spark, sfDir)
    // roughly half the corpus survives (rate ≈ 0.5 per source at α=0.5)
    val frac = sel.count().toDouble / docs.count()
    frac should (be > 0.3 and be < 0.7)
    // token-light sources keep a HIGHER doc fraction than token-heavy
    // ones: that is what temperature flattening means
    val kept = docs.groupBy("source").count()
      .join(sel.groupBy("source").count()
        .withColumnRenamed("count", "k"), "source")
      .select(col("source"), (col("k") / col("count")).as("frac"))
      .as[(String, Double)].collect()
    kept.map(_._2).max should be > kept.map(_._2).min
  }

  test("q_ntile plan contains no single-partition Window") {
    val byName = graft.operators.Relational.all.map(q => q.name -> q).toMap
    val plan = byName("q_ntile").fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    plan should not include "Window"
  }

  test("no declared query carries an interpreted higher-order function " +
      "outside the documented allowlist") {
    // Higher-order functions (ArrayFilter/ArrayTransform/ArrayAggregate)
    // evaluate interpreted — each one in a corpus/embedding scan is a
    // per-element lambda invocation charged to EVERY consumer of that
    // scan. The round-10 kernels (ArrayExprs.shingles, TextFns.tokenArr's
    // array_remove, toDoubleArray's whole-array Cast, the bm25
    // array_remove counting identity, greatest(max,−min) abs-max) exist
    // to keep the hot chains codegen'd; a HOF shows up in the physical
    // plan as `lambdafunction(...)`, so this enumerates ALL declared
    // queries and pins its absence everywhere but the four sites where
    // the lambda is justified and NOT on a scan hot path:
    //  - q_dedup_embed_hi: the synthetic twin fixture's indexed jitter
    //    (no native indexed transform; O(n·64) vs the deliberate O(n²·64)
    //    brute baseline it feeds)
    //  - q_edit_distance: deletion variants over the collapsed DISTINCT
    //    names frame (~10⁴ rows by design, not the table scan)
    //  - q_embed_quantize / q_embed_pca: per-row scale/quantize lambdas
    //    closing over sibling columns (inexpressible natively; one cheap
    //    pass over the 64-dim embeddings table, ≤0.5 s at sf0.1)
    val allowed = Set("q_dedup_embed_hi", "q_edit_distance",
      "q_embed_quantize", "q_embed_pca")
    val shingled = graft.functions.TextFns.shinglesOf(
      Tables.documents(spark, sfDir))
    withClue("shinglesOf plan:") {
      shingled.queryExecution.executedPlan.toString should
        not include "lambdafunction"
    }
    val offenders = SparkEntry.queries.collect {
      case (n, fn) if !allowed(n) &&
        fn(spark, sfDir).queryExecution.executedPlan.toString
          .contains("lambdafunction") => n
    }
    withClue("queries with an undeclared interpreted HOF:") {
      offenders.toSeq.sorted shouldBe empty
    }
  }

  test("partitioned parquet write enables partition pruning on read") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("part_tbl").toString + "/li"
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_returnflag", "l_quantity")
      .write.partitionBy("l_returnflag").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("l_returnflag") === "R")
    val plan = pruned.queryExecution.executedPlan.toString
    // the predicate must land in PartitionFilters (directory pruning),
    // not in the row-level data filters
    withClue(plan) {
      plan should include regex "PartitionFilters: \\[.*l_returnflag.*\\]"
    }
    pruned.count() shouldBe Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R").count()
  }
}
