package graftusage

import org.apache.spark.sql.functions._

/** Executable form of USAGE.md: every example in the guide, run through
  * the PUBLIC API from OUTSIDE package graft — this package exists so a
  * `private[graft]` regression on a documented entry point fails the
  * suite at compile time instead of breaking a user. Semantics are
  * pinned elsewhere (DedupSpec, GraphFixpointSpec, StreamingSpec, …);
  * here the assertions are sanity-level, the COMPILATION against the
  * documented signatures is the test.
  */
class UsageSpec extends graft.SparkSpec {

  test("USAGE: dedup chain — jaccardPairs -> connectedComponents -> resolve") {
    val docs = graft.Tables.documents(spark, sfDir)
    val pairs = graft.operators.PipelineQueries.jaccardPairs(docs)
      .filter(col("jaccard") >= 0.3)
      .select(col("a_id").as("a"), col("b_id").as("b"))
      .localCheckpoint(true)
    val comps = graft.operators.Dedup.connectedComponents(pairs)
    comps.columns.toSeq should contain allOf ("node", "comp")
    val verdict = graft.operators.Dedup.resolve(docs.select("doc_id"), pairs)
    verdict.count() shouldBe docs.count()
    graft.Cleanup(spark)
  }

  test("USAGE: embedding near-dup auto-dispatch at tau = 0.9") {
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        graft.functions.TextFns.toDoubleArray(col("embedding")).as("vec"))
    val n = vecs.count()
    val nd = graft.operators.PipelineQueries.embedNearDup(spark, vecs, n,
      tau = 0.9)
    nd.columns.toSeq should contain allOf ("a_id", "b_id", "cos")
    nd.count() should be >= 0L
    graft.Cleanup(spark)
  }

  test("USAGE: graph fixpoints on explicit frames") {
    import spark.implicits._
    // undirected triangle 1-2-3 plus a pendant 4 off node 1
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val (pr, rounds) = graft.operators.Graph.pagerankFixpoint(
      e, deg, n = 4L, eps = 1e-9, maxRounds = 50)
    rounds should be <= 50
    math.abs(pr.agg(sum("pr")).head.getDouble(0) - 1.0) should be < 1e-6
    val (ppr, _) = graft.operators.Graph.pprFixpoint(e, deg, n = 4L,
      reset = when(col("node") === 1L, lit(1.0)).otherwise(lit(0.0)),
      eps = 1e-9, maxRounds = 50)
    ppr.count() shouldBe 4L

    val onceEdges = und.toDF("s", "t")
    val (core, _) = graft.operators.Graph.kCoreFixpoint(onceEdges, k = 2)
    // the triangle is the 2-core; the pendant peels off
    core.select("node").as[Long].collect().sorted shouldBe Array(1L, 2L, 3L)

    val sym = (und ++ und.map(_.swap)).toDF("s", "t")
    val hops = graft.operators.Graph.bfsHops(sym,
      Seq(4L).toDF("n"), rounds = 3)
    hops.count() shouldBe 4L // whole graph reachable from the pendant

    val weighted = sym.withColumn("w", lit(1L))
    val (labels, lpaRounds) =
      graft.operators.Graph.labelPropagationFixpoint(weighted)
    labels.count() shouldBe 4L
    lpaRounds should be <= 32
    graft.Cleanup(spark)
  }

  test("USAGE: as-of join and salted join") {
    import spark.implicits._
    // plain as-of accepts any ordered ts; the staleness variant
    // subtracts an INTERVAL, so ts must be a TIMESTAMP there
    val trades = Seq((1L, 100L, 9.0), (1L, 250L, 11.0))
      .toDF("k", "s", "px")
      .select(col("k"), timestamp_seconds(col("s")).as("ts"), col("px"))
    val quotes = Seq((1L, 90L, 1.0), (1L, 240L, 2.0))
      .toDF("k", "s", "bid")
      .select(col("k"), timestamp_seconds(col("s")).as("ts"), col("bid"))
    val asof = graft.operators.AsOf.asofJoin(trades, quotes, key = "k")
    asof.count() shouldBe 2L
    val tol = graft.operators.AsOf.asofJoin(trades, quotes, "k",
      maxStalenessSeconds = Some(3600))
    tol.count() shouldBe 2L

    val big = spark.range(1000)
      .select((col("id") % 3).as("k"), col("id").as("row_id"))
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "name")
    val salted = graft.operators.Skew.saltedJoin(big, dim, key = "k",
      nSalts = 8, saltSource = col("row_id"))
    salted.count() shouldBe big.join(dim, "k").count()
    graft.Cleanup(spark)
  }

  test("USAGE: native array expressions and batch streaming twins") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0),
      Seq("a", "b", "a"))).toDF("x", "y", "toks")
    val r = df.select(
      graft.functions.ArrayExprs.dot(col("x"), col("y")).as("d"),
      graft.functions.ArrayExprs.countEq(col("toks"), lit("a")).as("c"),
      graft.functions.ArrayExprs.shingles(col("toks"), 2).as("sh"))
      .head
    r.getDouble(0) shouldBe 11.0
    r.getLong(1) shouldBe 2L
    r.getSeq[String](2) shouldBe Seq("a b", "b a")

    val hourly = graft.streaming.EventStreams.tumbling(
      graft.Tables.events(spark, sfDir))
    hourly.count() should be > 0L
    graft.Cleanup(spark)
  }
}
