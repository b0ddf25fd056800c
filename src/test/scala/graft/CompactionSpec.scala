package graft

import java.nio.file.Files

import graft.sources.Compact
import org.apache.spark.sql.functions._

/** Small-file compaction: fewer files, identical data. */
class CompactionSpec extends SparkSpec {

  test("compaction collapses a small-file directory and preserves the data") {
    val base = Files.createTempDirectory("compact").toString
    val in = s"$base/in"
    val out = s"$base/out"
    // simulate an over-parallel writer: 50 tiny files
    val ev = Tables.events(spark, sfDir)
    ev.repartition(50).write.parquet(in)
    val (files0, bytes0) = Compact.dirStats(spark, in)
    files0 shouldBe 50L

    // target sized to merge everything into a handful of files
    val stats = Compact.compact(spark, in, out, targetBytes = bytes0 / 3 + 1)
    stats.inFiles shouldBe 50L
    stats.outFiles should be <= 4L
    stats.outFiles should be >= 1L

    // identical row multiset (events has a unique event_id — compare sets
    // plus per-row payload)
    val got = spark.read.parquet(out)
    got.count() shouldBe ev.count()
    got.select("event_id").distinct().count() shouldBe ev.count()
    got.agg(sum(round(col("value") * 100).cast("long"))).head().getLong(0) shouldBe
      ev.agg(sum(round(col("value") * 100).cast("long"))).head().getLong(0)
    got.schema shouldBe spark.read.parquet(in).schema
  }

  test("compaction of an already-large-file directory is a near no-op") {
    val base = Files.createTempDirectory("compact2").toString
    val in = s"$base/in"
    val out = s"$base/out"
    Tables.events(spark, sfDir).coalesce(1).write.parquet(in)
    val stats = Compact.compact(spark, in, out, targetBytes = 128L << 20)
    stats.outFiles shouldBe 1L
  }
}
