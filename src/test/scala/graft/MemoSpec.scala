package graft

import org.apache.spark.sql.functions._

/** Lifecycle contract of the cross-query memo: build-once, pinned
  * against the harness's per-query Cleanup, freed on release. */
class MemoSpec extends SparkSpec {

  test("memo builds once, survives Cleanup via its pin, and frees on release") {
    Memo.clear(); Cleanup(spark)
    var builds = 0
    def frame() = Memo(spark, "memospec.frame") {
      builds += 1
      spark.range(1000).select(col("id"), (col("id") * 2).as("v"))
        .localCheckpoint(true)
    }
    val a = frame()
    builds shouldBe 1
    val pinned = Memo.pinnedRddIds(spark)
    pinned should not be empty
    pinned.foreach(id =>
      spark.sparkContext.getPersistentRDDs.keySet should contain(id))
    // the per-query sweep must NOT free the pinned blocks...
    Cleanup(spark)
    pinned.foreach(id =>
      spark.sparkContext.getPersistentRDDs.keySet should contain(id))
    // ...and the memo hands back the same value without rebuilding
    (frame() eq a) shouldBe true
    builds shouldBe 1
    a.count() shouldBe 1000
    // release frees the blocks and forgets the entry: next call rebuilds
    Memo.release(spark)
    Memo.pinnedRddIds(spark) shouldBe empty
    frame()
    builds shouldBe 2
    Memo.release(spark)
  }
}
