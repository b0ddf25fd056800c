package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnOps
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded distinct posting-list aggregate: collects up to `cap` DISTINCT
  * long values per group; a group that exceeds the cap evaluates to NULL
  * (and its buffer is dropped immediately, not grown).
  *
  * This is the one-exchange form of the rare-shingle inverted-list build
  * (dedup candidate generation): the composed plan —
  * `distinct → groupBy(sh).count → df≤τ anti-join → collect_list` —
  * needs two full shuffles of the (doc, shingle) stream plus the hot-set
  * aggregate before any list exists, and its correctness-critical
  * property (every collect_list buffer bounded by τ) is an ORDERING
  * argument about the plan. Here the bound is structural: no buffer —
  * map-side partial, shuffle block, or final merge — ever holds more
  * than cap+1 ids, boilerplate shingles (the million-doc posting lists
  * that kill shingle dedup at corpus scale) collapse to a 1-byte
  * overflow marker the moment they cross the cap, and the shingle
  * stream is shuffled exactly once. Distinctness is the set semantics
  * of the buffer itself, so the upstream `.distinct()` disappears too.
  *
  * Result lists are sorted ascending — deterministic regardless of
  * partitioning or merge order.
  */
case class BoundedPostingList(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedPostingList.Buffer]
  with UnaryLike[Expression] {

  require(cap > 0, s"BoundedPostingList cap must be positive, got $cap")

  override def createAggregationBuffer(): BoundedPostingList.Buffer =
    new BoundedPostingList.Buffer(false, mutable.HashSet.empty[Long])

  override def update(b: BoundedPostingList.Buffer,
      input: InternalRow): BoundedPostingList.Buffer = {
    if (!b.overflow) {
      val v = child.eval(input)
      if (v != null) {
        b.ids += v.asInstanceOf[Long]
        if (b.ids.size > cap) { b.overflow = true; b.ids.clear() }
      }
    }
    b
  }

  override def merge(b: BoundedPostingList.Buffer,
      o: BoundedPostingList.Buffer): BoundedPostingList.Buffer = {
    if (b.overflow || o.overflow) { b.overflow = true; b.ids.clear() }
    else {
      b.ids ++= o.ids
      if (b.ids.size > cap) { b.overflow = true; b.ids.clear() }
    }
    b
  }

  override def eval(b: BoundedPostingList.Buffer): Any =
    if (b.overflow) null
    else new GenericArrayData(b.ids.toArray.sorted)

  override def serialize(b: BoundedPostingList.Buffer): Array[Byte] = {
    if (b.overflow) Array[Byte](1)
    else {
      val out = ByteBuffer.allocate(1 + 4 + 8 * b.ids.size)
      out.put(0: Byte).putInt(b.ids.size)
      b.ids.foreach(out.putLong)
      out.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): BoundedPostingList.Buffer = {
    val in = ByteBuffer.wrap(bytes)
    if (in.get() != 0) new BoundedPostingList.Buffer(true, mutable.HashSet.empty)
    else {
      val n = in.getInt()
      val ids = mutable.HashSet.empty[Long]
      var i = 0
      while (i < n) { ids += in.getLong(); i += 1 }
      new BoundedPostingList.Buffer(false, ids)
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bounded_postings"

  override def withNewMutableAggBufferOffset(o: Int): BoundedPostingList =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedPostingList =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BoundedPostingList =
    copy(child = c)
}

object BoundedPostingList {
  final class Buffer(var overflow: Boolean, val ids: mutable.HashSet[Long])

  /** Posting list of ≤ cap distinct `id`s per group, NULL beyond cap. */
  def postingsUpTo(id: Column, cap: Int): Column =
    ColumnOps.column(
      BoundedPostingList(ColumnOps.expression(id), cap).toAggregateExpression())
}
