package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnOps
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for the hot kernel of the similarity layer:
  * ARRAY<DOUBLE> dot product.
  *
  * The composed built-in form `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * is evaluated interpreted (higher-order functions don't participate in
  * whole-stage codegen) and allocates an intermediate array per row-pair —
  * at sf0.1 the all-pairs dedup query spends 77 of 136 bench seconds
  * there. This expression generates a bare Java loop over the two
  * `ArrayData` buffers (no allocation, stays inside WholeStageCodegen),
  * with an identical left-to-right summation order, so results are
  * bit-equal to the HOF form and the DuckDB oracle is untouched.
  * Preference order per SURVEY §2.8 X16: built-ins → native Expression
  * (this) → UDF (never).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // (return type inferred: sql.types.AbstractDataType is private[sql])
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  // null on length mismatch or null element (matching zip_with/aggregate,
  // which null-pads mismatched arrays), not just on null inputs
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(newLeft, newRight)
}

/** Sorted-set intersection over two ascending ARRAY<LONG> columns — the
  * hot kernel of edge-iterator triangle counting (operators/Graph.scala):
  * per oriented edge (u, v), the closing vertices are adj(u) ∩ adj(v).
  *
  * The built-in `array_intersect` builds a hash set per invocation
  * (allocation + hashing on every edge row); the adjacency lists are
  * already sorted, so a bare two-pointer merge walk is both allocation-
  * light (one primitive buffer, no boxing) and branch-predictable, and it
  * stays inside WholeStageCodegen. Inputs MUST be ascending-sorted and
  * duplicate-free (collect_list + sort_array over distinct edges); output
  * order is ascending. Null elements are skipped (none occur in the
  * triangle pipeline — adjacency arrays aggregate a non-null column).
  */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_sorted_intersect"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n1 = x.numElements()
    val n2 = y.numElements()
    val buf = new Array[Long](math.min(n1, n2))
    var i = 0; var j = 0; var k = 0
    while (i < n1 && j < n2) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val av = x.getLong(i); val bv = y.getLong(j)
        if (av < bv) i += 1
        else if (av > bv) j += 1
        else { buf(k) = av; k += 1; i += 1; j += 1 }
      }
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(buf, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k"); val buf = ctx.freshName("buf")
      val av = ctx.freshName("av"); val bv = ctx.freshName("bv")
      s"""
         |int $n1 = $x.numElements();
         |int $n2 = $y.numElements();
         |long[] $buf = new long[Math.min($n1, $n2)];
         |int $i = 0, $j = 0, $k = 0;
         |while ($i < $n1 && $j < $n2) {
         |  if ($x.isNullAt($i)) { $i++; }
         |  else if ($y.isNullAt($j)) { $j++; }
         |  else {
         |    long $av = $x.getLong($i);
         |    long $bv = $y.getLong($j);
         |    if ($av < $bv) { $i++; }
         |    else if ($av > $bv) { $j++; }
         |    else { $buf[$k++] = $av; $i++; $j++; }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($buf, $k));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersect = copy(newLeft, newRight)
}

object ArrayExprs {
  /** Column-level dot product over two ARRAY<DOUBLE> columns. */
  def dot(a: Column, b: Column): Column =
    ColumnOps.column(DotProduct(ColumnOps.expression(a),
      ColumnOps.expression(b)))

  /** Ascending-sorted ARRAY<LONG> intersection (two-pointer merge). */
  def sortedIntersect(a: Column, b: Column): Column =
    ColumnOps.column(SortedIntersect(ColumnOps.expression(a),
      ColumnOps.expression(b)))
}
