package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnOps
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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

/** ARRAY<STRING> → ARRAY<STRING> of space-joined k-grams — the hot
  * kernel of the shingle family (TextFns.shinglesOf feeds the n-gram
  * dedup, minhash/simhash, CM/HLL/histogram sketch, and heavy-hitter
  * operators).
  *
  * The composed built-in form
  * `transform(sequence(1, n-k+1), i -> concat_ws(" ", element_at…))`
  * runs INTERPRETED (higher-order functions don't participate in
  * whole-stage codegen) and pays a lambda-variable rebind plus k boxed
  * element_at calls per output gram — measured 2.7 s of a 4.4 s
  * q_heavy_hitters at sf1, charged to every shingle consumer. This
  * expression emits the same grams from one bare loop over the token
  * array. Semantics match the HOF form exactly: fewer than k tokens →
  * null (explode then emits nothing), null elements are skipped by the
  * separator join (concat_ws semantics, which UTF8String.concatWs
  * implements) — token arrays are null-free in practice (split +
  * length filter). DuckDB oracles are untouched: grams are
  * byte-identical strings.
  */
case class Shingles(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, s"shingle width must be >= 1, got $k")

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  // null when the doc has fewer than k tokens (matching the HOF form)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val m = x.numElements() - k + 1
    if (m < 1) return null
    val sep = UTF8String.fromString(" ")
    val out = new Array[AnyRef](m)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < k) {
        parts(j) = if (x.isNullAt(i + j)) null else x.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sep = ctx.addReferenceObj("sep",
      UTF8String.fromString(" "), "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, x => {
      val m = ctx.freshName("m"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      s"""
         |int $m = $x.numElements() - ${k - 1};
         |if ($m < 1) {
         |  ${ev.isNull} = true;
         |} else {
         |  Object[] $out = new Object[$m];
         |  $utf8[] $parts = new $utf8[$k];
         |  for (int $i = 0; $i < $m; $i++) {
         |    for (int $j = 0; $j < $k; $j++) {
         |      $parts[$j] = $x.isNullAt($i + $j) ? null : $x.getUTF8String($i + $j);
         |    }
         |    $out[$i] = $utf8.concatWs($sep, $parts);
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** Occurrence count of a value in an ARRAY<STRING> column — the per-term
  * tf kernel of BM25 scoring (TextQueries.qBm25: one count per query
  * term per document, straight off the shared token array).
  *
  * The HOF form `size(filter(a, x -> x = t))` runs interpreted; the
  * codegen'd identity `size(a) − size(array_remove(a, t))` fixes that
  * but COPIES the whole token array per term per row just to take the
  * copy's length — measured 2.67 → 3.62 s on q_bm25 at sf1, i.e. the
  * allocation cost exceeded the interpretation cost it removed. This
  * expression is the form both approximate: one bare comparison loop,
  * zero allocation, inside WholeStageCodegen. Null elements count as
  * non-matching (token arrays are null-free in practice); null array or
  * null needle → null (both composed forms agree).
  */
case class CountValue(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType), StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_count_eq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val t = b.asInstanceOf[UTF8String]
    val n = x.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && t.equals(x.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, t) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = $x.numElements();
         |long $c = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && $t.equals($x.getUTF8String($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CountValue = copy(newLeft, newRight)
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

  /** Space-joined k-grams of an ARRAY<STRING> token column. */
  def shingles(a: Column, k: Int): Column =
    ColumnOps.column(Shingles(ColumnOps.expression(a), k))

  /** Occurrence count of `v` in an ARRAY<STRING> column (zero-alloc). */
  def countEq(a: Column, v: Column): Column =
    ColumnOps.column(CountValue(ColumnOps.expression(a),
      ColumnOps.expression(v)))
}
