package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnOps
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

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

object ArrayExprs {
  /** Column-level dot product over two ARRAY<DOUBLE> columns. */
  def dot(a: Column, b: Column): Column =
    ColumnOps.column(DotProduct(ColumnOps.expression(a),
      ColumnOps.expression(b)))
}
