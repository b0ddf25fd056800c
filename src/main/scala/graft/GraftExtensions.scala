package graft

import graft.functions.DotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistryBase
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension entry point (SURVEY §2.8 X16): registers the native
  * expressions with Catalyst so they are usable from SQL text, not just
  * the Column API. Install either programmatically
  * (`SparkSession.builder.withExtensions(new GraftExtensions)`) or via
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * No custom Rule/Strategy is injected — SURVEY §4 concluded Catalyst's
  * built-ins cover every rewrite the reference's optimizer performs; the
  * extension surface is deliberately limited to expressions until a
  * profiled need appears.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.dotFunction)
}

object GraftExtensions {
  private lazy val dotFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = {
    val (info, builder) = FunctionRegistryBase.build[DotProduct]("graft_dot",
      since = None)
    (FunctionIdentifier("graft_dot"), info, builder)
  }

  /** Register on an already-running session (extensions passed at build
    * time only apply to fresh contexts; this covers notebooks/tests that
    * join an existing one). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (id, info, builder) = dotFunction
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
