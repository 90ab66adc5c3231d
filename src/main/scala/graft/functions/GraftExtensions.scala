package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point registering graft's native
  * expressions for SQL use:
  *
  * {{{
  * spark.sql.extensions=graft.functions.GraftExtensions
  * ...
  * SELECT fixdot(embedding, embedding) FROM embeddings
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fixdot"),
      new ExpressionInfo(classOf[FixedPointDot].getName, "fixdot"),
      (exprs: Seq[Expression]) => FixedPointDot(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => MicrosTruncationPushdown)
  }
}
