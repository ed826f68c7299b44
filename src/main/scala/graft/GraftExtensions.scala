package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.GraftFunctions

/** Spark extensions entry point: registers every `graft_*` native
  * kernel as a built-in at session construction, so a cluster deploys
  * the library with
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *
  * and every session (including ones the consuming job builds itself)
  * can call the kernels from SQL with no per-session registration
  * call. Same builders as [[graft.functions.GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
}
