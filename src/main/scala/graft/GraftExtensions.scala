package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.VectorExpressions

/** Library packaging hook: installs graft's custom expressions into any
  * session via the standard extension point —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * so `SELECT graft_dot(a, b)` works from pure SQL with no per-query
  * registration. The imperative `VectorExpressions.register(spark)` path
  * stays for sessions the library doesn't own (e.g. the driver harness
  * builds the SparkSession itself). Both paths iterate the SAME
  * [[VectorExpressions.builders]] list — one source of truth for names,
  * arity checking, and builder logic, so the two surfaces cannot drift
  * (the round-4 review found this hook had fallen to 2 of 6 functions and
  * silently dropped extra arguments the imperative path rejects).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    VectorExpressions.builders.foreach { case (name, className, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(className, name),
        builder))
    }
}
