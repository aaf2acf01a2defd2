package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProductExpr, LshBucketsExpr, MinHashBandsExpr, MinHashSigExpr, ShingleHashesExpr, SimHashExpr}

/** Library packaging hook: installs graft's custom expressions into any
  * session via the standard extension point —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * so `SELECT graft_dot(a, b)` works from pure SQL with no per-query
  * registration. The imperative `VectorExpressions.register(spark)` path
  * stays for sessions the library doesn't own (e.g. the driver harness
  * builds the SparkSession itself).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProductExpr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_lsh_buckets"),
      new ExpressionInfo(classOf[LshBucketsExpr].getName, "graft_lsh_buckets"),
      (children: Seq[Expression]) => LshBucketsExpr(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash_sig"),
      (children: Seq[Expression]) => MinHashSigExpr(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashesExpr].getName, "graft_shingle_hashes"),
      (children: Seq[Expression]) => ShingleHashesExpr(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinHashBandsExpr].getName, "graft_minhash_bands"),
      (children: Seq[Expression]) => MinHashBandsExpr(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHashExpr(children(0))))
  }
}
