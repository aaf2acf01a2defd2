package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** The whole 60-bit SimHash signature of a token array in ONE per-row
  * pass: `graft_simhash(array<string>) -> bigint`.
  *
  * Bit-exact replica of q53's SQL formulation (pinned by DedupSpec):
  * token hash h = the first 15 hex chars of md5(token) parsed base-16
  * (exactly `CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)`,
  * and exactly what the DuckDB oracle's strpos fold computes), token
  * weight w = multiplicity of h within the document, bit i of the
  * signature = 1 iff Σ over distinct h of (±w by bit i of h) > 0.
  *
  * Why an expression: the SQL formulation explodes every token into a
  * corpus-wide (doc, h) groupBy with 60 sum columns and a second
  * groupBy to assemble bits — two shuffles carrying every token. The
  * per-document computation needs neither: signature assembly is local
  * to the row, so q53 becomes a pure map over the corpus scan and its
  * only shuffle is the pigeonhole chunk join on scalar keys.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires an array<string> argument, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.SimHashExpr.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {
  val Bits = 60 // 15 md5 hex chars; fits a signed 64-bit long

  /** Shared by interpreted eval and generated code. MessageDigest is not
    * thread-safe — one instance per thread.
    */
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    // h -> multiplicity (matches the SQL GROUP BY doc_id, h with COUNT(*)).
    val counts = new java.util.HashMap[Long, Int]()
    val digest = md5.get()
    var i = 0
    while (i < n) {
      val bytes = toks.getUTF8String(i).getBytes
      digest.reset()
      val d = digest.digest(bytes)
      // First 15 hex chars = the high 7.5 bytes, big-endian nibbles —
      // identical to parsing substring(md5, 1, 15) base 16.
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = (h << 4) | ((d(7) & 0xf0L) >> 4)
      counts.merge(h, 1, Integer.sum _)
      i += 1
    }
    val sums = new Array[Long](Bits)
    counts.forEach { (h, w) =>
      var j = 0
      while (j < Bits) {
        if (((h >> j) & 1L) == 1L) sums(j) += w else sums(j) -= w
        j += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < Bits) { if (sums(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }
}
