package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The whole 64-bit average-hash media fingerprint in ONE per-row pass:
  * `graft_ahash(string) -> bigint`, cell c of q114's aHash at bit
  * (63 - c), so band b (0..3) is `shiftrightunsigned(sig, 48 - 16*b) &
  * 65535` — bit-for-bit the packed 16-bit band values of the SQL
  * formulation.
  *
  * Bit-exact replica of q114's math (and the DuckDB oracle's): "pixel"
  * pos (0-based, in CODE POINTS — Spark's `split(text,'')`/`ascii` and
  * DuckDB's `ord` both see code points) lands in cell pos·64 DIV len;
  * cell bit = cell_sum·total_len > total_sum·cell_len, cross-multiplied
  * in exact integers so no floating-point mean ever exists.
  *
  * Why an expression: the SQL formulation explodes every character into
  * a corpus-wide (doc, cell) groupBy — the hash machinery touches every
  * character even though the aggregation is map-side. Per-row the
  * fingerprint is one tight loop over the string's bytes; q114's only
  * remaining shuffle is the band-bucket candidate join on scalar keys,
  * exactly the q52/q53 fused-kernel posture.
  */
case class AHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ahash requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ahash"

  override protected def nullSafeEval(input: Any): Any =
    AHashExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.AHashExpr.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): AHashExpr =
    copy(child = newChild)
}

object AHashExpr {
  /** Shared by interpreted eval and generated code. Iterates code points
    * (surrogate pairs count once, matching `length()`/`ord`); the
    * cross-multiplied threshold stays in Long range for any realistic
    * document (cs·len ≤ 0x10FFFF·len² — safe beyond 10⁶-char docs).
    */
  def compute(text: UTF8String): Long = {
    val s = text.toString
    val len = s.codePointCount(0, s.length).toLong
    if (len == 0L) return 0L
    val cs = new Array[Long](64)
    val cl = new Array[Long](64)
    var ts = 0L
    var idx = 0
    var pos = 0L
    while (idx < s.length) {
      val cp = s.codePointAt(idx)
      val cell = ((pos * 64L) / len).toInt
      cs(cell) += cp
      cl(cell) += 1L
      ts += cp
      idx += Character.charCount(cp)
      pos += 1L
    }
    var sig = 0L
    var c = 0
    while (c < 64) {
      if (cs(c) * len > ts * cl(c)) sig |= 1L << (63 - c)
      c += 1
    }
    sig
  }
}
