package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** q123's whole character-entropy computation in ONE per-row pass:
  * `graft_char_entropy(string) -> struct<n_distinct_chars: bigint,
  * ent_micro: bigint>`.
  *
  * Why an expression (VERDICT r5 item 4): the SQL formulation explodes
  * one row per CHARACTER before its (doc, ch) partial aggregate — correct
  * and map-side-combined, but the explode machinery touches every
  * character of the corpus through a generator + two aggregate passes +
  * a join. Per row the histogram is a tight code-point loop over the
  * string (the [[AHashExpr]] pattern that bought q114 1.7×), after which
  * q123's plan is scan → project → sort: ZERO data shuffles.
  *
  * Bit-exactness with the DuckDB oracle is char-by-char identical to the
  * SQL version it replaces: each distinct char contributes
  * round(p·ln p·1e6) ONCE as a BIGINT micro-nat — p in double division,
  * `Math.log` (what Spark's `log` lowers to), and HALF_UP decimal
  * rounding via BigDecimal.valueOf (what Spark's `round` lowers to for
  * doubles) — and the per-doc sum of longs is order-independent, so map
  * iteration order can't leak into the result.
  *
  * Code points, not UTF-16 units: surrogate pairs count once, matching
  * `split(text, '')`/DuckDB `string_split_regex` semantics (the
  * [[AHashExpr]] precedent).
  */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_entropy requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_distinct_chars", LongType, nullable = false),
    StructField("ent_micro", LongType, nullable = false)))
  override def prettyName: String = "graft_char_entropy"

  override protected def nullSafeEval(input: Any): Any =
    CharEntropyExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CharEntropyExpr.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}

object CharEntropyExpr {
  /** Shared by interpreted eval and generated code. Alphabet-bounded
    * state (one map entry per distinct code point in THIS row); the
    * caller drops zero-length texts to preserve the SQL formulation's
    * "no chars → no row" semantics.
    */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var idx = 0
    var len = 0L
    while (idx < s.length) {
      val cp = s.codePointAt(idx)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1L
      idx += Character.charCount(cp)
      len += 1L
    }
    var ent = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      val p = c.toDouble / len.toDouble
      val term = p * Math.log(p) * 1e6
      // Spark round() for doubles: BigDecimal.valueOf → HALF_UP (away
      // from zero on negatives, where Math.round would round toward +∞).
      ent -= java.math.BigDecimal.valueOf(term)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    }
    new GenericInternalRow(Array[Any](counts.size.toLong, ent))
  }
}
