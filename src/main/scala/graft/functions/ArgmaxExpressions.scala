package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._

/** r13 optimization: hand-evaluated argmax/top-k expressions over a
  * broadcast candidate list — the per-row decisions the PQ/IVF family
  * previously computed by exploding (row, candidate) pairs and folding
  * them back through corpus-scale SortAggregate pairs (struct-ordered
  * `max_by`/`max` are not hash-aggregable) or ranking windows.
  *
  * Why custom expressions and not SQL higher-order functions: the HOF
  * formulation (`aggregate(transform(...))`) was tried first and
  * measured 2–3.5× SLOWER than the aggregation towers it replaced —
  * Catalyst evaluates HOF lambdas interpreted, allocating per element
  * (probes/r13opt, OPTIMIZATION_r13.md "dead end" section). These
  * expressions do the identical folds as tight loops over zero-copy
  * `ArrayData` views. They are `CodegenFallback` by design: the hot
  * call sites sit inside `transform(sequence(0, M-1), mm -> ...)`
  * lambdas where everything evaluates interpreted anyway, and the eval
  * itself is allocation-free.
  *
  * ORDERING PARITY (the invariant every oracle hash rides on): all
  * three expressions reproduce the aggregation orderings exactly —
  * doubles compare with the same `>` / `==` the struct orderings used
  * (no NaNs reach them: scores are finite dots of finite embeddings),
  * and ties break by the explicit integer comparison, so results are
  * independent of candidate enumeration order.
  */
object ArgmaxExpressions {

  /** Ascending-index dot fold — identical to [[DotProductExpr]]'s and to
    * the `aggregate(zip_with(...))`/DuckDB `list_reduce` folds, so
    * scores are bit-identical to every formulation the oracles pin.
    */
  private[functions] def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  private[functions] def candsTypeOk(dt: DataType): Boolean = dt match {
    case ArrayType(StructType(fields), _) if fields.length == 2 =>
      fields(0).dataType == IntegerType &&
        (fields(1).dataType == ArrayType(DoubleType, false) ||
          fields(1).dataType == ArrayType(DoubleType, true))
    case _ => false
  }

  /** The [[ArgmaxDotExpr]] fold as a static helper, shared by the
    * interpreted eval and the generated code (r14, VERDICT r13 item 7:
    * CodegenFallback forced a full input-row materialization + an
    * interpreted boxed eval wherever the expression sat in a DIRECT
    * projection — q58/q155/q156 routing, semanticDedup assignment —
    * rather than inside a `transform` lambda). A top-level object with
    * no companion class gets Java static forwarders, so generated code
    * calls this without going through MODULE$.
    */
  def argmaxDot(sub: ArrayData, cands: ArrayData): Int = {
    val n = cands.numElements()
    var bestCell = Int.MaxValue
    var bestSc = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val row = cands.getStruct(i, 2)
      val cell = row.getInt(0)
      val sc = dot(sub, row.getArray(1))
      if (sc > bestSc || (sc == bestSc && cell < bestCell)) {
        bestSc = sc; bestCell = cell
      }
      i += 1
    }
    bestCell
  }

  /** The [[TopDotsExpr]] insertion-sorted top-k as a static helper —
    * same sharing rationale as [[argmaxDot]] (graft_top_dots sits in
    * the direct nProbe-routing projections of q58/q155/q156).
    */
  def topDots(sub: ArrayData, cands: ArrayData, k: Int): ArrayData = {
    val n = cands.numElements()
    val m = math.min(k, n)
    val cells = new Array[Int](m)
    val scores = new Array[Double](m)
    var filled = 0
    var i = 0
    while (i < n) {
      val row = cands.getStruct(i, 2)
      val cell = row.getInt(0)
      val sc = dot(sub, row.getArray(1))
      // Insertion position: before the first kept entry this candidate
      // BEATS under (d DESC, cell ASC).
      var p = filled
      while (p > 0 && (sc > scores(p - 1) ||
          (sc == scores(p - 1) && cell < cells(p - 1)))) p -= 1
      if (p < m) {
        val last = math.min(filled, m - 1)
        var j = last
        while (j > p) { cells(j) = cells(j - 1); scores(j) = scores(j - 1); j -= 1 }
        cells(p) = cell; scores(p) = sc
        if (filled < m) filled += 1
      }
      i += 1
    }
    val out = new Array[Any](filled)
    var o = 0
    while (o < filled) {
      out(o) = InternalRow(cells(o), scores(o)); o += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_argmax_dot(sub, cands)` — the id of the candidate with the
  * max dot(sub, centroid), ties to the LOWEST id. `cands` is
  * array<struct<id int, cent array<double>>> (field names free; access
  * is positional). Exactly `max_by(cell, struct(sc, -cell))` and
  * exactly a `(d DESC, cell ASC)` ROW_NUMBER's rn = 1: ascending
  * iteration keeps a strictly-greater score or an equal score with a
  * lower id. Null input → null (never occurs on the broadcast model
  * rows; guards anyway).
  */
case class ArgmaxDotExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(DoubleType, false) ||
        left.dataType == ArrayType(DoubleType, true)) {
      if (ArgmaxExpressions.candsTypeOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_argmax_dot candidates must be array<struct<int, array<double>>>, got ${right.dataType.simpleString}")
    } else TypeCheckResult.TypeCheckFailure(
      s"graft_argmax_dot vector must be array<double>, got ${left.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_argmax_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    ArgmaxExpressions.argmaxDot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  // r14 (VERDICT r13 item 7): real codegen instead of CodegenFallback —
  // the generated projection calls the SAME static fold the interpreted
  // path uses (bit-identical by construction), with no input-row
  // materialization and no boxing.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.ArgmaxExpressions.argmaxDot($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgmaxDotExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_top_dots(sub, cands, k)` — the k candidates ordered
  * (dot DESC, id ASC), as array<struct<cell int, d double>>. Exactly
  * the `(d DESC, cell ASC)` ROW_NUMBER's rn <= k slice and exactly the
  * `slice(sort_array(collect_list(struct(sc, -id)), false), 1, k)`
  * idiom: the insertion sort below maintains that total order (ids are
  * distinct, so it IS total) regardless of input order.
  */
case class TopDotsExpr(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {
  require(k > 0, s"graft_top_dots k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (ArgmaxExpressions.candsTypeOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_top_dots candidates must be array<struct<int, array<double>>>, got ${right.dataType.simpleString}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("cell", IntegerType, nullable = false),
      StructField("d", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_top_dots"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    ArgmaxExpressions.topDots(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], k)

  // r14: same codegen treatment as ArgmaxDotExpr — graft_top_dots sits
  // in the direct nProbe-routing projections (q58/q155/q156), where
  // CodegenFallback forced an input-row materialization per row.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.ArgmaxExpressions.topDots($l, $r, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopDotsExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_pq_hier_code(sub, sups, gcells, beam)` — the full two-stage
  * hierarchical PQ assignment for ONE (vector, subspace) as one eval:
  * stage 1 keeps the `beam` groups with max dot(sub, scentroid)
  * (sc DESC, g ASC — the `sort_array(collect_list(struct(sc, -g)),
  * false)` order), stage 2 returns the argmax-dot cell among the kept
  * groups' members (ties → lowest cell — `max_by(cell, struct(sc,
  * -cell))`). `sups` is array<struct<g int, scent array<double>>>,
  * `gcells` is map<int, array<struct<cell int, cent array<double>>>>.
  * Group cells are disjoint (a cell belongs to exactly one group), so
  * no candidate is scored twice — same property the join form had.
  */
case class PqHierCodeExpr(first: Expression, second: Expression,
                          third: Expression, beam: Int)
  extends TernaryExpression with CodegenFallback {
  require(beam > 0, s"graft_pq_hier_code beam must be positive, got $beam")

  override def checkInputDataTypes(): TypeCheckResult = third.dataType match {
    case MapType(IntegerType, v, _) if ArgmaxExpressions.candsTypeOk(v) =>
      if (ArgmaxExpressions.candsTypeOk(second.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_pq_hier_code sups must be array<struct<int, array<double>>>, got ${second.dataType.simpleString}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_hier_code gcells must be map<int, array<struct<int, array<double>>>>, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_pq_hier_code"

  override protected def nullSafeEval(s: Any, sup: Any, gc: Any): Any = {
    val sub = s.asInstanceOf[ArrayData]
    val sups = sup.asInstanceOf[ArrayData]
    val gcells = gc.asInstanceOf[MapData]
    // Stage 1: top-beam groups by (sc DESC, g ASC) — insertion sort,
    // identical total order to the sort_array idiom.
    val nSup = sups.numElements()
    val m = math.min(beam, nSup)
    val gs = new Array[Int](m)
    val gsc = new Array[Double](m)
    var filled = 0
    var i = 0
    while (i < nSup) {
      val row = sups.getStruct(i, 2)
      val g = row.getInt(0)
      val sc = ArgmaxExpressions.dot(sub, row.getArray(1))
      var p = filled
      while (p > 0 && (sc > gsc(p - 1) || (sc == gsc(p - 1) && g < gs(p - 1)))) p -= 1
      if (p < m) {
        val last = math.min(filled, m - 1)
        var j = last
        while (j > p) { gs(j) = gs(j - 1); gsc(j) = gsc(j - 1); j -= 1 }
        gs(p) = g; gsc(p) = sc
        if (filled < m) filled += 1
      }
      i += 1
    }
    // Stage 2: argmax over the kept groups' member cells. The gcells
    // MapData is scanned once per kept group (Spark map values are not
    // hash-indexed); ≤ 2^pqBits/groupSize keys, so the scan is tiny.
    val keys = gcells.keyArray()
    val vals = gcells.valueArray()
    val nKeys = keys.numElements()
    var bestCell = Int.MaxValue
    var bestSc = Double.NegativeInfinity
    var b = 0
    while (b < filled) {
      val g = gs(b)
      var ki = 0
      while (ki < nKeys) {
        if (keys.getInt(ki) == g) {
          val cands = vals.getArray(ki)
          val nC = cands.numElements()
          var ci = 0
          while (ci < nC) {
            val row = cands.getStruct(ci, 2)
            val cell = row.getInt(0)
            val sc = ArgmaxExpressions.dot(sub, row.getArray(1))
            if (sc > bestSc || (sc == bestSc && cell < bestCell)) {
              bestSc = sc; bestCell = cell
            }
            ci += 1
          }
          ki = nKeys // key found; keys are unique
        } else ki += 1
      }
      b += 1
    }
    bestCell
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqHierCodeExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}
