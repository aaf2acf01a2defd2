package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Custom Catalyst expressions for the vector hot paths (SURVEY.md §7.3:
  * custom expressions are a *measured* optimization — this one exists
  * because the O(n²) similarity joins spend their time in the interpreted
  * `aggregate(zip_with(...))` lambda; a codegen'd tight loop removes the
  * per-element closure dispatch while computing the identical
  * left-to-right double fold, so DuckDB-oracle parity is preserved
  * bit-for-bit).
  */
object VectorExpressions {

  private def arity1(name: String, mk: Expression => Expression)
  : Seq[Expression] => Expression = {
    case Seq(c) => mk(c)
    case other => throw new IllegalArgumentException(
      s"$name takes exactly 1 argument, got ${other.size}")
  }

  /** The ONE list of graft's SQL functions: (name, implementing class,
    * builder). Both session-registration paths — imperative [[register]]
    * and the `spark.sql.extensions` hook (`graft.GraftExtensions`) —
    * iterate this list, so the two surfaces cannot drift (a function added
    * here is reachable from both; arity errors are raised identically).
    */
  private[graft] val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", classOf[DotProductExpr].getName, {
      case Seq(a, b) => DotProductExpr(a, b)
      case other => throw new IllegalArgumentException(
        s"graft_dot takes exactly 2 arguments, got ${other.size}")
    }: (Seq[Expression] => Expression)),
    ("graft_lsh_buckets", classOf[LshBucketsExpr].getName, {
      case Seq(c) => LshBucketsExpr(c)
      case Seq(c, b) => LshBucketsExpr(c,
        b.eval().asInstanceOf[Number].intValue())
      case Seq(c, b, n) => LshBucketsExpr(c,
        b.eval().asInstanceOf[Number].intValue(),
        n.eval().asInstanceOf[Number].intValue())
      case other => throw new IllegalArgumentException(
        s"graft_lsh_buckets takes (emb[, bitsPerTable[, numTables]]), got ${other.size} args")
    }: (Seq[Expression] => Expression)),
    ("graft_minhash_sig", classOf[MinHashSigExpr].getName,
      arity1("graft_minhash_sig", MinHashSigExpr(_))),
    ("graft_shingle_hashes", classOf[ShingleHashesExpr].getName,
      arity1("graft_shingle_hashes", ShingleHashesExpr(_))),
    ("graft_minhash_bands", classOf[MinHashBandsExpr].getName,
      arity1("graft_minhash_bands", MinHashBandsExpr(_))),
    ("graft_simhash", classOf[SimHashExpr].getName,
      arity1("graft_simhash", SimHashExpr(_))),
    ("graft_ahash", classOf[AHashExpr].getName,
      arity1("graft_ahash", AHashExpr(_))),
    ("graft_char_entropy", classOf[CharEntropyExpr].getName,
      arity1("graft_char_entropy", CharEntropyExpr(_))),
    ("graft_char_trigrams", classOf[CharTrigramsExpr].getName,
      arity1("graft_char_trigrams", CharTrigramsExpr(_))),
    ("graft_argmax_dot", classOf[ArgmaxDotExpr].getName, {
      case Seq(a, b) => ArgmaxDotExpr(a, b)
      case other => throw new IllegalArgumentException(
        s"graft_argmax_dot takes exactly 2 arguments, got ${other.size}")
    }: (Seq[Expression] => Expression)),
    ("graft_top_dots", classOf[TopDotsExpr].getName, {
      case Seq(a, b, k) => TopDotsExpr(a, b, k.eval().asInstanceOf[Number].intValue())
      case other => throw new IllegalArgumentException(
        s"graft_top_dots takes (vec, cands, k), got ${other.size} args")
    }: (Seq[Expression] => Expression)),
    ("graft_pq_hier_code", classOf[PqHierCodeExpr].getName, {
      case Seq(s, sup, gc, beam) => PqHierCodeExpr(s, sup, gc,
        beam.eval().asInstanceOf[Number].intValue())
      case other => throw new IllegalArgumentException(
        s"graft_pq_hier_code takes (sub, sups, gcells, beam), got ${other.size} args")
    }: (Seq[Expression] => Expression)))

  /** Idempotent session registration; exposes every [[builders]] entry in
    * SQL and `expr("graft_...(...)")`. All run inside whole-stage codegen.
    */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

/** Sequential dot product over two array<double> columns.
  * Fold order is ascending-index, matching both the SQL
  * `aggregate(zip_with(..))` formulation it replaces and DuckDB's
  * `list_reduce` — identical FP rounding on identical inputs.
  * Null array → null; null *elements* are not expected (embedding data)
  * and read as 0.0 via ArrayData semantics.
  */
case class DotProductExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** All hyperplane-LSH bucket ids of an array<double> embedding in ONE
  * pass: one expression evaluating 64 plane dots against a referenced
  * plane matrix, instead of the 64 separate `graft_dot(emb, array(<64
  * literals>))` subtrees `Hyperplanes.sparkBucketsExpr` used to emit —
  * which re-read the input array 64 times and code-generated ~4k array
  * literals per query.
  *
  * `bitsPerTable` regroups the SAME 64 shared planes into 64/bits tables
  * of `bits` sign bits — the corpus-growth dial: candidate volume in a
  * bucket self-join is ∝ n²/2^bits per table, so bits must grow with
  * log₂(corpus) to keep candidates linear. Because an r-bit grouping's
  * table t is the concatenation of finer groupings' tables, raising bits
  * strictly SHRINKS the candidate set (collision must hold in every
  * constituent sub-table) — pinned by DedupSpec.
  *
  * Parity: each plane's dot is the same ascending-index 0.0-init double
  * fold as `graft_dot`, and the planes are the same
  * [[Hyperplanes.planes]] doubles the oracle's literals parse to — so
  * bucket ids (and every downstream q54/q56 result) are bit-identical to
  * the multi-expression form and to DuckDB.
  */
case class LshBucketsExpr(child: Expression,
                          bitsPerTable: Int = Hyperplanes.bits,
                          numTables: Int = -1) extends UnaryExpression {
  // numTables = -1 (the 1- and 2-arg SQL forms) keeps the legacy fixed
  // 64-plane pool: ⌊64/bits⌋ tables, so non-dividing geometries (the
  // 11-bit sf10 posture) use the FIRST ⌊64/bits⌋·bits planes. An explicit
  // numTables is the HELD-L dial (VERDICT r8 item 1): it draws
  // numTables·bits planes from the parameterized seed-7 pool, so stepping
  // bits with the corpus no longer shrinks the table count.
  require(bitsPerTable > 0 && bitsPerTable <= 30 &&
    (if (numTables == -1) Hyperplanes.tables * Hyperplanes.bits / bitsPerTable >= 1
     else numTables > 0 && numTables * bitsPerTable <= Hyperplanes.lshPlaneBudget),
    s"geometry ${numTables} x $bitsPerTable exceeds the ${Hyperplanes.lshPlaneBudget}-plane LSH budget")

  private def nTables: Int =
    if (numTables == -1) Hyperplanes.tables * Hyperplanes.bits / bitsPerTable
    else numTables

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_buckets requires an array<double> argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  @transient private lazy val flatPlanes: Array[Double] = LshBucketsExpr.flatPlanes

  override protected def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    val dim = math.min(emb.numElements(), Hyperplanes.dim)
    val out = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0
      var b = 0
      while (b < bitsPerTable) {
        val off = Hyperplanes.lshPlaneRow(t * bitsPerTable + b) * Hyperplanes.dim
        var s = 0.0
        var i = 0
        while (i < dim) { s += emb.getDouble(i) * flatPlanes(off + i); i += 1 }
        if (s > 0.0) bucket += 1 << (bitsPerTable - 1 - b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planes = ctx.addReferenceObj("lshPlanes", flatPlanes, "double[]")
    val (tables, bits, dim) = (nTables, bitsPerTable, Hyperplanes.dim)
    nullSafeCodeGen(ctx, ev, emb => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val bucket = ctx.freshName("bucket")
      // lshPlaneRow inlined (codegen can't call back into Scala): plane
      // indices at/above the reserved PQ block shift past it. Geometries
      // that never reach row 448 get the identity expression, keeping
      // their generated code byte-identical to pre-r11 plans.
      val rowOf =
        if (tables * bits <= Hyperplanes.pqPlaneStart) s"($t * $bits + $b)"
        else s"(($t * $bits + $b) < ${Hyperplanes.pqPlaneStart} " +
          s"? ($t * $bits + $b) : ($t * $bits + $b) + ${Hyperplanes.pqReservedRows})"
      s"""
         |int $n = java.lang.Math.min($emb.numElements(), $dim);
         |int[] $out = new int[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $bucket = 0;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    int $off = $rowOf * $dim;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $emb.getDouble($i) * $planes[$off + $i];
         |    }
         |    if ($s > 0.0) $bucket += 1 << ($bits - 1 - $b);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketsExpr =
    copy(child = newChild)
}

object LshBucketsExpr {
  /** Row-major (plane, dim) flattening of [[Hyperplanes.planesAll]] (the
    * full parameterized budget — its 64-plane prefix is the legacy pool),
    * shared by interpreted eval and the codegen reference object.
    */
  lazy val flatPlanes: Array[Double] = {
    val out = new Array[Double](Hyperplanes.maxPlanes * Hyperplanes.dim)
    var j = 0
    while (j < Hyperplanes.maxPlanes) {
      System.arraycopy(Hyperplanes.planesAll(j), 0, out, j * Hyperplanes.dim, Hyperplanes.dim)
      j += 1
    }
    out
  }
}
