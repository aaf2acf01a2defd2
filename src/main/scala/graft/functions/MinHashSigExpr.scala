package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd kernels of the MinHash dedup path (q52): shingle hashing and
  * the 128-slot signature, both pure per-row maps — so the whole pipeline
  * before the band-bucket join runs inside the corpus scan with zero
  * shuffles, on primitive longs.
  */
object MinHashSigExpr {
  /** Mersenne prime 2³¹−1: a_j < p and h < p keep a_j·h < 2⁶² — no signed
    * 64-bit overflow in the universal-hash arithmetic.
    */
  val P: Long = 2147483647L
  val NumPerm: Int = 128
  /** Spark's SQL `xxhash64` default seed — [[ShingleHashesExpr]]'s chained
    * hash equals the SQL `xxhash64(t1, t2, t3)` on the same three tokens
    * (pinned by DedupSpec), so the expression stays SQL-explainable.
    */
  val Seed: Long = 42L

  /** Seed-42 permutation parameters, shared source of truth for
    * [[MinHashSigExpr]], the [[MinHashAgg]] UDAF, and the streaming
    * sketch.
    */
  lazy val AB: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(NumPerm)((rnd.nextLong().abs % (P - 1) + 1, rnd.nextLong().abs % P))
  }
  lazy val A: Array[Long] = AB.map(_._1)
  lazy val B: Array[Long] = AB.map(_._2)

  val BandRows: Int = 4
  val NumBands: Int = NumPerm / BandRows

  /** Shared interpreted kernel: 128-slot signature of pre-hashed shingles. */
  def signature(hs: Array[Long]): Array[Long] = {
    val sig = Array.fill(NumPerm)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = java.lang.Math.floorMod(hs(i), P)
      var j = 0
      while (j < NumPerm) {
        val v = (A(j) * h + B(j)) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  /** The 32 packed band-bucket keys of a signature: per band b, the
    * chained seed-42 XxHash64 of (b, slot0..slot3) — exactly what SQL
    * `xxhash64(b, slice(sig, b*4+1, 4))` computes (int hashed first, then
    * each array element folding the previous value as its seed).
    */
  def bandKeys(sig: Array[Long]): Array[Long] = {
    val out = new Array[Long](NumBands)
    var b = 0
    while (b < NumBands) {
      var h = XXH64.hashInt(b, Seed)
      var r = 0
      while (r < BandRows) { h = XXH64.hashLong(sig(b * BandRows + r), h); r += 1 }
      out(b) = h
      b += 1
    }
    out
  }
}

/** Signature + band packing fused in ONE codegen'd pass:
  * `graft_minhash_bands(array<bigint>) -> array<bigint>` — the 32 LSH
  * band-bucket keys of a document's hashed shingle set. Equivalent to
  * `transform(sequence(0, 31), b -> xxhash64(b, slice(graft_minhash_sig
  * (hs), b*4+1, 4)))` (pinned by DedupSpec) but without the higher-order
  * lambda, which re-evaluates the signature subtree once per band. This
  * is the kernel both batch q52 and the streaming near-dup sketch hang
  * off: one expression turns a document row into its bucket keys, so the
  * only stateful/shuffled object is the scalar band key.
  */
case class MinHashBandsExpr(child: Expression) extends UnaryExpression {
  import MinHashSigExpr._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_bands requires an array<bigint> argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    new GenericArrayData(bandKeys(signature(arr.toLongArray())))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", A, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", B, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val sig = ctx.freshName("sig")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val k = ctx.freshName("k")
      s"""
         |int $n = $arr.numElements();
         |long[] $sig = new long[$NumPerm];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = java.lang.Math.floorMod($arr.getLong($i), ${P}L);
         |  for (int $j = 0; $j < $NumPerm; $j++) {
         |    long $v = ($aRef[$j] * $h + $bRef[$j]) % ${P}L;
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |long[] $out = new long[$NumBands];
         |for (int $b = 0; $b < $NumBands; $b++) {
         |  long $k = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt($b, ${Seed}L);
         |  for (int $r = 0; $r < $BandRows; $r++) {
         |    $k = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
         |      $sig[$b * $BandRows + $r], $k);
         |  }
         |  $out[$b] = $k;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
    copy(child = newChild)
}

/** Distinct hashed word-3-gram shingles of a token array in ONE codegen'd
  * pass: `graft_shingle_hashes(array<string>) -> array<bigint>`, sorted
  * ascending (deterministic output, primitive sort+dedup — no string
  * allocation, comparison, or hashing survives the row).
  *
  * Hash identity: shingle i ↦ the chained seed-42 XxHash64 of tokens
  * (i, i+1, i+2) — exactly what SQL `xxhash64(toks[i], toks[i+1],
  * toks[i+2])` computes, each value folding the previous as its seed.
  * Working on 64-bit shingle hashes instead of shingle strings makes the
  * downstream set intersection collision-approximate: two distinct
  * shingles of one document collide with probability ~n²/2⁶⁴ (≈ 1e-16 at
  * n = 10⁴ shingles) — far below any dedup-relevant signal, and the
  * standard trade every large-scale MinHash pipeline makes.
  *
  * Documents under 3 tokens yield an empty array (callers drop them — no
  * shingles means no near-dup relation), sidestepping the descending
  * `sequence(1, 0)` trap the SQL formulation must IF-guard.
  */
case class ShingleHashesExpr(child: Expression) extends UnaryExpression {
  import MinHashSigExpr._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes requires an array<string> argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](n - 2)
    var i = 0
    while (i < n - 2) {
      var h = Seed
      var k = 0
      while (k < 3) {
        val t = toks.getUTF8String(i + k)
        h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, h)
        k += 1
      }
      hs(i) = h
      i += 1
    }
    new GenericArrayData(ShingleHashesExpr.sortedDistinct(hs))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val t = ctx.freshName("t")
      val hs = ctx.freshName("hs")
      s"""
         |int $n = $toks.numElements();
         |long[] $hs = ($n < 3) ? new long[0] : new long[$n - 2];
         |for (int $i = 0; $i < $n - 2; $i++) {
         |  long $h = ${Seed}L;
         |  for (int $k = 0; $k < 3; $k++) {
         |    org.apache.spark.unsafe.types.UTF8String $t = $toks.getUTF8String($i + $k);
         |    $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $t.getBaseObject(), $t.getBaseOffset(), $t.numBytes(), $h);
         |  }
         |  $hs[$i] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ShingleHashesExpr.sortedDistinct($hs));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

object ShingleHashesExpr {
  /** In-place sort + dedup scan on primitive longs — shared by interpreted
    * eval and generated code.
    */
  def sortedDistinct(hs: Array[Long]): Array[Long] = {
    if (hs.length == 0) return hs
    java.util.Arrays.sort(hs)
    var w = 1
    var i = 1
    while (i < hs.length) {
      if (hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w)
  }
}

/** The whole 128-slot MinHash signature of a pre-hashed shingle array in
  * ONE codegen'd pass: `graft_minhash_sig(array<bigint>) -> array<bigint>`.
  *
  * Semantics (identical to the round-3 [[MinHashAgg]] UDAF math, pinned by
  * DedupSpec): per shingle hash x, h = pmod(x, p), then
  * sig[j] = min over x of (a_j·h + b_j) mod p for the shared seed-42
  * permutation parameters [[MinHashSigExpr.AB]].
  *
  * Why an expression and not an aggregate: per-document distinctness of
  * shingles is per-row ([[ShingleHashesExpr]]), so the signature needs no
  * grouping at all — q52's signature build is a pure map over the corpus
  * scan (zero shuffles before the band-bucket join), and the tight
  * primitive-long loop replaces both the interpreted higher-order-function
  * lambdas (which re-evaluate their body per permutation) and the
  * typed-aggregate row serialization.
  */
case class MinHashSigExpr(child: Expression) extends UnaryExpression {
  import MinHashSigExpr._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires an array<bigint> argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(NumPerm)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = java.lang.Math.floorMod(arr.getLong(i), P)
      var j = 0
      while (j < NumPerm) {
        val v = (A(j) * h + B(j)) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", A, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", B, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $arr.numElements();
         |long[] $sig = new long[$NumPerm];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = java.lang.Math.floorMod($arr.getLong($i), ${P}L);
         |  for (int $j = 0; $j < $NumPerm; $j++) {
         |    long $v = ($aRef[$j] * $h + $bRef[$j]) % ${P}L;
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}
