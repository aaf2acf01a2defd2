package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) sketch as a typed Aggregator: the k smallest
  * DISTINCT 32-bit-uniform hash values per group, kept as a sorted
  * ascending array (Bar-Yossef et al., RANDOM'02).
  *
  * This is the bounded-state posture the q128b/q130b queries run on: the
  * buffer never exceeds k longs, partial aggregation crushes each input
  * partition to <= k values map-side, and merge is a sorted-array union
  * trimmed to k — so the shuffle carries `partitions x groups x k` longs
  * instead of the vocabulary-sized distinct frame the exact-audit
  * formulation (q128/q130, `ops/Sketches.scala`) materializes. At 100 TB
  * that difference is the whole point of the sketch: per-source state is
  * ~2 KB regardless of corpus size, and sketches of disjoint corpus
  * slices union losslessly (merge == sketch-of-union, proven in
  * SketchSpec).
  *
  * Determinism: output depends only on the SET of input values (insert
  * order cannot matter for "k smallest distinct"), so the estimate is
  * bit-identical across partitionings and engines — the DuckDB oracle
  * ranks the same distinct hashes and reproduces the estimator exactly.
  */
class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  // k <= 0 is meaningless for the sketch, and k == 0 would make the
  // saturation fast path index buf(-1) deep inside the aggregate — fail
  // at construction with a message instead (ADVICE r6).
  require(k >= 1, s"KmvAgg needs k >= 1 (got $k)")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val n = buf.length
    // Fast path: buffer saturated and h can't displace anything.
    if (n == k && h >= buf(n - 1)) return buf
    val idx = java.util.Arrays.binarySearch(buf, h)
    if (idx >= 0) return buf // already present — distinct semantics
    val ins = -idx - 1
    val outLen = if (n < k) n + 1 else k
    val out = new Array[Long](outLen)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(buf, ins, out, ins + 1, outLen - ins - 1)
    out
  }

  /** Two-pointer union of two sorted distinct arrays, trimmed to the k
    * smallest — exactly the mergeability identity union-sketch ==
    * k-smallest-of-pooled-sketches.
    */
  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b1.isEmpty) return b2
    if (b2.isEmpty) return b1
    val out = new Array[Long](math.min(k, b1.length + b2.length))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < b1.length || j < b2.length)) {
      val take =
        if (i >= b1.length) { val v = b2(j); j += 1; v }
        else if (j >= b2.length) { val v = b1(i); i += 1; v }
        else if (b1(i) < b2(j)) { val v = b1(i); i += 1; v }
        else if (b2(j) < b1(i)) { val v = b2(j); j += 1; v }
        else { val v = b1(i); i += 1; j += 1; v } // equal: emit once
      out(o) = take
      o += 1
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
