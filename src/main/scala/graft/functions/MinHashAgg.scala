package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** MinHash signature sketch as a typed Aggregator (SURVEY.md §7.3's
  * "TypedImperativeAggregate-style MinHash" — measured to beat the
  * 128-separate-min-aggregate-columns formulation it replaced).
  *
  * Input: one pre-hashed shingle value h ∈ [0, p) per row. Buffer: the
  * running elementwise minimum of the `numPerm` universal hashes
  * h_j = (a_j·h + b_j) mod p — a fixed 128-long array, mergeable
  * map-side, O(numPerm) state per group regardless of document length.
  * a_j < p = 2³¹−1 and h < p keep a_j·h < 2⁶² — no 64-bit overflow.
  */
class MinHashAgg(numPerm: Int, ab: Array[(Long, Long)], p: Long)
  extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(numPerm)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var j = 0
    while (j < numPerm) {
      val v = (ab(j)._1 * h + ab(j)._2) % p
      if (v < buf(j)) buf(j) = v
      j += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numPerm) {
      if (b2(j) < b1(j)) b1(j) = b2(j)
      j += 1
    }
    b1
  }

  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
