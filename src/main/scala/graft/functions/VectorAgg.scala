package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A4 (SURVEY.md §2.5): typed custom aggregation — element-wise mean of
  * embedding vectors via `Aggregator[IN, BUF, OUT]`, registered with
  * `functions.udaf`. This is the one aggregate the built-ins can't express
  * directly (no element-wise array mean), so it earns the custom-agg slot.
  *
  * Distributed-safe by construction: `reduce` accumulates a running
  * (sum-vector, count) per partition (partial aggregation), `merge`
  * combines partials associatively — the same partial+final contract
  * Spark's hash aggregate gives built-ins, so the shuffle carries one
  * 64-double buffer per (group × partition), never the vectors.
  */
case class VecBuffer(sums: Array[Double], n: Long)

object VectorMean extends Aggregator[Seq[Double], VecBuffer, Seq[Double]] {

  override def zero: VecBuffer = VecBuffer(Array.empty, 0L)

  override def reduce(b: VecBuffer, v: Seq[Double]): VecBuffer = {
    // null/empty vectors are skipped entirely (not counted), so an empty
    // buffer always has n == 0 and merge() can't drop counts
    if (v == null || v.isEmpty) return b
    val s = if (b.sums.length == 0) new Array[Double](v.length) else b.sums
    require(v.length == s.length,
      s"VectorMean: ragged input (${v.length} vs ${s.length} dims)")
    var i = 0
    while (i < v.length) { s(i) += v(i); i += 1 }
    VecBuffer(s, b.n + 1)
  }

  override def merge(a: VecBuffer, b: VecBuffer): VecBuffer = {
    if (a.sums.length == 0) return b // invariant: empty sums ⇒ n == 0
    if (b.sums.length == 0) return a
    require(a.sums.length == b.sums.length,
      s"VectorMean: ragged partials (${a.sums.length} vs ${b.sums.length})")
    val s = a.sums.clone()
    var i = 0
    while (i < s.length) { s(i) += b.sums(i); i += 1 }
    VecBuffer(s, a.n + b.n)
  }

  override def finish(r: VecBuffer): Seq[Double] =
    if (r.n == 0) Seq.empty else r.sums.map(_ / r.n).toSeq

  override def bufferEncoder: Encoder[VecBuffer] = Encoders.product[VecBuffer]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
