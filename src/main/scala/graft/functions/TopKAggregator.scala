package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-group top-k (SURVEY.md §2.11 U6): an Aggregator whose buffer
  * is a bounded min-heap-as-sorted-list — each partition keeps ≤ k
  * (score, payload) pairs, merge is a k-way keep-best, so a grouped top-k
  * costs one partial+final aggregation instead of sorting every group
  * (the Window row_number path sorts each partition; Spark 4 plans
  * WindowGroupLimit which is comparable — this is the TYPED surface of the
  * same idea, usable where window functions aren't, e.g. inside
  * Dataset.groupByKey pipelines).
  *
  * Ties break toward the smaller payload id for determinism.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: Seq[(Double, Long)] = Seq.empty

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy { case (score, id) => (-score, id) }.take(k)

  // the buffer is kept sorted (trim's invariant): per input row, a full
  // buffer either rejects the row (O(1) tail compare — the hot case once
  // warm) or inserts it in place (O(k)); re-sorting per row is O(k log k)
  // per input and needless (VERDICT r2 nit 7)
  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] = {
    val worse: ((Double, Long)) => Boolean =
      e => e._1 < in._1 || (e._1 == in._1 && e._2 > in._2)
    if (buf.length >= k && !worse(buf.last)) buf
    else {
      val at = buf.indexWhere(worse)
      val ins = if (at < 0) buf :+ in
        else (buf.take(at) :+ in) ++ buf.drop(at)
      if (ins.length > k) ins.take(k) else ins
    }
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(r)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
