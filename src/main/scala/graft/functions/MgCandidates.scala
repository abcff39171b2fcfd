package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (the [[BottomK]] skeleton carrying a different sketch):
  * per-group Misra–Gries heavy-hitter CANDIDATES with at most k counters
  * of state per group, mergeable across partitions — the aggregation form
  * of [[graft.operators.SketchOps.misraGries]], for when heavy hitters
  * are needed PER GROUP and a per-group hash table would be unbounded.
  *
  * reduce = classic MG: bump a held counter, insert below capacity, else
  * decrement ALL counters (the incoming item's implicit counter hits 0
  * and is discarded). merge = the mergeable-summaries rule (Agarwal et
  * al., PODS'12): add counters pairwise, subtract the (k+1)-th largest,
  * drop non-positive. Counters only ever undercount, so any term with
  * group frequency > n_g/k survives to the output — a guaranteed
  * candidate superset. The candidate set itself may vary with partition
  * order; consumers recount candidates EXACTLY and filter on the true
  * threshold (q240), which makes the final answer deterministic.
  *
  * Buffer is a Seq of (term, count) pairs — product-encodable, so state
  * rides the row format like any partial aggregate (no kryo blobs).
  */
class MgCandidates(k: Int)
    extends Aggregator[String, Seq[(String, Long)], Seq[String]] {

  override def zero: Seq[(String, Long)] = Seq.empty

  override def reduce(b: Seq[(String, Long)], a: String): Seq[(String, Long)] =
    if (a == null) b
    else {
      val idx = b.indexWhere(_._1 == a)
      if (idx >= 0) b.updated(idx, (a, b(idx)._2 + 1L))
      else if (b.size < k) b :+ ((a, 1L))
      else b.map { case (t, c) => (t, c - 1L) }.filter(_._2 > 0L)
    }

  override def merge(b1: Seq[(String, Long)],
                     b2: Seq[(String, Long)]): Seq[(String, Long)] = {
    val summed = (b1 ++ b2).groupBy(_._1).iterator
      .map { case (t, xs) => (t, xs.map(_._2).sum) }.toSeq
      .sortBy { case (t, c) => (-c, t) }
    if (summed.size <= k) summed
    else {
      val cut = summed(k)._2 // (k+1)-th largest counter
      summed.map { case (t, c) => (t, c - cut) }.filter(_._2 > 0L)
    }
  }

  override def finish(b: Seq[(String, Long)]): Seq[String] =
    b.map(_._1).sorted

  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

object MgCandidates {
  /** Column form usable in untyped `agg(...)`. */
  def mgCandidates(c: Column, k: Int): Column =
    org.apache.spark.sql.functions.udaf(new MgCandidates(k), Encoders.STRING)
      .apply(c)
}
