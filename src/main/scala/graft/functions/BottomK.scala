package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.11: `Aggregator[IN,BUF,OUT]` reserved
  * for sketch-style extensions): bottom-k distinct strings per group.
  *
  * This is the aggregation form of the bottom-k sketch used for document
  * fingerprinting (q42) — bounded state (k strings) per group regardless of
  * group size, mergeable across partitions, so it behaves like any partial
  * aggregate under map-side combine. The same skeleton carries an HLL or
  * KMV sketch: only the buffer type and merge change.
  *
  * The buffer is a sorted distinct Seq capped at k (k is small); kept as a
  * product-encodable type so the state serializes through the row format
  * rather than kryo blobs.
  */
class BottomK(k: Int) extends Aggregator[String, Seq[String], Seq[String]] {

  override def zero: Seq[String] = Seq.empty

  override def reduce(b: Seq[String], a: String): Seq[String] =
    if (a == null || b.contains(a)) b
    else ((a +: b).sorted).take(k)

  override def merge(b1: Seq[String], b2: Seq[String]): Seq[String] =
    (b1 ++ b2).distinct.sorted.take(k)

  override def finish(b: Seq[String]): Seq[String] = b

  override def bufferEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
}

object BottomK {
  /** Column form usable in untyped `agg(...)`. */
  def bottomK(c: Column, k: Int): Column =
    org.apache.spark.sql.functions.udaf(new BottomK(k), Encoders.STRING)
      .apply(c)

  /** KMV (k-minimum-values) distinct-count estimate over a [[bottomK]]
    * array of md5-hex values: exact (= array size) below k, else
    * (k-1)/R_k with R_k = the k-th smallest hash mapped into [0,1) via its
    * first 8 hex digits. One definition shared by every batch/streaming
    * twin so the estimator can never drift between them (or their DuckDB
    * oracles). Deterministic — unlike HLL++, oracle hash-matchable. */
  def kmvEstimate(lows: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    round(
      when(size(lows) < k, size(lows).cast("double"))
        .otherwise(lit((k - 1).toDouble) /
          (conv(substring(element_at(lows, k), 1, 8), 16, 10).cast("double")
            / lit(4294967296.0))), 4)
  }
}
