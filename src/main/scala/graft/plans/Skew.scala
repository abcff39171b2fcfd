package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling (SURVEY.md §7.3 "100 TB posture").
  *
  * Hot grouping keys (the reference's rdf:type / wdt:P31-shaped predicates;
  * low-cardinality event types at 100 TB) concentrate a shuffle partition on
  * one task. AQE splits skewed JOIN partitions automatically, but a skewed
  * AGGREGATION key still funnels to one reducer for the final merge — the
  * classic fix is salting: aggregate on (key, salt) first, then re-aggregate
  * on key. Both phases are partial-aggregable, so the first shuffle spreads
  * the hot key across `salts` reducers and the second only merges
  * `salts`-many pre-aggregated rows per key.
  */
object Skew {

  /** Two-phase salted sum/count. The salt is derived deterministically from
    * `saltFrom` (any well-distributed column, e.g. a row id) so re-runs are
    * stable. Result is identical to a direct groupBy(key). */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     saltFrom: Column, salts: Int): DataFrame =
    df.groupBy(key.as("k"), pmod(saltFrom, lit(salts)).as("salt"))
      .agg(sum(value).as("s"), count(lit(1)).as("c"))
      .groupBy(col("k"))
      .agg(sum(col("s")).as("total"), sum(col("c")).cast("long").as("cnt"))
}
