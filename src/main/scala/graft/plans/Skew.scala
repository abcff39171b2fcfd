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

  /** Salted shuffle join: the manual fix for join skew when the small side
    * is too big to broadcast and one probe key floods a partition. The big
    * side gets a deterministic salt; the small side replicates `salts`
    * ways (explode of a literal range — `salts`× its size, which is the
    * price of spreading the hot key over `salts` reducers). Result is
    * row-identical to the plain equi-join. AQE's skew-join split covers
    * most cases at runtime; this is the static form for when the skew is
    * known and extreme (rdf:type-shaped keys at 100 TB). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFrom: Column, salts: Int): DataFrame = {
    // A null saltFrom must still land on SOME salt (null == salt never
    // matches, which would silently drop the row from the join); the
    // column name is namespaced against caller columns.
    val saltCol = "__graft_salt"
    val b = big.withColumn(saltCol,
      pmod(coalesce(saltFrom, lit(0)), lit(salts)).cast("int"))
    val s = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, saltCol)).drop(saltCol)
  }
}
