package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * plan runs unchanged from sf0.001 (smoke) to a 100 TB lake — nothing here
  * hard-codes row counts or collects to the driver.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    * default. Read nanos as long and floor-convert to microseconds with
    * integer division (`div`) — a double division would lose precision at
    * ~1.7e18 ns epochs. DuckDB keeps TIMESTAMP_NS and floors to µs the same
    * way when formatting/µs-extracting, so oracle comparisons agree. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    deriveEventTime(apply(s, d, "events"))
  }

  /** Shared ts derivation for batch and streaming reads of the events
    * files: rename the raw nanos INT64 to ts_ns and floor-convert to a
    * microsecond timestamp with INTEGER division (`div`) — float division
    * would corrupt the microsecond floor at ~1.7e18 ns epochs, and this is
    * the invariant every events oracle depends on. */
  def deriveEventTime(raw: DataFrame): DataFrame =
    raw.withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts_ns div 1000")))
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
