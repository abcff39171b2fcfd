package graft

import org.apache.spark.sql.functions._

/** 100 TB posture: date-partitioned lake layout — the standard physical
  * design for the events stream at scale. Writing partitioned by event date
  * lets the incremental watermark (P10) prune whole partitions at planning
  * time instead of scanning and filtering.
  */
class LakeLayoutSpec extends SparkSpec {

  test("date-partitioned write + partition-pruned incremental read") {
    val dir = new java.io.File("target/tmp/events-lake").getAbsolutePath
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(dir))

    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("event_date", to_date(col("ts")))
      .write.partitionBy("event_date").parquet(dir)

    val lake = spark.read.parquet(dir)
    val incremental = lake.filter(col("event_date") > lit("2024-01-25"))
    val plan = incremental.queryExecution.executedPlan.toString

    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_date"),
      s"expected partition pruning on event_date; plan:\n${plan.take(2000)}")
    // The pruned read returns exactly the rows the full-scan filter returns.
    val viaFilter = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(to_date(col("ts")) > lit("2024-01-25")).count()
    assert(incremental.count() == viaFilter)
    assert(incremental.count() > 0)
    // And it reads strictly fewer files than the full table has partitions.
    val allDirs = new java.io.File(dir).listFiles().count(_.getName.startsWith("event_date="))
    val readDirs = incremental.select("event_date").distinct().count()
    assert(readDirs < allDirs)
  }
}
