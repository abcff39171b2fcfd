package graft

import java.nio.file.{Files, Paths}

/** 100 TB posture: bucketed tables co-locate join keys so repeated joins on
  * the bucket key run WITHOUT a shuffle exchange on either side — the
  * engine's answer for the reference's biggest recurring join (triple-table
  * self-joins at scale, SURVEY.md §4.2 "triple-table physical layout").
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key join plans without shuffle exchanges") {
    // warehouse dir is a static conf — set in TestSpark's builder. The
    // metastore is fresh per JVM, so also remove stale table directories a
    // previous run may have left (DROP TABLE won't know about them).
    Files.createDirectories(Paths.get("target/tmp/warehouse"))
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File("target/tmp/warehouse/b_orders"))
    rm(new java.io.File("target/tmp/warehouse/b_customer"))

    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    val c = Tables.customer(spark, "/root/testdata/sf0.001")
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    c.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    // Disable broadcast so the join would need a shuffle were it not
    // co-located by bucketing.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          spark.table("b_orders")("o_custkey") === spark.table("b_customer")("c_custkey"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"bucketed join must not shuffle; plan was:\n$physical")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
