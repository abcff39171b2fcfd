package graft

import org.apache.spark.sql.functions._
import graft.sources.PagedGen

/** DataSourceV2 paged source: partition-per-page planning, deterministic
  * content, full-scan integrity. */
class PagedDsv2Spec extends SparkSpec {
  import spark.implicits._

  private def read(pages: Int, pageSize: Int) =
    spark.read.format("graft.sources.PagedSourceProvider")
      .option("pages", pages).option("pageSize", pageSize).load()

  test("plans one input partition per page") {
    val df = read(5, 10)
    assert(df.rdd.getNumPartitions == 5)
    assert(df.count() == 50)
  }

  test("rows are deterministic and page-aligned") {
    val df = read(3, 4)
    val rows = df.select($"id", $"page", $"row_in_page", $"payload")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    assert(rows.length == 12)
    rows.foreach { case (id, page, row, payload) =>
      assert(id == page.toLong * 4 + row)
      assert(payload == PagedGen.payload(page, row))
    }
    // payload is the md5 of "page:row"
    assert(rows.head._4 == java.security.MessageDigest.getInstance("MD5")
      .digest("0:0".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("aggregation over the source distributes per page") {
    val agg = read(4, 100).groupBy($"page").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
    assert(agg == Map(0 -> 100L, 1 -> 100L, 2 -> 100L, 3 -> 100L))
  }
}
