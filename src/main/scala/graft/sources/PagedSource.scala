package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** S5/S7: paginated REST/JSON scans (get_data_from_apis_instance.py:11-75,
  * get_data_apis_vanilla.py:911-957).
  *
  * The reference loops `GET route?limit&offset` until an empty page or
  * `offset >= max_objects`, sleeping between pages. Network fetch is a
  * driver-side source concern (zero-egress here); the engine models it as a
  * page-pump: a `fetchPage(offset) => Option[pageText]` function drained on
  * the driver into a Dataset of raw page chunks, then parsed in parallel
  * (`spark.read.json` over the distributed chunks). Retries/rate limits
  * wrap `fetchPage` at the call site — they never enter the data plane.
  */
object PagedSource {

  /** Drain pages until exhaustion or maxObjects; one row per page. */
  def drainPages(spark: SparkSession, fetchPage: Long => Option[String],
                 limit: Long, maxObjects: Long = Long.MaxValue): Dataset[String] = {
    import spark.implicits._
    val pages = Iterator.iterate(0L)(_ + limit)
      .map(off => if (off >= maxObjects) None else fetchPage(off))
      .takeWhile(_.isDefined)
      .flatten
      .toSeq
    spark.createDataset(pages)
  }

  /** JSON-lines pages → parsed DataFrame (schema inferred or supplied). */
  def readJsonPages(spark: SparkSession, pages: Dataset[String]): DataFrame = {
    import spark.implicits._
    spark.read.json(pages.flatMap(_.split('\n').toSeq.filter(_.nonEmpty)))
  }
}
