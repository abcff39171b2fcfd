package graft

import graft.model.Quad
import graft.sources.{PagedSource, RdfIO}

/** Turtle writer (K3) and paginated page-pump source (S5/S7). */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("Turtle writer: prefix compaction, subject grouping, literals") {
    val quads = Seq(
      Quad("", "http://www.cidoc-crm.org/cidoc-crm/E21", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://www.w3.org/2002/07/owl#Class"),
      Quad("", "http://www.cidoc-crm.org/cidoc-crm/E21", "http://www.w3.org/2000/01/rdf-schema#label",
        "Person", oType = "literal", oLang = "en"))
    val dir = new java.io.File("target/tmp/turtle-out").getAbsolutePath
    RdfIO.writeTurtle(spark.createDataset(quads), dir)
    val header = spark.read.text(s"$dir/_prefixes").as[String].collect().mkString("\n")
    val body = spark.read.text(s"$dir/body").as[String].collect().mkString("\n")
    assert(header.contains("@prefix crm: <http://www.cidoc-crm.org/cidoc-crm/> ."))
    assert(body.contains("crm:E21"))
    assert(body.contains("rdf:type owl:Class"))
    assert(body.contains("rdfs:label \"Person\"@en"))
    assert(body.count(_ == '.') >= 1) // subject block terminated
  }

  test("page pump: drains until empty page, respects maxObjects") {
    val store = (0 until 25).map(i => s"""{"id": $i}""")
    def fetch(limit: Long)(offset: Long): Option[String] = {
      val page = store.slice(offset.toInt, (offset + limit).toInt)
      if (page.isEmpty) None else Some(page.mkString("\n"))
    }
    val all = PagedSource.readJsonPages(spark,
      PagedSource.drainPages(spark, fetch(10), limit = 10))
    assert(all.count() == 25)
    assert(all.agg(org.apache.spark.sql.functions.max("id")).collect()(0).getLong(0) == 24)

    val truncated = PagedSource.readJsonPages(spark,
      PagedSource.drainPages(spark, fetch(10), limit = 10, maxObjects = 20))
    assert(truncated.count() == 20)
  }
}
