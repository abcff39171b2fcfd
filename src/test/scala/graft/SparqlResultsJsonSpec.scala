package graft

import org.apache.spark.sql.functions._
import graft.sources.SparqlResultsJson
import graft.sources.SparqlResultsJson.RTerm

/** SPARQL results-JSON endpoint source: W3C format parsing with term
  * fidelity, page-per-partition planning, and the SERVICE registration
  * round trip (the reference's S1 remote mode,
  * wikidata_index.py:129-152). */
class SparqlResultsJsonSpec extends SparkSpec {

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("parses a hand-written Wikidata-shaped results document with " +
      "full term fidelity (uri / lang literal / typed literal / bnode / " +
      "unbound / legacy typed-literal)") {
    val dir = tmpDir("sjson1")
    // hand-written page, NOT produced by the writer — pins the parser to
    // the wire format itself, including the SPARQL 1.0 "typed-literal"
    val doc =
      """{ "head": { "vars": ["item", "itemLabel", "dob"] },
        |  "results": { "bindings": [
        |    { "item": { "type": "uri",
        |                "value": "http://www.wikidata.org/entity/Q42" },
        |      "itemLabel": { "type": "literal", "xml:lang": "en",
        |                     "value": "Douglas Adams" },
        |      "dob": { "type": "literal",
        |               "datatype": "http://www.w3.org/2001/XMLSchema#dateTime",
        |               "value": "1952-03-11T00:00:00Z" } },
        |    { "item": { "type": "bnode", "value": "b0" },
        |      "dob": { "type": "typed-literal",
        |               "datatype": "http://www.w3.org/2001/XMLSchema#dateTime",
        |               "value": "1900-01-01T00:00:00Z" } }
        |  ] } }""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "page-00000.json"),
      doc.getBytes("UTF-8"))
    val df = SparqlResultsJson.bindings(spark, dir)
    assert(df.columns.toSeq == Seq(
      "item", "__kind_item", "__lang_item", "__dt_item",
      "itemLabel", "__kind_itemLabel", "__lang_itemLabel", "__dt_itemLabel",
      "dob", "__kind_dob", "__lang_dob", "__dt_dob"))
    val rows = df.orderBy("item").collect()
    assert(rows.length == 2)
    val q42 = rows.find(_.getString(0).endsWith("Q42")).get
    assert(q42.getString(1) == "iri" && q42.getString(2) == null)
    assert(q42.getString(4) == "Douglas Adams" &&
      q42.getString(5) == "literal" && q42.getString(6) == "en")
    assert(q42.getString(8) == "1952-03-11T00:00:00Z" &&
      q42.getString(11) == "http://www.w3.org/2001/XMLSchema#dateTime")
    val bn = rows.find(_.getString(0) == "b0").get
    assert(bn.getString(1) == "bnode")
    // legacy typed-literal normalizes to literal
    assert(bn.getString(9) == "literal")
    // itemLabel unbound in the bnode solution: all four columns null
    assert(bn.isNullAt(4) && bn.isNullAt(5) && bn.isNullAt(6) && bn.isNullAt(7))
  }

  test("one page file = one input partition; writer/reader round-trip " +
      "across pages") {
    val dir = tmpDir("sjson2")
    val rows = (0 until 10).map { i =>
      Seq(Some(RTerm(s"E$i", kind = "iri")),
        Some(RTerm("name", kind = "iri")),
        Some(RTerm(s"entity $i", lang = Some(if (i % 2 == 0) "en" else "de"))))
    }
    val paths = SparqlResultsJson.writePages(dir, Seq("s", "p", "o"), rows, 3)
    assert(paths.size == 4) // ceil(10/3)
    val df = SparqlResultsJson.bindings(spark, dir)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 10)
    assert(df.filter(col("__lang_o") === "en").count() == 5)
    assert(df.select("s").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted.toSeq == (0 until 10).map(i => s"E$i").sorted)
  }

  test("underscore-prefixed result vars parse (regression: vars were " +
      "recovered by a __ prefix filter, dropping legal SPARQL names)") {
    val dir = tmpDir("sjson4")
    SparqlResultsJson.writePages(dir, Seq("__x", "y"), Seq(
      Seq(Some(RTerm("A", kind = "iri")), Some(RTerm("1"))),
      Seq(Some(RTerm("B", kind = "iri")), None)), 10)
    val df = SparqlResultsJson.bindings(spark, dir)
    assert(df.columns.take(2).toSeq == Seq("__x", "__kind___x"))
    val got = df.select(col("__x"), col("y"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(got == Set(("A", Some("1")), ("B", None)))
  }

  test("asTriples + SERVICE: remote bindings join local solutions with " +
      "language fidelity intact") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmpDir("sjson3")
    SparqlResultsJson.writePages(dir, Seq("s", "p", "o"), Seq(
      Seq(Some(RTerm("P1", kind = "iri")), Some(RTerm("award", kind = "iri")),
        Some(RTerm("Nobel", lang = Some("en")))),
      Seq(Some(RTerm("P1", kind = "iri")), Some(RTerm("award", kind = "iri")),
        Some(RTerm("Nobelpreis", lang = Some("de")))),
      Seq(Some(RTerm("P2", kind = "iri")), Some(RTerm("award", kind = "iri")),
        Some(RTerm("Booker", lang = Some("en"))))), 2)
    val endpoint = SparqlResultsJson.asTriples(
      SparqlResultsJson.bindings(spark, dir))
    assert(endpoint.columns.toSeq ==
      Seq("s", "p", "o", "oLang", "oDatatype", "oType"))
    val local = Seq(("P1", "type", "Person"), ("P2", "type", "Person"),
      ("P3", "type", "Person")).toDF("s", "p", "o")
    val labels = Seq.empty[(String, String, String)]
      .toDF("entity", "lang", "label")
    graft.plans.SparqlText.registerService("http://remote/sparql", endpoint)
    try {
      val out = graft.plans.SparqlText.run(
        """SELECT ?p ?a WHERE {
          |  ?p <type> <Person> .
          |  SERVICE <http://remote/sparql> {
          |    ?p <award> ?a FILTER(LANG(?a) = "en")
          |  }
          |}""".stripMargin, local, labels)
      assert(out.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
        Set(("P1", "Nobel"), ("P2", "Booker")))
    } finally graft.plans.SparqlText.unregisterService("http://remote/sparql",
      spark)
  }

  test("PageFetcher seam: bindingsVia(DiskPageFetcher) over the spool " +
      "equals the direct file read — the fixture and HTTP paths share " +
      "the pagination loop and parser") {
    val dir = tmpDir("sjsonSeamSrc")
    val rows = (0 until 7).map(i => Seq(
      Some(RTerm(s"http://x/E$i", "iri")),
      Some(RTerm(s"name $i", "literal", lang = Some("en")))))
    SparqlResultsJson.writePages(dir, Seq("s", "name"), rows, pageSize = 3)
    val spool = tmpDir("sjsonSeamSpool")
    val viaSeam = SparqlResultsJson.bindingsVia(spark,
      new graft.sources.DiskPageFetcher(dir), limit = 3, spoolDir = spool)
    val direct = SparqlResultsJson.bindings(spark, dir)
    assert(viaSeam.collect().map(_.toSeq).toSet ==
      direct.collect().map(_.toSeq).toSet)
    // the short final page (1 row < limit 3) stopped the loop: 3 pages
    assert(new java.io.File(spool).listFiles().count(
      _.getName.endsWith(".json")) == 3)
  }

  test("RetryingFetcher: transient failures retry on the exponential " +
      "backoff schedule, page delays rate-limit between pages, and " +
      "exhausted retries propagate") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    class Flaky(failures: Int) extends graft.sources.PageFetcher {
      private var remaining = failures
      var calls = 0
      override def fetch(offset: Long, limit: Long): Option[String] = {
        calls += 1
        if (remaining > 0) { remaining -= 1; throw new RuntimeException("503") }
        if (offset >= 4) None else Some(s"page@$offset")
      }
    }
    // two transient failures → two backoff sleeps (1×, 2×), then success
    val f1 = new Flaky(2)
    val r1 = new graft.sources.RetryingFetcher(f1, maxRetries = 3,
      backoffMs = 100L, pageDelayMs = 0L, sleeper = sleeps += _)
    assert(r1.fetch(0, 2).contains("page@0") && f1.calls == 3)
    assert(sleeps.toSeq == Seq(100L, 200L))
    // rate limit: no delay before the first page, one before each later
    sleeps.clear()
    val r2 = new graft.sources.RetryingFetcher(new Flaky(0), maxRetries = 0,
      backoffMs = 0L, pageDelayMs = 50L, sleeper = sleeps += _)
    assert(r2.fetch(0, 2).isDefined && sleeps.isEmpty)
    assert(r2.fetch(2, 2).isDefined && sleeps.toSeq == Seq(50L))
    // retries exhausted: the transport error surfaces, after maxRetries
    // backoffs
    sleeps.clear()
    val r3 = new graft.sources.RetryingFetcher(new Flaky(10), maxRetries = 2,
      backoffMs = 10L, pageDelayMs = 0L, sleeper = sleeps += _)
    intercept[RuntimeException](r3.fetch(0, 2))
    assert(sleeps.toSeq == Seq(10L, 20L))
  }
}
