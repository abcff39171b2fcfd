package graft

import graft.model.Quad
import graft.sources.{RdfIO, TurtleParser}

/** Full Turtle grammar (S10): parser unit coverage + distributed
  * write→read round-trip (the reference ingests real rdflib Turtle,
  * get_data_from_apis_instance.py:78-94). */
class TurtleSpec extends SparkSpec {

  private val Rdf = TurtleParser.RdfNs
  private val Xsd = TurtleParser.XsdNs

  private def p(doc: String): Set[Quad] = TurtleParser.parse(doc, "", "t").toSet

  test("prefixes, 'a', ';' and ',' continuation") {
    val doc =
      """@prefix crm: <http://www.cidoc-crm.org/cidoc-crm/> .
        |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        |crm:E21 a crm:Entity ;
        |    rdfs:label "Person"@en , "Person"@de .
        |""".stripMargin
    assert(p(doc) == Set(
      Quad("", "http://www.cidoc-crm.org/cidoc-crm/E21", Rdf + "type",
        "http://www.cidoc-crm.org/cidoc-crm/Entity"),
      Quad("", "http://www.cidoc-crm.org/cidoc-crm/E21",
        "http://www.w3.org/2000/01/rdf-schema#label", "Person",
        oType = "literal", oLang = "en"),
      Quad("", "http://www.cidoc-crm.org/cidoc-crm/E21",
        "http://www.w3.org/2000/01/rdf-schema#label", "Person",
        oType = "literal", oLang = "de")))
  }

  test("SPARQL-style PREFIX/BASE and relative IRI resolution") {
    val doc =
      """BASE <http://ex.org/>
        |PREFIX p: <http://ex.org/prop/>
        |<item/1> p:knows <item/2> .
        |""".stripMargin
    assert(p(doc) == Set(Quad("", "http://ex.org/item/1",
      "http://ex.org/prop/knows", "http://ex.org/item/2")))
  }

  test("multi-line long literals keep raw newlines and inner quotes") {
    val doc =
      "@prefix x: <http://x/> .\n" +
        "x:a x:note \"\"\"line one\nline \"two\"\n3\"\"\" .\n"
    assert(p(doc) == Set(Quad("", "http://x/a", "http://x/note",
      "line one\nline \"two\"\n3", oType = "literal")))
  }

  test("escape sequences incl. \\u and \\U decode") {
    val doc = "<http://s> <http://p> \"tab\\there\\nand \\u00e9 \\U0001F600\" ."
    val o = p(doc).head.o
    assert(o == "tab\there\nand \u00e9 " + new String(Character.toChars(0x1F600)))
  }

  test("typed literals via ^^<iri> and ^^pname; numeric/boolean shorthand") {
    val doc =
      """@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        |<http://s> <http://d> "1903-01-01"^^xsd:date ;
        |           <http://d2> "5"^^<http://www.w3.org/2001/XMLSchema#int> ;
        |           <http://n1> 42 ;
        |           <http://n2> -4.25 ;
        |           <http://n3> 1.0e3 ;
        |           <http://b> true .
        |""".stripMargin
    val quads = p(doc)
    def one(pred: String) = quads.find(_.p == pred).get
    assert(one("http://d") == Quad("", "http://s", "http://d", "1903-01-01",
      oType = "literal", oDatatype = Xsd + "date"))
    assert(one("http://d2").oDatatype == Xsd + "int")
    assert(one("http://n1") == Quad("", "http://s", "http://n1", "42",
      oType = "literal", oDatatype = Xsd + "integer"))
    assert(one("http://n2") == Quad("", "http://s", "http://n2", "-4.25",
      oType = "literal", oDatatype = Xsd + "decimal"))
    assert(one("http://n3") == Quad("", "http://s", "http://n3", "1.0e3",
      oType = "literal", oDatatype = Xsd + "double"))
    assert(one("http://b") == Quad("", "http://s", "http://b", "true",
      oType = "literal", oDatatype = Xsd + "boolean"))
  }

  test("labeled bnodes pass through; anonymous property lists nest") {
    val doc =
      """@prefix x: <http://x/> .
        |_:known x:linked [ x:inner "v" ; x:also x:thing ] .
        |""".stripMargin
    val quads = p(doc)
    val anon = quads.find(_.p == "http://x/linked").get.o
    assert(anon.startsWith("_:"))
    assert(quads.contains(Quad("", anon, "http://x/inner", "v", oType = "literal")))
    assert(quads.contains(Quad("", anon, "http://x/also", "http://x/thing")))
    assert(quads.find(_.p == "http://x/linked").get.oType == "bnode")
  }

  test("collections expand to first/rest/nil chains; () is nil") {
    val doc = "@prefix x: <http://x/> .\nx:s x:list (x:a \"b\" 3) ; x:empty () .\n"
    val quads = p(doc)
    assert(quads.find(_.p == "http://x/empty").get.o == Rdf + "nil")
    val head = quads.find(_.p == "http://x/list").get.o
    val firsts = quads.filter(_.p == Rdf + "first")
    val rests = quads.filter(_.p == Rdf + "rest")
    assert(firsts.size == 3 && rests.size == 3)
    // walk the chain
    def step(n: String): (Quad, String) = {
      val f = firsts.find(_.s == n).get
      (f, rests.find(_.s == n).get.o)
    }
    val (f1, n2) = step(head)
    val (f2, n3) = step(n2)
    val (f3, end) = step(n3)
    assert(f1.o == "http://x/a" && f1.oType == "iri")
    assert(f2.o == "b" && f2.oType == "literal")
    assert(f3.o == "3" && f3.oDatatype == Xsd + "integer")
    assert(end == Rdf + "nil")
  }

  test("PN_LOCAL: ':' and mid dots raw, backslash escapes, %-encoding, trailing dot ends statement") {
    val doc =
      """@prefix x: <http://x/> .
        |x:a.b x:p%41x x:with\/slash .
        |x:v2 x:q x:name.
        |""".stripMargin
    val quads = p(doc)
    assert(quads.contains(Quad("", "http://x/a.b", "http://x/p%41x", "http://x/with/slash")))
    assert(quads.contains(Quad("", "http://x/v2", "http://x/q", "http://x/name")))
  }

  test("comments outside strings are skipped, inside strings kept") {
    val doc = "<http://s> <http://p> \"a # not comment\" . # trailing\n# full line\n"
    assert(p(doc) == Set(Quad("", "http://s", "http://p", "a # not comment",
      oType = "literal")))
  }

  test("labeled bnodes scope per chunk (rdflib per-parse semantics) but stay verbatim in round-trips") {
    import spark.implicits._
    // Two chunks both naming _:genid1 — distinct nodes after a chunked parse
    val chunks = Seq(
      "_:genid1 <http://p> \"one\" .",
      "_:genid1 <http://p> \"two\" .")
    val parsed = RdfIO.parseTurtleChunks(spark.createDataset(chunks), "g").collect()
    assert(parsed.map(_.s).distinct.length == 2)
    assert(parsed.forall(_.s.startsWith("_:g")))
    // writeTurtle layout read-back keeps labels verbatim (one-graph labels)
    assert(TurtleParser.parse("_:b7 <http://p> \"x\" .").head.s == "_:b7")
  }

  test("anonymous-bnode seeds keep two chunks of one graph collision-free") {
    val doc = "@prefix x: <http://x/> .\nx:s x:link [ x:v 1 ] .\n"
    val a = TurtleParser.parse(doc, "g")
    val b = TurtleParser.parse(doc.replace("x:s", "x:t"), "g")
    val aAnon = a.find(_.p == "http://x/link").get.o
    val bAnon = b.find(_.p == "http://x/link").get.o
    assert(aAnon != bAnon) // different content → different seed
    // same content parses deterministically
    assert(TurtleParser.parse(doc, "g") == a)
  }

  test("TriG GRAPH blocks assign the block graph; outside statements keep the default") {
    val doc =
      """@prefix x: <http://x/> .
        |x:outer x:p "default" .
        |GRAPH <http://g1> {
        |  x:a x:p "one" ;
        |      x:q x:b .
        |  x:c x:p "two"
        |}
        |GRAPH x:g2 { x:d x:p "three" . }
        |x:after x:p "default2" .
        |""".stripMargin
    val quads = TurtleParser.parse(doc, "urn:default")
    def g(o: String) = quads.find(_.o == o).get.g
    assert(g("default") == "urn:default" && g("default2") == "urn:default")
    assert(g("one") == "http://g1" && g("http://x/b") == "http://g1" && g("two") == "http://g1")
    assert(g("three") == "http://x/g2")
  }

  test("fuzz: arbitrary garbage either parses or raises — never hangs or crashes the JVM") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val junk = Gen.oneOf(
      Gen.asciiPrintableStr.map(_.take(60)),
      Gen.listOfN(20, Gen.oneOf("<", ">", "\"", "'", "{", "}", "(", ")", "[",
        "]", ".", ";", ",", "@", "^^", "_:", "#", "\\u12", "GRAPH", "@prefix",
        "true", "-", "1.", "\n", " ")).map(_.mkString),
      Gen.const("<http://s> <http://p> "), // truncated statement
      Gen.const("\"\"\"never closed"),
      Gen.const("@prefix x: <http://x/> . x:a x:b ("),
      Gen.const("GRAPH <g> { <a> <b> "))
    (0 until 60).foreach { i =>
      junk.apply(Gen.Parameters.default, Seed(7L + i)).foreach { doc =>
        try { TurtleParser.parse(doc); () }
        catch { case _: IllegalArgumentException => () } // loud, typed failure
      }
    }
  }

  test("malformed input raises with position context") {
    val e = intercept[IllegalArgumentException](TurtleParser.parse("<http://s> <http://p> ."))
    assert(e.getMessage.contains("Turtle parse error"))
    intercept[IllegalArgumentException](TurtleParser.parse("q:x <http://p> <http://o> ."))
  }

  test("distributed round-trip: writeTurtle → readTurtle preserves the quad set") {
    import spark.implicits._
    val quads = Seq(
      Quad("", "http://www.cidoc-crm.org/cidoc-crm/E21",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://www.w3.org/2002/07/owl#Class"),
      Quad("", "http://www.cidoc-crm.org/cidoc-crm/E21",
        "http://www.w3.org/2000/01/rdf-schema#label", "Person \"the\"\nentity",
        oType = "literal", oLang = "en"),
      Quad("", "http://other.example/id", "http://www.w3.org/2000/01/rdf-schema#label",
        "1903-01-01", oType = "literal",
        oDatatype = "http://www.w3.org/2001/XMLSchema#date"),
      Quad("", "_:b7", "http://www.cidoc-crm.org/cidoc-crm/P1_is_identified_by",
        "_:b8", oType = "bnode"),
      Quad("", "http://www.cidoc-crm.org/cidoc-crm/strange",
        "http://www.w3.org/2000/01/rdf-schema#seeAlso",
        "http://www.cidoc-crm.org/cidoc-crm/E21", oType = "iri"))
    val dir = new java.io.File("target/tmp/turtle-roundtrip").getAbsolutePath
    RdfIO.writeTurtle(spark.createDataset(quads), dir)
    val back = RdfIO.readTurtle(spark, dir).collect().toSet
    assert(back == quads.toSet)
  }

  test("S9: folder tree of .ttl files parses recursively, one doc per file") {
    import spark.implicits._
    val root = java.nio.file.Paths.get("target/tmp/turtle-tree")
    val sub = root.resolve("nested")
    java.nio.file.Files.createDirectories(sub)
    java.nio.file.Files.writeString(root.resolve("a.ttl"),
      "@prefix x: <http://x/> .\nx:s1 x:p \"one\"@de .\n")
    java.nio.file.Files.writeString(sub.resolve("b.ttl"),
      "<http://x/s2> <http://x/p> <http://x/o2> .\n")
    java.nio.file.Files.writeString(sub.resolve("ignored.txt"), "not rdf")
    val quads = RdfIO.readTurtleFiles(spark, root.toString, defaultGraph = "urn:g")
      .collect().toSet
    assert(quads == Set(
      Quad("urn:g", "http://x/s1", "http://x/p", "one", oType = "literal", oLang = "de"),
      Quad("urn:g", "http://x/s2", "http://x/p", "http://x/o2")))
  }

  test("property: writer blocks round-trip through the parser on arbitrary quads") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def forAll[T](g: Gen[T], n: Int = 25)(f: T => Unit): Unit =
      (0 until n).foreach { i =>
        g.apply(Gen.Parameters.default, Seed(1000L + i)).foreach(f)
      }
    val iri = Gen.oneOf(
      "http://www.cidoc-crm.org/cidoc-crm/E21",
      "http://www.cidoc-crm.org/cidoc-crm/a+b.c",
      "http://other.example/x#frag", "urn:q:1")
    val lit: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.asciiPrintableStr.map(_.take(30)),
      Gen.const("say \"hi\" \\ and\nnewline\ttab"),
      Gen.const("üñïçødé ✓"),
      Gen.const(""))
    val quad: Gen[Quad] = for {
      s <- Gen.oneOf(iri, Gen.const("_:s7"))
      p <- iri
      kind <- Gen.oneOf("iri", "literal", "bnode")
      o <- if (kind == "iri") iri else if (kind == "bnode") Gen.const("_:b1") else lit
      flavor <- Gen.oneOf(0, 1, 2) // plain / lang / datatype
      dt <- iri
    } yield kind match {
      case "literal" if flavor == 1 => Quad("", s, p, o, "literal", "de", null)
      case "literal" if flavor == 2 => Quad("", s, p, o, "literal", null, dt)
      case k => Quad("", s, p, o, if (k == "literal") "literal" else k)
    }
    forAll(Gen.listOfN(12, quad)) { qs =>
      val distinct = qs.distinct
      val doc = RdfIO.turtleHeader(RdfIO.defaultPrefixes) +
        distinct.groupBy(_.s).map { case (s, group) =>
          RdfIO.turtleBlock(s, group, RdfIO.defaultPrefixes)
        }.mkString("\n")
      assert(TurtleParser.parse(doc).toSet == distinct.toSet, s"\ndoc was:\n$doc")
    }
  }

  test("streaming TTL harvest: paged micro-batch stream → turtle parse ≡ batch twin") {
    import spark.implicits._
    // Each paged row becomes one Turtle chunk (prefixes + ';' list + a
    // numeric literal) — the harvest flow's shape with the DSv2 paged
    // source replacing the HTTP pager, one parse task per chunk.
    def toTtl(page: Int, row: Int, payload: String): String =
      s"@prefix e: <http://e/> .\ne:p$page-$row e:payload \"$payload\" ;\n" +
        s"    e:page $page .\n"
    val batch = spark.read.format("graft.sources.PagedSourceProvider")
      .option("pages", 3).option("pageSize", 5).load()
      .select($"page", $"row_in_page", $"payload").as[(Int, Int, String)]
      .map((toTtl _).tupled)
    val expected = RdfIO.parseTurtleChunks(batch, "urn:g:harvest").collect().toSet
    assert(expected.size == 30 && expected.forall(_.g == "urn:g:harvest"))

    val stream = spark.readStream.format("graft.sources.PagedSourceProvider")
      .option("pages", 3).option("pageSize", 5).load()
      .select($"page", $"row_in_page", $"payload").as[(Int, Int, String)]
      .map((toTtl _).tupled)
    val quads = RdfIO.parseTurtleChunks(stream, "urn:g:harvest")
    val q = quads.writeStream.format("memory").queryName("ttl_harvest_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ttl_harvest_stream").as[Quad].collect().toSet
    assert(got == expected)
  }

  test("RFC-3986 base resolution: dot segments, absolute paths, network refs, fragments") {
    val doc =
      """@base <http://ex.org/a/b/c> .
        |<d> <./e> <../f> .
        |<g> </root> <//other.org/z> .
        |<h> <#frag> <?q=1> .
        |<../../../up> <i> <j> .
        |""".stripMargin
    val got = p(doc)
    assert(got == Set(
      // merge drops the base's last segment ('c'); '..' climbs one more
      Quad("", "http://ex.org/a/b/d", "http://ex.org/a/b/e", "http://ex.org/a/f"),
      Quad("", "http://ex.org/a/b/g", "http://ex.org/root", "http://other.org/z"),
      // empty-path refs keep the base path (RFC 3986 §5.3)
      Quad("", "http://ex.org/a/b/h", "http://ex.org/a/b/c#frag",
        "http://ex.org/a/b/c?q=1"),
      // excess '..' segments stop at the root, not below it
      Quad("", "http://ex.org/up", "http://ex.org/a/b/i", "http://ex.org/a/b/j")))
  }

  test("base resolution against an authority-only base") {
    val doc =
      """@base <http://ex.org> .
        |<x> <y> <z> .
        |""".stripMargin
    assert(p(doc) == Set(
      Quad("", "http://ex.org/x", "http://ex.org/y", "http://ex.org/z")))
  }

  test("EOF after '^^' and after GRAPH raise typed errors, not index bounds") {
    for (doc <- Seq("<urn:s> <urn:p> \"x\"^^", "GRAPH")) {
      val e = intercept[IllegalArgumentException](TurtleParser.parse(doc))
      assert(e.getMessage.contains("Turtle parse error"))
    }
  }

  test("TriG: dangling ';' directly before the closing '}' is grammatical") {
    val doc =
      """GRAPH <urn:g1> { <urn:s> <urn:p> <urn:o> ; }
        |""".stripMargin
    assert(p(doc) == Set(Quad("urn:g1", "urn:s", "urn:p", "urn:o")))
  }

  test("content seed uses the full 16-byte md5 (collision-safe at harvest scale)") {
    assert(TurtleParser.contentSeed("abc").length == 32)
  }

  test("round-trip survives PN_LOCAL specials in compacted IRIs") {
    import spark.implicits._
    // '+' must be backslash-escaped in PN_LOCAL; space forces <iri> fallback
    val quads = Seq(
      Quad("", "http://www.cidoc-crm.org/cidoc-crm/a+b",
        "http://www.w3.org/2000/01/rdf-schema#label", "plus", oType = "literal"),
      Quad("", "http://www.cidoc-crm.org/cidoc-crm/-lead",
        "http://www.w3.org/2000/01/rdf-schema#label", "dash", oType = "literal"))
    val dir = new java.io.File("target/tmp/turtle-pnlocal").getAbsolutePath
    RdfIO.writeTurtle(spark.createDataset(quads), dir)
    assert(RdfIO.readTurtle(spark, dir).collect().toSet == quads.toSet)
  }
}
