package graft

import graft.model.Quad
import graft.sources.RdfIO

/** N-Triples/N-Quads parse + format roundtrip (S9/S10/K3). */
class RdfIOSpec extends SparkSpec {

  test("parse IRI triple") {
    assert(RdfIO.parseLine("<http://a> <http://p> <http://b> .")
      .contains(Quad("", "http://a", "http://p", "http://b")))
  }

  test("parse quad with graph") {
    assert(RdfIO.parseLine("<http://a> <http://p> <http://b> <http://g> .")
      .contains(Quad("http://g", "http://a", "http://p", "http://b")))
  }

  test("parse plain / lang / typed literals") {
    assert(RdfIO.parseLine("""<http://a> <http://p> "hi" .""")
      .contains(Quad("", "http://a", "http://p", "hi", oType = "literal")))
    assert(RdfIO.parseLine("""<http://a> <http://p> "hallo"@de .""")
      .contains(Quad("", "http://a", "http://p", "hallo", oType = "literal", oLang = "de")))
    assert(RdfIO.parseLine(
      """<http://a> <http://p> "1903-01-01T00:00:00"^^<http://www.w3.org/2001/XMLSchema#dateTime> .""")
      .contains(Quad("", "http://a", "http://p", "1903-01-01T00:00:00",
        oType = "literal", oDatatype = "http://www.w3.org/2001/XMLSchema#dateTime")))
  }

  test("parse typed literal inside a named graph") {
    assert(RdfIO.parseLine(
      """<http://a> <http://p> "x"^^<http://dt> <http://g> .""")
      .contains(Quad("http://g", "http://a", "http://p", "x",
        oType = "literal", oDatatype = "http://dt")))
  }

  test("parse bnode subject and object") {
    assert(RdfIO.parseLine("_:b1 <http://p> _:b2 .")
      .contains(Quad("", "_:b1", "http://p", "_:b2", oType = "bnode")))
  }

  test("comments and garbage are skipped") {
    assert(RdfIO.parseLine("# comment").isEmpty)
    assert(RdfIO.parseLine("").isEmpty)
    assert(RdfIO.parseLine("not rdf at all").isEmpty)
  }

  test("escape roundtrip for quotes, backslashes, newlines") {
    val q = Quad("", "http://a", "http://p", "say \"hi\"\\\nnext", oType = "literal")
    assert(RdfIO.parseLine(RdfIO.formatLine(q)).contains(q))
  }

  test("distributed roundtrip through text files with D4 set-dedup") {
    import spark.implicits._
    val quads = Seq(
      Quad("http://g", "http://s", "http://p", "http://o"),
      Quad("http://g", "http://s", "http://p", "http://o"), // duplicate
      Quad("", "http://s", "http://p", "lit", oType = "literal", oLang = "en"))
    val dir = new java.io.File("target/tmp/rdfio-roundtrip").getAbsolutePath
    RdfIO.writeQuads(spark.createDataset(quads), dir)
    val back = RdfIO.readQuads(spark, dir).collect().toSet
    assert(back == quads.distinct.toSet)
  }
}
