package graft

import graft.plans.SparqlAlgebra

/** BGP / OPTIONAL / label-service semantics on hand-built triples. */
class SparqlAlgebraSpec extends SparkSpec {
  import spark.implicits._

  private lazy val triples = Seq(
    ("p1", "type", "Person"), ("p1", "nation", "n1"), ("p1", "label", "Ada"),
    ("p2", "type", "Person"), ("p2", "nation", "n2"), ("p2", "label", "Bob"),
    ("n1", "type", "Place"), ("n2", "type", "Place")
  ).toDF("s", "p", "o")

  test("BGP joins patterns on shared variables") {
    val got = SparqlAlgebra.bgp(Seq(
      SparqlAlgebra.patternConstO(triples, "type", "Person", "x"),
      SparqlAlgebra.pattern(triples, "nation", "x", "n"),
      SparqlAlgebra.pattern(triples, "label", "x", "name")))
      .as[(String, String, String)].collect().toSet
    assert(got == Set(("p1", "n1", "Ada"), ("p2", "n2", "Bob")))
  }

  test("OPTIONAL keeps left rows with nulls; inner filter pre-applied (J3)") {
    val left = Seq("p1", "p2").toDF("x")
    val right = triples.filter($"p" === "label" && $"o" === "Ada")
      .select($"s".as("x"), $"o".as("name"))
    val got = SparqlAlgebra.optional(left, right)
      .as[(String, Option[String])].collect().toSet
    assert(got == Set(("p1", Some("Ada")), ("p2", None)))
  }

  test("label service: language priority with id fallback (J7)") {
    val ents = Seq("e1", "e2", "e3").toDF("node")
    val labels = Seq(
      ("e1", "en", "one"), ("e1", "de", "eins"),
      ("e2", "en", "two"),
      ("e3", "fr", "trois") // not in priority → fallback to id
    ).toDF("entity", "lang", "label")
    val got = SparqlAlgebra.labelService(ents, labels, "node", "label", Seq("de", "en"))
      .select("node", "label").as[(String, String)].collect().toSet
    assert(got == Set(("e1", "eins"), ("e2", "two"), ("e3", "e3")))
  }
}
