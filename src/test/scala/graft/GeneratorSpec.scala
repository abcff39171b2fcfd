package graft

import graft.generators.Worklist
import graft.model.Triple

/** Typed generators + worklist expansion (G2/G10 + J8). */
class GeneratorSpec extends SparkSpec {
  import spark.implicits._

  test("renderPerson emits type/label/nation reference") {
    val t = Worklist.renderPerson(Worklist.PersonRow(7, "Ada", 3))
    assert(t == Seq(
      Triple("C7", "type", "E21_Person"),
      Triple("C7", "label", "Ada", oType = "literal"),
      Triple("C7", "nation", "N3")))
  }

  test("worklist expansion renders only referenced places (J8 anti-join)") {
    val dir = "/root/testdata/sf0.001"
    val triples = Worklist.expand(spark, dir)
    val placeSubjects = triples.filter($"p" === "type" && $"o" === "E53_Place")
      .select("s").as[String].collect().toSet
    val referenced = triples.filter($"p" === "nation")
      .select("o").as[String].collect().toSet
    assert(placeSubjects == referenced, "round 2 must render exactly the referenced frontier")
  }

  test("expansion output is a set (D4 idempotent graph semantics)") {
    val triples = Worklist.expand(spark, "/root/testdata/sf0.001")
    assert(triples.count() == triples.dropDuplicates("s", "p", "o").count())
  }
}
