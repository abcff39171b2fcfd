package graft

import graft.plans.SparqlText

/** SPARQL 1.1 Update semantics: ground inserts/deletes, set semantics on
  * the delta, pattern-driven deletes with join-correlated bindings, `;`
  * sequencing, and loud failures on malformed requests. */
class SparqlUpdateSpec extends SparkSpec {
  import spark.implicits._

  private def store(rows: (String, String, String)*) =
    rows.toDF("s", "p", "o")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, String, String)].collect().toSeq.sorted

  test("INSERT DATA adds absent triples only (idempotent on re-run)") {
    val st = store(("a", "knows", "b"))
    val once = SparqlText.update(
      """INSERT DATA { <a> <knows> <b> . <a> <knows> <c> }""", st)
    assert(rows(once) == Seq(("a", "knows", "b"), ("a", "knows", "c")))
    val twice = SparqlText.update(
      """INSERT DATA { <a> <knows> <c> }""", once)
    assert(rows(twice) == rows(once))
  }

  test("INSERT DATA never collapses pre-existing duplicate rows") {
    val st = store(("a", "p", "b"), ("a", "p", "b"))
    val got = SparqlText.update("""INSERT DATA { <x> <p> <y> }""", st)
    assert(rows(got) == Seq(("a", "p", "b"), ("a", "p", "b"), ("x", "p", "y")))
  }

  test("DELETE DATA removes exactly the named triples") {
    val st = store(("a", "p", "b"), ("a", "p", "c"), ("d", "q", "e"))
    val got = SparqlText.update("""DELETE DATA { <a> <p> <c> . <z> <z> <z> }""", st)
    assert(rows(got) == Seq(("a", "p", "b"), ("d", "q", "e")))
  }

  test("DELETE WHERE with a single pattern and constants") {
    val st = store(("a", "seg", "x"), ("b", "seg", "y"), ("a", "lab", "A"))
    val got = SparqlText.update("""DELETE WHERE { ?s <seg> ?o }""", st)
    assert(rows(got) == Seq(("a", "lab", "A")))
  }

  test("DELETE WHERE instantiates join-correlated patterns exactly") {
    // delete each person's label ONLY when they live in n1 — the label
    // pattern alone matches b too, the join must restrict it
    val st = store(
      ("a", "nation", "n1"), ("b", "nation", "n2"),
      ("a", "label", "A"), ("b", "label", "B"))
    val got = SparqlText.update(
      """DELETE WHERE { ?s <nation> <n1> . ?s <label> ?l }""", st)
    assert(rows(got) == Seq(("b", "label", "B"), ("b", "nation", "n2")))
  }

  test("repeated variable in one pattern means equality") {
    val st = store(("a", "p", "a"), ("a", "p", "b"))
    val got = SparqlText.update("""DELETE WHERE { ?x <p> ?x }""", st)
    assert(rows(got) == Seq(("a", "p", "b")))
  }

  test("';' sequences apply left to right") {
    val st = store(("a", "p", "b"))
    val got = SparqlText.update(
      """INSERT DATA { <c> <p> <d> } ;
        |DELETE WHERE { ?s <p> <b> } ;
        |INSERT DATA { <e> <p> <f> }""".stripMargin, st)
    assert(rows(got) == Seq(("c", "p", "d"), ("e", "p", "f")))
  }

  test("PREFIX declarations resolve inside update blocks") {
    val st = store(("http://x/a", "http://x/p", "b"))
    val got = SparqlText.update(
      """PREFIX x: <http://x/>
        |DELETE WHERE { ?s x:p ?o }""".stripMargin, st)
    assert(rows(got).isEmpty)
  }

  test("DELETE/INSERT WHERE renames a predicate under pre-state bindings") {
    val st = store(("a", "seg", "x"), ("b", "seg", "y"), ("a", "lab", "A"))
    val got = SparqlText.update(
      """DELETE { ?s <seg> ?o } INSERT { ?s <mkt> ?o } WHERE { ?s <seg> ?o }""", st)
    assert(rows(got) == Seq(("a", "lab", "A"), ("a", "mkt", "x"), ("b", "mkt", "y")))
  }

  test("INSERT WHERE materializes a join-derived edge") {
    val st = store(
      ("c1", "nation", "n1"), ("n1", "region", "r1"), ("c2", "nation", "n9"))
    val got = SparqlText.update(
      """INSERT { ?s <in_region> ?r } WHERE { ?s <nation> ?n . ?n <region> ?r }""",
      st)
    assert(rows(got).contains(("c1", "in_region", "r1")))
    assert(!rows(got).exists(t => t._1 == "c2" && t._2 == "in_region"))
  }

  test("INSERT WHERE never duplicates an existing triple") {
    val st = store(("a", "p", "b"), ("a", "q", "b"))
    val got = SparqlText.update(
      """INSERT { ?s <q> ?o } WHERE { ?s <p> ?o }""", st)
    assert(rows(got) == Seq(("a", "p", "b"), ("a", "q", "b")))
  }

  test("template variables unbound by WHERE fail loudly") {
    val st = store(("a", "p", "b"))
    assertThrows[RuntimeException](SparqlText.update(
      "DELETE { ?s <p> ?missing } WHERE { ?s <p> ?o }", st))
  }

  test("WITH <g> scopes the update to one named graph of a quad store") {
    val quads = Seq(
      ("a", "seg", "x", "g1"), ("a", "lab", "A", "g1"),
      ("b", "seg", "y", "g2")).toDF("s", "p", "o", "g")
    val got = SparqlText.update(
      """WITH <g1>
        |DELETE WHERE { ?s <seg> ?o } ;
        |INSERT DATA { <c> <seg> <z> }""".stripMargin, quads)
      .as[(String, String, String, String)].collect().toSeq.sorted
    // g1's seg row deleted, the insert lands in g1, g2 untouched
    assert(got == Seq(("a", "lab", "A", "g1"), ("b", "seg", "y", "g2"),
      ("c", "seg", "z", "g1")))
  }

  test("WITH <g> keeps default-graph rows (g IS NULL) in the remainder") {
    // `g =!= lit` is three-valued: NULL-g rows would vanish silently from
    // the untouched remainder. The remainder filter must be null-safe.
    val quads = Seq(
      ("a", "seg", "x", "g1"), ("d", "seg", "w", null)).toDF("s", "p", "o", "g")
    val got = SparqlText.update(
      "WITH <g1> DELETE WHERE { ?s <seg> ?o }", quads)
      .as[(String, String, String, Option[String])].collect().toSeq.sorted
    assert(got == Seq(("d", "seg", "w", None)))
  }

  test("WITH on a non-quad store fails loudly") {
    val st = store(("a", "p", "b"))
    val e = intercept[RuntimeException](
      SparqlText.update("WITH <g1> DELETE WHERE { ?s <p> ?o }", st))
    assert(e.getMessage.contains("quad store"))
  }

  test("a quad store is refused, not silently projected") {
    val quads = Seq(("a", "p", "b", "g1")).toDF("s", "p", "o", "g")
    val e = intercept[RuntimeException](
      SparqlText.update("INSERT DATA { <x> <p> <y> }", quads))
    assert(e.getMessage.contains("(s, p, o)"))
  }

  test("BASE resolves relative IRIs inside update blocks") {
    val st = store(("http://x/a", "http://x/p", "http://x/b"))
    val got = SparqlText.update(
      """BASE <http://x/>
        |DELETE WHERE { ?s <p> ?o }""".stripMargin, st)
    assert(rows(got).isEmpty)
  }

  test("fuzz: arbitrary garbage either parses or raises — never hangs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val junk = Gen.oneOf(
      Gen.asciiPrintableStr.map(_.take(60)),
      Gen.listOfN(12, Gen.oneOf("INSERT", "DELETE", "DATA", "WHERE", "{",
        "}", "?x", "<a>", "\"lit\"", "a:b", ".", ";", "PREFIX", ":",
        "MODIFY", "GRAPH", "(", ")")).map(_.mkString(" ")),
      Gen.const("INSERT DATA { <a> <p> "), // truncated
      Gen.const("DELETE { ?s <p> ?o } INSERT {"),
      Gen.const("DELETE WHERE { ?s"))
    (0 until 60).foreach { i =>
      junk.apply(Gen.Parameters.default, Seed(7L + i)).foreach { q =>
        try { SparqlText.parseUpdate(q); () }
        catch { case _: RuntimeException => () } // loud, typed failure
      }
    }
  }

  test("malformed requests fail loudly") {
    val st = store(("a", "p", "b"))
    assertThrows[RuntimeException](
      SparqlText.update("INSERT DATA { ?v <p> <o> }", st)) // var in DATA
    assertThrows[RuntimeException](
      SparqlText.update("DELETE { <a> <p> <b> }", st)) // bare DELETE
    assertThrows[RuntimeException](
      SparqlText.update("INSERT DATA { <a> <p> }", st)) // truncated triple
  }
}
