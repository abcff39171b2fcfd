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

  private def quadRows(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, String, String, Option[String])].collect().toSeq
      .sortBy(q => (q._1, q._2, q._3, q._4.getOrElse("")))

  test("unscoped ops on a quad store hit the default graph only") {
    val quads = Seq(("a", "p", "b", Some("g1")), ("a", "p", "c", None))
      .toDF("s", "p", "o", "g")
    val got = SparqlText.update(
      "INSERT DATA { <x> <p> <y> } ; DELETE WHERE { ?s <p> ?o }", quads)
    // the named-graph row survives; the default-graph rows (old + fresh
    // insert) are matched by the unscoped DELETE WHERE
    assert(quadRows(got) == Seq(("a", "p", "b", Some("g1"))))
  }

  test("CLEAR/DROP GRAPH, DEFAULT, NAMED, ALL") {
    val quads = Seq(
      ("a", "p", "b", Some("g1")), ("c", "p", "d", Some("g2")),
      ("e", "p", "f", None)).toDF("s", "p", "o", "g")
    assert(quadRows(SparqlText.update("CLEAR GRAPH <g1>", quads)) ==
      Seq(("c", "p", "d", Some("g2")), ("e", "p", "f", None)))
    assert(quadRows(SparqlText.update("DROP SILENT GRAPH <g1>", quads)) ==
      Seq(("c", "p", "d", Some("g2")), ("e", "p", "f", None)))
    assert(quadRows(SparqlText.update("CLEAR DEFAULT", quads)) ==
      Seq(("a", "p", "b", Some("g1")), ("c", "p", "d", Some("g2"))))
    assert(quadRows(SparqlText.update("CLEAR NAMED", quads)) ==
      Seq(("e", "p", "f", None)))
    assert(quadRows(SparqlText.update("CLEAR ALL", quads)).isEmpty)
    // a missing graph is an empty graph (no empty-graph bookkeeping):
    // no-op success, with or without SILENT
    assert(quadRows(SparqlText.update("DROP GRAPH <nope>", quads)) ==
      quadRows(quads))
  }

  test("ADD copies into the destination; COPY replaces it; MOVE also drops the source") {
    val quads = Seq(
      ("a", "p", "b", Some("g1")), ("x", "q", "y", Some("g2")),
      ("a", "p", "b", Some("g2")), ("d", "r", "e", None))
      .toDF("s", "p", "o", "g")
    // ADD: g1's rows land in g2 minus what g2 already has; g1 unchanged
    assert(quadRows(SparqlText.update("ADD GRAPH <g1> TO GRAPH <g2>", quads)) ==
      quadRows(quads)) // (a,p,b) already present in g2 → set semantics no-op
    assert(quadRows(SparqlText.update("ADD DEFAULT TO GRAPH <g2>", quads)) ==
      (quadRows(quads) :+ (("d", "r", "e", Some("g2")))).sortBy(q =>
        (q._1, q._2, q._3, q._4.getOrElse(""))))
    // COPY: g2 becomes exactly g1's rows
    assert(quadRows(SparqlText.update("COPY GRAPH <g1> TO GRAPH <g2>", quads)) ==
      Seq(("a", "p", "b", Some("g1")), ("a", "p", "b", Some("g2")),
        ("d", "r", "e", None)))
    // MOVE: like COPY, then the source graph is dropped
    assert(quadRows(SparqlText.update("MOVE GRAPH <g1> TO GRAPH <g2>", quads)) ==
      Seq(("a", "p", "b", Some("g2")), ("d", "r", "e", None)))
    // MOVE to DEFAULT
    assert(quadRows(SparqlText.update("MOVE GRAPH <g2> TO DEFAULT", quads)) ==
      Seq(("a", "p", "b", None), ("a", "p", "b", Some("g1")),
        ("x", "q", "y", None)))
    // same graph on both sides is the spec'd no-op; CREATE is a no-op too
    assert(quadRows(SparqlText.update("MOVE GRAPH <g1> TO GRAPH <g1>", quads)) ==
      quadRows(quads))
    assert(quadRows(SparqlText.update("CREATE GRAPH <g9>", quads)) ==
      quadRows(quads))
  }

  test("INSERT/DELETE DATA with GRAPH sections target their graphs") {
    val quads = Seq(("a", "p", "b", Some("g1"))).toDF("s", "p", "o", "g")
    val got = SparqlText.update(
      """INSERT DATA { <d> <p> <e> . GRAPH <g1> { <f> <p> <g> } .
        |               GRAPH <g2> { <h> <p> <i> } }""".stripMargin, quads)
    assert(quadRows(got) == Seq(
      ("a", "p", "b", Some("g1")), ("d", "p", "e", None),
      ("f", "p", "g", Some("g1")), ("h", "p", "i", Some("g2"))))
    val del = SparqlText.update(
      "DELETE DATA { GRAPH <g1> { <a> <p> <b> } }", quads)
    assert(quadRows(del).isEmpty)
    // the same GRAPH section on a TRIPLE store refuses loudly
    val e = intercept[RuntimeException](SparqlText.update(
      "INSERT DATA { GRAPH <g1> { <a> <p> <b> } }", store(("a", "p", "b"))))
    assert(e.getMessage.contains("quad store"))
  }

  test("per-op WITH scopes one op and overrides a leading request WITH") {
    val quads = Seq(
      ("a", "seg", "x", Some("g1")), ("b", "seg", "y", Some("g2")))
      .toDF("s", "p", "o", "g")
    val got = SparqlText.update(
      """WITH <g1> DELETE WHERE { ?s <seg> ?o } ;
        |WITH <g2> DELETE WHERE { ?s <seg> ?o }""".stripMargin, quads)
    assert(quadRows(got).isEmpty)
    // WITH belongs to modify forms only (§3.1.3's grammar)
    assertThrows[RuntimeException](SparqlText.parseUpdate(
      "WITH <g1> INSERT DATA { <a> <p> <b> } ; WITH <g2> CLEAR ALL"))
  }

  test("USING re-bases the WHERE; effects still hit the target graph") {
    val quads = Seq(
      ("a", "nation", "n1", Some("gsrc")), ("n1", "label", "L", None))
      .toDF("s", "p", "o", "g")
    // WHERE matches inside gsrc (not the default graph); the insert lands
    // in the default graph (no WITH)
    val got = SparqlText.update(
      """INSERT { ?s <from_src> ?n } USING <gsrc> WHERE { ?s <nation> ?n }""",
      quads)
    assert(quadRows(got).contains(("a", "from_src", "n1", None)))
    // only USING NAMED → the WHERE's default graph is EMPTY (§3.1.3)
    val none = SparqlText.update(
      """INSERT { ?s <x> ?n } USING NAMED <gsrc> WHERE { ?s <nation> ?n }""",
      quads)
    assert(quadRows(none) == quadRows(quads))
    // USING on a triple store refuses loudly
    val e = intercept[RuntimeException](SparqlText.update(
      "INSERT { ?s <x> ?o } USING <g> WHERE { ?s <p> ?o }",
      store(("a", "p", "b"))))
    assert(e.getMessage.contains("quad store"))
  }

  test("LOAD parses a Turtle document into the store") {
    val dir = java.nio.file.Files.createTempDirectory("graft-load")
    val doc = dir.resolve("d.ttl")
    java.nio.file.Files.writeString(doc,
      "@prefix x: <http://x/> .\nx:a x:p x:b .\n")
    val quads = Seq(("q", "r", "s", Some("g1"))).toDF("s", "p", "o", "g")
    val got = SparqlText.update(s"LOAD <file://$doc>", quads)
    assert(quadRows(got).contains(("http://x/a", "http://x/p", "http://x/b", None)))
    val intoG = SparqlText.update(s"LOAD <file://$doc> INTO GRAPH <g9>", quads)
    assert(quadRows(intoG).contains(
      ("http://x/a", "http://x/p", "http://x/b", Some("g9"))))
    // missing document: SILENT → no-op, otherwise loud
    assert(quadRows(SparqlText.update(
      s"LOAD SILENT <file://$dir/absent.ttl>", quads)) == quadRows(quads))
    val e = intercept[RuntimeException](
      SparqlText.update(s"LOAD <file://$dir/absent.ttl>", quads))
    assert(e.getMessage.contains("not found"))
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
        "MODIFY", "GRAPH", "(", ")", "CLEAR", "DROP", "CREATE", "ADD",
        "COPY", "MOVE", "LOAD", "USING", "NAMED", "SILENT", "TO", "INTO",
        "DEFAULT", "ALL", "WITH")).map(_.mkString(" ")),
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
