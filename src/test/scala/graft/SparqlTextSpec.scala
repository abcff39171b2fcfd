package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.{SparqlAlgebra, SparqlText}

/** SPARQL text front-end: the two person queries the reference dispatches
  * (prosnet-prefect-pipelines/sparql/wikidata-person.sparql and
  * wikidata-person-backup.sparql) parse and compile to the same rows as
  * their hand-written SparqlAlgebra compilations. */
class SparqlTextSpec extends SparkSpec {
  import spark.implicits._

  /** (s, p, o, oLang) fixture: citizenships, birth/death dates, lang-tagged
    * descriptions. */
  private lazy val triples: DataFrame = Seq(
    ("P1", "wdt:P27", "wd:Q40", None), ("P2", "wdt:P27", "wd:Q40", None),
    ("P3", "wdt:P27", "wd:Q28513", None), ("P4", "wdt:P27", "wd:Q131964", None),
    ("P5", "wdt:P27", "wd:Q699964", None), ("P6", "wdt:P27", "wd:Q183", None),
    ("P7", "wdt:P27", "wd:Q28513", None), ("P8", "wdt:P27", "wd:Q40", None),
    ("P1", "wdt:P569", "1900-05-01", None), ("P2", "wdt:P569", "1360-01-01", None),
    ("P3", "wdt:P569", "1949-12-31", None), ("P4", "wdt:P569", "1970-01-01", None),
    ("P5", "wdt:P569", "1949-01-01", None), ("P6", "wdt:P569", "1800-01-01", None),
    ("P7", "wdt:P569", "1200-01-01", None), ("P8", "wdt:P569", "1940-02-02", None),
    ("P1", "wdt:P570", "1980-01-01", None), ("P3", "wdt:P570", "2000-06-15", None),
    ("P5", "wdt:P570", "1999-09-09", None),
    ("P1", "schema:description", "Dichter", Some("de")),
    ("P1", "schema:description", "poet", Some("en")),
    ("P3", "schema:description", "writer", Some("en")),
    ("P5", "schema:description", "Maler", Some("de"))
  ).toDF("s", "p", "o", "oLang")

  private lazy val labels: DataFrame = Seq(
    ("P1", "de", "Eins"), ("P1", "en", "One"),
    ("P3", "en", "Three"), ("P5", "de", "Fuenf")
  ).toDF("entity", "lang", "label")

  private def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet

  test("wikidata-person-backup.sparql ≡ hand compilation") {
    // sparql/wikidata-person-backup.sparql (verbatim semantics: 4 UNION
    // citizenship arms, required birth+death, two dateTime FILTERs, label
    // service, unbound projected vars, $limit/$offset)
    val text =
      """SELECT (?item as ?id) ?description ?itemLabel ?date_of_birth ?date_of_death ?place_of_birth ?place_of_death
        |WHERE {
        |  {?item wdt:P27 wd:Q40 } UNION
        |  {?item wdt:P27 wd:Q28513} UNION
        |  {?item wdt:P27 wd:Q131964} UNION
        |  {?item wdt:P27 wd:Q699964} .
        |  ?item wdt:P569 ?date_of_birth .
        |  ?item wdt:P570 ?date_of_death .
        |  FILTER(?date_of_birth < "1950-01-01"^^xsd:dateTime)
        |  FILTER(?date_of_birth > "1358-01-01"^^xsd:dateTime)
        |  SERVICE wikibase:label { bd:serviceParam wikibase:language "de,en" }
        |  #REMOVE_INCREMENTAL ?item schema:dateModified ?date_modified .
        |  #REMOVE_INCREMENTAL FILTER(?date_modified > "{{INCREMENTAL_DATE}}"^^xsd:dateTime)
        |  }
        |  LIMIT $limit
        |  OFFSET $offset""".stripMargin
    val parsed = SparqlText.run(text, triples, labels,
      Map("limit" -> 10L, "offset" -> 0L))

    val arms = Seq("wd:Q40", "wd:Q28513", "wd:Q131964", "wd:Q699964")
      .map(q => SparqlAlgebra.patternConstO(triples, "wdt:P27", q, "item"))
      .reduce(_ unionByName _)
    val hand = SparqlAlgebra.labelService(
      SparqlAlgebra.bgp(Seq(arms,
        SparqlAlgebra.pattern(triples, "wdt:P569", "item", "date_of_birth"),
        SparqlAlgebra.pattern(triples, "wdt:P570", "item", "date_of_death")))
        .filter(col("date_of_birth") < "1950-01-01" && col("date_of_birth") > "1358-01-01"),
      labels, "item", "itemLabel", Seq("de", "en"))
      .select(col("item").as("id"), lit(null).cast("string").as("description"),
        col("itemLabel"), col("date_of_birth"), col("date_of_death"),
        lit(null).cast("string").as("place_of_birth"),
        lit(null).cast("string").as("place_of_death"))
      .limit(10)

    assert(parsed.columns.toSeq == hand.columns.toSeq)
    assert(rows(parsed) == rows(hand))
    // P1/P3/P5 pass both FILTERs and have a death date; label fallback ok
    assert(parsed.count() == 3)
    assert(rows(parsed).map(_.head).map(_.toString) == Set("P1", "P3", "P5"))
  }

  test("wikidata-person.sparql (subselect + OPTIONALs + langmatches) ≡ hand compilation") {
    val text =
      """SELECT (?item as ?id) ?itemLabel ?date_of_birth ?date_of_death ?description
        |WHERE {
        |  {
        |    SELECT DISTINCT ?item ?date_of_birth
        |           WHERE {
        |             #{?item wdt:P27 wd:Q40 } UNION
        |             {?item wdt:P27 wd:Q28513} UNION
        |              {?item wdt:P27 wd:Q131964} UNION
        |              {?item wdt:P27 wd:Q699964} .
        |             ?item wdt:P569 ?date_of_birth .
        |           }
        |          ORDER BY ?item
        |          LIMIT $limit
        |          OFFSET $offset
        |  }
        |  OPTIONAL{?item wdt:P570 ?date_of_death .}
        |  OPTIONAL{?item schema:description ?description .
        |          FILTER(langmatches(lang(?description), "de"))
        |          }
        |  SERVICE wikibase:label { bd:serviceParam wikibase:language "de,en" }
        |  }""".stripMargin
    val parsed = SparqlText.run(text, triples, labels,
      Map("limit" -> 2L, "offset" -> 1L))

    val arms = Seq("wd:Q28513", "wd:Q131964", "wd:Q699964")
      .map(q => SparqlAlgebra.patternConstO(triples, "wdt:P27", q, "item"))
      .reduce(_ unionByName _)
    val page = SparqlAlgebra.bgp(Seq(arms,
        SparqlAlgebra.pattern(triples, "wdt:P569", "item", "date_of_birth")))
      .distinct().orderBy(col("item")).offset(1).limit(2)
    val withDod = SparqlAlgebra.optional(page,
      SparqlAlgebra.pattern(triples, "wdt:P570", "item", "date_of_death"))
    val deDesc = triples.filter(col("p") === "schema:description" && col("oLang") === "de")
      .select(col("s").as("item"), col("o").as("description"))
    val hand = SparqlAlgebra.labelService(
        SparqlAlgebra.optional(withDod, deDesc),
        labels, "item", "itemLabel", Seq("de", "en"))
      .select(col("item").as("id"), col("itemLabel"),
        col("date_of_birth"), col("date_of_death"), col("description"))

    assert(parsed.columns.toSeq == hand.columns.toSeq)
    assert(rows(parsed) == rows(hand))
    // ordered page P3,P4,P5,P7 → offset 1 limit 2 → P4 (all-null optionals,
    // id-fallback label), P5 (death date + de description + de label)
    assert(rows(parsed) == Set(
      Seq("P4", "P4", "1970-01-01", null, null),
      Seq("P5", "Fuenf", "1949-01-01", "1999-09-09", "Maler")))
  }

  test("langmatches without an oLang column raises") {
    val bare = triples.select("s", "p", "o")
    val text =
      """SELECT ?s ?d WHERE {
        |  ?s schema:description ?d .
        |  FILTER(langmatches(lang(?d), "de"))
        |}""".stripMargin
    val e = intercept[IllegalArgumentException](SparqlText.run(text, bare, labels))
    assert(e.getMessage.contains("oLang"))
  }

  test("missing template parameter raises; literal LIMIT works") {
    val text = "SELECT ?s WHERE { ?s wdt:P569 ?d . } LIMIT $limit"
    val e = intercept[RuntimeException](SparqlText.run(text, triples, labels))
    assert(e.getMessage.contains("limit"))
    val lim = SparqlText.run("SELECT ?s WHERE { ?s wdt:P569 ?d . } LIMIT 3",
      triples, labels)
    assert(lim.count() == 3)
  }

  test("comparison operators and distinct") {
    val q =
      """SELECT DISTINCT ?s WHERE {
        |  ?s wdt:P569 ?d .
        |  FILTER(?d >= "1900-05-01")
        |  FILTER(?d != "1970-01-01")
        |}""".stripMargin
    assert(rows(SparqlText.run(q, triples, labels)).map(_.head) ==
      Set("P1", "P3", "P5", "P8"))
  }
}
