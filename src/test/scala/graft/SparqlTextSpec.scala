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

  test("wikidata-city.sparql (P279* paths, cross-join narrowing, GROUP BY group_concat) ≡ hand compilation") {
    import graft.plans.Closure
    // class hierarchy: T2 -P279-> T1 -P279-> Q515; GeoNames codes on Q515/T2
    val t = Seq[(String, String, String, Option[String])](
      ("T1", "wdt:P279", "wd:Q515", None), ("T2", "wdt:P279", "T1", None),
      ("I1", "wdt:P31", "T1", None), ("I2", "wdt:P31", "T2", None),
      ("I3", "wdt:P31", "wd:Q515", None), ("I4", "wdt:P31", "OTHER", None),
      ("I1", "wdt:P17", "CA", None), ("I2", "wdt:P17", "CA", None),
      ("I3", "wdt:P17", "CB", None), ("I4", "wdt:P17", "CA", None),
      ("CA", "wdt:P31", "wd:Q3624078", None), ("CB", "wdt:P31", "wd:Q6256", None),
      ("CA", "wdt:P30", "wd:Q46", None), ("CB", "wdt:P30", "wd:Q46", None),
      ("wd:Q515", "wdt:P2452", "PPL", None), ("T2", "wdt:P2452", "PPLX", None),
      ("I1", "wdt:P625", "Point(1 2)", None)
    ).toDF("s", "p", "o", "oLang")
    val labs = Seq(
      ("I1", "de", "I1de"), ("I2", "en", "I2en"),
      ("CA", "en", "CAen"), ("CB", "de", "CBde")
    ).toDF("entity", "lang", "label")
    val text =
      """SELECT (?item as ?id) ?country ?itemLabel ?countryLabel (group_concat(?GN_FeatureCode) as ?feature_code) ?coord
        |WHERE {
        |        {
        |            SELECT DISTINCT ?item ?country ?ctype
        |            WHERE {
        |                ?ctype wdt:P279* wd:Q515 .
        |                ?item wdt:P17 ?country .
        |                {?country wdt:P31 wd:Q3624078 .} UNION {
        |                ?country wdt:P31 wd:Q6256
        |                }
        |                ?country wdt:P30 wd:Q46 .
        |                ?item wdt:P31 ?ctype .
        |                }
        |          ORDER BY ?item
        |          LIMIT $limit
        |          OFFSET $offset
        |  }
        |  OPTIONAL{?ctype wdt:P279* ?b2 .
        |                     ?b2    wdt:P2452 ?GN_FeatureCode}
        |  OPTIONAL{?item wdt:P625 ?coord .}
        |  SERVICE wikibase:label { bd:serviceParam wikibase:language "de,en" }
        |}
        |GROUP BY ?item ?country ?itemLabel ?countryLabel ?coord""".stripMargin
    val parsed = SparqlText.run(text, t, labs, Map("limit" -> 10L, "offset" -> 0L))

    val p279 = t.filter(col("p") === "wdt:P279")
      .select(col("s").as("src"), col("o").as("dst"))
    val ctypes = Closure.reachingTo(p279,
      spark.range(1).select(lit("wd:Q515").as("node"))).select(col("node").as("ctype"))
    val core = SparqlAlgebra.bgp(Seq(
        SparqlAlgebra.pattern(t, "wdt:P31", "item", "ctype"),
        ctypes,
        SparqlAlgebra.pattern(t, "wdt:P17", "item", "country"),
        SparqlAlgebra.patternConstO(t, "wdt:P31", "wd:Q3624078", "country")
          .unionByName(SparqlAlgebra.patternConstO(t, "wdt:P31", "wd:Q6256", "country")),
        SparqlAlgebra.patternConstO(t, "wdt:P30", "wd:Q46", "country")))
      .select(col("item"), col("country"), col("ctype"))
      .distinct().orderBy(col("item")).offset(0).limit(10)
    val nodes = p279.select(col("src").as("ctype"))
      .unionByName(p279.select(col("dst").as("ctype"))).distinct()
    val pairs = Closure.ancestorPairs(p279)
      .select(col("node").as("ctype"), col("anc").as("b2"))
      .unionByName(nodes.select(col("ctype"), col("ctype").as("b2"))).distinct()
    val gn = pairs.join(SparqlAlgebra.pattern(t, "wdt:P2452", "b2", "GN_FeatureCode"), Seq("b2"))
    val withGn = SparqlAlgebra.optional(core, gn)
    val withCoord = SparqlAlgebra.optional(withGn,
      SparqlAlgebra.pattern(t, "wdt:P625", "item", "coord"))
    val labeled = SparqlAlgebra.labelService(
      SparqlAlgebra.labelService(withCoord, labs, "item", "itemLabel", Seq("de", "en")),
      labs, "country", "countryLabel", Seq("de", "en"))
    val hand = labeled
      .groupBy(col("item"), col("country"), col("itemLabel"), col("countryLabel"), col("coord"))
      .agg(concat_ws(" ", sort_array(collect_list(col("GN_FeatureCode")))).as("feature_code"))
      .select(col("item").as("id"), col("country"), col("itemLabel"),
        col("countryLabel"), col("feature_code"), col("coord"))

    assert(parsed.columns.toSeq == hand.columns.toSeq)
    assert(rows(parsed) == rows(hand))
    assert(rows(parsed) == Set(
      Seq("I1", "CA", "I1de", "CAen", "PPL", "Point(1 2)"),
      Seq("I2", "CA", "I2en", "CAen", "PPL PPLX", null),
      Seq("I3", "CB", "I3", "CBde", "PPL", null)))
  }

  test("wikidata-organization.sparql (P31/P279* arms, VALUES, BIND COALESCE, LANG filters) ≡ hand compilation") {
    import graft.plans.Closure
    val t = Seq(
      ("O1", "wdt:P31", "wd:Q43229", None),
      ("U1", "wdt:P279", "wd:Q3918", None), ("O2", "wdt:P31", "U1", None),
      ("O3", "wdt:P31", "wd:Q4830453", None),
      ("O4", "wdt:P31", "wd:Q3918", None),
      ("O5", "wdt:P31", "X", None),
      ("O1", "wdt:P17", "wd:Q40", None), ("O2", "wdt:P17", "wd:Q28513", None),
      ("O3", "wdt:P17", "wd:Q183", None), ("O4", "wdt:P17", "wd:Q40", None),
      ("O5", "wdt:P17", "wd:Q40", None),
      ("O1", "wdt:P571", "1900", None), ("O1", "wdt:P571", "1905", None),
      ("O4", "wdt:P571", "1950", None),
      ("O1", "wdt:P576", "1990", None),
      ("O1", "schema:description", "VereinDE", Some("de")),
      ("O1", "schema:description", "clubEN", Some("en")),
      ("O2", "schema:description", "uniEN", Some("en"))
    ).toDF("s", "p", "o", "oLang")
    val labs = Seq(("O1", "de", "OrgEins"), ("O4", "en", "OrgFour"))
      .toDF("entity", "lang", "label")
    val text =
      """SELECT (?organization as ?id) ?organizationLabel ?description (group_concat(distinct ?inception_pre) as ?inception) (group_concat(distinct ?dissolvement_pre) as ?dissolvement) WHERE {
        |  {SELECT DISTINCT ?organization WHERE {
        |   {?organization wdt:P31 wd:Q43229 #organization
        |   } UNION {
        |    ?organization wdt:P31/wdt:P279* wd:Q3918 #university
        |    } UNION {
        |  ?organization wdt:P31 wd:Q4830453 #company
        |  } UNION {
        |  ?organization wdt:P31/wdt:P279* wd:Q18810687 #political institution
        |  }
        |
        |                    VALUES ?location { wd:Q28513 wd:Q131964 wd:Q699964 wd:Q40}
        |               ?organization wdt:P17 ?location.
        |    }
        |
        |          LIMIT $limit
        |          OFFSET $offset
        |  }
        |  OPTIONAL{?organization wdt:P571 ?inception_pre}
        |  OPTIONAL{?organization wdt:P576 ?dissolvement_pre}
        |  OPTIONAL{?organization schema:description ?descriptionDE .
        |           FILTER (LANG(?descriptionDE) = "de")
        |          }
        |  OPTIONAL{?organization schema:description ?descriptionEN .
        |           FILTER (LANG(?descriptionEN) = "en")
        |          }
        |  BIND(COALESCE(?descriptionDE, ?descriptionEN) as ?description)
        |  SERVICE wikibase:label { bd:serviceParam wikibase:language "de,en". }
        |}
        |GROUP BY ?organization ?organizationLabel ?description""".stripMargin
    val parsed = SparqlText.run(text, t, labs, Map("limit" -> 10L, "offset" -> 0L))

    val p279 = t.filter(col("p") === "wdt:P279")
      .select(col("s").as("src"), col("o").as("dst"))
    def seededArm(seed: String): org.apache.spark.sql.DataFrame = {
      val reach = Closure.reachingTo(p279,
        spark.range(1).select(lit(seed).as("node")))
      t.filter(col("p") === "wdt:P31")
        .join(reach, col("o") === col("node"), "left_semi")
        .select(col("s").as("organization")).distinct()
    }
    val arms = SparqlAlgebra.patternConstO(t, "wdt:P31", "wd:Q43229", "organization")
      .unionByName(seededArm("wd:Q3918"))
      .unionByName(SparqlAlgebra.patternConstO(t, "wdt:P31", "wd:Q4830453", "organization"))
      .unionByName(seededArm("wd:Q18810687"))
    val core = arms
      .join(SparqlAlgebra.pattern(t, "wdt:P17", "organization", "location"), Seq("organization"))
      .filter(col("location").isin("wd:Q28513", "wd:Q131964", "wd:Q699964", "wd:Q40"))
      .select(col("organization")).distinct().offset(0).limit(10)
    val d1 = SparqlAlgebra.optional(core,
      SparqlAlgebra.pattern(t, "wdt:P571", "organization", "inception_pre"))
    val d2 = SparqlAlgebra.optional(d1,
      SparqlAlgebra.pattern(t, "wdt:P576", "organization", "dissolvement_pre"))
    val descDe = t.filter(col("p") === "schema:description" && col("oLang") === "de")
      .select(col("s").as("organization"), col("o").as("descriptionDE"))
    val descEn = t.filter(col("p") === "schema:description" && col("oLang") === "en")
      .select(col("s").as("organization"), col("o").as("descriptionEN"))
    val withDesc = SparqlAlgebra.optional(SparqlAlgebra.optional(d2, descDe), descEn)
      .withColumn("description", coalesce(col("descriptionDE"), col("descriptionEN")))
    val labeled = SparqlAlgebra.labelService(withDesc, labs,
      "organization", "organizationLabel", Seq("de", "en"))
    val hand = labeled
      .groupBy(col("organization"), col("organizationLabel"), col("description"))
      .agg(concat_ws(" ", sort_array(collect_set(col("inception_pre")))).as("inception"),
        concat_ws(" ", sort_array(collect_set(col("dissolvement_pre")))).as("dissolvement"))
      .select(col("organization").as("id"), col("organizationLabel"),
        col("description"), col("inception"), col("dissolvement"))

    assert(parsed.columns.toSeq == hand.columns.toSeq)
    assert(rows(parsed) == rows(hand))
    assert(rows(parsed) == Set(
      Seq("O1", "OrgEins", "VereinDE", "1900 1905", "1990"),
      Seq("O2", "O2", "uniEN", "", ""),
      Seq("O4", "OrgFour", null, "1950", "")))
  }

  test("create_provided_entities_graph_v2.sparql (CONSTRUCT, [], ';' lists, PREFIX, STRUUID mint) ≡ hand compilation") {
    // entities E1/E2 share SA1 (no existing proxy → one minted URI fanned
    // back to both); E3's SA2 already has a proxy (E3 itself carries
    // proxy_for) → COALESCE keeps it
    val owl = "http://www.w3.org/2002/07/owl#sameAs"
    val pfpProxy = "http://pfp-schema.acdh.oeaw.ac.at/schema#proxy_for"
    val t = Seq[(String, String, String, Option[String])](
      ("E1", owl, "SA1", None), ("E2", owl, "SA1", None),
      ("E3", owl, "SA2", None), ("E3", pfpProxy, "EXIST1", None)
    ).toDF("s", "p", "o", "oLang")
    val labs = Seq.empty[(String, String, String)].toDF("entity", "lang", "label")
    val text =
      """PREFIX owl2: <http://www.w3.org/2002/07/owl#>
        |PREFIX pfp: <http://pfp-schema.acdh.oeaw.ac.at/schema#>
        |PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
        |CONSTRUCT {
        |  ?entity pfp:proxy_for ?pfp_uri .
        |  ?pfp_uri rdf:type pfp:provided_entity .
        |}
        |WHERE {
        |  {
        |    SELECT DISTINCT ?entity ?pfp_uri
        |WHERE {
        |      {
        |        SELECT DISTINCT ?sa_uri ?pfp_uri
        |WHERE {
        |          [] owl2:sameAs ?sa_uri .
        |          OPTIONAL {
        |        [] owl2:sameAs ?sa_uri ;
        |        pfp:proxy_for ?uri_exist .
        |  }
        |      BIND (URI(CONCAT("https://pfp.acdh.oeaw.ac.at/provided_entity/", STRUUID())) AS ?uri_new)
        |      BIND (COALESCE(?uri_exist, ?uri_new) AS ?pfp_uri)
        |        }
        |      }
        |      ?entity owl2:sameAs ?sa_uri .
        |    }
        |  }
        |}""".stripMargin
    val parsed = SparqlText.run(text, t, labs)

    // hand compilation: mint per (sa_uri, uri_exist) binding with the same
    // md5 surrogate; existing proxy wins via coalesce; fan back on sameAs
    val sa = SparqlAlgebra.pattern(t, owl, "anon_a", "sa_uri").drop("anon_a")
    val exist = SparqlAlgebra.bgp(Seq(
      SparqlAlgebra.pattern(t, owl, "anon_b", "sa_uri"),
      SparqlAlgebra.pattern(t, pfpProxy, "anon_b", "uri_exist"))).drop("anon_b")
    val inner = SparqlAlgebra.optional(sa, exist)
    val minted = inner.withColumn("uri_new",
        concat(lit("https://pfp.acdh.oeaw.ac.at/provided_entity/"),
          md5(concat_ws("|", col("sa_uri"), col("uri_exist")))))
      .withColumn("pfp_uri", coalesce(col("uri_exist"), col("uri_new")))
      .select(col("sa_uri"), col("pfp_uri")).distinct()
    val outer = minted
      .join(SparqlAlgebra.pattern(t, owl, "entity", "sa_uri"), Seq("sa_uri"))
      .select(col("entity"), col("pfp_uri")).distinct()
    val hand = outer.select(col("entity").as("s"),
        lit(pfpProxy).as("p"), col("pfp_uri").as("o"))
      .unionByName(outer.select(col("pfp_uri").as("s"),
        lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#type").as("p"),
        lit("http://pfp-schema.acdh.oeaw.ac.at/schema#provided_entity").as("o")))
      .distinct()

    assert(parsed.columns.toSeq == Seq("s", "p", "o"))
    assert(rows(parsed) == rows(hand))
    val byS = parsed.collect().map(r => (r.getString(0), r.getString(2))).toMap
    // E1 and E2 share one minted URI; E3 keeps the existing proxy
    assert(byS("E1").startsWith("https://pfp.acdh.oeaw.ac.at/provided_entity/"))
    assert(byS("E1") == byS("E2"))
    assert(byS("E3") == "EXIST1")
    // both provided entities are typed
    assert(parsed.filter(col("p") === "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
      .count() == 2)
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

  test("bare numeric filter literals compare numerically, not lexicographically") {
    val t = Seq(("a", "n", "9", Option.empty[String]), ("b", "n", "10", None),
      ("c", "n", "100", None)).toDF("s", "p", "o", "oLang")
    // lexicographically "10" < "9" — numeric semantics must keep b and c
    val q = "SELECT ?s WHERE { ?s <n> ?v . FILTER(?v > 9) }"
    assert(rows(SparqlText.run(q, t, labels)).map(_.head) == Set("b", "c"))
  }

  test("FILTER boolean connectives, parens, NOT, and decimal literals") {
    val t = Seq(
      ("a", "n", "9.5", Option.empty[String]), ("b", "n", "10", None),
      ("c", "n", "2", None),
      ("a", "m", "x", None), ("b", "m", "y", None), ("c", "m", "y", None)
    ).toDF("s", "p", "o", "oLang")
    val q =
      """SELECT ?s WHERE {
        |  ?s <n> ?v . ?s <m> ?w .
        |  FILTER(?v > 2.5 && (?w = "y" || !(?v < 10)))
        |}""".stripMargin
    // a: 9.5>2.5 but w=x and !(9.5<10) is false → out; b: 10>2.5, w=y → in;
    // c: 2>2.5 false → out
    assert(rows(SparqlText.run(q, t, labels)).map(_.head) == Set("b"))
  }

  test("signed decimal literals tokenize and compare numerically") {
    val t = Seq(("a", "n", "-2", Option.empty[String]), ("b", "n", "-1", None),
      ("c", "n", "0", None)).toDF("s", "p", "o", "oLang")
    val q = "SELECT ?s WHERE { ?s <n> ?v . FILTER(?v > -1.5) }"
    assert(rows(SparqlText.run(q, t, labels)).map(_.head) == Set("b", "c"))
  }

  test("VALUES entries resolve declared prefixes like pattern terms") {
    // with PREFIX declared, patterns bind full IRIs — a raw pname in VALUES
    // would isin-match nothing (the silent-empty bug class)
    val t = Seq(
      ("P1", "http://w/t/P27", "http://w/Q40", Option.empty[String]),
      ("P2", "http://w/t/P27", "http://w/Q99", None)
    ).toDF("s", "p", "o", "oLang")
    val q =
      """PREFIX wd: <http://w/>
        |PREFIX wdt: <http://w/t/>
        |SELECT ?s WHERE { ?s wdt:P27 ?c . VALUES ?c { wd:Q40 } }""".stripMargin
    assert(rows(SparqlText.run(q, t, labels)).map(_.head) == Set("P1"))
  }

  test("variable predicates bind p as a column and join with constant patterns") {
    val all = SparqlText.run("SELECT ?p2 ?o WHERE { <P1> ?p2 ?o . }", triples, labels)
    assert(rows(all) == Set(
      Seq("wdt:P27", "wd:Q40"), Seq("wdt:P569", "1900-05-01"),
      Seq("wdt:P570", "1980-01-01"),
      Seq("schema:description", "Dichter"), Seq("schema:description", "poet")))
    // joined against a constant-predicate pattern: which predicates carry
    // each death date
    val joined = SparqlText.run(
      "SELECT ?s ?p2 WHERE { ?s wdt:P570 ?d . ?s ?p2 ?d . }", triples, labels)
    assert(rows(joined) == Set(
      Seq("P1", "wdt:P570"), Seq("P3", "wdt:P570"), Seq("P5", "wdt:P570")))
  }

  test("mid-path star compiles closure-then-chain; trailing star keeps zero-hop rows") {
    val t = Seq(
      ("A", "e1", "B", Option.empty[String]), ("B", "e1", "C", None),
      ("C", "e2", "D", None), ("X", "e2", "Y", None)
    ).toDF("s", "p", "o", "oLang")
    // leading star: domain = e1-edge nodes (documented var-var choice)
    val mid = SparqlText.run("SELECT ?a ?b WHERE { ?a <e1>*/<e2> ?b }", t, labels)
    assert(rows(mid) == Set(Seq("A", "D"), Seq("B", "D"), Seq("C", "D")))
    // trailing star over a VARIABLE object goes through the general walk:
    // D and Y have no e1 edges, so only the zero-hop rows survive
    val tail = SparqlText.run("SELECT ?a ?b WHERE { ?a <e2>/<e1>* ?b }", t, labels)
    assert(rows(tail) == Set(Seq("C", "D"), Seq("X", "Y")))
    // mid star with a constant object exercises the general walk's
    // post-filter path
    val konst = SparqlText.run("SELECT ?a WHERE { ?a <e1>*/<e2> <D> }", t, labels)
    assert(rows(konst).map(_.head) == Set("A", "B", "C"))
  }

  test("#REMOVE_INCREMENTAL markers rewrite like the reference and act as the watermark") {
    // same shape as sparql/wikidata-person-backup.sparql with its marker
    // lines; the rewrite mirrors wikidata_index.py:160-167 verbatim
    val text =
      """SELECT (?item as ?id) ?date_of_birth
        |WHERE {
        |  {?item wdt:P27 wd:Q40 } UNION
        |  {?item wdt:P27 wd:Q28513} UNION
        |  {?item wdt:P27 wd:Q699964} .
        |  ?item wdt:P569 ?date_of_birth .
        |  ?item wdt:P570 ?date_of_death .
        |  FILTER(?date_of_birth < "1950-01-01"^^xsd:dateTime)
        |  #REMOVE_INCREMENTAL ?item schema:dateModified ?date_modified .
        |  #REMOVE_INCREMENTAL FILTER(?date_modified > "{{INCREMENTAL_DATE}}"^^xsd:dateTime)
        |  }
        |  LIMIT $limit""".stripMargin
    val modified = Seq(
      ("P1", "schema:dateModified", "2024-05-01", Option.empty[String]),
      ("P3", "schema:dateModified", "2024-03-02", None),
      ("P5", "schema:dateModified", "2023-01-01", None)
    ).toDF("s", "p", "o", "oLang")
    val t2 = triples.unionByName(modified)
    // non-incremental: markers stay comments — P1, P3, P5 qualify
    val full = SparqlText.run(text, t2, labels, Map("limit" -> 10L))
    assert(rows(full).map(_.head) == Set("P1", "P3", "P5"))
    // incremental: markers uncomment, date substitutes, watermark drops P5
    val rewritten = SparqlText.withIncremental(text, "2024-01-01")
    assert(!rewritten.contains("REMOVE_INCREMENTAL"))
    assert(rewritten.contains("\"2024-01-01\"^^xsd:dateTime"))
    val inc = SparqlText.run(rewritten, t2, labels, Map("limit" -> 10L))
    assert(rows(inc).map(_.head) == Set("P1", "P3"))
  }

  test("BOUND, CONTAINS/STRSTARTS/STRENDS, and STR() wrapping in FILTER") {
    // BOUND over an OPTIONAL binding: only P1/P3/P5 carry a death date
    val bound =
      """SELECT ?s WHERE {
        |  ?s wdt:P569 ?b .
        |  OPTIONAL { ?s wdt:P570 ?d . }
        |  FILTER(BOUND(?d))
        |}""".stripMargin
    assert(rows(SparqlText.run(bound, triples, labels)).map(_.head) ==
      Set("P1", "P3", "P5"))
    // !BOUND — the complement
    val unbound = bound.replace("FILTER(BOUND(?d))", "FILTER(!BOUND(?d))")
    assert(rows(SparqlText.run(unbound, triples, labels)).map(_.head) ==
      Set("P2", "P4", "P6", "P7", "P8"))
    // string functions, with and without STR()
    val q =
      """SELECT ?s ?c WHERE {
        |  ?s wdt:P27 ?c .
        |  FILTER(CONTAINS(STR(?c), "Q4") && STRSTARTS(?c, "wd:") && !STRENDS(?c, "64"))
        |}""".stripMargin
    // contains Q4: Q40 (P1,P2,P8) and Q131964 (P4); STRENDS 64 drops Q131964
    assert(rows(SparqlText.run(q, triples, labels)).map(_.head) ==
      Set("P1", "P2", "P8"))
  }

  test("multi-key ORDER BY with DESC picks the right LIMIT page") {
    val q =
      """SELECT ?s ?d WHERE { ?s wdt:P569 ?d . }
        |ORDER BY DESC(?d) ?s
        |LIMIT 3""".stripMargin
    // births desc: P4 1970, P3 1949-12-31, P5 1949-01-01
    assert(SparqlText.run(q, triples, labels).collect().map(_.getString(0)).toSeq ==
      Seq("P4", "P3", "P5"))
  }

  test("MINUS and FILTER [NOT] EXISTS compile to anti/semi joins; disjoint MINUS is a no-op") {
    // P1..P8 have births; P1/P3/P5 have deaths
    val minus =
      """SELECT ?s WHERE {
        |  ?s wdt:P569 ?b .
        |  MINUS { ?s wdt:P570 ?d . }
        |}""".stripMargin
    assert(rows(SparqlText.run(minus, triples, labels)).map(_.head) ==
      Set("P2", "P4", "P6", "P7", "P8"))
    val notExists = minus.replace("MINUS", "FILTER NOT EXISTS")
    assert(rows(SparqlText.run(notExists, triples, labels)).map(_.head) ==
      Set("P2", "P4", "P6", "P7", "P8"))
    val exists = minus.replace("MINUS", "FILTER EXISTS")
    assert(rows(SparqlText.run(exists, triples, labels)).map(_.head) ==
      Set("P1", "P3", "P5"))
    // MINUS sharing no variable removes nothing (SPARQL §8.3.3) — the
    // semantic difference from NOT EXISTS
    val disjoint =
      """SELECT ?s WHERE {
        |  ?s wdt:P570 ?d .
        |  MINUS { ?x schema:description ?y . }
        |}""".stripMargin
    assert(rows(SparqlText.run(disjoint, triples, labels)).map(_.head) ==
      Set("P1", "P3", "P5"))
    // FILTER NOT EXISTS with no shared variable fails loudly instead
    val e = intercept[RuntimeException](SparqlText.run(
      disjoint.replace("MINUS", "FILTER NOT EXISTS"), triples, labels))
    assert(e.getMessage.contains("share"))
  }

  test("aggregate projections: derived COUNT query, COUNT(*), SUM/AVG, SAMPLE") {
    // the exact count-query shape the reference derives textually from
    // each .sparql file (wikidata_index.py:173-179)
    val countQ =
      """SELECT (COUNT(DISTINCT ?item) AS ?count)
        |WHERE {
        |  {?item wdt:P27 wd:Q40 } UNION {?item wdt:P27 wd:Q28513} .
        |  ?item wdt:P569 ?b .
        |}""".stripMargin
    // Q40: P1,P2,P8; Q28513: P3,P7
    assert(SparqlText.run(countQ, triples, labels)
      .collect().map(_.getLong(0)).toSeq == Seq(5L))

    val t = Seq(
      ("a", "g", "x", Option.empty[String]), ("a", "n", "1.5", None),
      ("b", "g", "x", None), ("b", "n", "2.5", None),
      ("c", "g", "y", None), ("c", "n", "10", None)
    ).toDF("s", "p", "o", "oLang")
    val aggQ =
      """SELECT ?g (COUNT(*) AS ?cnt) (SUM(?v) AS ?total) (AVG(?v) AS ?mean) (SAMPLE(?s2) AS ?any)
        |WHERE { ?s2 <g> ?g . ?s2 <n> ?v . }
        |GROUP BY ?g""".stripMargin
    assert(rows(SparqlText.run(aggQ, t, labels)) == Set(
      Seq("x", 2L, 4.0, 2.0, "a"),
      Seq("y", 1L, 10.0, 10.0, "c")))
    // COUNT(DISTINCT *) and SUM(*) are rejected
    val e = intercept[RuntimeException](SparqlText.parse(
      "SELECT (SUM(*) AS ?t) WHERE { ?a <n> ?v . }"))
    assert(e.getMessage.contains("COUNT(*)"))
  }

  test("variable-to-variable comparisons in FILTER") {
    // persons who died strictly after 1990 relative to another's death:
    // simpler — birth before death sanity predicate
    val q =
      """SELECT ?s WHERE {
        |  ?s wdt:P569 ?b .
        |  ?s wdt:P570 ?d .
        |  FILTER(?b < ?d)
        |}""".stripMargin
    assert(rows(SparqlText.run(q, triples, labels)).map(_.head) ==
      Set("P1", "P3", "P5"))
    val none = q.replace("?b < ?d", "?b > STR(?d)")
    assert(SparqlText.run(none, triples, labels).count() == 0)
  }

  test("inverse (^p) and alternation (p1|p2) property paths") {
    val t = Seq(
      ("C1", "nation", "N1", Option.empty[String]),
      ("S1", "nation", "N1", None),
      ("N1", "region", "R1", None),
      ("N1", "label", "AUSTRIA", None), ("R1", "label", "EUROPE", None)
    ).toDF("s", "p", "o", "oLang")
    // inverse: who is IN region R1 (N1), stepping backwards
    val inv = SparqlText.run(
      "SELECT ?n WHERE { <R1> ^<region> ?n }", t, labels)
    assert(rows(inv).map(_.head) == Set("N1"))
    // alternation + chain: members via nation, regions down via ^region,
    // then the nation label
    val alt = SparqlText.run(
      "SELECT DISTINCT ?x ?y WHERE { ?x (<nation>|^<region>)/<label> ?y }",
      t, labels)
    assert(rows(alt) == Set(
      Seq("C1", "AUSTRIA"), Seq("S1", "AUSTRIA"), Seq("R1", "AUSTRIA")))
    // starred alternation: reach R1 over nation-or-region edges
    val star = SparqlText.run(
      "SELECT ?x WHERE { ?x (<nation>|<region>)* <R1> }", t, labels)
    assert(rows(star).map(_.head) == Set("C1", "S1", "N1", "R1"))
    // bare alternation mixed with '/' must be parenthesized
    val e = intercept[RuntimeException](SparqlText.parse(
      "SELECT ?x WHERE { ?x <a>|<b>/<c> ?y }"))
    assert(e.getMessage.contains("parenthesize"))
  }

  test("MINUS/NOT EXISTS respect SPARQL null-compatibility on OPTIONAL-bound vars") {
    // P2 has no death date: ?d is unbound (null). The MINUS group shares
    // {s, d}; SPARQL compatibility ignores the unbound ?d, so P2 is
    // compatible with any right row matching on ?s alone and MUST be
    // removed — a plain equi anti-join would wrongly keep it.
    val q =
      """SELECT ?s WHERE {
        |  ?s wdt:P569 ?b .
        |  OPTIONAL { ?s wdt:P570 ?d . }
        |  MINUS { ?s wdt:P27 wd:Q40 . ?x wdt:P570 ?d . }
        |}""".stripMargin
    // right group: s ∈ citizens of Q40 {P1,P2,P8} × d ∈ death dates; MINUS
    // removes P1 (s+d both match) and P2/P8 (unbound d ignored, s matches)
    assert(rows(SparqlText.run(q, triples, labels)).map(_.head) ==
      Set("P3", "P4", "P5", "P6", "P7"))
    // NOT EXISTS with the same shape agrees
    val ne = q.replace("MINUS", "FILTER NOT EXISTS")
    assert(rows(SparqlText.run(ne, triples, labels)).map(_.head) ==
      Set("P3", "P4", "P5", "P6", "P7"))
    // EXISTS keeps exactly the removed ones
    val ex = q.replace("MINUS", "FILTER EXISTS")
    assert(rows(SparqlText.run(ex, triples, labels)).map(_.head) ==
      Set("P1", "P2", "P8"))
  }

  test("modified path prefixes route to the general walk, not the chain fast path") {
    val t = Seq(
      ("A", "e", "B", Option.empty[String]), ("B", "e", "C", None),
      ("C", "f", "X", None), ("X", "f", "X", None)
    ).toDF("s", "p", "o", "oLang")
    // <e>+ must walk A→B→C (two hops) before <f>* reaches X — a chain
    // treating '+' as one hop would return only {B}
    val plus = SparqlText.run("SELECT ?a WHERE { ?a <e>+/<f>* <X> }", t, labels)
    assert(rows(plus).map(_.head) == Set("A", "B"))
    // <e>? is AT MOST one hop: C (zero hops then f), B (one e-hop to C),
    // X (zero hops, f* reflexive via the constant) — but never A, whose
    // single allowed e-hop only reaches B
    val opt = SparqlText.run("SELECT ?a WHERE { ?a <e>?/<f>* <X> }", t, labels)
    assert(rows(opt).map(_.head) == Set("B", "C", "X"))
  }

  test("leading ? or * with a constant term keeps the zero-length path") {
    val t = Seq(
      ("A", "f", "D", Option.empty[String]), ("B", "e", "C", None)
    ).toDF("s", "p", "o", "oLang")
    // A has NO e-edges: <A> <e>?/<f> ?b must still reach D via zero e-hops
    val cs = SparqlText.run("SELECT ?b WHERE { <A> <e>?/<f> ?b }", t, labels)
    assert(rows(cs).map(_.head) == Set("D"))
    // ?a <e>* <B>: B has no e-edges either — the reflexive B→B row survives
    val co = SparqlText.run("SELECT ?a WHERE { ?a <e>* <B> }", t, labels)
    assert(rows(co).map(_.head) == Set("B"))
    // constant subject on the var-var star shape
    val cc = SparqlText.run("SELECT ?b WHERE { <A> <e>* ?b }", t, labels)
    assert(rows(cc).map(_.head) == Set("A"))
  }

  test("non-integer LIMIT fails with a typed parse error") {
    for (bad <- Seq("LIMIT 2.5", "LIMIT 1e3", "OFFSET -1")) {
      val e = intercept[RuntimeException](SparqlText.parse(
        s"SELECT ?x WHERE { ?x <p> ?o . } $bad"))
      assert(e.getMessage.toLowerCase.contains("integer") ||
        e.getMessage.contains("parse error"), s"$bad: ${e.getMessage}")
    }
  }

  test("path modifiers + (one or more) and ? (zero or one)") {
    val t = Seq(
      ("A", "e", "B", Option.empty[String]), ("B", "e", "C", None),
      ("C", "f", "D", None)
    ).toDF("s", "p", "o", "oLang")
    // e+ : strictly one or more hops — no reflexive pairs
    val plus = SparqlText.run("SELECT ?a ?b WHERE { ?a <e>+ ?b }", t, labels)
    assert(rows(plus) == Set(Seq("A", "B"), Seq("A", "C"), Seq("B", "C")))
    // e? then f : zero-or-one e hop into the f edge
    val opt = SparqlText.run("SELECT ?a ?b WHERE { ?a <e>?/<f> ?b }", t, labels)
    // zero hops: C -f-> D; one hop: B -e-> C -f-> D
    assert(rows(opt) == Set(Seq("B", "D"), Seq("C", "D")))
    // trailing + after a chain, constant object
    val plusConst = SparqlText.run("SELECT ?a WHERE { ?a <e>+ <C> }", t, labels)
    assert(rows(plusConst).map(_.head) == Set("A", "B"))
  }

  test("BIND with CONCAT, IF, literals, and plain renames") {
    val q =
      """SELECT ?s ?tag ?era WHERE {
        |  ?s wdt:P569 ?b .
        |  BIND(CONCAT("p:", ?s, "@", ?b) AS ?tag)
        |  BIND(IF(?b < "1900-01-01", "old", "modern") AS ?era)
        |}""".stripMargin
    val got = rows(SparqlText.run(q, triples, labels))
    assert(got.contains(Seq("P1", "p:P1@1900-05-01", "modern")))
    assert(got.contains(Seq("P2", "p:P2@1360-01-01", "old")))
    assert(got.size == 8)
    // plain rename and numeric literal
    val r = SparqlText.run(
      "SELECT ?s ?copy WHERE { ?s wdt:P570 ?d . BIND(?d AS ?copy) }",
      triples, labels)
    assert(rows(r).map(_.last) == Set("1980-01-01", "2000-06-15", "1999-09-09"))
  }

  test("HAVING filters groups on hidden aggregate columns") {
    // citizenships per country: Q40 ×3 (P1,P2,P8), Q28513 ×2 (P3,P7),
    // others ×1
    val q =
      """SELECT ?c (COUNT(?s) AS ?n) WHERE {
        |  ?s wdt:P27 ?c .
        |}
        |GROUP BY ?c
        |HAVING(COUNT(?s) > 1)""".stripMargin
    assert(rows(SparqlText.run(q, triples, labels)) == Set(
      Seq("wd:Q40", 3L), Seq("wd:Q28513", 2L)))
    // a plain var projected under implicit grouping fails loudly
    val e = intercept[RuntimeException](SparqlText.run(
      "SELECT ?s (COUNT(?c) AS ?n) WHERE { ?s wdt:P27 ?c . }",
      triples, labels))
    assert(e.getMessage.contains("GROUP BY"))
    // HAVING without the aggregate projected
    val bare =
      """SELECT ?c WHERE { ?s wdt:P27 ?c . }
        |GROUP BY ?c
        |HAVING(COUNT(DISTINCT ?s) = 1)""".stripMargin
    assert(rows(SparqlText.run(bare, triples, labels)).map(_.head) ==
      Set("wd:Q131964", "wd:Q699964", "wd:Q183"))
  }

  test("langmatches on a variable bound only inside OPTIONAL fails loudly") {
    val q =
      """SELECT ?s ?d WHERE {
        |  ?s wdt:P27 wd:Q40 .
        |  OPTIONAL { ?s schema:description ?d . }
        |  FILTER(langmatches(lang(?d), "de"))
        |}""".stripMargin
    val e = intercept[RuntimeException](SparqlText.run(q, triples, labels))
    assert(e.getMessage.contains("binds ?d"))
  }

  test("BASE: relative IRIs resolve per RFC 3986 in every term position") {
    val abs = Seq(
      ("http://ex.org/s1", "http://ex.org/p", "http://ex.org/o1", Option.empty[String]),
      ("http://ex.org/s2", "http://ex.org/q", "http://ex.org/o2", None)
    ).toDF("s", "p", "o", "oLang")
    val q =
      """BASE <http://ex.org/dir/>
        |SELECT ?s WHERE { ?s <../p> ?o . VALUES ?o { <../o1> } }""".stripMargin
    assert(rows(SparqlText.run(q, abs, labels)).map(_.head) ==
      Set("http://ex.org/s1"))
    // PREFIX IRIs themselves resolve against an earlier BASE
    val q2 =
      """BASE <http://ex.org/>
        |PREFIX e: <./>
        |SELECT ?s WHERE { ?s e:q ?o }""".stripMargin
    assert(rows(SparqlText.run(q2, abs, labels)).map(_.head) ==
      Set("http://ex.org/s2"))
  }

  test("fuzz: arbitrary garbage either parses or raises — never hangs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val junk = Gen.oneOf(
      Gen.asciiPrintableStr.map(_.take(60)),
      Gen.listOfN(15, Gen.oneOf("SELECT", "WHERE", "{", "}", "(", ")", "?x",
        "$p", "UNION", "OPTIONAL", "FILTER", "BIND", "<", ">", "\"lit\"",
        "a:b", "*", "/", ".", ";", "CONSTRUCT", "GROUP", "BY", "LIMIT",
        "5", "MINUS", "NOT", "EXISTS", "BOUND", "CONTAINS", "STR", "&&",
        "||", "!", "DESC", "-3.5", "ASK", "DESCRIBE", "VALUES", "UNDEF",
        "IN", "HAVING", "SUM", "COUNT", "REGEX", "SUBSTR", "+", "-",
        "separator", "=", ",", "GRAPH", "FROM", "NAMED",
        // round-6 surface: time accessors, term constructors, refusals
        "HOURS", "MINUTES", "SECONDS", "TZ", "LANGMATCHES", "LANG",
        "IRI", "URI", "BNODE", "STRLANG", "STRDT", "SAMETERM",
        "ISIRI", "ISBLANK", "ISNUMERIC", "DATATYPE",
        "RAND", "NOW", "UUID", "TIMEZONE")).map(_.mkString(" ")),
      // round-7 surface: composed path groups with member modifiers
      Gen.listOfN(12, Gen.oneOf("SELECT", "?x", "?y", "WHERE", "{", "}",
        "(", ")", "<p>", "<q>", "^", "/", "|", "*", "+", "?", "!", ".",
        "a")).map(_.mkString(" ")),
      Gen.const("SELECT ?x WHERE { ?x (<p>/<q>"), // truncated group
      Gen.const("SELECT ?x WHERE { ?x (<p>*/"),
      Gen.const("SELECT ?x WHERE { ?x "), // truncated
      Gen.const("SELECT ?x WHERE { { SELECT"),
      Gen.const("CONSTRUCT WHERE { ?a <p> "),
      Gen.const("CONSTRUCT { ?a <p> ") )
    (0 until 90).foreach { i =>
      junk.apply(Gen.Parameters.default, Seed(99L + i)).foreach { q =>
        try { SparqlText.parse(q); () }
        catch { case _: RuntimeException => () } // loud, typed failure
      }
    }
  }

  test("a query variable named ?entity survives the label service") {
    val q =
      """SELECT ?entity ?entityLabel WHERE {
        |  ?entity wdt:P27 wd:Q28513 .
        |  SERVICE wikibase:label { bd:serviceParam wikibase:language "de,en" }
        |}""".stripMargin
    assert(rows(SparqlText.run(q, triples, labels)) ==
      Set(Seq("P3", "Three"), Seq("P7", "P7")))
  }

  // ---------- unified expression grammar (round 5) ----------

  /** (s, n, m) numeric fixture lifted to triples. */
  private lazy val nums: DataFrame = Seq(
    ("a", "n", "2", Option.empty[String]), ("b", "n", "5", None),
    ("c", "n", "10", None),
    ("a", "m", "3", None), ("b", "m", "4", None), ("c", "m", "1", None)
  ).toDF("s", "p", "o", "oLang")

  test("arithmetic precedence: * binds tighter than +, parens override") {
    val q = "SELECT ?s WHERE { ?s <n> ?v . ?s <m> ?w . FILTER(?v + ?w * 2 = 8) }"
    // a: 2+3*2=8 → in; b: 5+4*2=13; c: 10+1*2=12
    assert(rows(SparqlText.run(q, nums, labels)).map(_.head) == Set("a"))
    val q2 = "SELECT ?s WHERE { ?s <n> ?v . ?s <m> ?w . FILTER((?v + ?w) * 2 = 10) }"
    // a: (2+3)*2=10 → in
    assert(rows(SparqlText.run(q2, nums, labels)).map(_.head) == Set("a"))
  }

  test("division, unary minus, and sign-folded literals") {
    val q = "SELECT ?s WHERE { ?s <n> ?v . FILTER(?v / 2 >= 2.5) }"
    assert(rows(SparqlText.run(q, nums, labels)).map(_.head) == Set("b", "c"))
    val neg = "SELECT ?s WHERE { ?s <n> ?v . FILTER(-?v < -4) }"
    assert(rows(SparqlText.run(neg, nums, labels)).map(_.head) == Set("b", "c"))
    // the tokenizer folds `-2` onto the literal; the additive grammar
    // recovers the subtraction (SPARQL grammar rule 116)
    val folded = "SELECT ?s WHERE { ?s <n> ?v . FILTER(?v -2 > 0) }"
    assert(rows(SparqlText.run(folded, nums, labels)).map(_.head) == Set("b", "c"))
  }

  test("IN and NOT IN membership") {
    val q = """SELECT ?s WHERE { ?s wdt:P27 ?c . FILTER(?c IN (wd:Q40, wd:Q183)) }"""
    assert(rows(SparqlText.run(q, triples, labels)).map(_.head) ==
      Set("P1", "P2", "P6", "P8"))
    val not = """SELECT ?s WHERE { ?s wdt:P27 ?c . FILTER(?c NOT IN (wd:Q40)) }"""
    assert(rows(SparqlText.run(not, triples, labels)).map(_.head) ==
      Set("P3", "P4", "P5", "P6", "P7"))
  }

  test("string builtins: STRLEN, SUBSTR, UCASE, LCASE, REPLACE") {
    val t = Seq(("a", "w", "1-URGENT", Option.empty[String]),
      ("b", "w", "5-LOW", None)).toDF("s", "p", "o", "oLang")
    val q =
      """SELECT ?s (LCASE(SUBSTR(?w, 3)) AS ?tail) (REPLACE(?w, "[0-9]-", "") AS ?word)
        |WHERE { ?s <w> ?w . FILTER(STRLEN(?w) > 6 && UCASE(?w) = ?w) }""".stripMargin
    assert(rows(SparqlText.run(q, t, labels)) ==
      Set(Seq("a", "urgent", "URGENT")))
  }

  test("STRBEFORE/STRAFTER return empty string when the needle is absent") {
    val t = Seq(("a", "w", "x-y", Option.empty[String]),
      ("b", "w", "plain", None)).toDF("s", "p", "o", "oLang")
    val q =
      """SELECT ?s (STRBEFORE(?w, "-") AS ?pre) (STRAFTER(?w, "-") AS ?post)
        |WHERE { ?s <w> ?w . }""".stripMargin
    assert(rows(SparqlText.run(q, t, labels)) ==
      Set(Seq("a", "x", "y"), Seq("b", "", "")))
  }

  test("REGEX with case-insensitive flag") {
    val q = """SELECT ?s WHERE { ?s schema:description ?d . FILTER(REGEX(?d, "^POE", "i")) }"""
    assert(rows(SparqlText.run(q, triples, labels)).map(_.head) == Set("P1"))
    val e = intercept[RuntimeException](SparqlText.run(
      """SELECT ?s WHERE { ?s <p> ?d . FILTER(REGEX(?d, "x", "q")) }""",
      triples, labels))
    assert(e.getMessage.contains("REGEX flag"))
  }

  test("numeric builtins and date accessors") {
    val q = "SELECT ?s (ABS(?v - 6) AS ?d) WHERE { ?s <n> ?v . FILTER(FLOOR(?v / 2) = 2) }"
    // floor(2/2)=1, floor(5/2)=2 → b, floor(10/2)=5
    assert(rows(SparqlText.run(q, nums, labels)) == Set(Seq("b", 1.0)))
    val y = """SELECT ?s WHERE { ?s wdt:P569 ?d . FILTER(YEAR(?d) = 1949 && MONTH(?d) = 12) }"""
    assert(rows(SparqlText.run(y, triples, labels)).map(_.head) == Set("P3"))
  }

  test("SELECT * projects every named variable and refuses mixing") {
    val q = "SELECT * WHERE { ?s wdt:P570 ?d . }"
    val df = SparqlText.run(q, triples, labels)
    assert(df.columns.toSeq == Seq("s", "d"))
    assert(df.count() == 3)
    val e = intercept[RuntimeException](SparqlText.run(
      "SELECT * ?s WHERE { ?s wdt:P570 ?d . }", triples, labels))
    assert(e.getMessage.contains("SELECT *"))
  }

  test("SELECT * hides anonymous [] existentials") {
    val q = "SELECT * WHERE { [] wdt:P27 ?c . }"
    assert(SparqlText.run(q, triples, labels).columns.toSeq == Seq("c"))
  }

  test("expression projections and ORDER BY DESC(expr)") {
    val q =
      """SELECT ?s (?v * 10 + ?w AS ?score) WHERE { ?s <n> ?v . ?s <m> ?w . }
        |ORDER BY DESC(?v * 10 + ?w) LIMIT 2""".stripMargin
    val got = SparqlText.run(q, nums, labels).collect().map(r =>
      (r.getString(0), r.getDouble(1))).toSeq
    assert(got == Seq(("c", 101.0), ("b", 54.0)))
  }

  test("GROUP_CONCAT separator clause") {
    val q =
      """SELECT ?c (GROUP_CONCAT(DISTINCT ?s ; separator=", ") AS ?who)
        |WHERE { ?s wdt:P27 ?c . } GROUP BY ?c""".stripMargin
    val got = SparqlText.run(q, triples, labels).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("wd:Q40") == "P1, P2, P8")
    assert(got("wd:Q28513") == "P3, P7")
  }

  test("aggregates over expressions: SUM(?v * ?w), AVG, COUNT") {
    val q =
      """SELECT (SUM(?v * ?w) AS ?dot) (AVG(?v + 0.0) AS ?mean)
        |WHERE { ?s <n> ?v . ?s <m> ?w . }""".stripMargin
    val r = SparqlText.run(q, nums, labels).collect().head
    // 2*3 + 5*4 + 10*1 = 36; mean(2,5,10) = 17/3
    assert(r.getDouble(0) == 36.0)
    assert(math.abs(r.getDouble(1) - 17.0 / 3) < 1e-12)
  }

  test("IF and COALESCE in expression position") {
    val q =
      """SELECT ?s (IF(?v > 4, "big", "small") AS ?size)
        |WHERE { ?s <n> ?v . }""".stripMargin
    assert(rows(SparqlText.run(q, nums, labels)) ==
      Set(Seq("a", "small"), Seq("b", "big"), Seq("c", "big")))
    val co =
      """SELECT ?s (COALESCE(?d, "alive") AS ?status) WHERE {
        |  ?s wdt:P569 ?b . OPTIONAL { ?s wdt:P570 ?d . }
        |}""".stripMargin
    val got = SparqlText.run(co, triples, labels).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("P1") == "1980-01-01" && got("P2") == "alive")
  }

  test("ASK queries answer existence with a short-circuit plan") {
    val yes = SparqlText.run("ASK WHERE { ?s wdt:P27 wd:Q40 . }", triples, labels)
    assert(yes.columns.toSeq == Seq("ask"))
    assert(yes.collect().map(_.getBoolean(0)).toSeq == Seq(true))
    val no = SparqlText.run(
      """ASK { ?s wdt:P27 wd:Q40 . FILTER(?s = "NOPE") }""", triples, labels)
    assert(no.collect().map(_.getBoolean(0)).toSeq == Seq(false))
  }

  test("multi-variable VALUES joins as an inline table") {
    val q =
      """SELECT ?s ?tier WHERE {
        |  ?s wdt:P27 ?c .
        |  VALUES (?c ?tier) { (wd:Q40 "at") (wd:Q28513 "other") }
        |}""".stripMargin
    assert(rows(SparqlText.run(q, triples, labels)) == Set(
      Seq("P1", "at"), Seq("P2", "at"), Seq("P8", "at"),
      Seq("P3", "other"), Seq("P7", "other")))
    val arity = intercept[RuntimeException](SparqlText.parse(
      """SELECT ?a WHERE { VALUES (?a ?b) { ("x") } }"""))
    assert(arity.getMessage.contains("arity"))
  }

  test("UNDEF rows leave their variable unconstrained (§10.2.2)") {
    // row 1 pins the citizenship and leaves ?tier free (stays unbound);
    // row 2 is a full wildcard on ?c with a bound tier — every solution
    // matches it, and P1/P2/P8 (Q40) match BOTH rows (multiset: twice)
    val q =
      """SELECT ?s ?c ?tier WHERE {
        |  ?s wdt:P27 ?c .
        |  VALUES (?c ?tier) { (wd:Q40 UNDEF) (UNDEF "any") }
        |}""".stripMargin
    val got = SparqlText.run(q, triples, labels).collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2))))
    assert(got.count(_ == (("P1", "wd:Q40", None))) == 1) // row-1 match
    assert(got.count(_ == (("P1", "wd:Q40", Some("any")))) == 1) // row-2 match
    assert(got.count(_._1 == "P3") == 1) // Q28513: only the wildcard row
    assert(got.count(_._1 == "P1") == 2) // multiset: both rows
    // single-variable membership form still rejects UNDEF (no-op hazard)
    val e = intercept[RuntimeException](SparqlText.parse(
      """SELECT ?a WHERE { ?a <p> ?o . VALUES ?a { UNDEF } }"""))
    assert(e.getMessage.contains("UNDEF"))
    // a LEADING wildcard block has no join partner — loud, not wrong
    val lead = intercept[RuntimeException](SparqlText.run(
      """SELECT ?a WHERE { VALUES (?a) { (UNDEF) } ?a wdt:P27 ?c }""",
      triples, labels))
    assert(lead.getMessage.contains("UNDEF"))
  }

  test("UNDEF compatibility is symmetric: unbound acc cells match any row") {
    // After the first VALUES block, row-1 matches carry ?tier = unbound.
    // Compatibility (§10.2) makes that unbound cell compatible with the
    // second block's DEFINED "gold" cell — a one-sided null test dropped it.
    val q =
      """SELECT ?s ?c ?tier ?rank WHERE {
        |  ?s wdt:P27 ?c .
        |  VALUES (?c ?tier) { (wd:Q40 UNDEF) (UNDEF "any") }
        |  VALUES (?tier ?rank) { ("gold" UNDEF) (UNDEF "r2") }
        |}""".stripMargin
    val got = SparqlText.run(q, triples, labels).collect()
      .map(r => (r.getString(0), Option(r.getString(2)), Option(r.getString(3))))
    // P1's unbound-tier solution × both rows, plus its "any" row × wildcard
    assert(got.count(_._1 == "P1") == 3)
    assert(got.contains(("P1", Some("gold"), None)))
    assert(got.contains(("P1", None, Some("r2"))))
    assert(got.contains(("P1", Some("any"), Some("r2"))))
  }

  test("VALUES as the first group element seeds the join") {
    val q =
      """SELECT ?s WHERE {
        |  VALUES (?c) { (wd:Q183) }
        |  ?s wdt:P27 ?c .
        |}""".stripMargin
    assert(rows(SparqlText.run(q, triples, labels)).map(_.head) == Set("P6"))
  }

  test("negated property sets: !p and !(p1|p2), also under modifiers") {
    val q = "SELECT ?o WHERE { <P1> !(wdt:P27|schema:description) ?o . }"
    assert(rows(SparqlText.run(q, triples, labels)).map(_.head) ==
      Set("1900-05-01", "1980-01-01"))
    // chained after a constant step
    val chain = "SELECT ?s ?o WHERE { ?s wdt:P570 ?d . ?s !wdt:P27 ?o . }"
    assert(SparqlText.run(chain, triples, labels).count() == 10)
    // inverse members parse since round 6 (dedicated semantics test below)
    SparqlText.parse("SELECT ?o WHERE { <P1> !(^wdt:P27) ?o . }")
  }

  test("HAVING over the unified grammar: connectives, arithmetic, agg-vs-agg") {
    // citizenship groups: Q40×3, Q28513×2, Q131964×1, Q699964×1, Q183×1
    val q =
      """SELECT ?c (COUNT(?s) AS ?n) WHERE { ?s wdt:P27 ?c . }
        |GROUP BY ?c
        |HAVING(COUNT(?s) >= 2 && COUNT(?s) < 3)""".stripMargin
    assert(rows(SparqlText.run(q, triples, labels)) == Set(Seq("wd:Q28513", 2L)))
    // arithmetic over two aggregates, one of them unprojected
    val q2 =
      """SELECT ?c (COUNT(?s) AS ?n) WHERE { ?s wdt:P27 ?c . }
        |GROUP BY ?c
        |HAVING(COUNT(?s) * 2 > COUNT(DISTINCT ?s) + 1)""".stripMargin
    assert(rows(SparqlText.run(q2, triples, labels)) ==
      Set(Seq("wd:Q40", 3L), Seq("wd:Q28513", 2L)))
    // aggregates stay illegal outside HAVING
    val e = intercept[RuntimeException](SparqlText.run(
      "SELECT ?s WHERE { ?s wdt:P27 ?c . FILTER(COUNT(?s) > 1) }",
      triples, labels))
    assert(e.getMessage.nonEmpty)
  }

  test("HAVING with two clauses and an aggregate over an expression") {
    val q =
      """SELECT ?c WHERE { ?s wdt:P27 ?c . ?s wdt:P569 ?b . }
        |GROUP BY ?c
        |HAVING(COUNT(*) >= 1) (MIN(YEAR(?b)) < 1900)""".stripMargin
    // min birth years: Q40 min(1900,1360,1940)=1360; Q28513 min(1949,1200)=1200;
    // Q131964 1970; Q699964 1949; Q183 1800
    assert(rows(SparqlText.run(q, triples, labels)).map(_.head) ==
      Set("wd:Q40", "wd:Q28513", "wd:Q183"))
  }

  test("GROUP BY expression keys: (expr AS ?v) buckets and projects") {
    val q =
      """SELECT ?decade (COUNT(?s) AS ?n) WHERE { ?s wdt:P569 ?b . }
        |GROUP BY (FLOOR(YEAR(?b) / 100.0) AS ?decade)""".stripMargin
    // century buckets: 1900s(1900,1949,1970,1949,1940)→19.0 ×5;
    // 1360→13.0; 1800→18.0; 1200→12.0
    val got = SparqlText.run(q, triples, labels).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got == Map(19.0 -> 5L, 13.0 -> 1L, 18.0 -> 1L, 12.0 -> 1L))
    // mixed: a plain key and an expression key together
    val q2 =
      """SELECT ?c ?century (COUNT(*) AS ?n) WHERE {
        |  ?s wdt:P27 ?c . ?s wdt:P569 ?b .
        |}
        |GROUP BY ?c (SUBSTR(?b, 1, 2) AS ?century)""".stripMargin
    assert(SparqlText.run(q2, triples, labels).columns.toSeq ==
      Seq("c", "century", "n"))
    // projecting a var that is neither a key nor an aggregate stays loud
    val e = intercept[RuntimeException](SparqlText.run(
      """SELECT ?s (COUNT(*) AS ?n) WHERE { ?s wdt:P569 ?b . }
        |GROUP BY (YEAR(?b) AS ?y)""".stripMargin, triples, labels))
    assert(e.getMessage.contains("GROUP BY"))
  }

  test("DESCRIBE constants and variables") {
    val c = SparqlText.run("DESCRIBE <P5>", triples, labels)
    assert(c.columns.toSeq == Seq("s", "p", "o"))
    assert(rows(c) == Set(
      Seq("P5", "wdt:P27", "wd:Q699964"), Seq("P5", "wdt:P569", "1949-01-01"),
      Seq("P5", "wdt:P570", "1999-09-09"), Seq("P5", "schema:description", "Maler")))
    val v = SparqlText.run(
      """DESCRIBE ?s WHERE { ?s wdt:P569 "1970-01-01" . }""", triples, labels)
    assert(rows(v) == Set(
      Seq("P4", "wdt:P27", "wd:Q131964"), Seq("P4", "wdt:P569", "1970-01-01")))
    val e = intercept[RuntimeException](SparqlText.parse("DESCRIBE ?x"))
    assert(e.getMessage.contains("WHERE"))
  }

  test("non-boolean FILTER and misused booleans fail loudly") {
    val e1 = intercept[RuntimeException](SparqlText.run(
      "SELECT ?s WHERE { ?s <n> ?v . FILTER(?v + 1) }", nums, labels))
    assert(e1.getMessage.contains("boolean"))
    val e2 = intercept[RuntimeException](SparqlText.run(
      "SELECT ?s WHERE { ?s <n> ?v . FILTER(STRLEN(?v > 1) = 2) }", nums, labels))
    assert(e2.getMessage.contains("boolean"))
  }

  /** (s, p, o, g) quad fixture: P1/P2 facts split across two named graphs,
    * with P1's type ONLY in gA and its date ONLY in gB — so same-graph
    * joins inside one GRAPH block are distinguishable from union-graph
    * joins. */
  private lazy val quads: DataFrame = Seq(
    ("P1", "type", "person", "gA"), ("P1", "date", "1900", "gB"),
    ("P1", "name", "one", "gA"),
    ("P2", "type", "person", "gB"), ("P2", "date", "1950", "gB"),
    ("P2", "name", "two", "gA")
  ).toDF("s", "p", "o", "g")

  test("GRAPH with a constant filters contained scans to that graph") {
    val r = SparqlText.run(
      "SELECT ?s ?o WHERE { GRAPH <gA> { ?s <type> ?o } }", quads, labels)
    assert(rows(r) == Set(Seq("P1", "person"))) // P2's type lives in gB
  }

  test("GRAPH ?g binds the graph and joins same-graph inside the block") {
    // same-graph: only P2 has type AND date in one graph (gB)
    val same = SparqlText.run(
      "SELECT ?g ?s WHERE { GRAPH ?g { ?s <type> ?x . ?s <date> ?d } }",
      quads, labels)
    assert(rows(same) == Set(Seq("gB", "P2")))
    // the bound ?g joins with outer occurrences and projects
    val proj = SparqlText.run(
      "SELECT ?s ?g WHERE { GRAPH ?g { ?s <name> ?n } }", quads, labels)
    assert(rows(proj) == Set(Seq("P1", "gA"), Seq("P2", "gA")))
  }

  test("GRAPH block + default-graph pattern = union-graph outer scan") {
    val r = SparqlText.run(
      """SELECT ?s ?d WHERE {
        |  GRAPH <gA> { ?s <type> "person" }
        |  ?s <date> ?d .
        |}""".stripMargin, quads, labels)
    assert(rows(r) == Set(Seq("P1", "1900"))) // outer pattern sees all graphs
  }

  test("FROM restricts the default graph; FROM NAMED restricts GRAPH") {
    val r = SparqlText.run(
      "SELECT ?s ?n FROM <gA> WHERE { ?s <name> ?n }", quads, labels)
    assert(rows(r) == Set(Seq("P1", "one"), Seq("P2", "two")))
    val r2 = SparqlText.run(
      """SELECT ?g ?s FROM NAMED <gA> WHERE { GRAPH ?g { ?s <type> ?t } }""",
      quads, labels)
    assert(rows(r2) == Set(Seq("gA", "P1"))) // gB's type triple out of range
  }

  test("explicit datasets are strict: FROM-only empties GRAPH, NAMED-only empties default") {
    // FROM without FROM NAMED → no named graphs → GRAPH matches nothing
    val g = SparqlText.run(
      "SELECT ?s FROM <gA> WHERE { GRAPH ?g { ?s <type> ?t } }", quads, labels)
    assert(g.count() == 0)
    // FROM NAMED without FROM → empty default graph
    val d = SparqlText.run(
      "SELECT ?s FROM NAMED <gA> WHERE { ?s <type> ?t }", quads, labels)
    assert(d.count() == 0)
    // no dataset clause → union default + all graphs (unchanged posture)
    val u = SparqlText.run("SELECT ?s WHERE { ?s <type> ?t }", quads, labels)
    assert(u.count() == 2)
  }

  test("dataset clauses are top-level only and need a quad source") {
    val e1 = intercept[RuntimeException](SparqlText.parse(
      "SELECT ?s WHERE { { SELECT ?s FROM <gA> WHERE { ?s <type> ?t } } }"))
    assert(e1.getMessage.contains("top level"))
    val e2 = intercept[IllegalArgumentException](SparqlText.run(
      "SELECT ?s FROM <gA> WHERE { ?s wdt:P27 ?o }", triples, labels))
    assert(e2.getMessage.contains("quad source"))
  }

  test("GRAPH fails loudly without a g column") {
    val e1 = intercept[IllegalArgumentException](SparqlText.run(
      "SELECT ?s WHERE { GRAPH <gA> { ?s wdt:P27 ?o } }", triples, labels))
    assert(e1.getMessage.contains("quad source"))
  }

  /** Edge fixture for graph-partitioned paths: gA holds x→y→z, gB holds
    * y→w — a union-graph (wrong) closure would chain x→w. */
  private lazy val pathQuads: DataFrame = Seq(
    ("x", "e", "y", "gA"), ("y", "e", "z", "gA"),
    ("y", "e", "w", "gB")
  ).toDF("s", "p", "o", "g")

  test("property path inside GRAPH ?var: the closure is graph-partitioned") {
    // '+': within gA, x reaches y and z; within gB, y reaches w.
    // x never reaches w — that chain crosses graphs.
    val plus = SparqlText.run(
      "SELECT ?g ?a ?b WHERE { GRAPH ?g { ?a <e>+ ?b } }", pathQuads, labels)
    assert(rows(plus) == Set(
      Seq("gA", "x", "y"), Seq("gA", "x", "z"), Seq("gA", "y", "z"),
      Seq("gB", "y", "w")))
    // '*': zero-hop domain is the PER-GRAPH edge-node set
    val star = SparqlText.run(
      "SELECT ?g ?a ?b WHERE { GRAPH ?g { ?a <e>* ?b } }", pathQuads, labels)
    assert(rows(star) == Set(
      Seq("gA", "x", "x"), Seq("gA", "y", "y"), Seq("gA", "z", "z"),
      Seq("gA", "x", "y"), Seq("gA", "x", "z"), Seq("gA", "y", "z"),
      Seq("gB", "y", "y"), Seq("gB", "w", "w"), Seq("gB", "y", "w")))
    // constant object: filtered post-split, still per-graph
    val toZ = SparqlText.run(
      "SELECT ?g ?a WHERE { GRAPH ?g { ?a <e>+ <z> } }", pathQuads, labels)
    assert(rows(toZ) == Set(Seq("gA", "x"), Seq("gA", "y")))
    // the bound graph variable joins with outer occurrences
    val joined = SparqlText.run(
      """SELECT ?g ?a WHERE {
        |  GRAPH ?g { ?a <e>+ <w> }
        |  GRAPH ?g { <y> <e> <w> }
        |}""".stripMargin, pathQuads, labels)
    assert(rows(joined) == Set(Seq("gB", "y")))
  }

  test("subselect inside GRAPH ?var: aggregates group within each graph") {
    // per-graph triple counts: gA has 2 edges, gB has 1
    val agg = SparqlText.run(
      """SELECT ?g ?c WHERE {
        |  GRAPH ?g { { SELECT (COUNT(*) AS ?c) WHERE { ?a <e> ?b } } }
        |}""".stripMargin, pathQuads, labels)
    assert(rows(agg) == Set(Seq("gA", 2L), Seq("gB", 1L)))
    // per-graph per-subject counts — the audit-query shape
    val per = SparqlText.run(
      """SELECT ?g ?a ?c WHERE {
        |  GRAPH ?g { { SELECT ?a (COUNT(?b) AS ?c) WHERE { ?a <e> ?b }
        |               GROUP BY ?a } }
        |}""".stripMargin, pathQuads, labels)
    assert(rows(per) == Set(
      Seq("gA", "x", 1L), Seq("gA", "y", 1L), Seq("gB", "y", 1L)))
    // non-aggregating subselect: DISTINCT is per (graph, projection)
    val dis = SparqlText.run(
      """SELECT ?g ?a WHERE {
        |  GRAPH ?g { { SELECT DISTINCT ?a WHERE { ?a <e> ?b } } }
        |}""".stripMargin, pathQuads, labels)
    assert(rows(dis) == Set(Seq("gA", "x"), Seq("gA", "y"), Seq("gB", "y")))
  }

  test("GRAPH ?var subselect modifiers: LIMIT/OFFSET cut WITHIN each graph") {
    // per-graph top-1 subject (ordered by ?a): gA picks x, gB picks y —
    // a global LIMIT 1 would keep only one row total
    val top1 = SparqlText.run(
      """SELECT ?g ?a WHERE {
        |  GRAPH ?g { { SELECT ?a WHERE { ?a <e> ?b } ORDER BY ?a LIMIT 1 } }
        |}""".stripMargin, pathQuads, labels)
    assert(rows(top1) == Set(Seq("gA", "x"), Seq("gB", "y")))
    // OFFSET skips within the graph: gA's second-ranked subject is y;
    // gB (one row) empties
    val second = SparqlText.run(
      """SELECT ?g ?a WHERE {
        |  GRAPH ?g { { SELECT ?a WHERE { ?a <e> ?b }
        |               ORDER BY ?a LIMIT 1 OFFSET 1 } }
        |}""".stripMargin, pathQuads, labels)
    assert(rows(second) == Set(Seq("gA", "y")))
    // per-graph top-1 of an AGGREGATED subselect: count per subject,
    // order by (count desc, subject) — gA ties 1/1 → x wins on name
    val topAgg = SparqlText.run(
      """SELECT ?g ?a ?c WHERE {
        |  GRAPH ?g { { SELECT ?a (COUNT(?b) AS ?c) WHERE { ?a <e> ?b }
        |               GROUP BY ?a ORDER BY DESC(?c) ?a LIMIT 1 } }
        |}""".stripMargin, pathQuads, labels)
    assert(rows(topAgg) == Set(Seq("gA", "x", 1L), Seq("gB", "y", 1L)))
    // a cut without ORDER BY is a nondeterministic pick — refused
    val e0 = intercept[RuntimeException](SparqlText.run(
      """SELECT ?g ?a WHERE {
        |  GRAPH ?g { { SELECT ?a WHERE { ?a <e> ?b } LIMIT 1 } }
        |}""".stripMargin, pathQuads, labels))
    assert(e0.getMessage.contains("requires ORDER BY"))
    // ORDER BY keys must be projected through the subselect
    val e1 = intercept[RuntimeException](SparqlText.run(
      """SELECT ?g ?a WHERE {
        |  GRAPH ?g { { SELECT ?a WHERE { ?a <e> ?b } ORDER BY ?b LIMIT 1 } }
        |}""".stripMargin, pathQuads, labels))
    assert(e1.getMessage.contains("non-projected"))
    val e2 = intercept[RuntimeException](SparqlText.run(
      """SELECT ?g WHERE {
        |  GRAPH ?g { { SELECT ?g (COUNT(*) AS ?c) WHERE { ?g <e> ?b }
        |               GROUP BY ?g } }
        |}""".stripMargin, pathQuads, labels))
    assert(e2.getMessage.contains("rename"))
  }

  test("LANG() as a general expression (projection + non-equality filter)") {
    // the fixture source carries oLang, so every object variable binds a
    // __lang_ companion; plain literals (dates) answer ""
    val q =
      """SELECT ?s ?d (LANG(?d) AS ?lg) WHERE {
        |  ?s schema:description ?d .
        |  FILTER(LANG(?d) != "en")
        |}""".stripMargin
    assert(rows(SparqlText.run(q, triples, labels)) == Set(
      Seq("P1", "Dichter", "de"), Seq("P5", "Maler", "de")))
    val plain = SparqlText.run(
      "SELECT (LANG(?b) AS ?lg) WHERE { ?s wdt:P569 ?b } LIMIT 1",
      triples, labels)
    assert(plain.collect().map(_.getString(0)).toSeq == Seq(""))
  }

  test("DATATYPE(): langString for tagged, xsd:string for plain literals") {
    val q =
      """SELECT DISTINCT (DATATYPE(?d) AS ?dt) WHERE {
        |  ?s schema:description ?d . FILTER(LANG(?d) = "de")
        |}""".stripMargin
    assert(rows(SparqlText.run(q, triples, labels)) == Set(
      Seq("http://www.w3.org/1999/02/22-rdf-syntax-ns#langString")))
    val q2 =
      "SELECT DISTINCT (DATATYPE(?b) AS ?dt) WHERE { ?s wdt:P569 ?b }"
    assert(rows(SparqlText.run(q2, triples, labels)) == Set(
      Seq("http://www.w3.org/2001/XMLSchema#string")))
  }

  test("STRLANG/STRDT construct tagged terms via BIND") {
    val q =
      """SELECT ?s ?lg ?dt WHERE {
        |  ?s wdt:P27 wd:Q40 .
        |  BIND(STRLANG("chat", "fr") AS ?t1)
        |  BIND(STRDT("42", <http://www.w3.org/2001/XMLSchema#integer>) AS ?t2)
        |  BIND(LANG(?t1) AS ?lg)
        |  BIND(DATATYPE(?t2) AS ?dt)
        |}""".stripMargin
    assert(rows(SparqlText.run(q, triples, labels)) == Set(
      Seq("P1", "fr", "http://www.w3.org/2001/XMLSchema#integer"),
      Seq("P2", "fr", "http://www.w3.org/2001/XMLSchema#integer"),
      Seq("P8", "fr", "http://www.w3.org/2001/XMLSchema#integer")))
    // constructors outside BIND refuse loudly
    val e = intercept[RuntimeException](SparqlText.run(
      """SELECT ?s WHERE { ?s wdt:P27 ?c . FILTER(STRLANG(?c, "x") = "y") }""",
      triples, labels))
    assert(e.getMessage.contains("BIND"))
  }

  test("negated property sets accept inverse members (§9.1)") {
    // inverse-only set: every REVERSED triple into wd:Q40 whose predicate
    // is outside {nope} — the three P27 citizens; no forward side at all
    val q1 = "SELECT ?o WHERE { wd:Q40 !(^<nope>) ?o }"
    assert(rows(SparqlText.run(q1, triples, labels)) ==
      Set(Seq("P1"), Seq("P2"), Seq("P8")))
    // the inverse complement excludes its member
    val q2 = "SELECT ?o WHERE { wd:Q40 !(^wdt:P27) ?o }"
    assert(rows(SparqlText.run(q2, triples, labels)).isEmpty)
    // mixed set: forward complement (P1's citizenship survives the three
    // excluded forward predicates) ∪ reversed complement (nothing enters
    // P1) — and the forward member set still excludes ITS members
    val q3 =
      """SELECT ?o WHERE {
        |  <P1> !(wdt:P569|wdt:P570|schema:description|^<z>) ?o
        |}""".stripMargin
    assert(rows(SparqlText.run(q3, triples, labels)) == Set(Seq("wd:Q40")))
  }

  test("EXISTS in expression positions (&&, IF, NOT) lifts to a mark join") {
    // ?s has a death date AND was born before 1950 — conjunction with an
    // EXISTS operand (§17.4.1.4)
    val q =
      """SELECT ?s WHERE {
        |  ?s wdt:P569 ?b .
        |  FILTER(?b < "1950-01-01" && EXISTS { ?s wdt:P570 ?d })
        |}""".stripMargin
    assert(rows(SparqlText.run(q, triples, labels)) ==
      Set(Seq("P1"), Seq("P3"), Seq("P5")))
    // NOT EXISTS as an expression operand, under ||
    val q2 =
      """SELECT ?s WHERE {
        |  ?s wdt:P569 ?b .
        |  FILTER(?b > "1965-01-01" || NOT EXISTS { ?s wdt:P570 ?d })
        |}""".stripMargin
    assert(rows(SparqlText.run(q2, triples, labels)) ==
      Set(Seq("P2"), Seq("P4"), Seq("P6"), Seq("P7"), Seq("P8")))
    // IF over an EXISTS condition — the lift is recursive
    val q3 =
      """SELECT ?s WHERE {
        |  ?s wdt:P569 ?b .
        |  FILTER(IF(EXISTS { ?s wdt:P570 ?d }, ?b < "1901-01-01",
        |            ?b > "1965-01-01"))
        |}""".stripMargin
    assert(rows(SparqlText.run(q3, triples, labels)) ==
      Set(Seq("P1"), Seq("P4")))
    // BIND lifts too (round 7): the mark feeds the bound expression
    val viaBind = SparqlText.run(
      """SELECT ?s ?f WHERE { ?s wdt:P569 ?b .
        |  BIND(IF(EXISTS { ?s wdt:P570 ?d }, "y", "n") AS ?f) }""".stripMargin,
      triples, labels)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaBind == Set(("P1", "y"), ("P3", "y"), ("P5", "y"),
      ("P2", "n"), ("P4", "n"), ("P6", "n"), ("P7", "n"), ("P8", "n")))
    // uncorrelated EXISTS refuses loudly, like the group-level form
    val e2 = intercept[RuntimeException](SparqlText.run(
      """SELECT ?s WHERE { ?s wdt:P569 ?b .
        |  FILTER(?b < "1950-01-01" && EXISTS { ?x wdt:P570 ?d }) }""".stripMargin,
      triples, labels))
    assert(e2.getMessage.contains("share"))
  }

  test("fidelity companions stay hidden and never become join keys") {
    // SELECT * must not leak __lang_/__dt_ columns
    val star = SparqlText.run(
      "SELECT * WHERE { ?s schema:description ?d }", triples, labels)
    assert(star.columns.toSet == Set("s", "d"))
    // a self-join on an object variable joins on VALUE (both description
    // rows of P1 carry different langs but the same subject — a join on
    // the companions would have to match lang too; value-join keeps both)
    val q =
      """SELECT ?s ?d WHERE {
        |  ?s schema:description ?d . ?s schema:description ?d .
        |}""".stripMargin
    assert(rows(SparqlText.run(q, triples, labels)).size == 4)
    // UNION arms binding ?x in object vs subject position line up (the
    // subject arm fills null companions = plain term)
    val u =
      """SELECT ?x (LANG(?x) AS ?lg) WHERE {
        |  { <P1> schema:description ?x } UNION { ?x wdt:P27 wd:Q28513 }
        |}""".stripMargin
    val got = SparqlText.run(u, triples, labels).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("Dichter", "de"), ("poet", "en"), ("P3", ""), ("P7", "")))
  }

  test("hash builtins match reference digests; ENCODE_FOR_URI encodes per §17.4.3.12") {
    // SHA1/384/512 have no DuckDB twin, so the oracle gate can't cover
    // them (q142 oracles MD5/SHA256) — pin them to MessageDigest here.
    def hex(alg: String, s: String): String =
      java.security.MessageDigest.getInstance(alg)
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val q =
      """SELECT ?o (SHA1(?o) AS ?s1) (SHA384(?o) AS ?s384)
        |       (SHA512(?o) AS ?s512)
        |       (ENCODE_FOR_URI(CONCAT(?o, " +*~/x")) AS ?enc)
        |WHERE { <P1> schema:description ?o . FILTER(LANG(?o) = "en") }"""
        .stripMargin
    val r = SparqlText.run(q, triples, labels).collect()
    assert(r.length == 1)
    assert(r(0).getString(0) == "poet")
    assert(r(0).getString(1) == hex("SHA-1", "poet"))
    assert(r(0).getString(2) == hex("SHA-384", "poet"))
    assert(r(0).getString(3) == hex("SHA-512", "poet"))
    // space -> %20 (not '+'), '+' -> %2B, '*' -> %2A (url_encode leaves it
    // bare), '~' stays bare (url_encode would %7E it), '/' -> %2F
    assert(r(0).getString(4) == "poet%20%2B%2A~%2Fx")
  }

  test("time accessors are lexical: zoned hour as written, date-only unbound") {
    val spark2 = spark
    import spark2.implicits._
    val t = Seq(
      ("E1", "at", "2020-03-01T14:45:13Z"),
      ("E2", "at", "2020-03-01T23:05:59+05:30"), // zoned: hour STAYS 23
      ("E3", "at", "2020-03-01"),                // date-only: no time part
      ("E4", "at", "BERT2020Z")                  // not a dateTime at all
    ).toDF("s", "p", "o")
    val r = SparqlText.run(
      """SELECT ?x (HOURS(?d) AS ?h) (MINUTES(?d) AS ?m)
        |       (SECONDS(?d) AS ?sec) (TZ(?d) AS ?tz)
        |WHERE { ?x <at> ?d . }""".stripMargin,
      t, labels).collect().map(r => r.getString(0) -> r).toMap
    assert(r("E1").getDouble(1) == 14 && r("E1").getDouble(2) == 45 &&
      r("E1").getDouble(3) == 13 && r("E1").getString(4) == "Z")
    // a +05:30 literal is NOT renormalized into the session zone
    assert(r("E2").getDouble(1) == 23 && r("E2").getDouble(2) == 5 &&
      r("E2").getString(4) == "+05:30")
    // date-only: accessors are unbound (NULL), TZ is the empty string
    assert(r("E3").isNullAt(1) && r("E3").isNullAt(2) && r("E3").isNullAt(3))
    assert(r("E3").getString(4) == "")
    // anchored shape: a non-dateTime literal containing "T20"/ending in Z
    // yields NULL components and an empty TZ, never a bogus extraction
    assert(r("E4").isNullAt(1) && r("E4").isNullAt(2) && r("E4").isNullAt(3))
    assert(r("E4").getString(4) == "")
    // and an accessor in FILTER position silently drops the unbound row
    val filtered = SparqlText.run(
      "SELECT ?x WHERE { ?x <at> ?d . FILTER(HOURS(?d) >= 0) }", t, labels)
      .collect().map(_.getString(0)).toSet
    assert(filtered == Set("E1", "E2"))
  }

  test("typed ORDER BY: numeric value order, kind rank, DISTINCT refuses") {
    val spark2 = spark
    import spark2.implicits._
    val xsdInt = "http://www.w3.org/2001/XMLSchema#integer"
    val t = Seq(
      ("A", "k", "2", Option.empty[String], Option(xsdInt), "literal"),
      ("B", "k", "10", Option.empty[String], Option(xsdInt), "literal"),
      ("C", "k", "9", Option.empty[String], Option(xsdInt), "literal"),
      ("D", "r", "R1", Option.empty[String], Option.empty[String], "iri")
    ).toDF("s", "p", "o", "oLang", "oDatatype", "oType")
    val q = """SELECT ?s ?v WHERE { { ?s <k> ?v . } UNION { ?s <r> ?v . } }
              |ORDER BY %s(?v) LIMIT 2""".stripMargin
    // DESC: literals outrank IRIs reversed; numerics by VALUE → 10 then 9
    // (lexical desc would have put "9" first)
    val desc = SparqlText.run(q.format("DESC"), t, labels).collect()
    assert(desc.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq("B" -> "10", "C" -> "9"))
    // ASC: the IRI ranks before every literal, then numeric 2 before 9, 10
    val asc = SparqlText.run(q.format("ASC"), t, labels).collect()
    assert(asc.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq("D" -> "R1", "A" -> "2"))
    // typed keys + DISTINCT: the dedup shuffle would discard the typed
    // sort — refuse loudly instead of silently going lexical
    val e = intercept[RuntimeException](SparqlText.run(
      "SELECT DISTINCT ?v WHERE { ?s <k> ?v . } ORDER BY ?v", t, labels))
    assert(e.getMessage.contains("DISTINCT"))
  }

  test("IRI()/URI(): kind-tagged term via BIND, value passthrough in filters") {
    val spark2 = spark
    import spark2.implicits._
    val t = Seq(("P1", "slug", "alpha", "literal"),
                ("P2", "slug", "beta", "literal"))
      .toDF("s", "p", "o", "oType")
    val r = SparqlText.run(
      """SELECT ?s ?u (ISIRI(?u) AS ?isi) WHERE {
        |  ?s <slug> ?v .
        |  BIND(IRI(CONCAT("urn:x:", ?v)) AS ?u)
        |  FILTER(URI(?v) = "alpha")
        |}""".stripMargin, t, labels).collect()
    assert(r.length == 1)
    assert(r(0).getString(0) == "P1")
    assert(r(0).getString(1) == "urn:x:alpha")
    assert(r(0).getBoolean(2), "BIND(IRI(...)) must tag kind iri")
    // the STRUUID mint shape still takes the deterministic-surrogate path
    val mint = SparqlText.run(
      """SELECT ?c WHERE { ?s <slug> ?v .
        |  BIND(URI(CONCAT("urn:m:", STRUUID())) AS ?c) }""".stripMargin,
      t, labels).collect()
    assert(mint.length == 2 && mint.forall(_.getString(0).startsWith("urn:m:")))
  }

  test("CONSTRUCT WHERE shorthand: template == pattern, BGP-only") {
    val r = SparqlText.run(
      "CONSTRUCT WHERE { ?s wdt:P570 ?d . }", triples, labels).collect()
    assert(r.length == 3)
    assert(r.forall(_.getString(1) == "wdt:P570"))
    // the long form with the same template+pattern produces the same graph
    val long = SparqlText.run(
      "CONSTRUCT { ?s wdt:P570 ?d . } WHERE { ?s wdt:P570 ?d . }",
      triples, labels).collect()
    assert(r.map(_.toSeq).toSet == long.map(_.toSeq).toSet)
    // non-BGP shorthand refuses loudly per §10.2.3
    val e = intercept[RuntimeException](SparqlText.run(
      "CONSTRUCT WHERE { ?s wdt:P570 ?d . FILTER(?d > \"1990\") }",
      triples, labels))
    assert(e.getMessage.contains("basic graph pattern"))
  }

  test("CONSTRUCT solution modifiers (§10.2): ORDER BY/LIMIT/OFFSET cut the solutions") {
    // deaths: P1 1980-01-01, P3 2000-06-15, P5 1999-09-09 — DESC(?d)
    // orders P3, P5, P1; LIMIT 2 instantiates the template for P3 and P5
    val top2 = SparqlText.run(
      """CONSTRUCT { ?s <died> ?d } WHERE { ?s wdt:P570 ?d }
        |ORDER BY DESC(?d) ?s
        |LIMIT 2""".stripMargin, triples, labels)
    assert(rows(top2) == Set(Seq("P3", "died", "2000-06-15"),
      Seq("P5", "died", "1999-09-09")))
    // OFFSET skips within the same order; $param resolution works too
    val second = SparqlText.run(
      """CONSTRUCT { ?s <died> ?d } WHERE { ?s wdt:P570 ?d }
        |ORDER BY DESC(?d) ?s
        |LIMIT $limit OFFSET $offset""".stripMargin, triples, labels,
      Map("limit" -> 1L, "offset" -> 1L))
    assert(rows(second) == Set(Seq("P5", "died", "1999-09-09")))
    // multi-template: the SAME solution cut instantiates every arm
    val multi = SparqlText.run(
      """CONSTRUCT { ?s <died> ?d . ?s <type> <Dead> }
        |WHERE { ?s wdt:P570 ?d }
        |ORDER BY DESC(?d) LIMIT 1""".stripMargin, triples, labels)
    assert(rows(multi) == Set(Seq("P3", "died", "2000-06-15"),
      Seq("P3", "type", "Dead")))
    // GROUP BY with a template var outside the keys refuses loudly
    // (grouped CONSTRUCT itself is supported — see the dedicated test)
    val e = intercept[RuntimeException](SparqlText.run(
      """CONSTRUCT { ?s <x> ?d } WHERE { ?s wdt:P570 ?d } GROUP BY ?s""",
      triples, labels))
    assert(e.getMessage.contains("ungrouped variable"))
  }

  test("LANGMATCHES: RFC 4647 basic filtering in both positions") {
    val spark2 = spark
    import spark2.implicits._
    val t = Seq(
      ("P1", "lbl", "Dichter", Option("de")),
      ("P2", "lbl", "Wiener", Option("de-AT")),
      ("P3", "lbl", "poet", Option("en")),
      ("P4", "lbl", "plain", Option.empty[String])
    ).toDF("s", "p", "o", "oLang")
    def ids(q: String): Set[String] =
      SparqlText.run(q, t, labels).collect().map(_.getString(0)).toSet
    // scan-attached fast path: "de" matches de AND de-AT (prefix), not en
    assert(ids("""SELECT ?s WHERE { ?s <lbl> ?l . FILTER(langmatches(lang(?l), "de")) }""") ==
      Set("P1", "P2"))
    // "*" matches any TAGGED literal, not the untagged one
    assert(ids("""SELECT ?s WHERE { ?s <lbl> ?l . FILTER(langmatches(lang(?l), "*")) }""") ==
      Set("P1", "P2", "P3"))
    // composite expression position compiles through the same predicate
    assert(ids("""SELECT ?s WHERE { ?s <lbl> ?l .
                 |  FILTER(STRLEN(?l) > 5 && LANGMATCHES(LANG(?l), "de")) }"""
        .stripMargin) == Set("P1", "P2"))
  }

  test("BNODE(): per-solution surrogate, same-label coalescing, ISBLANK true") {
    val spark2 = spark
    import spark2.implicits._
    val t = Seq(("P1", "slug", "alpha", "literal"),
                ("P2", "slug", "beta", "literal"))
      .toDF("s", "p", "o", "oType")
    val r = SparqlText.run(
      """SELECT ?s ?b1 ?b2 ?b3 (ISBLANK(?b1) AS ?isb) WHERE {
        |  ?s <slug> ?v .
        |  BIND(BNODE(?v) AS ?b1)
        |  BIND(BNODE(?v) AS ?b2)
        |  BIND(BNODE() AS ?b3)
        |}""".stripMargin, t, labels).collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(row.getString(1).startsWith("_:b"))
      // same label in the same solution -> the SAME bnode... (§17.4.2.9)
      assert(row.getString(1) == row.getString(2))
      assert(row.getBoolean(4))
    }
    // ...and distinct solutions -> distinct bnodes, for both forms
    assert(r.map(_.getString(1)).distinct.length == 2)
    assert(r.map(_.getString(3)).distinct.length == 2)
    // expression position refuses loudly (mint-policy surface is BIND)
    val e = intercept[RuntimeException](SparqlText.run(
      "SELECT ?s WHERE { ?s <slug> ?v . FILTER(BNODE(?v) = \"x\") }",
      t, labels))
    assert(e.getMessage.contains("BIND"))
  }

  test("grouped path sequences: (p/q)|r and (p/q)* compose the arm scans") {
    val spark2 = spark
    import spark2.implicits._
    // p∘q hops A→B→C; r hops A→X; an extra q-edge D→E never reachable
    // via p — it must NOT leak into the composite relation
    val t = Seq(("A", "p", "B"), ("B", "q", "C"), ("A", "r", "X"),
                ("D", "q", "E")).toDF("s", "p", "o")
    val alt = SparqlText.run(
      "SELECT ?o WHERE { <A> (<p>/<q>)|<r> ?o . }", t, labels)
      .collect().map(_.getString(0)).toSet
    assert(alt == Set("C", "X"))
    // closure of the composite: chain A→B→C→B2→C2 under p/q pairs
    val t2 = Seq(("A", "p", "B"), ("B", "q", "C"),
                 ("C", "p", "B2"), ("B2", "q", "C2")).toDF("s", "p", "o")
    val star = SparqlText.run(
      "SELECT ?o WHERE { <A> (<p>/<q>)* ?o . }", t2, labels)
      .collect().map(_.getString(0)).toSet
    assert(star == Set("A", "C", "C2")) // zero, one, and two composite hops
    val plus = SparqlText.run(
      "SELECT ?o WHERE { <A> (<p>/<q>)+ ?o . }", t2, labels)
      .collect().map(_.getString(0)).toSet
    assert(plus == Set("C", "C2"))
    // inverse members inside an arm: ^p walks B→A, then r walks A→X
    val inv = SparqlText.run(
      "SELECT ?o WHERE { <B> (^<p>/<r>) ?o . }", t, labels)
      .collect().map(_.getString(0)).toSet
    assert(inv == Set("X"))
    // single-predicate groups and sequences of groups stay legal
    assert(SparqlText.run(
      "SELECT ?o WHERE { <P1> (wdt:P570) ?o . }", triples, labels)
      .collect().nonEmpty)
    // NPS arms still refuse sequences (§9.1 grammar)
    val e = intercept[RuntimeException](SparqlText.parse(
      "SELECT ?o WHERE { <A> !(<p>/<q>) ?o . }"))
    assert(e.getMessage.contains("negated property sets"))
  }

  test("BIND(EXISTS{...} AS ?b) lifts the mark and binds a boolean") {
    val spark2 = spark
    import spark2.implicits._
    val t = Seq(("A", "p", "1"), ("B", "p", "2"), ("A", "q", "x"))
      .toDF("s", "p", "o")
    val r = SparqlText.run(
      """SELECT ?s ?b ?c WHERE {
        |  ?s <p> ?v .
        |  BIND(EXISTS { ?s <q> ?w } AS ?b)
        |  BIND(IF(EXISTS { ?s <q> ?w2 }, "has-q", "no-q") AS ?c)
        |}""".stripMargin, t, labels)
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
      .toSet
    assert(r == Set(("A", true, "has-q"), ("B", false, "no-q")))
    // NOT EXISTS in BIND, and the mark never leaks as a column
    val r2 = SparqlText.run(
      """SELECT ?s ?nb WHERE {
        |  ?s <p> ?v . BIND(NOT EXISTS { ?s <q> ?w } AS ?nb)
        |}""".stripMargin, t, labels)
    assert(!r2.columns.exists(_.startsWith("__exists")))
    assert(r2.collect().map(r => (r.getString(0), r.getBoolean(1))).toSet ==
      Set(("A", false), ("B", true)))
  }

  test("EXISTS in SELECT projections lifts like FILTER/BIND") {
    val spark2 = spark
    import spark2.implicits._
    val t = Seq(("A", "p", "1"), ("B", "p", "2"), ("A", "q", "x"))
      .toDF("s", "p", "o")
    val r = SparqlText.run(
      """SELECT ?s (EXISTS { ?s <q> ?w } AS ?b)
        |       (IF(NOT EXISTS { ?s <q> ?w2 }, "solo", "linked") AS ?k)
        |WHERE { ?s <p> ?v }""".stripMargin, t, labels)
    assert(!r.columns.exists(_.startsWith("__exists")))
    assert(r.collect().map(x => (x.getString(0), x.getBoolean(1),
      x.getString(2))).toSet ==
      Set(("A", true, "linked"), ("B", false, "solo")))
  }

  test("SELECT REDUCED eliminates duplicates (the deterministic conforming choice)") {
    // P1 and P8 share country Q40 → the projection has duplicate rows;
    // REDUCED may drop any subset (§18.2.5.3) — the engine drops all,
    // the only SF-independent deterministic option
    val red = SparqlText.run(
      "SELECT REDUCED ?c WHERE { ?x wdt:P27 ?c }", triples, labels)
      .collect().map(_.getString(0)).toSeq
    assert(red.distinct == red) // no duplicates survive
    assert(red.toSet == Set("wd:Q40", "wd:Q28513", "wd:Q131964",
      "wd:Q699964", "wd:Q183"))
  }

  test("subselect inside GRAPH: constant graph scopes the inner query; " +
      "?var evaluates per graph") {
    val spark2 = spark
    import spark2.implicits._
    val quads = Seq(
      ("A", "p", "1", "g1"), ("A", "p", "2", "g1"), ("B", "p", "3", "g1"),
      ("A", "p", "9", "g2"), ("A", "q", "x", "g1")).toDF("s", "p", "o", "g")
    val got = SparqlText.run(
      """SELECT ?s ?c WHERE {
        |  GRAPH <g1> { { SELECT ?s (COUNT(?o) AS ?c) WHERE { ?s <p> ?o } GROUP BY ?s } }
        |}""".stripMargin, quads, labels)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // g2's A-row must NOT count: the aggregate groups inside g1 only
    assert(got == Set(("A", 2L), ("B", 1L)))
    // variable graph: the same subselect aggregates WITHIN each graph —
    // A counts 2 in g1 and 1 in g2, never 3
    val per = SparqlText.run(
      """SELECT ?g ?s ?c WHERE {
        |  GRAPH ?g { { SELECT ?s (COUNT(?o) AS ?c) WHERE { ?s <p> ?o } GROUP BY ?s } }
        |}""".stripMargin, quads, labels)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(per == Set(("g1", "A", 2L), ("g1", "B", 1L), ("g2", "A", 1L)))
  }

  test("BGP join order: selectivity-greedy, connectivity-preserving, barrier-safe") {
    import SparqlText.{Tp, TpVar, Path, PStep, V, C, FilterExpr, EVar}
    def tp(s: SparqlText.Term, p: String, o: SparqlText.Term) =
      Tp(s, Path(Seq(PStep(Seq((p, false)), ""))), o)
    val unsel = TpVar(V("x"), "p2", V("o"))          // unfiltered scan
    val closure = Tp(V("x"), Path(Seq(PStep(Seq(("nation", false)), "*"))), V("n"))
    val sel = tp(V("x"), "type", C("Supplier"))      // constant p + o
    // worst textual order: unselective first, closure, selective last →
    // greedy emits the selective scan first, the closure LAST
    val got = SparqlText.reorderPatterns(Seq(unsel, closure, sel))
    assert(got == Seq(sel, unsel, closure))
    // connectivity beats raw score: ?y's constant-object pattern scores
    // higher than ?x's second pattern, but shares nothing with the bound
    // set until the bridge pattern runs — no early cross join
    val a1 = tp(V("x"), "type", C("Supplier"))
    val a2 = tp(V("x"), "nation", V("nn"))
    val b1 = tp(V("y"), "kind", C("K"))
    val got2 = SparqlText.reorderPatterns(Seq(b1, a1, a2))
    assert(got2.take(2) == Seq(a1, a2) || got2.head == b1,
      s"unexpected order: $got2")
    // (b1 first is fine — it is the start pick; what must NOT happen is
    // b1 landing between a1 and a2)
    assert(got2 != Seq(a1, b1, a2))
    // barriers split runs: a FILTER between patterns pins both sides
    val f = FilterExpr(EVar("x"))
    assert(SparqlText.reorderPatterns(Seq(unsel, f, sel)) == Seq(unsel, f, sel))
    // and the results of a deliberately badly-ordered query match the
    // hand-ordered twin
    val bad = SparqlText.run(
      """SELECT ?x ?p2 ?o WHERE { ?x ?p2 ?o . ?x wdt:P27 wd:Q40 . }""",
      triples, labels).collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2))).toSet
    val good = SparqlText.run(
      """SELECT ?x ?p2 ?o WHERE { ?x wdt:P27 wd:Q40 . ?x ?p2 ?o . }""",
      triples, labels).collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2))).toSet
    assert(bad == good && bad.nonEmpty)
  }

  test("per-member modifiers inside path groups: (P31/P279*) composes closures") {
    val spark2 = spark
    import spark2.implicits._
    val t = Seq(("A", "p", "B"), ("B", "q", "C"), ("C", "q", "D"),
                ("A", "q", "X")).toDF("s", "p", "o")
    // the canonical instance-of/subclass-of idiom: p then zero+ q-hops
    val star = SparqlText.run(
      "SELECT ?o WHERE { <A> (<p>/<q>*) ?o . }", t, labels)
      .collect().map(_.getString(0)).toSet
    assert(star == Set("B", "C", "D"))
    val plus = SparqlText.run(
      "SELECT ?o WHERE { <A> (<p>/<q>+) ?o . }", t, labels)
      .collect().map(_.getString(0)).toSet
    assert(plus == Set("C", "D"))
    // optional FIRST member: q alone union p-then-q
    val opt = SparqlText.run(
      "SELECT ?o WHERE { <A> (<p>?/<q>) ?o . }", t, labels)
      .collect().map(_.getString(0)).toSet
    assert(opt == Set("X", "C"))
    // fully zero-admitting arm escalates the step to zero-admitting:
    // (q*) behaves as the plain star including the zero hop
    val zero = SparqlText.run(
      "SELECT ?o WHERE { <B> (<q>*) ?o . }", t, labels)
      .collect().map(_.getString(0)).toSet
    assert(zero == Set("B", "C", "D"))
    // ... and under '+' the zero-admitting arm makes the step a '*'
    val plusZero = SparqlText.run(
      "SELECT ?o WHERE { <B> (<q>?)+ ?o . }", t, labels)
      .collect().map(_.getString(0)).toSet
    assert(plusZero == Set("B", "C", "D"))
    // modified members never enter a negated set (§9.1 grammar)
    val e = intercept[RuntimeException](SparqlText.parse(
      "SELECT ?o WHERE { <A> !(<p>*|<q>) ?o . }"))
    assert(e.getMessage.contains("modified members"))
  }

  test("deliberate refusals: RAND/NOW/UUID fail with the reason; " +
      "STRLANG outside BIND points at the BIND form") {
    Seq("RAND()", "NOW()", "UUID()").foreach { fn =>
      val e = intercept[RuntimeException](SparqlText.run(
        s"SELECT ?s WHERE { ?s wdt:P570 ?d . FILTER($fn > ?d) }",
        triples, labels))
      assert(e.getMessage.contains("nondeterministic"), fn)
    }
    val sl = intercept[RuntimeException](SparqlText.run(
      "SELECT ?s WHERE { ?s wdt:P570 ?d . " +
        "FILTER(STRLANG(?d, \"en\") = ?d) }",
      triples, labels))
    assert(sl.getMessage.contains("BIND only"))
  }

  test("OPTIONAL filter over outer variables is the LeftJoin condition (§8.3.2)") {
    val spark2 = spark
    import spark2.implicits._
    val t = Seq(("A", "p", "1"), ("B", "p", "2"),
                ("A", "q", "1"), ("B", "q", "9")).toDF("s", "p", "o")
    // B's q-row exists but fails the cross-side filter → B must SURVIVE
    // with ?w unbound (a post-join filter would drop it; evaluating
    // inside the optional alone cannot see ?v)
    val r = SparqlText.run(
      """SELECT ?s ?v ?w WHERE {
        |  ?s <p> ?v . OPTIONAL { ?s <q> ?w . FILTER(?w = ?v) }
        |}""".stripMargin, t, labels)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(r == Set(("A", "1", "1"), ("B", "2", null)))
    // filters the inner group can satisfy alone keep the inside path
    val inner = SparqlText.run(
      """SELECT ?s ?w WHERE {
        |  ?s <p> ?v . OPTIONAL { ?s <q> ?w . FILTER(?w > "5") }
        |}""".stripMargin, t, labels)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(inner == Set(("A", null), ("B", "9")))
    // §10.1: BIND may not rebind an in-scope variable
    val e = intercept[RuntimeException](SparqlText.run(
      """SELECT ?s WHERE { ?s <p> ?v . BIND("x" AS ?v) }""", t, labels))
    assert(e.getMessage.contains("already bound"))
    // zero shared variables + a deferred filter: the condition decides
    // compatibility over the cross product (A: 9<1 fails -> null-extend;
    // B: 9 qualifies against nothing... v=2: 9<2 fails too) — rebuild
    // with values where the outcomes split
    val t2 = Seq(("A", "p", "1"), ("B", "p", "5"), ("X", "r", "3"))
      .toDF("s", "p", "o")
    val dis = SparqlText.run(
      """SELECT ?s ?w WHERE {
        |  ?s <p> ?v . OPTIONAL { ?x <r> ?w . FILTER(?w < ?v) }
        |}""".stripMargin, t2, labels)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(dis == Set(("A", null), ("B", "3")))
    // a left row already carrying a NULL (from an earlier OPTIONAL) that
    // DOES have a surviving match must appear exactly once: the
    // matched-vs-unmatched split keys on every left column, so its
    // equality has to be null-safe or the row is also spuriously
    // null-extended
    val nullSafe = SparqlText.run(
      """SELECT ?s ?u ?w WHERE {
        |  ?s <p> ?v .
        |  OPTIONAL { ?s <m> ?u }
        |  OPTIONAL { ?s <q> ?w . FILTER(?w = ?v) }
        |}""".stripMargin, t, labels)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(nullSafe.count(_._1 == "A") == 1)
    assert(nullSafe.toSet == Set(("A", null, "1"), ("B", null, null)))
  }

  test("term-kind predicates: bnode truth table; plain stores fail loudly") {
    val kinds = Seq[(String, String, String, Option[String], Option[String], String)](
      ("s1", "p", "http://x/e1", None, None, "iri"),
      ("s1", "p", "_:b0", None, None, "bnode"),
      ("s2", "p", "42", None,
        Some("http://www.w3.org/2001/XMLSchema#integer"), "literal"),
      ("s2", "p", "plain", None, None, "literal"))
      .toDF("s", "p", "o", "oLang", "oDatatype", "oType")
    val got = SparqlText.run(
      """SELECT ?o (ISIRI(?o) AS ?i) (ISBLANK(?o) AS ?b)
        |       (ISLITERAL(?o) AS ?l) (ISNUMERIC(?o) AS ?n)
        |WHERE { ?s <p> ?o }""".stripMargin, kinds, labels)
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))
      .toMap
    assert(got("http://x/e1") === ((true, false, false, false)))
    assert(got("_:b0") === ((false, true, false, false)))
    assert(got("42") === ((false, false, true, true)))
    assert(got("plain") === ((false, false, true, false)))
    // A store with no oType column cannot answer ISIRI — the companion
    // column's absence surfaces at analysis, never a guessed answer.
    val e = intercept[Exception](SparqlText.run(
      "SELECT ?o (ISIRI(?o) AS ?i) WHERE { ?s wdt:P27 ?o }", triples, labels)
      .collect())
    assert(e.getMessage.contains("__kind_"), e.getMessage)
  }

  test("sameTerm: tag identity beyond value equality") {
    // ?d2 = STRLANG(STR(?d), "xx") has ?d's lexical form with a DIFFERENT
    // lang tag: = (value equality) accepts it, sameTerm must not.
    val q =
      """SELECT ?d (SAMETERM(?d, ?d) AS ?self) (SAMETERM(?d, ?d2) AS ?retag)
        |       ((?d = ?d2) AS ?valeq)
        |WHERE {
        |  <P1> schema:description ?d . FILTER(LANG(?d) = "de")
        |  BIND(STRLANG(STR(?d), "xx") AS ?d2)
        |}""".stripMargin
    val r = SparqlText.run(q, triples, labels).collect()
    assert(r.length == 1)
    assert(r(0).getString(0) == "Dichter")
    assert(r(0).getBoolean(1), "a term is sameTerm with itself")
    assert(!r(0).getBoolean(2), "re-tagged copy is equal but not sameTerm")
    assert(r(0).getBoolean(3), "value equality accepts the re-tagged copy")
  }

  test("general SERVICE: registry join, SILENT unit, unknown IRI refuses") {
    // a second store with facts absent from `triples`: per-person genres
    val endpoint = Seq(
      ("P1", "ex:genre", "lyric"), ("P3", "ex:genre", "prose"),
      ("P9", "ex:genre", "drama") // P9 unknown to the main store
    ).toDF("s", "p", "o")
    SparqlText.registerService("http://test/ep", endpoint)
    try {
      val q =
        """SELECT ?s ?g WHERE {
          |  ?s wdt:P570 ?d .
          |  SERVICE <http://test/ep> { ?s ex:genre ?g }
          |}""".stripMargin
      // deaths: P1,P3,P5 — bag join keeps the two with genres
      assert(rows(SparqlText.run(q, triples, labels)) ==
        Set(Seq("P1", "lyric"), Seq("P3", "prose")))
      // SILENT on an unregistered endpoint = unit solution (join identity)
      val silent =
        """SELECT ?s WHERE {
          |  ?s wdt:P570 ?d .
          |  SERVICE SILENT <http://test/unknown> { ?s ex:genre ?g }
          |}""".stripMargin
      assert(rows(SparqlText.run(silent, triples, labels)).map(_.head) ==
        Set("P1", "P3", "P5"))
      // non-SILENT unknown IRI refuses loudly
      val e = intercept[RuntimeException](SparqlText.run(
        silent.replace("SERVICE SILENT", "SERVICE"), triples, labels))
      assert(e.getMessage.contains("no endpoint registered"))
      // a variable endpoint with an UNBOUND variable refuses loudly
      val e2 = intercept[RuntimeException](SparqlText.run(
        silent.replace("SERVICE SILENT <http://test/unknown>", "SERVICE ?ep"),
        triples, labels))
      assert(e2.getMessage.contains("not bound"))
    } finally SparqlText.unregisterService("http://test/ep")
  }

  test("SERVICE ?var: per-binding dispatch over the registered endpoints") {
    // two OVERLAPPING endpoints with conflicting facts: per-binding
    // dispatch must consult exactly the endpoint each row names — a
    // union-over-endpoints evaluation would emit both variants
    val epA = Seq(("P1", "ex:genre", "lyric"), ("P3", "ex:genre", "WRONG-A"))
      .toDF("s", "p", "o")
    val epB = Seq(("P3", "ex:genre", "prose"), ("P1", "ex:genre", "WRONG-B"))
      .toDF("s", "p", "o")
    // main store: each subject names its home endpoint; P5 names an
    // unregistered one
    val main = Seq(
      ("P1", "ex:src", "http://eps/A"), ("P3", "ex:src", "http://eps/B"),
      ("P5", "ex:src", "http://eps/NONE")).toDF("s", "p", "o")
    SparqlText.registerService("http://eps/A", epA)
    SparqlText.registerService("http://eps/B", epB)
    try {
      val q =
        """SELECT ?s ?ep ?g WHERE {
          |  ?s ex:src ?ep .
          |  SERVICE ?ep { ?s ex:genre ?g }
          |}""".stripMargin
      assert(rows(SparqlText.run(q, main, labels)) == Set(
        Seq("P1", "http://eps/A", "lyric"),
        Seq("P3", "http://eps/B", "prose")))
      // body reusing the endpoint variable refuses
      val e = intercept[RuntimeException](SparqlText.run(
        """SELECT ?s WHERE { ?s ex:src ?ep . SERVICE ?ep { ?ep ex:genre ?g } }""",
        main, labels))
      assert(e.getMessage.contains("reuse"))
    } finally {
      SparqlText.unregisterService("http://eps/A")
      SparqlText.unregisterService("http://eps/B")
    }
  }

  test("SERVICE bound join: outer bindings semi-filter the service plan") {
    val endpoint = Seq(
      ("P1", "ex:genre", "lyric"), ("P3", "ex:genre", "prose"),
      ("P9", "ex:genre", "drama")
    ).toDF("s", "p", "o")
    SparqlText.registerService("http://test/ep2", endpoint)
    try {
      val df = SparqlText.run(
        """SELECT ?s ?g WHERE {
          |  ?s wdt:P570 ?d .
          |  SERVICE <http://test/ep2> { ?s ex:genre ?g }
          |}""".stripMargin, triples, labels)
      // §18 bound join: the service-side plan carries a LeftSemi join on
      // the distinct outer bindings — the registered frame is filtered by
      // the outer pattern BEFORE the bag join, never fully materialized
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("LeftSemi"),
        s"expected a LeftSemi bound-join in the service plan:\n$plan")
      // and the results are identical to the unbounded evaluation
      assert(rows(df) == Set(Seq("P1", "lyric"), Seq("P3", "prose")))
      // a service FIRST in its group has no outer bindings: no semi-join,
      // same results (the service result then joins the later pattern)
      val first = SparqlText.run(
        """SELECT ?s ?g WHERE {
          |  SERVICE <http://test/ep2> { ?s ex:genre ?g }
          |  ?s wdt:P570 ?d .
          |}""".stripMargin, triples, labels)
      assert(!first.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
      assert(rows(first) == Set(Seq("P1", "lyric"), Seq("P3", "prose")))
    } finally SparqlText.unregisterService("http://test/ep2")
  }

  test("trailing VALUES clause (§18.2.4): joins after grouping and HAVING") {
    // ungrouped: equivalent to an in-group VALUES element
    val plain = SparqlText.run(
      """SELECT ?s ?c WHERE { ?s wdt:P27 ?c } VALUES ?c { "wd:Q40" }""",
      triples, labels)
    assert(rows(plain) == Set(Seq("P1", "wd:Q40"), Seq("P2", "wd:Q40"),
      Seq("P8", "wd:Q40")))
    // grouped: VALUES constrains GROUPS, never their inputs — counts
    // stay the full per-citizenship counts
    val grouped = SparqlText.run(
      """SELECT ?c (COUNT(*) AS ?n) WHERE { ?s wdt:P27 ?c }
        |GROUP BY ?c
        |VALUES ?c { "wd:Q40" "wd:Q183" }""".stripMargin, triples, labels)
    assert(rows(grouped) == Set(Seq("wd:Q40", 3L), Seq("wd:Q183", 1L)))
    // table form with UNDEF over the grouped frame: the UNDEF row is a
    // wildcard, so Q40 matches BOTH rows (multiset: appears twice); the
    // VALUES variable ?tag binds after aggregation and projects legally
    val tagged = SparqlText.run(
      """SELECT ?c ?tag (COUNT(*) AS ?n) WHERE { ?s wdt:P27 ?c }
        |GROUP BY ?c
        |VALUES (?c ?tag) { ("wd:Q40" "big") (UNDEF "any") }""".stripMargin,
      triples, labels)
    assert(rows(tagged) == Set(
      Seq("wd:Q40", "big", 3L), Seq("wd:Q40", "any", 3L),
      Seq("wd:Q28513", "any", 2L), Seq("wd:Q131964", "any", 1L),
      Seq("wd:Q699964", "any", 1L), Seq("wd:Q183", "any", 1L)))
    // an unbound VALUES variable extends solutions (cross product)
    val ext = SparqlText.run(
      """SELECT ?s ?z WHERE { ?s wdt:P570 ?d } VALUES ?z { "a" "b" }""",
      triples, labels)
    assert(ext.count() == 6) // 3 deaths × 2 values
  }

  test("aggregate calls in ORDER BY of a grouped query (§18)") {
    // counts: Q40 3, Q28513 2, the rest 1 — DESC(COUNT(*)) with a ?c
    // tiebreak is total; the aggregate key also need not be projected
    val df = SparqlText.run(
      """SELECT ?c WHERE { ?s wdt:P27 ?c }
        |GROUP BY ?c
        |ORDER BY DESC(COUNT(*)) ?c
        |LIMIT 3""".stripMargin, triples, labels)
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("wd:Q40", "wd:Q28513", "wd:Q131964"))
    // an aggregate EXPRESSION as the key, alongside a projected one
    val expr = SparqlText.run(
      """SELECT ?c (COUNT(*) AS ?n) WHERE { ?s wdt:P27 ?c }
        |GROUP BY ?c
        |ORDER BY DESC(COUNT(*) * 10) ?c
        |LIMIT 2""".stripMargin, triples, labels)
    assert(expr.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("wd:Q40", 3L), ("wd:Q28513", 2L)))
    // ungrouped queries refuse with the real reason
    val e = intercept[RuntimeException](SparqlText.run(
      "SELECT ?s WHERE { ?s wdt:P27 ?c } ORDER BY DESC(COUNT(*))",
      triples, labels))
    assert(e.getMessage.contains("grouped query"))
  }

  test("several EXISTS lifts over one frame keep distinct marks " +
      "(no __exists name collision)") {
    // two EXISTS-bearing aggregate arguments: ?ndead varies per group,
    // ?nborn counts every member (all subjects have P569) — a mark
    // collision would make BOTH columns read the second EXISTS
    val two = SparqlText.run(
      """SELECT ?c (SUM(IF(EXISTS { ?s wdt:P570 ?d }, 1, 0)) AS ?ndead)
        |           (SUM(IF(EXISTS { ?s wdt:P569 ?b }, 1, 0)) AS ?nborn)
        |WHERE { ?s wdt:P27 ?c }
        |GROUP BY ?c""".stripMargin, triples, labels)
    assert(rows(two) == Set(
      Seq("wd:Q40", 1L, 3L), Seq("wd:Q28513", 1L, 2L),
      Seq("wd:Q131964", 0L, 1L), Seq("wd:Q699964", 1L, 1L),
      Seq("wd:Q183", 0L, 1L)))
    // two EXISTS projections: ?dead varies, ?cit is uniformly true
    val proj = SparqlText.run(
      """SELECT ?s (EXISTS { ?s wdt:P570 ?d } AS ?dead)
        |          (EXISTS { ?s wdt:P27 ?c } AS ?cit)
        |WHERE { ?s wdt:P569 ?b }""".stripMargin, triples, labels)
    val byS = proj.collect().map(r =>
      r.getString(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    assert(byS.values.forall(_._2), "?cit must be true for every subject")
    assert(byS.count(_._2._1) == 3 &&
      Set("P1", "P3", "P5").forall(byS(_)._1),
      s"?dead must vary: $byS")
  }

  test("trailing VALUES cannot make an ungrouped WHERE variable projectable") {
    val e = intercept[RuntimeException](SparqlText.run(
      """SELECT ?s (COUNT(*) AS ?n) WHERE { ?s wdt:P27 ?c }
        |GROUP BY ?c
        |VALUES ?s { <P1> }""".stripMargin, triples, labels))
    assert(e.getMessage.contains("GROUP BY"), e.getMessage)
  }

  test("EXISTS inside aggregate arguments lifts against the pre-agg frame") {
    // SUM(IF(EXISTS{…},1,0)) — the argument evaluates per PRE-group
    // solution, so the mark joins the (member, citizenship) frame on ?s
    // before the grouping: per-citizenship counts of dead members.
    // Deaths exist for P1 (Q40), P3 (Q28513), P5 (Q699964).
    val proj =
      """SELECT ?c (SUM(IF(EXISTS { ?s wdt:P570 ?d }, 1, 0)) AS ?ndead)
        |WHERE { ?s wdt:P27 ?c . }
        |GROUP BY ?c""".stripMargin
    assert(rows(SparqlText.run(proj, triples, labels)) ==
      Set(Seq("wd:Q40", 1L), Seq("wd:Q28513", 1L), Seq("wd:Q131964", 0L),
        Seq("wd:Q699964", 1L), Seq("wd:Q183", 0L)))
    // …and the same shape inside HAVING (a hidden aggregate): only
    // groups with at least one dead member survive.
    val having =
      """SELECT ?c (COUNT(*) AS ?n) WHERE { ?s wdt:P27 ?c . }
        |GROUP BY ?c
        |HAVING(SUM(IF(EXISTS { ?s wdt:P570 ?d }, 1, 0)) > 0)""".stripMargin
    assert(rows(SparqlText.run(having, triples, labels)) ==
      Set(Seq("wd:Q40", 3L), Seq("wd:Q28513", 2L), Seq("wd:Q699964", 1L)))
    // NOT EXISTS in the argument inverts the mark: living-member counts.
    val neg =
      """SELECT ?c (SUM(IF(NOT EXISTS { ?s wdt:P570 ?d }, 1, 0)) AS ?nalive)
        |WHERE { ?s wdt:P27 ?c . }
        |GROUP BY ?c""".stripMargin
    assert(rows(SparqlText.run(neg, triples, labels)) ==
      Set(Seq("wd:Q40", 2L), Seq("wd:Q28513", 1L), Seq("wd:Q131964", 1L),
        Seq("wd:Q699964", 0L), Seq("wd:Q183", 1L)))
  }

  test("EXISTS in HAVING / GROUP BY keys / ORDER BY keys (§17.4.1.4 complete)") {
    // HAVING: the solution at HAVING time is the grouped row, so the mark
    // join matches on the group key. Citizenship groups with >1 member
    // whose country node also appears as a subject? Use births: subjects
    // with a death row, grouped by citizenship.
    val having =
      """SELECT ?c (COUNT(*) AS ?n) WHERE { ?s wdt:P27 ?c . }
        |GROUP BY ?c
        |HAVING(COUNT(*) > 1 && EXISTS { ?s2 wdt:P27 ?c . ?s2 wdt:P570 ?d })""".stripMargin
    // groups: Q40 {P1,P2,P8} n=3, Q28513 {P3,P7} n=2, others n=1.
    // deaths exist for P1 (Q40) and P3 (Q28513) → both groups survive.
    assert(rows(SparqlText.run(having, triples, labels)) ==
      Set(Seq("wd:Q40", 3L), Seq("wd:Q28513", 2L)))
    // …and the EXISTS can eliminate a group that clears the count bar:
    // restrict the inner pattern to a citizenship with no dead members.
    val having2 = having.replace("?s2 wdt:P570 ?d", "?s2 wdt:P570 ?d . FILTER(?c = \"wd:Q40\")")
    assert(rows(SparqlText.run(having2, triples, labels)) ==
      Set(Seq("wd:Q40", 3L)))

    // GROUP BY (EXISTS{…} AS ?k): the key evaluates per PRE-group
    // solution — partition birth-dated subjects by whether they died.
    val gkey =
      """SELECT ?dead (COUNT(*) AS ?n) WHERE { ?s wdt:P569 ?b . }
        |GROUP BY (EXISTS { ?s wdt:P570 ?d } AS ?dead)""".stripMargin
    assert(rows(SparqlText.run(gkey, triples, labels)) ==
      Set(Seq(true, 3L), Seq(false, 5L)))

    // ORDER BY over an EXISTS key: dead-last (false < true ascending),
    // ties broken by subject — a total, deterministic order.
    val okey =
      """SELECT ?s WHERE { ?s wdt:P569 ?b . }
        |ORDER BY ASC(EXISTS { ?s wdt:P570 ?d }) ?s""".stripMargin
    assert(SparqlText.run(okey, triples, labels).collect().map(_.getString(0)).toSeq ==
      Seq("P2", "P4", "P6", "P7", "P8", "P1", "P3", "P5"))
  }

  test("TIMEZONE(): xsd:dayTimeDuration typed literal via the dt " +
      "companion; zone-less raises to unbound; TZ stays lexical") {
    val spark2 = spark
    import spark2.implicits._
    val t = Seq(
      ("P1", "when", "2024-03-01T10:00:00Z"),
      ("P2", "when", "2024-03-01T10:00:00+05:30"),
      ("P3", "when", "2024-03-01T10:00:00-08:00"),
      ("P4", "when", "2024-03-01T10:00:00+00:00"),
      ("P5", "when", "2024-03-01T10:00:00"),
      ("P6", "when", "2024-03-01T10:00:00+05:00")
    ).toDF("s", "p", "o")
    val labels = Seq.empty[(String, String, String)].toDF("entity", "lang", "label")
    val out = SparqlText.run(
      """SELECT ?s ?z ?dt ?lex WHERE {
        |  ?s <when> ?d .
        |  BIND(TIMEZONE(?d) AS ?z)
        |  BIND(DATATYPE(?z) AS ?dt)
        |  BIND(TZ(?d) AS ?lex)
        |}""".stripMargin, t, labels)
      .collect().map(r => r.getString(0) ->
        ((Option(r.getString(1)), Option(r.getString(2)), r.getString(3))))
      .toMap
    val dtd = "http://www.w3.org/2001/XMLSchema#dayTimeDuration"
    assert(out("P1") == ((Some("PT0S"), Some(dtd), "Z")))
    assert(out("P2") == ((Some("PT5H30M"), Some(dtd), "+05:30")))
    assert(out("P3") == ((Some("-PT8H"), Some(dtd), "-08:00")))
    assert(out("P4") == ((Some("PT0S"), Some(dtd), "+00:00")))
    assert(out("P6") == ((Some("PT5H"), Some(dtd), "+05:00")))
    // no zone: TIMEZONE raises (unbound), its DATATYPE propagates the
    // error as xsd:string of an unbound -> also unbound? DATATYPE of an
    // unbound var coalesces to xsd:string per the engine's value model;
    // the z VALUE itself must be null and TZ must give ""
    assert(out("P5")._1.isEmpty && out("P5")._3 == "")
    // expression position evaluates (the duration rung): zero-offset
    // zones pass the =, the zone-less row errors→unbound and drops
    val eq = SparqlText.run(
      "SELECT ?s WHERE { ?s <when> ?d FILTER(TIMEZONE(?d) = \"PT0S\") }",
      t, labels).collect().map(_.getString(0)).toSet
    assert(eq == Set("P1", "P4"))
  }

  test("duration comparisons order by VALUE through the seconds carrier, " +
      "not lexically (§17.4.5.7 result type in §17.3 ordering)") {
    val spark2 = spark
    import spark2.implicits._
    val t = Seq(
      ("P1", "when", "2024-03-01T10:00:00Z"),
      ("P2", "when", "2024-03-01T10:00:00+05:30"),
      ("P3", "when", "2024-03-01T10:00:00-08:00"),
      ("P5", "when", "2024-03-01T10:00:00"),
      ("P6", "when", "2024-03-01T10:00:00+05:00")
    ).toDF("s", "p", "o")
    val labels = Seq.empty[(String, String, String)]
      .toDF("entity", "lang", "label")
    // lexical ordering would call "PT5H30M" > "PT10H" and drop P2/P6;
    // value ordering keeps every zone below ten hours
    val out = SparqlText.run(
      """SELECT ?s ?cls WHERE {
        |  ?s <when> ?d .
        |  FILTER(TIMEZONE(?d) < "PT10H"^^xsd:dayTimeDuration)
        |  BIND(IF(TIMEZONE(?d) > "PT0S"^^xsd:dayTimeDuration,
        |          "east", "nonpositive") AS ?cls)
        |}""".stripMargin, t, labels)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("P1" -> "nonpositive", "P2" -> "east",
      "P3" -> "nonpositive", "P6" -> "east")) // P5: zone-less, dropped
    // negative durations sit below every positive one: -PT8H < PT5H
    val neg = SparqlText.run(
      """SELECT ?s WHERE { ?s <when> ?d .
        |  FILTER(TIMEZONE(?d) < "-PT7H59M"^^xsd:dayTimeDuration)
        |}""".stripMargin, t, labels)
      .collect().map(_.getString(0)).toSet
    assert(neg == Set("P3"))
    // the xsd:dayTimeDuration(...) constructor casts a lexical onto the
    // duration rung: same comparison through a data-bound string
    val cast = SparqlText.run(
      """SELECT ?s WHERE { ?s <when> ?d .
        |  FILTER(xsd:dayTimeDuration("PT6H") > TIMEZONE(?d)
        |         && TIMEZONE(?d) >= "PT0S"^^xsd:dayTimeDuration)
        |}""".stripMargin, t, labels)
      .collect().map(_.getString(0)).toSet
    assert(cast == Set("P1", "P2", "P6"))
    // ORDER BY on a duration key sorts by VALUE too: +10:00 (10 h) must
    // land AFTER +05:30 even though "PT10H" < "PT5H30M" lexically; the
    // zone-less row's unbound key sorts first (nulls-first asc)
    val t7 = t.union(Seq(("P7", "when", "2024-03-01T10:00:00+10:00"))
      .toDF("s", "p", "o"))
    val ord = SparqlText.run(
      """SELECT ?s WHERE { ?s <when> ?d . } ORDER BY ASC(TIMEZONE(?d))""",
      t7, labels).collect().map(_.getString(0)).toSeq
    // unbound first (nulls-first asc), then -8h < 0 < 5h < 5h30 < 10h
    assert(ord == Seq("P5", "P3", "P1", "P6", "P2", "P7"))
    // §18 OrderCondition: a BARE builtin call and a bare bracketted
    // expression are grammatical keys (ascending) — same order
    val bare = SparqlText.run(
      """SELECT ?s WHERE { ?s <when> ?d . } ORDER BY TIMEZONE(?d) LIMIT 3""",
      t7, labels).collect().map(_.getString(0)).toSeq
    assert(bare == Seq("P5", "P3", "P1"))
    val brk = SparqlText.run(
      """SELECT ?s WHERE { ?s <when> ?d . } ORDER BY (STRLEN(?d)) ?s""",
      t7, labels).collect().map(_.getString(0)).toSeq
    assert(brk.head == "P5" && brk(1) == "P1") // 19 chars, 20, then 25s
    // MIN/MAX over a duration expression extremize by VALUE and emit
    // the lexical: lexical MAX would answer "PT5H30M" (> "PT10H" as a
    // string); the zone-less row's unbound duration must not shadow
    val mm = SparqlText.run(
      """SELECT (MIN(TIMEZONE(?d)) AS ?lo) (MAX(TIMEZONE(?d)) AS ?hi)
        |WHERE { ?s <when> ?d . }""".stripMargin,
      t7, labels).collect()(0)
    assert(mm.getString(0) == "-PT8H" && mm.getString(1) == "PT10H")
  }

  test("TIMEZONE(unbound) stays unbound (regression: the NULL argument " +
      "used to skip every when() and mint a bare \"PT\")") {
    val spark2 = spark
    import spark2.implicits._
    val t = Seq(
      ("P1", "a", "x"), ("P2", "a", "x"),
      ("P1", "when", "2024-03-01T10:00:00+02:00")
    ).toDF("s", "p", "o")
    val labels = Seq.empty[(String, String, String)].toDF("entity", "lang", "label")
    val out = SparqlText.run(
      """SELECT ?s ?z WHERE {
        |  ?s <a> ?x .
        |  OPTIONAL { ?s <when> ?d }
        |  BIND(TIMEZONE(?d) AS ?z)
        |}""".stripMargin, t, labels)
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("P1") == Some("PT2H"))
    assert(out("P2").isEmpty) // unbound ?d -> unbound ?z, never "PT"
  }

  test("grouped CONSTRUCT: GROUP BY + aggregate binding + HAVING + " +
      "aggregate ORDER BY + LIMIT template from the grouped frame") {
    // citizenship groups: Q40 n=3, Q28513 n=2, Q131964/Q699964/Q183 n=1
    val g = SparqlText.run(
      """CONSTRUCT { ?c <nMembers> ?n . ?c <type> <Citizenship> }
        |WHERE { ?s wdt:P27 ?c }
        |GROUP BY ?c (COUNT(?s) AS ?n)
        |HAVING (COUNT(?s) >= 2)
        |ORDER BY DESC(COUNT(?s)) ?c
        |LIMIT 1""".stripMargin, triples, labels)
    // LIMIT cuts the grouped SOLUTION SEQUENCE (top group by count),
    // then both template arms instantiate; the count emits lexically
    assert(rows(g) == Set(
      Seq("wd:Q40", "nMembers", "3"),
      Seq("wd:Q40", "type", "Citizenship")))
    // HAVING alone (no aggregate binding) — keys-only templates
    val h = SparqlText.run(
      """CONSTRUCT { ?c <type> <Multi> } WHERE { ?s wdt:P27 ?c }
        |GROUP BY ?c HAVING (COUNT(?s) >= 2)""".stripMargin, triples, labels)
    assert(rows(h) == Set(Seq("wd:Q40", "type", "Multi"),
      Seq("wd:Q28513", "type", "Multi")))
    // expression group keys work on CONSTRUCT like on SELECT
    val ek = SparqlText.run(
      """CONSTRUCT { ?cent <born> ?n } WHERE { ?s wdt:P569 ?b }
        |GROUP BY (SUBSTR(?b, 1, 2) AS ?cent) (COUNT(?s) AS ?n)
        |HAVING (COUNT(?s) >= 2)""".stripMargin, triples, labels)
    // decades: 19xx births P1,P3,P4,P5,P8 (n=5); 13xx/18xx/12xx n=1 each
    assert(rows(ek) == Set(Seq("19", "born", "5")))
    // template var that is neither key nor aggregate binding → loud
    val e1 = intercept[RuntimeException](SparqlText.run(
      """CONSTRUCT { ?s <in> ?c } WHERE { ?s wdt:P27 ?c }
        |GROUP BY ?c HAVING (COUNT(*) > 0)""".stripMargin, triples, labels))
    assert(e1.getMessage.contains("ungrouped variable"))
    // aggregate group condition must be a SINGLE aggregate call
    val e2 = intercept[RuntimeException](SparqlText.run(
      """CONSTRUCT { ?c <n> ?n } WHERE { ?s wdt:P27 ?c }
        |GROUP BY ?c (COUNT(?s) + 1 AS ?n)""".stripMargin, triples, labels))
    assert(e2.getMessage.contains("single aggregate call"))
  }
}
