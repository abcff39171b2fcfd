package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic triple/edge/label views derived from the driver's parquet
  * tables. These stand in for the reference's triple stores (Wikidata's
  * endpoint, the pyoxigraph store at enrich_via_sparql.py:24-46) so the
  * SPARQL-subset algebra can be exercised and oracle-checked on TESTDATA.
  *
  * Every view has a matching DuckDB SQL fragment (the `*Sql` constants) used
  * verbatim inside oracle queries — both sides derive the same rows from the
  * same parquet.
  *
  * Scale posture: at 100 TB a real triple table would be partitioned/bucketed
  * by predicate `p` (SURVEY.md §7.3); these views are narrow projections of
  * the base tables, so predicate filters (`p === "nation"`) prune to a single
  * UNION arm and push the underlying column scan down to parquet.
  */
object TripleStore {

  private def str(c: org.apache.spark.sql.Column) = c.cast("string")

  /** (s, p, o) string triples over customer/nation/region/supplier. */
  def triples(sp: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(sp, dir)
    val n = Tables.nation(sp, dir)
    val r = Tables.region(sp, dir)
    val s = Tables.supplier(sp, dir)
    val cs = concat(lit("C"), str(c("c_custkey")))
    val ns = concat(lit("N"), str(n("n_nationkey")))
    val rs = concat(lit("R"), str(r("r_regionkey")))
    val ss = concat(lit("S"), str(s("s_suppkey")))
    c.select(cs.as("s"), lit("type").as("p"), lit("Person").as("o"))
      .unionByName(c.select(cs.as("s"), lit("label").as("p"), c("c_name").as("o")))
      .unionByName(c.select(cs.as("s"), lit("nation").as("p"),
        concat(lit("N"), str(c("c_nationkey"))).as("o")))
      .unionByName(c.select(cs.as("s"), lit("segment").as("p"), c("c_mktsegment").as("o")))
      .unionByName(n.select(ns.as("s"), lit("type").as("p"), lit("Place").as("o")))
      .unionByName(n.select(ns.as("s"), lit("label").as("p"), n("n_name").as("o")))
      .unionByName(n.select(ns.as("s"), lit("region").as("p"),
        concat(lit("R"), str(n("n_regionkey"))).as("o")))
      .unionByName(r.select(rs.as("s"), lit("type").as("p"), lit("Region").as("o")))
      .unionByName(r.select(rs.as("s"), lit("label").as("p"), r("r_name").as("o")))
      .unionByName(s.select(ss.as("s"), lit("type").as("p"), lit("Supplier").as("o")))
      .unionByName(s.select(ss.as("s"), lit("nation").as("p"),
        concat(lit("N"), str(s("s_nationkey"))).as("o")))
  }

  val triplesSql: String =
    """SELECT 'C'||CAST(c_custkey AS VARCHAR) AS s, 'type' AS p, 'Person' AS o FROM customer
      |UNION ALL SELECT 'C'||CAST(c_custkey AS VARCHAR), 'label', c_name FROM customer
      |UNION ALL SELECT 'C'||CAST(c_custkey AS VARCHAR), 'nation', 'N'||CAST(c_nationkey AS VARCHAR) FROM customer
      |UNION ALL SELECT 'C'||CAST(c_custkey AS VARCHAR), 'segment', c_mktsegment FROM customer
      |UNION ALL SELECT 'N'||CAST(n_nationkey AS VARCHAR), 'type', 'Place' FROM nation
      |UNION ALL SELECT 'N'||CAST(n_nationkey AS VARCHAR), 'label', n_name FROM nation
      |UNION ALL SELECT 'N'||CAST(n_nationkey AS VARCHAR), 'region', 'R'||CAST(n_regionkey AS VARCHAR) FROM nation
      |UNION ALL SELECT 'R'||CAST(r_regionkey AS VARCHAR), 'type', 'Region' FROM region
      |UNION ALL SELECT 'R'||CAST(r_regionkey AS VARCHAR), 'label', r_name FROM region
      |UNION ALL SELECT 'S'||CAST(s_suppkey AS VARCHAR), 'type', 'Supplier' FROM supplier
      |UNION ALL SELECT 'S'||CAST(s_suppkey AS VARCHAR), 'nation', 'N'||CAST(s_nationkey AS VARCHAR) FROM supplier""".stripMargin

  /** (s, p, o, g) quads: [[triples]] partitioned into named graphs by
    * entity kind (customers in `g:C`, nations `g:N`, regions `g:R`,
    * suppliers `g:S`) — the TriG/N-Quads model GRAPH clauses query.
    * At scale the quad table would additionally be partitioned by `g`, so
    * a constant-graph filter prunes partitions before the scan. */
  def quads(sp: SparkSession, dir: String): DataFrame =
    triples(sp, dir).withColumn("g",
      concat(lit("g:"), substring(col("s"), 1, 1)))

  val quadsSql: String =
    s"SELECT s, p, o, 'g:'||substr(s, 1, 1) AS g FROM ($triplesSql)"

  /** Language-tagged labels (entity, lang, label): every nation/region has an
    * 'en' label; only even-keyed ones have a 'de' label (lowercased) — so the
    * label-service fallback path (J7) is exercised. */
  def langLabels(sp: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(sp, dir)
    val r = Tables.region(sp, dir)
    val ns = concat(lit("N"), str(n("n_nationkey")))
    val rs = concat(lit("R"), str(r("r_regionkey")))
    n.select(ns.as("entity"), lit("en").as("lang"), n("n_name").as("label"))
      .unionByName(n.filter(n("n_nationkey") % 2 === 0)
        .select(ns.as("entity"), lit("de").as("lang"), lower(n("n_name")).as("label")))
      .unionByName(r.select(rs.as("entity"), lit("en").as("lang"), r("r_name").as("label")))
      .unionByName(r.filter(r("r_regionkey") % 2 === 0)
        .select(rs.as("entity"), lit("de").as("lang"), lower(r("r_name")).as("label")))
  }

  val langLabelsSql: String =
    """SELECT 'N'||CAST(n_nationkey AS VARCHAR) AS entity, 'en' AS lang, n_name AS label FROM nation
      |UNION ALL SELECT 'N'||CAST(n_nationkey AS VARCHAR), 'de', lower(n_name) FROM nation WHERE n_nationkey % 2 = 0
      |UNION ALL SELECT 'R'||CAST(r_regionkey AS VARCHAR), 'en', r_name FROM region
      |UNION ALL SELECT 'R'||CAST(r_regionkey AS VARCHAR), 'de', lower(r_name) FROM region WHERE r_regionkey % 2 = 0""".stripMargin

  /** Term-fidelity triples (s, p, o, oLang, oDatatype): [[langLabels]] as
    * lang-tagged `label` literals plus an xsd:integer-typed `key` triple
    * per nation — the Quad-model fidelity fields (model/Rdf.scala) the
    * LANG()/DATATYPE() expression surface reads. The reference's data is
    * lang-tagged throughout (get_data_apis_vanilla.py:206,532). */
  def fidelityTriples(sp: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(sp, dir)
    val ns = concat(lit("N"), str(n("n_nationkey")))
    langLabels(sp, dir).select(col("entity").as("s"), lit("label").as("p"),
        col("label").as("o"), col("lang").as("oLang"),
        lit(null).cast("string").as("oDatatype"),
        lit("literal").as("oType"))
      .unionByName(n.select(ns.as("s"), lit("key").as("p"),
        str(n("n_nationkey")).as("o"), lit(null).cast("string").as("oLang"),
        lit("http://www.w3.org/2001/XMLSchema#integer").as("oDatatype"),
        lit("literal").as("oType")))
      // an IRI-valued arm so ISIRI/ISLITERAL discriminate on real data
      .unionByName(n.select(ns.as("s"), lit("region").as("p"),
        concat(lit("R"), str(n("n_regionkey"))).as("o"),
        lit(null).cast("string").as("oLang"),
        lit(null).cast("string").as("oDatatype"),
        lit("iri").as("oType")))
  }

  val fidelityTriplesSql: String =
    s"""SELECT entity AS s, 'label' AS p, label AS o, lang AS oLang,
      |       CAST(NULL AS VARCHAR) AS oDatatype, 'literal' AS oType
      |FROM ($langLabelsSql)
      |UNION ALL
      |SELECT 'N'||CAST(n_nationkey AS VARCHAR), 'key',
      |       CAST(n_nationkey AS VARCHAR), NULL,
      |       'http://www.w3.org/2001/XMLSchema#integer', 'literal' FROM nation
      |UNION ALL
      |SELECT 'N'||CAST(n_nationkey AS VARCHAR), 'region',
      |       'R'||CAST(n_regionkey AS VARCHAR), NULL, NULL, 'iri'
      |FROM nation""".stripMargin

  /** Containment edges child→parent across the whole star schema:
    * lineitem→order→customer→nation→region. */
  def edges(sp: SparkSession, dir: String, withLineitems: Boolean = true): DataFrame = {
    val o = Tables.orders(sp, dir)
    val c = Tables.customer(sp, dir)
    val n = Tables.nation(sp, dir)
    val base = o.select(concat(lit("O"), str(o("o_orderkey"))).as("src"),
        concat(lit("C"), str(o("o_custkey"))).as("dst"))
      .unionByName(c.select(concat(lit("C"), str(c("c_custkey"))).as("src"),
        concat(lit("N"), str(c("c_nationkey"))).as("dst")))
      .unionByName(n.select(concat(lit("N"), str(n("n_nationkey"))).as("src"),
        concat(lit("R"), str(n("n_regionkey"))).as("dst")))
    if (!withLineitems) base
    else {
      val l = Tables.lineitem(sp, dir)
      l.select(concat(lit("L"), str(l("l_orderkey")), lit("-"), str(l("l_linenumber"))).as("src"),
          concat(lit("O"), str(l("l_orderkey"))).as("dst"))
        .unionByName(base)
    }
  }

  val edgesNoLineitemSql: String =
    """SELECT 'O'||CAST(o_orderkey AS VARCHAR) AS src, 'C'||CAST(o_custkey AS VARCHAR) AS dst FROM orders
      |UNION ALL SELECT 'C'||CAST(c_custkey AS VARCHAR), 'N'||CAST(c_nationkey AS VARCHAR) FROM customer
      |UNION ALL SELECT 'N'||CAST(n_nationkey AS VARCHAR), 'R'||CAST(n_regionkey AS VARCHAR) FROM nation""".stripMargin

  val edgesSql: String =
    s"""SELECT 'L'||CAST(l_orderkey AS VARCHAR)||'-'||CAST(l_linenumber AS VARCHAR) AS src,
      |       'O'||CAST(l_orderkey AS VARCHAR) AS dst FROM lineitem
      |UNION ALL ${edgesNoLineitemSql.replace("AS src", "").replace("AS dst", "")}""".stripMargin

  /** A SECOND triple store standing in for a federated endpoint (general
    * `SERVICE <iri>` blocks): per-region facts — a derived numeric code
    * and a two-valued zone — that exist NOWHERE in [[triples]], so a
    * query joining through it provably consulted the other store. */
  def serviceTriples(sp: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(sp, dir)
    val rs = concat(lit("R"), str(r("r_regionkey")))
    r.select(rs.as("s"), lit("code").as("p"),
        str(r("r_regionkey") * 7 + 1).as("o"))
      .unionByName(r.select(rs.as("s"), lit("zone").as("p"),
        concat(lit("Z"), str(r("r_regionkey") % 2)).as("o")))
  }

  val serviceTriplesSql: String =
    """SELECT 'R'||CAST(r_regionkey AS VARCHAR) AS s, 'code' AS p,
      |       CAST(r_regionkey * 7 + 1 AS VARCHAR) AS o FROM region
      |UNION ALL SELECT 'R'||CAST(r_regionkey AS VARCHAR), 'zone',
      |       'Z'||CAST(r_regionkey % 2 AS VARCHAR) FROM region""".stripMargin
}
