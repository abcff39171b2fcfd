package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.plans.TripleStore

/** Relation-render generators with the reference's special-case branching
  * (G3/G4), the structural count-query derivation (P11), the blank-node
  * correlated pattern (J10), and max-objects truncation (D7).
  */
object RenderOps {

  /** G3: person-place relation render — relation-type ids 595/596 map to
    * birth/death events, everything else to a generic event with
    * P7_took_place_at (get_data_apis_vanilla.py:115-162). Branch selector
    * derived deterministically from the order key (0/1 play 595/596). */
  def q47RelationRender(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val person = concat(lit("C"), col("o_custkey").cast("string"))
    val place = concat(lit("N"), pmod(col("o_orderkey"), lit(25)).cast("string"))
    val event = concat(lit("E"), col("o_orderkey").cast("string"))
    val rel = pmod(col("o_orderkey"), lit(7))
    val base = o.select(person.as("person"), place.as("place"),
      event.as("event"), rel.as("rel"))
    val birth = base.filter(col("rel") === 0).select(
      col("person").as("s"), lit("was_born_at").as("p"), col("place").as("o"))
    val death = base.filter(col("rel") === 1).select(
      col("person").as("s"), lit("died_at").as("p"), col("place").as("o"))
    val generic = base.filter(col("rel") >= 2)
    birth
      .unionByName(death)
      .unionByName(generic.select(col("event").as("s"), lit("type").as("p"),
        lit("E5_Event").as("o")))
      .unionByName(generic.select(col("event").as("s"), lit("participant").as("p"),
        col("person").as("o")))
      .unionByName(generic.select(col("event").as("s"), lit("took_place_at").as("p"),
        col("place").as("o")))
  }

  /** G4: person-person relation render — predicate family chosen by
    * membership of the relation-type id in a fixed family list; relation
    * types above a threshold also emit a subClassOf link to their parent
    * (present/absent parent branches, get_data_apis_vanilla.py:165-271). */
  def q48FamilyRelation(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val a = concat(lit("C"), col("o_custkey").cast("string"))
    val b = concat(lit("C"), pmod(col("o_orderkey"), lit(1500)).cast("string"))
    val rel = pmod(col("o_orderkey"), lit(11))
    val isFamily = rel.isin(1, 3, 5, 7)
    val pred = when(isFamily, concat(lit("family_rel_"), rel.cast("string")))
      .otherwise(concat(lit("pers_rel_"), rel.cast("string")))
    val base = o.select(a.as("a"), b.as("b"), rel.as("rel"), pred.as("pred"))
    val links = base.select(col("a").as("s"), col("pred").as("p"), col("b").as("o"))
    val subclass = base.filter(col("rel") > 5)
      .select(col("pred").as("s"), lit("subClassOf").as("p"),
        concat(lit("rel_parent_"), pmod(col("rel"), lit(3)).cast("string")).as("o"))
      .distinct()
    links.unionByName(subclass)
  }

  /** P11: count-query derivation — the engine derives the pagination count
    * structurally from the inner plan (countDistinct over the BGP core)
    * instead of the reference's regex rewrite (wikidata_index.py:173-179). */
  def q49CountDerivation(s: SparkSession, dir: String): DataFrame = {
    val t = TripleStore.triples(s, dir)
    val core = graft.plans.SparqlAlgebra.bgp(Seq(
      graft.plans.SparqlAlgebra.patternConstO(t, "type", "Person", "c"),
      graft.plans.SparqlAlgebra.pattern(t, "nation", "c", "n"),
      graft.plans.SparqlAlgebra.pattern(t, "region", "n", "r"),
      graft.plans.SparqlAlgebra.patternConstO(t, "label", "EUROPE", "r")))
    core.agg(countDistinct(col("c")).as("cnt"))
  }

  /** J10: blank-node correlated pattern — project the distinct existential
    * targets, OPTIONAL proxy binding stays null when absent
    * (create_provided_entities_graph_v2.sparql:16-20). */
  def q50BlankNode(s: SparkSession, dir: String): DataFrame = {
    val t = TripleStore.triples(s, dir)
    val targets = t.filter(col("p") === "segment").select(col("o").as("sa_uri")).distinct()
    val proxies = targets.filter(col("sa_uri").startsWith("B"))
      .select(col("sa_uri").as("pt"),
        concat(lit("urn:proxy:"), md5(col("sa_uri"))).as("proxy"))
    targets.join(proxies, col("sa_uri") === col("pt"), "left_outer")
      .select(col("sa_uri"), col("proxy"))
  }

  /** D7: max_objects truncation — deterministic ORDER BY + LIMIT
    * (get_data_from_apis_instance.py:44-46). */
  def q51MaxObjects(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
      .limit(100)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_relation_render" -> q47RelationRender _,
    "q48_family_relation" -> q48FamilyRelation _,
    "q49_count_derivation" -> q49CountDerivation _,
    "q50_blank_node"      -> q50BlankNode _,
    "q51_max_objects"     -> q51MaxObjects _
  )

  private val T = TripleStore.triplesSql

  val oracles: Map[String, String] = Map(
    "q47_relation_render" ->
      """WITH b AS (SELECT 'C'||CAST(o_custkey AS VARCHAR) AS person,
                    'N'||CAST(o_orderkey % 25 AS VARCHAR) AS place,
                    'E'||CAST(o_orderkey AS VARCHAR) AS event,
                    o_orderkey % 7 AS rel FROM orders)
         SELECT person AS s, 'was_born_at' AS p, place AS o FROM b WHERE rel = 0
         UNION ALL SELECT person, 'died_at', place FROM b WHERE rel = 1
         UNION ALL SELECT event, 'type', 'E5_Event' FROM b WHERE rel >= 2
         UNION ALL SELECT event, 'participant', person FROM b WHERE rel >= 2
         UNION ALL SELECT event, 'took_place_at', place FROM b WHERE rel >= 2""",
    "q48_family_relation" ->
      """WITH b AS (SELECT 'C'||CAST(o_custkey AS VARCHAR) AS a,
                    'C'||CAST(o_orderkey % 1500 AS VARCHAR) AS bb,
                    o_orderkey % 11 AS rel,
                    CASE WHEN o_orderkey % 11 IN (1,3,5,7)
                         THEN 'family_rel_'||CAST(o_orderkey % 11 AS VARCHAR)
                         ELSE 'pers_rel_'||CAST(o_orderkey % 11 AS VARCHAR) END AS pred
                    FROM orders)
         SELECT a AS s, pred AS p, bb AS o FROM b
         UNION ALL
         SELECT DISTINCT pred, 'subClassOf',
                'rel_parent_'||CAST(rel % 3 AS VARCHAR) FROM b WHERE rel > 5""",
    "q49_count_derivation" ->
      s"""WITH triples AS ($T)
         SELECT count(DISTINCT ty.s) AS cnt
         FROM triples ty
         JOIN triples na ON na.p='nation' AND na.s=ty.s
         JOIN triples re ON re.p='region' AND re.s=na.o
         JOIN triples rl ON rl.p='label' AND rl.s=re.o AND rl.o='EUROPE'
         WHERE ty.p='type' AND ty.o='Person'""",
    "q50_blank_node" ->
      """WITH targets AS (SELECT DISTINCT c_mktsegment AS sa_uri FROM customer)
         SELECT sa_uri,
           CASE WHEN sa_uri LIKE 'B%' THEN 'urn:proxy:'||md5(sa_uri) END AS proxy
         FROM targets""",
    "q51_max_objects" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
         ORDER BY o_orderkey LIMIT 100"""
  )
}
