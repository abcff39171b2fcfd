package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.plans.TripleStore

/** Relation-render generators with the reference's special-case branching
  * (G3/G4), the structural count-query derivation (P11), the blank-node
  * correlated pattern (J10), and max-objects truncation (D7).
  */
object RenderOps {

  /** One (s, p, o) triple as a struct — the unit of the fused render
    * generators below. */
  private def triple(s: Column, p: String, o: Column): Column =
    struct(s.as("s"), lit(p).as("p"), o.as("o"))

  /** Conditional triple: null when the gate fails (array_compact drops it). */
  private def gated(cond: Column, s: Column, p: String, o: Column): Column =
    when(cond, triple(s, p, o))

  /** Fused render: emit each row's conditional triples in ONE generator
    * pass. A k-way union of per-arm selections re-reads the source k times
    * and recomputes shared aggregates per arm (Spark does not dedup common
    * subtrees across union arms) — explode(array_compact(...)) keeps every
    * render at one scan + one Generate regardless of arm count. */
  private def emit(base: DataFrame, triples: Column*): DataFrame =
    base.select(explode(array_compact(array(triples: _*))).as("q"))
      .select(col("q.s"), col("q.p"), col("q.o"))

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
    emit(base,
      gated(col("rel") === 0, col("person"), "was_born_at", col("place")),
      gated(col("rel") === 1, col("person"), "died_at", col("place")),
      gated(col("rel") >= 2, col("event"), "type", lit("E5_Event")),
      gated(col("rel") >= 2, col("event"), "participant", col("person")),
      gated(col("rel") >= 2, col("event"), "took_place_at", col("place")))
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

  /** G5: person-role render with the parent-present/absent branches
    * (get_data_apis_vanilla.py:274-319): every role gets a label triple;
    * roles with a parent push the parent id onto the vocab worklist
    * (deduplicated, mirroring the `not in g` guard on glob_list_vocabs);
    * roles without a parent are typed bioc:Actor_Role instead. Role
    * universe = distinct role ids observed in the relation stream; parent
    * presence derived deterministically (rid >= 20 → parent rid%5). */
  def q84RoleHierarchy(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val roles = o.select(pmod(col("o_orderkey"), lit(40)).cast("int").as("rid")).distinct()
    val role = concat(lit("personrole."), col("rid").cast("string"))
    val pushes = roles.filter(col("rid") >= 20)
      .select(lit("worklist.personrole").as("s"), lit("push").as("p"),
        concat(lit("personrole."), pmod(col("rid"), lit(5)).cast("string")).as("o"))
      .distinct()
    emit(roles,
      triple(role, "label", concat(lit("role_"), col("rid").cast("string"))),
      gated(col("rid") < 20, role, "type", lit("Actor_Role")))
      .unionByName(pushes)
  }

  /** G7: organization render gated on `len(date_written) >= 4`
    * (get_data_apis_vanilla.py:699-779): six unconditional proxy/appellation
    * triples per org; a beginning-of-existence node only when the written
    * start date is non-null AND >= 4 chars (custkey%4==1 rows carry a 3-char
    * date that fails the gate, %4==0 rows a null); the P4 time-span link
    * additionally requires the parsed date (absent on custkey%6==0). End of
    * existence mirrors with its own gate (custkey%5). */
  def q85OrgRender(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val span = o.groupBy(col("o_custkey")).agg(
      date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_d"),
      date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_d"))
    val id = c("c_custkey").cast("string")
    val base = c.join(span, c("c_custkey") === span("o_custkey"), "left_outer")
      .select(id.as("id"), c("c_name").as("name"),
        when(pmod(c("c_custkey"), lit(4)) === 0, lit(null: String))
          .when(pmod(c("c_custkey"), lit(4)) === 1, substring(col("first_d"), 1, 3))
          .otherwise(col("first_d")).as("start_written"),
        when(pmod(c("c_custkey"), lit(5)) === 0, lit(null: String))
          .when(pmod(c("c_custkey"), lit(5)) === 1, substring(col("last_d"), 1, 2))
          .otherwise(col("last_d")).as("end_written"),
        (pmod(c("c_custkey"), lit(6)) =!= 0).as("has_parsed"))
    val org = concat(lit("groupproxy."), col("id"))
    val app = concat(lit("groupappellation."), col("id"))
    val gStart = col("start_written").isNotNull && length(col("start_written")) >= 4
    val gEnd = col("end_written").isNotNull && length(col("end_written")) >= 4
    // Pre-fusion this was a 12-way union: 18 scans + the span aggregate
    // recomputed 6× (.explain evidence); fused it is 2 scans, 1 shuffle,
    // 1 Generate.
    val gs = concat(lit("groupstart."), col("id"))
    val ge = concat(lit("groupend."), col("id"))
    emit(base,
      triple(org, "type", lit("E74_Group")),
      triple(org, "type", lit("Group")),
      triple(org, "sameAs", concat(lit("http://base/entity/"), col("id"))),
      triple(org, "P1_is_identified_by", app),
      triple(app, "label", col("name")),
      triple(app, "type", lit("E33_E41_Linguistic_Appellation")),
      gated(gStart, gs, "type", lit("E63_Beginning_of_Existence")),
      gated(gStart, gs, "P92_brought_into_existence", org),
      gated(gStart && col("has_parsed"), gs, "P4_has_time-span",
        concat(lit("groupstart.timespan."), col("id"))),
      gated(gEnd, ge, "type", lit("E64_End_of_Existence")),
      gated(gEnd, ge, "P93_took_out_of_existence", org),
      gated(gEnd && col("has_parsed"), ge, "P4_has_time-span",
        concat(lit("groupend.timespan."), col("id"))))
  }

  /** G8: organization-place relation (get_data_apis_vanilla.py:677-696):
    * every relation emits the P74 residence triple; places not already in
    * the graph are pushed onto the place worklist exactly once (the `not in
    * g and not in glob_list_entities` guard → distinct). "Already rendered"
    * stand-in: place ids < 10. */
  def q88OrgplaceRelation(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val rel = o.select(
      concat(lit("groupproxy."), col("o_custkey").cast("string")).as("org"),
      pmod(col("o_orderkey"), lit(25)).cast("int").as("pid"))
    val residence = rel.select(col("org").as("s"),
      lit("P74_has_current_or_former_residence").as("p"),
      concat(lit("place."), col("pid").cast("string")).as("o"))
    val pushes = rel.filter(col("pid") >= 10)
      .select(lit("worklist.place").as("s"), lit("push").as("p"),
        concat(lit("place."), col("pid").cast("string")).as("o"))
      .distinct()
    residence.unionByName(pushes)
  }

  /** G9: event render (get_data_apis_vanilla.py:782-831): per event an
    * event-role node inhering in the person proxy, typed by a role type that
    * is itself subClassOf bioc:Event_Role (role-type triples deduplicated —
    * rdflib Graph.add is idempotent), the E5 typing, a composite
    * person+relation+place label, and a P4 time-span link only when the
    * start date is present (absent on orderkey%3==0). */
  def q89EventRender(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val base = o.select(col("o_orderkey").cast("string").as("id"),
      concat(lit("personproxy.C"), col("o_custkey").cast("string")).as("person"),
      concat(lit("C"), col("o_custkey").cast("string")).as("personLabel"),
      concat(lit("N"), pmod(col("o_orderkey"), lit(25)).cast("string")).as("placeLabel"),
      concat(lit("role."), pmod(col("o_orderkey"), lit(7)).cast("string")).as("roletype"),
      concat(lit("rel_"), pmod(col("o_orderkey"), lit(7)).cast("string")).as("relLabel"),
      (pmod(col("o_orderkey"), lit(3)) =!= 0).as("has_start"))
    val eventRole = concat(lit("personplace.eventrole."), col("id"))
    val event = concat(lit("event."), col("id"))
    val roleTypes = base.select(col("roletype"), col("relLabel")).distinct()
    // Per-event arms as ONE generator pass over orders (see `emit`); only
    // the deduplicated role-type arms union in — their distinct is a
    // genuine (tiny) aggregate of its own.
    val perEvent = emit(base,
      triple(eventRole, "inheres_in", col("person")),
      triple(eventRole, "type", col("roletype")),
      triple(event, "had_participant_in_role", eventRole),
      triple(event, "type", lit("E5_Event")),
      triple(eventRole, "label", col("relLabel")),
      triple(event, "label", concat(col("personLabel"), lit(" "),
        col("relLabel"), lit(" "), col("placeLabel"))),
      gated(col("has_start"), event, "P4_has_time-span",
        concat(lit("personplace.timespan."), col("id"))))
    perEvent
      .unionByName(roleTypes.select(col("roletype").as("s"),
        lit("subClassOf").as("p"), lit("Event_Role").as("o")))
      .unionByName(roleTypes.select(col("roletype").as("s"),
        lit("label").as("p"), col("relLabel").as("o")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_relation_render" -> q47RelationRender _,
    "q48_family_relation" -> q48FamilyRelation _,
    "q49_count_derivation" -> q49CountDerivation _,
    "q50_blank_node"      -> q50BlankNode _,
    "q51_max_objects"     -> q51MaxObjects _,
    "q84_role_hierarchy"  -> q84RoleHierarchy _,
    "q85_org_render"      -> q85OrgRender _,
    "q88_orgplace_relation" -> q88OrgplaceRelation _,
    "q89_event_render"    -> q89EventRender _
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
         ORDER BY o_orderkey LIMIT 100""",
    "q84_role_hierarchy" ->
      """WITH roles AS (SELECT DISTINCT o_orderkey % 40 AS rid FROM orders)
         SELECT 'personrole.'||CAST(rid AS VARCHAR) AS s, 'label' AS p,
                'role_'||CAST(rid AS VARCHAR) AS o FROM roles
         UNION ALL
         SELECT DISTINCT 'worklist.personrole', 'push',
                'personrole.'||CAST(rid % 5 AS VARCHAR) FROM roles WHERE rid >= 20
         UNION ALL
         SELECT 'personrole.'||CAST(rid AS VARCHAR), 'type', 'Actor_Role'
         FROM roles WHERE rid < 20""",
    "q85_org_render" ->
      """WITH span AS (
           SELECT o_custkey, strftime(min(o_orderdate), '%Y-%m-%d') AS first_d,
                  strftime(max(o_orderdate), '%Y-%m-%d') AS last_d
           FROM orders GROUP BY 1),
         base AS (
           SELECT CAST(c_custkey AS VARCHAR) AS id, c_name AS name,
                  CASE WHEN c_custkey % 4 = 0 THEN NULL
                       WHEN c_custkey % 4 = 1 THEN substr(first_d, 1, 3)
                       ELSE first_d END AS start_written,
                  CASE WHEN c_custkey % 5 = 0 THEN NULL
                       WHEN c_custkey % 5 = 1 THEN substr(last_d, 1, 2)
                       ELSE last_d END AS end_written,
                  c_custkey % 6 <> 0 AS has_parsed
           FROM customer LEFT JOIN span ON c_custkey = o_custkey),
         g AS (
           SELECT *,
                  start_written IS NOT NULL AND length(start_written) >= 4 AS g_start,
                  end_written IS NOT NULL AND length(end_written) >= 4 AS g_end,
                  'groupproxy.'||id AS org, 'groupappellation.'||id AS app
           FROM base)
         SELECT org AS s, 'type' AS p, 'E74_Group' AS o FROM g
         UNION ALL SELECT org, 'type', 'Group' FROM g
         UNION ALL SELECT org, 'sameAs', 'http://base/entity/'||id FROM g
         UNION ALL SELECT org, 'P1_is_identified_by', app FROM g
         UNION ALL SELECT app, 'label', name FROM g
         UNION ALL SELECT app, 'type', 'E33_E41_Linguistic_Appellation' FROM g
         UNION ALL SELECT 'groupstart.'||id, 'type', 'E63_Beginning_of_Existence' FROM g WHERE g_start
         UNION ALL SELECT 'groupstart.'||id, 'P92_brought_into_existence', org FROM g WHERE g_start
         UNION ALL SELECT 'groupstart.'||id, 'P4_has_time-span', 'groupstart.timespan.'||id FROM g WHERE g_start AND has_parsed
         UNION ALL SELECT 'groupend.'||id, 'type', 'E64_End_of_Existence' FROM g WHERE g_end
         UNION ALL SELECT 'groupend.'||id, 'P93_took_out_of_existence', org FROM g WHERE g_end
         UNION ALL SELECT 'groupend.'||id, 'P4_has_time-span', 'groupend.timespan.'||id FROM g WHERE g_end AND has_parsed""",
    "q88_orgplace_relation" ->
      """WITH rel AS (SELECT 'groupproxy.'||CAST(o_custkey AS VARCHAR) AS org,
                             o_orderkey % 25 AS pid FROM orders)
         SELECT org AS s, 'P74_has_current_or_former_residence' AS p,
                'place.'||CAST(pid AS VARCHAR) AS o FROM rel
         UNION ALL
         SELECT DISTINCT 'worklist.place', 'push', 'place.'||CAST(pid AS VARCHAR)
         FROM rel WHERE pid >= 10""",
    "q89_event_render" ->
      """WITH base AS (
           SELECT CAST(o_orderkey AS VARCHAR) AS id,
                  'personproxy.C'||CAST(o_custkey AS VARCHAR) AS person,
                  'C'||CAST(o_custkey AS VARCHAR) AS person_label,
                  'N'||CAST(o_orderkey % 25 AS VARCHAR) AS place_label,
                  'role.'||CAST(o_orderkey % 7 AS VARCHAR) AS roletype,
                  'rel_'||CAST(o_orderkey % 7 AS VARCHAR) AS rel_label,
                  o_orderkey % 3 <> 0 AS has_start
           FROM orders),
         rt AS (SELECT DISTINCT roletype, rel_label FROM base)
         SELECT 'personplace.eventrole.'||id AS s, 'inheres_in' AS p, person AS o FROM base
         UNION ALL SELECT 'personplace.eventrole.'||id, 'type', roletype FROM base
         UNION ALL SELECT roletype, 'subClassOf', 'Event_Role' FROM rt
         UNION ALL SELECT roletype, 'label', rel_label FROM rt
         UNION ALL SELECT 'event.'||id, 'had_participant_in_role', 'personplace.eventrole.'||id FROM base
         UNION ALL SELECT 'event.'||id, 'type', 'E5_Event' FROM base
         UNION ALL SELECT 'personplace.eventrole.'||id, 'label', rel_label FROM base
         UNION ALL SELECT 'event.'||id, 'label', person_label||' '||rel_label||' '||place_label FROM base
         UNION ALL SELECT 'event.'||id, 'P4_has_time-span', 'personplace.timespan.'||id FROM base WHERE has_start"""
  )
}
