package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Registry

/** Projection / rename / scalar-map surface (SURVEY.md §2.2, P1–P9) driven
  * through [[graft.functions.Registry]] — the bindings→document reshaping
  * half of the reference's index pipelines (wikidata_index.py:183-207,
  * geonames_place_index.py:29-54).
  */
object Projections {

  /** P1: bindings→document projection — rename via field mapping, per-field
    * post-processing, tail-of-URI id normalization, synthesized label
    * (wikidata_index.py:183-207). */
  def q23DocProjection(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val raw = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(
        concat(lit("http://raw.example/item/C"), c("c_custkey").cast("string")).as("item"),
        c("c_name").as("itemLabel"),
        n("n_name").as("countryLabel"),
        c("c_mktsegment").as("segment"))
    raw.select(
      Registry.normalizeId(col("item"), "http://ex.org/entity/").as("id"),
      col("itemLabel").as("name"),
      col("countryLabel").as("country"),
      Registry.labelPlace(col("itemLabel"), col("countryLabel"), col("segment")).as("label"))
  }

  /** P3+P4: date post-processing — URI-valued dates null out; concatenated
    * multi-dates split/process/re-join with " / "
    * (wikidata_index.py:15-22). */
  def q24DatePostprocessing(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val iso = date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss")
    val raw = when(pmod(col("o_orderkey"), lit(5)) === 0,
        concat(lit("http://example.org/time/"), col("o_orderkey").cast("string")))
      .otherwise(iso)
    o.select(
      col("o_orderkey"),
      Registry.datePostprocessing(raw).as("date_clean"),
      Registry.concatenatedDatesPostprocessing(concat_ws(" ", iso, raw)).as("dates_joined"))
  }

  /** P6: feature-code priority pick over a group_concat'd code string, with
    * first-code fallback (wikidata_index.py:79-126). */
  def q25FeatureCodePick(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).filter(col("p_size") <= 2)
    val codes = p.groupBy(col("p_brand"))
      .agg(concat_ws(" ", sort_array(collect_set(col("p_type")))).as("codes"))
    codes.select(col("p_brand"), col("codes"),
      Registry.featureCodePick(col("codes"), Seq("PROMO", "STANDARD")).as("picked"))
  }

  /** P7: person-label synthesis with null-guarded date range
    * (wikidata_index.py:25-39) — birth/death stand-ins are the first/last
    * order dates; death only when the customer has >5 orders. */
  def q26PersonLabels(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val span = o.groupBy(col("o_custkey")).agg(
      date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_d"),
      date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_d"),
      count(lit(1)).as("cnt"))
    c.join(span, c("c_custkey") === span("o_custkey"), "left_outer")
      .select(c("c_custkey"),
        Registry.labelPerson(
          c("c_name"),
          col("first_d"),
          when(col("cnt") > 5, col("last_d")),
          c("c_mktsegment")).as("label"))
  }

  /** P5: WKT geopoint parse — "Point (lng lat)" → lat/lng doubles
    * (wikidata_index.py:72-76); inverse formatting is q22. */
  def q27Geopoint(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(s, dir)
    val wkt = concat(lit("Point ("), (col("s_nationkey") - 12).cast("string"),
      lit(" "), (col("s_suppkey") % 90).cast("string"), lit(")"))
    sup.select(col("s_suppkey"), wkt.as("wkt"),
      Registry.geopointLat(wkt).as("lat"),
      Registry.geopointLng(wkt).as("lng"))
  }

  /** P9: organization-label synthesis (wikidata_index.py:53-69) — the
    * len>4 date gate and paren-balance fixup, driven through every branch:
    * custkey%3==0 rows get a 4-char (gated-out) inception, cnt∈(3,5] rows a
    * 4-char dissolvement, custkey%7==0 rows a null description. */
  def q83OrgLabels(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val span = o.groupBy(col("o_custkey")).agg(
      date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_d"),
      date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_d"),
      count(lit(1)).as("cnt"))
    val inception = when(pmod(c("c_custkey"), lit(3)) === 0,
      substring(col("first_d"), 1, 4)).otherwise(col("first_d"))
    val dissolved = when(col("cnt") > 5, col("last_d"))
      .when(col("cnt") > 3, substring(col("last_d"), 1, 4))
    val desc = when(pmod(c("c_custkey"), lit(7)) === 0, lit(null: String))
      .otherwise(c("c_mktsegment"))
    c.join(span, c("c_custkey") === span("o_custkey"), "left_outer")
      .select(c("c_custkey"),
        Registry.labelOrganization(c("c_name"), inception, dissolved, desc).as("label"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_doc_projection"  -> q23DocProjection _,
    "q24_date_postproc"   -> q24DatePostprocessing _,
    "q25_feature_code"    -> q25FeatureCodePick _,
    "q26_person_labels"   -> q26PersonLabels _,
    "q27_geopoint"        -> q27Geopoint _,
    "q83_org_labels"      -> q83OrgLabels _
  )

  val oracles: Map[String, String] = Map(
    "q23_doc_projection" ->
      """SELECT 'http://ex.org/entity/'||regexp_extract('http://raw.example/item/C'||CAST(c_custkey AS VARCHAR), '([^/]+)$', 1) AS id,
         c_name AS name, n_name AS country,
         c_name||' ('||n_name||')'||' - '||c_mktsegment AS label
         FROM customer JOIN nation ON c_nationkey = n_nationkey""",
    "q24_date_postproc" ->
      """WITH o AS (
           SELECT o_orderkey,
                  strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS iso,
                  CASE WHEN o_orderkey % 5 = 0
                       THEN 'http://example.org/time/'||CAST(o_orderkey AS VARCHAR)
                       ELSE strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') END AS raw
           FROM orders)
         SELECT o_orderkey,
           CASE WHEN starts_with(raw, 'http') THEN NULL ELSE split_part(raw, 'T', 1) END AS date_clean,
           array_to_string(list_transform(string_split(iso||' '||raw, ' '),
             d -> CASE WHEN starts_with(d, 'http') THEN NULL ELSE split_part(d, 'T', 1) END), ' / ') AS dates_joined
         FROM o""",
    "q25_feature_code" ->
      """WITH codes AS (
           SELECT p_brand, string_agg(p_type, ' ' ORDER BY p_type) AS codes
           FROM (SELECT DISTINCT p_brand, p_type FROM part WHERE p_size <= 2)
           GROUP BY 1)
         SELECT p_brand, codes,
           CASE WHEN list_contains(string_split(codes, ' '), 'PROMO') THEN 'PROMO'
                WHEN list_contains(string_split(codes, ' '), 'STANDARD') THEN 'STANDARD'
                ELSE string_split(codes, ' ')[1] END AS picked
         FROM codes""",
    "q26_person_labels" ->
      """WITH span AS (
           SELECT o_custkey, strftime(min(o_orderdate), '%Y-%m-%d') AS first_d,
                  strftime(max(o_orderdate), '%Y-%m-%d') AS last_d, count(*) AS cnt
           FROM orders GROUP BY 1)
         SELECT c_custkey,
           c_name ||
           CASE WHEN first_d IS NOT NULL AND (cnt > 5) THEN
                  ' ('||split_part(first_d,'-',1)||' - '||split_part(last_d,'-',1)||')'
                WHEN first_d IS NOT NULL THEN ' ('||split_part(first_d,'-',1)||' - )'
                ELSE '' END ||
           ': '||c_mktsegment AS label
         FROM customer LEFT JOIN span ON c_custkey = o_custkey""",
    "q27_geopoint" ->
      """WITH w AS (
           SELECT s_suppkey,
                  'Point ('||CAST(s_nationkey - 12 AS VARCHAR)||' '||CAST(s_suppkey % 90 AS VARCHAR)||')' AS wkt
           FROM supplier)
         SELECT s_suppkey, wkt,
           TRY_CAST(regexp_extract(wkt, '^Point \(([-+0-9.]+) ([-+0-9.]+)\)', 2) AS DOUBLE) AS lat,
           TRY_CAST(regexp_extract(wkt, '^Point \(([-+0-9.]+) ([-+0-9.]+)\)', 1) AS DOUBLE) AS lng
         FROM w""",
    "q83_org_labels" ->
      """WITH span AS (
           SELECT o_custkey, strftime(min(o_orderdate), '%Y-%m-%d') AS first_d,
                  strftime(max(o_orderdate), '%Y-%m-%d') AS last_d, count(*) AS cnt
           FROM orders GROUP BY 1),
         base AS (
           SELECT c_custkey, c_name AS name,
                  CASE WHEN c_custkey % 3 = 0 THEN substr(first_d, 1, 4) ELSE first_d END AS inception,
                  CASE WHEN cnt > 5 THEN last_d WHEN cnt > 3 THEN substr(last_d, 1, 4) END AS dissolved,
                  CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS descr
           FROM customer LEFT JOIN span ON c_custkey = o_custkey),
         s1 AS (
           SELECT *, CASE WHEN inception IS NOT NULL AND length(inception) > 4
                          THEN name||' ('||inception ELSE name END AS lab1
           FROM base),
         s2 AS (
           SELECT *, CASE WHEN dissolved IS NOT NULL AND length(dissolved) > 4
                          THEN lab1||(CASE WHEN contains(lab1, '(') THEN ' - ' ELSE '( - ' END)||dissolved||')'
                          ELSE lab1 END AS lab2
           FROM s1),
         s3 AS (
           SELECT *, CASE WHEN contains(lab2, '(') AND NOT contains(lab2, ')')
                          THEN lab2||'-)' ELSE lab2 END AS lab3
           FROM s2)
         SELECT c_custkey,
                CASE WHEN descr IS NOT NULL THEN lab3||': '||descr ELSE lab3 END AS label
         FROM s3"""
  )
}
