package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar post-processing function registry (SURVEY.md §2.2, §2.11).
  *
  * The reference's extension point is named Python functions dispatched by
  * string via `globals()[name](value)` (wikidata_index.py:194-205,
  * `data_postprocessing_functions` / `label_creator_function` params). The
  * engine's equivalent is this registry of pure `Column => Column`
  * transforms — every one compiles to built-in Catalyst expressions, so they
  * stay inside whole-stage codegen (no UDF boundary, SURVEY.md §4.2).
  */
object Registry {

  /** P3 `date_postprocessing` (wikidata_index.py:15-18): URI-valued dates →
    * null; otherwise truncate the ISO datetime at 'T'. */
  val datePostprocessing: Column => Column = c =>
    when(c.startsWith("http"), lit(null: String))
      .otherwise(substring_index(c, "T", 1))

  /** P4 `cocatenated_dates_postprocessing` (wikidata_index.py:21-22): split
    * on whitespace, P3 each part, join with " / ". Nulls (URI parts) are
    * dropped by array_join — pinned engine semantics; the reference would
    * crash on that path. */
  val concatenatedDatesPostprocessing: Column => Column = c =>
    array_join(transform(split(c, "\\s+"), datePostprocessing), " / ")

  /** P5 `geopoint_creator` (wikidata_index.py:72-76): parse WKT
    * "Point (lng lat)" → (lat, lng) doubles, null when not a point. */
  def geopointLat(c: Column): Column =
    when(c.rlike("^Point \\("),
      regexp_extract(c, "^Point \\(([-+0-9.]+) ([-+0-9.]+)\\)", 2).cast("double"))
  def geopointLng(c: Column): Column =
    when(c.rlike("^Point \\("),
      regexp_extract(c, "^Point \\(([-+0-9.]+) ([-+0-9.]+)\\)", 1).cast("double"))

  /** P6 `feature_code_postprocessing` (wikidata_index.py:79-126): split a
    * group_concat'd multi-value string, keep codes present in the priority
    * list, return the earliest-ranked; fall back to the first code; else
    * null. Pure higher-order-function pipeline — no UDF. */
  def featureCodePick(c: Column, priority: Seq[String]): Column = {
    val p = lit(priority.toArray)
    val codes = split(c, "\\s+")
    val ranks = filter(transform(codes, code => array_position(p, code)), r => r > 0)
    val minRank = array_min(ranks)
    when(minRank.isNotNull, element_at(p, minRank.cast("int")))
      .otherwise(element_at(codes, 1))
  }

  /** P7 `label_creator_person` (wikidata_index.py:25-39):
    * "name (birthYear - deathYear): description" with None-guards; a year is
    * the first '-'-separated part of the ISO date. */
  def labelPerson(name: Column, birth: Column, death: Column, desc: Column): Column = {
    val by = substring_index(birth, "-", 1)
    val dy = substring_index(death, "-", 1)
    val dates = when(birth.isNotNull && death.isNotNull, concat(lit(" ("), by, lit(" - "), dy, lit(")")))
      .when(birth.isNotNull, concat(lit(" ("), by, lit(" - )")))
      .when(death.isNotNull, concat(lit(" ( - "), dy, lit(")")))
      .otherwise(lit(""))
    val d = when(desc.isNotNull, concat(lit(": "), desc)).otherwise(lit(""))
    concat(name, dates, d)
  }

  /** P8 `label_creator_place` (wikidata_index.py:42-50):
    * "name (country) - feature_code" with None-guards. */
  def labelPlace(name: Column, country: Column, featureCode: Column): Column =
    concat(name,
      when(country.isNotNull, concat(lit(" ("), country, lit(")"))).otherwise(lit("")),
      when(featureCode.isNotNull, concat(lit(" - "), featureCode)).otherwise(lit("")))

  /** P9 `label_creator_organization` (wikidata_index.py:53-69 /
    * get_data_apis_vanilla.py:271-287): the reference builds the label by
    * sequential append — `" (" + inception` when len > 4, then
    * `" - "` (if a "(" is already in the label, else `"( - "`) +
    * dissolvement + ")", then a `"-)"` fixup when a "(" was left unclosed.
    * Replicated step-for-step, including the contains-checks on the
    * accumulated label (not just the date flags), so a name containing
    * parens behaves identically. */
  def labelOrganization(name: Column, inception: Column, dissolved: Column, desc: Column): Column = {
    val iOk = inception.isNotNull && length(inception) > 4
    val dOk = dissolved.isNotNull && length(dissolved) > 4
    val l1 = when(iOk, concat(name, lit(" ("), inception)).otherwise(name)
    val sep = when(l1.contains("("), lit(" - ")).otherwise(lit("( - "))
    val l2 = when(dOk, concat(l1, sep, dissolved, lit(")"))).otherwise(l1)
    val l3 = when(l2.contains("(") && !l2.contains(")"), concat(l2, lit("-)"))).otherwise(l2)
    when(desc.isNotNull, concat(l3, lit(": "), desc)).otherwise(l3)
  }

  /** Tail-of-URI id normalization (wikidata_index.py:199-201):
    * `http://…/entity/{Q}` from the last URI segment. */
  def normalizeId(uri: Column, prefix: String): Column =
    concat(lit(prefix), substring_index(uri, "/", -1))

  /** Name-dispatch parity with the reference's `globals()[name]` lookup. */
  val byName: Map[String, Column => Column] = Map(
    "date_postprocessing" -> datePostprocessing,
    "cocatenated_dates_postprocessing" -> concatenatedDatesPostprocessing
  )
}
