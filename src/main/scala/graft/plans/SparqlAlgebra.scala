package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable algebra for the SPARQL subset the reference delegates to remote
  * endpoints (SURVEY.md §2.3, §4.2): basic graph patterns, OPTIONAL,
  * VALUES, and the Wikidata label service.
  *
  * Everything composes plain DataFrame operators so Catalyst keeps full
  * visibility: predicate-filtered triple scans collapse to single UNION arms
  * of the triple view, small sides broadcast, and join reordering stays
  * available.
  */
object SparqlAlgebra {

  /** One triple pattern: filter the triple table on a constant predicate and
    * project (s, o) under variable names. The p-filter prunes the scan.
    * Mirrors `?s <p> ?o` (e.g. sparql/wikidata-city.sparql:7). */
  def pattern(triples: DataFrame, p: String, sVar: String, oVar: String): DataFrame =
    triples.filter(col("p") === p).select(col("s").as(sVar), col("o").as(oVar))

  /** `?s <p> <const>` membership pattern → (sVar). */
  def patternConstO(triples: DataFrame, p: String, o: String, sVar: String): DataFrame =
    triples.filter(col("p") === p && col("o") === o).select(col("s").as(sVar))

  /** Basic graph pattern: equi-join patterns on their shared variables (J1). */
  def bgp(patterns: Seq[DataFrame]): DataFrame =
    patterns.reduce { (a, b) =>
      val shared = a.columns.intersect(b.columns).toSeq
      require(shared.nonEmpty, "BGP patterns must share at least one variable")
      a.join(b, shared)
    }

  /** OPTIONAL — left-outer join on shared variables; an inner FILTER must be
    * applied to `right` BEFORE calling (J2/J3 ordering,
    * sparql/wikidata-person.sparql:18-21). */
  def optional(left: DataFrame, right: DataFrame): DataFrame = {
    val shared = left.columns.intersect(right.columns).toSeq
    left.join(right, shared, "left_outer")
  }

  /** Wikidata label service (J7, sparql/wikidata-person.sparql:22):
    * for each entity pick the label of the first language in `priority` that
    * has one, falling back to the entity id itself.
    *
    * @param entities DataFrame with column `entityCol`
    * @param labels   DataFrame (entity, lang, label)
    */
  def labelService(entities: DataFrame, labels: DataFrame,
                   entityCol: String, outCol: String,
                   priority: Seq[String]): DataFrame = {
    val rank = array_position(lit(priority.toArray), col("lang"))
    val ranked = labels
      .withColumn("lang_rank", rank)
      .filter(col("lang_rank") > 0)
    val w = Window.partitionBy(col("entity")).orderBy(col("lang_rank"), col("label"))
    // Internal columns use a reserved prefix: `entities` carries caller
    // (query-variable) column names, so joining on a plain "entity" column
    // would collide with — and drop() would destroy — a caller column of
    // the same name.
    val picked = ranked
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("entity").as("__svc_entity"), col("label").as("__svc_label"))
    entities
      .join(picked, entities(entityCol) === picked("__svc_entity"), "left_outer")
      .drop("__svc_entity")
      .withColumn(outCol, coalesce(col("__svc_label"), col(entityCol)))
      .drop("__svc_label")
  }

  /** VALUES inline table (J6) as a membership predicate. */
  def valuesIn(c: Column, vs: Seq[String]): Column = c.isin(vs: _*)
}
