package graft.generators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.model.Triple

/** Typed render generators + worklist expansion (SURVEY.md §2.7, §3.2).
  *
  * The reference renders persons, collects referenced-but-unrendered
  * places/institutions in global worklists (get_data_apis_vanilla.py:
  * 1043-1046, 155-161), then runs exactly one expansion round over them
  * (:1249-1275). The engine replaces the mutable shared graph + worklists
  * with pure dataflow: flatMap generators emit triples, referenced ids are
  * anti-joined (J8) against rendered subjects, and the second round renders
  * the frontier — a 2-level semi-naive expansion with a fixed-point shape
  * identical to [[graft.plans.Closure]] but depth-bounded by the reference's
  * own behavior.
  */
object Worklist {

  final case class PersonRow(c_custkey: Long, c_name: String, c_nationkey: Int)
  final case class PlaceRow(n_nationkey: Int, n_name: String, n_regionkey: Int)

  /** G2-shaped typed person render: type/label/nation-reference triples. */
  def renderPerson(p: PersonRow): Seq[Triple] = {
    val s = s"C${p.c_custkey}"
    Seq(
      Triple(s, "type", "E21_Person"),
      Triple(s, "label", p.c_name, oType = "literal"),
      Triple(s, "nation", s"N${p.c_nationkey}"))
  }

  /** G10-shaped typed place render. */
  def renderPlace(n: PlaceRow): Seq[Triple] = {
    val s = s"N${n.n_nationkey}"
    Seq(
      Triple(s, "type", "E53_Place"),
      Triple(s, "label", n.n_name, oType = "literal"),
      Triple(s, "region", s"R${n.n_regionkey}"))
  }

  /** Round 1 (persons) → referenced-place worklist → round 2 (places),
    * union, set-dedup (D4). Returns (s, p, o) rows. */
  def expand(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val persons = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .as[PersonRow]
    val round1: Dataset[Triple] = persons.flatMap(renderPerson _)

    // Worklist: referenced nation ids not yet rendered as subjects (J8).
    val referenced = round1.filter(col("p") === "nation").select(col("o").as("ref"))
    val rendered = round1.select(col("s").as("ref"))
    val worklist = referenced.distinct().join(rendered.distinct(), Seq("ref"), "left_anti")

    val places = Tables.nation(spark, dir)
      .join(worklist, concat(lit("N"), col("n_nationkey").cast("string")) === col("ref"), "left_semi")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .as[PlaceRow]
    val round2: Dataset[Triple] = places.flatMap(renderPlace _)

    round1.unionByName(round2).toDF()
      .select(col("s"), col("p"), col("o"))
      .dropDuplicates("s", "p", "o")
  }
}
