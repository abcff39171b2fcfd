package graft.pipelines

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.Quad
import graft.sources.{PagedSource, RdfIO}

/** §3.3 end-to-end: the TTL-harvest flow (get_apis_data_and_push_to_repo.py
  * :16-58) — paginated text pages (S5) → chunk parse into a named graph
  * (S10) → N-Quads serialization (K3). Git/MR publishing stays with the
  * external scheduler (K4, out of engine scope).
  */
object TtlHarvest {

  def run(spark: SparkSession, fetchPage: Long => Option[String],
          pageSize: Long, namedGraph: String, outPath: String): Dataset[Quad] = {
    val pages = PagedSource.drainPages(spark, fetchPage, pageSize)
    // Parse distributed — one full-Turtle parse task per page chunk, no
    // driver round-trip (the reference's rdflib `format="turtle"` parse,
    // get_data_from_apis_instance.py:88-93). N-Triples chunks are a Turtle
    // subset and land here too; N-Quads (inline graph term) do NOT — those
    // go through RdfIO.parseChunks. A malformed chunk aborts the run,
    // exactly as rdflib's parse raises in the reference flow.
    val quads = RdfIO.parseTurtleChunks(pages, namedGraph)
    RdfIO.writeQuads(quads, outPath)
    quads
  }
}
