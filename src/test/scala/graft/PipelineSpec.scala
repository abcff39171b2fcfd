package graft

import graft.pipelines.{GeonamesPipeline, RdfSerialization}
import graft.sources.RdfIO

/** End-to-end pipeline flows observed at their file outputs. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("§3.2 RDF serialization: rounds → R1 → dedup → N-Quads files") {
    val out = new java.io.File("target/tmp/apis-nquads").getAbsolutePath
    val quads = RdfSerialization.run(spark, "/root/testdata/sf0.001", out)
    // Read back the actual files and compare set-for-set.
    val back = RdfIO.readQuads(spark, out).collect().toSet
    assert(back == quads.collect().toSet)
    // R1 held: every (s, nation, o) has its inverse (o, has_member, s).
    val nation = back.filter(_.p == "nation").map(q => (q.s, q.o))
    val members = back.filter(_.p == "has_member").map(q => (q.o, q.s))
    assert(nation == members && nation.nonEmpty)
    // All quads carry the named graph.
    assert(back.forall(_.g == "urn:graph:apis"))
  }

  test("§3.3 TTL harvest: pages → named graph → N-Quads files") {
    // First chunk is real Turtle (prefixes + ';' continuation), second is a
    // bare N-Triples line — both arrive through the same turtle parse.
    val store = Seq(
      """@prefix p: <http://p/> .
        |@prefix c: <http://c/> .
        |<http://e/1> p:type c:Person ;
        |    p:label "Eins"@de .""".stripMargin,
      """<http://e/2> <http://p/type> <http://c/Place> .""")
    def fetch(offset: Long): Option[String] =
      if (offset / 10 < store.length) Some(store((offset / 10).toInt)) else None
    val out = new java.io.File("target/tmp/harvest-nquads").getAbsolutePath
    val quads = graft.pipelines.TtlHarvest.run(spark, fetch, 10, "urn:g:harvest", out)
    assert(quads.count() == 3)
    val back = RdfIO.readQuads(spark, out).collect()
    assert(back.forall(_.g == "urn:g:harvest"))
    assert(back.exists(q => q.o == "Eins" && q.oLang == "de"))
  }

  test("§7.2 slice 1: GeoNames TSV → documents → JSON side-output") {
    val dir = new java.io.File("target/tmp/geonames").getAbsolutePath
    // fixture written by GeonamesTsvSpec's layout; rebuild it here to be
    // order-independent across suites.
    val row = Seq(
      "2761369", "Vienna", "Vienna", "Wien,Vienne", "48.20849", "16.37208",
      "P", "PPLC", "AT", "", "09", "901", "", "", "1691468", "", "193",
      "Europe/Vienna", "2022-10-04").mkString("\t")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/one.tsv"), row + "\n")
    val out = new java.io.File("target/tmp/geonames-docs").getAbsolutePath
    GeonamesPipeline.run(spark, s"$dir/one.tsv", out)
    val docs = spark.read.json(out)
    val vienna = docs.collect()(0)
    assert(vienna.getAs[String]("id") == "https://sws.geonames.org/2761369/")
    assert(vienna.getAs[String]("label") == "Vienna (AT) - PPLC")
  }
}
