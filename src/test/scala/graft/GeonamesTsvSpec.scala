package graft

import java.nio.file.{Files, Paths}

import graft.sources.GeonamesTsv

/** S4 + P2: GeoNames TSV scan with the 19 injected columns and the
  * place-document projection (geonames_place_index.py:29-54, 85-106). */
class GeonamesTsvSpec extends SparkSpec {

  private def fixture(): String = {
    val dir = Paths.get("target/tmp/geonames")
    Files.createDirectories(dir)
    val row = Seq(
      "2761369", "Vienna", "Vienna", "Wien,Vienne", "48.20849", "16.37208",
      "P", "PPLC", "AT", "", "09", "901", "", "", "1691468", "", "193",
      "Europe/Vienna", "2022-10-04").mkString("\t")
    val row2 = Seq(
      "2643743", "London", "London", "", "51.50853", "-0.12574",
      "P", "PPLC", "GB", "", "ENG", "", "", "", "8961989", "", "25",
      "Europe/London", "2022-08-21").mkString("\t")
    val f = dir.resolve("cities.tsv")
    Files.writeString(f, row + "\n" + row2 + "\n")
    f.toString
  }

  test("19-column schema parses; lat/lng typed double; population long") {
    val df = GeonamesTsv.read(spark, fixture())
    assert(df.columns.toSeq == GeonamesTsv.columns)
    val vienna = df.filter(df("id") === "2761369").collect()(0)
    assert(vienna.getAs[Double]("latitude") == 48.20849)
    assert(vienna.getAs[Long]("population") == 1691468L)
  }

  test("S4 zip ingest: binaryFile + ZipInputStream first entry matches the flat scan") {
    val flat = fixture()
    val dir = Paths.get("target/tmp/geonames-zip")
    Files.createDirectories(dir)
    val zipPath = dir.resolve("cities1000.zip")
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(zipPath))
    // a directory entry first — the reader must skip to the first real file
    zos.putNextEntry(new java.util.zip.ZipEntry("data/"))
    zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("data/cities1000.txt"))
    zos.write(Files.readAllBytes(Paths.get(flat)))
    zos.closeEntry()
    // a second entry the reference (namelist()[0]) would ignore too
    zos.putNextEntry(new java.util.zip.ZipEntry("readme.txt"))
    zos.write("not tsv".getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()

    val viaZip = GeonamesTsv.toDocuments(GeonamesTsv.readZipped(spark, zipPath.toString))
    val viaFlat = GeonamesTsv.toDocuments(GeonamesTsv.read(spark, flat))
    assert(viaZip.collect().toSet == viaFlat.collect().toSet)
    assert(viaZip.count() == 2)
  }

  test("P2 document projection: url id, composed label, coordinates array") {
    val docs = GeonamesTsv.toDocuments(GeonamesTsv.read(spark, fixture()))
      .orderBy("name").collect()
    val london = docs(0)
    assert(london.getAs[String]("id") == "https://sws.geonames.org/2643743/")
    assert(london.getAs[String]("label") == "London (GB) - PPLC")
    assert(london.getAs[scala.collection.Seq[Double]]("coordinates").toSeq == Seq(51.50853, -0.12574))
  }
}
