package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** S4: GeoNames TSV scan (geonames_place_index.py:13-25) — the reference
  * streams a zipped TSV through csv.DictReader with 19 injected column
  * names (geonames_place_index.py:85-106). Engine: schema'd csv reader;
  * the zip container is extracted ahead of the scan (driver-side fetch) or
  * via binaryFiles+ZipInputStream when the dump must stay zipped.
  *
  * Scale: the csv scan parallelizes by file split; lat/lng cast to double at
  * scan time (geonames_place_index.py:40) so downstream prune/push works on
  * typed columns.
  */
object GeonamesTsv {

  /** The 19 columns injected at geonames_place_index.py:85-106. */
  val columns: Seq[String] = Seq(
    "id", "name", "asciiname", "alternatenames", "latitude", "longitude",
    "feature_class", "feature_code", "country_code", "cc2", "admin1_code",
    "admin2_code", "admin3_code", "admin4_code", "population", "elevation",
    "dem", "timezone", "modification_date")

  val schema: StructType = StructType(columns.map {
    case c @ ("latitude" | "longitude") => StructField(c, DoubleType, nullable = true)
    case c @ ("population" | "elevation" | "dem") => StructField(c, LongType, nullable = true)
    case c => StructField(c, StringType, nullable = true)
  })

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("sep", "\t")
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** S4 zip-container ingest (geonames_place_index.py:13-25): the reference
    * opens the downloaded cities1000.zip and reads its FIRST entry through
    * csv.DictReader (`thezip.namelist()[0]`). Engine equivalent: binaryFile
    * scan (one task per zip — a zip is not splittable, so the file is the
    * parallel unit; many zips → many tasks) → ZipInputStream decode of the
    * first non-directory entry → the same schema'd TSV parse as [[read]].
    * The whole-entry buffering matches binaryFile's own whole-file content
    * column; the GeoNames dump is tens of MB, far under task memory. */
  def readZipped(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.format("binaryFile").load(path)
      .select(org.apache.spark.sql.functions.col("content")).as[Array[Byte]]
      .flatMap { bytes =>
        val zis = new java.util.zip.ZipInputStream(
          new java.io.ByteArrayInputStream(bytes))
        var entry = zis.getNextEntry
        while (entry != null && entry.isDirectory) entry = zis.getNextEntry
        if (entry == null) Iterator.empty
        else {
          val reader = new java.io.BufferedReader(
            new java.io.InputStreamReader(zis, java.nio.charset.StandardCharsets.UTF_8))
          Iterator.continually(reader.readLine()).takeWhile(_ != null)
        }
      }
    spark.read
      .schema(schema)
      .option("sep", "\t")
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .csv(lines)
  }

  /** P2: GeoNames row → search document (geonames_place_index.py:29-54):
    * url-template id, "name (cc) - fcode" label, float coordinates. */
  def toDocuments(geonames: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    geonames.select(
      format_string("https://sws.geonames.org/%s/", col("id")).as("id"),
      format_string("%s (%s) - %s", col("name"), col("country_code"),
        col("feature_code")).as("label"),
      col("asciiname").as("name"),
      col("country_code").as("country"),
      col("feature_code"),
      array(col("latitude"), col("longitude")).as("coordinates"))
  }
}
