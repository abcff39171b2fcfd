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
