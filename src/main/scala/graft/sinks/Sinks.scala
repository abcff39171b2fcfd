package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document sinks (SURVEY.md §2.10).
  *
  * K1 (push_to_typesense.py:39-53) is a bulk **upsert** — last write wins per
  * `id`. The engine's parity sink materializes JSONL documents after a
  * last-wins dedup; a production deployment would swap the file write for a
  * foreachPartition HTTP bulk import against the search backend with the
  * same upstream dedup.
  *
  * K2 (geonames_place_index.py:45-53) is a plain JSON file side-output.
  */
object Sinks {

  /** Last-write-wins dedup on `id` ordered by a version column — the upsert
    * semantics of K1 collapsed into the dataflow (idempotent re-runs).
    * `versionCol` should be unique per id (a timestamp or monotonic
    * sequence); equal versions resolve arbitrarily-but-deterministically
    * only if the rows are identical. */
  def upsertDedup(df: DataFrame, idCol: String, versionCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col(versionCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** K1: JSONL document sink with upsert dedup. */
  def writeJsonlDocs(df: DataFrame, idCol: String, versionCol: String,
                     path: String): Unit =
    upsertDedup(df, idCol, versionCol).write.mode("overwrite").json(path)

  /** K2: single-file JSON side-output (test-scale only — the coalesce(1)
    * single-writer path is deliberately quarantined here and not used by any
    * scale-path operator). */
  def writeJsonSideOutput(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").json(path)
}
