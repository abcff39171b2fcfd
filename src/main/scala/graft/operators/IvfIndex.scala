package graft.operators

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** On-disk persistence for the trained ANN index — coarse-quantizer
  * centroids plus raw/residual PQ codebooks — completing the
  * index-artifact contract the JVM-lifetime caches in [[VectorOps]]
  * stand in for: TRAIN ONCE (a scheduled index build), LOAD MANY (every
  * search/dedup/bitext job on the corpus opens the artifact instead of
  * re-running Lloyd). The artifact is ordinary parquet beside the corpus
  * (or wherever `graft.index.dir` points when the corpus store is
  * read-only), so at 100 TB it ships through the same storage layer as
  * the data: centroids are k ≈ √N rows (~316k at 10¹¹ vectors — a few
  * MB), codebooks are 16 rows.
  *
  * Staleness is fingerprint-guarded: `meta.parquet` records the corpus
  * fingerprint at build time ([[VectorOps.corpusFingerprint]] — file
  * count / bytes / max mtime of `embeddings.parquet`); a load against a
  * table that has since changed logs loudly and returns None, so
  * consumers RETRAIN from current data rather than silently serving a
  * stale index (the repo's loud-guard convention — correctness never
  * depends on the artifact, it is a cache with a validity proof).
  *
  * Values round-trip exactly: centroid means and codewords are
  * 6dp-half-up-rounded doubles BEFORE they are used or saved (the q186
  * round-before-use convention), and parquet stores doubles bit-exact —
  * the save/load spec pins assignment hash-equality, and q344 oracles
  * the loaded-artifact assignment against the DuckDB trained replay.
  */
object IvfIndex {

  val FlavorRaw = "raw"
  val FlavorResidual = "residual"

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Where the artifact for `dir`'s corpus lives: session conf
    * `graft.index.dir` when set (read-only corpus stores, specs), else
    * `<dir>/_graft_index` beside the corpus — the underscore prefix
    * keeps every table reader's parquet listing from picking it up. */
  def artifactRoot(s: SparkSession, dir: String): String =
    s.conf.getOption("graft.index.dir")
      .getOrElse(new File(dir, "_graft_index").getPath)

  private def metaPath(root: String) = new File(root, "meta.parquet")
  private def centroidsPath(root: String) = new File(root, "centroids.parquet")
  private def codebooksPath(root: String) = new File(root, "codebooks.parquet")

  /** Train (or reuse the session cache) and persist the full index for
    * `dir`'s embeddings table under `out`. Overwrites any prior
    * artifact atomically per component (meta is written LAST, so a
    * crashed build leaves an artifact without a meta — which loads as
    * absent, never as valid-but-partial). */
  def build(s: SparkSession, dir: String, out: String): Unit = {
    import s.implicits._
    val fp = VectorOps.corpusFingerprint(dir)
    val cents = VectorOps.coarseCentroids(s, dir)
    val raw = VectorOps.pqCodebookRows(s, dir, residual = false)
    val res = VectorOps.pqCodebookRows(s, dir, residual = true)
    cents.toSeq.toDF("cent_id", "cv")
      .write.mode("overwrite").parquet(centroidsPath(out).getPath)
    (raw.map { case (cm, code, cw) => (FlavorRaw, cm, code, cw) } ++
      res.map { case (cm, code, cw) => (FlavorResidual, cm, code, cw) })
      .toSeq.toDF("flavor", "cm", "code", "cw")
      .write.mode("overwrite").parquet(codebooksPath(out).getPath)
    Seq((fp, cents.length.toLong)).toDF("fingerprint", "k")
      .write.mode("overwrite").parquet(metaPath(out).getPath)
  }

  /** Some(root) iff an artifact exists at the resolved root AND its
    * recorded fingerprint matches the corpus as it stands NOW. */
  private def validRoot(s: SparkSession, dir: String): Option[String] =
    validAt(s, dir, artifactRoot(s, dir))

  private def validAt(s: SparkSession, dir: String,
                      root: String): Option[String] = {
    if (!metaPath(root).exists()) None
    else {
      val recorded = s.read.parquet(metaPath(root).getPath)
        .select(col("fingerprint")).collect().headOption.map(_.getString(0))
      val current = VectorOps.corpusFingerprint(dir)
      if (recorded.contains(current)) Some(root)
      else {
        log.warn(s"graft IVF index artifact at $root is STALE " +
          s"(built for fingerprint ${recorded.getOrElse("<none>")}, corpus " +
          s"is now $current) — ignoring it and retraining from current data")
        None
      }
    }
  }

  /** The persisted coarse centroids, iff a fingerprint-valid artifact
    * exists for `dir` at the RESOLVED root. Bounded driver read (k
    * rows). */
  def loadCentroids(s: SparkSession, dir: String): Option[Array[(Long, Seq[Double])]] =
    loadCentroidsAt(s, dir, artifactRoot(s, dir))

  /** [[loadCentroids]] against an explicit artifact root (the round-trip
    * spec and the q344/q345 artifact queries read their scratch build
    * without touching session conf). */
  def loadCentroidsAt(s: SparkSession, dir: String,
                      root: String): Option[Array[(Long, Seq[Double])]] =
    validAt(s, dir, root).map { r =>
      s.read.parquet(centroidsPath(r).getPath)
        .select(col("cent_id"), col("cv"))
        .collect()
        .map(row => (row.getLong(0), row.getSeq[Double](1)))
        .sortBy(_._1)
    }

  /** The persisted PQ codebooks of one flavor, iff a fingerprint-valid
    * artifact exists for `dir` at the RESOLVED root. Bounded driver
    * read (16 rows). */
  def loadCodebooks(s: SparkSession, dir: String,
                    flavor: String): Option[Array[(Int, Long, Seq[Double])]] =
    loadCodebooksAt(s, dir, flavor, artifactRoot(s, dir))

  /** [[loadCodebooks]] against an explicit artifact root. */
  def loadCodebooksAt(s: SparkSession, dir: String, flavor: String,
                      root: String): Option[Array[(Int, Long, Seq[Double])]] =
    validAt(s, dir, root).flatMap { r =>
      val rows = s.read.parquet(codebooksPath(r).getPath)
        .filter(col("flavor") === flavor)
        .select(col("cm").cast("int"), col("code").cast("long"), col("cw"))
        .collect()
        .map(row => (row.getInt(0), row.getLong(1), row.getSeq[Double](2)))
        .sortBy(t => (t._1, t._2))
      if (rows.isEmpty) None else Some(rows)
    }
}
