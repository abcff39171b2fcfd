package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.generators.Worklist
import graft.multimodal.Multimodal
import graft.pipelines.PersonIndex
import graft.plans.TripleStore

/** End-to-end pipeline queries: typed-Dataset generators with worklist
  * expansion (§2.7/§3.2), multimodal feature extraction, and the §3.1
  * flagship person-index document pipeline.
  */
object PipelineOps {

  /** G2/G10 + J8: 2-round semi-naive render expansion
    * (get_data_apis_vanilla.py:1249-1275). */
  def q44WorklistExpand(s: SparkSession, dir: String): DataFrame =
    Worklist.expand(s, dir)

  /** Multimodal decode plumbing: binary payloads → per-partition feature
    * extraction (stubbed codec, real schema/partitioning). */
  def q45MultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.extractFeatures(Multimodal.mediaFromEvents(s, dir)).toDF()
  }

  /** §3.1 person-index pipeline: BGP → distinct → label service → doc
    * projection → upsert dedup. */
  def q46PersonIndex(s: SparkSession, dir: String): DataFrame =
    PersonIndex.documents(s, dir)

  /** S1/S5 as a DataSourceV2 scan ([[graft.sources.PagedSourceProvider]]):
    * 6 pages × 200 rows pulled as one InputPartition per page, then a
    * per-page integrity summary. The sfDir parameter is unused — the source
    * stands in for a remote endpoint, not the lake. */
  def q72PagedSource(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.PagedSourceProvider")
      .option("pages", 6).option("pageSize", 200).load()
      .groupBy(col("page"))
      .agg(count(lit(1)).as("n"),
        min(col("payload")).as("min_payload"),
        max(col("payload")).as("max_payload"),
        sum(col("id")).as("id_sum"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q44_worklist_expand"     -> q44WorklistExpand _,
    "q45_multimodal_features" -> q45MultimodalFeatures _,
    "q46_person_index"        -> q46PersonIndex _,
    "q72_paged_source"        -> q72PagedSource _
  )

  val oracles: Map[String, String] = Map(
    "q72_paged_source" ->
      """WITH g AS (SELECT p.page, r.i,
                    md5(CAST(p.page AS VARCHAR)||':'||CAST(r.i AS VARCHAR)) AS payload,
                    p.page * 200 + r.i AS id
               FROM range(0, 6) p(page), range(0, 200) r(i))
         SELECT CAST(page AS INTEGER) AS page, count(*) AS n,
                min(payload) AS min_payload, max(payload) AS max_payload,
                CAST(sum(id) AS BIGINT) AS id_sum
         FROM g GROUP BY 1""",
    "q44_worklist_expand" ->
      """SELECT 'C'||CAST(c_custkey AS VARCHAR) AS s, 'type' AS p, 'E21_Person' AS o FROM customer
         UNION ALL SELECT 'C'||CAST(c_custkey AS VARCHAR), 'label', c_name FROM customer
         UNION ALL SELECT 'C'||CAST(c_custkey AS VARCHAR), 'nation', 'N'||CAST(c_nationkey AS VARCHAR) FROM customer
         UNION ALL SELECT 'N'||CAST(n_nationkey AS VARCHAR), 'type', 'E53_Place' FROM nation
           WHERE n_nationkey IN (SELECT DISTINCT c_nationkey FROM customer)
         UNION ALL SELECT 'N'||CAST(n_nationkey AS VARCHAR), 'label', n_name FROM nation
           WHERE n_nationkey IN (SELECT DISTINCT c_nationkey FROM customer)
         UNION ALL SELECT 'N'||CAST(n_nationkey AS VARCHAR), 'region', 'R'||CAST(n_regionkey AS VARCHAR) FROM nation
           WHERE n_nationkey IN (SELECT DISTINCT c_nationkey FROM customer)""",
    "q45_multimodal_features" ->
      """SELECT event_id AS media_id, event_type AS kind,
         CAST(octet_length(encode(props)) AS BIGINT) AS n_bytes,
         ascii(substr(props, 1, 1)) AS first_byte,
         ascii(substr(props, -1, 1)) AS last_byte,
         md5(props) AS checksum
         FROM events""",
    "q46_person_index" ->
      s"""WITH labels AS (${TripleStore.langLabelsSql}),
         ranked AS (
           SELECT entity, label,
                  row_number() OVER (PARTITION BY entity
                    ORDER BY CASE lang WHEN 'de' THEN 1 WHEN 'en' THEN 2 END, label) AS rn
           FROM labels WHERE lang IN ('de','en')),
         pick AS (SELECT entity, label FROM ranked WHERE rn = 1),
         core AS (
           SELECT 'C'||CAST(c_custkey AS VARCHAR) AS c, c_name AS name,
                  'N'||CAST(c_nationkey AS VARCHAR) AS n
           FROM customer)
         SELECT 'http://ex.org/entity/'||c AS id, name,
                coalesce(p.label, n) AS country,
                name||' ('||coalesce(p.label, n)||')'||' - '||n AS label
         FROM core LEFT JOIN pick p ON core.n = p.entity"""
  )
}
