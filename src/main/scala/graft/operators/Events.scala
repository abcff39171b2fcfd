package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Incremental / upsert / event-time semantics (SURVEY.md §2.9–2.10) in
  * batch form over the `events` table. The true Structured-Streaming
  * counterparts (readStream + watermark + mapGroupsWithState) live in
  * [[graft.streaming]]; these batch queries pin the same semantics against
  * the DuckDB oracle, which a streaming job cannot.
  */
object Events {

  /** P10: date-watermark incremental pull — only rows newer than the cutoff
    * (wikidata_index.py:156-171 `{{INCREMENTAL_DATE}}` rewrite). The
    * predicate is pushed to the parquet scan. Fixed cutoff, not now():
    * injectable-clock policy per SURVEY.md §7.3 "Nondeterminism". */
  def q28IncrementalWatermark(s: SparkSession, dir: String): DataFrame = {
    // Filter on the RAW file column BEFORE the ts derivation: a predicate
    // on a derived column cannot be pushed through the conversion, but a
    // comparison against the scan's own `ts` reaches the parquet reader as
    // GreaterThan(ts, …) and prunes row groups. The literal adapts to the
    // file generation (epoch-nanos INT64 vs µs timestamp — see
    // Tables.deriveEventTime). Cutoff = 2024-01-25T00:00:00Z.
    val cutoffSec = 1706140800L
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = Tables(s, dir, "events")
    val pred = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        col("ts") > lit(cutoffSec * 1000000000L)
      case org.apache.spark.sql.types.TimestampNTZType =>
        col("ts") > lit(java.time.LocalDateTime.ofEpochSecond(
          cutoffSec, 0, java.time.ZoneOffset.UTC))
      case _ =>
        col("ts") > lit(java.time.Instant.ofEpochSecond(cutoffSec))
    }
    Tables.deriveEventTime(raw.filter(pred))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
  }

  /** Event-time tumbling window aggregation (batch twin of the streaming
    * windowed count; no reference counterpart — north-star extension). */
  def q29HourlyWindow(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("total_value"))
  }

  /** Sessionization with a 30-minute inactivity gap — lag + cumulative-sum
    * session ids; microsecond-exact gap arithmetic so the oracle agrees on
    * boundaries. Batch twin of flatMapGroupsWithState sessionization. */
  def q30Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser)
    val newSession = when(gapUs.isNull || gapUs > 1800L * 1000000L, 1L).otherwise(0L)
    Tables.events(s, dir)
      .withColumn("new_s", newSession)
      .groupBy(col("user_id"))
      .agg(sum(col("new_s")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** JSON property extraction from the `props` string column (the driver
    * data's analog of nested-JSON reshaping, get_data_apis_vanilla.py
    * nested entities). regexp-based so both engines agree byte-for-byte. */
  def q31PropsExtract(s: SparkSession, dir: String): DataFrame = {
    val k = regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
    Tables.events(s, dir)
      .select(col("event_type"), nullif(k, lit("")).cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("k_sum"), count(col("k")).as("k_cnt"))
  }

  /** K1: upsert last-write-wins — keep the newest row per id before the
    * sink (push_to_typesense.py:49-51 `action: "upsert"`). */
  def q32UpsertLatest(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_event"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
  }

  /** As-of enrichment: each click event carries the value of the user's
    * most recent PRIOR purchase (null when none). Composed from built-in
    * window functions (preference (a) of the custom-operator ladder — no
    * custom SparkPlan needed); ties on ts break by event_id so both engines
    * walk the same order. At scale this is one shuffle on user_id. */
  def q57AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .withColumn("prior_purchase",
        round(last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true)
          .over(w), 2))
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("prior_purchase"))
  }

  /** Hierarchical totals via ROLLUP(event_type, day) — per-(type, day),
    * per-type subtotal, and grand total in one pass (no reference
    * counterpart; standard analytics surface). */
  def q59Rollup(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .rollup(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
  }

  /** Interval (range) join: attribute each purchase to every click by the
    * same user within the preceding hour — the batch twin of the
    * stream-stream interval join ([[graft.streaming.StreamOps.clickToPurchase]]),
    * so the watermarked streaming semantics are pinned against the oracle.
    * Physically an equi-join on user_id with the range predicate evaluated
    * inside the join — one shuffle, no quadratic pair blowup, since the
    * equi key bounds candidates to same-user pairs. */
  def q70AttributionBatch(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        unix_micros(col("ts")).as("click_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"), col("value"))
    clicks.join(purchases, Seq("user_id"))
      .filter(col("purchase_us") >= col("click_us") &&
        col("purchase_us") <= col("click_us") + lit(3600L * 1000000L))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        round(col("value"), 2).as("value"))
  }

  /** Per-hour distinct-user KMV estimate — the oracle-checked batch twin of
    * [[graft.streaming.StreamOps.hourlyDistinctUsers]] (same sketch, same
    * estimator, windowed by event-time hour). Exact count alongside. */
  def q77HourlyKmv(s: SparkSession, dir: String): DataFrame = {
    val k = 64
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(
        graft.functions.BottomK.bottomK(md5(col("user_id").cast("string")), k).as("lows"),
        countDistinct(col("user_id")).as("n_users"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        graft.functions.BottomK.kmvEstimate(col("lows"), k).as("est_users"),
        col("n_users"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q57_asof_join" -> q57AsofJoin _,
    "q59_rollup"    -> q59Rollup _,
    "q70_attribution_batch" -> q70AttributionBatch _,
    "q77_hourly_kmv" -> q77HourlyKmv _,
    "q28_incremental_watermark" -> q28IncrementalWatermark _,
    "q29_hourly_window"         -> q29HourlyWindow _,
    "q30_sessionize"            -> q30Sessionize _,
    "q31_props_extract"         -> q31PropsExtract _,
    "q32_upsert_latest"         -> q32UpsertLatest _
  )

  val oracles: Map[String, String] = Map(
    "q77_hourly_kmv" ->
      """WITH h AS (SELECT DISTINCT
                    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
                    md5(CAST(user_id AS VARCHAR)) AS h
               FROM events
               WHERE user_id IS NOT NULL),
         r AS (SELECT hour_start, h,
                      row_number() OVER (PARTITION BY hour_start ORDER BY h) AS rn,
                      count(*) OVER (PARTITION BY hour_start) AS nd
               FROM h)
         SELECT hour_start,
           round(CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
                 ELSE 63.0 / (CAST(('0x'||substr(h,1,8)) AS BIGINT) / 4294967296.0)
                 END, 4) AS est_users,
           CAST(nd AS BIGINT) AS n_users
         FROM r WHERE rn = least(nd, 64)""",
    "q70_attribution_batch" ->
      """WITH c AS (SELECT event_id AS click_id, user_id,
                    epoch_us(ts) AS click_us
               FROM events WHERE event_type = 'click'),
         p AS (SELECT event_id AS purchase_id, user_id,
                    epoch_us(ts) AS purchase_us, value
               FROM events WHERE event_type = 'purchase')
         SELECT p.purchase_id, c.click_id, c.user_id, round(p.value, 2) AS value
         FROM c JOIN p ON c.user_id = p.user_id
         WHERE p.purchase_us >= c.click_us
           AND p.purchase_us <= c.click_us + 3600000000""",
    "q59_rollup" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         count(*) AS n, round(sum(value),2) AS total_value
         FROM events GROUP BY ROLLUP(1, 2)""",
    "q57_asof_join" ->
      """SELECT event_id, user_id, prior_purchase FROM (
           SELECT event_id, user_id, event_type,
                  round(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 2) AS prior_purchase
           FROM events)
         WHERE event_type = 'click'""",
    "q28_incremental_watermark" ->
      """SELECT event_type, count(*) AS n, round(sum(value),2) AS total_value
         FROM events WHERE ts > TIMESTAMP '2024-01-25 00:00:00' GROUP BY 1""",
    "q29_hourly_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
         event_type, count(*) AS n, round(sum(value),2) AS total_value
         FROM events GROUP BY 1,2""",
    "q30_sessionize" ->
      """WITH g AS (
           SELECT user_id,
                  epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
           FROM events)
         SELECT user_id,
                CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 1800*1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
                count(*) AS n_events
         FROM g GROUP BY 1""",
    "q31_props_extract" ->
      """SELECT event_type,
         CAST(sum(TRY_CAST(nullif(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS BIGINT)) AS BIGINT) AS k_sum,
         count(TRY_CAST(nullif(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS BIGINT)) AS k_cnt
         FROM events GROUP BY 1""",
    "q32_upsert_latest" ->
      """SELECT user_id, event_type AS last_event,
                strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn FROM events)
         WHERE rn = 1"""
  )
}
