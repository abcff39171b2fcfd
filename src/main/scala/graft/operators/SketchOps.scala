package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Sketch-prefiltered EXACT analytics — the two-phase pattern 100 TB
  * forces whenever the naive answer needs a global sort or an unbounded
  * hash table: a bounded-memory first pass (a mergeable sketch or a
  * coarse histogram) shrinks the problem to a provably-sufficient
  * candidate set, and a second exact pass over ONLY that set produces a
  * deterministic, oracle-matchable answer. Unlike approx_count_distinct /
  * approxQuantile, nothing here is approximate in the OUTPUT — the sketch
  * only prunes, so the result hash-matches a plain-SQL oracle.
  *
  * Three instances:
  *  - q228 heavy hitters: per-partition Misra–Gries summaries → candidate
  *    superset → one exact count pass over candidates only.
  *  - q229 exact quantiles: one histogram aggregation finds the bucket
  *    holding each target rank → exact rank-selection inside buckets —
  *    no global sort anywhere.
  *  - q231 budget selection: greedy quality-prefix selection under a
  *    corpus-wide character budget via the bucketed two-phase prefix sum
  *    (q113's machinery applied to top-down curation) — again no global
  *    sort; every corpus-sized window is bucket-partitioned.
  */
object SketchOps {

  // ---------------------------------------------------------------- q228

  /** Misra–Gries summary of one partition's term stream with `cap`
    * counters: bounded memory, and any term whose LOCAL frequency exceeds
    * n_p/cap survives. Pigeonhole lifts that to the global guarantee the
    * exact pass needs: if a term's global count exceeds n/cap then its
    * local count exceeds n_p/cap in at least one partition (otherwise
    * summing the per-partition bounds caps the global count at n/cap), so
    * the union of per-partition survivors is a superset of every global
    * heavy hitter. */
  private[graft] def misraGries(cap: Int, it: Iterator[String]): Iterator[String] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      counts.get(t) match {
        case Some(c) => counts.update(t, c + 1)
        case None if counts.size < cap => counts.update(t, 1L)
        case None =>
          // decrement-all step; keys snapshotted so removal is safe
          counts.keysIterator.toArray.foreach { key =>
            val c = counts(key) - 1
            if (c == 0L) counts.remove(key) else counts.update(key, c)
          }
      }
    }
    counts.keysIterator
  }

  /** Exact heavy hitters (terms with count > n/k) via the two-phase
    * Misra–Gries pattern: pass 1 is a shuffle-free mapPartitions sketch
    * (bounded to k counters per partition — mapPartitions is justified
    * here exactly as for codec init: the sketch's decrement step is
    * genuinely imperative state no Column expression carries); the
    * survivors union to ≤ k·partitions candidate terms, which broadcast
    * into pass 2's exact count of candidates ONLY. Output = exact counts
    * filtered by the global threshold — deterministic regardless of how
    * rows were partitioned, because the candidate set is a guaranteed
    * superset and the final counts/filter are exact. At 100 TB the
    * unbounded term-cardinality groupBy never happens; the only full
    * shuffle keys on a candidate set of at most a few thousand terms. */
  def q228HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 50
    val tokens = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .persist()
    val n = tokens.count() // materializes the persist; total for the threshold
    val candidates = tokens.as[String]
      .mapPartitions(misraGries(k, _))
      .toDF("term").distinct()
    val out = tokens.join(broadcast(candidates), Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .filter(col("n") > lit(n.toDouble / k))
      .withColumn("share", round(col("n") / lit(n.toDouble), 6))
      .localCheckpoint()
    tokens.unpersist(blocking = false)
    out
  }

  // ---------------------------------------------------------------- q229

  /** EXACT quantiles without a global sort: pass 1 aggregates a coarse
    * value histogram (fixed 65536-cent buckets — bounded, sketch-sized);
    * a running sum over the bucket frame locates, for each target rank
    * ceil(p·n), the one bucket containing it; pass 2 rank-selects inside
    * those buckets only — a row_number window partitioned per target,
    * over ~n/buckets rows each. Two corpus passes total, both
    * aggregation-shaped (map-side partials), zero corpus-sized sorts.
    * The bucket-cumsum window is the only single-partition window and it
    * runs on the histogram (≤ domain/65536 rows), not the data — the
    * same census-size class as the closure convergence reads. */
  def q229ExactQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ps = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
    val bucketW = 65536L
    val cents = Tables.lineitem(s, dir)
      .select(round(col("l_extendedprice") * 100).cast("long").as("c"))
      .withColumn("bucket", floor(col("c") / bucketW).cast("long"))
      .persist()
    val n = cents.count()
    val ranks = ps.map(p => (p, math.ceil(p * n).toLong)).toDF("p", "rank")
    val wcum = Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, 0)
    val targets = cents.groupBy(col("bucket")).agg(count(lit(1)).as("bn"))
      .withColumn("cum", sum(col("bn")).over(wcum))
      .withColumn("prior", col("cum") - col("bn"))
      .join(broadcast(ranks), col("prior") < col("rank") && col("rank") <= col("cum"))
      .select(col("p"), col("rank"), col("bucket"), col("prior"))
    val win = Window.partitionBy(col("p")).orderBy(col("c"))
    val out = cents.join(broadcast(targets), Seq("bucket"))
      .withColumn("rn", row_number().over(win))
      .filter(col("prior") + col("rn") === col("rank"))
      .select(col("p"), col("c").as("value_cents"))
      .localCheckpoint()
    cents.unpersist(blocking = false)
    out
  }

  // ---------------------------------------------------------------- q237

  /** Per-group exact median — the grouped form of q229, proving the
    * histogram-refinement pattern composes with grouping: the histogram
    * keys on (group, bucket), the cumulative windows partition on the
    * group (parallel across groups, bucket-count-sized within), and the
    * in-bucket rank selection partitions per group. Still two
    * aggregation-shaped corpus passes, still zero global sorts, for ANY
    * number of groups. */
  def q237GroupedMedian(s: SparkSession, dir: String): DataFrame = {
    val bucketW = 65536L
    val cents = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("g"),
        round(col("l_extendedprice") * 100).cast("long").as("c"))
      .withColumn("bucket", floor(col("c") / bucketW).cast("long"))
      .persist()
    val ranks = cents.groupBy(col("g")).agg(count(lit(1)).as("gn"))
      .select(col("g"), ceil(col("gn") / 2.0).cast("long").as("rank"))
    val wcum = Window.partitionBy(col("g")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val targets = cents.groupBy(col("g"), col("bucket")).agg(count(lit(1)).as("bn"))
      .withColumn("cum", sum(col("bn")).over(wcum))
      .withColumn("prior", col("cum") - col("bn"))
      .join(ranks, Seq("g"))
      .filter(col("prior") < col("rank") && col("rank") <= col("cum"))
      .select(col("g"), col("bucket"), col("prior"), col("rank"))
    val win = Window.partitionBy(col("g")).orderBy(col("c"))
    val out = cents.join(broadcast(targets), Seq("g", "bucket"))
      .withColumn("rn", row_number().over(win))
      .filter(col("prior") + col("rn") === col("rank"))
      .select(col("g").as("l_returnflag"), col("c").as("median_cents"))
      .localCheckpoint()
    cents.unpersist(blocking = false)
    out
  }

  // ---------------------------------------------------------------- q239

  /** Equal-frequency discretization (decile binning) — the feature-
    * engineering consumer of q229's machinery: the 9 internal decile
    * boundaries come from the two-pass exact-quantile plan, collect as a
    * 9-value census read (the ranks-frame class), and bin assignment is
    * then 9 codegen'd comparisons inside the scan — `Σ [c > bᵢ]` over the
    * boundary MULTISET, so duplicate boundaries (a value straddling
    * several deciles) bin identically on both engines. No ntile(), whose
    * tie order is nondeterministic; no global sort anywhere. */
  def q239EquifreqBins(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ps = (1 to 9).map(_ / 10.0)
    val bucketW = 65536L
    val cents = Tables.lineitem(s, dir)
      .select(round(col("l_extendedprice") * 100).cast("long").as("c"))
      .withColumn("bucket", floor(col("c") / bucketW).cast("long"))
      .persist()
    val n = cents.count()
    val ranks = ps.map(p => (p, math.ceil(p * n).toLong)).toDF("p", "rank")
    val wcum = Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, 0)
    val targets = cents.groupBy(col("bucket")).agg(count(lit(1)).as("bn"))
      .withColumn("cum", sum(col("bn")).over(wcum))
      .withColumn("prior", col("cum") - col("bn"))
      .join(broadcast(ranks), col("prior") < col("rank") && col("rank") <= col("cum"))
      .select(col("p"), col("rank"), col("bucket"), col("prior"))
    val win = Window.partitionBy(col("p")).orderBy(col("c"))
    val bvals = cents.join(broadcast(targets), Seq("bucket"))
      .withColumn("rn", row_number().over(win))
      .filter(col("prior") + col("rn") === col("rank"))
      .select(col("c")).collect().map(_.getLong(0)) // 9 boundaries — census read
    val bin = bvals.map(b => when(col("c") > b, 1L).otherwise(0L))
      .reduce(_ + _)
    val out = cents
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"), min(col("c")).as("lo"), max(col("c")).as("hi"))
      .localCheckpoint()
    cents.unpersist(blocking = false)
    out
  }

  // ---------------------------------------------------------------- q240

  /** PER-GROUP exact heavy hitters via the [[graft.functions.MgCandidates]]
    * typed Aggregator — q228's two-phase pattern where the bounded-memory
    * sketch runs INSIDE the aggregation layer (map-side partials, k
    * counters per group per partition, mergeable) instead of
    * mapPartitions, so it composes with any groupBy. Phase 2 recounts the
    * candidate (group, term) pairs exactly (a semi-join against the
    * candidate set — broadcast-sized by construction: ≤k per group) and
    * filters on the true per-group threshold, which erases the sketch's
    * partition-order sensitivity from the answer. k=25 sits BELOW the
    * fixture vocabulary so the decrement path genuinely fires. */
  def q240GroupedHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val k = 25
    val tokens = Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .persist()
    val totals = tokens.groupBy(col("source")).agg(count(lit(1)).as("gn"))
    val cand = tokens.groupBy(col("source"))
      .agg(graft.functions.MgCandidates.mgCandidates(col("term"), k).as("cands"))
      .select(col("source"), explode(col("cands")).as("term"))
    val out = tokens.join(broadcast(cand), Seq("source", "term"), "left_semi")
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("n"))
      .join(broadcast(totals), Seq("source"))
      .filter(col("n") > col("gn") / k)
      .select(col("source"), col("term"), col("n"))
      .localCheckpoint()
    tokens.unpersist(blocking = false)
    out
  }

  // ---------------------------------------------------------------- q231

  /** Token/char-budget curation: select documents in (quality desc,
    * doc_id) order while the running character total stays within 60% of
    * the corpus — the greedy-prefix data-selection step behind
    * "keep the best B tokens" corpus curation. The running total over a
    * corpus-wide order is the scale hazard; it computes here as the
    * bucketed two-phase prefix sum: per-doc cumsum windows partition on
    * the quality bucket (floor(score·1000) — monotone in the sort key, so
    * bucket-desc-then-in-bucket order IS the global order), and only the
    * per-bucket offset table (≤1001 rows) sees a single-partition window.
    * The quality score reuses q40's oracled definition. */
  def q231BudgetSelect(s: SparkSession, dir: String): DataFrame = {
    val nToks = size(col("toks")).cast("long")
    val nStop = expr("size(filter(toks, t -> t IN ('the','a','of','and')))").cast("long")
    val scored = Tables.documents(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("n_chars"),
        round(least(lit(1.0), nToks / 100.0) * (lit(1.0) - nStop / nToks), 4).as("score"))
      .withColumn("sb", floor(col("score") * 1000).cast("long"))
      .persist()
    val budget = scored.agg(floor(sum(col("n_chars")) * 0.6).cast("long").as("budget"))
    val wb = Window.orderBy(col("sb").desc).rowsBetween(Window.unboundedPreceding, 0)
    val offsets = scored.groupBy(col("sb")).agg(sum(col("n_chars")).as("bsum"))
      .withColumn("offset", sum(col("bsum")).over(wb) - col("bsum"))
      .select(col("sb"), col("offset"))
    val win = Window.partitionBy(col("sb")).orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val out = scored.join(broadcast(offsets), Seq("sb"))
      .withColumn("cum_chars", col("offset") + sum(col("n_chars")).over(win))
      .crossJoin(broadcast(budget))
      .filter(col("cum_chars") <= col("budget"))
      .select(col("doc_id"), col("score"), col("n_chars"), col("cum_chars"))
      .localCheckpoint()
    scored.unpersist(blocking = false)
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q228_heavy_hitters"  -> q228HeavyHitters _,
    "q229_exact_quantiles" -> q229ExactQuantiles _,
    "q231_budget_select"  -> q231BudgetSelect _,
    "q237_grouped_median" -> q237GroupedMedian _,
    "q239_equifreq_bins"  -> q239EquifreqBins _,
    "q240_grouped_heavy_hitters" -> q240GroupedHeavyHitters _
  )

  val oracles: Map[String, String] = Map(
    "q228_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
         tok AS (SELECT term FROM t WHERE term <> ''),
         n AS (SELECT count(*) AS total FROM tok)
         SELECT term, count(*) AS n,
                round(count(*) / (SELECT CAST(total AS DOUBLE) FROM n), 6) AS share
         FROM tok GROUP BY term
         HAVING count(*) > (SELECT total FROM n) / 50.0""",
    "q229_exact_quantiles" ->
      """WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem),
         r AS (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM v),
         n AS (SELECT count(*) AS total FROM v),
         ps AS (SELECT unnest(CAST([0.25, 0.5, 0.75, 0.9, 0.99] AS DOUBLE[])) AS p)
         SELECT ps.p, r.c AS value_cents
         FROM ps CROSS JOIN n
         JOIN r ON r.rn = CAST(ceil(ps.p * n.total) AS BIGINT)""",
    "q240_grouped_heavy_hitters" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS term
                    FROM documents),
         tok AS (SELECT source, term FROM t WHERE term <> ''),
         g AS (SELECT source, count(*) AS gn FROM tok GROUP BY 1)
         SELECT tok.source, term, count(*) AS n
         FROM tok JOIN g ON tok.source = g.source
         GROUP BY tok.source, term, g.gn
         HAVING count(*) > g.gn / 25.0""",
    "q237_grouped_median" ->
      """WITH v AS (SELECT l_returnflag AS g,
                           CAST(round(l_extendedprice * 100) AS BIGINT) AS c
                    FROM lineitem),
         r AS (SELECT g, c,
                      row_number() OVER (PARTITION BY g ORDER BY c) AS rn,
                      count(*) OVER (PARTITION BY g) AS gn
               FROM v)
         SELECT g AS l_returnflag, c AS median_cents
         FROM r WHERE rn = CAST(ceil(gn / 2.0) AS BIGINT)""",
    "q239_equifreq_bins" ->
      """WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
                    FROM lineitem),
         r AS (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM v),
         n AS (SELECT count(*) AS total FROM v),
         ps AS (SELECT unnest(CAST([0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]
                                   AS DOUBLE[])) AS p),
         b AS (SELECT r.c AS bval
               FROM ps CROSS JOIN n
               JOIN r ON r.rn = CAST(ceil(ps.p * n.total) AS BIGINT)),
         binned AS (SELECT v.c,
                      (SELECT count(*) FROM b WHERE b.bval < v.c) AS bin
                    FROM v)
         SELECT bin, count(*) AS n, min(c) AS lo, max(c) AS hi
         FROM binned GROUP BY 1""",
    "q231_budget_select" ->
      """WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks
                    FROM documents),
         sc AS (SELECT doc_id, n_chars,
                  round(least(1.0, len(toks) / 100.0) *
                        (1.0 - len(list_filter(toks, x -> x IN ('the','a','of','and')))
                               / CAST(len(toks) AS DOUBLE)), 4) AS score
                FROM t),
         b AS (SELECT CAST(floor(sum(n_chars) * 0.6) AS BIGINT) AS budget FROM sc),
         c AS (SELECT doc_id, score, n_chars,
                      CAST(sum(n_chars) OVER (ORDER BY score DESC, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                        AS cum_chars
               FROM sc)
         SELECT doc_id, score, n_chars, cum_chars
         FROM c CROSS JOIN b WHERE cum_chars <= budget"""
  )
}
