package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative reflexive-transitive closure — the `wdt:P279*` property path
  * (sparql/wikidata-city.sparql:6, wikidata-organization.sparql:5).
  *
  * Spark has no recursive-query operator, so this is a semi-naive fixpoint
  * driven from the caller: each round joins only the NEW frontier against the
  * edge table, unions into the accumulator, and stops when the frontier is
  * empty (SURVEY.md §4.2, §7.3 "P279* closure at scale").
  *
  * Scale posture:
  *  - `localCheckpoint` after every round cuts the lineage chain that would
  *    otherwise grow linearly with depth (on a cluster with a checkpoint dir,
  *    prefer reliable `checkpoint`; localCheckpoint is the local[n] analog).
  *  - The frontier is deduplicated before the join, so hub nodes (the
  *    reference's Q515-like classes) are joined once per round, not once per
  *    in-edge.
  *  - The edge table is reused across rounds — cache it at the call site when
  *    it is not a cheap scan.
  *  - `maxIters` guards against cycles / adversarial depth.
  */
object Closure {

  private val debug = sys.env.contains("GRAFT_CLOSURE_DEBUG")
  private def timed[A](label: String)(body: => A): A = {
    if (!debug) body
    else {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[closure] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
  }

  /** All nodes from which some seed is reachable by following src→dst edges
    * zero or more times (reflexive: includes the seeds).
    *
    * @param edges DataFrame with columns (src, dst)
    * @param seeds DataFrame with column (node)
    * @param functionalEdges set true when each src has at most one dst (a
    *   forest, e.g. containment hierarchies): the frontier then can never
    *   revisit a node, so the per-round anti-join against the accumulator —
    *   one extra shuffle per round — is provably a no-op and is skipped.
    *   Two seeds on the same root-path still produce overlapping frontiers,
    *   so a single terminal distinct() (one shuffle total, not per round)
    *   restores the documented contract; cycles (rho-shapes) are cut by
    *   `maxIters`, also deduplicated by the terminal distinct. Leave false
    *   for general graphs (diamonds need the per-round dedup to avoid
    *   exponential frontier blowup, not just a final dedup).
    * @return DataFrame with column (node), distinct
    */
  def reachingTo(edges: DataFrame, seeds: DataFrame, maxIters: Int = 50,
                 functionalEdges: Boolean = false,
                 broadcastMaxRows: Long = 500000L): DataFrame = {
    // The edge table is probed every round — materialize it once instead of
    // re-running its scan (at cluster scale: persist(MEMORY_AND_DISK)).
    val e = edges.select(col("src"), col("dst")).persist()
    try {
      var acc = timed("seed")(seeds.select(col("node")).distinct().localCheckpoint())
      var accRows = acc.count()
      var frontier = acc
      var frontierRows = accRows
      var i = 0
      while (i < maxIters && frontierRows > 0) {
        // The materializing count of the previous round gives the frontier's
        // EXACT size, so the broadcast decision needs no stats machinery:
        // a small frontier broadcasts (edge side streams from cache with no
        // shuffle and no per-round sort — the dominant cost of a sort-merge
        // plan here), a huge one falls back to a shuffle join. Same for the
        // accumulator side of the anti-join.
        def hinted(df: DataFrame, rows: Long) =
          if (rows <= broadcastMaxRows) broadcast(df) else df
        val next = timed(s"round $i ckpt") {
          val stepped = e.join(hinted(frontier, frontierRows),
              e("dst") === frontier("node"))
            .select(e("src").as("node")).distinct()
          (if (functionalEdges) stepped
           else stepped.join(hinted(acc, accRows), Seq("node"), "left_anti"))
            .localCheckpoint(false)
        }
        // One action per round: count() materializes the lazy checkpoint
        // AND answers the emptiness question (isEmpty would be a second
        // job). acc stays a union of already-checkpointed frontiers — re-
        // checkpointing it each round would rewrite O(total) per round.
        frontierRows = timed(s"round $i count")(next.count())
        acc = acc.unionByName(next)
        accRows += frontierRows
        frontier = next
        i += 1
      }
      // Restore the distinct contract for the functional fast path (see
      // @param functionalEdges): one terminal shuffle over the accumulator,
      // instead of the per-round anti-join the fast path exists to avoid.
      if (functionalEdges) acc.distinct() else acc
    } finally { e.unpersist(blocking = false) }
  }

  /** Transitive ancestor pairs: (node, anc) for every non-empty path
    * node →+ anc. Add the reflexive pairs at the call site if `*` semantics
    * (rather than `+`) are needed.
    */
  def ancestorPairs(edges: DataFrame, maxIters: Int = 50,
                    broadcastMaxRows: Long = 500000L): DataFrame = {
    val e = edges.select(col("src"), col("dst")).persist()
    try {
      var acc = e.select(col("src").as("node"), col("dst").as("anc"))
        .distinct().localCheckpoint()
      var accRows = acc.count()
      val eRows = accRows // distinct(e) ≤ |e|, same magnitude — good enough
      var frontier = acc
      var frontierRows = accRows
      var i = 0
      while (i < maxIters && frontierRows > 0) {
        // Exact-count-driven broadcast, as in reachingTo: here the EDGE side
        // is the natural build side (one hop per round probes edges by src),
        // so broadcast it when small; the anti-join builds on the new rows.
        def hinted(df: DataFrame, rows: Long) =
          if (rows <= broadcastMaxRows) broadcast(df) else df
        val next = timed(s"anc round $i ckpt") {
          frontier.join(hinted(e, eRows), frontier("anc") === e("src"))
            .select(frontier("node"), e("dst").as("anc")).distinct()
            .join(hinted(acc, accRows), Seq("node", "anc"), "left_anti")
            .localCheckpoint(false)
        }
        frontierRows = timed(s"anc round $i count")(next.count())
        acc = acc.unionByName(next)
        accRows += frontierRows
        frontier = next
        i += 1
      }
      acc
    } finally { e.unpersist(blocking = false) }
  }
}
