package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by semi-naive min-label propagation — the
  * clustering step a dedup pipeline needs between near-dup PAIRS (MinHash
  * LSH, q34) and a KEEP/DROP decision: every document in a component keeps
  * the component's minimum id as its canonical representative.
  *
  * The reference's pipelines stop at per-entity worklists
  * (prosnet-prefect-pipelines render_* + id dedup); component clustering
  * is part of the training-data surface (SURVEY §5 north star), where
  * transitive near-duplicate chains (A≈B, B≈C) must collapse to ONE
  * canonical doc even when A and C never shared an LSH bucket.
  *
  * Algorithm: alternating min-label propagation. Each round every node's
  * label becomes the min of its own and its neighbors' labels; fixpoint in
  * O(component diameter) rounds. Near-dup clusters are shallow (pairs
  * come from shared buckets, so diameters of 2-4), which makes this the
  * right plan HERE; for deep path-shaped graphs the two-phase
  * large-star/small-star contraction (Kiveris et al., "Connected
  * Components in MapReduce and Beyond") halves diameters per round and
  * would replace the inner step without changing the driver loop.
  *
  * Scale posture (the Closure playbook):
  *  - the symmetrized edge table is persisted once and probed per round;
  *  - lineage is cut per round (reliable checkpoint under a configured
  *    checkpoint dir, else localCheckpoint);
  *  - each round is ONE aggregation shuffle on `node`; the convergence
  *    check joins two consecutive label tables ALREADY hash-partitioned
  *    by `node` from their groupBys, so it adds no exchange;
  *  - labels only ever decrease, so `changed == 0` is an exact fixpoint
  *    test, not a heuristic.
  */
object ConnectedComponents {

  private def ckpt(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(false)
    else df.localCheckpoint(false)

  /** Component labels for every node in `nodes`.
    *
    * @param edges (src, dst) pairs in either orientation (symmetrized here)
    * @param nodes (node) — the full domain; isolated nodes label themselves
    * @param maxIters cycle/adversarial-depth guard
    * @return (node, component) — component = min node id reachable over
    *         the undirected pair graph, deterministic under re-runs
    */
  def labels(edges: DataFrame, nodes: DataFrame, maxIters: Int = 50): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    try {
      var lab = ckpt(nodes.select(col("node")).distinct()
        .select(col("node"), col("node").as("component")))
      var changed = 1L
      var i = 0
      while (i < maxIters && changed > 0) {
        val viaEdges = sym.join(lab, sym("src") === lab("node"))
          .select(sym("dst").as("node"), col("component"))
        val next = ckpt(viaEdges.unionByName(lab.select(col("node"), col("component")))
          .groupBy(col("node")).agg(min(col("component")).as("component")))
        // one action per round: materializes the checkpoint AND answers
        // convergence; both sides are partitioned by node already
        changed = next.join(lab.select(col("node"), col("component").as("__old")),
            Seq("node"))
          .filter(col("component") < col("__old")).count()
        lab = next
        i += 1
      }
      lab
    } finally { sym.unpersist(blocking = false) }
  }
}
