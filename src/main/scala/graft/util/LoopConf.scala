package graft.util

import org.apache.spark.sql.SparkSession

/** Scoped session-conf overrides for driver-synchronized fixpoint loops.
  *
  * The r18 verdict suggested disabling AQE inside loop bodies (per-round
  * re-planning measured ~0.3 s/round in the q16 debug trace). The r19 A/B
  * MEASURED the opposite: with AQE off the loop family runs 44.16 s vs
  * 39.24 s with AQE on (13 queries, sf0.1 local[32], same tree, env
  * toggle), and aggregate executor task time EXPLODES 458 → 214 task-s
  * (q256 96→40, q212 71→20, q110 56→23): without AQE's partition
  * coalescing every per-round exchange keeps all `shuffle.partitions`
  * tasks, so each frontier-sized round pays 32 near-empty tasks of pure
  * scheduling overhead. AQE's coalescing buys far more than its planning
  * costs at every scale where frontiers shrink — which is every fixpoint
  * here. DECISION: loops keep AQE; `noAqe` stays as the measured A/B
  * hatch (GRAFT_LOOP_AQE=0 reproduces the refuted variant).
  */
object LoopConf {

  private def disable = sys.env.get("GRAFT_LOOP_AQE").contains("0")

  /** Run `body` (a whole fixpoint loop, including its per-round actions).
    * Default: no-op — AQE stays on (see object doc for the measurement).
    * GRAFT_LOOP_AQE=0 disables AQE inside the loop for A/B replays;
    * restores the previous setting even on throw. */
  def noAqe[A](s: SparkSession)(body: => A): A = {
    if (!disable) body
    else {
      val key = "spark.sql.adaptive.enabled"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "false")
      try body
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    }
  }
}
