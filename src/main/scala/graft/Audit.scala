package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.util.QueryExecutionListener

/** Board-wide plan-posture audit: runs every SparkEntry query at the
  * given SF under a QueryExecutionListener and reports, per query, the
  * scale-hazard shapes the round-11 verdict hunted by hand —
  * unpartitioned windows (with whether an aggregate feeds them, the
  * bounded-offset exemption), conditioned nested-loop joins, and
  * cartesian products. `PlanPostureSpec` pins the five fixed queries;
  * this main sweeps the WHOLE board so a new query with a regressed
  * posture is one `runMain graft.Audit <sfDir>` away from being named.
  *
  * Usage: runMain graft.Audit [sfDir] [name substrings...]
  */
object Audit {
  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    Seq(p) ++ kids.flatMap(nodes)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val wanted = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val plans = new java.util.concurrent.ConcurrentLinkedQueue[SparkPlan]()
    val listener = new QueryExecutionListener {
      def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        plans.add(qe.executedPlan)
      def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)

    val sel = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      wanted.isEmpty || wanted.exists(n.contains)
    }
    var flagged = 0
    var unexemptTotal = 0
    var failures = 0
    sel.foreach { case (name, fn) =>
      plans.clear()
      try {
        fn(spark, sfDir).collect()
        // drain the async listener bus
        var last = -1; var stable = 0
        val deadline = System.nanoTime() + 5000000000L
        while (stable < 3 && System.nanoTime() < deadline) {
          Thread.sleep(50)
          val n = plans.size()
          if (n == last) stable += 1 else { stable = 0; last = n }
        }
        val all = plans.toArray(Array.empty[SparkPlan]).toSeq
        val unpart = all.flatMap(p => nodes(p).collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        })
        // the bounded-offset exemption: an aggregate below the window
        // means it reads a cardinality-bounded table, not per-row data
        val unexempt = unpart.filterNot(w =>
          nodes(w.child).exists(_.nodeName.contains("HashAggregate")))
        val loops = all.flatMap(_.toString.linesIterator.filter(l =>
          (l.contains("BroadcastNestedLoopJoin") && l.contains("Inner")) ||
            l.contains("CartesianProduct")))
        if (unexempt.nonEmpty || loops.nonEmpty || unpart.length > 2) {
          flagged += 1
          unexemptTotal += unexempt.length
          println(f"AUDIT $name%-32s unpartWindows=${unpart.length}%d " +
            f"unexempt=${unexempt.length}%d condLoops=${loops.length}%d")
          loops.take(2).foreach(l => println(s"    $l"))
        }
      } catch {
        case e: Throwable =>
          flagged += 1
          failures += 1
          println(s"AUDIT $name FAILED: ${e.getMessage}")
      }
    }
    println(s"== audit: ${sel.length} queries, $flagged flagged, " +
      s"$unexemptTotal unexempt windows, $failures failures ==")
    spark.listenerManager.unregister(listener)
    spark.stop()
    // hard gate: an unpartitioned window over per-row data (or a query
    // that crashes under audit) fails the build; bounded-frame loop
    // flags stay report-only (the documented broadcast-query classes)
    if (unexemptTotal > 0 || failures > 0) sys.exit(1)
  }
}
