package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Absorb session/codegen warmup so it doesn't land on the first query,
    // and run in sorted order so per-query timings are comparable across
    // rounds.
    spark.range(1000000).selectExpr("sum(id)").collect()
    // A failed query is reported as a NEGATIVE elapsed time so breakage is
    // visible in the timings JSON (a -0.1 entry can never be mistaken for a
    // fast success).
    // Optional args = query-name filter (substring match) for targeted
    // profiling; the driver invokes with no args → full sorted run.
    val wanted = args.toSeq
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      wanted.isEmpty || wanted.exists(n.contains)
    }
    def runAll(): Seq[(String, Double)] = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case e: Throwable =>
                 System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      // Cache hygiene between queries: a query that persists intermediates
      // must not bleed memory pressure into the next query's timing.
      spark.catalog.clearCache()
      // Clamp failures away from zero, matching the 2-decimal per-query
      // format: a fast failure must never round to -0.00 (which
      // JSON-parses equal to 0.0).
      name -> (if (ok) sec else -math.max(sec, 0.01))
    }
    // Two passes, per-query minimum: machine noise on a shared box swings
    // single-run totals by >50%, and the first pass carries each query
    // shape's one-time codegen cost. The min is the steady-state number a
    // warmed cluster would see; a failure in either pass stays negative.
    val results = runAll().zip(runAll()).map { case ((name, a), (_, b)) =>
      val m = math.min(math.abs(a), math.abs(b))
      name -> (if (a >= 0 && b >= 0) m else -math.max(m, 0.01))
    }
    // The driver captures only the last ~2000 chars of output, so the JSON
    // line must stay short: shorten "q36_ngram_jaccard" to its unique "q36"
    // prefix (full name kept on prefix collision); per-query values round
    // to centiseconds (134+ queries × ~14 chars must stay under the
    // window), the total keeps milliseconds.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def fmtQ(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val prefix = results.map { case (k, _) => k -> k.takeWhile(_ != '_') }.toMap
    val collisions = prefix.values.groupBy(identity).collect {
      case (p, g) if g.size > 1 => p
    }.toSet
    val qs = results.map { case (k, v) =>
      val key = if (collisions(prefix(k))) k else prefix(k)
      "\"" + key + "\":" + fmtQ(v)
    }.mkString("{", ",", "}")
    val total = results.map { case (_, v) => math.abs(v) }.sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
