package graft
import org.apache.spark.sql.SparkSession

/** Repeat one query in a warm session to separate JIT/codegen warmup from
  * steady-state cost: `runMain graft.Profile <sfDir> <queryName> [reps]`. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("GRAFT_PROFILE_CONF").foreach(_.split(';').foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      val n = df.count()
      val t2 = System.nanoTime()
      println(f"[profile] $name rep $i: build ${(t1 - t0) / 1e9}%.3f s + " +
        f"count ${(t2 - t1) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
