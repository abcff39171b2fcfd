package graft

import org.apache.spark.sql.SparkSession

/** Storage-leak audit for the r19 checkpoint-lifecycle work: run a set of
  * loop-family queries back to back (the Verify shape — one long-lived
  * session) and report the block-manager residue after each. The r18
  * verdict flagged that eagerly checkpointed loop tables and mid-loop
  * lazy-checkpoint rounds lived until ContextCleaner GC; with the
  * CkptBlocks releases in place the cached-partition count must stay flat
  * instead of growing per query.
  *
  * Usage: runMain graft.BlockAudit <sfDir> [query substrings…]
  */
object BlockAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val wanted: Seq[String] =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q16_", "q110", "q198", "q298", "q249", "q256", "q212",
        "q341", "q352", "q170", "q17_", "q87")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sel = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.exists(n.contains) }
    sel.foreach { case (name, fn) =>
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val infos = spark.sparkContext.getRDDStorageInfo
      println(f"[blockaudit] $name%-34s rdds=${infos.length}%3d " +
        f"parts=${infos.map(_.numCachedPartitions).sum}%5d " +
        f"mem=${infos.map(_.memSize).sum / (1 << 20)}%5d MiB")
    }
    spark.stop()
  }
}
