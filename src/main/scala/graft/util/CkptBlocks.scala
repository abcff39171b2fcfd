package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Storage release for checkpointed DataFrames (round-18 verdict item:
  * eagerly checkpointed loop-invariant edge tables were never released —
  * `localCheckpoint` blocks lived until ContextCleaner GC and reliable
  * checkpoint files were never deleted, accumulating across a long
  * multi-query session like Verify's 352-query run).
  *
  * `Dataset.unpersist` only covers `persist()`-cached plans; a
  * checkpointed Dataset is backed by a LogicalRDD leaf whose RDD holds
  * the MEMORY_AND_DISK blocks (local checkpoint) or the checkpoint files
  * (reliable checkpoint). This helper walks the plan's leaves and drops
  * both. ONLY call it when the frame is dead: a local checkpoint has no
  * lineage to recompute from, so any later action on the released frame
  * fails loudly rather than recomputing.
  */
object CkptBlocks {

  /** Best-effort, non-blocking release of the blocks (and reliable
    * checkpoint files, when present) behind a checkpointed `df`. No-op
    * for plans without a LogicalRDD leaf. */
  def release(df: DataFrame): Unit =
    try {
      df.queryExecution.analyzed.collectLeaves().foreach {
        case lr: LogicalRDD =>
          val rdd = lr.rdd
          rdd.unpersist(blocking = false)
          // reliable checkpoint (cluster posture): drop the files too —
          // the checkpoint dir otherwise only empties on context stop
          rdd.getCheckpointFile.foreach { f =>
            try {
              val p = new org.apache.hadoop.fs.Path(f)
              p.getFileSystem(rdd.sparkContext.hadoopConfiguration)
                .delete(p, true)
            } catch { case scala.util.control.NonFatal(_) => () }
          }
        case _ => ()
      }
    } catch { case scala.util.control.NonFatal(_) => () }
}
