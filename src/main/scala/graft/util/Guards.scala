package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Loud contract guards shared by the eval-side broadcast queries.
  *
  * The canary scan (q326), the semantic eval-proximity release gate
  * (q334), and the IVF proximity screen (q335) all BROADCAST a frame
  * that is "the eval set" — benchmark-sized by contract, but at the
  * test SFs it is constructed as a corpus split (doc_id % 31), so
  * nothing structural stops a caller from pointing the same plan at a
  * corpus-sized frame and OOMing every executor at 100 TB. The round-16
  * verdict named the convention-without-a-guard as the gap; this is
  * the guard (the StreamOps state-schema precedent: contracts fail
  * loudly, they are not comments). */
object Guards {

  /** Row bound for an eval-set broadcast: far above any real benchmark
    * (1M rows) and far below a corpus. */
  val EvalBroadcastRows: Long = 1000000L

  /** Count the frame (one bounded-column scan — the price of the
    * contract) and return the broadcast hint only if it is genuinely
    * eval-sized; otherwise fail naming the contract and the re-route. */
  def boundedBroadcast(df: DataFrame, bound: Long, contract: String): DataFrame = {
    val n = df.count()
    require(n <= bound,
      s"$contract: the frame staged for broadcast has $n rows, over the " +
        s"$bound-row eval-set bound. This side is benchmark-sized by " +
        "contract — a corpus-sized broadcast here would OOM every " +
        "executor at scale; shrink the eval set or re-route through " +
        "the cell-local screen (q335) / IVF cell join (q320).")
    broadcast(df)
  }
}
