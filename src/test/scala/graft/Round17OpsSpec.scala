package graft

import org.apache.spark.sql.functions._

/** Round-17 coverage: the trained IVF coarse quantizer and its
  * consumers, the oversized-cell diversion for the bitext cell join,
  * size-guarded eval broadcasts, the size-routed bitext entry point,
  * and the q329 zero-yield guard. Every test EXECUTES a plan (the
  * round-13 lesson). */
class Round17OpsSpec extends SparkSpec {

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q329: a source whose every dup-group keeper lives in another " +
      "source reports null epochs/cap instead of Long.MaxValue") {
    val s2 = spark
    import s2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q329zero").toString
    // source b's only doc duplicates source a's keeper (same first-8
    // token prefix, smaller doc_id wins) -> kept_tokens(b) = 0
    Seq(
      (0L, "a", "x y z common prefix tokens here now"),
      (1L, "b", "x y z common prefix tokens here now"),
      (2L, "a", "another wholly distinct document body text")
    ).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.TextOps.q329EpochPlan(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.isNullAt(3), r.isNullAt(4))).toMap
    assert(out("b")._1 === 0L, "fixture must produce a zero-yield source")
    assert(out("b")._2 && out("b")._3,
      "zero kept_tokens must null epochs and over_epoch_cap, not " +
        "overflow to Long.MaxValue")
    assert(!out("a")._2 && !out("a")._3,
      "the live source keeps its real epoch figure")
    util.Fs.deleteRecursively(new java.io.File(dir))
  }
}
