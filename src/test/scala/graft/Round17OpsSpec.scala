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

  test("ivfK: the coarse-quantizer width follows clamp(sqrt(N), 8, 64)") {
    assert(operators.VectorOps.ivfK(10) === 8)
    assert(operators.VectorOps.ivfK(500) === 22)
    assert(operators.VectorOps.ivfK(2000) === 45)
    assert(operators.VectorOps.ivfK(10000000) === 64)
  }

  test("trainCentroids: deterministic, locks onto cluster structure, " +
      "and assignCells matches an in-memory argmax over the trained " +
      "centroids") {
    val s2 = spark
    import s2.implicits._
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 3 well-separated direction clusters (60 vectors -> k = 8)
    def mk(cluster: Int, j: Int): Seq[Double] =
      (0 until 64).map(i =>
        (if (i % 3 == cluster) 5.0 else 0.1) + 0.01 * math.sin(j * 64 + i))
    val rows = (0 until 60).map(j => (j.toLong, mk(j % 3, j)))
    val e = rows.toDF("vec_id", "v")
    graft.functions.CosineSimilarity.register(spark)
    val c1 = operators.VectorOps.trainCentroids(e)
    val c2 = operators.VectorOps.trainCentroids(e)
    assert(c1.toSeq.map { case (id, v) => (id, v.toList) } ===
      c2.toSeq.map { case (id, v) => (id, v.toList) },
      "training must be deterministic")
    assert(c1.length === 8)
    val assigned = operators.VectorOps.assignCells(e, c1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // in-memory argmax over the trained centroids (6dp cosine, smallest
    // cent_id tie) must reproduce the zero-shuffle literal plan
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.iterator.map(x => x * x).sum)
      val nb = math.sqrt(b.iterator.map(x => x * x).sum)
      r6(dot / (na * nb))
    }
    val vm = rows.toMap
    rows.foreach { case (id, v) =>
      val want = c1.map { case (cid, cv) => (cid, cos(v, cv)) }
        .minBy { case (cid, c) => (-c, cid) }._1
      assert(assigned(id) === want, s"vec $id assigned off-argmax")
    }
    // training locks onto the 3 planted clusters: no cell mixes clusters
    val byCell = rows.groupBy { case (id, _) => assigned(id) }
    byCell.foreach { case (cell, ms) =>
      val clusters = ms.map { case (id, _) => id % 3 }.distinct
      assert(clusters.length === 1,
        s"cell $cell mixes planted clusters $clusters")
    }
    assert(vm.size === 60)
  }
}
