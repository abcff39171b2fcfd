package graft

import org.apache.spark.sql.functions._
import graft.plans.Merge

/** MERGE semantics ([[graft.plans.Merge]]) and the KMV sketch estimator. */
class MergeKmvSpec extends SparkSpec {
  import spark.implicits._

  test("merge: matched updates, source-only inserts, target-only passthrough") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "bal")
    val source = Seq((2L, 99.0), (3L, 30.0)).toDF("k", "upd")
    val merged = Merge.merge(target, source, Seq("k"))(
      "k"    -> coalesce($"t.k", $"s.k"),
      "name" -> coalesce($"t.name", lit("NEW")),
      "bal"  -> coalesce($"s.upd", $"t.bal"))
    val rows = merged.as[(Long, String, Double)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "a", 10.0), (2L, "b", 99.0), (3L, "NEW", 30.0)))
  }

  test("merge upsert helper keeps target schema, source wins on match") {
    val target = Seq((1L, "old"), (2L, "keep")).toDF("k", "v")
    val source = Seq((1L, "new"), (9L, "ins")).toDF("k", "v")
    val rows = Merge.upsert(target, source, Seq("k"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "new"), (2L, "keep"), (9L, "ins")))
  }

  test("KMV estimate is exact below k and within 20% above k") {
    val df = spark.range(2000).select(col("id"), lit("g").as("g"))
    val k = 64
    val est = df.groupBy($"g")
      .agg(graft.functions.BottomK.bottomK(md5($"id".cast("string")), k).as("lows"))
      .select(graft.functions.BottomK.kmvEstimate($"lows", k).as("est"))
      .as[Double].head()
    assert(math.abs(est - 2000.0) / 2000.0 < 0.20, s"KMV estimate $est too far from 2000")

    val small = spark.range(10).select(lit("g").as("g"), md5(col("id").cast("string")).as("h"))
      .groupBy($"g").agg(graft.functions.BottomK.bottomK($"h", k).as("lows"))
      .select(size($"lows")).as[Int].head()
    assert(small == 10)
  }

  test("mergeCow rewrites only touched partitions, source wins per key") {
    val path = new java.io.File("target/tmp/cow-" + System.nanoTime()).getAbsolutePath
    def snap(rows: Seq[(Long, String, String)]) = rows.toDF("k", "part", "v")
    // Seed: two partitions.
    graft.sinks.Sinks.mergeCow(spark, path,
      snap(Seq((1L, "a", "v1"), (2L, "a", "v2"), (3L, "b", "v3"))),
      Seq("k"), "part")
    val filesB0 = new java.io.File(path, "part=b").listFiles().map(_.getName).toSet
    // Merge a delta touching only partition a: update k=1, insert k=9.
    graft.sinks.Sinks.mergeCow(spark, path,
      snap(Seq((1L, "a", "v1x"), (9L, "a", "v9"))), Seq("k"), "part")
    val out = spark.read.parquet(path).select($"k", $"part", $"v")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "a", "v1x"), (2L, "a", "v2"), (3L, "b", "v3"),
      (9L, "a", "v9")))
    // Partition b untouched: same files as after the seed write.
    val filesB1 = new java.io.File(path, "part=b").listFiles().map(_.getName).toSet
    assert(filesB0 == filesB1, "untouched partition was rewritten")
  }

  test("mergeCow is idempotent: re-applying the same delta is a no-op") {
    val path = new java.io.File("target/tmp/cow-" + System.nanoTime()).getAbsolutePath
    def snap(rows: Seq[(Long, String, String)]) = rows.toDF("k", "part", "v")
    graft.sinks.Sinks.mergeCow(spark, path,
      snap(Seq((1L, "a", "v1"), (3L, "b", "v3"))), Seq("k"), "part")
    val delta = snap(Seq((1L, "a", "v1x")))
    graft.sinks.Sinks.mergeCow(spark, path, delta, Seq("k"), "part")
    graft.sinks.Sinks.mergeCow(spark, path, delta, Seq("k"), "part")
    val out = spark.read.parquet(path).select($"k", $"part", $"v")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "a", "v1x"), (3L, "b", "v3")))
  }

  test("approx sketch stats stay within tolerance of their exact twins") {
    val rows = graft.operators.TextOps.q81ApproxStats(spark, "/root/testdata/sf0.001")
      .as[(String, Double, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, kmvN, exactN, sampleP50, exactP50) =>
      // sanity bounds, not tightness: KMV k=64 has ~13% relative standard
      // error, and at sf0.001 the smallest language stratum leaves the
      // 25% hash-sample median only a handful of points
      assert(math.abs(kmvN - exactN) / exactN < 0.4,
        s"$lang: KMV estimate $kmvN too far from $exactN")
      assert(math.abs(sampleP50 - exactP50) / exactP50 < 0.4,
        s"$lang: sampled p50 $sampleP50 too far from $exactP50")
    }
  }

  test("pivot with explicit values matches conditional aggregation") {
    val df = Seq(("A", "F"), ("A", "F"), ("A", "O"), ("B", "O"))
      .toDF("flag", "status")
    val wide = df.groupBy($"flag").pivot("status", Seq("F", "O")).agg(count(lit(1)))
      .select($"flag", coalesce($"F", lit(0L)).as("f"), coalesce($"O", lit(0L)).as("o"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(wide.toSeq == Seq(("A", 2L, 1L), ("B", 0L, 1L)))
  }
}
