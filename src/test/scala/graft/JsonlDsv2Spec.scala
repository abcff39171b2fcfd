package graft

import org.apache.spark.sql.functions._

/** DataSourceV2 write path: staged part files, atomic publish, no
  * staging leftovers, JSON escaping, schema validation. */
class JsonlDsv2Spec extends SparkSpec {
  import spark.implicits._

  private def freshDir() =
    new java.io.File("target/tmp/jsonl-" + System.nanoTime()).getAbsolutePath

  test("writes committed JSONL readable by spark.read.json") {
    val dir = freshDir()
    val df = Seq((1L, "alpha", 1.5), (2L, "beta \"q\"\n", -2.0), (3L, null, 0.0))
      .toDF("id", "name", "score")
    df.repartition(3).write.format("graft.sinks.JsonlSinkProvider")
      .option("path", dir).mode("append").save()

    assert(new java.io.File(dir, "_SUCCESS").exists())
    assert(!new java.io.File(dir, "_staging").exists(), "staging dir leaked")
    val back = spark.read.json(dir)
      .select($"id", $"name", $"score")
      .as[(Long, Option[String], Double)].collect().sortBy(_._1).toSeq
    assert(back == Seq((1L, Some("alpha"), 1.5), (2L, Some("beta \"q\"\n"), -2.0),
      (3L, None, 0.0)))
  }

  test("one part file per input partition") {
    val dir = freshDir()
    spark.range(100).select($"id", lit("x").as("v")).repartition(4)
      .write.format("graft.sinks.JsonlSinkProvider")
      .option("path", dir).mode("append").save()
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".jsonl"))
    assert(parts.length == 4)
    assert(spark.read.json(dir).count() == 100)
  }

  test("unsupported column type fails at write planning") {
    val dir = freshDir()
    val err = intercept[Exception] {
      Seq((1L, Seq(1.0, 2.0))).toDF("id", "vec")
        .write.format("graft.sinks.JsonlSinkProvider")
        .option("path", dir).mode("append").save()
    }
    assert(err.getMessage.contains("jsonl sink supports") ||
      Option(err.getCause).exists(_.getMessage.contains("jsonl sink supports")))
  }
}
