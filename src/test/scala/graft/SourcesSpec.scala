package graft

import graft.model.Quad
import graft.sources.{PagedSource, RdfIO}

/** Turtle writer (K3) and paginated page-pump source (S5/S7). */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("Turtle writer: prefix compaction, subject grouping, literals") {
    val quads = Seq(
      Quad("", "http://www.cidoc-crm.org/cidoc-crm/E21", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://www.w3.org/2002/07/owl#Class"),
      Quad("", "http://www.cidoc-crm.org/cidoc-crm/E21", "http://www.w3.org/2000/01/rdf-schema#label",
        "Person", oType = "literal", oLang = "en"))
    val dir = new java.io.File("target/tmp/turtle-out").getAbsolutePath
    RdfIO.writeTurtle(spark.createDataset(quads), dir)
    val header = spark.read.text(s"$dir/_prefixes").as[String].collect().mkString("\n")
    val body = spark.read.text(s"$dir/body").as[String].collect().mkString("\n")
    assert(header.contains("@prefix crm: <http://www.cidoc-crm.org/cidoc-crm/> ."))
    assert(body.contains("crm:E21"))
    assert(body.contains("rdf:type owl:Class"))
    assert(body.contains("rdfs:label \"Person\"@en"))
    assert(body.count(_ == '.') >= 1) // subject block terminated
  }

  test("page pump: drains until empty page, respects maxObjects") {
    val store = (0 until 25).map(i => s"""{"id": $i}""")
    def fetch(limit: Long)(offset: Long): Option[String] = {
      val page = store.slice(offset.toInt, (offset + limit).toInt)
      if (page.isEmpty) None else Some(page.mkString("\n"))
    }
    val all = PagedSource.readJsonPages(spark,
      PagedSource.drainPages(spark, fetch(10), limit = 10))
    assert(all.count() == 25)
    assert(all.agg(org.apache.spark.sql.functions.max("id")).collect()(0).getLong(0) == 24)

    val truncated = PagedSource.readJsonPages(spark,
      PagedSource.drainPages(spark, fetch(10), limit = 10, maxObjects = 20))
    assert(truncated.count() == 20)
  }

  test("WARC source: spec framing round-trips binary bodies, NULL " +
      "headers survive, file-per-partition, malformed input fails loudly") {
    import graft.sources.WarcIO
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("warc").toFile
    dir.deleteOnExit()
    // binary body with CRLFs and non-UTF8 bytes INSIDE the payload —
    // Content-Length framing must carry it through untouched
    val tricky = Array[Byte](87, 65, 13, 10, 13, 10, -1, 0, -128, 66)
    WarcIO.writeWarc(new java.io.File(dir, "a.warc").getPath, Seq(
      WarcIO.WarcRecord("warcinfo", "<urn:uuid:i0>", None,
        "2024-01-01T00:00:00Z", Some("application/warc-fields"),
        "x: y\r\n".getBytes("UTF-8")),
      WarcIO.WarcRecord("response", "<urn:uuid:r1>",
        Some("http://e/1"), "2024-01-01T00:00:00Z", Some("text/plain"),
        "hello warc".getBytes("UTF-8")),
      WarcIO.WarcRecord("response", "<urn:uuid:r2>",
        Some("http://e/2"), "2024-01-01T00:00:00Z", None, tricky)))
    WarcIO.writeWarc(new java.io.File(dir, "b.warc").getPath, Seq(
      WarcIO.WarcRecord("response", "<urn:uuid:r3>",
        Some("http://e/3"), "2024-01-02T00:00:00Z", Some("text/plain"),
        "second file".getBytes("UTF-8"))))
    val df = WarcIO.read(spark, dir.getAbsolutePath)
    assert(df.rdd.getNumPartitions == 2)
    val rows = df.collect().map(r => r.getString(0) -> r).toMap
    assert(rows.size == 4)
    assert(rows("<urn:uuid:i0>").getString(2) == null) // no Target-URI
    assert(rows("<urn:uuid:r2>").getString(4) == null) // no Content-Type
    assert(rows("<urn:uuid:r2>").getAs[Array[Byte]]("body").toSeq ==
      tricky.toSeq, "binary body must round-trip byte-exactly")
    assert(rows("<urn:uuid:r1>").getLong(5) == 10L)
    assert(df.filter(col("warc_type") === "response").count() == 3)
    // malformed: garbage where the version line should be
    val bad = new java.io.File(dir, "bad")
    bad.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(bad.getPath, "x.warc"),
      "NOT-A-WARC\r\n".getBytes("UTF-8"))
    val e = intercept[org.apache.spark.SparkException](
      WarcIO.read(spark, bad.getAbsolutePath).count())
    assert(e.getMessage.contains("malformed WARC") ||
      Option(e.getCause).exists(_.getMessage.contains("malformed WARC")))
    // a >2 GiB Content-Length cannot frame as one JVM byte[] — must
    // refuse explicitly, never truncate via toInt and mis-frame the file
    val big = new java.io.File(dir, "big")
    big.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(big.getPath, "x.warc"),
      ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "Content-Length: 2200000000\r\n\r\n").getBytes("UTF-8"))
    val e2 = intercept[org.apache.spark.SparkException](
      WarcIO.read(spark, big.getAbsolutePath).count())
    assert(e2.getMessage.contains("unsupported Content-Length") ||
      Option(e2.getCause).exists(
        _.getMessage.contains("unsupported Content-Length")))
  }

  test("WARC stream: each trigger picks up exactly the newly-landed " +
      "segment files") {
    import graft.sources.WarcIO
    val dir = java.nio.file.Files.createTempDirectory("warcstream").toFile
    dir.deleteOnExit()
    val ckpt = new java.io.File(dir, "_ckpt").getAbsolutePath
    def seg(i: Int, ids: Seq[Int]): Unit =
      WarcIO.writeWarc(new java.io.File(dir, f"segment-$i%03d.warc").getPath,
        ids.map(n => WarcIO.WarcRecord("response", s"<urn:uuid:r$n>",
          Some(s"http://e/$n"), "2024-01-01T00:00:00Z", Some("text/plain"),
          s"body $n".getBytes("UTF-8"))))
    seg(0, Seq(1, 2))
    val query = WarcIO.readStream(spark, dir.getAbsolutePath)
      .writeStream.format("memory").queryName("warc_stream")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      assert(spark.table("warc_stream").count() == 2)
      seg(1, Seq(3, 4, 5))
      query.processAllAvailable()
      val uris = spark.table("warc_stream")
        .select("target_uri").collect().map(_.getString(0)).toSet
      assert(uris == (1 to 5).map(n => s"http://e/$n").toSet,
        s"expected 5 records across two triggers, got $uris")
    } finally query.stop()
  }

  test("warcIngestSink: idempotent record-granular ingestion across " +
      "triggers (a re-presented record never re-appends)") {
    import graft.sources.WarcIO
    import graft.streaming.StreamOps
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("warcsink").toFile
    dir.deleteOnExit()
    val seg = new java.io.File(dir, "segs"); seg.mkdirs()
    val claims = new java.io.File(dir, "claims").getAbsolutePath
    val corpus = new java.io.File(dir, "corpus").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    def w(i: Int, ids: Seq[Int]): Unit =
      WarcIO.writeWarc(new java.io.File(seg, f"segment-$i%03d.warc").getPath,
        WarcIO.WarcRecord("warcinfo", s"<urn:uuid:i$i>", None,
          "2024-01-01T00:00:00Z", None, "x\r\n".getBytes("UTF-8")) +:
        ids.map(n => WarcIO.WarcRecord("response", s"<urn:uuid:r$n>",
          Some(s"http://e/$n"), "2024-01-01T00:00:00Z", Some("text/plain"),
          s"body $n".getBytes("UTF-8"))))
    w(0, Seq(1, 2))
    val query = StreamOps.warcIngestSink(
      WarcIO.readStream(spark, seg.getAbsolutePath), claims, corpus)(ckpt)
    try {
      query.processAllAvailable()
      // segment 1 RE-PRESENTS record 2 (a crawl retry) plus new records
      w(1, Seq(2, 3))
      query.processAllAvailable()
      val rows = spark.read.parquet(corpus)
        .select("record_id").collect().map(_.getString(0)).toSeq
      assert(rows.sorted == Seq("<urn:uuid:r1>", "<urn:uuid:r2>",
        "<urn:uuid:r3>"), s"got $rows")
      // warcinfo records never reach the corpus
      assert(!rows.exists(_.contains("uuid:i")))
      assert(spark.read.parquet(claims).count() == 3)
    } finally query.stop()
  }
}
