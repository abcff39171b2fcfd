package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, concat_ws, md5, min, slice, split}
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

/** Structured Streaming semantics: watermarked windows and stateful
  * sessionization, driven through MemoryStream micro-batches. */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private def ev(id: Long, user: Long, offsetMin: Long): Event =
    Event(id, new Timestamp(t0 + offsetMin * 60000L), user, "click", 1.0)

  test("sessionize: gap split + event-time timeout close") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = StreamOps.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    // Batch 1: user 1 — two events 10 min apart (one session), then one
    // 60 min later (gap > 30 min → closes session 1 immediately).
    input.addData(ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 70))
    query.processAllAvailable()

    // Batch 2+3: user 2 far in the future advances the watermark past
    // user 1's (lastSeen + gap), so session 2 closes by timeout.
    input.addData(ev(4, 2, 600))
    query.processAllAvailable()
    input.addData(ev(5, 2, 601))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("sessions")
      .as[StreamOps.SessionOut].collect().sortBy(_.session_start.getTime)
    val u1 = rows.filter(_.user_id == 1L)
    assert(u1.length == 2, s"expected both user-1 sessions closed, got ${rows.mkString(", ")}")
    assert(u1(0).n_events == 2 && u1(0).duration_sec == 600.0)
    assert(u1(1).n_events == 1 && u1(1).duration_sec == 0.0)
    // user 2's session is still open — nothing emitted for it.
    assert(!rows.exists(_.user_id == 2L))
  }

  test("stratified sample stream admits exactly the batch sampler's rows") {
    implicit val sqlCtx = spark.sqlContext
    val rates = Map("src0" -> 50, "src1" -> 20)
    val docs = (0L until 200L).map(i => (i, s"src${i % 3}"))
    val input = MemoryStream[(Long, String)]
    val query = StreamOps.stratifiedSampleStream(
        input.toDS().toDF("doc_id", "source"), rates)
      .writeStream.format("memory").queryName("strat_sample")
      .outputMode("append").start()
    // arrival order must not matter: feed two shuffled halves
    val (h1, h2) = scala.util.Random.shuffle(docs).splitAt(100)
    input.addData(h1); query.processAllAvailable()
    input.addData(h2); query.processAllAvailable()
    query.stop()
    val streamed = spark.table("strat_sample")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = StreamOps.stratifiedSampleStream(
        docs.toDF("doc_id", "source"), rates)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batch && streamed.nonEmpty)
    // and the admitted share per source tracks its configured rate
    val bySrc = streamed.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc.getOrElse("src0", 0) > bySrc.getOrElse("src2", 0))
  }

  test("foreachBatch upsert sink: last write wins across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val store = new java.io.File("target/tmp/upsert-store").getAbsolutePath
    val ckpt = new java.io.File("target/tmp/upsert-ckpt-" + System.nanoTime()).getAbsolutePath
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(store))
    val input = MemoryStream[Event]
    val query = StreamOps.upsertSink(input.toDF(), store, "user_id", "ts")(ckpt)
    input.addData(ev(1, 1, 0), ev(2, 2, 1))
    query.processAllAvailable()
    input.addData(ev(3, 1, 5)) // newer event for user 1 → overwrites
    query.processAllAvailable()
    query.stop()
    val rows = spark.read.parquet(store)
      .select("user_id", "event_id").as[(Long, Long)].collect().toMap
    assert(rows == Map(1L -> 3L, 2L -> 2L))
  }

  test("stream-stream interval join attributes purchases to recent clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val query = StreamOps.clickToPurchase(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    // user 1: click at t0, purchase 30 min later → joins.
    // user 2: click at t0, purchase 3 h later → outside the interval.
    // user 3: purchase BEFORE the click → must not attribute.
    clicks.addData(ev(10, 1, 0), ev(20, 2, 0), ev(30, 3, 60))
    purchases.addData(ev(11, 1, 30), ev(21, 2, 180), ev(31, 3, 0))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("attributed")
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(rows == Set((11L, 10L)))
  }

  test("clickAttributionOuter: unmatched clicks emit NULL-extended rows " +
      "once the watermark passes, and the union equals the batch left join") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val query = StreamOps.clickAttributionOuter(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attributed_outer")
      .outputMode("append").start()
    // user 1 matches in range; user 2's purchase is 3 h late (outside);
    // user 3's purchase precedes the click; user 4 never purchases.
    clicks.addData(ev(10, 1, 0), ev(20, 2, 0), ev(30, 3, 60), ev(40, 4, 0))
    purchases.addData(ev(11, 1, 30), ev(21, 2, 180), ev(31, 3, 0))
    query.processAllAvailable()
    // nothing unmatched may emit yet — the watermark hasn't proven absence
    val early = spark.table("attributed_outer")
      .filter(col("purchase_id").isNull).count()
    assert(early == 0L)
    // advance both watermarks far past every click's join range
    clicks.addData(ev(90, 9, 600)); purchases.addData(ev(91, 9, 600))
    query.processAllAvailable()
    query.stop()
    val got = spark.table("attributed_outer")
      .filter(col("click_id") =!= 90L) // drop the sentinel's own row
      .select(col("click_id"), col("purchase_id"))
      .as[(Long, Option[Long])].collect().toSet
    assert(got == Set((10L, Some(11L)), (20L, None), (30L, None), (40L, None)))
  }

  test("streaming dedup within watermark drops re-delivered events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = input.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    input.addData(ev(1, 1, 0), ev(1, 1, 0), ev(2, 1, 5)) // dup in-batch
    query.processAllAvailable()
    input.addData(ev(2, 1, 5)) // re-delivery in a later batch, same id
    query.processAllAvailable()
    query.stop()
    val ids = spark.table("deduped").select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L))
  }

  test("windowed KMV distinct-user sketch is exact below k") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = StreamOps.hourlyDistinctUsers(input.toDF())
      .writeStream.format("memory").queryName("kmv_users")
      .outputMode("append").start()
    // Hour 0: users 1,2,3 (user 1 twice); far-future event closes it.
    input.addData(ev(1, 1, 5), ev(2, 2, 10), ev(3, 3, 20), ev(4, 1, 30))
    query.processAllAvailable()
    input.addData(ev(5, 9, 600))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("kmv_users")
      .select($"hour_start", $"est_users").as[(Timestamp, Double)]
      .collect().toMap
    assert(rows(new Timestamp(t0)) == 3.0)
  }

  test("stream-static join enriches events with the dimension table") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "AT"), (2L, "DE")).toDF("user_id", "country")
    val input = MemoryStream[Event]
    val query = StreamOps.enrichWithDimension(input.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    input.addData(ev(1, 1, 0), ev(2, 2, 1), ev(3, 7, 2)) // user 7: no dim row
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("enriched")
      .select($"event_id", $"country").as[(Long, Option[String])]
      .collect().toMap
    assert(rows == Map(1L -> Some("AT"), 2L -> Some("DE"), 3L -> None))
  }

  test("eventsStream file-backed replay matches Tables.events batch read") {
    import org.apache.spark.sql.functions.{sum, col, expr}
    val dir = "/root/testdata/sf0.001"
    val query = StreamOps.eventsStream(spark, dir)
      .writeStream.format("memory").queryName("events_replay")
      .outputMode("append").start()
    query.processAllAvailable()
    query.stop()
    val streamed = spark.table("events_replay")
    val batch = Tables.events(spark, dir)
    assert(streamed.columns.sorted.toSeq == batch.columns.sorted.toSeq)
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(
        expr("bit_xor(xxhash64(event_id, ts_ns, unix_micros(ts)))"),
        sum(col("event_id"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    assert(streamed.count() == batch.count())
    assert(sig(streamed) == sig(batch))
  }

  test("hourly window counts under watermark match batch grouping") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = StreamOps.hourlyWindowCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()
    // Two events in hour 0, one in hour 1; a far-future event closes both
    // windows past the 2h watermark.
    input.addData(ev(1, 1, 5), ev(2, 2, 25), ev(3, 1, 65))
    query.processAllAvailable()
    input.addData(ev(4, 3, 600))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("hourly")
      .select("hour_start", "n").as[(Timestamp, Long)].collect().toMap
    assert(rows(new Timestamp(t0)) == 2L)
    assert(rows(new Timestamp(t0 + 3600000L)) == 1L)
  }

  test("dedupStream: first arrival per content key wins inside the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val query = StreamOps.dedupStream(docs)
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    val textA = "alpha beta gamma delta epsilon zeta eta theta extra words"
    val textB = "one two three four five six seven eight different tail"
    // Batch 1: A admitted; a same-batch copy of A (longer tail, same
    // 8-token key) dropped; B admitted.
    input.addData(
      (1L, new Timestamp(t0), textA),
      (2L, new Timestamp(t0 + 60000L), textA + " trailing junk"),
      (3L, new Timestamp(t0 + 120000L), textB))
    query.processAllAvailable()
    // Batch 2: a cross-batch copy of B arrives 10 min later — still
    // inside the 1h horizon, so the state store remembers its key.
    input.addData((4L, new Timestamp(t0 + 600000L), textB))
    query.processAllAvailable()
    query.stop()
    val admitted = spark.table("dedup_stream")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 3L))
    // Parity with the batch q33 semantics on the same rows: one survivor
    // per key, and (with arrival order = id order) the same survivor ids.
    val batchKeys = Seq((1L, textA), (2L, textA + " trailing junk"),
        (3L, textB), (4L, textB))
      .toDF("doc_id", "text")
      .withColumn("dup_key",
        md5(concat_ws(" ", slice(split(col("text"), " "), 1, 8))))
      .groupBy("dup_key").agg(min("doc_id").as("keep_id"))
      .select("keep_id").as[Long].collect().toSet
    assert(batchKeys == admitted)
  }

  test("decontaminateSink drops exactly the docs the batch q201 flags " +
      "with exact hits") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("decon").toFile
    val cleanPath = new java.io.File(dir, "clean").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    try {
      val sfDir = "/root/testdata/sf0.001"
      // static artifacts: the same eval gram set q201 derives
      val evalGrams = graft.Tables.documents(spark, sfDir)
        .filter(col("doc_id") < 20)
        .withColumn("toks", split(col("text"), " "))
        .select(explode(expr(graft.operators.TextOps.fiveGrams)).as("g"))
        .distinct().localCheckpoint()
      val input = MemoryStream[(Long, String)]
      val docs = input.toDF().toDF("doc_id", "text")
      val query = StreamOps.decontaminateSink(docs, evalGrams, cleanPath)(ckpt)
      // replay the train half (doc_id >= 20) in two micro-batches
      val train = graft.Tables.documents(spark, sfDir)
        .filter(col("doc_id") >= 20).select("doc_id", "text")
        .as[(Long, String)].collect()
      val (b1, b2) = train.splitAt(train.length / 2)
      input.addData(b1.toSeq); query.processAllAvailable()
      input.addData(b2.toSeq); query.processAllAvailable()
      query.stop()
      val kept = spark.read.parquet(cleanPath)
        .select("doc_id").as[Long].collect().toSet
      val flagged = graft.operators.TextOps
        .q201BloomDecontaminate(spark, sfDir)
        .filter(col("n_hits") >= 1)
        .select("doc_id").as[Long].collect().toSet
      assert(flagged.nonEmpty, "fixture should contaminate something")
      assert(kept == train.map(_._1).toSet -- flagged,
        s"stream/batch divergence: missing=${train.map(_._1).toSet -- flagged -- kept} " +
          s"extra=${kept.intersect(flagged)}")
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  test("canaryGateSink drops exactly the docs the batch q326 canary " +
      "scan flags, independent of micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("canary").toFile
    val cleanPath = new java.io.File(dir, "clean").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    try {
      val sfDir = "/root/testdata/sf0.001"
      // static artifact: the same canary set q326 derives
      val canaries = graft.operators.TextOps.canarySet(
        graft.Tables.documents(spark, sfDir)
          .withColumn("toks", split(col("text"), " ")))
        .localCheckpoint()
      val input = MemoryStream[(Long, String)]
      val docs = input.toDF().toDF("doc_id", "text")
      val query = StreamOps.canaryGateSink(docs, canaries, cleanPath)(ckpt)
      val all = graft.Tables.documents(spark, sfDir)
        .select("doc_id", "text").as[(Long, String)].collect()
      val (b1, rest) = all.splitAt(all.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      input.addData(b1.toSeq); query.processAllAvailable()
      input.addData(b2.toSeq); query.processAllAvailable()
      input.addData(b3.toSeq); query.processAllAvailable()
      query.stop()
      val kept = spark.read.parquet(cleanPath)
        .select("doc_id").as[Long].collect().toSet
      // batch truth: docs carrying any canary as a token run (self-hits
      // excluded) — re-derived from raw rows, not from the sink's code
      val canaryList = canaries.collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val flagged = all.collect {
        case (id, text)
            if canaryList.exists { case (evalId, c) =>
              id != evalId &&
                text.split(" ").sliding(4).exists(_.mkString(" ") == c)
            } => id
      }.toSet
      assert(flagged.nonEmpty, "fixture should plant at least one hit")
      assert(kept == all.map(_._1).toSet -- flagged,
        s"stream/batch divergence: extra=${kept.intersect(flagged)} " +
          s"missing=${all.map(_._1).toSet -- flagged -- kept}")
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  test("heavyHittersSink: merged MG state's guaranteed set is a subset " +
      "and its candidate set a superset of q228's exact heavy hitters") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("hhsink").toFile
    val statePath = new java.io.File(dir, "state").getAbsolutePath
    val reportPath = new java.io.File(dir, "report").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    try {
      val sfDir = "/root/testdata/sf0.001"
      val fixture = graft.Tables.documents(spark, sfDir)
        .select(explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
        .as[String].collect()
      val input = MemoryStream[String]
      val query = StreamOps.heavyHittersSink(
        input.toDF().toDF("term"), statePath, reportPath)(ckpt)
      val (b1, rest) = fixture.splitAt(fixture.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      input.addData(b1.toSeq); query.processAllAvailable()
      input.addData(b2.toSeq); query.processAllAvailable()
      input.addData(b3.toSeq); query.processAllAvailable()
      query.stop()
      // exact truth over the same rows
      val n = fixture.length
      val exactCounts = fixture.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val trueHeavy = exactCounts.filter { case (_, c) => c > n / 50.0 }.keySet
      // n/err/batch_id ride in the state parquet itself (single atomic
      // swap — no separate _meta sibling to race against)
      val meta = spark.read.parquet(statePath)
        .select("n", "err").limit(1).collect()(0)
      assert(meta.getLong(0) == n.toLong) // exact running total
      val err = meta.getLong(1)
      val report = spark.read.parquet(reportPath)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      val candidates = report.map(_._1).toSet
      val guaranteed = report.filter(_._3).map(_._1).toSet
      assert(guaranteed.subsetOf(trueHeavy),
        s"guaranteed over-claims: ${guaranteed -- trueHeavy}")
      assert(trueHeavy.subsetOf(candidates),
        s"candidates miss true heavy hitters: ${trueHeavy -- candidates}")
      // every stored counter undercounts truth by at most err
      report.foreach { case (term, c, _) =>
        val truth = exactCounts.getOrElse(term, 0L)
        assert(c <= truth && truth <= c + err, s"$term c=$c truth=$truth err=$err")
      }
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  test("klDriftSink: the running-count report after N micro-batches " +
      "equals q194's batch grid over the same rows") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("kldrift").toFile
    val statePath = new java.io.File(dir, "state").getAbsolutePath
    val reportPath = new java.io.File(dir, "report").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    try {
      val sfDir = "/root/testdata/sf0.001"
      val fixture = graft.Tables.documents(spark, sfDir)
        .select("doc_id", "source", "text")
        .as[(Long, String, String)].collect()
      val input = MemoryStream[(Long, String, String)]
      val docs = input.toDF().toDF("doc_id", "source", "text")
      val query = StreamOps.klDriftSink(docs, statePath, reportPath)(ckpt)
      // three uneven micro-batches — merges must be order/shape blind
      val (b1, rest) = fixture.splitAt(fixture.length / 5)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      input.addData(b1.toSeq); query.processAllAvailable()
      input.addData(b2.toSeq); query.processAllAvailable()
      input.addData(b3.toSeq); query.processAllAvailable()
      query.stop()
      val streamed = spark.read.parquet(reportPath)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val batch = graft.operators.TextOps.q194SourceKlDrift(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(batch.nonEmpty && streamed == batch,
        s"stream/batch drift grids diverge:\n stream=$streamed\n batch=$batch")
      // and the mid-stream state really is count partials: report
      // regenerates from state alone (guard columns stripped — the
      // all-null sentinel row and batch_id are replay bookkeeping)
      val state = spark.read.parquet(statePath)
        .filter(!col("is_sentinel")).drop("batch_id", "is_sentinel", "ckpt")
      val regen = graft.operators.TextOps.klFromCounts(
          state.select(col("source")).distinct(), state)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(regen == batch)
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  test("anomalySink: the report after N micro-batches equals q257's batch " +
      "anomalies over the same events") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("anomaly").toFile
    val statePath = new java.io.File(dir, "state").getAbsolutePath
    val reportPath = new java.io.File(dir, "report").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    try {
      val sfDir = "/root/testdata/sf0.001"
      val fixture = graft.Tables.events(spark, sfDir)
        .select(col("event_type"), col("ts"))
        .as[(String, Timestamp)].collect()
      val input = MemoryStream[(String, Timestamp)]
      val events = input.toDF().toDF("event_type", "ts")
      val query = StreamOps.anomalySink(events, statePath, reportPath)(ckpt)
      // three uneven micro-batches that SPLIT days across triggers — the
      // state merge must re-sum partial day counts correctly
      val (b1, rest) = fixture.splitAt(fixture.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 4)
      input.addData(b1.toSeq); query.processAllAvailable()
      input.addData(b2.toSeq); query.processAllAvailable()
      input.addData(b3.toSeq); query.processAllAvailable()
      query.stop()
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getBoolean(6))
      val streamed = spark.read.parquet(reportPath).collect().map(key).toSet
      val batch = graft.operators.Events.q257RollingAnomaly(spark, sfDir)
        .collect().map(key).toSet
      assert(batch.nonEmpty && streamed == batch)
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  test("cdcAdmitSink: an embedded already-seen passage rejects the doc " +
      "even when every doc-level key differs") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdcadmit").toFile
    val claims = new java.io.File(dir, "claims").getAbsolutePath
    val outPath = new java.io.File(dir, "admitted").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    try {
      val input = MemoryStream[(Long, String)]
      val docs = input.toDF().toDF("doc_id", "text")
      // a long passage (~150 tokens → several CDC chunks)
      val passage = (0 until 150).map(i => s"p${i % 41}word$i").mkString(" ")
      val query = StreamOps.cdcAdmitSink(docs, claims, outPath, 2)(ckpt)
      input.addData((1L, passage))
      query.processAllAvailable()
      // batch 2: doc 3 EMBEDS the passage between fresh prefix/suffix —
      // its content key, shingles, and band buckets all differ from
      // doc 1, but its interior CDC chunks re-align; doc 4 is fresh
      val embedded = "fresh prefix words here " + passage + " and a fresh tail"
      val fresh = (0 until 80).map(i => s"f${i % 13}tok$i").mkString(" ")
      input.addData((3L, embedded), (4L, fresh))
      query.processAllAvailable()
      query.stop()
      val admitted = spark.read.parquet(outPath)
        .select("doc_id").as[Long].collect().toSet
      assert(admitted == Set(1L, 4L),
        s"expected embedded-copy doc 3 rejected, got $admitted")
      val claimed = spark.read.parquet(claims)
        .select("doc_id").distinct().as[Long].collect().toSet
      assert(claimed == Set(1L, 4L))
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  test("nearDupAdmitSink: claims index rejects exact and near copies across batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("neardup").toFile
    val claims = new java.io.File(dir, "claims").getAbsolutePath
    val outPath = new java.io.File(dir, "admitted").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    try {
      val input = MemoryStream[(Long, String)]
      val docs = input.toDF().toDF("doc_id", "text")
      // >= 3 tokens so the shingle pipeline produces signatures
      val textA = ("alpha beta gamma delta epsilon zeta eta theta " * 4).trim
      val textB = ("one two three four five six seven eight nine " * 4).trim
      val query = StreamOps.nearDupAdmitSink(docs, claims, outPath)(ckpt)
      input.addData((1L, textA), (2L, textB))
      query.processAllAvailable()
      // batch 2: an exact copy of A, a near copy of B (one APPENDED token
      // adds a single shingle; with this fixed text the deterministic
      // signature keeps shared lanes, so a band hit fires), and a fresh doc
      val textC = "completely different words about spark plans and shuffles " +
        "joins scans rows columns buckets partitions stages tasks codegen"
      input.addData(
        (3L, textA),
        (4L, textB + " tail"),
        (5L, textC))
      query.processAllAvailable()
      query.stop()
      val admitted = spark.read.parquet(outPath)
        .select("doc_id").as[Long].collect().toSet
      assert(admitted == Set(1L, 2L, 5L),
        s"expected exact copy 3 and near copy 4 rejected, got $admitted")
      // the claims index holds exactly the admitted docs' bands
      val claimed = spark.read.parquet(claims)
        .select("doc_id").distinct().as[Long].collect().toSet
      assert(claimed == Set(1L, 2L, 5L))
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  test("frontierSink admits one URL per canonical form within and " +
      "across batches (q220 parity at the stream boundary)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("frontier").toFile
    val claims = new java.io.File(dir, "claims").getAbsolutePath
    val accepted = new java.io.File(dir, "accepted").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    try {
      val input = MemoryStream[(Long, String)]
      val urls = input.toDF().toDF("doc_id", "url")
      val query = StreamOps.frontierSink(urls, claims, accepted)(ckpt)
      // batch 1: two spellings of ONE canonical + a distinct page
      input.addData(
        (1L, "HTTP://Example.COM:80/a?b=2&a=1#frag"),
        (2L, "http://example.com/a?a=1&b=2"),
        (3L, "https://example.com/other"))
      query.processAllAvailable()
      // batch 2: yet another spelling of the same page (rejected via the
      // claims store), plus a genuinely new one
      input.addData(
        (4L, "http://EXAMPLE.com/a?a=1&b=2"),
        (5L, "https://example.com/new"))
      query.processAllAvailable()
      query.stop()
      val got = spark.read.parquet(accepted)
        .select("doc_id", "canonical").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set(
        (1L, "http://example.com/a?a=1&b=2"),
        (3L, "https://example.com/other"),
        (5L, "https://example.com/new")),
        s"frontier admitted $got")
      // claims store carries exactly the admitted canonicals
      val claimed = spark.read.parquet(claims)
        .select("canonical").as[String].collect().toSet
      assert(claimed == got.map(_._2))
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  test("hllSink: the estimate after N micro-batches equals batch q267 " +
      "over the same rows — and replayed batches cannot corrupt the state") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("hllsink").toFile
    val statePath = new java.io.File(dir, "state").getAbsolutePath
    val reportPath = new java.io.File(dir, "report").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    try {
      val sfDir = "/root/testdata/sf0.001"
      val fixture = graft.Tables.documents(spark, sfDir)
        .select("lang", "text").as[(String, String)].collect()
      val input = MemoryStream[(String, String)]
      val docs = input.toDF().toDF("lang", "text")
      val query = StreamOps.hllSink(docs, statePath, reportPath)(ckpt)
      val (b1, rest) = fixture.splitAt(fixture.length / 5)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      input.addData(b1.toSeq); query.processAllAvailable()
      input.addData(b2.toSeq); query.processAllAvailable()
      input.addData(b3.toSeq); query.processAllAvailable()
      // idempotence: replay an entire earlier batch — max-merge must
      // leave the register table (and so the report) unchanged
      input.addData(b2.toSeq); query.processAllAvailable()
      query.stop()
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getDouble(1), r.getLong(2))
      val streamed = spark.read.parquet(reportPath)
        .select("lang", "hll_texts", "n_zero_regs").collect().map(key).toSet
      val batch = graft.operators.TextOps.q267HllSketch(spark, sfDir)
        .select("lang", "hll_texts", "n_zero_regs").collect().map(key).toSet
      assert(batch.nonEmpty && streamed == batch,
        s"stream=$streamed\n batch=$batch")
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  test("decayedCountsSink: the decayed report after N micro-batches equals " +
      "batch q283 over the same events — including mid-stream re-anchoring") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("decayed").toFile
    val statePath = new java.io.File(dir, "state").getAbsolutePath
    val reportPath = new java.io.File(dir, "report").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    try {
      val sfDir = "/root/testdata/sf0.001"
      // feed OLDEST first so later batches move the anchor forward and
      // the state-side re-anchoring really exercises
      val fixture = graft.Tables.events(spark, sfDir)
        .select(col("event_type"), col("ts")).orderBy(col("ts"))
        .as[(String, Timestamp)].collect()
      val input = MemoryStream[(String, Timestamp)]
      val events = input.toDF().toDF("event_type", "ts")
      val query = StreamOps.decayedCountsSink(events, statePath, reportPath)(ckpt)
      val (b1, rest) = fixture.splitAt(fixture.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      input.addData(b1.toSeq); query.processAllAvailable()
      input.addData(b2.toSeq); query.processAllAvailable()
      input.addData(b3.toSeq); query.processAllAvailable()
      query.stop()
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val streamed = spark.read.parquet(reportPath)
        .select("event_type", "n_events", "decayed_micro", "decayed")
        .collect().map(key).toSet
      val batch = graft.operators.Events.q283DecayedCounts(spark, sfDir)
        .select("event_type", "n_events", "decayed_micro", "decayed")
        .collect().map(key).toSet
      assert(batch.nonEmpty && streamed == batch)
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  test("histSink: the quantile report after N micro-batches equals batch " +
      "q274's sketch columns over the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("histsink").toFile
    val statePath = new java.io.File(dir, "state").getAbsolutePath
    val reportPath = new java.io.File(dir, "report").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    try {
      val sfDir = "/root/testdata/sf0.001"
      val fixture = graft.Tables.documents(spark, sfDir)
        .select("lang", "n_chars").as[(String, Long)].collect()
      val input = MemoryStream[(String, Long)]
      val docs = input.toDF().toDF("lang", "n_chars")
      val query = StreamOps.histSink(docs, statePath, reportPath)(ckpt)
      val (b1, rest) = fixture.splitAt(fixture.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      input.addData(b1.toSeq); query.processAllAvailable()
      input.addData(b2.toSeq); query.processAllAvailable()
      input.addData(b3.toSeq); query.processAllAvailable()
      query.stop()
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val streamed = spark.read.parquet(reportPath)
        .select("lang", "n_docs", "hist_p50", "hist_p90")
        .collect().map(key).toSet
      val batch = graft.operators.TextOps.q274HistogramQuantiles(spark, sfDir)
        .select("lang", "n_docs", "hist_p50", "hist_p90")
        .collect().map(key).toSet
      assert(batch.nonEmpty && streamed == batch)
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  test("cmsSink: probing the merged counters reproduces batch q268 exactly " +
      "(CMS linearity across micro-batches)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cmssink").toFile
    val statePath = new java.io.File(dir, "state").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    try {
      val sfDir = "/root/testdata/sf0.001"
      val fixture = graft.Tables.documents(spark, sfDir)
        .select("text").as[String].collect()
      val input = MemoryStream[String]
      val docs = input.toDF().toDF("text")
      val query = StreamOps.cmsSink(docs, statePath)(ckpt)
      val (b1, rest) = fixture.splitAt(fixture.length / 4)
      val (b2, b3) = rest.splitAt(rest.length / 3)
      input.addData(b1.toSeq); query.processAllAvailable()
      input.addData(b2.toSeq); query.processAllAvailable()
      input.addData(b3.toSeq); query.processAllAvailable()
      query.stop()
      val counters = spark.read.parquet(statePath)
        .filter(!col("is_sentinel")).drop("batch_id", "is_sentinel", "ckpt")
      val tf = graft.operators.TextOps.cmsTf(
        graft.Tables.documents(spark, sfDir).select(col("text")))
      val probed = graft.operators.TextOps.cmsProbe(counters,
          tf.orderBy(col("cf").desc, col("sh")).limit(10))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val batch = graft.operators.TextOps.q268CountMinSketch(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(batch.nonEmpty && probed == batch)
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  test("weightedReservoirSink: the k-row reservoir after N micro-batches " +
      "equals the batch q300 weighted sample over the same corpus") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("wres").toFile
    val statePath = new java.io.File(dir, "state").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    try {
      val sfDir = "/root/testdata/sf0.001"
      val fixture = graft.Tables.documents(spark, sfDir)
        .select("doc_id", "text").as[(Long, String)].collect()
      val input = MemoryStream[(Long, String)]
      val query = StreamOps.weightedReservoirSink(
        input.toDF().toDF("doc_id", "text"), k = 50, statePath)(ckpt)
      val (b1, rest) = fixture.splitAt(fixture.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      input.addData(b1.toSeq); query.processAllAvailable()
      input.addData(b2.toSeq); query.processAllAvailable()
      input.addData(b3.toSeq); query.processAllAvailable()
      query.stop()
      val streamed = spark.read.parquet(statePath)
        .select("doc_id", "es_key")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      val batch = graft.operators.TextOps.q300WeightedSample(spark, sfDir)
        .select("doc_id", "es_key")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(batch.size == 50 && streamed == batch,
        s"reservoir/batch divergence: missing=${batch -- streamed} " +
          s"extra=${streamed -- batch}")
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  test("nbFilterSink admits exactly the docs the batch q248 scorer marks " +
      "pred_hq, independent of micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("nbfilter").toFile
    val acceptPath = new java.io.File(dir, "accept").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    try {
      // sf0.01: the smallest fixture where the model actually admits a
      // held-out doc (sf0.001 scores every one negative — a vacuous
      // parity), so the test sees both admit and reject paths
      val sfDir = "/root/testdata/sf0.01"
      // the trained artifacts, exactly as the batch pair derives them
      val model = graft.operators.TextOps.q247NbTrain(spark, sfDir)
        .localCheckpoint()
      val lab = graft.operators.TextOps.hqLabeled(spark, sfDir)
        .localCheckpoint()
      val b = lab.filter(col("train"))
        .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
          sum(when(!col("pos"), 1L).otherwise(0L)).as("nn")).collect()(0)
      val biasMicro = math.round(
        (math.log(b.getLong(0) + 1.0) - math.log(b.getLong(1) + 1.0)) *
          graft.operators.TextOps.NbQuantum)
      val heldout = lab.filter(!col("train"))
        .select("doc_id", "text").as[(Long, String)].collect()
      val input = MemoryStream[(Long, String)]
      val query = StreamOps.nbFilterSink(
        input.toDF().toDF("doc_id", "text"), model, biasMicro, acceptPath)(ckpt)
      val (b1, b2) = heldout.splitAt(heldout.length / 2)
      input.addData(b1.toSeq); query.processAllAvailable()
      input.addData(b2.toSeq); query.processAllAvailable()
      query.stop()
      val admitted = spark.read.parquet(acceptPath)
        .select("doc_id").as[Long].collect().toSet
      val expected = graft.operators.TextOps.q248NbScore(spark, sfDir)
        .filter(col("pred_hq")).select("doc_id").as[Long].collect().toSet
      assert(expected.nonEmpty, "fixture should admit something")
      assert(admitted == expected,
        s"stream/batch divergence: missing=${expected -- admitted} " +
          s"extra=${admitted -- expected}")
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  test("passAtKSink: the pass@k report after N micro-batches equals batch " +
      "q314 over the same attempts, independent of batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("passk").toFile
    val statePath = new java.io.File(dir, "state").getAbsolutePath
    val reportPath = new java.io.File(dir, "report").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    try {
      val sfDir = "/root/testdata/sf0.001"
      val fixture = graft.Tables.events(spark, sfDir)
        .select("event_id").as[Long].collect()
      val input = MemoryStream[Long]
      val query = StreamOps.passAtKSink(
        input.toDF().toDF("event_id"), statePath, reportPath)(ckpt)
      val (b1, rest) = fixture.splitAt(fixture.length / 4)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      input.addData(b1.toSeq); query.processAllAvailable()
      input.addData(b2.toSeq); query.processAllAvailable()
      input.addData(b3.toSeq); query.processAllAvailable()
      query.stop()
      def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getDouble(4))
      val streamed = spark.read.parquet(reportPath).collect().map(key).toSet
      val batch = graft.operators.Events.q314PassAtK(spark, sfDir)
        .collect().map(key).toSet
      assert(batch.nonEmpty && streamed == batch,
        s"stream/batch divergence:\n stream=$streamed\n batch=$batch")
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  test("preferenceSink: the Bradley-Terry report after N micro-batches " +
      "equals batch q305 over the same comparisons, independent of " +
      "batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("pref").toFile
    val statePath = new java.io.File(dir, "state").getAbsolutePath
    val reportPath = new java.io.File(dir, "report").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    try {
      val sfDir = "/root/testdata/sf0.001"
      // the exact comparison stream the batch query derives — verdicts
      // arriving one micro-batch at a time
      val fixture = graft.operators.TextOps.prefComparisons(spark, sfDir)
        .as[(String, String, String)].collect()
      val input = MemoryStream[(String, String, String)]
      val query = StreamOps.preferenceSink(
        input.toDF().toDF("sa", "sb", "winner"), statePath, reportPath)(ckpt)
      val (b1, rest) = fixture.splitAt(fixture.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      input.addData(b1.toSeq); query.processAllAvailable()
      input.addData(b2.toSeq); query.processAllAvailable()
      input.addData(b3.toSeq); query.processAllAvailable()
      query.stop()
      val streamed = spark.read.parquet(reportPath)
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = graft.operators.TextOps.q305BradleyTerry(spark, sfDir)
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(batch.nonEmpty && streamed == batch,
        s"stream/batch divergence: missing=${batch -- streamed} " +
          s"extra=${streamed -- batch}")
    } finally graft.util.Fs.deleteRecursively(dir)
  }
}
