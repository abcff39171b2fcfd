package graft

/** The harness watchdog (round 13's defining gap): one non-terminating
  * query body must cost its own slot and nothing else — Verify keeps
  * dumping, Bench records the negative sentinel, Audit flags a failure,
  * and the artifact completes. These pins exercise the shared
  * [[graft.util.Watchdog]] all three mains route through. */
class WatchdogSpec extends SparkSpec {

  test("a non-terminating body yields Left(TIMED OUT) within the bound " +
      "and the next query on the same harness still completes") {
    val sc = spark.sparkContext
    val t0 = System.nanoTime()
    val hung = graft.util.Watchdog.run(sc, "dummy_hang", 2L) {
      // driver-side hang stand-in (the codegen-explosion class: no Spark
      // job to cancel), interruptible so the test JVM stays clean
      while (!Thread.currentThread().isInterrupted) Thread.sleep(20)
      42
    }
    hung match {
      case Left(e) => assert(e.getMessage.contains("TIMED OUT"))
      case Right(v) => fail(s"hang completed?! $v")
    }
    assert((System.nanoTime() - t0) / 1e9 < 30.0,
      "watchdog did not enforce its bound")
    // the board continues: a normal Spark query after the hang
    val ok = graft.util.Watchdog.run(sc, "next_query", 120L) {
      spark.range(100).count()
    }
    assert(ok == Right(100L))
  }

  test("a late-unblocking body cannot push work past its timeout: the " +
      "job it submits AFTER cancellation dies on arrival (quiesce path)") {
    val sc = spark.sparkContext
    @volatile var lateOutcome: Option[Either[Throwable, Long]] = None
    val done = new java.util.concurrent.CountDownLatch(1)
    val r = graft.util.Watchdog.run(sc, "late_unblock", 1L) {
      // a driver-side hang that shrugs off interrupts and unblocks well
      // after the bound — the round-14 residual risk: without
      // cancelJobGroupAndFutureJobs its late job would run to completion
      // inside the NEXT query's bench/audit window
      val until = System.nanoTime() + 3000000000L
      while (System.nanoTime() < until) {
        try Thread.sleep(20)
        catch { case _: InterruptedException => () }
      }
      lateOutcome = Some(
        try Right(spark.range(500000000L).selectExpr("sum(id * 7)")
          .collect().head.getLong(0))
        catch { case e: Throwable => Left(e) })
      done.countDown()
      0
    }
    assert(r.isLeft, "must time out")
    assert(done.await(60, java.util.concurrent.TimeUnit.SECONDS),
      "body never unblocked — test is broken")
    lateOutcome match {
      case Some(Left(_)) => () // cancelled on submit — the fix working
      case other => fail(s"late job was allowed to run: $other")
    }
  }

  test("a throwing body surfaces its own cause, not a wrapper") {
    val r = graft.util.Watchdog.run(spark.sparkContext, "boom", 120L) {
      sys.error("kaboom"); 1
    }
    r match {
      case Left(e) => assert(e.getMessage.contains("kaboom"))
      case Right(_) => fail("should have thrown")
    }
  }

  test("a running Spark job inside a timed-out body is cancelled via its " +
      "job group (the slot is reclaimed, not leaked)") {
    val sc = spark.sparkContext
    val r = graft.util.Watchdog.run(sc, "slow_job", 2L) {
      // a genuinely running job much longer than the bound
      spark.range(1000000000L).rdd.map { i => Thread.sleep(1); i }.count()
    }
    assert(r.isLeft)
    // after cancellation the scheduler is free for new work promptly
    val t0 = System.nanoTime()
    assert(spark.range(10).count() == 10L)
    assert((System.nanoTime() - t0) / 1e9 < 60.0)
  }
}
