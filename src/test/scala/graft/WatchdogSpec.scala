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
