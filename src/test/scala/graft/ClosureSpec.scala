package graft

import graft.plans.Closure

/** J4 fixpoint semantics: reflexivity, transitivity, cycle termination. */
class ClosureSpec extends SparkSpec {
  import spark.implicits._

  test("reachingTo: reflexive + transitive over a chain") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val seeds = Seq("d").toDF("node")
    val got = Closure.reachingTo(edges, seeds).as[String].collect().toSet
    assert(got == Set("a", "b", "c", "d"))
  }

  test("reachingTo: diamond converges without duplicates") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")).toDF("src", "dst")
    val got = Closure.reachingTo(edges, Seq("d").toDF("node")).as[String].collect()
    assert(got.length == got.distinct.length)
    assert(got.toSet == Set("a", "b", "c", "d"))
  }

  test("reachingTo: cycles terminate") {
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c")).toDF("src", "dst")
    val got = Closure.reachingTo(edges, Seq("c").toDF("node")).as[String].collect().toSet
    assert(got == Set("a", "b", "c"))
  }

  test("ancestorPairs: full transitive pairs on a chain") {
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val got = Closure.ancestorPairs(edges).as[(String, String)].collect().toSet
    assert(got == Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("rootLabels: every node gets its root over a forest") {
    val edges = Seq(("o1", "c1"), ("o2", "c2"), ("c1", "n1"), ("c2", "n1"),
      ("n1", "r1"), ("n2", "r2")).toDF("src", "dst")
    val roots = Seq("r1", "r2").toDF("node")
    val got = Closure.rootLabels(edges, roots, functionalEdges = true)
      .as[(String, String)].collect().toSet
    assert(got == Set(("n1", "r1"), ("c1", "r1"), ("c2", "r1"),
      ("o1", "r1"), ("o2", "r1"), ("n2", "r2")))
  }

  test("rootLabels: general graph — a diamond reaches both roots exactly once") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "r1"), ("c", "r2"))
      .toDF("src", "dst")
    val got = Closure.rootLabels(edges, Seq("r1", "r2").toDF("node"))
      .as[(String, String)].collect()
    assert(got.length == got.distinct.length)
    assert(got.toSet == Set(("a", "r1"), ("a", "r2"), ("b", "r1"), ("c", "r2")))
  }

  test("rootLabels: matches ancestorPairs-then-filter on the forest shape") {
    val edges = Seq(("o1", "c1"), ("c1", "n1"), ("n1", "r1"), ("n2", "r1"))
      .toDF("src", "dst")
    val viaPairs = Closure.ancestorPairs(edges, functionalEdges = true)
      .filter($"anc".startsWith("r"))
      .select($"node", $"anc".as("root"))
      .as[(String, String)].collect().toSet
    val viaLabels = Closure.rootLabels(edges, Seq("r1").toDF("node"),
      functionalEdges = true).as[(String, String)].collect().toSet
    assert(viaLabels == viaPairs)
  }

  test("rootLabels: a root inside a functional cycle terminates with set output") {
    // a→b→r1→a is functional (one dst per src) but cyclic: the frontier
    // never empties on its own — the periodic guard must terminate it
    val edges = Seq(("a", "b"), ("b", "r1"), ("r1", "a")).toDF("src", "dst")
    val got = Closure.rootLabels(edges, Seq("r1").toDF("node"),
      functionalEdges = true, maxIters = 20)
      .as[(String, String)].collect()
    assert(got.length == got.distinct.length)
    assert(got.toSet == Set(("a", "r1"), ("b", "r1"), ("r1", "r1")))
  }

  test("idempotence: closing a closed graph adds nothing") {
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("src", "dst")
    val got = Closure.ancestorPairs(edges).as[(String, String)].collect().toSet
    assert(got == Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("functional two-hop: odd- and even-depth chains match the general path") {
    // chains around and past the adaptive switch (default 6 rounds), plus
    // forced immediate striding (twoHopAfterRounds = 0) — the stride-2
    // walk must land exactly on both parities, including the boundary
    // case where the frontier empties exactly at the switch round
    for (n <- Seq(4, 5, 6, 7, 8, 9); switch <- Seq(-1, 0, 1)) {
      val edges = (0 until n).map(i => (s"v$i", s"v${i + 1}")).toDF("src", "dst")
      val seeds = Seq(s"v$n").toDF("node")
      val gen = Closure.reachingTo(edges, seeds).as[String].collect().toSet
      val fun = Closure.reachingTo(edges, seeds, functionalEdges = true,
        twoHopAfterRounds = switch).as[String].collect().toSeq
      assert(fun.toSet == gen, s"chain length $n, switch $switch")
      assert(fun.size == fun.distinct.size, s"distinct contract, $n/$switch")
      val pGen = Closure.ancestorPairs(edges).as[(String, String)].collect().toSet
      val pFun = Closure.ancestorPairs(edges, functionalEdges = true,
        twoHopAfterRounds = switch).as[(String, String)].collect().toSeq
      assert(pFun.toSet == pGen, s"pairs, chain length $n, switch $switch")
      assert(pFun.size == pFun.distinct.size, s"pairs distinct, $n/$switch")
    }
  }

  test("functional two-hop: branching forest and multi-seed overlap stay distinct") {
    // r ← a ← {b, c}; b ← d — two seeds on one root path (r and a) create
    // overlapping layers that the terminal distinct must collapse
    val edges = Seq(("a", "r"), ("b", "a"), ("c", "a"), ("d", "b")).toDF("src", "dst")
    val seeds = Seq("r", "a").toDF("node")
    for (switch <- Seq(-1, 0)) {
      val fun = Closure.reachingTo(edges, seeds, functionalEdges = true,
        twoHopAfterRounds = switch).as[String].collect().toSeq
      assert(fun.toSet == Set("a", "b", "c", "d", "r"), s"switch $switch")
      assert(fun.size == fun.distinct.size, s"switch $switch")
    }
  }

  test("functional two-hop: cycles terminate under maxIters with set output") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    for (switch <- Seq(-1, 0)) {
      val got = Closure.reachingTo(edges, Seq("a").toDF("node"),
        maxIters = 6, functionalEdges = true, twoHopAfterRounds = switch)
        .as[String].collect().toSeq
      assert(got.toSet == Set("a", "b") && got.size == 2, s"switch $switch")
    }
  }

  test("isFunctional probes forests vs fan-out") {
    assert(Closure.isFunctional(Seq(("a", "b"), ("b", "c"), ("d", "c")).toDF("src", "dst")))
    assert(!Closure.isFunctional(Seq(("a", "b"), ("a", "c")).toDF("src", "dst")))
    // duplicate rows of the SAME edge do not break functionality
    assert(Closure.isFunctional(Seq(("a", "b"), ("a", "b")).toDF("src", "dst")))
  }

  test("reliable checkpoint mode (checkpoint dir set) matches localCheckpoint mode") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "c")).toDF("src", "dst")
    val seeds = Seq("d").toDF("node")
    val local = Closure.reachingTo(edges, seeds, functionalEdges = true)
      .as[String].collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val reliable = Closure.reachingTo(edges, seeds, functionalEdges = true)
        .as[String].collect().toSet
      val reliableGen = Closure.reachingTo(edges, seeds).as[String].collect().toSet
      assert(reliable == local && reliableGen == local)
      assert(local == Set("a", "b", "c", "d", "x"))
    } finally {
      // SparkContext exposes no unset — clear the private var reflectively
      // so the shared test session goes back to localCheckpoint; if the
      // field ever moves, later suites just checkpoint into the temp dir
      try {
        val f = spark.sparkContext.getClass.getDeclaredField("checkpointDir")
        f.setAccessible(true)
        f.set(spark.sparkContext, None)
      } catch { case _: ReflectiveOperationException => }
    }
  }

  test("shuffle-join fallback (broadcastMaxRows=0) matches the broadcast path") {
    // At test scale every frontier broadcasts by default, so force the
    // else-branch: identical results must come from the shuffle-join plan.
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
      ("e", "a")).toDF("src", "dst")
    val seeds = Seq("d").toDF("node")
    val broadcast = Closure.reachingTo(edges, seeds).as[String].collect().toSet
    val shuffled = Closure.reachingTo(edges, seeds, broadcastMaxRows = 0L)
      .as[String].collect().toSet
    assert(shuffled == broadcast && shuffled == Set("a", "b", "c", "d", "e"))
    val pairsB = Closure.ancestorPairs(edges).as[(String, String)].collect().toSet
    val pairsS = Closure.ancestorPairs(edges, broadcastMaxRows = 0L)
      .as[(String, String)].collect().toSet
    assert(pairsS == pairsB)
  }

  test("rootLabels: a root set above broadcastMaxRows is never hint-broadcast") {
    // Regression: the root-set hint used to fire unconditionally (the cap
    // was passed as the row count). With auto-broadcast disabled, any
    // BroadcastHashJoin in an executed plan can only come from an explicit
    // hint — so a run where every exact count exceeds the cap must execute
    // zero broadcast joins.
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      def onSuccess(funcName: String,
                    qe: org.apache.spark.sql.execution.QueryExecution,
                    durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      def onFailure(funcName: String,
                    qe: org.apache.spark.sql.execution.QueryExecution,
                    exception: Exception): Unit = ()
    }
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.listenerManager.register(listener)
    try {
      val edges = Seq(("a", "r1"), ("b", "r2"), ("c", "a")).toDF("src", "dst")
      val roots = Seq("r1", "r2").toDF("node")
      val got = Closure.rootLabels(edges, roots, broadcastMaxRows = 0L)
        .as[(String, String)].collect().toSet
      assert(got == Set(("a", "r1"), ("b", "r2"), ("c", "r1")))
      // listener callbacks are async (the bus drainer is private[spark]) —
      // wait for the plan stream to go quiet before asserting absence
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 5_000_000_000L
      while (stable < 3 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val n = plans.size()
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
      val broadcasts = plans.toArray(Array.empty[String])
        .filter(_.contains("BroadcastHashJoin"))
      assert(broadcasts.isEmpty,
        s"explicit broadcast hint fired despite cap=0:\n${broadcasts.headOption.getOrElse("")}")
    } finally {
      spark.listenerManager.unregister(listener)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
