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

  test("idempotence: closing a closed graph adds nothing") {
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("src", "dst")
    val got = Closure.ancestorPairs(edges).as[(String, String)].collect().toSet
    assert(got == Set(("a", "b"), ("a", "c"), ("b", "c")))
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
}
