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
}
