package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The UnigramViterbi codegen expression: hand-vocab DP cases (optimal
  * path, tie-breaking, unsegmentable, empty), an independent full-corpus
  * DP replay of q243, and codegen presence. */
class UnigramViterbiSpec extends SparkSpec {

  private def seg(s: String, vocab: Map[String, Long]): Option[String] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    vocab.foreach { case (p, c) => m.put(p, c) }
    val maxLen = if (vocab.isEmpty) 0 else vocab.keys.map(_.length).max
    Option(graft.functions.UnigramViterbi.compute(
      UTF8String.fromString(s), m, maxLen)).map(_.toString)
  }

  test("picks the globally optimal path, not the greedy one") {
    // greedy longest-first would take "ab" (10) then "c" (100) = 110;
    // optimal is the single piece "abc" (12)
    val v = Map("a" -> 4L, "b" -> 5L, "ab" -> 10L, "abc" -> 12L, "c" -> 100L)
    assert(seg("abc", v).contains("abc"))
    // and when the long piece is expensive, composition wins
    // (a|b|c = 4+5+2 = 11 beats ab|c = 12 and abc = 1000)
    assert(seg("abc", v + ("abc" -> 1000L) + ("c" -> 2L)).contains("a|b|c"))
  }

  test("equal-cost ties resolve to the smallest start (longest piece), " +
      "matching the oracle's min(struct(cost, j)) order") {
    // "aaaa" with a=5, aa=10: every split costs 20 — the DP must pick
    // back(2)=aa (j=0 beats j=1), back(4)=aa (j=2 beats j=3) → "aa|aa"
    val v = Map("a" -> 5L, "aa" -> 10L)
    assert(seg("aaaa", v).contains("aa|aa"))
  }

  test("unsegmentable input yields null, empty input yields the empty " +
      "segmentation") {
    assert(seg("ax", Map("a" -> 1L)).isEmpty)
    assert(seg("", Map("a" -> 1L)).contains(""))
  }

  test("q243 equals an independent in-memory Viterbi replay over the " +
      "full corpus vocabulary") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.TextOps.q243ViterbiSegment(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // rebuild the vocab exactly as the query does
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("t")).filter(col("t") =!= "")
      .collect().map(_.getString(0))
    val total = toks.length.toDouble
    val counts = toks.groupBy(identity).view.mapValues(_.size).toMap
    val vocab = (counts.map { case (t, c) =>
        (t, math.round(-math.log(c / total) * 1e6)) }.toSeq ++
        ('a' to 'z').map(ch => (ch.toString, 20000000L)))
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val inputs = Tables.documents(spark, dir)
      .select(col("doc_id"), regexp_replace(substring(col("text"), 1, 60), " ", "").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    inputs.foreach { case (id, s) =>
      assert(got(id) == seg(s, vocab).orNull, s"doc $id")
    }
  }

  test("the segmentation stage stays inside whole-stage codegen") {
    val plan = graft.operators.TextOps
      .q243ViterbiSegment(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // executedPlan.toString marks codegen stages with "*(n)"; the
    // unigram_viterbi Project must carry the marker and no HOF lambda
    assert(plan.linesIterator.exists(l =>
      l.contains("unigram_viterbi") && l.trim.startsWith("+- *(")))
    assert(!plan.toLowerCase.contains("lambdafunction"))
  }
}
