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

  test("equal-cost ties resolve to the SHORTEST piece (largest start), " +
      "matching the oracle's min(struct(cost, pieceLen)) order") {
    // "aaaa" with a=5, aa=10: every split costs 20 — the DP must pick
    // the 1-char piece at every cell (min piece length on ties, exactly
    // what DuckDB's min(struct_pack(cand, j)) computes) → "a|a|a|a".
    // Round-11 ADVICE: the Scala side used to prefer the LONGEST piece
    // ("aa|aa"), silently diverging from the oracle on any exact
    // micro-unit cost tie in a real corpus.
    val v = Map("a" -> 5L, "aa" -> 10L)
    assert(seg("aaaa", v).contains("a|a|a|a"))
    // and a mixed case: "abab" with ab=9, a=4, b=5 — both factorizations
    // cost 18; shortest-piece must win at every tie cell
    assert(seg("abab", Map("ab" -> 9L, "a" -> 4L, "b" -> 5L))
      .contains("a|b|a|b"))
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
    // rebuild the vocab exactly as the query does: top-V by (count desc,
    // token) over pieces of length <= 12, costs renormalized over the cut
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "" && length(col("t")) <= 12)
      .collect().map(_.getString(0))
    val top = toks.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }
      .take(graft.operators.TextOps.ViterbiVocabSize)
    val total = top.map(_._2).sum.toDouble
    val vocab = (top.map { case (t, c) =>
        (t, math.round(-math.log(c / total) * 1e6)) } ++
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
