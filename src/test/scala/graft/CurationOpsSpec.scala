package graft

import org.apache.spark.sql.functions._

/** Round-11 sketch/curation additions — properties beyond the hash
  * oracle: the BPE string-replace merge equals the greedy left-to-right
  * scan on adversarial token streams (including tokens that are
  * concatenations of other tokens), the full q273 training loop equals
  * an in-memory reference trainer, q270's k-center output equals the
  * in-memory greedy replay and its radius trajectory is non-increasing,
  * q272's chunks tile each document with the exact stride/overlap
  * contract, the HLL estimate lands within its expected error band, CMS
  * errors are one-sided, and the KMV Jaccard degenerates to exact below
  * k. */
class CurationOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // reference greedy left-to-right non-overlapping merge
  private def scanMerge(toks: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toList
  }

  test("bpeMergeWs == greedy scan merge over adversarial token streams") {
    val spark2 = spark
    import spark2.implicits._
    // alphabet chosen so merged tokens collide with existing tokens and
    // pair patterns self-overlap ("a a a", "ab a b", ...)
    val alpha = Vector("a", "b", "ab", "aa", "x")
    val rnd = new scala.util.Random(42)
    val cases = (0 until 400).map { _ =>
      val toks = List.fill(rnd.nextInt(9))(alpha(rnd.nextInt(alpha.size)))
      val (a, b) = (alpha(rnd.nextInt(alpha.size)), alpha(rnd.nextInt(alpha.size)))
      (toks, a, b)
    }
    // evaluate per distinct (a,b) so the production Column (literal pair)
    // is exercised exactly as q273 builds it
    cases.groupBy { case (_, a, b) => (a, b) }.foreach { case ((a, b), cs) =>
      val df = cs.map(_._1).toDF("toks")
        .withColumn("ws", operators.TextOps.bpePadWs(col("toks")))
        .withColumn("merged", operators.TextOps.bpeMergeWs(col("ws"), a, b))
        .withColumn("out", filter(split(col("merged"), " "), t => t =!= ""))
      val got = df.select(col("toks"), col("out")).collect()
      got.foreach { r =>
        val toks = r.getSeq[String](0).toList
        assert(r.getSeq[String](1).toList === scanMerge(toks, a, b),
          s"pair ($a,$b) on $toks")
      }
    }
  }

  // in-memory reference BPE trainer (pair census → argmax → scan merge)
  private def refBpe(words: Seq[(String, Long)],
                     rounds: Int): Seq[(Long, String, String, String, Long)] = {
    var types: Seq[(List[String], Long)] =
      words.map { case (w, n) => (w.toList.map(_.toString), n) }
    (1 to rounds).flatMap { i =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      types.foreach { case (toks, n) =>
        toks.zip(toks.drop(1)).foreach { p => pc(p) = pc.getOrElse(p, 0L) + n }
      }
      if (pc.isEmpty) None
      else {
        val ((a, b), n) = pc.toSeq.minBy { case ((x, y), m) => (-m, x, y) }
        types = types.map { case (toks, cnt) => (scanMerge(toks, a, b), cnt) }
        Some((i.toLong, a, b, a + b, n))
      }
    }
  }

  test("q273 BPE training loop == in-memory reference trainer") {
    val words = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = operators.TextOps.q273BpeTrain(spark, dir)
      .orderBy("merge_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq === refBpe(words, 8))
  }

  test("bpeTrain differential net: generated word tables across seeds") {
    val spark2 = spark
    import spark2.implicits._
    for (seed <- 0 until 12) {
      val rnd = new scala.util.Random(seed)
      // tiny alphabet forces dense pair collisions and merge-token reuse
      val words = (0 until (5 + rnd.nextInt(20))).map { _ =>
        (1 to (1 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar)
          .mkString
      }.distinct.map(w => (w, 1L + rnd.nextInt(50)))
      val got = operators.TextOps.bpeTrain(spark,
          words.toDF("w", "cnt"), rounds = 4)
        .orderBy("merge_idx").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
      assert(got === refBpe(words, 4), s"seed $seed words $words")
    }
  }

  test("kcenterCoreset differential net: generated vector frames across seeds") {
    val spark2 = spark
    import spark2.implicits._
    for (seed <- 0 until 8) {
      val rnd = new scala.util.Random(seed)
      val vecs = (0 until 40).map(i =>
        (i.toLong, Array.fill(8)(rnd.nextInt(2001) - 1000L).toSeq))
      def d2(a: Seq[Long], b: Seq[Long]): Long =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      val seedV = vecs.head
      var remaining = vecs.tail.map { case (id, v) => (id, v, d2(v, seedV._2)) }
      var expect = Vector((0L, seedV._1, 0L))
      for (i <- 1 until 5) {
        val pick = remaining.minBy { case (id, _, d) => (-d, id) }
        expect :+= ((i.toLong, pick._1, pick._3))
        remaining = remaining.filter(_._1 != pick._1)
          .map { case (id, v, d) => (id, v, math.min(d, d2(v, pick._2))) }
      }
      val got = operators.VectorOps.kcenterCoreset(spark,
          vecs.toDF("vec_id", "v"), k = 5)
        .orderBy("sel_idx").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector
      assert(got === expect, s"seed $seed")
    }
  }

  test("q270 k-center == in-memory greedy replay; radius non-increasing") {
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val seed = vecs.head
    var remaining = vecs.tail.map { case (id, v) => (id, v, d2(v, seed._2)) }
    var expect = Vector((0L, seed._1, 0L))
    for (i <- 1 until 8) {
      val pick = remaining.minBy { case (id, _, d) => (-d, id) }
      expect :+= ((i.toLong, pick._1, pick._3))
      remaining = remaining.filter(_._1 != pick._1)
        .map { case (id, v, d) => (id, v, math.min(d, d2(v, pick._2))) }
    }
    val got = operators.VectorOps.q270KcenterCoreset(spark, dir)
      .orderBy("sel_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector
    assert(got === expect)
    val radii = got.drop(1).map(_._3)
    assert(radii === radii.sortBy(-_), "radius trajectory must be non-increasing")
  }

  test("q272 chunks tile every document: stride 24, full windows, tail >= 9") {
    val lens = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val chunks = operators.TextOps.q272SlidingChunks(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    assert(chunks.keySet === lens.keySet)
    chunks.foreach { case (doc, cs) =>
      val n = lens(doc)
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === sorted.indices.map(_.toLong),
        "chunk_idx dense from 0")
      assert(sorted.map(_._3).toSeq === sorted.indices.map(_ * 24L),
        "starts at stride 24")
      sorted.init.foreach { c => assert(c._4 === 32L, s"non-last chunk full: $c") }
      val last = sorted.last
      assert(last._3 + last._4 === n, "chunks cover the tail exactly")
      if (sorted.length > 1) assert(last._4 >= 9L, "tail chunk >= 9 tokens")
    }
  }

  test("winnowing guarantee: docs sharing a >= w+k-1 token run share a fingerprint") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    def word() = "w" + rnd.nextInt(5000)
    // 20 doc pairs, each sharing a planted 6-token run (w+k-1 = 4+3-1)
    // at random offsets inside otherwise-unrelated 30-token docs
    val rows = (0 until 20).flatMap { p =>
      val run = Seq.fill(6)(word())
      Seq(0, 1).map { j =>
        val pre = Seq.fill(rnd.nextInt(12))(word())
        val post = Seq.fill(rnd.nextInt(12))(word())
        (p * 2L + j, (pre ++ run ++ post).mkString(" "))
      }
    }
    val fps = operators.TextOps.winnowFingerprints(
        rows.toDF("doc_id", "text")
          .withColumn("toks", split(col("text"), " ")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0 until 20).foreach { p =>
      val shared = fps(p * 2L) intersect fps(p * 2L + 1)
      assert(shared.nonEmpty, s"pair $p must share a fingerprint")
    }
  }

  test("Skew.saltedJoin == plain join under adversarial skew (one key = 90% of rows)") {
    val spark2 = spark
    import spark2.implicits._
    val big = ((0 until 9000).map(i => (i.toLong, "hot")) ++
        (0 until 1000).map(i => (9000L + i, s"k${i % 50}")))
      .toDF("id", "k")
    val small = (Seq(("hot", 10L)) ++ (0 until 50).map(i => (s"k$i", i.toLong)))
      .toDF("k", "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "k", "v").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val got = canon(graft.plans.Skew.saltedJoin(
      big, small, "k", col("id"), salts = 16))
    val expect = canon(big.join(small, "k"))
    assert(got === expect && got.size === 10000)
  }

  test("HLL estimate within 15% of exact per lang; CMS one-sided; KMV exact below k") {
    val hll = operators.TextOps.q267HllSketch(spark, dir).collect()
    hll.foreach { r =>
      val (est, exact) = (r.getDouble(1), r.getLong(2))
      assert(math.abs(est - exact) <= 0.15 * exact,
        s"lang ${r.getString(0)}: hll $est vs exact $exact")
    }
    operators.TextOps.q268CountMinSketch(spark, dir).collect().foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), "CMS never underestimates")
      assert(r.getLong(3) === r.getLong(2) - r.getLong(1))
    }
    // sf0.001 sources have < 64 distinct texts => union sketch is the
    // full union and the estimator must DEGENERATE TO EXACT
    operators.TextOps.q269KmvSourceJaccard(spark, dir).collect().foreach { r =>
      assert(r.getDouble(2) === r.getDouble(3),
        s"${r.getString(1)}x${r.getString(0)}: kmv must equal exact below k")
    }
  }
}
