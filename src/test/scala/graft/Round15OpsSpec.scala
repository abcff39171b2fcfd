package graft

import org.apache.spark.sql.functions._

/** Round-15 hardening: the q313 variance wide-integer rebuild (n·Σx² −
  * (Σx)² overflows Long once a stratum passes ~3×10⁵ docs — the round-14
  * advice item), plus coverage pinned here as the fixes land. Every test
  * EXECUTES a plan (the round-13 lesson). */
class Round15OpsSpec extends SparkSpec {

  test("UNION arms may bind different user variables (§16.3): a variable " +
      "missing from one arm is unbound there, not a compile error") {
    val spark2 = spark
    import spark2.implicits._
    val t = Seq(
      ("a", "when", "2024"),
      ("c", "tag", "apple")).toDF("s", "p", "o")
    val lbl = Seq(("e", "en", "l")).toDF("entity", "lang", "label")
    val out = graft.plans.SparqlText.run(
      """SELECT ?x ?d ?t WHERE {
        |  { ?x <when> ?d } UNION { ?x <tag> ?t }
        |} ORDER BY ?x""".stripMargin, t, lbl)
      .collect().map(r => (r.getString(0),
        Option(r.getString(1)), Option(r.getString(2))))
    assert(out.toSeq === Seq(
      ("a", Some("2024"), None), ("c", None, Some("apple"))))
  }

  test("q316: union with disjoint variable sets over the triple view — " +
      "arm counts add up and each arm's missing variable is null") {
    val dir = "/root/testdata/sf0.001"
    val out = operators.RdfOps.q316SparqlUnionDisjoint(spark, dir)
      .collect().map(r => (r.getString(0),
        Option(r.getString(1)), Option(r.getString(2))))
    val suppliers = out.filter(_._2.nonEmpty)
    val segments = out.filter(_._3.nonEmpty)
    assert(out.nonEmpty)
    assert(suppliers.length + segments.length === out.length,
      "every row binds exactly one of ?nat / ?seg")
    assert(suppliers.forall(_._1.startsWith("S")))
    assert(segments.forall(_._1.startsWith("C")))
  }

  test("SUM/AVG over a mixed duration/non-duration multiset is a type " +
      "error (unbound, §18.5); MIN stays carrier-lenient; a pure " +
      "duration multiset still aggregates") {
    val spark2 = spark
    import spark2.implicits._
    val t = Seq(
      ("a", "when", "2024-01-01T00:00:00+02:00"),
      ("b", "when", "2024-01-01T00:00:00+10:00"),
      ("c", "tag", "apple")).toDF("s", "p", "o")
    val lbl = Seq(("e", "en", "l")).toDF("entity", "lang", "label")
    // arm 2 binds ?z to "apple" — duration-typed in arm 1 only, and the
    // set-op companion fill cannot parse it, so the group is MIXED: the
    // carrier SUM/AVG silently covering just the duration subset was the
    // round-14 advice bug; the spec answer is a type error → unbound
    val mixed = graft.plans.SparqlText.run(
      """SELECT (SUM(?z) AS ?s) (AVG(?z) AS ?a) (MIN(?z) AS ?lo) WHERE {
        |  { ?x <when> ?d . BIND(TIMEZONE(?d) AS ?z) }
        |  UNION { ?x <tag> ?z }
        |}""".stripMargin, t, lbl).collect().head
    assert(Option(mixed.getString(0)) === None, "SUM over mixed multiset")
    assert(Option(mixed.getString(1)) === None, "AVG over mixed multiset")
    // MIN keeps the documented lenient posture: extremize among the
    // duration members rather than erroring
    assert(mixed.getString(2) === "PT2H")
    // the all-duration multiset is untouched by the guard
    val pure = graft.plans.SparqlText.run(
      """SELECT (SUM(?z) AS ?s) (AVG(?z) AS ?a) WHERE {
        |  ?x <when> ?d . BIND(TIMEZONE(?d) AS ?z)
        |}""".stripMargin, t.filter(col("p") === "when"), lbl)
      .collect().head
    assert(pure.getString(0) === "PT12H")
    assert(pure.getString(1) === "PT6H")
  }

  test("q314: pass@k matches the in-memory Chen et al. estimator exactly, " +
      "is bounded by pass@1, and clamps to 1.0 when failures < k") {
    val dir = "/root/testdata/sf0.001"
    val out = operators.Events.q314PassAtK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.length === 50, "every problem has >= 10 attempts at sf0.001")
    out.foreach { case (p, n, c, p1, p10) =>
      // same fixed-order ten-factor product as both engines
      val prod = (0 until 10).map(i =>
        ((n - c).toDouble - i) / (n.toDouble - i)).product
      val want =
        if (n - c < 10) 1.0
        else BigDecimal(1.0 - prod)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(p10 === want, s"problem $p (n=$n c=$c)")
      assert(p1 === BigDecimal(c.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"p1 $p")
      assert(p10 >= p1 - 1e-9 && p10 <= 1.0 && p1 >= 0.0,
        s"bounds violated at $p")
      if (c > 0) assert(p10 > 0.0, s"c>0 must give positive pass@10 at $p")
      if (c == 0) assert(p10 === 0.0, s"c=0 must give 0 at $p")
    }
  }

  test("q315: Fleiss' kappa equals an exact in-memory computation over " +
      "the same item/rater/category construction") {
    val dir = "/root/testdata/sf0.001"
    val row = operators.TextOps.q315FleissKappa(spark, dir).collect().head
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rated = docs.map { case (id, nc) =>
      (id / 4, if (nc < 150) 0 else if (nc < 300) 1 else 2)
    }
    val byItem = rated.groupBy(_._1).filter(_._2.length == 4)
    val nItems = byItem.size.toLong
    val nij = byItem.values.flatMap(_.groupBy(_._2).values.map(_.length.toLong))
    val sumSq = nij.map(x => x * x).sum
    val tj = (0 until 3).map(cat =>
      byItem.values.flatten.count(_._2 == cat).toLong)
    assert(row.getLong(0) === nItems)
    assert(row.getLong(1) === sumSq)
    assert(Seq(row.getLong(2), row.getLong(3), row.getLong(4)) === tj)
    val n = nItems.toDouble
    val pbar = (sumSq.toDouble - n * 4.0) / (n * 4.0 * 3.0)
    val pe = tj.map(t => t.toDouble * t.toDouble).sum / ((n * 4.0) * (n * 4.0))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(5) === r6(pbar))
    assert(row.getDouble(6) === r6(pe))
    assert(row.getDouble(7) === r6((pbar - pe) / (1.0 - pe)))
    assert(row.getDouble(7) > -1.0 - 1e-9 && row.getDouble(7) < 1.0 + 1e-9)
  }

  test("q318: template mining groups digit-varied copies under one key " +
      "and drops singletons") {
    val dir = "/root/testdata/sf0.001"
    val out = operators.TextOps.q318TemplateMining(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // reference over raw docs
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val grouped = docs.groupBy { case (_, _, text) =>
      text.toLowerCase.replaceAll("[0-9]+", "0").replaceAll("\\s+", " ")
        .split(" ").take(8).mkString(" ")
    }.values.filter(_.length >= 2)
    assert(grouped.nonEmpty, "fixture must produce non-trivial templates")
    assert(out.length === grouped.size)
    val wantCounts = grouped.map(g =>
      (g.length.toLong, g.map(_._2).distinct.length.toLong,
        g.map(_._1).min)).toSet
    assert(out.map(t => (t._2, t._3, t._4)).toSet === wantCounts)
    // and the md5 key really is the normalized-template hash
    out.foreach(t => assert(t._1.matches("[0-9a-f]{32}")))
  }

  test("q319: sequence packing conserves docs/tokens, attributes each doc " +
      "to the chunk of its first token, and counts split docs exactly") {
    val dir = "/root/testdata/sf0.001"
    val out = operators.TextOps.q319SequencePacking(spark, dir).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").length.toLong))
    val expected = docs.groupBy(_._2).flatMap { case (src, ds) =>
      var cum = 0L
      val rows = ds.sortBy(_._1).map { case (id, _, n) =>
        val prefix = cum; cum += n
        val seq = prefix / 2048
        val split = if ((cum - 1) / 2048 > seq) 1L else 0L
        (seq, id, n, split)
      }
      rows.groupBy(_._1).map { case (seq, rs) =>
        (src, seq) -> (rs.length.toLong, rs.map(_._3).sum,
          rs.map(_._4).sum, rs.map(_._2).min)
      }
    }
    assert(out === expected)
    // conservation: every doc and token lands in exactly one sequence
    assert(out.values.map(_._1).sum === docs.length.toLong)
    assert(out.values.map(_._2).sum === docs.map(_._3).sum)
  }

  test("q317: bitext pairs are reciprocal one-to-one best matches with " +
      "margins matching an exact in-memory recompute") {
    val dir = "/root/testdata/sf0.001"
    val out = operators.VectorOps.q317BitextMining(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.nonEmpty, "fixture should mine some pairs")
    // one-to-one: reciprocal best matches can never share an endpoint
    assert(out.map(_._1).distinct.length === out.length)
    assert(out.map(_._2).distinct.length === out.length)
    // independent reference: double cosine over the raw vectors,
    // rounded 6 (the engines' shared parity surface), then exact
    // micro-integer ranks/margins
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val lang = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def side(l: String) = emb.keys.filter(id =>
      lang.get(id).contains(l)).toSeq.sorted
    val (en, de) = (side("en"), side("de"))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cm(a: Long, b: Long): Long = {
      val (va, vb) = (emb(a), emb(b))
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < va.length) {
        dot += va(i) * vb(i); na += va(i) * va(i); nb += vb(i) * vb(i)
        i += 1
      }
      math.round(r6(dot / (math.sqrt(na) * math.sqrt(nb))) * 1e6)
    }
    val mat = (for (s <- en; t <- de) yield (s, t) -> cm(s, t)).toMap
    def bestTgt(s: Long) = de.minBy(t => (-mat((s, t)), t))
    def bestSrc(t: Long) = en.minBy(s => (-mat((s, t)), s))
    val expected = (for {
      s <- en
      t = bestTgt(s) if bestSrc(t) == s
    } yield {
      val top = de.map(x => mat((s, x))).sorted(Ordering[Long].reverse)
        .take(4)
      val margin = r6((top.head * top.length - top.sum).toDouble /
        (top.length.toDouble * 1e6))
      (s, t, mat((s, t)) / 1e6, margin)
    }).toSet
    val got = out.map { case (s, t, c, m) =>
      (s, t, math.round(c * 1e6) / 1e6, m)
    }.toSet
    assert(got === expected,
      s"bitext drifted:\n got=$got\n want=$expected")
  }

  test("q313 variance algebra survives strata past the Long-overflow " +
      "boundary (decimal(38,0) second moment, exact vs BigInt reference)") {
    // 350k rows of q4 in [9000, 11000): s1 ≈ 3.5e9, s1² ≈ 1.2e19 > 2^63 —
    // the pre-round-15 Long expression wraps negative here and sqrt
    // returns NaN; the decimal(38,0) path must match BigInt exactly.
    val n = 350000L
    val df = spark.range(n)
      .select((lit(9000L) + (col("id") % lit(2000L))).as("q4"))
      .agg(count(lit(1)).as("n"), sum(col("q4")).as("s1"),
        sum(col("q4") * col("q4")).as("s2"))
      .withColumn("shWide", sqrt(
        (col("n").cast("decimal(38,0)") * col("s2").cast("decimal(38,0)") -
          col("s1").cast("decimal(38,0)") * col("s1").cast("decimal(38,0)"))
          .cast("double") /
          (col("n").cast("double") * col("n").cast("double"))))
    val row = df.collect().head
    val (cn, s1, s2) = (row.getAs[Long]("n"), row.getAs[Long]("s1"),
      row.getAs[Long]("s2"))
    assert(cn === n)
    // the hazard the fix closes: s1² really is past the Long boundary
    // (under ANSI Spark the old Long expression would THROW here; with
    // ANSI off it wraps negative and sqrt goes NaN)
    assert(BigInt(s1) * BigInt(s1) > BigInt(Long.MaxValue),
      "test must sit past the Long boundary to pin the fix")
    val exact = BigInt(cn) * BigInt(s2) - BigInt(s1) * BigInt(s1)
    assert(exact > 0)
    val ref = math.sqrt(exact.toDouble / (cn.toDouble * cn.toDouble))
    val got = row.getAs[Double]("shWide")
    assert(!got.isNaN && math.abs(got - ref) <= math.ulp(ref) * 4, s"$got vs $ref")
  }
}
