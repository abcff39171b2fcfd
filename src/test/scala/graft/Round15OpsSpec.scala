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
