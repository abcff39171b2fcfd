package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Round-14 additions: duration aggregates (§18.5 set functions closed
  * under the duration types), the §17.6 IF error-propagation fix (a NULL
  * condition must yield unbound, not the else branch — the bug that made
  * zone-less rows land in q304's "nonpositive" group), Bradley–Terry
  * preference aggregation vs an in-memory MM reference, Cohen's kappa vs
  * a direct confusion-table computation, and the preference-pair mining
  * invariants. Every test EXECUTES a plan (the round-13 lesson). */
class Round14OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("IF with a null (error) condition yields unbound, not the else " +
      "branch (§17.6)") {
    val spark2 = spark
    import spark2.implicits._
    val t = Seq(("a", "when", "2024-01-01T00:00:00Z"),
      ("b", "when", "2024-01-01T00:00:00")).toDF("s", "p", "o")
    val lbl = Seq(("e", "en", "l")).toDF("entity", "lang", "label")
    val out = graft.plans.SparqlText.run(
      """SELECT ?x ?cls WHERE {
        |  ?x <when> ?d .
        |  BIND(IF(TIMEZONE(?d) > "PT0S"^^xsd:dayTimeDuration,
        |          "east", "nonpositive") AS ?cls)
        |}""".stripMargin, t, lbl)
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("a") === Some("nonpositive")) // PT0S > PT0S is false
    assert(out("b") === None) // zone-less: TIMEZONE errors -> IF errors
  }

  test("cross-flavor constructor on a carrier-bound variable falls back " +
      "to the lexical path (never misreads seconds as months)") {
    val spark2 = spark
    import spark2.implicits._
    val t = Seq(("a", "when", "2024-01-01T00:00:00+02:00"))
      .toDF("s", "p", "o")
    val lbl = Seq(("e", "en", "l")).toDF("entity", "lang", "label")
    val out = graft.plans.SparqlText.run(
      """SELECT ?x ?ym WHERE {
        |  ?x <when> ?d .
        |  BIND(TIMEZONE(?d) AS ?z)
        |  BIND(xsd:yearMonthDuration(?z) AS ?ym)
        |}""".stripMargin, t, lbl).collect()
    assert(out.length === 1)
    // ?z is "PT2H" (dayTime, carrier = 7200 SECONDS); a yearMonth
    // constructor must NOT read 7200 as months (= "P600Y") — the lexical
    // "PT2H" is not a yearMonthDuration, so the cast errors -> unbound
    assert(out.head.getString(1) === null)
  }

  test("ORDER BY a duration-typed variable sorts by VALUE through the " +
      "carrier companion (PT2H before PT10H), not lexically") {
    val spark2 = spark
    import spark2.implicits._
    val t = Seq(
      ("a", "when", "2024-01-01T00:00:00+10:00"),
      ("b", "when", "2024-01-01T00:00:00+02:00"),
      ("c", "when", "2024-01-01T00:00:00-08:00"),
      ("d", "when", "2024-01-01T00:00:00Z")).toDF("s", "p", "o")
    val lbl = Seq(("e", "en", "l")).toDF("entity", "lang", "label")
    val out = graft.plans.SparqlText.run(
      """SELECT ?z WHERE {
        |  ?x <when> ?d .
        |  BIND(TIMEZONE(?d) AS ?z)
        |} ORDER BY ?z""".stripMargin, t, lbl)
      .collect().map(_.getString(0))
    assert(out.toSeq === Seq("-PT8H", "PT0S", "PT2H", "PT10H"))
  }

  test("duration carrier survives a UNION with a plain-binding arm: " +
      "type-correct companion fill, value-order MAX and ORDER BY") {
    val spark2 = spark
    import spark2.implicits._
    // c's <when> is zone-less: its first-arm ?z is unbound, its second
    // arm binds ?z from DATA ("PT2H") — the arm with no carrier column
    val t = Seq(
      ("a", "when", "2024-01-01T00:00:00+10:00"),
      ("b", "when", "2024-01-01T00:00:00+02:00"),
      ("c", "when", "2024-01-01T00:00:00"),
      ("c", "zone", "PT2H")).toDF("s", "p", "o")
    val lbl = Seq(("e", "en", "l")).toDF("entity", "lang", "label")
    // MAX over the unioned ?z must extremize by VALUE (PT10H > PT2H,
    // lexically the reverse) — with a null-STRING companion fill the
    // union widens the carrier to string and this silently degrades
    val agg = graft.plans.SparqlText.run(
      """SELECT (MAX(?z) AS ?hi) (MIN(?z) AS ?lo) WHERE {
        |  { ?x <when> ?d . BIND(TIMEZONE(?d) AS ?z) }
        |  UNION { ?x <zone> ?z . ?x <when> ?d }
        |}""".stripMargin, t, lbl).collect()
    assert(agg.length === 1)
    assert(agg.head.getString(0) === "PT10H")
    assert(agg.head.getString(1) === "PT2H")
    // typed ORDER BY across the union orders by value (unbound first,
    // the §15.1 total-order extension), x as tiebreak
    val ord = graft.plans.SparqlText.run(
      """SELECT ?x ?z WHERE {
        |  { ?x <when> ?d . BIND(TIMEZONE(?d) AS ?z) }
        |  UNION { ?x <zone> ?z . ?x <when> ?d }
        |} ORDER BY ?z ?x""".stripMargin, t, lbl)
      .collect().map(_.getString(0))
    assert(ord.toSeq === Seq("c", "b", "c", "a"))
  }

  test("duration carrier survives deferred-OPTIONAL null-extension " +
      "(type-correct fill on the unmatched side)") {
    val spark2 = spark
    import spark2.implicits._
    val t = Seq(
      ("a", "when", "1"), ("a", "zone2", "PT2H"),
      ("b", "when", "2")).toDF("s", "p", "o")
    val lbl = Seq(("e", "en", "l")).toDF("entity", "lang", "label")
    // the FILTER references the OUTER ?d, forcing the deferred LeftJoin
    // path whose null-extension fills the right side's columns — the
    // __dv_s_z carrier must fill as a DOUBLE or the matched/unmatched
    // union widens it to string
    val out = graft.plans.SparqlText.run(
      """SELECT ?x ?z WHERE {
        |  ?x <when> ?d .
        |  OPTIONAL { ?x <zone2> ?w .
        |             BIND(xsd:dayTimeDuration(?w) AS ?z)
        |             FILTER(?d != "skip") }
        |} ORDER BY ?z ?x""".stripMargin, t, lbl)
      .collect().map(r => (r.getString(0), Option(r.getString(1))))
    assert(out.toSeq === Seq("b" -> None, "a" -> Some("PT2H")))
  }

  test("q304: duration SUM/AVG/MIN/MAX aggregate on the numeric carrier " +
      "and render canonical lexicals; unbound rows group with COUNT 0") {
    val rows = operators.RdfOps.q304DurationAgg(spark, dir).collect()
      .map(r => Option(r.getString(0)) ->
        (r.getLong(1), Option(r.getString(2)), Option(r.getString(3)),
          Option(r.getString(4)), Option(r.getString(5)))).toMap
    assert(rows.size === 3)
    // sf0.001: event_id < 2000 -> 1000 events, 250 per zone slot
    assert(rows(Some("east")) ===
      ((250L, Some("P57DT7H"), Some("PT5H30M"), Some("PT5H30M"),
        Some("PT5H30M"))))
    // nonpositive = 250 x 0s + 250 x -28800s: sum -7200000s = -P83DT8H
    assert(rows(Some("nonpositive")) ===
      ((500L, Some("-P83DT8H"), Some("-PT4H"), Some("-PT8H"),
        Some("PT0S"))))
    // zone-less rows: ?z unbound -> COUNT 0, NULL duration aggregates
    assert(rows(None) === ((0L, None, None, None, None)))
  }

  test("q305: Bradley-Terry ratings equal an in-memory MM reference on " +
      "the same comparisons, ratings normalize to ~1, more wins => " +
      "higher rating among equal-schedule players") {
    val out = TextOps.q305BradleyTerry(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // reference: rebuild comparisons exactly as the operator does
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    val comps = d.sliding(2).collect {
      case Array((i1, s1, c1), (i2, s2, c2))
          if i2 == i1 + 1 && s1 != s2 =>
        (s1, s2, if (c2 > c1) s2 else s1)
    }.toSeq
    val wins = comps.groupBy(_._3).map { case (k, v) => k -> v.size.toLong }
    val pairs = comps
      .groupBy(c => (Seq(c._1, c._2).min, Seq(c._1, c._2).max))
      .map { case (k, v) => k -> v.size.toLong }
    val ed = pairs.toSeq.flatMap { case ((i, j), n) =>
      Seq((i, j, n), (j, i, n)) }
    val players = ed.map(_._1).distinct
    var pm = players.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val dm = ed.groupBy(_._1).map { case (a, es) =>
        a -> es.map { case (_, b, n) =>
          math.round(1e6 * (n.toDouble /
            (math.max(pm(a) + pm(b), 1L).toDouble / 1e6)))
        }.sum
      }
      val prm = players.map { a =>
        a -> math.round(1e6 * (wins.getOrElse(a, 0L).toDouble /
          (math.max(dm(a), 1L).toDouble / 1e6)))
      }.toMap
      val sm = prm.values.sum
      pm = players.map(a =>
        a -> math.round(1e6 * (prm(a).toDouble / sm.toDouble))).toMap
    }
    assert(out.length === players.size)
    out.foreach { case (src, w, p) =>
      assert(w === wins.getOrElse(src, 0L), src)
      assert(p === pm(src).toDouble / 1e6, src)
    }
    // normalization: micro-rounded ratings sum to 1 within rounding slack
    val tot = out.map(_._3).sum
    assert(math.abs(tot - 1.0) < 1e-4, s"ratings sum $tot")
  }

  test("q306: kappa equals the direct confusion-table computation and " +
      "sits in [-1, 1]") {
    val out = TextOps.q306CohenKappa(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, n11, n10, n01, n00) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))
      assert(n === n11 + n10 + n01 + n00)
      val po = (n11 + n00).toDouble / n.toDouble
      val pe = ((n11 + n10).toDouble * (n11 + n01).toDouble +
        (n01 + n00).toDouble * (n10 + n00).toDouble) /
        (n.toDouble * n.toDouble)
      val kappa = r.getAs[java.lang.Double]("kappa")
      if (1.0 - pe == 0.0) assert(kappa == null)
      else {
        assert(math.abs(kappa - (po - pe) / (1.0 - pe)) < 1e-6)
        assert(kappa >= -1.0 - 1e-9 && kappa <= 1.0 + 1e-9)
      }
    }
  }

  test("q310: matryoshka recall ladder is sane — 3 dims x 20 queries, " +
      "n_hit in [0,10], mean recall non-decreasing as the prefix widens") {
    val out = operators.VectorOps.q310MatryoshkaRecall(spark, dir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length === 60)
    assert(out.map(_._1).distinct.sorted.toSeq === Seq(8L, 16L, 32L))
    out.foreach { case (_, _, h, rec) =>
      assert(h >= 0L && h <= 10L)
      assert(math.abs(rec - h / 10.0) < 1e-9)
    }
    val mean = out.groupBy(_._1).view
      .mapValues(rs => rs.map(_._4).sum / rs.length).toMap
    assert(mean(8L) <= mean(16L) + 1e-9)
    assert(mean(16L) <= mean(32L) + 1e-9)
  }

  test("q311: sign-test z matches the direct computation from counts, " +
      "decisive reads the rounded z at 1.96") {
    val out = operators.TextOps.q311WinrateSignificance(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(5)))
    assert(out.nonEmpty)
    out.foreach { case (i, j, n, wi, z, dec) =>
      assert(i < j)
      assert(wi >= 0L && wi <= n)
      val zRef = BigDecimal((2.0 * wi - n) / math.sqrt(n.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(z === zRef, s"$i-$j")
      assert(dec === (math.abs(z) > 1.96), s"$i-$j")
    }
  }

  test("q312: PRF expansion terms exclude the query, weights are " +
      "positive and non-increasing, feedback-doc counts in [1,3]") {
    val out = operators.TextOps.q312PrfExpansion(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(out.length === 8)
    assert(out.map(_._1).toSet.intersect(Set("join", "hash", "scan")).isEmpty)
    assert(out.forall(_._2 > 0.0))
    assert(out.forall(t => t._3 >= 1L && t._3 <= 3L))
    // the operator emits in rank order (TakeOrdered): non-increasing w
    val ws = out.map(_._2)
    ws.indices.drop(1).foreach(i => assert(ws(i - 1) >= ws(i)))
  }

  test("q313: Neyman allocation spends exactly the budget, allocates " +
      "in n*sh order, and reproduces the direct integer-algebra std dev") {
    val out = operators.TextOps.q313NeymanAllocation(spark, dir)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.map(_._4).sum === 100L, "largest-remainder must spend B")
    assert(out.forall(_._3 >= 0.0))
    // reference: per-source std dev from the raw micro-quality values
    val q = operators.TextOps.q40Quality(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "source"),
        "doc_id")
      .select(col("source"), round(col("quality") * 1e4).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val ref = q.groupBy(_._1).map { case (src, xs) =>
      val v = xs.map(_._2)
      val (n, s1, s2) =
        (v.length.toLong, v.sum, v.map(x => x * x).sum)
      src -> math.sqrt((n * s2 - s1 * s1).toDouble / (n.toDouble * n))
    }
    out.foreach { case (src, n, sh, _) =>
      assert(n === q.count(_._1 == src).toLong, src)
      assert(math.abs(sh - ref(src)) < 5e-5, src)
    }
    // monotone-ish: allocation order follows the n*sh weight order
    // (largest remainder can flip equal-weight neighbors by at most 1)
    val byW = out.sortBy(t => -t._2 * ref(t._1))
    byW.sliding(2).foreach {
      case Array(a, b) => assert(a._4 >= b._4 - 1L, s"${a._1} vs ${b._1}")
      case _ => ()
    }
  }

  test("q307: preference pairs are top-vs-bottom within source, margins " +
      "non-negative, chosen and rejected sets disjoint, <= 8 per source") {
    val out = TextOps.q307PreferencePairs(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.length <= 8, src)
      assert(rows.map(_._2).distinct.length === rows.length, src)
    }
    val chosen = out.map(_._3).toSet
    val rejected = out.map(_._4).toSet
    assert(chosen.intersect(rejected).isEmpty)
    assert(out.forall(_._5 >= 0L), "margin >= 0 (chosen is the longer doc)")
    // spot-check rank-1 pair for one source against a direct sort
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = d.groupBy(_._2)
    out.filter(_._2 == 1L).foreach { case (src, _, ch, rj, _) =>
      val sorted = bySrc(src).sortBy(t => (-t._3, t._1))
      assert(ch === sorted.head._1, s"$src chosen")
      assert(rj === sorted.last._1, s"$src rejected")
    }
  }
}
