package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.plans.SparqlText

/** Duration algebra (§17 operator maps) under the round-14 value-carrier
  * design: TyDur/TyDurYM compile to their numeric carrier (seconds /
  * months as double), the lexical parses once at rung entry and renders
  * once at output boundaries. Round 13 shipped the algebra with ZERO
  * executions — the lexical-carrier version hung whole-stage codegen on
  * its first query (q277) and erased the round's artifacts; every test
  * here EXECUTES a plan, so a recurrence is one `sbt test` away from
  * being named. Oracles are spec-local (an independent canonical
  * renderer, java.time for dateTime arithmetic) — mutating
  * durationLexicalOfSeconds/durationSeconds fails them. */
class DurationAlgebraSpec extends SparkSpec {
  import spark.implicits._

  private def forAll[T](g: Gen[T], n: Int = 20)(f: T => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(1414L + i)).foreach(f)
    }

  private lazy val one = Seq(("s", "p", "o")).toDF("s", "p", "o")
  private lazy val lbl = Seq(("e", "en", "l")).toDF("entity", "lang", "label")

  /** Independent canonical xsd:dayTimeDuration renderer (the spec's own
    * oracle — deliberately NOT sharing code with the engine). */
  private def canonSec(sec: Long): String = {
    if (sec == 0) return "PT0S"
    val a = math.abs(sec)
    val (d, h, m, s) = (a / 86400, a % 86400 / 3600, a % 3600 / 60, a % 60)
    val time =
      (if (h > 0) s"${h}H" else "") + (if (m > 0) s"${m}M" else "") +
        (if (s > 0) s"${s}S" else "")
    (if (sec < 0) "-" else "") + "P" +
      (if (d > 0) s"${d}D" else "") +
      (if (time.nonEmpty) "T" + time else "")
  }

  private def canonMo(months: Long): String = {
    if (months == 0) return "P0M"
    val a = math.abs(months)
    (if (months < 0) "-" else "") + "P" +
      (if (a / 12 > 0) s"${a / 12}Y" else "") +
      (if (a % 12 > 0) s"${a % 12}M" else "")
  }

  test("render∘parse roundtrip: durationLexicalOfSeconds emits the " +
      "canonical lexical and durationSeconds parses it back exactly") {
    val secs = (0 until 400).map(i =>
      Gen.chooseNum(-5000000L, 5000000L)
        .apply(Gen.Parameters.default, Seed(99L + i)).get) ++
      Seq(0L, 1L, -1L, 59L, 60L, 86399L, 86400L, -86401L, 90000L)
    val rows = secs.toDF("sec")
      .withColumn("lex",
        SparqlText.durationLexicalOfSeconds(col("sec").cast("double")))
      .withColumn("back", SparqlText.durationSeconds(col("lex")))
      .collect()
    rows.foreach { r =>
      val sec = r.getLong(0)
      assert(r.getString(1) == canonSec(sec),
        s"non-canonical render for $sec: ${r.getString(1)}")
      assert(r.getDouble(2) == sec.toDouble, s"roundtrip broke at $sec")
    }
  }

  test("months twin: durationLexicalOfMonths canonical + roundtrip") {
    val months = (-40L to 40L) ++ Seq(0L, 11L, 12L, 13L, -23L, 1200L)
    val rows = months.toDF("m")
      .withColumn("lex",
        SparqlText.durationLexicalOfMonths(col("m").cast("double")))
      .withColumn("back", SparqlText.durationMonths(col("lex")))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == canonMo(r.getLong(0)))
      assert(r.getDouble(2) == r.getLong(0).toDouble)
    }
  }

  test("§17 operator map through the full SPARQL front-end: " +
      "dayTimeDuration + - × number ÷ number, all against the " +
      "spec-local oracle") {
    val g = Gen.zip(Gen.chooseNum(-80000L, 80000L),
      Gen.chooseNum(-500000L, 500000L), Gen.chooseNum(1, 7))
    forAll(g, n = 8) { case (base, b, k) =>
      val a = base * k // divisible, so ÷k is exact on the double carrier
      val (la, lb) = (canonSec(a), canonSec(b))
      val r = SparqlText.run(
        s"""SELECT ("$la"^^xsd:dayTimeDuration + "$lb"^^xsd:dayTimeDuration AS ?add)
           |       ("$la"^^xsd:dayTimeDuration - "$lb"^^xsd:dayTimeDuration AS ?sub)
           |       ("$la"^^xsd:dayTimeDuration * $k AS ?mul)
           |       ("$la"^^xsd:dayTimeDuration / $k AS ?divn)
           |WHERE { ?x <p> ?o }""".stripMargin, one, lbl).head()
      assert(r.getString(0) == canonSec(a + b), s"add $a $b")
      assert(r.getString(1) == canonSec(a - b), s"sub $a $b")
      assert(r.getString(2) == canonSec(a * k), s"mul $a $k")
      assert(r.getString(3) == canonSec(base), s"div $a $k")
    }
    // op:divide-dayTimeDuration-by-dayTimeDuration → the dimensionless
    // decimal (xs:decimal per the XPath operator map)
    val q = SparqlText.run(
      """SELECT ("PT6H"^^xsd:dayTimeDuration /
        |        "PT2H30M"^^xsd:dayTimeDuration AS ?q)
        |WHERE { ?x <p> ?o }""".stripMargin, one, lbl).head()
    assert(q.getDouble(0) == 21600.0 / 9000.0)
  }

  test("duration comparison orders by VALUE through the carrier " +
      "(PT10H > PT2H, which lexical order gets backwards)") {
    assert(SparqlText.run(
      """SELECT ?x WHERE { ?x <p> ?o .
        |  FILTER("PT10H"^^xsd:dayTimeDuration >
        |         "PT2H"^^xsd:dayTimeDuration) }""".stripMargin,
      one, lbl).count() == 1)
    assert(SparqlText.run(
      """SELECT ?x WHERE { ?x <p> ?o .
        |  FILTER("-PT1S"^^xsd:dayTimeDuration <
        |         "PT0S"^^xsd:dayTimeDuration) }""".stripMargin,
      one, lbl).count() == 1)
  }

  test("dateTime ± dayTimeDuration matches java.time on the zone-less " +
      "core, zone suffix preserved verbatim") {
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss")
    val g = Gen.zip(Gen.chooseNum(0L, 2000000000L),
      Gen.oneOf("Z", "+05:30", "-08:00", "+00:00"),
      Gen.chooseNum(-2000000L, 2000000L))
    forAll(g, n = 10) { case (epoch, zone, shift) =>
      val core = java.time.LocalDateTime
        .ofEpochSecond(epoch, 0, java.time.ZoneOffset.UTC)
      val lex = core.format(fmt) + zone
      val op = if (shift < 0) "-" else "+"
      val durLex = canonSec(math.abs(shift))
      val r = SparqlText.run(
        s"""SELECT (?o $op "$durLex"^^xsd:dayTimeDuration AS ?t)
           |WHERE { ?x <p> ?o }""".stripMargin,
        Seq(("s", "p", lex)).toDF("s", "p", "o"), lbl).head()
      assert(r.getString(0) == core.plusSeconds(shift).format(fmt) + zone,
        s"shift $lex by $shift")
    }
  }

  test("yearMonthDuration algebra + the month-clamped dateTime shift " +
      "(java.time's own add-months rule)") {
    val r = SparqlText.run(
      """SELECT ("P1Y"^^xsd:yearMonthDuration +
        |        "P11M"^^xsd:yearMonthDuration AS ?a)
        |       ("P2Y3M"^^xsd:yearMonthDuration -
        |        "P5M"^^xsd:yearMonthDuration AS ?b)
        |       ("P7M"^^xsd:yearMonthDuration * 3 AS ?c)
        |WHERE { ?x <p> ?o }""".stripMargin, one, lbl).head()
    assert(r.getString(0) == "P1Y11M")
    assert(r.getString(1) == "P1Y10M")
    assert(r.getString(2) == "P1Y9M")
    // day-of-month clamps to the target month's last day (leap February)
    val t = Seq(("s", "p", "2024-01-31T23:59:59+05:30")).toDF("s", "p", "o")
    val r2 = SparqlText.run(
      """SELECT (?o + "P1M"^^xsd:yearMonthDuration AS ?t)
        |WHERE { ?x <p> ?o }""".stripMargin, t, lbl).head()
    assert(r2.getString(0) == "2024-02-29T23:59:59+05:30")
  }

  test("q277 executes end-to-end with the oracle's exact values — the " +
      "round-13 codegen-hang regression guard (one execution would have " +
      "caught it)") {
    val rows = graft.operators.RdfOps
      .q277DurationArith(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    // SELECT ?x ?zsum ?later ?ym: zone+PT1H30M per surviving zone class
    assert(rows.map(_.getString(1)).toSet ==
      Set("PT1H30M", "PT7H", "-PT6H30M"))
    assert(rows.map(_.getString(3)).toSet == Set("P1Y11M"))
  }
}
