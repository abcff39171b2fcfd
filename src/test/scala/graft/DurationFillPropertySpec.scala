package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generator-driven coverage of the duration-carrier FILL paths
  * (round-14 verdict task 6: the round's own self-review caught a
  * type-widening bug in exactly this neighborhood, commit 6261270) —
  * random lexicals pushed through the set-op boundaries where
  * companionFill runs (UNION arm normalization with aggregates on top,
  * deferred-OPTIONAL null-extension with typed ORDER BY on top), checked
  * against an INDEPENDENT in-memory model of XSD dayTimeDuration
  * parse/render. A mutation of companionFill (e.g. the null-STRING fill
  * that widens the carrier) flips the value-ordering asserts here. */
class DurationFillPropertySpec extends SparkSpec {

  private def forAll[T](g: Gen[T], n: Int = 15)(f: T => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(1500L + i)).foreach(f)
    }

  /** Independent reference parse: signed total seconds, None off-grammar. */
  private def parseSec(lex: String): Option[Long] = {
    val m = ("^(-?)P(?=\\d|T\\d)(?:(\\d+)D)?" +
      "(?:T(?=\\d)(?:(\\d+)H)?(?:(\\d+)M)?(?:(\\d+)S)?)?$").r
    lex match {
      case m(sign, d, h, mi, s) =>
        def v(x: String) = Option(x).map(_.toLong).getOrElse(0L)
        val t = v(d) * 86400L + v(h) * 3600L + v(mi) * 60L + v(s)
        Some(if (sign == "-") -t else t)
      case _ => None
    }
  }

  /** Independent reference render: canonical lexical of signed seconds. */
  private def render(sec: Long): String =
    if (sec == 0L) "PT0S"
    else {
      val a = math.abs(sec)
      val (d, h, mi, s) = (a / 86400, a % 86400 / 3600, a % 3600 / 60, a % 60)
      val time = (if (h > 0) s"${h}H" else "") +
        (if (mi > 0) s"${mi}M" else "") + (if (s > 0) s"${s}S" else "")
      (if (sec < 0) "-" else "") + "P" +
        (if (d > 0) s"${d}D" else "") + (if (time.nonEmpty) "T" + time else "")
    }

  /** Lexical generator: possibly NON-canonical magnitudes (73M, 100S —
    * the grammar admits them; value is the component sum), both signs. */
  private val durLex: Gen[String] = for {
    neg <- Gen.oneOf(true, false)
    d <- Gen.choose(0, 2); h <- Gen.choose(0, 30)
    mi <- Gen.choose(0, 75); s <- Gen.choose(0, 75)
  } yield
    if (d == 0 && h == 0 && mi == 0 && s == 0) "PT0S"
    else {
      val time = (if (h > 0) s"${h}H" else "") +
        (if (mi > 0) s"${mi}M" else "") + (if (s > 0) s"${s}S" else "")
      (if (neg) "-" else "") + "P" + (if (d > 0) s"${d}D" else "") +
        (if (time.nonEmpty) "T" + time else "")
    }
  private val junk: Gen[String] = Gen.oneOf(
    "apple", "P", "PT", "1D", "P-3D", "PXD", "2024-01-01", "pt5s", "P5.5D")
  private val lex: Gen[String] = Gen.frequency(4 -> durLex, 1 -> junk)

  private case class RowG(x: String, g: String, v: String, arm1: Boolean)
  private val rows: Gen[List[RowG]] =
    Gen.choose(3, 12).flatMap { n =>
      Gen.sequence[List[RowG], RowG]((0 until n).toList.map { i =>
        for {
          g <- Gen.oneOf("g0", "g1")
          v <- lex
          arm1 <- Gen.oneOf(true, false)
        } yield RowG(f"x$i%02d", g, v, arm1)
      })
    }

  test("UNION fill + §18.5 aggregates on random lexicals: SUM/AVG match " +
      "the in-memory model (unbound on mixed groups), MIN/MAX extremize " +
      "by VALUE among duration members") {
    val spark2 = spark
    import spark2.implicits._
    forAll(rows) { rs =>
      val triples = rs.flatMap { r =>
        Seq((r.x, "grp", r.g),
          (r.x, if (r.arm1) "dur" else "raw", r.v))
      }.toDF("s", "p", "o")
      val lbl = Seq(("e", "en", "l")).toDF("entity", "lang", "label")
      val out = graft.plans.SparqlText.run(
        """SELECT ?g (SUM(?z) AS ?su) (AVG(?z) AS ?av)
          |       (MIN(?z) AS ?lo) (MAX(?z) AS ?hi) WHERE {
          |  { ?x <dur> ?w . BIND(xsd:dayTimeDuration(?w) AS ?z) .
          |    ?x <grp> ?g }
          |  UNION { ?x <raw> ?z . ?x <grp> ?g }
          |} GROUP BY ?g""".stripMargin, triples, lbl)
        .collect().map(r => r.getString(0) ->
          (Option(r.getString(1)), Option(r.getString(2)),
            Option(r.getString(3)), Option(r.getString(4)))).toMap
      rs.groupBy(_.g).foreach { case (g, members) =>
        // arm-1 junk -> constructor errors -> z UNBOUND (skipped, never
        // a mixed trigger); arm-2 junk -> z bound to a non-duration
        // string -> the §18.5 mixed-multiset type error for SUM/AVG
        val parsed = members.flatMap(r => parseSec(r.v))
        val mixed = members.exists(r => !r.arm1 && parseSec(r.v).isEmpty)
        val (su, av, lo, hi) = out(g)
        if (mixed) {
          assert(su === None, s"SUM must be unbound on mixed group $g")
          assert(av === None, s"AVG must be unbound on mixed group $g")
        } else if (parsed.nonEmpty) {
          assert(su === Some(render(parsed.sum)), s"SUM in $g")
          if (parsed.sum % parsed.size == 0)
            assert(av === Some(render(parsed.sum / parsed.size)),
              s"AVG in $g")
          else assert(av.nonEmpty, s"AVG must bind in unmixed $g")
        }
        if (parsed.nonEmpty) {
          assert(lo === Some(render(parsed.min)), s"MIN in $g")
          assert(hi === Some(render(parsed.max)), s"MAX in $g")
        } else if (!mixed)
          // no duration member anywhere: nothing to extremize
          assert(lo === None && hi === None, s"empty group $g")
      }
    }
  }

  test("deferred-OPTIONAL null-extension fill on random lexicals: typed " +
      "ORDER BY sorts unbound first, then by VALUE, tiebreak on ?x") {
    val spark2 = spark
    import spark2.implicits._
    forAll(rows) { rs =>
      val triples = rs.flatMap { r =>
        // arm1=false rows get NO <dur> triple: the OPTIONAL misses and
        // null-extends — the fill path under test
        Seq((r.x, "grp", r.g)) ++
          (if (r.arm1) Seq((r.x, "dur", r.v)) else Nil)
      }.toDF("s", "p", "o")
      val lbl = Seq(("e", "en", "l")).toDF("entity", "lang", "label")
      val got = graft.plans.SparqlText.run(
        """SELECT ?x ?z WHERE {
          |  ?x <grp> ?g .
          |  OPTIONAL { ?x <dur> ?w .
          |             BIND(xsd:dayTimeDuration(?w) AS ?z)
          |             FILTER(?g != "skip") }
          |} ORDER BY ?z ?x""".stripMargin, triples, lbl)
        .collect().map(r => (r.getString(0), Option(r.getString(1))))
      val expected = rs.map { r =>
        val sec = if (r.arm1) parseSec(r.v) else None
        (r.x, sec.map(render))
      }.sortBy { case (x, z) =>
        val sec = z.map(parseSec(_).get)
        (sec.isDefined, sec.getOrElse(0L), x)
      }
      assert(got.toSeq === expected,
        s"typed order drifted:\n got=${got.toSeq}\n want=$expected")
    }
  }
}
