package graft

import org.apache.spark.sql.functions._
import graft.functions.Registry

/** P3–P9 edge cases lifted from the reference code paths
  * (wikidata_index.py:15-126). */
class RegistrySpec extends SparkSpec {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column, input: String): Any =
    Seq(input).toDF("x").select(c.as("r")).collect()(0).get(0)

  test("P3: URI-valued date nulls out; ISO datetime truncates at T") {
    assert(eval1(Registry.datePostprocessing($"x"), "http://www.wikidata.org/t/1") == null)
    assert(eval1(Registry.datePostprocessing($"x"), "1903-07-01T00:00:00Z") == "1903-07-01")
    assert(eval1(Registry.datePostprocessing($"x"), "1903-07-01") == "1903-07-01")
  }

  test("P4: concatenated dates split, clean, rejoin; URI parts dropped") {
    assert(eval1(Registry.concatenatedDatesPostprocessing($"x"),
      "1903-07-01T00:00:00Z 1910-01-01T00:00:00Z") == "1903-07-01 / 1910-01-01")
    assert(eval1(Registry.concatenatedDatesPostprocessing($"x"),
      "1903-07-01T00:00:00Z http://x.org/t") == "1903-07-01")
  }

  test("P5: WKT point parses lat/lng; non-point nulls") {
    assert(eval1(Registry.geopointLat($"x"), "Point (16.37 48.2)") == 48.2)
    assert(eval1(Registry.geopointLng($"x"), "Point (16.37 48.2)") == 16.37)
    assert(eval1(Registry.geopointLat($"x"), "not a point") == null)
  }

  test("P6: priority pick with fallback-to-first and empty input") {
    val pick = Registry.featureCodePick($"x", Seq("PPL", "ADM1"))
    assert(eval1(pick, "X PPL ADM1") == "PPL")
    assert(eval1(pick, "ADM1 X") == "ADM1")
    assert(eval1(pick, "X Y Z") == "X")
  }

  test("P7: person label null-guards (reference branches on key presence)") {
    val l = Registry.labelPerson($"n", $"b", $"d", $"desc")
    def run(n: String, b: String, d: String, desc: String) =
      Seq((n, Option(b), Option(d), Option(desc))).toDF("n", "b", "d", "desc")
        .select(l.as("r")).collect()(0).getString(0)
    assert(run("A", "1903-07-01", "1990-01-02", "poet") == "A (1903 - 1990): poet")
    assert(run("A", "1903-07-01", null, "poet") == "A (1903 - ): poet")
    assert(run("A", null, null, null) == "A")
  }

  test("P9: organization label requires >4-char dates; parens balanced") {
    val l = Registry.labelOrganization($"n", $"i", $"d", $"desc")
    def run(n: String, i: String, d: String, desc: String) =
      Seq((n, Option(i), Option(d), Option(desc))).toDF("n", "i", "d", "desc")
        .select(l.as("r")).collect()(0).getString(0)
    assert(run("Org", "1903-01-01", "1990-12-31", "club") == "Org (1903-01-01 - 1990-12-31): club")
    assert(run("Org", "1903", null, null) == "Org") // len==4 → no date part
    // dissolvement-only: the reference appends "( - " with no leading space
    assert(run("Org", null, "1990-12-31", null) == "Org( - 1990-12-31)")
    // inception-only: unclosed "(" triggers the reference's "-)" fixup
    assert(run("Org", "1903-01-01", null, null) == "Org (1903-01-01-)")
    assert(run("Org", "1903-01-01", "1990", "c") == "Org (1903-01-01-): c")
  }

  test("id normalization takes the URI tail") {
    assert(eval1(Registry.normalizeId($"x", "http://ex.org/entity/"),
      "http://www.wikidata.org/entity/Q42") == "http://ex.org/entity/Q42")
  }
}
