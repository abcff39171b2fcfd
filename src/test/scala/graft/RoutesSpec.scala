package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.Routes

/** S6/P12/P13 driver-side config functions (no Spark session needed). */
class RoutesSpec extends AnyFunSuite {

  test("P12: normalizeRoute strips and joins slashes with trailing slash") {
    assert(Routes.normalizeRoute("http://api.example", "persons") ==
      "http://api.example/persons/")
    assert(Routes.normalizeRoute("http://api.example/", "/persons/") ==
      "http://api.example/persons/")
    assert(Routes.normalizeRoute("http://api.example//", "") ==
      "http://api.example/")
  }

  test("S6: processRoutes keeps explicit routes, selects tagged, drops templated") {
    val swagger = Map(
      "/persons" -> Seq("entities", "public"),
      "/places" -> Seq("entities"),
      "/persons/{id}" -> Seq("entities"), // templated → dropped
      "/admin" -> Seq("internal"))       // tag not requested → dropped
    val got = Routes.processRoutes(
      routes = Seq("events"),
      swaggerPaths = swagger,
      apiUrl = "http://api.example/",
      tags = Seq("entities"))
    assert(got == Seq(
      "http://api.example/events/",
      "http://api.example/persons/",
      "http://api.example/places/"))
  }

  test("S6: explicit + discovered de-duplicate") {
    val got = Routes.processRoutes(Seq("persons"),
      Map("/persons" -> Seq("t")), "http://x", Seq("t"))
    assert(got == Seq("http://x/persons/"))
  }

  test("P13: formatDuration") {
    assert(Routes.formatDuration(0) == "0h 0m 0s")
    assert(Routes.formatDuration(59) == "0h 0m 59s")
    assert(Routes.formatDuration(3661) == "1h 1m 1s")
    assert(Routes.formatDuration(7322) == "2h 2m 2s")
    intercept[IllegalArgumentException](Routes.formatDuration(-1))
  }
}
