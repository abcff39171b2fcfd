package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.sources.{HttpPageFetcher, RetryingFetcher, SparqlResultsJson}

/** HTTP transport for the PageFetcher seam, driven against an
  * in-process loopback HttpServer stub (zero egress in the sandbox —
  * the stub plays the SPARQL endpoint's wire role: query-param echo,
  * short-page end, 404 past the end, transient 503s). A production
  * deployment swaps the stub's URL for the real endpoint — same
  * fetcher, same pagination loop, same parser. */
class HttpPageFetcherSpec extends SparkSpec {

  private val template =
    "SELECT ?s ?p ?o WHERE { ?s ?p ?o } OFFSET $offset LIMIT $limit"

  private def pageBody(ids: Seq[Int]): String = {
    val bindings = ids.map { i =>
      s"""{ "s": { "type": "uri", "value": "http://x/E$i" },
         |  "p": { "type": "uri", "value": "http://x/name" },
         |  "o": { "type": "literal", "value": "entity $i" } }""".stripMargin
    }.mkString(",\n")
    s"""{ "head": { "vars": ["s", "p", "o"] },
       |  "results": { "bindings": [ $bindings ] } }""".stripMargin
  }

  /** Loopback endpoint serving `total` bindings in `limit`-sized pages:
    * decodes the query param, reads OFFSET/LIMIT back out of the
    * substituted query text, records every received query + header. */
  private def withServer(total: Int, flakyFirst: Int = 0)
                        (body: (String, java.util.List[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val received = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val failures = new AtomicInteger(flakyFirst)
    server.createContext("/sparql", (ex: HttpExchange) => {
      val raw = ex.getRequestURI.getRawQuery
      val q = java.net.URLDecoder.decode(
        raw.split("&").find(_.startsWith("query=")).get.drop(6), "UTF-8")
      received.add(q + "|accept=" +
        ex.getRequestHeaders.getFirst("Accept") + "|ua=" +
        ex.getRequestHeaders.getFirst("User-Agent"))
      val off = "OFFSET (\\d+)".r.findFirstMatchIn(q).get.group(1).toInt
      val lim = "LIMIT (\\d+)".r.findFirstMatchIn(q).get.group(1).toInt
      def respond(code: Int, s: String): Unit = {
        val b = s.getBytes(UTF_8)
        ex.sendResponseHeaders(code, b.length)
        ex.getResponseBody.write(b)
        ex.close()
      }
      if (failures.getAndDecrement() > 0) respond(503, "over capacity")
      else if (off >= total) respond(404, "range exhausted")
      else respond(200, pageBody(off until math.min(off + lim, total)))
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/sparql", received)
    finally server.stop(0)
  }

  test("GET with $offset/$limit substitution, Accept negotiation, and " +
      "short-page stop; staged pages parse to the bindings frame") {
    withServer(total = 5) { (endpoint, received) =>
      val spool = java.nio.file.Files
        .createTempDirectory("httpspool").toString
      val fetcher = new HttpPageFetcher(endpoint, template)
      val df = SparqlResultsJson.bindingsVia(spark, fetcher, 2, spool)
      assert(df.count() == 5)
      assert(df.select("s").collect().map(_.getString(0)).sorted.toSeq ==
        (0 until 5).map(i => s"http://x/E$i"))
      // pages at offsets 0,2,4 — the 1-row page at 4 is the short-page
      // stop, so offset 6 is never requested
      val queries = received.toArray(Array.empty[String]).toSeq
      assert(queries.length == 3)
      assert(queries.head.contains("OFFSET 0 LIMIT 2"))
      assert(queries.last.contains("OFFSET 4 LIMIT 2"))
      assert(queries.forall(_.contains(
        "accept=application/sparql-results+json")))
      assert(queries.forall(_.contains("ua=graft-sparql/1.0")))
    }
  }

  test("404 past the end maps to None (exact-multiple corpus: the loop " +
      "needs the next page to learn it is done)") {
    withServer(total = 4) { (endpoint, _) =>
      val fetcher = new HttpPageFetcher(endpoint, template)
      assert(fetcher.fetch(0, 2).isDefined)
      assert(fetcher.fetch(2, 2).isDefined)
      assert(fetcher.fetch(4, 2).isEmpty)
    }
  }

  test("404 on the FIRST page throws (a wrong endpoint path must surface " +
      "as an error, not a silently empty dataset — real SPARQL endpoints " +
      "answer 200 with empty bindings past the end)") {
    withServer(total = 0) { (endpoint, _) =>
      val fetcher = new HttpPageFetcher(endpoint, template)
      intercept[java.io.IOException](fetcher.fetch(0, 2))
    }
  }

  test("transient 5xx throws, and RetryingFetcher recovers it with the " +
      "reference's exponential backoff (retries resume the SAME page)") {
    withServer(total = 2, flakyFirst = 2) { (endpoint, received) =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val http = new HttpPageFetcher(endpoint, template)
      intercept[java.io.IOException](http.fetch(0, 2)) // first 503 surfaces
      val retrying = new RetryingFetcher(http, maxRetries = 6,
        backoffMs = 30L, sleeper = sleeps.append(_))
      // second 503 is absorbed by the decorator, third attempt succeeds
      assert(retrying.fetch(0, 2).isDefined)
      assert(sleeps.toSeq == Seq(30L)) // one retry, first backoff step
      assert(received.size == 3) // 503, 503, 200 — all for offset 0
    }
  }
}
