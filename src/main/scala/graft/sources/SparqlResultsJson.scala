package graft.sources

import java.util

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SPARQL 1.1 Query Results JSON source (SURVEY.md §2.1 S1's optional
  * remote-fetch variant): parses the W3C results format —
  * `{"head":{"vars":[…]},"results":{"bindings":[{v:{"type":…,"value":…,
  * "xml:lang":…,"datatype":…}}]}}` — into a bindings DataFrame with full
  * term fidelity. This is the page-body format the reference actually
  * consumes (prosnet-prefect-pipelines/wikidata_index.py:129-152 walks
  * exactly these bindings dicts, reading `type`/`value`/`xml:lang` per
  * variable).
  *
  * Shape: one page FILE = one InputPartition (the reference's serial
  * `$offset/$limit` page loop becomes cluster-parallel parsing, the same
  * move [[PagedSourceProvider]] makes for the generated stand-in). A
  * production endpoint adapter swaps the file-open for the HTTP GET that
  * produced the page and keeps everything else — schema inference from
  * `head.vars`, per-page readers, the fidelity columns.
  *
  * Schema: per result variable `v`, four string columns — `v` (the
  * lexical value) plus the engine's hidden term companions `__kind_v`
  * (iri | literal | bnode), `__lang_v`, `__dt_v` (SparqlText's
  * kindCol/langCol/dtCol naming, so a bindings frame joins into compiled
  * SPARQL plans with fidelity intact). A variable absent from a solution
  * (SPARQL allows partial bindings) yields NULLs in all four.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.SparqlJsonPagedProvider")
  *   .option("dir", "/path/with/page-*.json").load()
  * }}}
  */
class SparqlJsonPagedProvider extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = Option(options.get("dir")).getOrElse(
      sys.error("SparqlJsonPagedProvider requires a 'dir' option"))
    val pages = SparqlResultsJson.listPages(dir)
    require(pages.nonEmpty, s"no .json result pages under $dir")
    SparqlResultsJson.schemaFor(
      SparqlResultsJson.headVars(SparqlResultsJson.readTree(pages.head,
        graft.util.Fs.hadoopConf())))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new SparqlJsonTable(opts.get("dir"), schema)
  }
}

private class SparqlJsonTable(dir: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"sparql-results-json($dir)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = tableSchema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        SparqlResultsJson.listPages(dir)
          .map(p => SparqlJsonPagePartition(p): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new SparqlJsonReaderFactory(tableSchema,
          new org.apache.spark.util.SerializableConfiguration(
            graft.util.Fs.hadoopConf()))
    }
}

private case class SparqlJsonPagePartition(path: String) extends InputPartition

private class SparqlJsonReaderFactory(schema: StructType,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  // vars recovered structurally: schemaFor emits exactly 4 columns per
  // var with the value column first, so take every 4th field. (A prefix
  // filter would misread legal SPARQL vars that start with "__".)
  private val vars: Seq[String] =
    schema.fieldNames.toSeq.grouped(4).map(_.head).toSeq

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val SparqlJsonPagePartition(path) = partition
    new PartitionReader[InternalRow] {
      // one page = one bounded HTTP response body — parsed whole, like
      // the reference's per-page json.loads
      private val root = SparqlResultsJson.readTree(path, conf.value)
      private val pageVars = SparqlResultsJson.headVars(root)
      require(pageVars.forall(vars.contains),
        s"page $path declares vars $pageVars outside the table schema $vars")
      private val bindings = root.path("results").path("bindings")
      private var i = -1
      override def next(): Boolean = { i += 1; i < bindings.size() }
      override def get(): InternalRow = {
        val sol = bindings.get(i)
        val out = new Array[Any](vars.size * 4)
        var j = 0
        vars.foreach { v =>
          val b = sol.get(v)
          if (b != null && !b.isMissingNode) {
            out(j) = UTF8String.fromString(b.path("value").asText(""))
            out(j + 1) = UTF8String.fromString(b.path("type").asText("") match {
              case "uri" => "iri"
              // SPARQL 1.0 JSON wrote typed literals as "typed-literal"
              case "typed-literal" => "literal"
              case other => other // literal | bnode
            })
            out(j + 2) =
              if (b.has("xml:lang")) UTF8String.fromString(b.get("xml:lang").asText)
              else null
            out(j + 3) =
              if (b.has("datatype")) UTF8String.fromString(b.get("datatype").asText)
              else null
          } // else: unbound in this solution — all four stay null
          j += 4
        }
        new GenericInternalRow(out)
      }
      override def close(): Unit = ()
    }
  }
}

/** Transport seam for the paged results fetch: one call = one page body
  * (the W3C results-JSON text an endpoint returns for `$query OFFSET
  * $offset LIMIT $limit`). `None` means "past the last page" — the
  * pagination loop's stop signal (the reference stops on a short/empty
  * bindings page; a fetcher may equally stop on HTTP 416 or an empty
  * body). Implementations: [[DiskPageFetcher]] (the sandbox fixture
  * path), a production HTTP fetcher (SPARQLWrapper-shaped GET — not
  * buildable here: zero egress), both usually wrapped in
  * [[RetryingFetcher]] for the reference's retry/backoff/rate-limit
  * semantics (prosnet-prefect-pipelines/wikidata_index.py:129-152). */
trait PageFetcher extends Serializable {
  def fetch(offset: Long, limit: Long): Option[String]
}

/** Fixture transport: page `offset/limit` is the (offset/limit)-th
  * name-sorted .json file under `dir` — the disk stand-in for the HTTP
  * responses, sharing the parser and pagination loop with a live
  * fetcher. Offsets must land on page boundaries (they do by
  * construction: the loop advances by `limit`). */
final class DiskPageFetcher(dir: String) extends PageFetcher {
  override def fetch(offset: Long, limit: Long): Option[String] = {
    require(limit > 0 && offset % limit == 0,
      s"offset $offset is not a multiple of the page limit $limit")
    val pages = SparqlResultsJson.listPages(dir)
    val idx = (offset / limit).toInt
    if (idx >= pages.length) None
    else {
      val p = new org.apache.hadoop.fs.Path(pages(idx))
      val fs = p.getFileSystem(graft.util.Fs.hadoopConf())
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }
}

/** Production HTTP transport for the seam — the reference's primary mode
  * (SPARQLWrapper GET against a live endpoint,
  * prosnet-prefect-pipelines/wikidata_index.py:129-152): one fetch = one
  * GET of the query template with `$offset`/`$limit` substituted (the
  * reference's own `string.Template` placeholders), results-JSON
  * negotiated via the Accept header. Status mapping: 200 → the page
  * body; 416 → `None` (the range-exhausted signal); 404 → `None` only
  * AFTER a successful page (past-the-end on REST-ish endpoints), else
  * an error (a first-page 404 is a wrong endpoint path — real SPARQL
  * endpoints answer 200 with empty bindings past the end, so mapping
  * it to `None` would yield a silently empty dataset);
  * anything else THROWS so a wrapping [[RetryingFetcher]]
  * applies the reference's retry/backoff policy (its Prefect task
  * declares retries=6 with exponential backoff; pass
  * `new RetryingFetcher(httpFetcher, maxRetries = 6, backoffMs = 30000,
  * pageDelayMs = ...)` for the same schedule plus the wikidata rate
  * limit). The HttpClient is transient-lazy: fetchers cross the driver→
  * executor boundary inside DSv2 partitions, and the client rebuilds on
  * first use per JVM. Spec'd against an in-process HttpServer stub (the
  * sandbox has zero egress); a production deployment is a constructor
  * swap on [[SparqlResultsJson.bindingsVia]], not new code. */
final class HttpPageFetcher(
    endpoint: String,
    queryTemplate: String,
    timeoutMs: Long = 60000L,
    userAgent: String = "graft-sparql/1.0") extends PageFetcher {
  require(queryTemplate.contains("$offset") && queryTemplate.contains("$limit"),
    "query template must carry $offset/$limit placeholders")
  @transient private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
    .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
    .build()
  // Whether any page has fetched successfully (the loop is sequential
  // within a partition, so a plain var suffices). Gates the 404→end
  // mapping: real SPARQL endpoints — including Wikidata, the
  // reference's target — answer 200 with empty bindings past the end,
  // while a 404 on the FIRST page almost always means a misconfigured
  // endpoint path, which must surface as an error, not as a silently
  // empty dataset.
  @transient private var sawPage = false
  override def fetch(offset: Long, limit: Long): Option[String] = {
    val q = queryTemplate
      .replace("$offset", offset.toString)
      .replace("$limit", limit.toString)
    val url = endpoint + (if (endpoint.contains("?")) "&" else "?") +
      "query=" + java.net.URLEncoder.encode(q, "UTF-8")
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("Accept", "application/sparql-results+json")
      .header("User-Agent", userAgent)
      .GET().build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 200 => sawPage = true; Some(resp.body())
      case 416 => None // the range-exhausted signal: past the last page
      // 404 is end-of-pages ONLY once a page has succeeded; on the first
      // page it is a wrong endpoint path and throws (so RetryingFetcher
      // retries it and the caller ultimately sees the error)
      case 404 if sawPage => None
      case code => throw new java.io.IOException(
        s"HTTP $code from SPARQL endpoint at offset=$offset limit=$limit")
    }
  }
}

/** Retry/backoff/rate-limit decorator — the reference's transport policy
  * (retry transient failures with exponential backoff, sleep between
  * pages to respect the endpoint's rate limit) as CONFIG on the seam,
  * so any fetcher gains it unchanged. `sleeper` is injectable so specs
  * assert the schedule without waiting. */
final class RetryingFetcher(inner: PageFetcher, maxRetries: Int = 3,
    backoffMs: Long = 1000L, pageDelayMs: Long = 0L,
    sleeper: Long => Unit = Thread.sleep) extends PageFetcher {
  require(maxRetries >= 0 && backoffMs >= 0 && pageDelayMs >= 0)
  override def fetch(offset: Long, limit: Long): Option[String] = {
    if (pageDelayMs > 0 && offset > 0) sleeper(pageDelayMs)
    var attempt = 0
    while (true) {
      try return inner.fetch(offset, limit)
      catch {
        case e: Exception if attempt < maxRetries =>
          sleeper(backoffMs << attempt) // 1×, 2×, 4×, … exponential
          attempt += 1
      }
    }
    None // unreachable
  }
}

object SparqlResultsJson {

  /** Bindings frame for a page directory — the library entry point. */
  def bindings(spark: SparkSession, dir: String): DataFrame =
    spark.read.format(classOf[SparqlJsonPagedProvider].getName)
      .option("dir", dir).load()

  /** The reference's pagination loop over the transport seam: fetch
    * pages at offsets 0, limit, 2·limit, … until the fetcher signals
    * the end or a page carries fewer than `limit` bindings (the short
    * page — the reference's own stop condition), STAGING each body as
    * `page-NNNNN.json` under `spoolDir`. Fetch is sequential by nature
    * (the next offset exists only after the previous page arrives —
    * exactly the reference's loop); the stage → parse split is what
    * restores parallelism: the spooled pages parse cluster-wide through
    * the DSv2 source. Returns the staged paths. */
  def stagePages(fetcher: PageFetcher, limit: Long,
                 spoolDir: String): Seq[String] = {
    require(limit > 0, "limit must be positive")
    val p = new org.apache.hadoop.fs.Path(spoolDir)
    val fs = p.getFileSystem(graft.util.Fs.hadoopConf())
    fs.mkdirs(p)
    val mapper = new ObjectMapper()
    val staged = Seq.newBuilder[String]
    var offset = 0L
    var more = true
    while (more) {
      fetcher.fetch(offset, limit) match {
        case None => more = false
        case Some(body) =>
          val n = mapper.readTree(body).path("results").path("bindings").size()
          if (n > 0) {
            val out = new org.apache.hadoop.fs.Path(p,
              f"page-${offset / limit}%05d.json")
            val os = fs.create(out, true)
            try os.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            finally os.close()
            staged += out.toString
          }
          more = n >= limit
          offset += limit
      }
    }
    staged.result()
  }

  /** Fetch-stage-parse composition: the full remote-endpoint read path
    * with the transport pluggable — `bindingsVia(spark, new
    * RetryingFetcher(httpFetcher), 200, spool)` is the production call;
    * the sandbox spec drives the same loop with [[DiskPageFetcher]]. */
  def bindingsVia(spark: SparkSession, fetcher: PageFetcher, limit: Long,
                  spoolDir: String): DataFrame = {
    stagePages(fetcher, limit, spoolDir)
    bindings(spark, spoolDir)
  }

  /** A (s, p, o)-shaped bindings frame as a registerable SERVICE endpoint
    * graph: the object's term companions become the source-level fidelity
    * columns (oLang/oDatatype/oType) the compiled SPARQL patterns read,
    * so LANG()/DATATYPE()/ISIRI() over remote bindings behave exactly as
    * over the local store. */
  def asTriples(bindings: DataFrame): DataFrame = {
    require(Seq("s", "p", "o").forall(bindings.columns.contains),
      s"asTriples needs s/p/o result vars, got ${bindings.columns.toSeq}")
    bindings.select(col("s"), col("p"), col("o"),
      col("__lang_o").as("oLang"), col("__dt_o").as("oDatatype"),
      col("__kind_o").as("oType"))
  }

  /** Schema: per var, the value column plus the three term companions. */
  def schemaFor(vars: Seq[String]): StructType =
    StructType(vars.flatMap { v =>
      Seq(StructField(v, StringType, nullable = true),
        StructField(s"__kind_$v", StringType, nullable = true),
        StructField(s"__lang_$v", StringType, nullable = true),
        StructField(s"__dt_$v", StringType, nullable = true))
    })

  private[sources] def headVars(root: JsonNode): Seq[String] = {
    val vs = root.path("head").path("vars")
    require(vs.isArray, "not a SPARQL results document: missing head.vars")
    (0 until vs.size()).map(vs.get(_).asText)
  }

  /** Page files under `dir`, sorted by name (= page order; the writer and
    * any `$offset`-paged fetch both name pages monotonically). Hadoop FS
    * so the same listing works on a distributed filesystem. */
  private[sources] def listPages(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(graft.util.Fs.hadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".json"))
      .map(_.getPath.toString).sorted
  }

  private[sources] def readTree(path: String,
      conf: org.apache.hadoop.conf.Configuration): JsonNode = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try new ObjectMapper().readTree(in) finally in.close()
  }

  /** One remote term for the fixture writer. */
  final case class RTerm(value: String, kind: String = "literal",
                         lang: Option[String] = None, dt: Option[String] = None)

  /** Write `rows` as W3C results-JSON page files (page-00000.json, …) —
    * the disk stand-in for the paged HTTP responses (no egress in the
    * build sandbox; a live adapter fetches the same bodies instead).
    * Returns the written paths. */
  def writePages(dir: String, vars: Seq[String],
                 rows: Seq[Seq[Option[RTerm]]], pageSize: Int): Seq[String] = {
    require(pageSize > 0, "pageSize must be positive")
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(graft.util.Fs.hadoopConf())
    fs.mkdirs(p)
    val mapper = new ObjectMapper()
    rows.grouped(pageSize).zipWithIndex.map { case (page, pi) =>
      val root = mapper.createObjectNode()
      val head = root.putObject("head")
      val va = head.putArray("vars")
      vars.foreach(va.add)
      val ba = root.putObject("results").putArray("bindings")
      page.foreach { row =>
        val sol = ba.addObject()
        vars.zip(row).foreach {
          case (v, Some(t)) =>
            val term = sol.putObject(v)
            term.put("type", if (t.kind == "iri") "uri" else t.kind)
            term.put("value", t.value)
            t.lang.foreach(term.put("xml:lang", _))
            t.dt.foreach(term.put("datatype", _))
          case (_, None) => // unbound — omitted from the solution object
        }
      }
      val out = new org.apache.hadoop.fs.Path(p, f"page-$pi%05d.json")
      val os = fs.create(out, true)
      try os.write(mapper.writerWithDefaultPrettyPrinter()
        .writeValueAsBytes(root))
      finally os.close()
      out.toString
    }.toSeq
  }
}
