package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.model.Quad

/** S9/S10 + K3: line-oriented RDF parse and serialization.
  *
  * The reference loads folders of Turtle into pyoxigraph
  * (enrich_via_sparql.py:12-46) and serializes graphs back to Turtle /
  * N-Quads (get_data_apis_vanilla.py:1050-1074,
  * get_data_from_apis_instance.py:97-102). The engine treats N-Triples /
  * N-Quads as the distributed wire format (one statement per line → embarrass-
  * ingly parallel flatMap parse, splittable files); Turtle prefix binding is
  * a presentation concern handled by the writer's prefix table.
  *
  * `parseLine` covers the line-oriented N-Triples/N-Quads wire format: IRI /
  * blank-node subjects, IRI predicates, IRI / bnode / literal objects with
  * optional `@lang` or `^^<datatype>`. Full Turtle (prefixes, `;`/`,`
  * continuation, multi-line literals, collections) is handled per-document
  * by [[TurtleParser]] — see `parseTurtle` / `readTurtle` below.
  */
object RdfIO {

  private val Iri = "<([^>]*)>".r
  private val Stmt =
    """^\s*(<[^>]*>|_:\S+)\s+<([^>]*)>\s+(.+?)\s*(?:<([^>]*)>)?\s*\.\s*$""".r

  private[sources] def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")
      .replace("\\n", "\n").replace("\\t", "\t").replace("\\r", "\r")

  private[sources] def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")

  /** Parse one N-Triples/N-Quads line; None for comments/blank lines. */
  def parseLine(line: String, defaultGraph: String = ""): Option[Quad] = {
    val t = line.trim
    if (t.isEmpty || t.startsWith("#")) return None
    t match {
      case Stmt(subj, pred, objPart, graph) =>
        val s = subj match { case Iri(v) => v; case b => b }
        // Regex ambiguity: in `"x"^^<dt> .` (typed literal, no graph) the
        // datatype IRI lands in the graph group — detect via the dangling
        // `^^` and re-attach it to the object.
        val (o, g) =
          if (graph != null && objPart.trim.endsWith("^^"))
            (objPart.trim + s"<$graph>", defaultGraph)
          else (objPart.trim, Option(graph).getOrElse(defaultGraph))
        if (o.startsWith("<") && o.endsWith(">"))
          Some(Quad(g, s, pred, o.substring(1, o.length - 1)))
        else if (o.startsWith("_:"))
          Some(Quad(g, s, pred, o, oType = "bnode"))
        else if (o.startsWith("\"")) {
          val close = o.lastIndexOf('"')
          if (close <= 0) None
          else {
            val lex = unescape(o.substring(1, close))
            val suffix = o.substring(close + 1)
            if (suffix.startsWith("@"))
              Some(Quad(g, s, pred, lex, oType = "literal", oLang = suffix.substring(1)))
            else if (suffix.startsWith("^^<") && suffix.endsWith(">"))
              Some(Quad(g, s, pred, lex, oType = "literal",
                oDatatype = suffix.substring(3, suffix.length - 1)))
            else Some(Quad(g, s, pred, lex, oType = "literal"))
          }
        } else None
      case _ => None
    }
  }

  /** Format one quad as an N-Quads line (empty graph → N-Triples line). */
  def formatLine(q: Quad): String = {
    val s = if (q.s.startsWith("_:")) q.s else s"<${q.s}>"
    val o = q.oType match {
      case "literal" =>
        val lex = "\"" + escape(q.o) + "\""
        if (q.oLang != null) s"$lex@${q.oLang}"
        else if (q.oDatatype != null) s"$lex^^<${q.oDatatype}>"
        else lex
      case "bnode" => q.o
      case _ => s"<${q.o}>"
    }
    val g = if (q.g == null || q.g.isEmpty) "" else s" <${q.g}>"
    s"$s <${q.p}> $o$g ."
  }

  /** S9: folder of .nt/.nq files → Dataset[Quad] (recursive lookup mirrors
    * the reference's folder walk, enrich_via_sparql.py:27-36). */
  def readQuads(spark: SparkSession, path: String,
                defaultGraph: String = ""): Dataset[Quad] = {
    import spark.implicits._
    spark.read.option("recursiveFileLookup", "true").textFile(path)
      .flatMap(l => parseLine(l, defaultGraph))
  }

  /** S10: fetched text chunks → quads in a named graph, parsed one task per
    * chunk (get_data_from_apis_instance.py:78-94). */
  def parseChunks(chunks: Dataset[String], namedGraph: String): Dataset[Quad] = {
    import chunks.sparkSession.implicits._
    chunks.flatMap(_.split('\n').toSeq.flatMap(l => parseLine(l, namedGraph)))
  }

  /** Convenience overload for driver-held chunks. */
  def parseChunks(spark: SparkSession, chunks: Seq[String],
                  namedGraph: String): Dataset[Quad] = {
    import spark.implicits._
    parseChunks(spark.createDataset(chunks), namedGraph)
  }

  /** S10 (full grammar): parse one Turtle document (see [[TurtleParser]]).
    * The reference feeds each fetched chunk to rdflib's turtle parser
    * (get_data_from_apis_instance.py:78-94). */
  def parseTurtle(doc: String, namedGraph: String = ""): Seq[Quad] =
    TurtleParser.parse(doc, namedGraph)

  /** S10 distributed: one parse task per Turtle chunk — Turtle is not
    * line-splittable (statements span lines, prefix bindings are
    * document-scoped), so the chunk is the parallel unit, exactly the
    * reference's chunk-at-a-time `g.parse(data=chunk, format="turtle")`
    * loop (get_data_from_apis_instance.py:88-93). Blank nodes — labeled
    * and anonymous — are scoped per chunk via a content-hash seed,
    * matching rdflib's per-parse bnode scoping: `_:genid1` in two
    * different chunks stays two distinct nodes. */
  def parseTurtleChunks(chunks: Dataset[String], namedGraph: String): Dataset[Quad] = {
    import chunks.sparkSession.implicits._
    chunks.flatMap(doc => TurtleParser.parse(doc, namedGraph, scopeBnodeLabels = true))
  }

  /** S9 (Turtle flavor): folder tree of .ttl documents → quads, one parse
    * task per file. The reference walks a folder and loads every matching
    * RDF file into one store (enrich_via_sparql.py:12-46, configurable
    * extension); wholetext keeps each document intact for the full-grammar
    * parse and the file count is the parallelism unit. Blank-node labels
    * are scoped per file (rdflib parses each file separately — equal
    * labels across files are distinct nodes). */
  def readTurtleFiles(spark: SparkSession, path: String, ext: String = "ttl",
                      defaultGraph: String = ""): Dataset[Quad] = {
    import spark.implicits._
    spark.read
      .option("wholetext", "true")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", s"*.$ext")
      .textFile(path)
      .filter(_.nonEmpty)
      .flatMap(doc => TurtleParser.parse(doc, defaultGraph, scopeBnodeLabels = true))
  }

  /** Read back a `writeTurtle` layout (or any directory of Turtle bodies
    * sharing one prefix header). The header is tiny (bounded by the prefix
    * table, not the data) so collecting it driver-side is scale-safe; the
    * bodies parse one task per file via wholetext. */
  def readTurtle(spark: SparkSession, path: String,
                 defaultGraph: String = ""): Dataset[Quad] = {
    import spark.implicits._
    val header = spark.read.textFile(s"$path/_prefixes").collect().mkString("\n")
    spark.read.option("wholetext", "true").textFile(s"$path/body")
      .filter(_.nonEmpty)
      .flatMap(body => TurtleParser.parse(header + "\n" + body, defaultGraph))
  }

  /** K3: quads → N-Quads text files. D4 set semantics (rdflib Graph.add is
    * idempotent) via dropDuplicates before the sink. */
  def writeQuads(quads: Dataset[Quad], path: String): Unit = {
    import quads.sparkSession.implicits._
    quads.dropDuplicates("g", "s", "p", "o", "oType", "oLang", "oDatatype")
      .map(formatLine _)
      .write.mode("overwrite").text(path)
  }

  /** The reference's 20 bound prefixes shape (get_data_apis_vanilla.py:
    * 1022-1042) — kept as data so the Turtle writer stays generic. */
  val defaultPrefixes: Map[String, String] = Map(
    "rdf" -> "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs" -> "http://www.w3.org/2000/01/rdf-schema#",
    "xsd" -> "http://www.w3.org/2001/XMLSchema#",
    "owl" -> "http://www.w3.org/2002/07/owl#",
    "crm" -> "http://www.cidoc-crm.org/cidoc-crm/")

  /** PN_LOCAL rendering: letters/digits/'_'/':' pass through; '.'/'-' pass
    * mid-name; every other escapable special gets a backslash; anything the
    * grammar can't express at all (spaces etc.) rejects the compaction so
    * the writer falls back to `<iri>` — output stays parseable Turtle. */
  private def pnLocal(local: String): Option[String] = {
    val escapable = "~.!$&'()*+,;=/?#@%-_".toSet
    val direct = (c: Char) => c.isLetterOrDigit || c == '_' || c == ':'
    if (local.isEmpty || !local.forall(c => direct(c) || escapable(c))) None
    else {
      val sb = new StringBuilder
      var i = 0
      while (i < local.length) {
        val c = local.charAt(i)
        val soft = c == '.' || c == '-' // legal unescaped only mid-name
        if (!direct(c) && (!soft || i == 0 || i == local.length - 1)) sb.append('\\')
        sb.append(c)
        i += 1
      }
      Some(sb.toString)
    }
  }

  private def compact(iri: String, prefixes: Map[String, String]): String =
    prefixes.iterator.flatMap { case (p, ns) =>
      if (iri.startsWith(ns) && iri.length > ns.length)
        pnLocal(iri.substring(ns.length)).map(l => s"$p:$l")
      else None
    }.nextOption().getOrElse(s"<$iri>")

  /** One subject's Turtle block: `subj p1 o1 ;\n    p2 o2 .` — shared by
    * the writer and the q82 round-trip query. */
  private[graft] def turtleBlock(s: String, qs: Seq[Quad],
                                 prefixes: Map[String, String]): String = {
    val subj = if (s.startsWith("_:")) s else compact(s, prefixes)
    val po = qs.sortBy(q => (q.p, q.o))
      .map(q => s"${compact(q.p, prefixes)} ${turtleObject(q, prefixes)}")
      .mkString(" ;\n    ")
    s"$subj $po ."
  }

  /** The matching prefix header for [[turtleBlock]] bodies. */
  private[graft] def turtleHeader(prefixes: Map[String, String]): String =
    prefixes.toSeq.sorted
      .map { case (p, ns) => s"@prefix $p: <$ns> ." }.mkString("", "\n", "\n")

  private def turtleObject(q: Quad, prefixes: Map[String, String]): String =
    q.oType match {
      case "literal" =>
        val lex = "\"" + escape(q.o) + "\""
        if (q.oLang != null) s"$lex@${q.oLang}"
        else if (q.oDatatype != null) s"$lex^^${compact(q.oDatatype, prefixes)}"
        else lex
      case "bnode" => q.o
      case _ => compact(q.o, prefixes)
    }

  /** K3 (Turtle flavor): subject-grouped, prefix-compacted Turtle
    * (get_data_apis_vanilla.py:1050-1074 serialize + prefix binding).
    * Serialization groups by subject per partition — the shuffle is on the
    * subject key, then each task streams its group into `s p1 o1 ; p2 o2 .`
    * blocks. The prefix header is emitted once (driver-written file) and the
    * body is partitioned text — a cluster-safe layout (no single writer). */
  def writeTurtle(quads: Dataset[Quad], path: String,
                  prefixes: Map[String, String] = defaultPrefixes): Unit = {
    val spark = quads.sparkSession
    import spark.implicits._
    val header = turtleHeader(prefixes)
    val body = quads
      .dropDuplicates("g", "s", "p", "o", "oType", "oLang", "oDatatype")
      .groupByKey(_.s)
      .mapGroups((s, qs) => turtleBlock(s, qs.toSeq, prefixes))
    spark.createDataset(Seq(header)).write.mode("overwrite").text(s"$path/_prefixes")
    body.write.mode("overwrite").text(s"$path/body")
  }
}
