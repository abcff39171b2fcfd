package graft.sources

import scala.collection.mutable
import graft.model.Quad

/** Full Turtle parser for the S10 TTL-harvest path.
  *
  * The reference hands each fetched chunk to rdflib with
  * `g.parse(data=chunk, format="turtle")`
  * (get_data_from_apis_instance.py:78-94), so the real input grammar is
  * Turtle, not line-oriented N-Triples. This is a single-pass recursive-
  * descent parser over one document covering the subset rdflib (and this
  * engine's own `RdfIO.writeTurtle`) emit:
  *
  *   - `@prefix` / `@base` directives, plus SPARQL-style `PREFIX` / `BASE`
  *   - prefixed names with PN_LOCAL backslash-escapes and %-encoding
  *   - the `a` keyword, `;` predicate lists, `,` object lists
  *   - string literals in all four quote forms (`"…"`, `'…'`, `"""…"""`,
  *     `'''…'''`) with `\t \b \n \r \f \" \' \\ \uXXXX \UXXXXXXXX` escapes
  *   - language tags and `^^` datatypes (IRI or prefixed-name form)
  *   - numeric shorthand (integer / decimal / double) and booleans,
  *     normalized to typed xsd literals the way rdflib does
  *   - labeled (`_:x`) and anonymous (`[ … ]`) blank nodes, bracketed
  *     property lists, and RDF collections (expanded to first/rest/nil)
  *
  * TriG's `GRAPH <g> { … }` blocks are also accepted (rdflib serializes a
  * named-graph `Dataset` — `combine_ttl_data`'s `Dataset.graph(context)` —
  * as TriG): statements inside a block carry the block's graph, statements
  * outside carry the `graph` parameter (the default graph).
  *
  * Distribution model: Turtle is not line-splittable (one statement may span
  * lines, and prefix bindings are document-scoped), so the parallel unit is
  * the document — one task per fetched chunk or file, exactly the
  * chunk-at-a-time shape of the reference's harvest loop. Anonymous blank
  * nodes are labeled from `bnodeSeed` so two different chunks of one graph
  * can never collide (the seed defaults to a content hash).
  */
object TurtleParser {

  val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val XsdNs = "http://www.w3.org/2001/XMLSchema#"

  /** @param scopeBnodeLabels rdflib scopes blank nodes per parse call, so
    *   two chunks both naming `_:genid1` denote DIFFERENT nodes. Set true
    *   when parsing independent documents into one graph (harvest chunks,
    *   file trees) to prefix labeled bnodes with the document seed; leave
    *   false when the labels are globally consistent (reading back this
    *   engine's own writeTurtle layout, whose body files come from one
    *   graph). Anonymous `[ … ]` nodes are always seed-scoped. */
  def parse(doc: String, graph: String = "", bnodeSeed: String = "",
            scopeBnodeLabels: Boolean = false): Seq[Quad] = {
    val seed = if (bnodeSeed.nonEmpty) bnodeSeed else contentSeed(doc)
    new TurtleParser(doc, graph, seed, scopeBnodeLabels).parseAll()
  }

  /** Deterministic per-document bnode namespace (full md5 of content).
    * Uses all 16 digest bytes: a truncated seed risks birthday collisions
    * at harvest scale (~77k chunks would give ~50% odds at 32 bits),
    * silently merging blank nodes that rdflib's per-parse scoping keeps
    * distinct. */
  def contentSeed(doc: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(doc.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** RFC 3986 §5 reference resolution (the semantics rdflib applies when
    * resolving relative IRIs against `@base` —
    * get_data_from_apis_instance.py:78-94 hands chunks to rdflib, whose
    * parser does full merge + remove_dot_segments). Implemented directly
    * from the spec rather than via java.net.URI: URI follows RFC 2396 and
    * throws on characters that are legal in IRIs, and this function must
    * be total (the fuzz contract allows only typed parse errors). */
  def resolveRef(base: String, ref: String): String = {
    val b = splitIri(base)
    val r = splitIri(ref)
    val t =
      if (r.scheme != null) r.copy(path = removeDotSegments(r.path))
      else if (r.authority != null)
        r.copy(scheme = b.scheme, path = removeDotSegments(r.path))
      else if (r.path.isEmpty) {
        val q = if (r.query != null) r.query else b.query
        b.copy(query = q, fragment = r.fragment)
      } else {
        val merged =
          if (r.path.startsWith("/")) r.path
          else if (b.authority != null && b.path.isEmpty) "/" + r.path
          else b.path.substring(0, b.path.lastIndexOf('/') + 1) + r.path
        IriParts(b.scheme, b.authority, removeDotSegments(merged), r.query, r.fragment)
      }
    t.render
  }

  private case class IriParts(scheme: String, authority: String, path: String,
                              query: String, fragment: String) {
    def render: String = {
      val sb = new StringBuilder
      if (scheme != null) sb.append(scheme).append(':')
      if (authority != null) sb.append("//").append(authority)
      sb.append(path)
      if (query != null) sb.append('?').append(query)
      if (fragment != null) sb.append('#').append(fragment)
      sb.toString
    }
  }

  /** RFC 3986 appendix-B split; the regex cannot fail, so this is total.
    * (?s) keeps the fragment's `.*` total on embedded newlines — parseIriRef
    * accepts any char up to '>', and a MatchError here would break the
    * typed-error fuzz contract. */
  private val IriRe =
    "(?s)^(?:([A-Za-z][A-Za-z0-9+.-]*):)?(?://([^/?#]*))?([^?#]*)(?:\\?([^#]*))?(?:#(.*))?$".r

  private def splitIri(s: String): IriParts = s match {
    case IriRe(sch, auth, path, q, frag) =>
      IriParts(sch, auth, if (path == null) "" else path, q, frag)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private def removeDotSegments(path: String): String = {
    var in = path
    val out = new StringBuilder
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../") || in == "/..") {
        in = if (in == "/..") "/" else "/" + in.substring(4)
        val cut = out.lastIndexOf("/")
        out.setLength(if (cut >= 0) cut else 0)
      }
      else if (in == "." || in == "..") in = ""
      else {
        val from = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', from)
        val seg = if (next >= 0) in.substring(0, next) else in
        out.append(seg)
        in = if (next >= 0) in.substring(next) else ""
      }
    }
    out.toString
  }

  private val DoubleRe =
    java.util.regex.Pattern.compile("[+-]?(?:\\d+\\.\\d+|\\.\\d+|\\d+)[eE][+-]?\\d+")
  private val DecimalRe = java.util.regex.Pattern.compile("[+-]?\\d*\\.\\d+")
  private val IntegerRe = java.util.regex.Pattern.compile("[+-]?\\d+")
}

final class TurtleParser(input: String, graph: String, bnodeSeed: String,
                         scopeBnodeLabels: Boolean = false) {
  import TurtleParser._

  private var pos = 0
  private var base = ""
  private val prefixes = mutable.Map[String, String]()
  private var bnodeN = 0
  private var currentGraph = graph // overridden inside TriG GRAPH blocks
  private val out = mutable.ArrayBuffer[Quad]()

  // ---- low-level cursor -----------------------------------------------

  private def eof: Boolean = pos >= input.length
  private def peek: Char = input.charAt(pos)
  private def peekAt(off: Int): Char =
    if (pos + off < input.length) input.charAt(pos + off) else '\u0000'

  private def err(msg: String): Nothing = {
    val ctx = input.substring(math.max(0, pos - 25), math.min(input.length, pos + 25))
    throw new IllegalArgumentException(
      s"Turtle parse error at offset $pos: $msg near '$ctx'")
  }

  private def skipWs(): Unit = {
    var go = true
    while (go && !eof) {
      val c = peek
      if (c == '#') while (!eof && peek != '\n') pos += 1
      else if (c.isWhitespace) pos += 1
      else go = false
    }
  }

  private def expect(c: Char): Unit = {
    skipWs()
    if (eof || peek != c) err(s"expected '$c'")
    pos += 1
  }

  /** Case-insensitive keyword match that must end at a word boundary. */
  private def keywordAt(kw: String): Boolean =
    input.regionMatches(true, pos, kw, 0, kw.length) && {
      val after = peekAt(kw.length)
      after == '\u0000' || after.isWhitespace || after == '<' || after == '#'
    }

  // ---- entry ----------------------------------------------------------

  def parseAll(): Seq[Quad] = {
    skipWs()
    while (!eof) {
      if (keywordAt("@prefix")) { pos += 7; prefixDirective(); expect('.') }
      else if (keywordAt("@base")) { pos += 5; baseDirective(); expect('.') }
      else if (keywordAt("PREFIX")) { pos += 6; prefixDirective() }
      else if (keywordAt("BASE")) { pos += 4; baseDirective() }
      else if (keywordAt("GRAPH")) { pos += 5; graphBlock() }
      else { triples(); expect('.') }
      skipWs()
    }
    out.toSeq
  }

  /** TriG `GRAPH <g> { triples… }`: statements inside carry the block's
    * graph name instead of the default graph. */
  private def graphBlock(): Unit = {
    skipWs()
    if (eof) err("expected graph name")
    val g = peek match {
      case '<' => parseIriRef()
      case '_' if peekAt(1) == ':' => bnodeLabel()
      case _ => pnameIri()
    }
    expect('{')
    skipWs()
    val prev = currentGraph
    currentGraph = g
    while (!eof && peek != '}') {
      triples()
      skipWs()
      if (!eof && peek == '.') { pos += 1; skipWs() }
    }
    expect('}')
    currentGraph = prev
  }

  private def prefixDirective(): Unit = {
    skipWs()
    val sb = new StringBuilder
    while (!eof && peek != ':' && !peek.isWhitespace) { sb.append(peek); pos += 1 }
    expect(':')
    skipWs()
    prefixes(sb.toString) = parseIriRef()
  }

  private def baseDirective(): Unit = { skipWs(); base = parseIriRef() }

  // ---- statements -----------------------------------------------------

  private def triples(): Unit = {
    val s = subjectTerm()
    skipWs()
    // A bare `[ … ]` subject may legally end the statement with no
    // predicate list of its own.
    if (!eof && peek != '.') predicateObjectList(s)
  }

  private def subjectTerm(): String = {
    skipWs()
    if (eof) err("expected subject")
    peek match {
      case '<' => parseIriRef()
      case '_' if peekAt(1) == ':' => bnodeLabel()
      case '[' => bracketedBnode()
      case '(' => collection()._1
      case _ => pnameIri()
    }
  }

  private def predicateObjectList(s: String): Unit = {
    var done = false
    while (!done) {
      val p = verb()
      objectList(s, p)
      skipWs()
      if (!eof && peek == ';') {
        while (!eof && peek == ';') { pos += 1; skipWs() }
        // a dangling ';' may be followed by '.', ']', or — inside a TriG
        // GRAPH block — the closing '}'
        if (eof || peek == '.' || peek == ']' || peek == '}') done = true
      } else done = true
    }
  }

  private def verb(): String = {
    skipWs()
    if (eof) err("expected predicate")
    if (peek == 'a' && !isPnChar(peekAt(1)) && peekAt(1) != ':') {
      pos += 1; RdfNs + "type"
    } else if (peek == '<') parseIriRef()
    else pnameIri()
  }

  private def objectList(s: String, p: String): Unit = {
    var more = true
    while (more) {
      val (v, t, lang, dt) = objectTerm()
      out += Quad(currentGraph, s, p, v, t, lang, dt)
      skipWs()
      if (!eof && peek == ',') pos += 1 else more = false
    }
  }

  /** One object term: (value, oType, oLang, oDatatype). Nested property
    * lists and collections emit their own quads as a side effect. */
  private def objectTerm(): (String, String, String, String) = {
    skipWs()
    if (eof) err("expected object")
    peek match {
      case '<' => (parseIriRef(), "iri", null, null)
      case '"' | '\'' => literal()
      case '[' => (bracketedBnode(), "bnode", null, null)
      case '(' => collection()
      case '_' if peekAt(1) == ':' => (bnodeLabel(), "bnode", null, null)
      case c if c.isDigit || c == '+' || c == '-' ||
                (c == '.' && peekAt(1).isDigit) => numericLiteral()
      case _ if keywordLiteral("true") => (("true"), "literal", null, XsdNs + "boolean")
      case _ if keywordLiteral("false") => (("false"), "literal", null, XsdNs + "boolean")
      case _ => (pnameIri(), "iri", null, null)
    }
  }

  /** true/false must end before a PN char or ':' (else it's a pname). */
  private def keywordLiteral(kw: String): Boolean =
    input.regionMatches(false, pos, kw, 0, kw.length) && {
      val after = peekAt(kw.length)
      !(isPnChar(after) || after == ':')
    } && { pos += kw.length; true }

  // ---- terms ----------------------------------------------------------

  private def parseIriRef(): String = {
    expect('<')
    val start = pos
    while (!eof && peek != '>') pos += 1
    if (eof) err("unterminated IRI")
    val raw = input.substring(start, pos)
    pos += 1
    resolve(unescapeString(raw))
  }

  private val AbsoluteIri = "^[A-Za-z][A-Za-z0-9+.-]*:.*".r

  private def resolve(iri: String): String =
    if (base.isEmpty || AbsoluteIri.matches(iri)) iri
    else TurtleParser.resolveRef(base, iri)

  private def isPnChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_' || c == '-' || c == '.'

  private def bnodeLabel(): String = {
    pos += 2
    val start = pos
    while (!eof && isPnChar(peek)) pos += 1
    var end = pos
    // a final '.' is the statement terminator, not part of the label
    while (end > start && input.charAt(end - 1) == '.') end -= 1
    pos = end
    if (end == start) err("empty blank node label")
    val label = input.substring(start, end)
    if (scopeBnodeLabels) s"_:g${bnodeSeed}l$label" else "_:" + label
  }

  private def freshBnode(): String = {
    val b = s"_:g${bnodeSeed}n$bnodeN"
    bnodeN += 1
    b
  }

  private def bracketedBnode(): String = {
    expect('[')
    val b = freshBnode()
    skipWs()
    if (!eof && peek != ']') predicateObjectList(b)
    expect(']')
    b
  }

  /** `( e1 e2 … )` → rdf:first/rdf:rest chain; `()` is rdf:nil. */
  private def collection(): (String, String, String, String) = {
    expect('(')
    skipWs()
    val elems = mutable.ArrayBuffer[(String, String, String, String)]()
    while (!eof && peek != ')') { elems += objectTerm(); skipWs() }
    expect(')')
    if (elems.isEmpty) (RdfNs + "nil", "iri", null, null)
    else {
      val nodes = elems.map(_ => freshBnode())
      for (i <- elems.indices) {
        val (v, t, lang, dt) = elems(i)
        out += Quad(currentGraph, nodes(i), RdfNs + "first", v, t, lang, dt)
        val rest: (String, String) =
          if (i + 1 < nodes.length) (nodes(i + 1), "bnode") else (RdfNs + "nil", "iri")
        out += Quad(currentGraph, nodes(i), RdfNs + "rest", rest._1, rest._2)
      }
      (nodes.head, "bnode", null, null)
    }
  }

  /** Prefixed name → resolved IRI. PN_LOCAL may contain ':', unescaped
    * mid-name '.'/'-', '%XX' sequences, and backslash-escaped specials;
    * trailing unescaped dots terminate the statement instead. */
  private def pnameIri(): String = {
    skipWs()
    val pstart = pos
    while (!eof && peek != ':' && isPnChar(peek)) pos += 1
    if (eof || peek != ':') { pos = pstart; err("expected prefixed name") }
    val prefix = input.substring(pstart, pos)
    pos += 1
    val ns = prefixes.getOrElse(prefix, err(s"unknown prefix '$prefix:'"))
    val local = new StringBuilder
    // (char, wasEscaped) so the trailing-dot strip never eats an escaped dot
    val taken = mutable.ArrayBuffer[(Char, Boolean)]()
    var go = true
    while (go && !eof) {
      val c = peek
      if (c == '\\' && pos + 1 < input.length) {
        taken += ((input.charAt(pos + 1), true)); pos += 2
      } else if (c == '%' && pos + 2 < input.length &&
                 isHex(peekAt(1)) && isHex(peekAt(2))) {
        taken += ((c, false)); taken += ((peekAt(1), false)); taken += ((peekAt(2), false))
        pos += 3
      } else if (isPnChar(c) || c == ':') {
        taken += ((c, false)); pos += 1
      } else go = false
    }
    while (taken.nonEmpty && taken.last._1 == '.' && !taken.last._2) {
      taken.remove(taken.length - 1); pos -= 1
    }
    taken.foreach { case (c, _) => local.append(c) }
    ns + local.toString
  }

  // ---- literals -------------------------------------------------------

  private def literal(): (String, String, String, String) = {
    val q = peek
    val lex =
      if (input.regionMatches(pos, s"$q$q$q", 0, 3)) longString(q)
      else shortString(q)
    skipWs()
    if (!eof && peek == '@') {
      pos += 1
      val start = pos
      while (!eof && (peek.isLetterOrDigit || peek == '-')) pos += 1
      if (pos == start) err("empty language tag")
      (lex, "literal", input.substring(start, pos), null)
    } else if (!eof && peek == '^' && peekAt(1) == '^') {
      pos += 2
      skipWs()
      if (eof) err("expected datatype")
      val dt = if (peek == '<') parseIriRef() else pnameIri()
      (lex, "literal", null, dt)
    } else (lex, "literal", null, null)
  }

  private def shortString(q: Char): String = {
    pos += 1
    val sb = new StringBuilder
    while (!eof && peek != q) {
      val c = peek
      if (c == '\n' || c == '\r') err("raw newline in single-quoted string")
      if (c == '\\' && pos + 1 < input.length) { sb.append(c).append(peekAt(1)); pos += 2 }
      else { sb.append(c); pos += 1 }
    }
    if (eof) err("unterminated string")
    pos += 1
    unescapeString(sb.toString)
  }

  /** Long (triple-quoted) string: up to two consecutive quote chars may
    * appear in the content; a run of n>=3 closes with its final 3 quotes,
    * the leading n-3 belong to the content. */
  private def longString(q: Char): String = {
    pos += 3
    val sb = new StringBuilder
    while (true) {
      if (eof) err("unterminated long string")
      val c = peek
      if (c == '\\' && pos + 1 < input.length) {
        sb.append(c).append(peekAt(1)); pos += 2
      } else if (c == q) {
        var run = 0
        while (!eof && peek == q) { run += 1; pos += 1 }
        if (run >= 3) {
          sb.append(q.toString * (run - 3))
          return unescapeString(sb.toString)
        } else sb.append(q.toString * run)
      } else { sb.append(c); pos += 1 }
    }
    throw new IllegalStateException("unreachable")
  }

  private def isHex(c: Char): Boolean =
    c.isDigit || ('a' <= c && c <= 'f') || ('A' <= c && c <= 'F')

  /** Turtle string/IRI escape decoding incl. \uXXXX and \UXXXXXXXX. */
  private def unescapeString(s: String): String = {
    if (!s.contains('\\')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\'' => sb.append('\''); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case 'U' if i + 9 < s.length =>
            sb.appendAll(Character.toChars(
              Integer.parseInt(s.substring(i + 2, i + 10), 16))); i += 10
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def numericLiteral(): (String, String, String, String) = {
    def tryMatch(p: java.util.regex.Pattern): Option[String] = {
      val m = p.matcher(input)
      m.region(pos, input.length)
      if (m.lookingAt()) { val t = m.group(); pos += t.length; Some(t) } else None
    }
    tryMatch(DoubleRe).map((_, "literal", null, XsdNs + "double"))
      .orElse(tryMatch(DecimalRe).map((_, "literal", null, XsdNs + "decimal")))
      .orElse(tryMatch(IntegerRe).map((_, "literal", null, XsdNs + "integer")))
      .getOrElse(err("malformed numeric literal"))
  }
}
