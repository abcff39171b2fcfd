package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SPARQL text front-end (SURVEY.md §4.2's "parser optional" gap).
  *
  * The reference ships its queries as .sparql files dispatched to a remote
  * endpoint with `$limit`/`$offset` substituted per page
  * (prosnet-prefect-pipelines/sparql/wikidata-person.sparql,
  * wikidata_index.py:150-180). Rounds 1-2 hand-compiled those files into
  * [[SparqlAlgebra]]; this parser closes the loop so a user can point the
  * engine at the query text itself.
  *
  * Grammar: the subset those files use —
  *   - `SELECT [DISTINCT]` with plain vars and `(?v AS ?alias)` renames
  *   - basic graph patterns (variable/IRI/pname/literal terms)
  *   - braced groups with `UNION` chains
  *   - `OPTIONAL { … }` with inner `FILTER`s (applied before the left join,
  *     the J3 ordering)
  *   - `FILTER(?v <op> "literal"[^^dt])` comparisons and
  *     `FILTER(langmatches(lang(?v), "tag"))`
  *   - `SERVICE wikibase:label { bd:serviceParam wikibase:language "…" }`
  *   - nested sub-`SELECT`, `ORDER BY ?v`, `LIMIT`/`OFFSET` with literal or
  *     `$param` values, `#` comments
  *
  * Compilation is a direct mapping onto [[SparqlAlgebra]]: every construct
  * becomes the same DataFrame operators the hand-compiled queries use, so
  * Catalyst sees an identical declarative plan (predicate-pruned triple
  * scans, broadcastable dimension joins). IRIs `<x>` compile to the
  * angle-stripped token and prefixed names stay textual — terms live in the
  * same symbol space as the triple DataFrame's s/p/o columns.
  *
  * Lang-tagged matching needs term fidelity: `langmatches` compiles to an
  * equality on the triple source's `oLang` column (the Quad model's
  * fidelity field) and raises if the source carries no such column.
  */
object SparqlText {

  // ---------- AST ----------

  sealed trait Term
  final case class V(name: String) extends Term
  final case class C(value: String) extends Term // IRI (angles stripped) or pname
  final case class L(lex: String) extends Term // literal

  sealed trait El
  final case class Tp(s: Term, p: Term, o: Term) extends El
  final case class UnionEl(arms: Seq[Seq[El]]) extends El
  final case class OptEl(g: Seq[El]) extends El
  sealed trait Fil extends El
  final case class Cmp(v: String, op: String, value: String) extends Fil
  final case class LangM(v: String, lang: String) extends Fil
  final case class SubSel(s: SelectQ) extends El
  final case class LabelSvc(langs: Seq[String]) extends El

  final case class SelectQ(
      distinct: Boolean,
      proj: Seq[(String, String)], // (sourceVar, outputName)
      where: Seq[El],
      orderBy: Option[String],
      limit: Option[Either[Long, String]],
      offset: Option[Either[Long, String]])

  // ---------- tokens ----------

  private sealed trait Tok
  private case class TVar(name: String) extends Tok
  private case class TIri(v: String) extends Tok
  private case class TPname(v: String) extends Tok
  private case class TStr(lex: String, dt: Option[String]) extends Tok
  private case class TNum(v: String) extends Tok
  private case class TPunct(c: String) extends Tok
  private case class TIdent(v: String) extends Tok

  private val IriRe = """<([^<>"{}|^`\\\s]*)>""".r

  private def tokenize(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = q.length
    def peekAt(k: Int): Char = if (k < n) q.charAt(k) else ' '
    while (i < n) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '#') { while (i < n && q.charAt(i) != '\n') i += 1 }
      else if ("{}().,;".indexOf(c) >= 0) { out += TPunct(c.toString); i += 1 }
      else if (c == '?' || c == '$') {
        val start = i + 1
        i += 1
        while (i < n && (q.charAt(i).isLetterOrDigit || q.charAt(i) == '_')) i += 1
        out += TVar(q.substring(start, i))
      } else if (c == '<') {
        IriRe.findPrefixMatchOf(q.substring(i)) match {
          case Some(m) => out += TIri(m.group(1)); i += m.end
          case None =>
            if (peekAt(i + 1) == '=') { out += TPunct("<="); i += 2 }
            else { out += TPunct("<"); i += 1 }
        }
      } else if (c == '>') {
        if (peekAt(i + 1) == '=') { out += TPunct(">="); i += 2 }
        else { out += TPunct(">"); i += 1 }
      } else if (c == '=') { out += TPunct("="); i += 1 }
      else if (c == '!' && peekAt(i + 1) == '=') { out += TPunct("!="); i += 2 }
      else if (c == '"') {
        val sb = new StringBuilder
        i += 1
        while (i < n && q.charAt(i) != '"') {
          if (q.charAt(i) == '\\' && i + 1 < n) { sb.append(q.charAt(i + 1)); i += 2 }
          else { sb.append(q.charAt(i)); i += 1 }
        }
        i += 1 // closing quote
        var dt: Option[String] = None
        if (i + 1 < n && q.charAt(i) == '^' && q.charAt(i + 1) == '^') {
          i += 2
          if (i < n && q.charAt(i) == '<') {
            IriRe.findPrefixMatchOf(q.substring(i)).foreach { m => dt = Some(m.group(1)); i += m.end }
          } else {
            val start = i
            while (i < n && (q.charAt(i).isLetterOrDigit || ":_.-".indexOf(q.charAt(i)) >= 0)) i += 1
            dt = Some(q.substring(start, i))
          }
        }
        out += TStr(sb.toString, dt)
      } else if (c.isDigit) {
        val start = i
        while (i < n && q.charAt(i).isDigit) i += 1
        out += TNum(q.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (q.charAt(i).isLetterOrDigit || ":_.-".indexOf(q.charAt(i)) >= 0)) i += 1
        var word = q.substring(start, i)
        // `wd:Q40.` — a trailing dot is the statement terminator, not part
        // of the name
        if (word.endsWith(".")) { word = word.dropRight(1); i -= 1 }
        if (word.contains(':')) out += TPname(word) else out += TIdent(word)
      } else sys.error(s"SPARQL tokenizer: unexpected char '$c' at $i")
    }
    out.result()
  }

  // ---------- parser ----------

  def parse(query: String): SelectQ = new P(tokenize(query)).selectQuery(top = true)

  private final class P(toks: Vector[Tok]) {
    private var i = 0
    private def eof = i >= toks.length
    private def peek: Tok = if (eof) TPunct("<EOF>") else toks(i)
    private def next(): Tok = { val t = peek; i += 1; t }
    private def fail(msg: String): Nothing =
      sys.error(s"SPARQL parse error at token $i ($peek): $msg")
    private def isKw(t: Tok, kw: String): Boolean = t match {
      case TIdent(w) => w.equalsIgnoreCase(kw)
      case _ => false
    }
    private def expectKw(kw: String): Unit =
      if (isKw(peek, kw)) i += 1 else fail(s"expected $kw")
    private def expectPunct(c: String): Unit = peek match {
      case TPunct(`c`) => i += 1
      case _ => fail(s"expected '$c'")
    }

    def selectQuery(top: Boolean): SelectQ = {
      expectKw("SELECT")
      val distinct = isKw(peek, "DISTINCT") && { i += 1; true }
      val proj = Vector.newBuilder[(String, String)]
      var reading = true
      while (reading) peek match {
        case TVar(v) => i += 1; proj += ((v, v))
        case TPunct("(") =>
          i += 1
          val src = next() match { case TVar(v) => v; case t => fail(s"expected var in ($t") }
          expectKw("AS")
          val dst = next() match { case TVar(v) => v; case t => fail(s"expected alias var, got $t") }
          expectPunct(")")
          proj += ((src, dst))
        case _ => reading = false
      }
      expectKw("WHERE")
      val where = group()
      var orderBy: Option[String] = None
      var limit: Option[Either[Long, String]] = None
      var offset: Option[Either[Long, String]] = None
      var trailing = true
      while (trailing && !eof) {
        if (isKw(peek, "ORDER")) {
          i += 1; expectKw("BY")
          orderBy = Some(next() match { case TVar(v) => v; case t => fail(s"expected order var, got $t") })
        } else if (isKw(peek, "LIMIT")) { i += 1; limit = Some(numOrParam()) }
        else if (isKw(peek, "OFFSET")) { i += 1; offset = Some(numOrParam()) }
        else trailing = false
      }
      val q = SelectQ(distinct, proj.result(), where, orderBy, limit, offset)
      if (top && !eof) fail("trailing tokens after query")
      q
    }

    private def numOrParam(): Either[Long, String] = next() match {
      case TNum(v) => Left(v.toLong)
      case TVar(v) => Right(v) // `$limit` template parameter
      case t => fail(s"expected number or \\$$param, got $t")
    }

    private def group(): Seq[El] = {
      expectPunct("{")
      val els = Vector.newBuilder[El]
      var go = true
      while (go) peek match {
        case TPunct("}") => i += 1; go = false
        case TPunct(".") => i += 1
        case TPunct("{") =>
          // nested group: sub-SELECT or a UNION chain
          if (toks.lift(i + 1).exists(isKw(_, "SELECT"))) {
            i += 1
            val sub = selectQuery(top = false)
            expectPunct("}")
            els += SubSel(sub)
          } else {
            val arms = Vector.newBuilder[Seq[El]]
            arms += group()
            while (isKw(peek, "UNION")) { i += 1; arms += group() }
            val a = arms.result()
            els += (if (a.length == 1) OptElFlatten(a.head) else UnionEl(a))
          }
        case t if isKw(t, "OPTIONAL") => i += 1; els += OptEl(group())
        case t if isKw(t, "FILTER") => i += 1; els += filterEl()
        case t if isKw(t, "SERVICE") => i += 1; els += serviceEl()
        case _ => els += triplePattern()
      }
      els.result()
    }

    /** A single braced group with no UNION is just scoping — inline it. */
    private def OptElFlatten(g: Seq[El]): El = UnionEl(Seq(g))

    private def filterEl(): Fil = {
      expectPunct("(")
      val f = peek match {
        case t if isKw(t, "langmatches") =>
          i += 1; expectPunct("(")
          expectKw("lang"); expectPunct("(")
          val v = next() match { case TVar(x) => x; case t2 => fail(s"expected var, got $t2") }
          expectPunct(")"); expectPunct(",")
          val lang = next() match { case TStr(s, _) => s; case t2 => fail(s"expected lang string, got $t2") }
          expectPunct(")")
          LangM(v, lang)
        case TVar(v) =>
          i += 1
          val op = next() match { case TPunct(o) => o; case t2 => fail(s"expected operator, got $t2") }
          val value = next() match {
            case TStr(s, _) => s
            case TNum(s) => s
            case t2 => fail(s"expected literal, got $t2")
          }
          Cmp(v, op, value)
        case t2 => fail(s"unsupported FILTER form: $t2")
      }
      expectPunct(")")
      f
    }

    /** `SERVICE wikibase:label { bd:serviceParam wikibase:language "de,en" }` */
    private def serviceEl(): LabelSvc = {
      next() match {
        case TPname(p) if p.equalsIgnoreCase("wikibase:label") =>
        case t => fail(s"only SERVICE wikibase:label is supported, got $t")
      }
      expectPunct("{")
      var langs: Seq[String] = Seq("en")
      var go = true
      while (go) next() match {
        case TPunct("}") => go = false
        case TStr(s, _) => langs = s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        case TPunct("<EOF>") => fail("unterminated SERVICE block")
        case _ => // bd:serviceParam / wikibase:language / '.' tokens
      }
      LabelSvc(langs)
    }

    private def term(): Term = next() match {
      case TVar(v) => V(v)
      case TIri(v) => C(v)
      case TPname(v) => C(v)
      case TStr(s, _) => L(s)
      case TNum(v) => L(v)
      case t => fail(s"expected term, got $t")
    }

    private def triplePattern(): Tp = Tp(term(), term(), term())
  }

  // ---------- compiler ----------

  /** Compile a parsed query against a triple source.
    *
    * @param triples (s, p, o [, oLang]) DataFrame — oLang only needed when
    *                the query uses `langmatches`
    * @param labels  (entity, lang, label) for the wikibase:label service
    * @param params  values for `$limit`/`$offset`-style template parameters
    */
  def compile(q: SelectQ, triples: DataFrame, labels: DataFrame,
              params: Map[String, Long] = Map.empty): DataFrame =
    compileSelect(q, triples, labels, params)

  /** Parse + compile in one step. */
  def run(query: String, triples: DataFrame, labels: DataFrame,
          params: Map[String, Long] = Map.empty): DataFrame =
    compile(parse(query), triples, labels, params)

  private def resolve(v: Either[Long, String], params: Map[String, Long]): Long =
    v match {
      case Left(n) => n
      case Right(p) => params.getOrElse(p,
        sys.error(s"missing value for SPARQL template parameter $$$p"))
    }

  private def compileSelect(q: SelectQ, triples: DataFrame, labels: DataFrame,
                            params: Map[String, Long]): DataFrame = {
    val (bound, svc) = compileGroup(q.where, triples, labels, params)
    // wikibase:label semantics: every projected ?xLabel with ?x bound gets
    // the first-available-language label, falling back to the id (J7).
    val labeled = svc match {
      case Some(langs) =>
        q.proj.collect {
          case (src, _) if src.endsWith("Label") &&
            bound.columns.contains(src.dropRight(5)) && !bound.columns.contains(src) =>
            (src.dropRight(5), src)
        }.foldLeft(bound) { case (df, (base, out)) =>
          SparqlAlgebra.labelService(df, labels, base, out, langs)
        }
      case None => bound
    }
    val cols: Seq[Column] = q.proj.map { case (src, out) =>
      if (labeled.columns.contains(src)) col(src).as(out)
      else lit(null).cast("string").as(out) // SPARQL: unbound projected var
    }
    var out = labeled.select(cols: _*)
    if (q.distinct) out = out.distinct()
    q.orderBy.foreach(v => out = out.orderBy(col(v)))
    q.offset.foreach(o => out = out.offset(resolve(o, params).toInt))
    q.limit.foreach(l => out = out.limit(resolve(l, params).toInt))
    out
  }

  /** Compile a group's elements; returns (bound rows, label-service langs).
    * Comparison filters apply group-wide (SPARQL scoping); langmatches
    * filters attach to the triple pattern binding their variable. */
  private def compileGroup(els: Seq[El], triples: DataFrame, labels: DataFrame,
                           params: Map[String, Long]): (DataFrame, Option[Seq[String]]) = {
    val langFilters: Map[String, String] =
      els.collect { case LangM(v, lang) => v -> lang }.toMap
    var acc: Option[DataFrame] = None
    var svc: Option[Seq[String]] = None

    def join(df: DataFrame): Unit = acc = acc match {
      case None => Some(df)
      case Some(a) =>
        val shared = a.columns.intersect(df.columns).toSeq
        require(shared.nonEmpty, "SPARQL group elements must share a variable")
        Some(a.join(df, shared))
    }

    els.foreach {
      case Tp(s, p, o) =>
        val pv = p match {
          case C(v) => v
          case other => sys.error(s"variable predicates unsupported: $other")
        }
        var pat = triples.filter(col("p") === pv)
        val projected = Vector.newBuilder[Column]
        s match {
          case V(v) => projected += col("s").as(v)
          case C(v) => pat = pat.filter(col("s") === v)
          case L(v) => pat = pat.filter(col("s") === v)
        }
        o match {
          case V(v) =>
            langFilters.get(v).foreach { lang =>
              require(pat.columns.contains("oLang"),
                s"langmatches(lang(?$v)) needs an oLang column on the triple source")
              pat = pat.filter(col("oLang") === lang)
            }
            projected += col("o").as(v)
          case C(v) => pat = pat.filter(col("o") === v)
          case L(v) => pat = pat.filter(col("o") === v)
        }
        join(pat.select(projected.result(): _*))
      case UnionEl(arms) =>
        val dfs = arms.map(a => compileGroup(a, triples, labels, params)._1)
        join(dfs.reduce(_ unionByName _))
      case OptEl(g) =>
        val right = compileGroup(g, triples, labels, params)._1
        acc = Some(SparqlAlgebra.optional(
          acc.getOrElse(sys.error("OPTIONAL requires a preceding pattern")), right))
      case SubSel(sub) =>
        join(compileSelect(sub, triples, labels, params))
      case Cmp(v, op, value) =>
        val a = acc.getOrElse(sys.error("FILTER requires a preceding pattern"))
        val c = col(v)
        val pred = op match {
          case "<" => c < value
          case ">" => c > value
          case "<=" => c <= value
          case ">=" => c >= value
          case "=" => c === value
          case "!=" => c =!= value
          case other => sys.error(s"unsupported comparison: $other")
        }
        acc = Some(a.filter(pred))
      case _: LangM => // attached to its binding pattern above
      case LabelSvc(langs) => svc = Some(langs)
    }
    (acc.getOrElse(sys.error("empty group pattern")), svc)
  }
}
