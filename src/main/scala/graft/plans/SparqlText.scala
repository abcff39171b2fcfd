package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SPARQL text front-end (SURVEY.md §4.2's "parser optional" gap).
  *
  * The reference ships its queries as .sparql files dispatched to a remote
  * endpoint with `$limit`/`$offset` substituted per page
  * (the .sparql files under prosnet-prefect-pipelines/sparql,
  * wikidata_index.py:150-180).
  * Rounds 1-2 hand-compiled those files into [[SparqlAlgebra]]; this parser
  * closes the loop so a user can point the engine at the query text itself.
  * All four wikidata .sparql files parse (person, person-backup, city,
  * organization).
  *
  * Grammar: the subset those files use —
  *   - `SELECT [DISTINCT]` with plain vars, `*`, `(?v AS ?alias)` renames,
  *     general `(expr AS ?v)` expression projections, and
  *     aggregate projections with `GROUP BY`: `group_concat([distinct]
  *     ?v [; separator="…"])`,
  *     `COUNT([DISTINCT] ?v | *)` (the reference's derived paging-count
  *     query shape, wikidata_index.py:173-179), `MIN`/`MAX`, `SUM`/`AVG`
  *     (numeric via double cast), `SAMPLE` (deterministic min) — each also
  *     over computed expressions (`SUM(?price * ?qty)`)
  *   - basic graph patterns (variable/IRI/pname/literal terms), including
  *     VARIABLE predicates (`?s ?p ?o` — the predicate binds as a column
  *     over an unfiltered scan)
  *   - property paths in predicate position with `*` on ANY step: `p`,
  *     `p*`, `p1/p2`, `p1/p2*` (the `wdt:P31/wdt:P279*` shapes) compile
  *     onto the J4/J5 closure operators; mid-path stars (`p1* / p2`,
  *     written here with spaces only because Scala nests block comments)
  *     compile closure-then-chain via the general walk; `^p` inverse
  *     primaries traverse edges backwards and `(p1|^p2)` alternations
  *     union the step's edge relation (parenthesize alternations inside
  *     a `/` sequence — bare mixes fail loudly); `p+` (one or more) and
  *     `p?` (zero or one) modifiers complete the family
  *   - braced groups with `UNION` chains; disconnected patterns compose by
  *     cross join (SPARQL's natural-join-of-disjoint-domains semantics) and
  *     narrow once a later pattern connects them
  *   - `OPTIONAL { … }` with inner `FILTER`s (applied before the left join,
  *     the J3 ordering)
  *   - `MINUS { … }` and `FILTER [NOT] EXISTS { … }` → left-anti /
  *     left-semi joins on the shared variables (the J8 worklist shape)
  *     with SPARQL null-compatibility (an unbound shared var matches
  *     anything; only null-carrying rows leave the hash-join fast path);
  *     MINUS with no shared variables removes nothing (SPARQL §8.3.3)
  *   - a UNIFIED expression grammar (SPARQL 1.1 §17.2 precedence) shared
  *     by `FILTER`, `BIND`, expression projections, aggregate arguments,
  *     and `ORDER BY` keys: `&&`/`||`/`!`, comparisons between arbitrary
  *     sub-expressions, `[NOT] IN (const, …)`, arithmetic `+ - * /` with
  *     unary minus (numeric via double cast), and the builtins `STR`,
  *     `STRLEN`, `UCASE`, `LCASE`, `SUBSTR`, `CONCAT`, `CONTAINS`,
  *     `STRSTARTS`, `STRENDS`, `STRBEFORE`, `STRAFTER`, `REPLACE`,
  *     `REGEX` (with `ismx` flags), `ABS`, `ROUND`, `CEIL`, `FLOOR`,
  *     `YEAR`/`MONTH`/`DAY` (over ISO-string dates), `HOURS`/`MINUTES`/
  *     `SECONDS`/`TZ` (lexical time components, §17.4.5), `COALESCE`,
  *     `IF(cond, then, else)`, `BOUND(?v)`;
  *     `FILTER(langmatches(lang(?v), "tag"))` and `FILTER(LANG(?v) = "tag")`
  *   - `VALUES ?v { … }` inline membership (J6)
  *   - `SERVICE wikibase:label { bd:serviceParam wikibase:language "…" }`
  *   - `HAVING(AGG([DISTINCT] ?v | *) <op> literal)` post-grouping filters
  *   - nested sub-`SELECT`, multi-key `ORDER BY` with `ASC(expr)`/
  *     `DESC(expr)`, `LIMIT`/`OFFSET` with literal or `$param` values,
  *     `#` comments; over fidelity-carrying stores a bare-variable sort
  *     key orders per §15.1 (kind rank, numeric literals by value)
  *
  * Compilation maps 1:1 onto [[SparqlAlgebra]]/[[Closure]]: every construct
  * becomes the same DataFrame operators the hand-compiled queries use, so
  * Catalyst sees an identical declarative plan (predicate-pruned triple
  * scans, broadcastable dimension joins, seeded semi-naive closures). IRIs
  * `<x>` compile to the angle-stripped token and prefixed names stay
  * textual — terms live in the same symbol space as the triple DataFrame's
  * s/p/o columns.
  *
  * Semantics notes (documented subset choices):
  *   - `langmatches`/`LANG()=` compile to an equality on the triple
  *     source's `oLang` column (the Quad model's fidelity field) and raise
  *     if the source carries no such column.
  *   - a var-var `?a p* ?b` path materializes the full transitive closure
  *     of the p-edge relation plus reflexive pairs over the p-edge node
  *     domain; the scalable shape is the seeded const-object form, which
  *     compiles to the semi-naive [[Closure.reachingTo]].
  *   - `group_concat` renders sorted-order with a single-space separator
  *     (the deterministic A1/A2 idiom).
  */
object SparqlText {

  // ---------- AST ----------

  sealed trait Term
  final case class V(name: String) extends Term
  final case class C(value: String) extends Term // IRI (angles stripped) or pname
  final case class L(lex: String) extends Term // literal

  /** Predicate path: a `/`-sequence of steps. Each step is an alternation
    * of primaries — (predicate, inverse) pairs, `^p` traversing the edge
    * backwards — optionally starred. A plain predicate is one single-
    * alternative non-star step. Mixing bare `|` with `/` requires
    * parentheses (SPARQL's `/` binds tighter; unparenthesized mixes fail
    * loudly rather than silently regroup). */
  final case class Path(steps: Seq[PStep])
  /** mod: "" (exactly one), "*" (zero or more), "+" (one or more),
    * "?" (zero or one). negated: `!p` / `!(p1|^p2)` negated property set
    * (§9.1) — the step's edge relation is the forward triples whose
    * predicate is NOT in the forward member set, unioned with the
    * REVERSED triples whose predicate is NOT in the inverse member set
    * (each complement present only when its side has members). */
  /** One member of a grouped '/'-sequence arm: ([^]predicate, inverse?,
    * own modifier). A starred/plus member contributes its TRANSITIVE pairs
    * to the arm's composition — `(P31/P279*)` is P31 ∪ P31∘P279⁺ — and a
    * zero-admitting member ('*'/'?') composes as identity with its
    * neighbors, so no zero-length node domain is ever needed inside an
    * arm. */
  type PMember = (String, Boolean, String)
  /** One path step. `alts` = simple alternation members (predicate,
    * inverse?). When `seqAlts` is non-empty the step is instead a GROUP of
    * '/'-sequence arms — `(p/q)|r` is seqAlts = [[p,q],[r]] (and alts is
    * empty) — whose edge relation is the union over arms of the COMPOSED
    * member scans (§9.1 path recursion, one level: arm members are
    * [^]predicates, each with an optional own modifier). Step-level
    * modifiers apply to the whole group relation, so `(p/q)*` is the
    * closure of the p∘q composite; an arm whose members ALL admit zero
    * ('*'/'?') makes the whole step zero-admitting, which the compiler
    * folds into the step modifier ("" → "?", "+" → "*"). Negated steps
    * never carry seqAlts (the §9.1 NPS grammar admits only
    * [^]predicates). */
  final case class PStep(alts: Seq[(String, Boolean)], mod: String,
                         negated: Boolean = false,
                         seqAlts: Seq[Seq[PMember]] = Nil) {
    def star: Boolean = mod == "*"
  }

  /** SPARQL 1.1 Update operations (§3.1): ground-triple inserts/deletes,
    * pattern-driven deletes, and (§3.2) graph-management operations.
    * DATA blocks may contain `GRAPH <g> { … }` sections (§3.1.1 QuadData)
    * — the per-triple target rides as the 4th component (None = the
    * operation's scope, which is the default graph unless WITH applies). */
  sealed trait UpdOp
  final case class InsertData(quads: Seq[(Term, Term, Term, Option[String])]) extends UpdOp
  final case class DeleteData(quads: Seq[(Term, Term, Term, Option[String])]) extends UpdOp
  final case class DeleteWhere(patterns: Seq[(Term, Term, Term)]) extends UpdOp
  /** §3.1.3 modify form: `[DELETE { t }] [INSERT { t }] WHERE { p }` —
    * templates instantiate under the WHERE bindings; deletes apply before
    * inserts against the same pre-state bindings (§3.1.3's semantics).
    * `using` / `usingNamed` (§3.1.3 UsingClause) re-base the WHERE: with
    * either present, the WHERE's default graph is the union of the `using`
    * graphs (empty when only USING NAMED is given) instead of the
    * operation's target graph. */
  final case class Modify(deletes: Seq[(Term, Term, Term)],
                          inserts: Seq[(Term, Term, Term)],
                          where: Seq[(Term, Term, Term)],
                          using: Seq[String] = Nil,
                          usingNamed: Seq[String] = Nil) extends UpdOp
  /** Per-operation `WITH <g>` scope (§3.1.3): the named graph becomes the
    * wrapped operation's default graph for both matching and effects. */
  final case class Scoped(graph: String, op: UpdOp) extends UpdOp
  /** CLEAR/DROP target selector (§3.2.2/§3.2.3). */
  sealed trait GraphSel
  case object AllGraphs extends GraphSel
  case object NamedGraphsSel extends GraphSel
  /** DEFAULT (None) or GRAPH <iri> (Some). */
  final case class OneGraph(graph: Option[String]) extends GraphSel
  /** CLEAR and DROP (§3.2.2/§3.2.3): this store is a pure set of quads
    * with no empty-graph bookkeeping, so the two are observationally
    * identical (removing a graph's triples == removing the graph) and a
    * missing graph is an empty graph — the conformant no-op for stores
    * that "do not record the existence of empty graphs". SILENT is
    * accepted; there is nothing left for it to suppress. */
  final case class ClearOp(sel: GraphSel, silent: Boolean) extends UpdOp
  /** CREATE GRAPH (§3.2.1): a no-op for the same reason — graphs exist
    * exactly when they hold a quad. Parsed for surface compatibility. */
  final case class CreateOp(graph: String, silent: Boolean) extends UpdOp
  /** ADD/COPY/MOVE (§3.2.5-7): `kind` ∈ {"ADD","COPY","MOVE"}; None =
    * DEFAULT. src == dst is the spec'd no-op. */
  final case class AddLike(kind: String, src: Option[String],
                           dst: Option[String], silent: Boolean) extends UpdOp
  /** LOAD (§3.2.4): parse a local Turtle/TriG document into the store.
    * `into` = INTO GRAPH target (overrides any TriG graph blocks); SILENT
    * covers document resolution (a missing/unreadable path becomes a
    * no-op); parse errors inside a resolvable document still surface at
    * action time. */
  final case class LoadOp(source: String, into: Option[String],
                          silent: Boolean) extends UpdOp

  sealed trait El
  /** `MINUS { … }`: removes solutions compatible with the group on their
    * SHARED variables; with no shared variables, SPARQL keeps everything
    * (§8.3.3) — compiled as a no-op then, a left-anti join otherwise. */
  final case class MinusEl(g: Seq[El]) extends El
  /** `FILTER EXISTS { … }` / `FILTER NOT EXISTS { … }` → left-semi /
    * left-anti join on the shared variables, applied group-wide once all
    * patterns have bound. */
  final case class ExistsEl(g: Seq[El], negated: Boolean) extends El
  final case class Tp(s: Term, p: Path, o: Term) extends El
  /** Variable-predicate triple pattern `?s ?p ?o`: an unfiltered scan with
    * the predicate bound as a column (Blazegraph evaluates these for the
    * reference today, wikidata_index.py:152). */
  final case class TpVar(s: Term, p: String, o: Term) extends El
  final case class UnionEl(arms: Seq[Seq[El]]) extends El
  final case class OptEl(g: Seq[El]) extends El
  /** `GRAPH <g> { … }` / `GRAPH ?g { … }` (§13.3) over a QUAD source —
    * the triple DataFrame must carry a `g` column (the TriG/N-Quads
    * model). A constant graph filters the scan; a variable graph binds
    * `g` on every contained triple pattern (and joins with outer
    * occurrences of the same variable). */
  final case class GraphEl(graph: Term, g: Seq[El]) extends El
  sealed trait Fil extends El
  /** Boolean FILTER expression over the unified expression grammar. */
  final case class FilterExpr(e: EExpr) extends Fil
  final case class LangM(v: String, lang: String) extends Fil

  /** Unified SPARQL value/boolean expression grammar (SPARQL 1.1 §17) —
    * one AST shared by FILTER, BIND, expression projections, aggregate
    * arguments, and ORDER BY keys. Typing is minimal and matches the
    * engine's lexical-string column model: variables and string literals
    * are strings, numeric literals and arithmetic are doubles, comparisons
    * with a numeric side compare numerically (double cast) and otherwise
    * lexicographically (the ISO-string ordering the date filters rely on). */
  sealed trait EExpr
  final case class EVar(v: String) extends EExpr
  final case class EStr(s: String) extends EExpr
  final case class ENum(lex: String) extends EExpr
  final case class ENeg(e: EExpr) extends EExpr
  /** op ∈ + - * / — operands cast to double. */
  final case class EArith(op: String, l: EExpr, r: EExpr) extends EExpr
  final case class ECmp(op: String, l: EExpr, r: EExpr) extends EExpr
  /** `?x [NOT] IN (const, …)` — inline membership over constant terms. */
  final case class EIn(e: EExpr, vals: Seq[String], negated: Boolean) extends EExpr
  final case class EAnd(l: EExpr, r: EExpr) extends EExpr
  final case class EOr(l: EExpr, r: EExpr) extends EExpr
  final case class ENot(e: EExpr) extends EExpr
  /** `BOUND(?v)` — SPARQL unbound maps to SQL null under OPTIONAL. */
  final case class EBound(v: String) extends EExpr
  final case class EIf(c: EExpr, t: EExpr, f: EExpr) extends EExpr
  /** `[NOT] EXISTS { … }` in expression position (§17.4.1.4): legal
    * anywhere a boolean fits inside a FILTER expression — lifted to a
    * hidden boolean mark column via a compatibility join pair before the
    * filter compiles (see the FilterExpr case in compileGroup). */
  final case class EExists(g: Seq[El], negated: Boolean) extends EExpr
  /** Internal: a lifted boolean mark column reference. */
  private[plans] final case class EMark(name: String) extends EExpr
  /** Compiler-internal leaf: read a duration-typed variable's NUMERIC
    * carrier companion (`__dv_v`) instead of re-parsing its rendered
    * lexical. Substituted by [[SparqlText.rewriteDurVals]] for
    * `xsd:dayTimeDuration(?v)` / `xsd:yearMonthDuration(?v)` when the
    * frame carries the companion (i.e. ?v was BOUND duration-typed in
    * this query) — the parse∘render round-trip is the identity there,
    * and skipping it keeps codegen size linear: without this, a BIND'd
    * duration re-entering the rung inlines its (large) render CaseWhen
    * into each of the parser's ~7 uses — the sub-hang remnant of the
    * round-13 codegen explosion (q277: 13.6 s of pure JIT at sf0.1). */
  private[plans] final case class EDurVal(v: String, ym: Boolean)
    extends EExpr
  /** Builtin call: STR, STRLEN, UCASE, LCASE, SUBSTR, CONCAT, CONTAINS,
    * STRSTARTS, STRENDS, STRBEFORE, STRAFTER, REPLACE, REGEX, ABS, ROUND,
    * CEIL, FLOOR, YEAR, MONTH, DAY, COALESCE. */
  final case class EFn(name: String, args: Seq[EExpr]) extends EExpr

  final case class ValuesEl(v: String, vals: Seq[String]) extends El
  /** Multi-variable `VALUES (?a ?b) { ("x" "y") … }` — an inline table
    * inner-joined on its variables; None = UNDEF (that row leaves the
    * variable unconstrained — §10.2.2). */
  final case class ValuesTabEl(vars: Seq[String],
                               rows: Seq[Seq[Option[String]]]) extends El
  final case class BindExpr(out: String, e: EExpr) extends El

  /** `BIND(URI(CONCAT("prefix", STRUUID())) AS ?v)` — the provided-entity
    * mint (create_provided_entities_graph_v2.sparql:21). STRUUID is
    * nondeterministic; the engine substitutes an md5 of the row's
    * non-anonymous bound variables (R2 / SURVEY §7.3 "Nondeterminism"):
    * one URI per distinct binding, idempotent across re-runs. */
  final case class BindMint(out: String, prefix: String) extends El
  final case class SubSel(s: SelectQ) extends El
  final case class LabelSvc(langs: Seq[String]) extends El
  /** `SERVICE [SILENT] <iri> { … }` — general federation (§18). The IRI
    * resolves through [[registerService]]'s name→DataFrame registry (the
    * testable stand-in for a remote endpoint — the reference's whole
    * federation surface is one fixed endpoint per pipeline,
    * wikidata_index.py:129-152); the body evaluates against that graph
    * and bag-joins on shared variables (§18.2.4.3). */
  final case class ServiceEl(iri: String, g: Seq[El], silent: Boolean) extends El
  /** `SERVICE ?var { … }` — per-binding dispatch (§18.2.4): the candidate
    * service set is the session's REGISTERED endpoints (driver-bounded),
    * so the plan is one compiled body per registered endpoint, tagged
    * with its IRI, unioned, and joined on the endpoint variable plus the
    * shared body variables — each outer solution consults exactly the
    * endpoint its binding names. An outer value naming no registered
    * endpoint contributes no solutions (there is no row-level error
    * channel; this is the SILENT per-row posture, documented). */
  final case class ServiceVarEl(v: String, g: Seq[El], silent: Boolean) extends El

  sealed trait ProjItem { def out: String }
  final case class PVar(src: String, out: String) extends ProjItem
  /** `SELECT *` — all named (non-internal) variables; must stand alone. */
  case object PStar extends ProjItem { val out = "*" }
  /** `(expr AS ?v)` non-aggregate expression projection, computed over the
    * bound solution before DISTINCT/ORDER; with a GROUP BY it may only
    * reference group keys (anything else fails analysis loudly). */
  final case class PExpr(e: EExpr, out: String) extends ProjItem
  final case class PGroupConcat(src: String, out: String, distinct: Boolean,
                                sep: String = " ") extends ProjItem
  /** `(COUNT(DISTINCT ?v) AS ?n)`-style aggregate projections — the shape
    * the reference DERIVES textually for its paging count queries
    * (wikidata_index.py:173-179). fn ∈ count/sum/min/max/avg/sample;
    * src `"*"` only for COUNT. SAMPLE compiles to min() — SPARQL allows
    * any member, the engine picks deterministically (SURVEY §7.3). */
  final case class PAgg(fn: String, src: String, out: String,
                        distinct: Boolean) extends ProjItem
  /** Aggregate over a computed expression — `SUM(?price * ?qty)` — the
    * everyday measure-derivation shape. */
  final case class PAggE(fn: String, e: EExpr, out: String,
                         distinct: Boolean) extends ProjItem

  /** Aggregate call inside a `HAVING` expression — `COUNT(*)`,
    * `SUM(?v)`, `MIN(?a * ?b)` — legal only there (the parser gates it);
    * compiled as a hidden aggregate column the rewritten predicate
    * references. arg: Left(var or "*") / Right(computed expression). */
  final case class EAgg(fn: String, arg: Either[String, EExpr],
                        distinct: Boolean) extends EExpr

  sealed trait Query
  final case class SelectQ(
      distinct: Boolean,
      proj: Seq[ProjItem],
      where: Seq[El],
      groupBy: Seq[String],
      groupByExprs: Seq[(EExpr, String)], // `GROUP BY (expr AS ?v)` keys
      having: Seq[EExpr], // boolean expressions over EAgg aggregate calls
      orderBy: Seq[(EExpr, Boolean)], // (key expression, descending)
      limit: Option[Either[Long, String]],
      offset: Option[Either[Long, String]],
      // `FROM <g>` / `FROM NAMED <g>` dataset clauses (§13.2): when either
      // is present the dataset is explicitly described — the default graph
      // is the merge of the FROM graphs (empty if only FROM NAMED appears)
      // and GRAPH ranges over exactly the FROM NAMED set (empty if only
      // FROM appears). Both compile to `g` filters on the quad source.
      fromGraphs: Seq[String] = Nil,
      fromNamed: Seq[String] = Nil,
      // trailing `VALUES` clause (§18.2.4: joined AFTER grouping and
      // HAVING, before projection/DISTINCT/ORDER — so on a grouped
      // query it constrains GROUPS, not their inputs)
      postValues: Option[El] = None) extends Query

  /** `CONSTRUCT { templates } WHERE { … }` — emits one (s, p, o) row per
    * template triple per solution, set-deduplicated (graph semantics).
    * Solution modifiers (§10.2: ORDER BY/LIMIT/OFFSET) apply to the
    * SOLUTION SEQUENCE before templating — they select WHICH solutions
    * instantiate the template; the emitted graph stays a set. */
  final case class ConstructQ(templates: Seq[Tp], where: Seq[El],
      orderBy: Seq[(EExpr, Boolean)] = Nil,
      limit: Option[Either[Long, String]] = None,
      offset: Option[Either[Long, String]] = None) extends Query

  /** `ASK WHERE { … }` — one row, one boolean `ask` column: does the
    * pattern have at least one solution? Compiles to limit(1) + count so
    * the scan short-circuits after the first match. */
  final case class AskQ(where: Seq[El]) extends Query

  /** `DESCRIBE <iri>… [?v…] [WHERE { … }]` — all triples whose SUBJECT is
    * a described node (forward description; the engine's triple views
    * carry no blank nodes, so no CBD recursion — DESCRIBE's exact shape is
    * implementation-defined per §16.4). Variables require a WHERE group
    * that binds them; the node set semi-joins the triple scan. */
  final case class DescribeQ(terms: Seq[Term], where: Seq[El]) extends Query

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
      else if (c.isDigit ||
               ((c == '+' || c == '-') && peekAt(i + 1).isDigit) ||
               (c == '.' && peekAt(i + 1).isDigit)) {
        // signed integer / decimal / exponent numeric literal; a '.' not
        // followed by a digit stays the statement terminator
        val start = i
        if (c == '+' || c == '-') i += 1
        while (i < n && q.charAt(i).isDigit) i += 1
        if (i < n && q.charAt(i) == '.' && peekAt(i + 1).isDigit) {
          i += 1
          while (i < n && q.charAt(i).isDigit) i += 1
        }
        if (i < n && (q.charAt(i) == 'e' || q.charAt(i) == 'E')) {
          val j = if (peekAt(i + 1) == '+' || peekAt(i + 1) == '-') i + 2 else i + 1
          if (j < n && q.charAt(j).isDigit) {
            i = j
            while (i < n && q.charAt(i).isDigit) i += 1
          }
        }
        out += TNum(q.substring(start, i))
      }
      else if ("{}()[].,;*/".indexOf(c) >= 0) { out += TPunct(c.toString); i += 1 }
      else if (c == '?' || c == '$') {
        val start = i + 1
        i += 1
        while (i < n && (q.charAt(i).isLetterOrDigit || q.charAt(i) == '_')) i += 1
        // a bare '?' with no name is the zero-or-one path modifier
        if (i == start && c == '?') out += TPunct("?")
        else out += TVar(q.substring(start, i))
      } else if (c == '+') { out += TPunct("+"); i += 1 }
      // a '-' not starting a signed number is the arithmetic operator
      // (pname-internal '-' is consumed inside the word branch below)
      else if (c == '-') { out += TPunct("-"); i += 1 }
      else if (c == '<') {
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
      else if (c == '!') { out += TPunct("!"); i += 1 }
      else if (c == '&' && peekAt(i + 1) == '&') { out += TPunct("&&"); i += 2 }
      else if (c == '|' && peekAt(i + 1) == '|') { out += TPunct("||"); i += 2 }
      else if (c == '|') { out += TPunct("|"); i += 1 }
      else if (c == '^') { out += TPunct("^"); i += 1 }
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

  def parse(query: String): Query = new P(tokenize(query)).query()

  def parseUpdate(text: String): Seq[UpdOp] =
    new P(tokenize(text)).updateRequest()._1

  /** Full parse: (ops, optional `WITH <g>` scope). */
  def parseUpdateRequest(text: String): (Seq[UpdOp], Option[String]) =
    new P(tokenize(text)).updateRequest()

  /** Parse + apply a SPARQL 1.1 Update request against a (s, p, o) triple
    * DataFrame, returning the updated store (RDF SET semantics on the
    * DELTA: inserts add only absent triples, deletes remove every matching
    * row; pre-existing duplicate rows in the store are never collapsed —
    * the update touches exactly the triples the request names).
    *
    * The reference mutates its stores through rdflib `Graph.add`/`remove`
    * (get_data_from_apis_instance.py:78-94) and bulk endpoint upserts;
    * this is the declarative equivalent: each op is one anti-join (or
    * anti-join + union), all equi-joins on (s, p, o) — broadcastable
    * whenever the delta is small, which is the update-workload shape.
    * `DELETE WHERE` evaluates its BGP by joining per-pattern matches on
    * shared variables, then instantiates each pattern under the bindings
    * — the deletion set is exact even for join-correlated patterns. */
  def update(text: String, store: DataFrame): DataFrame = {
    val (ops, withGraph) = parseUpdateRequest(text)
    store.columns.sorted.toSeq match {
      case Seq("g", "o", "p", "s") => applyQuadUpdate(ops, store, withGraph)
      case _ if withGraph.isDefined =>
        sys.error("WITH <g> expects a quad store with exactly " +
          s"(s, p, o, g) columns, got (${store.columns.mkString(", ")})")
      case _ => applyUpdate(ops, store)
    }
  }

  // ---- ground-term / pattern machinery shared by both store shapes ----

  private def lexTerm(t: Term): String = t match {
    case C(v) => v
    case L(v) => v
    case V(v) => sys.error(s"unbound variable ?$v in ground-triple position")
  }
  private def constTriples(sp: org.apache.spark.sql.SparkSession,
                           ts: Seq[(Term, Term, Term)]): DataFrame = {
    import sp.implicits._
    ts.map { case (s, p, o) => (lexTerm(s), lexTerm(p), lexTerm(o)) }
      .toDF("s", "p", "o").distinct()
  }
  /** Rows matching one pattern, projected to its variable bindings;
    * a repeated variable inside the pattern adds an equality filter. */
  private def matchPattern(store: DataFrame,
                           pat: (Term, Term, Term)): DataFrame = {
    val positions = Seq("s" -> pat._1, "p" -> pat._2, "o" -> pat._3)
    var df = store
    val seen = scala.collection.mutable.Map.empty[String, String]
    positions.foreach {
      case (pos, C(v)) => df = df.filter(col(pos) === v)
      case (pos, L(v)) => df = df.filter(col(pos) === v)
      case (pos, V(n)) => seen.get(n) match {
        case Some(first) => df = df.filter(col(pos) === col(first))
        case None => seen(n) = pos
      }
    }
    if (seen.isEmpty) df.select() // all-ground: rows carry no bindings
    else df.select(seen.toSeq.sortBy(_._1)
      .map { case (n, pos) => col(pos).as(n) }: _*)
  }
  private def instantiate(bind: DataFrame,
                          pat: (Term, Term, Term)): DataFrame = {
    def c(pos: String, t: Term): Column = t match {
      case V(n) => col(n).as(pos)
      case other => lit(lexTerm(other)).as(pos)
    }
    bind.select(c("s", pat._1), c("p", pat._2), c("o", pat._3))
  }
  private def bindings(store: DataFrame,
                       ps: Seq[(Term, Term, Term)]): DataFrame =
    ps.map(matchPattern(store, _)).reduceLeft { (a, b) =>
      val shared = a.columns.toSeq.intersect(b.columns.toSeq)
      if (shared.isEmpty) a.crossJoin(b) else a.join(b, shared)
    }
  private def templateVars(ts: Seq[(Term, Term, Term)]): Set[String] =
    ts.flatMap(t => Seq(t._1, t._2, t._3)).collect { case V(n) => n }.toSet
  private def dropGraphTargets(qs: Seq[(Term, Term, Term, Option[String])],
                               ctx: String): Seq[(Term, Term, Term)] =
    qs.map {
      case (s, p, o, None) => (s, p, o)
      case (_, _, _, Some(g)) =>
        sys.error(s"GRAPH <$g> targets in $ctx require a quad store (s, p, o, g)")
    }

  /** One data/modify op over a TRIPLE store. `whereOverride` carries the
    * USING-constructed dataset for a modify's WHERE (quad path only). */
  private def applyTripleOp(op: UpdOp, store: DataFrame,
                            whereOverride: Option[DataFrame]): DataFrame = {
    val sp = store.sparkSession
    op match {
      case InsertData(qs) =>
        val ts = constTriples(sp, dropGraphTargets(qs, "INSERT DATA"))
        store.unionByName(ts.join(store, Seq("s", "p", "o"), "left_anti"))
      case DeleteData(qs) =>
        store.join(constTriples(sp, dropGraphTargets(qs, "DELETE DATA")),
          Seq("s", "p", "o"), "left_anti")
      case DeleteWhere(ps) =>
        val b = bindings(store, ps)
        val dels = ps.map(instantiate(b, _))
          .reduce(_ unionByName _).distinct()
        store.join(dels, Seq("s", "p", "o"), "left_anti")
      case Modify(dts, its, ps, u, un) =>
        if (whereOverride.isEmpty && (u.nonEmpty || un.nonEmpty))
          sys.error("USING requires a quad store (s, p, o, g)")
        val whereVars = templateVars(ps)
        val unbound = templateVars(dts) ++ templateVars(its) -- whereVars
        if (unbound.nonEmpty)
          sys.error("template variables not bound by WHERE: " +
            unbound.toSeq.sorted.map("?" + _).mkString(", "))
        // both templates instantiate under the PRE-state bindings
        // (§3.1.3); deletes land before inserts
        val b = bindings(whereOverride.getOrElse(store), ps)
        def inst(ts: Seq[(Term, Term, Term)]): Option[DataFrame] =
          if (ts.isEmpty) None
          else Some(ts.map(instantiate(b, _)).reduce(_ unionByName _).distinct())
        val afterDel = inst(dts) match {
          case Some(d) => store.join(d, Seq("s", "p", "o"), "left_anti")
          case None => store
        }
        inst(its) match {
          case Some(ins) => afterDel.unionByName(
            ins.join(afterDel, Seq("s", "p", "o"), "left_anti"))
          case None => afterDel
        }
      case _ => sys.error("graph-scoped and graph-management operations " +
        "(WITH, CLEAR, DROP, CREATE, ADD, COPY, MOVE, LOAD) require a " +
        "quad store (s, p, o, g)")
    }
  }

  def applyUpdate(ops: Seq[UpdOp], store0: DataFrame): DataFrame = {
    // A quad store would silently lose its g column through the (s,p,o)
    // projection below — the quad path handles it. Refuse loudly rather
    // than corrupting on any other shape.
    if (store0.columns.sorted.toSeq != Seq("o", "p", "s"))
      sys.error("update() expects a triple store with exactly (s, p, o) " +
        s"columns, got (${store0.columns.mkString(", ")})")
    // Each op references its input store several times (per-pattern
    // matches + the anti-join probe side), so a lazily-chained sequence
    // would recompute op N's whole plan ~5× inside op N+1. Materialize
    // between sequenced ops (a `;`-sequence is semantically a sequence of
    // store states); the FINAL op's result stays lazy for the caller.
    ops.zipWithIndex.foldLeft(store0.select(col("s"), col("p"), col("o"))) {
      case (store, (op, idx)) =>
        val out = applyTripleOp(op, store, None)
        if (idx < ops.length - 1) out.localCheckpoint() else out
    }
  }

  // ---- quad-store (named-graph dataset) update path ----

  /** NULL g = the default graph throughout (the TriG/N-Quads model). */
  private def gPred(t: Option[String]): Column =
    t.map(g => col("g") <=> lit(g)).getOrElse(col("g").isNull)
  private def gLit(t: Option[String]): Column =
    t.map(g => lit(g)).getOrElse(lit(null).cast("string"))

  /** Run a triple-level op against ONE graph slice of a quad store: split,
    * update the slice as triples, reattach the graph column, union the
    * untouched remainder back. Both filters push to a g-partitioned quad
    * scan (null-SAFELY — `g =!= lit` would drop default-graph rows); the
    * remainder never shuffles. */
  private def onSlice(store: DataFrame, t: Option[String])
                     (f: DataFrame => DataFrame): DataFrame = {
    val slice = store.filter(gPred(t)).select(col("s"), col("p"), col("o"))
    val rest = store.filter(!gPred(t))
    f(slice).withColumn("g", gLit(t))
      .select(col("s"), col("p"), col("o"), col("g"))
      .unionByName(rest)
  }

  /** §3 over a named-graph dataset: data/modify ops run on their target
    * graph's slice via the triple machinery; graph management is quad-
    * native. Each op is anti-join/union/filter work proportional to the
    * DELTA (or one graph's slice), never a whole-store shuffle. */
  def applyQuadUpdate(ops: Seq[UpdOp], store0: DataFrame,
                      requestScope: Option[String]): DataFrame = {
    if (store0.columns.sorted.toSeq != Seq("g", "o", "p", "s"))
      sys.error("applyQuadUpdate expects a quad store with exactly " +
        s"(s, p, o, g) columns, got (${store0.columns.mkString(", ")})")
    val cols = Seq(col("s"), col("p"), col("o"), col("g"))
    ops.zipWithIndex.foldLeft(store0.select(cols: _*)) {
      case (store, (op, idx)) =>
        val out = applyQuadOp(op, store, requestScope)
        if (idx < ops.length - 1 && !pureNarrowOp(op)) out.localCheckpoint()
        else out
    }
  }

  /** Ops whose output plan is a FILTER/UNION-of-filters over the input —
    * recomputing them inside the next op's ~5 store references costs a
    * predicate, not a join, so the inter-op materialization is skipped
    * (CLEAR/DROP = one filter; CREATE = identity; COPY/MOVE = two
    * filters + a relabel). ADD anti-joins its destination slice for set
    * semantics, so it stays checkpointed with the data/modify/load ops. */
  private def pureNarrowOp(op: UpdOp): Boolean = op match {
    case _: ClearOp | _: CreateOp => true
    case AddLike(kind, _, _, _) => kind != "ADD"
    case Scoped(_, inner) => pureNarrowOp(inner)
    case _ => false
  }

  private def applyQuadOp(op: UpdOp, store: DataFrame,
                          scope: Option[String]): DataFrame = op match {
    case Scoped(g, inner) => applyQuadOp(inner, store, Some(g))
    case ClearOp(sel, _) => sel match {
      // CLEAR/DROP: removing the triples IS removing the graph here (no
      // empty-graph bookkeeping — see the UpdOp scaladoc)
      case AllGraphs => store.filter(lit(false))
      case NamedGraphsSel => store.filter(col("g").isNull)
      case OneGraph(t) => store.filter(!gPred(t))
    }
    case CreateOp(_, _) => store // graphs exist exactly when non-empty
    case AddLike(kind, src, dst, _) =>
      if (src == dst) store // §3.2.5-7: same-graph ops are no-ops
      else {
        val moved = store.filter(gPred(src))
          .select(col("s"), col("p"), col("o")).withColumn("g", gLit(dst))
        kind match {
          case "ADD" =>
            // set semantics on the destination (D4): only absent rows land
            val dstRows = store.filter(gPred(dst))
              .select(col("s"), col("p"), col("o"))
            store.unionByName(
              moved.join(dstRows, Seq("s", "p", "o"), "left_anti"))
          case "COPY" => store.filter(!gPred(dst)).unionByName(moved)
          case "MOVE" =>
            store.filter(!gPred(dst) && !gPred(src)).unionByName(moved)
        }
      }
    case LoadOp(source, into, silent) =>
      val sp = store.sparkSession
      val path = source.stripPrefix("file://")
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) {
        if (silent) store // §3.2.4: SILENT turns resolution failure into no-op
        else sys.error(s"LOAD: document not found: $source")
      } else {
        import sp.implicits._
        // distributed parse (one task per document file); INTO GRAPH
        // overrides any TriG graph blocks, else blocks keep their graph
        // and top-level triples land in the default graph
        val parsed = sp.read.option("wholetext", "true").textFile(path)
          .filter((doc: String) => doc.nonEmpty)
          .flatMap(doc =>
            graft.sources.TurtleParser.parse(doc, "", scopeBnodeLabels = true))
          .toDF()
        val gCol = into match {
          case Some(g) => lit(g)
          case None => when(col("g") === "", lit(null).cast("string"))
            .otherwise(col("g"))
        }
        val incoming = parsed
          .select(col("s"), col("p"), col("o"), gCol.as("g"))
        // EXCEPT is null-safe set difference: dedups the delta and skips
        // rows already present (in any graph slice, NULL g included)
        store.unionByName(incoming.except(store))
      }
    case InsertData(qs) =>
      // group triples by effective target (explicit GRAPH beats the op
      // scope); targets are disjoint slices, so application order is moot
      qs.map(_._4.orElse(scope)).distinct.foldLeft(store) { (st, t) =>
        val group = qs.filter(_._4.orElse(scope) == t)
          .map(q => (q._1, q._2, q._3, None))
        onSlice(st, t)(applyTripleOp(InsertData(group), _, None))
      }
    case DeleteData(qs) =>
      qs.map(_._4.orElse(scope)).distinct.foldLeft(store) { (st, t) =>
        val group = qs.filter(_._4.orElse(scope) == t)
          .map(q => (q._1, q._2, q._3, None))
        onSlice(st, t)(applyTripleOp(DeleteData(group), _, None))
      }
    case DeleteWhere(_) =>
      onSlice(store, scope)(applyTripleOp(op, _, None))
    case m @ Modify(_, _, _, u, un) =>
      // §3.1.3 UsingClause: with USING / USING NAMED present, the WHERE
      // evaluates over a dataset whose default graph is the union of the
      // `using` graphs (empty if only USING NAMED was given); templates
      // still hit the operation's target graph
      val whereOverride =
        if (u.nonEmpty || un.nonEmpty)
          Some(store
            .filter(if (u.isEmpty) lit(false) else col("g").isin(u: _*))
            .select(col("s"), col("p"), col("o")))
        else None
      onSlice(store, scope)(applyTripleOp(m, _, whereOverride))
  }

  private final class P(toks0: Vector[Tok]) {
    private var toks = toks0
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
    private def varName(): String = next() match {
      case TVar(v) => v
      case t => fail(s"expected variable, got $t")
    }
    private def mkAgg(w: String, src: String, dist: Boolean): PAgg =
      PAgg(w.toLowerCase, src, "", dist)

    // PREFIX declarations from the prologue; pnames with a declared prefix
    // resolve to full IRIs, undeclared ones stay textual (the symbol-space
    // convention the round-1/2 queries use).
    private val prefixes = scala.collection.mutable.Map[String, String]()
    private var anonN = 0
    private def freshAnon(): String = { anonN += 1; s"__anon$anonN" }
    private def resolvePname(v: String): String = {
      val idx = v.indexOf(':')
      val (pfx, local) = (v.substring(0, idx), v.substring(idx + 1))
      prefixes.get(pfx).map(_ + local).getOrElse(v)
    }

    /** RFC-3986 scheme check; relative IRIs resolve against BASE. */
    private val AbsIri = "^[A-Za-z][A-Za-z0-9+.-]*:.*".r
    private var base = ""
    private def resolveIri(v: String): String =
      if (base.isEmpty || AbsIri.matches(v)) v
      else graft.sources.TurtleParser.resolveRef(base, v)

    private def prologue(): Unit = {
      var go = true
      while (go && !eof) {
        if (isKw(peek, "PREFIX")) {
          i += 1
          val name = next() match {
            case TPname(p) if p.endsWith(":") => p.dropRight(1)
            case TPname(p) => p.takeWhile(_ != ':')
            case TIdent(w) => w
            case t => fail(s"expected prefix name, got $t")
          }
          // the ':' may have been folded into the pname token or stand alone
          if (peek == TPunct(":")) i += 1
          val iri = next() match {
            case TIri(v) => resolveIri(v) // prefix IRIs resolve against BASE
            case t => fail(s"expected prefix IRI, got $t")
          }
          prefixes(name) = iri
        } else if (isKw(peek, "BASE")) {
          i += 1
          base = next() match {
            case TIri(v) => resolveIri(v) // later BASEs resolve against earlier
            case t => fail(s"expected base IRI, got $t")
          }
        } else go = false
      }
      // With a BASE in force, resolve every remaining IRI token once at the
      // single choke point the grammar shares — term positions, paths,
      // VALUES, graph names, FROM clauses, and update blocks all consume
      // TIri tokens downstream of here.
      if (base.nonEmpty)
        toks = toks.zipWithIndex.map {
          case (TIri(v), idx) if idx >= i => TIri(resolveIri(v))
          case (t, _) => t
        }
    }

    private def graphIriTok(): String = next() match {
      case TIri(v) => resolveIri(v)
      case TPname(v) => resolvePname(v)
      case t => fail(s"expected graph IRI, got $t")
    }
    private def silentFlag(): Boolean =
      if (isKw(peek, "SILENT")) { i += 1; true } else false
    /** `(GRAPH)? <iri> | DEFAULT` — ADD/COPY/MOVE operands (§3.2.5). */
    private def graphRef(): Option[String] =
      if (isKw(peek, "DEFAULT")) { i += 1; None }
      else { if (isKw(peek, "GRAPH")) i += 1; Some(graphIriTok()) }
    /** `GRAPH <iri> | DEFAULT | NAMED | ALL` — CLEAR/DROP (§3.2.2). */
    private def graphSel(): GraphSel =
      if (isKw(peek, "ALL")) { i += 1; AllGraphs }
      else if (isKw(peek, "NAMED")) { i += 1; NamedGraphsSel }
      else if (isKw(peek, "DEFAULT")) { i += 1; OneGraph(None) }
      else if (isKw(peek, "GRAPH")) { i += 1; OneGraph(Some(graphIriTok())) }
      else fail("expected GRAPH <iri>, DEFAULT, NAMED, or ALL")
    /** `(USING (NAMED)? <iri>)*` between templates and WHERE (§3.1.3). */
    private def usingClauses(): (Seq[String], Seq[String]) = {
      val u = Vector.newBuilder[String]; val un = Vector.newBuilder[String]
      while (isKw(peek, "USING")) {
        i += 1
        if (isKw(peek, "NAMED")) { i += 1; un += graphIriTok() }
        else u += graphIriTok()
      }
      (u.result(), un.result())
    }

    /** Update request (SPARQL 1.1 Update §3): an optional leading
      * `WITH <g>` (graft extension: scopes EVERY op in the sequence —
      * coincides with the spec for single-op requests) then a
      * `;`-separated sequence of data ops (`INSERT DATA` / `DELETE DATA`,
      * with `GRAPH <g> { … }` sections), modify forms (each accepting its
      * own `WITH` and `USING` / `USING NAMED`), and graph management:
      * `CLEAR` / `DROP` / `CREATE` / `ADD` / `COPY` / `MOVE` / `LOAD`. */
    def updateRequest(): (Seq[UpdOp], Option[String]) = {
      prologue()
      val withGraph =
        if (isKw(peek, "WITH")) { i += 1; Some(graphIriTok()) } else None
      val ops = Vector.newBuilder[UpdOp]
      var more = true
      while (more) {
        val opScope =
          if (isKw(peek, "WITH")) { i += 1; Some(graphIriTok()) } else None
        val op: UpdOp = if (isKw(peek, "INSERT")) {
          i += 1
          if (isKw(peek, "DATA")) {
            i += 1; InsertData(quadBlock(allowVars = false))
          } else {
            // INSERT { t } (USING …)* WHERE { p }
            val ins = tripleBlock(allowVars = true)
            val (u, un) = usingClauses()
            expectKw("WHERE")
            Modify(Nil, ins, tripleBlock(allowVars = true), u, un)
          }
        } else if (isKw(peek, "DELETE")) {
          i += 1
          if (isKw(peek, "DATA")) {
            i += 1; DeleteData(quadBlock(allowVars = false))
          } else if (isKw(peek, "WHERE")) {
            i += 1; DeleteWhere(tripleBlock(allowVars = true))
          } else if (peek == TPunct("{")) {
            // DELETE { t } [INSERT { t }] (USING …)* WHERE { p }
            val dels = tripleBlock(allowVars = true)
            val ins =
              if (isKw(peek, "INSERT")) { i += 1; tripleBlock(allowVars = true) }
              else Nil
            val (u, un) = usingClauses()
            expectKw("WHERE")
            Modify(dels, ins, tripleBlock(allowVars = true), u, un)
          } else fail("expected DATA, WHERE, or a template block after DELETE")
        } else if (isKw(peek, "CLEAR") || isKw(peek, "DROP")) {
          i += 1; val s = silentFlag(); ClearOp(graphSel(), s)
        } else if (isKw(peek, "CREATE")) {
          i += 1; val s = silentFlag(); expectKw("GRAPH"); CreateOp(graphIriTok(), s)
        } else if (isKw(peek, "ADD") || isKw(peek, "COPY") || isKw(peek, "MOVE")) {
          val kind = peek.asInstanceOf[TIdent].v.toUpperCase
          i += 1; val s = silentFlag()
          val src = graphRef(); expectKw("TO"); val dst = graphRef()
          AddLike(kind, src, dst, s)
        } else if (isKw(peek, "LOAD")) {
          i += 1; val s = silentFlag()
          val src = next() match {
            case TIri(v) => resolveIri(v)
            case t => fail(s"expected document IRI after LOAD, got $t")
          }
          val into =
            if (isKw(peek, "INTO")) { i += 1; expectKw("GRAPH"); Some(graphIriTok()) }
            else None
          LoadOp(src, into, s)
        } else fail("expected INSERT, DELETE, CLEAR, DROP, CREATE, ADD, " +
          s"COPY, MOVE, or LOAD, got $peek")
        ops += (opScope match {
          case None => op
          case Some(g) => op match {
            // §3.1.3's grammar attaches WITH to modify forms only
            case _: Modify | _: DeleteWhere => Scoped(g, op)
            case _ => fail("WITH scopes modify operations " +
              "(DELETE/INSERT … WHERE, DELETE WHERE) only")
          }
        })
        if (peek == TPunct(";")) { i += 1; more = !eof } else more = false
      }
      if (!eof) fail(s"trailing tokens after update request: $peek")
      (ops.result(), withGraph)
    }

    /** One `s p o` entry of a triple/quad block. */
    private def blockTriple(allowVars: Boolean): (Term, Term, Term) = {
      val s = term(); val p = term(); val o = term()
      if (!allowVars)
        Seq(s, p, o).foreach {
          case V(v) => fail(s"variable ?$v in a DATA block (ground triples only)")
          case _ =>
        }
      (s, p, o)
    }

    /** `{ s p o . … }` — simple terms only (no paths, no po-lists); DATA
      * blocks additionally reject variables (§3.1.1: ground triples). */
    private def tripleBlock(allowVars: Boolean): Seq[(Term, Term, Term)] = {
      expectPunct("{")
      val ts = Vector.newBuilder[(Term, Term, Term)]
      while (peek != TPunct("}")) {
        ts += blockTriple(allowVars)
        if (peek == TPunct(".")) i += 1
      }
      i += 1
      ts.result()
    }

    /** §3.1.1 QuadData: a triple block whose entries may sit inside
      * `GRAPH <g> { … }` sections; the per-triple target rides along
      * (None = the operation's scope). */
    private def quadBlock(allowVars: Boolean): Seq[(Term, Term, Term, Option[String])] = {
      expectPunct("{")
      val ts = Vector.newBuilder[(Term, Term, Term, Option[String])]
      while (peek != TPunct("}")) {
        if (isKw(peek, "GRAPH")) {
          i += 1
          val g = graphIriTok()
          expectPunct("{")
          while (peek != TPunct("}")) {
            val t = blockTriple(allowVars)
            ts += ((t._1, t._2, t._3, Some(g)))
            if (peek == TPunct(".")) i += 1
          }
          i += 1
          if (peek == TPunct(".")) i += 1 // optional separator between sections
        } else {
          val t = blockTriple(allowVars)
          ts += ((t._1, t._2, t._3, None))
          if (peek == TPunct(".")) i += 1
        }
      }
      i += 1
      ts.result()
    }

    /** Top entry: prologue then SELECT or CONSTRUCT. */
    def query(): Query = {
      prologue()
      if (isKw(peek, "CONSTRUCT")) {
        var q = constructQuery()
        // §10.2 solution modifiers: the full SolutionModifier is
        // grammatical on CONSTRUCT. ORDER BY/LIMIT/OFFSET select which
        // solutions instantiate the template. GROUP BY/HAVING make the
        // solution sequence the GROUPED solutions — and because CONSTRUCT
        // has no projection clause to name an aggregate, the engine
        // accepts the extension `GROUP BY ?k (COUNT(?x) AS ?c)`: a group
        // condition whose expression is a single aggregate call BINDS
        // that aggregate over each group (it is not a key), which is the
        // only way a template can reference an aggregate value. Grouped
        // CONSTRUCTs desugar to `CONSTRUCT { t } WHERE { SELECT … }` —
        // the subselect compiles through the full SELECT grouping
        // machinery (hidden HAVING columns, aggregate ORDER BY, §18
        // stage order), so the two spellings are one code path.
        var groupBy: Seq[String] = Nil
        var groupByExprs: Seq[(EExpr, String)] = Nil
        var aggBinds: Seq[ProjItem] = Nil
        var having: Seq[EExpr] = Nil
        var trailing = true
        while (trailing && !eof) {
          if (isKw(peek, "ORDER")) q = q.copy(orderBy = orderByKeys())
          else if (isKw(peek, "LIMIT")) { i += 1; q = q.copy(limit = Some(numOrParam())) }
          else if (isKw(peek, "OFFSET")) { i += 1; q = q.copy(offset = Some(numOrParam())) }
          else if (isKw(peek, "GROUP")) {
            i += 1; expectKw("BY")
            val gs = Vector.newBuilder[String]
            val ges = Vector.newBuilder[(EExpr, String)]
            val abs = Vector.newBuilder[ProjItem]
            var more = true
            while (more) peek match {
              case TVar(_) => gs += varName()
              case TPunct("(") =>
                i += 1
                allowAggs = true
                val e = try expr() finally allowAggs = false
                expectKw("AS")
                val v = varName()
                expectPunct(")")
                e match {
                  case EAgg(fn, Left(src), dist) => abs += PAgg(fn, src, v, dist)
                  case EAgg(fn, Right(ex), dist) => abs += PAggE(fn, ex, v, dist)
                  case other if hasAgg(other) => fail(
                    "an aggregate group condition on CONSTRUCT must be a " +
                      "single aggregate call (wrap arithmetic inside the " +
                      s"aggregate or use a subselect): $other")
                  case other => ges += ((other, v))
                }
              case _ => more = false
            }
            groupBy = gs.result(); groupByExprs = ges.result()
            aggBinds = abs.result()
            if (groupBy.isEmpty && groupByExprs.isEmpty)
              fail("GROUP BY requires at least one key")
          } else if (isKw(peek, "HAVING")) {
            i += 1
            if (peek != TPunct("(")) fail("HAVING expects a parenthesized expression")
            val hs = Vector.newBuilder[EExpr]
            allowAggs = true
            try {
              while (peek == TPunct("(")) {
                i += 1
                hs += orExpr()
                expectPunct(")")
              }
            } finally allowAggs = false
            having = having ++ hs.result()
          }
          else trailing = false
        }
        if (!eof) fail(s"trailing tokens after CONSTRUCT: $peek")
        if (groupBy.nonEmpty || groupByExprs.nonEmpty || having.nonEmpty) {
          val keyNames = groupBy ++ groupByExprs.map(_._2)
          val bound = (keyNames ++ aggBinds.map(_.out)).toSet
          val tplVars = q.templates.flatMap(tp =>
            Seq(tp.s, tp.o).collect { case V(v) => v })
          val miss = tplVars.distinct.filterNot(bound)
          if (miss.nonEmpty) fail(
            s"grouped CONSTRUCT template references ungrouped variable(s) " +
              s"${miss.map("?" + _).mkString(", ")} — every template " +
              "variable must be a GROUP BY key or an aggregate binding")
          val sel = SelectQ(distinct = false,
            proj = keyNames.map(v => PVar(v, v)) ++ aggBinds,
            where = q.where, groupBy = groupBy, groupByExprs = groupByExprs,
            having = having, orderBy = q.orderBy, limit = q.limit,
            offset = q.offset)
          q = ConstructQ(q.templates, Seq(SubSel(sel)))
        }
        q
      }
      else if (isKw(peek, "ASK")) {
        i += 1
        if (isKw(peek, "WHERE")) i += 1 // WHERE is optional in ASK
        val q = AskQ(group())
        if (!eof) fail(s"trailing tokens after ASK: $peek")
        q
      }
      else if (isKw(peek, "DESCRIBE")) {
        i += 1
        val terms = Vector.newBuilder[Term]
        var more = true
        while (more) peek match {
          case TVar(_) => terms += V(varName())
          case TIri(v) => i += 1; terms += C(v)
          case TPname(v) => i += 1; terms += C(resolvePname(v))
          case _ => more = false
        }
        val ts = terms.result()
        if (ts.isEmpty) fail("DESCRIBE needs at least one resource or variable")
        val where =
          if (isKw(peek, "WHERE")) { i += 1; group() }
          else if (peek == TPunct("{")) group()
          else Nil
        if (where.isEmpty && ts.exists(_.isInstanceOf[V]))
          fail("DESCRIBE with variables requires a WHERE group binding them")
        DescribeQ(ts, where)
      }
      else selectQuery(top = true)
    }

    private def constructQuery(): ConstructQ = {
      expectKw("CONSTRUCT")
      // §10.2.3 shorthand: `CONSTRUCT WHERE { bgp }` — the template IS
      // the pattern. The spec restricts the form to a basic graph
      // pattern (no FILTER/OPTIONAL/paths), enforced here by requiring
      // every group element to be a plain constant-predicate triple.
      if (isKw(peek, "WHERE")) {
        i += 1
        val where = group()
        val templates = where.collect {
          // exactly one unmodified, non-negated, single-alternative step
          // = a plain constant predicate
          case t @ Tp(_, Path(Seq(PStep(Seq((_, false)), "", false, Nil))), _) => t
        }
        if (templates.isEmpty || templates.size != where.size)
          fail("CONSTRUCT WHERE supports a basic graph pattern only " +
            "(§10.2.3: no FILTER/OPTIONAL/UNION/paths in the shorthand)")
        return ConstructQ(templates, where)
      }
      expectPunct("{")
      val templates = Vector.newBuilder[Tp]
      while (peek != TPunct("}")) {
        if (peek == TPunct(".")) i += 1
        else templates ++= triplePatterns().map {
          case t: Tp => t
          case other => fail(s"CONSTRUCT templates must use constant predicates: $other")
        }
      }
      expectPunct("}")
      expectKw("WHERE")
      val where = group()
      ConstructQ(templates.result(), where)
    }

    def selectQuery(top: Boolean): SelectQ = {
      expectKw("SELECT")
      // REDUCED (§18.2.5.3) permits eliminating ANY subset of duplicates;
      // full elimination is a conforming choice and the only
      // deterministic one — compile it exactly as DISTINCT
      val distinct = (isKw(peek, "DISTINCT") || isKw(peek, "REDUCED")) &&
        { i += 1; true }
      val proj = Vector.newBuilder[ProjItem]
      var reading = true
      while (reading) peek match {
        case TVar(v) => i += 1; proj += PVar(v, v)
        case TPunct("*") => i += 1; proj += PStar
        case TPunct("(") =>
          i += 1
          peek match {
            // `(?v AS ?alias)` — a plain rename, distinguished from an
            // expression starting with the same variable by the lookahead
            case TVar(_) if toks.lift(i + 1).exists(isKw(_, "AS")) =>
              val src = varName()
              expectKw("AS")
              val dst = varName()
              expectPunct(")")
              proj += PVar(src, dst)
            case t if isKw(t, "group_concat") =>
              i += 1; expectPunct("(")
              val dist = isKw(peek, "DISTINCT") && { i += 1; true }
              val src = varName()
              // `; separator="…"` (SPARQL §18.5.1.7); default single space
              val sep = if (peek == TPunct(";")) {
                i += 1; expectKw("separator"); expectPunct("=")
                next() match {
                  case TStr(s, _) => s
                  case t2 => fail(s"expected separator string, got $t2")
                }
              } else " "
              expectPunct(")")
              expectKw("AS")
              val dst = varName()
              expectPunct(")")
              proj += PGroupConcat(src, dst, dist, sep)
            case TIdent(w) if Set("count", "sum", "min", "max", "avg",
                "sample").contains(w.toLowerCase) =>
              i += 1; expectPunct("(")
              val dist = isKw(peek, "DISTINCT") && { i += 1; true }
              val item: ProjItem = peek match {
                case TPunct("*") =>
                  i += 1
                  if (dist || !w.equalsIgnoreCase("count"))
                    fail(s"'*' is only valid in COUNT(*)")
                  mkAgg(w, "*", dist)
                case _ => expr() match {
                  case EVar(v) => mkAgg(w, v, dist)
                  case e => PAggE(w.toLowerCase, e, "", dist)
                }
              }
              expectPunct(")")
              expectKw("AS")
              val dst = varName()
              expectPunct(")")
              proj += (item match {
                case a: PAgg => a.copy(out = dst)
                case a: PAggE => a.copy(out = dst)
                case other => other
              })
            // anything else: a general `(expr AS ?v)` projection
            case _ =>
              val e = expr()
              expectKw("AS")
              val dst = varName()
              expectPunct(")")
              proj += PExpr(e, dst)
          }
        case _ => reading = false
      }
      val fromGraphs = Vector.newBuilder[String]
      val fromNamed = Vector.newBuilder[String]
      while (isKw(peek, "FROM")) {
        if (!top) fail("dataset clauses (FROM) are only valid at top level")
        i += 1
        val named = isKw(peek, "NAMED") && { i += 1; true }
        val iri = next() match {
          case TIri(v) => v
          case TPname(v) => resolvePname(v)
          case t => fail(s"expected graph IRI after FROM, got $t")
        }
        if (named) fromNamed += iri else fromGraphs += iri
      }
      expectKw("WHERE")
      val where = group()
      var groupBy: Seq[String] = Nil
      var groupByExprs: Seq[(EExpr, String)] = Nil
      var having: Seq[EExpr] = Nil
      var orderBy: Seq[(EExpr, Boolean)] = Nil
      var limit: Option[Either[Long, String]] = None
      var offset: Option[Either[Long, String]] = None
      var postValues: Option[El] = None
      var trailing = true
      while (trailing && !eof) {
        if (isKw(peek, "GROUP")) {
          i += 1; expectKw("BY")
          // group conditions: `?v` or `(expr AS ?v)` (SPARQL §19.8)
          val gs = Vector.newBuilder[String]
          val ges = Vector.newBuilder[(EExpr, String)]
          var more = true
          while (more) peek match {
            case TVar(_) => gs += varName()
            case TPunct("(") =>
              i += 1
              val e = expr()
              expectKw("AS")
              val v = varName()
              expectPunct(")")
              ges += ((e, v))
            case _ => more = false
          }
          groupBy = gs.result()
          groupByExprs = ges.result()
          if (groupBy.isEmpty && groupByExprs.isEmpty)
            fail("GROUP BY requires at least one key")
        } else if (isKw(peek, "HAVING")) {
          i += 1
          // one or more parenthesized boolean expressions, each over the
          // full unified grammar with aggregate calls enabled
          if (peek != TPunct("(")) fail("HAVING expects a parenthesized expression")
          val hs = Vector.newBuilder[EExpr]
          allowAggs = true
          try {
            while (peek == TPunct("(")) {
              i += 1
              hs += orExpr()
              expectPunct(")")
            }
          } finally allowAggs = false
          having = having ++ hs.result()
        } else if (isKw(peek, "ORDER")) {
          orderBy = orderByKeys()
        } else if (isKw(peek, "LIMIT")) { i += 1; limit = Some(numOrParam()) }
        else if (isKw(peek, "OFFSET")) { i += 1; offset = Some(numOrParam()) }
        else if (isKw(peek, "VALUES")) { i += 1; postValues = Some(valuesEl()) }
        else trailing = false
      }
      val q = SelectQ(distinct, proj.result(), where, groupBy, groupByExprs,
        having, orderBy, limit, offset, fromGraphs.result(), fromNamed.result(),
        postValues)
      if (top && !eof) fail("trailing tokens after query")
      q
    }

    /** `ORDER BY` keys: `?v`, `ASC(expr)`, `DESC(expr)` — shared by the
      * SELECT and CONSTRUCT (§10.2) modifier blocks. Consumes the ORDER
      * keyword itself. */
    private def orderByKeys(): Seq[(EExpr, Boolean)] = {
      i += 1; expectKw("BY")
      val keys = Vector.newBuilder[(EExpr, Boolean)]
      var more = true
      while (more) peek match {
        case TVar(_) => keys += ((EVar(varName()), false))
        case t if isKw(t, "ASC") || isKw(t, "DESC") =>
          val desc = isKw(t, "DESC")
          i += 1; expectPunct("(")
          // aggregate calls are grammatical here (§18: ORDER BY runs
          // after grouping) — the compiler refuses them on ungrouped
          // queries with the real reason
          allowAggs = true
          keys += ((try expr() finally allowAggs = false, desc))
          expectPunct(")")
        // §18 OrderCondition also admits a bare Constraint: a bracketted
        // expression or a builtin call, ascending. A bare known-function
        // ident parses as that call; an unknown ident (LIMIT, OFFSET,
        // VALUES, …) ends the key list.
        case TPunct("(") =>
          i += 1
          allowAggs = true
          keys += ((try expr() finally allowAggs = false, false))
          expectPunct(")")
        case TIdent(w) if exprFns.contains(w.toUpperCase) ||
            Seq("BOUND", "EXISTS", "IF", "COALESCE").contains(w.toUpperCase) =>
          allowAggs = true
          keys += ((try primaryExpr() finally allowAggs = false, false))
        case _ => more = false
      }
      val out = keys.result()
      if (out.isEmpty) fail("ORDER BY requires at least one key")
      out
    }

    private def numOrParam(): Either[Long, String] = next() match {
      // the tokenizer also produces decimal/exponent numerics now — only
      // plain integers are legal here, and oversized ones fail typed
      case TNum(v) if v.forall(_.isDigit) && v.length <= 18 => Left(v.toLong)
      case TNum(v) => fail(s"LIMIT/OFFSET must be a plain integer, got $v")
      case TVar(v) => Right(v) // `$limit` template parameter
      case t => fail(s"expected number or $$param, got $t")
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
            els += UnionEl(arms.result())
          }
        case t if isKw(t, "OPTIONAL") => i += 1; els += OptEl(group())
        case t if isKw(t, "GRAPH") =>
          i += 1
          val g = next() match {
            case TVar(v) => V(v)
            case TIri(v) => C(v)
            case TPname(v) => C(resolvePname(v))
            case t2 => fail(s"expected graph name or variable, got $t2")
          }
          els += GraphEl(g, group())
        case t if isKw(t, "MINUS") => i += 1; els += MinusEl(group())
        case t if isKw(t, "FILTER") =>
          i += 1
          if (isKw(peek, "NOT")) {
            i += 1; expectKw("EXISTS")
            els += ExistsEl(group(), negated = true)
          } else if (isKw(peek, "EXISTS")) {
            i += 1
            els += ExistsEl(group(), negated = false)
          } else els += filterEl()
        case t if isKw(t, "VALUES") => i += 1; els += valuesEl()
        case t if isKw(t, "BIND") => i += 1; els += bindEl()
        case t if isKw(t, "SERVICE") => i += 1; els += serviceEl()
        case _ => els ++= triplePatterns()
      }
      els.result()
    }

    private def filterEl(): Fil = {
      expectPunct("(")
      val f: Fil = peek match {
        // the scan-attachable fast path needs the EXACT
        // langmatches(lang(?v), "str") shape closing the FILTER;
        // anything else (composite booleans, expression ranges)
        // parses through the general grammar
        case t if isKw(t, "langmatches") &&
              toks.lift(i + 1).contains(TPunct("(")) &&
              toks.lift(i + 2).exists(isKw(_, "lang")) &&
              toks.lift(i + 3).contains(TPunct("(")) &&
              toks.lift(i + 4).exists(_.isInstanceOf[TVar]) &&
              toks.lift(i + 5).contains(TPunct(")")) &&
              toks.lift(i + 6).contains(TPunct(",")) &&
              toks.lift(i + 7).exists(_.isInstanceOf[TStr]) &&
              toks.lift(i + 8).contains(TPunct(")")) &&
              toks.lift(i + 9).contains(TPunct(")")) =>
          i += 1; expectPunct("(")
          expectKw("lang"); expectPunct("(")
          val v = varName()
          expectPunct(")"); expectPunct(",")
          val lang = next() match { case TStr(s, _) => s; case t2 => fail(s"expected lang string, got $t2") }
          expectPunct(")")
          LangM(v, lang)
        case t if isKw(t, "lang") =>
          // FILTER (LANG(?v) = "de") — the scan-attachable shape compiles
          // to a LangM filter on the binding pattern's oLang column; any
          // other LANG use backtracks into the general expression grammar
          // (which reads the __lang_ fidelity companion)
          val save = i
          i += 1; expectPunct("(")
          val v = varName()
          expectPunct(")")
          val exact = peek == TPunct("=") &&
            toks.lift(i + 1).exists(_.isInstanceOf[TStr]) &&
            toks.lift(i + 2).contains(TPunct(")"))
          if (exact) {
            i += 1
            val TStr(lang, _) = next(): @unchecked
            LangM(v, lang)
          } else { i = save; FilterExpr(expr()) }
        case _ => FilterExpr(expr())
      }
      expectPunct(")")
      f
    }

    // ----- unified expression grammar (SPARQL 1.1 §17.2 precedence):
    // '||' < '&&' < comparison/IN < '+'/'-' < '*'/'/' < unary !/- < primary
    private val cmpOps = Set("<", ">", "<=", ">=", "=", "!=")
    /** Aggregate calls are legal only inside HAVING expressions. */
    private var allowAggs = false
    private val aggFns = Set("count", "sum", "min", "max", "avg", "sample")

    def expr(): EExpr = orExpr()

    private def orExpr(): EExpr = {
      var e = andExpr()
      while (peek == TPunct("||")) { i += 1; e = EOr(e, andExpr()) }
      e
    }
    private def andExpr(): EExpr = {
      var e = relExpr()
      while (peek == TPunct("&&")) { i += 1; e = EAnd(e, relExpr()) }
      e
    }
    /** Comparison or `[NOT] IN (const, …)` over additive expressions. */
    private def relExpr(): EExpr = {
      val l = addExpr()
      peek match {
        case TPunct(op) if cmpOps(op) => i += 1; ECmp(op, l, addExpr())
        case t if isKw(t, "IN") => i += 1; EIn(l, constList(), negated = false)
        case t if isKw(t, "NOT") && toks.lift(i + 1).exists(isKw(_, "IN")) =>
          i += 2; EIn(l, constList(), negated = true)
        case _ => l
      }
    }
    private def constList(): Seq[String] = {
      expectPunct("(")
      val vals = Vector.newBuilder[String]
      var go = true
      while (go) {
        next() match {
          case TIri(x) => vals += x
          case TPname(x) => vals += resolvePname(x)
          case TStr(x, _) => vals += x
          case TNum(x) => vals += x
          case t => fail(s"expected constant in IN list, got $t")
        }
        next() match {
          case TPunct(",") =>
          case TPunct(")") => go = false
          case t => fail(s"expected ',' or ')' in IN list, got $t")
        }
      }
      vals.result()
    }
    private def addExpr(): EExpr = {
      var e = mulExpr()
      var go = true
      while (go) peek match {
        case TPunct("+") => i += 1; e = EArith("+", e, mulExpr())
        case TPunct("-") => i += 1; e = EArith("-", e, mulExpr())
        // the tokenizer folds a sign into adjacent numerics (`?a -3`):
        // SPARQL's grammar treats the signed literal as the operation
        // (AdditiveExpression, grammar rule 116)
        case TNum(s) if s.startsWith("+") || s.startsWith("-") =>
          i += 1
          e = EArith(s.take(1), e, ENum(s.drop(1)))
        case _ => go = false
      }
      e
    }
    private def mulExpr(): EExpr = {
      var e = unaryExpr()
      var go = true
      while (go) peek match {
        case TPunct("*") => i += 1; e = EArith("*", e, unaryExpr())
        case TPunct("/") => i += 1; e = EArith("/", e, unaryExpr())
        case _ => go = false
      }
      e
    }
    private def unaryExpr(): EExpr = peek match {
      case TPunct("!") => i += 1; ENot(unaryExpr())
      case TPunct("-") => i += 1; ENeg(unaryExpr())
      case TPunct("+") => i += 1; unaryExpr()
      case _ => primaryExpr()
    }

    /** Builtin functions legal in expression position, by arity. */
    private val exprFns: Map[String, (Int, Int)] = Map(
      "STR" -> (1, 1), "STRLEN" -> (1, 1), "UCASE" -> (1, 1),
      "LCASE" -> (1, 1), "SUBSTR" -> (2, 3), "CONCAT" -> (1, 99),
      "CONTAINS" -> (2, 2), "STRSTARTS" -> (2, 2), "STRENDS" -> (2, 2),
      "STRBEFORE" -> (2, 2), "STRAFTER" -> (2, 2), "REPLACE" -> (3, 3),
      "REGEX" -> (2, 3), "ABS" -> (1, 1), "ROUND" -> (1, 1),
      "CEIL" -> (1, 1), "FLOOR" -> (1, 1), "YEAR" -> (1, 1),
      "MONTH" -> (1, 1), "DAY" -> (1, 1), "HOURS" -> (1, 1),
      "MINUTES" -> (1, 1), "SECONDS" -> (1, 1), "TZ" -> (1, 1),
      "TIMEZONE" -> (1, 1),
      "COALESCE" -> (1, 99),
      "LANG" -> (1, 1), "DATATYPE" -> (1, 1), "LANGMATCHES" -> (2, 2),
      "STRLANG" -> (2, 2), "STRDT" -> (2, 2),
      "IRI" -> (1, 1), "URI" -> (1, 1), "BNODE" -> (0, 1),
      "MD5" -> (1, 1), "SHA1" -> (1, 1), "SHA256" -> (1, 1),
      "SHA384" -> (1, 1), "SHA512" -> (1, 1),
      "ENCODE_FOR_URI" -> (1, 1),
      "ISIRI" -> (1, 1), "ISURI" -> (1, 1), "ISLITERAL" -> (1, 1),
      "ISBLANK" -> (1, 1), "ISNUMERIC" -> (1, 1),
      "SAMETERM" -> (2, 2))

    private def primaryExpr(): EExpr = peek match {
      case TPunct("(") =>
        i += 1
        val e = orExpr()
        expectPunct(")")
        e
      case TVar(_) => EVar(varName())
      case TStr(_, _) =>
        val TStr(s, dt) = next(): @unchecked
        // a duration-typed literal lands on the duration rung, so
        // comparisons against it order by duration VALUE (§17.4.5.7's
        // result type); every other datatype keeps the lexical rung.
        // xsd:duration is the UNION supertype (XSD 1.1 §3.3.6): a static
        // literal routes to the subtype rung its lexical actually
        // inhabits — Y/M-only fields → yearMonth, else dayTime. A MIXED
        // lexical (P1Y2M3DT4H) is outside both subtype grammars and
        // lands unbound on the dayTime rung: mixed durations are not
        // totally ordered even in XPath (op:duration-less-than exists
        // only for the subtypes), so refusing them a value is the
        // documented deviation rather than an invented order.
        if (dt.exists(d => d == "xsd:yearMonthDuration"
            || d.endsWith("#yearMonthDuration")))
          EFn("XSD_YEARMONTHDURATION", Seq(EStr(s)))
        else if (dt.exists(d => d == "xsd:dayTimeDuration"
            || d.endsWith("#dayTimeDuration")))
          EFn("XSD_DAYTIMEDURATION", Seq(EStr(s)))
        else if (dt.exists(d => d == "xsd:duration" || d.endsWith("#duration")))
          EFn(
            if (s.matches("[+-]?P(\\d+Y)?(\\d+M)?") &&
                s.exists(c => c == 'Y' || c == 'M'))
              "XSD_YEARMONTHDURATION"
            else "XSD_DAYTIMEDURATION",
            Seq(EStr(s)))
        else EStr(s)
      case TNum(_) =>
        val TNum(s) = next(): @unchecked
        ENum(s)
      // IRIs in expression position (STRDT datatypes, `?x = <iri>`
      // comparisons) evaluate to their lexical form — the engine's columns
      // hold plain strings (SURVEY §1.1 term model)
      case TIri(_) =>
        val TIri(v) = next(): @unchecked
        EStr(resolveIri(v))
      // §17.5 XPath constructor casts — `xsd:integer(?v)` etc. The
      // integer cast is the entry point onto the exact integer rung for
      // data-bound (lexical) variables; see the Ty scaladoc.
      case TPname(p) if p.toLowerCase.startsWith("xsd:") &&
          toks.lift(i + 1).contains(TPunct("(")) =>
        i += 1; expectPunct("(")
        val arg = orExpr()
        expectPunct(")")
        val name = p.substring(4).toLowerCase
        if (!Set("integer", "decimal", "double", "float", "string",
            "boolean", "daytimeduration", "yearmonthduration")
            .contains(name))
          fail(s"unsupported XSD constructor xsd:$name")
        EFn("XSD_" + name.toUpperCase, Seq(arg))
      case TPname(_) =>
        val TPname(v) = next(): @unchecked
        EStr(resolvePname(v))
      case t if isKw(t, "BOUND") =>
        i += 1; expectPunct("(")
        val v = varName()
        expectPunct(")")
        EBound(v)
      case t if isKw(t, "EXISTS") =>
        i += 1; EExists(group(), negated = false)
      case t if isKw(t, "NOT") =>
        i += 1; expectKw("EXISTS"); EExists(group(), negated = true)
      case t if isKw(t, "IF") =>
        i += 1; expectPunct("(")
        val c = orExpr()
        expectPunct(",")
        val tv = orExpr()
        expectPunct(",")
        val fv = orExpr()
        expectPunct(")")
        EIf(c, tv, fv)
      case TIdent(w) if allowAggs && aggFns.contains(w.toLowerCase) =>
        val fn = w.toLowerCase
        i += 1; expectPunct("(")
        val dist = isKw(peek, "DISTINCT") && { i += 1; true }
        val arg: Either[String, EExpr] = peek match {
          case TPunct("*") =>
            i += 1
            if (dist || fn != "count") fail("'*' is only valid in COUNT(*)")
            Left("*")
          case _ =>
            // no nested aggregates (SPARQL §11.1)
            allowAggs = false
            val e = try orExpr() finally allowAggs = true
            e match {
              case EVar(v) => Left(v)
              case other => Right(other)
            }
        }
        expectPunct(")")
        EAgg(fn, arg, dist)
      // deliberate refusals, with the reason (README §4.2 table): the
      // engine's nondeterminism policy (SURVEY §7.3) and value model
      case TIdent(w) if Set("RAND", "NOW", "UUID").contains(w.toUpperCase) =>
        fail(s"${w.toUpperCase} is nondeterministic by definition and " +
          "unsupported by policy (SURVEY §7.3) — where a stable identity " +
          "is needed use the deterministic mints: BIND(URI(CONCAT(prefix, " +
          "STRUUID())) AS ?v) or BIND(BNODE(...) AS ?v)")
      case TIdent(w) if exprFns.contains(w.toUpperCase) =>
        val fn = w.toUpperCase
        i += 1; expectPunct("(")
        val args = Vector.newBuilder[EExpr]
        if (peek != TPunct(")")) {
          args += orExpr()
          while (peek == TPunct(",")) { i += 1; args += orExpr() }
        }
        expectPunct(")")
        val got = args.result()
        val (lo, hi) = exprFns(fn)
        if (got.length < lo || got.length > hi)
          fail(s"$fn expects $lo..$hi arguments, got ${got.length}")
        EFn(fn, got)
      case t2 => fail(s"unsupported expression term: $t2")
    }

    /** `VALUES ?v { wd:Q1 wd:Q2 … }` or the multi-variable table form
      * `VALUES (?a ?b) { ("x" "y") (wd:Q1 "z") … }`. */
    private def valuesEl(): El = peek match {
      case TPunct("(") =>
        i += 1
        val vars = Vector.newBuilder[String]
        while (peek != TPunct(")")) vars += varName()
        i += 1
        val vs = vars.result()
        if (vs.isEmpty) fail("VALUES needs at least one variable")
        expectPunct("{")
        val rows = Vector.newBuilder[Seq[Option[String]]]
        while (peek != TPunct("}")) {
          expectPunct("(")
          val row = Vector.newBuilder[Option[String]]
          while (peek != TPunct(")")) row += valuesConstOpt()
          i += 1
          val r = row.result()
          if (r.length != vs.length)
            fail(s"VALUES row arity ${r.length} != variable arity ${vs.length}")
          rows += r
        }
        i += 1
        ValuesTabEl(vs, rows.result())
      case _ =>
        val v = varName()
        expectPunct("{")
        val vals = Vector.newBuilder[String]
        var go = true
        while (go) peek match {
          case TPunct("}") => i += 1; go = false
          case _ => vals += valuesConst()
        }
        ValuesEl(v, vals.result())
    }

    /** One constant VALUES entry; resolvePname keeps entries in the same
      * symbol space as pattern terms — with a declared PREFIX the patterns
      * bind full IRIs, so a raw pname here would silently match nothing.
      * UNDEF is legal only in the TABLE form (where the compiler switches
      * that block to a null-compatible join); in the single-variable
      * membership form a wildcard row would make the whole block a no-op
      * and silently defeat the pushed isin — rejected loudly. */
    private def valuesConst(): String = next() match {
      case TPname(x) => resolvePname(x)
      case TIri(x) => x
      case TStr(x, _) => x
      case TNum(x) => x
      case t if isKw(t, "UNDEF") =>
        fail("UNDEF in single-variable VALUES makes the block a no-op " +
          "(every row matches); drop the block or use the table form")
      case t => fail(s"unexpected VALUES entry: $t")
    }

    /** Table-form VALUES entry: UNDEF → None (§10.2.2). */
    private def valuesConstOpt(): Option[String] = peek match {
      case t if isKw(t, "UNDEF") => i += 1; None
      case _ => Some(valuesConst())
    }

    /** `BIND(expr AS ?c)` — any unified-grammar expression, plus the
      * `BIND(URI(CONCAT("prefix", STRUUID())) AS ?c)` provided-entity mint
      * (compiled to the deterministic md5 surrogate, R2). */
    private def bindEl(): El = {
      expectPunct("(")
      // the provided-entity mint is the ONE shape whose STRUUID gets the
      // deterministic md5 surrogate; any other URI(...) argument parses
      // through the general expression grammar (kind-tagged IRI term)
      val mintShape = isKw(peek, "URI") &&
        toks.lift(i + 1).contains(TPunct("(")) &&
        toks.lift(i + 2).exists(isKw(_, "CONCAT")) &&
        toks.lift(i + 3).contains(TPunct("(")) &&
        (toks.lift(i + 4) match {
          case Some(TStr(_, _)) => true
          case _ => false
        }) &&
        toks.lift(i + 5).contains(TPunct(",")) &&
        toks.lift(i + 6).exists(isKw(_, "STRUUID"))
      val el: El =
        if (mintShape) {
          i += 1
          expectPunct("("); expectKw("CONCAT"); expectPunct("(")
          val prefix = next() match {
            case TStr(s, _) => s
            case t => fail(s"expected prefix string in CONCAT, got $t")
          }
          expectPunct(","); expectKw("STRUUID")
          expectPunct("("); expectPunct(")")
          expectPunct(")") // CONCAT
          expectPunct(")") // URI
          expectKw("AS")
          BindMint(varName(), prefix)
        } else {
          val e = expr()
          expectKw("AS")
          BindExpr(varName(), e)
        }
      expectPunct(")")
      el
    }

    /** `SERVICE wikibase:label { bd:serviceParam wikibase:language "de,en" }`
      * (the label-service fast path) or the general
      * `SERVICE [SILENT] <iri> { pattern }` federation form — the IRI
      * resolves through the endpoint registry at compile time. A VARIABLE
      * service target needs per-binding endpoint dispatch and refuses. */
    private def serviceEl(): El = {
      val silent = isKw(peek, "SILENT") && { i += 1; true }
      next() match {
        case TPname(p) if p.equalsIgnoreCase("wikibase:label") =>
        case TIri(iri) => return ServiceEl(iri, group(), silent)
        case TPname(p) if !p.equalsIgnoreCase("wikibase:label") =>
          return ServiceEl(resolvePname(p), group(), silent)
        case TVar(v) => return ServiceVarEl(v, group(), silent)
        case t => fail(s"SERVICE expects wikibase:label or an endpoint IRI, got $t")
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
      case TPname(v) => C(resolvePname(v))
      case TStr(s, _) => L(s)
      case TNum(v) => L(v)
      case TPunct("[") =>
        // `[]` anonymous node: a fresh variable scoped to this statement —
        // excluded from mint keys and dropped by projections
        expectPunct("]")
        V(freshAnon())
      case t => fail(s"expected term, got $t")
    }

    /** Predicate position: a path — `p`, `p*`, `^p`, `p1|p2`, `p1/p2`,
      * `p1/p2*`, `(p1|^p2)/p3`, stars on any step. */
    private def path(): Path = {
      def primary(): (String, Boolean) = {
        val inv = peek == TPunct("^") && { i += 1; true }
        val p = next() match {
          case TIri(v) => v
          case TPname(v) => resolvePname(v)
          case t => fail(s"expected path predicate, got $t")
        }
        (p, inv)
      }
      // returns (step, wasParenthesized) — bare alternation is only legal
      // when the whole path is this one step
      def step(): (PStep, Boolean) = {
        // `!p` / `!(p1|^p2)` negated property set (§9.1): forward and
        // inverse members split into two complements — forward triples
        // whose predicate is outside the forward set, plus REVERSED
        // triples whose predicate is outside the inverse set (each side
        // present only when it has members; see edgesOfStep)
        val negated = peek == TPunct("!") && { i += 1; true }
        // One top-level alternation arm: a parenthesized GROUP — which may
        // itself hold '|'-separated '/'-sequence arms of [^]primaries
        // (§9.1 recursion, one level) — or a single [^]primary. SPARQL's
        // '|' binds looser than '/', so `(p/q)|r` is alternation between
        // the p∘q composite and r.
        def armGroup(): Seq[Seq[PMember]] =
          if (peek == TPunct("(")) {
            i += 1
            // each member may carry its OWN modifier — `(P31/P279*)` —
            // consumed BEFORE ')' (a modifier after ')' is the step's)
            def member(): PMember = {
              val (p, inv) = primary()
              val m = peek match {
                case TPunct("*") => i += 1; "*"
                case TPunct("+") => i += 1; "+"
                case TPunct("?") => i += 1; "?"
                case _ => ""
              }
              (p, inv, m)
            }
            def arm(): Seq[PMember] = {
              val els = Vector.newBuilder[PMember]
              els += member()
              while (peek == TPunct("/")) { i += 1; els += member() }
              els.result()
            }
            val inner = Vector.newBuilder[Seq[PMember]]
            inner += arm()
            while (peek == TPunct("|")) { i += 1; inner += arm() }
            expectPunct(")")
            inner.result()
          } else { val (p, inv) = primary(); Seq(Seq((p, inv, ""))) }
        val soleParen = peek == TPunct("(")
        val arms = Vector.newBuilder[Seq[PMember]]
        arms ++= armGroup()
        var groups = 1
        while (peek == TPunct("|")) { i += 1; arms ++= armGroup(); groups += 1 }
        val allArms = arms.result()
        if (negated && groups > 1)
          // SPARQL scopes '!' to its primary: `!p|q` is (!p)|q, which this
          // flat step cannot represent — require the §9.1 NPS parentheses
          fail("'!' scopes to a single [^]predicate or a parenthesized " +
            "property set — write !(p|q) for a negated set, or " +
            "parenthesize the '!' arm inside the alternation")
        val mod = peek match {
          case TPunct("*") => i += 1; "*"
          case TPunct("+") => i += 1; "+"
          // '?' never starts a variable token here: the tokenizer folds
          // `?name` into TVar, so a bare TPunct is really the modifier
          case TPunct("?") => i += 1; "?"
          case _ => ""
        }
        if (mod.nonEmpty && groups > 1)
          // SPARQL binds a modifier to its PathElt, so `p|q*` is p|(q*) —
          // NOT the closure of the union this flat step would compute.
          // Refuse the ambiguous surface loudly with the rewrite.
          fail(s"a '$mod' after an unparenthesized path alternation binds " +
            "to the LAST arm in SPARQL, which this engine's flat step " +
            "cannot represent — parenthesize the whole alternation " +
            s"('(p|q)$mod') or split the last arm into its own step")
        if (negated && allArms.exists(_.exists(_._3.nonEmpty)))
          // the §9.1 NPS grammar admits only [^]predicates — no modifiers
          fail("negated property sets cannot contain modified members " +
            "('!(p*|q)' is not §9.1 grammar)")
        if (allArms.forall(a => a.length == 1 && a.head._3.isEmpty))
          (PStep(allArms.map(a => (a.head._1, a.head._2)), mod, negated),
            groups == 1 && soleParen)
        else if (negated)
          // the §9.1 NPS grammar admits only [^]predicates — no sequences
          fail("negated property sets cannot contain '/' sequences (§9.1)")
        else
          (PStep(Nil, mod, negated = false, seqAlts = allArms),
            groups == 1 && soleParen)
      }
      val steps = Vector.newBuilder[(PStep, Boolean)]
      steps += step()
      while (peek == TPunct("/")) { i += 1; steps += step() }
      val all = steps.result()
      if (all.length > 1)
        all.foreach { case (s, paren) =>
          if (s.alts.length > 1 && !paren)
            fail("parenthesize path alternations inside a '/' sequence " +
              "('/' binds tighter than '|' in SPARQL)")
        }
      Path(all.map(_._1))
    }

    /** One triple statement, including `s p1 o1 ; p2 o2` predicate lists
      * sharing the subject (the `[] a ?x ; b ?y` shape). A variable in
      * predicate position (`?s ?p ?o`) yields a [[TpVar]]. */
    private def triplePatterns(): Seq[El] = {
      val s = term()
      val out = Vector.newBuilder[El]
      var go = true
      while (go) {
        out += (peek match {
          case TVar(_) => TpVar(s, varName(), term())
          case _ => Tp(s, path(), term())
        })
        if (peek == TPunct(";")) {
          i += 1
          // a dangling ';' before '.' or '}' ends the list
          if (peek == TPunct(".") || peek == TPunct("}")) go = false
        } else go = false
      }
      out.result()
    }
  }

  // ---------- compiler ----------

  /** Compile a parsed query against a triple source.
    *
    * @param triples (s, p, o [, oLang]) DataFrame — oLang only needed when
    *                the query filters on language tags
    * @param labels  (entity, lang, label) for the wikibase:label service
    * @param params  values for `$limit`/`$offset`-style template parameters
    */
  def compile(q: Query, triples: DataFrame, labels: DataFrame,
              params: Map[String, Long] = Map.empty): DataFrame = {
    // one isFunctional probe per distinct path step per COMPILE, not per
    // pattern occurrence — the memo is shared down the whole query tree
    val memo: FunctMemo = scala.collection.mutable.Map.empty
    q match {
      case s: SelectQ => compileSelect(s, triples, labels, params, memo)
      case c: ConstructQ => compileConstruct(c, triples, labels, params, memo)
      case a: AskQ =>
        val (bound, _) = compileGroup(a.where, triples, labels, params, memo)
        // limit(1) short-circuits the scan: existence, not cardinality
        bound.limit(1).agg(count(lit(1)).as("__n"))
          .select((col("__n") > 0).as("ask"))
      case d: DescribeQ =>
        val spark = triples.sparkSession
        val constNodes = d.terms.collect { case C(v) =>
          spark.range(1).select(lit(v).as("__node"))
        }
        val varNodes =
          if (d.terms.exists(_.isInstanceOf[V])) {
            val (bound, _) = compileGroup(d.where, triples, labels, params, memo)
            d.terms.collect { case V(v) => bound.select(col(v).as("__node")) }
          } else Nil
        val nodes = (constNodes ++ varNodes).reduce(_ unionByName _).distinct()
        // semi-join keeps the triple scan streaming: no node duplication,
        // no join-output blowup beyond the description itself
        triples.join(nodes, triples("s") === nodes("__node"), "left_semi")
          .select(col("s"), col("p"), col("o"))
    }
  }

  /** Memo key: (alternatives, negated, sequence arms) — a negated set's
    * edge relation is a different graph than the positive set over the
    * same predicates, and every '/'-sequence group composes its own. */
  private type FunctMemo = scala.collection.mutable.Map[
    (Int, Seq[(String, Boolean)], Boolean, Seq[Seq[PMember]]), Boolean]

  /** Cross-query isFunctional results (see compilePath): plan-hash keyed,
    * one Boolean per (source, step) — bounded by a clear at 1024. */
  private val functCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Seq[(String, Boolean)], Boolean, Seq[Seq[PMember]]),
    java.lang.Boolean]()

  /** Parse + compile in one step. */
  def run(query: String, triples: DataFrame, labels: DataFrame,
          params: Map[String, Long] = Map.empty): DataFrame =
    compile(parse(query), triples, labels, params)

  /** Endpoint registry for general `SERVICE <iri> {…}` blocks: each IRI
    * names a triple/quad DataFrame standing in for the remote endpoint's
    * default graph. Registration is explicit and an UNREGISTERED IRI
    * refuses at compile time (SILENT downgrades that to the unit
    * solution, §18.2.4.3's error-recovery form) — the engine never
    * guesses at federation. At scale the registered frame is just
    * another distributed source: the service body plans against it with
    * the same pushdown/reorder machinery as the local store, and the
    * final bag join is an ordinary shuffle (or broadcast) equi-join on
    * the shared variables. */
  private val serviceRegistry = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, DataFrame]]())
  /** Registration is PER SESSION (keyed weakly, so a stopped session's
    * endpoints — and their pinned analyzed plans — are collectable) and
    * explicit; pair with [[unregisterService]] when the endpoint is
    * transient. */
  def registerService(iri: String, endpoint: DataFrame): Unit =
    serviceRegistry.computeIfAbsent(endpoint.sparkSession,
      _ => scala.collection.concurrent.TrieMap.empty).put(iri, endpoint)
  def unregisterService(iri: String, sp: SparkSession): Unit =
    Option(serviceRegistry.get(sp)).foreach(_.remove(iri))
  private def lookupService(iri: String, sp: SparkSession): Option[DataFrame] =
    Option(serviceRegistry.get(sp)).flatMap(_.get(iri))
  private def listServices(sp: SparkSession): Map[String, DataFrame] =
    Option(serviceRegistry.get(sp)).map(_.toMap).getOrElse(Map.empty)
  /** Convenience: drop `iri` from every live session's registry. */
  def unregisterService(iri: String): Unit = serviceRegistry.synchronized {
    serviceRegistry.values.forEach(_.remove(iri))
  }

  /** The reference's incremental-mode rewrite (wikidata_index.py:160-167):
    * lines carrying `#REMOVE_INCREMENTAL` are uncommented in place and
    * `{{INCREMENTAL_DATE}}` replaced with the supplied date, so the
    * UNMODIFIED reference .sparql file runs in incremental mode (the P10
    * watermark semantics — the uncommented pattern binds a modification
    * date, the uncommented FILTER restricts to rows past the watermark).
    * Without this rewrite the marker lines stay `#` comments, exactly as
    * the reference's non-incremental path leaves them. */
  def withIncremental(query: String, incrementalDate: String): String =
    query.linesWithSeparators.map { line =>
      if (line.contains("#REMOVE_INCREMENTAL"))
        line.replace("#REMOVE_INCREMENTAL ", "")
          .replace("{{INCREMENTAL_DATE}}", incrementalDate)
      else line
    }.mkString

  /** CONSTRUCT: one (s, p, o) row per template triple per solution; the
    * output is a graph, so set semantics (distinct) apply (G11 — the
    * rdflib Graph.add idempotence the reference relies on). All template
    * arms project the same solution set, so this is the fused-generator
    * shape: k small selects over ONE compiled WHERE plan. */
  private def compileConstruct(q: ConstructQ, triples: DataFrame,
                               labels: DataFrame, params: Map[String, Long],
                               memo: FunctMemo): DataFrame = {
    val (bound0, _) = compileGroup(q.where, triples, labels, params, memo)
    // §10.2 modifiers cut the SOLUTION SEQUENCE before templating: the
    // sort + limit compile to TakeOrderedAndProject (top-k per partition,
    // merged on the driver — never a full global sort at scale). EXISTS
    // in a sort key lifts marks against the solution frame, same as the
    // SELECT path; the template projection below never sees the marks.
    var bound = bound0
    if (q.orderBy.nonEmpty) {
      q.orderBy.foreach { case (e, _) =>
        if (hasAgg(e)) sys.error("aggregate calls in ORDER BY require a " +
          "grouped CONSTRUCT (add GROUP BY — the grouped form compiles " +
          "them through the SELECT hidden-column machinery)")
      }
      val keys = q.orderBy.map { case (e, desc) =>
        val e2 =
          if (hasExists(e)) {
            val (lifted, rewritten, _) = liftExistsMarksImpl(bound, e,
              triples, labels, params, memo, None, None)
            bound = lifted; rewritten
          } else e
        val ct = compileE(e2)
          if (desc) sortKey(ct).desc else sortKey(ct).asc
      }
      bound = bound.orderBy(keys: _*)
    }
    q.offset.foreach(o => bound = bound.offset(resolve(o, params).toInt))
    q.limit.foreach(l => bound = bound.limit(resolve(l, params).toInt))
    // the modifier cut picks a specific solution subset; templating fans
    // it out k ways, so materialize the (≤ LIMIT-sized) cut once instead
    // of re-running the sort per template arm
    if (q.templates.size > 1 && (q.limit.nonEmpty || q.offset.nonEmpty))
      bound = bound.localCheckpoint()
    def termCol(t: Term): Column = t match {
      // the emitted graph is lexical (s, p, o string columns); an
      // aggregate-bound variable from a grouped CONSTRUCT arrives
      // numeric and takes its lexical form here
      case V(v) => col(v).cast("string")
      case C(v) => lit(v)
      case L(v) => lit(v)
    }
    q.templates.map { tp =>
      val p = tp.p.steps match {
        case Seq(PStep(Seq((pv, false)), "", false, Nil)) => lit(pv)
        case other => sys.error(s"CONSTRUCT template predicates must be simple: $other")
      }
      bound.select(termCol(tp.s).as("s"), p.as("p"), termCol(tp.o).as("o"))
    }.reduce(_ unionByName _).distinct()
  }

  private def resolve(v: Either[Long, String], params: Map[String, Long]): Long =
    v match {
      case Left(n) => n
      case Right(p) => params.getOrElse(p,
        sys.error(s"missing value for SPARQL template parameter $$$p"))
    }

  private def compileSelect(q: SelectQ, triples: DataFrame, labels: DataFrame,
                            params: Map[String, Long],
                            memo: FunctMemo): DataFrame = {
    // explicit dataset (§13.2): both clauses become `g` filters, pushed to
    // the quad scan (and pruning partitions on a g-partitioned table);
    // per spec, FROM without FROM NAMED leaves GRAPH nothing to range
    // over, and FROM NAMED without FROM empties the default graph
    val explicitDs = q.fromGraphs.nonEmpty || q.fromNamed.nonEmpty
    if (explicitDs) require(triples.columns.contains("g"),
      "FROM/FROM NAMED require a quad source with a `g` column")
    val defaultSrc =
      if (!explicitDs) triples
      else if (q.fromGraphs.nonEmpty) triples.filter(col("g").isin(q.fromGraphs: _*))
      else triples.filter(lit(false))
    val namedSrc =
      if (!explicitDs) None
      else Some(
        if (q.fromNamed.nonEmpty) triples.filter(col("g").isin(q.fromNamed: _*))
        else triples.filter(lit(false)))
    val (bound, svc) =
      compileGroup(q.where, defaultSrc, labels, params, memo, None, namedSrc)
    // wikibase:label semantics: every projected ?xLabel with ?x bound gets
    // the first-available-language label, falling back to the id (J7).
    val labeled = svc match {
      case Some(langs) =>
        q.proj.flatMap {
          case PVar(src, _) => Some(src)
          case PGroupConcat(src, _, _, _) => Some(src)
          case PAgg(_, src, _, _) => Some(src)
          // PStar projects only already-bound columns and expression
          // projections carry no label target — neither requests a label
          case _ => None
        }.distinct.filter(_ != "*").collect {
          case src if src.endsWith("Label") &&
            bound.columns.contains(src.dropRight(5)) && !bound.columns.contains(src) =>
            (src.dropRight(5), src)
        }.foldLeft(bound) { case (df, (base, out)) =>
          SparqlAlgebra.labelService(df, labels, base, out, langs)
        }
      case None => bound
    }
    val aggs = q.proj.collect {
      case a: PGroupConcat => a: ProjItem
      case a: PAgg => a: ProjItem
      case a: PAggE => a: ProjItem
    }
    // §18: ORDER BY evaluates after grouping, so aggregate calls are
    // legal in its keys on a GROUPED query — they rewrite to hidden
    // aggregate columns (same machinery as HAVING) and the sort runs
    // BEFORE the final projection, which hides the columns again
    val orderHasAgg = q.orderBy.exists { case (e, _) => hasAgg(e) }
    var orderByEff = q.orderBy
    val grouping = q.groupBy.nonEmpty || q.groupByExprs.nonEmpty ||
      aggs.nonEmpty || q.having.nonEmpty
    if (orderHasAgg && !grouping) sys.error(
      "aggregate calls in ORDER BY require a grouped query (add GROUP " +
        "BY or an aggregate projection)")
    val grouped =
      if (grouping) {
        require(aggs.nonEmpty || q.having.nonEmpty || orderHasAgg,
          "GROUP BY requires at least one aggregate")
        // expression keys compute before the grouping and group by name;
        // §17.4.1.4: an EXISTS inside a key expression lifts its mark
        // against the PRE-aggregation frame (keys evaluate per solution,
        // before grouping), and the mark drops as soon as the key is bound
        val keyed = q.groupByExprs.foldLeft(labeled) { case (df, (e, v)) =>
          if (hasExists(e)) {
            val (lifted, e2, marks) = liftExistsMarksImpl(df, e, triples,
              labels, params, memo, None, None)
            lifted.withColumn(v, emitVal(compileE(
              rewriteDurVals(lifted.columns.toSet, e2)))).drop(marks: _*)
          } else df.withColumn(v,
            emitVal(compileE(rewriteDurVals(df.columns.toSet, e))))
        }
        val keyNames = q.groupBy ++ q.groupByExprs.map(_._2)
        // implicit (empty) grouping admits only aggregate projections —
        // a plain ?var would silently project null (SPARQL errors here).
        // Variables bound by the trailing VALUES clause join AFTER the
        // aggregation (§18.2.4) and are legally projectable — but ONLY
        // the ones the WHERE pattern does not also bind: an ungrouped
        // pattern variable stays a §17.2.2 projection error even when a
        // same-named VALUES column exists (the table would fabricate
        // bindings unrelated to the group's own).
        val postVars: Set[String] = (q.postValues match {
          case Some(ValuesEl(v, _))      => Set(v)
          case Some(ValuesTabEl(vs, _))  => vs.toSet
          case _                         => Set.empty[String]
        }).diff(elVars(q.where))
        q.proj.collect { case PVar(src, _) => src }
          .filterNot(keyNames.contains).filterNot(postVars.contains)
          .foreach(v =>
            sys.error(s"?$v must appear in GROUP BY to be projected " +
              "alongside aggregates"))
        // HAVING aggregates ride along as hidden columns, filtered after
        // the agg and dropped by the projection below: each EAgg in a
        // HAVING expression becomes a __havingN aggregate and the
        // predicate is rewritten to reference it
        val hiddenAggs = Vector.newBuilder[ProjItem]
        var hiddenN = 0
        def liftAggs(e: EExpr): EExpr = e match {
          case EAgg(fn, arg, dist) =>
            val out = s"__having$hiddenN"
            hiddenN += 1
            hiddenAggs += (arg match {
              case Left(src) => PAgg(fn, src, out, dist)
              case Right(ex) => PAggE(fn, ex, out, dist)
            })
            EVar(out)
          case EAnd(l, r) => EAnd(liftAggs(l), liftAggs(r))
          case EOr(l, r) => EOr(liftAggs(l), liftAggs(r))
          case ENot(x) => ENot(liftAggs(x))
          case ECmp(op, l, r) => ECmp(op, liftAggs(l), liftAggs(r))
          case EArith(op, l, r) => EArith(op, liftAggs(l), liftAggs(r))
          case ENeg(x) => ENeg(liftAggs(x))
          case EIf(c, t, f) => EIf(liftAggs(c), liftAggs(t), liftAggs(f))
          case EFn(n, as) => EFn(n, as.map(liftAggs))
          case EIn(x, vs, neg) => EIn(liftAggs(x), vs, neg)
          case leaf => leaf
        }
        val havingPreds = q.having.map(liftAggs)
        // aggregate ORDER BY keys ride the same hidden-column rewrite
        orderByEff = orderByEff.map { case (e, d) =>
          (if (hasAgg(e)) liftAggs(e) else e, d)
        }
        // §17.4.1.4 in AGGREGATE ARGUMENTS — SUM(IF(EXISTS{…},1,0)):
        // the argument evaluates per PRE-aggregation solution, so each
        // EXISTS mark lifts against the keyed frame and the aggregate
        // reads the rewritten expression. Marks are consumed inside
        // agg() and never survive the grouping. The mark split
        // references its base twice (matched + anti) and Spark re-plans
        // the subtree per reference, so the (corpus-sized) pre-agg
        // frame materializes ONCE when any argument carries EXISTS —
        // the same move the HAVING-EXISTS path makes post-agg.
        val aggItems0 = aggs ++ hiddenAggs.result()
        val needsArgLift = aggItems0.exists {
          case PAggE(_, e, _, _) => hasExists(e)
          case _ => false
        }
        var aggSrc = if (needsArgLift) keyed.localCheckpoint() else keyed
        val aggItems = aggItems0.map {
          case PAggE(fn, e, out, dist) if hasExists(e) =>
            val (lifted, e2, _) = liftExistsMarksImpl(aggSrc, e, triples,
              labels, params, memo, None, None)
            aggSrc = lifted
            PAggE(fn, e2, out, dist)
          case item => item
        }
        // duration-typed VARIABLES (bound by a duration BIND in this
        // query) aggregate on their numeric-carrier companion — MIN/MAX
        // by lexical would order "PT10H" < "PT2H", and SUM/AVG over the
        // lexical is no algebra at all; the canonical lexical renders
        // once on the aggregated value (§18.5 closed under durations,
        // same as the expression-argument path below)
        def durVarCarrier(src: String): Option[(Column, Boolean)] =
          if (aggSrc.columns.contains(dvsCol(src)))
            Some((col(dvsCol(src)), false))
          else if (aggSrc.columns.contains(dvmCol(src)))
            Some((col(dvmCol(src)), true))
          else None
        def durVarRender(m: Column, ym: Boolean): Column =
          if (ym) durationLexicalOfMonths(m) else durationLexicalOfSeconds(m)
        // §18.5 type-error guard for the carrier path: after a set-op, a
        // variable can be duration-typed in one arm and plain in another
        // — those rows carry a non-null LEXICAL but a null CARRIER, and
        // summing the carrier would silently aggregate only the duration
        // subset. SUM/AVG over a mixed-type multiset is a type error →
        // unbound, so the group emits null whenever any member has a
        // value the carrier cannot see. (MIN/MAX stay lenient on the
        // carrier — the documented §15.1-ordering deviation: they pick
        // among the duration members rather than erroring, matching the
        // engine's error→unbound comparison posture.)
        def durMixedGuard(src: String, carrier: Column, agg: Column): Column =
          when(max(when(col(src).isNotNull && carrier.isNull, lit(1))
            .otherwise(lit(0))) === 1, lit(null).cast("string"))
            .otherwise(agg)
        val aggCols = aggItems.map {
          case PGroupConcat(src, out, dist, sep) =>
            val collected =
              if (dist) collect_set(col(src)) else collect_list(col(src))
            // sorted order (+ the declared or default separator): the
            // deterministic A1/A2 group_concat idiom
            concat_ws(sep, sort_array(collected)).as(out)
          case PAgg("count", "*", out, _) => count(lit(1)).as(out)
          case PAgg("count", src, out, true) => countDistinct(col(src)).as(out)
          case PAgg("count", src, out, false) => count(col(src)).as(out)
          case PAgg("min", src, out, _) =>
            (durVarCarrier(src) match {
              case Some((c, ym)) => durVarRender(min(c), ym)
              case None => min(col(src))
            }).as(out)
          case PAgg("max", src, out, _) =>
            (durVarCarrier(src) match {
              case Some((c, ym)) => durVarRender(max(c), ym)
              case None => max(col(src))
            }).as(out)
          // SPARQL numeric aggregates over the engine's lexical string
          // columns: compare/accumulate numerically via a double cast
          case PAgg("sum", src, out, dist) =>
            (durVarCarrier(src) match {
              case Some((c, ym)) => durMixedGuard(src, c,
                durVarRender(if (dist) sum_distinct(c) else sum(c), ym))
              case None =>
                if (dist) sum_distinct(col(src).cast("double"))
                else sum(col(src).cast("double"))
            }).as(out)
          case PAgg("avg", src, out, _) =>
            (durVarCarrier(src) match {
              case Some((c, ym)) =>
                durMixedGuard(src, c, durVarRender(avg(c), ym))
              case None => avg(col(src).cast("double"))
            }).as(out)
          // SAMPLE may return any group member; the engine picks min()
          // so re-runs are deterministic (SURVEY §7.3 "Nondeterminism")
          case PAgg("sample", src, out, _) => min(col(src)).as(out)
          // aggregates over computed expressions — SUM(?price * ?qty)
          case PAggE(fn, e, out, dist) =>
            val (c, ty) = compileE(rewriteDurVals(aggSrc.columns.toSet, e))
            // either numeric rung accumulates natively (long sums stay
            // exact); a lexical argument casts to the double rung
            val n = if (ty.isInstanceOf[TyNum]) c else c.cast("double")
            // duration-typed arguments aggregate on the numeric carrier
            // (all of min/max/sum/avg skip NULL inputs natively —
            // unbound zone-less rows never shadow real values) and EMIT
            // the canonical lexical, rendered once on the single
            // aggregated value. SUM is op:add-dayTimeDurations folded
            // over the group and AVG its mean (XPath §17 operator map
            // closed under the duration types), so both stay
            // duration-typed; the lexical renderer rounds a fractional
            // mean to whole seconds/months (canonical XSD lexicals are
            // integral at this engine's resolution).
            def durRender(m: Column): Column =
              if (ty == TyDurYM) durationLexicalOfMonths(m)
              else durationLexicalOfSeconds(m)
            val durTy = ty == TyDur || ty == TyDurYM
            fn match {
              case "count" =>
                (if (dist) countDistinct(c) else count(c)).as(out)
              case "sum" =>
                val s0 = if (dist) sum_distinct(n) else sum(n)
                (if (durTy) durRender(s0) else s0).as(out)
              case "avg" =>
                (if (durTy) durRender(avg(n)) else avg(n)).as(out)
              case "min" =>
                (if (durTy) durRender(min(c)) else min(c))
                  .as(out)
              case "max" =>
                (if (durTy) durRender(max(c)) else max(c))
                  .as(out)
              case "sample" => min(c).as(out)
              case other => sys.error(s"unsupported aggregate: $other")
            }
          case other => sys.error(s"unsupported aggregate: $other")
        }
        val agged = aggSrc.groupBy(keyNames.map(col): _*)
          .agg(aggCols.head, aggCols.tail: _*)
        // §17.4.1.4 in HAVING: per §18 the HAVING solution is the GROUPED
        // row (keys + aggregates), so EXISTS marks lift against the
        // POST-aggregation frame — the group keys are the shared
        // variables the mark join matches on. Aggregate calls were
        // already rewritten to __havingN columns above, so the lift sees
        // only ordinary leaves; marks drop right after the filter.
        // The mark split references its base three ways (matched, null
        // arms, anti) and Spark re-plans the aggregation per reference —
        // materialize the (group-cardinality-sized) aggregate ONCE when
        // a HAVING predicate carries EXISTS, so the corpus-side
        // aggregation shuffle never runs in triplicate.
        val havingBase =
          if (havingPreds.exists(hasExists)) agged.localCheckpoint()
          else agged
        havingPreds.foldLeft(havingBase) { (df, e) =>
          if (hasExists(e)) {
            val (lifted, e2, marks) = liftExistsMarksImpl(df, e, triples,
              labels, params, memo, None, None)
            lifted.filter(compileBool(
              rewriteDurVals(lifted.columns.toSet, e2))).drop(marks: _*)
          } else df.filter(
            compileBool(rewriteDurVals(df.columns.toSet, e)))
        }
      } else labeled
    if (q.proj.contains(PStar) && q.proj.size > 1)
      sys.error("SELECT * cannot be combined with other projections")
    // trailing VALUES (§18.2.4): joins the post-HAVING solution — on a
    // grouped query it constrains GROUPS (their keys), never the
    // pre-aggregation inputs; on an ungrouped one this is equivalent to
    // a VALUES element at the end of the WHERE group. Always a
    // broadcast of the literal table.
    val valued = q.postValues match {
      case None => grouped
      case Some(ValuesEl(v, vals)) =>
        if (grouped.columns.contains(v)) grouped.filter(col(v).isin(vals: _*))
        else grouped.crossJoin(broadcast(valuesTableDf(
          triples.sparkSession, Seq(v), vals.map(x => Seq(Option(x))))))
      case Some(ValuesTabEl(vars, rowsV)) =>
        val df = valuesTableDf(triples.sparkSession, vars, rowsV)
        if (rowsV.exists(_.exists(_.isEmpty))) undefValuesJoin(grouped, df)
        else {
          val shared = grouped.columns.intersect(df.columns).toSeq
          if (shared.isEmpty) grouped.crossJoin(broadcast(df))
          else grouped.join(broadcast(df), shared)
        }
      case Some(other) =>
        sys.error(s"internal: unexpected trailing VALUES form $other")
    }
    // §17.4.1.4 in projections — `SELECT (EXISTS{…} AS ?b)`: lift marks
    // against the grouped frame first; the final select omits the marks,
    // so they drop with no explicit cleanup
    var projSrc = valued
    val projItems: Seq[ProjItem] = q.proj.map {
      case PExpr(e, out) if hasExists(e) =>
        val (lifted, e2, _) = liftExistsMarksImpl(projSrc, e, triples,
          labels, params, memo, None, None)
        projSrc = lifted
        PExpr(e2, out)
      case item => item
    }
    val grouped2 = projSrc
    val cols: Seq[Column] =
      if (projItems.contains(PStar))
        // all named variables; internal columns (__anon existentials,
        // __having hidden aggregates, __exists marks) stay hidden
        grouped2.columns.filterNot(_.startsWith("__")).toSeq.map(col)
      else projItems.map {
        case PVar(src, out) =>
          if (grouped2.columns.contains(src)) col(src).as(out)
          else lit(null).cast("string").as(out) // SPARQL: unbound projected var
        case PExpr(e, out) => emitVal(compileE(
          rewriteDurVals(grouped2.columns.toSet, e))).as(out)
        case item => col(item.out)
      }
    // §15.1 typed-literal ordering: lexical order puts "10" before "2",
    // but an xsd:integer-typed literal must order by VALUE. When a sort
    // key is a bare variable whose solution carries fidelity companions,
    // sort BEFORE the final projection (which hides the companions) with
    // the engine's documented total-order extension per key:
    //   (term-kind rank: unbound < bnode < iri < literal,
    //    numeric literals before other literals by double value,
    //    everything else lexical)
    // — consistent with §15.1 where it defines an order, deterministic
    // where it does not. The projection is narrow, so the order survives
    // it; DISTINCT's shuffle would NOT preserve it, so typed keys with
    // DISTINCT fail loudly rather than silently falling back to lexical.
    val typedOrder = q.orderBy.exists {
      case (EVar(v), _) => grouped2.columns.contains(dtCol(v)) ||
        grouped2.columns.contains(kindCol(v))
      case _ => false
    }
    var out: DataFrame = null
    if (typedOrder) {
      if (q.distinct) sys.error(
        "ORDER BY over fidelity-typed variables cannot combine with " +
          "DISTINCT (the dedup shuffle discards the typed sort; project " +
          "the typed key through a subselect instead)")
      val sortCols = q.orderBy.flatMap {
        case (EVar(v), desc) if grouped2.columns.contains(v) =>
          val kindRank =
            if (grouped2.columns.contains(kindCol(v)))
              when(col(v).isNull, 0)
                .when(col(kindCol(v)) === "bnode", 1)
                .when(col(kindCol(v)) === "iri", 2).otherwise(3)
            else when(col(v).isNull, 0).otherwise(3)
          val isNum =
            if (grouped2.columns.contains(dtCol(v)))
              coalesce(col(dtCol(v)).isin(XsdNumeric: _*), lit(false))
            else lit(false)
          // CaseWhen evaluates the cast only on numeric-typed rows, so a
          // non-numeric lexical never reaches it (ANSI-safe); a CORRUPT
          // numeric literal fails the query loudly, per engine policy
          // duration-typed keys additionally order by VALUE through the
          // carrier companion ("PT10H" must sort above "PT2H" — §15.1
          // via op:duration ordering), lexical as the final tiebreak
          val durKey =
            if (grouped2.columns.contains(dvsCol(v))) Seq(col(dvsCol(v)))
            else if (grouped2.columns.contains(dvmCol(v)))
              Seq(col(dvmCol(v)))
            else Seq.empty[Column]
          val keys = Seq(kindRank, when(isNum, 0).otherwise(1),
            when(isNum, col(v).cast("double"))) ++ durKey :+ col(v)
          if (desc) keys.map(_.desc) else keys.map(_.asc)
        case (e, _) => sys.error(
          s"ORDER BY over a fidelity-typed solution supports bare bound " +
            s"variables only, got $e (wrap computed keys in a subselect)")
      }
      out = grouped2.orderBy(sortCols: _*).select(cols: _*)
    } else if (orderHasAgg) {
      // aggregate sort keys reference hidden __having columns that the
      // final projection hides — sort BEFORE the projection (the same
      // projection-survives-sort property the typed-order branch uses).
      // DISTINCT's dedup shuffle would discard the order — refused.
      if (q.distinct) sys.error(
        "ORDER BY with aggregate keys cannot combine with DISTINCT " +
          "(the dedup shuffle discards the sort; group keys are already " +
          "distinct — drop DISTINCT or wrap in a subselect)")
      var sortSrc = grouped2
      val keys = orderByEff.map { case (e, desc) =>
        val e2 =
          if (hasExists(e)) {
            val (lifted, rewritten, _) = liftExistsMarksImpl(sortSrc, e,
              triples, labels, params, memo, None, None)
            sortSrc = lifted; rewritten
          } else e
        val ct = compileE(e2)
          if (desc) sortKey(ct).desc else sortKey(ct).asc
      }
      out = sortSrc.orderBy(keys: _*).select(cols: _*)
    } else {
      out = grouped2.select(cols: _*)
      if (q.distinct) out = out.distinct()
      if (q.orderBy.nonEmpty) {
        // §17.4.1.4 in ORDER BY keys: marks lift against the PROJECTED
        // frame (the solution at sort time), the sort reads the rewritten
        // expression, and the narrow drop after the sort preserves the
        // order (same projection-survives-sort property the typed-order
        // branch relies on).
        var sortSrc = out
        val allMarks = Vector.newBuilder[String]
        val keys = q.orderBy.map { case (e, desc) =>
          val e2 =
            if (hasExists(e)) {
              val (lifted, rewritten, marks) = liftExistsMarksImpl(sortSrc,
                e, triples, labels, params, memo, None, None)
              sortSrc = lifted; allMarks ++= marks; rewritten
            } else e
          val ct = compileE(e2)
          if (desc) sortKey(ct).desc else sortKey(ct).asc
        }
        out = sortSrc.orderBy(keys: _*).drop(allMarks.result(): _*)
      }
    }
    q.offset.foreach(o => out = out.offset(resolve(o, params).toInt))
    q.limit.foreach(l => out = out.limit(resolve(l, params).toInt))
    out
  }

  /** Inline `VALUES` table as a literal DataFrame (shared by the
    * in-group element and the trailing §18.2.4 clause). */
  private def valuesTableDf(sp: SparkSession, vars: Seq[String],
      rowsV: Seq[Seq[Option[String]]]): DataFrame = {
    val hasUndef = rowsV.exists(_.exists(_.isEmpty))
    val schema = org.apache.spark.sql.types.StructType(vars.map(v =>
      org.apache.spark.sql.types.StructField(v,
        org.apache.spark.sql.types.StringType, nullable = hasUndef)))
    sp.createDataFrame(
      java.util.Arrays.asList(rowsV.map(r =>
        org.apache.spark.sql.Row(r.map(_.orNull): _*)).toArray: _*), schema)
  }

  /** §10.2.2 null-compatible inline-table join: compatibility is
    * symmetric — an UNBOUND accumulator cell (a variable bound in only
    * one UNION arm, or from an earlier UNDEF row) is compatible with
    * ANY table value, just as an UNDEF table cell is with any
    * accumulator value; the output coalesces the bound side. */
  private def undefValuesJoin(a: DataFrame, df: DataFrame): DataFrame = {
    val shared = a.columns.intersect(df.columns).toSeq
    if (shared.isEmpty) sys.error(
      "VALUES with UNDEF shares no variable with the preceding " +
        "patterns; drop the block or bind a shared variable first")
    val t = broadcast(df)
    val cond = shared.map(v => t(v).isNull || a(v).isNull || t(v) === a(v))
      .reduce(_ && _)
    val outCols =
      a.columns.map(c =>
        if (shared.contains(c)) coalesce(a(c), t(c)).as(c) else a(c)) ++
      df.columns.filterNot(a.columns.contains).map(c => t(c))
    a.join(t, cond).select(outCols.toSeq: _*)
  }

  /** §17.4.1.4: EXISTS anywhere a boolean fits. Each EExists node lifts
    * to a hidden boolean mark: the base frame splits into compat-matched
    * / not-matched partitions (the same audited machinery as the
    * group-level form — exact multiset, null-compatible), re-unioned
    * with the mark, so the surrounding expression (&&, ||, IF, NOT) sees
    * an ordinary column. Callers (FILTER, BIND, projection) drop the
    * returned mark columns once used. */
  /** Mark-name source for [[liftExistsMarksImpl]]: process-unique so
    * SEQUENTIAL lift calls over one accumulating frame (several
    * EXISTS-bearing aggregate arguments, several EXISTS ORDER BY keys,
    * several EXISTS projections) can never collide — a per-call counter
    * would reuse `__exists0` and the second lift's withColumn would
    * silently REPLACE the first lift's mark, making both expressions
    * read the second EXISTS. */
  private val markIds = new java.util.concurrent.atomic.AtomicLong(0)

  private def liftExistsMarksImpl(base0: DataFrame, e: EExpr,
      triples: DataFrame, labels: DataFrame, params: Map[String, Long],
      memo: FunctMemo, graphCtx: Option[Term],
      namedTriples: Option[DataFrame]): (DataFrame, EExpr, Seq[String]) = {
    var lifted = base0
    val marks = Vector.newBuilder[String]
    def lift(x: EExpr): EExpr = x match {
      case EExists(g, neg) =>
        val right = compileGroup(g, triples, labels, params, memo,
          graphCtx, namedTriples)._1
        val shared = lifted.columns.intersect(right.columns).toSeq
          .filterNot(isFidelityCol)
        if (shared.isEmpty) sys.error(
          "EXISTS must share at least one variable with the outer group")
        val m = s"__exists${markIds.getAndIncrement()}"; marks += m
        val matched = compatNegation(lifted, right, shared,
          anti = false, requireOverlap = false).withColumn(m, lit(true))
        val unmatched = compatNegation(lifted, right, shared,
          anti = true, requireOverlap = false).withColumn(m, lit(false))
        lifted = matched.unionByName(unmatched)
        if (neg) ENot(EMark(m)) else EMark(m)
      case EAnd(l, r) => EAnd(lift(l), lift(r))
      case EOr(l, r) => EOr(lift(l), lift(r))
      case ENot(y) => ENot(lift(y))
      case ECmp(op, l, r) => ECmp(op, lift(l), lift(r))
      case EArith(op, l, r) => EArith(op, lift(l), lift(r))
      case ENeg(y) => ENeg(lift(y))
      case EIf(c, t, f) => EIf(lift(c), lift(t), lift(f))
      case EFn(nm, as) => EFn(nm, as.map(lift))
      case EIn(y, vs, neg) => EIn(lift(y), vs, neg)
      case leaf => leaf
    }
    val e2 = lift(e)
    (lifted, e2, marks.result())
  }

  /** Compile a group's elements; returns (bound rows, label-service langs).
    *
    * Comparison and VALUES filters apply group-wide (SPARQL scoping) after
    * every pattern has bound its variables; langmatches filters attach to
    * the triple pattern binding their variable; BIND is position-sensitive.
    * Disconnected patterns cross-join (SPARQL join of disjoint domains) —
    * later patterns sharing variables with both sides narrow the product,
    * and Catalyst sees the whole join tree declaratively. */
  /** BGP join-order selection: within each maximal CONTIGUOUS run of
    * triple patterns, greedily order by selectivity while preserving
    * connectivity with the already-bound variable set — the join tree
    * must not be dictated by the user's textual pattern order (the
    * standard triple-store move; Spark's own ReorderJoin has no stats
    * here to do it for us). Scoring: +2 per constant subject/object, +1
    * for a constant predicate (a filtered scan), −3 for a property-path
    * pattern (closures are the expensive relations — joined late, once
    * the frontier is narrowed). Every non-pattern element (FILTER, BIND,
    * OPTIONAL, VALUES, GRAPH, …) is a BARRIER: runs never cross it, so
    * anything order-sensitive keeps its position. Inner equi-joins on
    * shared variable names commute, so results are invariant; only the
    * join tree changes. Ties break on textual position (deterministic).
    * A pattern sharing no variable with the bound set is only picked
    * when nothing else remains — the disconnected cross join the
    * language semantics require stays, but never gets created EARLY. */
  private[graft] def reorderPatterns(els: Seq[El]): Seq[El] = {
    def isPat(e: El): Boolean = e match {
      case _: Tp | _: TpVar => true
      case _ => false
    }
    def termVars(t: Term): Seq[String] = t match {
      case V(v) => Seq(v)
      case _ => Nil
    }
    def vars(e: El): Set[String] = e match {
      case Tp(s, _, o) => (termVars(s) ++ termVars(o)).toSet
      case TpVar(s, p, o) => (termVars(s) ++ (p +: termVars(o))).toSet
      case _ => Set.empty
    }
    def score(e: El): Int = e match {
      case Tp(s, Path(Seq(PStep(Seq((_, false)), "", false, Nil))), o) =>
        1 + Seq(s, o).count(!_.isInstanceOf[V]) * 2
      case Tp(s, _, o) => -3 + Seq(s, o).count(!_.isInstanceOf[V]) * 2
      case TpVar(s, _, o) => Seq(s, o).count(!_.isInstanceOf[V]) * 2
      case _ => 0
    }
    val out = Vector.newBuilder[El]
    var i = 0
    while (i < els.length) {
      if (!isPat(els(i))) { out += els(i); i += 1 }
      else {
        val run = Vector.newBuilder[El]
        while (i < els.length && isPat(els(i))) { run += els(i); i += 1 }
        val patterns = run.result()
        if (patterns.length <= 1) out ++= patterns
        else {
          val remaining =
            scala.collection.mutable.ArrayBuffer.from(patterns.zipWithIndex)
          val bound = scala.collection.mutable.Set.empty[String]
          while (remaining.nonEmpty) {
            val connected = remaining.filter { case (e, _) =>
              bound.isEmpty || vars(e).exists(bound) }
            val pool = if (connected.nonEmpty) connected else remaining
            val next = pool.maxBy { case (e, idx) => (score(e), -idx) }
            remaining -= next
            bound ++= vars(next._1)
            out += next._1
          }
        }
      }
    }
    out.result()
  }

  private def compileGroup(els0: Seq[El], triples: DataFrame, labels: DataFrame,
                           params: Map[String, Long],
                           memo: FunctMemo,
                           graphCtx: Option[Term] = None,
                           namedTriples: Option[DataFrame] = None)
      : (DataFrame, Option[Seq[String]]) = {
    val els = reorderPatterns(els0)
    // GRAPH context (§13.3): a constant graph adds a `g` filter to every
    // triple scan in scope; a variable graph binds `g` as that variable on
    // every scan, so patterns inside one GRAPH block join on the graph too
    // (same-graph semantics) and the variable escapes to the outer group.
    // Either form requires the quad model — a `g` column on the source.
    def requireG(): Unit = require(triples.columns.contains("g"),
      "GRAPH requires a quad source with a `g` column (the TriG/N-Quads model)")
    val langFilters: Map[String, String] =
      els.collect { case LangM(v, lang) => v -> lang }.toMap
    val langApplied = scala.collection.mutable.Set[String]()
    var acc: Option[DataFrame] = None
    var svc: Option[Seq[String]] = None

    // §17.4.1.4 mark lift, scoped to this group's compile context (shared
    // by the FILTER and BIND compilers; compileSelect lifts projections
    // through the same impl).
    def liftExistsMarks(base0: DataFrame, e: EExpr)
        : (DataFrame, EExpr, Seq[String]) =
      liftExistsMarksImpl(base0, e, triples, labels, params, memo,
        graphCtx, namedTriples)
    // columns minted by BNODE binds: excluded from later mint/BNODE row
    // keys so BNODE(?x) twice in one solution coalesces to the same node
    // (§17.4.2.9 — the second call's solution identity must not include
    // the first call's output)
    val mintedBnodes = scala.collection.mutable.Set[String]()

    // Fidelity companions (see langCol's doc) are never join keys and on a
    // collision the incoming side's copy is dropped — value-join, carry
    // the term struct (model/Rdf.scala).
    def dropSharedHidden(a: DataFrame, df: DataFrame): DataFrame =
      a.columns.intersect(df.columns).filter(isFidelityCol)
        .foldLeft(df)(_ drop _)
    def join(df0: DataFrame): Unit = acc = acc match {
      case None => Some(df0)
      case Some(a) =>
        val df = dropSharedHidden(a, df0)
        val shared = a.columns.intersect(df.columns).toSeq
        if (shared.isEmpty) Some(a.crossJoin(df)) else Some(a.join(df, shared))
    }
    // An object variable over a fidelity-carrying source binds its term
    // companions alongside the value column.
    val hasFidelity =
      triples.columns.contains("oLang") ||
        triples.columns.contains("oDatatype") ||
        triples.columns.contains("oType")
    def companions(v: String): Seq[Column] =
      if (!hasFidelity) Nil
      else Seq(
        (if (triples.columns.contains("oLang")) col("oLang")
         else lit(null).cast("string")).as(langCol(v)),
        (if (triples.columns.contains("oDatatype")) col("oDatatype")
         else lit(null).cast("string")).as(dtCol(v))) ++
        (if (triples.columns.contains("oType"))
           Seq(col("oType").as(kindCol(v)))
         else Nil)

    els.foreach {
      case Tp(s, Path(Seq(PStep(Seq((pv, false)), "", false, Nil))), o) =>
        // plain predicate: a single filtered triple scan
        var pat = triples.filter(col("p") === pv)
        val projected = Vector.newBuilder[Column]
        graphCtx.foreach { g =>
          requireG()
          g match {
            case V(gv) => projected += col("g").as(gv)
            case C(gc) => pat = pat.filter(col("g") === gc)
            case L(gc) => pat = pat.filter(col("g") === gc)
          }
        }
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
              pat = pat.filter(langMatchesPred(col("oLang"), lit(lang)))
              langApplied += v
            }
            projected += col("o").as(v)
            projected ++= companions(v)
          case C(v) => pat = pat.filter(col("o") === v)
          case L(v) => pat = pat.filter(col("o") === v)
        }
        join(pat.select(projected.result(): _*))
      case TpVar(s, pv, o) =>
        // variable predicate: unfiltered scan, p bound as a column
        var pat = triples
        val projected = Vector.newBuilder[Column]
        graphCtx.foreach { g =>
          requireG()
          g match {
            case V(gv) => projected += col("g").as(gv)
            case C(gc) => pat = pat.filter(col("g") === gc)
            case L(gc) => pat = pat.filter(col("g") === gc)
          }
        }
        s match {
          case V(v) => projected += col("s").as(v)
          case C(v) => pat = pat.filter(col("s") === v)
          case L(v) => pat = pat.filter(col("s") === v)
        }
        projected += col("p").as(pv)
        o match {
          case V(v) =>
            projected += col("o").as(v)
            projected ++= companions(v)
          case C(v) => pat = pat.filter(col("o") === v)
          case L(v) => pat = pat.filter(col("o") === v)
        }
        join(pat.select(projected.result(): _*))
      case Tp(s, path, o) =>
        graphCtx match {
          case None => join(compilePath(s, path, o, triples, memo))
          case Some(C(gc)) => requireG()
            join(compilePath(s, path, o, triples.filter(col("g") === gc), memo))
          case Some(L(gc)) => requireG()
            join(compilePath(s, path, o, triples.filter(col("g") === gc), memo))
          case Some(V(gv)) => requireG()
            // Graph-partitioned path evaluation: tag every node with its
            // graph (g+\\u0001+node) and run the standard path/closure
            // machinery ONCE over the disjoint union of the per-graph
            // edge sets — a walk can never cross graphs because tagged
            // node ids differ, so the single distributed closure IS the
            // per-graph closure (no driver iteration, no per-graph
            // plans). Constants become variables pre-tag and filter
            // post-split. Two documented consequences: (a) the zero-hop
            // domain of `*`/`?` under GRAPH ?var is the PER-GRAPH
            // edge-node set — a constant takes the zero-length path only
            // in graphs whose edge set mentions it; (b) constant-object
            // seeded-reach fast paths don't fire (the seed differs per
            // graph) — the general closure + post-filter runs instead.
            val sep = "\u0001"
            val tagged = triples.select(
              concat_ws(sep, col("g"), col("s")).as("s"),
              col("p"),
              concat_ws(sep, col("g"), col("o")).as("o"))
            val rel = compilePath(V("__gpa"), path, V("__gpb"), tagged, memo)
            var out = rel.select(
              split(col("__gpa"), sep, 2).getItem(0).as(gv),
              split(col("__gpa"), sep, 2).getItem(1).as("__pa"),
              split(col("__gpb"), sep, 2).getItem(1).as("__pb"))
            val projected = Vector.newBuilder[Column]
            projected += col(gv)
            s match {
              case V(v) => projected += col("__pa").as(v)
              case C(v) => out = out.filter(col("__pa") === v)
              case L(v) => out = out.filter(col("__pa") === v)
            }
            o match {
              case V(v) => projected += col("__pb").as(v)
              case C(v) => out = out.filter(col("__pb") === v)
              case L(v) => out = out.filter(col("__pb") === v)
            }
            join(out.select(projected.result(): _*))
        }
      case ValuesTabEl(vars, rowsV) =>
        // inline table → literal DataFrame. All-defined rows broadcast-
        // inner-join on shared variables (the equi-join fast path). Rows
        // carrying UNDEF compile to a null-compatible broadcast join
        // instead: an UNDEF cell leaves its variable unconstrained, so the
        // condition per shared var is `T.v IS NULL OR T.v = acc.v` and the
        // output coalesces the bound side — multiset semantics fall out
        // (a solution compatible with two rows appears twice, §10.2.2).
        val df = valuesTableDf(triples.sparkSession, vars, rowsV)
        if (!rowsV.exists(_.exists(_.isEmpty))) join(broadcast(df))
        else acc match {
          case None => sys.error(
            "VALUES with UNDEF must follow a pattern binding its " +
              "variables (an unbound leading wildcard row has no " +
              "null-compatible join partner)")
          case Some(a) => acc = Some(undefValuesJoin(a, df))
        }
      case UnionEl(arms) =>
        val dfs = arms.map(a =>
          compileGroup(a, triples, labels, params, memo, graphCtx, namedTriples)._1)
        // §16.3 union normalization: arms may bind DIFFERENT variable
        // sets — a variable absent from an arm is unbound there, so every
        // missing column fills before unionByName. User variables and the
        // string fidelity companions fill as null STRINGS (= unbound /
        // plain term); __dv_ numeric carriers get a TYPE-correct fill
        // (see companionFill) — a null STRING there would make unionByName
        // widen the other arm's double carrier to string, silently
        // degrading duration value semantics. (Until round 15 only the
        // fidelity companions were filled and differing user-variable
        // sets failed loudly in ResolveUnion — a documented deviation,
        // now closed.)
        val allCols = dfs.flatMap(_.columns).distinct
        val normalized = dfs.map(df => allCols.filterNot(df.columns.contains)
          .foldLeft(df)((d, c) => d.withColumn(c, companionFill(d, c))))
        join(normalized.reduce(_ unionByName _))
      case OptEl(g) =>
        val a = acc.getOrElse(sys.error("OPTIONAL requires a preceding pattern"))
        // §8.3.2: `OPTIONAL { P FILTER(F) }` is LeftJoin(left, P, F) — F
        // ranges over the MERGED bindings, so a filter referencing a
        // variable bound OUTSIDE the optional cannot evaluate inside P.
        // Probe P's own bindings (plan-only compile, no execution), then
        // DEFER any filter that needs outer variables into the join
        // condition; filters P can satisfy alone stay inside (the
        // scan-adjacent fast path — equivalent under left-outer for
        // right-only predicates). EXISTS-bearing filters always stay
        // inside (their mark-lift machinery runs against the inner
        // solution); one referencing outer vars still fails loudly.
        val innerFilters = g.collect { case f: FilterExpr => f }
        val deferred: Seq[FilterExpr] =
          if (innerFilters.isEmpty) Nil
          else {
            val probeCols = compileGroup(
              g.filterNot(_.isInstanceOf[FilterExpr]), triples, labels,
              params, memo, graphCtx, namedTriples)._1.columns.toSet
            innerFilters.filter(f => !hasExists(f.e) &&
              !exprVars(f.e).subsetOf(probeCols))
          }
        val right = compileGroup(g.filterNot(deferred.contains(_)), triples,
          labels, params, memo, graphCtx, namedTriples)._1
        if (deferred.isEmpty)
          acc = Some(SparqlAlgebra.optional(a, dropSharedHidden(a, right)))
        else {
          // LeftJoin with a condition: matched = inner-join ⋉ F over the
          // merged frame; left rows with NO surviving match re-attach
          // null-extended (multiset-exact: the anti-join keys on every
          // left column, so duplicate left rows survive or drop together
          // — same split the EXISTS mark machinery uses)
          val r2 = dropSharedHidden(a, right)
          val shared = a.columns.intersect(r2.columns).toSeq
          val cond = deferred.map(f => compileBool(f.e)).reduce(_ && _)
          val matched = a.join(r2, shared, "inner").filter(cond)
          val rightOnly = r2.columns.filterNot(shared.contains)
          // the anti-join needs EXACT row identity, so equality must be
          // null-SAFE: a left row null-extended by an earlier OPTIONAL
          // would never `=`-match its own matched copy and be emitted
          // twice. `<=>` keys still plan as a hash equi-join
          // (ExtractEquiJoinKeys admits EqualNullSafe).
          val la = a.as("__la")
          val mk = matched.select(a.columns.map(col): _*).as("__mk")
          val antiCond = a.columns.map(c =>
            col(s"__la.`$c`") <=> col(s"__mk.`$c`")).reduce(_ && _)
          val unmatched = la.join(mk, antiCond, "left_anti")
          // null-extension: __dv_ carriers fill type-correctly (the base
          // var is itself null-extended, so the parse is null → null
          // DOUBLE, keeping the union's carrier column numeric)
          val extended = rightOnly.foldLeft(unmatched)((df, c) =>
            df.withColumn(c, companionFill(df, c)))
          acc = Some(matched.select(
            (a.columns ++ rightOnly).map(col): _*)
            .unionByName(extended.select((a.columns ++ rightOnly).map(col): _*)))
        }
      case GraphEl(graph, g) =>
        // inner GRAPH re-scopes (replaces, not intersects, any outer
        // context — §13.3's active-graph substitution); with explicit
        // dataset clauses the scans range over the FROM NAMED set
        join(compileGroup(g, namedTriples.getOrElse(triples), labels, params,
          memo, Some(graph), namedTriples)._1)
      case MinusEl(g) =>
        val a = acc.getOrElse(sys.error("MINUS requires a preceding pattern"))
        val right =
          compileGroup(g, triples, labels, params, memo, graphCtx, namedTriples)._1
        // fidelity companions are not solution variables — compatibility
        // is decided on the value columns only
        val shared = a.columns.intersect(right.columns).toSeq
          .filterNot(isFidelityCol)
        // no shared variables → every solution is incompatible with every
        // right-side solution → MINUS removes nothing (SPARQL §8.3.3)
        acc = Some(if (shared.isEmpty) a
          else compatNegation(a, right, shared, anti = true,
            requireOverlap = true)) // MINUS: dom(μ1)∩dom(μ2) must be non-empty
      case SubSel(sub) =>
        // §13.3: inside GRAPH <const>, the subselect's active graph IS
        // that graph — compile it against the graph-filtered quad view
        // (the filter pushes into every scan the subselect plans).
        graphCtx match {
          case None =>
            join(compileSelect(sub, triples, labels, params, memo))
          case Some(C(gc)) => requireG()
            join(compileSelect(sub, triples.filter(col("g") === gc),
              labels, params, memo))
          case Some(L(gc)) => requireG()
            join(compileSelect(sub, triples.filter(col("g") === gc),
              labels, params, memo))
          case Some(V(gv)) => requireG()
            // A VARIABLE graph needs per-graph evaluation of the whole
            // subselect (its aggregates group WITHIN each graph). That is
            // an algebraic rewrite, not driver iteration: push the GRAPH
            // wrapper inside the subselect's WHERE (every scan then binds
            // ?gv and joins on it, so all patterns of one solution range
            // over ONE graph) and add ?gv to the projection and — when
            // aggregating — to the GROUP BY keys, which groups within
            // each graph. DISTINCT over (?gv, vars) is per-graph
            // DISTINCT for the same reason. Per-graph ORDER/LIMIT/OFFSET
            // do NOT globalize — LIMIT/OFFSET cut WITHIN each graph via
            // a row_number window PARTITIONED ON ?gv (one shuffle on the
            // graph key; no driver iteration, no global sort).
            if (elVars(sub.where).contains(gv) ||
                sub.proj.exists(_.out == gv) || sub.groupBy.contains(gv))
              sys.error(s"GRAPH ?$gv { SELECT … }: the subselect already " +
                s"uses ?$gv — rename one of the two")
            val aggregating = sub.groupBy.nonEmpty ||
              sub.groupByExprs.nonEmpty || sub.having.nonEmpty ||
              sub.proj.exists {
                case _: PAgg | _: PAggE | _: PGroupConcat => true
                case _ => false
              }
            val proj2 =
              if (sub.proj == Seq(PStar)) sub.proj // ?gv rides along in *
              else sub.proj :+ PVar(gv, gv)
            val rewritten = sub.copy(
              proj = proj2,
              where = Seq(GraphEl(V(gv), sub.where)),
              groupBy = if (aggregating) gv +: sub.groupBy else sub.groupBy,
              orderBy = Nil, limit = None, offset = None)
            var subDf = compileSelect(rewritten, triples, labels, params, memo)
            if (sub.limit.nonEmpty || sub.offset.nonEmpty) {
              // a per-graph cut without a sort key is a nondeterministic
              // pick — refused per engine policy (SURVEY §7.3)
              if (sub.orderBy.isEmpty) sys.error(
                "LIMIT/OFFSET inside GRAPH ?var requires ORDER BY (the " +
                  "per-graph cut would be nondeterministic)")
              // §18 ordering: keys compile over the PROJECTED per-graph
              // frame, so every key must be visible in the projection
              val visible = subDf.columns.toSet
              val keys = sub.orderBy.map { case (e, desc) =>
                val miss = exprVars(e).diff(visible)
                if (miss.nonEmpty) sys.error(
                  s"ORDER BY inside GRAPH ?$gv references non-projected " +
                    s"variable(s) ${miss.mkString(", ")} — project them " +
                    "through the subselect")
                val ct = compileE(e)
                if (desc) sortKey(ct).desc else sortKey(ct).asc
              }
              val w = org.apache.spark.sql.expressions.Window
                .partitionBy(col(gv)).orderBy(keys: _*)
              val lo = sub.offset.map(resolve(_, params)).getOrElse(0L)
              val hi = sub.limit.map(resolve(_, params) + lo)
              subDf = subDf.withColumn("__rn", row_number().over(w))
                .filter(col("__rn") > lo &&
                  hi.map(col("__rn") <= _).map(c => c: Column)
                    .getOrElse(lit(true)))
                .drop("__rn")
            }
            // ORDER BY alone (no cut) is unobservable through the outer
            // join — a documented no-op, like any subquery ordering
            join(subDf)
        }
      case BindExpr(out, e) =>
        val a = acc.getOrElse(sys.error("BIND requires a preceding pattern"))
        // §10.1: the BIND target must not already be in scope — silently
        // overwriting an in-scope variable would corrupt solutions
        if (a.columns.contains(out))
          sys.error(s"BIND(... AS ?$out): ?$out is already bound in this " +
            "group (SPARQL §10.1 forbids rebinding)")
        acc = Some(e match {
          // term constructors (§17.4.2.8/9): the value lands in the
          // variable, the tag in its fidelity companions — LANG/DATATYPE
          // of the bound variable then answer from those
          case EFn("STRLANG", Seq(x, l)) =>
            a.withColumn(out, compileE(x)._1)
              .withColumn(langCol(out), compileE(l)._1)
              .withColumn(dtCol(out), lit(null).cast("string"))
              .withColumn(kindCol(out),
                when(col(out).isNotNull, lit("literal")))
          case EFn("STRDT", Seq(x, d)) =>
            a.withColumn(out, compileE(x)._1)
              .withColumn(langCol(out), lit(null).cast("string"))
              .withColumn(dtCol(out), compileE(d)._1)
              .withColumn(kindCol(out),
                when(col(out).isNotNull, lit("literal")))
          // §17.4.5.7 TIMEZONE: the zone of an xsd:dateTime as an
          // xsd:dayTimeDuration — the duration VALUE rides in the
          // variable's lexical column and the type in its __dt
          // companion (the dt-companion carrier that closes the last
          // §17.4 builtin-family gap: the engine needs no duration
          // arithmetic, only the typed-literal term). Zone-less values
          // raise per XPath fn:timezone-from-dateTime → NULL (unbound).
          // CaseWhen keeps the offset-digit casts off the 'Z'/zone-less
          // rows (ANSI-safe: '' never reaches CAST).
          case EFn("TIMEZONE", Seq(x)) =>
            val secs = timezoneSecondsOf(compileE(x)._1.cast("string"))
            a.withColumn(out, durationLexicalOfSeconds(secs))
              // numeric-carrier companion: later constructor re-entries
              // read this instead of re-parsing the rendered lexical
              .withColumn(dvsCol(out), secs)
              .withColumn(langCol(out), lit(null).cast("string"))
              .withColumn(dtCol(out), when(col(out).isNotNull,
                lit("http://www.w3.org/2001/XMLSchema#dayTimeDuration")))
              .withColumn(kindCol(out),
                when(col(out).isNotNull, lit("literal")))
          case EFn("IRI" | "URI", Seq(x)) =>
            // kind rides only where a VALUE exists: IRI(unbound) is an
            // error (NULL value), and a constant kind would make
            // ISIRI answer true on it instead of propagating the error
            val iriV = compileE(x)._1
            a.withColumn(out, iriV)
              .withColumn(langCol(out), lit(null).cast("string"))
              .withColumn(dtCol(out), lit(null).cast("string"))
              .withColumn(kindCol(out), when(iriV.isNotNull, lit("iri")))
          // §17.4.2.9 via the mint policy: BNODE() is a fresh node per
          // solution, BNODE(str) maps the SAME str in the SAME solution
          // to the SAME node and distinct solutions to distinct nodes.
          // The solution key is md5 of the bound variables as a JSON
          // struct — to_json keeps NULLs and field names explicit, so
          // (x=unbound, y="1") and (x="1", y=unbound) cannot collide the
          // way a separator-joined concat would (NULL-skipping +
          // delimiter injection). Deterministic across re-runs (SURVEY
          // §7.3) where the spec's fresh labels would not be. KNOWN
          // LIMIT: the key reflects the variables bound AT THIS BIND's
          // position — two BNODE(same-label) calls separated by a
          // pattern that binds a new variable mint different nodes,
          // where §17.4.2.9 would coalesce them; adjacent calls (the
          // practical shape) coalesce exactly.
          case EFn("BNODE", bArgs) =>
            val keyCols = a.columns
              .filterNot(c => c.startsWith("__anon") || isFidelityCol(c) ||
                mintedBnodes.contains(c))
              .sorted.map(col)
            val rowKey = md5(to_json(struct(keyCols: _*)))
            val id = bArgs match {
              // no-arg: FRESH per call — salt with the target variable so
              // two BNODE() binds in one solution stay distinct
              case Seq() => concat(lit("_:b"),
                md5(concat(lit(out), lit("|"), rowKey)))
              case Seq(x) =>
                val lbl = asStr(compileE(x))
                concat(lit("_:b"), md5(concat(lbl, lit("|"), rowKey)))
            }
            mintedBnodes += out
            a.withColumn(out, id)
              .withColumn(langCol(out), lit(null).cast("string"))
              .withColumn(dtCol(out), lit(null).cast("string"))
              .withColumn(kindCol(out), when(col(out).isNotNull, lit("bnode")))
          // BIND(… EXISTS{…} … AS ?b): lift the marks against the
          // running frame, bind the rewritten expression, drop the marks
          // — ?b is then an ordinary boolean column (§17.4.1.4 allows
          // EXISTS anywhere a boolean fits, including BIND)
          case x if hasExists(x) =>
            val (lifted, e2, marks) = liftExistsMarks(a, x)
            marks.foldLeft(
              lifted.withColumn(out, emitVal(compileE(
                rewriteDurVals(lifted.columns.toSet, e2)))))(_ drop _)
          case _ =>
            val (cv, ty) = compileE(rewriteDurVals(a.columns.toSet, e))
            // output boundary: a duration-typed result materializes its
            // canonical lexical HERE, once — downstream uses re-enter
            // the rung through the xsd: constructor (which reads the
            // __dv_ carrier companion bound below, never the render)
            val bound = a.withColumn(out, emitVal((cv, ty)))
            // duration-typed results (duration arithmetic, typed-literal
            // pass-through) carry their datatype in the __dt companion
            // so DATATYPE(?out) answers correctly — same treatment the
            // TIMEZONE special case gives its results
            def durBind(iri: String, dv: String) = bound
              .withColumn(dv, cv) // numeric-carrier companion
              .withColumn(langCol(out), lit(null).cast("string"))
              .withColumn(dtCol(out), when(col(out).isNotNull, lit(iri)))
              .withColumn(kindCol(out),
                when(col(out).isNotNull, lit("literal")))
            ty match {
              case TyDur => durBind(
                "http://www.w3.org/2001/XMLSchema#dayTimeDuration",
                dvsCol(out))
              case TyDurYM => durBind(
                "http://www.w3.org/2001/XMLSchema#yearMonthDuration",
                dvmCol(out))
              case _ => bound
            }
        })
      case BindMint(out, prefix) =>
        // STRUUID surrogate: md5 of the row's non-anonymous bound variables
        // (sorted for stability) — one URI per distinct binding, stable
        // across re-runs (R2 / SURVEY §7.3); anonymous `[]` vars are
        // existential scaffolding and fidelity companions are not solution
        // variables — both excluded from the key.
        val a = acc.getOrElse(sys.error("BIND requires a preceding pattern"))
        if (a.columns.contains(out))
          sys.error(s"BIND(... AS ?$out): ?$out is already bound in this " +
            "group (SPARQL §10.1 forbids rebinding)")
        val keyCols = a.columns
          .filterNot(c => c.startsWith("__anon") || isFidelityCol(c))
          .sorted.map(col)
        acc = Some(a.withColumn(out,
          concat(lit(prefix), md5(concat_ws("|", keyCols: _*)))))
      case _: FilterExpr => // group-wide; applied below once all vars are bound
      case _: ExistsEl => // group-wide; applied below
      case _: ValuesEl => // group-wide; applied below
      case _: LangM => // attached to its binding pattern above
      case LabelSvc(langs) => svc = Some(langs)
      case ServiceEl(iri, g, silent) =>
        // §18.2.4.3: Join(P, Service(iri, pattern)) — the body evaluates
        // against the REGISTERED endpoint graph (its own default graph:
        // no outer GRAPH context or dataset clause leaks in), and the
        // result bag-joins with the accumulated solutions on shared
        // variables via the ordinary join() path (cross join when
        // disjoint, per the spec's compatible-merge over empty domains).
        lookupService(iri, triples.sparkSession) match {
          case Some(endpoint) =>
            val svc0 = compileGroup(g, endpoint, labels, params, memo,
              None, None)._1
            // §18 bound join: when the outer group already bound variables
            // the service body shares, semi-join the service-side plan on
            // the DISTINCT outer bindings BEFORE the bag join — the
            // federation analogue of pushing a VALUES block into the
            // remote query, so a selective outer pattern never
            // materializes the full registered store. Exact because the
            // final join is a plain equi-join on the same shared columns
            // (every semi-dropped service row had no join partner; null
            // keys match nothing on either path). The distinct key set is
            // outer-cardinality-bounded and usually tiny — AQE broadcasts
            // it when it is.
            val bounded = acc match {
              case Some(a) =>
                val svc = dropSharedHidden(a, svc0)
                val shared = a.columns.intersect(svc.columns).toSeq
                if (shared.isEmpty) svc
                else svc.join(a.select(shared.map(col): _*).distinct(),
                  shared, "left_semi")
              case None => svc0
            }
            join(bounded)
          case None if silent =>
            // SERVICE SILENT on an unreachable endpoint yields the unit
            // solution — a join identity, so the group is unchanged
            ()
          case None => sys.error(s"SERVICE <$iri>: no endpoint registered " +
            "under this IRI (SparqlText.registerService) — refusing to " +
            "guess at federation")
        }
      case ServiceVarEl(v, g, silent) =>
        // §18.2.4 per-binding dispatch: one compiled body per REGISTERED
        // endpoint (a driver-bounded loop over the registry, never over
        // data), each arm tagged with its IRI; the union joins the outer
        // solutions on ?v plus the shared body variables, so every outer
        // row consults exactly the endpoint its binding names. The §18
        // bound join applies to the union: the semi-join keys include
        // ?v, which restricts each arm to the outer rows naming it.
        val a = acc.getOrElse(sys.error(s"SERVICE ?$v requires a " +
          "preceding pattern binding the endpoint variable"))
        if (!a.columns.contains(v)) sys.error(s"SERVICE ?$v: the endpoint " +
          "variable is not bound by the preceding patterns")
        if (elVars(g).contains(v)) sys.error(s"SERVICE ?$v: the body must " +
          "not reuse the endpoint variable")
        val eps = listServices(triples.sparkSession)
        if (eps.isEmpty) {
          if (!silent) sys.error(s"SERVICE ?$v: no endpoints registered " +
            "(SparqlText.registerService) — refusing to guess at federation")
          // SILENT with an empty candidate set: unit solution, group
          // unchanged
        } else {
          val arms = eps.toSeq.sortBy(_._1).map { case (iri, endpoint) =>
            compileGroup(g, endpoint, labels, params, memo, None, None)._1
              .withColumn(v, lit(iri))
          }
          // normalize fidelity companions across arms (endpoints may
          // differ in term-fidelity columns) — the UnionEl convention
          val fid = arms.flatMap(_.columns).filter(isFidelityCol).distinct
          val svc0 = arms.map(df => fid.filterNot(df.columns.contains)
            .foldLeft(df)((d, c) => d.withColumn(c, companionFill(d, c))))
            .reduce(_ unionByName _)
          val svc = dropSharedHidden(a, svc0)
          val shared = a.columns.intersect(svc.columns).toSeq
          join(svc.join(a.select(shared.map(col): _*).distinct(),
            shared, "left_semi"))
        }
    }

    var out = acc.getOrElse(sys.error("empty group pattern"))
    els.foreach {
      case FilterExpr(e) =>
        // §17.4.1.4: EXISTS anywhere a boolean fits — lift to hidden
        // boolean marks (liftExistsMarks above), filter on the rewritten
        // expression, drop the marks.
        val (lifted, e2, marks) = liftExistsMarks(out, e)
        out = lifted.filter(
          compileBool(rewriteDurVals(lifted.columns.toSet, e2)))
        marks.foreach(m => out = out.drop(m))
      case ExistsEl(g, negated) =>
        val right =
          compileGroup(g, triples, labels, params, memo, graphCtx, namedTriples)._1
        val shared = out.columns.intersect(right.columns).toSeq
          .filterNot(isFidelityCol) // companions are not solution vars
        if (shared.isEmpty) sys.error(
          "FILTER [NOT] EXISTS must share at least one variable with the outer group")
        out = compatNegation(out, right, shared, anti = negated,
          requireOverlap = false)
      case ValuesEl(v, vals) => out = out.filter(col(v).isin(vals: _*)) // J6
      case _ =>
    }
    // A langmatches filter can only compile onto the triple pattern that
    // binds its variable IN THIS group (the pattern carries the oLang
    // fidelity column; joined outputs do not). If the variable was bound by
    // a nested element — OPTIONAL / UNION / subselect — the filter would
    // otherwise be silently dropped, returning wrong rows: fail loudly,
    // like every other unsupported construct. (Place the FILTER inside the
    // group that binds the variable, as the reference queries do.)
    langFilters.keys.foreach { v =>
      if (!langApplied.contains(v))
        sys.error(s"langmatches(lang(?$v)) must appear in the group whose " +
          s"triple pattern binds ?$v (nested OPTIONAL/UNION/subselect " +
          "bindings cannot be lang-filtered from the outer group)")
    }
    (out, svc)
  }

  /** SPARQL-compatible negation join (MINUS, [NOT] EXISTS).
    *
    * SPARQL compatibility ignores variables UNBOUND on either side: a null
    * shared column is compatible with anything, so a plain equi anti-join
    * (null = x → null → no match) would KEEP rows SPARQL removes. The
    * all-bound × all-bound bulk still goes through the hash equi join —
    * only rows carrying nulls (possible only downstream of OPTIONAL) take
    * the theta-join path, so the common case keeps the scalable plan.
    *
    * @param requireOverlap MINUS additionally requires a non-empty
    *   PER-ROW-PAIR shared domain (§8.3.3): an all-null pairing removes
    *   nothing. EXISTS uses plain compatibility.
    */
  private def compatNegation(left: DataFrame, right: DataFrame,
                             shared: Seq[String], anti: Boolean,
                             requireOverlap: Boolean): DataFrame = {
    // semi/anti joins never duplicate left rows — no right-side dedup
    val rs = right.select(shared.map(col): _*)
    val lHasNull = shared.map(col(_).isNull).reduce(_ || _)
    val rHasNull = shared.map(col(_).isNull).reduce(_ || _)
    val rBound = rs.filter(!rHasNull)
    val rNull = rs.filter(rHasNull)
    def renamed(df: DataFrame) = df.select(shared.map(c => col(c).as(s"__m_$c")): _*)
    def cond(l: DataFrame, r: DataFrame): Column = {
      val compat = shared.map(c =>
        l(c).isNull || r(s"__m_$c").isNull || l(c) === r(s"__m_$c")).reduce(_ && _)
      if (requireOverlap)
        compat && shared.map(c =>
          l(c).isNotNull && r(s"__m_$c").isNotNull).reduce(_ || _)
      else compat
    }
    val lBound = left.filter(!lHasNull)
    val lNull = left.filter(lHasNull)
    val rNullR = renamed(rNull)
    val rAllR = renamed(rs)
    if (anti) {
      // survive = not equi-matched by bound right rows AND not
      // compat-matched by null-carrying right rows
      val s1 = lBound.join(rBound, shared, "left_anti")
      val s2 = s1.join(rNullR, cond(s1, rNullR), "left_anti")
      val s3 = lNull.join(rAllR, cond(lNull, rAllR), "left_anti")
      s2.unionByName(s3)
    } else {
      // matched = equi-matched by bound right rows OR compat-matched by
      // null-carrying right rows
      val m1 = lBound.join(rBound, shared, "left_semi")
      val rest = lBound.join(rBound, shared, "left_anti")
      val m2 = rest.join(rNullR, cond(rest, rNullR), "left_semi")
      val m3 = lNull.join(rAllR, cond(lNull, rAllR), "left_semi")
      m1.unionByName(m2).unionByName(m3)
    }
  }

  /** Minimal expression typing over the engine's lexical-string column
    * model: TyS = lexical string (variables, string builtins), TyN =
    * numeric (double — every numeric literal, arithmetic result, and
    * numeric builtin is uniformly double, so plans and oracles agree on
    * one type), TyB = boolean (comparisons, connectives, predicates). */
  private sealed trait Ty
  private case object TyS extends Ty
  /** Numeric rungs of the §17.3 promotion ladder the engine distinguishes
    * statically: TyI = xsd:integer (Spark long — EXACT past 2^53, where
    * the double rung silently rounds), TyN = everything else (decimal /
    * float / double evaluate in binary double, the engine's documented
    * approximation for the non-integer rungs — one type, so plans and
    * oracles agree). Promotion: integer op integer stays integer
    * (except `/`, which divides on the decimal rung per §17.3/XPath —
    * evaluated as double here); any non-integer operand promotes the
    * whole expression to double, matching "the result follows the
    * promoted operand type". */
  private sealed trait TyNum extends Ty
  private case object TyN extends TyNum
  private case object TyI extends TyNum
  private case object TyB extends Ty
  /** xsd:dayTimeDuration on the expression rung: the compiled VALUE is
    * the numeric carrier — SIGNED SECONDS as a double — not the lexical
    * form. The lexical parses exactly once at rung ENTRY (a typed
    * literal, the xsd:dayTimeDuration constructor, TIMEZONE) and renders
    * exactly once at output boundaries ([[emitVal]]: SELECT projection,
    * BIND materialization, aggregate emit). Round 13 carried the LEXICAL
    * as the value and re-derived seconds at every use; the multiplicative
    * re-derivation (each [[durationSeconds]] embeds its input ~7×, each
    * [[durationLexicalOfSeconds]] ~14×) built expression trees of 10⁴⁺
    * nodes on a three-operator chain and hung whole-stage codegen's
    * `reduceCodeSize` before a single row executed. The numeric carrier
    * makes duration algebra plain double arithmetic — tree size linear
    * in the expression, exactly like TyI/TyN. */
  private case object TyDur extends Ty
  /** xsd:yearMonthDuration — same design as [[TyDur]] but the value
    * carrier is SIGNED MONTHS ([[durationMonths]]): the two XSD duration
    * subtypes are deliberately incomparable (§17 operator maps define
    * ordering within each subtype only — a month has no fixed length in
    * seconds), so they ride separate rungs and never coerce into each
    * other. */
  private case object TyDurYM extends Ty

  private def asNum(ct: (Column, Ty)): Column = ct match {
    case (c, TyN) => c
    case (c, TyI) => c // long — Spark promotes to double in mixed ops
    case (c, TyS) => c.cast("double")
    case (c, TyDur) => c // carrier IS signed seconds
    case (c, TyDurYM) => c // carrier IS signed months
    case (_, TyB) => sys.error("boolean expression used numerically")
  }
  /** Variables an expression references by name (EExists bodies excluded:
    * their correlation resolves through the mark machinery, and an
    * EXISTS-bearing filter is never deferred). */
  private def exprVars(e: EExpr): Set[String] = e match {
    case EVar(v) => Set(v)
    case EBound(v) => Set(v)
    case ENeg(x) => exprVars(x)
    case ENot(x) => exprVars(x)
    case EArith(_, l, r) => exprVars(l) ++ exprVars(r)
    case ECmp(_, l, r) => exprVars(l) ++ exprVars(r)
    case EAnd(l, r) => exprVars(l) ++ exprVars(r)
    case EOr(l, r) => exprVars(l) ++ exprVars(r)
    case EIn(x, _, _) => exprVars(x)
    case EIf(c, t, f) => exprVars(c) ++ exprVars(t) ++ exprVars(f)
    case EFn(_, args) => args.flatMap(exprVars).toSet
    case EDurVal(v, _) => Set(v)
    case EAgg(_, arg, _) =>
      arg.fold(v => if (v == "*") Set.empty[String] else Set(v), exprVars)
    case _ => Set.empty
  }

  /** Every variable name mentioned anywhere in a group — terms, filters
    * (including EXISTS bodies), binds, nested groups and subselects.
    * Conservative by design; used for the GRAPH ?var subselect rewrite's
    * graph-variable collision check. */
  private def elVars(els: Seq[El]): Set[String] = {
    def tv(ts: Term*): Set[String] = ts.collect { case V(v) => v }.toSet
    def ev(e: EExpr): Set[String] = e match {
      case EExists(g, _) => elVars(g)
      case ENeg(x) => ev(x)
      case ENot(x) => ev(x)
      case EArith(_, l, r) => ev(l) ++ ev(r)
      case ECmp(_, l, r) => ev(l) ++ ev(r)
      case EAnd(l, r) => ev(l) ++ ev(r)
      case EOr(l, r) => ev(l) ++ ev(r)
      case EIn(x, _, _) => ev(x)
      case EIf(c, t, f) => ev(c) ++ ev(t) ++ ev(f)
      case EFn(_, args) => args.flatMap(ev).toSet
      case EAgg(_, arg, _) => arg.fold(
        v => if (v == "*") Set.empty[String] else Set(v), ev)
      case other => exprVars(other)
    }
    els.flatMap {
      case Tp(s, _, o) => tv(s, o)
      case TpVar(s, p, o) => tv(s, o) + p
      case GraphEl(g, body) => tv(g) ++ elVars(body)
      case UnionEl(arms) => arms.flatMap(elVars).toSet
      case OptEl(g) => elVars(g)
      case MinusEl(g) => elVars(g)
      case ExistsEl(g, _) => elVars(g)
      case FilterExpr(e) => ev(e)
      case LangM(v, _) => Set(v)
      case ValuesEl(v, _) => Set(v)
      case ValuesTabEl(vars, _) => vars.toSet
      case BindExpr(out, e) => ev(e) + out
      case BindMint(out, _) => Set(out)
      case SubSel(sq) => elVars(sq.where) ++ sq.proj.map(_.out) ++
        sq.groupBy ++ sq.groupByExprs.flatMap(ge => ev(ge._1) + ge._2) ++
        sq.having.flatMap(ev) ++ sq.orderBy.flatMap(ob => ev(ob._1))
      case LabelSvc(_) => Set.empty[String]
      case ServiceEl(_, g, _) => elVars(g)
      case ServiceVarEl(v, g, _) => elVars(g) + v
    }.toSet
  }

  /** Does the expression contain an aggregate call? (EXISTS bodies have
    * their own group scope and cannot host outer aggregates — excluded.) */
  private def hasAgg(e: EExpr): Boolean = e match {
    case _: EAgg => true
    case ENeg(x) => hasAgg(x)
    case ENot(x) => hasAgg(x)
    case EArith(_, l, r) => hasAgg(l) || hasAgg(r)
    case ECmp(_, l, r) => hasAgg(l) || hasAgg(r)
    case EAnd(l, r) => hasAgg(l) || hasAgg(r)
    case EOr(l, r) => hasAgg(l) || hasAgg(r)
    case EIn(x, _, _) => hasAgg(x)
    case EIf(c, t, f) => hasAgg(c) || hasAgg(t) || hasAgg(f)
    case EFn(_, args) => args.exists(hasAgg)
    case _ => false
  }

  private def hasExists(e: EExpr): Boolean = e match {
    case _: EExists => true
    case ENeg(x) => hasExists(x)
    case ENot(x) => hasExists(x)
    case EArith(_, l, r) => hasExists(l) || hasExists(r)
    case ECmp(_, l, r) => hasExists(l) || hasExists(r)
    case EAnd(l, r) => hasExists(l) || hasExists(r)
    case EOr(l, r) => hasExists(l) || hasExists(r)
    case EIn(x, _, _) => hasExists(x)
    case EIf(c, t, f) => hasExists(c) || hasExists(t) || hasExists(f)
    case EFn(_, args) => args.exists(hasExists)
    // EXISTS inside an AGGREGATE argument — e.g.
    // HAVING(SUM(IF(EXISTS{…},1,0)) > 0) — is NOT an outer-frame
    // EXISTS: liftAggs routes the argument into a hidden PAggE and the
    // aggregate compiler lifts its marks against the PRE-aggregation
    // frame, so the surrounding (post-agg) lift must not see it
    case EAgg(_, _, _) => false
    case _ => false
  }

  /** LANGMATCHES per RFC 4647 basic filtering (§17.4.3.1): range `*`
    * matches any NON-EMPTY tag; otherwise case-insensitive exact match
    * or subtag-prefix match ("de" matches "de" and "de-AT"). Both the
    * scan-attached LangM fast path and the general expression compile
    * through here, so the two positions can never disagree; the
    * equality/StartsWith pair stays parquet-pushable on the fast path.
    * A NULL tag (untagged literal at the scan; LANG() already coalesces
    * to "") yields NULL → row dropped in a FILTER, unbound elsewhere. */
  private def langMatchesPred(tag: Column, range: Column): Column =
    when(lower(range) === "*", tag.isNotNull && tag =!= "")
      .otherwise(lower(tag) === lower(range) ||
        lower(tag).startsWith(concat(lower(range), lit("-"))))

  /** One lexical time component as a double: regexp group pull with the
    * no-match empty string mapped to NULL explicitly — under ANSI mode
    * `CAST('' AS DOUBLE)` raises, and a zone-less/date-only literal must
    * become an unbound-propagating error value, not a query abort. */
  private def timePart(s: Column, pattern: String): Column = {
    val part = regexp_extract(s, pattern, 1)
    when(part === "", lit(null)).otherwise(part).cast("double")
  }
  private def asStr(ct: (Column, Ty)): Column = ct match {
    case (c, TyS) => c
    // string context renders the CANONICAL lexical from the numeric
    // carrier (one render node — never re-parsed afterwards)
    case (c, TyDur) => durationLexicalOfSeconds(c)
    case (c, TyDurYM) => durationLexicalOfMonths(c)
    case (c, _: TyNum) => c.cast("string")
    case (_, TyB) => sys.error("boolean expression used as a string")
  }

  /** Output-boundary materialization: the duration rungs render their
    * canonical lexical exactly ONCE here (SELECT projection, BIND
    * materialization, GROUP BY key binding); every other rung projects
    * its compiled value unchanged. This is the render half of the
    * value-carrier design — see the [[TyDur]] scaladoc for why the
    * lexical must not be the in-flight value. */
  private def emitVal(ct: (Column, Ty)): Column = ct match {
    case (c, TyDur) => durationLexicalOfSeconds(c)
    case (c, TyDurYM) => durationLexicalOfMonths(c)
    case (c, _) => c
  }

  /** ORDER BY key for a compiled expression: duration-typed keys sort
    * through the seconds carrier (the comparison rule, §15.1 via op:
    * duration ordering), everything else sorts on its compiled value. */
  private def sortKey(ct: (Column, Ty)): Column = ct match {
    case (c, TyDur) => c // numeric carrier — already the §15.1 value order
    case (c, TyDurYM) => c
    case (c, _) => c
  }

  /** xsd:dayTimeDuration lexical → signed seconds (double): the value
    * carrier duration comparisons and numeric contexts read. Component
    * pulls are independent regexes (day/hour/minute/second designators
    * are unambiguous in a DAY-TIME duration — no months, so 'M' is
    * always minutes); absent components contribute 0. A NULL lexical
    * stays NULL, and a lexical OUTSIDE the dayTimeDuration grammar also
    * maps to NULL (error→unbound, mirroring the zone-less TIMEZONE
    * behavior) — without the guard a numeric or arbitrary string operand
    * reaching a duration comparison would match none of the component
    * regexes and silently compare as PT0S. The grammar check requires at
    * least one component and forbids a bare trailing 'T' (lookaheads),
    * per the XSD lexical rule. */
  private[graft] def durationSeconds(c: Column): Column = {
    def part(p: String) = {
      val x = regexp_extract(c, p, 1)
      when(x === "", lit(0.0)).otherwise(x.cast("double"))
    }
    val total = part("(\\d+)D") * 86400 + part("(\\d+)H") * 3600 +
      part("(\\d+)M") * 60 + part("(\\d+(?:\\.\\d+)?)S")
    val wellFormed = c.rlike(
      "^-?P(?=\\d|T\\d)(\\d+D)?(T(?=\\d)(\\d+H)?(\\d+M)?(\\d+(\\.\\d+)?S)?)?$")
    when(c.isNull || !wellFormed, lit(null).cast("double"))
      .otherwise(when(c.startsWith("-"), -total).otherwise(total))
  }

  /** xsd:yearMonthDuration lexical → signed months (double): the
    * [[TyDurYM]] value carrier. Same error→unbound discipline as
    * [[durationSeconds]]: a lexical outside the "±PnYnM" grammar (at
    * least one component) maps to NULL instead of silently comparing
    * as P0M. */
  private[graft] def durationMonths(c: Column): Column = {
    def part(p: String) = {
      val x = regexp_extract(c, p, 1)
      when(x === "", lit(0.0)).otherwise(x.cast("double"))
    }
    val total = part("(\\d+)Y") * 12 + part("(\\d+)M")
    val wellFormed = c.rlike("^-?P(?=\\d)(\\d+Y)?(\\d+M)?$")
    when(c.isNull || !wellFormed, lit(null).cast("double"))
      .otherwise(when(c.startsWith("-"), -total).otherwise(total))
  }

  /** Signed seconds → canonical xsd:dayTimeDuration lexical (§17
    * op:add/subtract-dayTimeDurations result rendering): components in
    * D/H/M/S order, zero components omitted, "PT0S" for the zero
    * duration. Seconds are rounded to integers — the engine's duration
    * values all come from integer-second lexicals or zone offsets, so
    * the round is exact on every path the grammar can reach. */
  private[graft] def durationLexicalOfSeconds(sec: Column): Column = {
    val a = round(abs(sec)).cast("long")
    // Column `/` is DOUBLE division even on longs — floor back to the
    // integral component count (a is non-negative, so floor = truncate)
    val d = floor(a / 86400L)
    val h = floor((a % 86400L) / 3600L)
    val mi = floor((a % 3600L) / 60L)
    val s2 = a % 60L
    val timePart = concat(
      when(h > 0, concat(h.cast("string"), lit("H"))).otherwise(lit("")),
      when(mi > 0, concat(mi.cast("string"), lit("M"))).otherwise(lit("")),
      when(s2 > 0, concat(s2.cast("string"), lit("S"))).otherwise(lit("")))
    when(sec.isNull, lit(null).cast("string"))
      .when(a === 0, lit("PT0S"))
      .otherwise(concat(
        when(sec < 0, lit("-")).otherwise(lit("")), lit("P"),
        when(d > 0, concat(d.cast("string"), lit("D"))).otherwise(lit("")),
        when(h > 0 || mi > 0 || s2 > 0, concat(lit("T"), timePart))
          .otherwise(lit(""))))
  }

  /** Signed months → canonical xsd:yearMonthDuration lexical: "PnYnM"
    * with zero components omitted, "P0M" for zero. */
  private[graft] def durationLexicalOfMonths(m: Column): Column = {
    val a = round(abs(m)).cast("long")
    val y = floor(a / 12L) // Column `/` is double division — floor back
    val mo = a % 12L
    when(m.isNull, lit(null).cast("string"))
      .when(a === 0, lit("P0M"))
      .otherwise(concat(
        when(m < 0, lit("-")).otherwise(lit("")), lit("P"),
        when(y > 0, concat(y.cast("string"), lit("Y"))).otherwise(lit("")),
        when(mo > 0, concat(mo.cast("string"), lit("M"))).otherwise(lit(""))))
  }

  /** op:add-dayTimeDuration-to-dateTime (§17 operator map, via XPath):
    * shift an xsd:dateTime lexical by signed seconds, preserving the
    * original zone suffix verbatim — a fixed-offset zone's clock face
    * shifts identically to its instant, so adding to the zone-less core
    * and re-attaching the zone is exact (no DST zones exist in the
    * lexical space: XSD zones are fixed offsets). A lexical outside the
    * dateTime grammar → NULL (error→unbound). Sub-second parts are not
    * carried (the engine's duration values are integer seconds). */
  private[graft] def dateTimePlusSeconds(dtLex: Column, sec: Column): Column = {
    val core = regexp_extract(dtLex,
      "^(\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2})", 1)
    val zone = regexp_extract(dtLex,
      "^\\d{4}-\\d{2}-\\d{2}T.*?(Z|[+-]\\d{2}:\\d{2})$", 1)
    val ts = to_timestamp(core, "yyyy-MM-dd'T'HH:mm:ss")
    val shifted = (ts.cast("long") + round(sec).cast("long")).cast("timestamp")
    when(dtLex.isNull || sec.isNull || core === "",
      lit(null).cast("string"))
      .otherwise(concat(
        date_format(shifted, "yyyy-MM-dd'T'HH:mm:ss"), zone))
  }

  /** op:add-yearMonthDuration-to-dateTime: month arithmetic on the date
    * part (day-of-month clamps to the target month's last day, the XPath
    * rule add_months shares), clock time and zone preserved. */
  private[graft] def dateTimePlusMonths(dtLex: Column, months: Column): Column = {
    val core = regexp_extract(dtLex,
      "^(\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2})", 1)
    val zone = regexp_extract(dtLex,
      "^\\d{4}-\\d{2}-\\d{2}T.*?(Z|[+-]\\d{2}:\\d{2})$", 1)
    val shifted = add_months(
      to_timestamp(core, "yyyy-MM-dd'T'HH:mm:ss").cast("date"),
      round(months).cast("int"))
    when(dtLex.isNull || months.isNull || core === "",
      lit(null).cast("string"))
      .otherwise(concat(date_format(shifted, "yyyy-MM-dd"), lit("T"),
        substring(core, 12, 8), zone))
  }

  /** §17.4.5.7 core shared by the BIND path (which renders the lexical
    * and adds the __dt companion) and plain expression position: the
    * zone of an xsd:dateTime lexical as SIGNED SECONDS (the [[TyDur]]
    * carrier) — NULL (unbound-propagating error) when zone-less or
    * malformed, per XPath fn:timezone-from-dateTime. CaseWhen keeps the
    * offset-digit casts off the 'Z'/zone-less rows (ANSI-safe: '' never
    * reaches CAST). */
  private def timezoneSecondsOf(s0: Column): Column = {
    val zone = regexp_extract(s0,
      "^\\d{4}-\\d{2}-\\d{2}T.*?(Z|[+-]\\d{2}:\\d{2})$", 1)
    val h = substring(zone, 2, 2).cast("int")
    val mi = substring(zone, 5, 2).cast("int")
    val mag = (h * 3600 + mi * 60).cast("double")
    when(s0.isNull || zone === "", lit(null).cast("double"))
      .when(zone === "Z", lit(0.0))
      .otherwise(when(substring(zone, 1, 1) === "-", -mag).otherwise(mag))
  }
  private def compileBool(e: EExpr): Column = compileE(e) match {
    case (c, TyB) => c
    // SPARQL effective boolean value of a bare variable/expression is
    // datatype-dependent; the engine's columns are untyped lexical strings,
    // so require an explicit comparison instead of guessing truthiness
    case (_, ty) => sys.error(s"expected a boolean expression, got $ty")
  }

  /** Hidden fidelity companions: a source carrying `oLang`/`oDatatype`
    * (the Quad model's term-fidelity fields, model/Rdf.scala) binds
    * `__lang_v`/`__dt_v` alongside every object variable `v`. The `__`
    * prefix keeps them out of SELECT * and BIND-mint keys; they are never
    * JOIN keys (the model joins on VALUE and carries the term struct —
    * a NULL tag on both sides must not drop rows), so on a collision the
    * first binder's companion wins. */
  private[plans] def langCol(v: String): String = s"__lang_$v"
  private[plans] def dtCol(v: String): String = s"__dt_$v"
  private[plans] def kindCol(v: String): String = s"__kind_$v"
  /** Duration-value companions: the numeric carrier a duration-typed
    * BIND stores alongside its rendered lexical, so a later
    * `xsd:dayTimeDuration(?v)` re-entry, a direct SUM/AVG/MIN/MAX over
    * the variable, or a typed ORDER BY reads the value instead of
    * re-parsing the render (see [[EDurVal]]). Flavor is part of the
    * NAME — seconds (`__dv_s_`) vs months (`__dv_m_`) — so a
    * cross-flavor constructor (`xsd:yearMonthDuration(?z)` on a
    * dayTime-typed ?z) can never misread seconds as months: it simply
    * finds no companion and falls back to the lexical path. */
  private[plans] def dvsCol(v: String): String = s"__dv_s_$v"
  private[plans] def dvmCol(v: String): String = s"__dv_m_$v"
  /** ONLY the fidelity companions are join-transparent — __anon blank-node
    * columns stay ordinary join keys (J10's correlation rides on them). */
  private def isFidelityCol(c: String): Boolean =
    c.startsWith("__lang_") || c.startsWith("__dt_") ||
      c.startsWith("__kind_") || c.startsWith("__dv_")
  /** Fill expression for a column missing from one arm of a set
    * operation (UNION arm normalization, OPTIONAL null-extension,
    * SERVICE dispatch union). Ordinary columns and the string fidelity
    * companions fill as null STRINGS (= plain term / unbound). The
    * __dv_ NUMERIC carriers must not: unionByName would widen the other
    * arm's double to string and duration value semantics (aggregates,
    * typed ORDER BY) would silently degrade to lexicographic. They fill
    * by PARSING the arm's own lexical instead — the rung-entry rule
    * applied at the set-op boundary (grammar-guarded: a non-duration or
    * null lexical parses to null DOUBLE, keeping the column numeric). */
  private def companionFill(df: DataFrame, c: String): Column =
    if (c.startsWith("__dv_s_")) {
      val v = c.stripPrefix("__dv_s_")
      if (df.columns.contains(v)) durationSeconds(col(v))
      else lit(null).cast("double")
    } else if (c.startsWith("__dv_m_")) {
      val v = c.stripPrefix("__dv_m_")
      if (df.columns.contains(v)) durationMonths(col(v))
      else lit(null).cast("double")
    } else lit(null).cast("string")
  /** Substitute [[EDurVal]] carrier reads for duration-constructor calls
    * on variables whose frame carries the `__dv_` companion. Runs at
    * each frame-aware compile site (FILTER, BIND, projection, group
    * keys, aggregate args, HAVING) immediately before compileE — after
    * every other analysis (EXISTS lifts, aggregate lifts), so no other
    * traversal ever sees the internal leaf. */
  private def rewriteDurVals(cols: Set[String], e: EExpr): EExpr = {
    def rw(x: EExpr): EExpr = x match {
      case EFn("XSD_DAYTIMEDURATION", Seq(EVar(v))) if cols(dvsCol(v)) =>
        EDurVal(v, ym = false)
      case EFn("XSD_YEARMONTHDURATION", Seq(EVar(v))) if cols(dvmCol(v)) =>
        EDurVal(v, ym = true)
      case EFn(n, as) => EFn(n, as.map(rw))
      case ENeg(a) => ENeg(rw(a))
      case EArith(op, l, r) => EArith(op, rw(l), rw(r))
      case ECmp(op, l, r) => ECmp(op, rw(l), rw(r))
      case EIn(a, vs, neg) => EIn(rw(a), vs, neg)
      case EAnd(l, r) => EAnd(rw(l), rw(r))
      case EOr(l, r) => EOr(rw(l), rw(r))
      case ENot(a) => ENot(rw(a))
      case EIf(c, t, f) => EIf(rw(c), rw(t), rw(f))
      case leaf => leaf // vars, literals, marks, EXISTS bodies (own frame)
    }
    rw(e)
  }
  private val RdfLangString =
    "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
  private val XsdString = "http://www.w3.org/2001/XMLSchema#string"
  /** The numeric XSD datatypes ISNUMERIC recognizes (§17.4.2.4 — the
    * atomic numerics plus the xsd:integer-derived family). */
  private val XsdNumeric: Seq[String] =
    Seq("integer", "decimal", "float", "double", "int", "long", "short",
      "byte", "nonNegativeInteger", "nonPositiveInteger", "negativeInteger",
      "positiveInteger", "unsignedLong", "unsignedInt", "unsignedShort",
      "unsignedByte").map("http://www.w3.org/2001/XMLSchema#" + _)

  /** Unified expression → (Column, type). SPARQL's error-propagation
    * semantics (an unbound var poisons the expression, excluding the row)
    * coincide with SQL three-valued logic here: null comparisons stay null
    * through AND/OR/NOT and filter() drops non-true rows. */
  private def compileE(e: EExpr): (Column, Ty) = e match {
    case EVar(v) => (col(v), TyS)
    case EStr(s) => (lit(s), TyS)
    // §17.3: an integer-lexical literal sits on the xsd:integer rung
    // (long — exact where double rounds); anything else on the double
    // rung. A literal past long range falls back to double, loudly exact
    // nowhere anyway.
    case ENum(lex) =>
      if (lex.matches("[+-]?[0-9]+") && scala.util.Try(lex.toLong).isSuccess)
        (lit(lex.toLong), TyI)
      else (lit(lex.toDouble), TyN)
    case ENeg(x) =>
      val c = compileE(x)
      (-asNum(c), if (c._2 == TyI) TyI else TyN)
    case EArith(op, l, r) =>
      val (lc, rc) = (compileE(l), compileE(r))
      // §17 operator-map duration arithmetic, dispatched on the typed
      // rungs BEFORE numeric promotion: the two duration subtypes never
      // mix (a month has no fixed seconds length), and a duration never
      // silently coerces to a number.
      (lc._2, rc._2, op) match {
        // op:add/subtract-dayTimeDurations → dayTimeDuration: plain
        // double arithmetic on the seconds carrier — the lexical renders
        // once, at the output boundary (emitVal)
        case (TyDur, TyDur, "+") => return (lc._1 + rc._1, TyDur)
        case (TyDur, TyDur, "-") => return (lc._1 - rc._1, TyDur)
        // op:divide-dayTimeDuration-by-dayTimeDuration → xs:decimal
        // (XPath §17 operator map): the dimensionless ratio
        case (TyDur, TyDur, "/") => return (lc._1 / rc._1, TyN)
        // op:add/subtract-yearMonthDurations → yearMonthDuration
        case (TyDurYM, TyDurYM, "+") => return (lc._1 + rc._1, TyDurYM)
        case (TyDurYM, TyDurYM, "-") => return (lc._1 - rc._1, TyDurYM)
        case (TyDurYM, TyDurYM, "/") => return (lc._1 / rc._1, TyN)
        // op:multiply/divide-dayTimeDuration (and the yearMonth twins):
        // duration × number scales the carrier; the boundary render
        // rounds to whole seconds/months per the engine's
        // integer-second duration model
        case (TyDur, TyI | TyN, "*") => return (lc._1 * asNum(rc), TyDur)
        case (TyI | TyN, TyDur, "*") => return (asNum(lc) * rc._1, TyDur)
        case (TyDur, TyI | TyN, "/") => return (lc._1 / asNum(rc), TyDur)
        case (TyDurYM, TyI | TyN, "*") =>
          return (lc._1 * asNum(rc), TyDurYM)
        case (TyI | TyN, TyDurYM, "*") =>
          return (asNum(lc) * rc._1, TyDurYM)
        case (TyDurYM, TyI | TyN, "/") =>
          return (lc._1 / asNum(rc), TyDurYM)
        // op:add-dayTimeDuration-to-dateTime and the subtract twin: the
        // non-duration side is a dateTime LEXICAL on the string rung
        // (the engine's term model) — a lexical outside the dateTime
        // grammar maps to NULL inside the helper (error→unbound)
        case (TyS, TyDur, "+") =>
          return (dateTimePlusSeconds(lc._1, rc._1), TyS)
        case (TyDur, TyS, "+") => // dateTime + on either side commutes
          return (dateTimePlusSeconds(rc._1, lc._1), TyS)
        case (TyS, TyDur, "-") =>
          return (dateTimePlusSeconds(lc._1, -rc._1), TyS)
        case (TyS, TyDurYM, "+") =>
          return (dateTimePlusMonths(lc._1, rc._1), TyS)
        case (TyDurYM, TyS, "+") =>
          return (dateTimePlusMonths(rc._1, lc._1), TyS)
        case (TyS, TyDurYM, "-") =>
          return (dateTimePlusMonths(lc._1, -rc._1), TyS)
        case (TyDur, TyDurYM, _) | (TyDurYM, TyDur, _) =>
          sys.error("dayTimeDuration and yearMonthDuration are " +
            "incomparable rungs (§17: no operator mixes them)")
        case (TyDur, _, _) | (_, TyDur, _) | (TyDurYM, _, _) |
             (_, TyDurYM, _) =>
          sys.error(s"unsupported duration arithmetic: $op (§17 defines " +
            "duration±duration, duration×÷number, duration÷duration and " +
            "dateTime±duration)")
        case _ => // numeric path below
      }
      val (ln, rn) = (asNum(lc), asNum(rc))
      // §17.3 promotion: integer op integer stays on the integer rung
      // (exact long arithmetic; ANSI mode raises on overflow rather than
      // silently wrapping). `/` always divides on the decimal rung
      // (XPath: op:numeric-divide of two integers is decimal) — double
      // here. Any non-integer operand promotes the result to double.
      val bothInt = lc._2 == TyI && rc._2 == TyI
      op match {
        case "+" => (ln + rn, if (bothInt) TyI else TyN)
        case "-" => (ln - rn, if (bothInt) TyI else TyN)
        case "*" => (ln * rn, if (bothInt) TyI else TyN)
        case "/" => ((if (bothInt) ln.cast("double") else ln) / rn, TyN)
        case other => sys.error(s"unsupported arithmetic operator: $other")
      }
    case ECmp(op, l, r) =>
      val (lc, rc) = (compileE(l), compileE(r))
      // a duration side forces a duration-VALUE comparison (both sides
      // through the seconds carrier — lexical would order "PT10H" below
      // "PT2H"); a numeric side forces a numeric comparison; otherwise
      // lexical (the ISO-string date ordering). Both sides on the
      // integer rung compare as longs (exact past 2^53); a mixed numeric
      // pair promotes to double per §17.3.
      // a duration-typed side is ALREADY its numeric carrier; a lexical
      // (TyS) side facing a duration parses once here (error→unbound on
      // a malformed lexical, same as every rung entry)
      def durSec(ct: (Column, Ty)): Column = ct match {
        case (c, TyDur) => c
        case other => durationSeconds(asStr(other))
      }
      def durMo(ct: (Column, Ty)): Column = ct match {
        case (c, TyDurYM) => c
        case other => durationMonths(asStr(other))
      }
      val (a, b) =
        if (lc._2 == TyDur || rc._2 == TyDur)
          (durSec(lc), durSec(rc))
        else if (lc._2 == TyDurYM || rc._2 == TyDurYM)
          (durMo(lc), durMo(rc))
        else if (lc._2 == TyI && rc._2 == TyI) (lc._1, rc._1)
        else if (lc._2.isInstanceOf[TyNum] || rc._2.isInstanceOf[TyNum])
          (asNum(lc), asNum(rc))
        else (lc._1, rc._1)
      (op match {
        case "<" => a < b
        case ">" => a > b
        case "<=" => a <= b
        case ">=" => a >= b
        case "=" => a === b
        case "!=" => a =!= b
        case other => sys.error(s"unsupported comparison: $other")
      }, TyB)
    case EIn(x, vals, negated) =>
      val c = asStr(compileE(x)).isin(vals: _*)
      (if (negated) !c else c, TyB)
    case EAnd(l, r) => (compileBool(l) && compileBool(r), TyB)
    case EOr(l, r) => (compileBool(l) || compileBool(r), TyB)
    case ENot(x) => (!compileBool(x), TyB)
    case EBound(v) => (col(v).isNotNull, TyB)
    case EIf(c, t, f) =>
      val (tc, fc) = (compileE(t), compileE(f))
      // branches of one type keep it; two numeric rungs promote to
      // double (§17.3); otherwise-mixed branches unify as strings
      val (tv, fv, ty) =
        if (tc._2 == fc._2) (tc._1, fc._1, tc._2)
        else if (tc._2.isInstanceOf[TyNum] && fc._2.isInstanceOf[TyNum])
          (asNum(tc).cast("double"), asNum(fc).cast("double"), TyN)
        else (asStr(tc), asStr(fc), TyS)
      // §17.6: IF errors when the condition's EBV errors — a NULL
      // condition (unbound operand, type error) must yield unbound, NOT
      // the else branch (`otherwise` would swallow the error). Two
      // complementary whens leave the null case null.
      val cv = compileBool(c)
      (when(cv, tv).when(!cv, fv), ty)
    case EFn(fn, args) => compileFn(fn, args)
    case EMark(name) => (col(name), TyB)
    // carrier read: the parse∘render identity skipped (see EDurVal)
    case EDurVal(v, ym) =>
      if (ym) (col(dvmCol(v)), TyDurYM) else (col(dvsCol(v)), TyDur)
    case _: EExists =>
      // lifted to EMark columns by the FILTER/BIND/projection/GROUP BY/
      // HAVING/ORDER BY compilers before compileE ever sees the expression
      sys.error("internal: EExists reached compileE without a mark lift")
    case _: EAgg =>
      // lifted to hidden columns by the HAVING/ORDER BY compilers
      sys.error("aggregate calls are only legal in HAVING or in ORDER " +
        "BY of a grouped query")
  }

  /** A literal-string argument (REGEX patterns, REPLACE arguments,
    * STRBEFORE/STRAFTER needles — positions the engine compiles to
    * pattern literals, where a computed value cannot reach codegen'd
    * builtins). */
  private def litStr(fn: String, e: EExpr): String = e match {
    case EStr(s) => s
    case other => sys.error(s"$fn expects a string literal here, got $other")
  }

  private def compileFn(fn: String, args: Seq[EExpr]): (Column, Ty) = {
    def a0 = compileE(args.head)
    fn match {
      case "STR" => (asStr(a0), TyS) // identity on lexical columns
      // §17.5 constructor casts. xsd:integer lands on the EXACT long
      // rung: from a numeric it truncates toward zero (XPath fn rules);
      // from a lexical it parses — an invalid integer lexical aborts
      // loudly under ANSI, matching XPath's cast error. decimal/float/
      // double all land on the engine's double rung (see Ty scaladoc).
      case "XSD_INTEGER" => a0 match {
        case (c, TyI) => (c, TyI)
        case (c, TyN) => (c.cast("long"), TyI)
        case (c, TyS) => (c.cast("long"), TyI)
        case (_, TyB) => sys.error("xsd:integer of a boolean expression " +
          "is unsupported (the term model has no boolean literals)")
        case (_, TyDur | TyDurYM) => sys.error("xsd:integer of a duration " +
          "is undefined (§17.5 has no duration→integer cast)")
      }
      case "XSD_DECIMAL" | "XSD_DOUBLE" | "XSD_FLOAT" =>
        (asNum(a0).cast("double"), TyN)
      case "XSD_STRING" => (asStr(a0), TyS)
      // the duration rung's entry point: typed duration literals parse
      // to this constructor, and data-bound lexicals cast onto it — the
      // ONE place a dayTimeDuration lexical parses to its seconds
      // carrier (a literal argument constant-folds at planning)
      case "XSD_DAYTIMEDURATION" => a0 match {
        case (c, TyDur) => (c, TyDur) // already on the rung
        case other => (durationSeconds(asStr(other)), TyDur)
      }
      // the yearMonth rung's twin entry point (months carrier)
      case "XSD_YEARMONTHDURATION" => a0 match {
        case (c, TyDurYM) => (c, TyDurYM)
        case other => (durationMonths(asStr(other)), TyDurYM)
      }
      case "XSD_BOOLEAN" =>
        val s = asStr(a0)
        (when(lower(s).isin("true", "1"), lit(true))
          .when(lower(s).isin("false", "0"), lit(false))
          .otherwise(lit(null).cast("boolean")), TyB)
      case "STRLEN" => (length(asStr(a0)).cast("double"), TyN)
      case "UCASE" => (upper(asStr(a0)), TyS)
      case "LCASE" => (lower(asStr(a0)), TyS)
      case "SUBSTR" =>
        // SPARQL §17.4.3.3: 1-based start, optional length (same as SQL)
        val start = asNum(compileE(args(1))).cast("int")
        val len =
          if (args.length > 2) asNum(compileE(args(2))).cast("int")
          else lit(Int.MaxValue)
        (asStr(a0).substr(start, len), TyS)
      case "CONCAT" => (concat(args.map(x => asStr(compileE(x))): _*), TyS)
      case "CONTAINS" => (asStr(a0).contains(asStr(compileE(args(1)))), TyB)
      case "STRSTARTS" => (asStr(a0).startsWith(asStr(compileE(args(1)))), TyB)
      case "STRENDS" => (asStr(a0).endsWith(asStr(compileE(args(1)))), TyB)
      case "STRBEFORE" =>
        // SPARQL §17.4.3.4: empty string when the needle does not occur
        val needle = litStr(fn, args(1))
        val s = asStr(a0)
        val pos = locate(needle, s)
        (when(pos > 0, s.substr(lit(1), pos - 1)).otherwise(lit("")), TyS)
      case "STRAFTER" =>
        val needle = litStr(fn, args(1))
        val s = asStr(a0)
        val pos = locate(needle, s)
        (when(pos > 0, s.substr(pos + needle.length, lit(Int.MaxValue)))
          .otherwise(lit("")), TyS)
      case "REPLACE" =>
        // SPARQL REPLACE is regex-based (§17.4.3.5)
        (regexp_replace(asStr(a0), litStr(fn, args(1)), litStr(fn, args(2))), TyS)
      case "REGEX" =>
        val pat0 = litStr(fn, args(1))
        val flags = if (args.length > 2) litStr(fn, args(2)) else ""
        // XPath flags map onto Java regex embedded flags
        val embedded = flags.flatMap {
          case 'i' => "i"
          case 's' => "s"
          case 'm' => "m"
          case 'x' => "x"
          case f => sys.error(s"unsupported REGEX flag '$f'")
        }
        val pat = if (embedded.nonEmpty) s"(?$embedded)$pat0" else pat0
        (asStr(a0).rlike(pat), TyB)
      // hash builtins (§17.4.4.11–15): lowercase hex in both engines
      case "MD5" => (md5(asStr(a0)), TyS)
      case "SHA1" => (sha1(asStr(a0)), TyS)
      case "SHA256" => (sha2(asStr(a0), 256), TyS)
      case "SHA384" => (sha2(asStr(a0), 384), TyS)
      case "SHA512" => (sha2(asStr(a0), 512), TyS)
      case "ENCODE_FOR_URI" =>
        // §17.4.3.12 percent-encodes every char outside [A-Za-z0-9_.~-]
        // (UTF-8, uppercase hex). url_encode is the codegen'd
        // form-encoding variant; three fixed rewrites close the gap:
        // its '+' means space (a literal '+' became %2B), it leaves '*'
        // bare (RFC 3986 sub-delim — must encode), and it encodes '~'
        // (unreserved — must stay bare).
        (regexp_replace(regexp_replace(regexp_replace(
          url_encode(asStr(a0)),
          "\\+", "%20"), "\\*", "%2A"), "%7E", "~"), TyS)
      case "ABS" => (abs(asNum(a0)), TyN)
      case "ROUND" => (round(asNum(a0)).cast("double"), TyN)
      case "CEIL" => (ceil(asNum(a0)).cast("double"), TyN)
      case "FLOOR" => (floor(asNum(a0)).cast("double"), TyN)
      // date accessors over the engine's ISO-string date columns
      case "YEAR" => (year(to_date(asStr(a0))).cast("double"), TyN)
      case "MONTH" => (month(to_date(asStr(a0))).cast("double"), TyN)
      case "DAY" => (dayofmonth(to_date(asStr(a0))).cast("double"), TyN)
      // time accessors (§17.4.5.5-8): LEXICAL component extraction, not
      // timestamp parsing — to_timestamp would renormalize a zoned
      // literal into the session zone and change the hour, but SPARQL's
      // accessors return the components AS WRITTEN. Regex pulls keep the
      // zone intact, stay codegen'd, and yield NULL (an unbound-propagating
      // error per §17.2) when the lexical form has no time part.
      // anchored to the full xsd:dateTime lexical shape: an unanchored
      // pull would extract "20" from the plain literal "BERT2020" and
      // keep a row §17.4.5.5 calls a type error — anchoring makes
      // malformed input NULL (unbound), matching YEAR/to_date behavior
      case "HOURS" =>
        (timePart(asStr(a0), "^\\d{4}-\\d{2}-\\d{2}T(\\d{2})"), TyN)
      case "MINUTES" =>
        (timePart(asStr(a0), "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:(\\d{2})"), TyN)
      case "SECONDS" =>
        (timePart(asStr(a0),
          "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:(\\d{2}(?:\\.\\d+)?)"), TyN)
      // TZ (§17.4.5.8) returns the timezone as a SIMPLE STRING — "Z", a
      // "+hh:mm" offset, or "" when the literal carries none (unlike
      // TIMEZONE, which raises on a zone-less value and lands on the
      // duration rung — see the TIMEZONE case below).
      case "TZ" =>
        (regexp_extract(asStr(a0),
          "^\\d{4}-\\d{2}-\\d{2}T.*?(Z|[+-]\\d{2}:\\d{2})$", 1), TyS)
      case "COALESCE" =>
        val cs = args.map(compileE)
        // uniform numeric args stay numeric; anything mixed unifies lexical
        if (cs.forall(_._2 == TyI)) (coalesce(cs.map(_._1): _*), TyI)
        else if (cs.forall(_._2.isInstanceOf[TyNum]))
          (coalesce(cs.map(c => asNum(c).cast("double")): _*), TyN)
        else (coalesce(cs.map(asStr): _*), TyS)
      // ---- term fidelity (§17.4.2): reads the hidden __lang_/__dt_
      // companion columns a fidelity-carrying source binds alongside each
      // object variable (and BIND(STRLANG/STRDT) creates). A variable
      // bound WITHOUT companions fails loudly at analysis with the
      // companion column's name. The engine's value model carries no term
      // type, so LANG/DATATYPE of an IRI-valued variable answer as for a
      // simple literal (""/xsd:string) instead of erroring.
      case "LANG" => args.head match {
        case EVar(v) => (coalesce(col(langCol(v)), lit("")), TyS)
        case other => sys.error(s"LANG expects a variable, got $other")
      }
      case "DATATYPE" => args.head match {
        case EVar(v) => (coalesce(col(dtCol(v)),
          when(col(langCol(v)).isNotNull, lit(RdfLangString))
            .otherwise(lit(XsdString))), TyS)
        case other => sys.error(s"DATATYPE expects a variable, got $other")
      }
      // §17.4.3.1 in any boolean position (the scan-attached LangM fast
      // path handles the bare FILTER(langmatches(lang(?v), "t")) shape;
      // composite expressions land here) — same RFC 4647 basic filtering
      case "LANGMATCHES" =>
        (langMatchesPred(asStr(a0), asStr(compileE(args(1)))), TyB)
      // ---- term-kind predicates (§17.4.2.1–4): read the __kind_
      // companion a kind-carrying source (the Quad model's oType — e.g. a
      // TurtleParser load, which knows iri/literal/bnode) binds
      // alongside each object variable. A store without kinds fails
      // loudly at analysis with the companion column's name — the
      // engine never guesses a term's kind from its lexical form.
      case "ISIRI" | "ISURI" => args.head match {
        case EVar(v) => (col(kindCol(v)) === "iri", TyB)
        case other => sys.error(s"$fn expects a variable, got $other")
      }
      case "ISLITERAL" => args.head match {
        case EVar(v) => (col(kindCol(v)) === "literal", TyB)
        case other => sys.error(s"$fn expects a variable, got $other")
      }
      case "ISBLANK" => args.head match {
        case EVar(v) => (col(kindCol(v)) === "bnode", TyB)
        case other => sys.error(s"$fn expects a variable, got $other")
      }
      case "ISNUMERIC" => args.head match {
        // a typed literal with a numeric XSD datatype; NULL datatype
        // (plain/lang-tagged literal, IRI, bnode) answers false
        case EVar(v) =>
          (coalesce(col(dtCol(v)).isin(XsdNumeric: _*), lit(false)), TyB)
        case other => sys.error(s"$fn expects a variable, got $other")
      }
      // §17.4.1.8: term identity = value identity AND tag identity. The
      // value side uses ordinary equality (null poisons, excluding the
      // row — SPARQL unbound-error semantics); the tag sides use
      // null-SAFE equality so plain-vs-plain (both tags NULL) is
      // identical while plain-vs-tagged is not. Variable args read their
      // lang/datatype companions (loud at analysis on a plain store,
      // like LANG); literal/expression args carry NULL tags (a simple
      // literal). Term KIND does not participate — the value model's
      // known limit (an IRI and a lexically-identical untagged literal
      // compare same-term, as under LANG/DATATYPE).
      case "SAMETERM" =>
        def tags(e: EExpr): (Column, Column) = e match {
          case EVar(v) => (col(langCol(v)), col(dtCol(v)))
          case _ => (lit(null).cast("string"), lit(null).cast("string"))
        }
        val (va, vb) = (asStr(a0), asStr(compileE(args(1))))
        val (la, da) = tags(args.head)
        val (lb, db) = tags(args(1))
        ((va === vb) && (la <=> lb) && (da <=> db), TyB)
      // §17.4.2.8 in plain expression position: the VALUE passes through
      // (the engine's columns hold lexical forms; an IRI term is its
      // string). Runtime resolution of RELATIVE references against BASE
      // is not attempted — the argument is expected absolute, the
      // overwhelmingly common IRI(CONCAT("http://…", ?x)) shape. The
      // kind tag only exists where a term can carry one: the BIND form.
      case "IRI" | "URI" => (asStr(a0), TyS)
      case "BNODE" => sys.error(
        "BNODE is supported as the top-level expression of BIND only " +
          "(the engine mints a deterministic per-solution surrogate there, " +
          "SURVEY §7.3 nondeterminism policy)")
      // §17.4.5.7 in plain expression position: the zone offset enters
      // the duration rung directly as its SECONDS carrier (no lexical
      // detour — comparisons and arithmetic read the number; a
      // projection/BIND renders the lexical at the boundary). The BIND
      // form additionally tags the bound variable's __dt companion.
      case "TIMEZONE" =>
        (timezoneSecondsOf(asStr(a0).cast("string")), TyDur)
      case "STRLANG" | "STRDT" => sys.error(
        s"$fn is supported as the top-level expression of BIND only " +
          "(the constructed term's tag rides in hidden fidelity columns)")
      case other => sys.error(s"unsupported function: $other")
    }
  }

  /** Property-path pattern compile (J4/J5 shapes).
    *
    * Supported shapes, by scalability:
    *   - `…/p*` with a CONSTANT object: the prefix chain joins filtered
    *     triple scans, the starred tail is the seeded semi-naive
    *     [[Closure.reachingTo]] (frontier-broadcast, checkpointed) — the
    *     100 TB shape.
    *   - a single `p*` step with a VARIABLE object: full transitive closure
    *     pairs + reflexive pairs over the p-edge node domain. Correct but
    *     quadratic-ish in the edge graph; fine for vocabulary-sized
    *     hierarchies (the city query's P279 use), not for instance data.
    */
  private def compilePath(sT: Term, path: Path, oT: Term,
                          triples: DataFrame, memo: FunctMemo): DataFrame = {
    // One step's edge relation: the union of its alternatives, each an
    // s→o scan (or o→s for `^p` inverse primaries); a negated property set
    // is ONE scan over the complement predicate filter (forward-only,
    // enforced at parse)
    val srcHash = triples.queryExecution.analyzed.semanticHash()
    def edgesOfStep(st: PStep): DataFrame =
      if (st.seqAlts.nonEmpty) {
        // grouped '/'-sequence arms — `(p/q)|r`, `(P31/P279*)` — the
        // step's relation is the union over arms of the COMPOSED member
        // relations: each arm joins its members head-to-tail
        // ((src,mid)⋈(mid,dst) → (src,dst)). A '+'/'*' member composes
        // its TRANSITIVE pairs; the zero-length part of '*'/'?' members
        // composes as IDENTITY — algebraically, so `p/q*` becomes
        // p ∪ p∘q⁺ and no zero-hop node domain is ever materialized
        // inside an arm. (A fully zero-admitting arm makes the whole
        // step zero-admitting — folded into the step modifier by the
        // normalization in compilePath, see stepAdmitsZero.) Each
        // composition join shuffles on the shared node key like any BGP
        // self-join; step modifiers then see one (src,dst) relation, so
        // `(p/q)*` runs the same semi-naive closure as a
        // single-predicate star.
        st.seqAlts.map { arm =>
          arm.map { case (p, inv, mmod) =>
            val e = triples.filter(col("p") === p)
            val scan =
              if (inv) e.select(col("o").as("src"), col("s").as("dst"))
              else e.select(col("s").as("src"), col("o").as("dst"))
            val rel = mmod match {
              case "" | "?" => scan
              case _ => // '+' | '*': transitive pairs of the member scan
                Closure.ancestorPairs(scan,
                    functionalEdges = funct(PStep(Seq((p, inv)), "*")))
                  .select(col("node").as("src"), col("anc").as("dst"))
            }
            (rel, mmod == "*" || mmod == "?") // (pairs, admits zero?)
          }.reduce[(DataFrame, Boolean)] { case ((ra, ida), (rb, idb)) =>
            val l = ra.select(col("src"), col("dst").as("__mid"))
            val r = rb.select(col("src").as("__mid2"), col("dst"))
            val comp = l.join(r, col("__mid") === col("__mid2"))
              .select(col("src"), col("dst"))
            // identity members drop out of the composition: id∘R = R
            val withIds = Seq(Some(comp), if (idb) Some(ra) else None,
              if (ida) Some(rb) else None).flatten.reduce(_ unionByName _)
            (withIds, ida && idb)
          }._1
        }.reduce(_ unionByName _)
      } else if (st.negated) {
        // §9.1: !(p1|…|^q1|…) = forward triples with predicate outside
        // {p1…} UNION reversed triples with predicate outside {q1…} —
        // each complement present only when its side has members
        val (invM, fwdM) = st.alts.partition(_._2)
        val fwd =
          if (fwdM.isEmpty) None
          else Some(triples.filter(!col("p").isin(fwdM.map(_._1): _*))
            .select(col("s").as("src"), col("o").as("dst")))
        val inv =
          if (invM.isEmpty) None
          else Some(triples.filter(!col("p").isin(invM.map(_._1): _*))
            .select(col("o").as("src"), col("s").as("dst")))
        (fwd.toSeq ++ inv.toSeq).reduce(_ unionByName _)
      } else st.alts.map { case (p, inv) =>
        val e = triples.filter(col("p") === p)
        if (inv) e.select(col("o").as("src"), col("s").as("dst"))
        else e.select(col("s").as("src"), col("o").as("dst"))
      }.reduce(_ unionByName _)
    // The front-end cannot PROMISE an arbitrary predicate's edge relation
    // is a forest, but it can verify with a one-job probe — unlocking the
    // closure's two-hop no-anti-join fast path for containment-shaped
    // data (one aggregate now vs one anti-join shuffle per round). The
    // per-compile memo dedups within one query; the session-level cache
    // (keyed by the SEMANTIC hash of the triple source's analyzed plan)
    // dedups across queries — the same predicate over the same source
    // never pays the probe twice in a session. A stale entry (data
    // rewritten under an identical plan mid-session) can only cost
    // performance, never correctness: the functional path's cycle guard
    // and terminal distinct keep non-forest inputs exact.
    // per-compile memo keyed by SOURCE hash too: one compile can span
    // several stores (SERVICE bodies, graph-tagged views), and a
    // same-shaped path over a different store must re-probe
    def funct(st: PStep): Boolean =
      memo.getOrElseUpdate((srcHash, st.alts, st.negated, st.seqAlts), {
        val key = (srcHash, st.alts, st.negated, st.seqAlts)
        val cached = functCache.get(key)
        if (cached != null) cached.booleanValue()
        else {
          val r = Closure.isFunctional(edgesOfStep(st))
          if (functCache.size > 1024) functCache.clear() // bounded
          functCache.put(key, r)
          r
        }
      })
    def constOf(t: Term): Option[String] = t match {
      case C(v) => Some(v)
      case L(v) => Some(v)
      case _ => None
    }
    val spark = triples.sparkSession
    // A group arm whose members ALL admit zero — `(p?/q*)`, `(p*)` —
    // makes the whole step zero-admitting (the all-identity composition
    // is the identity relation, which edgesOfStep deliberately leaves
    // out). Fold that into the step modifier: "" gains the zero-hop of
    // '?', '+' becomes '*'; '*'/'?' already admit zero. The zero-hop
    // domain is then the normalized step's edge-node set — the engine's
    // documented var-var domain policy, applied consistently.
    def stepAdmitsZero(st: PStep): Boolean =
      st.seqAlts.exists(_.forall(m => m._3 == "*" || m._3 == "?"))
    val steps = path.steps.map { st =>
      if (!stepAdmitsZero(st)) st
      else st.mod match {
        case ""  => st.copy(mod = "?")
        case "+" => st.copy(mod = "*")
        case _   => st
      }
    }

    // (a, cur) relation after walking the steps from a variable subject
    val rel: DataFrame = (steps, constOf(oT)) match {
      case (Seq(st @ PStep(_, "*", _, _)), Some(const)) =>
        // `?x p* <c>` → seeded reach, includes the seed (reflexive)
        Closure.reachingTo(edgesOfStep(st),
            spark.range(1).select(lit(const).as("node")),
            functionalEdges = funct(st))
          .select(col("node").as("__a"), lit(const).as("__b"))
      case (init :+ (last @ PStep(_, "*", _, _)), Some(const))
          if init.forall(_.mod == "") =>
        // `p1/…/pk*  <c>` (star-free prefix) → chain the prefix, semi-join
        // the reach set
        val reach = Closure.reachingTo(edgesOfStep(last),
          spark.range(1).select(lit(const).as("node")),
          functionalEdges = funct(last))
        val prefix = chain(init.map(edgesOfStep))
        // the reach semi-join IS the object constraint — __b carries the
        // path's endpoint (the constant), not the prefix endpoint
        prefix.join(reach, prefix("__cur") === reach("node"), "left_semi")
          .select(col("__a"), lit(const).as("__b"))
      case (Seq(st @ PStep(_, "*", _, _)), None) =>
        // `?a p* ?b` → transitive pairs + reflexive over the edge domain;
        // a CONSTANT subject joins the zero-hop domain even when it has no
        // p-edges (SPARQL: `<A> p* ?b` always yields the zero-length A→A)
        val e = edgesOfStep(st)
        val nodes = constOf(sT).map(c =>
            spark.range(1).select(lit(c).as("node")))
          .foldLeft(e.select(col("src").as("node"))
            .unionByName(e.select(col("dst").as("node"))))(_ unionByName _)
          .distinct()
        Closure.ancestorPairs(e, functionalEdges = funct(st))
          .select(col("node").as("__a"), col("anc").as("__b"))
          .unionByName(nodes.select(col("node").as("__a"), col("node").as("__b")))
      case _ =>
        // General walk — any modifier at any step. A `*` step applies its
        // relation's transitive pairs to the running relation and keeps
        // the zero-hop rows (union); `+` applies only the transitive
        // pairs; `?` unions a single optional hop. LEADING `*`/`?` over a
        // variable subject use the edge-domain reflexive pairs (the
        // documented var-var domain choice above). Modifier-free
        // sequences reduce to the same chained filtered scans as before.
        steps.foldLeft(Option.empty[DataFrame]) { (acc, st) =>
          val e = edgesOfStep(st)
          def trans() = Closure.ancestorPairs(e, functionalEdges = funct(st))
          // zero-hop domain for a LEADING `*`/`?`: the step's edge nodes,
          // plus any constant subject/object term of the whole path — a
          // constant with no edges of this predicate still has the
          // zero-length path to itself
          def domainNodes() = (constOf(sT).toSeq ++ constOf(oT).toSeq)
            .map(c => spark.range(1).select(lit(c).as("node")))
            .foldLeft(e.select(col("src").as("node"))
              .unionByName(e.select(col("dst").as("node"))))(_ unionByName _)
            .distinct()
          Some(acc match {
            case None => st.mod match {
              case "" | "+" =>
                val one = e.select(col("src").as("__a"), col("dst").as("__cur"))
                if (st.mod == "+")
                  trans().select(col("node").as("__a"), col("anc").as("__cur"))
                else one
              case "*" | "?" =>
                val zero = domainNodes()
                  .select(col("node").as("__a"), col("node").as("__cur"))
                val more =
                  if (st.mod == "*")
                    trans().select(col("node").as("__a"), col("anc").as("__cur"))
                  else e.select(col("src").as("__a"), col("dst").as("__cur"))
                zero.unionByName(more)
            }
            case Some(r) =>
              val oneHop = {
                val rn = e.select(col("src").as("__cur0"), col("dst").as("__next"))
                r.join(rn, r("__cur") === rn("__cur0"))
                  .select(r("__a"), col("__next").as("__cur"))
              }
              lazy val manyHops = {
                val tp = trans()
                  .select(col("node").as("__cur0"), col("anc").as("__next"))
                r.join(tp, r("__cur") === tp("__cur0"))
                  .select(r("__a"), col("__next").as("__cur"))
              }
              st.mod match {
                case "" => oneHop
                case "+" => manyHops
                case "?" => r.unionByName(oneHop)
                case _ => r.unionByName(manyHops)
              }
          })
        }.getOrElse(sys.error("empty path")).withColumnRenamed("__cur", "__b")
    }

    // bind subject/object variables, filter constants
    var outRel = rel
    val projected = Vector.newBuilder[Column]
    sT match {
      case V(v) => projected += col("__a").as(v)
      case C(v) => outRel = outRel.filter(col("__a") === v)
      case L(v) => outRel = outRel.filter(col("__a") === v)
    }
    oT match {
      case V(v) => projected += col("__b").as(v)
      case C(v) => outRel = outRel.filter(col("__b") === v)
      case L(v) => outRel = outRel.filter(col("__b") === v)
    }
    outRel.select(projected.result(): _*).distinct()
  }

  /** Left-to-right join of star-free path steps: (__a, __cur) after
    * traversing each step's edge relation. */
  private def chain(frames: Seq[DataFrame]): DataFrame =
    frames.foldLeft(Option.empty[DataFrame]) { (accRel, e) =>
      val step = e.select(col("src").as("__a"), col("dst").as("__cur"))
      accRel match {
        case None => Some(step)
        case Some(r) =>
          val rn = step.select(col("__a").as("__cur0"), col("__cur").as("__next"))
          Some(r.join(rn, r("__cur") === rn("__cur0"))
            .select(r("__a"), rn("__next").as("__cur")))
      }
    }.getOrElse(sys.error("empty path"))
}
