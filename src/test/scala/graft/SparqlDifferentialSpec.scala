package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.plans.SparqlText

/** Differential testing of the SPARQL compiler: randomly generated
  * BGP + FILTER + OPTIONAL + UNION queries evaluate both through the
  * Spark compiler and through an independent, deliberately naive
  * in-memory evaluator implementing the SPARQL algebra directly
  * (multiset join / left-join / union over binding maps, §8). Any
  * disagreement is a bug in one of the two — and the naive side is
  * ~60 lines of obviously-correct Scala, so in practice it arbitrates.
  *
  * This is the correctness net UNDER the oracle suite: DuckDB oracles
  * pin 181 curated queries; this pins the combinatorial space around
  * the join/optional/union semantics the curated set can't enumerate.
  */
class SparqlDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private type Binding = Map[String, String]

  // ---- naive reference evaluator (SPARQL §8 algebra over multisets) ----

  private def evalPattern(store: Seq[(String, String, String)],
                          s: Either[String, String], p: String,
                          o: Either[String, String]): Seq[Binding] =
    store.filter(t => t._2 == p)
      .flatMap { t =>
        val b0: Option[Binding] = Some(Map.empty)
        val b1 = s match {
          case Left(const) => if (t._1 == const) b0 else None
          case Right(v)    => b0.map(_ + (v -> t._1))
        }
        val b2 = o match {
          case Left(const) => if (t._3 == const) b1 else None
          case Right(v) => b1.flatMap { m =>
            m.get(v) match {
              case Some(x) if x != t._3 => None
              case _                    => Some(m + (v -> t._3))
            }
          }
        }
        b2
      }

  private def compatible(a: Binding, b: Binding): Boolean =
    a.keySet.intersect(b.keySet).forall(k => a(k) == b(k))

  private def join(l: Seq[Binding], r: Seq[Binding]): Seq[Binding] =
    for (a <- l; b <- r if compatible(a, b)) yield a ++ b

  private def leftJoin(l: Seq[Binding], r: Seq[Binding]): Seq[Binding] =
    l.flatMap { a =>
      val matches = r.filter(compatible(a, _)).map(a ++ _)
      if (matches.nonEmpty) matches else Seq(a)
    }

  // ---- random query model ----

  private case class Pat(s: Either[String, String], p: String,
                         o: Either[String, String]) {
    def text: String = {
      def t(x: Either[String, String]) = x.fold(c => s"<$c>", v => s"?$v")
      s"${t(s)} <$p> ${t(o)} ."
    }
  }
  private case class Q(base: List[Pat], union2: Option[List[Pat]],
                       opt: List[Pat], filterVar: Option[String]) {
    def text: String = {
      val core = base.map(_.text).mkString(" ")
      val block = union2 match {
        case Some(arm) => s"{ $core } UNION { ${arm.map(_.text).mkString(" ")} }"
        case None      => core
      }
      val optTxt =
        if (opt.isEmpty) "" else s" OPTIONAL { ${opt.map(_.text).mkString(" ")} }"
      val fil = filterVar.fold("")(v => s""" FILTER(STRSTARTS(?$v, "n"))""")
      s"SELECT * WHERE { $block$optTxt$fil }"
    }
    def vars: Seq[String] = {
      val all = (base ++ union2.getOrElse(Nil) ++ opt)
        .flatMap(p => p.s.toSeq ++ p.o.toSeq)
      all.distinct
    }
  }

  private def evalRef(store: Seq[(String, String, String)], q: Q): Seq[Binding] = {
    def evalBgp(ps: List[Pat]): Seq[Binding] =
      ps.foldLeft(Seq[Binding](Map.empty)) { (acc, p) =>
        join(acc, evalPattern(store, p.s, p.p, p.o))
      }
    val core = q.union2 match {
      case Some(arm) => evalBgp(q.base) ++ evalBgp(arm)
      case None      => evalBgp(q.base)
    }
    val opted = if (q.opt.isEmpty) core else leftJoin(core, evalBgp(q.opt))
    q.filterVar match {
      // SPARQL error semantics: an unbound var poisons the filter → drop
      case Some(v) => opted.filter(b => b.get(v).exists(_.startsWith("n")))
      case None    => opted
    }
  }

  // ---- the differential run ----

  test("random BGP/UNION/OPTIONAL/FILTER queries agree with a naive " +
      "algebra evaluator (multiset-exact)") {
    // store over a small vocab so joins actually hit; includes a
    // duplicate-producing shape (two triples with same s/p) and dead ends
    val nodes = Seq("n1", "n2", "n3", "m4", "m5")
    val preds = Seq("p", "q", "r")
    val storeGen: Gen[Seq[(String, String, String)]] =
      Gen.listOfN(24, Gen.zip(Gen.oneOf(nodes), Gen.oneOf(preds),
        Gen.oneOf(nodes))).map(_.distinct)

    val varNames = Seq("a", "b", "c")
    val termGen: Gen[Either[String, String]] = Gen.frequency(
      3 -> varNames.map(v => Right(v): Either[String, String])
        .map(Gen.const).reduce(Gen.oneOf(_, _)),
      1 -> Gen.oneOf(nodes).map(Left(_): Either[String, String]))
    val patGen: Gen[Pat] =
      Gen.zip(termGen, Gen.oneOf(preds), termGen).map(Pat.tupled)
    // base patterns must be connected enough to avoid cross joins the
    // engine plans fine but the naive side makes O(n^k): keep them short
    val qGen: Gen[Q] = for {
      base <- Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, patGen))
      hasU <- Gen.oneOf(true, false)
      uArm <- Gen.listOfN(1, patGen)
      opt  <- Gen.frequency(1 -> Gen.listOfN(1, patGen),
                            1 -> Gen.const(List.empty[Pat]))
      fv   <- Gen.oneOf(None, Some("a"), Some("b"))
    } yield {
      // the filter var must be bound by the patterns that actually run
      val active = base ++ (if (hasU) uArm else Nil)
      Q(base, if (hasU) Some(uArm) else None, opt,
        fv.filter(v => active.exists(p =>
          p.s == Right(v) || p.o == Right(v))))
    }

    var ran = 0
    (0 until 300).foreach { i =>
      val seed = Seed(1234L + i)
      val params = Gen.Parameters.default
      (for {
        store <- storeGen.apply(params, seed)
        q <- qGen.apply(params, seed.next)
      } yield (store, q)).foreach { case (store, q) =>
        // UNION arms must bind the same projected vars on both sides for
        // the engine's unionByName; skip mismatched-arm draws (the engine
        // null-extends subject-position fidelity only) — the reference
        // query surface always projects aligned arms
        val armsAligned = q.union2.forall { arm =>
          arm.flatMap(p => p.s.toSeq ++ p.o.toSeq).toSet ==
            q.base.flatMap(p => p.s.toSeq ++ p.o.toSeq).toSet
        }
        // OPTIONAL requires a shared variable with the base in the engine
        val optShares = q.opt.isEmpty ||
          q.opt.flatMap(p => p.s.toSeq ++ p.o.toSeq)
            .exists(q.base.flatMap(p => p.s.toSeq ++ p.o.toSeq).contains)
        // ?a <p> ?a would project one variable from two positions — the
        // engine binds it as two same-named columns; out of model scope
        val noSelfVar = (q.base ++ q.union2.getOrElse(Nil) ++ q.opt)
          .forall(p => !(p.s.isRight && p.s == p.o))
        whenever(armsAligned && optShares && noSelfVar && q.base.nonEmpty) {
          val triples = store.toDF("s", "p", "o")
          val labels = Seq(("x", "en", "y")).toDF("entity", "lang", "label")
          val got =
            try SparqlText.run(q.text, triples, labels)
            catch {
              // engine policy refusals (disconnected OPTIONAL etc.) are
              // legal outcomes, not disagreements — skip those draws
              case e: RuntimeException
                if e.getMessage != null &&
                  (e.getMessage.contains("requires a preceding") ||
                   e.getMessage.contains("share")) => null
            }
          whenever(got != null) {
            val cols = got.columns.toSeq
            val gotRows = got.collect().map(r =>
              cols.zipWithIndex.collect {
                case (c, idx) if !r.isNullAt(idx) => c -> r.getString(idx)
              }.toMap).toSeq
            val refRows = evalRef(store, q)
              .map(_.filter { case (k, _) => cols.contains(k) })
            def canon(xs: Seq[Binding]) =
              xs.map(_.toSeq.sorted.mkString("|")).sorted
            assert(canon(gotRows) == canon(refRows),
              s"DISAGREEMENT on:\n${q.text}\nstore: $store\n" +
                s"engine: ${canon(gotRows)}\nnaive : ${canon(refRows)}")
            ran += 1
          }
        }
      }
    }
    assert(ran >= 40, s"only $ran effective differential cases ran")
  }

  // ---- extended model: MINUS / EXISTS / NOT EXISTS / aggregates ----
  // These are the semantics where bugs were historically found (EXISTS
  // positions, compatibility negation) — generated here, arbitrated by
  // direct §8.3.3/§17.4.1.4/§18.5 implementations over binding maps.

  private sealed trait NegKind
  private case object KMinus extends NegKind
  private case object KExists extends NegKind
  private case object KNotExists extends NegKind

  private case class Q2(base: List[Pat], neg: Option[(NegKind, Pat)],
                        filterVar: Option[String],
                        groupVar: Option[String]) {
    def text: String = {
      val core = base.map(_.text).mkString(" ")
      val negTxt = neg.fold("") {
        case (KMinus, p)     => s" MINUS { ${p.text} }"
        case (KExists, p)    => s" FILTER EXISTS { ${p.text} }"
        case (KNotExists, p) => s" FILTER NOT EXISTS { ${p.text} }"
      }
      val fil = filterVar.fold("")(v => s""" FILTER(STRSTARTS(?$v, "n"))""")
      groupVar match {
        case Some(g) =>
          s"SELECT ?$g (COUNT(*) AS ?n) WHERE { $core$negTxt$fil } GROUP BY ?$g"
        case None => s"SELECT * WHERE { $core$negTxt$fil }"
      }
    }
  }

  private def evalRef2(store: Seq[(String, String, String)],
                       q: Q2): Seq[Binding] = {
    def evalBgp(ps: List[Pat]): Seq[Binding] =
      ps.foldLeft(Seq[Binding](Map.empty)) { (acc, p) =>
        join(acc, evalPattern(store, p.s, p.p, p.o))
      }
    var sols = evalBgp(q.base)
    q.neg.foreach { case (kind, p) =>
      val inner = evalBgp(List(p))
      kind match {
        // §8.3.3: remove μ1 iff ∃μ2 compatible with OVERLAPPING domains
        case KMinus => sols = sols.filter(a => !inner.exists(b =>
          compatible(a, b) && a.keySet.intersect(b.keySet).nonEmpty))
        case KExists => sols = sols.filter(a => inner.exists(compatible(a, _)))
        case KNotExists => sols = sols.filter(a => !inner.exists(compatible(a, _)))
      }
    }
    q.filterVar.foreach(v =>
      sols = sols.filter(b => b.get(v).exists(_.startsWith("n"))))
    q.groupVar match {
      case Some(g) =>
        sols.groupBy(_(g)).toSeq.map { case (k, rows) =>
          Map(g -> k, "n" -> rows.size.toString)
        }
      case None => sols
    }
  }

  test("random MINUS/EXISTS/NOT EXISTS/GROUP BY queries agree with the " +
      "naive algebra evaluator") {
    val nodes = Seq("n1", "n2", "n3", "m4", "m5")
    val preds = Seq("p", "q", "r")
    val storeGen: Gen[Seq[(String, String, String)]] =
      Gen.listOfN(24, Gen.zip(Gen.oneOf(nodes), Gen.oneOf(preds),
        Gen.oneOf(nodes))).map(_.distinct)
    val varNames = Seq("a", "b", "c")
    val termGen: Gen[Either[String, String]] = Gen.frequency(
      3 -> varNames.map(v => Right(v): Either[String, String])
        .map(Gen.const).reduce(Gen.oneOf(_, _)),
      1 -> Gen.oneOf(nodes).map(Left(_): Either[String, String]))
    val patGen: Gen[Pat] =
      Gen.zip(termGen, Gen.oneOf(preds), termGen).map(Pat.tupled)
    val qGen: Gen[Q2] = for {
      base <- Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, patGen))
      kind <- Gen.oneOf(None, Some(KMinus), Some(KExists), Some(KNotExists))
      np   <- patGen
      fv   <- Gen.oneOf(None, Some("a"), Some("b"))
      gv   <- Gen.oneOf(None, Some("a"), Some("b"))
    } yield {
      val bound = base.flatMap(p => p.s.toSeq ++ p.o.toSeq).toSet
      // the negation pattern must share a variable with the base — the
      // engine's FILTER EXISTS refuses otherwise, and a no-shared MINUS
      // is a no-op both sides anyway; rebind its subject when needed
      val npShared =
        if ((np.s.toSeq ++ np.o.toSeq).exists(bound.contains)) np
        else if (bound.nonEmpty) np.copy(s = Right(bound.head))
        else np
      Q2(base, kind.map(k => (k, npShared)),
        fv.filter(bound.contains), gv.filter(bound.contains))
    }

    var ran = 0
    var negRan = 0
    var aggRan = 0
    (0 until 300).foreach { i =>
      val seed = Seed(987654L + i)
      val params = Gen.Parameters.default
      (for {
        store <- storeGen.apply(params, seed)
        q <- qGen.apply(params, seed.next)
      } yield (store, q)).foreach { case (store, q) =>
        val noSelfVar = (q.base ++ q.neg.map(_._2).toList)
          .forall(p => !(p.s.isRight && p.s == p.o))
        whenever(noSelfVar && q.base.nonEmpty) {
          val triples = store.toDF("s", "p", "o")
          val labels = Seq(("x", "en", "y")).toDF("entity", "lang", "label")
          val got =
            try SparqlText.run(q.text, triples, labels)
            catch {
              case e: RuntimeException
                if e.getMessage != null &&
                  (e.getMessage.contains("requires a preceding") ||
                   e.getMessage.contains("share")) => null
            }
          whenever(got != null) {
            val cols = got.columns.toSeq
            val gotRows = got.collect().map(r =>
              cols.zipWithIndex.collect {
                case (c, idx) if !r.isNullAt(idx) => c -> r.get(idx).toString
              }.toMap).toSeq
            val refRows = evalRef2(store, q)
              .map(_.filter { case (k, _) => cols.contains(k) })
            def canon(xs: Seq[Binding]) =
              xs.map(_.toSeq.sorted.mkString("|")).sorted
            assert(canon(gotRows) == canon(refRows),
              s"DISAGREEMENT on:\n${q.text}\nstore: $store\n" +
                s"engine: ${canon(gotRows)}\nnaive : ${canon(refRows)}")
            ran += 1
            if (q.neg.nonEmpty) negRan += 1
            if (q.groupVar.nonEmpty) aggRan += 1
          }
        }
      }
    }
    assert(ran >= 40, s"only $ran effective differential cases ran")
    assert(negRan >= 15, s"only $negRan MINUS/EXISTS cases ran")
    assert(aggRan >= 15, s"only $aggRan aggregate cases ran")
  }

  // ---- third model: property paths (+ / seq / alt / inverse) and GRAPH ----
  // Queries are SELECT DISTINCT so both sides compare as SETS — the
  // path operators' duplicate behavior (seq through two intermediates,
  // alt arms overlapping) is then irrelevant to the comparison, and the
  // naive side is a direct fixpoint/compose/union/swap over edge lists.

  private sealed trait PathK
  private case object PkPlus extends PathK
  private case object PkSeq extends PathK
  private case object PkAlt extends PathK
  private case object PkInv extends PathK

  /** graph: None = default graph; Some(None) = GRAPH ?g;
    * Some(Some(c)) = GRAPH <c>. extra always binds ?y (join after the
    * path) when present. */
  private case class Q3(k: PathK, p1: String, p2: String,
                        extra: Option[Pat], graph: Option[Option[String]]) {
    def pathText: String = k match {
      case PkPlus => s"<$p1>+"
      case PkSeq  => s"<$p1>/<$p2>"
      case PkAlt  => s"(<$p1>|<$p2>)"
      case PkInv  => s"^<$p1>"
    }
    def text: String = {
      val inner = s"?x $pathText ?y ." +
        extra.fold("")(p => s" ${p.text}")
      graph match {
        case None          => s"SELECT DISTINCT * WHERE { $inner }"
        case Some(None)    => s"SELECT DISTINCT * WHERE { GRAPH ?g { $inner } }"
        case Some(Some(c)) => s"SELECT DISTINCT * WHERE { GRAPH <$c> { $inner } }"
      }
    }
  }

  private def evalPathPairs(tr: Seq[(String, String, String)],
                            k: PathK, p1: String, p2: String)
      : Seq[(String, String)] = {
    def edges(p: String) = tr.filter(_._2 == p).map(t => (t._1, t._3))
    k match {
      case PkAlt => edges(p1) ++ edges(p2)
      case PkInv => edges(p1).map(_.swap)
      case PkSeq =>
        for ((a, b) <- edges(p1); (b2, c) <- edges(p2) if b == b2) yield (a, c)
      case PkPlus =>
        val e = edges(p1).toSet
        var closure = e
        var changed = true
        while (changed) {
          val next = closure ++ (for ((a, b) <- closure; (b2, c) <- e
                                      if b == b2) yield (a, c))
          changed = next.size != closure.size
          closure = next
        }
        closure.toSeq
    }
  }

  private def evalRef3(quads: Seq[(String, String, String, String)],
                       q: Q3): Seq[Binding] = {
    def inGraph(tr: Seq[(String, String, String)]): Seq[Binding] = {
      val pathSols: Seq[Binding] = evalPathPairs(tr, q.k, q.p1, q.p2)
        .map { case (a, b) => Map("x" -> a, "y" -> b) }
      q.extra match {
        case None    => pathSols
        case Some(p) => join(pathSols, evalPattern(tr, p.s, p.p, p.o))
      }
    }
    val sols = q.graph match {
      case None => inGraph(quads.map(t => (t._1, t._2, t._3)))
      case Some(Some(c)) =>
        inGraph(quads.filter(_._4 == c).map(t => (t._1, t._2, t._3)))
      case Some(None) =>
        quads.map(_._4).distinct.flatMap { g =>
          inGraph(quads.filter(_._4 == g).map(t => (t._1, t._2, t._3)))
            .map(_ + ("g" -> g))
        }
    }
    sols.distinct
  }

  test("random property-path/GRAPH queries agree with the naive " +
      "closure evaluator (set-exact)") {
    val nodes = Seq("n1", "n2", "n3", "m4", "m5")
    val preds = Seq("p", "q", "r")
    val graphs = Seq("gA", "gB")
    val quadGen: Gen[Seq[(String, String, String, String)]] =
      Gen.listOfN(20, Gen.zip(Gen.oneOf(nodes), Gen.oneOf(preds),
        Gen.oneOf(nodes), Gen.oneOf(graphs))).map(_.distinct)
    val objGen: Gen[Either[String, String]] = Gen.frequency(
      2 -> Gen.const(Right("z"): Either[String, String]),
      1 -> Gen.oneOf(nodes).map(Left(_): Either[String, String]))
    val qGen: Gen[Q3] = for {
      k  <- Gen.oneOf(PkPlus, PkSeq, PkAlt, PkInv)
      p1 <- Gen.oneOf(preds)
      p2 <- Gen.oneOf(preds)
      ex <- Gen.frequency(
        1 -> Gen.const(Option.empty[Pat]),
        1 -> Gen.zip(Gen.oneOf(preds), objGen).map { case (p, o) =>
          Some(Pat(Right("y"), p, o)) })
      gk <- Gen.oneOf(None, Some(None), Some(Some("gA")), Some(Some("gB")))
    } yield Q3(k, p1, p2, ex, gk)

    var ran = 0
    var pathKinds = scala.collection.mutable.Set.empty[PathK]
    var graphRan = 0
    (0 until 300).foreach { i =>
      val seed = Seed(24680L + i)
      val params = Gen.Parameters.default
      (for {
        quads <- quadGen.apply(params, seed)
        q <- qGen.apply(params, seed.next)
      } yield (quads, q)).foreach { case (quads, q) =>
        whenever(quads.nonEmpty) {
          val src =
            if (q.graph.isDefined) quads.toDF("s", "p", "o", "g")
            else quads.map(t => (t._1, t._2, t._3)).toDF("s", "p", "o")
          val labels = Seq(("x", "en", "y")).toDF("entity", "lang", "label")
          val got = SparqlText.run(q.text, src, labels)
          val cols = got.columns.toSeq
          val gotRows = got.collect().map(r =>
            cols.zipWithIndex.collect {
              case (c, idx) if !r.isNullAt(idx) => c -> r.getString(idx)
            }.toMap).toSeq
          val refRows = evalRef3(quads, q)
            .map(_.filter { case (c, _) => cols.contains(c) }).distinct
          def canon(xs: Seq[Binding]) =
            xs.map(_.toSeq.sorted.mkString("|")).distinct.sorted
          assert(canon(gotRows) == canon(refRows),
            s"DISAGREEMENT on:\n${q.text}\nquads: $quads\n" +
              s"engine: ${canon(gotRows)}\nnaive : ${canon(refRows)}")
          ran += 1
          pathKinds += q.k
          if (q.graph.isDefined) graphRan += 1
        }
      }
    }
    assert(ran >= 100, s"only $ran effective path/GRAPH cases ran")
    assert(pathKinds.size == 4, s"path kinds missing: $pathKinds")
    assert(graphRan >= 30, s"only $graphRan GRAPH cases ran")
  }

  // ---- fourth model: the round-9 grouped-query semantics ----
  // EXISTS inside aggregate arguments, aggregate ORDER BY keys + LIMIT,
  // and the trailing VALUES clause — each evaluated directly over
  // binding maps per §18.2.4's stage order (group → aggregate → VALUES
  // → order/limit), which is exactly where an implementation that
  // joined VALUES into WHERE or sorted after projection would diverge.

  private case class Q4(base: List[Pat], gv: String, ep: Pat, ep2: Pat,
                        withExists: Boolean, twoExists: Boolean,
                        orderLimit: Boolean,
                        postVals: Option[Seq[String]]) {
    def text: String = {
      val se =
        if (withExists) s" (SUM(IF(EXISTS { ${ep.text} }, 1, 0)) AS ?se)"
        else ""
      // a SECOND EXISTS aggregate over one pre-agg frame — the mark
      // columns of sequential lifts must stay distinct (the __exists
      // collision class)
      val se2 =
        if (withExists && twoExists)
          s" (SUM(IF(EXISTS { ${ep2.text} }, 1, 0)) AS ?s2)"
        else ""
      val vals = postVals.fold("")(vs =>
        s" VALUES ?$gv { ${vs.map(v => s"<$v>").mkString(" ")} }")
      val ol = if (orderLimit) s" ORDER BY DESC(COUNT(*)) ?$gv LIMIT 2" else ""
      s"SELECT ?$gv (COUNT(*) AS ?n)$se$se2 WHERE { ${base.map(_.text).mkString(" ")} } " +
        s"GROUP BY ?$gv$vals$ol"
    }
  }

  private def evalRef4(store: Seq[(String, String, String)],
                       q: Q4): Seq[Binding] = {
    def evalBgp(ps: List[Pat]): Seq[Binding] =
      ps.foldLeft(Seq[Binding](Map.empty)) { (acc, p) =>
        join(acc, evalPattern(store, p.s, p.p, p.o))
      }
    val sols = evalBgp(q.base)
    val inner = if (q.withExists) evalBgp(List(q.ep)) else Nil
    val inner2 =
      if (q.withExists && q.twoExists) evalBgp(List(q.ep2)) else Nil
    var groups = sols.groupBy(_(q.gv)).toSeq.map { case (k, ms) =>
      var row = Map(q.gv -> k, "n" -> ms.size.toString)
      if (q.withExists)
        row += ("se" -> ms.count(m => inner.exists(compatible(m, _))).toString)
      if (q.withExists && q.twoExists)
        row += ("s2" -> ms.count(m => inner2.exists(compatible(m, _))).toString)
      row
    }
    // trailing VALUES joins the GROUPED solution (§18.2.4 stage order)
    q.postVals.foreach(vs => groups = groups.filter(r => vs.contains(r(q.gv))))
    // ORDER BY aggregates + LIMIT cut after the VALUES join
    if (q.orderLimit)
      groups = groups.sortBy(r => (-r("n").toInt, r(q.gv))).take(2)
    groups
  }

  test("random grouped queries with EXISTS-in-aggregate / aggregate " +
      "ORDER BY / trailing VALUES agree with the staged evaluator") {
    val nodes = Seq("n1", "n2", "n3", "m4", "m5")
    val preds = Seq("p", "q", "r")
    val storeGen: Gen[Seq[(String, String, String)]] =
      Gen.listOfN(24, Gen.zip(Gen.oneOf(nodes), Gen.oneOf(preds),
        Gen.oneOf(nodes))).map(_.distinct)
    val varNames = Seq("a", "b", "c")
    val termGen: Gen[Either[String, String]] = Gen.frequency(
      3 -> varNames.map(v => Right(v): Either[String, String])
        .map(Gen.const).reduce(Gen.oneOf(_, _)),
      1 -> Gen.oneOf(nodes).map(Left(_): Either[String, String]))
    val patGen: Gen[Pat] =
      Gen.zip(termGen, Gen.oneOf(preds), termGen).map(Pat.tupled)
    val qGen: Gen[Q4] = for {
      base <- Gen.choose(1, 2).flatMap(n => Gen.listOfN(n, patGen))
      ep   <- patGen
      ep2  <- patGen
      we   <- Gen.oneOf(true, false)
      te   <- Gen.oneOf(true, false)
      ol   <- Gen.oneOf(true, false)
      pv   <- Gen.oneOf(None, Some(Seq("n1", "m4")), Some(Seq("n2")))
    } yield {
      val bound = base.flatMap(p => p.s.toSeq ++ p.o.toSeq).distinct
      val gv = bound.headOption.getOrElse("a")
      // each EXISTS body must share a variable with the pre-agg frame
      def share(p: Pat): Pat =
        if ((p.s.toSeq ++ p.o.toSeq).exists(bound.contains)) p
        else p.copy(s = Right(gv))
      Q4(base, gv, share(ep), share(ep2), we, te, ol, pv)
    }

    var ran = 0
    var existsRan = 0
    var twoRan = 0
    var olRan = 0
    var pvRan = 0
    (0 until 300).foreach { i =>
      val seed = Seed(1357911L + i)
      val params = Gen.Parameters.default
      (for {
        store <- storeGen.apply(params, seed)
        q <- qGen.apply(params, seed.next)
      } yield (store, q)).foreach { case (store, q) =>
        val noSelfVar = (q.base :+ q.ep :+ q.ep2)
          .forall(p => !(p.s.isRight && p.s == p.o))
        val hasVar = q.base.exists(p => p.s.isRight || p.o.isRight)
        whenever(noSelfVar && hasVar && q.base.nonEmpty) {
          val triples = store.toDF("s", "p", "o")
          val labels = Seq(("x", "en", "y")).toDF("entity", "lang", "label")
          val got = SparqlText.run(q.text, triples, labels)
          val cols = got.columns.toSeq
          val gotRows = got.collect().map(r =>
            cols.zipWithIndex.collect {
              case (c, idx) if !r.isNullAt(idx) => c -> r.get(idx).toString
            }.toMap).toSeq
          val refRows = evalRef4(store, q)
            .map(_.filter { case (c, _) => cols.contains(c) })
          def canon(xs: Seq[Binding]) =
            xs.map(_.toSeq.sorted.mkString("|")).sorted
          assert(canon(gotRows) == canon(refRows),
            s"DISAGREEMENT on:\n${q.text}\nstore: $store\n" +
              s"engine: ${canon(gotRows)}\nnaive : ${canon(refRows)}")
          ran += 1
          if (q.withExists) existsRan += 1
          if (q.withExists && q.twoExists) twoRan += 1
          if (q.orderLimit) olRan += 1
          if (q.postVals.nonEmpty) pvRan += 1
        }
      }
    }
    assert(ran >= 100, s"only $ran effective grouped cases ran")
    assert(existsRan >= 30 && twoRan >= 15 && olRan >= 30 && pvRan >= 30,
      s"coverage: exists=$existsRan two=$twoRan orderLimit=$olRan " +
        s"postVals=$pvRan")
  }

  private case class Q5(base: List[Pat], gv: String, withAgg: Boolean,
                        having: Option[Int], orderLimit: Boolean) {
    def text: String = {
      val tpl =
        if (withAgg) s"?$gv <hasN> ?n . ?$gv <type> <G>"
        else s"?$gv <type> <G>"
      val gb =
        if (withAgg) s"GROUP BY ?$gv (COUNT(*) AS ?n)"
        else s"GROUP BY ?$gv"
      val hv = having.fold("")(k => s" HAVING (COUNT(*) >= $k)")
      val ol = if (orderLimit) s" ORDER BY DESC(COUNT(*)) ?$gv LIMIT 2" else ""
      s"CONSTRUCT { $tpl } WHERE { ${base.map(_.text).mkString(" ")} } $gb$hv$ol"
    }
  }

  /** Independent reference for grouped CONSTRUCT: stage the grouped
    * solution sequence exactly per §18 (group → HAVING → order/limit),
    * then template it HERE in the test — so the engine's parse-time
    * desugaring to a subselect is checked against a second, direct
    * implementation of §10.2's "template the solution sequence". */
  private def evalRef5(store: Seq[(String, String, String)],
                       q: Q5): Seq[Binding] = {
    val sols = q.base.foldLeft(Seq[Binding](Map.empty)) { (acc, p) =>
      join(acc, evalPattern(store, p.s, p.p, p.o))
    }
    var groups = sols.groupBy(_(q.gv)).toSeq
      .map { case (k, ms) => (k, ms.size) }
    q.having.foreach(k => groups = groups.filter(_._2 >= k))
    if (q.orderLimit)
      groups = groups.sortBy { case (k, n) => (-n, k) }.take(2)
    groups.flatMap { case (k, n) =>
      val arms = Seq(Map("s" -> k, "p" -> "type", "o" -> "G")) ++
        (if (q.withAgg) Seq(Map("s" -> k, "p" -> "hasN", "o" -> n.toString))
         else Nil)
      arms
    }.distinct
  }

  test("random grouped CONSTRUCT queries agree with staged evaluation " +
      "plus independent templating") {
    val nodes = Seq("n1", "n2", "n3", "m4", "m5")
    val preds = Seq("p", "q", "r")
    val storeGen: Gen[Seq[(String, String, String)]] =
      Gen.listOfN(24, Gen.zip(Gen.oneOf(nodes), Gen.oneOf(preds),
        Gen.oneOf(nodes))).map(_.distinct)
    val varNames = Seq("a", "b", "c")
    val termGen: Gen[Either[String, String]] = Gen.frequency(
      3 -> varNames.map(v => Right(v): Either[String, String])
        .map(Gen.const).reduce(Gen.oneOf(_, _)),
      1 -> Gen.oneOf(nodes).map(Left(_): Either[String, String]))
    val patGen: Gen[Pat] =
      Gen.zip(termGen, Gen.oneOf(preds), termGen).map(Pat.tupled)
    val qGen: Gen[Q5] = for {
      base <- Gen.choose(1, 2).flatMap(n => Gen.listOfN(n, patGen))
      agg  <- Gen.oneOf(true, false)
      hv   <- Gen.oneOf(None, Some(1), Some(2))
      ol   <- Gen.oneOf(true, false)
    } yield {
      val bound = base.flatMap(p => p.s.toSeq ++ p.o.toSeq).distinct
      val gv = bound.headOption.getOrElse("a")
      // grouping needs at least one aggregate somewhere (engine refuses
      // otherwise) — force HAVING when the binding is absent
      Q5(base, gv, agg, if (!agg && hv.isEmpty && !ol) Some(1) else hv, ol)
    }
    var ran = 0
    var aggRan = 0
    var hvRan = 0
    var olRan = 0
    (0 until 300).foreach { i =>
      val seed = Seed(8642097L + i)
      val params = Gen.Parameters.default
      (for {
        store <- storeGen.apply(params, seed)
        q <- qGen.apply(params, seed.next)
      } yield (store, q)).foreach { case (store, q) =>
        val noSelfVar = q.base.forall(p => !(p.s.isRight && p.s == p.o))
        val hasVar = q.base.exists(p => p.s.isRight || p.o.isRight)
        whenever(noSelfVar && hasVar && q.base.nonEmpty) {
          val triples = store.toDF("s", "p", "o")
          val labels = Seq(("x", "en", "y")).toDF("entity", "lang", "label")
          val got = SparqlText.run(q.text, triples, labels)
            .collect().map(r => Map("s" -> r.getString(0),
              "p" -> r.getString(1), "o" -> r.getString(2))).toSeq
          val ref = evalRef5(store, q)
          def canon(xs: Seq[Binding]) =
            xs.map(_.toSeq.sorted.mkString("|")).sorted
          assert(canon(got) == canon(ref),
            s"DISAGREEMENT on:\n${q.text}\nstore: $store\n" +
              s"engine: ${canon(got)}\nnaive : ${canon(ref)}")
          ran += 1
          if (q.withAgg) aggRan += 1
          if (q.having.nonEmpty) hvRan += 1
          if (q.orderLimit) olRan += 1
        }
      }
    }
    assert(ran >= 100, s"only $ran effective grouped-CONSTRUCT cases ran")
    assert(aggRan >= 30 && hvRan >= 30 && olRan >= 30,
      s"coverage: agg=$aggRan having=$hvRan orderLimit=$olRan")
  }

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body
}
