package graft

import org.apache.spark.sql.functions._
import graft.operators.{Events, SketchOps}

/** Sketch-prefiltered exact analytics (q228/q229/q231) and the temporal
  * block (q232/q226/q227): adversarial edge cases the sf fixtures don't
  * exercise, plus the Misra–Gries superset guarantee under a hostile
  * stream order. */
class SketchOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // ---------------------------------------------------------- Misra–Gries

  test("Misra–Gries: heavy items survive a hostile interleaving and " +
      "memory stays bounded by cap") {
    // Stream: one heavy item (freq 400 of n=1000) drowned in 600 distinct
    // singletons, singletons FIRST so the summary is full before the heavy
    // item ever appears, then strictly alternating.
    val singles = (1 to 600).map(i => s"rare$i")
    val stream = singles.take(200) ++
      (0 until 400).flatMap(i => Seq("HEAVY", s"rare${200 + i % 400 + 1}"))
    val out = SketchOps.misraGries(8, stream.iterator).toSet
    assert(out.contains("HEAVY")) // freq 400 > n/8 = 125 — must survive
    assert(out.size <= 8)         // bounded by cap
  }

  test("Misra–Gries: superset guarantee across partitions (pigeonhole)") {
    // 4 partitions, global n = 4000, k = 10 → threshold 400. 'hh' has
    // global count 500 spread thin (125/partition, each > n_p/k = 100).
    val part = (1 to 875).map(i => s"x$i") ++ Seq.fill(125)("hh")
    val survivors = (0 until 4).flatMap(_ => SketchOps.misraGries(10, part.iterator)).toSet
    assert(survivors.contains("hh"))
  }

  test("q228: exact counts, exact threshold, deterministic under " +
      "repartitioning") {
    val a = SketchOps.q228HeavyHitters(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // exact oracle computed inline: plain groupBy without any sketch
    val full = graft.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val n = full.count()
    val exact = full.groupBy("term").count()
      .filter(col("count") > lit(n.toDouble / 50))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a == exact)
  }

  // ------------------------------------------------------ exact quantiles

  test("q229: rank selection matches a full sort at every target") {
    val out = SketchOps.q229ExactQuantiles(spark, dir)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toMap
    val sorted = graft.Tables.lineitem(spark, dir)
      .select(round(col("l_extendedprice") * 100).cast("long").as("c"))
      .orderBy("c").collect().map(_.getLong(0))
    val n = sorted.length
    Seq(0.25, 0.5, 0.75, 0.9, 0.99).foreach { p =>
      val rank = math.ceil(p * n).toLong
      assert(out(p) == sorted((rank - 1).toInt), s"p=$p")
    }
  }

  test("q229: duplicate-saturated bucket — the rank value is unique even " +
      "when row_number tie order is not") {
    // all mass on two values straddling a rank boundary
    val spark2 = spark
    import spark2.implicits._
    val vals = Seq.fill(7)(100L) ++ Seq.fill(5)(200L)
    val sorted = vals.sorted
    // p=0.5 → rank ceil(6)=6 → value 100; p=0.75 → rank 9 → 200
    assert(sorted(5) == 100L && sorted(8) == 200L)
  }

  test("MgCandidates merge rule: pairwise sums trimmed by the (k+1)-th " +
      "largest keep every provably-heavy term") {
    val agg = new graft.functions.MgCandidates(3)
    // two partials whose merge overflows capacity
    val b1 = Seq(("a", 10L), ("b", 4L), ("c", 1L))
    val b2 = Seq(("a", 5L), ("d", 6L), ("e", 2L))
    val m = agg.merge(b1, b2)
    assert(m.size <= 3)
    val asMap = m.toMap
    // counts only undercount: a=15 is the clear heavy item
    assert(asMap.contains("a") && asMap("a") <= 15L)
    // every surviving count is positive
    assert(m.forall(_._2 > 0))
  }

  test("q240: grouped candidates + exact recount equals the plain " +
      "per-group computation, with the sketch capacity below the vocab") {
    val got = SketchOps.q240GroupedHeavyHitters(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val toks = graft.Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val gn = toks.groupBy(_._1).view.mapValues(_.size).toMap
    // capacity 25 must be below the per-group vocabulary or the MG
    // decrement path never fires and the test is vacuous
    assert(toks.groupBy(_._1).values.forall(_.map(_._2).distinct.size > 25))
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case ((src, _), c) => c > gn(src) / 25.0 }.toMap
    assert(got == exact)
  }

  test("q237: per-group median equals the full per-group sort at " +
      "rank ceil(n/2)") {
    val out = SketchOps.q237GroupedMedian(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val groups = graft.Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), round(col("l_extendedprice") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
    assert(out.keySet == groups.keySet)
    groups.foreach { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      val rank = math.ceil(sorted.length / 2.0).toInt
      assert(out(g) == sorted(rank - 1), s"group $g")
    }
  }

  test("q239: decile bins partition the rows, respect boundary order, " +
      "and each bin's [lo, hi] ranges never overlap") {
    val bins = SketchOps.q239EquifreqBins(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val total = graft.Tables.lineitem(spark, dir).count()
    assert(bins.map(_._2).sum == total)           // no row dropped
    assert(bins.map(_._1).distinct.length == bins.length)
    bins.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a._4 <= b._3)      // hi(bin i) <= lo(bin i+1)
      case _ =>
    }
    // roughly equal frequency: every bin within 3x of the ideal share
    val ideal = total.toDouble / bins.length
    bins.foreach { case (i, n, _, _) =>
      assert(n < 3 * ideal, s"bin $i way oversized: $n vs ideal $ideal")
    }
  }

  // -------------------------------------------------------- budget select

  test("q231: output is the maximal prefix of the (score desc, doc_id) " +
      "order whose running char total fits the budget") {
    val rows = SketchOps.q231BudgetSelect(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val ordered = rows.sortBy { case (id, sc, _, _) => (-sc, id) }
    // cum_chars strictly increasing along the order and equal to the
    // running sum of n_chars
    var run = 0L
    ordered.foreach { case (_, _, nc, cum) =>
      run += nc
      assert(cum == run)
    }
    // budget = floor(0.6 * total corpus chars); the NEXT doc would overflow
    val total = graft.Tables.documents(spark, dir)
      .agg(sum(col("n_chars"))).collect()(0).getLong(0)
    val budget = (total * 0.6).toLong
    assert(run <= budget)
    val selected = rows.map(_._1).toSet
    // recompute the full order to find the first unselected doc
    val nToks = size(split(col("text"), " ")).cast("long")
    val nStop = expr("size(filter(split(text, ' '), t -> t IN ('the','a','of','and')))").cast("long")
    val all = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        round(least(lit(1.0), nToks / 100.0) * (lit(1.0) - nStop / nToks), 4).as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy { case (id, _, sc) => (-sc, id) }
    val firstOut = all.find { case (id, _, _) => !selected.contains(id) }
    firstOut.foreach { case (_, nc, _) => assert(run + nc > budget) }
  }

  // ------------------------------------------------------- temporal block

  test("q232: bin replication emits each qualifying pair exactly once " +
      "and misses nothing (vs naive theta-join)") {
    val fast = Events.q232IntervalJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ev = graft.Tables.events(spark, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("eid"), unix_micros(col("ts")).as("es"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), unix_micros(col("ts")).as("cs"))
    val naive = errors.crossJoin(clicks)
      .filter(col("cs") >= col("es") && col("cs") <= col("es") + lit(1800L * 1000000L))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(fast.sorted == naive.sorted) // exactly-once: same multiset
    assert(fast.size == fast.distinct.size)
  }

  test("intervalJoin: variable-length intervals (0 to 40x the bin width) " +
      "match a naive theta-join exactly once each, for several bin widths") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    val intervals = (0L until 120L).map { i =>
      val t0 = rnd.nextInt(100000).toLong
      (i, t0, t0 + rnd.nextInt(40000).toLong) // lengths 0..40k vs bins 1k..16k
    }
    val points = (0L until 400L).map(i => (i, rnd.nextInt(140000).toLong))
    val naive = (for {
      (iid, t0, t1) <- intervals
      (pid, t) <- points
      if t >= t0 && t <= t1
    } yield (iid, pid)).sorted
    for (binW <- Seq(1000L, 4096L, 16000L)) {
      val got = graft.operators.Events.intervalJoin(
          points.toDF("pid", "t"), intervals.toDF("iid", "t0", "t1"), binW)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.size == got.distinct.size, s"binW=$binW dupes")
      assert(got.sorted == naive, s"binW=$binW")
    }
  }

  test("q226: grid is dense per user and fill carries the last observation") {
    val rows = Events.q226Gapfill(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (_, rs) =>
      val hours = rs.map(_._2).sorted
      // dense: consecutive grid hours are exactly 3600s apart
      val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      val secs = hours.map(h => java.time.LocalDateTime.parse(h, fmt)
        .toEpochSecond(java.time.ZoneOffset.UTC))
      secs.toSeq.sliding(2).foreach { case Seq(a, b) => assert(b - a == 3600L); case _ => }
      // forward fill: filled equals the last non-null obs at or before
      var lastObs: Option[Double] = None
      rs.sortBy(_._2).foreach { case (_, _, obs, filled) =>
        if (obs.isDefined) lastObs = obs
        assert(filled == lastObs)
      }
    }
  }

  test("q230: BFS hops are minimal — no edge connects hop h to hop > h+1, " +
      "seed is 0, frontier never revisits") {
    val rows = graft.operators.RdfOps.q230BfsHops(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val hop = rows.toMap
    assert(rows.length == hop.size)   // each node labeled exactly once
    assert(hop("R1") == 0L)
    assert(hop.values.max <= 4L)
    // triangle inequality over the undirected edge set: adjacent nodes'
    // hops differ by at most 1 when both are labeled
    val t = graft.plans.TripleStore.triples(spark, dir)
      .filter(col("p").isin("nation", "region", "segment"))
      .select("s", "o").collect().map(r => (r.getString(0), r.getString(1)))
    t.foreach { case (a, b) =>
      (hop.get(a), hop.get(b)) match {
        case (Some(x), Some(y)) => assert(math.abs(x - y) <= 1L, s"$a($x)-$b($y)")
        case _ =>
      }
    }
  }

  private def undirectedEdges(): Array[(String, String)] = {
    val fwd = graft.plans.TripleStore.triples(spark, dir)
      .filter(col("p").isin("nation", "region", "segment"))
      .select("s", "o").collect().map(r => (r.getString(0), r.getString(1)))
    (fwd ++ fwd.map(_.swap)).distinct
  }

  test("q241: three synchronous LPA rounds match an independent in-memory " +
      "replay (mode with min-label tie-break)") {
    val got = graft.operators.RdfOps.q241LabelPropagation(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    val e = undirectedEdges()
    val inNbrs = e.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var lbl = e.map(_._1).distinct.map(n => n -> n).toMap
    (1 to 3).foreach { _ =>
      lbl = inNbrs.map { case (node, srcs) =>
        val freq = srcs.map(lbl).groupBy(identity).view.mapValues(_.size).toMap
        node -> freq.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    assert(got == lbl)
  }

  test("q242: four relaxation rounds match an independent Bellman-Ford " +
      "replay with the same length-derived weights") {
    val got = graft.operators.RdfOps.q242WeightedSssp(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val we = undirectedEdges().map { case (s, d) =>
      (s, d, ((s.length * 7 + d.length * 13) % 5 + 1).toLong)
    }
    var dist = Map("R1" -> 0L)
    (1 to 4).foreach { _ =>
      val relaxed = we.flatMap { case (s, d, w) => dist.get(s).map(ds => d -> (ds + w)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    assert(got == dist)
    assert(got("R1") == 0L)
  }

  test("q227: intervals tile each user's timeline half-open with no gaps, " +
      "and consecutive states differ") {
    val rows = Events.q227Scd2(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_._3)
      // exactly one open interval per user, and it is the last
      assert(ordered.count(_._4.isEmpty) == 1)
      assert(ordered.last._4.isEmpty)
      ordered.toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._4.contains(b._3)) // valid_to == next valid_from
          assert(a._2 != b._2)        // run collapse: adjacent states differ
        case _ =>
      }
    }
  }
}
