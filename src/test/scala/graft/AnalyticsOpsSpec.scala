package graft

import org.apache.spark.sql.functions._

/** Round-11 analytics additions — properties beyond the hash oracle:
  * sorted-neighborhood pairing equals the global-sort sliding-window
  * definition on adversarial frames (so the distributed two-phase rank
  * is exact), k-core peeling equals an in-memory fixpoint replay and is
  * idempotent, the OLS closed form recovers a planted exact line, the
  * rolling-anomaly window replays in memory, and ROLLUP levels are
  * mutually consistent. */
class AnalyticsOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sortedNeighborhoodJoin == global-sort sliding window replay, " +
      "across widths and hostile partitionings") {
    val spark2 = spark
    import spark2.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(13)
    val names = (0 until 200).map(i =>
      f"rec${rnd.nextInt(1000)}%04d${('a' + i % 7).toChar}").distinct
    for (w <- Seq(2, 5, 9); parts <- Seq(1, 7)) {
      val got = operators.TextOps.sortedNeighborhoodJoin(
          names.toDF("name").repartition(parts), w, k = 3)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      val sorted = names.sorted
      val expect = (for {
        i <- sorted.indices; j <- (i + 1) until math.min(i + w, sorted.length)
        d = lev(sorted(i), sorted(j)) if d <= 3
      } yield (sorted(i), sorted(j), d)).toSet
      assert(got == expect, s"w=$w parts=$parts")
    }
  }

  test("kCore == in-memory peel fixpoint on random graphs; idempotent " +
      "(running k-core on the core returns the core)") {
    val spark2 = spark
    import spark2.implicits._
    for (seed <- Seq(3, 17); k <- Seq(2, 3)) {
      val rnd = new scala.util.Random(seed)
      val edges = (0 until 300).map { _ =>
        val a = rnd.nextInt(60); var b = rnd.nextInt(60)
        while (b == a) b = rnd.nextInt(60)
        (s"n$a", s"n$b")
      }.distinct.filter { case (a, b) => a < b }
      val got = operators.RdfOps.kCore(edges.toDF("src", "dst"), k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      // in-memory peel to fixpoint over the symmetrized simple graph
      var adj = (edges ++ edges.map(e => (e._2, e._1))).distinct
      var stable = false
      while (!stable) {
        val deg = adj.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        val alive = deg.filter(_._2 >= k).keySet
        val pruned = adj.filter(e => alive(e._1) && alive(e._2))
        stable = pruned.size == adj.size
        adj = pruned
      }
      val expect = adj.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      assert(got == expect, s"seed=$seed k=$k")
      if (expect.nonEmpty) {
        val again = operators.RdfOps.kCore(
            adj.filter(e => e._1 < e._2).toDF("src", "dst"), k)
          .collect().map(r => (r.getString(0), r.getLong(1))).toMap
        assert(again == expect, s"idempotence seed=$seed k=$k")
      }
    }
  }

  test("olsFit recovers a planted exact line (slope 3, intercept -7, r2 1) " +
      "and a degenerate-noise group stays finite") {
    val spark2 = spark
    import spark2.implicits._
    val line = (1L to 50L).map(x => ("line", x, 3 * x - 7))
    val noisy = Seq(("noisy", 1L, 10L), ("noisy", 2L, 9L),
      ("noisy", 3L, 14L), ("noisy", 4L, 11L))
    val got = operators.Relational.olsFit((line ++ noisy).toDF("g", "x", "y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("line") == ((50L, 3.0, -7.0, 1.0)))
    val (n, slope, _, r2) = got("noisy")
    assert(n == 4L && slope > 0 && r2 > 0 && r2 < 1)
  }

  test("q257: the integer 3-sigma test replays from in-memory daily counts") {
    val spark2 = spark
    import spark2.implicits._
    val got = operators.Events.q257RollingAnomaly(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))))
      .toMap
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
      .as[(String, String, Long)].collect()
    val expect = daily.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val days = rows.sortBy(_._2)
      days.indices.flatMap { i =>
        val frame = days.slice(math.max(0, i - 7), i).map(_._3)
        val (n, x) = (frame.length.toLong, days(i)._3)
        if (n < 4) None else {
          val (s1, s2) = (frame.sum, frame.map(v => v * v).sum)
          val num = (n * x - s1) * (n * x - s1)
          val den = 9L * (n * s2 - s1 * s1)
          Some(((t, days(i)._2), (x, n, num, den, num > den)))
        }
      }
    }.toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q259: the EWMA fold replays an in-memory sequential recurrence " +
      "per user") {
    val spark2 = spark
    import spark2.implicits._
    val got = operators.Events.q259EwmaFold(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        round(col("value") * 1e6).cast("long").as("v"))
      .as[(Long, Long, Long, Long)].collect()
    val expect = ev.groupBy(_._1).view.mapValues { rows =>
      val vs = rows.sortBy(r => (r._2, r._3)).map(_._4)
      (vs.length.toLong, vs.tail.foldLeft(vs.head)((acc, v) => (acc + v) / 2))
    }.toMap
    assert(got == expect && got.nonEmpty)
  }

  test("q261: significance flag matches the exact rational z-square on a " +
      "planted frame where the rounded double would be ambiguous") {
    val spark2 = spark
    import spark2.implicits._
    val rows = operators.Events.q261AbTest(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (n0, x0, n1, x1) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val d = BigInt(x1 * n0 - x0 * n1)
      val num = d * d * BigInt(n0 + n1) * 10000
      val den = BigInt(n0) * BigInt(n1) * BigInt(x0 + x1) *
        BigInt(n0 + n1 - x0 - x1) * 38416
      assert(r.getBoolean(8) == (num > den), r.toString)
      if (!r.isNullAt(7)) {
        val zsq = r.getDouble(7)
        // the rounded statistic and the exact decision must agree except
        // within rounding distance of the 3.8416 threshold
        if (math.abs(zsq - 3.8416) > 0.001)
          assert((zsq > 3.8416) == r.getBoolean(8))
      }
    }
  }

  test("q262: trigram counts replay from an in-memory sessionization") {
    val spark2 = spark
    import spark2.implicits._
    val got = operators.Events.q262PathTrigrams(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3)))
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val tri = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      // split into 30-min-gap sessions, then per-session trigrams
      val sessions = ordered.foldLeft(List.empty[List[(Long, String)]]) {
        case (acc, r) =>
          acc match {
            case (cur @ ((lastUs, _) :: _)) :: rest
                if r._2 - lastUs <= 1800L * 1000000L =>
              ((r._2, r._4) :: cur) :: rest
            case _ => List((r._2, r._4)) :: acc
          }
      }.map(_.reverse.map(_._2))
      sessions.flatMap(s => s.sliding(3).filter(_.length == 3)
        .map(t => (t(0), t(1), t(2))))
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val expect = tri.sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20)
    assert(got.toSeq == expect.map { case (k, n) => (k, n) } && got.nonEmpty)
  }

  test("q260: zone-map buckets partition the table and prune verdicts " +
      "are sound (no pruned bucket contains a matching row)") {
    val spark2 = spark
    import spark2.implicits._
    val got = operators.Relational.q260ZoneMap(spark, dir).collect()
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .as[(Long, String)].collect()
    assert(got.map(_.getLong(1)).sum == orders.length)
    got.foreach { r =>
      val rows = orders.filter(_._1 / 1024 == r.getLong(0))
      if (r.getBoolean(6))
        assert(!rows.exists(o => o._2 >= "1996-01-01" && o._2 <= "1996-12-31"))
      if (r.getBoolean(7))
        assert(!rows.exists(o => o._1 >= 4096L && o._1 <= 8191L))
    }
    // the layout story: the clustered predicate prunes buckets, the
    // unclustered one does not
    assert(got.count(_.getBoolean(7)) > got.count(_.getBoolean(6)))
  }

  test("epochShuffle: a true permutation (every id once, dense shard " +
      "positions), different across epochs, stable across partitionings") {
    val spark2 = spark
    import spark2.implicits._
    val ids = (1L to 500L).toDF("doc_id")
    val e3 = operators.TextOps.epochShuffle(ids, epoch = 3, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(e3.map(_._1).toSet == (1L to 500L).toSet && e3.length == 500)
    e3.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    val e4 = operators.TextOps.epochShuffle(ids, epoch = 4, nShards = 8)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(e3.count { case (id, s, p) => e4(id) == ((s, p)) } < 100,
      "epochs 3 and 4 barely differ — not a re-shuffle")
    val e3b = operators.TextOps.epochShuffle(ids.repartition(13), 3, 8)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(e3.map(r => (r._1, (r._2, r._3))).toMap == e3b)
  }

  test("q258: rollup levels are mutually consistent and gid separates " +
      "detail, subtotal, and grand total") {
    val rows = operators.Relational.q258Rollup(spark, dir).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    val detail = rows.filter(_._3 == 0L)
    val sub = rows.filter(_._3 == 1L)
    val grand = rows.filter(_._3 == 3L)
    assert(grand.length == 1)
    assert(grand.head._1.isEmpty && grand.head._2.isEmpty)
    assert(detail.map(_._4).sum == grand.head._4)
    assert(sub.map(_._5).sum == grand.head._5)
    sub.foreach { s =>
      val d = detail.filter(_._1 == s._1)
      assert(d.map(_._4).sum == s._4 && d.map(_._5).sum == s._5)
    }
  }
}
