package graft

import org.apache.spark.sql.functions._
import graft.operators.SketchOps

/** Seeded differential net over the DataFrame-parameterized sketch cores:
  * generated frames (constant, two-point, uniform, zipf-skewed, singleton)
  * checked against brute-force in-memory replays — the sketch layer must
  * never change the EXACT answer, whatever the distribution or the
  * partition layout. */
class SketchPropertySpec extends SparkSpec {

  private def longs(seed: Int, n: Int, shape: String): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      shape match {
        case "constant"  => 42L
        case "two-point" => if (rnd.nextBoolean()) 100L else 1000000L
        case "uniform"   => rnd.nextLong() % 10000000L + 10000000L
        case "zipf"      => (10000000.0 / (1 + rnd.nextInt(1000))).toLong
        case _           => i.toLong
      }
    }
  }

  private val shapes = Seq("constant", "two-point", "uniform", "zipf")
  private val sizes = Seq(1, 7, 503, 2000)

  test("exactQuantiles == full-sort rank selection on every generated " +
      "frame and every bucket width") {
    val spark2 = spark
    import spark2.implicits._
    val ps = Seq(0.1, 0.5, 0.9, 0.99)
    for (shape <- shapes; n <- sizes; bucketW <- Seq(16L, 65536L)) {
      val vals = longs(shape.hashCode ^ n, n, shape)
      val got = SketchOps.exactQuantiles(
          vals.toDF("c").repartition(5), ps, bucketW)
        .collect().map(r => (r.getDouble(0), r.getLong(1))).toMap
      val sorted = vals.sorted
      ps.foreach { p =>
        val rank = math.ceil(p * n).toInt
        assert(got(p) == sorted(rank - 1), s"$shape n=$n w=$bucketW p=$p")
      }
    }
  }

  test("groupedMedian == per-group sort on generated multi-group frames") {
    val spark2 = spark
    import spark2.implicits._
    for (shape <- shapes) {
      val rows = (0 until 900).map { i =>
        (s"g${i % 7}", longs(i, 1, shape).head + i % 3)
      }
      val got = SketchOps.groupedMedian(rows.toDF("g", "c").repartition(4))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val sorted = rs.map(_._2).sorted
        assert(got(g) == sorted(math.ceil(sorted.length / 2.0).toInt - 1),
          s"$shape group $g")
      }
    }
  }

  test("heavyHitters == unfiltered exact counts at the threshold, " +
      "under hostile partitioning") {
    val spark2 = spark
    import spark2.implicits._
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      // zipf-ish term stream over 200 distinct terms, k chosen below that
      val terms = (0 until 3000).map(_ => s"t${rnd.nextInt(rnd.nextInt(199) + 1)}")
      val got = SketchOps.heavyHitters(terms.toDF("term").repartition(7), k = 40)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val exact = terms.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 > terms.size / 40.0).toMap
      assert(got == exact, s"seed $seed")
    }
  }

  test("equifreqBins conserves rows, orders bins, and matches a " +
      "brute-force boundary count on every shape") {
    val spark2 = spark
    import spark2.implicits._
    val ps = (1 to 9).map(_ / 10.0)
    for (shape <- shapes; n <- Seq(503, 2000)) {
      val vals = longs(shape.hashCode + n, n, shape)
      val bins = SketchOps.equifreqBins(vals.toDF("c").repartition(3), ps)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(bins.map(_._2).sum == n, s"$shape n=$n rows")
      val sorted = vals.sorted
      val bounds = ps.map(p => sorted(math.ceil(p * n).toInt - 1))
      val expect = vals.groupBy(v => bounds.count(_ < v).toLong).view
        .mapValues(_.size.toLong).toMap
      assert(bins.map(t => t._1 -> t._2).toMap == expect, s"$shape n=$n bins")
    }
  }

  test("groupedBudgetPrefix == per-group windowed brute force") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0L until 600L).map { i =>
      (s"g${i % 5}", i,
        math.rint(rnd.nextInt(30) / 29.0 * 10000) / 10000.0,
        rnd.nextInt(900).toLong + 1)
    }
    val got = SketchOps.groupedBudgetPrefix(
        rows.toDF("g", "id", "score", "w").repartition(4), 0.4)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(4))).toMap
    val expect = scala.collection.mutable.Map.empty[(String, Long), Long]
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val budget = math.floor(rs.map(_._4).sum * 0.4).toLong
      var run = 0L
      rs.sortBy { case (_, id, sc, _) => (-sc, id) }.foreach { case (_, id, _, w) =>
        run += w
        if (run <= budget) expect((g, id)) = run
      }
    }
    assert(got == expect.toMap)
  }

  test("budgetPrefix == windowed brute force, including the all-selected " +
      "and tie-heavy cases") {
    val spark2 = spark
    import spark2.implicits._
    for ((shape, frac) <- Seq(("uniform", 0.5), ("constant", 0.99), ("zipf", 0.25))) {
      val rnd = new scala.util.Random(shape.hashCode)
      val rows = (0L until 400L).map { i =>
        (i, math.rint(rnd.nextInt(20) / 19.0 * 10000) / 10000.0, // 4dp scores w/ ties
          longs(i.toInt, 1, shape).head.abs % 1000 + 1)
      }
      val got = SketchOps.budgetPrefix(rows.toDF("id", "score", "w"), frac)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
      val budget = math.floor(rows.map(_._3).sum * frac).toLong
      var run = 0L
      val expect = scala.collection.mutable.Map.empty[Long, Long]
      rows.sortBy { case (id, sc, _) => (-sc, id) }.foreach { case (id, _, w) =>
        run += w
        if (run <= budget) expect(id) = run
      }
      assert(got == expect.toMap, s"$shape frac=$frac")
    }
  }
}
