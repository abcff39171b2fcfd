package graft

import org.apache.spark.sql.functions._

/** Round-17 coverage: the trained IVF coarse quantizer and its
  * consumers, the oversized-cell diversion for the bitext cell join,
  * size-guarded eval broadcasts, the size-routed bitext entry point,
  * and the q329 zero-yield guard. Every test EXECUTES a plan (the
  * round-13 lesson). */
class Round17OpsSpec extends SparkSpec {

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q329: a source whose every dup-group keeper lives in another " +
      "source reports null epochs/cap instead of Long.MaxValue") {
    val s2 = spark
    import s2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q329zero").toString
    // source b's only doc duplicates source a's keeper (same first-8
    // token prefix, smaller doc_id wins) -> kept_tokens(b) = 0
    Seq(
      (0L, "a", "x y z common prefix tokens here now"),
      (1L, "b", "x y z common prefix tokens here now"),
      (2L, "a", "another wholly distinct document body text")
    ).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.TextOps.q329EpochPlan(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.isNullAt(3), r.isNullAt(4))).toMap
    assert(out("b")._1 === 0L, "fixture must produce a zero-yield source")
    assert(out("b")._2 && out("b")._3,
      "zero kept_tokens must null epochs and over_epoch_cap, not " +
        "overflow to Long.MaxValue")
    assert(!out("a")._2 && !out("a")._3,
      "the live source keeps its real epoch figure")
    util.Fs.deleteRecursively(new java.io.File(dir))
  }

  test("ivfK: the coarse-quantizer width follows max(8, sqrt(N)) — " +
      "UNCAPPED (the strategy, not the width, changes past the " +
      "literal-codegen limit)") {
    assert(operators.VectorOps.ivfK(10) === 8)
    assert(operators.VectorOps.ivfK(500) === 22)
    assert(operators.VectorOps.ivfK(2000) === 45)
    assert(operators.VectorOps.ivfK(10000000) === 3162)
  }

  test("assignment strategy parity: the broadcast max-struct argmax " +
      "and window ranking reproduce the literal plans exactly on the " +
      "same trained centroids") {
    val s2 = spark
    import s2.implicits._
    def mk(j: Int): Seq[Double] =
      (0 until 64).map(i => math.sin(j * 64 + i * 0.7) + (j % 4) * 2.0)
    val e = (0 until 80).map(j => (j.toLong, mk(j))).toDF("vec_id", "v")
    graft.functions.CosineSimilarity.register(spark)
    val cents = operators.VectorOps.trainCentroids(e) // k=8 < 64: literal
    val lit0 = operators.VectorOps.assignCells(e, cents).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val bc = operators.VectorOps.assignCellsBroadcast(e, cents).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(lit0 === bc, "broadcast argmax drifted from the literal plan")
    def ranked(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(4)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val rl = ranked(operators.VectorOps.rankedCells(e, cents, maxRn = 2))
    val rb = ranked(operators.VectorOps.rankedCellsBroadcast(e, cents, 2))
    assert(rl === rb, "broadcast ranking drifted from the literal plan")
  }

  test("past IvfLiteralMaxK the quantizer trains and assigns through " +
      "the broadcast strategy, matching an in-memory argmax") {
    val s2 = spark
    import s2.implicits._
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 4900 vectors -> k = 70 > IvfLiteralMaxK: the fallback is live
    def mk(j: Int): Seq[Double] =
      (0 until 8).map(i => math.sin(j * 8 + i * 0.37) + (j % 5) * 1.5)
    val rows = (0 until 4900).map(j => (j.toLong, mk(j)))
    val e = rows.toDF("vec_id", "v")
    graft.functions.CosineSimilarity.register(spark)
    val cents = operators.VectorOps.trainCentroids(e)
    assert(cents.length === 70)
    val assigned = operators.VectorOps.assignCells(e, cents).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
      r6(dot / (math.sqrt(a.iterator.map(x => x * x).sum) *
        math.sqrt(b.iterator.map(x => x * x).sum)))
    }
    rows.foreach { case (id, v) =>
      val want = cents.map { case (cid, cv) => (cid, cos(v, cv)) }
        .minBy { case (cid, c) => (-c, cid) }._1
      assert(assigned(id) === want, s"vec $id off-argmax at k=70")
    }
  }

  test("trainCentroids: deterministic, locks onto cluster structure, " +
      "and assignCells matches an in-memory argmax over the trained " +
      "centroids") {
    val s2 = spark
    import s2.implicits._
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 3 well-separated direction clusters (60 vectors -> k = 8)
    def mk(cluster: Int, j: Int): Seq[Double] =
      (0 until 64).map(i =>
        (if (i % 3 == cluster) 5.0 else 0.1) + 0.01 * math.sin(j * 64 + i))
    val rows = (0 until 60).map(j => (j.toLong, mk(j % 3, j)))
    val e = rows.toDF("vec_id", "v")
    graft.functions.CosineSimilarity.register(spark)
    val c1 = operators.VectorOps.trainCentroids(e)
    val c2 = operators.VectorOps.trainCentroids(e)
    assert(c1.toSeq.map { case (id, v) => (id, v.toList) } ===
      c2.toSeq.map { case (id, v) => (id, v.toList) },
      "training must be deterministic")
    assert(c1.length === 8)
    val assigned = operators.VectorOps.assignCells(e, c1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // in-memory argmax over the trained centroids (6dp cosine, smallest
    // cent_id tie) must reproduce the zero-shuffle literal plan
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.iterator.map(x => x * x).sum)
      val nb = math.sqrt(b.iterator.map(x => x * x).sum)
      r6(dot / (na * nb))
    }
    val vm = rows.toMap
    rows.foreach { case (id, v) =>
      val want = c1.map { case (cid, cv) => (cid, cos(v, cv)) }
        .minBy { case (cid, c) => (-c, cid) }._1
      assert(assigned(id) === want, s"vec $id assigned off-argmax")
    }
    // training locks onto the 3 planted clusters: no cell mixes clusters
    val byCell = rows.groupBy { case (id, _) => assigned(id) }
    byCell.foreach { case (cell, ms) =>
      val clusters = ms.map { case (id, _) => id % 3 }.distinct
      assert(clusters.length === 1,
        s"cell $cell mixes planted clusters $clusters")
    }
    assert(vm.size === 60)
  }

  /** In-memory replay of the trained quantizer + top-2 cells over the
    * sf0.001 embeddings — the shared reference for the diversion and
    * router tests below. */
  private lazy val fixtureTop2: Map[Long, (Long, Long)] = {
    val dir = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, dir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    graft.functions.CosineSimilarity.register(spark)
    operators.VectorOps.rankedCells(
        e, operators.VectorOps.trainCentroids(e), maxRn = 2)
      .select(col("vec_id"), col("cent_id"), col("rn")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1).map { case (id, rs) =>
        val m = rs.map(x => x._3 -> x._2).toMap
        id -> (m(1), m(2))
      }
  }

  test("q320's oversized-cell diversion: under a small cap, hub-cell " +
      "pairs additionally share the second-choice cell, clean cells " +
      "are untouched, and the pair product is genuinely split") {
    val dir = "/root/testdata/sf0.001"
    val lang = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val top2 = fixtureTop2
    val en = top2.keys.filter(id => lang.get(id).contains("en")).toSeq
    val de = top2.keys.filter(id => lang.get(id).contains("de")).toSeq
    val cap = 5
    // per-cell per-side occupancy on the q320 frame (c1 only)
    val occ = (en.groupBy(id => top2(id)._1).view.mapValues(_.size).toMap,
      de.groupBy(id => top2(id)._1).view.mapValues(_.size).toMap)
    val cellsAll = (occ._1.keySet ++ occ._2.keySet)
    val over = cellsAll.filter(c =>
      math.max(occ._1.getOrElse(c, 0), occ._2.getOrElse(c, 0)) > cap)
    assert(over.nonEmpty, s"cap=$cap must force the diversion at sf0.001")
    assert(over.size < cellsAll.size, "some cells must stay clean")
    val out = operators.VectorOps.bitextIvfImpl(spark, dir, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.nonEmpty)
    // schema parity with the production entry point
    assert(operators.VectorOps.bitextIvfImpl(spark, dir, cap).schema ===
      operators.VectorOps.q320BitextIvf(spark, dir).schema)
    out.foreach { case (s0, t) =>
      assert(top2(s0)._1 === top2(t)._1, s"pair ($s0,$t) crosses cells")
      if (over(top2(s0)._1))
        assert(top2(s0)._2 === top2(t)._2,
          s"hub-cell pair ($s0,$t) must share the second-choice cell")
    }
    // the candidate frames: diverted cells split by alt on both sides
    val cleanCand = (for {
      s0 <- en; t <- de
      if top2(s0)._1 == top2(t)._1
    } yield (s0, t)).toSet
    val cappedCand = cleanCand.filter { case (s0, t) =>
      !over(top2(s0)._1) || top2(s0)._2 == top2(t)._2
    }
    assert(cappedCand.size < cleanCand.size,
      "the diversion must actually shrink the hub-cell pair frame")
    // every mined pair comes from the capped candidate set
    out.foreach { case (s0, t) =>
      assert(cappedCand((s0, t)), s"pair ($s0,$t) outside capped frame")
    }
  }

  test("q332's multi-probe diversion composes with the probe fan-out: " +
      "probing via c1 leaves c2 as the sub-key and vice versa") {
    val dir = "/root/testdata/sf0.001"
    val lang = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val top2 = fixtureTop2
    val en = top2.keys.filter(id => lang.get(id).contains("en")).toSeq
    val de = top2.keys.filter(id => lang.get(id).contains("de")).toSeq
    val cap = 5
    // q332's a-side census counts PROBE rows (both cells of every src)
    val aOcc = en.flatMap(id => Seq(top2(id)._1, top2(id)._2))
      .groupBy(identity).view.mapValues(_.size).toMap
    val bOcc = de.groupBy(id => top2(id)._1).view.mapValues(_.size).toMap
    val over = (aOcc.keySet ++ bOcc.keySet).filter(c =>
      math.max(aOcc.getOrElse(c, 0), bOcc.getOrElse(c, 0)) > cap)
    assert(over.nonEmpty, "cap=5 must force the multi-probe diversion")
    val out = operators.VectorOps.bitextMultiprobeImpl(spark, dir, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.nonEmpty)
    out.foreach { case (s0, t) =>
      val (s1, s2) = top2(s0)
      val tc = top2(t)._1
      assert(s1 == tc || s2 == tc, s"pair ($s0,$t) met outside probes")
      // if the meeting cell is oversized, the complementary probe cell
      // must match the tgt's second choice
      if (over(tc)) {
        val alt = if (s1 == tc) s2 else s1
        assert(alt === top2(t)._2,
          s"hub-cell probe pair ($s0,$t) must share the sub-key")
      }
    }
  }

  test("eval-set broadcasts are size-GUARDED, not conventional: an " +
      "over-bound eval side fails loudly naming the contract, and the " +
      "production bound keeps all three queries live") {
    val dir = "/root/testdata/sf0.001"
    // the sf0.001 eval split (doc_id % 31) has ~16 members — bound 3
    // forces each guard to fire
    def msgOf(t: => Any): String =
      intercept[IllegalArgumentException](t).getMessage
    val m1 = msgOf(operators.TextOps.canaryScanImpl(spark, dir, 3).collect())
    assert(m1.contains("eval-set bound") && m1.contains("q326"))
    val m2 = msgOf(
      operators.VectorOps.semanticEvalProximityImpl(spark, dir, 3).collect())
    assert(m2.contains("eval-set bound") && m2.contains("release gate"))
    val m3 = msgOf(
      operators.VectorOps.proximityScreenIvfImpl(spark, dir, 3).collect())
    assert(m3.contains("eval-set bound") && m3.contains("q335"))
    // and the shipped bound admits the real eval sets
    assert(operators.TextOps.q326CanaryScan(spark, dir).collect().nonEmpty)
    assert(operators.VectorOps.q334SemanticEvalProximity(spark, dir)
      .collect().nonEmpty)
    assert(operators.VectorOps.q335ProximityScreenIvf(spark, dir)
      .collect().nonEmpty)
  }

  test("q336 bitext router: the switch point is |en|*|de| <= bound " +
      "(BigInt — no Long overflow into the exact path), both routes " +
      "share one schema, and each route reproduces its target query") {
    import operators.VectorOps
    // switch point pinned exactly
    assert(VectorOps.bitextRouteExact(100, 100, 10000))
    assert(!VectorOps.bitextRouteExact(100, 101, 10000))
    assert(VectorOps.bitextRouteExact(0, 1000000000L, 0))
    // two 3e9-row sides: Long would overflow negative and route exact
    assert(!VectorOps.bitextRouteExact(3000000000L, 3000000000L,
      VectorOps.BitextExactPairBound))
    val dir = "/root/testdata/sf0.001"
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    val auto = VectorOps.q336BitextAuto(spark, dir)
    val exact = VectorOps.q317BitextMining(spark, dir)
    val ivf = VectorOps.q320BitextIvf(spark, dir)
    assert(auto.schema === exact.schema && auto.schema === ivf.schema,
      "both routes must produce one schema")
    // sf0.001 is far under the bound: the router must pick the exact frame
    assert(pairs(auto) === pairs(exact))
    // a 1-pair bound forces the IVF route on the same data
    assert(pairs(VectorOps.bitextAutoImpl(spark, dir, 1)) === pairs(ivf))
  }

  test("IVF-bitext recall FLOOR (the round-16 verdict's quality gate): " +
      "a refactor that silently craters single-probe recall turns this " +
      "red instead of staying oracle-green") {
    val dir = "/root/testdata/sf0.001"
    val row = operators.VectorOps.q328BitextIvfRecall(spark, dir)
      .collect().head
    val (nExact, recall, precision) =
      (row.getLong(0), row.getDouble(3), row.getDouble(4))
    assert(nExact > 0, "the eval needs a non-empty exact truth")
    // Measured at HEAD (round 17, trained k=22 quantizer, single
    // probe): recall 0.2745, precision 0.3415 at sf0.001 (0.2909 /
    // 0.2963 at sf0.01). The floors sit ~40% under the measured
    // values — far above the ~1/k ≈ 0.05 a broken (random-cell)
    // quantizer produces, far enough under the point estimate that
    // benign rounding drift cannot flap the gate.
    assert(recall >= 0.15,
      s"single-probe IVF-bitext recall crashed to $recall (< 0.15): " +
        "the coarse quantizer has regressed toward random cells")
    assert(precision >= 0.15,
      s"IVF-bitext precision crashed to $precision (< 0.15)")
  }

  test("q337/q338: the quantizer census books every vector exactly " +
      "once and the imbalance report matches the census") {
    val dir = "/root/testdata/sf0.001"
    val n = Tables.embeddings(spark, dir).count()
    val census = operators.VectorOps.q337QuantizerCensus(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(census.values.sum === n, "every vector in exactly one cell")
    assert(census.size === operators.VectorOps.ivfK(n),
      "one census row per trained cell")
    val imb = operators.VectorOps.q338IvfImbalance(spark, dir)
      .collect().head
    assert(imb.getLong(0) === census.size.toLong)
    assert(imb.getLong(1) === n)
    // k * sum(n_c^2) / N^2, same op order as both engines
    val want = BigDecimal(census.size.toDouble *
        census.values.map(c => (c * c).toDouble).sum / (n.toDouble * n.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(imb.getDouble(2) === want)
    assert(imb.getDouble(2) >= 1.0 - 1e-9, "imbalance is >= 1 by QM-AM")
    assert(imb.getLong(3) === census.values.max)
    assert(imb.getLong(4) === 0L, "no cell over the cap at this SF")
  }

  test("q339: the two-probe screen dominates the single-probe screen " +
      "per eval vector (superset candidates, still precision-1)") {
    val dir = "/root/testdata/sf0.001"
    def byEval(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(3)))
        .toMap
    val one = byEval(operators.VectorOps.q335ProximityScreenIvf(spark, dir))
    val two = byEval(operators.VectorOps.q339MultiprobeScreen(spark, dir))
    assert(two.nonEmpty)
    assert(one.keySet.subsetOf(two.keySet),
      "an eval vector screened single-probe is screened two-probe")
    one.foreach { case (id, (cos1, close1)) =>
      val (cos2, close2) = two(id)
      assert(cos2 >= cos1, s"eval $id: two-probe max_cos regressed")
      assert(close2 >= close1, s"eval $id: two-probe n_close regressed")
    }
  }

  test("q340/q341: multi-probe ADC candidates stay inside the query's " +
      "top-2 cells, the best ADC distance can only improve with the " +
      "second probe, and the recall eval books both arms") {
    val dir = "/root/testdata/sf0.001"
    val top2 = fixtureTop2
    val mp = operators.VectorOps.q340IvfpqMultiprobe(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(mp.nonEmpty)
    mp.foreach { case (q, cell, cand, _, _) =>
      val (c1, c2) = top2(q)
      assert(cell == c1 || cell == c2, s"query $q probed foreign cell $cell")
      assert(top2(cand)._1 === cell, s"candidate $cand not assigned to $cell")
      assert(cand !== q)
    }
    mp.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._4).sorted.toSeq === (1L to rs.length).toSeq,
        s"query $q ranks not dense")
    }
    val sp = operators.VectorOps.q193IvfpqSearch(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
    // NOT recall dominance (extra candidates can displace true hits in
    // an APPROXIMATE ranking) — the true invariant is on the best
    // achievable ADC distance: a superset candidate frame can only
    // improve (or keep) the rank-1 distance
    val best1 = sp.filter(_._2 == 1L).map(r => r._1 -> r._3).toMap
    val best2 = mp.filter(_._4 == 1L).map(r => r._1 -> r._5).toMap
    best1.foreach { case (q, d1) =>
      assert(best2(q) <= d1 + 1e-9,
        s"query $q: two-probe best ADC distance regressed ($d1 -> ${best2(q)})")
    }
    val rec = operators.VectorOps.q341AdcRecall(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rec.map(_._1).distinct.sorted.toSeq === Seq("adc1", "adc2"))
    assert(rec.count(_._1 == "adc1") === rec.count(_._1 == "adc2"))
    rec.foreach { case (_, _, k, nh, r) =>
      assert(k === 3L && nh >= 0L && nh <= k)
      assert(r === BigDecimal(nh.toDouble / k)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("q342/q343: residual IVFADC searches the query's own cell over " +
      "residual codes, and the gain eval books both encodings") {
    val dir = "/root/testdata/sf0.001"
    val top2 = fixtureTop2
    val rr = operators.VectorOps.q342IvfpqResidual(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rr.nonEmpty)
    rr.foreach { case (q, cell, cand, _, adist) =>
      assert(top2(q)._1 === cell, s"query $q searched a foreign cell")
      assert(top2(cand)._1 === cell, s"candidate $cand not in cell $cell")
      assert(cand !== q)
      assert(adist >= 0.0, "ADC distance is a sum of squared L2 terms")
    }
    rr.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._4).sorted.toSeq === (1L to rs.length).toSeq,
        s"query $q ranks not dense")
    }
    val gain = operators.VectorOps.q343ResidualGain(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(gain.map(_._1).distinct.sorted.toSeq === Seq("raw", "residual"))
    assert(gain.count(_._1 == "raw") === gain.count(_._1 == "residual"))
    gain.foreach { case (_, _, k, nh, r) =>
      assert(k === 3L && nh >= 0L && nh <= k)
      assert(r === BigDecimal(nh.toDouble / k)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("q146's hub-cell sub-cluster pass: under a small cap, prior-" +
      "similarity comparisons stay inside (cell, alt) sub-clusters, " +
      "keeps can only GROW (the conservative direction for a dedup), " +
      "and clean cells are untouched") {
    val dir = "/root/testdata/sf0.001"
    val top2 = fixtureTop2
    val occ = top2.values.groupBy(_._1).view.mapValues(_.size).toMap
    // cap at the occupancy median: some cells divert, some stay clean
    val cap = occ.values.toSeq.sorted.apply(occ.size / 2)
    val over = occ.filter(_._2 > cap).keySet
    assert(over.nonEmpty && over.size < occ.size,
      s"median cap=$cap must divert some cells and leave some clean")
    def keeps(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(4))).toMap
    val clean = keeps(operators.VectorOps.semanticDedupImpl(spark, dir,
      Int.MaxValue))
    val capped = keeps(operators.VectorOps.semanticDedupImpl(spark, dir, cap))
    assert(clean.keySet === capped.keySet, "every vector keeps its row")
    clean.foreach { case (id, (cell, keepClean)) =>
      val (cellC, keepCapped) = capped(id)
      assert(cell === cellC)
      if (!over(cell))
        assert(keepCapped === keepClean,
          s"vec $id in a CLEAN cell flipped its keep decision")
      else if (keepClean)
        assert(keepCapped,
          s"vec $id: the sub-cluster pass can only ADD keeps, " +
            "never drop one the full-cell pass kept")
    }
    assert(capped.values.count(_._2) >= clean.values.count(_._2))
  }
}
