package graft

import org.apache.spark.sql.functions._

/** Round-16 coverage: the IVF-bounded bitext path (q320), the REAL
  * javax.imageio encode→decode round-trip under the oracle gate (q321),
  * the Fleiss-kappa degenerate-corpus guard, and the corrupt-image-body
  * decode contract. Every test EXECUTES a plan (the round-13 lesson). */
class Round16OpsSpec extends SparkSpec {

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q320: IVF-bounded bitext pairs are reciprocal within the cell-" +
      "candidate frame and match an exact in-memory recompute of the " +
      "cell-restricted margin algebra") {
    val dir = "/root/testdata/sf0.001"
    val out = operators.VectorOps.q320BitextIvf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.nonEmpty, "fixture should mine some pairs")
    assert(out.map(_._1).distinct.length === out.length)
    assert(out.map(_._2).distinct.length === out.length)
    // in-memory reference: cells by argmax r6-cosine against the first-8
    // centroids (smallest cent_id wins ties — the assignCells order),
    // candidates = same-cell pairs, then the q317 rank/margin algebra
    // restricted to each src's candidate set
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val lang = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def cosR6(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      r6(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    // cells from the TRAINED coarse quantizer (round 17): replay the
    // trainer in memory — md5-ordered seed of k, 2 Lloyd rounds with
    // 6dp-rounded means — and argmax-assign against the result; the
    // query's own assignment goes through the same trainCentroids path,
    // so this is an independent recompute, not a tautology
    def md5hex(s0: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // the ENGINE's k sizing — re-deriving it here with a cap would make
    // the replay diverge (for the wrong reason) on any fixture > 4096
    // vectors, since production ivfK is deliberately uncapped
    val k = operators.VectorOps.ivfK(emb.size.toLong)
    var cents: Seq[(Long, Array[Double])] = emb.keys.toSeq
      .sortBy(id => md5hex(id.toString)).take(k).sorted
      .map(id => id -> emb(id))
    def assign(cs: Seq[(Long, Array[Double])]): Map[Long, Long] =
      emb.map { case (id, v) =>
        id -> cs.map { case (cid, cv) => (cid, cosR6(v, cv)) }
          .minBy { case (cid, c) => (-c, cid) }._1
      }
    for (_ <- 1 to 2) {
      val a = assign(cents)
      val members = emb.keys.groupBy(a)
      cents = cents.map { case (cid, old) =>
        cid -> members.get(cid).map { ms =>
          val n = ms.size
          (0 until 64).map(i =>
            r6(ms.iterator.map(m => emb(m)(i)).sum / n)).toArray
        }.getOrElse(old)
      }
    }
    val cells = assign(cents)
    def side(l: String) = emb.keys.filter(id =>
      lang.get(id).contains(l)).toSeq.sorted
    val (en, de) = (side("en"), side("de"))
    def cm(a: Long, b: Long): Long = math.round(cosR6(emb(a), emb(b)) * 1e6)
    // every emitted pair shares a cell — the candidate bound is real
    out.foreach { case (s, t, _, _) =>
      assert(cells(s) === cells(t), s"pair ($s,$t) crosses cells")
    }
    val expected = (for {
      s <- en
      cand = de.filter(t => cells(t) == cells(s))
      if cand.nonEmpty
      t = cand.minBy(t0 => (-cm(s, t0), t0))
      // reciprocal: s must be t's best among t's same-cell en candidates
      if en.filter(s0 => cells(s0) == cells(t))
        .minBy(s0 => (-cm(s0, t), s0)) == s
    } yield {
      val top = cand.map(x => cm(s, x)).sorted(Ordering[Long].reverse).take(4)
      val margin = r6((top.head * top.length - top.sum).toDouble /
        (top.length.toDouble * 1e6))
      (s, t, cm(s, t) / 1e6, margin)
    }).toSet
    val got = out.map { case (s, t, c, m) =>
      (s, t, math.round(c * 1e6) / 1e6, m)
    }.toSet
    assert(got === expected, s"ivf bitext drifted:\n got=$got\n want=$expected")
    // and the candidate bound actually bit: fewer or equal pairs than the
    // brute-force exact baseline would ever admit per side
    assert(out.length <= math.min(en.length, de.length))
  }

  test("q321: the real javax.imageio PNG encode->decode round-trip " +
      "reproduces the md5-derived pixel aHash for every media row") {
    val dir = "/root/testdata/sf0.001"
    val out = operators.ComposeOps.q321ImageioAhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val ids = Tables.events(spark, dir)
      .select(col("event_id")).collect().map(_.getLong(0)).toSeq
    assert(out.length === ids.length, "one hash per media row")
    val md = java.security.MessageDigest.getInstance("MD5")
    def expectedHash(id: Long): String = {
      val pix = (0 until 64).map { i =>
        md.reset()
        md.digest(s"$id:$i".getBytes("UTF-8"))(0) & 0xff
      }
      val total = pix.map(_.toLong).sum
      pix.map(p => if (p.toLong * 64L > total) '1' else '0').mkString
    }
    out.foreach { case (id, kind, ahash) =>
      assert(kind === "png")
      assert(ahash != null, s"decode returned null for $id — imageio failed")
      assert(ahash === expectedHash(id),
        s"decoded grid drifted from the md5 pixels at media $id")
    }
  }

  test("decodeImage8x8 returns None (and extractImageAHash a null row) " +
      "for a payload with a valid PNG header but corrupt body — a decode " +
      "exception must not kill the task") {
    import graft.multimodal.Multimodal
    // a real PNG, then truncate: ImageIO matches the PNG reader on the
    // magic header and THROWS from the body parse (the case ADVICE r15
    // flagged: ImageIO.read only returns null when NO reader matches)
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val whole = bos.toByteArray
    val truncated = whole.take(24)
    assert(Multimodal.decodeImage8x8(truncated).isEmpty,
      "corrupt body must yield None, not throw")
    assert(Multimodal.decodeImage8x8("notanimage".getBytes).isEmpty)
    assert(Multimodal.decodeImage8x8(whole).nonEmpty, "the intact PNG decodes")
    // and through the task seam: the row survives with a null feature
    val spark2 = spark
    import spark2.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "png", truncated),
      Multimodal.MediaRow(2L, "png", whole)).toDS()
    val rows = Multimodal.extractImageAHash(media).collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(rows(1L) === None, "corrupt image keeps its row, null ahash")
    assert(rows(2L).exists(_.length == 64))
  }

  test("q322: bigram diversity matches an exact in-memory recompute " +
      "(counts, distinct ratio, micro-quantized entropy)") {
    val dir = "/root/testdata/sf0.001"
    val out = operators.TextOps.q322NgramDiversity(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val grams = ds.flatMap { case (_, text) =>
        val t = text.split(" ")
        t.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      }
      val counts = grams.groupBy(identity).map(_._2.length.toLong)
      val n2 = counts.sum
      val tm = counts.map(c =>
        math.round((math.log(n2.toDouble) - math.log(c.toDouble)) *
          c.toDouble * 1e6)).sum
      src -> (n2, counts.size.toLong,
        r6(counts.size.toDouble / n2), r6(tm.toDouble / (n2 * 1e6)))
    }
    assert(out === expected)
    // sanity: entropy positive, ratio in (0, 1]
    out.values.foreach { case (_, _, ratio, ent) =>
      assert(ratio > 0 && ratio <= 1.0 && ent > 0)
    }
  }

  test("q323: effective yield books every token exactly once and every " +
      "dup group keeps exactly its min-doc_id survivor") {
    val dir = "/root/testdata/sf0.001"
    val out = operators.TextOps.q323EffectiveYield(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(text: String): String = {
      md.reset()
      md.digest(text.split(" ").take(8).mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val keeps = docs.groupBy(d => key(d._3)).map(_._2.map(_._1).min).toSet
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val nTok = ds.map(_._3.split(" ").length.toLong)
      val keptTok = ds.collect {
        case (id, _, t) if keeps(id) => t.split(" ").length.toLong
      }
      src -> (ds.length.toLong, nTok.sum, keptTok.length.toLong,
        keptTok.sum, r6(keptTok.sum.toDouble / nTok.sum))
    }
    assert(out === expected)
    // cross-source conservation: total keeps = number of dup groups
    assert(out.values.map(_._3).sum === keeps.size.toLong)
  }

  test("q324: the DoReMi step emits weights that sum to ~1, order " +
      "domains by loss, and match the exact micro-integer recompute") {
    val dir = "/root/testdata/sf0.001"
    val out = operators.TextOps.q324DoremiStep(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val w4s = docs.map { case (src, text) =>
      val toks = text.split(" ")
      val nTok = toks.length.toLong
      val nStop = toks.count(Set("the", "a", "of", "and")).toLong
      val q = r6(math.min(1.0, nTok / 100.0) * (1.0 - nStop.toDouble / nTok))
      val q4 = BigDecimal(q).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      (src, math.round(q4 * 1e4))
    }
    val dom = w4s.groupBy(_._1).map { case (src, xs) =>
      val loss = r6(1.0 - xs.map(_._2).sum.toDouble / (xs.length * 1e4))
      (src, xs.length.toLong, loss, math.round(math.exp(loss) * 1e6))
    }
    val z = dom.map(_._4).sum
    val expected = dom.map { case (src, n, loss, em) =>
      src -> (n, loss, r6(em.toDouble / z))
    }.toMap
    assert(out === expected)
    val wsum = out.values.map(_._3).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to $wsum")
    // monotone: higher loss never gets a lower weight
    val byLoss = out.values.toSeq.sortBy(_._2)
    assert(byLoss.map(_._3) === byLoss.map(_._3).sorted)
  }

  test("q325: vocab coverage ranks are integer-exact — k90/k99 are the " +
      "smallest count-ordered prefixes reaching the coverage bars") {
    val dir = "/root/testdata/sf0.001"
    val out = operators.TextOps.q325VocabCoverage(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toMap
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val counts = ds.flatMap(_._2.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (t, g) => (t, g.length.toLong) }
        .toSeq.sortBy { case (t, c) => (-c, t) }
      val nt = counts.map(_._2).sum
      val cum = counts.scanLeft(0L)(_ + _._2).tail
      def bar(num: Long, den: Long) =
        (cum.indexWhere(c => c * den >= nt * num) + 1).toLong
      src -> (counts.length.toLong, nt, bar(9, 10), bar(99, 100),
        counts.head._1)
    }
    assert(out === expected)
    out.values.foreach { case (vocab, _, k90, k99, _) =>
      assert(k90 <= k99 && k99 <= vocab)
    }
  }

  test("q333: global keeps are a subset of local keeps per source, the " +
      "gap is exactly the cross-shard duplicate mass, and counts match " +
      "an in-memory recompute") {
    val dir = "/root/testdata/sf0.001"
    val out = operators.TextOps.q333GlobalVsLocalDedup(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(7))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(text: String): String = {
      md.reset()
      md.digest(text.split(" ").take(8).mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").length.toLong, key(r.getString(2))))
    val gkeep = docs.groupBy(_._4).map(_._2.map(_._1).min).toSet
    val lkeep = docs.groupBy(d => (d._4, d._2)).map(_._2.map(_._1).min).toSet
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val g = ds.collect { case (id, _, n, _) if gkeep(id) => n }.sum
      val l = ds.collect { case (id, _, n, _) if lkeep(id) => n }.sum
      src -> (ds.length.toLong, ds.map(_._3).sum, g, l, l - g)
    }
    assert(out === expected)
    // global ⊆ local: the gap is never negative, and somewhere positive
    // (the fixture has cross-shard copies)
    assert(out.values.forall(v => v._5 >= 0))
    assert(out.values.exists(_._5 > 0), "fixture must cross shards")
  }

  test("q334: semantic eval proximity reports each eval vector's true " +
      "nearest training vector under the rounded-cosine order") {
    val dir = "/root/testdata/sf0.001"
    val out = operators.VectorOps.q334SemanticEvalProximity(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2),
        r.getLong(3))).toMap
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cm(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      math.round(r6(dot / (math.sqrt(na) * math.sqrt(nb))) * 1e6)
    }
    val (ev, tr) = emb.keys.toSeq.sorted.partition(_ % 31 == 0)
    assert(out.keySet === ev.toSet)
    ev.foreach { e =>
      val scored = tr.map(t => (t, cm(emb(e), emb(t))))
      val (bestId, bestCm) = scored.minBy { case (t, c) => (-c, t) }
      val (gCos, gNear, gClose) = out(e)
      assert(gNear === bestId, s"eval $e nearest")
      assert(gCos === r6(bestCm.toDouble / 1e6), s"eval $e cos")
      assert(gClose === scored.count(_._2 >= 500000L).toLong, s"eval $e close")
    }
  }

  test("q335: the IVF proximity screen only under-reports q334 — every " +
      "screened cosine is <= the exact nearest, n_close is a lower " +
      "bound, and a same-cell exact nearest matches exactly") {
    val dir = "/root/testdata/sf0.001"
    val exact = operators.VectorOps.q334SemanticEvalProximity(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2),
        r.getLong(3))).toMap
    val screen = operators.VectorOps.q335ProximityScreenIvf(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(screen.nonEmpty && screen.keySet.subsetOf(exact.keySet))
    screen.foreach { case (e, (cos, _, nClose)) =>
      assert(cos <= exact(e)._1 + 1e-9, s"eval $e screen overshot exact")
      assert(nClose <= exact(e)._3, s"eval $e n_close must lower-bound")
    }
    // precision-1 direction: when the exact nearest shares the eval's
    // cell, the screen reports exactly it
    val sameCell = screen.filter { case (e, (cos, near, _)) =>
      cos == exact(e)._1 && near == exact(e)._2
    }
    assert(sameCell.nonEmpty,
      "fixture should have same-cell nearest neighbors")
  }

  test("q332: multi-probe bitext is one-to-one, meets only in the src's " +
      "top-2 cells, and its recall vs exact q317 is >= single-probe q320's") {
    val dir = "/root/testdata/sf0.001"
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("src_id"), col("tgt_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mp = pairsOf(operators.VectorOps.q332BitextMultiprobe(spark, dir))
    val sp = pairsOf(operators.VectorOps.q320BitextIvf(spark, dir))
    val exact = pairsOf(operators.VectorOps.q317BitextMining(spark, dir))
    assert(mp.nonEmpty)
    assert(mp.map(_._1).size === mp.size && mp.map(_._2).size === mp.size,
      "reciprocal pairs are one-to-one")
    val recallMp = (mp & exact).size.toDouble / exact.size
    val recallSp = (sp & exact).size.toDouble / exact.size
    assert(recallMp >= recallSp,
      s"probing 2 cells must not lose recall: $recallMp vs $recallSp")
    // cell consistency: every pair's tgt cell is among the src's top-2
    val ranked = operators.VectorOps.rankedCells(
        Tables.embeddings(spark, dir).select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v")))
      .select(col("vec_id"), col("cent_id"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val top2 = ranked.filter(_._3 <= 2).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val cell1 = ranked.filter(_._3 == 1).map(x => x._1 -> x._2).toMap
    mp.foreach { case (s, t) =>
      assert(top2(s).contains(cell1(t)), s"pair ($s,$t) met outside probes")
    }
  }

  test("q331: the novelty curve books each dup group once, in its " +
      "lexicographically-first shard, at its representative's tokens") {
    val dir = "/root/testdata/sf0.001"
    val out = operators.TextOps.q331NoveltyCurve(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getLong(6))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(text: String): String = {
      md.reset()
      md.digest(text.split(" ").take(8).mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").length.toLong, key(r.getString(2))))
    val novelBySrc = docs.groupBy(_._4).values.map { g =>
      val fs = g.map(_._2).min
      val rep = g.filter(_._2 == fs).minBy(_._1)
      (fs, rep._3)
    }.toSeq.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toMap
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val (ng, nt) = novelBySrc.getOrElse(src, (0L, 0L))
      src -> (ds.length.toLong, ds.map(_._3).sum, ng, nt,
        r6(nt.toDouble / ds.map(_._3).sum))
    }
    assert(out.view.mapValues(v =>
      (v._1, v._2, v._3, v._4, v._5)).toMap === expected)
    // cumulative column: running sum over lexicographic source order,
    // total = one representative's tokens per distinct dup group
    val srcs = out.keys.toSeq.sorted
    val cums = srcs.scanLeft(0L)((acc, s) => acc + out(s)._4).tail
    assert(srcs.map(s => out(s)._6) === cums)
    assert(cums.last === novelBySrc.values.map(_._2).sum)
  }

  test("bitextMarginPairs property: over random integer micro-cosine " +
      "pair frames, the output is exactly the reciprocal best matches " +
      "with top-4 margins (ties broken by id, both windows)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val spark2 = spark
    import spark2.implicits._
    val frameGen = for {
      nSrc <- Gen.chooseNum(1, 7)
      nTgt <- Gen.chooseNum(1, 7)
      // small cm range FORCES ties — the tiebreak paths must fire
      cms <- Gen.listOfN(nSrc * nTgt, Gen.chooseNum(-3L, 3L))
    } yield for {
      s <- 0 until nSrc; t <- 0 until nTgt
    } yield (s.toLong, (100 + t).toLong, cms(s * nTgt + t))
    (0 until 25).foreach { i =>
      val rows = frameGen(Gen.Parameters.default, Seed(777L + i)).get
      val pairs = rows
        .toDF("src_id", "tgt_id", "cm")
        .withColumn("cos", col("cm").cast("double") / 1e6)
        .select(col("src_id"), col("tgt_id"), col("cos"), col("cm"))
      val got = operators.VectorOps.bitextMarginPairs(pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
      val bySrc = rows.groupBy(_._1)
      val byTgt = rows.groupBy(_._2)
      def best[A](xs: Seq[(Long, Long, Long)], pick: ((Long, Long, Long)) => Long) =
        xs.minBy(x => (-x._3, pick(x)))
      val expected = bySrc.flatMap { case (s, xs) =>
        val b = best(xs.toSeq, _._2)
        val recip = best(byTgt(b._2).toSeq, _._1)
        if (recip._1 == s) {
          val top = xs.map(_._3).toSeq.sorted(Ordering[Long].reverse).take(4)
          val margin = BigDecimal((top.head * top.length - top.sum).toDouble /
            (top.length.toDouble * 1e6))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          Some((s, b._2, margin))
        } else None
      }.toSet
      assert(got === expected, s"seed ${777 + i}:\n got=$got\n want=$expected")
    }
  }

  test("q330: soft dedup conserves one document's mass per duplicate " +
      "group and matches the micro-quantized in-memory recompute") {
    val dir = "/root/testdata/sf0.001"
    val out = operators.TextOps.q330SoftDedup(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(text: String): String = {
      md.reset()
      md.digest(text.split(" ").take(8).mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val copies = docs.groupBy(d => key(d._3)).view
      .mapValues(_.length.toLong).toMap
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val perDoc = ds.map { case (_, _, t) =>
        val n = t.split(" ").length.toLong
        (n, math.round(n.toDouble * 1e6 / copies(key(t)).toDouble))
      }
      val (nTok, soft) = (perDoc.map(_._1).sum, perDoc.map(_._2).sum)
      src -> (ds.length.toLong, nTok,
        BigDecimal(soft.toDouble / 1e6)
          .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble,
        r6(soft.toDouble / (nTok.toDouble * 1e6)))
    }
    assert(out === expected)
    // conservation: each dup group contributes exactly its MEAN member
    // length (Σ n_i/g over g members), up to micro rounding
    val totalSoft = out.values.map(_._3).sum
    val groupMass = docs.groupBy(d => key(d._3)).values
      .map(g => g.map(_._3.split(" ").length.toDouble).sum / g.length).sum
    assert(math.abs(totalSoft - groupMass) < 0.01 * groupMass,
      s"soft mass $totalSoft vs group mass $groupMass")
  }

  test("q329: the epoch plan composes q323's kept tokens with q324's " +
      "raw em/z ratio — epochs = ceil(w*B/kept), cap flag at > 4") {
    val dir = "/root/testdata/sf0.001"
    val out = operators.TextOps.q329EpochPlan(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getBoolean(4))).toMap
    val yld = operators.TextOps.q323EffectiveYield(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap // kept_tokens
    val md = java.security.MessageDigest.getInstance("MD5")
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val em = docs.groupBy(_._1).map { case (src, ds) =>
      val w4s = ds.map { case (_, text) =>
        val toks = text.split(" ")
        val q = r6(math.min(1.0, toks.length / 100.0) *
          (1.0 - toks.count(Set("the", "a", "of", "and")).toDouble /
            toks.length))
        math.round(BigDecimal(q).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble * 1e4)
      }
      val loss = r6(1.0 - w4s.sum.toDouble / (w4s.length * 1e4))
      src -> math.round(math.exp(loss) * 1e6)
    }
    val z = em.values.sum
    val budget = yld.values.sum * 4
    val expected = em.map { case (src, e) =>
      val epochs = math.ceil(
        e.toDouble / z * budget.toDouble / yld(src).toDouble).toLong
      src -> (yld(src), r6(e.toDouble / z), epochs, epochs > 4)
    }
    assert(out === expected)
    // the over-subscribed budget makes the cap flag non-vacuous
    assert(out.values.exists(_._4) || out.values.forall(_._3 > 1),
      "plan must exercise multi-epoch territory")
    md.reset()
  }

  test("q328: the IVF-bitext recall eval books exactly q317's and " +
      "q320's pair sets and their intersection") {
    val dir = "/root/testdata/sf0.001"
    val row = operators.VectorOps.q328BitextIvfRecall(spark, dir)
      .collect().head
    val exact = operators.VectorOps.q317BitextMining(spark, dir)
      .select(col("src_id"), col("tgt_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = operators.VectorOps.q320BitextIvf(spark, dir)
      .select(col("src_id"), col("tgt_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val shared = exact & ivf
    assert(row.getLong(0) === exact.size.toLong)
    assert(row.getLong(1) === ivf.size.toLong)
    assert(row.getLong(2) === shared.size.toLong)
    assert(row.getDouble(3) === r6(shared.size.toDouble / exact.size))
    assert(row.getDouble(4) === r6(shared.size.toDouble / ivf.size))
    // the relaxation is real but not vacuous at the fixture's 8 cells
    assert(shared.nonEmpty && row.getDouble(3) <= 1.0)
  }

  test("q326: canary scan finds exactly the docs containing an eval " +
      "doc's 4-token opening as a contiguous token run") {
    val dir = "/root/testdata/sf0.001"
    val out = operators.TextOps.q326CanaryScan(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").toSeq))
    val canaries = docs.collect {
      case (id, _, toks) if id % 31 == 0 && toks.length >= 4 =>
        id -> toks.take(4).mkString(" ")
    }
    val hits = (for {
      (id, src, toks) <- docs if toks.length >= 4
      runs = toks.sliding(4).map(_.mkString(" ")).toSet
      (evalId, c) <- canaries if id != evalId && runs(c)
    } yield (src, id, evalId)).distinct
    assert(hits.nonEmpty, "fixture must plant at least one hit")
    val expected = hits.groupBy(_._1).map { case (src, hs) =>
      src -> (hs.map(_._2).distinct.length.toLong, hs.length.toLong,
        hs.map(_._2).min, hs.map(_._3).min)
    }
    assert(out === expected)
  }

  test("q327: the banding-precision sample is the md5-deterministic 1/16 " +
      "of q34's candidate pairs, verified at exact distinct-shingle " +
      "Jaccard >= 0.5") {
    val dir = "/root/testdata/sf0.001"
    val row = operators.TextOps.q327LshPrecisionSample(spark, dir)
      .collect().head
    val (nCand, nSamp, nTrue) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    // reference pair list = q34's own (oracled) candidates
    val pairs = operators.TextOps.q34MinhashLsh(spark, dir)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nCand === pairs.length.toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex1(s: String): Char = {
      md.reset()
      "%02x".format(md.digest(s.getBytes("UTF-8"))(0)).charAt(0)
    }
    val sampled = pairs.filter { case (a, b) => hex1(s"$a:$b") == '0' }
    assert(nSamp === sampled.length.toLong)
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val t = r.getString(1).split(" ")
        r.getLong(0) ->
          t.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }.toMap
    val trueN = sampled.count { case (a, b) =>
      val (sa, sb) = (sh(a), sh(b))
      val un = (sa ++ sb).size
      un > 0 && (sa & sb).size * 2 >= un
    }
    assert(nTrue === trueN.toLong)
    assert(nSamp > 0, "the 1/16 sample must be non-vacuous at sf0.001")
    val p = row.getDouble(3)
    assert(p >= 0.0 && p <= 1.0 &&
      p === r6(trueN.toDouble / sampled.length))
  }

  test("xsd:duration (the union supertype) routes static literals to the " +
      "subtype rung their lexical inhabits: dayTime-shaped values BIND/" +
      "compare/aggregate like dayTimeDuration, Y/M-shaped like " +
      "yearMonthDuration, and a MIXED lexical is unbound (documented " +
      "deviation: mixed durations have no total order even in XPath)") {
    import graft.plans.SparqlText
    val spark2 = spark
    import spark2.implicits._
    val one = Seq(("s", "p", "o")).toDF("s", "p", "o")
    val lbl = Seq(("e", "en", "l")).toDF("entity", "lang", "label")
    // dayTime-shaped: value algebra + comparison, identical to the subtype
    val dt = SparqlText.run(
      """SELECT ("P1DT2H"^^xsd:duration + "PT1H"^^xsd:duration AS ?add)
        |       (IF("P2D"^^xsd:duration > "P1DT23H"^^xsd:duration,
        |           "gt", "le") AS ?cmp)
        |WHERE { ?s ?p ?o }""".stripMargin, one, lbl).collect().head
    assert(dt.getString(0) === "P1DT3H")
    assert(dt.getString(1) === "gt")
    // yearMonth-shaped: lands on the month carrier, not seconds
    val ym = SparqlText.run(
      """SELECT ("P1Y"^^xsd:duration + "P2M"^^xsd:duration AS ?add)
        |       (IF("P1Y"^^xsd:duration > "P11M"^^xsd:duration,
        |           "gt", "le") AS ?cmp)
        |WHERE { ?s ?p ?o }""".stripMargin, one, lbl).collect().head
    assert(ym.getString(0) === "P1Y2M")
    assert(ym.getString(1) === "gt")
    // aggregates: a BIND'd xsd:duration flows through SUM/MIN like its
    // subtype (three rows, one duration each)
    val three = Seq(("a", "p", "1"), ("b", "p", "2"), ("c", "p", "3"))
      .toDF("s", "p", "o")
    val agg = SparqlText.run(
      """SELECT (SUM(?d) AS ?tot) (MIN(?d) AS ?lo) WHERE {
        |  ?s ?p ?o .
        |  BIND(IF(?o = "1", "PT1H"^^xsd:duration,
        |        IF(?o = "2", "PT2H"^^xsd:duration,
        |                   "PT3H"^^xsd:duration)) AS ?d)
        |}""".stripMargin, three, lbl).collect().head
    assert(agg.getString(0) === "PT6H")
    assert(agg.getString(1) === "PT1H")
    // mixed lexical: outside both subtype grammars -> unbound, loudly
    // nothing (never a fabricated value or a crash)
    val mixed = SparqlText.run(
      """SELECT ("P1Y2M3DT4H"^^xsd:duration AS ?v)
        |       (BOUND(?u) AS ?b)
        |WHERE { ?s ?p ?o . BIND("P1Y1D"^^xsd:duration AS ?u) }"""
        .stripMargin, one, lbl).collect().head
    assert(Option(mixed.getString(0)) === None, "mixed lexical is unbound")
    assert(mixed.getBoolean(1) === false, "BIND of a mixed lexical is unbound")
  }

  test("q315 emits NULL kappa (both engines' guard) on a degenerate " +
      "corpus where every rating lands in one category (pe = 1)") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fleissdeg").toFile
    try {
      // 8 docs, all n_chars < 150 -> every item all-cat-0 -> pe = 1
      (0L until 8L).map(i => (i, s"t $i", "en", "src", 10L + i))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(new java.io.File(dir, "documents.parquet").getAbsolutePath)
      val row = operators.TextOps.q315FleissKappa(
        spark, dir.getAbsolutePath).collect().head
      assert(row.getLong(0) === 2L, "two full items")
      assert(row.getDouble(6) === 1.0, "pe must be exactly 1")
      assert(row.isNullAt(7),
        "kappa must be NULL when 1 - pe = 0, not NaN")
    } finally graft.util.Fs.deleteRecursively(dir)
  }
}
