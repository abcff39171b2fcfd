package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Rounding-boundary tripwire for the NB family's fixed-point oracle.
  *
  * Every hash-compared NB value is `CAST(round(ln(...)·Q) AS BIGINT)`
  * computed independently by Spark (JVM Math.log) and DuckDB (libm log).
  * The two engines agree iff no rounding input sits so close to a .5
  * boundary of the quantum that a last-ulp `ln` divergence flips the
  * long. This spec recomputes every such input — all token weights and
  * the class bias, at every gate scale factor — and asserts a margin
  * ≥ 1e-3 units (the observed minimum for Q = 962000 is 3.1e-2; a
  * realistic cross-libm drift is ≤ ~1e-8 units, so 1e-3 is still a
  * 10⁵× guard band). If a fixture regeneration ever lands a weight on
  * a boundary, this fails LOUDLY with the offending token instead of
  * surfacing as an undiagnosable driver hash mismatch (round-11's
  * q248 red row).
  */
class NbMarginSpec extends SparkSpec {

  private val quantum = 962000.0
  private val minMargin = 1e-3

  private def margin(x: Double): Double =
    math.abs(math.abs(x) * quantum % 1.0 - 0.5)

  for (sf <- Seq("0.001", "0.01", "0.1")) {
    val dir = s"/root/testdata/sf$sf"
    test(s"every NB rounding input clears the .5 boundary by >= $minMargin " +
        s"quantum units at sf$sf") {
      assume(new java.io.File(s"$dir/documents.parquet").exists())
      // token weights: rebuild the unrounded log-odds from the model's
      // own integer counts (tp/tn/v are derivable sums — no float leaves
      // the cluster)
      val m = TextOps.q247NbTrain(spark, dir)
        .select(col("token"), col("n_pos"), col("n_neg")).collect()
      val tp = m.map(_.getLong(1)).sum.toDouble
      val tn = m.map(_.getLong(2)).sum.toDouble
      val v = m.length.toDouble
      val worst = m.map { r =>
        val x = math.log(r.getLong(1) + 1.0) - math.log(tp + v) -
          math.log(r.getLong(2) + 1.0) + math.log(tn + v)
        (margin(x), r.getString(0))
      }.minBy(_._1)
      assert(worst._1 >= minMargin,
        s"token '${worst._2}' at sf$sf has w·Q only ${worst._1} units from " +
          "a .5 rounding boundary — pick a new NbQuantum (margin-search " +
          "over all SFs) before the driver hash flips")
      // class bias: same check on its single rounding input
      val lab = TextOps.hqLabeled(spark, dir).filter(col("train"))
        .agg(sum(when(col("pos"), 1L).otherwise(0L)),
          sum(when(!col("pos"), 1L).otherwise(0L))).collect()(0)
      val bias = math.log(lab.getLong(0) + 1.0) - math.log(lab.getLong(1) + 1.0)
      assert(margin(bias) >= minMargin,
        s"NB bias at sf$sf is ${margin(bias)} units from a .5 boundary")
    }

    test("every q243 Viterbi piece cost clears the .5 rounding boundary " +
        s"at sf$sf (same fragility class as the NB weights)") {
      assume(new java.io.File(s"$dir/documents.parquet").exists())
      // rebuild the vocab cut exactly as q243 does (top-V by count,
      // length <= 12, total over the kept counts)
      val top = Tables.documents(spark, dir)
        .select(explode(split(col("text"), " ")).as("t"))
        .filter(col("t") =!= "" && length(col("t")) <= 12)
        .groupBy(col("t")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("t"))
        .limit(TextOps.ViterbiVocabSize)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val total = top.map(_._2).sum.toDouble
      val worst = top.map { case (t, c) =>
        (math.abs(-math.log(c / total) * 1e6 % 1.0 - 0.5), t)
      }.minBy(_._1)
      // observed minima: 2.3e-2..3.8e-2 across the gate SFs — a fixture
      // landing a cost near a boundary shows up here, not as a driver
      // hash mismatch three rounds later
      assert(worst._1 >= minMargin,
        s"piece '${worst._2}' cost at sf$sf sits ${worst._1} units from " +
          "a .5 boundary — requantize the Viterbi cost scale")
    }
  }
}
