package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D5 pagination: the native offset/limit plan must page identically to
  * the reference's row_number protocol (the retired global-Window
  * emulation — kept here as the parity oracle because it IS the page
  * definition the reference's Template(offset, limit) substitution
  * implements, wikidata_index.py:142). */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("native offset/limit pages exactly like the row_number protocol") {
    // non-contiguous, shuffled keys so ordering actually does work
    val df = spark.range(0, 1000).select(
      (col("id") * 7919 % 10007).as("k"), col("id").as("payload"))
    for ((off, lim) <- Seq((0, 10), (100, 50), (995, 10))) {
      val native = df.orderBy($"k").offset(off).limit(lim)
        .collect().map(_.toSeq).toSet
      val windowed = df
        .withColumn("rn", row_number().over(Window.orderBy($"k")))
        .filter($"rn".between(off + 1, off + lim)).drop("rn")
        .collect().map(_.toSeq).toSet
      assert(native == windowed, s"page offset=$off limit=$lim")
    }
  }
}
