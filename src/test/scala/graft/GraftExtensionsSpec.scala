package graft

import org.apache.spark.sql.SparkSession

/** Session-extension injection: a session BUILT with
  * `spark.sql.extensions=graft.GraftExtensions` resolves the native
  * expressions in plain SQL without any register() call. Uses a separate
  * SparkContext-less check where possible; the full-session path needs its
  * own SparkSession, so it reuses the shared context via newSession +
  * manual injection equivalence. */
class GraftExtensionsSpec extends SparkSpec {

  test("injected builders construct working expressions") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val mkVec = (xs: Seq[Double]) =>
      Literal.create(ArrayData.toArrayData(xs.toArray), ArrayType(DoubleType))
    val byName = GraftExtensions.functions
      .map { case (id, _, b) => id.funcName -> b }.toMap
    val c = byName("cosine_sim")(
      Seq(mkVec(Seq(1.0, 0.0)), mkVec(Seq(1.0, 0.0)))).eval(null)
    assert(math.abs(c.asInstanceOf[Double] - 1.0) < 1e-12)
    val h = byName("hamming_dist")(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal("1010"),
      org.apache.spark.sql.catalyst.expressions.Literal("1001"))).eval(null)
    assert(h.asInstanceOf[Int] == 2)
    val sig = byName("simhash16")(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          Array(org.apache.spark.unsafe.types.UTF8String.fromString("spark"))),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)))).eval(null)
    assert(sig.toString.length == 16 && sig.toString.forall(c => c == '0' || c == '1'))
  }

  test("extension-built session resolves cosine_sim in SQL") {
    // A second SparkSession on the same JVM shares the SparkContext but can
    // carry its own extensions when constructed through the builder with the
    // conf set BEFORE first use — emulate by applying the injector to the
    // existing session's registry (what the builder does at build time).
    val s2: SparkSession = spark.newSession()
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      s2.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    val out = s2.sql(
      "SELECT round(cosine_sim(array(1.0d, 2.0d), array(2.0d, 4.0d)), 6) AS c, " +
        "hamming_dist('111', '000') AS h").collect()(0)
    assert(out.getDouble(0) == 1.0 && out.getInt(1) == 3)
  }
}
