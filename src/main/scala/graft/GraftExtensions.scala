package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions injector — the production deployment path for the
  * engine's native Catalyst expressions: a cluster adds
  * `spark.sql.extensions=graft.GraftExtensions` and `cosine_sim` /
  * `hamming_dist` resolve in plain SQL on every session, no per-session
  * `register(...)` calls (those remain for ad-hoc/test sessions).
  *
  * This is the extension-point ladder of SURVEY.md §4.2 made concrete:
  * builtins compose the bulk of the engine; the two fused-loop expressions
  * ride the injection hook; no custom Rule/Strategy is needed because every
  * operator shape lowers to Catalyst-visible plans.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def arity(name: String, n: Int)(build: Seq[Expression] => Expression)
      : Seq[Expression] => Expression = es => {
    // A proper arity error from the analyzer, not an IndexOutOfBounds from
    // inside the builder.
    if (es.length != n) throw new IllegalArgumentException(
      s"$name requires exactly $n argument(s), got ${es.length}")
    build(es)
  }

  /** The injectable function set (also usable to bulk-register on an
    * existing session's FunctionRegistry). */
  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[graft.functions.CosineSimilarity].getName, "cosine_sim"),
      arity("cosine_sim", 2)(es => graft.functions.CosineSimilarity(es(0), es(1)))),
    (FunctionIdentifier("hamming_dist"),
      new ExpressionInfo(classOf[graft.functions.HammingDistance].getName, "hamming_dist"),
      arity("hamming_dist", 2)(es => graft.functions.HammingDistance(es(0), es(1)))),
    (FunctionIdentifier("simhash16"),
      new ExpressionInfo(classOf[graft.functions.SimHash16].getName, "simhash16"),
      arity("simhash16", 1)(es => graft.functions.SimHash16(es(0)))),
    (FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[graft.functions.MinHashSigs].getName, "minhash_sigs"),
      arity("minhash_sigs", 1)(es => graft.functions.MinHashSigs(es(0)))))
}
