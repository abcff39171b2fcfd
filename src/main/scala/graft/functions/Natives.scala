package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Idempotent session registration for the native-expression companions.
  *
  * Every operator that uses a native expression calls `register(s)` at
  * query-build time (the registration is session-scoped, and queries must
  * work on ANY caller session, so the call cannot move to a one-time init
  * hook). Re-registering an already-bound name is harmless but makes
  * SimpleFunctionRegistry log "replaced a previously registered function"
  * per call — hundreds of WARN lines per bench run burying real warnings.
  * The builders here are constructor-data-free (the expression closes over
  * nothing), so first-registration-wins is exactly equivalent; a name is
  * bound at most once per session.
  *
  * [[graft.functions.UnigramViterbi.register]] deliberately does NOT go
  * through this: its builder closes over the caller's vocabulary, so each
  * corpus build must re-bind the name.
  */
private[functions] object Natives {
  def registerOnce(spark: SparkSession, name: String)
                  (builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
