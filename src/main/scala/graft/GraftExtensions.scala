package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.VectorFunctions

/** SparkSessionExtensions entry point (SURVEY §2C): installs the
  * engine's native functions into any session built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions` — the deployment path
  * for a shared cluster where per-session `createOrReplaceTempFunction`
  * isn't an option.
  *
  * Injects the SAME list the per-session path registers
  * ([[VectorFunctions.specs]]), so the two surfaces can never drift
  * (ADVICE r14: this class had only cosine_sim while the query text
  * had moved onto l2_dist_sq_at/simhash16/minhash8).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    VectorFunctions.specs.foreach { case (name, cls, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        builder))
    }
  }
}
