package graft.ops

import org.apache.spark.sql.DataFrame

/** Eager materialization point for operator results.
  *
  * Ops that end in an expensive multi-stage pipeline pin their (small)
  * result with `localCheckpoint(eager = true)` so downstream actions do
  * not re-execute the pipeline, and so op-internal caches can be released
  * inside the op. The indirection exists for ONE extra reason: plan
  * inspection. An eager checkpoint truncates the logical plan to an RDD
  * leaf, which hides the operator's joins from `PlanQualitySpec`'s
  * no-cartesian/bounded-join assertions — the spec flips
  * [[Pin.disabled]] (test-only) to see the full plan without executing
  * the checkpoint.
  */
object Pin {

  /** Test-only: when true, [[pin]] is the identity (keeps the full plan
    * visible and nothing executes eagerly). Never set in production code.
    */
  @volatile private[graft] var disabled = false

  def pin(df: DataFrame): DataFrame =
    if (disabled) df else df.localCheckpoint(eager = true)
}
