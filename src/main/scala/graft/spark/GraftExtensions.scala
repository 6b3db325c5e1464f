package graft.spark

import org.apache.spark.sql.SparkSessionExtensions

/** Builder-time extension entry point:
  * `--conf spark.sql.extensions=graft.spark.GraftExtensions`.
  *
  * Injected via `injectOptimizerRule`, the range-join rule runs INSIDE
  * the operator-optimization fixed point, so pushdown/pruning re-fire
  * on the rewritten plan; `RangeJoinBin.install` on a live session uses
  * `experimental.extraOptimizations` instead, which runs after the main
  * batches — correct, but without a re-pruning pass. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(session => graft.plans.RangeJoinBinRule(session))
}
