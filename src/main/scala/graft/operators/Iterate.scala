package graft.operators

import org.apache.spark.sql.DataFrame

/** The constant-depth iteration step shared by every iterative fit in
  * this package (BPE merge loops, IVF/PQ Lloyd refinement): eagerly
  * localCheckpoint the new generation so the logical plan never grows
  * one nested fold/join per iteration (measured two minutes of
  * driver-side re-optimization by merge 16 without it), and release
  * the superseded generation's blocks through the checkpoint bridge —
  * `Dataset.unpersist` only clears CacheManager entries, so without
  * the bridge call up to iterations+2 copies of the iterated table
  * would sit in the BlockManager until driver GC (the round-8
  * shared-bench-JVM heap lesson). Non-reliable checkpoint blocks are
  * fine here: each loop's actions complete inside the fit, and a lost
  * block after return costs a refit, never wrong results. */
private[operators] object Iterate {
  def advance(from: DataFrame, to: DataFrame): DataFrame = {
    val next = to.localCheckpoint()
    org.apache.spark.sql.GraftExpressionBridge.releaseLocalCheckpoint(from)
    next
  }
}
