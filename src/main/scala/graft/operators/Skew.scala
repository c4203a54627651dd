package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot group keys. Spark's partial (map-
  * side) aggregation already absorbs most key skew for algebraic
  * aggregates; the salted two-phase shape below is for the cases it
  * can't: high-cardinality-input aggregates (collect/distinct-style)
  * or pipelines where the partial agg is defeated (e.g. an exchange
  * directly upstream). The decomposition is exact for algebraic
  * aggregates — sums/counts/min/max recombine associatively — so a
  * gate query can pin salted output against the unsalted oracle.
  */
object Skew {

  /** Two-phase salted aggregate: rows first aggregate on
    * (keys, salt) — `salts` sub-groups per hot key, spreading one hot
    * key over `salts` reducers — then the per-salt partials recombine
    * on the true keys. Emits sum/count/min/max per `valueCol` (avg =
    * sum/n downstream). The default salt is derived from row content
    * (xxhash64 of the value column), not RNG or partition id, so the
    * plan is deterministic end-to-end and retries can't re-bucket a
    * row. CAVEAT: a hot key whose VALUES are also all identical
    * defeats a content-derived salt (every row lands in one
    * sub-group) — pass `saltOn` with a higher-cardinality column
    * (e.g. a row id) for that shape. */
  def saltedSumStats(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int = 16,
                     saltOn: Option[Column] = None): DataFrame = {
    require(salts > 0, "salts must be positive")
    val k = keys.map(col)
    val saltSrc = saltOn.getOrElse(col(valueCol))
    val partial = df
      .withColumn("__salt", pmod(xxhash64(saltSrc), lit(salts.toLong)))
      .groupBy((k :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__s"), count(col(valueCol)).as("__n"),
           min(col(valueCol)).as("__mn"), max(col(valueCol)).as("__mx"))
    partial.groupBy(k: _*)
      .agg(sum(col("__s")).as(s"sum_$valueCol"),
           sum(col("__n")).as("n"),
           min(col("__mn")).as(s"min_$valueCol"),
           max(col("__mx")).as(s"max_$valueCol"))
  }
}
