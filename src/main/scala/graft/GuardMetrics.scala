package graft

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Surfaces the skew-guard `observe` metrics the dedup/ANN candidate
  * generators emit (`graft_*_guard_*`, column `dropped_buckets` —
  * Dedup.guardedIdBuckets, Dedup.crossJaccardFromGrams,
  * Similarity.cosineNearDups). A capped hot bucket silently trades
  * RECALL: without a listener the drop count is computed and thrown
  * away, so a production corpus with grams hotter than `maxBucket`
  * would under-deduplicate (or under-decontaminate) invisibly. Verify
  * and Bench register this listener and log a per-query guard line;
  * the gate corpora are asserted drop-free by GuardMetricsSpec.
  *
  * AQE caveat (verified empirically, see GuardMetricsSpec): when EVERY
  * bucket is dropped, the plan downstream of the guard filter is
  * empty, and AQE's `AQEPropagateEmptyRelation` replaces the subtree —
  * `CollectMetrics` node included — with an empty relation, silently
  * discarding the metric in exactly the case it exists to report.
  * Sessions that rely on guard accounting must exclude that one rule
  * ([[excludeEmptyRelationRule]]); Verify and Bench do.
  */
object GuardMetrics {

  /** The AQE rule that can prune `observe` nodes above empty branches.
    * Excluding it costs only the empty-branch shortcut — plans still
    * adapt (partition coalescing, skew join, join strategy switch). */
  val EmptyRelationRule =
    "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation"

  def excludeEmptyRelationRule(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.adaptive.optimizer.excludedRules",
      (spark.conf.getOption("spark.sql.adaptive.optimizer.excludedRules")
        .toSeq :+ EmptyRelationRule).mkString(","))

  final class Listener extends QueryExecutionListener {
    private val drops = new ConcurrentHashMap[String, java.lang.Long]()

    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        if (name.startsWith("graft_") && name.contains("_guard_")) {
          val i = row.schema.fieldIndex("dropped_buckets")
          val v = if (row.isNullAt(i)) 0L else row.getLong(i)
          // a query can evaluate the same observe node more than once
          // (AQE re-execution, min-of-N bench runs): keep the MAX per
          // metric, not the sum — the metric is per-evaluation truth
          drops.merge(name, v, (a, b) => math.max(a, b))
        } else if (name.startsWith("graft_") && name.contains("_rescue_")) {
          // hot-bucket reroute accounting (Dedup.minhashNearDups
          // rescueHot): one key per metric column so the report line
          // shows members and groups separately
          row.schema.fields.zipWithIndex.foreach { case (f, i) =>
            if (f.dataType == org.apache.spark.sql.types.LongType) {
              val v = if (row.isNullAt(i)) 0L else row.getLong(i)
              drops.merge(s"$name.${f.name}", v, (a, b) => math.max(a, b))
            }
          }
        }
      }

    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = ()

    /** Drain collected (metricName → droppedBuckets), clearing state.
      * Listener events post asynchronously after the action returns:
      * poll until the metric set is non-empty and stable, up to
      * `settleMs` total (sequential callers only race the last query's
      * events; guard-less queries pay the full wait — keep it short). */
    def drain(settleMs: Long = 400L): Map[String, Long] = {
      val deadline = System.nanoTime() + settleMs * 1000000L
      var last = drops.size()
      var stable = 0
      while (System.nanoTime() < deadline && (last == 0 || stable < 2)) {
        Thread.sleep(50L)
        val now = drops.size()
        stable = if (now == last && now > 0) stable + 1 else 0
        last = now
      }
      val out = drops.asScala.map { case (k, v) => k -> v.longValue }.toMap
      drops.clear()
      out
    }
  }

  def register(spark: SparkSession): Listener = {
    val l = new Listener
    spark.listenerManager.register(l)
    l
  }

  /** One log line per query: total plus any NON-ZERO per-metric counts
    * (zero-drop queries print `guard_drops=0` — the quiet case is the
    * assertable one). */
  def report(tag: String, name: String, drained: Map[String, Long]): Unit = {
    val nonZero = drained.filter(_._2 != 0L)
    val detail = if (nonZero.isEmpty) ""
      else nonZero.toSeq.sortBy(_._1)
        .map { case (k, v) => s" $k=$v" }.mkString(" —", "", "")
    // the headline number counts only recall-losing DROPS; rescue
    // reroutes (recall-preserving) appear in the detail list only
    val dropSum = nonZero.filter(_._1.contains("_guard_")).values.sum
    System.err.println(
      s"[$tag] $name guard_drops=$dropSum$detail")
  }
}
