package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** E2 — the resample stage (lib/resampler.py:59-101): sparse wide
  * telemetry → constant-period mean bins (A2, wall-clock aligned,
  * empty bins materialized as null rows) → time-interpolation limited
  * to 60 s of consecutive ticks, interior-only (A3). The IQR outlier
  * pass exists but is default-off, replicating quirk Q4 (commented out
  * at lib/resampler.py:92-95).
  *
  * One shuffle (the window aggregate); interpolation of ALL signals in
  * a single Window pass (TimeSeries.interpolateMany).
  */
object ResampleStage {

  def run(wide: DataFrame, signals: Seq[String], periodSec: Long,
          applyIqr: Boolean = false, iqrP: Double = 0.01): DataFrame = {
    require(signals.nonEmpty, "no signal columns to resample")
    // A2: tumbling mean per signal (partial-agg hash aggregate)
    val bucket = timestamp_seconds(
      floor(unix_timestamp(col("timestamp")) / periodSec) * periodSec)
    val aggs = signals.map(s => avg(col(s)).as(s))
    val binned = wide.groupBy(bucket.as("timestamp"))
      .agg(aggs.head, aggs.tail: _*)
    // materialize empty bins: dense grid left join (A4 shape)
    val bounds = binned.agg(min(col("timestamp")).as("lo"),
      max(col("timestamp")).as("hi"))
    val grid = bounds.select(explode(sequence(col("lo"), col("hi"),
      expr(s"INTERVAL $periodSec SECONDS"))).as("timestamp"))
    val dense = grid.join(binned, Seq("timestamp"), "left")
    // optional A5 (default-off, Q4): IQR fences blank outliers only
    val cleaned =
      if (!applyIqr) dense
      else signals.foldLeft(dense) { (d, s) =>
        // per-signal global fences (quantiles over the whole series)
        val q = d.agg(
          expr(s"percentile(`$s`, $iqrP)").as("q1"),
          expr(s"percentile(`$s`, ${1 - iqrP})").as("q3")).collect()(0)
        if (q.isNullAt(0)) d else {
          val (q1, q3) = (q.getDouble(0), q.getDouble(1))
          val lo = q1 - 1.5 * (q3 - q1); val hi = q3 + 1.5 * (q3 - q1)
          d.withColumn(s, when(col(s) < lo || col(s) > hi, lit(null))
            .otherwise(col(s)))
        }
      }
    // A3: limited interior time-interpolation, all signals in one pass
    val limit = math.max(1L, 60L / math.max(periodSec, 1L)).toInt
    val interped = TimeSeries.interpolateMany(cleaned, "timestamp", signals,
      Nil, maxGap = limit, fillForward = false)
    signals.foldLeft(interped)((d, s) =>
      d.withColumn(s, col(s"interp__$s")).drop(s"interp__$s"))
  }
}
