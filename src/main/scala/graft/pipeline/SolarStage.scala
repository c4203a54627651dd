package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Solar
import graft.operators.TimeSeries

/** E3 (solar side) — process_solcast_historic_data.process
  * (lib/process_solcast_historic_data.py:74-106): Solcast historical
  * CSV → renamed irradiance columns → POA at ts + period/2 → event
  * time slice → cumulative trapezoidal energy (Wh) → sink.
  */
object SolarStage {

  final case class Site(latitude: Double, longitude: Double,
                        tz: String = "America/Sao_Paulo",
                        surfaceTilt: Double = 0.0, surfaceAzimuth: Double = 0.0)

  /** S5 — Solcast CSV scan + renames (P11). PeriodStart/PeriodEnd are
    * ISO8601 with offset; parsed to UTC instants. */
  def readSolcastCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)
      .select(
        to_timestamp(col("PeriodStart")).as("timestamp"),
        col("Dni").cast("double").as("dni"),
        col("Ghi").cast("double").as("ghi"),
        col("Dhi").cast("double").as("dhi"),
        col("Airmass").cast("double").as("airmass"),
        col("AlbedoDaily").cast("double").as("albedo"))

  /** `pd.infer_freq` equivalent (lib/process_solcast_historic_data.py:
    * 12-16,93): the forecast period = the MODE of adjacent PeriodStart
    * diffs, smallest period winning ties — so a 30-min Solcast export
    * gets its POA at the +15-min mid-period shift without caller
    * config. One aggregate over the (tiny, 10³-row) forecast table;
    * the single-partition window is deliberate at that size. Explicit
    * `periodSec` arguments remain as overrides. */
  def inferPeriodSec(df: DataFrame, tsCol: String = "timestamp"): Long = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(tsCol))
    val top = df.select(col(tsCol))
      .withColumn("__d",
        unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(w)))
      .filter(col("__d").isNotNull && col("__d") > 0)
      .groupBy("__d").count()
      .orderBy(col("count").desc, col("__d"))
      .limit(1).collect()
    require(top.nonEmpty, "cannot infer forecast period from < 2 rows")
    val us = top.head.getLong(0)
    require(us % 1000000L == 0, s"non-whole-second forecast period: $us µs")
    us / 1000000L
  }

  /** F8-F11 — add the POA column: solar position computed at
    * ts + period/2 (the reference's timeshift), reported at ts. */
  def withPoa(df: DataFrame, site: Site, periodSec: Long): DataFrame = {
    val shifted = timestamp_micros(unix_micros(col("timestamp")) +
      lit(periodSec * 500000L)) // +T/2
    val pos = Solar.solarPosition(shifted,
      lit(site.latitude), lit(site.longitude))
    df.withColumn("__pos", pos)
      .withColumn("poa", Solar.poaGlobalIsotropic(
        lit(site.surfaceTilt), lit(site.surfaceAzimuth),
        col("__pos.apparent_zenith"), col("__pos.azimuth"),
        col("dni"), col("ghi"), col("dhi"), col("albedo")))
      .drop("__pos")
  }

  /** POA → inclusive event slice (P7) → cumulative energy (A9) on an
    * already-read forecast table. This is the full reference stage shape
    * (lib/process_solcast_historic_data.py:102-104: `df[start:end]` then
    * `df["energy"] = integrate(df, 3600)["poa"]`) minus the CSV I/O, so
    * the season driver can reuse it on its own scan. `eventStart`/
    * `eventEnd` are inclusive timestamp bounds in the forecast table's
    * (UTC) frame — the reference slices by LOCAL date label after
    * `tz_convert(site.tz)`, so callers record the UTC instants those
    * local-date labels denote. */
  def withPoaEnergy(df: DataFrame, site: Site, eventStart: String,
                    eventEnd: String, periodSec: Long = 300): DataFrame = {
    val sliced = withPoa(df, site, periodSec)
      // P7: pandas label slice — inclusive on both ends
      .filter(col("timestamp").between(lit(eventStart), lit(eventEnd)))
      .withColumn("__k", lit(1))
    TimeSeries.cumtrapz(sliced, "timestamp", "poa", Seq("__k"))
      .withColumnRenamed("integral", "energy")
      .drop("__k")
  }

  /** Full stage: CSV → poa → inclusive event slice (P7) → energy (A9). */
  def process(spark: SparkSession, inputCsv: String, site: Site,
              eventStart: String, eventEnd: String,
              periodSec: Long = 300): DataFrame =
    withPoaEnergy(readSolcastCsv(spark, inputCsv), site,
      eventStart, eventEnd, periodSec)
}
