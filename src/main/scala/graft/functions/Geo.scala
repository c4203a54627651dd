package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** GPS scalar functions — pure Column expressions (whole-stage
  * codegen'd, no UDFs). Semantics replicate the reference:
  * lib/process_gpx_data.py:13-37 (haversine, heading) and :49-60
  * (speed incl. the Δt=0 → null rule and the `.dt.seconds`
  * seconds-within-day quirk Q7).
  */
object Geo {

  /** F1 — haversine great-circle distance in km
    * (lib/process_gpx_data.py:26-37). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    lit(6371.0) * lit(2) * asin(sqrt(
      pow(sin(radians(lat2 - lat1) / 2), 2) +
        cos(radians(lat1)) * cos(radians(lat2)) *
          pow(sin(radians(lon2 - lon1) / 2), 2)))

  /** F2 — GPS heading in degrees (lib/process_gpx_data.py:13-23).
    * Replicates the reference's own formula as-is, including its
    * unusual y-term `sin(lat1)*(cos(lat1) - cos(lat2)*cos(Δlon))`,
    * then +180 so the result lies in [0, 360). */
  def headingDeg(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLon = radians(lon2 - lon1)
    val x = cos(radians(lat1)) * sin(dLon)
    val y = sin(radians(lat1)) *
      (cos(radians(lat1)) - cos(radians(lat2)) * cos(dLon))
    degrees(atan2(x, y)) + lit(180.0)
  }

  /** F3 — speed in km/h from distance (km) and Δt; Δt == 0 → null
    * (lib/process_gpx_data.py:55-60). `dtSeconds` must already follow
    * quirk Q7 (pandas `.dt.seconds` = seconds-within-day component). */
  def speedKmh(distKm: Column, dtSeconds: Column): Column =
    when(dtSeconds === 0, lit(null)).otherwise(distKm / (dtSeconds / lit(3600.0)))

  /** Q7 helper: pandas `.dt.seconds` of a timedelta — the
    * seconds-of-day component, not total_seconds. */
  def dtSecondsComponent(totalSeconds: Column): Column =
    pmod(totalSeconds.cast("long"), lit(86400L))
}
