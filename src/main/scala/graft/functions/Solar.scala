package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Solar model F8-F11 (lib/process_solcast_historic_data.py:20-71) as
  * pure Column expressions — fully codegen'd, no UDFs, distributable
  * over any number of rows.
  *
  * The reference uses pvlib: NREL SPA solar position, Spencer
  * extraterrestrial radiation, Kasten-Young 1989 relative airmass,
  * isotropic-sky POA transposition. Here the solar position uses the
  * PSA ephemeris (Blanco-Muriel et al., Solar Energy 70(5), 2001 —
  * a published compact algorithm, ±0.008° over 1999-2015) plus the
  * SPA-style Saemundsson refraction correction; documented deviation
  * from pvlib's full SPA is <0.01° in apparent zenith, negligible in
  * POA. Validated against the canonical NREL SPA test vector in
  * SolarSpec.
  */
object Solar {

  private val DegToRad = math.Pi / 180.0
  private val RadToDeg = 180.0 / math.Pi
  /** earth mean radius / astronomical unit (parallax correction) */
  private val EmrOverAu = 6371.01 / 149597890.0

  /** Julian date from a timestamp column (UTC). */
  def julianDate(ts: Column): Column =
    unix_micros(ts).cast("double") / 86400.0e6 + lit(2440587.5)

  /** elapsed days since J2000.0 */
  private def j2000Days(ts: Column): Column = julianDate(ts) - lit(2451545.0)

  /** F8 — solar position (PSA ephemeris): returns a struct with
    * `zenith`, `apparent_zenith`, `elevation`, `azimuth` in degrees.
    * `lat`/`lon` in degrees (+N, +E). Refraction uses the reference
    * defaults (1013.25 hPa scaled by `pressure` Pa, 12 °C).
    */
  def solarPosition(ts: Column, lat: Column, lon: Column,
                    pressurePa: Double = 101325.0,
                    temperatureC: Double = 12.0): Column = {
    val n = j2000Days(ts)
    // decimal UT hour
    val hour = (unix_micros(ts).cast("double") / 3.6e9) % 24.0
    // ecliptic coordinates (radians)
    val omega = lit(2.1429) - lit(0.0010394594) * n
    val meanLon = lit(4.8950630) + lit(0.017202791698) * n
    val meanAnom = lit(6.2400600) + lit(0.0172019699) * n
    val eclLon = meanLon + lit(0.03341607) * sin(meanAnom) +
      lit(0.00034894) * sin(lit(2.0) * meanAnom) - lit(0.0001134) -
      lit(0.0000203) * sin(omega)
    val eclObl = lit(0.4090928) - lit(6.2140e-9) * n +
      lit(0.0000396) * cos(omega)
    // celestial coordinates
    val sinEclLon = sin(eclLon)
    val ra0 = atan2(cos(eclObl) * sinEclLon, cos(eclLon))
    val ra = when(ra0 < 0, ra0 + lit(2 * math.Pi)).otherwise(ra0)
    val dec = asin(sin(eclObl) * sinEclLon)
    // local hour angle
    val gmst = lit(6.6974243242) + lit(0.0657098283) * n + hour
    val lmst = (gmst * 15.0 + lon) * DegToRad
    val ha = lmst - ra
    val latR = lat * DegToRad
    val cosLat = cos(latR); val sinLat = sin(latR)
    val zen0 = acos(cosLat * cos(ha) * cos(dec) + sin(dec) * sinLat)
    val az0 = atan2(-sin(ha), tan(dec) * cosLat - sinLat * cos(ha))
    val azimuth = degrees(when(az0 < 0, az0 + lit(2 * math.Pi)).otherwise(az0))
    // parallax correction
    val zenith = degrees(zen0 + lit(EmrOverAu) * sin(zen0))
    val elev = lit(90.0) - zenith
    // Saemundsson refraction (as in NREL SPA / pvlib defaults):
    // applied only when the sun is above the apparent horizon
    val refrAt = lit((pressurePa / 100.0) / 1010.0) *
      lit(283.0 / (273.0 + temperatureC)) * lit(1.02) /
      (lit(60.0) * tan(radians(elev + lit(10.3) / (elev + lit(5.11)))))
    val delta = when(elev >= lit(-1.0) * (lit(0.26667) + lit(0.5667)), refrAt)
      .otherwise(lit(0.0))
    val appZenith = lit(90.0) - (elev + delta)
    struct(zenith.as("zenith"), appZenith.as("apparent_zenith"),
      elev.as("elevation"), azimuth.as("azimuth"))
  }

  /** F9 — extraterrestrial DNI, Spencer (1971) — pvlib
    * get_extra_radiation default (lib/process_solcast_historic_data.py:49). */
  def extraRadiation(ts: Column, solarConstant: Double = 1366.1): Column = {
    val doy = dayofyear(ts).cast("double")
    val b = lit(2 * math.Pi / 365.0) * (doy - 1.0)
    lit(solarConstant) * (lit(1.00011) + lit(0.034221) * cos(b) +
      lit(0.00128) * sin(b) + lit(0.000719) * cos(lit(2.0) * b) +
      lit(0.000077) * sin(lit(2.0) * b))
  }

  /** F10 — Kasten & Young (1989) relative airmass from apparent zenith
    * in degrees (lib/process_solcast_historic_data.py:50-55). Null
    * (as pvlib NaN) when the sun is below the horizon. */
  def airmassRelative(apparentZenithDeg: Column): Column =
    when(apparentZenithDeg < 90.0,
      lit(1.0) / (cos(radians(apparentZenithDeg)) +
        lit(0.50572) * pow(lit(96.07995) - apparentZenithDeg, lit(-1.6364))))

  /** F11 — isotropic-sky POA transposition
    * (lib/process_solcast_historic_data.py:57-71; pvlib
    * get_total_irradiance(model="isotropic")). Returns the
    * `poa_global` component:
    * beam = dni·max(cos aoi, 0); sky = dhi·(1+cos β)/2;
    * ground = ghi·albedo·(1−cos β)/2. */
  def poaGlobalIsotropic(
      surfaceTiltDeg: Column, surfaceAzimuthDeg: Column,
      zenithDeg: Column, azimuthDeg: Column,
      dni: Column, ghi: Column, dhi: Column, albedo: Column): Column = {
    val aoiProj =
      cos(radians(surfaceTiltDeg)) * cos(radians(zenithDeg)) +
        sin(radians(surfaceTiltDeg)) * sin(radians(zenithDeg)) *
          cos(radians(azimuthDeg - surfaceAzimuthDeg))
    val beam = dni * greatest(aoiProj, lit(0.0))
    val sky = dhi * (lit(1.0) + cos(radians(surfaceTiltDeg))) / 2.0
    val ground = ghi * albedo * (lit(1.0) - cos(radians(surfaceTiltDeg))) / 2.0
    beam + sky + ground
  }
}
