package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.functions.Solar

class SolarSpec extends SparkSpec {
  import spark.implicits._

  def pos(utc: String, lat: Double, lon: Double,
          pressurePa: Double = 101325, tempC: Double = 12): (Double, Double, Double) = {
    val df = Seq(Timestamp.valueOf(utc)).toDF("ts")
      .select(Solar.solarPosition(col("ts"), lit(lat), lit(lon),
        pressurePa, tempC).as("p"))
      .select("p.apparent_zenith", "p.azimuth", "p.zenith")
    val r = df.collect()(0)
    (r.getDouble(0), r.getDouble(1), r.getDouble(2))
  }

  test("canonical NREL SPA test vector (Denver 2003-10-17 12:30:30 MST)") {
    // NREL SPA reference: apparent zenith 50.11162°, azimuth 194.34024°
    // (Reda & Andreas 2004, table A4.1); PSA ephemeris spec: ±0.01°.
    val (appZen, az, _) = pos("2003-10-17 19:30:30", 39.742476, -105.1786,
      pressurePa = 82000, tempC = 11)
    assert(math.abs(appZen - 50.11162) < 0.03, s"apparent zenith $appZen")
    assert(math.abs(az - 194.34024) < 0.05, s"azimuth $az")
  }

  test("equator equinox noon: sun near zenith; azimuth consistency") {
    // 2024-03-20 12:07 UTC ~ solar noon at lon 0 near the March equinox
    val (appZen, _, zen) = pos("2024-03-20 12:07:00", 0.0, 0.0)
    assert(zen < 1.5, s"zenith $zen")
    assert(appZen <= zen) // refraction raises the sun
    // afternoon at lat 40N: sun in SW quadrant
    val (_, azPm, _) = pos("2024-06-21 20:00:00", 40.0, -105.0)
    assert(azPm > 180 && azPm < 290, s"azimuth $azPm")
  }

  test("below horizon: no refraction correction beyond the cutoff") {
    val (appZen, _, zen) = pos("2024-03-20 00:07:00", 0.0, 0.0) // midnight
    assert(zen > 150)
    assert(math.abs(appZen - zen) < 1e-9) // refraction not applied
  }

  test("Spencer extraterrestrial radiation: perihelion/aphelion bounds") {
    val df = Seq(
      Timestamp.valueOf("2024-01-03 00:00:00"),
      Timestamp.valueOf("2024-07-04 00:00:00")).toDF("ts")
      .select(Solar.extraRadiation(col("ts")).as("e"))
    val Array(jan, jul) = df.collect().map(_.getDouble(0))
    assert(jan > 1405 && jan < 1420, s"jan $jan") // ~+3.4% of 1366.1
    assert(jul > 1315 && jul < 1330, s"jul $jul") // ~-3.3%
  }

  test("Kasten-Young airmass: 1 at zenith, ~38 at horizon, null below") {
    val df = Seq(0.0, 60.0, 90.0, 95.0).toDF("z")
      .select(Solar.airmassRelative(col("z")).as("am"))
    val r = df.collect().map(x => if (x.isNullAt(0)) None else Some(x.getDouble(0)))
    assert(math.abs(r(0).get - 0.9997) < 1e-3)
    assert(math.abs(r(1).get - 1.9943) < 5e-3) // KY89 at 60°
    assert(r(2).isEmpty && r(3).isEmpty)
  }

  test("isotropic POA: tilt 0 reduces to dni·cos(z)+ + dhi") {
    val df = Seq((30.0, 800.0, 600.0, 100.0), (120.0, 800.0, 100.0, 50.0))
      .toDF("zen", "dni", "ghi", "dhi")
      .select(col("zen"), Solar.poaGlobalIsotropic(
        lit(0.0), lit(0.0), col("zen"), lit(180.0),
        col("dni"), col("ghi"), col("dhi"), lit(0.08)).as("poa"))
    val r = df.orderBy("zen").collect().map(_.getDouble(1))
    assert(math.abs(r(0) - (800 * math.cos(math.toRadians(30)) + 100)) < 1e-9)
    assert(r(1) == 50.0) // sun below horizon: beam clipped to 0, sky only
  }

  test("full chain: POA + energy integral over a synthetic clear day") {
    // 5-min grid over one day at the 2020 site (lat -26.24, lon -48.64)
    val start = Timestamp.valueOf("2020-02-01 00:00:00").getTime / 1000
    val rows = (0 until 288).map { i =>
      new Timestamp((start + i * 300) * 1000)
    }.toDF("ts")
    val withPos = rows.select(col("ts"), Solar.solarPosition(
      // solar position computed at ts + T/2 (reference timeshift)
      (col("ts").cast("long") + 150).cast("timestamp"),
      lit(-26.243602), lit(-48.6417668)).as("p"))
    val poa = withPos.select(col("ts"),
      Solar.poaGlobalIsotropic(lit(0.0), lit(0.0),
        col("p.apparent_zenith"), col("p.azimuth"),
        lit(900.0), lit(700.0), lit(100.0), lit(0.08)).as("poa"))
      .withColumn("k", lit(1))
    val energy = graft.operators.TimeSeries.cumtrapz(poa, "ts", "poa", Seq("k"))
      .agg(max("integral")).collect()(0).getDouble(0)
    // daylight ~13h in SoBrazil summer; POA peaks ~1000 W/m²;
    // plausible integral: 6-11 kWh/m²·day for these fixed inputs
    assert(energy > 6000 && energy < 11000, s"energy $energy")
    val maxPoa = poa.agg(max("poa")).collect()(0).getDouble(0)
    assert(maxPoa > 950 && maxPoa < 1010, s"max poa $maxPoa")
  }
}
