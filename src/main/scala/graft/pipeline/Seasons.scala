package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.{Candump, CanSchema}

/** The four season drivers as DATA (main_2020.py, main_2022.py,
  * main_2022_ita.py, main_2023_lic_01072023.py) — each wires the same
  * canonical stage order `parse → unify → resample → unify_forecast →
  * unify_gps` (main_2020.py:209-213) with season-specific schema,
  * clock offsets, workaround flags and site coordinates.
  */
object Seasons {

  final case class DatasetFiles(
      candumpGlob: String,
      /** per-dataset clock correction `to − from` in µs
        * (lib/canparser.py:63-66) */
      offsetMicros: Long = 0L)

  final case class SeasonConfig(
      name: String,
      canIdsPath: String,
      mab20Workaround: Boolean,
      shiftBackLocalize: Boolean,
      site: SolarStage.Site,
      resamplePeriodsSec: Seq[Long],
      datasets: Seq[DatasetFiles])

  /** Season configs mirroring the reference driver scripts (paths are
    * parameters — the recorded values document the reference wiring). */
  def season2020(dataDir: String): SeasonConfig = SeasonConfig(
    name = "2020",
    canIdsPath = s"$dataDir/can_ids_2020.json",
    mab20Workaround = true,              // main_2020.py:85
    shiftBackLocalize = true,            // main_2020.py unify config
    site = SolarStage.Site(-26.243602, -48.6417668), // main_2020.py:167-173
    resamplePeriodsSec = Seq(1L, 60L),   // "100ms,1s" class; 1ms skipped (>25GB)
    datasets = Seq(DatasetFiles(s"$dataDir/candump/*.log")))

  def season2022(dataDir: String): SeasonConfig = SeasonConfig(
    name = "2022",
    canIdsPath = s"$dataDir/can_ids_2022.json",
    mab20Workaround = false,
    shiftBackLocalize = false,
    site = SolarStage.Site(-22.924247, -43.097405), // main_2022.py:92-98
    resamplePeriodsSec = Seq(1L, 60L),
    datasets = Seq(DatasetFiles(s"$dataDir/candump/*.log")))

  /** Run one season end-to-end: the canonical stage order with the
    * engine's operators. Returns the final unified wide table. */
  def run(spark: SparkSession, cfg: SeasonConfig, outputDir: String,
          forecastCsv: Option[String] = None,
          gpxFiles: Seq[String] = Nil,
          resamplePeriodSec: Long = 1L): DataFrame = {
    val schema = CanSchema.load(cfg.canIdsPath)
    // parse (E1)
    val wide = cfg.datasets.map { d =>
      ParseStage.run(spark, d.candumpGlob, schema,
        outputPath = Some(s"$outputDir/parsed_${cfg.name}"),
        offsetMicros = d.offsetMicros,
        mab20Workaround = cfg.mab20Workaround)
    }.reduce(_ unionByName _)
    // resample (E2): tumbling mean per signal + limited interpolation
    val signals = schema.wideColumns.filter(wide.columns.contains)
    val resampled = ResampleStage.run(wide, signals, resamplePeriodSec)
    // unify forecast (E3)
    val withForecast = forecastCsv match {
      case Some(csv) =>
        val f = SolarStage.withPoa(
          SolarStage.readSolcastCsv(spark, csv), cfg.site, 300)
        UnifyStages.unifyForecast(resampled, f, "timestamp",
          resamplePeriodSec, cfg.shiftBackLocalize)
      case None => resampled
    }
    // unify gps (E4)
    if (gpxFiles.nonEmpty) {
      val track = UnifyStages.processGpsTrack(
        graft.sources.Gpx.read(spark, gpxFiles))
      UnifyStages.unifyGps(withForecast, track, "timestamp",
        cfg.shiftBackLocalize)
    } else withForecast
  }
}
