package graft

import java.nio.file.Files
import graft.pipeline.Seasons
import graft.sources.{CanFixtures, CanSchema}
import graft.streaming.StreamingParse

class StreamingSeasonSpec extends SparkSpec {

  test("streaming parse: file source → decode → memory sink (incremental)") {
    val dir = Files.createTempDirectory("stream")
    Files.write(dir.resolve("a.log"), Seq(
      "(1580415599.609366) can0 021#11E803110300",
      "(1580415600.109366) can0 021#11D00733FF00").mkString("\n").getBytes)
    val decoded = StreamingParse.decodedStream(spark, dir.toString,
      CanFixtures.schema)
    val q = decoded.writeStream.format("memory").queryName("can_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select count(*) from can_stream").collect()(0).getLong(0) == 10)
      // a new file arrives → incremental batch picks it up
      Files.write(dir.resolve("b.log"),
        "(1580415601.000000) can0 021#110000000000".getBytes)
      q.processAllAvailable()
      assert(spark.sql("select count(*) from can_stream").collect()(0).getLong(0) == 15)
      val vals = spark.sql(
        "select byte_name, value from can_stream where timestamp = timestamp_micros(1580415599609366)")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(vals("CURR") == 10.0)
    } finally q.stop()
  }

  test("streaming resample: watermarked tumbling mean per signal") {
    val dir = Files.createTempDirectory("stream2")
    Files.write(dir.resolve("a.log"), Seq(
      "(1580415599.000000) can0 021#11E803110300",
      "(1580415599.500000) can0 021#11D00733FF00").mkString("\n").getBytes)
    val agg = StreamingParse.resampleStream(
      StreamingParse.decodedStream(spark, dir.toString, CanFixtures.schema), 1L)
    val q = agg.writeStream.format("memory").queryName("can_bins")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql(
        "select signal, mean_value, n from can_bins where signal = 'MOD17__SENSOR__CURR'")
        .collect()
      assert(rows.length == 1)
      assert(rows(0).getDouble(1) == 15.0 && rows(0).getLong(2) == 2)
    } finally q.stop()
  }

  test("season driver wiring: parse→resample→forecast→gps end-to-end") {
    val dir = Files.createTempDirectory("season")
    Files.write(dir.resolve("can_ids_test.json"), CanFixtures.json.getBytes)
    val dataDir = Files.createDirectory(dir.resolve("candump"))
    Files.write(dataDir.resolve("run.log"), (0 until 120).map { i =>
      f"(${1580515200L + i}%d.000000) can0 021#11E803${i % 256}%02X0300"
    }.mkString("\n").getBytes)
    val cfg = Seasons.SeasonConfig(
      name = "test", canIdsPath = dir.resolve("can_ids_test.json").toString,
      mab20Workaround = false, shiftBackLocalize = false,
      site = graft.pipeline.SolarStage.Site(-26.243602, -48.6417668),
      resamplePeriodsSec = Seq(10L),
      datasets = Seq(Seasons.DatasetFiles(s"$dataDir/*.log")))
    val out = Seasons.run(spark, cfg, dir.resolve("out").toString,
      resamplePeriodSec = 10L)
    val rows = out.orderBy("timestamp").collect()
    assert(rows.length == 12) // 120 s of frames → 12 ten-second bins
    val cols = out.columns
    assert(cols.contains("MOD17__SENSOR__CURR"))
    // all bins populated: mean of CURR = 10.0 constant
    val currIdx = cols.indexOf("MOD17__SENSOR__CURR")
    assert(rows.forall(r => r.getDouble(currIdx) == 10.0))
  }
}
