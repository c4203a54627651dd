package graft

import java.nio.file.Files
import graft.pipeline.ParseStage
import graft.sources.CanFixtures

class ParseStageSpec extends SparkSpec {

  test("E1 end-to-end: candump glob → wide parquet; skip-if-exists") {
    val dir = Files.createTempDirectory("parse")
    val log = dir.resolve("run1.log")
    Files.write(log, Seq(
      "(1580415599.609366) can0 021#11E803110300",
      "garbage line",
      "(1580415600.000000) can0 021#11D00733FF00",
      "(1580415601.500000) can0 021#110000000000").mkString("\n").getBytes)
    val out = dir.resolve("out.parquet").toString
    val wide = ParseStage.run(spark, dir.toString + "/*.log",
      CanFixtures.schema, Some(out))
    assert(wide.columns.toSeq ==
      Seq("file", "timestamp") ++ CanFixtures.schema.wideColumns)
    assert(wide.count() == 3)
    val rt = spark.read.parquet(out)
    assert(rt.count() == 3)
    // second run returns the existing parquet without recompute
    val again = ParseStage.run(spark, dir.toString + "/*.log",
      CanFixtures.schema, Some(out))
    assert(again.count() == 3)
    val rep = ParseStage.report(spark, dir.toString + "/*.log", wide, 1.0)
    assert(rep.map(r => (r.inputLines, r.outputRows)) == Seq((4L, 3L)))
  }
}
