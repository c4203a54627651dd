package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc parse-stage profiler: `runMain graft.P00Probe <sfDir>`
  * generates the same candump corpus as Bench and times each stage. */
object P00Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${16*1024*1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpusDir = java.nio.file.Files.createTempDirectory("graft_p00")
    val corpus = corpusDir.resolve("bench.log").toString
    val nLines = Bench.writeCandumpCorpus(spark, sfDir, corpus)
    System.err.println(s"[p00] corpus $nLines lines at $corpus")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      System.err.println(f"[p00] $tag ${(System.nanoTime()-t0)/1e9}%.1f s ($n rows)")
    }
    val schema = graft.sources.CanFixtures.schema
    // warm-up (JIT + codegen)
    graft.pipeline.ParseStage.run(spark, corpus, schema).count()
    time("read+regex")(graft.sources.Candump.frames(spark, corpus).count())
    time("(+)crop")(graft.sources.Candump.cropToFileRange(
      graft.sources.Candump.frames(spark, corpus)).count())
    val frames = graft.sources.Candump.cropToFileRange(
      graft.sources.Candump.frames(spark, corpus))
    time("(+)decodeWide")(graft.operators.CanDecode.decodeWide(frames, schema,
      false, Seq("file","chunk")).count())
    time("full")(graft.pipeline.ParseStage.run(spark, corpus, schema).count())
    time("full2")(graft.pipeline.ParseStage.run(spark, corpus, schema).count())
    spark.stop()
  }
}
