package graft
import org.apache.spark.sql.SparkSession
object P00Probe {
  def main(args: Array[String]): Unit = {
    val corpus = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${16*1024*1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      System.err.println(f"[p00] $tag ${(System.nanoTime()-t0)/1e9}%.1f s ($n rows)")
    }
    val schema = graft.sources.CanFixtures.schema
    time("read+regex")(graft.sources.Candump.frames(spark, corpus).count())
    time("(+)crop")(graft.sources.Candump.cropToFileRange(
      graft.sources.Candump.frames(spark, corpus)).count())
    val frames = graft.sources.Candump.cropToFileRange(
      graft.sources.Candump.frames(spark, corpus))
    time("(+)decode")(graft.operators.CanDecode.decodeLong(frames, schema,
      false, Seq("file","chunk")).count())
    time("full")(graft.pipeline.ParseStage.run(spark, corpus, schema).count())
    spark.stop()
  }
}
