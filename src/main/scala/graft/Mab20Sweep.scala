package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement for the round-15 codegen fix: times the LONG-form
  * 2020-schema decode WITH the mab20 workaround — the exact path that
  * silently fell back to interpreted eval when the inlined
  * effectivePayloadSig CASE blew janino's 64 KB method limit
  * (CanDecode.decodeLong wide branch; the streamed 2020-season decode
  * was the production hit). Usage:
  * `runMain graft.Mab20Sweep [nLines]` — synthesizes a deterministic
  * candump corpus mixing MCC19 measurement frames with topic-0x41
  * mab20 frames, warms the path, reports min-of-2 wall seconds and
  * ms/line. Run the same main on a pre-fix checkout for the
  * before/after ratio.
  */
object Mab20Sweep {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("mab20sweep")
    val path = dir.resolve("sweep.log").toString
    spark.range(n).select(format_string("(%d.%06d) can0 %s",
        expr("1580515200L + id div 10"),
        expr("(id % 10) * 100000"),
        when(col("id") % 4 === 0, lit("041#000400"))
          .otherwise(lit("011#E4360F0000780216"))).as("value"))
      .repartition(8).write.mode("overwrite").text(path)
    val s20 = graft.sources.CanSchema.load(
      "/root/reference/can_ids_2020.json")
    def run(): Long = graft.operators.CanDecode.decodeLong(
      graft.sources.Candump.frames(spark, path), s20,
      mab20Workaround = true).count()
    run() // warm: codegen classes, text reader, page cache
    val runs = Seq.fill(2) {
      val t0 = System.nanoTime(); val rows = run()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    val (sec, rows) = runs.minBy(_._1)
    println(f"[mab20] $n%d lines -> $rows%d decoded rows, " +
      f"$sec%.2f s (${sec * 1e3 / n}%.6f ms/line)")
    spark.stop()
  }
}
