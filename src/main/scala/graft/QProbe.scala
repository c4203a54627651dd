package graft
import org.apache.spark.sql.SparkSession
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { q =>
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).count()
        System.err.println(f"[probe] $q run$i ${(System.nanoTime()-t0)/1e9}%.1f s")
      }
    }
    spark.stop()
  }
}
