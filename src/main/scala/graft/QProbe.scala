package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev-loop query timer: warm + timed runs per query name, with a
  * per-job wall-time breakdown (grouped by job description) so a
  * composition query's cost can be attributed to its stages. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val open = mutable.Map[Int, (Long, String)]()
    val done = mutable.ArrayBuffer[(String, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        open(j.jobId) = (j.time, Option(
          j.properties.getProperty("spark.job.description")).getOrElse("?"))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        open.remove(j.jobId).foreach { case (t0, d) =>
          done.synchronized { done += ((d, j.time - t0)) } }
    })
    args.drop(1).foreach { q =>
      for (i <- 1 to 2) {
        if (i == 2) done.synchronized(done.clear())
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, sfDir)
        val t1 = System.nanoTime()
        val qe = df.queryExecution
        if (i == 1 && sys.env.contains("SPARK_GRAFT_PLANSTATS")) {
          val p = qe.executedPlan.toString
          for (n <- Seq("Exchange", "Window", "SortMergeJoin",
              "BroadcastHashJoin", "HashAggregate", "Generate", "Sort "))
            System.err.println(s"[probe]   plan $n: " +
              n.r.findAllIn(p).size)
        }
        qe.analyzed; val ta = System.nanoTime()
        qe.optimizedPlan; val to = System.nanoTime()
        qe.executedPlan; val tp = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t2 = System.nanoTime()
        System.err.println(f"[probe] $q run$i ${(t2-t0)/1e9}%.1f s " +
          f"(build ${(t1-t0)/1e9}%.1f s, analyze ${(ta-t1)/1e9}%.1f s, " +
          f"optimize ${(to-ta)/1e9}%.1f s, plan ${(tp-to)/1e9}%.1f s, " +
          f"write ${(t2-tp)/1e9}%.1f s)")
        spark.catalog.clearCache()
      }
      Thread.sleep(500L)
      val snap = done.synchronized(done.toSeq)
      System.err.println(f"[probe] $q run2: ${snap.size} jobs, " +
        f"sum ${snap.map(_._2).sum / 1000.0}%.1f s; top groups:")
      snap.groupBy(_._1)
        .map { case (d, xs) => (d.take(70), xs.size, xs.map(_._2).sum) }
        .toSeq.sortBy(-_._3).take(12)
        .foreach { case (d, n, ms) =>
          System.err.println(f"[probe]   ${ms / 1000.0}%6.1f s  n=$n%-3d $d") }
    }
    spark.stop()
  }
}
