package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev measurement harness for the streaming gates' per-micro-batch
  * floor (optimization-guide §7.3 applied to Structured Streaming,
  * with the engine's own attribution instead of thread dumps): runs
  * the named gate(s) and prints every micro-batch's
  * `StreamingQueryProgress.durationMs` breakdown —
  *
  *   triggerExecution  = whole trigger wall
  *   latestOffset      = source file-listing / offset resolution
  *   queryPlanning     = incremental planning + optimization
  *   walCommit         = offset WAL fsync
  *   getBatch          = source batch-plan construction
  *   addBatch          = the actual work (plan execution + sink)
  *   commitOffsets     = commit log fsync
  *
  * so "the ~15 streaming gates each pay a 4-7 s per-pass startup
  * floor" (round-16 verdict item 7) becomes a per-component number:
  * whatever dominates outside addBatch is harness/planning floor, not
  * operator work. Usage: `runMain graft.StreamProbe <sfDir> [query...]`
  * (defaults to one representative gate per streaming family). */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q144_stream_ann_takedown", "q114_stream_ccnet_admission",
        "q126_stream_image_admission")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "1"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val dur = p.durationMs.asScala.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        batches.add((p.name, f"batch=${p.batchId}%-3d rows=${p.numInputRows}%-6d $dur"))
        ()
      }
    })
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      batches.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[streamprobe] $name wall=$wall%.1f s")
      import scala.jdk.CollectionConverters._
      batches.asScala.foreach { case (q, line) =>
        println(s"[streamprobe]   $q $line") }
    }
    spark.stop()
  }
}
