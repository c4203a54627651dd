package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement harness for the lifecycle gates' fixed floors (the
  * CENSUS_r16 attribution: ~0.3–0.5 s per managed-table commit, ×40+
  * commands per composed gate). Times, in one session:
  *
  *   1. writeTable of a 1-row frame (the meta/epoch shape) ×N
  *   2. writeTable of a 32-partition shuffled frame (the index shape) ×N
  *   3. writeBucketed (4 buckets) of the same ×N
  *   4. localCheckpoint of a 32-partition frame ×N
  *   5. a 1-row collect() off a shuffle ×N
  *   6. the same five with k writes submitted CONCURRENTLY (guide
  *      §2.6) to see how much of the floor is schedulable overlap
  *
  * Optional args: [variant] where variant ∈ {v1, v2} picks the Hadoop
  * FileOutputCommitter algorithm version. Prints per-op means.
  */
object CommitProbe {
  def main(args: Array[String]): Unit = {
    val algo: String = if (args.contains("v2")) "2" else "1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        algo)
      // "bypass1" arg: force SortShuffleWriter (ONE spill file per map
      // task) instead of BypassMergeSortShuffleWriter (R files per map
      // task) for low-R shuffles — the suspected tiny-shuffle floor
      .config("spark.shuffle.sort.bypassMergeThreshold",
        if (args.contains("bypass1")) "1" else "200")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val N = 12
    // stage-level attribution: count stages/tasks and sum task run time
    // per timed op, so "where do the ms go" is mechanical, not guessed
    val stCount = new java.util.concurrent.atomic.AtomicInteger
    val taskCount = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val stageWallMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stCount.incrementAndGet()
          taskCount.addAndGet(e.stageInfo.numTasks)
          for (s <- e.stageInfo.submissionTime; c <- e.stageInfo.completionTime)
            stageWallMs.addAndGet(c - s)
        }
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            taskMs.addAndGet(e.taskMetrics.executorRunTime)
      })
    def timed(tag: String)(f: Int => Unit): Unit = {
      // one warm pass outside the mean
      f(9999)
      org.apache.spark.sql.GraftExpressionBridge.waitListenerBusEmpty(spark)
      stCount.set(0); taskCount.set(0); taskMs.set(0); stageWallMs.set(0)
      val t0 = System.nanoTime()
      (1 to N).foreach(f)
      org.apache.spark.sql.GraftExpressionBridge.waitListenerBusEmpty(spark)
      val ms = (System.nanoTime() - t0) / 1e6 / N
      println(f"[commitprobe][algo=$algo] $tag%-34s ${ms}%8.1f ms/op  " +
        f"(${stCount.get / N.toDouble}%.1f stages, " +
        f"${taskCount.get / N.toDouble}%.1f tasks, " +
        f"${taskMs.get / N.toDouble}%.1f taskms, " +
        f"${stageWallMs.get / N.toDouble}%.1f stagewallms per op)")
    }
    val one = Seq(("gen-a", "epoch-x", 1L)).toDF("gen", "epoch", "k")
    val wide = spark.range(0, 100000).select($"id",
        pmod(xxhash64($"id"), lit(97L)).as("k"))
      .groupBy($"k").agg(count(lit(1)).as("n"), sum($"id").as("s"))

    timed("noop 1-row")(_ =>
      one.write.mode("overwrite").format("noop").save())
    timed("noop 97-row shuffled")(_ =>
      wide.write.mode("overwrite").format("noop").save())
    timed("count 97-row shuffled")(_ => wide.count())
    timed("collect 97-row shuffled")(_ => wide.collect())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    timed("noop 97-row AQE-off")(_ =>
      wide.write.mode("overwrite").format("noop").save())
    timed("collect 1-row agg AQE-off")(_ => wide.agg(sum($"n")).collect())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    timed("noop 97-row shufpart=4")(_ =>
      wide.write.mode("overwrite").format("noop").save())
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    timed("noop 97-row parallelismFirst=off")(_ =>
      wide.write.mode("overwrite").format("noop").save())
    timed("count 97-row parallelismFirst=off")(_ => wide.count())
    timed("writeTable 97-row parFirst=off")(i =>
      graft.sources.Sinks.writeTable(wide, s"cp_pf_$i"))
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    timed("writeTable 1-row")(i =>
      graft.sources.Sinks.writeTable(one, s"cp_meta_$i"))
    timed("writeTable 97-row shuffled")(i =>
      graft.sources.Sinks.writeTable(wide, s"cp_idx_$i"))
    timed("writeBucketed(4) 97-row")(i =>
      graft.sources.Sinks.writeBucketed(wide, s"cp_bkt_$i", Seq("k"), 4))
    timed("localCheckpoint 32-part")(i =>
      org.apache.spark.sql.GraftExpressionBridge.releaseLocalCheckpoint(
        wide.localCheckpoint()))
    timed("collect 1-row agg")(i =>
      wide.agg(sum($"n")).collect())
    // concurrency: 4 independent writeTable commands at once
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    timed("writeTable 1-row x4 parallel")(i => {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      Await.result(Future.sequence((0 until 4).map(j => Future {
        graft.sources.Sinks.writeTable(one, s"cp_par_${i}_$j")
      })), 120.seconds)
    })
    timed("writeTable 97-row x4 parallel")(i => {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      Await.result(Future.sequence((0 until 4).map(j => Future {
        graft.sources.Sinks.writeTable(wide, s"cp_parw_${i}_$j")
      })), 120.seconds)
    })
    pool.shutdown()
    // cleanup: drop everything this probe created
    spark.sql("SHOW TABLES").collect()
      .map(_.getAs[String]("tableName"))
      .filter(_.startsWith("cp_"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}
