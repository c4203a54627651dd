package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev micro-probe for the round-17 driver-floor primitives: times, in
  * one JVM (N-run means, warm pass excluded),
  *
  *   1. the OLD reopen shape — two sequential 1-row collects (index
  *      meta, then ledger meta)
  *   2. the NEW merged reopen — Sinks.metaWithLedgerMeta (one union
  *      action)
  *   3. appendLedger with the default coalesce(1) generation write vs
  *      spark.graft.sinks.ledgerWritePartitions=32 (the pre-r17 shape)
  *
  * so a subset-bench delta can be attributed mechanically instead of
  * argued from two noisy single-sample runs. */
object MetaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val N = 30
    def timed(tag: String)(f: Int => Unit): Unit = {
      f(9999)
      val t0 = System.nanoTime()
      (1 to N).foreach(f)
      val ms = (System.nanoTime() - t0) / 1e6 / N
      println(f"[metaprobe] $tag%-44s ${ms}%8.1f ms/op")
    }
    // fixture: an index meta + a committed ledger
    graft.sources.Sinks.writeTable(
      Seq(("tok-1", "mp_idx_cells")).toDF("epoch", "cells_table"),
      "mp_idx_meta")
    graft.sources.Sinks.appendLedger(spark, "mp_idx_tombstones",
      spark.range(1, 200).select($"id".as("neighbor_id")))

    timed("old: 2 sequential 1-row collects")(_ => {
      spark.table("mp_idx_meta").collect()
      spark.table("mp_idx_tombstones_meta").collect()
      ()
    })
    timed("new: metaWithLedgerMeta (union)")(_ => {
      graft.sources.Sinks.metaWithLedgerMeta(spark, "mp_idx_meta",
        "mp_idx_tombstones")
      ()
    })
    timed("new: metaWithLedgerMeta (no ledger)")(_ => {
      graft.sources.Sinks.metaWithLedgerMeta(spark, "mp_idx_meta",
        "mp_nosuch_tombstones")
      ()
    })
    val incoming = spark.range(1, 200).select($"id".as("neighbor_id"))
    timed("appendLedger coalesce(1) [default]")(i => {
      graft.sources.Sinks.appendLedger(spark, s"mp_l1_$i", incoming)
    })
    spark.conf.set("spark.graft.sinks.ledgerWritePartitions", "32")
    timed("appendLedger 32-part [pre-r17 shape]")(i => {
      graft.sources.Sinks.appendLedger(spark, s"mp_l32_$i", incoming)
    })
    spark.conf.unset("spark.graft.sinks.ledgerWritePartitions")
    spark.sql("SHOW TABLES").collect()
      .map(_.getAs[String]("tableName")).filter(_.startsWith("mp_"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}
