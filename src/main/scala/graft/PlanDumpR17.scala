package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: dump `.explain("formatted")` evidence for round 17's
  * plan-shape changes into `plans/r17/`.
  *
  *   - q144 LIVE member arrays: BEFORE = a second O(corpus)
  *     cellMembers groupBy over the tombstone-anti-joined bucketed
  *     cells scan (Exchange + ObjectHashAggregate + full table scan);
  *     AFTER = a higher-order array filter over the already-persisted
  *     PRE arrays (InMemoryRelation projection — no Exchange, no
  *     aggregate, no table scan).
  *   - appendLedger generation write: BEFORE = the distinct's
  *     32-partition write; AFTER = the same plan with the final stage
  *     coalesced to 1 task/file.
  *
  * Args: <sfDir> <outDir>. */
object PlanDumpR17 {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
      println(s"[plandump] wrote $outDir/$name.txt")
    }

    // ── q144 live member arrays ──────────────────────────────────────
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val accepted = emb.filter(col("vec_id") % 3 === 0)
    val index = operators.Similarity.buildIvf(accepted, "vec_id",
      "embedding", nCells = 8, lloydIters = 3)
    operators.Similarity.writeIvfIndexBucketed(index, "r17dump_idx",
      numBuckets = 8)
    val idx0 = operators.Similarity.readIvfIndexLive(spark, "r17dump_idx")
    val members0 = operators.Similarity.cellMembers(idx0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    members0.count()
    operators.Similarity.tombstoneIvf(spark, "r17dump_idx",
      emb.filter(col("vec_id") % 15 === 0), "vec_id")
    // BEFORE: what the live pass used to run — cellMembers over the
    // freshly reopened live view (anti-join + groupBy over the scan)
    dump("q144_live_members_before", operators.Similarity.cellMembers(
      operators.Similarity.readIvfIndexLive(spark, "r17dump_idx")))
    // AFTER: the filter over the persisted pre arrays (SparkEntry's
    // exact construction)
    val tombIds = operators.Similarity
      .readIvfTombstones(spark, "r17dump_idx")
      .collect().map(_.getLong(0)).sorted
    def tombstoned(id: org.apache.spark.sql.Column) =
      if (tombIds.isEmpty) lit(false) else id.isin(tombIds: _*)
    dump("q144_live_members_after", members0.select(col("cell"),
        filter(col("members"),
          m => !tombstoned(m.getField("neighbor_id"))).as("members"))
      .filter(size(col("members")) > 0))

    // ── appendLedger generation write (coalesce) ─────────────────────
    val incoming = spark.range(1, 200)
      .select(col("id").as("neighbor_id"))
    val mergedBefore = incoming.distinct()
    val mergedAfter = incoming.distinct().coalesce(1)
    dump("appendledger_gen_write_before", mergedBefore)
    dump("appendledger_gen_write_after", mergedAfter)
    spark.stop()
  }
}
