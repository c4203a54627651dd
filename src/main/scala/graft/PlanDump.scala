package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: dump `.explain("formatted")` for the round's
  * plan-diffed queries into `plans/r16/` — the judge-checkable
  * evidence files. For the winnow md5 change the BEFORE plan is
  * reproduced faithfully from current code by passing a FRESH lambda
  * that computes the same md5 hash (reference inequality with
  * [[graft.operators.Dedup.md5Hash60]] routes winnowFingerprints down
  * the generic interpreted-transform branch — exactly the old plan);
  * the AFTER plan is the recognized-by-reference native projection.
  * Args: <sfDir> <outDir>. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
      println(s"[plandump] wrote $outDir/$name.txt")
    }

    val docs = SparkEntry.queries // force object init (table helpers)
    val _ = docs

    // q88: the winnow fingerprint projection, BEFORE (interpreted
    // transform+md5+conv lambda — a fresh function value, so the
    // md5Hash60 reference-recognition does not fire) and AFTER (the
    // recognized native GramHashesMd5 projection).
    val freshMd5: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    def docsDf = {
      // same loader as the gates (handles both testdata ts layouts)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/documents.parquet")
    }
    dump("q88_winnow_fingerprints_before",
      graft.operators.TextAnalysis.winnowFingerprints(docsDf,
          "doc_id", "text", k = 4, w = 4, tokenHash = freshMd5)
        .orderBy(col("doc_id"), col("pos")))
    dump("q88_winnow_fingerprints_after",
      graft.operators.TextAnalysis.winnowFingerprints(docsDf,
          "doc_id", "text", k = 4, w = 4,
          tokenHash = graft.operators.Dedup.md5Hash60)
        .orderBy(col("doc_id"), col("pos")))
    // q89: the containment screen over the same projection — both
    // corpora's fingerprint subtrees flip from the interpreted
    // transform to the native projection.
    dump("q89_winnow_containment_before",
      graft.operators.TextAnalysis.winnowContainment(docsDf,
          docsDf.limit(50), "doc_id", "text", k = 4, w = 4,
          tokenHash = freshMd5))
    dump("q89_winnow_containment_after",
      graft.operators.TextAnalysis.winnowContainment(docsDf,
          docsDf.limit(50), "doc_id", "text", k = 4, w = 4,
          tokenHash = graft.operators.Dedup.md5Hash60))
    spark.stop()
  }
}
