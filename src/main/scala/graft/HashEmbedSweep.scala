package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (QTime's sibling, not part of the library surface):
  * per-corpus cost of the native hashEmbed projection vs the SQL HOF
  * reference across dims — the evidence behind the r14 BENCH_NOTES
  * claim that the native path is flat in dim per token while the HOF
  * fold is O(tokens × dim). Usage: runMain graft.HashEmbedSweep <sfDir>.
  * The ssq fold in the timer is what forces the whole embedding:
  * a bare count() lets column pruning skip the computation entirely
  * and times nothing. */
object HashEmbedSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).filter(col("text").isNotNull)
      .persist()
    val n = docs.count()
    def time(tag: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      // force the full embedding: ssq folds over EVERY element, so
      // column pruning can't skip the computation
      val v = df.select(sum(expr(
        "aggregate(embedding, 0.0D, (a, x) -> a + x * x)")).as("s"))
        .collect()(0).getDouble(0)
      println(f"[sweep] $tag: ssq=$v%.0f, ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (_ <- 1 to 2; dim <- Seq(64, 1024, 4096)) {
      time(s"native dim=$dim",
        graft.operators.TextAnalysis.hashEmbed(docs, "text", dim))
      if (dim <= 1024)
        time(s"hof    dim=$dim",
          graft.operators.TextAnalysis.hashEmbedHof(docs, "text", dim))
    }
    println(s"[sweep] docs: $n")
    spark.stop()
  }
}
