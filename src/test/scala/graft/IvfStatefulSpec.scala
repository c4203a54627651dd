package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.streaming.StatefulSessionize

class IvfStatefulSpec extends SparkSpec {
  import spark.implicits._

  test("IVF ANN: planted near-dup recall with probed cells") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val copies = emb.filter($"vec_id" < 15).select(
      ($"vec_id" + 100000L).as("vec_id"),
      transform($"embedding", x => x * lit(1.01f) + lit(0.001f)).as("embedding"))
    val corpus = emb.select("vec_id", "embedding").unionByName(copies)
    val queries = emb.filter($"vec_id" < 15).select("vec_id", "embedding")
    val got = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding",
        k = 1, nCells = 16, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the planted copy is ~cosine 0.9999 to its query: same cell with
    // near-certainty, so IVF must find it
    val recall = (0L until 15L).count(q => got.get(q).contains(q + 100000L)) / 15.0
    assert(recall >= 0.8, s"IVF top-1 recall $recall: $got")
  }

  test("stateful streaming sessionization matches the batch operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StatefulSessionize.Event]
    val q = StatefulSessionize.sessionize(mem.toDS(), gapSec = 1800)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // batch 1: two events 10 min apart → one session
      mem.addData(
        StatefulSessionize.Event(1L, 1L, 0L),
        StatefulSessionize.Event(1L, 2L, 600L * 1000000))
      q.processAllAvailable()
      // batch 2: 2h after the last → NEW session (state carried across
      // micro-batches); another user starts independently
      mem.addData(
        StatefulSessionize.Event(1L, 3L, 7800L * 1000000),
        StatefulSessionize.Event(2L, 4L, 0L))
      q.processAllAvailable()
      val got = spark.sql("select user_id, event_id, session_id from sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (2L, 4L, 1L)))
      // equivalence with the batch operator on the same data
      val batch = graft.operators.TimeSeries.sessionize(
        Seq((1L, 1L, 0L), (1L, 2L, 600L), (1L, 3L, 7800L), (2L, 4L, 0L))
          .map { case (u, e, s) => (u, e, new java.sql.Timestamp(s * 1000)) }
          .toDF("user_id", "event_id", "ts"),
        "ts", Seq("user_id"), 1800, Seq("event_id"))
        .select("user_id", "event_id", "session_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(batch == got)
    } finally q.stop()
  }
}
