package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1/P1-P4 — candump text scan + frame extraction.
  *
  * Input: SocketCAN dump lines like
  * `(1580415599.609366) can0 011#E4360F0000780216`.
  *
  * Replicates the reference regex admission semantics
  * (lib/canparser.py:274-283): case-insensitive ASCII, a line may
  * carry multiple frames (pandas `extractall` → `regexp_extract_all`
  * + explode), malformed lines silently dropped, payload 2-8 hex byte
  * pairs with a trailing `(?!\w)` guard.
  *
  * Scale design: one `spark.read.text` over all files (splittable at
  * block boundaries), `input_file_name()` tags per-file semantics,
  * `monotonically_increasing_id()` captures file order BEFORE any
  * shuffle (partition ids follow file-split order, so the id sorts by
  * file position). All extraction is codegen'd Column work — no UDFs.
  */
object Candump {

  /** Java-regex port of the reference pattern. Python's re.ASCII is
    * Java's default for \d/\w; (?i) covers IGNORECASE. Named groups
    * become positional: 1=timestamp, 2=interface, 3=topic, 4=payload. */
  val frameRegex: String =
    "(?i)\\((\\d{10}\\.\\d{6})\\)\\s(\\w+)\\s([0-9a-f]{3})#((?:[0-9a-f]{2}){2,8})(?!\\w)"

  /** Read candump files into a frame table:
    * (file, line_id, match_no, ts, interface, topic, payload_hex).
    * `ts` is µs-exact (string seconds.micros → long µs → timestamp).
    * `offsetMicros` applies the per-dataset clock offset
    * (lib/canparser.py:63-66, :205).
    */
  def frames(spark: SparkSession, path: String,
             offsetMicros: Long = 0L): DataFrame =
    framesFromLines(
      spark.read.textFile(path).toDF("line")
        .withColumn("file", input_file_name()),
      offsetMicros)

  /** Same extraction over an in-memory `line` column (e.g. generated
    * test corpora or a Structured Streaming text source). Expects
    * columns (line, file). */
  def framesFromLines(linesIn: DataFrame, offsetMicros: Long = 0L): DataFrame = {
    // chunk = input split: the unit of the reference's per-chunk
    // semantics (1M-line pandas chunks, lib/canparser.py:287-317) and
    // our parallelism unit for the order-dependent windows (crop Q2,
    // jump filter A6). Captured BEFORE any shuffle.
    val lines = linesIn
      .withColumn("chunk", spark_partition_id())
      .withColumn("line_id", monotonically_increasing_id())
    // pandas extractall: every non-overlapping match in the line.
    val matches = lines
      .select(col("file"), col("chunk"), col("line_id"),
        posexplode(regexp_extract_all(col("line"), lit(frameRegex), lit(0)))
          .as(Seq("match_no", "frame")))
    matches.select(
        col("file"), col("chunk"), col("line_id"), col("match_no"),
        regexp_extract(col("frame"), frameRegex, 1).as("ts_str"),
        regexp_extract(col("frame"), frameRegex, 2).as("interface"),
        regexp_extract(col("frame"), frameRegex, 3).as("topic_hex"),
        upper(regexp_extract(col("frame"), frameRegex, 4)).as("payload_hex"))
      .withColumn("ts_micros",
        expr("CAST(substring(ts_str, 1, 10) AS BIGINT) * 1000000L" +
             " + CAST(substring(ts_str, 12, 6) AS BIGINT)") + lit(offsetMicros))
      .withColumn("ts", timestamp_micros(col("ts_micros")))
      .withColumn("topic", conv(col("topic_hex"), 16, 10).cast("int"))
      .drop("ts_str", "topic_hex")
  }

  /** P2/Q2 — timestamp crop: keep rows between the FIRST and LAST
    * frame's timestamps in chunk order (raw positions, not min/max —
    * lib/canparser.py:209-212, applied per 1M-line chunk in the
    * reference). Interleaved garbage outside that range is removed.
    *
    * Whole-partition window (no ordering needed) instead of an
    * aggregate+join-back: ONE scan of the frames — an agg would
    * recompute the whole regex extraction for the bounds side. */
  def cropToFileRange(frames: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("file"), col("chunk"))
    val ord = struct(col("line_id"), col("match_no"))
    frames
      .withColumn("__first_ts", min_by(col("ts"), ord).over(w))
      .withColumn("__last_ts", max_by(col("ts"), ord).over(w))
      .filter(col("ts") >= col("__first_ts") && col("ts") <= col("__last_ts"))
      .drop("__first_ts", "__last_ts")
  }
}
