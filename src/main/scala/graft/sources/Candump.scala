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
    val lines = linesIn.withColumn("line_id", monotonically_increasing_id())
    // pandas extractall: every non-overlapping match in the line.
    val matches = lines
      .select(col("file"), col("line_id"),
        posexplode(regexp_extract_all(col("line"), lit(frameRegex), lit(0)))
          .as(Seq("match_no", "frame")))
    matches.select(
        col("file"), col("line_id"), col("match_no"),
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
    * frame's timestamps in file order (raw positions, not min/max —
    * lib/canparser.py:209-212). Interleaved garbage outside that range
    * is removed. Computed per file with one tiny aggregate joined back
    * (broadcast — one row per file). */
  def cropToFileRange(frames: DataFrame): DataFrame = {
    val bounds = frames.groupBy(col("file"))
      .agg(min_by(col("ts"), struct(col("line_id"), col("match_no"))).as("first_ts"),
           max_by(col("ts"), struct(col("line_id"), col("match_no"))).as("last_ts"))
    frames.join(broadcast(bounds), Seq("file"))
      .filter(col("ts") >= col("first_ts") && col("ts") <= col("last_ts"))
      .drop("first_ts", "last_ts")
  }
}
