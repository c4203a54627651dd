package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-LAYOUT operators — how a 100 TB table is arranged on disk so
  * scans can skip most of it. Sorting clusters min/max statistics for
  * ONE column; a multi-dimensional workload (filter by time AND
  * domain, by length AND language) needs every row group tight on
  * SEVERAL columns at once. The classic answer is Morton/Z-ordering
  * (the `OPTIMIZE ZORDER BY` of lakehouse table formats): bucket each
  * dimension to a small fixed-width integer, interleave the bucket
  * bits into one scalar, and range-partition + sort the table by that
  * scalar. Points close on the Z-curve are close in EVERY dimension,
  * so parquet row-group min/max footers stay tight on all of them and
  * a multi-column box predicate prunes most row groups at scan time —
  * the engine-agnostic trick (no table-format dependency) measured in
  * PlanSpec as actual rows-read reduction.
  *
  * Everything here is integer-exact — bucketing is pure integer
  * arithmetic, never a float division — so the layout is reproducible
  * across engines and the q121 oracle replays z-values bit-for-bit in
  * SQL.
  */
object Layout {

  /** Morton interleave of pre-bucketed NON-NEGATIVE ints: bit `i` of
    * bucket `j` lands at position `i * d + j` (dimension 0 on the low
    * bit). Pure codegen'd bit arithmetic — `bits × d` shift/mask
    * terms, no join, no shuffle. `bits * d` must stay below 63 so the
    * result fits a signed long. */
  def zValueFromBuckets(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty, "need at least one dimension")
    require(bits >= 1 && bits * buckets.size <= 63,
      s"bits=$bits × ${buckets.size} dims must fit a signed long")
    val d = buckets.size
    val terms = for {
      i <- 0 until bits
      (b, j) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)),
      i * d + j)
    terms.reduce(_ + _)
  }

  /** Append an integer-exact equi-width z-value over numeric
    * dimension columns: one tiny min/max aggregate broadcasts back
    * over the table (no driver round-trip, one scan), each dimension
    * buckets to `[0, 2^bits)` as `((x − min) · 2^bits) div
    * (max − min + 1)` — integer arithmetic only, so there is no
    * float-boundary ambiguity for the oracle to disagree with — and
    * the buckets interleave via [[zValueFromBuckets]]. Null
    * dimensions bucket to 0 (nulls cluster at the curve origin rather
    * than scattering). Dimension values must satisfy
    * `(max − min) · 2^bits < 2^63` (true for any real id/length/time
    * dimension at bits ≤ 16). */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int,
                 out: String = "zvalue"): DataFrame = {
    require(cols.nonEmpty, "need at least one dimension")
    val statAggs = cols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"__min_$c"),
      max(col(c).cast("long")).as(s"__max_$c")))
    val stats = df.agg(statAggs.head, statAggs.tail: _*)
    // integer `div`, not Column `/` (which is DOUBLE division — a
    // float boundary the oracle could round differently)
    val joined = cols.foldLeft(df.crossJoin(broadcast(stats))) { (acc, c) =>
      acc
        .withColumn(s"__num_$c",
          (col(c).cast("long") - col(s"__min_$c")) * lit(1L << bits))
        .withColumn(s"__bkt_$c", coalesce(
          expr(s"`__num_$c` div (`__max_$c` - `__min_$c` + 1)"), lit(0L)))
    }
    joined
      .withColumn(out,
        zValueFromBuckets(cols.map(c => col(s"__bkt_$c")), bits))
      .drop(cols.flatMap(c =>
        Seq(s"__min_$c", s"__max_$c", s"__num_$c", s"__bkt_$c")): _*)
  }

  /** Re-layout a table along the Z-curve: [[withZValue]], then
    * range-partition into `numPartitions` output files and sort
    * within each — the write-side shape (`df → zOrderBy → write
    * .parquet`) that makes every downstream multi-column box scan
    * prune. One shuffle, paid once at write time, amortized over
    * every read after it (the bucketed-table trade, applied to scan
    * pruning instead of join co-location). The z-value column stays
    * on the output by default (`keepZValue = false` drops it) — it
    * doubles as a coarse spatial key downstream. */
  def zOrderBy(df: DataFrame, cols: Seq[String], bits: Int,
               numPartitions: Int, keepZValue: Boolean = true): DataFrame = {
    val z = withZValue(df, cols, bits)
    val laid = z.repartitionByRange(numPartitions, col("zvalue"))
      .sortWithinPartitions("zvalue")
    if (keepZValue) laid else laid.drop("zvalue")
  }

  /** Append a new batch to a z-ordered parquet directory — O(new),
    * never O(table): the batch is z-laid within ITSELF (its own
    * min/max epoch) and lands as new files; existing files are never
    * rewritten. Epoch-local bucketing means z-VALUES are not
    * comparable across epochs — they don't need to be: scan pruning
    * is PHYSICAL (each row group's min/max on the dimension columns
    * stays tight because each epoch is curve-clustered), not a
    * property of one global z scale. The daily-admission shape of the
    * exact-index growth loop (q101) applied to layout. Many appends
    * accumulate files and per-file z-spans overlap across epochs —
    * [[compactZOrdered]] is the remediation tier, exactly as Bloom
    * compaction remediates fpp drift. */
  def zOrderAppend(batch: DataFrame, cols: Seq[String], bits: Int,
                   numPartitions: Int, path: String): Unit =
    zOrderBy(batch, cols, bits, numPartitions)
      .write.mode("append").parquet(path)

  /** Re-layout an appended z-ordered directory into one clean epoch
    * at `outPath` — one read + one range shuffle over the current
    * table, bounded by table size like any OPTIMIZE-style compaction,
    * run on the drift signal (file count, or measured rows-read
    * regression on a probe box) rather than per append. Writes to a
    * NEW directory: swapping the live pointer is the caller's
    * stage-boundary move — or, first-class, the pointer-rooted
    * lifecycle below ([[writeZOrderedEpoch]] / [[zOrderAppendLive]] /
    * [[compactZOrderedLive]]), which gives layout epochs the same
    * crash story as the durable index families. */
  def compactZOrdered(spark: org.apache.spark.sql.SparkSession,
                      inPath: String, outPath: String, cols: Seq[String],
                      bits: Int, numPartitions: Int): Unit =
    zOrderBy(spark.read.parquet(inPath).drop("zvalue"), cols, bits,
      numPartitions)
      .write.mode("error").parquet(outPath)

  // --------------------------------------------------------------
  // pointer-rooted lifecycle: root/_graft_live names the serving
  // epoch directory ([[graft.sources.Sinks.swapEpochPointer]])

  /** Initial epoch of a POINTER-ROOTED z-ordered table: the laid-out
    * rows write to a fresh `epoch_<uuid>` directory under `root`, and
    * only a COMPLETE write can swap in as live (the pointer primitive
    * refuses a marker-less directory). Returns the epoch directory
    * name. Crash anywhere before the swap leaves either nothing or an
    * unreferenced partial directory — a reader refuses loudly (no
    * pointer) rather than seeing a partial table. */
  def writeZOrderedEpoch(df: DataFrame, root: String, cols: Seq[String],
                         bits: Int, numPartitions: Int): String = {
    val epoch = s"epoch_${java.util.UUID.randomUUID()}"
    zOrderBy(df, cols, bits, numPartitions)
      .write.mode("error").parquet(s"$root/$epoch")
    graft.sources.Sinks.swapEpochPointer(df.sparkSession, root, epoch)
    epoch
  }

  /** The live epoch of a pointer-rooted z-ordered table, as a
    * DataFrame — resolves `root/_graft_live` and refuses a missing or
    * incomplete epoch instead of reading half a table. */
  def readZOrderedLive(spark: org.apache.spark.sql.SparkSession,
                       root: String): DataFrame =
    spark.read.parquet(
      graft.sources.Sinks.resolveEpochPointer(spark, root))

  /** [[zOrderAppend]] into the LIVE epoch — O(new) growth without a
    * pointer move: Spark's job commit stages new files under
    * `_temporary` and renames them in atomically at commit, so a
    * crash mid-append leaves the old files intact and the staging
    * junk invisible to readers (underscore paths are skipped). */
  def zOrderAppendLive(batch: DataFrame, cols: Seq[String], bits: Int,
                       numPartitions: Int, root: String): Unit =
    zOrderAppend(batch, cols, bits, numPartitions,
      graft.sources.Sinks.resolveEpochPointer(batch.sparkSession, root))

  /** Fragmentation signal of a pointer-rooted z-ordered table — the
    * measurable cue [[compactZOrderedLive]]'s scaladoc defers to,
    * closing the layout lifecycle loop exactly as
    * [[graft.operators.Similarity.driftDecision]] closes the vector
    * one: appends are epoch-locally clustered ([[zOrderAppend]]), so
    * each append layer's files SPAN the z range again and a box scan
    * hits ~one file per layer instead of one file total. The signal
    * is `span_ratio` = Σ per-file z-span / global z-span — ≈ 1 for a
    * freshly compacted epoch (files partition the curve), ≈ k after k
    * full-range appends (every file overlaps every probe). One
    * column-pruned scan of the z column grouped by
    * `input_file_name()` — file counts are bounded, never row-scale
    * work beyond the single projection. */
  def layoutDriftSignal(spark: org.apache.spark.sql.SparkSession,
                        root: String): DataFrame = {
    val perFile = readZOrderedLive(spark, root)
      .select(input_file_name().as("__f"), col("zvalue"))
      .groupBy(col("__f"))
      .agg(min(col("zvalue")).as("zmin"), max(col("zvalue")).as("zmax"))
    perFile.agg(
      count(lit(1)).as("n_files"),
      (max(col("zmax")) - min(col("zmin")) + 1L).as("z_span"),
      sum(col("zmax") - col("zmin") + 1L).as("sum_file_spans"))
      .withColumn("span_ratio",
        round(col("sum_file_spans").cast("double") /
          col("z_span").cast("double"), 6))
  }

  /** Fold the drift signal into the compaction decision — ONE row
    * (`n_files`, `span_ratio`, `compact`). `compact = true` means
    * append layers have fragmented the curve past `maxSpanRatio` and
    * the next maintenance window should run [[compactZOrderedLive]];
    * until it fires, appends stay O(new). The layout analogue of
    * [[graft.operators.Similarity.driftDecision]] /
    * [[graft.operators.Dedup.estimatedFpp]]-driven Bloom compaction. */
  def compactionDecision(spark: org.apache.spark.sql.SparkSession,
                         root: String, maxSpanRatio: Double): DataFrame =
    layoutDriftSignal(spark, root)
      .select(col("n_files"), col("span_ratio"),
        (col("span_ratio") > lit(maxSpanRatio)).as("compact"))

  /** The ONE-CALL maintenance window for a pointer-rooted z-ordered
    * table — the layout analogue of
    * [[graft.operators.Similarity.maintainIvfPqIndex]]: measure the
    * fragmentation signal, fold the [[compactionDecision]], and ONLY
    * if it fires run [[compactZOrderedLive]] and re-measure. Returns
    * one report row `(n_files, span_ratio, compacted,
    * post_span_ratio, epoch_changed)`. An unfragmented table is a
    * no-op by construction — no epoch write, the live pointer
    * untouched, and `post_span_ratio ≡ span_ratio` without paying a
    * second signal scan (nothing moved). Cost discipline mirrors the
    * vector window: the signal is one column-pruned scan of the z
    * column, the O(table) re-layout happens only when the decision
    * fires. */
  def maintainZOrderedLive(spark: org.apache.spark.sql.SparkSession,
                           root: String, cols: Seq[String], bits: Int,
                           numPartitions: Int,
                           maxSpanRatio: Double): DataFrame = {
    import spark.implicits._
    def decide(): (Long, Double, Boolean) = {
      val d = compactionDecision(spark, root, maxSpanRatio).collect()(0)
      (d.getLong(0), d.getDouble(1), d.getBoolean(2))
    }
    val epochBefore = graft.sources.Sinks.resolveEpochPointer(spark, root)
    val (nFiles, ratio, fire) = decide()
    if (fire) compactZOrderedLive(spark, root, cols, bits, numPartitions)
    val postRatio = if (fire) decide()._2 else ratio
    val epochAfter = graft.sources.Sinks.resolveEpochPointer(spark, root)
    Seq((nFiles, ratio, fire, postRatio, epochAfter != epochBefore))
      .toDF("n_files", "span_ratio", "compacted", "post_span_ratio",
        "epoch_changed")
  }

  /** OPTIMIZE-style compaction of a pointer-rooted table, crash-safe
    * end to end: the clean epoch writes to a fresh directory BESIDE
    * the live one, the pointer swap is the atomic commit (readers see
    * the old epoch until the instant it lands, the new one after —
    * never a mix, never a partial: the swap itself refuses a
    * marker-less directory), and the superseded epoch deletes LAST,
    * best-effort (a crash before the delete leaves dead files, never
    * a wrong read). Returns the new epoch directory name. */
  def compactZOrderedLive(spark: org.apache.spark.sql.SparkSession,
                          root: String, cols: Seq[String], bits: Int,
                          numPartitions: Int): String = {
    val live = graft.sources.Sinks.resolveEpochPointer(spark, root)
    val epoch = s"epoch_${java.util.UUID.randomUUID()}"
    compactZOrdered(spark, live, s"$root/$epoch", cols, bits,
      numPartitions)
    graft.sources.Sinks.swapEpochPointer(spark, root, epoch)
    val liveP = new org.apache.hadoop.fs.Path(live)
    liveP.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(liveP, true)
    epoch
  }

  /** Garbage-collect UNREFERENCED epoch directories under a pointer
    * root — the cleanup rung the crash story leaves open: a
    * compaction or epoch write that dies mid-write leaves its partial
    * `epoch_<uuid>` directory "unreferenced beside the still-serving
    * old one", and because every retry writes a FRESH uuid, the
    * debris accumulates forever at 100 TB scale. The sweep resolves
    * the live pointer FIRST (and so refuses to run at all on a root
    * with no committed epoch — with no pointer there is no safe
    * notion of garbage), then deletes every `epoch_*` sibling except
    * the live one. Safe by the lifecycle's own invariants: only the
    * pointer makes an epoch readable, the pointer is swapped only to
    * complete directories, and nothing else under the root is
    * touched (the pointer file itself, temp files, foreign names all
    * survive). Returns the deleted directory names for the
    * maintenance log. Single-writer discipline applies as everywhere
    * in the family: don't sweep while another driver is mid-write of
    * a new epoch it has yet to swap in. */
  def gcEpochs(spark: org.apache.spark.sql.SparkSession,
               root: String): Seq[String] = {
    val live = new org.apache.hadoop.fs.Path(
      graft.sources.Sinks.resolveEpochPointer(spark, root)).getName
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(rootP).toSeq
      .filter(st => st.isDirectory
        && st.getPath.getName.startsWith("epoch_")
        && st.getPath.getName != live)
      .map { st => fs.delete(st.getPath, true); st.getPath.getName }
      .sorted
  }
}
