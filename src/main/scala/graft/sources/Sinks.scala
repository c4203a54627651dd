package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sinks + timezone display helpers rounding out the SURVEY.md §2.1
  * checklist: S4 parquet (with S9 skip-if-exists), S6 CSV, and the P13
  * tz localize/convert semantics — the engine computes on UTC
  * instants; the reference renders them in America/Sao_Paulo
  * (lib/unifier_with_forecast_data.py:44,59-61, lib/process_gpx_data.py:133-138).
  */
object Sinks {

  val ReferenceTz = "America/Sao_Paulo"

  /** P13: UTC instant → wall-clock column in `tz` (pandas
    * tz_localize("UTC").tz_convert(tz) display parity). */
  def displayInTz(ts: Column, tz: String = ReferenceTz): Column =
    from_utc_timestamp(ts, tz)

  /** P13 inverse: wall-clock in `tz` → UTC instant (tz_localize). */
  def fromTz(ts: Column, tz: String = ReferenceTz): Column =
    to_utc_timestamp(ts, tz)

  /** S6: CSV sink (GPS track / solar dataset exports). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** S4+S9: parquet sink with skip-if-exists incremental semantics. */
  def writeParquetIfAbsent(df: DataFrame, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) false
    else { df.write.parquet(path); true }
  }

  /** Bucketed parquet table: pre-shuffles ONCE at write time so every
    * later equi-join or aggregation on `bucketCols` is co-located —
    * no Exchange in the join plan (SortMergeJoin reads matching
    * buckets directly). This is the 100 TB shape for repeated joins on
    * a stable key (e.g. telemetry ⋈ per-timestamp reference data, or
    * doc-id joins across dedup passes): pay the shuffle once at ingest
    * instead of per query. Requires a table (bucket metadata lives in
    * the catalog), hence `saveAsTable` rather than a bare path. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int): Unit = {
    dropStaleManagedLocation(df, table)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** saveAsTable refuses a managed-table name whose warehouse
    * LOCATION survives from an earlier session (the default
    * in-memory catalog forgets tables across JVMs; the filesystem
    * does not). If the table is unknown to this session's catalog
    * but its default location exists, remove the orphan so an
    * Overwrite write is re-runnable across driver restarts. */
  private[graft] def dropStaleManagedLocation(df: DataFrame,
                                              table: String): Unit = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      // resolve through the session catalog (current database + name
      // normalization), not a hand-built <warehouse>/<name> guess
      val loc = new Path(org.apache.spark.sql.GraftExpressionBridge
        .defaultManagedTablePath(spark, table))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
  }
}
