package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: Long): Timestamp = new Timestamp(s * 1000)

  test("interpolateLinear: inside-only, gap limit, time-weighted (A3/J5)") {
    // grid: 0..7 (1s); values at t0=10, t4=20 (gap 3), t7 null tail
    val df = Seq(
      (ts(0), Some(10.0)), (ts(1), None), (ts(2), None), (ts(3), None),
      (ts(4), Some(20.0)), (ts(5), None), (ts(6), None), (ts(7), None))
      .toDF("t", "v")
    val all = TimeSeries.interpolateLinear(df, "t", "v", Nil, maxGap = 0)
      .orderBy("t").select("interp_value").collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    // inside gap fully filled; trailing nulls (no next bracket) stay null
    assert(all == Seq(Some(10.0), Some(12.5), Some(15.0), Some(17.5),
      Some(20.0), None, None, None))
    val limited = TimeSeries.interpolateLinear(df, "t", "v", Nil, maxGap = 2)
      .orderBy("t").select("interp_value").collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    // pandas limit=2: only the first 2 nulls of the run are filled
    assert(limited == Seq(Some(10.0), Some(12.5), Some(15.0), None,
      Some(20.0), None, None, None))
  }

  test("asofJoin: at-or-before incl. equal ts; nulls before first right row (J4)") {
    val left = Seq((1L, ts(10)), (1L, ts(20)), (1L, ts(5)), (2L, ts(10)))
      .toDF("k", "t")
    val right = Seq((1L, ts(10), 100.0), (1L, ts(15), 150.0))
      .toDF("k", "t", "v")
    val got = TimeSeries.asofJoin(left, right, "t", Seq("k"), Seq("v"))
      .orderBy("k", "t").select("k", "t", "asof_v").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got == Seq(
      (1L, 5L, None),          // before any right row
      (1L, 10L, Some(100.0)),  // equal ts → right row visible
      (1L, 20L, Some(150.0)),  // most recent at-or-before
      (2L, 10L, None)))        // key isolation
  }

  test("cumtrapz: trapezoid integral with non-uniform dx (A9)") {
    // power 0→1000W over 60s, then constant 1000W for 30s
    val df = Seq((ts(0), 0.0), (ts(60), 1000.0), (ts(90), 1000.0))
      .toDF("t", "p").withColumn("k", lit(1))
    val got = TimeSeries.cumtrapz(df, "t", "p", Seq("k"))
      .orderBy("t").select("integral").collect().map(_.getDouble(0)).toSeq
    // Wh: (0+1000)/2 * 60/3600 = 8.333..; + 1000 * 30/3600 = 8.333
    assert(math.abs(got(0)) < 1e-12)
    assert(math.abs(got(1) - 1000.0 / 2 * (60.0 / 3600)) < 1e-9)
    assert(math.abs(got(2) - (got(1) + 1000.0 * 30 / 3600)) < 1e-9)
  }

  test("timestampJumpFilter drops 100s-1000s jumps only (A6)") {
    // k=2: diff vs 2 rows back; jump of 500s lands in (100s, 1000s)
    val times = Seq(0L, 1L, 2L, 502L, 503L, 504L, 505L, 2000L)
    val df = times.map(ts).toDF("t").withColumn("k", lit(1))
    val kept = TimeSeries.timestampJumpFilter(df, "t", Seq("k"), k = 2)
      .select("t").collect().map(_.getTimestamp(0).getTime / 1000).toSeq.sorted
    // rows at 502,503 have diff 500s,501s vs 2-back → dropped;
    // 504 diff 2 → kept; 2000 diff 1496s ≥ 1000s → kept (outside band)
    assert(kept == Seq(0L, 1L, 2L, 504L, 505L, 2000L))
  }

  test("sessionize splits on >gap (strict) boundaries") {
    val df = Seq((1L, ts(0)), (1L, ts(1800)), (1L, ts(3601)), (2L, ts(0)))
      .toDF("u", "t")
    val got = TimeSeries.sessionize(df, "t", Seq("u"), 1800)
      .orderBy("u", "t").select("u", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // gap of exactly 1800 does NOT split (strictly greater); 1801 does
    assert(got == Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("iqrBlank nulls values outside the fences (A5, Q4: blank only)") {
    val vals = (1 to 100).map(_.toDouble) :+ 10000.0
    val df = vals.map(v => (1, v)).toDF("k", "v")
    val out = TimeSeries.iqrBlank(df, "v", Seq("k"))
    assert(out.filter(col("clean_value").isNull).count() == 1)
    assert(out.filter(col("clean_value") === 10000.0).count() == 0)
    assert(out.count() == 101) // rows kept, only blanked
  }

  test("keep-first strategies agree: window form ≡ min_by form (incl. null orders)") {
    // the two implementations exist for different WORKLOADS (see
    // dedupKeepFirst's strategy note) but must make identical picks
    // whenever the order columns form a total order within each key —
    // including null order values, where min_by's naive form would
    // diverge (NULLS FIRST parity is the subtle bit under test)
    val rnd = new scala.util.Random(42)
    val rows = (0 until 500).map { i =>
      (rnd.nextInt(40).toLong,                       // duplicate-heavy key
       if (rnd.nextInt(10) == 0) null
       else java.lang.Double.valueOf(rnd.nextInt(1000) * 1.0 + i * 1e-3),
       i.toLong,                                     // unique tiebreak
       s"p$i")
    }
    val df = rows.toDF("k", "ord", "tb", "payload")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("k").collect().map(_.toString).toSeq
    val win = canon(TimeSeries.dedupKeepFirst(df, Seq("k"), Seq("ord", "tb")))
    val agg = canon(TimeSeries.dedupKeepFirstMinBy(df, Seq("k"), Seq("ord", "tb")))
    assert(win.nonEmpty && win == agg)
  }
}
