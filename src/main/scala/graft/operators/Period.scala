package graft.operators

/** Pandas-style offset alias → period length in MICROSECONDS.
  *
  * The reference drivers pass resample periods as pandas offset
  * strings — `"100ms"`, `"1s"`, `"1min"` (main_2020.py:137-146 loops
  * over such a list; lib/resampler.py:63-66 converts them with
  * `pd.to_timedelta`). Microseconds are the engine's native timestamp
  * resolution, so every period the reference can express (down to the
  * skipped `"1ms"`) stays exact.
  */
object Period {

  // longer aliases first so "ms"/"min"/"sec" win over "m"/"s"
  private val Re = "^([0-9]*)\\s*(us|µs|ms|sec|s|min|m|T|h|d)$".r

  /** `"100ms"` → 100000, `"1s"` → 1000000, `"5min"` → 300000000 … */
  def micros(period: String): Long = period.trim match {
    case Re(num, unit) =>
      val n = if (num.isEmpty) 1L else num.toLong
      require(n > 0, s"period must be positive: $period")
      n * (unit match {
        case "us" | "µs"       => 1L
        case "ms"              => 1000L
        case "s" | "sec"       => 1000000L
        case "m" | "min" | "T" => 60000000L
        case "h"               => 3600000000L
        case "d"               => 86400000000L
      })
    case _ =>
      throw new IllegalArgumentException(s"unparseable period: $period")
  }
}
