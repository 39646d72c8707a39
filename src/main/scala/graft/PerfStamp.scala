package graft

/** Machine-state stamp for the perf artifacts (bench / throughput /
  * scale-probe JSON): the 1-minute system load average sampled before
  * and after a run. A shared sandbox can inflate a measurement 5-20x
  * with no code change (round 11's merge_profiles, round 12's final
  * bench pass); stamping the load turns "it was external contention"
  * from narrative into evidence readable next to the numbers.
  */
object PerfStamp {
  /** 1-minute system load average (-1.0 where the JVM can't read it). */
  def loadAvg(): Double =
    java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

  /** JSON fields (no braces) to splice into a perf artifact line.
    * Formats with Locale.ROOT: the f-interpolator uses the JVM default
    * locale, which under a comma-decimal locale would emit `0,42` —
    * invalid JSON. */
  def fields(before: Double, after: Double): String = {
    def d2(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    s""""load_before":${d2(before)},"load_after":${d2(after)},"host_cpus":${Runtime.getRuntime.availableProcessors()}"""
  }
}
