package graft.tools

/** Probe timing discipline (NOTES_r09 §2 lesson: single-shot probe
  * stages showed several-fold cross-run I/O variance — page-cache
  * state, first-touch parquet footers, JIT — making round-over-round
  * probe claims incomparable). Steady-state stages report the MEDIAN
  * of N runs with min/max spread so a claim like "screen cost is flat
  * after expiry" survives a noisy host; one-shot ingest stages (build,
  * publish, migrate) stay single-run BY NATURE and are labeled so. */
object ProbeTiming {

  /** One-shot stage: single run, wall-clock printed. */
  def tm[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s (one-shot)")
    r
  }

  /** Steady-state stage: `reps` runs, median/min/max printed. The
    * first run warms the page cache and any lazily-read footers, so
    * max−min IS the cache-state spread — reported, not hidden. */
  def tmMedian(label: String, reps: Int = 5)(f: => Unit): Unit = {
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }.sorted
    val med = times(times.length / 2)
    println(f"[probe] $label: median ${med}%.1f s over $reps runs " +
      f"(min ${times.head}%.1f, max ${times.last}%.1f — spread is " +
      "page-cache/host state)")
  }
}
