package graft

/** Standalone entry for [[Bench.probe]] so a shell loop can sample host
  * contention WITHOUT paying an sbt+Spark startup (plain
  * `java -cp target/scala-2.13/classes graft.Probe`): prints one JSON
  * line `{"min":…,"median":…,"max":…,"quiet":bool}` in the same r7 LCG
  * units and against the same committed floor
  * ([[Bench.QuietProbeMedianFloor]]) as the embedded bench probes, so a
  * quiet-window watcher and BENCH_DETAIL.json's `probe_quiet` verdict
  * can never disagree about what "quiet" means.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val s @ (mn, md, mx, steal) = Bench.probeWithSteal()
    // the SHARED gate (median floor AND steal band) — r11 closed the
    // median-only hole, and this tool must agree with probe_quiet
    println(s"""{"min":$mn,"median":$md,"max":$mx,""" +
      f""""steal_pct":$steal%.2f,""" +
      s""""quiet":${Bench.sampleQuiet(s)}}""")
  }
}
