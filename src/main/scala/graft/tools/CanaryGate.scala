package graft.tools

/** Canary pre-gate for recorded bench runs (VERDICT r12 item 1): every r12
  * full-suite sweep ran against an elevated shuffle canary (1.4–3.1 vs the
  * 0.9–1.3 quiet band), leaving the round without a usable comparison
  * base. This tool measures the SAME two probes `graft.Bench` embeds in
  * its artifact — the codegen CPU canary and the shuffle-I/O canary — and
  * exits non-zero when the host is loud, so `scripts/bench_quiet.sh` can
  * refuse to record and retry later instead of committing noise.
  *
  * Usage: `CanaryGate [maxShuffle] [maxCpu]` — defaults 1.3 / 0.45
  * (the quiet bands from README's bench history, upper edges). Prints one
  * JSON line either way; exit 0 = quiet, exit 1 = loud.
  */
object CanaryGate {
  def main(args: Array[String]): Unit = {
    val maxShuffle = args.headOption.flatMap(_.toDoubleOption).getOrElse(1.3)
    val maxCpu = args.lift(1).flatMap(_.toDoubleOption).getOrElse(0.45)
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpu = graft.Bench.canaryCpu(spark)
    val sh = graft.Bench.canaryShuffleIo(spark)
    val quiet = sh <= maxShuffle && cpu <= maxCpu
    println(f"""{"metric":"canary_gate","cpu":$cpu%.2f,"shuffle":$sh%.2f,""" +
      f""""max_cpu":$maxCpu%.2f,"max_shuffle":$maxShuffle%.2f,"quiet":$quiet}""")
    spark.stop()
    if (!quiet) sys.exit(1)
  }
}
