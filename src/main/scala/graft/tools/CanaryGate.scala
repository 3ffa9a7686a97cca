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
  * JSON line either way; exit 0 = quiet, exit 1 = loud, exit 2 = bad args.
  *
  * Malformed thresholds FAIL LOUD (ADVICE r13): a tool that gates whether
  * bench evidence may be recorded must not silently substitute a looser
  * default band for a typo'd argument.
  */
object CanaryGate {
  private def numArg(args: Array[String], i: Int, default: Double): Double =
    args.lift(i) match {
      case None => default
      case Some(a) => a.toDoubleOption.getOrElse {
        System.err.println(
          s"CanaryGate: non-numeric threshold '$a'. Usage: CanaryGate [maxShuffle] [maxCpu]")
        sys.exit(2)
      }
    }

  def main(args: Array[String]): Unit = {
    val maxShuffle = numArg(args, 0, 1.3)
    val maxCpu = numArg(args, 1, 0.45)
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
