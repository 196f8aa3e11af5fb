package graft.tools

import graft.util.{Hashing, Sessions}

/** Dev tool: does raw CPU work scale with local[N] on this box?
  * Runs a fixed amount of pure arithmetic through spark.range. */
object CpuScaleProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val n = 2000000000L
    val s = Sessions.build("cpu-probe", cores)
    import s.implicits._
    // warmup
    s.range(0, n / 10, 1, cores.toInt * 2).map(i => Hashing.splitmix64(i)).reduce(_ ^ _)
    val t0 = System.nanoTime()
    val x = s.range(0, n, 1, cores.toInt * 2).map(i => Hashing.splitmix64(i)).reduce(_ ^ _)
    println(f"[cpu-probe] cores=$cores sec=${(System.nanoTime() - t0) / 1e9}%.1f x=$x")
    s.stop()
  }
}
