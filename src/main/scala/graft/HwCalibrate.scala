package graft

/** In-band hardware calibration: pure-CPU spin at 8 vs 32 threads, measuring
  * what thread-level speedup this (overcommitted, steal-prone) host can
  * deliver AT ALL in the current window. Scaling efficiencies are read
  * against `speedup/4` (the ceiling), not against the ideal 4.0 — the same
  * normalization ScalingBench and JvmScalingBench apply.
  *
  * As a main it prints ONE JSON line, so `tools/scaling_submit.sh` can run
  * it through the same spark-submit path, in the same window as the N-vs-4N
  * measurement it normalizes.
  */
object HwCalibrate {

  /** Min-of-reps wall time to execute a fixed amount of arithmetic across
    * `nThreads` threads (work is split evenly; min filters steal spikes).
    */
  def spinSeconds(nThreads: Int, reps: Int = 3): Double = {
    val total = 6400000000L
    val per   = total / nThreads
    (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val ts = Array.fill(nThreads)(new Thread(() => {
        var x = 0.0; var j = 0L
        while (j < per) { x += math.sqrt(j.toDouble); j += 1 }
        if (x < 0) println("")
      }))
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }.min
  }

  def main(args: Array[String]): Unit = {
    val spin8  = spinSeconds(8)
    val spin32 = spinSeconds(32)
    println(
      f"""{"metric":"hw_calibration","spin8_sec":$spin8%.2f,"spin32_sec":$spin32%.2f,""" +
      f""""speedup_8_to_32":${spin8 / spin32}%.3f,"ceiling_efficiency":${spin8 / spin32 / 4.0}%.3f}""")
  }
}
