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

  /** Min-of-reps wall time to stream a shared 2 GiB long array (sequential
    * disjoint chunks per thread, 3 passes) — the MEMORY-BANDWIDTH twin of
    * [[spinSeconds]]. A data-processing job (parquet scan, shuffle rows,
    * codegen row buffers) is bandwidth-heavy; on one box, adding cores
    * multiplies ALUs but NOT DRAM channels, so the 8→32 stream ratio — not
    * the ALU spin ratio — is the ceiling such a job can approach. A real
    * N-node cluster scales bandwidth WITH cores, which is exactly what a
    * single-box local-cluster A/B cannot emulate.
    */
  def streamSeconds(nThreads: Int, reps: Int = 3): Double = {
    val n = sharedArray.length
    val chunk = n / nThreads
    (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val ts = Array.tabulate(nThreads) { t =>
        new Thread(() => {
          val arr = sharedArray
          val end = if (t == nThreads - 1) n else (t + 1) * chunk
          var s = 0L
          var pass = 0
          while (pass < 3) {
            var i = t * chunk
            while (i < end) { s += arr(i); i += 1 }
            pass += 1
          }
          if (s == 42) println("")
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }.min
  }

  private lazy val sharedArray: Array[Long] = {
    val a = new Array[Long](1 << 28) // 2 GiB of longs
    var i = 0
    while (i < a.length) { a(i) = i.toLong; i += 1 }
    a
  }

  def main(args: Array[String]): Unit = {
    val spin8    = spinSeconds(8)
    val spin32   = spinSeconds(32)
    val stream8  = streamSeconds(8)
    val stream32 = streamSeconds(32)
    println(
      f"""{"metric":"hw_calibration","spin8_sec":$spin8%.2f,"spin32_sec":$spin32%.2f,""" +
      f""""speedup_8_to_32":${spin8 / spin32}%.3f,"ceiling_efficiency":${spin8 / spin32 / 4.0}%.3f,""" +
      f""""stream8_sec":$stream8%.2f,"stream32_sec":$stream32%.2f,""" +
      f""""mem_speedup_8_to_32":${stream8 / stream32}%.3f,"mem_ceiling_efficiency":${stream8 / stream32 / 4.0}%.3f}""")
  }
}
