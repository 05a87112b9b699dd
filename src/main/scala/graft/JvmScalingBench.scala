package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.sources.Transcripts
import graft.pipeline.Pipeline

/** Separate-JVM scaling evidence (round-3 verdict item 2): the 500M-turn
  * ScalingBench sample fell below the 0.8 bar (raw 0.43 / normalized 0.61)
  * and the working hypothesis was "single 48 GiB JVM memory bandwidth / GC,
  * not job serialization". This bench DEMONSTRATES it with Spark's
  * `local-cluster[n, cores, memMB]` master — real separate executor JVMs on
  * one box, the closest sandbox proxy to multi-executor clusters:
  *
  *   A: local-cluster[1,8,40960]  — ONE executor JVM, 8 cores, 40 GiB heap
  *   B: local-cluster[4,2,10240]  — FOUR executor JVMs, 2 cores × 10 GiB
  *
  * Same total cores, same total heap, same input, interleaved best-of-N.
  * If B ≥ A at the large input while B ≈ A at the small control, the
  * slowdown is attributable to sharing one big heap (GC + allocation
  * bandwidth), i.e. an artifact the real N-executor deployment does not
  * have — measured, not argued.
  *
  * Run (tmpfs, ~30-50 min at the default ~230M turns; local-cluster workers
  * launch executors through `$SPARK_HOME/bin`, so both env vars are REQUIRED
  * — without SPARK_SCALA_VERSION the launcher dies with "Cannot find any
  * build directories"):
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 SPARK_DRIVER_MEM=16g \
  *     sbt -batch "runMain graft.JvmScalingBench"
  * Smoke: add SPARK_GRAFT_JVMS_CONVS=20000 SPARK_GRAFT_JVMS_CONVS_SMALL=10000
  *        SPARK_GRAFT_JVMS_REPS=1 SPARK_GRAFT_JVMS_MEM_MB=4096
  */
object JvmScalingBench {

  private final class CpuListener extends SparkListener {
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      if (e.taskMetrics != null) cpuNs.addAndGet(e.taskMetrics.executorCpuTime)
  }

  private var localDir: String = _

  /** Executor JVMs launched by local-cluster workers need the driver's
    * classpath (sbt-run ships no application jar) and the JDK17 add-opens
    * (spark-submit would inject them; a worker-spawned executor gets only
    * what we pass explicitly).
    */
  private def session(master: String, execMem: String, tag: String): SparkSession = {
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
    val s = SparkSession.builder()
      .master(master)
      .appName(s"graft-jvm-scaling-$tag")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.executor.memory", execMem)
      .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.local.dir", localDir)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def rmrf(p: String): Unit = {
    val path = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(path)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(path).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  def main(args: Array[String]): Unit = {
    // ~18 turns/conv -> 12.8M convs ~= 230M turns (the verdict's >=229M bar)
    val nConvLarge = sys.env.getOrElse("SPARK_GRAFT_JVMS_CONVS", "12800000").toInt
    val nConvSmall = sys.env.getOrElse("SPARK_GRAFT_JVMS_CONVS_SMALL", "400000").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_JVMS_REPS", "2").toInt
    val memMb = sys.env.getOrElse("SPARK_GRAFT_JVMS_MEM_MB", "40960").toInt

    val base =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
        java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("/dev/shm"), "graft-jvms").toString
      else java.nio.file.Files.createTempDirectory("graft-jvms").toString
    localDir = s"$base/spark-local"

    val configs = Seq(
      ("one_jvm_8c",  s"local-cluster[1,8,$memMb]", s"${memMb - 1024}m"),
      ("four_jvm_2c", s"local-cluster[4,2,${memMb / 4}]", s"${memMb / 4 - 512}m"))

    // generate inputs once (plain local mode)
    val largeIn = s"$base/large"; val smallIn = s"$base/small"; val warmIn = s"$base/warm"
    locally {
      val s = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.extensions", "graft.expr.GraftExtensions")
        .config("spark.local.dir", localDir)
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      Transcripts.synthetic(s, nConvLarge, seed = 42L, partitions = 64)
        .write.mode("overwrite").parquet(largeIn)
      Transcripts.synthetic(s, nConvSmall, seed = 43L, partitions = 32)
        .write.mode("overwrite").parquet(smallIn)
      Transcripts.synthetic(s, 20000, seed = 7L, partitions = 16)
        .write.mode("overwrite").parquet(warmIn)
      s.stop()
    }

    final case class Run(turns: Long, wallSec: Double, cpuSec: Double)
    def runOnce(cfg: (String, String, String), input: String, rep: Int): Run = {
      val (tag, master, execMem) = cfg
      val s = session(master, execMem, s"$tag-$rep")
      try {
        Pipeline.run(s, s.read.parquet(warmIn), s"$base/wu-$tag-$rep") // JIT + executor spin-up
        val l = new CpuListener
        s.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime()
        val res = Pipeline.run(s, s.read.parquet(input), s"$base/wk-$tag-$rep")
        val dt = (System.nanoTime() - t0) / 1e9
        s.sparkContext.removeSparkListener(l)
        require(res.routes.map(_.rows).sum == res.turns,
          s"router conservation violated under $master")
        System.err.println(f"[jvms] $tag rep $rep ${input.split('/').last}: " +
          f"turns=${res.turns} wall=$dt%.2fs cpu=${l.cpuNs.get / 1e9}%.1fs")
        Run(res.turns, dt, l.cpuNs.get / 1e9)
      } finally {
        s.stop()
        rmrf(s"$base/wu-$tag-$rep"); rmrf(s"$base/wk-$tag-$rep")
      }
    }

    // small control first (cheap), then the large A/B interleaved
    val control = configs.map(c => c._1 -> runOnce(c, smallIn, 0)).toMap
    val runs = (1 to reps).flatMap(r => configs.map(c => c._1 -> runOnce(c, largeIn, r)))
    def best(tag: String) = runs.collect { case (`tag`, r) => r }.minBy(_.wallSec)

    val a = best("one_jvm_8c"); val b = best("four_jvm_2c")
    val ca = control("one_jvm_8c"); val cb = control("four_jvm_2c")
    val largeRatio = (a.turns / b.wallSec) / (a.turns / a.wallSec)
    val smallRatio = (ca.turns / cb.wallSec) / (ca.turns / ca.wallSec)
    println(
      f"""{"metric":"jvm_scaling_ab","value":$largeRatio%.3f,"unit":"four_jvm_over_one_jvm_throughput",""" +
      f""""large_turns":${a.turns},"small_turns":${ca.turns},"reps":$reps,""" +
      f""""one_jvm_8c":{"large_sec":${a.wallSec}%.2f,"large_cpu_sec":${a.cpuSec}%.1f,"small_sec":${ca.wallSec}%.2f},""" +
      f""""four_jvm_2c":{"large_sec":${b.wallSec}%.2f,"large_cpu_sec":${b.cpuSec}%.1f,"small_sec":${cb.wallSec}%.2f},""" +
      f""""small_control_ratio":$smallRatio%.3f}""")
  }
}
