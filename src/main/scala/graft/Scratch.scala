package graft

import org.apache.spark.sql.SparkSession

import graft.sources.Transcripts
import graft.pipeline.Pipeline

/** Scratch profiling main (not part of the contract): interleaved A/B of the
  * bucketed vs plain route store on a larger synthetic input — interleaving
  * cancels this host's multi-x CPU-steal drift between runs.
  * Env: SPARK_GRAFT_SCALE_CONVS (default 400000 ≈ 7M turns), SPARK_GRAFT_CPUS.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val convs = sys.env.getOrElse("SPARK_GRAFT_SCALE_CONVS", "400000").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = java.nio.file.Files.createTempDirectory("graft-scratch").toString
    Pipeline.run(spark, Transcripts.fromEvents(spark, "/root/testdata/sf0.001"),
      s"$work/warmup") // JIT/codegen warmup
    val largeIn = s"$work/large_in"
    Transcripts.synthetic(spark, convs, seed = 42L, partitions = 64)
      .write.mode("overwrite").parquet(largeIn)
    val input = spark.read.parquet(largeIn)
    def rmrf(p: String): Unit = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(p)
      if (java.nio.file.Files.exists(root))
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
    }
    val results = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    (1 to 3).foreach { rep =>
      Seq("bucketed" -> true, "plain" -> false).foreach { case (tag, b) =>
        val dir = s"$work/run_${tag}_$rep"
        val t0 = System.nanoTime()
        val res = Pipeline.run(spark, input, dir, bucketRoute = b)
        val dt = (System.nanoTime() - t0) / 1e9
        results(tag) = dt :: results(tag)
        println(f"[scratch] rep $rep $tag%-8s total ${dt}%.2fs turns=${res.turns}")
        rmrf(dir)
      }
    }
    results.foreach { case (tag, ts) =>
      println(f"[scratch] $tag%-8s best ${ts.min}%.2fs all ${ts.map(t => f"$t%.1f").mkString(",")}")
    }
    spark.stop()
  }
}
