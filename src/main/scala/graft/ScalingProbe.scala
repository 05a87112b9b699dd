package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Transcripts
import graft.parse.{Drain, DrainConfig}

/** Scratch probe: which phase scales with cores? (not part of the contract) */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-probe").toString
    locally {
      val s = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      val df = Transcripts.synthetic(s, 400000, 42L, 64)
      df.write.mode("overwrite").parquet(s"$tmp/in")
      val cfg = DrainConfig(depth = 4, st = 0.4)
      val in = s.read.parquet(s"$tmp/in")
      Drain.matchTemplates(in, "text", Drain.mine(in, "text", cfg), cfg)
        .write.mode("overwrite").parquet(s"$tmp/parsed")
      s.stop()
    }
    Seq(8, 32, 8, 32).foreach { cpus =>
      val s = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      def t(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        println(f"[probe] local[$cpus] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      val parsed = s.read.parquet(s"$tmp/parsed")
      t("collect_list_plain")(
        parsed.groupBy("conv_id").agg(collect_list(col("event_id")))
          .write.format("noop").mode("overwrite").save())
      t("session_group")(graft.windows.Windows.sessionGroup(parsed)
        .write.format("noop").mode("overwrite").save())
      t("count_vectors")(graft.agg.Features.countVectors(parsed, Seq("conv_id"))
        .write.format("noop").mode("overwrite").save())
      s.stop()
    }
  }
}
