package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Transcripts
import graft.pipeline.Pipeline

/** Per-round benchmark main (driver contract): headline queries on
  * SPARK_GRAFT_SF_DIR, ONE JSON line on stdout.
  *
  * "pipeline" is the end-to-end parse→enrich→route→window→aggregate job
  * (the north-rule metric); the remaining entries time individual operators
  * (forced through a noop sink so column pruning can't skip work).
  */
object Bench {

  def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a  = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val work = java.nio.file.Files.createTempDirectory("graft-bench").toString
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    var turns = 0L

    // JIT/codegen warmup on the smallest SF so measured numbers are
    // steady-state (first-run codegen at high thread counts is ~10× slower)
    Pipeline.run(spark, Transcripts.fromEvents(spark, "/root/testdata/sf0.001"),
      s"$work/warmup")

    // end-to-end pipeline (includes routed sink writes + metrics)
    val (res, tPipe) = timed {
      Pipeline.run(spark, Transcripts.fromEvents(spark, sfDir), s"$work/pipe")
    }
    turns = res.turns
    results += "pipeline" -> tPipe

    // individual operators
    val singles = Seq(
      "parse_structured" -> SparkEntry.queries("q_parse_structured"),
      "session_seq"      -> SparkEntry.queries("q_session_seq"),
      "fixed_window"     -> SparkEntry.queries("q_fixed_window"),
      "history_window"   -> SparkEntry.queries("q_history"),
      "tfidf"            -> SparkEntry.queries("q_tfidf"),
      "deltat"           -> SparkEntry.queries("q_deltat"),
      "dedup_exact"      -> SparkEntry.queries("q_dedup_exact"),
      "minhash_lsh"      -> SparkEntry.queries("q_minhash_lsh"),
      "embed_dedup_lsh"  -> SparkEntry.queries("q_embed_dedup_lsh"),
      "ann_brute"        -> SparkEntry.queries("q_ann_brute"),
      "lang_quality"     -> SparkEntry.queries("q_lang_quality"),
      "q1_agg"           -> SparkEntry.queries("q1_agg")
    )
    // best-of-2: the sandbox host shows 2-3× round-to-round CPU steal; the
    // minimum is the least-interfered estimate (see BASELINE.md methodology)
    singles.foreach { case (name, fn) =>
      val t = (1 to 2).map(_ => timed(force(fn(spark, sfDir)))._2).min
      results += name -> t
    }

    // throughput-representative run: the sf-dir pipeline is dominated by
    // fixed per-stage overhead at 10^5 rows; a ~3M-turn synthetic input
    // (generation excluded from timing) measures sustained turns/sec
    val largeIn = s"$work/large_in"
    Transcripts.synthetic(spark, 150000, seed = 42L, partitions = 64)
      .write.mode("overwrite").parquet(largeIn)
    val (resL, tLarge) = timed {
      Pipeline.run(spark, spark.read.parquet(largeIn), s"$work/large")
    }
    results += "pipeline_3m_turns" -> tLarge

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.values.sum
    val tput  = if (tPipe > 0) turns / tPipe else 0.0
    val tputL = if (tLarge > 0) resL.turns / tLarge else 0.0
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","turns":$turns,"pipeline_turns_per_sec":$tput%.1f,"large_turns":${resL.turns},"pipeline_large_turns_per_sec":$tputL%.1f}"""
    // stdout (unprefixed — build.sbt sets run/outputStrategy := StdoutOutput)
    // AND a file, so the driver can parse the metrics either way
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), line + "\n")
    spark.stop()
  }
}
