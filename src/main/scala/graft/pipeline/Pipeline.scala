package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.parse.{Drain, DrainConfig}
import graft.windows.Windows
import graft.agg.Features
import graft.enrich.Enrich
import graft.route.Router

/** The end-to-end parse → enrich → route → window → aggregate job
  * (BASELINE.json north_rule), checkpoint-resumable with per-partition
  * lineage + row-count metrics.
  *
  * Stage layout (each a [[Router.stage]] checkpoint; restart skips complete
  * stages, so a kill at any cut resumes without recomputation):
  *
  *   1. parse      — Drain mine (partition trees + canonical merge) + match;
  *                   adds event_id/event_template. Narrow except the tiny
  *                   template collect.
  *   2. enrich     — broadcast joins: template dict + conversation labels.
  *   3. route      — single-pass fan-out `partitionBy(event_id)` +
  *                   per-sink counts (`_metrics.json`).
  *   4. aggregate  — session sequences, count vectors, TF-IDF; the hot
  *                   template count goes through the salted two-level
  *                   aggregate (SURVEY.md §4.2).
  *
  * Scale design: the only wide exchanges are (a) the conv_id hash partition
  * before windowing (reused by every per-conversation aggregate), (b) the
  * salted count, (c) the fan-out write. All joins are broadcast. No global
  * sort anywhere.
  */
object Pipeline {

  final case class Result(
      turns: Long,
      templates: Int,
      routes: Seq[Router.SinkMetrics],
      windows: Long,
      countVectorRows: Long)

  private def timed[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a  = f
    if (sys.env.contains("GRAFT_TIMING"))
      System.err.println(f"[pipeline] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    a
  }

  def run(spark: SparkSession, transcripts: DataFrame, workDir: String,
          cfg: DrainConfig = DrainConfig(depth = 4, st = 0.4)): Result = {

    // -- stage 1: parse ----------------------------------------------------
    val parsedDf = timed("parse")(Router.stage(spark, s"$workDir/parse") {
      val (p, _) = Drain.parse(transcripts, "text", cfg)
      // conv_id-hash partitioning keeps turn ordering stable downstream and
      // is reused by every per-conversation window/aggregate.
      p.repartition(col("conv_id"))
    })

    val dict = timed("dict")(parsedDf.select("event_id", "event_template")
      .distinct().collect())
    val templates = dict.length

    // -- stage 2: enrich ---------------------------------------------------
    val enriched = timed("enrich")(Router.stage(spark, s"$workDir/enrich") {
      val labels = parsedDf.groupBy(col("conv_id"))
        .agg(max(when(col("role") === "tool", 1).otherwise(0)).as("label"))
      Enrich.convLabels(parsedDf, labels)
    })

    // -- stage 3: route ------------------------------------------------------
    val routes =
      if (Router.isComplete(s"$workDir/route"))
        readMetrics(s"$workDir/route")
      else
        timed("route")(Router.fanOut(enriched, "event_id", s"$workDir/route"))

    // -- stage 4: aggregate --------------------------------------------------
    val grouped = timed("windows")(Router.stage(spark, s"$workDir/windows") {
      Windows.sessionGroup(enriched, labelCol = Some("label"))
        .withColumn("label", element_at(col("labels"), 1))
        .drop("labels")
    })
    val cv = timed("count_vectors")(Router.stage(spark, s"$workDir/count_vectors") {
      val counts = Features.countVectors(enriched, Seq("conv_id"))
      Features.tfidf(counts, Seq("conv_id"))
    })
    // salted hot-template aggregate (north rule) — tiny output, not a stage
    timed("salted_count")(Features.saltedCount(enriched, "event_id").collect())

    timed("final_counts")(Result(enriched.count(), templates, routes, grouped.count(), cv.count()))
  }

  private def readMetrics(dir: String): Seq[Router.SinkMetrics] = {
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_metrics.json")), "UTF-8")
    """\{"route":"([^"]*)","rows":(\d+)\}""".r
      .findAllMatchIn(json)
      .map(m => Router.SinkMetrics(m.group(1), m.group(2).toLong))
      .toSeq
  }
}
