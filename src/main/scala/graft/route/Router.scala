package graft.route

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Router / fan-out sinks with per-partition lineage + metrics, and
  * checkpoint-resumable stages (SURVEY.md §2.1 S8/S9, §4.2).
  *
  * The reference routes rows to per-class and per-template text files in
  * driver loops (dataset/data_process.py:214-254; PLELog/utils/Drain.py:201-213).
  * Here: ONE pass, `write.partitionBy(routeKey)` — a single shuffle-free
  * columnar write fanning out to one directory per route value — plus a
  * `_metrics` sidecar with per-sink row counts (the routed-row-equality
  * evidence the north rule requires) written atomically after the data.
  *
  * Resume: a stage whose `_SUCCESS` marker and `_metrics` sidecar both exist
  * is skipped on restart; outputs are overwritten per-stage otherwise, so a
  * rerun is idempotent (exactly-once per stage output).
  */
object Router {

  final case class SinkMetrics(route: String, rows: Long)

  /** Route `df` into `outDir` partitioned by `routeKey`; returns per-sink
    * counts. `maxRecordsPerFile` bounds file sizes at scale.
    */
  def fanOut(df: DataFrame, routeKey: String, outDir: String,
             train: Boolean = false, dedupCols: Seq[String] = Nil): Seq[SinkMetrics] = {
    val spark = df.sparkSession
    // train-side dedup only (dataset/data_process.py:163-176)
    val routed = if (train && dedupCols.nonEmpty) df.dropDuplicates(dedupCols) else df

    routed.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", 5000000)
      .partitionBy(routeKey)
      .parquet(s"$outDir/data")

    // per-sink counts from the written data (lineage: counts reflect what
    // actually landed, not what was planned)
    val counts = spark.read.parquet(s"$outDir/data")
      .groupBy(col(routeKey)).agg(count(lit(1)).as("rows"))
      .collect()
      .map(r => SinkMetrics(Option(r.get(0)).map(_.toString).getOrElse("null"), r.getLong(1)))
      .toSeq.sortBy(_.route)

    writeMetrics(outDir, counts)
    counts
  }

  def writeMetrics(outDir: String, counts: Seq[SinkMetrics]): Unit = {
    val json = counts.map(m => s"""{"route":"${m.route}","rows":${m.rows}}""")
      .mkString("[", ",", "]")
    Files.createDirectories(Paths.get(outDir))
    Files.writeString(Paths.get(s"$outDir/_metrics.json"), json)
  }

  /** True iff the stage at `outDir` completed (data `_SUCCESS` + metrics). */
  def isComplete(outDir: String): Boolean =
    Files.exists(Paths.get(s"$outDir/data/_SUCCESS")) &&
      Files.exists(Paths.get(s"$outDir/_metrics.json"))

  /** Checkpoint-resumable stage runner: skip if complete, else compute+write.
    * Returns the stage output as a DataFrame (read back from the sink so
    * downstream stages consume the materialized checkpoint, giving restart
    * cuts between every stage).
    */
  def stage(spark: SparkSession, outDir: String)(compute: => DataFrame): DataFrame =
    stageWithCount(spark, outDir)(compute)._1

  /** Like [[stage]], also returning the stage's row count — from the
    * `_metrics.json` sidecar when resuming, so completed stages cost zero
    * extra jobs.
    */
  def stageWithCount(spark: SparkSession, outDir: String)(compute: => DataFrame): (DataFrame, Long) = {
    val n = if (!isComplete(outDir)) {
      val df = compute
      df.write.mode(SaveMode.Overwrite).parquet(s"$outDir/data")
      val c = spark.read.parquet(s"$outDir/data").count() // metadata-only scan
      writeMetrics(outDir, Seq(SinkMetrics("_all", c)))
      c
    } else readMetrics(outDir).map(_.rows).sum
    (spark.read.parquet(s"$outDir/data"), n)
  }

  def readMetrics(outDir: String): Seq[SinkMetrics] = {
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$outDir/_metrics.json")), "UTF-8")
    """\{"route":"([^"]*)","rows":(\d+)\}""".r
      .findAllMatchIn(json)
      .map(m => SinkMetrics(m.group(1), m.group(2).toLong))
      .toSeq
  }
}
