package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.parse.LogFormat

/** S1 — raw log-file source (SURVEY.md §2.1): read text line-by-line, split
  * by a compiled `log_format`, drop non-matching lines. The reference does
  * this in a Python read loop (logparser/Drain.py:295-317); here it is a
  * `spark.read.text` scan plus codegen'd `regexp_extract` projections.
  *
  * Ordering: the reference's 1-based file-order `LineId` is not reproducible
  * on a distributed read (`monotonically_increasing_id` is
  * partition-dependent), so downstream ordering must come from content
  * columns — exactly the (conv_id, turn_idx) invariant of the transcripts
  * schema (SURVEY.md §4.2).
  */
object RawLogs {

  def read(spark: SparkSession, path: String, logFormat: String,
           nasciiScrub: Boolean = false): DataFrame = {
    val fmt  = LogFormat.compile(logFormat)
    var raw  = spark.read.text(path).withColumnRenamed("value", "line")
    // Spell's variant replaces non-ASCII with <NASCII> (Spell.py:297)
    if (nasciiScrub)
      raw = raw.withColumn("line", regexp_replace(col("line"), "[^\\x00-\\x7F]+", "<NASCII>"))
    LogFormat.split(raw, "line", fmt)
  }

  /** S11 — fastText-style `.vec` scan (PLELog/data/Embedding.py:105-113):
    * `word v1 v2 ... vd` per line (optional `count dim` header skipped) →
    * (word, vector) dim table for broadcast.
    */
  def readVecFile(spark: SparkSession, path: String): DataFrame = {
    val toks = split(trim(col("value")), "\\s+")
    spark.read.text(path)
      .select(toks.as("t"))
      .filter(size(col("t")) > 2) // drops the "n dim" header line
      .select(element_at(col("t"), 1).as("word"),
        expr("transform(slice(t, 2, size(t) - 1), x -> cast(x as float))").as("vector"))
  }

  /** P7 — drop the first k whitespace-separated header tokens of a raw line
    * (PLELog/data/DataLoader.py:133,158-159).
    */
  def dropHeaderTokens(line: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    array_join(slice(split(trim(line), "\\s+"), lit(k + 1), lit(1000000)), " ")
}
