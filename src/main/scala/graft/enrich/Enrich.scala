package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lookup-enrich stage (SURVEY.md §2.4). Every reference join is a dict
  * lookup over a small side → broadcast hash joins, never sort-merge.
  */
object Enrich {

  /** J1 — session-label join: conv_id → {0,1}
    * (dataset/data_process.py:129-136). Left-outer with default mirrors the
    * reference's `.get(x)` null-on-miss (hdfs_data_process.py:67).
    *
    * `broadcastDim=true` fits the reference's file-sized label dicts. For a
    * PER-CONVERSATION label dim at 10^12-turn scale (≈10^9 conversations) a
    * forced broadcast would be wrong — pass false and let AQE pick
    * broadcast-vs-shuffle from runtime stats; the shuffle side co-partitions
    * with every downstream conv_id exchange anyway.
    */
  def convLabels(df: DataFrame, labels: DataFrame, default: Int = 0,
                 broadcastDim: Boolean = true): DataFrame = {
    val dim = if (broadcastDim) broadcast(labels) else labels
    df.join(dim, Seq("conv_id"), "left")
      .withColumn("label", coalesce(col("label"), lit(default)))
  }

  /** J2 — template-dictionary join: event_id → template text/metadata
    * (PLELog/data/DataLoader.py:287-302).
    */
  def templates(df: DataFrame, dict: DataFrame): DataFrame =
    df.join(broadcast(dict), Seq("event_id"), "left")

  /** Role/tool metadata enrich (the transcripts analog of the reference's
    * label-dict lookups — BASELINE.json north_star: "attaches template-ID,
    * role, and tool lookup metadata").
    */
  def roleToolMeta(df: DataFrame, meta: DataFrame): DataFrame =
    df.join(broadcast(meta), Seq("role", "tool"), "left")

  /** J3 — event → embedding-vector join with default on miss
    * (logdeep/dataset/sample.py:106-108: padding → [-1]*dim).
    */
  def embeddings(df: DataFrame, vectors: DataFrame, dim: Int,
                 eventCol: String = "event_id"): DataFrame =
    df.join(broadcast(vectors), Seq(eventCol), "left")
      .withColumn("vector",
        coalesce(col("vector"), array_repeat(lit(-1.0f), dim)))

  /** J5 — event → dense int id (frequency-ranked), unknown → 0
    * (dataset/hdfs_data_process.py:24-30).
    */
  def denseIds(df: DataFrame, vocab: DataFrame, eventCol: String = "event_id"): DataFrame =
    df.join(broadcast(vocab.select(col(eventCol), col("vocab_id"))), Seq(eventCol), "left")
      .withColumn("vocab_id", coalesce(col("vocab_id"), lit(0)))
}
