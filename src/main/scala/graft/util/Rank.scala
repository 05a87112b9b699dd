package graft.util

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Distributed global row_number — the scale-safe replacement for
  * `row_number().over(Window.orderBy(...))`, which coalesces the entire
  * input into ONE partition (the classic global-sort trap, SURVEY.md §7.3.3).
  *
  * Two-phase formulation (the same one `Windows.positionalSplit` pinned in
  * round 1, factored out so vocab ranking shares it):
  *   1. range-partition + sort within partitions — a DISTRIBUTED sort;
  *   2. collect only the per-partition row counts (one Long per partition);
  *   3. global index = broadcast partition offset + local position.
  *
  * Determinism: the range partitioner's reservoir sampling is seeded per
  * partition index and the parquet scan order is stable, so recomputing the
  * sorted form (when `persistSorted = false`) reproduces the identical
  * layout — the two passes see the same row order.
  *
  * `persistSorted`: spill-backed caching of the sorted form between the
  * count pass and the assign pass. Set it for post-aggregation inputs (a
  * vocab's (key, freq) table is orders of magnitude smaller than the corpus);
  * leave it off for full-table inputs (positional split at 10^12 rows), where
  * one deterministic recompute beats materializing the table.
  */
object Rank {

  /** Append 1-based global rank `outCol` (LongType) ordered by `order`.
    * Returns (ranked dataframe, total row count).
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column], outCol: String,
                      persistSorted: Boolean = false): (DataFrame, Long) = {
    val spark   = df.sparkSession
    val sorted0 = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val sorted  = if (persistSorted) sorted0.persist(StorageLevel.MEMORY_AND_DISK)
                  else sorted0
    // per-partition counts: one Long per partition — always tiny
    val counts = sorted.toDF().rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val total   = counts.sum
    val offsets = counts.scanLeft(0L)(_ + _)
    val bc      = spark.sparkContext.broadcast(offsets)

    val schema = StructType(
      sorted.schema :+ StructField(outCol, LongType, nullable = false))
    val rows = sorted.toDF().rdd.mapPartitionsWithIndex { (i, it) =>
      var idx = bc.value(i)
      it.map { r => idx += 1; Row.fromSeq(r.toSeq :+ idx) }
    }
    val out = spark.createDataFrame(rows, schema)
    if (persistSorted) {
      // Release the sorted cache before returning: a long-lived session
      // (Verify runs every query in one session) would otherwise accumulate
      // one MEMORY_AND_DISK table per vocab call until shutdown. The ranked
      // output is localCheckpoint'ed (eager) first so the returned plan no
      // longer references the unpersisted cache.
      val pinned = out.localCheckpoint(true)
      sorted.unpersist(false)
      (pinned, total)
    } else (out, total)
  }
}
