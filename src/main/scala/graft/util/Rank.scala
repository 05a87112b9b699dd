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
  * Determinism (the round-3 fix — the round-2 form was WRONG at scale): the
  * count pass and the assign pass MUST consume the SAME RDD lineage. Each
  * `Dataset.rdd` call builds a fresh DAG with a fresh range exchange whose
  * boundary sampling is re-run per execution — two `.rdd` calls meant two
  * independently-sampled partitionings, and at 10^5 rows × local[32] the
  * boundaries drifted between the passes: offsets from one layout applied
  * to another produced a NON-permutation (measured: 100k rows, distinct
  * positions 99.7k, max position 100.9k, different every run). With one
  * shared lineage the boundaries are sampled once, the shuffle map output
  * is written once and reused by both jobs (skipped stages), and
  * `sortWithinPartitions` canonicalizes reduce-side fetch order — every
  * execution of the returned frame sees the identical layout.
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
    // ONE RDD lineage shared by both passes (see class doc: a second .rdd
    // call would re-sample the range boundaries and corrupt the rank)
    val sortedRdd = sorted.toDF().rdd
    // per-partition counts: one Long per partition — always tiny
    val counts = sortedRdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val total   = counts.sum
    val offsets = counts.scanLeft(0L)(_ + _)
    val bc      = spark.sparkContext.broadcast(offsets)

    val schema = StructType(
      sorted.schema :+ StructField(outCol, LongType, nullable = false))
    val rows = sortedRdd.mapPartitionsWithIndex { (i, it) =>
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

  /** Distributed EXCLUSIVE global prefix sum of `valueCol` (must be a
    * non-null LongType) over `order` — the running-offset primitive behind
    * token-stream chunking: `outCol` = sum of `valueCol` over all rows
    * strictly before this one in the global order. Returns (frame, total).
    *
    * Same two-phase / shared-lineage construction as [[globalRowNumber]]
    * (and the same determinism argument): a distributed range sort, one
    * collected Long per partition (the partition sums), broadcast offsets,
    * then a partition-local running accumulator. The scale-safe replacement
    * for `sum().over(Window.orderBy(...))`, which coalesces the input into
    * ONE task.
    *
    * `order` MUST be a total order over the rows (include a unique key, as
    * every current caller does): the per-row offsets come from
    * partition-local iteration order, so tied rows could swap offsets
    * between the two passes / recomputations — the same caveat documented
    * on [[globalRowNumber]].
    */
  def globalRunningSum(df: DataFrame, order: Seq[Column], valueCol: String,
                       outCol: String): (DataFrame, Long) = {
    val spark   = df.sparkSession
    val sorted  = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val vIdx    = sorted.schema.fieldIndex(valueCol)
    require(sorted.schema(vIdx).dataType == LongType,
      s"globalRunningSum: $valueCol must be LongType (cast at the call site)")
    val sortedRdd = sorted.toDF().rdd
    val sums = sortedRdd
      .mapPartitionsWithIndex((i, it) =>
        Iterator((i, it.foldLeft(0L)((a, r) => a + r.getLong(vIdx)))))
      .collect().sortBy(_._1).map(_._2)
    val total   = sums.sum
    val offsets = sums.scanLeft(0L)(_ + _)
    val bc      = spark.sparkContext.broadcast(offsets)

    val schema = StructType(
      sorted.schema :+ StructField(outCol, LongType, nullable = false))
    val rows = sortedRdd.mapPartitionsWithIndex { (i, it) =>
      var acc = bc.value(i)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ acc)
        acc += r.getLong(vIdx)
        out
      }
    }
    (spark.createDataFrame(rows, schema), total)
  }
}
