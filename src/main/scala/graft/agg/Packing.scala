package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence PACKING for LLM training-data assembly: greedily pack documents
  * into fixed-token-budget training sequences in pinned (shard, id) order,
  * opening a new pack whenever the running token total would exceed the
  * budget. An oversized single document (tokens > budget) gets a pack of
  * its own and the scan continues.
  *
  * Spark-first shape — the same as [[graft.windows.Windows.anchorSessions]]:
  * ONE hash exchange on the shard key, a partition-local secondary sort on
  * (shard, id), then a STREAMING scan with O(1) state (running total + pack
  * index). No per-group buffering: a shard of 10^9 documents streams
  * through its task; shard parallelism is the scale axis (one task per
  * shard bucket, shards >> cores in a real corpus).
  *
  * Deterministic by construction — packing order is pinned by (shard, id),
  * so the q_pack_budget oracle re-derives the exact pack assignment with a
  * DuckDB recursive CTE (the q_anchor_sessions pattern). Caller contract:
  * ids are unique within a shard (ties would make the scan order, and thus
  * the packing, ambiguous on both engines).
  */
object Packing {

  /** @param tokensCol per-document token count column (any numeric)
    * @param maxDocsPerShard loud skew guard: one shard = one task is inherent
    *        to the streaming-scan semantics, so a pathological shard key
    *        (e.g. a constant) would silently serialize the whole corpus into
    *        one task. Past the cap the scan THROWS with the shard name —
    *        inside the same per-partition scan, so no plan rewrite can prune
    *        it (the `rangeJoinBinned` fail-loud pattern). Raise it only with
    *        a shard key you know is bounded.
    * @return input columns (shard cast string, id cast long, tokens cast
    *         long) + `pack_idx` (0-based per shard)
    */
  def packBudget(df: DataFrame, shardCol: String, idCol: String,
                 tokensCol: String, budget: Long,
                 maxDocsPerShard: Long = 10000000L): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(maxDocsPerShard > 0, "maxDocsPerShard must be positive")
    import df.sparkSession.implicits._
    val slim = df.select(
        col(shardCol).cast("string").as("__sh"),
        col(idCol).cast("long").as("__id"),
        col(tokensCol).cast("long").as("__tk"))
      .repartition(col("__sh"))
      .sortWithinPartitions(col("__sh"), col("__id"))
      .as[(String, Long, Long)]
    slim.mapPartitions { it =>
      var cur: String = null
      var used = 0L
      var pack = -1
      var inShard = 0L
      it.map { case (sh, id, tk) =>
        if (sh != cur) { cur = sh; used = 0L; pack = -1; inShard = 0L }
        inShard += 1
        if (inShard > maxDocsPerShard)
          throw new IllegalStateException(
            s"packBudget: shard '$sh' exceeds maxDocsPerShard=$maxDocsPerShard " +
              "documents — one shard streams through one task by construction, " +
              "so a shard this large serializes the job; use a finer shard key " +
              "or raise the cap explicitly")
        if (pack < 0 || used + tk > budget) { pack += 1; used = tk }
        else used += tk
        (sh, id, tk, pack)
      }
    }.toDF(shardCol, idCol, tokensCol, "pack_idx")
  }
}
