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

  /** GPT-style concat-and-chunk: conceptually concatenate all documents into
    * one token stream in id order and cut it into fixed-`chunkLen` training
    * windows that CROSS document boundaries (the standard causal-LM data
    * layout — packBudget is the never-split alternative). Emits one row per
    * (document, chunk) incidence:
    *
    *   chunk_id     — 0-based window index in the global token stream
    *   doc_offset   — first token of the doc that lands in this chunk
    *   chunk_offset — position of that token within the chunk
    *   len          — number of tokens contributed (> 0)
    *
    * so downstream assembly is a per-chunk sort by chunk_offset + slice —
    * no global state. Docs with zero tokens drop out. Order is pinned to
    * idCol ascending; compose with [[graft.agg.Preprocessing.seededShuffle]]
    * ranks as the id to get a deterministic shuffled stream.
    *
    * Scale shape: the global token offsets come from
    * [[graft.util.Rank.globalRunningSum]] — a distributed range sort plus
    * one collected Long per partition — never a single-task
    * `sum().over(Window.orderBy(...))`. The explode emits ceil(n/L)+1 rows
    * per doc (bounded by doc length), and every offset column is exact
    * BIGINT arithmetic (`div`, not double division — safe past 2^53 total
    * tokens).
    */
  /** RAG-style PER-DOCUMENT sliding token chunks — the retrieval/embedding
    * prep that [[concatChunks]] (cross-doc epoch packing) and event-sequence
    * fixLength are not: each document's nonempty whitespace tokens (the
    * pinned q_concat_chunks counting rule) split into windows of
    * `chunkSize` tokens starting every `stride` tokens (overlap =
    * chunkSize - stride), last window short, zero-token docs emit nothing.
    * chunk_idx is 0-based; starts are every k·stride < n, so every token
    * lands in ≥1 chunk and the layout is a pure per-row function.
    *
    * Scale shape: map-only with a bounded per-row explode
    * (ceil(n/stride) rows) — no shuffle; chunking 100 TB is exactly one
    * scan.
    */
  def slidingTextChunks(df: DataFrame, idCol: String, textCol: String,
                        chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, "chunkSize must be positive")
    require(stride >= 1, "stride must be positive")
    val toks = filter(split(trim(col(textCol)), "\\s+"), w => w =!= lit(""))
    df.withColumn("__t", toks)
      .withColumn("__n", size(col("__t")))
      .filter(col("__n") > 0)
      .withColumn("chunk_idx",
        explode(sequence(lit(0),
          ((col("__n") - 1) / lit(stride)).cast("int"))))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("__t"),
          col("chunk_idx") * stride + 1, lit(chunkSize)), " ").as("chunk"),
        least(col("__n") - col("chunk_idx") * stride, lit(chunkSize))
          .cast("long").as("chunk_tokens"))
  }

  def concatChunks(df: DataFrame, idCol: String, tokensCol: String,
                   chunkLen: Long): DataFrame = {
    require(chunkLen > 0, "chunkLen must be positive")
    val slim = df.select(col(idCol).cast("long").as("__id"),
        col(tokensCol).cast("long").as("__n"))
      .filter(col("__n") > 0)
    val (withOff, _) =
      graft.util.Rank.globalRunningSum(slim, Seq(col("__id")), "__n", "__t0")
    val startInDoc = greatest(col("chunk_id") * chunkLen - col("__t0"), lit(0L))
    withOff
      .withColumn("chunk_id", explode(sequence(
        expr(s"__t0 div $chunkLen"), expr(s"(__t0 + __n - 1) div $chunkLen"))))
      .select(
        col("chunk_id"),
        col("__id").as(idCol),
        startInDoc.as("doc_offset"),
        greatest(col("__t0") - col("chunk_id") * chunkLen, lit(0L)).as("chunk_offset"),
        (least(col("__n"), (col("chunk_id") + 1) * chunkLen - col("__t0"))
          - startInDoc).as("len"))
  }
}
