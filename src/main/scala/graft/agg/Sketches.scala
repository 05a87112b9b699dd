package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch operators for corpus-scale statistics. Unlike Spark's builtin
  * `approx_count_distinct` (HyperLogLog++, whose register layout no other
  * engine reproduces bit-for-bit), these sketches are DETERMINISTIC
  * functions of the data, so the driver's DuckDB gate checks them exactly —
  * the same design rule as the LSH/minhash stack: approximate in accuracy,
  * exact in definition.
  */
object Sketches {

  /** KMV (k-minimum-values) distinct-count sketch over `c`:
    * hash every value with xxhash64 (seed 42), keep the k smallest DISTINCT
    * hashes in UNSIGNED order; with h_k the k-th smallest as a fraction of
    * the hash space, E[distinct] ≈ (k-1) / (h_k / 2^64) — the classic
    * bottom-k estimator (Bar-Yossef et al.), standard error ~ 1/sqrt(k-2).
    *
    * Scale shape: one narrow shuffle — `distinct` on the 8-byte hash (never
    * the value itself) with map-side partial aggregation — then a
    * TakeOrdered(k) (per-partition top-k + driver merge, NO global sort;
    * PlanSpec asserts the plan). Fewer than k distinct values → the sketch
    * IS the exact count and reports it.
    *
    * Output (one row): `n_kept` (min(k, distinct)), `kth_hash` (the k-th
    * smallest hash, signed bits — the sketch's mergeable state), `est`
    * (rounded to 2 dp). Cross-engine exact: the q_kmv_distinct oracle
    * recomputes XXH64 and the same double arithmetic in DuckDB SQL
    * ([[graft.oracle.HashOracleSql.qKmvDistinctSql]] — lockstep twin).
    */
  def kmvDistinct(df: DataFrame, c: String, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val hashes = df.filter(col(c).isNotNull)
      .select(xxhash64(col(c)).as("h")).distinct()
    // unsigned order via the sign-flip trick: unsigned(h) = signed(h ^ MinValue)
    val topk = hashes
      .orderBy(col("h").bitwiseXOR(lit(Long.MinValue)).asc)
      .limit(k)
    topk.agg(
        count(lit(1)).as("n_kept"),
        // max in unsigned order = the k-th smallest = last kept
        expr(s"max(h ^ ${Long.MinValue}L)").bitwiseXOR(lit(Long.MinValue)).as("kth_hash"))
      .select(col("n_kept"), col("kth_hash"),
        estExpr(col("n_kept"), col("kth_hash"), k).as("est"))
  }

  private val Two64 = 1.8446744073709552e19 // 2^64, exactly representable

  /** THE estimate chain — one copy shared by the corpus-global and grouped
    * sketches (it is oracle-critical: the DuckDB twins recompute this exact
    * double arithmetic — [[graft.oracle.HashOracleSql.qKmvDistinctSql]] /
    * `qKmvGroupedSql`): exact count below k, else (k-1)·2^64 / unsigned(kth),
    * rounded 2 dp.
    */
  private def estExpr(nKept: Column, kth: Column, k: Int): Column =
    round(
      when(nKept < k, nKept.cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(Two64) /
          (kth.cast("double") +
            when(kth < 0, lit(Two64)).otherwise(lit(0.0)))),
      2)

  /** Bottom-k distinct-hash aggregate COLUMN (the KMV sketch state): fused
    * [[graft.expr.KmvBottomK]] when the extension is installed — bounded
    * k-value buffer per group, map-side partial aggregation — with the
    * semantics-identical composed fallback otherwise. The fallback's
    * `collect_set` buffers EVERY distinct hash of a group (fine locally,
    * unbounded at scale) — production sessions install
    * `graft.expr.GraftExtensions` and get the bounded buffer.
    * Both forms emit the k smallest distinct hashes in unsigned ascending
    * order as `array<long>`.
    */
  def bottomKHashes(h: Column, k: Int, session: org.apache.spark.sql.SparkSession): Column = {
    val fused = graft.expr.VectorFunctions.available(session)
    if (fused) call_function("graft_kmv", h, lit(k))
    else transform(
      slice(sort_array(collect_set(h.bitwiseXOR(lit(Long.MinValue)))), 1, k),
      x => x.bitwiseXOR(lit(Long.MinValue)))
  }

  /** Active-session overload. In a multi-session JVM prefer the explicit
    * overload with the DataFrame's OWN session (as [[kmvSketchBy]] /
    * [[kmvMergeSketches]] do): the active session's function registry can
    * disagree with the session that will analyze the plan, yielding either
    * an AnalysisException (graft_kmv unresolvable) or a silent fall-back to
    * the unbounded `collect_set` buffer.
    */
  def bottomKHashes(h: Column, k: Int): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) => bottomKHashes(h, k, s)
      case None => transform(
        slice(sort_array(collect_set(h.bitwiseXOR(lit(Long.MinValue)))), 1, k),
        x => x.bitwiseXOR(lit(Long.MinValue)))
    }

  /** Estimate columns from a sketch array (`n_kept`, `kth_hash`, `est` —
    * the same arithmetic as [[kmvDistinct]], and the same DuckDB-exact
    * double chain). Callers guarantee the sketch is non-empty (every group
    * has at least one non-null hashed row by construction).
    */
  private def estimateCols(sketch: Column, k: Int): Seq[Column] = {
    val nKept = size(sketch).cast("long")
    val kth   = element_at(sketch, size(sketch))
    Seq(nKept.as("n_kept"), kth.as("kth_hash"),
      estExpr(nKept, kth, k).as("est"))
  }

  /** Per-group KMV sketch STATE: one row per group with `kmv_sketch`
    * (`array<long>`, the k smallest distinct hashes of `c` in unsigned
    * order — the mergeable representation). Persist this per shard/day and
    * combine later with [[kmvMergeSketches]]; the merge law
    * `sketch(A ∪ B) = merge(sketch(A), sketch(B))` is exact
    * (KmvGroupedSpec pins it).
    *
    * Scale shape: ONE hash-partial aggregation on the group keys — with the
    * fused aggregate each map task carries at most k longs per group, so the
    * shuffle is k·groups longs regardless of corpus size.
    */
  def kmvSketchBy(df: DataFrame, groupCols: Seq[String], c: String, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    require(groupCols.nonEmpty, "use kmvDistinct for the corpus-global sketch")
    df.filter(col(c).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(bottomKHashes(xxhash64(col(c)), k, df.sparkSession).as("kmv_sketch"))
  }

  /** Combine partial per-group sketches (e.g. one per day/shard): union the
    * hash sets, keep the k smallest — exactly the aggregate's own merge, so
    * re-sketching merged state equals sketching the union.
    */
  def kmvMergeSketches(df: DataFrame, groupCols: Seq[String],
                       sketchCol: String, k: Int): DataFrame =
    df.select(groupCols.map(col) :+ explode(col(sketchCol)).as("__h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(bottomKHashes(col("__h"), k, df.sparkSession).as("kmv_sketch"))

  /** Per-group distinct-count estimate — the 100 TB use case (distinct users
    * per template, distinct templates per tool): one row per group with
    * `n_kept`, `kth_hash`, `est`, same estimator and cross-engine-exact
    * arithmetic as the corpus-global [[kmvDistinct]] (oracle:
    * [[graft.oracle.HashOracleSql.qKmvGroupedSql]]).
    */
  def kmvDistinctBy(df: DataFrame, groupCols: Seq[String], c: String, k: Int): DataFrame =
    kmvSketchBy(df, groupCols, c, k)
      .select(groupCols.map(col) ++ estimateCols(col("kmv_sketch"), k): _*)
}
