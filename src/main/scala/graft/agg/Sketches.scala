package graft.agg

import org.apache.spark.sql.DataFrame
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
    val two64 = 1.8446744073709552e19 // 2^64, exactly representable
    topk.agg(
        count(lit(1)).as("n_kept"),
        // max in unsigned order = the k-th smallest = last kept
        expr(s"max(h ^ ${Long.MinValue}L)").bitwiseXOR(lit(Long.MinValue)).as("kth_hash"))
      .select(col("n_kept"), col("kth_hash"),
        round(
          when(col("n_kept") < k, col("n_kept").cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(two64) /
              (col("kth_hash").cast("double") +
                when(col("kth_hash") < 0, lit(two64)).otherwise(lit(0.0)))),
          2).as("est"))
  }
}
