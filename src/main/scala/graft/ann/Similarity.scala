package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: exact brute-force cosine top-k (correctness oracle).
  * Scale path: LSH sign-bucket candidate generation — deterministic
  * pseudo-random hyperplanes derived from a seed (no RNG at plan time),
  * bucket equi-join instead of the full cross product.
  */
object Similarity {

  /** Cast float vector to double + attach L2 norm. */
  private def withNorm(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("norm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))

  def cosine(va: Column, vb: Column, na: Column, nb: Column): Column =
    aggregate(zip_with(va, vb, (x, y) => x * y), lit(0.0), (a, x) => a + x) / (na * nb)

  /** Exact brute-force cosine top-k: for each query vector (ids in
    * `queryIds`), the k nearest corpus vectors (self excluded), ranked by
    * (rounded cosine desc, id asc) — rounding pins the float tie-break.
    */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     queryIds: Seq[Long], k: Int): DataFrame = {
    val base    = withNorm(df, idCol, vecCol)
    val queries = base.filter(col("id").isInCollection(queryIds))
      .select(col("id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))
    val scored = base.join(broadcast(queries), col("id") =!= col("qid"))
      .withColumn("cosine", round(cosine(col("qv"), col("v"), col("qnorm"), col("norm")), 4))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component: plane `p`, dim `d` →
    * a value in [-1, 1) derived from xxhash64 — stable across sessions,
    * codegen'd, no driver-side RNG state to ship.
    */
  private def planeComponent(p: Int, d: Column, seed: Long): Column =
    (xxhash64(lit(seed), lit(p), d).cast("double") / lit(Long.MaxValue.toDouble))

  /** LSH sign-bucket id: `nPlanes` sign bits of projections onto the seeded
    * hyperplanes, packed into a long. Vectors in the same bucket are
    * near-duplicate candidates.
    */
  def hyperplaneBuckets(vec: Column, nPlanes: Int, seed: Long = 42L): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i, seed)),
        lit(0.0), (a, x) => a + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }

  /** ANN top-k via LSH buckets: candidates share at least one of the
    * `tables` bucket signatures (multi-probe by table, classic OR-construction
    * over AND-buckets); exact cosine re-rank within candidates.
    * Recall < 1 by construction — tested against [[bruteForceTopK]].
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              queryIds: Seq[Long], k: Int, nPlanes: Int = 12,
              tables: Int = 6, seed: Long = 42L): DataFrame = {
    val base = withNorm(df, idCol, vecCol)
      .withColumn("buckets", array((0 until tables).map(t =>
        hyperplaneBuckets(col("v"), nPlanes, seed + t * 7919L)): _*))
    val exploded = base.select(col("id"), col("v"), col("norm"),
      posexplode(col("buckets")).as(Seq("table", "bucket")))
    val q2 = exploded.filter(col("id").isInCollection(queryIds))
      .select(col("id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"),
        col("table"), col("bucket"))
    val cand = exploded.join(q2, Seq("table", "bucket"))
      .filter(col("id") =!= col("qid"))
      .select("qid", "qv", "qnorm", "id", "v", "norm")
      .dropDuplicates("qid", "id")
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id").asc)
    cand
      .withColumn("cosine", round(cosine(col("qv"), col("v"), col("qnorm"), col("norm")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("cosine"))
  }
}
