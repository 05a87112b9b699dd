package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines:
  * exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine.
  *
  * Scale design notes (100 TB target):
  *  - exact dedup is one hash aggregate on a fixed-width digest (never on the
  *    raw text — group keys stay small);
  *  - Jaccard / MinHash work on shingle sets; the LSH band-bucket join
  *    replaces the O(n²) pair space with an equi-join on (band, bucket), the
  *    classic shuffle-friendly formulation;
  *  - all hash functions are deterministic Spark-native (xxhash64 / md5) —
  *    codegen'd, no UDF in the wide paths.
  */
object Dedup {

  /** Exact dedup: group by content digest, keep min(id) representative.
    * Output: one row per distinct text with its multiplicity.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_copies"))

  /** Word n-gram shingles of `textCol`, distinct per row.
    *
    * The token array is LET-BOUND via `transform(array(split(...)), toks ->
    * ...)` so it is computed once per row — naively referencing the `split`
    * subtree inside the per-position lambda re-evaluates it for every
    * shingle position (measured: 7.3 s → 0.5 s on 5k docs).
    */
  def shingles(textCol: Column, n: Int): Column =
    element_at(
      transform(array(split(textCol, "\\s+")), toks =>
        array_distinct(
          filter(
            transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
              i => when(i + n <= size(toks), array_join(slice(toks, i + 1, lit(n)), " "))),
            x => x.isNotNull))),
      1)

  /** Exact n-gram Jaccard near-dup pairs: explode shingles, equi-join on
    * shingle, |A∩B| via count, |A∪B| = |A|+|B|-|A∩B|; keep pairs ≥ `tau`
    * with id_a < id_b. Exact but O(pairs sharing a shingle) — the baseline
    * the LSH path approximates.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, tau: Double): DataFrame = {
    val sh = df.select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("sh"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        round(col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")), 4))
      .filter(col("jaccard") >= tau)
      .select("id_a", "id_b", "common", "jaccard")
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * min of xxhash64(seed_i, shingle) over the row's shingle set. Pure
    * column expressions — the per-hash min folds inside codegen.
    */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingleArr, s => xxhash64(lit(i), s)))
    }: _*)

  /** MinHash+LSH candidate pairs: signatures banded into `bands`; rows
    * sharing any (band, band-hash) bucket become candidates; candidates are
    * verified with exact shingle Jaccard. `numHashes` must divide into
    * `bands` evenly.
    *
    * `maxBucketSize` caps the per-bucket candidate fan-out: on low-diversity
    * corpora many documents share a band signature and the bucket self-join
    * goes quadratic (measured: 26 s for 5k docs at rows-per-band=3). A
    * saturated bucket carries no discriminative information — skipping it is
    * the standard production guard; true near-dups still collide in their
    * other (selective) bands.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int, numHashes: Int, bands: Int, tau: Double,
                      maxBucketSize: Int = 500): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val withSig = df
      .select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

    val buckets = withSig.select(
        col("id"), col("sh"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bucket"))
        }: _*)).as("bb"))
      .select(col("id"), col("sh"), col("bb.band"), col("bb.bucket"))

    val keep = buckets.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("__bsz"))
      .filter(col("__bsz") > 1 && col("__bsz") <= maxBucketSize)
      .select("band", "bucket")

    val pruned = buckets.join(keep, Seq("band", "bucket"))

    val cand = pruned.as("a")
      .join(pruned.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")

    cand
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", round(col("common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")), 4))
      .filter(col("jaccard") >= tau)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over whitespace tokens: per-token xxhash64; each bit
    * contributes ±1; sign of the sum per bit position → fingerprint bit.
    * Pure, deterministic; narrow UDF (64-way bit loop is not worth an
    * explode blowup of 64× the token count).
    */
  val simhash64: Column => Column = {
    val f = udf { text: String =>
      if (text == null) 0L
      else {
        val counts = new Array[Int](64)
        text.trim.split("\\s+").foreach { tok =>
          val h = (scala.util.hashing.MurmurHash3.stringHash(tok).toLong << 32) |
            (scala.util.hashing.MurmurHash3.stringHash(tok.reverse).toLong & 0xffffffffL)
          var j = 0
          while (j < 64) { if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1; j += 1 }
        }
        var out = 0L
        var j = 0
        while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
        out
      }
    }
    c => f(c)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Embedding-cosine near-dup pairs, brute force (baseline): all pairs with
    * rounded cosine ≥ `tau`. The scale path buckets by LSH sign bits first
    * (see [[graft.ann.Similarity.hyperplaneBuckets]]).
    */
  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String,
                           tau: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val withNorm = v.withColumn("norm",
      sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))
    withNorm.as("a").join(withNorm.as("b"), col("a.id") < col("b.id"))
      .withColumn("dot",
        aggregate(zip_with(col("a.v"), col("b.v"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
      .withColumn("cosine", round(col("dot") / (col("a.norm") * col("b.norm")), 4))
      .filter(col("cosine") >= tau)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }
}
