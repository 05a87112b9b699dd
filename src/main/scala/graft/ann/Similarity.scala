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
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("norm", graft.expr.VectorFunctions.norm(col("v")))

  def cosine(va: Column, vb: Column, na: Column, nb: Column): Column =
    graft.expr.VectorFunctions.dot(va, vb) / (na * nb)

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

  /** Deterministic pseudo-random hyperplane matrix (nPlanes × dim), values
    * in [-1, 1) from a splitmix64-style mix of (seed, plane, dim) — computed
    * ONCE driver-side and embedded as array literals. The per-row bucket work
    * is then pure multiply-adds; the previous formulation evaluated a hash
    * EXPRESSION per (plane × element × row) inside nested higher-order
    * functions, which dominated the whole LSH-dedup query (measured ~4× the
    * verify join at sf0.1).
    */
  private[graft] def planeMatrix(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, d) =>
      var z = seed + p * 0x9E3779B97F4A7C15L + d * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      z.toDouble / Long.MaxValue.toDouble
    }

  /** DuckDB CTE computing EXACTLY [[planeMatrix]]'s weights for every
    * (table, plane, dim) triple — the cross-engine oracle for the LSH paths.
    * Keep in lockstep with [[planeMatrix]]: same splitmix64 constants, same
    * signed-to-double conversion.
    *
    * DuckDB has no wrapping 64-bit multiply (BIGINT overflow errors), so the
    * arithmetic runs in HUGEINT mod 2^64 with a 32-bit-split mulmod; XOR and
    * shifts route through UBIGINT. The final HUGEINT→DOUBLE cast goes via
    * BIGINT because DuckDB's direct HUGEINT→DOUBLE conversion is NOT
    * correctly rounded (measured: 9/3072 values off by one ulp), while
    * BIGINT→DOUBLE matches the JVM's round-to-nearest Long.toDouble.
    * 9.223372036854775808e18 is Long.MaxValue.toDouble (2^63 — MaxValue
    * itself is not representable).
    *
    * Emits `<name> AS (SELECT t, p, plane ...)` with `plane` a dim-length
    * DOUBLE list ordered by dimension, for tables t in [0, tables) seeded
    * `seed + t * 7919` (the table seeding both LSH call sites use).
    */
  def planeWeightsSqlCte(name: String, tables: Int, nPlanes: Int, dim: Int,
                         seed: Long = 42L): String = {
    val M = "18446744073709551616" // 2^64
    val A = "11400714819323198485" // 0x9E3779B97F4A7C15
    val B = "13787848793156543929" // 0xBF58476D1CE4E5B9
    val C = "10723151780598845931" // 0x94D049BB133111EB
    def mulmod(a: String, b: String) =
      s"((($a) % 4294967296) * $b + (((($a) // 4294967296) * ($b % 4294967296)) % 4294967296) * 4294967296) % $M"
    def xorShift(a: String, k: Int) =
      s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($a) // ${1L << k} AS UBIGINT)) AS HUGEINT)"
    s"""$name AS (
       |  SELECT t, p, list(w ORDER BY d) AS plane FROM (
       |    SELECT t, p, d,
       |      (CAST($seed + t*7919 AS HUGEINT) + p*$A + d*$B) % $M AS z0,
       |      ${mulmod(xorShift("z0", 30), B)} AS z1,
       |      ${mulmod(xorShift("z1", 27), C)} AS z2,
       |      ${xorShift("z2", 31)} AS z3,
       |      CAST(CAST(CASE WHEN z3 >= 9223372036854775808 THEN z3 - $M ELSE z3 END AS BIGINT) AS DOUBLE)
       |        / 9.223372036854775808e18 AS w
       |    FROM range(0,$tables) tt(t), range(0,$nPlanes) pp(p), range(0,$dim) dd(d))
       |  GROUP BY t, p)""".stripMargin
  }

  /** LSH sign-bucket id: `nPlanes` sign bits of projections onto the seeded
    * hyperplanes, packed into a long. Vectors in the same bucket are
    * near-duplicate candidates. `dim` fixes the hyperplane matrix at plan
    * time (callers detect it from the first row — vectors are fixed-width).
    */
  def hyperplaneBuckets(vec: Column, nPlanes: Int, dim: Int, seed: Long = 42L): Column = {
    val m = planeMatrix(nPlanes, dim, seed)
    val bits = (0 until nPlanes).map { p =>
      val proj = graft.expr.VectorFunctions.dot(vec, typedlit(m(p).toSeq))
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }

  /** All `tables` bucket ids at once as `array<long>` (table-seeded
    * `seed + t*7919` like every LSH call site) — bit-identical to
    * `array(tables × hyperplaneBuckets)` but ONE plan node instead of a
    * tables·nPlanes·dim-literal forest: whole-stage codegen over the composed
    * form dominated both LSH queries (~3 s/run regenerating the giant stage;
    * see [[graft.expr.HyperplaneBucketsAll]]). Falls back to the composed
    * form when the extension isn't installed.
    */
  def hyperplaneBucketsAll(vec: Column, nPlanes: Int, tables: Int, dim: Int,
                           seed: Long = 42L): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) if graft.expr.VectorFunctions.available(s) =>
        val flat: Seq[Seq[Double]] = (0 until tables).flatMap(t =>
          planeMatrix(nPlanes, dim, seed + t * 7919L).toSeq.map(_.toSeq))
        call_function("graft_hyperplane_buckets", vec, typedlit(flat), lit(nPlanes))
      case _ =>
        array((0 until tables).map(t =>
          hyperplaneBuckets(vec, nPlanes, dim, seed + t * 7919L)): _*)
    }

  /** Fixed vector width of `vecCol`, read from the first row (one tiny job);
    * None on an empty corpus (callers short-circuit to an empty result
    * instead of crashing — the brute-force paths already return empty).
    */
  private[graft] def detectDim(df: DataFrame, vecCol: String): Option[Int] =
    df.select(size(col(vecCol)).as("d")).limit(1).collect()
      .headOption.map(_.getInt(0))

  /** IVF (inverted-file) ANN — the second scale path: a deterministic
    * k-means-lite coarse quantizer (seeded hash-ranked init, fixed
    * iterations), cluster assignment via broadcast centroids, search probes
    * the `nProbe` nearest lists and re-ranks exactly inside them. Centroids
    * are tiny (nLists × dim) → every per-row step is a broadcast lookup; the
    * only shuffles are the per-iteration centroid averages.
    *
    * FULLY deterministic, including across engines: the centroid mean sums
    * `floor(x * 2^32)` longs (order-independent integer addition; the 2^32
    * scaling is a power of two, so `x * 2^32` is exact) instead of a float
    * `avg` whose value depends on shuffle-merge summation order. Everything
    * downstream is fixed-order double arithmetic, which is why
    * `tools/check_oracle.py` can recompute q_ann_ivf EXACTLY (supp_ann_ivf —
    * keep in lockstep: same centroid quantization, same first-minimum
    * tie-break, same HALF_UP 4-dp rounding). Quantizing centroids to 2^-32
    * (~2.3e-10) is far below any assignment boundary that matters; long
    * sums overflow only past ~2^29 train rows per cluster — at that scale
    * `quantizerSampleMod` must bound the train set anyway.
    */
  /** Quantizer train set bound used by the auto sampling mode (~256k rows —
    * plenty for a coarse quantizer of ≤ thousands of lists, small enough to
    * cache on one executor's worth of memory). */
  val IvfAutoTrainTarget: Long = 1L << 18

  /** AUTO quantizer sampling: order-of-magnitude row estimate from planner
    * stats (NO job runs). rowCount is present under CBO / for exact sources;
    * otherwise estimate from sizeInBytes at ~256 B/row (a 64-float embedding
    * row) — being 4x off either way still lands the train set in a safe
    * [64k, 1M] band, and tiny corpora resolve to mod=1 (full-corpus
    * training, identical to the pinned oracle semantics). */
  private[graft] def autoSampleMod(df: DataFrame): Long = {
    val stats = df.queryExecution.optimizedPlan.stats
    // Sources with NO size estimate (RDD-backed frames, some non-file
    // sources) report the defaultSizeInBytes sentinel (Long.MaxValue) — and
    // plan nodes ABOVE such a source report sentinel-DERIVED values (e.g. a
    // Project scales the sentinel by the column-size ratio), so an equality
    // check misses them. Anything beyond 2^60 bytes (an exabyte — no real
    // corpus) is sentinel arithmetic, not a measurement: treat as unknown =
    // train on the full corpus (mod=1, the pinned-oracle semantics);
    // callers with a known-huge statless source must pass an explicit
    // quantizerSampleMod.
    val estRows: Long = stats.rowCount.map(_.toLong).getOrElse {
      if (stats.sizeInBytes >= BigInt(1L << 60)) 1L
      else (stats.sizeInBytes / 256).toLong max 1L
    }
    math.max(1L, estRows / IvfAutoTrainTarget)
  }

  /** @param quantizerSampleMod hash-predicate quantizer sampling: the train
    *        set keeps rows with `xxhash64(id, seed) % mod == 0` — roughly a
    *        1/mod sample with NO count job and NO full-corpus cache (the
    *        round-2 form cached + counted the whole corpus just to size a
    *        fraction — a full-table materialization at 10^12 rows).
    *        Default 0 = AUTO (scale-safe): mod is derived from the planner's
    *        size estimate so the train set is bounded at ~[[IvfAutoTrainTarget]]
    *        rows — no job runs, and a 10^12-row corpus can NEVER be fed to
    *        the per-iteration posexplode shuffle by omission. Pass `1` to
    *        explicitly opt IN to full-corpus training (the q_ann_ivf oracle
    *        path pins it — on the bounded test corpus auto resolves to the
    *        same thing); pass >1 to pin an exact sampling rate.
    *        The train set is always cached during the (eager, driver-side)
    *        centroid training and unpersisted before the search plan is
    *        built, so the search pass streams the corpus uncached.
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              queryIds: Seq[Long], k: Int, nLists: Int = 16, nProbe: Int = 4,
              iters: Int = 3, seed: Long = 42L,
              quantizerSampleMod: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val base  = withNorm(df, idCol, vecCol)

    val effectiveMod: Long =
      if (quantizerSampleMod >= 1L) quantizerSampleMod else autoSampleMod(df)

    // cached for the duration of training only: the init collect + each
    // k-means iteration re-reads it (iters+2 passes); unpersisted below
    // BEFORE the search plan is built, so the search never scans a cache
    val trainSet = (
      if (effectiveMod <= 1L) base
      else base.filter(pmod(xxhash64(col("id"), lit(seed)), lit(effectiveMod)) === 0)
    ).cache()

    def nearestCentroidUdf(cents: Array[(Int, Array[Double])]) = {
      val bc = graft.util.Bc(spark.sparkContext.broadcast(cents))
      udf { v: Seq[Double] =>
        var best = -1; var bestD = Double.MaxValue
        bc.get.foreach { case (cid, c) =>
          var d = 0.0; var i = 0
          while (i < c.length) { val x = v(i) - c(i); d += x * x; i += 1 }
          if (d < bestD) { bestD = d; best = cid }
        }
        best
      }
    }
    // the assignment pass runs over the FULL corpus — native expression when
    // available (no per-row catalyst↔Scala conversion; cid = matrix index,
    // which is exactly the stable array order the UDF scans)
    def nearestCentroid(cents: Array[(Int, Array[Double])])(v: Column): Column =
      if (graft.expr.VectorFunctions.available(spark))
        call_function("graft_nearest_centroid", v,
          typedlit(cents.map(_._2.toSeq).toSeq))
      else nearestCentroidUdf(cents)(v)

    // deterministic init: the nLists sampled vectors with smallest
    // (hash(id, seed), id) — the id tie-break pins the order even under a
    // (practically impossible) hash collision
    var centroids: Array[(Int, Array[Double])] = trainSet
      .withColumn("__h", xxhash64(col("id"), lit(seed)))
      .orderBy(col("__h"), col("id")).limit(nLists)
      .select(col("v")).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](0).toArray) }
    // loud failure beats an empty result: an over-aggressive sample mod (or
    // an empty corpus) must not propagate as zero rows from the search
    require(centroids.nonEmpty,
      s"ivfTopK: quantizer train set is empty (effective sample mod " +
        s"$effectiveMod over an empty/undersized corpus) — pass an explicit " +
        "quantizerSampleMod sized to the source")

    // order-independent mean: Σ floor(x·2^32) over longs, then one fixed
    // ((sum/2^32)/n) double chain — bit-stable under any shuffle order
    val quantScale = 4294967296.0 // 2^32
    (1 to iters).foreach { _ =>
      val assigned = trainSet.withColumn("cluster", nearestCentroid(centroids)(col("v")))
      val next = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cluster", "dim")
        .agg(((sum(floor(col("x") * lit(quantScale))).cast("double") / lit(quantScale))
          / count(lit(1)).cast("double")).as("m"))
        .groupBy("cluster")
        .agg(sort_array(collect_list(struct(col("dim"), col("m")))).as("s"))
        .select(col("cluster"), expr("transform(s, p -> p.m)").as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      // keep empty clusters' previous centroids (stable ids)
      val byId = next.toMap
      centroids = centroids.map { case (cid, old) => (cid, byId.getOrElse(cid, old)) }
    }
    // centroid training is entirely eager (driver-side collects) — the train
    // cache is dead weight from here on; unpersisting BEFORE the search plan
    // is built keeps InMemoryRelation out of the search path entirely
    trainSet.unpersist(false)

    val assigned = base.withColumn("cluster", nearestCentroid(centroids)(col("v")))
    // query → its nProbe nearest centroid lists (distance to centroid, tiny)
    val probes = assigned.filter(col("id").isInCollection(queryIds))
      .select(col("id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))
      .collect()
      .flatMap { r =>
        val qv = r.getSeq[Double](1).toArray
        centroids.map { case (cid, c) =>
          var d = 0.0; var i = 0
          while (i < c.length) { val x = qv(i) - c(i); d += x * x; i += 1 }
          (r.getLong(0), cid, d)
        }.sortBy(_._3).take(nProbe).map(t => (t._1, t._2))
      }
    import spark.implicits._
    val probeDf = probes.toSeq.toDF("qid", "cluster")
    val queries = assigned.filter(col("id").isInCollection(queryIds))
      .select(col("id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))

    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id").asc)
    assigned.join(broadcast(probeDf), Seq("cluster"))
      .join(broadcast(queries), Seq("qid"))
      .filter(col("id") =!= col("qid"))
      .withColumn("cosine", round(cosine(col("qv"), col("v"), col("qnorm"), col("norm")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("cosine"))
  }

  /** Product-quantization ANN (Jégou et al. 2011, "Product Quantization for
    * Nearest Neighbor Search" — the FAISS `IndexPQ` shape): the vector is
    * split into `numSub` contiguous subspaces of `dim/numSub` dims; each
    * subspace gets its own `numCodes`-centroid codebook (the same
    * deterministic k-means-lite as [[ivfTopK]]: hash-ranked init rows shared
    * across subspaces, `iters` iterations, floor(x·2^32) order-independent
    * means, strict first-minimum assignment). The corpus is then ENCODED as
    * `numSub` small ints — at real scale that is the point: a 64-float
    * vector becomes 4 bytes-ish of codes, and the candidate stream ships
    * codes only, never vectors.
    *
    * Search is classic ADC (asymmetric distance computation): per query a
    * (numSub × numCodes) table of exact subspace distances to every
    * centroid is computed driver-side and broadcast; a candidate's
    * approximate distance is the sum of `numSub` table lookups — pure
    * codegen'd arithmetic per row (no lambda, no UDF). Ranked by
    * (rounded adc asc, id asc); `adc` is a squared-L2 estimate, NOT cosine
    * (PQ's native metric), which is why the output column is `adc`.
    *
    * FULLY deterministic across engines, same discipline as [[ivfTopK]]:
    * every float step has a pinned op order (subspace distance = ascending-
    * dim fold; adc = ascending-subspace fold; HALF_UP 4-dp rounding), so
    * the q_ann_pq DuckDB oracle (`HashOracleSql.qAnnPqSql`) and the
    * `supp_ann_pq` Python port recompute the EXACT output. Keep all three
    * in lockstep.
    *
    * Composition note: this is the in-list re-rank half of IVF-PQ; compose
    * with [[ivfTopK]]'s coarse lists (filter to probed clusters first) when
    * a linear codes scan per query is still too much. The codes scan itself
    * is map-only + one per-query top-k.
    *
    * @param quantizerSampleMod same contract as [[ivfTopK]]: 0 = AUTO
    *        planner-stats bound, 1 = full-corpus training (the oracle pin),
    *        >1 = explicit hash-predicate sample rate.
    */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String,
             queryIds: Seq[Long], k: Int, numSub: Int = 4,
             numCodes: Int = 16, iters: Int = 2, seed: Long = 42L,
             quantizerSampleMod: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    detectDim(df, vecCol) match {
      case None =>
        base.select(col("id").as("qid"), lit(1).as("rank"),
          col("id").as("neighbor_id"), lit(0.0).as("adc")).limit(0)
      case Some(dim) =>
        require(dim % numSub == 0,
          s"pqTopK: dim $dim not divisible into $numSub subspaces")
        val ds = dim / numSub
        val trainSet = sampledTrainSet(df, base, seed, quantizerSampleMod).cache()
        val codebooks = trainCodebooks(spark, trainSet, numSub, ds, numCodes,
          iters, seed)
        trainSet.unpersist(false)

        // encode: the candidate stream is (id, codes) — vectors never leave
        // the scan
        val encoded = base
          .withColumn("codes", codesColumn(spark, codebooks, ds))
          .select("id", "codes")
        val qdf = adcTables(spark, base, queryIds, codebooks, ds, numCodes)
        val w = Window.partitionBy(col("qid")).orderBy(col("adc").asc, col("id").asc)
        encoded.join(broadcast(qdf), col("id") =!= col("qid"))
          .withColumn("adc", round(adcLookupSum(numSub, numCodes), 4))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k)
          .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("adc"))
    }
  }

  /** IVF-PQ ANN — the composition of both scale paths, and the shape a real
    * billion-row deployment runs (FAISS `IndexIVFPQ` with
    * `by_residual=false`): the coarse quantizer prunes the corpus to the
    * query's `nProbe` nearest inverted lists (exactly [[ivfTopK]]'s
    * machinery — the coarse k-means IS [[trainCodebooks]] at numSub=1), and
    * the surviving candidates are ranked by PQ ADC over broadcast distance
    * tables (exactly [[pqTopK]]'s machinery) — so the search never touches a
    * vector: the candidate stream is (id, cluster, codes), the probe filter
    * is a broadcast equi-join on cluster, and the ADC is a codegen'd lookup
    * sum. Deterministic across engines like its two halves; the q_ann_ivfpq
    * DuckDB oracle (`HashOracleSql.qAnnIvfPqSql`) and the `supp_ann_ivfpq`
    * python port recompute the exact output. Keep all three in lockstep.
    *
    * Recall < 1 two ways by construction (pruned lists + quantized
    * distances) — PqSpec ties it to its halves instead of to brute force.
    */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String,
                queryIds: Seq[Long], k: Int, nLists: Int = 8, nProbe: Int = 4,
                coarseIters: Int = 2, numSub: Int = 4, numCodes: Int = 16,
                pqIters: Int = 2, seed: Long = 42L,
                quantizerSampleMod: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    detectDim(df, vecCol) match {
      case None =>
        base.select(col("id").as("qid"), lit(1).as("rank"),
          col("id").as("neighbor_id"), lit(0.0).as("adc")).limit(0)
      case Some(dim) =>
        require(dim % numSub == 0,
          s"ivfPqTopK: dim $dim not divisible into $numSub subspaces")
        val ds = dim / numSub
        val trainSet = sampledTrainSet(df, base, seed, quantizerSampleMod).cache()
        // ONE init collect feeds both trainings (see collectInitRows): the
        // coarse quantizer slices the first nLists rows, the PQ codebooks
        // the first numCodes — identical to two separate limit() jobs
        val initShared = collectInitRows(trainSet,
          math.max(nLists, numCodes), seed)
        // coarse centroids = the numSub=1 codebook (full-vector k-means,
        // bit-identical to ivfTopK's training)
        val coarse = trainCodebooks(spark, trainSet, 1, dim, nLists,
          coarseIters, seed, initShared).head
        val codebooks = trainCodebooks(spark, trainSet, numSub, ds, numCodes,
          pqIters, seed, initShared)
        trainSet.unpersist(false)

        val encoded = base
          .withColumn("cluster", nearestExpr(spark, coarse)(col("v")))
          .withColumn("codes", codesColumn(spark, codebooks, ds))
          .select("id", "cluster", "codes")

        // query → nProbe nearest coarse lists, driver-side (same fixed-order
        // arithmetic and stable (dist, cid) order as ivfTopK's probes); the
        // collected query vectors are REUSED by the ADC tables below (one
        // collect job instead of two identical ones — round-7)
        val qRows: Array[(Long, Array[Double])] =
          base.filter(col("id").isInCollection(queryIds))
            .select(col("id"), col("v")).collect()
            .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        val probes = qRows.toSeq.flatMap { case (qid, qv) =>
          coarse.zipWithIndex.map { case (c, cid) =>
            var d = 0.0; var i = 0
            while (i < c.length) { val x = qv(i) - c(i); d += x * x; i += 1 }
            (qid, cid, d)
          }.sortBy(_._3).take(nProbe).map(t => (t._1, t._2))
        }
        import spark.implicits._
        val probeDf = probes.toDF("qid", "cluster")
        val qdf = adcTables(spark, base, queryIds, codebooks, ds, numCodes,
          qRowsPre = qRows)
        val w = Window.partitionBy(col("qid")).orderBy(col("adc").asc, col("id").asc)
        encoded.join(broadcast(probeDf), Seq("cluster"))
          .join(broadcast(qdf), Seq("qid"))
          .filter(col("id") =!= col("qid"))
          .withColumn("adc", round(adcLookupSum(numSub, numCodes), 4))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k)
          .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("adc"))
    }
  }

  /** Hash-predicate quantizer train set (the [[ivfTopK]] contract: mod 0 =
    * AUTO planner-stats bound, 1 = full corpus, >1 = explicit rate).
    * Caller caches/unpersists. */
  private def sampledTrainSet(df: DataFrame, base: DataFrame, seed: Long,
                              quantizerSampleMod: Long): DataFrame = {
    val effectiveMod: Long =
      if (quantizerSampleMod >= 1L) quantizerSampleMod else autoSampleMod(df)
    if (effectiveMod <= 1L) base
    else base.filter(pmod(xxhash64(col("id"), lit(seed)), lit(effectiveMod)) === 0)
  }

  /** Strict first-minimum nearest-centroid index — the fused
    * `graft_nearest_centroid` expression, or the bit-identical Bc-cached UDF
    * without the extension. */
  private[graft] def nearestExpr(spark: org.apache.spark.sql.SparkSession,
                                 cents: Array[Array[Double]])(sv: Column): Column =
    if (graft.expr.VectorFunctions.available(spark))
      call_function("graft_nearest_centroid", sv,
        typedlit(cents.map(_.toSeq).toSeq))
    else {
      val bc = graft.util.Bc(spark.sparkContext.broadcast(cents))
      val u = udf { v: Seq[Double] =>
        var best = -1; var bestD = Double.MaxValue
        var c = 0
        val m = bc.get
        while (c < m.length) {
          val row = m(c)
          var d = 0.0; var i = 0
          while (i < row.length) { val x = v(i) - row(i); d += x * x; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }
      u(sv)
    }

  /** Deterministic per-subspace k-means over `trainSet` (columns id, v):
    * init rows shared across subspaces — the `numCodes` sampled vectors with
    * smallest (hash(id, seed), id), row j seeding code j of EVERY subspace
    * codebook — then `iters` iterations where ONE pass assigns every
    * subspace (explode over mm) and means are the floor(x·2^32) long sums
    * (order-independent). numSub=1, ds=dim gives exactly [[ivfTopK]]'s
    * full-vector coarse k-means. Returns codebooks(mm)(j) = centroid j of
    * subspace mm. */
  /** The deterministic init-row prefix: the `n` train vectors with smallest
    * (hash(id, seed), id). A total order with unique ids, so the first
    * `nLists` of a `max(nLists, numCodes)`-row collect equal a direct
    * `limit(nLists)` — [[ivfPqTopK]] collects ONCE and both trainings slice
    * their prefix (round-7: one job instead of two identical sort-limit
    * jobs over the train set).
    */
  private[graft] def collectInitRows(trainSet: DataFrame, n: Int,
                                     seed: Long): Array[Array[Double]] =
    trainSet
      .withColumn("__h", xxhash64(col("id"), lit(seed)))
      .orderBy(col("__h"), col("id")).limit(n)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)

  private[graft] def trainCodebooks(spark: org.apache.spark.sql.SparkSession,
                                    trainSet: DataFrame, numSub: Int, ds: Int,
                                    numCodes: Int, iters: Int,
                                    seed: Long,
                                    initRowsPre: Array[Array[Double]] = null): Array[Array[Array[Double]]] = {
    val quantScale = 4294967296.0 // 2^32
    def sub(mm: Int): Column = slice(col("v"), mm * ds + 1, ds)
    val initRows: Array[Array[Double]] =
      if (initRowsPre != null) initRowsPre.take(numCodes)
      else collectInitRows(trainSet, numCodes, seed)
    require(initRows.nonEmpty,
      "trainCodebooks: quantizer train set is empty (over-aggressive " +
        "quantizerSampleMod over an empty/undersized corpus) — pass an " +
        "explicit quantizerSampleMod sized to the source")
    var codebooks: Array[Array[Array[Double]]] =
      Array.tabulate(numSub)(mm =>
        initRows.map(v => java.util.Arrays.copyOfRange(v, mm * ds, (mm + 1) * ds)))
    (1 to iters).foreach { _ =>
      val perM = (0 until numSub).map { mm =>
        struct(lit(mm).as("m"),
          nearestExpr(spark, codebooks(mm))(sub(mm)).as("code"),
          sub(mm).as("sv"))
      }
      val next = trainSet.select(explode(array(perM: _*)).as("e"))
        .select(col("e.m").as("m"), col("e.code").as("code"),
          posexplode(col("e.sv")).as(Seq("dim", "x")))
        .groupBy("m", "code", "dim")
        .agg(((sum(floor(col("x") * lit(quantScale))).cast("double") / lit(quantScale))
          / count(lit(1)).cast("double")).as("mean"))
        .groupBy("m", "code")
        .agg(sort_array(collect_list(struct(col("dim"), col("mean")))).as("s"))
        .select(col("m"), col("code"), expr("transform(s, p -> p.mean)").as("c"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toArray))
        .toMap
      codebooks = Array.tabulate(numSub)(mm =>
        codebooks(mm).zipWithIndex.map { case (old, j) =>
          next.getOrElse((mm, j), old)
        })
    }
    codebooks
  }

  /** The PQ encode column: array of per-subspace nearest-codebook indices. */
  private def codesColumn(spark: org.apache.spark.sql.SparkSession,
                          codebooks: Array[Array[Array[Double]]],
                          ds: Int): Column =
    array(codebooks.indices.map(mm =>
      nearestExpr(spark, codebooks(mm))(slice(col("v"), mm * ds + 1, ds))): _*)

  /** Per-query flattened ADC tables (qid, dt) — numSub × numCodes exact
    * subspace distances computed driver-side in ascending-dim fold order;
    * lookup is element_at(dt, m*numCodes + code + 1). Queries are an
    * explicit tiny list by contract. */
  private def adcTables(spark: org.apache.spark.sql.SparkSession,
                        base: DataFrame, queryIds: Seq[Long],
                        codebooks: Array[Array[Array[Double]]],
                        ds: Int, numCodes: Int,
                        qRowsPre: Array[(Long, Array[Double])] = null): DataFrame = {
    val numSub = codebooks.length
    // ivfPqTopK already collected the query vectors for its probe
    // computation — reuse them instead of a second identical collect job
    // (round-7); pqTopK still collects its own (its only query-side job)
    val qRows: Array[(Long, Array[Double])] =
      if (qRowsPre != null) qRowsPre
      else base.filter(col("id").isInCollection(queryIds))
        .select(col("id"), col("v")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val dts: Seq[(Long, Seq[Double])] = qRows.toSeq.map { case (qid, qv) =>
      val dt = new Array[Double](numSub * numCodes)
      var mm = 0
      while (mm < numSub) {
        var j = 0
        while (j < codebooks(mm).length) {
          val c = codebooks(mm)(j)
          var d = 0.0; var i = 0
          while (i < ds) { val x = qv(mm * ds + i) - c(i); d += x * x; i += 1 }
          dt(mm * numCodes + j) = d
          j += 1
        }
        mm += 1
      }
      (qid, dt.toSeq)
    }
    import spark.implicits._
    dts.toDF("qid", "dt")
  }

  /** adc = ascending-subspace left fold of table lookups — a composed `+`
    * chain, NO higher-order function (ArrayAggregate lambdas are
    * CodegenFallback; this stays inside whole-stage codegen). */
  private def adcLookupSum(numSub: Int, numCodes: Int): Column =
    (0 until numSub).map(mm =>
      element_at(col("dt"),
        lit(mm * numCodes) + element_at(col("codes"), lit(mm + 1)) + lit(1)))
      .reduce(_ + _)

  /** ANN top-k via LSH buckets: candidates share at least one of the
    * `tables` bucket signatures (multi-probe by table, classic OR-construction
    * over AND-buckets); exact cosine re-rank within candidates.
    * Recall < 1 by construction — tested against [[bruteForceTopK]].
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              queryIds: Seq[Long], k: Int, nPlanes: Int = 12,
              tables: Int = 6, seed: Long = 42L): DataFrame = {
    val base = withNorm(df, idCol, vecCol)
    detectDim(df, vecCol) match {
      case None =>
        // empty corpus → empty result with the contract schema
        base.select(col("id").as("qid"), lit(1).as("rank"),
          col("id").as("neighbor_id"), lit(0.0).as("cosine")).limit(0)
      case Some(dim) =>
        // bucket rows are NARROW (id, table, bucket) — the candidate explode
        // and (qid, id) dedup shuffle no vectors; v/norm join back by id only
        // for the |candidates| rows that survive (the same narrowing
        // Dedup.embeddingLshPairs measured at 2× on the whole query)
        val bucketed = base.select(col("id"),
          posexplode(hyperplaneBucketsAll(col("v"), nPlanes, tables, dim, seed))
            .as(Seq("table", "bucket")))
        val q2 = bucketed.filter(col("id").isInCollection(queryIds))
          .select(col("id").as("qid"), col("table"), col("bucket"))
        val cand = bucketed.join(broadcast(q2), Seq("table", "bucket"))
          .filter(col("id") =!= col("qid"))
          .select("qid", "id")
          .dropDuplicates("qid", "id")
        val qv = base.filter(col("id").isInCollection(queryIds))
          .select(col("id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))
        val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id").asc)
        cand
          .join(base, Seq("id"))
          .join(broadcast(qv), Seq("qid"))
          .withColumn("cosine", round(cosine(col("qv"), col("v"), col("qnorm"), col("norm")), 4))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k)
          .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("cosine"))
    }
  }
}
