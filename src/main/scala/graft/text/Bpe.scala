package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair encoding against a PINNED merges table — real subword
  * tokenization (the public GPT-2 algorithm: Sennrich et al. 2016 /
  * Radford et al. 2019), replacing the regex proxy
  * [[TextAnalysis.bpeishTokenCount]] where budgets must be token-exact
  * (e.g. [[graft.agg.Packing.packBudget]]).
  *
  * The merges fixture is deterministic and self-contained (no external
  * vocab download), and is constrained to make the encode CROSS-ENGINE
  * exact (q_bpe_tokens replays it in DuckDB SQL):
  *
  *  1. CREATION-ORDERED — each side of merge i is a single character or
  *     the result of a merge j < i (true of every real BPE table, since a
  *     merged token must exist before it can pair). Under this property,
  *     applying merges fully IN RANK ORDER is equivalent to the canonical
  *     loop (merge the lowest-rank adjacent pair present, repeat): a merge
  *     can only create adjacencies involving its own output token, and any
  *     merge consuming that token has a higher rank. BpeSpec cross-checks
  *     the two algorithms on the corpus vocabulary and random words.
  *  2. LEFT != RIGHT — occurrences of an (l, r) adjacency with l != r are
  *     pairwise disjoint and merging cannot create new ones, so "merge all
  *     occurrences" is order-independent. This is what lets the DuckDB
  *     oracle use iterated `replace()` passes over a space-separated token
  *     string (a single pass can MISS an occurrence whose leading
  *     separator was consumed by the previous match — the fixpoint loop
  *     converges to the same final tokens). With l == r the greedy pairing
  *     of an odd run would diverge between the two scan disciplines, so
  *     such merges are rejected at init.
  *
  * Scale shape ([[bpeTokenize]]): the imperative kernel runs ONCE PER
  * DISTINCT WORD (a hash-distinct, then the UDF over the vocabulary — the
  * classic dictionary-encode trick; UDF invocations scale with vocabulary,
  * not corpus), then one equi-join on the word key (unique build side, no
  * fan-out; AQE broadcasts a small vocabulary) and a per-doc ordered
  * reassembly.
  */
object Bpe {

  /** Pinned merges, rank = index. Lowercase-ASCII oriented (the corpus
    * alphabet); characters without merges stay single-char tokens.
    */
  val merges: Vector[(String, String)] = Vector(
    ("t", "h"),   //  0 th
    ("th", "e"),  //  1 the
    ("e", "r"),   //  2 er
    ("o", "r"),   //  3 or
    ("a", "n"),   //  4 an
    ("i", "n"),   //  5 in
    ("s", "t"),   //  6 st
    ("a", "r"),   //  7 ar
    ("l", "o"),   //  8 lo
    ("r", "o"),   //  9 ro
    ("u", "e"),   // 10 ue
    ("b", "a"),   // 11 ba
    ("s", "c"),   // 12 sc
    ("m", "er"),  // 13 mer
    ("d", "a"),   // 14 da
    ("t", "a"),   // 15 ta
    ("w", "in"),  // 16 win
    ("j", "o"),   // 17 jo
    ("q", "ue"),  // 18 que
    ("sc", "an"), // 19 scan
    ("or", "d"),  // 20 ord
    ("f", "a"),   // 21 fa
    ("g", "ro"),  // 22 gro
    ("ba", "t"),  // 23 bat
    ("c", "o"),   // 24 co
    ("u", "m"),   // 25 um
    ("l", "um"),  // 26 lum
    ("v", "a"),   // 27 va
    ("s", "m"),   // 28 sm
    ("h", "a")    // 29 ha
  )

  // fixture validity: the two properties the cross-engine proof needs
  merges.zipWithIndex.foreach { case ((l, r), i) =>
    require(l != r, s"merge $i: left == right ('$l') breaks replace-pass equivalence")
    def formed(t: String): Boolean =
      t.length == 1 || merges.take(i).exists { case (a, b) => a + b == t }
    require(formed(l) && formed(r),
      s"merge $i ('$l','$r'): side not a char or an earlier merge result (creation order)")
  }

  /** Encode one word: char tokens, then each merge applied fully in rank
    * order. One left-to-right pass per merge suffices in token space — with
    * l != r, occurrences are disjoint and merging creates none.
    */
  def encodeWord(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    var toks: Array[String] = word.map(_.toString).toArray
    merges.foreach { case (l, r) =>
      if (toks.length > 1) {
        val out = Array.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
            out += l + r; i += 2
          } else { out += toks(i); i += 1 }
        }
        toks = out.result()
      }
    }
    toks
  }

  /** Document-level BPE: (id, n_bpe_tokens, bpe_text) where `bpe_text` is
    * every word's subword tokens joined by single spaces in document order.
    * Empty words (degenerate empty documents) are dropped on both engines.
    */
  def bpeTokenize(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val encodeUdf = udf { w: String => encodeWord(w) }
    val words = df.select(col(idCol).as("id"),
        posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
    val dict = words.select("word").distinct()
      .select(col("word"),
        array_join(encodeUdf(col("word")), " ").as("toks_str"))
      .withColumn("n_toks", size(split(col("toks_str"), " ")).cast("long"))
    words.join(dict, Seq("word"))
      .groupBy(col("id").as(idCol))
      .agg(
        sum(col("n_toks")).as("n_bpe_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("toks_str")))),
            s => s.getField("toks_str")),
          " ").as("bpe_text"))
  }

  /** The merges table as a SQL VALUES body — the DuckDB twin of [[merges]]
    * (lockstep: change either and q_bpe_tokens breaks).
    */
  def mergesSqlValues: String =
    merges.zipWithIndex
      .map { case ((l, r), i) => s"($i, '$l', '$r')" }
      .mkString(", ")

  /** One left-to-right merge pass over a token array (the [[encodeWord]]
    * inner loop): every (l, r) adjacency becomes l+r. With l != r the
    * occurrences are disjoint, so one pass merges them all and — because
    * the merged token lr can never equal l — a running-accumulator fold
    * computes the identical result (the form the SQL oracle replays).
    */
  private[graft] def mergeOnce(toks: Array[String], l: String, r: String): Array[String] = {
    if (toks.length < 2) return toks
    val out = Array.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += l + r; i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  /** LEARN a merges table from the corpus (the training half of Sennrich
    * et al. 2016; [[merges]]/[[bpeTokenize]] are the applying half): word
    * counts are the distributed part (one hash agg over the token stream,
    * deterministically capped at `topWords` by (count DESC, word ASC) — the
    * classic bounded-dictionary trick: tokenizer training state is the word
    * FREQUENCY table, not the corpus), then the greedy loop runs driver-side
    * over that bounded dict: per step, count adjacent symbol pairs weighted
    * by word count (per OCCURRENCE; pairs with left == right are skipped so
    * every learned table satisfies the [[merges]] fixture invariants —
    * creation order holds by construction), merge the (count DESC, left ASC,
    * right ASC) argmax everywhere, stop at `nMerges` or when the best pair
    * count drops below `minPairCount`.
    *
    * ALL-INTEGER training — no float anywhere — so the q_bpe_train DuckDB
    * oracle ([[trainMergesSql]]) replays it exactly, step CTEs unrolled.
    * ASCII-exact like every text oracle (Java vs RE2 whitespace classes,
    * UTF-16 vs UTF-8 tie-break order on non-ASCII).
    *
    * Returns (rank INT, lhs, rhs) in creation order.
    */
  def trainMerges(df: DataFrame, textCol: String, nMerges: Int,
                  topWords: Int = 1 << 16, minPairCount: Long = 2L): DataFrame = {
    val spark = df.sparkSession
    val wc: Array[(String, Long)] = df
      .select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word").asc)
      .limit(topWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var segs: Array[(Array[String], Long)] =
      wc.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val learned = Vector.newBuilder[(Int, String, String)]
    var t = 0
    var stop = false
    while (t < nMerges && !stop) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      segs.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          if (syms(i) != syms(i + 1)) {
            val k = (syms(i), syms(i + 1))
            counts.update(k, counts.getOrElse(k, 0L) + c)
          }
          i += 1
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((bl, br), bc) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        if (bc < minPairCount) stop = true
        else {
          learned += ((t, bl, br))
          segs = segs.map { case (syms, c) => (mergeOnce(syms, bl, br), c) }
          t += 1
        }
      }
    }
    import spark.implicits._
    spark.createDataset(learned.result()).toDF("rank", "lhs", "rhs")
  }

  /** The DuckDB twin of [[trainMerges]] over `table`.`textCol` — the greedy
    * loop unrolled: per step a pair-count CTE (adjacent positions, l != r,
    * weighted by word count), a LIMIT-1 argmax CTE (count DESC, l, r — with
    * the minPairCount floor), and a re-segmentation CTE whose merge is the
    * running-accumulator fold proven equivalent to [[mergeOnce]] for l != r;
    * an empty argmax (early stop) joins in NULLs, so later steps are no-ops
    * and contribute no output row — exactly the Scala early stop. Keep in
    * lockstep with [[trainMerges]].
    *
    * Every chained CTE is `AS MATERIALIZED`: seg_t and best_t are each
    * referenced twice, and DuckDB's default inlining expands the 24-step
    * chain EXPONENTIALLY (2^24 scans of the base table — observed as fd
    * exhaustion). Same family as the lateral-alias textual-substitution
    * gotcha in HashOracleSql.nest; do not remove the keyword.
    */
  def trainMergesSql(table: String, textCol: String, nMerges: Int,
                     topWords: Int = 1 << 16, minPairCount: Long = 2L): String = {
    def step(t: Int): String = {
      val prev = if (t == 0) "seg0" else s"seg$t"
      val next = s"seg${t + 1}"
      s"""pc$t AS MATERIALIZED (
         |  SELECT syms[i+1] AS l, syms[i+2] AS r, SUM(c) AS cnt
         |  FROM $prev, UNNEST(range(0, len(syms) - 1)) u(i)
         |  WHERE syms[i+1] <> syms[i+2]
         |  GROUP BY 1, 2),
         |best$t AS MATERIALIZED (
         |  SELECT l, r FROM pc$t WHERE cnt >= $minPairCount
         |  ORDER BY cnt DESC, l, r LIMIT 1),
         |$next AS MATERIALIZED (
         |  SELECT word, c, list_reduce(
         |    list_prepend(CAST([] AS VARCHAR[]), list_transform(syms, s -> [s])),
         |    (acc, sl) ->
         |      CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND sl[1] = b.r
         |           THEN acc[1:len(acc)-1] || [b.l || b.r]
         |           ELSE list_append(acc, sl[1]) END) AS syms
         |  FROM $prev LEFT JOIN best$t b ON TRUE)""".stripMargin
    }
    val unions = (0 until nMerges)
      .map(t => s"SELECT $t AS rank, l AS lhs, r AS rhs FROM best$t")
      .mkString("\nUNION ALL\n")
    s"""WITH words AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT unnest(regexp_split_to_array(trim($textCol), '\\s+')) AS word FROM $table)
       |  WHERE length(word) > 0 GROUP BY word),
       |seg0 AS MATERIALIZED (
       |  SELECT word, c, list_transform(range(0, length(word)), i -> word[i+1]) AS syms
       |  FROM (SELECT word, c FROM words ORDER BY c DESC, word ASC LIMIT $topWords)),
       |${(0 until nMerges).map(step).mkString(",\n")}
       |SELECT CAST(rank AS INT) AS rank, lhs, rhs FROM (
       |$unions
       |) ORDER BY rank""".stripMargin
  }
}
