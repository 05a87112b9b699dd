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
}
