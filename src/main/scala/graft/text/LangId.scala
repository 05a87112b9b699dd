package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cavnar–Trenkle rank-order language identification ("N-Gram-Based Text
  * Categorization", SDAIR'94 — public): a language profile is the top-K
  * character n-grams of its training text ranked by frequency; a document
  * is scored against each profile by the sum of rank displacements of its
  * own top-M grams (out-of-profile grams pay a fixed penalty); the language
  * with the smallest distance wins. The real upgrade over the marker-word
  * heuristic [[TextAnalysis.langId]] (kept as the cheap tier).
  *
  * PINNED semantics (every choice is cross-engine replayed by the
  * q_langid_profiles DuckDB oracle):
  *  - grams: TRIGRAMS of `' ' + lower(whitespace-normalized text) + ' '`;
  *    documents whose normalized text has no trigram (< 3 chars) drop out;
  *  - profiles: derived AT INIT from the pinned marker-word table
  *    ([[TextAnalysis.markers]], words joined by single spaces) by the same
  *    trigram procedure — rank = position under (count DESC, gram ASC),
  *    top [[profileSize]]; the SQL VALUES are generated from the SAME
  *    computed profiles ([[profilesSqlValues]] — lockstep fixture);
  *  - distance: over the doc's top-[[profileSize]] grams,
  *    Σ |doc_rank − profile_rank|, absent grams contribute [[penalty]];
  *  - winner: min distance, ties broken by language code ascending
  *    (a lexicographic min over (dist, lang) structs).
  *
  * Scale shape: explode → two-level (doc, gram) count agg → per-doc top-K
  * window (one doc-key exchange) → BROADCAST of the ~100-row profile table
  * (cross join with the 5-row language list, left join on (lang, gram)) →
  * per-(doc, lang) sum → per-doc argmin. No shuffle touches anything wider
  * than (doc, gram, count); the profile side never exchanges.
  */
object LangId {

  val nGram: Int       = 3
  val profileSize: Int = 20
  val penalty: Int     = 20

  /** Trigram rank profile of a training text: (gram, rank) with rank from 1,
    * ordered by (count DESC, gram ASC), truncated to [[profileSize]].
    */
  def profileOf(text: String): Seq[(String, Int)] = {
    val norm  = " " + text.trim.toLowerCase.replaceAll("\\s+", " ") + " "
    val grams = (0 to norm.length - nGram).map(i => norm.substring(i, i + nGram))
    grams.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (g, c) => (-c, g) }
      .take(profileSize).zipWithIndex
      .map { case ((g, _), i) => (g, i + 1) }
  }

  /** (lang, gram, rank) rows for every pinned language. */
  val profiles: Seq[(String, String, Int)] =
    TextAnalysis.markers.toSeq.sortBy(_._1).flatMap { case (lang, ws) =>
      profileOf(ws.mkString(" ")).map { case (g, r) => (lang, g, r) }
    }

  /** The profile table as a SQL VALUES body — the DuckDB twin of
    * [[profiles]] (lockstep: both derive from the same marker fixture).
    */
  def profilesSqlValues: String =
    profiles.map { case (l, g, r) => s"('$l', '${g.replace("'", "''")}', $r)" }
      .mkString(", ")

  /** Classify each document: (idCol, lang_ct, dist). */
  def classify(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val s: SparkSession = df.sparkSession
    import s.implicits._
    val norm = concat(lit(" "),
      regexp_replace(lower(trim(col(textCol))), "\\s+", " "), lit(" "))
    // let-bound norm (the documented O(n²) HOF pitfall); the < 3 guard keeps
    // sequence() from stepping backwards on degenerate text
    val gramsArr = element_at(
      transform(array(norm), n =>
        when(length(n) < nGram, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), length(n) - (nGram - 1)),
            i => n.substr(i, lit(nGram))))),
      1)
    val counts = df.select(col(idCol).as("id"), explode(gramsArr).as("gram"))
      .groupBy(col("id"), col("gram")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("id")).orderBy(col("cnt").desc, col("gram"))
    val top = counts.withColumn("rd", row_number().over(w))
      .filter(col("rd") <= profileSize)
    val langDf = profiles.map(_._1).distinct.sorted.toDF("lang")
    val profDf = profiles.toDF("lang", "gram", "rl")
    top.crossJoin(broadcast(langDf))
      .join(broadcast(profDf), Seq("lang", "gram"), "left")
      .groupBy(col("id"), col("lang"))
      .agg(sum(coalesce(abs(col("rd") - col("rl")), lit(penalty))).as("dist"))
      .groupBy(col("id").as(idCol))
      .agg(min(struct(col("dist"), col("lang"))).as("b"))
      .select(col(idCol), col("b.lang").as("lang_ct"), col("b.dist").as("dist"))
  }
}
