package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus CURATION — the standard pretraining cleanup chain
  * (C4 / Gopher / CCNet lineage) composed from this repo's individually
  * verified operators, so the CHAIN (not just the pieces) is cross-engine
  * exact (q_curation replays the identical composition in DuckDB):
  *
  *   1. Gopher quality gate   — [[TextAnalysis.gopherQualityRules]], keep
  *      `gopher_pass` only;
  *   2. PII redaction         — [[TextAnalysis.piiScrub]] (emails → IPs →
  *      long ids, tier-ordered);
  *   3. within-doc line dedup — [[TextAnalysis.dedupLines]] (first
  *      occurrence kept, order preserved);
  *   4. cross-doc exact dedup — [[TextAnalysis.fingerprint]] of the final
  *      text, FIRST occurrence (minimum id) kept per fingerprint.
  *
  * Output: (idCol, n_emails, n_ips, n_ids, n_lines, n_kept, text_curated),
  * one row per surviving document.
  *
  * Scale shape: stages 1–3 are pure projections/filters — they FUSE into
  * one whole-stage span over the scan (no shuffle, no UDF, no join). The
  * only exchange in the whole chain is the final min-by aggregate on the
  * 32-hex-char fingerprint (`min_by(struct(...), id)` — a declarative
  * aggregate with map-side partials, so duplicate fingerprints collapse
  * per task before the shuffle; no join-back, no window). That is the
  * 100 TB shape: per-doc work scales with scan bandwidth, and the one
  * shuffle carries exactly one slim row per distinct surviving document.
  */
object Curation {

  /** Deterministic gopher-passing multi-line fixture used by q_curation to
    * plant cross-document exact duplicates (54 words, 9 distinct lines, one
    * email to scrub, no digits): every planted copy curates to the SAME
    * final text, so stage 4 keeps only the smallest id. `fixtureSql` is its
    * DuckDB literal twin — generated from the same constant.
    */
  val fixtureDupDoc: String = Seq(
    "alpha beta gamma delta epsilon zeta",
    "eta theta iota kappa lambda mu",
    "nu xi omicron pi rho sigma",
    "tau upsilon phi chi psi omega",
    "red orange yellow green blue indigo",
    "violet coral amber jade pearl slate",
    "north south east west upper lower",
    "spring summer autumn winter dawn dusk",
    "mail team@example.com for details today now").mkString("\n")

  /** The fixture as a DuckDB string expression (lockstep with
    * [[fixtureDupDoc]] by construction).
    */
  def fixtureSql: String =
    fixtureDupDoc.split("\n").map(l => s"'$l'").mkString(" || chr(10) || ")

  def curate(df: DataFrame, idCol: String, textCol: String,
             minWords: Int = 50): DataFrame = {
    val passed = TextAnalysis.gopherQualityRules(df, textCol, minWords = minWords)
      .filter(col("gopher_pass"))
      .select(col(idCol), col(textCol))
    val scrubbed = TextAnalysis.piiScrub(passed, textCol)
    val deduped  = TextAnalysis.dedupLines(scrubbed, "text_scrubbed")
    deduped
      .withColumn("__fp", TextAnalysis.fingerprint(col("text_dedup")))
      .groupBy(col("__fp"))
      .agg(min_by(
        struct(col(idCol), col("n_emails"), col("n_ips"), col("n_ids"),
          col("n_lines"), col("n_kept"), col("text_dedup").as("text_curated")),
        col(idCol)).as("r"))
      .select(col(s"r.$idCol"), col("r.n_emails"), col("r.n_ips"),
        col("r.n_ids"), col("r.n_lines"), col("r.n_kept"),
        col("r.text_curated"))
  }
}
