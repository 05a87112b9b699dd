package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Transcripts
import graft.parse.{Drain, DrainConfig}
import graft.windows.Windows
import graft.agg.Features
import graft.enrich.Enrich

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query runs over the deterministic `transcripts` derivation of the
  * driver's `events.parquet` (graft.sources.Transcripts), or directly over the
  * TPC-H-ish / documents / embeddings tables. Each `queries` entry has a
  * matching DuckDB `oracleSql` computing the identical result.
  */
object SparkEntry {

  /** Drain config used for transcripts: numbers are the parameter slots. */
  val drainCfg: DrainConfig = DrainConfig(depth = 4, st = 0.4, maxChild = 100)

  private def transcripts(s: SparkSession, dir: String): DataFrame =
    Transcripts.fromEvents(s, dir)

  /** transcripts + Drain two-phase parse → adds event_id / event_template. */
  private def parsed(s: SparkSession, dir: String): DataFrame = {
    val t = transcripts(s, dir)
    val (p, _) = Drain.parse(t, "text", drainCfg)
    p
  }

  // ---- oracle SQL scaffolding -------------------------------------------
  private def withT(body: String): String =
    s"WITH ${Transcripts.oracleCte} $body"

  /** DuckDB equivalent of the Drain parse on this corpus: the mined template
    * provably converges to the digit-masked text (every parameter slot in the
    * derived texts is a digit run), so the oracle is a pure regexp_replace.
    */
  private val parsedCte: String =
    """parsed AS (
      |  SELECT conv_id, turn_idx, role, tool, ts, text,
      |         regexp_replace(text, '[0-9]+', '<*>', 'g') AS event_template,
      |         substr(md5(regexp_replace(text, '[0-9]+', '<*>', 'g')), 1, 8) AS event_id
      |  FROM transcripts
      |)""".stripMargin

  private def withP(body: String): String =
    s"WITH ${Transcripts.oracleCte}, $parsedCte $body"

  /** Flagship query on sf=0.001 — the end-to-end parse→enrich→aggregate
    * backbone; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val p = parsed(spark, "/root/testdata/sf0.001")
    Features.saltedCount(p, "event_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S2/P1 — transcripts scan+projection; per-turn text equality gate.
    "q_transcripts" -> ((s, dir) => transcripts(s, dir)),

    // T1/T2/G4 — Drain mine: template dictionary with md5[0:8] ids + counts.
    "q_parse_templates" -> { (s, dir) =>
      val dict = Drain.mine(transcripts(s, dir), "text", drainCfg)
      s.createDataFrame(dict).select(
        col("event_id"), col("event_template"), col("occurrences"))
    },

    // T1(b)/T3 — per-turn match + parameter extraction.
    "q_parse_structured" -> { (s, dir) =>
      val p = Drain.extractParameters(parsed(s, dir), "text", "event_template")
      p.select(col("conv_id"), col("turn_idx"), col("event_id"),
        col("event_template"), array_join(col("parameters"), "|").as("params"))
    },

    // G1/G2 — session grouping: ordered per-conversation event sequence.
    "q_session_seq" -> { (s, dir) =>
      Windows.sessionGroup(parsed(s, dir))
        .select(col("conv_id"), col("n_turns").cast("long").as("n_turns"),
          array_join(col("events"), " ").as("seq"))
    },

    // G7 — event-count vectors per conversation (exploded form).
    "q_count_vector" -> { (s, dir) =>
      Features.countVectors(parsed(s, dir), Seq("conv_id"))
    },

    // G8 — TF-IDF weighting of the count vectors.
    "q_tfidf" -> { (s, dir) =>
      val cv = Features.countVectors(parsed(s, dir), Seq("conv_id"))
      Features.tfidf(cv, Seq("conv_id"))
        .select(col("conv_id"), col("event_id"), col("cnt"),
          col("df"), round(col("tfidf"), 4).as("tfidf"))
    },

    // W1 — fixed entry-count windows (size 4, step 2 → overlapping).
    "q_fixed_window" -> { (s, dir) =>
      Windows.fixedWindows(parsed(s, dir), size = 4, step = 2)
        .select(col("conv_id"), col("win_start"),
          array_join(col("events"), " ").as("events_seq"), col("n"))
    },

    // W3 — history sliding windows + next-event label.
    "q_history" -> { (s, dir) =>
      Windows.historyWindows(parsed(s, dir), h = 3)
        .select(col("conv_id"), col("turn_idx"),
          array_join(col("history"), " ").as("history"), col("next_event"))
    },

    // W7/F4 — deltaT between consecutive turns (exact integer micros).
    "q_deltat" -> { (s, dir) =>
      Windows.deltaT(transcripts(s, dir))
        .select(col("conv_id"), col("turn_idx"), col("delta_us"))
    },

    // G5/J5 — vocab: frequency-ranked contiguous event ids.
    "q_vocab" -> { (s, dir) => Features.vocab(parsed(s, dir)) },

    // P2/G11 — label binarize + window label reduce (max per conversation).
    "q_window_label" -> { (s, dir) =>
      transcripts(s, dir)
        .withColumn("lbl", when(col("role") === "tool", 1).otherwise(0))
        .groupBy(col("conv_id"))
        .agg(max(col("lbl")).as("label"), sum(col("lbl")).as("n_anomalous"))
    },

    // G4 + §4.2 skew — salted groupBy-count over the hot template key.
    "q_route_counts" -> { (s, dir) =>
      Features.saltedCount(parsed(s, dir), "event_id")
    },

    // G12 — distinct-sequence multiplicities split by label.
    "q_distinct_seq" -> { (s, dir) =>
      val p = parsed(s, dir)
        .withColumn("lbl", when(col("role") === "tool", 1).otherwise(0))
      val grouped = Windows.sessionGroup(p, labelCol = Some("lbl"))
        .withColumn("label", array_max(col("labels")))
      Features.distinctSequences(grouped)
    },

    // G14 — dedup with min-label reconciliation.
    "q_reconcile" -> { (s, dir) =>
      val p = parsed(s, dir)
        .withColumn("lbl", when(col("role") === "tool", 1).otherwise(0))
      val grouped = Windows.sessionGroup(p, labelCol = Some("lbl"))
        .withColumn("label", array_max(col("labels")))
      Features.reconcileLabels(grouped)
    },

    // G16 — confusion matrix via conditional sums.
    "q_confusion" -> { (s, dir) =>
      val t = transcripts(s, dir)
        .withColumn("pred", when(col("tool").isNotNull, 1).otherwise(0))
        .withColumn("truth", when(col("role") === "tool", 1).otherwise(0))
      Features.confusion(t, "pred", "truth")
    },

    // J1/J2 — broadcast label enrich: conv label dim joined to turns.
    "q_enrich_labels" -> { (s, dir) =>
      val t = transcripts(s, dir)
      val labels = t.groupBy(col("conv_id"))
        .agg(max(when(col("role") === "tool", 1).otherwise(0)).as("label"))
      Enrich.convLabels(t.select("conv_id", "turn_idx"), labels)
    },

    // sanity: TPC-H-ish aggregate over lineitem.
    "q1_agg" -> { (s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
          count(lit(1)).as("n_rows"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q_transcripts" -> withT("SELECT * FROM transcripts"),

    "q_parse_templates" -> withP(
      """SELECT event_id, event_template, count(*) AS occurrences
        |FROM parsed GROUP BY 1, 2""".stripMargin),

    "q_parse_structured" -> withP(
      """SELECT conv_id, turn_idx, event_id, event_template,
        |       array_to_string(regexp_extract_all(text, '[0-9]+'), '|') AS params
        |FROM parsed""".stripMargin),

    "q_session_seq" -> withP(
      """SELECT conv_id, count(*) AS n_turns,
        |       string_agg(event_id, ' ' ORDER BY turn_idx) AS seq
        |FROM parsed GROUP BY conv_id""".stripMargin),

    "q_count_vector" -> withP(
      """SELECT conv_id, event_id, count(*) AS cnt
        |FROM parsed GROUP BY 1, 2""".stripMargin),

    "q_tfidf" -> withP(
      """, cv AS (SELECT conv_id, event_id, count(*) AS cnt FROM parsed GROUP BY 1, 2),
        |n AS (SELECT count(DISTINCT conv_id) AS n FROM cv),
        |dfx AS (SELECT event_id, count(*) AS df FROM cv GROUP BY 1)
        |SELECT cv.conv_id, cv.event_id, cv.cnt, dfx.df,
        |       round(cv.cnt * ln(CAST(n.n AS DOUBLE) / dfx.df), 4) AS tfidf
        |FROM cv, n, dfx WHERE cv.event_id = dfx.event_id""".stripMargin),

    "q_fixed_window" -> withP(
      """, rns AS (
        |  SELECT conv_id, turn_idx, event_id,
        |         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS rn
        |  FROM parsed)
        |SELECT conv_id, win_start,
        |       string_agg(event_id, ' ' ORDER BY turn_idx) AS events_seq,
        |       count(*) AS n
        |FROM (
        |  SELECT conv_id, turn_idx, event_id, rn,
        |         (CAST(floor(rn / 2) AS BIGINT) - k) * 2 AS win_start
        |  FROM rns, range(0, 2) t(k))
        |WHERE win_start >= 0 AND rn < win_start + 4
        |GROUP BY conv_id, win_start""".stripMargin),

    "q_history" -> withP(
      """SELECT conv_id, turn_idx, history, next_event FROM (
        |  SELECT conv_id, turn_idx,
        |         array_to_string(list(event_id) OVER w3, ' ') AS history,
        |         lead(event_id) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_event,
        |         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
        |  FROM parsed
        |  WINDOW w3 AS (PARTITION BY conv_id ORDER BY turn_idx ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
        |WHERE rn >= 3 AND next_event IS NOT NULL""".stripMargin),

    "q_deltat" -> withT(
      """SELECT conv_id, turn_idx,
        |       coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx), 0) AS delta_us
        |FROM transcripts""".stripMargin),

    "q_vocab" -> withP(
      """SELECT event_id, count(*) AS freq,
        |       CAST(row_number() OVER (ORDER BY count(*) DESC, event_id ASC) AS INT) AS vocab_id
        |FROM parsed GROUP BY event_id""".stripMargin),

    "q_window_label" -> withT(
      """SELECT conv_id,
        |       max(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS label,
        |       CAST(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous
        |FROM transcripts GROUP BY conv_id""".stripMargin),

    "q_route_counts" -> withP(
      """SELECT event_id, count(*) AS occurrences
        |FROM parsed GROUP BY 1""".stripMargin),

    "q_distinct_seq" -> withP(
      """, sess AS (
        |  SELECT conv_id,
        |         string_agg(event_id, ' ' ORDER BY turn_idx) AS seq,
        |         max(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS label
        |  FROM parsed GROUP BY conv_id)
        |SELECT seq, label, count(*) AS multiplicity FROM sess GROUP BY 1, 2""".stripMargin),

    "q_reconcile" -> withP(
      """, sess AS (
        |  SELECT conv_id,
        |         string_agg(event_id, ' ' ORDER BY turn_idx) AS seq,
        |         max(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS label
        |  FROM parsed GROUP BY conv_id)
        |SELECT seq, min(label) AS label, count(*) AS multiplicity FROM sess GROUP BY 1""".stripMargin),

    "q_confusion" -> withT(
      """SELECT
        |  CAST(sum(CASE WHEN tool IS NOT NULL AND role = 'tool' THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |  CAST(sum(CASE WHEN tool IS NOT NULL AND role <> 'tool' THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |  CAST(sum(CASE WHEN tool IS NULL AND role <> 'tool' THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        |  CAST(sum(CASE WHEN tool IS NULL AND role = 'tool' THEN 1 ELSE 0 END) AS BIGINT) AS fn
        |FROM transcripts""".stripMargin),

    "q_enrich_labels" -> withT(
      """, labels AS (
        |  SELECT conv_id, max(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS label
        |  FROM transcripts GROUP BY conv_id)
        |SELECT t.conv_id, t.turn_idx, coalesce(l.label, 0) AS label
        |FROM transcripts t LEFT JOIN labels l USING (conv_id)""".stripMargin),

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty, count(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2""".stripMargin
  )
}
