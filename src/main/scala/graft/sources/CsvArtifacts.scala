package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** CSV parity for the reference's file artifacts (SURVEY.md §2.1 S2/S3/S6/S7
  * under CSV): the reference emits `<log>_structured.csv` and
  * `<log>_templates.csv` (logadempirical/logparser/Drain.py:211-224) and
  * consumes `anomaly_label.csv` with Label ∈ {Anomaly, Normal}
  * (dataset/data_process.py:130-134). Parquet is the right store at 100 TB,
  * but a user pointing this engine at the reference's existing artifacts
  * needs these exact shapes readable and writable.
  *
  * All readers take EXPLICIT schemas (never inferSchema — an inference pass
  * is a second full scan, and digit-only id columns would be inferred
  * numeric, corrupting md5[0:8] event ids that happen to be all-digits).
  * Writers emit a header and let Spark's CSV quoting handle embedded
  * delimiters; a write is a directory of part files (the distributed CSV
  * sink — one file per task, exactly how a 1000-executor job must write).
  */
object CsvArtifacts {

  // pandas-style quoting (doubled quotes, not backslash escapes) so the
  // files interoperate with the reference's to_csv/read_csv byte-for-byte
  private val quoteOpts = Map("header" -> "true", "escape" -> "\"")

  /** `<log>_templates.csv` shape: EventId, EventTemplate, Occurrences. */
  def writeTemplatesCsv(dict: DataFrame, path: String): Unit =
    dict.select(col("event_id").as("EventId"),
        col("event_template").as("EventTemplate"),
        col("occurrences").as("Occurrences"))
      .write.mode(SaveMode.Overwrite).options(quoteOpts).csv(path)

  def readTemplatesCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema("EventId STRING, EventTemplate STRING, Occurrences BIGINT")
      .options(quoteOpts).csv(path)
      .select(col("EventId").as("event_id"),
        col("EventTemplate").as("event_template"),
        col("Occurrences").as("occurrences"))

  /** `<log>_structured.csv` shape: the per-line frame with EventId +
    * EventTemplate appended (column names pass through; callers provide the
    * reference's capitalized names when byte-level parity matters).
    */
  def writeStructuredCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).options(quoteOpts).csv(path)

  /** @param multiLine true iff field values may embed newlines. Off by
    *        default ON PURPOSE: multiLine makes each CSV file non-splittable
    *        (one task per file however big) — at scale, keep log lines
    *        newline-free and files bounded instead.
    */
  def readStructuredCsv(spark: SparkSession, path: String, ddlSchema: String,
                        multiLine: Boolean = false): DataFrame =
    spark.read.schema(ddlSchema).options(quoteOpts)
      .option("multiLine", multiLine.toString).csv(path)

  /** `anomaly_label.csv` → the conversation-label dim: (conv_id, label 1/0).
    * Label is the reference's string enum; anything equal to 'Anomaly' is 1
    * (data_process.py:133-134).
    */
  def readAnomalyLabelCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema("BlockId STRING, Label STRING")
      .options(quoteOpts).csv(path)
      .select(col("BlockId").as("conv_id"),
        when(col("Label") === "Anomaly", 1).otherwise(0).as("label"))

  /** Inverse of [[readAnomalyLabelCsv]]: write a (conv_id, label) dim in the
    * reference's anomaly_label.csv shape.
    */
  def writeAnomalyLabelCsv(labels: DataFrame, path: String): Unit =
    labels.select(col("conv_id").as("BlockId"),
        when(col("label") === 1, "Anomaly").otherwise("Normal").as("Label"))
      .write.mode(SaveMode.Overwrite).options(quoteOpts).csv(path)
}
