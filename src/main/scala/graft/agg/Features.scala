package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** Featurization & evaluation aggregates (SURVEY.md §2.5, §2.7).
  *
  * The count-vector / TF-IDF backbone of the reference's windowed anomaly
  * features (loglizer/preprocessing.py:48-151), re-expressed as exploded
  * (group, event) aggregates: schema-stable regardless of dictionary size,
  * map-side-combinable, and skew-safe (the hot-template count goes through
  * [[saltedCount]]).
  */
object Features {

  /** G4 — template occurrence count with explicit skew salting
    * (north rule: "skewed hot templates are salted before the groupBy-count
    * aggregate"). Two-level aggregate: a first partial on
    * (key, salt=pmod(hash(conv_id), buckets)) bounds any single reducer's key
    * share to 1/buckets, then the tiny salted result is re-aggregated.
    * (Spark's hash agg already does map-side partials; the salt additionally
    * protects the final exchange when one key dominates the whole input.)
    */
  def saltedCount(df: DataFrame, keyCol: String, buckets: Int = 32): DataFrame =
    df.groupBy(col(keyCol), pmod(hash(col("conv_id")), lit(buckets)).as("__salt"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(keyCol))
      .agg(sum(col("__c")).as("occurrences"))

  /** G7 — per-group event-count vector, exploded form (group, event, cnt)
    * (loglizer/preprocessing.py:77-84). Callers can `map_from_entries` it
    * back into a MapType column when a vector-per-row is needed.
    */
  def countVectors(df: DataFrame, groupCols: Seq[String],
                   eventCol: String = "event_id"): DataFrame =
    df.groupBy((groupCols :+ eventCol).map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** G8 — TF-IDF weighting over count vectors
    * (loglizer/preprocessing.py:96-99): idf = ln(N / df), with
    * df = #groups containing the event; weight = tf * idf.
    * The idf side is tiny (one row per event) → broadcast join.
    *
    * N rides a broadcast ONE-ROW aggregate instead of a separate
    * `distinct().count()` driver action (round-7, guide §2.4): the count
    * job re-computed the whole `counts` subtree (a full parse+match pass at
    * the q_tfidf call site) just to embed a literal; as a plan-side
    * aggregate all three consumers of `counts` (N, the df table, the join
    * probe) sit in ONE job and share the `counts` exchange via
    * ReuseExchange — the input is computed once, not three times. Values
    * are bit-identical: N is an exact integer either way and
    * `cast(double)` = `.toDouble`.
    */
  def tfidf(counts: DataFrame, groupCols: Seq[String],
            eventCol: String = "event_id"): DataFrame = {
    val nGroups = counts.select(groupCols.map(col): _*).distinct()
      .agg(count(lit(1)).as("__ng"))
    val dfTable = counts.groupBy(col(eventCol)).agg(count(lit(1)).as("df"))
    counts.join(broadcast(dfTable), eventCol)
      .crossJoin(broadcast(nGroups))
      .withColumn("idf", log(col("__ng").cast("double") / col("df")))
      .withColumn("tfidf", col("cnt") * col("idf"))
      .drop("__ng")
  }

  /** G5/J5 — vocab build: events ranked by frequency desc then name asc into
    * contiguous 1-based ids (logdeep/dataset/vocab.py:21-29 with the pinned
    * deterministic ordering of bert_pytorch/dataset/vocab.py:52-58).
    *
    * Ranking goes through [[graft.util.Rank.globalRowNumber]] — a
    * partition-less `row_number().over(orderBy)` would coalesce the ranking
    * into one task, a scale-killer once the vocabulary is word-sized
    * (10⁷-10⁸ distinct keys). The (key, freq) input is post-aggregation, so
    * it is persisted between the two rank passes.
    */
  def vocab(df: DataFrame, eventCol: String = "event_id"): DataFrame = {
    val counted = df.groupBy(col(eventCol)).agg(count(lit(1)).as("freq"))
    graft.util.Rank.globalRowNumber(
        counted, Seq(col("freq").desc, col(eventCol).asc), "vocab_id",
        persistSorted = true)
      ._1.withColumn("vocab_id", col("vocab_id").cast("int"))
  }

  /** G12 — distinct-sequence multiplicities split by label
    * (logdeep/tools/predict.py:26-52): groupBy(seq, label).count.
    */
  def distinctSequences(grouped: DataFrame, seqCol: String = "events",
                        labelCol: String = "label"): DataFrame =
    grouped.groupBy(array_join(col(seqCol), " ").as("seq"), col(labelCol))
      .agg(count(lit(1)).as("multiplicity"))

  /** G13 — train-side dedup: each distinct sequence once
    * (dataset/data_process.py:163-176).
    */
  def dedupSequences(grouped: DataFrame, seqCol: String = "events"): DataFrame =
    grouped.dropDuplicates(seqCol)

  /** G14 — dedup with label reconciliation: conflicting labels for one
    * sequence → min(label) (pinned rule for PLELog/data/Sample.py:121-127's
    * order-dependent behavior, SURVEY.md §7.3.2).
    */
  def reconcileLabels(grouped: DataFrame, seqCol: String = "events",
                      labelCol: String = "label"): DataFrame =
    grouped.groupBy(array_join(col(seqCol), " ").as("seq"))
      .agg(min(col(labelCol)).as("label"), count(lit(1)).as("multiplicity"))

  /** G16 — confusion matrix + precision/recall/F1 from (pred, truth) 0/1
    * columns, one pass of conditional sums (loglizer/utils.py:13-42).
    */
  def confusion(df: DataFrame, predCol: String, truthCol: String): DataFrame = {
    val p = col(predCol); val t = col(truthCol)
    df.agg(
      sum(when(p === 1 && t === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(p === 1 && t === 0, 1L).otherwise(0L)).as("fp"),
      sum(when(p === 0 && t === 0, 1L).otherwise(0L)).as("tn"),
      sum(when(p === 0 && t === 1, 1L).otherwise(0L)).as("fn"))
  }

  /** W8 — lead time: position of the first anomalous window in each session
    * (logdeep/tools/predict.py:222-231): min(pos where anomalous) per group.
    */
  def leadTime(df: DataFrame, groupCol: String, posCol: String,
               anomCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(min(when(col(anomCol) === 1, col(posCol))).as("first_anomaly_pos"),
        max(col(anomCol)).as("has_anomaly"))

  /** J7 — count-matrix column alignment (loglizer/preprocessing.py:128-137):
    * test-time counts reindexed to the train-time event set; events unseen
    * at train time are summed into a per-group `__oov__` bucket.
    */
  def alignToTrainEvents(testCounts: DataFrame, trainEvents: DataFrame,
                         groupCols: Seq[String],
                         eventCol: String = "event_id"): DataFrame = {
    val dim = trainEvents.select(col(eventCol)).distinct()
      .withColumn("__known", lit(1))
    testCounts
      .join(broadcast(dim), Seq(eventCol), "left")
      .withColumn(eventCol,
        when(col("__known").isNull, lit("__oov__")).otherwise(col(eventCol)))
      .drop("__known")
      .groupBy((groupCols :+ eventCol).map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** P5 — normal-only filter: keep rows/sessions with label 0, the train-side
    * selection of every unsupervised model in the reference
    * (logdeep/dataset/session.py:50-55 keeps `Label == 0` sessions).
    */
  def normalOnly(df: DataFrame, labelCol: String = "label"): DataFrame =
    df.filter(col(labelCol) === 0)

  /** P8 — anomaly-rate counter (dataset/data_process.py:18-26). */
  def anomalyRate(df: DataFrame, labelCol: String): DataFrame =
    df.agg(count(lit(1)).as("n"),
      sum(col(labelCol)).cast("long").as("n_anomalous"),
      avg(col(labelCol)).as("anomaly_rate"))

  /** P9 — data-quality guard: rows violating `predicate` are counted and
    * excluded (PLELog/data/DataLoader.py:149-167's single-block-id assert,
    * as a metric instead of a crash).
    */
  def qualityFilter(df: DataFrame, predicate: org.apache.spark.sql.Column): (DataFrame, Long) = {
    val bad = df.filter(!predicate).count()
    (df.filter(predicate), bad)
  }

  /** O3 — top-k candidate membership: anomaly iff the true next event is not
    * among the k most frequent events (the data-pipeline half of
    * logdeep/tools/predict.py:99-111; model logits replaced by the frequency
    * prior, which is what the count-vector backbone feeds).
    */
  def topKMembership(history: DataFrame, k: Int,
                     eventCol: String = "next_event"): DataFrame = {
    val topK = history.groupBy(col(eventCol).as("e")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("e").asc).limit(k)
      .select(col("e"))
    history.join(broadcast(topK), history(eventCol) === topK("e"), "left")
      .withColumn("is_anomaly", when(col("e").isNull, 1).otherwise(0))
      .drop("e")
  }

  /** O3, true per-row semantics — top-k over a per-row SCORE ARRAY
    * (logdeep/tools/predict.py:99-111: `argsort(output)[:k]`, anomaly iff the
    * true label is not among the k best, rank recorded).
    *
    * `scoresCol`: array of candidate scores (1-based candidate index =
    * array position); `labelCol`: the true candidate's 1-based index.
    * rank(label) = 1 + #candidates strictly better, where "better" is
    * (score desc, index asc) — the pinned tie-break. Pure column
    * expressions over the row's own array: embarrassingly parallel, no
    * shuffle, no UDF.
    */
  def topKRank(df: DataFrame, scoresCol: String, labelCol: String,
               k: Int): DataFrame = {
    val s   = col(scoresCol)
    val lbl = col(labelCol)
    val sLbl = element_at(s, lbl)
    val better = size(filter(sequence(lit(1), size(s)), i =>
      element_at(s, i) > sLbl || (element_at(s, i) === sLbl && i < lbl)))
    df.withColumn("rank", (better + 1).cast("int"))
      .withColumn("is_anomaly", when(col("rank") > k, 1).otherwise(0))
  }
}
