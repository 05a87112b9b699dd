package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Span-level exact dedup (Lee et al.): hand-computed verdicts, the three
  * invariants a span dedup must keep (conservation, first-occurrence-kept,
  * distinct-span-multiset preservation), reassembly, partition invariance,
  * and the no-join single-window plan shape.
  */
class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "a b c d e f"),          // spans(k=3): "a b c", "d e f"
    (1L, "a b c x y"),            // "a b c" dup of doc 0; "x y" tail unique
    (2L, "d e f d e f"),          // "d e f" dup of doc 0; second "d e f" dup too
    (3L, "q r s"),                // unique
    (4L, "a b c")                 // dup of doc 0 span 0
  ).toDF("doc_id", "text")

  test("hand-computed span verdicts (k=3)") {
    val out = Dedup.spanDedup(docs, "doc_id", "text", 3)
      .select("id", "span_idx", "span_text", "is_dup")
      .as[(Long, Int, String, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out === Map(
      (0L, 0) -> ("a b c", false), (0L, 1) -> ("d e f", false),
      (1L, 0) -> ("a b c", true),  (1L, 1) -> ("x y", false),
      (2L, 0) -> ("d e f", true),  (2L, 1) -> ("d e f", true),
      (3L, 0) -> ("q r s", false),
      (4L, 0) -> ("a b c", true)))
  }

  test("invariants: conservation, first kept, distinct span multiset preserved") {
    val rng = new scala.util.Random(7)
    val words = Vector("aa", "bb", "cc", "dd")
    val big = (0L until 300L).map { i =>
      (i, (0 until (3 + rng.nextInt(12))).map(_ => words(rng.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val spans = Dedup.spanDedup(big, "doc_id", "text", 2)
      .select("id", "span_idx", "span_text", "is_dup")
      .as[(Long, Int, String, Boolean)].collect()
    // conservation: every span of every doc appears exactly once in the output
    val expectedSpanCount = big.select(
      ceil(size(split(trim(col("text")), "\\s+")) / lit(2.0))).as[Long].collect().sum
    assert(spans.length.toLong === expectedSpanCount)
    // first occurrence kept: the minimal (id, idx) per span text is never dup
    val firsts = spans.groupBy(_._3).map { case (_, g) => g.minBy(s => (s._1, s._2)) }
    assert(firsts.forall(!_._4), "a first occurrence was marked duplicate")
    // distinct multiset preserved: kept spans == distinct span texts, exactly once each
    val kept = spans.filter(!_._4).map(_._3)
    assert(kept.sorted === spans.map(_._3).distinct.sorted)
  }

  test("doc fold-back: reassembly, counts, fully-duplicate doc -> empty text") {
    val out = Dedup.spanDedupDocs(docs, "doc_id", "text", 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out === Map(
      0L -> (2L, 0L, "a b c d e f"),
      1L -> (2L, 1L, "x y"),
      2L -> (2L, 2L, ""),          // fully duplicate -> empty rebuild
      3L -> (1L, 0L, "q r s"),
      4L -> (1L, 1L, "")))
  }

  test("no-dup corpus: dedup_text is the normalized identity") {
    val uniq = Seq((1L, "  one two three four  "), (2L, "five six")).toDF("doc_id", "text")
    val out = Dedup.spanDedupDocs(uniq, "doc_id", "text", 3)
      .select("doc_id", "dedup_text").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "one two three four", 2L -> "five six"))
  }

  test("partition invariance: 1 vs 16 partitions") {
    def run(parts: Int) = Dedup.spanDedupDocs(docs.repartition(parts), "doc_id", "text", 3)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(run(1) === run(16))
  }

  test("plan shape: no join anywhere; one fp window exchange in spanDedup") {
    val plan = Dedup.spanDedup(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"),
      s"span verdict must be join-free:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly the fp exchange:\n$plan")
  }
}
