package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Cross-document boilerplate-line removal: hand-computed group thresholds,
  * per-doc-distinct df counting, single-doc-group guard, all-lines-removed
  * edge, order preservation, broadcast removal join.
  */
class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)],
                  minDf: Long = 2L, fracNum: Int = 1, fracDen: Int = 2) =
    TextAnalysis.boilerplateLines(
      rows.toDF("doc_id", "source", "text"), "doc_id", "source", "text",
      minDf, fracNum, fracDen)
      .select("doc_id", "n_lines", "n_kept", "text_clean")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3)))
      .toMap

  test("hand-computed: header in 3/3 docs removed, line in 1/3 kept, order preserved") {
    val out = run(Seq(
      (1L, "a", "HEAD\nalpha\nbeta"),
      (2L, "a", "HEAD\ngamma"),
      (3L, "a", "HEAD\nalpha\ndelta")))
    // HEAD df=3/3 → removed; alpha df=2/3 (2*2 ≥ 3) → removed; rest unique
    assert(out(1L) === ((3, 1, "beta")))
    assert(out(2L) === ((2, 1, "gamma")))
    assert(out(3L) === ((3, 1, "delta")))
  }

  test("all lines removed yields empty text_clean (not null)") {
    val out = run(Seq((1L, "a", "X\nY"), (2L, "a", "X\nY")))
    assert(out(1L) === ((2, 0, "")))
    assert(out(2L) === ((2, 0, "")))
  }

  test("single-doc group: minDf guards against self-removal") {
    val out = run(Seq((1L, "solo", "only\nlines\nhere")))
    assert(out(1L) === ((3, 3, "only\nlines\nhere")))
  }

  test("in-doc repeats do not inflate df (distinct-per-doc counting), but " +
       "removal cuts every occurrence") {
    // 'rep' twice in doc 1 only → df=1 < minDf → kept, both copies.
    // 'bp' in 2/2 docs (once and twice) → removed, ALL occurrences.
    val out = run(Seq(
      (1L, "a", "rep\nrep\nbp\nu1\nbp"),
      (2L, "a", "bp\nu2")))
    assert(out(1L) === ((5, 3, "rep\nrep\nu1")))
    assert(out(2L) === ((2, 1, "u2")))
  }

  test("groups are independent: the same line is boilerplate in one source, " +
       "kept in another") {
    val out = run(Seq(
      (1L, "a", "NAV\nx"), (2L, "a", "NAV\ny"),
      (3L, "b", "NAV\nz"), (4L, "b", "other\nw")))
    assert(out(1L)._3 === "x")
    assert(out(2L)._3 === "y")
    // in b: NAV df=1/2 → fails minDf=2 → kept
    assert(out(3L)._3 === "NAV\nz")
    assert(out(4L)._3 === "other\nw")
  }

  test("plan: the removal join is broadcast (no SortMergeJoin anywhere)") {
    val docs = spark.range(100).select(col("id").as("doc_id"),
      concat(lit("s"), col("id") % 3).as("source"),
      concat(lit("HEAD\nbody "), col("id")).as("text"))
    val plan = TextAnalysis.boilerplateLines(docs, "doc_id", "source", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"removal join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join:\n$plan")
  }
}
