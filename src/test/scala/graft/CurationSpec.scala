package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Curation

/** End-to-end curation chain: gate drops, scrub counts, in-doc line dedup,
  * cross-doc first-occurrence keep, and the one-exchange/no-join plan.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // gopher-passing base: 10 distinct 6-word lines (60 words, all alpha)
  private def passer(tag: String): String =
    (1 to 10).map(i => s"$tag word$i line token alpha beta").mkString("\n")

  private def run(docs: (Long, String)*): Map[Long, (Int, Int, Int, Int, Int, String)] =
    Curation.curate(docs.toDF("id", "t"), "id", "t")
      .select("id", "n_emails", "n_ips", "n_ids", "n_lines", "n_kept", "text_curated")
      .as[(Long, Int, Int, Int, Int, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap

  test("gate drops short docs; scrub + line dedup flow through") {
    val withPii = passer("x") +
      "\nmail bob@x.io at 10.1.2.3 ref 76543210" + // pii line (words all ok)
      s"\n${passer("x").split("\n").head}"         // duplicate of line 1
    val out = run(1L -> "too short to pass the gate", 2L -> withPii)
    assert(!out.contains(1L)) // 6 words < minWords
    val (ne, ni, nid, nl, nk, txt) = out(2L)
    assert((ne, ni, nid) === ((1, 1, 1)))
    assert((nl, nk) === ((12, 11))) // the re-appended first line dropped
    assert(txt.contains("<EMAIL>") && txt.contains("<IP>") && txt.contains("<ID>"))
    assert(txt.split("\n").length === 11)
  }

  test("cross-doc exact dedup keeps the smallest id") {
    val out = run(7L -> passer("z"), 3L -> passer("z"), 5L -> passer("q"))
    assert(out.keySet === Set(3L, 5L))
  }

  test("fingerprint is over NORMALIZED text: whitespace variants collapse") {
    // same words, different layout -> same fingerprint -> one survivor
    val a = passer("w")
    val b = a.replace("\n", " ")
    val out = run(11L -> a, 12L -> b)
    assert(out.keySet === Set(11L))
  }

  test("plan: no join, no UDF, single aggregate exchange") {
    val df = Seq((1L, passer("a")), (2L, passer("b"))).toDF("id", "t")
    val plan = Curation.curate(df, "id", "t").queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"unexpected UDF:\n$plan")
    assert(plan.contains("min_by") || plan.contains("MinBy"),
      s"expected min_by aggregate:\n$plan")
  }
}
