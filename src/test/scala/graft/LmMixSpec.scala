package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.LmScore
import graft.agg.Preprocessing

/** Stupid-backoff LM scoring (hand-computed counts on a toy corpus) and the
  * deterministic domain-mixture sampler (cap/drop semantics, partition
  * independence, broadcast-only plan).
  */
class LmMixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stupidBackoff: hand-computed seen/backoff branches") {
    val corpus = Seq("a b a c", "b a").toDF("text")
    val docs = Seq((1L, "a b x"), (2L, "b a c"), (3L, "a")).toDF("id", "text")
    val out = LmScore.stupidBackoff(docs, corpus, "id", "text")
      .select("id", "n_bigrams", "n_backoff", "avg_logprob")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // uni: a=3 b=2 c=1 (N=6); bi: "a b"=1 "b a"=2 "a c"=1
    // doc 1: "a b" -> 1/3 -> -477121; "b x" -> 0.4*(1/6) -> -1176091
    assert(out(0) === ((1L, 2L, 1L, -0.8266)))
    // doc 2: "b a" -> 2/2 -> 0; "a c" -> 1/3 -> -477121
    assert(out(1) === ((2L, 2L, 0L, -0.2386)))
    // doc 3: single token -> no bigram -> no row
    assert(out.length === 2)
  }

  test("mixtureSample: cap-at-1 keeps all, absent domain drops, hash gate exact") {
    val df = (1L to 300L).map { i =>
      val d = if (i <= 100) "A" else if (i <= 200) "B" else "C"
      (i, d, 10L)
    }.toDF("id", "domain", "toks")
    val out = Preprocessing.mixtureSample(df, "id", "domain", "toks",
      Map("A" -> 0.5, "B" -> 2.0), budget = 1000L)
    val byDom = out.groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(byDom.getOrElse("C", 0L) === 0L)       // absent from weights
    assert(byDom("B") === 100L)                   // rate 2.0 caps at keep-all
    // A's keep set must equal the straight hash-threshold predicate
    // (rate 0.5 -> thr = floor(0.5 * 2^53))
    val expectA = df.filter(col("domain") === "A")
      .filter(shiftrightunsigned(xxhash64(col("id")), 11) <
        lit(4503599627370496L))
      .select("id").as[Long].collect().toSet
    val gotA = out.filter(col("domain") === "A").select("id")
      .as[Long].collect().toSet
    assert(gotA === expectA)
    assert(expectA.nonEmpty && expectA.size < 100)
  }

  test("mixtureSample: partition-independent and idempotent") {
    val df = (1L to 500L).map(i => (i, s"d${i % 3}", 5L)).toDF("id", "domain", "toks")
    val w = Map("d0" -> 0.4, "d1" -> 0.1)
    def ids(in: org.apache.spark.sql.DataFrame) =
      Preprocessing.mixtureSample(in, "id", "domain", "toks", w, 300L)
        .select("id").as[Long].collect().toSet
    val a = ids(df.repartition(1))
    val b = ids(df.repartition(17, col("id")))
    assert(a === b)
    assert(ids(df) === a) // re-run: same keep set
  }

  test("mixtureSample plan: corpus side joins broadcast, no sort-merge join") {
    val df = (1L to 200L).map(i => (i, s"d${i % 2}", 5L)).toDF("id", "domain", "toks")
    val plan = Preprocessing.mixtureSample(df, "id", "domain", "toks",
      Map("d0" -> 0.5, "d1" -> 0.5), 100L).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join:\n$plan")
  }
}
