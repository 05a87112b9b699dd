package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.Bm25

/** BM25: driver-side recomputation of the pinned formula on a hand corpus,
  * inverted-index semantics (no shared term -> no row), rank/kept
  * exactness, partition invariance, and the plan shape (broadcast query
  * probe, distributed rank — no Window node).
  */
class Bm25Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "x x y"),
    (2L, "x z"),
    (3L, "y"),
    (4L, ""), // empty: counts toward N and avgdl, matches nothing
    (5L, "x y z z")).toDF("doc_id", "text")

  /** The pinned formula, recomputed independently in plain Scala. */
  private def expected(q: String, k: Long): Map[(String, Long), (Long, Long)] = {
    val corpus = Map(
      1L -> Seq("x", "x", "y"), 2L -> Seq("x", "z"),
      3L -> Seq("y"), 4L -> Seq.empty[String], 5L -> Seq("x", "y", "z", "z"))
    val n = corpus.size.toLong
    val avgdl = corpus.values.map(_.size).sum.toDouble / n.toDouble
    val dfm = corpus.values.flatMap(_.distinct).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val terms = q.trim.split("\\s+").filter(_.nonEmpty).distinct
    val scores = corpus.toSeq.flatMap { case (id, toks) =>
      val tfm = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val perTerm = terms.flatMap { t =>
        tfm.get(t).map { tf =>
          val df = dfm(t)
          val idf = math.log(((n - df).toDouble + 0.5) / (df.toDouble + 0.5) + 1.0)
          val tfpart = (tf.toDouble * (Bm25.k1 + 1.0)) /
            (tf.toDouble + Bm25.k1 * ((1.0 - Bm25.b) + Bm25.b * (toks.size.toDouble / avgdl)))
          math.round(idf * tfpart * 1e6)
        }
      }
      if (perTerm.isEmpty) None else Some(id -> (perTerm.length.toLong, perTerm.sum))
    }
    scores.sortBy { case (id, (_, s)) => (-s, id) }.zipWithIndex.map {
      case ((id, (nt, s)), i) => ("q", id) -> (s, (i + 1).toLong)
    }.toMap
  }

  test("scores, ranks and kept match the driver-side pinned formula") {
    val got = Bm25.topK(docs, "doc_id", "text", Seq("q" -> "x y"), k = 2L)
      .as[(String, Long, Long, Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> (r._4, r._5, r._6)).toMap
    val exp = expected("x y", 2L)
    assert(got.keySet === exp.keySet)
    exp.foreach { case (key, (s, rk)) =>
      val (gs, grk, gkept) = got(key)
      assert(gs === s, s"score for $key")
      assert(grk === rk, s"rank for $key")
      assert(gkept === (if (rk <= 2) 1 else 0), s"kept for $key")
    }
    // doc 4 (empty) and docs without x/y never appear
    assert(!got.keySet.exists(_._2 == 4L))
  }

  test("query term multiplicity is ignored; absent terms contribute nothing") {
    val once = Bm25.topK(docs, "doc_id", "text", Seq("q" -> "x y"), 3L)
      .as[(String, Long, Long, Long, Long, Int)].collect().toSet
    val dup = Bm25.topK(docs, "doc_id", "text", Seq("q" -> "x x y zeppelin"), 3L)
      .as[(String, Long, Long, Long, Long, Int)].collect().toSet
    assert(once === dup)
  }

  test("per-query ranks are independent permutations (multi-query)") {
    val qs = Seq("a" -> "x", "b" -> "z y")
    val got = Bm25.topK(docs, "doc_id", "text", qs, 10L)
      .as[(String, Long, Long, Long, Long, Int)].collect()
    qs.map(_._1).foreach { qid =>
      val ranks = got.filter(_._1 == qid).map(_._5).sorted
      assert(ranks === (1L to ranks.length).toArray.toSeq, s"query $qid")
    }
  }

  test("partition invariance: 1 vs 7 partitions") {
    def run(n: Int) = Bm25.topK(docs.repartition(n), "doc_id", "text",
      Seq("q" -> "x y z"), 2L)
      .as[(String, Long, Long, Long, Long, Int)].collect().toSet
    assert(run(1) === run(7))
  }

  test("plan: broadcast query probe, no Window node") {
    val plan = Bm25.topK(docs, "doc_id", "text", Seq("q" -> "x y"), 2L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"per-query window crept in (one task per query at scale):\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"expected the query-term broadcast probe:\n$plan")
  }
}
