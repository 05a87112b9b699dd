package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.agg.Features
import graft.enrich.Enrich

class FeaturesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def parsed = {
    val rng = new scala.util.Random(3)
    (0 until 500).map { i =>
      val conv = s"c${i % 20}"
      // hot key skew: event h gets ~70% of rows
      val e = if (rng.nextInt(10) < 7) "h" else s"e${rng.nextInt(5)}"
      (conv, i, e)
    }.toDF("conv_id", "turn_idx", "event_id").repartition(7)
  }

  test("saltedCount == plain groupBy count (salting is count-preserving)") {
    val p = parsed
    val salted = Features.saltedCount(p, "event_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = p.groupBy("event_id").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("count-vector sums equal group sizes (conservation)") {
    val p = parsed
    val cv = Features.countVectors(p, Seq("conv_id"))
    val sums = cv.groupBy("conv_id").agg(sum("cnt").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = p.groupBy("conv_id").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums === sizes)
  }

  test("tfidf: idf = ln(N/df), weight = cnt*idf (loglizer/preprocessing.py:96-99)") {
    val cv = Seq(("g1", "a", 2L), ("g1", "b", 1L), ("g2", "a", 3L))
      .toDF("conv_id", "event_id", "cnt")
    val w = Features.tfidf(cv, Seq("conv_id"))
      .select("conv_id", "event_id", "tfidf")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(w(("g1", "a")) - 2 * math.log(2.0 / 2)) < 1e-12)
    assert(math.abs(w(("g1", "b")) - 1 * math.log(2.0 / 1)) < 1e-12)
    assert(math.abs(w(("g2", "a")) - 3 * math.log(2.0 / 2)) < 1e-12)
  }

  test("vocab: frequency desc then name asc, contiguous 1-based ids") {
    val v = Seq("b", "b", "a", "a", "c").toDF("event_id")
    val ids = Features.vocab(v).collect()
      .map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(ids === Map("a" -> 1, "b" -> 2, "c" -> 3)) // a and b tie → alpha
  }

  test("reconcileLabels: conflicting duplicate sequences → min(label)") {
    val g = Seq(
      ("s1", Seq("a", "b"), 1), ("s2", Seq("a", "b"), 0), ("s3", Seq("c"), 1)
    ).toDF("conv_id", "events", "label")
    val r = Features.reconcileLabels(g)
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(r("a b") === ((0, 2L)))
    assert(r("c") === ((1, 1L)))
  }

  test("confusion matrix counts all four quadrants") {
    val df = Seq((1, 1), (1, 0), (0, 0), (0, 0), (0, 1)).toDF("pred", "truth")
    val r = Features.confusion(df, "pred", "truth").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === ((1L, 1L, 2L, 1L)))
  }

  test("topKMembership flags events outside the top-k candidate set") {
    val h = (Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq("z")).toDF("next_event")
    val r = Features.topKMembership(h, k = 2)
    assert(r.filter(col("is_anomaly") === 1).count() === 1L)
    assert(r.filter(col("is_anomaly") === 1).select("next_event").as[String].head() === "z")
  }

  test("topKRank: per-row score-array rank with (score desc, index asc) tie-break") {
    // scores [5,3,5,1]: index 1 ranks 1 (ties broken by index), index 3 ranks 2,
    // index 2 ranks 3, index 4 ranks 4 (predict.py:99-111 semantics)
    val df = Seq(1, 2, 3, 4).toDF("true_label")
      .withColumn("scores", typedLit(Seq(5, 3, 5, 1)))
    val out = graft.agg.Features.topKRank(df, "scores", "true_label", k = 2)
      .select("true_label", "rank", "is_anomaly")
      .as[(Int, Int, Int)].collect().toSet
    assert(out === Set((1, 1, 0), (3, 2, 0), (2, 3, 1), (4, 4, 1)))
  }

  test("topKRank property: matches brute-force argsort rank on 200 random score arrays") {
    val rng = new scala.util.Random(31)
    val cases = (0 until 200).map { _ =>
      val n = rng.nextInt(12) + 1
      (Seq.fill(n)(rng.nextInt(6)), rng.nextInt(n) + 1) // small range → ties common
    }
    val df = cases.toDF("scores", "true_label")
    val got = graft.agg.Features.topKRank(df, "scores", "true_label", k = 3)
      .select("scores", "true_label", "rank").as[(Seq[Int], Int, Int)].collect()
    got.foreach { case (scores, lbl, rank) =>
      val order = scores.zipWithIndex
        .sortBy { case (s, i) => (-s, i) }.map(_._2 + 1) // (score desc, index asc)
      assert(rank === order.indexOf(lbl) + 1, s"scores=$scores lbl=$lbl")
    }
  }

  test("template/meta/embedding enrich joins (J2/J3/role-tool) defaults and row counts") {
    val rows = Seq(("e1", "user", "search"), ("e2", "tool", null))
      .toDF("event_id", "role", "tool")
    // J2: template dict join
    val dict = Seq(("e1", "user <*> did <*>", 10L)).toDF("event_id", "event_template", "occurrences")
    val j2 = Enrich.templates(rows, dict)
    assert(j2.count() === 2)
    assert(j2.filter(col("event_id") === "e2").select("event_template").head().isNullAt(0))
    // role/tool meta join (null-safe on the tool column requires exact match)
    val meta = Seq(("user", "search", "web", 0)).toDF("role", "tool", "route_hint", "is_flagged")
    val m = Enrich.roleToolMeta(rows, meta)
    assert(m.count() === 2)
    assert(m.filter(col("event_id") === "e1").select("route_hint").as[String].head() === "web")
    // J3: embedding join with [-1]*dim default on miss (sample.py:106-108)
    val vecs = Seq(("e1", Seq(0.5f, 0.5f))).toDF("event_id", "vector")
    val j3 = Enrich.embeddings(rows, vecs, dim = 2)
    val missVec = j3.filter(col("event_id") === "e2").select("vector").as[Seq[Float]].head()
    assert(missVec === Seq(-1.0f, -1.0f))
    // J5: dense ids, unknown → 0
    val vocab = Seq(("e1", 7L, 1)).toDF("event_id", "freq", "vocab_id")
    val j5 = Enrich.denseIds(rows, vocab)
    assert(j5.filter(col("event_id") === "e1").select("vocab_id").as[Int].head() === 1)
    assert(j5.filter(col("event_id") === "e2").select("vocab_id").as[Int].head() === 0)
  }

  test("broadcast enrich joins preserve row count and default on miss") {
    val t = Seq(("c1", 0), ("c1", 1), ("c2", 0)).toDF("conv_id", "turn_idx")
    val labels = Seq(("c1", 1)).toDF("conv_id", "label")
    val e = Enrich.convLabels(t, labels)
    assert(e.count() === 3L)
    assert(e.filter(col("conv_id") === "c2").select("label").as[Int].head() === 0)
  }
}
