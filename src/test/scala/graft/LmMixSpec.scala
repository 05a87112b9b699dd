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

  test("pplBuckets: exact terciles per language, deterministic tie-break, no Window node") {
    // 6 en docs + 3 fr docs with controlled scores: doc text "a b" (seen
    // bigram, best) vs "b x" (backoff, worst) vs mixes in between
    val corpus = Seq("a b a b a c", "b a").toDF("text")
    val docs = Seq(
      (1L, "a b a b", "en"),  // two strong bigrams
      (2L, "a b", "en"),
      (3L, "a b b x", "en"),
      (4L, "a b b x", "en"),  // identical text -> tie broken by id
      (5L, "b x", "en"),
      (6L, "x y", "en"),
      (10L, "a b", "fr"), (11L, "x a", "fr"), (12L, "x y", "fr")
    ).toDF("id", "text", "lang")
    val out = LmScore.pplBuckets(docs, corpus, "id", "text", "lang")
    val got = out.select("id", "lang", "lang_rank", "bucket")
      .as[(Long, String, Long, String)].collect().map(r => r._1 -> r).toMap
    // en ranks: each lang's ranks are a 1..n permutation
    assert(got.values.filter(_._2 == "en").map(_._3).toSet === (1L to 6L).toSet)
    assert(got.values.filter(_._2 == "fr").map(_._3).toSet === (1L to 3L).toSet)
    // terciles: 6 en docs -> 2 head, 2 middle, 2 tail; 3 fr -> 1 each
    val enBuckets = got.values.filter(_._2 == "en").groupBy(_._4).view.mapValues(_.size).toMap
    assert(enBuckets === Map("head" -> 2, "middle" -> 2, "tail" -> 2))
    val frBuckets = got.values.filter(_._2 == "fr").groupBy(_._4).view.mapValues(_.size).toMap
    assert(frBuckets === Map("head" -> 1, "middle" -> 1, "tail" -> 1))
    // docs 3 and 4 have identical bigram multisets -> identical scores;
    // the id tie-break must put 3 before 4
    assert(got(3L)._3 + 1 === got(4L)._3)
    // fr ordering: seen bigram > backoff-with-seen-unigram > backoff-unseen
    assert(got(10L)._4 === "head" && got(11L)._4 === "middle" && got(12L)._4 === "tail")
    // scale shape: the rank must NOT come from a window operator
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "pplBuckets must use the distributed rank, not a per-language window")
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

  test("stratifiedExactN: exact min(n,|group|) per group, prefix property, ranks a permutation") {
    // group sizes straddle n: g0 has 40, g1 has 10, g2 has 3
    val df = ((1L to 40L).map(i => (i, "g0")) ++
      (101L to 110L).map(i => (i, "g1")) ++
      (201L to 203L).map(i => (i, "g2"))).toDF("id", "g")
    def run(n: Long) = Preprocessing.stratifiedExactN(df, "g", "id", n)
      .select("g", "id", "smp_rank").as[(String, Long, Long)].collect()
    val got = run(15L)
    val bySize = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(bySize === Map("g0" -> 15, "g1" -> 10, "g2" -> 3))
    // ranks are 1..k within each group
    got.groupBy(_._1).foreach { case (g, xs) =>
      assert(xs.map(_._3).sorted.toSeq === (1L to xs.length).toSeq, s"group $g")
    }
    // prefix property: the n=5 selection is the first 5 of the n=15 selection
    val small = run(5L).map(r => (r._1, r._2)).toSet
    val prefix = got.filter(_._3 <= 5L).map(r => (r._1, r._2)).toSet
    assert(small === prefix)
  }

  test("stratifiedExactN: partition-independent, re-runnable, no Window node") {
    val df = (1L to 300L).map(i => (i, s"g${i % 4}")).toDF("id", "g")
    def ids(in: org.apache.spark.sql.DataFrame) =
      Preprocessing.stratifiedExactN(in, "g", "id", 12L)
        .select("g", "id", "smp_rank").as[(String, Long, Long)].collect().toSet
    val a = ids(df.repartition(1))
    assert(a === ids(df.repartition(13, col("id"))))
    assert(a === ids(df)) // re-run: same selection
    val plan = Preprocessing.stratifiedExactN(df, "g", "id", 12L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"per-group window crept in (one task per group at scale):\n$plan")
  }

  test("mixtureUpsample: floor(rate)+gated epoch per row, composes with mixtureSample, loud guard") {
    val df = Seq(
      (1L, "a", 1L), (2L, "a", 1L), (3L, "a", 1L), (4L, "a", 1L), // tot 4
      (10L, "b", 5L), (11L, "b", 5L),                             // tot 10
      (20L, "c", 7L)                                              // unweighted
    ).toDF("id", "d", "tok")
    val weights = Map("a" -> 1.0, "b" -> 0.6)
    // budget 10 → rate_a = 10/4 = 2.5 (upsample), rate_b = 6/10 = 0.6 (down)
    val out = Preprocessing.mixtureUpsample(df, "id", "d", "tok", weights, 10L)
      .select("id", "d", "epoch").as[(Long, String, Long)].collect()
    assert(!out.exists(_._2 == "c"), "unweighted domain must drop")
    val byId = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    (1L to 4L).foreach { id =>
      val e = byId(id)
      assert(e.length == 2 || e.length == 3, s"id $id epochs $e")
      assert(e === (0L until e.length.toLong), s"id $id epochs not 0..n-1: $e")
    }
    // fractional half lands somewhere: 4·2.5 = 10 expected, 8..12 possible
    assert(out.count(_._2 == "a") >= 8 && out.count(_._2 == "a") <= 12)
    byId.view.filterKeys(_ >= 10L).values.foreach(e => assert(e === Seq(0L)))
    // composition law: rate<1 epoch-0 selection == mixtureSample's keeps
    val ms = Preprocessing.mixtureSample(df.filter(col("d") === "b"),
        "id", "d", "tok", Map("b" -> 0.6), 10L)
      .select("id").as[Long].collect().toSet
    assert(byId.keySet.filter(_ >= 10L) === ms)
    // exact-integer rate: thr = 0, every row exactly rate epochs
    val exact = Preprocessing.mixtureUpsample(df, "id", "d", "tok",
        Map("a" -> 1.0), 8L) // rate_a = 2.0
      .select("id", "epoch").as[(Long, Long)].collect()
    assert(exact.groupBy(_._1).view.mapValues(_.length).toMap ===
      Map(1L -> 2, 2L -> 2, 3L -> 2, 4L -> 2))
    // partition independence
    val re = Preprocessing.mixtureUpsample(df.repartition(7, col("id")),
        "id", "d", "tok", weights, 10L)
      .select("id", "d", "epoch").as[(Long, String, Long)].collect()
    assert(re.sorted.toSeq === out.sorted.toSeq)
    // epoch blow-up fails loudly, not silently (prune-proof raise_error)
    val ex = intercept[Exception] {
      Preprocessing.mixtureUpsample(df, "id", "d", "tok",
        Map("a" -> 1.0), 10000L, maxEpochs = 100L).count()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("maxEpochs"))
  }

  test("mixtureUpsample plan: corpus side joins broadcast, no sort-merge join") {
    val df = (1L to 400L).map(i => (i, s"d${i % 3}", 2L)).toDF("id", "d", "tok")
    val plan = Preprocessing.mixtureUpsample(df, "id", "d", "tok",
        Map("d0" -> 1.0, "d1" -> 0.5), 300L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join:\n$plan")
  }

  test("splitByHash: total, content-stable under growth/partitioning, map-only") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val small = (1L to 2000L).toDF("id")
    val big   = (1L to 6000L).toDF("id")
    def assign(df: org.apache.spark.sql.DataFrame) =
      Preprocessing.splitByHash(df, "id", splits)
        .select("id", "split").as[(Long, String)].collect().toMap
    val a = assign(small)
    assert(a.size === 2000 && a.values.forall(Set("train", "val", "test")))
    // proportions land near the weights (hash-uniformity sanity)
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.75 && frac < 0.85, s"train fraction $frac")
    // growing the corpus NEVER moves an existing row between splits
    // (randomSplit fails exactly this), and partitioning is irrelevant
    val b = assign(big)
    assert(a.forall { case (id, s) => b(id) == s })
    assert(assign(small.repartition(17, col("id"))) === a)
    // map-only: no exchange anywhere in the plan
    val plan = Preprocessing.splitByHash(small, "id", splits)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"splitByHash must not shuffle:\n$plan")
  }

  test("kFoldByHash: total over 0..k-1, content-stable, agrees with splitByHash halves, map-only") {
    val df = (1L to 3000L).toDF("id")
    val folds = Preprocessing.kFoldByHash(df, "id", 5)
      .select("id", "fold").as[(Long, Int)].collect().toMap
    assert(folds.size === 3000 && folds.values.forall(f => f >= 0 && f < 5))
    // roughly uniform (hash-uniformity sanity)
    val counts = folds.values.groupBy(identity).view.mapValues(_.size)
    counts.values.foreach(c => assert(c > 450 && c < 750, s"fold sizes $counts"))
    // growth/partitioning never move a row
    val big = Preprocessing.kFoldByHash((1L to 9000L).toDF("id"), "id", 5)
      .select("id", "fold").as[(Long, Int)].collect().toMap
    assert(folds.forall { case (id, f) => big(id) == f })
    // k=2 fold boundary == splitByHash's 50/50 boundary (same hash domain)
    val two = Preprocessing.kFoldByHash(df, "id", 2)
      .select("id", "fold").as[(Long, Int)].collect().toMap
    val half = Preprocessing.splitByHash(df, "id",
        Seq("a" -> 0.5, "b" -> 0.5))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(two.forall { case (id, f) => (f == 0) == (half(id) == "a") })
    val plan = Preprocessing.kFoldByHash(df, "id", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"kFoldByHash must not shuffle:\n$plan")
  }

  test("splitBounds: boundaries partition the 2^53 hash domain in order") {
    val b = Preprocessing.splitBounds(Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
    assert(b === Seq((1L << 52), (1L << 52) + (1L << 51)))
    intercept[IllegalArgumentException] {
      Preprocessing.splitBounds(Seq("only" -> 1.0))
    }
  }
}
