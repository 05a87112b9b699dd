package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.parse.{Drain, DrainConfig, DrainTree, MinedCluster}
import graft.sources.Transcripts

/** Drain two-phase miner vs a single-threaded oracle (SURVEY.md §5.2.2):
  * the oracle runs the SAME two phases (sequential tree, then canonical
  * merge), so Spark-vs-oracle equality is well-defined despite the
  * reference's order-dependence (Drain.py:270-273).
  */
class DrainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val cfg = DrainConfig(depth = 4, st = 0.4, maxChild = 100)

  /** Single-threaded oracle: sequential Drain over all texts, then the same
    * canonical merge used by the distributed path.
    */
  def oracleMine(texts: Seq[String]): Vector[graft.parse.TemplateEntry] = {
    val tree = new DrainTree(cfg)
    texts.foreach(t => tree.insert(Drain.tokenize(t, cfg.scrub)))
    Drain.mergePartials(tree.clusters, cfg)
  }

  def syntheticTexts(n: Int): Seq[String] = {
    val rng = new scala.util.Random(7)
    (0 until n).map { i =>
      rng.nextInt(4) match {
        case 0 => s"request ${rng.nextInt(1000)} handled in ${rng.nextInt(500)} ms"
        case 1 => s"tool ${rng.nextInt(9)} returned status code ${rng.nextInt(5)}"
        case 2 => s"worker ${rng.nextInt(30)} flushed ${rng.nextInt(9999)} bytes to disk segment ${rng.nextInt(9)}"
        case _ => s"session opened by user ${rng.nextInt(100)}"
      }
    }
  }

  test("md5_8 matches the reference id scheme (md5 hex prefix 8)") {
    // hashlib.md5('user <*> clicked element <*>').hexdigest()[:8]
    assert(Drain.md5_8("user <*> clicked element <*>") === "9aaad093")
    assert(Drain.md5_8("") === "d41d8cd9")
  }

  test("distributed mine == single-threaded oracle on synthetic corpus") {
    import spark.implicits._
    val texts = syntheticTexts(2000)
    val df = texts.toDF("text").repartition(8)
    val mined = Drain.mine(df, "text", cfg)
    val oracle = oracleMine(texts)
    assert(mined === oracle)
    assert(mined.map(_.occurrences).sum === 2000L)
  }

  test("mine is invariant to partitioning (2 vs 16 partitions)") {
    import spark.implicits._
    val texts = syntheticTexts(1500)
    val a = Drain.mine(texts.toDF("text").repartition(2), "text", cfg)
    val b = Drain.mine(texts.toDF("text").repartition(16), "text", cfg)
    assert(a === b)
  }

  test("templates converge to digit-masked text and match phase-b assigns them") {
    import spark.implicits._
    val texts = syntheticTexts(1000)
    val df = texts.toDF("text")
    val (parsed, dict) = Drain.parse(df, "text", cfg)
    val expected = texts.map(_.replaceAll("[0-9]+", "<*>")).distinct.sorted
    assert(dict.map(_.event_template).sorted === expected.toVector)
    val rows = parsed.select("text", "event_template").collect()
    rows.foreach { r =>
      assert(r.getString(1) === r.getString(0).replaceAll("[0-9]+", "<*>"))
    }
  }

  test("parameter extraction inverts template instantiation (property, 200 seeded cases)") {
    val rng = new scala.util.Random(11)
    (1 to 200).foreach { _ =>
      val ws = (1 to 1 + rng.nextInt(5)).map(_ =>
        (1 to 1 + rng.nextInt(6)).map(_ => ('a' + rng.nextInt(26)).toChar).mkString)
      val ps = (1 to 3).map(_ => rng.nextInt(100000))
      val template = s"${ws.mkString(" ")} <*> did <*> then <*>"
      val text     = s"${ws.mkString(" ")} ${ps(0)} did ${ps(1)} then ${ps(2)}"
      val m = Drain.parameterPattern(template).matcher(text)
      assert(m.matches(), s"no match: $template vs $text")
      assert((1 to 3).map(m.group) === ps.map(_.toString))
    }
  }

  test("merge folds identical templates and sums occurrences") {
    val partials = Seq(
      MinedCluster(Vector("job", "<*>", "done"), 10),
      MinedCluster(Vector("job", "7", "done"), 3),
      MinedCluster(Vector("job", "<*>", "done"), 5))
    val merged = Drain.mergePartials(partials, cfg)
    assert(merged.size === 1)
    assert(merged.head.event_template === "job <*> done")
    assert(merged.head.occurrences === 18L)
  }

  test("matcher falls back to digit-masked tokens for unknown shapes") {
    val m = new Drain.Matcher(Seq(graft.parse.TemplateEntry("x", "alpha beta", 1)), cfg)
    val (_, tpl) = m.matchText("never seen 42 before today at all")
    assert(tpl === "never seen <*> before today at all")
  }

  test("deeper tree (depth=5) still matches the single-threaded oracle") {
    import spark.implicits._
    val deep = DrainConfig(depth = 5, st = 0.5, maxChild = 100)
    val texts = syntheticTexts(1200)
    val mined = Drain.mine(texts.toDF("text").repartition(6), "text", deep)
    val tree = new DrainTree(deep)
    texts.foreach(t => tree.insert(Drain.tokenize(t, Nil)))
    assert(mined === Drain.mergePartials(tree.clusters, deep))
  }

  test("maxChild cap: token fan-out beyond the cap falls into the <*> child (Drain.py:111-129)") {
    val cfg3 = DrainConfig(depth = 4, st = 0.5, maxChild = 3)
    val tree = new DrainTree(cfg3)
    // same length, distinct non-digit first tokens exceed maxChild
    Seq("aa x", "bb x", "cc x", "dd x", "ee x").foreach(t =>
      tree.insert(Drain.tokenize(t, Nil)))
    val cl = tree.clusters
    assert(cl.map(_.count).sum === 5)
    // overflow tokens merged under the wildcard child → fewer clusters than lines
    assert(cl.size < 5, s"maxChild cap did not bound fan-out: ${cl.map(_.tokens)}")
  }

  test("scrub regexes are applied before tokenization (P3)") {
    val cfg2 = DrainConfig(depth = 4, st = 0.4,
      scrub = Seq("""\d+\.\d+\.\d+\.\d+""", """blk_-?\d+"""))
    assert(Drain.tokenize("got blk_-123 from 10.2.3.44 ok", cfg2.scrub) ===
      Vector("got", "<*>", "from", "<*>", "ok"))
  }

  test("stress: adversarial aliased corpus — conservation, determinism, total match") {
    // 200 shapes sharing prefixes ("svc <dc> verb noun <id> tags…"): Drain's
    // order-dependence makes different-but-valid dictionaries possible here
    // (SURVEY.md §7.3.1) — what the design DOES guarantee, and this test
    // pins, is (a) occurrence conservation, (b) rerun determinism of the
    // whole two-phase parse under fixed partitioning, (c) every row gets a
    // deterministic template (dictionary hit or pinned fallback).
    import spark.implicits._
    val rng = new scala.util.Random(99)
    val shapes = (0 until 200).map { t =>
      val verb  = Vector("started", "stopped", "flushed", "retried", "scaled")(t % 5)
      val noun  = Vector("shard", "segment", "worker", "queue", "lease")(t / 5 % 5)
      val extra = (0 until t % 4).map(j => s"tag$j").mkString(" ")
      (i: Int) => s"svc ${i % 7} $verb $noun ${i % 1000} $extra".trim
    }
    val texts = (0 until 40000).map(i => shapes(rng.nextInt(200))(rng.nextInt(100000)))
    val df = texts.toDF("text").repartition(16).cache()
    val mined  = Drain.mine(df, "text", cfg)
    val mined2 = Drain.mine(df, "text", cfg)
    assert(mined === mined2, "mine not deterministic for fixed partitioning")
    assert(mined.map(_.occurrences).sum === 40000L)
    val a1 = Drain.matchTemplates(df, "text", mined, cfg)
      .groupBy("event_template").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val a2 = Drain.matchTemplates(df, "text", mined, cfg)
      .groupBy("event_template").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a1 === a2, "match phase not deterministic")
    assert(a1.values.sum === 40000L, "match phase dropped rows")
    df.unpersist()
  }

  test("id-only match == struct match ids, row-for-row (parseIds twin of parse)") {
    // the id-only parse (graft_drain_match_id / matchId) must assign the
    // SAME event_id as the (id, template) struct parse on every row —
    // dictionary hits, unmatched digit-mask fallbacks, and null text — so
    // query bodies that never read event_template can take the id-only
    // plan without changing results.
    import spark.implicits._
    val rows = Seq(
      (1L, "user 17 clicked element 4"),      // dictionary shape
      (2L, "user 9 viewed page 3 for 7 seconds"),
      (3L, "weird singleton shape 42 zz"),    // unmatched: digit-mask fallback
      (4L, "another 8 oddity"),
      (5L, null.asInstanceOf[String]))        // null text -> null id on both
    val df = rows.toDF("rid", "text")
    val dict = Drain.mine(
      df.filter(org.apache.spark.sql.functions.col("text").isNotNull), "text", cfg)
    def ids(out: org.apache.spark.sql.DataFrame) =
      out.select("rid", "event_id").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val structIds = ids(Drain.matchTemplates(df, "text", dict, cfg))
    val idOnly    = ids(Drain.matchEventIds(df, "text", dict, cfg))
    assert(idOnly === structIds)
    assert(idOnly(5L).isEmpty)
    // and through the full parse twins on real derived transcripts
    val t = Transcripts.fromEvents(spark, "/root/testdata/sf0.001")
    val (p1, d1) = Drain.parse(t, "text", cfg)
    val (p2, d2) = Drain.parseIds(t, "text", cfg)
    assert(d1 === d2)
    val k1 = p1.select("conv_id", "turn_idx", "event_id").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getString(2)).toMap
    val k2 = p2.select("conv_id", "turn_idx", "event_id").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(k1 === k2)
  }

  test("full parse on the events-derived transcripts yields the 5 expected templates") {
    val t = Transcripts.fromEvents(spark, "/root/testdata/sf0.001")
    val dict = Drain.mine(t, "text", cfg)
    assert(dict.map(_.event_template).toSet === Set(
      "user <*> clicked element <*>",
      "new signup from user <*> region <*>",
      "user <*> viewed page <*> for <*> seconds",
      "user <*> purchased item <*> at price <*> credits",
      "error <*> for user <*> at stage <*> retry limit"))
    assert(dict.map(_.occurrences).sum === 1000L)
  }
}
