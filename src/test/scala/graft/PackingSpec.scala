package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.agg.Packing

/** Greedy budget packing: hand-computed assignments, exact-fit and
  * oversized-document edges, shard reset, partition invariance.
  */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pack(rows: Seq[(String, Long, Long)], budget: Long, parts: Int = 1) =
    Packing.packBudget(rows.toDF("shard", "id", "tokens").repartition(parts),
        "shard", "id", "tokens", budget)
      .as[(String, Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap

  test("hand-computed: boundaries, oversized doc, shard reset") {
    val rows = Seq(
      ("a", 1L, 100L), ("a", 2L, 200L), ("a", 3L, 150L), ("a", 4L, 400L), ("a", 5L, 50L),
      ("b", 1L, 500L), // oversized: own pack
      ("b", 2L, 100L))
    assert(pack(rows, 400) === Map(
      ("a", 1L) -> 0, ("a", 2L) -> 0,  // 100+200=300 fits
      ("a", 3L) -> 1,                  // 300+150 > 400
      ("a", 4L) -> 2,                  // 150+400 > 400
      ("a", 5L) -> 3,                  // 400+50 > 400
      ("b", 1L) -> 0,                  // new shard resets; oversized alone
      ("b", 2L) -> 1))
  }

  test("exact budget fit stays in the pack; zero-token docs always fit") {
    val rows = Seq(("s", 1L, 250L), ("s", 2L, 150L), ("s", 3L, 0L), ("s", 4L, 100L))
    // 250+150 = 400 == budget (not >) -> same pack; +0 still 400 -> same; +100 -> new
    assert(pack(rows, 400) === Map(
      ("s", 1L) -> 0, ("s", 2L) -> 0, ("s", 3L) -> 0, ("s", 4L) -> 1))
  }

  test("plan shape: exactly ONE exchange (the shard repartition), streaming scan after") {
    val df = (0 until 100).map(i => (s"s${i % 3}", i.toLong, 10L))
      .toDF("shard", "id", "tokens").repartition(4)
    val plan = Packing.packBudget(df, "shard", "id", "tokens", 100)
      .queryExecution.executedPlan.toString
    // the input repartition(4) is below the shard exchange; the operator
    // itself must add exactly one hash exchange on __sh and nothing else
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected one hash exchange:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"),
      s"unexpected heavyweight operator:\n$plan")
  }

  test("fails LOUDLY when one shard exceeds maxDocsPerShard (silent serialization guard)") {
    // constant shard key: every doc lands in one task — the pathological case
    val rows = (0 until 50).map(i => ("hot", i.toLong, 10L))
      .toDF("shard", "id", "tokens")
    val ex = intercept[Exception] {
      Packing.packBudget(rows, "shard", "id", "tokens", budget = 100,
        maxDocsPerShard = 20).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("maxDocsPerShard")),
      s"expected the guard to name itself, got: ${messages(ex)}")
    // a raised cap admits the same shard, packing unchanged
    val ok = Packing.packBudget(rows, "shard", "id", "tokens", budget = 100,
      maxDocsPerShard = 50).collect()
    assert(ok.length === 50)
  }

  test("partition invariance: 1 vs 16 input partitions") {
    val rng = new scala.util.Random(23)
    val rows = (0 until 2000).map(i =>
      (s"sh${i % 9}", i.toLong, rng.nextInt(300).toLong))
    assert(pack(rows, 512, parts = 1) === pack(rows, 512, parts = 16))
  }

  test("globalRunningSum: exclusive prefix matches driver fold; LongType enforced") {
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(7)
    val rows = (1L to 1000L).map(i => (i, rng.nextInt(50).toLong))
    val df = rows.toDF("id", "v").repartition(17, col("id"))
    val (out, total) = graft.util.Rank.globalRunningSum(df, Seq(col("id")), "v", "t0")
    assert(total === rows.map(_._2).sum)
    val got = out.select("id", "t0").as[(Long, Long)].collect().toMap
    var acc = 0L
    rows.sortBy(_._1).foreach { case (id, v) => assert(got(id) === acc); acc += v }
    val bad = rows.toDF("id", "v").withColumn("v", col("v").cast("int"))
    assertThrows[IllegalArgumentException] {
      graft.util.Rank.globalRunningSum(bad, Seq(col("id")), "v", "t0")
    }
  }

  test("concatChunks: exact tiling, boundary-crossing docs, zero-token dropout") {
    // stream: 10 + 100 + 54 + 0 + 36 tokens, chunkLen 64
    val docs = Seq((1L, 10L), (2L, 100L), (3L, 54L), (4L, 0L), (5L, 36L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.concatChunks(docs, "doc_id", "n_tokens", chunkLen = 64L)
      .as[(Long, Long, Long, Long, Long)].collect()  // chunk_id, doc_id, doc_off, chunk_off, len
      .sortBy(r => (r._1, r._4))
    assert(!out.exists(_._2 == 4L)) // zero-token doc dropped
    // every chunk except the last is exactly full; chunk positions tile [0, 64)
    val byChunk = out.groupBy(_._1)
    val lastChunk = byChunk.keys.max
    byChunk.foreach { case (cid, rows) =>
      val lens = rows.sortBy(_._4)
      // contributions tile contiguously from offset 0
      var pos = 0L
      lens.foreach { r => assert(r._4 === pos, s"chunk $cid gap at $r"); pos += r._5 }
      if (cid != lastChunk) assert(pos === 64L) else assert(pos === (10L + 100 + 54 + 36) % 64)
    }
    // per-doc: contributions reconstruct the doc contiguously
    out.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      var pos = 0L
      sorted.foreach { r => assert(r._3 === pos); pos += r._5 }
      assert(pos === Map(1L -> 10L, 2L -> 100L, 3L -> 54L, 5L -> 36L)(sorted.head._2))
    }
    // doc 2 (100 tokens starting at offset 10) must span chunks 0..1
    assert(out.filter(_._2 == 2L).map(_._1).toSeq === Seq(0L, 1L))
    // partition invariance
    val out2 = Packing.concatChunks(docs.repartition(7), "doc_id", "n_tokens", 64L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out2 === out.toSet)
  }

  test("slidingTextChunks: exact windows with overlap, short tail, empty drop, coverage") {
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 tokens
      (2L, "a b"),                            // one short chunk
      (3L, "   ")                             // zero tokens -> nothing
    ).toDF("doc_id", "text")
    val got = Packing.slidingTextChunks(docs, "doc_id", "text",
        chunkSize = 4, stride = 3)
      .as[(Long, Int, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got === Array(
      (1L, 0, "t0 t1 t2 t3", 4L),
      (1L, 1, "t3 t4 t5 t6", 4L),
      (1L, 2, "t6 t7 t8 t9", 4L),
      (1L, 3, "t9", 1L),
      (2L, 0, "a b", 2L)))
    // every token of doc 1 appears in at least one chunk
    val covered = got.filter(_._1 == 1L).flatMap(_._3.split(" ")).toSet
    assert(covered === (0 until 10).map(i => s"t$i").toSet)
  }
}
