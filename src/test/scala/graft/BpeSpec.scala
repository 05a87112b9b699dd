package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Bpe

/** BPE: the rank-order kernel vs an independent CANONICAL implementation
  * (merge the lowest-rank adjacent pair present, repeat — the GPT-2 encode
  * loop), hand-computed encodes, fixture validity, and the doc-level
  * dictionary-join path vs direct per-word encoding.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference: canonical BPE encode, written independently of the kernel. */
  private def canonical(word: String): Vector[String] = {
    val rank = Bpe.merges.zipWithIndex.map { case ((l, r), i) => (l, r) -> i }.toMap
    var toks = word.map(_.toString).toVector
    var done = word.isEmpty
    while (!done) {
      val best = toks.indices.dropRight(1)
        .flatMap(i => rank.get((toks(i), toks(i + 1))).map(r => (r, toks(i), toks(i + 1))))
        .sortBy(_._1).headOption
      best match {
        case None => done = true
        case Some((_, l, r)) =>
          val out = Vector.newBuilder[String]; var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) { out += l + r; i += 2 }
            else { out += toks(i); i += 1 }
          }
          toks = out.result()
      }
    }
    toks
  }

  test("hand-computed encodes") {
    assert(Bpe.encodeWord("the").toSeq === Seq("the"))
    assert(Bpe.encodeWord("scan").toSeq === Seq("scan"))
    assert(Bpe.encodeWord("order").toSeq === Seq("ord", "er"))
    assert(Bpe.encodeWord("window").toSeq === Seq("win", "d", "o", "w"))
    assert(Bpe.encodeWord("batch").toSeq === Seq("bat", "c", "h"))
    assert(Bpe.encodeWord("x").toSeq === Seq("x"))
    assert(Bpe.encodeWord("").toSeq === Seq.empty)
    // chars outside the merge table stay single
    assert(Bpe.encodeWord("zzz").toSeq === Seq("z", "z", "z"))
  }

  test("rank-order kernel == canonical min-rank encode (corpus vocab + random)") {
    val vocab = Seq("the", "fast", "key", "order", "sort", "table", "scan", "merge",
      "part", "window", "small", "hash", "join", "batch", "stream", "spark", "dup",
      "group", "query", "row", "data", "slow", "filter", "customer", "line", "value",
      "agg", "column", "big", "vector", "a")
    vocab.foreach { w =>
      assert(Bpe.encodeWord(w).toVector === canonical(w), s"word '$w'")
    }
    val rng = new scala.util.Random(42)
    (0 until 1000).foreach { _ =>
      val w = (0 until (1 + rng.nextInt(12))).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
      assert(Bpe.encodeWord(w).toVector === canonical(w), s"word '$w'")
    }
  }

  test("token concatenation reproduces the word (losslessness)") {
    val rng = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val w = (0 until (1 + rng.nextInt(15))).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
      assert(Bpe.encodeWord(w).mkString === w)
    }
  }

  test("doc-level dictionary-join path == direct per-word encode; empty doc dropped") {
    val docs = Seq(
      (1L, "the fast scan of the order table"),
      (2L, "window window batch"),
      (3L, "   ")).toDF("doc_id", "text")
    val out = Bpe.bpeTokenize(docs, "doc_id", "text")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    def direct(t: String) = {
      val toks = t.trim.split("\\s+").filter(_.nonEmpty).flatMap(Bpe.encodeWord)
      (toks.length.toLong, toks.mkString(" "))
    }
    assert(out === Map(
      1L -> direct("the fast scan of the order table"),
      2L -> direct("window window batch")))
  }

  test("partition invariance: 1 vs 16 partitions") {
    val rng = new scala.util.Random(11)
    val words = Vector("the", "scan", "order", "window", "batch", "query", "zz")
    val docs = (0L until 200L).map(i =>
      (i, (0 until (1 + rng.nextInt(20))).map(_ => words(rng.nextInt(words.size))).mkString(" ")))
    def run(parts: Int) =
      Bpe.bpeTokenize(docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text")
        .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(run(1) === run(16))
  }

  private def train(texts: Seq[String], nMerges: Int, minPairCount: Long = 2L) =
    Bpe.trainMerges(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), "text", nMerges, minPairCount = minPairCount)
      .as[(Int, String, String)].collect().sortBy(_._1).toVector

  test("training: hand-computed greedy merges with early stop") {
    // pairs: (a,b) x3, (c,d) x2 → merge ab then cd; afterwards every word
    // is a single token → loop stops at 2 of the requested 5 merges
    val out = train(Seq("ab ab cd", "ab cd"), nMerges = 5)
    assert(out === Vector((0, "a", "b"), (1, "c", "d")))
  }

  test("training: count ties break by (left, right) ascending") {
    // (b,a) and (d,c) both occur twice → lexicographically smaller left wins
    val out = train(Seq("ba dc", "ba dc"), nMerges = 2)
    assert(out === Vector((0, "b", "a"), (1, "d", "c")))
  }

  test("training: left == right pairs are skipped (fixture invariant holds " +
       "by construction)") {
    val out = train(Seq("aa aa aa bc", "bc aa"), nMerges = 3, minPairCount = 1L)
    assert(out.forall { case (_, l, r) => l != r })
    assert(out.exists { case (_, l, r) => l == "b" && r == "c" })
    // every learned table satisfies the pinned-fixture creation-order rule
    out.zipWithIndex.foreach { case ((_, l, r), i) =>
      def formed(t: String): Boolean =
        t.length == 1 || out.take(i).exists { case (_, a, b) => a + b == t }
      assert(formed(l) && formed(r), s"merge $i ($l,$r) breaks creation order")
    }
  }

  test("training: multi-level merges compose (learned token as a merge side) " +
       "and applying them compresses the training words") {
    // (t,h) and (h,e) both count 16 → tie breaks to (h,e); step 1 then
    // merges (t,he) — a LEARNED token as the right-hand side
    val texts = Seq.fill(4)("the the then there")
    val out = train(texts, nMerges = 4)
    assert(out.take(2) === Vector((0, "h", "e"), (1, "t", "he")))
    // apply learned merges in rank order; training words must compress
    val words = Seq("the", "then", "there")
    words.foreach { w =>
      var toks = w.map(_.toString).toArray
      out.foreach { case (_, l, r) => toks = Bpe.mergeOnce(toks, l, r) }
      assert(toks.length < w.length, s"$w did not compress: ${toks.toSeq}")
    }
  }

  test("training: partition invariance (word counting is the only " +
       "distributed stage)") {
    val rng = new scala.util.Random(7)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docs = (0L until 100L).map(i =>
      (i, (0 until (1 + rng.nextInt(15))).map(_ => words(rng.nextInt(words.size))).mkString(" ")))
    def run(parts: Int) =
      Bpe.trainMerges(docs.toDF("doc_id", "text").repartition(parts), "text", 12)
        .as[(Int, String, String)].collect().sortBy(_._1).toVector
    assert(run(1) === run(16))
  }
}
