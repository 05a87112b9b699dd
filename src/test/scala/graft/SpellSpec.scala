package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.{Spell, SpellTree, Drain}
import graft.sources.Transcripts

class SpellSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val tau = 0.5

  test("LCS backtrack matches the classic definition") {
    val t = new SpellTree(tau)
    assert(t.lcs(Vector("a", "b", "c", "d"), Vector("x", "b", "d")) === List("b", "d"))
    assert(t.lcs(Vector("a"), Vector("b")) === Nil)
    assert(t.lcs(Vector.empty, Vector("a")) === Nil)
  }

  test("Spell tokenization splits on punctuation minus <*> (Spell.py:234-238)") {
    assert(Spell.tokenize("a.b,c:d <*> e", Nil) === Vector("a", "b", "c", "d", "<*>", "e"))
    assert(Spell.tokenize("open(file=/tmp/x);", Nil) === Vector("open", "file", "tmp", "x"))
  }

  test("distributed Spell mine == single-threaded oracle on synthetic corpus") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val texts = (0 until 1500).map { _ =>
      rng.nextInt(3) match {
        case 0 => s"job ${rng.nextInt(100)} finished with code ${rng.nextInt(5)}"
        case 1 => s"node ${rng.nextInt(30)} heartbeat missed at epoch ${rng.nextInt(10000)} retrying soon"
        case _ => s"queue drained ${rng.nextInt(500)} messages"
      }
    }
    val mined = Spell.mine(texts.toDF("text").repartition(8), "text", tau)
    val oracleTree = new SpellTree(tau)
    texts.foreach(t => oracleTree.insert(Spell.tokenize(t, Nil)))
    val oracle = Spell.mergePartials(oracleTree.clusters, tau)
    assert(mined === oracle)
    assert(mined.map(_.occurrences).sum === 1500L)
  }

  test("Spell mine is invariant to partitioning (2 vs 16 partitions)") {
    // the LCS merge is the most order-sensitive miner: partition-local trees
    // see different row subsets, so only the canonical sorted merge keeps
    // the result partitioning-independent — pin it like DrainSpec does
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val texts = (0 until 1200).map { _ =>
      rng.nextInt(4) match {
        case 0 => s"job ${rng.nextInt(100)} finished with code ${rng.nextInt(5)}"
        case 1 => s"node ${rng.nextInt(30)} heartbeat missed at epoch ${rng.nextInt(10000)} retrying soon"
        case 2 => s"queue drained ${rng.nextInt(500)} messages"
        case _ => s"cache shard ${rng.nextInt(64)} evicted ${rng.nextInt(1000)} keys in ${rng.nextInt(90)} ms"
      }
    }
    val a = Spell.mine(texts.toDF("text").repartition(2), "text", tau)
    val b = Spell.mine(texts.toDF("text").repartition(16), "text", tau)
    assert(a === b)
  }

  test("Spell on events-derived transcripts converges to the 5 digit-masked templates") {
    val t = Transcripts.fromEvents(spark, "/root/testdata/sf0.001")
    val (parsed, dict) = Spell.parse(t, "text", tau)
    assert(dict.map(_.event_template).toSet === Set(
      "user <*> clicked element <*>",
      "new signup from user <*> region <*>",
      "user <*> viewed page <*> for <*> seconds",
      "user <*> purchased item <*> at price <*> credits",
      "error <*> for user <*> at stage <*> retry limit"))
    // per-row assignment agrees with the digit-scrub
    val rows = parsed.select("text", "event_template").collect()
    rows.foreach(r => assert(r.getString(1) === r.getString(0).replaceAll("[0-9]+", "<*>")))
    // and with Drain's ids (same md5 scheme)
    val drainDict = Drain.mine(t, "text", graft.parse.DrainConfig(4, 0.4))
    assert(dict.map(e => e.event_id -> e.occurrences).toMap ===
      drainDict.map(e => e.event_id -> e.occurrences).toMap)
  }

  test("Spell parameter extraction: non-alnum runs, punctuation strip, no-slot templates (Spell.py:328-338)") {
    import spark.implicits._
    val df = Seq(
      // surrounded tag normalized (spaces eaten), trailing tag kept; params
      // stripped of trailing punctuation
      ("send 123 to user 456.", "send <*> to user <*>"),
      // tag at string START (no leading \s → not normalized, still a group)
      ("worker7 done", "<*> done"),
      // template space matches ANY non-alphanumeric run in the text
      ("link--x 9", "link x <*>"),
      // no parameter slot → empty (Spell.py:330)
      ("no params here", "no params here"),
      // non-matching text → empty
      ("totally different", "send <*> to user <*>")
    ).toDF("text", "event_template")
    val out = Spell.extractParameters(df, "text", "event_template")
      .select("parameters").as[Seq[String]].collect()
    assert(out(0) === Seq("123", "456"))
    assert(out(1) === Seq("worker7"))
    assert(out(2) === Seq("9"))
    assert(out(3) === Seq.empty)
    assert(out(4) === Seq.empty)
  }
}
