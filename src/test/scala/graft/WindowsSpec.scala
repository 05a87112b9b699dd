package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.windows.Windows
import graft.sources.Transcripts

class WindowsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def turns(convLens: Map[String, Int]) = {
    val rows = convLens.toSeq.sortBy(_._1).flatMap { case (c, n) =>
      (0 until n).map(i => (c, i, s"e${i % 3}",
        new java.sql.Timestamp(1700000000000L + i * 1000L)))
    }
    rows.toDF("conv_id", "turn_idx", "event_id", "ts").repartition(5)
  }

  test("sessionGroup collects events in turn order regardless of partitioning") {
    val g = Windows.sessionGroup(turns(Map("a" -> 7, "b" -> 3)))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(g("a") === (0 until 7).map(i => s"e${i % 3}"))
    assert(g("b") === Seq("e0", "e1", "e2"))
  }

  test("sessionTail keeps the LAST n events (session.py:29-32 semantics)") {
    val t = Windows.sessionTail(Windows.sessionGroup(turns(Map("a" -> 7))), 4)
      .select("events").as[Seq[String]].head()
    assert(t === Seq("e0", "e1", "e2", "e0")) // turns 3,4,5,6 → e0 e1 e2 e0
  }

  test("fixedWindows tiling: every row covered exactly ceil(size/step) times (interior)") {
    val df = Windows.fixedWindows(turns(Map("a" -> 20)), size = 4, step = 2)
    val rows = df.select("win_start", "n").as[(Long, Long)].collect().toMap
    // interior windows full (n=4); starts are multiples of step
    assert(rows.keySet === (0 to 18 by 2).map(_.toLong).toSet)
    (0 to 16 by 2).foreach(s => assert(rows(s.toLong) === 4L))
    assert(rows(18L) === 2L) // tail window partially filled
    // conservation: sum of covered positions = rows × coverage – boundary deficit
    val total = rows.values.sum
    assert(total === df.select(sum(size(col("events")))).as[Long].head())
  }

  test("timeWindows buckets rows into sliding time spans") {
    // rows at t=0s..9s, window size 4s step 2s
    val df = turns(Map("a" -> 10))
    val w = Windows.timeWindows(df, sizeSec = 4, stepSec = 2)
    val m = w.select("win_start", "n").as[(Long, Long)].collect().toMap
    val t0 = 1700000000L
    // every full 4s span holds 4 rows (1 row/sec)
    assert(m(t0) === 4L); assert(m(t0 + 2) === 4L); assert(m(t0 + 4) === 4L)
    assert(m(t0 - 2) === 2L) // leading partial
    assert(m(t0 + 8) === 2L) // trailing partial
  }

  test("timeWindows: misaligned size/step (5s/2s) covers each row in every valid window") {
    val df = turns(Map("a" -> 12)) // rows at t0..t0+11, 1/sec
    val w = Windows.timeWindows(df, sizeSec = 5, stepSec = 2)
      .select("win_start", "n").as[(Long, Long)].collect().toMap
    val t0 = 1700000000L
    // brute-force oracle: for each step-multiple window, count covered rows
    val expected = (for {
      ws <- (t0 - 10) to (t0 + 20) if ws % 2 == 0
      n = (0 until 12).count(s => t0 + s >= ws && t0 + s < ws + 5) if n > 0
    } yield ws -> n.toLong).toMap
    assert(w === expected)
  }

  test("historyWindows emits trailing h-window + next event label") {
    val h = Windows.historyWindows(turns(Map("a" -> 6)), h = 3)
      .orderBy("turn_idx")
      .select("turn_idx", "history", "next_event")
      .as[(Int, Seq[String], String)].collect()
    assert(h.length === 3) // positions 2,3,4 (5 has no next)
    assert(h(0) === ((2, Seq("e0", "e1", "e2"), "e0")))
    assert(h(2) === ((4, Seq("e2", "e0", "e1"), "e2")))
  }

  test("deltaT: first turn of conversation forced to 0, others exact micros") {
    val d = Windows.deltaT(turns(Map("a" -> 3, "b" -> 2)))
      .select("conv_id", "turn_idx", "delta_us").as[(String, Int, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(d(("a", 0)) === 0L)
    assert(d(("a", 1)) === 1000000L)
    assert(d(("b", 0)) === 0L)
  }

  test("anchorSessions: anchor-based (not gap-based) segmentation") {
    // gaps: rows every 1s, gap bound 3s → sessions of 3 rows each from anchor
    val rows = Seq(0L, 1L, 2L, 3L, 4L, 7L).map(s =>
      ("c", s.toInt, new java.sql.Timestamp(1700000000000L + s * 1000L)))
    val df = rows.toDF("conv_id", "turn_idx", "ts")
    val got = Windows.anchorSessions(df, gapSec = 3)
      .orderBy("turn_idx").select("session_idx").as[Int].collect().toSeq
    // anchor at t=0 covers t<3 (rows 0,1,2); next anchor t=3 covers t<6 (3,4); then 7
    assert(got === Seq(0, 0, 0, 1, 1, 2))
  }

  test("timeWindowsGlobal: whole-log windows (no session key) match brute force") {
    val df = turns(Map("a" -> 10, "b" -> 7)) // two conversations, same clock
    val w = Windows.timeWindowsGlobal(df, sizeSec = 4, stepSec = 2)
      .select("win_start", "event_id", "cnt").as[(Long, String, Long)]
      .collect().toSet
    // brute force over ALL rows regardless of conv_id
    val raw = df.select((unix_micros(col("ts")) / 1000000L).cast("long"), col("event_id"))
      .as[(Long, String)].collect()
    val expected = raw.flatMap { case (sec, e) =>
      (0 until 2).map(k => ((sec / 2 - k) * 2, e, sec))
    }.filter { case (ws, _, sec) => sec >= ws && sec < ws + 4 }
      .groupBy { case (ws, e, _) => (ws, e) }
      .map { case ((ws, e), hits) => (ws, e, hits.length.toLong) }.toSet
    assert(w === expected)
    // rows from BOTH conversations share windows (the global semantics)
    val t0 = 1700000000L
    assert(w.collect { case (ws, "e0", c) if ws == t0 => c }.head ===
      raw.count { case (sec, e) => e == "e0" && sec >= t0 && sec < t0 + 4 })
  }

  test("anchorSessions streams a million-turn conversation (O(1) state, no per-group buffering)") {
    val df = spark.range(1000000).select(
      lit("mono").as("conv_id"),
      col("id").cast("int").as("turn_idx"),
      col("id").cast("timestamp").as("ts")) // 1 turn per second
    val out = Windows.anchorSessions(df, gapSec = 1000)
    // anchor advances every 1000 turns → session_idx = turn_idx / 1000
    assert(out.filter(col("session_idx") =!= floor(col("turn_idx") / 1000)).count() === 0L)
    assert(out.count() === 1000000L)
  }

  test("chunkBySize assigns floor(pos/n) chunk ids") {
    val c = Windows.chunkBySize(turns(Map("a" -> 7)), 3)
      .orderBy("turn_idx").select("chunk_id").as[Long].collect().toSeq
    assert(c === Seq(0, 0, 0, 1, 1, 1, 2))
  }

  test("positionalSplit cuts at the stable (conv_id, turn_idx) global order") {
    val s = Windows.positionalSplit(turns(Map("a" -> 6, "b" -> 4)), 0.7)
    assert(s.filter(col("split") === "train").count() === 7L)
    // first 7 in (conv_id, turn_idx) order: all of a (6) + b:0
    val trainB = s.filter(col("split") === "train" && col("conv_id") === "b")
      .select("turn_idx").as[Int].collect().toSeq
    assert(trainB === Seq(0))
  }

  test("synthetic transcripts generator is deterministic and heavy-tailed") {
    val a = Transcripts.synthetic(spark, 200, seed = 42L)
    val b = Transcripts.synthetic(spark, 200, seed = 42L)
    assert(a.count() === b.count())
    assert(a.exceptAll(b).isEmpty)
    val lens = a.groupBy("conv_id").count().select("count").as[Long].collect()
    assert(lens.max > 10 * (lens.sum / lens.length)) // heavy tail present
  }

  test("sftPairs: exact contexts oldest-first, frame cap, first-turn drop, partition invariance") {
    val t = Seq(
      ("c1", 0, "user", "hi"),
      ("c1", 1, "assistant", "hello"),
      ("c1", 2, "user", "do thing"),
      ("c1", 3, "tool", "result 7"),
      ("c1", 4, "assistant", "done"),
      ("c2", 0, "assistant", "orphan"), // no context -> dropped
      ("c2", 1, "user", "ok"),
      ("c2", 2, "assistant", "ack")
    ).toDF("conv_id", "turn_idx", "role", "text")
    def run(in: org.apache.spark.sql.DataFrame) =
      Windows.sftPairs(in, h = 2)
        .as[(String, Int, String, String)].collect().sortBy(r => (r._1, r._2))
    val got = run(t)
    assert(got === Array(
      ("c1", 1, "user: hi", "hello"),
      // h = 2 caps the frame: turn 4 sees turns 2..3 only, oldest first
      ("c1", 4, "user: do thing\ntool: result 7", "done"),
      ("c2", 2, "assistant: orphan\nuser: ok", "ack")))
    assert(run(t.repartition(7, col("turn_idx"))) === got)
  }

  test("sftRender: mask span addresses exactly the response characters") {
    val t = Seq(
      ("c1", 0, "user", "hi there"),
      ("c1", 1, "assistant", "hello world")
    ).toDF("conv_id", "turn_idx", "role", "text")
    val r = Windows.sftRender(Windows.sftPairs(t, h = 2))
      .select("rendered", "mask_start", "mask_len")
      .as[(String, Long, Long)].collect()
    assert(r.length === 1)
    val (rendered, start, len) = r.head
    assert(rendered === "user: hi there\nassistant: hello world")
    // the span extracts the response exactly (1-based substring)
    assert(rendered.substring(start.toInt - 1, start.toInt - 1 + len.toInt)
      === "hello world")
    assert(start.toInt - 1 + len.toInt === rendered.length,
      "response is the rendered suffix")
  }

  test("sftPairsBudget: maximal suffix under the token budget, exact boundaries, empty drop") {
    // rendered-turn token counts: 3, 4, 5, 2 (role prefix counts as a token)
    val t = Seq(
      ("c1", 0, "user", "a b"),
      ("c1", 1, "tool", "a b c"),
      ("c1", 2, "user", "a b c d"),
      ("c1", 3, "tool", "x"),
      ("c1", 4, "assistant", "done")
    ).toDF("conv_id", "turn_idx", "role", "text")
    def run(budget: Long) =
      Windows.sftPairsBudget(t, h = 4, budget = budget)
        .select("context", "ctx_turns", "ctx_tokens")
        .as[(String, Int, Long)].collect()
    assert(run(2L) === Array(("tool: x", 1, 2L)))
    assert(run(7L) === Array(("user: a b c d\ntool: x", 2, 7L))) // exact fit
    assert(run(8L) === Array(("user: a b c d\ntool: x", 2, 7L))) // 4 more won't fit
    val all = run(100L)
    assert(all === Array(
      ("user: a b\ntool: a b c\nuser: a b c d\ntool: x", 4, 14L)))
    assert(run(1L).isEmpty, "budget below the latest turn drops the pair")
    // h caps the frame before the budget does
    val capped = Windows.sftPairsBudget(t, h = 2, budget = 100L)
      .select("ctx_turns", "ctx_tokens").as[(Int, Long)].collect()
    assert(capped === Array((2, 7L)))
  }
}
