package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.agg.{Features, Preprocessing}
import graft.sources.RawLogs
import java.nio.file.{Files, Paths}

class MoreFeaturesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("leadTime: first anomalous position per session") {
    val df = Seq(
      ("s1", 0, 0), ("s1", 1, 1), ("s1", 2, 1),
      ("s2", 0, 0), ("s2", 1, 0)
    ).toDF("session", "pos", "anom")
    val lt = Features.leadTime(df, "session", "pos", "anom")
      .collect().map(r => r.getString(0) -> (Option(r.get(1)), r.getInt(2))).toMap
    assert(lt("s1") === ((Some(1), 1)))
    assert(lt("s2") === ((None, 0)))
  }

  test("alignToTrainEvents folds unseen events into __oov__, conserving counts") {
    val test  = Seq(("g1", "a", 3L), ("g1", "new", 2L), ("g2", "b", 1L))
      .toDF("conv_id", "event_id", "cnt")
    val train = Seq("a", "b").toDF("event_id")
    val out = Features.alignToTrainEvents(test, train, Seq("conv_id"))
    val m = out.collect().map(r => (r.getString(1), r.getString(0)) -> r.getLong(2)).toMap
    assert(m(("a", "g1")) === 3L)
    assert(m(("__oov__", "g1")) === 2L)
    assert(out.agg(sum("cnt")).as[Long].head() === 6L)
  }

  test("anomalyRate + qualityFilter") {
    val df = Seq(1, 0, 0, 1, 0).toDF("label")
    val r = Features.anomalyRate(df, "label").head()
    assert(r.getLong(0) === 5L && r.getLong(1) === 2L && math.abs(r.getDouble(2) - 0.4) < 1e-12)
    val (good, bad) = Features.qualityFilter(df, col("label") === 0)
    assert(good.count() === 3L && bad === 2L)
  }

  test("templateEmbeddings: tf-idf weighted sum of token vectors") {
    val templates = Seq(
      ("e1", "alpha beta"),
      ("e2", "alpha gamma")).toDF("event_id", "event_template")
    val vecs = Seq(
      ("alpha", Seq(1.0f, 0.0f)),
      ("beta", Seq(0.0f, 2.0f)),
      ("gamma", Seq(0.0f, 4.0f))).toDF("word", "vector")
    val out = Preprocessing.templateEmbeddings(templates, vecs)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // idf(alpha) = ln(2/2) = 0 → contributes nothing; idf(beta|gamma) = ln 2
    assert(math.abs(out(("e1", 1))) < 1e-12)
    assert(math.abs(out(("e1", 2)) - 2.0 * math.log(2)) < 1e-12)
    assert(math.abs(out(("e2", 2)) - 4.0 * math.log(2)) < 1e-12)
  }

  test("sessionsByExtractedId: rows mentioning k ids land in k sessions (G1)") {
    val df = Seq(
      (0, "e1", "move blk_1 to blk_2"),
      (1, "e2", "delete blk_1"),
      (2, "e3", "compact blk_2 blk_2") // duplicate mention counted once
    ).toDF("turn_idx", "event_id", "text")
    val out = graft.windows.Windows.sessionsByExtractedId(df, "blk_[0-9]+")
      .collect().map(r => r.getString(0) -> (r.getSeq[String](1), r.getLong(2))).toMap
    assert(out("blk_1") === ((Seq("e1", "e2"), 2L)))
    assert(out("blk_2") === ((Seq("e1", "e3"), 2L)))
  }

  test("readVecFile parses fastText-style .vec with header (S11)") {
    val dir = Files.createTempDirectory("graft-vec")
    Files.writeString(Paths.get(s"$dir/w.vec"),
      "2 3\nhello 0.1 0.2 0.3\nworld 1 2 3\n")
    val df = RawLogs.readVecFile(spark, s"$dir/w.vec")
    val m = df.collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(m("hello") === Seq(0.1f, 0.2f, 0.3f))
    assert(m("world") === Seq(1f, 2f, 3f))
    assert(!m.contains("2"))
  }

  test("dropHeaderTokens removes the first k tokens (P7)") {
    val out = Seq("a  b c d").toDF("line")
      .select(RawLogs.dropHeaderTokens(col("line"), 2)).as[String].head()
    assert(out === "c d")
  }

  test("RawLogs reads and splits a log file by log_format, dropping bad lines") {
    val dir = Files.createTempDirectory("graft-rawlogs")
    Files.writeString(Paths.get(s"$dir/a.log"),
      """2024-01-01 10:00:01 INFO dfs.DataNode: Receiving block blk_1
        |garbage line
        |2024-01-01 10:00:02 WARN dfs.FSNamesystem: BLOCK* ask 1.2.3.4 to delete blk_2
        |""".stripMargin)
    val df = RawLogs.read(spark, s"$dir/a.log", "<Date> <Time> <Level> <Component>: <Content>")
    val rows = df.orderBy("Time").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("Level") === "INFO")
    assert(rows(1).getAs[String]("Content") === "BLOCK* ask 1.2.3.4 to delete blk_2")
  }
}
