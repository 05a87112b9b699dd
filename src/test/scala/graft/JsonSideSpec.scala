package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.JsonSide
import java.nio.file.{Files, Paths}

/** F10 — JSON side inputs: file readers with explicit schemas and
  * from_json/to_json column round-trips (the reference's json label dicts
  * and embedding maps, hdfs_data_process.py:29-30, sample.py:13-16).
  */
class JsonSideSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("labelDict reads a JSON-lines label file; digit-only keys stay strings") {
    val dir = Files.createTempDirectory("graft-json").toString
    Files.writeString(Paths.get(s"$dir/labels.json"),
      """{"key": "0042", "label": 1}
        |{"key": "blk_-99", "label": 0}
        |{"key": "c7", "label": 1}
        |""".stripMargin)
    val d = JsonSide.labelDict(spark, s"$dir/labels.json")
    val m = d.as[(String, Int)].collect().toMap
    assert(m === Map("0042" -> 1, "blk_-99" -> 0, "c7" -> 1))
    assert(d.schema("key").dataType === org.apache.spark.sql.types.StringType)
    // J1 shape: broadcast-joinable onto an event stream
    val events = Seq(("0042", 1), ("c7", 2), ("missing", 3)).toDF("key", "turn")
    val joined = events.join(broadcast(d), Seq("key"), "left")
      .select(col("turn"), coalesce(col("label"), lit(0)).as("label"))
      .as[(Int, Int)].collect().toSet
    assert(joined === Set((1, 1), (2, 1), (3, 0)))
  }

  test("embeddingDict reads key→vector JSON lines") {
    val dir = Files.createTempDirectory("graft-json").toString
    Files.writeString(Paths.get(s"$dir/vecs.json"),
      """{"key": "e1", "vector": [0.5, -1.0, 2.0]}
        |{"key": "e2", "vector": [1.0, 0.0, 0.0]}
        |""".stripMargin)
    val d = JsonSide.embeddingDict(spark, s"$dir/vecs.json")
    val m = d.as[(String, Seq[Double])].collect().toMap
    assert(m("e1") === Seq(0.5, -1.0, 2.0) && m("e2") === Seq(1.0, 0.0, 0.0))
  }

  test("explodeLabelMap: JSON object column → (key, label) rows") {
    val df = Seq("""{"a": 1, "b": 0}""", """{"c": 1}""").toDF("js")
    val out = JsonSide.explodeLabelMap(df, col("js"))
      .as[(String, Int)].collect().toSet
    assert(out === Set(("a", 1), ("b", 0), ("c", 1)))
  }

  test("to_json / from_json struct round-trip preserves typed fields") {
    val df = Seq(("c1", 7), ("c2", 0)).toDF("conv", "label")
    val rt = df.select(to_json(struct(col("conv"), col("label"))).as("js"))
      .select(JsonSide.parseStruct(col("js"), "conv STRING, label INT").as("p"))
      .select("p.conv", "p.label").as[(String, Int)].collect().toSet
    assert(rt === Set(("c1", 7), ("c2", 0)))
  }
}
