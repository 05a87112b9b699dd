package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis
import graft.multimodal.Multimodal
import graft.parse.LogFormat

class TextMultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("langId picks the marker-dominant language, alpha tie-break") {
    val df = Seq(
      (1L, "the cat of the house is to blame"),
      (2L, "el que la los y es aqui"),
      (3L, "xyzzy plugh")).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "en")
    assert(got(2L) === "es")
    assert(got(3L) === "de") // all-zero scores → alphabetical first
  }

  test("quality features: ratios bounded, score in [0,1]") {
    val df = Seq((1L, "the quick brown fox JUMPS over 42 lazy dogs!!")).toDF("id", "text")
    val r = TextAnalysis.qualityFeatures(df, "text").head()
    val score = r.getAs[Double]("quality_score")
    assert(score >= 0.0 && score <= 1.0)
    assert(r.getAs[Double]("alpha_ratio") < 1.0)
    assert(r.getAs[Int]("n_tokens") === 9)
  }

  test("fingerprint is whitespace/case-insensitive; rolling min stable") {
    val df = Seq(
      (1L, "Hello   World Foo Bar Baz"),
      (2L, "hello world foo bar baz")).toDF("id", "text")
    val fps = df.select(TextAnalysis.fingerprint(col("text"))).as[String].collect()
    assert(fps(0) === fps(1))
    val rolls = df.select(TextAnalysis.rollingMinFingerprint(col("text"), 8))
      .as[String].collect()
    assert(rolls(0) === rolls(1))
  }

  test("multimodal: stub decode is deterministic, schema typed, batched") {
    val docs = Seq((1L, "some image bytes here"), (2L, "other payload")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(Multimodal.asMedia(docs, "doc_id", "text"))
      .collect().sortBy(_.doc_id)
    assert(feats.length === 2)
    assert(feats(0).byte_len === "some image bytes here".length)
    assert(Set("image", "audio", "video").contains(feats(0).kind))
    assert(feats(0).width >= 0 && feats(0).width < 1920)
    assert(feats(0).height >= 0 && feats(0).height < 1080)
    // deterministic: second run identical
    val again = Multimodal.extractFeatures(Multimodal.asMedia(docs, "doc_id", "text"))
      .collect().sortBy(_.doc_id)
    assert(feats.toSeq === again.toSeq)
  }

  test("frame sampling: n evenly spaced frames per media row, deterministic digests") {
    val docs = Seq((1L, "a video payload of sorts")).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, 4).collect().sortBy(_.frame_idx)
    assert(frames.length === 4)
    assert(frames.head.offset_ms === 0)
    assert(frames.map(_.offset_ms).toSeq === frames.map(_.offset_ms).toSeq.sorted)
    assert(frames.map(_.frame_digest).distinct.length === 4) // offset-keyed
    val again = Multimodal.sampleFrames(media, 4).collect().sortBy(_.frame_idx)
    assert(frames.toSeq === again.toSeq)
  }

  test("decoder seam: a custom MediaDecoder drops into the same plumbing") {
    // a fake "real" decoder: fixed dimensions, offset-string frame keys —
    // extractFeatures/sampleFrames must route every decode through it
    object FixedDecoder extends Multimodal.MediaDecoder {
      override def decode(bytes: Array[Byte]) =
        Multimodal.Decoded(640, 480, 5000, s"len=${bytes.length}")
      override def frameDigest(bytes: Array[Byte], offsetMs: Int) = s"frame@$offsetMs"
    }
    val docs = Seq((1L, "payload one"), (2L, "payload two!")).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(media, FixedDecoder).collect().sortBy(_.doc_id)
    assert(feats.map(f => (f.width, f.height, f.duration_ms)).toSet === Set((640, 480, 5000)))
    assert(feats(0).digest === "len=11")
    val frames = Multimodal.sampleFrames(media, 3, FixedDecoder)
      .filter(_.doc_id == 1L).collect().sortBy(_.frame_idx)
    assert(frames.map(_.offset_ms).toSeq === Seq(0, 2500, 5000))
    assert(frames.map(_.frame_digest).toSeq === Seq("frame@0", "frame@2500", "frame@5000"))
  }

  test("resize plan preserves aspect ratio from decoded dimensions") {
    val docs = Seq((1L, "an image payload")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(Multimodal.asMedia(docs, "doc_id", "text"))
    val f = feats.head()
    val (_, w, h) = Multimodal.resizePlan(feats, 640).head()
    assert(w === 640)
    assert(math.abs(h.toDouble / 640 - f.height.toDouble / math.max(1, f.width)) < 0.01)
  }

  test("logFormat compiler splits headers like the reference (Drain.py:319-334)") {
    val fmt = LogFormat.compile("<Date> <Time> <Pid> <Level> <Component>: <Content>")
    assert(fmt.headers === Seq("Date", "Time", "Pid", "Level", "Component", "Content"))
    val df = Seq(
      "2024-01-01 10:00:01 123 INFO dfs.DataNode: Receiving block blk_1 src: /1.2.3.4",
      "malformed line without enough fields maybe::: ok"
    ).toDF("value")
    val out = LogFormat.split(df, "value", fmt)
    val rows = out.collect()
    assert(rows.length >= 1)
    val r = out.filter(col("Date") === "2024-01-01").head()
    assert(r.getAs[String]("Component") === "dfs.DataNode")
    assert(r.getAs[String]("Content") === "Receiving block blk_1 src: /1.2.3.4")
    assert(r.getAs[String]("Pid") === "123")
  }
}
