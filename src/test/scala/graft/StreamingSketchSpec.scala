package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.agg.Sketches
import java.nio.file.Files

/** The mergeable sketches are streaming-native: the SAME
  * [[Sketches.kmvSketchBy]] / [[Sketches.cmsSketchBy]] transforms run under
  * `readStream`, with streaming-aggregation state per group being EXACTLY
  * the bounded buffer (k longs / d·w longs) — not the stream history. The
  * micro-batch boundary drives the same TypedImperativeAggregate
  * serialize/merge path the batch shuffle does, so batch ≡ stream is the
  * merge law exercised through the state store.
  */
class StreamingSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeSliced(dir: String): Unit = {
    val rng = new scala.util.Random(91)
    val rows = (0 until 3000).map { i =>
      (s"g${i % 4}", s"v${(rng.nextGaussian().abs * 300).toInt}")
    }
    // 6 files -> maxFilesPerTrigger=1 slices the stream into 6 micro-batches
    rows.toDF("g", "v").repartition(6).write.mode("overwrite").parquet(dir)
  }

  test("streaming KMV sketch across 6 micro-batches == one-pass batch sketch; state rows == groups") {
    val dir = Files.createTempDirectory("graft-stream-kmv").toString
    writeSliced(s"$dir/in")
    val all = spark.read.parquet(s"$dir/in")
    val batch = Sketches.kmvSketchBy(all, Seq("g"), "v", k = 32)
      .as[(String, Seq[Long])].collect().toMap

    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val q = Sketches.kmvSketchBy(stream, Seq("g"), "v", k = 32)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("kmv_stream")
      .as[(String, Seq[Long])].collect().toMap
    assert(got === batch)
    // state is per-GROUP buffers, never per-row history
    val st = q.lastProgress.stateOperators
    assert(st.nonEmpty && st.head.numRowsTotal === 4L,
      s"expected 4 state rows (one bounded buffer per group): ${q.lastProgress}")
  }

  test("streaming CMS grid across 6 micro-batches == one-pass batch grid") {
    val dir = Files.createTempDirectory("graft-stream-cms").toString
    writeSliced(s"$dir/in")
    val all = spark.read.parquet(s"$dir/in")
    val D = 4; val W = 32
    val batch = Sketches.cmsCells(
        Sketches.cmsSketchBy(all, Seq("g"), "v", D, W), Seq("g"), D, W)
      .as[(String, Int, Int, Long)].collect().toSet

    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val q = Sketches.cmsSketchBy(stream, Seq("g"), "v", D, W)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = Sketches.cmsCells(spark.table("cms_stream"), Seq("g"), D, W)
      .as[(String, Int, Int, Long)].collect().toSet
    assert(got === batch)
  }
}
