package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.dedup.Dedup
import java.nio.file.Files

/** Exact dedup is streaming-native with NO variant code: [[Dedup.exact]] is
  * a pure aggregation (min-id representative + copy count per content
  * fingerprint), so the SAME transform runs under `readStream` and the
  * result is arrival-order-independent BY CONSTRUCTION — unlike streaming
  * `dropDuplicates`, whose keep-first-arrival answer depends on micro-batch
  * slicing. Streaming-aggregation state is one row per DISTINCT fingerprint
  * (the honest scale caveat: state ~ distinct corpus size — bound the key
  * space or window the stream for unbounded feeds).
  */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming exact dedup across 6 micro-batches == one-pass batch dedup") {
    val dir = Files.createTempDirectory("graft-stream-dedup").toString
    val rng = new scala.util.Random(53)
    // heavy duplication, duplicates deliberately scattered across slices
    val rows = (0 until 3000).map { i =>
      (i.toLong, s"doc text number ${rng.nextInt(200)}")
    }
    rows.toDF("id", "text").repartition(6)
      .write.mode("overwrite").parquet(s"$dir/in")
    val all = spark.read.parquet(s"$dir/in")
    val batch = Dedup.exact(all, "id", "text")
      .as[(String, Long, Long)].collect().toSet

    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val q = Dedup.exact(stream, "id", "text")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("dedup_stream")
      .as[(String, Long, Long)].collect().toSet
    assert(got === batch)
    assert(got.map(_._2).size === got.size, "rep ids are one per fingerprint")
    // state = one row per distinct fingerprint, never the row history
    val st = q.lastProgress.stateOperators
    assert(st.nonEmpty && st.head.numRowsTotal === batch.size.toLong,
      s"expected ${batch.size} state rows: ${q.lastProgress}")
  }
}
