package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Streaming
import graft.parse.{Drain, DrainConfig}
import graft.sources.Transcripts
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** The batch windowing logic must produce the same aggregates when run under
  * Structured Streaming (file source, AvailableNow trigger = one replay).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming windowed event counts == batch result on a replayed file source") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val t = Transcripts.synthetic(spark, 200, seed = 42L, partitions = 4)
    t.write.mode("overwrite").parquet(s"$dir/in")
    val cfg  = DrainConfig(4, 0.4)
    val dict = Drain.mine(spark.read.parquet(s"$dir/in"), "text", cfg)

    // batch reference: same window(ts, ...) aggregate
    val batch = Drain.matchTemplates(spark.read.parquet(s"$dir/in"), "text", dict, cfg)
      .groupBy(window(col("ts"), "300 seconds", "60 seconds"), col("event_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("event_id"), col("cnt"))
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap

    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema)
      .parquet(s"$dir/in")
    val q = Streaming.windowedEventCounts(stream, dict, cfg,
        "300 seconds", "60 seconds", "10 minutes")
      .writeStream
      .format("memory").queryName("win_counts")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("win_counts")
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(got === batch)
  }

  test("streaming routed sink: fan-out conservation + per-batch metrics") {
    val dir = Files.createTempDirectory("graft-stream-route").toString
    val t = Transcripts.synthetic(spark, 100, seed = 11L, partitions = 3)
    t.write.mode("overwrite").parquet(s"$dir/in")
    val total = t.count()
    val cfg  = graft.parse.DrainConfig(4, 0.4)
    val dict = graft.parse.Drain.mine(spark.read.parquet(s"$dir/in"), "text", cfg)

    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema)
      .parquet(s"$dir/in")
    val routed = graft.parse.Drain.matchEventIds(stream, "text", dict, cfg)
      .select("conv_id", "turn_idx", "event_id")
    val q = graft.streaming.Streaming.routedSink(routed, "event_id", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val back = spark.read.parquet(s"$dir/out/data")
    assert(back.count() === total)
    assert(back.groupBy("event_id").count().count() === dict.size.toLong)
    // per-batch metrics sidecars sum to the input count
    val metricRows = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/out"))
      .iterator().asScala.filter(_.getFileName.toString.startsWith("_metrics_batch_"))
      .flatMap(p => """"rows":(\d+)""".r.findAllMatchIn(
        new String(java.nio.file.Files.readAllBytes(p))).map(_.group(1).toLong))
      .sum
    assert(metricRows === total)
  }

  test("streaming exact dedup == batch digest dedup (watermark-bounded state)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-dedup").toString
    val rows = (0 until 300).map { i =>
      (s"doc body ${i % 60}", new java.sql.Timestamp(1700000000000L + i * 1000L))
    }
    rows.toDF("text", "ts").repartition(4).write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema).parquet(s"$dir/in")
    val q = graft.streaming.Streaming.dedupStream(stream, "text", "10 minutes")
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() === 60L) // one row per distinct text
    assert(out.select("text_md5").distinct().count() === 60L)
  }

  test("routed sink: replaying a micro-batch is idempotent (data + sidecar)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-replay").toString
    val batch = Seq(("e1", 1), ("e1", 2), ("e2", 3)).toDF("event_id", "v")
    graft.streaming.Streaming.writeRoutedBatch(batch, "event_id", dir, batchId = 0L)
    val firstCount = spark.read.parquet(s"$dir/data").count()
    // failure/restart re-delivery of the SAME batch id must replace, not append
    graft.streaming.Streaming.writeRoutedBatch(batch, "event_id", dir, batchId = 0L)
    assert(spark.read.parquet(s"$dir/data").count() === firstCount)
    // a NEW batch id appends alongside
    graft.streaming.Streaming.writeRoutedBatch(batch.limit(1), "event_id", dir, batchId = 1L)
    assert(spark.read.parquet(s"$dir/data").count() === firstCount + 1)
    val m0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_metrics_batch_0.json")))
    assert("""\"rows\":(\d+)""".r.findAllMatchIn(m0).map(_.group(1).toLong).sum === 3L)
  }

  test("streaming anchor sessionization == batch anchorSessions") {
    val dir = Files.createTempDirectory("graft-stream2").toString
    val t = Transcripts.synthetic(spark, 50, seed = 7L, partitions = 2)
    t.write.mode("overwrite").parquet(s"$dir/in")

    val batch = graft.windows.Windows.anchorSessions(
        spark.read.parquet(s"$dir/in"), gapSec = 300)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap

    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema)
      .parquet(s"$dir/in")
      .select(col("conv_id"), col("turn_idx"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      .as[Streaming.TurnEvent]
    val q = Streaming.anchorSessionIds(stream, gapSec = 300)
      .writeStream.format("memory").queryName("anchor_sessions")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("anchor_sessions")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(got === batch)
  }

  test("streaming anchor sessions: one giant conversation in a single batch stays correct") {
    // 200k turns of ONE conversation delivered in one micro-batch: the
    // primitive-array buffer path (no row-object Seq, no boxed sort) must
    // still match the batch twin exactly
    import spark.implicits._
    val n = 200000
    val dir = Files.createTempDirectory("graft-stream-big").toString
    val rows = spark.range(n.toLong).select(
      lit("cBIG").as("conv_id"), col("id").cast("int").as("turn_idx"),
      // 1ms between turns (block of 1000 spans 1s << gap); a 301s jump at
      // every multiple of 1000 → session_idx = turn_idx / 1000 exactly
      (col("id") * 1000L +
        expr("id DIV 1000") * 301000000L).as("ts_us"))
    rows.repartition(2).write.mode("overwrite").parquet(s"$dir/in")

    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema)
      .parquet(s"$dir/in")
      .as[Streaming.TurnEvent]
    val q = Streaming.anchorSessionIds(stream, gapSec = 300)
      .writeStream.format("memory").queryName("anchor_big")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    val got = spark.table("anchor_big")
      .collect().map(r => (r.getInt(1), r.getInt(2))).toMap
    assert(got.size === n)
    // expected: session_idx = turn_idx / 1000 (each jump exceeds the gap)
    assert(got(0) === 0)
    assert(got(999) === 0)
    assert(got(1000) === 1)
    assert(got(n - 1) === (n - 1) / 1000)
  }

  test("streaming anchor sessions: NEGATIVE turn indices keep turn order (packed-key regression)") {
    // the packed (turn_idx << 32 | pos) sort key sign-extends, so negative
    // indices must sort BEFORE non-negative ones; a sign-bit-flip "fix"
    // would reverse that — this pins the correct behavior end-to-end.
    // Session boundary: ts jumps by >gap exactly at turn_idx 0, so the
    // negative turns are session 0 and the rest session 1 IFF order is right.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-neg").toString
    val rows = Seq(
      ("cN", 2, 302000000L + 2000L), ("cN", -3, 0L), ("cN", 0, 302000000L),
      ("cN", -1, 2000L), ("cN", 1, 302000000L + 1000L), ("cN", -2, 1000L))
      .toDF("conv_id", "turn_idx", "ts_us")
    rows.coalesce(1).write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema)
      .parquet(s"$dir/in").as[Streaming.TurnEvent]
    val q = Streaming.anchorSessionIds(stream, gapSec = 300)
      .writeStream.format("memory").queryName("anchor_neg")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("anchor_neg")
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    assert(got === Map(-3 -> 0, -2 -> 0, -1 -> 0, 0 -> 1, 1 -> 1, 2 -> 1))
  }

  test("streaming anchor sessions: adversarially small micro-batches (maxFilesPerTrigger=1)") {
    // the documented trigger-sizing knob: each micro-batch carries only a
    // slice of every conversation, so the cross-batch AnchorState handoff is
    // exercised ~10x per conversation; result must equal the batch twin.
    // Slices are TURN-RANGE files written in arrival order (the operator's
    // input contract: a source may split a conversation across any number of
    // micro-batches, but must deliver its turns in order ACROSS them —
    // within a batch any order is fine, the primitive sort handles it)
    val dir = Files.createTempDirectory("graft-stream-tiny").toString
    val t = Transcripts.synthetic(spark, 40, seed = 11L, partitions = 2)
      .cache()
    val maxIdx = t.agg(max(col("turn_idx"))).collect()(0).getInt(0)
    val step = math.max(maxIdx / 10 + 1, 1)
    (0 to maxIdx / step).foreach { k =>
      t.filter(col("turn_idx") >= k * step && col("turn_idx") < (k + 1) * step)
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
      Thread.sleep(25) // distinct modTimes pin the file-source batch order
    }
    t.unpersist()

    val batch = graft.windows.Windows.anchorSessions(
        spark.read.parquet(s"$dir/in"), gapSec = 300)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap

    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/in")
      .select(col("conv_id"), col("turn_idx"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      .as[Streaming.TurnEvent]
    val q = Streaming.anchorSessionIds(stream, gapSec = 300)
      .writeStream.format("memory").queryName("anchor_tiny")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)

    val got = spark.table("anchor_tiny")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(got === batch)
  }

  test("streaming anchor sessions: RECORD-bounded micro-batches (rate source, maxOffsetsPerTrigger analog)") {
    // The Scaladoc's second trigger-sizing knob: Kafka-style feeds bound a
    // trigger by RECORD COUNT, not files. rate-micro-batch emits exactly
    // rowsPerBatch records per trigger — the deterministic stand-in for
    // maxOffsetsPerTrigger — so conversations are sliced mid-batch at
    // arbitrary record boundaries; the cross-batch AnchorState handoff must
    // still reproduce the batch twin over every fully-committed prefix.
    val rowsPerBatch = 500
    val nConvs = 8
    // value -> turn event: conv = value % 8, turn = value / 8 (monotone per
    // conv across batches = the operator's cross-batch ordering contract,
    // exactly how per-key Kafka partitions deliver); ts walks 100 s per turn
    // so the 300 s anchor gap rolls sessions continually
    def mapped(df: org.apache.spark.sql.DataFrame) = df
      .select(concat(lit("c"), col("value") % nConvs).as("conv_id"),
        (col("value") / nConvs).cast("int").as("turn_idx"),
        ((col("value") / nConvs).cast("long") * 100000000L).as("ts_us"))

    val stream = mapped(spark.readStream
        .format("rate-micro-batch")
        .option("rowsPerBatch", rowsPerBatch)
        .option("numPartitions", 2)
        .load())
      .as[Streaming.TurnEvent]
    val q = Streaming.anchorSessionIds(stream, gapSec = 300)
      .writeStream.format("memory").queryName("anchor_rate")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 120000
      while (spark.table("anchor_rate").count() < 3L * rowsPerBatch &&
             System.currentTimeMillis() < deadline) Thread.sleep(200)
    } finally q.stop()
    val table = spark.table("anchor_rate")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(table.size >= 3 * rowsPerBatch, s"only ${table.size} rows committed")

    // compare the first 3 complete batches (values 0..1499) against the
    // batch twin over the same prefix — prefix-closed because per-conv turn
    // order follows value order
    val n = 3 * rowsPerBatch
    val got = table.filter { case ((c, turn), _) =>
      turn.toLong * nConvs + c.stripPrefix("c").toInt < n
    }
    val batchDf = mapped(spark.range(n).toDF("value"))
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    val expected = graft.windows.Windows.anchorSessions(batchDf, gapSec = 300)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(got === expected)
  }
}
