package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** ORC source/sink: lossless round-trip of the structured parse shape and —
  * the part that matters at scale — filter pushdown and column pruning
  * reaching the ORC scan exactly as they do on parquet (ORC is Spark's
  * second built-in columnar format; a user switching storage keeps the
  * same plan shape).
  */
class OrcRoundTripSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = (1 to 500).map { i =>
    (s"conv${i % 40}", i % 25, s"e${i % 5}", s"template <*> number ${i % 5}")
  }.toDF("conv_id", "turn_idx", "event_id", "event_template")

  test("orc round-trip is lossless (schema-on-read)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    try {
      fixture.write.mode("overwrite").orc(dir)
      val back = spark.read.schema(
          "conv_id STRING, turn_idx INT, event_id STRING, event_template STRING")
        .orc(dir)
      // names and types survive; nullability intentionally relaxes on read
      // (file formats cannot promise non-null), matching parquet behavior
      assert(back.schema.map(f => (f.name, f.dataType)) ===
        fixture.schema.map(f => (f.name, f.dataType)))
      val key = (df: org.apache.spark.sql.DataFrame) =>
        df.as[(String, Int, String, String)].collect().sorted.toSeq
      assert(key(back) === key(fixture))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("orc scan gets filter pushdown and column pruning, like parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    try {
      fixture.write.mode("overwrite").orc(dir)
      val q = spark.read.schema(
          "conv_id STRING, turn_idx INT, event_id STRING, event_template STRING")
        .orc(dir)
        .filter(col("turn_idx") > 20)
        .select("conv_id", "turn_idx")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(turn_idx), GreaterThan(turn_idx,20)]"),
        s"filter did not reach the ORC scan:\n$plan")
      assert(plan.contains("ReadSchema: struct<conv_id:string,turn_idx:int>"),
        s"column pruning did not reach the ORC scan:\n$plan")
      assert(q.count() === fixture.filter(col("turn_idx") > 20).count())
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
