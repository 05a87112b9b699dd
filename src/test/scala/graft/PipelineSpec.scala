package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline
import graft.sources.Transcripts
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def rmrf(p: Path): Unit = if (Files.exists(p))
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)

  test("end-to-end pipeline: conservation invariants hold") {
    val dir = Files.createTempDirectory("graft-pipe").toString
    val t = Transcripts.synthetic(spark, 500, seed = 42L, partitions = 8)
    val res = Pipeline.run(spark, t, dir)
    val total = t.count()
    assert(res.turns === total)
    // router conservation: union of per-sink counts == input count
    assert(res.routes.map(_.rows).sum === total)
    assert(res.templates === 8)
    assert(res.windows === 500L) // one session per conversation
    // metrics sidecars written per stage
    Seq("parse", "labels", "route", "windows", "count_vectors").foreach { s =>
      assert(Files.exists(Paths.get(s"$dir/$s/_metrics.json")), s"missing metrics for $s")
    }
  }

  test("pipeline on EMPTY input completes with zero counts (no crash on degenerate data)") {
    val dir = Files.createTempDirectory("graft-pipe-empty").toString
    val empty = Transcripts.synthetic(spark, 5, seed = 1L, partitions = 2)
      .filter(col("conv_id") === "no-such-conv")
    val res = Pipeline.run(spark, empty, dir)
    assert(res.turns === 0L)
    assert(res.routes.map(_.rows).sum === 0L)
    assert(res.windows === 0L && res.countVectorRows === 0L)
  }

  test("checkpoint resume: restart after killing a late stage is byte-identical") {
    val dir = Files.createTempDirectory("graft-pipe-resume").toString
    val t = Transcripts.synthetic(spark, 300, seed = 43L, partitions = 8)
    val first = Pipeline.run(spark, t, dir)
    val routeFiles = spark.read.parquet(s"$dir/route/data")
      .orderBy("conv_id", "turn_idx").collect()
    val parseMtime = Files.getLastModifiedTime(Paths.get(s"$dir/parse/_metrics.json"))

    // simulate a crash between 'windows' and 'count_vectors'
    rmrf(Paths.get(s"$dir/count_vectors"))
    val second = Pipeline.run(spark, t, dir)

    assert(second === first) // identical result record incl. per-sink counts
    // earlier stages were NOT recomputed (metrics file untouched)
    assert(Files.getLastModifiedTime(Paths.get(s"$dir/parse/_metrics.json")) === parseMtime)
    // routed rows byte-identical
    val routeFiles2 = spark.read.parquet(s"$dir/route/data")
      .orderBy("conv_id", "turn_idx").collect()
    assert(routeFiles2 === routeFiles)
  }

  test("pipeline output matches at different parallelism (repartition invariance)") {
    val dirA = Files.createTempDirectory("graft-pipe-a").toString
    val dirB = Files.createTempDirectory("graft-pipe-b").toString
    val tA = Transcripts.synthetic(spark, 200, seed = 44L, partitions = 3)
    val tB = Transcripts.synthetic(spark, 200, seed = 44L, partitions = 17)
    val a = Pipeline.run(spark, tA, dirA)
    val b = Pipeline.run(spark, tB, dirB)
    assert(a.turns === b.turns)
    assert(a.routes === b.routes) // per-sink counts identical
    val cvA = spark.read.parquet(s"$dirA/count_vectors/data")
      .select("conv_id", "event_id", "cnt").orderBy("conv_id", "event_id").collect()
    val cvB = spark.read.parquet(s"$dirB/count_vectors/data")
      .select("conv_id", "event_id", "cnt").orderBy("conv_id", "event_id").collect()
    assert(cvA === cvB)
  }
}
