package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Scratch profiling main (not part of the contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    t("shingles_only") {
      d.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
        .write.format("noop").mode("overwrite").save()
    }
    t("signature") {
      d.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
        .withColumn("sig", Dedup.minhashSignature(col("sh"), 24))
        .write.format("noop").mode("overwrite").save()
    }
    t("full_lsh") {
      Dedup.minhashLshPairs(d, "doc_id", "text", 3, 24, 4, 0.3)
        .write.format("noop").mode("overwrite").save()
    }
    val buckets = d.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
      .withColumn("sig", Dedup.minhashSignature(col("sh"), 24))
      .select(col("id"), explode(expr(
        "transform(sequence(0, 3), b -> xxhash64(slice(sig, b*6+1, 6)))")).as("bucket"))
    val sizes = buckets.groupBy("bucket").count().orderBy(desc("count"))
    println("[scratch] top bucket sizes:")
    sizes.show(10, false)
    spark.stop()
  }
}
