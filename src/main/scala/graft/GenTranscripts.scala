package graft

import org.apache.spark.sql.SparkSession

/** spark-submit utility: write a seeded synthetic transcripts table
  * (`tools/scaling_submit.sh` uses it to stage the N-vs-4N input).
  *
  *   spark-submit --class graft.GenTranscripts app.jar <nConv> <outPath>
  */
object GenTranscripts {
  def main(args: Array[String]): Unit = {
    val Array(nConv, out) = args.take(2)
    val spark = SparkSession.builder() // master/conf come from spark-submit
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sources.Transcripts.synthetic(spark, nConv.toInt, seed = 42L, partitions = 64)
      .write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
