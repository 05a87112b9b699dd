package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, batched feature extraction with a STUBBED decoder.
  *
  * The Spark-side contract is real and tested — schema, partitioning, batch
  * iteration shape — while the actual decode (which would need image/audio
  * libs absent from this container) is a clearly-marked deterministic fake
  * keyed off the bytes' md5, so results are stable and oracle-checkable.
  */
object Multimodal {

  // MessageDigest.getInstance synchronizes on the JCA provider registry — a
  // per-row (worse: per-FRAME) call serializes every executor thread at
  // local[32] (same pitfall Drain.md5Local fixes). One digest per thread,
  // reset() per use.
  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  final case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, kind: String, byte_len: Int,
      width: Int, height: Int, duration_ms: Int, digest: String)

  /** Wrap a text table into media rows (binary payload = utf-8 bytes) —
    * stand-in for reading real image/audio blobs from parquet `binary`.
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("media"))
      .withColumn("kind",
        when(ascii(substring(md5(col("media")), 1, 1)) % 3 === 0, "image")
          .when(ascii(substring(md5(col("media")), 1, 1)) % 3 === 1, "audio")
          .otherwise("video"))
      .select("doc_id", "kind", "media")
      .as[MediaRow]
  }

  /** STUB decoder: a real implementation would decode the image/audio and
    * measure it; here the "decoded" dimensions are a deterministic function
    * of the payload digest (md5), preserving the exact batched-UDF plumbing
    * (mapPartitions over the binary column, one in-flight batch, typed
    * output schema).
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int, String) = {
    val digest = md5Local.get()
    digest.reset()
    val md = digest.digest(bytes)
    val hex = md.map(b => f"${b & 0xff}%02x").mkString
    // ??? real decode goes here — container has no image/audio codecs.
    // Fake dimensions derive from the digest's hex chars (oracle-checkable).
    val w  = (hex(0).toInt * 256 + hex(1).toInt) % 1920
    val h  = (hex(2).toInt * 256 + hex(3).toInt) % 1080
    val ms = (hex(4).toInt * 256 + hex(5).toInt) * 10
    (w, h, ms, hex)
  }

  /** Batched feature extraction over the media column. Partition-parallel;
    * each partition streams its rows through the (stub) decoder without
    * materializing the partition in memory.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (w, h, ms, hex) = decodeStub(r.media)
        MediaFeatures(r.doc_id, r.kind, r.media.length, w, h, ms, hex)
      }
    }
  }

  final case class Frame(doc_id: Long, frame_idx: Int, offset_ms: Int,
                         frame_digest: String)

  /** Frame sampling: `n` evenly spaced frames per media row (video shape:
    * 1 row → n rows, generator/UDTF-shaped). The frame "decode" is the same
    * clearly-marked stub — a deterministic digest of (payload, offset) — but
    * the Spark plumbing (flatMap blowup, typed schema, partition locality)
    * is exactly what a real ffmpeg-backed extractor would use.
    */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val (_, _, durationMs, _) = decodeStub(r.media)
      (0 until n).map { i =>
        val offset = if (n == 1) 0 else (durationMs.toLong * i / (n - 1)).toInt
        val md = md5Local.get()
        md.reset()
        md.update(r.media)
        md.update(java.nio.ByteBuffer.allocate(4).putInt(offset).array())
        // ??? real frame grab goes here — container has no video codecs.
        Frame(r.doc_id, i, offset, md.digest().take(4).map(b => f"${b & 0xff}%02x").mkString)
      }
    }
  }

  /** Resize stub: aspect-preserving target dimensions from the (stub-)decoded
    * size — the arithmetic a real resize kernel would receive.
    */
  def resizePlan(features: Dataset[MediaFeatures], targetWidth: Int): Dataset[(Long, Int, Int)] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val w = math.max(1, f.width)
      val scale = targetWidth.toDouble / w
      (f.doc_id, targetWidth, math.max(1, math.round(f.height * scale).toInt))
    }
  }
}
