package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Dataset

/** REAL media decoding for the one format that needs no native codecs:
  * RIFF/WAVE with integer PCM. This upgrades the multimodal story from
  * "stub decode only" to "one genuine decoder + the stub seam for formats
  * whose codecs the sandbox lacks" — and proves the [[Multimodal.MediaDecoder]]
  * contract really is decoder-agnostic: `extractFeatures` / `sampleFrames`
  * run unchanged against it (MultimodalSpec drives both).
  *
  * Scope: canonical RIFF little-endian layout, `fmt ` chunk with
  * audioFormat=1 (integer PCM), 8/16/32-bit samples, any channel count;
  * unknown chunks are skipped (word-aligned, per spec). Malformed input
  * throws [[WavDecoder.MalformedWav]] — a data-quality pipeline wants loud
  * failures it can route to a quarantine sink, not silent zeros.
  *
  * Stateless and allocation-light: safe to ship in task closures and share
  * across executor threads (the digest uses the same ThreadLocal pattern as
  * the stub).
  */
object WavDecoder extends Multimodal.MediaDecoder {

  final class MalformedWav(msg: String) extends IllegalArgumentException(msg)

  /** Parsed header + PCM view (no sample copying — offsets into `bytes`). */
  final case class Wav(channels: Int, sampleRate: Int, bitsPerSample: Int,
                       dataOffset: Int, dataLen: Int) {
    def bytesPerFrame: Int = channels * (bitsPerSample / 8)
    def frames: Int = dataLen / bytesPerFrame
    def durationMs: Int = (frames.toLong * 1000L / sampleRate).toInt
  }

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private def fail(msg: String): Nothing = throw new MalformedWav(msg)

  /** Parse the RIFF/WAVE container. */
  def parse(bytes: Array[Byte]): Wav = {
    if (bytes.length < 44) fail(s"too short for a WAV header: ${bytes.length} bytes")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (bb.getInt(0) != 0x46464952) fail("missing RIFF magic")         // "RIFF"
    if (bb.getInt(8) != 0x45564157) fail("missing WAVE form type")     // "WAVE"
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, sampleRate, bits)
    var data: Option[(Int, Int)] = None     // (offset, len)
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id   = bb.getInt(off)
      val size = bb.getInt(off + 4)
      // Long arithmetic: a crafted size near Int.MaxValue overflows the Int
      // sum to negative and would slip past the check, turning the documented
      // MalformedWav into an ArrayIndexOutOfBounds later
      if (size < 0 || off.toLong + 8L + size > bytes.length)
        fail(s"chunk at $off overruns the payload (size=$size)")
      id match {
        case 0x20746d66 => // "fmt "
          if (size < 16) fail(s"fmt chunk too small: $size")
          val audioFormat = bb.getShort(off + 8) & 0xffff
          if (audioFormat != 1) fail(s"not integer PCM (audioFormat=$audioFormat)")
          val channels   = bb.getShort(off + 10) & 0xffff
          val sampleRate = bb.getInt(off + 12)
          val bits       = bb.getShort(off + 22) & 0xffff
          if (channels == 0 || sampleRate <= 0) fail("zero channels or sample rate")
          if (bits != 8 && bits != 16 && bits != 32) fail(s"unsupported bit depth $bits")
          fmt = Some((channels, sampleRate, bits))
        case 0x61746164 => // "data"
          data = Some((off + 8, size))
        case _ => // skip unknown chunk
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((c, r, b)), Some((o, l))) =>
        val w = Wav(c, r, b, o, l)
        if (l % w.bytesPerFrame != 0) fail(s"data length $l not frame-aligned")
        w
      case _ => fail(s"missing ${if (fmt.isEmpty) "fmt " else "data"} chunk")
    }
  }

  /** MediaDecoder contract: audio has no pixel dimensions (0x0); duration is
    * REAL (frames / sample rate); digest covers the PCM payload only, so
    * container-level metadata edits don't change identity — the dedup-
    * friendly definition of "same audio".
    */
  override def decode(bytes: Array[Byte]): Multimodal.Decoded = {
    val w  = parse(bytes)
    val md = md5Local.get()
    md.reset()
    md.update(bytes, w.dataOffset, w.dataLen)
    val hex = md.digest().map(b => f"${b & 0xff}%02x").mkString
    Multimodal.Decoded(0, 0, w.durationMs, hex)
  }

  /** Digest of ONE 100 ms PCM window starting at `offsetMs` (clamped to the
    * payload) — a real frame grab, byte-exact and sample-aligned.
    */
  override def frameDigest(bytes: Array[Byte], offsetMs: Int): String = {
    val w = parse(bytes)
    val startFrame = math.min(
      math.max(0L, offsetMs.toLong * w.sampleRate / 1000L), math.max(w.frames - 1, 0).toLong).toInt
    val nFrames = math.min(w.sampleRate / 10, w.frames - startFrame) // 100 ms
    val start = w.dataOffset + startFrame * w.bytesPerFrame
    val md = md5Local.get()
    md.reset()
    md.update(bytes, start, math.max(nFrames, 0) * w.bytesPerFrame)
    md.digest().take(4).map(b => f"${b & 0xff}%02x").mkString
  }

  final case class WavStats(doc_id: Long, channels: Int, sample_rate: Int,
                            bits_per_sample: Int, duration_ms: Int,
                            rms: Double, peak: Double)

  /** Channel-merged RMS + peak of the normalized samples in [-1, 1] — the
    * loudness features an audio-quality filter keys on. Sequential over the
    * payload (one pass, no boxing).
    */
  def stats(docId: Long, bytes: Array[Byte]): WavStats = {
    val w  = parse(bytes)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n  = w.frames * w.channels
    var sumSq = 0.0
    var peak  = 0.0
    var i = 0
    while (i < n) {
      val x = w.bitsPerSample match {
        case 8  => ((bytes(w.dataOffset + i) & 0xff) - 128) / 128.0 // 8-bit WAV is unsigned
        case 16 => bb.getShort(w.dataOffset + 2 * i) / 32768.0
        case 32 => bb.getInt(w.dataOffset + 4 * i) / 2147483648.0
      }
      sumSq += x * x
      val a = math.abs(x)
      if (a > peak) peak = a
      i += 1
    }
    WavStats(docId, w.channels, w.sampleRate, w.bitsPerSample, w.durationMs,
      if (n == 0) 0.0 else math.sqrt(sumSq / n), peak)
  }

  /** Dataset-level audio feature extraction (partition-parallel, streaming —
    * the same shape as [[Multimodal.extractFeatures]]).
    */
  def audioStats(media: Dataset[Multimodal.MediaRow]): Dataset[WavStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => stats(r.doc_id, r.media)))
  }
}
