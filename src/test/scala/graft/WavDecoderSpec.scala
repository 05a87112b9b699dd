package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Multimodal, WavDecoder}

/** The one REAL decoder (pure-JVM RIFF/WAVE PCM) behind the MediaDecoder
  * seam: header math, sample-exact stats, malformed-input failure modes,
  * and the unchanged Spark plumbing driving it.
  */
class WavDecoderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Canonical RIFF/WAVE writer for the tests (independent re-derivation of
    * the layout — not the parser run backwards).
    */
  def wav(channels: Int, sampleRate: Int, bits: Int,
          samples: Array[Double], extraChunk: Boolean = false): Array[Byte] = {
    val bpf = channels * bits / 8
    require(samples.length % channels == 0)
    val dataLen = samples.length * bits / 8
    val extra = if (extraChunk) 12 else 0
    val bb = ByteBuffer.allocate(44 + extra + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952).putInt(36 + extra + dataLen).putInt(0x45564157)
    if (extraChunk) { // a LIST chunk the parser must skip
      bb.putInt(0x5453494c).putInt(4).putInt(0x4f464e49)
    }
    bb.putInt(0x20746d66).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * bpf)
      .putShort(bpf.toShort).putShort(bits.toShort)
    bb.putInt(0x61746164).putInt(dataLen)
    samples.foreach { x =>
      bits match {
        case 8  => bb.put((math.round(x * 127.0) + 128).toByte)
        case 16 => bb.putShort(math.round(x * 32767.0).toShort)
        case 32 => bb.putInt(math.round(x * 2147483647.0).toInt)
      }
    }
    bb.array()
  }

  def sine(n: Int, amp: Double, freq: Double, rate: Int): Array[Double] =
    Array.tabulate(n)(i => amp * math.sin(2 * math.Pi * freq * i / rate))

  test("parse: header math exact for 8/16/32-bit, mono/stereo") {
    for ((ch, bits) <- Seq((1, 16), (2, 16), (1, 8), (2, 32))) {
      val rate = 8000
      val b = wav(ch, rate, bits, sine(rate * ch, 0.5, 440, rate)) // exactly 1 s
      val w = WavDecoder.parse(b)
      assert(w.channels === ch)
      assert(w.sampleRate === rate)
      assert(w.bitsPerSample === bits)
      assert(w.frames === rate)
      assert(w.durationMs === 1000)
    }
  }

  test("parse skips unknown chunks before fmt/data") {
    val b = wav(1, 8000, 16, sine(800, 0.3, 100, 8000), extraChunk = true)
    val w = WavDecoder.parse(b)
    assert(w.frames === 800 && w.durationMs === 100)
  }

  test("malformed inputs fail loudly, never silently decode") {
    val good = wav(1, 8000, 16, sine(80, 0.3, 100, 8000))
    def bad(mutate: Array[Byte] => Array[Byte]) =
      intercept[WavDecoder.MalformedWav](WavDecoder.parse(mutate(good.clone())))
    bad(_.take(20))                                  // truncated
    bad { b => b(0) = 'X'.toByte; b }                // wrong magic
    bad { b => b(20) = 3; b }                        // audioFormat != PCM
    bad { b => b(34) = 24; b }                       // unsupported bit depth
    // data chunk size overrunning the buffer
    bad { b =>
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40, 1 << 20); b
    }
  }

  test("stats: sine RMS = amp/sqrt(2), peak = amp, sample-exact") {
    val rate = 8000
    val b = wav(1, rate, 16, sine(rate * 4, 0.8, 440, rate))
    val s = WavDecoder.stats(7L, b)
    assert(s.duration_ms === 4000)
    assert(math.abs(s.rms - 0.8 / math.sqrt(2)) < 1e-3)
    assert(math.abs(s.peak - 0.8) < 1e-3)
    // silence
    val z = WavDecoder.stats(8L, wav(1, rate, 16, Array.fill(rate)(0.0)))
    assert(z.rms === 0.0 && z.peak === 0.0)
  }

  test("decode + frameDigest: PCM-payload identity, deterministic sample-aligned frames") {
    val rate = 8000
    val b1 = wav(1, rate, 16, sine(rate * 2, 0.5, 440, rate))
    val b2 = wav(1, rate, 16, sine(rate * 2, 0.5, 440, rate), extraChunk = true)
    val d1 = WavDecoder.decode(b1)
    val d2 = WavDecoder.decode(b2)
    assert(d1.durationMs === 2000)
    // identity covers PCM only: container metadata differences don't matter
    assert(d1.digest === d2.digest)
    assert(WavDecoder.frameDigest(b1, 500) === WavDecoder.frameDigest(b2, 500))
    // different offsets hit different sample windows (333 ms is not a whole
    // number of 440 Hz periods — a 1000 ms shift would be and must match)
    assert(WavDecoder.frameDigest(b1, 0) !== WavDecoder.frameDigest(b1, 333))
    assert(WavDecoder.frameDigest(b1, 0) === WavDecoder.frameDigest(b1, 1000))
    // past-the-end offsets clamp instead of crashing
    WavDecoder.frameDigest(b1, 10 * 60 * 1000)
  }

  test("the Spark plumbing drives the REAL decoder unchanged (seam proof)") {
    import spark.implicits._
    val rate = 8000
    val rows = (0 until 6).map { i =>
      Multimodal.MediaRow(i.toLong, "audio",
        wav(1, rate, 16, sine(rate * (i + 1), 0.4, 200 + i * 50, rate)))
    }
    val media = spark.createDataset(rows)
    val feats = Multimodal.extractFeatures(media, WavDecoder)
      .collect().sortBy(_.doc_id)
    assert(feats.map(_.duration_ms).toSeq === (1 to 6).map(_ * 1000))
    val frames = Multimodal.sampleFrames(media, n = 3, WavDecoder)
      .collect().groupBy(_.doc_id)
    frames.foreach { case (id, fs) =>
      val dur = (id + 1) * 1000
      assert(fs.sortBy(_.frame_idx).map(_.offset_ms).toSeq === Seq(0, dur / 2, dur).map(_.toInt))
    }
    val stats = WavDecoder.audioStats(media).collect().sortBy(_.doc_id)
    stats.foreach(s => assert(math.abs(s.rms - 0.4 / math.sqrt(2)) < 1e-3))
  }
}
