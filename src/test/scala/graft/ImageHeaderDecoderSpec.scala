package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{ImageHeaderDecoder => IHD, Multimodal}

/** Pure-JVM PNG/JPEG header parsing: golden byte fixtures, the synthetic
  * round-trip (construct → parse == expected), malformed-input quarantine
  * behavior, and the Dataset plumbing through the MediaDecoder seam.
  */
class ImageHeaderDecoderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("golden PNG: hand-built 640x480 RGBA/8 IHDR parses exactly") {
    // signature + IHDR(len 13): w=640 h=480 depth=8 colorType=6 + zero CRC
    val png = bytes(
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d, 'I', 'H', 'D', 'R',
      0x00, 0x00, 0x02, 0x80, // 640
      0x00, 0x00, 0x01, 0xe0, // 480
      0x08, 0x06, 0x00, 0x00, 0x00,
      0x00, 0x00, 0x00, 0x00)
    assert(IHD.parse(png) === IHD.ImageHeader("png", 640, 480, 4, 8))
  }

  test("golden JPEG: APP0 + COM skipped, RST tolerated, SOF0 299x107 gray/8 found") {
    val jpeg = bytes(
      0xff, 0xd8,             // SOI
      0xff, 0xe0, 0x00, 0x04, 0x00, 0x00, // APP0 len 4 (2 payload bytes)
      0xff, 0xd0,             // standalone RST0 (no length)
      0xff, 0xfe, 0x00, 0x03, 'x',        // COM len 3
      0xff, 0xff,             // fill byte before marker
      0xff, 0xc0, 0x00, 0x0b, // SOF0 len 11 = 8 + 3*1
      0x08,                   // precision
      0x00, 0x6b,             // height 107
      0x01, 0x2b,             // width 299
      0x01,                   // 1 component
      0x01, 0x11, 0x00,
      0xff, 0xd9)             // EOI
    assert(IHD.parse(jpeg) === IHD.ImageHeader("jpeg", 299, 107, 1, 8))
  }

  test("synthetic round-trip: construct real bytes, parse back the exact header") {
    (0L until 600L).foreach { id =>
      val hdr = IHD.parse(IHD.syntheticBytes(id))
      assert(hdr === IHD.syntheticHeader(id), s"id=$id")
    }
    // both formats and all channel/depth variants actually occur
    val hdrs = (0L until 30L).map(IHD.syntheticHeader)
    assert(hdrs.map(_.format).toSet === Set("png", "jpeg"))
    assert(hdrs.filter(_.format == "png").map(_.channels).toSet === Set(1, 3, 4))
    assert(hdrs.filter(_.format == "png").map(_.bitDepth).toSet === Set(8, 16))
  }

  test("malformed inputs raise MalformedImage, never index errors") {
    val cases: Seq[(String, Array[Byte])] = Seq(
      "empty" -> Array.emptyByteArray,
      "garbage" -> bytes(1, 2, 3, 4, 5, 6, 7, 8, 9, 10),
      "png sig only" -> bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
      "png wrong first chunk" -> (bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
        0x00, 0x00, 0x00, 0x0d, 'I', 'D', 'A', 'T') ++ new Array[Byte](17)),
      "png zero width" -> bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
        0x00, 0x00, 0x00, 0x0d, 'I', 'H', 'D', 'R',
        0, 0, 0, 0, 0, 0, 0, 1, 8, 0, 0, 0, 0, 0, 0, 0, 0),
      "jpeg SOI only" -> bytes(0xff, 0xd8),
      "jpeg no SOF before EOI" -> bytes(0xff, 0xd8, 0xff, 0xd9),
      "jpeg segment overruns payload" -> bytes(0xff, 0xd8, 0xff, 0xe0, 0xff, 0xff),
      "jpeg truncated SOF" -> bytes(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x0b, 0x08),
      "jpeg zero-length segment" -> bytes(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x01, 0x00))
    cases.foreach { case (name, b) =>
      val ex = intercept[Exception](IHD.parse(b))
      assert(ex.isInstanceOf[IHD.MalformedImage], s"$name: got ${ex.getClass}: ${ex.getMessage}")
    }
  }

  test("MediaDecoder seam: decode/frameDigest run through the generic plumbing") {
    import spark.implicits._
    val media = spark.range(0, 50)
      .as[Long].map(id => Multimodal.MediaRow(id, "image", IHD.syntheticBytes(id)))
    val feats = Multimodal.extractFeatures(media, IHD).collect()
    assert(feats.length === 50)
    feats.foreach { f =>
      val hdr = IHD.syntheticHeader(f.doc_id)
      assert((f.width, f.height, f.duration_ms) === (hdr.width, hdr.height, 0))
    }
    // one frame, any offset: digests agree at 0ms and 5000ms
    val frames = Multimodal.sampleFrames(media, n = 2, IHD).collect()
      .groupBy(_.doc_id).values
    frames.foreach(fs => assert(fs.map(_.frame_digest).distinct.length === 1))
    val stats = IHD.imageStats(media).collect()
    assert(stats.length === 50)
    stats.foreach { s =>
      val hdr = IHD.syntheticHeader(s.doc_id)
      assert((s.format, s.width, s.height, s.channels, s.bit_depth) ===
        (hdr.format, hdr.width, hdr.height, hdr.channels, hdr.bitDepth))
    }
  }
}
