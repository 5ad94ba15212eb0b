package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Multimodal.{MediaDecoder, MediaPayload}

/** Pins the real `javax.imageio` decode tier of the multimodal
  * decoder: genuine PNG/JPEG/GIF bytes (encoded in-test with
  * `ImageIO.write`, so no binary fixtures live in the repo) must
  * yield the actual header geometry, and anything else — text
  * payloads, corrupt media — must fall back to the deterministic
  * byte-derived tier the oracle checks.
  */
class MultimodalSpec extends AnyFunSuite {

  private def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    // deterministic pixels so encoded bytes (and the checksum) are stable
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"JDK must ship a $fmt writer")
    out.toByteArray
  }

  test("real PNG decodes to actual header geometry") {
    val bytes = encode("png", 5, 3)
    val m = MediaDecoder.decode(MediaPayload(1L, bytes))
    assert(m.format === "png")
    assert(m.width === 5L)
    assert(m.height === 3L)
    assert(m.n_frames === 1L)
    assert(m.n_bytes === bytes.length.toLong)
    assert(m.first_byte === 0x89)
  }

  test("real JPEG decodes to actual header geometry") {
    val bytes = encode("jpg", 4, 2)
    val m = MediaDecoder.decode(MediaPayload(2L, bytes))
    assert(m.format === "jpeg")
    assert(m.width === 4L)
    assert(m.height === 2L)
  }

  test("real GIF decodes to actual header geometry") {
    val bytes = encode("gif", 7, 6)
    val m = MediaDecoder.decode(MediaPayload(3L, bytes))
    assert(m.format === "gif")
    assert(m.width === 7L)
    assert(m.height === 6L)
  }

  test("corrupt media magic falls back to the deterministic tier") {
    // PNG magic followed by garbage: looksLikeImage fires, the reader
    // throws, and the decoder must recover with the fallback formula
    val bytes = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2, 3)
    val m = MediaDecoder.decode(MediaPayload(4L, bytes))
    val n = bytes.length.toLong
    assert(m.format === "webp") // 0x89 = 137, 137 % 3 = 2
    assert(m.width === 64L + (n % 512L))
    assert(m.height === 64L + ((n / 7L) % 512L))
    assert(m.n_frames === 1L + (n % 16L))
  }

  test("real BMP passes the structural header gate and decodes to actual geometry") {
    val bytes = encode("bmp", 6, 5)
    val m = MediaDecoder.decode(MediaPayload(7L, bytes))
    assert(m.format === "bmp")
    assert(m.width === 6L)
    assert(m.height === 5L)
  }

  test("text starting with 'BM' is NOT claimed as BMP — fallback tier, oracle semantics") {
    // 2 printable magic bytes would satisfy the JDK's BMPImageReaderSpi,
    // which can then parse arbitrary text as a header and return garbage
    // dims WITHOUT throwing; the structural gate must reject it so the
    // payload stays on the byte-derived tier the oracle models
    val bytes = "BM25 is a ranking function used by search engines".getBytes("UTF-8")
    val m = MediaDecoder.decode(MediaPayload(6L, bytes))
    val n = bytes.length.toLong
    assert(m.format === "jpeg") // 'B' = 66, 66 % 3 = 0
    assert(m.width === 64L + (n % 512L))
    assert(m.height === 64L + ((n / 7L) % 512L))
    assert(m.n_frames === 1L + (n % 16L))
  }

  test("text payloads take the fallback tier (the oracle-checked path)") {
    val bytes = "hello multimodal world".getBytes("UTF-8")
    val m = MediaDecoder.decode(MediaPayload(5L, bytes))
    val n = bytes.length.toLong
    assert(m.first_byte === 'h'.toInt)
    assert(m.format === (('h'.toInt % 3) match {
      case 0 => "jpeg"; case 1 => "png"; case _ => "webp"
    }))
    assert(m.width === 64L + (n % 512L))
  }

  test("mixed payloads decode through the partition-batched Spark path") {
    val spark = TestSpark.spark
    import spark.implicits._
    val png = encode("png", 9, 4)
    val ds = Seq(
      MediaPayload(10L, png),
      MediaPayload(11L, "plain text payload here".getBytes("UTF-8")))
      .toDS()
    val metas = ds.mapPartitions(_.map(MediaDecoder.decode)).collect()
      .map(m => m.doc_id -> m).toMap
    assert(metas(10L).format === "png")
    assert(metas(10L).width === 9L)
    assert(metas(11L).width === 64L + (23L % 512L))
  }

  test("resize planning: max side 224, aspect preserved, never upscales") {
    val rows = graft.ext.Multimodal.resizeDims(TestSpark.spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h, ow, oh) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val m = math.max(w, h)
      if (m <= 224) assert((ow, oh) === ((w, h)))
      else {
        assert(math.max(ow, oh) === 224)
        // half-up rounding of the exact ratio
        assert(ow === (w * 224 + m / 2) / m)
        assert(oh === (h * 224 + m / 2) / m)
      }
    }
  }
}
