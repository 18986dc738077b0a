package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.ops.Multimodal.MediaBlob

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("probe reads real dimensions from PNG and JPEG headers") {
    assert(Multimodal.probeImage(png(123, 45)) == Some((123L, 45L, "png")))
    val Some((w, h, fmt)) = Multimodal.probeImage(jpeg(64, 32))
    assert((w, h) == (64L, 32L) && fmt.startsWith("jp"))
  }

  test("decode: real metadata for images, tagged stub for other bytes") {
    val real = Multimodal.decode(MediaBlob(7L, png(20, 10)))
    assert(real.width == 20 && real.height == 10 &&
      real.format == "png" && real.n_frames == 1)
    val stub = Multimodal.decode(MediaBlob(8L, "just text".getBytes("UTF-8")))
    assert(stub.format == "stub" && stub.byte_len == 9)
    // truncated image header must not throw
    val broken = Multimodal.decode(MediaBlob(9L, png(20, 10).take(10)))
    assert(broken.format == "stub")
  }

  test("resize scales images and passes non-images through untouched") {
    import spark.implicits._
    val blobs = Seq(
      MediaBlob(1L, png(40, 30)),
      MediaBlob(2L, "not an image".getBytes("UTF-8"))).toDS()
    val out = Multimodal.extractMeta(Multimodal.resize(blobs, 12, 9))
      .collect().sortBy(_.doc_id)
    assert(out(0).width == 12 && out(0).height == 9 && out(0).format == "png")
    assert(out(1).format == "stub" && out(1).byte_len == 12)
  }

  test("distributed decode of generated PNGs yields generator dimensions") {
    import spark.implicits._
    val ids = spark.range(0, 40, 20).select($"id".as("doc_id"))
      .as[java.lang.Long]
    val metas = Multimodal.extractMeta(Multimodal.syntheticPngBlobs(ids))
      .collect().sortBy(_.doc_id)
    assert(metas.map(m => (m.doc_id, m.width, m.height, m.format)).toSeq == Seq(
      (0L, 16L, 16L, "png"), (20L, 16L + 20 % 32, 16L + 60 % 32, "png")))
  }
}
