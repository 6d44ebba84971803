package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Pins the JPEG leg of [[Multimodal.imageDecoder]]: the real lossy
  * encode→decode round trip through the JRE's own JPEG codec, with the
  * measured tolerances the `multimodal_decode_jpeg` /
  * `multimodal_dhash_mixed` gates rely on (dimensions exact, pixel error
  * bounded, dHash stable across the PNG→JPEG re-encode, corrupt payloads
  * falling back to identity).
  */
class JpegSpec extends AnyFunSuite {

  private def decodedPixels(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val dec = Multimodal.imageDecoder(payload)
    require(!(dec eq payload), "did not decode")
    val w = ((dec(0) & 0xFF) << 24) | ((dec(1) & 0xFF) << 16) |
      ((dec(2) & 0xFF) << 8) | (dec(3) & 0xFF)
    val h = ((dec(4) & 0xFF) << 24) | ((dec(5) & 0xFF) << 16) |
      ((dec(6) & 0xFF) << 8) | (dec(7) & 0xFF)
    (w, h, dec.drop(8).map(_ & 0xFF))
  }

  test("gradient JPEGs at q=0.95 decode with exact dims and <=4 pixel error") {
    // measured worst per-pixel error 1 at q=0.95 over these fixtures;
    // pinned at 4 for codec-version headroom
    for (id <- 0L until 50L) {
      val w = 16 + (id % 9).toInt
      val h = 12 + (id % 7).toInt
      val f = (i: Int) => (i % w) * 255 / math.max(1, w - 1)
      val (dw, dh, px) = decodedPixels(Multimodal.synthJpeg(w, h, f, 0.95f))
      assert(dw === w && dh === h)
      var maxErr = 0
      for (i <- 0 until w * h) {
        val e = math.abs(px(3 * i) - (f(i) & 0xFF))
        if (e > maxErr) maxErr = e
      }
      assert(maxErr <= 4, s"id=$id maxErr=$maxErr")
    }
  }

  test("16-bin histogram of decoded gradient JPEGs stays within the gate's " +
      "L1 tolerance") {
    // the multimodal_decode_jpeg gate pins L1 deviation <= 96; measured 0
    for (id <- 0L until 50L) {
      val w = 16 + (id % 9).toInt
      val h = 12 + (id % 7).toInt
      val f = (i: Int) => (i % w) * 255 / math.max(1, w - 1)
      val (_, _, px) = decodedPixels(Multimodal.synthJpeg(w, h, f, 0.95f))
      val got = new Array[Long](16)
      px.foreach(v => got(v >> 4) += 1)
      val exp = new Array[Long](16)
      for (i <- 0 until w * h) exp((f(i) & 0xFF) >> 4) += 3
      val dev = (0 until 16).map(b => math.abs(got(b) - exp(b))).sum
      assert(dev <= 96, s"id=$id dev=$dev")
    }
  }

  test("dHash survives the PNG->JPEG re-encode; foils keep their distance") {
    // same dHash algorithm as Multimodal (block means, integer compare)
    def dhashOf(dec: Array[Byte]): String = {
      val w = ((dec(0) & 0xFF) << 24) | ((dec(1) & 0xFF) << 16) |
        ((dec(2) & 0xFF) << 8) | (dec(3) & 0xFF)
      val h = ((dec(4) & 0xFF) << 24) | ((dec(5) & 0xFF) << 16) |
        ((dec(6) & 0xFF) << 8) | (dec(7) & 0xFF)
      val sums = Array.ofDim[Long](8, 9)
      val cnts = Array.ofDim[Long](8, 9)
      for (y <- 0 until h; x <- 0 until w) {
        sums(y * 8 / h)(x * 9 / w) += (dec(8 + 3 * (y * w + x)) & 0xFF).toLong
        cnts(y * 8 / h)(x * 9 / w) += 1L
      }
      val sb = new StringBuilder(64)
      for (cy <- 0 until 8; cx <- 0 until 8)
        sb.append(if (sums(cy)(cx) * cnts(cy)(cx + 1) >
          sums(cy)(cx + 1) * cnts(cy)(cx)) '1' else '0')
      sb.toString
    }
    def ham(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    // measured at q=0.9 over the gate's texture family: worst twin
    // hamming <= 5 (q=0.85) / 2 (q=0.95), min foil hamming 11 — the
    // multimodal_dhash_mixed gate pairs at maxDist=6
    for (id <- 0L until 100L) {
      val w = 18 + (id % 7).toInt
      val h = 16 + (id % 5).toInt
      val f0 = (i: Int) => ((i * (37 + id % 13) + id * 31) % 256).toInt
      val f2 = (i: Int) => ((i * (101 + id % 17) + id * 53) % 256).toInt
      val png = Multimodal.imageDecoder(Multimodal.synthPng(w, h, f0))
      val jpg = Multimodal.imageDecoder(Multimodal.synthJpeg(w, h, f0, 0.9f))
      val foil = Multimodal.imageDecoder(Multimodal.synthPng(w, h, f2))
      assert(ham(dhashOf(png), dhashOf(jpg)) <= 6, s"twin drifted, id=$id")
      assert(ham(dhashOf(png), dhashOf(foil)) > 6, s"foil collided, id=$id")
    }
  }

  test("corrupt JPEG payloads fall back to identity, not a crash") {
    val junk = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte) ++
      Array.fill[Byte](64)(0x42)
    val out = Multimodal.imageDecoder(junk)
    assert(out eq junk)
  }

  test("mediaDecoder routes JPEG through the image leg") {
    val jp = Multimodal.synthJpeg(16, 12, i => i % 256, 0.95f)
    val out = Multimodal.mediaDecoder(jp)
    assert(!(out eq jp))
    val w = ((out(0) & 0xFF) << 24) | ((out(1) & 0xFF) << 16) |
      ((out(2) & 0xFF) << 8) | (out(3) & 0xFF)
    assert(w === 16)
  }
}
