package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** GIF decode leg: exact lossless round trip through the explicit-palette
  * fixture writer, dHash identity with the PNG of the same pixels, and
  * the corrupt-payload identity fallback. */
class GifSpec extends AnyFunSuite {

  private val f = (i: Int) => (i * 41 + 13) % 256

  test("GIF round trip is pixel-exact (palette passthrough, LZW lossless)") {
    val (w, h) = (11, 9)
    val dec = Multimodal.imageDecoder(Multimodal.synthGif(w, h, f))
    assert(dec.length === 8 + 3 * w * h)
    val gw = ((dec(0) & 0xFF) << 24) | ((dec(1) & 0xFF) << 16) |
      ((dec(2) & 0xFF) << 8) | (dec(3) & 0xFF)
    val gh = ((dec(4) & 0xFF) << 24) | ((dec(5) & 0xFF) << 16) |
      ((dec(6) & 0xFF) << 8) | (dec(7) & 0xFF)
    assert((gw, gh) === ((w, h)))
    for (i <- 0 until w * h; c <- 0 until 3)
      assert((dec(8 + 3 * i + c) & 0xFF) === f(i),
        s"pixel $i channel $c")
  }

  test("GIF and PNG of the same pixels decode identically (same dhash input)") {
    val (w, h) = (18, 16)
    val viaGif = Multimodal.imageDecoder(Multimodal.synthGif(w, h, f))
    val viaPng = Multimodal.imageDecoder(Multimodal.synthPng(w, h, f))
    assert(viaGif.toSeq === viaPng.toSeq)
  }

  test("corrupt GIF falls back to identity, not an executor failure") {
    val corrupt = "GIF89a then garbage".getBytes("UTF-8")
    assert(Multimodal.imageDecoder(corrupt) eq corrupt)
  }
}
