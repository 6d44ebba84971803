package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Pins the MJPEG-in-AVI container path: RIFF grammar round trip
  * (frames out == frames in, byte-identical), even-byte padding, corrupt
  * and truncated containers rejecting whole, magic routing between GFV1
  * and AVI, and the measured twin/foil dHash margins the
  * `multimodal_avi_pairs` gate pins.
  */
class AviSpec extends AnyFunSuite {

  private def jpegFrame(id: Long, f: Int, variant: Int,
                        w: Int, h: Int): Array[Byte] =
    Multimodal.synthJpeg(w, h, { i =>
      if (variant == 2) ((i * (101 + id % 17) + id * 53 + f * 29) % 256).toInt
      else ((i * (37 + id % 13) + id * 31 + f * 29 +
        (if (variant == 1 && f == 1 && i % 29 == 0) 8 else 0)) % 256).toInt
    }, 0.9f)

  test("demux returns the exact frame bytes that were muxed, in order") {
    val frames = (0 until 4).map(f => jpegFrame(7L, f, 0, 20, 16))
    val avi = Multimodal.synthAvi(frames, 20, 16)
    val out = Multimodal.demuxAvi(avi)
    assert(out.isDefined)
    assert(out.get.length === 4)
    out.get.zip(frames).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("odd-length frames round-trip through RIFF even-byte padding") {
    // force an odd frame length by appending a trailing byte (JPEG
    // decoders ignore bytes after EOI; the demux must not)
    val base = jpegFrame(3L, 0, 0, 18, 16)
    val odd = if (base.length % 2 == 1) base else base :+ 0x00.toByte
    assert(odd.length % 2 === 1)
    val avi = Multimodal.synthAvi(Seq(odd, odd, odd), 18, 16)
    val out = Multimodal.demuxAvi(avi)
    assert(out.isDefined && out.get.length === 3)
    out.get.foreach(f => assert(java.util.Arrays.equals(f, odd)))
  }

  test("demuxVideo routes by magic: AVI and GFV1 both demux, junk does not") {
    val frames = Seq(jpegFrame(1L, 0, 0, 18, 16))
    val avi = Multimodal.synthAvi(frames, 18, 16)
    val gfv = Multimodal.synthVideo(frames)
    assert(Multimodal.demuxVideo(avi).exists(_.length == 1))
    assert(Multimodal.demuxVideo(gfv).exists(_.length == 1))
    assert(Multimodal.demuxVideo("not a video".getBytes).isEmpty)
  }

  test("truncated and corrupt AVIs reject whole, never partial frames") {
    val frames = (0 until 3).map(f => jpegFrame(5L, f, 0, 18, 16))
    val avi = Multimodal.synthAvi(frames, 18, 16)
    // truncate inside the movi list
    assert(Multimodal.demuxAvi(avi.take(avi.length - 10)).isEmpty)
    // non-AVI RIFF (a WAV) is not a video container
    val wav = Multimodal.synthWav(8000, Array.tabulate[Short](64)(_.toShort))
    assert(Multimodal.demuxAvi(wav).isEmpty)
    assert(Multimodal.demuxVideo(wav).isEmpty)
    // a movi chunk whose declared size overruns the list rejects
    val broken = avi.clone()
    val moviAt = {
      var p = 12
      var found = -1
      while (found < 0 && p + 12 <= broken.length) {
        if (new String(broken, p, 4, "US-ASCII") == "LIST" &&
          new String(broken, p + 8, 4, "US-ASCII") == "movi") found = p
        else p += 1
      }
      found
    }
    assert(moviAt > 0)
    // corrupt the first frame chunk's length field (movi + LIST hdr 12 + '00dc' 4)
    val lenAt = moviAt + 12 + 4
    broken(lenAt) = 0xFF.toByte; broken(lenAt + 1) = 0xFF.toByte
    broken(lenAt + 2) = 0xFF.toByte; broken(lenAt + 3) = 0x7F.toByte
    assert(Multimodal.demuxAvi(broken).isEmpty)
  }

  test("measured gate margins hold: AVI twins pair at maxDist=6, foils never") {
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
    for (id <- 0L until 100L) {
      val w = 18 + (id % 7).toInt
      val h = 16 + (id % 5).toInt
      def hashes(variant: Int): Seq[String] = {
        val avi = Multimodal.synthAvi(
          (0 until 3).map(f => jpegFrame(id, f, variant, w, h)), w, h)
        Multimodal.demuxVideo(avi).get
          .map(p => dhashOf(Multimodal.imageDecoder(p)))
      }
      val h0 = hashes(0); val h1 = hashes(1); val h2 = hashes(2)
      // twin: retouched frame 1 through JPEG loss (measured worst 5)
      assert((0 until 3).map(i => ham(h0(i), h1(i))).max <= 6,
        s"twin drifted past maxDist, id=$id")
      // foil: different spatial frequency (measured min 11)
      assert((0 until 3).map(i => ham(h0(i), h2(i))).min > 6,
        s"foil collided, id=$id")
    }
  }
}
