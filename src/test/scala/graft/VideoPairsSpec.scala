package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Pins the GFV1 video path: demux round-trip, corrupt-container
  * rejection, frame-count strictness (a trimmed video is NOT a pair),
  * bad-frame exclusion, and candidate completeness vs brute force.
  */
class VideoPairsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  private def png(seed: Int) =
    Multimodal.synthPng(20, 16, i => (i * (31 + seed % 11) + seed * 7) % 256)

  private def df(rows: (Long, Array[Byte])*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, p) => Row(id, p) }),
      schema)

  test("demux round-trips synthVideo exactly") {
    val frames = Seq(png(1), png(2), png(3))
    val got = Multimodal.demuxVideo(Multimodal.synthVideo(frames))
    assert(got.isDefined)
    assert(got.get.size === 3)
    got.get.zip(frames).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("corrupt containers and non-video payloads demux to None") {
    assert(Multimodal.demuxVideo("not a video".getBytes).isEmpty)
    val truncated = Multimodal.synthVideo(Seq(png(1))).dropRight(5)
    assert(Multimodal.demuxVideo(truncated).isEmpty)
    assert(Multimodal.demuxVideo(Array[Byte]('G', 'F', 'V', '1')).isEmpty)
  }

  test("same frames pair; a trimmed copy (fewer frames) does not") {
    val v3 = Multimodal.synthVideo(Seq(png(1), png(2), png(3)))
    val v3b = Multimodal.synthVideo(Seq(png(1), png(2), png(3)))
    val v2 = Multimodal.synthVideo(Seq(png(1), png(2)))
    val pairs = Multimodal.videoPairs(spark, df(1L -> v3, 2L -> v3b, 3L -> v2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("a video with an undecodable frame is excluded from pairing") {
    val good = Multimodal.synthVideo(Seq(png(1), png(2)))
    val bad = Multimodal.synthVideo(Seq(png(1), "junk frame".getBytes))
    val pairs = Multimodal.videoPairs(spark, df(1L -> good, 2L -> bad))
    assert(pairs.count() === 0)
    // the bad frame surfaces as a null-dhash row, not a crash
    val fh = Multimodal.videoFrameDHash(spark, df(2L -> bad)).collect()
    assert(fh.length === 2 && fh.count(_.isNullAt(2)) === 1)
  }

  test("frame-0 pigeonhole candidates are complete vs brute force") {
    // 4 families x 2 copies (the copy retouches one frame's sparse
    // pixels — a near-dup, not an identical file), 2 frames each
    val rows = for (fam <- 0 until 4; b <- 0 until 2) yield {
      val id = (fam * 2 + b).toLong
      val mk = (f: Int) => Multimodal.synthPng(20, 16,
        i => ((i * (31 + fam * 12) + f * 29 +
          (if (b == 1 && f == 1 && i % 29 == 0) 8 else 0)) % 256).toInt)
      (id, Multimodal.synthVideo(Seq(mk(0), mk(1))))
    }
    val d = df(rows: _*)
    val fh = Multimodal.videoFrameDHash(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    def ham(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    val brute = (for {
      a <- rows.map(_._1); b <- rows.map(_._1) if a < b
      mh = (0L to 1L).map(f => ham(fh((a, f)), fh((b, f)))).max if mh <= 7
    } yield (a, b, mh.toLong)).toSet
    val got = Multimodal.videoPairs(spark, d, maxDist = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(got === brute)
    assert(brute.nonEmpty)
  }
}
