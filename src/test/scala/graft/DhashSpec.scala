package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Pins the dHash perceptual image fingerprint: brightness invariance
  * (the property that makes it a NEAR-dup hash, not a byte hash),
  * sensitivity to structural change, sub-grid images yielding null,
  * pigeonhole candidate completeness at the maxDist bound, and
  * partitioning invariance.
  */
class DhashSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  private def imgs(rows: (Long, Int, Int, Int => Int)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, w, h, f) =>
        Row(id, Multimodal.synthPng(w, h, f))
      }),
      schema)

  private def hashOf(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    Multimodal.imageDHash(spark, df).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).orNull).toMap

  private val texture = (i: Int) => (i * 41) % 256

  test("constant brightness shift leaves the fingerprint unchanged") {
    val h = hashOf(imgs(
      (1L, 20, 16, texture),
      (2L, 20, 16, i => (texture(i) + 40) % 256 min 255)))
    // +40 without wraparound on most pixels — order of block means is
    // preserved, the defining invariance of a difference hash
    val shifted = hashOf(imgs((3L, 20, 16, i => math.min(texture(i) + 40, 255))))
    assert(h(1L) === shifted(3L))
  }

  test("structural change flips many bits; sparse retouch flips few") {
    val h = hashOf(imgs(
      (1L, 20, 16, texture),
      (2L, 20, 16, i => (i * 97) % 256), // different frequency
      (3L, 20, 16, i => (texture(i) + (if (i % 29 == 0) 8 else 0)) % 256)))
    def ham(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    assert(ham(h(1L), h(2L)) > 10)
    assert(ham(h(1L), h(3L)) <= 4)
  }

  test("images smaller than the 9x8 grid yield null, excluded from pairs") {
    val df = imgs((1L, 8, 8, texture), (2L, 20, 7, texture),
      (3L, 20, 16, texture), (4L, 20, 16, texture))
    val h = hashOf(df)
    assert(h(1L) === null && h(2L) === null)
    assert(h(3L) !== null)
    val pairs = Multimodal.dhashPairs(spark, df, maxDist = 6).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((3L, 4L)))
  }

  test("pigeonhole candidates are complete at the bound: pairs equal brute force") {
    // 12 images: 4 texture families x 3 brightness variants
    val rows = for (fam <- 0 until 4; b <- 0 until 3) yield {
      val id = (fam * 3 + b).toLong
      val mult = 31 + fam * 12
      (id, 20, 16, (i: Int) => (i * mult + b * 25) % 256)
    }
    val df = imgs(rows: _*)
    val h = hashOf(df)
    def ham(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    val brute = (for {
      a <- h.keys; b <- h.keys if a < b
      d = ham(h(a), h(b)) if d <= 7
    } yield (a, b, d.toLong)).toSet
    val got = Multimodal.dhashPairs(spark, df, maxDist = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === brute)
  }

  test("corrupt header with Int-overflowing w*h yields null, not a crash") {
    // w = h = 65536: 3*w*h = 3*2^32 overflows Int arithmetic to 0, so an
    // Int-typed bound check would admit this 16-byte buffer and the pixel
    // loop would throw inside the task; the Long-typed bound rejects it
    // and the documented null-dhash contract for undecodable payloads holds
    val hdr = java.nio.ByteBuffer.allocate(16).putInt(65536).putInt(65536)
      .putInt(0).putInt(0).array()
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, hdr))), schema)
    val got = Multimodal.imageDHash(spark, df, decode = identity).collect()
    assert(got.length === 1 && got(0).getString(1) === null)
  }

  test("fingerprints are partitioning-invariant") {
    val rows = (0L until 30L).map(id =>
      (id, 20, 16, (i: Int) => ((i * (31 + id % 11) + id * 7) % 256).toInt))
    val a = hashOf(imgs(rows: _*))
    val b = Multimodal.imageDHash(spark, imgs(rows: _*).repartition(7))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
  }
}
