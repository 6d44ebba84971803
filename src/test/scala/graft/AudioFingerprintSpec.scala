package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Pins the audio envelope fingerprint: volume invariance (the defining
  * property — cross-multiplied mean comparisons cancel any constant
  * gain), envelope sensitivity, sub-65-sample nulls, non-audio nulls,
  * pigeonhole completeness, and partitioning invariance.
  */
class AudioFingerprintSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  private def wavs(rows: (Long, Array[Short])*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, s) =>
        Row(id, Multimodal.synthWav(8000, s))
      }),
      schema)

  private def fpOf(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    Multimodal.audioFingerprint(spark, df).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).orNull).toMap

  // envelope with per-frame pseudo-random amplitude, 390 samples
  private def env(seed: Long, n: Int = 390): Array[Short] =
    Array.tabulate(n) { i =>
      val f = i.toLong * 65 / n
      val m = seed * 131 + f * 7919
      (500 + (m * m) % 14983).toShort
    }

  test("doubling the volume leaves the fingerprint unchanged") {
    val base = env(1L)
    val loud = base.map(s => (s * 2).toShort)
    val h = fpOf(wavs(1L -> base, 2L -> loud))
    assert(h(1L) !== null)
    assert(h(1L) === h(2L))
  }

  test("a different envelope differs in many bits") {
    val h = fpOf(wavs(1L -> env(1L), 2L -> env(9L)))
    val d = h(1L).zip(h(2L)).count(p => p._1 != p._2)
    assert(d > 10, s"hamming only $d")
  }

  test("too-short audio and non-audio payloads yield null") {
    import org.apache.spark.sql.functions._
    val tiny = wavs(1L -> Array.tabulate(50)(i => (i * 100).toShort))
    assert(fpOf(tiny)(1L) === null)
    val notAudio = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(2L, Array.tabulate(200)(_.toByte)))),
      schema)
    assert(fpOf(notAudio)(2L) === null)
    assert(Multimodal.audioPairs(spark, tiny.unionByName(notAudio)).count() === 0)
  }

  test("pigeonhole candidates are complete: pairs equal brute force") {
    val rows = (0L until 20L).map(id => id -> env(id % 5 + 100 * (id % 2)))
    val df = wavs(rows: _*)
    val h = fpOf(df)
    def ham(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    val brute = (for {
      a <- h.keys; b <- h.keys if a < b
      d = ham(h(a), h(b)) if d <= 7
    } yield (a, b, d.toLong)).toSet
    val got = Multimodal.audioPairs(spark, df, maxDist = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === brute)
    assert(brute.nonEmpty) // the seed collisions above plant real pairs
  }

  test("fingerprints are partitioning-invariant") {
    val rows = (0L until 30L).map(id => id -> env(id))
    val a = fpOf(wavs(rows: _*))
    val b = Multimodal.audioFingerprint(spark, wavs(rows: _*).repartition(7))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
  }
}
