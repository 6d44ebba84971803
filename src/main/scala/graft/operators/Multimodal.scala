package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with per-partition feature extraction.
  *
  * Real multimodal corpora carry image/audio/video bytes; this container
  * has no media codecs, so the DECODE STEP IS A DETERMINISTIC STUB
  * (identity over bytes) — clearly marked below. Everything around it is
  * the real Spark plumbing a 100 TB pipeline needs and is tested:
  *  - `binary` payload column + `struct` metadata through scan/shuffle/sink;
  *  - batched per-partition extraction via `mapPartitions` (one iterator
  *    per task — the Scala analogue of `mapInPandas`: amortizes model/codec
  *    init per partition instead of per row, the pattern a real decoder
  *    plugs into);
  *  - fixed-width feature vectors (`array<float>`) out, ready for the
  *    Similarity operators.
  */
object Multimodal {

  /** documents -> multimodal layout: (doc_id, payload binary, meta struct).
    * Text bytes stand in for media bytes. */
  def toMultimodal(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("kind"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        col("source").as("origin")).as("meta"))

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** A payload decoder: raw stored bytes -> decoded media bytes. Runs on
    * executors, so implementations must be serializable (a plain function
    * literal or a static method reference is). */
  type Decoder = Array[Byte] => Array[Byte]

  /** STUB DECODER (the default) — stands in for image/audio decode.
    * Deterministic identity: a real pipeline passes its codec call as the
    * `decode` parameter of [[sampleFrames]]/[[resizePayloads]]/
    * [[extractFeatures]] and keeps everything else unchanged. */
  val identityDecoder: Decoder = payload => payload

  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** STUB FRAME SAMPLER — stands in for video keyframe extraction. Emits
    * up to `maxFrames` consecutive `frameBytes`-wide windows of the
    * decoded payload as one row per frame (empty payloads emit none); a
    * real pipeline replaces the window slicing with the codec's keyframe
    * calls and keeps the row shape (doc_id, frame_idx, frame binary) and
    * per-partition batching unchanged. Frame math is pure arithmetic on
    * byte counts, so the correctness gate mirrors it in SQL. */
  def sampleFrames(spark: SparkSession, mm: DataFrame,
                   frameBytes: Int = 256, maxFrames: Int = 8,
                   decode: Decoder = identityDecoder): DataFrame = {
    require(frameBytes > 0 && maxFrames > 0)
    val rows = mm.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = decode(r.getAs[Array[Byte]](1))
        val nFrames = math.min(maxFrames.toLong,
          (bytes.length + frameBytes - 1L) / frameBytes).toInt
        (0 until nFrames).iterator.map { f =>
          val from = f * frameBytes
          val until = math.min(bytes.length, from + frameBytes)
          Row(id, f, java.util.Arrays.copyOfRange(bytes, from, until))
        }
      }
    }
    spark.createDataFrame(rows, frameSchema)
  }

  /** STUB RESIZER — stands in for image resizing. Normalizes every decoded
    * payload to exactly `targetBytes` (truncate, or cycle the payload to
    * pad; empty payloads become zero bytes) and rewrites `meta.n_bytes`
    * to match — the metadata-consistency contract a real resizer must
    * keep. Deterministic, so the spec pins outputs across runs. */
  def resizePayloads(spark: SparkSession, mm: DataFrame, targetBytes: Int,
                     decode: Decoder = identityDecoder): DataFrame = {
    require(targetBytes >= 0)
    // output shape == input shape: derive the schema from the input so the
    // meta struct contract lives in ONE place (toMultimodal); only the
    // n_bytes field is rewritten, positionally by name
    val proj = mm.select(col("doc_id"), col("payload"), col("meta"))
    val schema = proj.schema
    val nBytesIdx = schema("meta").dataType.asInstanceOf[StructType].fieldIndex("n_bytes")
    val rows = proj.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = decode(r.getAs[Array[Byte]](1))
        val out = new Array[Byte](if (bytes.isEmpty) 0 else targetBytes)
        var i = 0
        while (i < out.length) { out(i) = bytes(i % bytes.length); i += 1 }
        val meta = r.getStruct(2)
        val newMeta =
          if (meta == null) null
          else Row.fromSeq(meta.toSeq.updated(nBytesIdx, out.length.toLong))
        Row(r.get(0), out, newMeta)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  private val histSchema = StructType(
    StructField("doc_id", LongType, nullable = false) +:
      StructField("n_bytes", LongType, nullable = false) +:
      (0 until 16).map(b => StructField(s"c$b", LongType, nullable = false)))

  /** Exact 16-bin byte histogram (high nibble) per decoded payload as
    * SCALAR count columns — the oracle-checkable integer core of
    * [[extractFeatures]], which normalizes the same counts to floats.
    * Integer counts hash-match across engines; normalized float32 division
    * would drift in the last ulp. */
  def byteHistogram(spark: SparkSession, mm: DataFrame,
                    decode: Decoder = identityDecoder): DataFrame = {
    val rows = mm.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = decode(r.getAs[Array[Byte]](1))
        val hist = new Array[Long](16)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xFF) >> 4) += 1L; i += 1 }
        Row.fromSeq(r.getLong(0) +: bytes.length.toLong +: hist.toSeq)
      }
    }
    spark.createDataFrame(rows, histSchema)
  }

  /** Batched per-partition feature extraction: 16-bin normalized byte
    * histogram per payload (a deterministic fake "embedding" with the same
    * shape/cost profile as a features head). */
  def extractFeatures(spark: SparkSession, mm: DataFrame,
                      decode: Decoder = identityDecoder): DataFrame = {
    val rows = mm.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      // per-partition init happens here (codec/model load in a real pipeline)
      it.map { r =>
        val id = r.getLong(0)
        val bytes = decode(r.getAs[Array[Byte]](1))
        val hist = new Array[Float](16)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xFF) >> 4) += 1f; i += 1 }
        val total = math.max(bytes.length, 1).toFloat
        var b = 0
        while (b < 16) { hist(b) /= total; b += 1 }
        Row(id, hist.toSeq)
      }
    }
    spark.createDataFrame(rows, featureSchema)
  }
}
