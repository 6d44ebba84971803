package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.streaming.EventStream

class PipelineSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val sf = "/root/testdata/sf0.001"

  test("streaming hourly agg equals batch aggregation (exactly-once contract)") {
    val streamed = EventStream.hourlyAgg(spark, sf)
      .select("hour", "event_type", "n", "sum_value").collect().toSet
    val batch = Tables.t(spark, sf, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Tables.dsumr(col("value")).as("sum_value"))
      .collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming session counts match a batch gaps-and-islands computation") {
    val streamed = EventStream.sessionCounts(spark, sf)
      .groupBy(col("user_id")).agg(max(col("n_sessions")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tsu"))
    val batch = Tables.t(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"))
      .withColumn("brk",
        when(lag(col("tsu"), 1).over(w).isNull ||
          col("tsu") - lag(col("tsu"), 1).over(w) > 1800000000L, 1L).otherwise(0L))
      .groupBy(col("user_id")).agg(sum(col("brk")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    assert(streamed.values.sum > streamed.size, "expected multi-session users")
  }

  test("streaming dedup equals batch DISTINCT; watermark variant emits no in-window dup") {
    val streamed = EventStream.dedupPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)

    // bounded-state variant: within one processing pass no key may be
    // emitted twice (duplicates inside the watermark window are dropped)
    val wm = EventStream.dedupWithinWatermark(spark, sf)
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(wm == 0, s"watermark dedup emitted $wm duplicated keys")
  }

  test("multimodal layout carries binary payload + typed metadata") {
    val mm = Multimodal.toMultimodal(Tables.t(spark, sf, "documents"))
    val row = mm.orderBy(col("doc_id")).first()
    val payload = row.getAs[Array[Byte]]("payload")
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(payload.length == meta.getAs[Long]("n_bytes"))
    assert(meta.getAs[String]("kind") == "text/plain")
    // survives an ORC round-trip (binary + struct through the sink)
    val dir = java.nio.file.Files.createTempDirectory("mm").toString
    graft.sinks.OrcSink.write(mm, dir, "mm")
    val back = graft.sinks.OrcSink.read(spark, s"$dir/mm")
    assert(back.count() == mm.count())
    assert(back.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
  }

  test("stream-stream join equals the batch join (exactly-once contract)") {
    val streamed = EventStream.clickErrorJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val e = Tables.t(spark, sf, "events")
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("err_ts"), col("event_id").as("err_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val batch = errors.join(clicks,
        col("user_id") === col("cu") &&
          col("click_ts") <= col("err_ts") &&
          col("click_ts") > col("err_ts") - expr("INTERVAL 5 MINUTES"))
      .select(col("user_id"), col("err_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("frame sampling reconstructs the payload prefix; resize keeps metadata honest") {
    val mm = Multimodal.toMultimodal(Tables.t(spark, sf, "documents"))
    val frames = Multimodal.sampleFrames(spark, mm, frameBytes = 64, maxFrames = 4)
      .collect().groupBy(_.getLong(0))
    val payloads = mm.select(col("doc_id"), col("payload")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    frames.foreach { case (id, fr) =>
      val joined = fr.sortBy(_.getInt(1)).flatMap(_.getAs[Array[Byte]](2))
      val expectLen = math.min(payloads(id).length, 4 * 64)
      assert(joined.toSeq == payloads(id).take(expectLen).toSeq,
        s"doc $id frames must be the consecutive payload prefix")
      assert(fr.length == math.min(4, (payloads(id).length + 63) / 64))
    }

    val resized = Multimodal.resizePayloads(spark, mm, targetBytes = 128).collect()
    resized.foreach { r =>
      val p = r.getAs[Array[Byte]]("payload")
      assert(p.length == 128 || (p.isEmpty && payloads(r.getLong(0)).isEmpty))
      assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[Long]("n_bytes") == p.length,
        "meta.n_bytes must track the resized payload")
    }
    assert(resized.nonEmpty)
  }

  test("a custom decoder plugs into sampleFrames/extractFeatures/resizePayloads") {
    val mm = Multimodal.toMultimodal(Tables.t(spark, sf, "documents")
      .filter(col("doc_id") < 20))
    // "codec": reverse the payload bytes — observable, deterministic
    val reverse: Multimodal.Decoder = b => b.reverse
    val payloads = mm.select(col("doc_id"), col("payload")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap

    val frames = Multimodal.sampleFrames(spark, mm, frameBytes = 64, maxFrames = 4,
        decode = reverse).collect().groupBy(_.getLong(0))
    frames.foreach { case (id, fr) =>
      val joined = fr.sortBy(_.getInt(1)).flatMap(_.getAs[Array[Byte]](2))
      val decoded = payloads(id).reverse
      assert(joined.toSeq == decoded.take(math.min(decoded.length, 256)).toSeq,
        s"doc $id frames must come from the DECODED payload")
    }

    val feats = Multimodal.extractFeatures(spark, mm, decode = reverse)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val featsId = Multimodal.extractFeatures(spark, mm)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // byte histogram is order-insensitive, so reverse must equal identity:
    // proves the custom decoder flowed through without corrupting bytes
    assert(feats == featsId)

    val res = Multimodal.resizePayloads(spark, mm, targetBytes = 8, decode = reverse)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    res.foreach { case (id, p) =>
      val decoded = payloads(id).reverse
      val expect = Array.tabulate(if (decoded.isEmpty) 0 else 8)(i => decoded(i % decoded.length))
      assert(p.toSeq == expect.toSeq, s"doc $id resize must start from decoded bytes")
    }
  }

  test("feature extraction is deterministic with unit mass and fixed width") {
    val mm = Multimodal.toMultimodal(Tables.t(spark, sf, "documents"))
    val f1 = Multimodal.extractFeatures(spark, mm)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f2 = Multimodal.extractFeatures(spark, mm.repartition(7))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1 == f2)
    f1.values.foreach { v =>
      assert(v.length == 16)
      assert(math.abs(v.sum - 1.0f) < 1e-3)
    }
  }

  test("imageDecoder: PNG round-trip reproduces every pixel exactly") {
    val w = 5; val h = 3
    val png = Multimodal.synthPng(w, h, i => (i * 37 + 11) % 256)
    val dec = Multimodal.imageDecoder(png)
    assert(dec.length == 8 + 3 * w * h)
    val gotW = java.nio.ByteBuffer.wrap(dec, 0, 4).getInt
    val gotH = java.nio.ByteBuffer.wrap(dec, 4, 4).getInt
    assert(gotW == w && gotH == h)
    for (i <- 0 until w * h; c <- 0 until 3) {
      val expected = ((i * 37 + 11) % 256).toByte
      assert(dec(8 + 3 * i + c) == expected, s"pixel $i channel $c")
    }
  }

  test("imageDecoder: BMP decodes; non-image and corrupt payloads fall back") {
    // BMP through the same JRE codec
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x00FF00)
    img.setRGB(0, 1, 0x0000FF); img.setRGB(1, 1, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val dec = Multimodal.imageDecoder(bos.toByteArray)
    assert(dec.length == 8 + 12)
    assert(dec.slice(8, 11).toSeq == Seq(0xFF.toByte, 0, 0)) // red first
    // non-image payload: identity
    val txt = "just some text".getBytes("UTF-8")
    assert(Multimodal.imageDecoder(txt) eq txt)
    // PNG magic but corrupt body: identity fallback, no exception
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      1, 2, 3, 4, 5)
    assert(Multimodal.imageDecoder(corrupt) eq corrupt)
  }

  test("wavDecoder: PCM WAV round-trip reproduces every sample exactly") {
    val samples = Array.tabulate[Short](37)(i => ((i * 1000 - 18000) % 32768).toShort)
    val wav = Multimodal.synthWav(8000, samples)
    val dec = Multimodal.wavDecoder(wav)
    assert(dec.length == 8 + 2 * samples.length)
    assert(java.nio.ByteBuffer.wrap(dec, 0, 4).getInt == 8000)
    assert(java.nio.ByteBuffer.wrap(dec, 4, 4).getInt == 1)
    for (i <- samples.indices) {
      val got = ((dec(8 + 2 * i) & 0xFF) | (dec(9 + 2 * i) << 8)).toShort
      assert(got == samples(i), s"sample $i")
    }
    // non-WAV and corrupt-RIFF payloads fall back to identity
    val txt = "not audio".getBytes("UTF-8")
    assert(Multimodal.wavDecoder(txt) eq txt)
    val corrupt = "RIFFxxxxWAVEbroken".getBytes("UTF-8")
    assert(Multimodal.wavDecoder(corrupt) eq corrupt)
    // mediaDecoder routes by magic: WAV -> wav layout, PNG -> image layout
    assert(Multimodal.mediaDecoder(wav).toSeq == dec.toSeq)
    val png = Multimodal.synthPng(2, 2, _ => 7)
    assert(java.nio.ByteBuffer.wrap(Multimodal.mediaDecoder(png), 0, 4).getInt == 2)
  }

  test("decodeImageStats: histogram over decoded pixels matches the formula") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rows = (0L until 10L).map { id =>
      val w = 4 + (id % 5).toInt; val h = 3 + (id % 7).toInt
      Row(id, Multimodal.synthPng(w, h, i => ((id * 31 + i) % 256).toInt))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val got = Multimodal.decodeImageStats(spark, df)
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- 0L until 10L) {
      val w = 4 + (id % 5).toInt; val h = 3 + (id % 7).toInt
      val r = got(id)
      assert(r.getLong(1) == w && r.getLong(2) == h)
      val expected = new Array[Long](16)
      for (i <- 0 until w * h) expected((((id * 31 + i) % 256) >> 4).toInt) += 3L
      val gotHist = (0 until 16).map(b => r.getLong(3 + b))
      assert(gotHist == expected.toSeq, s"doc $id")
    }
  }

  test("temporal split: strict/inclusive boundaries, embargo excluded from both") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, 10L), (2L, 20L), (3L, 25L), (4L, 30L), (5L, 35L))
      .toDF("id", "t")
    val got = graft.operators.Sampling.splitByTime(df, col("t"), lit(20L), lit(30L))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // t=20 is NOT train (strict <); t=30 IS test (inclusive >=)
    assert(got === Map(1L -> "train", 2L -> "embargo", 3L -> "embargo",
      4L -> "test", 5L -> "test"))
  }
}
