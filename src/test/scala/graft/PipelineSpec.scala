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
}
