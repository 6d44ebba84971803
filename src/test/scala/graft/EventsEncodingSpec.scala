package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Tables.events]] / [[graft.streaming.EventStream]] against fixture
  * `ts`-encoding drift: the driver's events.parquet has shipped both
  * INT64-nanos (rounds ≤6) and TIMESTAMP(micros, NTZ) (round 7+), and each
  * flip previously broke every events-reading gate at once. The same
  * logical rows are written in three physical encodings; the normalized
  * batch read and the streaming read must produce identical rows for all.
  */
class EventsEncodingSpec extends AnyFunSuite with SparkSessionTestWrapper {

  // 2020-03-01T00:00:00Z plus offsets that exercise sub-second precision:
  // micros survive every encoding; the nanos encoding carries extra
  // sub-micro digits that the div-1000 truncation must drop exactly.
  private val baseUs = 1583020800000000L
  private val rows = Seq(
    (1L, baseUs + 1L, 10L, "click", 1.5, "{}"),
    (2L, baseUs + 999999L, 10L, "view", 2.5, "{}"),
    (3L, baseUs + 3600L * 1000000L, 11L, "error", -1.0, "{\"k\":1}"),
    (4L, baseUs + 7261L * 1000000L + 123456L, 12L, "click", 0.0, "{}"))

  /** Write the fixture rows with `ts` in one of the three encodings,
    * returning a dir laid out like a driver sf dir (events.parquet file). */
  private def writeEncoded(encoding: String): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"graft_enc_$encoding").toString
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = encoding match {
      case "int64_nanos" =>
        // plain INT64 column of nanos — reads back as LongType, the same
        // reader-visible shape as parquet TIMESTAMP(NANOS) under the
        // legacy nanosAsLong conf (Spark cannot WRITE TIMESTAMP(NANOS));
        // + 789 sub-micro nanos on one row to pin exact truncation
        df.withColumn("ts",
          when(col("event_id") === 1L, col("ts") * 1000L + 789L)
            .otherwise(col("ts") * 1000L))
      case "timestamp_ntz" =>
        df.withColumn("ts", timestamp_micros(col("ts")).cast(TimestampNTZType))
      case "timestamp_ltz" =>
        df.withColumn("ts", timestamp_micros(col("ts")))
    }
    // single part file renamed to the fixture's events.parquet layout
    out.coalesce(1).write.mode("overwrite").parquet(s"$dir/stage")
    val part = new java.io.File(s"$dir/stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/events.parquet"))
    dir
  }

  private def expected: Seq[(Long, Long)] =
    rows.map { case (id, us, _, _, _, _) => (id, us) }

  private def collectBatch(dir: String): Seq[(Long, Long)] =
    Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)

  for (enc <- Seq("int64_nanos", "timestamp_ntz", "timestamp_ltz")) {
    test(s"batch read normalizes $enc to identical micros timestamps") {
      val dir = writeEncoded(enc)
      val got = collectBatch(dir)
      assert(got === expected)
      // normalized type is always TimestampType
      assert(Tables.events(spark, dir).schema("ts").dataType === TimestampType)
    }

    test(s"streaming read normalizes $enc identically to batch") {
      val dir = writeEncoded(enc)
      val streamed = graft.streaming.EventStream.hourlyAgg(spark, dir)
      val batch = Tables.events(spark, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), Tables.dsumr(col("value")).as("sum_value"))
        .select(col("window.start").as("hour"), col("event_type"),
          col("n"), col("sum_value"))
      val key = (r: Row) => (r.getTimestamp(0).getTime, r.getString(1))
      assert(streamed.collect().sortBy(key).toSeq ===
        batch.collect().sortBy(key).toSeq)
    }
  }

  test("an unsupported ts encoding fails loudly naming the column") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_enc_bad").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("string"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stage")
    val part = new java.io.File(s"$dir/stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/events.parquet"))
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("ts"))
    assert(e.getMessage.contains("drift"))
  }
}
