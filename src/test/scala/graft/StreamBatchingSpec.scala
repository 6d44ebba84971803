package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Proves the stateful streaming operators' cross-micro-batch contracts
  * on GENUINELY multi-batch runs: the fixture is staged as three
  * time-ordered files and consumed with maxFilesPerTrigger=1, so state
  * must merge across three real micro-batches — funnel state because
  * min-merge commutes, EWMA/session state under the documented
  * time-ordered-arrival contract. Single-batch equivalence would hide a
  * state-merge bug; this cannot.
  */
class StreamBatchingSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val base = 1583020800000000L // 2020-03-01T00:00:00Z micros

  /** sf-dir whose events.parquet is a DIRECTORY of 3 hour-banded parts. */
  private def multiFileDir(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_mb").toString
    val evDir = s"$dir/events.parquet"
    Files.createDirectories(java.nio.file.Paths.get(evDir))
    // 5 users; each hour band lands in its own file, in time order.
    // user u emits (signup@h0, view@h1, click+purchase@h2) with values.
    val bands = Seq(
      (0, Seq(("signup", 0.0))),
      (1, Seq(("view", 10.0))),
      (2, Seq(("click", 20.0), ("purchase", 40.0))))
    var eid = 0L
    bands.foreach { case (h, evs) =>
      val rows = for (u <- 1L to 5L; (ty, v) <- evs) yield {
        eid += 1
        (eid, base + h * 3600000000L + u * 1000000L + eid, u, ty, v, "{}")
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_micros(col("ts")))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/stage")
      val part = new java.io.File(s"$dir/stage").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath,
        java.nio.file.Paths.get(f"$evDir/part-$h%03d.parquet"))
    }
    dir
  }

  private def withSingleFileTriggers[A](body: => A): A = {
    spark.conf.set("graft.stream.maxFilesPerTrigger", "1")
    try body finally spark.conf.unset("graft.stream.maxFilesPerTrigger")
  }

  test("funnel, EWMA and session state merge correctly across 3 micro-batches") {
    val d = multiFileDir()
    withSingleFileTriggers {
      // --- funnel: every user completes the ordered funnel ---
      val fs = EventStream.funnelState(spark, d)
      // multi-batch proof: users emit one Update row per batch they
      // appear in — 3 batches x 5 users = 15 rows, not 5
      assert(fs.count() === 15L)
      val finalState = fs.groupBy(col("user_id"))
        .agg(min(col("t_signup")).as("s"), min(col("t_view")).as("v"),
          min(col("t_click")).as("c"), min(col("t_purchase")).as("p"))
        .collect()
      assert(finalState.length === 5)
      finalState.foreach { r =>
        assert(r.getLong(1) < r.getLong(2) && r.getLong(2) < r.getLong(3) &&
          r.getLong(3) < r.getLong(4))
      }

      // --- EWMA: streamed fold across batches == batch fold ---
      val ewWin = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("n").desc)
      val streamedFinal = EventStream.ewmaState(spark, d, alpha = 0.5)
        .withColumn("rn", row_number().over(ewWin)).filter(col("rn") === 1)
        .select(col("user_id"), col("n"), col("ewma_last"))
        .orderBy(col("user_id")).collect()
      val batch = graft.operators.TimeSeries.ewmaByKey(
          Tables.t(spark, d, "events")
            .select(col("user_id"), unix_micros(col("ts")).as("us"),
              col("event_id"), col("value")),
          "user_id", "us", "event_id", "value", alpha = 0.5)
        .orderBy(col("user_id")).collect()
      assert(streamedFinal.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq === batch.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
      // hand-check one series: 0 -> .5*10+.5*0=5 -> .5*20+2.5=12.5 -> .5*40+6.25=26.25
      assert(streamedFinal.head.getDouble(2) === 26.25)

      // --- sessions: 1 session per user (gaps 1h > 30min => 3 sessions) ---
      val sc = EventStream.sessionCounts(spark, d)
        .groupBy(col("user_id")).agg(max(col("n_sessions")).as("ns"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(sc === (1L to 5L).map(_ -> 3L).toMap)
    }
  }
}
