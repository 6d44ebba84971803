package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** The streamed LEFT OUTER join must equal the batch left join row-set
  * for row-set, including the null-padded unmatched errors that only
  * emit at watermark eviction. */
class StreamLeftJoinSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("streamed left join equals batch left join, nulls included") {
    val d = "/root/testdata/sf0.001"
    val streamed = EventStream.clickErrorLeftJoin(spark, d)
      .select("user_id", "err_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) Long.MinValue else r.getLong(2)))
      .sorted.toSeq

    val e = graft.Tables.t(spark, d, "events")
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("err_ts"), col("event_id").as("err_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val batch = errors.join(clicks,
        errors("user_id") === clicks("c_user") &&
          col("click_ts") <= col("err_ts") &&
          col("click_ts") > col("err_ts") - expr("INTERVAL 5 MINUTES"),
        "left_outer")
      .select("user_id", "err_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) Long.MinValue else r.getLong(2)))
      .sorted.toSeq

    assert(streamed.nonEmpty)
    assert(streamed.exists(_._3 == Long.MinValue),
      "fixture should contain at least one unmatched error")
    assert(streamed === batch)
  }

  test("streamed full outer join equals batch full join, both null sides included") {
    val d = "/root/testdata/sf0.001"
    def norm(r: org.apache.spark.sql.Row): (Long, Long, Long) =
      (r.getLong(0),
        if (r.isNullAt(1)) Long.MinValue else r.getLong(1),
        if (r.isNullAt(2)) Long.MinValue else r.getLong(2))
    val streamed = EventStream.clickErrorFullJoin(spark, d)
      .select("user_id", "err_id", "click_id").collect()
      .map(norm).sorted.toSeq

    val e = graft.Tables.t(spark, d, "events")
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("err_ts"), col("event_id").as("err_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val batch = errors.join(clicks,
        errors("user_id") === clicks("c_user") &&
          col("click_ts") <= col("err_ts") &&
          col("click_ts") > col("err_ts") - expr("INTERVAL 5 MINUTES"),
        "full_outer")
      .select(coalesce(errors("user_id"), col("c_user")).as("user_id"),
        col("err_id"), col("click_id")).collect()
      .map(norm).sorted.toSeq

    assert(streamed.exists(t => t._3 == Long.MinValue && t._2 != Long.MinValue),
      "fixture should contain an unmatched error")
    assert(streamed.exists(t => t._2 == Long.MinValue && t._3 != Long.MinValue),
      "fixture should contain an unmatched click")
    assert(streamed === batch)
  }
}
