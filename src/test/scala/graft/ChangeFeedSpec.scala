package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sinks.SnapshotTable

/** Row-level change data feed over the snapshot-table log: per-commit
  * row-multiset deltas with _change_type / _commit_version /
  * _commit_timestamp. The invariant under test everywhere: applying the
  * feed's deltas to the from-snapshot reproduces the to-snapshot as a
  * multiset — for ANY commit mix (appends, SQL DML rewrites, metadata
  * deletes, compaction, truncate). */
class ChangeFeedSpec extends AnyFunSuite with SparkSessionTestWrapper {

  spark.conf.set("spark.sql.catalog.graft",
    "graft.sources.SnapshotTableCatalog")

  private def freshDir(): String = {
    val d = Files.createTempDirectory("cdf").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def df(lo: Long, hi: Long) =
    spark.range(lo, hi).select(col("id"),
      concat(lit("r"), col("id")).as("name"), (col("id") * 2.5).as("v"))

  /** multiset check: from-snapshot + inserts - deletes == to-snapshot */
  private def feedReconstructs(dir: String, from: Long): Unit = {
    val cf = SnapshotTable.changeFeed(spark, dir, from)
    val ins = cf.filter(col("_change_type") === "insert")
      .drop("_change_type", "_commit_version", "_commit_timestamp")
    val del = cf.filter(col("_change_type") === "delete")
      .drop("_change_type", "_commit_version", "_commit_timestamp")
    val base = if (from == 0) df(0, 0)
      else SnapshotTable.read(spark, dir, Some(from - 1))
    val reconstructed = base.unionByName(ins, allowMissingColumns = true)
      .groupBy("id").agg(count(lit(1)).as("n"))
      .join(del.groupBy("id").agg(count(lit(1)).as("d")), Seq("id"), "left")
      .withColumn("net", col("n") - coalesce(col("d"), lit(0L)))
    val target = SnapshotTable.read(spark, dir)
      .groupBy("id").agg(count(lit(1)).as("t"))
    val mismatch = reconstructed.join(target, Seq("id"), "full")
      .filter(coalesce(col("net"), lit(0L)) =!=
        coalesce(col("t"), lit(0L)))
    assert(mismatch.count() === 0,
      s"feed deltas do not reconstruct the snapshot:\n" +
        mismatch.limit(5).collect().mkString("\n"))
  }

  test("appends emit pure inserts with their commit version and a " +
    "monotone timestamp") {
    val dir = freshDir()
    SnapshotTable.commit(spark, df(0, 50), dir, "overwrite")
    SnapshotTable.commit(spark, df(50, 70), dir, "append")
    SnapshotTable.commit(spark, df(70, 80), dir, "append")

    val cf = SnapshotTable.changeFeed(spark, dir, 1)
    assert(cf.filter(col("_change_type") =!= "insert").count() === 0)
    assert(cf.count() === 30)
    val byV = cf.groupBy("_commit_version").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byV === Map(1L -> 20L, 2L -> 10L))
    val ts = cf.select("_commit_version", "_commit_timestamp").distinct()
      .orderBy("_commit_version").collect().map(_.getTimestamp(1).getTime)
    assert(ts.sorted.sameElements(ts), "commit timestamps not monotone")
    feedReconstructs(dir, 1)
  }

  test("a SQL DELETE rewrite emits removed-file deletes plus survivor " +
    "re-inserts whose multisets net to exactly the deleted rows") {
    val dir = freshDir()
    SnapshotTable.commit(spark,
      df(0, 200).repartitionByRange(8, col("id")), dir, "overwrite",
      statsCols = Seq("id"))
    // [40, 70) straddles two range files, so survivors of both MUST
    // re-emit as inserts alongside the removed files' deletes
    spark.sql(s"DELETE FROM graft.`$dir` " +
      "WHERE id >= 40 AND id < 70 AND name IS NOT NULL")

    val cf = SnapshotTable.changeFeed(spark, dir, 1)
    val ins = cf.filter(col("_change_type") === "insert")
    val del = cf.filter(col("_change_type") === "delete")
    assert(ins.count() > 0, "no survivor re-inserts — range unexpectedly " +
      "file-aligned")
    assert(ins.count() - del.count() === -30L)
    def ksum(d: org.apache.spark.sql.DataFrame) =
      d.agg(coalesce(sum(col("id")), lit(0L))).head().getLong(0)
    assert(ksum(ins) - ksum(del) === -(40L until 70L).sum)
    feedReconstructs(dir, 1)
  }

  test("metadata-only delete, compaction and truncate all reconstruct; " +
    "from == oldest version replays the initial overwrite as inserts") {
    val dir = freshDir()
    SnapshotTable.commit(spark,
      df(0, 100).repartitionByRange(4, col("id")), dir, "overwrite",
      statsCols = Seq("id"))
    SnapshotTable.commit(spark, df(100, 120), dir, "append",
      statsCols = Seq("id"))
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id >= 10 AND id < 40")
    SnapshotTable.compact(spark, dir)
    spark.sql(s"TRUNCATE TABLE graft.`$dir`")
    SnapshotTable.commit(spark, df(500, 510), dir, "append",
      statsCols = Seq("id"))

    feedReconstructs(dir, 0) // whole history from the initial overwrite
    feedReconstructs(dir, 2) // mid-history span opening on the rewrite

    // truncate emits deletes for every pre-truncate row
    val cf = SnapshotTable.changeFeed(spark, dir, 4, Some(4))
    assert(cf.filter(col("_change_type") =!= "delete").count() === 0)
    assert(cf.count() === 90) // 120 - 30 deleted
  }

  test("schema evolution mid-span null-fills by name in the feed") {
    val dir = freshDir()
    SnapshotTable.commit(spark, df(0, 10), dir, "overwrite")
    SnapshotTable.commit(spark,
      df(10, 15).withColumn("extra", lit(7L)), dir, "append")
    val cf = SnapshotTable.changeFeed(spark, dir, 0)
    assert(cf.columns.contains("extra"))
    assert(cf.filter(col("extra").isNotNull).count() === 5)
    assert(cf.count() === 15)
  }

  test("DSv2 readChangeFeed equals the programmatic feed, including " +
    "column pruning") {
    val dir = freshDir()
    SnapshotTable.commit(spark,
      df(0, 100).repartitionByRange(4, col("id")), dir, "overwrite",
      statsCols = Seq("id"))
    SnapshotTable.commit(spark, df(100, 120), dir, "append")
    spark.sql(s"DELETE FROM graft.`$dir` " +
      "WHERE id >= 10 AND id < 40 AND name IS NOT NULL")

    val dsv2 = spark.read.format("graft-table")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .load(dir)
    val api = SnapshotTable.changeFeed(spark, dir, 1)
    def key(d: org.apache.spark.sql.DataFrame) = d
      .select(col("id"), col("_change_type"), col("_commit_version"))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length)
      .toMap
    assert(key(dsv2) === key(api))
    // commit timestamps surface as real timestamps and agree
    assert(dsv2.select("_commit_version", "_commit_timestamp").distinct()
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
      === api.select("_commit_version", "_commit_timestamp").distinct()
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap)
    // pruned projection still carries the per-slice constants
    val pruned = spark.read.format("graft-table")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .load(dir).select("_change_type", "id")
    assert(pruned.filter(col("_change_type") === "delete").count() ===
      api.filter(col("_change_type") === "delete").count())
    // endingVersion bounds the span
    val v1only = spark.read.format("graft-table")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .option("endingVersion", "1").load(dir)
    assert(v1only.count() === 20)
    assert(v1only.filter(col("_change_type") =!= "insert").count() === 0)
  }

  test("streaming readChangeFeed: DML rewrites flow through as " +
    "delete+insert slices instead of fencing the stream") {
    val dir = freshDir()
    SnapshotTable.commit(spark,
      df(0, 100).repartitionByRange(4, col("id")), dir, "overwrite",
      statsCols = Seq("id"))

    val q = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true").load(dir)
      .writeStream.format("memory").queryName("cdf_stream")
      .option("checkpointLocation", freshDir()).start()
    try {
      q.processAllAvailable()
      // no startingVersion: tails changes AFTER stream start
      assert(spark.table("cdf_stream").count() === 0)

      SnapshotTable.commit(spark, df(100, 120), dir, "append")
      q.processAllAvailable()
      val afterAppend = spark.table("cdf_stream")
      assert(afterAppend.count() === 20)
      assert(afterAppend.filter(col("_change_type") =!= "insert")
        .count() === 0)

      // a DML rewrite would FENCE the plain source; the CDF stream
      // emits its delta instead
      spark.sql(s"DELETE FROM graft.`$dir` " +
        "WHERE id >= 10 AND id < 30 AND name IS NOT NULL")
      q.processAllAvailable()
      val all = spark.table("cdf_stream")
      val ins = all.filter(col("_change_type") === "insert").count()
      val del = all.filter(col("_change_type") === "delete").count()
      assert(ins - del === 0L,
        s"net change of append(+20) then delete(-20) must cancel: " +
          s"ins=$ins del=$del")
      assert(del > 0)
      // replaying from v0 via startingVersion reconstructs everything
      val replay = spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").option("startingVersion", "0")
        .load(dir)
        .writeStream.format("memory").queryName("cdf_replay")
        .option("checkpointLocation", freshDir()).start()
      try {
        replay.processAllAvailable()
        val r = spark.table("cdf_replay")
        val net = r.filter(col("_change_type") === "insert").count() -
          r.filter(col("_change_type") === "delete").count()
        assert(net === SnapshotTable.read(spark, dir).count())
      } finally replay.stop()
    } finally q.stop()
  }

  test("expired history refuses loudly; an in-log span works after " +
    "expiry") {
    val dir = freshDir()
    SnapshotTable.commit(spark, df(0, 10), dir, "overwrite")
    SnapshotTable.commit(spark, df(10, 20), dir, "append")
    SnapshotTable.commit(spark, df(20, 30), dir, "append")
    SnapshotTable.expireVersions(spark, dir, keepLast = 2)
    val ex = intercept[IllegalArgumentException] {
      SnapshotTable.changeFeed(spark, dir, 0)
    }
    assert(ex.getMessage.contains("expired") ||
      ex.getMessage.contains("not in the surviving log"))
    assert(SnapshotTable.changeFeed(spark, dir, 2).count() === 10)
  }
}
