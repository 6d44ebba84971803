package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.sinks.SnapshotTable

/** The DataSource V2 surface over the snapshot table: batch reads with
  * time travel and pushed column pruning, schema-evolution null-fill,
  * full-type-matrix parity with the programmatic read path, and the
  * version-offset streaming source (initial snapshot + append tail,
  * non-append fencing, startingVersion, exactly-once across restart). */
class SnapshotTableSourceSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("snapsrc").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def df(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, s"r$i", i * 2.5)).toDF("id", "name", "v")

  test("batch read equals the programmatic read, including time travel") {
    val dir = freshDir()
    SnapshotTable.commit(spark, df(0, 100), dir, "overwrite",
      statsCols = Seq("id"))
    SnapshotTable.commit(spark, df(100, 150), dir, "append")
    SnapshotTable.commit(spark, df(500, 510), dir, "overwrite")

    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSet
    val latest = spark.read.format("graft-table").load(dir)
    assert(rows(latest) === rows(SnapshotTable.read(spark, dir)))
    assert(latest.count() === 10)

    val v1 = spark.read.format("graft-table")
      .option("versionAsOf", "1").load(dir)
    assert(v1.count() === 150)
    assert(v1.agg(sum(col("id"))).head().getLong(0) === (0L until 150L).sum)

    // timestampAsOf: resolve v1's monotonized stamp, read through it
    val h = SnapshotTable.history(spark, dir).find(_.version == 1L).get
    val ts = spark.read.format("graft-table")
      .option("timestampAsOf", h.timestampMs.toString).load(dir)
    assert(ts.count() === 150)
  }

  test("column pruning is pushed (readSchema shrinks) and " +
    "schema evolution null-fills by name") {
    val dir = freshDir()
    SnapshotTable.commit(spark, df(0, 50), dir, "overwrite")
    SnapshotTable.commit(spark,
      df(50, 60).withColumn("extra", lit("x")), dir, "append")

    val d = spark.read.format("graft-table").load(dir)
    assert(d.columns.toSeq === Seq("id", "name", "v", "extra"))
    assert(d.filter(col("extra").isNull).count() === 50)
    assert(d.filter(col("extra") === "x").count() === 10)

    val pruned = d.select("name")
    // the DSv2 scan's description carries its pruned column list
    val scanDesc = pruned.queryExecution.executedPlan.toString()
    assert(scanDesc.contains("cols=[name]"),
      s"expected pruned scan, got:\n$scanDesc")
    assert(pruned.collect().map(_.getString(0)).sorted.head === "r0")
    assert(pruned.count() === 60)
  }

  test("full type matrix round-trips identically to the programmatic read") {
    val dir = freshDir()
    val typed = spark.range(0, 64).select(
      col("id"),
      col("id").cast("int").as("i32"),
      (col("id") % 2 === 0).as("flag"),
      col("id").cast("double").as("d"),
      col("id").cast("float").as("f"),
      concat(lit("s"), col("id")).as("s"),
      col("id").cast("decimal(12,3)").as("dec"),
      to_date(lit("2024-03-01")).as("dt"),
      to_timestamp(lit("2024-03-01 12:34:56.789")).as("tstamp"),
      encode(concat(lit("b"), col("id")), "UTF-8").as("bin"),
      array(col("id"), col("id") + 1).as("arr"),
      struct(col("id").as("a"), lit("z").as("b")).as("st"))
    SnapshotTable.commit(spark, typed, dir, "overwrite")
    val viaApi = SnapshotTable.read(spark, dir)
    val viaDsv2 = spark.read.format("graft-table").load(dir)
    // the DSv2 surface reports nullable throughout (evolution null-fill)
    assert(viaDsv2.schema ===
      graft.sources.SnapshotTableProvider.deepNullable(viaApi.schema))
    // render binary as hex so the comparison is by value, not identity
    def render(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("bin", hex(col("bin"))).orderBy("id")
        .collect().map(_.toString).toSeq
    assert(render(viaApi) === render(viaDsv2))
  }

  test("pushed range filters prune files from the manifest " +
    "(numeric and string channels), conservatively") {
    val dir = freshDir()
    SnapshotTable.commit(spark,
      df(0, 1000).repartitionByRange(8, col("id")), dir, "overwrite",
      statsCols = Seq("id", "name"))
    // force one bin per file so partition count mirrors the kept set
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1")
    try {
      val all = spark.read.format("graft-table").load(dir)
      val nAll = all.rdd.getNumPartitions
      assert(nAll >= 8)

      val ranged = all.filter(col("id") >= 100 && col("id") < 200)
      assert(ranged.rdd.getNumPartitions < nAll, "numeric pruning inert")
      assert(ranged.count() === 100) // residual filter still applied
      assert(ranged.agg(sum(col("id"))).head().getLong(0)
        === (100L until 200L).sum)
      // plan carries the pruning evidence
      assert(ranged.queryExecution.executedPlan.toString()
        .contains("manifestPruning="))

      val eq = all.filter(col("id") === 42)
      assert(eq.rdd.getNumPartitions === 1)
      assert(eq.count() === 1)

      // string channel: names sort lexicographically within ranges only
      // loosely, so just require soundness + some pruning on a tight eq
      val sEq = all.filter(col("name") === "r500")
      assert(sEq.count() === 1)
      assert(sEq.rdd.getNumPartitions <= nAll)

      // a filter on a stats-less column prunes nothing but stays correct
      val noStats = all.filter(col("v") < 50.0)
      assert(noStats.rdd.getNumPartitions === nAll)
      assert(noStats.count() === 20)
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }

  test("DSv2 writes: append/overwrite through the commit protocol, " +
    "txn-stamped writes replay as no-ops") {
    val dir = freshDir()
    SnapshotTable.commit(spark, df(0, 100), dir, "overwrite",
      statsCols = Seq("id"))

    df(100, 150).write.format("graft-table").mode("append")
      .option("statsCols", "id").save(dir)
    assert(SnapshotTable.read(spark, dir).count() === 150)
    assert(SnapshotTable.currentVersion(spark, dir) === Some(1L))
    // stats option reached the manifest: the new file prunes
    val (_, kept, total) =
      SnapshotTable.scanPruned(spark, dir, "id", 0.0, 50.0)
    assert(kept < total)

    // exactly-once: same txn stamp twice → second write no-ops
    df(150, 160).write.format("graft-table").mode("append")
      .option("txnAppId", "writer1").option("txnSeq", "7").save(dir)
    df(150, 160).write.format("graft-table").mode("append")
      .option("txnAppId", "writer1").option("txnSeq", "7").save(dir)
    assert(SnapshotTable.read(spark, dir).count() === 160)
    assert(SnapshotTable.currentVersion(spark, dir) === Some(2L))

    df(900, 905).write.format("graft-table").mode("overwrite").save(dir)
    assert(SnapshotTable.read(spark, dir).count() === 5)
    // the pre-overwrite state is still time-travelable
    assert(SnapshotTable.read(spark, dir, Some(2)).count() === 160)
  }

  test("SQL surface: CREATE TABLE USING graft-table, SELECT, INSERT INTO") {
    val dir = freshDir()
    SnapshotTable.commit(spark, df(0, 100), dir, "overwrite",
      statsCols = Seq("id"))
    spark.sql("DROP TABLE IF EXISTS snap_sql")
    spark.sql(
      s"CREATE TABLE snap_sql USING `graft-table` OPTIONS (path '$dir')")
    try {
      assert(spark.sql("SELECT count(*) AS n FROM snap_sql")
        .head().getLong(0) === 100)
      assert(spark.sql(
        "SELECT sum(id) AS s FROM snap_sql WHERE id BETWEEN 10 AND 19")
        .head().getLong(0) === (10L until 20L).sum)
      // INSERT INTO rides the V1 write shim -> one atomic commit
      spark.sql("INSERT INTO snap_sql SELECT id, concat('r', id) AS name," +
        " cast(id AS double) * 2.5 AS v FROM range(100, 130)")
      assert(SnapshotTable.currentVersion(spark, dir) === Some(1L))
      assert(spark.sql("SELECT count(*) FROM snap_sql").head().getLong(0)
        === 130)
      assert(SnapshotTable.read(spark, dir).count() === 130)
    } finally spark.sql("DROP TABLE IF EXISTS snap_sql")
  }

  test("path catalog: SQL time travel via VERSION AS OF / TIMESTAMP AS OF " +
    "and INSERT INTO graft.`/dir`") {
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.SnapshotTableCatalog")
    val dir = freshDir()
    SnapshotTable.commit(spark, df(0, 100), dir, "overwrite",
      statsCols = Seq("id"))
    SnapshotTable.commit(spark, df(100, 150), dir, "append")

    assert(spark.sql(s"SELECT count(*) FROM graft.`$dir`")
      .head().getLong(0) === 150)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dir` VERSION AS OF 0")
      .head().getLong(0) === 100)
    val ts0 = SnapshotTable.history(spark, dir).last.timestampMs
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dir` TIMESTAMP AS OF " +
      s"timestamp_millis(${ts0}L)").head().getLong(0) === 100)

    spark.sql(s"INSERT INTO graft.`$dir` SELECT id, concat('r', id), " +
      "cast(id AS double) FROM range(150, 160)")
    assert(SnapshotTable.currentVersion(spark, dir) === Some(2L))
    assert(SnapshotTable.read(spark, dir).count() === 160)

    // a missing table resolves to the standard error, not a crash
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM graft.`/tmp/definitely_not_a_table_xyz`")
        .collect()
    }
    assert(ex.getMessage.toLowerCase.contains("table"))
  }

  test("scan statistics come from the manifest: a small table " +
    "broadcast-joins") {
    val dir = freshDir()
    SnapshotTable.commit(spark, df(0, 200), dir, "overwrite",
      statsCols = Seq("id"))
    val small = spark.read.format("graft-table").load(dir)
    val big = spark.range(0, 100000).select(col("id"),
      (col("id") % 7).as("w"))
    val joined = big.join(small, Seq("id"))
    val plan = joined.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"),
      s"manifest stats not reported — join planned without broadcast:\n" +
        plan.take(2000))
    assert(joined.count() === 200)
    // pruned scans report the PRUNED size: a filtered small side still
    // broadcasts (and the estimate shrinks with the kept set)
    val filtered = big.join(small.filter(col("id") < 25), Seq("id"))
    assert(filtered.queryExecution.executedPlan.toString()
      .contains("BroadcastHashJoin"))
    assert(filtered.count() === 25)
  }

  test("streaming SINK: one atomic txn-stamped commit per epoch, " +
    "exactly-once across checkpoint restart") {
    val dir = freshDir()
    val ckpt = freshDir()
    val src = freshDir()
    // bootstrap: an empty overwrite records the schema (tables are
    // created by a commit; streaming then appends)
    SnapshotTable.commit(spark, df(0, 0), dir, "overwrite")

    df(0, 40).write.parquet(s"$src/b0")
    val stream = spark.readStream.schema(df(0, 0).schema).parquet(s"$src/*")
    val q = stream.writeStream.format("graft-table")
      .option("checkpointLocation", ckpt).option("statsCols", "id")
      .start(dir)
    try {
      q.processAllAvailable()
      assert(SnapshotTable.read(spark, dir).count() === 40)
      df(40, 70).write.parquet(s"$src/b1")
      q.processAllAvailable()
      assert(SnapshotTable.read(spark, dir).count() === 70)
      // every epoch landed as an append commit with a txn stamp
      val h = SnapshotTable.history(spark, dir)
      assert(h.head.action === "append")
      assert(h.head.txnApp.exists(_.startsWith("stream-")))
      // stats option reached the manifest
      val (_, kept, total) =
        SnapshotTable.scanPruned(spark, dir, "id", 0.0, 10.0)
      assert(kept < total)
    } finally q.stop()

    // restart from the same checkpoint: processed epochs replay as
    // no-ops, only new data commits
    df(70, 80).write.parquet(s"$src/b2")
    val vsBefore = SnapshotTable.versions(spark, dir).size
    val q2 = stream.writeStream.format("graft-table")
      .option("checkpointLocation", ckpt).start(dir)
    try {
      q2.processAllAvailable()
      assert(SnapshotTable.read(spark, dir).count() === 80)
      assert(SnapshotTable.read(spark, dir).select("id").distinct().count()
        === 80) // exactly-once: no duplicated rows
      assert(SnapshotTable.versions(spark, dir).size <= vsBefore + 2)
    } finally q2.stop()
  }

  test("streaming: initial snapshot then exactly the appended tail") {
    val dir = freshDir()
    val ckpt = freshDir()
    SnapshotTable.commit(spark, df(0, 100), dir, "overwrite")
    SnapshotTable.commit(spark, df(100, 120), dir, "append")

    val q = spark.readStream.format("graft-table").load(dir)
      .writeStream.format("memory").queryName("snap_stream")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("snap_stream").count() === 120) // initial snapshot

      SnapshotTable.commit(spark, df(120, 150), dir, "append")
      q.processAllAvailable()
      assert(spark.table("snap_stream").count() === 150)
      // exactly-once: no duplicated ids
      assert(spark.table("snap_stream").select("id").distinct().count()
        === 150)

      SnapshotTable.commit(spark, df(150, 160), dir, "append")
      SnapshotTable.commit(spark, df(160, 170), dir, "append")
      q.processAllAvailable()
      assert(spark.table("snap_stream").count() === 170)
    } finally q.stop()

    // restart from the SAME checkpoint: nothing re-emitted, tail resumes
    // (foreachBatch sink — the memory sink cannot recover a checkpoint)
    SnapshotTable.commit(spark, df(170, 180), dir, "append")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q2 = spark.readStream.format("graft-table").load(dir)
      .writeStream.foreachBatch {
        (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("id").collect().foreach(r => got.add(r.getLong(0)))
      }
      .option("checkpointLocation", ckpt).start()
    try {
      q2.processAllAvailable()
      // only the unconsumed commit arrives
      assert(got.iterator().asScala.toSeq.sorted === (170L until 180L))
    } finally q2.stop()
  }

  test("table-to-table streaming pipeline: source and sink compose, " +
    "exactly-once on both ends") {
    val srcDir = freshDir()
    val dstDir = freshDir()
    val ckpt = freshDir()
    SnapshotTable.commit(spark, df(0, 50), srcDir, "overwrite")
    SnapshotTable.commit(spark,
      df(0, 0).withColumn("v2", col("v")), dstDir, "overwrite")

    val q = spark.readStream.format("graft-table").load(srcDir)
      .withColumn("v2", col("v") * 2)
      .writeStream.format("graft-table")
      .option("checkpointLocation", ckpt).start(dstDir)
    try {
      q.processAllAvailable()
      assert(SnapshotTable.read(spark, dstDir).count() === 50)
      SnapshotTable.commit(spark, df(50, 80), srcDir, "append")
      SnapshotTable.commit(spark, df(80, 90), srcDir, "append")
      q.processAllAvailable()
      val dst = SnapshotTable.read(spark, dstDir)
      assert(dst.count() === 90)
      assert(dst.select("id").distinct().count() === 90) // exactly-once
      assert(dst.filter(col("v2") =!= col("v") * 2).count() === 0)
    } finally q.stop()
  }

  test("streaming: a non-append commit fences the stream unless " +
    "ignoreChanges") {
    val dir = freshDir()
    SnapshotTable.commit(spark, df(0, 50), dir, "overwrite")

    val q = spark.readStream.format("graft-table").load(dir)
      .writeStream.format("memory").queryName("snap_fence")
      .option("checkpointLocation", freshDir()).start()
    try {
      q.processAllAvailable()
      SnapshotTable.commit(spark, df(900, 910), dir, "overwrite")
      val ex = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(ex.getMessage.contains("non-append") ||
        Option(ex.getCause).exists(_.getMessage.contains("non-append")))
    } finally q.stop()

    // ignoreChanges: the overwrite's files flow through (documented
    // duplicate-tolerant mode)
    val q2 = spark.readStream.format("graft-table")
      .option("ignoreChanges", "true").load(dir)
      .writeStream.format("memory").queryName("snap_fence2")
      .option("checkpointLocation", freshDir()).start()
    try {
      q2.processAllAvailable()
      assert(spark.table("snap_fence2").count() === 10) // snapshot after ow
      SnapshotTable.commit(spark, df(910, 915), dir, "append")
      q2.processAllAvailable()
      assert(spark.table("snap_fence2").count() === 15)
    } finally q2.stop()
  }

  test("streaming: skipChangeCommits silently skips rewrite commits " +
    "and keeps tailing appends (Delta's ignoreChanges successor)") {
    val dir = freshDir()
    SnapshotTable.commit(spark, df(0, 50), dir, "overwrite",
      statsCols = Seq("id"))

    val q = spark.readStream.format("graft-table")
      .option("skipChangeCommits", "true").load(dir)
      .writeStream.format("memory").queryName("snap_skipchg")
      .option("checkpointLocation", freshDir()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("snap_skipchg").count() === 50)
      // an append, then a rewrite commit (range delete), then an append:
      // the stream must emit ONLY the appends — no fence, no rewritten
      // duplicates from the delete's surviving-file rewrite
      SnapshotTable.commit(spark, df(50, 60), dir, "append")
      SnapshotTable.delete(spark, dir, "id", 0.0, 9.0)
      SnapshotTable.commit(spark, df(60, 70), dir, "append")
      q.processAllAvailable()
      val got = spark.table("snap_skipchg")
      assert(got.count() === 70) // 50 snapshot + two 10-row appends
      assert(got.select("id").distinct().count() === 70)
    } finally q.stop()
  }

  test("streaming: maxVersionsPerTrigger drains a backfill in bounded, " +
    "individually-checkpointed batches") {
    val dir = freshDir()
    SnapshotTable.commit(spark, df(0, 10), dir, "overwrite") // v0
    (1 to 6).foreach(k => SnapshotTable.commit(spark,
      df(k * 10L, k * 10L + 10), dir, "append")) // v1..v6
    val q = spark.readStream.format("graft-table")
      .option("startingVersion", "1")
      .option("maxVersionsPerTrigger", "2").load(dir)
      .writeStream.format("memory").queryName("snap_paced")
      .option("checkpointLocation", freshDir()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("snap_paced").select("id").collect()
        .map(_.getLong(0)).sorted.toSeq === (10L until 70L))
      // 6 tail versions at <=2 per trigger: at least 3 data batches
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 3, s"backfill drained in $batches batches — " +
        "the per-trigger cap was not applied")
    } finally q.stop()
  }

  test("streaming: startingVersion consumes only the tail") {
    val dir = freshDir()
    SnapshotTable.commit(spark, df(0, 100), dir, "overwrite") // v0
    SnapshotTable.commit(spark, df(100, 110), dir, "append") // v1
    SnapshotTable.commit(spark, df(110, 130), dir, "append") // v2
    val q = spark.readStream.format("graft-table")
      .option("startingVersion", "2").load(dir)
      .writeStream.format("memory").queryName("snap_tail")
      .option("checkpointLocation", freshDir()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("snap_tail").select("id").collect()
        .map(_.getLong(0)).sorted.toSeq === (110L until 130L))
    } finally q.stop()
  }
}
