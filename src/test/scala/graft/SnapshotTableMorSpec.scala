package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sinks.SnapshotTable

/** Merge-on-read equality deletes (the Iceberg v2 delete-file shape):
  * `deleteByKeys` writes ONE small key sidecar and a `rowdelete` commit —
  * zero data-file I/O — and every read surface anti-applies it. The laws
  * under test:
  *
  *   - a MOR delete removes exactly the keyed rows, rewrites NO data
  *     file, and leaves the pre-delete version time-travelable;
  *   - sequence-number semantics: a row appended AFTER the delete with a
  *     deleted key is a new row and survives;
  *   - every rewrite path (compact, merge, COW delete, SQL DML)
  *     MATERIALIZES applicable deletes — never resurrects — and carries
  *     the still-applicable delete entries for untouched files;
  *   - the DSv2 source (batch, pruned projections, streaming batch 0)
  *     applies deletes; SQL `DELETE ... WHERE k IN (...)` routes to MOR
  *     under `spark.graft.table.delete.mode=mor`;
  *   - checkpoints, expiry collapse, restore, vacuum and the change feed
  *     all see the delete as first-class state.
  */
class SnapshotTableMorSpec extends AnyFunSuite with SparkSessionTestWrapper {

  spark.conf.set("spark.sql.catalog.graft",
    "graft.sources.SnapshotTableCatalog")

  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("snapmor").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** id-clustered table: 4 range files over ids [0,200). */
  private def stage(dir: String): Unit = {
    val df = spark.range(0, 200)
      .select(col("id"), concat(lit("k"), col("id") % 10).as("cat"),
        (col("id") * lit(2.5)).as("v"))
    SnapshotTable.commit(spark, df.repartitionByRange(4, col("id")),
      dir, "overwrite", statsCols = Seq("id"))
  }

  private def dataPaths(dir: String): Set[String] =
    SnapshotTable.snapshotFiles(spark, dir, None).map(_.path).toSet

  test("deleteByKeys removes keyed rows with zero data-file rewrites; " +
    "pre-delete version stays time-travelable") {
    val dir = freshDir()
    stage(dir)
    val before = dataPaths(dir)

    val rep = SnapshotTable.deleteByKeys(spark, dir, "id",
      Seq(5L, 42L, 199L, 4242L).toDF("id")) // 4242 matches nothing
    assert(rep.version === 1L)
    assert(rep.keys === 4L)
    assert(rep.sidecarBytes > 0L)

    // content: exactly the 3 present keys gone
    val t = SnapshotTable.read(spark, dir)
    assert(t.count() === 197)
    assert(t.filter(col("id").isin(5L, 42L, 199L)).count() === 0)
    // NOT ONE data file changed: the manifest carries the same entries
    assert(dataPaths(dir) === before)
    // the commit is action=rowdelete with zero file entries
    assert(SnapshotTable.commitStats(spark, dir, 1L)._1 === "rowdelete")
    assert(SnapshotTable.commitFiles(spark, dir, 1L).isEmpty)
    // time travel: v0 still has all 200 rows
    assert(SnapshotTable.read(spark, dir, Some(0L)).count() === 200)
    // exact row count while the delete is pending (read-based fallback)
    assert(SnapshotTable.rowCount(spark, dir) === 197L)
    assert(SnapshotTable.pendingDeletes(spark, dir).size === 1)
  }

  test("sequence numbers: a key re-appended AFTER the delete survives; " +
    "a second delete governs it") {
    val dir = freshDir()
    stage(dir)
    SnapshotTable.deleteByKeys(spark, dir, "id", Seq(7L).toDF("id"))
    // re-append id=7 (new row, seq above the delete)
    SnapshotTable.commit(spark,
      Seq((7L, "k7", 777.0)).toDF("id", "cat", "v"), dir, "append",
      statsCols = Seq("id"))
    val t = SnapshotTable.read(spark, dir)
    assert(t.filter(col("id") === 7L).count() === 1)
    assert(t.filter(col("id") === 7L).head().getDouble(2) === 777.0)
    assert(t.count() === 200) // 200 - 1 deleted + 1 re-appended
    // a SECOND delete of the same key now removes the new row too
    SnapshotTable.deleteByKeys(spark, dir, "id", Seq(7L).toDF("id"))
    assert(SnapshotTable.read(spark, dir)
      .filter(col("id") === 7L).count() === 0)
    assert(SnapshotTable.rowCount(spark, dir) === 199L)
  }

  test("compact materializes: pending deletes fold into the data and " +
    "age out of the state; row count returns to metadata-only") {
    val dir = freshDir()
    stage(dir)
    SnapshotTable.deleteByKeys(spark, dir, "id",
      (0L until 20L).toDF("id"))
    assert(SnapshotTable.pendingDeletes(spark, dir).nonEmpty)
    SnapshotTable.compact(spark, dir, targetBytes = 1L << 20,
      clusterBy = Some("id"), statsCols = Seq("id"))
    assert(SnapshotTable.pendingDeletes(spark, dir).isEmpty)
    val t = SnapshotTable.read(spark, dir)
    assert(t.count() === 180)
    assert(t.filter(col("id") < 20).count() === 0)
    // manifest row sum is exact again
    assert(SnapshotTable.snapshotFiles(spark, dir, None)
      .map(_.rows).sum === 180L)
  }

  test("merge with pending deletes: rewritten files materialize, " +
    "carried files stay governed, nothing resurrects") {
    val dir = freshDir()
    stage(dir)
    // delete one key in the LOW range file and one in the HIGH range
    SnapshotTable.deleteByKeys(spark, dir, "id",
      Seq(3L, 190L).toDF("id"))
    // upsert a low-range key: only the low file(s) rewrite
    val rep = SnapshotTable.merge(spark, dir,
      Seq((10L, "kX", -1.0)).toDF("id", "cat", "v"), "id",
      statsCols = Seq("id"))
    assert(rep.filesCarried >= 2, s"carried=${rep.filesCarried}")
    val t = SnapshotTable.read(spark, dir)
    // the upsert applied
    assert(t.filter(col("id") === 10L).head().getString(1) === "kX")
    // the low-range deleted key was MATERIALIZED out (its file rewrote)
    assert(t.filter(col("id") === 3L).count() === 0)
    // the high-range deleted key is still governed by the CARRIED delete
    assert(t.filter(col("id") === 190L).count() === 0)
    assert(t.count() === 198)
    // the carried delete entry survives in the state
    assert(SnapshotTable.pendingDeletes(spark, dir).size === 1)
  }

  test("string keys, multiple delete columns, and null-key survival") {
    val dir = freshDir()
    val df = Seq(
      (1L, "alpha", 1.0), (2L, "beta", 2.0), (3L, null: String, 3.0),
      (4L, "gamma", 4.0), (5L, "alpha", 5.0))
      .toDF("id", "cat", "v")
    SnapshotTable.commit(spark, df, dir, "overwrite",
      statsCols = Seq("id", "cat"))
    // string-keyed delete: both 'alpha' rows go; the null-cat row stays
    SnapshotTable.deleteByKeys(spark, dir, "cat",
      Seq("alpha").toDF("cat"))
    // numeric delete on another column, stacked on the first
    SnapshotTable.deleteByKeys(spark, dir, "id", Seq(2L).toDF("id"))
    val t = SnapshotTable.read(spark, dir)
    assert(t.count() === 2)
    assert(t.filter(col("cat").isNull).count() === 1)
    assert(t.select("id").as[Long].collect().toSet === Set(3L, 4L))
    // null keys in the KEY FRAME are dropped, not deleted
    val rep = SnapshotTable.deleteByKeys(spark, dir, "cat",
      Seq(null: String).toDF("cat"))
    assert(rep.keys === 0L) // no-op: nothing committed
    assert(SnapshotTable.read(spark, dir).count() === 2)
  }

  test("DSv2 batch read applies deletes, including when the key column " +
    "is pruned from the projection; time travel bypasses them") {
    val dir = freshDir()
    stage(dir)
    SnapshotTable.deleteByKeys(spark, dir, "id",
      Seq(0L, 100L, 150L).toDF("id"))
    val dsv2 = spark.read.format("graft-table").load(dir)
    assert(dsv2.count() === 197)
    // projection WITHOUT the key column: the reader must still read the
    // key to filter, then emit only the requested column
    assert(dsv2.select("v").count() === 197)
    assert(dsv2.agg(sum(col("id"))).head().getLong(0) ===
      (0L until 200L).sum - 250L)
    // versionAsOf 0 predates the delete
    assert(spark.read.format("graft-table").option("versionAsOf", 0)
      .load(dir).count() === 200)
    // manifest-pruned scan with a pushed filter still applies the delete
    assert(dsv2.filter(col("id") < 10).count() === 9)
  }

  test("SQL DELETE WHERE id IN (...) routes to a MOR commit under " +
    "spark.graft.table.delete.mode=mor (zero data rewrites)") {
    val dir = freshDir()
    stage(dir)
    val before = dataPaths(dir)
    spark.conf.set("spark.graft.table.delete.mode", "mor")
    try {
      spark.sql(s"DELETE FROM graft.`$dir` WHERE id IN (11, 13, 17)")
      assert(dataPaths(dir) === before) // no data file rewritten
      assert(SnapshotTable.commitStats(spark, dir, 1L)._1 === "rowdelete")
      assert(SnapshotTable.read(spark, dir).count() === 197)
      assert(spark.sql(s"SELECT count(*) FROM graft.`$dir`")
        .head().getLong(0) === 197)
      // a RANGE delete keeps the metadata/COW path even in mor mode
      spark.sql(s"DELETE FROM graft.`$dir` WHERE id >= 180 AND id <= 199")
      assert(SnapshotTable.read(spark, dir).count() === 177)
    } finally spark.conf.unset("spark.graft.table.delete.mode")
    // conf off: the same IN shape goes through the COW rewrite
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id IN (20)")
    assert(SnapshotTable.read(spark, dir).count() === 176)
    assert(SnapshotTable.commitStats(spark, dir,
      SnapshotTable.currentVersion(spark, dir).get)._1 === "overwrite")
  }

  test("the PER-TABLE graft.delete.mode=mor property routes SQL DELETE " +
    "to a MOR commit without any session conf (ADVICE r16)") {
    val dir = freshDir()
    stage(dir)
    SnapshotTable.setTableProperties(spark, dir,
      Map(SnapshotTable.DeleteModeProp -> "mor"))
    val before = dataPaths(dir)
    assert(!spark.conf.getOption("spark.graft.table.delete.mode")
      .contains("mor"), "fixture must not rely on the session conf")
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id IN (11, 13, 17)")
    assert(dataPaths(dir) === before) // no data file rewritten
    val v = SnapshotTable.currentVersion(spark, dir).get
    assert(SnapshotTable.commitStats(spark, dir, v)._1 === "rowdelete")
    assert(SnapshotTable.read(spark, dir).count() === 197)
    // an undeclared sibling table keeps the COW path
    val cow = freshDir()
    stage(cow)
    spark.sql(s"DELETE FROM graft.`$cow` WHERE id IN (11)")
    assert(SnapshotTable.commitStats(spark, cow,
      SnapshotTable.currentVersion(spark, cow).get)._1 === "overwrite")
  }

  test("SQL UPDATE with a pending delete does not resurrect deleted " +
    "rows and carries the delete for untouched files") {
    val dir = freshDir()
    stage(dir)
    SnapshotTable.deleteByKeys(spark, dir, "id",
      Seq(1L, 195L).toDF("id"))
    // rewrite only the low range: id=1 (deleted, low) must NOT come back
    spark.sql(s"UPDATE graft.`$dir` SET v = v * 2 WHERE id < 50")
    val t = SnapshotTable.read(spark, dir)
    assert(t.count() === 198)
    assert(t.filter(col("id") === 1L).count() === 0)
    assert(t.filter(col("id") === 195L).count() === 0) // carried delete
    assert(t.filter(col("id") === 2L).head().getDouble(2) === 10.0)
    assert(t.filter(col("id") === 100L).head().getDouble(2) === 250.0)
  }

  test("checkpoint + expiry collapse preserve deletes and seqs") {
    val dir = freshDir()
    spark.conf.set("spark.graft.table.checkpoint.every", "2")
    try {
      stage(dir)
      SnapshotTable.commit(spark,
        Seq((500L, "kA", 1.0)).toDF("id", "cat", "v"), dir, "append",
        statsCols = Seq("id"))
      SnapshotTable.deleteByKeys(spark, dir, "id",
        Seq(500L, 9L).toDF("id"))
      SnapshotTable.commit(spark,
        Seq((501L, "kB", 1.0)).toDF("id", "cat", "v"), dir, "append",
        statsCols = Seq("id"))
      // several checkpoints exist now; expire everything but the tail
      SnapshotTable.expireVersions(spark, dir, keepLast = 2)
      val t = SnapshotTable.read(spark, dir)
      assert(t.count() === 200) // 201 staged - 2 deleted + 1 late append
      assert(t.filter(col("id").isin(500L, 9L)).count() === 0)
      assert(t.filter(col("id") === 501L).count() === 1)
      assert(SnapshotTable.pendingDeletes(spark, dir).size === 1)
    } finally spark.conf.unset("spark.graft.table.checkpoint.every")
  }

  test("restore across the delete boundary resurrects / re-deletes " +
    "byte-free") {
    val dir = freshDir()
    stage(dir) // v0
    SnapshotTable.deleteByKeys(spark, dir, "id", Seq(8L).toDF("id")) // v1
    assert(SnapshotTable.read(spark, dir).count() === 199)
    SnapshotTable.restore(spark, dir, 0L) // v2: pre-delete content
    assert(SnapshotTable.read(spark, dir).count() === 200)
    SnapshotTable.restore(spark, dir, 1L) // v3: delete applies again
    val t = SnapshotTable.read(spark, dir)
    assert(t.count() === 199)
    assert(t.filter(col("id") === 8L).count() === 0)
  }

  test("changeFeed is MOR-aware: rowdelete emits exactly the removed " +
    "rows; materializing compact emits cancelling churn; the " +
    "reconstruction invariant holds") {
    val dir = freshDir()
    stage(dir) // v0
    SnapshotTable.deleteByKeys(spark, dir, "id",
      Seq(2L, 3L).toDF("id")) // v1
    SnapshotTable.commit(spark,
      Seq((2L, "kNew", 9.0)).toDF("id", "cat", "v"), dir,
      "append", statsCols = Seq("id")) // v2: re-adds key 2
    SnapshotTable.compact(spark, dir, targetBytes = 1L << 20) // v3

    val feed = SnapshotTable.changeFeed(spark, dir, 1L, Some(3L)).cache()
    // v1: exactly the two deleted rows, as deletes
    val v1 = feed.filter(col("_commit_version") === 1L)
    assert(v1.count() === 2)
    assert(v1.select("_change_type").distinct().as[String].collect()
      .toSeq === Seq("delete"))
    assert(v1.select("id").as[Long].collect().toSet === Set(2L, 3L))
    // reconstruction: snapshot(0) + deltas(1..3) == snapshot(3) as multiset
    val start = SnapshotTable.read(spark, dir, Some(0L))
      .groupBy("id", "cat", "v").agg(count(lit(1)).as("n"))
    val delta = feed.groupBy("id", "cat", "v").agg(
      sum(when(col("_change_type") === "insert", 1L)
        .otherwise(-1L)).as("d"))
    val end = SnapshotTable.read(spark, dir, Some(3L))
      .groupBy("id", "cat", "v").agg(count(lit(1)).as("n"))
    val rebuilt = start.join(delta, Seq("id", "cat", "v"), "full_outer")
      .select(col("id"), col("cat"), col("v"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("d"), lit(0L)))
          .as("n"))
      .filter(col("n") =!= 0L)
    assert(rebuilt.join(end, Seq("id", "cat", "v", "n"), "full_outer")
      .filter(col("n").isNull).count() === 0)
    assert(rebuilt.count() === end.count())
    feed.unpersist()
  }

  test("DSv2 CDF (batch and streaming) carries MOR spans: rowdelete " +
    "slices emit key-matched rows; equivalence with the programmatic " +
    "feed; changesSince still rejects") {
    val dir = freshDir()
    stage(dir) // v0
    SnapshotTable.deleteByKeys(spark, dir, "id",
      Seq(2L, 3L).toDF("id")) // v1
    SnapshotTable.commit(spark,
      Seq((2L, "kNew", 9.0)).toDF("id", "cat", "v"), dir, "append",
      statsCols = Seq("id")) // v2
    SnapshotTable.compact(spark, dir, targetBytes = 1L << 20) // v3

    def mass(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("id", "cat", "v", "_change_type", "_commit_version")
      .agg(count(lit(1)).as("m"))
    val prog = mass(SnapshotTable.changeFeed(spark, dir, 1L, Some(3L)))
    val dsv2 = mass(spark.read.format("graft-table")
      .option("readChangeFeed", "true")
      .option("startingVersion", 1).option("endingVersion", 3)
      .load(dir)
      .select(col("id"), col("cat"), col("v"), col("_change_type"),
        col("_commit_version")))
    assert(prog.join(dsv2,
      Seq("id", "cat", "v", "_change_type", "_commit_version", "m"),
      "full_outer").filter(col("m").isNull).count() === 0)
    assert(prog.count() === dsv2.count())
    // the v1 slice through DSv2 is exactly the two deleted rows
    val v1 = spark.read.format("graft-table")
      .option("readChangeFeed", "true")
      .option("startingVersion", 1).option("endingVersion", 1).load(dir)
    assert(v1.count() === 2)
    assert(v1.select("id").as[Long].collect().toSet === Set(2L, 3L))
    assert(v1.select("_change_type").distinct().as[String].collect()
      .toSeq === Seq("delete"))

    // STREAMING CDF over the same span: same net mass, exactly-once
    val ckpt = freshDir()
    val q = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true").option("startingVersion", 1)
      .load(dir)
      .writeStream.format("memory").queryName("morcdf")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = mass(spark.table("morcdf")
      .select(col("id"), col("cat"), col("v"), col("_change_type"),
        col("_commit_version")))
    assert(streamed.join(prog,
      Seq("id", "cat", "v", "_change_type", "_commit_version", "m"),
      "full_outer").filter(col("m").isNull).count() === 0)

    // changesSince (file-level incremental consumer) still rejects
    val e2 = intercept[IllegalArgumentException] {
      SnapshotTable.changesSince(spark, dir, 0L)
    }
    assert(e2.getMessage.contains("non-append"))
  }

  test("vacuum never reclaims a referenced delete sidecar; after " +
    "compact + expiry it does") {
    val dir = freshDir()
    stage(dir)
    SnapshotTable.deleteByKeys(spark, dir, "id", Seq(6L).toDF("id"))
    val sidecar = SnapshotTable.pendingDeletes(spark, dir).head.path
    assert(SnapshotTable.vacuum(spark, dir, retentionMs = 0L).isEmpty)
    assert(SnapshotTable.read(spark, dir).count() === 199)
    // materialize, then expire the versions that referenced the sidecar
    SnapshotTable.compact(spark, dir, targetBytes = 1L << 20)
    SnapshotTable.expireVersions(spark, dir, keepLast = 1)
    val dead = SnapshotTable.vacuum(spark, dir, retentionMs = 0L)
    assert(dead.contains(sidecar), s"dead=$dead")
    assert(SnapshotTable.read(spark, dir).count() === 199)
  }

  test("upsertByKeys: matched rows replace, unmatched insert, NOTHING " +
    "rewrites; sequence rule and time travel hold; compact materializes") {
    val dir = freshDir()
    stage(dir) // ids 0..199
    val before = SnapshotTable.snapshotFiles(spark, dir).map(_.path).toSet
    val rep = SnapshotTable.upsertByKeys(spark, dir, "id",
      Seq((5L, "five-v2", 0.0), (6L, "six-v2", 0.0),
        (9999L, "brand-new", 1.0)).toDF("id", "cat", "v"))
    assert(rep.keys === 3L && rep.filesAdded >= 1)
    val after = SnapshotTable.snapshotFiles(spark, dir).map(_.path).toSet
    assert(before.subsetOf(after), "an existing data file was rewritten")
    val t = SnapshotTable.read(spark, dir)
    assert(t.count() === 201) // 200 - 2 replaced + 2 new versions + 1 insert
    assert(t.filter(col("id") === 5L).select("cat").head().getString(0)
      === "five-v2")
    assert(t.filter(col("id") === 9999L).count() === 1)
    // pre-upsert version intact
    assert(SnapshotTable.read(spark, dir, Some(0L)).count() === 200)
    assert(SnapshotTable.read(spark, dir, Some(0L))
      .filter(col("id") === 5L).select("cat").head().getString(0) !== "five-v2")
    // sequence rule: a row appended AFTER the upsert with an updated key
    // is a new row and survives
    SnapshotTable.commit(spark,
      Seq((5L, "five-v3", 0.0)).toDF("id", "cat", "v"), dir, "append")
    assert(SnapshotTable.read(spark, dir)
      .filter(col("id") === 5L).count() === 2) // v2 (post-delete) + v3
    // exact rowCount while the delete is pending
    assert(SnapshotTable.rowCount(spark, dir) === 202)
    // compact materializes; the delete ages out
    assert(SnapshotTable.pendingDeletes(spark, dir).nonEmpty)
    SnapshotTable.compact(spark, dir, targetBytes = 1L << 20,
      clusterBy = Some("id"), statsCols = Seq("id"))
    assert(SnapshotTable.pendingDeletes(spark, dir).isEmpty)
    assert(SnapshotTable.read(spark, dir).count() === 202)
  }

  test("SQL UPDATE routes to a MOR rowupdate commit under the per-table " +
    "declaration: zero data-file rewrites, non-matching rows untouched") {
    val dir = freshDir()
    stage(dir)
    SnapshotTable.setTableProperties(spark, dir, Map(
      SnapshotTable.UpdateModeProp -> "mor",
      SnapshotTable.UpdateKeyProp -> "id"))
    val before = SnapshotTable.snapshotFiles(spark, dir).map(_.path).toSet
    spark.sql(s"UPDATE graft.`$dir` SET cat = 'hot' WHERE id < 10")
    val after = SnapshotTable.snapshotFiles(spark, dir).map(_.path).toSet
    assert(before.subsetOf(after), "MOR UPDATE rewrote a data file")
    // v1 = the property declaration (empty append), v2 = the update
    assert(SnapshotTable.commitStats(spark, dir, 2L)._1 === "rowupdate")
    val t = SnapshotTable.read(spark, dir)
    assert(t.count() === 200)
    assert(t.filter(col("cat") === "hot").count() === 10)
    assert(t.filter(col("id") === 50L).select("cat").head().getString(0)
      === "k0")
    // v0 intact
    assert(SnapshotTable.read(spark, dir, Some(0L))
      .filter(col("cat") === "hot").count() === 0)
  }

  test("changeFeed over a rowupdate span emits delete-preimage + " +
    "insert-postimage (batch API and DSv2 CDF)") {
    val dir = freshDir()
    stage(dir)
    SnapshotTable.upsertByKeys(spark, dir, "id",
      Seq((7L, "seven-v2", 70.0)).toDF("id", "cat", "v"))
    val cf = SnapshotTable.changeFeed(spark, dir, 1L)
    val dels = cf.filter(col("_change_type") === "delete")
    val ins = cf.filter(col("_change_type") === "insert")
    assert(dels.count() === 1 &&
      dels.select("cat").head().getString(0) === "k7")
    assert(ins.count() === 1 &&
      ins.select("cat").head().getString(0) === "seven-v2")
    val cf2 = spark.read.format("graft-table")
      .option("readChangeFeed", "true")
      .option("startingVersion", 1).load(dir)
    assert(cf2.filter(col("_change_type") === "delete").count() === 1)
    assert(cf2.filter(col("_change_type") === "insert").count() === 1)
  }

  test("reader-protocol fence: a MOR delete stamps minReader=2, the " +
    "current reader accepts it, and a FUTURE protocol fails loudly " +
    "instead of silently misreading") {
    val dir = freshDir()
    stage(dir)
    SnapshotTable.deleteByKeys(spark, dir, "id", Seq(3L).toDF("id"))
    // the rowdelete commit carries the fence
    val logDir = new java.io.File(dir, "_log")
    val v1 = new java.io.File(logDir, f"v${1L}%020d.json")
    val v1Json = new String(java.nio.file.Files.readAllBytes(v1.toPath))
    assert(v1Json.contains("\"minReader\":2"), v1Json.take(200))
    assert(SnapshotTable.read(spark, dir).count() === 199) // still readable
    // a commit from a future format version must fence THIS reader
    val v2 = new java.io.File(logDir, f"v${2L}%020d.json")
    java.nio.file.Files.write(v2.toPath,
      ("""{"version":2,"action":"append","ts":1,"minReader":99,""" +
        """"files":[]}""").getBytes("UTF-8"))
    val e = intercept[SnapshotTable.UnsupportedTableProtocolException] {
      SnapshotTable.read(spark, dir)
    }
    assert(e.getMessage.contains("protocol 99"))
    // fenced checkpoints refuse too (and do NOT degrade to replay)
    val ck = new java.io.File(logDir, f"ckpt-${2L}%020d.json")
    java.nio.file.Files.write(ck.toPath,
      ("""{"version":2,"action":"overwrite","minReader":99,""" +
        """"files":[],"txns":{}}""").getBytes("UTF-8"))
    intercept[SnapshotTable.UnsupportedTableProtocolException] {
      SnapshotTable.read(spark, dir)
    }
  }

  test("deleteByKeys accepts a single-column frame under any name and " +
    "casts to the table's key type") {
    val dir = freshDir()
    stage(dir)
    // string-typed frame, column named differently: cast to long id
    SnapshotTable.deleteByKeys(spark, dir, "id",
      Seq("15", "16").toDF("whatever"))
    val t = SnapshotTable.read(spark, dir)
    assert(t.count() === 198)
    assert(t.filter(col("id").isin(15L, 16L)).count() === 0)
  }
}
