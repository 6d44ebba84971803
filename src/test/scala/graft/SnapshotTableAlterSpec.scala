package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sinks.SnapshotTable

/** `ALTER TABLE` DDL through the path catalog — both directions as
  * zero-data-I/O log commits: ADD COLUMNS rides merge-by-name (an
  * empty append recording the widened schema), DROP COLUMN publishes
  * one schema-narrowing overwrite CARRYING the same file entries
  * byte-identical. Laws: old rows null-fill added columns; the
  * pre-alter version time-travels with its own schema; a drop never
  * touches a data file; dropping a pending MOR delete's key column is
  * refused until materialized. */
class SnapshotTableAlterSpec extends AnyFunSuite
  with SparkSessionTestWrapper {

  spark.conf.set("spark.sql.catalog.graft",
    "graft.sources.SnapshotTableCatalog")

  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("snapalter").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def stage(dir: String): Unit =
    SnapshotTable.commit(spark,
      (0L until 100L).map(i => (i, s"r$i", i * 2.5))
        .toDF("id", "name", "v"),
      dir, "overwrite", statsCols = Seq("id"))

  test("ADD COLUMNS: empty append commit; old rows null-fill; INSERT " +
    "can populate it; the pre-alter version lacks the column") {
    val dir = freshDir()
    stage(dir)
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (note STRING)")
    assert(SnapshotTable.currentVersion(spark, dir) === Some(1L))
    assert(SnapshotTable.commitFiles(spark, dir, 1L).isEmpty) // no data
    val t = spark.sql(s"SELECT * FROM graft.`$dir`")
    assert(t.columns.toSeq === Seq("id", "name", "v", "note"))
    assert(t.filter(col("note").isNotNull).count() === 0)
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (100, 'r100', 1.0, 'x')")
    val t2 = SnapshotTable.read(spark, dir)
    assert(t2.count() === 101)
    assert(t2.filter(col("note") === "x").count() === 1)
    // time travel: v0's schema has no note column
    assert(!SnapshotTable.read(spark, dir, Some(0L)).columns
      .contains("note"))
    // guards: existing name / non-nullable
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (name STRING)")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` " +
        "ADD COLUMNS (req STRING NOT NULL)")
    }
  }

  test("DROP COLUMN: schema-narrowing overwrite carrying every file " +
    "byte-identical; pre-drop version keeps the column") {
    val dir = freshDir()
    stage(dir)
    val before = SnapshotTable.snapshotFiles(spark, dir, None)
      .map(_.path).toSet
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN name")
    assert(SnapshotTable.snapshotFiles(spark, dir, None)
      .map(_.path).toSet === before) // zero data I/O
    val t = SnapshotTable.read(spark, dir)
    assert(t.columns.toSeq === Seq("id", "v"))
    assert(t.count() === 100)
    assert(t.agg(sum(col("id"))).head().getLong(0) === (0L until 100L).sum)
    // DSv2 agrees
    assert(spark.read.format("graft-table").load(dir).columns.toSeq ===
      Seq("id", "v"))
    // pre-drop version still carries the column and its values
    val v0 = SnapshotTable.read(spark, dir, Some(0L))
    assert(v0.columns.contains("name"))
    assert(v0.filter(col("name") === "r5").count() === 1)
    // re-adding the name via DDL is REFUSED while old files still
    // physically hold the dropped values (no column mapping — they
    // would resurrect); compaction sheds them and unblocks
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (name STRING)")
    }
    assert(e.getMessage.contains("resurrect"))
    SnapshotTable.compact(spark, dir, targetBytes = 1L << 20)
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (name STRING)")
    val t2 = SnapshotTable.read(spark, dir)
    assert(t2.columns.toSet === Set("id", "v", "name"))
    assert(t2.filter(col("name").isNotNull).count() === 0) // fresh nulls
  }

  test("DROP COLUMN refuses while a pending MOR delete keys it; " +
    "compaction unblocks") {
    val dir = freshDir()
    stage(dir)
    SnapshotTable.deleteByKeys(spark, dir, "name",
      Seq("r3", "r4").toDF("name"))
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN name")
    }
    assert(e.getMessage.contains("merge-on-read"))
    SnapshotTable.compact(spark, dir, targetBytes = 1L << 20)
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN name")
    val t = SnapshotTable.read(spark, dir)
    assert(t.columns.toSeq === Seq("id", "v"))
    assert(t.count() === 98) // the delete materialized before the drop
  }

  test("CDF across DDL: window-end schema with null fill — a window " +
    "ending before a DROP keeps the column, one crossing it drops it") {
    val dir = freshDir()
    stage(dir) // v0: (id, name, v)
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (note STRING)") // v1
    SnapshotTable.commit(spark,
      Seq((500L, "r500", 0.0, "fresh")).toDF("id", "name", "v", "note"),
      dir, "append") // v2
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN name") // v3
    // window crossing the drop: 'name' leaves the feed, 'note'
    // null-fills the pre-ADD slices
    val full = SnapshotTable.changeFeed(spark, dir, 0L)
    assert(!full.columns.contains("name"))
    assert(full.count() === 101)
    assert(full.filter(col("note").isNull).count() === 100)
    assert(full.filter(col("note") === "fresh").count() === 1)
    // window ENDING BEFORE the drop: the column is present with values
    val pre = SnapshotTable.changeFeed(spark, dir, 0L, Some(2L))
    assert(pre.columns.contains("name"))
    assert(pre.filter(col("name") === "r500").count() === 1)
    // the DSv2 surface agrees on both windows
    val dsvFull = spark.read.format("graft-table")
      .option("readChangeFeed", "true").option("startingVersion", 0)
      .load(dir)
    assert(!dsvFull.columns.contains("name"))
    assert(dsvFull.count() === 101)
    assert(dsvFull.filter(col("note").isNull).count() === 100)
    val dsvPre = spark.read.format("graft-table")
      .option("readChangeFeed", "true").option("startingVersion", 0)
      .option("endingVersion", 2).load(dir)
    assert(dsvPre.columns.contains("name"))
    assert(dsvPre.filter(col("name") === "r500").count() === 1)
  }

  test("ADD COLUMNS is version-pinned: concurrent appends never make it " +
    "publish a stale schema (the alter retries whole on conflict)") {
    val dir = freshDir()
    stage(dir)
    // appends racing the DDL: the alter's publish must either win its
    // pinned version or retry the WHOLE alter against the fresh snapshot
    val appender = new Thread(() =>
      (0 until 3).foreach { i =>
        SnapshotTable.commit(spark,
          Seq((1000L + i, s"x$i", 0.0)).toDF("id", "name", "v"),
          dir, "append", statsCols = Seq("id"))
      })
    appender.start()
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (note STRING)")
    appender.join()
    val t = SnapshotTable.read(spark, dir)
    assert(t.columns.contains("note"))
    assert(t.count() === 103) // no append lost, no alter lost
  }
}
