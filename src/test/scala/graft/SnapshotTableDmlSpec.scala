package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sinks.SnapshotTable

/** SQL row-level DML on the snapshot table — DELETE FROM / UPDATE /
  * MERGE INTO through the path catalog, planned by Spark's group-based
  * (copy-on-write) row-level operation contract. The claims under test:
  *
  *   - results match the SQL semantics (incl. NULL-condition keep rows);
  *   - only files that might hold matching rows are rewritten — every
  *     other file's manifest entry is CARRIED (same path, zero data I/O);
  *   - the command is one atomic commit: the pre-DML version stays
  *     time-travelable, and pruning stats survive the rewrite;
  *   - a provably-no-op command does not bump the version;
  *   - a MERGE whose source matches one target row twice fails loudly
  *     (cardinality check), leaving the table untouched.
  */
class SnapshotTableDmlSpec extends AnyFunSuite with SparkSessionTestWrapper {

  spark.conf.set("spark.sql.catalog.graft",
    "graft.sources.SnapshotTableCatalog")

  private def freshDir(): String = {
    val d = Files.createTempDirectory("snapdml").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** id-clustered table: 8 range-partitioned files over ids [0,200). */
  private def stage(dir: String): Unit = {
    val df = spark.range(0, 200)
      .select(col("id"), concat(lit("r"), col("id")).as("name"),
        (col("id") * lit(2.5)).as("v"))
    SnapshotTable.commit(spark,
      df.repartitionByRange(8, col("id")), dir, "overwrite",
      statsCols = Seq("id"))
  }

  private def paths(dir: String): Set[String] =
    SnapshotTable.snapshotFiles(spark, dir, None).map(_.path).toSet

  test("DELETE FROM rewrites only the files that can hold matches; " +
    "the pre-DML version stays time-travelable") {
    val dir = freshDir()
    stage(dir)
    val before = paths(dir)

    // the second-column conjunct keeps this off the metadata-only fast
    // path (exercised separately below) — this is the group-based COW
    // rewrite, with manifest pruning from the id bounds
    spark.sql(s"DELETE FROM graft.`$dir` " +
      "WHERE id >= 50 AND id < 75 AND name IS NOT NULL")

    assert(SnapshotTable.currentVersion(spark, dir) === Some(1L))
    val t = SnapshotTable.read(spark, dir)
    assert(t.count() === 175)
    assert(t.filter(col("id").between(50, 74)).count() === 0)
    assert(t.agg(sum(col("id"))).head().getLong(0) ===
      (0L until 200L).sum - (50L until 75L).sum)

    // 8 range files over [0,200): ids 50..74 live in at most 2 files —
    // at least 6 entries must be carried byte-identical (same path)
    val after = paths(dir)
    assert((before intersect after).size >= 6,
      s"carried=${(before intersect after).size} of ${before.size}")

    // time travel to v0: all 200 rows intact
    assert(SnapshotTable.read(spark, dir, Some(0L)).count() === 200)

    // pruning stats survive the rewrite: every entry still tracks `id`
    assert(SnapshotTable.snapshotFiles(spark, dir, None)
      .forall(_.stats.contains("id")))
  }

  test("DELETE keeps rows whose condition is NULL (three-valued logic)") {
    val dir = freshDir()
    val df = spark.range(0, 10).select(col("id"),
      when(col("id") < 5, col("id") * 2.5).as("v"))
    SnapshotTable.commit(spark, df, dir, "overwrite")

    spark.sql(s"DELETE FROM graft.`$dir` WHERE v > 5.0")

    val t = SnapshotTable.read(spark, dir)
    // deleted: v in {7.5, 10.0} (ids 3,4); ids 5..9 have NULL v -> kept
    assert(t.count() === 8)
    assert(t.filter(col("v").isNull).count() === 5)
  }

  test("UPDATE applies assignments to matching rows only") {
    val dir = freshDir()
    stage(dir)
    val before = paths(dir)

    spark.sql(s"UPDATE graft.`$dir` SET v = v * 10, name = 'hot' " +
      "WHERE id < 10")

    val t = SnapshotTable.read(spark, dir)
    assert(t.count() === 200)
    assert(t.filter(col("name") === "hot").count() === 10)
    // updated: sum(v) over ids<10 becomes 10x
    val got = t.agg(sum(col("v"))).head().getDouble(0)
    val want = (0 until 10).map(_ * 2.5 * 10).sum +
      (10 until 200).map(_ * 2.5).sum
    assert(math.abs(got - want) < 1e-6)
    // only the first range file rewritten; the other 7 carried
    assert((before intersect paths(dir)).size >= 6)
  }

  test("MERGE INTO: matched update + not-matched insert + " +
    "not-matched-by-source delete, one atomic commit") {
    val dir = freshDir()
    stage(dir)

    spark.range(150, 260)
      .select(col("id"), lit("src").as("name"),
        lit(-1.0).as("v"))
      .createOrReplaceTempView("dml_src")

    spark.sql(
      s"""MERGE INTO graft.`$dir` t USING dml_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET t.v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, name, v)
         |  VALUES (s.id, s.name, s.v)
         |WHEN NOT MATCHED BY SOURCE AND t.id < 20 THEN DELETE
         |""".stripMargin)

    val t = SnapshotTable.read(spark, dir)
    // target 0..199; source 150..259. matched 150..199 updated to v=-1;
    // 200..259 inserted; ids 0..19 (not in source) deleted.
    assert(t.count() === 200 - 20 + 60)
    assert(t.filter(col("id") < 20).count() === 0)
    assert(t.filter(col("v") === -1.0).count() === 110)
    assert(t.filter(col("name") === "src").count() === 60)
    // one atomic commit
    assert(SnapshotTable.currentVersion(spark, dir) === Some(1L))
  }

  test("MERGE with a duplicate source match fails the cardinality " +
    "check and leaves the table untouched") {
    val dir = freshDir()
    stage(dir)

    spark.range(0, 2).select(lit(7L).as("id"),
        lit("dup").as("name"), lit(0.0).as("v"))
      .createOrReplaceTempView("dml_dup")

    val ex = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO graft.`$dir` t USING dml_dup s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET t.v = s.v
           |""".stripMargin)
    }
    assert(ex.getMessage.toUpperCase.contains("MERGE") ||
      ex.getMessage.toLowerCase.contains("cardinality"),
      s"unexpected error: ${ex.getMessage}")
    // atomicity: no partial commit landed
    assert(SnapshotTable.currentVersion(spark, dir) === Some(0L))
    assert(SnapshotTable.read(spark, dir).count() === 200)
  }

  test("a provably-no-op DELETE (every file pruned) does not bump " +
    "the version") {
    val dir = freshDir()
    stage(dir)

    // two-column condition -> group-based path; pruning drops every file
    spark.sql(
      s"DELETE FROM graft.`$dir` WHERE id > 1000000 AND name IS NOT NULL")

    assert(SnapshotTable.currentVersion(spark, dir) === Some(0L))
    assert(SnapshotTable.read(spark, dir).count() === 200)
  }

  test("a single-range DELETE takes the metadata-only fast path: " +
    "covered files drop without any copy-on-write staging") {
    val dir = freshDir()
    stage(dir)

    // range files span ~25 ids each; [25,150) covers several files
    // wholly (dropped by manifest edit) and straddles at most two
    // (rewritten via the delete op's batch staging, never dml- staging)
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id >= 25 AND id < 150")

    val t = SnapshotTable.read(spark, dir)
    assert(t.count() === 75)
    assert(t.filter(col("id").between(25, 149)).count() === 0)
    assert(SnapshotTable.currentVersion(spark, dir) === Some(1L))
    // fast-path evidence: no file in the new manifest came from the
    // row-level (ReplaceData) writer
    assert(!SnapshotTable.snapshotFiles(spark, dir, None)
      .exists(_.path.contains("dml-")),
      "metadata-only DELETE routed through the copy-on-write writer")
    // and time travel is intact
    assert(SnapshotTable.read(spark, dir, Some(0L)).count() === 200)
  }

  test("strict float bounds and open float ranges fall back to the " +
    "exact rewrite (NaN ordering)") {
    val dir = freshDir()
    val df = spark.range(0, 10)
      .select(col("id"), when(col("id") === 9, lit(Double.NaN))
        .otherwise(col("id") * 1.0).as("v"))
    SnapshotTable.commit(spark, df, dir, "overwrite",
      statsCols = Seq("id"))

    // Spark orders NaN above every double: an open range must delete it
    spark.sql(s"DELETE FROM graft.`$dir` WHERE v >= 5.0")
    val t = SnapshotTable.read(spark, dir)
    assert(t.count() === 5, "NaN row must be deleted by v >= 5.0")
    assert(t.agg(sum(col("id"))).head().getLong(0) === (0L until 5L).sum)
  }

  test("TRUNCATE TABLE and un-conditioned DELETE publish one empty " +
    "overwrite, with history intact") {
    val dir = freshDir()
    stage(dir)
    spark.sql(s"TRUNCATE TABLE graft.`$dir`")
    assert(SnapshotTable.read(spark, dir).count() === 0)
    assert(SnapshotTable.currentVersion(spark, dir) === Some(1L))
    assert(SnapshotTable.read(spark, dir, Some(0L)).count() === 200)

    val dir2 = freshDir()
    stage(dir2)
    spark.sql(s"DELETE FROM graft.`$dir2`")
    assert(SnapshotTable.read(spark, dir2).count() === 0)
    assert(SnapshotTable.read(spark, dir2, Some(0L)).count() === 200)
  }

  test("runtime group filtering: a MERGE with no statically pushable " +
    "target condition rewrites only the files that hold matches") {
    val dir = freshDir()
    stage(dir)
    val before = paths(dir)

    // source touches ids 0..5 only — all inside the first range file.
    // The ON condition references the source, so nothing pushes
    // statically; without runtime group filtering every file rewrites.
    spark.range(0, 6).select(col("id"), lit("rt").as("name"),
        lit(-9.0).as("v"))
      .createOrReplaceTempView("dml_rt_src")

    spark.sql(
      s"""MERGE INTO graft.`$dir` t USING dml_rt_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET t.v = s.v, t.name = s.name
         |""".stripMargin)

    val t = SnapshotTable.read(spark, dir)
    assert(t.count() === 200)
    assert(t.filter(col("v") === -9.0).count() === 6)
    assert(t.filter(col("name") === "rt").count() === 6)
    val after = paths(dir)
    val carried = (before intersect after).size
    assert(carried >= 6,
      s"runtime group filtering did not narrow the rewrite: " +
        s"carried=$carried of ${before.size}")
    // write distribution (cluster by _file): the one rewritten input
    // file's survivors must land as ~one output file, not one per
    // shuffle partition
    val fresh = (after diff before).size
    assert(fresh <= 2,
      s"replacement splintered into $fresh files for a 1-file rewrite")
  }

  test("an interleaved append provably outside the command's bounds " +
    "REBASES the DML instead of failing it") {
    val dir = freshDir()
    stage(dir)

    // lands between the DML's read and its publish; keys 500+ are
    // provably outside [50,75) by manifest stats, so the DML must
    // serialize before it and carry its files
    SnapshotTable.interleaveForTest = () => {
      SnapshotTable.commit(spark,
        spark.range(500, 520).select(col("id"),
          lit("late").as("name"), lit(0.0).as("v")),
        dir, "append", statsCols = Seq("id"))
      ()
    }
    try spark.sql(s"DELETE FROM graft.`$dir` WHERE id >= 50 AND id < 75" +
      " AND name IS NOT NULL") // two-column cond -> group-based path
    finally SnapshotTable.interleaveForTest = () => ()

    // both effects present: v1 = interleaved append, v2 = rebased DML
    assert(SnapshotTable.currentVersion(spark, dir) === Some(2L))
    val t = SnapshotTable.read(spark, dir)
    assert(t.count() === 175 + 20)
    assert(t.filter(col("id").between(50, 74)).count() === 0)
    assert(t.filter(col("name") === "late").count() === 20)
  }

  test("an interleaved append that MIGHT match the command's bounds " +
    "fails the DML loudly (no lost update)") {
    val dir = freshDir()
    stage(dir)

    SnapshotTable.interleaveForTest = () => {
      SnapshotTable.commit(spark,
        spark.range(60, 62).select(col("id"),
          lit("clash").as("name"), lit(0.0).as("v")),
        dir, "append", statsCols = Seq("id"))
      ()
    }
    val ex = intercept[Exception] {
      try spark.sql(s"DELETE FROM graft.`$dir` " +
        "WHERE id >= 50 AND id < 75 AND name IS NOT NULL")
      finally SnapshotTable.interleaveForTest = () => ()
    }
    def causes(e: Throwable): Seq[Throwable] =
      if (e == null) Nil else e +: causes(e.getCause)
    assert(causes(ex).exists(
      _.isInstanceOf[java.util.ConcurrentModificationException]),
      s"expected CME in the cause chain, got: $ex")
    // the interleaved append survived; the DML landed nothing
    val t = SnapshotTable.read(spark, dir)
    assert(t.count() === 202)
    assert(t.filter(col("name") === "clash").count() === 2)
  }

  test("plan evidence: group-based DML plans a COW-groups scan with " +
    "manifest pruning, and MERGE carries a runtime _file filter") {
    val dir = freshDir()
    stage(dir)

    val del = spark.sql("EXPLAIN EXTENDED " +
      s"DELETE FROM graft.`$dir` WHERE id >= 50 AND id < 75 " +
      "AND name IS NOT NULL").head().getString(0)
    assert(del.contains("COW-groups"), del.take(1500))
    assert(del.contains("manifestPruning"), del.take(1500))
    assert(del.contains("ReplaceData"), del.take(1500))

    spark.range(0, 6).select(col("id"), lit("x").as("name"),
      lit(0.0).as("v")).createOrReplaceTempView("dml_plan_src")
    val mrg = spark.sql("EXPLAIN " +
      s"MERGE INTO graft.`$dir` t USING dml_plan_src s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET t.v = s.v").head().getString(0)
    // the runtime group filter materializes as dynamic pruning on _file
    assert(mrg.contains("dynamicpruning") || mrg.contains("RuntimeFilters:"),
      mrg.take(2000))
    assert(mrg.contains("_file"), mrg.take(2000))
  }
}
