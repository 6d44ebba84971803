package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sinks.{OrcSink, SnapshotTable}

/** End-to-end argv contract for the `table` CLI leg: the snapshot-table
  * maintenance ops (commit / read@version / merge / compact / vacuum /
  * changes / versions) reached the way an operator reaches them — through
  * Cli.run — against real ORC inputs staged by the converter's own sink. */
class CliTableSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("clitable").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def df(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, s"r$i", i * 2.5)).toDF("id", "name", "v")

  private def stageOrc(lo: Long, hi: Long): String = {
    val base = freshDir()
    OrcSink.write(df(lo, hi), base, "in")
    s"$base/in"
  }

  test("table commit/read/versions round-trip through the argv contract") {
    val tableDir = freshDir() + "/t"
    val r0 = Cli.run(spark,
      Seq("table", "commit", tableDir, stageOrc(0, 100), "overwrite", "id")).get
    assert(r0.successes == 1 && r0.results.head.rows == 100)
    val r1 = Cli.run(spark,
      Seq("table", "commit", tableDir, stageOrc(100, 150), "append")).get
    assert(r1.results.head.rows == 50)
    assert(r1.results.head.table.endsWith("@v1"))

    // read latest and read@v0 export through the standard conversion job
    val outLatest = freshDir()
    val rep = Cli.run(spark, Seq("table", "read", tableDir, outLatest)).get
    assert(rep.successes == 1)
    assert(OrcSink.read(spark, s"$outLatest/t").count() == 150)
    val outV0 = freshDir()
    Cli.run(spark, Seq("table", "read", tableDir, outV0, "0"))
    assert(OrcSink.read(spark, s"$outV0/t").count() == 100)

    val vr = Cli.run(spark, Seq("table", "versions", tableDir)).get
    assert(vr.results.head.rows == 2)
  }

  test("table merge/compact/changes/vacuum drive the maintenance ops") {
    val tableDir = freshDir() + "/t"
    Cli.run(spark,
      Seq("table", "commit", tableDir, stageOrc(0, 100), "overwrite", "id")).get
    Cli.run(spark,
      Seq("table", "commit", tableDir, stageOrc(100, 130), "append", "id")).get

    // change feed of the append span
    val outCh = freshDir()
    Cli.run(spark, Seq("table", "changes", tableDir, "0", outCh)).get
    assert(OrcSink.read(spark, s"$outCh/t_changes").count() == 30)

    // merge: replace ids 10..19 with v*10
    val updBase = freshDir()
    OrcSink.write(df(10, 20).withColumn("v", col("v") * 10), updBase, "upd")
    val mr = Cli.run(spark,
      Seq("table", "merge", tableDir, s"$updBase/upd", "id")).get
    assert(mr.results.head.rows == 130)
    assert(SnapshotTable.read(spark, tableDir)
      .filter(col("id") === 15).head().getDouble(2) == 15 * 2.5 * 10)

    // compact to one version, clustered
    val cr = Cli.run(spark,
      Seq("table", "compact", tableDir, "64", "id")).get
    assert(cr.results.head.rows == 130)

    // cluster: both columns exist; the freshly compacted single segment
    // spans the whole id domain on "v" too, so the op rewrites it, then
    // no-ops when invoked again
    val cl = Cli.run(spark,
      Seq("table", "cluster", tableDir, "id,v", "4")).get
    assert(cl.results.head.rows == 130)
    assert(cl.results.head.table.contains("rewrote="))

    // range delete through the argv contract
    val dl = Cli.run(spark,
      Seq("table", "delete", tableDir, "id", "120", "129")).get
    assert(dl.results.head.rows == 10)
    assert(SnapshotTable.read(spark, tableDir).count() == 120)

    // vacuum: old rewritten files are still referenced by old versions ->
    // nothing reclaimable even at zero retention
    val vr = Cli.run(spark, Seq("table", "vacuum", tableDir, "0")).get
    assert(vr.results.head.rows == 0)
    assert(SnapshotTable.read(spark, tableDir, Some(0L)).count() == 100)

    // exactly-once downstream sync through the argv contract
    val dstDir = freshDir() + "/mirror"
    val s1 = Cli.run(spark, Seq("table", "sync", tableDir, dstDir)).get
    assert(SnapshotTable.read(spark, dstDir).count() ==
      SnapshotTable.read(spark, tableDir).count())
    val s2 = Cli.run(spark, Seq("table", "sync", tableDir, dstDir)).get
    assert(s2.results.head.rows == s1.results.head.rows, "replay must no-op")

    // bad op prints table usage and returns None
    assert(Cli.run(spark, Seq("table", "frobnicate", tableDir)).isEmpty)
  }

  test("delete-keys routes to the merge-on-read equality delete: " +
    "rowdelete commit, zero data rewrites, compact materializes") {
    val tableDir = freshDir() + "/t"
    Cli.run(spark,
      Seq("table", "commit", tableDir, stageOrc(0, 100), "overwrite", "id"))
    val before = graft.sinks.SnapshotTable
      .snapshotFiles(spark, tableDir, None).map(_.path).toSet
    val dk = Cli.run(spark,
      Seq("table", "delete-keys", tableDir, "id", "5, 7, 900")).get
    assert(dk.successes == 1)
    assert(dk.results.head.table.contains("mor-delete keys=3"))
    assert(graft.sinks.SnapshotTable
      .snapshotFiles(spark, tableDir, None).map(_.path).toSet === before)
    val out = freshDir()
    Cli.run(spark, Seq("table", "read", tableDir, out))
    val t = OrcSink.read(spark, s"$out/t")
    assert(t.count() == 98) // 900 matched nothing
    assert(t.filter(col("id").isin(5L, 7L)).count() == 0)
    // compact folds the delete in; the pending entry ages out
    Cli.run(spark, Seq("table", "compact", tableDir, "64", "id")).get
    assert(graft.sinks.SnapshotTable.pendingDeletes(spark, tableDir).isEmpty)
    val out2 = freshDir()
    Cli.run(spark, Seq("table", "read", tableDir, out2))
    assert(OrcSink.read(spark, s"$out2/t").count() == 98)
  }

  test("delete with non-numeric bounds routes to the lexicographic twin") {
    val tableDir = freshDir() + "/t"
    val base = freshDir()
    OrcSink.write((0 until 50).map(i => (f"u$i%03d", i.toLong))
      .toDF("url", "id"), base, "in")
    Cli.run(spark,
      Seq("table", "commit", tableDir, s"$base/in", "overwrite", "url")).get
    val dl = Cli.run(spark,
      Seq("table", "delete", tableDir, "url", "u010", "u019")).get
    assert(dl.results.head.rows === 10)
    assert(SnapshotTable.read(spark, tableDir).count() === 40)
    // numeric bounds still take the numeric path on a numeric key
    val dl2 = Cli.run(spark,
      Seq("table", "delete", tableDir, "id", "20", "24")).get
    assert(dl2.results.head.rows === 5)
    assert(SnapshotTable.read(spark, tableDir).count() === 35)
  }

  test("vacuum --dry-run prices the reclaim set and deletes nothing") {
    val tableDir = freshDir() + "/t"
    Cli.run(spark,
      Seq("table", "commit", tableDir, stageOrc(0, 100), "overwrite", "id")).get
    // expire the base version so its files become reclaimable, then
    // compact so the current snapshot lives in fresh files
    Cli.run(spark, Seq("table", "compact", tableDir)).get
    Cli.run(spark, Seq("table", "expire", tableDir, "1")).get
    val plan = SnapshotTable.vacuumPlan(spark, tableDir, retentionMs = 0L)
    assert(plan.nonEmpty, "expired pre-compact files must be reclaimable")
    assert(plan.forall(_._2 > 0L), "plan must carry real byte sizes")
    val filesBefore = SnapshotTable.read(spark, tableDir).count()
    val dr = Cli.run(spark,
      Seq("table", "vacuum", tableDir, "0", "--dry-run")).get
    assert(dr.results.head.files === plan.size)
    assert(dr.results.head.rows === plan.map(_._2).sum) // priced in bytes
    // NOTHING was deleted: the plan is unchanged and the table reads
    assert(SnapshotTable.vacuumPlan(spark, tableDir, 0L) === plan)
    assert(SnapshotTable.read(spark, tableDir).count() === filesBefore)
    // the real vacuum then reclaims exactly the dry run's set
    val vr = Cli.run(spark, Seq("table", "vacuum", tableDir, "0")).get
    assert(vr.results.head.files === plan.size)
    assert(SnapshotTable.read(spark, tableDir).count() === filesBefore)
  }

  test("table optimize records the z-order sort order and IMPROVES " +
    "pruning; describe reports schema, layout and merge-on-read debt") {
    val tableDir = freshDir() + "/t"
    // a deliberately UNCLUSTERED table: ids shuffled across files, so
    // every file spans most of the id domain and pruning is useless
    val shuffled = (0L until 4000L).map(i => ((i * 2654435761L) % 4000L, i))
      .toDF("id", "v").repartition(8)
    SnapshotTable.commit(spark, shuffled, tableDir, "overwrite",
      statsCols = Seq("id", "v"))
    val (_, keptBefore, totBefore) =
      SnapshotTable.scanPruned(spark, tableDir, "id", 0.0, 200.0)
    assert(keptBefore === totBefore) // nothing prunable pre-optimize
    // MOR debt visible to describe
    SnapshotTable.deleteByKeys(spark, tableDir, "id", Seq(7L).toDF("id"))
    assert(SnapshotTable.pendingDeletes(spark, tableDir).nonEmpty)
    val r = Cli.run(spark,
      Seq("table", "optimize", tableDir, "id,v", "64", "8")).get
    assert(r.successes == 1)
    // the sort order is RECORDED on the commit
    assert(SnapshotTable.tableProperties(spark, tableDir)
      .get("graft.sortOrder").contains("zorder(id,v)"))
    // prune-improvement gate: the optimized layout must actually skip
    val (pruned, keptAfter, totAfter) =
      SnapshotTable.scanPruned(spark, tableDir, "id", 0.0, 200.0)
    // 2-D Morton layout: a narrow 1-D slice legitimately spans the
    // other dimension, so expect IMPROVEMENT, not 1-file perfection
    assert(keptAfter < totAfter,
      s"optimize left $keptAfter of $totAfter files unprunable")
    assert(pruned.count() === 200) // 201 ids in [0,200] minus deleted 7
    // the rewrite materialized the pending delete
    assert(SnapshotTable.pendingDeletes(spark, tableDir).isEmpty)
    // describe prints layout + tallies (sanity: runs and reports)
    val d = Cli.run(spark, Seq("table", "describe", tableDir)).get
    assert(d.successes == 1)
    assert(d.results.head.rows === 3999L)
    // properties survive a later checkpointed replay
    (0 until 11).foreach(_ => SnapshotTable.commit(spark,
      Seq((9999L, 1L)).toDF("id", "v"), tableDir, "append"))
    assert(SnapshotTable.tableProperties(spark, tableDir)
      .get("graft.sortOrder").contains("zorder(id,v)"))
  }

  test("restore rolls back through the argv contract (version and " +
    "timestamp forms)") {
    val tableDir = freshDir() + "/t"
    Cli.run(spark,
      Seq("table", "commit", tableDir, stageOrc(0, 100), "overwrite", "id"))
    Cli.run(spark,
      Seq("table", "commit", tableDir, stageOrc(900, 910), "overwrite"))
    // bare small integer = version number
    val r = Cli.run(spark, Seq("table", "restore", tableDir, "0")).get
    assert(r.successes == 1 && r.results.head.table.contains("@v2 restored"))
    assert(SnapshotTable.read(spark, tableDir).count() === 100)
    // big integer = epoch millis (now → latest = the restored snapshot)
    val r2 = Cli.run(spark, Seq("table", "restore", tableDir,
      System.currentTimeMillis().toString)).get
    assert(r2.successes == 1)
    assert(SnapshotTable.read(spark, tableDir).count() === 100)
  }

  test("history --files lists each commit's added manifest entries") {
    val tableDir = freshDir() + "/t"
    Cli.run(spark,
      Seq("table", "commit", tableDir, stageOrc(0, 100), "overwrite", "id")).get
    Cli.run(spark,
      Seq("table", "commit", tableDir, stageOrc(100, 130), "append", "id")).get
    val out = new java.io.ByteArrayOutputStream()
    val rep = Console.withOut(new java.io.PrintStream(out)) {
      Cli.run(spark, Seq("table", "history", tableDir, "--files")).get
    }
    assert(rep.results.head.rows === 2)
    val lines = out.toString("UTF-8").linesIterator.toSeq
    // one header per version plus one indented line per manifest entry
    assert(lines.count(_.startsWith("v")) === 2)
    val fileLines = lines.filter(_.startsWith("  "))
    assert(fileLines.nonEmpty && fileLines.forall(_.contains("data/")))
    val v0Files = SnapshotTable.commitFiles(spark, tableDir, 0L)
    val v1Files = SnapshotTable.commitFiles(spark, tableDir, 1L)
    assert(fileLines.size === v0Files.size + v1Files.size)
    // a bogus flag still prints usage, not a listing
    assert(Cli.run(spark, Seq("table", "history", tableDir, "--nope")).isEmpty)
  }

  test("table sql: DML mutates the snapshot table and SELECT lands " +
    "in the output dir, all through the argv contract") {
    val tableDir = freshDir() + "/t"
    Cli.run(spark,
      Seq("table", "commit", tableDir, stageOrc(0, 100), "overwrite", "id")).get

    // DML: a ranged DELETE through the SQL surface
    val del = Cli.run(spark, Seq("table", "sql",
      s"DELETE FROM graft.`$tableDir` WHERE id >= 90 AND id <= 99")).get
    assert(del.successes == 1)
    assert(SnapshotTable.read(spark, tableDir).count() === 90)

    // MERGE upsert sourced from a range() view
    spark.range(80, 85)
      .selectExpr("id", "'hot' AS name", "cast(-1.0 AS double) AS v")
      .createOrReplaceTempView("cli_sql_src")
    Cli.run(spark, Seq("table", "sql",
      s"""MERGE INTO graft.`$tableDir` t USING cli_sql_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET t.v = s.v, t.name = s.name
         |WHEN NOT MATCHED THEN INSERT (id, name, v)
         |  VALUES (s.id, s.name, s.v)""".stripMargin)).get
    val t = SnapshotTable.read(spark, tableDir)
    assert(t.filter(col("name") === "hot").count() === 5)

    // SELECT with time travel lands as ORC in the output dir
    val outDir = freshDir()
    val sel = Cli.run(spark, Seq("table", "sql",
      s"SELECT * FROM graft.`$tableDir` VERSION AS OF 0", outDir)).get
    assert(sel.successes == 1)
    assert(OrcSink.read(spark, s"$outDir/sql").count() === 100)
  }

  test("table set-prop records properties and maintain honors the " +
    "MOR-debt threshold (no-op under, compact over)") {
    val tableDir = freshDir() + "/t"
    Cli.run(spark,
      Seq("table", "commit", tableDir, stageOrc(0, 100), "overwrite", "id"))
    Cli.run(spark, Seq("table", "set-prop", tableDir,
      s"${SnapshotTable.MaxDeleteFilesProp}=1"))
    assert(SnapshotTable.tableProperties(spark, tableDir)
      .get(SnapshotTable.MaxDeleteFilesProp).contains("1"))

    // first MOR delete: debt 1 <= threshold 1 -> maintain no-ops;
    // the delete-keys leg's auto-trigger also declines
    Cli.run(spark, Seq("table", "delete-keys", tableDir, "id", "3,5"))
    val r1 = Cli.run(spark, Seq("table", "maintain", tableDir)).get
    assert(r1.results.head.table.contains("no-op debt=1"))
    assert(SnapshotTable.pendingDeletes(spark, tableDir).size === 1)

    // second MOR delete pushes debt to 2 > 1: the delete-keys leg
    // auto-compacts (maintain would too) and the debt drains
    val r2 = Cli.run(spark,
      Seq("table", "delete-keys", tableDir, "id", "7")).get
    assert(r2.results.head.table.contains("auto-compacted"),
      r2.results.head.table)
    assert(SnapshotTable.pendingDeletes(spark, tableDir).isEmpty)
    assert(SnapshotTable.read(spark, tableDir).count() === 97)
    // pre-compact versions still apply the sidecars through time travel
    val vs = SnapshotTable.versions(spark, tableDir)
    assert(SnapshotTable.read(spark, tableDir, Some(vs.last - 1))
      .count() === 97)

    // validation: declaring a bogus partition spec through set-prop fails
    val e = intercept[Exception] {
      Cli.run(spark, Seq("table", "set-prop", tableDir,
        s"${graft.sinks.TablePartitioning.Prop}=shuffle(id)"))
    }
    assert(e.getMessage != null)
  }

  test("table set-prop splits the k=v list at TOP-LEVEL commas only: " +
    "bucket/multi-transform partition specs land intact (ADVICE r16)") {
    import graft.sinks.TablePartitioning
    val tableDir = freshDir() + "/t"
    Cli.run(spark,
      Seq("table", "commit", tableDir, stageOrc(0, 100), "overwrite", "id"))
    // the r16 repro: `graft.partition=bucket(8,id)` used to split into
    // two tokens and fail the k=v require
    Cli.run(spark, Seq("table", "set-prop", tableDir,
      s"${TablePartitioning.Prop}=bucket(8,id)"))
    assert(SnapshotTable.tableProperties(spark, tableDir)
      .get(TablePartitioning.Prop).contains("bucket(8,id)"))
    // multi-transform spec AND a second property in one call: the
    // '='-less transform tokens merge back into the spec's value
    Cli.run(spark, Seq("table", "set-prop", tableDir,
      s"${TablePartitioning.Prop}=identity(name),truncate(4,name)," +
        s"bucket(16,id),${SnapshotTable.MaxDeleteFilesProp}=3"))
    val props = SnapshotTable.tableProperties(spark, tableDir)
    assert(props.get(TablePartitioning.Prop)
      .contains("identity(name),truncate(4,name),bucket(16,id)"))
    assert(props.get(SnapshotTable.MaxDeleteFilesProp).contains("3"))
  }
}
