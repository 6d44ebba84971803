package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sinks.SnapshotTable

/** Commit-protocol laws for the snapshot table: replay semantics
  * (append/overwrite/time travel), atomicity (unpublished data is
  * invisible), optimistic-concurrency retry, footer-harvested stats
  * equality with recomputed truth, pruning soundness on random ranges,
  * and vacuum safety. */
class SnapshotTableSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("snaptbl").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def df(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, s"r$i", i * 2.5)).toDF("id", "name", "v")

  test("append/overwrite replay and time travel") {
    val dir = freshDir()
    val v0 = SnapshotTable.commit(spark, df(0, 100), dir, "overwrite")
    val v1 = SnapshotTable.commit(spark, df(100, 150), dir, "append")
    val v2 = SnapshotTable.commit(spark, df(500, 510), dir, "overwrite")
    val v3 = SnapshotTable.commit(spark, df(510, 520), dir, "append")
    assert(Seq(v0, v1, v2, v3) === Seq(0L, 1L, 2L, 3L))
    assert(SnapshotTable.read(spark, dir, Some(0)).count() === 100)
    assert(SnapshotTable.read(spark, dir, Some(1)).count() === 150)
    assert(SnapshotTable.read(spark, dir, Some(2)).count() === 10)
    assert(SnapshotTable.read(spark, dir).count() === 20)
    // every version still readable after later overwrites (no vacuum)
    assert(SnapshotTable.read(spark, dir, Some(1))
      .agg(sum(col("id"))).head().getLong(0) === (0L until 150L).sum)
  }

  test("uncommitted data is invisible; vacuum reclaims it and spares the committed") {
    val dir = freshDir()
    SnapshotTable.commit(spark, df(0, 50), dir, "overwrite")
    // simulate a crashed commit: data files on disk, no log entry
    df(900, 950).write.orc(s"$dir/data/batch-orphan")
    assert(SnapshotTable.read(spark, dir).count() === 50)
    val dead = SnapshotTable.vacuum(spark, dir)
    assert(dead.nonEmpty && dead.forall(_.startsWith("data/batch-orphan")))
    assert(!Files.list(Paths.get(s"$dir/data")).iterator().hasNext ==
      false) // data dir still there
    assert(SnapshotTable.read(spark, dir).count() === 50) // unharmed
    assert(SnapshotTable.vacuum(spark, dir).isEmpty) // idempotent
  }

  test("optimistic concurrency: a lost race retries to the next version") {
    val dir = freshDir()
    SnapshotTable.commit(spark, df(0, 10), dir, "overwrite")
    // occupy v1 by hand — the next committer must land at v2
    val taken = Paths.get(dir, "_log", "v" + "0" * 19 + "1.json")
    Files.write(taken,
      """{"version":1,"action":"append","files":[]}""".getBytes)
    val v = SnapshotTable.commit(spark, df(10, 20), dir, "append")
    assert(v === 2L)
    assert(SnapshotTable.read(spark, dir).count() === 20)
  }

  test("footer-harvested stats equal recomputed truth") {
    val dir = freshDir()
    val data = Seq((5L, 2.5, "bb"), (1L, -3.0, "aa"), (9L, 0.5, "zz"),
      (7L, 1.0, null.asInstanceOf[String])).toDF("id", "v", "s")
    SnapshotTable.commit(spark, data.coalesce(1), dir, "overwrite",
      statsCols = Seq("id", "v", "s"))
    val e = SnapshotTable.snapshotFiles(spark, dir).head
    assert(e.rows === 4)
    assert(e.stats("id") === SnapshotTable.ColStats(Some(1.0), Some(9.0),
      None, None, 0L))
    assert(e.stats("v") === SnapshotTable.ColStats(Some(-3.0), Some(2.5),
      None, None, 0L))
    assert(e.stats("s") === SnapshotTable.ColStats(None, None, Some("aa"),
      Some("zz"), 1L))
  }

  test("pruning is sound on arbitrary ranges and skips dead files") {
    val dir = freshDir()
    val data = (0L until 4000L).map(i => (i, i % 7)).toDF("id", "g")
    SnapshotTable.commit(spark, data.repartitionByRange(8, col("id")), dir,
      "overwrite", statsCols = Seq("id"))
    val full = SnapshotTable.read(spark, dir)
    for ((lo, hi) <- Seq((0.0, 100.0), (1500.0, 1700.0), (3900.0, 4100.0),
      (-50.0, -1.0), (900.0, 3100.0))) {
      val (pruned, kept, total) =
        SnapshotTable.scanPruned(spark, dir, "id", lo, hi)
      val truth = full.where(col("id") >= lo && col("id") <= hi)
      assert(total === 8)
      assert(pruned.agg(count(lit(1)), sum(col("id"))).head() ===
        truth.agg(count(lit(1)), sum(col("id"))).head(), s"range [$lo,$hi]")
      // narrow ranges must actually skip files on a range-clustered table
      if (hi - lo <= 300.0) assert(kept <= 2, s"range [$lo,$hi] kept $kept")
    }
  }

  test("merge: copy-on-write upsert rewrites only overlapping files, byte-identical carry") {
    val dir = freshDir()
    val data = (0L until 4000L).map(i => (i, i * 10)).toDF("id", "v")
    SnapshotTable.commit(spark, data.repartitionByRange(8, col("id")), dir,
      "overwrite", statsCols = Seq("id"))
    val before = SnapshotTable.snapshotFiles(spark, dir)
      .map(e => e.path -> e.bytes).toMap
    // update a narrow key slice + insert brand-new keys
    val updates = ((100L until 200L).map(i => (i, -1L)) ++
      Seq((9000L, 1L), (9001L, 2L))).toDF("id", "v")
    val r = SnapshotTable.merge(spark, dir, updates, "id",
      statsCols = Seq("id"))
    assert(r.filesCarried >= 6, s"carried ${r.filesCarried}")
    // carried entries are the SAME files (path and bytes unchanged)
    val after = SnapshotTable.snapshotFiles(spark, dir)
    val carried = after.filter(e => before.contains(e.path))
    assert(carried.size === r.filesCarried)
    carried.foreach(e => assert(e.bytes === before(e.path)))
    // content: updated slice replaced, inserts present, rest untouched
    val m = SnapshotTable.read(spark, dir)
    assert(m.count() === 4002)
    assert(m.where(col("id").between(100, 199) && col("v") === -1L)
      .count() === 100)
    assert(m.where(col("id") >= 9000).count() === 2)
    assert(m.where(col("id") === 50).select("v").head().getLong(0) === 500)
    // pre-merge version still time-travels to the original content
    assert(SnapshotTable.read(spark, dir, Some(0)).count() === 4000)
  }

  test("merge without stats conservatively rewrites everything, correctly") {
    val dir = freshDir()
    SnapshotTable.commit(spark, df(0, 100), dir, "overwrite") // no stats
    val r = SnapshotTable.merge(spark, dir,
      Seq((5L, "X", 0.0)).toDF("id", "name", "v"), "id")
    assert(r.filesCarried === 0)
    val m = SnapshotTable.read(spark, dir)
    assert(m.count() === 100)
    assert(m.where(col("id") === 5).select("name").head().getString(0) === "X")
  }

  test("compact bin-packs, preserves rows, and restores prunability") {
    val dir = freshDir()
    val data = (0L until 4000L).map(i => (i, i % 13)).toDF("id", "g")
    // 16 hash-scattered files: every file spans the whole key range
    SnapshotTable.commit(spark, data.repartition(16), dir, "overwrite",
      statsCols = Seq("id"))
    assert(SnapshotTable.snapshotFiles(spark, dir).size === 16)
    val v = SnapshotTable.compact(spark, dir, targetBytes = 1L << 20,
      clusterBy = Some("id"), statsCols = Seq("id"))
    val files = SnapshotTable.snapshotFiles(spark, dir)
    assert(files.size < 16)
    val c = SnapshotTable.read(spark, dir)
    assert(c.count() === 4000)
    assert(c.agg(sum(col("id"))).head().getLong(0) === (0L until 4000L).sum)
    // clusterBy re-established tight ranges: a narrow slice prunes again
    val (_, kept, total) = SnapshotTable.scanPruned(spark, dir, "id", 0.0, 10.0)
    assert(kept === 1 || total === 1)
    assert(SnapshotTable.read(spark, dir, Some(v - 1)).count() === 4000)
  }

  test("change feed returns exactly the appended rows; overwrite spans are rejected") {
    val dir = freshDir()
    SnapshotTable.commit(spark, df(0, 100), dir, "overwrite")
    SnapshotTable.commit(spark, df(100, 130), dir, "append")
    SnapshotTable.commit(spark, df(130, 140), dir, "append")
    val changes = SnapshotTable.changesSince(spark, dir, 0L)
    assert(changes.count() === 40)
    assert(changes.agg(min(col("id"))).head().getLong(0) === 100)
    val one = SnapshotTable.changesSince(spark, dir, 1L, Some(2L))
    assert(one.count() === 10)
    SnapshotTable.commit(spark, df(0, 5), dir, "overwrite")
    intercept[IllegalArgumentException] {
      SnapshotTable.changesSince(spark, dir, 0L)
    }
  }

  test("files without stats for the pruning column are conservatively kept") {
    val dir = freshDir()
    SnapshotTable.commit(spark, df(0, 100), dir, "overwrite") // no stats
    val (pruned, kept, total) =
      SnapshotTable.scanPruned(spark, dir, "id", 10.0, 20.0)
    assert(kept === total)
    assert(pruned.count() === 11)
  }
}
