package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sinks.SnapshotTable

/** The per-table MOR declaration contract (ADVICE r15): `graft.update
  * .mode` / `graft.update.key` are TABLE PROPERTIES recorded in the
  * commit log — not session confs matched by column name — and the
  * declaration carries proof obligations:
  *
  *   - declaring the key VALIDATES the current snapshot (manifest must
  *     prove nulls==0);
  *   - every later commit must keep the proof (publish rejects fresh
  *     files without null-free footer stats for the key);
  *   - the non-nullable schema report only appears where the AS-OF
  *     proof holds (time travel to pre-declaration versions stays
  *     honest);
  *   - a same-named column on an UNDECLARED table is untouched;
  *   - MOR-routed commands detect the duplicated-key hazard (equality
  *     deletes remove ALL rows of a key; a partial match would lose the
  *     unmatched duplicates) and abort instead of losing rows;
  *   - MERGE INTO routes through the same delta path (VERDICT r15 #2):
  *     matched legs land as key sidecar + appends, zero rewrites;
  *   - key sidecars write multi-part above the target-bytes knob
  *     (VERDICT r15 #3) and readers are part-count-blind.
  */
class SnapshotTableMorContractSpec extends AnyFunSuite
    with SparkSessionTestWrapper {

  spark.conf.set("spark.sql.catalog.graft",
    "graft.sources.SnapshotTableCatalog")

  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("snapmorc").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def stage(dir: String,
                    declare: Boolean = true): Unit = {
    val df = spark.range(0, 100)
      .select(col("id"), concat(lit("c"), col("id") % 7).as("cat"),
        (col("id") * lit(1.5)).as("v"))
    val props =
      if (declare) Map(SnapshotTable.UpdateModeProp -> "mor",
        SnapshotTable.UpdateKeyProp -> "id")
      else Map.empty[String, String]
    SnapshotTable.commit(spark, df.repartitionByRange(4, col("id")),
      dir, "overwrite", statsCols = Seq("id"), props = props)
  }

  private def paths(dir: String): Set[String] =
    SnapshotTable.snapshotFiles(spark, dir, None).map(_.path).toSet

  test("declaring an update key validates null-freedom: a table with " +
    "null keys refuses the declaration") {
    val dir = freshDir()
    SnapshotTable.commit(spark,
      Seq((Some(1L), "a"), (None, "b")).toDF("id", "cat"),
      dir, "overwrite", statsCols = Seq("id"))
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.setTableProperties(spark, dir, Map(
        SnapshotTable.UpdateModeProp -> "mor",
        SnapshotTable.UpdateKeyProp -> "id"))
    }
    assert(e.getMessage.contains("null-free"))
    // and a nonexistent column refuses too
    val e2 = intercept[IllegalArgumentException] {
      SnapshotTable.setTableProperties(spark, dir,
        Map(SnapshotTable.UpdateKeyProp -> "nope"))
    }
    assert(e2.getMessage.contains("no such column"))
  }

  test("the declaration is per-table: a same-named column on an " +
    "undeclared table keeps its nullable schema and COW routing") {
    val declared = freshDir()
    val plain = freshDir()
    stage(declared, declare = true)
    stage(plain, declare = false)
    val dSchema = spark.read.format("graft-table").load(declared).schema
    val pSchema = spark.read.format("graft-table").load(plain).schema
    assert(!dSchema("id").nullable, "declared table must report non-null")
    assert(pSchema("id").nullable, "undeclared table must stay nullable")
    // COW on the plain table: the touched file is REWRITTEN
    val before = paths(plain)
    spark.sql(s"UPDATE graft.`$plain` SET cat = 'hot' WHERE id = 3")
    assert(!before.subsetOf(paths(plain)),
      "undeclared table must route copy-on-write")
    assert(SnapshotTable.read(spark, plain).count() === 100)
  }

  test("schema honesty across time travel: a pre-declaration version " +
    "reports the key nullable") {
    val dir = freshDir()
    stage(dir, declare = false)                       // v0: no props
    SnapshotTable.setTableProperties(spark, dir, Map( // v1: declare
      SnapshotTable.UpdateModeProp -> "mor",
      SnapshotTable.UpdateKeyProp -> "id"))
    assert(!spark.read.format("graft-table").load(dir).schema("id")
      .nullable)
    assert(spark.read.format("graft-table").option("versionAsOf", 0)
      .load(dir).schema("id").nullable,
      "time travel before the declaration must stay nullable")
  }

  test("publish enforces the declaration: appending null keys — or " +
    "omitting the key column — fails loudly before any commit lands") {
    val dir = freshDir()
    stage(dir)
    val v = SnapshotTable.currentVersion(spark, dir)
    val e = intercept[IllegalStateException] {
      SnapshotTable.commit(spark,
        Seq((Some(500L), "x"), (None, "y")).toDF("id", "cat"),
        dir, "append")
    }
    assert(e.getMessage.contains("null-free"))
    val e2 = intercept[IllegalStateException] {
      SnapshotTable.commit(spark, Seq(("only-cat")).toDF("cat"),
        dir, "append")
    }
    assert(e2.getMessage.contains("null-free"))
    assert(SnapshotTable.currentVersion(spark, dir) === v,
      "no commit may land")
    assert(SnapshotTable.read(spark, dir).count() === 100)
  }

  test("duplicated-key hazard: an UPDATE matching only SOME rows of a " +
    "duplicated key aborts instead of silently dropping the rest") {
    val dir = freshDir()
    // key 5 is duplicated (null-free, so the declaration validates)
    val df = Seq((5L, "dup-a", 1.0), (5L, "dup-b", 2.0), (9L, "solo", 3.0))
      .toDF("id", "cat", "v")
    SnapshotTable.commit(spark, df.coalesce(1), dir, "overwrite",
      statsCols = Seq("id"),
      props = Map(SnapshotTable.UpdateModeProp -> "mor",
        SnapshotTable.UpdateKeyProp -> "id"))
    val e = intercept[Exception] {
      spark.sql(s"UPDATE graft.`$dir` SET v = 99.0 " +
        "WHERE id = 5 AND cat = 'dup-a'")
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("not unique"), s"unexpected failure: $e")
    // nothing committed, nothing lost
    assert(SnapshotTable.read(spark, dir).count() === 3)
    // matching the WHOLE key group is fine (both rows rewritten)
    spark.sql(s"UPDATE graft.`$dir` SET v = 99.0 WHERE id = 5")
    val got = SnapshotTable.read(spark, dir)
    assert(got.filter(col("id") === 5L && col("v") === 99.0).count() === 2)
    assert(got.count() === 3)
  }

  test("MERGE INTO routes through MOR: matched update + not-matched " +
    "insert land as one rowupdate commit with zero data-file rewrites") {
    val dir = freshDir()
    stage(dir)
    val before = paths(dir)
    Seq((3L, "merged", -1.0), (500L, "fresh", -2.0))
      .toDF("id", "cat", "v").createOrReplaceTempView("mor_merge_src")
    spark.sql(
      s"""MERGE INTO graft.`$dir` t USING mor_merge_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET t.cat = s.cat, t.v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = paths(dir)
    assert(before.subsetOf(after), "MOR MERGE rewrote a data file")
    val v = SnapshotTable.currentVersion(spark, dir).get
    assert(SnapshotTable.commitStats(spark, dir, v)._1 === "rowupdate")
    val t = SnapshotTable.read(spark, dir)
    assert(t.count() === 101)
    assert(t.filter(col("id") === 3L).select("cat").head().getString(0)
      === "merged")
    assert(t.filter(col("id") === 500L).count() === 1)
    // matched DELETE leg too
    spark.sql(
      s"""MERGE INTO graft.`$dir` t USING mor_merge_src s ON t.id = s.id
         |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(paths(dir).size >= after.size ||
      SnapshotTable.read(spark, dir).count() === 99)
    assert(SnapshotTable.read(spark, dir).count() === 99)
    assert(before.subsetOf(paths(dir)), "MOR MERGE DELETE rewrote files")
  }

  test("key sidecars split by the target-bytes knob and reads are " +
    "part-count-blind") {
    val dir = freshDir()
    stage(dir)
    spark.conf.set("spark.graft.table.sidecarTargetBytes", "64")
    try {
      val rep = SnapshotTable.upsertByKeys(spark, dir, "id",
        spark.range(0, 40).select(col("id"), lit("upd").as("cat"),
          lit(0.0).as("v")))
      assert(rep.keys === 40)
      val dels = SnapshotTable.pendingDeletes(spark, dir)
      assert(dels.size > 1, s"expected a multi-part sidecar, got $dels")
      val t = SnapshotTable.read(spark, dir)
      assert(t.count() === 100)
      assert(t.filter(col("cat") === "upd").count() === 40)
    } finally spark.conf.unset("spark.graft.table.sidecarTargetBytes")
  }
}
