package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sinks.SnapshotTable

/** Aggregate pushdown to the manifest: COUNT/MIN/MAX over a snapshot
  * table answered from footer stats alone — the plan carries the
  * aggregate-pushdown scan and reads zero data bytes. The push is
  * offered only when provably exact; every decline case must still
  * produce the right answer through the plain scan. */
class SnapshotTableAggPushSpec extends AnyFunSuite
  with SparkSessionTestWrapper {

  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("snapagg").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def stage(dir: String): Unit =
    SnapshotTable.commit(spark,
      (0L until 100L).map(i =>
        (i, if (i % 10 == 0) null else s"s$i", i * 2.5,
          null: String))
        .toDF("id", "name", "v", "allnull")
        .repartitionByRange(4, col("id")),
      dir, "overwrite", statsCols = Seq("id", "name", "v", "allnull"))

  private def pushed(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("aggregate-pushdown")

  test("count(*)/count(c)/min/max fold from the manifest: pushed plan, " +
    "zero-scan, exact values incl. null-count and all-null columns") {
    val dir = freshDir()
    stage(dir)
    val t = spark.read.format("graft-table").load(dir)
    val agg = t.agg(
      count(lit(1)).as("n"), count(col("name")).as("n_name"),
      min(col("id")).as("min_id"), max(col("id")).as("max_id"),
      count(col("v")).as("n_v"),
      min(col("name")).as("min_name"), max(col("name")).as("max_name"),
      max(col("allnull")).as("max_allnull"))
    assert(pushed(agg), agg.queryExecution.executedPlan.toString)
    val r = agg.head()
    assert(r.getLong(0) === 100L)
    assert(r.getLong(1) === 90L) // 10 nulls
    assert(r.getLong(2) === 0L && r.getLong(3) === 99L)
    assert(r.getLong(4) === 100L)
    assert(r.getString(5) === "s1" && r.getString(6) === "s99")
    assert(r.isNullAt(7))
  }

  test("double MIN/MAX declines (NaN-blind footers) and a NaN-holding " +
    "column still answers NaN through the plain scan") {
    val dir = freshDir()
    stage(dir)
    val t = spark.read.format("graft-table").load(dir)
    // even on NaN-free data the push must decline: footers cannot PROVE
    // NaN absence, and Spark orders NaN greatest
    val clean = t.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    assert(!pushed(clean))
    val rc = clean.head()
    assert(rc.getDouble(0) === 0.0 && rc.getDouble(1) === 99 * 2.5)
    // with an actual NaN row, MAX must BE NaN — exactly the value a
    // footer-folded push would have gotten wrong
    SnapshotTable.commit(spark,
      Seq((1000L, "nan", Double.NaN, null: String))
        .toDF("id", "name", "v", "allnull"),
      dir, "append", statsCols = Seq("id", "name", "v"))
    val t2 = spark.read.format("graft-table").load(dir)
    val withNan = t2.agg(max(col("v")).as("mx"))
    assert(!pushed(withNan))
    assert(withNan.head().getDouble(0).isNaN)
  }

  test("timestamp MIN/MAX declines (ms-floored stats channel) and " +
    "microsecond precision survives through the plain scan") {
    val dir = freshDir()
    // 10:00:00.000500 — a value the ms-granular footer channel floors
    val micro = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    micro.setNanos(500000) // +500 microseconds
    val base = java.sql.Timestamp.valueOf("2024-01-01 09:00:00")
    SnapshotTable.commit(spark,
      Seq((1L, base), (2L, micro)).toDF("id", "ts"),
      dir, "overwrite", statsCols = Seq("id", "ts"))
    val t = spark.read.format("graft-table").load(dir)
    val agg = t.agg(max(col("ts")).as("mx"), min(col("ts")).as("mn"),
      count(col("ts")).as("n"))
    assert(!pushed(agg)) // any ts MIN/MAX in the set declines the push
    val r = agg.head()
    assert(r.getTimestamp(0).getNanos === 500000) // micros survived
    assert(r.getTimestamp(1) === base)
    assert(r.getLong(2) === 2L)
    // counts alone (no ts fold) still push
    val c = t.agg(count(col("ts")).as("n"), count(lit(1)).as("all"))
    assert(pushed(c))
    assert(c.head().getLong(0) === 2L)
  }

  test("declines stay correct: WHERE filter, pending MOR delete, " +
    "untracked column, DISTINCT") {
    val dir = freshDir()
    stage(dir)
    val t = spark.read.format("graft-table").load(dir)
    // a straddling filter now pushes HYBRID (r16, VERDICT r15 #5):
    // interior files fold from footers, only straddlers are read
    val f = t.filter(col("id") < 50).agg(count(lit(1)))
    assert(pushed(f))
    assert(f.head().getLong(0) === 50L)
    // DISTINCT aggregates never push
    val d = t.agg(countDistinct(col("name")))
    assert(!pushed(d))
    assert(d.head().getLong(0) === 90L)
    // a pending MOR delete makes manifest sums upper bounds: decline,
    // and the plain scan's reader applies the delete
    SnapshotTable.deleteByKeys(spark, dir, "id", Seq(1L, 2L).toDF("id"))
    val t2 = spark.read.format("graft-table").load(dir)
    val c2 = t2.agg(count(lit(1)), min(col("id")))
    assert(!pushed(c2))
    val r2 = c2.head()
    assert(r2.getLong(0) === 98L)
    assert(r2.getLong(1) === 0L)
    // materialize: the push comes back with the post-delete values
    SnapshotTable.compact(spark, dir, targetBytes = 1L << 20,
      clusterBy = Some("id"), statsCols = Seq("id", "name", "v"))
    val t3 = spark.read.format("graft-table").load(dir)
    val c3 = t3.agg(count(lit(1)), min(col("id")), max(col("id")))
    assert(pushed(c3))
    val r3 = c3.head()
    assert(r3.getLong(0) === 98L && r3.getLong(1) === 0L &&
      r3.getLong(2) === 99L)
    // untracked column (compact re-harvested id/name/v only): decline
    val u = t3.agg(min(col("allnull")))
    assert(!pushed(u))
    assert(u.head().isNullAt(0))
  }

  test("filtered COUNT/MIN/MAX pushes when the filter is exactly " +
    "decided by the manifest (file-aligned closed bounds)") {
    val dir = freshDir()
    // two files with KNOWN key ranges: [0,50) and [50,100)
    val lo = (0L until 50L).map(i => (i, s"s$i")).toDF("id", "name")
    val hi = (50L until 100L).map(i => (i, s"s$i")).toDF("id", "name")
    SnapshotTable.commit(spark, lo.coalesce(1), dir, "overwrite",
      statsCols = Seq("id", "name"))
    SnapshotTable.commit(spark, hi.coalesce(1), dir, "append",
      statsCols = Seq("id", "name"))
    val t = spark.read.format("graft-table").load(dir)
    // id <= 49 prunes the hi file and FULLY covers the lo file: the
    // filter is consumed and the aggregate answers from the manifest
    val a = t.filter(col("id") <= 49)
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx"), count(col("name")).as("nn"))
    assert(pushed(a), a.queryExecution.executedPlan.toString)
    val r = a.head()
    assert(r.getLong(0) === 50L && r.getLong(1) === 0L &&
      r.getLong(2) === 49L && r.getLong(3) === 50L)
    // a filter STRADDLING a file pushes HYBRID (r16): the lo file is
    // read with the filter applied, nothing else — values exact, and
    // the telemetry proves the residual scan touched only the straddler
    val b = t.filter(col("id") <= 30).agg(count(lit(1)).as("n"))
    assert(pushed(b))
    assert(b.head().getLong(0) === 31L)
    val hyb = graft.sources.SnapshotTableScan.lastHybridAgg.get(dir)
    assert(hyb != null && hyb._1 === 1,
      s"expected exactly one straddling file read, got $hyb")
    // a strict bound touching a file boundary: lo is interior (max 49
    // < 50), hi straddles conservatively (widened box keeps it) and is
    // read — exact either way
    val c = t.filter(col("id") < 50).agg(count(lit(1)).as("n"))
    assert(pushed(c))
    assert(c.head().getLong(0) === 50L)
    // string-channel filter: name >= "s0" covers everything -> pushed
    val s = t.filter(col("name") >= "s0").agg(count(lit(1)).as("n"))
    assert(pushed(s))
    assert(s.head().getLong(0) === 100L)
  }

  test("GROUP BY pushes when every kept file is single-valued and " +
    "null-free on the group column; multi-valued files decline") {
    val dir = freshDir()
    // one append per group: each file single-valued on 'cat'
    Seq("a", "b", "c").zipWithIndex.foreach { case (c, i) =>
      val df = (0L until 10L).map(j => (i * 10L + j, c))
        .toDF("id", "cat")
      SnapshotTable.commit(spark, df.coalesce(1), dir,
        if (i == 0) "overwrite" else "append",
        statsCols = Seq("id", "cat"))
    }
    val t = spark.read.format("graft-table").load(dir)
    val g = t.groupBy(col("cat")).agg(count(lit(1)).as("n"),
      min(col("id")).as("mn"), max(col("id")).as("mx"))
    assert(pushed(g), g.queryExecution.executedPlan.toString)
    val rows = g.orderBy("cat").collect()
    assert(rows.length === 3)
    assert(rows(0).getString(0) === "a" && rows(0).getLong(1) === 10L &&
      rows(0).getLong(2) === 0L && rows(0).getLong(3) === 9L)
    assert(rows(2).getString(0) === "c" && rows(2).getLong(3) === 29L)
    // grouping by a MULTI-valued column declines; the plain scan answers
    val m = t.groupBy(col("id") % 2 === 0).count() // expression: declines
    assert(!pushed(m))
    assert(m.count() === 2)
    // append ONE file spanning two cats: that file routes to the
    // RESIDUAL read (grouped hybrid, r17 — was a full decline) — still
    // pushed, and only the multi-valued file is scanned
    SnapshotTable.commit(spark,
      Seq((100L, "a"), (101L, "b")).toDF("id", "cat").coalesce(1),
      dir, "append", statsCols = Seq("id", "cat"))
    val t2 = spark.read.format("graft-table").load(dir)
    val g2 = t2.groupBy(col("cat")).agg(count(lit(1)).as("n"))
    assert(pushed(g2), g2.queryExecution.executedPlan.toString)
    val g2r = g2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g2r === Map("a" -> 11L, "b" -> 11L, "c" -> 10L))
    val hybG = graft.sources.SnapshotTableScan.lastHybridAgg.get(dir)
    assert(hybG != null && hybG._1 === 1,
      s"expected exactly one residual file read, got $hybG")
    // grouped AND filtered, both provable: cat groups under id <= 9
    // (file-aligned: exactly the first file)
    val gf = t.filter(col("id") <= 9).groupBy(col("cat"))
      .agg(count(lit(1)).as("n"))
    assert(pushed(gf))
    val gfr = gf.collect()
    assert(gfr.length === 1 && gfr(0).getString(0) === "a" &&
      gfr(0).getLong(1) === 10L)
  }

  test("GROUP BY + a straddling range filter pushes HYBRID (r17): " +
    "interior groups fold from footers, straddlers read, merge exact") {
    val dir = freshDir()
    // one file per cat with disjoint id ranges: a=[0,10) b=[10,20)
    // c=[20,30)
    Seq("a", "b", "c").zipWithIndex.foreach { case (c, i) =>
      val df = (0L until 10L).map(j => (i * 10L + j, c))
        .toDF("id", "cat")
      SnapshotTable.commit(spark, df.coalesce(1), dir,
        if (i == 0) "overwrite" else "append",
        statsCols = Seq("id", "cat"))
    }
    val t = spark.read.format("graft-table").load(dir)
    // id <= 14: file a interior (fully satisfied), file b straddles ->
    // residual read, file c box-pruned entirely
    val g = t.filter(col("id") <= 14).groupBy(col("cat"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx"))
    assert(pushed(g), g.queryExecution.executedPlan.toString)
    val rows = g.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows === Map("a" -> ((10L, 0L, 9L)), "b" -> ((5L, 10L, 14L))))
    val hyb = graft.sources.SnapshotTableScan.lastHybridAgg.get(dir)
    assert(hyb != null && hyb._1 === 1 && hyb._2 === 2,
      s"expected 1 straddler of 2 kept files, got $hyb")
    // null group keys ride the residual read: a mixed file with a null
    // cat row still pushes and groups exactly
    SnapshotTable.commit(spark,
      Seq((100L, null: String), (101L, "a")).toDF("id", "cat")
        .coalesce(1), dir, "append", statsCols = Seq("id", "cat"))
    val t2 = spark.read.format("graft-table").load(dir)
    val g2 = t2.groupBy(col("cat")).agg(count(lit(1)).as("n"))
    assert(pushed(g2), g2.queryExecution.executedPlan.toString)
    val m2 = g2.collect().map(r =>
      (if (r.isNullAt(0)) "<null>" else r.getString(0)) -> r.getLong(1))
      .toMap
    assert(m2 === Map("a" -> 11L, "b" -> 10L, "c" -> 10L,
      "<null>" -> 1L))
    // grouped double MIN answered ONLY by the exact residual read (the
    // footer channel can never fold doubles): pushes, values exact
    val dd = freshDir()
    SnapshotTable.commit(spark,
      Seq((1L, "a", 2.5), (2L, "a", 1.5), (3L, "b", 7.25))
        .toDF("id", "cat", "v").coalesce(1),
      dd, "overwrite", statsCols = Seq("id", "cat", "v"))
    val gd = spark.read.format("graft-table").load(dd)
      .groupBy(col("cat")).agg(min(col("v")).as("mv"))
    assert(pushed(gd), gd.queryExecution.executedPlan.toString)
    assert(gd.collect().map(r => r.getString(0) -> r.getDouble(1))
      .toMap === Map("a" -> 1.5, "b" -> 7.25))
    // grouped TIMESTAMP min/max still declines (external Timestamp is
    // not an internal value); the plain scan answers
    val td = freshDir()
    SnapshotTable.commit(spark,
      Seq((1L, "a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
        (2L, "a", java.sql.Timestamp.valueOf("2024-06-01 00:00:00")),
        (3L, "b", java.sql.Timestamp.valueOf("2024-03-01 00:00:00")))
        .toDF("id", "cat", "ts").coalesce(1),
      td, "overwrite", statsCols = Seq("id", "cat"))
    val gt = spark.read.format("graft-table").load(td)
      .groupBy(col("cat")).agg(max(col("ts")).as("mt"))
    assert(!pushed(gt))
    assert(gt.filter(col("cat") === "a").head().getTimestamp(1) ===
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
  }

  test("GROUP BY an identity-PARTITION column folds from the tuple " +
    "stamps alone (column never harvested) — metadata-only, with a " +
    "straddling bound hybrid (r17)") {
    val dir = freshDir()
    val df = (0L until 90L).map(i => (i, s"s${i % 3}"))
      .toDF("id", "cat")
    // statsCols deliberately EXCLUDES cat: the identity stamp is the
    // only single-valuedness proof
    graft.sinks.SnapshotTable.commit(spark,
      df.repartitionByRange(3, col("id")), dir, "overwrite",
      statsCols = Seq("id"),
      props = Map(graft.sinks.TablePartitioning.Prop -> "identity(cat)"))
    val t = spark.read.format("graft-table").load(dir)
    val g = t.groupBy(col("cat")).agg(count(lit(1)).as("n"))
    assert(pushed(g), g.queryExecution.executedPlan.toString)
    assert(g.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("s0" -> 30L, "s1" -> 30L, "s2" -> 30L))
    // + a straddling bound: interior tuples fold, straddler file read
    val gf = t.filter(col("id") <= 40).groupBy(col("cat"))
      .agg(count(lit(1)).as("n"))
    assert(pushed(gf), gf.queryExecution.executedPlan.toString)
    assert(gf.collect().map(_.getLong(1)).sum === 41L)
  }

  test("a consumed filter stays exact on a STREAMING tail: files " +
    "committed after the proof are re-filtered row-wise by the reader") {
    val dir = freshDir()
    val lo = (0L until 50L).map(i => (i, s"s$i")).toDF("id", "name")
    SnapshotTable.commit(spark, lo.coalesce(1), dir, "overwrite",
      statsCols = Seq("id", "name"))
    val ckpt = Files.createTempDirectory("aggpushck").toFile
    ckpt.deleteOnExit()
    val stream = spark.readStream.format("graft-table").load(dir)
      .filter(col("id") <= 49) // consumed: the lo file fully satisfies
    val q = stream.writeStream.format("memory")
      .queryName("aggpush_tail")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("aggpush_tail").count() === 50)
      // the tail: a MIXED file the proof never saw — 30..69 — where only
      // 30..49 satisfy the consumed conjunct
      SnapshotTable.commit(spark,
        (30L until 70L).map(i => (i, s"t$i")).toDF("id", "name")
          .coalesce(1), dir, "append", statsCols = Seq("id", "name"))
      q.processAllAvailable()
      assert(spark.table("aggpush_tail").count() === 70)
      assert(spark.table("aggpush_tail")
        .agg(max(col("id"))).head().getLong(0) === 49L)
    } finally q.stop()
  }

  test("time travel pushes the as-of fold") {
    val dir = freshDir()
    stage(dir)
    SnapshotTable.commit(spark,
      Seq((500L, "zz", -1.0, null: String))
        .toDF("id", "name", "v", "allnull"),
      dir, "append", statsCols = Seq("id", "name", "v"))
    val v0 = spark.read.format("graft-table").option("versionAsOf", 0)
      .load(dir).agg(max(col("id")), count(lit(1)))
    assert(pushed(v0))
    assert(v0.head().getLong(0) === 99L)
    assert(v0.head().getLong(1) === 100L)
    val v1 = spark.read.format("graft-table").load(dir)
      .agg(max(col("id")), min(col("name")), count(lit(1)))
    assert(pushed(v1))
    val r = v1.head()
    assert(r.getLong(0) === 500L && r.getString(1) === "s1" &&
      r.getLong(2) === 101L)
  }
}
