package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sinks.SnapshotTable

/** Column-level statistics to the optimizer (VERDICT r15 #7): the DSv2
  * scan's estimateStatistics reports per-column nullCount (exact footer
  * sums) and a span-bound NDV estimate on integral/date channels, which
  * Spark's transformV2Stats folds into catalyst attributeStats under
  * CBO — enabling cost-based join reordering on snapshot tables. */
class SnapshotTableCboSpec extends AnyFunSuite
    with SparkSessionTestWrapper {

  spark.conf.set("spark.sql.catalog.graft",
    "graft.sources.SnapshotTableCatalog")

  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("snapcbo").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def stage(dir: String, n: Long): Unit = {
    val df = spark.range(0, n).select(col("id").as("k"),
      concat(lit("p"), col("id")).as("payload"))
    SnapshotTable.commit(spark, df.repartitionByRange(4, col("k")), dir,
      "overwrite", statsCols = Seq("k"))
  }

  test("connector column stats surface as catalyst attributeStats " +
    "under CBO: exact null counts, span-bound NDV") {
    val dir = freshDir()
    val df0 = Seq((Some(1L), "a"), (Some(2L), "b"), (None, "c"),
      (Some(9L), "d")).toDF("k", "s")
    SnapshotTable.commit(spark, df0.coalesce(1), dir, "overwrite",
      statsCols = Seq("k"))
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val rel = spark.read.format("graft-table").load(dir)
        .queryExecution.optimizedPlan.collectLeaves().head
      val stats = rel.stats
      assert(stats.rowCount.contains(BigInt(4)))
      val kStat = stats.attributeStats.find(_._1.name == "k")
        .map(_._2).getOrElse(fail(s"no attributeStats for k: $stats"))
      assert(kStat.nullCount.contains(BigInt(1)), kStat)
      // span bound: [1,9] -> 9; non-null rows 3 -> NDV estimate 3
      assert(kStat.distinctCount.contains(BigInt(3)), kStat)
    } finally spark.conf.unset("spark.sql.cbo.enabled")
  }

  private def stageStr(dir: String, n: Long): Unit = {
    val df = spark.range(0, n).select(
      concat(lit("k"), col("id")).as("k"),
      concat(lit("p"), col("id")).as("payload"))
    SnapshotTable.commit(spark, df.repartitionByRange(4, col("k")), dir,
      "overwrite", statsCols = Seq("k"),
      props = Map(SnapshotTable.NdvStatsProp -> "k"))
  }

  test("string NDV from merged per-file HLL sketches (r17): declared " +
    "tables report distinctCount, undeclared ones do not, and a " +
    "string-keyed 3-table join reorders under CBO") {
    // declared: per-file sketches merge to ~the true distinct count
    val dir = freshDir()
    val df = spark.range(0, 1000).select(
      concat(lit("u"), col("id") % 37).as("sk"), col("id").as("v"))
    SnapshotTable.commit(spark, df.repartition(3), dir, "overwrite",
      props = Map(SnapshotTable.NdvStatsProp -> "sk"))
    SnapshotTable.commit(spark,
      spark.range(1000, 1500).select(
        concat(lit("w"), col("id") % 11).as("sk"), col("id").as("v"))
        .repartition(2), dir, "append")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val rel = spark.read.format("graft-table").load(dir)
        .queryExecution.optimizedPlan.collectLeaves().head
      val skStat = rel.stats.attributeStats.find(_._1.name == "sk")
        .map(_._2).getOrElse(fail(s"no attributeStats: ${rel.stats}"))
      // truth = 37 + 11 = 48 distinct; HLL at lgK 12 is near-exact here
      val ndv = skStat.distinctCount.getOrElse(
        fail(s"no distinctCount: $skStat")).toLong
      assert(ndv >= 44 && ndv <= 53, s"merged sketch NDV off: $ndv")
      assert(skStat.nullCount.contains(BigInt(0)), skStat)
      // undeclared: string column reports NO distinct-count signal
      val plain = freshDir()
      stage(plain, 100)
      val pRel = spark.read.format("graft-table").load(plain)
        .queryExecution.optimizedPlan.collectLeaves().head
      val pStat = pRel.stats.attributeStats
        .find(_._1.name == "payload").map(_._2)
      assert(pStat.forall(_.distinctCount.isEmpty),
        s"undeclared string column must not claim an NDV: $pStat")
    } finally spark.conf.unset("spark.sql.cbo.enabled")
    // string-keyed join reorder: same shape as the integral test, now
    // powered by the sketch channel
    val a = freshDir(); val b = freshDir(); val c = freshDir()
    stageStr(a, 20000); stageStr(b, 5000); stageStr(c, 40)
    def joinPlan(): String = spark.sql(
      s"""SELECT * FROM graft.`$a` a
         |JOIN graft.`$b` b ON a.k = b.k
         |JOIN graft.`$c` c ON b.k = c.k""".stripMargin)
      .queryExecution.optimizedPlan.toString
    spark.conf.set("spark.sql.cbo.enabled", "false")
    val off = joinPlan()
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    val on =
      try joinPlan()
      finally {
        spark.conf.unset("spark.sql.cbo.enabled")
        spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
      }
    assert(on != off,
      "CBO with string-NDV stats must change the join plan")
    assert(off.indexOf(a) < off.indexOf(c), s"unexpected base:\n$off")
    assert(on.indexOf(a) > on.indexOf(c),
      s"expected the big table joined last under CBO:\n$on")
  }

  test("a 3-table join REORDERS with stats on (small table pulled " +
    "forward) and keeps the written order with stats off") {
    val a = freshDir(); val b = freshDir(); val c = freshDir()
    stage(a, 20000) // big
    stage(b, 5000)  // medium
    stage(c, 40)    // tiny
    def joinPlan(): String = {
      val df = spark.sql(
        s"""SELECT * FROM graft.`$a` a
           |JOIN graft.`$b` b ON a.k = b.k
           |JOIN graft.`$c` c ON b.k = c.k""".stripMargin)
      df.queryExecution.optimizedPlan.toString
    }
    spark.conf.set("spark.sql.cbo.enabled", "false")
    val off = joinPlan()
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    val on =
      try joinPlan()
      finally {
        spark.conf.unset("spark.sql.cbo.enabled")
        spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
      }
    assert(on != off, "CBO with column stats must change the join plan")
    // stats-off keeps the written order: (a JOIN b) JOIN c — a first;
    // the reordered plan pushes the BIG table out of the innermost
    // join (observed: (b JOIN c) JOIN a), so a's relation line moves
    // AFTER the tiny table's
    def firstIdx(plan: String, dir: String): Int = plan.indexOf(dir)
    assert(firstIdx(off, a) < firstIdx(off, c), s"unexpected base:\n$off")
    assert(firstIdx(on, a) > firstIdx(on, c),
      s"expected the big table joined last under CBO:\n$on")
  }
}
