package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType, StringType}
import org.apache.spark.sql.Row

import graft.sinks.OrcSink

/** Scale-layout capabilities: partition pruning, bucketed no-shuffle
  * joins, ORC schema evolution, and the as-of join composition. */
class ScaleLayoutSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("partitionBy layout prunes: filtered read plans PartitionFilters") {
    val dir = Files.createTempDirectory("partorc").toString
    val events = Tables.t(spark, sf, "events")
    val report = OrcSink.write(events, dir, "events", partitionBy = Seq("event_type"))
    assert(report.rows == events.count())
    val filtered = OrcSink.read(spark, s"$dir/events")
      .filter(col("event_type") === "click")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type"), plan.take(500))
    val expected = events.filter(col("event_type") === "click").count()
    assert(filtered.count() == expected)
  }

  test("bloom-filter layout skips row groups on point lookups where min/max can't") {
    val dir = Files.createTempDirectory("graft_bloom").toString
    // unique ids in SHUFFLED order: every file's [min,max] spans ~the
    // whole domain, so stripe stats alone skip nothing — only the bloom
    // can prove a row group can't contain the probe value
    val df = spark.range(20000)
      .select(col("id"), (col("id") % 7).as("payload"))
      .orderBy(xxhash64(col("id")))
    OrcSink.write(df, dir, "bloomed", maxRecordsPerFile = 1000L,
      bloomFilterColumns = Seq("id"))
    OrcSink.write(df, dir, "plain", maxRecordsPerFile = 1000L)

    def scannedRows(table: String): Long = {
      val q = OrcSink.read(spark, s"$dir/$table").filter(col("id") === 12345L)
      assert(q.collect().length == 1) // same answer either way
      val scan = q.queryExecution.executedPlan.collectLeaves().head
      scan.metrics("numOutputRows").value
    }
    val bloomed = scannedRows("bloomed")
    val plain = scannedRows("plain")
    assert(plain > 10000, s"expected near-full scan without blooms, got $plain")
    // expect ~1 true row group + fpp*20 false positives (a few thousand
    // rows at 1000-row files); far under the plain scan either way
    assert(bloomed <= 5000, s"expected bloom row-group skip, got $bloomed")
    assert(bloomed < plain / 2, s"bloom ($bloomed) should beat plain ($plain)")
  }

  test("sorted layout skips stripes: scan emits far fewer rows than unsorted") {
    val dir = Files.createTempDirectory("graft_sorted").toString
    // 20k rows over 200 keys, many small files -> many stripes; the
    // sorted layout gives each stripe a narrow key range
    val df = spark.range(20000)
      .select((col("id") % 200).as("k"), col("id").as("payload"))
    OrcSink.writeSorted(df, dir, "sorted", Seq("k"), maxRecordsPerFile = 1000L)
    OrcSink.write(df.repartition(20), dir, "unsorted", maxRecordsPerFile = 1000L)

    def scannedRows(table: String): Long = {
      val q = OrcSink.read(spark, s"$dir/$table").filter(col("k") === 7)
      assert(q.collect().length == 100) // same answer either way
      val scan = q.queryExecution.executedPlan.collectLeaves().head
      scan.metrics("numOutputRows").value
    }
    val sorted = scannedRows("sorted")
    val unsorted = scannedRows("unsorted")
    // unsorted: every stripe's [min,max] spans all keys -> nothing skips,
    // the reader surfaces ~all 20k rows for the Filter to discard.
    // sorted: only the stripe(s) containing k=7 are read.
    assert(unsorted > 10000, s"expected near-full scan on unsorted, got $unsorted")
    assert(sorted <= 2000, s"expected stripe-skip on sorted layout, got $sorted")
    val plan = OrcSink.read(spark, s"$dir/sorted").filter(col("k") === 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(k,7)"),
      s"filter not pushed to the ORC scan:\n$plan")
  }

  test("z-ordered layout stays selective on BOTH cluster columns; " +
    "single-key sort does not") {
    val dir = Files.createTempDirectory("graft_zorder").toString
    // a full 200x200 grid: x cycles fast, y slow — genuinely independent
    // dimensions (a multiplicative mix of id would make y a function of x)
    val df = spark.range(40000)
      .select((col("id") % 200).as("x"),
        (col("id") / 200).cast("long").as("y"), col("id").as("payload"))
    OrcSink.writeZOrdered(df, dir, "zed", Seq("x", "y"),
      maxRecordsPerFile = 1000L)
    OrcSink.writeSorted(df, dir, "xsorted", Seq("x"), maxRecordsPerFile = 1000L)

    def avgFileSpan(table: String, c: String): Double =
      OrcSink.read(spark, s"$dir/$table")
        .select(input_file_name().as("f"), col(c))
        .groupBy(col("f")).agg((max(col(c)) - min(col(c))).as("span"))
        .agg(avg(col("span"))).head().getDouble(0)

    // z-order: every file covers a narrow hyper-rectangle — BOTH columns'
    // per-file spans sit well under the 199 global span
    assert(avgFileSpan("zed", "x") < 120, s"x span ${avgFileSpan("zed", "x")}")
    assert(avgFileSpan("zed", "y") < 120, s"y span ${avgFileSpan("zed", "y")}")
    // single-key sort: the secondary column spans ~the whole domain in
    // every file, so nothing can skip for y predicates
    assert(avgFileSpan("xsorted", "y") > 180,
      s"y span ${avgFileSpan("xsorted", "y")}")

    // stripe-skip on the SECONDARY dimension: a y filter reads far fewer
    // rows from the z layout than from the x-sorted one
    def scannedRows(table: String): Long = {
      val q = OrcSink.read(spark, s"$dir/$table").filter(col("y") === 7)
      assert(q.collect().length == 200)
      q.queryExecution.executedPlan.collectLeaves().head
        .metrics("numOutputRows").value
    }
    val zScan = scannedRows("zed")
    val sortedScan = scannedRows("xsorted")
    assert(sortedScan > 30000, s"x-sorted should scan ~everything for y, got $sortedScan")
    assert(zScan < 24000, s"z layout should skip for y, got $zScan")
    assert(zScan * 2 < sortedScan, s"z=$zScan vs sorted=$sortedScan")
  }

  test("bucketed tables join without a shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      OrcSink.writeBucketed(
        Tables.t(spark, sf, "lineitem").select("l_orderkey", "l_quantity"),
        "li_bucketed", Seq("l_orderkey"), 8)
      OrcSink.writeBucketed(
        Tables.t(spark, sf, "orders").select("o_orderkey", "o_totalprice"),
        "ord_bucketed", Seq("o_orderkey"), 8)
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(800)}")
      assert(joined.count() ==
        Tables.t(spark, sf, "lineitem").join(Tables.t(spark, sf, "orders"),
          col("l_orderkey") === col("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("plan contracts: chunker shuffles zero times; candidates joins stay equi") {
    // TextChunker must be a pure map: NO Exchange anywhere in its plan
    val docs = Tables.t(spark, sf, "documents")
    val chunkPlan = graft.operators.TextChunker
      .chunk(docs, "doc_id", "text", 64, 16)
      .queryExecution.executedPlan.toString
    assert(!chunkPlan.contains("Exchange"),
      s"chunking must not shuffle:\n${chunkPlan.take(600)}")

    // candidate-generation joins must never degrade to nested loops
    for ((name, plan) <- Seq(
      "ngramCandidates" -> graft.operators.Dedup
        .ngramCandidates(docs, "doc_id", "text", 5, 0.5)
        .queryExecution.executedPlan.toString,
      "lshNearDupPairs" -> graft.operators.Similarity
        .lshNearDupPairs(Tables.t(spark, sf, "embeddings"), "vec_id", "embedding", 0.9)
        .queryExecution.executedPlan.toString)) {
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"$name degraded to a nested loop:\n${plan.take(600)}")
    }

    // sessionization: exactly one hash exchange (the user_id partitioning
    // both windows and the session aggregate reuse)
    val sessPlan = graft.operators.Sessionize
      .assign(Tables.t(spark, sf, "events").select(col("user_id"), col("ts")),
        "user_id", "ts", 30)
      .queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(sessPlan).length
    assert(nExchanges == 1,
      s"sessionize should shuffle once on the key, found $nExchanges:\n${sessPlan.take(600)}")
  }

  test("plan contracts: tf-idf prunes top-k map-side; split is scan-fused") {
    // tf-idf must plan a WindowGroupLimit BELOW the window exchange (map-side
    // per-doc top-k pruning) and broadcast the doc-frequency side
    val tfidfPlan = SparkEntry.queries("text_tfidf_top")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(tfidfPlan.contains("WindowGroupLimit"),
      s"tf-idf should prune top-k before the window exchange:\n${tfidfPlan.take(600)}")
    assert(tfidfPlan.contains("BroadcastHashJoin"),
      s"doc-frequency side should broadcast:\n${tfidfPlan.take(600)}")

    // split assignment must be a pure per-row expression: no Exchange until
    // the caller aggregates
    val splitPlan = graft.operators.Sampling
      .trainValTestSplit(Tables.t(spark, sf, "documents"), col("text"), 0.8, 0.1)
      .queryExecution.executedPlan.toString
    assert(!splitPlan.contains("Exchange"),
      s"split must not shuffle:\n${splitPlan.take(600)}")
  }

  test("Sessionize rejects inputs that already carry session_idx") {
    val in = Tables.t(spark, sf, "events")
      .select(col("user_id"), col("ts"), lit(9L).as("session_idx"))
    val e = intercept[IllegalArgumentException] {
      graft.operators.Sessionize.assign(in, "user_id", "ts", 30)
    }
    assert(e.getMessage.contains("session_idx"))
  }

  test("ORC schema evolution: appended files with new columns merge") {
    val dir = Files.createTempDirectory("evolve").toString
    val v1 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "a"), Row(2L, "b"))),
      StructType(Seq(StructField("id", LongType), StructField("s", StringType))))
    OrcSink.write(v1, dir, "t")
    val v2 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(3L, "c", 30L))),
      StructType(Seq(StructField("id", LongType), StructField("s", StringType),
        StructField("extra", LongType))))
    OrcSink.write(v2, dir, "t", mode = "append")
    val merged = OrcSink.readMerged(spark, s"$dir/t")
    assert(merged.columns.toSet == Set("id", "s", "extra"))
    val byId = merged.collect().map(r => r.getLong(0) ->
      Option(r.get(r.fieldIndex("extra")))).toMap
    assert(byId(1L).isEmpty && byId(3L).contains(30L))
  }

  test("as-of join: genuinely NULL right-side values are matches, not skipped") {
    val left = Seq((1L, 30L, 200L)).toDF("k", "t", "lid")
    val right = Seq((1L, 10L, Some("early")), (1L, 20L, Option.empty[String]))
      .toDF("k", "rt", "v")
    val got = graft.operators.AsOfJoin.lastValueAsOf(
        left, right, "k", "t", "rt", "v", "asof_v")
      .collect()(0)
    // latest right row (t=20) has v=NULL; ASOF semantics return that NULL,
    // not the older 'early'
    assert(got.isNullAt(got.fieldIndex("asof_v")), got.toString)
  }

  test("simhash blocking is complete when blocks > maxDistance") {
    // two signatures differing by exactly 1 bit in each 16-bit quarter
    // (hamming 4) defeat 4-block blocking but not 16-block blocking
    import graft.operators.Dedup
    val base = "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp"
    val df = Seq((1L, base), (2L, base)).toDF("id", "text")
    val pairs16 = Dedup.simhashPairs(df, "id", "text", maxDistance = 15, blocks = 16)
      .collect()
    assert(pairs16.length == 1 && pairs16(0).getAs[Int]("hamming") == 0)
  }

  test("as-of join matches a per-row reference computation") {
    val left = Seq((1L, 10L, 100L), (1L, 25L, 101L), (2L, 5L, 102L), (3L, 50L, 103L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 10L, "r@10"), (1L, 20L, "r@20"), (2L, 6L, "r@6"))
      .toDF("k", "rt", "v")
    val got = graft.operators.AsOfJoin.lastValueAsOf(
        left, right, "k", "t", "rt", "v", "asof_v")
      .collect().map(r => r.getAs[Long]("lid") -> Option(r.getAs[String]("asof_v"))).toMap
    assert(got(100L).contains("r@10")) // inclusive at equal time
    assert(got(101L).contains("r@20"))
    assert(got(102L).isEmpty)         // right row is later than left
    assert(got(103L).isEmpty)         // key with no right rows
  }
}
