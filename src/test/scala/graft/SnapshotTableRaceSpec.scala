package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sinks.SnapshotTable

/** Real-thread interleaving laws for the snapshot-table commit protocol.
  * [[SnapshotTableSpec]] proves each property on DETERMINISTIC schedules
  * (the interleave seam); this spec races N writer threads — appenders,
  * mergers, a compactor, a vacuum — against one table on a seeded random
  * schedule and asserts the protocol's global invariants:
  *
  *   - the version history is GAP-FREE (put-if-absent admits exactly one
  *     winner per version; losers retry at N+1, never skip);
  *   - every committed version's manifest references only files that
  *     exist on disk (no commit ever lands naming vanished data);
  *   - no LOST UPDATE: every append's rows and every merge's bump are in
  *     the final snapshot exactly once — a merge that could not rebase
  *     surfaced as ConcurrentModificationException and re-ran, it never
  *     silently dropped an interleaved commit;
  *   - a concurrent vacuum (default retention) reclaims nothing live.
  */
class SnapshotTableRaceSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("snaprace").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def df(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, s"r$i", i * 2.5)).toDF("id", "name", "v")

  test("racing appenders, mergers, compactor and vacuum keep every invariant") {
    val dir = freshDir()
    val seed = 20260815L
    SnapshotTable.commit(spark,
      df(0, 1000).repartitionByRange(8, col("id")), dir, "overwrite",
      statsCols = Seq("id"))

    val nAppenders = 4
    val appendsPer = 4
    val rowsPer = 20
    val cmeCount = new AtomicInteger(0)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(8)

    def submit(name: String)(body: java.util.Random => Unit): Unit = {
      val rnd = new java.util.Random(seed ^ name.hashCode.toLong)
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try body(rnd)
          catch { case t: Throwable => errors.add(t) }
        }
      })
    }

    // appenders: thread t appends its own disjoint key blocks >= 10000 —
    // provably outside every merger's envelope, so maintenance rebases
    // over them instead of re-running
    (0 until nAppenders).foreach { t =>
      submit(s"append-$t") { rnd =>
        (0 until appendsPer).foreach { j =>
          val base = 10000L * (t + 1) + j * 100L
          Thread.sleep(rnd.nextInt(30).toLong)
          SnapshotTable.commit(spark, df(base, base + rowsPer), dir,
            "append", statsCols = Seq("id"))
        }
      }
    }
    // mergers: bump v *10 on disjoint base slices; a merge losing to
    // another overwrite (merge/compact) throws CME and re-runs against
    // the fresh snapshot — the bump must still apply EXACTLY once
    (0 until 2).foreach { m =>
      submit(s"merge-$m") { rnd =>
        val lo = m * 100L
        val updates = df(lo, lo + 50).withColumn("v", col("v") * 10)
        var done = false
        var tries = 0
        while (!done && tries < 30) {
          tries += 1
          Thread.sleep(rnd.nextInt(40).toLong)
          try { SnapshotTable.merge(spark, dir, updates, "id"); done = true }
          catch {
            case _: java.util.ConcurrentModificationException =>
              cmeCount.incrementAndGet()
          }
        }
        assert(done, s"merger $m never landed in $tries tries")
      }
    }
    // compactor: two passes; rebases over appends, re-runs on merges
    submit("compact") { rnd =>
      (0 until 2).foreach { _ =>
        var done = false
        var tries = 0
        while (!done && tries < 30) {
          tries += 1
          Thread.sleep(rnd.nextInt(60).toLong)
          try { SnapshotTable.compact(spark, dir); done = true }
          catch {
            case _: java.util.ConcurrentModificationException =>
              cmeCount.incrementAndGet()
          }
        }
        assert(done, "compactor never landed")
      }
    }
    // vacuum under default retention: must reclaim nothing while writers
    // are staging (their unpublished batches look unreferenced)
    submit("vacuum") { rnd =>
      (0 until 3).foreach { _ =>
        Thread.sleep(rnd.nextInt(80).toLong)
        assert(SnapshotTable.vacuum(spark, dir).isEmpty)
      }
    }

    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(600, TimeUnit.SECONDS), "race timed out")
    assert(errors.isEmpty, s"writer died: ${errors.peek()}")

    // 1) gap-free history
    val vs = SnapshotTable.versions(spark, dir)
    assert(vs === (0L to vs.last), s"version gaps: $vs")
    // expected commit count: base + appends + merges + compactions all
    // landed exactly once (no version skipped, none double-published)
    assert(vs.size === 1 + nAppenders * appendsPer + 2 + 2)

    // 2) every version's manifest references only existing files
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    vs.foreach { v =>
      SnapshotTable.snapshotFiles(spark, dir, Some(v)).foreach { e =>
        assert(f.exists(new org.apache.hadoop.fs.Path(s"$dir/${e.path}")),
          s"v$v references missing file ${e.path}")
      }
    }

    // 3) no lost update, merges applied exactly once
    val after = SnapshotTable.read(spark, dir)
    val expectRows = 1000 + nAppenders * appendsPer * rowsPer
    assert(after.count() === expectRows)
    assert(SnapshotTable.rowCount(spark, dir) === expectRows)
    (0 until 2).foreach { m =>
      val lo = m * 100L
      val bumped = after.filter(col("id") >= lo && col("id") < lo + 50)
      assert(bumped.count() === 50)
      // v = id * 2.5 * 10 exactly — a double-applied merge would be *100
      assert(bumped.filter(col("v") =!= col("id") * 25.0).count() === 0,
        s"merger $m applied zero or multiple times")
    }
    // untouched base rows unchanged
    assert(after.filter(col("id") >= 200 && col("id") < 1000 &&
      col("v") =!= col("id") * 2.5).count() === 0)
    // appended rows all present exactly once
    assert(after.filter(col("id") >= 10000).select("id").distinct().count()
      === nAppenders.toLong * appendsPer * rowsPer)
  }

  /** Merge-on-read deleters racing appenders and a compactor. The
    * deleteByKeys publish is CONFLICT-FREE by design (it carries no
    * read state — "remove these keys from whatever precedes me"), so
    * the law is not rebase-vs-CME but the SEQUENCE RULE under real
    * interleaving: wherever the delete lands in the version order, a
    * keyed row from any EARLIER commit is gone and one from any LATER
    * commit survives — including across a racing compaction that
    * materializes the delete mid-flight. The expectation is
    * reconstructed from the LOG (the delete's landed version vs the
    * overlap append's), so the assertion is schedule-independent. */
  test("MOR deleters race appenders and a compactor: sequence rule " +
    "holds at whatever order the race produced") {
    val dir = freshDir()
    val seed = 20260817L
    SnapshotTable.commit(spark,
      df(0, 1000).repartitionByRange(8, col("id")), dir, "overwrite",
      statsCols = Seq("id"))

    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(8)
    def submit(name: String)(body: java.util.Random => Unit): Unit = {
      val rnd = new java.util.Random(seed ^ name.hashCode.toLong)
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try body(rnd)
          catch { case t: Throwable => errors.add(t) }
        }
      })
    }

    // plain appenders on disjoint high blocks
    (0 until 3).foreach { t =>
      submit(s"append-$t") { rnd =>
        (0 until 3).foreach { j =>
          val base = 10000L * (t + 1) + j * 100L
          Thread.sleep(rnd.nextInt(30).toLong)
          SnapshotTable.commit(spark, df(base, base + 20), dir, "append",
            statsCols = Seq("id"))
        }
      }
    }
    // the OVERLAP appender: re-appends ids 0..9 (inside the delete set),
    // txn-stamped so the landed version is recoverable from the log
    submit("overlap") { rnd =>
      Thread.sleep(rnd.nextInt(50).toLong)
      SnapshotTable.commit(spark,
        df(0, 10).withColumn("name", lit("readded")), dir, "append",
        statsCols = Seq("id"), txn = Some(("race-overlap", 1L)))
    }
    // two MOR deleters on different slices of the base data
    submit("mor-del-a") { rnd =>
      Thread.sleep(rnd.nextInt(50).toLong)
      SnapshotTable.deleteByKeys(spark, dir, "id",
        (0L until 50L).toDF("id"))
    }
    submit("mor-del-b") { rnd =>
      Thread.sleep(rnd.nextInt(50).toLong)
      SnapshotTable.deleteByKeys(spark, dir, "id",
        (100L until 120L).toDF("id"))
    }
    // a compactor pass mid-race: materializes whatever deletes it sees;
    // CME (a delete or append interleaved) -> re-run
    submit("compact") { rnd =>
      var done = false
      var tries = 0
      while (!done && tries < 30) {
        tries += 1
        Thread.sleep(rnd.nextInt(60).toLong)
        try { SnapshotTable.compact(spark, dir); done = true }
        catch { case _: java.util.ConcurrentModificationException => }
      }
      assert(done, "compactor never landed")
    }

    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(600, TimeUnit.SECONDS), "race timed out")
    assert(errors.isEmpty, s"writer died: ${errors.peek()}")

    val vs = SnapshotTable.versions(spark, dir)
    assert(vs === (0L to vs.last), s"version gaps: $vs")
    // recover the schedule the race actually produced
    val hist = SnapshotTable.history(spark, dir)
    val dels = hist.filter(_.action == "rowdelete").map(_.version)
    assert(dels.size === 2, s"expected 2 rowdelete commits, got $hist")
    // the two deletes are distinguishable by their key sets, not order;
    // recover which is which from the sidecar key count
    val byVersion = dels.map(v => v ->
      SnapshotTable.commitDeletes(spark, dir, v).map(_.rows).sum)
    val dvA = byVersion.collectFirst { case (v, n) if n == 50L => v }.get
    val va = hist.find(_.txnApp.contains("race-overlap")).get.version
    val after = SnapshotTable.read(spark, dir).cache()
    // ids 10..49 and 100..119 exist only in base data: always gone
    assert(after.filter(col("id").between(10, 49)).count() === 0)
    assert(after.filter(col("id").between(100, 119)).count() === 0)
    // ids 0..9: base copy always gone; the re-append survives iff it
    // landed AFTER the 50-key delete
    val n0to9 = after.filter(col("id") < 10).count()
    if (va > dvA) {
      assert(n0to9 === 10,
        s"overlap append v$va > delete v$dvA must survive")
      assert(after.filter(col("id") < 10 && col("name") =!= "readded")
        .count() === 0)
    } else assert(n0to9 === 0,
      s"overlap append v$va < delete v$dvA must be deleted")
    // everything else intact exactly once
    assert(after.filter(col("id").between(120, 999)).count() === 880)
    assert(after.filter(col("id") >= 10000).count() === 3L * 3 * 20)
    assert(SnapshotTable.rowCount(spark, dir) === after.count())
    after.unpersist()
  }

  /** SQL row-level DML racing appenders — the group-based COW commit
    * under real threads. Laws: (1) gap-free history with every
    * statement landing EXACTLY once; (2) a DML whose pushed bounds
    * provably clear an interleaved append REBASES over it (the appended
    * rows survive the DML's overwrite — no lost update); (3) a MERGE,
    * which can prove nothing (no pushable target bounds), surfaces CME
    * and re-runs rather than dropping an interleaved commit; (4) the
    * final content is the serial result regardless of interleaving. */
  test("SQL DELETE and MERGE race appenders: rebase when provable, " +
    "CME-and-rerun when not, never a lost update") {
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.SnapshotTableCatalog")
    val dir = freshDir()
    val seed = 20260816L
    SnapshotTable.commit(spark,
      df(0, 1000).repartitionByRange(8, col("id")), dir, "overwrite",
      statsCols = Seq("id"))

    val nAppenders = 3
    val appendsPer = 3
    val rowsPer = 20
    val cmeCount = new AtomicInteger(0)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(5)
    def submit(name: String)(body: java.util.Random => Unit): Unit = {
      val rnd = new java.util.Random(seed ^ name.hashCode.toLong)
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try body(rnd)
          catch { case t: Throwable => errors.add(t) }
        }
      })
    }
    def isCme(t: Throwable): Boolean = {
      var e = t
      while (e != null) {
        if (e.isInstanceOf[java.util.ConcurrentModificationException])
          return true
        e = e.getCause
      }
      false
    }
    def retrySql(rnd: java.util.Random, stmt: String): Unit = {
      var done = false
      var tries = 0
      while (!done && tries < 30) {
        tries += 1
        Thread.sleep(rnd.nextInt(40).toLong)
        try { spark.sql(stmt); done = true }
        catch {
          case t: Throwable if isCme(t) => cmeCount.incrementAndGet()
        }
      }
      assert(done, s"statement never landed in $tries tries: $stmt")
    }

    // appenders: disjoint key blocks >= 10000 with id stats — the
    // ranged DELETE must be able to PROVE disjointness and rebase
    (0 until nAppenders).foreach { t =>
      submit(s"append-$t") { rnd =>
        (0 until appendsPer).foreach { j =>
          val base = 10000L * (t + 1) + j * 100L
          Thread.sleep(rnd.nextInt(30).toLong)
          SnapshotTable.commit(spark, df(base, base + rowsPer), dir,
            "append", statsCols = Seq("id"))
        }
      }
    }
    // group-based ranged DELETE (the IS NOT NULL conjunct keeps it off
    // the metadata-only path): pushed id bounds are its rebase proof
    submit("sql-delete") { rnd =>
      retrySql(rnd, s"DELETE FROM graft.`$dir` " +
        "WHERE id >= 300 AND id < 350 AND name IS NOT NULL")
    }
    // SQL MERGE bumping a base slice: no pushable target bounds, so any
    // interleaving surfaces CME and the statement re-runs
    spark.range(0, 50).selectExpr("id", "concat('r', id) AS name",
      "cast(id AS double) * 25.0 AS v")
      .createOrReplaceTempView("race_sql_merge_src")
    submit("sql-merge") { rnd =>
      retrySql(rnd,
        s"""MERGE INTO graft.`$dir` t USING race_sql_merge_src s
           |ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin)
    }

    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(600, TimeUnit.SECONDS), "race timed out")
    assert(errors.isEmpty, s"writer died: ${errors.peek()}")

    // (1) gap-free, every statement exactly once
    val vs = SnapshotTable.versions(spark, dir)
    assert(vs === (0L to vs.last), s"version gaps: $vs")
    assert(vs.size === 1 + nAppenders * appendsPer + 1 + 1)

    // every version's manifest references only existing files (failed
    // DML attempts' staged files are unreferenced, never named)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    vs.foreach { v =>
      SnapshotTable.snapshotFiles(spark, dir, Some(v)).foreach { e =>
        assert(f.exists(new org.apache.hadoop.fs.Path(s"$dir/${e.path}")),
          s"v$v references missing file ${e.path}")
      }
    }

    // (4) serial result: base minus the deleted range, merge bump
    // applied exactly once, every appended row present exactly once
    val after = SnapshotTable.read(spark, dir)
    val expectRows = 1000 - 50 + nAppenders * appendsPer * rowsPer
    assert(after.count() === expectRows)
    assert(after.filter(col("id").between(300, 349)).count() === 0)
    val bumped = after.filter(col("id") < 50)
    assert(bumped.count() === 50)
    assert(bumped.filter(col("v") =!= col("id") * 25.0).count() === 0,
      "merge applied zero or multiple times")
    assert(after.filter(col("id") >= 10000).select("id").distinct()
      .count() === nAppenders.toLong * appendsPer * rowsPer)
    assert(after.filter(col("id") >= 50 && col("id") < 300 &&
      col("v") =!= col("id") * 2.5).count() === 0)
  }

  /** Expiry racing timestamp-travel readers — where the write-time
    * monotonized stamps and the collapse checkpoint earn their keep.
    * Laws: (1) a successful readAsOf returns EXACTLY the snapshot its
    * timestamp resolved to before any expiry ran — never a partial
    * snapshot, never a neighbor version's rows (no aliasing across the
    * expiry boundary); (2) a read that loses the race to expiry fails
    * LOUDLY (the version-gone require / a vanished log file), never
    * silently returns the oldest surviving snapshot; (3) plain latest
    * reads always see a whole committed snapshot; (4) after the race,
    * every surviving recorded timestamp still resolves exactly and every
    * expired one still refuses. */
  test("restore races appenders: version-pinned — wins only on an " +
    "untouched log, losses are loud, nothing is silently undone") {
    val dir = freshDir()
    SnapshotTable.commit(spark, df(0, 100), dir, "overwrite",
      statsCols = Seq("id"))

    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val cmes = new AtomicInteger(0)
    val wins = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(3)
    val seed = 20260815L

    def submit(name: String)(body: java.util.Random => Unit): Unit = {
      val rnd = new java.util.Random(seed ^ name.hashCode.toLong)
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try body(rnd)
          catch { case t: Throwable => errors.add(t) }
        }
      })
    }

    (0 until 2).foreach { a =>
      submit(s"append-$a") { rnd =>
        (1 to 5).foreach { k =>
          Thread.sleep(rnd.nextInt(40).toLong)
          SnapshotTable.commit(spark,
            df(10000L * (a * 10 + k), 10000L * (a * 10 + k) + 10), dir,
            "append", statsCols = Seq("id"))
        }
      }
    }
    submit("restore") { rnd =>
      (1 to 4).foreach { _ =>
        Thread.sleep(rnd.nextInt(50).toLong)
        try { SnapshotTable.restore(spark, dir, 0L); wins.incrementAndGet() }
        catch {
          case _: java.util.ConcurrentModificationException =>
            cmes.incrementAndGet() // loud loss — the operator re-decides
        }
      }
    }

    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(errors.isEmpty, s"unexpected: ${errors.peek()}")
    assert(wins.get() + cmes.get() === 4)

    // every commit is readable and accountable: restores read exactly
    // the v0 content; each append's version holds its predecessor + 10
    val vs = SnapshotTable.versions(spark, dir)
    assert(vs === vs.indices.map(_.toLong)) // gap-free
    var prev = -1L
    vs.foreach { v =>
      val c = SnapshotTable.read(spark, dir, Some(v)).count()
      val action = SnapshotTable.commitStats(spark, dir, v)._1
      if (action == "overwrite") assert(c === 100,
        s"restore commit v$v read $c rows, expected the v0 snapshot")
      else if (v > 0) assert(c === prev + 10,
        s"append v$v: $c rows, predecessor had $prev — a row went missing")
      prev = c
    }
    // the pin's guarantee, checked from the log itself: a successful
    // restore's predecessor version is the exact version it planned
    // against, so no append was silently swallowed by a racing restore
    // (an interleaved append forces CME by construction).
    assert(SnapshotTable.read(spark, dir).count() === prev)
  }

  test("expiry races timestamp readers: never partial, never aliased") {
    val dir = freshDir()
    val rowsPer = 10
    SnapshotTable.commit(spark, df(0, 100), dir, "overwrite",
      statsCols = Seq("id"))
    (1 to 12).foreach { k =>
      SnapshotTable.commit(spark, df(1000L * k, 1000L * k + rowsPer), dir,
        "append", statsCols = Seq("id"))
    }
    // the resolution table BEFORE any expiry: ts -> (version, rows).
    // Ties (several commits in one ms share a monotonized stamp) resolve
    // to the LATEST version at that stamp — the same rule versionAsOf
    // applies, so the expectation is computed with it too.
    val hist = SnapshotTable.history(spark, dir).reverse // oldest first
    val expect = hist.map { h =>
      val resolved = hist.filter(_.timestampMs <= h.timestampMs)
        .map(_.version).max
      (h.timestampMs, resolved, 100L + resolved * rowsPer)
    }.toVector
    // strictly separate the racing appends' stamps from the recorded ones
    Thread.sleep(15)

    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val loudLosses = new AtomicInteger(0)
    val okReads = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val pool = Executors.newFixedThreadPool(6)
    val seed = 20260815L

    def submit(name: String)(body: java.util.Random => Unit): Unit = {
      val rnd = new java.util.Random(seed ^ name.hashCode.toLong)
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try body(rnd)
          catch { case t: Throwable => errors.add(t) }
          finally stop.set(true) // first finisher winds the race down
        }
      })
    }

    // appender keeps the log moving (new versions, newer stamps)
    submit("append") { rnd =>
      (1 to 8).foreach { k =>
        Thread.sleep(rnd.nextInt(30).toLong)
        SnapshotTable.commit(spark, df(50000L * k, 50000L * k + rowsPer),
          dir, "append", statsCols = Seq("id"))
      }
    }
    // expirer shrinks history while readers resolve into it
    submit("expire") { rnd =>
      (0 until 4).foreach { i =>
        Thread.sleep(rnd.nextInt(60).toLong)
        // final keepLast=10 of the 21 total versions: recorded v11-v12
        // survive (exact-resolution branch) while v0-v10 expire
        // (loud-refusal branch) — both post-race laws get real cases
        SnapshotTable.expireVersions(spark, dir, keepLast = 16 - 2 * i)
      }
    }
    // timestamp readers: resolve recorded stamps mid-expiry
    (0 until 3).foreach { r =>
      submit(s"reader-$r") { rnd =>
        while (!stop.get()) {
          val (ts, expVer, expRows) = expect(rnd.nextInt(expect.size))
          try {
            val v = SnapshotTable.versionAsOf(spark, dir, ts)
            assert(v === expVer,
              s"ts $ts aliased: resolved v$v, recorded v$expVer")
            val n = SnapshotTable.read(spark, dir, Some(v)).count()
            assert(n === expRows, s"v$v partial: $n rows, expected $expRows")
            okReads.incrementAndGet()
          } catch {
            // losing to expiry must be LOUD: the version-gone require or
            // a log file vanishing mid-replay — never a wrong answer
            case _: IllegalArgumentException |
                 _: java.io.FileNotFoundException =>
              loudLosses.incrementAndGet()
          }
          // latest read: always a whole committed snapshot
          val latest = SnapshotTable.read(spark, dir).count()
          assert((latest - 100) % rowsPer === 0,
            s"latest read saw a partial snapshot: $latest rows")
        }
      }
    }

    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(600, TimeUnit.SECONDS), "race timed out")
    assert(errors.isEmpty, s"participant died: ${errors.peek()}")
    assert(okReads.get() > 0, "no timestamp read ever succeeded")

    // post-race determinism: surviving recorded stamps resolve exactly;
    // expired ones refuse rather than alias to the oldest survivor
    val surviving = SnapshotTable.versions(spark, dir).toSet
    expect.foreach { case (ts, expVer, expRows) =>
      if (surviving.contains(expVer)) {
        assert(SnapshotTable.versionAsOf(spark, dir, ts) === expVer)
        assert(SnapshotTable.readAsOf(spark, dir, ts).count() === expRows)
      } else {
        val thrown = intercept[Exception] {
          val v = SnapshotTable.versionAsOf(spark, dir, ts)
          SnapshotTable.read(spark, dir, Some(v)).count()
        }
        assert(thrown.isInstanceOf[IllegalArgumentException],
          s"expired ts $ts failed with ${thrown.getClass} instead of the " +
            "loud version-gone require")
      }
    }
  }
}
