package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.Tables.dsumr

/** Encoder row types for the stateful session operator (top-level public:
  * Catalyst's generated deserializers cannot touch private nested types). */
final case class SessEvent(user_id: Long, ts_us: Long)
final case class SessCount(user_id: Long, n_sessions: Long)
final case class FunnelEvent(user_id: Long, event_type: String, ts_us: Long)
final case class EwmaEvent(user_id: Long, us: Long, event_id: Long, value: Double)
final case class EwmaState(user_id: Long, n: Long, ewma_last: Double)
final case class FunnelState(user_id: Long, t_signup: Long, t_view: Long,
                             t_click: Long, t_purchase: Long)

/** Structured Streaming surface over the events table.
  *
  * The reference is batch-only (SURVEY.md §2.4: no streaming anywhere; its
  * README's "streaming reads" claim is chunked-batch at best), so this is
  * beyond-reference capability built the Spark-native way: `readStream` →
  * event-time window aggregation with a watermark, and
  * `flatMapGroupsWithState` for custom session state.
  *
  * Local smoke uses the parquet fixture as a file-source stream with a
  * memory sink and `processAllAvailable()` — the identical plan runs
  * against a real source (Kafka/files) on a cluster, where the watermark
  * bounds state and late data. The correctness gate compares streaming
  * output against the batch SQL oracle: the streaming answer must equal
  * the batch answer on the same data (the exactly-once contract).
  */
object EventStream {

  /** events.parquet schema as the reader surfaces it for THIS fixture
    * generation — the `ts` encoding has drifted across driver fixture
    * regenerations (INT64 nanos vs TIMESTAMP_NTZ micros), so the stream's
    * required upfront schema is taken from a batch footer read of the
    * actual file rather than hardcoded, and the same
    * [[graft.Tables.normalizeEventTs]] branch the batch path uses
    * normalizes `ts` to TimestampType afterwards. */
  def rawSchema(spark: SparkSession, sfDir: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet").schema
  }

  /** Serializes the fixture staging copy and memoizes staged keys: several
    * streaming queries may initialize concurrently (parallel Verify) and
    * they share the target. */
  private val stageLock = new Object
  private val staged = scala.collection.mutable.Set.empty[String]

  /** Cloned session (shared SparkContext, isolated SQLConf) with shuffle
    * partitions sized to the test corpus, for the STATEFUL harnesses:
    * every stateful operator instantiates one state store per shuffle
    * partition per micro-batch, so 32 partitions over a 100k-row fixture
    * is mostly fixed store/checkpoint overhead (measured on the outer
    * join: 9.1 s -> 4.3 s warm at 4 partitions). Hash-partitioned
    * semantics are identical at any partition count; a production
    * deployment sizes this to key cardinality. Cloning also isolates the
    * memory-sink catalog per query under parallel Verify. */
  private def tunedSession(spark: SparkSession): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // newSession() does NOT inherit runtime conf — carry the micro-batch
    // sizing knob over so StreamBatchingSpec's multi-batch contracts
    // still drive real multi-batch runs through the clone
    spark.conf.getOption("graft.stream.maxFilesPerTrigger")
      .foreach(v => s.conf.set("graft.stream.maxFilesPerTrigger", v))
    s
  }

  private def readEventStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The streaming file source requires a directory (it monitors for new
    // files); the fixture is a single parquet file, so stage it into a
    // scratch dir — on a cluster this would be the landing directory a
    // producer appends to.
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = java.nio.file.Paths.get(s"/tmp/graft_stream/$key/events")
    stageLock.synchronized {
      // staged once per (key, JVM): the first touch in each JVM refreshes
      // (a stale fixture from a killed process self-heals), and later
      // queries in the same JVM never re-copy while sibling streams are
      // already reading the directory. The temp name is dot-prefixed so a
      // concurrently LISTING file source ignores it (hidden-file rule),
      // and the ATOMIC_MOVE means readers see the old or new file, never
      // a partial one.
      if (!staged.contains(key)) {
        java.nio.file.Files.createDirectories(dir)
        val srcPath = java.nio.file.Paths.get(s"$sfDir/events.parquet")
        // multi-file fixtures (events.parquet as a DIRECTORY of parts)
        // stage each data file under a name-ordered alias, so a
        // maxFilesPerTrigger-batched stream consumes them in the
        // producer's time order — the multi-micro-batch test/deployment
        // shape; the driver fixture is a single file and stages as one.
        val parts: Seq[java.nio.file.Path] =
          if (java.nio.file.Files.isDirectory(srcPath)) {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.list(srcPath).iterator().asScala.toSeq
              .filter(_.getFileName.toString.endsWith(".parquet"))
              .sortBy(_.getFileName.toString)
          } else Seq(srcPath)
        parts.zipWithIndex.foreach { case (pth, i) =>
          val name = if (parts.length == 1) "events.parquet"
            else f"events-$i%05d.parquet"
          val tmp = dir.resolve(s".$name.tmp-${java.util.UUID.randomUUID()}")
          java.nio.file.Files.copy(pth, tmp)
          val dst = dir.resolve(name)
          java.nio.file.Files.move(tmp, dst,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          // the file source orders files by MODIFICATION TIME, and fast
          // staging gives all parts the same mtime — pin strictly
          // increasing mtimes in name order so batched consumption
          // follows the producer's time order deterministically
          java.nio.file.Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
        }
        staged += key
      }
    }
    // Optional micro-batch sizing knob (ops/tests): with N staged files
    // and maxFilesPerTrigger=1, the stream runs N real micro-batches —
    // StreamBatchingSpec proves the stateful operators' cross-batch
    // contracts on genuinely multi-batch runs.
    val reader = spark.readStream.schema(rawSchema(spark, sfDir))
    val withTrigger = spark.conf.getOption("graft.stream.maxFilesPerTrigger")
      .foldLeft(reader)((r, v) => r.option("maxFilesPerTrigger", v))
    graft.Tables.normalizeEventTs(withTrigger.parquet(dir.toString))
  }

  /** Tumbling 1-hour windowed aggregation with a 1-hour watermark, run to
    * completion on the fixture. Returns the final (hour, event_type, n,
    * sum_value) table — equal to the batch date_trunc aggregation. */
  def hourlyAgg(sparkIn: SparkSession, sfDir: String): DataFrame = {
    val spark = tunedSession(sparkIn)
    val agg = readEventStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsumr(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))
    runToMemory(spark, agg, "graft_stream_hourly", OutputMode.Complete())
  }

  /** Sliding-window aggregation: 1-hour windows every 30 minutes (each
    * event lands in exactly 2 windows). Same drive-to-completion contract
    * as [[hourlyAgg]]. */
  def slidingAgg(sparkIn: SparkSession, sfDir: String): DataFrame = {
    val spark = tunedSession(sparkIn)
    val agg = readEventStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsumr(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
    runToMemory(spark, agg, "graft_stream_sliding", OutputMode.Complete())
  }

  /** Tumbling-window streaming QUANTILES — the monitoring shape (per-
    * window latency/size percentiles) as a streaming aggregation: the
    * mergeable approx_percentile sketch accumulates inside the window
    * state, so per-window memory is O(sketch) no matter the event rate,
    * and sketches merge across micro-batches exactly like count/sum.
    * Returns (hour, aq[2] = approx p50/p95, n); the gate joins exact
    * batch percentiles and pins tolerance verdicts (the q29 pattern). */
  def hourlyQuantiles(sparkIn: SparkSession, sfDir: String): DataFrame = {
    val spark = tunedSession(sparkIn)
    val agg = readEventStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(expr("approx_percentile(value, array(0.5, 0.95), 10000)").as("aq"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("aq"), col("n"))
    runToMemory(spark, agg, "graft_stream_quantiles", OutputMode.Complete())
  }

  /** Per-window approximate distinct users INSIDE the streaming
    * aggregation: exact distinct is unsupported (and unboundedly
    * stateful) in streaming, but `approx_count_distinct`'s HLL++
    * partials merge across micro-batches exactly like count/sum, so
    * per-window state stays O(sketch) at any event rate — the streaming
    * face of the profiler's cardinality story. rsd 0.02 for the same
    * 2.5-sigma headroom the profile gates carry. Returns
    * (hour, n_users_est, n); the gate joins batch-exact distincts and
    * pins the tolerance verdict. */
  def hourlyDistinct(sparkIn: SparkSession, sfDir: String): DataFrame = {
    val spark = tunedSession(sparkIn)
    val agg = readEventStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n_users_est"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("n_users_est"), col("n"))
    runToMemory(spark, agg, "graft_stream_distinct", OutputMode.Complete())
  }

  /** Sessionization via the BUILT-IN `session_window` aggregation — the
    * third implementation of the same semantics (batch gaps-and-islands
    * in [[graft.operators.Sessionize]], custom state in
    * [[sessionCounts]]): Spark merges session windows as events arrive,
    * so per-user state is one (start, end, count) per OPEN session
    * regardless of event rate. Session windows only support APPEND mode
    * — a session emits when the watermark passes it — so the staging
    * copy carries one far-future SENTINEL event for a dummy user (-1,
    * filtered out downstream): it advances the watermark past every
    * real session, and the no-data finalization batch flushes them all.
    * This is exactly how an endless deployment drains on decommission.
    * Returns (user_id, s_start, n_events) — one row per closed session,
    * sentinel excluded. */
  def sessionWindowCounts(sparkIn: SparkSession, sfDir: String,
                          gap: String = "30 minutes"): DataFrame = {
    val spark = tunedSession(sparkIn)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = java.nio.file.Paths.get(s"/tmp/graft_stream/$key/events_swin")
    stageLock.synchronized {
      val k2 = key + "/swin"
      if (!staged.contains(k2)) {
        java.nio.file.Files.createDirectories(dir)
        val srcPath = java.nio.file.Paths.get(s"$sfDir/events.parquet")
        val tmp = dir.resolve(s".ev.tmp-${java.util.UUID.randomUUID()}")
        java.nio.file.Files.copy(srcPath, tmp)
        java.nio.file.Files.move(tmp, dir.resolve("events.parquet"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        // TWO sentinel files (30 and 60 days past max), consumed one per
        // micro-batch below: emission uses the watermark computed at the
        // END of the PREVIOUS batch, and the final watermark-only flush
        // is a no-data batch that processAllAvailable does not wait for
        // — so the second sentinel's DATA batch (which processAllAvailable
        // does cover) runs with a watermark already 30 days past every
        // real session and deterministically flushes them all.
        val raw = spark.read.parquet(s"$sfDir/events.parquet")
        java.nio.file.Files.setLastModifiedTime(dir.resolve("events.parquet"),
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L))
        Seq(30L, 60L).zipWithIndex.foreach { case (days, i) =>
          val bumped = raw.schema("ts").dataType match {
            case org.apache.spark.sql.types.LongType =>
              col("ts") + lit(days * 24 * 3600 * 1000000000L) // nanos
            case _ => col("ts") + expr(s"interval $days days")
          }
          val sentStage = dir.resolve(s".sent-${java.util.UUID.randomUUID()}")
          raw.orderBy(col("ts").desc).limit(1)
            .withColumn("event_id", lit(-1L - i))
            .withColumn("user_id", lit(-1L - i))
            .withColumn("ts", bumped)
            .coalesce(1).write.mode("overwrite").parquet(sentStage.toString)
          val part = sentStage.toFile.listFiles()
            .find(_.getName.endsWith(".parquet")).get
          val dst = dir.resolve(s"events-sentinel-$i.parquet")
          java.nio.file.Files.move(part.toPath, dst,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          java.nio.file.Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(1000000000000L + (i + 1) * 60000L))
          org.apache.commons.io.FileUtils.deleteDirectory(sentStage.toFile)
        }
        staged += k2
      }
    }
    val stream = graft.Tables.normalizeEventTs(
      spark.readStream.schema(rawSchema(spark, sfDir))
        .option("maxFilesPerTrigger", "1").parquet(dir.toString))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("n_events"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("graft_stream_swin").start()
    try {
      q.processAllAvailable()
      // The last flush is a NO-DATA batch processAllAvailable does not
      // await. The FIRST sentinel's own session provably closes only
      // after every real session (its end is 30 days later), so poll
      // until it lands in the sink — bounded, deterministic.
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (spark.table("graft_stream_swin")
               .filter(col("user_id") === -1L).isEmpty &&
             System.nanoTime() < deadline) {
        Thread.sleep(100)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table("graft_stream_swin").filter(col("user_id") >= 0)
  }

  /** Per-user session counting (30-min inactivity gap) via
    * flatMapGroupsWithState — the custom-state streaming primitive. State
    * carries (last event time, session count) across micro-batches; events
    * within a batch are sorted in the state function (arrival order within
    * a group is unordered). */
  def sessionCounts(sparkIn: SparkSession, sfDir: String,
                    gapMinutes: Long = 30): DataFrame = {
    val spark = tunedSession(sparkIn)
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def fn(userId: Long, events: Iterator[SessEvent],
           state: GroupState[(Long, Long)]): Iterator[SessCount] = {
      val sorted = events.map(_.ts_us).toArray.sorted
      var (lastTs, sessions) = state.getOption.getOrElse((Long.MinValue, 0L))
      sorted.foreach { t =>
        if (lastTs == Long.MinValue || t - lastTs > gapUs) sessions += 1
        lastTs = t
      }
      state.update((lastTs, sessions))
      Iterator.single(SessCount(userId, sessions))
    }

    val events = readEventStream(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[SessEvent]
    val out = events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(fn)
    runToMemory(spark, out.toDF(), "graft_stream_sessions", OutputMode.Update())
  }

  /** Streaming funnel tracking via flatMapGroupsWithState: per-user
    * FIRST-TOUCH timestamps of each funnel step (signup/view/click/
    * purchase) held in state — four longs per user (Long.MaxValue =
    * unseen), min-merged on every arrival, so state is O(1) per user at
    * any event rate and the merge commutes across arrival order and
    * micro-batch boundaries. Emits the current state per updated user;
    * because mins only ever DECREASE, the final state is the column-wise
    * min over all emitted rows — which is how the gate reduces the
    * Update-mode memory sink (funnel DEPTH itself is not monotone under
    * late earlier events, so the state, not the depth, is what streams).
    */
  def funnelState(sparkIn: SparkSession, sfDir: String): DataFrame = {
    val spark = tunedSession(sparkIn)
    import spark.implicits._
    val none = Long.MaxValue
    def fn(userId: Long, events: Iterator[FunnelEvent],
           state: GroupState[(Long, Long, Long, Long)]): Iterator[FunnelState] = {
      var (s0, v0, c0, p0) = state.getOption.getOrElse((none, none, none, none))
      events.foreach { e =>
        e.event_type match {
          case "signup"   => s0 = math.min(s0, e.ts_us)
          case "view"     => v0 = math.min(v0, e.ts_us)
          case "click"    => c0 = math.min(c0, e.ts_us)
          case "purchase" => p0 = math.min(p0, e.ts_us)
          case _          => ()
        }
      }
      state.update((s0, v0, c0, p0))
      Iterator.single(FunnelState(userId, s0, v0, c0, p0))
    }
    val ev = readEventStream(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .as[FunnelEvent]
    val out = ev.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(fn)
    runToMemory(spark, out.toDF(), "graft_stream_funnel", OutputMode.Update())
  }

  /** Streaming per-user EWMA via flatMapGroupsWithState: state carries
    * (count, smoothed value); each micro-batch's arrivals sort by
    * (ts, event_id) inside the state function and fold in order — the
    * [[sessionCounts]] ordering contract: event-time order ACROSS
    * micro-batches follows from the source's file order (the staged
    * fixture lands as one file; a production ingest keys landing files
    * by time). Emits the running (user_id, n, ewma) on every update;
    * n is strictly increasing, so the final state per user is the
    * max-n row of the Update-mode sink. */
  def ewmaState(sparkIn: SparkSession, sfDir: String,
                alpha: Double = 0.2): DataFrame = {
    val spark = tunedSession(sparkIn)
    import spark.implicits._
    def fn(k: Long, it: Iterator[EwmaEvent],
           state: GroupState[(Long, Double, Boolean)]): Iterator[EwmaState] = {
      val rows = it.toArray.sortBy(e => (e.us, e.event_id))
      var (n, s, init) = state.getOption.getOrElse((0L, 0.0, false))
      rows.foreach { e =>
        s = if (!init) { init = true; e.value }
          else alpha * e.value + (1 - alpha) * s
        n += 1
      }
      state.update((n, s, init))
      Iterator.single(EwmaState(k, n, s))
    }
    val ev = readEventStream(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .as[EwmaEvent]
    val out = ev.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(fn)
    runToMemory(spark, out.toDF(), "graft_stream_ewma", OutputMode.Update())
  }

  /** Streaming exact deduplication: `dropDuplicates` keeps per-key state
    * across micro-batches and emits only each key's first occurrence.
    * Selecting only the key columns makes the output the distinct key set
    * — deterministic regardless of arrival order, so the batch DISTINCT
    * oracle applies (exactly-once contract). State grows with distinct
    * keys BY DESIGN for global dedup; [[dedupWithinWatermark]] is the
    * bounded-state variant for endless streams. */
  def dedupPairs(sparkIn: SparkSession, sfDir: String): DataFrame = {
    val spark = tunedSession(sparkIn)
    val out = readEventStream(spark, sfDir)
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
    runToMemory(spark, out, "graft_stream_dedup", OutputMode.Append())
  }

  /** LATENESS semantics, measured and pinned. Staged stream,
    * mtime-ordered with maxFilesPerTrigger=1:
    *
    *   batch 1  the real corpus           -> watermark rises to max-1h
    *   batch 2  a LATE file: the event_id % 20 == 0 rows shifted 10 days
    *            earlier with values bumped +10000 (deterministic set, so
    *            the oracle can replay it; the poison makes any
    *            aggregation-path change a sum mismatch, not just rows)
    *   batch 3+ two far-future sentinels (+30d/+60d, event_type
    *            'sentinel'): Append emission uses the watermark computed
    *            at the END of the previous batch, so the second
    *            sentinel's batch flushes every real window and the first
    *            sentinel's own row is the polled everything-flushed
    *            signal (the clickErrorOuterJoin discipline)
    *
    * MEASURED Spark semantics this pins (probed on 4.1: batch 2 ran
    * with watermark 2024-01-30T22:57 and its 2023-12-xx rows still
    * aggregated): watermark late-dropping for aggregations is
    * BEST-EFFORT — the guarantee is only that data LESS delayed than
    * the threshold is never dropped; data far beyond it "may or may not
    * be aggregated" (here: its state was never created, so the rows
    * build fresh groups and emit at the next watermark advance). The
    * gate's oracle is therefore the batch aggregation over on-time
    * UNION late rows — and [[lateDataAggFenced]] is the production
    * pattern for pipelines that NEED the hard drop. */
  def lateDataAgg(sparkIn: SparkSession, sfDir: String): DataFrame =
    lateAggImpl(sparkIn, sfDir, fenced = false)

  /** The deterministic-lateness production pattern: an EXPLICIT
    * admission fence at ingest (the loaded partition's lower bound)
    * ahead of the watermark/aggregation, giving the hard guarantee
    * best-effort watermark semantics do not ([[lateDataAgg]]) — scoped
    * honestly: rows BELOW the bound (stale duplicates of an earlier
    * partition) drop deterministically, in-bound late arrivals are
    * legitimate data and admit. The gate's oracle replays exactly that
    * split. */
  def lateDataAggFenced(sparkIn: SparkSession, sfDir: String): DataFrame =
    lateAggImpl(sparkIn, sfDir, fenced = true)

  private def lateAggImpl(sparkIn: SparkSession, sfDir: String,
                          fenced: Boolean): DataFrame = {
    val spark = tunedSession(sparkIn)
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = java.nio.file.Paths.get(s"/tmp/graft_stream/$key/events_late")
    stageLock.synchronized {
      val k2 = key + "/late"
      if (!staged.contains(k2)) {
        java.nio.file.Files.createDirectories(dir)
        val srcPath = java.nio.file.Paths.get(s"$sfDir/events.parquet")
        val tmp0 = dir.resolve(s".ev.tmp-${java.util.UUID.randomUUID()}")
        java.nio.file.Files.copy(srcPath, tmp0)
        java.nio.file.Files.move(tmp0, dir.resolve("events.parquet"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        java.nio.file.Files.setLastModifiedTime(dir.resolve("events.parquet"),
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L))
        val raw = spark.read.parquet(s"$sfDir/events.parquet")
        def bump(days: Long) = raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            col("ts") + lit(days * 24 * 3600 * 1000000000L) // nanos
          case _ => col("ts") + expr(s"interval $days days")
        }
        def stagePart(df: org.apache.spark.sql.DataFrame, name: String,
                      mtimeOff: Long): Unit = {
          val st = dir.resolve(s".st-${java.util.UUID.randomUUID()}")
          df.coalesce(1).write.mode("overwrite").parquet(st.toString)
          val part = st.toFile.listFiles()
            .find(_.getName.endsWith(".parquet")).get
          val dst = dir.resolve(name)
          java.nio.file.Files.move(part.toPath, dst,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          java.nio.file.Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(1000000000000L + mtimeOff))
          org.apache.commons.io.FileUtils.deleteDirectory(st.toFile)
        }
        // late rows: a DETERMINISTIC subset (event_id % 20) shifted 10
        // days earlier, values bumped +10000 — oracle-replayable
        stagePart(raw.filter(col("event_id") % 20 === 0)
          .withColumn("ts", bump(-10))
          .withColumn("value", col("value") + lit(10000.0)),
          "events-late.parquet", 60000L)
        Seq(30L, 60L).zipWithIndex.foreach { case (days, i) =>
          stagePart(raw.orderBy(col("ts").desc).limit(1)
            .withColumn("ts", bump(days))
            .withColumn("event_type", lit("sentinel"))
            .withColumn("event_id", lit(-1L - i))
            .withColumn("user_id", lit(-1L - i)),
            s"events-sentinel-$i.parquet", 120000L + i * 60000L)
        }
        staged += k2
      }
    }
    val stream0 = graft.Tables.normalizeEventTs(
      spark.readStream.schema(rawSchema(spark, sfDir))
        .option("maxFilesPerTrigger", "1").parquet(dir.toString))
    val stream =
      if (!fenced) stream0
      else {
        // the admission fence: the loaded partition's lower bound, read
        // once from the batch fixture (a static scan-fused filter — the
        // deterministic lateness policy)
        val minTs = graft.Tables.t(spark, sfDir, "events")
          .agg(min(col("ts"))).head().getTimestamp(0)
        stream0.filter(col("ts") >= lit(minTs))
      }
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsumr(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))
    val sink = if (fenced) "graft_stream_late_fenced" else "graft_stream_late"
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(sink).start()
    try {
      q.processAllAvailable()
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (spark.table(sink)
               .filter(col("event_type") === "sentinel").isEmpty &&
             System.nanoTime() < deadline) {
        Thread.sleep(100)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(sink).filter(col("event_type") =!= "sentinel")
  }

  /** Stream-STATIC dimension enrichment — the most common production
    * streaming join (events enriched with a slowly-changing dimension
    * snapshot): the static side broadcasts once and every micro-batch
    * joins stateLESSly against it (no watermark, no state store — the
    * join is a map-side hash probe per batch), feeding a running
    * aggregate. Exactly-once contract = the batch join+agg over the
    * same data. */
  def staticEnrichAgg(sparkIn: SparkSession, sfDir: String): DataFrame = {
    val spark = tunedSession(sparkIn)
    val dim = graft.Tables.t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val out = readEventStream(spark, sfDir)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), dsumr(col("value")).as("sum_value"))
    runToMemory(spark, out, "graft_stream_enrich", OutputMode.Complete())
  }

  /** Streaming URL-level dedup — the ingest-time form of the batch
    * url-curation stage: each arriving event derives its messy URL,
    * canonicalizes IN-STREAM (the codegen'd UrlCuration chain fuses
    * into the micro-batch scan), and `dropDuplicates` on the canonical
    * spelling admits each true URL once no matter how many messy
    * variants arrive. Emitting only the key column makes the output the
    * distinct canonical set — deterministic regardless of arrival order,
    * so the batch DISTINCT oracle applies ([[dedupPairs]] contract). */
  def urlDedup(sparkIn: SparkSession, sfDir: String): DataFrame = {
    val spark = tunedSession(sparkIn)
    val out = readEventStream(spark, sfDir)
      .select(graft.operators.UrlCuration.canonicalize(
        graft.queries.LlmQueries.messyUrl(col("event_id"))).as("canon_url"))
      .dropDuplicates("canon_url")
    runToMemory(spark, out, "graft_stream_urldedup", OutputMode.Append())
  }

  /** Watermark-bounded streaming dedup: duplicates arriving within the
    * watermark delay of a key's first occurrence are dropped and the key's
    * state is evicted once the watermark passes — bounded state, the
    * production shape for endless streams. A key recurring after eviction
    * re-emits, so the global-DISTINCT oracle does NOT apply (spec-verified
    * instead). */
  def dedupWithinWatermark(sparkIn: SparkSession, sfDir: String,
                           delay: String = "1 hour"): DataFrame = {
    val spark = tunedSession(sparkIn)
    val out = readEventStream(spark, sfDir)
      .withWatermark("ts", delay)
      .select(col("user_id"), col("event_type"), col("ts"))
      .dropDuplicatesWithinWatermark("user_id", "event_type")
    runToMemory(spark, out, "graft_stream_dedup_wm", OutputMode.Append())
  }

  /** Stream-stream inner join with event-time constraints: for every
    * error event, the same user's clicks within the `windowMinutes` before
    * it (inclusive). Both sides carry watermarks and the join condition
    * bounds event-time distance, so state on each side is evicted once the
    * other side's watermark passes — the bounded-state contract that makes
    * stream-stream joins feasible on endless streams. Returns the joined
    * pairs (user_id, err_id, click_id); exactly-once contract = the batch
    * join over the same data. */
  def clickErrorJoin(sparkIn: SparkSession, sfDir: String,
                     windowMinutes: Long = 5): DataFrame = {
    val spark = tunedSession(sparkIn)
    val clicks = readEventStream(spark, sfDir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    val errors = readEventStream(spark, sfDir)
      .filter(col("event_type") === "error")
      .select(col("user_id").as("user_id"), col("ts").as("err_ts"),
        col("event_id").as("err_id"))
      .withWatermark("err_ts", "1 hour")
    val joined = errors.join(clicks,
      expr(s"""user_id = c_user AND
               click_ts <= err_ts AND
               click_ts > err_ts - INTERVAL $windowMinutes MINUTES"""))
      .select(col("user_id"), col("err_id"), col("click_id"))
    runToMemory(spark, joined, "graft_stream_ssjoin", OutputMode.Append())
  }

  /** Stream-stream LEFT OUTER join with event-time constraints: every
    * error, with its preceding same-user clicks inside the window — and
    * errors with NO such click still emit once, with a null click id,
    * when the watermark proves no match can still arrive. That proof is
    * the hard half of outer streaming joins: inner results emit in the
    * matching micro-batch, but null-padded rows only emit at state
    * eviction, which needs the watermark to pass the error's join window.
    *
    * Harness: the staged source appends two sentinel FILES (+30/+60 days
    * past max ts; each holds one error and one DELIBERATELY non-matching
    * click under different negative users). Emission uses the watermark
    * computed at the end of the PREVIOUS batch, so the second sentinel's
    * data batch runs with a watermark 30 days past every real error and
    * deterministically flushes all real unmatched rows;
    * processAllAvailable covers it. The FIRST sentinel error's own null
    * row provably flushes last (its window closes 30 days after any real
    * one) — polled for, then sentinels are filtered out. Exactly-once
    * contract = the batch LEFT JOIN over the same data. */
  def clickErrorLeftJoin(spark: SparkSession, sfDir: String,
                         windowMinutes: Long = 5): DataFrame =
    clickErrorOuterJoin(spark, sfDir, "leftOuter", windowMinutes)

  /** Stream-stream FULL OUTER join: [[clickErrorLeftJoin]]'s contract on
    * BOTH sides — unmatched errors null-pad their click columns AND
    * unmatched clicks null-pad their error columns, each emitting only
    * when the watermark proves no partner can still arrive (clicks evict
    * once the watermark passes click_ts + window — the forward half of
    * the time-range condition). Same sentinel harness: the +30d sentinel
    * batch's watermark flushes every real unmatched row on both sides
    * long before the +60d batch flushes the polled sentinel row.
    * Exactly-once contract = the batch FULL JOIN over the same data. */
  def clickErrorFullJoin(spark: SparkSession, sfDir: String,
                         windowMinutes: Long = 5): DataFrame =
    clickErrorOuterJoin(spark, sfDir, "fullOuter", windowMinutes)

  private def clickErrorOuterJoin(sparkIn: SparkSession, sfDir: String,
                                  joinType: String,
                                  windowMinutes: Long): DataFrame = {
    // Run the stateful query on a CLONED session (shared SparkContext,
    // isolated SQLConf) with shuffle partitions sized to the corpus: a
    // stream-stream outer join instantiates FOUR state stores per
    // shuffle partition per micro-batch, so 32 partitions over a 100k-row
    // fixture is ~90% fixed store/checkpoint overhead. 4 partitions keeps
    // the same hash-partitioned semantics at an eighth of the fixed cost
    // (measured: 9.1 s -> 4.3 s warm); a production deployment sizes this
    // to key cardinality instead (state per partition shrinks as
    // partitions grow — the dial trades store count against per-store
    // size).
    val spark = tunedSession(sparkIn)
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = java.nio.file.Paths.get(s"/tmp/graft_stream/$key/events_ssleft")
    stageLock.synchronized {
      val k2 = key + "/ssleft"
      if (!staged.contains(k2)) {
        java.nio.file.Files.createDirectories(dir)
        val srcPath = java.nio.file.Paths.get(s"$sfDir/events.parquet")
        val tmp = dir.resolve(s".ev.tmp-${java.util.UUID.randomUUID()}")
        java.nio.file.Files.copy(srcPath, tmp)
        java.nio.file.Files.move(tmp, dir.resolve("events.parquet"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        java.nio.file.Files.setLastModifiedTime(dir.resolve("events.parquet"),
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L))
        val raw = spark.read.parquet(s"$sfDir/events.parquet")
        Seq(30L, 60L).zipWithIndex.foreach { case (days, i) =>
          val bumped = raw.schema("ts").dataType match {
            case org.apache.spark.sql.types.LongType =>
              col("ts") + lit(days * 24 * 3600 * 1000000000L) // nanos
            case _ => col("ts") + expr(s"interval $days days")
          }
          val base = raw.orderBy(col("ts").desc).limit(1)
            .withColumn("ts", bumped)
          // the error sentinel's user has NO click sentinel — its null
          // row is the flushed-last signal the poll waits on
          val sent = base
            .withColumn("event_id", lit(-1L - i))
            .withColumn("user_id", lit(-1L - i))
            .withColumn("event_type", lit("error"))
            .unionByName(base
              .withColumn("event_id", lit(-10L - i))
              .withColumn("user_id", lit(-10L - i))
              .withColumn("event_type", lit("click")))
          val sentStage = dir.resolve(s".sent-${java.util.UUID.randomUUID()}")
          sent.coalesce(1).write.mode("overwrite").parquet(sentStage.toString)
          val part = sentStage.toFile.listFiles()
            .find(_.getName.endsWith(".parquet")).get
          val dst = dir.resolve(s"events-sentinel-$i.parquet")
          java.nio.file.Files.move(part.toPath, dst,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          java.nio.file.Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(1000000000000L + (i + 1) * 60000L))
          org.apache.commons.io.FileUtils.deleteDirectory(sentStage.toFile)
        }
        staged += k2
      }
    }
    def stream() = graft.Tables.normalizeEventTs(
      spark.readStream.schema(rawSchema(spark, sfDir))
        .option("maxFilesPerTrigger", "1").parquet(dir.toString))
    val clicks = stream()
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    val errors = stream()
      .filter(col("event_type") === "error")
      .select(col("user_id").as("user_id"), col("ts").as("err_ts"),
        col("event_id").as("err_id"))
      .withWatermark("err_ts", "1 hour")
    // coalesce the user key AFTER the join: in a full outer join either
    // side's key column can be null on the padded rows
    val joined = errors.join(clicks,
      expr(s"""user_id = c_user AND
               click_ts <= err_ts AND
               click_ts > err_ts - INTERVAL $windowMinutes MINUTES"""),
      joinType)
      .select(coalesce(col("user_id"), col("c_user")).as("user_id"),
        col("err_id"), col("click_id"))
    val sink = s"graft_stream_ss_$joinType".toLowerCase
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(sink).start()
    try {
      q.processAllAvailable()
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (spark.table(sink)
               .filter(col("user_id") === -1L && col("err_id").isNotNull).isEmpty &&
             System.nanoTime() < deadline) {
        Thread.sleep(100)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(sink).filter(col("user_id") >= 0)
  }

  /** Continuous converter: stream the landing directory into an ORC table
    * (append mode, exactly-once via the checkpoint) — the reference's
    * batch converter re-expressed as a running pipeline: new files landing
    * in the source directory flow into the table as they arrive. Driven to
    * completion here; on a cluster the query just keeps running. */
  def streamToOrc(spark: SparkSession, sfDir: String, outDir: String,
                  compression: String = "snappy"): Unit = {
    require(graft.sinks.OrcSink.SupportedCodecs.contains(compression.toLowerCase),
      s"unsupported ORC codec: $compression")
    val q = readEventStream(spark, sfDir).writeStream
      .format("orc")
      .option("path", s"$outDir/events")
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .option("compression", compression)
      .outputMode(OutputMode.Append())
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** documents.parquet schema for the streaming ingest source. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Per-key staging locks: doc-batch staging runs a full Spark job
    * (union + filter + write), so holding the GLOBAL stageLock for its
    * duration would serialize every concurrently-initializing streaming
    * gate behind it — the global lock only guards the memo set. */
  private val keyLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def readDocStream(spark: SparkSession, stageKey: String,
                            batch: () => DataFrame): DataFrame = {
    val key = stageKey.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = java.nio.file.Paths.get(s"/tmp/graft_stream/$key/documents")
    keyLocks.computeIfAbsent(key, _ => new Object).synchronized {
      if (!stageLock.synchronized(staged.contains(key))) {
        java.nio.file.Files.createDirectories(dir)
        // the streamed batch is materialized as constructed, the way a
        // crawler's landing dir only receives the new batch; staged to a
        // sibling scratch dir, then the single part file moves in
        // atomically (readers see the old or new file, never a partial)
        val tmp = dir.getParent.resolve(s".stage-${java.util.UUID.randomUUID()}")
        batch().coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        val part = new java.io.File(tmp.toString).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath, dir.resolve("docs.parquet"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        new java.io.File(tmp.toString).listFiles().foreach(_.delete())
        java.nio.file.Files.deleteIfExists(tmp)
        stageLock.synchronized { staged += key }
      }
    }
    spark.readStream.schema(docSchema).parquet(dir.toString)
  }

  /** Streaming ingest dedup — the continuous-crawl ingest shape: newly
    * landed documents stream through an exact-dedup gate against the
    * STANDING corpus's distinct fingerprints (a stream-static left-anti
    * join, append mode — no stateful operator, so it runs at any rate)
    * and only unseen docs survive to the sink. The static side is the
    * fingerprint index a production pipeline keeps materialized and
    * appends accepted batches to; [[graft.operators.Dedup.incrementalDedup]]
    * is the batch equivalent, the incremental MinHash funnel the fuzzy
    * one. `batch` is staged once under `stageKey` as the landing file;
    * `corpus` supplies the standing docs whose fingerprints form the
    * static side. Returns the surviving (doc_id, fp) snapshot. */
  def ingestDedup(spark: SparkSession, stageKey: String,
                  batch: () => DataFrame, corpus: DataFrame): DataFrame = {
    import graft.operators.TextAnalysis
    val corpusFp = corpus
      .select(TextAnalysis.fingerprint(col("text")).as("fp")).distinct()
    val kept = readDocStream(spark, stageKey, batch)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .join(corpusFp, Seq("fp"), "left_anti")
    // fixed sink name like the sibling streaming gates: the query stops
    // before any re-run starts, and repeated runs overwrite one temp
    // view instead of accumulating UUID-named sinks for the JVM lifetime
    runToMemory(spark, kept, "ingest_dedup", OutputMode.Append())
  }

  /** Streaming BM25 index maintenance — the serving side of the
    * continuous-crawl pipeline ([[ingestDedup]] is the ingest side):
    * accepted document batches land as parquet files in `landingDir`;
    * each micro-batch appends one Lucene-style segment to the standing
    * index via [[graft.operators.Retrieval.updateBm25Index]], so
    * per-batch cost is O(batch) regardless of index size and the index
    * is serveable between batches. Batch ids must be disjoint from the
    * standing index AND across batches (the landing dir is downstream
    * of an ingest-dedup gate, which is exactly what guarantees this —
    * so the per-batch disjointness scan is skipped). Re-delivery after
    * a checkpoint loss double-appends a segment (updateBm25Index is
    * append-only, not idempotent): recover by rebuilding the index,
    * the standard posture for any derived-index consumer. */
  def bm25IngestApply(spark: SparkSession, landingDir: String,
                      indexDir: String, checkpointDir: String): Unit = {
    val stream = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landingDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Retrieval.updateBm25Index(spark, indexDir,
            batch.toDF(), checkDisjoint = false)
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** embeddings.parquet schema for the streaming ANN-ingest source. */
  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Streaming ANN index maintenance — the vector twin of
    * [[bm25IngestApply]]: embedding-batch files land in `landingDir`,
    * each micro-batch appends its cell assignments to the standing IVF
    * index ([[graft.operators.Similarity.appendToIvfIndex]] — new files
    * per bucket, O(batch) per update) under the caller's FROZEN
    * centroids. The index stays serveable between batches
    * ([[graft.operators.Similarity.ivfIndexServe]]). Delivery contract
    * matches [[bm25IngestApply]]: AT-LEAST-ONCE, not idempotent — the
    * append is not transactional with the checkpoint commit, so a crash
    * between them re-appends the batch on restart (duplicate candidate
    * rows in the index). Production deployments dedup on (id) at serve
    * time or rebuild after a crash; the gate harness rebuilds fresh per
    * JVM for exactly this reason. */
  def ivfIngestApply(spark: SparkSession, landingDir: String, table: String,
                     centroids: Seq[Seq[Double]], checkpointDir: String): Unit = {
    val stream = spark.readStream
      .schema(embSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landingDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Similarity.appendToIvfIndex(
            batch.toDF(), "vec_id", "embedding", table, centroids)
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Streaming ingest into the versioned snapshot table
    * ([[graft.sinks.SnapshotTable]]): each micro-batch lands as ONE
    * atomic append commit, so a concurrent reader sees whole batches or
    * nothing — never a half-written micro-batch (the raw-ORC streaming
    * sink cannot promise that; the reference's readers can observe
    * partial exports, data_to_orc_converter.sh:245-252).
    *
    * Delivery contract: EXACTLY-ONCE table visibility, strictly stronger
    * than the at-least-once index-ingest siblings. Each commit carries
    * the (appId, batchId) txn pair, so when a crash between table-commit
    * and checkpoint-commit replays a batch — or an operator restarts the
    * whole stream with a fresh checkpoint — the re-attempt finds its own
    * earlier commit in the log and no-ops instead of double-appending.
    * Between batches, incremental consumers read the per-commit delta
    * via [[graft.sinks.SnapshotTable.changesSince]] without rescanning
    * the table. */
  def tableIngestApply(spark: SparkSession, landingDir: String,
                       tableDir: String, checkpointDir: String,
                       appId: String,
                       statsCols: Seq[String] = Seq("doc_id")): Unit = {
    val stream = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landingDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty) {
          graft.sinks.SnapshotTable.commit(spark, batch.toDF(), tableDir,
            "append", statsCols = statsCols, txn = Some((appId, id)))
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Streaming NEAR-DUP index maintenance — the MinHash twin of
    * [[bm25IngestApply]]/[[ivfIngestApply]], completing the
    * standing-index trio (lexical BM25, vector IVF, near-dup MinHash):
    * accepted document batches land as parquet files in `landingDir`;
    * each micro-batch signatures its documents and appends the banded
    * rows to the standing band-hash-bucketed index
    * ([[graft.operators.Dedup.appendToNearDupIndex]] — new files per
    * bucket, standing files untouched, O(batch) per update). Between
    * batches the index serves incremental screening via
    * [[graft.operators.Dedup.nearDupServe]] with the corpus side
    * exchange-free. Delivery contract matches the siblings:
    * AT-LEAST-ONCE, not idempotent — a crash between append and
    * checkpoint commit re-appends the batch's signatures on restart
    * (duplicate candidate rows collapse in nearDupServe's DISTINCT, so
    * served ANSWERS stay correct, but the index carries dead weight —
    * rebuild after a crash, same posture as the siblings). */
  def minhashIngestApply(spark: SparkSession, landingDir: String,
                         table: String, checkpointDir: String,
                         k: Int = 32, shingleSize: Int = 5,
                         bands: Int = 8): Unit = {
    val stream = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landingDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Dedup.appendToNearDupIndex(batch.toDF(),
            "doc_id", "text", table, k, shingleSize, bands)
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Streaming PER-INGEST-BATCH distribution-drift monitor: document
    * batches land as parquet files; each micro-batch's quality-score
    * distribution is tested against the standing reference distribution
    * (per-value counts, e.g. the accepted corpus) with the two-sample
    * KS statistic ([[graft.operators.Profile.ksStatistic]] — the same
    * gate-proven shape as the batch `profile_ks_drift`). This is the
    * alerting loop a production pipeline runs on every crawl delivery:
    * a batch whose D jumps is quarantined before it pollutes the mix.
    *
    * `reference` must have columns (q, c2). Per batch the KS frame is
    * reference-grid-sized (bounded by the 4dp score range), so each
    * micro-batch adds O(batch scan + grid window) regardless of corpus
    * size. Returns one row per micro-batch:
    * (batch_id, n_docs, ks_d, argmax_q) in landing order. */
  def qualityDriftApply(spark: SparkSession, landingDir: String,
                        reference: DataFrame,
                        checkpointDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val results =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Double)]
    val stream = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landingDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], bid: Long) =>
        if (!batch.isEmpty) {
          val bc = batch.toDF()
            .select(TextAnalysis.qualityScore(col("text")).as("q"))
            .groupBy(col("q")).agg(count(lit(1)).as("c1"))
          // full outer: a batch value ABSENT from the reference grid is
          // itself drift evidence and must stay on the merged grid
          val u = reference.join(bc, Seq("q"), "full_outer")
            .select(col("q"), coalesce(col("c1"), lit(0L)).as("c1"),
              coalesce(col("c2"), lit(0L)).as("c2"))
          val row = graft.operators.Profile.ksStatistic(u).head()
          val n = batch.count()
          results.synchronized {
            results += ((bid, n, row.getDouble(0), row.getDouble(1)))
          }
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    results.sortBy(_._1).toSeq
      .toDF("batch_id", "n_docs", "ks_d", "argmax_q")
  }

  /** Streaming DECONTAMINATE-AT-INGEST gate: each landed document batch
    * is screened for exact n-gram span overlap with the held-out
    * benchmark suite BEFORE it can enter the corpus — the placement
    * production pipelines actually use (contamination is cheapest to
    * stop at the door; a quarantined batch never needs to be clawed back
    * out of a trained mix). Screening is
    * [[graft.operators.Dedup.spanContaminated]] per micro-batch: the
    * benchmark's distinct window hashes broadcast, the batch STREAMS
    * through map-only, so per-batch cost is O(batch), independent of
    * corpus size. Returns one audit row per micro-batch:
    * (batch_id, n_docs, n_contaminated, contaminated_id_sum) in landing
    * order — n_contaminated > 0 is the quarantine signal. */
  def decontamIngestApply(spark: SparkSession, landingDir: String,
                          bench: DataFrame, spanTokens: Int,
                          checkpointDir: String): DataFrame = {
    import spark.implicits._
    val results =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val stream = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landingDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], bid: Long) =>
        if (!batch.isEmpty) {
          val flagged = graft.operators.Dedup.spanContaminated(
              batch.toDF(), bench, "doc_id", "text", spanTokens)
            .agg(count(lit(1)).cast("long").as("n"),
              coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"))
            .head()
          val n = batch.count()
          results.synchronized {
            results += ((bid, n, flagged.getLong(0), flagged.getLong(1)))
          }
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    results.sortBy(_._1).toSeq
      .toDF("batch_id", "n_docs", "n_contaminated", "contaminated_id_sum")
  }

  /** COMPOSED streaming curation at ingest — the at-ingest monitors
    * chained into ONE pipeline over the same micro-batches, in the order
    * a production door runs them (the streaming twin of the
    * pipeline_curate_v2 composition gate, which caught a real
    * composed-plan bug its per-operator gates missed):
    *
    *  1. DECONTAM GATE: docs sharing any exact `spanTokens`-gram with
    *     the benchmark suite are quarantined (broadcast bench hashes,
    *     map-only screen — [[graft.operators.Dedup.spanContaminated]]).
    *  2. URL DEDUP vs STANDING STATE: each survivor's canonical URL is
    *     checked against the append-only standing key index (all canon
    *     urls first-seen in EARLIER batches) and against earlier docs of
    *     its own batch (per-url keep-first window); survivors' new keys
    *     append to the index — the same standing-index maintenance shape
    *     as the BM25/IVF/MinHash ingest trio, O(batch) per update.
    *  3. DRIFT KS: the post-screen batch's quality-score grid is
    *     KS-tested against the full-corpus reference grid (bounded 4dp
    *     grid, [[graft.operators.Profile.ksStatistic]]) — an audit
    *     column, not a filter.
    *  4. ADMISSION CAP per source: standing per-source admitted counts
    *     (a #sources-sized driver map, the [[clusterRouteApply]] state
    *     shape) admit each batch's survivors in doc_id order up to
    *     `capPerSource` lifetime.
    *
    * `reference` must have columns (q, c2); `urlOf` derives the doc's
    * messy URL column from its id. The standing URL index directory is
    * wiped at start: this entry point REPLAYS a landing history from
    * batch 0 (the gate shape); a restarting deployment would keep it
    * alongside the checkpoint. Returns one audit row per (micro-batch,
    * source) over batch ARRIVALS, in landing order: (batch_id, source,
    * n_docs, n_contaminated, n_url_dup, n_admitted, admitted_id_sum,
    * ks_d). */
  def curateIngestApply(spark: SparkSession, landingDir: String,
                        bench: DataFrame, reference: DataFrame,
                        urlOf: Column => Column, spanTokens: Int,
                        capPerSource: Int, checkpointDir: String): DataFrame = {
    import spark.implicits._
    val urlStateDir = checkpointDir + "_urlstate"
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(urlStateDir))
    val used = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    var urlStateNonEmpty = false
    val results = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Long, Long, Long, Long, Double)]
    val stream = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landingDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], bid: Long) =>
        if (!batch.isEmpty) {
          val arrivals = batch.toDF()
            .select(col("doc_id"), col("source"), col("text"))
          // 1. contaminated ids (map-only vs broadcast bench hashes)
          val contam = graft.operators.Dedup.spanContaminated(
              arrivals, bench, "doc_id", "text", spanTokens)
            .withColumn("is_contam", lit(true))
          val flagged = arrivals.join(contam, Seq("doc_id"), "left_outer")
            .withColumn("is_contam",
              coalesce(col("is_contam"), lit(false)))
          // 2. url dedup: standing index + within-batch keep-first
          val canon = flagged.withColumn("canon_url",
            graft.operators.UrlCuration.canonicalize(urlOf(col("doc_id"))))
          val seen =
            if (urlStateNonEmpty)
              spark.read.parquet(urlStateDir)
                .withColumn("seen", lit(true))
            else spark.emptyDataFrame
              .withColumn("canon_url", lit("")).withColumn("seen", lit(true))
          // partition split on is_contam: a quarantined doc must not
          // consume the keep-first slot of its canon url (row_number
          // numbers every partition row even when the projection nulls
          // it — measured off-by-one vs the batch replay at sf0.1)
          val wUrl = Window.partitionBy(col("canon_url"), col("is_contam"))
            .orderBy(col("doc_id"))
          val marked = canon.join(seen, Seq("canon_url"), "left_outer")
            .withColumn("rn_url",
              when(col("is_contam"), lit(null))
                .otherwise(row_number().over(wUrl)))
            .withColumn("is_urldup", !col("is_contam") &&
              (coalesce(col("seen"), lit(false)) || col("rn_url") > 1))
            .persist()
          marked.count() // pin: the admission window must see one frame
          // 3. KS drift on the post-screen batch vs the corpus grid
          val survivors = marked.filter(!col("is_contam") && !col("is_urldup"))
          val grid = survivors
            .select(graft.operators.TextAnalysis.qualityScore(col("text")).as("q"))
            .groupBy(col("q")).agg(count(lit(1)).as("c1"))
          val u = reference.join(grid, Seq("q"), "full_outer")
            .select(col("q"), coalesce(col("c1"), lit(0L)).as("c1"),
              coalesce(col("c2"), lit(0L)).as("c2"))
          val ksD = graft.operators.Profile.ksStatistic(u).head().getDouble(0)
          // 4. per-source admission against the standing lifetime caps
          val quota = used.synchronized {
            spark.createDataFrame(
              survivors.select(col("source")).distinct().collect()
                .map(r => (r.getString(0),
                  math.max(0L, capPerSource - used(r.getString(0))))).toSeq)
              .toDF("source", "allowed")
          }
          val wSrc = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          val admitted = survivors
            .withColumn("rn_src", row_number().over(wSrc))
            .join(broadcast(quota), Seq("source"), "left_outer")
            .withColumn("is_admitted",
              col("rn_src") <= coalesce(col("allowed"), lit(0L)))
          val audit = marked.select(col("doc_id"), col("source"),
              col("is_contam"), col("is_urldup"))
            .join(admitted.select(col("doc_id"),
              col("is_admitted")), Seq("doc_id"), "left_outer")
            .groupBy(col("source"))
            .agg(count(lit(1)).as("n_docs"),
              sum(when(col("is_contam"), 1L).otherwise(0L)).as("n_contam"),
              sum(when(col("is_urldup"), 1L).otherwise(0L)).as("n_urldup"),
              sum(when(coalesce(col("is_admitted"), lit(false)), 1L)
                .otherwise(0L)).as("n_admitted"),
              coalesce(sum(when(coalesce(col("is_admitted"), lit(false)),
                col("doc_id"))), lit(0L)).as("id_sum"))
            .collect()
          // standing-state updates: new first-seen keys append to the
          // index; per-source admitted counts bump the lifetime tally.
          // UNSEEN keys only — a cross-batch dup has rn_url==1 within its
          // own batch, and appending it again would leave duplicate keys
          // in the state, fanning out the left_outer join for every later
          // batch that carries the same url a 3rd+ time.
          marked.filter(col("rn_url") === 1 &&
              !coalesce(col("seen"), lit(false)))
            .select(col("canon_url"))
            .write.mode("append").parquet(urlStateDir)
          urlStateNonEmpty = true
          marked.unpersist()
          results.synchronized {
            used.synchronized {
              audit.foreach { r =>
                used(r.getString(0)) += r.getLong(4)
                results += ((bid, r.getString(0), r.getLong(1), r.getLong(2),
                  r.getLong(3), r.getLong(4), r.getLong(5), ksD))
              }
            }
          }
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    results.sortBy(r => (r._1, r._2)).toSeq
      .toDF("batch_id", "source", "n_docs", "n_contaminated", "n_url_dup",
        "n_admitted", "admitted_id_sum", "ks_d")
  }

  /** Streaming CLUSTER-BALANCED admission control — the online form of
    * the DataComp-style cluster cap ([[graft.operators.Similarity
    * .clusterBalance]] is the batch form): embedding batches land in
    * order; each micro-batch routes its vectors through the compiled
    * centroid kernel and admits per cluster only up to the standing cap
    * MINUS what earlier batches already admitted. The cap state is a
    * #clusters-sized driver map (KBs; at deployment scale this is the
    * canonical tiny-aggregate state, checkpointable alongside the
    * stream). Admission within a batch is by count, not identity — the
    * caller slices the admitted prefix in id order downstream, matching
    * the batch operator's id-order cap. Returns one audit row per
    * (micro-batch, cluster) in landing order:
    * (batch_id, cluster_id, n, n_admitted). */
  def clusterRouteApply(spark: SparkSession, landingDir: String,
                        centroids: Seq[(Long, Seq[Double])], cap: Int,
                        checkpointDir: String): DataFrame = {
    import spark.implicits._
    val admitted = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    val results =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val stream = spark.readStream
      .schema(embSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landingDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], bid: Long) =>
        if (!batch.isEmpty) {
          val counts = graft.operators.Similarity
            .assignClusters(batch.toDF(), "vec_id", "embedding", centroids)
            .groupBy(col("cluster_id")).agg(count(lit(1)).as("n"))
            .collect().map(r => (r.getLong(0), r.getLong(1)))
          results.synchronized {
            counts.sortBy(_._1).foreach { case (cid, n) =>
              val admit = math.max(0L, math.min(cap - admitted(cid), n))
              admitted(cid) += admit
              results += ((bid, cid, n, admit))
            }
          }
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    results.sortBy(r => (r._1, r._2)).toSeq
      .toDF("batch_id", "cluster_id", "n", "n_admitted")
  }

  /** Streaming CDC apply loop: change-batch files (parquet, the base
    * schema plus op/seq columns per [[graft.sinks.OrcSink.mergeUpsert]])
    * land in `changesDir`; each micro-batch merges ONE batch file into
    * the ORC table at `tableRoot/table` and swaps the merged copy in
    * crash-safely ([[graft.sinks.OrcSink.replaceTable]]). This is the
    * incremental-sync architecture at cluster scale: the change queue is
    * the streaming source, the table rewrite is the micro-batch body,
    * and the checkpoint makes re-delivery idempotent-per-file.
    *
    * Write scope per micro-batch depends on the table's layout: a
    * key-bucketed base ([[graft.sinks.OrcSink.writeKeyBucketed]]) routes
    * to the partition-scoped merge — only the bucket directories the
    * batch's keys hash into are read and rewritten, so per-batch cost
    * tracks batch size, not table size (the shape that survives 100 TB).
    * A plain base falls back to full-table merge + crash-safe swap
    * ([[graft.sinks.OrcSink.replaceTable]]).
    *
    * Batches must be APPLIED IN LANDING ORDER (maxFilesPerTrigger=1 +
    * the file source's oldest-first ordering): the merged table does not
    * retain per-row sequence numbers, so cross-batch convergence relies
    * on ordered application — the same contract as any CDC log consumer.
    * Within a batch, sequence numbers order freely. */
  def cdcApply(spark: SparkSession, changesDir: String,
               changeSchema: StructType, tableRoot: String, table: String,
               keyCols: Seq[String], checkpointDir: String): Unit = {
    val stream = spark.readStream
      .schema(changeSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(changesDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val dir = s"$tableRoot/$table"
          if (graft.sinks.OrcSink.bucketCount(spark, dir).isDefined) {
            graft.sinks.OrcSink.mergeUpsertPruned(spark, dir, table,
              batch.toDF(), keyCols)
          } else {
            val base = graft.sinks.OrcSink.read(spark, dir)
            val merged = graft.sinks.OrcSink.mergeUpsert(base, batch.toDF(), keyCols)
            graft.sinks.OrcSink.replaceTable(spark, dir, table, merged)
          }
          ()
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Drive a streaming DataFrame to a memory sink until exhausted; return
    * the sink table snapshot (latest row per key for Update mode is
    * handled by the caller's aggregation shape). */
  private def runToMemory(spark: SparkSession, df: DataFrame,
                          name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
