package graft.sinks

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.orc.{ColumnStatistics, DateColumnStatistics,
  DecimalColumnStatistics, DoubleColumnStatistics, IntegerColumnStatistics,
  OrcFile, StringColumnStatistics, TimestampColumnStatistics}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, lit}

/** Versioned snapshot table over ORC — the transactional publishing layer
  * a 100 TB lake needs on top of the converter's raw part-file output
  * (the reference stops at `ls`-visible part files,
  * data_to_orc_converter.sh:245-252; readers there can observe
  * half-written exports). Minimal re-expression of the public
  * Delta/Iceberg commit design:
  *
  *   - DATA files land under `dir/data/<batch>/` first; they are
  *     INVISIBLE until a version file names them. The version file is
  *     staged to a temp name and published with an atomic rename, so a
  *     reader sees the whole commit or none of it, and a writer crash
  *     leaves only unreferenced data files ([[vacuum]] reclaims them).
  *   - OPTIMISTIC CONCURRENCY: the rename fails if `v{N}.json` already
  *     exists (another writer won); the loser re-reads the log and
  *     retries at N+1. No locks, no coordinator — rename-if-absent is
  *     the whole protocol (an object-store deployment swaps in a
  *     conditional put).
  *   - The MANIFEST rides inside the version file: one entry per data
  *     file with row count, byte size, and per-column min/max/null-count
  *     HARVESTED FROM THE ORC FOOTERS the write already produced — stats
  *     collection reads zero data bytes, at any scale. Harvest is a
  *     distributed map over the file list (#files tasks, footer-only
  *     reads), so a 10k-file commit costs 10k footer opens spread over
  *     the cluster, not a driver loop.
  *   - SNAPSHOT = log replay: files from the last `overwrite` at or
  *     before version v, plus every `append` after it. Time travel is
  *     `read(dir, Some(v))`; old versions stay readable until vacuumed.
  *   - [[scanPruned]] is manifest pruning: a range predicate on a stats
  *     column drops every file whose [min,max] cannot overlap BEFORE the
  *     scan plans — query planning touches #manifest entries, never the
  *     filesystem listing or file footers (the Iceberg planning-cost
  *     argument). Files lacking stats for the column are conservatively
  *     kept, so pruning can only skip provably-dead files; the caller's
  *     real filter still applies and correctness never depends on stats.
  *
  * Clustering is the caller's dial: commit with a range-partitioned
  * frame (e.g. `df.repartitionByRange(n, col(k))`) and each file's
  * [min,max] on k is tight, so manifest pruning approaches partition
  * pruning without hive directory explosion.
  */
object SnapshotTable {

  /** Per-column footer stats: numeric channel (longs/doubles/decimals/
    * timestamps-as-epoch-millis/dates-as-epoch-days) and string channel;
    * whichever matches the type is populated. */
  final case class ColStats(min: Option[Double], max: Option[Double],
                            minStr: Option[String], maxStr: Option[String],
                            nulls: Long)

  final case class FileEntry(path: String, rows: Long, bytes: Long,
                             stats: Map[String, ColStats])

  final case class Commit(version: Long, action: String,
                          files: Seq[FileEntry],
                          txn: Option[(String, Long)] = None)

  private val mapper = new ObjectMapper()

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(dir: String) = new Path(dir, "_log")

  private def versionOf(p: Path): Option[Long] = {
    val n = p.getName
    if (n.startsWith("v") && n.endsWith(".json"))
      scala.util.Try(n.stripPrefix("v").stripSuffix(".json").toLong).toOption
    else None
  }

  /** All committed versions, ascending (empty for a fresh/absent table). */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val ld = logDir(dir)
    if (!f.exists(ld)) Seq.empty
    else f.listStatus(ld).toSeq.flatMap(s => versionOf(s.getPath)).sorted
  }

  def currentVersion(spark: SparkSession, dir: String): Option[Long] =
    versions(spark, dir).lastOption

  // ---- commit ----------------------------------------------------------

  /** Write `df` as a new snapshot version. `mode` is "append" or
    * "overwrite". `statsCols`: top-level columns to harvest min/max for
    * (pruning candidates). Returns the committed version number.
    *
    * `txn = Some((appId, seq))` makes the commit IDEMPOTENT per
    * (appId, seq) — the Delta txnAppId/txnVersion pattern: if any
    * committed version already carries the pair, the call is a no-op
    * returning that version. This is what upgrades an at-least-once
    * producer (a restarted streaming micro-batch, a retried job) to
    * exactly-once VISIBILITY: the replayed attempt recognizes its own
    * earlier commit instead of appending twice. */
  def commit(spark: SparkSession, df: DataFrame, dir: String, mode: String,
             statsCols: Seq[String] = Nil, maxRetries: Int = 20,
             txn: Option[(String, Long)] = None): Long = {
    require(mode == "append" || mode == "overwrite",
      s"unknown commit mode: $mode")
    txn.flatMap(t => committedTxn(spark, dir, t._1, t._2))
      .foreach(v => return v)
    val f = fs(spark, dir)
    val batch = f"batch-${java.util.UUID.randomUUID().toString.take(12)}"
    val batchDir = new Path(new Path(dir, "data"), batch)
    df.write.mode("overwrite").orc(batchDir.toString)
    val parts = f.listStatus(batchDir).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(_.getPath.toString)
    val entries = harvest(spark, parts, statsCols)
      .map(e => e.copy(path = s"data/$batch/${new Path(e.path).getName}"))
    publish(spark, dir, mode, entries, maxRetries, txn)
  }

  /** Distributed footer harvest: one task per bounded bundle of files,
    * each reading ONLY the ORC footer. The Hadoop conf travels as a
    * string map (SerializableConfiguration is spark-private). */
  private def harvest(spark: SparkSession, files: Seq[String],
                      statsCols: Seq[String]): Seq[FileEntry] = {
    if (files.isEmpty) return Seq.empty
    val confMap = spark.sparkContext.hadoopConfiguration.asScala
      .map(e => (e.getKey, e.getValue)).toMap
    val cols = statsCols
    val slices = math.max(1, math.min(files.size, 64))
    spark.sparkContext.parallelize(files, slices).map { p =>
      val conf = new Configuration(false)
      confMap.foreach { case (k, v) => conf.set(k, v) }
      readFooter(p, cols, conf)
    }.collect().toSeq.sortBy(_.path)
  }

  private def readFooter(path: String, statsCols: Seq[String],
                         conf: Configuration): FileEntry = {
    val reader = OrcFile.createReader(new Path(path),
      OrcFile.readerOptions(conf))
    try {
      val schema = reader.getSchema
      val all = reader.getStatistics
      val names = schema.getFieldNames.asScala
      val stats = statsCols.flatMap { c =>
        val i = names.indexOf(c)
        if (i < 0) None
        else {
          // stats are indexed by TypeDescription id (root = 0)
          val id = schema.getChildren.get(i).getId
          Some(c -> toColStats(all(id), reader.getNumberOfRows))
        }
      }.toMap
      FileEntry(path, reader.getNumberOfRows, reader.getContentLength, stats)
    } finally reader.close()
  }

  private def toColStats(s: ColumnStatistics, fileRows: Long): ColStats = {
    val nulls = math.max(0L, fileRows - s.getNumberOfValues)
    if (s.getNumberOfValues == 0) return ColStats(None, None, None, None, nulls)
    s match {
      case i: IntegerColumnStatistics =>
        ColStats(Some(i.getMinimum.toDouble), Some(i.getMaximum.toDouble),
          None, None, nulls)
      case d: DoubleColumnStatistics =>
        ColStats(Some(d.getMinimum), Some(d.getMaximum), None, None, nulls)
      case d: DecimalColumnStatistics =>
        ColStats(Some(d.getMinimum.doubleValue()),
          Some(d.getMaximum.doubleValue()), None, None, nulls)
      case t: TimestampColumnStatistics =>
        ColStats(Some(t.getMinimum.getTime.toDouble),
          Some(t.getMaximum.getTime.toDouble), None, None, nulls)
      case d: DateColumnStatistics =>
        ColStats(Some(d.getMinimumDayOfEpoch.toDouble),
          Some(d.getMaximumDayOfEpoch.toDouble), None, None, nulls)
      case st: StringColumnStatistics =>
        ColStats(None, None, Option(st.getMinimum), Option(st.getMaximum),
          nulls)
      case _ => ColStats(None, None, None, None, nulls)
    }
  }

  /** Latest committed version carrying (appId, seq), if any. */
  private def committedTxn(spark: SparkSession, dir: String, appId: String,
                           seq: Long): Option[Long] =
    versions(spark, dir).reverse
      .find(v => readCommit(spark, dir, v).txn.contains((appId, seq)))

  /** Atomic-rename publish with optimistic retry. */
  private def publish(spark: SparkSession, dir: String, mode: String,
                      entries: Seq[FileEntry], maxRetries: Int,
                      txn: Option[(String, Long)] = None): Long = {
    val f = fs(spark, dir)
    f.mkdirs(logDir(dir))
    var attempt = 0
    while (attempt <= maxRetries) {
      // losing a race re-checks the txn table: the winner may have been
      // this producer's own earlier attempt
      txn.flatMap(t => committedTxn(spark, dir, t._1, t._2))
        .foreach(v => return v)
      val v = currentVersion(spark, dir).getOrElse(-1L) + 1
      val target = new Path(logDir(dir), f"v$v%020d.json")
      val tmp = new Path(logDir(dir),
        s".tmp-${java.util.UUID.randomUUID().toString.take(12)}")
      val out = f.create(tmp, false)
      try out.write(commitJson(v, mode, entries, txn).getBytes("UTF-8"))
      finally out.close()
      // rename-if-absent IS the commit: exactly one writer wins version v
      val won = !f.exists(target) && f.rename(tmp, target)
      if (won) return v
      f.delete(tmp, false)
      attempt += 1
    }
    throw new IllegalStateException(
      s"snapshot commit to $dir lost ${maxRetries + 1} optimistic races")
  }

  private def commitJson(v: Long, mode: String, entries: Seq[FileEntry],
                         txn: Option[(String, Long)]): String = {
    val root = mapper.createObjectNode()
    root.put("version", v)
    root.put("action", mode)
    txn.foreach { case (app, seq) =>
      root.put("txnApp", app)
      root.put("txnSeq", seq)
    }
    val arr = root.putArray("files")
    entries.foreach { e =>
      val n = arr.addObject()
      n.put("path", e.path)
      n.put("rows", e.rows)
      n.put("bytes", e.bytes)
      val st = n.putObject("stats")
      e.stats.toSeq.sortBy(_._1).foreach { case (c, cs) =>
        val o = st.putObject(c)
        cs.min.foreach(o.put("min", _))
        cs.max.foreach(o.put("max", _))
        cs.minStr.foreach(o.put("minStr", _))
        cs.maxStr.foreach(o.put("maxStr", _))
        o.put("nulls", cs.nulls)
      }
    }
    root.toString
  }

  private def parseCommit(json: String): Commit = {
    val n = mapper.readTree(json)
    def opt(o: JsonNode, k: String): Option[Double] =
      if (o.has(k) && o.get(k).isNumber) Some(o.get(k).asDouble) else None
    def optS(o: JsonNode, k: String): Option[String] =
      if (o.has(k)) Some(o.get(k).asText) else None
    val files = n.get("files").elements().asScala.map { fn =>
      val stats = if (fn.has("stats")) {
        fn.get("stats").properties().asScala.map { e =>
          val o = e.getValue
          e.getKey -> ColStats(opt(o, "min"), opt(o, "max"),
            optS(o, "minStr"), optS(o, "maxStr"),
            if (o.has("nulls")) o.get("nulls").asLong else 0L)
        }.toMap
      } else Map.empty[String, ColStats]
      FileEntry(fn.get("path").asText, fn.get("rows").asLong,
        fn.get("bytes").asLong, stats)
    }.toSeq
    val txn =
      if (n.has("txnApp")) Some((n.get("txnApp").asText, n.get("txnSeq").asLong))
      else None
    Commit(n.get("version").asLong, n.get("action").asText, files, txn)
  }

  private def readCommit(spark: SparkSession, dir: String, v: Long): Commit = {
    val f = fs(spark, dir)
    val p = new Path(logDir(dir), f"v$v%020d.json")
    val in = f.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      parseCommit(new String(bytes.toByteArray, "UTF-8"))
    } finally in.close()
  }

  // ---- read / time travel ---------------------------------------------

  /** Log replay: the file set visible at `version` (default: latest). */
  def snapshotFiles(spark: SparkSession, dir: String,
                    version: Option[Long] = None): Seq[FileEntry] = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no snapshot table at $dir")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in ${vs.mkString(",")}")
    val replay = vs.filter(_ <= v).map(readCommit(spark, dir, _))
    val acc = mutable.ArrayBuffer.empty[FileEntry]
    replay.foreach { c =>
      if (c.action == "overwrite") acc.clear()
      acc ++= c.files
    }
    acc.toSeq
  }

  def read(spark: SparkSession, dir: String,
           version: Option[Long] = None): DataFrame = {
    val files = snapshotFiles(spark, dir, version)
    readFiles(spark, dir, files)
  }

  private def readFiles(spark: SparkSession, dir: String,
                        files: Seq[FileEntry]): DataFrame = {
    require(files.nonEmpty, s"empty snapshot at $dir")
    spark.read.orc(files.map(e => s"$dir/${e.path}"): _*)
  }

  /** Manifest-pruned range scan: drop files whose footer [min,max] on
    * `column` cannot intersect [lo, hi], then read the survivors and
    * apply the REAL predicate. Returns (frame, filesKept, filesTotal).
    * Missing stats keep the file; NULLs survive pruning only if the file
    * holds any in-range value, and are removed by the real predicate
    * like any other scan. */
  def scanPruned(spark: SparkSession, dir: String, column: String,
                 lo: Double, hi: Double,
                 version: Option[Long] = None): (DataFrame, Int, Int) = {
    val files = snapshotFiles(spark, dir, version)
    val kept = files.filter { e =>
      e.stats.get(column) match {
        case Some(ColStats(Some(mn), Some(mx), _, _, _)) =>
          mx >= lo && mn <= hi
        case _ => true
      }
    }
    // every file provably dead: schema-preserving empty frame (the
    // optimizer folds the false filter to an empty relation — no I/O)
    val base =
      if (kept.isEmpty) readFiles(spark, dir, files).where(lit(false))
      else readFiles(spark, dir, kept)
    val df = base.where(col(column) >= lo && col(column) <= hi)
    (df, kept.size, files.size)
  }

  // ---- write-path maintenance: compact / merge / change feed -----------

  final case class MergeReport(version: Long, filesRewritten: Int,
                               filesCarried: Int)

  /** Copy-on-write upsert (the Delta/Iceberg MERGE core): rows of
    * `updates` REPLACE current rows with the same `keyCol`; unmatched
    * update keys insert. Only data files whose manifest [min,max] on
    * `keyCol` can contain an update key are rewritten — every other
    * file's manifest entry is CARRIED into the new version untouched
    * (zero I/O, byte-identical on disk). With a key-clustered table a
    * point-ish merge rewrites O(matched files), not O(table): exactly
    * the property that makes upserts feasible at 100 TB. Files lacking
    * `keyCol` stats are conservatively rewritten. The swap is one
    * overwrite commit, atomic like any other; the pre-merge version
    * stays time-travel-readable. */
  def merge(spark: SparkSession, dir: String, updates: DataFrame,
            keyCol: String, statsCols: Seq[String] = Nil): MergeReport = {
    val files = snapshotFiles(spark, dir)
    // exact file stabbing, not a bounding box (a single inserted key far
    // outside the table's range would otherwise force a full rewrite):
    // update keys range-join the broadcast #files-row manifest ranges;
    // the collect is bounded by #files
    import spark.implicits._
    val ranged = files.flatMap { e =>
      e.stats.get(keyCol).collect {
        case ColStats(Some(mn), Some(mx), _, _, _) => (e.path, mn, mx)
      }
    }
    val statless = files.filterNot(e =>
      ranged.exists(_._1 == e.path)).map(_.path).toSet
    val stabbed: Set[String] =
      if (ranged.isEmpty) Set.empty
      else updates.select(col(keyCol).cast("double").as("_k")).distinct()
        .join(broadcast(ranged.toDF("_path", "_mn", "_mx")),
          col("_k") >= col("_mn") && col("_k") <= col("_mx"))
        .select(col("_path")).distinct()
        .collect().map(_.getString(0)).toSet
    val (touched, carried) = files.partition(e =>
      stabbed.contains(e.path) || statless.contains(e.path))
    // upsert = (touched rows minus updated keys) + all updates
    val survivors =
      if (touched.isEmpty) updates
      else readFiles(spark, dir, touched)
        .join(broadcast(updates.select(col(keyCol)).distinct()),
          Seq(keyCol), "left_anti")
        .unionByName(updates)
    val f = fs(spark, dir)
    val batch = f"batch-${java.util.UUID.randomUUID().toString.take(12)}"
    val batchDir = new Path(new Path(dir, "data"), batch)
    survivors.write.mode("overwrite").orc(batchDir.toString)
    val parts = f.listStatus(batchDir).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(_.getPath.toString)
    val fresh = harvest(spark, parts, statsCols)
      .map(e => e.copy(path = s"data/$batch/${new Path(e.path).getName}"))
    val v = publish(spark, dir, "overwrite", carried ++ fresh,
      maxRetries = 20)
    MergeReport(v, fresh.size, carried.size)
  }

  /** Bin-pack small files into ~`targetBytes` files as a new overwrite
    * commit — the OPTIMIZE half of table maintenance (streaming ingest
    * and point merges accrete small files; scan cost is per-file).
    * Rewrites data only: the row set is unchanged, and the pre-compact
    * version stays readable until vacuumed. `clusterBy` re-establishes
    * range clustering (tight per-file [min,max]) so compaction preserves
    * — or restores — manifest prunability instead of destroying it. */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L << 20,
              clusterBy: Option[String] = None,
              statsCols: Seq[String] = Nil): Long = {
    val files = snapshotFiles(spark, dir)
    val n = math.max(1,
      math.ceil(files.map(_.bytes).sum.toDouble / targetBytes).toInt)
    val df = readFiles(spark, dir, files)
    val packed = clusterBy match {
      case Some(c) => df.repartitionByRange(n, col(c))
      case None => df.repartition(n)
    }
    commit(spark, packed, dir, "overwrite", statsCols)
  }

  /** Append-only change feed: the rows added by commits in
    * (fromVersion, toVersion] — i.e. the files those commits introduced.
    * Incremental consumers (downstream index ingest, CDC fan-out) read
    * ONLY the new files, never the table. Rejects ranges crossing an
    * overwrite commit: an overwrite replaces state wholesale, so "what
    * changed" is not expressible as added files — callers re-read the
    * snapshot instead. */
  def changesSince(spark: SparkSession, dir: String, fromVersion: Long,
                   toVersion: Option[Long] = None): DataFrame = {
    val vs = versions(spark, dir)
    val to = toVersion.getOrElse(vs.last)
    val span = vs.filter(v => v > fromVersion && v <= to)
    require(span.nonEmpty, s"empty version span ($fromVersion, $to]")
    val commits = span.map(readCommit(spark, dir, _))
    require(commits.forall(_.action == "append"),
      s"span ($fromVersion, $to] crosses an overwrite commit — " +
        "re-read the snapshot instead")
    readFiles(spark, dir, commits.flatMap(_.files))
  }

  // ---- maintenance -----------------------------------------------------

  /** Delete data files referenced by NO committed version — the residue
    * of crashed or lost-race commits. Never touches referenced files, so
    * every committed version stays readable. Returns deleted paths. */
  def vacuum(spark: SparkSession, dir: String): Seq[String] = {
    val f = fs(spark, dir)
    val vs = versions(spark, dir)
    val referenced = vs.flatMap(v => readCommit(spark, dir, v).files)
      .map(_.path).toSet
    val dataDir = new Path(dir, "data")
    if (!f.exists(dataDir)) return Seq.empty
    val it = f.listFiles(dataDir, true)
    val dead = mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile) {
        val rel = s.getPath.toString.stripPrefix(
          f.makeQualified(new Path(dir)).toString).stripPrefix("/")
        // skip writer bookkeeping (_SUCCESS, hidden files) — only data
        // payloads are vacuum candidates
        val name = s.getPath.getName
        if (!referenced.contains(rel) && !name.startsWith(".") &&
            !name.startsWith("_"))
          dead += rel
      }
    }
    dead.foreach(r => f.delete(new Path(dir, r), false))
    dead.toSeq.sorted
  }
}
