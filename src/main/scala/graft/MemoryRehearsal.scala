package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Constrained-heap child of [[ScaleRehearsal]] (VERDICT r10 item 4):
  * proves the heavy funnels SPILL rather than OOM when execution memory
  * is far under their working set, and that the spilled answers are
  * unchanged. SCALING.md's MEMORY_AND_DISK claim, measured.
  *
  * Run in a JVM whose -Xmx is deliberately small for the probe set (the
  * parent forks `java -Xmx<heapMb>m`): Spark's unified memory manager
  * then forces the hash aggregations (the span family's distinct
  * (doc, window-hash) table is the big one — tens of millions of rows at
  * sf1) to fall back to sort-based spilling, which the task metrics
  * surface as memoryBytesSpilled/diskBytesSpilled. Emits ONE JSON line
  * on stdout and to args(1):
  * {"heap_mb":N,"completed":true,"probes":{name:{rows,secs,spill_mem_mb,
  * spill_disk_mb}},"spill_disk_mb_total":N}
  *
  * Probe set = the three heaviest funnels from the scale ladder, same
  * dials, so the parent can check row-for-row answer equality against
  * its own unconstrained runs. */
object MemoryRehearsal {

  private final class SpillMeter extends SparkListener {
    val mem = new java.util.concurrent.atomic.AtomicLong(0)
    val disk = new java.util.concurrent.atomic.AtomicLong(0)
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      mem.addAndGet(s.stageInfo.taskMetrics.memoryBytesSpilled)
      disk.addAndGet(s.stageInfo.taskMetrics.diskBytesSpilled)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val outPath = args.lift(1).getOrElse("/tmp/memory_rehearsal.json")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the memory-constrained posture: broadcast-hash builds hold the
      // whole build side on-heap and ABORT when it doesn't fit
      // (notEnoughMemoryToBuildAndBroadcastTableError — measured flaky
      // at this heap), while sort-merge paths spill gracefully. An
      // undersized deployment disables broadcast for exactly this
      // reason, and it also maximizes the spill pressure this gate
      // exists to exercise.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables.t
    import graft.operators.{Dedup, Similarity}

    val meter = new SpillMeter
    spark.sparkContext.addSparkListener(meter)

    val probes: Seq[(String, () => Long)] = Seq(
      "dedup_minhash_full" -> (() =>
        Dedup.minhashVerifiedPairs(t(spark, sfDir, "documents"), "doc_id",
          "text", k = 32, shingleSize = 5, bands = 8, threshold = 0.6).count()),
      "dedup_span_scrub" -> (() =>
        Dedup.removeDuplicateSpans(t(spark, sfDir, "documents"), "doc_id",
          "text", spanTokens = 8).agg(sum(col("n_removed"))).head().getLong(0)),
      "ann_ivf_pq" -> (() =>
        Similarity.ivfTopKPq(t(spark, sfDir, "embeddings"), "vec_id",
          "embedding", queryIds = _ < 10, k = 5, nCentroids = 16, nProbe = 4,
          m = 8, ksub = 32,
          shortlist = math.max(60,
            (t(spark, sfDir, "embeddings").count() * 3 / 100).toInt)).count())
    )

    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    val rows = probes.map { case (name, fn) =>
      meter.mem.set(0); meter.disk.set(0)
      val t0 = System.nanoTime()
      val n = fn()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus drain
      (name, n, secs, meter.mem.get / 1e6, meter.disk.get / 1e6)
    }
    val probesJson = rows.map { case (name, n, secs, sm, sd) =>
      f""""$name": {"rows": $n%d, "secs": $secs%.2f, "spill_mem_mb": $sm%.1f, "spill_disk_mb": $sd%.1f}"""
    }.mkString("{", ", ", "}")
    val diskTotal = rows.map(_._5).sum
    val line =
      f"""{"heap_mb": $heapMb%d, "completed": true, "probes": $probesJson, "spill_disk_mb_total": $diskTotal%.1f}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
