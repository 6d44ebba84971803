package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal main (SCALING.md): synthesizes a 10x corpus at
  * /tmp/sf1 from sf0.1 (per-replica bijective character rotations keep
  * each replica's internal near-dup structure exact while cross-replica
  * shingle overlap collapses; embeddings get rotated copies) and measures
  * wall time + total shuffle-write bytes for the four headline
  * dedup/ANN probes at sf0.01 / sf0.1 / sf1 in one session.
  *
  * Run: `sbt "runMain graft.ScaleRehearsal"` — one SCALE line per
  * (dataset, probe). */
object ScaleRehearsal {

  /** Accumulates shuffle write bytes across all stages. */
  private final class ShuffleMeter extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0)
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      bytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables.t

    // ---- synthesize /tmp/sf1 = 10x sf0.1 --------------------------------
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = "/tmp/sf1"
    if (!new java.io.File(s"$sf1/documents.parquet").exists()) {
      val docs = t(spark, sf01, "documents")
      val n = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
      // replica r: doc_id += r*n; bijective vowel rotation per replica keeps
      // each replica's internal near-dup structure intact while cross-replica
      // shingle overlap collapses (distinct char permutations)
      // 10 DISTINCT rotations of a 9-char set (r=0 is the identity):
      // within a replica the map is bijective, so its internal near-dup
      // structure is preserved exactly; across replicas the maps differ,
      // so shingle overlap collapses and the true pair count scales ~10x
      val chars = "aeiounrst"
      val reps = (0 until 10).map { r =>
        val to = chars.drop(r) + chars.take(r)
        docs.select(
          (col("doc_id") + lit(r.toLong * n)).as("doc_id"),
          (if (r == 0) col("text")
           else translate(col("text"), chars + chars.toUpperCase,
             to + to.toUpperCase)).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }
      reps.reduce(_ unionAll _).repartition(32)
        .write.mode("overwrite").parquet(s"$sf1/documents.parquet")
      val emb = t(spark, sf01, "embeddings")
      val m = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
      val embReps = (0 until 10).map { r =>
        emb.select(
          (col("vec_id") + lit(r.toLong * m)).as("vec_id"),
          (if (r == 0) col("embedding")
           else concat(slice(col("embedding"), r + 1, 10000),
             slice(col("embedding"), 1, r))).as("embedding"),
          col("label"))
      }
      embReps.reduce(_ unionAll _).repartition(32)
        .write.mode("overwrite").parquet(s"$sf1/embeddings.parquet")
      println("synthesized /tmp/sf1")
    }

    // ---- probes ---------------------------------------------------------
    import graft.operators.{Dedup, Similarity}
    def probes(d: String): Seq[(String, () => Long)] = Seq(
      "dedup_minhash_full" -> (() =>
        Dedup.minhashVerifiedPairs(t(spark, d, "documents"), "doc_id", "text",
          k = 32, shingleSize = 5, bands = 8, threshold = 0.6).count()),
      "dedup_clusters_full" -> (() =>
        Dedup.connectedComponents(
          Dedup.minhashVerifiedPairs(t(spark, d, "documents"), "doc_id", "text",
            k = 32, shingleSize = 5, bands = 8, threshold = 0.6)).count()),
      "dedup_span_exact" -> (() =>
        Dedup.spanPairs(t(spark, d, "documents"), "doc_id", "text",
          spanTokens = 8).count()),
      "ann_ivf_topk" -> (() =>
        Similarity.ivfTopK(t(spark, d, "embeddings"), "vec_id", "embedding",
          queryIds = _ < 10, k = 5, nCentroids = 16, nProbe = 4).count()),
      "contamination_ngram" -> (() => {
        val docs = t(spark, d, "documents")
        Dedup.spanContaminated(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0),
          "doc_id", "text", spanTokens = 8).count()
      }),
      "quantize_int8" -> (() =>
        Similarity.quantizeInt8(t(spark, d, "embeddings"), "vec_id", "embedding")
          .agg(sum(size(col("codes")))).head().getLong(0))
    )

    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    for (d <- Seq("/root/testdata/sf0.01", sf01, sf1)) {
      // warm
      t(spark, d, "documents").count(); t(spark, d, "embeddings").count()
      for ((name, fn) <- probes(d)) {
        System.gc()
        meter.bytes.set(0)
        val t0 = System.nanoTime()
        val rows = fn()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // listener bus drain
        println(f"SCALE $d $name rows=$rows%d secs=$secs%.2f shuffleMB=${meter.bytes.get / 1e6}%.1f")
      }
    }
    spark.stop()
  }
}
