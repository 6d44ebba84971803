package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}

/** Round-10 batch-5 operators: Flesch readability counts/formula,
  * streaming MinHash index maintenance, and the resolution-bucket
  * decode path's dimension fidelity. */
class ReadabilityIngestSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c).head().get(0)

  test("syllableCount: vowel groups, case-insensitive, y counts") {
    assert(one(TextAnalysis.syllableCount(col("t")), "table") === 2L) // a, e
    assert(one(TextAnalysis.syllableCount(col("t")), "KEY") === 1L) // ey group
    assert(one(TextAnalysis.syllableCount(col("t")), "rhythm") === 1L) // y
    assert(one(TextAnalysis.syllableCount(col("t")), "xxzz") === 0L)
    assert(one(TextAnalysis.syllableCount(col("t")), "audio out") === 3L)
  }

  test("sentenceCount: terminal-punctuation runs, floor 1") {
    assert(one(TextAnalysis.sentenceCount(col("t")), "no punctuation here") === 1L)
    assert(one(TextAnalysis.sentenceCount(col("t")), "One. Two! Three?") === 3L)
    assert(one(TextAnalysis.sentenceCount(col("t")), "Wait... what?!") === 2L)
  }

  test("fleschEase: hand-checked formula and null on empty") {
    // "the cat sat." -> words 3, sentences 1, syllables 3
    val fre = one(TextAnalysis.fleschEase(col("t")), "the cat sat.")
      .asInstanceOf[Double]
    val expected = 206.835 - 1.015 * (3.0 / 1.0) - 84.6 * (3.0 / 3.0)
    assert(math.abs(fre - expected) < 1e-12)
    assert(one(TextAnalysis.fleschEase(col("t")), "") === null)
  }

  test("minhashIngestApply: stream-built index serves the direct batch answer") {
    val base = java.nio.file.Files.createTempDirectory("mh_ingest_spec")
    val landing = base.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val mk = (id: Long, text: String, src: String) =>
      (id, text, "en", src, text.length.toLong)
    // corpus: two batches with a planted near-dup of the probe doc
    val b0 = Seq(
      mk(1L, "the quick brown fox jumps over the lazy dog again and again", "a"),
      mk(2L, "completely unrelated text about spark shuffles and exchanges", "a"))
    val b1 = Seq(
      mk(3L, "the quick brown fox jumps over the lazy dog again and AGAIN", "b"),
      mk(4L, "another distinct document mentioning orc stripes and filters", "b"))
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    Seq(b0, b1).zipWithIndex.foreach { case (rows, i) =>
      val stage = base.resolve(s".stage-$i")
      rows.toDF(cols: _*).coalesce(1).write.mode("overwrite")
        .parquet(stage.toString)
      val part = stage.toFile.listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        landing.resolve(s"batch-$i.parquet"))
    }
    val tbl = "graft_mh_ingest_spec"
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    // a killed previous JVM can leave the managed location behind after
    // the catalog entry is gone — remove it or CREATE refuses
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + s"/$tbl")
    val lfs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (lfs.exists(loc)) lfs.delete(loc, true)
    graft.streaming.EventStream.minhashIngestApply(spark,
      landing.toString, tbl, base.resolve("ckpt").toString,
      k = 16, shingleSize = 4, bands = 8)

    val corpus = (b0 ++ b1).toDF(cols: _*)
    val probe = Seq(
      mk(100L, "the quick brown fox jumps over the lazy dog again and again!", "p"))
      .toDF(cols: _*)
    def normalize(df: org.apache.spark.sql.DataFrame) =
      df.select(col("batch_id"), col("corpus_id"), round(col("jaccard"), 4))
        .collect().map(_.toSeq).toSet
    val served = Dedup.nearDupServe(spark, tbl, probe, corpus,
      "doc_id", "text", k = 16, shingleSize = 4, bands = 8, threshold = 0.5)
    val direct = Dedup.incrementalNearDup(probe, corpus,
      "doc_id", "text", k = 16, shingleSize = 4, bands = 8, threshold = 0.5)
    assert(normalize(served) === normalize(direct))
    assert(normalize(served).nonEmpty) // the planted near-dups actually fire
    org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
  }

  test("qualityDriftApply: in-distribution batch scores 0, shifted batch fires") {
    val base = java.nio.file.Files.createTempDirectory("ks_stream_spec")
    val landing = base.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val mk = (id: Long, text: String) => (id, text, "en", "s", text.length.toLong)
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val inDist = (0L until 20L).map(i =>
      mk(i, s"steady mix of plain words number $i keeps quality flat"))
    val shifted = (100L until 120L).map(i =>
      mk(i, "SHOUTING!!! TEXT??? FULL,,, OF;;; PUNCTUATION!!!"))
    Seq(inDist, shifted).zipWithIndex.foreach { case (rows, i) =>
      val stage = base.resolve(s".stage-$i")
      rows.toDF(cols: _*).coalesce(1).write.mode("overwrite")
        .parquet(stage.toString)
      val part = stage.toFile.listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, landing.resolve(s"batch-$i.parquet"))
    }
    // reference distribution == batch 0 exactly, so its D must be 0.0
    val ref = inDist.toDF(cols: _*)
      .select(graft.operators.TextAnalysis.qualityScore(col("text")).as("q"))
      .groupBy(col("q")).agg(count(lit(1)).as("c2"))
    val got = graft.streaming.EventStream.qualityDriftApply(spark,
        landing.toString, ref, base.resolve("ckpt").toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq === Seq(0L, 1L)) // landing order
    assert(got(0)._3 === 0.0)
    assert(got(1)._3 > 0.3, s"shifted batch drift too small: ${got(1)._3}")
    org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
  }

  test("decontamIngestApply: planted benchmark overlap quarantines the right batch") {
    val base = java.nio.file.Files.createTempDirectory("decontam_spec")
    val landing = base.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val mk = (id: Long, text: String) => (id, text, "en", "s", text.length.toLong)
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val clean = Seq(
      mk(1L, "one two three four five six seven eight nine ten eleven"),
      mk(2L, "red orange yellow green blue indigo violet white black gray"))
    val dirty = Seq(
      mk(3L, s"prefix words then $benchText and a suffix tail here"),
      mk(4L, "totally clean document with nothing shared at all today ok"))
    Seq(clean, dirty).zipWithIndex.foreach { case (rows, i) =>
      val stage = base.resolve(s".stage-$i")
      rows.toDF(cols: _*).coalesce(1).write.mode("overwrite")
        .parquet(stage.toString)
      val part = stage.toFile.listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, landing.resolve(s"batch-$i.parquet"))
    }
    val bench = Seq(mk(100L, benchText)).toDF(cols: _*)
    val got = graft.streaming.EventStream.decontamIngestApply(spark,
        landing.toString, bench, spanTokens = 8,
        base.resolve("ckpt").toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((0L, 2L, 0L, 0L), (1L, 2L, 1L, 3L)))
    org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
  }

  test("decontamIngestApply: checkpoint resume processes only NEW deliveries") {
    val base = java.nio.file.Files.createTempDirectory("decontam_resume")
    val landing = base.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val mk = (id: Long, text: String) => (id, text, "en", "s", text.length.toLong)
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    def land(rows: Seq[(Long, String, String, String, Long)], name: String): Unit = {
      val stage = base.resolve(s".stage-$name")
      rows.toDF(cols: _*).coalesce(1).write.mode("overwrite")
        .parquet(stage.toString)
      val part = stage.toFile.listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, landing.resolve(s"$name.parquet"))
    }
    val bench = Seq(mk(100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF(cols: _*)
    val ckpt = base.resolve("ckpt").toString
    land(Seq(mk(1L, "clean words only in this first delivery batch here")), "b0")
    val first = graft.streaming.EventStream.decontamIngestApply(spark,
      landing.toString, bench, spanTokens = 8, ckpt)
    assert(first.collect().map(_.getLong(0)).toSeq === Seq(0L))
    // a later delivery lands; the SAME checkpoint must skip b0 and
    // process only the new file — the crash/restart contract
    land(Seq(mk(2L, "see alpha beta gamma delta epsilon zeta eta theta leak")), "b1")
    val second = graft.streaming.EventStream.decontamIngestApply(spark,
      landing.toString, bench, spanTokens = 8, ckpt)
    val got = second.collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.length === 1 && got.head._2 === 1L) // only the new, flagged batch
    org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
  }

  test("decoded PNG dims drive the aspect buckets exactly") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    val specs = Seq((10L, 12, 4, "wide"), (11L, 4, 12, "tall"),
      (12L, 5, 5, "near_square"), (13L, 6, 5, "wide")) // 6/5 = 1.2 boundary
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val payloads = spark.createDataFrame(
      spark.sparkContext.parallelize(specs.map { case (id, w, h, _) =>
        Row(id, graft.operators.Multimodal.synthPng(w, h, i => i % 256))
      }), schema)
    val aspect = col("width").cast("double") / col("height")
    val got = graft.operators.Multimodal.decodeImageStats(spark, payloads)
      .select(col("doc_id"),
        when(aspect >= 1.2, "wide").when(aspect <= 0.8, "tall")
          .otherwise("near_square").as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === specs.map(s => s._1 -> s._4).toMap)
  }
}
