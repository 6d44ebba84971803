package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Round-10 batch-11: PMI collocations, langid confusion, and streaming
  * cluster-balanced admission. */
class CollocationRouteSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  test("collocation PMI: hand-computed two-phrase corpus") {
    // "a b" appears 3 times, "c d" once; unigrams a:3 b:3 c:1 d:1, Nu=8,
    // bigrams: per doc "a b", so bigram counts: a-b:3, b-a? docs are
    // separate rows so no cross-doc bigrams. Nb = 4.
    val docs = Seq("a b", "a b", "a b", "c d").toDF("text")
    val toks = split(TextAnalysis.normText(col("text")), " ")
    val d2 = docs.select(toks.as("toks")).filter(size(col("toks")) >= 2)
    val uniToks = d2.select(explode(col("toks")).as("w"))
    val uni = uniToks.groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val nu = uniToks.agg(count(lit(1)).as("nu"))
    val bi = d2.select(explode(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => struct(element_at(col("toks"), i).as("x"),
          element_at(col("toks"), i + 1).as("y")))).as("b"))
      .select(col("b.x").as("x"), col("b.y").as("y"))
    val b = bi.groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
    val nb = bi.agg(count(lit(1)).as("nb"))
    // pmi(a,b) = ln((3/4) / ((3/8)*(3/8))) = ln(16/3)
    // pmi(c,d) = ln((1/4) / ((1/8)*(1/8))) = ln(16)
    val byPair = b.join(uni.select(col("w").as("x"), col("cw").as("cx")), "x")
      .join(uni.select(col("w").as("y"), col("cw").as("cy")), "y")
      .crossJoin(nu).crossJoin(nb)
      .select(col("x"), col("y"),
        log((col("cxy").cast("double") / col("nb")) /
          ((col("cx").cast("double") / col("nu")) *
            (col("cy").cast("double") / col("nu")))).as("pmi"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(math.abs(byPair(("a", "b")) - math.log(16.0 / 3)) < 1e-12)
    assert(math.abs(byPair(("c", "d")) - math.log(16.0)) < 1e-12)
    // rarer-but-exclusive pair scores HIGHER pmi — the hub discount
    assert(byPair(("c", "d")) > byPair(("a", "b")))
  }

  test("langid confusion: exposes the fixture's label/content mismatch") {
    // The audit's whole point: the fixture's `lang` column is synthetic
    // metadata while every text is the same English-vocabulary word
    // salad — so the matrix must show predictions confined to {en, und}
    // for EVERY label, with labeled-English rows predominantly detected
    // as English. A classifier change that starts hallucinating other
    // languages on this content breaks the containment.
    val got = SparkEntry.queries("text_lang_confusion")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.map(_._2).toSet.subsetOf(Set("en", "und")))
    val enRows = got.filter(_._1 == "en")
    val enDetected = enRows.filter(_._2 == "en").map(_._3).sum.toDouble
    assert(enDetected / enRows.map(_._3).sum > 0.6)
  }

  test("clusterRouteApply: cap arithmetic across ordered batches") {
    val base = java.nio.file.Files.createTempDirectory("route_spec")
    val landing = base.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    // one cluster direction; batches of 4, 3, 2 vectors -> cap 5 admits
    // 4, then 1, then 0
    val mkRows = (ids: Seq[Long]) =>
      ids.map(i => (i, Seq(1.0f, 0.0f), 0))
    Seq(mkRows(0L to 3L), mkRows(10L to 12L), mkRows(20L to 21L))
      .zipWithIndex.foreach { case (rows, i) =>
        val stage = base.resolve(s".stage-$i")
        rows.toDF("vec_id", "embedding", "label")
          .coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val part = stage.toFile.listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          landing.resolve(s"batch-$i.parquet"))
      }
    val got = graft.streaming.EventStream.clusterRouteApply(spark,
        landing.toString, Seq((7L, Seq(1.0, 0.0))), cap = 5,
        base.resolve("ckpt").toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((0L, 7L, 4L, 4L), (1L, 7L, 3L, 1L),
      (2L, 7L, 2L, 0L)))
    org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
  }
}
