package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Cosine radius search (exact + IVF-probed) and per-language score
  * calibration — round-9 additions. */
class RadiusCalibrateSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val sf = "/root/testdata/sf0.001"

  test("bruteForceRadius returns exactly the >= tau pairs, self excluded") {
    val emb = Tables.t(spark, sf, "embeddings")
    val got = Similarity.bruteForceRadius(emb, "vec_id", "embedding",
      queryIds = _ < 10, minCosine = 0.3)
    // independent replay via cosineNearDupPairs-style manual expression
    val e = emb.select(col("vec_id").as("nid"), col("embedding").cast("array<double>").as("nvec"))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qvec"))
    val want = e.crossJoin(q).filter(col("nid") =!= col("qid"))
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"),
        round(Similarity.cosine(col("qvec"), col("nvec")), 4).as("score"))
      .filter(col("score") >= 0.3)
    assert(got.collect().toSet == want.collect().toSet)
    assert(got.count() > 0, "radius fixture must be non-trivial")
  }

  test("ivfRadius pairs are a subset of brute force; recall within the pinned floor") {
    val emb = Tables.t(spark, sf, "embeddings")
    val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
      nCentroids = 16, lloydIters = 2)
    val exact = Similarity.bruteForceRadius(emb, "vec_id", "embedding",
      queryIds = _ < 10, minCosine = 0.3)
    val approx = Similarity.ivfRadius(emb, "vec_id", "embedding",
      queryIds = _ < 10, minCosine = 0.3, centroids = cents, nProbe = 6)
    val exactSet = exact.collect().toSet
    val approxSet = approx.collect().toSet
    assert(approxSet.subsetOf(exactSet), "IVF radius must be precision-1")
    val n = exactSet.size.toDouble
    val recall = if (n == 0) 1.0 else approxSet.size / n
    info(f"sf0.001 micro recall: $recall%.3f (${approxSet.size}/${exactSet.size})")
    val gate = Similarity.radiusRecallGate(approx, exact, minRecall = 0.5)
    val rows = gate.collect()
    assert(rows.forall(_.getBoolean(2)),
      s"per-query radius recall under floor: ${rows.mkString(", ")}")
  }

  test("pipeline_score_calibrate: per-language top quintile, uniform retention") {
    val out = SparkEntry.queries("pipeline_score_calibrate")(spark, sf)
    val docs = Tables.t(spark, sf, "documents")
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // percent_rank >= 0.8 keeps ~top 20% per language. Tiny languages are
    // excluded from the ratio band: at n=2 percent_rank keeps 1 of 2
    // (retention 0.5) by construction, which is correct behavior but
    // outside any ~0.2 band — the band is only meaningful once the
    // quantile has resolution (ADVICE r9: n > 1 was fixture-brittle).
    for ((lang, n) <- perLang if n >= 5) {
      val k = kept.getOrElse(lang, 0L).toDouble / n
      assert(k > 0.1 && k < 0.35, s"$lang retention $k not ~0.2 (n=$n)")
    }
    // calibrated pct is within [0,1] and the filter respected
    val bad = out.filter(col("pct") < 0.8 || col("pct") > 1.0).count()
    assert(bad == 0)
  }

  test("radius + calibration gates registered with oracles") {
    for (name <- Seq("emb_cosine_radius", "ann_ivf_radius", "pipeline_score_calibrate")) {
      assert(SparkEntry.queries.contains(name), name)
      assert(SparkEntry.oracleSql.contains(name), name)
      assert(SparkEntry.queries(name)(spark, sf).count() > 0, name)
    }
  }
}
