package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Pins the PCA ANN tier: deterministic training (partitioning-invariant,
  * sign-normalized), exact variance recovery on a planted low-rank cloud,
  * serve-equals-train, and shortlist recall on a planted near-duplicate.
  */
class PcaSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  /** 60 vectors in R^6 that vary only along axes 0 and 1 (plus a planted
    * near-dup pair): the top-2 PCA components must span exactly those
    * axes, and a 2-dim projection loses nothing. */
  private def lowRank = {
    val rnd = new scala.util.Random(7)
    val base = (0L until 60L).map { i =>
      val a = rnd.nextGaussian() * 3.0
      val b = rnd.nextGaussian() * 1.5
      (i, Array(a, b, 0.01, -0.02, 0.005, 0.0).map(_.toFloat))
    }
    // planted near-dup of vector 0 at id 100
    val dup = base.head._2.map(x => (x * 1.001f))
    (base :+ ((100L, dup))).toDF("vec_id", "embedding")
  }

  test("training is partitioning-invariant and sign-normalized") {
    val df = lowRank
    val (m1, c1) = Similarity.trainPcaProjection(df, "vec_id", "embedding", 2)
    val (m2, c2) = Similarity.trainPcaProjection(df.repartition(7), "vec_id",
      "embedding", 2)
    assert(m1.toSeq === m2.toSeq)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
    // sign convention: each component's largest-|entry| coordinate is
    // positive, so eigenvector sign flips cannot leak into projections
    c1.foreach { comp =>
      val anchor = comp.indices.maxBy(i => (math.abs(comp(i)), -i))
      assert(comp(anchor) > 0)
    }
  }

  test("top-2 components of a rank-2 cloud span the planted axes") {
    val (_, comps) = Similarity.trainPcaProjection(lowRank, "vec_id",
      "embedding", 2)
    // energy outside axes {0,1} is noise-level for both components
    comps.foreach { comp =>
      val tailEnergy = comp.drop(2).map(x => x * x).sum
      assert(tailEnergy < 1e-4, s"component leaks off the planted axes: $tailEnergy")
    }
  }

  test("pcaTopK finds the planted near-dup at rank 1; serve equals train") {
    val df = lowRank
    val top = Similarity.pcaTopK(df, "vec_id", "embedding",
      queryIds = _ === 0L, k = 3, outDim = 2, shortlist = 10)
    val first = top.orderBy(col("rank")).head()
    assert(first.getAs[Long]("neighbor_id") === 100L)
    assert(first.getAs[Double]("score") > 0.999)
    val (mean, comps) = Similarity.trainPcaProjection(df, "vec_id",
      "embedding", 2)
    val served = Similarity.pcaTopKServe(df, "vec_id", "embedding",
      queryIds = _ === 0L, k = 3, mean = mean, components = comps,
      shortlist = 10)
    assert(served.collect().toSeq === top.collect().toSeq)
  }

  test("projection output width is outDim and is deterministic row-wise") {
    val df = lowRank
    val (mean, comps) = Similarity.trainPcaProjection(df, "vec_id",
      "embedding", 3)
    val proj = Similarity.pcaProject(df, "vec_id", "embedding", mean, comps)
    assert(proj.select(size(col("embedding"))).distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(3))
    val a = proj.orderBy("vec_id").collect().map(_.getSeq[Double](1))
    val b = proj.repartition(5).orderBy("vec_id").collect()
      .map(_.getSeq[Double](1))
    assert(a.toSeq === b.toSeq)
  }
}
