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

  test("whitening equalizes a deliberately anisotropic cloud") {
    import scala.util.Random
    val rnd = new Random(9)
    // axis 0 stretched 10x: raw variances ~100:1; whitening must bring
    // both retained directions to unit variance and kill the covariance
    val rows = (0L until 400L).map { i =>
      val x = rnd.nextGaussian() * 10.0
      val y = rnd.nextGaussian()
      (i, Seq(x, y, x * 0.001 + rnd.nextGaussian() * 0.01))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val (mean, comps, eig) = graft.operators.Similarity.trainPcaWhitening(
      emb, "vec_id", "embedding", outDim = 2)
    assert(eig(0) > 50 * eig(1)) // the stretch is real pre-whitening
    val w = graft.operators.Similarity.whitenProject(
        emb, "vec_id", "embedding", mean, comps, eig)
      .collect().map(_.getSeq[Double](1))
    val n = w.length
    def mom(f: Seq[Double] => Double) = w.map(f).sum / n
    val m0 = mom(_(0)); val m1 = mom(_(1))
    val v0 = mom(v => v(0) * v(0)) - m0 * m0
    val v1 = mom(v => v(1) * v(1)) - m1 * m1
    val c01 = mom(v => v(0) * v(1)) - m0 * m1
    assert(math.abs(v0 - 1.0) < 0.02 && math.abs(v1 - 1.0) < 0.02,
      s"variances $v0 $v1")
    assert(math.abs(c01) < 0.01, s"covariance $c01")
  }
}
