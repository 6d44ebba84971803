package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ThetaSketchAgg
import graft.operators.Profile

/** Pins the theta sketch aggregate: exact mode below nominal entries,
  * partitioning invariance (the retained-hash set is a set property),
  * set-operation correctness on planted overlaps, and estimation-mode
  * accuracy within the gate's fences.
  */
class ThetaSketchSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  test("exact mode below nominal entries: estimates equal exact counts") {
    val df = (0L until 3000L).map(i => ("a", i))
      .toDF("g", "v").withColumn("h", xxhash64(col("v")))
    val sk = df.groupBy("g").agg(ThetaSketchAgg.thetaSketch(col("h")).as("sk"))
      .collect()(0).getAs[Array[Byte]](1)
    assert(ThetaSketchAgg.estimate(sk) === 3000.0)
  }

  test("sketch bytes are partitioning-invariant") {
    val rows = (0L until 10000L).map(i => ("a", i % 6000))
    val mk = (parts: Int) => {
      val df0 = rows.toDF("g", "v").withColumn("h", xxhash64(col("v")))
      val df = if (parts > 1) df0.repartition(parts) else df0
      df.groupBy("g").agg(ThetaSketchAgg.thetaSketch(col("h")).as("sk"))
        .collect()(0).getAs[Array[Byte]](1)
    }
    assert(java.util.Arrays.equals(mk(1), mk(13)))
  }

  test("planted overlap: intersection and union estimates track exact sets") {
    // |A| = 6000, |B| = 6000, |A ∩ B| = 3000 — estimation mode at lgK=12
    val a = (0L until 6000L).map(i => ("a", i))
    val b = (3000L until 9000L).map(i => ("b", i))
    val est = Profile.thetaOverlap(
      (a ++ b).toDF("g", "v").withColumn("h", xxhash64(col("v"))), "g", "h")
      .collect()(0)
    assert(math.abs(est.getDouble(2) - 6000) <= 6000 * 0.025)
    assert(math.abs(est.getDouble(3) - 6000) <= 6000 * 0.025)
    assert(math.abs(est.getDouble(5) - 9000) <= 9000 * 0.025)
    // intersection fence scales with the union (the gate's rule)
    assert(math.abs(est.getDouble(4) - 3000) <= 9000 * 0.025)
  }

  test("pair grid covers every stratum pair in order") {
    val df = Seq(("z", 1L), ("m", 2L), ("a", 3L))
      .toDF("g", "v").withColumn("h", xxhash64(col("v")))
    val pairs = Profile.thetaOverlap(df, "g", "h")
      .select("a", "b").collect().map(r => (r.getString(0), r.getString(1)))
    assert(pairs.toSet === Set(("a", "m"), ("a", "z"), ("m", "z")))
  }

  test("maxGroups dial fails loudly on a high-cardinality group column") {
    // the driver-side O(G^2) pair grid is sized for per-source profiles;
    // a caller grouping by a near-unique key must get the dial error,
    // not a driver blowup
    val df = (0L until 50L).map(i => (s"g$i", i))
      .toDF("g", "v").withColumn("h", xxhash64(col("v")))
    val e = intercept[IllegalArgumentException] {
      Profile.thetaOverlap(df, "g", "h", maxGroups = 10)
    }
    assert(e.getMessage.contains("maxGroups"))
    // raising the dial deliberately restores the grid
    assert(Profile.thetaOverlap(df, "g", "h", maxGroups = 64).count() ===
      50L * 49L / 2L)
  }
}
