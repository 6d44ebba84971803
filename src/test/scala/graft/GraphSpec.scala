package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Planted-graph laws for the fixed-point PageRank: closed-form fixed
  * points (regular graphs stay uniform), hub dominance on a star,
  * directed-input symmetrization, mass conservation up to integer-floor
  * dust, and bit-identical results under repartitioning (the property the
  * BIGINT arithmetic exists to guarantee). */
class GraphSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val Scale = 1000000000000L

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Long] =
    Graph.pageRankFixedPoint(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("regular graph: the uniform vector is the fixed point") {
    // triangle (undirected closure makes it 2-regular): every iteration
    // maps rank r to teleport + 85% of r, so all nodes stay equal
    val got = ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(got.size === 3)
    assert(got.values.toSet.size === 1)
    // geometric-series limit: r = tele / (1 - 0.85) = scale/n, so five
    // iterations keep each node within rounding dust of scale/3
    val r0 = Scale / 3
    assert(math.abs(got(1L) - r0) <= 100L)
  }

  test("star hub out-ranks every leaf; leaves are equal by symmetry") {
    val got = ranks((2L to 7L).map(l => (1L, l)))
    val hub = got(1L)
    val leaves = (2L to 7L).map(got)
    assert(leaves.toSet.size === 1)
    assert(hub > leaves.head * 3) // 6 leaves each feed the hub their 85%
  }

  test("directed input is symmetrized: a lone (a,b) edge ranks both") {
    val got = ranks(Seq((10L, 20L)))
    assert(got.keySet === Set(10L, 20L))
    assert(got(10L) === got(20L))
  }

  test("mass conserved up to floor dust") {
    val got = ranks(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)))
    val total = got.values.sum
    // each of 5 iterations loses < 1 unit per (node, div) floor
    assert(total <= Scale && total > Scale - 1000L)
  }

  test("bit-identical on any partitioning of the edge list") {
    val edges = (0L until 200L).map(i => (i % 37, (i * 11) % 37))
      .filter { case (a, b) => a != b }
    val base = ranks(edges)
    val shuffled = Graph.pageRankFixedPoint(
        edges.toDF("src", "dst").repartition(7), "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shuffled === base)
  }
}
