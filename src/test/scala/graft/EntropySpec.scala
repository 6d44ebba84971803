package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Entropy

/** Hand-computed Shannon entropy values (following the implementation's
  * round-8-terms-then-decimal-sum arithmetic exactly), degenerate docs,
  * and partitioning invariance. */
class EntropySpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  test("hand-computed entropies") {
    val got = Entropy.signals(Seq(
      (1L, "aaaa"),        // one char symbol, one token: H = 0 both
      (2L, "ab"),          // two equiprobable chars: H = 1 bit
      (3L, "a b"),         // chars {a, ' ', b} uniform over 3
      (4L, ""),            // empty: zeros
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")).orderBy("doc_id").collect()
    assert(got(0) === Row(1L, 4L, 0.0, 1L, 0.0))
    assert(got(1) === Row(2L, 2L, 1.0, 1L, 0.0))
    // per-symbol term r8(1/3 * log2(1/3)) = -0.52832083; H = r6(3 * it)
    assert(got(2) === Row(3L, 3L, 1.584962, 2L, 1.0))
    assert(got(3) === Row(4L, 0L, 0.0, 0L, 0.0))
    assert(got(4) === Row(5L, 0L, 0.0, 0L, 0.0))
  }

  test("repetition lowers token entropy at equal length") {
    val got = Entropy.signals(Seq(
      (1L, "the same thing the same thing the same thing"),
      (2L, "nine distinct words appear once each in here now")
    ).toDF("doc_id", "text")).orderBy("doc_id").collect()
    assert(got(0).getDouble(4) < got(1).getDouble(4))
  }

  test("invariant under input partitioning") {
    val rows = (0L until 100L).map(i => (i, s"doc $i with words " * (1 + (i % 4)).toInt))
    val a = Entropy.signals(rows.toDF("doc_id", "text").repartition(1))
      .orderBy("doc_id").collect()
    val b = Entropy.signals(rows.toDF("doc_id", "text").repartition(7))
      .orderBy("doc_id").collect()
    assert(a === b)
  }
}
