package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GlobalIds

/** Round-10 batch-6 operators: curriculum interleave ordering, the PMI
  * feature table, and the two-sample KS statistic — each checked against
  * an independent in-test computation on synthetic inputs. */
class CurriculumDriftSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  test("curriculum interleave: round-robin by within-bucket rank") {
    // buckets a(4 docs), b(2), c(3): order key (rank, bucket) =>
    // a1 b1 c1 a2 b2 c2 a3 c3 a4
    val docs = Seq(
      ("a", 10L), ("a", 11L), ("a", 12L), ("a", 13L),
      ("b", 20L), ("b", 21L),
      ("c", 30L), ("c", 31L), ("c", 32L)).toDF("bucket", "doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("doc_id"))
    val ranked = docs.withColumn("r", row_number().over(w))
    val ordered = GlobalIds.assign(ranked, Seq(col("r"), col("bucket")),
        "pos", partitions = 3)
      .select(col("doc_id"), col("pos")).collect()
      .sortBy(_.getLong(1)).map(_.getLong(0)).toSeq
    assert(ordered === Seq(10L, 20L, 30L, 11L, 21L, 31L, 12L, 32L, 13L))
  }

  test("PMI: hand-computed contingency table") {
    // 4 docs in s1 (3 contain 'x'), 4 in s2 (1 contains 'x')
    // pmi(x, s1) = ln((3 * 8) / (4 * 4)) = ln(1.5)
    // pmi(x, s2) = ln((1 * 8) / (4 * 4)) = ln(0.5)
    val docs = Seq(
      ("s1", "x a"), ("s1", "x b"), ("s1", "x c"), ("s1", "y d"),
      ("s2", "x a"), ("s2", "y b"), ("s2", "y c"), ("s2", "y d"))
      .toDF("source", "text")
    val padded = concat(lit(" "), col("text"), lit(" "))
    val cells = docs
      .select(col("source"), (instr(padded, " x ") > 0).as("has"))
      .groupBy(col("source"))
      .agg(sum(when(col("has"), 1L).otherwise(0L)).as("n_ts"),
        count(lit(1)).as("n_s"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    val got = cells
      .withColumn("n_t", sum(col("n_ts")).over(wAll))
      .withColumn("n", sum(col("n_s")).over(wAll))
      .select(col("source"),
        round(log((col("n_ts").cast("double") * col("n")) /
          (col("n_t") * col("n_s"))), 6).as("pmi"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("s1") ===
      BigDecimal(math.log(1.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got("s2") ===
      BigDecimal(math.log(0.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("KS distance: identical samples 0, disjoint samples 1, known mixed case") {
    def ks(a: Seq[Double], b: Seq[Double]): Double = {
      val u = (a.map((_, 1)) ++ b.map((_, 2))).toDF("q", "grp")
        .groupBy(col("q"))
        .agg(sum(when(col("grp") === 1, 1L).otherwise(0L)).as("c1"),
          sum(when(col("grp") === 2, 1L).otherwise(0L)).as("c2"))
      val wq = org.apache.spark.sql.expressions.Window.orderBy(col("q"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
      u.withColumn("f1", sum(col("c1")).over(wq) / sum(col("c1")).over(wAll))
        .withColumn("f2", sum(col("c2")).over(wq) / sum(col("c2")).over(wAll))
        .agg(max(abs(col("f1") - col("f2"))))
        .head().getDouble(0)
    }
    assert(ks(Seq(1, 2, 3), Seq(1, 2, 3)) === 0.0)
    assert(ks(Seq(1, 2), Seq(10, 11)) === 1.0)
    // F1 jumps to 1 at 2; F2 is 0 until 3 => D = 1 - 1/3 at q=2? No:
    // samples a={1,2}, b={2,3,4}: at q=1 F=(0.5,0); q=2 (1, 1/3);
    // q=3 (1, 2/3); q=4 (1,1) => D = max(0.5, 2/3, 1/3) = 2/3
    assert(math.abs(ks(Seq(1, 2), Seq(2, 3, 4)) - 2.0 / 3.0) < 1e-12)
  }

  test("KS gate shape: the ECDF windows run over the distinct-score frame") {
    // distinct 4dp quality values bound the window input regardless of
    // corpus size — the invariant the PlanAudit allowance relies on
    val qs = (0 until 5000).map(i => (i % 97) / 100.0)
    val u = qs.toDF("q").groupBy(col("q")).agg(count(lit(1)).as("c"))
    assert(u.count() === 97)
  }
}
