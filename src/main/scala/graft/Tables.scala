package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table loading + deterministic-aggregation helpers shared by every query.
  *
  * Determinism rationale: the correctness gate hash-compares Spark results
  * against DuckDB running the same SQL. Floating-point SUM is
  * order-dependent, and Spark (partitioned, partial-agg) and DuckDB
  * (single-node) sum in different orders. Casting to DECIMAL before
  * aggregating makes the sum exact and order-independent, so both engines
  * produce bit-identical results; the final value is cast back to DOUBLE
  * (optionally rounded) for a stable output schema. This also holds on a
  * 1000-executor cluster — decimal sums commute, so partial aggregation and
  * AQE re-planning never change the answer.
  */
object Tables {

  /** All driver-provided tables (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table from the scale-factor directory. */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's TimestampType (micros) cannot represent directly — the reader
    * throws PARQUET_TYPE_ILLEGAL. We read nanos as raw longs (legacy conf)
    * and truncate to micros with exact integral division (`div`, never
    * double math: ~1.7e18 ns exceeds the 2^53 exact-double range). DuckDB's
    * CAST(ns AS TIMESTAMP) truncates identically, keeping oracles bit-exact.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Exact-arithmetic view of a double column: DECIMAL(18,4).
    * 4 fractional digits cover every value in the fixtures (money with 2
    * decimals, rates with 2). Sums of DECIMAL are exact => order-independent.
    */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Order-independent SUM of a double column, emitted as DOUBLE. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Order-independent SUM rounded to `scale` places, emitted as DOUBLE. */
  def dsumr(c: Column, scale: Int = 2): Column = round(sum(dec(c)), scale).cast("double")

  /** Deterministic AVG: exact decimal sum -> double, divided by count.
    * Both engines perform the identical single IEEE division. */
  def davg(c: Column, scale: Int = 4): Column =
    round(sum(dec(c)).cast("double") / count(lit(1)), scale)
}
