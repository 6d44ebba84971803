package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, TimestampNTZType, TimestampType}

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

  /** The events fixture's `ts` encoding has drifted across fixture
    * generations — parquet TIMESTAMP(NANOS) in some, TIMESTAMP(micros,
    * NTZ) in others — so we branch on the type the reader actually
    * produces instead of assuming one encoding:
    *
    *   - LongType (TIMESTAMP(NANOS) surfaced as raw longs via the legacy
    *     nanosAsLong conf, which is set pre-read because Spark's
    *     TimestampType cannot represent nanos and would otherwise throw
    *     PARQUET_TYPE_ILLEGAL): truncate to micros with exact integral
    *     division (`div`, never double math: ~1.7e18 ns exceeds the 2^53
    *     exact-double range). DuckDB's CAST(ns AS TIMESTAMP) truncates
    *     identically, keeping oracles bit-exact.
    *   - TimestampNTZType (TIMESTAMP(micros, isAdjustedToUTC=false)):
    *     cast to TimestampType — value-preserving because the session TZ
    *     is pinned UTC everywhere (Verify/Bench/specs).
    *   - TimestampType: already the normalized shape.
    *
    * Any other type fails loudly with the drifted encoding named, so the
    * NEXT fixture regeneration breaks one self-explaining assertion
    * instead of fifteen scattered gates. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    normalizeEventTs(raw)
  }

  /** Normalize an events DataFrame's `ts` column to TimestampType (micros,
    * UTC session TZ) from whichever encoding the fixture carries. Shared by
    * the batch reader above and the streaming reader
    * ([[graft.streaming.EventStream]]) so both paths stay in lockstep. */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events fixture drift: column `ts` read as $other; expected " +
          "INT64 nanos (LongType via nanosAsLong), TIMESTAMP_NTZ micros, " +
          "or TIMESTAMP — extend Tables.normalizeEventTs for the new encoding")
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
