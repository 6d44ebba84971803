package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint verification — the Deequ-style
  * expectation suite a 100 TB ingest runs before publishing a snapshot
  * (the reference converter verifies only row counts after export,
  * data_to_orc_converter.sh:249; this is the beyond-reference audit layer
  * a real lake needs on top of it).
  *
  * Scale shape, by construction:
  *   - Every ROW-LOCAL check (null, set-membership, range, regex, row
  *     count) compiles into ONE conditional-count aggregate over ONE scan
  *     of the table — adding a check adds a column to the aggregate, not
  *     a pass over the data. Partials combine map-side; the result is a
  *     single row exploded into a #checks-row frame.
  *   - [[Expectations.Unique]] is one hash aggregation per key set
  *     (map-side partial on the key), counting rows in excess of one per
  *     key — never a self-join.
  *   - [[Expectations.ForeignKey]] is a left-anti join against the
  *     DISTINCT reference keys; dimension-sized refs broadcast (the
  *     default), fact-sized refs take the shuffled anti-join.
  *   - The returned frame is lazy and #checks rows tall; nothing ever
  *     reaches the driver until the caller acts on it.
  *
  * Violation counts are exact BIGINTs: `violations = 0` IS the pass
  * verdict, so the frame is reproducible bit-for-bit on any cluster
  * size and hash-comparable across engines. NULL handling is explicit:
  * value-shape checks (set/range/regex) skip NULLs — [[NotNull]] is the
  * dedicated null check — so each constraint isolates one failure mode
  * and suites compose without double counting.
  */
object Expectations {

  sealed trait Check { def label: String }

  /** Violations = rows where `column` IS NULL. */
  final case class NotNull(column: String) extends Check {
    def label = s"not_null($column)"
  }

  /** Violations = non-null rows whose value is outside `values`. */
  final case class InSet(column: String, values: Seq[String]) extends Check {
    def label = s"in_set($column)"
  }

  /** Violations = non-null rows with value < lo or > hi (inclusive bounds
    * pass). */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Check {
    def label = s"in_range($column)"
  }

  /** Violations = non-null rows whose value does NOT match `regex`
    * (Java regex, unanchored — anchor explicitly for full-string). */
  final case class MatchesRegex(column: String, regex: String) extends Check {
    def label = s"matches_regex($column)"
  }

  /** Violations = rows in excess of one per key: Σ_{keys with c>1}(c-1).
    * NULL keys group like any other key (a duplicated NULL is still a
    * duplicate). */
  final case class Unique(columns: Seq[String]) extends Check {
    def label = s"unique(${columns.mkString(",")})"
  }

  /** Violations = non-null rows whose `column` has no match in
    * `ref.refColumn` (referential integrity; NULL FKs are [[NotNull]]'s
    * business). `broadcastRef` for dimension-sized reference tables. */
  final case class ForeignKey(column: String, ref: DataFrame,
                              refColumn: String, broadcastRef: Boolean = true)
      extends Check {
    def label = s"foreign_key($column->$refColumn)"
  }

  /** Violations = max(0, n - row count). */
  final case class RowCountAtLeast(n: Long) extends Check {
    def label = s"row_count_at_least($n)"
  }

  /** Evaluate `checks` against `df`. Returns a #checks-row frame
    * (tbl, check_name, violations, passed), one row per check, with
    * `passed = (violations == 0)`. */
  def check(table: String, df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")

    // ---- the one-scan leg: all row-local checks + the row count ------
    val rowLocal: Seq[(String, Column)] = checks.collect {
      case c @ NotNull(f) =>
        c.label -> sum(when(col(f).isNull, 1L).otherwise(0L))
      case c @ InSet(f, vs) =>
        c.label -> sum(when(col(f).isNotNull && !col(f).isin(vs: _*), 1L)
          .otherwise(0L))
      case c @ InRange(f, lo, hi) =>
        c.label -> sum(when(col(f).isNotNull &&
          (col(f) < lit(lo) || col(f) > lit(hi)), 1L).otherwise(0L))
      case c @ MatchesRegex(f, re) =>
        c.label -> sum(when(col(f).isNotNull && !col(f).rlike(re), 1L)
          .otherwise(0L))
    }
    val counters = checks.collect { case c: RowCountAtLeast => c }
    val aggCols = (rowLocal.map { case (l, c) => c.as(l) } :+
      count(lit(1)).as("_row_count"))
    val oneScan: Option[DataFrame] =
      if (rowLocal.isEmpty && counters.isEmpty) None
      else {
        val row = df.agg(aggCols.head, aggCols.tail: _*)
        val entries =
          rowLocal.map { case (l, _) =>
            struct(lit(l).as("check_name"),
              coalesce(col(l), lit(0L)).as("violations"))
          } ++ counters.map { c =>
            struct(lit(c.label).as("check_name"),
              greatest(lit(c.n) - col("_row_count"), lit(0L))
                .as("violations"))
          }
        Some(row.select(explode(array(entries: _*)).as("e"))
          .select(col("e.check_name"), col("e.violations")))
      }

    // ---- per-check legs: uniqueness + referential integrity ----------
    val perCheck: Seq[DataFrame] = checks.collect {
      case c @ Unique(cols) =>
        df.groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("_c"))
          .where(col("_c") > 1)
          .agg(coalesce(sum(col("_c") - 1), lit(0L)).as("violations"))
          .select(lit(c.label).as("check_name"), col("violations"))
      case c @ ForeignKey(f, ref, rf, bcast) =>
        val refKeys0 = ref.select(col(rf).as(f)).distinct()
        val refKeys = if (bcast) broadcast(refKeys0) else refKeys0
        df.where(col(f).isNotNull)
          .join(refKeys, Seq(f), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(c.label).as("check_name"), col("violations"))
    }

    (oneScan.toSeq ++ perCheck)
      .reduce(_ unionAll _)
      .select(lit(table).as("tbl"), col("check_name"),
        col("violations").cast("long").as("violations"),
        (col("violations") === 0L).as("passed"))
  }
}
