package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixed-width (positional) text files — the mainframe/COBOL-era export
  * format legacy estates still ship (no delimiters; each column owns a
  * byte range). A "universal data" converter meets these in the wild
  * next to CSV and dumps.
  *
  * Both directions are pure codegen'd Column chains over `spark.read
  * .text` / `.write.text`: reading slices each line with `substring` +
  * trim + cast, writing pads each value to its declared width — a
  * map-only pass either way, splittable by line like any text source.
  *
  * Inherent format limits, surfaced honestly rather than papered over:
  * a blank field is indistinguishable from NULL (reads as NULL for
  * non-string types, as the empty string for strings), and a value
  * wider than its column is a WRITE-time error (`raise_error`), never a
  * silent truncation.
  */
object FixedWidthSource {

  /** One column: `width` characters, consumed left to right in spec
    * order (no gaps; add a pad column to skip bytes). `typ` is any
    * castable Spark type ("bigint", "double", "decimal(12,2)", "date",
    * "string", ...). */
  final case class ColSpec(name: String, width: Int, typ: String) {
    require(width > 0, s"column $name: width must be positive")
  }

  /** Parse "name:width:type,name:width:type,..." (the CLI spec syntax;
    * type may itself contain parens/commas inside them, so split on
    * commas OUTSIDE parentheses). */
  def parseSpecs(s: String): Seq[ColSpec] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => parts += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) parts += cur.toString
    parts.toSeq.map { p =>
      p.split(":", 3) match {
        case Array(n, w, t) => ColSpec(n.trim, w.trim.toInt, t.trim)
        case _ => throw new IllegalArgumentException(
          s"bad fixed-width column spec '$p' (want name:width:type)")
      }
    }
  }

  /** Read a fixed-width file/directory as one DataFrame per the specs. */
  def read(spark: SparkSession, path: String, specs: Seq[ColSpec]): DataFrame = {
    require(specs.nonEmpty, "fixed-width read needs at least one column spec")
    var start = 1 // substring is 1-based
    val cols: Seq[Column] = specs.map { cs =>
      val raw = trim(substring(col("value"), start, cs.width))
      start += cs.width
      val typed = cs.typ.toLowerCase match {
        case "string" => raw // blank -> empty string (format-inherent)
        case t => when(raw === "", lit(null)).otherwise(raw).cast(t)
      }
      typed.as(cs.name)
    }
    spark.read.text(path).select(cols: _*)
  }

  /** Write `df` as fixed-width lines per the specs (order and names must
    * match the schema). Values render via cast-to-string (use DECIMAL
    * columns for plain, scale-stable numerics) and pad right; a value
    * wider than its column fails the write loudly. */
  def write(df: DataFrame, path: String, specs: Seq[ColSpec]): Unit = {
    require(specs.map(_.name) == df.columns.toSeq,
      s"specs ${specs.map(_.name)} must match schema ${df.columns.toSeq}")
    val fields = specs.map { cs =>
      val s = coalesce(col(cs.name).cast("string"), lit(""))
      when(length(s) > cs.width,
        raise_error(concat(lit(s"fixed-width overflow in ${cs.name} (w=${cs.width}): "), s)))
        .otherwise(rpad(s, cs.width, " "))
    }
    df.select(concat(fields: _*).as("value")).write.mode("overwrite").text(path)
  }
}
