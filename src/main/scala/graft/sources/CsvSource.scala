package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV source mirroring the reference CSV converter's surface
  * (`/root/reference/data_to_orc_converter.sh:425-527`): a single file or a
  * directory of `*.csv`, custom delimiter, optional header row (positional
  * `_c0.._cN` names when absent, matching pandas `header=None` column
  * numbering, sh:471), and a schema-inference toggle — the reference
  * collected that toggle but never wired it (SURVEY.md §2.8); here it is
  * real (`inferSchema`).
  *
  * Scale posture: Spark's CSV reader is a vectorized, partitioned file scan
  * — a 100 TB directory of CSVs splits across executors by
  * `spark.sql.files.maxPartitionBytes`; schema inference samples instead of
  * reading everything when `samplingRatio` is set.
  */
object CsvSource {

  /** `mode` is Spark's malformed-row policy (PERMISSIVE / DROPMALFORMED
    * / FAILFAST). `schema` + `corruptColumn` make PERMISSIVE *auditable*:
    * with an explicit schema, rows that fail it land with their raw text
    * in the corrupt column (and nulls elsewhere) instead of silently
    * poisoning inferred types — the converter can count, quarantine, or
    * drop them with full accounting. Inference cannot detect
    * malformation (everything widens to string), so the corrupt column
    * requires an explicit schema. */
  final case class CsvOptions(
      delimiter: String = ",",
      hasHeader: Boolean = true,
      inferSchema: Boolean = true,
      nullValue: String = "",
      timestampFormat: Option[String] = None,
      mode: String = "PERMISSIVE",
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      corruptColumn: Option[String] = None,
      // RFC-4180 quoted fields spanning lines. Off by default: multiLine
      // parsing makes each FILE one split (records cross line boundaries,
      // so the scan can't split on newlines) — at 100 TB prefer many
      // files over one giant multiline CSV.
      multiLine: Boolean = false,
      // Spark's default quote-escape is backslash; RFC-4180 writers
      // double the quote instead — pass "\"" for files from Excel,
      // Postgres COPY CSV, and most exporters.
      escape: String = "\\")

  /** Read one CSV file or an entire directory as a single DataFrame. */
  def read(spark: SparkSession, path: String, opts: CsvOptions = CsvOptions()): DataFrame = {
    require(Set("PERMISSIVE", "DROPMALFORMED", "FAILFAST")
      .contains(opts.mode.toUpperCase), s"unsupported CSV mode: ${opts.mode}")
    require(opts.corruptColumn.isEmpty || opts.schema.nonEmpty,
      "corruptColumn requires an explicit schema (inference widens " +
        "malformed cells to string instead of flagging them)")
    var r = spark.read
      .option("sep", opts.delimiter)
      .option("header", opts.hasHeader)
      .option("nullValue", opts.nullValue)
      .option("mode", opts.mode.toUpperCase)
      .option("multiLine", opts.multiLine)
      .option("escape", opts.escape)
    opts.timestampFormat.foreach(f => r = r.option("timestampFormat", f))
    val reader = opts.schema match {
      case Some(sc) => opts.corruptColumn match {
        case Some(c) => r.option("columnNameOfCorruptRecord", c)
          .schema(org.apache.spark.sql.types.StructType(sc.fields :+
            org.apache.spark.sql.types.StructField(c,
              org.apache.spark.sql.types.StringType, nullable = true)))
        case None => r.schema(sc)
      }
      case None => r.option("inferSchema", opts.inferSchema)
    }
    reader.csv(path)
  }

  /** Expand a path to individual CSV inputs, mirroring the reference's
    * file-vs-directory dispatch (sh:449-456): a file is itself; a directory
    * yields its `*.csv` members. Used for the per-input-output contract
    * (K3) where each CSV becomes its own ORC table directory. */
  def listInputs(spark: SparkSession, path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).map(_.getPath)
        .filter { f =>
          val n = f.getName.toLowerCase
          n.endsWith(".csv") || n.endsWith(".csv.gz")
        }
        .map(_.toString).toSeq.sorted
    else Seq(path)
  }

  /** Base name without extension — the reference's output naming unit
    * (`outdir/<basename>.orc`, sh:464-465; here `outdir/<basename>/` since
    * Spark writes table directories — documented divergence, SURVEY §2.2 K3).
    * A compression suffix strips with the format extension, so
    * `data.csv.gz` and `data.csv` share the output name `data`. */
  def baseName(path: String): String = {
    val name0 = new Path(path).getName
    val name = if (name0.toLowerCase.endsWith(".gz"))
      name0.substring(0, name0.length - 3) else name0
    val dot = name.lastIndexOf('.')
    if (dot > 0) name.substring(0, dot) else name
  }

  // --------------------------------------------------------------------
  // Dialect sniffing (`delimiter=auto`)
  // --------------------------------------------------------------------

  /** Count fields on one line for a candidate separator, ignoring
    * separators inside double quotes (RFC-4180 quoting). */
  private[sources] def fieldCount(line: String, sep: Char): Int = {
    var cnt = 1; var inQ = false; var i = 0
    while (i < line.length) {
      val ch = line.charAt(i)
      if (ch == '"') inQ = !inQ
      else if (ch == sep && !inQ) cnt += 1
      i += 1
    }
    cnt
  }

  /** Quote-aware field split (for the header heuristic only — actual
    * parsing stays with Spark's CSV reader). */
  private[sources] def splitFields(line: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQ = false; var i = 0
    while (i < line.length) {
      val ch = line.charAt(i)
      if (ch == '"') inQ = !inQ
      else if (ch == sep && !inQ) { out += sb.toString; sb.clear() }
      else sb.append(ch)
      i += 1
    }
    out += sb.toString
    out.toSeq
  }

  private def looksNumeric(f: String): Boolean =
    f.trim.nonEmpty &&
      f.trim.matches("[-+]?[0-9]*\\.?[0-9]+([eE][-+]?[0-9]+)?")

  /** Detect (delimiter, hasHeader) from a bounded driver-side sample —
    * the `csv.Sniffer`/`sniff_csv` feature a universal converter needs
    * when the upstream system's export dialect is unknown.
    *
    * Delimiter: the candidate on which the most sampled lines agree on
    * one field count > 1 wins (quote-aware counting, so a `;` file whose
    * text cells contain commas is not fooled); ties break by candidate
    * order. Header: the first line is a header when none of its fields
    * look numeric while some later line has a numeric field in SOME
    * column — the classic types-differ heuristic; an all-text file with
    * no numeric evidence defaults to header=true (the common case for
    * exported tables). The sample is `maxLines` driver-side lines — KBs,
    * never the file.
    */
  def sniffDialect(spark: SparkSession, path: String, maxLines: Int = 64,
                   candidates: Seq[Char] = Seq(',', ';', '\t', '|'))
      : (String, Boolean) = {
    val lines = spark.read.textFile(path).limit(maxLines).collect()
      .filter(_.nonEmpty)
    require(lines.nonEmpty, s"cannot sniff an empty file: $path")
    val scored = candidates.map { c =>
      val counts = lines.map(l => fieldCount(l, c))
      val (modal, freq) = counts.groupBy(identity).view.mapValues(_.length)
        .maxBy { case (k, v) => (v, k) }
      (c, modal, if (modal > 1) freq else 0)
    }
    val (sep, _, freq) = scored.maxBy { case (_, m, f) => (f, m) }
    require(freq > 0,
      s"no delimiter candidate splits $path into more than one column " +
        s"(tried ${candidates.mkString("'", "', '", "'")})")
    val head = splitFields(lines.head, sep)
    val headerNumeric = head.exists(looksNumeric)
    val bodyNumeric = lines.drop(1)
      .exists(l => splitFields(l, sep).exists(looksNumeric))
    val hasHeader = !headerNumeric && (bodyNumeric || lines.length == 1 || {
      // no numeric evidence anywhere: default to header=true
      !lines.drop(1).exists(l => splitFields(l, sep).exists(looksNumeric))
    })
    (sep.toString, hasHeader)
  }
}
