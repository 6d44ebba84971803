package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** XML source leg of the universal-input matrix (reference scope:
  * `/root/reference/data_to_orc_converter.sh` converts MySQL/dump/CSV; XML
  * is a beyond-reference input format completing "universal data" — config
  * exports, sitemaps, and legacy feeds ship as XML).
  *
  * Built on Spark 4's built-in XML datasource (`spark.read.format("xml")`,
  * SPARK-44265 — the former spark-xml package merged into core), so the
  * scan is a distributed file scan: a directory of XML files splits one
  * file per task (records cross line boundaries, so a single file is one
  * split — at 100 TB prefer many files, same caveat as multiLine CSV).
  *
  * Scale posture: pass an explicit `schema` in production — inference
  * reads every file twice and widens types by sampling; with a schema the
  * scan is single-pass and the ORC sink gets exact types.
  */
object XmlSource {

  /** `mode`/`corruptColumn` mirror the CSV source's auditable
    * malformed-row policies (PERMISSIVE / DROPMALFORMED / FAILFAST):
    * with an explicit schema and a corrupt column, rows whose XML fails
    * the schema land with their raw markup in that column instead of
    * silently widening or vanishing — same quarantine contract as
    * [[CsvSource.CsvOptions]]. */
  final case class XmlOptions(
      rowTag: String = "row",
      inferSchema: Boolean = true,
      schema: Option[StructType] = None,
      // nullValue = Some(s) coerces cells equal to s to NULL on read.
      // Default None: a general-purpose converter must NOT silently turn
      // legitimately-empty source strings into NULLs (data-fidelity
      // mutation). Round-trips of [[XmlSource.write]] output pass
      // Some("") — Spark's XML writer emits `<tag/>` for nulls, which
      // reads back as "", so the coercion restores write-side nulls.
      nullValue: Option[String] = None,
      timestampFormat: Option[String] = None,
      mode: String = "PERMISSIVE",
      corruptColumn: Option[String] = None)

  /** Read one XML file or a directory of XML files as one DataFrame. */
  def read(spark: SparkSession, path: String, opts: XmlOptions = XmlOptions()): DataFrame = {
    require(Set("PERMISSIVE", "DROPMALFORMED", "FAILFAST")
      .contains(opts.mode.toUpperCase), s"unsupported XML mode: ${opts.mode}")
    require(opts.corruptColumn.isEmpty || opts.schema.nonEmpty,
      "corruptColumn requires an explicit schema (inference widens " +
        "malformed cells to string instead of flagging them)")
    var r = spark.read.format("xml")
      .option("rowTag", opts.rowTag)
      .option("mode", opts.mode.toUpperCase)
    opts.nullValue.foreach(v => r = r.option("nullValue", v))
    opts.timestampFormat.foreach(f => r = r.option("timestampFormat", f))
    val reader = opts.schema match {
      case Some(sc) => opts.corruptColumn match {
        case Some(c) => r.option("columnNameOfCorruptRecord", c)
          .schema(StructType(sc.fields :+
            org.apache.spark.sql.types.StructField(c,
              org.apache.spark.sql.types.StringType, nullable = true)))
        case None => r.schema(sc)
      }
      case None => r.option("inferSchema", opts.inferSchema)
    }
    reader.load(path)
  }

  /** Write a DataFrame as XML files (fixture/export path; one file per
    * partition, standard distributed write). */
  def write(df: DataFrame, path: String, rowTag: String = "row",
            rootTag: String = "rows"): Unit =
    df.write.format("xml")
      .option("rowTag", rowTag)
      .option("rootTag", rootTag)
      .option("declaration", "version=\"1.0\" encoding=\"UTF-8\"")
      .mode("overwrite")
      .save(path)

  /** Directory expansion mirroring `CsvSource.listInputs`: a file is
    * itself; a directory yields its `*.xml` members (and `*.xml.gz`,
    * which Spark's text-based XML reader decompresses transparently). */
  def listInputs(spark: SparkSession, path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).map(_.getPath)
        .filter { f =>
          val n = f.getName.toLowerCase
          n.endsWith(".xml") || n.endsWith(".xml.gz")
        }
        .map(_.toString).toSeq.sorted
    else Seq(path)
  }
}
