package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC sink honoring the reference's table-as-directory contract.
  *
  * Reference behavior (K1-K5, SURVEY.md §2.2): each table becomes a
  * directory of ORC part files (`/root/reference/data_to_orc_converter.sh:
  * 226-245`; README.md:174-189 "All part files in a directory make up one
  * table"). Spark's `df.write.orc(dir)` produces exactly that layout
  * natively — one file per task — so multi-part output falls out of the
  * execution model instead of a driver-side chunk loop.
  *
  * Codecs: snappy (default) / zlib / none from the reference prompt
  * (sh:168-169) plus lzo and zstd declared in README.md:241-245 — all
  * supported by Spark's ORC writer, including the LZO the reference never
  * actually wired up (SURVEY.md §2.8).
  *
  * Scale posture: `maxRecordsPerFile` bounds part size (the analogue of the
  * reference's CHUNK_SIZE, honored for real here); writes stream through
  * executors so a 100 TB table never concentrates on one node.
  */
object OrcSink {

  val SupportedCodecs: Set[String] = Set("none", "snappy", "zlib", "lzo", "zstd", "lz4")

  final case class WriteReport(table: String, dir: String, rows: Long, files: Int)

  /** Write `df` as `outDir/<table>/part-*.orc`. */
  def write(df: DataFrame, outDir: String, table: String,
            compression: String = "snappy",
            maxRecordsPerFile: Long = 0L): WriteReport = {
    val codec = compression.toLowerCase
    require(SupportedCodecs.contains(codec), s"unsupported ORC codec: $compression")
    val dir = s"$outDir/$table"
    val writer = df.write.mode("overwrite").option("compression", codec)
    val w = if (maxRecordsPerFile > 0) writer.option("maxRecordsPerFile", maxRecordsPerFile)
            else writer
    w.orc(dir)
    verify(df.sparkSession, dir, table)
  }

  /** Post-write verification (reference sh:556-566): output exists, has
    * .orc part files, and reads back. Count comes from ORC metadata (no
    * full scan). */
  def verify(spark: SparkSession, dir: String, table: String): WriteReport = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"output dir missing: $dir")
    val orcFiles = fs.listStatus(p).count(_.getPath.getName.endsWith(".orc"))
    require(orcFiles > 0, s"no .orc part files in $dir")
    val rows = spark.read.orc(dir).count()
    WriteReport(table, dir, rows, orcFiles)
  }

  /** Read a table directory back (README.md:189 contract: the directory IS
    * the table; the reader merges part files). */
  def read(spark: SparkSession, dir: String): DataFrame = spark.read.orc(dir)
}
