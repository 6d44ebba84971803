package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.DataFrame

import graft.sinks.OrcSink

/** Conversion orchestration (reference P1-P5, SURVEY.md §2.5).
  *
  * The reference runs a 4-thread pool over tables with per-table try/except
  * isolation and a success tally (`/root/reference/data_to_orc_converter.sh:
  * 258-278`), plus a declared-but-unwired auto-retry (README.md:52) and
  * PARALLEL_WORKERS env (README.md:161) — both honored for real here.
  *
  * Parallelism model: Spark already parallelizes *within* a table across
  * executors; the driver-side future pool only overlaps independent table
  * pipelines (useful when many small tables would leave the cluster idle).
  * All futures share one SparkSession — Spark schedules their jobs fairly.
  */
object ConversionJob {

  final case class JobConfig(
      outputDir: String,
      compression: String = "snappy", // reference default, sh:168-169
      parallelWorkers: Int = sys.env.get("PARALLEL_WORKERS").flatMap(s => Try(s.toInt).toOption).getOrElse(4),
      maxRecordsPerFile: Long = sys.env.get("CHUNK_SIZE").flatMap(s => Try(s.toLong).toOption).getOrElse(0L),
      retries: Int = 2,
      retryBackoffMs: Long = 1000)

  final case class TableResult(table: String, success: Boolean, rows: Long,
                               files: Int, attempts: Int, error: Option[String])

  final case class JobReport(results: Seq[TableResult]) {
    def successes: Int = results.count(_.success)
    def total: Int = results.size
    /** Reference log shape: "Export completed: n/m tables successful" (sh:275). */
    def summary: String = s"Export completed: $successes/$total tables successful"
  }

  /** Convert named tables (lazy DataFrame thunks) to ORC with per-table
    * isolation + bounded retry. Table order of the report is input order. */
  def run(tables: Seq[(String, () => DataFrame)], cfg: JobConfig): JobReport = {
    val pool = Executors.newFixedThreadPool(math.max(1, cfg.parallelWorkers))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val futures = tables.map { case (name, thunk) =>
        Future(convertOne(name, thunk, cfg))
      }
      val results = futures.map(f => Await.result(f, Duration.Inf))
      val report = JobReport(results)
      log(report.summary)
      report
    } finally pool.shutdown()
  }

  private def convertOne(name: String, thunk: () => DataFrame, cfg: JobConfig): TableResult = {
    var attempt = 0
    var lastError: Option[String] = None
    while (attempt <= cfg.retries) {
      attempt += 1
      Try {
        val df = thunk()
        OrcSink.write(df, cfg.outputDir, name, cfg.compression, cfg.maxRecordsPerFile)
      } match {
        case Success(r) =>
          log(s"Progress $name: ${r.rows}/${r.rows} rows") // reference shape, sh:249
          return TableResult(name, success = true, r.rows, r.files, attempt, None)
        case Failure(e) =>
          lastError = Some(e.getMessage)
          log(s"Error converting $name (attempt $attempt/${cfg.retries + 1}): ${e.getMessage}")
          if (attempt <= cfg.retries) Thread.sleep(cfg.retryBackoffMs * attempt)
      }
    }
    TableResult(name, success = false, 0L, 0, attempt, lastError)
  }

  private def log(msg: String): Unit = {
    val ts = java.time.LocalDateTime.now().format(
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    // Timestamped console shape of the reference logger (sh:22-24).
    println(s"[$ts] $msg")
  }
}
