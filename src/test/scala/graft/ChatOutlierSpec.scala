package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, TextAnalysis}

/** Round-10 batch-7: chat/SFT statistics (build-serialize-parse-explode)
  * and the embedding outlier audit. */
class ChatOutlierSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val turnSchema = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType))))

  /** The gate's validation/aggregation stage over a raw conversation
    * JSON column — kept identical to the pipeline_chat_stats tail. */
  private def chatStats(df: org.apache.spark.sql.DataFrame) = {
    df.select(col("doc_id"), from_json(col("conv_json"), turnSchema).as("turns"))
      .select(col("doc_id"), size(col("turns")).as("n_turns"),
        posexplode(col("turns")).as(Seq("pos", "turn")))
      .groupBy(col("doc_id"), col("n_turns"))
      .agg(
        min(col("turn.role") ===
          when(col("pos") % 2 === 0, "user").otherwise("assistant"))
          .as("roles_ok"),
        sum(when(col("turn.role") === "user",
          TextAnalysis.tokenCount(col("turn.content"))).otherwise(0L))
          .as("user_tokens"),
        sum(when(col("turn.role") === "assistant",
          TextAnalysis.tokenCount(col("turn.content"))).otherwise(0L))
          .as("asst_tokens"))
  }

  test("chat stats: 7 tokens over k=3 turns carve 3/2/2 with alternating roles") {
    val json =
      """[{"role":"user","content":"a b c"},
        |{"role":"assistant","content":"d e"},
        |{"role":"user","content":"f g"}]""".stripMargin.replace("\n", "")
    val got = chatStats(Seq((1L, json)).toDF("doc_id", "conv_json")).head()
    assert(got.getInt(1) === 3) // n_turns
    assert(got.getBoolean(2)) // roles_ok
    assert(got.getLong(3) === 5L) // user: 3 + 2
    assert(got.getLong(4) === 2L) // assistant
  }

  test("chat stats: broken alternation is CAUGHT, not smoothed over") {
    val json =
      """[{"role":"user","content":"a"},{"role":"user","content":"b"}]"""
    val got = chatStats(Seq((1L, json)).toDF("doc_id", "conv_json")).head()
    assert(!got.getBoolean(2))
  }

  test("gate construction: chunk carving matches the analytic sizes") {
    // doc_id=7 -> k = 2 + 7%3 = 3; text of 11 tokens -> sizes 4,4,3
    val text = (1 to 11).map(i => s"w$i").mkString(" ")
    val out = LlmQueriesTestHook.chatStatsFor(spark, Seq((7L, text))).head
    assert(out.getInt(1) === 3)
    assert(out.getBoolean(2))
    assert(out.getLong(3) === 4L + 3L) // user turns: sizes 4 and 3
    assert(out.getLong(4) === 4L) // assistant turn: size 4
    assert(out.getDouble(5) === 0.3636) // round(4/11, 4)
  }

  test("outlier audit: orthogonal vector flags, aligned vector does not") {
    val emb = Seq(
      (0L, Seq(1.0, 0.0, 0.0)), // seed
      (1L, Seq(0.9, 0.1, 0.0)), // aligned
      (2L, Seq(0.0, 0.05, 1.0))) // near-orthogonal to the seed
      .toDF("vec_id", "embedding")
    val got = Similarity.assignClusters(emb, "vec_id", "embedding",
        Seq((0L, Seq(1.0, 0.0, 0.0))))
      .withColumn("is_outlier", col("cosine") < 0.15)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got === Map(0L -> false, 1L -> false, 2L -> true))
  }
}

/** Test hook: run the REAL pipeline_chat_stats gate body over an
  * arbitrary (doc_id, text) frame instead of the fixture table. */
object LlmQueriesTestHook {
  def chatStatsFor(spark: org.apache.spark.sql.SparkSession,
                   rows: Seq[(Long, String)]): Array[org.apache.spark.sql.Row] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("chat_hook").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.LlmQueries.queries("pipeline_chat_stats")(spark, dir)
      .collect()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    out
  }
}
