package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for training pipelines: split each document into
  * token-bounded chunks with a fixed-token overlap (sliding stride), the
  * standard pre-tokenization step before packing sequences.
  *
  * Pure `Column` expressions — split/slice/posexplode stay inside
  * whole-stage codegen and need no shuffle at all: a 100 TB documents
  * table chunks in a single embarrassingly-parallel map. Chunk counts and
  * boundaries are pure integer arithmetic on the token count, so the
  * output is deterministic and SQL-mirrorable (the DuckDB oracle computes
  * identical chunks).
  */
object TextChunker {

  /** Chunk `textCol` into windows of `chunkTokens` whitespace tokens with
    * `overlapTokens` shared between consecutive chunks
    * (stride = chunkTokens - overlapTokens). Every document yields at
    * least one (possibly short) chunk. Output:
    * (idCol, chunk_idx, n_chunk_tokens, chunk_text). */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(chunkTokens > overlapTokens && overlapTokens >= 0,
      s"need chunkTokens > overlapTokens >= 0, got ($chunkTokens, $overlapTokens)")
    val stride = chunkTokens - overlapTokens
    val toks: Column = split(TextAnalysis.normText(col(textCol)), " ")
    val n: Column = size(toks)
    // ceil((n - overlap) / stride) chunks, floored at 1 so empty/short
    // docs still emit one chunk
    val nChunks: Column = greatest(
      ceil((n - lit(overlapTokens)).cast("double") / stride).cast("long"), lit(1L))
    df.select(col(idCol), toks.as("toks"), n.as("n"), nChunks.as("nc"))
      .select(col(idCol), col("toks"), col("n"),
        explode(sequence(lit(0L), col("nc") - 1)).as("chunk_idx"))
      .select(
        col(idCol),
        col("chunk_idx"),
        least(lit(chunkTokens.toLong), col("n") - col("chunk_idx") * stride)
          .cast("long").as("n_chunk_tokens"),
        concat_ws(" ",
          slice(col("toks"), (col("chunk_idx") * stride + 1).cast("int"), lit(chunkTokens)))
          .as("chunk_text"))
  }
}
