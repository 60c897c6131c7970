package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Document chunking: split long documents into fixed-size token windows
  * with configurable overlap — the step between raw corpus prep
  * ([[DocPrep]]) and sequence packing ([[Sampling.packSequences]]) in an
  * LLM training pipeline (context windows, embedding inputs, retrieval
  * passages all consume chunks, not whole documents).
  *
  * Scale shape: a pure per-row generator — tokenize, compute window
  * starts, `posexplode` a slice per start. No shuffle, no state, no
  * driver involvement; output size is input tokens × (chunkSize/stride)
  * overlap factor, linear in the corpus. The generator runs inside
  * whole-stage codegen (built-in `sequence`/`slice`/`posexplode` only).
  */
object Chunking {

  /** Cut each document's whitespace tokens into windows of `chunkSize`
    * tokens starting every `stride` tokens: starts 0, stride, 2·stride, …
    * while start < n_tokens, window = tokens[start, start+chunkSize).
    * Trailing windows may be shorter than `chunkSize`; empty documents
    * yield no chunks (not an empty chunk). `stride <= chunkSize` keeps
    * windows contiguous-or-overlapping (overlap = chunkSize − stride);
    * `stride == chunkSize` is exact tiling.
    *
    * Output: the id column, `chunk_id` (0-based window ordinal),
    * `n_chunk_tokens`, and `chunk` (the window re-joined with single
    * spaces — whitespace runs are NOT preserved, same normalization as
    * every token-based operator here). */
  def chunkDocuments(docs: DataFrame, idCol: Column, textCol: Column,
                     chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0, s"chunkDocuments: chunkSize=$chunkSize")
    require(stride > 0 && stride <= chunkSize,
      s"chunkDocuments: stride=$stride must be in [1, chunkSize=$chunkSize]")
    docs
      .select(idCol.as("_id"), TextAnalysis.wsTokens(textCol).as("_toks"))
      .filter(size(col("_toks")) > 0)
      .select(col("_id"), col("_toks"),
        posexplode(sequence(lit(0), size(col("_toks")) - 1, lit(stride))))
      .select(col("_id"),
        col("pos").cast("long").as("chunk_id"),
        slice(col("_toks"), col("col") + 1, lit(chunkSize)).as("_win"))
      .select(col("_id"), col("chunk_id"),
        size(col("_win")).cast("long").as("n_chunk_tokens"),
        array_join(col("_win"), " ").as("chunk"))
  }

  /** x41's window geometry, shared with the SQL twin. */
  private[graft] val ChunkSize: Int = 64
  private[graft] val ChunkStride: Int = 48

  /** x41: documents cut into 64-token windows every 48 tokens (16-token
    * overlap). Oracle: the same slicing via UNNEST(range(...)) in DuckDB. */
  def chunkQuery(spark: SparkSession, dir: String): DataFrame =
    chunkDocuments(Tables.load(spark, dir, "documents"),
        col("doc_id"), col("text"), ChunkSize, ChunkStride)
      .withColumnRenamed("_id", "doc_id")
      .orderBy(col("doc_id"), col("chunk_id"))
}
