package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-window document chunking — the standard pre-training step
  * that splits long documents into overlapping fixed-size windows
  * (size tokens, advancing by stride, so consecutive chunks share
  * `size - stride` tokens of context).
  *
  * Everything is per-row narrow work (split → sequence → explode →
  * slice) that runs inside the scan task's codegen stage: no token,
  * chunk, or document ever crosses an exchange, so at 100 TB the
  * operator is pure scan-speed map work with output ≈ input ·
  * (1 + overlap fraction).
  *
  * Chunk starts are 0, stride, 2·stride, … for every start < the
  * document's token count, so tails shorter than `size` are emitted
  * (training pipelines pad or pack them downstream — see
  * [[SequencePack]]).
  */
object Chunking {

  /** Split `textCol` on whitespace and emit one row per chunk:
    * (id, chunk_idx, n_tokens, chunk). `chunk_idx` is 0-based in
    * start order; `n_tokens` is the actual (≤ chunkSize) length.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(stride > 0 && stride <= chunkSize,
      "stride must be in [1, chunkSize] (larger would drop tokens)")
    val id: Column = col(idCol)
    docs
      // null text behaves as empty: split(null) is null and
      // size(null) = -1, which would feed sequence() illegal bounds
      .select(id, split(coalesce(col(textCol), lit("")), "\\s+").as("toks"))
      .withColumn("n_doc", size(col("toks")))
      .select(id, col("toks"), col("n_doc"),
        explode(sequence(lit(0), col("n_doc") - 1, lit(stride))).as("start"))
      .select(id,
        (col("start") / stride).cast("bigint").as("chunk_idx"),
        least(lit(chunkSize), col("n_doc") - col("start")).cast("bigint").as("n_tokens"),
        array_join(slice(col("toks"), col("start") + 1, lit(chunkSize)), " ").as("chunk"))
  }
}
