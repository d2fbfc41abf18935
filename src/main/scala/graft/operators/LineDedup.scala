package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line/paragraph-level exact dedup across the corpus — the
  * CCNet-style preprocessing step: a line that appears in many
  * documents (boilerplate, headers, license banners) is kept only in
  * its FIRST occurrence (smallest (doc, line_no)) and dropped
  * everywhere else, then documents are reassembled from their
  * surviving lines.
  *
  * Scale shape: one hash-aggregate on the line text chooses each
  * line's keeper (map-side partials collapse repeated boilerplate
  * before the shuffle — the dominant case on web corpora), one
  * co-partitioned join marks survivors, one aggregate per doc
  * reassembles. No windows over the corpus, no driver state.
  */
object LineDedup {

  /** Core: dedup an exploded lines frame (`idCol`, `line_no`, `line`)
    * and reassemble per document with `sep`. Documents whose every
    * line was dropped keep a row with empty text.
    */
  def dedupFromLines(lines: DataFrame, idCol: String, sep: String): DataFrame = {
    val keepers = lines.groupBy("line")
      .agg(min(struct(col(idCol).as("d"), col("line_no").as("n"))).as("__keep"))
    lines.join(keepers, "line")
      .withColumn("__kept",
        col("__keep.d") === col(idCol) && col("__keep.n") === col("line_no"))
      .groupBy(col(idCol))
      .agg(
        // surviving lines, original order
        concat_ws(sep, transform(
          array_sort(collect_list(when(col("__kept"),
            struct(col("line_no"), col("line"))))),
          s => s.getField("line"))).as("clean_text"),
        sum(when(col("__kept"), 1L).otherwise(0L)).cast("bigint").as("n_kept"),
        sum(when(col("__kept"), 0L).otherwise(1L)).cast("bigint").as("n_dropped"))
  }

  /** Split each document into lines on `sep`, keep only first
    * occurrences, reassemble. One row per document:
    * (id, clean_text, n_kept, n_dropped).
    */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 sep: String = "\n"): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), sep)).as(Seq("line_no", "line")))
    dedupFromLines(lines, idCol, sep)
  }

  /** Deterministic "line" derivation for corpora without newlines:
    * fixed `chunkTokens`-token chunks in document order. Exists so the
    * operator has an oracle-checkable contract query on the synthetic
    * corpus; production corpora pass sep="\n" to [[dedupLines]].
    */
  def chunkedLines(df: DataFrame, idCol: String, textCol: String,
                   chunkTokens: Int): DataFrame = {
    val toks = split(col(textCol), " ")
    df.select(col(idCol), toks.as("__toks"))
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(1), ceil(size(col("__toks")).cast("double") / chunkTokens).cast("int")),
          i => concat_ws(" ", slice(col("__toks"), (i - 1) * chunkTokens + 1, lit(chunkTokens)))))
          .as(Seq("line_no", "line")))
  }
}
