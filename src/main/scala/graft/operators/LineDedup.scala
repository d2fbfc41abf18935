package graft.operators

import java.util.regex.Pattern

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line/paragraph-level exact dedup across the corpus — the
  * CCNet-style preprocessing step: a line that appears in many
  * documents (boilerplate, headers, license banners) is kept only in
  * its FIRST occurrence (smallest (doc, line_no)) and dropped
  * everywhere else, then documents are reassembled from their
  * surviving lines.
  *
  * Scale shape (hash-first, SURVEY §5): every per-line exchange
  * carries only (doc id, line_no, xxhash64(line)) — 8-byte hashes,
  * never line text. Keeper choice is one hash-aggregate on the line
  * hash (map-side partials collapse repeated boilerplate before the
  * shuffle); because the keeper rows ARE the kept (doc, line_no)
  * pairs, the per-doc kept positions come from aggregating the
  * keepers directly — no survivor join back to the lines at all.
  * Dropped counts fall out as size(lines) − n_kept on the doc side.
  * Document text crosses at most ONE exchange: the id-keyed
  * reassembly join, where each doc's line array is indexed by kept
  * position. A 64-bit collision can only merge two distinct lines
  * into one keeper group — acceptable for a dedup filter (the keeper
  * is still a real line of the corpus).
  */
object LineDedup {

  /** Core: dedup documents given as (`idCol`, `linesCol`:
    * array&lt;string&gt;) and reassemble the survivors with `sep`
    * (taken literally). Documents whose every line was dropped keep a
    * row with empty text. Output: (id, clean_text, n_kept, n_dropped).
    */
  def dedupFromLineArrays(docs: DataFrame, idCol: String, linesCol: String,
                          sep: String): DataFrame =
    reassemble(docs, keepers(lineKeys(docs, idCol, linesCol), idCol),
      idCol, linesCol, sep)

  /** (id, line_no, xxhash64(line)) per line — the line string is
    * projected away BEFORE any exchange; everything downstream moves
    * longs only.
    */
  private[graft] def lineKeys(docs: DataFrame, idCol: String,
                              linesCol: String): DataFrame =
    docs
      .select(col(idCol), posexplode(col(linesCol)).as(Seq("line_no", "__line")))
      .select(col(idCol), col("line_no"), xxhash64(col("__line")).as("__lh"))

  /** One row per distinct line hash: its keeper `__keep = (d, n)` =
    * smallest (doc, line_no). Keeper rows ARE the kept positions.
    */
  private[graft] def keepers(keys: DataFrame, idCol: String): DataFrame =
    keys.groupBy("__lh")
      .agg(min(struct(col(idCol).as("d"), col("line_no").as("n"))).as("__keep"))

  /** Rebuild documents from keeper rows: aggregate kept positions per
    * doc, then index each doc's line array. The only text-bearing
    * exchange is the id-keyed join (at small SF the positions side
    * broadcasts and text never shuffles).
    */
  private[graft] def reassemble(docs: DataFrame, keeperRows: DataFrame,
                                idCol: String, linesCol: String,
                                sep: String): DataFrame = {
    val keptNos = keeperRows.groupBy(col("__keep.d").as("__d"))
      .agg(sort_array(collect_list(col("__keep.n"))).as("__kept_nos"))
    docs.join(keptNos, col(idCol) === col("__d"), "left")
      .select(col(idCol),
        concat_ws(sep, transform(coalesce(col("__kept_nos"), array()),
          i => element_at(col(linesCol), i + 1))).as("clean_text"),
        coalesce(size(col("__kept_nos")), lit(0)).cast("bigint").as("n_kept"),
        (size(col(linesCol)) - coalesce(size(col("__kept_nos")), lit(0)))
          .cast("bigint").as("n_dropped"))
  }

  /** Split each document into lines on the LITERAL separator `sep`,
    * keep only first occurrences, reassemble. One row per document:
    * (id, clean_text, n_kept, n_dropped).
    */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 sep: String = "\n"): DataFrame = {
    val docs = df.select(col(idCol),
      split(col(textCol), Pattern.quote(sep)).as("__lines"))
    dedupFromLineArrays(docs, idCol, "__lines", sep)
  }

  /** Deterministic "line" derivation for corpora without newlines:
    * fixed `chunkTokens`-token chunks in document order, as an
    * array&lt;string&gt; column `__lines`. Exists so the operator has
    * an oracle-checkable contract query on the synthetic corpus;
    * production corpora pass sep="\n" to [[dedupLines]].
    */
  def chunkedLines(df: DataFrame, idCol: String, textCol: String,
                   chunkTokens: Int): DataFrame = {
    val toks = split(col(textCol), " ")
    df.select(col(idCol), toks.as("__toks"))
      .select(col(idCol),
        transform(
          sequence(lit(1), ceil(size(col("__toks")).cast("double") / chunkTokens).cast("int")),
          i => concat_ws(" ", slice(col("__toks"), (i - 1) * chunkTokens + 1, lit(chunkTokens))))
          .as("__lines"))
  }
}
