package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKPerKey

/** Persisted BM25 inverted index — the build-once / query-many form
  * of [[TextAnalysis.bm25TopK]] (the IvfIndex convention for text
  * retrieval): tokenization, term frequencies, document lengths and
  * document frequencies are all paid at BUILD time; a query reads
  * only the posting partitions its terms hash into.
  *
  * Layout under `dir`:
  *  - `postings/b=<bucket>/` — (term, doc, tf, dl) rows partitioned
  *    by the term-hash bucket. dl is DENORMALIZED into the posting
  *    row (one extra long) so query-time scoring needs NO join
  *    against a corpus-sized doc-length table — the classic inverted
  *    -file design, impact-style.
  *  - `df/b=<bucket>/` — (term, df) per-term document frequencies,
  *    same bucketing.
  *  - `stats/` — one row: (n docs, sumdl) exact integers.
  *
  * Query-time scan cost: the probe terms' buckets only — an `isin`
  * literal filter on the partition column (static pruning,
  * PartitionFilters — the IvfIndex spec contract), then scoring over
  * just those postings with the probe set broadcast. Scores are the
  * EXACT same rational-idf algebra as [[TextAnalysis.bm25TopK]], so
  * the indexed and direct paths are interchangeable bit-for-bit.
  */
object Bm25Index {

  /** Term-hash partition count: the scan-pruning granularity. */
  val Buckets = 64

  private def tokens(c: org.apache.spark.sql.Column) =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  private def bucket(term: org.apache.spark.sql.Column) =
    pmod(xxhash64(term), lit(Buckets.toLong)).cast("int")

  def build(df: DataFrame, idCol: String, textCol: String,
            dir: String): Unit = {
    val toks = df.select(col(idCol).as("doc"),
        explode(tokens(col(textCol))).as("term"))
      .localCheckpoint(true) // feeds tf, dl and the corpus stats
    val tf = toks.groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).cast("bigint").as("tf"))
    val dl = toks.groupBy(col("doc"))
      .agg(count(lit(1)).cast("bigint").as("dl"))
    tf.join(dl, Seq("doc"))
      .withColumn("b", bucket(col("term")))
      .write.mode("overwrite").partitionBy("b").parquet(s"$dir/postings")
    tf.groupBy(col("term")).agg(count(lit(1)).cast("bigint").as("df"))
      .withColumn("b", bucket(col("term")))
      .write.mode("overwrite").partitionBy("b").parquet(s"$dir/df")
    df.agg(count(lit(1)).cast("bigint").as("n")).crossJoin(
        toks.agg(count(lit(1)).cast("bigint").as("sumdl")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Incrementally refresh a saved index with NEW documents (the
    * IvfIndex.refresh convention: append-only — an updated document
    * must arrive under a new id, or rebuild). Every statistic the
    * scorer reads is a SUM over file rows: postings append whole rows
    * (each new doc carries its own dl), per-term df appends delta
    * rows summed at query time, corpus stats append one (n, sumdl)
    * row. A refresh touches only the delta's bucket partitions;
    * partition pruning is unchanged.
    *
    * @return number of delta documents appended
    */
  def refresh(delta: DataFrame, idCol: String, textCol: String,
              dir: String): Long = {
    val toks = delta.select(col(idCol).as("doc"),
        explode(tokens(col(textCol))).as("term"))
      .localCheckpoint(true)
    val tf = toks.groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).cast("bigint").as("tf"))
    val dl = toks.groupBy(col("doc"))
      .agg(count(lit(1)).cast("bigint").as("dl"))
    tf.join(dl, Seq("doc"))
      .withColumn("b", bucket(col("term")))
      .write.mode("append").partitionBy("b").parquet(s"$dir/postings")
    tf.groupBy(col("term")).agg(count(lit(1)).cast("bigint").as("df"))
      .withColumn("b", bucket(col("term")))
      .write.mode("append").partitionBy("b").parquet(s"$dir/df")
    delta.agg(count(lit(1)).cast("bigint").as("n")).crossJoin(
        toks.agg(count(lit(1)).cast("bigint").as("sumdl")))
      .coalesce(1).write.mode("append").parquet(s"$dir/stats")
    delta.count()
  }

  /** Every root directory holding a (postings, df, stats) triple: the
    * base index at `dir` plus any COMPLETE streaming delta roots
    * (`delta/compact_<m>` newest first, then `delta/batch_<i>` past
    * it) written by [[graft.streaming.StreamBm25Refresh]] — the
    * [[IvfIndex.listRoots]] convention. A root is complete when its
    * `stats/_SUCCESS` exists (stats is written LAST in a batch, so a
    * crashed batch is invisible until its replay rewrites it whole).
    */
  private[graft] def listRoots(spark: SparkSession, dir: String): Seq[String] = {
    val deltaPath = new org.apache.hadoop.fs.Path(s"$dir/delta")
    val fs = deltaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def complete(prefix: String): Seq[(Long, String)] =
      if (!fs.exists(deltaPath)) Nil
      else fs.listStatus(deltaPath).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
        .filter(st => fs.exists(
          new org.apache.hadoop.fs.Path(st.getPath, "stats/_SUCCESS")))
        .map(st => st.getPath.getName.stripPrefix(prefix).toLong -> st.getPath.toString)
        .sortBy(_._1)
    val compacts = complete("compact_")
    val floor = compacts.lastOption.map(_._1).getOrElse(-1L)
    val batches = complete("batch_").filter(_._1 > floor)
    (dir +: compacts.lastOption.map(_._2).toSeq) ++ batches.map(_._2)
  }

  /** BM25 top-k over a saved index; == `TextAnalysis.bm25TopK` on the
    * corpus the index was built from plus every streamed delta.
    */
  def query(spark: SparkSession, dir: String,
            queries: Seq[(Long, String)], k: Int = 5,
            k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    val qterms = queries.toDF("query_id", "qtext")
      .select(col("query_id"), explode(tokens(col("qtext"))).as("term"))
      .dropDuplicates("query_id", "term")
      .withColumn("b", bucket(col("term")))
      .localCheckpoint(true)
    // base + complete streaming delta roots; the isin filter below
    // distributes through the union, so EVERY root's scan is pruned
    // to the probe buckets (spec-asserted per root)
    val roots = listRoots(spark, dir)
    def allOf(sub: String): DataFrame =
      roots.map(r => spark.read.parquet(s"$r/$sub")).reduce(_ unionByName _)
    // static partition pruning: probe-term buckets are model-sized
    val probedB = qterms.select("b").distinct().collect().map(_.getInt(0)).toSeq
    val postings = allOf("postings")
      .filter(col("b").isin(probedB: _*))
    val dfreq = allOf("df")
      .filter(col("b").isin(probedB: _*))
    // stats and per-term df are SUMS over file rows so refresh can
    // append deltas without rewriting (exact integers until the one
    // division)
    val stats = allOf("stats")
      .agg(sum(col("n")).cast("bigint").as("ni"),
        sum(col("sumdl")).cast("bigint").as("sumdl"))
      .select(col("ni").cast("double").as("n"),
        (col("sumdl").cast("double") / col("ni").cast("double")).as("avgdl"))
    val k1C = lit(k1); val bC = lit(b)
    // df rows for probe terms only (model-sized) — the bucket-pruned
    // df table still holds every term in those buckets, which at
    // corpus scale is too big to broadcast unfiltered
    val probeDf = dfreq.join(broadcast(qterms.select("term").distinct()),
        Seq("term"))
      .groupBy(col("term")).agg(sum(col("df")).cast("bigint").as("df"))
    val contrib = postings
      .join(broadcast(qterms.select("query_id", "term")), Seq("term"))
      .join(broadcast(probeDf), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("c",
        ((col("n") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))) *
          (col("tf").cast("double") * (k1C + lit(1.0))) /
          (col("tf").cast("double") +
            k1C * (lit(1.0) - bC + bC * col("dl").cast("double") / col("avgdl"))))
    val scored = contrib.groupBy(col("query_id"), col("doc"))
      .agg(round(sum(col("c")), 6).as("bm25"))
    TopKPerKey(scored, Seq("query_id"),
      Seq("bm25" -> true, "doc" -> false), k, rankCol = Some("rank"))
  }
}
