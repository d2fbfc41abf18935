package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared candidate-generation core of the streaming banded
  * near-dup operators ([[StreamNearDedup]] for text MinHash+LSH,
  * [[StreamPhashDedup]] for image perceptual hashes): band-bucket
  * equi-joins under a skew cap, a signature-agreement residual, and
  * the first-arrival-wins drop rule.
  *
  * Postings schema (both batch and prior state): `(doc, band, bh,
  * sig, ...)` — `bh` is the band's bucket hash, `sig` whatever the
  * operator's `similar` predicate compares (an array of minhashes, a
  * 64-bit pHash). Buckets with more members than `maxBucketSize` are
  * skipped on BOTH sides — a degenerate stream of identical content
  * must not go quadratic in one bucket (the batch operators' cap,
  * applied streaming).
  */
private[streaming] object BandedDedup {

  /** Docs of `posts` to DROP: those similar to an earlier-id doc in
    * the same batch (within-batch rule) or to any prior KEPT doc
    * (cross-batch rule). `similar(sigA, sigB)` is the exact residual
    * check applied to co-bucketed candidates.
    */
  def droppedDocs(posts: DataFrame, prior: Option[DataFrame],
                  similar: (Column, Column) => Column,
                  maxBucketSize: Int): DataFrame = {
    val underCap = posts.groupBy("band", "bh")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") <= maxBucketSize)
      .select("band", "bh")
    val capped = posts.join(underCap, Seq("band", "bh"))

    val a = capped.select(col("band"), col("bh"),
      col("doc").as("doc_a"), col("sig").as("sig_a"))
    val b = capped.select(col("band"), col("bh"),
      col("doc").as("doc_b"), col("sig").as("sig_b"))
    val batchDropped = a.join(b, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(similar(col("sig_a"), col("sig_b")))
      .select(col("doc_b").as("doc")).distinct()

    (prior match {
      case Some(pr) =>
        val priorUnderCap = pr.groupBy("band", "bh")
          .agg(count(lit(1)).as("hcnt"))
          .filter(col("hcnt") <= maxBucketSize)
          .select("band", "bh")
        capped.join(
            pr.join(priorUnderCap, Seq("band", "bh"))
              .select(col("band"), col("bh"), col("sig").as("h_sig")),
            Seq("band", "bh"))
          .filter(similar(col("sig"), col("h_sig")))
          .select(col("doc")).distinct()
          .unionByName(batchDropped)
      case None => batchDropped
    }).distinct()
  }
}
