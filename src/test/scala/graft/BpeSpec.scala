package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"
  def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("BPE training follows the hand-computed merge sequence with deterministic ties") {
    // corpus: "aaab" x2, "aab" x1 (as two docs)
    val df = Seq("aaab aaab", "aab").toDF("text")
    val m = Bpe.train(df, "text", numMerges = 3)
    // pair counts round 1: (a,a)=5, (a,b)=3, (b,</w>)=3 -> merge (a,a)
    // round 2: (aa,a)=2, (a,b)=2, (aa,b)=1, (b,</w>)=3 -> merge (b,</w>)
    // round 3: (aa,a)=2 vs (a,b</w>)=2 tie -> lexicographic picks (a,b</w>)
    assert(m.merges == Seq(("a", "a"), ("b", Bpe.EndOfWord), ("a", "b</w>")))
    assert(m.wordsKept == 2 && m.wordsSeen == 2)
    // encoding applies merges by rank: aaab -> [aa, a, b</w>] -> [aa, ab</w>]
    assert(m.encodeWord("aaab").toSeq == Seq("aa", "ab</w>"))
    assert(m.encodeWord("aab").toSeq == Seq("aa", "b</w>"))
    // unseen word still encodes (merges apply where they can)
    assert(m.encodeWord("ba").toSeq == Seq("b", "a", Bpe.EndOfWord))
  }

  test("BPE training is deterministic across runs and partitionings") {
    val m1 = Bpe.train(docs, "text", numMerges = 30)
    val m2 = Bpe.train(docs.repartition(7), "text", numMerges = 30)
    assert(m1.merges == m2.merges && m1.merges.size == 30)
  }

  test("BPE tokenization round-trips: concatenated tokens reconstruct every word") {
    val model = Bpe.train(docs, "text", numMerges = 40)
    val toks = Bpe.tokenize(docs, "doc_id", "text", model)
    // tokens carry the end-of-word sentinel, so concatenating them
    // must reproduce word1</w>word2</w>... exactly
    val expected = docs.select(col("doc_id"),
      concat_ws("", transform(
        filter(split(col("text"), "\\s+", -1), w => length(w) > 0),
        w => concat(w, lit(Bpe.EndOfWord)))).as("joined"))
    val n = docs.count()
    val matched = toks
      .select(col("doc_id"), concat_ws("", col("tokens")).as("joined"))
      .join(expected, Seq("doc_id", "joined"))
      .count()
    assert(matched == n, s"round-trip failed for ${n - matched} of $n docs")
  }

  test("BPE model save/load round-trips; loaded model tokenizes identically") {
    val model = Bpe.train(docs, "text", numMerges = 25)
    val path = java.nio.file.Files.createTempDirectory("bpe_model").toString
    Bpe.save(model, spark, path)
    val loaded = Bpe.load(spark, path)
    assert(loaded.merges == model.merges)
    assert(loaded.wordsKept == model.wordsKept &&
      loaded.wordsSeen == model.wordsSeen)
    val fresh = Bpe.tokenize(docs, "doc_id", "text", model)
      .select(col("doc_id"), concat_ws(" ", col("tokens")).as("t"))
    val viaLoaded = Bpe.tokenize(docs, "doc_id", "text", loaded)
      .select(col("doc_id"), concat_ws(" ", col("tokens")).as("t"))
    assert(fresh.join(viaLoaded, Seq("doc_id", "t")).count() == docs.count())
  }

  test("text_bpe contract query: counts bounded by words below and chars+words above") {
    val got = graft.queries.TextQueries.bpeTokenize(spark, sfDir)
    val joined = got.join(docs.select(col("doc_id"),
      size(filter(split(col("text"), "\\s+", -1), w => length(w) > 0))
        .cast("long").as("n_words"),
      length(col("text")).cast("long").as("n_chars")), "doc_id")
    val bad = joined.where(col("n_bpe_tokens") < col("n_words") ||
      col("n_bpe_tokens") > col("n_chars") + col("n_words")).count()
    assert(bad == 0)
    assert(got.count() == docs.count())
    // merges actually compress: strictly fewer tokens than raw
    // symbols (chars + one end-of-word per word) in aggregate
    val sums = joined.agg(sum("n_bpe_tokens"), sum("n_chars"), sum("n_words"))
      .as[(Long, Long, Long)].head()
    assert(sums._1 < sums._2 + sums._3,
      s"no compression: ${sums._1} tokens vs ${sums._2 + sums._3} symbols")
  }
}
