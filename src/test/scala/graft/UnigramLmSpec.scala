package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.UnigramLm

/** Unigram-LM tokenizer ([[UnigramLm]]): hand-computed EM step,
  * Viterbi decoding under known probabilities, pruning to the target
  * vocabulary, determinism across partitionings, round-trip
  * reconstruction, UNK-char fallback, save/load identity.
  */
class UnigramLmSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand EM step: corpus 'aa aa b' — seed probs make [a,a] beat " +
      "[aa], so the settled vocabulary is the alphabet") {
    // words: "aa" freq 2, "b" freq 1. Seed counts: a=4, aa=2, b=1
    // (total 7). Viterbi("aa"): [aa] = log(2/7) = -1.2528 vs
    // [a,a] = 2·log(4/7) = -1.1192 → [a,a] wins. Hard-EM counts then
    // concentrate on single chars; "aa" is pruned (count 0).
    val df = Seq((1L, "aa aa b")).toDF("id", "text")
    val m = UnigramLm.train(df, "text", vocabSize = 2)
    assert(m.pieces.map(_._1) == Seq("a", "b"), m.pieces.toString)
    assert(m.encodeWord("aa").toSeq == Seq("a", "a"))
    assert(m.wordsSeen == 2L && m.wordsKept == 2L)
  }

  test("Viterbi prefers a multi-char piece when its probability " +
      "dominates: corpus of repeated 'abab' keeps 'abab' whole") {
    // every word is "abab": the full-word piece survives EM with all
    // the count mass, so Viterbi tokenizes each word as one piece
    val df = (1 to 20).map(i => (i.toLong, "abab")).toDF("id", "text")
    val m = UnigramLm.train(df, "text", vocabSize = 4)
    assert(m.encodeWord("abab").toSeq == Seq("abab"),
      m.pieces.toString)
    val toks = UnigramLm.tokenize(df, "id", "text", m)
      .selectExpr("pieces").as[Seq[String]].collect()
    assert(toks.forall(_ == Seq("abab")))
  }

  test("round-trip: concatenated pieces reconstruct every word; " +
      "single chars are never pruned") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "the lazy dog"),
      (3L, "the the quick dog")).toDF("id", "text")
    val m = UnigramLm.train(docs, "text", vocabSize = 12)
    val chars = "thequickbrownfoxlazydg".toSet
    assert(chars.forall(c => m.scores.contains(c.toString)),
      m.pieces.map(_._1).toString)
    for (w <- Seq("the", "quick", "brown", "fox", "lazy", "dog"))
      assert(m.encodeWord(w).mkString == w)
  }

  test("UNK fallback: an unseen character is emitted as its own piece") {
    val m = UnigramLm.train(Seq((1L, "ab ab")).toDF("id", "text"),
      "text", vocabSize = 3)
    assert(m.encodeWord("axb").toSeq == Seq("a", "x", "b"))
  }

  test("determinism: the same corpus yields the same model under any " +
      "partitioning; tokenization is partition-invariant") {
    val docs = (1 to 60).map(i =>
      (i.toLong, s"alpha bet${i % 3} gamma delta${i % 5} epsilon"))
      .toDF("id", "text")
    val m1 = UnigramLm.train(docs, "text", vocabSize = 30)
    val m2 = UnigramLm.train(docs.repartition(13), "text", vocabSize = 30)
    assert(m1.pieces == m2.pieces)
    val t1 = UnigramLm.tokenize(docs, "id", "text", m1)
      .orderBy("id").selectExpr("pieces").as[Seq[String]].collect().toSeq
    val t2 = UnigramLm.tokenize(docs.repartition(7), "id", "text", m2)
      .orderBy("id").selectExpr("pieces").as[Seq[String]].collect().toSeq
    assert(t1 == t2)
  }

  test("save/load identity") {
    val dir = java.nio.file.Files.createTempDirectory("unigram").toString
    val m = UnigramLm.train(
      Seq((1L, "foo bar foo baz")).toDF("id", "text"), "text",
      vocabSize = 8)
    UnigramLm.save(m, spark, s"$dir/model")
    val back = UnigramLm.load(spark, s"$dir/model")
    assert(back.pieces == m.pieces &&
      back.wordsKept == m.wordsKept && back.wordsSeen == m.wordsSeen)
  }

  test("contract query text_unigram_lm: per-doc piece stats, " +
      "deterministic across runs") {
    val sfDir = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("text_unigram_lm")(spark, sfDir)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val b = SparkEntry.queries("text_unigram_lm")(spark, sfDir)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a.nonEmpty && a == b)
  }
}
