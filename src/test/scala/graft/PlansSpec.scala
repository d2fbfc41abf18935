package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.cosineSim
import graft.plans.{GraftExtensions, GraftFunctions}

class PlansSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("graft_cosine agrees with the HOF cosine on real float embeddings") {
    GraftFunctions.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = e.select($"vec_id".as("ia"), $"embedding".as("va"))
      .crossJoin(e.select($"vec_id".as("ib"), $"embedding".as("vb")))
      .filter($"ia" < $"ib").limit(500)
    val diff = pairs.select(
        abs(GraftFunctions.cosineFast($"va", $"vb") - cosineSim($"va", $"vb")).as("d"))
      .agg(max($"d")).as[Double].head()
    assert(diff < 1e-12, s"max |fast - hof| = $diff")
  }

  test("graft_cosine handles double arrays, zero norms, and nulls") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)),  // identical → 1.0
      (Array(1.0, 0.0), Array(0.0, 1.0)),            // orthogonal → 0.0
      (Array(0.0, 0.0), Array(1.0, 1.0))             // zero norm → 0.0
    ).toDF("a", "b")
    val got = df.select(GraftFunctions.cosineFast($"a", $"b")).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(got(2) == 0.0)
    // null input → null
    val nulls = df.select(GraftFunctions.cosineFast(lit(null).cast("array<double>"), $"b"))
      .collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("graft_cosine is codegen-compatible (no fallback in evaluation)") {
    GraftFunctions.register(spark)
    // force both codegen and interpreted paths and compare
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    val q = e.select($"vec_id", GraftFunctions.cosineFast($"embedding", $"embedding").as("c"))
    val withCodegen = q.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    withCodegen.values.foreach(v => assert(math.abs(v - 1.0) < 1e-6))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = q.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(interpreted == withCodegen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("graft_normalize composes/folds Unicode per form and preserves ASCII identity") {
    GraftFunctions.register(spark)
    val decomposedE = "e\u0301"    // e + combining acute
    val composedE = "\u00e9"       // precomposed, one codepoint
    val rows = Seq(
      (1L, s"caf$decomposedE"),        // NFC composes to café
      (2L, s"caf$composedE"),          // already NFC
      (3L, "\ufb01le"),              // fi ligature: NFKC folds to fi, NFC keeps
      (4L, "plain ascii stays"),       // fast path: identity
      (5L, null)).toDF("id", "s")
    def norm(form: String) = rows.select($"id",
      GraftFunctions.normalizeFast($"s", form).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val nfc = norm("NFC")
    assert(nfc(1L) == s"caf$composedE" && nfc(2L) == s"caf$composedE",
      "NFC must compose combining sequences")
    assert(nfc(3L) == "\ufb01le", "NFC preserves compatibility ligatures")
    assert(nfc(4L) == "plain ascii stays" && nfc(5L) == null)
    val nfkc = norm("NFKC")
    assert(nfkc(3L) == "file", "NFKC must fold the fi ligature")
    val nfd = norm("NFD")
    assert(nfd(2L) == s"caf$decomposedE", "NFD must decompose")
    // dedup consequence: composed and decomposed hash identically after NFC
    assert(nfc(1L) == nfc(2L))
    val bad = intercept[Exception] {
      rows.select(GraftFunctions.normalizeFast($"s", "NFX")).collect()
    }
    assert(bad.getMessage.contains("NFC/NFD/NFKC/NFKD") ||
      (bad.getCause != null && bad.getCause.getMessage.contains("NFC/NFD/NFKC/NFKD")))
  }

  test("graft_normalize is codegen-compatible (no fallback in evaluation)") {
    GraftFunctions.register(spark)
    val rows = Seq((1L, "café däm"), (2L, "ascii"), (3L, null))
      .toDF("id", "s")
    val q = rows.select($"id", GraftFunctions.normalizeFast($"s", "NFC").as("n"))
    val withCodegen = q.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(withCodegen(1L) == "café däm")
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = q.collect().map(r => (r.getLong(0), r.getString(1))).toMap
      assert(interpreted == withCodegen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("graft_minhash equals the HOF minhash signature on real docs") {
    GraftFunctions.register(spark)
    import graft.functions.{minhashSignature, wordShingles, wsTokens}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", wordShingles(wsTokens($"text"), 3).as("sh"))
    val both = docs.select($"doc_id",
        GraftFunctions.minhashFast($"sh", 32).as("fast"),
        minhashSignature($"sh", 32).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"signature mismatch for doc ${r.getLong(0)}")
    }
  }

  test("graft_simhash equals the HOF simhash on real docs") {
    GraftFunctions.register(spark)
    import graft.functions.{simhash64, wsTokens}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val both = docs.select($"doc_id",
        GraftFunctions.simhashFast(wsTokens($"text")).as("fast"),
        simhash64(wsTokens($"text")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"sketch mismatch for doc ${r.getLong(0)}")
    }
  }

  test("graft_minhash rejects bad inputs") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array(1, 2), 8)").collect()
    }
    assert(e.getMessage.contains("array<string>"))
  }

  test("graft_shingles counts distinct shingles exactly like the HOF pipeline") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    import graft.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val both = docs.select(
      size(GraftFunctions.shingleFast(wsTokens(col("text")), 3)).as("fast_n"),
      size(array_distinct(wordShingles(wsTokens(col("text")), 3))).as("hof_n"),
      GraftFunctions.shingleFast(wsTokens(col("text")), 3).as("hashes"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), "distinct shingle count mismatch")
      val hs = r.getSeq[Long](2)
      assert(hs == hs.sorted && hs.distinct.size == hs.size, "must be sorted distinct")
    }
    // short texts yield empty shingle sets, not descending-seq artifacts
    val empty = spark.sql("SELECT graft_shingles(array('one', 'two'), 3) AS s")
      .collect()(0).getSeq[Long](0)
    assert(empty.isEmpty)
  }

  test("graft_shingle_lookup recovers exactly the wanted windows as strings") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    import graft.functions._
    val df = spark.createDataFrame(Seq(Tuple1("the quick brown fox the quick brown"))).toDF("text")
    val hashes = df.select(GraftFunctions.shingleFast(wsTokens(col("text")), 3).as("h"))
      .collect()(0).getSeq[Long](0)
    // ask for two specific windows: full set round-trips, subset filters
    val all = df.select(GraftFunctions.shingleLookup(wsTokens(col("text")), 3, hashes).as("s"))
      .collect()(0).getSeq[String](0)
    assert(all.toSet == Set("the quick brown", "quick brown fox", "brown fox the", "fox the quick"))
    val wanted = df.select(GraftFunctions.shingleLookup(wsTokens(col("text")), 3,
        hashes.take(1)).as("s"))
      .collect()(0).getSeq[String](0)
    assert(wanted.size == 1 && all.contains(wanted.head))
    // empty candidate set → empty result
    val none = df.select(GraftFunctions.shingleLookup(wsTokens(col("text")), 3, Nil).as("s"))
      .collect()(0).getSeq[String](0)
    assert(none.isEmpty)
  }

  test("graft_cosine is exposed to SQL after registration") {
    // NOTE: building a second SparkSession with .withExtensions in the
    // shared-context test JVM would not apply extensions (and closing
    // it kills the context for parallel suites); the registry path the
    // extension uses at build time is exercised via register() + SQL.
    GraftFunctions.register(spark)
    val one = spark.sql("SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(one - 1.0) < 1e-12)
  }
}
