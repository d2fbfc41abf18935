package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamJoinView

class StreamJoinViewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("sjview").toString

  private val a = (1L to 120L).map(k => (k, s"a$k")).toDF("k", "av")
  private val b = (1L to 360L).map(i => (i % 140 + 1, s"b$i")).toDF("k", "bv")

  // independent slicing rules so cross-batch matches dominate
  private def slices(df: org.apache.spark.sql.DataFrame, c: String, salt: Int, n: Int) =
    (0 until n).map(i =>
      df.filter(pmod(xxhash64(col(c), lit(salt)), lit(n)) === i))

  test("streamed join view over 4 batches == one-shot join; arrival skew irrelevant") {
    val root = tmp()
    val aB = slices(a, "av", 7, 4); val bB = slices(b, "bv", 11, 4)
    (0 until 4).foreach { i =>
      // adversarial skew: b's batches arrive in reverse order
      StreamJoinView.applyBatch(spark, aB(i), bB(3 - i), root, i, Seq("k"))
    }
    val got = StreamJoinView.view(spark, root)
      .as[(Long, String, String)].collect().sorted.toSeq
    val want = a.join(b, Seq("k")).as[(Long, String, String)]
      .collect().sorted.toSeq
    assert(got == want && got.nonEmpty)
  }

  test("replayed microbatch reproduces its increment exactly; empty deltas fine") {
    val root = tmp()
    val aB = slices(a, "av", 7, 3); val bB = slices(b, "bv", 11, 3)
    StreamJoinView.applyBatch(spark, aB(0), bB(0), root, 0, Seq("k"))
    StreamJoinView.applyBatch(spark, aB(1), bB(1).limit(0), root, 1, Seq("k"))
    StreamJoinView.applyBatch(spark, aB(2), bB(1), root, 2, Seq("k"))
    val before = StreamJoinView.view(spark, root)
      .as[(Long, String, String)].collect().sorted.toSeq
    // replay batch 1 (e.g. after a crash before its checkpoint commit)
    StreamJoinView.applyBatch(spark, aB(1), bB(1).limit(0), root, 1, Seq("k"))
    val after = StreamJoinView.view(spark, root)
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(after == before)
    // and the view is the join of exactly what arrived
    val want = a.join(bB(0).unionByName(bB(1)), Seq("k"))
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(after == want)
  }

  test("real stream: tagged union stream drives the view via foreachBatch, restart-safe") {
    val work = java.nio.file.Files.createTempDirectory("sjv_stream")
    val root = s"$work/state"
    // one stream carries BOTH sides, tagged (the CDC-topic shape);
    // foreachBatch splits and applies the IVM rule
    val tagged =
      a.withColumn("side", lit("a")).withColumnRenamed("av", "v")
        .unionByName(b.withColumn("side", lit("b")).withColumnRenamed("bv", "v"))
    // three microbatch files, sliced independently of side
    (0 until 3).foreach { i =>
      tagged.filter(pmod(xxhash64(col("v"), lit(13)), lit(3)) === i)
        .coalesce(1).write.parquet(s"$work/in/slice=$i")
    }
    def runStream(): Unit = {
      val stream = spark.readStream.schema(
          tagged.schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$work/in/*")
      val q = stream.writeStream
        .option("checkpointLocation", s"$work/ck")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          StreamJoinView.applyBatch(spark,
            batch.filter(col("side") === "a").select(col("k"), col("v").as("av")),
            batch.filter(col("side") === "b").select(col("k"), col("v").as("bv")),
            root, id, Seq("k"))
        }.start()
      q.processAllAvailable(); q.stop()
    }
    runStream()
    val got = StreamJoinView.view(spark, root)
      .as[(Long, String, String)].collect().sorted.toSeq
    val want = a.join(b, Seq("k")).as[(Long, String, String)]
      .collect().sorted.toSeq
    assert(got == want && got.nonEmpty)
    // restart against the same checkpoint: nothing re-applied
    runStream()
    val after = StreamJoinView.view(spark, root)
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(after == want)
  }

  test("consolidation bounds dir count without changing the view") {
    val root = tmp()
    val aB = slices(a, "av", 7, 9); val bB = slices(b, "bv", 11, 9)
    (0 until 9).foreach { i =>
      StreamJoinView.applyBatch(spark, aB(i), bB(i), root, i, Seq("k"),
        consolidateEvery = 4)
    }
    val got = StreamJoinView.view(spark, root)
      .as[(Long, String, String)].collect().sorted.toSeq
    val want = a.join(b, Seq("k")).as[(Long, String, String)]
      .collect().sorted.toSeq
    assert(got == want)
    val (fs, path) = graft.streaming.BatchDirs.fsOf(spark, s"$root/view")
    val raw = fs.listStatus(path).count(_.getPath.getName.startsWith("batch_"))
    assert(raw <= 5, s"consolidation left $raw raw batch dirs")
  }
}
