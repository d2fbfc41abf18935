package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IntervalMerge, Ranking, Similarity}

/** Round-12 second-wave specs: interval coalescing, composite global
  * rank, bounded-window EWMA, curriculum ordering, hard-negative
  * mining.
  */
class Advanced3Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("IntervalMerge.coalesce: hand-built islands, touching vs overlapping") {
    val iv = Seq(
      // key 1: [1,5] [3,8] overlap -> [1,8]w2; [9,10] gap (9 > 8) -> own span
      (1L, 1L, 5L), (1L, 3L, 8L), (1L, 9L, 10L),
      // key 2: [1,4] then [4,6] start==prev end -> NOT strictly after -> merge
      (2L, 1L, 4L), (2L, 4L, 6L),
      // key 3: nested [1,10] contains [2,3] -> one span, prefix-max holds 10
      (3L, 1L, 10L), (3L, 2L, 3L), (3L, 4L, 5L))
      .toDF("k", "s", "e").withColumn("w", lit(1L))
    val got = IntervalMerge.coalesce(iv, "k", "s", "e", "w")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 1L, 8L, 2L), (1L, 9L, 10L, 1L),
      (2L, 1L, 6L, 2L),
      (3L, 1L, 10L, 3L)))
  }

  test("IntervalMerge closure identity: coalesce(coalesce(A) ∪ B) == coalesce(A ∪ B)") {
    val rnd = new scala.util.Random(42)
    val all = (1 to 300).map { i =>
      val s = rnd.nextInt(100).toLong
      (rnd.nextInt(5).toLong, s, s + rnd.nextInt(12).toLong)
    }
    val (a, b) = all.splitAt(150)
    def df(xs: Seq[(Long, Long, Long)]) =
      xs.toDF("k", "s", "e").withColumn("w", lit(1L))
    val direct = IntervalMerge.coalesce(df(all), "k", "s", "e", "w")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val folded = IntervalMerge.coalesce(
      IntervalMerge.coalesce(df(a), "k", "s", "e", "w")
        .toDF("k", "s", "e", "w")
        .unionByName(df(b)),
      "k", "s", "e", "w")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(direct === folded)
  }

  test("Ranking.globalRank composite: lexicographic rank matches a local sort; dup composite refused") {
    val rows = Seq((3L, 1L, 10L), (1L, 2L, 20L), (1L, 1L, 30L),
      (2L, 9L, 40L), (2L, 0L, 50L)).toDF("a", "b", "id")
    val got = Ranking.globalRank(rows, Seq("a", "b"), "r", 3)
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(got === Map(30L -> 1L, 20L -> 2L, 50L -> 3L, 40L -> 4L, 10L -> 5L))
    val dup = Seq((1L, 1L, 1L), (1L, 1L, 2L)).toDF("a", "b", "id")
    val e = intercept[IllegalArgumentException] {
      Ranking.globalRank(dup, Seq("a", "b"), "r", 2).collect()
    }
    assert(e.getMessage.contains("unique"))
  }

  test("q114 EWMA: constant series is flat; 2-step decay matches hand arithmetic") {
    // the query's algebra on a crafted frame: weights 0.9^k over last 20
    val work = java.nio.file.Files.createTempDirectory("ewma")
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    Seq(
      (1L, t(0), 1L, "a", 10.0, ""), (2L, t(1), 1L, "a", 10.0, ""),
      (3L, t(2), 1L, "a", 10.0, ""),
      (4L, t(0), 2L, "a", 1.0, ""), (5L, t(1), 2L, "a", 2.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$work/events.parquet")
    val got = graft.queries.Advanced3.q114Ewma(spark, work.toString)
      .as[(Long, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    // constant user: every ewma is exactly the constant
    assert(got(1L) === 10.0 && got(2L) === 10.0 && got(3L) === 10.0)
    // user 2 second event: (2 + 0.9*1)/(1 + 0.9) = 2.9/1.9
    assert(got(4L) === 1.0)
    assert(got(5L) === BigDecimal(2.9 / 1.9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("text_curriculum: decile sizes within 1, per-bucket seq dense from 1") {
    val cur = graft.queries.Advanced3.textCurriculum(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
    val byBucket = cur.groupBy(_._2).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    assert(byBucket.keySet === (1L to 10L).toSet)
    val sizes = byBucket.values.map(_.size).toSeq
    assert(sizes.max - sizes.min <= 1)
    byBucket.foreach { case (_, seqs) =>
      assert(seqs === (1L to seqs.size.toLong))
    }
    // deterministic: same input, same ordering
    val again = graft.queries.Advanced3.textCurriculum(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
    assert(again.sorted.toSeq === cur.sorted.toSeq)
  }

  test("hard negatives: labels always differ from the query's, ranks follow cosine, parity with a naive filter") {
    val e = graft.sources.TableCatalog.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter($"vec_id" < 10)
    val got = Similarity.hardNegatives(e, q, "vec_id", "embedding", "label", k = 3)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Any]("query_label") !== r.getAs[Any]("negative_label"))
    }
    // per query, rank order == descending cosine
    got.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Double]("cosine")).toSeq ===
        rows.map(_.getAs[Double]("cosine")).sorted(Ordering[Double].reverse).toSeq)
    }
    // parity: the top-1 negative matches the brute-force out-of-label max
    val top1 = got.filter(_.getAs[Long]("rank") == 1L)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("negative_id")).toMap
    val naive = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 1000)
    val labels = e.select($"vec_id", $"label")
    val naiveTop = naive
      .join(labels.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("label", "ql"), "query_id")
      .join(labels.withColumnRenamed("vec_id", "base_id")
        .withColumnRenamed("label", "bl"), "base_id")
      .filter($"ql" =!= $"bl")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
          .orderBy($"cosine".desc, $"base_id")))
      .filter($"rn" === 1)
      .select($"query_id", $"base_id").as[(Long, Long)].collect().toMap
    assert(top1 === naiveTop)
  }
}
