package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("salted join equals plain join on a skewed key") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val skewKey = when($"l_orderkey" % 10 < 8, 0L).otherwise($"l_orderkey")
    val facts = li.select($"l_orderkey", $"l_linenumber", skewKey.as("sk"))
    val dims = facts.select($"sk").distinct().withColumn("v", concat(lit("k"), $"sk"))

    val salted = Skew.saltedJoin(facts, dims, "sk",
        factSaltSource = $"l_orderkey" * 10 + $"l_linenumber", saltFactor = 8)
      .select("l_orderkey", "l_linenumber", "v")
      .as[(Long, Int, String)].collect().toSet
    val plain = facts.join(dims, "sk")
      .select("l_orderkey", "l_linenumber", "v")
      .as[(Long, Int, String)].collect().toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("salted join spreads the hot key across salt partitions") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val facts = li.select($"l_orderkey", $"l_linenumber", lit(0L).as("sk"))
    // with one single hot key, the salted fact side must occupy
    // all saltFactor sub-keys (spread is what kills the straggler)
    val saltDist = facts.withColumn("__salt",
        pmod(xxhash64($"l_orderkey" * 10 + $"l_linenumber"), lit(8L)).cast("int"))
      .groupBy("__salt").count().collect()
    assert(saltDist.length == 8, s"hot key must spread over 8 salts, got ${saltDist.length}")
    val counts = saltDist.map(_.getLong(1))
    assert(counts.max < counts.sum, "no single salt may hold everything")
  }

  test("sketch-driven heavy-key detection finds exactly the planted hot keys") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    // plant two hot keys (~40% / ~40%) over a long uniform tail
    val skewKey = when($"l_orderkey" % 10 < 4, 7L)
      .when($"l_orderkey" % 10 < 8, 13L)
      .otherwise($"l_orderkey")
    val facts = li.select($"l_orderkey", $"l_linenumber", skewKey.as("sk"))
    val heavy = Skew.detectHeavyKeys(facts, "sk", fraction = 0.05)
    assert(heavy == Seq("13", "7"), heavy.toString)
    // a uniform key column detects nothing at the same threshold
    val uniform = li.select($"l_orderkey".as("sk"))
    assert(Skew.detectHeavyKeys(uniform, "sk", fraction = 0.05).isEmpty)
  }

  test("adaptive salted join == plain join; only hot-key dims replicate") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val skewKey = when($"l_orderkey" % 10 < 8, 0L).otherwise($"l_orderkey")
    val facts = li.select($"l_orderkey", $"l_linenumber", skewKey.as("sk"))
    val dims = facts.select($"sk").distinct()
      .withColumn("v", concat(lit("k"), $"sk"))
    val adaptive = Skew.adaptiveSaltedJoin(facts, dims, "sk",
        factSaltSource = $"l_orderkey" * 10 + $"l_linenumber", saltFactor = 8)
      .select("l_orderkey", "l_linenumber", "v")
      .as[(Long, Int, String)].collect().toSet
    val plain = facts.join(dims, "sk")
      .select("l_orderkey", "l_linenumber", "v")
      .as[(Long, Int, String)].collect().toSet
    assert(adaptive == plain && adaptive.nonEmpty)
    // replication bound: only |heavy| dim keys pay the saltFactor —
    // blind salting would replicate EVERY dim row 8x
    val heavy = Skew.detectHeavyKeys(facts, "sk", fraction = 0.05)
    assert(heavy == Seq("0"))
    // no heavy keys detected -> degenerates to the plain join
    val uniformFacts = li.select($"l_orderkey", $"l_linenumber",
      $"l_orderkey".as("sk"))
    val uniformDims = uniformFacts.select($"sk").distinct()
      .withColumn("v", concat(lit("u"), $"sk"))
    val a2 = Skew.adaptiveSaltedJoin(uniformFacts, uniformDims, "sk",
        factSaltSource = $"l_orderkey" * 10 + $"l_linenumber")
      .count()
    assert(a2 == uniformFacts.join(uniformDims, "sk").count())
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    // lower AQE's skew thresholds so the tiny local data triggers the
    // same runtime re-plan a 100TB hot key would
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      val skewKey = when($"l_orderkey" % 10 < 8, 0L).otherwise($"l_orderkey")
      // skew splits operate at MAPPER-block granularity: a hot reduce
      // partition fed by a single map task cannot be split, so the
      // single-file scan must fan out to multiple mappers first
      val facts = li.repartition(16).select(skewKey.as("sk"), $"l_quantity")
      // materialize dims so BOTH join children are plain sort-over-
      // shuffle stages: OptimizeSkewedJoin only rewrites that shape
      // (an aggregate between shuffle and join blocks partition
      // replication on that side)
      val dimDir = java.nio.file.Files.createTempDirectory("skewdim").toString
      facts.select($"sk").distinct().withColumn("v", $"sk" * 2)
        .write.mode("overwrite").parquet(dimDir)
      val dims = spark.read.parquet(dimDir)
      val joined = facts.join(dims, "sk")
      joined.collect() // materialize THIS QueryExecution so AQE finalizes it
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.contains("SortMergeJoin(skew=true)"), s"expected AQE skew split:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
