package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder
import graft.plans.ZValue

class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ---- ZValue expression semantics ----

  test("ZValue interleaves rank-bucket bits (hand-computed Morton codes)") {
    // 2 dims, bits=2: cuts split each dim into buckets {0,1,2,3}
    val cuts = Seq(Array(10.0, 20.0, 30.0), Array(10.0, 20.0, 30.0))
    val zv = ZValue(null, cuts, 2)
    def z(x: Double, y: Double): Long =
      zv.compute(new GenericArrayData(Array[Any](x, y)))
    // bucket(5)=0 bucket(15)=1 bucket(25)=2 bucket(35)=3
    // interleave x→even bits, y→odd bits (dim d at bit i*ndims+d)
    assert(z(5, 5) == 0L)    // (00, 00)
    assert(z(15, 5) == 1L)   // x=01 → bit0
    assert(z(5, 15) == 2L)   // y=01 → bit1
    assert(z(25, 5) == 4L)   // x=10 → bit2
    assert(z(5, 25) == 8L)   // y=10 → bit3
    assert(z(35, 35) == 15L) // (11, 11) → 1111
    // boundary: cut value itself goes UP (bucket = #cuts <= v)
    assert(z(10, 5) == 1L)
    // monotone tile locality: both dims in top bucket → top tile
    assert(z(1e9, 1e9) == 15L)
  }

  test("ZValue null handling: null dim → bucket 0, null array → null, arity checked") {
    val cuts = Seq(Array(10.0), Array(10.0))
    val zv = ZValue(null, cuts, 1)
    assert(zv.compute(new GenericArrayData(Array[Any](null, 15.0))) == 2L)
    assert(zv.nullSafeEval(new GenericArrayData(Array[Any](5.0, 5.0))) == 0L)
    intercept[IllegalArgumentException] {
      zv.compute(new GenericArrayData(Array[Any](5.0)))
    }
  }

  test("ZValue through the column API matches direct compute, survives codegen") {
    val cuts = Seq(Array(500.0), Array(500.0))
    val df = Seq((100.0, 900.0), (900.0, 100.0), (900.0, 900.0))
      .toDF("x", "y")
      .withColumn("z", ZOrder.zvalue(Seq(col("x"), col("y")), cuts, 1))
    assert(df.select("z").as[Long].collect().toSeq == Seq(2L, 1L, 3L))
  }

  test("property: z-values preserve componentwise dominance (u <= v pointwise => z(u) <= z(v))") {
    // the invariant file pruning rests on: a box's min corner cannot
    // out-sort its max corner, so a file's [zmin, zmax] range always
    // brackets the z-values of the points inside its envelope
    def mix(v: Long): Long = {
      var z = v + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    for (ndims <- 2 to 4; bits <- Seq(3, 8)) {
      val cuts = Seq.tabulate(ndims)(d =>
        Array.tabulate((1 << bits) - 1)(i => (i + 1) * (d + 1) * 0.37))
      val zv = ZValue(null, cuts, bits)
      for (case0 <- 0 until 200) {
        val a = Array.tabulate(ndims)(d =>
          java.lang.Math.floorMod(mix(case0 * 31 + d), 4096) * 0.1)
        val b = Array.tabulate(ndims)(d =>
          java.lang.Math.floorMod(mix(case0 * 37 + d + 7), 4096) * 0.1)
        val lo = a.zip(b).map { case (x, y) => math.min(x, y) }
        val hi = a.zip(b).map { case (x, y) => math.max(x, y) }
        val zl = zv.compute(new GenericArrayData(lo.map(_.asInstanceOf[Any])))
        val zh = zv.compute(new GenericArrayData(hi.map(_.asInstanceOf[Any])))
        assert(zl <= zh,
          s"dominance violated: ndims=$ndims bits=$bits case=$case0 " +
            s"lo=${lo.toSeq} hi=${hi.toSeq} zl=$zl zh=$zh")
      }
    }
  }

  // ---- layout quality: multi-dimensional file skipping ----

  test("z-order layout prunes on the non-sort dimension; linear layout cannot") {
    val n = 20000
    // two deterministic, independent, uniform-ish dims in [0, 1000):
    // a full-avalanche mixer, NOT affine scrambles of i (two affine
    // maps mod the same modulus are correlated and an x-sort would
    // accidentally prune y)
    def mix(v: Long): Long = {
      var z = v + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val df = (0 until n).map { i =>
      val x = java.lang.Math.floorMod(mix(i.toLong), 1000)
      val y = java.lang.Math.floorMod(mix(i.toLong + 777777L), 1000)
      (i.toLong, x.toDouble, y.toDouble)
    }.toDF("id", "x", "y")

    val zDir = tmp("zorder")
    val linDir = tmp("linear")
    ZOrder.write(df, Seq("x", "y"), zDir, numFiles = 64, bits = 8)
    // the single-column baseline layout: range-sorted by x only
    df.repartitionByRange(64, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)

    val zFiles = ZOrder.fileStats(spark, zDir, Seq("x", "y")).count()
    val linFiles = ZOrder.fileStats(spark, linDir, Seq("x", "y")).count()
    assert(zFiles >= 32 && linFiles >= 32, s"z=$zFiles lin=$linFiles")

    // filter on y ONLY: linear-by-x layout reads everything, z-order
    // reads only the z-tiles whose y-envelope intersects the band
    val yBox = Seq(("y", 100.0, 199.0))
    val zTouched = ZOrder.filesTouched(spark, zDir, yBox)
    val linTouched = ZOrder.filesTouched(spark, linDir, yBox)
    assert(linTouched >= linFiles * 9 / 10,
      s"x-sorted layout should not prune a y filter: $linTouched/$linFiles")
    assert(zTouched * 2 <= linTouched,
      s"z-order should halve (at least) the y-filter read set: " +
        s"$zTouched vs $linTouched")

    // conjunctive box on both dims: z-order touches a small corner
    val box = Seq(("x", 100.0, 199.0), ("y", 100.0, 199.0))
    val zBox = ZOrder.filesTouched(spark, zDir, box)
    assert(zBox * 4 <= zFiles, s"box read set not local: $zBox/$zFiles")

    // layout never changes content: filtered read == filtered source
    val got = spark.read.parquet(zDir)
      .filter(col("x").between(100.0, 199.0) && col("y").between(100.0, 199.0))
      .select("id").as[Long].collect().toSet
    val want = df
      .filter(col("x").between(100.0, 199.0) && col("y").between(100.0, 199.0))
      .select("id").as[Long].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("skipping index: pruned read == full filtered read, fewer files scanned, stale index refused") {
    val n = 8000
    def mix(v: Long): Long = {
      var z = v + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val df = (0 until n).map { i =>
      val x = java.lang.Math.floorMod(mix(i.toLong), 1000)
      val y = java.lang.Math.floorMod(mix(i.toLong + 55L), 1000)
      (i.toLong, x.toDouble, y.toDouble)
    }.toDF("id", "x", "y")
    val dataDir = tmp("skipdata")
    val idxDir = tmp("skipidx")
    graft.operators.ZOrder.write(df, Seq("x", "y"), dataDir,
      numFiles = 32, bits = 7)
    graft.operators.SkippingIndex.build(spark, dataDir, idxDir, Seq("x", "y"))

    val box = Seq(("x", 200.0, 299.0), ("y", 600.0, 699.0))
    val pruned = graft.operators.SkippingIndex.read(spark, dataDir, idxDir, box)
    val full = spark.read.parquet(dataDir)
      .filter(col("x").between(200.0, 299.0) && col("y").between(600.0, 699.0))
    assert(pruned.select("id").as[Long].collect().toSet ==
      full.select("id").as[Long].collect().toSet)
    assert(pruned.count() > 0)
    val totalFiles = spark.read.parquet(dataDir).inputFiles.length
    assert(pruned.inputFiles.length * 2 <= totalFiles,
      s"${pruned.inputFiles.length}/$totalFiles")

    // empty-box fast path keeps the schema
    val none = graft.operators.SkippingIndex.read(spark, dataDir, idxDir,
      Seq(("x", 5000.0, 6000.0)))
    assert(none.count() == 0 && none.columns.toSeq == Seq("id", "x", "y"))

    // probing an unindexed dimension names the problem
    val eDim = intercept[IllegalArgumentException] {
      graft.operators.SkippingIndex.read(spark, dataDir, idxDir,
        Seq(("zz", 0.0, 1.0)))
    }
    assert(eDim.getMessage.contains("zz") &&
      eDim.getMessage.contains("not in"))

    // appending a file the index never saw must refuse, not skip it
    df.limit(10).write.mode("append").parquet(dataDir)
    val e = intercept[IllegalArgumentException] {
      graft.operators.SkippingIndex.read(spark, dataDir, idxDir, box)
    }
    assert(e.getMessage.contains("stale"))
  }

  test("timestamp dimension: clustering and pruning work on (time, key) layouts") {
    val n = 4000
    val base = 1700000000000L
    val df = (0 until n).map { i =>
      val ts = new java.sql.Timestamp(base + (i % 97) * 3600000L)
      val k = (i.toLong * 48271L) % 1000
      (i.toLong, ts, k.toDouble)
    }.toDF("id", "ts", "k")
    val dir = tmp("ztime")
    graft.operators.ZOrder.write(df, Seq("ts", "k"), dir,
      numFiles = 16, bits = 6)
    assert(spark.read.parquet(dir).count() == n)
    // a time band prunes files even though the key dim is clustered too
    val total = graft.operators.ZOrder.fileStats(spark, dir, Seq("k")).count()
    val loSec = (base + 10 * 3600000L) / 1000.0
    val hiSec = (base + 20 * 3600000L) / 1000.0
    val touched = graft.operators.ZOrder.filesTouched(spark, dir,
      Seq(("ts", loSec, hiSec)))
    assert(touched * 2 <= total, s"$touched/$total")
    // and the time filter returns exactly the right rows
    val got = spark.read.parquet(dir)
      .filter(col("ts").cast("double").between(loSec, hiSec))
      .count()
    val want = df
      .filter(col("ts").cast("double").between(loSec, hiSec))
      .count()
    assert(got == want && got > 0)
  }

  test("skewed dimension: rank buckets keep spreading, layout round-trips") {
    val n = 5000
    // y: 90% constant, 10% spread — value-linear binning would collapse
    val df = (0 until n).map { i =>
      val x = (i.toLong * 48271L) % 1000
      val y = if (i % 10 == 0) (i.toLong * 69621L) % 1000 else 7L
      (i.toLong, x.toDouble, y.toDouble)
    }.toDF("id", "x", "y")
    val dir = tmp("zskew")
    ZOrder.write(df, Seq("x", "y"), dir, numFiles = 16, bits = 6)
    val back = spark.read.parquet(dir)
    assert(back.count() == n)
    // the x dimension still tiles: an x band touches a minority of files
    val total = ZOrder.fileStats(spark, dir, Seq("x")).count()
    val touched = ZOrder.filesTouched(spark, dir, Seq(("x", 0.0, 99.0)))
    assert(touched * 2 <= total, s"$touched/$total")
  }

  test("skipping index: string dimensions prune by lexicographic envelopes") {
    import graft.operators.SkippingIndex
    import graft.operators.SkippingIndex.{NumBound, StrBound}
    val n = 4000
    val df = (0 until n).map { i =>
      val key = f"cat_${(i * 48271) % 26}%02d_$i%05d"
      (i.toLong, key, (i % 100).toDouble)
    }.toDF("id", "skey", "v")
    val dataDir = tmp("zstr")
    // range-lay out by the string key so files carry tight envelopes
    df.repartitionByRange(16, col("skey"))
      .sortWithinPartitions("skey")
      .write.mode("overwrite").parquet(dataDir)
    val idxDir = tmp("zstridx")
    SkippingIndex.build(spark, dataDir, idxDir, Seq("skey", "v"))

    val bounds = Seq(StrBound("skey", "cat_05", "cat_09~"))
    val pruned = SkippingIndex.readBounds(spark, dataDir, idxDir, bounds)
    val full = spark.read.parquet(dataDir)
      .filter(col("skey").between("cat_05", "cat_09~"))
    assert(pruned.select("id").as[Long].collect().toSet ==
      full.select("id").as[Long].collect().toSet)
    assert(pruned.count() > 0)
    val totalFiles = spark.read.parquet(dataDir).inputFiles.length
    assert(pruned.inputFiles.length * 2 <= totalFiles,
      s"${pruned.inputFiles.length}/$totalFiles")

    // mixed string + numeric bounds compose conjunctively
    val both = SkippingIndex.readBounds(spark, dataDir, idxDir,
      bounds :+ NumBound("v", 0.0, 49.0))
    assert(both.select("id").as[Long].collect().toSet ==
      full.filter(col("v").between(0.0, 49.0))
        .select("id").as[Long].collect().toSet)

    // a numeric box on a string dim refuses and points at StrBound
    val eNum = intercept[IllegalArgumentException] {
      SkippingIndex.read(spark, dataDir, idxDir, Seq(("skey", 0.0, 1.0)))
    }
    assert(eNum.getMessage.contains("StrBound"))
    // a string bound on a numeric dim refuses the other way
    val eStr = intercept[IllegalArgumentException] {
      SkippingIndex.readBounds(spark, dataDir, idxDir,
        Seq(StrBound("v", "a", "b")))
    }
    assert(eStr.getMessage.contains("NumBound"))
    // stale refusal unchanged on the string path
    df.limit(5).write.mode("append").parquet(dataDir)
    val eStale = intercept[IllegalArgumentException] {
      SkippingIndex.readBounds(spark, dataDir, idxDir, bounds)
    }
    assert(eStale.getMessage.contains("stale"))
  }

  test("versioned skipping index: compaction re-points; old versions stay pinned") {
    import graft.operators.SkippingIndex
    import graft.operators.SkippingIndex.NumBound
    import graft.sinks.Compaction
    val n = 3000
    val df = (0 until n).map(i => (i.toLong, (i % 500).toDouble)).toDF("id", "x")
    val root = tmp("vzroot")
    val idxRoot = tmp("vzidx")
    val v1 = Compaction.writeVersioned(
      df.repartitionByRange(12, col("x")), root, maxRecordsPerFile = 300)
    assert(SkippingIndex.buildVersioned(spark, root, idxRoot, Seq("x")) == v1)

    val bounds = Seq(NumBound("x", 100.0, 149.0))
    def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
      d.select("id").as[Long].collect().toSet
    val want = ids(Compaction.readCurrent(spark, root)
      .filter(col("x").between(100.0, 149.0)))
    val pruned1 = SkippingIndex.readVersioned(spark, root, idxRoot, bounds)
    assert(ids(pruned1) == want && want.nonEmpty)
    // the v1 read actually prunes (range layout → tight envelopes)
    val v1Files = Compaction.readVersion(spark, root, v1).inputFiles.length
    assert(pruned1.inputFiles.length * 2 <= v1Files,
      s"${pruned1.inputFiles.length}/$v1Files")

    // compact → v2; before rebuilding, the read names the fix
    Compaction.compactVersioned(spark, root, maxRecordsPerFile = 2000)
    val e = intercept[IllegalArgumentException] {
      SkippingIndex.readVersioned(spark, root, idxRoot, bounds)
    }
    assert(e.getMessage.contains("buildVersioned"))

    // rebuild for v2 → current reads re-point, same answer
    val v2 = SkippingIndex.buildVersioned(spark, root, idxRoot, Seq("x"))
    assert(v2 == v1 + 1)
    assert(ids(SkippingIndex.readVersioned(spark, root, idxRoot, bounds)) == want)
    // time travel: the pinned v1 read still works off its own index
    assert(ids(SkippingIndex.readVersioned(
      spark, root, idxRoot, bounds, version = Some(v1))) == want)
  }

  test("one-step compact+index: readVersioned prunes without a manual rebuild") {
    import graft.operators.SkippingIndex
    import graft.operators.SkippingIndex.NumBound
    import graft.sinks.Compaction
    val n = 3000
    val df = (0 until n).map(i => (i.toLong, (i % 500).toDouble)).toDF("id", "x")
    val root = tmp("vciroot")
    val idxRoot = tmp("vciidx")
    // ingest-side one-step form indexes the initial commit too
    val v1 = SkippingIndex.writeVersioned(
      df.repartitionByRange(12, col("x")), root, idxRoot, Seq("x"),
      maxRecordsPerFile = 300)
    val bounds = Seq(NumBound("x", 100.0, 149.0))
    def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
      d.select("id").as[Long].collect().toSet
    val want = ids(Compaction.readCurrent(spark, root)
      .filter(col("x").between(100.0, 149.0)))
    assert(ids(SkippingIndex.readVersioned(spark, root, idxRoot, bounds))
      == want && want.nonEmpty)

    // compact+index in one step: the new current version prunes
    // immediately — no manual-rebuild refusal in normal operation
    val stats = SkippingIndex.compactVersioned(spark, root, idxRoot,
      Seq("x"), maxRecordsPerFile = 2000)
    assert(stats.version == v1 + 1)
    assert(ids(SkippingIndex.readVersioned(spark, root, idxRoot, bounds)) == want)
    // the pinned old version still reads off its own index
    assert(ids(SkippingIndex.readVersioned(
      spark, root, idxRoot, bounds, version = Some(v1))) == want)
  }

  test("index location nested in the table location (or vice versa) is refused") {
    import graft.operators.SkippingIndex
    val df = (0 until 100).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val dataDir = tmp("guarddata")
    df.write.mode("overwrite").parquet(dataDir)
    for (idx <- Seq(dataDir, s"$dataDir/idx")) {
      val e = intercept[IllegalArgumentException] {
        SkippingIndex.build(spark, dataDir, idx, Seq("x"))
      }
      assert(e.getMessage.contains("disjoint"), e.getMessage)
    }
    // and a table root under the index root is the same footgun
    val e2 = intercept[IllegalArgumentException] {
      SkippingIndex.build(spark, s"$dataDir/sub", dataDir, Seq("x"))
    }
    assert(e2.getMessage.contains("disjoint"), e2.getMessage)
  }

  test("DATE dimension: NumBound prunes in epoch days; NTZ refusal names the type") {
    import graft.operators.SkippingIndex
    import graft.operators.SkippingIndex.NumBound
    val n = 4000
    val df = (0 until n).map { i =>
      (i.toLong, java.sql.Date.valueOf(java.time.LocalDate
        .of(2024, 1, 1).plusDays(i % 200)))
    }.toDF("id", "d")
    val dataDir = tmp("zdate")
    df.repartitionByRange(16, col("d")).sortWithinPartitions("d")
      .write.mode("overwrite").parquet(dataDir)
    val idxDir = tmp("zdateidx")
    SkippingIndex.build(spark, dataDir, idxDir, Seq("d"))
    // [2024-02-10, 2024-03-10] in epoch DAYS — the numView convention
    val lo = java.time.LocalDate.of(2024, 2, 10).toEpochDay.toDouble
    val hi = java.time.LocalDate.of(2024, 3, 10).toEpochDay.toDouble
    val pruned = SkippingIndex.read(spark, dataDir, idxDir,
      Seq(("d", lo, hi)))
    val full = spark.read.parquet(dataDir)
      .filter(col("d").between("2024-02-10", "2024-03-10"))
    assert(pruned.select("id").as[Long].collect().toSet ==
      full.select("id").as[Long].collect().toSet)
    assert(pruned.count() > 0)
    val totalFiles = spark.read.parquet(dataDir).inputFiles.length
    assert(pruned.inputFiles.length * 2 <= totalFiles,
      s"${pruned.inputFiles.length}/$totalFiles")

    // TIMESTAMP_NTZ: refused with a message that names the type and
    // the fix, not the generic "no usable total order"
    val ntz = spark.range(100)
      .selectExpr("id", "timestamp_ntz'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) as t")
    val ntzDir = tmp("zntz")
    ntz.write.mode("overwrite").parquet(ntzDir)
    val ntzIdx = tmp("zntzidx")
    SkippingIndex.build(spark, ntzDir, ntzIdx, Seq("t"))
    val e = intercept[IllegalArgumentException] {
      SkippingIndex.read(spark, ntzDir, ntzIdx, Seq(("t", 0.0, 1.0)))
    }
    assert(e.getMessage.contains("TIMESTAMP_NTZ"), e.getMessage)
  }

  test("bloom index prunes equality probes where min/max envelopes cannot") {
    import graft.operators.SkippingIndex
    // 8 files of INTERLEAVED ids (residue classes): every file's
    // [min,max] spans nearly the whole key space, so envelope pruning
    // is useless by construction — the regime bloom indexes exist for
    val n = 4000
    val df = (0 until n).map(i => (i.toLong, s"u${i % 97}", i % 8))
      .toDF("id", "user", "p")
    val dataDir = tmp("bloomdata")
    val idxDir = tmp("bloomidx")
    df.repartition(8, col("p")).drop("p").write.mode("overwrite").parquet(dataDir)
    val totalFiles = spark.read.parquet(dataDir).inputFiles.length
    assert(totalFiles >= 6, s"layout should hold several files, got $totalFiles")
    // envelopes CANNOT prune this layout on id
    SkippingIndex.build(spark, dataDir, tmp("bloomenv"), Seq("id"))
    val envTouched = graft.operators.ZOrder.filesTouched(spark, dataDir,
      Seq(("id", 1234.0, 1234.0)))
    // (>=: a hash-partition collision can leave an empty file, which
    // has no stats row and is never "touched")
    assert(envTouched >= totalFiles - 1,
      s"interleaved layout must defeat envelopes ($envTouched/$totalFiles)")
    // bloom prunes the same probe to ~1 file (fpp slack: allow 2)
    SkippingIndex.buildBloom(spark, dataDir, idxDir, Seq("id", "user"),
      expectedItemsPerFile = 1000)
    val touched = SkippingIndex.bloomFilesTouched(spark, idxDir,
      Seq(("id", 1234L)))
    assert(touched <= 2, s"bloom should prune to ~1 file, touched $touched")
    // pruned read == full filtered read (long and string probes)
    val got = SkippingIndex.readEquals(spark, dataDir, idxDir,
      Seq(("id", 1234L))).select("id", "user").as[(Long, String)].collect()
    assert(got.toSeq == Seq((1234L, s"u${1234 % 97}")))
    val gotStr = SkippingIndex.readEquals(spark, dataDir, idxDir,
      Seq(("user", "u5"))).select("id").as[Long].collect().toSet
    val wantStr = spark.read.parquet(dataDir).filter(col("user") === "u5")
      .select("id").as[Long].collect().toSet
    assert(gotStr == wantStr && gotStr.nonEmpty)
    // conjunctive probe: both filters must pass
    val both = SkippingIndex.readEquals(spark, dataDir, idxDir,
      Seq(("id", 1234L), ("user", "WRONG"))).count()
    assert(both == 0)
    // absent value: a bloom may false-positive a file, but the exact
    // predicate keeps the result right
    assert(SkippingIndex.readEquals(spark, dataDir, idxDir,
      Seq(("id", 999999L))).count() == 0)
    // unindexed column named in the error
    val eCol = intercept[IllegalArgumentException] {
      SkippingIndex.readEquals(spark, dataDir, idxDir, Seq(("zz", 1L)))
    }
    assert(eCol.getMessage.contains("zz"))
    // stale after append: refuse, never silently skip the new file
    df.limit(5).drop("p").write.mode("append").parquet(dataDir)
    val e = intercept[IllegalArgumentException] {
      SkippingIndex.readEquals(spark, dataDir, idxDir, Seq(("id", 1234L)))
    }
    assert(e.getMessage.contains("stale"))
  }

  test("bloom union rollup: merged filter contains every leaf's values") {
    import graft.plans.Bloom
    val df = (0 until 500).map(i => (i.toLong, i % 5)).toDF("v", "g")
    // leaves sized for the MERGED cardinality: union is bitwise OR,
    // so k leaves each filled to their own capacity would OR into a
    // saturated filter — the same sizing rule lakehouse bloom
    // indexes document
    val leaves = df.groupBy("g").agg(Bloom.sketch(col("v"), 2000).as("bf"))
    val merged = leaves.agg(Bloom.union(col("bf"), 2000)).head()
      .getAs[Array[Byte]](0)
    // no false negatives through the rollup
    (0 until 500).foreach(i =>
      assert(Bloom.mightContain(merged, i.toLong), s"lost $i in union"))
    // and it still rejects most absent values (sanity, not a bound)
    val fps = (10000 until 11000).count(i => Bloom.mightContain(merged, i.toLong))
    assert(fps < 100, s"$fps/1000 false positives at fpp=1%")
  }
}
