package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LakeSpec extends SparkSpec {
  import spark.implicits._

  test("dynamic partition overwrite touches only the batch's partitions") {
    val dir = Files.createTempDirectory("lake1").toString
    val full = Seq((2023, "A", 1.0), (2023, "B", 2.0), (2024, "A", 3.0))
      .toDF("year", "ticker", "v")
    LakeWriter.write(full, dir, Seq("year", "ticker"))
    // overwrite ONLY (2023, A)
    LakeWriter.overwritePartitions(
      Seq((2023, "A", 9.0)).toDF("year", "ticker", "v"), dir, Seq("year", "ticker"))
    val back = LakeReader.read(spark, dir).orderBy("year", "ticker")
      .select("year", "ticker", "v").rows
    back shouldBe Seq(Seq(2023, "A", 9.0), Seq(2023, "B", 2.0), Seq(2024, "A", 3.0))
  }

  test("partition-pruned read plans skip other partitions") {
    val dir = Files.createTempDirectory("lake2").toString
    LakeWriter.write((1 to 100).map(i => (2000 + i % 5, s"T${i % 3}", i.toDouble))
      .toDF("year", "ticker", "v"), dir, Seq("year", "ticker"))
    val plan = LakeReader.readPartition(spark, dir, Map("year" -> 2003, "ticker" -> "T1"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && !plan.contains("PartitionFilters: []"))
  }

  test("writeZOrdered: every file covers a narrow tile of BOTH clustered columns") {
    val dir = Files.createTempDirectory("lakez").toString
    // two independent uniform columns — the adversarial case for
    // single-column sorting (sorting by x leaves y's per-file span at
    // the full domain)
    val rng = new scala.util.Random(7)
    val df = (1 to 20000).map(_ => (rng.nextInt(10000).toLong,
      rng.nextInt(10000).toLong)).toDF("x", "y")
    LakeWriter.writeZOrdered(df, s"$dir/z", Seq("x", "y"), files = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$dir/sx")
    def meanSpan(path: String, c: String): Double =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).cast("double").as("span"))
        .agg(avg(col("span"))).rows.head.head.asInstanceOf[Double]
    // identical row SET either way — layout, not data
    spark.read.parquet(s"$dir/z").count() shouldBe 20000
    spark.read.parquet(s"$dir/z").except(df).count() shouldBe 0
    df.except(spark.read.parquet(s"$dir/z")).count() shouldBe 0
    // x-sorted layout: y files span ~the whole 10k domain; z-ordered:
    // BOTH columns' per-file spans are tiles (16 files = 4 z-bits ⇒
    // roughly 1/4 of each domain; assert a conservative 2.5×/2×)
    val (zx, zy) = (meanSpan(s"$dir/z", "x"), meanSpan(s"$dir/z", "y"))
    val (sxX, sxY) = (meanSpan(s"$dir/sx", "x"), meanSpan(s"$dir/sx", "y"))
    withClue(s"z=(x $zx, y $zy) xsorted=(x $sxX, y $sxY): ") {
      zy should be < sxY / 2.5   // y prunes under z-order, not under x-sort
      zx should be < 10000.0 / 2 // x still clustered (tiles, not perfect runs)
    }
    // the spans CAUSE actual skipping — on the NON-leading column, the
    // claim that distinguishes z-order from a plain sort: a y-only
    // predicate lets the parquet reader's row-group pruning (pushed
    // min/max) drop most of the z-layout's tiles, while the x-sorted
    // layout reads everything (every file's y-range spans the domain)
    def scanRows(path: String): Long = {
      val q = spark.read.parquet(path)
        .filter(col("y").between(2000, 3000))
      q.collect() // execute THIS dataset's plan so its metrics populate
      val plan = q.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      plan.collectLeaves()
        .collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metrics("numOutputRows").value
        }.get
    }
    val (zScan, sxScan) = (scanRows(s"$dir/z"), scanRows(s"$dir/sx"))
    withClue(s"scan rows z=$zScan xsorted=$sxScan: ") {
      // x-sorted: NOTHING prunes on y — the scan reads every row
      sxScan shouldBe 20000L
      // z-ordered: at least the far y-tiles prune. How much depends on
      // where repartitionByRange's sampled boundaries land relative to
      // the tile grid (seen 0.25–0.5× across runs), so assert the
      // conservative bound, not the lucky one
      zScan.toDouble should be < sxScan.toDouble * 0.7
    }
  }

  test("writeZOrdered: string cluster keys skip scans via dictionary rank") {
    val dir = Files.createTempDirectory("lakezs").toString
    // the reference's own cluster shape: (year, ticker) — a numeric and
    // a STRING key, independently uniform
    val rng = new scala.util.Random(13)
    val tickers = ('A' to 'Z').map(c => s"TK$c")
    val df = (1 to 20000).map(_ =>
      (2000L + rng.nextInt(20), tickers(rng.nextInt(26)))).toDF("year", "ticker")
    LakeWriter.writeZOrdered(df, s"$dir/z", Seq("year", "ticker"), files = 16)
    df.repartitionByRange(16, col("year")).sortWithinPartitions("year")
      .write.parquet(s"$dir/sy")
    // identical row SET, original schema — the rank surrogate is layout,
    // never persisted
    val back = spark.read.parquet(s"$dir/z")
    back.columns.toSeq.sorted shouldBe Seq("ticker", "year")
    back.count() shouldBe 20000
    back.except(df).count() shouldBe 0
    df.except(back).count() shouldBe 0
    // a ticker-only equality predicate prunes row groups in the
    // z-layout (each file covers a narrow slice of the SORTED ticker
    // dictionary, so parquet string min/max stats exclude most files);
    // the year-sorted layout reads every row
    def scanRows(path: String): Long = {
      val q = spark.read.parquet(path).filter(col("ticker") === "TKB")
      q.collect()
      val plan = q.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      plan.collectLeaves()
        .collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metrics("numOutputRows").value
        }.get
    }
    val (zScan, syScan) = (scanRows(s"$dir/z"), scanRows(s"$dir/sy"))
    withClue(s"scan rows z=$zScan yearsorted=$syScan: ") {
      syScan shouldBe 20000L          // nothing prunes on the string key
      zScan.toDouble should be < syScan.toDouble * 0.7
    }
  }

  test("writeZOrdered: a high-cardinality string key fails the " +
    "dictionary contract loudly, before any write") {
    val dir = Files.createTempDirectory("lakezc").toString
    val df = (1 to 50).map(i => (i.toLong, s"freetext_$i")).toDF("n", "t")
    val ex = intercept[IllegalArgumentException] {
      LakeWriter.writeZOrdered(df, s"$dir/z", Seq("n", "t"), files = 4,
        maxDictValues = 10)
    }
    ex.getMessage should include("exceeds 10 distinct values")
    ex.getMessage should include("low-cardinality")
    // nothing was written: the probe fires before the z-write
    new java.io.File(s"$dir/z").exists() shouldBe false
    // and the same data under the default cap still writes fine
    LakeWriter.writeZOrdered(df, s"$dir/z2", Seq("n", "t"), files = 4)
    spark.read.parquet(s"$dir/z2").count() shouldBe 50
  }

  test("bucketed tables join without an exchange") {
    val n = 1000
    LakeWriter.writeBucketed((1 to n).map(i => (i.toLong, s"left$i")).toDF("k", "lv"),
      "bucketed_l", buckets = 4, keys = Seq("k"), sortCols = Seq("k"))
    LakeWriter.writeBucketed((1 to n).map(i => (i.toLong, s"right$i")).toDF("k", "rv"),
      "bucketed_r", buckets = 4, keys = Seq("k"), sortCols = Seq("k"))
    // force the sort-merge path (small test tables would otherwise
    // broadcast); bucketed SMJ needs neither a shuffle nor a sort.
    // The -1 threshold goes on an ISOLATED child session, never the
    // shared one: suites run in parallel threads inside the forked
    // test JVM, and a set/finally window on the shared session races
    // any suite that clones conf via newSession() mid-window (it cost
    // PlanBudgetSpec a flaky AQE audit before this isolation).
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = s2.table("bucketed_l").join(s2.table("bucketed_r"), Seq("k"))
    joined.count() shouldBe n
    val plan = joined.queryExecution.executedPlan.toString
    withClue(plan) {
      assert(!plan.contains("Exchange"))
      assert(plan.contains("SortMergeJoin"))
    }
    spark.sql("DROP TABLE bucketed_l"); spark.sql("DROP TABLE bucketed_r")
  }

  test("recoverSnapshot: a torn swap rolls back to the previous snapshot") {
    val root = Files.createTempDirectory("lake3").toString
    val path = s"$root/wh"
    LakeWriter.write(Seq((1L, "old")).toDF("k", "v"), path, Seq.empty)
    // simulate a writer that died between the two renames: target moved
    // to __old__, fully-written-but-uncommitted staging left behind
    Files.move(java.nio.file.Paths.get(path),
      java.nio.file.Paths.get(s"$path.__old__"))
    LakeWriter.write(Seq((1L, "uncommitted")).toDF("k", "v"),
      s"$path.__staging__", Seq.empty)
    LakeWriter.recoverSnapshot(spark, path)
    LakeReader.read(spark, path).rows shouldBe Seq(Seq(1L, "old"))
    assert(!Files.exists(java.nio.file.Paths.get(s"$path.__old__")))
    assert(!Files.exists(java.nio.file.Paths.get(s"$path.__staging__")))
  }

  test("compact: file counts drop to the budget, data byte-identical, staging swept") {
    val root = Files.createTempDirectory("lake5").toString
    val path = s"$root/zone"
    val df = (1L to 400L).map(i => (i, s"p${i % 3}", i * 1.5)).toDF("k", "part", "v")
    // fragment: 12 shuffle partitions → up to 12 files per partition dir
    LakeWriter.write(df.repartition(12), path, Seq("part"))
    val before = LakeWriter.fileCounts(spark, path)
      .rows.map(r => r.head.toString -> r(1).asInstanceOf[Long]).toMap
    before.keySet shouldBe Set("part=p0", "part=p1", "part=p2")
    before.values.max should be > 2L
    LakeWriter.compact(spark, path, Seq("part"), filesPerPartition = 2)
    val after = LakeWriter.fileCounts(spark, path)
      .rows.map(r => r.head.toString -> r(1).asInstanceOf[Long]).toMap
    after.keySet shouldBe before.keySet
    all(after.values) should be <= 2L
    // layout changed, data did not
    LakeReader.read(spark, path).orderBy("k")
      .select("k", "part", "v").rows shouldBe df.orderBy("k").rows
    assert(!Files.exists(java.nio.file.Paths.get(s"$path.__staging__")))
    assert(!Files.exists(java.nio.file.Paths.get(s"$path.__old__")))
  }

  test("recoverSnapshot: leftover __old__ beside a live target is swept") {
    val root = Files.createTempDirectory("lake4").toString
    val path = s"$root/wh"
    LakeWriter.write(Seq((1L, "new")).toDF("k", "v"), path, Seq.empty)
    LakeWriter.write(Seq((1L, "stale")).toDF("k", "v"), s"$path.__old__", Seq.empty)
    LakeWriter.recoverSnapshot(spark, path)
    LakeReader.read(spark, path).rows shouldBe Seq(Seq(1L, "new"))
    assert(!Files.exists(java.nio.file.Paths.get(s"$path.__old__")))
    // no-op on a healthy or absent snapshot
    LakeWriter.recoverSnapshot(spark, s"$root/never_written")
    assert(!Files.exists(java.nio.file.Paths.get(s"$root/never_written")))
  }
}
