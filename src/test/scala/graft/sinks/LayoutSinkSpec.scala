package graft.sinks

import graft.SparkSuite
import graft.ext.Layout
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming z-layout maintenance: appended batches must stay findable
  * through the partition-pruned read path (including rows that drift
  * past the frozen normalization bounds — the clamp contract), replays
  * must not duplicate, and compaction must restore one file per cell
  * without changing the table's contents. */
class LayoutSinkSpec extends SparkSuite {
  import spark.implicits._

  test("appends keep the pruned read exact; clamp, replay, compact") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("zlayout_sink")
    val base = Seq.tabulate(1000)(i =>
      ((i % 100).toLong, (i % 50).toLong, i.toLong)).toDF("x", "y", "pay")
    Layout.writeClustered(base, dir, "x", "y", cellBits = 4)

    val mem = MemoryStream[(Long, Long, Long)]
    val ckpt = tmpDir("zlayout_sink_ckpt")
    def run(): Unit = LayoutSink.run(
      mem.toDF().toDF("x", "y", "pay"), dir, ckpt).awaitTermination()

    // batch 1: in-range; batch 2: BEYOND the frozen bounds (x_hi=99,
    // y_hi=49) — must clamp into the edge cells, not vanish or throw
    mem.addData((10L, 10L, 10000L))
    run()
    mem.addData((500L, 200L, 10001L), (7L, 7L, 10002L))
    run()

    // a predicate past the bounds still finds the clamped row
    val far = LayoutSink.readPruned(spark, dir, "pay",
      Some((450L, 600L)), None).select("pay").as[Long].collect()
    assert(far.toSet === Set(10001L))

    // the unconstrained read sees base + all three appends, exactly once
    def allPays(): Seq[Long] = LayoutSink.readPruned(spark, dir, "pay",
      None, None).select("pay").as[Long].collect().toSeq.sorted
    val expected = (0L until 1000L) ++ Seq(10000L, 10001L, 10002L)
    assert(allPays() === expected)

    // an uncommitted-marker retry re-appends files; read-side dedup on
    // the deterministic key keeps the table exactly-once
    LayoutSink.appendBatch(
      Seq((7L, 7L, 10002L)).toDF("x", "y", "pay"), dir)
    assert(allPays() === expected)

    // compaction folds the duplicate file away and restores one file
    // per cell; contents unchanged
    LayoutSink.compact(spark, dir, "pay")
    assert(allPays() === expected)
    val filesPerCell = new java.io.File(s"$dir/data").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("zcell="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    assert(filesPerCell.nonEmpty && filesPerCell.forall(_ === 1),
      s"expected one file per cell, got ${filesPerCell.mkString(",")}")
    // and a plain full-scan (no dedup) agrees: the physical duplicate
    // really is gone, not just masked by the reader
    assert(spark.read.parquet(s"$dir/data")
      .select("pay").as[Long].collect().toSeq.sorted === expected)
  }

  test("HILBERT table maintenance: appends bucket into hcell dirs via the " +
      "shared keying path, pruned reads stay exact, recluster keeps the " +
      "curve tag") {
    val dir = tmpDir("hlayout_sink")
    val base = Seq.tabulate(1000)(i =>
      ((i % 100).toLong, (i % 50).toLong, i.toLong)).toDF("x", "y", "pay")
    Layout.writeClusteredHilbert(base, dir, "x", "y", cellBits = 4)

    // in-range and clamped appends, through the same appendBatch
    LayoutSink.appendBatch(
      Seq((10L, 10L, 10000L), (500L, 200L, 10001L)).toDF("x", "y", "pay"),
      dir)
    val far = LayoutSink.readPruned(spark, dir, "pay",
      Some((450L, 600L)), None).select("pay").as[Long].collect()
    assert(far.toSet === Set(10001L), "clamped row findable via hcell math")
    def allPays(): Seq[Long] = LayoutSink.readPruned(spark, dir, "pay",
      None, None).select("pay").as[Long].collect().toSeq.sorted
    val expected = (0L until 1000L) ++ Seq(10000L, 10001L)
    assert(allPays() === expected)

    // appended files land in hcell= dirs, never zcell=
    val dirs = new java.io.File(s"$dir/data").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("hcell=")), dirs.toSeq)

    // drift enough to trigger, recluster, curve tag survives the swap
    LayoutSink.appendBatch(Seq.tabulate(250)(i =>
      (1000L + i, 500L + i, 20000L + i)).toDF("x", "y", "pay"), dir)
    assert(LayoutSink.maybeRecluster(spark, dir, "pay", thresholdPct = 10))
    val meta = Layout.readMeta(spark, dir)
    assert(meta.curve === "h" && meta.xHi === 1249L)
    assert(Layout.layoutHealth(spark, dir).head()
      .getAs[Long]("drifted_rows") === 0L)
    val after = LayoutSink.readPruned(spark, dir, "pay",
      Some((1000L, 1050L)), Some((500L, 550L)))
      .select("pay").as[Long].collect().toSeq.sorted
    assert(after === (20000L to 20050L).toSeq)
    // the rebuilt stats manifest agrees with the geometry reader
    assert(Layout.readPrunedByStats(spark, dir,
      Some((1000L, 1050L)), Some((500L, 550L)))
      .select("pay").as[Long].collect().toSeq.sorted === after)
  }

  test("auto re-layout policy: append -> drift -> recluster -> health and " +
      "pruning restored") {
    val dir = tmpDir("zlayout_relayout")
    val base = Seq.tabulate(1000)(i =>
      ((i % 100).toLong, (i % 50).toLong, i.toLong)).toDF("x", "y", "pay")
    Layout.writeClustered(base, dir, "x", "y", cellBits = 4)

    // below threshold: a small in-range append must NOT trigger
    LayoutSink.appendBatch(
      Seq((10L, 10L, 5000L)).toDF("x", "y", "pay"), dir)
    assert(!LayoutSink.maybeRecluster(spark, dir, "pay", thresholdPct = 10))

    // drift 20% of the table past the frozen bounds: all those rows
    // clamp into edge cells and the health verdict flips
    val drifted = Seq.tabulate(250)(i =>
      (1000L + i, 500L + i, 20000L + i)).toDF("x", "y", "pay")
    LayoutSink.appendBatch(drifted, dir)
    val before = Layout.layoutHealth(spark, dir).head()
    assert(before.getAs[Long]("drifted_rows") === 250L)
    assert(before.getAs[Boolean]("needs_relayout"))

    val expected = ((0L until 1000L) ++ Seq(5000L) ++
      (20000L until 20250L)).sorted
    def allPays(): Seq[Long] = LayoutSink.readPruned(spark, dir, "pay",
      None, None).select("pay").as[Long].collect().toSeq.sorted
    assert(allPays() === expected, "clamped rows stay findable pre-recluster")

    assert(LayoutSink.maybeRecluster(spark, dir, "pay", thresholdPct = 10))

    // health restored: fresh bounds cover the drifted keys
    val after = Layout.layoutHealth(spark, dir).head()
    assert(after.getAs[Long]("drifted_rows") === 0L)
    assert(!after.getAs[Boolean]("needs_relayout"))
    assert(after.getAs[Long]("n_rows") === expected.size.toLong)
    val meta = Layout.readMeta(spark, dir)
    assert(meta.xHi === 1249L && meta.yHi === 749L)

    // contents unchanged through the swap
    assert(allPays() === expected)

    // PRUNING restored: before the re-layout the drifted rows all hid in
    // the one top-corner edge cell (any read touching it scanned all
    // 250); now they spread across fresh cells, so a query for a slice
    // of the drifted range prunes most of them
    val cells = Layout.survivingCells(meta,
      Some((1000L, 1050L)), Some((500L, 550L)))
    assert(cells.size < 4, s"expected a corner slice, got ${cells.size} cells")
    val got = LayoutSink.readPruned(spark, dir, "pay",
      Some((1000L, 1050L)), Some((500L, 550L)))
      .select("pay").as[Long].collect().toSeq.sorted
    assert(got === (20000L to 20050L).toSeq)

    // the stats manifest was rebuilt in lockstep: the stats reader
    // agrees with the geometry reader
    val viaStats = Layout.readPrunedByStats(spark, dir,
      Some((1000L, 1050L)), Some((500L, 550L)))
      .select("pay").as[Long].collect().toSeq.sorted
    assert(viaStats === got)
  }

  test("manifest bloat is bounded: many small appends keep the stats " +
      "manifest within the fold factor without touching data files, and " +
      "the stats reader stays exact") {
    val dir = tmpDir("zlayout_statsfold")
    val base = Seq.tabulate(500)(i =>
      ((i % 100).toLong, (i % 50).toLong, i.toLong)).toDF("x", "y", "pay")
    Layout.writeClustered(base, dir, "x", "y", cellBits = 4)
    def dataFiles(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/data"))
        .map(_.getPath).filter(_.endsWith(".parquet")).toSet
    }
    val baseFiles = dataFiles()
    // 16 appends, each landing in several cells: unbounded, the manifest
    // would hold base + 16×(files hit) rows — far past the fold factor
    for (b <- 0 until 16)
      LayoutSink.appendBatch(Seq(((b * 7 % 100).toLong, (b * 3 % 50).toLong,
        10000L + b)).toDF("x", "y", "pay"), dir)
    val meta = Layout.readMeta(spark, dir)
    val stats = spark.read.parquet(s"$dir/stats")
    val files = stats.select(meta.partitionCol).distinct().count()
    assert(stats.count() <= LayoutSink.statsFoldFactor * files,
      s"manifest must stay within ${LayoutSink.statsFoldFactor}x the file " +
        s"count, got ${stats.count()} rows over $files files")
    // the folds never rewrote a data byte: every base file is still there
    assert(baseFiles.subsetOf(dataFiles()),
      "stats folding must be manifest-only")
    // and the stats-pruned read is still bit-identical to a full scan
    val viaStats = Layout.readPrunedByStats(spark, dir,
      Some((0L, 20L)), None).select("pay").as[Long].collect().toSeq.sorted
    val full = spark.read.parquet(s"$dir/data")
      .where($"x".between(0L, 20L)).dropDuplicates("pay")
      .select("pay").as[Long].collect().toSeq.sorted
    assert(viaStats === full)
  }

  test("a compactStats crash between its renames self-heals: the manifest " +
      "left only at stats__old is restored by the next append (not " +
      "recreated empty), and a reader landing in the window falls back") {
    val dir = tmpDir("zlayout_statsheal")
    val base = Seq.tabulate(300)(i =>
      ((i % 100).toLong, (i % 50).toLong, i.toLong)).toDF("x", "y", "pay")
    Layout.writeClustered(base, dir, "x", "y", cellBits = 4)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mv(a: String, b: String) = assert(fs.rename(
      new org.apache.hadoop.fs.Path(a), new org.apache.hadoop.fs.Path(b)))
    // simulate the crash window: live manifest renamed aside, second
    // rename never ran
    mv(s"$dir/stats", s"$dir/stats__old")
    // a READER landing inside the window must still answer exactly
    val inWindow = Layout.readPrunedByStats(spark, dir,
      Some((0L, 10L)), None).select("pay").as[Long].collect().toSeq.sorted
    val expect0 = spark.read.parquet(s"$dir/data")
      .where($"x".between(0L, 10L)).select("pay")
      .as[Long].collect().toSeq.sorted
    assert(inWindow === expect0, "stats__old fallback must serve the window")
    // the next append must RESTORE the manifest before appending — a
    // mode=append into a recreated-empty dir would strand the base
    // files' stats at __old forever (and a later fold would delete them)
    LayoutSink.appendBatch(Seq((10L, 10L, 9000L)).toDF("x", "y", "pay"), dir)
    // the heal must have renamed __old back BEFORE the append — in the
    // pre-fix bug a fresh stats dir coexisted with the stranded __old
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/stats__old")),
      "appendBatch must restore the stranded manifest, not orphan it")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/stats")))
    val files = spark.read.parquet(s"$dir/stats")
      .select(Layout.readMeta(spark, dir).partitionCol).distinct().count()
    assert(files >= spark.read.parquet(s"$dir/data").select("zcell")
      .distinct().count(),
      "restored manifest must still cover every base file")
    val after = Layout.readPrunedByStats(spark, dir,
      Some((0L, 10L)), None).select("pay").as[Long].collect().toSeq.sorted
    assert(after === (expect0 :+ 9000L).sorted,
      "post-heal stats read covers base files AND the new append")
  }

  test("a crash in the recluster swap window self-heals: the table left " +
      "only at __old is restored by the next maintenance entry") {
    val dir = tmpDir("zlayout_heal")
    val base = Seq.tabulate(200)(i =>
      ((i % 100).toLong, (i % 50).toLong, i.toLong)).toDF("x", "y", "pay")
    Layout.writeClustered(base, dir, "x", "y", cellBits = 4)
    // simulate the crash: live renamed aside, second rename never ran
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    LayoutSink.invalidateMeta(dir)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "__old")))
    // the next append heals the root through metaOf and lands normally
    LayoutSink.appendBatch(Seq((10L, 10L, 9999L)).toDF("x", "y", "pay"), dir)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "__old")) ||
      fs.exists(new org.apache.hadoop.fs.Path(dir)))
    val pays = LayoutSink.readPruned(spark, dir, "pay", None, None)
      .select("pay").as[Long].collect().toSeq.sorted
    assert(pays === ((0L until 200L) ++ Seq(9999L)).sorted)
  }
}
